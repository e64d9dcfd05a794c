"""Structured Streaming support.

Rule application is stateless per row (one narrow projection), so the same
``SparkPlug.plug`` works unchanged on a streaming DataFrame — no state
store, no watermark needed (SURVEY §2.3).  This module adds the readStream
entry point and a windowed rule-impact aggregation for monitoring
(watermark + tumbling window, handles late events).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import SparkPlug
from ..models import DEFAULT_PLUG_DETAILS_COLUMN, PlugRule

from .sessions import sessionize_stream

__all__ = [
    "plug_stream",
    "streaming_impact_counts",
    "streaming_violation_counts",
    "streaming_dedup_exact",
    "streaming_quality_filter",
    "streaming_decontaminate",
    "near_dup_flags",
    "streaming_near_dup_flags",
    "sessionize_stream",
    "stream_stream_join",
    "streaming_distinct_sketches",
    "streaming_histogram_sketches",
    "streaming_cms_sketches",
    "streaming_rollup_store",
    "streaming_kmv_sketches",
    "streaming_semantic_flags",
    "streaming_language_route",
    "streaming_dhash_flags",
    "streaming_enrich",
    "streaming_reservoir",
    "streaming_sample_per_key",
    "streaming_pagerank_store",
    "streaming_term_index_store",
    "streaming_frontier_store",
]


def plug_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    rules: Iterable[PlugRule],
    plug_details_column: str | None = DEFAULT_PLUG_DETAILS_COLUMN,
    validate: bool = True,
) -> DataFrame:
    """Apply rules to a streaming DataFrame.  Validation runs eagerly
    against the stream schema (driver-side, no job); metrics/checkpoint
    knobs are intentionally absent — use ``observe`` on the query or the
    sink's own checkpointing."""
    builder = SparkPlug.builder(spark)
    if plug_details_column is not None:
        builder = builder.enable_plug_details(column=plug_details_column)
    if validate:
        builder = builder.enable_rules_validation()
    return builder.create().plug(stream_df, rules)


def streaming_impact_counts(
    plugged_stream: DataFrame,
    time_col: str,
    window_duration: str = "1 minute",
    watermark_delay: str = "10 minutes",
    details_column: str = DEFAULT_PLUG_DETAILS_COLUMN,
) -> DataFrame:
    """Per-window, per-rule changed-row counts over a plugged stream.
    Watermarked tumbling window → safe state eviction with late data.
    Pass ``watermark_delay=None`` when the stream already carries a
    watermark (Spark disallows redefining one)."""
    if watermark_delay is not None:
        plugged_stream = plugged_stream.withWatermark(time_col, watermark_delay)
    return (
        plugged_stream
        .select(F.col(time_col), F.explode(F.col(details_column)).alias("detail"))
        .groupBy(
            F.window(F.col(time_col), window_duration).alias("w"),
            F.col("detail.name").alias("rule_name"),
        )
        .agg(F.count(F.lit(1)).alias("rows_changed"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "rule_name",
            "rows_changed",
        )
    )


def streaming_violation_counts(
    stream_df: DataFrame,
    expectations,
    time_col: str,
    window_duration: str = "1 minute",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Per-window, per-expectation violation counts over a stream — the
    live data-quality monitor twin of the batch
    :func:`~sparkplug_spark.operators.check_expectations` report (alert
    when an upstream schema/quality break starts flooding violations).

    Row-level expectations only (``unique`` needs the whole table).  The
    violation flags are a stateless narrow projection; the only state is
    the watermarked tumbling-window count, evicted as the watermark
    advances.  Output per (window, expectation): ``n_rows`` (window
    volume) and ``n_violations``."""
    from ..operators.expectations import flag_violations

    flagged = flag_violations(stream_df, expectations)
    if watermark_delay is not None:
        flagged = flagged.withWatermark(time_col, watermark_delay)
    names = F.array(*[F.lit(e.name) for e in expectations])
    # one output row per (window, expectation) including zero-violation
    # windows: explode the declared names, count matches per name
    exploded = flagged.select(
        F.col(time_col),
        F.explode(names).alias("expectation"),
        F.col("failed_expectations"),
    )
    return (
        exploded.groupBy(
            F.window(F.col(time_col), window_duration).alias("w"),
            "expectation",
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.array_contains("failed_expectations", F.col("expectation"))
                .cast("long")
            ).alias("n_violations"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "expectation",
            "n_rows",
            "n_violations",
        )
    )


def streaming_quality_filter(
    stream_df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 50,
    max_dup_3gram_frac: float = 0.3,
) -> DataFrame:
    """Drop low-quality documents from a stream using the same
    Gopher-style heuristics as the batch operator — the scoring is a
    stateless narrow projection, so it runs unchanged per micro-batch (no
    state store, no watermark).  Ingest-time filtering means junk never
    reaches the corpus store at all."""
    from ..operators.cleaning import gopher_quality_flags

    flagged = gopher_quality_flags(
        stream_df,
        text_col=text_col,
        min_tokens=min_tokens,
        max_dup_3gram_frac=max_dup_3gram_frac,
    )
    return flagged.filter(~F.col("flag_low_quality")).drop(
        "n_tokens", "mean_token_len", "frac_dup_3gram", "flag_low_quality"
    )


def streaming_decontaminate(
    stream_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    n: int = 5,
    method: str = "exact",
    bloom_bits: int = 1 << 23,
    bloom_hashes: int = 5,
) -> DataFrame:
    """Drop streaming documents that share any word ``n``-gram with a
    STATIC evaluation set — the stream-static pattern: the eval-gram index
    is built once from a batch DataFrame and shipped to every micro-batch;
    the stream side stays stateless (no state store, no watermark).

    ``method="exact"``: the distinct eval-gram hashes are aggregated into
    one sorted array and each row checks ``array_intersect`` — exact, fine
    for MB-scale benchmarks.  ``method="bloom"``: eval grams are folded
    into a ``bloom_bits``-bit Bloom filter (built distributed, one
    ``bit_or`` aggregation; only ``bloom_bits/8`` bytes ship to
    executors) and an Arrow-batched kernel tests each document's grams —
    the scale path for GB eval sets.  Bloom errs toward OVER-dropping
    (false positives, no false negatives), the safe direction for
    decontamination; size ``bloom_bits`` ≈ 10× the gram count for <1%
    false-positive rate."""
    from ..functions.text import hash60, word_shingles_pd

    if method not in ("exact", "bloom"):
        raise ValueError(f"unknown method {method!r}")

    eval_grams = (
        eval_df.select(
            F.explode(word_shingles_pd(F.col(text_col), n)).alias("g")
        )
        .select(hash60(F.col("g")).alias("gh"))
        .distinct()
    )
    # per-row gram array stays attached (no explode on the stream side —
    # an explode would multiply every row ~n_tokens×)
    with_grams = stream_df.withColumn(
        "__grams",
        F.transform(word_shingles_pd(F.col(text_col), n), hash60),
    )

    if method == "exact":
        eval_arr = eval_grams.agg(F.collect_list("gh").alias("all")).select(
            F.array_sort("all").alias("all")
        )
        joined = with_grams.crossJoin(F.broadcast(eval_arr))
        return (
            joined.filter(F.size(F.array_intersect("__grams", "all")) == 0)
            .drop("__grams", "all")
        )

    from ..functions.bloom import bloom_contains_any, build_bloom

    blob = build_bloom(eval_grams, "gh", bloom_bits, bloom_hashes)
    return with_grams.filter(
        ~bloom_contains_any(blob, bloom_bits, bloom_hashes, F.col("__grams"))
    ).drop("__grams")


def streaming_dedup_exact(
    stream_df: DataFrame,
    text_col: str = "text",
    time_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop rows whose normalized-content digest was
    already seen within the watermark horizon.

    Uses the built-in streaming state store via
    ``dropDuplicatesWithinWatermark`` — state is evicted once the digest's
    event time falls behind the watermark, so memory is bounded by the
    dedup horizon, not the stream's lifetime (the unbounded-state variant
    of ``dropDuplicates`` would OOM a 100 TB/day stream)."""
    from ..functions.text import normalize_text

    with_digest = stream_df.withColumn(
        "__digest", F.md5(normalize_text(F.col(text_col)))
    ).withWatermark(time_col, watermark_delay)
    return with_digest.dropDuplicatesWithinWatermark(["__digest"]).drop("__digest")


def near_dup_flags(
    batch_df: DataFrame,
    corpus_sigs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """Flag a (micro-)batch's near-duplicates of a stored corpus: every
    input row comes back with ``near_dup_of`` (smallest corpus id whose
    signature agreement >= ``min_est_jaccard``, else null) and
    ``is_near_dup``.  The corpus contributes only its signature table from
    :func:`~..operators.dedup.minhash_signatures` — no re-shingling of
    history; only band-colliding rows compare signatures."""
    from ..operators.dedup import minhash_lsh_join, minhash_signatures

    sigs = minhash_signatures(
        batch_df, text_col=text_col, id_col=id_col, n=n, num_hashes=num_hashes
    )
    matches = (
        minhash_lsh_join(
            sigs,
            corpus_sigs,
            num_hashes=num_hashes,
            bands=bands,
            min_est_jaccard=min_est_jaccard,
        )
        .groupBy("id_new")
        .agg(F.min("id_corpus").alias("near_dup_of"))
        .withColumnRenamed("id_new", id_col)
    )
    return batch_df.join(matches, id_col, "left").withColumn(
        "is_near_dup", F.col("near_dup_of").isNotNull()
    )


def streaming_near_dup_flags(
    stream_df: DataFrame,
    corpus_sigs: DataFrame,
    sink,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_est_jaccard: float = 0.5,
):
    """Incremental ingestion dedup as a stream: run :func:`near_dup_flags`
    on every micro-batch against the STATIC corpus signature table and
    hand the flagged batch to ``sink(df, batch_id)``.

    ``foreachBatch`` is the idiomatic Structured-Streaming shape here: the
    per-batch pipeline needs a distinct + aggregation over the LSH join,
    which as a plain stream transformation would demand unbounded state
    (or an illegal stream-stream self-join).  Inside foreachBatch the
    batch is a normal DataFrame, so the exact batch operator — identical
    semantics, identical plan — runs per micro-batch, and the 100 TB
    corpus participates only as a signature scan.  Returns the
    ``DataStreamWriter`` (caller picks trigger/checkpoint and starts it)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sink(
            near_dup_flags(
                batch_df,
                corpus_sigs,
                text_col=text_col,
                id_col=id_col,
                n=n,
                num_hashes=num_hashes,
                bands=bands,
                min_est_jaccard=min_est_jaccard,
            ),
            batch_id,
        )

    return stream_df.writeStream.foreachBatch(_process)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time_col: str,
    right_time_col: str,
    within_seconds: int,
    watermark_delay: str = "10 minutes",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream equi-join bounded by an event-time window: a right
    event matches a left event when ``right_time ∈ [left_time,
    left_time + within_seconds]`` (e.g. purchases within an hour of the
    view that preceded them).

    State hygiene — the part that makes this runnable forever: BOTH sides
    get a watermark, and the time-range predicate rides in the join
    condition, so Spark derives a state watermark and EVICTS buffered rows
    once they can no longer match (without the range bound the state store
    grows without limit).  ``how`` may be ``inner`` / ``leftOuter``
    (outer emits unmatched lefts only after the watermark closes their
    window — expect them late by ``watermark_delay``).

    Right columns are prefixed to avoid collisions; the join key keeps the
    left name."""
    if within_seconds <= 0:
        raise ValueError(f"within_seconds must be > 0, got {within_seconds}")
    if how not in ("inner", "leftOuter"):
        raise ValueError("how must be 'inner' or 'leftOuter'")
    lw = left.withWatermark(left_time_col, watermark_delay)
    rw = right.withWatermark(right_time_col, watermark_delay)
    rw = rw.select(
        F.col(on).alias("__rk"),
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c != on
        ],
    )
    rtime = f"{right_prefix}{right_time_col}"
    cond = (
        (F.col(on) == F.col("__rk"))
        & (F.col(rtime) >= F.col(left_time_col))
        & (
            F.col(rtime)
            <= F.col(left_time_col) + F.expr(f"INTERVAL {int(within_seconds)} SECOND")
        )
    )
    return lw.join(rw, cond, how).drop("__rk")


def _swap_publish(out: DataFrame, spark: SparkSession, store_path: str) -> None:
    """Publish ``out`` over a parquet store the plan may be READING —
    delegates to ``sources.manifest_publish`` (versioned directories + an
    atomic pointer commit), so a crash at ANY point leaves the store
    serving a complete version: the previous one until the pointer
    lands, the new one after, never half — the gap the old directory
    rename-swap (``publish_over``) could not close.  All stores share
    ONE publisher so durability fixes land in one place."""
    from ..sources import manifest_publish

    manifest_publish(
        spark,
        store_path,
        lambda tmp: out.write.mode("overwrite").parquet(tmp),
    )


def _store_exists(spark: SparkSession, store_path: str) -> bool:
    """True when the store exists — manifest stores resolve their live
    version; legacy rename-swap stores are RECOVERED first (a crash
    between publish_over's two renames would otherwise make the next
    batch silently restart from an empty store)."""
    from ..sources import manifest_resolve, recover_swap

    if manifest_resolve(spark, store_path) is not None:
        return True
    return recover_swap(spark, store_path)


def _store_read(spark: SparkSession, store_path: str) -> DataFrame:
    """Read the live version of a store (manifest or legacy layout)."""
    from ..sources import read_store

    return read_store(spark, store_path)


def streaming_distinct_sketches(
    stream_df: DataFrame,
    store_path: str,
    key_cols: Sequence[str],
    value_col: str,
    lg_k: int = 14,
):
    """Maintain a stored HLL distinct-count sketch table from a stream:
    every micro-batch's sketches are UNION-MERGED into the parquet store
    at ``store_path`` (created on the first batch), so the store always
    answers "distinct values per key so far" — and any coarser rollup via
    :func:`~..operators.sketches.rollup_distinct_sketches` — without a
    raw-data rescan.  The streaming tier of the batch sketch pair, in the
    same foreachBatch merge-on-write shape as the incremental dedup
    stores.

    All writers of one store must share ``lg_k`` (DataSketches unions are
    strict about mismatched configs).  The store swap is rename-based
    (same caveat as ``sources.compact_table``): not atomic for concurrent
    readers — pause readers or use a table format for that guarantee.

    REPLAY SAFETY: the HLL union is idempotent (register-wise max), so an
    at-least-once replayed batch cannot corrupt the store; the
    ``__last_batch`` guard is carried anyway for store-family consistency
    (identical crash/replay contract as the counter stores) and to skip
    the dead re-merge work.  Legacy stores written before the guard merge
    unguarded once and carry the column from then on.
    Returns the ``DataStreamWriter`` (caller picks trigger/checkpoint and
    starts it)."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        _merge_distinct_batch(
            batch_df, batch_id, store_path, keys, value_col, lg_k
        )

    return stream_df.writeStream.foreachBatch(_process)


def _merge_distinct_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    keys: "Sequence[str]",
    value_col: str,
    lg_k: int,
) -> None:
    """One micro-batch merge of :func:`streaming_distinct_sketches`,
    module-level so the replay guard is directly testable."""
    from ..operators.sketches import build_distinct_sketches

    spark = batch_df.sparkSession
    batch_sk = build_distinct_sketches(
        batch_df, list(keys), value_col, lg_k=lg_k
    ).select(*keys, "sketch")
    if _store_exists(spark, store_path):
        existing = _store_read(spark, store_path)
        applied = (
            existing.select(F.max("__last_batch")).collect()[0][0]
            if "__last_batch" in existing.columns
            else None
        )
        if applied is not None and batch_id <= applied:
            return  # at-least-once replay (union is idempotent anyway)
        merged = (
            existing.select(*keys, "sketch")
            .unionByName(batch_sk)
            .groupBy(*[F.col(c) for c in keys])
            .agg(F.hll_union_agg(F.col("sketch")).alias("sketch"))
        )
    else:
        merged = batch_sk
    out = merged.withColumn(
        "n_est", F.hll_sketch_estimate("sketch").cast("long")
    ).withColumn("__last_batch", F.lit(int(batch_id)).cast("long"))
    _swap_publish(out, spark, store_path)


def streaming_histogram_sketches(
    stream_df: DataFrame,
    store_path: str,
    key_cols: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 128,
):
    """The percentile sibling of :func:`streaming_distinct_sketches`:
    maintain a stored equi-width histogram table
    (:func:`~..operators.sketches.build_histogram_sketch` long form) from
    a stream — each micro-batch's bin counts ADD into the store, so
    :func:`~..operators.sketches.rollup_histogram_percentiles` reads
    all-time percentiles at any grain with no raw rescan.  All writers of
    one store must share (lo, hi, bins); same rename-swap publishing
    caveat.

    REPLAY SAFETY: foreachBatch is at-least-once, and unlike the HLL
    store (whose union merge is idempotent) histogram ADDITION is not —
    a replayed batch would double its bins.  The store therefore carries
    the last applied batch id as a constant ``__last_batch`` column
    (atomic with the data through the swap), and batches at or below it
    are skipped.  Consequence: one streaming-checkpoint lineage per
    store — a fresh checkpoint directory restarts batch ids at 0, which
    the guard would skip against an old store."""
    from ..operators.sketches import build_histogram_sketch

    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        _merge_histogram_batch(
            batch_df, batch_id, store_path, keys, value_col, lo, hi, bins
        )

    return stream_df.writeStream.foreachBatch(_process)


def _merge_histogram_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    keys: "Sequence[str]",
    value_col: str,
    lo: float,
    hi: float,
    bins: int,
) -> None:
    """One micro-batch merge of :func:`streaming_histogram_sketches`,
    module-level so the replay guard is directly testable."""
    from ..operators.sketches import build_histogram_sketch

    spark = batch_df.sparkSession
    batch_sk = build_histogram_sketch(
        batch_df, list(keys), value_col, lo=lo, hi=hi, bins=bins
    )
    if _store_exists(spark, store_path):
        existing = _store_read(spark, store_path)
        applied = existing.select(F.max("__last_batch")).collect()[0][0]
        if applied is not None and batch_id <= applied:
            return  # at-least-once replay of an already-merged batch
        merged = (
            existing.drop("__last_batch")
            .unionByName(batch_sk)
            .groupBy(*[F.col(c) for c in keys], F.col("bin"))
            .agg(F.sum("n").cast("long").alias("n"))
        )
    else:
        merged = batch_sk
    out = merged.withColumn(
        "__last_batch", F.lit(int(batch_id)).cast("long")
    )
    _swap_publish(out, spark, store_path)


def streaming_semantic_flags(
    stream_df: DataFrame,
    centroids: DataFrame,
    kept: DataFrame,
    sink,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Semantic near-dup screening as a stream: run
    :func:`~..operators.similarity.semantic_dedup_against` on every
    micro-batch against the STATIC stored centroid/representative tables
    and hand the flagged batch to ``sink(df, batch_id)`` — the embedding
    sibling of :func:`streaming_near_dup_flags`, same foreachBatch
    rationale (the per-batch pipeline needs a grouped applyInPandas the
    streaming planner can't express statefully, and the store must stay
    a static scan).  Returns the ``DataStreamWriter``.

    The centroid collect + matrix build happen ONCE here (not per
    micro-batch): the store is fixed for the query's lifetime, so each
    batch reuses the prepared assignment state."""
    from ..operators.similarity import _centroid_matrix, semantic_dedup_against

    prepared = _centroid_matrix(centroids)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sink(
            semantic_dedup_against(
                batch_df,
                centroids,
                kept,
                threshold=threshold,
                vec_col=vec_col,
                id_col=id_col,
                _prepared=prepared,
            ),
            batch_id,
        )

    return stream_df.writeStream.foreachBatch(_process)


def streaming_cms_sketches(
    stream_df: DataFrame,
    store_path: str,
    key_col: str,
    depth: int = 4,
    width: int = 512,
):
    """The heavy-hitter sibling of :func:`streaming_histogram_sketches`:
    maintain a stored Count-Min counter table
    (:func:`~..operators.sketches.build_cms_sketch`) from a stream —
    each micro-batch's counters ADD into the store on (row, col), so
    :func:`~..operators.sketches.cms_estimate` answers "how often has
    this key occurred so far" at any time with no raw rescan, bounded
    by depth·width rows forever.  Same md5 hash family, so estimates
    from the store stay engine-exact; same rename-swap publish and
    at-least-once replay guard (``__last_batch``) as the other sketch
    stores — all writers of one store must share ``depth``/``width``.
    Returns the ``DataStreamWriter``."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be positive")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        _merge_cms_batch(batch_df, batch_id, store_path, key_col, depth, width)

    return stream_df.writeStream.foreachBatch(_process)


def _merge_cms_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    key_col: str,
    depth: int,
    width: int,
) -> None:
    """One micro-batch merge of :func:`streaming_cms_sketches`,
    module-level so the replay guard is directly testable."""
    from ..operators.sketches import build_cms_sketch

    spark = batch_df.sparkSession
    batch_sk = build_cms_sketch(batch_df, key_col, depth=depth, width=width)
    if _store_exists(spark, store_path):
        existing = _store_read(spark, store_path)
        applied = existing.select(F.max("__last_batch")).collect()[0][0]
        if applied is not None and batch_id <= applied:
            return  # at-least-once replay of an already-merged batch
        merged = (
            existing.drop("__last_batch")
            .unionByName(batch_sk)
            .groupBy("row", "col")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
    else:
        merged = batch_sk
    out = merged.withColumn(
        "__last_batch", F.lit(int(batch_id)).cast("long")
    )
    _swap_publish(out, spark, store_path)


def streaming_rollup_store(
    stream_df: DataFrame,
    store_path: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
):
    """Streaming tier of the continuous-aggregate rollup (E150): each
    micro-batch's events fold into a stored day-bucketed table of
    mergeable integer stats, so :func:`~..operators.rollup.rollup_query`
    can serve any grain at any time with no raw-event rescan.  Values
    are quantized once to integer micros (exact, order-free BIGINTs),
    so a batch twin over the same events reproduces the store exactly.

    Same store discipline as the sketch stores: rename-swap publish and
    an at-least-once ``__last_batch`` replay guard (counters ADD, so a
    replayed batch must be a no-op).  The swap rewrites the WHOLE store
    per batch — right for a bounded retention horizon (days·keys rows);
    for an unbounded-history store run the batch
    :func:`~..operators.rollup.refresh_rollup`, which rewrites only the
    affected day partitions.  Returns the ``DataStreamWriter``."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        _merge_rollup_batch(
            batch_df, batch_id, store_path, ts_col, key_col, value_col
        )

    return stream_df.writeStream.foreachBatch(_process)


def _merge_rollup_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    ts_col: str,
    key_col: str,
    value_col: str,
) -> None:
    """One micro-batch merge of :func:`streaming_rollup_store`,
    module-level so the replay guard is directly testable."""
    from ..operators.rollup import _bucket_agg, _merge

    spark = batch_df.sparkSession
    batch_agg = _bucket_agg(batch_df, ts_col, key_col, value_col)
    if _store_exists(spark, store_path):
        existing = _store_read(spark, store_path)
        applied = existing.select(F.max("__last_batch")).collect()[0][0]
        if applied is not None and batch_id <= applied:
            return  # at-least-once replay of an already-merged batch
        merged = _merge(existing.drop("__last_batch").unionByName(batch_agg))
    else:
        merged = batch_agg
    out = merged.withColumn("__last_batch", F.lit(int(batch_id)).cast("long"))
    _swap_publish(out, spark, store_path)


def streaming_kmv_sketches(
    stream_df: DataFrame,
    store_path: str,
    key_col: str,
    by: tuple = (),
    k: int = 256,
):
    """Streaming tier of the portable KMV distinct sketch
    (:func:`~..operators.sketches.kmv_sketch`): each micro-batch's
    bottom-k hashes fold into a stored sketch table via
    :func:`~..operators.sketches.kmv_merge`, so
    :func:`~..operators.sketches.kmv_distinct` /
    :func:`~..operators.sketches.kmv_jaccard_pairs` answer distinct and
    overlap questions over everything seen so far with no raw rescan —
    the store stays ≤ k rows per group forever, and being plain md5-60
    bigints it remains readable by any engine.

    The fold (bottom-k of a distinct union) is commutative, associative
    AND idempotent — stronger than the counter stores' add-fold: even a
    replayed batch merges to the identical store.  The ``__last_batch``
    guard is kept anyway for family consistency (skips dead work on
    at-least-once replays).  Same rename-swap publish as the other
    sketch stores; all writers of one store must share ``k``.  Returns
    the ``DataStreamWriter``."""
    if k < 3:
        raise ValueError("k must be >= 3 (estimator needs k-1, k-2)")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        _merge_kmv_batch(batch_df, batch_id, store_path, key_col, by, k)

    return stream_df.writeStream.foreachBatch(_process)


def _merge_kmv_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    key_col: str,
    by: tuple,
    k: int,
) -> None:
    """One micro-batch merge of :func:`streaming_kmv_sketches`,
    module-level so the replay guard is directly testable."""
    from ..operators.sketches import kmv_merge, kmv_sketch

    spark = batch_df.sparkSession
    batch_sk = kmv_sketch(batch_df, key=key_col, by=by, k=k)
    if _store_exists(spark, store_path):
        existing = _store_read(spark, store_path)
        applied = existing.select(F.max("__last_batch")).collect()[0][0]
        if applied is not None and batch_id <= applied:
            return  # at-least-once replay (merge is idempotent anyway)
        merged = kmv_merge(
            existing.drop("__last_batch").unionByName(batch_sk), by=by, k=k
        )
    else:
        merged = batch_sk
    out = merged.withColumn(
        "__last_batch", F.lit(int(batch_id)).cast("long")
    )
    _swap_publish(out, spark, store_path)


def streaming_language_route(
    stream_df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_margin_micros: int = 100_000,
):
    """Route a document STREAM by language with a trained LID model
    (``operators.train_language_id``) — the ingest-time gate of a
    multilingual pipeline: per document, the exact-integer NB scores
    land as (lang_pred, score_micros, margin_micros, review_lane),
    where ``review_lane`` marks low-margin calls for human/secondary
    routing instead of a hard mis-route.

    The apply is ONE stateless Arrow projection (the model dict rides
    the closure; no joins, no aggregation, no state store, no
    watermark), so it composes with any downstream sink/trigger and its
    replayed output equals the batch tier bit-for-bit."""
    from ..operators import apply_language_id

    scored = apply_language_id(stream_df, model, text_col, id_col)
    return scored.withColumn(
        "review_lane",
        F.col("margin_micros") < F.lit(int(min_margin_micros)),
    )


def streaming_dhash_flags(
    stream_df: DataFrame,
    store_path: str,
    image_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 3,
):
    """Streaming perceptual-hash dedup: each micro-batch of media
    payloads is dHashed, flagged against the STORED corpus hash table
    (+ earlier rows in the same batch, keep-first), and folded into the
    store — ingest-time near-dup screening for an image/frame firehose,
    the multimodal sibling of :func:`near_dup_flags`.  Returns the
    ``DataStreamWriter`` (caller picks trigger/checkpoint and starts
    it); per-batch flag rows land under ``{store_path}_flags/`` as one
    ``batch=N`` partition each.

    At-least-once safety (the dhash fold is NOT idempotent — a replayed
    batch would self-match against its own stored hashes): store rows
    carry ``__last_batch`` and a replayed batch id is a NO-OP, the same
    guard as the sketch stores; the flags write is idempotent on its
    own (per-batch partition OVERWRITE), so a crash between the flags
    write and the store publish replays cleanly."""
    from pyspark.sql import functions as _F

    from ..operators import dhash_dedup_against, image_dhash
    from ..sources import manifest_publish, manifest_resolve, read_store

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        exists = manifest_resolve(spark, store_path) is not None
        if exists:
            applied = (
                read_store(spark, store_path)
                .agg(_F.max("__last_batch"))
                .collect()[0][0]
            )
            if applied is not None and batch_id <= applied:
                return  # at-least-once replay of an already-merged batch
        # one decode+hash pass per batch; everything below reads blocks
        hashes = image_dhash(batch_df, image_col, id_col).localCheckpoint(
            eager=True
        )
        flags = dhash_dedup_against(
            hashes, spark, store_path, id_col, max_hamming, update=False
        )
        # idempotent flags: a per-batch partition overwrite, BEFORE the
        # store publish — a crash in between replays to identical flags
        flags.write.mode("overwrite").parquet(
            f"{store_path}_flags/batch={batch_id}"
        )
        new_rows = hashes.select(
            id_col, "dhash_hi", "dhash_lo"
        ).withColumn("__last_batch", _F.lit(batch_id).cast("long"))
        merged = (
            read_store(spark, store_path).unionByName(new_rows)
            if exists
            else new_rows
        )
        manifest_publish(
            spark,
            store_path,
            lambda p: merged.write.mode("overwrite").parquet(p),
        )

    return stream_df.writeStream.foreachBatch(_process)


def streaming_enrich(
    stream_df: DataFrame,
    dim_store_path: str,
    on: str,
    dim_cols: tuple,
    out_path: str,
):
    """Stream-static DIMENSION enrichment against a live manifest store
    (E226): each micro-batch joins the CURRENT version of an atomically
    republished dimension (:func:`~..sources.manifest_publish` — a
    republish between batches is picked up at the next batch boundary,
    never mid-batch) and appends the enriched rows, stamped with the
    dimension version they were joined against (``__dim_version``) —
    the audit column that makes "which rows saw stale dims" a filter
    instead of a forensic exercise.

    A plain Spark stream-static join plans the static side ONCE, so a
    repointed manifest would keep serving the plan-time version (or
    crash when it is GC'd); reading the store inside ``foreachBatch``
    is the correct refresh boundary, and the small dim broadcasts.

    Unmatched stream rows keep NULL dim columns (left join — ingestion
    must not drop facts because a dim is late; filter on NULLs
    downstream if it must).  Returns the ``DataStreamWriter``."""
    from ..sources import manifest_resolve, read_store

    dim_cols = tuple(dim_cols)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        live = manifest_resolve(spark, dim_store_path)
        version = live.rstrip("/").rsplit("/", 1)[-1] if live else "legacy"
        dim = read_store(spark, dim_store_path).select(
            on, *dim_cols
        )
        out = (
            batch_df.join(F.broadcast(dim), on, "left")
            .withColumn("__dim_version", F.lit(version))
            .withColumn("__batch_id", F.lit(int(batch_id)).cast("long"))
        )
        out.write.mode("append").parquet(out_path)

    return stream_df.writeStream.foreachBatch(_process)


def streaming_reservoir(
    stream_df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    salt: str = "",
    buckets: int = 8,
) -> DataFrame:
    """Deterministic streaming sample-of-exactly-n: the streaming tier of
    :func:`~..operators.cleaning.sample_exact_n` (same md5 race — the n
    globally smallest ``md5(salt ‖ id)`` win), maintained incrementally
    so "give me the same 10k-doc eval subset the batch job picks" works
    on an unbounded stream without reprocessing.

    Two-level shape (the single-key global-top-n state store would
    serialize every row through one task): rows hash into ``buckets``
    state groups, each keeping its n smallest keys; a row is EMITTED the
    batch it enters its bucket's current top-n.  Any global winner has
    < n smaller keys globally, hence < n smaller in its bucket, so it
    always enters (and is never silently lost); later evictions don't
    retract sink rows, so the sink holds a small candidate SUPERSET
    (≤ n per bucket alive at any time) and the consumer finishes with
    one batch-side "n smallest by sample_key" over ≤ buckets·n rows —
    that final pick equals the batch tier bit-for-bit regardless of
    batch boundaries or arrival order (the min-n of a set is
    fold-order-free).

    State per bucket is one array of ≤ n ``key|id`` strings; no
    timeout, no watermark needed (the race is insertion-only)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if n <= 0:
        raise ValueError("n must be positive")
    id_type = stream_df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, sample_key string"
    keyed = stream_df.select(
        F.col(id_col).cast("string").alias("__id"),
        F.md5(
            F.concat(F.lit(salt), F.col(id_col).cast("string"))
        ).alias("__key"),
        (
            F.crc32(F.col(id_col).cast("string")) % int(buckets)
        ).alias("__bucket"),
    )

    def fn(key: tuple, pdfs: "Iterable[pd.DataFrame]", state) -> "Iterable[pd.DataFrame]":
        fresh = []
        for pdf in pdfs:
            fresh.extend(
                f"{k}|{i}" for k, i in zip(pdf["__key"], pdf["__id"])
            )
        old = list(state.get[0]) if state.exists else []
        merged = sorted(set(old) | set(fresh))[: int(n)]
        state.update((merged,))
        old_set = set(old)
        winners = [e for e in merged if e not in old_set]
        if not winners:
            return
        ks, ids = zip(*[e.split("|", 1) for e in winners])
        out = pd.DataFrame({id_col: ids, "sample_key": ks})
        yield out

    return (
        keyed.groupBy("__bucket")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="cand array<string>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_sample_per_key(
    stream_df: DataFrame,
    cap: int,
    key_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-key deterministic cap on a stream — the streaming tier of
    :func:`~..operators.cleaning.sample_per_key` (same hash60 race:
    the ``cap`` smallest ``hash60(id)`` per key win): domain/language
    capping at INGEST time, so one mirror farm can't flood the corpus
    store no matter how long the stream runs.

    Same candidate-superset contract as :func:`streaming_reservoir`:
    a row is emitted the batch it enters its key's current top-``cap``
    (any final winner always does; evictions never retract), and the
    consumer's per-key ``cap``-smallest pick over the sink equals the
    batch operator bit-for-bit regardless of batch boundaries.  State
    is one ≤ ``cap``-entry array per DISTINCT key, partitioned across
    executors by the key — the natural shard for per-key state.  Race
    keys are zero-padded so string order == numeric hash60 order (ties
    broken by the id's string form — identical to the batch tier up to
    hash60 collisions, ~2^-60/pair)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if cap <= 0:
        raise ValueError("cap must be positive")
    id_type = stream_df.schema[id_col].dataType.simpleString()
    key_type = stream_df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, {id_col} {id_type}, race_key long"
    )
    keyed = stream_df.select(
        F.col(key_col).alias("__k"),
        F.col(id_col).cast("string").alias("__id"),
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        )
        .cast("long")
        .alias("__rk"),
    )

    def fn(key: tuple, pdfs: "Iterable[pd.DataFrame]", state) -> "Iterable[pd.DataFrame]":
        fresh = []
        for pdf in pdfs:
            fresh.extend(
                f"{int(rk):019d}|{i}"
                for rk, i in zip(pdf["__rk"], pdf["__id"])
            )
        old = list(state.get[0]) if state.exists else []
        merged = sorted(set(old) | set(fresh))[: int(cap)]
        state.update((merged,))
        old_set = set(old)
        winners = [e for e in merged if e not in old_set]
        if not winners:
            return
        rks, ids = zip(*[e.split("|", 1) for e in winners])
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(winners),
                id_col: ids,
                "race_key": [int(r) for r in rks],
            }
        )

    return keyed.groupBy("__k").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="cand array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_pagerank_store(
    stream_df: DataFrame,
    store_path: str,
    src_col: str = "src",
    dst_col: str = "dst",
    cold_iterations: int = 8,
    warm_iterations: int = 4,
    damping_pct: int = 85,
    unit: int = 10**9,
):
    """Streaming link-graph rank maintenance — E281 made continuous:
    each micro-batch of raw edges folds into a canonical edge store
    (batch-sized anti-join prep, the store is never re-canonicalized)
    and the rank vector re-converges with a BOUNDED warm-start schedule
    (``warm_iterations`` fixed integer steps from the stored vector; the
    very first batch ranks cold with ``cold_iterations``).  The
    crawl-discovery shape end to end: frontier batches arrive, the
    graph store grows, ranks stay current without a cold restart per
    trigger.

    Store layout: ``<path>/edges`` (canonical src/dst) and
    ``<path>/ranks`` (node, rank_nano, __last_batch) — both
    manifest-published.  Edges publish FIRST, the ``__last_batch``
    replay guard rides the ranks store: a crash between the two
    publishes replays the batch, whose edge fold is then an anti-join
    no-op and whose warm rerank from the still-previous ranks produces
    the identical vector — at-least-once delivery converges to the
    exactly-once result.  Returns the ``DataStreamWriter``."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        _merge_pagerank_batch(
            batch_df,
            batch_id,
            store_path,
            src_col,
            dst_col,
            cold_iterations,
            warm_iterations,
            damping_pct,
            unit,
        )

    return stream_df.writeStream.foreachBatch(_process)


def _merge_pagerank_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    src_col: str,
    dst_col: str,
    cold_iterations: int,
    warm_iterations: int,
    damping_pct: int,
    unit: int,
) -> None:
    """One micro-batch fold of :func:`streaming_pagerank_store`,
    module-level so the replay guard is directly testable."""
    from ..operators.graphs import fold_edges, pagerank_integer

    spark = batch_df.sparkSession
    base = store_path.rstrip("/")
    edges_path = base + "/edges"
    ranks_path = base + "/ranks"
    batch = batch_df.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if _store_exists(spark, ranks_path):
        ranks = _store_read(spark, ranks_path)
        applied = ranks.select(F.max("__last_batch")).collect()[0][0]
        if applied is not None and batch_id <= applied:
            return  # at-least-once replay of an already-merged batch
        edges = _store_read(spark, edges_path)
        # merged feeds BOTH the rank run and the edge publish (fan-out)
        merged = fold_edges(edges, batch).persist()
        new_ranks = pagerank_integer(
            merged,
            iterations=warm_iterations,
            damping_pct=damping_pct,
            unit=unit,
            init_ranks=ranks.select("node", "rank_nano"),
            assume_canonical=True,
        )
    else:
        merged = fold_edges(None, batch).persist()
        new_ranks = pagerank_integer(
            merged,
            iterations=cold_iterations,
            damping_pct=damping_pct,
            unit=unit,
            assume_canonical=True,
        )
    # pagerank_integer's internal checkpoints materialized `merged` and
    # detached `new_ranks` from the old store versions, so the publishes
    # below cannot invalidate a plan they still feed.  Edges FIRST; the
    # guarded ranks table LAST (see the crash analysis in the docstring).
    _swap_publish(merged, spark, edges_path)
    _swap_publish(
        new_ranks.withColumn(
            "__last_batch", F.lit(int(batch_id)).cast("long")
        ),
        spark,
        ranks_path,
    )
    merged.unpersist()


def streaming_term_index_store(
    stream_df: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Continuous inverted-index maintenance — E292 made streaming:
    each micro-batch of new/re-crawled documents folds into the stored
    postings table (batch tokenize + one id anti-join; stale postings
    of re-crawled ids drop, the corpus never re-tokenizes), so
    keyword/BM25 ranking over the store always equals a from-scratch
    rebuild of the current corpus state.

    The fold is IDEMPOTENT by construction (re-applying a batch drops
    then re-adds identical postings), so the ``__last_batch`` guard is
    a short-circuit, not a correctness crutch — at-least-once delivery
    cannot corrupt the store even across a crash window.  One
    manifest-published table.  Returns the ``DataStreamWriter``."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        _merge_term_index_batch(
            batch_df, batch_id, store_path, id_col, text_col
        )

    return stream_df.writeStream.foreachBatch(_process)


def _merge_term_index_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    id_col: str,
    text_col: str,
) -> None:
    """One micro-batch fold of :func:`streaming_term_index_store`,
    module-level so the replay guard is directly testable."""
    from ..operators.search import append_to_term_index, build_term_index

    spark = batch_df.sparkSession
    if _store_exists(spark, store_path):
        idx = _store_read(spark, store_path)
        applied = idx.select(F.max("__last_batch")).collect()[0][0]
        if applied is not None and batch_id <= applied:
            return  # at-least-once replay of an already-merged batch
        merged = append_to_term_index(
            idx.drop("__last_batch"), batch_df, id_col, text_col
        )
    else:
        merged = build_term_index(batch_df, id_col, text_col)
    _swap_publish(
        merged.withColumn(
            "__last_batch", F.lit(int(batch_id)).cast("long")
        ),
        spark,
        store_path,
    )


def streaming_frontier_store(
    stream_pages: DataFrame,
    store_path: str,
    html_col: str = "html",
    id_col: str = "doc_id",
    drop_rel=("nofollow", "sponsored", "ugc"),
):
    """Continuous crawl-frontier discovery — E249 made streaming: each
    micro-batch of fetched pages folds its per-URL discovery aggregate
    (followable-link counts + min-(page, position) first discoverer)
    into the manifest-published store.  Both folds are COMMUTATIVE
    (counts add, first = min struct), so the store equals the one-shot
    aggregate over all pages regardless of batch order/boundaries; the
    ``__last_batch`` guard makes at-least-once delivery exact (counts
    add, so a replayed batch must be a no-op — the E155 discipline).
    Serve with ``operators.html.frontier_from_store`` (crawled anti-join
    and domain cap applied at SERVE time, so a growing crawled set or a
    retuned cap never rebuilds the store).  Returns the
    ``DataStreamWriter``."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        _merge_frontier_batch(
            batch_df, batch_id, store_path, html_col, id_col, drop_rel
        )

    return stream_pages.writeStream.foreachBatch(_process)


def _merge_frontier_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    html_col: str,
    id_col: str,
    drop_rel,
) -> None:
    """One micro-batch fold of :func:`streaming_frontier_store`,
    module-level so the replay guard is directly testable."""
    from ..operators.html import discovered_targets, merge_frontier_targets

    spark = batch_df.sparkSession
    batch_t = discovered_targets(
        batch_df, html_col=html_col, id_col=id_col, drop_rel=drop_rel
    )
    if _store_exists(spark, store_path):
        stored = _store_read(spark, store_path)
        applied = stored.select(F.max("__last_batch")).collect()[0][0]
        if applied is not None and batch_id <= applied:
            return  # at-least-once replay of an already-merged batch
        merged = merge_frontier_targets(
            stored.drop("__last_batch"), batch_t
        )
    else:
        merged = batch_t
    _swap_publish(
        merged.withColumn(
            "__last_batch", F.lit(int(batch_id)).cast("long")
        ),
        spark,
        store_path,
    )
