"""Training-corpus cleaning operators: PII scrubbing, Gopher-style quality
flags, benchmark decontamination, and per-key capped sampling.

These are the standard pre-training hygiene passes (C4 / Gopher / GPT-3
data pipelines describe the same shapes): regex scrubbing and per-document
quality heuristics are narrow codegen'd projections; decontamination is a
hash-keyed semi-join against the (small) eval-set n-gram index; capped
sampling is one window over the key.  Zero Python in any hot path except
the shared Arrow tokenizer.

Scale notes (100 TB):
- ``scrub_pii`` / ``gopher_quality_flags``: per-row projections, no
  shuffle; whole-stage codegen handles the regex chains.
- ``decontaminate``: the eval-set index is ``distinct`` 8-byte hashes of
  benchmark n-grams — millions of rows at most, broadcastable; the corpus
  side streams through one explode + broadcast-join + partial count, so
  nothing but (doc_id, hit) pairs shuffles.
- ``sample_per_key``: one shuffle on the key; the md5-derived order makes
  the sample deterministic across engines, runs, and partitionings —
  unlike ``sample()``/``rand()``, re-runs of a 1000-executor job pick the
  same rows.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..caching import materialize_release
from ..functions.text import hash60, hashed_shingles_pd, tokens_pd
from ..partitioning import spread

__all__ = [
    "encode_categoricals",
    "frequent_itemsets",
    "select_max_coverage",
    "split_leak_audit",
    "PII_PATTERNS",
    "scrub_pii",
    "gopher_quality_flags",
    "decontaminate",
    "decontaminate_fuzzy",
    "decontaminate_semantic",
    "filter_lines_quality",
    "wordlist_filter",
    "sample_per_key",
    "sample_exact_n",
    "stratified_sample",
    "weighted_sample",
    "weighted_sample_k",
    "deterministic_shuffle",
    "strip_markup",
    "normalize_unicode",
    "fold_confusables",
    "CONFUSABLES",
    "augment_token_edits",
    "MARKUP_ENTITIES",
    "oversample_by_key",
    "pack_token_budget",
    "sample_to_token_budget",
    "chunk_documents",
    "remove_boilerplate_spans",
    "dedup_spans_within_doc",
    "dedup_substrings_global",
    "importance_weights",
    "trim_by_quantile",
    "mixture_report",
    "length_buckets",
    "chunk_content_defined",
    "assign_splits",
    "build_training_blocks",
]

#: (name, regex, replacement) — RE2/Java-compatible subset (no lookaround,
#: no backreferences) so Spark and DuckDB match identically.  Applied in
#: order; counts are taken on the progressively-scrubbed text so an email's
#: digits can't double-count as a phone.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
]


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_clean"
) -> DataFrame:
    """Replace emails / IPv4s / phone-number runs with typed placeholder
    tokens and count each category (``n_email``, ``n_ipv4``, ``n_phone``).

    One narrow projection; the regex chain stays inside whole-stage
    codegen.  Counts reflect the scrub order (each pattern counts on the
    text AFTER the previous replacements), matching what was actually
    redacted."""
    out = spread(df)
    cur: Column = F.col(text_col)
    counts: dict[str, Column] = {}
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, repl)
    return out.withColumns({**counts, out_col: cur})


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 50,
    max_dup_3gram_frac: float = 0.3,
    min_mean_token_len: float = 3.0,
    max_mean_token_len: float = 10.0,
) -> DataFrame:
    """Gopher-style repetition/shape heuristics (Rae et al. 2021 §A1.1):
    token count, mean token length, duplicate word-3-gram fraction, and a
    combined ``flag_low_quality``.  Tokenizes once via the Arrow kernel;
    every stat derives from the materialized array (no per-column
    re-tokenize)."""
    t = F.col("__toks")
    n = F.size(t)
    # full 3-gram multiset (duplicates INCLUDED — repetition is the point);
    # docs shorter than 3 tokens count as one degenerate gram
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
        lambda i: F.array_join(F.slice(t, i, 3), " "),
    )
    # total gram count == the sequence length by construction; using the
    # closed form keeps ``grams`` evaluated exactly once (inside
    # array_distinct) even after projection collapse inlines it
    total = F.greatest(n - 2, F.lit(1))
    dup_frac = (total - F.size(F.array_distinct(grams))).cast("double") / total.cast(
        "double"
    )
    mean_len = F.aggregate(t, F.lit(0), lambda a, x: a + F.length(x)).cast(
        "double"
    ) / F.greatest(n, F.lit(1)).cast("double")
    return (
        spread(df)
        .withColumn("__toks", tokens_pd(F.col(text_col)))
        .withColumns(
            {
                "n_tokens": n,
                "mean_token_len": mean_len,
                "frac_dup_3gram": dup_frac,
            }
        )
        .withColumn(
            "flag_low_quality",
            (F.col("n_tokens") < min_tokens)
            | (F.col("frac_dup_3gram") > max_dup_3gram_frac)
            | (F.col("mean_token_len") < min_mean_token_len)
            | (F.col("mean_token_len") > max_mean_token_len),
        )
        .drop("__toks")
    )


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    n: int = 5,
    bloom_prefilter: bool = False,
    bloom_bits: int = 1 << 23,
    bloom_hashes: int = 5,
    bloom_blob: bytes | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any word
    ``n``-gram with the evaluation set (the GPT-3/PaLM 13-gram-overlap
    recipe, ``n`` configurable downward for short texts).

    The eval index is ``distinct`` 60-bit md5 hashes of eval n-grams —
    small by construction (benchmarks are MBs, not TBs) and broadcast, so
    the corpus side never shuffles its text: explode → broadcast semi-ish
    join → per-doc distinct-hit count.  Returns every input row with
    ``n_eval_grams_hit`` and ``contaminated``.

    ``bloom_prefilter=True`` is the 100 TB tier with IDENTICAL results:
    a distributed-built Bloom filter (no false negatives) screens each
    document in one narrow Arrow pass, and only bloom-positive documents
    — a sliver of the corpus in practice — pay the explode + join for
    exact verification.  The ~50× gram-explode row multiplication thus
    applies to almost nothing."""
    eval_text = eval_text_col or text_col
    eval_grams = (
        eval_df.select(F.explode(hashed_shingles_pd(F.col(eval_text), n)).alias("gh"))
        .distinct()
    )

    base = spread(df)
    if bloom_prefilter:
        from ..functions.bloom import bloom_contains_text, build_bloom_from_texts

        # The prefilter is a fused kernel: tokenize → batch token-hash →
        # rolling n-gram hash → bitmap probe, ONE Arrow crossing with text
        # in and bool out.  No gram strings and no md5 are materialized for
        # the (vast) bloom-negative majority; the oracle-matching hash60 is
        # only paid by the bloom-positive sliver in exact verification.
        # The eval set is broadcast-small by contract (the exact tier
        # broadcasts it whole), so the bitmap is built driver-side from one
        # pure-JVM collect of the eval text — no Python-worker stage, no
        # shuffle.
        # the bitmap is a storable artifact: build once per eval-set
        # release, pass ``bloom_blob`` on every subsequent corpus pass
        # (same bloom_bits/bloom_hashes) to skip the build job entirely
        if bloom_blob is not None and len(bloom_blob) * 8 != bloom_bits:
            raise ValueError(
                f"bloom_blob holds {len(bloom_blob) * 8} bits but "
                f"bloom_bits={bloom_bits}; pass the bloom_bits the blob "
                "was built with (a mismatched probe would index out of "
                "bounds or silently miss)"
            )
        blob = (
            bloom_blob
            if bloom_blob is not None
            else build_bloom_from_texts(eval_df, eval_text, n, bloom_bits, bloom_hashes)
        )
        maybe = base.filter(
            bloom_contains_text(blob, bloom_bits, bloom_hashes, F.col(text_col), n)
        )
        doc_grams = maybe.select(
            F.col(id_col).alias("__id"),
            F.explode(hashed_shingles_pd(F.col(text_col), n)).alias("gh"),
        )
    else:
        doc_grams = base.select(
            F.col(id_col).alias("__id"),
            F.explode(hashed_shingles_pd(F.col(text_col), n)).alias("gh"),
        )

    hits = (
        doc_grams.join(F.broadcast(eval_grams), "gh")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_eval_grams_hit"))
    )
    return (
        df.join(hits.withColumnRenamed("__id", id_col), id_col, "left")
        .withColumn(
            "n_eval_grams_hit", F.coalesce(F.col("n_eval_grams_hit"), F.lit(0))
        )
        .withColumn("contaminated", F.col("n_eval_grams_hit") > 0)
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    context-window preparation for training dataloaders.

    Stride = ``chunk_tokens - overlap``; chunk i covers tokens
    [i*stride, i*stride + chunk_tokens).  ceil((n - overlap) / stride)
    chunks per doc (minimum 1 — short docs yield one short chunk).  A
    purely narrow per-row transform: tokenize once, emit all windows in
    one explode; NO shuffle, so it scales linearly with input splits and
    composes with downstream repartitioning.  All arithmetic is integer
    (identical in the SQL oracle).

    Returns (id, chunk_idx, chunk_text, n_chunk_tokens)."""
    if overlap < 0 or chunk_tokens <= overlap:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    t = F.col("__toks")
    n = F.size(t)
    # integer ceil((n - overlap)/stride), clamped to >= 1; `div` keeps the
    # arithmetic in longs (token counts fit; no double rounding anywhere)
    n_chunks = F.greatest(
        F.expr(
            f"(size(__toks) - {overlap} + {stride - 1}) div {stride}"
        ).cast("long"),
        F.lit(1).cast("long"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.array_join(
                F.slice(t, (i * stride + 1).cast("int"), chunk_tokens), " "
            ).alias("chunk_text"),
            F.size(F.slice(t, (i * stride + 1).cast("int"), chunk_tokens))
            .cast("long")
            .alias("n_chunk_tokens"),
        ),
    )
    return (
        spread(df)
        .withColumn("__toks", tokens_pd(F.col(text_col)))
        .select(F.col(id_col), F.explode(chunks).alias("__c"))
        .select(id_col, "__c.chunk_idx", "__c.chunk_text", "__c.n_chunk_tokens")
    )


def pack_token_budget(
    df: DataFrame,
    budget: int,
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_groups: int = 64,
    order_hash_col: str | None = None,
) -> DataFrame:
    """Assign rows to training shards by cumulative weight budget (token
    packing for dataloader-sized output files).

    Rows are first hashed into ``num_groups`` independent pack groups
    (parallelism knob — a single global ordering would serialize 100 TB
    through one window partition), then greedily packed in a DETERMINISTIC
    md5-derived order: ``shard_id = cum_weight_before // budget``, so a
    shard holds consecutive rows until the budget spills.  A row heavier
    than ``budget`` occupies its shard alone (standard greedy semantics).
    The (pack_group, shard_id) pair is the shard key; everything is
    engine-reproducible — the same corpus packs identically on any run,
    cluster size, or engine.  One shuffle on ``pack_group``.

    ``order_hash_col`` retains the md5 ordering hash under that name so
    downstream consumers (e.g. :func:`build_training_blocks`) can reuse
    the packing order without re-hashing every id."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    if num_groups <= 0:
        raise ValueError("num_groups must be positive")
    if order_hash_col is not None and order_hash_col in df.columns:
        raise ValueError(
            f"order_hash_col {order_hash_col!r} already exists in the input"
        )
    hcol = order_hash_col or "__oh"
    # internal scratch name must not clobber (then silently drop) a
    # caller's column
    while order_hash_col is None and hcol in df.columns:
        hcol = "_" + hcol
    # no spread(): the window's shuffle on pack_group redistributes, and
    # the pre-shuffle work (one md5) doesn't justify a second exchange.
    # The hash is materialized as a column so pack_group, the window order,
    # and any order_hash_col consumer share ONE md5 per row
    grouped = df.withColumn(
        hcol, hash60(F.col(id_col).cast("string"))
    ).withColumn("pack_group", F.pmod(F.col(hcol), F.lit(num_groups)))
    w = (
        Window.partitionBy("pack_group")
        .orderBy(F.col(hcol), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(weight_col).over(w), F.lit(0)).cast("long")
    # integer `div` (exact) — float division + floor would wobble near 2^53
    out = (
        grouped.withColumn("__cum_before", cum_before)
        .withColumn("shard_id", F.expr(f"__cum_before div {int(budget)}"))
        .drop("__cum_before")
    )
    return out if order_hash_col else out.drop(hcol)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    denom: int = 1 << 20,
) -> DataFrame:
    """Keep a per-key FRACTION of rows (corpus mixture re-weighting: "30%
    of web, 100% of books"), selected by a deterministic md5-derived coin:
    a row survives iff ``hash60(id) % denom < round(fraction * denom)``.

    Unlike ``DataFrame.sampleBy`` the selection is reproducible across
    engines, runs, and partitionings, and it composes: sampling at 0.5
    then 0.5 again keeps exactly the 0.25 prefix of the same hash order.
    A narrow codegen'd filter — no shuffle, no state; fraction resolution
    is 1/denom.  Complement of :func:`sample_per_key` (which caps COUNTS
    per key)."""
    for k, f in {**fractions, "default": default_fraction}.items():
        if not (0.0 <= f <= 1.0):
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {f}")
    thresh: Column = F.lit(int(round(default_fraction * denom)))
    for k in sorted(fractions, reverse=True):
        thresh = F.when(
            F.col(key_col) == k, F.lit(int(round(fractions[k] * denom)))
        ).otherwise(thresh)
    coin = F.pmod(hash60(F.col(id_col).cast("string")), F.lit(denom))
    return df.filter(coin < thresh)


def sample_per_key(
    df: DataFrame, key: str, cap: int, id_col: str = "doc_id"
) -> DataFrame:
    """Keep at most ``cap`` rows per ``key`` value, chosen by a
    DETERMINISTIC md5-derived shuffle order (domain/language capping for
    corpus balancing).  Unlike ``rand()``-based sampling the selection is
    reproducible across engines, runs, and partitionings, and unlike
    ``limit`` it is unbiased w.r.t. storage order.  One shuffle on the
    key."""
    order = hash60(F.col(id_col).cast("string"))
    w = Window.partitionBy(key).orderBy(order, F.col(id_col))
    # no spread(): the window shuffles on the key already
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= cap)
    )


def sample_to_token_budget(
    df: DataFrame,
    budgets: dict[str, int],
    key_col: str = "source",
    weight_col: str = "n_tokens",
    default_budget: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Select a per-key token-budgeted subset (mixture construction: "50 B
    tokens of web, 5 B of code"): rows are taken in a DETERMINISTIC
    md5-derived order until the key's budget is exhausted.  A row is kept
    iff the cumulative weight of the rows BEFORE it (same order) is still
    under the key's budget — so each key overshoots by at most one row and
    yields at least one row when its budget is positive.

    Complements :func:`stratified_sample` (fraction-based, needs no
    weights) and :func:`pack_token_budget` (assigns shards, drops
    nothing).  Reproducible across engines, runs, and partitionings; one
    shuffle on the key.  Output adds ``w_before`` (BIGINT cumulative
    weight preceding the row) for audit."""
    for k, b in {**budgets, "default": default_budget}.items():
        if b < 0:
            raise ValueError(f"budget for {k!r} must be >= 0, got {b}")
    order = hash60(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy(key_col)
        .orderBy(order, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    budget_c: Column = F.lit(int(default_budget))
    for k in sorted(budgets, reverse=True):
        budget_c = F.when(F.col(key_col) == k, F.lit(int(budgets[k]))).otherwise(
            budget_c
        )
    # no spread(): the window's shuffle on the key redistributes anyway
    return (
        df.withColumn(
            "w_before",
            F.coalesce(F.sum(weight_col).over(w), F.lit(0)).cast("long"),
        )
        .filter(F.col("w_before") < budget_c)
    )


def oversample_by_key(
    df: DataFrame,
    key_col: str,
    repeats: dict[str, float],
    default_repeat: float = 1.0,
    id_col: str = "doc_id",
    denom: int = 1 << 20,
) -> DataFrame:
    """Repeat rows per key by a FRACTIONAL epoch factor (training-mixture
    upsampling: "2.5 epochs of wiki, 1 epoch of web"): every row gets
    ``floor(r)`` copies plus one more iff its deterministic md5 coin
    ``hash60(id) % denom < round(frac(r) * denom)`` — so a key's expected
    multiplicity is exactly ``r`` and the SAME rows carry the extra copy
    on every engine, run, and partitioning.

    Output adds ``copy_idx`` (1..n_copies) so downstream shuffles/packing
    treat copies as distinct rows.  Upsampling companion of
    :func:`stratified_sample` (which down-weights); ``r < 1`` keys are
    valid too (0 or 1 copies — equivalent to stratified sampling).  One
    narrow projection + explode, no shuffle."""
    for k, r in {**repeats, "default": default_repeat}.items():
        if r < 0:
            raise ValueError(f"repeat for {k!r} must be >= 0, got {r}")

    def _parts(r: float) -> tuple[int, int]:
        base = int(r)
        return base, int(round((r - base) * denom))

    db, dt = _parts(default_repeat)
    base_c: Column = F.lit(db)
    thresh_c: Column = F.lit(dt)
    for k in sorted(repeats, reverse=True):
        b, t = _parts(repeats[k])
        cond = F.col(key_col) == k
        base_c = F.when(cond, F.lit(b)).otherwise(base_c)
        thresh_c = F.when(cond, F.lit(t)).otherwise(thresh_c)
    coin = F.pmod(hash60(F.col(id_col).cast("string")), F.lit(denom))
    n_copies = base_c + (coin < thresh_c).cast("int")
    return (
        spread(df)
        .withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__n")
    )


def _with_spans(df: DataFrame, text_col: str, span_tokens: int) -> DataFrame:
    """Adds ``__toks``/``__n_spans``/``__spans`` (array of (span_idx,
    span_text) structs over non-overlapping ``span_tokens``-token windows)
    — one narrow projection, tokenized once via the Arrow kernel."""
    k = span_tokens
    n_spans = F.expr(f"(size(__toks) + {k - 1}) div {k}").cast("long")
    t = F.col("__toks")
    spans = F.transform(
        F.sequence(F.lit(0).cast("long"), F.col("__n_spans") - 1),
        lambda i: F.struct(
            i.alias("span_idx"),
            F.array_join(F.slice(t, (i * k + 1).cast("int"), k), " ").alias(
                "span_text"
            ),
        ),
    )
    return (
        spread(df)
        .withColumn("__toks", tokens_pd(F.col(text_col)))
        .withColumn("__n_spans", n_spans)
        .withColumn("__spans", spans)
    )


def dedup_spans_within_doc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 2,
) -> DataFrame:
    """WITHIN-document repetition removal (the Rae et al. 2021 repetition
    that :func:`gopher_quality_flags` only *measures*): split the text
    into non-overlapping ``span_tokens``-token spans and keep only the
    FIRST occurrence of each span text, dropping later repeats.

    Returns (id, text_clean, n_spans, n_removed).  Completes the
    repetition trio: within-doc (this), inter-doc boilerplate
    (:func:`remove_boilerplate_spans`), near-duplicate docs
    (:func:`decontaminate_fuzzy` / the dedup family).

    Scale shape: a PURELY NARROW per-row transform — no shuffle, no
    state, no join; first-occurrence testing is an ``array_position``
    probe against the row's own materialized span-text array (spans per
    doc is small by construction, so the per-row quadratic probe is
    bounded)."""
    if span_tokens <= 0:
        raise ValueError("span_tokens must be positive")
    base = _with_spans(df, text_col, span_tokens).withColumn(
        "__texts", F.transform(F.col("__spans"), lambda s: s["span_text"])
    )
    kept = F.filter(
        F.col("__spans"),
        lambda s: F.array_position(F.col("__texts"), s["span_text"])
        == s["span_idx"] + 1,
    )
    return base.select(
        id_col,
        F.array_join(
            F.transform(kept, lambda s: s["span_text"]), " "
        ).alias("text_clean"),
        F.col("__n_spans").alias("n_spans"),
        (F.col("__n_spans") - F.size(kept)).cast("long").alias("n_removed"),
    )


def remove_boilerplate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 8,
    min_docs: int = 2,
    release: bool = True,
) -> DataFrame:
    """Remove inter-document repeated spans (C4-style boilerplate
    removal): split each document into non-overlapping ``span_tokens``-token
    spans, and delete every span whose 60-bit hash occurs in at least
    ``min_docs`` DISTINCT documents — headers, footers, license blurbs and
    navigation chrome repeat across pages, body text doesn't.

    Returns (id, text_clean, n_spans, n_removed) with ``text_clean`` the
    surviving spans rejoined in order ('' when everything was
    boilerplate).

    Scale shape (100 TB): the tokenized span array is computed ONCE per
    row (persisted, released on return); only 8-byte (hash, id, idx)
    triples ever shuffle.  Distinct-doc counts use a two-level aggregation
    (map-side partial on (hash, id)); the frequent-span set is by
    construction the corpus's repeated content — orders of magnitude
    smaller than the span stream — and AQE broadcasts the probe join when
    it fits.  Per-doc removal lists come back as a tiny (id, idx-list)
    table joined once against the persisted base."""
    if span_tokens <= 0:
        raise ValueError("span_tokens must be positive")
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would remove everything)")
    base = (
        _with_spans(df, text_col, span_tokens)
        .select(id_col, "__n_spans", "__spans")
        .persist()
    )
    sh = (
        base.select(
            F.col(id_col).alias("__id"), F.explode("__spans").alias("__s")
        )
        .select(
            "__id",
            F.col("__s.span_idx").alias("__idx"),
            hash60(F.col("__s.span_text")).alias("__h"),
        )
        .persist()
    )
    freq = (
        sh.select("__h", "__id")
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_docs)
        .select("__h")
    )
    removed = (
        sh.join(freq, "__h")
        .groupBy("__id")
        .agg(F.collect_set("__idx").alias("__removed"))
        .withColumnRenamed("__id", id_col)
    )
    out = (
        base.join(removed, id_col, "left")
        .withColumn(
            "__removed", F.coalesce("__removed", F.array().cast("array<bigint>"))
        )
        .select(
            id_col,
            F.array_join(
                F.transform(
                    F.filter(
                        "__spans",
                        lambda s: ~F.array_contains(
                            F.col("__removed"), s["span_idx"]
                        ),
                    ),
                    lambda s: s["span_text"],
                ),
                " ",
            ).alias("text_clean"),
            F.col("__n_spans").alias("n_spans"),
            F.size("__removed").cast("long").alias("n_removed"),
        )
    )
    return materialize_release(out, base, sh, release=release)


def decontaminate_fuzzy(
    df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    eval_id_col: str | None = None,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_est_jaccard: float = 0.25,
    max_key_freq: int = 1000,
    release: bool = True,
) -> DataFrame:
    """FUZZY benchmark decontamination: flag training documents that are
    near-duplicates of an eval-set document by MinHash estimate — catches
    paraphrased/reformatted leakage that exact n-gram overlap
    (:func:`decontaminate`) misses when the contamination is a lightly
    edited copy rather than a verbatim quote.

    Banded-LSH join of the corpus signatures against the eval signatures
    (only same-bucket pairs shuffle, both sides signature-only — text
    never leaves its scan), then per-doc aggregation.  Returns every
    input row with ``n_fuzzy_matches``, ``max_est_jaccard``, and
    ``fuzzy_contaminated`` (any eval match with signature-agreement
    Jaccard >= ``min_est_jaccard``).  Deterministic md5-derived MinHash:
    identical across engines, runs, and partitionings."""
    from .dedup import minhash_lsh_join, minhash_signatures

    doc_sigs = minhash_signatures(df, text_col, id_col, n, num_hashes).persist()
    eval_sigs = minhash_signatures(
        eval_df, eval_text_col or text_col, eval_id_col or id_col, n, num_hashes
    ).persist()
    pairs = minhash_lsh_join(
        doc_sigs, eval_sigs, num_hashes, bands, min_est_jaccard, max_key_freq
    )
    hits = (
        pairs.groupBy("id_new")
        .agg(
            F.count(F.lit(1)).alias("n_fuzzy_matches"),
            F.max("est_jaccard").alias("max_est_jaccard"),
        )
        .withColumnRenamed("id_new", id_col)
    )
    out = (
        df.join(hits, id_col, "left")
        .withColumn(
            "n_fuzzy_matches",
            F.coalesce(F.col("n_fuzzy_matches"), F.lit(0)).cast("long"),
        )
        .withColumn("fuzzy_contaminated", F.col("n_fuzzy_matches") > 0)
    )
    return materialize_release(out, doc_sigs, eval_sigs, release=release)


def decontaminate_semantic(
    df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    eval_id_col: str | None = None,
    dim: int = 64,
    min_cosine: float = 0.8,
) -> DataFrame:
    """SEMANTIC benchmark decontamination — the third tier of the family:
    :func:`decontaminate` catches verbatim n-gram quotes,
    :func:`decontaminate_fuzzy` catches lightly edited copies (MinHash
    shingle overlap), and this tier catches PARAPHRASED leakage —
    reworded/reordered eval content whose shingles no longer overlap but
    whose token distribution still does.  Composition of the model-free
    pieces: :func:`~.textops.hashed_embedding` (signed feature hashing,
    micro-quantized unit vectors — NO external model, deterministic md5
    end to end) scored by the :func:`~.similarity.sparse_topk_neighbors`
    inverted-index integer dot, so every similarity is an exact BIGINT
    (cosine × 1e12 up to quantization) and the whole tier value-hashes
    across engines — unlike embedding-model decontamination, which is
    rows-only by nature.

    Flags corpus documents whose hashed-embedding cosine against ANY
    eval document reaches ``min_cosine``.  Returns every input row plus
    ``n_semantic_matches``, ``max_dot`` (integer micro²-units; 0 when no
    match), ``best_eval_id`` (highest-dot eval doc, ties to the smallest
    id; NULL when none), ``semantic_contaminated``.

    Scale shape (100 TB): eval sets are MBs by contract, so the eval
    vector rows broadcast; the corpus-side join is per-bucket (Σ_b
    n_b·m_b pair rows, m bounded by the eval side) — corpus text never
    reshuffles, and the two embedding shuffles are on (id, bucket)
    integer rows.  Threshold filter runs BEFORE the per-doc window, so
    ranked state is match-only."""
    from ..operators.textops import hashed_embedding

    if not (0.0 < min_cosine <= 1.0):
        raise ValueError("min_cosine must be in (0, 1]")
    min_dot = int(math.floor(min_cosine * 1e12))
    # keep_empty_docs=False: zero-weight rows would be filtered here
    # anyway, so the distinct-id scan + left join inside the embedding
    # never need to run (the fused-aggregation plan fix)
    corpus = hashed_embedding(
        df, text_col, id_col, dim, as_rows=True, keep_empty_docs=False
    ).filter(F.col("w_micros") != 0)
    ev = hashed_embedding(
        eval_df,
        eval_text_col or text_col,
        eval_id_col or id_col,
        dim,
        as_rows=True,
        keep_empty_docs=False,
    ).filter(F.col("w_micros") != 0)
    dots = (
        corpus.select(
            F.col(id_col).alias("__id"),
            "bucket",
            F.col("w_micros").alias("__wa"),
        )
        .join(
            F.broadcast(
                ev.select(
                    F.col(eval_id_col or id_col).alias("__eid"),
                    "bucket",
                    F.col("w_micros").alias("__wb"),
                )
            ),
            "bucket",
        )
        .groupBy("__id", "__eid")
        .agg(F.sum(F.col("__wa") * F.col("__wb")).alias("__dot"))
        .filter(F.col("__dot") >= F.lit(min_dot))
    )
    # best eval doc in the same aggregate (highest dot, ties to the
    # smallest id) via a lexicographic struct min — no ranking window,
    # no extra exchange on __id
    hits = (
        dots.groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_semantic_matches"),
            F.max("__dot").cast("long").alias("max_dot"),
            F.min(
                F.struct(
                    (-F.col("__dot")).alias("nd"), F.col("__eid").alias("e")
                )
            )["e"].alias("best_eval_id"),
        )
        .withColumnRenamed("__id", id_col)
    )
    return (
        df.join(hits, id_col, "left")
        .withColumn(
            "n_semantic_matches",
            F.coalesce(F.col("n_semantic_matches"), F.lit(0)).cast("long"),
        )
        .withColumn(
            "max_dot", F.coalesce(F.col("max_dot"), F.lit(0)).cast("long")
        )
        .withColumn(
            "semantic_contaminated", F.col("n_semantic_matches") > 0
        )
    )


def trim_by_quantile(
    df: DataFrame,
    col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    by: tuple[str, ...] = (),
    id_col: str = "doc_id",
    mode: str = "exact",
    accuracy: int = 10000,
) -> DataFrame:
    """Drop rows outside the [lo, hi] quantile band of ``col`` (per
    ``by`` group when given) — winsor-style outlier trimming for length/
    quality distributions before mixing a corpus.  Null values are
    dropped (they have no quantile; engines also disagree on null sort
    order).

    ``mode='exact'``: rank-based — keep rows with ``floor(lo*n) <
    row_number <= ceil(hi*n)`` ordered by (col, id_col), so the kept set
    is deterministic across engines and safe to oracle-check.  One window
    shuffle on the group key; an UNGROUPED exact trim funnels the table
    through a single sorted partition, so at 100 TB group it or use:

    ``mode='approx'``: per-group ``percentile_approx`` cut values
    (distributed sketch, no sort), broadcast back, narrow filter.  The
    at-scale default for ungrouped tables; band edges are approximate
    (ties at the cut value are all kept)."""
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError("need 0 <= lo < hi <= 1")
    by = list(by)
    base = df.filter(F.col(col).isNotNull())
    if mode == "exact":
        w = Window.partitionBy(*by).orderBy(F.asc(col), F.asc(id_col))
        cw = Window.partitionBy(*by)
        out = (
            base.withColumn("__rn", F.row_number().over(w))
            .withColumn("__n", F.count(F.lit(1)).over(cw))
            .filter(
                (F.col("__rn") > F.floor(F.lit(float(lo)) * F.col("__n")))
                & (F.col("__rn") <= F.ceil(F.lit(float(hi)) * F.col("__n")))
            )
        )
        return out.drop("__rn", "__n")
    if mode == "approx":
        cuts = base.groupBy(*by).agg(
            F.percentile_approx(col, float(lo), accuracy).alias("__lo"),
            F.percentile_approx(col, float(hi), accuracy).alias("__hi"),
        )
        j = (
            base.join(F.broadcast(cuts), by)
            if by
            else base.crossJoin(F.broadcast(cuts))
        )
        return j.filter(
            (F.col(col) >= F.col("__lo")) & (F.col(col) <= F.col("__hi"))
        ).drop("__lo", "__hi")
    raise ValueError("mode must be 'exact' or 'approx'")


def length_buckets(
    df: DataFrame,
    len_col: str = "n_tokens",
    caps: tuple[int, ...] = (64, 128, 256, 512, 1024, 2048, 4096, 8192),
) -> DataFrame:
    """Sequence-length bucketing report: assign every row to the
    smallest cap >= its length and report, per bucket, ``(bucket_cap,
    n_docs, sum_len, padded_len, pad_waste_ppm)`` — the padding-waste
    audit run before batching variable-length sequences for training
    (a batch padded to its bucket cap wastes ``padded - sum`` token
    slots; choosing cap boundaries IS choosing that waste).

    Rows longer than the largest cap land in a ``bucket_cap IS NULL``
    overflow bucket (padded/waste NULL) — the signal to chunk first,
    not a silent drop.  ``pad_waste_ppm`` is exact integer
    parts-per-million via BIGINT ``div`` (both operands non-negative,
    so Spark's truncate and any floor-division engine agree); exactness
    holds while ``padded_len·10^6 < 2^63`` — ~1.1e9 docs per bucket at
    cap 8192.  Beyond that, bucket per source shard first.

    Caps are driver-held literals compiled into one CASE chain — the
    whole report is a single map-side-combined aggregate (one shuffle
    of ~len(caps) partial rows per task, never the corpus)."""
    caps = tuple(sorted(set(int(c) for c in caps)))
    if not caps or caps[0] <= 0:
        raise ValueError("caps must be positive integers")
    length = F.col(len_col).cast("long")
    bucket = F.lit(None).cast("long")
    for c in reversed(caps):
        bucket = F.when(length <= c, F.lit(c)).otherwise(bucket)
    grouped = (
        df.select(bucket.alias("bucket_cap"), length.alias("__len"))
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__len").alias("sum_len"),
        )
    )
    return grouped.select(
        "bucket_cap",
        "n_docs",
        "sum_len",
        (F.col("bucket_cap") * F.col("n_docs")).alias("padded_len"),
    ).withColumn(
        "pad_waste_ppm",
        F.expr("(padded_len - sum_len) * 1000000L div padded_len"),
    )


def chunk_content_defined(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
    divisor: int = 16,
    max_tokens: int = 256,
) -> DataFrame:
    """Content-defined chunking over TOKENS (the CDC idea — FastCDC/
    rsync — lifted to text and made fully relational): a chunk boundary
    falls AFTER any token whose trailing ``window``-gram hashes to
    ``0 mod divisor``, so boundaries depend only on LOCAL content —
    insert a sentence at the top of a document and every later chunk
    still re-aligns and re-hashes identically, which fixed-size
    chunking (E43) can never do.  That makes chunk-level md5 dedup
    across near-identical documents (mirrors, templated pages, edited
    re-uploads) actually fire.

    Output per chunk: ``(id_col, chunk_pos, first_pos, n_tokens,
    chunk_md5)`` — ``chunk_md5`` is md5 of the space-joined tokens, the
    cross-document dedup key.  Expected chunk length is ``divisor``
    tokens (geometric); ``max_tokens`` splits pathological runs with a
    deterministic fixed-offset post-pass (a min-size gate would need a
    sequential scan — deliberately omitted to stay window-expressible).

    Fully relational: tokenize once → fixed ``lag`` columns build the
    trailing gram (no per-element recompute) → boundary flag → two
    window sums assign chunk ids → one aggregate rebuilds chunk text in
    token order.  Everything is md5/hash60 arithmetic, so a SQL oracle
    replays every boundary and hash bit-for-bit.  Shuffles: one window
    partition + one aggregate, both keyed on the document id."""
    from pyspark.sql import Window

    from ..functions.text import hash60, tokens_pd

    if window < 1 or divisor < 1 or max_tokens < 1:
        raise ValueError("window, divisor, max_tokens must be positive")
    toks = (
        spread(df)
        .select(
            F.col(id_col),
            F.posexplode(tokens_pd(F.col(text_col))).alias("pos", "tok"),
        )
        .filter(F.col("tok") != "")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    gram = F.concat_ws(
        " ",
        *[F.lag("tok", window - 1 - i).over(w) for i in range(window - 1)],
        F.col("tok"),
    )
    # the boundary needs a FULL trailing gram: the first window-1 tokens
    # of a doc never cut (their gram would be shorter — and concat_ws
    # silently skips the NULL lags, so gate on position explicitly)
    boundary = (
        (F.row_number().over(w) >= window)
        & (hash60(gram) % divisor == 0)
    ).cast("long")
    cums = Window.partitionBy(id_col).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    marked = toks.select(
        id_col,
        "pos",
        "tok",
        F.coalesce(F.sum(boundary).over(cums), F.lit(0)).alias("__cdc"),
    )
    in_chunk = Window.partitionBy(id_col, "__cdc").orderBy("pos")
    marked = marked.withColumn(
        "__sub",
        F.floor((F.row_number().over(in_chunk) - 1) / max_tokens),
    )
    agg = marked.groupBy(id_col, "__cdc", "__sub").agg(
        F.min("pos").alias("first_pos"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tok"))
                    ),
                    lambda x: x["tok"],
                ),
                " ",
            )
        ).alias("chunk_md5"),
    )
    rank = Window.partitionBy(id_col).orderBy("first_pos")
    return agg.select(
        id_col,
        (F.row_number().over(rank) - 1).cast("long").alias("chunk_pos"),
        F.col("first_pos").cast("long").alias("first_pos"),
        "n_tokens",
        "chunk_md5",
    )


def mixture_report(
    df: DataFrame,
    targets: dict[str, float],
    key: str = "source",
    weight_col: str = "n_chars",
) -> DataFrame:
    """Corpus-mixture audit: per ``key``, the actual weight share vs the
    declared target share, and the resampling factor that would close the
    gap — the planning step in front of :func:`oversample_by_key` /
    :func:`sample_to_token_budget`.

    Output per key: ``actual_weight`` (BIGINT sum of ``weight_col``),
    ``actual_ppm`` / ``target_ppm`` (shares in parts-per-million), and
    ``factor_ppm`` (``target/actual`` in ppm; 1_000_000 = already on
    target, null when the key has zero actual weight).  Shares are
    floor'd ppm integers — identical in any IEEE engine — rather than
    raw double divisions, which are canonicalization-fragile.  Keys
    absent from ``targets`` get target 0; targets are normalized to sum
    to 1.  One aggregation on the key plus a single-partition window over
    the (tiny, one-row-per-key) aggregate."""
    if not targets:
        raise ValueError("targets must be non-empty")
    total_t = float(sum(targets.values()))
    if total_t <= 0:
        raise ValueError("targets must sum to a positive weight")
    target_ppm = {k: int(round(v / total_t * 1_000_000)) for k, v in targets.items()}
    tmap = F.create_map(
        *[F.lit(x) for kv in target_ppm.items() for x in kv]
    )
    agg = df.groupBy(key).agg(
        F.sum(weight_col).cast("long").alias("actual_weight")
    )
    # a declared target key with NO rows is the worst mixture violation —
    # it must appear in the report (actual 0, factor null), not vanish
    # because groupBy only emits observed keys
    declared = df.sparkSession.createDataFrame(
        [(k,) for k in targets], f"{key} string"
    )
    agg = (
        declared.join(agg, key, "full_outer")
        .withColumn("actual_weight", F.coalesce("actual_weight", F.lit(0)))
    )
    out = agg.withColumn(
        "__tot", F.sum("actual_weight").over(Window.partitionBy())
    )
    actual_ppm = F.floor(
        F.col("actual_weight") * F.lit(1000000.0) / F.col("__tot")
    ).cast("long")
    tgt = F.coalesce(tmap[F.col(key)], F.lit(0)).cast("long")
    return out.select(
        F.col(key),
        "actual_weight",
        actual_ppm.alias("actual_ppm"),
        tgt.alias("target_ppm"),
        F.when(
            actual_ppm > 0,
            F.floor(tgt * F.lit(1000000.0) / actual_ppm).cast("long"),
        ).alias("factor_ppm"),
    )


def sample_exact_n(
    df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic global sample of EXACTLY ``n`` rows: the n smallest
    md5(salt ‖ id) values — eval-subset carving where "10k docs, same
    ones every run, any cluster size, any engine" matters and a
    fractional ``sample()`` can't deliver either exactness or
    reproducibility.

    The md5 order is uniform-pseudorandom but a pure function of the id,
    so re-runs and other engines pick the identical set; vary ``salt``
    to draw a different (still deterministic) sample.  Plan: Spark turns
    the orderBy+limit into TakeOrdered — per-partition top-n heaps, no
    global sort shuffle."""
    if n <= 0:
        raise ValueError("n must be positive")
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return (
        df.withColumn("__smp", key)
        .orderBy(F.asc("__smp"), F.asc(id_col))
        .limit(n)
        .drop("__smp")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "ws",
    mean_weight: float | None = None,
) -> DataFrame:
    """Deterministic Poisson probability-proportional-to-size sample:
    row i survives iff ``u_i < fraction · w_i / mean(w)`` with
    ``u_i = hash60(salt ‖ id) / 2^60`` — high-weight (e.g. high-quality
    or long) rows are proportionally more likely to be kept, expected
    sample size ≈ ``fraction · n`` (exact when no per-row probability
    clips at 1).  The md5 coin makes the selection reproducible across
    engines, runs, and cluster sizes, unlike ``rand()``.

    Appends ``p_ppm`` (inclusion probability, floor'd parts-per-million —
    integer-rendered so any IEEE engine agrees) for Horvitz-Thompson
    re-weighting downstream.

    Plan: one tiny aggregate reduces the corpus to a 1-row (sum, count)
    table broadcast back via cross join; the filter itself is a narrow
    codegen'd projection — no shuffle of the data.  Pass ``mean_weight``
    (a known/stored corpus statistic) to skip the aggregate entirely —
    the stateless tier that also works on STREAMING DataFrames, where a
    global mean cannot be computed inline."""
    if not (0.0 < fraction <= 1.0):
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    u = hash60(F.concat(F.lit(salt), F.col(id_col).cast("string"))).cast(
        "double"
    ) / F.lit(float(1 << 60))
    if mean_weight is not None:
        import math

        if not (math.isfinite(mean_weight) and mean_weight > 0):
            # NaN slips through a <=0 check and makes least() pick 1.0 for
            # every row (NaN compares greater): the whole corpus "sampled"
            raise ValueError(
                f"mean_weight must be a finite positive number, got {mean_weight}"
            )
        p = F.least(
            F.lit(1.0),
            F.lit(fraction) * F.col(weight_col).cast("double") / F.lit(float(mean_weight)),
        )
        joined = df
    else:
        if df.isStreaming:
            raise ValueError(
                "weighted_sample on a streaming DataFrame needs an explicit "
                "mean_weight (a stored corpus statistic); a global mean "
                "cannot be aggregated inline on a stream"
            )
        totals = df.agg(
            F.sum(F.col(weight_col)).cast("double").alias("__sw"),
            F.count(F.lit(1)).cast("double").alias("__n"),
        )
        p = F.least(
            F.lit(1.0),
            F.lit(fraction) * F.col(weight_col).cast("double") * F.col("__n") / F.col("__sw"),
        )
        joined = df.join(F.broadcast(totals))
    out = (
        joined.withColumn("__p", p)
        .filter(u < F.col("__p"))
        .withColumn("p_ppm", F.floor(F.col("__p") * F.lit(1_000_000.0)).cast("long"))
        .drop("__p")
    )
    return out if mean_weight is not None else out.drop("__sw", "__n")


#: entity -> character decode table for :func:`strip_markup`; ``&amp;`` is
#: applied LAST so ampersands produced by other decodes can't re-decode
#: (``&amp;lt;`` must yield the four characters ``&lt;``... decoded once).
MARKUP_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_markup(
    df: DataFrame, text_col: str = "text", out_col: str = "text_clean"
) -> DataFrame:
    """Remove HTML/XML tags and decode the common entities (the C4-style
    markup-stripping pass for web-crawled corpora): tags ``<...>`` are
    replaced by a space (so ``a<br>b`` stays two words), the entity table
    is decoded in fixed order, runs of ASCII whitespace collapse to one
    space.  Adds ``n_tags`` / ``n_entities`` counts (measured before
    decoding) for crawl-quality monitoring.

    One narrow projection; the regexp/replace chain stays inside
    whole-stage codegen — patterns are RE2/Java-compatible so the DuckDB
    oracle matches byte-for-byte."""
    out = spread(df)
    tag_pat = r"<[^>]*>"
    n_tags = F.regexp_count(F.col(text_col), F.lit(tag_pat))
    cur: Column = F.regexp_replace(F.col(text_col), tag_pat, " ")
    n_entities = F.regexp_count(
        cur, F.lit("|".join(e for e, _ in MARKUP_ENTITIES))
    )
    for ent, ch in MARKUP_ENTITIES:
        cur = F.replace(cur, F.lit(ent), F.lit(ch))
    # literal control chars, NOT the \v escape: Java's \v is a vertical-
    # whitespace CLASS (incl. U+0085/U+2028/U+2029) while RE2/Python \v is
    # VT only — the escape would silently break DuckDB bit-parity on any
    # document containing NEL/LS/PS
    cur = F.trim(F.regexp_replace(cur, "[ \t\n\r\f\x0b]+", " "))
    return out.withColumns(
        {"n_tags": n_tags, "n_entities": n_entities, out_col: cur}
    )


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_norm",
    form: str = "NFC",
    lowercase: bool = True,
    squash_whitespace: bool = True,
) -> DataFrame:
    """Unicode normalization pass (UAX#15): canonicalizes composed vs
    decomposed accent encodings (``é`` vs ``e + U+0301``) so that exact
    dedup, shingling, and decontamination see one byte representation —
    crawled corpora mix both freely and every hash-based operator would
    otherwise treat them as different text.

    Arrow-batched kernel (Spark has no built-in normalizer); order is
    normalize → lowercase → whitespace-squash, matching the DuckDB oracle
    ``trim(regexp_replace(lower(nfc_normalize(x)), '[ \\t\\n\\r\\f\\v]+',
    ' ', 'g'))`` exactly.  Narrow per-row transform — no shuffle."""
    from ..functions.text import unicode_normalize_pd

    return spread(df).withColumn(
        out_col,
        unicode_normalize_pd(
            F.col(text_col),
            form=form,
            lowercase=lowercase,
            squash_whitespace=squash_whitespace,
        ),
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "",
    rank_col: str = "shuffle_rank",
) -> DataFrame:
    """Reproducible global shuffle order for training: every row gets a
    consecutive ``shuffle_rank`` 1..N in md5(salt ‖ id) order — the
    "shuffle the corpus once, identically, on any cluster and any engine"
    primitive that ``orderBy(rand())`` can never be.  Vary ``salt`` per
    epoch for a fresh-but-reproducible order.

    Scale plan — global ranking WITHOUT a global sort: rows hash into 256
    buckets keyed by the first md5 byte (bucket order == md5 lexicographic
    order, so bucket-local ranks concatenate into the global order).  One
    map-side-combined count per bucket (256 rows to the driver), offsets
    come back as a literal map, and each bucket ranks independently in
    parallel — no single-partition sort of the corpus, no zipWithIndex
    barrier.  Two passes over the data: the count and the rank."""
    df = spread(df)  # the count pass md5-hashes every row pre-exchange
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    counts = {
        r["__b"]: r["__c"]
        for r in df.select(bucket.alias("__b"))
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    }
    if None in counts:
        # a NULL id hashes to NULL: its rows have no deterministic place
        # in the order (ties among NULL ids are partition-order-dependent)
        raise ValueError(
            f"{id_col!r} contains NULLs ({counts[None]} rows); a NULL id "
            "has no deterministic shuffle position — filter or fill ids "
            "first"
        )
    offsets: dict[int, int] = {}
    running = 0
    for b in sorted(counts):
        offsets[b] = running
        running += counts[b]
    offset_map = F.create_map(
        *[F.lit(x) for b in offsets for x in (b, offsets[b])]
    )
    w = Window.partitionBy("__b").orderBy(F.col("__h"), F.col(id_col))
    off = offset_map[F.col("__b")]
    return (
        df.withColumn("__h", h)
        .withColumn("__b", bucket)
        .withColumn(
            rank_col,
            # a bucket unseen by the count pass means the input changed
            # between the two passes (nondeterministic upstream) — fail
            # loudly instead of silently emitting colliding ranks
            F.when(
                off.isNotNull(), (off + F.row_number().over(w)).cast("long")
            ).otherwise(
                F.raise_error(
                    F.lit(
                        "deterministic_shuffle: input changed between the "
                        "count and rank passes (nondeterministic source?)"
                    )
                ).cast("long")
            ),
        )
        .drop("__h", "__b")
    )


def assign_splits(
    df: DataFrame,
    weights: dict[str, int] | None = None,
    salt: str = "",
    id_col: str = "doc_id",
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic train/val/test split assignment: append a ``split``
    column chosen by an md5-derived coin, so the same corpus splits
    identically on any run, cluster, or engine (``rand()`` is none of
    those).  ``weights`` are integer proportions (default
    ``{"train": 98, "val": 1, "test": 1}``); boundaries are exact ppm
    integers with the remainder absorbed by the last split.

    **Leak safety:** pass ``group_col`` (e.g. a near-dup group id from
    ``near_dup_groups``) to key the coin on the GROUP instead of the row —
    every member of a duplicate cluster lands in the same split, so
    train/test contamination through near-duplicates is structurally
    impossible.  Null group ids fall back to the row's own ``id_col``.

    Purely narrow (one md5 per row, zero shuffle); composes with any
    downstream filter — ``df.filter("split = 'train'")`` prunes before
    the write."""
    if weights is None:
        weights = {"train": 98, "val": 1, "test": 1}
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive integers")
    total = sum(weights.values())
    names = list(weights)
    # exact integer ppm boundaries; last split takes the remainder
    bounds: list[int] = []
    acc = 0
    for name in names[:-1]:
        acc += weights[name] * 1_000_000 // total
        bounds.append(acc)
    key = F.col(id_col).cast("string")
    if group_col is not None:
        key = F.coalesce(F.col(group_col).cast("string"), key)
    coin = F.pmod(hash60(F.concat(F.lit(salt), F.lit(chr(31)), key)),
                  F.lit(1_000_000))
    expr = F.lit(names[-1])
    for name, b in zip(reversed(names[:-1]), reversed(bounds)):
        expr = F.when(coin < b, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def build_training_blocks(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_groups: int = 64,
    sep: str = "\n\n",
) -> DataFrame:
    """Concatenate documents into pretraining blocks of ~``budget`` total
    weight: :func:`pack_token_budget` assigns deterministic (pack_group,
    shard_id) bins, then each bin's documents are joined with ``sep`` in
    the SAME md5 order the packing used — (pack_group, shard_id, n_docs,
    block_weight, block_text), fully engine-reproducible.

    Scale: the aggregation state per bin is bounded by ``budget`` (a bin
    holds consecutive docs until the weight budget spills), so
    ``collect_list`` here is the rare SAFE use — its size is capped by
    construction, not by key popularity.  One shuffle on pack_group (from
    the packing window); the block aggregation reuses that partitioning."""
    hcol = "__oh"
    while hcol in df.columns:
        hcol = "_" + hcol
    packed = pack_token_budget(
        df, budget, weight_col=weight_col, id_col=id_col,
        num_groups=num_groups, order_hash_col=hcol,
    )
    # reuse the packing's md5 order hash — no second hash pass per row.
    # The id tie-break compares as STRING (a long cast would crash under
    # ANSI mode for composite ids like "doc#copy"); the tie only matters
    # on 60-bit md5 collisions, and the oracle orders the same way
    member = F.struct(
        F.col(hcol).alias("h"),
        F.col(id_col).cast("string").alias("i"),
        F.col(text_col).alias("t"),
    )
    return (
        packed.withColumn("__m", member)
        .groupBy("pack_group", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(weight_col).cast("long").alias("block_weight"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("__m")), lambda m: m["t"]
                ),
                sep,
            ).alias("block_text"),
        )
    )


def dedup_substrings_global(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 8,
    release: bool = True,
) -> DataFrame:
    """CROSS-document exact-substring dedup, keep-first-occurrence (the
    ExactSubstr dedup of Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better", re-expressed relationally): hash every
    OVERLAPPING ``window_tokens``-token window, find windows whose text
    occurs at 2+ positions corpus-wide, keep the globally-first occurrence
    (min ``(doc_id, pos)``) and delete the tokens covered by every other
    occurrence.  Unlike :func:`remove_boilerplate_spans` (non-overlapping
    spans, delete-everywhere) this catches repeated substrings at ANY
    token alignment and always preserves one canonical copy, so corpus
    text is never lost entirely.

    Returns (id, text_clean, n_tokens, n_removed) with ``text_clean`` the
    surviving tokens rejoined in order.

    Scale shape (100 TB): the reference algorithm builds a monolithic
    suffix array — fundamentally single-machine.  This plan keeps the
    same observable semantics with bounded distributed state: the token
    array is computed ONCE per row (persisted, released on return); the
    overlapping-window explode is a NARROW generate (no shuffle of text —
    only 8-byte (hash, doc, pos) triples shuffle); duplicated-window
    detection is one partial-aggregated groupBy on the hash; the
    canonical occurrence is ``min(struct(doc, pos))`` inside the same
    aggregate (no second pass); per-doc removal masks come back as a tiny
    (doc, positions) table joined once against the persisted base.
    Window count per doc is ~n_tokens, so the exploded stream is ~8x the
    non-overlapping span stream — still fixed-width triples, the shape
    shuffle hardware is built for."""
    k = window_tokens
    if k <= 0:
        raise ValueError("window_tokens must be positive")
    base = (
        spread(df)
        .withColumn("__toks", tokens_pd(F.col(text_col)))
        .withColumn("__n", F.size("__toks").cast("long"))
        .select(id_col, "__toks", "__n")
        .persist()
    )
    # overlapping window start positions 0..n-k (docs shorter than k emit
    # none); guard the sequence() — a negative stop would DESCEND
    starts = F.when(
        F.col("__n") >= k,
        F.sequence(F.lit(0).cast("long"), F.col("__n") - k),
    ).otherwise(F.array().cast("array<bigint>"))
    occ = (
        base.select(
            F.col(id_col).alias("__id"),
            "__toks",
            F.explode(starts).alias("__pos"),
        )
        .select(
            "__id",
            "__pos",
            hash60(
                F.array_join(
                    F.slice(
                        F.col("__toks"), (F.col("__pos") + 1).cast("int"), k
                    ),
                    " ",
                )
            ).alias("__h"),
        )
        .persist()
    )
    # one aggregate finds BOTH the duplicate set and its canonical
    # occurrence (lexicographic min over the (doc, pos) struct)
    dup = (
        occ.groupBy("__h")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.min(F.struct(F.col("__id").alias("i"), F.col("__pos").alias("p"))).alias(
                "__first"
            ),
        )
        .filter(F.col("__c") >= 2)
        .select("__h", "__first")
    )
    covered = (
        occ.join(dup, "__h")
        .filter(
            (F.col("__id") != F.col("__first.i"))
            | (F.col("__pos") != F.col("__first.p"))
        )
        .select(
            "__id",
            F.explode(
                F.sequence(F.col("__pos"), F.col("__pos") + k - 1)
            ).alias("__p"),
        )
        .groupBy("__id")
        .agg(F.collect_set("__p").alias("__rm"))
        .withColumnRenamed("__id", id_col)
    )
    out = (
        base.join(covered, id_col, "left")
        .withColumn(
            "__rm", F.coalesce("__rm", F.array().cast("array<bigint>"))
        )
        .select(
            id_col,
            F.array_join(
                F.filter(
                    "__toks",
                    lambda x, i: ~F.array_contains(
                        F.col("__rm"), i.cast("long")
                    ),
                ),
                " ",
            ).alias("text_clean"),
            F.col("__n").alias("n_tokens"),
            F.size("__rm").cast("long").alias("n_removed"),
        )
    )
    return materialize_release(out, base, occ, release=release)


def filter_lines_quality(
    df: DataFrame,
    text_col: str = "text",
    min_chars: int = 10,
    max_upper_pct: int = 60,
    max_digit_pct: int = 40,
    drop_bullets: bool = True,
    min_keep_pct: int = 50,
) -> DataFrame:
    """RefinedWeb-style LINE-WISE corrections (Penedo et al. 2023 §G.2):
    web extraction leaves nav menus, like counters, date stamps and
    bullet debris as whole lines that document-level quality scores
    average away.  Each line is kept or dropped by the first matching
    rule — too short (< ``min_chars`` after trim), mostly uppercase
    (> ``max_upper_pct``% of letters... of characters), mostly digits
    (> ``max_digit_pct``%), or bullet/nav debris (leading ``-``/``*``/
    ``•``/``|``) — and the document is rebuilt from survivors.
    Documents whose kept-line fraction falls below ``min_keep_pct``%
    are FLAGGED (``line_filter_dropped``) rather than deleted, the
    RefinedWeb rule that a doc needing too much correction is itself
    suspect.

    Ratio rules compare integer cross-products (``n_upper·100 >
    len·pct``) — no float ratios, so the oracle reproduces every keep
    decision exactly.  Returns every input row plus (text_clean,
    n_lines, n_kept, n_short, n_upper, n_digit, n_bullet,
    line_filter_dropped).

    Scale shape: ONE narrow whole-stage-codegen projection — split,
    per-line flag struct, aggregate counts and array_join all happen
    inside the row; zero shuffle, zero Python."""
    for name, v in (
        ("max_upper_pct", max_upper_pct),
        ("max_digit_pct", max_digit_pct),
        ("min_keep_pct", min_keep_pct),
    ):
        if not (0 <= v <= 100):
            raise ValueError(f"{name} must be in [0, 100]")
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    # per-line verdict: 0 = keep, 1..4 = first matching drop rule
    verdict = lambda x: (  # noqa: E731
        F.when(F.length(F.trim(x)) < min_chars, F.lit(1))
        .when(
            F.length(F.regexp_replace(x, "[^A-Z]", "")) * 100
            > F.length(x) * max_upper_pct,
            F.lit(2),
        )
        .when(
            F.length(F.regexp_replace(x, "[^0-9]", "")) * 100
            > F.length(x) * max_digit_pct,
            F.lit(3),
        )
        .when(
            F.lit(drop_bullets)
            & F.trim(x).rlike(r"^[-*•|]"),
            F.lit(4),
        )
        .otherwise(F.lit(0))
    )
    flagged = F.transform(
        lines, lambda x: F.struct(x.alias("line"), verdict(x).alias("v"))
    )
    out = df.withColumn("__fl", flagged)
    count_v = lambda v: F.size(  # noqa: E731
        F.filter(F.col("__fl"), lambda s: s["v"] == F.lit(v))
    ).cast("long")
    out = (
        out.withColumn(
            "text_clean",
            F.array_join(
                F.transform(
                    F.filter(F.col("__fl"), lambda s: s["v"] == 0),
                    lambda s: s["line"],
                ),
                "\n",
            ),
        )
        .withColumn("n_lines", F.size("__fl").cast("long"))
        .withColumn("n_kept", count_v(0))
        .withColumn("n_short", count_v(1))
        .withColumn("n_upper", count_v(2))
        .withColumn("n_digit", count_v(3))
        .withColumn("n_bullet", count_v(4))
        .withColumn(
            "line_filter_dropped",
            F.col("n_kept") * 100
            < F.col("n_lines") * F.lit(int(min_keep_pct)),
        )
        .drop("__fl")
    )
    return out


def dedup_lines_global(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 0,
) -> DataFrame:
    """CROSS-document exact LINE dedup, keep-first-occurrence — the C4
    three-sentence-span rule's line-level sibling (Raffel et al. 2020
    removed any repeated span corpus-wide; line granularity is what most
    web pipelines ship because boilerplate — nav bars, cookie banners,
    license headers — repeats as whole lines).  Every line occurring at
    2+ positions corpus-wide survives only at its globally-first
    ``(doc_id, line_idx)``; other occurrences are deleted and each doc's
    text is rebuilt from its surviving lines in order.

    Lines shorter than ``min_chars`` never enter the race (single words
    repeat legitimately; deleting them would shred grammar, the same
    reason C4 bounded spans at three sentences).

    Returns (id, text_clean, n_lines, n_dropped).

    Scale shape (100 TB): the dedup race shuffles ONLY ``(hash60(line),
    doc_id, line_idx)`` triples — never line text; the drop set (usually
    the small side) joins back against a second narrow explode of the
    base, and the only payload-carrying shuffle is the final per-doc
    regroup, which any rebuild must pay.  Complements
    :func:`dedup_substrings_global` (any-alignment token windows) and
    :func:`remove_boilerplate_spans` (delete-everywhere spans)."""
    if min_chars < 0:
        raise ValueError("min_chars must be >= 0")
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    ex = spread(df).select(
        F.col(id_col), F.posexplode(lines).alias("__idx", "__line")
    )
    race = ex.filter(F.length("__line") >= min_chars).select(
        id_col, "__idx", hash60(F.col("__line")).alias("__h")
    )
    w = Window.partitionBy("__h").orderBy(id_col, "__idx")
    drops = (
        race.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select(id_col, "__idx")
    )
    kept = ex.join(drops, [id_col, "__idx"], "left_anti")
    out = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__idx", "__line"))),
                lambda s: s["__line"],
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    n_lines = df.select(
        F.col(id_col), F.size(lines).cast("long").alias("n_lines")
    )
    out = (
        n_lines.join(out, id_col, "left")
        .select(
            id_col,
            # a doc whose every line was dropped still exists, as empty text
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            "n_lines",
            (F.col("n_lines") - F.coalesce("__n_kept", F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
    )
    return out


def dedup_lines_against(
    df: DataFrame,
    seen_lines: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 0,
) -> DataFrame:
    """Incremental tier of :func:`dedup_lines_global` — the 100 TB
    ingestion path: dedup a NEW batch's lines against a stored corpus
    line-hash table (``seen_lines``: any DataFrame with a ``line_hash``
    BIGINT column, e.g. a previous batch's ``line_hashes`` output) AND
    within the batch itself, without touching the already-ingested corpus.

    A line is dropped if its hash occurs in ``seen_lines`` (broadcast or
    shuffled join by size — Spark/AQE decides) or earlier in this batch
    (same keep-first ``(doc_id, idx)`` race as the global tier).

    Returns (id, text_clean, n_lines, n_dropped, line_hashes
    array<bigint>) — union ``explode(line_hashes)`` into the store for
    the next batch; only 8-byte hashes persist, never line text."""
    if min_chars < 0:
        raise ValueError("min_chars must be >= 0")
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    ex = spread(df).select(
        F.col(id_col), F.posexplode(lines).alias("__idx", "__line")
    )
    eligible = ex.filter(F.length("__line") >= min_chars).select(
        id_col, "__idx", hash60(F.col("__line")).alias("__h")
    )
    seen = seen_lines.select(F.col("line_hash").alias("__h")).distinct()
    w = Window.partitionBy("__h").orderBy(id_col, "__idx")
    in_batch_dups = (
        eligible.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select(id_col, "__idx")
    )
    vs_store_dups = eligible.join(seen, "__h", "left_semi").select(
        id_col, "__idx"
    )
    drops = in_batch_dups.union(vs_store_dups).distinct()
    kept = ex.join(drops, [id_col, "__idx"], "left_anti")
    out = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__idx", "__line"))),
                lambda s: s["__line"],
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("__n_kept"),
        F.array_sort(
            F.array_distinct(F.collect_list(hash60(F.col("__line"))))
        ).alias("line_hashes"),
    )
    n_lines = df.select(
        F.col(id_col), F.size(lines).cast("long").alias("n_lines")
    )
    return n_lines.join(out, id_col, "left").select(
        id_col,
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        "n_lines",
        (F.col("n_lines") - F.coalesce("__n_kept", F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
        F.coalesce("line_hashes", F.array().cast("array<bigint>")).alias(
            "line_hashes"
        ),
    )


def importance_weights(
    df: DataFrame,
    target_filter: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 8192,
    release: bool = True,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how target-domain-like its hashed n-gram profile is, so a 100 TB raw
    crawl can be resampled toward a small high-quality target (the
    target here is any subset of ``df`` selected by ``target_filter``).

    Features are unigrams + adjacent bigrams hashed into ``buckets``
    (md5-derived, engine-reproducible).  Bucket distributions for the
    target and the raw remainder get add-one smoothing; each bucket's
    log-ratio ``ln(p_target/p_raw)`` is quantized to INTEGER MICRO-NATS
    immediately, so per-document importance weights are EXACT integer
    sums over the doc's bucket counts (same discipline as
    :func:`~sparkplug_spark.operators.scoring.naive_bayes_classifier` —
    no float accumulation anywhere).

    Returns (id, is_target boolean, n_features bigint, log_weight_micros
    bigint); resample by feeding ``exp(log_weight)`` into
    :func:`weighted_sample`, or threshold on the integer directly.

    Scale shape: one tokenize pass per row (persisted, released); the
    feature stream shuffles 8-byte (bucket, is_target) pairs into a
    ``buckets``-sized aggregate; per-bucket log-ratios are a
    vocabulary-bounded table AQE-broadcasts under the scoring join;
    totals ride a 1-row broadcast."""
    if buckets <= 1:
        raise ValueError("buckets must be > 1")
    base = (
        spread(df)
        .withColumn("__toks", F.filter(tokens_pd(F.col(text_col)), lambda t: t != F.lit("")))
        .select(
            F.col(id_col).alias("__id"),
            target_filter.alias("__tgt"),
            "__toks",
        )
        .persist()
    )
    grams = F.concat(
        F.col("__toks"),
        F.when(
            F.size("__toks") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("__toks") - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("__toks"), i),
                    F.element_at(F.col("__toks"), i + 1),
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    feats = (
        base.select("__id", "__tgt", F.explode(grams).alias("__g"))
        .select("__id", "__tgt", (hash60(F.col("__g")) % buckets).alias("__b"))
        .persist()
    )
    counts = feats.groupBy("__b").agg(
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).cast("long").alias("__ct"),
        F.sum(F.when(F.col("__tgt"), 0).otherwise(1)).cast("long").alias("__cr"),
    )
    totals = counts.agg(
        F.sum("__ct").alias("__tt"), F.sum("__cr").alias("__tr")
    )
    micros = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")
    ratios = counts.crossJoin(F.broadcast(totals)).select(
        "__b",
        micros(
            F.log(F.col("__ct") + 1)
            - F.log(F.col("__tt") + buckets)
            - F.log(F.col("__cr") + 1)
            + F.log(F.col("__tr") + buckets)
        ).alias("__w"),
    )
    out = (
        feats.join(ratios, "__b")
        .groupBy("__id", "__tgt")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_features"),
            F.sum("__w").cast("long").alias("log_weight_micros"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__tgt").alias("is_target"),
            "n_features",
            "log_weight_micros",
        )
    )
    return materialize_release(out, base, feats, release=release)


def repetition_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_delim: str = "\n",
) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021 §A1.1), the char-based
    family :func:`gopher_quality_flags` doesn't cover — per document:

    - ``n_lines``, ``dup_line_frac_ppm`` — 1e6·(n_lines − n_distinct)
      DIV n_lines (empty segments dropped);
    - ``dup_line_char_frac_ppm`` — characters in line occurrences beyond
      each first copy over all line characters;
    - ``top_2gram_char_frac_ppm`` / ``top_3gram_char_frac_ppm`` —
      characters covered by the MOST FREQUENT word n-gram (count ×
      token-chars of the gram over total token chars; ties break to the
      lexicographically smallest gram); capped at 1e6 since overlapping
      occurrences can over-count;
    - ``dup_5gram_char_frac_ppm`` — characters covered by ALL word
      5-grams occurring more than once (Σ count·token-chars, capped).

    Every ratio is an integer-ppm floor division of exact counts, so a
    SQL oracle reproduces it bit-for-bit.  All metrics are WITHIN-doc:
    the whole report is one narrow Arrow projection — zero shuffle, and
    it scales embarrassingly (O(doc length) per document)."""
    from ..functions.text import repetition_metrics_pd

    m = F.col("__m")
    return (
        spread(df)
        .withColumn(
            "__m", repetition_metrics_pd(F.col(text_col), line_delim)
        )
        .select(
            F.col(id_col),
            m["n_lines"].alias("n_lines"),
            m["dup_line_frac_ppm"].alias("dup_line_frac_ppm"),
            m["dup_line_char_frac_ppm"].alias("dup_line_char_frac_ppm"),
            m["top_2gram_char_frac_ppm"].alias("top_2gram_char_frac_ppm"),
            m["top_3gram_char_frac_ppm"].alias("top_3gram_char_frac_ppm"),
            m["dup_5gram_char_frac_ppm"].alias("dup_5gram_char_frac_ppm"),
        )
    )


def temperature_mixture(
    df: DataFrame,
    key: str = "source",
    weight_col: str = "n_chars",
    tau_halvings: int = 1,
) -> DataFrame:
    """Temperature-flattened source weights — the mixture PLANNER in
    front of :func:`mixture_report` (which audits against given
    targets): sampling share ∝ weight^τ with τ = (1/2)^``tau_halvings``
    (Gopher/LLaMA-style upweighting of small high-quality sources;
    τ=1/2 default, ``tau_halvings=2`` → τ=1/4).

    Engine-exact discipline: ``weight^τ`` is ``tau_halvings``
    applications of ``floor(sqrt(·))`` on the exact BIGINT weight —
    IEEE ``sqrt`` is correctly rounded and ``floor`` exact, so every
    engine computes the identical integer (documented: this is floor-of-
    IEEE-sqrt, which can sit one off a true isqrt at the 2^52 edge, in
    the SAME way everywhere).  Shares are integer-ppm floor divisions.

    Output per key: ``n_rows``, ``weight`` (Σ ``weight_col``),
    ``natural_ppm`` (proportional share), ``temp_ppm`` (temperature
    share), ``boost_x1000`` (temp/natural, ×1000; NULL for zero-weight
    keys).  One key aggregation + a 1-row broadcast of the totals."""
    if tau_halvings < 1:
        raise ValueError("tau_halvings must be >= 1")
    s_expr = "cast(weight as double)"
    for _ in range(tau_halvings):
        s_expr = f"floor(sqrt({s_expr}))"
    agg = (
        spread(df)
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(weight_col).cast("long").alias("weight"),
        )
        .withColumn("__s", F.expr(s_expr).cast("long"))
    )
    tot = agg.agg(
        F.sum("weight").cast("long").alias("__tw"),
        F.sum("__s").cast("long").alias("__ts"),
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            key,
            "n_rows",
            "weight",
            F.expr("weight * 1000000 div __tw").cast("long").alias(
                "natural_ppm"
            ),
            F.expr("__s * 1000000 div __ts").cast("long").alias("temp_ppm"),
            F.expr(
                "(__s * 1000000 div __ts) * 1000"
                " div nullif(weight * 1000000 div __tw, 0)"
            )
            .cast("long")
            .alias("boost_x1000"),
        )
    )


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsk",
    group_col: str | None = None,
) -> DataFrame:
    """EXACT-k weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-Res): each row draws an exponential race time
    ``key = −ln(u)/w`` from a deterministic md5 coin and the k smallest
    keys win — each row's inclusion odds are proportional to its weight,
    no row twice, exactly k rows (or all, if fewer qualify).  The
    missing corner of the sampler family: :func:`weighted_sample` is
    PPS but Poisson (random size), :func:`sample_exact_n` is exact-n
    but unweighted.

    Determinism discipline: ``u = (hash60(salt ‖ id) + 1) / 2⁶⁰`` (the
    +1 keeps u > 0 so ln is finite), key arithmetic is two IEEE ops
    (ln, divide) on identical inputs in both engines, ties (impossible
    in practice at 2⁻⁶⁰ coin resolution) break on id.  Rows with NULL
    or non-positive weight are excluded — a zero-weight row must never
    win, and −ln(u)/0 is not a number.

    Returns the winning rows plus ``race_key_nanos`` (the key quantized
    to integer nano-units: JVM and libm ``ln`` differ by 1–2 ulp on some
    inputs, so the RAW double would break cross-engine hash parity while
    the selection itself is ulp-robust — a rank-k boundary flip needs
    two keys within ~1e-16 of each other).  The selection is auditable:
    re-running with the same salt reproduces it; a new salt is a fresh
    draw.  ``group_col`` switches to the per-group tier (per-source
    curriculum draws): exactly k winners per group via a key-partitioned
    rank window — same race, same determinism.

    Scale shape: a narrow codegen'd projection computes keys, then a
    global top-k — Spark plans ORDER BY + LIMIT as per-partition
    TakeOrdered heaps + a k-row merge on the driver side of the
    exchange; nothing but k rows ever concentrates.  The grouped tier
    shuffles once on the group key; groups are assumed numerous (the
    window partitions by them).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from ..functions.text import hash60

    u = (
        hash60(F.concat(F.lit(salt), F.lit("\x1f"), F.col(id_col).cast("string")))
        + F.lit(1)
    ).cast("double") / F.lit(float(1 << 60))
    key = -F.log(u) / F.col(weight_col).cast("double")
    base = (
        spread(df)
        # NULL ids hash to a NULL key, which Spark's ascending sort would
        # place FIRST — handing them the top-k slots regardless of weight
        # (and diverging from DuckDB's NULLS LAST).  No id, no ticket.
        .filter(
            F.col(id_col).isNotNull()
            & F.col(weight_col).isNotNull()
            & (F.col(weight_col) > 0)
        )
        .withColumn("__key", key)
    )
    if group_col is not None:
        # per-group tier (per-source curriculum draws): a key-partitioned
        # rank window replaces the global TakeOrdered — exactly k winners
        # PER GROUP, same race, same determinism
        from pyspark.sql import Window

        w = Window.partitionBy(group_col).orderBy(
            F.col("__key").asc(), F.col(id_col).asc()
        )
        picked = (
            base.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
    else:
        picked = base.orderBy(
            F.col("__key").asc(), F.col(id_col).asc()
        ).limit(k)
    return (
        picked.withColumn(
            "race_key_nanos",
            F.floor(F.col("__key") * F.lit(1e9) + F.lit(0.5)).cast("long"),
        )
        .drop("__key")
    )


def wordlist_filter(
    df: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    max_hits: int = 0,
) -> DataFrame:
    """Banned-wordlist safety gate — the C4 recipe (Raffel et al. 2020
    dropped any page containing a word from the "List of Dirty, Naughty,
    Obscene..." list; every web pipeline ships some variant).  Matching
    is TOKEN-level on the shared normalization (never substring — the
    Scunthorpe failure), against a broadcast-small lowercased term set.
    Multi-word entries (the real C4 list carries phrases) match as
    CONTIGUOUS token subsequences — overlapping occurrences each count,
    consistent with single tokens counting per occurrence.

    Returns every input row plus ``n_term_hits`` (total occurrences),
    ``n_distinct_terms`` (how many listed terms appear), and
    ``wordlist_flagged`` (``n_term_hits > max_hits`` — 0 is the strict
    C4 behavior; raise it to tolerate incidental mentions).

    Scale shape: ONE Arrow tokenize pass (materialized — projection
    collapse would otherwise inline the tokenizer into every phrase
    lambda and re-run it per position), then zero-shuffle codegen: the
    term set is an array literal (wordlists are KBs) probed per token
    inside the row; phrases add one windowed subsequence scan each
    (lists hold few phrases relative to single terms); no joins."""
    from ..functions.text import tokens_pd

    t = [" ".join(str(x).lower().split()) for x in terms]
    if not t or any(not x for x in t):
        raise ValueError("terms must be non-empty")
    singles = sorted({x for x in t if " " not in x})
    phrases = sorted({x for x in t if " " in x})
    out = df.withColumn("__toks", tokens_pd(F.col(text_col)))
    toks = F.col("__toks")
    if singles:
        term_arr = F.array(*[F.lit(x) for x in singles])
        hits = F.filter(toks, lambda x: F.array_contains(term_arr, x))
        n_hits = F.size(hits).cast("long")
        n_distinct = F.size(F.array_distinct(hits)).cast("long")
    else:
        n_hits = F.lit(0).cast("long")
        n_distinct = F.lit(0).cast("long")
    for p in phrases:
        words = p.split(" ")
        k = len(words)
        parr = F.array(*[F.lit(wd) for wd in words])
        # match positions are 1-based starts whose k-slice equals the
        # phrase; the when-guard keeps sequence() ascending (it would
        # otherwise count DOWN for too-short docs)
        n_p = F.when(
            F.size(toks) >= k,
            F.size(
                F.filter(
                    F.sequence(F.lit(1), F.size(toks) - F.lit(k - 1)),
                    lambda i: F.slice(toks, i, k) == parr,
                )
            ),
        ).otherwise(F.lit(0)).cast("long")
        n_hits = n_hits + n_p
        n_distinct = n_distinct + F.when(n_p > 0, F.lit(1)).otherwise(
            F.lit(0)
        ).cast("long")
    return (
        out.withColumn("n_term_hits", n_hits)
        .withColumn("n_distinct_terms", n_distinct)
        .withColumn(
            "wordlist_flagged", F.col("n_term_hits") > int(max_hits)
        )
        .drop("__toks")
    )


def encode_categoricals(
    df: DataFrame,
    cols: Sequence[str],
    suffix: str = "_id",
    start: int = 0,
) -> DataFrame:
    """Frequency-ordered dictionary encoding for categorical columns —
    the StringIndexer of ML feature prep, engine-exact: each column's
    distinct values get dense ids by (count DESC, value ASC), so the
    most common category is ``start``, ties break lexically, and the
    SAME data always yields the SAME ids on any engine (ML runtimes'
    indexers depend on partition-visit order; this one is a
    deterministic function of the value histogram).  NULL encodes as
    NULL — impute first (:func:`impute_nulls`) if the model needs a
    level for it.

    Appends ``{col}{suffix}`` (BIGINT) per input column.

    Plan: per column, one vocabulary-sized count aggregate (partial
    map-side) + a single-partition dense-rank window over the VOCAB
    (categoricals are vocab-sized by definition — if a column has
    corpus-sized cardinality it is not categorical; hash it instead)
    and one broadcast-eligible join back; no wide rows shuffle."""
    if not cols:
        raise ValueError("cols must be non-empty")
    out = df
    for c in cols:
        counts = (
            df.filter(F.col(c).isNotNull())
            .groupBy(F.col(c).alias("__v"))
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        w = Window.orderBy(F.desc("__n"), F.asc("__v"))
        dic = counts.select(
            "__v",
            (F.row_number().over(w) - 1 + int(start))
            .cast("long")
            .alias(f"{c}{suffix}"),
        )
        out = out.join(
            F.broadcast(dic), out[c] == dic["__v"], "left"
        ).drop("__v")
    return out


def frequent_itemsets(
    df: DataFrame,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 2,
    max_size: int = 3,
) -> DataFrame:
    """Frequent itemsets up to ``max_size`` by level-wise A-Priori
    (Agrawal & Srikant, VLDB'94) — market-basket mining beyond
    :func:`~.cooccurrence.basket_pairs`' pairs+lift: which item TRIPLES
    co-occur in ≥ ``min_support`` baskets.

    Output: (items STRING — ascending ids comma-joined, size, support)
    for every frequent itemset of size 1..max_size (string keys so the
    variable-arity set travels through any engine/sink unchanged).

    Scale shape — the A-Priori prune is the whole point: size-k
    candidates are built ONLY from frequent (k−1)-sets by joining
    frequent pairs/triples on their prefix, and the basket table is
    pre-filtered to frequent ITEMS before any self-join, so the
    candidate space collapses from C(n_items, k) to what the support
    threshold admits.  Every join key is (basket, item) integers;
    baskets wider than 1000 items are excluded up front (same guard as
    ``basket_pairs`` — a single degenerate mega-basket otherwise
    quadratically dominates)."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    if not 1 <= max_size <= 3:
        raise ValueError("max_size must be 1, 2 or 3")
    from pyspark.storagelevel import StorageLevel

    bi = (
        df.select(
            F.col(basket_col).alias("b"), F.col(item_col).alias("i")
        )
        .distinct()
    )
    big = bi.groupBy("b").agg(F.count(F.lit(1)).alias("__n")).filter(
        F.col("__n") > 1000
    )
    # the pruned basket stream feeds f1, the pair self-join (twice) and
    # the triple count (three times) — persist or every level replays
    # the distinct + anti-join chain (129 runtime exchanges before)
    bi = bi.join(big.select("b"), "b", "left_anti").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    f1 = bi.groupBy("i").agg(F.count(F.lit(1)).cast("long").alias("sup")).filter(
        F.col("sup") >= min_support
    )
    out = f1.select(
        F.col("i").cast("string").alias("items"),
        F.lit(1).cast("long").alias("size"),
        F.col("sup").alias("support"),
    )
    if max_size == 1:
        return materialize_release(out, bi)
    # L1 prune before the pair self-join; reused by the pair join (x2)
    # and the triple count (x3)
    bi1 = bi.join(f1.select("i"), "i", "left_semi").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a, b = bi1.alias("a"), bi1.alias("b")
    p = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b")) & (F.col("a.i") < F.col("b.i")),
        )
        .groupBy(
            F.col("a.i").alias("x"), F.col("b.i").alias("y")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("sup"))
        .filter(F.col("sup") >= min_support)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out = out.unionByName(
        p.select(
            F.concat_ws(",", "x", "y").alias("items"),
            F.lit(2).cast("long").alias("size"),
            F.col("sup").alias("support"),
        )
    )
    if max_size == 2:
        return materialize_release(out, bi, bi1, p)
    # candidate triples from frequent pairs sharing the first element
    # (prefix join), validated against the pair lattice, counted in the
    # frequent-pair-filtered basket stream
    pa, pb = p.alias("pa"), p.alias("pb")
    cand = (
        pa.join(
            pb,
            (F.col("pa.x") == F.col("pb.x"))
            & (F.col("pa.y") < F.col("pb.y")),
        )
        .select(
            F.col("pa.x").alias("x"),
            F.col("pa.y").alias("y"),
            F.col("pb.y").alias("z"),
        )
        # A-Priori closure: (y, z) must itself be frequent
        .join(
            p.select(
                F.col("x").alias("y"), F.col("y").alias("z")
            ),
            ["y", "z"],
            "left_semi",
        )
    )
    t1, t2, t3 = bi1.alias("t1"), bi1.alias("t2"), bi1.alias("t3")
    triples = (
        cand.join(t1, F.col("t1.i") == F.col("x"))
        .join(
            t2,
            (F.col("t2.b") == F.col("t1.b")) & (F.col("t2.i") == F.col("y")),
        )
        .join(
            t3,
            (F.col("t3.b") == F.col("t1.b")) & (F.col("t3.i") == F.col("z")),
        )
        .groupBy("x", "y", "z")
        .agg(F.count(F.lit(1)).cast("long").alias("sup"))
        .filter(F.col("sup") >= min_support)
    )
    out = out.unionByName(
        triples.select(
            F.concat_ws(",", "x", "y", "z").alias("items"),
            F.lit(3).cast("long").alias("size"),
            F.col("sup").alias("support"),
        )
    )
    return materialize_release(out, bi, bi1, p)


def select_max_coverage(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
) -> DataFrame:
    """Greedy maximum-coverage data selection: pick ``k`` documents that
    together cover the most DISTINCT tokens — the classic submodular
    (facility-location/MaxCover) coreset heuristic for training-data
    selection, with the standard (1 − 1/e) greedy guarantee.  Each step
    takes the document adding the most not-yet-covered tokens, ties to
    the smallest id — fully deterministic, so the whole selection
    value-hashes.

    Coverage units are word ``ngram``s (1 = tokens; 2-3 give the
    n-gram-coverage objective the data-selection literature actually
    optimizes — token vocabularies saturate after one pick on
    repetitive corpora).  Documents shorter than ``ngram`` tokens
    contribute no units.

    Output: one row per selection step — (step 1-based, id, gain = new
    units this pick added, covered_total = running distinct-unit
    count).  Stops early when no document adds anything.

    Plan: the (doc, token) DISTINCT table is computed once, then the
    working set SHRINKS: each round picks the argmax over the remaining
    (doc, token) table and anti-joins the pick's remaining tokens out of
    it (tok-partitioned checkpoint, so the anti-join never re-exchanges
    the table), rather than re-anti-joining the FULL table against a
    growing covered-token set — per-round cost is the remainder, which
    only decreases, and no covered table is materialized at all (the
    remainder is definitionally the uncovered slice).  Two actions per
    round (argmax collect + remainder checkpoint), run at a
    working-set-derived partition count (no-op at production scale).
    k is small by construction (you are choosing a coreset, not ranking
    the corpus)."""
    from pyspark.storagelevel import StorageLevel

    from ..caching import checkpoint_tracked, unpersist_ids
    from ..functions.text import tokens_pd
    from ..partitioning import loop_partitions, shuffle_scope

    if k < 1:
        raise ValueError("k must be >= 1")
    if ngram < 1:
        raise ValueError("ngram must be >= 1")
    spark = df.sparkSession
    toked = spread(df).select(
        F.col(id_col).alias("id"), tokens_pd(F.col(text_col)).alias("__tk")
    )
    if ngram == 1:
        items = toked.select(
            "id", F.explode("__tk").alias("tok")
        ).filter(F.col("tok") != "")
    else:
        items = toked.select(
            "id",
            F.explode(
                F.when(
                    F.size("__tk") >= ngram,
                    F.expr(
                        f"transform(sequence(1, size(__tk) - {ngram} + 1),"
                        f" i -> array_join(slice(__tk, i, {ngram}), ' '))"
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("tok"),
        )
    dt = items.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    n_items = dt.count()
    chosen: list = []
    total = 0
    with shuffle_scope(spark, loop_partitions(spark, n_items)):
        # remaining_n = dt minus every already-covered token, maintained
        # directly: anti-join the pick's REMAINING tokens out per round
        # (they are exactly the newly covered ones — disjoint from all
        # earlier picks' by construction)
        remaining, rem_ids = checkpoint_tracked(dt.repartition("tok"))
        dt.unpersist()
        for step in range(1, int(k) + 1):
            gains = (
                remaining.groupBy("id")
                .agg(F.count(F.lit(1)).cast("long").alias("gain"))
            )
            top = (
                gains.orderBy(F.desc("gain"), F.asc("id")).limit(1).collect()
            )
            if not top or top[0]["gain"] == 0:
                break
            pick, gain = top[0]["id"], int(top[0]["gain"])
            total += gain
            chosen.append((step, pick, gain, total))
            if step == int(k):
                break  # the remainder has no further consumer
            nxt = remaining.join(
                remaining.filter(F.col("id") == pick).select("tok"),
                "tok",
                "left_anti",
            ).repartition("tok")
            nxt, n_ids = checkpoint_tracked(nxt)
            unpersist_ids(spark, rem_ids)
            remaining, rem_ids = nxt, n_ids
        unpersist_ids(spark, rem_ids)
    id_type = df.schema[id_col].dataType.simpleString()
    return spark.createDataFrame(
        chosen, f"step long, id {id_type}, gain long, covered_total long"
    )


def split_leak_audit(
    pairs: DataFrame,
    splits: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Cross-split LEAKAGE audit — the check that must pass before
    trusting an eval number: given near-duplicate ``pairs`` (from any
    matcher: MinHash, SimHash, semantic, fuzzy) and a ``splits``
    assignment (:func:`assign_splits`), count how many near-dup pairs
    STRADDLE split boundaries.  A train/test pair means the test member
    is effectively memorized training data; ``assign_splits`` prevents
    this only for duplicates sharing its ``group_col``, so this audit
    closes the loop for similarity the grouping key can't see.

    Output: one row per unordered split combination —
    (split_a ≤ split_b, n_pairs, is_leak = split_a ≠ split_b).  Pair
    members missing from ``splits`` report as ``'unassigned'`` (never
    silently dropped — an incomplete assignment is itself a finding).

    Plan: two broadcast-eligible joins of the (id, split) table onto
    the pair list, one tiny |splits|² aggregate — cost is the pair
    list, not the corpus."""
    sa = splits.select(
        F.col(id_col).alias(id_a), F.col(split_col).alias("__sa")
    )
    sb = splits.select(
        F.col(id_col).alias(id_b), F.col(split_col).alias("__sb")
    )
    labeled = (
        pairs.select(id_a, id_b)
        .join(sa, id_a, "left")
        .join(sb, id_b, "left")
        .select(
            F.coalesce("__sa", F.lit("unassigned")).alias("__a"),
            F.coalesce("__sb", F.lit("unassigned")).alias("__b"),
        )
    )
    return (
        labeled.groupBy(
            F.least("__a", "__b").alias("split_a"),
            F.greatest("__a", "__b").alias("split_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .withColumn("is_leak", F.col("split_a") != F.col("split_b"))
    )


#: curated homoglyph map (Unicode confusables, the high-frequency
#: dedup-evasion subset): Cyrillic and Greek letters that render
#: identically to latin in most fonts, plus the fullwidth latin and
#: digit blocks.  Codepoint-for-codepoint (translate semantics) — both
#: columns MUST stay equal length and order-aligned.
_CYR_GREEK_FROM = "\u0430\u0435\u043e\u0440\u0441\u0445\u0456\u0455\u0443\u0458\u04bb\u0391\u0392\u0395\u0397\u0399\u039a\u039c\u039d\u039f\u03a1\u03a4\u03a5\u03a7\u03bf\u0410\u0412\u0415\u041a\u041c\u041d\u041e\u0420\u0421\u0422\u0425"
_CYR_GREEK_TO = "aeopcxisyjhABEHIKMNOPTYXoABEKMHOPCTX"
_FULLWIDTH_FROM = "".join(chr(0xFF01 + i) for i in range(0x5E))  # ！..～
_FULLWIDTH_TO = "".join(chr(0x21 + i) for i in range(0x5E))  # !..~

CONFUSABLES: tuple[str, str] = (
    _CYR_GREEK_FROM + _FULLWIDTH_FROM,
    _CYR_GREEK_TO + _FULLWIDTH_TO,
)


def fold_confusables(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Homoglyph folding — the dedup-evasion countermeasure: spam farms
    dodge exact/line/MinHash dedup by swapping latin letters for
    identical-looking Cyrillic/Greek/fullwidth codepoints (a classic
    spam-SEO and benchmark-contamination trick); folding them back
    BEFORE hashing makes the evasive copy collide with its original
    again.  Returns ``(id_col, text, n_folded)`` — the folded text plus
    how many codepoints changed (the evasion signal itself: a latin
    document with hundreds of folded chars was adversarially encoded).

    One codepoint-wise ``translate`` + one length diff — zero-shuffle,
    engine-exact (Spark ``translate`` and DuckDB ``translate`` share
    per-codepoint semantics; pytest pins the map columns equal-length).
    Compose upstream of E1/E173/E4: ``dedup_exact(fold_confusables(df)
    ...)``.  UAX#15 canonical equivalence (``normalize_unicode``) is
    the orthogonal pass — confusables are DIFFERENT canonical
    characters that merely look alike, which NFC/NFKC never folds."""
    from ..partitioning import spread

    txt = F.coalesce(F.col(text_col), F.lit(""))
    folded = F.translate(txt, CONFUSABLES[0], CONFUSABLES[1])
    conf_class = "[" + CONFUSABLES[0] + "]"
    return spread(df).select(
        F.col(id_col),
        folded.alias("text"),
        (
            F.length(txt)
            - F.length(F.regexp_replace(txt, conf_class, ""))
        )
        .cast("long")
        .alias("n_folded"),
    )


def augment_token_edits(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dropout_ppm: int = 30000,
    dup_ppm: int = 20000,
    seed: str = "aug1",
) -> DataFrame:
    """Deterministic token-edit augmentation (the EDA/UDA recipe made
    reproducible): per token position an md5 coin decides drop /
    duplicate / keep, so consistency-training pairs and robustness
    evals regenerate bit-identically on any cluster, any partitioning —
    no RNG state, the coin IS a pure function of (seed, doc, position).

    coin(doc, pos) = hash60(seed:doc:pos) % 1e6; drop when
    coin < ``dropout_ppm``, duplicate when coin >= 1e6 - ``dup_ppm``
    (disjoint bands — validated), keep otherwise.  Returns ``(id_col,
    text, n_tokens, n_dropped, n_dupped)`` with the augmented text
    whitespace-joined.

    Zero-shuffle per-row projection; coins materialize ONCE per row and
    feed both the edit construction and the counts (per-element
    re-evaluation discipline).  Positions are 1-based in the coin so
    the DuckDB twin's indexed lambda replays it directly."""
    from ..functions.text import hash60, tokens_pd

    if dropout_ppm < 0 or dup_ppm < 0 or dropout_ppm + dup_ppm >= 10**6:
        raise ValueError(
            "dropout_ppm and dup_ppm must be non-negative and sum < 1e6"
        )
    d = int(dropout_ppm)
    u = int(dup_ppm)
    toks = F.filter(tokens_pd(F.col(text_col)), lambda t: t != F.lit(""))
    base = spread(df).select(F.col(id_col), toks.alias("__toks"))
    base = base.select(
        id_col,
        "__toks",
        F.transform(
            F.col("__toks"),
            lambda t, i: (
                hash60(
                    F.concat(
                        F.lit(f"{seed}:"),
                        F.col(id_col).cast("string"),
                        F.lit(":"),
                        (i + 1).cast("string"),
                    )
                )
                % F.lit(1000000)
            ),
        ).alias("__coins"),
    )
    aug = F.flatten(
        F.zip_with(
            F.col("__toks"),
            F.col("__coins"),
            lambda t, c: F.when(c < F.lit(d), F.array().cast("array<string>"))
            .when(c >= F.lit(1000000 - u), F.array(t, t))
            .otherwise(F.array(t)),
        )
    )
    return base.select(
        F.col(id_col),
        F.array_join(aug, " ").alias("text"),
        F.size("__toks").cast("long").alias("n_tokens"),
        F.size(F.filter(F.col("__coins"), lambda c: c < F.lit(d)))
        .cast("long")
        .alias("n_dropped"),
        F.size(
            F.filter(F.col("__coins"), lambda c: c >= F.lit(1000000 - u))
        )
        .cast("long")
        .alias("n_dupped"),
    )
