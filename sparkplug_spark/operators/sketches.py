"""Mergeable distinct-count sketch tables (Apache DataSketches HLL).

The pattern that makes 100 TB dashboards cheap: aggregate the raw log
ONCE into per-(fine-grained key) HLL sketches — a table of kilobyte
binary columns — then answer every coarser distinct-count rollup by
UNIONING stored sketches, never rescanning raw data.  Exact distincts
don't compose this way (distinct users per day can't be summed into
distinct users per week); sketches do, with a published error bound
(~1.04/√2^lg_k relative standard error).

Built on Spark's native `hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate` (JVM DataSketches, map-side combined, no UDFs).
Estimates are engine-specific (DuckDB's HLL differs) — queries built on
these are rows-only; the error gate lives in pytest against exact
counts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "build_cms_sketch",
    "cms_estimate",
    "build_distinct_sketches",
    "rollup_distinct_sketches",
    "build_histogram_sketch",
    "rollup_histogram_percentiles",
    "kmv_sketch",
    "kmv_merge",
    "kmv_distinct",
    "kmv_jaccard_pairs",
]


def build_distinct_sketches(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Per-key HLL sketch table: (key_cols..., sketch BINARY, n_est
    BIGINT).  ``lg_k=14`` → ~0.8% RSE at ~16 KiB max per sketch; store
    the result (partitioned by a coarse key prefix) as the reusable
    rollup source.

    Plan: one map-side-combined aggregate — sketches merge on the
    combiner, so the shuffle carries one sketch per (partition, key),
    never raw values."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    sk = F.hll_sketch_agg(F.col(value_col), F.lit(int(lg_k)))
    return df.groupBy(*[F.col(c) for c in key_cols]).agg(
        sk.alias("sketch")
    ).withColumn(
        "n_est", F.hll_sketch_estimate("sketch").cast("long")
    )


def rollup_distinct_sketches(
    sketches: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge a stored sketch table up to a coarser grain:
    (group_cols..., n_est BIGINT).  Pass ``group_cols=[]`` for the grand
    total (one row).  Input rows are kilobytes, so this aggregates the
    SKETCH table — the raw log is never touched again."""
    merged = F.hll_union_agg(F.col(sketch_col))
    if group_cols:
        out = sketches.groupBy(*[F.col(c) for c in group_cols]).agg(
            merged.alias("__m")
        )
    else:
        out = sketches.agg(merged.alias("__m"))
    return out.select(
        *group_cols, F.hll_sketch_estimate("__m").cast("long").alias("n_est")
    )


def build_histogram_sketch(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Per-key equi-width histogram table — the mergeable-PERCENTILE
    sibling of :func:`build_distinct_sketches`.  Unlike t-digest/GK
    sketches, fixed bins merge by plain integer addition, so rollups stay
    engine-exact and oracle-checkable; the price is a fixed value domain
    and ±1-bin-width rank error.

    One row per (key, occupied bin): (key_cols..., bin INT, n BIGINT)
    with ``bin = clamp(floor((v - lo) / (hi - lo) * bins), 0, bins-1)``
    — out-of-domain values land in the edge bins (a release audit wants
    them counted, not dropped); NULL values are dropped.  Long form, not
    an array column: a coarser rollup is then just a narrower groupBy.

    Plan: one map-side-combined aggregate; the shuffle carries at most
    ``|keys| · bins`` rows regardless of input size."""
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if not hi > lo:
        raise ValueError("hi must be > lo")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    v = F.col(value_col).cast("double")
    raw_bin = F.floor((v - F.lit(float(lo))) / F.lit(float(hi - lo)) * bins)
    bin_ = F.least(
        F.greatest(raw_bin, F.lit(0)), F.lit(int(bins - 1))
    ).cast("int")
    return (
        df.filter(v.isNotNull())
        .groupBy(*[F.col(c) for c in key_cols], bin_.alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def rollup_histogram_percentiles(
    sketch: DataFrame,
    group_cols: Sequence[str],
    percentiles: Sequence[int],
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Merge a stored histogram table to a coarser grain and read
    percentiles off the merged bins: for each group and percentile p, the
    first bin whose cumulative count reaches ``ceil(p/100 · n)``, reported
    as (group_cols..., pct INT, bin INT, value_low DOUBLE, value_high
    DOUBLE) — the bin's bounds bracket the true percentile to one bin
    width.  All rank math is exact integers; the bounds are the same two
    float ops in any engine.

    The input is the KB-scale sketch table, so every coarser percentile
    question is answered without rescanning raw data — the operational
    win of mergeable sketches (same contract as
    :func:`rollup_distinct_sketches`)."""
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if not hi > lo:
        raise ValueError("hi must be > lo")
    if not percentiles:
        raise ValueError("percentiles must be non-empty")
    for p in percentiles:
        if not 0 < p <= 100:
            raise ValueError(f"percentiles must be in (0, 100], got {p}")
    from pyspark.sql import Window

    gcols = [F.col(c) for c in group_cols]
    merged = sketch.groupBy(*gcols, F.col("bin")).agg(
        F.sum("n").cast("long").alias("n")
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*[F.col(c) for c in group_cols])
    cum = merged.withColumn("__cum", F.sum("n").over(w)).withColumn(
        "__tot", F.sum("n").over(wt)
    )
    width = (hi - lo) / bins
    pct_rows = F.explode(
        F.array(*[F.lit(int(p)) for p in percentiles])
    ).alias("pct")
    hit = (
        cum.select(*[F.col(c) for c in group_cols], "bin", "__cum", "__tot", pct_rows)
        # rank threshold ceil(p/100 * n) as exact integers:
        # (p*n + 99) div 100 == ceil(p*n/100) for positive ints
        .filter(F.col("__cum") >= F.expr("(pct * __tot + 99) div 100"))
        .groupBy(*[F.col(c) for c in group_cols], "pct")
        .agg(F.min("bin").alias("bin"))
    )
    return hit.select(
        *[F.col(c) for c in group_cols],
        "pct",
        "bin",
        (F.lit(float(lo)) + F.col("bin") * F.lit(float(width))).alias(
            "value_low"
        ),
        (F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(float(width))).alias(
            "value_high"
        ),
    )


def build_cms_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) as a mergeable
    TABLE: one row per occupied (row, col) counter, (``row`` INT, ``col``
    BIGINT, ``cnt`` BIGINT).  Two sketches (or incremental batches)
    merge by summing counters on (row, col) — plain integer addition,
    the same mergeability discipline as the histogram/HLL stores.

    Hash family is md5-derived (``hash60(j || chr(31) || key) % width``
    per row ``j``) so an oracle regenerates the identical sketch — no
    engine-private hash.  Guarantee: estimates only OVER-count
    (point query = min over ``depth`` counters ≥ true count; error ≤
    ε·N with ε ≈ e/width at failure odds e^-depth).

    Plan: true per-key counts first (map-side combined — the explode
    multiplies DISTINCT keys by depth, not the raw stream), then one
    (row, col) sum whose output is bounded by depth·width rows no
    matter the corpus size."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be positive")
    from ..functions.text import hash60

    counts = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    rows = counts.select(
        "__k",
        "__c",
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("row"),
    )
    return (
        rows.select(
            F.col("row").cast("int"),
            (
                hash60(
                    F.concat(
                        F.col("row").cast("string"),
                        F.lit("\x1f"),
                        F.col("__k").cast("string"),
                    )
                )
                % width
            ).alias("col"),
            F.col("__c"),
        )
        .groupBy("row", "col")
        .agg(F.sum("__c").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-query a :func:`build_cms_sketch` table: per key, ``cms_est
    = min_j counter[j, hash_j(key)]`` (missing counters read as 0 —
    only possible when the key never occurred).  ``depth``/``width``
    must match the build.  The sketch is depth·width rows at most, so
    it BROADCASTS; estimation is a narrow per-key projection + one
    min-aggregate on the key."""
    from ..functions.text import hash60

    probes = keys.select(
        F.col(key_col),
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("row"),
    ).select(
        key_col,
        F.col("row").cast("int"),
        (
            hash60(
                F.concat(
                    F.col("row").cast("string"),
                    F.lit("\x1f"),
                    F.col(key_col).cast("string"),
                )
            )
            % width
        ).alias("col"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) bottom-k sketches — the PORTABLE mergeable
# distinct sketch.  Unlike the HLL family above (JVM DataSketches binary,
# engine-specific estimates), a KMV sketch is just the k smallest md5-60
# hashes of the key set: any engine that can md5 reproduces it BIT-FOR-BIT,
# so estimates are value-hash oracle-checkable, and sketch tables written
# by this module can be read/merged by DuckDB, Trino, or a Python report
# job without Spark.  Estimator (Bar-Yossef et al. 2002): with the hash
# space [0, 2^60) and h_k the k-th smallest distinct hash,
# D ≈ (k-1) * 2^60 / h_k, RSE ≈ 1/√(k-2).
# ---------------------------------------------------------------------------

#: IEEE-exact double for 2^60 (power of two — no rounding on either engine)
_KMV_SPACE = float(1 << 60)


def kmv_sketch(
    df: DataFrame,
    key: str,
    by: Sequence[str] = (),
    k: int = 256,
) -> DataFrame:
    """Bottom-``k`` sketch table: (by..., kmv_hash) — the ``k`` smallest
    distinct ``hash60(key)`` values per group, ≤ ``k`` rows per group.

    Plan: hash → map-side-combined dedup shuffled on (by..., hash) — the
    heavy stage spreads over the full hash range, so a hot GROUP does
    not make a hot partition — then one per-group window pass keeps the
    bottom k.  NULL keys are excluded (COUNT DISTINCT semantics).

    The sketch table is the stored artifact: union tables from new data
    and re-apply :func:`kmv_merge` to fold them — raw data is never
    rescanned for a coarser rollup, and since the k hashes are plain
    bigints the store is engine-portable (see module docstring)."""
    from pyspark.sql import Window

    from ..functions.text import hash60

    if k < 3:
        raise ValueError("k must be >= 3 (estimator needs k-1, k-2)")
    cols = [F.col(c) for c in by]
    hashed = (
        df.where(F.col(key).isNotNull())
        .select(*cols, hash60(F.col(key).cast("string")).alias("kmv_hash"))
        .dropDuplicates([*by, "kmv_hash"])
    )
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy("kmv_hash")
    return (
        hashed.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(k))
        .drop("__rk")
    )


def kmv_merge(
    sketches: DataFrame,
    by: Sequence[str] = (),
    k: int = 256,
) -> DataFrame:
    """Fold a union of sketch tables back to one bottom-``k`` sketch per
    group — the KMV merge is just "bottom-k of the union", so merging
    per-shard/per-day sketches equals sketching the concatenated data
    (pytest contract).  Pass a coarser ``by`` than the stored grain to
    roll up (e.g. per-day sketches → one all-time sketch)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy("kmv_hash")
    return (
        sketches.select(*[F.col(c) for c in by], "kmv_hash")
        .dropDuplicates([*by, "kmv_hash"])
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(k))
        .drop("__rk")
    )


def kmv_distinct(
    sketches: DataFrame,
    by: Sequence[str] = (),
    k: int = 256,
) -> DataFrame:
    """Distinct-count report from a sketch table: (by..., n_hashes,
    kth_hash, est_distinct BIGINT).  Groups holding fewer than ``k``
    hashes saw their whole key set — the estimate is EXACT (= n_hashes);
    otherwise D̂ = floor((k-1)·2^60 / h_k).  The arithmetic is IEEE
    mul/div on exactly-representable operands, so DuckDB reproduces the
    estimate bit-for-bit (no libm — the JVM-vs-libm ln() 1–2-ulp class does
    not apply)."""
    agg = sketches.groupBy(*[F.col(c) for c in by]).agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("kmv_hash").alias("kth_hash"),
    )
    est = F.floor(
        F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / F.col("kth_hash").cast("double")
    ).cast("long")
    return agg.withColumn(
        "est_distinct",
        F.when(F.col("n_hashes") < int(k), F.col("n_hashes")).otherwise(est),
    )


def kmv_jaccard_pairs(
    sketches: DataFrame,
    group_col: str,
    k: int = 256,
) -> DataFrame:
    """Pairwise set-overlap estimates between every two groups of a
    sketch table: (group_a, group_b, n_common, n_merged, jaccard_ppm,
    union_est, intersection_est) for group_a < group_b.

    Estimator: X = bottom-k of (S_a ∪ S_b) — computable from the two
    sketches alone — then Ĵ = |X ∩ S_a ∩ S_b| / |X| and the union/
    intersection sizes follow from the KMV distinct estimator on X.
    All counts are integers and the ratios integer-ppm floors, so the
    report is exactly reproducible by the oracle.

    Plan: sketches are ≤ k rows per group, so every join here is
    broadcast-tiny regardless of raw-data size — pairwise overlap over a
    100 TB log costs one sketch build plus this metadata-sized query."""
    s = sketches.select(F.col(group_col).alias("g"), "kmv_hash")
    groups = s.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("group_a"))
        .crossJoin(groups.select(F.col("g").alias("group_b")))
        .filter(F.col("group_a") < F.col("group_b"))
    )
    from_a = pairs.join(
        s.select(F.col("g").alias("group_a"), "kmv_hash"), "group_a"
    ).select("group_a", "group_b", "kmv_hash", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    from_b = pairs.join(
        s.select(F.col("g").alias("group_b"), "kmv_hash"), "group_b"
    ).select("group_a", "group_b", "kmv_hash", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    members = (
        from_a.unionByName(from_b)
        .groupBy("group_a", "group_b", "kmv_hash")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("group_a", "group_b").orderBy("kmv_hash")
    merged = members.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") <= int(k)
    )
    rep = merged.groupBy("group_a", "group_b").agg(
        F.count(F.lit(1)).alias("n_merged"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("long")).alias("n_common"),
        F.max("kmv_hash").alias("__kth"),
    )
    union_est = F.when(
        F.col("n_merged") < int(k), F.col("n_merged")
    ).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / F.col("__kth").cast("double")
        ).cast("long")
    )
    rep = rep.withColumn("union_est", union_est)
    return rep.select(
        "group_a",
        "group_b",
        "n_common",
        "n_merged",
        F.expr("n_common * 1000000L div n_merged").alias("jaccard_ppm"),
        "union_est",
        F.expr("n_common * union_est div n_merged").alias("intersection_est"),
    )
