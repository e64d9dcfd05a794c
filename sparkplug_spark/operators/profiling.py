"""Dataset profiling: per-column statistics and fixed-bin histograms.

The pre-flight checks of any 100 TB ingest: one pass over the data,
all-JVM aggregation, deterministic outputs (decimal-summed means, no
float-order-dependent reductions), so profiles are comparable across runs
and engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import spread

__all__ = [
    "referential_audit",
    "share_shift",
    "gini_concentration",
    "column_profile",
    "histogram",
    "length_quartiles_by_source",
    "covariance_components",
    "key_skew_report",
    "dataset_fingerprint",
    "group_ntiles",
    "trend_components",
    "pareto_report",
    "join_size_estimate",
    "fd_audit",
    "categorical_profile",
    "rank_normalize",
    "feature_drift",
    "mutual_information",
]


def column_profile(
    df: DataFrame, cols: Sequence[str], exact_distinct: bool = False
) -> DataFrame:
    """One row per numeric column: count, nulls, distinct, min, max, exact
    scaled sum, mean.  Single aggregation pass.

    ``sum_micros`` is the DECIMAL-summed value scaled by 1e6 into an exact
    BIGINT — engine-reproducible (no float reduction order, no division),
    which is what cross-engine checks should compare; ``mean_v`` is the
    convenience double for humans.

    ``exact_distinct=False`` (the default) uses HyperLogLog++
    ``approx_count_distinct`` — at 100 TB an exact distinct over
    high-cardinality doubles triples the shuffled aggregate state, while the
    sketch is constant-size per column.  Set ``exact_distinct=True`` only
    when the profile feeds an exactness-sensitive consumer (e.g. the
    cross-engine oracle)."""
    dec = "decimal(28,6)"
    nd = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__cnt"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nnull"),
            nd(F.col(c)).alias(f"{c}__nd"),
            F.min(F.col(c)).cast("double").alias(f"{c}__min"),
            F.max(F.col(c)).cast("double").alias(f"{c}__max"),
            # per-row decimal scale-up then integer sum: exact, and the
            # result type is LONG in every engine (a DECIMAL grand sum would
            # be HUGEINT/DECIMAL(38,6) depending on the engine)
            F.sum((F.col(c).cast(dec) * F.lit(1000000)).cast("long")).alias(
                f"{c}__summ"
            ),
            # decimal sum → double, THEN double division: decimal-division
            # scale rules differ across engines, double division doesn't
            (
                F.sum(F.col(c).cast(dec)).cast("double") / F.count(F.col(c))
            ).alias(f"{c}__mean"),
        ]
    row = spread(df).agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__cnt, {c}__nnull, {c}__nd, {c}__min, {c}__max, "
        f"{c}__summ, {c}__mean"
        for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_rows, n_null, n_distinct, min_v, max_v, sum_micros, mean_v)"
    )


def histogram(
    df: DataFrame, col: str, lo: float, hi: float, bins: int = 20
) -> DataFrame:
    """Fixed-bin histogram: (bucket, bucket_lo, bucket_hi, n).  Bucket -1
    catches values below ``lo``, bucket ``bins`` values at/above ``hi``
    (and nulls are dropped).  Fixed bins → one shuffle of at most
    ``bins+2`` groups; both engines do the identical IEEE arithmetic, so
    boundary values land in the same bucket everywhere."""
    width = (float(hi) - float(lo)) / bins
    x = F.col(col).cast("double")
    bucket = (
        F.when(x < float(lo), F.lit(-1))
        .when(x >= float(hi), F.lit(bins))
        .otherwise(F.floor((x - float(lo)) / F.lit(width)).cast("int"))
    )
    return (
        spread(df)
        .filter(x.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bucket_lo", F.lit(float(lo)) + F.col("bucket") * F.lit(width))
        .withColumn("bucket_hi", F.col("bucket_lo") + F.lit(width))
        .select("bucket", "bucket_lo", "bucket_hi", "n")
    )


def length_quartiles_by_source(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact rank-based five-number summary of ``value_col`` per group —
    the corpus-shape report (is one source full of stubs? one full of
    megadocs?) that decides per-source filter thresholds.

    Quartile q is the ceil(q*n)-th smallest value (lower-rank convention,
    ties broken by ``id_col``): an INTEGER pick, not an interpolation, so
    every engine returns the identical row — interpolated percentiles are
    float-divide-order territory.  One shuffle on the group key for the
    rank window, then a partial-aggregated groupBy; group count stays
    executor-side throughout.  At 100 TB the window partitions by source
    (dozens of keys): fine for a report over O(10) sources; for
    high-cardinality grouping use :func:`column_profile` per partition
    instead."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.col(value_col), F.col(id_col))
    ranked = (
        spread(df)
        .select(group_col, value_col, id_col)
        # drop NULL values explicitly: engines disagree on NULL sort order
        # (Spark ASC puts nulls first, DuckDB last), so ranks over nulls
        # would be engine-dependent; n_docs therefore counts non-null rows
        .filter(F.col(value_col).isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(group_col)))
    )
    v = F.col(value_col).cast("long")

    def _at(k):  # value at rank k (exactly one row matches per group)
        return F.max(F.when(F.col("__rn") == k, v)).cast("long")

    return ranked.groupBy(group_col).agg(
        F.max("__n").cast("long").alias("n_docs"),
        F.min(v).alias("min_v"),
        _at(F.expr("(__n + 3) div 4")).alias("q1"),
        _at(F.expr("(__n + 1) div 2")).alias("median"),
        _at(F.expr("(3 * __n + 3) div 4")).alias("q3"),
        F.max(v).alias("max_v"),
    )


def covariance_components(
    df: DataFrame,
    pairs: list[tuple[str, str]],
    scale: int = 100,
) -> DataFrame:
    """Exact integer moment components for column pairs — the
    engine-reproducible way to ship correlation/covariance out of a
    profile (a raw ``corr()`` double depends on each engine's summation
    order; these BIGINT sums do not).

    Each column is scaled to integers (``floor(col * scale)`` — the same
    IEEE floor everywhere) and, per pair, rows where BOTH are non-null
    contribute to ``(n, sum_x, sum_y, sum_xx, sum_yy, sum_xy)``.
    Consumers derive ``cov = (sum_xy - sum_x*sum_y/n) / n`` and
    ``corr`` from the components with one division at the end.

    ONE aggregation job for all pairs (map-side partials); overflow
    bound: ``|col*scale|`` must stay under ``sqrt(2^63 / n_rows)`` —
    raise ``scale`` only as far as the domain allows."""
    if not pairs:
        raise ValueError("pairs must be non-empty")
    aggs = []
    for i, (x, y) in enumerate(pairs):
        xi = F.floor(F.col(x) * scale).cast("long")
        yi = F.floor(F.col(y) * scale).cast("long")
        both = F.col(x).isNotNull() & F.col(y).isNotNull()
        gx = F.when(both, xi)
        gy = F.when(both, yi)
        aggs += [
            F.count(F.when(both, F.lit(1))).alias(f"__n{i}"),
            F.coalesce(F.sum(gx), F.lit(0)).alias(f"__sx{i}"),
            F.coalesce(F.sum(gy), F.lit(0)).alias(f"__sy{i}"),
            F.coalesce(F.sum(gx * gx), F.lit(0)).alias(f"__sxx{i}"),
            F.coalesce(F.sum(gy * gy), F.lit(0)).alias(f"__syy{i}"),
            F.coalesce(F.sum(gx * gy), F.lit(0)).alias(f"__sxy{i}"),
        ]
    row = df.agg(*aggs)
    items = [
        F.struct(
            F.lit(x).alias("x_col"),
            F.lit(y).alias("y_col"),
            F.col(f"__n{i}").alias("n"),
            F.col(f"__sx{i}").alias("sum_x"),
            F.col(f"__sy{i}").alias("sum_y"),
            F.col(f"__sxx{i}").alias("sum_xx"),
            F.col(f"__syy{i}").alias("sum_yy"),
            F.col(f"__sxy{i}").alias("sum_xy"),
        )
        for i, (x, y) in enumerate(pairs)
    ]
    return row.select(F.explode(F.array(*items)).alias("__e")).select("__e.*")


def key_skew_report(
    df: DataFrame,
    key_cols: Sequence[str],
    top_n: int = 20,
) -> DataFrame:
    """Join/aggregation pre-flight skew diagnostic: the ``top_n`` heaviest
    key values with their row share and their multiple of the average key
    load - the numbers that decide between a plain shuffle join, AQE skew
    handling, and an explicit salt (:func:`~.joins.salted_join`).

    Output: (key, n_rows, share_ppm, avg_multiple_ppk, rank) where ``key``
    is the concatenated string form of ``key_cols`` (NULLs rendered as a
    literal marker - NULL keys are the classic skew culprit and must stay
    visible), ``share_ppm = 1e6*n // total`` and ``avg_multiple_ppk =
    1000*n*n_keys // total`` (1000 = exactly average load) - all exact
    integer arithmetic, BIGINT in every engine.

    Plan: one map-side-combined count per key, scalar (total, n_keys) via
    a second tiny aggregate cross-joined back (broadcast of one row), and
    a TakeOrdered top-N - per-partition heaps, no global sort shuffle; the
    rank window touches only the ``top_n`` survivors."""
    from pyspark.sql import Window

    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    key = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("<NULL>")) for c in key_cols]
    )
    counts = (
        spread(df)
        .select(key.alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    totals = counts.agg(
        F.sum("n_rows").alias("__total"), F.count(F.lit(1)).alias("__n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n_rows",
            F.expr("(1000000 * n_rows) DIV __total").alias("share_ppm"),
            F.expr("(1000 * n_rows * __n_keys) DIV __total").alias(
                "avg_multiple_ppk"
            ),
        )
        .orderBy(F.col("n_rows").desc(), F.col("key"))
        .limit(top_n)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("n_rows").desc(), F.col("key")))
            .cast("long"),
        )
    )


def dataset_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Order-independent corpus content digest — ONE row:
    (n_rows, total_chars, xor_hash, sum_hash_mod).

    Verifies that two copies of a dataset are byte-identical (replication,
    re-partitioning, engine migration, post-restore audit) without sorting
    or moving the data: each row reduces to a 60-bit md5 content hash of
    ``id ‖ 0x1f ‖ text``; XOR and a modular sum fold them commutatively,
    so any partitioning and any row order give the same digest.  Two
    independent folds make silent collision (a swap that preserves XOR
    also preserving the modular sum) astronomically unlikely.

    ``sum_hash_mod`` reduces mod 2^61-1 AFTER a decimal-exact sum so the
    BIGINT output can't overflow at any corpus size.  One partial-agg
    pass (map-side combine), nothing but per-partition digests shuffle."""
    from ..functions.text import hash60

    h = hash60(
        F.concat(
            F.col(id_col).cast("string"), F.lit("\x1f"), F.col(text_col)
        )
    )
    mod = (1 << 61) - 1
    return spread(df).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length(F.col(text_col)).cast("long")).alias("total_chars"),
        F.bit_xor(h).alias("xor_hash"),
        (F.sum(h.cast("decimal(38,0)")) % F.lit(mod))
        .cast("long")
        .alias("sum_hash_mod"),
    )


def group_ntiles(
    df: DataFrame,
    n: int = 10,
    order_col: str = "n_chars",
    group_col: str | None = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group ntile bucketing (curriculum tiers / balanced-mixing
    strata): assign each row a 1..``n`` tile of ``order_col`` within its
    group.  The ordering is (order_col, id_col) so ties are deterministic
    and both engines produce identical tiles (SQL-standard ntile: equal
    buckets, remainder spread over the leading tiles).

    Typical uses: length deciles for bucketed batching, quality quartiles
    for curriculum schedules, per-language strata for balanced sampling.

    Plan: one window shuffle on the group key (grouped form is the scale
    path; ``group_col=None`` is a single global partition — audit-sized
    inputs only)."""
    from pyspark.sql import Window

    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    keys = [group_col] if group_col else []
    w = Window.partitionBy(*keys).orderBy(F.col(order_col), F.col(id_col))
    return df.select(
        id_col,
        *keys,
        order_col,
        F.ntile(n).over(w).alias("tile"),
    )


def trend_components(
    df: DataFrame,
    key_cols: Sequence[str],
    t_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key ordinary-least-squares trend as EXACT integer components:
    the "is this metric trending and how fast" primitive behind activity
    monitoring (pair with ``rate_anomalies``: that flags level outliers,
    this measures drift).

    For integer observations (t, y) per key, one map-side-combined
    aggregate emits the sufficient statistics and the closed-form slope

        slope = (n·Σty − Σt·Σy) / (n·Σt² − (Σt)²)

    as exact ``slope_num``/``slope_den`` BIGINTs plus the truncating
    ``slope_ppm = slope_num · 1_000_000 div slope_den`` (NULL when the
    denominator is 0 — fewer than two distinct t values).  Emitting the
    rational instead of a DOUBLE keeps the result engine-exact, same
    policy as ``covariance_components``.

    Overflow headroom: needs ``n · t_max · Σ|y| < 2⁶³`` (and the ·10⁶ on
    the num for ppm) — index t from 0 per key (day/period numbers, not
    raw epochs) to keep magnitudes small."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    t = F.col(t_col).cast("long")
    y = F.col(y_col).cast("long")
    agg = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(t).cast("long").alias("sum_t"),
        F.sum(y).cast("long").alias("sum_y"),
        F.sum(t * y).cast("long").alias("sum_ty"),
        F.sum(t * t).cast("long").alias("sum_t2"),
    )
    with_rational = agg.withColumns(
        {
            "slope_num": F.expr("n * sum_ty - sum_t * sum_y").cast("long"),
            "slope_den": F.expr("n * sum_t2 - sum_t * sum_t").cast("long"),
        }
    )
    return with_rational.withColumn(
        "slope_ppm",
        F.expr("slope_num * 1000000 div nullif(slope_den, 0)").cast("long"),
    )


def pareto_report(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    vital_ppm: int = 800_000,
) -> DataFrame:
    """Contribution concentration ("80/20") report: per key, its volume,
    exact-ppm share, running cumulative share in descending-volume order,
    and whether the key belongs to the VITAL FEW — the smallest
    descending-volume prefix covering ``vital_ppm`` (default 80%) of
    total volume.  The pre-flight for storage tiering, cache sizing, and
    skew triage ("which 2% of sources are 80% of the corpus").

    ``weight_col=None`` counts rows; otherwise volumes are Σweight
    (BIGINT).  Determinism: ordering is (volume DESC, key ASC) — total —
    and the vital predicate is the exact integer comparison
    ``(cum − volume)·10⁶ < vital_ppm·total`` (the key that CROSSES the
    threshold is included; headroom: total ≤ 2⁶³/10⁶).

    Output: (key, volume, share_ppm, cum_share_ppm, is_vital), all
    engine-exact.

    Plan: one map-side-combined key aggregate, then the cumulative runs
    through :func:`~..partitioning.global_prefix_sums` — range-
    distributed, never a single-partition window, so the report holds at
    any key cardinality."""
    from ..partitioning import global_prefix_sums

    if not 0 < vital_ppm <= 1_000_000:
        raise ValueError("vital_ppm must be in (0, 1_000_000]")
    w = F.count(F.lit(1)) if weight_col is None else F.sum(F.col(weight_col))
    per = df.groupBy(F.col(key_col).alias("key")).agg(
        w.cast("long").alias("volume")
    )
    cum = global_prefix_sums(
        per,
        [F.col("volume").desc(), F.col("key").asc()],
        "volume",
        cum_col="__cum",
    )
    total = cum.agg(F.sum("volume").cast("long").alias("__total"))
    return (
        cum.crossJoin(F.broadcast(total))
        .select(
            "key",
            "volume",
            # nullif: an all-zero (or net-zero) volume total must yield
            # NULL shares, not an ANSI DIVIDE_BY_ZERO
            F.expr("volume * 1000000 div nullif(__total, 0)")
            .cast("long")
            .alias("share_ppm"),
            F.expr("__cum * 1000000 div nullif(__total, 0)")
            .cast("long")
            .alias("cum_share_ppm"),
            F.expr(
                f"(__cum - volume) * 1000000 < {int(vital_ppm)} * __total"
            ).alias("is_vital"),
        )
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    on: str | None = None,
    left_on: str | None = None,
    right_on: str | None = None,
) -> DataFrame:
    """EXACT inner-equi-join output size WITHOUT executing the join: the
    pre-flight that catches a key-explosion (unintended many-to-many)
    before it melts a cluster.  Per-key counts on both sides join and the
    output size is ``Σ_k cl(k)·cr(k)`` — the aggregates are key-sized, so
    this costs two map-side-combined counts and a key join instead of
    materializing a possibly-quadratic result.

    One row: (n_left, n_right, n_matching_keys, n_join_rows,
    max_key_rows, max_key) — ``max_key_rows`` is the single hottest key's
    output contribution (the skew/straggler predictor; pair with
    :func:`key_skew_report` for the full distribution, then
    ``joins.salted_join`` if it's ugly).  All BIGINT.  NULL keys never
    match (SQL semantics) and are excluded from both side counts.

    Overflow: per-key ``cl·cr`` and their sum must stay < 2⁶³ — if this
    OVERFLOWS, the join you were about to run was ~10¹⁹ rows; the
    pre-flight failing loudly is the feature."""
    lk = left_on or on
    rk = right_on or on
    if not lk or not rk:
        raise ValueError(
            "join_size_estimate: pass on=, or both left_on= and right_on="
        )
    cl = (
        left.filter(F.col(lk).isNotNull())
        .groupBy(F.col(lk).alias("__k"))
        .agg(F.count(F.lit(1)).cast("long").alias("__cl"))
    )
    cr = (
        right.filter(F.col(rk).isNotNull())
        .groupBy(F.col(rk).alias("__k"))
        .agg(F.count(F.lit(1)).cast("long").alias("__cr"))
    )
    # key-count-sized tables each feed two consumers (the join + the
    # side totals): persist them so each RAW input is scanned exactly
    # once — n_left/n_right derive from the aggregates, not a rescan
    cl, cr = cl.persist(), cr.persist()
    joined = cl.join(cr, "__k").select(
        "__k", (F.col("__cl") * F.col("__cr")).alias("__rows")
    ).persist()
    totals = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_matching_keys"),
        F.coalesce(F.sum("__rows"), F.lit(0)).cast("long").alias("n_join_rows"),
        F.coalesce(F.max("__rows"), F.lit(0)).cast("long").alias("max_key_rows"),
    )
    # deterministic argmax: smallest key among ties with the max
    mk = (
        joined.crossJoin(F.broadcast(totals.select("max_key_rows")))
        .filter(F.col("__rows") == F.col("max_key_rows"))
        .agg(F.min("__k").alias("max_key"))
    )
    n_l = cl.agg(F.coalesce(F.sum("__cl"), F.lit(0)).cast("long").alias("n_left"))
    n_r = cr.agg(F.coalesce(F.sum("__cr"), F.lit(0)).cast("long").alias("n_right"))
    out = (
        n_l.crossJoin(n_r)
        .crossJoin(totals)
        .crossJoin(mk)
        .select(
            "n_left",
            "n_right",
            "n_matching_keys",
            "n_join_rows",
            "max_key_rows",
            "max_key",
        )
    )
    from ..caching import materialize_release

    return materialize_release(out, cl, cr, joined)


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    k_x10: int = 30,
) -> DataFrame:
    """Robust per-group outlier flags via median absolute deviation —
    the quantile-trim sibling that doesn't need a chosen quantile: flag
    rows with ``|v − median| > k·MAD`` (default k = 3.0 as ``k_x10 =
    30``; the robust z-score, immune to the outliers it hunts, unlike
    mean/stddev).

    Engine-exact discipline: medians use the lower-rank convention
    (value at rank ``(n+1) div 2``, ties by ``id_col`` — an integer
    PICK, never interpolation), deviations are single IEEE
    subtractions, and the flag comparison ``dev·10 > k_x10·MAD``
    multiplies by exact small integers.  NULL values are dropped
    (engines disagree on NULL sort order).

    Output per row: (id_col, group_col, value_col, group_median,
    abs_dev, group_mad, is_outlier).

    Plan: two rank windows on the group key (value rank, then deviation
    rank) + two broadcast-joined per-group picks; same shape and caveat
    as :func:`length_quartiles_by_source` — partitions by the report's
    grouping key, sized for O(dozens–thousands) of groups."""
    from pyspark.sql import Window

    if k_x10 < 0:
        raise ValueError("k_x10 must be >= 0")
    v = F.col(value_col).cast("double")
    base = (
        spread(df)
        .select(id_col, group_col, value_col)
        .filter(F.col(value_col).isNotNull())
    )
    wv = Window.partitionBy(group_col).orderBy(v, F.col(id_col))
    wg = Window.partitionBy(group_col)
    ranked = base.withColumn("__rn", F.row_number().over(wv)).withColumn(
        "__n", F.count(F.lit(1)).over(wg)
    )
    med = (
        ranked.filter(F.col("__rn") == F.expr("(__n + 1) div 2"))
        .select(group_col, v.alias("group_median"))
    )
    devs = base.join(F.broadcast(med), group_col).withColumn(
        "abs_dev", F.abs(v - F.col("group_median"))
    )
    wd = Window.partitionBy(group_col).orderBy(
        F.col("abs_dev"), F.col(id_col)
    )
    dranked = devs.withColumn("__rn", F.row_number().over(wd)).withColumn(
        "__n", F.count(F.lit(1)).over(wg)
    )
    mad = (
        dranked.filter(F.col("__rn") == F.expr("(__n + 1) div 2"))
        .select(group_col, F.col("abs_dev").alias("group_mad"))
    )
    return (
        devs.join(F.broadcast(mad), group_col)
        .select(
            id_col,
            group_col,
            value_col,
            "group_median",
            "abs_dev",
            "group_mad",
            (
                F.col("abs_dev") * F.lit(10.0)
                > F.lit(float(k_x10)) * F.col("group_mad")
            ).alias("is_outlier"),
        )
    )


def fd_audit(
    df: DataFrame,
    candidates: Sequence[tuple[str, str]],
) -> DataFrame:
    """Approximate functional-dependency audit (the Metanome/profiling
    pass): for each candidate ``lhs → rhs``, how far the data is from
    satisfying the dependency.  The schema-design / data-quality check a
    pipeline runs before trusting a column as a join key or a dimension
    attribute: ``violations = 0`` means every lhs value maps to exactly
    one rhs value; small violation_ppm means "FD holds approximately —
    suspect dirty rows"; large means "not a dependency".

    For each candidate: group rows by (lhs, rhs); per lhs value the
    dominant rhs accounts for ``max(c)`` rows, so
    ``violations = Σ_lhs (tot_lhs − max_c_lhs)`` — the minimum number of
    rows that would have to change for the FD to hold exactly.  All
    counts are exact BIGINTs; violation_ppm is integer ppm.  NULL is
    treated as an ordinary value on both sides (both engines group NULLs
    into one group).

    Returns one row per candidate: (lhs, rhs, n_rows, n_lhs_values,
    violations, violation_ppm, holds).

    Scale shape: per candidate, one map-side-combinable two-column
    groupBy + one lhs-key fold + a 1-row summary — each candidate scans
    a two-column projection (column pruning) and shuffles only distinct
    (lhs, rhs) pairs, never rows.  Candidates are independent; the union
    lets Spark schedule them as parallel jobs of one action.
    """
    if not candidates:
        raise ValueError("fd_audit needs at least one (lhs, rhs) candidate")
    parts = []
    for lhs, rhs in candidates:
        pair_counts = (
            spread(df)
            .groupBy(F.col(lhs).alias("__l"), F.col(rhs).alias("__r"))
            .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        )
        per_lhs = pair_counts.groupBy("__l").agg(
            F.sum("__c").alias("__tot"),
            F.max("__c").alias("__dom"),
        )
        parts.append(
            per_lhs.agg(
                F.sum("__tot").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_lhs_values"),
                (F.sum("__tot") - F.sum("__dom")).cast("long").alias("violations"),
            ).select(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                "n_rows",
                "n_lhs_values",
                "violations",
                F.expr("violations * 1000000 div n_rows").alias("violation_ppm"),
                (F.col("violations") == F.lit(0)).alias("holds"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def categorical_profile(
    df: DataFrame,
    cols: Sequence[str],
) -> DataFrame:
    """Categorical companion of :func:`column_profile`: per column, the
    value-distribution facts a pipeline checks before trusting a column
    as a dimension / stratification / join key — exact distinct count,
    the mode (deterministic tie-break: smallest value), its share, and
    the Shannon entropy of the value distribution (≈0 ⇒ the column is
    near-constant and useless for stratification; ≈ln(distinct) ⇒
    uniform).

    Values are profiled as strings (one cast, engine-identical for
    ints/strings); NULLs are counted separately and excluded from
    distinct/mode/entropy.  Entropy follows the repo's nano-nat
    discipline (per-value terms quantized to integer nano-nats before
    the exact BIGINT sum, integer-div fold) so the report is
    engine-reproducible; shares are integer ppm.

    Returns one row per column: (col_name, n_rows, n_nulls, n_distinct,
    mode_value, mode_n, mode_share_ppm, entropy_nanonats).

    Scale shape: per column one map-side-combinable single-column
    groupBy (column-pruned scan) + a 1-row fold over the value table —
    the same candidate-union shape as :func:`fd_audit`; no windows, no
    driver-side value lists.
    """
    if not cols:
        raise ValueError("categorical_profile needs at least one column")
    nano = lambda x: F.floor(x * F.lit(1e9) + F.lit(0.5)).cast("long")
    parts = []
    for name in cols:
        counts = (
            spread(df)
            .groupBy(F.col(name).cast("string").alias("__v"))
            .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        )
        nn = F.col("__nn")
        parts.append(
            counts.agg(
                F.sum("__c").cast("long").alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("__v").isNull(), F.col("__c"))), F.lit(0)
                )
                .cast("long")
                .alias("n_nulls"),
                F.count(F.when(F.col("__v").isNotNull(), F.lit(1)))
                .cast("long")
                .alias("n_distinct"),
                F.min(
                    F.when(
                        F.col("__v").isNotNull(),
                        F.struct(
                            (-F.col("__c")).alias("neg"), F.col("__v").alias("v")
                        ),
                    )
                ).alias("__m"),
                F.sum(
                    F.when(
                        F.col("__v").isNotNull(),
                        nano(
                            F.col("__c").cast("double")
                            * F.log(F.col("__c").cast("double"))
                        ),
                    )
                )
                .cast("long")
                .alias("__s"),
            )
            .withColumn("__nn", (F.col("n_rows") - F.col("n_nulls")).cast("long"))
            .select(
                F.lit(name).alias("col_name"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                F.col("__m.v").alias("mode_value"),
                (-F.col("__m.neg")).cast("long").alias("mode_n"),
                F.expr("(0 - __m.neg) * 1000000 div nullif(__nn, 0)").alias(
                    "mode_share_ppm"
                ),
                F.when(
                    nn > 0,
                    nano(F.log(nn.cast("double"))) - F.expr("__s div __nn"),
                )
                .cast("long")
                .alias("entropy_nanonats"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def rank_normalize(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Percentile-rank (quantile) normalization of a score column — the
    standard scale-free feature transform before mixing heterogeneous
    quality signals (a charlm ppm and a compression ratio live on
    incomparable scales; their ranks don't).  Adds ``rank`` (1-based,
    deterministic ties: order by value then id) and ``rank_ppm`` =
    ``(rank − 1)·10⁶ div (n − 1)`` (0 for the minimum, 1_000_000 for the
    maximum, integer ppm — engine-exact, no float division).  Rows with
    NULL values are dropped (engines disagree on NULL sort order).

    Scale shape: with ``group_col`` the rank is a per-group window (fine
    for many small groups); WITHOUT it the global rank comes from
    ``partitioning.global_row_numbers`` — range-distributed prefix sums,
    never a single-partition window, so the global tier survives any
    row count.  ``n`` rides along as a 1-row broadcast (global) or a
    group aggregate (grouped) — no second pass over the data.
    """
    from pyspark.sql import Window

    from ..partitioning import global_row_numbers

    base = spread(df).filter(F.col(value_col).isNotNull())
    if group_col is not None:
        w = Window.partitionBy(group_col).orderBy(
            F.col(value_col), F.col(id_col)
        )
        ranked = base.withColumn("rank", F.row_number().over(w).cast("long"))
        counts = base.groupBy(group_col).agg(
            F.count(F.lit(1)).cast("long").alias("__n")
        )
        ranked = ranked.join(F.broadcast(counts), group_col)
    else:
        ranked = global_row_numbers(
            base, [value_col, id_col], rn_col="rank"
        ).withColumn("rank", F.col("rank").cast("long"))
        n = base.agg(F.count(F.lit(1)).cast("long").alias("__n"))
        ranked = ranked.join(F.broadcast(n))
    return ranked.withColumn(
        "rank_ppm",
        F.when(F.col("__n") > 1, F.expr("(rank - 1) * 1000000 div (__n - 1)"))
        .otherwise(F.lit(0))
        .cast("long"),
    ).drop("__n")


def feature_drift(
    df_base: DataFrame,
    df_curr: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 20,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    feature — the standard ML-monitoring drift score (PSI < 0.1 stable,
    0.1–0.25 drifting, > 0.25 shifted), the numeric sibling of
    :func:`~.textops.token_drift` (which explains a TOKEN distribution)
    and :func:`~.textops.source_divergence` (which scores slices of one
    corpus).

    Buckets follow :func:`histogram` exactly (fixed [lo, hi) bins plus
    −1 / ``bins`` edge catchers — identical IEEE floor in both engines);
    shares are Laplace-smoothed over the ``bins + 2`` bucket domain so
    empty buckets never divide by zero, and each per-bucket term
    ``(p − q)·ln(p/q)`` (always ≥ 0) is quantized to integer nano-nats
    before the exact BIGINT sum — the E137 discipline, so the report is
    engine-reproducible.  The PSI is defined over buckets OBSERVED on at
    least one side (only those rows are emitted): when the snapshots are
    the same size an unobserved bucket's smoothed term is exactly 0
    anyway, but with very different totals its p=1/(ta+B) vs q=1/(tb+B)
    term would be nonzero — that term is excluded by this definition, so
    compare like-sized snapshots when reading the sum against the
    0.1/0.25 conventions.

    Returns (bucket, n_base, n_curr, psi_nanonats); total PSI = the
    column sum.

    Scale shape: one union + one map-side-combinable bucket groupBy
    (≤ bins+2 in-flight rows per task), totals ride a 1-row broadcast.
    NULLs are dropped (as in :func:`histogram`).
    """
    if bins <= 0:
        raise ValueError(f"bins must be positive, got {bins}")
    if not float(lo) < float(hi):
        raise ValueError(f"need lo < hi, got lo={lo} hi={hi}")
    nano = lambda x: F.floor(x * F.lit(1e9) + F.lit(0.5)).cast("long")
    width = (float(hi) - float(lo)) / bins

    def _bucketed(df: DataFrame, a: int, b: int) -> DataFrame:
        x = F.col(col).cast("double")
        bucket = (
            F.when(x < float(lo), F.lit(-1))
            .when(x >= float(hi), F.lit(bins))
            .otherwise(F.floor((x - float(lo)) / F.lit(width)).cast("int"))
        )
        return (
            spread(df)
            .filter(x.isNotNull())
            .select(
                bucket.alias("bucket"),
                F.lit(a).alias("__a"),
                F.lit(b).alias("__b"),
            )
        )

    u = _bucketed(df_base, 1, 0).unionAll(_bucketed(df_curr, 0, 1))
    counts = u.groupBy("bucket").agg(
        F.sum("__a").cast("long").alias("n_base"),
        F.sum("__b").cast("long").alias("n_curr"),
    )
    totals = counts.agg(
        F.sum("n_base").cast("long").alias("__ta"),
        F.sum("n_curr").cast("long").alias("__tb"),
    )
    dom = bins + 2
    p = (F.col("n_base") + 1).cast("double") / (F.col("__ta") + dom).cast("double")
    q = (F.col("n_curr") + 1).cast("double") / (F.col("__tb") + dom).cast("double")
    return counts.join(F.broadcast(totals)).select(
        "bucket",
        "n_base",
        "n_curr",
        nano((p - q) * F.log(p / q)).alias("psi_nanonats"),
    )


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Exact mutual information between two categorical columns — the
    dependence-strength scalar next to :func:`fd_audit` (which counts
    FD violations: direction-specific and blind to soft coupling) and
    the feature-selection signal before one-hot-encoding a dimension:
    MI ≈ 0 ⇒ the column pair is independent (drop one), MI near
    min(H_a, H_b) ⇒ near-determined.

    ``MI = Σ_xy p_xy · ln(p_xy·N² / (c_x·c_y·N))`` over exact BIGINT
    counts, with each term quantized to integer nano-nats before the
    exact sum (the E137 discipline) — engine-reproducible.  The
    marginal entropies ride along (same quantization), so normalized
    variants are one integer division away for the consumer.  NULLs
    pair like ordinary values (both engines group them).

    Returns ONE row: (n_rows, n_a, n_b, n_pairs, mi_nanonats,
    h_a_nanonats, h_b_nanonats).

    Scale shape: one map-side-combinable (a, b) groupBy; marginals are
    two more aggregates OVER THE PAIR TABLE (bounded by distinct pairs,
    never rescanning rows); totals ride 1-row broadcasts.
    """
    nano = lambda x: F.floor(x * F.lit(1e9) + F.lit(0.5)).cast("long")
    pairs = (
        spread(df)
        .groupBy(F.col(col_a).alias("__a"), F.col(col_b).alias("__b"))
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        .persist()
    )
    ca = pairs.groupBy("__a").agg(F.sum("__c").alias("__ca"))
    cb = pairs.groupBy("__b").agg(F.sum("__c").alias("__cb"))
    total = pairs.agg(
        F.sum("__c").cast("long").alias("__n"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    d = lambda c: F.col(c).cast("double")
    # null-safe joins: a NULL category is an ordinary value (the groupBys
    # above keep it as a group), so its marginal must attach — a plain
    # equi-join would silently drop NULL-keyed pairs from the MI sum
    joined = (
        pairs.join(
            F.broadcast(ca.withColumnsRenamed({"__a": "__a2"})),
            F.col("__a").eqNullSafe(F.col("__a2")),
        )
        .join(
            F.broadcast(cb.withColumnsRenamed({"__b": "__b2"})),
            F.col("__b").eqNullSafe(F.col("__b2")),
        )
        .join(F.broadcast(total))
    )
    mi = joined.agg(
        F.max("__n").alias("n_rows"),
        F.max("n_pairs").alias("n_pairs"),
        F.sum(
            nano(
                d("__c")
                / d("__n")
                * F.log(d("__c") * d("__n") / (d("__ca") * d("__cb")))
            )
        )
        .cast("long")
        .alias("mi_nanonats"),
    )
    ha = ca.join(F.broadcast(total)).agg(
        F.count(F.lit(1)).cast("long").alias("n_a"),
        (
            nano(F.log(F.max(d("__n"))))
            - F.expr(
                "sum(floor(__ca * ln(__ca) * 1e9 + 0.5)) div max(__n)"
            )
        )
        .cast("long")
        .alias("h_a_nanonats"),
    )
    hb = cb.join(F.broadcast(total)).agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        (
            nano(F.log(F.max(d("__n"))))
            - F.expr(
                "sum(floor(__cb * ln(__cb) * 1e9 + 0.5)) div max(__n)"
            )
        )
        .cast("long")
        .alias("h_b_nanonats"),
    )
    out = (
        mi.join(F.broadcast(ha))
        .join(F.broadcast(hb))
        .select(
            "n_rows", "n_a", "n_b", "n_pairs",
            "mi_nanonats", "h_a_nanonats", "h_b_nanonats",
        )
    )
    from ..caching import materialize_release

    return materialize_release(out, pairs)


def referential_audit(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    top_orphans: int = 10,
) -> DataFrame:
    """Foreign-key integrity audit between two tables: does every
    non-NULL ``child[child_key]`` resolve to a ``parent[parent_key]``
    row?  Output is one summary row (orphan_key = NULL) —
    (n_child_rows, n_orphan_rows, orphan_ppm, n_orphan_keys) — plus the
    ``top_orphans`` worst orphan keys by row count (ties break on the
    key) with their per-key counts, so the report both gates a pipeline
    (ppm threshold) and points at what to fix.

    Plan: distinct child keys LEFT ANTI the distinct parent keys — the
    two dedups are the only raw-volume stages, both map-side combined —
    then the orphan KEY set (small by hypothesis) broadcast-joins back
    to count rows.  NULL child keys are excluded (SQL FK semantics: a
    NULL reference is absent, not broken); count them via
    expectations_report if they matter."""
    if top_orphans < 0:
        raise ValueError("top_orphans must be >= 0")
    ck = F.col(child_key)
    rows = spread(child).where(ck.isNotNull()).select(
        ck.cast("string").alias("__k")
    )
    pk = parent.where(F.col(parent_key).isNotNull()).select(
        F.col(parent_key).cast("string").alias("__k")
    )
    orphan_keys = rows.dropDuplicates(["__k"]).join(
        pk.dropDuplicates(["__k"]), "__k", "left_anti"
    )
    per_key = (
        rows.join(F.broadcast(orphan_keys), "__k")
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    totals = rows.agg(
        F.count(F.lit(1)).alias("__n_child")
    ).crossJoin(
        per_key.agg(
            F.coalesce(F.sum("n_rows"), F.lit(0)).cast("long").alias("__n_orph"),
            F.count(F.lit(1)).alias("__n_keys"),
        )
    )
    summary = totals.select(
        F.lit(None).cast("string").alias("orphan_key"),
        F.col("__n_child").alias("n_child_rows"),
        F.col("__n_orph").alias("n_orphan_rows"),
        F.expr("__n_orph * 1000000L div __n_child").alias("orphan_ppm"),
        F.col("__n_keys").alias("n_orphan_keys"),
    )
    worst = (
        per_key.orderBy(F.desc("n_rows"), F.asc("__k"))
        .limit(int(top_orphans))
        .select(
            F.col("__k").alias("orphan_key"),
            F.lit(None).cast("long").alias("n_child_rows"),
            F.col("n_rows").alias("n_orphan_rows"),
            F.lit(None).cast("long").alias("orphan_ppm"),
            F.lit(None).cast("long").alias("n_orphan_keys"),
        )
    )
    return summary.unionByName(worst)


def share_shift(
    df: DataFrame,
    key_col: str,
    period_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Share-of-total per (key, period) with period-over-period shift —
    the mix-shift report behind "which source/segment is growing":
    (key, period, weight, share_ppm, prev_share_ppm, delta_ppm).

    ``weight_col`` None counts rows; otherwise sums an integer weight
    (pre-quantize money/floats first — micros, the E150 discipline).
    ``share_ppm`` is an integer floor division against the period total;
    ``prev_share_ppm`` is the key's share in its PREVIOUS OBSERVED
    period (a key absent from a period simply has no row — join a spine
    + fill zeros upstream if gap-as-zero semantics are wanted), null in
    the key's first period, and ``delta_ppm`` the difference.

    Plan: one partial-aggregated (key, period) rollup, a per-period
    total broadcast back, one lag window per key — two small shuffles
    over the aggregate, never raw volume."""
    from pyspark.sql import Window

    w = (
        F.sum(F.col(weight_col).cast("long"))
        if weight_col is not None
        else F.count(F.lit(1))
    )
    agg = (
        spread(df)
        .groupBy(
            F.col(key_col).alias("key"), F.col(period_col).alias("period")
        )
        .agg(w.cast("long").alias("weight"))
    )
    tot = agg.groupBy("period").agg(
        F.sum("weight").cast("long").alias("__t")
    )
    shared = agg.join(F.broadcast(tot), "period").select(
        "key",
        "period",
        "weight",
        F.expr("weight * 1000000L div __t").alias("share_ppm"),
    )
    lag = Window.partitionBy("key").orderBy("period")
    return shared.select(
        "key",
        "period",
        "weight",
        "share_ppm",
        F.lag("share_ppm").over(lag).alias("prev_share_ppm"),
        (F.col("share_ppm") - F.lag("share_ppm").over(lag)).alias(
            "delta_ppm"
        ),
    )


def gini_concentration(
    df: DataFrame,
    value_col: str,
    by: str | None = None,
) -> DataFrame:
    """Gini coefficient of a non-negative integer measure per group —
    the one-number concentration answer behind "is our corpus/revenue/
    token mass dominated by a few keys": (key, n, total,
    gini_ppm) with G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over
    ascending-sorted values, floored to integer ppm.

    Exact end to end: ranks are integers, the numerator/denominator are
    BIGINT products, the ppm is one integer floor division — and G is
    invariant to tie order (equal values contribute x·Σi whatever their
    rank order), so any deterministic sort works.  Zero-total groups
    report NULL.  Pre-quantize float measures to integers first — and
    mind the headroom: the widest intermediate is ~n·total·1e6, which
    must fit int64 (n·total < 9.2e12).  Scale the measure DOWN (dollars,
    not micros; kilotokens, not tokens) or Gini a stratum/sample —
    concentration is scale-free, so coarser units change nothing but
    the sub-ppm tail.

    Plan: one rank window + one aggregate per group (single shuffle on
    the group key; a global Gini (``by=None``) is a single-partition
    sort — bounded by the group's row count, use a keyed grouping or a
    sample for billion-row single groups)."""
    from pyspark.sql import Window

    key = F.col(by) if by is not None else F.lit("*")
    base = spread(df).select(
        key.alias("key"), F.col(value_col).cast("long").alias("__x")
    ).where(F.col("__x").isNotNull())
    w = Window.partitionBy("key").orderBy("__x")
    ranked = base.withColumn("__i", F.row_number().over(w))
    agg = ranked.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").cast("long").alias("total"),
        F.sum(F.col("__i") * F.col("__x")).cast("long").alias("__ix"),
    )
    return agg.select(
        "key",
        "n",
        "total",
        F.when(
            F.col("total") > 0,
            F.expr("(2 * __ix - (n + 1) * total) * 1000000L div (n * total)"),
        ).alias("gini_ppm"),
    )
