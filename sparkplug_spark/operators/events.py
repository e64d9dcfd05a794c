"""Event-log analytics: batch gap-sessionization and funnel analysis.

Batch :func:`sessionize` is the oracle-checkable twin of the streaming
``sessionize_stream`` operator (same gap semantics, no state store): one
window over (user, time) + one aggregation — two shuffles on the user key.
:func:`funnel_counts` is the ordered-sequence reach count (view → click →
purchase): K-1 equi-joins on the user key, one per step, each carrying
only (user, first-reach-time) pairs — no per-user event arrays are ever
collected, so power users with millions of events cost nothing extra.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..caching import materialize_release
from ..partitioning import spread

__all__ = [
    "sessionize",
    "funnel_counts",
    "retention_cohorts",
    "rate_anomalies",
    "user_activity_profile",
    "rolling_active_users",
    "rolling_active_users_kmv",
    "state_durations",
    "activity_heatmap",
    "rolling_window_features",
    "attribution_counts",
    "densify_time_series",
    "throttle_events",
    "rfm_scores",
    "cohort_ltv",
    "cusum_changepoints",
    "interpolate_series",
    "audience_overlap",
]


def _epoch_s(df: DataFrame, time_col: str):
    """Epoch-second BIGINT for a timestamp column, tolerant of
    TIMESTAMP_NTZ storage (raw parquet reads; Spark 4 refuses a direct
    NTZ→long cast).  NTZ values are interpreted in the session timezone —
    same contract as ``sources.read_events`` and the as-of join."""
    from pyspark.sql.types import TimestampNTZType

    col = F.col(time_col)
    if isinstance(df.schema[time_col].dataType, TimestampNTZType):
        col = col.cast("timestamp")
    return col.cast("long")


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessions: (user_id, session_idx, session_start,
    session_end, n_events).  A session breaks when consecutive events are
    more than ``gap_seconds`` apart (second-precision diff, truncating —
    identical in the SQL oracle).  ``session_idx`` numbers a user's
    sessions in time order, so output is fully deterministic."""
    # Tie-safety: equal timestamps make lag() order-dependent, but the
    # RESULT isn't — tied rows diff to 0 (never a break), and the
    # cumulative sum uses the default RANGE frame, which includes all
    # peers of the current timestamp, so tied rows always land in the
    # same session in both engines.
    df = df.withColumn("__ts_s", _epoch_s(df, time_col))
    w = Window.partitionBy(user_col).orderBy(F.col(time_col))
    prev = F.lag(F.col("__ts_s")).over(w)
    breaks = F.when(
        prev.isNull() | ((F.col("__ts_s") - prev) > gap_seconds),
        1,
    ).otherwise(0)
    # no spread(): the window's hash shuffle on the user key already
    # redistributes, and the pre-shuffle map work is trivial — a
    # round-robin repartition first would just be a second exchange
    with_idx = df.withColumn("__brk", breaks).withColumn(
        "session_idx", F.sum("__brk").over(w)  # default RANGE frame
    )
    return (
        with_idx.groupBy(user_col, "session_idx")
        .agg(
            F.min(time_col).alias("session_start"),
            F.max(time_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def funnel_counts(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    *,
    within_seconds: int | None = None,
    release: bool = True,
) -> DataFrame:
    """Ordered-funnel reach counts: for each step k, the number of users
    who performed steps 1..k IN ORDER (each step strictly after their
    first qualifying occurrence of the previous one).

    The frontier recursion runs as K chained running-min window
    expressions over ONE (user, time) partitioning: ``r_k(row) = min(t of
    rows ≤ row where e = step_k AND t > r_{k-1})``.  Because the running
    min of an eligible set equals the user's global first-reach time
    whenever it is non-null (the earliest eligible event is always in the
    prefix that contains any eligible event), each row's ``r_{k-1}``
    already IS the frontier value the k-th step must beat — no per-step
    self-joins.  Equal timestamps are tie-safe: the default RANGE frame
    includes all peers of the current timestamp and the comparison is
    strict, so a step-k event tied with the step-(k-1) reach never counts,
    deterministically, in any engine.

    Plan shape: ONE hash exchange on the user key + one sort feeds every
    window pass; the per-user flag aggregation reuses the same
    partitioning (no second exchange), and only the K-row count table
    crosses the final single-partition boundary.  Returns (step,
    step_idx, n_users).

    ``within_seconds`` switches to the TIMEOUT funnel: step k counts only
    when performed within ``within_seconds`` of SOME valid step-(k-1)
    event (validity chains recursively down to step 1).  The first-reach
    frontier is wrong here — a user whose earliest step-1 misses the
    window but whose later step-1 fits must still convert — so each pass
    instead carries the RUNNING MAX time of the previous step's valid
    events over the frame ``RANGE (unbounded, -1]`` (strictly-earlier
    seconds, so same-second events never chain, matching the strict
    ordering of the unwindowed mode), and validity is ``m >= t - w``.
    Same single user-key exchange; only the window expressions differ.

    ``release`` is accepted for API compatibility; the one-pass plan
    persists nothing, so there is nothing to release."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if within_seconds is not None and within_seconds < 1:
        raise ValueError("within_seconds must be >= 1")
    if within_seconds is not None:
        return _windowed_funnel(
            df, steps, user_col, time_col, type_col, int(within_seconds)
        )
    w = Window.partitionBy("u").orderBy("t")  # default RANGE frame: peers included
    # no spread(): the window's hash shuffle on the user key already
    # redistributes, and the pre-shuffle projection is trivial
    cur = df.select(
        F.col(user_col).alias("u"),
        F.col(time_col).alias("t"),
        F.col(type_col).alias("e"),
    )
    elig_cols: list[str] = []
    prev_reach = None
    for i, step in enumerate(steps, start=1):
        elig = F.col("e") == step
        if prev_reach is not None:
            # strictly after the previous step's first reach; null prev
            # (step k-1 never reached yet) disqualifies via null compare
            elig = elig & (F.col("t") > F.col(prev_reach))
        cur = cur.withColumn(f"__e{i}", elig)
        # chained selects: each window reads the previous window's output
        # column; same spec throughout, so no new exchange or sort
        cur = cur.withColumn(
            f"__r{i}", F.min(F.when(F.col(f"__e{i}"), F.col("t"))).over(w)
        )
        prev_reach = f"__r{i}"
        elig_cols.append(f"__e{i}")
    return _funnel_totals(cur, elig_cols, steps)


def _funnel_totals(
    cur: DataFrame, elig_cols: Sequence[str], steps: Sequence[str]
) -> DataFrame:
    """Shared funnel tail: per-user reached-step flags → per-step user
    counts → (step, step_idx, n_users) unpivot.  The groupBy key equals
    the window partitioning upstream, so Catalyst reuses the exchange."""
    per_user = cur.groupBy("u").agg(
        *[
            F.max(F.col(c).cast("int")).alias(f"s{i}")
            for i, c in enumerate(elig_cols, start=1)
        ]
    )
    # coalesce: an empty log must report 0 reached, not a NULL sum
    totals = per_user.agg(
        *[
            F.coalesce(F.sum(f"s{i}"), F.lit(0)).cast("long").alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    # unpivot via array-of-structs (no SQL-string interpolation, so step
    # names may contain any characters)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("step"),
                    F.lit(i).cast("int").alias("step_idx"),
                    F.col(f"n{i}").alias("n_users"),
                )
                for i, s in enumerate(steps, start=1)
            ]
        )
    ).alias("r")
    return totals.select(rows).select("r.step", "r.step_idx", "r.n_users")


def _windowed_funnel(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str,
    time_col: str,
    type_col: str,
    within_seconds: int,
) -> DataFrame:
    """Timeout-funnel body (see :func:`funnel_counts`): validity chains
    through a running max of the previous step's valid-event SECONDS over
    ``RANGE (unbounded, -1]`` — strictly-earlier seconds only — so step k
    is valid iff that max is within ``within_seconds``.  One user-key
    exchange feeds every pass, exactly like the unwindowed plan."""
    ts_s = _epoch_s(df, time_col)
    cur = df.select(
        F.col(user_col).alias("u"),
        ts_s.alias("t"),
        F.col(type_col).alias("e"),
    )
    w_prev = (
        Window.partitionBy("u")
        .orderBy("t")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    elig_cols: list[str] = []
    prev_valid = None
    for i, step in enumerate(steps, start=1):
        elig = F.col("e") == step
        if prev_valid is not None:
            m = F.max(F.when(F.col(prev_valid), F.col("t"))).over(w_prev)
            elig = elig & m.isNotNull() & (m >= F.col("t") - within_seconds)
        cur = cur.withColumn(f"__e{i}", elig)
        prev_valid = f"__e{i}"
        elig_cols.append(f"__e{i}")
    return _funnel_totals(cur, elig_cols, steps)


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    period_seconds: int = 7 * 86400,
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention triangle: users grouped by the period of their
    FIRST event, counted in every later period they return.

    Output: (cohort_period, period_offset, n_users) where
    ``cohort_period`` is the epoch-period index (``epoch_seconds //
    period_seconds`` — integer arithmetic, identical in any engine, no
    calendar-week ambiguity) and ``period_offset`` 0 is the cohort's own
    period.  ``max_offset`` truncates the triangle.

    Plan: per-user min period (one agg on the user key), broadcast-less
    re-join by the same key (AQE picks the strategy), then one distinct
    count per (cohort, offset) cell — shuffles carry only
    (user, period-int) pairs."""
    period = F.floor(_epoch_s(df, time_col) / F.lit(period_seconds)).cast(
        "long"
    )
    ev = df.select(F.col(user_col).alias("u"), period.alias("p"))
    first = ev.groupBy("u").agg(F.min("p").alias("cohort_period"))
    joined = ev.join(first, "u").select(
        "u",
        "cohort_period",
        (F.col("p") - F.col("cohort_period")).alias("period_offset"),
    )
    if max_offset is not None:
        joined = joined.filter(F.col("period_offset") <= max_offset)
    return (
        joined.groupBy("cohort_period", "period_offset")
        .agg(F.countDistinct("u").alias("n_users"))
    )


def rate_anomalies(
    df: DataFrame,
    type_col: str = "event_type",
    time_col: str = "ts",
    window_seconds: int = 3600,
    k: int = 3,
    include_empty: bool = False,
    seasonal_period_windows: int | None = None,
) -> DataFrame:
    """Tumbling-window event-rate outliers per type: (event_type,
    window_start, n_events, is_anomaly), flagging windows whose count is
    more than ``k`` standard deviations from that type's mean rate.

    The test is evaluated in EXACT integer arithmetic so the boolean is
    bit-identical in any engine: with per-type window-count moments
    ``n = #windows``, ``s = Σc``, ``ssq = Σc²``,

        |c − s/n| > k·σ   ⇔   (n·c − s)² > k²·(n·ssq − s²)

    (both sides BIGINT — no float mean/stddev whose summation order could
    flip a borderline flag).  By default empty windows are absent from the
    input and therefore from the baseline: the moments describe ACTIVE
    windows only — which biases the mean UP for bursty types.
    ``include_empty=True`` densifies first (:func:`densify_time_series`),
    so zero-count windows between a type's first and last event join the
    baseline AND can be flagged themselves (outage detection).

    ``seasonal_period_windows=p`` switches to a SEASONAL baseline: each
    window is compared only against windows at the same phase
    ``(window_start div window_seconds) mod p`` of its type — e.g.
    hourly windows with ``p=24`` test 3am against other 3ams, so a
    nightly batch spike stops drowning the daytime baseline (and a quiet
    3am no longer looks anomalous against the daily mean).  Output then
    carries the ``phase`` column.  Combine with ``include_empty`` so
    all-quiet phases keep honest moments.

    Plan shape: one map-side-combined aggregation reduces the raw log to
    the (type, window) count table — tiny even at 100 TB (types ×
    windows) — then an unbounded per-type (and per-phase, when seasonal)
    window computes the moments over that reduced table, never over raw
    events."""
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be > 0, got {window_seconds}")
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    if seasonal_period_windows is not None and seasonal_period_windows < 2:
        raise ValueError("seasonal_period_windows must be >= 2")
    if include_empty:
        counts = densify_time_series(
            df, key_col=type_col, time_col=time_col,
            bucket_seconds=window_seconds,
        ).select(
            F.col(type_col).alias("event_type"),
            F.col("bucket_start").alias("window_start"),
            "n_events",
        )
    else:
        wstart = (
            F.floor(_epoch_s(df, time_col) / F.lit(window_seconds))
            * F.lit(window_seconds)
        ).cast("long")
        counts = (
            df.select(
                F.col(type_col).alias("event_type"), wstart.alias("window_start")
            )
            .groupBy("event_type", "window_start")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
    out_cols = ["event_type", "window_start", "n_events"]
    if seasonal_period_windows is not None:
        p = int(seasonal_period_windows)
        counts = counts.withColumn(
            "phase",
            F.expr(f"(window_start div {int(window_seconds)}) % {p}").cast(
                "long"
            ),
        )
        w = Window.partitionBy("event_type", "phase")
        out_cols.append("phase")
    else:
        w = Window.partitionBy("event_type")
    n = F.count(F.lit(1)).over(w)
    s = F.sum("n_events").over(w)
    ssq = F.sum(F.col("n_events") * F.col("n_events")).over(w)
    c = F.col("n_events")
    lhs = (n * c - s) * (n * c - s)
    rhs = F.lit(int(k) * int(k)) * (n * ssq - s * s)
    return counts.select(
        *out_cols,
        (lhs > rhs).alias("is_anomaly"),
    )


def rolling_window_features(
    df: DataFrame,
    key_col: str = "event_type",
    time_col: str = "ts",
    value_col: str | None = "value",
    id_col: str = "event_id",
    window_seconds: int = 3600,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Trailing-window features per event — the time-series feature
    extraction pass an online-ML / anomaly pipeline consumes: for every
    event, the count and exact value sum of the same key's events in the
    trailing ``window_seconds`` (inclusive of the current second).

    Output: (id_col, key_col, ts_s, n_trailing[, value_micros_trailing])
    with ``ts_s`` epoch-second BIGINT and the value sum DECIMAL-summed and
    scaled to exact BIGINT micros, per the cross-engine output contract.

    Plan: ONE keyed window with an integer RANGE frame
    (``[ts_s - window_seconds, ts_s]``) — a single hash exchange on the
    key plus a per-key ordered pass; no self-join against the trailing
    window, no per-row explode.  The RANGE frame includes all peers of a
    timestamp, so tied events see identical frames in any engine.

    **Low-cardinality keys** (a handful of event types over years of log)
    would funnel each key through one window partition.  Pass
    ``bucket_seconds`` (>= ``window_seconds``; e.g. a day) to re-key the
    window on (key, time-bucket): each row is additionally copied into the
    NEXT bucket when its trailing window spills across the boundary, the
    copies contribute to frames but are dropped from output, and results
    are IDENTICAL to the global form (pytest-pinned) — parallelism becomes
    keys × active buckets instead of keys.  Overhead: ≤
    ``window_seconds/bucket_seconds`` of rows duplicated.  Requires
    non-negative epochs (integer ``div`` bucketing)."""
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be > 0, got {window_seconds}")
    if bucket_seconds is not None and bucket_seconds < window_seconds:
        raise ValueError(
            "bucket_seconds must be >= window_seconds "
            f"(got {bucket_seconds} < {window_seconds})"
        )
    ts_s = _epoch_s(df, time_col)
    ev = df.select(
        F.col(id_col).alias(id_col),
        F.col(key_col).alias(key_col),
        ts_s.alias("ts_s"),
        *(
            [
                (F.col(value_col).cast("decimal(28,6)") * F.lit(1000000))
                .cast("long")
                .alias("__vmicros")
            ]
            if value_col is not None
            else []
        ),
    )
    if bucket_seconds is None:
        w = (
            Window.partitionBy(key_col)
            .orderBy("ts_s")
            .rangeBetween(-int(window_seconds), Window.currentRow)
        )
        out = ev
    else:
        b = int(bucket_seconds)
        bucket = F.expr(f"ts_s div {b}")
        # ghost copy into the next bucket iff this row's trailing window
        # can reach a target there: ts_s >= (bucket+1)*b - window_seconds
        copies = F.filter(
            F.array(
                F.struct(bucket.alias("bk"), F.lit(False).alias("g")),
                F.struct((bucket + 1).alias("bk"), F.lit(True).alias("g")),
            ),
            lambda s: (~s["g"])
            | (F.col("ts_s") + F.lit(int(window_seconds)) >= s["bk"] * b),
        )
        ev = ev.withColumn("__c", F.explode(copies)).select(
            "*", F.col("__c.bk").alias("__bk"), F.col("__c.g").alias("__g")
        ).drop("__c")
        w = (
            Window.partitionBy(key_col, "__bk")
            .orderBy("ts_s")
            .rangeBetween(-int(window_seconds), Window.currentRow)
        )
        out = ev
    out = out.withColumn("n_trailing", F.count(F.lit(1)).over(w))
    cols = [id_col, key_col, "ts_s", "n_trailing"]
    if value_col is not None:
        out = out.withColumn(
            "value_micros_trailing", F.sum("__vmicros").over(w)
        )
        cols.append("value_micros_trailing")
    if bucket_seconds is not None:
        out = out.filter(~F.col("__g"))
    return out.select(*cols)


def attribution_counts(
    df: DataFrame,
    conversion: str,
    touch_types: Sequence[str],
    model: str = "last",
    user_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    half_life_seconds: int = 86400,
) -> DataFrame:
    """Single-touch conversion attribution: credit each converting user's
    FIRST conversion event to one touch event strictly before it
    (``model='last'`` = last-touch, ``'first'`` = first-touch), then count
    conversions per touch type.

    Determinism contract: "strictly before" compares epoch SECONDS (a
    touch in the conversion's same second never gets credit), and touches
    tied at the same second break on the event id (max id for last-touch,
    min for first-touch) — both engines rank identically.  Users whose
    first conversion has no prior touch are reported under touch_type
    ``'(none)'`` so credited counts always sum to converting users.

    ``model='linear'`` splits each conversion's credit EQUALLY across all
    prior touches in exact integer ppm (each of a user's k touches gets
    ``1_000_000 div k``; the division remainder goes to the (tie-broken)
    LAST touch so per-user credit always sums to exactly 1_000_000).
    Output then is (touch_type, credit_ppm) — BIGINT, engine-exact.

    ``model='decay'`` weights each touch by its age at conversion with a
    half-life, ENTIRELY in integers: raw weight ``w = 1_000_000 >>
    min(age div half_life_seconds, 30)`` (halving per elapsed half-life,
    quantized to whole half-lives — the determinism trade that avoids
    cross-engine ``pow()`` floats), per-user credit ``w·1_000_000 div
    Σw`` with the remainder to the tie-broken last touch.  When every
    weight underflows to 0 (all touches older than 30 half-lives) the
    last touch takes the full credit.  Output (touch_type, credit_ppm).

    Output: (touch_type, n_conversions), one row per touch type that
    received credit (plus the ``'(none)'`` row when applicable); linear
    model returns (touch_type, credit_ppm).

    Plan: conversions reduce to one (user, first-conversion-second) row
    via a map-side-combined agg; touches join on the user key and the
    per-user argmax runs as a window over the SAME key partitioning (AQE
    exchange reuse) — shuffles carry (user, second, id, type) tuples
    only, never the raw log's payload columns."""
    if model not in ("last", "first", "linear", "decay"):
        raise ValueError("model must be 'last', 'first', 'linear' or 'decay'")
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    if model == "decay" and half_life_seconds < 1:
        raise ValueError("half_life_seconds must be >= 1")
    ts_s = _epoch_s(df, time_col)
    conv = (
        df.filter(F.col(type_col) == conversion)
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(ts_s).alias("tc"))
    )
    touches = df.filter(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("u"),
        ts_s.alias("tt"),
        F.col(id_col).alias("tid"),
        F.col(type_col).alias("touch_type"),
    )
    cand = touches.join(conv, "u").filter(F.col("tt") < F.col("tc"))
    if model == "decay":
        # rn=1 is the tie-broken LAST touch: remainder (or, on total
        # weight underflow, the whole 1e6) lands there
        w = Window.partitionBy("u").orderBy(F.desc("tt"), F.desc("tid"))
        hl = int(half_life_seconds)
        weight = F.expr(
            f"1000000 div shiftleft(1L,"
            f" cast(least((tc - tt) div {hl}, 30) as int))"
        )
        wsum = F.sum("__w").over(Window.partitionBy("u"))
        share = F.expr("__w * 1000000 div nullif(__wsum, 0)")
        credited = (
            cand.withColumn("__rn", F.row_number().over(w))
            .withColumn("__w", weight)
            .withColumn("__wsum", wsum)
            .withColumn("__share", F.coalesce(share, F.lit(0)))
            .withColumn("__sharesum", F.sum("__share").over(Window.partitionBy("u")))
            .withColumn(
                "credit_ppm",
                F.when(
                    F.col("__rn") == 1,
                    F.col("__share") + F.lit(1000000) - F.col("__sharesum"),
                ).otherwise(F.col("__share")).cast("long"),
            )
            .select("u", "touch_type", "credit_ppm")
        )
        uncredited = conv.join(credited, "u", "left_anti").select(
            "u",
            F.lit("(none)").alias("touch_type"),
            F.lit(1000000).cast("long").alias("credit_ppm"),
        )
        return (
            credited.unionByName(uncredited)
            .groupBy("touch_type")
            .agg(F.sum("credit_ppm").cast("long").alias("credit_ppm"))
        )
    if model == "linear":
        # rn=1 is the tie-broken LAST touch: it takes the ppm remainder
        w = Window.partitionBy("u").orderBy(F.desc("tt"), F.desc("tid"))
        k = F.count(F.lit(1)).over(Window.partitionBy("u"))
        share = F.expr("1000000 div __k")
        credited = (
            cand.withColumn("__rn", F.row_number().over(w))
            .withColumn("__k", k)
            .withColumn(
                "credit_ppm",
                F.when(
                    F.col("__rn") == 1,
                    share + F.lit(1000000) - share * F.col("__k"),
                ).otherwise(share).cast("long"),
            )
            .select("u", "touch_type", "credit_ppm")
        )
        uncredited = conv.join(credited, "u", "left_anti").select(
            "u",
            F.lit("(none)").alias("touch_type"),
            F.lit(1000000).cast("long").alias("credit_ppm"),
        )
        return (
            credited.unionByName(uncredited)
            .groupBy("touch_type")
            .agg(F.sum("credit_ppm").cast("long").alias("credit_ppm"))
        )
    order = (
        [F.desc("tt"), F.desc("tid")]
        if model == "last"
        else [F.asc("tt"), F.asc("tid")]
    )
    w = Window.partitionBy("u").orderBy(*order)
    credited = (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("u", "touch_type")
    )
    # converting users with no prior touch: anti-join, credited to '(none)'
    uncredited = conv.join(credited, "u", "left_anti").select(
        "u", F.lit("(none)").alias("touch_type")
    )
    return (
        credited.unionByName(uncredited)
        .groupBy("touch_type")
        .agg(F.count(F.lit(1)).alias("n_conversions"))
    )


def densify_time_series(
    df: DataFrame,
    key_col: str | None = "event_type",
    time_col: str = "ts",
    bucket_seconds: int = 3600,
    release: bool = True,
) -> DataFrame:
    """Tumbling-bucket counts INCLUDING empty buckets — the gap-filled
    series a dashboard/anomaly consumer needs (a plain GROUP BY silently
    drops zero-activity buckets; rate math over it is biased).

    Output: (key_col, bucket_start, n_events) for EVERY bucket between
    the key's first and last event (``key_col=None`` = one global
    series over the corpus min/max).  ``bucket_start`` is epoch-second
    BIGINT; all arithmetic integer.

    Plan: one map-side-combined agg reduces the log to (key, bucket)
    counts — persisted, since BOTH the spine (its per-key min/max) and the
    join read it; without the persist each consumer re-scans the raw log.
    The spine is a native ``sequence()`` explode over each key's 1-row
    (min, max) — spine size = buckets, never raw rows — left-joined back
    to the counts.  No recursion, no driver loop.

    ``release=True`` (default) eagerly materializes the (tiny) result and
    drops the counts cache, per the operator cache-lifecycle contract."""
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be > 0, got {bucket_seconds}")
    keys = [key_col] if key_col else []
    bucket = (
        F.floor(_epoch_s(df, time_col) / F.lit(bucket_seconds))
        * F.lit(bucket_seconds)
    ).cast("long")
    counts = (
        df.select(*keys, bucket.alias("bucket_start"))
        .groupBy(*keys, "bucket_start")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    if release:
        counts = counts.persist()
    spine = (
        counts.groupBy(*keys)
        .agg(F.min("bucket_start").alias("__lo"), F.max("bucket_start").alias("__hi"))
        .select(
            *keys,
            F.explode(
                F.sequence("__lo", "__hi", F.lit(int(bucket_seconds)))
            ).alias("bucket_start"),
        )
    )
    out = spine.join(counts, [*keys, "bucket_start"], "left").select(
        *keys,
        "bucket_start",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
    )
    return materialize_release(out, counts, release=release)


def throttle_events(
    df: DataFrame,
    by: Sequence[str] = ("user_id", "event_type"),
    time_col: str = "ts",
    gap_seconds: int = 60,
    id_col: str = "event_id",
) -> DataFrame:
    """Burst collapse — one event per burst CHAIN: within each ``by``
    group, consecutive events ≤ ``gap_seconds`` apart belong to the same
    burst (the :func:`sessionize` recursion with a small gap), and only
    each burst's first event survives.  Retry storms, double-clicks, and
    sensor chatter collapse to their first occurrence; note chain
    semantics — a long run of closely-spaced events is ONE burst however
    long it lasts, exactly like a session.

    Deterministic: the kept row is min(time) with ties broken on
    ``id_col``, and tied timestamps always share a burst (diff 0 never
    breaks), so output is engine/run/partitioning-independent.

    One shuffle on the ``by`` keys (both windows share the partitioning);
    returns the kept rows with all input columns."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be > 0, got {gap_seconds}")
    by = list(by)
    out = df.withColumn("__ts_s", _epoch_s(df, time_col))
    w = Window.partitionBy(*by).orderBy("__ts_s")  # RANGE: peers share frames
    prev = F.lag("__ts_s").over(
        Window.partitionBy(*by).orderBy("__ts_s", F.col(id_col))
    )
    brk = F.when(
        prev.isNull() | ((F.col("__ts_s") - prev) > gap_seconds), 1
    ).otherwise(0)
    # cumulative sum over the default RANGE frame: tied rows land in the
    # same burst whatever order the lag() saw them in, because their
    # diffs are 0 (never a break) and RANGE includes all peers
    burst = F.sum(brk).over(w)
    wb = Window.partitionBy(*by, "__burst").orderBy("__ts_s", F.col(id_col))
    return (
        out.withColumn("__brk", brk)
        .withColumn("__burst", burst)
        .withColumn("__rn", F.row_number().over(wb))
        .filter(F.col("__rn") == 1)
        .drop("__ts_s", "__brk", "__burst", "__rn")
    )


def user_activity_profile(
    df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    value_col: str | None = None,
    exact_distinct: bool = False,
    day_seconds: int = 86400,
) -> DataFrame:
    """Per-entity activity profile — the feature-extraction pass of an
    event log: (user_id, n_events, n_event_types, n_active_days,
    first_seen, last_seen[, value_micros]).

    ``first_seen``/``last_seen`` are epoch-second BIGINTs (never raw
    timestamps: sub-second storage precision differs across engines) and
    ``value_micros`` is the DECIMAL-summed value scaled to an exact
    BIGINT, per the cross-engine output-type contract.

    ``exact_distinct=False`` (default) profiles with HyperLogL++
    sketches: two exact distincts over different columns would expand
    every input row once per distinct aggregate at 100 TB.  The exact
    knob exists for oracle-grade consumers."""
    nd = F.countDistinct if exact_distinct else F.approx_count_distinct
    ts_s = _epoch_s(df, time_col)
    day = F.floor(ts_s / F.lit(day_seconds)).cast("long")
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        nd(F.col(type_col)).alias("n_event_types"),
        nd(day).alias("n_active_days"),
        F.min(ts_s).alias("first_seen"),
        F.max(ts_s).alias("last_seen"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(
                (F.col(value_col).cast("decimal(28,6)") * F.lit(1000000)).cast("long")
            ).alias("value_micros")
        )
    return spread(df).groupBy(F.col(user_col).alias("user_id")).agg(*aggs)


def rfm_scores(
    df: DataFrame,
    asof: str,
    user_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    n_tiles: int = 5,
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer scoring: one row per
    user with the three raw metrics as exact integers and each scored
    1..``n_tiles`` by exact global quantile rank (5 = best under the
    default 5 tiles):

    - ``recency_s`` BIGINT — seconds from the user's last event to
      ``asof`` (an ISO timestamp literal; passing it explicitly keeps the
      result reproducible — "now" is not a deterministic input)
    - ``frequency`` BIGINT — event count
    - ``monetary_micros`` BIGINT — Σ value in exact micros
      (``DECIMAL(28,6)`` path, engine-lossless)
    - ``r_score``/``f_score``/``m_score`` INT, ``segment`` VARCHAR (e.g.
      ``'5-4-5'``)

    Tiles follow SQL-standard ``ntile`` semantics exactly (first ``N mod
    n`` tiles take the extra rows) but are computed from
    :func:`~..partitioning.global_row_numbers` — the range-distributed
    exact rank — NOT a single-partition ``ntile()`` window, so the scoring
    holds at any user count.  Tie-breaks: every ordering ends on the user
    id, so both engines rank identically.

    Plan: one map-side-combined per-user aggregate, then three
    range-partitioned rank passes over the USER table (users ≪ events);
    each pass pins its sort with the caching contract and releases it."""
    from ..partitioning import global_row_numbers

    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    ts_s = _epoch_s(df, time_col)
    asof_s = F.unix_timestamp(F.lit(asof).cast("timestamp"))
    per = df.groupBy(F.col(user_col).alias("user")).agg(
        (F.max(asof_s) - F.max(ts_s)).cast("long").alias("recency_s"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(
            (F.col(value_col).cast("decimal(28,6)") * F.lit(1000000)).cast(
                "long"
            )
        )
        .cast("long")
        .alias("monetary_micros"),
    )

    def tile_of(rn: str, n_total: str) -> F.Column:
        # SQL-standard ntile from an exact rank: q = N div n, r = N mod n;
        # the first r tiles hold q+1 rows
        n = F.lit(int(n_tiles))
        q = F.expr(f"{n_total} div {int(n_tiles)}")
        r = F.col(n_total) % n
        boundary = r * (q + 1)
        return (
            F.when(q == 0, F.col(rn))
            .when(
                F.col(rn) <= boundary,
                (F.col(rn) - 1) / (q + 1) + 1,
            )
            .otherwise(r + (F.col(rn) - boundary - 1) / q + 1)
        )

    out = per
    specs = [
        # (metric asc-order column, rank name, score name, invert?)
        (["recency_s", "user"], "__rn_r", "r_score", True),
        (["frequency", "user"], "__rn_f", "f_score", False),
        (["monetary_micros", "user"], "__rn_m", "m_score", False),
    ]
    # each rank pass localCheckpoints its output; once pass N+1 has
    # materialized, pass N's blocks are dead weight — free them (the
    # caching invariant: never leak intermediate checkpoint generations;
    # the LAST pass's blocks back the returned DataFrame and stay)
    from ..caching import _persistent_ids, unpersist_ids

    spark = df.sparkSession
    prev_ids: set[int] = set()
    for order, rn, _, _ in specs:
        before = _persistent_ids(spark)
        out = global_row_numbers(out, order, rn_col=rn)
        new_ids = _persistent_ids(spark) - before
        unpersist_ids(spark, prev_ids)
        prev_ids = new_ids
    n_total = out.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    out = out.crossJoin(F.broadcast(n_total))
    for _, rn, score, invert in specs:
        tile = F.floor(tile_of(rn, "__N")).cast("int")
        out = out.withColumn(
            score,
            (F.lit(int(n_tiles)) + 1 - tile) if invert else tile,
        )
    return out.select(
        "user",
        "recency_s",
        "frequency",
        "monetary_micros",
        "r_score",
        "f_score",
        "m_score",
        F.concat_ws(
            "-", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ).alias("segment"),
    )


def cohort_ltv(
    df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    period_seconds: int = 7 * 86400,
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort lifetime-value curves: revenue per (acquisition cohort,
    period offset), cumulative, and per-acquired-user — the monetary
    companion of :func:`retention_cohorts` (same epoch-period integer
    cohorting, no calendar ambiguity).

    Output, one row per observed (cohort_period, period_offset):

    - ``revenue_micros`` BIGINT — Σ value that cohort spent in that
      period (exact DECIMAL(28,6)→micros path)
    - ``cum_revenue_micros`` BIGINT — running total over the cohort's
      offsets so far
    - ``n_users`` BIGINT — cohort size (users acquired in the cohort
      period; constant per cohort)
    - ``cum_ltv_per_user_micros`` BIGINT — ``cum_revenue div n_users``:
      the LTV curve value marketers chart

    Plan: per-user first period (one user-key agg), re-join on the same
    key, map-side-combined (cohort, offset) revenue cells, then the
    cumulative window runs over the CELL table (cohorts × offsets rows —
    tiny at any scale); cohort sizes ride a broadcast join."""
    period = F.floor(_epoch_s(df, time_col) / F.lit(period_seconds)).cast(
        "long"
    )
    micros = (F.col(value_col).cast("decimal(28,6)") * F.lit(1000000)).cast(
        "long"
    )
    ev = df.select(
        F.col(user_col).alias("u"), period.alias("p"), micros.alias("m")
    )
    first = ev.groupBy("u").agg(F.min("p").alias("cohort_period"))
    joined = ev.join(first, "u").select(
        "u",
        "cohort_period",
        (F.col("p") - F.col("cohort_period")).alias("period_offset"),
        "m",
    )
    if max_offset is not None:
        joined = joined.filter(F.col("period_offset") <= max_offset)
    cells = joined.groupBy("cohort_period", "period_offset").agg(
        F.sum("m").cast("long").alias("revenue_micros")
    )
    sizes = first.groupBy("cohort_period").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    wc = (
        Window.partitionBy("cohort_period")
        .orderBy("period_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.withColumn(
            "cum_revenue_micros",
            F.sum("revenue_micros").over(wc).cast("long"),
        )
        .join(F.broadcast(sizes), "cohort_period")
        .select(
            "cohort_period",
            "period_offset",
            "revenue_micros",
            "cum_revenue_micros",
            "n_users",
            F.expr("cum_revenue_micros div n_users")
            .cast("long")
            .alias("cum_ltv_per_user_micros"),
        )
    )


def cusum_changepoints(
    df: DataFrame,
    type_col: str = "event_type",
    time_col: str = "ts",
    window_seconds: int = 3600,
    slack: int = 0,
    threshold: int = 20,
) -> DataFrame:
    """One-sided integer CUSUM over per-type windowed counts: detects
    SUSTAINED level shifts that per-window z-tests miss (ten windows each
    1σ high never trip :func:`rate_anomalies`; their accumulated drift
    trips CUSUM).  Page's classic statistic, all integers:

        S_t = max(0, S_{t-1} + (c_t − μ − slack)),   flag when S_t > threshold

    with ``μ = Σc div n`` (the type's truncating integer mean over the
    DENSIFIED series — empty windows count, else an outage would reset
    the statistic invisibly) and ``slack`` the per-window drift allowance
    (κ).  Everything is BIGINT arithmetic, so the statistic and flags are
    engine-exact (a recursive SQL CTE reproduces them bit-for-bit).

    Output: (event_type, window_start, n_events, cusum BIGINT, is_shift
    BOOLEAN).

    Plan: the raw log reduces to the (type, window) cell table (one
    map-side-combined agg + the densify spine); the inherently sequential
    recurrence then runs per type in ``applyInPandas`` over that CELL
    series — thousands of rows per type regardless of raw volume, so the
    python loop costs microseconds while everything data-sized stays
    JVM-side."""
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be > 0, got {window_seconds}")
    if threshold <= 0:
        raise ValueError(f"threshold must be > 0, got {threshold}")
    if slack < 0:
        raise ValueError(f"slack must be >= 0, got {slack}")
    counts = densify_time_series(
        df, key_col=type_col, time_col=time_col, bucket_seconds=window_seconds
    ).select(
        F.col(type_col).alias("event_type"),
        F.col("bucket_start").alias("window_start"),
        "n_events",
    )
    wk = Window.partitionBy("event_type")
    with_mu = (
        counts.withColumn("__s", F.sum("n_events").over(wk))
        .withColumn("__n", F.count(F.lit(1)).over(wk))
        .withColumn("__mu", F.expr("__s div __n").cast("long"))
        .drop("__s", "__n")
    )
    kappa, h = int(slack), int(threshold)

    def _cusum(pdf):
        import pandas as pd

        pdf = pdf.sort_values("window_start").reset_index(drop=True)
        s, out = 0, []
        mu_v = int(pdf["__mu"].iloc[0]) if len(pdf) else 0
        for c in pdf["n_events"]:
            s = max(0, s + int(c) - mu_v - kappa)
            out.append(s)
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"],
                "window_start": pdf["window_start"],
                "n_events": pdf["n_events"],
                "cusum": pd.Series(out, dtype="int64"),
                "is_shift": [v > h for v in out],
            }
        )

    return with_mu.groupBy("event_type").applyInPandas(
        _cusum,
        schema=(
            "event_type string, window_start long, n_events long,"
            " cusum long, is_shift boolean"
        ),
    )


def interpolate_series(
    df: DataFrame,
    key_col: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
    grid_seconds: int = 3600,
) -> DataFrame:
    """Linear interpolation of an irregular (key, time, value) series
    onto a regular grid — the gap-filling tier ABOVE
    :func:`densify_time_series` (which zero-fills COUNTS; a sampled
    measurement series needs values estimated between observations, not
    zeros).  Output grid points carry ``src='obs'`` where a measurement
    landed in that grid second and ``src='interp'`` where the value is
    the exact linear blend of the bracketing observations; grid points
    before a key's first or after its last observation are not emitted
    (extrapolation is a policy, not math).

    Engine-exactness: values are quantized ONCE to integer micros; the
    blend ``v_prev + (v_next − v_prev)·(t − t_prev) fdiv (t_next −
    t_prev)`` uses an explicitly spelled-out FLOOR division (both
    engines' integer division truncates toward zero, which would bias
    downward-sloping segments toward the higher neighbor; the identical
    CASE correction runs on both sides).  Multiple observations in
    one grid second deterministically collapse to the latest (ties →
    larger value).  Overflow bound: |Δv_micros|·Δt_s must stay < 2⁶³
    (ample: a 1e6-unit swing over a year is ~4e19… rescale such domains
    to millis first — documented, not silently truncated).

    Scale shape: one map-side-combined (key, grid-second) pre-aggregate;
    the spine is a native ``sequence()`` explode over each key's 1-row
    (min, max); two per-key ordered windows (last/next observation
    carry-forward) — partitions by key, never a global window.
    """
    if grid_seconds <= 0:
        raise ValueError(f"grid_seconds must be > 0, got {grid_seconds}")
    sec = (
        F.floor(_epoch_s(df, time_col) / F.lit(grid_seconds))
        * F.lit(grid_seconds)
    ).cast("long")
    v_micros = F.floor(F.col(value_col) * F.lit(1e6) + F.lit(0.5)).cast("long")
    # one observation per (key, grid second): latest wins, ties to larger v
    obs = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            sec.alias("t"),
            F.struct(
                _epoch_s(df, time_col).alias("ts"), v_micros.alias("v")
            ).alias("__pick"),
        )
        .groupBy("key", "t")
        .agg(F.max("__pick").getField("v").alias("v"))
    )
    spine = (
        obs.groupBy("key")
        .agg(F.min("t").alias("__lo"), F.max("t").alias("__hi"))
        .select(
            "key",
            F.explode(
                F.sequence("__lo", "__hi", F.lit(int(grid_seconds)))
            ).alias("t"),
        )
    )
    merged = spine.join(obs, ["key", "t"], "left")
    w_fwd = Window.partitionBy("key").orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_bwd = Window.partitionBy("key").orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    filled = (
        merged.withColumn("pv", F.last("v", ignorenulls=True).over(w_fwd))
        .withColumn(
            "pt",
            F.last(F.when(F.col("v").isNotNull(), F.col("t")), True).over(w_fwd),
        )
        .withColumn("nv", F.last("v", ignorenulls=True).over(w_bwd))
        .withColumn(
            "nt",
            F.last(F.when(F.col("v").isNotNull(), F.col("t")), True).over(w_bwd),
        )
    )
    # floor division valid for negative numerators in BOTH engines
    num = (F.col("nv") - F.col("pv")) * (F.col("t") - F.col("pt"))
    den = F.col("nt") - F.col("pt")
    fdiv = F.expr(
        "(num div den) - (CASE WHEN num % den != 0 AND num < 0 THEN 1 ELSE 0 END)"
    )
    return (
        filled.withColumn("num", num)
        .withColumn("den", den)
        .filter(F.col("pv").isNotNull() & F.col("nv").isNotNull())
        .select(
            F.col("key").alias(key_col),
            F.col("t").alias("grid_start"),
            F.when(F.col("v").isNotNull(), F.col("v"))
            .when(F.col("den") == 0, F.col("pv"))
            .otherwise(F.col("pv") + fdiv)
            .alias("value_micros"),
            F.when(F.col("v").isNotNull(), F.lit("obs"))
            .otherwise(F.lit("interp"))
            .alias("src"),
        )
    )


def audience_overlap(
    df: DataFrame,
    key_col: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """Pairwise audience overlap between event types (or campaigns,
    features, surfaces…): for every key pair, the EXACT number of users
    seen in both, each side's audience size, and Jaccard in integer ppm
    — the cannibalization/adjacency map a growth team reads before
    bundling features (the user-set sibling of E74's doc-content
    cross-source matrix).

    Returns (key_a, key_b, users_a, users_b, users_both, jaccard_ppm)
    with key_a < key_b.

    Scale shape: the corpus reduces to ONE distinct (user, key) table
    (map-side combined) that everything derives from; the pair
    intersection is a self-equi-join ON USER over that table (each user
    contributes deg²/2 pairs, bounded by the number of keys — safe
    while keys are dozens, the intended use); audience sizes ride a
    broadcast.  Never shuffles raw events twice.
    """
    from ..partitioning import spread

    uk = (
        spread(df)
        .select(F.col(user_col).alias("u"), F.col(key_col).alias("k"))
        .filter(F.col("u").isNotNull() & F.col("k").isNotNull())
        .distinct()
        .persist()
    )
    sizes = uk.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n"))
    pairs = (
        uk.alias("a")
        .join(uk.alias("b"), "u")
        .filter(F.col("a.k") < F.col("b.k"))
        .groupBy(F.col("a.k").alias("key_a"), F.col("b.k").alias("key_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("users_both"))
    )
    out = (
        pairs.join(
            F.broadcast(sizes.withColumnsRenamed({"k": "key_a", "n": "users_a"})),
            "key_a",
        )
        .join(
            F.broadcast(sizes.withColumnsRenamed({"k": "key_b", "n": "users_b"})),
            "key_b",
        )
        .select(
            "key_a",
            "key_b",
            "users_a",
            "users_b",
            "users_both",
            F.expr(
                "users_both * 1000000 div (users_a + users_b - users_both)"
            ).alias("jaccard_ppm"),
        )
    )
    from ..caching import materialize_release

    return materialize_release(out, uk)


def rolling_active_users(
    df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    windows: Sequence[int] = (1, 7, 28),
    day_seconds: int = 86400,
) -> DataFrame:
    """EXACT rolling active-user counts — the DAU/WAU/MAU board: one row
    per active day with ``active_{w}d`` = distinct users seen in the
    ``w`` days ending that day, for each window in ``windows``.

    Plan: the raw log collapses once to DISTINCT (day, user) pairs —
    the only stage that sees raw volume, a map-side-combined dedup —
    then each pair EXPLODES into the ≤ ``max(windows)`` future days it
    keeps a user active for (pair volume × w, never raw volume × w) and
    a count-distinct per (window, day) finishes.  Days with no events
    contribute no row (join the result to a calendar spine to densify —
    ``dense_series`` exists for that).  Exact by construction; rolling
    distincts do NOT merge across days (distinct users aren't additive),
    which is exactly why the pair explode — or a mergeable sketch like
    :func:`~.sketches.kmv_sketch` for the approximate tier — is needed.
    """
    if not windows or any(w < 1 for w in windows):
        raise ValueError("windows must be non-empty positive day counts")
    day = F.floor(_epoch_s(df, time_col) / F.lit(int(day_seconds))).cast(
        "long"
    )
    from ..caching import materialize_release

    pairs = (
        spread(df)
        .select(day.alias("__d"), F.col(user_col).alias("__u"))
        .where(F.col("__u").isNotNull())
        .dropDuplicates(["__d", "__u"])
        # one branch per requested window + the spine consume the pair
        # table: persist so the raw-volume dedup shuffle runs ONCE, not
        # once per consumer (released on return)
        .persist()
    )
    spine = pairs.select(F.col("__d").alias("day_idx")).distinct()
    out = spine
    for w in windows:
        contrib = pairs.select(
            F.explode(
                F.sequence(F.col("__d"), F.col("__d") + F.lit(int(w) - 1))
            ).alias("day_idx"),
            "__u",
        )
        counts = (
            contrib.join(spine, "day_idx")
            .groupBy("day_idx")
            .agg(F.countDistinct("__u").alias(f"active_{int(w)}d"))
        )
        out = out.join(counts, "day_idx")
    return materialize_release(out, pairs)


def rolling_active_users_kmv(
    df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    windows: Sequence[int] = (1, 7, 28),
    k: int = 256,
    day_seconds: int = 86400,
) -> DataFrame:
    """Approximate tier of :func:`rolling_active_users`: per-day KMV
    sketches of the user set, rolled up per trailing window by sketch
    MERGE — ``active_{w}d_est`` per active day.

    Why it exists: the exact tier explodes (day, user) pairs × w; at
    billions of actives that inflation is the cost.  Here raw volume
    collapses once into ≤ k hashes PER DAY, and every window rollup
    merges those ≤ k·w hashes — the sketch-store pattern
    (:func:`~.sketches.kmv_merge` is exactly bottom-k of the union, so
    merging day sketches equals sketching the window's distinct users).
    Deterministic md5 hashing end to end: unlike an HLL tier the
    estimates value-hash-match an oracle."""
    from .sketches import kmv_distinct, kmv_merge, kmv_sketch

    if not windows or any(w < 1 for w in windows):
        raise ValueError("windows must be non-empty positive day counts")
    day = F.floor(_epoch_s(df, time_col) / F.lit(int(day_seconds))).cast(
        "long"
    )
    pairs = (
        spread(df)
        .select(day.alias("__d"), F.col(user_col).alias("__u"))
        .where(F.col("__u").isNotNull())
    )
    from ..caching import materialize_release

    # the per-day sketch feeds one merge branch per window + the spine:
    # persist the <= k-rows-per-day table so the raw-volume sketch build
    # runs once (released on return)
    sketch = kmv_sketch(pairs, key="__u", by=("__d",), k=k).persist()
    spine = sketch.select(F.col("__d").alias("day_idx")).distinct()
    out = spine
    for w in windows:
        contrib = sketch.select(
            F.explode(
                F.sequence(F.col("__d"), F.col("__d") + F.lit(int(w) - 1))
            ).alias("day_idx"),
            "kmv_hash",
        )
        est = kmv_distinct(
            kmv_merge(contrib.join(spine, "day_idx"), by=("day_idx",), k=k),
            by=("day_idx",),
            k=k,
        ).select(
            "day_idx",
            F.col("est_distinct").alias(f"active_{int(w)}d_est"),
        )
        out = out.join(est, "day_idx")
    return materialize_release(out, sketch)


def state_durations(
    df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    max_gap_seconds: int = 1800,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Dwell-time distribution per event type: how long do users sit in
    each state before their next event?  Duration of an event = gap to
    the SAME user's next event, capped at ``max_gap_seconds`` (an
    open-ended last-event-of-session tail would otherwise dominate every
    mean — the cap is the standard sessionization-free dwell fix).
    Output per type: (event_type, n_events, n_capped,
    total_dwell_micros, mean_dwell_micros) — exact integer micros.

    Timestamps compare as EXACT integer micros (unix_micros — the
    double-cast seconds carry ~0.25µs ulps that flip exact-distance
    ties between engines) and ``tiebreak_cols`` (e.g. a unique
    event id) total-orders same-instant events: without it, which of
    two tied events of DIFFERENT types owns the following gap is
    engine-arbitrary.

    Plan: one lead window per user (single hash shuffle on the user
    key), then a partial-aggregated rollup; skew follows the user-key
    distribution like every keyed window here."""
    from pyspark.sql import Window
    from pyspark.sql.types import TimestampNTZType

    col = F.col(time_col)
    if isinstance(df.schema[time_col].dataType, TimestampNTZType):
        col = col.cast("timestamp")
    ts_us = F.unix_micros(col)
    w = Window.partitionBy(user_col).orderBy(
        ts_us, *[F.col(c) for c in tiebreak_cols]
    )
    cap_us = int(max_gap_seconds) * 1000000
    gap = F.lead(ts_us).over(w) - ts_us
    base = (
        spread(df)
        .select(
            F.col(type_col).alias("event_type"),
            gap.alias("__gap"),
        )
        .where(F.col("__gap").isNotNull())
    )
    dwell = F.least(F.col("__gap"), F.lit(cap_us))
    return base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("__gap") > cap_us).cast("long")).alias("n_capped"),
        F.sum(dwell).cast("long").alias("total_dwell_micros"),
        F.expr(
            f"sum(least(__gap, {cap_us}L)) div count(1)"
        ).alias("mean_dwell_micros"),
    )


def activity_heatmap(
    df: DataFrame,
    time_col: str = "ts",
    value_col: str | None = None,
) -> DataFrame:
    """Day-of-week × hour activity heatmap — the capacity-planning /
    anomaly-eyeball grid: (dow, hour, weight, share_ppm) with dow
    0=Monday..6=Sunday derived ARITHMETICALLY from the epoch day
    ((day + 3) % 7: 1970-01-01 was a Thursday), never from calendar
    functions whose week conventions differ across engines.

    One partial-aggregated rollup + a 1-row total broadcast; 168 output
    rows regardless of volume."""
    ts_s = _epoch_s(df, time_col)
    day = F.floor(ts_s / F.lit(86400)).cast("long")
    agg = (
        spread(df)
        .select(
            ((day + F.lit(3)) % 7).alias("dow"),
            F.floor((ts_s % 86400) / F.lit(3600)).cast("long").alias("hour"),
            (
                F.col(value_col).cast("long")
                if value_col is not None
                else F.lit(1).cast("long")
            ).alias("__w"),
        )
        .groupBy("dow", "hour")
        .agg(F.sum("__w").cast("long").alias("weight"))
    )
    tot = agg.agg(F.sum("weight").cast("long").alias("__t"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hour",
        "weight",
        F.expr("weight * 1000000L div __t").alias("share_ppm"),
    )
