"""User-journey path analytics: Markov transition matrices and
top session paths.

:func:`event_transitions` builds the first-order Markov transition table
of an event log — for every ordered pair of consecutive events of one
user, count transitions, the per-source probability (exact integer ppm),
and the mean dwell time between the two events.  :func:`session_paths`
sessionizes the log (same gap contract as ``events.sessionize``) and
counts the distinct journeys (ordered event-type sequences, truncated to
the first ``max_steps`` steps) across sessions.

Both operators are deliberately window-shaped rather than
collect-list-shaped: per-user event streams are consumed by ``lag``/
``row_number`` windows over the (user, time, id) total order, so a bot
user with millions of events never materializes a million-element array
on one executor.  Transition output is bounded by |event types|² and the
path output by the ``min_sessions`` support floor, so both results stay
driver-safe at any input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .events import _epoch_s

__all__ = ["event_transitions", "session_paths", "frequent_event_sequences"]


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over each user's event stream.

    For every user, events are totally ordered by (epoch second, event
    id) — the id tiebreak makes ``lead`` deterministic across engines —
    and every consecutive pair contributes one (src_type, dst_type)
    transition.  Output, one row per observed pair:

    - ``n_transitions`` BIGINT — pair count
    - ``p_ppm`` BIGINT — ``n * 1_000_000 div (total transitions out of
      src_type)``: the row-stochastic transition probability in exact
      integer ppm (truncating div, engine-exact)
    - ``avg_gap_us`` BIGINT — mean microseconds between the two events'
      epoch seconds, as the exact truncating ``gap_sum * 1_000_000 div
      n`` (integer math, engine-exact — a 6dp DOUBLE mean could tie at
      the rounding digit for small-denominator rationals).  Computed in
      the decomposed form ``(s div n)·10⁶ + (s mod n)·10⁶ div n`` —
      algebraically identical, but the intermediate never exceeds
      ``n·10⁶`` instead of ``gap_sum·10⁶``, so it stays overflow-free to
      ~9·10¹² transitions per pair at ANY gap magnitude

    Plan: one hash shuffle on the user key feeds the lead window; the
    pair aggregation is map-side combined; the per-source total is a
    second window over the *aggregated* result (|types|² rows — tiny at
    any scale, so its exchange is negligible)."""
    ts_s = _epoch_s(df, time_col)
    ev = df.select(
        F.col(user_col).alias("__u"),
        ts_s.alias("__ts_s"),
        F.col(id_col).alias("__id"),
        F.col(type_col).alias("src_type"),
    )
    w = Window.partitionBy("__u").orderBy("__ts_s", "__id")
    nxt = ev.select(
        "src_type",
        F.lead("src_type").over(w).alias("dst_type"),
        (F.lead("__ts_s").over(w) - F.col("__ts_s")).alias("__gap"),
    ).filter(F.col("dst_type").isNotNull())
    agg = nxt.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum("__gap").alias("__gap_sum"),
    )
    src_total = F.sum("n_transitions").over(Window.partitionBy("src_type"))
    return agg.withColumn("__src_total", src_total).select(
        "src_type",
        "dst_type",
        "n_transitions",
        F.expr("n_transitions * 1000000 div __src_total")
        .cast("long")
        .alias("p_ppm"),
        F.expr(
            "(__gap_sum div n_transitions) * 1000000"
            " + ((__gap_sum % n_transitions) * 1000000) div n_transitions"
        )
        .cast("long")
        .alias("avg_gap_us"),
    )


def session_paths(
    df: DataFrame,
    gap_seconds: int = 1800,
    max_steps: int = 8,
    min_sessions: int = 2,
    user_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    end_at: str | None = None,
) -> DataFrame:
    """Top session journeys: sessionize by inactivity gap (same
    second-precision break rule as ``events.sessionize``), render each
    session's first ``max_steps`` event types as a ``>``-joined path
    string, and count sessions per path, keeping paths with at least
    ``min_sessions`` support.

    Output: (path VARCHAR, n_sessions BIGINT).

    Determinism: events order by (epoch second, event id) — a total
    order, so the step sequence and the session break structure are
    engine-exact (ties at the same second diff to 0 and never break a
    session; the id tiebreak fixes their relative path order).

    ``end_at`` switches to CONVERSION-PATH mode: only sessions
    containing that event type count, and each contributes the (up to
    ``max_steps``) steps ENDING at its first ``end_at`` occurrence — the
    immediate prefix marketers read as "the path to purchase" (a
    first-k-steps cap would drop the conversion terminal whenever it
    falls late in a long session).

    Scale: the step filter (``rn <= max_steps``, or the end-anchored
    band) runs BEFORE any aggregation, so a runaway session contributes
    at most ``max_steps`` narrow rows to the path build; the support
    floor bounds the result.  Two window passes share the (user) /
    (user, session) key family and the path count is a map-side-combined
    agg on the path string."""
    if max_steps < 1:
        raise ValueError("max_steps must be >= 1")
    ts_s = _epoch_s(df, time_col)
    ev = df.select(
        F.col(user_col).alias("__u"),
        ts_s.alias("__ts_s"),
        F.col(id_col).alias("__id"),
        F.col(type_col).alias("__t"),
    )
    wu = Window.partitionBy("__u").orderBy("__ts_s", "__id")
    prev = F.lag("__ts_s").over(wu)
    brk = F.when(prev.isNull() | ((F.col("__ts_s") - prev) > gap_seconds), 1).otherwise(0)
    # session_idx via the default RANGE frame is tie-safe in sessionize's
    # aggregate output, but the PER-ROW step index here needs the ROWS
    # frame over the (ts, id) total order so each row sees one session id
    sess = ev.withColumn("__brk", brk).withColumn(
        "__sid",
        F.sum("__brk").over(
            wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ws = Window.partitionBy("__u", "__sid").orderBy("__ts_s", "__id")
    numbered = sess.withColumn("__rn", F.row_number().over(ws))
    if end_at is None:
        steps = numbered.filter(F.col("__rn") <= max_steps)
    else:
        w_sess = Window.partitionBy("__u", "__sid")
        end_rn = F.min(
            F.when(F.col("__t") == end_at, F.col("__rn"))
        ).over(w_sess)
        steps = (
            numbered.withColumn("__end_rn", end_rn)
            .filter(
                F.col("__end_rn").isNotNull()
                & (F.col("__rn") <= F.col("__end_rn"))
                & (F.col("__rn") > F.col("__end_rn") - max_steps)
            )
            .drop("__end_rn")
        )
    paths = steps.groupBy("__u", "__sid").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__rn", "__t"))),
                lambda s: s["__t"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .filter(F.col("n_sessions") >= min_sessions)
    )


def frequent_event_sequences(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    min_support: int = 2,
    max_len: int = 3,
) -> DataFrame:
    """Frequent event SEQUENCES (ordered, gaps allowed) up to length 3:
    how many users' streams contain a subsequence of event types at
    strictly increasing timestamps — the sequential sibling of
    market-basket :func:`~.cleaning.frequent_itemsets` (order matters
    here; "view → cart → purchase" and "purchase → view" are different
    patterns).  Support = DISTINCT users containing the pattern.

    The subsequence-EXISTENCE test is closed-form, never an all-triples
    enumeration: per (user, type) only the FIRST and LAST occurrence
    matter at the ends — ``(a,b)`` exists iff ``first_ts(a) <
    last_ts(b)``, and ``(a,b,c)`` iff some b-event lies strictly
    between ``first_ts(a)`` and ``last_ts(c)`` — so length-2 support is
    a |types|²-per-user join over a (user, type) summary table and
    length-3 joins each EVENT row against that summary once, O(events ×
    frequent-type pairs) instead of O(events³).  Simultaneous
    (equal-ts) events never form a sequence step (strict ordering — the
    engine-portable reading).

    Output: (pattern STRING "a>b>c", size, support), A-Priori-pruned:
    only length-1-frequent types enter longer patterns (sound — a
    pattern's support ≤ each element's support).

    100 TB shape: the (user, type) summary is one partial-agg shuffle;
    L2 runs on the summary only (corpus-independent width); L3's one
    event-vs-summary join shuffles (user) keys; supports are
    countDistinct over (user, pattern) rows."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    if not 1 <= max_len <= 3:
        raise ValueError("max_len must be 1, 2 or 3")
    from pyspark.storagelevel import StorageLevel

    from ..caching import materialize_release

    ev = df.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.col(ts_col).alias("ts"),
    ).filter(F.col("t").isNotNull()).persist(StorageLevel.MEMORY_AND_DISK)
    # the (user, type) summary feeds l1 and all four join aliases of the
    # longer levels — persist both or every level replays the scan/agg
    fl = ev.groupBy("u", "t").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    l1 = fl.groupBy("t").agg(
        F.countDistinct("u").cast("long").alias("support")
    ).filter(F.col("support") >= min_support)
    out = l1.select(
        F.col("t").alias("pattern"),
        F.lit(1).cast("long").alias("size"),
        "support",
    )
    if max_len == 1:
        return materialize_release(out, ev, fl)
    # A-Priori prune: only frequent types participate in longer patterns
    flf = fl.join(l1.select("t"), "t", "left_semi").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a, b = flf.alias("a"), flf.alias("b")
    l2 = (
        a.join(
            b,
            (F.col("a.u") == F.col("b.u"))
            & (F.col("a.first_ts") < F.col("b.last_ts")),
        )
        .groupBy(F.col("a.t").alias("x"), F.col("b.t").alias("y"))
        .agg(F.countDistinct(F.col("a.u")).cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    out = out.unionByName(
        l2.select(
            F.concat_ws(">", "x", "y").alias("pattern"),
            F.lit(2).cast("long").alias("size"),
            "support",
        )
    )
    if max_len == 2:
        return materialize_release(out, ev, fl, flf)
    evf = ev.join(l1.select("t"), "t", "left_semi")
    fa, fc = flf.alias("fa"), flf.alias("fc")
    l3 = (
        evf.alias("m")
        .join(
            fa,
            (F.col("fa.u") == F.col("m.u"))
            & (F.col("fa.first_ts") < F.col("m.ts")),
        )
        .join(
            fc,
            (F.col("fc.u") == F.col("m.u"))
            & (F.col("m.ts") < F.col("fc.last_ts")),
        )
        .groupBy(
            F.col("fa.t").alias("x"),
            F.col("m.t").alias("y"),
            F.col("fc.t").alias("z"),
        )
        .agg(F.countDistinct(F.col("m.u")).cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    out = out.unionByName(
        l3.select(
            F.concat_ws(">", "x", "y", "z").alias("pattern"),
            F.lit(3).cast("long").alias("size"),
            "support",
        )
    )
    return materialize_release(out, ev, fl, flf)
