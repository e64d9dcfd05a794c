"""Regression locks for the iterative rank-loop execution shape (r11).

The r10 loop overhaul's core win is that per-iteration work re-exchanges
only NODE-sized vectors: the edge table is persisted hash-partitioned on
each gather key, so a gather join must not re-shuffle it.  These locks
protect that from silent regression two ways:

1. a plan lock on one gather step built exactly the way the loops build
   it (persisted repartition("src") edge table joined to a node vector):
   the edge side must be an InMemoryTableScan with NO Exchange above it;
2. a job/task SLOPE lock on the real operators: the marginal cost of
   three extra iterations is bounded — a reintroduced per-iteration edge
   exchange (or a revived broadcast-subquery scalar feed, the r5/r11
   measured regression class) adds multiple jobs+stages per iteration
   and trips the bound, while fixed preflight/setup drift does not.
"""

import re

from pyspark.sql import functions as F


def _jobs_tasks(spark, fn):
    tracker = spark.sparkContext.statusTracker()
    j0 = set(tracker.getJobIdsForGroup(None))
    fn().write.format("noop").mode("overwrite").save()
    jobs = sorted(set(tracker.getJobIdsForGroup(None)) - j0)
    ntasks = 0
    for jid in jobs:
        ji = tracker.getJobInfo(jid)
        if ji:
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si and si.numCompletedTasks > 0:
                    ntasks += si.numTasks
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in jmap.keySet().toArray():
        jmap.get(rid).unpersist(False)
    spark.catalog.clearCache()
    return len(jobs), ntasks


def _edges(spark):
    return spark.range(0, 4000).select(
        (F.col("id") % 97).alias("src"),
        ((F.col("id") * 13) % 101 + 50).alias("dst"),
    )


def test_gather_join_does_not_reexchange_partitioned_edges(spark):
    e = _edges(spark).repartition("src").persist()
    e.count()
    try:
        vec = spark.range(0, 97).select(
            F.col("id").alias("src"), F.lit(5).cast("long").alias("v")
        ).repartition("src")
        gathered = (
            e.join(vec, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("v").alias("g"))
        )
        plan = gathered._jdf.queryExecution().executedPlan().toString()
        # the edge side must come straight off the cache: no Exchange may
        # sit between the InMemoryTableScan and the join
        scan = plan.find("InMemoryTableScan")
        assert scan != -1
        edge_side = plan[:scan]
        join_pos = max(
            edge_side.rfind("SortMergeJoin"),
            edge_side.rfind("ShuffledHashJoin"),
            edge_side.rfind("BroadcastHashJoin"),
        )
        between = plan[join_pos:scan] if join_pos != -1 else edge_side
        assert not re.search(r"Exchange hashpartitioning\(src", between), plan
    finally:
        e.unpersist()


def test_rank_loop_marginal_cost_is_bounded(spark):
    from sparkplug_spark.operators import hits_integer, pagerank_integer

    e = _edges(spark)
    for op, j_cap, t_cap in (
        (hits_integer, 18, 24),  # measured marginal: 15 jobs / 15 tasks
        (pagerank_integer, 15, 24),  # measured marginal: 12 jobs / 12 tasks
    ):
        j3, t3 = _jobs_tasks(spark, lambda: op(e, iterations=3))
        j6, t6 = _jobs_tasks(spark, lambda: op(e, iterations=6))
        assert j6 - j3 <= j_cap, (op.__name__, j3, j6)
        assert t6 - t3 <= t_cap, (op.__name__, t3, t6)
