"""Empirical scale evidence for the SCALING.md families.

Self-generates a 10x fixture (sf1-equivalent: 50k documents / 6M
lineitem) in a scratch dir from the sf0.1 testdata — deterministic
replicate-and-mutate, driver testdata untouched — and runs the three
shuffle-heavy families SOLO at both scales, recording wall time, row
counts, and the knob-math recompute SCALING.md calls for:

- LSH / near-dup: ``dedup_minhash_lsh``, ``dedup_simhash``,
  ``near_dup_groups`` — plus the band-bucket size distribution (p99.9 /
  max) at both scales, which is how the ``max_key_freq`` cap must be
  re-derived at scale (same PERCENTILE, not same absolute count), and
  the estimated band-entry shuffle volume.
- Iterative graph: ``pagerank_exact``, ``coreness`` over the 10x
  (disjoint-copy) co-purchase graph — per-round shuffles scale with
  edges; iterations stay fixed.
- Streaming store: ``streaming_kmv_replay`` — 3 micro-batches of
  shingle rows folded into the merge-on-write bottom-k store; state is
  O(sketch) so only the fold input grows.

Also re-runs ``key_skew_report`` (lineitem, l_suppkey) at both scales —
the pre-flight SCALING.md §1 prescribes before picking skew caps.

Writes SCALING_RUN.json at the repo root.  Run SOLO (no concurrent
pytest/bench — same contention rule as bench.py).

Usage: python tools/scaling_run.py [--fixture-only] [--keep-fixture]
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
X10_DIR = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR", f"/tmp/sparkplug_scale{COPIES}"
)
OUT_NAME = os.environ.get("SPARK_GRAFT_SCALE_OUT", "SCALING_RUN.json")
ONLY_FAMILIES = {
    f for f in os.environ.get("SPARK_GRAFT_SCALE_FAMILIES", "").split(",") if f
}
DOC_OFF = 1_000_000
ORD_OFF = 100_000_000
KEY_OFF = 10_000_000


def _session():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sparkplug-scaling-run")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def build_fixture(spark) -> None:
    """documents + lineitem at 10x, deterministic replicate-and-mutate.

    Copy 0 is the original.  Copies 1..9 of documents re-tokenize every
    4th token with a copy marker (shingles change everywhere — NOT
    near-dups), except doc_id % 10 == c rows which stay verbatim —
    cross-copy exact/near duplicates, so the dedup families see a
    realistic dup rate instead of a degenerate all-dup or no-dup corpus.
    Lineitem copies offset order/part/supp keys — 10 disjoint co-purchase
    graph copies: 10x nodes AND 10x edges."""
    from pyspark.sql import functions as F

    os.makedirs(X10_DIR, exist_ok=True)
    docs = spark.read.parquet(os.path.join(BASE_DIR, "documents.parquet"))
    parts = []
    for c in range(COPIES):
        d = docs
        if c > 0:
            mutated = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t, i: F.when(
                        i % 4 == 3, F.concat(t, F.lit(f" c{c}x"))
                    ).otherwise(t),
                ),
                " ",
            )
            d = d.withColumn(
                "text",
                F.when(F.col("doc_id") % 10 == c, F.col("text")).otherwise(
                    mutated
                ),
            )
        parts.append(
            d.select(
                (F.col("doc_id") + c * DOC_OFF).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(X10_DIR, "documents.parquet")
    )

    if ONLY_FAMILIES and not (
        {"iterative_graph", "incremental_graph", "r11_persist_discipline"}
        & ONLY_FAMILIES
    ):
        return
    li = spark.read.parquet(os.path.join(BASE_DIR, "lineitem.parquet"))
    cols = li.columns
    lparts = []
    for c in range(COPIES):
        lparts.append(
            li.select(
                *[
                    (F.col(x) + c * ORD_OFF).alias(x)
                    if x == "l_orderkey"
                    else (F.col(x) + c * KEY_OFF).alias(x)
                    if x in ("l_partkey", "l_suppkey")
                    else F.col(x)
                    for x in cols
                ]
            )
        )
    lout = lparts[0]
    for p in lparts[1:]:
        lout = lout.unionByName(p)
    lout.repartition(32).write.mode("overwrite").parquet(
        os.path.join(X10_DIR, "lineitem.parquet")
    )
    ensure_orders(spark)


def ensure_orders(spark) -> None:
    """10x orders (round 10, incremental-graph family): o_orderkey rides
    ORD_OFF (staying join-aligned with the lineitem copies) and
    o_custkey rides KEY_OFF — disjoint customer populations.  The
    derived merchant (% 200) and referral (% 997) target spaces are
    deliberately SHARED across copies: hubs gain 10x in-degree, the
    skew shape a 10x crawl actually produces."""
    from pyspark.sql import functions as F

    out_path = os.path.join(X10_DIR, "orders.parquet")
    if os.path.exists(out_path):
        return
    orders = spark.read.parquet(os.path.join(BASE_DIR, "orders.parquet"))
    cols = orders.columns
    parts = []
    for c in range(COPIES):
        parts.append(
            orders.select(
                *[
                    (F.col(x) + c * ORD_OFF).alias(x)
                    if x == "o_orderkey"
                    else (F.col(x) + c * KEY_OFF).alias(x)
                    if x == "o_custkey"
                    else F.col(x)
                    for x in cols
                ]
            )
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    out.repartition(32).write.mode("overwrite").parquet(out_path)


def ensure_customer(spark) -> None:
    """10x customer (r11, golden-records family): c_custkey rides
    KEY_OFF; names and nations stay VERBATIM, so every name now exists
    in 10 copies — same-nation fuzzy clusters grow 10x denser, which is
    exactly the duplicate-rate shape a consolidated 10x CRM extract
    has (disjoint keys, repeated identities)."""
    from pyspark.sql import functions as F

    out_path = os.path.join(X10_DIR, "customer.parquet")
    if os.path.exists(out_path):
        return
    cust = spark.read.parquet(os.path.join(BASE_DIR, "customer.parquet"))
    cols = cust.columns
    parts = []
    for c in range(COPIES):
        parts.append(
            cust.select(
                *[
                    (F.col(x) + c * KEY_OFF).alias(x)
                    if x == "c_custkey"
                    else F.col(x)
                    for x in cols
                ]
            )
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    out.repartition(8).write.mode("overwrite").parquet(out_path)


def loop_clamp_probe(spark, sf_dir) -> dict:
    """The loop_partitions at-scale claim MEASURED: the derived loop
    shuffle-partition count must CLAMP to the session setting (a no-op)
    once the edge working set outgrows rows_per_partition x session
    partitions — i.e. the local right-sizing vanishes at scale instead
    of pinning a production cluster to tiny loop shuffles."""
    from pyspark.sql import functions as F

    from sparkplug_spark.partitioning import loop_partitions

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n_edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_partkey") + 10_000_000).alias("dst"),
        )
        .dropDuplicates(["src", "dst"])
        .count()
    )
    sess = int(spark.conf.get("spark.sql.shuffle.partitions"))
    derived = loop_partitions(spark, n_edges)
    return {
        "n_edges": int(n_edges),
        "session_partitions": sess,
        "loop_partitions": int(derived),
        "clamped_noop": int(derived) == sess,
    }


def incremental_graph_probe(spark, sf_dir) -> dict:
    """The E281 claim MEASURED: per-batch maintenance (warm-start fold +
    4 fixed iterations) vs the cold full recompute (8 iterations) on the
    SAME merged graph.  The warm/cold wall ratio should track the
    iteration ratio plus batch-sized prep — the number that says a crawl
    cadence can afford to re-rank per batch."""
    import time as _t

    import __spark_entry__ as entry
    from sparkplug_spark.operators import (
        fold_edges,
        pagerank_incremental,
        pagerank_integer,
    )

    b1, b2 = entry._pri_edge_batches(spark, sf_dir)
    store = fold_edges(None, b1).persist()
    ranks1 = pagerank_integer(store, iterations=8, assume_canonical=True)
    n_base = ranks1.count()  # materialize the warm-start input
    merged = fold_edges(store, b2).persist()
    t0 = _t.perf_counter()
    n_cold = pagerank_integer(
        merged, iterations=8, assume_canonical=True
    ).count()
    cold_s = round(_t.perf_counter() - t0, 2)
    t0 = _t.perf_counter()
    n_warm = pagerank_incremental(ranks1, store, b2, iterations=4).count()
    warm_s = round(_t.perf_counter() - t0, 2)
    store.unpersist()
    merged.unpersist()
    return {
        "nodes_batch1": int(n_base),
        "nodes_merged": int(n_cold),
        "cold_full_8it_s": cold_s,
        "warm_incremental_4it_s": warm_s,
        "warm_over_cold": round(warm_s / max(cold_s, 1e-9), 2),
        "_check_same_nodes": int(n_warm) == int(n_cold),
    }


def _timed(fn, spark, sf_dir, passes=2):
    """min-of-N warm wall time (bench.py's convention) + row count."""
    best, n = None, 0
    for _ in range(passes):
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2), int(n)


def lsh_knob_math(spark, sf_dir, num_hashes=32, bands=8) -> dict:
    """Band-bucket size distribution — the skew-cap percentile recompute
    (SCALING.md §1) — plus estimated band-entry shuffle volume."""
    from pyspark.sql import functions as F

    from sparkplug_spark.operators.dedup import (
        _band_entries,
        minhash_signatures,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    entries = _band_entries(
        minhash_signatures(docs, num_hashes=num_hashes), num_hashes, bands
    )
    sizes = entries.groupBy("band", "bucket").count()
    row = sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("count").alias("n_entries"),
        F.max("count").alias("max_bucket"),
        F.expr("percentile(count, 0.999)").alias("p999"),
        F.expr("percentile(count, 0.99)").alias("p99"),
    ).first()
    return {
        "band_entries": int(row["n_entries"]),
        "n_buckets": int(row["n_buckets"]),
        "bucket_p99": float(row["p99"]),
        "bucket_p999": float(row["p999"]),
        "bucket_max": int(row["max_bucket"]),
        # ~50 B per (band_key, id, signature) tuple — SCALING.md §1
        "est_shuffle_mb": round(int(row["n_entries"]) * 50 / 1e6, 1),
    }


def media_run(spark, sf_dir) -> dict:
    """Media-family scale probe: the E18 payload-byte partitioning claim
    MEASURED — every document's text becomes a ~KB binary payload,
    ``repartition_for_media`` sizes partitions by BYTES (not rows), and
    the Arrow decode kernel runs over all of them.  The row that matters
    is ``mb_per_partition``: it must stay ~constant (≈ the target) as the
    corpus scales, while ``n_partitions`` absorbs the growth."""
    from pyspark.sql import functions as F

    from sparkplug_spark.operators.multimodal import (
        decode_image_features,
        repartition_for_media,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    payloads = docs.select(
        "doc_id",
        F.encode(
            F.array_join(F.array_repeat(F.col("text"), 8), " "), "utf-8"
        ).alias("payload"),
    )
    total = payloads.select(F.sum(F.length("payload"))).first()[0] or 0
    target = 8 << 20
    sized = repartition_for_media(
        payloads, target_bytes_per_partition=target
    )
    nparts = sized.rdd.getNumPartitions()
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        n = decode_image_features(sized, feature_dim=16).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return {
        "payload_mb": round(total / 1e6, 1),
        "target_mb_per_partition": round(target / 1e6, 1),
        "n_partitions": int(nparts),
        "mb_per_partition": round(total / 1e6 / max(nparts, 1), 2),
        "decode_s": round(best, 2),
        "rows": int(n),
    }


def skew_preflight(spark, sf_dir) -> dict:
    from sparkplug_spark.operators import key_skew_report

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    rows = key_skew_report(li, ["l_suppkey"], top_n=5).collect()
    cols = rows[0].asDict().keys() if rows else []
    return {"top5": [ {k: r[k] for k in cols} for r in rows ]}


def main() -> None:
    import __spark_entry__ as entry

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(X10_DIR, "documents.parquet")) or (
        "--rebuild" in sys.argv
    ):
        print("building 10x fixture at", X10_DIR, flush=True)
        t0 = time.perf_counter()
        build_fixture(spark)
        print(f"fixture built in {time.perf_counter() - t0:.1f}s", flush=True)
    if "--fixture-only" in sys.argv:
        return

    q = entry.queries()
    # session warm-up: JVM/Arrow/codegen init must not land in the first
    # measured query (it inflated the first draft's base numbers by ~30s)
    q["dedup_minhash_lsh"](spark, BASE_DIR).count()
    families = {
        "lsh_near_dup": ["dedup_minhash_lsh", "dedup_simhash", "near_dup_groups"],
        "iterative_graph": ["pagerank_exact", "coreness"],
        "streaming_store": ["streaming_kmv_replay"],
        # round 9: the crawl lane (fixture pages scale with documents;
        # crawl_extract includes the executor-side WARC write+parse
        # round-trip) and the SFT/text packing family
        "crawl_lane": [
            "main_content", "crawl_extract", "robots_gate", "crawl_frontier",
        ],
        "sft_text": ["pack_transcripts", "chunk_sentences"],
        # round 10: structured extraction + CDC chunking + the
        # index-then-fetch WARC lane + WebDataset round-trip — all
        # scale with the documents table (the per-round fixtures that
        # filter doc_id<k are deliberately excluded: they are
        # constant-size at any sf)
        # round 10 (late): incremental graph maintenance — the two-phase
        # queries scale with the orders-derived edge batches
        "incremental_graph": ["pagerank_incremental", "hits_incremental"],
        "r10_crawl_struct": [
            "cdc_chunks", "html_tables", "section_chunks",
            "entity_extract", "warc_index", "cdx_fetch",
            "webdataset_roundtrip", "frontier_schedule",
        ],
        # round 11: the scale-motivated persists (triangle edge/degree
        # tables, golden-records lab/base, prefix-join prefix/sets) and
        # the loop_partitions clamp, measured at 10x per the r10
        # verdict's item 8
        "r11_persist_discipline": [
            "triangle_counts", "golden_records", "hits_exact",
            "dedup_threshold_curve",
        ],
    }
    if ONLY_FAMILIES:
        families = {k: v for k, v in families.items() if k in ONLY_FAMILIES}
    report: dict = {
        "generated_utc": datetime.now(timezone.utc).isoformat(
            timespec="seconds"
        ),
        "base_sf_dir": BASE_DIR,
        "fixture_dir": X10_DIR,
        "copies": COPIES,
        "families": {},
    }
    if "incremental_graph" in families:
        ensure_orders(spark)
    if "r11_persist_discipline" in families:
        ensure_orders(spark)
        ensure_customer(spark)
    for fam, names in families.items():
        fam_out: dict = {"queries": {}}
        for name in names:
            base_s, base_rows = _timed(q[name], spark, BASE_DIR)
            print(f"{name} @base: {base_s}s {base_rows} rows", flush=True)
            x10_s, x10_rows = _timed(q[name], spark, X10_DIR)
            print(f"{name} @10x:  {x10_s}s {x10_rows} rows", flush=True)
            fam_out["queries"][name] = {
                "base_s": base_s,
                "x10_s": x10_s,
                "base_rows": base_rows,
                "x10_rows": x10_rows,
                "wall_ratio": round(x10_s / max(base_s, 1e-9), 2),
            }
        report["families"][fam] = fam_out

    if "incremental_graph" in families:
        report["families"]["incremental_graph"]["warm_vs_cold"] = {
            "base": incremental_graph_probe(spark, BASE_DIR),
            "x10": incremental_graph_probe(spark, X10_DIR),
        }
    if "r11_persist_discipline" in families:
        report["families"]["r11_persist_discipline"]["loop_clamp"] = {
            "base": loop_clamp_probe(spark, BASE_DIR),
            "x10": loop_clamp_probe(spark, X10_DIR),
        }
    if "lsh_near_dup" in families:
        report["families"]["lsh_near_dup"]["knob_math"] = {
            "base": lsh_knob_math(spark, BASE_DIR),
            "x10": lsh_knob_math(spark, X10_DIR),
        }
    if "iterative_graph" in families or not ONLY_FAMILIES:
        report["skew_preflight_l_suppkey"] = {
            "base": skew_preflight(spark, BASE_DIR),
            "x10": skew_preflight(spark, X10_DIR),
        }

    if not ONLY_FAMILIES or "media" in ONLY_FAMILIES:
        print("media family @base", flush=True)
        base_media = media_run(spark, BASE_DIR)
        print("media family @scale", flush=True)
        scale_media = media_run(spark, X10_DIR)
        report["families"]["media"] = {
            "base": base_media,
            f"x{COPIES}": scale_media,
        }

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        OUT_NAME,
    )
    # same-scale re-runs of a FAMILY SUBSET merge into the existing report
    # instead of dropping the other families' evidence
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                prev = json.load(f)
            if prev.get("copies") == COPIES:
                merged = prev.get("families", {})
                merged.update(report["families"])
                report["families"] = merged
                for k, v in prev.items():
                    report.setdefault(k, v)
        except (OSError, ValueError):
            pass
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
