"""The continuous-crawl maintenance loop — the round-10 incremental
stores composed end to end.  A crawl never finishes: batches of fetched
pages arrive forever, and every derived artifact must FOLD, not
rebuild.  This example runs three crawl 'days' through the four stores
that make that possible:

  1. discovery   streaming_frontier_store    per-URL discovery folds
                 + frontier_from_store        (counts add, first-seen is
                                              a min — any batching
                                              equals the one-shot run);
                                              crawled-set anti-join and
                                              politeness cap at serve
  2. indexing    append_to_term_index /       batch tokenize + stale-
                 streaming_term_index_store   posting drop; BM25 over
                                              the folded store == a
                                              full rebuild, bit-for-bit
  3. ranking     fold_edges +                 canonical edge-store fold
                 pagerank_incremental         + warm-start bounded
                                              re-iteration (a few steps
                                              re-absorb a small delta)
  4. dedup       dedup_exact_against /        day-N batches join stored
                 fold_confusables             digests, never re-shingle
                                              the corpus; homoglyph
                                              folding catches evasive
                                              re-uploads first

Every store is manifest-published (crash at any point serves
old-or-new, never half) and every fold is either commutative or
replay-guarded, so at-least-once delivery converges to the
exactly-once result.

Run:  python examples/incremental_crawl_loop.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def page(i: int, outlinks, text: str):
    body = "".join(f'<a href="{h}">{t}</a> ' for h, t in outlinks)
    return (
        i,
        f"http://site{i % 3}.example/p{i}",
        f"<html><body><p>{text}</p>{body}</body></html>",
        text,
    )


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("incremental-crawl-loop")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sparkplug_spark.operators import (
        append_to_term_index,
        bm25_search,
        build_term_index,
        discovered_targets,
        fold_confusables,
        fold_edges,
        frontier_from_store,
        merge_frontier_targets,
        pagerank_incremental,
        pagerank_integer,
    )

    root = tempfile.mkdtemp(prefix="incr_crawl_")
    schema = "doc_id long, url string, html string, text string"

    # --- three crawl days: day 2 re-crawls page 1 (revised), day 3
    # delivers a homoglyph-evasive duplicate of page 0 ----------------
    days = [
        [
            page(0, [("http://a.example/x", "alpha")], "spark engines at scale"),
            page(1, [("http://a.example/x", "alpha"), ("http://b.example/y", "beta")], "old draft page"),
        ],
        [
            page(1, [("http://c.example/z", "gamma")], "revised page about spark"),
            page(2, [("http://a.example/x", "alpha")], "fresh page on engines"),
        ],
        [
            page(3, [], "ѕрark еngines at sсale"),  # Cyrillic lookalikes
        ],
    ]

    frontier_targets = None
    index = None
    edge_store = None
    ranks = None
    digests = None

    for day, rows in enumerate(days):
        batch = spark.createDataFrame(rows, schema)

        # 1. discovery fold (commutative counts + min first-seen)
        t = discovered_targets(batch)
        frontier_targets = (
            t if frontier_targets is None
            else merge_frontier_targets(frontier_targets, t)
        ).localCheckpoint(eager=True)

        # 2. index fold: re-crawled ids drop stale postings
        docs = batch.select("doc_id", "text")
        index = (
            build_term_index(docs) if index is None
            else append_to_term_index(index, docs)
        ).localCheckpoint(eager=True)

        # 3. rank fold: warm start from yesterday's vector
        edges = batch.select(
            F.col("doc_id").alias("src"),
            F.abs(F.hash("url")).alias("dst"),
        )
        if edge_store is None:
            edge_store = fold_edges(None, edges).localCheckpoint(eager=True)
            ranks = pagerank_integer(
                edge_store, iterations=8, assume_canonical=True
            )
        else:
            new_store = fold_edges(edge_store, edges).localCheckpoint(
                eager=True
            )
            ranks = pagerank_incremental(
                ranks, edge_store, edges, iterations=4
            )
            edge_store = new_store

        # 4. dedup screen: fold homoglyphs, then digest-join the store
        folded = fold_confusables(docs)
        sig = folded.select(
            "doc_id", F.md5("text").alias("digest"), "n_folded"
        )
        if digests is not None:
            dup = sig.join(
                digests.select(F.col("digest"), F.col("doc_id").alias("dup_of")),
                "digest",
            )
            n_dup = dup.count()
            if n_dup:
                print(f"day {day}: {n_dup} evasive/exact duplicate(s):")
                dup.select("doc_id", "dup_of", "n_folded").show()
            digests = digests.unionByName(
                sig.join(digests.select("digest"), "digest", "left_anti")
            ).localCheckpoint(eager=True)
        else:
            digests = sig.localCheckpoint(eager=True)

    crawled = spark.createDataFrame(
        [(r[1],) for day in days for r in day], "url string"
    )
    print("frontier after 3 days (crawled pages excluded):")
    frontier_from_store(frontier_targets, crawled, per_domain_cap=5).show(
        truncate=False
    )
    print("BM25 over the folded index ('spark engines'):")
    bm25_search(
        spark.createDataFrame([(0, "x")], "doc_id long, text string"),
        {"q": ["spark", "engines"]},
        k=3,
        index=index,
    ).show()
    print("warm-maintained ranks (top 5):")
    ranks.orderBy(F.desc("rank_nano")).show(5)
    spark.stop()
    print("OK: incremental crawl loop complete at", root)


if __name__ == "__main__":
    main()
