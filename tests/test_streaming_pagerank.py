"""Streaming PageRank store (E284): replay equality with the batch
two-phase chain, the at-least-once replay guard, and crash-between-
publishes idempotence."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    fold_edges,
    pagerank_incremental,
    pagerank_integer,
)
from sparkplug_spark.sources import read_store
from sparkplug_spark.streaming import streaming_pagerank_store
from sparkplug_spark.streaming import _merge_pagerank_batch
from sparkplug_spark.streaming.replay import replay_foreach_batch

E1 = [(1, 2), (2, 3), (3, 1), (1, 4)]
E2 = [(4, 5), (5, 1), (2, 3)]


def _df(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def _batch_chain(spark):
    store = fold_edges(None, _df(spark, E1)).persist()
    r1 = pagerank_integer(store, iterations=8, assume_canonical=True)
    return {
        r["node"]: r["rank_nano"]
        for r in pagerank_incremental(
            r1, store, _df(spark, E2), iterations=4
        ).collect()
    }


class TestStreamingPagerankStore:
    def test_replay_equals_batch_chain(self, spark):
        path = os.path.join(
            tempfile.mkdtemp(prefix="sparkplug_spr_test_"), "store"
        )
        replay_foreach_batch(
            spark,
            [_df(spark, E1), _df(spark, E2)],
            lambda s: streaming_pagerank_store(s, path),
            shuffle_partitions=4,
        )
        got = {
            r["node"]: r["rank_nano"]
            for r in read_store(spark, path + "/ranks").collect()
        }
        want = _batch_chain(spark)
        assert got == {**want, **got}  # same keys first
        assert got == want
        # the edge store holds the canonical merged graph
        edges = {
            (r["src"], r["dst"])
            for r in read_store(spark, path + "/edges").collect()
        }
        assert edges == set(E1) | set(E2)

    def test_replayed_batch_is_noop(self, spark):
        path = os.path.join(
            tempfile.mkdtemp(prefix="sparkplug_spr_test_"), "store"
        )
        args = (path, "src", "dst", 8, 4, 85, 10**9)
        _merge_pagerank_batch(_df(spark, E1), 0, *args)
        _merge_pagerank_batch(_df(spark, E2), 1, *args)
        before = {
            r["node"]: r["rank_nano"]
            for r in read_store(spark, path + "/ranks").collect()
        }
        # at-least-once redelivery of batch 1 must not move the store
        _merge_pagerank_batch(_df(spark, E2), 1, *args)
        after = {
            r["node"]: r["rank_nano"]
            for r in read_store(spark, path + "/ranks").collect()
        }
        assert after == before

    def test_crash_between_publishes_converges(self, spark):
        # simulate: edges store already advanced to batch 1's fold, but
        # the ranks publish never landed (crash window) — the re-run must
        # produce the exact crashless result
        path = os.path.join(
            tempfile.mkdtemp(prefix="sparkplug_spr_test_"), "store"
        )
        args = (path, "src", "dst", 8, 4, 85, 10**9)
        _merge_pagerank_batch(_df(spark, E1), 0, *args)
        from sparkplug_spark.streaming import _swap_publish

        merged = fold_edges(
            read_store(spark, path + "/edges"), _df(spark, E2)
        )
        _swap_publish(merged, spark, path + "/edges")  # crash after this
        _merge_pagerank_batch(_df(spark, E2), 1, *args)  # redelivery
        got = {
            r["node"]: r["rank_nano"]
            for r in read_store(spark, path + "/ranks").collect()
        }
        assert got == _batch_chain(spark)


class TestStreamingTermIndexStore:
    def test_replay_and_idempotence(self, spark):
        from sparkplug_spark.operators import build_term_index
        from sparkplug_spark.streaming import (
            _merge_term_index_batch,
            streaming_term_index_store,
        )

        path = os.path.join(
            tempfile.mkdtemp(prefix="sparkplug_sidx_test_"), "store"
        )
        b1 = spark.createDataFrame(
            [(1, "old cats doc"), (2, "dogs doc")],
            "doc_id long, text string",
        )
        b2 = spark.createDataFrame(
            [(1, "new birds doc"), (3, "fish doc")],
            "doc_id long, text string",
        )
        replay_foreach_batch(
            spark,
            [b1, b2],
            lambda s: streaming_term_index_store(s, path),
            shuffle_partitions=4,
        )
        final = spark.createDataFrame(
            [(1, "new birds doc"), (2, "dogs doc"), (3, "fish doc")],
            "doc_id long, text string",
        )
        got = {
            (r["term"], r["doc_id"]): (r["tf"], r["dl"])
            for r in read_store(spark, path)
            .drop("__last_batch")
            .collect()
        }
        want = {
            (r["term"], r["doc_id"]): (r["tf"], r["dl"])
            for r in build_term_index(final).collect()
        }
        assert got == want
        # redelivery of batch 1 is a no-op (guard) AND harmless anyway
        _merge_term_index_batch(b2, 1, path, "doc_id", "text")
        after = {
            (r["term"], r["doc_id"]): (r["tf"], r["dl"])
            for r in read_store(spark, path)
            .drop("__last_batch")
            .collect()
        }
        assert after == want


class TestStreamingFrontierStore:
    def test_fold_equals_one_shot_and_guard(self, spark):
        from pyspark.sql import functions as F

        from sparkplug_spark.operators import (
            discovered_targets,
            frontier_from_store,
        )
        from sparkplug_spark.streaming import (
            _merge_frontier_batch,
            streaming_frontier_store,
        )

        def page(i, links):
            body = "".join(
                f'<a href="{h}" {rel}>x</a>'
                for h, rel in links
            )
            return (i, f"http://s.example/p{i}", f"<html><body>{body}</body></html>")

        rows = [
            page(0, [("http://t.example/a", ""), ("http://t.example/b", 'rel="nofollow"')]),
            page(1, [("http://t.example/a", ""), ("http://t.example/c", "")]),
            page(2, [("http://t.example/a", "")]),
        ]
        schema = "doc_id long, url string, html string"
        all_pages = spark.createDataFrame(rows, schema)
        b1 = all_pages.filter(F.col("doc_id") < 2)
        b2 = all_pages.filter(F.col("doc_id") >= 2)
        path = os.path.join(
            tempfile.mkdtemp(prefix="sparkplug_sfro_test_"), "store"
        )
        replay_foreach_batch(
            spark,
            [b1, b2],
            lambda s: streaming_frontier_store(s, path),
            shuffle_partitions=4,
        )
        crawled = spark.createDataFrame(
            [("http://t.example/c",)], "url string"
        )
        stored = read_store(spark, path).drop("__last_batch")
        got = {
            r["url"]: (r["n_refs"], r["first_doc"])
            for r in frontier_from_store(stored, crawled, per_domain_cap=10).collect()
        }
        # a: referenced by pages 0,1,2 (3 refs, first page 0);
        # b: nofollow-dropped; c: crawled -> anti-joined away
        assert got == {"http://t.example/a": (3, 0)}
        # one-shot equivalence of the raw aggregates
        one = {
            (r["url"], r["n_refs"], r["first_doc"], r["first_pos"])
            for r in discovered_targets(all_pages).collect()
        }
        folded = {
            (r["url"], r["n_refs"], r["first_doc"], r["first_pos"])
            for r in stored.collect()
        }
        assert folded == one
        # at-least-once redelivery of batch 1 must not double-count
        _merge_frontier_batch(
            b2, 1, path, "html", "doc_id", ("nofollow", "sponsored", "ugc")
        )
        after = {
            (r["url"], r["n_refs"])
            for r in read_store(spark, path).drop("__last_batch").collect()
        }
        assert after == {(u, n) for u, n, _, _ in folded}
