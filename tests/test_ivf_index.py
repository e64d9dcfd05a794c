"""Persisted IVF index: build once, search with partition pruning."""

import glob

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    build_ivf_index,
    cosine_topk,
    search_ivf_index,
)


def test_build_layout_and_exhaustive_equals_exact(spark, tmp_path, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, num_centroids=8)

    # one directory per centroid list; stored rows == corpus rows
    assert len(glob.glob(f"{path}/lists/centroid=*")) == 8
    stored = spark.read.parquet(f"{path}/lists")
    assert stored.count() == emb.count()

    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {tuple(r) for r in cosine_topk(emb, q, k=10).collect()}
    exhaustive = {
        tuple(r)
        for r in search_ivf_index(spark, path, q, k=10, n_probe=8).collect()
    }
    assert exhaustive == exact


def test_search_prunes_partitions(spark, tmp_path, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    path = str(tmp_path / "ivf_prune")
    build_ivf_index(emb, path, num_centroids=8)
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = search_ivf_index(spark, path, q, k=5, n_probe=2)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # probed lists reach the scan as a partition filter (directory pruning)
    assert "PartitionFilters" in plan and "centroid" in plan
    assert out.count() == 10  # 2 queries x k=5
    # results within probed lists are exact cosines: top hit is the query
    top = {r["query_id"]: r for r in out.collect() if r["rank"] == 1}
    assert top[0]["neighbor_id"] == 0 and top[0]["cosine"] == 1.0


def test_ivfpq_exhaustive_full_rerank_equals_exact(spark, tmp_path, sf_dir):
    """n_probe = all lists + rerank >= corpus: neither pruning nor PQ
    quantization can change the result — must equal brute force."""
    from sparkplug_spark.operators import build_ivfpq_index, search_ivfpq_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, path, num_centroids=8, m=8, ks=16)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n = emb.count()
    exact = {tuple(r) for r in cosine_topk(emb, q, k=10).collect()}
    got = {
        tuple(r)
        for r in search_ivfpq_index(
            spark, path, q, k=10, n_probe=8, rerank=n
        ).collect()
    }
    assert got == exact


def test_ivfpq_recall_with_pruning(spark, tmp_path, sf_dir):
    from sparkplug_spark.operators import build_ivfpq_index, search_ivfpq_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    path = str(tmp_path / "ivfpq_r")
    build_ivfpq_index(emb, path, num_centroids=8, m=8, ks=16)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = search_ivfpq_index(spark, path, q, k=5, n_probe=3, rerank=50)
    top = {r["query_id"]: r for r in out.collect() if r["rank"] == 1}
    # the query vector itself lives in its own nearest list -> rank 1 self
    hits = sum(1 for qid, r in top.items() if r["neighbor_id"] == qid)
    assert hits >= 9  # >=90% self-recall with 3/8 lists probed


def test_search_empty_queries_raises(spark, tmp_path, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    path = str(tmp_path / "ivf_e")
    build_ivf_index(emb, path, num_centroids=4)
    with pytest.raises(ValueError, match="empty query"):
        search_ivf_index(spark, path, emb.filter("vec_id < 0").select(
            F.col("vec_id").alias("query_id"), "embedding"
        ))


class TestIncrementalAppend:
    """Round-4: absorb new vectors into a stored index without retrain
    (append to the partitioned lists against frozen centroids/books)."""

    def test_append_ivf_exhaustive_equals_exact_over_union(
        self, spark, tmp_path, sf_dir
    ):
        from sparkplug_spark.operators import append_to_ivf_index

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        old = emb.filter(F.col("vec_id") % 2 == 0)
        new = emb.filter(F.col("vec_id") % 2 == 1)
        path = str(tmp_path / "ivf_app")
        build_ivf_index(old, path, num_centroids=8)
        append_to_ivf_index(new, path)

        stored = spark.read.parquet(f"{path}/lists")
        assert stored.count() == emb.count()
        # appended rows landed in existing centroid dirs only
        assert len(glob.glob(f"{path}/lists/centroid=*")) == 8

        q = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = {tuple(r) for r in cosine_topk(emb, q, k=10).collect()}
        exhaustive = {
            tuple(r)
            for r in search_ivf_index(spark, path, q, k=10, n_probe=8).collect()
        }
        # exhaustive probe over the appended index == exact over the union:
        # recall is unchanged by the append path
        assert exhaustive == exact

    def test_append_preserves_partition_pruning(self, spark, tmp_path, sf_dir):
        from sparkplug_spark.operators import append_to_ivf_index

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        path = str(tmp_path / "ivf_app2")
        build_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), path, num_centroids=8)
        append_to_ivf_index(emb.filter(F.col("vec_id") % 2 == 1), path)
        q = emb.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = search_ivf_index(spark, path, q, k=5, n_probe=2)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "PartitionFilters" in plan and "centroid" in plan
        # an appended vector is findable: its own query's top hit is itself
        top = {r["query_id"]: r for r in out.collect() if r["rank"] == 1}
        assert top[1]["neighbor_id"] == 1 and top[1]["cosine"] == 1.0

    def test_append_ivfpq_exhaustive_full_rerank_equals_exact(
        self, spark, tmp_path, sf_dir
    ):
        from sparkplug_spark.operators import (
            append_to_ivfpq_index,
            build_ivfpq_index,
            search_ivfpq_index,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        path = str(tmp_path / "ivfpq_app")
        build_ivfpq_index(
            emb.filter(F.col("vec_id") % 2 == 0), path, num_centroids=8, m=8, ks=16
        )
        append_to_ivfpq_index(emb.filter(F.col("vec_id") % 2 == 1), path)
        q = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        n = emb.count()
        exact = {tuple(r) for r in cosine_topk(emb, q, k=10).collect()}
        got = {
            tuple(r)
            for r in search_ivfpq_index(
                spark, path, q, k=10, n_probe=8, rerank=n
            ).collect()
        }
        # full-probe + full-rerank: appended codes can't change the result
        assert got == exact
