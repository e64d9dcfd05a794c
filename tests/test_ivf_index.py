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
