"""Quantitative gates for the rows-only queries (no DuckDB oracle — LSH /
ML-seeded candidate generation isn't SQL-reproducible).  Each approximate
operator is bounded against its exact counterpart, so "rows-only" still
means "verified".

The testdata embeddings are near-isotropic (top-1 cosine ≈ 0.35, no pair
above 0.7 at sf0.001), so top-k "neighbors" there are noise LSH is not
designed to find.  The gates therefore PLANT near-duplicates (perturbed
copies of real corpus vectors, cosine ≈ 0.999) and require the
approximate operators to recover them — the regime sign-LSH/IVF
contractually serve.  Bounds (documented in SURVEY.md §2):

- simsearch_topk_lsh   : planted-NN recall@10            >= 0.9
- simsearch_topk_ivf   : planted-NN recall@10, probe 4/16 >= 0.9
                         (+ exhaustive-probe == exact, test_operators.py)
- emb_similar_pairs_lsh: planted-pair recall, cos>=0.95   >= 0.9
                         (and zero false positives — exact verify)
- dedup_minhash_ml     : recall of true-jaccard>=0.6 pairs >= 0.9
"""

import pytest
from pyspark.sql import functions as F


def _planted(spark, sf_dir, n_plant=25, offset=100000):
    """Real sf0.001 corpus + perturbed copies of the first ``n_plant``
    vectors (ids offset+i, cosine vs source ≈ 0.9999)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") < n_plant).collect()
    planted = [
        (
            offset + r["vec_id"],
            [float(x) * (1.0 + 0.001 * ((i + j) % 3)) for j, x in enumerate(r["embedding"])],
        )
        for i, r in enumerate(base)
    ]
    planted_df = spark.createDataFrame(planted, "vec_id long, embedding array<float>")
    corpus = emb.select("vec_id", "embedding").unionByName(planted_df)
    return corpus, planted_df, n_plant, offset


def _rank1_recall(topk_rows, n_plant, offset):
    """Fraction of planted queries whose source vector appears in top-k."""
    found = set()
    for r in topk_rows:
        if r["query_id"] >= offset and r["neighbor_id"] == r["query_id"] - offset:
            found.add(r["query_id"])
    return len(found) / n_plant


def test_simsearch_lsh_recall(spark, sf_dir):
    from sparkplug_spark.operators import cosine_topk_lsh

    corpus, planted_df, n_plant, offset = _planted(spark, sf_dir)
    q = planted_df.select(F.col("vec_id").alias("query_id"), "embedding")
    rows = cosine_topk_lsh(corpus, q, k=10, num_planes=64, bands=8).collect()
    assert _rank1_recall(rows, n_plant, offset) >= 0.9


def test_simsearch_ivf_recall(spark, sf_dir):
    from sparkplug_spark.operators import cosine_topk_ivf

    corpus, planted_df, n_plant, offset = _planted(spark, sf_dir)
    q = planted_df.select(F.col("vec_id").alias("query_id"), "embedding")
    rows = cosine_topk_ivf(
        corpus, q, k=10, num_centroids=16, n_probe=4
    ).collect()
    assert _rank1_recall(rows, n_plant, offset) >= 0.9


def test_simsearch_pq_recall(spark, sf_dir):
    from sparkplug_spark.operators import cosine_topk_pq

    corpus, planted_df, n_plant, offset = _planted(spark, sf_dir)
    q = planted_df.select(F.col("vec_id").alias("query_id"), "embedding")
    rows = cosine_topk_pq(corpus, q, k=10, m=8, ks=16, rerank=50).collect()
    assert _rank1_recall(rows, n_plant, offset) >= 0.9


def test_simsearch_pq_full_rerank_equals_exact(spark, sf_dir):
    """With rerank >= corpus size every row is re-ranked exactly, so PQ
    quantization error cannot change the result — must equal brute force
    (the PQ analog of IVF's exhaustive-probe gate)."""
    from sparkplug_spark.operators import cosine_topk, cosine_topk_pq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n = corpus.count()
    exact = {tuple(r) for r in cosine_topk(corpus, q, k=10).collect()}
    pq = {
        tuple(r)
        for r in cosine_topk_pq(corpus, q, k=10, m=8, ks=16, rerank=n).collect()
    }
    assert pq == exact


def test_emb_similar_pairs_lsh_recall(spark, sf_dir):
    from sparkplug_spark.operators import embedding_near_dup_pairs

    corpus, _, n_plant, offset = _planted(spark, sf_dir)
    brute = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            corpus, threshold=0.95, brute_force=True
        ).collect()
    }
    planted_pairs = {p for p in brute if p[1] >= offset}
    assert len(planted_pairs) == n_plant  # every plant is a >=0.95 pair
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            corpus, threshold=0.95, num_planes=64, bands=8
        ).collect()
    }
    assert lsh <= brute  # exact verify => no false positives
    assert len(lsh & planted_pairs) / n_plant >= 0.9


def test_minhash_ml_seeded_recall(spark):
    from sparkplug_spark.operators import jaccard_ngram_pairs, minhash_lsh_pairs_ml

    import random

    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(500)]
    rows = []
    for i in range(60):
        base = [rng.choice(vocab) for _ in range(40)]
        mut = list(base)
        for j in rng.sample(range(40), 4):  # 10% token edits
            mut[j] = rng.choice(vocab)
        rows.append((2 * i, " ".join(base)))
        rows.append((2 * i + 1, " ".join(mut)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    truth = {
        (r["id_a"], r["id_b"])
        for r in jaccard_ngram_pairs(df, threshold=0.6, max_key_freq=0).collect()
    }
    assert truth  # the seeding must actually produce >=0.6-jaccard pairs
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs_ml(df, max_jaccard_distance=0.4).collect()
    }
    assert len(got & truth) / len(truth) >= 0.9


def test_emb_frozen_recall_and_exactness(spark, sf_dir):
    """Frozen-bucket tier (E6 oracle tier): subset of brute force (exact
    verify => no false positives), >=0.9 recall on planted near-dups,
    and bit-identical across runs (integer buckets are deterministic)."""
    from sparkplug_spark.operators import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_frozen,
    )

    corpus, _, n_plant, offset = _planted(spark, sf_dir)
    brute = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            corpus, threshold=0.95, brute_force=True
        ).collect()
    }
    planted_pairs = {p for p in brute if p[1] >= offset}
    frozen_rows = embedding_near_dup_pairs_frozen(
        corpus, threshold=0.95, num_planes=64, bands=8
    ).collect()
    frozen = {(r["id_a"], r["id_b"]) for r in frozen_rows}
    assert frozen <= brute
    assert len(frozen & planted_pairs) / n_plant >= 0.9
    again = {
        tuple(r)
        for r in embedding_near_dup_pairs_frozen(
            corpus, threshold=0.95, num_planes=64, bands=8
        ).collect()
    }
    assert again == {tuple(r) for r in frozen_rows}


def test_emb_frozen_headroom_preflight(spark):
    """Components too large for the int64 sign dot must fail loudly with
    a suggested quant_unit, not wrap silently."""
    import pytest

    from sparkplug_spark.operators import embedding_near_dup_pairs_frozen

    big = spark.createDataFrame(
        [(i, [float(1e9)] * 4) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="quant_unit"):
        embedding_near_dup_pairs_frozen(big, num_planes=8, bands=2)


def _anisotropic_fixture(spark):
    """Energy concentrated in the first 8 dims (all landing in PQ
    subspace 0 under the identity split) + tiny noise elsewhere: the
    corpus shape where plain PQ wastes 7 of 8 codebooks and OPQ's
    eigenvalue allocation spreads the signal one-direction-per-subspace."""
    import numpy as np

    rng = np.random.RandomState(7)
    n, dim = 400, 64
    base = np.zeros((n, dim))
    base[:, :8] = rng.randn(n, 8) * 10.0
    base[:, 8:] = rng.randn(n, dim - 8) * 0.05
    plants = [
        (1000 + j, (base[j] + rng.randn(dim) * 0.15).tolist())
        for j in range(40)
    ]
    rows = [(i, base[i].tolist()) for i in range(n)]
    corpus = spark.createDataFrame(
        rows + plants, "vec_id long, embedding array<double>"
    )
    q = spark.createDataFrame(
        plants, "vec_id long, embedding array<double>"
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    return corpus, q


def _partner_recall(df):
    byq = {}
    for r in df.collect():
        byq.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return sum(1 for qid, s in byq.items() if (qid - 1000) in s) / len(byq)


def test_opq_beats_pq_on_anisotropic_corpus(spark):
    """The OPQ selling point, pinned: same m/ks/rerank budget, strictly
    better recall than unrotated PQ on the anisotropic fixture (the whole
    pipeline is seeded/deterministic, so strict inequality is stable)."""
    from sparkplug_spark.operators import cosine_topk_opq, cosine_topk_pq

    corpus, q = _anisotropic_fixture(spark)
    pq = _partner_recall(
        cosine_topk_pq(corpus, q, k=10, m=8, ks=16, rerank=15)
    )
    opq = _partner_recall(
        cosine_topk_opq(corpus, q, k=10, m=8, ks=16, rerank=15)
    )
    assert opq > pq
    assert opq >= 0.95


def test_opq_rotation_is_orthonormal_and_frozen(spark):
    import numpy as np

    from sparkplug_spark.operators import opq_rotation

    corpus, _ = _anisotropic_fixture(spark)
    r1 = opq_rotation(corpus, m=8)
    assert r1.shape == (64, 64)
    assert np.allclose(r1 @ r1.T, np.eye(64), atol=1e-9)
    r2 = opq_rotation(corpus.repartition(13), m=8)
    assert np.array_equal(r1, r2)  # 9-sig moment quantization freezes it


def test_opq_full_rerank_equals_exact(spark, sf_dir):
    """rerank >= corpus size re-ranks every row exactly; the rotation
    cannot change the output (cosine is rotation-invariant) — must equal
    brute force, the oracle row's justification."""
    from sparkplug_spark.operators import cosine_topk, cosine_topk_opq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n = emb.count()
    exact = {tuple(r) for r in cosine_topk(emb, q, k=10).collect()}
    opq = {
        tuple(r)
        for r in cosine_topk_opq(emb, q, k=10, m=8, ks=16, rerank=n).collect()
    }
    assert opq == exact


def test_lsh_frozen_topk_recall_and_exactness(spark, sf_dir):
    """Frozen-bucket LSH top-k (E9d): rank-1 self-hit always present (a
    vector shares every band with itself), >=0.9 planted-NN recall at
    64/8 geometry, and bit-identical across runs."""
    from sparkplug_spark.operators import cosine_topk_lsh_frozen

    corpus, planted_df, n_plant, offset = _planted(spark, sf_dir)
    q = planted_df.select(F.col("vec_id").alias("query_id"), "embedding")
    rows = cosine_topk_lsh_frozen(
        corpus, q, k=10, num_planes=64, bands=8
    ).collect()
    assert _rank1_recall(rows, n_plant, offset) >= 0.9
    again = cosine_topk_lsh_frozen(
        corpus, q, k=10, num_planes=64, bands=8
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
