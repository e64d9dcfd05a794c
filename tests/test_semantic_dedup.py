"""SemDeDup-style semantic dedup: greedy prefix contract vs NumPy twin."""

import random

import numpy as np
import pytest

from sparkplug_spark.operators import semantic_dedup

SCHEMA = "vec_id long, embedding array<float>"


def _twin(rows, centers, thr):
    """Assign by max cosine to centers, then greedy prefix prune by id."""
    X = np.array([v for _, v in rows], dtype=np.float64)
    n = np.linalg.norm(X, axis=1)
    n[n == 0] = 1.0
    Xn = X / n[:, None]
    lab = np.argmax(Xn @ centers.T, axis=1)
    kept = {}
    for cid in sorted(set(lab)):
        idxs = sorted(
            (i for i in range(len(rows)) if lab[i] == cid),
            key=lambda i: rows[i][0],
        )
        chosen = []
        for i in idxs:
            if all(float(Xn[i] @ Xn[j]) < thr for j in chosen):
                chosen.append(i)
                kept[rows[i][0]] = True
            else:
                kept[rows[i][0]] = False
    return kept


class TestSemanticDedup:
    def test_exact_duplicates_collapse(self, spark):
        base = [1.0, 0.0, 0.0, 0.0]
        rows = [(3, base), (1, base), (2, [0.0, 1.0, 0.0, 0.0])]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {r["id"]: r["kept"] for r in semantic_dedup(df, threshold=0.99, num_clusters=1).collect()}
        # smallest id of the duplicate pair survives; orthogonal row survives
        assert out == {1: True, 2: True, 3: False}

    def test_threshold_above_one_keeps_all(self, spark):
        rows = [(i, [1.0, 0.0]) for i in range(5)]
        df = spark.createDataFrame(rows, SCHEMA)
        out = semantic_dedup(df, threshold=1.0 + 1e-9, num_clusters=1).collect()
        assert all(r["kept"] for r in out)

    def test_threshold_minus_one_keeps_one_per_cluster(self, spark):
        rows = [(i, [float(i + 1), 1.0]) for i in range(6)]
        df = spark.createDataFrame(rows, SCHEMA)
        out = semantic_dedup(df, threshold=-1.0, num_clusters=1).collect()
        assert sum(r["kept"] for r in out) == 1
        assert {r["id"] for r in out if r["kept"]} == {0}

    @pytest.mark.parametrize("seed", [4, 17])
    def test_matches_numpy_twin(self, spark, seed):
        rng = random.Random(seed)
        # clumpy data: a few base directions plus small jitter
        bases = [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]]
        rows = []
        for i in range(120):
            b = rng.choice(bases)
            rows.append(
                (i, [c + rng.uniform(-0.15, 0.15) for c in b])
            )
        df = spark.createDataFrame(rows, SCHEMA)
        thr, k = 0.97, 3
        got = {
            r["id"]: r["kept"]
            for r in semantic_dedup(df, threshold=thr, num_clusters=k, seed=7).collect()
        }
        # rebuild the operator's own centers deterministically
        from sparkplug_spark.operators.similarity import _spherical_lloyd

        X = np.array([v for _, v in rows], dtype=np.float64)
        centers = _spherical_lloyd(X[: k * 128], k, seed=7)
        want = _twin(rows, centers, thr)
        assert got == want

    def test_decision_table_covers_all_rows(self, spark):
        rows = [(i, [float(i % 7), 1.0, 0.5]) for i in range(40)]
        df = spark.createDataFrame(rows, SCHEMA)
        out = semantic_dedup(df, threshold=0.999, num_clusters=4).collect()
        assert len(out) == 40 and len({r["id"] for r in out}) == 40

    def test_guards(self, spark):
        df = spark.createDataFrame([(1, [1.0, 0.0])], SCHEMA)
        with pytest.raises(ValueError):
            semantic_dedup(df, threshold=-2.0)
        with pytest.raises(ValueError):
            semantic_dedup(df, num_clusters=0)


class TestIncrementalSemanticDedup:
    def test_store_roundtrip_and_screen(self, spark, tmp_path):
        import numpy as np

        from sparkplug_spark.operators import (
            build_semantic_store,
            semantic_dedup_against,
        )

        corpus = spark.createDataFrame(
            [
                (1, [1.0, 0.0, 0.0]),
                (2, [0.0, 1.0, 0.0]),
                (3, [0.99, 0.1, 0.0]),  # near-dup of 1, dropped from kept
            ],
            SCHEMA,
        )
        centroids, kept = build_semantic_store(
            corpus, threshold=0.95, num_clusters=2, seed=3
        )
        cpath, kpath = str(tmp_path / "cent"), str(tmp_path / "kept")
        centroids.write.parquet(cpath)
        kept.write.parquet(kpath)
        centroids2 = spark.read.parquet(cpath)
        kept2 = spark.read.parquet(kpath)
        # batch: one near-dup of vector 1, one novel direction
        batch = spark.createDataFrame(
            [(10, [0.995, 0.05, 0.0]), (11, [0.0, 0.0, 1.0])], SCHEMA
        )
        out = {
            r["id"]: (r["is_near_dup"], r["near_dup_of"])
            for r in semantic_dedup_against(
                batch, centroids2, kept2, threshold=0.95
            ).collect()
        }
        assert out[10] == (True, 1)
        assert out[11] == (False, None)

    def test_batch_rows_not_compared_to_each_other(self, spark):
        from sparkplug_spark.operators import (
            build_semantic_store,
            semantic_dedup_against,
        )

        corpus = spark.createDataFrame([(1, [0.0, 1.0])], SCHEMA)
        centroids, kept = build_semantic_store(corpus, num_clusters=1)
        batch = spark.createDataFrame(
            [(10, [1.0, 0.0]), (11, [1.0, 0.0])], SCHEMA  # mutual dups
        )
        out = semantic_dedup_against(batch, centroids, kept, threshold=0.9)
        assert all(not r["is_near_dup"] for r in out.collect())

    def test_tie_breaks_to_smallest_rep_id(self, spark):
        from sparkplug_spark.operators import semantic_dedup_against

        centroids = spark.createDataFrame(
            [(0, [1.0, 0.0])], "cluster int, centroid array<double>"
        )
        kept = spark.createDataFrame(
            [(0, 7, [1.0, 0.0]), (0, 3, [1.0, 0.0])],
            "cluster int, id long, vec array<float>",
        )
        batch = spark.createDataFrame([(99, [1.0, 0.0])], SCHEMA)
        [r] = semantic_dedup_against(batch, centroids, kept, threshold=0.9).collect()
        assert (r["is_near_dup"], r["near_dup_of"]) == (True, 3)

    def test_empty_centroids_rejected(self, spark):
        import pytest as _pytest

        from sparkplug_spark.operators import semantic_dedup_against

        empty_c = spark.createDataFrame([], "cluster int, centroid array<double>")
        kept = spark.createDataFrame([], "cluster int, id long, vec array<float>")
        batch = spark.createDataFrame([(1, [1.0])], SCHEMA)
        with _pytest.raises(ValueError):
            semantic_dedup_against(batch, empty_c, kept)


class TestStreamingSemanticFlags:
    def test_stream_foreachbatch(self, spark, tmp_path):
        from sparkplug_spark.operators import build_semantic_store
        from sparkplug_spark.streaming import streaming_semantic_flags

        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])], SCHEMA
        )
        centroids, kept = build_semantic_store(
            corpus, threshold=0.95, num_clusters=2
        )
        src = str(tmp_path / "sem_src")
        spark.createDataFrame(
            [(10, [0.999, 0.01]), (11, [0.7, -0.7])], SCHEMA
        ).coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(
            "vec_id long, embedding array<float>"
        ).parquet(src)
        got = {}

        def sink(df, batch_id):
            for r in df.collect():
                got[r["id"]] = (r["is_near_dup"], r["near_dup_of"])

        q = (
            streaming_semantic_flags(stream, centroids, kept, sink, threshold=0.95)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert got[10] == (True, 1)
        assert got[11] == (False, None)


class TestSemanticDedupFrozen:
    """Frozen-center oracle tiers: deterministic assignment + greedy."""

    def test_matches_batch_twin_on_frozen_centers(self, spark):
        rng = np.random.default_rng(11)
        rows = [
            (i, (rng.normal(size=6) * 3).round(2).tolist()) for i in range(60)
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        centers_rows = rows[:4]
        centers = spark.createDataFrame(centers_rows, SCHEMA)
        C = np.array([v for _, v in centers_rows], dtype=np.float64)
        C = C / np.linalg.norm(C, axis=1)[:, None]
        from sparkplug_spark.operators import semantic_dedup_frozen

        out = {
            r["id"]: (r["cluster_id"], r["kept"])
            for r in semantic_dedup_frozen(df, centers, threshold=0.6).collect()
        }
        twin_kept = _twin(rows, C, 0.6)
        assert len(out) == len(rows)
        # greedy decisions agree with the dense twin (rounded cosines can
        # only differ from raw at the 1e-6 boundary — not hit here)
        assert {k: v[1] for k, v in out.items()} == twin_kept

    def test_first_member_always_kept_and_dups_drop(self, spark):
        from sparkplug_spark.operators import semantic_dedup_frozen

        base = [1.0, 0.0, 0.0]
        rows = [(5, base), (2, base), (9, [0.0, 1.0, 0.0])]
        df = spark.createDataFrame(rows, SCHEMA)
        centers = spark.createDataFrame([(0, base)], SCHEMA)
        out = {
            r["id"]: r["kept"]
            for r in semantic_dedup_frozen(df, centers, threshold=0.9).collect()
        }
        assert out == {2: True, 5: False, 9: True}

    def test_against_frozen_screen_and_ties(self, spark):
        from sparkplug_spark.operators import semantic_dedup_against_frozen

        centers = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0])], SCHEMA
        )
        kept = spark.createDataFrame(
            [(0, 10, [1.0, 0.0]), (0, 11, [1.0, 0.0]), (1, 20, [0.0, 1.0])],
            "cluster_id long, id long, vec array<float>",
        )
        batch = spark.createDataFrame(
            [(100, [0.99, 0.01]), (101, [-1.0, 0.05]), (102, [0.0, 2.0])],
            SCHEMA,
        )
        out = {
            r["id"]: (r["cluster_id"], r["is_near_dup"], r["near_dup_of"])
            for r in semantic_dedup_against_frozen(
                batch, centers, kept, threshold=0.9
            ).collect()
        }
        # 100: near-dup of BOTH reps 10 and 11 (identical cosine) -> tie
        # breaks to the smallest rep id
        assert out[100] == (0, True, 10)
        # 101: assigned to cluster 1 (cos to center0 negative), clean
        assert out[101][1] is False and out[101][2] is None
        # 102: exact match of rep 20
        assert out[102] == (1, True, 20)

    def test_frozen_threshold_guard(self, spark):
        from sparkplug_spark.operators import semantic_dedup_frozen

        df = spark.createDataFrame([(1, [1.0, 0.0])], SCHEMA)
        with pytest.raises(ValueError, match="threshold"):
            semantic_dedup_frozen(df, df, threshold=1.5)
