"""Atomic manifest-pointer store publish: crash-point contract — a kill
between ANY two steps leaves the store serving a complete version (old
until the pointer lands, new after), never half."""

import os

import pytest

from sparkplug_spark.sources import (
    manifest_publish,
    manifest_resolve,
    read_store,
)
from sparkplug_spark.sources import (
    _manifest_commit,
    _manifest_gc,
    _manifest_write_version,
)


def _write(df):
    return lambda tmp: df.write.mode("overwrite").parquet(tmp)


def _vals(spark, path):
    return sorted(r["v"] for r in read_store(spark, path).collect())


class TestManifestPublish:
    def test_publish_and_read(self, spark, tmp_path):
        store = str(tmp_path / "s")
        manifest_publish(spark, store, _write(spark.range(3).selectExpr("id AS v")))
        assert _vals(spark, store) == [0, 1, 2]
        live = manifest_resolve(spark, store)
        assert live.endswith("_v00000001")

    def test_crash_between_write_and_commit_serves_old(self, spark, tmp_path):
        store = str(tmp_path / "s")
        manifest_publish(spark, store, _write(spark.range(2).selectExpr("id AS v")))
        # crash point: the new version is fully written (+_COMMITTED) but
        # the pointer never landed
        vname = _manifest_write_version(
            spark, store, _write(spark.range(10, 13).selectExpr("id AS v"))
        )
        assert _vals(spark, store) == [0, 1]  # still the OLD version
        # recovery = simply completing the publish (idempotent steps)
        _manifest_commit(spark, store, vname)
        assert _vals(spark, store) == [10, 11, 12]
        _manifest_gc(spark, store)
        assert manifest_resolve(spark, store).endswith(vname)

    def test_crash_during_write_fn_serves_old_and_next_publish_heals(
        self, spark, tmp_path
    ):
        store = str(tmp_path / "s")
        manifest_publish(spark, store, _write(spark.range(2).selectExpr("id AS v")))

        def boom(tmp):
            spark.range(1).write.mode("overwrite").parquet(tmp)  # partial
            raise RuntimeError("writer died")

        with pytest.raises(RuntimeError):
            manifest_publish(spark, store, boom)
        assert _vals(spark, store) == [0, 1]  # old still served
        manifest_publish(spark, store, _write(spark.range(5, 7).selectExpr("id AS v")))
        assert _vals(spark, store) == [5, 6]

    def test_first_publish_crash_before_pointer(self, spark, tmp_path):
        # no pointer yet: the highest _COMMITTED version is served (the
        # fallback that also covers non-atomic-rename filesystems)
        store = str(tmp_path / "s")
        _manifest_write_version(
            spark, store, _write(spark.range(4).selectExpr("id AS v"))
        )
        assert _vals(spark, store) == [0, 1, 2, 3]

    def test_gc_keeps_live_and_requested_history(self, spark, tmp_path):
        store = str(tmp_path / "s")
        for k in range(4):
            manifest_publish(
                spark,
                store,
                _write(spark.range(k, k + 1).selectExpr("id AS v")),
                keep_versions=2,
            )
        dirs = sorted(
            d for d in os.listdir(store) if d.startswith("_v")
        )
        assert len(dirs) == 2 and dirs[-1] == "_v00000004"
        assert _vals(spark, store) == [3]

    def test_read_store_legacy_fallback(self, spark, tmp_path):
        flat = str(tmp_path / "flat")
        spark.range(3).selectExpr("id AS v").write.parquet(flat)
        assert _vals(spark, flat) == [0, 1, 2]

    def test_compact_manifest_store_is_atomic_versioned(self, spark, tmp_path):
        from sparkplug_spark.sources import compact_table

        store = str(tmp_path / "s")
        manifest_publish(
            spark,
            store,
            lambda tmp: spark.range(100)
            .selectExpr("id AS v")
            .repartition(8)
            .write.mode("overwrite")
            .parquet(tmp),
        )
        stats = compact_table(spark, store)
        assert stats["files_before"] == 8
        assert stats["files_after"] < 8
        assert manifest_resolve(spark, store).endswith("_v00000002")
        assert len(_vals(spark, store)) == 100
