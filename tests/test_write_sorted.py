"""write_sorted: file-level min/max slices must be narrow and
non-overlapping so parquet footer stats prune selective scans."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from sparkplug_spark.sources import write_sorted


def _file_ranges(path, col):
    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        ranges.append((lo, hi))
    return sorted(ranges)


def test_write_sorted_slices_do_not_overlap(spark, tmp_path, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "sorted_docs")
    write_sorted(docs, out, ["doc_id"], num_files=4)

    ranges = _file_ranges(out, "doc_id")
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # consecutive slices don't interleave
    # a point-range filter overlaps exactly one file's slice
    probe_lo, probe_hi = ranges[0][0], ranges[0][1]
    overlapping = [r for r in ranges if r[0] <= probe_hi and r[1] >= probe_lo]
    assert len(overlapping) == 1

    # the filtered read returns the right rows and pushes the predicate
    got = spark.read.parquet(out).filter(f"doc_id <= {probe_hi}")
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [IsNotNull(doc_id), LessThanOrEqual(doc_id" in plan
    assert got.count() == docs.filter(f"doc_id <= {probe_hi}").count()


def test_write_zordered_prunes_both_dims(spark, tmp_path, sf_dir):
    from sparkplug_spark.sources import write_zordered

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    out = str(tmp_path / "zorders")
    write_zordered(orders, out, ["o_custkey", "o_orderkey"], bits=8, num_files=16)

    assert spark.read.parquet(out).count() == orders.count()
    for col, domain_hi in [("o_custkey", 149), ("o_orderkey", 1499)]:
        ranges = _file_ranges(out, col)
        assert len(ranges) >= 8
        # a probe over the lowest 1/8 of the domain must overlap only a
        # minority of files — the point of interleaving: BOTH columns
        # keep file-level locality, which a single-column sort can't do
        probe_hi = domain_hi // 8
        overlapping = [r for r in ranges if r[0] <= probe_hi]
        assert len(overlapping) <= len(ranges) // 2, (col, ranges)


def test_zorder_value_math(spark):
    from sparkplug_spark.sources import zorder_value

    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3)], ["a", "b"]
    )
    z = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn("z", zorder_value(df, ["a", "b"], bits=2)).collect()
    }
    # 2-bit buckets over domain [0,3]: value == bucket; interleave a into
    # even bit positions, b into odd
    assert z[(0, 0)] == 0
    assert z[(3, 0)] == 0b0101
    assert z[(0, 3)] == 0b1010
    assert z[(3, 3)] == 0b1111
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bits"):
        zorder_value(df, ["a", "b"], bits=40)


def test_zorder_wide_domain_no_overflow(spark):
    from sparkplug_spark.sources import zorder_value

    # epoch-micros-scale spans (~2^50) overflowed the old (v-lo)*2^bits
    # formulation; the chunk-div form must stay exact and in-range
    lo, hi = 1_600_000_000_000_000, 1_600_000_000_000_000 + (1 << 50)
    df = spark.createDataFrame(
        [(lo, 0), (lo + (1 << 49), 500), (hi, 1000)], ["t", "v"]
    )
    got = sorted(
        r["z"] for r in df.withColumn(
            "z", zorder_value(df, ["t", "v"], bits=16)
        ).collect()
    )
    assert all(z >= 0 for z in got)
    assert got[0] < got[1] < got[2]  # larger (t, v) -> larger z here


def test_write_sorted_validates(spark, tmp_path):
    df = spark.range(10)
    with pytest.raises(ValueError, match="non-empty"):
        write_sorted(df, str(tmp_path / "x"), [])


class TestCompactTable:
    def test_compacts_small_files(self, spark, tmp_path):
        from sparkplug_spark.sources import compact_table

        path = str(tmp_path / "frag")
        # 16 tiny files
        spark.range(0, 1600).repartition(16).write.parquet(path)
        before = {
            tuple(r) for r in spark.read.parquet(path).collect()
        }
        stats = compact_table(spark, path, target_file_bytes=1 << 30)
        assert stats["files_before"] == 16
        assert stats["files_after"] == 1
        after = {tuple(r) for r in spark.read.parquet(path).collect()}
        assert after == before
        # no leftover tmp/old dirs
        import os
        assert not os.path.exists(path + ".compact_tmp")
        assert not os.path.exists(path + ".compact_old")

    def test_respects_target_size(self, spark, tmp_path):
        from sparkplug_spark.sources import compact_table

        path = str(tmp_path / "frag2")
        spark.range(0, 20_000).repartition(20).write.parquet(path)
        import glob
        total = sum(
            __import__("os").path.getsize(f)
            for f in glob.glob(path + "/*.parquet")
        )
        stats = compact_table(spark, path, target_file_bytes=total // 3)
        assert 2 <= stats["files_after"] <= 5
        assert spark.read.parquet(path).count() == 20_000

    def test_rejects_bad_target(self, spark, tmp_path):
        from sparkplug_spark.sources import compact_table

        with pytest.raises(ValueError):
            compact_table(spark, str(tmp_path), target_file_bytes=0)


class TestSchemaDrift:
    def test_reports_added_removed_changed(self, spark):
        from sparkplug_spark.sources import schema_drift

        old = spark.createDataFrame(
            [(1, "a", 1.0)], "id long, name string, score double"
        )
        new = spark.createDataFrame(
            [(1, "a", 2, True)], "id long, name string, score int, ok boolean"
        )
        drift = schema_drift(old, new)
        by_col = {d["column"]: d for d in drift}
        assert by_col["score"]["status"] == "type_changed"
        assert by_col["score"]["old_type"] == "double"
        assert by_col["score"]["new_type"] == "int"
        assert by_col["ok"]["status"] == "added"
        assert len(drift) == 2

    def test_removed_and_identical(self, spark):
        from sparkplug_spark.sources import schema_drift

        old = spark.createDataFrame([(1, "a")], "id long, name string")
        new = spark.createDataFrame([(1,)], "id long")
        assert schema_drift(old, new) == [
            {"column": "name", "status": "removed",
             "old_type": "string", "new_type": None}
        ]
        assert schema_drift(old, old) == []

    def test_refuses_partitioned_layout(self, spark, tmp_path):
        from sparkplug_spark.sources import compact_table

        path = str(tmp_path / "parted")
        spark.range(0, 100).withColumn(
            "dt", (F.col("id") % 2).cast("string")
        ).write.partitionBy("dt").parquet(path)
        with pytest.raises(ValueError, match="partitioned"):
            compact_table(spark, path)
        # each partition dir is flat -> compactable individually
        stats = compact_table(spark, path + "/dt=0", target_file_bytes=1 << 30)
        assert stats["files_after"] == 1
