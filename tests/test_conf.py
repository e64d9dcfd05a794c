"""recommended_conf sanity: partition math scales with input and respects
executor memory bounds."""

import pytest

from sparkplug_spark import recommended_conf

GB = 1 << 30
TB = 1 << 40


def test_scales_with_input():
    small = recommended_conf(10 * GB)
    big = recommended_conf(100 * TB)
    assert int(small["spark.sql.shuffle.partitions"]) < int(
        big["spark.sql.shuffle.partitions"]
    )
    # 100 TB at 128 MB/partition ≈ 800k, capped at 200k
    assert int(big["spark.sql.shuffle.partitions"]) == 200_000


def test_floor_from_cluster_shape():
    c = recommended_conf(1 * GB, executor_cores=4, num_executors=1000)
    # ≥ 2 task waves on 4000 cores even though the input is tiny
    assert int(c["spark.sql.shuffle.partitions"]) >= 8000


def test_aqe_on_and_rejects_garbage():
    c = recommended_conf(1 * GB)
    assert c["spark.sql.adaptive.enabled"] == "true"
    assert c["spark.sql.adaptive.skewJoin.enabled"] == "true"
    with pytest.raises(ValueError):
        recommended_conf(0)
