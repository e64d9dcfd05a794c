"""E133 DSIR importance weights: target-like docs score higher, integer
micro-nat exactness, partitioning independence."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import importance_weights


def _corpus(spark):
    tgt = "clean prose sentence with varied words number {}"
    raw = "spam spam buy now click here spam {}"
    rows = [(i, tgt.format(i), "good") for i in range(8)]
    rows += [(100 + i, raw.format(i), "junk") for i in range(8)]
    # a raw doc that LOOKS like the target domain
    rows.append((200, tgt.format("x"), "junk"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


class TestImportanceWeights:
    def test_target_like_raw_doc_outscores_junk(self, spark):
        out = {
            r["doc_id"]: r
            for r in importance_weights(
                _corpus(spark), F.col("source") == "good", buckets=1024
            ).collect()
        }
        lookalike = out[200]["log_weight_micros"]
        junk = [out[100 + i]["log_weight_micros"] for i in range(8)]
        assert all(lookalike > j for j in junk)
        assert out[200]["is_target"] is False
        assert out[0]["is_target"] is True

    def test_partitioning_independent(self, spark):
        df = _corpus(spark)
        a = {
            r["doc_id"]: r["log_weight_micros"]
            for r in importance_weights(
                df.repartition(1), F.col("source") == "good", buckets=512
            ).collect()
        }
        b = {
            r["doc_id"]: r["log_weight_micros"]
            for r in importance_weights(
                df.repartition(9), F.col("source") == "good", buckets=512
            ).collect()
        }
        assert a == b

    def test_feature_count_is_unigrams_plus_bigrams(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c", "good")], "doc_id long, text string, source string"
        )
        out = importance_weights(
            df, F.col("source") == "good", buckets=64
        ).collect()[0]
        # 3 unigrams + 2 bigrams
        assert out["n_features"] == 5

    def test_rejects_bad_buckets(self, spark):
        df = spark.createDataFrame(
            [(1, "a", "g")], "doc_id long, text string, source string"
        )
        with pytest.raises(ValueError):
            importance_weights(df, F.col("source") == "g", buckets=1)
