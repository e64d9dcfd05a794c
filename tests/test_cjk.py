"""Script-aware tokenization gate (CJK/Kana/Hangul/Thai).

The r9 advice item: a Chinese/Japanese/Thai document must no longer
collapse to ~1 giant token (or, worse, an empty token stream) — the
canonical normalize keeps no-whitespace-script chars and splits each
into its own token, identically in the Python twin, the JVM column
expression, the Arrow kernels, and the DuckDB oracle normalize.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from sparkplug_spark.functions.text import (
    CJK_RANGES,
    norm_py,
    norm_tokens_py,
    tokens,
    tokens_pd,
    word_shingles_pd,
)

MIXED = [
    "Hello, 世界! ทดสอบ 東京タワー 한국어",
    "我爱数据处理引擎，速度很快。",
    "日本語のテキストです。句読点も「あり」ます",
    "ภาษาไทยไม่มีช่องว่างระหว่างคำ",
    "한국어 문장은 공백이 있지만 음절 단위가 유용하다",
    "plain latin text only, with punct!",
    "mixed 中文 and english 混合 text",
    "",
    "、。「」！？",  # CJK punctuation only — all stripped
]


class TestScriptAwareTokens:
    def test_cjk_text_is_not_one_token(self):
        toks = norm_tokens_py("我爱数据处理引擎，速度很快。")
        assert len(toks) == 12  # one token per ideograph, punct stripped
        assert all(len(t) == 1 for t in toks)
        # Thai: char units (combining marks split — documented trade)
        assert len(norm_tokens_py("ภาษาไทยไม่มีช่องว่าง")) > 10

    def test_latin_unchanged(self):
        assert norm_tokens_py("The cat, sat. ON the mat!") == [
            "the", "cat", "sat", "on", "the", "mat",
        ]

    def test_ranges_are_disjoint_and_sorted(self):
        flat = [x for a, b in CJK_RANGES for x in (a, b)]
        assert flat == sorted(flat)
        for a, b in CJK_RANGES:
            assert a < b

    def test_python_jvm_kernel_duckdb_parity(self, spark):
        df = spark.createDataFrame([(s,) for s in MIXED], "text string")
        rows = df.select(
            "text",
            tokens(F.col("text")).alias("jvm"),
            tokens_pd(F.col("text")).alias("pd"),
        ).collect()
        import __spark_entry__ as entry

        con = duckdb.connect()
        for r in rows:
            want = norm_tokens_py(r["text"])
            assert r["jvm"] == want, r["text"]
            assert r["pd"] == want, r["text"]
            lit = "'" + r["text"].replace("'", "''") + "'"
            got = con.sql(
                "SELECT " + entry._sql_tokens(lit) + " AS t"
            ).fetchone()[0]
            assert got == want, r["text"]

    def test_shingles_are_char_ngrams_for_cjk(self, spark):
        df = spark.createDataFrame([("我爱数据处理",)], "text string")
        (row,) = df.select(
            word_shingles_pd(F.col("text"), 3).alias("sh")
        ).collect()
        assert row["sh"] == ["我 爱 数", "爱 数 据", "数 据 处", "据 处 理"]

    def test_jaccard_fires_on_cjk_near_dups(self, spark):
        from sparkplug_spark.operators import jaccard_ngram_pairs

        base = "我爱数据处理引擎速度很快它在大规模集群上运行良好并且结果是确定性的"
        df = spark.createDataFrame(
            [(1, base), (2, base + "附加"), (3, "完全不同的另一篇文档内容")],
            "doc_id long, text string",
        )
        pairs = jaccard_ngram_pairs(
            df, n=3, threshold=0.5, max_key_freq=100
        ).collect()
        assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
        assert pairs[0]["jaccard"] > 0.8

    def test_empty_and_punct_only_normalize_to_empty(self):
        assert norm_py("") == ""
        assert norm_py("、。「」！？") == ""
