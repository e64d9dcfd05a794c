"""Property-based equivalence of the Arrow (pandas) kernels and their JVM
expression twins.  Oracle parity rests on these pairs producing identical
values — the DuckDB SQL mirrors the JVM form, while hot paths run the
Arrow form, so any divergence would silently break hash-matching.

Strings are drawn adversarially (unicode, control chars, repeated spaces,
empty) by hypothesis; each batch round-trips through one Spark job."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from sparkplug_spark.functions.text import (
    simhash32,
    simhash32_pd,
    simhash64_pd,
    tokens,
    tokens_pd,
    word_shingles,
    word_shingles_pd,
)

texts = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
        max_size=80,
    ),
    min_size=1,
    max_size=12,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["i", "t"]
    )


@settings(**_SETTINGS)
@given(texts)
def test_tokens_pd_equals_jvm(spark, docs):
    rows = (
        _df(spark, docs)
        .select("i", tokens(F.col("t")).alias("a"), tokens_pd("t").alias("b"))
        .collect()
    )
    for r in rows:
        assert r["a"] == r["b"], docs[r["i"]]


@settings(**_SETTINGS)
@given(texts)
def test_shingles_pd_equals_jvm(spark, docs):
    rows = (
        _df(spark, docs)
        .select(
            "i",
            word_shingles(F.col("t"), 3).alias("a"),
            word_shingles_pd("t", 3).alias("b"),
        )
        .collect()
    )
    for r in rows:
        assert r["a"] == r["b"], docs[r["i"]]


@settings(**_SETTINGS)
@given(texts)
def test_simhash32_pd_equals_jvm(spark, docs):
    rows = (
        _df(spark, docs)
        .select(
            "i",
            simhash32(F.col("t")).alias("a"),
            simhash32_pd("t").alias("b"),
        )
        .collect()
    )
    for r in rows:
        assert r["a"] == r["b"], docs[r["i"]]


@settings(**_SETTINGS)
@given(texts)
def test_simhash64_matches_reference_fold(spark, docs):
    """simhash64_pd against an independent pure-Python reimplementation
    (no numpy, no caching) — guards the vectorized bit math."""
    import hashlib

    from sparkplug_spark.functions.text import CJK_RANGES

    def ref_norm(text):
        # independent char-loop reimplementation of the canonical
        # normalize (keep latin/digit/space, pad no-whitespace-script
        # chars into standalone tokens, drop the rest, squash spaces)
        out = []
        for ch in (text or "").lower():
            o = ord(ch)
            if "a" <= ch <= "z" or "0" <= ch <= "9" or ch == " ":
                out.append(ch)
            elif any(a <= o <= b for a, b in CJK_RANGES):
                out.append(f" {ch} ")
            else:
                out.append(" ")
        return " ".join(p for p in "".join(out).split(" ") if p)

    def ref(text):
        norm = ref_norm(text)
        votes = [0] * 64
        for tok in norm.split(" "):
            hx = hashlib.md5(tok.encode()).hexdigest()
            h = (int(hx[8:16], 16) << 32) | int(hx[:8], 16)
            for j in range(64):
                votes[j] += 1 if (h >> j) & 1 else -1
        packed = sum(1 << j for j in range(64) if votes[j] > 0)
        return packed - (1 << 64) if packed >= (1 << 63) else packed

    rows = _df(spark, docs).select("i", simhash64_pd("t").alias("b")).collect()
    for r in rows:
        assert r["b"] == ref(docs[r["i"]]), docs[r["i"]]


class TestChunkingProperties:
    """chunk_documents invariants: coverage (every token appears), stride
    positioning, and exact reconstruction with zero overlap."""

    def test_zero_overlap_reconstructs_token_stream(self, spark):
        from sparkplug_spark.operators import chunk_documents
        from sparkplug_spark.functions.text import tokens_pd
        from pyspark.sql import functions as F

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        chunks = chunk_documents(docs, chunk_tokens=32, overlap=0)
        rebuilt = (
            chunks.groupBy("doc_id")
            .agg(
                F.array_join(
                    F.flatten(
                        F.transform(
                            F.array_sort(
                                F.collect_list(
                                    F.struct("chunk_idx", "chunk_text")
                                )
                            ),
                            lambda s: F.split(s.chunk_text, " "),
                        )
                    ),
                    " ",
                ).alias("rebuilt")
            )
        )
        orig = docs.select(
            "doc_id", F.array_join(tokens_pd(F.col("text")), " ").alias("orig")
        )
        diff = rebuilt.join(orig, "doc_id").filter(
            F.col("rebuilt") != F.col("orig")
        )
        assert diff.count() == 0

    def test_chunk_count_and_sizes(self, spark):
        from sparkplug_spark.operators import chunk_documents
        from pyspark.sql import functions as F

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        agg = (
            chunk_documents(docs, chunk_tokens=64, overlap=16)
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("k"),
                F.max("n_chunk_tokens").alias("mx"),
                F.min("n_chunk_tokens").alias("mn"),
            )
            .agg(
                F.max("mx").alias("mx"),
                F.min("mn").alias("mn"),
                F.min("k").alias("min_k"),
            )
            .first()
        )
        assert agg.mx <= 64  # never over the window
        assert agg.mn >= 1
        assert agg.min_k >= 1  # every doc yields at least one chunk


@settings(**_SETTINGS)
@given(texts)
def test_shingles_minhash_pd_equals_agg_path(spark, docs):
    """The fused kernel must be bit-identical to the explode→hash32→
    groupBy-min aggregation formulation (which is what the SQL oracle
    mirrors)."""
    from pyspark.sql import functions as F

    from sparkplug_spark.functions.text import (
        MINHASH_PERMS,
        MINHASH_PRIME,
        hash32,
        shingles_minhash_pd,
        word_shingles_pd,
    )

    df = _df(spark, docs)
    agg = (
        df.select("i", F.explode(word_shingles_pd(F.col("t"), 3)).alias("s"))
        .withColumn("h", hash32(F.col("s")))
        .groupBy("i")
        .agg(
            *[
                F.min(
                    (F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_PRIME)
                ).alias(f"mh{i}")
                for i, (a, b) in enumerate(MINHASH_PERMS[:32])
            ]
        )
    )
    expected = {
        r["i"]: [r[f"mh{j}"] for j in range(32)] for r in agg.collect()
    }
    got = {
        r["i"]: list(r["sm"]["sig"])
        for r in df.select(
            "i", shingles_minhash_pd(F.col("t"), 3, 32).alias("sm")
        ).collect()
    }
    assert got == expected
