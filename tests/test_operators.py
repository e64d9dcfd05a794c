"""Extension-operator tests: dedup, similarity, text analysis, impact,
multimodal plumbing, streaming."""

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from sparkplug_spark import PlugAction, PlugRule, SparkPlug
from sparkplug_spark.operators import (
    cosine_topk,
    cosine_topk_lsh,
    dedup_exact,
    embedding_near_dup_pairs,
    exact_duplicate_groups,
    jaccard_ngram_pairs,
    language_id,
    minhash_lsh_pairs,
    rule_impact_report,
    simhash_pairs,
    text_fingerprints,
    text_stats,
)
from sparkplug_spark.operators.multimodal import (
    attach_media_meta,
    decode_image_features,
    sample_video_frames,
)
from sparkplug_spark.streaming import plug_stream


def docs_df(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "The quick brown fox jumps over the lazy dog!"),  # ≅ 1 normalized
        (4, "completely different content regarding spark engines plus shuffles"),
        (5, "el gato y el perro en la casa de la abuela"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_exact_normalized(spark):
    df = docs_df(spark)
    out = dedup_exact(df)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 2, 4, 5]  # 3 deduped into 1 (normalization)
    groups = exact_duplicate_groups(df).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2 and groups[0]["keeper_id"] == 1


def test_jaccard_ngram_pairs(spark):
    df = docs_df(spark)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_ngram_pairs(df, threshold=0.3).collect()}
    assert (1, 3) in pairs and pairs[(1, 3)] == 1.0  # identical after norm
    assert (1, 2) in pairs and 0.4 < pairs[(1, 2)] < 1.0
    assert not any({4, 5} & {a, b} for a, b in pairs)


def test_minhash_lsh_finds_near_dups(spark):
    df = docs_df(spark)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in minhash_lsh_pairs(df, threshold=0.3).collect()}
    assert (1, 3) in pairs and pairs[(1, 3)] == 1.0
    assert (1, 2) in pairs  # high-jaccard pair must be a candidate


def test_simhash_pairs(spark):
    df = docs_df(spark)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(df, max_hamming=3).collect()}
    assert (1, 3) in pairs and pairs[(1, 3)] == 0  # identical tokens
    assert all(h <= 3 for h in pairs.values())


def _seeded_near_dup_docs(spark, n_pairs=150, n_tokens=200, seed=7):
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(2000)]
    rows, seeded = [], []
    for i in range(n_pairs):
        base = [rng.choice(vocab) for _ in range(n_tokens)]
        mut = list(base)
        mut[rng.randrange(n_tokens)] = rng.choice(vocab)  # 1-word edit
        rows.append((2 * i, " ".join(base)))
        rows.append((2 * i + 1, " ".join(mut)))
        seeded.append((2 * i, 2 * i + 1))
    return spark.createDataFrame(rows, ["doc_id", "text"]), seeded


def test_simhash64_candidate_exactness_and_recall(spark):
    """The 4×16-bit chunk index must be LOSSLESS for hamming ≤ 3
    (pigeonhole), and the 64-bit hash must actually catch 1-word edits.

    Guards the round-1 regression: 8-bit chunks saturated at 256 buckets,
    so at scale max_key_freq silently dropped every candidate."""
    from sparkplug_spark.functions.text import simhash64_pd

    df, seeded = _seeded_near_dup_docs(spark, n_pairs=400)
    sh = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", simhash64_pd("text").alias("sh")).collect()
    }
    # ground truth: all pairs with hamming <= 3, brute-forced locally
    ids = sorted(sh)
    truth = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(df, max_hamming=3).collect()
    }
    assert got == truth  # candidate generation drops nothing at hamming<=3
    recall = sum(1 for p in seeded if p in got) / len(seeded)
    assert recall >= 0.75  # empirically ~0.9 for 200-token docs, 1 edit
    # bucket diversity: each 16-bit chunk table must hold more distinct
    # bucket values than the 256 an 8-bit chunk could ever produce (near-dup
    # pairs share chunks, so ~400 distinct sources per 65536-bucket table)
    for c in range(4):
        distinct = len({(sh[i] >> (16 * c)) & 0xFFFF for i in ids})
        assert distinct > 256


def emb_df(spark, n=30, dim=8):
    import math

    rows = []
    for i in range(n):
        base = [math.sin(i * 0.7 + d) for d in range(dim)]
        rows.append((i, [float(x) for x in base]))
    # near-duplicate of vec 0
    rows.append((n, [x * 1.001 for x in rows[0][1]]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_embedding_near_dup_brute_vs_lsh(spark):
    df = emb_df(spark)
    brute = {(r["id_a"], r["id_b"]) for r in embedding_near_dup_pairs(df, threshold=0.999, brute_force=True).collect()}
    assert (0, 30) in brute
    lsh = {(r["id_a"], r["id_b"]) for r in embedding_near_dup_pairs(df, threshold=0.999).collect()}
    assert (0, 30) in lsh  # scaled copy lands in same buckets
    assert lsh <= brute  # LSH candidates verified exactly -> subset


def test_cosine_topk_exact_and_lsh(spark):
    df = emb_df(spark)
    queries = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(df, queries, k=5)
    rows = exact.collect()
    assert len(rows) == 5
    assert rows[0]["neighbor_id"] == 0 and rows[0]["cosine"] == 1.0  # self
    assert {r["neighbor_id"] for r in rows} >= {0, 30}
    approx = cosine_topk_lsh(df, queries, k=5)
    arows = approx.collect()
    assert arows[0]["neighbor_id"] == 0
    assert {r["neighbor_id"] for r in arows} >= {0, 30}


def test_text_stats_and_language_id(spark):
    df = docs_df(spark)
    stats = {r["doc_id"]: r for r in text_stats(df).collect()}
    assert stats[1]["n_tokens"] == 9
    assert stats[3]["punct_ratio"] > 0.0
    assert 0.0 <= stats[1]["quality_score"] <= 1.0
    langs = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert langs[1] == "en"
    assert langs[5] == "es"
    assert langs[4] == "und"  # no function words


def test_column_profile_and_histogram(spark):
    from sparkplug_spark.operators import column_profile, histogram

    df = spark.createDataFrame(
        [(1.0, 10), (2.0, 20), (None, 30), (3.0, 30)], ["a", "b"]
    )
    prof = {r["column"]: r for r in column_profile(df, ["a", "b"]).collect()}
    assert prof["a"]["n_rows"] == 3 and prof["a"]["n_null"] == 1
    assert prof["a"]["n_distinct"] == 3 and prof["a"]["mean_v"] == 2.0
    assert prof["b"]["n_distinct"] == 3 and prof["b"]["max_v"] == 30.0

    h = {r["bucket"]: r["n"] for r in histogram(df, "b", lo=0, hi=30, bins=3).collect()}
    assert h == {1: 1, 2: 1, 3: 2}  # 10→[10,20), 20→[20,30), 30s → overflow


def test_top_tokens(spark):
    from sparkplug_spark.operators import top_tokens

    df = spark.createDataFrame(
        [
            (1, "en", "alpha alpha alpha beta beta gamma"),
            (2, "en", "alpha beta delta"),
            (3, "de", "zug zug bahn"),
        ],
        ["doc_id", "lang", "text"],
    )
    out = {(r["lang"], r["rank"]): (r["token"], r["n"]) for r in top_tokens(df, k=2).collect()}
    assert out[("en", 1)] == ("alpha", 4)
    assert out[("en", 2)] == ("beta", 3)
    assert out[("de", 1)] == ("zug", 2)
    assert out[("de", 2)] == ("bahn", 1)


def test_text_fingerprints(spark):
    df = docs_df(spark)
    fp = {r["doc_id"]: r for r in text_fingerprints(df).collect()}
    assert fp[1]["content_md5"] == fp[3]["content_md5"]
    assert fp[1]["token_fingerprint"] == fp[3]["token_fingerprint"]
    assert fp[1]["simhash"] == fp[3]["simhash"]
    assert fp[1]["content_md5"] != fp[2]["content_md5"]
    assert 0 <= fp[1]["simhash"] < 2**32


def test_rule_impact_report(spark):
    df = spark.createDataFrame(
        [("iPhone", 300), ("Galaxy", 200), ("Lumia", 100)], ["title", "price"]
    )
    rules = [
        PlugRule("r1", "v1", "price < 250", (PlugAction("price", "999"),)),
        PlugRule("r2", "v1", "title = 'iPhone'", (PlugAction("title", "IPHONE"), PlugAction("price", "1"))),
    ]
    plugged = SparkPlug.builder(spark).enable_plug_details().create().plug(df, rules)
    report = {r["rule_name"]: r for r in rule_impact_report(plugged).collect()}
    assert report["r1"]["rows_changed"] == 2
    assert report["r2"]["rows_changed"] == 1
    assert report["r2"]["field_writes"] == 2


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame(
        [(1, b"fake-image-bytes-aaaa"), (2, b"fake-image-bytes-bbbb"), (3, None)],
        T.StructType(
            [
                T.StructField("media_id", T.IntegerType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )
    with_meta = attach_media_meta(df, mime="image/png")
    metas = {r["media_id"]: r["media_meta"] for r in with_meta.collect()}
    assert metas[1]["mime"] == "image/png" and metas[1]["size_bytes"] == 21
    assert metas[3]["size_bytes"] is None

    feats = decode_image_features(df, feature_dim=8)
    rows = {r["media_id"]: r["features"] for r in feats.collect()}
    assert len(rows[1]) == 8 and rows[1] != rows[2]
    # deterministic
    rows2 = {r["media_id"]: r["features"] for r in decode_image_features(df, feature_dim=8).collect()}
    assert rows == rows2

    frames = sample_video_frames(df.filter("media_id=1"), every_ms=10)
    fr = frames.collect()
    assert len(fr) == 3  # 21-byte payload → 21ms 'duration' → 3 samples
    assert [r["frame_idx"] for r in fr] == [0, 1, 2]

    # decoder="real": decodes via Pillow when installed; otherwise fails
    # FAST on the driver with a clear install hint (no mid-job surprise)
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if have_pil:
        real = {r["media_id"]: r["features"] for r in decode_image_features(df, decoder="real").collect()}
        assert len(real[1]) == 16
    else:
        with pytest.raises(ImportError, match="requires Pillow"):
            decode_image_features(df, decoder="real")


def test_plug_stream(spark, tmp_path):
    # rules applied per micro-batch via readStream on a parquet dir
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(
        [(1, "iPhone", 300), (2, "Galaxy", 200)], ["id", "title", "price"]
    ).write.parquet(src)
    stream = spark.readStream.schema("id long, title string, price long").parquet(src)
    rules = [PlugRule("r1", "v1", "title = 'iPhone'", (PlugAction("price", "1000"),))]
    plugged = plug_stream(spark, stream, rules)
    assert plugged.isStreaming
    q = (
        plugged.writeStream.format("memory")
        .queryName("plug_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r["id"]: r for r in spark.sql("select * from plug_stream_test").collect()}
    assert rows[1]["price"] == 1000 and len(rows[1]["plugDetails"]) == 1
    assert rows[2]["price"] == 200 and rows[2]["plugDetails"] == []


def test_embedding_norms(spark):
    from sparkplug_spark.operators import embedding_norms

    df = spark.createDataFrame(
        [
            (0, [3.0, 4.0]),
            (1, [1.0, 0.0]),
            (2, [0.6, 0.8]),
            (3, [float("nan"), 1.0]),
        ],
        ["vec_id", "embedding"],
    )
    rows = {r["vec_id"]: r for r in embedding_norms(df).collect()}
    assert rows[0]["dim"] == 2 and rows[0]["l2_norm"] == 5.0
    assert not rows[0]["is_unit"]
    assert rows[1]["is_unit"] and rows[2]["is_unit"]
    assert rows[3]["has_nan"] and not rows[0]["has_nan"]


def test_distinctive_tokens(spark):
    from sparkplug_spark.operators import distinctive_tokens

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat zyzzyva zyzzyva"),
            (2, "the dog ran to the park"),
            (3, "the bird saw the dog"),
        ],
        ["doc_id", "text"],
    )
    out = {(r["doc_id"], r["rank"]): r for r in distinctive_tokens(df, k=3).collect()}
    # 'zyzzyva' appears twice in doc 1 only: score = 2*3/1 = 6 -> top
    top1 = out[(1, 1)]
    assert top1["token"] == "zyzzyva"
    assert top1["tf"] == 2 and top1["df"] == 1 and top1["score"] == 6.0
    # 'the' is in every doc: score = tf*3/3 = tf -> never beats unique tokens
    assert out[(2, 1)]["token"] != "the"
    # every doc gets at most k rows, ranks are 1..k contiguous
    for doc in (1, 2, 3):
        ranks = sorted(rk for (d, rk) in out if d == doc)
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 3


def test_resize_images_plumbing(spark):
    from sparkplug_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, b"fake-image-bytes-aaaa"), (2, b"fake-image-bytes-bbbb")],
        T.StructType(
            [
                T.StructField("media_id", T.IntegerType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )
    out = resize_images(df, size=(16, 16))
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["width"] == 16 and rows[1]["height"] == 16
    assert isinstance(rows[1]["payload_resized"], (bytes, bytearray))
    assert rows[1]["payload_resized"] != rows[2]["payload_resized"]
    # deterministic fake path
    again = {r["media_id"]: r["payload_resized"] for r in resize_images(df, size=(16, 16)).collect()}
    assert again[1] == rows[1]["payload_resized"]
    with pytest.raises(ValueError, match="positive"):
        resize_images(df, size=(0, 16))
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        with pytest.raises(ImportError, match="requires Pillow"):
            resize_images(df, decoder="real")
