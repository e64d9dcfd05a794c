"""Multimodal corpus gatekeeper — the round-6 families composed end to end.

A mixed text+video+audio ingest passes through the gates a training-data
platform runs before anything reaches the corpus store, then publishes a
governance release:

  1. trained language ID     language_id_trained   (route docs by language;
                                                    margin thresholds the
                                                    "send to human review"
                                                    lane)
  2. tokenizer budget        train_unigram_vocab + unigram_token_stats
                             (the token bill under the tokenizer the model
                              will actually use — not whitespace words)
  3. semantic decon          decontaminate_semantic (paraphrased eval
                                                     leakage past the
                                                     n-gram/MinHash tiers)
  4. video keyframe dedup    video_dhash + video_near_dup_pairs
  5. audio fingerprint dedup audio_fingerprint + dhash_pairs
  6. store publish           manifest_publish      (atomic pointer commit —
                                                    a crash mid-publish
                                                    never serves half)
  7. DP release              dp_release_counts     (per-language counts a
                                                    partner can see without
                                                    learning any row)

Every gate is deterministic (md5 coins, integer arithmetic), so the whole
run reproduces bit-identically — including the DP noise, which is pinned
to the release seed so re-running never spends fresh privacy budget.

Run:  python examples/multimodal_gatekeeper.py
"""

import io
import os
import struct
import sys
import tempfile
import wave

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession, functions as F

from sparkplug_spark.operators import (
    audio_fingerprint,
    decontaminate_semantic,
    dhash_pairs,
    dp_release_counts,
    language_id_trained,
    train_unigram_vocab,
    unigram_token_stats,
    video_dhash,
    video_near_dup_pairs,
)
from sparkplug_spark.sources import manifest_publish, read_store

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _avi(frames):
    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    avih = chunk(b"avih", struct.pack("<I", 1_000_000) + b"\x00" * 52)
    movi = b"".join(chunk(b"00dc", fr) for fr in frames)
    body = b"AVI " + chunk(b"LIST", b"hdrl" + avih) + chunk(
        b"LIST", b"movi" + movi
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _p5(seed, f):
    px = bytes(
        (seed * 7 + 3 * y + 5 * x + 11 * f) % 57 + 1
        for y in range(16)
        for x in range(18)
    )
    return b"P5\n18 16\n255\n" + px


def _wav(samples):
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(8000)
    w.writeframes(np.asarray(samples).astype("<i2").tobytes())
    w.close()
    return buf.getvalue()


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 1. language routing: self-train on the labeled slice, apply to all;
    #    low-margin docs go to the review lane instead of a hard route
    lid = language_id_trained(docs)
    routed = lid.withColumn("review_lane", F.col("margin_micros") < 100_000)
    n_review = routed.filter("review_lane").count()
    print(f"[1] language ID: {lid.count()} docs routed, {n_review} low-margin -> review")

    # 2. the token bill under the production tokenizer
    vocab = train_unigram_vocab(docs, vocab_size=60, sample_docs=500)
    budget = unigram_token_stats(docs, vocab)
    tot = budget.agg(
        F.sum("n_pieces").alias("pieces"), F.sum("n_unk").alias("unk")
    ).first()
    print(f"[2] unigram budget: {tot['pieces']} pieces, {tot['unk']} UNK words")

    # 3. semantic decontamination vs a held-out "benchmark" slice
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    decon = decontaminate_semantic(corpus, ev, min_cosine=0.9)
    flagged = decon.filter("semantic_contaminated")
    print(f"[3] semantic decon: {flagged.count()} paraphrase-level leaks dropped")
    clean = decon.filter(~F.col("semantic_contaminated"))

    # 4. video keyframe near-dup over a small synthetic ingest
    vids = spark.createDataFrame(
        [(d, _avi([_p5(d % 10, f) for f in range(3)])) for d in range(30)],
        "doc_id long, payload binary",
    )
    vpairs = video_near_dup_pairs(video_dhash(vids, decoder="real"))
    print(f"[4] video dedup: {vpairs.filter('near_dup').count()} near-dup video pairs")

    # 5. audio fingerprint dedup (gain-2 re-encodes collapse exactly)
    i = np.arange(360)
    clips = [
        (d, _wav((((d % 6) * 11 + ((i * i) % 97) * 7) % 201 - 100)
                 * (2 if d >= 12 else 1)))
        for d in range(24)
    ]
    audio = spark.createDataFrame(clips, "doc_id long, payload binary")
    apairs = dhash_pairs(
        audio_fingerprint(audio), hi_col="fp_hi", lo_col="fp_lo"
    )
    print(f"[5] audio dedup: {apairs.count()} fingerprint-identical/near pairs")

    # 6. atomic publish of the gate results as the corpus-state store
    tmp = tempfile.mkdtemp(prefix="gatekeeper_")
    store = os.path.join(tmp, "corpus_state")
    release = clean.select("doc_id").join(lid, "doc_id").select(
        "doc_id", "lang_pred"
    )
    manifest_publish(
        spark, store, lambda p: release.write.mode("overwrite").parquet(p)
    )
    print(f"[6] published {read_store(spark, store).count()} rows (atomic pointer commit)")

    # 7. DP release: per-language counts for external reporting
    dp = dp_release_counts(
        read_store(spark, store), ["lang_pred"], epsilon=1.0, seed=2026
    )
    print("[7] DP release (eps=1.0, seeded):")
    for r in dp.orderBy("lang_pred").collect():
        print(f"    {r['lang_pred']}: {r['released_count']}")

    spark.stop()


if __name__ == "__main__":
    main()
