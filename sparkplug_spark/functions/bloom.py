"""Distributed-built Bloom filter over 60-bit gram hashes.

Build never materializes the key set anywhere: keys explode into their
``hashes`` bit positions (Kirsch-Mitzenmacher double hashing), one
``bit_or`` aggregation packs them into 64-bit lanes, and only
``bits/8`` bytes reach the driver — independent of key-set size.
Membership is an Arrow-batched kernel over per-row hash arrays.

Bloom semantics: false positives at a rate set by bits/keys (≈1% at
10 bits per key with 5 hashes), NO false negatives — so it serves as an
exact-preserving prefilter (drop definite non-members, verify the rest)
or as an over-dropping standalone filter where that direction is safe
(decontamination).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["build_bloom", "bloom_contains_any"]


def build_bloom(keys_df: DataFrame, col: str, bits: int, hashes: int):
    """numpy uint8 bitmap of ``bits`` bits over the distinct values of
    ``keys_df[col]`` (non-negative bigints, e.g. ``hash60`` output)."""
    import numpy as np

    if bits % 64 != 0 or bits <= 0:
        raise ValueError("bits must be a positive multiple of 64 (lane width)")
    m, k = bits, hashes
    g = F.col(col).cast("long")
    h1 = F.pmod(g, F.lit(m))
    h2 = F.lit(1) + F.pmod(F.shiftrightunsigned(g, 17), F.lit(m - 1))
    positions = keys_df.select(
        F.explode(
            F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)])
        ).alias("pos")
    ).distinct()
    rows = (
        positions.select(
            F.expr("pos div 64").alias("chunk"),
            # SQL form: python F.shiftleft only takes a LITERAL bit count
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias(
                "lane"
            ),
        )
        .groupBy("chunk")
        .agg(F.bit_or("lane").alias("bits64"))
        .collect()
    )
    blob = np.zeros(m // 8, dtype=np.uint8)
    for r in rows:
        word = r["bits64"] & 0xFFFFFFFFFFFFFFFF  # two's complement → unsigned
        base = int(r["chunk"]) * 8
        for b in range(8):
            blob[base + b] = (word >> (8 * b)) & 0xFF
    return blob


def bloom_contains_any(blob, bits: int, hashes: int, grams_col: Column | str) -> Column:
    """Boolean Column: does ANY element of the row's bigint array test
    positive in the filter?  ``blob`` is closure-captured (bits/8 bytes
    serialized once per executor with the UDF)."""
    m, k = bits, hashes

    @F.pandas_udf(T.BooleanType())
    def _hits(grams: pd.Series) -> pd.Series:
        out = []
        for gs in grams:
            hit = False
            for g in gs:
                g = int(g)  # hash60 → non-negative
                h1 = g % m
                h2 = 1 + ((g >> 17) % (m - 1))
                if all(
                    blob[((h1 + i * h2) % m) >> 3] & (1 << (((h1 + i * h2) % m) & 7))
                    for i in range(k)
                ):
                    hit = True
                    break
            out.append(hit)
        return pd.Series(out)

    return _hits(grams_col)
