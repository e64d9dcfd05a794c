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

__all__ = [
    "build_bloom",
    "bloom_bitmap_from_keys",
    "bloom_contains_any",
    "bloom_contains_key",
    "bloom_contains_text",
    "gram_hashes_pd",
]


def _batch_gram_hashes(texts, n: int):
    """Per-batch rolling-hash of word n-grams: returns ``(gh, rows)`` — a
    flat int64 array of gram hashes and each hash's row index.

    One ``pd.util.hash_array`` call hashes every token of the batch, then a
    vectorized polynomial roll combines each n consecutive token hashes.
    Token-sequence equality ⟺ hash equality (modulo 64-bit collisions,
    which for a Bloom filter only add false positives), so membership
    agrees with the gram-string semantics of ``word_shingles_pd``:
    documents with ≤ n tokens contribute one whole-text gram."""
    import numpy as np

    from .text import norm_tokens_py

    toks = [norm_tokens_py(t) for t in texts]
    nrows = len(toks)
    counts = np.fromiter((len(t) for t in toks), dtype=np.int64, count=nrows)
    total = int(counts.sum())
    flat = np.empty(total, dtype=object)
    pos = 0
    for t in toks:
        flat[pos : pos + len(t)] = t
        pos += len(t)
    th = pd.util.hash_array(flat)  # uint64, one cython pass
    starts = np.zeros(nrows, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    C = np.uint64(1099511628211)
    mask63 = np.uint64((1 << 63) - 1)
    out_g: list = []
    out_r: list = []
    # sliding grams for rows with >= n tokens, all rows at once
    if total >= n:
        ns = total - n + 1
        S = np.zeros(ns, dtype=np.uint64)
        for j in range(n):
            S = S * C + th[j : j + ns]
        row_of = np.repeat(np.arange(nrows), counts)
        valid = row_of[:ns] == row_of[n - 1 : total]  # gram within one row
        out_g.append(((S & mask63).astype(np.int64))[valid])
        out_r.append(row_of[:ns][valid])
    # degenerate whole-text gram for rows with < n tokens (cheap: < n terms)
    deg = np.flatnonzero(counts < n)
    if deg.size:
        Sd = np.zeros(deg.size, dtype=np.uint64)
        for j in range(int(counts[deg].max())):
            has = counts[deg] > j
            Sd[has] = Sd[has] * C + th[starts[deg[has]] + j]
        out_g.append((Sd & mask63).astype(np.int64))
        out_r.append(deg.astype(np.int64))
    if out_g:
        return np.concatenate(out_g), np.concatenate(out_r)
    return np.empty(0, np.int64), np.empty(0, np.int64)


def build_bloom_from_texts(
    texts_df: DataFrame, col: str, n: int, bits: int, hashes: int
):
    """Bitmap over the word-n-gram rolling hashes of a (small) text corpus,
    built driver-side: one pure-JVM collect of the text column, then the
    batch gram-hash kernel locally.  For eval/benchmark sets — MBs by
    nature — this is one scan job with no Python-worker stage; key sets
    too large to collect should use :func:`build_bloom`'s distributed
    path over pre-hashed keys instead."""
    texts = texts_df.select(F.col(col).cast("string").alias("t")).toPandas()["t"]
    gh, _ = _batch_gram_hashes(texts.tolist(), n)
    return bloom_bitmap_from_keys(gh, bits, hashes)


def gram_hashes_pd(col: Column | str, n: int) -> Column:
    """array<bigint> Column of the rolling word-n-gram hashes of a text
    column (the build-side twin of :func:`bloom_contains_text`)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _hashes(s: pd.Series) -> pd.Series:
        import numpy as np

        gh, rows = _batch_gram_hashes(s.tolist(), n)
        order = np.argsort(rows, kind="stable")
        gh, rows = gh[order], rows[order]
        bounds = np.searchsorted(rows, np.arange(len(s) + 1))
        return pd.Series(
            [gh[bounds[i] : bounds[i + 1]] for i in range(len(s))]
        )

    return _hashes(col)


def bloom_contains_text(
    blob, bits: int, hashes: int, text_col: Column | str, n: int
) -> Column:
    """Boolean Column: does any word n-gram of the text probe positive?

    The fused fast path of the decontamination prefilter: ONE Arrow
    crossing (text in, bool out), no gram strings, no md5 — tokenize,
    batch-hash, roll, gather bits.  The filter must be cheaper per row
    than the exact join it screens for; this is that kernel."""
    import numpy as np

    m, k = bits, hashes

    @F.pandas_udf(T.BooleanType())
    def _probe(s: pd.Series) -> pd.Series:
        nrows = len(s)
        hits = np.zeros(nrows, dtype=bool)
        if nrows:
            gh, rows = _batch_gram_hashes(s.tolist(), n)
            if gh.size:
                h1 = gh % m
                h2 = 1 + ((gh >> 17) % (m - 1))
                member = np.ones(gh.size, dtype=bool)
                for i in range(k):
                    p = (h1 + i * h2) % m
                    member &= ((blob[p >> 3] >> (p & 7).astype(np.uint8)) & 1).astype(bool)
                hits[np.unique(rows[member])] = True
        return pd.Series(hits)

    return _probe(text_col)


def bloom_contains_key(blob, bits: int, hashes: int, key_col: Column | str) -> Column:
    """Boolean Column: does the row's single bigint key test positive?

    Scalar twin of :func:`bloom_contains_any` for equi-join keys (one
    ``hash60`` per row instead of a gram array).  NULL keys probe
    negative — the definite-non-member answer, which is the correct one
    for both the semi prefilter (SQL semi join never matches NULL) and
    the anti keep-outright branch.

    NULLs are replaced by a ``-1`` sentinel JVM-SIDE, before Arrow: a
    nullable long batch otherwise arrives as float64 and silently rounds
    every >53-bit hash IN THE BATCH (observed: same-key rows probing
    negative only in the batch that contained the NULL row)."""
    import numpy as np

    m, k = bits, hashes
    col = F.coalesce(
        key_col if isinstance(key_col, Column) else F.col(key_col),
        F.lit(-1).cast("long"),
    )

    @F.pandas_udf(T.BooleanType())
    def _hit(s: pd.Series) -> pd.Series:
        n = len(s)
        hits = np.zeros(n, dtype=bool)
        if n:
            g = s.to_numpy(np.int64)
            valid = g >= 0  # hash60 output is non-negative; -1 = was NULL
            gv = g[valid]
            if gv.size:
                h1 = gv % m
                h2 = 1 + ((gv >> 17) % (m - 1))
                member = np.ones(gv.size, dtype=bool)
                for i in range(k):
                    pos = (h1 + i * h2) % m
                    lane = (blob[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
                    member &= lane.astype(bool)
                hits[valid] = member
        return pd.Series(hits)

    return _hit(col)


def bloom_bitmap_from_keys(keys, bits: int, hashes: int):
    """numpy uint8 bitmap from an in-memory int64 key array (driver-side
    build).  Probe-compatible with :func:`bloom_contains_any`."""
    import numpy as np

    if bits % 64 != 0 or bits <= 0:
        raise ValueError("bits must be a positive multiple of 64 (lane width)")
    m, k = bits, hashes
    g = np.asarray(keys, dtype=np.int64)
    blob = np.zeros(m // 8, dtype=np.uint8)
    if g.size:
        h1 = g % m
        h2 = 1 + ((g >> 17) % (m - 1))
        for i in range(k):
            pos = (h1 + i * h2) % m
            np.bitwise_or.at(
                blob, pos >> 3, np.left_shift(1, pos & 7).astype(np.uint8)
            )
    return blob


def build_bloom(
    keys_df: DataFrame, col: str, bits: int, hashes: int,
    collect_keys: bool = False,
):
    """numpy uint8 bitmap of ``bits`` bits over the distinct values of
    ``keys_df[col]`` (non-negative bigints, e.g. ``hash60`` output).

    Default path is the distributed build: keys explode into their bit
    positions, one ``bit_or`` aggregation packs 64-bit lanes (duplicates
    vanish in the OR — no distinct needed), and only ``bits/8`` bytes reach
    the driver, independent of key-set size.

    ``collect_keys=True`` collects the distinct keys and builds the bitmap
    driver-side in numpy — one cheap job instead of an explode+shuffle
    pipeline.  Use it when the key set is broadcast-small anyway (e.g. a
    benchmark eval set); the distributed path remains for key sets too big
    to collect."""
    import numpy as np

    if bits % 64 != 0 or bits <= 0:
        raise ValueError("bits must be a positive multiple of 64 (lane width)")
    m, k = bits, hashes
    g = F.col(col).cast("long")
    if collect_keys:
        # no distinct: the bitmap OR dedups for free, and skipping it saves
        # the build job's only shuffle; Arrow collect, not row collect
        keys = (
            keys_df.select(g.alias("g")).toPandas()["g"].to_numpy(np.int64)
        )
        return bloom_bitmap_from_keys(keys, bits, hashes)
    h1 = F.pmod(g, F.lit(m))
    h2 = F.lit(1) + F.pmod(F.shiftrightunsigned(g, 17), F.lit(m - 1))
    positions = keys_df.select(
        F.explode(
            F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)])
        ).alias("pos")
    )
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
    serialized once per executor with the UDF).

    The whole Arrow batch is probed in bulk numpy (flatten every row's gram
    array, compute all k probe positions as arrays, gather bits, reduce per
    row) — the prefilter must cost less than the exact tier it screens for,
    so no per-gram Python arithmetic."""
    import numpy as np

    m, k = bits, hashes

    @F.pandas_udf(T.BooleanType())
    def _hits(grams: pd.Series) -> pd.Series:
        n = len(grams)
        if n == 0:
            return pd.Series([], dtype=bool)
        arrs = [np.asarray(g, dtype=np.int64) for g in grams]
        lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=n)
        total = int(lens.sum())
        hits = np.zeros(n, dtype=bool)
        if total:
            flat = np.concatenate(arrs)  # hash60 output: non-negative
            h1 = flat % m
            h2 = 1 + ((flat >> 17) % (m - 1))
            member = np.ones(total, dtype=bool)
            for i in range(k):  # k iterations, each over the full batch
                pos = (h1 + i * h2) % m
                lane = (blob[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
                member &= lane.astype(bool)
            row_ids = np.repeat(np.arange(n), lens)
            hits[np.unique(row_ids[member])] = True
        return pd.Series(hits)

    return _hits(grams_col)
