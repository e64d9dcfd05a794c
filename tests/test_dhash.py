"""Image dHash + hamming-pair tests (exact-integer perceptual hashing)."""

import pytest
from pyspark.sql import functions as F


def _p5(w, h, fn) -> bytes:
    header = f"P5\n{w} {h}\n255\n".encode()
    return header + bytes(fn(y, x) & 0xFF for y in range(h) for x in range(w))


def _hashes(spark, imgs):
    from sparkplug_spark.operators import image_dhash

    df = spark.createDataFrame(imgs, "doc_id long, payload binary")
    return {r["doc_id"]: (r["dhash_hi"], r["dhash_lo"])
            for r in image_dhash(df).collect()}


def _brute_pairs(hashes, max_h):
    out = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if hashes[a][0] is None or hashes[b][0] is None:
                continue
            d = bin(hashes[a][0] ^ hashes[b][0]).count("1") + bin(
                hashes[a][1] ^ hashes[b][1]).count("1")
            if d <= max_h:
                out.add((a, b, d))
    return out


class TestImageDhash:
    def test_identical_images_same_hash(self, spark):
        img = _p5(18, 16, lambda y, x: (y * 7 + x * 13) % 200)
        out = _hashes(spark, [(1, img), (2, img)])
        assert out[1] == out[2]
        assert out[1][0] is not None
        assert 0 <= out[1][0] < 2**32 and 0 <= out[1][1] < 2**32

    def test_gradient_is_all_ones(self, spark):
        # strictly increasing brightness left->right: every comparison
        # cell(x) > cell(x+1) is False -> hash 0; reversed -> all ones
        inc = _p5(18, 16, lambda y, x: x * 10)
        dec = _p5(18, 16, lambda y, x: (17 - x) * 10)
        out = _hashes(spark, [(1, inc), (2, dec)])
        assert out[1] == (0, 0)
        assert out[2] == (2**32 - 1, 2**32 - 1)

    def test_small_perturbation_small_hamming(self, spark):
        base = _p5(18, 16, lambda y, x: (y * 31 + x * 17) % 180)
        pert = _p5(18, 16, lambda y, x: ((y * 31 + x * 17) % 180) + 60
                   if (y < 2 and x < 2) else (y * 31 + x * 17) % 180)
        out = _hashes(spark, [(1, base), (2, pert)])
        d = bin(out[1][0] ^ out[2][0]).count("1") + bin(
            out[1][1] ^ out[2][1]).count("1")
        assert 1 <= d <= 2  # one touched cell flips at most 2 comparisons

    def test_p6_gray_equals_p5(self, spark):
        fn = lambda y, x: (y * 11 + x * 23) % 150  # noqa: E731
        p5 = _p5(18, 16, fn)
        header = b"P6\n18 16\n255\n"
        p6 = header + bytes(
            fn(y, x) & 0xFF for y in range(16) for x in range(18) for _ in range(3)
        )
        out = _hashes(spark, [(1, p5), (2, p6)])
        assert out[1] == out[2]

    def test_undecodable_is_null(self, spark):
        out = _hashes(spark, [(1, b"garbage bytes here")])
        assert out[1] == (None, None)

    def test_bad_grid(self, spark):
        from sparkplug_spark.operators import image_dhash

        df = spark.createDataFrame([(1, b"x")], "doc_id long, payload binary")
        with pytest.raises(ValueError, match="64 comparisons"):
            image_dhash(df, grid=(4, 4))

    def test_nonuniform_blocks_cross_multiply(self, spark):
        # 19x17 image: block sizes differ, so raw-sum comparison would be
        # wrong — cross-multiplied means must still order correctly
        inc = _p5(19, 17, lambda y, x: x * 10)
        out = _hashes(spark, [(1, inc)])
        assert out[1] == (0, 0)


class TestDhashPairs:
    def test_pairs_match_brute_force(self, spark):
        from sparkplug_spark.operators import dhash_pairs, image_dhash

        imgs = []
        for g in range(6):
            base = lambda y, x, g=g: (g * 37 + y * 31 + x * 17) % 180  # noqa: E731
            imgs.append((g * 10, _p5(18, 16, base)))
            # near-dup: single-block bump
            imgs.append((g * 10 + 1, _p5(
                18, 16,
                lambda y, x, g=g: base(y, x) + 60 if (y < 2 and x < 2) else base(y, x))))
        df = spark.createDataFrame(imgs, "doc_id long, payload binary")
        hdf = image_dhash(df)
        hashes = {r["doc_id"]: (r["dhash_hi"], r["dhash_lo"])
                  for r in hdf.collect()}
        got = {(r["doc_id_a"], r["doc_id_b"], r["hamming"])
               for r in dhash_pairs(hdf, max_hamming=3).collect()}
        assert got == _brute_pairs(hashes, 3)
        assert got  # the near-dup pairs must actually exist

    def test_radius_guard(self, spark):
        from sparkplug_spark.operators import dhash_pairs

        df = spark.createDataFrame([(1, 0, 0)],
                                   "doc_id long, dhash_hi long, dhash_lo long")
        with pytest.raises(ValueError, match="hamming"):
            dhash_pairs(df, max_hamming=4)

    def test_null_hashes_excluded(self, spark):
        from sparkplug_spark.operators import dhash_pairs

        df = spark.createDataFrame(
            [(1, 5, 9), (2, 5, 9), (3, None, None)],
            "doc_id long, dhash_hi long, dhash_lo long",
        )
        got = [(r["doc_id_a"], r["doc_id_b"], r["hamming"])
               for r in dhash_pairs(df).collect()]
        assert got == [(1, 2, 0)]
