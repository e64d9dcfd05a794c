"""Baseline JPEG codec (pure numpy): roundtrips, sampling modes,
restart markers, and mode boundaries."""

import struct

import numpy as np
import pytest

from sparkplug_spark.operators.jpeg import decode_jpeg, encode_jpeg_baseline


class TestJpegRoundtrip:
    def test_flat_gray_exact_on_lossless_subspace(self):
        # 8*(v-128) divisible by quant_dc=16 <=> v even: exact roundtrip
        for v in (0, 2, 64, 128, 200, 254):
            img = np.full((8, 8), v, dtype=np.uint8)
            dec = decode_jpeg(encode_jpeg_baseline(img, quant_dc=16))
            assert dec.shape == (8, 8, 1)
            assert np.all(dec[:, :, 0] == v), v

    def test_multi_block_dc_prediction(self):
        img = np.zeros((16, 16), dtype=np.uint8)
        img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 10, 12, 14, 16
        dec = decode_jpeg(encode_jpeg_baseline(img))[:, :, 0]
        assert np.all(dec[:8, :8] == 10) and np.all(dec[8:, 8:] == 16)

    def test_gradient_close(self):
        x = np.linspace(0, 255, 32)
        img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
        dec = decode_jpeg(
            encode_jpeg_baseline(img, quant_dc=8, quant_ac=8)
        )[:, :, 0].astype(int)
        assert np.abs(dec - img.astype(int)).max() <= 12

    def test_random_gray_bounded_error(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (24, 32), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg_baseline(img))[:, :, 0].astype(int)
        err = np.abs(dec - img.astype(int))
        assert err.max() < 60 and err.mean() < 15

    def test_odd_dimensions_pad_and_crop(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (13, 21), dtype=np.uint8)
        assert decode_jpeg(encode_jpeg_baseline(img)).shape == (13, 21, 1)

    def test_rgb_color(self):
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        img[:] = (200, 40, 60)
        dec = decode_jpeg(encode_jpeg_baseline(img, quant_dc=8, quant_ac=8))
        assert np.abs(dec[0, 0].astype(int) - [200, 40, 60]).max() <= 6

    def test_420_subsampling(self):
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        img[:] = (120, 120, 120)
        dec = decode_jpeg(encode_jpeg_baseline(img, sampling="4:2:0"))
        assert dec.shape == (16, 16, 3)
        assert np.abs(dec.astype(int) - 120).max() <= 1
        rng = np.random.default_rng(2)
        odd = np.clip(
            rng.integers(0, 256, (19, 27, 3)), 40, 215
        ).astype(np.uint8)
        assert decode_jpeg(
            encode_jpeg_baseline(odd, sampling="4:2:0")
        ).shape == (19, 27, 3)

    @pytest.mark.parametrize("sampling", ["4:4:4", "4:2:0"])
    def test_restart_markers_change_nothing(self, sampling):
        rng = np.random.default_rng(3)
        img = rng.integers(60, 200, (32, 48, 3), dtype=np.uint8)
        plain = decode_jpeg(encode_jpeg_baseline(img, sampling=sampling))
        rst = decode_jpeg(
            encode_jpeg_baseline(img, sampling=sampling, restart_interval=2)
        )
        assert np.array_equal(plain, rst)


class TestJpegBoundaries:
    def test_progressive_raises(self):
        prog = b"\xff\xd8" + struct.pack(">BBH", 0xFF, 0xC2, 10) + b"\x00" * 8
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_jpeg(prog)

    def test_non_jpeg_raises(self):
        with pytest.raises(NotImplementedError, match="JPEG"):
            decode_jpeg(b"\x89PNG\r\n\x1a\n" + b"\x00" * 30)

    def test_truncated_raises(self):
        ok = encode_jpeg_baseline(np.full((8, 8), 100, dtype=np.uint8))
        with pytest.raises(NotImplementedError):
            decode_jpeg(ok[:6])

    def test_12bit_raises(self):
        sof = struct.pack(">BHHB", 12, 8, 8, 1) + bytes([1, 0x11, 0])
        bad = (
            b"\xff\xd8"
            + struct.pack(">BBH", 0xFF, 0xC0, len(sof) + 2)
            + sof
        )
        with pytest.raises(NotImplementedError, match="8-bit"):
            decode_jpeg(bad)


def test_jpeg_through_spark_native_tier(spark):
    from sparkplug_spark.operators.multimodal import decode_image_features

    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 10, 12, 14, 16
    payload = encode_jpeg_baseline(img)
    df = spark.createDataFrame([(1, payload)], "id long, payload binary")
    feats = decode_image_features(df, feature_dim=4, decoder="native").collect()[
        0
    ]["features"]
    assert [round(f * 255.0) for f in feats] == [10, 12, 14, 16]


def test_decode_throughput_is_linear_not_quadratic():
    """Regression: the bit reader must discard consumed bits — without the
    mask the accumulator is an unbounded bignum and a real-world-sized
    entropy stream takes minutes instead of a fraction of a second."""
    import time

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (128, 128), dtype=np.uint8)
    payload = encode_jpeg_baseline(img, quant_dc=4, quant_ac=4)
    assert len(payload) > 15_000  # noisy: a genuinely large entropy stream
    t0 = time.perf_counter()
    decode_jpeg(payload)
    assert time.perf_counter() - t0 < 10.0


def test_non_interleaved_and_multi_scan_raise():
    """decode-correctly-or-raise: a scan that does not cover every frame
    component (multi-scan file) must raise, not decode half the planes."""
    ok = encode_jpeg_baseline(np.full((8, 8, 3), 100, dtype=np.uint8))
    # find the SOS segment and rewrite it to a single-component scan
    i = ok.index(b"\xff\xda")
    (seglen,) = struct.unpack_from(">H", ok, i + 2)
    one_comp_sos = struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    hacked = ok[: i + 2] + one_comp_sos + ok[i + 2 + seglen :]
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_jpeg(hacked)
