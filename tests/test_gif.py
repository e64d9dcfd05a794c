"""Native GIF codec: LZW roundtrips (lossless), interlace, dictionary
overflow, extension skipping, and boundaries."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from sparkplug_spark.operators.gif import decode_gif, encode_gif

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


class TestGifRoundtrip:
    def test_dictionary_overflow_clear(self):
        rng = np.random.default_rng(2)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        big = rng.integers(0, 16, (200, 200), dtype=np.uint8)
        assert np.array_equal(decode_gif(encode_gif(big, pal)), pal[big])

    def test_long_runs_grow_dictionary(self):
        pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
        runs = (
            np.repeat(np.arange(16, dtype=np.uint8), 4000).reshape(200, 320)
            % 16
        )
        assert np.array_equal(decode_gif(encode_gif(runs, pal)), pal[runs])

    def test_interlace(self):
        rng = np.random.default_rng(3)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        il = rng.integers(0, 16, (37, 23), dtype=np.uint8)
        assert np.array_equal(
            decode_gif(encode_gif(il, pal, interlace=True)), pal[il]
        )

    def test_two_color_and_extension_skip(self):
        rng = np.random.default_rng(4)
        pal2 = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
        bw = rng.integers(0, 2, (20, 30), dtype=np.uint8)
        g = encode_gif(bw, pal2)
        assert np.array_equal(decode_gif(g), pal2[bw])
        # a graphic-control extension before the image must be skipped
        i = g.index(b"\x2c")
        ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        assert np.array_equal(decode_gif(g[:i] + ext + g[i:]), pal2[bw])

    def test_boundaries(self):
        with pytest.raises(NotImplementedError, match="GIF"):
            decode_gif(b"NOTGIF" + b"\x00" * 20)
        with pytest.raises(NotImplementedError):
            decode_gif(b"GIF89a" + b"\x00" * 5)  # truncated


@given(
    shape=st.tuples(st.integers(1, 20), st.integers(1, 20)),
    ncolors=st.integers(2, 32),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(**_SETTINGS)
def test_gif_roundtrip_property(shape, ncolors, interlace, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, shape, dtype=np.uint8)
    dec = decode_gif(encode_gif(idx, pal, interlace=interlace))
    assert np.array_equal(dec, pal[idx])


def test_gif_through_spark_native_tier(spark):
    from sparkplug_spark.operators.multimodal import decode_image_features

    pal = np.array([[10] * 3, [20] * 3, [30] * 3, [40] * 3], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    payload = encode_gif(idx, pal)
    df = spark.createDataFrame([(1, payload)], "id long, payload binary")
    feats = decode_image_features(df, feature_dim=4, decoder="native").collect()[
        0
    ]["features"]
    assert [round(f * 255.0) for f in feats] == [10, 20, 30, 40]
