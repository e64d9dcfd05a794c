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


class TestAnimatedGif:
    """GIF89a compositing: disposal methods, transparency, delays."""

    PAL = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
    )

    def test_compositing_transparency_and_disposals(self):
        from sparkplug_spark.operators.gif import (
            decode_gif_frames,
            encode_gif_anim,
        )

        f0 = np.zeros((4, 6), int)
        f0[:, :3] = 1                      # red left half on black
        f1 = np.full((2, 2), 2, int)       # green delta patch
        f2 = np.full((2, 3), 3, int)       # all-transparent raster
        payload = encode_gif_anim(
            [
                {"indices": f0, "delay_cs": 5},
                {"indices": f1, "left": 4, "top": 1, "delay_cs": 7,
                 "disposal": 3},
                {"indices": f2, "left": 0, "top": 2, "delay_cs": 9,
                 "disposal": 2, "transparent": 3},
            ],
            self.PAL,
        )
        frames = decode_gif_frames(payload)
        assert [d for d, _ in frames] == [50, 70, 90]
        a0, a1, a2 = (a for _, a in frames)
        assert a0.shape == (4, 6, 3)
        assert (a0[0, 0] == [255, 0, 0]).all() and (a0[0, 5] == 0).all()
        # frame 1 composites the delta over frame 0
        assert (a1[1, 4] == [0, 255, 0]).all()
        assert (a1[0, 0] == [255, 0, 0]).all()
        # frame 2 is fully transparent; frame 1 had disposal=3
        # (restore-to-previous), so the canvas is back to frame 0
        assert (a2 == a0).all()

    def test_restore_to_background_disposal(self):
        from sparkplug_spark.operators.gif import (
            decode_gif_frames,
            encode_gif_anim,
        )

        f0 = np.full((4, 4), 1, int)
        f1 = np.full((2, 2), 2, int)
        f2 = np.full((1, 1), 3, int)
        payload = encode_gif_anim(
            [
                {"indices": f0, "disposal": 0},
                # disposal=2: region restored to BACKGROUND after render
                {"indices": f1, "left": 1, "top": 1, "disposal": 2},
                {"indices": f2, "left": 0, "top": 0},
            ],
            self.PAL,
            background=0,
        )
        frames = decode_gif_frames(payload)
        _, a1 = frames[1]
        _, a2 = frames[2]
        assert (a1[1, 1] == [0, 255, 0]).all()
        # after disposal the 2x2 region is background black, rest red
        assert (a2[1, 1] == [0, 0, 0]).all()
        assert (a2[3, 3] == [255, 0, 0]).all()
        assert (a2[0, 0] == [0, 0, 255]).all()

    def test_first_frame_matches_single_frame_decoder(self):
        from sparkplug_spark.operators.gif import (
            decode_gif,
            decode_gif_frames,
            encode_gif,
            encode_gif_anim,
        )

        rng = np.random.default_rng(3)
        f0 = rng.integers(0, 4, size=(6, 5))
        anim = encode_gif_anim([{"indices": f0}], self.PAL)
        assert (decode_gif_frames(anim)[0][1]
                == decode_gif(encode_gif(f0, self.PAL))).all()

    def test_gif_feeds_video_scene_pipeline(self, spark):
        """video_dhash -> video_scenes -> scene_keyframes on an animated
        GIF: scene boundaries land where the GIF content jumps."""
        from sparkplug_spark.operators import (
            scene_keyframes,
            video_dhash,
            video_scenes,
        )
        from sparkplug_spark.operators.gif import encode_gif_anim

        pal = np.repeat(np.arange(64, dtype=np.uint8)[:, None], 3, axis=1)
        y, x = np.mgrid[0:16, 0:18]
        a = (3 * y + 5 * x) % 57 + 1
        b = (11 * y + 7 * x + 30) % 57 + 1
        frames = [
            {"indices": p, "delay_cs": 100} for p in (a, a, a, b, b)
        ]
        gif = encode_gif_anim(frames, pal)
        df = spark.createDataFrame([(1, gif)], "doc_id long, payload binary")
        hashes = video_dhash(df, every_ms=1000, decoder="real")
        scenes = {
            r["scene_idx"]: (r["start_frame_idx"], r["n_frames"])
            for r in video_scenes(hashes, max_hamming=5).collect()
        }
        assert scenes == {0: (0, 3), 1: (3, 2)}
        keys = {
            r["scene_idx"]: r["keyframe_idx"]
            for r in scene_keyframes(hashes, max_hamming=5).collect()
        }
        assert keys == {0: 1, 1: 3}
