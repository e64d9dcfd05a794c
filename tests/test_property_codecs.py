"""Property-based gates for the native image codecs.

The PNG decoder must invert ANY spec-conformant encoder output exactly
(lossless format); the JPEG codec must be exact on its lossless subspace
(uniform blocks with quantization-surviving DC) and error-bounded
elsewhere.  Hypothesis draws image shapes, contents, filter mixes, and
sampling modes adversarially; pixels run pure numpy (no Spark job — the
Spark plumbing is pinned by the deterministic tests)."""

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from sparkplug_spark.operators.jpeg import decode_jpeg, encode_jpeg_baseline
from sparkplug_spark.operators.multimodal import (
    _native_image_resize,
    _png_pixels,
    _png_pixels_raw,
    encode_png_rgb8,
)

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

shapes = st.tuples(st.integers(1, 24), st.integers(1, 24))
filter_mixes = st.lists(st.integers(0, 4), min_size=1, max_size=6)


@st.composite
def rgb_images(draw):
    h, w = draw(shapes)
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8
    )


@given(img=rgb_images(), filters=filter_mixes)
@settings(**_SETTINGS)
def test_png_roundtrip_is_exact(img, filters):
    px, color = _png_pixels_raw(encode_png_rgb8(img, filters=filters))
    assert color == 2
    assert np.array_equal(px, img)


@given(img=rgb_images(), filters=filter_mixes)
@settings(**_SETTINGS)
def test_png_gray_view_is_channel_mean(img, filters):
    gray = _png_pixels(encode_png_rgb8(img, filters=filters))
    exp = (img.astype(np.float64) / 255.0).mean(axis=2)
    assert np.allclose(gray, exp, atol=0, rtol=0)


@given(
    v=st.integers(0, 127),
    blocks=st.tuples(st.integers(1, 3), st.integers(1, 3)),
)
@settings(**_SETTINGS)
def test_jpeg_lossless_subspace_any_block_grid(v, blocks):
    """Uniform 8x8 blocks at even gray levels decode bit-exactly for any
    block grid — the DC predictor chain cannot leak across blocks."""
    by, bx = blocks
    img = np.zeros((by * 8, bx * 8), dtype=np.uint8)
    for y in range(by):
        for x in range(bx):
            img[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] = (
                2 * v + 2 * (y * bx + x)
            ) % 256 // 2 * 2  # even level per block
    dec = decode_jpeg(encode_jpeg_baseline(img, quant_dc=16))[:, :, 0]
    assert np.array_equal(dec, img)


@given(
    img=rgb_images(),
    sampling=st.sampled_from(["4:4:4", "4:2:0"]),
    rst=st.integers(0, 3),
)
@settings(**_SETTINGS)
def test_jpeg_decode_error_is_bounded_and_rst_invariant(img, sampling, rst):
    enc = encode_jpeg_baseline(img, sampling=sampling, restart_interval=rst)
    dec = decode_jpeg(enc)
    assert dec.shape == img.shape
    # restart markers must never change a single pixel
    plain = decode_jpeg(encode_jpeg_baseline(img, sampling=sampling))
    assert np.array_equal(dec, plain)
    if sampling == "4:4:4":
        # luma-only bound: q=16/32 keeps the Y error modest; chroma
        # error on adversarial noise can be larger, so bound Y
        y_in = (
            0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
        )
        y_out = (
            0.299 * dec[:, :, 0] + 0.587 * dec[:, :, 1] + 0.114 * dec[:, :, 2]
        )
        assert np.abs(y_in - y_out).max() < 90


@given(img=rgb_images(), out=st.tuples(st.integers(1, 16), st.integers(1, 16)))
@settings(**_SETTINGS)
def test_native_resize_samples_exact_grid(img, out):
    w, h = out
    png = encode_png_rgb8(img)
    px, _ = _png_pixels_raw(_native_image_resize(png, w, h))
    sh, sw = img.shape[:2]
    ys = (np.arange(h) * sh) // h
    xs = (np.arange(w) * sw) // w
    assert np.array_equal(px, img[np.ix_(ys, xs)])
