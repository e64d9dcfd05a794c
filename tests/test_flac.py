"""Native FLAC codec: bit-exact roundtrips (lossless), subframe and
stereo-decorrelation coverage, WAV-equivalence of the feature path."""

import io
import struct
import wave

import numpy as np
import pytest

from sparkplug_spark.operators.flac import decode_flac, encode_flac


def _wav_bytes(samples: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    a = samples if samples.ndim == 2 else samples[:, None]
    w.setnchannels(a.shape[1])
    w.setsampwidth(2)
    w.setframerate(rate)
    w.writeframes(a.astype("<i2").tobytes())
    w.close()
    return buf.getvalue()


class TestFlacRoundtrip:
    def test_verbatim_mono_multiframe(self):
        rng = np.random.default_rng(11)
        x = rng.integers(-(2**15), 2**15, 50, dtype=np.int64)
        dec, rate, bps = decode_flac(encode_flac(x, block_size=16))
        assert (rate, bps) == (8000, 16)
        assert np.array_equal(dec[:, 0], x)

    def test_stereo_independent_and_left_side(self):
        rng = np.random.default_rng(12)
        st = rng.integers(-(2**15), 2**15, (40, 2), dtype=np.int64)
        for mode in ("independent", "left_side"):
            dec, _, _ = decode_flac(
                encode_flac(st, block_size=16, stereo_mode=mode)
            )
            assert np.array_equal(dec, st), mode

    def test_constant_and_fixed_rice(self):
        c = np.full(32, 123, dtype=np.int64)
        dec, _, _ = decode_flac(encode_flac(c, block_size=16, mode="constant"))
        assert np.array_equal(dec[:, 0], c)
        rng = np.random.default_rng(13)
        ramp = (np.cumsum(rng.integers(-40, 40, 60)) + 1000).astype(np.int64)
        rice = encode_flac(ramp, block_size=20, mode="fixed1")
        dec, _, _ = decode_flac(rice)
        assert np.array_equal(dec[:, 0], ramp)
        # the predictive coding actually compresses vs verbatim
        assert len(rice) < len(encode_flac(ramp, block_size=20))

    def test_boundaries(self):
        with pytest.raises(NotImplementedError, match="Ogg"):
            decode_flac(b"OggS" + b"\x00" * 60)
        with pytest.raises(NotImplementedError, match="FLAC"):
            decode_flac(b"RIFF" + b"\x00" * 60)
        ok = encode_flac(np.arange(20, dtype=np.int64), block_size=16)
        with pytest.raises(NotImplementedError):
            decode_flac(ok[: len(ok) - 5])  # truncated final frame


class TestFlacFeaturePath:
    def test_flac_features_equal_wav_features(self):
        """Lossless codec ⇒ the audio feature pipeline must produce
        BIT-IDENTICAL features from the FLAC and WAV encodings of the
        same PCM."""
        from sparkplug_spark.operators.multimodal import _real_audio_features

        rng = np.random.default_rng(14)
        pcm = rng.integers(-(2**14), 2**14, (400, 2), dtype=np.int64)
        f_wav = _real_audio_features(_wav_bytes(pcm), 25, 8)
        f_flac = _real_audio_features(
            encode_flac(pcm, block_size=64, stereo_mode="left_side"), 25, 8
        )
        assert f_wav == f_flac

    def test_flac_through_spark(self, spark):
        from sparkplug_spark.operators.multimodal import extract_audio_features

        rng = np.random.default_rng(15)
        pcm = rng.integers(-(2**14), 2**14, 300, dtype=np.int64)
        payload = encode_flac(pcm, block_size=64, mode="fixed1")
        df = spark.createDataFrame([(1, payload)], "id long, payload binary")
        rows = extract_audio_features(
            df, frame_ms=25, n_mels=8, decoder="real"
        ).collect()
        feats = rows[0]["features"]
        assert len(feats) >= 1 and len(feats[0]) == 8

    def test_lossy_codecs_still_raise(self, spark):
        from sparkplug_spark.operators.multimodal import extract_audio_features

        mp3ish = b"\xff\xfb\x90\x00" + b"\x00" * 64
        df = spark.createDataFrame([(1, mp3ish)], "id long, payload binary")
        with pytest.raises(Exception, match="librosa|torchaudio"):
            extract_audio_features(df, decoder="real").collect()


def test_thousands_of_frames_valid_utf8_numbers():
    """Regression: frame numbers >= 2048 previously emitted an invalid
    2-byte UTF-8 form, making the stream undecodable."""
    x = np.arange(33000, dtype=np.int64) % 4000 - 2000
    dec, _, _ = decode_flac(encode_flac(x, block_size=16))  # 2063 frames
    assert np.array_equal(dec[:, 0], x)
