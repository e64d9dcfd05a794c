"""E204/E205: video keyframe dHash + audio fingerprint — cross-tier
consistency, near-dup recall, gain invariance, codec boundaries."""

import io
import struct
import wave

import numpy as np
import pytest


def _chunk(cid, body):
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _lst(form, body):
    return _chunk(b"LIST", form + body)


def _p5(seed, f):
    px = bytearray()
    for y in range(16):
        for x in range(18):
            px.append((seed * 7 + 3 * y + 5 * x + 11 * f) % 57 + 1)
    return b"P5\n18 16\n255\n" + bytes(px)


def _avi(frames, usec_per_frame=1_000_000):
    avih = _chunk(b"avih", struct.pack("<I", usec_per_frame) + b"\x00" * 52)
    movi = b"".join(_chunk(b"00dc", fr) for fr in frames)
    body = b"AVI " + _lst(b"hdrl", avih) + _lst(b"movi", movi)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _wav(samples, rate=8000):
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(rate)
    w.writeframes(np.asarray(samples).astype("<i2").tobytes())
    w.close()
    return buf.getvalue()


class TestVideoDhash:
    def test_frame_hashes_equal_image_dhash(self, spark):
        # the video tier must produce, per frame, the same hash the
        # image tier computes on that frame's payload
        from sparkplug_spark.operators import image_dhash, video_dhash

        vids = spark.createDataFrame(
            [(1, _avi([_p5(3, 0), _p5(3, 1)])),
             (2, _avi([_p5(9, 0)]))],
            "doc_id long, payload binary",
        )
        vh = {
            (r["doc_id"], r["frame_idx"]): (r["dhash_hi"], r["dhash_lo"])
            for r in video_dhash(vids, decoder="real").collect()
        }
        imgs = spark.createDataFrame(
            [(10, _p5(3, 0)), (11, _p5(3, 1)), (20, _p5(9, 0))],
            "doc_id long, payload binary",
        )
        ih = {
            r["doc_id"]: (r["dhash_hi"], r["dhash_lo"])
            for r in image_dhash(imgs).collect()
        }
        assert vh[(1, 0)] == ih[10]
        assert vh[(1, 1)] == ih[11]
        assert vh[(2, 0)] == ih[20]
        assert len(vh) == 3

    def test_near_dup_pairs_recall_and_exclusions(self, spark):
        from sparkplug_spark.operators import (
            video_dhash,
            video_near_dup_pairs,
        )

        def bright(frame):
            # +60 on the 2x2 top-left of the P5 raster (header is 14 B)
            b = bytearray(frame)
            for y in range(2):
                for x in range(2):
                    b[14 + y * 18 + x] += 60
            return bytes(b)

        f = [_p5(5, k) for k in range(3)]
        vids = spark.createDataFrame(
            [
                (1, _avi(f)),                          # original
                (2, _avi([bright(x) for x in f])),     # near-dup twin
                (3, _avi([_p5(12, k) for k in range(3)])),  # unrelated
            ],
            "doc_id long, payload binary",
        )
        pairs = {
            (r["doc_id_a"], r["doc_id_b"]): r
            for r in video_near_dup_pairs(
                video_dhash(vids, decoder="real")
            ).collect()
        }
        assert (1, 2) in pairs
        r = pairs[(1, 2)]
        assert r["coverage_ppm"] == 1_000_000 and r["near_dup"]
        assert r["n_frames_a"] == 3 and r["n_matched_a"] == 3
        # unrelated video never pairs; no self pairs by construction
        assert all(a != b and {a, b} != {1, 3} and {a, b} != {2, 3}
                   for a, b in pairs)


class TestAudioFingerprint:
    def _sig(self):
        i = np.arange(360, dtype=np.int64)
        return ((i * i) % 97) * 7 % 201 - 100

    def test_gain_invariance_and_flac_equals_wav(self, spark):
        from sparkplug_spark.operators import audio_fingerprint
        from sparkplug_spark.operators.flac import encode_flac

        s = self._sig()
        rows = [
            (1, _wav(s)),
            (2, _wav(s * 2)),                      # constant gain
            (3, encode_flac(s, block_size=64)),    # lossless re-encode
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {
            r["doc_id"]: (r["n_samples"], r["fp_hi"], r["fp_lo"])
            for r in audio_fingerprint(df).collect()
        }
        assert got[1] == got[2]  # gain never flips an energy/sign bit
        assert got[1] == got[3]  # FLAC decodes to identical PCM
        assert got[1][0] == 360

    def test_near_dup_within_radius_unrelated_outside(self, spark):
        from sparkplug_spark.operators import audio_fingerprint, dhash_pairs

        s = self._sig()
        s_sil = s.copy() * 2
        s_sil[:10] = 0  # silence block 0 at gain 2 — the fixture twin
        rng = np.random.default_rng(7)
        noise = rng.integers(-100, 100, 360)
        df = spark.createDataFrame(
            [(1, _wav(s)), (2, _wav(s_sil)), (3, _wav(noise))],
            "doc_id long, payload binary",
        )
        pairs = {
            (r["doc_id_a"], r["doc_id_b"]): r["hamming"]
            for r in dhash_pairs(
                audio_fingerprint(df),
                hi_col="fp_hi",
                lo_col="fp_lo",
                max_hamming=3,
            ).collect()
        }
        assert (1, 2) in pairs and pairs[(1, 2)] <= 3
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def test_boundaries_null_out(self, spark):
        from sparkplug_spark.operators import audio_fingerprint

        df = spark.createDataFrame(
            [(1, b"ID3\x03 lossy mp3 bytes"),       # codec boundary
             (2, _wav(np.arange(20))),              # too short
             (3, _wav(self._sig()))],
            "doc_id long, payload binary",
        )
        got = {r["doc_id"]: r["fp_hi"] for r in audio_fingerprint(df).collect()}
        assert got[1] is None and got[2] is None and got[3] is not None

    def test_stereo_and_pcm32_paths(self, spark):
        from sparkplug_spark.operators import audio_fingerprint

        s = self._sig()
        # stereo WAV with both channels equal: mono SUM = 2*s -> same
        # fingerprint as the gain-2 mono clip = same as mono s
        buf = io.BytesIO()
        w = wave.open(buf, "wb")
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        inter = np.empty(720, dtype=np.int64)
        inter[0::2] = s
        inter[1::2] = s
        w.writeframes(inter.astype("<i2").tobytes())
        w.close()
        df = spark.createDataFrame(
            [(1, _wav(s)), (2, buf.getvalue())],
            "doc_id long, payload binary",
        )
        got = {
            r["doc_id"]: (r["fp_hi"], r["fp_lo"])
            for r in audio_fingerprint(df).collect()
        }
        assert got[1] == got[2]


class TestDhashIncremental:
    """E213: batch-vs-store perceptual-hash dedup with atomic store."""

    def test_two_day_flow_and_twin(self, spark, tmp_path):
        from sparkplug_spark.operators import dhash_dedup_against
        from sparkplug_spark.sources import read_store

        store = str(tmp_path / "hashes")
        day1 = spark.createDataFrame(
            [(1, 10, 20), (2, 10, 21), (3, 9999, 12345)],
            "doc_id long, dhash_hi long, dhash_lo long",
        )
        r1 = {
            r["doc_id"]: (r["is_dup"], r["best_match_id"], r["best_hamming"])
            for r in dhash_dedup_against(day1, spark, store).collect()
        }
        # 20 vs 21 differ by 1 bit: the later id flags against the earlier
        assert r1[1] == (False, None, None)
        assert r1[2] == (True, 1, 1)
        assert r1[3] == (False, None, None)
        assert read_store(spark, store).count() == 3

        day2 = spark.createDataFrame(
            [(10, 10, 20),      # exact dup of stored 1
             (11, 9999, 12347), # hamming 1 from stored 3
             (12, 555, 666),    # novel
             (13, 555, 667)],   # within-batch dup of 12
            "doc_id long, dhash_hi long, dhash_lo long",
        )
        r2 = {
            r["doc_id"]: (r["is_dup"], r["best_match_id"], r["best_hamming"])
            for r in dhash_dedup_against(day2, spark, store).collect()
        }
        assert r2[10] == (True, 1, 0)
        assert r2[11][0] and r2[11][1] == 3
        assert r2[12] == (False, None, None)
        assert r2[13] == (True, 12, 1)
        assert read_store(spark, store).count() == 7

    def test_cross_table_join_complete_to_hamming3(self, spark):
        from sparkplug_spark.operators import dhash_join

        left = spark.createDataFrame(
            [(1, 0b1011, 0)], "doc_id long, dhash_hi long, dhash_lo long"
        )
        right = spark.createDataFrame(
            [(2, 0b1000, 0),   # hamming 2
             (3, 0b1011, 1),   # hamming 1
             (4, 0xF0F0, 0xFF)],  # far away
            "doc_id long, dhash_hi long, dhash_lo long",
        )
        got = {
            (r["doc_id_left"], r["doc_id_right"]): r["hamming"]
            for r in dhash_join(left, right).collect()
        }
        assert got == {(1, 2): 2, (1, 3): 1}


class TestVideoScenes:
    """E216: shot boundaries from consecutive-frame hamming."""

    def test_scene_grouping_from_real_demux(self, spark):
        from sparkplug_spark.operators import video_dhash, video_scenes

        # frames: A A B B A — two A-scenes split by the B shot
        frames = [_p5(4, 0), _p5(4, 0), _p5(9, 0), _p5(9, 0), _p5(4, 0)]
        vids = spark.createDataFrame(
            [(1, _avi(frames))], "doc_id long, payload binary"
        )
        scenes = {
            r["scene_idx"]: (r["start_frame_idx"], r["n_frames"],
                             r["max_step_hamming"])
            for r in video_scenes(
                video_dhash(vids, decoder="real"), max_hamming=5
            ).collect()
        }
        assert scenes[0] == (0, 2, 0)  # identical frames: step 0
        assert scenes[1][0] == 2 and scenes[1][1] == 2
        assert scenes[2] == (4, 1, 0)  # single-frame scene

    def test_null_hash_frames_excluded(self, spark):
        from sparkplug_spark.operators import video_scenes

        hashes = spark.createDataFrame(
            [(1, 0, 0, 5, 5), (1, 1, 1000, None, None), (1, 2, 2000, 5, 5)],
            "doc_id long, frame_idx int, frame_ts_ms long, "
            "dhash_hi long, dhash_lo long",
        )
        rows = video_scenes(hashes, max_hamming=3).collect()
        # the NULL frame disappears; frames 0 and 2 are identical -> one scene
        assert len(rows) == 1 and rows[0]["n_frames"] == 2


class TestAudioSegments:
    """E217: silence-split utterance runs with exact energies."""

    def test_hand_built_segments(self, spark):
        from sparkplug_spark.operators import audio_segments

        s = np.zeros(100, dtype=np.int64)
        s[10:30] = 50   # frames 1-2
        s[50:55] = 7    # part of frame 5
        df = spark.createDataFrame(
            [(1, _wav(s)), (2, b"ID3 lossy")],
            "doc_id long, payload binary",
        )
        segs = {
            (r["doc_id"], r["segment_idx"]): (r["start_frame"],
                                              r["n_frames"],
                                              r["energy_sum"])
            for r in audio_segments(df, frame_samples=10).collect()
        }
        assert segs[(1, 0)] == (1, 2, 20 * 50 * 50)
        assert segs[(1, 1)] == (5, 1, 5 * 7 * 7)
        # undecodable payload contributes nothing
        assert all(k[0] == 1 for k in segs)

    def test_partition_invariant(self, spark):
        from sparkplug_spark.operators import audio_segments

        i = np.arange(200, dtype=np.int64)
        clips = []
        for d in range(12):
            s = ((i * (d + 3)) % 91) - 45
            s[(i // 40) % 2 == 1] = 0
            clips.append((d, _wav(s)))
        df = spark.createDataFrame(clips, "doc_id long, payload binary")
        a = sorted(map(tuple, audio_segments(df).collect()))
        b = sorted(
            map(tuple, audio_segments(df.repartition(5)).collect())
        )
        assert a == b and len(a) > 0

    def test_long_clip_perf_floor(self, spark):
        """Kernel perf pin: the run extraction is vectorized (int64
        energies + boundary masks), never a per-frame Python loop — 8
        clips x 1M samples segment in seconds; the old object-dtype
        per-frame loop took minutes on this fixture."""
        import time

        from sparkplug_spark.operators import audio_segments

        rng = np.random.default_rng(7)
        i = np.arange(1_000_000, dtype=np.int64)
        clips = []
        for d in range(8):
            s = rng.integers(-30000, 30001, size=len(i), dtype=np.int64)
            # silence every other 10k-sample stretch -> 50 segments
            s[(i // 10_000) % 2 == 1] = 0
            clips.append((d, _wav(s)))
        df = spark.createDataFrame(clips, "doc_id long, payload binary")
        t0 = time.perf_counter()
        out = audio_segments(df, frame_samples=10).collect()
        wall = time.perf_counter() - t0
        assert len(out) == 8 * 50
        one = [r for r in out if r["doc_id"] == 0 and r["segment_idx"] == 0][0]
        assert one["n_frames"] == 1000 and one["start_frame"] == 0
        assert wall < 25.0, f"audio_segments kernel too slow: {wall:.1f}s"


class TestStreamingDhashFlags:
    """E218: ingest-time perceptual dedup stream tier."""

    def test_two_batch_stream_flags_against_store(self, spark, tmp_path):
        import time

        from sparkplug_spark.streaming import streaming_dhash_flags

        src = str(tmp_path / "src")
        store = str(tmp_path / "store")
        day1 = [(i, _p5(i % 3, 0)) for i in range(6)]
        day2 = [(i + 100, _p5(i % 3, 0)) for i in range(6)]  # all dups
        spark.createDataFrame(day1, "doc_id long, payload binary")\
            .coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)
        spark.createDataFrame(day2, "doc_id long, payload binary")\
            .coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("doc_id long, payload binary")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_dhash_flags(stream, store)
            .option("checkpointLocation", str(tmp_path / "chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        from sparkplug_spark.sources import read_store

        flags = spark.read.parquet(store + "_flags")
        got = {r["doc_id"]: r["is_dup"] for r in flags.collect()}
        assert len(got) == 12
        # every day-2 image repeats a day-1 pattern -> flagged
        assert all(got[i + 100] for i in range(6))
        # day-1: first occurrence of each of the 3 patterns is novel
        assert sum(1 for i in range(6) if not got[i]) == 3
        assert read_store(spark, store).count() == 12


def test_audio_fingerprints_share_incremental_store(spark, tmp_path):
    """E213 generalization: the audio tier (fp_hi/fp_lo) drives the same
    batch-vs-store machinery via hi_col/lo_col."""
    from sparkplug_spark.operators import audio_fingerprint, dhash_dedup_against

    i = np.arange(360, dtype=np.int64)
    s = ((i * i) % 97) * 7 % 201 - 100
    store = str(tmp_path / "audio_hashes")
    day1 = spark.createDataFrame([(1, _wav(s))], "doc_id long, payload binary")
    dhash_dedup_against(
        audio_fingerprint(day1), spark, store,
        hi_col="fp_hi", lo_col="fp_lo",
    ).collect()
    # day 2: a gain-2 re-encode must flag as an exact store dup
    day2 = spark.createDataFrame(
        [(2, _wav(s * 2))], "doc_id long, payload binary"
    )
    r = dhash_dedup_against(
        audio_fingerprint(day2), spark, store,
        hi_col="fp_hi", lo_col="fp_lo",
    ).collect()[0]
    assert r["is_dup"] and r["best_match_id"] == 1 and r["best_hamming"] == 0


def test_video_dhash_skips_codec_bound_containers(spark):
    """A single mkv payload must not kill a corpus sweep (review fix):
    video_dhash quarantines it as zero frames; the strict
    sample_video_frames default still raises at the boundary."""
    from sparkplug_spark.operators import video_dhash
    from sparkplug_spark.operators.multimodal import sample_video_frames

    mkv = b"\x1aE\xdf\xa3" + b"\x00" * 20
    vids = spark.createDataFrame(
        [(1, _avi([_p5(3, 0)])), (2, mkv)], "doc_id long, payload binary"
    )
    got = video_dhash(vids, decoder="real").collect()
    assert {r["doc_id"] for r in got} == {1}
    import pytest as _pytest

    with _pytest.raises(Exception, match="ffmpeg"):
        sample_video_frames(vids, decoder="real").collect()


def test_streaming_dhash_replay_guard(spark, tmp_path):
    """At-least-once safety (review fix): a fresh stream re-delivering
    the same batch ids against an up-to-date store is a NO-OP — without
    the guard every hash would self-match and the store would double."""
    import time

    from sparkplug_spark.sources import read_store
    from sparkplug_spark.streaming import streaming_dhash_flags

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    for b in range(2):
        spark.createDataFrame(
            [(b * 10 + i, _p5(i, 0)) for i in range(3)],
            "doc_id long, payload binary",
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    def run(chk):
        stream = (
            spark.readStream.schema("doc_id long, payload binary")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_dhash_flags(stream, store)
            .option("checkpointLocation", str(tmp_path / chk))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run("chk1")
    n1 = read_store(spark, store).count()
    flags1 = spark.read.parquet(store + "_flags").count()
    assert n1 == 6
    # fresh checkpoint -> Spark re-delivers batch ids 0 and 1
    run("chk2")
    assert read_store(spark, store).count() == n1
    assert spark.read.parquet(store + "_flags").count() == flags1


def test_scene_keyframes_pick_middle_frame(spark):
    """E220: keyframe = middle frame of each scene, hash attached."""
    from sparkplug_spark.operators import scene_keyframes, video_dhash

    # A A A | B | C C — scenes of 3, 1, 2 frames
    frames = [_p5(4, 0)] * 3 + [_p5(9, 0)] + [_p5(1, 0)] * 2
    vids = spark.createDataFrame(
        [(1, _avi(frames))], "doc_id long, payload binary"
    )
    hashes = video_dhash(vids, decoder="real")
    # threshold 0: a scene is a run of IDENTICAL frames (patterns 9 and
    # 1 happen to land within hamming 5 of each other)
    got = {
        r["scene_idx"]: (r["keyframe_idx"], r["scene_n_frames"])
        for r in scene_keyframes(hashes, max_hamming=0).collect()
    }
    assert got == {0: (1, 3), 1: (3, 1), 2: (4, 2)}
    # the keyframe carries the REAL hash of that frame
    hmap = {
        (r["doc_id"], r["frame_idx"]): (r["dhash_hi"], r["dhash_lo"])
        for r in hashes.collect()
    }
    rows = scene_keyframes(hashes, max_hamming=0).collect()
    for r in rows:
        assert (r["dhash_hi"], r["dhash_lo"]) == hmap[(1, r["keyframe_idx"])]


def test_scene_keyframes_codec_null_gap_mid_scene(spark):
    """E220 regression: a codec-bound (NULL-hash) frame in the middle of
    a scene must not poison the keyframe pick.  The old arithmetic
    middle (start + (n-1) div 2) could land exactly on the excluded
    frame_idx, emitting a NULL-hash keyframe or losing the scene; the
    member-rank pick selects a retained frame, always."""
    from sparkplug_spark.operators import scene_keyframes, video_scenes

    # one video: frames 0..4 identical hashes, but frame 2 (the
    # arithmetic middle of the 5-frame run) is codec-NULL
    rows = [
        (1, 0, 0, 7, 7),
        (1, 1, 1000, 7, 7),
        (1, 2, 2000, None, None),
        (1, 3, 3000, 7, 7),
        (1, 4, 4000, 7, 7),
        # second video: NULL at an arithmetic-middle position of a
        # 3-frame scene that follows a scene break
        (2, 0, 0, 0, 0),
        (2, 1, 1000, -1, -1),  # huge hamming -> break
        (2, 2, 2000, None, None),
        (2, 3, 3000, -1, -1),
        (2, 4, 4000, -1, -1),
    ]
    hashes = spark.createDataFrame(
        rows,
        "doc_id long, frame_idx int, frame_ts_ms long, "
        "dhash_hi long, dhash_lo long",
    )
    scenes = {
        (r["doc_id"], r["scene_idx"]): r["n_frames"]
        for r in video_scenes(hashes, max_hamming=5).collect()
    }
    # video 1: one 4-retained-frame scene; video 2: 1-frame + 3-frame
    assert scenes == {(1, 0): 4, (2, 0): 1, (2, 1): 3}
    got = {
        (r["doc_id"], r["scene_idx"]): (
            r["keyframe_idx"], r["dhash_hi"], r["scene_n_frames"])
        for r in scene_keyframes(hashes, max_hamming=5).collect()
    }
    # every scene keeps exactly one keyframe, never a NULL hash
    assert got == {
        (1, 0): (1, 7, 4),   # members 0,1,3,4 -> rank (4+1)//2=2 -> idx 1
        (2, 0): (0, 0, 1),
        (2, 1): (3, -1, 3),  # members 1,3,4 -> rank 2 -> idx 3
    }
