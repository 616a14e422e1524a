"""Video near-dup tier (operators/video.py): real y4m decode, the
temporal-majority fingerprint's closed-form fixture geometry, blocking
completeness vs brute force, and the shared fp-store lifecycle contract
inherited verbatim from the image/audio tiers."""

from __future__ import annotations

import os
import shutil

import pytest

from big_data_analysis_spark.operators import multimodal as mm
from big_data_analysis_spark.operators import video as vd


def _manual_y4m(frames, colorspace=b"Cmono", w=9, h=8, chroma_bytes=0):
    """Hand-rolled y4m payload so the parser is tested against bytes we
    wrote ourselves, not against the synthesizer."""
    out = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 %s\n" % (w, h, colorspace)]
    for f in frames:
        out.append(b"FRAME\n")
        out.append(f.astype("uint8").tobytes())
        out.append(b"\x80" * chroma_bytes)
    return b"".join(out)


def test_y4m_decode_is_real():
    """The stdlib y4m parser really reads the format: frame offsets,
    luma matrices, chroma stepping for 420, and loud failures on
    corrupt payloads."""
    import numpy as np

    f0 = np.arange(72, dtype=np.uint8).reshape(8, 9)
    f1 = (np.arange(72, dtype=np.uint8) * 3 % 251).reshape(8, 9)
    mono = _manual_y4m([f0, f1])
    w, h, ysize, offs = vd._y4m_frame_offsets(mono)
    assert (w, h, ysize, len(offs)) == (9, 8, 72, 2)
    assert (vd._y4m_luma_frame(mono, offs[0], w, h) == f0).all()
    assert (vd._y4m_luma_frame(mono, offs[1], w, h) == f1).all()

    # C420 carries half/half U+V planes: the luma plane must still come
    # back exactly, which proves the chroma step arithmetic
    g0 = np.arange(80, dtype=np.uint8).reshape(8, 10)
    c420 = _manual_y4m([g0, g0], colorspace=b"C420jpeg", w=10, h=8,
                       chroma_bytes=(10 // 2) * (8 // 2) * 2)
    w2, h2, _, offs2 = vd._y4m_frame_offsets(c420)
    assert len(offs2) == 2
    assert (vd._y4m_luma_frame(c420, offs2[1], w2, h2) == g0).all()

    for bad in (
        b"RIFF1234",                        # wrong magic
        b"YUV4MPEG2 W9 H8",                 # no newline
        b"YUV4MPEG2 H8\nFRAME\n" + b"x" * 72,   # missing W
        mono[:-10],                          # truncated raster
        mono[: mono.find(b"FRAME")] + b"FRAMX\n" + b"x" * 72,  # bad marker
        _manual_y4m([]),                     # zero frames
        b"YUV4MPEG2 W9 H8 C999\nFRAME\n" + b"x" * 72,  # unknown colorspace
    ):
        with pytest.raises(ValueError):
            vd._y4m_frame_offsets(bad)

    # >8-bit variants and 444alpha are rejected BY NAME — sizing their
    # 2-byte (or 4-plane) rasters as 8-bit would mis-align frame
    # stepping and surface as a misleading "expected FRAME marker"
    # error instead of the real cause (ADVICE r11)
    for cs in (b"C420p10", b"C422p12", b"C444p16", b"Cmono10", b"Cmono12"):
        deep = b"YUV4MPEG2 W9 H8 %s\nFRAME\n" % cs + b"x" * 288
        with pytest.raises(ValueError, match="bit"):
            vd._y4m_frame_offsets(deep)
    alpha = b"YUV4MPEG2 W9 H8 C444alpha\nFRAME\n" + b"x" * 288
    with pytest.raises(ValueError, match="alpha"):
        vd._y4m_frame_offsets(alpha)
    # ...but legitimate 8-bit names that merely CONTAIN 'p' still parse
    # (420paldv is a real spec value, not a bit-depth suffix)
    pal = _manual_y4m(
        [np.arange(80, dtype=np.uint8).reshape(8, 10)],
        colorspace=b"C420paldv", w=10, h=8,
        chroma_bytes=(10 // 2) * (8 // 2) * 2,
    )
    assert len(vd._y4m_frame_offsets(pal)[3]) == 1


def test_video_fp_bits_majority():
    """Strict-majority semantics, pure function: 2-of-3 sets a bit,
    1-of-3 does not, and an exact tie falls to unset."""
    assert vd.video_fp_bits([0b1011, 0b0011, 0b0100]) == 0b0011
    assert vd.video_fp_bits([0b1, 0b1, 0]) == 0b1
    assert vd.video_fp_bits([0b1, 0]) == 0          # tie -> unset
    assert vd.video_fp_bits([-1, -1, 0]) == -1      # signed packing
    with pytest.raises(ValueError):
        vd.video_fp_bits([])


def test_video_fingerprint_closed_form(spark):
    """The landmark fixture through the REAL pipeline: clip fingerprint
    == bits {0..level-1} exactly — the scene-cut frames (level 0, 3 of
    9) are genuinely outvoted by the 6 perturbed frames — and corrupt
    payloads become vfp_error rows, not job failures."""
    ids = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    clips = vd.synthesize_landmark_y4ms(ids, "doc_id")
    got = {
        r["id"]: (r["vfp"], r["n_frames"], r["width"], r["height"])
        for r in vd.video_fingerprint(clips, "content", "doc_id").collect()
    }
    levels = (0, 1, 2, 3, 8)

    def mask(level: int) -> int:
        # flip k perturbs grid comparison (k // 4, 2 * (k % 4)) ->
        # dHash bit 8 * (k // 4) + 2 * (k % 4); nested but not
        # contiguous, so hamming(a, b) == |level_a - level_b| holds
        return sum(1 << (8 * (k // 4) + 2 * (k % 4)) for k in range(level))

    for i in range(10):
        assert got[i] == (mask(levels[i % 5]), 9, 9, 8), f"clip {i}"

    # per-frame check: a cut frame alone hashes to 0, a perturbed frame
    # to the nested mask — i.e. the majority is doing real work
    content = clips.filter("doc_id = 3").head()["content"]
    w, h, _, offs = vd._y4m_frame_offsets(content)
    per_frame = [
        mm.dhash_bits(vd._y4m_luma_frame(content, o, w, h)) for o in offs
    ]
    assert [per_frame[j] for j in (0, 4, 8)] == [0, 0, 0]
    assert all(per_frame[j] == mask(3) for j in range(9) if j % 4 != 0)

    bad = spark.createDataFrame(
        [(99, b"MPEG not really"), (100, None)], "doc_id long, content binary"
    )
    err = vd.video_fingerprint(bad, "content", "doc_id").collect()
    assert all(r["vfp"] is None and r["vfp_error"] for r in err)


def test_video_fingerprint_samples_long_clips(spark):
    """Per-clip decode cost is bounded by n_samples: a 101-frame clip
    fingerprints from 9 sampled frames, reports the TRUE frame count,
    and (fixture invariant: every non-cut frame carries the same level)
    still lands on the closed-form mask. Sampling indices are the
    sample_frames inclusive-uniform policy."""
    assert vd._sample_indices(101, 9) == [0, 12, 25, 38, 50, 62, 75, 88, 100]
    assert vd._sample_indices(5, 9) == [0, 1, 2, 3, 4]
    assert vd._sample_indices(7, 1) == [0]
    ids = spark.createDataFrame([(8,)], "doc_id long")  # level 3 row
    clips = vd.synthesize_landmark_y4ms(ids, "doc_id", n_frames=101)
    row = vd.video_fingerprint(clips, "content", "doc_id", n_samples=9).head()
    # sampled indices {0, 12, ..., 100}: cut frames in the sample are
    # {0, 12, 88, 100} (j % 4 == 0), a 5-of-9 perturbed strict
    # majority; level 3 -> dHash bits {0, 2, 4} (nested flip geometry)
    assert (row["vfp"], row["n_frames"]) == (0b10101, 101)


def test_video_near_dup_pairs_matches_bruteforce(spark):
    """Blocking completeness on video: the Manku banded join finds
    exactly the pairs a brute-force all-pairs hamming join finds, and
    decode-error rows are excluded rather than crashing the join."""
    ids = spark.createDataFrame([(i,) for i in range(25)], "doc_id long")
    hashed = vd.video_fingerprint(
        vd.synthesize_landmark_y4ms(ids, "doc_id"), "content", "doc_id"
    ).localCheckpoint(eager=True)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in vd.video_near_dup_pairs(hashed, max_hamming=3).collect()
    }
    rows = {r["id"]: r["vfp"] for r in hashed.collect()}
    brute = {}
    for a in rows:
        for b in rows:
            if a < b:
                h = bin((rows[a] ^ rows[b]) & ((1 << 64) - 1)).count("1")
                if h <= 3:
                    brute[(a, b)] = h
    assert got == brute and len(brute) > 0
    levels = (0, 1, 2, 3, 8)
    assert all(
        h == abs(levels[a % 5] - levels[b % 5]) for (a, b), h in got.items()
    )
    with_bad = hashed.unionByName(
        spark.createDataFrame(
            [(999, None, None, None, None, "ValueError: x")], hashed.schema
        )
    )
    got2 = {
        (r["id_a"], r["id_b"])
        for r in vd.video_near_dup_pairs(with_bad, max_hamming=3).collect()
    }
    assert got2 == set(brute)


def test_video_dedup_increment_composes_with_batch(spark, request):
    """The video store rides the shared fp-store contract verbatim:
    incr(B) over index(A) == batch(A ∪ B) restricted to pairs touching
    B; overlap is loud by default; a version_tag replay re-emits the
    original pairs without appending; takedown masks pairs immediately;
    compact preserves content; NULL vfp raises; and the kind guard
    refuses to open a video store as an image store (or vice versa)."""
    path = f"/root/repo/.scratch/vfp-idx-{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    request.addfinalizer(lambda: shutil.rmtree(path, ignore_errors=True))

    ids_a = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    ids_b = spark.createDataFrame([(i,) for i in range(20, 35)], "doc_id long")
    ha = vd.video_fingerprint(vd.synthesize_landmark_y4ms(ids_a, "doc_id"),
                              "content", "doc_id").localCheckpoint(eager=True)
    hb = vd.video_fingerprint(vd.synthesize_landmark_y4ms(ids_b, "doc_id"),
                              "content", "doc_id").localCheckpoint(eager=True)
    vd.video_fp_index_save(ha, path)

    got, st = vd.video_dedup_increment(
        spark, hb, path, max_hamming=3, return_stats=True
    )
    got_set = {(r["id_a"], r["id_b"], r["hamming"]) for r in got.collect()}
    batch = vd.video_near_dup_pairs(ha.unionByName(hb), max_hamming=3)
    expect = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in batch.collect()
        if r["id_a"] >= 20 or r["id_b"] >= 20
    }
    assert got_set == expect and len(expect) > 0
    assert st == {"shard_rows": 15, "skipped_existing": 0, "indexed": 15,
                  "appended": True, "replayed": False}

    with pytest.raises(ValueError, match="already indexed"):
        vd.video_dedup_increment(spark, hb, path)
    ids_c = spark.createDataFrame([(i,) for i in range(35, 45)], "doc_id long")
    hc = vd.video_fingerprint(vd.synthesize_landmark_y4ms(ids_c, "doc_id"),
                              "content", "doc_id").localCheckpoint(eager=True)
    p1 = {tuple(r) for r in vd.video_dedup_increment(
        spark, hc, path, max_hamming=3, version_tag="b7").collect()}
    p2, st2 = vd.video_dedup_increment(
        spark, hc, path, max_hamming=3, version_tag="b7", return_stats=True)
    assert {tuple(r) for r in p2.collect()} == p1
    assert st2["replayed"] is True and st2["appended"] is False
    assert vd.video_fp_index_load(spark, path)[0].count() == 45

    vd.video_fp_index_delete(spark, path, [0])
    shard3 = spark.createDataFrame(
        [(100, int(ha.filter("id = 0").head()["vfp"]))], "id long, vfp long"
    )
    got3 = vd.video_dedup_increment(spark, shard3, path, max_hamming=0)
    assert not any(
        0 in (r["id_a"], r["id_b"]) for r in got3.collect()
    ), "deleted id still pairing"
    pre = {tuple(r) for r in vd.video_fp_index_load(spark, path)[0].collect()}
    vd.video_fp_index_compact(spark, path)
    post = {tuple(r) for r in vd.video_fp_index_load(spark, path)[0].collect()}
    assert post == pre and 0 not in {i for i, _ in post}

    bad = spark.createDataFrame([(200, None)], "id long, vfp long")
    with pytest.raises(ValueError, match="NULL vfp"):
        vd.video_dedup_increment(spark, bad, path)
    with pytest.raises(ValueError, match="kind"):
        mm.dhash_index_load(spark, path)
