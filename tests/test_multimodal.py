"""Multimodal column tests (SURVEY.md §2.1 S4-S5, §2.10 M25-M26): the
Spark-side plumbing — binaryFile catalog, Arrow-batched decode via
mapInPandas, corrupt-file tolerance, metadata sniffing — is real and
tested; the codec itself is the documented deterministic stand-in."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from big_data_analysis_spark.io import read_binary_files
from big_data_analysis_spark.operators import multimodal as mm

SCRATCH = "/root/repo/.scratch/mm-tests"

# Tiny real file headers so format sniffing has something to see.
JPEG = b"\xff\xd8\xff\xe0" + b"fakejpegbody" * 20
PNG = b"\x89PNG\r\n\x1a\n" + b"fakepngbody" * 20
RIFF = b"RIFF\x24\x00\x00\x00WAVE" + b"fakewav" * 10


@pytest.fixture(scope="module")
def media_dir():
    shutil.rmtree(SCRATCH, ignore_errors=True)
    d = os.path.join(SCRATCH, "media")
    os.makedirs(d)
    for name, payload in [
        ("cat.1.jpg", JPEG),
        ("cat.2.jpg", JPEG + b"x"),
        ("dog.1.jpg", JPEG + b"yy"),
        ("dog.2.png", PNG),
        ("noise.1.wav", RIFF),
        ("corrupt.1.jpg", b"\x00"),  # truncated -> decode error path
    ]:
        with open(os.path.join(d, name), "wb") as f:
            f.write(payload)
    yield d
    shutil.rmtree(SCRATCH, ignore_errors=True)


def test_binary_catalog_and_labels(spark, media_dir):
    df = read_binary_files(spark, media_dir)
    assert df.count() == 6
    labeled = mm.catalog_from_paths(df)
    labels = {r["label"] for r in labeled.select("label").distinct().collect()}
    assert labels == {"cat", "dog", "noise", "corrupt"}


def test_metadata_sniff_without_decode(spark, media_dir):
    df = mm.media_metadata(read_binary_files(spark, media_dir))
    sniffed = {
        os.path.basename(r["path"]): r["format_sniff"]
        for r in df.select("path", "format_sniff").collect()
    }
    assert sniffed["cat.1.jpg"] == "jpeg"
    assert sniffed["dog.2.png"] == "png"
    assert sniffed["noise.1.wav"] == "riff"


def test_decode_media_batches_and_corrupt_tolerance(spark, media_dir):
    df = mm.catalog_from_paths(read_binary_files(spark, media_dir))
    decoded = mm.decode_media(df, feature_dim=8).cache()
    assert decoded.count() == 6

    ok = decoded.filter(F.col("decode_error").isNull())
    bad = decoded.filter(F.col("decode_error").isNotNull())
    assert ok.count() == 5
    assert bad.count() == 1
    assert "corrupt" in bad.head()["path"]

    # Deterministic fake decode: same bytes -> same features/dims.
    rows = {os.path.basename(r["path"]): r for r in ok.collect()}
    assert rows["cat.1.jpg"]["features"] == rows["cat.1.jpg"]["features"]
    assert all(len(r["features"]) == 8 for r in rows.values())
    assert all(r["width"] >= 64 and r["height"] >= 64 for r in rows.values())

    # Decoded features feed the similarity operators directly.
    emb = ok.select("path", F.col("features").alias("embedding"))
    from big_data_analysis_spark.operators.similarity import cosine

    first = emb.head()["embedding"]
    scored = emb.select(
        "path", cosine(F.col("embedding"), F.array(*[F.lit(float(v)) for v in first])).alias("sim")
    )
    sims = [r["sim"] for r in scored.collect()]
    assert any(abs(s - 1.0) < 1e-9 for s in sims)  # self-similarity


def _make_wav(n_frames=800, n_channels=1, freq=440.0, rate=8000):
    """Build a real PCM-16 WAV in memory with the stdlib only."""
    import io as _io
    import math
    import struct
    import wave as _wave

    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack(
                "<" + "h" * n_channels,
                *([int(20000 * math.sin(2 * math.pi * freq * i / rate))] * n_channels),
            )
            for i in range(n_frames)
        )
        w.writeframes(frames)
    return buf.getvalue()


def test_wav_decode_is_real(spark):
    """The audio path genuinely decodes PCM WAV (stdlib wave): frame and
    channel counts are exact and RMS features reflect the signal — no
    stub involved."""
    wav = _make_wav(n_frames=800, n_channels=2)
    silent = _make_wav(n_frames=800, n_channels=1, freq=0.0)
    df = spark.createDataFrame(
        [("a.wav", wav), ("b.wav", silent)], ["path", "content"]
    )
    out = {
        r["path"]: r
        for r in mm.decode_media(df, media_kind="audio", feature_dim=4).collect()
    }
    assert out["a.wav"]["decode_error"] is None
    assert out["a.wav"]["width"] == 800  # n_frames
    assert out["a.wav"]["height"] == 2  # n_channels
    # Sine RMS ~ amplitude/sqrt(2) normalized by int16 full scale.
    expected = 20000 / (2**15) / (2**0.5)
    for f in out["a.wav"]["features"]:
        assert abs(f - expected) < 0.05
    # freq=0 -> all samples 0 -> zero energy.
    assert all(f == 0.0 for f in out["b.wav"]["features"])


def test_wav_decode_corrupt_riff_is_error(spark):
    """A payload that CLAIMS RIFF/WAVE but doesn't parse must surface as
    a decode_error row (not fall back to the stub): decode failures and
    missing codecs are different conditions."""
    df = spark.createDataFrame([("bad.wav", RIFF)], ["path", "content"])
    row = mm.decode_media(df, media_kind="audio").head()
    assert row["decode_error"] is not None


def test_resize_images_plumbing(spark, media_dir):
    """M26 resize: without PIL the bytes pass through with method='stub';
    corrupt payloads yield resize_error rows. (With PIL installed the
    same call really re-encodes — covered by test_pil_real_decode.)"""
    df = read_binary_files(spark, media_dir)
    out = mm.resize_images(df, 32, 32).cache()
    assert out.count() == 6
    ok = out.filter(F.col("resize_error").isNull())
    rows = {os.path.basename(r["path"]): r for r in ok.collect()}
    assert all(r["width"] == 32 and r["height"] == 32 for r in rows.values())
    bad = out.filter(F.col("resize_error").isNotNull()).collect()
    assert len(bad) == 1 and "corrupt" in bad[0]["path"]
    if not mm._pil_available():
        assert all(r["method"] == "stub" for r in rows.values())
        assert rows["cat.1.jpg"]["content"] == JPEG  # pass-through


def test_pil_real_decode(spark):
    """Runs only where PIL exists: a real PNG decodes to its true
    dimensions and garbage raises through the real branch."""
    PIL = pytest.importorskip("PIL")
    import io as _io

    from PIL import Image

    buf = _io.BytesIO()
    Image.new("RGB", (40, 30), (255, 0, 0)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [("real.png", buf.getvalue()), ("junk.png", b"\x89PNGnotreally")],
        ["path", "content"],
    )
    out = {r["path"]: r for r in mm.decode_media(df, media_kind="image").collect()}
    assert out["real.png"]["width"] == 40 and out["real.png"]["height"] == 30
    assert out["junk.png"]["decode_error"] is not None
    resized = {r["path"]: r for r in mm.resize_images(df, 8, 8).collect()}
    assert resized["real.png"]["method"] == "pil"
    assert Image.open(_io.BytesIO(resized["real.png"]["content"])).size == (8, 8)


def test_augment_images_deterministic_params(spark, media_dir):
    """M26 randomized augmentations: parameters are derived from
    (path, seed) — identical across partitionings and re-runs (the
    Spark task-retry contract), different across seeds; corrupt
    payloads yield augment_error rows, never task failures."""
    df = read_binary_files(spark, media_dir)
    a1 = {r["path"]: r for r in mm.augment_images(df, seed=1).collect()}
    a1b = {r["path"]: r for r in mm.augment_images(df.repartition(5), seed=1).collect()}
    a2 = {r["path"]: r for r in mm.augment_images(df, seed=2).collect()}
    assert a1.keys() == a1b.keys() == a2.keys()
    for p in a1:
        assert (a1[p]["flipped"], a1[p]["angle"], a1[p]["brightness"]) == (
            a1b[p]["flipped"], a1b[p]["angle"], a1b[p]["brightness"]
        )
    # across seeds at least one parameter draw must differ somewhere
    assert any(
        (a1[p]["angle"], a1[p]["brightness"]) != (a2[p]["angle"], a2[p]["brightness"])
        for p in a1
    )
    # angle/brightness inside configured ranges
    ok = [r for r in a1.values() if r["augment_error"] is None]
    assert ok and all(-15.0 <= r["angle"] <= 15.0 for r in ok)
    assert all(0.8 <= r["brightness"] <= 1.2 for r in ok)
    bad = [r for r in a1.values() if r["augment_error"] is not None]
    assert len(bad) == 1 and "corrupt" in bad[0]["path"]


def test_augment_images_pil_branch(spark):
    """Where PIL exists: a flipped red/blue half image really flips
    (left column color swaps), and brightness=enhance really applies."""
    PIL = pytest.importorskip("PIL")
    import io as _io

    from PIL import Image

    img = Image.new("RGB", (20, 10), (255, 0, 0))
    for x in range(10, 20):
        for y in range(10):
            img.putpixel((x, y), (0, 0, 255))
    buf = _io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame([("half.png", buf.getvalue())], ["path", "content"])
    # find a seed whose draw flips this path
    for seed in range(40):
        row = mm.augment_images(
            df, flip_prob=0.5, max_rotate_deg=0.0, brightness_jitter=0.0, seed=seed
        ).head()
        if row["flipped"] == "h":
            out = Image.open(_io.BytesIO(row["content"]))
            assert out.getpixel((2, 5))[2] > 200  # blue now on the left
            assert row["method"] == "pil"
            break
    else:
        raise AssertionError("no flipping seed found in 40 tries — p < 1e-12")


def test_sample_frames_policies_and_determinism(spark):
    """Frame sampling: every_k strides from 0; n_samples spans first to
    last uniformly; per-frame features are deterministic in (bytes,
    frame_idx) across repartitionings; corrupt payloads yield
    decode_error rows instead of failing; metadata drives counts (no
    decode needed to enumerate)."""
    from big_data_analysis_spark.operators.multimodal import sample_frames

    rows = [
        ("v1", b"A" * 100, 10),
        ("v2", b"B" * 100, 3),
        ("corrupt", b"", 2),
    ]
    df = spark.createDataFrame(rows, "path string, content binary, n_frames long")

    out = {(r["path"], r["frame_idx"]): r for r in
           sample_frames(df, every_k=4).collect()}
    assert sorted(i for (p, i) in out if p == "v1") == [0, 4, 8]
    assert sorted(i for (p, i) in out if p == "v2") == [0]
    assert out[("corrupt", 0)]["decode_error"] is not None

    uni = sample_frames(df.filter("path = 'v1'"), n_samples=4).collect()
    assert sorted(r["frame_idx"] for r in uni) == [0, 3, 6, 9]
    over = sample_frames(df.filter("path = 'v2'"), n_samples=10).collect()
    assert sorted(r["frame_idx"] for r in over) == [0, 1, 2]

    a = {(r["path"], r["frame_idx"]): r["features"] for r in
         sample_frames(df, every_k=2).collect()}
    b = {(r["path"], r["frame_idx"]): r["features"] for r in
         sample_frames(df.repartition(7), every_k=2).collect()}
    assert a == b
    assert a[("v1", 0)] != a[("v1", 2)]  # features keyed by frame index

    import pytest

    with pytest.raises(ValueError, match="exactly one"):
        sample_frames(df)
    with pytest.raises(ValueError, match="exactly one"):
        sample_frames(df, every_k=2, n_samples=3)


def test_audio_spectral_features_match_local_numpy(spark):
    """The STFT feature extractor is deterministic float64 numpy: the
    executor's output must equal a local re-derivation exactly, the
    centroid must sit near the sine's frequency, and corrupt payloads
    yield error rows, not failures."""
    import numpy as np

    from big_data_analysis_spark.operators.multimodal import (
        audio_spectral_features,
    )

    wav = _make_wav(n_frames=2048, freq=1500.0, rate=8000)
    rows = [("a.wav", wav), ("bad.wav", b"not a wav")]
    df = spark.createDataFrame(rows, "path string, content binary")
    out = {r["path"]: r for r in audio_spectral_features(df).collect()}

    good = out["a.wav"]
    assert good["spectral_error"] is None
    assert good["n_frames"] == 2048 and good["sample_rate"] == 8000
    # centroid within half a bin of the tone (leakage spreads a little)
    assert abs(good["spectral_centroid"] - 1500.0) < 40.0
    # tone at 1500 Hz on 4 bands over 0-4000 Hz -> energy in band 1
    # (~1030-2015 Hz; 1500 sits mid-band, clear of the split edges)
    be = good["band_energies"]
    assert len(be) == 4 and be[1] == max(be) and be[1] > 50 * (be[0] + be[2] + be[3])

    # exact parity with a local recomputation of the same math
    x = np.frombuffer(
        __import__("wave").open(__import__("io").BytesIO(wav)).readframes(2048),
        dtype=np.int16,
    ).astype(np.float64) / 32768.0
    frames = (
        x[np.arange(256)[None, :] + 128 * np.arange(1 + (2048 - 256) // 128)[:, None]]
        * np.hanning(256)[None, :]
    )
    spec = (np.abs(np.fft.rfft(frames, axis=1)) ** 2).mean(axis=0)
    freqs = np.fft.rfftfreq(256, d=1.0 / 8000)
    assert good["rms"] == float(np.sqrt((x**2).mean()))
    assert good["spectral_centroid"] == float((freqs * spec).sum() / spec.sum())

    bad = out["bad.wav"]
    assert bad["spectral_error"] is not None and bad["rms"] is None


def test_image_dhash_monotone_under_perturbation(spark):
    """The dHash property the near-dup tier rides on: hamming distance
    grows EXACTLY with perturbation size on the synthesized fixtures
    (nested disjoint flips => hamming == |level_a - level_b|), through
    the REAL P5 decode path — and a corrupt payload yields an error
    row, never a job failure."""
    from big_data_analysis_spark.operators import multimodal as mm

    ids = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    imgs = mm.synthesize_perturbed_pgms(ids, "doc_id")  # levels 0,1,2,3,8
    hashed = {r["id"]: r for r in mm.image_dhash(imgs, "content", "doc_id").collect()}
    assert all(r["dhash_error"] is None for r in hashed.values())
    assert all((r["width"], r["height"]) == (9, 8) for r in hashed.values())
    levels = {i: (0, 1, 2, 3, 8)[i % 5] for i in range(10)}

    def ham(a, b):
        return bin((hashed[a]["dhash"] ^ hashed[b]["dhash"]) & ((1 << 64) - 1)).count("1")

    for a in range(10):
        for b in range(a + 1, 10):
            assert ham(a, b) == abs(levels[a] - levels[b]), (a, b)
    # monotone: strictly wider perturbation from the same base => more
    # flipped bits
    assert ham(0, 1) < ham(0, 2) < ham(0, 3) < ham(0, 4)

    # corrupt payloads: truncated raster and wrong magic both surface
    # as dhash_error rows
    bad = spark.createDataFrame(
        [(100, b"P5\n9 8\n255\n" + b"\x01" * 10), (101, b"JUNKBYTES")],
        "doc_id long, content binary",
    )
    got = {r["id"]: r for r in mm.image_dhash(bad, "content", "doc_id").collect()}
    assert got[100]["dhash"] is None and "truncated" in got[100]["dhash_error"]
    # non-PGM payload: PIL absent -> deterministic stub grid still
    # hashes (documented container fallback); with PIL it is a decode
    # error — either way no exception escapes
    assert got[101]["dhash"] is not None or got[101]["dhash_error"]


def test_image_near_dup_pairs_matches_bruteforce(spark):
    """Blocking completeness on images: the Manku banded join finds
    exactly the pairs a brute-force all-pairs hamming join finds, and
    decode-error rows are excluded rather than crashing the join."""
    from pyspark.sql import functions as F

    from big_data_analysis_spark.operators import multimodal as mm

    ids = spark.createDataFrame([(i,) for i in range(25)], "doc_id long")
    hashed = mm.image_dhash(
        mm.synthesize_perturbed_pgms(ids, "doc_id"), "content", "doc_id"
    ).localCheckpoint(eager=True)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm.image_near_dup_pairs(hashed, max_hamming=3).collect()
    }
    rows = {r["id"]: r["dhash"] for r in hashed.collect()}
    brute = {}
    for a in rows:
        for b in rows:
            if a < b:
                h = bin((rows[a] ^ rows[b]) & ((1 << 64) - 1)).count("1")
                if h <= 3:
                    brute[(a, b)] = h
    assert got == brute and len(brute) > 0
    # an error row must simply drop out of pair generation
    with_bad = hashed.unionByName(
        spark.createDataFrame(
            [(999, None, None, None, "ValueError: x")], hashed.schema
        )
    )
    got2 = {
        (r["id_a"], r["id_b"])
        for r in mm.image_near_dup_pairs(with_bad, max_hamming=3).collect()
    }
    assert got2 == set(brute)


def test_image_dedup_increment_composes_with_batch(spark, request):
    """The image store joins the incremental family contract:
    incr(B) over index(A) == batch(A ∪ B) restricted to pairs touching
    B; overlap is loud by default and 'skip' accounts it; takedown
    masks pairs immediately; compact preserves content; NULL dhash
    raises."""
    import os
    import shutil

    import pytest as _pytest

    from big_data_analysis_spark.operators import multimodal as mm

    path = f"/root/repo/.scratch/dhash-idx-{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    request.addfinalizer(lambda: shutil.rmtree(path, ignore_errors=True))

    ids_a = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    ids_b = spark.createDataFrame([(i,) for i in range(20, 35)], "doc_id long")
    ha = mm.image_dhash(mm.synthesize_perturbed_pgms(ids_a, "doc_id"),
                        "content", "doc_id").localCheckpoint(eager=True)
    hb = mm.image_dhash(mm.synthesize_perturbed_pgms(ids_b, "doc_id"),
                        "content", "doc_id").localCheckpoint(eager=True)
    mm.dhash_index_save(ha, path)

    got, st = mm.image_dedup_increment(
        spark, hb, path, max_hamming=3, return_stats=True
    )
    got_set = {(r["id_a"], r["id_b"], r["hamming"]) for r in got.collect()}
    batch = mm.image_near_dup_pairs(ha.unionByName(hb), max_hamming=3)
    expect = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in batch.collect()
        if r["id_a"] >= 20 or r["id_b"] >= 20
    }
    assert got_set == expect and len(expect) > 0
    assert st == {"shard_rows": 15, "skipped_existing": 0, "indexed": 15,
                  "appended": True, "replayed": False}

    # replay: loud by default, lossless accounting with 'skip'
    with _pytest.raises(ValueError, match="already indexed"):
        mm.image_dedup_increment(spark, hb, path)
    _, st2 = mm.image_dedup_increment(
        spark, hb, path, on_existing="skip", return_stats=True
    )
    assert st2["skipped_existing"] == 15 and st2["appended"] is False

    # takedown: a deleted image stops pairing immediately; identical
    # fingerprints re-ingest under a new id; compact preserves content
    mm.dhash_index_delete(spark, path, [0])
    shard3 = spark.createDataFrame(
        [(100, int(ha.filter("id = 0").head()["dhash"]))], "id long, dhash long"
    )
    got3 = mm.image_dedup_increment(spark, shard3, path, max_hamming=0)
    assert not any(
        0 in (r["id_a"], r["id_b"]) for r in got3.collect()
    ), "deleted id still pairing"
    pre = {tuple(r) for r in mm.dhash_index_load(spark, path)[0].collect()}
    mm.dhash_index_compact(spark, path)
    post = {tuple(r) for r in mm.dhash_index_load(spark, path)[0].collect()}
    assert post == pre and 0 not in {i for i, _ in post}

    # NULL dhash rejected loudly in save and increment
    bad = spark.createDataFrame([(200, None)], "id long, dhash long")
    with _pytest.raises(ValueError, match="NULL dhash"):
        mm.image_dedup_increment(spark, bad, path)


def test_image_increment_version_tag_replay(spark):
    """The dhash store's replay discipline (the fp store's version_tag
    contract at the image tier): a re-run of a tagged increment —
    before OR after a compaction folded the tagged dir away — re-emits
    the ORIGINAL pairs, appends nothing, and reports replayed=True."""
    path = os.path.join(SCRATCH, f"dh-tag-{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    ids_a = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    ids_b = spark.range(20, 35).withColumnRenamed("id", "doc_id")
    ha = mm.image_dhash(mm.synthesize_perturbed_pgms(ids_a, "doc_id"),
                        "content", "doc_id").localCheckpoint(eager=True)
    hb = mm.image_dhash(mm.synthesize_perturbed_pgms(ids_b, "doc_id"),
                        "content", "doc_id").localCheckpoint(eager=True)
    mm.dhash_index_save(ha.select("id", "dhash"), path)

    p1, s1 = mm.image_dedup_increment(
        spark, hb.select("id", "dhash"), path,
        max_hamming=3, return_stats=True, version_tag="batch-1",
    )
    set1 = {(r.id_a, r.id_b, r.hamming) for r in p1.collect()}
    assert s1["appended"] and not s1["replayed"] and len(set1) > 0

    # replay with the tagged dir still present
    p2, s2 = mm.image_dedup_increment(
        spark, hb.select("id", "dhash"), path,
        max_hamming=3, return_stats=True, version_tag="batch-1",
    )
    assert {(r.id_a, r.id_b, r.hamming) for r in p2.collect()} == set1
    assert s2 == {"shard_rows": 15, "skipped_existing": 0, "indexed": 0,
                  "appended": False, "replayed": True}

    # a compaction between crash and replay must not blind detection:
    # the tags ledger survives, and the replay re-derives identical
    # pairs from the compacted store minus the shard's own ids
    mm.dhash_index_compact(spark, path)
    import json
    man = json.load(open(os.path.join(path, "_INDEX.json")))
    assert man["tags"] == ["batch-1"] and len(man["dh_dirs"]) == 1
    p3, s3 = mm.image_dedup_increment(
        spark, hb.select("id", "dhash"), path,
        max_hamming=3, return_stats=True, version_tag="batch-1",
    )
    assert {(r.id_a, r.id_b, r.hamming) for r in p3.collect()} == set1
    assert s3["replayed"] and not s3["appended"]
    idx, _ = mm.dhash_index_load(spark, path)
    assert idx.count() == 35  # nothing double-appended anywhere
    shutil.rmtree(path, ignore_errors=True)


def test_multimodal_pipeline_gates_before_decode(spark, monkeypatch):
    """The pipeline's decode-compute claim: image_dhash (the only
    decode path) is called once and hashes EXACTLY the quality-gated
    population — never the full 200-image catalog — so the gate's
    selectivity is decode compute saved."""
    from big_data_analysis_spark.io import load_tables
    from big_data_analysis_spark.queries import QUERIES

    real = mm.image_dhash
    hashed_rows = []

    def counting(df, content_col="content", id_col="doc_id", hash_size=8):
        hashed_rows.append(df.count())
        return real(df, content_col, id_col, hash_size)

    monkeypatch.setattr(mm, "image_dhash", counting)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out = QUERIES["multimodal_corpus_pipeline"](spark, sf_dir)
    n_exported = out.count()

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    n_gated = d.filter((F.col("doc_id") < 200) & (n_tok >= 5)).count()
    assert hashed_rows == [n_gated], (hashed_rows, n_gated)
    assert 0 < n_exported <= 33  # one keeper per distinct fingerprint


# ---------------------------------------------------------------------------
# Audio near-duplicate tier (VERDICT r9 Next-round #2): the image tier's
# test battery on the spectral-contour fingerprint + the shared fp store.
# ---------------------------------------------------------------------------


def test_audio_fingerprint_monotone_under_perturbation(spark):
    """The spectral-fingerprint property the audio near-dup tier rides
    on: the landmark fixture's nested disjoint bit flips make
    hamming == |level_a - level_b| EXACTLY through the REAL wave
    decode + STFT path — and a corrupt payload yields an afp_error
    row, never a job failure."""
    ids = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    wavs = mm.synthesize_landmark_wavs(ids, "doc_id")  # levels 0,1,2,3,8
    hashed = {
        r["id"]: r
        for r in mm.audio_fingerprint(wavs, "content", "doc_id").collect()
    }
    assert all(r["afp_error"] is None for r in hashed.values())
    assert all(r["sample_rate"] == 8000 for r in hashed.values())
    levels = {i: (0, 1, 2, 3, 8)[i % 5] for i in range(10)}

    def ham(a, b):
        return bin(
            (hashed[a]["afp"] ^ hashed[b]["afp"]) & ((1 << 64) - 1)
        ).count("1")

    for a in range(10):
        for b in range(a + 1, 10):
            assert ham(a, b) == abs(levels[a] - levels[b]), (a, b)
    # monotone: strictly wider perturbation from the same base => more
    # flipped bits
    assert ham(0, 1) < ham(0, 2) < ham(0, 3) < ham(0, 4)
    # closed-form bit positions: level L sets exactly bits {2j: j < L}
    for i, r in hashed.items():
        exp = sum(1 << (2 * j) for j in range(levels[i]))
        exp = exp - (1 << 64) if exp >= 1 << 63 else exp
        assert r["afp"] == exp, (i, levels[i])

    # corrupt payloads: non-WAV bytes and NULL both surface as
    # afp_error rows
    bad = spark.createDataFrame(
        [(100, bytearray(b"JUNKBYTES")), (101, None)],
        "doc_id long, content binary",
    )
    got = {
        r["id"]: r
        for r in mm.audio_fingerprint(bad, "content", "doc_id").collect()
    }
    assert got[100]["afp"] is None and got[100]["afp_error"]
    assert got[101]["afp"] is None and got[101]["afp_error"]


def test_audio_near_dup_pairs_matches_bruteforce(spark):
    """Blocking completeness on audio: the Manku banded join finds
    exactly the pairs a brute-force all-pairs hamming join finds, and
    decode-error rows are excluded rather than crashing the join."""
    ids = spark.createDataFrame([(i,) for i in range(25)], "doc_id long")
    hashed = mm.audio_fingerprint(
        mm.synthesize_landmark_wavs(ids, "doc_id"), "content", "doc_id"
    ).localCheckpoint(eager=True)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm.audio_near_dup_pairs(hashed, max_hamming=3).collect()
    }
    rows = {r["id"]: r["afp"] for r in hashed.collect()}
    brute = {}
    for a in rows:
        for b in rows:
            if a < b:
                h = bin((rows[a] ^ rows[b]) & ((1 << 64) - 1)).count("1")
                if h <= 3:
                    brute[(a, b)] = h
    assert got == brute and len(brute) > 0
    # an error row must simply drop out of pair generation
    with_bad = hashed.unionByName(
        spark.createDataFrame(
            [(999, None, None, None, "ValueError: x")], hashed.schema
        )
    )
    got2 = {
        (r["id_a"], r["id_b"])
        for r in mm.audio_near_dup_pairs(with_bad, max_hamming=3).collect()
    }
    assert got2 == set(brute)


def test_audio_dedup_increment_composes_with_batch(spark, request):
    """The audio store rides the shared fp-store contract:
    incr(B) over index(A) == batch(A ∪ B) restricted to pairs touching
    B; overlap is loud by default and 'skip' accounts it; takedown
    masks pairs immediately; compact preserves content; NULL afp
    raises; a version_tag replay re-emits the original pairs without
    appending; and the kind guard refuses to open an audio store as an
    image store (or vice versa)."""
    path = f"/root/repo/.scratch/afp-idx-{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    request.addfinalizer(lambda: shutil.rmtree(path, ignore_errors=True))

    ids_a = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    ids_b = spark.createDataFrame([(i,) for i in range(20, 35)], "doc_id long")
    ha = mm.audio_fingerprint(mm.synthesize_landmark_wavs(ids_a, "doc_id"),
                              "content", "doc_id").localCheckpoint(eager=True)
    hb = mm.audio_fingerprint(mm.synthesize_landmark_wavs(ids_b, "doc_id"),
                              "content", "doc_id").localCheckpoint(eager=True)
    mm.audio_fp_index_save(ha, path)

    got, st = mm.audio_dedup_increment(
        spark, hb, path, max_hamming=3, return_stats=True
    )
    got_set = {(r["id_a"], r["id_b"], r["hamming"]) for r in got.collect()}
    batch = mm.audio_near_dup_pairs(ha.unionByName(hb), max_hamming=3)
    expect = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in batch.collect()
        if r["id_a"] >= 20 or r["id_b"] >= 20
    }
    assert got_set == expect and len(expect) > 0
    assert st == {"shard_rows": 15, "skipped_existing": 0, "indexed": 15,
                  "appended": True, "replayed": False}

    # replay: loud by default; version_tag replay is idempotent
    with pytest.raises(ValueError, match="already indexed"):
        mm.audio_dedup_increment(spark, hb, path)
    ids_c = spark.createDataFrame([(i,) for i in range(35, 45)], "doc_id long")
    hc = mm.audio_fingerprint(mm.synthesize_landmark_wavs(ids_c, "doc_id"),
                              "content", "doc_id").localCheckpoint(eager=True)
    p1 = {tuple(r) for r in mm.audio_dedup_increment(
        spark, hc, path, max_hamming=3, version_tag="b7").collect()}
    p2, st2 = mm.audio_dedup_increment(
        spark, hc, path, max_hamming=3, version_tag="b7", return_stats=True)
    assert {tuple(r) for r in p2.collect()} == p1
    assert st2["replayed"] is True and st2["appended"] is False
    assert mm.audio_fp_index_load(spark, path)[0].count() == 45

    # takedown: a deleted clip stops pairing immediately; identical
    # fingerprints re-ingest under a new id; compact preserves content
    mm.audio_fp_index_delete(spark, path, [0])
    shard3 = spark.createDataFrame(
        [(100, int(ha.filter("id = 0").head()["afp"]))], "id long, afp long"
    )
    got3 = mm.audio_dedup_increment(spark, shard3, path, max_hamming=0)
    assert not any(
        0 in (r["id_a"], r["id_b"]) for r in got3.collect()
    ), "deleted id still pairing"
    pre = {tuple(r) for r in mm.audio_fp_index_load(spark, path)[0].collect()}
    mm.audio_fp_index_compact(spark, path)
    post = {tuple(r) for r in mm.audio_fp_index_load(spark, path)[0].collect()}
    assert post == pre and 0 not in {i for i, _ in post}

    # NULL afp rejected loudly; kind guard both directions
    bad = spark.createDataFrame([(200, None)], "id long, afp long")
    with pytest.raises(ValueError, match="NULL afp"):
        mm.audio_dedup_increment(spark, bad, path)
    with pytest.raises(ValueError, match="kind"):
        mm.dhash_index_load(spark, path)


def test_audio_fp_bits_gain_invariant():
    """The fingerprint's robustness claim: the margin is RELATIVE
    (alpha * max bin), so a global gain change — the most common
    benign audio transform — scales every comparison uniformly and
    flips no bit. Pure numpy over random spectra; no Spark needed."""
    import numpy as np

    rng = np.random.default_rng(11)
    for _ in range(50):
        spec = rng.gamma(shape=1.5, scale=1.0, size=129)
        base = mm.audio_fp_bits(spec)
        for gain in (1e-3, 0.5, 7.0, 1e4):
            assert mm.audio_fp_bits(spec * gain) == base
    # and silence is the all-zero fingerprint (strict > on equal zeros)
    assert mm.audio_fp_bits(np.zeros(129)) == 0
