"""Mixed-modality cascade (operators/media_cascade.py): routing by
kind, uniform verdicts, decode-error handling, loud contract failures,
and version_tag replay across every touched store."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from big_data_analysis_spark.operators import dedup as dd
from big_data_analysis_spark.operators import media_cascade as mc
from big_data_analysis_spark.operators import multimodal as mm
from big_data_analysis_spark.operators import video as vd

LEVELS = (0, 1, 2, 10, 11, 12, 20, 21, 22, 30, 31)


def _text_cols(df):
    return df.withColumn("kind", F.lit("text")).withColumn(
        "content", F.lit(None).cast("binary")
    )


def _media_cols(df, kind):
    return df.withColumn("kind", F.lit(kind)).withColumn(
        "text", F.lit(None).cast("string")
    )


def _seed_all(spark, base):
    """Text stores seeded with unique-token bases for shard ids 0..19;
    media stores seeded with archive fingerprints ids X..X+5 (level
    index = id % 11 — X divisible by 11)."""
    from big_data_analysis_spark.queries import _casc_stream_base

    fp, mh, sh, ct = (f"{base}/txt/{p}" for p in ("fp", "mh", "sh", "ct"))
    seed = spark.range(20).select(
        (F.col("id") + 100000).alias("doc_id"),
        _casc_stream_base(F.col("id")).alias("text"),
    )
    dd.fingerprint_index_save(seed, "text", "doc_id", fp)
    dd.minhash_index_save(
        seed, "text", "doc_id", mh, num_hashes=64, num_bands=16, shingle_n=3
    )
    dd.simhash_index_save(seed, "text", "doc_id", sh)
    dd.containment_index_save(seed, "text", "doc_id", ct, n=2, threshold=0.8)

    media = {}
    for kind, x, synth, fpr, save in (
        ("image", 11000, mm.synthesize_perturbed_pgms, mm.image_dhash,
         mm.dhash_index_save),
        ("audio", 22000, mm.synthesize_landmark_wavs, mm.audio_fingerprint,
         mm.audio_fp_index_save),
        ("video", 33000, vd.synthesize_landmark_y4ms, vd.video_fingerprint,
         vd.video_fp_index_save),
    ):
        ids = spark.range(x, x + 6).select(F.col("id").alias("doc_id"))
        hashed = fpr(
            synth(ids, "doc_id", levels=LEVELS), "content", "doc_id"
        )
        path = f"{base}/{kind}"
        save(hashed.filter(F.col(hashed.columns[-1]).isNull()), path)
        media[kind] = path
    return (fp, mh, sh, ct), media


def _shard(spark):
    """Mixed shard: 20 text docs (classes id % 4: exact / jaccard /
    containment / kept vs the seeded bases) + 11 docs per media kind at
    ids X+110..X+120 (level index j = id % 11; archive covers indices
    0..5, so j in {6, 9} start new clusters -> kept)."""
    from big_data_analysis_spark.queries import _casc_stream_text

    t = _text_cols(
        spark.range(20).select(F.col("id").alias("doc_id")).withColumn(
            "text", _casc_stream_text("doc_id")
        )
    )
    parts = [t]
    for kind, x, synth in (
        ("image", 11000, mm.synthesize_perturbed_pgms),
        ("audio", 22000, mm.synthesize_landmark_wavs),
        ("video", 33000, vd.synthesize_landmark_y4ms),
    ):
        ids = spark.range(x + 110, x + 121).select(F.col("id").alias("doc_id"))
        parts.append(_media_cols(synth(ids, "doc_id", levels=LEVELS), kind))
    cols = ["doc_id", "kind", "text", "content"]
    out = parts[0].select(cols)
    for p in parts[1:]:
        out = out.unionByName(p.select(cols))
    return out


def test_mixed_shard_verdicts_and_replay(spark, request):
    base = f"/root/repo/.scratch/mcasc-test-{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    request.addfinalizer(lambda: shutil.rmtree(base, ignore_errors=True))
    text_paths, media = _seed_all(spark, base)
    shard = _shard(spark).localCheckpoint(eager=True)

    got, st = mc.media_cascade_increment(
        spark, shard, text_paths, image_path=media["image"],
        audio_path=media["audio"], video_path=media["video"],
        version_tag="b0", return_stats=True,
    )
    rows = {r["doc_id"]: (r["kind"], r["tier"], r["kept"])
            for r in got.collect()}
    assert len(rows) == 20 + 3 * 11
    assert st["shard_rows"] == 53 and st["by_kind"]["text"] == 20

    text_tiers = ("exact", "jaccard", "containment", "kept")
    for i in range(20):
        want = text_tiers[i % 4]
        assert rows[i] == ("text", want, want == "kept"), f"text {i}"
    for kind, x in (("image", 11000), ("audio", 22000), ("video", 33000)):
        for j in range(11):
            want = "kept" if j in (6, 9) else kind
            assert rows[x + 110 + j] == (kind, want, want == "kept"), (
                kind, j
            )

    # replay with the SAME version_tag: every store's ledger fires and
    # the re-emitted verdicts are identical (no store double-appends)
    got2 = mc.media_cascade_increment(
        spark, shard, text_paths, image_path=media["image"],
        audio_path=media["audio"], video_path=media["video"],
        version_tag="b0",
    )
    rows2 = {r["doc_id"]: (r["kind"], r["tier"], r["kept"])
             for r in got2.collect()}
    assert rows2 == rows
    assert mm.dhash_index_load(spark, media["image"])[0].count() == 6 + 11
    assert vd.video_fp_index_load(spark, media["video"])[0].count() == 6 + 11


def test_decode_error_rows_and_loud_contracts(spark, request):
    base = f"/root/repo/.scratch/mcasc-err-{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    request.addfinalizer(lambda: shutil.rmtree(base, ignore_errors=True))
    text_paths, media = _seed_all(spark, base)

    # corrupt video payload -> decode_error verdict, kept=False; the
    # good sibling still dedups normally
    ids = spark.range(33110, 33112).select(F.col("id").alias("doc_id"))
    good = _media_cols(
        vd.synthesize_landmark_y4ms(ids, "doc_id", levels=LEVELS), "video"
    )
    bad = _media_cols(
        spark.createDataFrame(
            [(33999, b"not a y4m stream")], "doc_id long, content binary"
        ),
        "video",
    )
    cols = ["doc_id", "kind", "text", "content"]
    got, st = mc.media_cascade_increment(
        spark, good.select(cols).unionByName(bad.select(cols)),
        text_paths, image_path=media["image"], audio_path=media["audio"],
        video_path=media["video"], return_stats=True,
    )
    rows = {r["doc_id"]: (r["tier"], r["kept"]) for r in got.collect()}
    assert rows[33999] == ("decode_error", False)
    assert rows[33110] == ("video", False)   # archive covers level idx 0
    assert rows[33111] == ("video", False)
    # decode failures are accounted under their own stats key — NOT
    # folded into the genuine dedup catches (ADVICE r11)
    assert st["caught"] == {"video:video": 2}
    assert st["decode_errors"] == {"video": 1}
    assert st["kept"] == 0

    # a ZERO-ROW shard is a legal streaming no-op: an empty verdict
    # frame with the contract schema comes back, never a bare
    # TypeError from reducing zero frames (ADVICE r11)
    none = spark.createDataFrame(
        [], "doc_id long, kind string, text string, content binary"
    )
    empty, est = mc.media_cascade_increment(
        spark, none, text_paths, image_path=media["image"],
        audio_path=media["audio"], video_path=media["video"],
        return_stats=True,
    )
    assert empty.columns == ["doc_id", "kind", "tier", "kept"]
    assert empty.count() == 0
    assert dict(empty.dtypes)["doc_id"] == "bigint"
    assert est["shard_rows"] == 0 and est["by_kind"] == {}
    assert est["caught"] == {} and est["decode_errors"] == {}
    assert est["kept"] == 0

    # unknown kind and missing store path both raise up front
    weird = spark.createDataFrame(
        [(1, "pdf", None, None)],
        "doc_id long, kind string, text string, content binary",
    )
    with pytest.raises(ValueError, match="unknown kind"):
        mc.media_cascade_increment(spark, weird, text_paths)
    aud = spark.createDataFrame(
        [(22999, "audio", None, b"RIFFxxxx")],
        "doc_id long, kind string, text string, content binary",
    )
    with pytest.raises(ValueError, match="no store path"):
        mc.media_cascade_increment(spark, aud, text_paths)
