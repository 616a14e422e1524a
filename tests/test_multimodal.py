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
