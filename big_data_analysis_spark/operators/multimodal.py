"""Multimodal (image/audio/video) column operators (north star;
SURVEY.md §2.1 S4-S5, §2.10 M25-M26).

Design: media are opaque ``binary`` columns with typed metadata, ingested
via the binaryFile source (io.read_binary_files). Decode / resize /
feature-extract run as Arrow-batched pandas functions over mapInPandas —
the Spark-side plumbing (schemas, batch shape, partitioning) is real and
tested; the actual codec call is stubbed behind ``DECODERS`` because
image/audio libraries are not in this container (container constraint,
not a design gap — drop PIL/torchvision into ``DECODERS`` on a real
cluster and nothing else changes; reference behavior at
猫狗大战分类.py:148-152 incl. corrupt-file tolerance).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the decode stage: one row per media item.
DECODE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("label", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
        StructField("decode_error", StringType()),
    ]
)


def _fake_decode(content: bytes, feature_dim: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real image decode: derives a fake
    (width, height) and a feature vector from a crc32 rolling hash of the
    bytes. Replace with PIL/torchvision on a cluster with codecs.
    Raises on empty/truncated input to exercise the corrupt-file path
    (note the binaryFile source itself silently skips 0-byte files)."""
    if not content or len(content) < 4:
        raise ValueError("empty or truncated media payload")
    h = zlib.crc32(content)
    width = 64 + (h % 512)
    height = 64 + ((h >> 9) % 512)
    feats, acc = [], h
    for chunk_start in range(feature_dim):
        acc = zlib.crc32(content, acc + chunk_start)
        feats.append((acc % 10_000) / 10_000.0)
    return width, height, feats


#: Decoder registry: media_kind -> callable(bytes) -> (w, h, features).
#: Real codecs (PIL, torchaudio, pyav) plug in here on a full cluster.
DECODERS = {"image": _fake_decode, "audio": _fake_decode, "video": _fake_decode}


def catalog_from_paths(binary_df: DataFrame, label_pattern: str = r"([a-z]+)\.\d+") -> DataFrame:
    """S4: filename-derived labels (reference 猫狗大战分类.py:62-64
    'cat.123.jpg' -> 'cat'): regexp over the binaryFile path column."""
    fname = F.element_at(F.split(F.col("path"), "/"), -1)
    return binary_df.withColumn("label", F.regexp_extract(fname, label_pattern, 1))


def decode_media(
    df: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    label_col: str = "label",
    media_kind: str = "image",
    feature_dim: int = 8,
) -> DataFrame:
    """S5/M26: decode + featurize a binary media column via mapInPandas.

    Arrow-batched: each partition streams pandas batches through the
    decoder; corrupt files yield a row with ``decode_error`` set instead
    of failing the job (reference 猫狗大战分类.py:150-152 skips corrupt
    files). Partition count governs decode parallelism — repartition
    upstream to saturate executors.
    """
    decoder = DECODERS[media_kind]
    has_label = label_col in df.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                content = row[content_col]
                out = {
                    "path": row[path_col],
                    "label": row[label_col] if has_label else None,
                    "n_bytes": len(content) if content is not None else 0,
                    "width": None,
                    "height": None,
                    "features": None,
                    "decode_error": None,
                }
                try:
                    w, h, feats = decoder(content, feature_dim)
                    out.update(width=w, height=h, features=feats)
                except Exception as exc:  # corrupt-file tolerance
                    out["decode_error"] = f"{type(exc).__name__}: {exc}"
                rows.append(out)
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_SCHEMA.fields])

    cols = [path_col, content_col] + ([label_col] if has_label else [])
    return df.select(*cols).mapInPandas(batches, schema=DECODE_SCHEMA)


def media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap metadata without decoding: byte size + magic-number sniff —
    pure expressions, no Python."""
    content = F.col(content_col)
    magic = F.hex(F.substring(content, 1, 4))
    return df.withColumn("n_bytes", F.length(content)).withColumn(
        "format_sniff",
        F.when(magic.startswith("FFD8"), "jpeg")
        .when(magic.startswith("89504E47"), "png")
        .when(magic.startswith("52494646"), "riff")
        .otherwise("unknown"),
    )
