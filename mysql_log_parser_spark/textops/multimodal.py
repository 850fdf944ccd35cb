"""Multimodal column handling: image/audio/video as opaque `binary` columns
with typed metadata, processed by Arrow-batched pandas UDFs over mapInPandas.

The image/audio codecs are NOT available in this environment, so the decode
kernels are stubbed: `decoder="fake"` produces deterministic, seedless
outputs derived from the bytes themselves (so tests are real end-to-end runs
of the Spark plumbing — schema, batching, partitioning, UDF signature), and
`decoder="pil"` / `"librosa"` raise NotImplementedError with a clear message
until the libraries exist.  Swapping in a real decoder changes ONE function.

Schema conventions:

  media(id string, kind string, data binary, meta struct<width:int,
        height:int, sample_rate:int, n_frames:int>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("kind", StringType()),
        StructField("data", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _fake_decode(data: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decode+featurize: md5-seeded floats.
    Replace with a real decoder (PIL/librosa/av) when available."""
    h = hashlib.md5(data).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def _decode_batch(pdf: pd.DataFrame, decoder: str, dim: int) -> pd.DataFrame:
    if decoder == "fake":
        feats = [_fake_decode(bytes(d), dim) for d in pdf["data"]]
    elif decoder in ("pil", "librosa", "av"):
        raise NotImplementedError(
            f"decoder={decoder!r}: media codec libraries are not installed in "
            "this environment; use decoder='fake' or install the codec"
        )
    else:
        raise ValueError(f"unknown decoder {decoder!r}")
    return pd.DataFrame(
        {
            "id": pdf["id"],
            "kind": pdf["kind"],
            "n_bytes": pdf["data"].map(len).astype("int32"),
            "feature": feats,
        }
    )


def extract_features(
    media: DataFrame, decoder: str = "fake", dim: int = 8
) -> DataFrame:
    """binary media -> fixed-dim float features, Arrow-batched."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf, decoder, dim)

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plan: expands (id, n_frames) to sampled frame
    indices JVM-side; the actual frame decode is the stubbed kernel above."""
    return media.where(F.col("kind") == "video").select(
        "id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def synth_media(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (bytes derived from ids)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        data = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (i % 4 + 1)
        meta = {
            "width": 64 + i if kind == "image" else None,
            "height": 48 + i if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 30 * (i + 1) if kind == "video" else None,
        }
        rows.append({"id": f"m{i}", "kind": kind, "data": bytearray(data), "meta": meta})
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _nearest_resize(buf: bytes, w: int, h: int, tw: int, th: int) -> bytes:
    """Nearest-neighbor resample of a row-major uint8 W x H buffer.
    np.resize tiles/truncates the payload to exactly w*h first, so opaque
    test payloads of any length are valid 'images' — deterministic, and
    the index math is the real resampling a codec-backed path would do."""
    full = np.resize(np.frombuffer(buf, dtype=np.uint8), (h, w))
    ys = np.arange(th) * h // th
    xs = np.arange(tw) * w // tw
    return full[ys][:, xs].tobytes()


def resize_images(
    media: DataFrame, target_w: int, target_h: int, decoder: str = "raw"
) -> DataFrame:
    """Resize the image rows of a media table to (target_w, target_h).

    decoder='raw' treats `data` as an uncompressed grayscale buffer sized
    by meta.width/height (the deterministic no-codec path this container
    supports); decoder='pil' is the real-codec seam and raises
    NotImplementedError until an imaging library is installed.  All the
    Spark-side plumbing — binary in/out through Arrow batches, metadata
    rewrite, schema stability — is real either way."""
    if decoder == "pil":
        raise NotImplementedError(
            "decoder='pil': imaging libraries are not installed in this "
            "environment; use decoder='raw'"
        )
    if decoder != "raw":
        raise ValueError(f"unknown decoder {decoder!r}")
    tw, th = int(target_w), int(target_h)
    if tw <= 0 or th <= 0:
        raise ValueError("target size must be positive")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                m = r["meta"]
                w, h = int(m["width"]), int(m["height"])
                out.append(
                    {
                        "id": r["id"],
                        "kind": r["kind"],
                        "data": bytearray(
                            _nearest_resize(bytes(r["data"]), w, h, tw, th)
                        ),
                        "meta": {
                            "width": tw,
                            "height": th,
                            "sample_rate": None,
                            "n_frames": None,
                        },
                    }
                )
            yield pd.DataFrame(out, columns=["id", "kind", "data", "meta"])

    return media.where(F.col("kind") == "image").mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )
