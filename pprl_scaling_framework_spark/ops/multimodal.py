"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct. The Spark
side — schema, partition sizing, Arrow batch shape, ``mapInPandas``
signatures — is real and tested; the actual codec work is STUBBED because the
media libraries are not in this container:

- :func:`decode_image` uses PIL when importable (real codec path); else a
  deterministic fake decoder parses our 16-byte synthetic header (magic
  'FAKE', width, height, channels) when ``fake=True`` — enough to exercise
  the full distributed plumbing end to end — and raises NotImplementedError
  otherwise (fail fast at plan-build time, not inside executors).
"""

from __future__ import annotations

import importlib.util
import struct
from typing import Iterator


def _pil_available() -> bool:
    return importlib.util.find_spec("PIL") is not None

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("mime", StringType()),
    StructField("data", BinaryType()),
    StructField("meta", StructType([
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ])),
])

_MAGIC = b"FAKE"


def make_fake_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table matching MEDIA_SCHEMA."""
    rows = []
    for i in range(n):
        w = 8 + (i * 7 + seed) % 24
        h = 8 + (i * 13 + seed) % 24
        c = 1 + i % 3
        payload = _MAGIC + struct.pack("<III", w, h, c) + bytes(
            (i * 31 + j * 7 + seed) % 256 for j in range(w * h * c)
        )
        rows.append((i, "image", "image/fake", payload,
                     {"width": w, "height": h, "channels": c, "duration_ms": None}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


DECODED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("mean_intensity", FloatType()),
    StructField("features", ArrayType(FloatType())),
])


def decode_image(df: DataFrame, fake: bool = False, feature_bins: int = 8) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    Codec resolution order:
    - PIL importable -> real decoder (any PIL-supported format; the 'FAKE'
      synthetic header is still handled so fixtures keep working);
    - else ``fake=True`` -> deterministic fake decoder (synthetic header only);
    - else NotImplementedError at plan-build time (not inside executors).
    """
    use_pil = _pil_available()
    if not use_pil and not fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv (not in this container); "
            "pass fake=True for the deterministic test decoder"
        )

    def _pixels(data: bytes) -> tuple[int, int, int, np.ndarray] | None:
        if data[:4] == _MAGIC:
            w, h, c = struct.unpack("<III", data[4:16])
            return w, h, c, np.frombuffer(data[16:16 + w * h * c], dtype=np.uint8)
        if use_pil:
            import io

            try:
                from PIL import Image
            except ImportError as exc:  # driver had PIL, executor doesn't
                raise RuntimeError(
                    "PIL importable on the driver but not on executors — "
                    "ship it via --py-files/conda env or pass fake=True"
                ) from exc

            try:
                img = Image.open(io.BytesIO(data))
                arr = np.asarray(img)
            except Exception:
                return None
            c = 1 if arr.ndim == 2 else arr.shape[2]
            return img.width, img.height, c, arr.astype(np.uint8).ravel()
        return None

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                decoded = _pixels(bytes(data))
                if decoded is None:
                    continue
                w, h, c, px = decoded
                hist = np.histogram(px, bins=feature_bins, range=(0, 256))[0]
                feats = (hist / max(px.size, 1)).astype(np.float32)
                out.append((mid, w, h, c, float(px.mean()) if px.size else 0.0,
                            feats.tolist()))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "channels",
                              "mean_intensity", "features"],
            )

    return df.select("media_id", "data").mapInPandas(_decode, DECODED_SCHEMA)


def resize_plumbing(df: DataFrame, target: tuple[int, int], fake: bool = False) -> DataFrame:
    """Resize stub: validates the partition/batch plumbing, fake 'resize'
    rewrites the header only (no real resampling without codecs)."""
    if not fake:
        raise NotImplementedError("resize requires an image library; use fake=True")
    tw, th = target

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            datas = []
            for data in pdf["data"]:
                if data[:4] == _MAGIC:
                    _, _, c = struct.unpack("<III", data[4:16])
                    datas.append(_MAGIC + struct.pack("<III", tw, th, c)
                                 + bytes(tw * th * c))
                else:
                    datas.append(data)
            pdf = pdf.assign(data=datas)
            yield pdf

    return df.mapInPandas(_resize, df.schema)
