"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

Extends the engine beyond the reference's text-only surface (per the build
brief): the Spark-side plumbing — schemas, Arrow batch shapes, partitioning,
UDF signatures — is real and tested; the actual media decoding is STUBBED
(this container has no image/audio libraries) behind
``DecoderUnavailable`` and a deterministic fake used by tests.

Design for 100 TB of media:

* binary payloads ride in parquet ``binary`` columns next to a typed
  ``media_meta`` struct (modality, mime, width/height/duration, byte size)
  so metadata predicates prune without touching payload bytes (parquet
  column pruning: a filter on ``media_meta.modality`` never reads blobs);
* decode / feature-extract run in ``mapInPandas`` — per-partition Arrow
  batches, so one Python worker init per partition and bounded memory via
  ``arrow_max_records`` (payloads are MBs — keep batches small);
* frame sampling / resizing emit *rows per frame* (posexplode-style) so the
  downstream embedding stage rebalances with a repartition, the same skew
  strategy as the text chunker (SURVEY.md §4a).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

MEDIA_DOCUMENTS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("media_meta", MEDIA_META, False),
    ]
)


class DecoderUnavailable(NotImplementedError):
    """Raised by the real decode path: media libraries are not installed
    in this environment.  The Spark plumbing is exercised with
    ``fake=True`` decoders, which produce deterministic feature vectors
    from payload bytes."""


def attach_media_meta(
    df: DataFrame, *, modality: str, mime: str | None = None,
    payload_col: str = "payload",
) -> DataFrame:
    """Wrap a binary column with the typed metadata struct."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ),
    )


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    # the shared deterministic contract — see encoding.seeded_unit_vector
    from inception_spark.operators.encoding import seeded_unit_vector

    return seeded_unit_vector(payload, dim)


def extract_features(
    df: DataFrame, *, dim: int = 64, fake: bool = True,
    id_col: str = "id", payload_col: str = "payload",
) -> DataFrame:
    """binary payload → feature vector (image-embedding analogue).

    ``mapInPandas`` so each Arrow batch is one decode loop with worker-
    level init; output schema (id, media_meta, feature) keeps metadata for
    downstream filtering.  Real decode raises DecoderUnavailable."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("media_meta", MEDIA_META, True),
            T.StructField("feature", T.ArrayType(T.FloatType()), False),
        ]
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise DecoderUnavailable(
                    "media decoding requires PIL/ffmpeg — not installed"
                )
            feats = [
                _fake_feature(bytes(p), dim).tolist()
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "media_meta": pdf["media_meta"],
                    "feature": feats,
                }
            )

    return df.mapInPandas(mapper, out_schema)


def sample_frames(
    df: DataFrame, *, every_ms: int = 1000, fake: bool = True,
    id_col: str = "id", payload_col: str = "payload",
) -> DataFrame:
    """video payload → one row per sampled frame (frame_number, frame
    payload).  Fake decoder derives a deterministic frame count from
    duration_ms (1 frame per ``every_ms``, ≥1) and slices payload bytes —
    the row-explosion shape is exactly what a real ffmpeg sampler emits."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("frame_number", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise DecoderUnavailable("frame sampling requires ffmpeg")
            ids, nums, frames = [], [], []
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_col])
                meta = row["media_meta"]
                dur = (meta.get("duration_ms") if isinstance(meta, dict)
                       else meta["duration_ms"]) or every_ms
                n = max(1, int(dur) // every_ms)
                step = max(1, len(payload) // n)
                for i in range(n):
                    ids.append(row[id_col])
                    nums.append(i + 1)
                    frames.append(payload[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {"id": ids, "frame_number": nums, "frame": frames}
            )

    return df.mapInPandas(mapper, out_schema)


def resize_images(
    df: DataFrame, *, width: int, height: int, fake: bool = True,
    payload_col: str = "payload",
) -> DataFrame:
    """image payload → resized payload + updated metadata.  Fake resize
    re-hashes the payload to a deterministic pseudo-image of the target
    size (w*h bytes, capped) so byte-size accounting is testable."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise DecoderUnavailable("image resize requires PIL")
            out = []
            for p in pdf[payload_col]:
                seed = hashlib.md5(bytes(p)).digest()
                n = min(width * height, 4096)
                out.append((seed * (n // len(seed) + 1))[:n])
            pdf = pdf.copy()
            pdf[payload_col] = out
            meta = pd.json_normalize(pdf["media_meta"]).to_dict("records")
            for m, p in zip(meta, out):
                m["width"], m["height"], m["n_bytes"] = width, height, len(p)
            pdf["media_meta"] = meta
            yield pdf

    return df.mapInPandas(mapper, df.schema)
