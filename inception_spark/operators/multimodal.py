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
    """Raised by the real decode path when no decoder can handle the
    payload: compressed formats (JPEG/PNG/video) need PIL/ffmpeg, which
    are not installed in this environment.  Uncompressed BMP decodes
    NATIVELY (struct + numpy, below) — so the real path is exercised end
    to end on real pixels; the ``fake=True`` decoders remain for
    format-agnostic plumbing tests."""


# ---------------------------------------------------------------------------
# native BMP codec — zero dependencies, real pixels
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bpp BMP → (h, w, 3) uint8 RGB array.

    BMP is a fixed little-endian header + raw BGR(A) rows padded to 4
    bytes, bottom-up — fully parseable with struct/numpy, no PIL."""
    import struct

    if payload[:2] != b"BM":
        raise DecoderUnavailable("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise DecoderUnavailable(
            f"only uncompressed 24/32-bpp BMP decodes natively "
            f"(bpp={bpp}, compression={compression})"
        )
    bottom_up, h = h > 0, abs(h)
    nch = bpp // 8
    row_size = ((w * nch + 3) // 4) * 4
    arr = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=data_offset
    ).reshape(h, row_size)[:, : w * nch].reshape(h, w, nch)
    if bottom_up:
        arr = arr[::-1]
    return np.ascontiguousarray(arr[:, :, [2, 1, 0]])  # BGR(A)→RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bpp BMP bytes."""
    import struct

    h, w, _ = img.shape
    row_size = ((w * 3 + 3) // 4) * 4
    pad = b"\x00" * (row_size - w * 3)
    bgr = img[:, :, [2, 1, 0]]
    body = b"".join(bytes(r.tobytes()) + pad for r in bgr[::-1])
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    off = 14 + 40
    return struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off) + info + body


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize by integer index maps — deterministic."""
    src_h, src_w = img.shape[:2]
    yi = np.arange(height) * src_h // height
    xi = np.arange(width) * src_w // width
    return np.ascontiguousarray(img[yi][:, xi])


def image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic real image features: per-channel mean/std + a 4×4
    grayscale thumbnail grid, L2-normalized and padded/truncated to
    ``dim`` — the library-free analogue of an image-embedding model."""
    gray = img.astype(np.float64).mean(axis=2)
    grid = resize_nearest(gray[..., None], 4, 4)[..., 0].ravel() / 255.0
    feats = np.concatenate(
        [
            img.astype(np.float64).mean(axis=(0, 1)) / 255.0,
            img.astype(np.float64).std(axis=(0, 1)) / 255.0,
            grid,
        ]
    )
    feats = (
        np.pad(feats, (0, dim - len(feats)))
        if len(feats) < dim
        else feats[:dim]
    )
    n = float(np.linalg.norm(feats))
    return (feats / (n or 1.0)).astype(np.float32)


def probe_bmp_dims(
    df: DataFrame, *, payload_col: str = "payload"
) -> DataFrame:
    """Fill media_meta.width/height by parsing the BMP header JVM-SIDE
    (substring → byte-reverse → hex → conv): metadata probing over 100 TB
    of blobs must not round-trip payloads through Python."""

    def _le32(pos: int):  # 1-based substring position
        return F.conv(
            F.hex(F.reverse(F.substring(F.col(payload_col), pos, 4))), 16, 10
        ).cast("int")

    is_bmp = F.substring(F.col(payload_col), 1, 2) == F.lit(b"BM")
    return df.withColumn(
        "media_meta",
        F.struct(
            F.col("media_meta.modality").alias("modality"),
            F.col("media_meta.mime").alias("mime"),
            F.when(is_bmp, _le32(19)).alias("width"),
            F.when(is_bmp, _le32(23)).alias("height"),
            F.col("media_meta.duration_ms").alias("duration_ms"),
            F.col("media_meta.n_bytes").alias("n_bytes"),
        ),
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Real decode: native BMP first; PIL fallback for compressed formats
    when installed; DecoderUnavailable otherwise."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    try:
        import io

        from PIL import Image  # import-gated

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError:
        raise DecoderUnavailable(
            "compressed image decode requires PIL — not installed; "
            "uncompressed BMP decodes natively"
        )


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
    downstream filtering.  ``fake=False`` decodes REAL pixels (native BMP,
    PIL when installed) and extracts :func:`image_features`; unsupported
    formats raise DecoderUnavailable."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("media_meta", MEDIA_META, True),
            T.StructField("feature", T.ArrayType(T.FloatType()), False),
        ]
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = [
                    _fake_feature(bytes(p), dim).tolist()
                    for p in pdf[payload_col]
                ]
            else:
                feats = [
                    image_features(decode_image(bytes(p)), dim).tolist()
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
    """image payload → resized payload + updated metadata.

    ``fake=False`` is a REAL resize: decode (native BMP / PIL), nearest-
    neighbor index-map resample, re-encode as 24-bpp BMP.  Fake resize
    re-hashes the payload to a deterministic pseudo-image of the target
    size (w*h bytes, capped) so byte-size accounting stays testable for
    formats the environment can't decode."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[payload_col]:
                if fake:
                    seed = hashlib.md5(bytes(p)).digest()
                    n = min(width * height, 4096)
                    out.append((seed * (n // len(seed) + 1))[:n])
                else:
                    out.append(
                        encode_bmp(
                            resize_nearest(
                                decode_image(bytes(p)), width, height
                            )
                        )
                    )
            pdf = pdf.copy()
            pdf[payload_col] = out
            meta = pd.json_normalize(pdf["media_meta"]).to_dict("records")
            for m, p in zip(meta, out):
                m["width"], m["height"], m["n_bytes"] = width, height, len(p)
            pdf["media_meta"] = meta
            yield pdf

    return df.mapInPandas(mapper, df.schema)
