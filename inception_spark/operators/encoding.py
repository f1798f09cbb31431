"""Embedding encoders + the distributed batch-encode operator.

Maps the reference's model-inference layer (C5/C6/C8/C9,
``/root/reference/inception/embedding_service.py:152-263``) onto an
iterator-of-series pandas UDF with an **executor-cached encoder singleton**
— the Spark analogue of the reference's per-process preloaded model
(main.py:44-75, O9) — and Arrow batches giving the same cross-document
batch amalgamation the reference gets by flattening all chunks into one
``model.encode`` call (O1, embedding_service.py:179-213).

Two encoder implementations behind one interface (SURVEY.md §7.1):

* :class:`HashingStubEncoder` — deterministic, dependency-free: md5-seeded
  Gaussian vectors, L2-normalized.  Exact-reproducible across runs and
  machines, so pipeline tests can assert values, not just shapes.
* :class:`SentenceTransformerEncoder` — the real model
  (``freelawproject/modernbert-embed-base_finetune_512``, reference
  config.py:6-9), import-gated: used automatically when
  ``sentence_transformers`` + torch are installed.

The retrieval prefixes are applied *inside* the encoder
(``search_document: `` / ``search_query: ``, reference
embedding_service.py:90,162) so engine tables never carry them — P3
(prefix stripping) becomes unnecessary by construction.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Protocol

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from inception_spark.config import DEFAULT_CONFIG, EngineConfig


class Encoder(Protocol):
    dim: int

    def encode(self, texts: list[str], batch_size: int = 8) -> np.ndarray: ...


def seeded_unit_vector(data: bytes, dim: int) -> np.ndarray:
    """L2-normalized N(0,1) float32 vector seeded by md5(data) — THE
    deterministic fake-embedding contract, shared by the stub text encoder
    and the multimodal fake feature extractor so cross-modal determinism
    assumptions can't drift."""
    seed = int.from_bytes(hashlib.md5(data).digest()[:4], "big")
    v = np.random.RandomState(seed).standard_normal(dim)
    n = float(np.linalg.norm(v))
    return (v / (n or 1.0)).astype(np.float32)


class HashingStubEncoder:
    """Deterministic stand-in encoder.

    vector(text) = L2-normalized N(0,1) draw seeded by md5(text) —
    stable across processes, platforms and numpy versions (RandomState's
    MT19937 + standard_normal are frozen by numpy's backwards-compat
    guarantee).  Identical texts ⇒ identical vectors; distinct texts ⇒
    near-orthogonal vectors, which preserves the *shape* of cosine-space
    analytics on top.
    """

    def __init__(self, dim: int = 768):
        self.dim = dim

    def _one(self, text: str) -> np.ndarray:
        return seeded_unit_vector(text.encode("utf-8"), self.dim)

    def encode(self, texts: list[str], batch_size: int = 8) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        return np.stack([self._one(t) for t in texts])


class SentenceTransformerEncoder:
    """Real model, import-gated.  Device selection mirrors the reference
    (C8: cpu if force_cpu else cuda-if-available; TF32 on,
    embedding_service.py:22,40-47); GPU cache emptied after each batch
    (C9, embedding_service.py:259-263)."""

    MODEL = "freelawproject/modernbert-embed-base_finetune_512"

    def __init__(self, dim: int = 768, force_cpu: bool = False):
        import torch
        from sentence_transformers import SentenceTransformer

        torch.set_float32_matmul_precision("high")
        device = "cpu" if force_cpu else (
            "cuda" if torch.cuda.is_available() else "cpu"
        )
        self._torch = torch
        self._model = SentenceTransformer(self.MODEL, device=device)
        self.dim = dim

    def encode(self, texts: list[str], batch_size: int = 8) -> np.ndarray:
        try:
            return self._model.encode(texts, batch_size=batch_size)
        finally:
            if self._torch.cuda.is_available():
                self._torch.cuda.empty_cache()


def default_encoder(config: EngineConfig = DEFAULT_CONFIG) -> Encoder:
    try:
        return SentenceTransformerEncoder(
            dim=config.embedding_dim, force_cpu=config.force_cpu
        )
    except ImportError:
        return HashingStubEncoder(dim=config.embedding_dim)


# ---------------------------------------------------------------------------
# the distributed encode operator
# ---------------------------------------------------------------------------

#: module-level executor cache: one encoder per Python worker process,
#: lazily built on first batch (model preload analogue, O9).
_ENCODER_CACHE: dict[tuple, Encoder] = {}


def _load_with_retry(factory, *, retries: int = 3, delay: float = 5.0):
    """Model-load retry loop — O9 parity (reference main.py:44-75: 3
    attempts, 5 s apart, for flaky model downloads on cold executors)."""
    import time

    last: Exception | None = None
    for attempt in range(retries):
        try:
            return factory()
        except Exception as e:  # noqa: BLE001 — deliberate: retry anything
            last = e
            if attempt < retries - 1:
                time.sleep(delay)
    raise RuntimeError(
        f"encoder failed to load after {retries} attempts: {last}"
    ) from last


def _worker_encoder(kind: str, dim: int, force_cpu: bool) -> Encoder:
    key = (kind, dim, force_cpu)
    enc = _ENCODER_CACHE.get(key)
    if enc is None:
        if kind == "stub":
            enc = HashingStubEncoder(dim=dim)
        else:
            enc = _load_with_retry(
                lambda: SentenceTransformerEncoder(
                    dim=dim, force_cpu=force_cpu
                )
            )
        _ENCODER_CACHE[key] = enc
    return enc


def make_embed_udf(
    config: EngineConfig = DEFAULT_CONFIG,
    *,
    encoder_kind: str = "stub",
    prefix: str | None = None,
    encoder: Encoder | None = None,
):
    """``chunk:string → embedding:array<float>`` iterator pandas UDF.

    The prefix (document or query lead) is applied here, immediately before
    encoding, mirroring reference embedding_service.py:90 — and the encoder
    singleton persists across batches within a worker.

    ``encoder``: an explicit (picklable) encoder instance shipped in the
    UDF closure — the path for user-supplied encoders, which executors
    could not otherwise reconstruct from a kind string.  Without it the
    worker builds/caches its own encoder from ``encoder_kind``.
    """
    dim, fcpu, bsz = config.embedding_dim, config.force_cpu, config.processing_batch_size
    lead = config.lead_document if prefix is None else prefix

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        enc = encoder if encoder is not None else _worker_encoder(
            encoder_kind, dim, fcpu
        )
        for s in batches:
            texts = [lead + (t if isinstance(t, str) else "") for t in s]
            vecs = enc.encode(texts, batch_size=bsz)
            yield pd.Series([v.tolist() for v in vecs])

    return embed_udf


def make_embed_udf_ml(
    config: EngineConfig = DEFAULT_CONFIG,
    *,
    encoder_kind: str = "stub",
    prefix: str | None = None,
):
    """Alternative encode operator via ``pyspark.ml.functions
    .predict_batch_udf`` (SURVEY.md §2.3 C5's suggested mapping).

    predict_batch_udf handles Arrow batching + model caching itself
    (make_predict_fn runs once per worker), and its ``batch_size``
    mirrors the reference's processing micro-batch (O2).  Functionally
    identical to :func:`make_embed_udf`; kept as the MLlib-idiomatic
    integration point for `spark.ml` pipelines."""
    import numpy as np
    from pyspark.ml.functions import predict_batch_udf
    from pyspark.sql import types as T

    dim, fcpu, bsz = (
        config.embedding_dim,
        config.force_cpu,
        config.processing_batch_size,
    )
    lead = config.lead_document if prefix is None else prefix

    def make_predict_fn():
        enc = _worker_encoder(encoder_kind, dim, fcpu)

        def predict(texts: np.ndarray) -> np.ndarray:
            batch = [lead + (t if isinstance(t, str) else "") for t in texts]
            return enc.encode(batch, batch_size=bsz)

        return predict

    return predict_batch_udf(
        make_predict_fn,
        return_type=T.ArrayType(T.FloatType()),
        batch_size=bsz,
    )
