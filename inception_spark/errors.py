"""Error classification — V4 parity.

Maps exceptions to the reference's (error_type, status) taxonomy
(``/root/reference/inception/utils.py:119-157``): UnicodeDecodeError →
422/decode_error, ValueError → 422/validation_error, GPU OOM →
503/gpu_error, anything else → processing_error re-raised.  In the engine
this classification feeds quarantine columns and metrics labels instead of
HTTP responses; statuses are preserved so a serving layer on top can map
1:1.
"""

from __future__ import annotations

from dataclasses import dataclass

DECODE_ERROR = ("decode_error", 422, "Invalid UTF-8 encoding in text")
VALIDATION_ERROR = ("validation_error", 422, None)  # detail = str(exc)
GPU_ERROR = ("gpu_error", 503, "GPU memory exhausted")
PROCESSING_ERROR = ("processing_error", 500, None)


@dataclass(frozen=True)
class ClassifiedError:
    error_type: str
    status: int
    detail: str


def _is_cuda_oom(exc: Exception) -> bool:
    # torch.cuda.OutOfMemoryError when torch is present; match by name so
    # the classifier works without torch installed (import-gated env)
    for klass in type(exc).__mro__:
        if klass.__name__ == "OutOfMemoryError":
            return True
    return False


def classify_error(exc: Exception) -> ClassifiedError:
    """Classify; never raises.  Mirrors the match order of the reference."""
    if isinstance(exc, UnicodeDecodeError):
        t, s, d = DECODE_ERROR
        return ClassifiedError(t, s, d)
    if isinstance(exc, ValueError):
        t, s, _ = VALIDATION_ERROR
        return ClassifiedError(t, s, str(exc))
    if _is_cuda_oom(exc):
        t, s, d = GPU_ERROR
        return ClassifiedError(t, s, d)
    t, s, _ = PROCESSING_ERROR
    return ClassifiedError(t, s, str(exc))


def handle_exception(exc: Exception, endpoint: str, metrics=None):
    """Reference-shaped handler: classify, count, re-raise processing
    errors (utils.py:152-157), return the classification otherwise."""
    c = classify_error(exc)
    if metrics is not None:
        key = (endpoint, c.error_type)
        metrics.error_count[key] = metrics.error_count.get(key, 0) + 1
    if c.error_type == "processing_error":
        raise exc
    return c
