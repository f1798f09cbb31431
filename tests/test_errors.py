"""V4 error-classifier parity tests (reference utils.py:119-157)."""

import pytest

from inception_spark.engine import EngineMetrics
from inception_spark.errors import classify_error, handle_exception


def test_decode_error():
    e = UnicodeDecodeError("utf-8", b"\xff", 0, 1, "invalid start byte")
    c = classify_error(e)
    assert (c.error_type, c.status) == ("decode_error", 422)
    assert c.detail == "Invalid UTF-8 encoding in text"


def test_validation_error_carries_message():
    c = classify_error(ValueError("Text length (0) below minimum (1)"))
    assert (c.error_type, c.status) == ("validation_error", 422)
    assert c.detail == "Text length (0) below minimum (1)"


def test_cuda_oom_by_name():
    # torch absent in this env: simulate via an exception class named like
    # torch.cuda.OutOfMemoryError (classifier matches on the MRO name)
    OutOfMemoryError = type("OutOfMemoryError", (RuntimeError,), {})
    c = classify_error(OutOfMemoryError("CUDA out of memory"))
    assert (c.error_type, c.status) == ("gpu_error", 503)
    assert c.detail == "GPU memory exhausted"


def test_processing_error_reraised_and_counted():
    m = EngineMetrics()
    with pytest.raises(RuntimeError):
        handle_exception(RuntimeError("boom"), "batch", metrics=m)
    assert m.error_count[("batch", "processing_error")] == 1


def test_non_processing_not_reraised():
    m = EngineMetrics()
    c = handle_exception(ValueError("bad"), "query", metrics=m)
    assert c.error_type == "validation_error"
    assert m.error_count[("query", "validation_error")] == 1
