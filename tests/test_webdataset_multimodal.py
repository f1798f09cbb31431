"""Paired-modality WebDataset ingest (sources/webdataset.py): the
sample-regrouping + completeness + 3-modality decode contract."""

import io
import tarfile

import pytest

import inception_spark.sources.webdataset as W


def _blob_missing_one_member():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, payload in [
            ("000000001.txt", b"text"),
            ("000000001.bmp", b"BMstub"),
            # .wav missing — incomplete sample
        ]:
            ti = tarfile.TarInfo(name)
            ti.size = len(payload)
            tf.addfile(ti, io.BytesIO(payload))
    return buf.getvalue()


def test_incomplete_sample_raises(spark):
    corpus = spark.createDataFrame(
        [(0, 1, bytearray(_blob_missing_one_member()))],
        "shard long, n_samples long, blob binary",
    )
    with pytest.raises(Exception, match="members"):
        W.webdataset_partials(corpus).collect()


def test_webdataset_stats_end_to_end(spark):
    """Counters equal the closed-form recomputation on a small spine."""
    import numpy as np
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"doc {i} body") for i in range(24)],
        "doc_id long, text string",
    )
    got = {
        r["shard"]: r
        for r in W.webdataset_multimodal_stats(docs).collect()
    }
    for sh in range(4):
        ids = [i for i in range(24) if i % 4 == sh]
        want_tb = sum(len(f"doc {i} body".encode()) for i in ids)
        want_px = sum(
            int(W._synth_image(i).astype(np.int64).sum()) for i in ids
        )
        want_au = sum(50 * (i % 11 + 1) for i in ids)
        g = got[sh]
        assert g["n_complete"] == len(ids)
        assert g["text_bytes"] == want_tb
        assert g["pixel_sum"] == want_px
        assert g["audio_samples"] == want_au
