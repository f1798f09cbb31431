"""Stateful streaming (applyInPandasWithState), streaming dedup, MLlib
LSH wrappers, engine.search composite, encoder load-retry."""

import json

import pytest
from pyspark.sql import functions as F

from inception_spark.streaming.pipeline import (
    EVENTS_SCHEMA,
    running_user_totals,
    streaming_exact_dedup,
)


def _drain(q):
    q.processAllAvailable()
    q.stop()


def test_running_user_totals_accumulates_across_batches(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for eid, uid, v in [(1, 7, 1.0), (2, 7, 2.0), (3, 8, 5.0)]:
            f.write(json.dumps({"event_id": eid, "ts": "2024-01-01T00:00:00",
                                "user_id": uid, "event_type": "click",
                                "value": v, "props": "{}"}) + "\n")
    stream = spark.readStream.schema(EVENTS_SCHEMA).json(str(src))
    out = running_user_totals(stream)
    q = (out.writeStream.format("memory").queryName("running")
         .outputMode("append").start())
    q.processAllAvailable()
    # second micro-batch: user 7 gains one more event
    with open(src / "b2.json", "w") as f:
        f.write(json.dumps({"event_id": 4, "ts": "2024-01-01T00:10:00",
                            "user_id": 7, "event_type": "click",
                            "value": 10.0, "props": "{}"}) + "\n")
    _drain(q)
    rows = spark.sql(
        "SELECT * FROM running ORDER BY user_id, n_events"
    ).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["n_events"], r["total_value"], r["batch_events"])
        )
    # user 7: batch1 state (2 events, 3.0), batch2 state (3 events, 13.0)
    assert by_user[7] == [(2, 3.0, 2), (3, 13.0, 1)]
    assert by_user[8] == [(1, 5.0, 1)]


def test_streaming_exact_dedup(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        f.write(json.dumps({"id": 1, "text": "Same Content Here",
                            "event_time": "2024-01-01T00:00:00"}) + "\n")
        f.write(json.dumps({"id": 2, "text": "same content here",
                            "event_time": "2024-01-01T00:01:00"}) + "\n")
        f.write(json.dumps({"id": 3, "text": "different content",
                            "event_time": "2024-01-01T00:02:00"}) + "\n")
    from inception_spark.streaming.pipeline import read_document_stream

    stream = read_document_stream(spark, str(src))
    out = streaming_exact_dedup(stream)
    q = (out.writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append").start())
    _drain(q)
    rows = spark.sql("SELECT id FROM dedup_stream").collect()
    ids = sorted(r["id"] for r in rows)
    # ids 1 and 2 share a fingerprint (case/punct-invariant) → one survives
    assert len(ids) == 2 and 3 in ids and (1 in ids) != (2 in ids)


def test_mllib_minhash_pairs(spark):
    from inception_spark.operators.mllib_lsh import mllib_minhash_dup_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again today"),
        (3, "completely unrelated words about database query planning"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = mllib_minhash_dup_pairs(df, max_jaccard_distance=0.5).collect()
    keys = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1, 2) in keys
    assert all(p in {(1, 2)} or 3 not in p for p in keys)


def test_mllib_ann_topk(spark):
    from inception_spark.operators.mllib_lsh import mllib_ann_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = list(emb.filter("vec_id = 0").head()["embedding"])
    out = mllib_ann_topk(emb, [float(x) for x in qv], k=5).collect()
    assert len(out) == 5
    assert out[0]["vec_id"] == 0 and out[0]["eucl_dist"] == 0.0


def test_engine_search_composite(spark, sample_opinion):
    from inception_spark.engine import EmbeddingEngine

    eng = EmbeddingEngine(spark)
    docs = spark.createDataFrame(
        [(1, sample_opinion), (2, "Contract law. Consideration required.")],
        "id long, text string",
    )
    table = eng.embed_documents(docs)
    hits = eng.search("equal protection of the laws", table, k=3).collect()
    # both docs fit in one chunk each → 2 rows compete for top-3
    assert len(hits) == 2
    assert [h["rank"] for h in hits] == [1, 2]
    assert all(-1.0 <= h["score"] <= 1.0 for h in hits)


def test_encoder_retry_gives_up_with_clear_error():
    from inception_spark.operators.encoding import _load_with_retry

    calls = []

    def flaky():
        calls.append(1)
        raise OSError("download failed")

    with pytest.raises(RuntimeError, match="after 3 attempts"):
        _load_with_retry(flaky, retries=3, delay=0.01)
    assert len(calls) == 3


def test_encoder_retry_succeeds_after_failures():
    from inception_spark.operators.encoding import _load_with_retry

    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise OSError("transient")
        return "model"

    assert _load_with_retry(flaky, retries=3, delay=0.01) == "model"


def test_ivf_topk(spark):
    from inception_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    ivf = ivf_topk(emb, qv, k=5, n_centroids=8, n_probe=3)
    rows = ivf.collect()
    assert len(rows) == 5
    assert rows[0]["vec_id"] == 0 and rows[0]["score"] == 1.0
    # recall sanity vs exact: the probed buckets must contain the query's
    # own bucket, and top-1 must match brute force
    exact = cosine_topk(emb, qv, k=1).collect()[0]
    assert rows[0]["vec_id"] == exact["vec_id"]


def test_ivf_flat_topk_deterministic_and_top1(spark):
    from inception_spark.operators.similarity import (
        cosine_topk,
        ivf_flat_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    out = ivf_flat_topk(emb, qv, k=5, n_centroids=8, n_probe=2)
    rows = out.collect()
    assert len(rows) == 5
    # the query's own vector lives in a probed cell (its cell IS the
    # nearest-to-query cell), so top-1 must equal brute force
    exact = cosine_topk(emb, qv, k=1).collect()[0]
    assert rows[0]["vec_id"] == exact["vec_id"] == 0
    # deterministic: a second run returns the identical list
    again = ivf_flat_topk(emb, qv, k=5, n_centroids=8, n_probe=2).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_streaming_quarantine(spark, tmp_path):
    import json as _json
    from inception_spark.streaming.pipeline import (
        read_document_stream_with_quarantine,
    )

    src = tmp_path / "sq"
    src.mkdir()
    with open(src / "b.json", "w") as f:
        f.write(_json.dumps({"id": 1, "text": "fine",
                             "event_time": "2024-01-01T00:00:00"}) + "\n")
        f.write("{broken line\n")
    good, bad = read_document_stream_with_quarantine(spark, str(src))
    qg = (good.writeStream.format("memory").queryName("sq_good")
          .outputMode("append").start())
    qb = (bad.writeStream.format("memory").queryName("sq_bad")
          .outputMode("append").start())
    qg.processAllAvailable(); qb.processAllAvailable()
    qg.stop(); qb.stop()
    assert spark.sql("SELECT * FROM sq_good").collect()[0]["id"] == 1
    badr = spark.sql("SELECT * FROM sq_bad").collect()
    assert len(badr) == 1 and badr[0]["error_type"] == "validation_error"


def test_retrieval_quality_matches_python_reference(spark):
    """MRR / P@k / NDCG@k cross-checked against an independent Python
    computation on a constructed corpus with known neighbor structure."""
    import math

    import numpy as np

    from inception_spark.operators.similarity import (
        retrieval_quality_report,
    )

    rng = np.random.RandomState(11)
    # two well-separated label clusters in 8-d
    centers = {0: rng.randn(8) * 0.1 + 5, 1: rng.randn(8) * 0.1 - 5}
    rows = []
    for i in range(20):
        lab = i % 2
        v = centers[lab] + rng.randn(8) * 0.05
        rows.append((i, [float(x) for x in v], lab))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    k, nq = 5, 4
    out = {r["q_id"]: r for r in
           retrieval_quality_report(df, n_queries=nq, k=k).collect()}
    assert set(out) == {0, 1, 2, 3}

    # independent reference
    vecs = {i: np.array(v, dtype=np.float32) for i, v, _ in rows}
    labs = {i: l for i, _, l in rows}
    gains = [round(1.0 / math.log2(r + 1), 6) for r in range(1, k + 1)]
    cum, acc = [], 0.0
    for g in gains:
        acc = round(acc + g, 6)
        cum.append(acc)
    for q in range(nq):
        scored = sorted(
            (
                (-round(float(
                    np.dot(vecs[q].astype(np.float64), vecs[i].astype(np.float64))
                    / (np.linalg.norm(vecs[q].astype(np.float64))
                       * np.linalg.norm(vecs[i].astype(np.float64)))), 6), i)
                for i in vecs if i != q
            )
        )[:k]
        rel = [1 if labs[i] == labs[q] else 0 for _, i in scored]
        n_rel = sum(rel)
        first = next((r + 1 for r, x in enumerate(rel) if x), None)
        total_rel = sum(1 for i in labs if i != q and labs[i] == labs[q])
        dcg = round(sum(g for g, x in zip(gains, rel) if x), 6)
        idcg = cum[min(k, total_rel) - 1]
        r = out[q]
        assert r["n_rel_topk"] == n_rel
        assert r["total_rel"] == total_rel
        assert abs(r["precision_at_k"] - round(n_rel / k, 6)) < 1e-9
        assert abs(r["mrr"] - (round(1.0 / first, 6) if first else 0.0)) < 1e-9
        assert abs(r["ndcg_at_k"] - round(dcg / idcg, 6)) < 1e-6
        # well-separated clusters: every neighbor shares the label
        assert n_rel == k and r["ndcg_at_k"] == 1.0
