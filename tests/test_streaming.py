"""Structured Streaming tests: file-source document stream through the
chunk→embed pipeline, and windowed/session aggregations, checked against
their batch twins on the same data."""

import json
import os

import pytest
from pyspark.sql import functions as F

from inception_spark.streaming.pipeline import (
    EVENTS_SCHEMA,
    embed_document_stream,
    read_document_stream,
    session_event_counts,
    windowed_event_counts,
)


def _drain(query):
    query.processAllAvailable()
    query.stop()


def test_document_stream_pipeline(spark, tmp_path, sample_opinion):
    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"id": 1, "text": sample_opinion, "event_time": "2024-01-01T00:00:00"},
        {"id": 2, "text": "Short document. Two sentences.", "event_time": "2024-01-01T00:01:00"},
    ]
    with open(src / "batch1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = read_document_stream(spark, str(src))
    assert stream.isStreaming
    out = embed_document_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("doc_stream")
        .outputMode("append")
        .start()
    )
    _drain(q)
    got = spark.sql("SELECT * FROM doc_stream").collect()
    assert {r["doc_id"] for r in got} == {1, 2}
    for r in got:
        assert len(r["embedding"]) == 768
        assert r["n_tokens"] <= 512

    # streaming output == batch output for the same input (stateless ops)
    from inception_spark.engine import EmbeddingEngine

    batch = EmbeddingEngine(spark).embed_documents(
        spark.createDataFrame(
            [(1, sample_opinion), (2, "Short document. Two sentences.")],
            "id long, text string",
        )
    )
    b = {(r["doc_id"], r["chunk_number"]): r["chunk"] for r in batch.collect()}
    s = {(r["doc_id"], r["chunk_number"]): r["chunk"] for r in got}
    assert b == s


@pytest.fixture()
def event_stream_dir(spark, tmp_path):
    """events rows as a file-drop stream, one json file."""
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        # user 7: two sessions separated by > 30 min
        (1, "2024-01-01T00:00:00", 7, "click", 1.0),
        (2, "2024-01-01T00:10:00", 7, "click", 2.0),
        (3, "2024-01-01T01:00:00", 7, "view", 4.0),
        # user 8: single event
        (4, "2024-01-01T00:30:00", 8, "click", 8.0),
    ]
    with open(src / "e.json", "w") as f:
        for eid, ts, uid, et, v in rows:
            f.write(
                json.dumps(
                    {"event_id": eid, "ts": ts, "user_id": uid,
                     "event_type": et, "value": v, "props": "{}"}
                )
                + "\n"
            )
    return str(src)


def test_windowed_event_counts(spark, event_stream_dir):
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).json(event_stream_dir)
    )
    out = windowed_event_counts(stream, window="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .start()
    )
    _drain(q)
    # append mode emits only watermark-closed windows; with a static file
    # the final watermark closes all but the last — use complete-mode twin
    q2 = (
        windowed_event_counts(stream, window="1 hour")
        .writeStream.format("memory")
        .queryName("win_counts_c")
        .outputMode("complete")
        .start()
    )
    _drain(q2)
    rows = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_counts_c").collect()
    }
    assert rows[("2024-01-01 00:00:00", "click")] == 3
    assert rows[("2024-01-01 01:00:00", "view")] == 1


def test_session_event_counts(spark, event_stream_dir):
    stream = spark.readStream.schema(EVENTS_SCHEMA).json(event_stream_dir)
    out = session_event_counts(stream, gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("complete")
        .start()
    )
    _drain(q)
    rows = spark.sql("SELECT * FROM sess_counts").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[7]) == 2  # two sessions (gap 50 min > 30 min)
    assert len(by_user[8]) == 1
    s1 = sorted(by_user[7], key=lambda r: r["session_start"])[0]
    assert s1["n_events"] == 2 and s1["session_value"] == 3.0


def test_foreach_batch_parquet_sink(spark, tmp_path, sample_opinion):
    from inception_spark.streaming.pipeline import write_foreach_batch_parquet

    src = tmp_path / "in2"
    src.mkdir()
    with open(src / "b.json", "w") as f:
        f.write(json.dumps({"id": 5, "text": "One sentence here.",
                            "event_time": "2024-01-01T00:00:00"}) + "\n")
    stream = read_document_stream(spark, str(src))
    out = embed_document_stream(stream).drop("event_time")
    q = write_foreach_batch_parquet(
        out, str(tmp_path / "out"), str(tmp_path / "ckpt")
    ).start()
    _drain(q)
    batches = os.listdir(tmp_path / "out")
    assert batches
    got = spark.read.parquet(str(tmp_path / "out" / batches[0])).collect()
    assert got[0]["doc_id"] == 5 and len(got[0]["embedding"]) == 768


def test_sliding_windows_streaming(spark, event_stream_dir):
    """Sliding-window path of windowed_event_counts (1h window / 30m
    slide): each event lands in exactly two windows."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).json(event_stream_dir)
    out = windowed_event_counts(stream, window="1 hour", slide="30 minutes")
    q = (out.writeStream.format("memory").queryName("slide_counts")
         .outputMode("complete").start())
    _drain(q)
    rows = spark.sql("SELECT * FROM slide_counts").collect()
    # event at 00:00 belongs to windows starting 23:30 and 00:00
    starts = {str(r["window_start"]) for r in rows}
    assert "2024-01-01 00:00:00" in starts and "2023-12-31 23:30:00" in starts


class _FakeState:
    """Minimal GroupState stand-in for unit-driving the update callback."""

    def __init__(self, value=None, has_timed_out=False):
        self._value = value
        self.hasTimedOut = has_timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value, self.removed = None, True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_running_totals_timeout_evicts_state():
    """A fired ProcessingTimeTimeout must evict state without re-arming
    or emitting a spurious zero-event row (advisor finding, round 1)."""
    from inception_spark.streaming.pipeline import make_running_totals_update

    update = make_running_totals_update(timeout_minutes=5)
    state = _FakeState(value=(3, 7.5), has_timed_out=True)
    rows = list(update((42,), iter([]), state))
    assert rows == []                  # no spurious batch_events=0 row
    assert state.removed               # state actually released
    assert state.timeout_set is None   # not re-armed

    # the normal path still accumulates and re-arms
    import pandas as pd

    state2 = _FakeState(value=(3, 7.5))
    pdf = pd.DataFrame({"value": [1.0, 2.0]})
    out = list(update((42,), iter([pdf]), state2))
    assert state2._value == (5, 10.5)
    assert state2.timeout_set == 5 * 60 * 1000
    assert out[0]["n_events"][0] == 5 and out[0]["batch_events"][0] == 2


def test_run_stream_to_parquet_matches_batch_twin(spark):
    """The stream-to-parquet bridge: windowed streaming aggregation over
    a staged corpus + far-future sentinel equals the batch groupBy, and
    the sentinel's own (never-closed) window is withheld."""
    import datetime

    from inception_spark.plans.relational import load_events
    from inception_spark.streaming.pipeline import (
        run_stream_to_parquet,
        windowed_event_counts,
    )

    ev = load_events(spark, "/root/testdata/sf0.001").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    mx = ev.agg(F.max("ts")).head()[0]
    sentinel = spark.createDataFrame(
        [(-1, mx + datetime.timedelta(days=30), -1, "sentinel", 0.0, "{}")],
        ev.schema,
    )
    got = run_stream_to_parquet(
        spark, ev.unionByName(sentinel),
        lambda s: windowed_event_counts(s, watermark="2 hours"),
    )
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type", "n_events", "total_value",
        )
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b and len(a) > 0
    assert not any(r[2] == "sentinel" for r in a)


def test_interval_join_streams_executed_matches_batch(spark):
    """Stream-stream interval join run through a REAL streaming query
    (availableNow drain) equals the batch join with the same condition."""
    from inception_spark.plans.relational import load_events
    from inception_spark.streaming.pipeline import (
        interval_join_streams,
        run_stream_to_parquet,
    )

    ev = (
        load_events(spark, "/root/testdata/sf0.001")
        .select(
            "event_id", F.col("ts").cast("timestamp").alias("ts"),
            "user_id", "event_type", "value", "props",
        )
        # keep the pair count bounded for the tiny fixture
        .filter(F.col("user_id") < 40)
    )
    types = [r[0] for r in
             ev.select("event_type").distinct().orderBy("event_type").collect()]
    lt, rt = types[0], types[1]

    got = run_stream_to_parquet(
        spark, ev,
        lambda s: interval_join_streams(
            s.filter(F.col("event_type") == lt),
            s.filter(F.col("event_type") == rt),
            within="30 minutes",
        ),
    )
    l = ev.filter(F.col("event_type") == lt).alias("l")
    r = ev.filter(F.col("event_type") == rt).alias("r")
    batch = l.join(
        r,
        F.expr(
            "l.user_id = r.user_id AND r.ts >= l.ts "
            "AND r.ts <= l.ts + INTERVAL 30 minutes"
        ),
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("left_event_id"),
        F.col("r.event_id").alias("right_event_id"),
    )
    a = sorted((r["user_id"], r["left_event_id"], r["right_event_id"])
               for r in got.collect())
    b = sorted(map(tuple, batch.collect()))
    assert a == b and len(a) > 0


def test_interval_join_streams_delay_bounds(spark, tmp_path):
    """Crafted matches: within-window purchase joins, outside does not."""
    import json as _json

    from inception_spark.streaming.pipeline import interval_join_streams

    src = tmp_path / "ev"
    src.mkdir()
    rows = [
        (1, "2024-01-01T00:00:00", 7, "click", 1.0),
        (2, "2024-01-01T00:10:00", 7, "purchase", 5.0),   # +10 min: match
        (3, "2024-01-01T00:50:00", 7, "purchase", 9.0),   # +50 min: no
        (4, "2024-01-01T00:00:00", 8, "purchase", 3.0),   # other user
    ]
    with open(src / "e.json", "w") as f:
        for eid, ts, uid, et, v in rows:
            f.write(_json.dumps(
                {"event_id": eid, "ts": ts, "user_id": uid,
                 "event_type": et, "value": v, "props": "{}"}) + "\n")
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    stream = spark.readStream.schema(schema).json(str(src))
    out = interval_join_streams(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    q = (out.writeStream.format("memory").queryName("ivj")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM ivj").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["user_id"], r["left_event_id"], r["right_event_id"]) == (7, 1, 2)
    assert r["delay_s"] == 600


def test_processing_time_timeout_eviction_live(spark, tmp_path):
    """Integration proof of ProcessingTimeTimeout eviction through a LIVE
    StreamingQuery (upgrades the callback-only unit test): a user's state
    materializes, the timeout fires between triggers with NO new input
    (state-store numRowsTotal drops to 0), and the user's next event
    starts a FRESH total — the running count does not resume."""
    import time

    from inception_spark.streaming.pipeline import running_user_totals

    schema = "user_id long, value double"
    src = str(tmp_path / "src")
    spark.createDataFrame([(42, 1.0), (42, 2.0)], schema).coalesce(
        1
    ).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    out = running_user_totals(stream, timeout_minutes=0.005)  # 300 ms
    q = (
        out.writeStream.format("memory")
        .queryName("evict_live")
        .outputMode("append")
        .trigger(processingTime="250 milliseconds")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        deadline = time.time() + 120

        def emitted():
            return spark.sql("SELECT * FROM evict_live").collect()

        def state_rows():
            p = q.lastProgress
            ops = (p or {}).get("stateOperators") or []
            return ops[0].get("numRowsTotal") if ops else None

        # 1. the first batch lands: running total 3.0 over 2 events
        while time.time() < deadline:
            if any(r["batch_events"] == 2 for r in emitted()):
                break
            time.sleep(0.2)
        else:
            raise AssertionError("first micro-batch never emitted")
        first = [r for r in emitted() if r["batch_events"] == 2][0]
        assert (first["n_events"], first["total_value"]) == (2, 3.0)

        # 2. with NO new input, the timeout fires on a state-cleanup
        #    micro-batch and the state store empties
        while time.time() < deadline:
            if state_rows() == 0:
                break
            time.sleep(0.2)
        else:
            raise AssertionError(
                f"state never evicted; numRowsTotal={state_rows()}"
            )

        # 3. the user re-appears → totals restart from zero (resumed
        #    state would report n_events=3 / total 8.0)
        spark.createDataFrame([(42, 5.0)], schema).coalesce(
            1
        ).write.mode("append").parquet(src)
        while time.time() < deadline:
            fresh = [r for r in emitted() if r["batch_events"] == 1]
            if fresh:
                break
            time.sleep(0.2)
        else:
            raise AssertionError("post-eviction batch never emitted")
        assert (fresh[0]["n_events"], fresh[0]["total_value"]) == (1, 5.0)
    finally:
        q.stop()


def test_stream_ivm_matches_batch_recompute(spark):
    """The stateful cross-batch IVM fold equals recomputing over the
    final base — driven through >=2 real micro-batches."""
    from pyspark.sql import functions as F

    from inception_spark.plans.ivm import ivm_state
    from inception_spark.streaming.pipeline import run_stream_ivm

    orders = spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")
    base = orders.filter("o_orderkey % 3 != 0")
    state = ivm_state(base, ["o_orderpriority"], "o_totalprice")
    deltas = (
        orders.filter("o_orderkey % 3 = 0 AND o_orderkey % 5 != 0")
        .withColumn("mult", F.lit(1))
        .unionByName(
            orders.filter("o_orderkey % 3 != 0 AND o_orderkey % 5 = 0")
            .withColumn("mult", F.lit(-1))
        )
    )
    live = run_stream_ivm(
        spark, state, deltas, ["o_orderpriority"], "o_totalprice"
    )
    want = {
        (r["o_orderpriority"]): (str(r["s"]), r["n"])
        for r in orders.filter("o_orderkey % 5 != 0")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    got = {r["o_orderpriority"]: (str(r["s"]), r["n"]) for r in live.collect()}
    assert got == want


def test_stream_partials_covariance_bit_identical(spark):
    """Batch-partial streaming covariance == batch embedding_covariance
    exactly (decimal partials re-sum identically under any batching)."""
    from pyspark.sql import functions as F

    from inception_spark.operators import pca as PCA
    from inception_spark.streaming.pipeline import run_stream_batch_partials

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")

    def partial(bdf):
        marg = PCA._cov_marg(bdf).select(
            F.lit("m").alias("kind"), "i", F.lit(-1).alias("j"),
            F.col("sx").alias("v"), "n",
        )
        pairs = PCA._cov_pairs(bdf).select(
            F.lit("p").alias("kind"), "i", "j",
            F.col("sxy").alias("v"), F.lit(0).cast("long").alias("n"),
        )
        return marg.unionByName(pairs)

    parts = run_stream_batch_partials(spark, emb, partial)
    marg, pairs = PCA.cov_merge(
        parts.filter("kind = 'm'").select("i", F.col("v").alias("sx"), "n"),
        parts.filter("kind = 'p'").select("i", "j", F.col("v").alias("sxy")),
    )
    live = {
        (r["i"], r["j"]): r["cov"]
        for r in PCA._cov_finalize(marg, pairs).collect()
    }
    batch = {
        (r["i"], r["j"]): r["cov"]
        for r in PCA.embedding_covariance(emb).collect()
    }
    assert live == batch


def test_ordered_batches_eviction_gates_late_drop(spark):
    """The empirical pin behind streaming_late_data_audit: a late row
    is dropped ONLY if its window's state was evicted in an earlier
    batch — the watermark merely passing the window end is not enough.
    Same data, two batch orders, opposite outcomes."""
    import datetime

    from pyspark.sql import functions as F

    from inception_spark.streaming.pipeline import (
        run_stream_ordered_batches,
    )

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    schema = "ts timestamp, event_type string, event_id long"
    on_time = spark.createDataFrame(
        [(base + datetime.timedelta(hours=10), "a", 1)], schema
    )
    late = spark.createDataFrame([(base, "old", 2)], schema)
    adv = spark.createDataFrame(
        [(base + datetime.timedelta(hours=10, seconds=1), "adv", 3)],
        schema,
    )
    sent = spark.createDataFrame(
        [(base + datetime.timedelta(days=30), "zz", 4)], schema
    )

    def tr(s):
        return (
            s.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .count()
            .select("event_type", F.col("count").alias("n"))
        )

    # late row arrives BEFORE any eviction: survives despite being 10h
    # behind the watermark
    no_evict = run_stream_ordered_batches(
        spark, [on_time, late, sent], tr
    )
    assert {r["event_type"] for r in no_evict.collect()} == {"a", "old"}
    # an advancer batch between them evicts the old window first: dropped
    evict = run_stream_ordered_batches(
        spark, [on_time, adv, late, sent], tr
    )
    assert {r["event_type"] for r in evict.collect()} == {"a", "adv"}


def test_streaming_attribution_fold_semantics(spark):
    """The stateful attribution fold: in-batch disorder is repaired by
    the (ts, event_id) sort, purchases with no preceding touch emit
    'direct', state (the open segment's first/last touch) carries
    ACROSS micro-batches, and trailing touches after the last purchase
    emit nothing."""
    import datetime

    from inception_spark.plans.relational import attribution_rollup
    from inception_spark.streaming.pipeline import (
        run_stream_ordered_batches,
        streaming_attribution,
    )

    t0 = datetime.datetime(2024, 1, 1)

    def r(m, uid, eid, et):
        return (uid, t0 + datetime.timedelta(minutes=m), eid, et)

    schema = "user_id long, ts timestamp, event_id long, event_type string"
    # batch 1 rows deliberately OUT of ts order within the batch;
    # user 1's segment stays open across the batch boundary
    b1 = spark.createDataFrame(
        [
            r(3, 1, 13, "click"),      # later touch, listed first
            r(1, 1, 11, "view"),       # true first touch
            r(2, 1, 12, "purchase"),   # attributed to... nothing? no:
            # sorted order is view(1) -> purchase(2) -> click(3), so
            # the purchase gets first=last='view'
            r(1, 2, 21, "purchase"),   # no touch ever -> direct
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            r(10, 1, 14, "signup"),
            r(11, 1, 15, "purchase"),  # segment = click(b1) .. signup(b2)
            r(12, 1, 16, "view"),      # trailing touch: never emitted
        ],
        schema,
    )
    conv = run_stream_ordered_batches(
        spark, [b1, b2], streaming_attribution
    )
    got = {
        (x["user_id"], x["first_touch"], x["last_touch"])
        for x in conv.collect()
    }
    assert got == {
        (1, "view", "view"),
        (2, "direct", "direct"),
        (1, "click", "signup"),   # first touch from batch 1's state
    }
    roll = {
        x["touch_type"]: (x["n_first_touch"], x["n_last_touch"])
        for x in attribution_rollup(conv).collect()
    }
    assert roll == {
        "view": (1, 1),
        "direct": (1, 1),
        "click": (1, 0),
        "signup": (0, 1),
    }


def test_stream_psi_partials_bit_identical(spark):
    """Batch-partial streaming PSI == batch psi_drift_report exactly:
    sidedness is a literal calendar rule (batch-local — no KS-style
    whole-stream scalar), so the (type, bucket) counters re-sum
    identically under any micro-batching and the 6-dp decimal-summed
    finalize reproduces the batch answer bit-for-bit."""
    from inception_spark.plans import relational as R
    from inception_spark.streaming.pipeline import run_stream_batch_partials

    sf = "/root/testdata/sf0.001"
    ev = R.load_events(spark, sf).select("event_type", "ts", "value")
    parts = run_stream_batch_partials(spark, ev, R.psi_partials)
    live = {
        r["event_type"]: (r["psi"], r["drifted"])
        for r in R.psi_finalize(parts).collect()
    }
    batch = {
        r["event_type"]: (r["psi"], r["drifted"])
        for r in R.psi_drift_report(spark, sf).collect()
    }
    assert live == batch


def test_stream_acf_partials_bit_identical(spark):
    """Hourly-counter ACF partials re-summed across micro-batches
    reproduce batch events_acf bit-for-bit (hour bucketing is per-row,
    so the rollup is a true merge lattice)."""
    from inception_spark.plans import relational as R
    from inception_spark.streaming.pipeline import run_stream_batch_partials

    sf = "/root/testdata/sf0.001"
    ev = R.load_events(spark, sf).select("event_type", "ts")
    parts = run_stream_batch_partials(spark, ev, R.acf_hourly_partials)
    live = {
        (r["event_type"], r["lag"]): r["acf"]
        for r in R.acf_finalize(parts).collect()
    }
    batch = {
        (r["event_type"], r["lag"]): r["acf"]
        for r in R.events_acf(spark, sf).collect()
    }
    assert live == batch


def test_transition_fold_straddles_batch_boundary():
    """The per-user fold emits a boundary-straddling transition exactly
    once, from state — the seam the batch lead() never sees."""
    import pandas as pd

    from inception_spark.streaming.pipeline import make_transition_update

    update_fn = make_transition_update()

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None
        @property
        def get(self):
            return self._v
        def update(self, v):
            self.exists = True
            self._v = v

    st = FakeState()
    b1 = pd.DataFrame({
        "user_id": [1, 1], "ts": [1, 2], "event_id": [1, 2],
        "event_type": ["view", "click"],
    })
    out1 = pd.concat(list(update_fn((1,), iter([b1]), st)),
                     ignore_index=True)
    assert list(zip(out1["from_type"], out1["to_type"])) == [
        ("view", "click")
    ]
    # second batch: first event's incoming edge comes from state
    b2 = pd.DataFrame({
        "user_id": [1], "ts": [3], "event_id": [3],
        "event_type": ["purchase"],
    })
    out2 = pd.concat(list(update_fn((1,), iter([b2]), st)),
                     ignore_index=True)
    assert list(zip(out2["from_type"], out2["to_type"])) == [
        ("click", "purchase")
    ]
    assert st.get == ("purchase",)


def test_stream_seasonal_decomp_partials_bit_identical(spark):
    """Hourly-counter decomposition partials re-summed across
    micro-batches reproduce batch events_seasonal_decomp bit-for-bit."""
    from inception_spark.plans import relational as R
    from inception_spark.streaming.pipeline import run_stream_batch_partials

    sf = "/root/testdata/sf0.001"
    ev = R.load_events(spark, sf).select("event_type", "ts")
    parts = run_stream_batch_partials(
        spark, ev, R.seasonal_hourly_partials
    )
    key = ["event_type", "hour_ts"]
    live = {
        tuple(r[k] for k in key): (r["n_events"], r["trend_milli"],
                                   r["seasonal_milli"], r["residual_milli"])
        for r in R.seasonal_decomp_finalize(parts).collect()
    }
    batch = {
        tuple(r[k] for k in key): (r["n_events"], r["trend_milli"],
                                   r["seasonal_milli"], r["residual_milli"])
        for r in R.events_seasonal_decomp(spark, sf).collect()
    }
    assert live == batch


def test_stream_ivm_join_interleaving_invariant(spark):
    """The higher-order join-IVM fold reaches the recompute answer
    under DIFFERENT micro-batch interleavings of A and B deltas —
    the exactness claim: each fold is exact against current states,
    so batch boundaries can't move a cent."""
    from pyspark.sql import functions as F

    from inception_spark.plans import relational as R
    from inception_spark.streaming.pipeline import run_stream_ivm_join

    sf = "/root/testdata/sf0.001"
    orders = R.load(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = R.load(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber",
        "l_extendedprice",
    )
    a_old = orders.filter("o_orderkey % 3 != 0")
    b_old = li.filter("l_linenumber % 2 = 0")
    da = orders.filter("o_orderkey % 3 = 0").select(
        F.lit("A").alias("side"),
        F.col("o_orderkey").alias("key"),
        F.col("o_orderpriority").alias("grp"),
        F.lit(None).cast("double").alias("val"),
        F.lit(1).alias("mult"),
    )
    db = li.filter("l_linenumber % 2 = 1").select(
        F.lit("B").alias("side"),
        F.col("o_orderkey").alias("key"),
        F.lit(None).cast("string").alias("grp"),
        F.col("l_extendedprice").cast("double").alias("val"),
        F.lit(1).alias("mult"),
    )
    deltas = da.unionByName(db)
    expected = {
        r["o_orderpriority"]: (float(r["s"]), r["n"])
        for r in orders.join(li, "o_orderkey")
        .groupBy(F.col("o_orderpriority"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumnRenamed("o_orderpriority", "o_orderpriority")
        .collect()
    }
    for nb in (2, 5):
        got = {
            r["grp"]: (float(r["s"]), r["n"])
            for r in run_stream_ivm_join(
                spark, a_old, b_old, deltas,
                key="o_orderkey", grp="o_orderpriority",
                val="l_extendedprice", n_batches=nb,
            ).collect()
        }
        assert got == expected, f"n_batches={nb}"
