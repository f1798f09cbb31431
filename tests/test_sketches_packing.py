"""Deterministic HLL sketch + sequence-packing operator tests."""

from pyspark.sql import functions as F

from inception_spark.functions.sketches import HLL_M, hll_ndv, hll_ndv_py
from inception_spark.operators.packing import pack_sequences


def test_hll_matches_python_twin_and_is_accurate(spark):
    n = 5000
    df = spark.range(n).select((F.col("id") % 1300).alias("v"))
    est = hll_ndv(df, "v").head()
    py = hll_ndv_py([i % 1300 for i in range(n)])
    assert est["estimate"] == py           # engine-stable estimate
    assert est["n_registers"] == HLL_M
    # standard error for m=256 is ~6.5%; allow 3 sigma
    assert abs(est["estimate"] - 1300) / 1300 < 0.2


def test_hll_small_range_linear_counting(spark):
    df = spark.range(10).select(F.col("id").alias("v"))
    est = hll_ndv(df, "v").head()["estimate"]
    py = hll_ndv_py(list(range(10)))
    assert est == py
    assert abs(est - 10) <= 1              # linear counting is near-exact


def test_pack_sequences_offsets_and_bins(spark):
    rows = [
        # part 'a': token counts 3, 4, 5 → offsets 0, 3, 7
        (1, "a", "one two three"),
        (2, "a", "one two three four"),
        (3, "a", "one two three four five"),
        # part 'b': independent stream
        (4, "b", "x y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["doc_id"]: r for r in pack_sequences(df, budget=5).collect()}
    # regex tokenizer splits runs > 4 letters ("three" → "thre","e"), so
    # token counts are 4, 5, 6 → offsets 0, 4, 9
    assert [out[i]["n_tokens"] for i in (1, 2, 3)] == [4, 5, 6]
    assert [out[i]["start_offset"] for i in (1, 2, 3)] == [0, 4, 9]
    assert [out[i]["seq_id"] for i in (1, 2, 3)] == [0, 0, 1]
    assert out[4]["start_offset"] == 0 and out[4]["seq_id"] == 0
    assert not out[1]["oversize"] and not out[2]["oversize"]
    assert out[3]["oversize"]  # 6 tokens > budget 5


def test_pack_sequences_rejects_bad_budget(spark):
    import pytest

    df = spark.createDataFrame([(1, "a", "x")], "doc_id long, lang string, text string")
    with pytest.raises(ValueError):
        pack_sequences(df, budget=0)


def test_cms_never_underestimates(spark):
    from inception_spark.functions.sketches import cms_estimate_topk

    # zipf-ish: value v appears (200 - v) times for v in 0..99
    rows = [(v,) for v in range(100) for _ in range(200 - v)]
    df = spark.createDataFrame(rows, "v long")
    out = cms_estimate_topk(df, "v", k=15).collect()
    assert len(out) == 15
    assert [r["rank"] for r in out] != []
    for r in out:
        assert r["cms_n"] >= r["exact_n"]          # CMS property
        assert r["cms_n"] - r["exact_n"] <= 200    # and tight at this scale
    top = min(out, key=lambda r: r["rank"])
    assert top["value"] == "0" and top["exact_n"] == 200


from hypothesis import given, settings, strategies as st


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10_000),
             min_size=1, max_size=400)
)
def test_hll_python_reference_properties(values):
    """HLL reference impl: deterministic, and within 5σ of the true NDV
    (σ = 1.04/√m ≈ 6.5% for m=256) — the distributed version equals this
    implementation exactly (separately pinned against Spark/DuckDB)."""
    from inception_spark.functions.sketches import HLL_M, hll_ndv_py

    est, est2 = hll_ndv_py(values), hll_ndv_py(list(values))
    assert est == est2
    truth = len(set(values))
    sigma = 1.04 / (HLL_M ** 0.5)
    assert abs(est - truth) <= max(3.0, 5 * sigma * truth)


def test_pack_sequences_prefix_sum_invariants(spark):
    """Offsets are exactly the prefix sums in id order within each
    partition, seq_id is monotone, and every non-oversize doc's tokens
    start strictly inside its sequence's budget window."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    budget = 512
    out = pack_sequences(docs, budget=budget).collect()
    by_part = {}
    for r in out:
        by_part.setdefault(r["part"], []).append(r)
    assert sum(len(v) for v in by_part.values()) == docs.count()
    for part, rows in by_part.items():
        rows.sort(key=lambda r: r["doc_id"])
        run = 0
        prev_seq = 0
        for r in rows:
            assert r["start_offset"] == run
            assert r["seq_id"] == run // budget
            assert r["seq_id"] >= prev_seq
            assert r["oversize"] == (r["n_tokens"] > budget)
            prev_seq = r["seq_id"]
            run += r["n_tokens"]


def test_hll_grouped_rollup_property(spark):
    """The grouped register table is a mergeable sketch: re-aggregating
    fine-grained registers to a coarser grouping yields EXACTLY the
    estimates a direct coarse scan produces — the property that lets a
    100 TB pipeline keep per-day sketches and roll them up to months
    without rescanning."""
    from pyspark.sql import functions as F

    from inception_spark.functions.sketches import (
        HLL_ALPHA,
        HLL_M,
        hll_ndv_by_group,
        hll_rank,
        hll_register,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # fine grouping: (event_type, user bucket); coarse: event_type
    fine = ev.select(
        F.col("event_type").alias("t"),
        (F.col("event_id") % 3).alias("sub"),
        F.col("user_id").cast("string").alias("_v"),
    ).filter(F.col("_v").isNotNull())
    fine_regs = (
        fine.select(
            "t", "sub",
            hll_register(F.col("_v")).alias("reg"),
            hll_rank(F.col("_v")).alias("rank"),
        )
        .groupBy("t", "sub", "reg")
        .agg(F.max("rank").alias("mx"))
    )
    # roll up: max-merge registers across sub-groups, then estimate
    merged = fine_regs.groupBy("t", "reg").agg(F.max("mx").alias("mx"))
    agg = merged.groupBy("t").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("ps"),
        F.count(F.lit(1)).alias("np"),
    )
    m = float(HLL_M)
    lc = F.lit(m) * F.log(F.lit(m) / F.col("n_zero"))
    rolled = {
        r["t"]: r["estimate"]
        for r in agg.select(
            "t",
            (F.col("ps") + (F.lit(m) - F.col("np"))).alias("s"),
            (F.lit(HLL_M) - F.col("np")).alias("n_zero"),
        ).select(
            "t",
            (F.lit(HLL_ALPHA) * F.lit(m) * F.lit(m) / F.col("s")).alias(
                "e_raw"
            ),
            "n_zero",
        ).select(
            "t",
            F.round(
                F.when(
                    (F.col("e_raw") <= F.lit(2.5 * m))
                    & (F.col("n_zero") > 0),
                    lc,
                ).otherwise(F.col("e_raw")),
                4,
            ).alias("estimate"),
        ).collect()
    }
    direct = {
        r["grp"]: r["estimate"]
        for r in hll_ndv_by_group(ev, "event_type", "user_id").collect()
    }
    assert rolled == direct and len(direct) >= 2
    # estimates are in a sane band around exact NDV (rel err < 25%)
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("n")
        ).collect()
    }
    for t, est in direct.items():
        assert abs(est - exact[t]) / exact[t] < 0.25, (t, est, exact[t])


def test_hll_register_merge_equals_full_scan(spark):
    """Register-wise max merge of per-batch sketches == one-pass sketch
    over the union — exactly (the mergeable-sketch contract), and a
    batch merged with itself is a no-op (idempotent)."""
    from inception_spark.functions.sketches import (
        hll_estimate_from_registers,
        hll_merge_registers,
        hll_ndv_by_group,
        hll_registers_by_group,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    full = {
        r["grp"]: r["estimate"]
        for r in hll_ndv_by_group(ev, "event_type", "user_id").collect()
    }
    b1 = hll_registers_by_group(
        ev.filter("event_id % 2 = 0"), "event_type", "user_id"
    )
    b2 = hll_registers_by_group(
        ev.filter("event_id % 2 = 1"), "event_type", "user_id"
    )
    merged = {
        r["grp"]: r["estimate"]
        for r in hll_estimate_from_registers(
            hll_merge_registers(b1, b2)
        ).collect()
    }
    assert merged == full and len(full) > 0
    twice = {
        r["grp"]: r["estimate"]
        for r in hll_estimate_from_registers(
            hll_merge_registers(b1, b2, b1, b2)
        ).collect()
    }
    assert twice == full


def test_hll_overlap_identical_and_disjoint(spark):
    """Identical groups: overlap == each side's NDV and union == side.
    Disjoint groups: union == a+b (exact at this cardinality), overlap
    clamps at >= 0."""
    from inception_spark.functions.sketches import hll_overlap

    rows = [("a", i) for i in range(40)] + [("b", i) for i in range(40)]
    df = spark.createDataFrame(rows, "grp string, v long")
    r = hll_overlap(df, "grp", "v", "a", "b").collect()[0]
    assert r.ndv_a == r.ndv_b == r.ndv_union
    assert abs(r.ndv_overlap - r.ndv_a) < 1e-6

    rows2 = [("a", i) for i in range(40)] + [("b", 1000 + i) for i in range(40)]
    df2 = spark.createDataFrame(rows2, "grp string, v long")
    r2 = hll_overlap(df2, "grp", "v", "a", "b").collect()[0]
    assert r2.ndv_union > max(r2.ndv_a, r2.ndv_b)
    assert r2.ndv_overlap >= 0.0
    assert r2.ndv_overlap < 0.2 * r2.ndv_union


def test_kmv_overlap_exact_small_and_disjoint(spark):
    """Below k the sketch IS the set: identical groups give exact
    counts and full overlap; disjoint groups give ~zero overlap and a
    union near a+b."""
    from inception_spark.functions.sketches import kmv_overlap

    rows = [("a", i) for i in range(30)] + [("b", i) for i in range(30)]
    df = spark.createDataFrame(rows, "grp string, v long")
    r = kmv_overlap(df, "grp", "v", "a", "b", k=64).collect()[0]
    assert (r.ndv_a, r.ndv_b, r.ndv_union, r.ndv_overlap) == (30.0, 30.0, 30.0, 30.0)

    rows2 = [("a", i) for i in range(300)] + [("b", 9000 + i) for i in range(300)]
    df2 = spark.createDataFrame(rows2, "grp string, v long")
    r2 = kmv_overlap(df2, "grp", "v", "a", "b", k=64).collect()[0]
    assert r2.ndv_union > 1.5 * max(r2.ndv_a, r2.ndv_b)
    assert r2.ndv_overlap < 0.15 * r2.ndv_union
    # estimator accuracy sanity at k=64: within ~35%
    assert 195 < r2.ndv_a < 405 and 195 < r2.ndv_b < 405


def test_kmv_sketch_is_mergeable(spark):
    """The KMV merge property that makes it incremental-safe: the k
    smallest hashes of a UNION of per-batch top-k sketches equal the
    top-k over the full data — so per-ingest-batch sketches fold
    without rescanning history (the min-k member of the mergeable
    quartet: max-HLL, sum-CMS, union-sample, min-k-KMV)."""
    from pyspark.sql import Window, functions as F

    from inception_spark.functions import hashing as H

    k = 32
    full = spark.range(0, 1000).select(
        H.h60(F.col("id").cast("string")).alias("h")
    ).distinct()
    w = Window.orderBy("h")
    topk_full = [
        r.h for r in full.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k).collect()
    ]
    batches = []
    for p in range(3):  # three disjoint ingest batches
        b = spark.range(0, 1000).filter(F.col("id") % 3 == p).select(
            H.h60(F.col("id").cast("string")).alias("h")
        ).distinct()
        batches.append(
            b.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k).select("h")
        )
    merged = batches[0]
    for b in batches[1:]:
        merged = merged.unionByName(b)
    topk_merged = [
        r.h for r in merged.distinct()
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k).collect()
    ]
    assert topk_merged == topk_full


def test_kmv_overlap_missing_group(spark):
    """A group with no rows estimates 0 NDV and 0 overlap instead of
    erroring — ingest gates call this before data exists."""
    from inception_spark.functions.sketches import kmv_overlap

    df = spark.createDataFrame(
        [("a", i) for i in range(10)], "grp string, v long"
    )
    r = kmv_overlap(df, "grp", "v", "a", "nope", k=16).collect()[0]
    assert r.ndv_a == 10.0 and r.ndv_b == 0.0
    assert r.ndv_union == 10.0 and r.ndv_overlap == 0.0


def test_cumulative_ndv_monotone_and_final_equals_global(spark):
    """The growth curve never decreases, its final point equals the
    global one-shot estimate, and a gap day inherits the running
    state."""
    from datetime import datetime as dt

    from inception_spark.functions.sketches import cumulative_ndv, hll_ndv

    rows = []
    # day 1: users 0-19; day 2: users 10-29; day 4: users 0-5 (no new)
    for u in range(20):
        rows.append((dt(2024, 1, 1, 10), u))
    for u in range(10, 30):
        rows.append((dt(2024, 1, 2, 10), u))
    for u in range(6):
        rows.append((dt(2024, 1, 4, 10), u))
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    curve = {
        r.bucket_ts.day: r.estimate
        for r in cumulative_ndv(df, time_col="ts", col="user_id").collect()
    }
    assert sorted(curve) == [1, 2, 4]
    assert curve[1] <= curve[2] <= curve[4] or (
        curve[1] <= curve[2] and curve[2] == curve[4]
    )
    assert curve[4] == curve[2]  # day 4 adds no new users
    glob = hll_ndv(df, "user_id").collect()[0].estimate
    assert curve[4] == glob


def test_hll_rollup_equals_fresh_scan_at_every_grain(spark):
    """The property that makes the one-scan NDV cube sound: estimating
    from register-wise-max rolled-up state equals estimating from a
    fresh scan grouped at that grain — for every grouping set,
    including global."""
    from pyspark.sql import functions as F

    from inception_spark.functions.sketches import (
        hll_ndv,
        hll_ndv_by_group,
        hll_ndv_rollup,
    )

    ev = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    cube = {
        tuple(r[:3]): r["estimate"]
        for r in hll_ndv_rollup(
            ev, ["event_type", "day"], "user_id"
        ).collect()
    }
    # per-type grain vs fresh grouped scan
    fresh_type = {
        r["grp"]: r["estimate"]
        for r in hll_ndv_by_group(ev, "event_type", "user_id").collect()
    }
    for t, est in fresh_type.items():
        assert cube[("event_type", t, "(all)")] == est
    # per-day grain
    fresh_day = {
        r["grp"]: r["estimate"]
        for r in hll_ndv_by_group(ev, "day", "user_id").collect()
    }
    for d, est in fresh_day.items():
        assert cube[("day", "(all)", d)] == est
    # global grain vs the ungrouped estimator
    g = hll_ndv(ev, "user_id").collect()[0]["estimate"]
    assert cube[("(global)", "(all)", "(all)")] == g
