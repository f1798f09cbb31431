"""Round-10 property pins: the overflow-proofing sweep the r9 verdict
asked for (ask 5) — every rational-threshold compare evaluated at
EXTREME data magnitudes, proving the documented int64 bounds hold where
exact decimal(38,0) isn't worth the cast.

The match_distribution_sample wrap (fixed r9) was a product of THREE
data-magnitude terms (h·tb·n ~ 2^28·2^63).  The audit of the remaining
threshold ops found only (data × small-literal) products or pure double
math; these tests drive each one at 2^50..2^62 magnitudes so a future
refactor that introduces a data×data product fails loudly (under ANSI
mode Spark throws on overflow, so a regression is an error, not a wrong
answer — these pins also document the headroom)."""

import math

import pytest
from pyspark.sql import functions as F


def test_temperature_thresholds_extreme_counts(spark):
    """The T=0.5 threshold is pure double math: floor(sqrt(n_min/n_g)
    · 2^28) must match Python exactly for group counts up to 2^62 —
    no integer product anywhere to wrap."""
    from inception_spark.operators.sampling import temperature_thresholds

    n_gs = [1, 3, 10**6, 2**40, 2**53, 2**62]
    counts = spark.createDataFrame(
        [(f"g{i}", n) for i, n in enumerate(n_gs)], "source string, n_g long"
    )
    got = {
        r["source"]: r["keep_threshold"]
        for r in temperature_thresholds(counts).collect()
    }
    n_min = min(n_gs)
    for i, n in enumerate(n_gs):
        want = math.floor(math.sqrt(n_min / n) * (1 << 28))
        assert got[f"g{i}"] == want, (n, got[f"g{i}"], want)
        assert 0 <= got[f"g{i}"] <= (1 << 28)


def test_token_budget_extreme_token_counts(spark):
    """token_budget_sample at 2^52 tokens per doc: the running sum and
    the (cum − n) < budget compare stay int64-exact (no data×data
    product), selection matches a Python fold of the same integers."""
    from inception_spark.operators.sampling import token_budget_sample

    rows = [(i, "s" if i % 2 else "t", "x") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    per_doc = F.lit(2**52) + F.col("doc_id")
    budget = 2**55  # per-source share 2^54 ≈ 4 docs' worth
    out = token_budget_sample(
        df, budget, token_count_col=per_doc, shards=4
    ).collect()
    by_src: dict = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    share = budget // 2
    for src, rs in by_src.items():
        rs = sorted(rs, key=lambda r: r["cum_tokens"])
        cum = 0
        for r in rs:
            assert r["n_tokens"] == 2**52 + r["doc_id"]
            cum += r["n_tokens"]
            assert r["cum_tokens"] == cum, (src, r["doc_id"])
            assert r["selected"] == ((cum - r["n_tokens"]) < share)
        assert cum < 2**63  # documented headroom actually exercised
        assert any(r["selected"] for r in rs)
        assert not all(r["selected"] for r in rs)


@pytest.mark.parametrize("den,num", [(5, 2), (100, 87), (3, 1)])
def test_rational_compare_extreme_counts(spark, den, num):
    """The Ed-Join/containment compare shape n_inter·den >= n_union·num
    at counts just inside the documented bound count < 2^63/den:
    integer-exact and identical to Python for every literal den used in
    the repo (beyond the bound ANSI mode throws — loud, never wrong)."""
    base = (2**63 - 1) // (den * 2)
    pairs = [
        (base, base),
        (base - 1, base),
        (base * num // den, base),
        (base * num // den + 1, base),
        (base * num // den - 1, base),
        (7, 10),
        (0, base),
    ]
    df = spark.createDataFrame(pairs, "n_inter long, n_union long")
    got = sorted(
        (r["n_inter"], r["n_union"])
        for r in df.filter(
            F.col("n_inter") * den >= F.col("n_union") * num
        ).collect()
    )
    want = sorted((i, u) for i, u in pairs if i * den >= u * num)
    assert got == want


def test_vocab_zipf_fit_two_point_exact(spark):
    """Two-term vocab: OLS through two points IS the line through them —
    slope/intercept must equal the Python computation with the same
    micro-unit rounding (pins the moment algebra and the rank order)."""
    import math

    from inception_spark.functions.text_analysis import vocab_zipf_fit

    # "aa" 8 times, "bb" twice -> ranks 1, 2
    text = " ".join(["aa"] * 8 + ["bb"] * 2)
    df = spark.createDataFrame([(text,)], "text string")
    row = vocab_zipf_fit(df).collect()[0]
    x = [round(math.log(1) * 1e6), round(math.log(2) * 1e6)]
    y = [round(math.log(8) * 1e6), round(math.log(2) * 1e6)]
    slope = (y[1] - y[0]) / (x[1] - x[0])
    intercept = (sum(y) - slope * sum(x)) / 2 / 1e6
    assert row["n_terms"] == 2
    assert row["slope_milli"] == round(slope * 1000)
    assert row["intercept_milli"] == round(intercept * 1000)


def test_media_meta_streaming_equals_batch(spark):
    """The per-width partials must re-merge to the batch rollup exactly
    under an adversarial regrouping (each doc its own partial)."""
    from inception_spark.operators.multimodal import (
        media_meta_from_partials,
        media_meta_partials,
        media_meta_stats,
        synth_bmp_corpus,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(40)], "doc_id long"
    )
    batch = sorted(map(tuple, media_meta_stats(docs).collect()))
    corpus = synth_bmp_corpus(docs)
    parts = None
    for i in range(4):  # 4 disjoint micro-batches
        p = media_meta_partials(
            corpus.filter(F.col("doc_id") % 4 == i)
        )
        parts = p if parts is None else parts.unionByName(p)
    live = sorted(map(tuple, media_meta_from_partials(parts).collect()))
    assert live == batch


def test_packing_efficiency_planted_trade(spark):
    """Hand-computable corpus: one partition, docs of 3/4/5 tokens in
    doc_id order (offsets 0,3,7) — at L=4: doc0 fits [0,3), doc1
    straddles (3..6), doc2 straddles (7..11), ceil(12/4)=3 sequences,
    zero tail pad, oversize only doc2; at L=16 nothing straddles and
    the tail pad is 4."""
    from inception_spark.operators.packing import (
        packing_efficiency_report,
    )

    docs = spark.createDataFrame(
        [
            (0, "en", "a b c"),
            (1, "en", "a b c d"),
            (2, "en", "a b c d e"),
        ],
        "doc_id long, lang string, text string",
    )
    out = {
        r["budget"]: r
        for r in packing_efficiency_report(
            docs, budgets=(4, 16)
        ).collect()
    }
    r4 = out[4]
    assert (
        r4["n_docs"],
        r4["total_tokens"],
        r4["n_sequences"],
        r4["tail_pad_tokens"],
        r4["n_oversize"],
        r4["n_straddle"],
    ) == (3, 12, 3, 0, 1, 2)
    r16 = out[16]
    assert (
        r16["n_sequences"],
        r16["tail_pad_tokens"],
        r16["n_oversize"],
        r16["n_straddle"],
    ) == (1, 4, 0, 0)


def test_pacf_ar1_cuts_off_and_matches_oracle_recursion():
    """An exact AR(1) ACF (r_k = rho^k) has PACF rho at lag 1 and 0 at
    every later lag — the defining cut-off property Durbin–Levinson
    must reproduce (within the 9-dp step rounding); and the Python
    recursion must match DuckDB's recursive-CTE twin float-for-float
    on an arbitrary (non-AR) ACF vector."""
    import duckdb

    from inception_spark.plans.relational import durbin_levinson_pacf

    rho = 0.6
    r = [rho**k for k in range(1, 9)]
    pacf = durbin_levinson_pacf(r)
    assert abs(pacf[0] - rho) < 1e-9
    assert all(abs(p) < 1e-6 for p in pacf[1:])

    r2 = [0.61, 0.37, 0.128, -0.004, 0.05, -0.17, 0.33, 0.021]
    got = [round(1000 * p) for p in durbin_levinson_pacf(r2)]
    con = duckdb.connect()
    sql = f"""
WITH RECURSIVE base AS (SELECT {r2!r}::DOUBLE[] AS r),
dl AS (
  SELECT r, 1 AS k, [round(r[1], 9)] AS phi FROM base
  UNION ALL
  SELECT r, k + 1,
         list_append([round(phi[i] - pkk * phi[k + 1 - i], 9)
                      FOR i IN range(1, k + 1)], pkk)
  FROM (SELECT r, k, phi,
          round((r[k + 1] - coalesce(list_sum(
                   [phi[i] * r[k + 1 - i] FOR i IN range(1, k + 1)]), 0))
                / (1 - coalesce(list_sum(
                   [phi[i] * r[i] FOR i IN range(1, k + 1)]), 0)), 9) AS pkk
        FROM dl WHERE k < 8))
SELECT k, CAST(round(1000 * phi[k], 0) AS BIGINT) FROM dl ORDER BY k
"""
    want = [v for _, v in con.execute(sql).fetchall()]
    assert got == want


def test_probe_bmp_dims_topdown_negative_height(spark):
    """A top-down BMP (negative height in the header) must probe as
    |height| — matching decode_bmp — instead of ANSI-overflow-throwing
    on the unsigned read (one such payload in a 100 TB corpus would
    otherwise kill the whole probe scan)."""
    import struct

    import numpy as np

    from inception_spark.operators.multimodal import (
        attach_media_meta,
        decode_bmp,
        encode_bmp,
        probe_bmp_dims,
    )

    img = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    payload = bytearray(encode_bmp(img))
    # flip the height field (1-based byte 23 / 0-based 22) to -5
    struct.pack_into("<i", payload, 22, -5)
    assert decode_bmp(bytes(payload)).shape == (5, 4, 3)
    df = spark.createDataFrame(
        [(1, bytes(payload))], "id long, payload binary"
    )
    row = probe_bmp_dims(
        attach_media_meta(df, modality="image")
    ).select("media_meta.*").collect()[0]
    assert (row["width"], row["height"]) == (4, 5)


def test_events_ccf_detects_planted_lead(spark):
    """Type 'b' is a 2-hour-delayed copy of type 'a': the cross
    correlogram must peak at lag 2 for (a -> b) with near-perfect
    correlation, and at no positive lag for (b -> a)."""
    import datetime as dt

    import inception_spark.plans.relational as R
    from inception_spark.plans.relational import events_ccf

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(48):
        n = 5 if h % 7 == 0 else 1  # spikes every 7 hours
        for _ in range(n):
            rows.append((eid, "a", base + dt.timedelta(hours=h)))
            eid += 1
            rows.append((eid, "b", base + dt.timedelta(hours=h + 2)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp_ntz"
    )
    orig = R.load_events
    try:
        R.load_events = lambda spark, sf: ev
        out = {
            (r["type_a"], r["type_b"], r["lag"]): r["ccf"]
            for r in events_ccf(spark, "ignored", max_lag=4).collect()
        }
    finally:
        R.load_events = orig
    ab = {lag: out[("a", "b", lag)] for lag in range(5)}
    assert max(ab, key=ab.get) == 2 and ab[2] > 0.9
    ba = {lag: out[("b", "a", lag)] for lag in range(5)}
    assert ba[2] < ab[2]


def test_cusum_reflection_identity_and_planted_shift(spark):
    """The window form (prefix sum minus running min) must equal the
    literal sequential recursion S_t = max(0, S_{t-1} + d_t) computed
    in Python, and a planted level shift must alarm AFTER the shift,
    never before."""
    import datetime as dt

    import inception_spark.plans.relational as R
    from inception_spark.plans.relational import events_cusum_alarms

    base = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    counts = [2] * 30 + [6] * 18  # level shift at hour 30
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, "a", base + dt.timedelta(hours=h)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp_ntz"
    )
    orig = R.load_events
    try:
        R.load_events = lambda spark, sf: ev
        out = sorted(
            events_cusum_alarms(
                spark, "ignored", slack_milli=500,
                threshold_milli=8000,
            ).collect(),
            key=lambda r: r["hr"],
        )
    finally:
        R.load_events = orig
    n = len(counts)
    s_tot = sum(counts)
    # literal recursion in 1000n-scaled integers
    S = 0
    for i, r in enumerate(out):
        d = 1000 * counts[i] * n - 1000 * s_tot - n * 500
        S = max(0, S + d)
        assert r["cusum_milli"] == S // n, i
        assert r["alarm"] == (S > n * 8000), i
    first_alarm = next(i for i, r in enumerate(out) if r["alarm"])
    assert first_alarm >= 30
    assert any(r["alarm"] for r in out[30:])


def test_unimax_waterfilling_invariants(spark):
    """UniMax invariants over adversarial size sets (a driver-side
    integer replica checks every case): allocations never exceed
    capacity, saturated sources form an ascending-capacity PREFIX, all
    unsaturated sources receive the IDENTICAL floor share, and the
    total never exceeds the budget (remainder < #unsaturated)."""
    from inception_spark.operators.sampling import unimax_allocation

    cases = [
        [1, 1, 1, 1],                     # uniform
        [1, 2, 4, 8, 16],                 # geometric
        [10, 10, 10, 1000],               # one giant
        [0, 5, 5, 500],                   # an EMPTY source
        [7],                              # single source
        [2**40, 2**41, 3],                # huge counts (headroom pin)
    ]
    budgets = [0.3, 1.0, 2.9]
    me = 3
    for sizes in cases:
        total = sum(sizes)
        for bf in budgets:
            B = int(total * bf) + 1
            rows = [
                (i, " ".join(["t"] * n), f"s{i:02d}")
                for i, n in enumerate(sizes)
                if n < 2**30
            ] or None
            if rows is None:
                continue
            docs = spark.createDataFrame(
                rows, "doc_id long, text string, source string"
            )
            out = sorted(
                (
                    (r["capacity"], r["source"], r["allocation"],
                     r["saturated"])
                    for r in unimax_allocation(
                        docs, budget_tokens=B, max_epochs=me
                    ).collect()
                )
            )
            m = len(out)
            # saturated = ascending-capacity prefix
            flags = [sat for _, _, _, sat in out]
            assert flags == sorted(flags, reverse=True), (sizes, B, out)
            shares = {a for _, _, a, sat in out if not sat}
            assert len(shares) <= 1, (sizes, B, out)
            total_alloc = 0
            for cap, _, alloc, sat in out:
                assert alloc <= cap, (sizes, B, out)
                assert alloc == cap if sat else True
                total_alloc += alloc
            assert total_alloc <= B, (sizes, B, out)
            n_unsat = m - sum(flags)
            if n_unsat:
                # the undistributed remainder of the floor fair share
                assert B - total_alloc < n_unsat, (sizes, B, out)
