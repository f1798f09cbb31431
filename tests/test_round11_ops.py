"""Unit pins for the round-11 operators: JS drift, 13-gram
decontamination, and the TIFF pixel-stats corpus entry."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_js_drift_symmetric_and_bounded(spark):
    """JS(P, Q) == JS(Q, P) (swap the periods by relabeling the
    counters) and 0 <= JS <= ln 2 — the properties that distinguish it
    from PSI; identical distributions score ~0."""
    import math

    from inception_spark.plans.relational import js_finalize

    rows = [
        ("a", 0, 100, 10), ("a", 1, 50, 90), ("a", 2, 7, 300),
        ("b", 0, 40, 40), ("b", 1, 60, 60),
    ]
    parts = spark.createDataFrame(
        rows, "event_type string, bucket int, n_old long, n_new long"
    )
    fwd = {r["event_type"]: r["js"]
           for r in js_finalize(parts, n_buckets=3).collect()}
    swapped = parts.select(
        "event_type", "bucket",
        F.col("n_new").alias("n_old"), F.col("n_old").alias("n_new"),
    )
    rev = {r["event_type"]: r["js"]
           for r in js_finalize(swapped, n_buckets=3).collect()}
    assert fwd == rev
    for v in fwd.values():
        assert 0.0 <= v <= math.log(2) + 1e-9
    # identical distributions -> (near) zero, far below the 0.05 flag
    assert fwd["b"] < 0.001
    assert fwd["a"] > 0.05


def test_js_drift_live_equals_batch_on_any_split(spark):
    """The psi_partials counter lattice re-sums under any regrouping,
    so js_finalize over re-merged partials equals the batch score —
    the property the streaming twin rides."""
    from inception_spark.plans.relational import js_finalize, psi_partials

    ev = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).select("event_type", "ts", "value")
    batch = {
        r["event_type"]: r["js"]
        for r in js_finalize(
            psi_partials(ev), assume_merged=True
        ).collect()
    }
    # split into 3 arbitrary slices, compute partials per slice, re-sum
    parts = None
    for i in range(3):
        p = psi_partials(ev.filter(F.col("event_id") % 3 == i))
        parts = p if parts is None else parts.unionByName(p)
    live = {
        r["event_type"]: r["js"]
        for r in js_finalize(parts, assume_merged=False).collect()
    }
    assert live == batch


def test_contamination_13gram_hand_docs(spark):
    """Hand-built corpus: only the doc sharing a verbatim 13-word span
    with the benchmark is flagged; 12-word overlaps do NOT fire."""
    from inception_spark.operators.dedup import contamination_13gram

    span = " ".join(f"w{i}" for i in range(13))          # 13 shared words
    near = " ".join(f"w{i}" for i in range(12))          # only 12
    bench = spark.createDataFrame(
        [(100, f"intro {span} outro")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, f"prefix {span} suffix"),                 # contaminated
            (2, f"prefix {near} different suffix zz"),    # 12-gram: clean
            (3, "totally unrelated text with many words"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           contamination_13gram(corpus, bench).collect()}
    assert set(out) == {1}
    # doc 1: words = prefix w0..w12 suffix (15 words) -> 3 distinct
    # 13-grams, exactly 1 of which (the span itself) is in the bench
    assert out[1]["n_grams"] == 3
    assert out[1]["n_hit"] == 1
    assert out[1]["contam_permille"] == 333


def test_contamination_gate_matches_batch(spark):
    """The stateless plan-literal gate form (array_intersect) produces
    the same rows as the broadcast-join batch form."""
    from inception_spark.functions import hashing as H
    from inception_spark.operators.dedup import contamination_13gram

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter("doc_id % 29 = 0")
    corpus = docs.filter("doc_id % 29 != 0")
    batch = sorted(
        map(tuple, contamination_13gram(corpus, bench).collect())
    )
    grams = H.shingles(F.col("text"), n=13)
    lit_bench = F.array(*[
        F.lit(r["gram"]) for r in bench.select(
            F.explode(grams).alias("gram")
        ).distinct().collect()
    ])
    gate = corpus.select(
        "doc_id",
        F.size(grams).cast("long").alias("n_grams"),
        F.size(F.array_intersect(grams, lit_bench)).cast("long").alias(
            "n_hit"
        ),
    ).filter("n_hit > 0").select(
        "doc_id", "n_grams", "n_hit",
        F.expr("(1000 * n_hit) div n_grams").cast("long").alias(
            "contam_permille"
        ),
    )
    assert sorted(map(tuple, gate.collect())) == batch


def test_contamination_no_gram_shuffle_in_plan(spark):
    """The corpus must never shuffle on gram: the only Exchanges in the
    plan are the per-doc hit count aggregate (hashpartitioning on
    doc_id) — the benchmark side is broadcast."""
    from inception_spark.operators.dedup import contamination_13gram

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = contamination_13gram(
        docs.filter("doc_id % 29 != 0"), docs.filter("doc_id % 29 = 0")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus->bench gram probe is a broadcast hash join (BuildRight
    # on the bench grams), never a shuffled join of corpus grams
    assert "BroadcastHashJoin [gram" in plan and "BuildRight" in plan
    assert "SortMergeJoin [gram" not in plan
    # exactly ONE gram shuffle exists: the BENCH side's distinct()
    # (benchmark-sized); every other exchange is keyed on doc_id
    gram_ex = [l for l in plan.splitlines()
               if "Exchange hashpartitioning(gram" in l]
    assert len(gram_ex) == 1, gram_ex
    other_ex = [l for l in plan.splitlines()
                if "Exchange hashpartitioning" in l and l not in gram_ex]
    assert all("doc_id" in l for l in other_ex), other_ex


def test_tiff_pixel_stats_closed_form(spark):
    """The decode round-trip aggregate equals the synthesis formula
    evaluated in numpy over the same id set."""
    from inception_spark.operators.multimodal import tiff_pixel_stats

    docs = spark.createDataFrame(
        [(i,) for i in range(40)], "doc_id long"
    )
    got = {
        r["width"]: (r["n_images"], r["sum_pixels_value"])
        for r in tiff_pixel_stats(docs).collect()
    }
    want: dict = {}
    for i in range(40):
        w, h = i % 11 + 1, i % 6 + 2
        xx = np.arange(w)[None, :, None]
        yy = np.arange(h)[:, None, None]
        cc = np.arange(3)[None, None, :]
        s = int(((5 * xx + 13 * yy + 31 * cc + i) % 256).sum())
        n, t = want.get(w, (0, 0))
        want[w] = (n + 1, t + s)
    assert got == want


def test_rake_hand_corpus(spark):
    """Tiny corpus with known RAKE arithmetic: phrases split at
    stopwords, degree/frequency integer scores, multi-word phrases
    outrank their member singletons."""
    from inception_spark.functions.text_analysis import rake_keywords

    docs = spark.createDataFrame(
        [
            (1, "deep learning of the deep model"),
            (2, "deep learning wins the race"),
        ],
        "doc_id long, text string",
    )
    out = {r["phrase"]: r for r in
           rake_keywords(docs, ["of", "the"], k=10).collect()}
    # phrases: "deep learning", "deep model", "deep learning wins",
    # "race".  word stats over phrase-member occurrences:
    #   deep: freq 3 (all three deep-phrases), degree 2+2+3=7 -> 2333
    #   learning: freq 2, degree 2+3=5 -> 2500
    #   model: freq 1, degree 2 -> 2000; wins: freq 1, degree 3 -> 3000
    #   race: freq 1, degree 1 -> 1000
    assert out["deep learning"]["n_occurrences"] == 1
    assert out["deep learning"]["score_milli"] == 2333 + 2500
    assert out["deep learning wins"]["score_milli"] == 2333 + 2500 + 3000
    assert out["deep model"]["score_milli"] == 2333 + 2000
    assert out["race"]["score_milli"] == 1000
    # ranking: longest phrase first
    assert min(out.values(), key=lambda r: r["rank"])["phrase"] == (
        "deep learning wins"
    )


def test_rouge2_multiset_not_distinct(spark):
    """A candidate repeating a reference bigram only gets credit up to
    the reference's own count — the multiset rule that distinguishes
    rouge2_eval from the distinct-shingle ops."""
    from inception_spark.functions.text_analysis import rouge2_eval

    pairs = spark.createDataFrame(
        [
            # ref has "a b" twice; cand has it three times -> overlap 2
            (1, 10, "a b a b a b", "a b c a b"),
            # no shared bigrams
            (2, 20, "x y", "p q r"),
        ],
        "cand_id long, ref_id long, cand_text string, ref_text string",
    )
    out = {r["cand_id"]: r for r in rouge2_eval(pairs).collect()}
    r1 = out[1]
    # ref bigrams: a b, b c, c a, a b -> 4 total; overlap: min(3,2)=2
    assert r1["ref_bigrams"] == 4
    assert r1["overlap_bigrams"] == 2
    assert r1["rouge2_recall_milli"] == 500
    assert out[2]["overlap_bigrams"] == 0


def test_trimmed_stats_tail_contamination(spark, tmp_path):
    """A planted outlier moves the raw mean but neither robust mean."""
    import datetime as dt

    from inception_spark.plans.relational import trimmed_stats

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base, 7, "t", float(v), "{}")
            for i, v in enumerate([10.0] * 98 + [10.0, 100000.0])]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = trimmed_stats(spark, str(tmp_path)).collect()[0]
    assert r["mean_raw"] > 1000
    assert r["mean_trimmed"] == 10.0
    # winsorized: outlier clamped to p90 (=10.0) -> also 10.0
    assert r["mean_winsorized"] == 10.0


def test_streaming_ivf_assign_matches_batch_cells(spark):
    """The stateless plan-literal routing equals _ivf_cells' batch
    assignment (same seeds, same rounding, same tie-break)."""
    from inception_spark.operators.similarity import _ivf_cells

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    _, cell = _ivf_cells(emb, n_centroids=8)
    batch = sorted(map(tuple, cell.collect()))
    import __spark_entry__ as E

    live = sorted(
        map(tuple, E.queries()["streaming_ivf_assign"](
            spark, "/root/testdata/sf0.001"
        ).collect())
    )
    assert live == batch


def test_trimmed_and_rake_partials_remerge_to_batch(spark):
    """The wave-3 lattices: re-merged per-slice partials equal the
    batch report (value-spine counters for trimmed_stats, phrase
    counters for RAKE, degree counts for the Hill sweep)."""
    from inception_spark.functions.text_analysis import (
        rake_finalize,
        rake_keywords,
        rake_phrase_partials,
    )
    from inception_spark.plans.relational import (
        degree_partials,
        powerlaw_finalize,
        trimmed_stats_finalize,
        trimmed_value_partials,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch = sorted(map(tuple, trimmed_stats_finalize(
        trimmed_value_partials(ev), assume_merged=True
    ).collect()))
    parts = None
    for i in range(3):
        p = trimmed_value_partials(ev.filter(F.col("event_id") % 3 == i))
        parts = p if parts is None else parts.unionByName(p)
    live = sorted(map(tuple, trimmed_stats_finalize(parts).collect()))
    assert live == batch

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stops = ["join", "hash", "row", "batch", "scan"]
    batch_rake = sorted(map(tuple, rake_keywords(docs, stops).collect()))
    parts = None
    for i in range(3):
        p = rake_phrase_partials(
            docs.filter(F.col("doc_id") % 3 == i), stops
        )
        parts = p if parts is None else parts.unionByName(p)
    live_rake = sorted(map(tuple, rake_finalize(parts).collect()))
    assert live_rake == batch_rake

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    batch_pl = sorted(map(tuple, powerlaw_finalize(
        degree_partials(orders), assume_merged=True
    ).collect()))
    parts = None
    for i in range(3):
        p = degree_partials(orders.filter(F.col("o_orderkey") % 3 == i))
        parts = p if parts is None else parts.unionByName(p)
    live_pl = sorted(map(tuple, powerlaw_finalize(parts).collect()))
    assert live_pl == batch_pl


def test_kn_bigram_is_a_proper_distribution(spark):
    """The pin NOT derived from the scorer's own rule: for every
    history v, Σ_w P_KN(w|v) over the model's vocabulary must equal 1
    (the defining property of interpolated KN) — computed in numpy
    from raw bigram counts, then compared against the operator's
    per-occurrence probabilities recovered from its logprobs."""
    import math
    from collections import Counter, defaultdict

    from inception_spark.functions.text_analysis import (
        doc_bigram_kn_logprob,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(60)
    rows = docs.select("doc_id", "text").collect()
    import re

    c12: Counter = Counter()
    for r in rows:
        w = re.findall(r"[a-z0-9]+", r["text"].lower())
        for a, b in zip(w, w[1:]):
            c12[(a, b)] += 1
    c1: Counter = Counter()
    n1f: Counter = Counter()
    n1b: Counter = Counter()
    for (a, b), c in c12.items():
        c1[a] += c
        n1f[a] += 1
        n1b[b] += 1
    T = len(c12)
    D = 0.75
    vocab_w2 = set(n1b)

    def p_kn(a, b):
        return (c12.get((a, b), 0) - D) / c1[a] * (
            1 if c12.get((a, b), 0) else 0
        ) + (D * n1f[a]) / c1[a] * (n1b[b] / T)

    # 1. proper distribution per history over the CONTINUATION vocab
    for a in list(c1)[:40]:
        s = sum(
            max(c12.get((a, b), 0) - D, 0) / c1[a]
            + (D * n1f[a]) / c1[a] * (n1b[b] / T)
            for b in vocab_w2
        )
        assert math.isclose(s, 1.0, rel_tol=1e-9), (a, s)

    # 2. the operator's mean logprob equals the numpy replica
    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_logprob"])
        for r in doc_bigram_kn_logprob(docs).collect()
    }
    from decimal import Decimal

    for r in rows:
        w = re.findall(r"[a-z0-9]+", r["text"].lower())
        bgs = list(zip(w, w[1:]))
        nb, mlp = got[r["doc_id"]]
        assert nb == len(bgs)
        if not bgs:
            assert mlp is None
            continue
        terms = [
            Decimal(str(round(math.log(p_kn(a, b)), 6)))
            for a, b in bgs
        ]
        want = float(sum(terms)) / len(terms)
        assert math.isclose(mlp, want, rel_tol=1e-9), r["doc_id"]


def test_hilbert_adjacency_exhaustive(spark):
    """The DEFINING Hilbert property, which the Morton key cannot
    satisfy: enumerate every cell of the 16x16 (bits=4) grid, sort by
    key, and assert each consecutive pair is Manhattan-distance-1 —
    plus key bijectivity, and Spark ≡ the classic xy2d loop cell for
    cell."""
    from inception_spark.operators.layout import (
        hilbert_key_expr,
        hilbert_key_py,
    )

    cells = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    rows = cells.select(
        "x", "y", hilbert_key_expr(F.col("x"), F.col("y"), bits=4)
        .alias("d")
    ).collect()
    got = {(r["x"], r["y"]): r["d"] for r in rows}
    # parity with the classic loop
    for (x, y), d in got.items():
        assert d == hilbert_key_py(x, y, bits=4), (x, y)
    # bijective onto 0..255
    assert sorted(got.values()) == list(range(256))
    # consecutive keys are adjacent cells
    by_d = sorted(got.items(), key=lambda kv: kv[1])
    for ((x1, y1), _), ((x2, y2), _) in zip(by_d, by_d[1:]):
        assert abs(x1 - x2) + abs(y1 - y2) == 1, ((x1, y1), (x2, y2))


def test_morton_fails_adjacency_where_hilbert_holds():
    """Documentation-by-test of WHY hilbert_key exists: the Z-order
    curve jumps (consecutive Morton keys that are not neighbors) —
    the locality gap the Hilbert layout closes."""
    from inception_spark.operators.layout import _spread_py

    def morton(x, y):
        return _spread_py(x, 2, 4) | (_spread_py(y, 2, 4) << 1)

    cells = sorted(
        ((morton(x, y), x, y) for x in range(16) for y in range(16))
    )
    jumps = sum(
        1
        for (_, x1, y1), (_, x2, y2) in zip(cells, cells[1:])
        if abs(x1 - x2) + abs(y1 - y2) != 1
    )
    assert jumps > 0  # Z-order genuinely jumps on this grid
