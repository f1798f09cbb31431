"""Naive Bayes classifier: oracle parity + operator contracts."""

import duckdb
import pytest
from pyspark.sql import functions as F

from inception_spark.operators.classify import (
    nb_lang_classify,
    nb_lang_classify_sql,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def test_nb_matches_duckdb_oracle(spark, docs):
    res = sorted(
        (r["doc_id"], r["label"], r["pred"], r["correct"], r["score"])
        for r in nb_lang_classify(docs).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    orc = sorted(
        tuple(r) for r in con.execute(nb_lang_classify_sql()).fetchall()
    )
    assert res == orc


def test_nb_one_prediction_per_doc_and_beats_chance(spark, docs):
    res = nb_lang_classify(docs)
    n = docs.count()
    assert res.count() == n
    assert res.select("doc_id").distinct().count() == n
    n_labels = docs.select("lang").distinct().count()
    acc = res.where("correct").count() / n
    assert acc > 1.5 / n_labels, f"accuracy {acc} not above chance"


def test_nb_partitioning_independent(spark, docs):
    a = {
        (r["doc_id"], r["pred"], r["score"])
        for r in nb_lang_classify(docs).collect()
    }
    b = {
        (r["doc_id"], r["pred"], r["score"])
        for r in nb_lang_classify(docs.repartition(17)).collect()
    }
    assert a == b


def test_nb_empty_doc_falls_back_to_prior(spark):
    """A doc with no in-vocab tokens gets the majority-prior class."""
    rows = [(i, "common words repeated here", "en") for i in range(6)]
    rows += [(10 + i, "andere worte ganz anders", "de") for i in range(2)]
    rows.append((99, "", "de"))  # empty text → prior argmax = en
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    res = {r["doc_id"]: r["pred"] for r in nb_lang_classify(df, min_count=2).collect()}
    assert res[99] == "en"
    assert len(res) == 9


def test_bigram_logprob_edge_docs(spark):
    """0/1-word docs surface with n_bigrams=0 (not dropped); repeated
    bigrams of a deterministic corpus score ln(1)=0."""
    from inception_spark.functions.text_analysis import doc_bigram_logprob

    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "two words"), (4, "a b a b")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_logprob"])
        for r in doc_bigram_logprob(df).collect()
    }
    assert got == {1: (0, None), 2: (0, None), 3: (1, 0.0), 4: (3, 0.0)}


def test_lr_gd_matches_hand_computation(spark):
    """Three GD rounds replicated in plain Python on a tiny frame: the
    engine's decimal gradient sums and driver weight updates must equal
    the reference float loop exactly."""
    import math
    from decimal import Decimal

    from inception_spark.operators.classify import lr_quality_classify

    rows = [
        (0, "alpha beta gamma", "en"),
        (1, "un deux trois quatre", "fr"),
        (2, "tiny", "en"),
        (3, "ein zwei drei vier funf sechs", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    # reference loop (same feature defs, same rounding discipline)
    feats = []
    for _id, text, lang in rows:
        nw = len(text.split())
        ln = float(len(text))
        feats.append((
            _id,
            [1.0, ln / 1000.0, nw / 100.0, (ln / nw) if nw else 0.0],
            1.0 if lang == "en" else 0.0,
        ))
    w = [0.0] * 4
    for _ in range(3):
        gs = [Decimal(0)] * 4
        for _id, x, y in feats:
            z = sum(wj * xj for wj, xj in zip(w, x))
            p = 1.0 / (1.0 + math.exp(-z))
            for j in range(4):
                q = Decimal(repr(round((p - y) * x[j], 6)))
                gs[j] += q.quantize(Decimal("0.000001"))
        w = [w[j] - 0.5 * (float(gs[j]) / len(feats)) for j in range(4)]
    expect = {}
    for _id, x, y in feats:
        z = sum(wj * xj for wj, xj in zip(w, x))
        p = round(1.0 / (1.0 + math.exp(-z)), 6)
        expect[_id] = (y, p, p >= 0.5, (p >= 0.5) == (y == 1.0))

    got = {
        r["doc_id"]: (r["y"], r["prob"], r["pred"], r["correct"])
        for r in lr_quality_classify(df).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# classifier evaluation scorecard
# ---------------------------------------------------------------------------

def test_roc_auc_matches_brute_force_pairs(spark):
    """AUC from the rank-sum identity == P(score_pos > score_neg)
    + 0.5·P(tie), counted pairwise from scratch (tie handling proven,
    not assumed)."""
    import itertools
    import random

    from inception_spark.operators.classify import roc_auc

    rnd = random.Random(11)
    rows = [
        (float(rnd.randint(0, 1)), round(rnd.choice([0.1, 0.3, 0.5, 0.7]) +
                                         rnd.randint(0, 2) * 0.1, 6))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "y double, prob double")
    got = roc_auc(df).collect()[0]

    pos = [s for y, s in rows if y == 1.0]
    neg = [s for y, s in rows if y == 0.0]
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p, n in itertools.product(pos, neg)
    )
    want = round(wins / (len(pos) * len(neg)), 6)
    assert float(got["auc"]) == want
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)


def test_pr_curve_endpoints_and_monotone_recall(spark):
    from inception_spark.operators.classify import pr_curve

    rows = [(1.0, 0.9), (1.0, 0.8), (0.0, 0.8), (0.0, 0.2), (1.0, 0.1)]
    df = spark.createDataFrame(rows, "y double, prob double")
    pts = sorted(pr_curve(df).collect(), key=lambda r: -r["threshold"])
    # descending thresholds: recall non-decreasing, last point recall=1
    recalls = [r["recall"] for r in pts]
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0
    top = pts[0]
    assert (top["threshold"], top["tp"], top["fp"]) == (0.9, 1, 0)
    assert top["precision"] == 1.0


def test_calibration_bins_integer_ratios(spark):
    from inception_spark.operators.classify import calibration_bins

    rows = [(1.0, 0.95), (0.0, 0.91), (1.0, 0.12), (0.0, 0.18),
            (0.0, 0.15), (1.0, 1.0)]
    df = spark.createDataFrame(rows, "y double, prob double")
    out = {r["bin"]: r for r in calibration_bins(df).collect()}
    # prob=1.0 clamps into the top bin
    assert out[9]["n"] == 3 and out[9]["n_pos"] == 2
    assert out[1]["n"] == 3 and out[1]["n_pos"] == 1
    assert out[1]["frac_pos"] == round(1 / 3, 6)
    assert out[1]["mean_prob"] == 0.15


def test_best_f1_threshold_matches_brute_force(spark):
    from inception_spark.operators.classify import best_f1_threshold

    rows = [(1.0, 0.9), (1.0, 0.8), (0.0, 0.8), (0.0, 0.6),
            (1.0, 0.5), (0.0, 0.2), (1.0, 0.1)]
    df = spark.createDataFrame(rows, "y double, prob double")
    got = best_f1_threshold(df).collect()[0]

    best = None
    npos = sum(1 for y, _ in rows if y == 1.0)
    for t in sorted({s for _, s in rows}, reverse=True):
        tp = sum(1 for y, s in rows if s >= t and y == 1.0)
        fp = sum(1 for y, s in rows if s >= t and y == 0.0)
        p = round(tp / (tp + fp), 6)
        r = round(tp / npos, 6)
        f1 = round(2 * p * r / (p + r), 6) if p + r > 0 else 0.0
        if best is None or f1 > best[5] or (f1 == best[5] and t > best[0]):
            best = (t, tp, fp, p, r, f1)
    assert (got["threshold"], got["tp"], got["fp"], got["precision"],
            got["recall"], got["f1"]) == best
