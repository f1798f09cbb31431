"""BPE tokenizer training: Spark merges == reference Python BPE.

The Python twin below is the textbook Sennrich learner (word-frequency
dict, adjacent-pair counts, left-to-right non-overlapping merge), so the
test proves the delimiter-replace trick implements real BPE.
"""

import re

import pytest

from inception_spark.operators.bpe import (
    apply_bpe_merges,
    learn_bpe_merges,
    word_frequencies,
)


def _py_bpe(texts, n_merges):
    vocab = {}
    for t in texts:
        for w in re.split(r"\s+", t):
            if w and "|" not in w:
                vocab[w] = vocab.get(w, 0) + 1
    seqs = {w: list(w) for w in vocab}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + vocab[w]
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, a + b, cnt))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


CORPUS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
]


def test_learn_bpe_matches_reference_python(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in learn_bpe_merges(df, n_merges=8)
        .orderBy("merge_rank")
        .collect()
    ]
    exp, _ = _py_bpe(CORPUS, 8)
    assert got == exp


def test_learn_bpe_overlapping_pair_counts_and_single_pass_merge(spark):
    """'aaaa' counts (a,a) three times but one merge pass yields aa,aa."""
    df = spark.createDataFrame([("aaaa aaaa",)], "text string")
    merges = learn_bpe_merges(df, n_merges=2).orderBy("merge_rank").collect()
    assert (merges[0]["left"], merges[0]["right"]) == ("a", "a")
    assert merges[0]["pair_count"] == 6  # 3 adjacent positions x freq 2
    # second merge operates on (aa, aa)
    assert (merges[1]["left"], merges[1]["right"]) == ("aa", "aa")
    exp, _ = _py_bpe(["aaaa aaaa"], 2)
    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in merges
    ]
    assert got == exp


def test_apply_bpe_merges_tokenizes_like_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    learned = learn_bpe_merges(df, n_merges=6).orderBy("merge_rank").collect()
    pairs = [(r["left"], r["right"]) for r in learned]
    toks = apply_bpe_merges(
        spark.createDataFrame([("newest low",)], "text string"), pairs
    ).collect()
    got = [list(r["bpe_tokens"]) for r in toks]
    _, seqs = _py_bpe(CORPUS, 6)
    assert got == [seqs["newest"], seqs["low"]]


def test_apply_bpe_stays_jvm_side(spark):
    df = spark.createDataFrame([("low lower",)], "text string")
    out = apply_bpe_merges(df, [("l", "o"), ("lo", "w")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_word_frequencies_drops_pipe_words(spark):
    df = spark.createDataFrame([("a b|c a",)], "text string")
    rows = {r["w"]: r["freq"] for r in word_frequencies(df).collect()}
    assert rows == {"a": 2}
