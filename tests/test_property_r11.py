"""Property pins for the round-10 second-wave operators (VERDICT r10
ask 5).  The equidepth lesson: an engine and its SQL twin can agree on
a WRONG shared rule, so each pin here is checked against an
INDEPENDENT formulation — an iterative waterfill, a nested-loop join
recompute, a Python bigram fold, a numpy percentile — never against
the operator's own algebra.
"""

import datetime as dt
import itertools
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# unimax_allocation
# ---------------------------------------------------------------------------


def _waterfill_reference(tokens: list, budget: int, max_epochs: int):
    """Independent UniMax waterfilling: the textbook iterative loop
    (give the smallest remaining source min(fair share, capacity);
    recompute the share after each saturation) — NOT the operator's
    cross-multiplied prefix-sum compare."""
    caps = sorted(
        ((t * max_epochs, i) for i, t in enumerate(tokens))
    )
    alloc = [0] * len(tokens)
    remaining = budget
    left = len(caps)
    j = 0
    while j < len(caps):
        cap, i = caps[j]
        share = remaining // left
        if cap <= share:
            alloc[i] = cap
            remaining -= cap
            left -= 1
            j += 1
        else:
            # nobody else can saturate either (ascending): uniform floor
            for cap2, i2 in caps[j:]:
                alloc[i2] = share
            break
    return alloc


@settings(max_examples=12, deadline=None)
@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=10**7), min_size=1, max_size=9
    ),
    budget=st.integers(min_value=1, max_value=10**8),
    max_epochs=st.integers(min_value=1, max_value=6),
    seed=st.integers(min_value=0, max_value=9999),
)
def test_unimax_matches_iterative_waterfill(
    spark, sizes, budget, max_epochs, seed
):
    """For ANY source-size multiset: per-source allocations equal the
    independent iterative waterfill; no source exceeds its cap; the
    budget is exhausted to within the integer remainder (r < number of
    unsaturated sources — one more token each is impossible); the
    result is invariant under input row permutation."""
    from inception_spark.operators.sampling import unimax_from_source_tokens

    rows = [(f"s{i}", n) for i, n in enumerate(sizes)]
    rng = random.Random(seed)
    shuffled = rows[:]
    rng.shuffle(shuffled)

    def run(data):
        df = spark.createDataFrame(data, "source string, tokens long")
        return {
            r["source"]: (r["allocation"], r["capacity"], r["saturated"])
            for r in unimax_from_source_tokens(
                df, budget_tokens=budget, max_epochs=max_epochs
            ).collect()
        }

    got = run(rows)
    ref = _waterfill_reference(sizes, budget, max_epochs)
    for i, n in enumerate(sizes):
        a, cap, saturated = got[f"s{i}"]
        assert cap == n * max_epochs
        assert a == ref[i], (i, sizes, budget, max_epochs)
        assert 0 <= a <= cap                       # never above its cap
        assert saturated == (a == cap) or a == cap  # flag consistency
    total = sum(a for a, _, _ in got.values())
    n_unsat = sum(1 for a, cap, _ in got.values() if a < cap)
    assert total <= budget
    if n_unsat == 0:
        assert total == min(budget, sum(sizes) * max_epochs)
    else:
        # exhausted exactly up to the undistributable remainder
        assert budget - total < n_unsat
    # waterline uniqueness: permutation changes nothing
    assert run(shuffled) == got


# ---------------------------------------------------------------------------
# ivm_join_rollup
# ---------------------------------------------------------------------------


def _brute_join_rollup(a_rows, b_rows):
    """Nested-loop join + dict aggregate — independent of every delta
    term in the counting algorithm."""
    agg: dict = {}
    for ka, g in a_rows:
        for kb, v in b_rows:
            if ka == kb:
                s, n = agg.get(g, (0, 0))
                agg[g] = (s + v, n + 1)
    return agg


@settings(max_examples=6, deadline=None)
@given(seed=st.integers(min_value=0, max_value=99999))
def test_ivm_join_random_interleavings_equal_recompute(spark, seed):
    """Random insert/retract interleavings on BOTH sides of a
    maintained join view: after every round the maintained state must
    equal a from-scratch nested-loop recompute over the updated bases
    (retractions only of currently-present rows — the legal-history
    contract ivm_apply's negative-multiplicity guard enforces)."""
    from inception_spark.plans.ivm import ivm_apply, ivm_join_deltas

    rng = random.Random(seed)
    a_rows = [(rng.randint(0, 4), rng.choice("xyz")) for _ in range(5)]
    b_rows = [(rng.randint(0, 4), rng.randint(1, 100)) for _ in range(5)]

    def a_df(rows):
        return spark.createDataFrame(
            rows or [(None, None)], "k int, g string"
        ).filter("k IS NOT NULL")

    def b_df(rows):
        return spark.createDataFrame(
            rows or [(None, None)], "k int, v int"
        ).filter("k IS NOT NULL")

    # initial state from the snapshot
    init = _brute_join_rollup(a_rows, b_rows)
    state_rows = [(g, s, n) for g, (s, n) in init.items()]

    for _ in range(3):
        # build this round's deltas: inserts + retracts of present rows
        da = [(k, g, 1) for k, g in
              [(rng.randint(0, 4), rng.choice("xyz"))
               for _ in range(rng.randint(0, 3))]]
        db = [(k, v, 1) for k, v in
              [(rng.randint(0, 4), rng.randint(1, 100))
               for _ in range(rng.randint(0, 3))]]
        a_retract = rng.sample(a_rows, min(len(a_rows), rng.randint(0, 2)))
        b_retract = rng.sample(b_rows, min(len(b_rows), rng.randint(0, 2)))
        da += [(k, g, -1) for k, g in a_retract]
        db += [(k, v, -1) for k, v in b_retract]

        state = spark.createDataFrame(
            state_rows or [("_", 0, 0)],
            "g string, s long, n long",
        ).filter("n > 0")
        dv = ivm_join_deltas(
            a_df(a_rows),
            spark.createDataFrame(
                da or [(None, None, None)], "k int, g string, mult int"
            ).filter("k IS NOT NULL"),
            b_df(b_rows),
            spark.createDataFrame(
                db or [(None, None, None)], "k int, v int, mult int"
            ).filter("k IS NOT NULL"),
            on="k",
        )
        new_state = ivm_apply(state, dv, ["g"], "v")
        state_rows = [
            (r["g"], int(r["s"]), r["n"]) for r in new_state.collect()
        ]

        # update the python bases (bag semantics: remove one instance)
        for r in a_retract:
            a_rows.remove(r)
        for r in b_retract:
            b_rows.remove(r)
        a_rows += [(k, g) for k, g, m in da if m == 1]
        b_rows += [(k, v) for k, v, m in db if m == 1]

        want = {
            g: (s, n) for g, (s, n) in
            _brute_join_rollup(a_rows, b_rows).items() if n > 0
        }
        got = {g: (int(s), n) for g, s, n in state_rows}
        assert got == want, (seed, got, want)


# ---------------------------------------------------------------------------
# streaming_markov: the applyInPandasWithState fold
# ---------------------------------------------------------------------------


class _FakeState:
    """Minimal GroupState stand-in for driving the update callback."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def _fold_splits(seq, cuts):
    """Feed `seq` through make_transition_update as micro-batches split
    at `cuts`; return the emitted (from, to) list."""
    import pandas as pd

    from inception_spark.streaming.pipeline import make_transition_update

    update = make_transition_update()
    state = _FakeState()
    emitted = []
    bounds = [0] + list(cuts) + [len(seq)]
    pos = 0
    for lo, hi in zip(bounds, bounds[1:]):
        batch = seq[lo:hi]
        if not batch:
            continue
        pdf = pd.DataFrame(
            {
                "ts": range(pos, pos + len(batch)),
                "event_id": range(pos, pos + len(batch)),
                "event_type": batch,
            }
        )
        pos += len(batch)
        for out in update(("u",), iter([pdf]), state):
            emitted += list(zip(out["from_type"], out["to_type"]))
    return emitted


def test_markov_seam_transitions_all_splits_exhaustive():
    """EVERY composition of a 6-event sequence into micro-batches (32
    splits, including seam-straddling ones) emits exactly the bigram
    list of the full sequence — each transition once, none lost at a
    batch boundary, none duplicated from state."""
    seq = ["a", "b", "a", "c", "c", "b"]
    want = list(zip(seq, seq[1:]))
    n = len(seq)
    for r in range(n):
        for cuts in itertools.combinations(range(1, n), r):
            got = _fold_splits(seq, cuts)
            assert got == want, cuts


@settings(max_examples=40, deadline=None)
@given(
    seq=st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=30
    ),
    data=st.data(),
)
def test_markov_seam_transitions_random_splits(seq, data):
    """Hypothesis over longer sequences and random split sets."""
    cuts = sorted(
        data.draw(
            st.sets(
                st.integers(min_value=1, max_value=max(1, len(seq) - 1)),
                max_size=6,
            )
        )
    )
    assert _fold_splits(seq, cuts) == list(zip(seq, seq[1:]))


def test_markov_stationary_two_state_closed_form(spark):
    """Independent pin for the finalize: a 2-state chain with
    transition counts (a: 1->2 with p=3/4, 2: ->1 with p=1/2) has the
    CLOSED-FORM stationary distribution pi = (q, p)/(p+q) =
    (0.4, 0.6) — checked against pi_milli, not against the power
    iteration re-run; and pi_milli sums to 1000 within the documented
    floor-truncation slack (< 1 per state)."""
    from inception_spark.plans.relational import markov_finalize

    counts = spark.createDataFrame(
        [
            ("s1", "s1", 25),
            ("s1", "s2", 75),
            ("s2", "s1", 50),
            ("s2", "s2", 50),
        ],
        "from_type string, to_type string, c long",
    )
    out = {
        r["event_type"]: r["pi_milli"]
        for r in markov_finalize(counts, assume_merged=True).collect()
    }
    # closed form: pi1 = q/(p+q) = .5/1.25 = 0.4, pi2 = 0.6
    assert abs(out["s1"] - 400) <= 2
    assert abs(out["s2"] - 600) <= 2
    assert 1000 - len(out) <= out["s1"] + out["s2"] <= 1000


# ---------------------------------------------------------------------------
# funnel_latency
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(min_value=0, max_value=99999))
def test_funnel_latency_percentiles_match_numpy(spark, seed):
    """p50/p90/max over the converting users' latencies equal numpy's
    linear-interpolated percentiles over latencies brute-forced from
    the raw rows in Python — not the operator's own aggregate."""
    import numpy as np

    from inception_spark.plans.relational import (
        funnel_first_partials,
        funnel_latency_finalize,
    )

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    users = {}
    for u in range(rng.randint(3, 25)):
        times = {}
        for step in ("signup", "click", "purchase"):
            # some users skip steps; some do steps out of order
            if rng.random() < 0.8:
                t = base + dt.timedelta(seconds=rng.randint(0, 10000))
                times[step] = t
                # duplicate occurrences: only the FIRST counts
                for _ in range(rng.randint(1, 2)):
                    rows.append(
                        (u, step, t + dt.timedelta(
                            seconds=rng.randint(0, 100) * rng.randint(0, 1)
                        ))
                    )
        users[u] = times
    if not rows:
        return
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    got = {
        r["step_pair"]: r
        for r in funnel_latency_finalize(
            funnel_first_partials(ev)
        ).collect()
    }

    # brute force from the same raw rows
    first: dict = {}
    for u, step, t in rows:
        k = (u, step)
        if k not in first or t < first[k]:
            first[k] = t
    lat12, lat23 = [], []
    for u in users:
        t1 = first.get((u, "signup"))
        t2 = first.get((u, "click"))
        t3 = first.get((u, "purchase"))
        if t1 is not None and t2 is not None and t2 > t1:
            lat12.append((t2 - t1).total_seconds())
            if t3 is not None and t3 > t2:
                lat23.append((t3 - t2).total_seconds())

    for pair, lats in (("signup>click", lat12), ("click>purchase", lat23)):
        if not lats:
            assert pair not in got
            continue
        r = got[pair]
        assert r["n_converted"] == len(lats)
        assert r["p50_s"] == round(
            float(np.percentile(lats, 50, method="linear")), 6
        )
        assert r["p90_s"] == round(
            float(np.percentile(lats, 90, method="linear")), 6
        )
        assert r["max_s"] == round(max(lats), 6)


# ---------------------------------------------------------------------------
# rouge2_eval / rake_keywords vs independent Python replicas
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    data=st.data(),
    n_pairs=st.integers(min_value=1, max_value=6),
)
def test_rouge2_matches_counter_replica(spark, data, n_pairs):
    """Multiset bigram recall vs a collections.Counter replica — the
    min-of-counts rule is the easy thing to get wrong (distinct-set
    intersection overcounts repeats)."""
    from collections import Counter

    from inception_spark.functions.text_analysis import rouge2_eval

    alpha = ["a", "b", "c"]
    rows = []
    for i in range(n_pairs):
        cand = " ".join(
            data.draw(st.lists(st.sampled_from(alpha), min_size=0,
                               max_size=12))
        )
        ref = " ".join(
            data.draw(st.lists(st.sampled_from(alpha), min_size=0,
                               max_size=12))
        )
        rows.append((i, 100 + i, cand, ref))
    pairs = spark.createDataFrame(
        rows, "cand_id long, ref_id long, cand_text string, ref_text string"
    )
    got = {r["cand_id"]: r for r in rouge2_eval(pairs).collect()}

    def bigrams(s):
        w = s.split()
        return Counter(zip(w, w[1:]))

    for i, _rid, cand, ref in rows:
        cb, rb = bigrams(cand), bigrams(ref)
        ref_total = sum(rb.values())
        overlap = sum(min(c, rb[g]) for g, c in cb.items() if g in rb)
        if ref_total == 0:
            assert i not in got
            continue
        r = got[i]
        assert r["ref_bigrams"] == ref_total
        assert r["overlap_bigrams"] == overlap
        assert r["rouge2_recall_milli"] == (1000 * overlap) // ref_total


@settings(max_examples=8, deadline=None)
@given(data=st.data())
def test_rake_matches_python_replica(spark, data):
    """Full RAKE replica in plain Python (phrase splitting, degree /
    frequency, integer milli scores) over random small-alphabet docs —
    independent of the window/explode formulation."""
    from collections import defaultdict

    from inception_spark.functions.text_analysis import rake_keywords

    alpha = ["x", "y", "z", "s1", "s2"]
    stops = ["s1", "s2"]
    docs = []
    for i in range(data.draw(st.integers(min_value=1, max_value=5))):
        docs.append(
            (i, " ".join(data.draw(st.lists(st.sampled_from(alpha),
                                            min_size=0, max_size=15))))
        )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["phrase"]: (r["n_occurrences"], r["n_words"], r["score_milli"])
        for r in rake_keywords(df, stops, max_len=4, k=1000).collect()
    }

    # replica
    phrases = []
    for _i, text in docs:
        run = []
        for w in text.split():
            if w in stops:
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(w)
        if run:
            phrases.append(tuple(run))
    phrases = [p for p in phrases if 1 <= len(p) <= 4]
    freq: dict = defaultdict(int)
    degree: dict = defaultdict(int)
    for p in phrases:
        for w in p:
            freq[w] += 1
            degree[w] += len(p)
    wscore = {w: (1000 * degree[w]) // freq[w] for w in freq}
    want: dict = {}
    for p in phrases:
        key = " ".join(p)
        n_occ, n_words, _ = want.get(key, (0, len(p), 0))
        want[key] = (n_occ + 1, len(p), sum(wscore[w] for w in p))
    assert got == want, (got, want)
