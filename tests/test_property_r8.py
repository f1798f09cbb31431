"""Property-based checks (hypothesis) for the round-8 session-2
operators' core math, mirrored in pure Python so each example is
microseconds (the test_property_r7 pattern):

* the giant-doc closed-form chunk arithmetic == a literal greedy fold
  for ANY uniform sentence cost / budget / overlap;
* blocklist n-gram construction finds exactly the naive phrase scan's
  occurrences;
* weighted-quantile integer inverse CDF == the expanded-multiset
  definition;
* the Pareto spine decomposition == brute-force dominance;
* window_funnel's greedy-earliest chaining completes iff ANY valid
  chain exists;
* every replica's multiplicative mixer is a permutation (exhaustive at
  a reduced modulus), and the distribution-matcher's bottleneck group
  always passes whole.
"""

from hypothesis import given, settings, strategies as st


# --- giant-doc closed form -------------------------------------------------

@given(
    st.integers(min_value=1, max_value=12),    # k: tokens per sentence
    st.integers(min_value=0, max_value=3),     # n_ov
    st.integers(min_value=1, max_value=120),   # N sentences
    st.integers(min_value=5, max_value=60),    # budget B (above L)
)
@settings(max_examples=300, deadline=None)
def test_uniform_sentence_fold_closed_form(k, n_ov, N, B):
    L = 2  # lead tokens
    if L + k > B or (n_ov + 1) * k + L > B:
        return  # (i)-branch / overlap-overflow regimes out of scope
    # literal greedy fold (mirrors split_text_into_chunks cases ii/iii)
    chunks, cur, cur_t = [], [], L
    for s in range(1, N + 1):
        if cur_t + k > B:
            ov = cur[-n_ov:] if n_ov else []
            chunks.append(cur)
            cur = ov + [s]
            cur_t = L + len(cur) * k
        else:
            cur.append(s)
            cur_t += k
    if cur:
        chunks.append(cur)
    # closed form
    m0 = (B - L) // k
    m1 = m0 - n_ov
    C = 1 if N <= m0 else 1 + -(-(N - m0) // m1)
    assert len(chunks) == C
    for c, ch in enumerate(chunks, 1):
        first = 1 if c == 1 else m0 + (c - 2) * m1 - (n_ov - 1)
        last = min(m0 + (c - 1) * m1, N)
        assert ch[0] == first and ch[-1] == last


# --- blocklist n-grams -----------------------------------------------------

words_st = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
)


@given(words_st, st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=3),
    min_size=1, max_size=4,
))
@settings(max_examples=300, deadline=None)
def test_ngram_match_survives_text_round_trip(doc, phrases):
    """Occurrence counts computed on the word list equal counts after
    the doc round-trips through rendered text with noisy punctuation
    and case — the normalization contract that makes blocklist_filter
    match "Fast MERGE!" against "fast merge"."""
    import re

    from inception_spark.functions.hashing import WORD_PATTERN

    text = ", ".join(w.upper() if i % 2 else w
                     for i, w in enumerate(doc)) + "!"
    rewords = re.findall(WORD_PATTERN, text.lower())
    assert rewords == doc  # the shared normalization is lossless here
    for ph in map(tuple, phrases):
        n = len(ph)
        direct = sum(
            1 for i in range(len(doc) - n + 1)
            if tuple(doc[i:i + n]) == ph
        )
        via_text = sum(
            1 for i in range(len(rewords) - n + 1)
            if tuple(rewords[i:i + n]) == ph
        )
        assert direct == via_text


# --- weighted quantiles ----------------------------------------------------

@given(st.lists(
    st.tuples(st.integers(0, 50), st.integers(1, 9)),
    min_size=1, max_size=20,
), st.sampled_from([25, 50, 90]))
@settings(max_examples=300, deadline=None)
def test_weighted_quantile_equals_expansion(vw, p):
    from collections import defaultdict

    agg = defaultdict(int)
    for v, w in vw:
        agg[v] += w
    tot = sum(agg.values())
    # integer inverse CDF (the operator's rule)
    cw = 0
    pick = None
    for v in sorted(agg):
        cw += agg[v]
        if pick is None and cw * 100 >= p * tot:
            pick = v
    # expanded-multiset definition: smallest value whose cumulative
    # share of the expanded list reaches p
    expanded = sorted(x for v, w in agg.items() for x in [v] * w)
    cum = 0
    ref = None
    for v in expanded:
        cum += 1
        if ref is None and cum * 100 >= p * tot:
            ref = v
    assert pick == ref


# --- pareto spine ----------------------------------------------------------

@given(st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)),
    min_size=1, max_size=15,
))
@settings(max_examples=300, deadline=None)
def test_pareto_spine_equals_brute_force(pts):
    spine = {}
    for x, y in pts:
        spine[x] = min(y, spine.get(x, y))
    frontier = set()
    best_above = None
    for x in sorted(spine, reverse=True):
        y = spine[x]
        if best_above is None or y < best_above:
            frontier.add((x, y))
        best_above = y if best_above is None else min(best_above, y)
    brute = {
        p for p in set(pts)
        if not any(
            q != p and q[0] >= p[0] and q[1] <= p[1] for q in set(pts)
        )
    }
    assert frontier == brute


# --- window funnel greedy optimality ---------------------------------------

@given(st.lists(
    st.tuples(st.integers(0, 30), st.sampled_from("AB")),
    min_size=0, max_size=10,
), st.integers(1, 10))
@settings(max_examples=300, deadline=None)
def test_greedy_earliest_funnel_is_complete(events, win):
    """2-step funnel A->B: the greedy-earliest chain completes iff ANY
    (anchor, follower) pair satisfies t_B > t_A and t_B - t_A <= win."""
    import itertools

    ev = sorted(set(events))
    a_times = [t for t, e in ev if e == "A"]
    b_times = [t for t, e in ev if e == "B"]
    any_chain = any(
        tb > ta and tb - ta <= win
        for ta, tb in itertools.product(a_times, b_times)
    )
    # greedy: per anchor, earliest qualifying B
    greedy = any(
        any(tb > ta and tb - ta <= win for tb in b_times)
        for ta in a_times
    )
    assert greedy == any_chain


# --- bootstrap mixers / distribution matcher -------------------------------

def test_replica_mixers_are_permutations_small_modulus():
    from inception_spark.operators.sampling import _replica_multipliers

    M = 1 << 10
    for b, mult in enumerate(_replica_multipliers(32)):
        imgs = {(h * mult) % M for h in range(M)}
        # odd multiplier -> bijection mod any power of two
        assert len(imgs) == M, f"replica {b} mixer not a permutation"


@given(st.dictionaries(
    st.sampled_from("abcd"), st.integers(1, 1000),
    min_size=2, max_size=4,
))
@settings(max_examples=300, deadline=None)
def test_bottleneck_group_always_passes_whole(counts):
    groups = sorted(counts)
    t = {g: 100 // len(groups) for g in groups}
    t[groups[0]] += 100 - sum(t.values())
    b = min(groups, key=lambda g: (counts[g] / t[g], g))
    # keep test for a row in the bottleneck group: h*tb*nb < tb*nb*2^28
    # reduces to h < 2^28 — always true
    tb, nb = t[b], counts[b]
    for h in (0, 1, (1 << 28) - 1):
        assert h * tb * nb < tb * nb * (1 << 28)
