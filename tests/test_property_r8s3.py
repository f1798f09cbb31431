"""Property-based checks (hypothesis) for the round-8 session-3
operators' core math, mirrored in pure Python so each example is
microseconds (the test_property_r7/r8 pattern):

* seasonal decomposition recomposes exactly for ANY series (integer
  identity by construction);
* the decayed-weight clamp agrees with unbounded rational decay
  everywhere (the weight IS 0 past the clamp), and weights are
  monotone in age;
* growth accounting's statuses partition the active set and the
  retention/churn flow balances day over day;
* Kaplan-Meier at-risk counts telescope (n_{t+1} = n_t - died_t -
  censored_t) under the duration-rollup construction;
* burst islands reproduce a brute-force run-merge for ANY flag set;
* link-prediction candidates from wedge enumeration equal brute-force
  distance-2 non-edges, and Jaccard's denominator never double-counts;
* SPRT's exact decimal LLR equals the per-observation sum.
"""

from fractions import Fraction

from hypothesis import given, settings, strategies as st


# --- seasonal decomposition identity ---------------------------------------

@given(st.lists(st.integers(0, 50), min_size=1, max_size=80))
@settings(max_examples=300, deadline=None)
def test_seasonal_decomp_recomposes_exactly(ns):
    """1000*n == trend + seasonal + residual for any hourly series,
    because residual is DEFINED as the exact remainder at each step."""
    trend = []
    for i in range(len(ns)):
        lo, hi = max(0, i - 12), min(len(ns), i + 13)
        w = ns[lo:hi]
        trend.append((1000 * sum(w)) // len(w))
    detr = [1000 * n - t for n, t in zip(ns, trend)]
    # seasonal by hour-of-day (period 24), trunc-toward-zero division
    seas = {}
    for hod in range(24):
        xs = [d for i, d in enumerate(detr) if i % 24 == hod]
        if xs:
            s = sum(xs)
            q = abs(s) // len(xs)
            seas[hod] = q if s >= 0 else -q
    for i, n in enumerate(ns):
        s = seas[i % 24]
        resid = detr[i] - s
        assert 1000 * n == trend[i] + s + resid


# --- decay weights -----------------------------------------------------------

def _w(age):
    return 0 if age > 19 else 1000000 >> age


@given(st.integers(0, 200))
@settings(max_examples=300, deadline=None)
def test_decay_clamp_is_exact_not_approximate(age):
    """The clamp changes nothing: floor(1e6 / 2^age) is already 0 for
    every age >= 20, so clamped == unbounded rational decay floored."""
    exact = int(Fraction(1000000, 2**age))
    assert _w(age) == exact


@given(st.integers(0, 199))
@settings(max_examples=200, deadline=None)
def test_decay_weights_monotone(age):
    assert _w(age) >= _w(age + 1)


# --- growth accounting -------------------------------------------------------

@given(st.dictionaries(
    st.integers(1, 8),                       # user
    st.sets(st.integers(1, 12), min_size=1),  # active days
    min_size=1, max_size=8,
))
@settings(max_examples=300, deadline=None)
def test_growth_statuses_partition_and_flow_balances(activity):
    days = sorted({d for ds in activity.values() for d in ds})
    max_day = days[-1]
    new = {d: 0 for d in range(1, max_day + 2)}
    ret = dict(new)
    res = dict(new)
    act = dict(new)
    churn = dict(new)
    for u, ds in activity.items():
        ds = sorted(ds)
        for i, d in enumerate(ds):
            act[d] += 1
            if i == 0:
                new[d] += 1
            elif ds[i - 1] == d - 1:
                ret[d] += 1
            else:
                res[d] += 1
            nxt = ds[i + 1] if i + 1 < len(ds) else None
            if (nxt is None or nxt > d + 1) and d + 1 <= max_day:
                churn[d + 1] += 1
    for d in range(1, max_day + 1):
        assert act[d] == new[d] + ret[d] + res[d]
        # flow balance: yesterday's actives either retain or churn today
        if d >= 2:
            assert act[d - 1] == ret[d] + churn[d]


# --- Kaplan-Meier at-risk telescope -----------------------------------------

@given(st.lists(
    st.tuples(st.integers(0, 10), st.booleans()),   # (duration, died)
    min_size=1, max_size=40,
))
@settings(max_examples=300, deadline=None)
def test_km_at_risk_telescopes(subjects):
    durs = sorted({d for d, _ in subjects})
    n_at_risk = {
        t: sum(1 for d, _ in subjects if d >= t) for t in durs
    }
    for a, b in zip(durs, durs[1:]):
        left_between = sum(
            1 for d, _ in subjects if a <= d < b
        )
        assert n_at_risk[b] == n_at_risk[a] - left_between
    assert n_at_risk[durs[0]] == len(
        [1 for d, _ in subjects if d >= durs[0]]
    )


# --- burst islands -----------------------------------------------------------

@given(st.sets(st.integers(0, 50)))
@settings(max_examples=300, deadline=None)
def test_islands_trick_equals_run_merge(flags):
    """hour_idx - rank(hour_idx) is constant exactly on maximal
    consecutive runs."""
    xs = sorted(flags)
    groups = {}
    for rank, x in enumerate(xs):
        groups.setdefault(x - rank, []).append(x)
    # brute force merge
    runs, cur = [], []
    for x in xs:
        if cur and x == cur[-1] + 1:
            cur.append(x)
        else:
            if cur:
                runs.append(cur)
            cur = [x]
    if cur:
        runs.append(cur)
    assert sorted(map(tuple, groups.values())) == sorted(
        map(tuple, runs)
    )


# --- link prediction candidates ----------------------------------------------

@given(st.sets(
    st.tuples(st.integers(1, 7), st.integers(1, 7)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1, max_size=12,
))
@settings(max_examples=300, deadline=None)
def test_wedge_candidates_are_distance2_nonedges(raw):
    edges = {(min(a, b), max(a, b)) for a, b in raw}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    # wedge enumeration at centers
    wedge_pairs = {}
    for w, nbrs in adj.items():
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                wedge_pairs.setdefault((ns[i], ns[j]), set()).add(w)
    cands = {p: ws for p, ws in wedge_pairs.items() if p not in edges}
    # brute force: non-adjacent pairs with a common neighbor
    nodes = sorted(adj)
    brute = {}
    for i in range(len(nodes)):
        for j in range(i + 1, len(nodes)):
            u, v = nodes[i], nodes[j]
            if (u, v) in edges:
                continue
            cn = adj[u] & adj[v]
            if cn:
                brute[(u, v)] = cn
    assert cands == brute
    for (u, v), cn in cands.items():
        union = len(adj[u] | adj[v])
        assert union == len(adj[u]) + len(adj[v]) - len(cn)


# --- SPRT exact LLR ----------------------------------------------------------

@given(st.lists(st.tuples(st.integers(1, 50), st.integers(0, 50)),
                min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_sprt_llr_is_exact_integer_decimal_sum(daily):
    """cum = sum over days of (conv*la + (n-conv)*lb) in 6-dp decimal
    units equals per-observation accumulation, independent of order."""
    import math

    daily = [(n, min(c, n)) for n, c in daily]
    la = round(math.log(0.05 / 0.04), 6)
    lb = round(math.log(0.95 / 0.96), 6)
    LA, LB = round(la * 10**6), round(lb * 10**6)
    per_day = [c * LA + (n - c) * LB for n, c in daily]
    per_obs = sum(
        LA if i < c else LB
        for n, c in daily for i in range(n)
    )
    assert sum(per_day) == per_obs


# --- KS vs brute force --------------------------------------------------------

@given(st.lists(st.tuples(st.integers(0, 9), st.booleans()),
                min_size=2, max_size=60).filter(
    lambda xs: any(e for _, e in xs) and any(not e for _, e in xs)
))
@settings(max_examples=300, deadline=None)
def test_ks_cross_multiplied_equals_bruteforce(obs):
    """max |c1*n2 - c2*n1| over the value spine == n1*n2 * classic KS
    over all real thresholds."""
    early = sorted(v for v, e in obs if e)
    late = sorted(v for v, e in obs if not e)
    n1, n2 = len(early), len(late)
    spine = sorted(set(early) | set(late))
    scaled = max(
        abs(sum(1 for v in early if v <= x) * n2
            - sum(1 for v in late if v <= x) * n1)
        for x in spine
    )
    ks = max(
        abs(sum(1 for v in early if v <= x) / n1
            - sum(1 for v in late if v <= x) / n2)
        for x in spine
    )
    assert scaled == round(ks * n1 * n2)


# --- Gini closed form vs mean-absolute-difference definition ------------------

@given(st.lists(st.integers(0, 10**6), min_size=2, max_size=40).filter(
    lambda xs: sum(xs) > 0
))
@settings(max_examples=300, deadline=None)
def test_gini_rank_form_equals_mad_definition(xs):
    """(2*sum(i*x_sorted) - (n+1)*sum(x)) / (n*sum(x)) equals the
    mean-absolute-difference Gini sum|xi-xj| / (2*n^2*mean)."""
    n, s = len(xs), sum(xs)
    srt = sorted(xs)
    rank_form = (
        2 * sum((i + 1) * x for i, x in enumerate(srt)) - (n + 1) * s
    ) / (n * s)
    mad = sum(abs(a - b) for a in xs for b in xs) / (2 * n * n * (s / n))
    assert abs(rank_form - mad) < 1e-9


# --- Markov iteration conserves order on symmetric chains ----------------------

@given(st.integers(2, 6), st.integers(1, 8))
@settings(max_examples=100, deadline=None)
def test_markov_uniform_chain_stays_uniform(k, iters):
    """A doubly-stochastic (uniform) chain keeps pi uniform under the
    integer iteration — every state gets exactly the same value, so
    pi_milli = 1000 // k for all."""
    NANO = 10**9
    c = {(i, j): 1 for i in range(k) for j in range(k)}
    row = {i: k for i in range(k)}
    pi = {i: NANO for i in range(k)}
    for _ in range(iters):
        new = {j: 0 for j in range(k)}
        for (i, j), cij in c.items():
            new[j] += (pi[i] * cij) // row[i]
        pi = new
    vals = set(pi.values())
    assert len(vals) == 1
    tot = sum(pi.values())
    assert all((1000 * v) // tot == 1000 // k for v in pi.values())


# --- attribution segments partition purchases ---------------------------------

@given(st.lists(st.sampled_from("pvcs"), min_size=1, max_size=30))
@settings(max_examples=300, deadline=None)
def test_attribution_covers_every_purchase_once(seq):
    """Each purchase lands in exactly one segment, and its first/last
    touch (or 'direct') is well-defined — total attributed == total
    purchases for both touch kinds."""
    segs = {}
    n_purch_before = 0
    for i, t in enumerate(seq):
        segs.setdefault(n_purch_before, []).append((i, t))
        if t == "p":
            n_purch_before += 1
    first_counts, last_counts = {}, {}
    n_purchases = 0
    for s, evs in segs.items():
        touches = [(i, t) for i, t in evs if t != "p"]
        purchases = [1 for _, t in evs if t == "p"]
        # the op's segment rule: a purchase at segment s sees only
        # touches in segment s (all precede it by construction)
        ft = touches[0][1] if touches else "direct"
        lt = touches[-1][1] if touches else "direct"
        for _ in purchases:
            n_purchases += 1
            first_counts[ft] = first_counts.get(ft, 0) + 1
            last_counts[lt] = last_counts.get(lt, 0) + 1
    assert sum(first_counts.values()) == n_purchases
    assert sum(last_counts.values()) == n_purchases


# --- seasonal-naive forecast slot lookback -------------------------------------

@given(st.integers(0, 23), st.integers(1, 72))
@settings(max_examples=300, deadline=None)
def test_forecast_slot_lookback_has_period_24(_mx_mod, h):
    """slot(h) = (24 - h%24) % 24 maps forecast hour L+h back to the
    hour exactly 24*ceil(h/24) before it — same hour of day."""
    slot = (24 - (h % 24)) % 24
    # _back = slot means source hour = L - slot; target = L + h
    assert (h + slot) % 24 == 0
