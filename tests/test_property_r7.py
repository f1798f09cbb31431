"""Property-based checks (hypothesis) for the late round-7 operators'
core math, mirrored in pure Python so each example is microseconds:

* prefix-filter losslessness — the pigeonhole argument behind
  jaccard_prefix_pairs: any pair with J >= t must share a token in
  BOTH prefixes under the rarest-first global order;
* the CUSUM closed form == the literal recursion for arbitrary
  integer series;
* SCD2 gaps-and-islands == a direct run-length scan.
"""

from hypothesis import given, settings, strategies as st


# --- prefix filter ---------------------------------------------------------

corpora = st.lists(
    st.sets(st.integers(min_value=0, max_value=30), min_size=1, max_size=15),
    min_size=2,
    max_size=12,
)


@given(corpora, st.integers(min_value=1, max_value=4))
@settings(max_examples=300, deadline=None)
def test_prefix_filter_is_lossless(sets, num):
    den = 5
    # global rarest-first order: (document frequency, token)
    from collections import Counter

    df = Counter()
    for s in sets:
        df.update(s)
    order = {t: (df[t], t) for t in df}

    def prefix(s):
        n = len(s)
        p = n - -(-n * num // den) + 1  # n - ceil(t*n) + 1
        return set(sorted(s, key=lambda t: order[t])[:p])

    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            inter, union = len(a & b), len(a | b)
            if inter * den >= union * num:
                assert prefix(a) & prefix(b), (
                    f"J={inter}/{union} pair lost by prefixes "
                    f"{prefix(a)} / {prefix(b)}"
                )


# --- CUSUM closed form -----------------------------------------------------


@given(st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60))
@settings(max_examples=300, deadline=None)
def test_cusum_closed_form(xs):
    # recursion
    s, rec = 0, []
    for x in xs:
        s = max(0, s + x)
        rec.append(s)
    # closed form: C_t - min(0, min_{tau<=t} C_tau)
    c, cmin, closed = 0, 0, []
    for x in xs:
        c += x
        cmin = min(cmin, c)
        closed.append(c - min(cmin, 0))
    assert closed == rec


# --- SCD2 islands ----------------------------------------------------------


@given(st.lists(st.sampled_from("abc"), min_size=1, max_size=40))
@settings(max_examples=300, deadline=None)
def test_scd2_island_count(attrs):
    # the two-window flag/cumsum island id must count exactly the runs
    flags = [
        1 if i == 0 or attrs[i] != attrs[i - 1] else 0
        for i in range(len(attrs))
    ]
    islands = []
    isl = 0
    for i, f in enumerate(flags):
        isl += f
        islands.append(isl)
    # run-length encode directly
    runs = 1 + sum(
        1 for i in range(1, len(attrs)) if attrs[i] != attrs[i - 1]
    )
    assert islands[-1] == runs
    # island ids are non-decreasing and partition the sequence into
    # constant-attr segments
    seen = {}
    for a, i in zip(attrs, islands):
        seen.setdefault(i, a)
        assert seen[i] == a
