"""PageRank: integer-arithmetic determinism against a Python reference
simulation and the DuckDB unrolled-CTE twin."""

import duckdb

from inception_spark.operators.graph import PICO, pagerank, pagerank_sql

EDGES = [
    # a tiny web: hub (1) pointed at by everyone, chain 2->3->4, 4->1
    (2, 1), (3, 1), (4, 1), (2, 3), (3, 4), (4, 2),
]


def _py_pagerank(edges, n_iter):
    nodes = sorted({u for e in edges for u in e})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {v: PICO for v in nodes}
    for _ in range(n_iter):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += rank[u] // deg[u]
        rank = {v: 15 * PICO // 100 + (85 * s[v]) // 100 for v in nodes}
    return rank


def test_pagerank_matches_python_simulation(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank_i"] for r in pagerank(df, n_iter=4).collect()}
    assert got == _py_pagerank(EDGES, 4)
    # the hub outranks the chain nodes
    assert got[1] == max(got.values())


def test_pagerank_duckdb_parity(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got_s = sorted(
        (r["node"], r["rank_i"], r["rank"])
        for r in pagerank(df, n_iter=3).collect()
    )
    vals = ", ".join(f"({s}, {d})" for s, d in EDGES)
    sql = pagerank_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", n_iter=3
    )
    got_o = sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got_s == got_o


def test_pagerank_mass_conserved_on_symmetric_graph(spark):
    # undirected (both directions): no dangling nodes, so total mass
    # stays within integer-truncation slack of n (per-page convention)
    sym = EDGES + [(v, u) for u, v in EDGES]
    df = spark.createDataFrame(sym, "src long, dst long")
    got = pagerank(df, n_iter=5).collect()
    total = sum(r["rank_i"] for r in got)
    assert abs(total - PICO * len(got)) < 100 * len(got)


def test_pagerank_partitioning_independent(spark):
    """The integer-arithmetic claim, tested: changing the shuffle width
    cannot change a single rank bit (no float sum exists to reorder)."""
    sym = EDGES + [(v, u) for u, v in EDGES]
    df = spark.createDataFrame(sym, "src long, dst long")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = sorted((r["node"], r["rank_i"])
                   for r in pagerank(df, n_iter=4).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = sorted((r["node"], r["rank_i"])
                   for r in pagerank(df.repartition(5), n_iter=4).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_triangle_count_known_graph(spark):
    """K4 plus a pendant: C(4,3)=4 triangles; wedges and coefficient by
    hand.  Input arrives duplicated and in mixed orientation to prove
    canonicalization."""
    from inception_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    edges = k4 + [(b, a) for a, b in k4] + [("d", "e"), ("a", "b")]
    df = spark.createDataFrame(edges, "src string, dst string")
    [row] = triangle_count(df).collect()
    # degrees: a,b,c=3, d=4, e=1 -> wedges = 3*3 + 6 + 0 = 15
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"],
            row["n_wedges"]) == (5, 7, 4, 15)
    assert row["clustering_coeff"] == 0.8


def test_triangle_count_triangle_free(spark):
    from inception_spark.operators.graph import triangle_count

    # a star is triangle-free but wedge-rich
    df = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(5)], "src string, dst string"
    )
    [row] = triangle_count(df).collect()
    assert row["n_triangles"] == 0 and row["n_wedges"] == 10
    assert row["clustering_coeff"] == 0.0


def test_kcore_peels_chain_keeps_clique(spark):
    """K4 with a pendant path: 3-core keeps exactly the clique; the
    path (and the node it attaches through... which IS in K4) peels."""
    from inception_spark.operators.graph import kcore

    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4), (1, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.node, r.deg) for r in kcore(df, k=3, n_iter=4).collect()}
    assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}


def test_kcore_cascading_removal_needs_iterations(spark):
    """A long chain into a triangle: each round peels ONE chain node, so
    convergence takes as many rounds as the chain is long — with k=2 the
    triangle alone survives."""
    from inception_spark.operators.graph import kcore

    chain = [(i, i + 1) for i in range(10, 15)]  # 10-11-...-15
    tri = [(15, 16), (16, 17), (15, 17)]
    df = spark.createDataFrame(chain + tri, "src long, dst long")
    got = {r.node for r in kcore(df, k=2, n_iter=8).collect()}
    assert got == {15, 16, 17}


def test_kcore_empty_result(spark):
    from inception_spark.operators.graph import kcore

    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = kcore(df, k=3, n_iter=3)
    assert out.count() == 0 and out.columns == ["node", "deg"]


def test_kcore_fixpoint_early_exit(spark, monkeypatch):
    """Peeling stops at the edge-count fixpoint: a clique is already its
    own k-core, so round 1 removes nothing and rounds 2..n_iter must not
    run.  Counted via the per-round DataFrame.count() the loop issues
    (1 initial + 1 round), and the early-exit result must equal the full
    unroll bit-for-bit."""
    from inception_spark.operators.graph import kcore

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    df = spark.createDataFrame(k4, "src long, dst long")

    # patch the CONCRETE DataFrame class (Spark 4 classic subclass
    # overrides count, so patching pyspark.sql.DataFrame misses it)
    cls = type(df)
    calls = []
    orig_count = cls.count

    def counting(self):
        calls.append(1)
        return orig_count(self)

    monkeypatch.setattr(cls, "count", counting)
    got = {(r.node, r.deg) for r in kcore(df, k=3, n_iter=8).collect()}
    monkeypatch.setattr(cls, "count", orig_count)

    assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}
    # initial count + round-1 count (unchanged -> break); NOT 1 + 8
    assert len(calls) == 2

    # a graph that peels to empty exercises the n == 0 break the same way
    chain = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert kcore(chain, k=2, n_iter=8).count() == 0


def test_local_clustering_known_graph(spark):
    """Triangle {1,2,3} + pendant 4-1: lcc(1)=2*1/(3*2)=1/3,
    lcc(2)=lcc(3)=1.0, lcc(4) undefined (deg 1) -> NULL."""
    from inception_spark.operators.graph import local_clustering

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1), (1, 4)],  # dup orientation too
        "src int, dst int",
    )
    got = {r["node"]: r for r in local_clustering(edges).collect()}
    assert got[1]["deg"] == 3 and got[1]["n_triangles"] == 1
    assert abs(got[1]["lcc"] - 0.333333) < 1e-9
    assert got[2]["lcc"] == 1.0 and got[3]["lcc"] == 1.0
    assert got[4]["deg"] == 1 and got[4]["lcc"] is None


def test_link_prediction_square_graph(spark):
    """4-cycle 1-2-3-4: the two diagonals (1,3) and (2,4) each have 2
    common neighbors, no existing edge, jaccard 2/(2+2-2)=1.0,
    adamic_adar = 2/ln(2); existing edges never appear."""
    import math

    from inception_spark.operators.graph import link_prediction

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src int, dst int"
    )
    out = link_prediction(edges, min_common=2, k=10).collect()
    pairs = {(r["u"], r["v"]): r for r in out}
    assert set(pairs) == {(1, 3), (2, 4)}
    r = pairs[(1, 3)]
    assert r["n_common"] == 2 and r["jaccard"] == 1.0
    assert abs(r["adamic_adar"] - 2 * round(1 / math.log(2), 6)) < 1e-9


def test_link_prediction_micro_unit_aggregate(spark):
    """The Adamic–Adar sum aggregates LONG micro-units (k where
    round(1/ln d, 6) = k/10⁶), not DECIMAL(28,6) — past Spark's
    compact-long decimal range every wedge row allocated a BigDecimal,
    which was most of the dense-graph eval's aggregate.  Pins: (a) the
    recovered double is exactly the decimal-sum semantics on a star
    graph whose 36 leaf pairs each carry one round(1/ln 9, 6) term;
    (b) no decimal(28,6) appears anywhere in the executed plan; (c)
    the degree joins sit ABOVE the top-k limit (du/dv feed only
    jaccard, so joining them onto the ≤ k survivors — not the full
    candidate table — is result-identical)."""
    import math

    from inception_spark.operators.graph import link_prediction

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 10)], "src int, dst int"
    )
    df = link_prediction(edges, min_common=1, k=100)
    out = df.collect()
    aa = round(1 / math.log(9), 6)
    assert len(out) == 36  # C(9,2) leaf pairs through the deg-9 center
    for r in out:
        assert r["n_common"] == 1
        assert r["adamic_adar"] == aa
        assert r["jaccard"] == 1.0  # du=dv=1, 1/(1+1-1)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "decimal(28,6)" not in p
    assert "_aa_u" in p  # the micro-unit column feeds the aggregate


def test_link_prediction_hub_cap(spark):
    """Hub cap semantics: (a) on a cap-free graph the default capped
    path is IDENTICAL to uncapped; (b) a small cap drops exactly the
    hub's wedges and the Observation reports the exact dropped mass
    Σ deg(deg−1)/2; (c) the SQL twin mirrors the cap (same param)."""
    from pyspark.sql import Observation

    from inception_spark.operators.graph import (
        link_prediction,
        link_prediction_sql,
    )

    # star hub 0 -> 1..5 (deg 5), plus a 4-cycle 10-11-12-13 (degs 2)
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)]
        + [(10, 11), (11, 12), (12, 13), (13, 10)],
        "src int, dst int",
    )
    base = sorted(
        tuple(r)
        for r in link_prediction(
            edges, min_common=2, k=50, max_center_degree=None
        ).collect()
    )
    capped_free = sorted(
        tuple(r)
        for r in link_prediction(edges, min_common=2, k=50).collect()
    )
    assert base == capped_free  # default cap is a no-op below ceiling
    # cap=4 removes center 0 (deg 5): its C(5,2)=10 wedges vanish, so
    # only the cycle diagonals (10,12),(11,13) survive
    obs = Observation("lp_cap")
    tight = link_prediction(
        edges, min_common=2, k=50, max_center_degree=4, observation=obs
    )
    got = {(r["u"], r["v"]) for r in tight.collect()}
    assert got == {(10, 12), (11, 13)}
    assert obs.get["centers_dropped_rows"] == 5  # hub's adjacency rows
    assert obs.get["wedges_dropped"] == 10.0     # 5*4/2, exact
    assert "deg <= 4" in link_prediction_sql("SELECT 1", max_center_degree=4)
    assert "WHERE d.deg" not in link_prediction_sql(
        "SELECT 1", max_center_degree=None
    )


def test_link_prediction_plan_takeordered(spark):
    """The global top-k must plan TakeOrdered, never a one-partition
    row_number sort over the full candidate table — and since r14, no
    per-u row_number prune either (it cost a full exchange + two
    in-partition sorts of the candidate table to save work TakeOrdered
    never does)."""
    from inception_spark.operators.graph import link_prediction

    edges = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13), (13, 10)], "src int, dst int"
    )
    out = link_prediction(edges, min_common=2, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan
    assert "WindowGroupLimit" not in plan


def test_link_prediction_packed_key_paths(spark):
    """The wedge-aggregate group key packs (u, v) into ONE long when a
    runtime bounds check proves every node id fits unsigned 31 bits —
    and falls back to the two-column key otherwise, result-identically.
    Pins: (a) small ids plan the packed key (shiftleft) and the
    existing-edge anti-join keys on the aggregate's own packed key; (b)
    the SAME graph shifted past 2³¹ takes the fallback (no shiftleft)
    and produces the identical scores/ranks modulo the id offset."""
    from inception_spark.operators.graph import link_prediction

    cyc = [(1, 2), (2, 3), (3, 4), (4, 1)]
    big = 1 << 31
    small = spark.createDataFrame(cyc, "src long, dst long")
    shifted = spark.createDataFrame(
        [(a + big, b + big) for a, b in cyc], "src long, dst long"
    )
    out_s = link_prediction(small, min_common=2, k=10)
    out_b = link_prediction(shifted, min_common=2, k=10)
    plan_s = out_s._jdf.queryExecution().executedPlan().toString()
    plan_b = out_b._jdf.queryExecution().executedPlan().toString()
    assert "shiftleft" in plan_s, "31-bit ids must take the packed path"
    assert "shiftleft" not in plan_b, "ids >= 2^31 must take the fallback"
    rows_s = sorted(tuple(r) for r in out_s.collect())
    rows_b = sorted(
        (r["u"] - big, r["v"] - big, r["n_common"], r["jaccard"],
         r["adamic_adar"], r["rank"])
        for r in out_b.collect()
    )
    assert rows_s == rows_b and len(rows_s) == 2


def test_hits_star_graph(spark):
    """Directed star: hubs 1,2,3 all point to authority 9; hub 1 also
    points to a second authority 8.  Node 1 sees both authorities ->
    top hub (normalized to 1.0); 9 has in-degree 3 -> top authority;
    pure hubs have auth 0 (guarded normalize, no division by zero)."""
    from inception_spark.operators.graph import HITS_MICRO, hits

    edges = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9), (1, 8)], "src int, dst int"
    )
    got = {r["node"]: r for r in hits(edges, n_iter=3).collect()}
    assert got[1]["hub_i"] == HITS_MICRO          # max hub
    assert got[9]["auth_i"] == HITS_MICRO         # max authority
    assert got[2]["hub_i"] == got[3]["hub_i"] < HITS_MICRO
    assert got[8]["auth_i"] < HITS_MICRO
    for n in (1, 2, 3):
        assert got[n]["auth_i"] == 0              # no in-edges
    for n in (8, 9):
        assert got[n]["hub_i"] == 0               # no out-edges


def test_lpa_communities_two_cliques(spark):
    """Two triangles joined by one bridge edge: after 3 synchronous
    min-tie-break rounds each triangle converges to its smallest member
    id; both orientations of a duplicated edge must not double votes."""
    from inception_spark.operators.graph import lpa_communities

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 1),        # clique A (+ dup rev)
         (10, 11), (11, 12), (12, 10),          # clique B
         (3, 10)],                              # bridge
        "src int, dst int",
    )
    got = {r["node"]: r["community"]
           for r in lpa_communities(edges, n_iter=3).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == got[12]
    assert got[10] != got[1]


def test_personalized_pagerank_proximity(spark):
    """Chain 1-2-3-4-5 with restart at {1}: mass concentrates NEAR the
    source — monotone decay from the source's neighbor outward, and the
    source dominates everything at distance ≥ 2 (the deg-1 source's
    direct neighbor may legitimately exceed it: it receives the
    source's whole outflow).  A restart at {5} mirrors the ranks
    EXACTLY on the symmetric chain — proximity, not global
    centrality."""
    from inception_spark.operators.graph import personalized_pagerank

    chain = [(i, i + 1) for i in range(1, 5)]
    und = chain + [(b, a) for a, b in chain]
    df = spark.createDataFrame(und, "src long, dst long")
    # n_iter=20: the chain is bipartite-ish, so short iteration
    # counts show parity oscillation (even-distance nodes refreshed on
    # even rounds); 20 rounds is past mixing for ordering asserts
    r1 = {r["node"]: r["rank_i"]
          for r in personalized_pagerank(df, [1], n_iter=20).collect()}
    assert r1[2] > r1[3] > r1[4] > r1[5]
    assert r1[1] > r1[3]
    r5 = {r["node"]: r["rank_i"]
          for r in personalized_pagerank(df, [5], n_iter=20).collect()}
    # symmetric graph + mirrored source => mirrored ranks exactly
    assert [r1[i] for i in range(1, 6)] == [r5[6 - i] for i in range(1, 6)]
