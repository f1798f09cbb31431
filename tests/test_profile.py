"""Column profiler: exactness, null handling, one-pass plan, knob."""

import duckdb

from inception_spark.operators.profile import (
    profile_table,
    profile_table_sql,
)


def test_profile_nulls_and_values(spark):
    rows = [
        (1, 10.0, "aa"),
        (2, None, "bbbb"),
        (3, 10.0, None),
        (4, -2.5, "aa"),
    ]
    df = spark.createDataFrame(rows, "id long, v double, s string")
    got = {
        r["column"]: r
        for r in profile_table(
            df, numeric_cols=["id", "v"], string_cols=["s"]
        ).collect()
    }
    assert got["id"]["n_rows"] == 4 and got["id"]["n_nulls"] == 0
    assert got["id"]["n_distinct"] == 4
    assert (got["id"]["min_d"], got["id"]["max_d"]) == (1.0, 4.0)
    assert got["v"]["n_nulls"] == 1 and got["v"]["n_distinct"] == 2
    assert got["v"]["min_d"] == -2.5
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert (got["s"]["min_s"], got["s"]["max_s"]) == ("aa", "bbbb")
    # avg over NON-NULL strings: (2+4+2)/3
    assert got["s"]["avg_len"] == round(8 / 3, 6)


def test_profile_engine_parity_orders(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    num = ["o_orderkey", "o_custkey", "o_totalprice"]
    st = ["o_orderstatus", "o_orderpriority"]
    got = sorted(
        tuple(r)
        for r in profile_table(
            orders, numeric_cols=num, string_cols=st
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/orders.parquet')"
    )
    ora = sorted(
        tuple(r)
        for r in con.execute(
            profile_table_sql("orders", numeric_cols=num, string_cols=st)
        ).fetchall()
    )
    assert got == ora


def test_profile_one_pass_and_approx_knob(spark):
    import pytest

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    out = profile_table(
        orders, numeric_cols=["o_orderkey"], string_cols=["o_orderstatus"]
    )
    p = out._jdf.queryExecution().executedPlan().toString()
    # single scan: exactly one FileScan of the parquet
    assert p.count("FileScan") == 1
    # approx mode: same schema, plausible estimates, NO expand rewrite
    ap = profile_table(
        orders,
        numeric_cols=["o_orderkey"],
        string_cols=["o_orderstatus"],
        exact_ndv=False,
    )
    pa = ap._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in pa
    n = orders.count()
    got = {r["column"]: r["n_distinct"] for r in ap.collect()}
    assert abs(got["o_orderkey"] - n) / n < 0.1
    with pytest.raises(ValueError):
        profile_table(orders)


def test_fd_profile_planted_dependency(spark):
    """city -> country holds (each city in one country); country ->
    city fails (one country, two cities); id -> * all hold."""
    from inception_spark.operators.profile import fd_profile

    df = spark.createDataFrame(
        [(1, "paris", "fr"), (2, "lyon", "fr"), (3, "paris", "fr")],
        "id int, city string, country string",
    )
    got = {
        (r["determinant"], r["dependent"]): r
        for r in fd_profile(df, ["id", "city", "country"]).collect()
    }
    assert len(got) == 6
    assert got[("city", "country")]["fd_holds"] is True
    assert got[("country", "city")]["fd_holds"] is False
    assert got[("id", "city")]["fd_holds"] is True
    assert got[("city", "id")]["fd_holds"] is False
    assert got[("country", "city")]["ndv_det"] == 1
    assert got[("country", "city")]["ndv_pair"] == 2


def test_k_anonymity_report_planted_classes(spark):
    """Classes: (a,x) size 3 with 1 distinct sensitive value (k-ok but
    l=1 leak), (a,y) size 1 (violates k=2), (b,x) size 2 l=2."""
    from inception_spark.operators.profile import k_anonymity_report

    df = spark.createDataFrame(
        [
            ("a", "x", 10), ("a", "x", 10), ("a", "x", 10),
            ("a", "y", 7),
            ("b", "x", 1), ("b", "x", 2),
        ],
        "q1 string, q2 string, s int",
    )
    got = {r["class_size"]: r for r in
           k_anonymity_report(df, ["q1", "q2"], "s", k=2).collect()}
    assert got[1]["violates_k"] is True and got[1]["n_classes"] == 1
    assert got[2]["violates_k"] is False and got[2]["min_l"] == 2
    assert got[3]["min_l"] == 1          # the l-diversity leak
    assert sum(r["n_rows"] for r in got.values()) == 6


def test_equidepth_histogram_exact_depths(spark):
    """Bucket sizes differ by at most one, buckets partition the rank
    order (lo/hi non-overlapping in rank terms), and the per-group
    row totals reconstruct the input."""
    from inception_spark.operators.profile import equidepth_histogram

    rows = [("a", float(v), i) for i, v in enumerate(
        [5, 1, 9, 3, 7, 2, 8, 4, 6, 0, 10, 12])] + [
        ("b", float(i % 3), 100 + i) for i in range(7)]
    df = spark.createDataFrame(rows, "grp string, v double, id long")
    out = equidepth_histogram(
        df, "v", group_col="grp", tiebreak_col="id", k=4
    ).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    a = sorted(by_grp["a"], key=lambda r: r["bucket"])
    assert [r["bucket"] for r in a] == [0, 1, 2, 3]
    assert [r["n_rows"] for r in a] == [3, 3, 3, 3]
    # value ranges tile in order
    for i in range(3):
        assert a[i]["hi"] <= a[i + 1]["lo"]
    # group b: 7 rows into 4 buckets -> sizes 2,2,2,1 (ceil split)
    b = sorted(by_grp["b"], key=lambda r: r["bucket"])
    assert sum(r["n_rows"] for r in b) == 7
    assert max(r["n_rows"] for r in b) - min(r["n_rows"] for r in b) <= 1
    # duplicate values may straddle buckets: rank splits, values don't
    assert sum(r["n_distinct"] for r in b) >= 3
