"""Mini-driver: replicates the harness's t2 correctness gate locally.

For every query in ``__spark_entry__.queries()`` that has an
``oracle_sql()`` entry, run the Spark DataFrame AND the DuckDB SQL on the
same parquet tables and compare row count, column names, and values
(order-insensitive, exact for non-floats, bit-tolerant-to-1e-9 for floats
— the real driver hashes, so we also report whether exact equality held).
"""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

# ---------------------------------------------------------------------------
# Default-vs-full sweep split (VERDICT r13 ask 4): the full 414-pair
# oracle sweep pushed the default suite past the driver's pytest budget
# (VERIFY_r13 truncated at ~65% of a 41-minute run with zero failures).
# The DEFAULT invocation sweeps the entries the round actually exposes —
# the current driver window + the staged next window + everything whose
# execution changed this round — and stays inside the budget; the full
# registry runs with SPARK_GRAFT_FULL_TESTS=1 (the end-of-round gate,
# alongside scripts/oracle_sweep.py which sweeps all 414 at sf0.001 in
# one local[32] session).
# ---------------------------------------------------------------------------
FULL_TESTS = os.environ.get("SPARK_GRAFT_FULL_TESTS") == "1"

#: entries whose executed plan changed in round 14 — always swept
TOUCHED_R14 = [
    "link_prediction",
    "link_prediction_eval",
    "streaming_blocklist_gate",
    "streaming_contamination_gate",
    "contamination_13gram",
    "blocklist_filter",
    "semantic_dedup",
    "docx_text_stats",
    "streaming_docx_text",
    "supplier_hits",
    "part_ppr",
]

_DEFAULT_SWEEP = sorted(
    (
        set(entry_mod._WINDOW_R14)
        | set(entry_mod._STAGED_R15)
        | set(TOUCHED_R14)
    )
    & set(ORACLES)
)
SWEEP = sorted(ORACLES) if FULL_TESTS else _DEFAULT_SWEEP


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by stringified values (order-insensitive
    compare), reset index."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        key = df.astype(str).agg("\x00".join, axis=1)
        df = df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)
    return df


def values_equal(a, b) -> tuple[bool, bool]:
    """(exact, approx) equality for scalars."""
    if a is None and b is None:
        return True, True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False, False
        if math.isnan(a) and math.isnan(b):
            return True, True
        exact = a == b
        approx = exact or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
        return exact, approx
    return a == b, a == b


def compare_frames(name, spark_pdf, duck_pdf):
    sa, da = canon(spark_pdf), canon(duck_pdf)
    assert list(sa.columns) == list(da.columns), (
        f"{name}: columns differ: {list(sa.columns)} vs {list(da.columns)}"
    )
    assert len(sa) == len(da), f"{name}: row count {len(sa)} vs {len(da)}"
    # The real driver hashes TYPED values: an integral Spark column matched
    # by a float oracle column (e.g. DuckDB SUM(int) -> HUGEINT -> float64)
    # hash-mismatches even when every value compares equal in Python
    # (5281 == 5281.0). Fail on numeric-kind drift, not just values.
    for col in sa.columns:
        s_int = pd.api.types.is_integer_dtype(sa[col])
        d_int = pd.api.types.is_integer_dtype(da[col])
        s_flt = pd.api.types.is_float_dtype(sa[col])
        d_flt = pd.api.types.is_float_dtype(da[col])
        assert not (s_int and d_flt) and not (s_flt and d_int), (
            f"{name}.{col}: numeric kind differs — spark {sa[col].dtype} vs "
            f"oracle {da[col].dtype} (driver hash would fail; a DuckDB "
            f"HUGEINT usually means a missing CAST(... AS BIGINT))"
        )
    n_exact_fail = 0
    first_approx_fail = None
    for col in sa.columns:
        for i, (x, y) in enumerate(zip(sa[col], da[col])):
            exact, approx = values_equal(x, y)
            if not approx and first_approx_fail is None:
                first_approx_fail = (col, i, x, y)
            if not exact:
                n_exact_fail += 1
    assert first_approx_fail is None, (
        f"{name}: value mismatch at {first_approx_fail}"
    )
    # the real driver hashes → exact equality is what actually matters
    assert n_exact_fail == 0, (
        f"{name}: {n_exact_fail} values equal only approximately "
        f"(driver hash would fail)"
    )


@pytest.mark.parametrize("name", SWEEP)
def test_query_matches_oracle(spark, con, name):
    assert name in QUERIES, f"oracle without query: {name}"
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    ddf = con.execute(ORACLES[name]).df()
    compare_frames(name, sdf, ddf)


def test_oracle_coverage_is_complete():
    """Every oracle has a query regardless of which subset is swept —
    catches a renamed/dropped registry entry even in default mode."""
    missing = [n for n in ORACLES if n not in QUERIES]
    assert not missing, f"oracles without queries: {missing}"


def test_all_queries_run(spark):
    """Queries without oracles (UDF-based) still must run with stable
    schemas and ≥0 rows."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_DIR)
        assert len(df.columns) > 0
        assert df.count() >= 0, name


def test_dtype_drift_caught(con):
    """Regression for the round-5 q12_late_priority / dq_check reds: an
    uncast DuckDB SUM(CASE...) returns HUGEINT (float64 in pandas) while
    Spark returns int64 — values equal, driver hash differs.  The
    mini-driver must fail that pairing."""
    duck = con.execute(
        "SELECT SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS n "
        "FROM orders"
    ).df()
    assert str(duck["n"].dtype) == "float64"  # HUGEINT surfaces as float64
    spark_like = pd.DataFrame({"n": duck["n"].astype("int64")})
    with pytest.raises(AssertionError, match="numeric kind differs"):
        compare_frames("hugeint_regression", spark_like, duck)
    # and the cast form passes
    cast = con.execute(
        "SELECT CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n FROM orders"
    ).df()
    compare_frames("hugeint_regression_cast", spark_like, cast)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) >= {"doc_id", "chunk_number", "chunk", "embedding"}


# ---------------------------------------------------------------------------
# sf0.01 signal for zero-driver-signal entries (VERDICT r11 ask 6).
#
# The driver's correctness gate runs at sf0.01, but this mini-driver
# sweeps at sf0.001 — so entries born after a round's window is pinned
# used to get their first t2-SCALE oracle signal two rounds later.  The
# NEWBORN sweep closes that: every entry still waiting for its first
# driver window (the staged r15 head + anything added this round) is
# oracle-compared at sf0.01 on every pytest run.  The FULL registry at
# sf0.01 runs under `-m sf001` (explicitly requested; ~the judge's
# sweep cost) so default CI cadence stays fast.
# ---------------------------------------------------------------------------

SF001_DIR = "/root/testdata/sf0.01"
NEWBORN = [
    n
    for n in (entry_mod._STAGED_R15 if hasattr(entry_mod, "_STAGED_R15")
              else [])
    if n in ORACLES
]


@pytest.fixture(scope="module")
def con01():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF001_DIR}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", NEWBORN)
def test_newborn_matches_oracle_sf001(spark, con01, name):
    """Driver-scale (sf0.01) oracle check for entries with zero driver
    signal — they get t2-scale green the round they are born."""
    sdf = QUERIES[name](spark, SF001_DIR).toPandas()
    ddf = con01.execute(ORACLES[name]).df()
    compare_frames(name, sdf, ddf)


@pytest.mark.sf001
@pytest.mark.parametrize("name", sorted(ORACLES))
def test_full_registry_sf001(spark, con01, name):
    """The judge-style full sweep at sf0.01 — run explicitly with
    `pytest -m sf001 tests/test_entry.py` (skipped by default via the
    marker filter in pyproject)."""
    sdf = QUERIES[name](spark, SF001_DIR).toPandas()
    ddf = con01.execute(ORACLES[name]).df()
    compare_frames(name, sdf, ddf)
