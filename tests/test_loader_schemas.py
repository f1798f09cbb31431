"""Loaded-logical-schema contract for every driver-owned parquet table.

Round 3 lesson: the driver regenerated events.parquet with a different
physical timestamp encoding (TIMESTAMP(NANOS) → timestamp[us]) and the
loader, which assumed the frozen physical shape, broke 8 CORRECTNESS
rows, 25 tests, and the whole bench.  Loaders must assert-and-adapt on
read; these tests pin the LOGICAL schema each loader must deliver no
matter how the driver encodes the files, so the next physical-schema
drift fails loudly here before any driver run.
"""

import os

import pytest

from inception_spark.plans import relational as R

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: The logical contract every query in the repo programs against.
EXPECTED = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int"),
        ("n_name", "string"),
        ("n_regionkey", "int"),
    ],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp_ntz"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}

EXPECTED_EVENTS = [
    ("event_id", "bigint"),
    ("ts", "timestamp_ntz"),
    ("user_id", "bigint"),
    ("event_type", "string"),
    ("value", "double"),
    ("props", "string"),
]


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_loaded_schema(spark, table):
    assert R.load(spark, SF_DIR, table).dtypes == EXPECTED[table], (
        f"{table}: driver-side testdata regeneration changed the loaded "
        "logical schema — adapt the loader (or, if the change is "
        "intentional, this contract) before the driver run"
    )


def test_loaded_schema_events(spark):
    """load_events must deliver ts as timestamp_ntz whatever the physical
    encoding (plain timestamp[us] today; TIMESTAMP(NANOS) in rounds 1-2)."""
    assert R.load_events(spark, SF_DIR).dtypes == EXPECTED_EVENTS


def test_load_events_unrelated_failures_surface_as_themselves(spark, tmp_path):
    """A missing events file must raise the real path error immediately —
    NOT be retried under nanosAsLong and surface a confusing secondary
    error (ADVICE r4)."""
    import pytest

    from inception_spark.plans.relational import load_events

    # make sure a previous fallback didn't leave the flag set
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    with pytest.raises(Exception) as ei:
        load_events(spark, str(tmp_path / "nowhere"))
    msg = str(ei.value)
    assert "PATH_NOT_FOUND" in msg or "Path does not exist" in msg
    # and the fallback flag was NOT flipped on by the failed probe
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false"
