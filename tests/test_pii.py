"""PII detection/redaction: Spark expressions == Python re == DuckDB twin.

The patterns live in the Java-regex ∩ RE2 subset, so all three engines
must agree on counts and redacted output for every crafted case.
"""

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from inception_spark.functions.pii import (
    PII_PATTERNS,
    PII_PLACEHOLDERS,
    pii_count,
    pii_count_sql,
    pii_redact,
    pii_redact_sql,
    pii_stats,
)

CASES = [
    ("plain", "no pii here at all", {}),
    ("email", "mail me at jo.doe+x@sub.ex.org today", {"email": 1}),
    ("two_emails", "a@b.co and c_d%e@f-g.io", {"email": 2}),
    ("phone_dash", "call 415-555-0199 now", {"phone": 1}),
    ("phone_dot", "fax 415.555.0199", {"phone": 1}),
    ("ssn", "ssn 219-09-9999 on file", {"ssn": 1}),
    ("card", "pay 4111-1111-1111-1111 or 4111 1111 1111 1111",
     {"card": 2}),
    ("ipv4", "host 10.0.255.7 and 192.168.0.1", {"ipv4": 2}),
    # a card must NOT double-count as ssn/phone (word-boundary anchoring)
    ("card_not_ssn", "4111-1111-1111-1111", {"card": 1}),
    # digits glued to words break \b anchoring on purpose
    ("glued", "x123-45-6789 not an ssn", {}),
    ("mixed", "u@ex.org, 415-555-0100, 219-09-1234, 10.0.0.1",
     {"email": 1, "phone": 1, "ssn": 1, "ipv4": 1}),
]


def _py_counts(text):
    return {cat: len(re.findall(pat, text)) for cat, pat in PII_PATTERNS.items()}


def _py_redact(text):
    for cat, pat in PII_PATTERNS.items():
        text = re.sub(pat, lambda _m, c=cat: PII_PLACEHOLDERS[c], text)
    return text


@pytest.mark.parametrize("name,text,expected", CASES)
def test_python_counts(name, text, expected):
    got = _py_counts(text)
    for cat in PII_PATTERNS:
        assert got[cat] == expected.get(cat, 0), (name, cat)


@pytest.mark.parametrize("name,text,expected", CASES)
def test_spark_matches_python(spark, name, text, expected):
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        *[pii_count(F.col("text"), cat).alias(cat) for cat in PII_PATTERNS],
        pii_redact(F.col("text")).alias("red"),
    ).collect()[0]
    for cat in PII_PATTERNS:
        assert row[cat] == expected.get(cat, 0), (name, cat)
    assert row["red"] == _py_redact(text), name


@pytest.mark.parametrize("name,text,expected", CASES)
def test_duckdb_matches_python(name, text, expected):
    con = duckdb.connect()
    sel = ", ".join(
        f"{pii_count_sql('?', cat)} AS c_{cat}" for cat in PII_PATTERNS
    )
    got = con.execute(
        f"SELECT {sel}, {pii_redact_sql('?')} AS red",
        [text] * (len(PII_PATTERNS) + 1),
    ).fetchone()
    for i, cat in enumerate(PII_PATTERNS):
        assert got[i] == expected.get(cat, 0), (name, cat)
    assert got[-1] == _py_redact(text), name


def test_pii_stats_frame(spark):
    df = spark.createDataFrame(
        [(1, "u@ex.org and 10.0.0.1"), (2, "clean text")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_stats(df).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["n_ipv4"] == 1
    assert rows[1]["n_pii"] == 2 and rows[1]["has_pii"] is True
    assert rows[1]["redacted"] == "[EMAIL] and [IP]"
    assert rows[2]["n_pii"] == 0 and rows[2]["has_pii"] is False
    assert rows[2]["redacted"] == "clean text"


def test_no_python_udf_in_plan(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = pii_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
