"""Cross-engine parity tests for the deterministic hashing layer:
Spark expression == DuckDB SQL twin == Python, on real document text."""

import duckdb
import pytest
from pyspark.sql import functions as F

from inception_spark.functions import hashing as H

TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "the QUICK brown Fox jumps over the lazy dog again and again",
    "one two",          # fewer words than shingle size
    "",                 # empty
    "Spark 3 and DuckDB 1 both hash md5 identically, right?",
]


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def spark_vals(spark, col_expr, alias="v"):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    return [r[alias] for r in df.select(col_expr.alias(alias)).collect()]


def duck_vals(con, sql_expr):
    rows = con.execute(
        f"SELECT {sql_expr} AS v FROM (SELECT unnest(?) AS text)", [TEXTS]
    ).fetchall()
    return [r[0] for r in rows]


def test_h28_parity(spark, con):
    s = spark_vals(spark, H.h28(F.col("text")))
    d = duck_vals(con, H.h28_sql("text"))
    p = [H.h28_py(t) for t in TEXTS]
    assert s == d == p
    assert all(0 <= x < 2**28 for x in s)


def test_words_parity(spark, con):
    s = spark_vals(spark, H.words(F.col("text")))
    d = duck_vals(con, H.words_sql("text"))
    assert s == d


def test_shingles_parity_as_sets(spark, con):
    s = spark_vals(spark, H.shingles(F.col("text")))
    w = H.words_sql("text")
    d = con.execute(
        f"SELECT {H.shingles_cte_sql('w')} AS v "
        f"FROM (SELECT {w} AS w FROM (SELECT unnest(?) AS text))",
        [TEXTS],
    ).fetchall()
    for sv, (dv,) in zip(s, d):
        assert set(sv) == set(dv)   # order differs (list_distinct), set equal


def test_minhash_parity(spark, con):
    sig = H.minhash_signature(H.shingles(F.col("text")), k=8)
    s = spark_vals(spark, sig)
    w = H.words_sql("text")
    sh = H.shingles_cte_sql("w")
    d = con.execute(
        f"SELECT {H.minhash_signature_sql('sh', k=8)} AS v FROM "
        f"(SELECT {sh} AS sh FROM (SELECT {w} AS w FROM (SELECT unnest(?) AS text)))",
        [TEXTS],
    ).fetchall()
    assert s == [r[0] for r in d]
    # empty text → sentinel signature
    assert s[3] == [H.MERSENNE_P] * 8


def test_band_keys_parity(spark, con):
    sig = H.minhash_signature(H.shingles(F.col("text")), k=8)
    s = spark_vals(spark, H.band_keys(sig, bands=2, rows=4))
    w = H.words_sql("text")
    sh = H.shingles_cte_sql("w")
    sig_sql = H.minhash_signature_sql("sh", k=8)
    d = con.execute(
        f"SELECT {H.band_keys_sql('sig', 2, 4)} AS v FROM "
        f"(SELECT {sig_sql} AS sig FROM (SELECT {sh} AS sh FROM "
        f"(SELECT {w} AS w FROM (SELECT unnest(?) AS text))))",
        [TEXTS],
    ).fetchall()
    assert s == [r[0] for r in d]


def test_simhash_parity(spark, con):
    s = spark_vals(spark, H.simhash(H.words(F.col("text"))))
    d = duck_vals(con, H.simhash_sql(H.words_sql("text")))
    assert s == d
    assert all(0 <= x < 2**H.SIMHASH_BITS for x in s)
    # near-identical texts → small hamming distance; disjoint texts → large
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(s[0], s[1]) <= 10 * H.SIMHASH_BITS // 32
