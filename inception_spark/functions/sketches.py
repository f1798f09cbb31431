"""Deterministic cross-engine sketches.

Spark's ``approx_count_distinct`` and DuckDB's ``approx_count_distinct``
use different HLL implementations (different hashes, register layouts),
so their estimates can never hash-match.  This module implements
HyperLogLog from first principles on the repo's shared md5 hash
primitive (``hashing.h28``), with integer-only register ranks and exact
binary-fraction harmonic sums — so the SAME estimate comes out of Spark,
DuckDB, and Python, bit for bit.

Scale shape: one hash per value, one groupBy on ≤2^P register ids with
map-side partial ``max`` — the shuffle carries at most m=2^P rows per
partition regardless of input size.  This is the sketch pattern for
100 TB NDV questions (how many distinct users/urls/shingles) where exact
``count(distinct)`` would shuffle every distinct value.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from inception_spark.functions.hashing import h28, h28_sql

#: register-index bits: m = 2^P registers; h28 leaves 28-P bits of rank
#: material.  P=8 → standard error 1.04/√256 ≈ 6.5%.
HLL_P = 8
HLL_M = 1 << HLL_P
_RANK_BITS = 28 - HLL_P          # 20
#: alpha_m for m ≥ 128 (Flajolet et al. 2007)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_register(col: Column) -> Column:
    """Register index: top P bits of the 28-bit hash."""
    return F.shiftright(h28(col), _RANK_BITS)


def hll_rank(col: Column) -> Column:
    """Rank = leading zeros of the low 20 bits + 1, via an integer
    comparison chain (NO floating log2 — exact at power-of-two
    boundaries in every engine).  w = 0 → rank 21."""
    w = h28(col).bitwiseAND(F.lit((1 << _RANK_BITS) - 1))
    expr = F.lit(_RANK_BITS + 1)  # w == 0
    for bl in range(1, _RANK_BITS + 1):        # bit_length(w) == bl
        expr = F.when(
            w >= F.lit(1 << (bl - 1)), F.lit(_RANK_BITS - bl + 1)
        ).otherwise(expr)
    return expr


def hll_register_sql(expr: str) -> str:
    return f"(({h28_sql(expr)}) >> {_RANK_BITS})"


def hll_rank_sql(expr: str) -> str:
    w = f"(({h28_sql(expr)}) & {(1 << _RANK_BITS) - 1})"
    sql = str(_RANK_BITS + 1)
    for bl in range(1, _RANK_BITS + 1):
        sql = (
            f"CASE WHEN {w} >= {1 << (bl - 1)} "
            f"THEN {_RANK_BITS - bl + 1} ELSE {sql} END"
        )
    return f"({sql})"


def hll_ndv(df: DataFrame, col: str) -> DataFrame:
    """One-row NDV estimate of ``df[col]`` (nulls ignored):
    ``(estimate double, n_registers long)``.

    Registers: groupBy on the register id with a ``max(rank)`` partial
    aggregate; the harmonic sum folds 2^-rank terms — exact binary
    fractions, so the double sum is order-independent and engine-stable.
    Small-range (linear counting) correction applied exactly as in the
    HLL paper; estimate rounded to 4 dp."""
    # md5 needs a string; Spark's long→string and DuckDB's CAST AS
    # VARCHAR agree on integers (use only on int/string columns — double
    # reprs are not guaranteed to match across engines)
    src = df.select(F.col(col).cast("string").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    regs = (
        src.select(
            hll_register(F.col("_v")).alias("reg"),
            hll_rank(F.col("_v")).alias("rank"),
        )
        .groupBy("reg")
        .agg(F.max("rank").alias("mx"))
    )
    agg = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("present_sum"),
        F.count(F.lit(1)).alias("n_present"),
    )
    # absent registers contribute 2^0 = 1 each to the harmonic sum and
    # count as zero-registers for the linear-counting correction
    m = float(HLL_M)
    est = agg.select(
        (F.col("present_sum") + (F.lit(m) - F.col("n_present"))).alias("s"),
        (F.lit(HLL_M) - F.col("n_present")).alias("n_zero"),
    ).select(
        (F.lit(HLL_ALPHA) * F.lit(m) * F.lit(m) / F.col("s")).alias("e_raw"),
        "n_zero",
    )
    lc = F.lit(m) * F.log(F.lit(m) / F.col("n_zero"))
    return est.select(
        F.round(
            F.when(
                (F.col("e_raw") <= F.lit(2.5 * m)) & (F.col("n_zero") > 0), lc
            ).otherwise(F.col("e_raw")),
            4,
        ).alias("estimate"),
        F.lit(HLL_M).cast("long").alias("n_registers"),
    )


def hll_ndv_sql(table: str, col: str) -> str:
    """DuckDB twin of :func:`hll_ndv` — same registers, same corrections,
    same operation order on the same doubles."""
    # DuckDB parses bare float literals as DECIMAL — every constant is
    # cast to DOUBLE explicitly so the arithmetic is IEEE-754, matching
    # Spark's evaluation exactly
    m = f"CAST({float(HLL_M)!r} AS DOUBLE)"
    alpha = f"CAST({HLL_ALPHA!r} AS DOUBLE)"
    cv = f"CAST({col} AS VARCHAR)"
    return f"""
WITH regs AS (
  SELECT {hll_register_sql(cv)} AS reg, MAX({hll_rank_sql(cv)}) AS mx
  FROM {table} WHERE {col} IS NOT NULL
  GROUP BY 1),
a AS (
  SELECT SUM(power(CAST(2.0 AS DOUBLE), -mx)) AS present_sum,
         COUNT(*) AS n_present
  FROM regs),
e AS (
  SELECT (present_sum + ({m} - n_present)) AS s,
         ({HLL_M} - n_present) AS n_zero
  FROM a),
r AS (
  SELECT ({alpha} * {m} * {m} / s) AS e_raw, n_zero FROM e)
SELECT round(CASE WHEN e_raw <= CAST({2.5 * HLL_M!r} AS DOUBLE) AND n_zero > 0
             THEN {m} * ln({m} / n_zero) ELSE e_raw END, 4) AS estimate,
       CAST({HLL_M} AS BIGINT) AS n_registers
FROM r
"""


def hll_ndv_py(values) -> float:
    """Reference Python implementation (tests): same registers/corrections."""
    from inception_spark.functions.hashing import h28_py

    regs: dict[int, int] = {}
    for v in values:
        if v is None:
            continue
        h = h28_py(str(v))
        reg, w = h >> _RANK_BITS, h & ((1 << _RANK_BITS) - 1)
        rank = _RANK_BITS - w.bit_length() + 1
        regs[reg] = max(regs.get(reg, 0), rank)
    m = float(HLL_M)
    s = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    e_raw = HLL_ALPHA * m * m / s
    n_zero = HLL_M - len(regs)
    if e_raw <= 2.5 * m and n_zero > 0:
        return round(m * math.log(m / n_zero), 4)
    return round(e_raw, 4)
