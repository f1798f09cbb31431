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

from pyspark.sql import Column, DataFrame, Window
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


# ---------------------------------------------------------------------------
# count-min sketch (heavy-hitter frequency estimation)
# ---------------------------------------------------------------------------
# d independent md5-derived hash rows × w counters; est(v) = min_i
# counter[i][h_i(v) mod w].  Never under-estimates; over-estimates by
# ≤ εN with probability 1-δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.  The sketch
# build is one explode to d rows per value + one groupBy on (row,
# bucket) — the shuffle carries ≤ d×w counter rows per partition, the
# same bounded-state shape as the HLL registers.

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_bucket(col: Column, row: int) -> Column:
    # independent hash per row: salt the value with the row index
    return h28(F.concat(F.lit(f"cms{row}\x1f"), col)) % F.lit(CMS_WIDTH)


def cms_counters(df: DataFrame, col: str) -> DataFrame:
    """Build the sketch: (row, bucket, n) counter table."""
    src = df.select(F.col(col).cast("string").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    rows = src.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_bucket(F.col("_v"), i).alias("bucket"),
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("rb")
    ).select("rb.row", "rb.bucket")
    return rows.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("n"))


def cms_merge_counters(*counter_dfs: DataFrame) -> DataFrame:
    """Merge any number of :func:`cms_counters` tables: union +
    counter-wise SUM per (row, bucket) — count-min merge is EXACT (the
    merged sketch equals the sketch of the concatenated stream), so
    per-ingest-batch counter tables (d×w rows each, data-size
    independent) fold together without rescanning history.  The
    count-min member of the mergeable-sketch triad next to
    :func:`hll_merge_registers` (max) and
    :func:`quantiles_from_samples` (union)."""
    if not counter_dfs:
        raise ValueError("cms_merge_counters needs >= 1 counter table")
    out = counter_dfs[0]
    for c in counter_dfs[1:]:
        out = out.unionByName(c)
    return out.groupBy("row", "bucket").agg(F.sum("n").alias("n"))


def cms_estimate_topk(
    df: DataFrame, col: str, *, k: int = 10, counters: DataFrame | None = None
) -> DataFrame:
    """Heavy hitters with sketch-estimated counts next to exact ones:
    (value, exact_n, cms_n) for the exact top-k values (deterministic
    tie-break on the value).  cms_n ≥ exact_n always; equality when no
    bucket collisions — both engines build the identical sketch, so the
    estimates hash-match.

    ``counters`` overrides the sketch side (e.g. a
    :func:`cms_merge_counters` of per-batch tables); by default the
    sketch is built from ``df`` in the same pass."""
    from pyspark.sql import Window

    src = df.select(F.col(col).cast("string").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    if counters is None:
        counters = cms_counters(df, col)
    exact = src.groupBy("_v").agg(F.count(F.lit(1)).alias("exact_n"))
    top = (
        exact.orderBy(F.desc("exact_n"), F.asc("_v")).limit(k)
    )
    probes = top.select(
        "_v",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_bucket(F.col("_v"), i).alias("bucket"),
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("rb"),
    ).select("_v", "exact_n", "rb.row", "rb.bucket")
    est = (
        probes.join(F.broadcast(counters), ["row", "bucket"])
        .groupBy("_v", "exact_n")
        .agg(F.min("n").alias("cms_n"))
    )
    w = Window.orderBy(F.desc("exact_n"), F.asc("_v"))
    return est.select(
        F.col("_v").alias("value"),
        "exact_n",
        "cms_n",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def cms_estimate_topk_sql(table: str, col: str, *, k: int = 10) -> str:
    """DuckDB twin of :func:`cms_estimate_topk`."""
    cv = f"CAST({col} AS VARCHAR)"

    def bucket(expr: str, row: int) -> str:
        salted = "'cms%d' || chr(31) || %s" % (row, expr)
        return f"({h28_sql(salted)} % {CMS_WIDTH})"

    probe_rows = " UNION ALL ".join(
        f"SELECT _v, exact_n, {i} AS row, {bucket('_v', i)} AS bucket FROM top"
        for i in range(CMS_DEPTH)
    )
    counter_rows = " UNION ALL ".join(
        f"SELECT {i} AS row, {bucket('_v', i)} AS bucket FROM src"
        for i in range(CMS_DEPTH)
    )
    return f"""
WITH src AS (
  SELECT {cv} AS _v FROM {table} WHERE {col} IS NOT NULL),
counters AS (
  SELECT row, bucket, COUNT(*) AS n
  FROM ({counter_rows}) GROUP BY row, bucket),
exact AS (SELECT _v, COUNT(*) AS exact_n FROM src GROUP BY _v),
top AS (
  SELECT _v, exact_n FROM exact
  QUALIFY row_number() OVER (ORDER BY exact_n DESC, _v) <= {k}),
probes AS ({probe_rows}),
est AS (
  SELECT p._v, p.exact_n, MIN(c.n) AS cms_n
  FROM probes p JOIN counters c USING (row, bucket)
  GROUP BY p._v, p.exact_n)
SELECT _v AS value, exact_n, cms_n,
       CAST(row_number() OVER (ORDER BY exact_n DESC, _v) AS BIGINT) AS rank
FROM est
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


# ---------------------------------------------------------------------------
# sampled quantiles — deterministic approx-quantile at scale
# ---------------------------------------------------------------------------
# Exact percentile() needs a per-group sort of every value; at 100 TB the
# standard dodge is approx_percentile, but its sketch is merge-order-
# dependent (answers change with executor count).  This variant keeps
# determinism: a content-hash sample (same rows regardless of
# partitioning or corpus growth) + EXACT percentile on the sample —
# error ~ O(1/sqrt(rate·n)), reproducible bit-for-bit, and the DuckDB
# twin replays it exactly (Spark percentile == quantile_cont, verified).


def sampled_quantiles(
    df: DataFrame,
    value_col: str,
    *,
    key_col: str,
    rate: float = 0.1,
    probs: tuple = (0.25, 0.5, 0.9),
    salt: str = "sq",
) -> DataFrame:
    """(p, quantile) rows from an exact percentile over a deterministic
    ``rate``-fraction content-hash sample."""
    from inception_spark.functions.hashing import h28

    sample = quantile_sample(
        df, value_col, key_col=key_col, rate=rate, salt=salt
    )
    return quantiles_from_samples(sample, probs=probs)


def quantile_sample(
    df: DataFrame,
    value_col: str,
    *,
    key_col: str,
    rate: float = 0.1,
    salt: str = "sq",
) -> DataFrame:
    """The materializable half of :func:`sampled_quantiles`: the
    deterministic content-hash sample as a (key, value) relation.

    Membership is a pure row property (``h28(salt ⊕ key) < rate·2²⁸``),
    so for DISJOINT batches the union of per-batch samples IS the
    sample of the union — exactly, not approximately.  That makes this
    the incremental-quantiles primitive: persist each ingest batch's
    few-percent sample, and any later quantile report unions sample
    tables instead of rescanning history (:func:`quantiles_from_samples`
    then equals a fresh full-corpus :func:`sampled_quantiles` — pinned
    by the ``incremental_quantiles`` driver oracle)."""
    from inception_spark.functions.hashing import h28

    if not 0.0 < rate <= 1.0:
        raise ValueError(f"rate must be in (0, 1], got {rate}")
    thresh = int(rate * (1 << 28))
    return df.filter(
        h28(F.concat(F.lit(salt + "\x1f"), F.col(key_col).cast("string")))
        < F.lit(thresh)
    ).select(
        F.col(key_col).alias("key"), F.col(value_col).alias("value")
    )


def quantiles_from_samples(
    *samples: DataFrame, probs: tuple = (0.25, 0.5, 0.9)
) -> DataFrame:
    """(n_sampled, p25, p50, p90, ...) from one or more
    :func:`quantile_sample` tables — union + ONE exact percentile
    aggregate over the (small) sample union."""
    if not samples:
        raise ValueError("quantiles_from_samples needs >= 1 sample table")
    out = samples[0]
    for s in samples[1:]:
        out = out.unionByName(s)
    aggs = [
        F.expr(f"percentile(value, {p})").alias(f"p{int(p * 100)}")
        for p in probs
    ]
    return out.agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"), *aggs
    )


def sampled_quantiles_sql(
    table: str,
    value_col: str,
    *,
    key_col: str,
    rate: float = 0.1,
    probs: tuple = (0.25, 0.5, 0.9),
    salt: str = "sq",
) -> str:
    from inception_spark.functions.hashing import h28_sql

    thresh = int(rate * (1 << 28))
    salted = f"'{salt}' || chr(31) || CAST({key_col} AS VARCHAR)"
    qs = ",\n       ".join(
        f"quantile_cont({value_col}, CAST({p} AS DOUBLE)) AS p{int(p * 100)}"
        for p in probs
    )
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
       {qs}
FROM {table}
WHERE {h28_sql(salted)} < {thresh}
"""


def hll_ndv_by_group(df: DataFrame, group_col: str, col: str) -> DataFrame:
    """Per-group NDV estimates from ONE pass: (group, estimate,
    n_registers) — the grouped form of :func:`hll_ndv` and the shape a
    100 TB rollup actually needs (NDV per day/region/source without a
    per-group COUNT(DISTINCT), whose shuffle carries every distinct
    value; here the shuffle carries ≤ m register rows per group).

    The register table IS the mergeable sketch: ``groupBy(group, reg)
    max(rank)`` partials combine map-side, and re-aggregating the same
    table at a coarser grouping (day → month) gives the exact same
    estimates a fresh scan would — the classic sketch-rollup property,
    pinned in tests."""
    regs = hll_registers_by_group(df, group_col, col)
    return hll_estimate_from_registers(regs)


def hll_registers_by_group(
    df: DataFrame, group_col: str, col: str
) -> DataFrame:
    """The materializable sketch state behind :func:`hll_ndv_by_group`:
    (grp, reg, mx) — ≤ m rows per group, the table a 100 TB pipeline
    persists per ingest batch.  Merge batches with
    :func:`hll_merge_registers` (register-wise max — associative,
    commutative, idempotent), estimate any time with
    :func:`hll_estimate_from_registers`; merged-then-estimated equals a
    fresh full scan EXACTLY (pinned in tests + driver oracle)."""
    src = df.select(
        F.col(group_col).alias("grp"),
        F.col(col).cast("string").alias("_v"),
    ).filter(F.col("_v").isNotNull())
    return (
        src.select(
            "grp",
            hll_register(F.col("_v")).alias("reg"),
            hll_rank(F.col("_v")).alias("rank"),
        )
        .groupBy("grp", "reg")
        .agg(F.max("rank").alias("mx"))
    )


def hll_merge_registers(*register_dfs: DataFrame) -> DataFrame:
    """Merge any number of (grp, reg, mx) register tables into one:
    union + register-wise max.  The incremental-NDV primitive — new
    data folds in without rescanning history, and the shuffle carries
    ≤ m rows per group per batch, never raw values."""
    if not register_dfs:
        raise ValueError("hll_merge_registers needs >= 1 register table")
    out = register_dfs[0]
    for r in register_dfs[1:]:
        out = out.unionByName(r)
    return out.groupBy("grp", "reg").agg(F.max("mx").alias("mx"))


def hll_estimate_from_registers(regs: DataFrame) -> DataFrame:
    """(grp, estimate, n_registers) from a (grp, reg, mx) register
    table — the estimator half of :func:`hll_ndv_by_group`."""
    agg = regs.groupBy("grp").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("present_sum"),
        F.count(F.lit(1)).alias("n_present"),
    )
    m = float(HLL_M)
    est = agg.select(
        "grp",
        (F.col("present_sum") + (F.lit(m) - F.col("n_present"))).alias("s"),
        (F.lit(HLL_M) - F.col("n_present")).alias("n_zero"),
    ).select(
        "grp",
        (F.lit(HLL_ALPHA) * F.lit(m) * F.lit(m) / F.col("s")).alias("e_raw"),
        "n_zero",
    )
    lc = F.lit(m) * F.log(F.lit(m) / F.col("n_zero"))
    return est.select(
        "grp",
        F.round(
            F.when(
                (F.col("e_raw") <= F.lit(2.5 * m)) & (F.col("n_zero") > 0),
                lc,
            ).otherwise(F.col("e_raw")),
            4,
        ).alias("estimate"),
        F.lit(HLL_M).cast("long").alias("n_registers"),
    )


def hll_ndv_by_group_sql(table: str, group_col: str, col: str) -> str:
    """DuckDB twin of :func:`hll_ndv_by_group`."""
    m = f"CAST({float(HLL_M)!r} AS DOUBLE)"
    alpha = f"CAST({HLL_ALPHA!r} AS DOUBLE)"
    cv = f"CAST({col} AS VARCHAR)"
    return f"""
WITH regs AS (
  SELECT {group_col} AS grp, {hll_register_sql(cv)} AS reg,
         MAX({hll_rank_sql(cv)}) AS mx
  FROM {table} WHERE {col} IS NOT NULL
  GROUP BY 1, 2),
a AS (
  SELECT grp, SUM(power(CAST(2.0 AS DOUBLE), -mx)) AS present_sum,
         COUNT(*) AS n_present
  FROM regs GROUP BY grp),
e AS (
  SELECT grp, (present_sum + ({m} - n_present)) AS s,
         ({HLL_M} - n_present) AS n_zero
  FROM a),
r AS (
  SELECT grp, ({alpha} * {m} * {m} / s) AS e_raw, n_zero FROM e)
SELECT grp,
       round(CASE WHEN e_raw <= CAST({2.5 * HLL_M!r} AS DOUBLE)
                  AND n_zero > 0
             THEN {m} * ln({m} / n_zero) ELSE e_raw END, 4) AS estimate,
       CAST({HLL_M} AS BIGINT) AS n_registers
FROM r
"""


def hll_overlap(
    df: DataFrame,
    group_col: str,
    col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Distinct-set OVERLAP of two groups by inclusion-exclusion over
    HLL registers: one row (ndv_a, ndv_b, ndv_union, ndv_overlap).

    The union sketch is just the register-wise max of the two groups'
    register tables (HLL union is exact at the sketch level — unlike
    intersection, which is why the overlap goes through
    |A| + |B| - |A u B| instead of trying to intersect registers).
    This is the audience-overlap / cross-source-contamination primitive:
    at 100 TB both sides reduce to <= m register rows before anything
    meets anything, and the same arithmetic works on PERSISTED register
    tables from different ingest batches without touching raw data.

    Estimates reuse :func:`hll_estimate_from_registers` (rounded to 4
    decimals), and the overlap is computed from the rounded estimates —
    bit-reproducible across engines.  Overlap is clamped at 0 (the
    estimator's noise can push inclusion-exclusion slightly negative on
    disjoint sets).
    """
    if "__union__" in (str(group_a), str(group_b)):
        raise ValueError(
            "hll_overlap: group value '__union__' collides with the "
            "union sentinel — rename the group"
        )
    # grp goes to string up front so the "__union__" sentinel unions
    # cleanly for non-string group columns too
    two = df.filter(F.col(group_col).isin([group_a, group_b])).withColumn(
        group_col, F.col(group_col).cast("string")
    )
    regs = hll_registers_by_group(two, group_col, col)
    union_regs = regs.select(
        F.lit("__union__").alias("grp"), "reg", "mx"
    ).groupBy("grp", "reg").agg(F.max("mx").alias("mx"))
    est = hll_estimate_from_registers(
        regs.unionByName(union_regs)
    )
    ga, gb = F.lit(group_a).cast("string"), F.lit(group_b).cast("string")
    one = est.agg(
        F.max(
            F.when(F.col("grp").cast("string") == ga, F.col("estimate"))
        ).alias("ndv_a"),
        F.max(
            F.when(F.col("grp").cast("string") == gb, F.col("estimate"))
        ).alias("ndv_b"),
        F.max(
            F.when(F.col("grp") == "__union__", F.col("estimate"))
        ).alias("ndv_union"),
    )
    return one.select(
        "ndv_a",
        "ndv_b",
        "ndv_union",
        F.round(
            F.greatest(
                F.lit(0.0),
                F.col("ndv_a") + F.col("ndv_b") - F.col("ndv_union"),
            ),
            4,
        ).alias("ndv_overlap"),
    )


def _hll_estimate_sql(regs_cte: str) -> str:
    """Estimator SQL over a (reg, mx) CTE — shared by the overlap twin."""
    m = f"CAST({float(HLL_M)!r} AS DOUBLE)"
    alpha = f"CAST({HLL_ALPHA!r} AS DOUBLE)"
    return f"""(
  SELECT round(CASE WHEN e_raw <= CAST({2.5 * HLL_M!r} AS DOUBLE)
                    AND n_zero > 0
               THEN {m} * ln({m} / n_zero) ELSE e_raw END, 4)
  FROM (
    SELECT ({alpha} * {m} * {m} /
            (SUM(power(CAST(2.0 AS DOUBLE), -mx)) + ({m} - COUNT(*))))
             AS e_raw,
           ({HLL_M} - COUNT(*)) AS n_zero
    FROM {regs_cte})
)"""


def hll_overlap_sql(
    table: str, group_col: str, col: str, group_a, group_b
) -> str:
    """DuckDB twin of :func:`hll_overlap`."""
    cv = f"CAST({col} AS VARCHAR)"

    def lit(v) -> str:
        return f"'{v}'" if isinstance(v, str) else str(v)

    def regs(pred: str) -> str:
        return f"""(
  SELECT {hll_register_sql(cv)} AS reg, MAX({hll_rank_sql(cv)}) AS mx
  FROM {table}
  WHERE {col} IS NOT NULL AND {pred}
  GROUP BY 1)"""

    ra = regs(f"{group_col} = {lit(group_a)}")
    rb = regs(f"{group_col} = {lit(group_b)}")
    ru = regs(f"{group_col} IN ({lit(group_a)}, {lit(group_b)})")
    return f"""
WITH est AS (
  SELECT {_hll_estimate_sql(ra)} AS ndv_a,
         {_hll_estimate_sql(rb)} AS ndv_b,
         {_hll_estimate_sql(ru)} AS ndv_union)
SELECT ndv_a, ndv_b, ndv_union,
       round(greatest(CAST(0.0 AS DOUBLE),
                      ndv_a + ndv_b - ndv_union), 4) AS ndv_overlap
FROM est
"""


def kmv_overlap(
    df: DataFrame,
    group_col: str,
    col: str,
    group_a,
    group_b,
    *,
    k: int = 256,
) -> DataFrame:
    """Set NDV + overlap of two groups via KMV (k-minimum-values)
    sketches (Bar-Yossef et al. 2002; Beyer et al., "On Synopses for
    Distinct-Value Estimation Under Multiset Operations", SIGMOD'07):
    one row (ndv_a, ndv_b, ndv_union, ndv_overlap).

    Where :func:`hll_overlap` reaches the intersection by
    inclusion-exclusion over three cardinality estimates, KMV supports
    set EXPRESSIONS natively: keep each group's k smallest value
    hashes; the union sketch is the k smallest of the merged multiset,
    |union| ~ (k-1) / U_(k) (U_(k) = the k-th minimum normalized to
    (0,1)), and the intersection estimate is the JACCARD of the
    retained hash sets scaled by the union estimate — tighter than
    inclusion-exclusion when the overlap is small (the difference of
    two big numbers never appears).

    Everything is exact integer ordering on the shared 60-bit md5
    primitive: per-group top-k via one rank window over ≤ |distinct|
    hash rows, merge relationally, estimates rounded at 4 dp — fully
    engine-reproducible, and the sketch (k hashes per group) is
    mergeable state a 100 TB rollup can persist per batch exactly like
    the HLL register tables.  (The one global window orders the UNION
    of the two sketches — <= 2k rows by construction, sketch-sized
    control-plane work at any corpus size; the per-group top-k window
    partitions by group.)
    """
    from . import hashing as H

    two = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(col).cast("string").alias("_v"),
    ).filter(F.col("_v").isNotNull())
    hashes = two.select("grp", H.h60(F.col("_v")).alias("h")).distinct()
    return kmv_overlap_from_hashes(
        hashes, str(group_a), str(group_b), k=k
    )


def kmv_overlap_from_hashes(
    hashes: DataFrame, group_a: str, group_b: str, *, k: int = 256
) -> DataFrame:
    """Estimator half of :func:`kmv_overlap` over a prebuilt (grp, h)
    DISTINCT hash relation — the factoring that lets per-batch or
    in-stream hash deltas (union-merge ≡ full scan, the min-k identity)
    feed the identical estimate."""
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("h")
    topk = hashes.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
    m = float(1 << 60)

    def est(kth_df, label):
        # (k_eff - 1) / (kth_min / 2^60); k_eff = min(k, n) rows kept;
        # when a group has fewer than k distinct values the sketch IS
        # the set and the estimate is exact = n
        return kth_df.select(
            F.lit(label).alias("side"),
            F.when(
                F.col("n_kept") < k, F.col("n_kept").cast("double")
            )
            .otherwise(
                (F.col("n_kept") - 1)
                / (F.col("kth").cast("double") / F.lit(m))
            )
            .alias("est"),
            "n_kept",
        )

    ka = topk.filter(F.col("grp") == F.lit(group_a))
    kb = topk.filter(F.col("grp") == F.lit(group_b))
    union_k = (
        ka.select("h")
        .unionByName(kb.select("h"))
        .distinct()
        .withColumn("rk", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rk") <= k)
    )
    stats_a = ka.agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("n_kept"))
    stats_b = kb.agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("n_kept"))
    stats_u = union_k.agg(
        F.max("h").alias("kth"), F.count(F.lit(1)).alias("n_kept")
    )
    # intersection of the RETAINED sets, restricted to the union sketch
    inter_k = (
        union_k.join(ka.select("h"), "h", "left_semi")
        .join(kb.select("h"), "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    one = (
        est(stats_a, "a")
        .unionByName(est(stats_b, "b"))
        .unionByName(est(stats_u, "u"))
        .groupBy()
        .pivot("side", ["a", "b", "u"])
        .agg(F.first("est"))
        .crossJoin(F.broadcast(inter_k))
        .crossJoin(
            F.broadcast(stats_u.select(F.col("n_kept").alias("n_union_kept")))
        )
    )
    return one.select(
        F.round(F.col("a"), 4).alias("ndv_a"),
        F.round(F.col("b"), 4).alias("ndv_b"),
        F.round(F.col("u"), 4).alias("ndv_union"),
        F.round(
            F.col("n_inter").cast("double")
            / F.col("n_union_kept").cast("double")
            * F.col("u"),
            4,
        ).alias("ndv_overlap"),
    )


def kmv_overlap_sql(
    table: str, group_col: str, col: str, group_a, group_b, *, k: int = 256
) -> str:
    """DuckDB twin of :func:`kmv_overlap`."""
    from . import hashing as H

    def lit(v) -> str:
        return f"'{v}'" if isinstance(v, str) else str(v)

    h = H.h60_sql(f"CAST({col} AS VARCHAR)")
    m = float(1 << 60)
    return f"""
WITH hashes AS (
  SELECT DISTINCT CAST({group_col} AS VARCHAR) AS grp, {h} AS h
  FROM {table}
  WHERE {col} IS NOT NULL
    AND {group_col} IN ({lit(group_a)}, {lit(group_b)})),
topk AS (
  SELECT grp, h FROM (
    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rk
    FROM hashes) WHERE rk <= {k}),
ka AS (SELECT h FROM topk WHERE grp = CAST({lit(group_a)} AS VARCHAR)),
kb AS (SELECT h FROM topk WHERE grp = CAST({lit(group_b)} AS VARCHAR)),
union_k AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rk FROM (
      SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)))
  WHERE rk <= {k}),
est AS (
  SELECT 'a' AS side, MAX(h) AS kth, COUNT(*) AS n_kept FROM ka
  UNION ALL
  SELECT 'b', MAX(h), COUNT(*) FROM kb
  UNION ALL
  SELECT 'u', MAX(h), COUNT(*) FROM union_k),
ev AS (
  SELECT side,
         CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
              ELSE (n_kept - 1) /
                   (CAST(kth AS DOUBLE) / CAST({m!r} AS DOUBLE)) END AS est,
         n_kept
  FROM est),
inter AS (
  SELECT COUNT(*) AS n_inter FROM union_k u
  WHERE EXISTS (SELECT 1 FROM ka WHERE ka.h = u.h)
    AND EXISTS (SELECT 1 FROM kb WHERE kb.h = u.h))
SELECT
  round((SELECT est FROM ev WHERE side = 'a'), 4) AS ndv_a,
  round((SELECT est FROM ev WHERE side = 'b'), 4) AS ndv_b,
  round((SELECT est FROM ev WHERE side = 'u'), 4) AS ndv_union,
  round(CAST((SELECT n_inter FROM inter) AS DOUBLE)
        / CAST((SELECT n_kept FROM ev WHERE side = 'u') AS DOUBLE)
        * (SELECT est FROM ev WHERE side = 'u'), 4) AS ndv_overlap
"""


def grouped_quantiles(
    df: DataFrame,
    value_col: str,
    *,
    group_col: str,
    key_col: str,
    rate: float = 0.1,
    probs: tuple = (0.25, 0.5, 0.9),
    salt: str = "sq",
) -> DataFrame:
    """Per-GROUP deterministic quantiles: (group, n_sampled, p25, p50,
    ...) — the grouped form of :func:`sampled_quantiles`, the shape a
    100 TB profile actually asks for (median price per segment, p90
    latency per service).

    Same content-hash sample as :func:`quantile_sample` (membership is
    a row property, so per-batch sample unions stay exact), then ONE
    grouped exact-percentile aggregate over the small sample; no
    per-group approx_percentile sketch whose merge order varies.
    Spark's ``percentile`` and DuckDB's ``quantile_cont`` both
    linear-interpolate, and the sample is identical row-for-row, so
    the outputs hash-match.
    """
    from inception_spark.functions.hashing import h28

    if not 0.0 < rate <= 1.0:
        raise ValueError(f"rate must be in (0, 1], got {rate}")
    thresh = int(rate * (1 << 28))
    sample = df.filter(
        h28(F.concat(F.lit(salt + "\x1f"), F.col(key_col).cast("string")))
        < F.lit(thresh)
    ).select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("value"),
    )
    aggs = [
        F.round(F.expr(f"percentile(value, {p})"), 6).alias(
            f"p{int(p * 100)}"
        )
        for p in probs
    ]
    return sample.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_sampled"), *aggs
    )


def grouped_quantiles_sql(
    table: str,
    value_col: str,
    *,
    group_col: str,
    key_col: str,
    rate: float = 0.1,
    probs: tuple = (0.25, 0.5, 0.9),
    salt: str = "sq",
) -> str:
    """DuckDB twin of :func:`grouped_quantiles`."""
    from inception_spark.functions.hashing import h28_sql

    thresh = int(rate * (1 << 28))
    h = h28_sql(f"'{salt}' || chr(31) || CAST({key_col} AS VARCHAR)")
    qs = ",\n       ".join(
        f"round(quantile_cont(CAST({value_col} AS DOUBLE), "
        f"CAST({p!r} AS DOUBLE)), 6) AS p{int(p * 100)}"
        for p in probs
    )
    return f"""
SELECT {group_col} AS grp, CAST(COUNT(*) AS BIGINT) AS n_sampled,
       {qs}
FROM {table}
WHERE {h} < {thresh}
GROUP BY {group_col}
"""


def cumulative_ndv(
    df: DataFrame,
    *,
    time_col: str,
    col: str,
    bucket: str = "day",
) -> DataFrame:
    """Cumulative distinct-count growth curve: (bucket_ts, estimate,
    n_registers) — for each time bucket, the HLL estimate of distinct
    ``col`` values seen UP TO AND INCLUDING that bucket (the audience /
    vocabulary growth curve).

    Scale shape: raw rows reduce to per-(bucket, register) maxima first
    (the usual <= m rows per bucket), and the CUMULATIVE part runs as a
    running max over the REGISTER TABLE — a window partitioned by
    register over #buckets rows, never over raw data.  Buckets with no
    rows of their own still inherit the running state via the
    bucket x register spine, so the curve is defined at every bucket in
    the observed range.
    """
    src = df.select(
        F.date_trunc(bucket, F.col(time_col)).alias("b"),
        F.col(col).cast("string").alias("_v"),
    ).filter(F.col("_v").isNotNull())
    regs = (
        src.select(
            "b",
            hll_register(F.col("_v")).alias("reg"),
            hll_rank(F.col("_v")).alias("rank"),
        )
        .groupBy("b", "reg")
        .agg(F.max("rank").alias("mx"))
    )
    # bucket x register spine so empty buckets carry the running state
    buckets = src.select("b").distinct()
    spine = buckets.crossJoin(
        F.broadcast(regs.select("reg").distinct())
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("reg")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        spine.join(regs, ["b", "reg"], "left")
        .withColumn("cmx", F.max("mx").over(w))
        .filter(F.col("cmx").isNotNull())
    )
    est = hll_estimate_from_registers(
        cum.select(F.col("b").alias("grp"), "reg", F.col("cmx").alias("mx"))
    )
    return est.select(
        F.col("grp").alias("bucket_ts"), "estimate", "n_registers"
    )


def cumulative_ndv_sql(
    table: str, *, time_col: str, col: str, bucket: str = "day"
) -> str:
    """DuckDB twin of :func:`cumulative_ndv`."""
    m = f"CAST({float(HLL_M)!r} AS DOUBLE)"
    alpha = f"CAST({HLL_ALPHA!r} AS DOUBLE)"
    cv = f"CAST({col} AS VARCHAR)"
    return f"""
WITH src AS (
  SELECT date_trunc('{bucket}', {time_col}) AS b, {cv} AS v
  FROM {table} WHERE {col} IS NOT NULL),
regs AS (
  SELECT b, {hll_register_sql('v')} AS reg,
         MAX({hll_rank_sql('v')}) AS mx
  FROM src GROUP BY 1, 2),
spine AS (
  SELECT b, reg FROM (SELECT DISTINCT b FROM src)
  CROSS JOIN (SELECT DISTINCT reg FROM regs)),
cum AS (
  SELECT s.b, s.reg,
         MAX(r.mx) OVER (PARTITION BY s.reg ORDER BY s.b
                         ROWS UNBOUNDED PRECEDING) AS cmx
  FROM spine s LEFT JOIN regs r ON r.b = s.b AND r.reg = s.reg),
live AS (SELECT b, reg, cmx AS mx FROM cum WHERE cmx IS NOT NULL),
a AS (
  SELECT b, SUM(power(CAST(2.0 AS DOUBLE), -mx)) AS present_sum,
         COUNT(*) AS n_present
  FROM live GROUP BY b),
e AS (
  SELECT b, (present_sum + ({m} - n_present)) AS s,
         ({HLL_M} - n_present) AS n_zero
  FROM a),
r AS (SELECT b, ({alpha} * {m} * {m} / s) AS e_raw, n_zero FROM e)
SELECT b AS bucket_ts,
       round(CASE WHEN e_raw <= CAST({2.5 * HLL_M!r} AS DOUBLE)
                  AND n_zero > 0
             THEN {m} * ln({m} / n_zero) ELSE e_raw END, 4) AS estimate,
       CAST({HLL_M} AS BIGINT) AS n_registers
FROM r
"""


def _hll_estimate_over(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """The HLL estimator of :func:`hll_estimate_from_registers`,
    generalized to arbitrary (possibly zero) grouping columns — the
    building block of :func:`hll_ndv_rollup`."""
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("present_sum"),
        F.count(F.lit(1)).alias("n_present"),
    )
    m = float(HLL_M)
    est = agg.select(
        *group_cols,
        (F.col("present_sum") + (F.lit(m) - F.col("n_present"))).alias("s"),
        (F.lit(HLL_M) - F.col("n_present")).alias("n_zero"),
    ).select(
        *group_cols,
        (F.lit(HLL_ALPHA) * F.lit(m) * F.lit(m) / F.col("s")).alias("e_raw"),
        "n_zero",
    )
    lc = F.lit(m) * F.log(F.lit(m) / F.col("n_zero"))
    return est.select(
        *group_cols,
        F.round(
            F.when(
                (F.col("e_raw") <= F.lit(2.5 * m)) & (F.col("n_zero") > 0),
                lc,
            ).otherwise(F.col("e_raw")),
            4,
        ).alias("estimate"),
        F.lit(HLL_M).cast("long").alias("n_registers"),
    )


def hll_ndv_rollup(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    *,
    grouping_sets: list[tuple[str, ...]] | None = None,
) -> DataFrame:
    """The NDV CUBE from ONE raw-data scan — the mergeable-sketch
    property applied vertically across a grouping hierarchy.

    A naive cube of COUNT(DISTINCT) over k dimensions rescans (or
    Expands) the fact table once per grouping set, and every set's
    shuffle carries raw distinct values.  Here the HLL register table
    is built ONCE at the finest grain (group_cols + reg → max rank);
    every coarser grouping set is then derived from that table by
    register-wise max — pure sketch merging, ≤ m rows per finest-grain
    group through every later stage, raw data never re-read.  Because
    register max is associative/commutative/idempotent, the rolled-up
    estimate is EXACTLY what a fresh scan at that grain would produce
    (the invariant the driver oracle checks level by level).

    ``grouping_sets`` defaults to the full cube over ``group_cols``.
    Output: (level, *group_cols ['(all)' where rolled up], estimate,
    n_registers); ``level`` names the set ('(global)' for ()).

    100 TB shape: the finest register table is the thing to persist —
    per-batch tables fold in via :func:`hll_merge_registers` and this
    rollup re-derives the whole cube from state that is millions of
    times smaller than the corpus.
    """
    from functools import reduce
    from itertools import combinations

    if grouping_sets is None:
        grouping_sets = [
            tuple(c for c in group_cols if c in set(combo))
            for r in range(len(group_cols), -1, -1)
            for combo in combinations(group_cols, r)
        ]
    src = df.select(
        *[F.col(c).cast("string").alias(c) for c in group_cols],
        F.col(col).cast("string").alias("_v"),
    ).filter(F.col("_v").isNotNull())
    regs = (
        src.select(
            *group_cols,
            hll_register(F.col("_v")).alias("reg"),
            hll_rank(F.col("_v")).alias("rank"),
        )
        .groupBy(*group_cols, "reg")
        .agg(F.max("rank").alias("mx"))
    )
    outs = []
    for gs in grouping_sets:
        merged = regs.groupBy(*gs, "reg").agg(F.max("mx").alias("mx"))
        est = _hll_estimate_over(merged, list(gs))
        level = ",".join(gs) if gs else "(global)"
        sel = [F.lit(level).alias("level")]
        for c in group_cols:
            sel.append(
                F.col(c) if c in gs else F.lit("(all)").alias(c)
            )
        outs.append(est.select(*sel, "estimate", "n_registers"))
    return reduce(lambda a, b: a.unionByName(b), outs)


def hll_ndv_rollup_sql(
    table: str,
    group_exprs: dict[str, str],
    col: str,
    *,
    grouping_sets: list[tuple[str, ...]] | None = None,
) -> str:
    """DuckDB twin of :func:`hll_ndv_rollup`: one registers CTE at the
    finest grain, one register-max + estimator block per grouping set,
    unioned.  ``group_exprs`` maps output column name → SQL expr."""
    from itertools import combinations

    names = list(group_exprs)
    if grouping_sets is None:
        grouping_sets = [
            tuple(c for c in names if c in set(combo))
            for r in range(len(names), -1, -1)
            for combo in combinations(names, r)
        ]
    cv = f"CAST({col} AS VARCHAR)"
    m = f"CAST({float(HLL_M)!r} AS DOUBLE)"
    alpha = f"CAST({HLL_ALPHA!r} AS DOUBLE)"
    src_cols = ", ".join(
        f"CAST({e} AS VARCHAR) AS {n}" for n, e in group_exprs.items()
    )
    finest = ", ".join(names)
    blocks = []
    for gs in grouping_sets:
        level = ",".join(gs) if gs else "(global)"
        gsel = ", ".join(gs)
        gpfx = f"{gsel}, " if gs else ""
        gby = f"GROUP BY {gsel}" if gs else ""
        out_cols = ", ".join(
            n if n in gs else f"'(all)' AS {n}" for n in names
        )
        blocks.append(f"""
  SELECT '{level}' AS level, {out_cols},
         round(CASE WHEN e_raw <= CAST({2.5 * HLL_M!r} AS DOUBLE)
                    AND n_zero > 0
               THEN {m} * ln({m} / n_zero) ELSE e_raw END, 4)
           AS estimate,
         CAST({HLL_M} AS BIGINT) AS n_registers
  FROM (
    SELECT {gpfx}({alpha} * {m} * {m} /
             (present_sum + ({m} - n_present))) AS e_raw,
           ({HLL_M} - n_present) AS n_zero
    FROM (
      SELECT {gpfx}SUM(power(CAST(2.0 AS DOUBLE), -mx)) AS present_sum,
             COUNT(*) AS n_present
      FROM (SELECT {gpfx}reg, MAX(mx) AS mx FROM regs
            GROUP BY {gpfx}reg) {gby})
    )""")
    union = "\n  UNION ALL\n".join(blocks)
    return f"""
WITH src AS (
  SELECT {src_cols}, {cv} AS _v FROM {table} WHERE {col} IS NOT NULL),
regs AS (
  SELECT {finest}, {hll_register_sql('_v')} AS reg,
         MAX({hll_rank_sql('_v')}) AS mx
  FROM src GROUP BY {finest}, reg)
{union}
"""


def _prob_percent(p: float) -> int:
    """Exact percentage points for a quantile prob — raises on a prob
    that is not a whole percent (e.g. 0.025) instead of silently
    rounding it to a mislabeled neighbor (0.025 -> banker's 2 -> 'p2'
    computing the 2% quantile).  The 1e-9 slack only forgives binary
    float representation error (0.07*100 == 7.000000000000001), never
    a real off-grid prob (distance >= 0.5)."""
    num = round(p * 100)
    if not 0 < num <= 100 or abs(p * 100 - num) > 1e-9:
        raise ValueError(
            f"prob {p!r} is not a whole percent in (0, 1]; the exact "
            "integer keep test works in percentage points — pass e.g. "
            "0.02 or 0.03, or quantize upstream"
        )
    return int(num)


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    *,
    group_col: str,
    probs: tuple = (0.25, 0.5, 0.9),
) -> DataFrame:
    """Per-group WEIGHTED quantiles — the profile query when rows carry
    unequal mass (token-weighted length stats, duration-weighted
    latency, revenue-weighted price): the p-quantile is the smallest
    value whose cumulative weight share reaches p (left-continuous
    inverse CDF, integer-exact).

    Neither engine ships a weighted quantile aggregate, so both sides
    compute the same primitive plan: per (group, value) weight rollup
    (collapses duplicates BEFORE the window — the window runs over
    distinct values per group, not rows), a cumulative-weight window
    ordered by value, then per-p the minimal value with
    cw * 1 >= p_num * total / p_den compared in EXACT integer
    arithmetic (weights are longs; probs are rationals p_num/p_den
    over 100) — no interpolation, no floats, so the selected values
    are bit-identical across engines.

    Scale: the shuffle carries (group, value)-distinct rows; the
    window partitions by group.  For value domains too large to
    window, quantize upstream (the curriculum_bins discipline).
    """
    vw = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(value_col).alias("v"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .filter(F.col("v").isNotNull() & (F.col("w") > 0))
        .groupBy("grp", "v")
        .agg(F.sum("w").alias("w"))
    )
    win = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = vw.select(
        "grp", "v", F.sum("w").over(win).alias("cw"),
        F.sum("w").over(
            Window.partitionBy("grp").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("tw"),
    )
    aggs = []
    for p in probs:
        p_num = _prob_percent(p)
        aggs.append(
            F.min(
                F.when(
                    F.col("cw") * 100 >= F.lit(p_num) * F.col("tw"),
                    F.col("v"),
                )
            ).alias(f"p{p_num}")
        )
    return cum.groupBy("grp").agg(
        F.max("tw").cast("long").alias("total_weight"), *aggs
    )


def weighted_quantiles_sql(
    table: str,
    value_col: str,
    weight_col: str,
    *,
    group_col: str,
    probs: tuple = (0.25, 0.5, 0.9),
) -> str:
    """DuckDB twin of :func:`weighted_quantiles`."""
    cols = []
    for p in probs:
        p_num = _prob_percent(p)
        cols.append(
            f"MIN(CASE WHEN cw * 100 >= {p_num} * tw THEN v END)"
            f" AS p{p_num}"
        )
    return f"""
WITH vw AS (
  SELECT {group_col} AS grp, {value_col} AS v,
         SUM(CAST({weight_col} AS BIGINT)) AS w
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {weight_col} > 0
  GROUP BY 1, 2),
cum AS (
  SELECT grp, v,
         SUM(w) OVER (PARTITION BY grp ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(w) OVER (PARTITION BY grp) AS tw
  FROM vw)
SELECT grp, CAST(MAX(tw) AS BIGINT) AS total_weight,
       {', '.join(cols)}
FROM cum GROUP BY grp
"""
