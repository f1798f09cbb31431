"""Table/column profiling — the ANALYZE surface of a data pipeline.

The reference (freelawproject/inception) has no statistics surface;
this belongs to the training-data-pipeline family the build brief makes
first-class: before any 100 TB ingest you profile the candidate table —
null rates, cardinalities, ranges, value lengths — and the profile
feeds partition-count / skew / join-strategy decisions.

Design: ONE aggregate pass computes every statistic for every profiled
column (Spark evaluates the multi-count-distinct via its expand
rewrite — still a single logical scan), then a literal stack() unpivots
the one wide row into one row per column.  Exact distinct counts are
the default because the DuckDB oracle must reproduce them; at cluster
scale flip ``exact_ndv=False`` to swap each COUNT(DISTINCT) for
``approx_count_distinct`` (same plan shape, no expand blowup) — the
documented knob, not a silent cap.

Determinism: min/max/counts are exact; ``avg_len`` is an exact integer
sum divided once in double (identical IEEE result per engine), rounded
to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(
    df: DataFrame,
    *,
    numeric_cols: list | None = None,
    string_cols: list | None = None,
    exact_ndv: bool = True,
) -> DataFrame:
    """One row per profiled column: ``(column, n_rows, n_nulls,
    n_distinct, min_d, max_d, min_s, max_s, avg_len)``.  Numeric
    columns fill ``min_d/max_d`` (cast double) and leave ``min_s/max_s``
    NULL; string columns the reverse, plus ``avg_len``."""
    numeric_cols = list(numeric_cols or [])
    string_cols = list(string_cols or [])
    if not numeric_cols and not string_cols:
        raise ValueError("profile_table: no columns requested")
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    ndv = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_ndv
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    for c in numeric_cols + string_cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}")
        )
        aggs.append(ndv(c).cast("long").alias(f"_ndv_{c}"))
    for c in numeric_cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"_max_{c}"))
    for c in string_cols:
        aggs.append(F.min(F.col(c)).alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"_max_{c}"))
        aggs.append(
            F.sum(F.length(F.col(c)).cast("long")).alias(f"_len_{c}")
        )
        aggs.append(
            F.count(F.col(c)).cast("long").alias(f"_cnt_{c}")
        )
    wide = df.agg(*aggs)
    rows = []
    for c in numeric_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_ndv_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_d"),
                F.col(f"_max_{c}").alias("max_d"),
                F.lit(None).cast("string").alias("min_s"),
                F.lit(None).cast("string").alias("max_s"),
                F.lit(None).cast("double").alias("avg_len"),
            )
        )
    for c in string_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_ndv_{c}").alias("n_distinct"),
                F.lit(None).cast("double").alias("min_d"),
                F.lit(None).cast("double").alias("max_d"),
                F.col(f"_min_{c}").alias("min_s"),
                F.col(f"_max_{c}").alias("max_s"),
                F.when(
                    F.col(f"_cnt_{c}") > 0,
                    F.round(
                        F.col(f"_len_{c}").cast("double")
                        / F.col(f"_cnt_{c}").cast("double"),
                        6,
                    ),
                ).alias("avg_len"),
            )
        )
    return wide.select(
        F.explode(F.array(*rows)).alias("p")
    ).select("p.*")


def profile_table_sql(
    table: str,
    *,
    numeric_cols: list | None = None,
    string_cols: list | None = None,
) -> str:
    """DuckDB twin of :func:`profile_table` (exact mode)."""
    numeric_cols = list(numeric_cols or [])
    string_cols = list(string_cols or [])
    parts = []
    for c in numeric_cols:
        parts.append(f"""
SELECT '{c}' AS column,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS DOUBLE) AS min_d,
       CAST(MAX({c}) AS DOUBLE) AS max_d,
       CAST(NULL AS VARCHAR) AS min_s,
       CAST(NULL AS VARCHAR) AS max_s,
       CAST(NULL AS DOUBLE) AS avg_len
FROM {table}""")
    for c in string_cols:
        parts.append(f"""
SELECT '{c}' AS column,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(NULL AS DOUBLE) AS min_d,
       CAST(NULL AS DOUBLE) AS max_d,
       MIN({c}) AS min_s,
       MAX({c}) AS max_s,
       CASE WHEN COUNT({c}) > 0 THEN
         round(CAST(CAST(SUM(length({c})) AS BIGINT) AS DOUBLE)
               / CAST(COUNT({c}) AS DOUBLE), 6)
       END AS avg_len
FROM {table}""")
    return "\nUNION ALL\n".join(parts)


def fd_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """Functional-dependency discovery over ``columns``: for every
    ordered pair (det, dep), ``det → dep`` holds exactly when
    ``ndv(det) == ndv(det, dep)`` — one row
    ``(determinant, dependent, ndv_det, ndv_pair, fd_holds)`` per pair.
    This is the key/denormalization discovery step schema-on-read
    pipelines run before choosing partition and bucketing keys: an FD
    tells you the dependent column is free to co-locate with its
    determinant.

    Plan: ONE aggregate pass computes all |C| + |C|·(|C|−1) exact
    distinct counts (Catalyst's expand rewrite — a single scan, ×(pairs)
    row expansion), then a literal stack() unpivots to the pair table.
    Exact NDV is the point here (an FD is a universally-quantified
    claim; an approximate count cannot certify it) — at 100 TB you
    FALSIFY cheaply first with approx counts (profile_table's knob) and
    certify only surviving pairs with this pass, on a column set pruned
    to plausible keys."""
    pairs = [(a, b) for a in columns for b in columns if a != b]
    aggs = [
        F.countDistinct(c).alias(f"_d_{c}") for c in columns
    ] + [
        F.countDistinct(a, b).alias(f"_p_{a}__{b}") for a, b in pairs
    ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', _d_{a}, _p_{a}__{b}" for a, b in pairs
    )
    return wide.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS "
        "(determinant, dependent, ndv_det, ndv_pair)"
    ).select(
        "determinant",
        "dependent",
        F.col("ndv_det").cast("long").alias("ndv_det"),
        F.col("ndv_pair").cast("long").alias("ndv_pair"),
        (F.col("ndv_det") == F.col("ndv_pair")).alias("fd_holds"),
    )


def fd_profile_sql(table: str, columns: list[str]) -> str:
    """DuckDB twin of :func:`fd_profile` — same scalars, unpivoted by
    UNION ALL over one materialized aggregate row."""
    pairs = [(a, b) for a in columns for b in columns if a != b]
    aggs = ", ".join(
        [f"COUNT(DISTINCT {c}) AS _d_{c}" for c in columns]
        + [f"COUNT(DISTINCT ({a}, {b})) AS _p_{a}__{b}" for a, b in pairs]
    )
    parts = [
        f"SELECT '{a}' AS determinant, '{b}' AS dependent,\n"
        f"       CAST(_d_{a} AS BIGINT) AS ndv_det,\n"
        f"       CAST(_p_{a}__{b} AS BIGINT) AS ndv_pair,\n"
        f"       _d_{a} = _p_{a}__{b} AS fd_holds FROM wide"
        for a, b in pairs
    ]
    return (
        f"WITH wide AS MATERIALIZED (SELECT {aggs} FROM {table})\n"
        + "\nUNION ALL\n".join(parts)
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    *,
    k: int = 5,
) -> DataFrame:
    """k-anonymity / l-diversity audit over a quasi-identifier set: rows
    sharing a QI combination form an equivalence class; a class smaller
    than ``k`` re-identifies its members.  One row per observed CLASS
    SIZE — (class_size, n_classes, n_rows, violates_k, min_l) where
    ``min_l`` is the worst sensitive-value diversity among classes of
    that size (l-diversity: a class can be k-large yet leak if every
    member shares the sensitive value).  The size-keyed rollup keeps the
    report bounded (≤ distinct-class-size rows) no matter how many
    classes exist — the per-class table is an intermediate, never the
    output.

    Plan: one hash aggregate to classes (count + exact distinct of the
    sensitive column), one to the size rollup.  All integers."""
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct(sensitive_col).alias("_l"),
    )
    return (
        classes.groupBy(F.col("_n").alias("class_size"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("_n").cast("long").alias("n_rows"),
            F.min("_l").cast("long").alias("min_l"),
        )
        .select(
            F.col("class_size").cast("long").alias("class_size"),
            "n_classes",
            "n_rows",
            (F.col("class_size") < k).alias("violates_k"),
            "min_l",
        )
    )


def k_anonymity_report_sql(
    table: str, quasi_cols: list[str], sensitive_col: str, *, k: int = 5
) -> str:
    """DuckDB twin of :func:`k_anonymity_report`."""
    qi = ", ".join(quasi_cols)
    return f"""
WITH classes AS (
  SELECT {qi}, COUNT(*) AS _n,
         COUNT(DISTINCT {sensitive_col}) AS _l
  FROM {table} GROUP BY {qi})
SELECT CAST(_n AS BIGINT) AS class_size,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(_n) AS BIGINT) AS n_rows,
       _n < {k} AS violates_k,
       CAST(MIN(_l) AS BIGINT) AS min_l
FROM classes GROUP BY _n
"""


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    *,
    group_col: str,
    tiebreak_col: str,
    k: int = 8,
) -> DataFrame:
    """EXACT equi-depth histogram per group — the optimizer-statistics
    histogram (each bucket holds the same row count ±1, so selectivity
    of a range predicate reads off bucket fractions; equi-WIDTH
    histograms lie under skew, which is why every serious CBO keeps
    equi-depth).  One row per (group, bucket):
    ``(grp, bucket, n_rows, lo, hi, n_distinct)``.

    Bucket assignment is the exact integer rule ``(rank-1)·k′ div n``
    with the **effective bucket count k′ = least(k, n)** over the
    per-group (value, tiebreak) order — deterministic across engines
    (the tiebreak makes the rank total), sizes differing by at most
    one row by construction.  The ``least(k, n)`` clamp is what keeps
    the contract "bucket ids are a contiguous prefix of 0..k′-1" true
    for SMALL groups: with the raw k the rule emits holes whenever
    n < k (n=2, k=4 → ids [0, 2]), and at 100 TB the group is a
    statistics unit (priority class, shard) where tiny groups are
    guaranteed — a CBO consumer indexing 0..k-1 would read holes.

    Scale: the rank is a per-group window — parallel across groups,
    single-task within one.  The group is the statistics unit here
    (priority class, partition, shard); for a histogram over ONE
    colossal ungrouped column, sample first (``sampled_quantiles``) or
    quantize to a pre-bucketed rollup — an exact global rank at 100 TB
    is the same order-statistic wall the Gini docstring documents.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    w = Window.partitionBy("grp").orderBy("v", "tb")
    nw = Window.partitionBy("grp")
    ranked = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(value_col).cast("double").alias("v"),
            F.col(tiebreak_col).alias("tb"),
        )
        .filter(F.col("v").isNotNull())
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(nw))
    )
    return (
        ranked.withColumn(
            # rank to BIGINT before the multiply: row_number is int32
            # and (rk-1)*k wraps past n*k > 2^31 (n > 2.6e8 at k=8)
            "bucket",
            F.expr(
                f"(CAST(rk AS BIGINT) - 1) * least({int(k)}, n) div n"
            ).cast("long"),
        )
        .groupBy("grp", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.count_distinct("v").cast("long").alias("n_distinct"),
        )
    )


def equidepth_histogram_sql(
    table: str,
    value_col: str,
    *,
    group_col: str,
    tiebreak_col: str,
    k: int = 8,
) -> str:
    """DuckDB twin of :func:`equidepth_histogram`."""
    return f"""
WITH ranked AS (
  SELECT {group_col} AS grp,
         CAST({value_col} AS DOUBLE) AS v,
         row_number() OVER (
           PARTITION BY {group_col}
           ORDER BY CAST({value_col} AS DOUBLE), {tiebreak_col}) AS rk,
         COUNT(*) OVER (PARTITION BY {group_col}) AS n
  FROM {table}
  WHERE {value_col} IS NOT NULL)
SELECT grp, CAST((rk - 1) * least({int(k)}, n) // n AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(v) AS lo, MAX(v) AS hi,
       CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct
FROM ranked
GROUP BY 1, 2
"""


def join_cardinality_check(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """The CBO estimator closed loop: the textbook equi-join cardinality
    estimate ``|L|·|R| div max(ndv_L, ndv_R)`` (uniform-frequency,
    containment assumption — what every System-R descendant plans with)
    next to the ACTUAL join count, in one row:
    ``(n_left, n_right, ndv_left, ndv_right, est_rows, actual_rows,
    err_milli)`` with ``err_milli = 1000·|est − actual| div actual``.

    This is the estimator-vs-reality audit you run per join key before
    trusting stats-driven plans at 100 TB: a large err_milli on a key
    means skew or correlation the uniform assumption can't see — feed
    it an equi-depth histogram (``equidepth_histogram``) or a
    heavy-hitter sketch instead.  Plan: two single-pass aggregates +
    the actual join count; all exact integers."""
    ls = left.agg(
        F.count(F.lit(1)).cast("long").alias("n_left"),
        F.count_distinct(F.col(left_key)).cast("long").alias("ndv_left"),
    )
    rs = right.agg(
        F.count(F.lit(1)).cast("long").alias("n_right"),
        F.count_distinct(F.col(right_key)).cast("long").alias(
            "ndv_right"
        ),
    )
    actual = (
        left.select(F.col(left_key).alias("_k"))
        .join(right.select(F.col(right_key).alias("_k")), "_k")
        .agg(F.count(F.lit(1)).cast("long").alias("actual_rows"))
    )
    return (
        ls.crossJoin(rs)
        .crossJoin(actual)
        .select(
            "n_left",
            "n_right",
            "ndv_left",
            "ndv_right",
            F.expr(
                "(n_left * n_right) div greatest(ndv_left, ndv_right)"
            )
            .cast("long")
            .alias("est_rows"),
            "actual_rows",
            F.expr(
                "CASE WHEN actual_rows > 0 THEN"
                " (1000 * abs((n_left * n_right)"
                " div greatest(ndv_left, ndv_right) - actual_rows))"
                " div actual_rows ELSE NULL END"
            )
            .cast("long")
            .alias("err_milli"),
        )
    )


def join_cardinality_check_sql(
    left_table: str,
    right_table: str,
    *,
    left_key: str,
    right_key: str,
) -> str:
    """DuckDB twin of :func:`join_cardinality_check`."""
    return f"""
WITH ls AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_left,
         CAST(COUNT(DISTINCT {left_key}) AS BIGINT) AS ndv_left
  FROM {left_table}),
rs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_right,
         CAST(COUNT(DISTINCT {right_key}) AS BIGINT) AS ndv_right
  FROM {right_table}),
act AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS actual_rows
  FROM {left_table} l JOIN {right_table} r
    ON l.{left_key} = r.{right_key})
SELECT n_left, n_right, ndv_left, ndv_right,
       CAST((n_left * n_right) // greatest(ndv_left, ndv_right)
            AS BIGINT) AS est_rows,
       actual_rows,
       CAST(CASE WHEN actual_rows > 0 THEN
         (1000 * abs((n_left * n_right) // greatest(ndv_left, ndv_right)
                     - actual_rows)) // actual_rows END AS BIGINT)
         AS err_milli
FROM ls, rs, act
"""


def value_count_partials(
    df: DataFrame,
    value_col: str,
    *,
    group_col: str,
) -> DataFrame:
    """Mergeable state for the live equi-depth histogram: (grp, v, c)
    counts per distinct value — pure sums, re-merging exactly under any
    micro-batch regrouping.  State is distinct-(group, value) bounded
    (quantize unbounded domains upstream — the repo-wide spine
    discipline)."""
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(value_col).cast("double").alias("v"),
        )
        .filter(F.col("v").isNotNull())
        .groupBy("grp", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def equidepth_from_value_counts(
    parts: DataFrame, *, k: int = 8
) -> DataFrame:
    """Equi-depth histogram from (grp, v, c) value-count partials —
    IDENTICAL output to :func:`equidepth_histogram` (same rank rule
    (rk−1)·k′ div n with k′ = least(k, n)), because the histogram
    never looks at row ids: a value v with count c occupies global
    ranks (cum−c, cum], so the buckets it intersects are
    floor((cum−c)·k′/n) .. floor((cum−1)·k′/n) and its per-bucket row
    share is an exact integer range overlap.
    One value-spine cumsum window per group + one bounded explode
    (a value lands in >1 bucket only when it straddles — ≤ k extra
    rows per group total).

    This is the Gini/KS finalize discipline applied to the CBO stats
    object: the ORDER STATISTIC (the rank) has no mergeable partial
    form, but it only needs the distinct-value spine, so the live
    state is the value rollup and the sort runs at finalize over
    |distinct values|, never over history."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    merged = parts.groupBy("grp", "v").agg(F.sum("c").alias("c"))
    w = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    nw = Window.partitionBy("grp")
    spine = (
        merged.withColumn("cum", F.sum("c").over(w))
        .withColumn("n", F.sum("c").over(nw))
    )
    # bucket ids this value intersects; per-bucket share by exact
    # integer range intersection of (cum-c, cum] with the bucket's
    # global rank range (div arithmetic identical in both engines)
    ex = spine.select(
        "grp",
        "v",
        "c",
        "cum",
        "n",
        F.explode(
            F.sequence(
                F.expr(f"((cum - c) * least({int(k)}, n)) div n"),
                F.expr(f"((cum - 1) * least({int(k)}, n)) div n"),
            )
        ).alias("bucket"),
    ).withColumn(
        # bucket b holds ranks (ceil(b·n/k′), ceil((b+1)·n/k′)] with
        # k′ = least(k, n) — CEIL, not floor: (rk−1)·k′ div n = b ⟺
        # rk−1 ∈ [ceil(bn/k′), ceil((b+1)n/k′)−1] (hand-checked at
        # n=7, k=4); the clamp keeps bucket ids a contiguous prefix
        # for groups with n < k, matching the batch rule exactly
        "share",
        F.least(
            F.col("cum"),
            F.expr(
                f"((bucket + 1) * n + least({int(k)}, n) - 1)"
                f" div least({int(k)}, n)"
            ),
        )
        - F.greatest(
            F.col("cum") - F.col("c"),
            F.expr(
                f"(bucket * n + least({int(k)}, n) - 1)"
                f" div least({int(k)}, n)"
            ),
        ),
    )
    return (
        ex.groupBy("grp", "bucket")
        .agg(
            F.sum("share").cast("long").alias("n_rows"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
        )
        .select(
            "grp",
            F.col("bucket").cast("long").alias("bucket"),
            "n_rows",
            "lo",
            "hi",
            "n_distinct",
        )
    )
