"""Fellegi–Sunter probabilistic record linkage, Spark-first.

The classic entity-resolution scoring model (Fellegi & Sunter, JASA
1969): candidate record pairs get a likelihood ratio built from
per-field agreement — P(agree | match) = m vs P(agree | non-match) = u —
and rank by the product of per-field ratios.  The reference has no
entity-resolution surface (SURVEY.md §2.5); this is the
training-pipeline extension for catalog/crawl identity reconciliation
(same author/site/record under different keys).

Spark-first decomposition:

* **u-probabilities are data-derived, exactly**: u_f = Σ_v (n_v/n)² —
  the chance two random records agree on field f — computed as EXACT
  integer sums (Σ n_v², n²) for every field in ONE melted aggregate,
  then cast to double (identical in any engine).  No sampling, no EM: this is the
  standard "random agreement" u estimate.
* **blocking before scoring**: candidate pairs come from an equi-join
  on a caller-supplied blocking key (the same discipline as every other
  pair operator in this repo — never all-pairs), id_a < id_b.
* **no logarithms anywhere**: scores multiply the per-field ratios
  directly (monotone-equivalent to the traditional log-weight sum) so
  no cross-engine ``ln`` enters the plan — ln is not guaranteed
  identically rounded across libms, products of identical doubles are.
  Factor order is the caller's field order, left-associated, fixed.

m (P(agree | true match)) is a fixed prior per field — the published
default regime when no labeled matches exist; callers with labeled
pairs can pass better values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def fs_linkage_scores(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    fields: list[str],
    block_col: str,
    m_num: int = 9,
    m_den: int = 10,
) -> DataFrame:
    """Score blocked record pairs by the Fellegi–Sunter likelihood
    ratio: (id_a, id_b, n_agree, score), score rounded to 6 dp.

    ``block_col`` — the blocking key column (build it upstream with
    ``withColumn``); pairs are generated only within blocks.
    ``fields`` — columns compared for exact agreement (NULL never
    agrees, matching SQL equality semantics).
    """
    if not fields:
        raise ValueError("fs_linkage_scores needs >= 1 field")
    m = float(m_num) / float(m_den)
    base = df.select(id_col, block_col, *fields)
    # exact per-field u = sum(n_v^2) / n^2 over non-null values — ONE
    # melted aggregate job for every field (not one job per field):
    # each row explodes to (field, value) structs, grouped counts fold
    # to per-field sum-of-squares
    melted = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f).alias("fld"),
                        F.col(f).cast("string").alias("val"),
                    )
                    for f in fields
                ]
            )
        ).alias("fv")
    ).select("fv.fld", "fv.val")
    rows = (
        melted.groupBy("fld", "val")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("fld")
        .agg(
            F.sum(
                F.when(F.col("val").isNotNull(), F.col("n") * F.col("n"))
            ).alias("num"),
            F.sum(F.when(F.col("val").isNotNull(), F.col("n"))).alias(
                "n_rows"
            ),
        )
        .collect()
    )
    stats = {r["fld"]: (int(r["num"] or 0)) for r in rows}
    n_total = base.count()
    if n_total == 0:
        # empty input: no pairs, clean empty result (u would be 0/0)
        spark = df.sparkSession
        return spark.createDataFrame(
            [], "id_a long, id_b long, n_agree long, score double"
        )
    u: dict[str, float] = {}
    for f in fields:
        # guard: u in (0, 1]; an all-distinct field gets u = n/n^2 = 1/n
        u[f] = max(stats.get(f, 0), 1) / float(n_total * n_total)
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(
        b,
        (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    score: Column = F.lit(1.0)
    agree_terms = []
    for f in fields:
        agree = F.col(f"a.{f}").isNotNull() & (
            F.col(f"a.{f}") == F.col(f"b.{f}")
        )
        uf = u[f]
        factor = F.when(agree, F.lit(m / uf)).otherwise(
            F.lit((1.0 - m) / (1.0 - uf)) if uf < 1.0 else F.lit(1.0)
        )
        score = score * factor
        agree_terms.append(agree.cast("int"))
    n_agree = agree_terms[0]
    for t in agree_terms[1:]:
        n_agree = n_agree + t
    return pairs.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        n_agree.cast("long").alias("n_agree"),
        F.round(score, 6).alias("score"),
    )


def fs_linkage_scores_sql(
    table: str,
    *,
    id_col: str = "doc_id",
    fields: list[str],
    block_sql: str,
    m_num: int = 9,
    m_den: int = 10,
) -> str:
    """DuckDB twin of :func:`fs_linkage_scores` — recomputes the exact
    integer u fractions in SQL and replays the identical left-assoc
    double product.  ``block_sql`` is the blocking-key expression."""
    if not fields:
        raise ValueError("fs_linkage_scores_sql needs >= 1 field")
    m = f"(CAST({m_num} AS DOUBLE) / {m_den})"
    u_ctes = [
        f"""u_{f} AS (
  SELECT CAST(greatest(SUM(n * n), 1) AS DOUBLE) /
         (SELECT CAST(COUNT(*) AS DOUBLE) * COUNT(*) FROM base) AS u
  FROM (SELECT {f}, COUNT(*) AS n FROM base
        WHERE {f} IS NOT NULL GROUP BY {f}))"""
        for f in fields
    ]
    score = "CAST(1.0 AS DOUBLE)"
    agree = []
    for f in fields:
        ag = f"(a.{f} IS NOT NULL AND a.{f} = b.{f})"
        agree.append(f"CASE WHEN {ag} THEN 1 ELSE 0 END")
        score = (
            f"({score} * CASE WHEN {ag}"
            f" THEN {m} / (SELECT u FROM u_{f})"
            f" ELSE CASE WHEN (SELECT u FROM u_{f}) < 1.0"
            f"      THEN (1.0 - {m}) / (1.0 - (SELECT u FROM u_{f}))"
            f"      ELSE 1.0 END END)"
        )
    return f"""
WITH base AS (
  SELECT {id_col}, {block_sql} AS blk, {', '.join(fields)} FROM {table}),
{','.join(u_ctes)}
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
       CAST({' + '.join(agree)} AS BIGINT) AS n_agree,
       round({score}, 6) AS score
FROM base a JOIN base b
  ON a.blk = b.blk AND a.{id_col} < b.{id_col}
"""


def golden_record(
    df: DataFrame,
    *,
    cluster_col: str,
    fields: list[str],
    recency_col: str,
    id_col: str,
) -> DataFrame:
    """Survivorship — the step AFTER entity resolution: collapse each
    linked cluster (from :func:`fs_linkage_scores` pairs, dedup
    components, or any clustering) to ONE canonical record, per-field,
    with provenance.

    Policy: per field, the value from the LATEST record that has it
    (``recency_col`` descending, ``id_col`` as deterministic tiebreak)
    — the standard master-data "most recent non-null wins" rule; a
    field every record leaves NULL stays NULL.  ``<field>_src`` records
    which member supplied each surviving value (the audit trail MDM
    requires).

    Plan: ONE hash aggregate over the cluster key — per field a
    null-gated ``max(struct(recency, id, value))`` (lexicographic
    struct max = arg-max with tiebreak, map-side combinable).  No
    window, no self-join, no per-field pass: at 100 TB this costs
    exactly one shuffle of one row per record, and clusters of any
    size fold associatively."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_records")]
    for f in fields:
        best = F.max(
            F.when(
                F.col(f).isNotNull(),
                F.struct(
                    F.col(recency_col).alias("_r"),
                    F.col(id_col).alias("_i"),
                    F.col(f).alias("_v"),
                ),
            )
        )
        aggs.append(best.alias(f"_best_{f}"))
    out = df.groupBy(F.col(cluster_col).alias("cluster_id")).agg(*aggs)
    sel = [F.col("cluster_id"), F.col("n_records")]
    for f in fields:
        sel.append(F.col(f"_best_{f}._v").alias(f))
        sel.append(F.col(f"_best_{f}._i").alias(f"{f}_src"))
    return out.select(*sel)


def golden_record_sql(
    table: str,
    *,
    cluster_expr: str,
    fields: list[str],
    recency_col: str,
    id_col: str,
) -> str:
    """DuckDB twin of :func:`golden_record`: same null-gated
    lexicographic struct max per field (struct comparison is
    field-order lexicographic in both engines)."""
    parts = ["CAST(COUNT(*) AS BIGINT) AS n_records"]
    sel = ["cluster_id", "n_records"]
    for f in fields:
        parts.append(
            f"max(CASE WHEN {f} IS NOT NULL THEN struct_pack("
            f"_r := {recency_col}, _i := {id_col}, _v := {f}) END)"
            f" AS _best_{f}"
        )
        sel.append(f"_best_{f}._v AS {f}")
        sel.append(f"_best_{f}._i AS {f}_src")
    return f"""
WITH g AS (
  SELECT {cluster_expr} AS cluster_id, {', '.join(parts)}
  FROM {table} GROUP BY 1)
SELECT {', '.join(sel)} FROM g
"""


def golden_record_partials(
    df: DataFrame,
    *,
    cluster_col: str,
    fields: list[str],
    recency_col: str,
    id_col: str,
) -> DataFrame:
    """The mergeable state behind :func:`golden_record`: per cluster,
    the partial row count and the per-field null-gated struct maxes
    KEPT AS STRUCTS (merging needs the (recency, id, value) ordering
    key, not the extracted field).  Struct max is associative /
    commutative / idempotent and counts sum exactly, so partials from
    any regrouping of rows — ingest batches, stream micro-batches —
    merge to the batch answer bit-for-bit (the sketch-quartet
    contract, applied to survivorship)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_records")]
    for f in fields:
        aggs.append(
            F.max(
                F.when(
                    F.col(f).isNotNull(),
                    F.struct(
                        F.col(recency_col).alias("_r"),
                        F.col(id_col).alias("_i"),
                        F.col(f).alias("_v"),
                    ),
                )
            ).alias(f"_best_{f}")
        )
    return df.groupBy(F.col(cluster_col).alias("cluster_id")).agg(*aggs)


def golden_record_finalize(
    partials: DataFrame, fields: list[str]
) -> DataFrame:
    """Merge partial survivorship states (sum counts, re-max structs)
    and extract the surviving values + provenance — output-identical
    to :func:`golden_record` over the union of the partials' inputs."""
    aggs = [F.sum("n_records").cast("long").alias("n_records")]
    for f in fields:
        aggs.append(F.max(f"_best_{f}").alias(f"_best_{f}"))
    merged = partials.groupBy("cluster_id").agg(*aggs)
    sel = [F.col("cluster_id"), F.col("n_records")]
    for f in fields:
        sel.append(F.col(f"_best_{f}._v").alias(f))
        sel.append(F.col(f"_best_{f}._i").alias(f"{f}_src"))
    return merged.select(*sel)
