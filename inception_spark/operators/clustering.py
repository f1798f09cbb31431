"""Distributed k-means clustering and SemDeDup-style semantic dedup.

Fills the "cluster the corpus's embedding space" slot of a training-data
pipeline: k-means gives the partitioning used by semantic dedup (SemDeDup,
Abbas et al. 2023 — remove documents whose embeddings are near-identical
to an earlier-kept document *within the same cluster*), curriculum /
difficulty binning, and topic-balanced sampling.  The reference service
(/root/reference/inception/embedding_service.py) produces the embeddings;
this module is the corpus-level consumer the reference leaves to its
callers.

Determinism engineering — the whole of Lloyd's algorithm runs in integer
micro-units so every engine produces bit-identical assignments:

* coordinates quantize once to ``floor(x*1e6 + 0.5) + OFF`` (half-up, the
  ``_pq_sub_dist_units`` convention) with ``OFF = 2^21`` so every value is
  a non-negative int64 — from then on there is NO float anywhere;
* distances are integer squared L2 (the +OFF shift cancels in the
  subtraction); argmin ties break on the smaller centroid id;
* centroid updates are ``sum div count`` — floor division of non-negative
  int64, identical in Spark (``div``), DuckDB (``//``) and Python
  (``//``), the pagerank "picorank" discipline;
* seeds are the ``k`` rows with the smallest ``(md5(id), id)`` — the same
  deterministic pseudo-random draw as ``ivf_flat_topk`` / ``pq_codebook``.

Scale shape (the part that matters at 100 TB): centroids live DRIVER-side
(k·d int64s — control plane), so cluster assignment is a zero-join,
zero-shuffle whole-stage-codegen scan with the centroids riding as plan
literals, and each Lloyd round is ONE hash aggregate (k groups × d+1
columns) with map-side partial combine — per-round cluster traffic is
``k·(d+1)·n_tasks`` longs, independent of row count.  The quantized input
is localCheckpoint'ed once so the n_iter rounds don't re-derive it.  For
k beyond a few hundred the literal argmin expression gets large; that
regime wants the broadcast-join formulation instead (see ``_ivf_cells``),
trading a broadcast hash join per round for unbounded k.

Overflow headroom: unit-norm embedding coords quantize to ≤ ~3.1e6 units;
per-dimension sums stay under 2^63 up to ~3e12 rows per cluster, and
squared distances under 2^63 up to ~10^5 dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

UNIT = 1_000_000  # micro-units per 1.0 of coordinate
OFF = 1 << 21     # shift making every quantized coordinate non-negative


def quantize_units(
    df: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, uvec array<long>): half-up micro-unit quantization, shifted
    non-negative.  Requires coordinates in (-2, 2) — true for the
    unit-norm embeddings this engine produces (OFF/UNIT ≈ 2.097)."""
    u = F.transform(
        F.col(vec_col),
        lambda x: (
            F.floor(x.cast("double") * F.lit(float(UNIT)) + F.lit(0.5))
            + F.lit(OFF)
        ).cast("long"),
    )
    return df.select(F.col(id_col).alias("id"), u.alias("uvec"))


def _dist2(uvec, cent: list[int]):
    """Integer squared L2 between ``uvec`` and a literal centroid."""
    lit = F.array(*[F.lit(int(v)) for v in cent])
    return F.aggregate(
        F.zip_with(uvec, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _argmin_expr(cents: list[list[int]]):
    """struct(d, cid) of the nearest literal centroid (min-cid ties)."""
    return F.array_min(
        F.array(
            *[
                F.struct(
                    _dist2(F.col("uvec"), c).alias("d"),
                    F.lit(cid).alias("cid"),
                )
                for cid, c in enumerate(cents)
            ]
        )
    )


def kmeans_seeds(u: DataFrame, k: int) -> list[list[int]]:
    """The k smallest (md5(id), id) rows' uvecs, in draw order —
    driver-side control plane (k·d int64s), like ``pq_codebook``."""
    rows = (
        u.select(F.md5(F.col("id").cast("string")).alias("h"), "id", "uvec")
        .orderBy("h", "id")
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(rows)}")
    return [[int(v) for v in r["uvec"]] for r in rows]


def kmeans_train(
    df: DataFrame,
    *,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means, bit-exact across engines: returns the final
    assignment ``(id, cid, dist2_units)``.

    Each round: one literal-centroid codegen scan (no join, no shuffle)
    + one k-row hash aggregate collected to the driver.  The returned
    DataFrame is a pure plan over the input with the final centroids as
    literals — re-executable without re-training."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    u = quantize_units(df, id_col=id_col, vec_col=vec_col).localCheckpoint(
        eager=False
    )
    dim = len(u.select("uvec").first()["uvec"])
    cents = kmeans_seeds(u, k)
    for _ in range(n_iter):
        m = _argmin_expr(cents)
        agg = (
            u.select(m["cid"].alias("cid"), "uvec")
            .groupBy("cid")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at("uvec", i + 1)).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        new = [list(c) for c in cents]  # empty cluster keeps its centroid
        for r in agg:
            n = int(r["n"])
            new[int(r["cid"])] = [int(r[f"s{i}"]) // n for i in range(dim)]
        cents = new
    m = _argmin_expr(cents)
    return u.select(
        F.col("id").alias(id_col),
        m["cid"].alias("cid"),
        m["d"].alias("dist2_units"),
    )


def kmeans_train_sql(
    table: str = "embeddings",
    *,
    k: int = 8,
    n_iter: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin: the same integer Lloyd iteration unrolled into CTEs
    (the ``pagerank_sql`` pattern).  Per-dimension sums are generated as
    explicit ``list_value(...)`` terms; ``CAST AS BIGINT`` pins DuckDB's
    HUGEINT sum widening back to int64."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    d2 = (
        "CAST(list_sum(list_transform(list_zip(u.uvec, c.cvec),"
        " p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT)"
    )
    ctes = [
        f"""u AS (
  SELECT {id_col} AS id,
         list_transform({vec_col},
           x -> CAST(floor(CAST(x AS DOUBLE)*{UNIT} + 0.5) AS BIGINT)
                + {OFF}) AS uvec
  FROM {table})""",
        f"""c0 AS (
  SELECT cid, uvec AS cvec FROM (
    SELECT uvec,
           row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1
             AS cid
    FROM u) WHERE cid < {k})""",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""a{i} AS (
  SELECT id, uvec, cid, d FROM (
    SELECT u.id, u.uvec, c.cid, {d2} AS d,
           row_number() OVER (PARTITION BY u.id ORDER BY d, c.cid) AS rn
    FROM u CROSS JOIN c{i - 1} c) WHERE rn = 1)"""
        )
        sums = ", ".join(
            f"CAST(SUM(uvec[{j + 1}]) AS BIGINT) AS s{j}"
            for j in range(dim)
        )
        mean = ", ".join(f"g.s{j} // g.n" for j in range(dim))
        ctes.append(
            f"""g{i} AS (
  SELECT cid, COUNT(*) AS n, {sums} FROM a{i} GROUP BY cid)""",
        )
        ctes.append(
            f"""c{i} AS (
  SELECT c.cid,
         CASE WHEN g.n IS NULL THEN c.cvec
              ELSE list_value({mean}) END AS cvec
  FROM c{i - 1} c LEFT JOIN g{i} g USING (cid))"""
        )
    # final assignment under the post-update centroids (= what the Spark
    # side returns after its last round)
    ctes.append(
        f"""afin AS (
  SELECT id, cid, d FROM (
    SELECT u.id, c.cid, {d2} AS d,
           row_number() OVER (PARTITION BY u.id ORDER BY d, c.cid) AS rn
    FROM u CROSS JOIN c{n_iter} c) WHERE rn = 1)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id AS {id_col}, cid, d AS dist2_units FROM afin"
    )


def semantic_dedup(
    df: DataFrame,
    *,
    k: int = 8,
    n_iter: int = 2,
    eps: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings with k-means,
    then within each cluster drop every item whose rounded cosine to a
    SMALLER-id cluster-mate reaches ``eps`` — the deterministic stand-in
    for "keep one representative per semantic-duplicate set".  Returns
    ``(id, cid, keep)`` for every input row.

    Scale shape: the quadratic step is cluster-blocked (self-join keyed
    on cid) — with k sized ~sqrt(n) clusters stay small and the pair work
    is bounded per task; a pathological hot cluster wants the exact
    chunk-grid decomposition used by ``dedup.embedding_dup_pairs``, which
    spreads an n² block over (n/chunk)² tasks.  Cosine runs on the
    original float vectors (rounded to 6 dp before the threshold compare,
    the repo-wide score discipline)."""
    from inception_spark.functions.vectors import cosine

    assign = kmeans_train(
        df, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col
    ).select(id_col, "cid")
    a = df.select(F.col(id_col), F.col(vec_col)).join(assign, id_col)
    left = a.select(
        F.col("cid"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
    )
    right = a.select(
        F.col("cid"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
    )
    dups = (
        left.join(right, "cid")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.coalesce(
                F.round(cosine(F.col("va"), F.col("vb")), 6), F.lit(-2.0)
            )
            >= F.lit(float(eps))
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        assign.join(dups.withColumn("dup", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cid",
            F.coalesce(~F.col("dup"), F.lit(True)).alias("keep"),
        )
    )


def semantic_dedup_sql(
    table: str = "embeddings",
    *,
    k: int = 8,
    n_iter: int = 2,
    eps: float = 0.5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin: k-means replay + the same cluster-blocked pair scan."""
    from inception_spark.functions.vectors import cosine_sql

    km = kmeans_train_sql(
        table,
        k=k,
        n_iter=n_iter,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
    )
    cs = cosine_sql("a.vb_a", "b.vb_b")
    return f"""
WITH assign AS ({km}),
j AS (
  SELECT t.{id_col} AS id, s.cid, t.{vec_col} AS v
  FROM {table} t JOIN assign s ON t.{id_col} = s.{id_col}),
dups AS (
  SELECT DISTINCT b.id_b AS id
  FROM (SELECT cid, id AS id_a, v AS vb_a FROM j) a
  JOIN (SELECT cid, id AS id_b, v AS vb_b FROM j) b USING (cid)
  WHERE a.id_a < b.id_b
    AND COALESCE(round({cs}, 6), -2.0) >= {eps})
SELECT s.{id_col}, s.cid, d.id IS NULL AS keep
FROM assign s LEFT JOIN dups d ON s.{id_col} = d.id
"""
