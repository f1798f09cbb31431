"""Principal component analysis over an embedding column, Spark-first.

The reference (freelawproject/inception) has no linear-algebra surface at
all (SURVEY.md §2.5); this module is part of the out-of-reference
training-data-pipeline family: dimensionality reduction for embedding
columns (whitening before ANN indexing, variance auditing, OPQ-style
rotations all start from the same covariance).

Two covariance paths, same answer:

* :func:`embedding_covariance` — the ORACLE-matched path: a double
  posexplode (dim i, then the tail slice for j >= i — no self-join,
  no pre-aggregate shuffle), then a grouped aggregate.  Every cross-row sum goes through
  ``round(product * 1e9) -> int64`` fixed-point so the result is EXACT
  integer arithmetic — independent of partitioning and summation order,
  hence bit-identical to the DuckDB twin.  Shuffle volume is d*(d+1)/2 rows
  per partition (partial aggregation collapses map-side); the row
  amplification (n * d^2/2 intermediate rows) is CPU, not shuffle.
  Fixed-point long partials re-sum as DECIMAL(38,0) across partitions,
  so no corpus size overflows the grand total.
* :func:`covariance_gram` — the SCALE path: one numpy ``X.T @ X`` per
  Arrow batch via mapInPandas (d x d floats per partition), summed in a
  single reduce.  ~d^2/2x less CPU than the relational path at identical
  asymptotic shuffle cost, but float summation order varies with
  partitioning, so it is approx-equal, not hash-equal (pytest pins
  closeness to the decimal path).

Eigendecomposition is DRIVER-side numpy over the d x d matrix — d^2 is
control-plane sized (64^2 here; even d=4096 is 128 MB) — and the
projection back over the corpus is a broadcast matmul per Arrow batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

def embedding_covariance(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Upper-triangle covariance entries (i, j, cov), i <= j, 0-based
    dims, cov rounded to 6 decimals.  Population covariance
    (divide by n), matching ``covar_pop``.

    Determinism contract: products are computed in float64 (identical
    IEEE results per row in any engine), scaled to fixed-point int64 at
    1e-9 resolution, then summed exactly (per-partition longs, decimal
    re-sum) — integer arithmetic from there on, so partitioning cannot
    move the answer.

    Composed from :func:`_cov_marg` + :func:`_cov_pairs` +
    :func:`_cov_finalize`; the partials are EXACT mergeable counter
    tables (decimal sums), so the same three pieces also run
    incrementally / in-stream (streaming_embedding_covariance entry)
    with bit-identical results — any regrouping of rows into batches
    re-sums to the same integers.
    """
    return _cov_finalize(
        _cov_marg(df, vec_col=vec_col), _cov_pairs(df, vec_col=vec_col)
    )


_DEC38 = "decimal(38,0)"


def _s9(c: Column) -> Column:
    """float64 → fixed-point int64 at 1e-9 resolution (the exactness
    boundary: everything after this is integer arithmetic)."""
    return F.round(c * F.lit(1e9), 0).cast("long")


def _cov_pairs(df: DataFrame, *, vec_col: str = "embedding") -> DataFrame:
    """(i, j, sxy DECIMAL(38,0)) upper-triangle fixed-point product
    sums — a mergeable counter table."""
    # upper-triangle pairs by DOUBLE EXPLODE, not a self-join: explode
    # dim i carrying the vector along, then explode the tail slice for
    # j >= i.  Zero shuffles before the 2080-group partial aggregate —
    # the join variant shuffled n*d rows twice and built the n*d^2/2
    # rows through a hash join (measured 9.1 s -> 2.5 s at sf0.1).
    ex = df.select(
        F.col(vec_col).alias("_v"),
        F.posexplode(F.col(vec_col)).alias("i", "xi"),
    ).select(
        "i",
        F.col("xi").cast("double").alias("xi"),
        F.posexplode(
            F.slice(F.col("_v"), F.col("i") + 1, F.size(F.col("_v")) - F.col("i"))
        ).alias("jo", "xj"),
    )
    # fixed-point int64 at 1e-9 resolution instead of DECIMAL(38,9) per
    # row: decimal128 arithmetic dominated the aggregate (9.0 s vs
    # 2.6 s at sf0.1).  Level 1 sums longs per (Spark partition, i, j)
    # — exact while a partition stays under ~9e8 rows x unit-scale
    # values (128 MB maxPartitionBytes keeps real partitions ~1000x
    # below that) — level 2 re-sums the per-partition subtotals as
    # DECIMAL(38,0), so the grand total never overflows at any corpus
    # size and stays exact integer arithmetic throughout.
    pairs = ex.select(
        F.spark_partition_id().alias("_pid"),
        F.col("i"),
        (F.col("i") + F.col("jo")).alias("j"),
        _s9(F.col("xi") * F.col("xj").cast("double")).alias("xy9"),
    )
    part = pairs.groupBy("_pid", "i", "j").agg(F.sum("xy9").alias("pxy"))
    return part.groupBy("i", "j").agg(
        F.sum(F.col("pxy").cast(_DEC38)).alias("sxy")
    )


def _cov_marg(df: DataFrame, *, vec_col: str = "embedding") -> DataFrame:
    """(i, sx DECIMAL(38,0), n LONG) fixed-point marginal sums — a
    mergeable counter table."""
    # marginal sums S_x(i) and n don't depend on j — one d-group pass
    # over n*d rows instead of repeating them across all d^2/2 pairs
    marg1 = df.select(
        F.spark_partition_id().alias("_pid"),
        F.posexplode(F.col(vec_col)).alias("i", "xi"),
    ).select(
        "_pid", "i", _s9(F.col("xi").cast("double")).alias("x9")
    ).groupBy("_pid", "i").agg(
        F.sum("x9").alias("px"), F.count(F.lit(1)).alias("pn")
    )
    return marg1.groupBy("i").agg(
        F.sum(F.col("px").cast(_DEC38)).alias("sx"),
        F.sum("pn").alias("n"),
    )


def cov_merge(marg_parts: DataFrame, pair_parts: DataFrame):
    """Merge appended partial tables (any number of batches) back into
    one (marg, pairs) — decimal/long sums, so the merge is exact and
    order-independent: partials(A ∪ B) ≡ merge(partials(A),
    partials(B))."""
    marg = marg_parts.groupBy("i").agg(
        F.sum(F.col("sx").cast(_DEC38)).alias("sx"),
        F.sum("n").cast("long").alias("n"),
    )
    pairs = pair_parts.groupBy("i", "j").agg(
        F.sum(F.col("sxy").cast(_DEC38)).alias("sxy")
    )
    return marg, pairs


def _cov_finalize(marg: DataFrame, agg: DataFrame) -> DataFrame:
    """(marg, pairs) counter tables → (i, j, cov) 6-dp entries."""
    e9 = F.lit(1e9)
    mi = marg.select(
        F.col("i").alias("_mi"), F.col("sx").alias("sx"), F.col("n").alias("n")
    )
    mj = marg.select(F.col("i").alias("_mj"), F.col("sx").alias("sy"))
    return (
        agg.join(F.broadcast(mi), agg["i"] == mi["_mi"])
        .join(F.broadcast(mj), agg["j"] == mj["_mj"])
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            F.round(
                (
                    F.col("sxy").cast("double") / e9
                    - (F.col("sx").cast("double") / e9)
                    * (F.col("sy").cast("double") / e9)
                    / F.col("n").cast("double")
                )
                / F.col("n").cast("double"),
                6,
            ).alias("cov"),
        )
    )


def embedding_covariance_sql(
    table: str = "embeddings", *, vec_col: str = "embedding", dim: int = 64
) -> str:
    """DuckDB twin of :func:`embedding_covariance` — same fixed-point
    int64 sums, 1-based lists mapped to 0-based dims."""
    return f"""
WITH x AS (
  SELECT vec_id AS rid, u.i - 1 AS dim,
         CAST({vec_col}[u.i] AS DOUBLE) AS xv
  FROM {table}, LATERAL (SELECT unnest(range(1, {dim + 1})) AS i) u),
marg AS (
  SELECT dim, SUM(CAST(round(xv * 1e9, 0) AS BIGINT)) AS sx,
         COUNT(*) AS n
  FROM x GROUP BY dim),
pairs AS (
  SELECT a.dim AS i, b.dim AS j,
         CAST(round(a.xv * b.xv * 1e9, 0) AS BIGINT) AS xy9
  FROM x a JOIN x b ON a.rid = b.rid AND a.dim <= b.dim),
agg AS (
  SELECT i, j, SUM(xy9) AS sxy FROM pairs GROUP BY i, j)
SELECT CAST(agg.i AS BIGINT) AS i, CAST(agg.j AS BIGINT) AS j,
       round((CAST(sxy AS DOUBLE) / 1e9
              - (CAST(mi.sx AS DOUBLE) / 1e9)
                * (CAST(mj.sx AS DOUBLE) / 1e9)
                / CAST(mi.n AS DOUBLE))
             / CAST(mi.n AS DOUBLE), 6) + 0.0 AS cov
FROM agg
JOIN marg mi ON mi.dim = agg.i
JOIN marg mj ON mj.dim = agg.j
"""


def covariance_gram(
    df: DataFrame, *, vec_col: str = "embedding", dim: int
) -> "tuple":
    """Scale-path covariance: per-batch numpy Gram sums via mapInPandas
    (one d x d partial per Arrow batch crosses the wire), combined
    driver-side.  Returns (cov ndarray d x d, n).  Approx-equal to
    :func:`embedding_covariance` (float summation order varies)."""
    import numpy as np
    import pandas as pd

    def gram(batches):
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [m.shape[0]],
                    "s": [m.sum(axis=0).tolist()],
                    "g": [(m.T @ m).reshape(-1).tolist()],
                }
            )

    parts = (
        df.select(vec_col)
        .mapInPandas(gram, schema="n long, s array<double>, g array<double>")
        .collect()
    )
    n = sum(r["n"] for r in parts)
    if n == 0:
        raise ValueError("covariance_gram: empty input")
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    g = np.sum([np.array(r["g"]).reshape(dim, dim) for r in parts], axis=0)
    mu = s / n
    return g / n - np.outer(mu, mu), n


def pca_fit(
    df: DataFrame, *, vec_col: str = "embedding", dim: int, k: int = 8
) -> "tuple":
    """Top-k principal components from the Gram-path covariance:
    returns (components k x d ndarray, explained_variance k,).
    Eigenvectors' sign is fixed (largest-|coord| positive) so results
    are reproducible."""
    import numpy as np

    cov, _n = covariance_gram(df, vec_col=vec_col, dim=dim)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for r in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    return comps, vals[order]


def pca_project(
    df: DataFrame,
    components,
    *,
    vec_col: str = "embedding",
    out_col: str = "pc",
) -> DataFrame:
    """Project the corpus onto fitted components: broadcast the k x d
    matrix into a mapInPandas matmul (one numpy gemm per Arrow batch —
    the embarrassingly-parallel half of PCA)."""
    import numpy as np
    import pandas as pd

    comp = [list(map(float, row)) for row in components]
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, {out_col} array<double>"

    def proj(batches):
        c = np.array(comp)
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            pdf = pdf.copy()
            pdf[out_col] = (m @ c.T).tolist()
            yield pdf

    return df.mapInPandas(proj, schema=schema)


# ---------------------------------------------------------------------------
# Oracle-expressible top component: exact integer power iteration
# ---------------------------------------------------------------------------
#
# numpy's eigh (pca_fit) cannot be replayed by a SQL oracle.  This is
# the ORACLE twin: T power-iteration steps over the fixed-point exact
# covariance, carried out ENTIRELY in integer arithmetic so both
# engines produce bit-identical vectors:
#
#   C6[i][j] = round(cov * 1e6)          -- exact: cov is 6-dp rounded
#   v_0      = [scale] * d
#   w        = C6 @ v                    -- bigint products, exact sums
#   v'       = sign(w) * (|w| * scale // max|w|)   -- trunc-div on abs
#                                        -- (Python // floors, DuckDB //
#                                        -- truncates: they agree only
#                                        -- on non-negative operands)
#   sign fix: the coordinate of largest |v| (ties -> lowest dim) ends
#   positive.
#
# The iterate converges to the top eigenvector geometrically in the
# spectral gap (pinned against numpy eigh on a gapped fixture in
# tests/test_pca.py); on a near-isotropic corpus it is still a
# well-defined deterministic operator (the driver checks parity, not
# spectral optimality).  Spark-side the iteration is DRIVER-side over
# the collected d(d+1)/2 covariance rows (control-plane, the kmeans
# precedent); the corpus-sized work — covariance + projection — stays
# distributed.

def _power_iterate(
    cov_rows, dim: int, *, n_iter: int = 16, scale: int = 10**9
) -> list:
    """(i, j, cov) upper-triangle rows -> integer component vector
    (scale-normalized, max |coord| == scale, sign-fixed)."""
    c6 = [[0] * dim for _ in range(dim)]
    for i, j, cov in cov_rows:
        q = int(round(cov * 1e6))
        c6[i][j] = q
        c6[j][i] = q
    v = [scale] * dim
    for _ in range(n_iter):
        w = [sum(c6[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(x) for x in w)
        if m == 0:
            raise ValueError("pca_power: zero covariance matrix")
        v = [
            (abs(x) * scale // m) * (1 if x >= 0 else -1) for x in w
        ]
    bi = max(range(dim), key=lambda i: (abs(v[i]), -i))
    if v[bi] < 0:
        v = [-x for x in v]
    return v


def pca_power_component(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 16,
    scale: int = 10**9,
) -> DataFrame:
    """(dim, loading): the sign-fixed T-step power iterate of the exact
    fixed-point covariance.  loading = v/scale emitted WITHOUT further
    rounding — v/1e9 is one IEEE division of exact integers, identical
    in every engine (a 6-dp re-round would sit on half-ulp ties where
    Python's bankers rounding and SQL round() disagree)."""
    spark = df.sparkSession
    dim = len(df.select(vec_col).first()[0])
    cov_rows = [
        (r["i"], r["j"], r["cov"])
        for r in embedding_covariance(
            df, id_col=id_col, vec_col=vec_col
        ).collect()
    ]
    v = _power_iterate(cov_rows, dim, n_iter=n_iter, scale=scale)
    return spark.createDataFrame(
        [(i, x / scale) for i, x in enumerate(v)],
        "dim long, loading double",
    )


def pca_power_fit_vector(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 16,
    scale: int = 10**9,
) -> list:
    """Fit and return the raw integer component vector — the handle for
    the fit-once/project-many shape (pass to
    :func:`pca_power_project`'s ``component=``)."""
    dim = len(df.select(vec_col).first()[0])
    cov_rows = [
        (r["i"], r["j"], r["cov"])
        for r in embedding_covariance(
            df, id_col=id_col, vec_col=vec_col
        ).collect()
    ]
    return _power_iterate(cov_rows, dim, n_iter=n_iter, scale=scale)


def pca_power_project(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 16,
    scale: int = 10**9,
    component: list | None = None,
) -> DataFrame:
    """(id, pc1): project every vector onto the power-iteration
    component — a LITERAL unrolled fixed-point dot product (the kmeans
    literal-centroid pattern): per-term round(x_j * v_j/scale * 1e9)
    -> int64, summed exactly, one division out.  Pure whole-stage
    codegen projection: no shuffle, no explode amplification, no UDF;
    at 100 TB this is a map-only pass.  sum9/1e9 stays < 2^53 so the
    final division is one exact-rounded IEEE op, no rounding step.

    ``component`` takes a previously-fitted integer vector (the
    fit-once/project-many serving shape: the covariance pass runs once,
    then every ingest batch projects map-only); omitted, the fit runs
    here."""
    if component is not None:
        v = list(component)
        dim = len(v)
    else:
        dim = len(df.select(vec_col).first()[0])
        cov_rows = [
            (r["i"], r["j"], r["cov"])
            for r in embedding_covariance(
                df, id_col=id_col, vec_col=vec_col
            ).collect()
        ]
        v = _power_iterate(cov_rows, dim, n_iter=n_iter, scale=scale)
    terms = [
        F.round(
            F.col(vec_col)[j].cast("double")
            * F.lit(v[j] / scale)
            * F.lit(1e9),
            0,
        ).cast("long")
        for j in range(dim)
    ]
    sum9 = terms[0]
    for t in terms[1:]:
        sum9 = sum9 + t
    return df.select(
        F.col(id_col),
        (sum9.cast("double") / F.lit(1e9)).alias("pc1"),
    )


def _power_cte_sql(
    table: str, *, vec_col: str, dim: int, n_iter: int, scale: int
) -> str:
    """The shared CTE chain: covq (exact covariance) -> unrolled
    integer power steps -> comp(dim, v).  AS MATERIALIZED throughout —
    DuckDB inlines plain CTEs per reference and an unrolled iteration
    explodes combinatorially otherwise."""
    cov_sql = embedding_covariance_sql(table, vec_col=vec_col, dim=dim)
    steps = [
        f"""v0 AS MATERIALIZED (
  SELECT i AS dim, CAST({scale} AS BIGINT) AS v
  FROM (SELECT DISTINCT i FROM covq))"""
    ]
    for t in range(1, n_iter + 1):
        steps.append(f"""w{t} AS MATERIALIZED (
  SELECT c.i AS dim, CAST(SUM(c.c6 * v.v) AS BIGINT) AS w
  FROM cmat c JOIN v{t - 1} v ON v.dim = c.j GROUP BY c.i)""")
        steps.append(f"""v{t} AS MATERIALIZED (
  SELECT dim, CAST(CASE WHEN w < 0
    THEN -((CAST(-w AS HUGEINT) * {scale}) // m)
    ELSE (CAST(w AS HUGEINT) * {scale}) // m END AS BIGINT) AS v
  FROM w{t}, (SELECT MAX(abs(w)) AS m FROM w{t}))""")
    return f"""covq AS MATERIALIZED ({cov_sql}),
cmat AS MATERIALIZED (
  SELECT i, j, CAST(round(cov * 1e6, 0) AS BIGINT) AS c6 FROM covq
  UNION ALL
  SELECT j, i, CAST(round(cov * 1e6, 0) AS BIGINT) FROM covq
  WHERE i <> j),
{','.join(steps)},
sgn AS MATERIALIZED (
  SELECT CASE WHEN (SELECT v FROM v{n_iter}
                    ORDER BY abs(v) DESC, dim ASC LIMIT 1) < 0
         THEN -1 ELSE 1 END AS sg),
comp AS MATERIALIZED (SELECT dim, v * sg AS v FROM v{n_iter}, sgn)"""


def pca_power_component_sql(
    table: str = "embeddings",
    *,
    vec_col: str = "embedding",
    dim: int = 64,
    n_iter: int = 16,
    scale: int = 10**9,
) -> str:
    """DuckDB twin of :func:`pca_power_component`."""
    ctes = _power_cte_sql(
        table, vec_col=vec_col, dim=dim, n_iter=n_iter, scale=scale
    )
    return f"""
WITH {ctes}
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(v AS DOUBLE) / {scale} AS loading
FROM comp
"""


def pca_power_project_sql(
    table: str = "embeddings",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_iter: int = 16,
    scale: int = 10**9,
) -> str:
    """DuckDB twin of :func:`pca_power_project` — same per-term
    fixed-point rounding, same exact integer sum, same single final
    division."""
    ctes = _power_cte_sql(
        table, vec_col=vec_col, dim=dim, n_iter=n_iter, scale=scale
    )
    return f"""
WITH {ctes},
x AS (
  SELECT {id_col} AS rid, u.i - 1 AS dim,
         CAST({vec_col}[u.i] AS DOUBLE) AS xv
  FROM {table}, LATERAL (SELECT unnest(range(1, {dim + 1})) AS i) u)
SELECT x.rid AS {id_col},
       CAST(CAST(SUM(CAST(round(
           x.xv * (CAST(comp.v AS DOUBLE) / {scale}) * 1e9, 0)
         AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e9 AS pc1
FROM x JOIN comp ON comp.dim = x.dim
GROUP BY x.rid
"""
