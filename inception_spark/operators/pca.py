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

from pyspark.sql import DataFrame, functions as F

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
    """
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
    s9 = lambda c: F.round(c * F.lit(1e9), 0).cast("long")  # noqa: E731
    dec = "decimal(38,0)"
    # marginal sums S_x(i) and n don't depend on j — one d-group pass
    # over n*d rows instead of repeating them across all d^2/2 pairs
    marg1 = df.select(
        F.spark_partition_id().alias("_pid"),
        F.posexplode(F.col(vec_col)).alias("i", "xi"),
    ).select(
        "_pid", "i", s9(F.col("xi").cast("double")).alias("x9")
    ).groupBy("_pid", "i").agg(
        F.sum("x9").alias("px"), F.count(F.lit(1)).alias("pn")
    )
    marg = marg1.groupBy("i").agg(
        F.sum(F.col("px").cast(dec)).alias("sx"),
        F.sum("pn").alias("n"),
    )
    pairs = ex.select(
        F.spark_partition_id().alias("_pid"),
        F.col("i"),
        (F.col("i") + F.col("jo")).alias("j"),
        s9(F.col("xi") * F.col("xj").cast("double")).alias("xy9"),
    )
    part = pairs.groupBy("_pid", "i", "j").agg(F.sum("xy9").alias("pxy"))
    agg = part.groupBy("i", "j").agg(
        F.sum(F.col("pxy").cast(dec)).alias("sxy")
    )
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
