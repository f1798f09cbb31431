"""Principal component analysis over an embedding column, Spark-first.

The reference (freelawproject/inception) has no linear-algebra surface at
all (SURVEY.md §2.5); this module is part of the out-of-reference
training-data-pipeline family: dimensionality reduction for embedding
columns (whitening before ANN indexing, variance auditing, OPQ-style
rotations all start from the same covariance).

Two covariance paths, same answer:

* :func:`embedding_covariance` — the ORACLE-matched path: posexplode to
  (row, dim, value), self-join per row for the upper triangle, then a
  grouped aggregate.  Every cross-row sum goes through
  ``round(product, 9) -> DECIMAL(38,9)`` so the result is EXACT decimal
  arithmetic — independent of partitioning and summation order, hence
  bit-identical to the DuckDB twin.  Shuffle volume is d*(d+1)/2 rows
  per partition (partial aggregation collapses map-side); the row
  amplification (n * d^2/2 intermediate rows) is CPU, not shuffle.
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

_DEC = "decimal(38,9)"


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
    IEEE results per row in any engine), rounded to 9 decimals, then
    summed as DECIMAL(38,9) — exact integer arithmetic from there on,
    so partitioning cannot move the answer.
    """
    x = df.select(
        F.col(id_col).alias("_rid"),
        F.posexplode(F.col(vec_col)).alias("i", "xi"),
    ).withColumn("xi", F.col("xi").cast("double"))
    a, b = x.alias("a"), x.alias("b")
    pairs = a.join(
        b,
        (F.col("a._rid") == F.col("b._rid")) & (F.col("a.i") <= F.col("b.i")),
    ).select(
        F.col("a.i").alias("i"),
        F.col("b.i").alias("j"),
        F.round(F.col("a.xi") * F.col("b.xi"), 9).cast(_DEC).alias("xy"),
        F.round(F.col("a.xi"), 9).cast(_DEC).alias("x"),
        F.round(F.col("b.xi"), 9).cast(_DEC).alias("y"),
    )
    agg = pairs.groupBy("i", "j").agg(
        F.sum("xy").alias("sxy"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        F.round(
            (
                F.col("sxy").cast("double")
                - F.col("sx").cast("double")
                * F.col("sy").cast("double")
                / F.col("n").cast("double")
            )
            / F.col("n").cast("double"),
            6,
        ).alias("cov"),
    )


def embedding_covariance_sql(
    table: str = "embeddings", *, vec_col: str = "embedding", dim: int = 64
) -> str:
    """DuckDB twin of :func:`embedding_covariance` — same
    round-then-decimal sums, 1-based lists mapped to 0-based dims."""
    return f"""
WITH x AS (
  SELECT vec_id AS rid, u.i - 1 AS dim,
         CAST({vec_col}[u.i] AS DOUBLE) AS xv
  FROM {table}, LATERAL (SELECT unnest(range(1, {dim + 1})) AS i) u),
pairs AS (
  SELECT a.dim AS i, b.dim AS j,
         CAST(round(a.xv * b.xv, 9) AS DECIMAL(38,9)) AS xy,
         CAST(round(a.xv, 9) AS DECIMAL(38,9)) AS x,
         CAST(round(b.xv, 9) AS DECIMAL(38,9)) AS y
  FROM x a JOIN x b ON a.rid = b.rid AND a.dim <= b.dim),
agg AS (
  SELECT i, j, SUM(xy) AS sxy, SUM(x) AS sx, SUM(y) AS sy,
         COUNT(*) AS n
  FROM pairs GROUP BY i, j)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       round((CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                / CAST(n AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS cov
FROM agg
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
