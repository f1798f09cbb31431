"""PCA module: decimal-exact covariance vs numpy, fit/project sanity."""

import numpy as np
import pytest

from inception_spark.operators import pca as P


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).cache()


def test_covariance_matches_numpy(spark, emb):
    """Relational decimal-sum covariance == numpy covar_pop to the
    6-decimal rounding the operator promises."""
    pdf = emb.toPandas()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    want = np.cov(X, rowvar=False, bias=True)
    got = {(r.i, r.j): r.cov for r in P.embedding_covariance(emb).collect()}
    assert len(got) == 64 * 65 // 2
    # round(·, 9) per product before the exact sum perturbs the result
    # by <= n*1e-9/n; the 6-dp output leaves ~1e-6 slack
    mx = max(abs(got[(i, j)] - want[i, j]) for i in range(64) for j in range(i, 64))
    assert mx < 2e-6, mx


def test_gram_path_close_to_decimal_path(spark, emb):
    cov, n = P.covariance_gram(emb, dim=64)
    assert n == emb.count()
    rel = {(r.i, r.j): r.cov for r in P.embedding_covariance(emb).collect()}
    mx = max(abs(cov[i][j] - rel[(i, j)]) for i in range(64) for j in range(i, 64))
    assert mx < 2e-6, mx


def test_pca_fit_project_roundtrip(spark, emb):
    """Components are orthonormal, variances sorted descending, and the
    distributed projection equals the driver-side matmul."""
    comps, ev = P.pca_fit(emb, dim=64, k=5)
    assert comps.shape == (5, 64)
    assert np.allclose(comps @ comps.T, np.eye(5), atol=1e-9)
    assert all(ev[i] >= ev[i + 1] for i in range(4))
    # sign convention: largest-|coord| positive
    for row in comps:
        assert row[np.argmax(np.abs(row))] > 0
    proj = {
        r.vec_id: np.array(r.pc)
        for r in P.pca_project(emb, comps).select("vec_id", "pc").collect()
    }
    pdf = emb.toPandas()
    for vid, vec in zip(pdf["vec_id"], pdf["embedding"]):
        want = comps @ np.asarray(vec, dtype=np.float64)
        assert np.allclose(proj[vid], want, atol=1e-9)


def test_pca_variance_recovers_planted_direction(spark):
    """A corpus with one dominant planted direction: PC1 must align
    with it and carry most of the variance."""
    rng = np.random.default_rng(7)
    d, n = 16, 400
    u = np.zeros(d); u[3] = 1.0
    X = rng.normal(0, 0.05, (n, d)) + np.outer(rng.normal(0, 2.0, n), u)
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    comps, ev = P.pca_fit(df, dim=d, k=2)
    assert abs(comps[0][3]) > 0.99
    assert ev[0] > 10 * ev[1]
