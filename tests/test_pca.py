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


def test_power_component_converges_on_gapped_spectrum(spark):
    """On a corpus with a real spectral gap the T-step integer power
    iterate IS numpy's top eigenvector (up to the quantization the
    operator documents)."""
    rng = np.random.default_rng(7)
    d, n = 16, 400
    direction = rng.normal(size=d)
    direction /= np.linalg.norm(direction)
    X = rng.normal(scale=0.05, size=(n, d)) + np.outer(
        rng.normal(scale=1.0, size=n), direction
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )
    got = np.array([
        r["loading"]
        for r in sorted(
            P.pca_power_component(df).collect(), key=lambda r: r["dim"]
        )
    ])
    C = np.cov(X.astype(np.float32).astype(np.float64), rowvar=False,
               bias=True)
    vals, vecs = np.linalg.eigh(C)
    want = vecs[:, -1]
    if want[np.argmax(np.abs(want))] < 0:
        want = -want
    # got is max-abs-normalized, want is 2-norm-normalized: compare
    # directions via cosine
    cos = abs(got @ want) / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.999, cos
    # projection agrees with the numpy projection up to normalization
    proj = {
        r["vec_id"]: r["pc1"] for r in P.pca_power_project(df).collect()
    }
    scale = np.linalg.norm(got)
    ref = X.astype(np.float32).astype(np.float64) @ (got / scale)
    for i in range(n):
        assert abs(proj[i] / scale - ref[i]) < 1e-5


def test_power_component_engine_parity_sf0001(spark, emb):
    """Spark and DuckDB produce BIT-identical component and projection
    on the near-isotropic real fixture (the driver-entry contract)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    )
    sc = sorted(
        (r["dim"], r["loading"])
        for r in P.pca_power_component(emb).collect()
    )
    oc = sorted(con.execute(P.pca_power_component_sql()).fetchall())
    assert sc == oc
    sp = sorted(
        (r["vec_id"], r["pc1"])
        for r in P.pca_power_project(emb).collect()
    )
    op = sorted(con.execute(P.pca_power_project_sql()).fetchall())
    assert sp == op
    # sign fix held: the max-|loading| coordinate is positive
    assert max(sc, key=lambda t: (abs(t[1]), -t[0]))[1] > 0


def test_power_iterate_pure_python_determinism():
    """The integer iteration is reproducible and scale-normalized."""
    rows = [(i, j, round(0.01 * ((i * 7 + j * 3) % 5 - 2), 6))
            for i in range(8) for j in range(i, 8)]
    v1 = P._power_iterate(rows, 8, n_iter=12)
    v2 = P._power_iterate(rows, 8, n_iter=12)
    assert v1 == v2
    assert max(abs(x) for x in v1) == 10**9
