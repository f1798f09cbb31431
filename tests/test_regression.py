"""Closed-form OLS: the Cramer solve equals numpy least squares, R²
behaves, degenerate inputs stay defined."""

import numpy as np


def test_ols_matches_numpy(spark):
    from inception_spark.operators.regression import ols_fit

    rng = np.random.default_rng(7)
    x1 = rng.uniform(0, 10, 300)
    x2 = rng.uniform(-5, 5, 300)
    y = 2.5 + 1.25 * x1 - 0.75 * x2 + rng.normal(0, 0.5, 300)
    rows = [
        (round(float(a), 4), round(float(b), 4), round(float(c), 4))
        for a, b, c in zip(y, x1, x2)
    ]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    [row] = ols_fit(df, y_col="y", x1_col="x1", x2_col="x2").collect()
    X = np.column_stack(
        [np.ones(300), [r[1] for r in rows], [r[2] for r in rows]]
    )
    beta, *_ = np.linalg.lstsq(X, np.array([r[0] for r in rows]),
                               rcond=None)
    assert abs(row["beta0"] - beta[0]) < 1e-4
    assert abs(row["beta1"] - beta[1]) < 1e-4
    assert abs(row["beta2"] - beta[2]) < 1e-4
    assert 0.9 < row["r2"] <= 1.0
    assert row["n"] == 300


def test_ols_perfect_fit_and_null_rows(spark):
    from inception_spark.operators.regression import ols_fit

    rows = [(1.0 + 2.0 * i + 3.0 * (i % 5), float(i), float(i % 5))
            for i in range(50)]
    rows.append((None, 1.0, 1.0))  # dropped
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    [row] = ols_fit(df, y_col="y", x1_col="x1", x2_col="x2").collect()
    assert row["n"] == 50
    assert (row["beta0"], row["beta1"], row["beta2"]) == (1.0, 2.0, 3.0)
    assert row["r2"] == 1.0


def test_ols_fit_by_groups_and_singular(spark):
    from inception_spark.operators.regression import ols_fit, ols_fit_by

    rows = []
    for i in range(60):
        rows.append(("a", 1.0 + 2.0 * i + 0.5 * (i % 7), float(i),
                     float(i % 7)))
        rows.append(("b", 5.0 - 1.0 * i + 3.0 * (i % 4), float(i),
                     float(i % 4)))
    # singular group: x1 constant
    rows += [("c", float(i), 1.0, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, y double, x1 double, x2 double")
    got = {r["g"]: r for r in ols_fit_by(
        df, group_col="g", y_col="y", x1_col="x1", x2_col="x2"
    ).collect()}
    assert (got["a"]["beta0"], got["a"]["beta1"], got["a"]["beta2"]) == (
        1.0, 2.0, 0.5)
    assert got["b"]["beta1"] == -1.0 and got["b"]["r2"] == 1.0
    assert got["c"]["beta0"] is None and got["c"]["r2"] is None
    # grouped fit of a single group == ungrouped fit
    [single] = ols_fit(
        df.filter("g = 'a'"), y_col="y", x1_col="x1", x2_col="x2"
    ).collect()
    assert (single["beta0"], single["beta1"], single["beta2"]) == (
        got["a"]["beta0"], got["a"]["beta1"], got["a"]["beta2"])


def test_ols_fit_ungrouped_singular_yields_null(spark):
    """ADVICE r7: ungrouped ols_fit on a singular design (constant x1)
    returns NULL betas like ols_fit_by, never ±Inf/NaN."""
    from inception_spark.operators.regression import ols_fit

    df = spark.createDataFrame(
        [(float(i), 1.0, float(i)) for i in range(10)],
        "y double, x1 double, x2 double",
    )
    [row] = ols_fit(df, y_col="y", x1_col="x1", x2_col="x2").collect()
    assert row["beta0"] is None and row["beta1"] is None
    assert row["beta2"] is None and row["r2"] is None
