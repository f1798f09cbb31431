"""Closed-form OLS linear regression — normal equations in ONE pass.

The trainable-in-engine regression companion to the iterative models
(``classify.lr_quality_classify``'s GD rounds, ``clustering.kmeans``'s
Lloyd rounds): for a 2-feature model with intercept the normal-equation
system is 3×3, so the fit is ONE hash aggregate of 9 exact decimal
moments followed by a literal Cramer's-rule solve over that single row —
no iterations, no driver round trips, no shuffle beyond the one
aggregate.  This is how you fit millions of per-group trend lines at
100 TB (the aggregate is algebraic → map-side partial combine), where
gradient descent's per-round job launch would drown the work.

Determinism engineering (the repo discipline): every moment is a
``DECIMAL(38,6)`` sum of 6-dp-rounded terms — exact and order
independent — cast to double ONCE; the determinant expressions are then
identical IEEE arithmetic in Spark and DuckDB, and the R² residual sum
re-rounds per-row squared errors to 6 dp before its exact decimal sum.

Reference scope note: the reference service (SURVEY.md §2) has no ML
surface; this extends the training-data-pipeline mandate (quality
trend fitting, per-source drift slopes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_D6 = "decimal(38,6)"


def _m(term):
    """6-dp-rounded exact-decimal sum of a per-row term."""
    return F.sum(F.round(term, 6).cast(_D6)).cast("double")


def ols_fit(
    df: DataFrame, *, y_col: str, x1_col: str, x2_col: str
) -> DataFrame:
    """OLS fit of ``y ~ b0 + b1*x1 + b2*x2`` → ONE row
    ``(n, beta0, beta1, beta2, r2)`` (coefficients and R² rounded to
    6 dp).

    Pass 1: the 9 normal-equation moments as one aggregate.  The 3×3
    system solves by Cramer's rule as plain column arithmetic over that
    single row.  Pass 2 (for R² only): betas broadcast back over the
    rows, per-row squared residuals re-rounded and decimal-summed."""
    y, x1, x2 = F.col(y_col), F.col(x1_col), F.col(x2_col)
    rows = df.select(
        y.cast("double").alias("y"),
        x1.cast("double").alias("x1"),
        x2.cast("double").alias("x2"),
    ).filter(
        F.col("y").isNotNull()
        & F.col("x1").isNotNull()
        & F.col("x2").isNotNull()
    )
    m = rows.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        _m(F.col("x1")).alias("s1"),
        _m(F.col("x2")).alias("s2"),
        _m(F.col("y")).alias("sy"),
        _m(F.col("x1") * F.col("x1")).alias("s11"),
        _m(F.col("x1") * F.col("x2")).alias("s12"),
        _m(F.col("x2") * F.col("x2")).alias("s22"),
        _m(F.col("x1") * F.col("y")).alias("s1y"),
        _m(F.col("x2") * F.col("y")).alias("s2y"),
    )
    # A = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]], b = [sy, s1y, s2y]
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    sy, s1y, s2y = F.col("sy"), F.col("s1y"), F.col("s2y")

    def det3(a, b, c, d, e, f_, g, h, i):
        return a * (e * i - f_ * h) - b * (d * i - f_ * g) + c * (
            d * h - e * g
        )

    det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    # singular design (constant feature, n < 3, collinear x1/x2) →
    # NULL betas, never ±Inf/NaN — mirrors ols_fit_by's guard
    safe = F.when(det != 0, det)
    b0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / safe
    b1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22) / safe
    b2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y) / safe
    betas = m.select(
        F.col("n").cast("long").alias("n"),
        F.round(b0, 6).alias("beta0"),
        F.round(b1, 6).alias("beta1"),
        F.round(b2, 6).alias("beta2"),
        sy.alias("_sy"),
        (sy / n).alias("_ybar"),
    )
    resid = rows.crossJoin(F.broadcast(betas))
    fit = resid.select(
        "n",
        "beta0",
        "beta1",
        "beta2",
        "_ybar",
        (
            F.col("y")
            - (
                F.col("beta0")
                + F.col("beta1") * F.col("x1")
                + F.col("beta2") * F.col("x2")
            )
        ).alias("e"),
        (F.col("y") - F.col("_ybar")).alias("d"),
    )
    out = fit.groupBy("n", "beta0", "beta1", "beta2").agg(
        _m(F.col("e") * F.col("e")).alias("sse"),
        _m(F.col("d") * F.col("d")).alias("sst"),
    )
    return out.select(
        "n",
        "beta0",
        "beta1",
        "beta2",
        F.when(
            F.col("sst") > 0,
            F.round(F.lit(1.0) - F.col("sse") / F.col("sst"), 6),
        ).alias("r2"),
    )


def ols_fit_sql(
    table: str, *, y_col: str, x1_col: str, x2_col: str
) -> str:
    """DuckDB twin of :func:`ols_fit` — identical moment rounding and
    determinant expression structure, so the doubles match bitwise."""

    def m(term):
        return (
            f"CAST(SUM(CAST(round({term}, 6) AS DECIMAL(38,6))) "
            "AS DOUBLE)"
        )

    def det3(a, b, c, d, e, f, g, h, i):
        return (
            f"({a} * ({e} * {i} - {f} * {h}) - {b} * ({d} * {i} - {f} * {g})"
            f" + {c} * ({d} * {h} - {e} * {g}))"
        )

    det = det3("n", "s1", "s2", "s1", "s11", "s12", "s2", "s12", "s22")
    b0 = det3("sy", "s1", "s2", "s1y", "s11", "s12", "s2y", "s12", "s22")
    b1 = det3("n", "sy", "s2", "s1", "s1y", "s12", "s2", "s2y", "s22")
    b2 = det3("n", "s1", "sy", "s1", "s11", "s1y", "s2", "s12", "s2y")
    return f"""
WITH rows_t AS (
  SELECT CAST({y_col} AS DOUBLE) AS y, CAST({x1_col} AS DOUBLE) AS x1,
         CAST({x2_col} AS DOUBLE) AS x2
  FROM {table}
  WHERE {y_col} IS NOT NULL AND {x1_col} IS NOT NULL
    AND {x2_col} IS NOT NULL),
mom AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         {m('x1')} AS s1, {m('x2')} AS s2, {m('y')} AS sy,
         {m('x1 * x1')} AS s11, {m('x1 * x2')} AS s12,
         {m('x2 * x2')} AS s22, {m('x1 * y')} AS s1y,
         {m('x2 * y')} AS s2y
  FROM rows_t),
beta AS (
  SELECT CAST(n AS BIGINT) AS n,
         round({b0} / {det}, 6) AS beta0,
         round({b1} / {det}, 6) AS beta1,
         round({b2} / {det}, 6) AS beta2,
         sy / n AS ybar
  FROM mom),
resid AS (
  SELECT b.n, b.beta0, b.beta1, b.beta2,
         {m('(y - (beta0 + beta1 * x1 + beta2 * x2)) *'
            ' (y - (beta0 + beta1 * x1 + beta2 * x2))')} AS sse,
         {m('(y - ybar) * (y - ybar)')} AS sst
  FROM rows_t, beta b
  GROUP BY b.n, b.beta0, b.beta1, b.beta2)
SELECT n, beta0, beta1, beta2,
       CASE WHEN sst > 0 THEN round(CAST(1.0 AS DOUBLE) - sse / sst, 6)
       END AS r2
FROM resid
"""


def ols_fit_by(
    df: DataFrame,
    *,
    group_col: str,
    y_col: str,
    x1_col: str,
    x2_col: str,
) -> DataFrame:
    """Per-group :func:`ols_fit` — ONE moment aggregate keyed on
    ``group_col`` fits EVERY group's 3-coefficient model in the same
    two passes (this is the claim behind the module docstring: a
    million trend lines cost one grouped aggregate + one broadcast-back
    residual pass, not a million fits).  → (group, n, beta0, beta1,
    beta2, r2); groups whose design matrix is singular (det = 0, e.g.
    constant features) return NULL betas instead of poisoning the job."""
    y, x1, x2 = F.col(y_col), F.col(x1_col), F.col(x2_col)
    rows = df.select(
        F.col(group_col).alias("grp"),
        y.cast("double").alias("y"),
        x1.cast("double").alias("x1"),
        x2.cast("double").alias("x2"),
    ).filter(
        F.col("y").isNotNull()
        & F.col("x1").isNotNull()
        & F.col("x2").isNotNull()
    )
    m = rows.groupBy("grp").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        _m(F.col("x1")).alias("s1"),
        _m(F.col("x2")).alias("s2"),
        _m(F.col("y")).alias("sy"),
        _m(F.col("x1") * F.col("x1")).alias("s11"),
        _m(F.col("x1") * F.col("x2")).alias("s12"),
        _m(F.col("x2") * F.col("x2")).alias("s22"),
        _m(F.col("x1") * F.col("y")).alias("s1y"),
        _m(F.col("x2") * F.col("y")).alias("s2y"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    sy, s1y, s2y = F.col("sy"), F.col("s1y"), F.col("s2y")

    def det3(a, b, c, d, e, f_, g, h, i):
        return a * (e * i - f_ * h) - b * (d * i - f_ * g) + c * (
            d * h - e * g
        )

    det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    safe = F.when(det != 0, det)
    betas = m.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.round(
            det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / safe, 6
        ).alias("beta0"),
        F.round(
            det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22) / safe, 6
        ).alias("beta1"),
        F.round(
            det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y) / safe, 6
        ).alias("beta2"),
        (sy / n).alias("_ybar"),
    )
    joined = rows.join(betas, "grp")
    fit = joined.select(
        "grp",
        "n",
        "beta0",
        "beta1",
        "beta2",
        (
            F.col("y")
            - (
                F.col("beta0")
                + F.col("beta1") * F.col("x1")
                + F.col("beta2") * F.col("x2")
            )
        ).alias("e"),
        (F.col("y") - F.col("_ybar")).alias("d"),
    )
    out = fit.groupBy("grp", "n", "beta0", "beta1", "beta2").agg(
        _m(F.col("e") * F.col("e")).alias("sse"),
        _m(F.col("d") * F.col("d")).alias("sst"),
    )
    return out.select(
        F.col("grp").alias(group_col),
        "n",
        "beta0",
        "beta1",
        "beta2",
        F.when(
            F.col("beta0").isNotNull() & (F.col("sst") > 0),
            F.round(F.lit(1.0) - F.col("sse") / F.col("sst"), 6),
        ).alias("r2"),
    )


def ols_fit_by_sql(
    table: str,
    *,
    group_col: str,
    y_col: str,
    x1_col: str,
    x2_col: str,
) -> str:
    """DuckDB twin of :func:`ols_fit_by`."""

    def m(term):
        return (
            f"CAST(SUM(CAST(round({term}, 6) AS DECIMAL(38,6))) "
            "AS DOUBLE)"
        )

    def det3(a, b, c, d, e, f, g, h, i):
        return (
            f"({a} * ({e} * {i} - {f} * {h}) - {b} * ({d} * {i} - {f} * {g})"
            f" + {c} * ({d} * {h} - {e} * {g}))"
        )

    det = det3("n", "s1", "s2", "s1", "s11", "s12", "s2", "s12", "s22")
    b0 = det3("sy", "s1", "s2", "s1y", "s11", "s12", "s2y", "s12", "s22")
    b1 = det3("n", "sy", "s2", "s1", "s1y", "s12", "s2", "s2y", "s22")
    b2 = det3("n", "s1", "sy", "s1", "s11", "s1y", "s2", "s12", "s2y")
    return f"""
WITH rows_t AS (
  SELECT {group_col} AS grp, CAST({y_col} AS DOUBLE) AS y,
         CAST({x1_col} AS DOUBLE) AS x1, CAST({x2_col} AS DOUBLE) AS x2
  FROM {table}
  WHERE {y_col} IS NOT NULL AND {x1_col} IS NOT NULL
    AND {x2_col} IS NOT NULL),
mom AS (
  SELECT grp, CAST(COUNT(*) AS DOUBLE) AS n,
         {m('x1')} AS s1, {m('x2')} AS s2, {m('y')} AS sy,
         {m('x1 * x1')} AS s11, {m('x1 * x2')} AS s12,
         {m('x2 * x2')} AS s22, {m('x1 * y')} AS s1y,
         {m('x2 * y')} AS s2y
  FROM rows_t GROUP BY grp),
beta AS (
  SELECT grp, CAST(n AS BIGINT) AS n,
         round({b0} / (CASE WHEN {det} <> 0 THEN {det} END), 6) AS beta0,
         round({b1} / (CASE WHEN {det} <> 0 THEN {det} END), 6) AS beta1,
         round({b2} / (CASE WHEN {det} <> 0 THEN {det} END), 6) AS beta2,
         sy / n AS ybar
  FROM mom),
resid AS (
  SELECT r.grp, b.n, b.beta0, b.beta1, b.beta2,
         {m('(y - (beta0 + beta1 * x1 + beta2 * x2)) *'
            ' (y - (beta0 + beta1 * x1 + beta2 * x2))')} AS sse,
         {m('(y - ybar) * (y - ybar)')} AS sst
  FROM rows_t r JOIN beta b ON r.grp = b.grp
  GROUP BY r.grp, b.n, b.beta0, b.beta1, b.beta2)
SELECT grp AS {group_col}, n, beta0, beta1, beta2,
       CASE WHEN beta0 IS NOT NULL AND sst > 0
            THEN round(CAST(1.0 AS DOUBLE) - sse / sst, 6)
       END AS r2
FROM resid
"""
