"""Declarative data-quality expectations, evaluated in ONE pass.

The step every large-scale ingest pipeline runs before anything else:
assert schema-level invariants (null rates, ranges, domains, uniqueness,
regex shape) over billions of rows without one job per rule.  The whole
rule set compiles to a single conditional aggregation — Catalyst sees one
scan, partial aggregation makes the shuffle carry one row per partition,
and adding a rule adds a column to the aggregate, not a pass over the
data.  Uniqueness rules add the standard distinct expand; everything
else is a ``SUM(CASE WHEN ...)``.

Two surfaces:

* :func:`check_expectations` — the audit report: one row per rule with
  its violation count over the full input (the Great-Expectations /
  dbt-test shape, minus the framework).
* :func:`quarantine_violations` — the row router: rows failing any
  row-level rule, tagged with a deterministic comma-joined list of the
  rules they broke (a string, not an array — engines hash array cells
  differently, strings compare exactly).

Rules are plain tuples so the surface stays declarative and the oracle
twin in ``__spark_entry__.py`` can replay each predicate verbatim:

    (name, kind, column, *params) with kind one of
    ``not_null | unique | in_range | in_set | matches | min_length``

Scale: one shuffle for the report (a global aggregate), zero shuffles
for quarantine (a pure filter+project — fully pushdown-friendly).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Rule = tuple


def _violation_expr(rule: Rule) -> F.Column:
    """Boolean column: TRUE when the row violates the rule.

    NULL handling is deliberate: for value rules (range/set/regex/
    length) a NULL value does NOT count as a violation — nullability is
    ``not_null``'s job, so each rule reports its own dimension and a
    single bad row can be counted by several rules without double
    meaning."""
    name, kind, col = rule[0], rule[1], rule[2]
    c = F.col(col)
    if kind == "not_null":
        return c.isNull()
    if kind == "in_range":
        lo, hi = rule[3], rule[4]
        return c.isNotNull() & ~c.between(lo, hi)
    if kind == "in_set":
        values = rule[3]
        return c.isNotNull() & ~c.isin(*list(values))
    if kind == "matches":
        pattern = rule[3]
        return c.isNotNull() & ~c.rlike(pattern)
    if kind == "min_length":
        n = rule[3]
        return c.isNotNull() & (F.length(c) < F.lit(int(n)))
    raise ValueError(f"unknown expectation kind for rule {name!r}: {kind}")


def check_expectations(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """→ (rule, kind, col, violations, total, passed) — one row per
    rule, one scan over the input.

    Row-level rules become conditional sums inside one hash aggregate.
    ``unique`` rules count duplicate *rows* (``total_non_null -
    distinct``), joining the same single-job aggregate via Spark's
    multi-distinct rewrite (one Expand, still one logical pass).  The
    per-rule rows are assembled driver-side from the 1-row aggregate —
    |rules| is small by definition; the DATA is never collected."""
    names = [rule[0] for rule in rules]
    dupes = sorted({n for n in names if names.count(n) > 1})
    if dupes:
        # aggregate aliases key on rule name: a duplicate would silently
        # report the FIRST rule's count for both (Row[name] returns the
        # first match, no error)
        raise ValueError(
            f"check_expectations: duplicate rule name(s) {dupes}; "
            "rule names must be unique"
        )
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__total")]
    for rule in rules:
        name, kind, col = rule[0], rule[1], rule[2]
        if kind == "unique":
            aggs.append(
                (
                    F.count(F.col(col)) - F.countDistinct(F.col(col))
                ).alias(f"__v_{name}")
            )
        else:
            aggs.append(
                F.sum(
                    F.when(_violation_expr(rule), 1).otherwise(0)
                ).alias(f"__v_{name}")
            )
    row = df.agg(*aggs).head()
    total = row["__total"]
    spark = df.sparkSession
    out = [
        (
            rule[0],
            rule[1],
            rule[2],
            int(row[f"__v_{rule[0]}"] or 0),
            int(total),
            int(row[f"__v_{rule[0]}"] or 0) == 0,
        )
        for rule in rules
    ]
    return spark.createDataFrame(
        out, "rule string, kind string, col string, "
             "violations long, total long, passed boolean"
    )


def quarantine_violations(
    df: DataFrame, rules: Sequence[Rule], *, keep_passing: bool = False
) -> DataFrame:
    """Tag every row with the comma-joined names of the row-level rules
    it violates (``unique`` is a set-level property and is skipped), and
    return the violating rows (or all rows when ``keep_passing``).

    Zero shuffles: a filter + projection that Catalyst pushes into the
    scan — the 100 TB-safe shape for a reject-file side output."""
    row_rules = [r for r in rules if r[1] != "unique"]
    if not row_rules:
        raise ValueError("quarantine_violations needs ≥1 row-level rule")
    tags = [
        F.when(_violation_expr(r), F.lit(r[0])) for r in row_rules
    ]
    # concat_ws skips NULL arguments in both Spark and DuckDB, so the
    # tag list needs no explicit compaction and the oracle twin is a
    # verbatim replay
    tagged = df.withColumn("violated_rules", F.concat_ws(",", *tags))
    if keep_passing:
        return tagged
    return tagged.filter(F.col("violated_rules") != "")
