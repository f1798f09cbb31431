"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

For each left row, attach the single most recent right row with
``right_time <= left_time`` within the same key (the classic market-data /
feature-store lookup).  Composed entirely from built-ins:

    union-by-name (right rows tagged 0, left rows tagged 1)
      → one window per key ordered by (time, tag)       [right-first ties]
      → last(value, ignorenulls=True) carries the latest right values
      → keep left rows.

One shuffle + one sort per key — the same cost profile as a sort-merge
join, with no range-explosion.  Equivalent to DuckDB's native ``ASOF
JOIN`` (the oracle twin in __spark_entry__ uses exactly that).

Determinism note: if several right rows share (key, time), "the" as-of
match is ambiguous in any engine — pre-deduplicate the right side to one
row per (key, time) (see ``dedupe_right``) before joining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedupe_right(
    right: DataFrame, *, by: str, on: str, tie_break_desc: str
) -> DataFrame:
    """One row per (by, on): keep the row with the greatest tie_break."""
    w = Window.partitionBy(by, on).orderBy(F.desc(tie_break_desc))
    return (
        right.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    by_left: str,
    by_right: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: every left row, plus ``value_cols`` from the most
    recent right row with ``right[right_on] <= left[left_on]`` and matching
    key; NULLs when no prior right row exists."""
    l_tagged = left.withColumn("_k", F.col(by_left)).withColumn(
        "_t", F.col(left_on)
    ).withColumn("_is_left", F.lit(1))
    # carry ALL value columns as ONE struct: per-column last(ignorenulls)
    # would backfill a NULL member of the matched row from an *older* right
    # row, attributing values across different source rows.  The struct is
    # non-null for every right row (even when members are null), so the
    # carried value is always exactly the matched row.
    # NULL-key / NULL-time right rows can never legitimately match (SQL
    # equality and 'NULL <= t' are both never-true) — drop them so window
    # partitioning can't pair NULL with NULL.  Left rows with NULL time
    # are safe without special-casing: asc ordering sorts NULLs first, so
    # they precede every right row and carry nothing.
    r_tagged = (
        right.filter(
            F.col(by_right).isNotNull() & F.col(right_on).isNotNull()
        )
        .select(
            F.col(by_right).alias("_k"),
            F.col(right_on).alias("_t"),
            F.struct(*value_cols).alias("_vals"),
        )
        .withColumn("_is_left", F.lit(0))
    )

    both = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows sort before left rows at equal time → inclusive (<=) match
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_t"), F.asc("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = both.withColumn(
        "_vals", F.last(F.col("_vals"), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_is_left") == 1)
    for c in value_cols:
        out = out.withColumn(c, F.col(f"_vals.{c}"))
    return out.drop("_k", "_t", "_is_left", "_vals")
