"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

For each left row, attach the single nearest right row within the same
key: most recent at-or-before (``backward``, the classic market-data /
feature-store lookup), or earliest at-or-after (``forward``), optionally
bounded by a ``tolerance`` window (pandas ``merge_asof`` surface).
Composed entirely from built-ins:

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
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """Left as-of join: every left row, plus ``value_cols`` from the
    nearest right row in ``direction`` with a matching key; NULLs when
    no such right row exists.

    * ``direction="backward"`` (default): most recent right row with
      ``right_time <= left_time`` — the market-data/feature-store
      lookup.
    * ``direction="forward"``: earliest right row with ``right_time >=
      left_time`` — next-scheduled-event attribution.  Same plan shape,
      descending window order.
    * ``tolerance``: a Column/literal interval (or numeric delta for
      numeric time columns); matches farther than ``tolerance`` from
      the left time null out — pandas ``merge_asof`` semantics.  The
      window still carries the nearest candidate; tolerance is a
      post-filter on the matched row's own time, so it costs one
      comparison, not a second window."""
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join: direction must be 'backward' or 'forward', "
            f"got {direction!r}"
        )
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
            F.struct(
                F.col(right_on).alias("_rt"), *[F.col(c) for c in value_cols]
            ).alias("_vals"),
        )
        .withColumn("_is_left", F.lit(0))
    )

    both = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows sort before left rows at equal time → inclusive match
    # (backward: ascending time; forward: descending time — "the nearest
    # right row at or after" becomes "the last right row seen so far")
    order_t = F.asc("_t") if direction == "backward" else F.desc("_t")
    w = (
        Window.partitionBy("_k")
        .orderBy(order_t, F.asc("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = both.withColumn(
        "_vals", F.last(F.col("_vals"), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_is_left") == 1)
    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, F.Column) else F.lit(
            tolerance
        )
        gap = (
            F.col("_t") - F.col("_vals._rt")
            if direction == "backward"
            else F.col("_vals._rt") - F.col("_t")
        )
        out = out.withColumn(
            "_vals",
            F.when(gap <= tol, F.col("_vals")).otherwise(
                F.lit(None).cast(out.schema["_vals"].dataType)
            ),
        )
    for c in value_cols:
        out = out.withColumn(c, F.col(f"_vals.{c}"))
    return out.drop("_k", "_t", "_is_left", "_vals")
