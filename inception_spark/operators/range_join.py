"""Binned range join — the scale pattern for interval predicates.

A naive range join (``l.ts BETWEEN r.start AND r.end``) has no equi-key,
so Spark falls back to BroadcastNestedLoopJoin (fine when one side
broadcasts) or a cartesian product (catastrophic when neither does).
The binned form restores an equi-key: quantize the time axis into
fixed-width bins, explode each interval to every bin it overlaps, join
point-side ``bin`` to interval-side ``bin`` as a hash join, then verify
the exact predicate.  Work scales with |points| + |intervals| ×
(interval_width / bin_width) instead of |points| × |intervals|.

This is the standard technique behind dedicated range-join optimizers
(e.g. the interval-join pattern in stream processors); here it is plain
DataFrame ops, so the DuckDB oracle can replay the semantics as a naive
inequality join and hash-match the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_width_sec: int = 86_400,
    extra_keys: tuple[str, str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row whose
    ``[start_ts, end_ts]`` (inclusive) contains ``point_ts``, optionally
    also matching ``extra_keys = (point_col, interval_col)``.

    Output = point columns + interval columns (caller projects).  The
    exact containment predicate is re-verified after the bin equi-join,
    so ``bin_width_sec`` affects only performance (bins per interval ≈
    width/bin + 1), never results.  ``how='inner'`` only: outer variants
    would need per-point dedup of the bin fan-out on the NULL side."""
    if how != "inner":
        raise ValueError("binned_range_join supports inner joins only")
    epoch = F.unix_timestamp  # seconds since epoch, engine-stable on UTC
    p = points.withColumn(
        "_bin", (epoch(F.col(point_ts)) / F.lit(bin_width_sec)).cast("long")
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (epoch(F.col(start_ts)) / F.lit(bin_width_sec)).cast("long"),
                (epoch(F.col(end_ts)) / F.lit(bin_width_sec)).cast("long"),
            )
        ),
    )
    cond = (p["_bin"] == iv["_bin"]) & (
        p[point_ts].between(iv[start_ts], iv[end_ts])
    )
    if extra_keys is not None:
        cond = cond & (p[extra_keys[0]] == iv[extra_keys[1]])
    return p.join(iv, cond, "inner").drop("_bin")
