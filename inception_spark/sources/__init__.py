"""Ingest sources: binding-free container/format readers + synthesizers.

Shared scale discipline (`fanout`): the document-family entries run a
Python-per-record synthesis/extraction pass under ``mapInPandas``.
Their input is a parquet scan, and a CONSOLIDATED drop — one big file,
as the sf0.1 fixture is — yields ~1 real split, so the whole per-record
pass degrades to effective parallelism 1 (measured r12: the ~5 ms/msg
MIME walk read 19-30 s at sf0.1; with the fan-out below, 4-6 s).
``fanout(df)`` round-robins the scan across every core BEFORE the first
Python crossing.  The shuffle moves only (doc_id, text) — pennies next
to the per-record work it parallelizes — and at 100 TB (many files) it
is equally cheap insurance against consolidated or skewed inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fanout(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Round-robin ``df`` across ``parallelism`` partitions (default:
    ``sparkContext.defaultParallelism``) so a downstream Python-heavy
    pass never inherits a single-split scan."""
    n = parallelism or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(int(n))
