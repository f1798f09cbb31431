"""Training-sequence packing: assign documents to fixed-token-budget
training sequences — the step between a filtered corpus and a GPT-style
dataloader, where short documents are concatenated up to the model's
context length.

Packing discipline: **contiguous offset packing** — documents are laid
end to end in a deterministic order and a document belongs to the
sequence containing its *start* offset (``seq_id = floor(start_offset /
budget)``).  Unlike greedy first-fit (inherently sequential — each
decision depends on every prior one), this is a pure prefix-sum, so it
is one window over one sort in Spark AND expressible in plain SQL for
the oracle.  A document whose tokens straddle a boundary is assigned to
the sequence it starts in (dataloaders then either span-read or pad —
both need exactly this start-offset map).

Scale shape: the window partitions by ``part_col`` (default ``lang``),
so the prefix sum never needs a global total order — each partition
packs independently, which is also what a sharded dataloader wants.
Documents longer than the budget keep their assignment and are flagged
``oversize`` (the caller chunks them upstream; see operators/chunking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from inception_spark.functions.text_analysis import token_count


def pack_sequences(
    df: DataFrame,
    *,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    part_col: str = "lang",
) -> DataFrame:
    """→ (part, doc_id, n_tokens, start_offset, seq_id, oversize).

    ``seq_id`` is 0-based within each partition value; ``start_offset``
    is the document's first-token position in the partition's
    concatenated token stream.  Deterministic: order within a partition
    is by ``id_col``."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    toks = df.select(
        F.col(part_col).alias("part"),
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    return (
        toks.withColumn(
            "start_offset",
            F.coalesce(
                F.sum("n_tokens").over(
                    Window.partitionBy("part")
                    .orderBy("doc_id")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .withColumn(
            "seq_id", (F.col("start_offset") / F.lit(budget)).cast("long")
        )
        .withColumn("oversize", F.col("n_tokens") > budget)
        .select(
            "part", "doc_id", "n_tokens", "start_offset", "seq_id", "oversize"
        )
    )


def pack_sequences_sql(
    table: str,
    token_count_expr: str,
    *,
    budget: int = 2048,
    id_col: str = "doc_id",
    part_col: str = "lang",
) -> str:
    """DuckDB twin of :func:`pack_sequences`."""
    return f"""
WITH t AS (
  SELECT {part_col} AS part, {id_col} AS doc_id,
         CAST({token_count_expr} AS BIGINT) AS n_tokens
  FROM {table}),
o AS (
  SELECT part, doc_id, n_tokens,
         CAST(coalesce(SUM(n_tokens) OVER (
           PARTITION BY part ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM t)
SELECT part, doc_id, n_tokens, start_offset,
       CAST(start_offset // {budget} AS BIGINT) AS seq_id,
       n_tokens > {budget} AS oversize
FROM o
"""
