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

def packing_efficiency_report(
    df: DataFrame,
    *,
    budgets: tuple = (512, 1024, 2048, 4096),
    id_col: str = "doc_id",
    text_col: str = "text",
    part_col: str = "lang",
) -> DataFrame:
    """The "pick your context length" report: for each candidate token
    budget L, what the corpus costs under contiguous offset packing —
    one row per L: ``(budget, n_docs, total_tokens, n_sequences,
    tail_pad_tokens, n_oversize, n_straddle)``.

    * ``n_sequences``/``tail_pad_tokens`` — Σ over partitions of
      ceil(total/L) sequences and the final-sequence padding that
      implies (contiguous packing wastes nothing else);
    * ``n_oversize`` — documents longer than L (must be chunked
      upstream, operators/chunking);
    * ``n_straddle`` — documents whose token span crosses a sequence
      boundary: the span-reads a dataloader must stitch (or the pad
      waste it eats) at that L.  Falls as L grows; oversize rises as L
      shrinks — the report exposes exactly that trade.

    Plan shape: the per-partition prefix sums are computed ONCE (the
    pack_sequences window), then a literal ``explode`` over the |L|
    candidates fans out map-side — no per-candidate rescan of the
    corpus — into one |budgets|-key aggregate plus a partition-total
    rollup; everything integer-exact."""
    if not budgets or any(int(b) <= 0 for b in budgets):
        raise ValueError(f"budgets must be positive, got {budgets!r}")
    toks = df.select(
        F.col(part_col).alias("part"),
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    base = toks.withColumn(
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
    buds = F.explode(
        F.array(*[F.lit(int(b)) for b in budgets])
    ).alias("budget")
    per_doc = base.select("part", "n_tokens", "start_offset", buds)
    doc_stats = per_doc.groupBy("budget").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(
            (F.col("n_tokens") > F.col("budget")).cast("long")
        ).cast("long").alias("n_oversize"),
        # crosses >= 1 boundary: first and last token land in
        # different sequences (empty docs never straddle)
        F.sum(
            (
                (F.col("n_tokens") > 0)
                & (
                    F.expr("start_offset div budget")
                    != F.expr("(start_offset + n_tokens - 1) div budget")
                )
            ).cast("long")
        ).cast("long").alias("n_straddle"),
    )
    part_totals = toks.groupBy("part").agg(
        F.sum("n_tokens").cast("long").alias("part_tokens")
    )
    seq_stats = part_totals.select(
        "part_tokens",
        F.explode(
            F.array(*[F.lit(int(b)) for b in budgets])
        ).alias("budget"),
    ).groupBy("budget").agg(
        F.sum(
            F.expr("(part_tokens + budget - 1) div budget")
        ).cast("long").alias("n_sequences"),
        F.sum(
            F.expr(
                "(part_tokens + budget - 1) div budget * budget"
                " - part_tokens"
            )
        ).cast("long").alias("tail_pad_tokens"),
    )
    return doc_stats.join(seq_stats, "budget").select(
        F.col("budget").cast("long").alias("budget"),
        "n_docs",
        "total_tokens",
        "n_sequences",
        "tail_pad_tokens",
        "n_oversize",
        "n_straddle",
    )


def packing_efficiency_report_sql(
    table: str,
    token_count_expr: str,
    *,
    budgets: tuple = (512, 1024, 2048, 4096),
    id_col: str = "doc_id",
    part_col: str = "lang",
) -> str:
    """DuckDB twin of :func:`packing_efficiency_report`."""
    vals = ", ".join(f"({int(b)})" for b in budgets)
    return f"""
WITH t AS (
  SELECT {part_col} AS part, {id_col} AS doc_id,
         CAST({token_count_expr} AS BIGINT) AS n_tokens
  FROM {table}),
o AS (
  SELECT part, n_tokens,
         CAST(coalesce(SUM(n_tokens) OVER (
           PARTITION BY part ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM t),
b(budget) AS (VALUES {vals}),
doc_stats AS (
  SELECT budget,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         CAST(SUM(CASE WHEN n_tokens > budget THEN 1 ELSE 0 END)
              AS BIGINT) AS n_oversize,
         CAST(SUM(CASE WHEN n_tokens > 0
                        AND start_offset // budget
                            <> (start_offset + n_tokens - 1) // budget
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
  FROM o CROSS JOIN b GROUP BY budget),
pt AS (
  SELECT part, CAST(SUM(n_tokens) AS BIGINT) AS part_tokens
  FROM t GROUP BY part),
seq_stats AS (
  SELECT budget,
         CAST(SUM((part_tokens + budget - 1) // budget) AS BIGINT)
           AS n_sequences,
         CAST(SUM((part_tokens + budget - 1) // budget * budget
                  - part_tokens) AS BIGINT) AS tail_pad_tokens
  FROM pt CROSS JOIN b GROUP BY budget)
SELECT CAST(d.budget AS BIGINT) AS budget, n_docs, total_tokens,
       n_sequences, tail_pad_tokens, n_oversize, n_straddle
FROM doc_stats d JOIN seq_stats s ON d.budget = s.budget
"""
