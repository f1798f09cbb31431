"""Incremental view maintenance for additive rollups (the counting
algorithm — Gupta, Mumick & Subrahmanian, SIGMOD'93): a materialized
SUM/COUNT aggregate is updated from DELTA rows (multiplicity +1 for
inserts, -1 for deletes/retractions) without rescanning the base table.

This is the maintenance story every 100 TB rollup needs: history is
never re-read — an ingest batch (or a correction batch retracting bad
rows) folds into the state with one delta-sized aggregate plus a merge
keyed on the group columns.  SUM and COUNT are self-maintainable under
both inserts and deletes; the state row disappears exactly when its
multiplicity count reaches zero (full retraction), so
apply(state, deltas) is IDENTICAL to recomputing over the updated base
— the identity the driver oracle checks and tests pin.

Determinism: values are summed as DECIMAL(18,2) (the money convention),
counts as exact longs — merge order cannot move a digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(18,2)"


def ivm_state(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Build the maintainable state: (keys..., s DECIMAL, n LONG)."""
    return df.groupBy(*keys).agg(
        F.sum(F.col(value_col).cast(_DEC)).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )


def ivm_apply(
    state: DataFrame,
    deltas: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    mult_col: str = "mult",
) -> DataFrame:
    """Fold delta rows (each carrying ``mult_col`` in {+1, -1}) into the
    state: one delta-sized aggregate + a keyed merge.  Groups whose
    multiplicity count reaches zero vanish (full retraction); a negative
    count means the caller retracted rows that were never in the state
    — raised loudly rather than silently corrupted."""
    dagg = deltas.groupBy(*keys).agg(
        F.sum(
            F.col(value_col).cast(_DEC) * F.col(mult_col).cast(_DEC)
        ).alias("ds"),
        F.sum(F.col(mult_col)).cast("long").alias("dn"),
    )
    merged = (
        state.select(*keys, "s", "n")
        .unionByName(
            dagg.select(
                *keys, F.col("ds").alias("s"), F.col("dn").alias("n")
            )
        )
        .groupBy(*keys)
        .agg(F.sum("s").cast(_DEC).alias("s"), F.sum("n").cast("long").alias("n"))
    )
    # the guard lives INSIDE the filter predicate: a separate
    # assert_true projection gets reordered below the n>0 filter by
    # Catalyst (projections don't change n), silently skipping the check
    guard = (
        F.when(
            F.col("n") < 0,
            F.raise_error(
                F.lit(
                    "ivm_apply: negative multiplicity — retraction of "
                    "rows absent from the state"
                )
            ).cast("boolean"),
        )
        .otherwise(F.col("n") > 0)
    )
    return merged.filter(guard)


def erasure_deltas(
    base: DataFrame,
    erase_ids: DataFrame,
    *,
    id_col: str,
    mult_col: str = "mult",
) -> DataFrame:
    """Right-to-be-forgotten as IVM retractions: every base row
    belonging to an erased entity becomes a multiplicity −1 delta, so
    erasure folds into EVERY maintained rollup through the same
    :func:`ivm_apply` path an ingest batch uses — no rollup recompute,
    no history rescan beyond the targeted semi-join (which an
    id-partitioned/bucketed base layout prunes to the erased ids'
    files).  The correctness identity is inherited from the counting
    algorithm: apply(state, erasure_deltas) ≡ recompute over the base
    minus the erased entities, and over-erasure (an id with no rows, or
    applying the same erasure twice) raises through ivm_apply's
    in-plan multiplicity guard instead of corrupting the state."""
    return base.join(
        erase_ids.select(id_col).distinct(), id_col, "left_semi"
    ).withColumn(mult_col, F.lit(-1))


def ivm_join_deltas(
    a_old: DataFrame,
    da: DataFrame,
    b_old: DataFrame,
    db: DataFrame,
    *,
    on: str,
    mult_col: str = "mult",
) -> DataFrame:
    """Delta rows of the JOIN view V = A ⋈ B under batch updates to
    both sides — the join rule of the counting algorithm (Gupta,
    Mumick & Subrahmanian, SIGMOD'93):

        ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    with the multiplicity of a joined row being the PRODUCT of its
    inputs' multiplicities — which makes retractions compose: deleting
    an A row retracts every joined row it produced, and a row joined
    from two deltas carries (+1)·(+1) = +1 / (−1)·(+1) = −1 exactly.
    ``a_old``/``b_old`` are the pre-update snapshots (implicit
    multiplicity +1); ``da``/``db`` carry ``mult_col`` in {+1, −1}.
    The output feeds :func:`ivm_apply` (whose arithmetic is exact for
    any integer multiplicity), so a maintained aggregate over the join
    equals a full recompute over the updated bases — the identity the
    tests and the driver oracle pin.

    100 TB shape: every term is delta ⋈ base or delta ⋈ delta — the
    base tables are only ever probed on the join key, never rescanned
    in full when the base layout is bucketed/partitioned on ``on``
    (file-level pruning to the delta's keys); the one full-base term
    A_old ⋈ ΔB streams the base through a broadcast of the (small)
    delta when sizes allow, which AQE picks automatically."""
    a_cols = list(a_old.columns)
    b_cols = [c for c in b_old.columns if c != on]
    da2 = da.withColumnRenamed(mult_col, "_ma")
    db2 = db.withColumnRenamed(mult_col, "_mb")

    def term(a_side: DataFrame, b_side: DataFrame, mult) -> DataFrame:
        return a_side.join(b_side, on).select(
            *[F.col(c) for c in a_cols],
            *[F.col(c) for c in b_cols],
            mult.cast("long").alias(mult_col),
        )

    return (
        term(da2, b_old, F.col("_ma"))
        .unionByName(term(a_old, db2, F.col("_mb")))
        .unionByName(term(da2, db2, F.col("_ma") * F.col("_mb")))
    )
