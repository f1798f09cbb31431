"""Skew-handling join strategies.

AQE's skew-join split handles moderate skew automatically
(``spark.sql.adaptive.skewJoin.enabled`` is on in build_session); this
module covers the cases AQE can't: a single pathological key in an
aggregation, or a skewed join where the small side must be replicated.

* :func:`salted_join` — N-way salt: the skewed (large) side gets a random
  salt in [0, N); the small side is exploded N× with every salt value, so
  the join key becomes (key, salt) and the hot key's rows spread over N
  tasks.  Correct for inner/left joins on equi-keys.
* :func:`salted_count` — two-phase aggregation for hot-key counts:
  pre-aggregate on (key, salt), then final-aggregate on key.  (For
  algebraic aggregates Spark's partial aggregation already does this;
  explicit salting matters for ``collect_list``-style holistic aggregates
  or extreme single-key skew.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    *,
    key_large: str,
    key_small: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side salted and the small side replicated
    n_salts×.  Output columns = large columns + small columns (join keys
    both kept, as in a plain join on expressions).

    Only join types that never emit unmatched SMALL-side rows are legal:
    the small side is replicated per salt, so a right/full outer join
    would duplicate every unmatched small row n_salts× (advisor finding,
    round 1) — rejected loudly instead."""
    allowed = {
        "inner", "cross", "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti",
    }
    if how.lower().replace("_", "") not in {
        a.replace("_", "") for a in allowed
    }:
        raise ValueError(
            f"salted_join(how={how!r}): only inner/left/semi/anti joins "
            "are correct under small-side replication (right/full outer "
            "would emit each unmatched small-side row n_salts times)"
        )
    salted_l = large.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salted_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    # qualify key refs through the DataFrames: bare F.col() raises
    # AMBIGUOUS_REFERENCE when both sides use the same key name
    out = salted_l.join(
        salted_s,
        (salted_l[key_large] == salted_s[key_small])
        & (salted_l["_salt"] == salted_s["_salt"]),
        how,
    )
    return out.drop("_salt")


def salted_count(
    df: DataFrame, *, key: str, n_salts: int = 16
) -> DataFrame:
    """Hot-key-safe count per key: (key, n) via two-phase salted agg."""
    return (
        df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_pn"))
        .groupBy(key)
        .agg(F.sum("_pn").alias("n"))
    )


def bloom_pruned_join(
    big,
    small,
    *,
    big_key: str,
    small_key: str,
    m: int = 1 << 16,
    k: int = 3,
    how: str = "inner",
    max_small_rows: int = 1_000_000,
):
    """Exact join with a Bloom pre-filter on the big side — the
    runtime-filter / semi-join-reduction pattern, made explicit and
    deterministic.

    The small side's keys are folded driver-side into an m-bit Bloom
    bitmap (deterministic md5 positions, the ``dedup.bloom_screen``
    hash family) embedded in the plan as an array<long> LITERAL; the
    big side is then pruned by k codegen bit-tests BEFORE its shuffle.
    No false negatives, so the join result is IDENTICAL to the plain
    join (oracle-checkable); false positives only cost unpruned rows.

    When it pays: big ⋈ selective-small where most big rows have no
    partner — at 100 TB the shuffle writes only the ~matching fraction
    instead of the full fact table.  Spark's own runtime filters cover
    some of this adaptively; this operator makes the reduction explicit,
    engine-independent, and usable where AQE declines (e.g. a pre-known
    dimension filter reused across many queries).

    ``m`` defaults to 2^16 bits = a 1024-long literal (~8 KB in the
    plan); size m ≈ 10×|small keys| for a ~1% FP rate at k=3.

    Guards (both raise with a remediation message instead of silently
    degrading):

    * ``how`` must be ``inner`` or ``left_semi`` — pruning the big side
      before an outer join would drop preserved-side rows that should
      survive with NULLs, breaking the identical-result contract.
    * ``max_small_rows`` caps the driver-side bit-position collect (the
      same shape as ``lsh_probe_pairs.max_probe_keys``): the small side
      is counted first, and a side bigger than the cap raises — at that
      size the Bloom literal stops being "small dimension" and a plain
      shuffle join (or AQE's own runtime filter) is the right plan."""
    from pyspark.sql import functions as F

    from inception_spark.functions.hashing import h28

    if m % 64 != 0:
        raise ValueError(f"m must be a multiple of 64, got {m}")
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_pruned_join supports how='inner'/'left_semi', got "
            f"{how!r}: pruning the big side before a {how} join would "
            "drop rows the outer join must preserve — use a plain join"
        )
    n_small = small.count()
    if n_small > max_small_rows:
        raise ValueError(
            f"small side has {n_small} rows > max_small_rows="
            f"{max_small_rows}; the driver-side Bloom build would "
            "collect k*n distinct bit positions — use a plain shuffle "
            "join (or raise the cap deliberately)"
        )

    def positions(col):
        return [
            h28(F.concat(col.cast("string"), F.lit(f"#b{i}"))) % F.lit(m)
            for i in range(k)
        ]

    pos_rows = (
        small.select(
            F.explode(F.array(*positions(F.col(small_key)))).alias("p")
        )
        .distinct()
        .collect()
    )
    bits = [0] * (m // 64)
    for r in pos_rows:
        p = int(r["p"])
        bits[p >> 6] |= 1 << (p & 63)
    # two's-complement into signed int64 for the array<long> literal
    lit = F.array(
        *[F.lit(b - (1 << 64) if b >= 1 << 63 else b) for b in bits]
    )
    pred = None
    for pc in positions(F.col(big_key)):
        word = F.element_at(lit, (F.shiftright(pc, 6) + 1).cast("int"))
        # the data shift amount is a COLUMN — the python F.shiftright
        # wrapper only takes int literals, so call the SQL function
        test = F.call_function(
            "shiftright", word, (pc % 64).cast("int")
        ).bitwiseAND(F.lit(1)) == 1
        pred = test if pred is None else pred & test
    pruned = big.filter(pred)
    return pruned.join(
        small, pruned[big_key] == small[small_key], how
    )


def join_skew_report(
    left: DataFrame,
    right: DataFrame,
    *,
    key_left: str,
    key_right: str,
    top_k: int = 20,
    target_rows_per_task: int = 5_000_000,
) -> DataFrame:
    """Pre-join diagnostic: the EXACT inner-join output size and its
    per-key decomposition, from per-key counts alone — the numbers that
    decide broadcast vs shuffle vs salt BEFORE launching a 100 TB join
    (an inner equi-join emits Σ_k cL(k)·cR(k) rows; a single hot key
    owning most of that sum is the stage straggler AQE may split too
    late).

    Output: the ``top_k`` keys by output contribution —
    ``(key, left_rows, right_rows, out_rows, out_share, suggested_salt,
    rank)`` where ``out_share`` is the key's fraction of the total
    join output (6-dp, exact integer ratio in identical double
    arithmetic) and ``suggested_salt`` =
    ``ceil(out_rows / target_rows_per_task)`` — the n_salts that caps
    the key's task at the target (1 = no salting needed).

    Cost: two key-count aggregates (map-side combine) + a key-cardinality
    join — never the join itself; NULL keys never join and are excluded.
    """
    from pyspark.sql import Window

    cl = (
        left.select(F.col(key_left).alias("key"))
        .filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("left_rows"))
    )
    cr = (
        right.select(F.col(key_right).alias("key"))
        .filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("right_rows"))
    )
    per_key = cl.join(cr, "key").withColumn(
        "out_rows", F.col("left_rows") * F.col("right_rows")
    )
    total = per_key.agg(
        F.sum("out_rows").cast("long").alias("_total")
    )
    ranked = (
        per_key.crossJoin(F.broadcast(total))
        .withColumn(
            "out_share",
            F.round(
                F.col("out_rows").cast("double")
                / F.col("_total").cast("double"),
                6,
            ),
        )
        .withColumn(
            "suggested_salt",
            F.ceil(
                F.col("out_rows") / F.lit(float(target_rows_per_task))
            ).cast("long"),
        )
    )
    w = Window.orderBy(F.desc("out_rows"), F.asc("key"))
    # distributed top-k first (TakeOrderedAndProject), then rank k rows
    top = ranked.orderBy(F.desc("out_rows"), F.asc("key")).limit(top_k)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "key", "left_rows", "right_rows", "out_rows",
            "out_share", "suggested_salt", "rank",
        )
    )


def join_skew_report_sql(
    left: str,
    right: str,
    *,
    key_left: str,
    key_right: str,
    top_k: int = 20,
    target_rows_per_task: int = 5_000_000,
) -> str:
    """DuckDB twin of :func:`join_skew_report`."""
    return f"""
WITH cl AS (
  SELECT {key_left} AS key, CAST(COUNT(*) AS BIGINT) AS left_rows
  FROM {left} WHERE {key_left} IS NOT NULL GROUP BY 1),
cr AS (
  SELECT {key_right} AS key, CAST(COUNT(*) AS BIGINT) AS right_rows
  FROM {right} WHERE {key_right} IS NOT NULL GROUP BY 1),
pk AS (
  SELECT cl.key, left_rows, right_rows,
         CAST(left_rows * right_rows AS BIGINT) AS out_rows
  FROM cl JOIN cr ON cl.key = cr.key),
tot AS (SELECT CAST(SUM(out_rows) AS BIGINT) AS total FROM pk)
SELECT key, left_rows, right_rows, out_rows,
       round(CAST(out_rows AS DOUBLE) / CAST(total AS DOUBLE), 6)
         AS out_share,
       CAST(ceil(out_rows / CAST({target_rows_per_task} AS DOUBLE))
            AS BIGINT) AS suggested_salt,
       CAST(row_number() OVER (ORDER BY out_rows DESC, key) AS BIGINT)
         AS rank
FROM pk, tot
ORDER BY out_rows DESC, key
LIMIT {top_k}
"""
