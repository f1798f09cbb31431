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
