"""Statistics / CBO pipeline: the profile-before-you-plan workflow a
warehouse team runs before trusting stats-driven plans on a new table —

1. ``profile_table``       — null rates, exact NDV, ranges, widths;
2. ``fd_profile``          — functional dependencies (partition keys);
3. ``equidepth_histogram`` — the selectivity object per segment;
4. ``join_cardinality_check`` — the System-R estimate vs reality audit;
5. ``rendezvous_shards`` + ``reshard_movement_report`` — layout
   placement and the measured cost of growing it.

Run:  python examples/stats_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from inception_spark.operators.layout import (
    rendezvous_shards,
    reshard_movement_report,
)
from inception_spark.operators.profile import (
    equidepth_histogram,
    fd_profile,
    join_cardinality_check,
    profile_table,
)
from inception_spark.session import build_session


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = build_session(
        "stats_pipeline", master="local[4]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    print("== column profile (orders) ==")
    profile_table(
        orders,
        numeric_cols=["o_totalprice"],
        string_cols=["o_orderpriority", "o_orderstatus"],
    ).show(truncate=False)

    print("== functional dependencies (orders) ==")
    fd_profile(
        orders, ["o_orderkey", "o_custkey", "o_orderpriority"]
    ).filter("fd_holds").show(truncate=False)

    print("== equi-depth price histogram per priority ==")
    equidepth_histogram(
        orders,
        "o_totalprice",
        group_col="o_orderpriority",
        tiebreak_col="o_orderkey",
        k=4,
    ).orderBy("grp", "bucket").show(12, truncate=False)

    print("== join cardinality: estimate vs actual ==")
    join_cardinality_check(
        orders, customer, left_key="o_custkey", right_key="c_custkey"
    ).show(truncate=False)

    print("== rendezvous layout: 16 shards, then the cost of 17 ==")
    rendezvous_shards(docs, key_col="doc_id", n_shards=16).groupBy(
        "shard"
    ).count().orderBy("shard").show(4)
    reshard_movement_report(
        docs, key_col="doc_id", n_from=16, n_to=17
    ).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
