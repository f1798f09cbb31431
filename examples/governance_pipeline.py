"""Data-governance & monitoring example — the round-8 operator block
composed into the workflow a platform team runs around a corpus:

1. ``blocklist_filter``          — N-phrase compliance screen (one
                                   pass per distinct phrase length);
2. ``match_distribution_sample`` — rebalance kept docs to the target
                                   source mix (integer thinning);
3. ``psi_drift_report``          — PSI drift between the event
                                   periods (fixed buckets, smoothed);
4. ``events_robust_anomaly``     — median/MAD outliers that a mean/std
                                   detector would let mask themselves;
5. ``golden_record``             — survivorship over linked record
                                   clusters with provenance;
6. ``erasure_deltas``+``ivm_apply`` — right-to-be-forgotten folded
                                   into a maintained rollup, no
                                   recompute;
7. ``poisson_bootstrap_ci``      — a CI on mean order value from one
                                   pass (32 replicas, no explode).

Run:  python examples/governance_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from inception_spark.functions.text_analysis import blocklist_filter
from inception_spark.operators.linkage import golden_record
from inception_spark.operators.sampling import (
    match_distribution_sample,
    poisson_bootstrap_ci,
)
from inception_spark.plans.ivm import erasure_deltas, ivm_apply, ivm_state
from inception_spark.plans.relational import (
    events_robust_anomaly,
    load_events,
    psi_drift_report,
)
from inception_spark.session import build_session


def main(sf_dir: str) -> None:
    spark = build_session("governance_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. compliance screen
    hits = blocklist_filter(
        docs, ["hash join", "slow scan", "table value part"]
    )
    flagged = hits.select("doc_id").distinct()
    print(f"blocklist: {flagged.count()} docs flagged")
    clean = docs.join(flagged, "doc_id", "left_anti")

    # 2. rebalance the survivors to the target language mix
    mix = match_distribution_sample(
        clean,
        {"en": 40, "zh": 15, "es": 15, "de": 15, "fr": 15},
        group_col="lang",
        key_col="doc_id",
    )
    print("kept per lang after rebalance:")
    mix.groupBy("lang").count().orderBy("lang").show()

    # 3 + 4. monitoring over the event stream
    psi_drift_report(spark, sf_dir).orderBy(F.desc("psi")).show()
    anomalies = events_robust_anomaly(spark, sf_dir)
    print(f"robust anomalies: {anomalies.count()}")

    # 5. survivorship over (fixture) linkage clusters
    recs = docs.select(
        "doc_id",
        F.floor(F.col("doc_id") / 4).cast("long").alias("cluster"),
        "lang",
        "source",
    )
    golden = golden_record(
        recs, cluster_col="cluster", fields=["lang", "source"],
        recency_col="doc_id", id_col="doc_id",
    )
    print(f"golden records: {golden.count()} clusters")

    # 6. erasure request folded into a maintained rollup
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", "value"
    )
    state = ivm_state(ev, ["event_type"], "value")
    erase = ev.filter("user_id % 97 = 0").select("user_id").distinct()
    after = ivm_apply(
        state,
        erasure_deltas(ev, erase, id_col="user_id"),
        ["event_type"],
        "value",
    )
    print("rollup after erasure:")
    after.orderBy("event_type").show()

    # 7. uncertainty on a metric, one pass
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    poisson_bootstrap_ci(
        li, "l_extendedprice", key_col="l_orderkey"
    ).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
