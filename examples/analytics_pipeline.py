"""Product-analytics example over the event log: the operators a
warehouse team runs daily, end to end on one SparkSession —

1. ``scd2_history`` — each user's event-type timeline as type-2
   validity intervals (the point-in-time-join feed);
2. ``events_twap`` — time-weighted value averages (burst-robust);
3. ``events_cusum`` — drift alarms on hourly rates, closed-form
   windows;
4. ``user_rfm_segments`` — RFM terciles with broadcast sampled
   thresholds (no global ntile);
5. ``ab_conversion_z`` — two-proportion significance on
   view → purchase conversion;
6. ``cumulative_ndv`` — the audience growth curve from windowed HLL
   registers.

Run:  python examples/analytics_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inception_spark.session import build_session
from inception_spark.functions.sketches import cumulative_ndv
from inception_spark.plans.relational import (
    ab_conversion_z,
    events_cusum,
    events_twap,
    load_events,
    scd2_history,
    user_rfm_segments,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = build_session(
        "analytics_example", master="local[4]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_events(spark, sf_dir)

    hist = scd2_history(
        ev, key="user_id", attr="event_type", ts="ts", tiebreak="event_id"
    )
    print(f"scd2 intervals: {hist.count()}")
    hist.orderBy("user_id", "valid_from").show(5, truncate=False)

    print("time-weighted averages:")
    events_twap(spark, sf_dir).orderBy("user_id").show(5)

    alarms = events_cusum(spark, sf_dir).filter("alarm")
    print(f"cusum alarm hours: {alarms.count()}")

    print("RFM segments:")
    user_rfm_segments(spark, sf_dir).orderBy("user_id").show(5)

    print("A/B conversion:")
    ab_conversion_z(spark, sf_dir).show()

    print("audience growth curve (first days):")
    cumulative_ndv(ev, time_col="ts", col="user_id").orderBy(
        "bucket_ts"
    ).show(5)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
