"""Binned range join: equivalence with the naive interval join + the
plan guarantee (hash join on the bin key, not a nested loop)."""

from pyspark.sql import functions as F

from inception_spark.operators.range_join import binned_range_join
from inception_spark.plans.relational import load_events

SF = "/root/testdata/sf0.001"


def _frames(spark):
    ev = load_events(spark, SF).select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    anchors = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("anchor_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    return ev, anchors


def test_binned_matches_naive(spark):
    ev, anchors = _frames(spark)
    binned = binned_range_join(
        ev, anchors, point_ts="ts", start_ts="start_ts", end_ts="end_ts",
        bin_width_sec=3600, extra_keys=("user_id", "a_user"),
    ).select("event_id", "anchor_id")
    naive = (
        ev.join(
            anchors,
            (ev.user_id == anchors.a_user)
            & ev.ts.between(anchors.start_ts, anchors.end_ts),
        ).select("event_id", "anchor_id")
    )
    a = sorted(map(tuple, binned.collect()))
    b = sorted(map(tuple, naive.collect()))
    assert a == b and len(a) > 0


def test_bin_width_never_changes_results(spark):
    ev, anchors = _frames(spark)
    outs = []
    for width in (60, 3600, 7 * 86400):
        outs.append(
            sorted(
                map(
                    tuple,
                    binned_range_join(
                        ev, anchors, point_ts="ts", start_ts="start_ts",
                        end_ts="end_ts", bin_width_sec=width,
                        extra_keys=("user_id", "a_user"),
                    ).select("event_id", "anchor_id").collect(),
                )
            )
        )
    assert outs[0] == outs[1] == outs[2]


def test_binned_plan_is_hash_join_not_nested_loop(spark):
    ev, anchors = _frames(spark)
    out = binned_range_join(
        ev, anchors, point_ts="ts", start_ts="start_ts", end_ts="end_ts",
        extra_keys=("user_id", "a_user"),
    )
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    assert "HashJoin" in p or "SortMergeJoin" in p


def test_rejects_outer_join(spark):
    import pytest

    ev, anchors = _frames(spark)
    with pytest.raises(ValueError):
        binned_range_join(
            ev, anchors, point_ts="ts", start_ts="start_ts",
            end_ts="end_ts", how="left",
        )
