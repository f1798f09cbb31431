"""As-of join operator semantics: inclusive match, no-prior-row NULLs,
latest-wins, key isolation."""

from inception_spark.operators.asof import asof_join, dedupe_right


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 100, "2024-01-01 10:00:00"),  # after r1 → matches r1
            (2, 100, "2024-01-01 12:00:00"),  # after r2 → matches r2
            (3, 100, "2024-01-01 11:00:00"),  # exactly at r2 → inclusive
            (4, 200, "2024-01-01 10:00:00"),  # other key, no right rows
            (5, 100, "2024-01-01 08:00:00"),  # before any right row → NULL
        ],
        "event_id long, user_id long, ts_s string",
    ).selectExpr("event_id", "user_id", "CAST(ts_s AS TIMESTAMP) AS ts")
    right = spark.createDataFrame(
        [
            (100, "2024-01-01 09:00:00", 11, 9.0),
            (100, "2024-01-01 11:00:00", 22, 11.0),
        ],
        "key long, t_s string, rid long, val double",
    ).selectExpr("key", "CAST(t_s AS TIMESTAMP) AS t", "rid", "val")

    out = asof_join(
        left, right,
        left_on="ts", right_on="t",
        by_left="user_id", by_right="key",
        value_cols=["rid", "val"],
    )
    got = {r["event_id"]: (r["rid"], r["val"]) for r in out.collect()}
    assert got[1] == (11, 9.0)
    assert got[2] == (22, 11.0)
    assert got[3] == (22, 11.0)      # inclusive at equal timestamps
    assert got[4] == (None, None)    # key with no right rows
    assert got[5] == (None, None)    # left row before all right rows
    assert out.count() == 5          # left join: every left row kept


def test_dedupe_right_latest_wins(spark):
    right = spark.createDataFrame(
        [(100, "2024-01-01", 1, 1.0), (100, "2024-01-01", 2, 2.0)],
        "key long, t string, rid long, val double",
    )
    out = dedupe_right(right, by="key", on="t", tie_break_desc="rid").collect()
    assert len(out) == 1 and out[0]["rid"] == 2
