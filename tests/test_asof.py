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


def test_asof_forward_and_tolerance_match_pandas_semantics(spark):
    """direction='forward' picks the earliest right row at-or-after;
    tolerance nulls matches farther than the bound (merge_asof rules),
    cross-checked against a brute-force python reference."""
    from pyspark.sql import functions as F

    from inception_spark.operators.asof import asof_join

    left = [(i, k, t) for i, (k, t) in enumerate(
        [("a", 10), ("a", 35), ("a", 70), ("b", 5), ("b", 100), ("c", 1)]
    )]
    right = [("a", 12, 112.0), ("a", 30, 130.0), ("a", 60, 160.0),
             ("b", 90, 290.0)]
    ldf = spark.createDataFrame(left, "lid long, k string, t long")
    rdf = spark.createDataFrame(right, "rk string, rt long, v double")

    def brute(direction, tol):
        out = {}
        for lid, k, t in left:
            if direction == "forward":
                cands = [(rt, v) for rk, rt, v in right
                         if rk == k and rt >= t]
                best = min(cands) if cands else None
                gap = best[0] - t if best else None
            else:
                cands = [(rt, v) for rk, rt, v in right
                         if rk == k and rt <= t]
                best = max(cands) if cands else None
                gap = t - best[0] if best else None
            if best is None or (tol is not None and gap > tol):
                out[lid] = None
            else:
                out[lid] = best[1]
        return out

    for direction, tol in [("forward", None), ("forward", 10),
                           ("backward", None), ("backward", 4)]:
        got = {
            r["lid"]: r["v"]
            for r in asof_join(
                ldf, rdf, left_on="t", right_on="rt", by_left="k",
                by_right="rk", value_cols=["v"], direction=direction,
                tolerance=tol,
            ).collect()
        }
        assert got == brute(direction, tol), (direction, tol)


def test_asof_bad_direction_raises(spark):
    import pytest as _pytest

    from inception_spark.operators.asof import asof_join

    df = spark.range(1).selectExpr("id AS k", "id AS t", "id AS v")
    with _pytest.raises(ValueError, match="direction"):
        asof_join(df, df, left_on="t", right_on="t", by_left="k",
                  by_right="k", value_cols=["v"], direction="sideways")
