"""Incremental view maintenance: apply(state, deltas) == recompute."""

import pytest
from pyspark.sql import functions as F

from inception_spark.plans.ivm import ivm_apply, ivm_state


def _collect(state):
    return sorted(
        (r[0], float(r["s"]), r["n"]) for r in state.collect()
    )


def test_ivm_insert_delete_equals_recompute(spark):
    rows = [(i, "g%d" % (i % 3), float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    state = ivm_state(df.filter("id < 20"), ["g"], "v")
    deltas = (
        df.filter("id >= 20").withColumn("mult", F.lit(1))
        .unionByName(
            df.filter("id < 5").withColumn("mult", F.lit(-1))
        )
    )
    got = _collect(ivm_apply(state, deltas, ["g"], "v"))
    want = _collect(ivm_state(df.filter("id >= 5"), ["g"], "v"))
    assert got == want


def test_ivm_full_retraction_removes_group(spark):
    df = spark.createDataFrame(
        [(1, "only", 10.0), (2, "keep", 1.0)], "id long, g string, v double"
    )
    state = ivm_state(df, ["g"], "v")
    deltas = df.filter("g = 'only'").withColumn("mult", F.lit(-1))
    out = ivm_apply(state, deltas, ["g"], "v")
    assert [r["g"] for r in out.collect()] == ["keep"]


def test_ivm_over_retraction_raises(spark):
    df = spark.createDataFrame([(1, "g", 5.0)], "id long, g string, v double")
    state = ivm_state(df, ["g"], "v")
    bad = spark.createDataFrame(
        [(9, "g", 5.0, -1), (10, "g", 5.0, -1)],
        "id long, g string, v double, mult int",
    )
    with pytest.raises(Exception):
        ivm_apply(state, bad, ["g"], "v").collect()


class TestErasure:
    def test_erasure_equals_recompute_and_double_erase_raises(self, spark):
        from inception_spark.plans.ivm import (
            erasure_deltas,
            ivm_apply,
            ivm_state,
        )

        base = spark.createDataFrame(
            [(1, "a", 10.0), (1, "b", 5.0), (2, "a", 7.0), (3, "a", 1.0)],
            "user_id long, grp string, v double",
        )
        state = ivm_state(base, ["grp"], "v")
        erase = spark.createDataFrame([(1,)], "user_id long")
        after = ivm_apply(
            state, erasure_deltas(base, erase, id_col="user_id"),
            ["grp"], "v",
        )
        expect = ivm_state(base.filter("user_id != 1"), ["grp"], "v")
        assert sorted(map(tuple, after.collect())) == sorted(
            map(tuple, expect.collect())
        )
        # group 'b' belonged only to user 1 -> fully retracted
        assert after.filter("grp = 'b'").count() == 0
        # erasing the same user again over-retracts -> in-plan raise
        import pytest as _pytest

        with _pytest.raises(Exception, match="retract|negative|IVM"):
            ivm_apply(
                after,
                erasure_deltas(base, erase, id_col="user_id"),
                ["grp"], "v",
            ).collect()
