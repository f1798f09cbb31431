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


def test_ivm_join_deltas_identity_all_terms(spark):
    """apply(state, join_deltas) == full recompute over the updated
    bases, on a fixture where every delta term contributes: a new B row
    joining an old A row, a new A row joining old B rows, a new-new
    pair, and a retraction that removes an old joined row."""
    from pyspark.sql import functions as F

    from inception_spark.plans.ivm import (
        ivm_apply,
        ivm_join_deltas,
        ivm_state,
    )

    a_old = spark.createDataFrame(
        [(1, "P1"), (2, "P2")], "k long, grp string"
    )
    b_old = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], "k long, v double"
    )
    da = spark.createDataFrame(
        [(3, "P1", 1)], "k long, grp string, mult int"
    )
    db = spark.createDataFrame(
        [
            (2, 7.0, 1),    # new B row for old A key
            (3, 100.0, 1),  # new-new pair
            (1, 20.0, -1),  # retraction of an old B row
        ],
        "k long, v double, mult int",
    )
    state = ivm_state(a_old.join(b_old, "k"), ["grp"], "v")
    dv = ivm_join_deltas(a_old, da, b_old, db, on="k")
    got = {
        r["grp"]: (float(r["s"]), r["n"])
        for r in ivm_apply(state, dv, ["grp"], "v").collect()
    }
    # final bases: A = {1:P1, 2:P2, 3:P1}, B = {1:[10], 2:[5,7], 3:[100]}
    exp = {"P1": (110.0, 2), "P2": (12.0, 2)}
    assert got == exp


def test_ivm_join_deltas_a_side_retraction(spark):
    """Retracting an A row retracts every joined row it produced —
    including against B deltas in the same batch ((−1)·(+1) = −1
    through the dA x dB term)."""
    from inception_spark.plans.ivm import (
        ivm_apply,
        ivm_join_deltas,
        ivm_state,
    )

    a_old = spark.createDataFrame(
        [(1, "P1"), (2, "P1")], "k long, grp string"
    )
    b_old = spark.createDataFrame(
        [(1, 10.0), (2, 5.0)], "k long, v double"
    )
    da = spark.createDataFrame(
        [(2, "P1", -1)], "k long, grp string, mult int"
    )
    db = spark.createDataFrame(
        [(2, 99.0, 1)], "k long, v double, mult int"
    )
    state = ivm_state(a_old.join(b_old, "k"), ["grp"], "v")
    dv = ivm_join_deltas(a_old, da, b_old, db, on="k")
    got = {
        r["grp"]: (float(r["s"]), r["n"])
        for r in ivm_apply(state, dv, ["grp"], "v").collect()
    }
    # final bases: A = {1}, B = {1:[10], 2:[5,99]} -> join = {(1,10)}
    assert got == {"P1": (10.0, 1)}
