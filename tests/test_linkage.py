"""Fellegi-Sunter record linkage: u-probabilities, score direction,
blocking discipline."""

import math

from pyspark.sql import functions as F

from inception_spark.operators.linkage import fs_linkage_scores


def test_fs_scores_rank_matches_above_nonmatches(spark):
    """Pairs agreeing on rarer fields outscore chance agreements, and
    the score equals the hand-computed likelihood-ratio product."""
    rows = [
        # (id, blk, city, phone)
        (1, 0, "springfield", "555"),
        (2, 0, "springfield", "555"),   # agrees with 1 on both
        (3, 0, "springfield", "777"),   # agrees on city only
        (4, 0, "shelbyville", "888"),   # agrees on nothing
    ]
    df = spark.createDataFrame(rows, "doc_id long, blk int, city string, phone string")
    out = {
        (r.id_a, r.id_b): (r.n_agree, r.score)
        for r in fs_linkage_scores(
            df, fields=["city", "phone"], block_col="blk"
        ).collect()
    }
    assert len(out) == 6  # all within-block pairs
    # hand-compute u: city springfield 3, shelbyville 1 -> u_c = 10/16;
    # phone 555x2,777,888 -> u_p = 6/16
    u_c, u_p = 10 / 16, 6 / 16
    m = 0.9
    full = round((m / u_c) * (m / u_p), 6)
    city_only = round((m / u_c) * ((1 - m) / (1 - u_p)), 6)
    nothing = round(((1 - m) / (1 - u_c)) * ((1 - m) / (1 - u_p)), 6)
    assert out[(1, 2)] == (2, full)
    assert out[(1, 3)] == (1, city_only)
    assert out[(1, 4)] == (0, nothing)
    assert full > city_only > nothing


def test_fs_blocking_limits_pairs(spark):
    """Cross-block pairs never score — the all-pairs guard."""
    rows = [(i, i % 3, "x") for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, blk int, f string")
    out = fs_linkage_scores(df, fields=["f"], block_col="blk").collect()
    assert len(out) == 9  # 3 blocks x C(3,2)
    ids = {(r.id_a, r.id_b) for r in out}
    assert all((a % 3) == (b % 3) for a, b in ids)


def test_fs_null_never_agrees(spark):
    rows = [(1, 0, None), (2, 0, None), (3, 0, "v")]
    df = spark.createDataFrame(rows, "doc_id long, blk int, f string")
    out = {
        (r.id_a, r.id_b): r.n_agree
        for r in fs_linkage_scores(df, fields=["f"], block_col="blk").collect()
    }
    assert out == {(1, 2): 0, (1, 3): 0, (2, 3): 0}


def test_fs_empty_input_returns_empty(spark):
    df = spark.createDataFrame([], "doc_id long, blk int, f string")
    out = fs_linkage_scores(df, fields=["f"], block_col="blk")
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "n_agree", "score"]


class TestGoldenRecord:
    def test_latest_non_null_wins_with_provenance(self, spark):
        from inception_spark.operators.linkage import golden_record

        rows = [
            # cluster 1: newest (id 3) has NULL email — survivor email
            # must come from id 2, name from id 3
            (1, 1, "Ann", "a@x.com"),
            (2, 1, "Anne", "ann@x.com"),
            (3, 1, "Anne B.", None),
            # cluster 2: field NULL everywhere stays NULL
            (4, 2, "Bob", None),
            (5, 2, None, None),
        ]
        df = spark.createDataFrame(
            rows, "rid long, cluster long, name string, email string"
        )
        out = {
            r["cluster_id"]: r
            for r in golden_record(
                df, cluster_col="cluster", fields=["name", "email"],
                recency_col="rid", id_col="rid",
            ).collect()
        }
        c1 = out[1]
        assert c1["n_records"] == 3
        assert c1["name"] == "Anne B." and c1["name_src"] == 3
        assert c1["email"] == "ann@x.com" and c1["email_src"] == 2
        c2 = out[2]
        assert c2["name"] == "Bob" and c2["name_src"] == 4
        assert c2["email"] is None and c2["email_src"] is None

    def test_single_aggregate_plan(self, spark):
        from inception_spark.operators.linkage import golden_record

        df = spark.createDataFrame(
            [(1, 1, "a")], "rid long, cluster long, name string"
        )
        out = golden_record(
            df, cluster_col="cluster", fields=["name"],
            recency_col="rid", id_col="rid",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan and "Join" not in plan
        assert plan.count("Exchange") <= 1  # the one groupBy shuffle

    def test_partials_merge_equals_batch_under_any_split(self, spark):
        """Struct-max survivorship state merges exactly: split the rows
        arbitrarily, build partials per split, finalize the union —
        must equal the single-pass golden_record."""
        from inception_spark.operators.linkage import (
            golden_record,
            golden_record_finalize,
            golden_record_partials,
        )

        rows = [
            (i, i % 7, f"n{i % 5}" if i % 3 else None,
             f"e{i % 4}" if i % 5 else None)
            for i in range(60)
        ]
        df = spark.createDataFrame(
            rows, "rid long, cluster long, name string, email string"
        )
        kw = dict(cluster_col="cluster", fields=["name", "email"],
                  recency_col="rid", id_col="rid")
        batch = sorted(map(tuple, golden_record(df, **kw).collect()))
        p1 = golden_record_partials(df.filter("rid % 3 = 0"), **kw)
        p2 = golden_record_partials(df.filter("rid % 3 = 1"), **kw)
        p3 = golden_record_partials(df.filter("rid % 3 = 2"), **kw)
        merged = sorted(map(tuple, golden_record_finalize(
            p1.unionByName(p2).unionByName(p3), ["name", "email"]
        ).collect()))
        assert merged == batch
