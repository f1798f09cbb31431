"""k-means + semantic dedup: invariants, determinism, oracle parity.

The full cross-engine hash check runs through the mini-driver
(test_entry.py); here we pin the operator-level contracts the hash can't
see — partitioning independence, monotone cost, dedup keep rules."""

import duckdb
import pytest
from pyspark.sql import functions as F

from inception_spark.operators.clustering import (
    kmeans_train,
    kmeans_train_sql,
    semantic_dedup,
    semantic_dedup_sql,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


def test_kmeans_assignment_covers_all_rows(spark, emb):
    n = emb.count()
    res = kmeans_train(emb, k=8, n_iter=2)
    rows = res.collect()
    assert len(rows) == n
    assert {r["vec_id"] for r in rows} == {
        r["vec_id"] for r in emb.select("vec_id").collect()
    }
    assert all(0 <= r["cid"] < 8 for r in rows)
    assert all(r["dist2_units"] >= 0 for r in rows)


def test_kmeans_partitioning_independent(spark, emb):
    a = {
        (r["vec_id"], r["cid"], r["dist2_units"])
        for r in kmeans_train(emb, k=5, n_iter=2).collect()
    }
    b = {
        (r["vec_id"], r["cid"], r["dist2_units"])
        for r in kmeans_train(emb.repartition(13), k=5, n_iter=2).collect()
    }
    assert a == b


def test_kmeans_cost_not_worse_than_seed_assignment(spark, emb):
    """Lloyd's never increases cost; integer floors can only shave
    sub-unit amounts, so total dist2 after 3 rounds must be <= the
    1-round (seed-assignment) total."""
    c1 = (
        kmeans_train(emb, k=8, n_iter=1)
        .agg(F.sum("dist2_units"))
        .first()[0]
    )
    c3 = (
        kmeans_train(emb, k=8, n_iter=3)
        .agg(F.sum("dist2_units"))
        .first()[0]
    )
    assert c3 <= c1


def test_kmeans_matches_duckdb_oracle(spark, emb):
    res = sorted(
        (r["vec_id"], r["cid"], r["dist2_units"])
        for r in kmeans_train(emb, k=6, n_iter=2).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{EMB}'")
    orc = sorted(
        con.execute(
            kmeans_train_sql("embeddings", k=6, n_iter=2, dim=64)
        ).fetchall()
    )
    assert res == [tuple(r) for r in orc]


def test_kmeans_k_exceeds_corpus_raises(spark, emb):
    with pytest.raises(ValueError, match="exceeds corpus size"):
        kmeans_train(emb.limit(3), k=10, n_iter=1)


def test_kmeans_rejects_zero_iterations(spark, emb):
    with pytest.raises(ValueError):
        kmeans_train(emb, k=3, n_iter=0)
    with pytest.raises(ValueError):
        kmeans_train_sql("embeddings", k=3, n_iter=0)


def test_semantic_dedup_keeps_smallest_id_per_pair(spark, emb):
    res = semantic_dedup(emb, k=8, n_iter=2, eps=0.4)
    rows = res.collect()
    assert len(rows) == emb.count()
    dropped = {r["vec_id"] for r in rows if not r["keep"]}
    assert dropped, "eps=0.4 should drop at least one row on this fixture"
    # every dropped doc has a kept-or-dropped smaller-id neighbour >= eps
    # in its own cluster; the smallest id of any dup set is always kept
    from inception_spark.functions.vectors import cosine

    assign = res.select("vec_id", "cid")
    a = emb.join(assign, "vec_id")
    l = a.select("cid", F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    r = a.select("cid", F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = (
        l.join(r, "cid")
        .where(F.col("ia") < F.col("ib"))
        .where(F.round(cosine(F.col("va"), F.col("vb")), 6) >= 0.4)
        .select("ia", "ib")
        .collect()
    )
    dup_ids = {p["ib"] for p in pairs}
    assert dropped == dup_ids
    min_ids = {min(p["ia"], p["ib"]) for p in pairs}
    keep_map = {row["vec_id"]: row["keep"] for row in rows}
    # an id that is only ever the smaller side of its pairs is kept
    for i in min_ids - dup_ids:
        assert keep_map[i]


def test_semantic_dedup_high_eps_keeps_everything(spark, emb):
    res = semantic_dedup(emb, k=4, n_iter=1, eps=0.999)
    assert res.where(~F.col("keep")).count() == 0


def test_semantic_dedup_matches_duckdb_oracle(spark, emb):
    res = sorted(
        (r["vec_id"], r["cid"], r["keep"])
        for r in semantic_dedup(emb, k=8, n_iter=2, eps=0.4).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{EMB}'")
    orc = sorted(
        con.execute(
            semantic_dedup_sql("embeddings", k=8, n_iter=2, eps=0.4, dim=64)
        ).fetchall()
    )
    assert res == [tuple(r) for r in orc]


def test_semantic_dedup_hot_cluster_grid_path(spark):
    """k=1 sends EVERY row into one cluster; with max_block forced tiny
    the quadratic step must take embedding_dup_pairs' chunk-grid
    decomposition and still produce exactly the single-group answer."""
    from inception_spark.operators.clustering import semantic_dedup

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(200)
    base = semantic_dedup(emb, k=1, n_iter=1, eps=0.4)
    grid = semantic_dedup(
        emb, k=1, n_iter=1, eps=0.4, max_block=64, chunk=32
    )
    assert sorted(map(tuple, grid.collect())) == sorted(
        map(tuple, base.collect())
    )


def test_kcenter_coreset_planted_geometry(spark):
    """On three tight planted clusters + one far outlier, the greedy
    traversal's first additions hit the outlier and the remaining
    clusters before ever picking a second point from a covered
    cluster, and radius2 is non-increasing after round 2 (covering
    radius shrinks monotonically up to the 2-approx guarantee)."""
    import numpy as np

    from inception_spark.operators.clustering import kcenter_coreset

    rng = np.random.RandomState(3)
    pts = []
    centers = {0: [1.0, 0.0], 1: [0.0, 1.0], 2: [-1.0, 0.0]}
    vid = 0
    for c, ctr in centers.items():
        for _ in range(10):
            pts.append((vid, [ctr[0] + rng.uniform(-0.01, 0.01),
                              ctr[1] + rng.uniform(-0.01, 0.01)], c))
            vid += 1
    pts.append((vid, [0.0, -1.9], 99))  # the far outlier
    df = spark.createDataFrame(
        pts, "vec_id long, embedding array<float>, label int"
    )
    got = kcenter_coreset(df, k=4).collect()
    by_order = {r["sel_order"]: r for r in got}
    cluster_of = {p[0]: p[2] for p in pts}
    picked = [cluster_of[by_order[i]["vec_id"]] for i in range(1, 5)]
    # all four regions hit exactly once
    assert sorted(picked) == [0, 1, 2, 99]
    # radius curve non-increasing
    radii = [by_order[i]["radius2"] for i in range(2, 5)]
    assert radii == sorted(radii, reverse=True)
    assert by_order[1]["radius2"] is None
