"""Z-order layout: Morton key correctness, engine parity, file pruning."""

import duckdb
import pytest
from pyspark.sql import functions as F

from inception_spark.operators.layout import (
    _spread_py,
    scale_to_cells,
    write_zorder_layout,
    zorder_box_prefixes,
    zorder_key_expr,
    zorder_key_sql,
    zorder_pruned_scan,
)

SF = "/root/testdata/sf0.001"


def _naive_interleave(vals, bits):
    key = 0
    for i in range(bits):
        for d, v in enumerate(vals):
            key |= ((v >> i) & 1) << (i * len(vals) + d)
    return key


def _key_py(vals, bits):
    d = len(vals)
    key = 0
    for i, v in enumerate(vals):
        key |= _spread_py(v, d, bits) << i
    return key


@pytest.mark.parametrize("dims", [2, 3])
def test_spread_matches_naive_interleave(dims):
    import random

    rng = random.Random(7)
    for _ in range(500):
        vals = [rng.randrange(1 << 16) for _ in range(dims)]
        assert _key_py(vals, 16) == _naive_interleave(vals, 16), vals
    # corners
    top = (1 << 16) - 1
    for vals in ([0] * dims, [top] * dims, [top] + [0] * (dims - 1)):
        assert _key_py(vals, 16) == _naive_interleave(vals, 16), vals


@pytest.mark.parametrize("dims", [2, 3])
def test_zorder_key_three_way_parity(spark, dims):
    """Spark expression == DuckDB SQL == python reference."""
    import random

    rng = random.Random(11)
    rows = [
        tuple([i] + [rng.randrange(1 << 16) for _ in range(dims)])
        for i in range(200)
    ]
    schema = "id long, " + ", ".join(f"c{d} long" for d in range(dims))
    df = spark.createDataFrame(rows, schema)
    cols = [F.col(f"c{d}") for d in range(dims)]
    got = {
        r["id"]: r["z"]
        for r in df.select("id", zorder_key_expr(cols).alias("z")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (id BIGINT, "
        + ", ".join(f"c{d} BIGINT" for d in range(dims))
        + ")"
    )
    con.executemany(
        f"INSERT INTO t VALUES ({', '.join('?' * (dims + 1))})", rows
    )
    sql = zorder_key_sql([f"c{d}" for d in range(dims)])
    oracle = {r[0]: r[1] for r in con.execute(f"SELECT id, {sql} FROM t").fetchall()}
    ref = {r[0]: _key_py(list(r[1:]), 16) for r in rows}
    assert got == oracle == ref


def test_scale_to_cells_exact(spark):
    df = spark.createDataFrame(
        [(0, -50), (1, 0), (2, 949), (3, 950), (4, 10_000)], "id long, v long"
    )
    # range [0, 950], bits=4 -> cell = (clamp(v)-0)*15 // 950
    got = {
        r["id"]: r["c"]
        for r in df.select(
            "id", scale_to_cells(F.col("v"), 0, 950, bits=4).alias("c")
        ).collect()
    }
    assert got == {0: 0, 1: 0, 2: 14, 3: 15, 4: 15}
    with pytest.raises(ValueError):
        scale_to_cells(F.col("v"), 5, 5)


def test_box_prefixes_cover_space():
    # the full box must select every cell; a point box selects exactly 1
    allp = zorder_box_prefixes([(0, 65535), (0, 65535)], bits=16, prefix_bits=8)
    assert allp == list(range(256))
    one = zorder_box_prefixes([(0, 0), (0, 0)], bits=16, prefix_bits=8)
    assert one == [0]
    # a thin column in x intersects exactly the 16 cells of that x-strip
    strip = zorder_box_prefixes([(0, 4095), (0, 65535)], bits=16, prefix_bits=8)
    assert len(strip) == 16


def test_zorder_layout_prunes_and_matches(spark, tmp_path):
    """Pruned scan == raw filter, and the scan's PartitionFilters prune
    to only the intersecting zprefix cells."""
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "event_id",
            F.pmod(F.col("user_id"), F.lit(1 << 16)).alias("cx"),
            F.pmod(F.xxhash64("event_id"), F.lit(1 << 16)).alias("cy"),
        )
    )
    path = str(tmp_path / "zorder")
    write_zorder_layout(ev, path, ["cx", "cy"], bits=16, prefix_bits=8)

    box = [(0, 2000), (0, 20000)]
    pruned = zorder_pruned_scan(spark, path, ["cx", "cy"], box)
    f = pruned._jdf.queryExecution().executedPlan().toString()
    assert "zprefix" in f  # partition filter present

    raw = ev.where(
        (F.col("cx") >= 0) & (F.col("cx") <= 2000)
        & (F.col("cy") >= 0) & (F.col("cy") <= 20000)
    )
    assert sorted(
        (r["event_id"], r["cx"], r["cy"]) for r in pruned.collect()
    ) == sorted((r["event_id"], r["cx"], r["cy"]) for r in raw.collect())

    # file-level pruning is real: the box intersects a strict subset of
    # cells, and the scan reads at most that many partition directories
    n_cells = len(zorder_box_prefixes(box, bits=16, prefix_bits=8))
    assert n_cells < 256
    import re

    m = re.search(r"partition count: (\d+)|(\d+) partitions", f)
    if m:  # plan-format dependent; the data check above is the contract
        read = int(m.group(1) or m.group(2))
        assert read <= n_cells


# ---------------------------------------------------------------------------
# small-file compaction
# ---------------------------------------------------------------------------

def test_compaction_plan_only_rewrites_small():
    from inception_spark.operators.layout import compaction_plan

    files = [("a", 10), ("b", 20), ("c", 500), ("d", 35)]
    plan = compaction_plan(files, target_bytes=100)
    assert [p for p, _ in plan["keep"]] == ["c"]
    assert sorted(p for p, _ in plan["rewrite"]) == ["a", "b", "d"]
    assert plan["rewrite_bytes"] == 65
    assert plan["n_output_files"] == 1
    # empty / all-healthy cases
    assert compaction_plan([], target_bytes=100)["n_output_files"] == 0
    assert compaction_plan([("x", 200)], target_bytes=100)["rewrite"] == []


def test_compact_small_files_end_to_end(spark, tmp_path):
    from inception_spark.operators.layout import (
        compact_small_files,
        list_data_files,
    )

    src = str(tmp_path / "frag")
    docs = spark.range(2000).selectExpr("id", "id * 2 AS v")
    docs.repartition(32).write.parquet(src)  # 32 tiny files
    n_before = len(list_data_files(spark, src))
    assert n_before >= 32

    plan = compact_small_files(spark, src, target_bytes=64 * 1024)
    assert len(plan["rewrite"]) == n_before  # everything undersized
    out = plan["out_path"]
    n_after = len(list_data_files(spark, out))
    assert n_after < n_before
    # data identical (same rows, nothing lost or duplicated)
    a = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert a == b


def test_compact_passes_healthy_files_through(spark, tmp_path):
    from inception_spark.operators.layout import (
        compact_small_files,
        list_data_files,
    )

    src = str(tmp_path / "mixed")
    # one big file
    spark.range(200000).selectExpr(
        "id", "repeat('x', 64) AS pad"
    ).coalesce(1).write.parquet(src)
    # plus tiny appended files
    spark.range(10).selectExpr(
        "id + 1000000 AS id", "repeat('y', 4) AS pad"
    ).repartition(8).write.mode("append").parquet(src)

    files = list_data_files(spark, src)
    target = 256 * 1024
    big = [p for p, n in files if n >= target]
    assert big, "fixture needs one healthy file"

    plan = compact_small_files(spark, src, target_bytes=target)
    assert [p for p, _ in plan["keep"]] == big
    out = plan["out_path"]
    a = sorted(r["id"] for r in spark.read.parquet(src).collect())
    b = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert a == b
    # healthy bytes are FS-copied, not re-encoded: the kept file appears
    # in the output byte-identical (same name, same size)
    out_files = dict(
        (p.rsplit("/", 1)[-1], n) for p, n in list_data_files(spark, out)
    )
    for p, n in plan["keep"]:
        assert out_files[p.rsplit("/", 1)[-1]] == n
    assert plan["copied_bytes"] == sum(n for _, n in plan["keep"])


def test_compact_refuses_hive_partitioned(spark, tmp_path):
    from inception_spark.operators.layout import compact_small_files

    src = str(tmp_path / "hive")
    spark.range(100).selectExpr(
        "id", "id % 3 AS k"
    ).write.partitionBy("k").parquet(src)
    with pytest.raises(ValueError, match="Hive-partitioned"):
        compact_small_files(spark, src, target_bytes=1024)


def test_compact_empty_source_creates_output(spark, tmp_path):
    from inception_spark.operators.layout import (
        compact_small_files,
        list_data_files,
    )

    src = tmp_path / "empty"
    src.mkdir()
    plan = compact_small_files(spark, str(src), target_bytes=1024)
    assert plan["rewrite"] == [] and plan["keep"] == []
    assert (tmp_path / "empty_compacted").is_dir()
    assert list_data_files(spark, plan["out_path"]) == []


def test_finalize_compaction_swaps_atomically(spark, tmp_path):
    from inception_spark.operators.layout import (
        compact_small_files,
        finalize_compaction,
    )

    src = str(tmp_path / "t")
    spark.range(500).selectExpr("id").repartition(8).write.parquet(src)
    plan = compact_small_files(spark, src, target_bytes=1 << 20)
    backup = finalize_compaction(spark, src, plan["out_path"])
    # table path now serves the compacted copy; original preserved
    assert sorted(
        r["id"] for r in spark.read.parquet(src).collect()
    ) == list(range(500))
    assert backup.endswith("_precompact")
    assert sorted(
        r["id"] for r in spark.read.parquet(backup).collect()
    ) == list(range(500))
    # a second swap without reclaiming the backup is refused
    with pytest.raises(ValueError, match="already exists"):
        finalize_compaction(spark, src, plan["out_path"])


def test_compaction_plan_stats_matches_dict_planner(spark, tmp_path):
    """The relational plan accounting == the dict planner == the real
    compaction's observed accounting, over a real mixed directory."""
    from inception_spark.operators.layout import (
        compact_small_files,
        compaction_plan,
        compaction_plan_stats,
        list_data_files,
    )

    src = str(tmp_path / "mixed")
    spark.range(200000).selectExpr(
        "id", "repeat('x', 64) AS pad"
    ).coalesce(1).write.parquet(src)
    spark.range(10).selectExpr(
        "id + 1000000 AS id", "repeat('y', 4) AS pad"
    ).repartition(8).write.mode("append").parquet(src)

    target = 256 * 1024
    files = list_data_files(spark, src)
    listing = spark.createDataFrame(files, "path string, bytes long")
    [row] = compaction_plan_stats(listing, target_bytes=target).collect()
    d = compaction_plan(files, target_bytes=target)
    assert row["n_small"] == len(d["rewrite"]) > 0
    assert row["n_keep"] == len(d["keep"]) > 0
    assert row["small_bytes"] == d["rewrite_bytes"]
    assert row["n_output_files"] == d["n_output_files"]
    real = compact_small_files(spark, src, target_bytes=target)
    assert row["keep_bytes"] == real["copied_bytes"]


def test_compaction_plan_stats_empty_and_all_healthy(spark):
    from inception_spark.operators.layout import compaction_plan_stats

    empty = spark.createDataFrame([], "path string, bytes long")
    [r] = compaction_plan_stats(empty, target_bytes=100).collect()
    assert tuple(r) == (0, 0, 0, 0, 0)
    healthy = spark.createDataFrame(
        [("a", 500), ("b", 900)], "path string, bytes long"
    )
    [r] = compaction_plan_stats(healthy, target_bytes=100).collect()
    assert tuple(r) == (0, 2, 0, 1400, 0)


def test_parquet_rowgroup_stats_multifile(spark, tmp_path):
    """Footer audit over a multi-file dir: per-row-group fences match
    the written sort, and only footers are read (metadata-sized I/O is
    implied by the pyarrow API used — asserted here at the row level)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from inception_spark.operators.layout import parquet_rowgroup_stats

    d = tmp_path / "t"
    d.mkdir()
    pq.write_table(
        pa.table({"k": list(range(100))}), str(d / "a.parquet"),
        row_group_size=40,
    )
    pq.write_table(
        pa.table({"k": list(range(100, 130))}), str(d / "b.parquet"),
        row_group_size=40,
    )
    out = parquet_rowgroup_stats(spark, str(d), column="k").collect()
    by_key = {
        (r["file"].rsplit("/", 1)[-1], r["rg"]):
            (r["n_rows"], r["min_v"], r["max_v"])
        for r in out
    }
    assert by_key == {
        ("a.parquet", 0): (40, 0, 39),
        ("a.parquet", 1): (40, 40, 79),
        ("a.parquet", 2): (20, 80, 99),
        ("b.parquet", 0): (30, 100, 129),
    }


def test_assign_global_ids_matches_row_number(spark):
    """Two-phase IDs == row_number() OVER (ORDER BY k) for unique keys,
    across partition counts (1 partition = degenerate offsets path)."""
    from pyspark.sql import Window, functions as F

    from inception_spark.operators.layout import assign_global_ids

    df = spark.range(0, 257).select(
        F.col("id"), ((F.col("id") * 37) % 257).alias("k")
    )
    want = [
        (r.k, r.rn)
        for r in df.select(
            "k", F.row_number().over(Window.orderBy("k")).alias("rn")
        ).collect()
    ]
    for nparts in (1, 5, 64):
        got = sorted(
            (r.k, r.row_id)
            for r in assign_global_ids(
                df, ["k"], num_partitions=nparts
            ).collect()
        )
        assert got == sorted(want), nparts


def test_assign_global_ids_empty(spark):
    from inception_spark.operators.layout import assign_global_ids

    e = spark.createDataFrame([], "a long")
    out = assign_global_ids(e, ["a"])
    assert out.count() == 0 and "row_id" in out.columns


def test_rendezvous_shards_stability_and_balance(spark):
    """HRW assignment: (a) deterministic and within [0, n); (b) growing
    16 -> 17 shards moves roughly 1/17 of keys (and NEVER more than a
    mod-N layout's near-total reshuffle); (c) ties break to the first
    (smallest) shard by array_position semantics."""
    from inception_spark.operators.layout import (
        rendezvous_shards,
        reshard_movement_report,
    )

    df = spark.range(2000).withColumnRenamed("id", "k")
    a = rendezvous_shards(df, key_col="k", n_shards=16)
    rows = a.collect()
    assert all(0 <= r["shard"] < 16 for r in rows)
    again = {r["key"]: r["shard"]
             for r in rendezvous_shards(
                 df.repartition(7), key_col="k", n_shards=16).collect()}
    assert {r["key"]: r["shard"] for r in rows} == again
    rep = reshard_movement_report(
        df, key_col="k", n_from=16, n_to=17
    ).collect()[0]
    assert rep["n_keys"] == 2000
    assert rep["minimal_milli"] == 1000 * 1 // 17
    # expectation is ~58.8/1000; allow generous sampling noise but pin
    # the order of magnitude (a mod-N reshard would be ~940/1000)
    assert 20 <= rep["moved_milli"] <= 120
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure codegen scan, no shuffle


def test_two_level_rendezvous_range_and_stability(spark):
    """Two-level HRW: shards cover [0, groups*spg), deterministic under
    repartition, and growing sub-shards within groups moves only a
    ~1/(spg+1) fraction (measured against a direct recompute)."""
    from inception_spark.operators.layout import (
        rendezvous_shards_two_level,
    )

    df = spark.range(1500).withColumnRenamed("id", "k")
    a = {r["key"]: r["shard"]
         for r in rendezvous_shards_two_level(
             df, key_col="k", n_groups=8, shards_per_group=8).collect()}
    assert all(0 <= s < 64 for s in a.values())
    assert len(set(a.values())) > 32  # spread, not collapsed
    b = {r["key"]: r["shard"]
         for r in rendezvous_shards_two_level(
             df.repartition(5), key_col="k",
             n_groups=8, shards_per_group=8).collect()}
    assert a == b
    # grow within-group 8 -> 9: group assignment is untouched, so
    # every key stays in its group; only the sub-shard can move
    c = {r["key"]: r["shard"]
         for r in rendezvous_shards_two_level(
             df, key_col="k", n_groups=8, shards_per_group=9).collect()}
    moved = sum(1 for k in a if a[k] // 8 != c[k] // 9)
    assert moved == 0  # same group before/after
    sub_moved = sum(1 for k in a if a[k] % 8 != c[k] % 9)
    assert sub_moved <= len(a) * 0.25  # ~1/9 expected, generous bound


def test_hilbert_box_prefixes_geometry():
    from inception_spark.operators.layout import hilbert_box_prefixes

    allp = hilbert_box_prefixes(
        [(0, 65535), (0, 65535)], bits=16, prefix_bits=8
    )
    assert allp == list(range(256))
    one = hilbert_box_prefixes([(0, 0), (0, 0)], bits=16, prefix_bits=8)
    assert len(one) == 1
    # a thin x-strip intersects exactly the 16 squares of that column
    strip = hilbert_box_prefixes(
        [(0, 4095), (0, 65535)], bits=16, prefix_bits=8
    )
    assert len(strip) == 16
    import pytest as _pytest

    with _pytest.raises(ValueError, match="even"):
        hilbert_box_prefixes([(0, 1), (0, 1)], prefix_bits=7)


def test_hilbert_layout_prunes_and_matches(spark, tmp_path):
    """Hilbert pruned scan == raw filter (the zorder contract), plus
    the Hilbert-specific tightness claim: for a small square box the
    Hilbert prefix set is NO LARGER than the Morton prefix set (the
    adjacency property means a compact box never needs the Z-curve's
    L-shaped extra cells)."""
    from inception_spark.operators.layout import (
        hilbert_box_prefixes,
        hilbert_pruned_scan,
        write_hilbert_layout,
    )

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "event_id",
            F.pmod(F.col("user_id"), F.lit(1 << 16)).alias("cx"),
            F.pmod(F.xxhash64("event_id"), F.lit(1 << 16)).alias("cy"),
        )
    )
    path = str(tmp_path / "hilbert")
    write_hilbert_layout(ev, path, ["cx", "cy"], bits=16, prefix_bits=8)

    box = [(0, 2000), (0, 20000)]
    pruned = hilbert_pruned_scan(spark, path, ["cx", "cy"], box)
    f = pruned._jdf.queryExecution().executedPlan().toString()
    assert "hprefix" in f

    raw = ev.where(
        (F.col("cx") >= 0) & (F.col("cx") <= 2000)
        & (F.col("cy") >= 0) & (F.col("cy") <= 20000)
    )
    assert sorted(
        (r["event_id"], r["cx"], r["cy"]) for r in pruned.collect()
    ) == sorted((r["event_id"], r["cx"], r["cy"]) for r in raw.collect())

    n_h = len(hilbert_box_prefixes(box, bits=16, prefix_bits=8))
    n_z = len(zorder_box_prefixes(box, bits=16, prefix_bits=8))
    assert n_h < 256
    assert n_h <= n_z
