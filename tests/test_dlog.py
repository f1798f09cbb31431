"""dlog commit-log tables: protocol, OCC, pruning, CDF, time travel.

The oracle sweep (tests/test_entry.py) proves every read surface
against DuckDB closed forms; these tests pin the PROTOCOL properties
the oracles cannot see — atomic commit conflicts, typed log-corruption
errors, that fence pruning actually removed paths from the scan, and
that every version's snapshot is internally consistent with the log's
row accounting.
"""

import json
import os

import pytest

from inception_spark.sources import dlog as D


@pytest.fixture(scope="module")
def table(spark, sf_dir):
    return D.build_orders_dlog(spark, sf_dir)


# ---------------------------------------------------------------------------
# protocol
# ---------------------------------------------------------------------------


def test_occ_conflict_is_typed(table):
    """Two writers racing for the same version: the second O_EXCL
    create must raise DlogConflictError, and the log must be unchanged
    by the loser."""
    v = D.latest_version(table)
    before = D.read_log(table)
    with pytest.raises(D.DlogConflictError):
        D.dlog_commit(table, v, [{"commit": {"op": "noop", "version": v}}])
    assert D.read_log(table) == before


def test_commit_then_conflict_on_next(tmp_path):
    t = str(tmp_path / "t")
    D.dlog_commit(t, 0, [{"commit": {"op": "load", "version": 0}}])
    D.dlog_commit(t, 1, [{"commit": {"op": "append", "version": 1}}])
    with pytest.raises(D.DlogConflictError):
        D.dlog_commit(t, 1, [{"commit": {"op": "late", "version": 1}}])
    assert [v for v, _ in D.read_log(t)] == [0, 1]


def test_log_gap_is_typed(tmp_path):
    t = str(tmp_path / "t")
    D.dlog_commit(t, 0, [{"commit": {"op": "load", "version": 0}}])
    D.dlog_commit(t, 2, [{"commit": {"op": "skip", "version": 2}}])
    with pytest.raises(D.DlogFormatError, match="gap"):
        D.read_log(t)


def test_corrupt_log_lines_are_typed(tmp_path):
    t = str(tmp_path / "t")
    d = t + "/_dlog"
    os.makedirs(d)
    with open(d + "/00000000.json", "w") as fh:
        fh.write("{not json\n")
    with pytest.raises(D.DlogFormatError, match="not JSON"):
        D.read_log(t)
    with open(d + "/00000000.json", "w") as fh:
        fh.write(json.dumps({"frobnicate": 1}) + "\n")
    with pytest.raises(D.DlogFormatError, match="unknown action"):
        D.read_log(t)
    with open(d + "/00000000.json", "w") as fh:
        fh.write(json.dumps({"remove": {"grp": "gone", "rows": 1}}) + "\n")
    with pytest.raises(D.DlogFormatError, match="unknown group"):
        D.snapshot_groups(t)


def test_missing_table_is_typed(tmp_path):
    with pytest.raises(D.DlogFormatError, match="_dlog"):
        D.read_log(str(tmp_path / "nope"))


def test_version_out_of_range_is_typed(table):
    with pytest.raises(D.DlogFormatError, match="out of range"):
        D.snapshot_groups(table, 99)


# ---------------------------------------------------------------------------
# the 4-version build: layout + accounting invariants
# ---------------------------------------------------------------------------


def test_build_layout(table):
    log = D.read_log(table)
    assert [v for v, _ in log] == [0, 1, 2, 3]
    assert sorted(D.snapshot_groups(table, 0)) == [
        f"b{i}" for i in range(8)
    ]
    assert sorted(D.snapshot_groups(table, 1)) == sorted(
        [f"b{i}" for i in range(8)] + ["a0", "a1"]
    )
    # v2: b0 fully covered -> retired with NO rewrite; a0 -> c0
    assert sorted(D.snapshot_groups(table, 2)) == sorted(
        [f"b{i}" for i in range(1, 8)] + ["c0", "a1"]
    )
    # v3: b7 + a1 -> u1 (all odd-bucket rows)
    assert sorted(D.snapshot_groups(table)) == sorted(
        [f"b{i}" for i in range(1, 7)] + ["c0", "u1"]
    )


def test_full_cover_delete_has_no_rewrite(table):
    """b0 retired as a pure log edit: version 2 must contain a remove
    of b0 and NO add whose rows came from b0's key range."""
    v2 = dict(D.read_log(table))[2]
    removed = {a["remove"]["grp"] for a in v2 if "remove" in a}
    assert removed == {"b0", "a0"}
    added = {a["add"]["grp"] for a in v2 if "add" in a}
    assert added == {"c0"}


def test_snapshot_rows_match_log_accounting(spark, table):
    """Every version: scanning the snapshot must count exactly the
    log's running live_rows — files and log never drift."""
    hist = {r["version"]: r["live_rows"]
            for r in D.dlog_history(spark, table).collect()}
    for v in range(4):
        assert D.read_snapshot(spark, table, v).count() == hist[v]


def test_fences_are_tight(spark, table):
    """Logged min/max per group equal the group's actual min/max."""
    for g, a in D.snapshot_groups(table).items():
        df = D._read_groups(spark, table, [a])
        row = df.agg({"o_orderkey": "min"}).collect()[0]
        mn = row[0]
        mx = df.agg({"o_orderkey": "max"}).collect()[0][0]
        assert (mn, mx) == (a["min_k"], a["max_k"]), g


# ---------------------------------------------------------------------------
# pruning: the scan must actually skip files
# ---------------------------------------------------------------------------


def test_pruned_read_scans_only_overlapping_groups(spark, table):
    """The PLANNED scan set (df.inputFiles()) after fence pruning is
    exactly the overlapping groups — b3 (the range itself) plus the
    two wide-fence rewrite groups c0/u1 (c0's even buckets hold no
    bucket-3 ROWS, but its fences straddle the range, so it is
    honestly scanned: fences can over-scan, never under-scan)."""
    from pyspark.sql import functions as F

    w = D._w_of(table)
    df = D.read_snapshot(spark, table, key_range=(3 * w, 4 * w))
    groups = {
        p.split("grp=")[1].split("/")[0] for p in df.inputFiles()
    }
    assert groups == {"b3", "c0", "u1"}
    # and the rows that SURVIVE the filter come from b3/u1 only (c0
    # holds even buckets — none in [3W, 4W))
    row_groups = {
        r["fp"].split("grp=")[1].split("/")[0]
        for r in df.select(F.input_file_name().alias("fp"))
        .distinct()
        .collect()
    }
    assert row_groups == {"b3", "u1"}


def test_pruned_equals_unpruned_filter(spark, table):
    from pyspark.sql import functions as F

    w = D._w_of(table)
    pruned = D.read_snapshot(spark, table, key_range=(3 * w, 4 * w))
    full = D.read_snapshot(spark, table).filter(
        (F.col("o_orderkey") >= 3 * w) & (F.col("o_orderkey") < 4 * w)
    )
    assert sorted(pruned.collect()) == sorted(full.collect())


def test_empty_prune_returns_empty(spark, table):
    assert (
        D.read_snapshot(spark, table, key_range=(-100, 0)).count() == 0
    )


# ---------------------------------------------------------------------------
# CDF
# ---------------------------------------------------------------------------


def test_cdf_applied_to_old_snapshot_yields_new(spark, table):
    """The feed is sufficient: v1 rows − deletes − update preimages +
    update postimages + inserts == v3 rows (compared as full row
    multisets via counts + key/price sums per status)."""
    from pyspark.sql import functions as F

    w = D._w_of(table)
    v1 = D.read_snapshot(spark, table, 1)
    v3 = D.read_snapshot(spark, table, 3)
    rebuilt = v1.filter(F.col("o_orderkey") >= w).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") >= 7 * w,
            F.col("o_totalprice") + F.lit(1.0),
        ).otherwise(F.col("o_totalprice")),
    )
    assert sorted(rebuilt.collect()) == sorted(v3.collect())


def test_optimize_preserves_content_and_coalesces(spark, sf_dir):
    """OPTIMIZE (v4 on the hard-linked twin) must not change a single
    row while replacing the 8 fragmented groups with 4 key-range
    groups; re-running is a no-op."""
    base = D.build_orders_dlog(spark, sf_dir)
    opt = D.build_orders_dlog_optimized(spark, sf_dir)
    assert opt != base
    assert D.latest_version(base) == 3  # base untouched
    assert D.latest_version(opt) == 4
    assert sorted(D.snapshot_groups(opt)) == ["o0", "o1", "o2", "o3"]
    a = sorted(D.read_snapshot(spark, base).collect())
    b = sorted(D.read_snapshot(spark, opt).collect())
    assert a == b
    D.dlog_optimize(spark, opt)  # idempotent: last commit is optimize
    assert D.latest_version(opt) == 4


def test_optimize_max_rows_selects_small_groups_only(spark, sf_dir, tmp_path):
    """The production path: with max_rows set, only groups at or under
    the threshold rewrite; big groups keep their identity."""
    import shutil

    base = D.build_orders_dlog(spark, sf_dir)
    t = str(tmp_path / "t")
    shutil.copytree(base, t, copy_function=os.link)
    sizes = sorted(
        a["rows"] for a in D.snapshot_groups(t).values()
    )
    thresh = sizes[0]  # only the smallest group(s) qualify
    before = D.snapshot_groups(t)
    D.dlog_optimize(spark, t, max_rows=thresh)
    after = D.snapshot_groups(t)
    kept = {g for g in before if before[g]["rows"] > thresh}
    assert kept <= set(after)
    assert D.read_snapshot(spark, t).count() == D.read_snapshot(
        spark, base
    ).count()


def test_merge_upsert_semantics(spark, sf_dir):
    """MERGE replaces matched keys and inserts unmatched keys exactly
    once; untouched keys keep their snapshot price; the base table
    stays at v3."""
    from pyspark.sql import functions as F

    base = D.build_orders_dlog(spark, sf_dir)
    mrg = D.build_orders_dlog_merged(spark, sf_dir)
    assert mrg != base and D.latest_version(base) == 3
    assert D.latest_version(mrg) == 4
    w = D._w_of(mrg)
    pre = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in D.read_snapshot(spark, base).collect()
    }
    post = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in D.read_snapshot(spark, mrg).collect()
    }
    inserted = {k for k in post if k not in pre}
    assert inserted and all(k >= 8 * w for k in inserted)
    for k, p in pre.items():
        want = p + 10.0 if k % 10 == 0 else p
        assert post[k] == want, k
    # fresh insert groups exist beyond the old key space
    assert any(
        a["min_k"] >= 8 * w
        for a in D.snapshot_groups(mrg).values()
    )


def test_schema_evolution_null_fills_old_groups(spark, sf_dir):
    """The evolve commit widens the schema via a metaData log edit:
    pre-evolve groups read NULL in the new column, the re-insert group
    carries real values, and the base table is untouched."""
    import os as _os

    from pyspark.sql import functions as F

    base = D.build_orders_dlog(spark, sf_dir)
    evo = D.build_orders_dlog_evolved(spark, sf_dir)
    assert evo != base and D.latest_version(base) == 3
    assert D.latest_version(evo) == 4
    live = D.snapshot_groups(evo)
    assert "e0" in live
    df = spark.read.schema(D.evolved_schema(evo)).parquet(
        *[_os.path.join(evo, a["path"]) for a in live.values()]
    )
    w = D._w_of(evo)
    old = df.filter(F.col("o_orderkey") >= w)
    new = df.filter(F.col("o_orderkey") < w)
    assert old.filter(F.col("o_orderpriority").isNotNull()).count() == 0
    assert new.filter(F.col("o_orderpriority").isNull()).count() == 0
    assert new.count() > 0


def test_cdf_has_no_inserts_and_balanced_images(spark, sf_dir):
    rows = {
        (r["version"], r["change_type"]): r
        for r in D.dlog_cdf_stats(spark, sf_dir).collect()
    }
    assert not any(ct == "insert" for _, ct in rows)
    pre = rows[(3, "update_preimage")]
    post = rows[(3, "update_postimage")]
    assert pre["n_rows"] == post["n_rows"]
    assert pre["sum_key"] == post["sum_key"]
    # every touched row gained exactly +1.00
    assert post["sum_price"] == pytest.approx(
        pre["sum_price"] + pre["n_rows"], abs=1e-6
    )
