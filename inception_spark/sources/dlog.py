"""dlog — a from-scratch transaction-log table format (lakehouse layer).

The reference engine serves a fixed corpus; a 100 TB training-data
fleet serves a LIVING one — appends land hourly, takedowns and
relicensing force deletes, quality passes rewrite documents in place.
The storage primitive for that is the commit-log table (the public
Delta/Iceberg design): immutable parquet file groups plus an ordered
log of JSON commits, where each commit ADDs and REMOVEs whole groups.
Everything a query needs — snapshot isolation, time travel, change
feeds, stats-based file skipping, optimistic concurrency — falls out
of replaying a few KB of log, never scanning data.

This module implements that protocol from scratch (no Delta/Iceberg
import; the format is ours):

* ``data/v{N}/grp={G}`` — immutable parquet file groups, written ONCE
  by the version that adds them (one distributed partitioned write per
  commit: a single shuffle by group, then task-parallel file writes).
* ``_dlog/{N:08d}.json`` — one JSONL commit per version: ``add``
  actions carry per-group row counts and min/max KEY FENCES, ``remove``
  actions carry the retired group + its row count, a trailing
  ``commit`` action names the operation.
* Optimistic concurrency: a commit is ``O_CREAT|O_EXCL`` on the next
  version's log file — two racing writers cannot both win; the loser
  gets a typed ``DlogConflictError`` and must re-read + retry.

Scale shape (the whole point): the log is CONTROL PLANE — KB-sized,
replayed driver-side, exactly as Delta's driver replays its log — while
every data touch is a distributed parquet scan of only the LIVE groups,
and predicates prune groups by fence BEFORE the scan is planned.
Copy-on-write delete/update rewrites only the groups whose fences
overlap the predicate (a fully-covered group retires with no rewrite at
all), so maintenance cost is proportional to touched data, not table
size.  The change feed diffs only REWRITTEN groups pre/post — never the
table — so CDF cost is proportional to the change, the property that
makes downstream incremental consumers (the IVM family in
``plans/relational.py``) viable at 100 TB.

Correctness story: the 4-version ``orders`` build below is fully
deterministic, so every read surface has a CLOSED-FORM DuckDB oracle
over the ORIGINAL orders table — snapshot and time-travel aggregates,
per-group fence stats (the oracle recomputes each group's min/max from
data alone: wrong fences, wrong plan, or a lost row all hash-mismatch),
pruned reads (a wrongly-skipped group drops rows → mismatch), the
change feed, and the per-version history accounting.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DlogFormatError(ValueError):
    """Typed error for a corrupt/unreadable commit log."""


class DlogConflictError(RuntimeError):
    """Another writer committed this version first — re-read and retry."""


_LOG_DIR = "_dlog"


# ---------------------------------------------------------------------------
# log read/write (control plane: KB-sized JSONL, driver-side by design)
# ---------------------------------------------------------------------------


def dlog_commit(table: str, version: int, actions: list[dict]) -> None:
    """Atomically publish ``actions`` as ``version``.  The O_EXCL
    create IS the concurrency control: exactly one writer can create
    ``_dlog/{version:08d}.json``; every other racer raises
    ``DlogConflictError`` (the public Delta protocol's put-if-absent
    contract)."""
    d = os.path.join(table, _LOG_DIR)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{version:08d}.json")
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as exc:
        raise DlogConflictError(
            f"version {version} already committed by another writer"
        ) from exc
    with os.fdopen(fd, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a, sort_keys=True) + "\n")


def read_log(table: str) -> list[tuple[int, list[dict]]]:
    """Replay input: the ordered list of (version, actions).  Versions
    must be contiguous from 0; any gap, non-JSON line, or unknown
    action key is a typed error (a torn commit must not silently
    truncate history)."""
    d = os.path.join(table, _LOG_DIR)
    if not os.path.isdir(d):
        raise DlogFormatError(f"no {_LOG_DIR} directory under {table}")
    names = sorted(n for n in os.listdir(d) if n.endswith(".json"))
    out: list[tuple[int, list[dict]]] = []
    for i, name in enumerate(names):
        try:
            v = int(name[:-5])
        except ValueError as exc:
            raise DlogFormatError(f"bad log filename {name!r}") from exc
        if v != i:
            raise DlogFormatError(
                f"log gap: expected version {i}, found {name!r}"
            )
        actions = []
        with open(os.path.join(d, name)) as fh:
            for ln, line in enumerate(fh):
                if not line.strip():
                    continue
                try:
                    a = json.loads(line)
                except json.JSONDecodeError as exc:
                    raise DlogFormatError(
                        f"{name}:{ln + 1}: not JSON: {exc}"
                    ) from exc
                if not isinstance(a, dict) or not (
                    a.keys() & {"add", "remove", "commit", "meta"}
                ):
                    raise DlogFormatError(
                        f"{name}:{ln + 1}: unknown action {a!r}"
                    )
                actions.append(a)
        out.append((v, actions))
    if not out:
        raise DlogFormatError(f"empty log under {table}")
    return out


def snapshot_groups(
    table: str, version: int | None = None
) -> dict[str, dict]:
    """Replay the log up to ``version`` (inclusive; None = latest) →
    {group_id: add-action} for the LIVE groups of that snapshot."""
    log = read_log(table)
    if version is None:
        version = log[-1][0]
    if not 0 <= version <= log[-1][0]:
        raise DlogFormatError(
            f"version {version} out of range 0..{log[-1][0]}"
        )
    live: dict[str, dict] = {}
    for v, actions in log:
        if v > version:
            break
        for a in actions:
            if "add" in a:
                g = a["add"]["grp"]
                if g in live:
                    raise DlogFormatError(
                        f"v{v}: group {g!r} added twice"
                    )
                live[g] = a["add"]
            elif "remove" in a:
                g = a["remove"]["grp"]
                if g not in live:
                    raise DlogFormatError(
                        f"v{v}: remove of unknown group {g!r}"
                    )
                del live[g]
    return live


def latest_version(table: str) -> int:
    return read_log(table)[-1][0]


# ---------------------------------------------------------------------------
# read surfaces
# ---------------------------------------------------------------------------


def read_snapshot(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    *,
    key_range: tuple[int, int] | None = None,
) -> DataFrame:
    """Snapshot-isolated read: the multi-path parquet scan of the live
    groups at ``version``.  With ``key_range=(lo, hi)`` (half-open),
    groups whose fences miss the range are pruned BEFORE the scan is
    planned — the log's min/max stats doing at group granularity what
    parquet row-group fences do below (and the survivor scan still
    carries the row filter, so a stale fence can only over-read, never
    wrong-answer)."""
    live = snapshot_groups(table, version)
    if key_range is not None:
        lo, hi = key_range
        live = {
            g: a
            for g, a in live.items()
            if a["min_k"] < hi and a["max_k"] >= lo
        }
    if not live:
        return spark.createDataFrame([], _DATA_SCHEMA)
    paths = [os.path.join(table, a["path"]) for a in live.values()]
    df = spark.read.schema(_DATA_SCHEMA).parquet(*paths)
    if key_range is not None:
        df = df.filter(
            (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
        )
    return df


def skipping_plan(
    spark: SparkSession, table: str, lo: int, hi: int
) -> DataFrame:
    """The pruning decision as a queryable table: one row per live
    group with its logged fences and whether a ``[lo, hi)`` key
    predicate scans it.  Control-plane sized (one row per GROUP, like
    ``DESCRIBE DETAIL``) — the oracle recomputes every fence from the
    data itself, so a drifted stat is a hash mismatch, not a silent
    over/under-scan."""
    rows = [
        (
            g,
            int(a["rows"]),
            int(a["min_k"]),
            int(a["max_k"]),
            int(a["min_k"] < hi and a["max_k"] >= lo),
        )
        for g, a in sorted(snapshot_groups(table).items())
    ]
    schema = T.StructType(
        [
            T.StructField("grp", T.StringType(), False),
            T.StructField("n_rows", T.LongType(), False),
            T.StructField("min_k", T.LongType(), False),
            T.StructField("max_k", T.LongType(), False),
            T.StructField("scanned", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def dlog_history(spark: SparkSession, table: str) -> DataFrame:
    """Per-version maintenance accounting replayed from the log alone
    (no data read): groups added/removed, rows written/removed, and the
    running live-row count — the audit surface a fleet queries before
    trusting a table."""
    rows = []
    live = 0
    for v, actions in read_log(table):
        adds = [a["add"] for a in actions if "add" in a]
        rems = [a["remove"] for a in actions if "remove" in a]
        op = next(
            (a["commit"]["op"] for a in actions if "commit" in a), ""
        )
        rw = sum(int(a["rows"]) for a in adds)
        rr = sum(int(a["rows"]) for a in rems)
        live += rw - rr
        rows.append((v, op, len(adds), len(rems), rw, rr, live))
    schema = T.StructType(
        [
            T.StructField("version", T.LongType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("n_adds", T.LongType(), False),
            T.StructField("n_removes", T.LongType(), False),
            T.StructField("rows_written", T.LongType(), False),
            T.StructField("rows_removed", T.LongType(), False),
            T.StructField("live_rows", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def dlog_actions_df(spark: SparkSession, table: str) -> DataFrame:
    """The log flattened to one row per add/remove action — the
    streaming tail's input (each version's actions arrive as a
    micro-batch; per-version sums are exactly mergeable)."""
    rows = []
    for v, actions in read_log(table):
        for a in actions:
            if "add" in a:
                rows.append((v, a["add"]["grp"], "add",
                             int(a["add"]["rows"])))
            elif "remove" in a:
                rows.append((v, a["remove"]["grp"], "remove",
                             int(a["remove"]["rows"])))
    schema = T.StructType(
        [
            T.StructField("version", T.LongType(), False),
            T.StructField("grp", T.StringType(), False),
            T.StructField("action", T.StringType(), False),
            T.StructField("rows", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def dlog_cdf(
    spark: SparkSession, table: str, from_v: int, to_v: int
) -> DataFrame:
    """Change data feed (from_v, to_v]: per-version diff of REWRITTEN
    groups only — removed-group rows vs added-group rows, anti-joined
    on the key for inserts/deletes, inner-joined for pre/post update
    images.  The table itself is never diffed: cost is proportional to
    the CHANGED groups, which is what makes a change feed usable on a
    100 TB table.  Returns the summarized feed (change_type × version
    counters) — exactly mergeable, so the oracle states it in closed
    form."""
    if not from_v <= to_v:
        raise DlogFormatError(f"bad CDF range ({from_v}, {to_v}]")
    out = None
    for v in range(from_v + 1, to_v + 1):
        pre = snapshot_groups(table, v - 1)
        post = snapshot_groups(table, v)
        removed = [a for g, a in pre.items() if g not in post]
        added = [a for g, a in post.items() if g not in pre]
        pre_df = _read_groups(spark, table, removed)
        post_df = _read_groups(spark, table, added)
        key = ["o_orderkey"]
        deletes = pre_df.join(post_df.select(*key), key, "left_anti")
        inserts = post_df.join(pre_df.select(*key), key, "left_anti")
        joined = pre_df.alias("p").join(
            post_df.alias("q"), key, "inner"
        )
        changed = joined.filter(
            F.col("p.o_totalprice") != F.col("q.o_totalprice")
        )
        upd_pre = changed.select(
            "o_orderkey", F.col("p.o_totalprice").alias("o_totalprice")
        )
        upd_post = changed.select(
            "o_orderkey", F.col("q.o_totalprice").alias("o_totalprice")
        )
        batch = None
        for ct, df in [
            ("delete", deletes),
            ("insert", inserts),
            ("update_preimage", upd_pre),
            ("update_postimage", upd_post),
        ]:
            part = df.agg(
                F.count("*").cast("long").alias("n_rows"),
                F.coalesce(
                    F.sum("o_orderkey"), F.lit(0)
                ).cast("long").alias("sum_key"),
                F.coalesce(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)")),
                    F.lit(0),
                ).cast("decimal(18,2)").alias("sum_price_dec"),
            ).select(
                F.lit(v).cast("long").alias("version"),
                F.lit(ct).alias("change_type"),
                "n_rows",
                "sum_key",
                "sum_price_dec",
            )
            batch = part if batch is None else batch.unionByName(part)
        out = batch if out is None else out.unionByName(batch)
    return (
        out.filter(F.col("n_rows") > 0)
        .select(
            "version",
            "change_type",
            "n_rows",
            "sum_key",
            F.col("sum_price_dec").cast("double").alias("sum_price"),
        )
        .orderBy("version", "change_type")
    )


def dlog_cdf_rows(
    spark: SparkSession, table: str, from_v: int, to_v: int
) -> DataFrame:
    """Row-level change feed (from_v, to_v]: full pre/post images with
    a change_type column — what an incremental CONSUMER (IVM rollup,
    downstream sync) subscribes to.  Same rewritten-groups-only diff
    as the summarized feed: cost proportional to the change."""
    if not from_v <= to_v:
        raise DlogFormatError(f"bad CDF range ({from_v}, {to_v}]")
    key = "o_orderkey"
    out = None
    for v in range(from_v + 1, to_v + 1):
        pre = snapshot_groups(table, v - 1)
        post = snapshot_groups(table, v)
        pre_df = _read_groups(
            spark, table, [a for g, a in pre.items() if g not in post]
        )
        post_df = _read_groups(
            spark, table, [a for g, a in post.items() if g not in pre]
        )
        deletes = pre_df.join(
            post_df.select(key), key, "left_anti"
        ).select("*", F.lit("delete").alias("change_type"))
        inserts = post_df.join(
            pre_df.select(key), key, "left_anti"
        ).select("*", F.lit("insert").alias("change_type"))
        j = pre_df.alias("p").join(post_df.alias("q"), key, "inner")
        changed = j.filter(
            F.col("p.o_totalprice") != F.col("q.o_totalprice")
        )
        upd_pre = changed.select(
            F.col(key),
            F.col("p.o_custkey").alias("o_custkey"),
            F.col("p.o_orderstatus").alias("o_orderstatus"),
            F.col("p.o_totalprice").alias("o_totalprice"),
            F.lit("update_preimage").alias("change_type"),
        )
        upd_post = changed.select(
            F.col(key),
            F.col("q.o_custkey").alias("o_custkey"),
            F.col("q.o_orderstatus").alias("o_orderstatus"),
            F.col("q.o_totalprice").alias("o_totalprice"),
            F.lit("update_postimage").alias("change_type"),
        )
        batch = (
            deletes.unionByName(inserts)
            .unionByName(upd_pre)
            .unionByName(upd_post)
            .withColumn("version", F.lit(v).cast("long"))
        )
        out = batch if out is None else out.unionByName(batch)
    return out


def dlog_cdf_ivm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDF driving an incremental consumer end-to-end: a
    per-status revenue rollup built at version 1 and MAINTAINED purely
    from the change feed (deletes and update preimages retract, inserts
    and postimages insert — the IVM counting algorithm over
    plans/ivm.py) must equal recomputing over the final snapshot,
    which is exactly what the shared snapshot oracle states.  History
    is never re-read: every fold is change-sized."""
    from ..plans.ivm import ivm_apply, ivm_state

    table = build_orders_dlog(spark, sf_dir)
    state = ivm_state(
        read_snapshot(spark, table, 1), ["o_orderstatus"],
        "o_totalprice",
    )
    rows = dlog_cdf_rows(spark, table, 1, 3)
    deltas = rows.withColumn(
        "mult",
        F.when(
            F.col("change_type").isin("delete", "update_preimage"),
            F.lit(-1),
        ).otherwise(F.lit(1)),
    )
    final = ivm_apply(
        state, deltas, ["o_orderstatus"], "o_totalprice"
    )
    return final.select(
        "o_orderstatus",
        F.col("n").cast("long").alias("n_orders"),
        F.col("s").cast("double").alias("sum_price"),
    ).orderBy("o_orderstatus")


def dlog_cdf_delta_partials(batch: DataFrame) -> DataFrame:
    """Per-batch IVM delta partials from row-level change-feed rows
    (with their ``mult``): signed decimal/count sums per status —
    commutative and exactly mergeable, so ANY regrouping of change
    rows into micro-batches re-merges identically."""
    return batch.groupBy("o_orderstatus").agg(
        F.sum(
            F.col("mult")
            * F.col("o_totalprice").cast("decimal(18,2)")
        ).cast("decimal(18,2)").alias("ds"),
        F.sum("mult").cast("long").alias("dn"),
    )


def dlog_cdf_ivm_from_partials(
    state: DataFrame, parts: DataFrame
) -> DataFrame:
    """v1 state + merged delta partials → the maintained rollup."""
    base = state.select(
        "o_orderstatus",
        F.col("s").cast("decimal(18,2)").alias("ds"),
        F.col("n").cast("long").alias("dn"),
    )
    return (
        base.unionByName(parts)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("ds").cast("decimal(18,2)").alias("s"),
            F.sum("dn").cast("long").alias("n"),
        )
        .filter(F.col("n") > 0)
        .select(
            "o_orderstatus",
            F.col("n").cast("long").alias("n_orders"),
            F.col("s").cast("double").alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


def dlog_vacuum_plan(spark: SparkSession, table: str,
                     retain_from: int) -> DataFrame:
    """VACUUM candidates: groups REMOVED at a version strictly before
    ``retain_from`` are no longer reachable by any retained snapshot
    and may be physically deleted.  Pure log replay (control plane);
    the entry's oracle re-derives each retired group's row count from
    the raw rows via the closed-form membership of the build."""
    removed: list[tuple[str, int, int]] = []
    for v, actions in read_log(table):
        for a in actions:
            if "remove" in a:
                removed.append(
                    (a["remove"]["grp"], v, int(a["remove"]["rows"]))
                )
    rows = [
        (g, v, n, int(v < retain_from))
        for g, v, n in sorted(removed)
    ]
    schema = T.StructType(
        [
            T.StructField("grp", T.StringType(), False),
            T.StructField("removed_at", T.LongType(), False),
            T.StructField("n_rows", T.LongType(), False),
            T.StructField("deletable", T.LongType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _read_groups(
    spark: SparkSession, table: str, adds: list[dict]
) -> DataFrame:
    if not adds:
        return spark.createDataFrame([], _DATA_SCHEMA)
    return spark.read.schema(_DATA_SCHEMA).parquet(
        *[os.path.join(table, a["path"]) for a in adds]
    )


_DATA_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
    ]
)


# ---------------------------------------------------------------------------
# write path: one distributed partitioned write + one stats pass per commit
# ---------------------------------------------------------------------------


def write_groups(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    version: int,
    grp_col,
) -> list[dict]:
    """Write ``df`` as immutable file groups under ``data/v{N}/`` — ONE
    shuffle (partitionBy the group key) with task-parallel parquet
    writes — and return the add-actions with per-group row counts and
    key fences from one small stats aggregate over the same lineage.
    At fleet scale the stats fold into the write job's task results;
    the two-pass form here keeps the write a stock DataFrame writer."""
    rel = f"data/v{version}"
    (
        df.withColumn("grp", grp_col)
        .repartition("grp")
        .write.partitionBy("grp")
        .mode("errorifexists")
        .parquet(os.path.join(table, rel))
    )
    stats = (
        df.withColumn("grp", grp_col)
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("rows"),
            F.min("o_orderkey").cast("long").alias("min_k"),
            F.max("o_orderkey").cast("long").alias("max_k"),
        )
        .collect()  # control plane: one row per GROUP, never per row
    )
    return [
        {
            "add": {
                "grp": r["grp"],
                "path": f"{rel}/grp={r['grp']}",
                "rows": r["rows"],
                "min_k": r["min_k"],
                "max_k": r["max_k"],
            }
        }
        for r in sorted(stats, key=lambda r: r["grp"])
    ]


# ---------------------------------------------------------------------------
# the deterministic 4-version orders build (fixture + oracle anchor)
# ---------------------------------------------------------------------------

#: memo: one build per (sf_dir) per process — every dlog entry and the
#: streaming tail share the same table within a sweep/bench session
_BUILT: dict[str, str] = {}


def build_orders_dlog(spark: SparkSession, sf_dir: str) -> str:
    """Build the 4-version orders table the oracles are written
    against.  W = max(o_orderkey) DIV 8 + 1; bucket(k) = k DIV W.

    * v0 ``load``   — rows with k%4 != 3 as 8 range groups ``b0..b7``
      (tight, disjoint fences: the clustered-load layout).
    * v1 ``append`` — the k%4 == 3 remainder as 2 groups ``a0``/``a1``
      split by bucket parity (wide fences: the unclustered-append
      layout; a0 spans even buckets 0,2,4,6 / a1 odd 1,3,5,7).
    * v2 ``delete`` — keys < W: ``b0`` fully covered → retired with NO
      rewrite; ``a0`` straddles → rewritten retaining k >= W (group id
      ``c0``); ``a1``'s fence (min ≥ W) prunes it untouched.
    * v3 ``update`` — keys >= 7W get o_totalprice + 1.00 copy-on-write:
      ``b7`` and ``a1`` straddle/cover → rewritten (``u0``/``u1`` by
      bucket parity: all-of-b7 is odd-bucket → u1; c0's fence max < 7W
      prunes it).

    Every version's state is closed-form over orders, so each read
    surface gets a hand-written DuckDB oracle (``*_SQL`` below)."""
    key = os.path.abspath(sf_dir)
    if key in _BUILT and os.path.isdir(
        os.path.join(_BUILT[key], _LOG_DIR)
    ):
        return _BUILT[key]
    import tempfile

    orders = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
    )
    w = orders.agg(
        (F.max("o_orderkey") / 8).cast("long") + 1
    ).collect()[0][0]
    table = tempfile.mkdtemp(prefix="dlog_", dir=_scratch_root())
    bucket = (F.col("o_orderkey") / int(w)).cast("long")

    # v0: clustered load (the meta action records the bucket width so
    # later maintenance commits and readers share one W — no
    # back-derivation from fences)
    a = write_groups(
        spark, table, orders.filter(F.col("o_orderkey") % 4 != 3), 0,
        F.concat(F.lit("b"), bucket.cast("string")),
    )
    dlog_commit(
        table,
        0,
        [{"meta": {"table": "orders_dlog", "w": int(w)}}]
        + a
        + [{"commit": {"op": "load", "version": 0}}],
    )

    # v1: unclustered append
    a = write_groups(
        spark, table, orders.filter(F.col("o_orderkey") % 4 == 3), 1,
        F.concat(F.lit("a"), (bucket % 2).cast("string")),
    )
    dlog_commit(
        table, 1, a + [{"commit": {"op": "append", "version": 1}}]
    )

    # v2: copy-on-write delete of k < W (generic fence-pruned operator)
    _delete_range(spark, table, 0, int(w), 2)

    # v3: copy-on-write update of k >= 7W (price + 1.00)
    _update_price_from(spark, table, 7 * int(w), 3)

    _BUILT[key] = table
    return table


def _delete_range(spark, table, lo, hi, version):
    live = snapshot_groups(table)
    actions, rewrite = [], []
    for g, a in sorted(live.items()):
        if not (a["min_k"] < hi and a["max_k"] >= lo):
            continue
        actions.append(
            {"remove": {"grp": g, "rows": a["rows"], "path": a["path"]}}
        )
        if not (a["min_k"] >= lo and a["max_k"] < hi):
            rewrite.append(a)
    if rewrite:
        kept = _read_groups(spark, table, rewrite).filter(
            ~((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi))
        )
        actions += write_groups(
            spark, table, kept, version,
            F.concat(
                F.lit("c"),
                ((F.col("o_orderkey") / _w_of(table)).cast("long") % 2)
                .cast("string"),
            ),
        )
    actions.append({"commit": {"op": "delete", "version": version}})
    dlog_commit(table, version, actions)


def _update_price_from(spark, table, lo, version):
    live = snapshot_groups(table)
    actions, rewrite = [], []
    for g, a in sorted(live.items()):
        if a["max_k"] < lo:
            continue  # fence miss
        actions.append(
            {"remove": {"grp": g, "rows": a["rows"], "path": a["path"]}}
        )
        rewrite.append(a)
    updated = _read_groups(spark, table, rewrite).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") >= lo,
            F.col("o_totalprice") + F.lit(1.0),
        ).otherwise(F.col("o_totalprice")),
    )
    actions += write_groups(
        spark, table, updated, version,
        F.concat(
            F.lit("u"),
            ((F.col("o_orderkey") / _w_of(table)).cast("long") % 2)
            .cast("string"),
        ),
    )
    actions.append({"commit": {"op": "update", "version": version}})
    dlog_commit(table, version, actions)


def _w_of(table: str) -> int:
    """Bucket width from version 0's meta action."""
    for a in read_log(table)[0][1]:
        if "meta" in a:
            return int(a["meta"]["w"])
    raise DlogFormatError("v0 carries no meta action with bucket width")


def _scratch_root() -> str:
    """Session-scoped scratch (shared with __spark_entry__'s root when
    present, else a plain mkdtemp the caller owns)."""
    try:
        import __spark_entry__ as entry

        return entry._scratch("dlogroot_")
    except Exception:
        import tempfile

        return tempfile.mkdtemp(prefix="dlogroot_")


def dlog_optimize(
    spark: SparkSession, table: str, *, max_rows: int | None = None
) -> None:
    """OPTIMIZE as a commit: coalesce live groups into half as many
    key-range groups (``o{k DIV W DIV 2}``) — the bin-packing rewrite
    that undoes small-file fragmentation from maintenance commits.
    Content is untouched (add/remove row totals balance exactly; the
    oracle re-derives the new layout from data alone).  With
    ``max_rows`` set, only groups at or under it are rewritten (the
    production path: OPTIMIZE touches small files, never the table);
    the fixture entry runs unbounded so the closed form covers every
    row.  Idempotent per table state: a no-op if the last commit is
    already an optimize."""
    log = read_log(table)
    last_op = next(
        (a["commit"]["op"] for a in log[-1][1] if "commit" in a), ""
    )
    if last_op == "optimize":
        return
    version = log[-1][0] + 1
    live = snapshot_groups(table)
    victims = {
        g: a
        for g, a in live.items()
        if max_rows is None or a["rows"] <= max_rows
    }
    if not victims:
        return
    actions = [
        {"remove": {"grp": g, "rows": a["rows"], "path": a["path"]}}
        for g, a in sorted(victims.items())
    ]
    w = _w_of(table)
    merged = _read_groups(spark, table, list(victims.values()))
    actions += write_groups(
        spark, table, merged, version,
        F.concat(
            F.lit("o"),
            ((F.col("o_orderkey") / w).cast("long") / 2)
            .cast("long")
            .cast("string"),
        ),
    )
    actions.append({"commit": {"op": "optimize", "version": version}})
    dlog_commit(table, version, actions)


# ---------------------------------------------------------------------------
# query entries (Spark side)
# ---------------------------------------------------------------------------


#: memo for the optimized twin table (hard-linked copy of the base
#: build + one optimize commit — data files are immutable, so the copy
#: is link-cheap and the base table's version history stays pristine
#: for the other oracles)
_BUILT_OPT: dict[str, str] = {}


def build_orders_dlog_optimized(spark: SparkSession, sf_dir: str) -> str:
    key = os.path.abspath(sf_dir)
    if key in _BUILT_OPT and os.path.isdir(
        os.path.join(_BUILT_OPT[key], _LOG_DIR)
    ):
        return _BUILT_OPT[key]
    import shutil
    import tempfile

    base = build_orders_dlog(spark, sf_dir)
    table = tempfile.mkdtemp(prefix="dlogopt_", dir=_scratch_root())
    shutil.rmtree(table)
    shutil.copytree(base, table, copy_function=os.link)
    dlog_optimize(spark, table)
    _BUILT_OPT[key] = table
    return table


def _status_agg(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


def dlog_snapshot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-snapshot read → per-status rollup.  The aggregate hashes
    against the closed-form final state (delete + update applied), so a
    replay bug, a lost rewrite row, or a double-counted group all
    mismatch."""
    table = build_orders_dlog(spark, sf_dir)
    return _status_agg(read_snapshot(spark, table))


def dlog_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS OF version 1 (after append, before delete/update): the
    time-travel read must see every original row unmodified — the
    snapshot-isolation guarantee stated as a query."""
    table = build_orders_dlog(spark, sf_dir)
    return _status_agg(read_snapshot(spark, table, version=1))


def dlog_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fence-pruned range read (bucket 3: [3W, 4W)) → rollup.  Only 3
    of the 8 live groups survive pruning (b3, c0, u1 — asserted in
    tests over the scan's input paths); value-hash equality with the
    predicate oracle proves pruning lost nothing."""
    table = build_orders_dlog(spark, sf_dir)
    w = _w_of(table)
    return _status_agg(
        read_snapshot(spark, table, key_range=(3 * w, 4 * w))
    )


def dlog_skipping_plan_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-group fences + the pruning decision for the bucket-3 range
    — the oracle recomputes min/max/rows per group FROM DATA via the
    closed-form group assignment, so logged stats must equal data
    truth."""
    table = build_orders_dlog(spark, sf_dir)
    w = _w_of(table)
    return skipping_plan(spark, table, 3 * w, 4 * w).orderBy("grp")


def dlog_cdf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Summarized change feed over (v1, v3]: the delete shows up as
    version-2 'delete' rows (all keys < W), the update as version-3
    pre/post image pairs (keys >= 7W, post = pre + 1.00 each)."""
    table = build_orders_dlog(spark, sf_dir)
    return dlog_cdf(spark, table, 1, 3)


def dlog_history_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-version accounting from log replay only (no data read)."""
    table = build_orders_dlog(spark, sf_dir)
    return dlog_history(spark, table)


def dlog_merge(
    spark: SparkSession, table: str, updates: DataFrame
) -> None:
    """MERGE (upsert) as a commit, replacement semantics: WHEN MATCHED
    THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *.  Candidate
    groups are fence-selected against the update-key span (a group the
    span misses is never read); candidates are rewritten as
    base ⟕-anti updates ∪ updates — one anti-join plus a union, then
    ONE partitioned write re-bucketing by key range (insert keys
    beyond the old fences land in fresh groups).  A fence-selected
    group with no matched key rewrites unchanged — fences over-select,
    never corrupt; the exact-membership refinement is a per-group
    bloom/key check, the documented production knob."""
    version = latest_version(table) + 1
    lo, hi = updates.agg(
        F.min("o_orderkey"), F.max("o_orderkey")
    ).collect()[0]
    live = snapshot_groups(table)
    actions: list[dict] = []
    rewrite: list[dict] = []
    for g, a in sorted(live.items()):
        if a["min_k"] > hi or a["max_k"] < lo:
            continue  # fence miss: untouched
        actions.append(
            {"remove": {"grp": g, "rows": a["rows"], "path": a["path"]}}
        )
        rewrite.append(a)
    base = _read_groups(spark, table, rewrite)
    merged = base.join(
        updates.select("o_orderkey"), "o_orderkey", "left_anti"
    ).unionByName(updates)
    w = _w_of(table)
    actions += write_groups(
        spark, table, merged, version,
        F.concat(
            F.lit("m"),
            (F.col("o_orderkey") / w).cast("long").cast("string"),
        ),
    )
    actions.append({"commit": {"op": "merge", "version": version}})
    dlog_commit(table, version, actions)


#: memo for the merge twin table
_BUILT_MERGE: dict[str, str] = {}


def build_orders_dlog_merged(spark: SparkSession, sf_dir: str) -> str:
    """Link-copied twin + one MERGE commit: every live key divisible
    by 10 gets +10.00 (on top of its current snapshot price), and
    source keys divisible by 17 insert as fresh keys shifted past the
    table's key space (k + 8W) at raw price."""
    key = os.path.abspath(sf_dir)
    if key in _BUILT_MERGE and os.path.isdir(
        os.path.join(_BUILT_MERGE[key], _LOG_DIR)
    ):
        return _BUILT_MERGE[key]
    import shutil
    import tempfile

    base = build_orders_dlog(spark, sf_dir)
    table = tempfile.mkdtemp(prefix="dlogmrg_", dir=_scratch_root())
    shutil.rmtree(table)
    shutil.copytree(base, table, copy_function=os.link)
    w = _w_of(table)
    orders = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
    )
    k = F.col("o_orderkey")
    matched = orders.filter((k >= w) & (k % 10 == 0)).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (
            F.col("o_totalprice")
            + F.when(k >= 7 * w, F.lit(1.0)).otherwise(F.lit(0.0))
            + F.lit(10.0)
        ).alias("o_totalprice"),
    )
    inserts = orders.filter(k % 17 == 0).select(
        (k + 8 * w).alias("o_orderkey"),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
    )
    dlog_merge(spark, table, matched.unionByName(inserts))
    _BUILT_MERGE[key] = table
    return table


def dlog_merge_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-MERGE rollup: replaced rows carry snapshot price + 10,
    inserted rows their raw price at shifted keys — the closed form
    the oracle restates over raw orders (sum_key catches a dropped or
    double-applied insert; sum_price a mis-merged replacement)."""
    table = build_orders_dlog_merged(spark, sf_dir)
    return _status_agg(read_snapshot(spark, table))


#: memo for the schema-evolution twin table
_BUILT_EVO: dict[str, str] = {}


def build_orders_dlog_evolved(spark: SparkSession, sf_dir: str) -> str:
    """A v4 'evolve' commit on a hard-linked twin: the metaData action
    WIDENS the schema (+ o_orderpriority), and the deleted bucket's
    rows return as a re-insert group CARRYING the new column — old
    groups never rewrite; the reader null-fills them.  This is the
    add-column path of the public Delta/Iceberg protocols: schema
    changes are log edits, not data rewrites."""
    key = os.path.abspath(sf_dir)
    if key in _BUILT_EVO and os.path.isdir(
        os.path.join(_BUILT_EVO[key], _LOG_DIR)
    ):
        return _BUILT_EVO[key]
    import shutil
    import tempfile

    base = build_orders_dlog(spark, sf_dir)
    table = tempfile.mkdtemp(prefix="dlogevo_", dir=_scratch_root())
    shutil.rmtree(table)
    shutil.copytree(base, table, copy_function=os.link)
    w = _w_of(table)
    reinsert = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .filter(F.col("o_orderkey") < w)
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderpriority",
        )
    )
    actions: list[dict] = [
        {"meta": {"schema_add": ["o_orderpriority"]}}
    ]
    actions += write_groups(
        spark, table, reinsert, 4, F.lit("e0")
    )
    actions.append({"commit": {"op": "evolve", "version": 4}})
    dlog_commit(table, 4, actions)
    _BUILT_EVO[key] = table
    return table


def evolved_schema(table: str) -> T.StructType:
    """Base schema + every schema_add column declared in the log (new
    columns read as nullable strings; old files null-fill them)."""
    fields = list(_DATA_SCHEMA.fields)
    for _, actions in read_log(table):
        for a in actions:
            if "meta" in a and "schema_add" in a["meta"]:
                for c in a["meta"]["schema_add"]:
                    fields.append(T.StructField(c, T.StringType(), True))
    return T.StructType(fields)


def dlog_schema_evolution_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Read across the schema boundary: pre-evolve groups null-fill
    the new column, the re-insert group carries it — the per-priority
    rollup (null bucketed as '(none)') hashes against the closed form
    over raw orders, so a mis-filled or mis-attached column breaks the
    hash."""
    table = build_orders_dlog_evolved(spark, sf_dir)
    live = snapshot_groups(table)
    df = spark.read.schema(evolved_schema(table)).parquet(
        *[os.path.join(table, a["path"]) for a in live.values()]
    )
    return (
        df.groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit("(none)"))
            .alias("prio")
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("prio")
    )


def dlog_vacuum_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vacuum plan with retention at version 3: the v2 removals (b0,
    a0) are deletable, the v3 removals (b7, a1) are still reachable by
    the retained snapshot window."""
    table = build_orders_dlog(spark, sf_dir)
    return dlog_vacuum_plan(spark, table, 3).orderBy("grp")


def dlog_optimize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-OPTIMIZE layout: the v4 compaction coalesces the 8
    maintenance-fragmented groups into 4 key-range groups with tight
    fences (o0..o3 = bucket pairs) while touching no row — the oracle
    re-derives rows/fences per NEW group from the data alone, so a
    dropped or duplicated row in the rewrite hash-mismatches."""
    table = build_orders_dlog_optimized(spark, sf_dir)
    return skipping_plan(
        spark, table, 3 * _w_of(table), 4 * _w_of(table)
    ).orderBy("grp")


def dlog_tail_partials(actions: DataFrame) -> DataFrame:
    """Per-version mergeable counters from a batch of action rows —
    the streaming tail's foreachBatch reducer."""
    return actions.groupBy("version").agg(
        F.sum(F.when(F.col("action") == "add", 1).otherwise(0))
        .cast("long")
        .alias("n_adds"),
        F.sum(F.when(F.col("action") == "remove", 1).otherwise(0))
        .cast("long")
        .alias("n_removes"),
        F.sum(F.when(F.col("action") == "add", F.col("rows"))
              .otherwise(0)).cast("long").alias("rows_written"),
        F.sum(F.when(F.col("action") == "remove", F.col("rows"))
              .otherwise(0)).cast("long").alias("rows_removed"),
    )


def dlog_tail_from_partials(parts: DataFrame) -> DataFrame:
    """Merge partials → per-version history (with the cumulative
    live-row count restated via a running sum — a window over a
    version-count-sized table, control plane)."""
    from pyspark.sql.window import Window

    ver = (
        parts.groupBy("version")
        .agg(
            F.sum("n_adds").cast("long").alias("n_adds"),
            F.sum("n_removes").cast("long").alias("n_removes"),
            F.sum("rows_written").cast("long").alias("rows_written"),
            F.sum("rows_removed").cast("long").alias("rows_removed"),
        )
    )
    w = Window.orderBy("version").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ver.select(
        "version",
        "n_adds",
        "n_removes",
        "rows_written",
        "rows_removed",
        F.sum(F.col("rows_written") - F.col("rows_removed"))
        .over(w)
        .cast("long")
        .alias("live_rows"),
    ).orderBy("version")


# ---------------------------------------------------------------------------
# DuckDB oracles — closed forms over the ORIGINAL orders table
# ---------------------------------------------------------------------------

#: W as a DuckDB scalar subquery (mirrors the build's definition)
_W = "(SELECT MAX(o_orderkey) // 8 + 1 FROM orders)"

#: the latest-snapshot state: delete (k < W) + update (k >= 7W: +1.00)
_FINAL = f"""
  SELECT o_orderstatus, o_orderkey,
         o_totalprice
           + (CASE WHEN o_orderkey >= 7 * {_W} THEN 1.0 ELSE 0.0 END)
           AS o_totalprice
  FROM orders WHERE o_orderkey >= {_W}
"""

_STATUS_AGG = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
FROM ({src}) s
{where}
GROUP BY o_orderstatus
"""

SNAPSHOT_SQL = _STATUS_AGG.format(src=_FINAL, where="")

#: the CDF-maintained rollup equals the final-state recompute (the
#: IVM identity), stated without the sum_key column the IVM state
#: does not carry
CDF_IVM_SQL = f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
FROM ({_FINAL}) s
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

TIME_TRAVEL_SQL = _STATUS_AGG.format(
    src="SELECT o_orderstatus, o_orderkey, o_totalprice FROM orders",
    where="",
)

PRUNED_SQL = _STATUS_AGG.format(
    src=_FINAL,
    where=f"WHERE o_orderkey >= 3 * {_W} AND o_orderkey < 4 * {_W}",
)

#: closed-form group assignment of every final-state row (see
#: build_orders_dlog): k%4!=3 → b1..b6 stay v0 groups, b7 → u1;
#: k%4==3 → even buckets → c0 (v2 rewrite), odd buckets → u1 (v3
#: rewrite).  u0 never exists for orders data (b7 is odd-bucket), and
#: the v3 rewrite of a1 lands odd → u1.
_GRP_CASE = f"""
  CASE
    WHEN o_orderkey % 4 != 3 AND o_orderkey // {_W} = 7 THEN 'u1'
    WHEN o_orderkey % 4 != 3
      THEN 'b' || CAST(o_orderkey // {_W} AS VARCHAR)
    WHEN (o_orderkey // {_W}) % 2 = 0 THEN 'c0'
    ELSE 'u1'
  END
"""

SKIPPING_PLAN_SQL = f"""
SELECT grp,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_k,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_k,
       CAST(CASE WHEN MIN(o_orderkey) < 4 * {_W}
                  AND MAX(o_orderkey) >= 3 * {_W}
             THEN 1 ELSE 0 END AS BIGINT) AS scanned
FROM (SELECT {_GRP_CASE} AS grp, o_orderkey
      FROM orders WHERE o_orderkey >= {_W}) s
GROUP BY grp
ORDER BY grp
"""

CDF_SQL = f"""
SELECT * FROM (
  SELECT CAST(2 AS BIGINT) AS version, 'delete' AS change_type,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_price
  FROM orders WHERE o_orderkey < {_W}
  UNION ALL
  SELECT CAST(3 AS BIGINT), 'update_preimage',
         CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT),
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
  FROM orders WHERE o_orderkey >= 7 * {_W}
  UNION ALL
  SELECT CAST(3 AS BIGINT), 'update_postimage',
         CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT),
         CAST(SUM(CAST(o_totalprice + 1.0 AS DECIMAL(18,2)))
              AS DOUBLE)
  FROM orders WHERE o_orderkey >= 7 * {_W}
) t WHERE n_rows > 0
ORDER BY version, change_type
"""

#: per-version accounting: each commit's adds/removes in closed form
HISTORY_SQL = f"""
WITH c AS (
  SELECT
    COUNT(*) FILTER (WHERE o_orderkey % 4 != 3) AS v0_rows,
    COUNT(*) FILTER (WHERE o_orderkey % 4 = 3) AS v1_rows,
    COUNT(*) FILTER (WHERE o_orderkey % 4 != 3
                     AND o_orderkey < {_W}) AS b0_rows,
    COUNT(*) FILTER (WHERE o_orderkey % 4 = 3
                     AND (o_orderkey // {_W}) % 2 = 0) AS a0_rows,
    COUNT(*) FILTER (WHERE o_orderkey % 4 = 3
                     AND (o_orderkey // {_W}) % 2 = 0
                     AND o_orderkey >= {_W}) AS c0_rows,
    COUNT(*) FILTER (WHERE o_orderkey % 4 != 3
                     AND o_orderkey // {_W} = 7) AS b7_rows,
    COUNT(*) FILTER (WHERE o_orderkey % 4 = 3
                     AND (o_orderkey // {_W}) % 2 = 1) AS a1_rows,
    COUNT(*) AS all_rows,
    COUNT(*) FILTER (WHERE o_orderkey >= {_W}) AS live_rows
  FROM orders
)
SELECT * FROM (
  SELECT CAST(0 AS BIGINT) AS version, 'load' AS op,
         CAST(8 AS BIGINT) AS n_adds, CAST(0 AS BIGINT) AS n_removes,
         CAST(v0_rows AS BIGINT) AS rows_written,
         CAST(0 AS BIGINT) AS rows_removed,
         CAST(v0_rows AS BIGINT) AS live_rows FROM c
  UNION ALL
  SELECT 1, 'append', 2, 0, CAST(v1_rows AS BIGINT), 0,
         CAST(all_rows AS BIGINT) FROM c
  UNION ALL
  SELECT 2, 'delete', 1, 2, CAST(c0_rows AS BIGINT),
         CAST(b0_rows + a0_rows AS BIGINT),
         CAST(live_rows AS BIGINT) FROM c
  UNION ALL
  SELECT 3, 'update', 1, 2,
         CAST(b7_rows + a1_rows AS BIGINT),
         CAST(b7_rows + a1_rows AS BIGINT),
         CAST(live_rows AS BIGINT) FROM c
) t ORDER BY version
"""

#: post-OPTIMIZE layout: every final-state row lands in bucket-pair
#: group o{k DIV W DIV 2}; the scan verdict is for the same [3W, 4W)
#: probe (o1 = buckets 2-3 overlaps; the o0 pair is half-deleted)
OPTIMIZE_SQL = f"""
SELECT 'o' || CAST((o_orderkey // {_W}) // 2 AS VARCHAR) AS grp,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_k,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_k,
       CAST(CASE WHEN MIN(o_orderkey) < 4 * {_W}
                  AND MAX(o_orderkey) >= 3 * {_W}
             THEN 1 ELSE 0 END AS BIGINT) AS scanned
FROM orders WHERE o_orderkey >= {_W}
GROUP BY 1
ORDER BY grp
"""

#: post-MERGE state: live rows (k >= W) with the update-set +10 on
#: keys divisible by 10 (stacked on the v3 +1 for k >= 7W), plus the
#: shifted inserts at raw price
MERGE_SQL = f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(k) AS BIGINT) AS sum_key,
       CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM (
  SELECT o_orderstatus, o_orderkey AS k,
         o_totalprice
           + (CASE WHEN o_orderkey >= 7 * {_W} THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN o_orderkey % 10 = 0 THEN 10.0 ELSE 0.0 END)
           AS p
  FROM orders WHERE o_orderkey >= {_W}
  UNION ALL
  SELECT o_orderstatus, o_orderkey + 8 * {_W}, o_totalprice
  FROM orders WHERE o_orderkey % 17 = 0
) t
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

#: schema evolution: pre-evolve rows ('(none)') are the final state
#: (delete + update applied); the re-insert group is the deleted
#: bucket back with its real priority and RAW price (it was gone
#: before the update commit)
SCHEMA_EVOLUTION_SQL = f"""
SELECT CASE WHEN o_orderkey < {_W} THEN o_orderpriority
            ELSE '(none)' END AS prio,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice
             + (CASE WHEN o_orderkey >= 7 * {_W} THEN 1.0
                     ELSE 0.0 END) AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
FROM orders
GROUP BY 1
ORDER BY prio
"""

#: vacuum: removed groups in closed form — b0/a0 retired at v2
#: (deletable under retention-from-3), b7/a1 at v3 (still reachable)
VACUUM_SQL = f"""
SELECT * FROM (
  SELECT 'a0' AS grp, CAST(2 AS BIGINT) AS removed_at,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(1 AS BIGINT) AS deletable
  FROM orders WHERE o_orderkey % 4 = 3
    AND (o_orderkey // {_W}) % 2 = 0
  UNION ALL
  SELECT 'a1', 3, CAST(COUNT(*) AS BIGINT), 0
  FROM orders WHERE o_orderkey % 4 = 3
    AND (o_orderkey // {_W}) % 2 = 1
  UNION ALL
  SELECT 'b0', 2, CAST(COUNT(*) AS BIGINT), 1
  FROM orders WHERE o_orderkey % 4 != 3 AND o_orderkey < {_W}
  UNION ALL
  SELECT 'b7', 3, CAST(COUNT(*) AS BIGINT), 0
  FROM orders WHERE o_orderkey % 4 != 3 AND o_orderkey // {_W} = 7
) t ORDER BY grp
"""

#: the streaming tail re-sums to history minus the op column
TAIL_SQL = f"""
SELECT version, n_adds, n_removes, rows_written, rows_removed,
       live_rows
FROM ({HISTORY_SQL.rstrip()}) h
ORDER BY version
"""
