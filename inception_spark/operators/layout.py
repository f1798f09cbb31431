"""Z-order (Morton) data layout: multi-dimensional clustering for file
skipping.

At 100 TB the dominant cost of a selective query is how many files the
scan has to OPEN, and a single-column sort only clusters one predicate
dimension.  Z-ordering interleaves the bits of 2–3 columns so rows close
in EVERY dimension land close in the sort order — the standard lakehouse
layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) — and this module
implements it Spark-first:

* :func:`zorder_key_expr` — the Morton key as a pure codegen expression:
  magic-number bit spreading (4–5 shift/mask steps per column, the
  classic interleave), no UDF, no join.  DuckDB replays the identical
  shift/mask arithmetic, so the key itself is oracle-checkable.
* :func:`write_zorder_layout` — materializes the corpus PARTITIONED BY
  a ``zprefix`` (the top ``prefix_bits`` of the key): each partition
  directory is an axis-aligned cell of the value space.
* :func:`zorder_box_prefixes` / :func:`zorder_pruned_scan` — a range
  predicate box is resolved DRIVER-side to the set of cells it
  intersects (2^prefix_bits cells max — control-plane work), and the
  scan becomes ``zprefix IN (...)`` — real partition pruning, files in
  non-intersecting cells are never listed — plus the exact residual
  predicate.  Results are bit-identical to filtering the raw table.

Scaling note: keys are built from already-integer "cell coordinates"
(callers bucket/scale upstream, e.g. ``pmod`` or the range scaler
:func:`scale_to_cells`); the interleave itself is exact int64 arithmetic
with no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

# Magic spreading steps (shift, mask): the classic Morton "part1by1" /
# "part1by2" sequences.  Stride 2 places bit i of a 16-bit value at bit
# 2i; stride 3 places it at bit 3i (part1by2 handles up to 21-bit
# inputs; we feed ≤16).  Every mask fits in a non-negative int64.
_SPREAD2 = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]
_SPREAD3 = [
    (32, 0x001F00000000FFFF),
    (16, 0x001F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
]


def _spread(col: Column, stride: int, bits: int) -> Column:
    x = col.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    for sh, mask in _SPREAD2 if stride == 2 else _SPREAD3:
        x = (x.bitwiseOR(F.shiftleft(x, sh))).bitwiseAND(F.lit(mask))
    return x


def _spread_py(v: int, stride: int, bits: int) -> int:
    """Reference/oracle-side spread — same steps as :func:`_spread`."""
    x = v & ((1 << bits) - 1)
    for sh, mask in _SPREAD2 if stride == 2 else _SPREAD3:
        x = (x | (x << sh)) & mask
    return x


def zorder_key_expr(cols: list[Column], *, bits: int = 16) -> Column:
    """Morton key of 2 or 3 integer cell-coordinate columns (each in
    [0, 2^bits)): bit i of column d lands at key bit i·D + d."""
    d = len(cols)
    if d not in (2, 3):
        raise ValueError("zorder_key_expr interleaves 2 or 3 columns")
    if bits * d > 62:
        raise ValueError(f"bits={bits} overflows int64 for {d} columns")
    key = _spread(cols[0], d, bits)
    for i, c in enumerate(cols[1:], start=1):
        key = key.bitwiseOR(F.shiftleft(_spread(c, d, bits), i))
    return key


def _spread_sql(col_sql: str, stride: int, bits: int) -> str:
    x = f"(CAST({col_sql} AS BIGINT) & {(1 << bits) - 1})"
    for sh, mask in _SPREAD2 if stride == 2 else _SPREAD3:
        x = f"(({x} | ({x} << {sh})) & {mask})"
    return x


def zorder_key_sql(col_sqls: list[str], *, bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key_expr` — identical shift/mask
    arithmetic (DuckDB & | << operate on BIGINT)."""
    d = len(col_sqls)
    parts = [
        f"({_spread_sql(c, d, bits)} << {i})" if i else _spread_sql(c, d, bits)
        for i, c in enumerate(col_sqls)
    ]
    return "(" + " | ".join(parts) + ")"


def scale_to_cells(col: Column, lo: int, hi: int, *, bits: int = 16) -> Column:
    """Exact-integer range scaling of ``col`` (clamped to [lo, hi]) onto
    [0, 2^bits − 1]: ``(v − lo)·(2^bits − 1) div (hi − lo)`` — int64
    arithmetic, bit-identical in any engine.  ``hi`` must exceed
    ``lo``."""
    if hi <= lo:
        raise ValueError("scale_to_cells requires hi > lo")
    if hi - lo > (1 << 37) - 1:
        # (v−lo)·(2^bits−1) must stay ≤ 2^53 so the floor(double) below
        # is the exact integer quotient (the result itself is < 2^bits,
        # far inside double precision)
        raise ValueError("scale_to_cells supports ranges up to 2^37")
    top = (1 << bits) - 1
    v = F.greatest(F.least(col.cast("long"), F.lit(int(hi))), F.lit(int(lo)))
    return F.floor(
        ((v - F.lit(int(lo))) * F.lit(top)) / F.lit(int(hi - lo))
    ).cast("long")


def write_zorder_layout(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 16,
    prefix_bits: int = 8,
) -> None:
    """Materialize ``df`` partitioned by the top ``prefix_bits`` of its
    Z-order key over integer cell-coordinate columns ``cols``.  Each
    ``zprefix=N`` directory holds one axis-aligned cell of the value
    space; :func:`zorder_pruned_scan` then reads only the cells a range
    box intersects.  Rows are additionally sorted by the full key inside
    partitions so parquet row-group min/max stats nest within cells."""
    d = len(cols)
    key = zorder_key_expr([F.col(c) for c in cols], bits=bits)
    total = bits * d
    out = df.withColumn("zkey", key).withColumn(
        "zprefix", F.shiftright(F.col("zkey"), total - prefix_bits)
    )
    (
        out.repartition("zprefix")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .partitionBy("zprefix")
        .parquet(path)
    )


def zorder_box_prefixes(
    ranges: list[tuple[int, int]], *, bits: int = 16, prefix_bits: int = 8
) -> list[int]:
    """Driver-side cell enumeration: the ``zprefix`` values whose cell
    box intersects the inclusive per-dimension ranges.  2^prefix_bits
    candidate cells — control-plane work (≤ 65k for 16 prefix bits);
    for each cell the known top bits of every dimension de-interleave
    directly from the prefix, giving the cell's bounding box."""
    d = len(ranges)
    total = bits * d
    out = []
    for p in range(1 << prefix_bits):
        known = [0] * d
        kc = [0] * d
        for j in range(prefix_bits):
            q = total - 1 - j  # key bit position (0 = LSB)
            b = (p >> (prefix_bits - 1 - j)) & 1
            dim = q % d
            known[dim] |= b << (q // d)
            kc[dim] += 1
        ok = True
        for dim, (lo, hi) in enumerate(ranges):
            unknown = (1 << (bits - kc[dim])) - 1
            cell_lo = known[dim]
            cell_hi = known[dim] | unknown
            if cell_hi < lo or cell_lo > hi:
                ok = False
                break
        if ok:
            out.append(p)
    return out


def zorder_pruned_scan(
    spark,
    path: str,
    cols: list[str],
    ranges: list[tuple[int, int]],
    *,
    bits: int = 16,
    prefix_bits: int = 8,
) -> DataFrame:
    """Range-box scan over a :func:`write_zorder_layout` layout: the box
    resolves to a ``zprefix IN (...)`` partition filter (files in
    non-intersecting cells are pruned at listing time) plus the exact
    per-column residual predicate — results bit-identical to filtering
    the raw table."""
    prefixes = zorder_box_prefixes(
        ranges, bits=bits, prefix_bits=prefix_bits
    )
    scan = spark.read.parquet(path).where(
        F.col("zprefix").isin([int(p) for p in prefixes])
    )
    for c, (lo, hi) in zip(cols, ranges):
        scan = scan.where(
            (F.col(c) >= F.lit(int(lo))) & (F.col(c) <= F.lit(int(hi)))
        )
    return scan


# ---------------------------------------------------------------------------
# small-file compaction: the 100 TB table-maintenance operator
# ---------------------------------------------------------------------------

def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every data file under ``path``, via the JVM
    Hadoop FileSystem — works for any FS the cluster mounts (local,
    HDFS, object stores), no Python filesystem assumptions."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums, hidden
        out.append((st.getPath().toString(), int(st.getLen())))
    return out


def compaction_plan(
    files: list[tuple[str, int]], *, target_bytes: int
) -> dict:
    """Decide what to rewrite: files ≥ target stay untouched (rewriting
    healthy files is wasted IO — the mistake naive 'repartition the
    whole table' compaction makes); undersized files group into
    ``ceil(small_bytes / target)`` output files."""
    small = [(p, n) for p, n in files if n < target_bytes]
    keep = [(p, n) for p, n in files if n >= target_bytes]
    small_bytes = sum(n for _, n in small)
    n_out = max(1, -(-small_bytes // target_bytes)) if small else 0
    return {
        "keep": keep,
        "rewrite": small,
        "rewrite_bytes": small_bytes,
        "n_output_files": n_out,
    }


def compact_small_files(
    spark: SparkSession,
    path: str,
    *,
    target_bytes: int = 128 * 1024 * 1024,
    out_path: str | None = None,
) -> dict:
    """Compact a fragmented parquet directory: coalesce every file
    smaller than ``target_bytes`` into ~target-sized files, copying
    healthy files through untouched.

    The small-file problem is THE silent killer of big parquet tables
    (one task + one open/close per file; a 100 TB table fragmented into
    1 MB files is 10⁸ scheduler rounds), and streaming sinks create it
    constantly.  This is the maintenance pass: list (driver-side FS
    metadata, no data read), plan (only undersized files rewrite), then
    one job whose shuffle moves ONLY the undersized bytes.

    Writes the compacted table to ``out_path`` (default
    ``path + "_compacted"`` — swap with ``finalize_compaction`` or at
    the catalog layer; compacting in place would race readers).
    Returns the plan dict plus ``out_path`` for verification.

    Cost model (the point of the plan step): the only bytes that move
    through Spark tasks are the undersized ones — healthy files are
    copied at the filesystem layer (``FileUtil.copy``, a metadata +
    stream copy, no decode/re-encode).  A 100 TB table that is 99%
    healthy compacts by moving ~1 TB, not by rewriting 100 TB.

    Hive-partitioned layouts (``key=value`` subdirectories) are
    REFUSED: a flat ``read.parquet(files)`` would silently drop the
    partition columns from the compacted copy.  Compact each leaf
    partition directory instead."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)
    root_uri = str(fs.makeQualified(root))

    files = list_data_files(spark, path)
    for p, _ in files:
        rel = p[len(root_uri):] if p.startswith(root_uri) else p
        if any("=" in part for part in rel.strip("/").split("/")[:-1]):
            raise ValueError(
                f"compact_small_files: {path} is Hive-partitioned "
                f"(found data file under a key=value directory: {p}); "
                "a flat compaction would drop the partition columns — "
                "compact each leaf partition directory instead"
            )
    plan = compaction_plan(files, target_bytes=target_bytes)
    dst = out_path or path.rstrip("/") + "_compacted"
    dst_p = jvm.org.apache.hadoop.fs.Path(dst)
    small_paths = [p for p, _ in plan["rewrite"]]
    keep_paths = [p for p, _ in plan["keep"]]
    if fs.exists(dst_p):
        fs.delete(dst_p, True)
    if small_paths:
        # the ONLY Spark job: shuffle-free coalesce over just the
        # undersized bytes
        spark.read.parquet(*small_paths).coalesce(
            plan["n_output_files"]
        ).write.mode("overwrite").parquet(dst)
    else:
        fs.mkdirs(dst_p)  # empty or all-healthy source still gets a dir
    copied = 0
    seen_names = set()
    for i, (p, n) in enumerate(plan["keep"]):
        src_p = jvm.org.apache.hadoop.fs.Path(p)
        name = src_p.getName()
        if name in seen_names:  # nested non-partition subdirs flatten
            name = f"keep-{i}-{name}"
        seen_names.add(name)
        jvm.org.apache.hadoop.fs.FileUtil.copy(
            fs, src_p, fs, jvm.org.apache.hadoop.fs.Path(dst_p, name),
            False, conf,
        )
        copied += n
    plan["out_path"] = dst
    plan["copied_bytes"] = copied
    return plan


def finalize_compaction(
    spark: SparkSession, path: str, out_path: str
) -> str:
    """Swap the compacted directory into place: ``path`` →
    ``path + "_precompact"``, ``out_path`` → ``path``.  Each step is a
    single filesystem rename — atomic on HDFS/local within one
    directory, NOT on object stores (S3 renames are copies; use a
    catalog/manifest pointer swap there).  The displaced original is
    kept (not deleted) so a concurrent reader mid-scan keeps its open
    file handles and the caller controls when to reclaim the bytes.
    Returns the backup path."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(path)
    out = jvm.org.apache.hadoop.fs.Path(out_path)
    fs = src.getFileSystem(conf)
    backup = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "_precompact")
    if fs.exists(backup):
        raise ValueError(
            f"finalize_compaction: backup dir {backup} already exists — "
            "a previous swap was not reclaimed; remove it first"
        )
    if not fs.rename(src, backup):
        raise RuntimeError(f"finalize_compaction: rename {path} -> {backup} failed")
    if not fs.rename(out, src):
        fs.rename(backup, src)  # roll back so the table stays readable
        raise RuntimeError(
            f"finalize_compaction: rename {out_path} -> {path} failed; "
            "original restored"
        )
    return str(backup)


def compaction_plan_stats(
    listing: DataFrame, *, target_bytes: int
) -> DataFrame:
    """Relational twin of :func:`compaction_plan` over a
    ``(path, bytes)`` file-listing relation → ONE accounting row:
    ``(n_small, n_keep, small_bytes, keep_bytes, n_output_files)``.

    Same decision rule as the dict planner (files ≥ target keep,
    undersized files group into ``ceil(small_bytes / target)`` outputs,
    zero outputs when nothing is undersized) expressed as a single
    conditional aggregate, so the plan a 100 TB table-maintenance pass
    would execute is auditable as a query over the catalog's file
    listing — and DuckDB-oracle-able.  ``keep_bytes`` equals
    :func:`compact_small_files`'s ``copied_bytes`` (healthy files are
    FS-copied byte-for-byte); tests pin the dict/relational agreement
    over a real directory listing."""
    t = int(target_bytes)
    small = F.col("bytes") < t
    agg = listing.agg(
        F.coalesce(F.sum(small.cast("long")), F.lit(0))
        .cast("long").alias("n_small"),
        F.coalesce(F.sum((~small).cast("long")), F.lit(0))
        .cast("long").alias("n_keep"),
        F.coalesce(F.sum(F.when(small, F.col("bytes"))), F.lit(0))
        .cast("long").alias("small_bytes"),
        F.coalesce(F.sum(F.when(~small, F.col("bytes"))), F.lit(0))
        .cast("long").alias("keep_bytes"),
    )
    n_out = (
        F.when(F.col("n_small") == 0, F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(1),
                F.expr(f"(small_bytes + {t - 1}) DIV {t}"),
            )
        )
        .cast("long")
        .alias("n_output_files")
    )
    return agg.select(
        "n_small", "n_keep", "small_bytes", "keep_bytes", n_out
    )


def parquet_rowgroup_stats(
    spark: SparkSession, path: str, *, column: str | None = None
) -> DataFrame:
    """Distributed parquet FOOTER scan → one row per (file, row group):
    ``(file, rg, n_rows, total_byte_size[, min_v, max_v])`` with
    ``min_v``/``max_v`` the written statistics of ``column`` (integer
    columns; cast to long).

    This is the metadata layer row-group pruning runs on — auditing it
    as a query is how you verify a layout actually carries the min/max
    fences a sorted write promises (a table whose row groups all span
    the full key range prunes NOTHING, and no scan-side flag fixes
    that).  Shape: the FILE LIST is the DataFrame (one task per file
    batch), each task reads only footers via pyarrow — bytes read ≈
    footer size per file, never data pages; a 100 k-file table audits
    in seconds."""
    import pyarrow  # noqa: F401 — fail fast driver-side if absent

    files = [
        p
        for p, _ in list_data_files(spark, path)
        if p.endswith(".parquet")
    ]
    fields = "file string, rg long, n_rows long, total_byte_size long"
    if column is not None:
        fields += ", min_v long, max_v long"
    paths_df = spark.createDataFrame([(p,) for p in files], "file string")

    def mapper(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                local = f[len("file:"):] if f.startswith("file:") else f
                md = pq.ParquetFile(local).metadata
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    rec = {
                        "file": f,
                        "rg": g,
                        "n_rows": rg.num_rows,
                        "total_byte_size": rg.total_byte_size,
                    }
                    if column is not None:
                        for j in range(rg.num_columns):
                            col = rg.column(j)
                            if col.path_in_schema == column:
                                st = col.statistics
                                rec["min_v"] = (
                                    int(st.min) if st and st.has_min_max
                                    else None
                                )
                                rec["max_v"] = (
                                    int(st.max) if st and st.has_min_max
                                    else None
                                )
                    rows.append(rec)
            if rows:
                yield pd.DataFrame(rows)

    return paths_df.repartition(
        max(1, min(len(files), 64))
    ).mapInPandas(mapper, fields)


def assign_global_ids(
    df: DataFrame,
    order_by: list[str],
    *,
    id_name: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ordered row numbering WITHOUT a single-reducer window.

    ``row_number() OVER (ORDER BY ...)`` is the classic 100 TB trap: an
    empty ``partitionBy`` collapses the whole table onto ONE task (Spark
    even warns ``No Partition Defined for Window operation``).  This is
    the standard two-phase replacement:

      1. ``repartitionByRange(order_by)`` — parallel range shuffle; each
         partition holds a contiguous key range, partition index is
         monotone in the key.
      2. ``spark_partition_id()`` is stamped and the lineage is lazily
         checkpointed — the range boundaries come from a SAMPLED job, so
         without the pin the offsets job and the ranks job could see
         DIFFERENT partitionings (a silent correctness bug, not a perf
         detail).
      3. Per-partition counts (one row per partition — control-plane
         collect, bounded by the partition count by construction) give
         exclusive prefix-sum offsets, broadcast back.
      4. A window partitioned BY PARTITION ID computes local ranks in
         parallel; ``row_id = offset + local rank``.

    The result is bit-identical to ``row_number() OVER (ORDER BY
    order_by)`` whenever the ordering key is unique (callers append a
    tiebreaker column otherwise — same contract as row_number's own
    determinism).  Total cost: one range shuffle + one hash(pid)
    shuffle, both fully parallel; no stage ever sees more than one
    partition's rows.  IDs are 1-based to match SQL row_number.
    """
    cols = [F.col(c) for c in order_by]
    part = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    part = part.withColumn("_pid", F.spark_partition_id()).localCheckpoint(
        eager=False
    )
    counts = sorted(
        (r["_pid"], r["n"])
        for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        offsets or [(0, 0)], "_pid int, _offset long"
    )
    win = Window.partitionBy("_pid").orderBy(*cols)
    return (
        part.join(F.broadcast(off_df), "_pid")
        .withColumn(id_name, (F.row_number().over(win) + F.col("_offset")).cast("long"))
        .drop("_pid", "_offset")
    )


# ---------------------------------------------------------------------------
# bucketed (co-located) fact-fact joins
# ---------------------------------------------------------------------------

def write_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    key: str,
    table_name: str,
    path: str,
    *,
    n_buckets: int = 8,
) -> DataFrame:
    """Materialize ``df`` as a parquet table BUCKETED on ``key``.

    Bucketing is the write-once/query-many answer to the fact-fact join
    shuffle: hash-partition the rows into ``n_buckets`` files per write
    task at INGEST time and record the layout in the catalog, and every
    later equi-join or aggregation on ``key`` between tables with the
    same bucket count satisfies its required hash distribution straight
    off the scan — Catalyst plans the SortMergeJoin with NO Exchange on
    either side.  At 100 TB that deletes the single largest stage of
    every orders⋈lineitem-shaped query; the shuffle is paid once at
    write, amortized over every subsequent query (the same economics as
    the ANN/z-order layouts in this module).

    The input is repartitioned by the bucket expression first so each
    bucket's rows land in one write task (one file per bucket, not
    tasks×buckets small files — the file-count discipline
    ``compaction_plan`` exists to enforce).  ``sortBy(key)`` makes each
    bucket file key-sorted, so the downstream SMJ's per-partition sort
    is a cheap near-sorted pass.
    """
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    (
        df.repartition(n_buckets, F.col(key))
        .write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table_name)
    )
    return spark.table(table_name)


# (left_table, right_table, left_key, right_key) tuples whose AQE
# final-plan check has already passed this session — the memo behind
# ``colocated_join(verify="once")``.
_VERIFIED_COLOCATED: set = set()


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    *,
    require_shuffle_free: bool = True,
    verify: str = "once",
) -> DataFrame:
    """Join two same-bucket-count catalog tables on their bucket keys.

    The ``merge`` hint forces SortMergeJoin (a broadcast join would also
    avoid the shuffle at test scale but proves nothing about the 100 TB
    fact-fact case).  ``require_shuffle_free=True`` pins the contract in
    the plan itself: zero ``Exchange`` operators anywhere in the join's
    physical plan — the scans' bucket distribution satisfied the join —
    so a layout regression (bucket-count mismatch, bucketed scan
    disabled, a stray repartition) fails loudly instead of silently
    reintroducing the biggest shuffle in the pipeline.

    The guard is a ``RuntimeError`` (an ``assert`` would vanish under
    ``python -O``) and runs in two phases:

    1. the STATIC pre-execution plan check — free (physical planning
       only, no job), so it runs on every call;
    2. the AQE FINAL-plan check — because AQE commits the physical plan
       only after stage stats arrive, verifying it requires touching one
       output row, which executes one partition of the join; the
       caller's downstream action then re-executes it.  That cost is
       real (r10: +78% on the bench's bucketed join when paid per call),
       so it is gated by ``verify``:

       - ``"once"`` (default): pay the touch the first time this
         session sees this (tables, keys) combination; memoize on pass.
         A production pipeline re-running the same co-located join gets
         static-check-only calls after the first.
       - ``"always"``: pay it on every call — for suites that mutate
         layouts between calls under the same table names.
       - ``"never"``: static check only.
    """
    if verify not in ("always", "once", "never"):
        raise ValueError(f"verify must be always|once|never, got {verify!r}")
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    joined = left.join(
        right, on=F.col(left_key) == F.col(right_key), how="inner"
    )
    if require_shuffle_free:
        qe = joined._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        if "Exchange" in plan:
            raise RuntimeError(
                "bucketed join planned a shuffle — layout not "
                "co-located:\n" + plan[:2000]
            )
        memo_key = (left_table, right_table, left_key, right_key)
        if verify == "always" or (
            verify == "once" and memo_key not in _VERIFIED_COLOCATED
        ):
            # finalize AQE and re-check the plan that actually ran.  The
            # touch must drive THIS DataFrame's own QueryExecution:
            # head(1) would plan a separate limit(1) query and leave
            # qe's adaptive plan unfinalized (isFinalPlan=false), making
            # the re-check a no-op.  toLocalIterator executes the same
            # _jdf — AdaptiveSparkPlanExec commits its final plan
            # synchronously in doExecute, before the first row arrives —
            # and pulling one row costs one partition, not a collect of
            # the full join.
            it = joined.toLocalIterator()
            try:
                next(it, None)
            finally:
                close = getattr(it, "close", None)
                if close is not None:
                    close()
            final = qe.executedPlan().toString()
            if (
                "AdaptiveSparkPlan" in final
                and "isFinalPlan=true" not in final
            ):
                raise RuntimeError(
                    "bucketed-join guard could not verify the FINAL "
                    "adaptive plan (isFinalPlan stayed false after "
                    "execution):\n" + final[:2000]
                )
            if "Exchange" in final:
                raise RuntimeError(
                    "AQE rewrote the bucketed join into a shuffle — "
                    "layout not co-located in the FINAL plan:\n"
                    + final[:2000]
                )
            if verify == "once":
                _VERIFIED_COLOCATED.add(memo_key)
    return joined


def _hrw_hash(key, shard: int, salt: str):
    from inception_spark.functions.hashing import h28

    return h28(
        F.concat(
            F.lit(salt + "\x1f"),
            key.cast("string"),
            F.lit("\x1f" + str(int(shard))),
        )
    )


def rendezvous_shards(
    df: DataFrame,
    *,
    key_col: str,
    n_shards: int,
    salt: str = "hrw",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: a key's
    shard is ``argmax over s of h28(salt | key | s)`` — (key, shard).
    THE stable-resharding primitive: growing n→n+1 shards moves exactly
    the keys whose new shard's hash beats every old one, ~1/(n+1) of
    the corpus in expectation, while a mod-N layout reshuffles
    (n-1)/n+... ≈ ALL of it.  That property is what makes incremental
    re-layout of a 100 TB corpus affordable, and
    :func:`reshard_movement_report` measures it instead of asserting
    it.

    Plan shape: the per-shard hashes are ONE array expression per row —
    no explode, no shuffle, pure whole-stage codegen scan; the argmax
    is array_position(max), first-match so hash ties (2^-28 each)
    break to the smallest shard deterministically.  n_shards is a
    code-size knob (the projection has n terms) — for thousands of
    shards, two-level rendezvous (shard groups, then within-group)
    keeps the expression bounded; the standard production layout.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = F.col(key_col)
    hashes = F.array(
        *[_hrw_hash(key, s, salt) for s in range(int(n_shards))]
    )
    return df.select(
        key.alias("key"),
        (F.array_position(hashes, F.array_max(hashes)) - 1)
        .cast("long")
        .alias("shard"),
    )


def rendezvous_shards_sql(
    table: str,
    *,
    key_col: str,
    n_shards: int,
    salt: str = "hrw",
) -> str:
    """DuckDB twin of :func:`rendezvous_shards` (same hash, same
    first-match tie-break via list_position of list_max)."""
    from inception_spark.functions.hashing import h28_sql

    hs = ", ".join(
        h28_sql(
            f"'{salt}' || chr(31) || CAST({key_col} AS VARCHAR)"
            f" || chr(31) || '{int(s)}'"
        )
        for s in range(int(n_shards))
    )
    return f"""
SELECT {key_col} AS key,
       CAST(list_position(h, list_max(h)) - 1 AS BIGINT) AS shard
FROM (SELECT {key_col}, [{hs}] AS h FROM {table})
"""


def reshard_movement_report(
    df: DataFrame,
    *,
    key_col: str,
    n_from: int,
    n_to: int,
    salt: str = "hrw",
) -> DataFrame:
    """Measured stability of the rendezvous layout across a shard-count
    change: ONE row ``(n_keys, n_moved, moved_milli, minimal_milli)``
    where ``minimal_milli`` is the information-theoretic floor
    (|n_to − n_from| / max(n_from, n_to) of the keys MUST move to
    rebalance).  For HRW growing n→n+k, moved ≈ minimal; a mod-N
    layout scores ~1000·(1−1/lcm-ish) — run both through this report
    before betting a 100 TB re-layout on either."""
    a = rendezvous_shards(
        df, key_col=key_col, n_shards=n_from, salt=salt
    ).withColumnRenamed("shard", "s_from")
    b = rendezvous_shards(
        df, key_col=key_col, n_shards=n_to, salt=salt
    ).withColumnRenamed("shard", "s_to")
    j = a.join(b, "key")
    lo, hi = sorted((int(n_from), int(n_to)))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(
            (F.col("s_from") != F.col("s_to")).cast("long")
        ).cast("long").alias("n_moved"),
    ).select(
        "n_keys",
        "n_moved",
        F.expr("(1000 * n_moved) div n_keys").cast("long").alias(
            "moved_milli"
        ),
        F.lit(1000 * (hi - lo) // hi).cast("long").alias(
            "minimal_milli"
        ),
    )


def reshard_movement_report_sql(
    table: str,
    *,
    key_col: str,
    n_from: int,
    n_to: int,
    salt: str = "hrw",
) -> str:
    """DuckDB twin of :func:`reshard_movement_report`."""
    a = rendezvous_shards_sql(
        table, key_col=key_col, n_shards=n_from, salt=salt
    )
    b = rendezvous_shards_sql(
        table, key_col=key_col, n_shards=n_to, salt=salt
    )
    lo, hi = sorted((int(n_from), int(n_to)))
    return f"""
WITH a AS ({a}), b AS ({b}),
j AS (SELECT a.key, a.shard AS s_from, b.shard AS s_to
      FROM a JOIN b ON a.key = b.key)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN s_from <> s_to THEN 1 ELSE 0 END) AS BIGINT)
         AS n_moved,
       CAST((1000 * SUM(CASE WHEN s_from <> s_to THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS moved_milli,
       CAST({1000 * (hi - lo) // hi} AS BIGINT) AS minimal_milli
FROM j
"""


def rendezvous_shards_two_level(
    df: DataFrame,
    *,
    key_col: str,
    n_groups: int,
    shards_per_group: int,
    salt: str = "hrw",
) -> DataFrame:
    """Two-level rendezvous for shard counts where the flat argmax
    projection would bloat codegen (thousands of shards): HRW over
    ``n_groups`` shard GROUPS, then HRW within the winning group (the
    group id folded into the inner salt), ``shard = group ·
    shards_per_group + sub``.  Expression size is n_groups +
    shards_per_group terms instead of their product — 4096 shards as
    64+64 hashes.  Stability composes: growing shards WITHIN a group
    moves ~1/(spg+1) of that group's keys only; adding a GROUP moves
    ~1/(n_groups+1) overall — both measured by
    :func:`reshard_movement_report` run per level."""
    if n_groups < 1 or shards_per_group < 1:
        raise ValueError("n_groups and shards_per_group must be >= 1")
    key = F.col(key_col)
    gh = F.array(
        *[_hrw_hash(key, g, salt + "\x1dG") for g in range(int(n_groups))]
    )
    grp = (F.array_position(gh, F.array_max(gh)) - 1).cast("long")
    out = df.select(key.alias("key"), grp.alias("_g"))
    sh = F.array(
        *[
            _hrw_hash(
                F.concat(F.col("_g").cast("string"), F.lit("\x1d"),
                         F.col("key").cast("string")),
                s,
                salt + "\x1dS",
            )
            for s in range(int(shards_per_group))
        ]
    )
    sub = (F.array_position(sh, F.array_max(sh)) - 1).cast("long")
    return out.select(
        "key",
        (F.col("_g") * int(shards_per_group) + sub).cast("long").alias(
            "shard"
        ),
    )


def rendezvous_shards_two_level_sql(
    table: str,
    *,
    key_col: str,
    n_groups: int,
    shards_per_group: int,
    salt: str = "hrw",
) -> str:
    """DuckDB twin of :func:`rendezvous_shards_two_level`."""
    from inception_spark.functions.hashing import h28_sql

    gh = ", ".join(
        h28_sql(
            f"'{salt}' || chr(29) || 'G' || chr(31) "
            f"|| CAST({key_col} AS VARCHAR) || chr(31) || '{int(g)}'"
        )
        for g in range(int(n_groups))
    )
    sh = ", ".join(
        h28_sql(
            f"'{salt}' || chr(29) || 'S' || chr(31) "
            f"|| CAST(_g AS VARCHAR) || chr(29) "
            f"|| CAST(key AS VARCHAR) || chr(31) || '{int(s)}'"
        )
        for s in range(int(shards_per_group))
    )
    return f"""
WITH g AS (
  SELECT {key_col} AS key,
         CAST(list_position(gh, list_max(gh)) - 1 AS BIGINT) AS _g
  FROM (SELECT {key_col}, [{gh}] AS gh FROM {table})),
s AS (
  SELECT key, _g,
         CAST(list_position(sh, list_max(sh)) - 1 AS BIGINT) AS _s
  FROM (SELECT key, _g, [{sh}] AS sh FROM g))
SELECT key, CAST(_g * {int(shards_per_group)} + _s AS BIGINT) AS shard
FROM s
"""


def hilbert_key_expr(cx: Column, cy: Column, *, bits: int = 16) -> Column:
    """Hilbert-curve key of two integer cell coordinates (each in
    [0, 2^bits)) — the locality-preserving upgrade over the Morton key:
    consecutive Hilbert keys are ALWAYS Manhattan-adjacent cells (the
    defining property, pinned exhaustively in tests), so a range of
    keys covers a compact region with no Z-shaped jumps; range queries
    over a hilbert-partitioned layout touch strictly fewer files than
    the same range z-ordered.

    The classic per-level rotation (Wikipedia xy2d) is inherently
    sequential state, which rules out the zorder magic-number spread;
    instead the 16 levels run as an ``F.aggregate`` FOLD over a level
    sequence with a (x, y, d) struct accumulator — one interpreted
    pass per row, constant expression size (a withColumn chain would
    let CollapseProject inline each level's x/y twice per use and blow
    the tree up exponentially).  DuckDB replays the identical fold as
    an unrolled 16-step CTE chain (:func:`hilbert_key_sql`).

    r13 alternatives BUILT AND MEASURED, both bit-identical (0
    mismatches over all sf0.1 events) and both SLOWER than this fold,
    so not kept (same-session min-of-4, full query shape, noop sink):
    the fully unrolled select chain executes 33% faster but pays 3–4 s
    of driver-side analysis per build (2× end-to-end loss); the
    Lam–Shapiro 4-state automaton fold (two bit-tests + packed-table
    lookup per level, zero ``when`` branches, tables 0x1E369CB4 /
    0xB7CA5C21) read 1.69 s (shiftrightunsigned form) and 1.84 s
    (element_at struct-table form) against 1.56 s for this fold — the
    interpreted-HOF cost here is the per-level struct allocation and
    aggregate machinery, not the branches the automaton removes."""
    if bits * 2 > 62:
        raise ValueError(f"bits={bits} overflows int64 for 2 columns")
    n = 1 << bits
    # lambda-side shift amounts must be literals, so each level carries
    # its mask s and area s² as struct literals
    levels = F.array(
        *[
            F.struct(
                F.lit(1 << i).cast("long").alias("s"),
                F.lit((1 << i) * (1 << i)).cast("long").alias("s2"),
            )
            for i in range(bits - 1, -1, -1)
        ]
    )
    zero = F.lit(0).cast("long")
    init = F.struct(
        cx.cast("long").alias("x"),
        cy.cast("long").alias("y"),
        zero.alias("d"),
    )

    def step(acc, lv):
        rx = F.when(
            acc["x"].bitwiseAND(lv["s"]) > 0, F.lit(1)
        ).otherwise(F.lit(0))
        ry = F.when(
            acc["y"].bitwiseAND(lv["s"]) > 0, F.lit(1)
        ).otherwise(F.lit(0))
        d2 = acc["d"] + lv["s2"] * (
            (F.lit(3) * rx).bitwiseXOR(ry).cast("long")
        )
        refl = rx == F.lit(1)
        x_r = F.when(refl, F.lit(n - 1) - acc["x"]).otherwise(acc["x"])
        y_r = F.when(refl, F.lit(n - 1) - acc["y"]).otherwise(acc["y"])
        # ry == 0: (maybe reflect then) swap x and y; ry == 1: unchanged
        x2 = F.when(ry == F.lit(0), y_r).otherwise(acc["x"])
        y2 = F.when(ry == F.lit(0), x_r).otherwise(acc["y"])
        return F.struct(
            x2.cast("long").alias("x"),
            y2.cast("long").alias("y"),
            d2.cast("long").alias("d"),
        )

    return F.aggregate(levels, init, step).getField("d")


def hilbert_key_py(x: int, y: int, *, bits: int = 16) -> int:
    """Reference implementation (the classic xy2d loop) for tests."""
    n = 1 << bits
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def hilbert_key_sql(cx_sql: str, cy_sql: str, *, bits: int = 16) -> str:
    """DuckDB twin of :func:`hilbert_key_expr` as a scalar expression
    chain is impossible (sequential state), so this returns the body of
    an unrolled per-level CTE pipeline: the caller provides a relation
    ``__hilbert_base`` with columns (..., hx, hy) and this yields CTE
    text ``h{bits} .. h0`` where ``h0.hd`` is the key.  Each level is
    one projection referenced exactly once — no expression blowup."""
    n = 1 << bits
    ctes = [
        f"h{bits} AS (SELECT *, CAST(hx AS BIGINT) AS _x, "
        f"CAST(hy AS BIGINT) AS _y, CAST(0 AS BIGINT) AS hd "
        f"FROM __hilbert_base)"
    ]
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        ctes.append(f"""
h{i} AS (
  SELECT * EXCLUDE (_x, _y, hd),
         CASE WHEN ((_y >> {i}) & 1) = 0 THEN
           CASE WHEN ((_x >> {i}) & 1) = 1 THEN {n - 1} - _y ELSE _y END
         ELSE _x END AS _x,
         CASE WHEN ((_y >> {i}) & 1) = 0 THEN
           CASE WHEN ((_x >> {i}) & 1) = 1 THEN {n - 1} - _x ELSE _x END
         ELSE _y END AS _y,
         hd + {s} * {s} * xor(3 * ((_x >> {i}) & 1), (_y >> {i}) & 1)
           AS hd
  FROM h{i + 1})""")
    return ",\n".join(ctes)


def hilbert_d2xy_py(d: int, *, bits: int = 16) -> tuple[int, int]:
    """Inverse of :func:`hilbert_key_py` (the classic d2xy loop) —
    driver-side only, used by the prefix→region enumeration."""
    n = 1 << bits
    x = y = 0
    t = d
    s = 1
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def write_hilbert_layout(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 16,
    prefix_bits: int = 8,
) -> None:
    """Materialize ``df`` partitioned by the top ``prefix_bits`` of its
    Hilbert key (prefix_bits must be even: each 2 key bits = one
    quadrant level, so an even prefix is EXACTLY one axis-aligned
    square of the grid — the property that makes prefix pruning tight
    where Z-order prefixes can be L-shaped).  Rows sort by the full
    key inside partitions so row-group min/max stats nest within
    squares."""
    if prefix_bits % 2:
        raise ValueError("hilbert prefix_bits must be even (quadrants)")
    if len(cols) != 2:
        raise ValueError("hilbert layout is 2-D")
    key = hilbert_key_expr(F.col(cols[0]), F.col(cols[1]), bits=bits)
    total = 2 * bits
    out = df.withColumn("hkey", key).withColumn(
        "hprefix", F.shiftright(F.col("hkey"), total - prefix_bits)
    )
    (
        out.repartition("hprefix")
        .sortWithinPartitions("hkey")
        .write.mode("overwrite")
        .partitionBy("hprefix")
        .parquet(path)
    )


def hilbert_box_prefixes(
    ranges: list[tuple[int, int]], *, bits: int = 16, prefix_bits: int = 8
) -> list[int]:
    """Driver-side cell enumeration: the ``hprefix`` values whose
    SQUARE intersects the inclusive (x, y) ranges.  An even-length
    Hilbert key prefix addresses one level-(prefix_bits/2) quadrant —
    its region is the axis-aligned square whose corner is d2xy of the
    prefix's first key and whose side is 2^(bits − prefix_bits/2).
    2^prefix_bits candidates — control-plane work."""
    if prefix_bits % 2:
        raise ValueError("hilbert prefix_bits must be even (quadrants)")
    side = 1 << (bits - prefix_bits // 2)
    (xlo, xhi), (ylo, yhi) = ranges
    out = []
    for p in range(1 << prefix_bits):
        cx, cy = hilbert_d2xy_py(p << (2 * bits - prefix_bits), bits=bits)
        # corner of the square: d2xy of the first key is SOME cell in
        # the square; snap to the square's origin
        sx, sy = (cx // side) * side, (cy // side) * side
        if sx + side - 1 < xlo or sx > xhi:
            continue
        if sy + side - 1 < ylo or sy > yhi:
            continue
        out.append(p)
    return out


def hilbert_pruned_scan(
    spark,
    path: str,
    cols: list[str],
    ranges: list[tuple[int, int]],
    *,
    bits: int = 16,
    prefix_bits: int = 8,
) -> DataFrame:
    """Range-box scan over a :func:`write_hilbert_layout` layout:
    ``hprefix IN (...)`` partition pruning + the exact residual
    predicate — bit-identical to filtering the raw table."""
    prefixes = hilbert_box_prefixes(
        ranges, bits=bits, prefix_bits=prefix_bits
    )
    scan = spark.read.parquet(path).where(
        F.col("hprefix").isin([int(p) for p in prefixes])
    )
    for c, (lo, hi) in zip(cols, ranges):
        scan = scan.where(
            (F.col(c) >= F.lit(int(lo))) & (F.col(c) <= F.lit(int(hi)))
        )
    return scan
