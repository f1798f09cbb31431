"""Relational query plans over the TPC-H-ish test schema.

The reference has no relational surface (SURVEY.md §2.5); these are the
engine's standard-analytics layer, written DataFrame-first so Catalyst owns
the physical strategy.  Each builder takes ``(spark, sf_dir)`` and returns a
DataFrame; the DuckDB oracle twins live in ``__spark_entry__.py``.

Determinism engineering (the driver hash-compares values against DuckDB):

* every SUM over a double column casts to ``DECIMAL(12,2)`` first — decimal
  aggregation is exact and order-independent in both engines, so the final
  ``CAST(... AS DOUBLE)`` is bit-identical regardless of partitioning;
* averages are ``sum_decimal/count`` evaluated in double *after* the exact
  decimal sum — never a native double ``avg`` (order-dependent);
* timestamps in outputs are formatted to strings;
* every top-k ranks on exact (decimal or raw-column) keys with an id
  tie-break, so the *selected set* is stable, not just the values.

Scale notes are on each builder — broadcast hints for dimension tables,
partial-agg-friendly groupings, single-shuffle window plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEC = "decimal(12,2)"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-adaptive events loader.

    The driver owns ``events.parquet`` and has shipped it with two different
    physical types for ``ts`` across regenerations: TIMESTAMP(NANOS) (which
    Spark's parquet reader rejects unless read as raw longs) and plain
    ``timestamp[us]``.  Never assume a frozen physical schema for
    driver-owned data — probe and adapt:

    * plain read succeeds → ``ts`` is a real timestamp; cast to
      ``timestamp_ntz`` (identity when already NTZ, TZ-pinned when LTZ);
    * plain read rejects the file (Illegal Parquet type: INT64
      TIMESTAMP(NANOS)) → re-read with ``nanosAsLong`` and rebuild the
      timestamp truncated to micros, matching DuckDB's TIMESTAMP_NS →
      TIMESTAMP cast.

    ``nanosAsLong`` is only set on the fallback path (and must then stay
    set for the lifetime of the lazy plan — execution-side parquet readers
    consult it again).  Session TZ is pinned to UTC either way so any
    LTZ↔NTZ hop is the identity; the whole repo formats timestamps
    assuming UTC."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    try:
        raw = spark.read.parquet(path)
    except Exception as exc:
        # Fall back ONLY for the known TIMESTAMP(NANOS) rejection —
        # anything else (missing file, corrupt footer, permissions) must
        # surface as itself, not as a confusing secondary error under
        # nanosAsLong.  Schema probing raises AnalysisException in some
        # Spark versions and SparkUpgrade/IllegalArgument wrappers in
        # others, so match on the message, not the class.
        msg = str(exc)
        if "TIMESTAMP(NANOS" not in msg and "NANOS" not in msg:
            raise
        # TIMESTAMP(NANOS) variant: only readable as raw nano longs.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(path)
    if dict(raw.dtypes).get("ts") == "bigint":
        return raw.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return raw.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def _d(c) -> F.Column:
    return F.col(c).cast(DEC)


def _sum_money(col: F.Column, alias: str) -> F.Column:
    return F.sum(col).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# pricing summary (TPC-H Q1 shape): scan + filter + hash aggregate.
# Catalyst pushes the shipdate filter into the parquet scan; partial
# aggregation makes the shuffle carry ≤ |flags×status| rows per partition.
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    charge = disc_price * (F.lit(1).cast(DEC) + _d("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _sum_money(_d("l_quantity"), "sum_qty"),
            _sum_money(_d("l_extendedprice"), "sum_base_price"),
            _sum_money(disc_price, "sum_disc_price"),
            _sum_money(charge, "sum_charge"),
            (F.sum(_d("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_d("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(_d("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# shipping priority (Q3 shape): two joins + agg + deterministic top-10.
# customer is tiny → broadcast; the orders⋈lineitem join shuffles on the
# order key, which is also the aggregation key — one shuffle serves both.
# ---------------------------------------------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    # broadcast ONLY the filtered customer table (customer-grain, truly
    # small); the orders side is fact-grain and must shuffle — a broadcast
    # hint on the customer⋈orders result would replicate ~30% of orders
    agg = (
        li.join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left_semi")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).alias("rev_dec"))
    )
    # orderBy+limit = distributed TakeOrderedAndProject; a global
    # row_number window would funnel every aggregated row into one task
    return (
        agg.orderBy(F.desc("rev_dec"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.col("rev_dec").cast("double").alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
    )


# ---------------------------------------------------------------------------
# region revenue (Q5 shape): the full star join.  region/nation/supplier/
# customer all broadcast; only orders⋈lineitem shuffles.
# ---------------------------------------------------------------------------

def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        # Q5's local-supplier condition: supplier and customer in same nation
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_sum_money(revenue, "revenue"), F.count(F.lit(1)).alias("n_lineitems"))
    )


# ---------------------------------------------------------------------------
# forecast revenue (Q6 shape): pure scan-filter-agg — the pushdown showcase.
# ---------------------------------------------------------------------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _sum_money(_d("l_extendedprice") * _d("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q11_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (partsupp replaced by the lineitem-observed value): per-part
    discounted revenue from suppliers of one nation, keeping parts whose
    value exceeds 0.1% of that nation's total — the group-aggregate
    filtered against a global scalar.

    Scale: supplier×nation is a broadcast semi-join (dim tables), the
    per-part aggregate is one shuffle with map-side partial sums, and the
    global total is a single-row broadcast, so the threshold filter adds
    no extra shuffle.  The comparison is done in exact decimal
    (``1000 * val > tot``) so engines agree bit-for-bit."""
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp_n = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi"
    )
    disc = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    v = (
        li.join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(disc).alias("val_dec"))
    )
    tot = v.agg(F.sum("val_dec").alias("tot"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("val_dec") * 1000 > F.col("tot"))
        .select(
            F.col("l_partkey").alias("part_key"),
            F.col("val_dec").cast("double").alias("value"),
        )
    )


def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (no l_shipmode/commitdate in this schema): for lineitems
    shipped >180 days after their order date, count high-priority
    (URGENT/HIGH) vs lower-priority orders per line status.

    Scale: one shuffle join on the order key (AQE picks the strategy),
    then a 2-group hash aggregate whose partial sums collapse the shuffle
    to ≤|linestatus| rows per task.  Counts are integers — engine-exact."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 180 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (availqty replaced by observed shipped share): suppliers
    holding an outsized share (>15%) of any PROMO part's shipped quantity
    — the nested correlated-threshold semi-join chain.

    Scale: part is a broadcast filter, the (part, supplier) aggregate and
    the per-part total reuse the same shuffle key, and the share test is
    exact decimal (``20 * qty > 3 * tq`` — 0.15 with no float rounding).
    Supplier/nation decorations are broadcast joins."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    ps = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_d("l_quantity")).alias("qty"))
    )
    tot = ps.groupBy("l_partkey").agg(F.sum("qty").alias("tq"))
    excess = ps.join(tot, "l_partkey").filter(
        F.col("qty") * 20 > F.col("tq") * 3
    )
    return (
        excess.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_excess_parts"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "n_excess_parts")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (late = shipped >365 days after order date): on finished
    multi-supplier orders, the supplier who was the ONLY late one —
    the exists/not-exists double-correlated pattern, expressed as one
    per-order aggregate (distinct suppliers, distinct late suppliers)
    joined back to the late lineitems.

    Scale: lineitem⋈orders shuffles on the order key and BOTH follow-up
    aggregates (per-order counts, distinct candidate pairs) reuse that
    key, so Catalyst/AQE can avoid re-partitioning; the final per-supplier
    count is a 100-row aggregate with broadcast decorations."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")
        ).alias("late"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("n_late"),
    )
    cand = (
        lo.filter("late")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            per_order.filter(
                (F.col("n_supp") > 1) & (F.col("n_late") == 1)
            ),
            "l_orderkey",
            "left_semi",
        )
    )
    return (
        cand.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "numwait")
    )


# ---------------------------------------------------------------------------
# windows
# ---------------------------------------------------------------------------

def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number window: one shuffle on the partition key."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


def customer_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum window over exact decimal, cast at the end."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.sum(_d("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


# ---------------------------------------------------------------------------
# joins beyond inner
# ---------------------------------------------------------------------------

def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join — NOT EXISTS."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + group: every customer, even order-less ones."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_d("o_totalprice")).cast("double"), F.lit(0.0)).alias("total_spent"),
            F.max(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("last_order_date"),
        )
    )


# ---------------------------------------------------------------------------
# pivot / rollup
# ---------------------------------------------------------------------------

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (pivot without the pivot API, so the oracle
    SQL is plain ANSI)."""
    orders = load(spark, sf_dir, "orders")
    aggs = [
        F.sum(
            F.when(F.col("o_orderpriority") == p, 1).otherwise(0)
        ).alias(f"n_p{i + 1}")
        for i, p in enumerate(PRIORITIES)
    ]
    return orders.groupBy("o_orderstatus").agg(*aggs)


def part_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (type, brand) → type → grand total."""
    part = load(spark, sf_dir, "part")
    return part.rollup("p_type", "p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        _sum_money(_d("p_retailprice"), "total_price"),
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
    )


def supplier_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            _sum_money(_d("s_acctbal"), "total_balance"),
        )
    )


# ---------------------------------------------------------------------------
# events: time-series aggregation, sessionization, JSON extraction
# ---------------------------------------------------------------------------

def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows via date_trunc (streaming-compatible
    grouping — the structured-streaming twin uses window())."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-min inactivity gap): the batch
    twin of session_window().  Two stacked windows over one shuffle on
    user_id."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    # microsecond-exact gap on timestamp_ntz (TZ-independent in both engines)
    gap = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    sess = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0),
        )
        .withColumn(
            "session_seq",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("session_value"),
    )


def session_paths(
    spark: SparkSession, sf_dir: str, *, max_steps: int = 5, top_k: int = 20
) -> DataFrame:
    """Top user journeys: the most frequent event-type PATHS taken
    within a session — the product-analytics query behind "what do
    users actually do?" flow charts.  Sessions use the same 30-min
    gaps-and-islands rule as events_sessionization; a session's path
    is its first ``max_steps`` event types joined with '>', truncated
    paths marked with a trailing '>…' so "a>b" (complete) and "a>b>…"
    (longer journey) count separately.

    Shape: the sessionization windows (one shuffle on user_id), then a
    per-session ordered collect bounded at ``max_steps`` elements, a
    path-cardinality count aggregate, and a total-order top-k — every
    stage past the fact scan is session- then path-cardinality work.
    Ordering inside the session is (ts, event_id) — the repo-wide
    within-microsecond tiebreak — so the path strings are
    deterministic."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    sess = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0),
        )
        .withColumn(
            "session_seq",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "step",
            F.row_number().over(
                Window.partitionBy("user_id", "session_seq").orderBy(
                    F.asc("ts"), F.asc("event_id")
                )
            ),
        )
    )
    paths = (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("step") <= max_steps,
                                F.struct("step", "event_type"),
                            )
                        )
                    ),
                    lambda s: s.getField("event_type"),
                ),
            ).alias("path"),
            F.max("step").alias("n_steps"),
        )
        .select(
            F.when(
                F.col("n_steps") > max_steps,
                F.concat(F.col("path"), F.lit(">…")),
            )
            .otherwise(F.col("path"))
            .alias("path")
        )
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    top = counts.orderBy(
        F.desc("n_sessions"), F.asc("path")
    ).limit(top_k)
    rw = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return top.withColumn(
        "rank", F.row_number().over(rw).cast("long")
    )


def session_paths_sql(
    table: str = "events", *, max_steps: int = 5, top_k: int = 20
) -> str:
    """DuckDB twin of :func:`session_paths`."""
    return f"""
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         lag(ts) OVER w AS prev_ts
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT *, SUM(CASE WHEN prev_ts IS NULL
                     OR date_diff('microsecond', prev_ts, ts)
                        > 1800000000
                THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM o),
st AS (
  SELECT *, row_number() OVER (
              PARTITION BY user_id, session_seq
              ORDER BY ts, event_id) AS step
  FROM s),
p AS (
  SELECT user_id, session_seq,
         string_agg(event_type, '>' ORDER BY step)
           FILTER (WHERE step <= {max_steps}) AS path,
         MAX(step) AS n_steps
  FROM st GROUP BY user_id, session_seq),
pc AS (
  SELECT CASE WHEN n_steps > {max_steps}
              THEN path || '>…' ELSE path END AS path
  FROM p),
c AS (
  SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
  FROM pc GROUP BY path)
SELECT path, n_sessions,
       CAST(row_number() OVER (ORDER BY n_sessions DESC, path)
            AS BIGINT) AS rank
FROM c
ORDER BY n_sessions DESC, path
LIMIT {top_k}
"""


def window_funnel(
    spark: SparkSession,
    sf_dir: str,
    *,
    steps: tuple = ("signup", "click", "purchase"),
    window_days: int = 7,
) -> DataFrame:
    """Time-constrained funnel (the ClickHouse ``windowFunnel`` shape):
    a user completes step N only if there is SOME chain
    t₁ < t₂ < ... < t_N with every step inside ``window_days`` of the
    chain's FIRST step.  This differs from :func:`event_funnel` in both
    directions: first-occurrence chaining misses users whose first
    signup went stale but a later one converted (restarts allowed
    here), and it counts conversions that took months (window-bounded
    here).

    Plan: step-1 anchors are all step-1 events; each later step is a
    user-keyed equi-join constrained to (prev_t, anchor_t + window],
    reduced to the EARLIEST qualifying time per anchor before the next
    join (min-struct groupBy) — greedy-earliest is optimal here, so
    per-step state stays one row per surviving anchor.  All joins are
    hash-partitioned on user_id; per-user fan-out is bounded by that
    user's step counts, never cross-user.  Output: one row per funnel
    depth with users reaching it."""
    ev = load_events(spark, sf_dir)
    win_us = window_days * 86_400_000_000
    anchors = ev.filter(F.col("event_type") == steps[0]).select(
        "user_id", F.col("ts").alias("t0")
    )
    from functools import reduce

    cur = anchors.withColumn("tp", F.col("t0"))
    stages = [cur]
    for step in steps[1:]:
        nxt = ev.filter(F.col("event_type") == step).select(
            "user_id", F.col("ts").alias("tn")
        )
        gap_anchor = F.expr("timestampdiff(MICROSECOND, t0, tn)")
        cur = (
            cur.join(nxt, "user_id")
            .filter(
                (F.col("tn") > F.col("tp"))
                & (gap_anchor <= F.lit(win_us))
            )
            .groupBy("user_id", "t0")
            .agg(F.min("tn").alias("tp"))
            .select("user_id", "t0", "tp")
        )
        stages.append(cur)
    parts = [
        st.agg(F.countDistinct("user_id").cast("long").alias("n_users"))
        .select(
            F.lit(i + 1).cast("int").alias("level"),
            F.lit(steps[i]).alias("step"),
            "n_users",
        )
        for i, st in enumerate(stages)
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def window_funnel_sql(
    table: str = "events",
    *,
    steps: tuple = ("signup", "click", "purchase"),
    window_days: int = 7,
) -> str:
    """DuckDB twin of :func:`window_funnel` — same greedy-earliest
    chain per anchor."""
    win_us = window_days * 86_400_000_000
    ctes = [
        f"s1 AS (SELECT user_id, ts AS t0, ts AS tp FROM {table} "
        f"WHERE event_type = '{steps[0]}')"
    ]
    for i, step in enumerate(steps[1:], start=2):
        prev = f"s{i - 1}"
        ctes.append(
            f"""s{i} AS (
  SELECT p.user_id, p.t0, MIN(n.ts) AS tp
  FROM {prev} p JOIN {table} n
    ON n.user_id = p.user_id AND n.event_type = '{step}'
   AND n.ts > p.tp
   AND date_diff('microsecond', p.t0, n.ts) <= {win_us}
  GROUP BY p.user_id, p.t0)"""
        )
    selects = [
        f"SELECT {i + 1} AS level, '{s}' AS step, "
        f"CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
        f"FROM s{i + 1}"
        for i, s in enumerate(steps)
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(selects)
    )


def psi_drift_report(
    spark: SparkSession,
    sf_dir: str,
    *,
    bucket_width: float = 50.0,
    n_buckets: int = 10,
    split_day: int = 15,
) -> DataFrame:
    """Population Stability Index per event type — the standard
    model-monitoring drift score between two periods: bucket the value
    distribution (fixed-width literal buckets — deterministic, no
    data-dependent breakpoints), compare first-half vs second-half
    shares, PSI = Σ_b (p_new − p_old)·ln(p_new/p_old).  The usual
    reading: <0.1 stable, 0.1–0.25 moderate, >0.25 major drift.

    Empty buckets would put 0 into the log, so shares use add-one
    (Laplace) smoothing over the bucket spine — (n_b+1)/(N+B), exact
    integer counts in, single-division doubles out.  Each bucket's
    contribution is rounded to 6 dp then decimal-summed, the
    corpus-LM discipline that keeps cross-engine ln jitter out of the
    hash.  Shape: one conditional aggregate per (type, bucket) — the
    spine is types × n_buckets rows — then a spine-sized rollup."""
    ev = load_events(spark, sf_dir)
    counts = psi_partials(
        ev,
        bucket_width=bucket_width,
        n_buckets=n_buckets,
        split_day=split_day,
    )
    # partials grouped globally above → already unique per (type,
    # bucket); skip the redundant re-merge (KS/Gini re-pin lesson)
    return psi_finalize(counts, n_buckets=n_buckets, assume_merged=True)


def psi_partials(
    batch: DataFrame,
    *,
    bucket_width: float = 50.0,
    n_buckets: int = 10,
    split_day: int = 15,
) -> DataFrame:
    """Mergeable PSI partials: exact (event_type, bucket) → (n_old,
    n_new) counts for one batch of rows.  Sidedness is a literal
    calendar rule (day-of-month > split_day), so it is batch-local —
    unlike the KS midpoint there is no whole-stream extremum, and any
    regrouping of rows into micro-batches re-sums to the batch answer
    bit-for-bit.  State is |types|×n_buckets counters, never values."""
    b = F.least(
        F.floor(F.col("value") / bucket_width).cast("int"),
        F.lit(n_buckets - 1),
    )
    period_new = F.dayofmonth("ts") > split_day
    return batch.groupBy(F.col("event_type"), b.alias("bucket")).agg(
        F.sum(F.when(~period_new, 1).otherwise(0)).alias("n_old"),
        F.sum(F.when(period_new, 1).otherwise(0)).alias("n_new"),
    )


def psi_finalize(
    parts: DataFrame,
    *,
    n_buckets: int = 10,
    assume_merged: bool = False,
) -> DataFrame:
    """Finalize PSI from (possibly un-merged) partial counter rows:
    re-sum per (type, bucket), join the bucket spine so buckets empty
    in one period still contribute, Laplace-smooth the shares, and
    decimal-sum the 6-dp-rounded contributions (the corpus-LM rounding
    discipline).  Runs over the counter table only — spine-sized work,
    independent of stream length.  ``assume_merged=True`` skips the
    re-merge when the caller's rows are already unique per (type,
    bucket) — the batch path, where :func:`psi_partials` grouped
    globally (the KS/Gini re-pin lesson: don't pay a redundant shuffle
    on the batch fast path)."""
    spark = parts.sparkSession
    merged = parts if assume_merged else (
        parts.groupBy("event_type", "bucket").agg(
            F.sum("n_old").alias("n_old"), F.sum("n_new").alias("n_new")
        )
    )
    # bucket spine so buckets empty in ONE period still contribute
    spine = (
        merged.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(n_buckets).select(
                F.col("id").cast("int").alias("bucket")
            )
        )
    )
    full = spine.join(merged, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    tot = full.groupBy("event_type").agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new")
    )
    j = full.join(F.broadcast(tot), "event_type")
    p_old = (F.col("n_old") + 1).cast("double") / (
        F.col("t_old") + n_buckets
    )
    p_new = (F.col("n_new") + 1).cast("double") / (
        F.col("t_new") + n_buckets
    )
    contrib = F.round(
        (p_new - p_old) * F.log(p_new / p_old), 6
    ).cast("decimal(18,6)")
    return (
        j.select("event_type", contrib.alias("c"))
        .groupBy("event_type")
        .agg(F.sum("c").cast("double").alias("psi"))
        .select(
            "event_type",
            "psi",
            (F.col("psi") >= 0.1).alias("drifted"),
        )
    )


def events_js_drift(
    spark: SparkSession,
    sf_dir: str,
    *,
    bucket_width: float = 50.0,
    n_buckets: int = 10,
    split_day: int = 15,
) -> DataFrame:
    """Jensen–Shannon divergence per event type between the two
    calendar periods — the bounded, symmetric member of the drift
    triad (PSI is unbounded and blows up on near-empty buckets; KS
    sees only the worst single quantile; JS ∈ [0, ln 2] weighs the
    whole distribution and never divides by zero even unsmoothed).

    Shares :func:`psi_partials`' counter lattice EXACTLY — one
    (type, bucket) → (n_old, n_new) state table powers PSI, JS and
    the live twins; adding a drift score costs a finalize, not a
    second corpus scan (the shared-sufficient-statistics discipline
    from streaming_funnel).  Same Laplace smoothing and 6-dp
    round-then-decimal-sum as PSI so the oracle's ln jitter can't
    reach the hash."""
    ev = load_events(spark, sf_dir)
    counts = psi_partials(
        ev,
        bucket_width=bucket_width,
        n_buckets=n_buckets,
        split_day=split_day,
    )
    return js_finalize(counts, n_buckets=n_buckets, assume_merged=True)


def js_finalize(
    parts: DataFrame,
    *,
    n_buckets: int = 10,
    assume_merged: bool = False,
) -> DataFrame:
    """JS(P, Q) = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m), m = (p+q)/2, over the
    same smoothed bucket shares :func:`psi_finalize` uses — shared
    with the live twin, whose state IS the counter table."""
    spark = parts.sparkSession
    merged = parts if assume_merged else (
        parts.groupBy("event_type", "bucket").agg(
            F.sum("n_old").alias("n_old"), F.sum("n_new").alias("n_new")
        )
    )
    spine = (
        merged.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(n_buckets).select(
                F.col("id").cast("int").alias("bucket")
            )
        )
    )
    full = spine.join(merged, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    tot = full.groupBy("event_type").agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new")
    )
    j = full.join(F.broadcast(tot), "event_type")
    p = (F.col("n_old") + 1).cast("double") / (F.col("t_old") + n_buckets)
    q = (F.col("n_new") + 1).cast("double") / (F.col("t_new") + n_buckets)
    m = (p + q) / F.lit(2.0)
    contrib = F.round(
        (p * F.log(p / m) + q * F.log(q / m)) / F.lit(2.0), 6
    ).cast("decimal(18,6)")
    return (
        j.select("event_type", contrib.alias("c"))
        .groupBy("event_type")
        .agg(F.sum("c").cast("double").alias("js"))
        .select(
            "event_type",
            "js",
            (F.col("js") >= 0.05).alias("drifted"),
        )
    )


def events_js_drift_sql(
    table: str = "events",
    *,
    bucket_width: float = 50.0,
    n_buckets: int = 10,
    split_day: int = 15,
) -> str:
    """DuckDB twin of :func:`events_js_drift`."""
    return f"""
WITH ev AS (
  SELECT event_type,
         LEAST(CAST(FLOOR(value / CAST({bucket_width!r} AS DOUBLE))
                    AS INT), {n_buckets - 1}) AS bucket,
         (day(ts) > {split_day}) AS is_new
  FROM {table}),
counts AS (
  SELECT event_type, bucket,
         SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS n_old,
         SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS n_new
  FROM ev GROUP BY 1, 2),
spine AS (
  SELECT t.event_type, CAST(g AS INT) AS bucket
  FROM (SELECT DISTINCT event_type FROM {table}) t
  CROSS JOIN generate_series(0, {n_buckets - 1}) s(g)),
full_t AS (
  SELECT s.event_type, s.bucket,
         COALESCE(c.n_old, 0) AS n_old, COALESCE(c.n_new, 0) AS n_new
  FROM spine s LEFT JOIN counts c USING (event_type, bucket)),
tot AS (
  SELECT event_type, SUM(n_old) AS t_old, SUM(n_new) AS t_new
  FROM full_t GROUP BY event_type),
pq AS (
  SELECT f.event_type,
         CAST(f.n_old + 1 AS DOUBLE) / (t.t_old + {n_buckets}) AS p,
         CAST(f.n_new + 1 AS DOUBLE) / (t.t_new + {n_buckets}) AS q
  FROM full_t f JOIN tot t USING (event_type)),
c AS (
  SELECT event_type,
         CAST(round(
           (p * ln(p / ((p + q) / CAST(2 AS DOUBLE)))
            + q * ln(q / ((p + q) / CAST(2 AS DOUBLE))))
           / CAST(2 AS DOUBLE), 6) AS DECIMAL(18,6)) AS c
  FROM pq)
SELECT event_type, CAST(SUM(c) AS DOUBLE) AS js,
       (CAST(SUM(c) AS DOUBLE) >= CAST(0.05 AS DOUBLE)) AS drifted
FROM c GROUP BY event_type
"""


def psi_drift_report_sql(
    table: str = "events",
    *,
    bucket_width: float = 50.0,
    n_buckets: int = 10,
    split_day: int = 15,
) -> str:
    """DuckDB twin of :func:`psi_drift_report`."""
    return f"""
WITH ev AS (
  SELECT event_type,
         LEAST(CAST(FLOOR(value / CAST({bucket_width!r} AS DOUBLE))
                    AS INT), {n_buckets - 1}) AS bucket,
         (day(ts) > {split_day}) AS is_new
  FROM {table}),
counts AS (
  SELECT event_type, bucket,
         SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS n_old,
         SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS n_new
  FROM ev GROUP BY 1, 2),
spine AS (
  SELECT t.event_type, CAST(g AS INT) AS bucket
  FROM (SELECT DISTINCT event_type FROM {table}) t
  CROSS JOIN generate_series(0, {n_buckets - 1}) s(g)),
full_t AS (
  SELECT s.event_type, s.bucket,
         COALESCE(c.n_old, 0) AS n_old, COALESCE(c.n_new, 0) AS n_new
  FROM spine s LEFT JOIN counts c USING (event_type, bucket)),
tot AS (
  SELECT event_type, SUM(n_old) AS t_old, SUM(n_new) AS t_new
  FROM full_t GROUP BY event_type),
c AS (
  SELECT f.event_type,
         CAST(round(
           (CAST(f.n_new + 1 AS DOUBLE) / (t.t_new + {n_buckets})
            - CAST(f.n_old + 1 AS DOUBLE) / (t.t_old + {n_buckets}))
           * ln((CAST(f.n_new + 1 AS DOUBLE) / (t.t_new + {n_buckets}))
                / (CAST(f.n_old + 1 AS DOUBLE)
                   / (t.t_old + {n_buckets}))), 6)
           AS DECIMAL(18,6)) AS c
  FROM full_t f JOIN tot t USING (event_type))
SELECT event_type, CAST(SUM(c) AS DOUBLE) AS psi,
       (CAST(SUM(c) AS DOUBLE) >= CAST(0.1 AS DOUBLE)) AS drifted
FROM c GROUP BY event_type
"""


def pareto_frontier(
    df: DataFrame,
    *,
    max_col: str,
    min_col: str,
) -> DataFrame:
    """2-D Pareto frontier (skyline): the points not dominated by any
    other — no point offers ≥ ``max_col`` AND ≤ ``min_col`` with one
    strict ("most quantity for the least price").  The naive skyline is
    an all-pairs anti-join; this is the spine decomposition that
    scales: aggregate ``min(min_col)`` per distinct ``max_col`` value
    (one hash aggregate — the only pass over the data), then a running
    strictly-suffix min over the VALUE SPINE (window over distinct
    values, not rows) marks frontier points — kept iff the best price
    at any strictly larger quantity isn't already ≤ ours.

    The window orders the spine globally, which is safe because the
    spine is value-domain-sized; for continuous domains, quantize into
    buckets first (scale_to_cells / curriculum_bins discipline) —
    bucket-frontier ⊇ exact frontier and a bounded per-bucket refine
    finishes it.  Ties: equal (x, y) points collapse to one frontier
    row (the frontier is a SET of points)."""
    spine = df.groupBy(F.col(max_col).alias("x")).agg(
        F.min(F.col(min_col)).alias("y")
    )
    w = (
        Window.orderBy(F.desc("x"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        spine.withColumn("best_above", F.min("y").over(w))
        .filter(
            F.col("best_above").isNull()
            | (F.col("y") < F.col("best_above"))
        )
        .select(F.col("x").alias(max_col), F.col("y").alias(min_col))
    )


def pareto_frontier_sql(
    table: str, *, max_col: str, min_col: str
) -> str:
    """DuckDB twin of :func:`pareto_frontier`."""
    return f"""
WITH spine AS (
  SELECT {max_col} AS x, MIN({min_col}) AS y
  FROM {table} GROUP BY {max_col}),
r AS (
  SELECT x, y,
         MIN(y) OVER (ORDER BY x DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS best_above
  FROM spine)
SELECT x AS {max_col}, y AS {min_col}
FROM r WHERE best_above IS NULL OR y < best_above
"""


def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the props column — stays in codegen."""
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


def event_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op + ratio query: per-type share of total events, exact
    integer arithmetic until the final division."""
    ev = load_events(spark, sf_dir)
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("t"))
    return counts.crossJoin(F.broadcast(total)).select(
        "event_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("t").cast("double"), 6).alias("share"),
    )


def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers — the monitoring/feature-engineering
    standardization op.  Moments come from EXACT decimal sums (s1, s2),
    then mean/var/std are derived in double with the identical expression
    shape in both engines, so z is deterministic without quantizing the
    raw values.  The 5-row stats table broadcasts back onto the fact
    scan; the filter uses the unrounded z (the rounded display value
    could flip at a .5 boundary).

    Scale shape: one partial-agg'd aggregate over the fact + one
    broadcast join — the standardization pattern that works at any
    fact size."""
    ev = load_events(spark, sf_dir)
    d = F.col("value").cast("decimal(18,4)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d).alias("s1"),
        F.sum(d * d).alias("s2"),
    ).select(
        "event_type",
        "n",
        (F.col("s1").cast("double") / F.col("n")).alias("mean"),
        # n > 1 guard: ANSI mode makes /0 throw (DuckDB yields NULL) — a
        # single-row group must produce NULL std, filtered out below
        F.when(
            F.col("n") > 1,
            F.sqrt(
                (
                    F.col("s2").cast("double")
                    - F.col("s1").cast("double")
                    * F.col("s1").cast("double")
                    / F.col("n")
                )
                / (F.col("n") - 1)
            ),
        ).alias("std"),
    )
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter((F.col("std") > 0) & (F.abs(z) >= 3.0))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 4).alias("z"),
        )
    )


# ---------------------------------------------------------------------------
# percentiles, cube, set ops, scalar subqueries, string/date functions
# ---------------------------------------------------------------------------

def revenue_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile == DuckDB
    quantile_cont bit-for-bit — verified; approx_percentile would NOT
    match and is the knob to flip at 100 TB)."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def part_size_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (type, size decade): all four grouping-set combinations."""
    part = load(spark, sf_dir, "part")
    # floor, not cast: Spark's int cast truncates but DuckDB's rounds
    decade = F.floor(F.col("p_size") / 10).cast("long")
    return (
        part.withColumn("size_decade", decade)
        .cube("p_type", "size_decade")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            _sum_money(_d("p_retailprice"), "total_price"),
        )
    )


def order_key_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT cardinalities between two key sets:
    orders containing returned items vs urgent-priority orders."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    a = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("okey")
    )
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("okey")
    )
    u = a.union(b).distinct().agg(F.count(F.lit(1)).alias("n_union"))
    i = a.intersect(b).agg(F.count(F.lit(1)).alias("n_intersect"))
    e = a.distinct().exceptAll(b.distinct()).agg(
        F.count(F.lit(1)).alias("n_except")
    )
    return u.crossJoin(i).crossJoin(e)


def customer_name_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function projection layer: regex extraction, casing,
    substring, length — all codegen'd Catalyst expressions."""
    cust = load(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)$", 1).cast("long").alias("cust_num"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.upper("c_mktsegment").alias("segment_upper"),
        F.concat_ws("/", "c_mktsegment", F.col("c_nationkey").cast("string")).alias("seg_nation"),
    )


def orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery pattern: global exact average via broadcast cross
    join (one row), then filter — no second scan of the fact table."""
    orders = load(spark, sf_dir, "orders")
    avg = orders.agg(
        (F.sum(_d("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("avg_price")
    )
    return (
        orders.crossJoin(F.broadcast(avg))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function extraction + aggregation."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mon"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _sum_money(_d("o_totalprice"), "total_price"),
        )
    )


def quantity_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation via exact decimal moments.

    Native ``corr()`` accumulates doubles in partition order — fine for
    analytics, fatal for a cross-engine hash check.  Building the five
    moments (n, Σx, Σy, Σxy, Σx², Σy²) as exact decimal sums makes the
    final double arithmetic bit-identical in both engines."""
    li = load(spark, sf_dir, "lineitem")
    x = _d("l_quantity")
    y = _d("l_discount")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    # NULL for zero-variance groups (ANSI Spark would throw on /0;
    # DuckDB returns NULL — match it)
    corr = F.when(den != 0.0, (n * sxy - sx * sy) / den).otherwise(
        F.lit(None).cast("double")
    )
    return m.select(
        "l_returnflag", "n", F.round(corr, 6).alias("qty_discount_corr")
    )


HIGH_VALUE_CUSTOMERS_SQL = """
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       COUNT(o.o_orderkey) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
FROM {customer} c
JOIN {nation} n ON c.c_nationkey = n.n_nationkey
JOIN {orders} o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name, n.n_name
HAVING COUNT(o.o_orderkey) >= 12
"""


def high_value_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-API-authored query (every other plan uses the DataFrame API;
    Catalyst produces the same plans from either — this one demonstrates
    the spark.sql surface, HAVING included).  The oracle runs the same
    text with DuckDB's view names."""
    for t in ("customer", "nation", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"isq_{t}")
    return spark.sql(
        HIGH_VALUE_CUSTOMERS_SQL.format(
            customer="isq_customer", nation="isq_nation", orders="isq_orders"
        )
    )


def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via explicit floor arithmetic (width_bucket
    isn't portable to the DuckDB oracle): 12 buckets of 50k over
    o_totalprice, clamped at the top."""
    orders = load(spark, sf_dir, "orders")
    bucket = (
        F.least(
            F.greatest(F.floor(F.col("o_totalprice") / 50000.0), F.lit(0)),
            F.lit(11),
        ).cast("long")
        + 1
    )
    return (
        orders.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _sum_money(_d("o_totalprice"), "bucket_total"),
        )
    )


def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes, in batch: each event
    belongs to exactly window/slide = 2 windows, assigned by exploding
    slot offsets (the batch twin of streaming F.window(ts, '1h', '30m')).
    Microsecond integer arithmetic end to end — oracle-exact."""
    slide_us = 1_800_000_000  # 30 min
    ev = load_events(spark, sf_dir)
    slot = F.expr(
        "timestampdiff(MICROSECOND, to_timestamp_ntz('1970-01-01 00:00:00'), ts)"
        " div 1800000000"
    )
    w = (
        ev.withColumn("slot", slot)
        .withColumn("k", F.explode(F.array(F.lit(0), F.lit(1))))
        .withColumn("ws_us", (F.col("slot") - F.col("k")) * F.lit(slide_us))
    )
    return (
        w.groupBy(
            F.date_format(
                F.timestamp_micros(F.col("ws_us")).cast("timestamp_ntz"),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H shape completion (adapted to the harness's reduced schemas: no
# partsupp table, no commit/receipt dates, no ship modes/containers/
# phones).  Each query keeps its namesake's SHAPE — the join topology,
# correlation pattern, and aggregation style — with predicates rewritten
# onto existing columns.  Money math follows the module's decimal
# discipline; shares are rounded to 6 dp; every top-k tie-breaks on a key.
# ---------------------------------------------------------------------------


def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS-correlated semi join.  Orders in a quarter having
    at least one lineitem shipped after the order date, counted by
    priority.  The semi join keeps the probe side duplicate-free without
    a distinct."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: the two-nation trade-flow join — supplier nation and
    customer nation resolved through separate broadcast dimension chains,
    revenue by (supp_nation, cust_nation, year) for both directions of
    one nation pair."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(_sum_money(revenue, "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: market share — one nation's fraction of a region's
    revenue for one part type, per year.  Conditional aggregation over
    the full star join; the share division is guarded (a year with no
    revenue yields NULL, matching SQL semantics in both engines)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    base = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left_semi")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    agg = base.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_1", revenue).otherwise(
                F.lit(0).cast(DEC)
            )
        ).alias("nation_rev"),
        F.sum(revenue).alias("total_rev"),
    )
    return agg.select(
        "o_year",
        F.round(
            F.when(
                F.col("total_rev") > 0,
                F.col("nation_rev").cast("double")
                / F.col("total_rev").cast("double"),
            ),
            6,
        ).alias("mkt_share"),
        F.col("total_rev").cast("double").alias("total_revenue"),
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (sans partsupp): revenue from parts matching a name
    pattern, by supplier nation and order year."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(_sum_money(revenue, "sum_profit"), F.count(F.lit(1)).alias("n_items"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 customers by revenue lost to returns in a
    quarter.  Deterministic top-k: rank on the exact decimal revenue with
    a key tie-break BEFORE the double cast."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).alias("rev_dec"))
    )
    return (
        agg.orderBy(F.desc("rev_dec"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("rev_dec").cast("double").alias("revenue"),
        )
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: two-level aggregation — orders per customer (left join
    keeps zero-order customers), then the distribution of those counts."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo revenue share — conditional sum over a month
    range, one output row, share as 100× ratio of exact decimal sums
    evaluated in double after the cast."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    part = load(spark, sf_dir, "part")
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", revenue).otherwise(
                    F.lit(0).cast(DEC)
                )
            ).alias("promo_rev"),
            F.sum(revenue).alias("total_rev"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    return agg.select(
        F.round(
            F.when(
                F.col("total_rev") > 0,
                F.lit(100.0)
                * F.col("promo_rev").cast("double")
                / F.col("total_rev").cast("double"),
            ),
            6,
        ).alias("promo_share_pct"),
        F.col("total_rev").cast("double").alias("total_revenue"),
        "n_items",
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) achieving the maximum quarterly revenue —
    the scalar-subquery-on-aggregate pattern.  The max comparison runs on
    EXACT decimals (order-independent), so ties and the selected set are
    engine-stable; doubles appear only in the output."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    supp = load(spark, sf_dir, "supplier")
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(F.sum(revenue).alias("rev_dec"))
    mx = per_supp.agg(F.max("rev_dec").alias("max_rev"))
    return (
        per_supp.join(F.broadcast(mx), per_supp.rev_dec == mx.max_rev)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            F.col("s_suppkey"),
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated per-part average — lineitems of one brand
    whose quantity is below half the part's average quantity.  The
    correlated subquery becomes a broadcast join against the per-part
    aggregate; the avg is an exact decimal sum divided in double, in the
    same operation order as the oracle."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (
            F.sum(_d("l_quantity")).cast("double") / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .join(F.broadcast(per_part), li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            _sum_money(revenue, "small_qty_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose total quantity exceeds a threshold, with
    their customers — HAVING on a grouped fact, then dimension joins."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_d("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunctive multi-branch predicate (brand × size band ×
    quantity band) — the optimizer-stress pattern where OR branches must
    not defeat join pushdown."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    branch1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 15)
    )
    branch2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 25)
    )
    branch3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    revenue = _d("l_extendedprice") * (F.lit(1).cast(DEC) - _d("l_discount"))
    return j.filter(branch1 | branch2 | branch3).agg(
        _sum_money(revenue, "revenue"), F.count(F.lit(1)).alias("n_items")
    )


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average account balances with an anti join on
    recent activity — customers richer than the positive-balance average
    with no orders since 1999, counted per nation."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")
    )
    nation = load(spark, sf_dir, "nation")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(_d("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _sum_money(_d("c_acctbal"), "total_acctbal"),
        )
    )


def q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (sans partsupp): for each small part in one region, the
    best supplier among those who actually shipped it — the correlated
    max-per-group subquery, expressed as a window over the
    lineitem-derived part↔supplier relationship."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    rel = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey,
            "left_semi",
        )
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return (
        rel.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "p_partkey", "p_brand", "p_size",
            "s_suppkey", "s_name", "n_name", "s_acctbal",
        )
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (partsupp replaced by the lineitem-observed
    relationship): distinct-supplier counts per (brand, type, size) for
    non-excluded brands."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    return (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def funnel_first_partials(
    batch: DataFrame,
    *,
    steps: tuple = ("signup", "click", "purchase"),
) -> DataFrame:
    """Mergeable funnel state: per-user FIRST-occurrence timestamp per
    step — min is a merge lattice (min of per-batch mins = global
    min), so the per-user (t1, t2, t3) triple maintained across
    micro-batches equals the batch aggregate under any regrouping, and
    the strict-order gates / latency percentiles apply at finalize
    over the |users|-sized state (the entity-rollup class).  Used by
    event_funnel, funnel_latency, and their live twins."""
    s1n, s2n, s3n = steps
    return batch.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == s1n, F.col("ts"))).alias("t1"),
        F.min(F.when(F.col("event_type") == s2n, F.col("ts"))).alias("t2"),
        F.min(F.when(F.col("event_type") == s3n, F.col("ts"))).alias("t3"),
    )


def funnel_first_merge(parts: DataFrame) -> DataFrame:
    """Re-merge (possibly duplicated per user) first-occurrence
    partials: MIN per user and step."""
    return parts.groupBy("user_id").agg(
        F.min("t1").alias("t1"),
        F.min("t2").alias("t2"),
        F.min("t3").alias("t3"),
    )


def funnel_stage_finalize(per_user: DataFrame) -> DataFrame:
    """The strict-order stage gates + counts over the per-user
    first-occurrence state — the tail of :func:`event_funnel`."""
    s1 = F.col("t1").isNotNull()
    s2 = s1 & F.col("t2").isNotNull() & (F.col("t2") > F.col("t1"))
    s3 = s2 & F.col("t3").isNotNull() & (F.col("t3") > F.col("t2"))
    gated = per_user.select(
        s1.alias("s1"), s2.alias("s2"), s3.alias("s3")
    )
    agg = gated.agg(
        F.sum(F.when(F.col("s1"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("s2"), 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("s3"), 1).otherwise(0)).cast("long").alias("n3"),
    )
    return agg.select(
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("stage"), F.lit("signup").alias("step"),
                         F.col("n1").alias("n_users")),
                F.struct(F.lit(2).alias("stage"), F.lit("signup>click").alias("step"),
                         F.col("n2").alias("n_users")),
                F.struct(F.lit(3).alias("stage"), F.lit("signup>click>purchase").alias("step"),
                         F.col("n3").alias("n_users")),
            )
        ).alias("s")
    ).select(
        F.col("s.stage").cast("long").alias("stage"),
        F.col("s.step").alias("step"),
        F.col("s.n_users").alias("n_users"),
    )


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (signup → click → purchase): per-user
    first-occurrence timestamps per step, chained by strict temporal
    order; one row per funnel stage with the user count reaching it.

    Shape: one conditional-min aggregation per user (single shuffle),
    then stage gates as CASE chains — the product-analytics pattern that
    usually gets pushed to a specialized engine, expressed as two hash
    aggregates."""
    ev = load_events(spark, sf_dir)
    per_user = funnel_first_partials(ev)
    # strict order: step N counts only if it happens after step N-1's
    # first occurrence (first click after first signup, etc.) — the
    # gates live in funnel_stage_finalize, shared with the live twin
    return funnel_stage_finalize(per_user)


def events_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 5-event mean of the value column — the row-frame
    window shape (time-series smoothing).  Exact decimal sum over the
    frame divided by the frame's row count, so partial-frame rows at the
    start of each user's history are exact too."""
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-4, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("rolling_avg_5"),
    )


#: events_ewma weights: alpha=1/4 decay over an 8-lag window, scaled to
#: EXACT integers — w_j = 3^j * 4^(7-j), so w_0=16384 (newest) down to
#: w_7=2187.  Truncating the tail (weights beyond lag 7 are < 12% of
#: mass) is what makes the recursive EWMA definition a bounded window
#: expression both engines evaluate identically.
EWMA_WEIGHTS = [3**j * 4 ** (7 - j) for j in range(8)]


def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of the value
    series — the standard monitoring/trend smoother, in the exact-
    arithmetic house style: the geometric decay (1-α)^j is scaled to
    the integer weights ``EWMA_WEIGHTS``, the numerator is an exact
    decimal Σ w_j·v_{t-j} over the 8-lag frame, the denominator counts
    only the weights whose lag exists (partial frames at series start
    are exact, mirroring events_rolling_avg), and only the FINAL
    divide is a double.  8 ``lag`` columns over one per-user window —
    single shuffle on user_id, codegen arithmetic, no self-join."""
    from functools import reduce
    from operator import add

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    v = F.col("value").cast("decimal(18,4)")
    lags = [v if j == 0 else F.lag(v, j).over(w)
            for j in range(len(EWMA_WEIGHTS))]
    numer = reduce(add, [
        F.coalesce(lag * F.lit(wt), F.lit(0).cast("decimal(18,4)"))
        for lag, wt in zip(lags, EWMA_WEIGHTS)
    ])
    denom = reduce(add, [
        F.when(lag.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
        for lag, wt in zip(lags, EWMA_WEIGHTS)
    ])
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
        F.round(numer.cast("double") / denom, 6).alias("ewma"),
    )


def events_ewma_sql(table: str = "events") -> str:
    """DuckDB twin of :func:`events_ewma` — same integer weights, same
    lag chain, same exact-decimal numerator / integer denominator."""
    n_terms = []
    d_terms = []
    for j, wt in enumerate(EWMA_WEIGHTS):
        lag = "v" if j == 0 else f"lag(v, {j}) OVER w"
        n_terms.append(
            f"COALESCE(({lag}) * {wt}, CAST(0 AS DECIMAL(18,4)))"
        )
        d_terms.append(
            f"CASE WHEN ({lag}) IS NULL THEN 0 ELSE {wt} END"
        )
    numer = " + ".join(n_terms)
    denom = " + ".join(d_terms)
    return f"""
WITH e AS (
  SELECT event_id, user_id, ts, CAST(value AS DECIMAL(18,4)) AS v
  FROM {table} WHERE value IS NOT NULL)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
       round(CAST({numer} AS DOUBLE) / ({denom}), 6) AS ewma
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def events_robust_anomaly(
    spark: SparkSession, sf_dir: str, *, rate: float = 0.5
) -> DataFrame:
    """Median/MAD outliers — the robust twin of :func:`events_anomaly`:
    modified z = 0.6745·(x − median)/MAD, flag |z| ≥ 3.5 (the
    Iglewicz–Hoaglin rule).  Mean/std anomaly scoring breaks down
    exactly when you need it (the outliers you're hunting inflate the
    std and mask themselves); median and MAD have a 50% breakdown
    point.

    Scale shape mirrors user_rfm_segments/grouped_quantiles: exact
    per-type medians would globally sort the fact table, so BOTH
    thresholds (median, then MAD = median of |x − med| over the same
    sample) come from the deterministic content-hash sample — sample
    membership is a row property, so the thresholds are reproducible
    across engines, runs, and partitionings — and ride a per-type
    broadcast back onto the full fact scan, where scoring is pure
    projection.  Two sample-sized aggregates + one broadcast join; the
    fact is scanned once.

    Filter uses the unrounded z (the displayed 4-dp round could flip a
    boundary row); MAD = 0 types produce NULL z and drop out, same as
    the std = 0 guard in events_anomaly."""
    from inception_spark.functions.hashing import h28

    ev = load_events(spark, sf_dir)
    thresh = int(rate * (1 << 28))
    sample = ev.filter(
        h28(F.concat(F.lit("ra\x1f"), F.col("event_id").cast("string")))
        < F.lit(thresh)
    ).select("event_type", F.col("value").cast("double").alias("v"))
    med = sample.groupBy("event_type").agg(
        F.round(F.expr("percentile(v, 0.5)"), 6).alias("med")
    )
    mad = (
        sample.join(F.broadcast(med), "event_type")
        .select(
            "event_type", F.abs(F.col("v") - F.col("med")).alias("ad")
        )
        .groupBy("event_type")
        .agg(F.round(F.expr("percentile(ad, 0.5)"), 6).alias("mad"))
    )
    stats = med.join(mad, "event_type")
    rz = (
        F.lit(0.6745)
        * (F.col("value") - F.col("med"))
        / F.col("mad")
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter((F.col("mad") > 0) & (F.abs(rz) >= 3.5))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(rz, 4).alias("robust_z"),
        )
    )


def events_robust_anomaly_sql(
    table: str = "events", *, rate: float = 0.5
) -> str:
    """DuckDB twin of :func:`events_robust_anomaly`."""
    from inception_spark.functions.hashing import h28_sql

    thresh = int(rate * (1 << 28))
    h = h28_sql("'ra' || chr(31) || CAST(event_id AS VARCHAR)")
    return f"""
WITH s AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v
  FROM {table} WHERE {h} < {thresh}),
med AS (
  SELECT event_type,
         round(quantile_cont(v, CAST(0.5 AS DOUBLE)), 6) AS med
  FROM s GROUP BY event_type),
mad AS (
  SELECT s.event_type,
         round(quantile_cont(abs(s.v - med.med),
                             CAST(0.5 AS DOUBLE)), 6) AS mad
  FROM s JOIN med USING (event_type) GROUP BY s.event_type),
st AS (SELECT med.event_type, med, mad FROM med JOIN mad USING (event_type))
SELECT e.event_id, e.event_type, e.value,
       round(CAST(0.6745 AS DOUBLE) * (e.value - st.med) / st.mad, 4)
         AS robust_z
FROM {table} e JOIN st ON e.event_type = st.event_type
WHERE st.mad > 0
  AND abs(CAST(0.6745 AS DOUBLE) * (e.value - st.med) / st.mad)
      >= CAST(3.5 AS DOUBLE)
"""


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day
    (cohort), counted by how many distinct days-since-cohort they were
    active — (cohort_day, day_offset, n_users).  Two hash aggregates +
    one broadcast-able join (per-user firsts are |users| rows)."""
    ev = load_events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_ts")
    )
    return (
        ev.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            F.date_format("cohort_ts", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_ts"))
            .cast("long")
            .alias("day_offset"),
        )
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly time spine per event type with gap filling — the
    time-series regularization every downstream model/monitor needs
    (dashboards and anomaly scorers choke on MISSING hours, which plain
    groupBy silently produces).

    Shape: one tiny min/max aggregate builds the hour spine
    (``sequence`` + explode — spine rows = hours × types, METADATA-sized
    next to the events themselves: a decade of hours is 87 k rows per
    type no matter how many petabytes of events), cross-joined with the
    distinct type table (broadcast), left-joined against the hourly
    aggregate, then a per-type ordered window forward-fills the rolling
    hourly average into gap hours.  The window runs over the SPINE (per
    type, bounded), never over raw events — so the plan scales with
    time span, not event volume."""
    ev = load_events(spark, sf_dir)
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_ts")
    )
    types = ev.select("event_type").distinct()
    spine = hours.crossJoin(F.broadcast(types))
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_value"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = spine.join(hourly, ["event_type", "hour_ts"], "left")
    return joined.select(
        "event_type",
        F.date_format("hour_ts", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.last("avg_value", ignorenulls=True).over(w).alias(
            "avg_value_ffill"
        ),
        F.col("n_events").isNull().alias("is_gap"),
    )


def scd2_history(
    df: DataFrame,
    *,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from a change log:
    (key, attr, valid_from, valid_to, is_current) — one row per RUN of
    equal attribute values, gaps-and-islands style.

    The island id is the classic two-window trick: flag rows where the
    attribute differs from its predecessor, running-sum the flags, then
    group by (key, island).  ``valid_to`` is the next island's start
    (NULL for the open current row), so intervals tile the key's
    timeline exactly — the standard point-in-time-join feed.

    Scale shape: every window is partitioned by ``key`` — no global
    ordering anywhere, the per-key sequential scan is exactly the work
    SCD semantics require, and the final aggregate shrinks the output
    to one row per change.  100 TB of events with bounded per-key
    cardinality runs this without any single-task stage.
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    # NULL-safe change detection: a NULL attr is its own value (a run of
    # NULLs is one island), via eqNullSafe + an explicit first-row flag
    # — `lag != attr` alone evaluates NULL around NULL attrs and both
    # merges NULL rows into the prior island and splits the run after
    flagged = df.select(
        F.col(key), F.col(attr), F.col(ts),
        *( [F.col(tiebreak)] if tiebreak else [] ),
    ).withColumn(
        "_chg",
        F.when(
            (F.row_number().over(w) == 1)
            | ~F.lag(attr).over(w).eqNullSafe(F.col(attr)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("_isl", F.sum("_chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ))
    runs = flagged.groupBy(key, "_isl").agg(
        # constant within the island; min matches the oracle's MIN and,
        # unlike first(), is deterministic under partial aggregation
        F.min(attr).alias(attr),
        F.min(ts).alias("valid_from"),
    )
    w2 = Window.partitionBy(key).orderBy("_isl")
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_isl")
        .select(key, attr, "valid_from", "valid_to", "is_current")
    )


def scd2_history_sql(
    table: str, *, key: str, attr: str, ts: str, tiebreak: str | None = None
) -> str:
    """DuckDB twin of :func:`scd2_history`."""
    tb = f", {tiebreak}" if tiebreak else ""
    return f"""
WITH flagged AS (
  SELECT {key}, {attr}, {ts}{tb},
         CASE WHEN row_number() OVER w = 1
                OR lag({attr}) OVER w IS DISTINCT FROM {attr}
              THEN 1 ELSE 0 END AS chg
  FROM {table}
  WINDOW w AS (PARTITION BY {key} ORDER BY {ts}{tb})),
isl AS (
  SELECT {key}, {attr}, {ts}{tb},
         SUM(chg) OVER (PARTITION BY {key} ORDER BY {ts}{tb}
                        ROWS UNBOUNDED PRECEDING) AS isl
  FROM flagged),
runs AS (
  SELECT {key}, isl, MIN({attr}) AS {attr}, MIN({ts}) AS valid_from
  FROM isl GROUP BY {key}, isl)
SELECT {key}, {attr}, valid_from,
       lead(valid_from) OVER (PARTITION BY {key} ORDER BY isl)
         AS valid_to,
       lead(valid_from) OVER (PARTITION BY {key} ORDER BY isl) IS NULL
         AS is_current
FROM runs
"""


def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per user: each event's value
    holds until the user's next event (lead over a per-user window),
    weight = holding seconds.  TWAP = sum(value*dt)/sum(dt) — the
    right average for irregularly-sampled series, where a plain AVG
    over-weights bursts.

    Determinism: dt is integer epoch seconds, each value*dt product is
    rounded then summed as DECIMAL(38,6) — exact arithmetic, immune to
    partition-order float drift.  Windows partition by user; no global
    sort."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer MICROseconds: unix_timestamp would truncate sub-second
    # precision differently than the oracle's epoch rounding.  The NTZ
    # parquet timestamps cast through TIMESTAMP (identity under the
    # pinned-UTC session TZ) because unix_micros rejects NTZ.
    usec = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    dt = (usec(F.lead("ts").over(w)) - usec(F.col("ts"))).cast("long")
    weighted = (
        ev.withColumn("dt", dt)
        .filter(F.col("dt").isNotNull() & (F.col("dt") > 0))
        .select(
            "user_id",
            F.round(F.col("value") * F.col("dt"), 6)
            .cast("decimal(38,6)")
            .alias("vdt"),
            "dt",
        )
    )
    return (
        weighted.groupBy("user_id")
        .agg(
            F.sum("vdt").alias("svdt"),
            F.sum("dt").cast("long").alias("total_usecs"),
        )
        .select(
            "user_id",
            (
                F.round(
                    F.col("svdt").cast("double")
                    / F.col("total_usecs").cast("double"),
                    6,
                )
                + F.lit(0.0)  # negative-zero canonicalization
            ).alias("twap"),
            "total_usecs",
        )
    )


EVENTS_TWAP_SQL = """
WITH d AS (
  SELECT user_id, value,
         epoch_us(lead(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id))
         - epoch_us(ts) AS dt
  FROM events),
w AS (
  SELECT user_id,
         CAST(round(value * dt, 6) AS DECIMAL(38,6)) AS vdt, dt
  FROM d WHERE dt IS NOT NULL AND dt > 0)
SELECT user_id,
       round(CAST(SUM(vdt) AS DOUBLE) / CAST(SUM(dt) AS DOUBLE), 6)
         + 0.0 AS twap,
       CAST(SUM(dt) AS BIGINT) AS total_usecs
FROM w GROUP BY user_id
"""


def events_cusum(
    spark: SparkSession,
    sf_dir: str,
    *,
    k_milli: int = 500,
    h_milli: int = 4000,
) -> DataFrame:
    """One-sided CUSUM change detection over the hourly event-rate
    series, per event type: (event_type, hour_ts, n_events, cusum_milli,
    alarm).

    The CUSUM recursion s_t = max(0, s_{t-1} + x_t − k) looks
    stateful-sequential, but it has a closed window form:
    ``s_t = C_t − min_{τ<=t} C_τ`` where C is the running sum of
    (x − k) — two ordered windows per event type, no recursion, no UDF,
    no driver loop.  x is standardized as x_t/mean − 1 (per-type mean
    via one aggregate joined back), in MILLI units so the whole
    statistic is integer arithmetic: x_milli = (1000·n_t) div mean-num
    trick avoided — instead x_milli = (n_t·1000·n_hours) div total_n −
    1000, exact integer division identical in both engines.

    100 TB shape: the windows are per event type over the HOURLY rollup
    (bounded by the time span, not the raw event count); the raw scan
    is one hash aggregate.
    """
    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    totals = hourly.groupBy("event_type").agg(
        F.sum("n_events").alias("total_n"),
        F.count(F.lit(1)).alias("n_hours"),
    )
    w = Window.partitionBy("event_type").orderBy("hour_ts")
    cum = Window.partitionBy("event_type").orderBy("hour_ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dev = (
        hourly.join(totals, "event_type")
        # deviation from the type's mean rate, milli-units, exact ints
        .withColumn(
            "x_milli",
            F.expr("(n_events * 1000 * n_hours) div total_n") - F.lit(1000)
            - F.lit(k_milli),
        )
        .withColumn("c", F.sum("x_milli").over(cum))
        .withColumn("cmin", F.least(F.min("c").over(cum), F.lit(0)))
        .withColumn("cusum_milli", (F.col("c") - F.col("cmin")).cast("long"))
    )
    return dev.select(
        "event_type",
        "hour_ts",
        F.col("n_events").cast("long").alias("n_events"),
        "cusum_milli",
        (F.col("cusum_milli") > h_milli).alias("alarm"),
    )


def events_cusum_sql(*, k_milli: int = 500, h_milli: int = 4000) -> str:
    """DuckDB twin of :func:`events_cusum`."""
    return f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2),
totals AS (
  SELECT event_type, SUM(n_events) AS total_n, COUNT(*) AS n_hours
  FROM hourly GROUP BY 1),
dev AS (
  SELECT h.event_type, h.hour_ts, h.n_events,
         (h.n_events * 1000 * t.n_hours) // t.total_n - 1000
           - {k_milli} AS x_milli
  FROM hourly h JOIN totals t USING (event_type)),
c AS (
  SELECT *, SUM(x_milli) OVER w AS c
  FROM dev
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
               ROWS UNBOUNDED PRECEDING)),
s AS (
  SELECT *, least(MIN(c) OVER w, 0) AS cmin
  FROM c
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
               ROWS UNBOUNDED PRECEDING))
SELECT event_type, hour_ts, CAST(n_events AS BIGINT) AS n_events,
       CAST(c - cmin AS BIGINT) AS cusum_milli,
       (c - cmin) > {h_milli} AS alarm
FROM s
"""


def events_resample_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's irregular `value` series resampled onto an hourly
    grid by LINEAR interpolation between the surrounding events:
    (user_id, hour_ts, value_interp) — the regularization step before
    any fixed-step model, complementing :func:`events_gap_fill`'s
    step-function fill.

    Shape: the user's events and grid points UNION into one ordered
    stream (grid rows carry NULL values), then two ignore-nulls
    windows — last-before and first-after — give each grid point its
    bracketing events in a single per-user pass; no as-of join, no
    per-grid-point probe.  Timestamps are integer microseconds, the
    interpolation itself is per-ROW double arithmetic (no cross-row
    float sums anywhere), so the oracle reproduces it bit-for-bit.
    Edge grid points clamp to the nearest event (the ffill/bfill
    convention).
    """
    ev = load_events(spark, sf_dir)
    usec = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    # event_id rides along as the within-microsecond tiebreak: without
    # it, two same-timestamp events make last_value/first_value pick an
    # implementation-defined row (cross-engine and cross-run drift)
    pts = ev.select(
        "user_id",
        F.col("ts"),
        F.col("value"),
        F.lit(0).alias("is_grid"),
        F.col("event_id").alias("_tb"),
    )
    spine = (
        ev.groupBy("user_id")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.max("ts").alias("hi"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("ts"),
        )
        .select(
            "user_id", "ts", F.lit(None).cast("double").alias("value"),
            F.lit(1).alias("is_grid"),
            F.lit(0).cast("long").alias("_tb"),
        )
    )
    # ev_t is pre-projected (not inlined in the window calls) so the two
    # same-frame window functions land in ONE Window node instead of
    # Spark splitting them across three (the inline CASE forces an
    # intermediate Project between Window operators).
    both = (
        pts.unionByName(spine)
        .withColumn("t_us", usec(F.col("ts")))
        .withColumn(
            "ev_t", F.when(F.col("value").isNotNull(), F.col("t_us"))
        )
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "is_grid", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # The forward bracket runs as a RUNNING frame over the exact reverse
    # total order: last-non-null in [start, current] under DESC order ==
    # first-non-null in [current, end] under ASC order (the (t_us,
    # is_grid, _tb) key is a total order within each user, so reversal
    # is exact).  Spark evaluates a (currentRow, unboundedFollowing)
    # frame by rescanning [current, end] for EVERY row — O(partition²);
    # with ~766-row avg partitions at sf0.1 that quadratic scan was most
    # of the query: same-session interleaved A/B min-of-4 at sf0.1 read
    # 3.01 s (old) vs 0.98 s (this form), bit-identical over all
    # 1,049,414 output rows; the r12 quiet pin for the old form was
    # 5.68 s.  Plan: 2 Window nodes + 1 extra in-partition Sort instead
    # of 3 Windows, two of them quadratic (guide §7.2).
    wf_rev = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("t_us"), F.desc("is_grid"), F.desc("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = (
        both.withColumn("pv", F.last("value", ignorenulls=True).over(wb))
        .withColumn("pt", F.last("ev_t", ignorenulls=True).over(wb))
        .withColumn("nv", F.last("value", ignorenulls=True).over(wf_rev))
        .withColumn("nt", F.last("ev_t", ignorenulls=True).over(wf_rev))
        .filter(F.col("is_grid") == 1)
    )
    frac = (F.col("t_us") - F.col("pt")).cast("double") / (
        F.col("nt") - F.col("pt")
    ).cast("double")
    interp = (
        F.when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .when(F.col("nt") == F.col("pt"), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return g.select(
        "user_id",
        F.col("ts").alias("hour_ts"),
        (F.round(interp, 6) + F.lit(0.0)).alias("value_interp"),
    )


EVENTS_RESAMPLE_LINEAR_SQL = """
WITH pts AS (
  SELECT user_id, ts, value, 0 AS is_grid, event_id AS tb FROM events),
bounds AS (
  SELECT user_id, date_trunc('hour', MIN(ts)) AS lo, MAX(ts) AS hi
  FROM events GROUP BY user_id),
spine AS (
  SELECT user_id,
         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS ts,
         CAST(NULL AS DOUBLE) AS value, 1 AS is_grid,
         CAST(0 AS BIGINT) AS tb
  FROM bounds),
both_s AS (
  SELECT *, epoch_us(ts) AS t_us FROM
    (SELECT * FROM pts UNION ALL SELECT * FROM spine)),
g AS (
  SELECT *,
    last_value(value IGNORE NULLS) OVER wb AS pv,
    last_value(CASE WHEN value IS NOT NULL THEN t_us END IGNORE NULLS)
      OVER wb AS pt,
    first_value(value IGNORE NULLS) OVER wf AS nv,
    first_value(CASE WHEN value IS NOT NULL THEN t_us END IGNORE NULLS)
      OVER wf AS nt
  FROM both_s
  WINDOW
    wb AS (PARTITION BY user_id ORDER BY t_us, is_grid, tb
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wf AS (PARTITION BY user_id ORDER BY t_us, is_grid, tb
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT user_id, ts AS hour_ts,
       round(CASE WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  WHEN nt = pt THEN pv
                  ELSE pv + (nv - pv) *
                       (CAST(t_us - pt AS DOUBLE) /
                        CAST(nt - pt AS DOUBLE))
             END, 6) + 0.0 AS value_interp
FROM g WHERE is_grid = 1
"""


def ab_conversion_z(
    spark: SparkSession,
    sf_dir: str,
    *,
    expose_type: str = "view",
    convert_type: str = "purchase",
) -> DataFrame:
    """Two-proportion A/B test over the event log: users split into
    variants by id parity (the deterministic stand-in for an assignment
    column), conversion = user emitted ``convert_type`` after being
    exposed to ``expose_type``; one row per variant pair —
    (n_a, n_b, conv_a, conv_b, rate_a, rate_b, z_score, significant).

    The pooled two-proportion z uses only +,-,*,/ and sqrt — all
    IEEE-correctly-rounded primitives, so the statistic is engine-exact
    (no erf/p-value: erf is NOT identically rounded across libms; the
    1.96 two-sided 5% threshold is reported as the boolean instead).
    Per-user flags are one conditional aggregate; nothing scales past
    the user dimension.
    """
    ev = load_events(spark, sf_dir)
    peru = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == expose_type, 1).otherwise(0)
        ).alias("exposed"),
        F.max(
            F.when(F.col("event_type") == convert_type, 1).otherwise(0)
        ).alias("converted"),
    )
    flags = peru.filter(F.col("exposed") == 1).select(
        (F.col("user_id") % 2 == 0).alias("variant_a"),
        F.col("converted"),
    )
    agg = flags.agg(
        F.sum(F.when(F.col("variant_a"), 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(~F.col("variant_a"), 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("variant_a"), F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(~F.col("variant_a"), F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    pa = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pool
        * (F.lit(1.0) - pool)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    z = F.when(se > 0, (pa - pb) / se).otherwise(F.lit(0.0))
    return agg.filter((F.col("n_a") > 0) & (F.col("n_b") > 0)).select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > 1.96).alias("significant"),
    )


def ab_conversion_z_sql(
    *, expose_type: str = "view", convert_type: str = "purchase"
) -> str:
    """DuckDB twin of :func:`ab_conversion_z`."""
    return f"""
WITH peru AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = '{expose_type}' THEN 1 ELSE 0 END)
           AS exposed,
         MAX(CASE WHEN event_type = '{convert_type}' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY user_id),
flags AS (
  SELECT (user_id % 2 = 0) AS variant_a, converted
  FROM peru WHERE exposed = 1),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN variant_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN NOT variant_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN variant_a THEN converted ELSE 0 END) AS BIGINT)
      AS conv_a,
    CAST(SUM(CASE WHEN NOT variant_a THEN converted ELSE 0 END) AS BIGINT)
      AS conv_b
  FROM flags),
c AS (
  SELECT *,
    CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
    CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
    CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pool
  FROM agg WHERE n_a > 0 AND n_b > 0),
zc AS (
  SELECT *,
    sqrt(pool * (1.0 - pool)
         * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS se
  FROM c)
SELECT n_a, n_b, conv_a, conv_b,
       round(pa, 6) AS rate_a, round(pb, 6) AS rate_b,
       round(CASE WHEN se > 0 THEN (pa - pb) / se ELSE 0.0 END, 6)
         AS z_score,
       abs(CASE WHEN se > 0 THEN (pa - pb) / se ELSE 0.0 END) > 1.96
         AS significant
FROM zc
"""


def user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation of the event log: per user Recency (seconds
    since last event, vs the corpus max timestamp), Frequency (events)
    and Monetary (decimal-exact value sum), each scored 1-3 against
    TERCILE thresholds — (user_id, recency_secs, frequency, monetary,
    r_score, f_score, m_score, segment).

    The 100 TB detail is how the terciles are cut: a global ntile()
    would be a single-reducer window over every user, so thresholds
    come instead from an exact percentile over the deterministic
    content-hash USER sample (the curriculum_bins discipline) and ride
    a broadcast 1-row table; scoring is a pure comparison projection.
    Scores use > threshold (strictly-greater buckets), segment is the
    concatenated digit string ("321" = best recency, mid frequency,
    worst monetary).
    """
    from inception_spark.functions.hashing import h28

    ev = load_events(spark, sf_dir)
    usec = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    per_user = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("mon_dec"),
    )
    maxts = ev.agg(F.max("ts").alias("corpus_max"))
    # integer `div`, not float /-then-cast: Spark's double->long cast
    # TRUNCATES while DuckDB's rounds — div/// agree for non-negatives
    base = (
        per_user.crossJoin(F.broadcast(maxts))
        .withColumn(
            "_dus", usec(F.col("corpus_max")) - usec(F.col("last_ts"))
        )
        .select(
            "user_id",
            F.expr("_dus div 1000000").cast("long").alias("recency_secs"),
            "frequency",
            F.col("mon_dec").cast("double").alias("monetary"),
        )
    )
    # tercile thresholds from the content-hash user sample (exact
    # percentile over the sample — deterministic, broadcastable)
    samp = base.filter(
        h28(F.concat(F.lit("rfm\x1f"), F.col("user_id").cast("string")))
        < F.lit(int(0.5 * (1 << 28)))
    )
    th = samp.agg(
        *[
            F.round(F.expr(f"percentile({c}, {p})"), 6).alias(
                f"{c}_p{int(p * 100)}"
            )
            for c in ("recency_secs", "frequency", "monetary")
            for p in (1 / 3, 2 / 3)
        ]
    )

    def score(c, invert):
        lo, hi = F.col(f"{c}_p33"), F.col(f"{c}_p66")
        raw = (
            F.when(F.col(c) > hi, 3)
            .when(F.col(c) > lo, 2)
            .otherwise(1)
        )
        return (4 - raw) if invert else raw

    out = base.crossJoin(F.broadcast(th))
    r_s = score("recency_secs", invert=True)  # recent = low secs = best
    f_s = score("frequency", invert=False)
    m_s = score("monetary", invert=False)
    return out.select(
        "user_id",
        "recency_secs",
        "frequency",
        F.round(F.col("monetary"), 2).alias("monetary"),
        r_s.cast("long").alias("r_score"),
        f_s.cast("long").alias("f_score"),
        m_s.cast("long").alias("m_score"),
        F.concat(
            r_s.cast("string"), f_s.cast("string"), m_s.cast("string")
        ).alias("segment"),
    )


def user_rfm_segments_sql() -> str:
    """DuckDB twin of :func:`user_rfm_segments`."""
    from inception_spark.functions.hashing import h28_sql

    h = h28_sql("'rfm' || chr(31) || CAST(user_id AS VARCHAR)")
    thresh = int(0.5 * (1 << 28))
    qcols = ", ".join(
        f"round(quantile_cont(CAST({c} AS DOUBLE), "
        f"CAST({p!r} AS DOUBLE)), 6) AS {c}_p{int(p * 100)}"
        for c in ("recency_secs", "frequency", "monetary")
        for p in (1 / 3, 2 / 3)
    )
    return f"""
WITH per_user AS (
  SELECT user_id, MAX(ts) AS last_ts, CAST(COUNT(*) AS BIGINT) AS frequency,
         SUM(CAST(value AS DECIMAL(18,2))) AS mon_dec
  FROM events GROUP BY user_id),
mx AS (SELECT MAX(ts) AS corpus_max FROM events),
base AS (
  SELECT user_id,
         CAST((epoch_us(corpus_max) - epoch_us(last_ts)) // 1000000
              AS BIGINT) AS recency_secs,
         frequency, CAST(mon_dec AS DOUBLE) AS monetary
  FROM per_user CROSS JOIN mx),
th AS (SELECT {qcols} FROM base WHERE {h} < {thresh}),
scored AS (
  SELECT b.*,
    (4 - CASE WHEN b.recency_secs > t.recency_secs_p66 THEN 3
              WHEN b.recency_secs > t.recency_secs_p33 THEN 2
              ELSE 1 END) AS r_score,
    CASE WHEN b.frequency > t.frequency_p66 THEN 3
         WHEN b.frequency > t.frequency_p33 THEN 2 ELSE 1 END AS f_score,
    CASE WHEN b.monetary > t.monetary_p66 THEN 3
         WHEN b.monetary > t.monetary_p33 THEN 2 ELSE 1 END AS m_score
  FROM base b CROSS JOIN th t)
SELECT user_id, recency_secs, frequency, round(monetary, 2) AS monetary,
       CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS segment
FROM scored
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral Markov chain: P(next event type | current)
    from per-user event sequences — (from_type, to_type, n, p).

    One lag window per user (ts + event_id tiebreak) and one count
    aggregate; probabilities are exact integer ratios rounded at 6 dp,
    so the matrix hash-matches across engines.  The per-user window is
    the only ordered pass — no global sequence anywhere.
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return (
        pairs.join(totals, "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(
                F.col("n").cast("double") / F.col("row_n").cast("double"), 6
            ).alias("p"),
        )
    )


EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events),
pairs AS (
  SELECT event_type AS from_type, next_type AS to_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2),
tot AS (SELECT from_type, SUM(n) AS row_n FROM pairs GROUP BY 1)
SELECT p.from_type, p.to_type, p.n,
       round(CAST(p.n AS DOUBLE) / CAST(t.row_n AS DOUBLE), 6) AS p
FROM pairs p JOIN tot t USING (from_type)
"""


def monthly_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-same-month-last-year revenue growth: (month_ts,
    revenue, prev_year_revenue, yoy_pct) — the reporting staple, as a
    12-row-lag month-key self-join over the (tiny) monthly rollup, with
    decimal-exact revenue sums and a NULL yoy for months without a
    prior-year twin.  Growth is an exact-ratio double rounded at 4 dp;
    everything after the one fact-table aggregate is month-cardinality
    work."""
    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month_ts")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec")
    )
    cur = monthly.select(
        "month_ts", F.col("rev_dec").alias("cur_dec")
    )
    prv = monthly.select(
        F.add_months(F.col("month_ts"), 12).alias("month_ts"),
        F.col("rev_dec").alias("prev_dec"),
    )
    out = cur.join(prv, "month_ts", "left")
    return out.select(
        "month_ts",
        F.col("cur_dec").cast("double").alias("revenue"),
        F.col("prev_dec").cast("double").alias("prev_year_revenue"),
        F.round(
            (F.col("cur_dec").cast("double") - F.col("prev_dec").cast("double"))
            / F.col("prev_dec").cast("double")
            * 100.0,
            4,
        ).alias("yoy_pct"),
    )


MONTHLY_YOY_SQL = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month_ts,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
  FROM orders GROUP BY 1)
SELECT c.month_ts,
       CAST(c.rev_dec AS DOUBLE) AS revenue,
       CAST(p.rev_dec AS DOUBLE) AS prev_year_revenue,
       round((CAST(c.rev_dec AS DOUBLE) - CAST(p.rev_dec AS DOUBLE))
             / CAST(p.rev_dec AS DOUBLE) * 100.0, 4) AS yoy_pct
FROM monthly c
LEFT JOIN monthly p ON p.month_ts + INTERVAL 12 MONTH = c.month_ts
"""


def basket_rules(
    spark: SparkSession,
    sf_dir: str,
    *,
    min_pair_orders: int = 2,
    k: int = 50,
) -> DataFrame:
    """Market-basket association rules over order line items:
    (antecedent, consequent, n_both, support, confidence, lift) — the
    classic bought-together miner (Agrawal/Srikant's support-confidence
    framework), kept to pairwise rules so everything is exact ratios.

    support = P(a,b), confidence = P(b|a), lift = P(a,b)/(P(a)P(b)) —
    all integer-count ratios in identical double arithmetic, 6-dp
    rounded, so the top-k by lift is engine-exact (ties break on the
    rule).  Shape: per-order item pairs (bounded per-group quadratic —
    baskets are small), one count aggregate, a broadcast item-frequency
    join; ``min_pair_orders`` is the standard min-support prune that
    keeps the rule table from memorizing noise.  Both rule directions
    emit (confidence is asymmetric).
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    n_orders = li.select("l_orderkey").distinct().count()
    item_n = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_item")
    )
    a, b = li.alias("a"), li.alias("b")
    pair_n = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("antecedent"),
            F.col("b.l_partkey").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .filter(F.col("n_both") >= min_pair_orders)
    )
    na = item_n.select(
        F.col("l_partkey").alias("antecedent"), F.col("n_item").alias("n_a")
    )
    nb = item_n.select(
        F.col("l_partkey").alias("consequent"), F.col("n_item").alias("n_b")
    )
    no = float(n_orders)
    scored = (
        pair_n.join(F.broadcast(na), "antecedent")
        .join(F.broadcast(nb), "consequent")
        .select(
            "antecedent",
            "consequent",
            "n_both",
            F.round(F.col("n_both").cast("double") / F.lit(no), 6).alias(
                "support"
            ),
            F.round(
                F.col("n_both").cast("double") / F.col("n_a").cast("double"),
                6,
            ).alias("confidence"),
            F.round(
                F.col("n_both").cast("double")
                * F.lit(no)
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )
    # the global top-k can contain at most k rules from any one
    # antecedent, so a per-antecedent top-k (distributed window, same
    # ordering) is a result-invariant pre-prune: the final global
    # row_number sees <= k rows per antecedent instead of the whole
    # item-pair-cardinality rule table on one reducer
    wa = Window.partitionBy("antecedent").orderBy(
        F.desc("lift"), F.asc("consequent")
    )
    pruned = (
        scored.withColumn("_r", F.row_number().over(wa))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )
    w = Window.orderBy(
        F.desc("lift"), F.asc("antecedent"), F.asc("consequent")
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "antecedent", "consequent", "n_both", "support",
            "confidence", "lift", F.col("rank").cast("long").alias("rank"),
        )
    )


def basket_rules_sql(*, min_pair_orders: int = 2, k: int = 50) -> str:
    """DuckDB twin of :func:`basket_rules`."""
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
no AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n FROM li),
item_n AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item
  FROM li GROUP BY 1),
pair_n AS (
  SELECT a.l_partkey AS antecedent, b.l_partkey AS consequent,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_pair_orders}),
scored AS (
  SELECT p.antecedent, p.consequent, p.n_both,
    round(CAST(p.n_both AS DOUBLE) / no.n, 6) AS support,
    round(CAST(p.n_both AS DOUBLE) / CAST(na.n_item AS DOUBLE), 6)
      AS confidence,
    round(CAST(p.n_both AS DOUBLE) * no.n
          / (CAST(na.n_item AS DOUBLE) * CAST(nb.n_item AS DOUBLE)), 6)
      AS lift
  FROM pair_n p
  JOIN item_n na ON na.l_partkey = p.antecedent
  JOIN item_n nb ON nb.l_partkey = p.consequent
  CROSS JOIN no)
SELECT antecedent, consequent, n_both, support, confidence, lift,
       CAST(row_number() OVER (ORDER BY lift DESC, antecedent, consequent)
            AS BIGINT) AS rank
FROM scored QUALIFY rank <= {k}
"""


def item_item_cosine_recs(
    spark: SparkSession,
    sf_dir: str,
    *,
    min_cooc: int = 2,
    k: int = 5,
    max_basket: int = 100,
) -> DataFrame:
    """Item-item collaborative filtering over order baskets: for every
    part, the ``k`` most-similar parts by cosine over the binary
    basket-incidence vectors — sim(i,j) = cooc(i,j)/√(nᵢ·nⱼ), the
    classic neighborhood recommender (Sarwar et al. 2001's item-item
    scheme; Amazon's "customers who bought").  Complements
    :func:`basket_rules`: cosine is symmetric and norm-corrected where
    confidence/lift are directional ratio tests.

    Determinism: cooc/nᵢ/nⱼ are exact integer counts; the score is one
    int multiply, one sqrt, one divide — each correctly rounded in
    IEEE-754, so Spark and DuckDB compute the *identical* double and
    the per-item rank (score desc, rec asc on the unrounded double) is
    engine-exact.  Displayed cosine is 6-dp half-away rounded.

    100 TB shape: pair generation is per-basket bounded quadratic —
    baskets larger than ``max_basket`` items are EXCLUDED outright
    (deterministic, mirrored in the oracle), the standard
    heavy-basket guard that keeps the worst basket at
    C(max_basket, 2) pairs instead of a quadratic blowup on a
    pathological order; item norms count kept baskets only, so the
    cosine stays a true cosine over the mined incidence matrix.  One
    shuffle to baskets, one to (i, j) counts, broadcast norm joins,
    per-item window on the pruned pair table (never a global sort)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    sized = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_bsize")
    ).filter(F.col("_bsize") <= max_basket)
    kept = li.join(sized.select("l_orderkey"), "l_orderkey")
    # NOT checkpointed: the static plan re-plans kept per reference
    # (32 lineitem scans) but the duplicate exchanges reuse at
    # runtime, and a kept-table localCheckpoint measured flat-to-worse
    # in a same-session A/B at sf0.1 while materializing a data-scale
    # table (guide §1: measure first; §5: cache only what recomputing
    # costs more than the memory pressure).
    item_n = kept.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_item")
    )
    a, b = kept.alias("a"), kept.alias("b")
    # count each unordered pair once (i < j), mirror after scoring
    pair_n = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("i"),
            F.col("b.l_partkey").alias("j"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cooc"))
        .filter(F.col("cooc") >= min_cooc)
    )
    ni = item_n.select(F.col("l_partkey").alias("i"),
                       F.col("n_item").alias("n_i"))
    nj = item_n.select(F.col("l_partkey").alias("j"),
                       F.col("n_item").alias("n_j"))
    scored = (
        pair_n.join(F.broadcast(ni), "i")
        .join(F.broadcast(nj), "j")
        .select(
            "i", "j", "cooc",
            (
                F.col("cooc").cast("double")
                / F.sqrt((F.col("n_i") * F.col("n_j")).cast("double"))
            ).alias("_s"),
        )
    )
    # Mirror each scored pair into both directions off ONE evaluation of
    # ``scored``: the former union-of-two-projections re-executed the
    # whole pair-count subtree per branch (guide §7.2 duplicated
    # subtrees); the exploded rows are field-for-field identical.
    both = scored.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("i").alias("item"), F.col("j").alias("rec"),
                    F.col("cooc").alias("cooc"), F.col("_s").alias("_s"),
                ),
                F.struct(
                    F.col("j").alias("item"), F.col("i").alias("rec"),
                    F.col("cooc").alias("cooc"), F.col("_s").alias("_s"),
                ),
            )
        ).alias("p")
    ).select("p.*")
    w = Window.partitionBy("item").orderBy(F.desc("_s"), F.asc("rec"))
    return (
        both.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "item", "rec", "cooc",
            F.round("_s", 6).alias("cosine"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def item_item_cosine_recs_sql(
    *, min_cooc: int = 2, k: int = 5, max_basket: int = 100
) -> str:
    """DuckDB twin of :func:`item_item_cosine_recs` — identical integer
    counts, identical IEEE double score, identical window order."""
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
kept AS (
  SELECT l_orderkey, l_partkey FROM li
  QUALIFY COUNT(*) OVER (PARTITION BY l_orderkey) <= {max_basket}),
item_n AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item
  FROM kept GROUP BY 1),
pair_n AS (
  SELECT a.l_partkey AS i, b.l_partkey AS j,
         CAST(COUNT(*) AS BIGINT) AS cooc
  FROM kept a JOIN kept b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_cooc}),
scored AS (
  SELECT p.i, p.j, p.cooc,
         CAST(p.cooc AS DOUBLE)
           / sqrt(CAST(ni.n_item * nj.n_item AS DOUBLE)) AS s
  FROM pair_n p
  JOIN item_n ni ON ni.l_partkey = p.i
  JOIN item_n nj ON nj.l_partkey = p.j),
both_dir AS (
  SELECT i AS item, j AS rec, cooc, s FROM scored
  UNION ALL
  SELECT j AS item, i AS rec, cooc, s FROM scored)
SELECT item, rec, cooc, round(s, 6) AS cosine,
       CAST(row_number() OVER (PARTITION BY item ORDER BY s DESC, rec)
            AS BIGINT) AS rank
FROM both_dir QUALIFY rank <= {k}
"""


def events_seasonal_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the hourly event-rate
    series, per event type: (event_type, hour_ts, n_events, trend_milli,
    seasonal_milli, residual_milli).

    Trend = centered 25-hour moving average (ROWS 12 PRECEDING..12
    FOLLOWING over the hourly rollup — the window shrinks at series
    edges, both engines identically); seasonal = per-(type, hour-of-day)
    mean of the detrended series; residual = detrended − seasonal.
    Every statistic is INTEGER milli-units end to end: trend_milli =
    (1000·Σn) div cnt on non-negative ints, and the seasonal mean
    divides a possibly-negative integer sum with `div`/`//` — both
    engines truncate toward zero, so the quotients agree (floor-vs-trunc
    only diverges between Python and SQL, not between Spark and DuckDB).

    100 TB shape: the raw scan is ONE hash aggregate to the hourly
    rollup (bounded by the time span × type cardinality, metadata-sized
    next to the events); the windows and the seasonal aggregate run on
    that rollup only.
    """
    ev = load_events(spark, sf_dir)
    hourly = seasonal_hourly_partials(ev)
    # grouped globally above → unique per (type, hour); batch fast path
    return seasonal_decomp_finalize(hourly, assume_merged=True)


def seasonal_hourly_partials(batch: DataFrame) -> DataFrame:
    """Mergeable decomposition state: exact (event_type, hour_ts) →
    count rows for one batch — the same hourly-rollup-is-the-state
    pattern as :func:`acf_hourly_partials` (per-row hour truncation is
    batch-local, counts re-sum under any micro-batching)."""
    return batch.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count(F.lit(1)).alias("n_events"))


def seasonal_decomp_finalize(
    parts: DataFrame, *, assume_merged: bool = False
) -> DataFrame:
    """Trend/seasonal/residual split from (possibly un-merged) hourly
    counter rows — all windows run on the rollup, so the live twin's
    finalize cost is spine-sized regardless of stream length.  The
    centered ±12 h trend window is WHY the decomposition has no
    row-emitting streaming form: an hour's trend needs 12 FUTURE
    hours, so any live emission would be provisional for 12 h; the
    exact live form maintains the counter state and decomposes at
    read time (this function).  ``assume_merged=True`` = batch path."""
    hourly = parts if assume_merged else (
        parts.groupBy("event_type", "hour_ts").agg(
            F.sum("n_events").alias("n_events")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(-12, 12)
    )
    detr = (
        hourly.withColumn("_wsum", F.sum("n_events").over(w))
        .withColumn("_wcnt", F.count(F.lit(1)).over(w))
        .withColumn(
            "trend_milli", F.expr("(1000 * _wsum) div _wcnt").cast("long")
        )
        .withColumn(
            "detr_milli", (F.lit(1000) * F.col("n_events")) - F.col("trend_milli")
        )
    )
    seas = detr.groupBy(
        "event_type", F.hour("hour_ts").alias("hod")
    ).agg(
        F.expr("sum(detr_milli) div count(1)").cast("long").alias(
            "seasonal_milli"
        )
    )
    return (
        detr.withColumn("hod", F.hour("hour_ts"))
        .join(F.broadcast(seas), ["event_type", "hod"])
        .select(
            "event_type",
            "hour_ts",
            F.col("n_events").cast("long").alias("n_events"),
            "trend_milli",
            "seasonal_milli",
            (F.col("detr_milli") - F.col("seasonal_milli"))
            .cast("long")
            .alias("residual_milli"),
        )
    )


EVENTS_SEASONAL_DECOMP_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2),
tr AS (
  SELECT *,
         (1000 * SUM(n_events) OVER w) // (COUNT(*) OVER w) AS trend_milli
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
d AS (
  SELECT *, 1000 * n_events - trend_milli AS detr_milli FROM tr),
seas AS (
  SELECT event_type, extract(hour FROM hour_ts) AS hod,
         SUM(detr_milli) // COUNT(*) AS seasonal_milli
  FROM d GROUP BY 1, 2)
SELECT d.event_type, d.hour_ts, CAST(d.n_events AS BIGINT) AS n_events,
       CAST(d.trend_milli AS BIGINT) AS trend_milli,
       CAST(s.seasonal_milli AS BIGINT) AS seasonal_milli,
       CAST(d.detr_milli - s.seasonal_milli AS BIGINT) AS residual_milli
FROM d JOIN seas s
  ON d.event_type = s.event_type AND extract(hour FROM d.hour_ts) = s.hod
"""


def decayed_heavy_hitters(
    spark: SparkSession,
    sf_dir: str,
    *,
    k: int = 10,
    halflife_days: int = 1,
) -> DataFrame:
    """Exponentially time-decayed heavy hitters: the top-``k`` users per
    event type by RECENCY-WEIGHTED activity — (event_type, user_id,
    decayed_micro, n_events, rank).

    Each event contributes ``2^(−age_days/halflife)`` of a count; with
    day-granular ages that weight is an EXACT integer number of
    micro-counts, ``1000000 >> (age_days div halflife)`` — a bit shift,
    so the per-user score is an exact BIGINT sum (order-independent, no
    float decay in sight) and the ranking needs no rounding discipline.
    Ages beyond 19 halflives clamp to weight 0 explicitly: 1000000 <
    2^20 so the shift result IS 0 there, but JVM int shifts mask the
    shift count to 5 bits (age 32 would wrap to full weight) — the
    clamp keeps the expression out of that regime in both engines.

    100 TB shape: one hash aggregate keyed (event_type, user_id) with
    map-side partial combine (sums of ints), then a per-type top-k
    window over the aggregate.  The anchor `today` is max(ts) — one
    scalar subquery / broadcast scalar, not a driver constant.
    """
    ev = load_events(spark, sf_dir)
    anchor = ev.agg(F.max(F.to_date("ts")).alias("_today"))
    scored = (
        ev.select("event_type", "user_id", F.to_date("ts").alias("_d"))
        .join(F.broadcast(anchor))
        .withColumn(
            "_age",
            F.expr(f"datediff(_today, _d) div {halflife_days}"),
        )
        .withColumn(
            "_w",
            F.when(F.col("_age") > 19, F.lit(0)).otherwise(
                F.expr("shiftright(1000000, cast(_age as int))")
            ),
        )
        .groupBy("event_type", "user_id")
        .agg(
            F.sum("_w").cast("long").alias("decayed_micro"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )
    rk = Window.partitionBy("event_type").orderBy(
        F.col("decayed_micro").desc(), F.col("user_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(rk).cast("long"))
        .filter(F.col("rank") <= k)
        .select("event_type", "user_id", "decayed_micro", "n_events", "rank")
    )


def decayed_daily_counts(ev: DataFrame) -> DataFrame:
    """Mergeable partial for :func:`decayed_heavy_hitters`: per
    (event_type, user_id, day) event counts.  Counts re-sum exactly
    under ANY regrouping of rows into batches, and the decay weight is
    a pure function of (day, global max day), so applying weights AFTER
    the merge reproduces the batch answer bit-for-bit — the
    run_stream_batch_partials contract.  State is the activity rollup
    (users × active days), not an event stream."""
    return ev.groupBy(
        "event_type", "user_id", F.to_date("ts").alias("_d")
    ).agg(F.count(F.lit(1)).alias("n"))


def decayed_topk_from_daily(
    daily: DataFrame, *, k: int = 10, halflife_days: int = 1
) -> DataFrame:
    """Finalize :func:`decayed_daily_counts` partials (possibly from
    several batches — re-summed here) into the decayed top-k; identical
    output contract and oracle as :func:`decayed_heavy_hitters`."""
    merged = daily.groupBy("event_type", "user_id", "_d").agg(
        F.sum("n").alias("n")
    )
    anchor = merged.agg(F.max("_d").alias("_today"))
    scored = (
        merged.join(F.broadcast(anchor))
        .withColumn(
            "_age", F.expr(f"datediff(_today, _d) div {halflife_days}")
        )
        .withColumn(
            "_w",
            F.when(F.col("_age") > 19, F.lit(0)).otherwise(
                F.expr("shiftright(1000000, cast(_age as int))")
            ),
        )
        .groupBy("event_type", "user_id")
        .agg(
            F.sum(F.col("_w") * F.col("n")).cast("long").alias(
                "decayed_micro"
            ),
            F.sum("n").cast("long").alias("n_events"),
        )
    )
    rk = Window.partitionBy("event_type").orderBy(
        F.col("decayed_micro").desc(), F.col("user_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(rk).cast("long"))
        .filter(F.col("rank") <= k)
        .select("event_type", "user_id", "decayed_micro", "n_events", "rank")
    )


def decayed_heavy_hitters_sql(*, k: int = 10, halflife_days: int = 1) -> str:
    """DuckDB twin of :func:`decayed_heavy_hitters`."""
    return f"""
WITH anchor AS (SELECT max(CAST(ts AS DATE)) AS today FROM events),
scored AS (
  SELECT event_type, user_id,
         SUM(CASE WHEN datediff('day', CAST(ts AS DATE), today)
                       // {halflife_days} > 19 THEN 0
                  ELSE 1000000 >> (datediff('day', CAST(ts AS DATE), today)
                                   // {halflife_days}) END) AS decayed_micro,
         COUNT(*) AS n_events
  FROM events, anchor GROUP BY 1, 2),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY decayed_micro DESC, user_id) AS rank
  FROM scored)
SELECT event_type, user_id, CAST(decayed_micro AS BIGINT) AS decayed_micro,
       CAST(n_events AS BIGINT) AS n_events, CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= {k}
"""


def events_burst_windows(
    spark: SparkSession,
    sf_dir: str,
    *,
    ratio_num: int = 3,
    ratio_den: int = 2,
    min_events: int = 3,
) -> DataFrame:
    """Burst detection with interval output: maximal runs of consecutive
    hours where a type's event rate is ≥ ``ratio_num/ratio_den``× its
    trailing-24h baseline — (event_type, burst_start, burst_end,
    n_hours, peak_events, total_events).  Where events_anomaly/CUSUM
    flag points, this emits the INTERVALS an alerting pipeline pages
    on.  The threshold is a RATIONAL compared by cross-multiplication
    (``den·1000·n ≥ num·base_milli``) — hourly rates concentrate as
    volume grows (sf0.1's worst hour is only 1.8× baseline), so an
    integer-only ×3 test would never fire at scale while 3/2 fires at
    every SF, and the cross-multiplied form keeps the arithmetic
    exact-integer.

    The baseline divides by the literal 24 — a RANGE frame over the
    integer hour index (``epoch div 3600``), so hours with zero events
    count as zero instead of being skipped the way a ROWS frame over
    the sparse rollup would; the first 24 hours of each series carry no
    verdict (partial baseline).  All arithmetic is exact-integer
    (milli-rate vs ratio·baseline cross-multiplied), islands are the
    hour_idx − row_number constancy trick — no sequential scan, no
    floats anywhere.

    100 TB shape: one hash aggregate to the hourly rollup, then windows
    and islands on the rollup only (time-span × type sized)."""
    return burst_windows_finalize(
        burst_hourly_partials(load_events(spark, sf_dir)),
        ratio_num=ratio_num, ratio_den=ratio_den, min_events=min_events,
    )


def burst_hourly_partials(ev: DataFrame) -> DataFrame:
    """Mergeable partial for :func:`events_burst_windows`: per
    (event_type, hour) counts — plain sums, exactly re-summable across
    any micro-batching, so the live burst monitor is the batch detector
    run on the merged rollup (the run_stream_batch_partials
    contract)."""
    return ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count(F.lit(1)).alias("n"))


def burst_windows_finalize(
    hourly_parts: DataFrame,
    *,
    ratio_num: int = 3,
    ratio_den: int = 2,
    min_events: int = 3,
) -> DataFrame:
    """Re-merge hourly partials and run the threshold + islands logic
    (everything here is rollup-sized)."""
    hourly = (
        hourly_parts.groupBy("event_type", "hour_ts")
        .agg(F.sum("n").alias("n"))
        .withColumn(
            "hour_idx", F.expr("unix_timestamp(hour_ts) div 3600")
        )
    )
    base_w = (
        Window.partitionBy("event_type")
        .orderBy("hour_idx")
        .rangeBetween(-24, -1)
    )
    first_w = Window.partitionBy("event_type")
    flagged = (
        hourly.withColumn("_bsum", F.sum("n").over(base_w))
        .withColumn("_first", F.min("hour_idx").over(first_w))
        .withColumn(
            "base_milli", F.expr("(1000 * coalesce(_bsum, 0)) div 24")
        )
        .filter(
            (F.col("hour_idx") >= F.col("_first") + 24)
            & (F.col("n") >= min_events)
            & (
                F.lit(ratio_den * 1000) * F.col("n")
                >= ratio_num * F.col("base_milli")
            )
        )
    )
    isl = flagged.withColumn(
        "_grp",
        F.col("hour_idx")
        - F.row_number().over(
            Window.partitionBy("event_type").orderBy("hour_idx")
        ),
    )
    return (
        isl.groupBy("event_type", "_grp")
        .agg(
            F.min("hour_ts").alias("burst_start"),
            F.max("hour_ts").alias("burst_end"),
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.max("n").cast("long").alias("peak_events"),
            F.sum("n").cast("long").alias("total_events"),
        )
        .select(
            "event_type", "burst_start", "burst_end",
            "n_hours", "peak_events", "total_events",
        )
    )


def events_burst_windows_sql(
    *, ratio_num: int = 3, ratio_den: int = 2, min_events: int = 3
) -> str:
    """DuckDB twin of :func:`events_burst_windows`."""
    return f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts, COUNT(*) AS n,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hour_idx
  FROM events GROUP BY 1, 2),
flagged AS (
  SELECT * FROM (
    SELECT *,
           (1000 * COALESCE(SUM(n) OVER (
               PARTITION BY event_type ORDER BY hour_idx
               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING), 0)) // 24
             AS base_milli,
           MIN(hour_idx) OVER (PARTITION BY event_type) AS _first
    FROM hourly)
  WHERE hour_idx >= _first + 24 AND n >= {min_events}
    AND {ratio_den} * 1000 * n >= {ratio_num} * base_milli),
isl AS (
  SELECT *, hour_idx - row_number() OVER (
      PARTITION BY event_type ORDER BY hour_idx) AS _grp
  FROM flagged)
SELECT event_type, MIN(hour_ts) AS burst_start, MAX(hour_ts) AS burst_end,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(MAX(n) AS BIGINT) AS peak_events,
       CAST(SUM(n) AS BIGINT) AS total_events
FROM isl GROUP BY event_type, _grp
"""


def growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily user growth accounting — the standard DAU decomposition:
    (day, n_active, n_new, n_retained, n_resurrected, n_churned) where
    new = first-ever day, retained = also active the previous day,
    resurrected = previously seen but not yesterday, and churned(d) =
    active on d−1 but not on d.  Identity: n_active = new + retained +
    resurrected, and tomorrow's retained + today's churned = today's
    active (both engines, exact ints).

    Plan: ONE distinct (user, day) rollup, per-user lag/lead windows on
    it, then two day-keyed hash aggregates (statuses from the row
    itself; churn credited to next_day = day+1 by the lead gap) merged
    on the day spine.  Everything after the rollup is activity-sized.
    Churn on the day after the global max day is unobservable and
    excluded."""
    return growth_from_activity(
        activity_rollup(load_events(spark, sf_dir))
    )


def activity_rollup(ev: DataFrame) -> DataFrame:
    """Mergeable partial for :func:`growth_accounting`: the distinct
    (user, day) activity set.  DISTINCT-of-union == union-of-DISTINCTs
    (idempotent), so partials from any micro-batching merge exactly."""
    return ev.select("user_id", F.to_date("ts").alias("day")).distinct()


def growth_from_activity(act_parts: DataFrame) -> DataFrame:
    """Re-merge activity partials and run the growth decomposition
    (see :func:`growth_accounting`)."""
    act = act_parts.distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    lab = (
        act.withColumn("_prev", F.lag("day").over(w))
        .withColumn("_next", F.lead("day").over(w))
        .withColumn(
            "status",
            F.when(F.col("_prev").isNull(), F.lit("new"))
            .when(
                F.col("_prev") == F.date_sub(F.col("day"), 1),
                F.lit("retained"),
            )
            .otherwise(F.lit("resurrected")),
        )
    )
    per_day = lab.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.sum((F.col("status") == "new").cast("int"))
        .cast("long")
        .alias("n_new"),
        F.sum((F.col("status") == "retained").cast("int"))
        .cast("long")
        .alias("n_retained"),
        F.sum((F.col("status") == "resurrected").cast("int"))
        .cast("long")
        .alias("n_resurrected"),
    )
    max_day = act.agg(F.max("day").alias("_maxd"))
    churn = (
        lab.filter(
            F.col("_next").isNull()
            | (F.col("_next") > F.date_add(F.col("day"), 1))
        )
        .select(F.date_add(F.col("day"), 1).alias("day"))
        .join(F.broadcast(max_day))
        .filter(F.col("day") <= F.col("_maxd"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    return (
        per_day.join(churn, "day", "full")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_active", F.lit(0)).cast("long").alias("n_active"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            F.coalesce("n_retained", F.lit(0))
            .cast("long")
            .alias("n_retained"),
            F.coalesce("n_resurrected", F.lit(0))
            .cast("long")
            .alias("n_resurrected"),
            F.coalesce("n_churned", F.lit(0))
            .cast("long")
            .alias("n_churned"),
        )
    )


GROWTH_ACCOUNTING_SQL = """
WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
lab AS (
  SELECT *,
         lag(day) OVER (PARTITION BY user_id ORDER BY day) AS _prev,
         lead(day) OVER (PARTITION BY user_id ORDER BY day) AS _next
  FROM act),
per_day AS (
  SELECT day, COUNT(*) AS n_active,
         COUNT(*) FILTER (_prev IS NULL) AS n_new,
         COUNT(*) FILTER (_prev = day - 1) AS n_retained,
         COUNT(*) FILTER (_prev IS NOT NULL AND _prev < day - 1)
           AS n_resurrected
  FROM lab GROUP BY day),
churn AS (
  SELECT day + 1 AS day, COUNT(*) AS n_churned
  FROM lab
  WHERE (_next IS NULL OR _next > day + 1)
    AND day + 1 <= (SELECT max(day) FROM act)
  GROUP BY day + 1)
SELECT strftime(COALESCE(p.day, c.day), '%Y-%m-%d') AS day,
       CAST(COALESCE(n_active, 0) AS BIGINT) AS n_active,
       CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
       CAST(COALESCE(n_retained, 0) AS BIGINT) AS n_retained,
       CAST(COALESCE(n_resurrected, 0) AS BIGINT) AS n_resurrected,
       CAST(COALESCE(n_churned, 0) AS BIGINT) AS n_churned
FROM per_day p FULL OUTER JOIN churn c ON p.day = c.day
"""


def user_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival of user engagement: duration = HOURS (hour
    boundaries crossed, computed on date_trunc'd stamps so both engines
    agree on the semantics) from a user's first to last event,
    right-censored at the observation edge (users whose last activity
    falls on the global max day are still alive — day-granular censor,
    hour-granular clock: the synthetic users live for most of the
    window, so day durations collapse to 1–3 distinct values while
    hours give a real curve).  One row per observed churn duration t:
    (duration, n_at_risk, n_events, log_survival) with log_survival =
    Σ_{u≤t} ln(1 − d_u/n_u) — the KM product in log space.

    Determinism: each hazard term is ln((n−d)/n) rounded to 6 dp and
    summed as DECIMAL(28,6) through an ordered window (exact,
    order-independent); the result column is that exact decimal cast to
    double, never re-rounded, and no exp() is taken (the survival
    probability is e^x of an engine-identical x — callers exponentiate).
    If every at-risk user churns at some t (survival hits exactly 0),
    that row and the log from there on is NULL — ln(0) has no finite
    log-space form, and silently skipping the −∞ term would overstate
    survival.

    Plan: events → per-user (first, last) aggregate → duration rollup
    (one row per distinct duration) → one descending window for the
    at-risk counts + one ascending for the log-sum.  Everything past
    the first aggregate is duration-cardinality sized."""
    ev = load_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("_first"),
        F.max("ts").alias("_last"),
    )
    max_day = ev.agg(F.max(F.to_date("ts")).alias("_maxd"))
    dur = (
        per_user.join(F.broadcast(max_day))
        .select(
            F.expr(
                "(unix_timestamp(date_trunc('hour', _last))"
                " - unix_timestamp(date_trunc('hour', _first))) div 3600"
            ).alias("duration"),
            (F.to_date("_last") < F.col("_maxd"))
            .cast("int")
            .alias("_died"),
        )
        .groupBy("duration")
        .agg(
            F.count(F.lit(1)).alias("_n_total"),
            F.sum("_died").alias("n_events"),
        )
    )
    risk_w = (
        Window.orderBy(F.col("duration").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    log_w = (
        Window.orderBy("duration")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        dur.withColumn("n_at_risk", F.sum("_n_total").over(risk_w))
        .filter(F.col("n_events") > 0)
        .withColumn(
            "_term",
            F.when(
                F.col("n_events") < F.col("n_at_risk"),
                F.round(
                    F.log(
                        (F.col("n_at_risk") - F.col("n_events"))
                        .cast("double")
                        / F.col("n_at_risk")
                    ),
                    6,
                ).cast("decimal(28,6)"),
            ),
        )
        .withColumn(
            "_absorbed",
            F.max((F.col("n_events") == F.col("n_at_risk")).cast("int"))
            .over(log_w),
        )
        .select(
            F.col("duration").cast("long").alias("duration"),
            F.col("n_at_risk").cast("long").alias("n_at_risk"),
            F.col("n_events").cast("long").alias("n_events"),
            F.when(
                F.col("_absorbed") == 0,
                F.sum("_term").over(log_w).cast("double"),
            ).alias("log_survival"),
        )
    )


USER_SURVIVAL_CURVE_SQL = """
WITH per_user AS (
  SELECT user_id, min(ts) AS _first, max(ts) AS _last
  FROM events GROUP BY user_id),
dur AS (
  SELECT (CAST(epoch(date_trunc('hour', _last)) AS BIGINT)
          - CAST(epoch(date_trunc('hour', _first)) AS BIGINT)) // 3600
           AS duration,
         COUNT(*) AS _n_total,
         COUNT(*) FILTER (CAST(_last AS DATE)
                          < (SELECT max(CAST(ts AS DATE))
                             FROM events)) AS n_events
  FROM per_user GROUP BY 1),
risk AS (
  SELECT *, SUM(_n_total) OVER (ORDER BY duration DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS n_at_risk
  FROM dur),
terms AS (
  SELECT *,
         CASE WHEN n_events < n_at_risk THEN
           CAST(round(ln(CAST(n_at_risk - n_events AS DOUBLE)
                         / n_at_risk), 6) AS DECIMAL(28,6))
         END AS _term,
         MAX(CASE WHEN n_events = n_at_risk THEN 1 ELSE 0 END)
           OVER (ORDER BY duration
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS _absorbed
  FROM risk WHERE n_events > 0)
SELECT CAST(duration AS BIGINT) AS duration,
       CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(n_events AS BIGINT) AS n_events,
       CASE WHEN _absorbed = 0 THEN
         CAST(SUM(_term) OVER (ORDER BY duration
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE)
       END AS log_survival
FROM terms
"""


def ohlc_partials(ev: DataFrame) -> DataFrame:
    """Mergeable OHLC state per (event_type, hour): the open/close picks
    are struct-min/max of (ts, event_id, value) — associative,
    commutative, idempotent — and high/low/count/volume are plain
    max/min/sum, so partials from ANY regrouping of rows into batches
    re-merge to the whole-history candlesticks exactly (the
    run_stream_batch_partials contract)."""
    return (
        ev.withColumn("hour_ts", F.date_trunc("hour", F.col("ts")))
        .groupBy("event_type", "hour_ts")
        .agg(
            F.min(F.struct("ts", "event_id", "value")).alias("_open"),
            F.max(F.struct("ts", "event_id", "value")).alias("_close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("_vol"),
        )
    )


def ohlc_finalize(parts: DataFrame) -> DataFrame:
    """Re-merge :func:`ohlc_partials` rows (idempotent on a single
    batch's output) and emit the candlestick columns."""
    return (
        parts.groupBy("event_type", "hour_ts")
        .agg(
            F.min("_open").alias("_open"),
            F.max("_close").alias("_close"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("_vol").alias("_vol"),
        )
        .select(
            "event_type",
            "hour_ts",
            F.col("_open.value").alias("open"),
            "high",
            "low",
            F.col("_close.value").alias("close"),
            "n_events",
            F.col("_vol").cast("double").alias("volume"),
        )
    )


def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick rollup of the event value series: per
    (event_type, hour) — open (earliest value), high, low, close
    (latest value), n_events, volume.  Ties inside an hour break on
    event_id, so open/close are well-defined even with duplicate
    timestamps.

    open/close are raw doubles carried through untouched (no float
    arithmetic to diverge); high/low are exact comparisons; volume sums
    the values as DECIMAL(18,4) (order-independent) and is emitted as
    that exact decimal cast to double.  Plan: ONE hash aggregate — the
    edge picks are struct-min/max of (ts, event_id, value), which
    partial-aggregates map-side like any min/max (an earlier draft used
    two row_number window passes; the struct-pick form removes the sort
    entirely and is what makes the streaming twin exact)."""
    return ohlc_finalize(ohlc_partials(load_events(spark, sf_dir)))


EVENTS_OHLC_SQL = """
WITH ev AS (
  SELECT *, date_trunc('hour', ts) AS hour_ts,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS _rna,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS _rnd
  FROM events)
SELECT event_type, hour_ts,
       MAX(CASE WHEN _rna = 1 THEN value END) AS open,
       MAX(value) AS high, MIN(value) AS low,
       MAX(CASE WHEN _rnd = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS volume
FROM ev GROUP BY event_type, hour_ts
"""


def ab_sprt_curve(
    spark: SparkSession,
    sf_dir: str,
    *,
    p0_milli: int = 40,
    p1_milli: int = 50,
    alpha_milli: int = 50,
    beta_milli: int = 200,
) -> DataFrame:
    """Wald's Sequential Probability Ratio Test on the treatment arm's
    daily conversion stream (arm = user_id parity; conversion = the
    user fired a `purchase` that day): per day —
    (day, n_obs, n_conv, cum_llr, decision).  H0: p = p0, H1: p = p1;
    the cumulative log-likelihood ratio crosses ln((1−β)/α) → accept
    H1, ln(β/(1−α)) → accept H0, else continue.  This is the
    always-valid sequential form of ab_conversion_z — the one you can
    peek at daily without alpha inflation.

    Exactness: the two per-observation LLR increments are CONSTANTS of
    the hypotheses (x=1: ln(p1/p0); x=0: ln((1−p1)/(1−p0))), so each is
    rounded once at 6 dp and cum_llr = n_conv·a + (n_obs−n_conv)·b is
    an exact integer×decimal sum under a cumulative window — no float
    accumulation.  Probabilities and thresholds enter as integer milli
    parameters, so both engines derive the identical constants."""
    return sprt_finalize(
        sprt_obs_partials(load_events(spark, sf_dir)),
        p0_milli=p0_milli, p1_milli=p1_milli,
        alpha_milli=alpha_milli, beta_milli=beta_milli,
    )


def sprt_obs_partials(ev: DataFrame) -> DataFrame:
    """Mergeable partial for :func:`ab_sprt_curve`: per (treatment user,
    day) conversion flags.  MAX re-merges exactly under any batching
    (idempotent), so the live SPRT monitor equals the batch curve —
    state is the (user, day) observation rollup, never the event
    stream."""
    return (
        ev.filter(F.col("user_id") % 2 == 1)
        .groupBy(F.col("user_id"), F.to_date("ts").alias("day"))
        .agg(
            F.max((F.col("event_type") == "purchase").cast("int")).alias(
                "_conv"
            )
        )
    )


def sprt_finalize(
    obs_parts: DataFrame,
    *,
    p0_milli: int = 40,
    p1_milli: int = 50,
    alpha_milli: int = 50,
    beta_milli: int = 200,
) -> DataFrame:
    """Re-merge observation partials and emit the SPRT decision curve
    (see :func:`ab_sprt_curve` for the exactness argument)."""
    import math

    p0, p1 = p0_milli / 1000.0, p1_milli / 1000.0
    a_, b_ = alpha_milli / 1000.0, beta_milli / 1000.0
    la = round(math.log(p1 / p0), 6)
    lb = round(math.log((1 - p1) / (1 - p0)), 6)
    hi = round(math.log((1 - b_) / a_), 6)
    lo = round(math.log(b_ / (1 - a_)), 6)
    obs = obs_parts.groupBy("user_id", "day").agg(
        F.max("_conv").alias("_conv")
    )
    daily = obs.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("_conv").alias("n_conv"),
    )
    cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        daily.withColumn(
            "_llr",
            (
                F.col("n_conv") * F.lit(la).cast("decimal(28,6)")
                + (F.col("n_obs") - F.col("n_conv"))
                * F.lit(lb).cast("decimal(28,6)")
            ),
        )
        .withColumn("cum_llr_dec", F.sum("_llr").over(cum))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n_obs").cast("long").alias("n_obs"),
            F.col("n_conv").cast("long").alias("n_conv"),
            F.col("cum_llr_dec").cast("double").alias("cum_llr"),
            F.when(
                F.col("cum_llr_dec") >= F.lit(hi).cast("decimal(28,6)"),
                F.lit("accept_h1"),
            )
            .when(
                F.col("cum_llr_dec") <= F.lit(lo).cast("decimal(28,6)"),
                F.lit("accept_h0"),
            )
            .otherwise(F.lit("continue"))
            .alias("decision"),
        )
    )


def ab_sprt_curve_sql(
    *,
    p0_milli: int = 40,
    p1_milli: int = 50,
    alpha_milli: int = 50,
    beta_milli: int = 200,
) -> str:
    """DuckDB twin of :func:`ab_sprt_curve` — the same four 6-dp
    constants are derived in Python and inlined as literals."""
    import math

    p0, p1 = p0_milli / 1000.0, p1_milli / 1000.0
    a_, b_ = alpha_milli / 1000.0, beta_milli / 1000.0
    la = round(math.log(p1 / p0), 6)
    lb = round(math.log((1 - p1) / (1 - p0)), 6)
    hi = round(math.log((1 - b_) / a_), 6)
    lo = round(math.log(b_ / (1 - a_)), 6)
    return f"""
WITH obs AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS _conv
  FROM events WHERE user_id % 2 = 1 GROUP BY 1, 2),
daily AS (
  SELECT day, COUNT(*) AS n_obs, SUM(_conv) AS n_conv
  FROM obs GROUP BY day),
cum AS (
  SELECT *,
         SUM(n_conv * CAST({la!r} AS DECIMAL(28,6))
             + (n_obs - n_conv) * CAST({lb!r} AS DECIMAL(28,6)))
           OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_llr_dec
  FROM daily)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(n_obs AS BIGINT) AS n_obs,
       CAST(n_conv AS BIGINT) AS n_conv,
       CAST(cum_llr_dec AS DOUBLE) AS cum_llr,
       CASE WHEN cum_llr_dec >= CAST({hi!r} AS DECIMAL(28,6))
              THEN 'accept_h1'
            WHEN cum_llr_dec <= CAST({lo!r} AS DECIMAL(28,6))
              THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM cum
"""


def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: users cohorted by first-seen day;
    for each (cohort_day, age) — (cohort_size, n_active, cum_value_per_
    user): the cohort's cumulative event value through that age,
    per original cohort member (the fixed-denominator LTV convention,
    so the curve is monotone and cohorts compare fairly).

    Exactness: per-(cohort, age) value sums in DECIMAL(18,4), cumulative
    over age by an exact decimal window sum, ONE double divide by the
    integer cohort size, rounded at 6 dp.  Plan: per-user first-day
    aggregate (broadcast back), one (cohort, age) hash aggregate, then
    a cohort-partitioned cumulative window over the triangle — the
    triangle is (days × days)/2 rows, metadata-sized."""
    ev = load_events(spark, sf_dir)
    first = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    sized = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cell = (
        ev.select(
            "user_id",
            F.to_date("ts").alias("day"),
            F.col("value").cast("decimal(18,4)").alias("_v"),
        )
        .join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").alias("age"),
        )
        .agg(
            F.countDistinct("user_id").alias("n_active"),
            F.sum("_v").alias("_val"),
        )
    )
    cum = (
        Window.partitionBy("cohort_day")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cell.join(F.broadcast(sized), "cohort_day")
        .withColumn("_cum", F.sum("_val").over(cum))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("age").cast("long").alias("age"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.col("n_active").cast("long").alias("n_active"),
            F.round(
                F.col("_cum").cast("double") / F.col("cohort_size"), 6
            ).alias("cum_value_per_user"),
        )
    )


COHORT_LTV_SQL = """
WITH first AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id),
sized AS (
  SELECT cohort_day, COUNT(*) AS cohort_size FROM first GROUP BY 1),
cell AS (
  SELECT f.cohort_day,
         datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS age,
         COUNT(DISTINCT e.user_id) AS n_active,
         SUM(CAST(e.value AS DECIMAL(18,4))) AS _val
  FROM events e JOIN first f ON e.user_id = f.user_id
  GROUP BY 1, 2)
SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(age AS BIGINT) AS age,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       CAST(n_active AS BIGINT) AS n_active,
       round(CAST(SUM(_val) OVER (PARTITION BY c.cohort_day ORDER BY age
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) / s.cohort_size, 6) AS cum_value_per_user
FROM cell c JOIN sized s ON c.cohort_day = s.cohort_day
"""


def events_forecast(
    spark: SparkSession, sf_dir: str, *, horizon: int = 24
) -> DataFrame:
    """Seasonal-naive + drift forecast of the next ``horizon`` hourly
    event counts per type — (event_type, horizon_h, forecast_hour,
    forecast_milli): forecast(h) = count at the same hour of the LAST
    fully observed day, plus a flat drift term (1000·(last-day total −
    previous-day total) div 24 per hour, the discrete trend).  Seasonal
    naive with drift is the standard strong baseline any forecasting
    stack must beat (Hyndman & Athanasopoulos, FPP) — and unlike
    recursive smoothers it is fully window/join-expressible, so both
    engines reproduce it in exact integer milli-units.

    Days here are the last TWO complete 24h blocks counted back from
    the max observed hour (epoch-hour arithmetic, not calendar days),
    so the seasonal lag is exactly 24 regardless of where the series
    ends.  Missing hours inside a block contribute 0 (left join onto
    the dense 24-hour template).

    100 TB shape: one hash aggregate to the hourly rollup; everything
    after (the two 24-row blocks, the drift scalars, the horizon
    template) is type-cardinality × 24 sized, broadcast-joined."""
    return forecast_from_hourly(
        burst_hourly_partials(load_events(spark, sf_dir)),
        horizon=horizon,
    )


def forecast_from_hourly(
    hourly_parts: DataFrame, *, horizon: int = 24
) -> DataFrame:
    """Run the seasonal-naive + drift forecast on (possibly streamed)
    hourly count partials — shares :func:`burst_hourly_partials`'
    mergeable state, so the live forecast equals the batch one."""
    spark = hourly_parts.sparkSession
    hourly = (
        hourly_parts.groupBy("event_type", "hour_ts")
        .agg(F.sum("n").alias("n"))
        .withColumn("hour_idx", F.expr("unix_timestamp(hour_ts) div 3600"))
    )
    mx = hourly.agg(F.max("hour_idx").alias("_mx"))
    # offset from the block boundary: last day = offsets 1..24 back
    based = hourly.join(F.broadcast(mx)).withColumn(
        "_back", F.col("_mx") - F.col("hour_idx")
    )
    last_day = based.filter(F.col("_back") < 24).select(
        "event_type",
        (F.col("_back") % 24).alias("_slot"),
        F.col("n").alias("n_last"),
    )
    prev_day = based.filter(
        (F.col("_back") >= 24) & (F.col("_back") < 48)
    ).select(
        "event_type",
        (F.col("_back") % 24).alias("_slot"),
        F.col("n").alias("n_prev"),
    )
    drift = (
        last_day.groupBy("event_type")
        .agg(F.sum("n_last").alias("_s1"))
        .join(
            prev_day.groupBy("event_type").agg(
                F.sum("n_prev").alias("_s0")
            ),
            "event_type",
            "left",
        )
        .select(
            "event_type",
            F.expr(
                "(1000 * (_s1 - coalesce(_s0, 0))) div 24"
            ).alias("drift_milli"),
        )
    )
    template = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(1, horizon + 1).select(
                F.col("id").cast("long").alias("horizon_h")
            )
        )
    )
    return (
        template.join(F.broadcast(mx))
        # forecast hour L+h looks back to slot (24 - (h mod 24)) mod 24
        .withColumn(
            "_slot",
            (F.lit(24) - (F.col("horizon_h") % 24)) % 24,
        )
        .join(F.broadcast(last_day), ["event_type", "_slot"], "left")
        .join(F.broadcast(drift), "event_type")
        .select(
            "event_type",
            "horizon_h",
            F.date_format(
                F.timestamp_seconds(
                    (F.col("_mx") + F.col("horizon_h")) * 3600
                ),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("forecast_hour"),
            F.greatest(
                F.lit(0).cast("long"),
                (
                    F.lit(1000) * F.coalesce("n_last", F.lit(0))
                    + F.col("drift_milli")
                ).cast("long"),
            ).alias("forecast_milli"),
        )
    )


def events_forecast_sql(*, horizon: int = 24) -> str:
    """DuckDB twin of :func:`events_forecast`."""
    return f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts, COUNT(*) AS n,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hour_idx
  FROM events GROUP BY 1, 2),
mx AS (SELECT max(hour_idx) AS _mx FROM hourly),
based AS (
  SELECT h.*, m._mx - h.hour_idx AS _back FROM hourly h, mx m),
last_day AS (
  SELECT event_type, _back % 24 AS _slot, n AS n_last
  FROM based WHERE _back < 24),
prev_day AS (
  SELECT event_type, _back % 24 AS _slot, n AS n_prev
  FROM based WHERE _back >= 24 AND _back < 48),
drift AS (
  SELECT l.event_type,
         (1000 * (SUM(l.n_last)
                  - COALESCE((SELECT SUM(p.n_prev) FROM prev_day p
                              WHERE p.event_type = l.event_type), 0)))
           // 24 AS drift_milli
  FROM last_day l GROUP BY l.event_type),
template AS (
  SELECT DISTINCT event_type, h.horizon_h
  FROM hourly CROSS JOIN
    (SELECT unnest(generate_series(1, {horizon})) AS horizon_h) h)
SELECT t.event_type, CAST(t.horizon_h AS BIGINT) AS horizon_h,
       strftime(CAST(to_timestamp((m._mx + t.horizon_h) * 3600)
                     AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
         AS forecast_hour,
       CAST(greatest(0, 1000 * COALESCE(l.n_last, 0) + d.drift_milli)
            AS BIGINT) AS forecast_milli
FROM template t
CROSS JOIN mx m
LEFT JOIN last_day l
  ON l.event_type = t.event_type
 AND l._slot = (24 - (t.horizon_h % 24)) % 24
JOIN drift d ON d.event_type = t.event_type
"""


def _conformal_k(alpha_milli: int, n_cal: int = 24) -> int:
    """Split-conformal order-statistic index: the ceil((1−α)(n+1))-th
    smallest calibration residual gives ≥(1−α) marginal coverage
    (Vovk; Lei et al.) — pure integer ceiling division."""
    if not 0 < alpha_milli < 1000:
        raise ValueError("alpha_milli in (0, 1000)")
    k = -(-(1000 - int(alpha_milli)) * (n_cal + 1) // 1000)
    return min(k, n_cal)


def forecast_conformal_from_hourly(
    hourly_parts: DataFrame,
    *,
    horizon: int = 24,
    alpha_milli: int = 200,
) -> DataFrame:
    """Seasonal-naive + drift forecast WITH split-conformal intervals —
    the point forecast (:func:`forecast_from_hourly`) plus distribution-
    free ±q bands: the calibration residuals are the 24 per-slot
    |last-day − previous-day| gaps (the seasonal-naive backtest the
    data already contains), and q is their ceil((1−α)(n+1))-th order
    statistic — the standard split-conformal guarantee with NO
    distributional assumption and NO float arithmetic (counts, abs
    diffs, one exact order statistic, integer milli everywhere).
    Output: forecast columns + (q_milli, lo_milli, hi_milli),
    lo clamped at 0.

    100 TB shape: everything after the shared hourly rollup is
    type-cardinality × 24 sized; the order statistic is a per-type
    window over 24 rows."""
    f = forecast_from_hourly(hourly_parts, horizon=horizon)
    hourly = (
        hourly_parts.groupBy("event_type", "hour_ts")
        .agg(F.sum("n").alias("n"))
        .withColumn(
            "hour_idx", F.expr("unix_timestamp(hour_ts) div 3600")
        )
    )
    mx = hourly.agg(F.max("hour_idx").alias("_mx"))
    based = hourly.join(F.broadcast(mx)).withColumn(
        "_back", F.col("_mx") - F.col("hour_idx")
    )
    slots = (
        hourly.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(23))).alias("_slot"),
        )
    )
    last_day = based.filter(F.col("_back") < 24).select(
        "event_type",
        (F.col("_back") % 24).alias("_slot"),
        F.col("n").alias("n_last"),
    )
    prev_day = based.filter(
        (F.col("_back") >= 24) & (F.col("_back") < 48)
    ).select(
        "event_type",
        (F.col("_back") % 24).alias("_slot"),
        F.col("n").alias("n_prev"),
    )
    cal = (
        slots.join(last_day, ["event_type", "_slot"], "left")
        .join(prev_day, ["event_type", "_slot"], "left")
        .select(
            "event_type",
            "_slot",
            F.abs(
                F.coalesce("n_last", F.lit(0))
                - F.coalesce("n_prev", F.lit(0))
            ).alias("_r"),
        )
    )
    k = _conformal_k(alpha_milli)
    w = Window.partitionBy("event_type").orderBy("_r", "_slot")
    q = (
        cal.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == k)
        .select("event_type", (F.col("_r") * 1000).alias("q_milli"))
    )
    return f.join(q, "event_type").select(
        f["*"],
        F.col("q_milli").cast("long").alias("q_milli"),
        F.greatest(
            F.lit(0), F.col("forecast_milli") - F.col("q_milli")
        )
        .cast("long")
        .alias("lo_milli"),
        (F.col("forecast_milli") + F.col("q_milli"))
        .cast("long")
        .alias("hi_milli"),
    )


def events_forecast_conformal(
    spark: SparkSession,
    sf_dir: str,
    *,
    horizon: int = 24,
    alpha_milli: int = 200,
) -> DataFrame:
    """:func:`events_forecast` with split-conformal ±q bands."""
    return forecast_conformal_from_hourly(
        burst_hourly_partials(load_events(spark, sf_dir)),
        horizon=horizon,
        alpha_milli=alpha_milli,
    )


def events_forecast_conformal_sql(
    *, horizon: int = 24, alpha_milli: int = 200
) -> str:
    """DuckDB twin of :func:`events_forecast_conformal` — the point
    forecast nested as a CTE plus the identical calibration order
    statistic."""
    k = _conformal_k(alpha_milli)
    return f"""
WITH f AS MATERIALIZED ({events_forecast_sql(horizon=horizon)}),
hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts, COUNT(*) AS n,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600
           AS hour_idx
  FROM events GROUP BY 1, 2),
mx AS (SELECT max(hour_idx) AS _mx FROM hourly),
based AS (
  SELECT h.*, m._mx - h.hour_idx AS _back FROM hourly h, mx m),
slots AS (
  SELECT DISTINCT event_type, s.slot
  FROM hourly CROSS JOIN
    (SELECT unnest(range(0, 24)) AS slot) s),
last_day AS (
  SELECT event_type, _back % 24 AS _slot, n AS n_last
  FROM based WHERE _back < 24),
prev_day AS (
  SELECT event_type, _back % 24 AS _slot, n AS n_prev
  FROM based WHERE _back >= 24 AND _back < 48),
cal AS (
  SELECT s.event_type, s.slot,
         abs(COALESCE(l.n_last, 0) - COALESCE(p.n_prev, 0)) AS r
  FROM slots s
  LEFT JOIN last_day l
    ON l.event_type = s.event_type AND l._slot = s.slot
  LEFT JOIN prev_day p
    ON p.event_type = s.event_type AND p._slot = s.slot),
q AS (
  SELECT event_type, CAST(r * 1000 AS BIGINT) AS q_milli FROM (
    SELECT event_type, r, row_number() OVER (
      PARTITION BY event_type ORDER BY r, slot) AS rn
    FROM cal)
  WHERE rn = {k})
SELECT f.*, q.q_milli,
       CAST(greatest(0, f.forecast_milli - q.q_milli) AS BIGINT)
         AS lo_milli,
       CAST(f.forecast_milli + q.q_milli AS BIGINT) AS hi_milli
FROM f JOIN q USING (event_type)
"""


NANO = 10**9


def events_markov_stationary(
    spark: SparkSession, sf_dir: str, *, n_iter: int = 8
) -> DataFrame:
    """Long-run occupancy of the behavioral Markov chain: π after
    ``n_iter`` integer power-iteration steps of
    :func:`event_transition_matrix`'s row-stochastic matrix —
    (event_type, pi_nano, pi_milli): where a user's attention settles
    if the observed transition behavior persists.

    Exactness: π'(j) = Σ_i π(i)·c(i,j) div c(i,·) in int64 nano-units
    (truncating division identical in both engines on non-negatives),
    starting uniform at NANO per state; the display share renormalizes
    once at the end, (1000·π) div Σπ.  The per-step mass leak is
    ≤ n_states nano per state — far below ranking-relevant signal.

    100 TB shape: the one heavy stage is the per-user lag + count
    aggregate that builds the transition counts; the iteration runs on
    the types² matrix — broadcast-sized by construction.  int64 bound:
    π(i)·c needs c ≲ 10^9 per cell (π ≤ n_states·NANO); past that,
    pre-reduce each row of c to milli-probabilities before iterating —
    the division is per-row, so the reduction is exact-integer too."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # counts grouped globally above → unique per (from, to); skip the
    # redundant re-merge (KS/Gini re-pin lesson)
    return markov_finalize(counts, n_iter=n_iter, assume_merged=True)


def markov_finalize(
    counts: DataFrame,
    *,
    n_iter: int = 8,
    assume_merged: bool = False,
) -> DataFrame:
    """Power-iterate π from (possibly un-merged) transition-count rows
    (from_type, to_type, c) — the types²-sized tail of
    :func:`events_markov_stationary`, shared with the live twin whose
    state IS this counter table.  ``assume_merged=True`` is the batch
    fast path (counts already unique per (from, to))."""
    if not assume_merged:
        counts = counts.groupBy("from_type", "to_type").agg(
            F.sum("c").alias("c")
        )
    rows = counts.groupBy("from_type").agg(F.sum("c").alias("row_c"))
    mat = counts.join(rows, "from_type").localCheckpoint(eager=False)
    states = mat.select(
        F.col("from_type").alias("event_type")
    ).union(
        mat.select(F.col("to_type").alias("event_type"))
    ).distinct().localCheckpoint(eager=False)
    pi = states.select(
        "event_type", F.lit(NANO).cast("long").alias("pi_nano")
    )
    for _ in range(n_iter):
        pi = (
            mat.join(
                pi, mat["from_type"] == pi["event_type"]
            )
            .select(
                F.col("to_type").alias("event_type"),
                F.expr("(pi_nano * c) div row_c").alias("_m"),
            )
            .groupBy("event_type")
            .agg(F.sum("_m").cast("long").alias("pi_nano"))
            .localCheckpoint(eager=False)
        )
    tot = pi.agg(F.sum("pi_nano").alias("_tot"))
    return (
        pi.join(F.broadcast(tot))
        .select(
            "event_type",
            "pi_nano",
            F.expr("(1000 * pi_nano) div _tot").cast("long").alias(
                "pi_milli"
            ),
        )
    )


def events_markov_stationary_sql(*, n_iter: int = 8) -> str:
    """DuckDB twin of :func:`events_markov_stationary` — the identical
    integer iteration unrolled (MATERIALIZED: the matrix CTE is
    referenced every round)."""
    ctes = [
        """seq AS MATERIALIZED (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events)""",
        """cnt AS MATERIALIZED (
  SELECT from_type, to_type, COUNT(*) AS c
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)""",
        """mat AS MATERIALIZED (
  SELECT c.*, r.row_c FROM cnt c JOIN
    (SELECT from_type, SUM(c) AS row_c FROM cnt GROUP BY 1) r
  USING (from_type))""",
        """states AS MATERIALIZED (
  SELECT from_type AS event_type FROM mat
  UNION SELECT to_type FROM mat)""",
        f"""p0 AS (SELECT event_type, CAST({NANO} AS BIGINT) AS pi_nano
  FROM states)""",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""p{i} AS MATERIALIZED (
  SELECT m.to_type AS event_type,
         CAST(SUM((p.pi_nano * m.c) // m.row_c) AS BIGINT) AS pi_nano
  FROM mat m JOIN p{i - 1} p ON m.from_type = p.event_type
  GROUP BY 1)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT event_type, pi_nano,
       CAST((1000 * pi_nano) // (SELECT SUM(pi_nano) FROM p{n_iter})
            AS BIGINT) AS pi_milli
FROM p{n_iter}
"""
    )


def ks_sided_partials(ev: DataFrame, split_micros: int) -> DataFrame:
    """Mergeable KS partials for a PINNED split point: (event_type,
    value, d1, d2) counts per side — pure sums, so any regrouping of
    rows into micro-batches re-merges exactly.

    The pin is what makes streaming KS possible at all: the batch op's
    data-dependent midpoint is an extremum statistic of the WHOLE
    stream, so side assignment under it is not batch-local — an early
    row's side can flip when a later row extends the time range.  With
    the split fixed at deploy time (the production reference-window
    discipline: 'last release week' vs 'live'), sidedness becomes a row
    property and the counts form a merge lattice.  State is
    distinct-(type, value) bounded — quantize the value domain upstream
    if it is unbounded."""
    sided = ev.select(
        "event_type",
        "value",
        (
            F.expr("unix_micros(cast(ts as timestamp))")
            < F.lit(int(split_micros))
        )
        .cast("int")
        .alias("_early"),
    )
    return sided.groupBy("event_type", "value").agg(
        F.sum("_early").alias("d1"),
        F.sum(F.lit(1) - F.col("_early")).alias("d2"),
    )


def ks_finalize(
    parts: DataFrame, *, threshold_milli: int = 100,
    assume_merged: bool = False
) -> DataFrame:
    """KS statistic from (event_type, value, d1, d2) count partials:
    re-merge, cumulate per type over the value spine, and take the max
    cross-multiplied CDF gap — shared by the batch op and the live
    twin, so streaming ≡ batch is by construction.

    ``assume_merged=True`` skips the merge pass for callers whose
    partials are already (event_type, value)-unique (the batch op's
    own rollup) — on a continuous value domain the spine is near row
    cardinality, so the redundant second hash-aggregate over it is a
    real extra pass (r9 bench drift item); re-merging unique keys is
    the identity, so both paths produce identical results."""
    roll = (
        parts
        if assume_merged
        else parts.groupBy("event_type", "value").agg(
            F.sum("d1").alias("d1"), F.sum("d2").alias("d2")
        )
    )
    tot = roll.groupBy("event_type").agg(
        F.sum("d1").alias("n1"), F.sum("d2").alias("n2")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ks = (
        roll.withColumn("c1", F.sum("d1").over(w))
        .withColumn("c2", F.sum("d2").over(w))
        .join(tot, "event_type")
        .groupBy("event_type", "n1", "n2")
        .agg(
            F.max(
                F.abs(
                    F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")
                )
            ).alias("_ks_scaled")
        )
    )
    # a type whose events all land on one side of the split has no
    # two-sample statistic: NULL ks, not an ANSI division-by-zero throw
    km = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0),
        F.expr("(1000 * _ks_scaled) div (n1 * n2)"),
    )
    return ks.select(
        "event_type",
        F.col("n1").cast("long").alias("n_early"),
        F.col("n2").cast("long").alias("n_late"),
        km.cast("long").alias("ks_milli"),
        (km >= threshold_milli).alias("drifted"),
    )


def events_wasserstein_drift(
    spark: SparkSession, sf_dir: str, *, split_day: int = 15
) -> DataFrame:
    """EXACT 1-Wasserstein (earth-mover) drift per event type between
    the first- and second-half value distributions — the third leg of
    the drift triad: PSI is binned-and-smoothed, KS is the sup-norm
    (one worst point), W₁ = ∫|F_old − F_new| dx integrates HOW MUCH
    mass moved HOW FAR, in the value's own units — the score that
    distinguishes a tiny wiggle everywhere from a real mean shift.
    Output: (event_type, n_old, n_new, w1).

    Exactness: on the merged distinct-value spine, |F_old − F_new| =
    |c_old·n_new − c_new·n_old| / (n_old·n_new) with exact integer
    cumulatives; each spine interval contributes |cross| · Δv.  The
    cross products are decimal(38,0) (no int64 wrap at any n), each
    interval's contribution is one double multiply rounded to 6 dp and
    decimal-summed (order-free), and the single n_old·n_new divide
    lands once at the end.  Sidedness is the PSI calendar rule
    (day-of-month > split_day — batch-local), so the (type, value,
    side) counts are a true merge lattice; the live form's state is
    the value spine itself, which is why the bounded-state streaming
    drift twin is PSI, not W₁ (same impossibility class as KS's
    data-dependent midpoint, noted here for the coverage map).

    Plan shape: one (type, value) rollup, one value-ordered cumulative
    window + lead per type, one sum — identical spine economics to
    :func:`events_ks_drift`."""
    ev = load_events(spark, sf_dir)
    period_new = F.dayofmonth("ts") > split_day
    roll = ev.groupBy("event_type", "value").agg(
        F.sum(F.when(~period_new, 1).otherwise(0)).alias("d_old"),
        F.sum(F.when(period_new, 1).otherwise(0)).alias("d_new"),
    )
    tot = roll.groupBy("event_type").agg(
        F.sum("d_old").alias("n_old"), F.sum("d_new").alias("n_new")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wl = Window.partitionBy("event_type").orderBy("value")
    cum = (
        roll.withColumn("c_old", F.sum("d_old").over(w))
        .withColumn("c_new", F.sum("d_new").over(w))
        .withColumn("_next_v", F.lead("value").over(wl))
        .join(F.broadcast(tot), "event_type")
    )
    cross = F.abs(
        F.col("c_old").cast("decimal(38,0)") * F.col("n_new")
        - F.col("c_new").cast("decimal(38,0)") * F.col("n_old")
    )
    contrib = F.round(
        cross.cast("double") * (F.col("_next_v") - F.col("value")), 6
    ).cast("decimal(38,6)")
    agg = (
        cum.filter(F.col("_next_v").isNotNull())
        .groupBy("event_type", "n_old", "n_new")
        .agg(F.sum(contrib).alias("_num"))
    )
    # a type with all its mass on one side has no two-sample distance:
    # NULL, not an ANSI division-by-zero throw
    w1 = F.when(
        (F.col("n_old") > 0) & (F.col("n_new") > 0),
        F.round(
            F.col("_num").cast("double")
            / (F.col("n_old").cast("double") * F.col("n_new")),
            6,
        ),
    )
    return agg.select(
        "event_type",
        F.col("n_old").cast("long").alias("n_old"),
        F.col("n_new").cast("long").alias("n_new"),
        w1.alias("w1"),
    )


def events_wasserstein_drift_sql(*, split_day: int = 15) -> str:
    """DuckDB twin of :func:`events_wasserstein_drift` — identical
    integer cumulatives, decimal cross products, 6-dp rounded interval
    contributions, single final divide."""
    return f"""
WITH roll AS (
  SELECT event_type, value,
         SUM(CASE WHEN day(ts) > {split_day} THEN 0 ELSE 1 END) AS d_old,
         SUM(CASE WHEN day(ts) > {split_day} THEN 1 ELSE 0 END) AS d_new
  FROM events GROUP BY 1, 2),
tot AS (
  SELECT event_type, SUM(d_old) AS n_old, SUM(d_new) AS n_new
  FROM roll GROUP BY 1),
cum AS (
  SELECT r.event_type, r.value,
         SUM(r.d_old) OVER w AS c_old,
         SUM(r.d_new) OVER w AS c_new,
         lead(r.value) OVER (PARTITION BY r.event_type
                             ORDER BY r.value) AS next_v
  FROM roll r
  WINDOW w AS (PARTITION BY r.event_type ORDER BY r.value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
agg AS (
  SELECT c.event_type, t.n_old, t.n_new,
         SUM(CAST(round(
           CAST(abs(CAST(c.c_old AS DECIMAL(38,0)) * t.n_new
                    - CAST(c.c_new AS DECIMAL(38,0)) * t.n_old)
                AS DOUBLE) * (c.next_v - c.value), 6)
           AS DECIMAL(38,6))) AS num
  FROM cum c JOIN tot t USING (event_type)
  WHERE c.next_v IS NOT NULL
  GROUP BY 1, 2, 3)
SELECT event_type,
       CAST(n_old AS BIGINT) AS n_old,
       CAST(n_new AS BIGINT) AS n_new,
       CASE WHEN n_old > 0 AND n_new > 0
            THEN round(CAST(num AS DOUBLE)
                       / (CAST(n_old AS DOUBLE) * CAST(n_new AS DOUBLE)),
                       6)
       END AS w1
FROM agg
"""


def events_ks_drift(
    spark: SparkSession, sf_dir: str, *, threshold_milli: int = 100
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov drift per event type — the
    unbinned twin of psi_drift_report: the value stream splits at the
    time-range midpoint into early/late samples, and KS = max over the
    value spine of |CDF_early − CDF_late| — (event_type, n_early,
    n_late, ks_milli, drifted).  PSI sees what the bin layout lets it
    see; KS is binning-free, so a shift smaller than a bin width still
    registers.

    Exactness: CDF differences compare CROSS-MULTIPLIED integer
    cumulative counts (|c1·n2 − c2·n1|, no division until the final
    milli ratio; fits int64 while n1·n2 < 2^63 — beyond ~3·10^9 rows
    per side, pre-aggregate to a quantile sketch instead).  Plan: one
    (type, value, side) rollup, one value-ordered cumulative window
    per type, one max aggregate — the spine is distinct-value sized."""
    ev = load_events(spark, sf_dir)
    # session TZ is pinned UTC, so the NTZ->TIMESTAMP cast is identity
    # (unix_micros rejects TIMESTAMP_NTZ outright)
    mid = ev.agg(
        F.expr(
            "(min(unix_micros(cast(ts as timestamp)))"
            " + max(unix_micros(cast(ts as timestamp)))) div 2"
        ).alias("_mid")
    )
    sided = ev.join(F.broadcast(mid)).select(
        "event_type",
        "value",
        (F.expr("unix_micros(cast(ts as timestamp))") < F.col("_mid"))
        .cast("int")
        .alias("_early"),
    )
    roll = sided.groupBy("event_type", "value").agg(
        F.sum("_early").alias("d1"),
        F.sum(F.lit(1) - F.col("_early")).alias("d2"),
    )
    return ks_finalize(
        roll, threshold_milli=threshold_milli, assume_merged=True
    )


def events_ks_drift_sql(*, threshold_milli: int = 100) -> str:
    """DuckDB twin of :func:`events_ks_drift`."""
    return f"""
WITH mid AS (
  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS _mid
  FROM events),
sided AS (
  SELECT event_type, value,
         CASE WHEN epoch_us(ts) < _mid THEN 1 ELSE 0 END AS _early
  FROM events, mid),
roll AS (
  SELECT event_type, value, SUM(_early) AS d1,
         SUM(1 - _early) AS d2
  FROM sided GROUP BY 1, 2),
tot AS (
  SELECT event_type, SUM(_early) AS n1, SUM(1 - _early) AS n2
  FROM sided GROUP BY 1),
cum AS (
  SELECT r.event_type,
         SUM(d1) OVER (PARTITION BY r.event_type ORDER BY value
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
         SUM(d2) OVER (PARTITION BY r.event_type ORDER BY value
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
  FROM roll r),
ks AS (
  SELECT c.event_type, t.n1, t.n2,
         MAX(ABS(CAST(c.c1 AS BIGINT) * t.n2
                 - CAST(c.c2 AS BIGINT) * t.n1)) AS _ks_scaled
  FROM cum c JOIN tot t ON c.event_type = t.event_type
  GROUP BY 1, 2, 3)
SELECT event_type, CAST(n1 AS BIGINT) AS n_early,
       CAST(n2 AS BIGINT) AS n_late,
       CAST(CASE WHEN n1 > 0 AND n2 > 0
            THEN (1000 * _ks_scaled) // (n1 * n2) END AS BIGINT)
         AS ks_milli,
       CASE WHEN n1 > 0 AND n2 > 0
            THEN (1000 * _ks_scaled) // (n1 * n2) >= {threshold_milli} END
         AS drifted
FROM ks
"""


def gini_revenue_partials(orders: DataFrame) -> DataFrame:
    """Mergeable per-customer revenue partials for the Gini pipeline:
    (o_custkey, rev) exact decimal sums — the ENTITY ROLLUP is the
    streaming state (the streaming_growth (user, day) discipline), and
    partial sums re-merge exactly under any micro-batch regrouping.

    The Gini coefficient itself needs a rank (a sorted cumulative sum)
    — an order statistic with no mergeable sub-linear partial form —
    but the rank is over CUSTOMERS, not order rows, so the sort runs at
    finalize over the per-customer state table: history is never
    re-read, and the sorted pass costs |customers|, not |orders|."""
    return orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("rev")
    )


def gini_finalize(
    parts: DataFrame, customer: DataFrame, *, assume_merged: bool = False
) -> DataFrame:
    """Gini terms from per-customer revenue partials: re-merge, enrich
    with the (static) customer dim for the segment, cent-integer
    ranked cumsum per segment — shared by the batch op and the live
    twin.  ``assume_merged=True`` skips the merge shuffle when the
    partials are already o_custkey-unique (the batch op's own rollup) —
    identity on unique keys, one less |customers| aggregate pass."""
    merged = (
        parts.select("o_custkey", F.col("rev").alias("_r"))
        if assume_merged
        else parts.groupBy("o_custkey").agg(
            F.sum("rev").cast("decimal(28,2)").alias("_r")
        )
    )
    rev = (
        merged.join(
            customer.select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_mktsegment").alias("segment"),
            ),
            "o_custkey",
        )
        .select(
            "segment",
            "o_custkey",
            (F.col("_r") * 100).cast("decimal(38,0)").alias("x"),
        )
    )
    w = Window.partitionBy("segment").orderBy("x", "o_custkey")
    terms = rev.withColumn("i", F.row_number().over(w)).groupBy(
        "segment"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x") * F.col("i")).alias("_six"),
        F.sum("x").alias("_sx"),
    )
    return terms.select(
        "segment",
        F.col("n").cast("long").alias("n_customers"),
        F.round(
            F.lit(1000)
            * (
                F.lit(2) * F.col("_six").cast("double")
                - (F.col("n") + 1) * F.col("_sx").cast("double")
            )
            / (F.col("n") * F.col("_sx").cast("double")),
            0,
        )
        .cast("long")
        .alias("gini_milli"),
    )


def revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per market segment as an exact Gini
    coefficient over per-customer revenue — (segment, n_customers,
    gini_milli): gini = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) with x the
    cent-integer revenues ranked ascending.  The inequality audit
    behind "do 10% of customers drive 90% of revenue" — runs on the
    customer rollup, never the fact table twice.

    Exactness: revenues become integer CENTS (the decimal sum is
    exact), the rank is a per-segment window with custkey tiebreak
    (ties contribute the same Σ i·x under any permutation, so the
    tiebreak is for engine determinism, not semantics), and both
    Gini terms are exact DECIMAL(38,0) sums — the single final divide
    is double, rounded to a milli integer."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return gini_finalize(
        gini_revenue_partials(orders), cust, assume_merged=True
    )


REVENUE_GINI_SQL = """
WITH rev AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
              AS DECIMAL(38,0)) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY segment
                               ORDER BY x, o_custkey) AS i
  FROM rev),
terms AS (
  SELECT segment, COUNT(*) AS n, SUM(x * i) AS _six, SUM(x) AS _sx
  FROM ranked GROUP BY 1)
SELECT segment, CAST(n AS BIGINT) AS n_customers,
       CAST(round(1000 * (2 * CAST(_six AS DOUBLE)
                          - (n + 1) * CAST(_sx AS DOUBLE))
                  / (n * CAST(_sx AS DOUBLE)), 0) AS BIGINT)
         AS gini_milli
FROM terms
"""


def attribution_rollup(conv: DataFrame) -> DataFrame:
    """Final attribution rollup from per-purchase (first_touch,
    last_touch) rows — touch-type-cardinality sized; shared by the
    batch op and the stateful-streaming twin."""
    first = conv.groupBy(
        F.col("first_touch").alias("touch_type")
    ).agg(F.count(F.lit(1)).alias("n_first_touch"))
    last = conv.groupBy(
        F.col("last_touch").alias("touch_type")
    ).agg(F.count(F.lit(1)).alias("n_last_touch"))
    return (
        first.join(last, "touch_type", "full")
        .select(
            "touch_type",
            F.coalesce("n_first_touch", F.lit(0))
            .cast("long")
            .alias("n_first_touch"),
            F.coalesce("n_last_touch", F.lit(0))
            .cast("long")
            .alias("n_last_touch"),
        )
    )


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style conversion attribution: every `purchase` event is
    attributed to the FIRST and the LAST non-purchase touch since the
    user's previous purchase — (touch_type, n_first_touch,
    n_last_touch), with purchases that had no preceding touch bucketed
    as 'direct'.  The product-analytics staple that settles "does the
    funnel start at signup or at view".

    Shape: one per-user ordered pass assigns each event its conversion
    segment (= number of PRIOR purchases, a cumulative window), one
    (user, segment) aggregate picks the first/last touch by
    lexicographic struct min/max (exact, tie-broken on event_id), one
    join attributes each purchase to its segment's touches, and the
    final rollup is touch-type-cardinality sized.  No self-join over
    events, no per-purchase probe."""
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seg = ev.withColumn(
        "_seg",
        F.coalesce(
            F.sum((F.col("event_type") == "purchase").cast("int")).over(w),
            F.lit(0),
        ),
    )
    touches = (
        seg.filter(F.col("event_type") != "purchase")
        .groupBy("user_id", "_seg")
        .agg(
            F.min(
                F.struct("ts", "event_id", "event_type")
            ).alias("_first"),
            F.max(
                F.struct("ts", "event_id", "event_type")
            ).alias("_last"),
        )
        .select(
            "user_id",
            "_seg",
            F.col("_first.event_type").alias("first_touch"),
            F.col("_last.event_type").alias("last_touch"),
        )
    )
    conv = (
        seg.filter(F.col("event_type") == "purchase")
        .select("user_id", "_seg")
        .join(touches, ["user_id", "_seg"], "left")
        .select(
            F.coalesce("first_touch", F.lit("direct")).alias(
                "first_touch"
            ),
            F.coalesce("last_touch", F.lit("direct")).alias("last_touch"),
        )
    )
    return attribution_rollup(conv)


PURCHASE_ATTRIBUTION_SQL = """
WITH seg AS (
  SELECT *,
         COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS _seg
  FROM events),
touches AS (
  SELECT user_id, _seg,
         (MIN(struct_pack(ts := ts, eid := event_id,
                          et := event_type))).et AS first_touch,
         (MAX(struct_pack(ts := ts, eid := event_id,
                          et := event_type))).et AS last_touch
  FROM seg WHERE event_type <> 'purchase'
  GROUP BY 1, 2),
conv AS (
  SELECT COALESCE(t.first_touch, 'direct') AS first_touch,
         COALESCE(t.last_touch, 'direct') AS last_touch
  FROM seg s LEFT JOIN touches t
    ON s.user_id = t.user_id AND s._seg = t._seg
  WHERE s.event_type = 'purchase'),
f AS (SELECT first_touch AS touch_type, COUNT(*) AS n_first_touch
      FROM conv GROUP BY 1),
l AS (SELECT last_touch AS touch_type, COUNT(*) AS n_last_touch
      FROM conv GROUP BY 1)
SELECT COALESCE(f.touch_type, l.touch_type) AS touch_type,
       CAST(COALESCE(n_first_touch, 0) AS BIGINT) AS n_first_touch,
       CAST(COALESCE(n_last_touch, 0) AS BIGINT) AS n_last_touch
FROM f FULL OUTER JOIN l ON f.touch_type = l.touch_type
"""


def frequent_triples(
    spark: SparkSession,
    sf_dir: str,
    *,
    min_support: int = 2,
    k: int = 50,
) -> DataFrame:
    """A-priori level-3: frequent item TRIPLES from frequent pairs —
    (item_a < item_b < item_c, n_orders, support, rank).  This is the
    step where Agrawal–Srikant candidate generation actually earns its
    keep at scale: candidates are (x,y)⋈(x,z) over the FREQUENT-pair
    table (shared first item, y < z), then the downward-closure prune
    drops any candidate whose third sub-pair (y,z) is not itself
    frequent — only surviving candidates ever touch the basket table
    again.  On a 100 TB basket log the unpruned triple join is
    |baskets|·avg_basket³; the pruned one is bounded by the frequent-
    pair table, which min_support keeps small by construction.

    Counting pass: order-level pairs are semi-joined to frequent pairs
    first (the same closure argument applied to the data side), extended
    by one item, semi-joined to candidates, then one hash aggregate.
    All counts exact; support = n/`n_orders` rounded at 6 dp; top-k is
    round-then-rank with full lexicographic tie-break."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_orders = li.select("l_orderkey").distinct().count()
    a, b = li.alias("a"), li.alias("b")
    opairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_orderkey").alias("o"),
        F.col("a.l_partkey").alias("x"),
        F.col("b.l_partkey").alias("y"),
    ).localCheckpoint(eager=False)
    fpairs = (
        opairs.groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_support)
        .select("x", "y")
        .localCheckpoint(eager=False)
    )
    # candidate generation: shared first item + downward-closure prune
    p1, p2 = fpairs.alias("p1"), fpairs.alias("p2")
    cand = (
        p1.join(
            p2,
            (F.col("p1.x") == F.col("p2.x"))
            & (F.col("p1.y") < F.col("p2.y")),
        )
        .select(
            F.col("p1.x").alias("x"),
            F.col("p1.y").alias("y"),
            F.col("p2.y").alias("z"),
        )
        .join(
            fpairs.select(
                F.col("x").alias("y"), F.col("y").alias("z")
            ),
            ["y", "z"],
            "left_semi",
        )
    )
    # counting: frequent order-pairs extended by one larger item,
    # restricted to candidates, one aggregate
    fop = opairs.join(fpairs, ["x", "y"], "left_semi")
    trip = (
        fop.join(
            li.select(
                F.col("l_orderkey").alias("o"),
                F.col("l_partkey").alias("z"),
            ),
            "o",
        )
        .filter(F.col("z") > F.col("y"))
        .join(cand, ["x", "y", "z"], "left_semi")
        .groupBy("x", "y", "z")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .filter(F.col("n_orders") >= min_support)
    )
    scored = trip.select(
        F.col("x").cast("long").alias("item_a"),
        F.col("y").cast("long").alias("item_b"),
        F.col("z").cast("long").alias("item_c"),
        "n_orders",
        F.round(
            F.col("n_orders").cast("double") / F.lit(float(n_orders)), 6
        ).alias("support"),
    )
    top = scored.orderBy(
        F.desc("n_orders"), "item_a", "item_b", "item_c"
    ).limit(int(k))
    w = Window.orderBy(
        F.desc("n_orders"), "item_a", "item_b", "item_c"
    )
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    )


def frequent_triples_sql(*, min_support: int = 2, k: int = 50) -> str:
    """DuckDB twin of :func:`frequent_triples` — same candidate
    generation, same downward-closure prunes."""
    return f"""
WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
no AS (SELECT COUNT(DISTINCT o) AS n FROM li),
opairs AS MATERIALIZED (
  SELECT a.o, a.p AS x, b.p AS y
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
fpairs AS MATERIALIZED (
  SELECT x, y FROM opairs GROUP BY x, y
  HAVING COUNT(*) >= {min_support}),
cand AS MATERIALIZED (
  SELECT p1.x, p1.y, p2.y AS z
  FROM fpairs p1 JOIN fpairs p2
    ON p1.x = p2.x AND p1.y < p2.y
  WHERE EXISTS (SELECT 1 FROM fpairs f
                WHERE f.x = p1.y AND f.y = p2.y)),
trip AS (
  SELECT fp.x, fp.y, l.p AS z, COUNT(*) AS n_orders
  FROM (SELECT op.* FROM opairs op
        WHERE EXISTS (SELECT 1 FROM fpairs f
                      WHERE f.x = op.x AND f.y = op.y)) fp
  JOIN li l ON l.o = fp.o AND l.p > fp.y
  WHERE EXISTS (SELECT 1 FROM cand c
                WHERE c.x = fp.x AND c.y = fp.y AND c.z = l.p)
  GROUP BY fp.x, fp.y, l.p
  HAVING COUNT(*) >= {min_support})
SELECT CAST(x AS BIGINT) AS item_a, CAST(y AS BIGINT) AS item_b,
       CAST(z AS BIGINT) AS item_c,
       CAST(n_orders AS BIGINT) AS n_orders,
       round(CAST(n_orders AS DOUBLE) / CAST(no.n AS DOUBLE), 6)
         AS support,
       CAST(row_number() OVER (
         ORDER BY n_orders DESC, x, y, z) AS BIGINT) AS rank
FROM trip, no
QUALIFY rank <= {k}
"""


def events_acf(
    spark: SparkSession, sf_dir: str, *, max_lag: int = 24
) -> DataFrame:
    """Autocorrelation function of the hourly event-count series per
    type, lags 1..``max_lag`` — (event_type, lag, acf): THE diagnostic
    that justifies the forecast's seasonal lag (a daily cycle shows as
    a spike at lag 24) and tells you when residuals are white.

    Exactness: the standard estimator r(h) = Σ(x_t−x̄)(x_{t−h}−x̄) /
    Σ(x_t−x̄)² is computed with the mean CLEARED of division — multiply
    through by n²: num·n² = Σ(n·x_t − S)(n·x_{t−h} − S) and den·n² =
    Σ(n·x_t − S)², each term an exact integer and each sum an exact
    DECIMAL(38,0) (order-independent), so the single final divide is
    one double op, rounded at 6 dp — engine-identical.  The spine is
    GAP-FILLED (absent hours are zero counts, not missing rows) — ACF
    over a sparse spine would silently splice non-adjacent hours.

    Scale shape: one hash aggregate to the hourly rollup; the dense
    spine and the lag pairing live on type-cardinality × hours rows
    (the events_resample spine economics), joined once on the shifted
    integer hour key after a ``max_lag``-way literal explode."""
    ev = load_events(spark, sf_dir)
    hourly = acf_hourly_partials(ev)
    # partials grouped globally above → unique per (type, hr); skip the
    # redundant re-merge (KS/Gini re-pin lesson)
    return acf_finalize(hourly, max_lag=max_lag, assume_merged=True)


def acf_hourly_partials(batch: DataFrame) -> DataFrame:
    """Mergeable ACF state: exact (event_type, hr) → count rows for one
    batch.  Hour bucketing is a pure per-row expression (batch-local),
    so counts re-sum across any micro-batching — the hourly rollup IS
    the stream state (|types| × hours counters, never raw events)."""
    return (
        batch.groupBy(
            "event_type",
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000")
            .alias("hr"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )


def acf_finalize(
    parts: DataFrame,
    *,
    max_lag: int = 24,
    assume_merged: bool = False,
) -> DataFrame:
    """Finalize the ACF from (possibly un-merged) hourly counter rows:
    re-sum per (type, hr), gap-fill the dense spine, then the exact
    decimal num/den estimator — all spine-sized work, independent of
    stream length.  ``assume_merged=True`` is the batch fast path."""
    spark = parts.sparkSession
    hourly = parts if assume_merged else (
        parts.groupBy("event_type", "hr").agg(
            F.sum("x").cast("long").alias("x")
        )
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("_lo"), F.max("hr").alias("_hi")
    )
    spine = (
        bounds.select(
            "event_type",
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"))
            ).alias("hr"),
        )
        .join(hourly, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce("x", F.lit(0)).cast("long").alias("x"),
        )
        .localCheckpoint(eager=False)
    )
    stats = spine.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    centered = spine.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "hr",
        (F.col("x") * F.col("n") - F.col("s")).alias("d"),
        "n",
    )
    den = centered.groupBy("event_type").agg(
        # cast BEFORE the multiply (the twin does too): d² would wrap
        # int64 once n·x clears ~3e9 — exactly the 100 TB regime
        F.sum(
            F.col("d").cast("decimal(38,0)") * F.col("d")
        ).alias("_den")
    )
    lags = spark.range(1, int(max_lag) + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    a = centered.crossJoin(F.broadcast(lags)).select(
        "event_type",
        "lag",
        (F.col("hr") - F.col("lag")).alias("hr"),
        F.col("d").alias("d_t"),
    )
    paired = a.join(
        centered.select(
            "event_type", "hr", F.col("d").alias("d_lag")
        ),
        ["event_type", "hr"],
    )
    num = paired.groupBy("event_type", "lag").agg(
        F.sum(
            F.col("d_t").cast("decimal(38,0)") * F.col("d_lag")
        ).alias("_num")
    )
    return (
        num.join(den, "event_type")
        .select(
            "event_type",
            F.col("lag").cast("long").alias("lag"),
            F.when(
                F.col("_den") > 0,
                F.round(
                    F.col("_num").cast("double")
                    / F.col("_den").cast("double"),
                    6,
                ),
            ).alias("acf"),
        )
    )


def events_acf_sql(*, max_lag: int = 24) -> str:
    """DuckDB twin of :func:`events_acf`."""
    return f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, min(hr) AS _lo, max(hr) AS _hi
  FROM hourly GROUP BY 1),
grid AS (
  SELECT b.event_type, u.hr
  FROM bounds b,
       LATERAL (SELECT unnest(range(b._lo, b._hi + 1)) AS hr) u),
spine AS (
  SELECT g.event_type, g.hr, COALESCE(h.x, 0) AS x
  FROM grid g
  LEFT JOIN hourly h
    ON h.event_type = g.event_type AND h.hr = g.hr),
stats AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s
  FROM spine GROUP BY 1),
centered AS (
  SELECT sp.event_type, sp.hr, sp.x * st.n - st.s AS d
  FROM spine sp JOIN stats st ON sp.event_type = st.event_type),
den AS (
  SELECT event_type,
         SUM(CAST(d AS DECIMAL(38,0)) * d) AS _den
  FROM centered GROUP BY 1),
lags AS (SELECT unnest(range(1, {int(max_lag)} + 1)) AS lag),
num AS (
  SELECT a.event_type, l.lag,
         SUM(CAST(a.d AS DECIMAL(38,0)) * b.d) AS _num
  FROM centered a
  CROSS JOIN lags l
  JOIN centered b
    ON b.event_type = a.event_type AND b.hr = a.hr - l.lag
  GROUP BY 1, 2)
SELECT n.event_type, CAST(n.lag AS BIGINT) AS lag,
       CASE WHEN d._den > 0 THEN
         round(CAST(n._num AS DOUBLE) / CAST(d._den AS DOUBLE), 6)
       END AS acf
FROM num n JOIN den d ON n.event_type = d.event_type
"""


def events_pacf(
    spark: SparkSession, sf_dir: str, *, max_lag: int = 8
) -> DataFrame:
    """Partial autocorrelation of the hourly event-count series per
    type, lags 1..``max_lag`` — (event_type, lag, pacf_milli): the
    AR-order picker that completes :func:`events_acf` (ACF says "there
    is structure", PACF says "an AR(p) explains it — p = the last
    significant lag").  Durbin–Levinson on the ACF values:
    φ_{k,k} = (r_k − Σ_j φ_{k−1,j} r_{k−j}) / (1 − Σ_j φ_{k−1,j} r_j),
    φ_{k,j} = φ_{k−1,j} − φ_{k,k} φ_{k−1,k−j}.

    Scale shape: ALL corpus-scale work is the ACF (one hash aggregate +
    the spine economics, see events_acf); the recursion is O(max_lag²)
    flops over the (types × max_lag)-row ACF table — control-plane
    sized, run driver-side like the kmeans/LR scalars.  Determinism:
    the recursion starts from the ACF's 6-dp-rounded values (already
    engine-identical) and rounds every intermediate to 9 dp
    HALF-AWAY-FROM-ZERO (matching DuckDB's round; Python's builtin
    round is half-even and must not be used here), so the oracle's
    recursive CTE reproduces it float-for-float.  Types missing any
    lag (spine shorter than max_lag, or a constant series' NULL acf)
    are dropped on both sides."""
    k_max = int(max_lag)
    acf = events_acf(spark, sf_dir, max_lag=k_max)
    rows = acf.filter(F.col("acf").isNotNull()).collect()
    series: dict = {}
    for row in rows:
        series.setdefault(row["event_type"], {})[row["lag"]] = row["acf"]

    out = []
    for et in sorted(series):
        lags = series[et]
        if len(lags) != k_max or set(lags) != set(range(1, k_max + 1)):
            continue
        r = [lags[i] for i in range(1, k_max + 1)]
        for i, p in enumerate(durbin_levinson_pacf(r)):
            out.append((et, i + 1, int(_round_away(1000 * p, 0))))
    return spark.createDataFrame(
        out, "event_type string, lag long, pacf_milli long"
    )


def _round_away(x: float, nd: int) -> float:
    """Round half AWAY from zero at nd decimals — DuckDB's round();
    Python's builtin is half-even and would diverge on exact halves."""
    import math

    return math.copysign(math.floor(abs(x) * 10**nd + 0.5), x) / 10**nd


def durbin_levinson_pacf(r: list) -> list:
    """φ_{1,1}..φ_{K,K} from ACF values r_1..r_K — every intermediate
    rounded to 9 dp half-away so the SQL twin's recursive CTE
    reproduces it float-for-float.  Exposed for the property pin: an
    exact AR(1) ACF (r_k = ρ^k) must cut off — PACF 0 past lag 1."""
    phi = [_round_away(r[0], 9)]
    pacf = [phi[0]]
    for k in range(1, len(r)):
        num = r[k] - sum(phi[i] * r[k - 1 - i] for i in range(k))
        den = 1 - sum(phi[i] * r[i] for i in range(k))
        pkk = _round_away(num / den, 9)
        phi = [
            _round_away(phi[i] - pkk * phi[k - 1 - i], 9)
            for i in range(k)
        ] + [pkk]
        pacf.append(pkk)
    return pacf


def events_pacf_sql(*, max_lag: int = 8) -> str:
    """DuckDB twin of :func:`events_pacf` — the same Durbin–Levinson
    recursion as a recursive CTE carrying the φ list, seeded from the
    shared ACF query."""
    k = int(max_lag)
    return f"""
WITH RECURSIVE acf_rows AS (
  SELECT * FROM ({events_acf_sql(max_lag=k)}) q),
base AS (
  SELECT event_type, list(acf ORDER BY lag) AS r
  FROM acf_rows
  GROUP BY event_type
  HAVING COUNT(*) = {k} AND COUNT(acf) = {k}),
dl AS (
  SELECT event_type, r, 1 AS k, [round(r[1], 9)] AS phi FROM base
  UNION ALL
  SELECT event_type, r, k + 1,
         list_append(
           [round(phi[i] - pkk * phi[k + 1 - i], 9)
            FOR i IN range(1, k + 1)],
           pkk)
  FROM (
    SELECT event_type, r, k, phi,
      round((r[k + 1]
             - coalesce(list_sum(
                 [phi[i] * r[k + 1 - i] FOR i IN range(1, k + 1)]), 0))
            / (1 - coalesce(list_sum(
                 [phi[i] * r[i] FOR i IN range(1, k + 1)]), 0)),
            9) AS pkk
    FROM dl WHERE k < {k}))
SELECT event_type, CAST(k AS BIGINT) AS lag,
       CAST(round(1000 * phi[k], 0) AS BIGINT) AS pacf_milli
FROM dl
"""


def events_ccf(
    spark: SparkSession, sf_dir: str, *, max_lag: int = 6
) -> DataFrame:
    """Cross-correlation function between every ORDERED pair of event
    types' hourly count series, lags 0..``max_lag`` — (type_a, type_b,
    lag, ccf) where ccf at lag h is the correlation of a's counts with
    b's counts h hours LATER ("a leads b by h": a marketing touch
    spiking h hours before purchases shows as a ccf peak at h).  The
    pairwise completion of :func:`events_acf` — the diagnostic behind
    cross-series features and lead-lag attribution.

    Exactness (the ACF discipline, pairwise): both series live on the
    SAME gap-filled global hourly spine (so n is shared and absent
    hours are zeros, not splices), means are cleared by multiplying
    through n — num·n² = Σ(n·a_t − S_a)(n·b_{t+h} − S_b) with every
    term an exact integer and every sum an exact DECIMAL(38,0) — and
    the one double step is num / sqrt(den_a·den_b) (sqrt is IEEE
    correctly-rounded, identical in both engines), rounded at 6 dp.

    Scale shape: one hash aggregate to the hourly rollup; the spine,
    centering and lag pairing live on types × hours rows; the pair
    join is (types·lags)-fanout on the shifted integer hour key —
    types is small (the event taxonomy), hours is time, neither is
    corpus row count."""
    ev = load_events(spark, sf_dir)
    hourly = (
        ev.groupBy(
            "event_type",
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000")
            .alias("hr"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    bounds = hourly.agg(
        F.min("hr").alias("_lo"), F.max("hr").alias("_hi")
    )
    types = hourly.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias(
                "hr"
            ),
        )
        .join(hourly, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce("x", F.lit(0)).cast("long").alias("x"),
        )
        .localCheckpoint(eager=False)
    )
    stats = spine.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    centered = spine.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "hr",
        (F.col("x") * F.col("n") - F.col("s")).alias("d"),
    ).localCheckpoint(eager=False)
    den = centered.groupBy("event_type").agg(
        F.sum(
            F.col("d").cast("decimal(38,0)") * F.col("d")
        ).alias("_den")
    )
    lags = spark.range(0, int(max_lag) + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    a = centered.crossJoin(F.broadcast(lags)).select(
        F.col("event_type").alias("type_a"),
        "lag",
        (F.col("hr") + F.col("lag")).alias("hr"),
        F.col("d").alias("d_a"),
    )
    paired = a.join(
        centered.select(
            F.col("event_type").alias("type_b"),
            "hr",
            F.col("d").alias("d_b"),
        ),
        "hr",
    ).filter(F.col("type_a") != F.col("type_b"))
    num = paired.groupBy("type_a", "type_b", "lag").agg(
        F.sum(
            F.col("d_a").cast("decimal(38,0)") * F.col("d_b")
        ).alias("_num")
    )
    da = den.select(
        F.col("event_type").alias("type_a"), F.col("_den").alias("_da")
    )
    db = den.select(
        F.col("event_type").alias("type_b"), F.col("_den").alias("_db")
    )
    return (
        num.join(F.broadcast(da), "type_a")
        .join(F.broadcast(db), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("lag").cast("long").alias("lag"),
            F.when(
                (F.col("_da") > 0) & (F.col("_db") > 0),
                F.round(
                    F.col("_num").cast("double")
                    / F.sqrt(
                        F.col("_da").cast("double")
                        * F.col("_db").cast("double")
                    ),
                    6,
                ),
            ).alias("ccf"),
        )
    )


def events_ccf_sql(*, max_lag: int = 6) -> str:
    """DuckDB twin of :func:`events_ccf`."""
    return f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2),
bounds AS (SELECT MIN(hr) AS _lo, MAX(hr) AS _hi FROM hourly),
types AS (SELECT DISTINCT event_type FROM hourly),
-- the grid must be its OWN uncorrelated CTE: DuckDB cannot LEFT JOIN
-- after a correlated LATERAL (the events_acf lesson)
grid AS (
  SELECT t.event_type, g.hr
  FROM types t
  CROSS JOIN (
    SELECT unnest(generate_series((SELECT _lo FROM bounds),
                                  (SELECT _hi FROM bounds))) AS hr) g),
spine AS (
  SELECT grid.event_type, grid.hr, COALESCE(h.x, 0) AS x
  FROM grid LEFT JOIN hourly h USING (event_type, hr)),
stats AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS s
  FROM spine GROUP BY 1),
centered AS (
  SELECT sp.event_type, sp.hr,
         CAST(sp.x * st.n - st.s AS HUGEINT) AS d
  FROM spine sp JOIN stats st USING (event_type)),
den AS (
  SELECT event_type, SUM(d * d) AS _den FROM centered GROUP BY 1),
lags AS (SELECT unnest(generate_series(0, {int(max_lag)})) AS lag),
num AS (
  SELECT ca.event_type AS type_a, cb.event_type AS type_b, l.lag,
         SUM(ca.d * cb.d) AS _num
  FROM centered ca
  JOIN lags l ON true
  JOIN centered cb
    ON cb.hr = ca.hr + l.lag AND cb.event_type <> ca.event_type
  GROUP BY 1, 2, 3)
SELECT type_a, type_b, CAST(lag AS BIGINT) AS lag,
       CASE WHEN da._den > 0 AND db._den > 0 THEN
         round(CAST(_num AS DOUBLE)
               / sqrt(CAST(da._den AS DOUBLE) * CAST(db._den AS DOUBLE)),
               6) END AS ccf
FROM num
JOIN den da ON da.event_type = num.type_a
JOIN den db ON db.event_type = num.type_b
"""


def events_cusum_alarms(
    spark: SparkSession,
    sf_dir: str,
    *,
    slack_milli: int = 500,
    threshold_milli: int = 8000,
) -> DataFrame:
    """One-sided CUSUM change-point detection on the hourly count
    series per event type — (event_type, hr, x, cusum_milli, alarm):
    the sequential statistic S_t = max(0, S_{t−1} + (x_t − μ − k))
    that accumulates persistent upward drift and alarms when S_t > h,
    the classic "the rate changed, not just one spike" monitor
    (vs events_anomaly's pointwise z-scores).

    The recursion LOOKS inherently sequential, but the reflected
    running-minimum identity makes it one window pass:
    S_t = P_t − min_{j ≤ t} P_j with P_t = Σ_{i ≤ t}(x_i − μ − k) —
    a prefix sum minus its own running minimum, both plain cumulative
    windows over the gap-filled spine.  (Proof: subtracting the
    running min is exactly the max(0, ·) reflection at every step.)

    Exactness: μ is the series mean cleared of division by working in
    n·1000-scaled integers — term_t = 1000·n·x_t − 1000·S − n·k_milli
    with k = slack_milli/1000 — so P, its running min, and the alarm
    compare against n·threshold_milli are EXACT int64s (bound:
    1000·n·Σx < 2^63 ⇒ Σx·hours < 9·10^15 — document-scale safe);
    cusum_milli = (P − minP) div n is the only rounding.

    Scale: the per-type windows run over the hourly spine
    (types × hours), never event rows — the events_acf economics."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    term = (
        F.lit(1000) * F.col("x") * F.col("n")
        - F.lit(1000) * F.col("s")
        - F.col("n") * F.lit(int(slack_milli))
    )
    cused = (
        cusum_calibrated_spine(load_events(spark, sf_dir))
        .withColumn("_p", F.sum(term).over(w))
        .withColumn("_minp", F.least(F.min("_p").over(w), F.lit(0)))
    )
    cusum = F.col("_p") - F.col("_minp")
    return cused.select(
        "event_type",
        "hr",
        "x",
        F.expr(f"(_p - _minp) div n").cast("long").alias("cusum_milli"),
        (cusum > F.col("n") * F.lit(int(threshold_milli))).alias(
            "alarm"
        ),
    )


def cusum_calibrated_spine(ev: DataFrame) -> DataFrame:
    """The CUSUM input spine: gap-filled hourly counts per type with
    the calibration scalars (n, s) attached as columns —
    (event_type, hr, x, n, s).  Shared by the batch op and the
    streaming twin: in stream the (n, s) columns ARE the pinned
    reference-window calibration (the data-dependent global mean is a
    whole-stream extremum — the KS-midpoint impossibility — so a live
    monitor pins μ from a reference window; the harness pins it from
    the fixture so the twins share one oracle)."""
    hourly = (
        ev.groupBy(
            "event_type",
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000")
            .alias("hr"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("_lo"), F.max("hr").alias("_hi")
    )
    spine = (
        bounds.select(
            "event_type",
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias(
                "hr"
            ),
        )
        .join(hourly, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce("x", F.lit(0)).cast("long").alias("x"),
        )
    )
    stats = spine.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    return spine.join(F.broadcast(stats), "event_type")


def events_cusum_alarms_sql(
    *, slack_milli: int = 500, threshold_milli: int = 8000
) -> str:
    """DuckDB twin of :func:`events_cusum_alarms`."""
    return f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, MIN(hr) AS _lo, MAX(hr) AS _hi
  FROM hourly GROUP BY 1),
grid AS (
  SELECT b.event_type, g.hr
  FROM bounds b, LATERAL (
    SELECT unnest(generate_series(b._lo, b._hi)) AS hr) g),
spine AS (
  SELECT grid.event_type, grid.hr, COALESCE(h.x, 0) AS x
  FROM grid JOIN hourly h USING (event_type, hr)
  UNION ALL
  SELECT grid.event_type, grid.hr, 0 AS x
  FROM grid ANTI JOIN hourly h USING (event_type, hr)),
stats AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s
  FROM spine GROUP BY 1),
p AS (
  SELECT sp.event_type, sp.hr, sp.x, st.n,
         SUM(1000 * sp.x * st.n - 1000 * st.s
             - st.n * {int(slack_milli)})
           OVER (PARTITION BY sp.event_type ORDER BY sp.hr
                 ROWS UNBOUNDED PRECEDING) AS _p
  FROM spine sp JOIN stats st USING (event_type)),
c AS (
  SELECT *, LEAST(MIN(_p) OVER (PARTITION BY event_type ORDER BY hr
                                ROWS UNBOUNDED PRECEDING), 0) AS _minp
  FROM p)
SELECT event_type, CAST(hr AS BIGINT) AS hr, CAST(x AS BIGINT) AS x,
       CAST((_p - _minp) // n AS BIGINT) AS cusum_milli,
       (_p - _minp) > n * {int(threshold_milli)} AS alarm
FROM c
"""


def customer_rfm_segments(
    spark: SparkSession, sf_dir: str, *, k: int = 5
) -> DataFrame:
    """RFM segmentation — the classic customer-value grid: per customer
    Recency (days since last order, relative to the corpus' max date),
    Frequency (order count) and Monetary (exact cent revenue), each
    scored 1..k by equi-depth quantile (k=5 → quintiles, score k =
    most recent / most frequent / highest spend), rolled up to the
    (r_score, f_score, m_score) grid: (..., n_customers,
    revenue_cents) — ≤ k³ rows.

    Determinism: scores use the equi-depth integer rule
    (rank−1)·least(k, n) div n with custkey tiebreaks (the clamped
    rule from equidepth_histogram, so tiny corpora still produce a
    contiguous score prefix); revenue is an exact decimal cent sum.

    Scale: one orders aggregate to the per-customer triple, three
    rank windows over |customers| (single-task per window at the
    ungrouped extreme — segment-partition them at true 100 TB scale,
    or sample-quantile the cut points; the exact form is the oracle
    anchor), one ≤k³ rollup."""
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("_last"),
        F.count(F.lit(1)).cast("long").alias("f"),
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("decimal(38,0)")
        ).alias("m_cents"),
    )
    maxd = per_cust.agg(F.max("_last").alias("_gmax"))
    base = per_cust.crossJoin(F.broadcast(maxd)).select(
        "o_custkey",
        F.datediff(F.col("_gmax"), F.col("_last"))
        .cast("long")
        .alias("r_days"),
        "f",
        "m_cents",
    )

    # three rank passes (windows over |customers|); recency ranks DESC
    # so bucket 0 = stalest and score k = most recent
    n_all = F.count(F.lit(1)).over(Window.partitionBy())
    wr = Window.orderBy(F.desc("r_days"), F.asc("o_custkey"))
    wf = Window.orderBy(F.asc("f"), F.asc("o_custkey"))
    wm = Window.orderBy(F.asc("m_cents"), F.asc("o_custkey"))
    ranked = (
        base.withColumn("_n", n_all)
        .withColumn("_rr", F.row_number().over(wr))
        .withColumn("_rf", F.row_number().over(wf))
        .withColumn("_rm", F.row_number().over(wm))
    )
    kk = int(k)
    sc = lambda rk: F.expr(  # noqa: E731
        f"(CAST({rk} AS BIGINT) - 1) * least({kk}, _n) div _n + 1"
    ).cast("long")
    return (
        ranked.select(
            sc("_rr").alias("r_score"),
            sc("_rf").alias("f_score"),
            sc("_rm").alias("m_score"),
            "m_cents",
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("m_cents").cast("decimal(38,0)").cast("double").alias(
                "revenue_cents"
            ),
        )
    )


def customer_rfm_segments_sql(*, k: int = 5) -> str:
    """DuckDB twin of :func:`customer_rfm_segments`."""
    kk = int(k)
    return f"""
WITH per_cust AS (
  SELECT o_custkey, MAX(o_orderdate) AS _last,
         CAST(COUNT(*) AS BIGINT) AS f,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
              AS HUGEINT) AS m_cents
  FROM orders GROUP BY 1),
base AS (
  SELECT o_custkey,
         date_diff('day', _last, (SELECT MAX(_last) FROM per_cust))
           AS r_days,
         f, m_cents
  FROM per_cust),
ranked AS (
  SELECT *,
         COUNT(*) OVER () AS _n,
         row_number() OVER (ORDER BY r_days DESC, o_custkey) AS _rr,
         row_number() OVER (ORDER BY f, o_custkey) AS _rf,
         row_number() OVER (ORDER BY m_cents, o_custkey) AS _rm
  FROM base)
SELECT CAST((_rr - 1) * least({kk}, _n) // _n + 1 AS BIGINT) AS r_score,
       CAST((_rf - 1) * least({kk}, _n) // _n + 1 AS BIGINT) AS f_score,
       CAST((_rm - 1) * least({kk}, _n) // _n + 1 AS BIGINT) AS m_score,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(CAST(SUM(m_cents) AS HUGEINT) AS DOUBLE) AS revenue_cents
FROM ranked
GROUP BY 1, 2, 3
"""


def funnel_latency(
    spark: SparkSession,
    sf_dir: str,
    *,
    steps: tuple = ("signup", "click", "purchase"),
) -> DataFrame:
    """Step-to-step conversion latency for :func:`event_funnel`'s
    strict-order funnel: per converting user, the time from the
    previous step's FIRST occurrence to this step's first occurrence
    after it; per step pair, the converting-user count and p50/p90/max
    latency in seconds — the "funnel is fine but slow at checkout"
    diagnostic the stage counts alone can't show.

    Exactness: latencies are exact integer micros divided once into
    double seconds; Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` both linear-interpolate over the identical value
    set (the grouped_quantiles convention), 6-dp rounded.  Shape: ONE
    per-user conditional-min aggregate (single shuffle — the
    event_funnel plan), then a |pairs|-group exact percentile over
    converting users; at 100 TB swap the exact percentile for the
    content-hash-sampled grouped_quantiles form."""
    ev = load_events(spark, sf_dir)
    s1n, s2n, s3n = steps
    per_user = funnel_first_partials(ev, steps=steps)
    return funnel_latency_finalize(per_user, steps=steps)


def funnel_latency_finalize(
    per_user: DataFrame,
    *,
    steps: tuple = ("signup", "click", "purchase"),
) -> DataFrame:
    """The latency-percentile tail of :func:`funnel_latency` over the
    per-user first-occurrence state — shared with the live twin."""
    s1n, s2n, s3n = steps
    s1 = F.col("t1").isNotNull()
    s2 = s1 & F.col("t2").isNotNull() & (F.col("t2") > F.col("t1"))
    s3 = s2 & F.col("t3").isNotNull() & (F.col("t3") > F.col("t2"))

    def us(c):
        return F.expr(f"unix_micros(cast({c} as timestamp))")

    lat12 = F.when(s2, (us("t2") - us("t1")).cast("double") / F.lit(1e6))
    lat23 = F.when(s3, (us("t3") - us("t2")).cast("double") / F.lit(1e6))
    pairs = per_user.select(
        F.lit(f"{s1n}>{s2n}").alias("step_pair"), lat12.alias("lat")
    ).unionByName(
        per_user.select(
            F.lit(f"{s2n}>{s3n}").alias("step_pair"), lat23.alias("lat")
        )
    ).filter(F.col("lat").isNotNull())
    return pairs.groupBy("step_pair").agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.expr("percentile(lat, 0.5)"), 6).alias("p50_s"),
        F.round(F.expr("percentile(lat, 0.9)"), 6).alias("p90_s"),
        F.round(F.max("lat"), 6).alias("max_s"),
    )


def funnel_latency_sql(
    *, steps: tuple = ("signup", "click", "purchase")
) -> str:
    """DuckDB twin of :func:`funnel_latency`."""
    s1n, s2n, s3n = steps
    return f"""
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = '{s1n}' THEN ts END) AS t1,
         MIN(CASE WHEN event_type = '{s2n}' THEN ts END) AS t2,
         MIN(CASE WHEN event_type = '{s3n}' THEN ts END) AS t3
  FROM events GROUP BY user_id),
lats AS (
  SELECT '{s1n}>{s2n}' AS step_pair,
         CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL AND t2 > t1
              THEN CAST(epoch_us(t2) - epoch_us(t1) AS DOUBLE) / 1e6
         END AS lat
  FROM per_user
  UNION ALL
  SELECT '{s2n}>{s3n}',
         CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL AND t2 > t1
                   AND t3 IS NOT NULL AND t3 > t2
              THEN CAST(epoch_us(t3) - epoch_us(t2) AS DOUBLE) / 1e6
         END
  FROM per_user)
SELECT step_pair, CAST(COUNT(*) AS BIGINT) AS n_converted,
       round(quantile_cont(lat, CAST(0.5 AS DOUBLE)), 6) AS p50_s,
       round(quantile_cont(lat, CAST(0.9 AS DOUBLE)), 6) AS p90_s,
       round(MAX(lat), 6) AS max_s
FROM lats WHERE lat IS NOT NULL
GROUP BY step_pair
"""


def quantile_drift_report(
    spark: SparkSession, sf_dir: str, *, split_day: int = 15
) -> DataFrame:
    """The interpretable companion to the drift triad: per event type,
    the p50/p90 of the value distribution in each period and the
    quantile SHIFTS in value units — "p90 latency moved +230 ms" is
    the sentence PSI/KS/W₁ scores can't say.  Sidedness is the PSI
    calendar rule.

    Exactness: Spark ``percentile`` ≡ DuckDB ``quantile_cont`` over
    the identical value sets (the grouped_quantiles convention), each
    6-dp rounded; deltas subtract the ROUNDED quantiles and re-round,
    so both engines derive them from identical operands.  Shape: one
    (type, side) percentile aggregate — at 100 TB swap in the
    content-hash-sampled grouped_quantiles form."""
    ev = load_events(spark, sf_dir)
    period_new = F.dayofmonth("ts") > split_day
    sided = ev.select(
        "event_type", "value", period_new.alias("is_new")
    )
    per = sided.groupBy("event_type", "is_new").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
    )
    old = per.filter(~F.col("is_new")).select(
        "event_type",
        F.col("n").alias("n_old"),
        F.col("p50").alias("p50_old"),
        F.col("p90").alias("p90_old"),
    )
    new = per.filter(F.col("is_new")).select(
        "event_type",
        F.col("n").alias("n_new"),
        F.col("p50").alias("p50_new"),
        F.col("p90").alias("p90_new"),
    )
    return old.join(new, "event_type", "full").select(
        "event_type",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
        "p50_old",
        "p50_new",
        F.round(F.col("p50_new") - F.col("p50_old"), 6).alias("d_p50"),
        "p90_old",
        "p90_new",
        F.round(F.col("p90_new") - F.col("p90_old"), 6).alias("d_p90"),
    )


def quantile_drift_report_sql(*, split_day: int = 15) -> str:
    """DuckDB twin of :func:`quantile_drift_report`."""
    return f"""
WITH per AS (
  SELECT event_type, (day(ts) > {split_day}) AS is_new,
         CAST(COUNT(*) AS BIGINT) AS n,
         round(quantile_cont(value, CAST(0.5 AS DOUBLE)), 6) AS p50,
         round(quantile_cont(value, CAST(0.9 AS DOUBLE)), 6) AS p90
  FROM events GROUP BY 1, 2),
o AS (SELECT event_type, n AS n_old, p50 AS p50_old, p90 AS p90_old
      FROM per WHERE NOT is_new),
n AS (SELECT event_type, n AS n_new, p50 AS p50_new, p90 AS p90_new
      FROM per WHERE is_new)
SELECT COALESCE(o.event_type, n.event_type) AS event_type,
       COALESCE(o.n_old, 0) AS n_old,
       COALESCE(n.n_new, 0) AS n_new,
       o.p50_old, n.p50_new,
       round(n.p50_new - o.p50_old, 6) AS d_p50,
       o.p90_old, n.p90_new,
       round(n.p90_new - o.p90_old, 6) AS d_p90
FROM o FULL JOIN n ON o.event_type = n.event_type
"""


def trimmed_stats(
    spark: SparkSession,
    sf_dir: str,
    *,
    lo: float = 0.1,
    hi: float = 0.9,
) -> DataFrame:
    """Robust per-type value statistics: the 10% TRIMMED mean (drop
    rows outside [p10, p90]) and the WINSORIZED mean (clamp them to the
    thresholds) next to the raw mean — the pair that tells heavy-tail
    contamination ("raw >> trimmed") apart from a genuine level shift
    ("all three moved").  The robust complement to events_robust_
    anomaly's median/MAD scoring, at the per-type report grain.

    Exactness: every value is 6-dp-rounded FIRST (round-before-rank),
    thresholds are 6-dp-rounded percentiles of those rounded values
    (percentile ≡ quantile_cont, the grouped_quantiles convention),
    means are decimal sums with one final divide — no float-
    accumulation order anywhere.  The whole report is therefore a pure
    function of the (type, value) COUNTER SPINE, which is what the
    live twin maintains (the streaming_equidepth discipline: order
    statistics live at finalize over counters, never over history)."""
    ev = load_events(spark, sf_dir)
    return trimmed_stats_finalize(
        trimmed_value_partials(ev), lo=lo, hi=hi, assume_merged=True
    )


def trimmed_value_partials(batch: DataFrame) -> DataFrame:
    """Mergeable state for :func:`trimmed_stats`: exact (event_type,
    6-dp value) → count rows — the value-spine counter lattice (counts
    re-sum under any micro-batching; state is |types × distinct
    rounded values|, a rollup, never the raw stream)."""
    return batch.groupBy(
        "event_type", F.round(F.col("value"), 6).alias("v")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def trimmed_stats_finalize(
    parts: DataFrame,
    *,
    lo: float = 0.1,
    hi: float = 0.9,
    assume_merged: bool = False,
) -> DataFrame:
    """The report tail over the value-count spine — shared with the
    live twin, whose state IS the spine.  ``percentile(v, p, cnt)``
    (Catalyst's frequency-weighted exact percentile) reproduces the
    unweighted percentile over the expanded multiset bit-for-bit."""
    merged = parts if assume_merged else (
        parts.groupBy("event_type", "v").agg(
            F.sum("cnt").cast("long").alias("cnt")
        )
    )
    thr = merged.groupBy("event_type").agg(
        F.round(F.expr(f"percentile(v, {lo!r}, cnt)"), 6).alias("p_lo"),
        F.round(F.expr(f"percentile(v, {hi!r}, cnt)"), 6).alias("p_hi"),
    )
    j = merged.join(F.broadcast(thr), "event_type")
    dec = "decimal(28,6)"
    clamped = F.least(F.greatest(F.col("v"), F.col("p_lo")), F.col("p_hi"))
    inside = (F.col("v") >= F.col("p_lo")) & (F.col("v") <= F.col("p_hi"))
    agg = j.groupBy("event_type").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.max("p_lo").alias("p_lo"),
        F.max("p_hi").alias("p_hi"),
        F.sum(F.col("v").cast(dec) * F.col("cnt")).alias("_s_raw"),
        F.sum(
            F.when(inside, F.col("v").cast(dec) * F.col("cnt"))
        ).alias("_s_trim"),
        F.sum(F.when(inside, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.sum(clamped.cast(dec) * F.col("cnt")).alias("_s_wins"),
    )
    return agg.select(
        "event_type",
        "n",
        "n_kept",
        "p_lo",
        "p_hi",
        F.round(F.col("_s_raw") / F.col("n"), 6)
        .cast("double")
        .alias("mean_raw"),
        F.round(F.col("_s_trim") / F.col("n_kept"), 6)
        .cast("double")
        .alias("mean_trimmed"),
        F.round(F.col("_s_wins") / F.col("n"), 6)
        .cast("double")
        .alias("mean_winsorized"),
    )


def trimmed_stats_sql(
    table: str = "events", *, lo: float = 0.1, hi: float = 0.9
) -> str:
    """DuckDB twin of :func:`trimmed_stats` — thresholds over the same
    6-dp-rounded values the spine stores (quantile_cont over raw rows
    of rounded values ≡ Spark's frequency-weighted percentile over the
    spine)."""
    return f"""
WITH thr AS (
  SELECT event_type,
         round(quantile_cont(round(value, 6),
                             CAST({lo!r} AS DOUBLE)), 6) AS p_lo,
         round(quantile_cont(round(value, 6),
                             CAST({hi!r} AS DOUBLE)), 6) AS p_hi
  FROM {table} GROUP BY event_type),
v AS (
  SELECT e.event_type, round(e.value, 6) AS v, t.p_lo, t.p_hi
  FROM {table} e JOIN thr t USING (event_type))
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN v BETWEEN p_lo AND p_hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       MAX(p_lo) AS p_lo,
       MAX(p_hi) AS p_hi,
       CAST(round(SUM(CAST(v AS DECIMAL(28,6))) / COUNT(*), 6)
            AS DOUBLE) AS mean_raw,
       CAST(round(SUM(CASE WHEN v BETWEEN p_lo AND p_hi
                           THEN CAST(v AS DECIMAL(28,6)) END)
                  / SUM(CASE WHEN v BETWEEN p_lo AND p_hi
                             THEN 1 ELSE 0 END), 6)
            AS DOUBLE) AS mean_trimmed,
       CAST(round(SUM(CAST(LEAST(GREATEST(v, p_lo), p_hi)
                           AS DECIMAL(28,6))) / COUNT(*), 6)
            AS DOUBLE) AS mean_winsorized
FROM v
GROUP BY event_type
"""


def degree_powerlaw(
    spark: SparkSession,
    sf_dir: str,
    *,
    d_mins: tuple = (2, 4, 8),
) -> DataFrame:
    """Hill estimator of the degree-distribution tail exponent — the
    one-number answer to "is this graph scale-free enough to need the
    hub-cap / salting treatments this repo applies everywhere":
    alpha(d_min) = 1 + n / Σ ln(d_i / d_min) over degrees ≥ d_min,
    swept across d_min values (the standard robustness check — a
    stable alpha across cutoffs is the power-law signature; degrees
    here = orders per customer).

    Exactness: each ln term is 9-dp-rounded then decimal-summed (the
    corpus-LM ln discipline); one divide + 6-dp round per sweep row.
    Shape: one count aggregate (|customers| rows) then a sweep-sized
    conditional rollup — the degree table is the only corpus-scale
    object."""
    orders = load(spark, sf_dir, "orders")
    return powerlaw_finalize(
        degree_partials(orders), d_mins=d_mins, assume_merged=True
    )


def degree_partials(batch: DataFrame) -> DataFrame:
    """Mergeable state for :func:`degree_powerlaw`: per-customer order
    counts — the entity-rollup lattice (counts re-sum under any
    micro-batching; state is |customers|, never order history)."""
    return batch.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )


def powerlaw_finalize(
    deg: DataFrame,
    *,
    d_mins: tuple = (2, 4, 8),
    assume_merged: bool = False,
) -> DataFrame:
    """The Hill sweep over the degree table — shared with the live
    twin, whose state IS that table."""
    if not assume_merged:
        deg = deg.groupBy("o_custkey").agg(
            F.sum("d").cast("long").alias("d")
        )
    outs = []
    for dm in d_mins:
        t = F.round(
            F.log(F.col("d").cast("double") / F.lit(float(dm))), 9
        ).cast("decimal(28,9)")
        outs.append(
            deg.filter(F.col("d") >= dm).agg(
                F.lit(int(dm)).cast("long").alias("d_min"),
                F.count(F.lit(1)).cast("long").alias("n_tail"),
                F.round(
                    F.lit(1.0)
                    + F.count(F.lit(1)) / F.sum(t).cast("double"),
                    6,
                ).alias("alpha"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def degree_powerlaw_sql(*, d_mins: tuple = (2, 4, 8)) -> str:
    """DuckDB twin of :func:`degree_powerlaw`."""
    arms = []
    for dm in d_mins:
        arms.append(f"""
SELECT CAST({dm} AS BIGINT) AS d_min,
       CAST(COUNT(*) AS BIGINT) AS n_tail,
       round(1 + COUNT(*) / CAST(SUM(CAST(round(
           ln(CAST(d AS DOUBLE) / CAST({dm} AS DOUBLE)), 9)
           AS DECIMAL(28,9))) AS DOUBLE), 6) AS alpha
FROM deg WHERE d >= {dm}""")
    body = "\nUNION ALL\n".join(arms)
    return f"""
WITH deg AS (
  SELECT o_custkey, COUNT(*) AS d FROM orders GROUP BY o_custkey)
{body}
"""
