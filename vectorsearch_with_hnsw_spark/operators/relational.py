"""Relational operator surface over the TPC-H-ish testdata.

The reference has no relational algebra (SURVEY.md §2B) — this module is
the engine's standard scan/filter/join/agg/window/top-k surface, written
so Catalyst gets full freedom: filters next to scans (pushdown), explicit
``broadcast()`` on dimension tables, decimal-exact money arithmetic
(bit-stable across engines), AQE handles skew.

Money columns are cast to DECIMAL before summing and back to DOUBLE after
— exact integer-scaled arithmetic means the result is bit-identical
regardless of aggregation order (crucial both for the DuckDB oracle and
for run-to-run determinism on a real cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from ..cache import persist_tracked

DEC = "decimal(18,2)"


def _dsum(col):
    """Order-independent (exact decimal) sum, surfaced as double."""
    return F.sum(F.col(col).cast(DEC)).cast("double")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter -> partial-agg -> final agg.
    One shuffle on the (tiny-cardinality) grouping key; the shipdate
    filter and 6-column projection both push into the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = (
        F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_customers_by_revenue(spark: SparkSession, sf_dir: str, n: int = 10) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem revenue top-N. Fact-fact join shuffles
    on orderkey; the customer dimension is broadcast; global top-N plans
    as TakeOrderedAndProject (no full sort)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    per_order = li.groupBy("l_orderkey").agg(F.sum(revenue).alias("order_rev"))
    joined = (
        orders.join(per_order, orders.o_orderkey == per_order.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum("order_rev").cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    )
    return joined.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(n)


def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join: region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem.
    All three dimension tables broadcast; only the orders⋈lineitem join
    shuffles."""
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    cust = F.broadcast(load_table(spark, sf_dir, "customer"))
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("r_name")
    )


def customer_order_rank(spark: SparkSession, sf_dir: str, topn: int = 3) -> DataFrame:
    """Window ranking: each customer's top-N orders by totalprice — the
    'rank within group, keep <= N' shape the reference uses for result
    truncation and degree caps (SURVEY.md §2B windows)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topn)
        .select("o_custkey", "o_orderkey", F.col("o_totalprice").alias("totalprice"), "rnk")
        .orderBy("o_custkey", "rnk")
    )


def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window aggregation over the events stream table —
    the batch twin of the Structured Streaming window query
    (streaming/events.py uses the identical plan on readStream)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").getField("start").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .drop("approx_users")  # approx sketch is demoed in tests; exact cols only for the oracle
        .orderBy("bucket", "event_type")
    )


def pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via ROLLUP (grouping sets): per
    (returnflag, linestatus), per returnflag subtotal, and grand total in
    one pass — Spark computes all grouping levels from a single shuffle.
    NULL grouping keys are surfaced as 'ALL' (the flag domains are 1-char
    codes, so the sentinel cannot collide)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "sum_base_price",
            "count_order",
        )
        .orderBy("returnflag", "linestatus")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    payload_cols: list[str],
    order_col: str,
    out_prefix: str = "asof_",
) -> DataFrame:
    """Generic as-of join: attach to each left row the most recent right
    row of the same ``key`` with right ts at-or-before the left ts.

    Spark has no native as-of join; the scalable formulation is
    union-with-tag + a running ``last(..., ignorenulls)`` window — no
    range-join explosion, no per-row lookups, so the plan survives 100 TB
    (contrast a theta-join on ts <= ts, which Spark would execute as a
    broadcast nested loop). Shuffles: one on (key, ts) to dedupe the
    (smaller) right side, one on key for the carry window; zero join
    operators in the plan. Right rows are deduped to one per (key, ts)
    (max ``order_col``) so results are deterministic under ties; a right
    row at exactly the left ts counts (tag orders right rows first).

    Output = every left column + ``out_prefix``-ed right ts/payloads
    (NULL when no right row precedes — a left as-of join)."""
    w_dd = Window.partitionBy(key, ts_col).orderBy(F.col(order_col).desc())
    r_cols = [F.col(ts_col).alias(f"{out_prefix}{ts_col}")] + [
        F.col(c).alias(f"{out_prefix}{c}") for c in payload_cols
    ]
    out_names = [f"{out_prefix}{ts_col}"] + [f"{out_prefix}{c}" for c in payload_cols]
    left_names = left.columns
    r = (
        right.withColumn("_rn", F.row_number().over(w_dd))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(key),
            F.col(ts_col),
            F.lit(0).alias("_tag"),
            F.lit(None).cast("long").alias("_ord"),
            *r_cols,
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_names if c not in (key, ts_col)],
        )
    )
    l = left.select(
        F.col(key),
        F.col(ts_col),
        F.lit(1).alias("_tag"),
        F.col(order_col).cast("long").alias("_ord"),
        *[F.lit(None).cast(right.schema[ts_col].dataType).alias(f"{out_prefix}{ts_col}")],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{out_prefix}{c}") for c in payload_cols],
        *[F.col(c) for c in left_names if c not in (key, ts_col)],
    )
    w_carry = Window.partitionBy(key).orderBy(ts_col, "_tag", "_ord").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carried = r.unionByName(l)
    for c in out_names:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w_carry))
    return carried.filter(F.col("_tag") == 1).select(*left_names, *out_names)


def events_asof_purchase(
    spark: SparkSession,
    sf_dir: str,
    left_type: str = "click",
    right_type: str = "purchase",
) -> DataFrame:
    """As-of join over events: each ``left_type`` event gets the most
    recent ``right_type`` event of the same user at-or-before its
    timestamp (see ``asof_join`` for the plan shape)."""
    ev = load_table(spark, sf_dir, "events")
    joined = asof_join(
        left=ev.filter(F.col("event_type") == F.lit(left_type)).select(
            "user_id", "event_id", "ts", "value"
        ),
        right=ev.filter(F.col("event_type") == F.lit(right_type)).select(
            "user_id", "ts", "value", "event_id"
        ),
        key="user_id",
        ts_col="ts",
        payload_cols=["value"],
        order_col="event_id",
        out_prefix="last_purchase_",
    )
    return joined.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        "last_purchase_ts",
        "last_purchase_value",
    )


def brand_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by part brand x supplier nation: the fact table joins two
    part/supplier dimensions plus nation, all broadcast — the only
    shuffle is the final small-cardinality aggregation."""
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    supp = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .groupBy("p_brand", F.col("n_name").alias("supp_nation"))
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("p_brand", "supp_nation")
    )


def view_days_without_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-difference / anti-join surface: (user, day) pairs with at
    least one 'view' but no 'purchase' that day. Both sides aggregate to
    distinct pairs before the anti-join, so the shuffle carries only the
    deduped keys."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date(F.col("ts")).alias("day")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", day)
        .agg(F.count(F.lit(1)).alias("n_views"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase").select("user_id", day).distinct()
    )
    return views.join(purchases, ["user_id", "day"], "left_anti").orderBy(
        "user_id", "day"
    )


def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: extract a field from the JSON
    props string, aggregate per event_type. JSON path evaluation happens
    JVM-side (get_json_object) — no UDF."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def events_sessionize(spark: SparkSession, sf_dir: str, gap_sec: int = 1800) -> DataFrame:
    """Gap-based sessionization via window functions: a new session starts
    when the gap to the previous event of the same user exceeds
    ``gap_sec``. One shuffle on user_id; this is the batch twin of the
    stateful streaming sessionizer."""
    ev = load_table(spark, sf_dir, "events")
    # exact integer microseconds — bit-identical across engines, ANSI-safe
    epoch_us = F.unix_micros(F.col("ts"))
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            (epoch_us - F.lag(epoch_us).over(w_user)) > F.lit(gap_sec * 1_000_000), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    with_sid = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback_sec: int = 3600,
) -> DataFrame:
    """Interval (range) join: pair each left row with the right rows of
    the same ``key`` whose timestamp falls in
    ``(left_ts - lookback_sec, left_ts]``.

    Spark executes a bare theta-join on timestamps as a broadcast
    nested loop — quadratic and unbroadcastable at scale. The scalable
    shape is EQUI-join on the key (hash shuffle both sides, AQE handles
    hot users) with the range predicate applied as a join residual; for
    key-less workloads, bucket both sides to epoch//lookback buckets and
    join on (bucket, bucket±1). Here every pairing is already key-scoped,
    so the equi-join IS the pruning."""
    l = left.select(
        F.col(key), F.col(left_ts).alias("_lts"), *[c for c in left.columns if c not in (key, left_ts)]
    )
    r = right.select(
        F.col(key), F.col(right_ts).alias("_rts"), *[c for c in right.columns if c not in (key, right_ts)]
    )
    lo = F.col("_lts") - F.expr(f"INTERVAL {lookback_sec} SECONDS")
    joined = l.join(r, key).filter((F.col("_rts") > lo) & (F.col("_rts") <= F.col("_lts")))
    return joined.withColumnRenamed("_lts", left_ts + "_left").withColumnRenamed("_rts", right_ts + "_right")


def purchase_view_window(
    spark: SparkSession, sf_dir: str, lookback_sec: int = 3600
) -> DataFrame:
    """Range-join query: for each purchase event, how many views the same
    user made in the preceding hour (inclusive of the purchase instant),
    and their decimal-exact total value."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    j = interval_join(purchases, views, key="user_id", lookback_sec=lookback_sec)
    return (
        j.groupBy("purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_views"),
            F.sum(F.col("view_value").cast(DEC)).cast("double").alias("views_value"),
        )
        .select("purchase_id", "n_views", "views_value")
    )


def quantity_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order statistics per return flag: discrete percentiles
    (PERCENTILE_DISC picks an actual data value — no interpolation
    arithmetic to diverge between engines). One shuffle with map-side
    partial aggregation; at 100 TB exact percentiles require the sort
    within each group, which Spark distributes per-key."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_stats")
    return spark.sql("""
        SELECT l_returnflag, COUNT(*) AS n,
          MIN(l_quantity) AS min_qty,
          percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS p50_qty,
          percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_qty,
          MAX(l_quantity) AS max_qty
        FROM _li_stats GROUP BY l_returnflag
    """)


def customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer over order time — the running-
    window frame (rows unbounded-preceding..current). One shuffle on
    custkey; decimal-exact accumulation so every prefix sum is
    order-independent-exact and engine-identical."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_total"),
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        ).cast("int").alias("order_seq"),
    )


def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped cross-nation volume: revenue flowing from
    supplier nation to customer nation. Two broadcast copies of the
    nation dim (aliased), broadcast supplier+customer dims; the ONE big
    shuffle is lineitem⋈orders on orderkey (at scale: co-locate by
    bucketing both on orderkey — plans/bucketing.py — and it vanishes
    too)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n_s = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n_c = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    disc_price = (
        F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.sum(disc_price).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def order_priority_check(spark: SparkSession, sf_dir: str, year: str = "1996") -> DataFrame:
    """TPC-H Q4-shaped EXISTS semi-join: orders placed in one year that
    had at least one line item shipped more than 90 days after the order
    date, counted per priority. The EXISTS decorrelates to a LEFT SEMI
    join on orderkey (Spark never materializes the multiplicity of the
    probe side); the orderdate filter pushes into the orders scan and
    prunes before the shuffle."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{int(year) + 1}-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped distribution: how many customers placed exactly N
    orders, including N=0 via a LEFT OUTER join (count(o_orderkey) skips
    the NULLs an unmatched customer produces). Two shuffles — custkey for
    the join+count, then the tiny count-of-counts re-agg."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    # aggregate orders BEFORE the outer join: the custkey shuffle then
    # carries one (custkey, count) row per customer after map-side
    # combine, not every raw order row
    per_cust_orders = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    per_cust = cust.join(
        per_cust_orders, cust.c_custkey == per_cust_orders.o_custkey, "left_outer"
    ).select(F.coalesce(F.col("n_orders"), F.lit(0).cast("long")).alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.col("c_count").desc())
    )


def large_orders(spark: SparkSession, sf_dir: str, min_qty: int = 300) -> DataFrame:
    """TPC-H Q18-shaped HAVING: orders whose total line-item quantity
    exceeds ``min_qty``, with customer and order detail. The HAVING is a
    filter over the per-order aggregate — it runs on the reduced relation
    (one row per order), so only qualifying orderkeys reach the joins;
    both joins then broadcast the (tiny) filtered aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    oq = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_tq"))
        .filter(F.col("_tq") > F.lit(min_qty).cast(DEC))
        .select("l_orderkey", F.col("_tq").cast("double").alias("total_qty"))
    )
    return (
        orders.join(F.broadcast(oq), orders.o_orderkey == oq.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
    )


def priority_linestatus_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped conditional aggregation (manual pivot): per line
    status, how many line items belong to high- vs low-priority orders.
    The CASE WHEN runs inside the aggregate — one join shuffle on
    orderkey, one tiny agg; no second pass per pivot column."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linestatus")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, F.lit(1)).otherwise(F.lit(0))).alias("high_count"),
            F.sum(F.when(~high, F.lit(1)).otherwise(F.lit(0))).alias("low_count"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("l_linestatus")
    )


def brand_supplier_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped COUNT DISTINCT: distinct suppliers per
    (brand, size). Spark plans distinct-aggregates as a two-stage expand
    (dedupe on group+supplier, then count) — the dedupe happens map-side
    first, so the shuffle carries unique triples, not raw lineitems."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = F.broadcast(load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("p_brand", "p_size")
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated scalar subquery, decorrelated: line
    items with quantity below 20% of their part's average, grouped by
    brand. The per-part average is a separate aggregate joined back on
    partkey — the classic decorrelation Catalyst cannot do for you when
    you write a per-row subquery, expressed directly as the efficient
    plan. The average divides exact decimal sums so the threshold is
    bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(load_table(spark, sf_dir, "part").select("p_partkey", "p_brand"))
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("sq"),
        F.count(F.lit(1)).alias("n"),
    )
    avg_qty = F.col("sq").cast("double") / F.col("n").cast("double")
    return (
        li.join(per_part, li.l_partkey == F.col("pp_key"))
        .filter(F.col("l_quantity") < F.lit(0.2) * avg_qty)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            _dsum("l_extendedprice").alias("small_revenue"),
        )
        .orderBy("p_brand")
    )


def wealthy_inactive_customers(
    spark: SparkSession, sf_dir: str, since: str = "2000-01-01"
) -> DataFrame:
    """TPC-H Q22-shaped scalar subquery + anti-join: customers whose
    balance exceeds the global positive-balance average and who placed no
    order since ``since``, per nation. The scalar average is a 1-row
    aggregate cross-joined (broadcast) onto every customer row; the
    "no recent orders" NOT EXISTS is a LEFT ANTI join against the
    deduped recent-customer keys."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_row = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    recent = (
        orders.filter(F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.crossJoin(F.broadcast(avg_row))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum("c_acctbal").alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


def user_day_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join surface: per (user, day), view totals next to
    purchase totals, keeping days with only one side of activity. Both
    sides pre-aggregate to one row per key, so the outer join shuffles
    deduped keys only; Spark's USING-column join coalesces the keys."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date(F.col("ts")).alias("day")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", day)
        .agg(
            F.count(F.lit(1)).alias("n_views"),
            F.sum(F.col("value").cast(DEC)).alias("_vv"),
        )
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", day)
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast(DEC)).alias("_pv"),
        )
    )
    zero = F.lit(0).cast("long")
    zdec = F.lit(0).cast(DEC)
    return views.join(purchases, ["user_id", "day"], "full_outer").select(
        "user_id",
        "day",
        F.coalesce(F.col("n_views"), zero).alias("n_views"),
        F.coalesce(F.col("n_purchases"), zero).alias("n_purchases"),
        F.coalesce(F.col("_vv"), zdec).cast("double").alias("views_value"),
        F.coalesce(F.col("_pv"), zdec).cast("double").alias("purchases_value"),
    )


def viewing_purchasers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set-op surface: users who both viewed and purchased.
    Spark plans INTERSECT as a distinct-aggregated semi join — both
    inputs dedupe map-side before the shuffle."""
    ev = load_table(spark, sf_dir, "events")
    viewers = ev.filter(F.col("event_type") == "view").select("user_id")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return viewers.intersect(buyers)


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped chain with a CROSS-dimension equality: revenue
    where the supplier and the ordering customer share a nation, per
    nation. The c_nationkey = s_nationkey constraint is a residual on
    dimensions joined from OPPOSITE sides of the fact chain — the shape
    that punishes bad join orders. Both dims broadcast; the one big
    shuffle stays lineitem⋈orders."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = F.broadcast(load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    supp = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    disc_price = (
        F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(disc_price).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped LIKE + conditional ratio: per order-month, the
    share of revenue from promo-branded parts. The LIKE 'PROMO%' prefix
    compiles to a StartsWith pushed filter on the (broadcast) part dim;
    numerator and denominator come from ONE conditional aggregation
    pass, and both are decimal-exact so the final single division is
    engine-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select(
            "p_partkey", F.col("p_type").startswith("PROMO").alias("is_promo")
        )
    )
    disc_price = (
        F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    )
    month = F.date_trunc("month", F.col("o_orderdate")).alias("order_month")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy(month)
        .agg(
            F.sum(F.when(F.col("is_promo"), disc_price).otherwise(F.lit(0).cast(DEC)))
            .alias("_promo"),
            F.sum(disc_price).alias("_total"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )
    return agg.select(
        "order_month",
        F.col("_promo").cast("double").alias("promo_revenue"),
        F.col("_total").cast("double").alias("total_revenue"),
        (F.col("_promo").cast("double") / F.col("_total").cast("double")).alias(
            "promo_ratio"
        ),
        "n_lineitems",
    ).orderBy("order_month")


def pricing_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: totals for every subset of
    (returnflag, linestatus) — both rollup paths plus the
    linestatus-only marginal — from ONE shuffle (Spark expands grouping
    sets map-side exactly like ROLLUP, just with more sets)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .cube("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "count_order",
        )
        .orderBy("returnflag", "linestatus")
    )


def waiting_supplier_orders(
    spark: SparkSession, sf_dir: str, late_days: int = 60
) -> DataFrame:
    """TPC-H Q21-shaped compound correlated subquery: per supplier, the
    (order, supplier) pairs where this supplier shipped late, the order
    involved at least one OTHER supplier, and NO other supplier shipped
    late — the classic "who alone held up a multi-supplier order".

    The literal form is EXISTS + NOT EXISTS, both correlated — executed
    naively, two more passes over lineitem per row. Reformulated here as
    ONE order-level aggregate: n_suppliers = countDistinct(supp),
    n_late_suppliers = countDistinct(supp | late); a late pair
    qualifies iff n_suppliers > 1 AND n_late_suppliers = 1. One
    orderkey shuffle for the aggregate, broadcast back to the late
    pairs. The DuckDB oracle runs the LITERAL EXISTS/NOT EXISTS
    formulation — passing it proves the rewrite is semantics-preserving,
    not just fast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {late_days} DAYS"
    )
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_suppkey", late.alias("is_late")
    ).transform(persist_tracked)
    # eager persist: the two consumers (aggregate + late-pair filter)
    # would otherwise each re-scan AND re-join lineitem⋈orders (verified:
    # no ReusedExchange, lineitem scanned twice). At bench SF the cache
    # write costs ~0.3 s; at 100 TB it saves a full second pass over the
    # largest join in the query.
    lo.count()
    per_order = lo.groupBy(F.col("l_orderkey").alias("agg_okey")).agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_suppliers"
        ),
    )
    late_pairs = lo.filter(F.col("is_late")).select("l_orderkey", "l_suppkey").distinct()
    return (
        late_pairs.join(per_order, late_pairs.l_orderkey == F.col("agg_okey"))
        .filter((F.col("n_suppliers") > 1) & (F.col("n_late_suppliers") == 1))
        .select("l_orderkey", "l_suppkey", "n_suppliers")
        .orderBy("l_orderkey", "l_suppkey")
    )


def events_time_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function surface: calendar decomposition (year, month,
    day-of-week, hour) + truncation, aggregated. All JVM-side datetime
    intrinsics — the session pins UTC so extraction is engine-stable.
    Day-of-week is normalized to 0=Sunday (Spark's dayofweek is 1-based,
    DuckDB's 0-based)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            (F.dayofweek("ts") - 1).alias("dow"),
            F.hour("ts").alias("hod"),
            F.date_trunc("week", F.col("ts")).alias("week_start"),
            "value",
        )
        .groupBy("y", "m", "dow", "hod", "week_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .orderBy("y", "m", "dow", "hod", "week_start")
    )


def event_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-sketch aggregation surface: per event type, HLL++
    distinct users (`approx_count_distinct`) and a GK-sketch median
    (`approx_percentile`) next to their exact counterparts. Sketches are
    THE 100 TB answer for distincts/quantiles — fixed memory per group,
    one pass, mergeable across partitions — where exact distinct counts
    shuffle every key and exact percentiles sort every group. No DuckDB
    oracle (sketch internals are engine-specific by design — the driver
    records a rows-only check); tests bound the relative error against
    the exact values instead."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
            F.expr("approx_percentile(value, 0.5)").alias("approx_p50_value"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias(
                "exact_p50_value"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


def event_sketch_guarantee(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-checkable face of ``event_sketch_stats``: sketch
    INTERNALS are engine-specific, but their accuracy CONTRACTS are
    assertions an exact oracle can pin. Per event type this emits the
    exact values (DuckDB-reproducible) plus two booleans the oracle
    pins to TRUE — HLL++ distinct-users within 3x its configured
    relative standard deviation (0.05 default -> 15%), and the GK
    median equal to a discrete median of the group (at group sizes
    below the sketch's accuracy parameter the rank error is < 1, so
    the estimate must BE one of the two middle order statistics). A
    sketch regression flips a boolean and fails the hash; the tighter
    empirical error is bounded in tests."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("_au"),
        F.countDistinct("user_id").alias("exact_users"),
        F.expr("approx_percentile(value, 0.5)").alias("_ap"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias(
            "exact_p50_value"
        ),
        # the upper discrete median: smallest value at cume_dist strictly
        # past the midpoint — with even N the two middle order statistics
        # differ and a <1-rank-error estimate may legally return either
        F.expr(
            "percentile_disc(0.50001) WITHIN GROUP (ORDER BY value)"
        ).alias("_hi"),
        F.count(F.lit(1)).alias("n_events"),
    )
    au, eu = F.col("_au").cast("double"), F.col("exact_users").cast("double")
    return agg.select(
        "event_type",
        "exact_users",
        (F.abs(au - eu) <= F.lit(0.15) * eu).alias("users_within_3rsd"),
        "exact_p50_value",
        (
            (F.col("_ap") == F.col("exact_p50_value"))
            | (F.col("_ap") == F.col("_hi"))
        ).alias("p50_is_discrete_median"),
        "n_events",
    ).orderBy("event_type")


def viewers_never_purchasing(
    spark: SparkSession, sf_dir: str, since: str = "2024-01-25"
) -> DataFrame:
    """EXCEPT set-op surface: users who viewed but never purchased
    within the trailing window — the per-user complement of
    ``viewing_purchasers`` (the anti-join variant
    ``view_days_without_purchase`` is per-day). ``subtract`` is SQL
    EXCEPT (set semantics — both sides deduped before the anti join);
    the ts filter pushes into both scans."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts") >= F.lit(since).cast("timestamp")
    )
    viewers = ev.filter(F.col("event_type") == "view").select("user_id")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return viewers.subtract(buyers)


def user_daily_timeline(spark: SparkSession, sf_dir: str, user_cap: int = 50) -> DataFrame:
    """Date-spine gap fill (time-series resample): one row per (user,
    day) across each user's own active span, zero-filled on days with no
    events. The spine is generated with ``sequence`` over the per-user
    min/max day — map-side explode, no driver loop, no cross join with a
    global calendar (at 100 TB a global spine would multiply every user
    by the full date range; the per-user span generates only what the
    user can actually own). Capped to the first ``user_cap`` users to
    keep the demo output bounded."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < user_cap)
    day = F.to_date(F.col("ts")).alias("day")
    daily = ev.groupBy("user_id", day).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC)).alias("_dv"),
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    zero = F.lit(0).cast("long")
    return spine.join(daily, ["user_id", "day"], "left_outer").select(
        "user_id",
        "day",
        F.coalesce(F.col("n_events"), zero).alias("n_events"),
        F.coalesce(F.col("_dv"), F.lit(0).cast(DEC)).cast("double").alias("day_value"),
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT surface: per-user event values spread into one column per
    event type, lowered by hand to single-pass conditional aggregation.

    ``groupBy().pivot(col, values)`` — even with explicit values — plans
    TWO aggregation phases (pre-agg on (user, type), shuffle, pivotfirst
    on user: 2 exchanges before the sort; verified via explain). The
    conditional-sum form is the same result in ONE shuffle with map-side
    partials, and explicit per-type columns are also the only shape with
    a stable schema at 100 TB (a data-driven pivot needs a
    distinct-values job first)."""
    ev = load_table(spark, sf_dir, "events")
    aggs = [
        F.sum(F.when(F.col("event_type") == t, F.col("value").cast(DEC)))
        .cast("double")
        .alias(f"{t}_value")
        for t in EVENT_TYPES
    ]
    return ev.groupBy("user_id").agg(*aggs).orderBy("user_id")


def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation + distribution window functions in one pass: per
    customer order, days since the previous order (LAG), the next
    order's key (LEAD), and the price quartile within the customer
    (NTILE). All three windows share the custkey partitioning, so
    Catalyst evaluates them over a single shuffle + sort (the ntile
    window only re-sorts within already-partitioned groups)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "days_since_prev"
        ),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.ntile(4).over(w_price).alias("price_quartile"),
    )


def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation: 1-hour windows every 30 minutes, so
    each event lands in exactly two windows. Spark expands the window
    memberships map-side (no self-join) then aggregates with one shuffle
    — the same plan Structured Streaming uses for sliding watermarked
    windows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").getField("start").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .orderBy("bucket", "event_type")
    )


def shipping_priority(spark: SparkSession, sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = "1995-03-15", topn: int = 10) -> DataFrame:
    """TPC-H Q3-shaped shipping priority: top unshipped-revenue orders
    for one market segment. Broadcast the filtered customer dim; shuffle
    once on orderkey for the join+agg; rank on the aggregated (small)
    result."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == segment
    )
    disc_price = (
        F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    )
    agg = (
        li.filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
    return (
        agg.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= topn)
        .select("rnk", "l_orderkey", "o_orderdate", "revenue")
    )


def forecast_revenue_change(spark: SparkSession, sf_dir: str,
                            year: int = 1996) -> DataFrame:
    """TPC-H Q6-shaped forecast: revenue delta if low-discount small
    orders had shipped free. The whole query is filter + global agg —
    every predicate (shipdate year range, discount band, quantity cap)
    is pushable to the parquet scan, so at 100 TB this reads only the
    row groups whose min/max stats overlap; one map-side partial sum,
    a single-row exchange, no join. The discount band compares the
    stored doubles directly (same parquet bits on both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit(f"{year}-01-01").cast("timestamp")
    hi = F.lit(f"{year + 1}-01-01").cast("timestamp")
    revenue = F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC)
    return (
        li.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def returned_item_customers(spark: SparkSession, sf_dir: str,
                            start: str = "1996-10-01",
                            topn: int = 20) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: customers who returned
    the most revenue in one quarter. The only big shuffle is
    lineitem('R' rows only — pushed) ⋈ orders(date-pruned) on orderkey;
    customer and nation broadcast onto the aggregated result, and the
    top-N ranks over the (small) per-customer aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    lo = F.lit(start).cast("timestamp")
    hi = F.lit(start).cast("timestamp") + F.expr("INTERVAL 3 MONTH")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    cust = F.broadcast(load_table(spark, sf_dir, "customer"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    disc_price = (
        F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    )
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
    return (
        agg.join(cust, agg.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= topn)
        .select("rnk", "c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


def nation_market_share(spark: SparkSession, sf_dir: str,
                        supplier_nation: str = "CHINA",
                        market_region: str = "ASIA",
                        part_type: str = "ECONOMY") -> DataFrame:
    """TPC-H Q8-shaped market share: per order year, the fraction of a
    region's revenue (for one part type) supplied by one nation. The
    nation dim plays TWO roles — customer side gates the market via
    region, supplier side feeds the CASE numerator — so it is broadcast
    twice under different aliases. Numerator and denominator come from
    one conditional aggregation pass (decimal-exact), leaving a single
    engine-identical division per year."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == part_type)
        .select("p_partkey")
    )
    cust = F.broadcast(load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    supp = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    cnat = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
        )
    )
    snat = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
        )
    )
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == market_region)
    )
    disc_price = (
        F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    )
    zero = F.lit(0).cast(DEC)
    national = F.when(F.col("sn_name") == supplier_nation, disc_price).otherwise(zero)
    return (
        li.join(part, li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(cnat, cust.c_nationkey == F.col("cn_key"))
        .join(region, F.col("cn_region") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(snat, supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(national).cast("double").alias("nation_revenue"),
            F.sum(disc_price).cast("double").alias("total_revenue"),
        )
        .withColumn("mkt_share", F.col("nation_revenue") / F.col("total_revenue"))
        .orderBy("o_year")
    )


def top_revenue_supplier(spark: SparkSession, sf_dir: str,
                         start: str = "1996-01-01") -> DataFrame:
    """TPC-H Q15-shaped top supplier: suppliers whose quarterly revenue
    equals the maximum. The per-supplier aggregate (the Q15 view) is
    computed once with one shuffle; the scalar MAX is re-aggregated from
    that already-small frame and broadcast back — the two consumers
    share the plan via a persist barrier, so lineitem is scanned once,
    and no window funnels all rows to one partition."""
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit(start).cast("timestamp")
    hi = F.lit(start).cast("timestamp") + F.expr("INTERVAL 3 MONTH")
    disc_price = (
        F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    )
    revenue = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(F.sum(disc_price).cast("double").alias("total_revenue"))
        .transform(persist_tracked)
    )
    best = F.broadcast(revenue.agg(F.max("total_revenue").alias("max_revenue")))
    supp = F.broadcast(load_table(spark, sf_dir, "supplier"))
    out = (
        revenue.join(best, revenue.total_revenue == best.max_revenue)
        .join(supp, revenue.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )
    return out


def customer_trailing_revenue(spark: SparkSession, sf_dir: str,
                              days: int = 30) -> DataFrame:
    """Value-based (RANGE) window frame: for every order, the customer's
    total order value over the trailing N days INCLUDING same-date ties
    — a frame defined by the orderdate VALUE, not by row position, so
    the result is insensitive to how ties are ordered (row frames are
    not). One shuffle on custkey; the frame sum is decimal-exact so the
    running totals match the oracle bit-for-bit."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-days * 86400, 0)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("trailing_revenue"),
            F.count(F.lit(1)).over(w).alias("n_orders_window"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


def user_top_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group MODE: each user's most frequent event type (majority
    label — the aggregation shape used to pick a canonical label/source
    per group in corpus curation). Counts reduce map-side in the first
    groupBy; the winner is picked by rank over the already-small
    (user, type) aggregate with a deterministic tie-break (higher count,
    then lexicographically first type)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type").asc())
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("user_id", F.col("event_type").alias("top_event"), F.col("n").alias("n_events"))
        .orderBy("user_id")
    )


def min_cost_supplier(spark: SparkSession, sf_dir: str,
                      region: str = "ASIA",
                      part_type: str = "STANDARD",
                      max_size: int = 25,
                      n: int = 100) -> DataFrame:
    """TPC-H Q2-shaped minimum-cost supplier: for each qualifying part,
    the regional supplier(s) offering it cheapest. The testdata has no
    partsupp table, so the part<->supplier offer book is derived from
    lineitem (MIN extendedprice per pair — exact, order-independent).
    The correlated MIN subquery is decorrelated: the per-part regional
    minimum is re-aggregated from the already-small offer frame behind a
    persist barrier and joined back by exact equality — one big shuffle
    on (part, supp); every dimension broadcasts. The ORDER BY ends in
    the unique (p_partkey, s_suppkey) pair so LIMIT is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= max_size) & (F.col("p_type") == part_type))
        .select("p_partkey", "p_name")
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    reg = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == region))
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .join(reg, nation.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("supply_cost"))
        .join(part, F.col("l_partkey") == part.p_partkey)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .transform(persist_tracked)
    )
    best = offers.groupBy(F.col("p_partkey").alias("bp_key")).agg(
        F.min("supply_cost").alias("best_cost")
    )
    return (
        offers.join(
            F.broadcast(best),
            (offers.p_partkey == F.col("bp_key"))
            & (offers.supply_cost == F.col("best_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(n)
    )


def nation_profit(spark: SparkSession, sf_dir: str,
                  name_fragment: str = "widget") -> DataFrame:
    """TPC-H Q9-shaped product-type profit by nation and year. With no
    partsupp, the unit cost is the part's retail price (a column, not a
    join beyond part itself): profit = disc price - retailprice*qty, all
    decimal-exact. part/supplier/nation broadcast; the only big shuffle
    is lineitem><orders on orderkey, then one small agg shuffle on
    (nation, year). The %fragment% filter cannot push to the scan as a
    range, but prunes inside the broadcast dim before the join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(name_fragment))
        .select("p_partkey", "p_retailprice")
    )
    supp = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    amount = (
        F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
        - F.col("p_retailprice").cast(DEC) * F.col("l_quantity").cast(DEC)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def important_parts(spark: SparkSession, sf_dir: str,
                    nation: str = "NATION_3",
                    fraction: str = "0.001") -> DataFrame:
    """TPC-H Q11-shaped important stock: parts whose shipped value from
    one nation's suppliers exceeds FRACTION of that nation's total — a
    per-group HAVING against a global scalar. The per-part aggregate is
    computed once (one shuffle) behind a persist barrier; the scalar
    total is re-aggregated from it and broadcast back, so lineitem is
    scanned once and nothing funnels through a single partition. Both
    sides of the threshold compare are exact decimals, so the boundary
    is bit-stable across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation").filter(F.col("n_name") == nation)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    per_part = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).cast(DEC).alias("part_value"))
        .transform(persist_tracked)
    )
    total = F.broadcast(
        per_part.agg(F.sum("part_value").cast(DEC).alias("total_value"))
    )
    threshold = F.col("total_value") * F.lit(fraction).cast("decimal(8,6)")
    return (
        per_part.crossJoin(total)
        .filter(F.col("part_value") > threshold)
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


def dominant_suppliers(spark: SparkSession, sf_dir: str,
                       name_prefix: str = "large",
                       start: str = "1996-01-01",
                       fraction: str = "0.3") -> DataFrame:
    """TPC-H Q20-shaped nested-IN supplier screen: suppliers who shipped
    more than FRACTION of a part's one-year volume (for a name-prefixed
    part family) — the availqty>half-demand screen re-expressed on the
    offer book. Inner query: qty per (part, supplier) vs qty per part
    (the correlated scalar), decorrelated into one agg + a broadcast
    join back; the distinct qualifying suppliers semi-join into the
    supplier dim. Quantity sums are decimal-exact so the fraction
    boundary is bit-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(name_prefix))
        .select("p_partkey")
    )
    lo = F.lit(start).cast("timestamp")
    hi = lo + F.expr("INTERVAL 1 YEAR")
    pair_qty = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast(DEC).alias("pair_qty"))
        .transform(persist_tracked)
    )
    part_total = pair_qty.groupBy(F.col("l_partkey").alias("tp_key")).agg(
        F.sum("pair_qty").cast(DEC).alias("part_qty")
    )
    qualifying = (
        pair_qty.join(F.broadcast(part_total), pair_qty.l_partkey == F.col("tp_key"))
        .filter(F.col("pair_qty") > F.col("part_qty") * F.lit(fraction).cast("decimal(2,1)"))
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(qualifying, supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


def funnel_steps(
    spark: SparkSession,
    sf_dir: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered multi-step funnel over the events table: for each user,
    the earliest step-1 event, then the earliest step-2 event strictly
    after it, then the earliest step-3 after that (first-touch funnel
    semantics — the standard product-analytics definition, greedy on
    the earliest qualifying timestamp so the result is unique and
    deterministic). Users never reaching step 1 are out of the funnel;
    later steps are NULL when unreached, and ``steps_completed`` counts
    the prefix length.

    Timestamps surface as epoch seconds (floor) so the comparison is
    integer-exact and timezone-proof. Plan shape: one filtered min-agg
    per step, each joined back on user_id — per-step aggregates are
    user-cardinality (small), so after the first groupBy every
    subsequent join shuffles aggregate-sized relations, not the event
    log; at 100 TB the event scan happens once per step with the
    type filter pushed to parquet."""
    ev = load_table(spark, sf_dir, "events")
    cur = (
        ev.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    out = cur
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            ev.filter(F.col("event_type") == step)
            .join(out.select("user_id", F.col(f"t{i-1}")), "user_id")
            .filter(F.col("ts") > F.col(f"t{i-1}"))
            .groupBy("user_id")
            .agg(F.min("ts").alias(f"t{i}"))
        )
        out = out.join(nxt, "user_id", "left")
    completed = F.lit(1)
    for i in range(2, len(steps) + 1):
        completed = completed + F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
    return out.select(
        "user_id",
        *[
            F.col(f"t{i}").cast("long").alias(f"t{i}_epoch")
            for i in range(1, len(steps) + 1)
        ],
        completed.cast("int").alias("steps_completed"),
    )


def signup_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by the ISO week of their
    FIRST signup event; for each cohort, distinct active users at each
    whole-week offset from that cohort week (the classic product
    retention triangle). Week offsets are integer-exact
    (floor(days/7)); user counts are exact distincts.

    Plan: one min-agg for cohorts (user-cardinality output, broadcast
    by AQE into the activity join), one distinct-agg for the matrix —
    both shuffles carry aggregate-sized relations after the map-side
    combine. Filters on event_type push to the scan."""
    ev = load_table(spark, sf_dir, "events")
    cohorts = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    activity = ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("act_week"))
    return (
        activity.join(cohorts, "user_id")
        .filter(F.col("act_week") >= F.col("cohort_week"))
        .select(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            (F.datediff(F.col("act_week"), F.col("cohort_week")) / F.lit(7))
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
    )
