"""The analytics/SQL query surface.

Re-expresses the reference's declared analytics corpus
(``docs/analytics.md`` A1-A10, surveyed in SURVEY.md section 2.6-2.8) over
the driver's synthetic tables: time-bucketed throughput, latency
distributions, error rates, top-N, windowed comparisons, content
distribution, plus the TPC-H-shaped relational queries that exercise the
same operator set (agg, join, window, set ops, rollup) at scale.

Every query here is pure DataFrame API -- no UDFs -- so Catalyst gets
full pushdown/pruning/join-selection freedom, and every query has a
DuckDB oracle in ``ORACLE`` with IDENTICAL column names and rounding.

Scale notes (100 TB):
- All aggregations are partial-aggregate friendly (sum/count/min/max/avg
  decompose map-side); ``median`` uses ``percentile_approx``-class
  machinery only where the oracle can match exactly at test scale.
- Joins: dimension tables (region/nation/customer at real-world scale)
  broadcast; the fact-fact joins (orders x lineitem) hash-partition on
  the join key and benefit from AQE skew splitting.
- Date filters and column projections push into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import table


def _day(col):
    return F.date_format(col, "yyyy-MM-dd")


# --------------------------------------------------------------------------
# A1 -- throughput per day (docs/analytics.md:27-48)
# --------------------------------------------------------------------------
def a1_events_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(_day("ts").alias("day"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# A1b -- throughput per hour, last 24 h (docs/analytics.md:39-47: hour
# bucketing + `new_at >= CURRENT_TIMESTAMP - INTERVAL 1 DAY`). "now"
# anchors at the stream's max ts so the query is deterministic over
# fixed test data; in production the anchor is current_timestamp().
# --------------------------------------------------------------------------
def a1_events_per_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("now_ts"))
    return (
        ev.crossJoin(F.broadcast(anchor))
        .filter(F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 24 HOURS"))
        .groupBy(
            F.concat(F.date_format("ts", "yyyy-MM-dd HH"), F.lit(":00"))
            .alias("hour")
        )
        .agg(F.count("*").alias("n_events"))
    )


# --------------------------------------------------------------------------
# gatekeeper_history failure analytics (sql/schema.sql:49-55): per-job
# attempt/failure counts feeding the retry decision in
# services/job_service.py. Jobs modeled as per-user event streams;
# a job stays retry-eligible below 3 recorded failures.
# --------------------------------------------------------------------------
def gatekeeper_failure_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    failed = F.when(F.col("event_type") == "error", 1).otherwise(0)
    return (
        ev.groupBy(
            F.concat(F.lit("job_"), F.col("user_id").cast("string")).alias("slug")
        )
        .agg(
            F.count("*").alias("n_attempts"),
            F.sum(failed).alias("n_failures"),
            F.round(
                F.sum(failed) / F.count("*").cast("double"), 4
            ).alias("failure_rate"),
            F.date_format(
                F.max(F.when(F.col("event_type") == "error", F.col("ts"))),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("last_failure_ts"),
        )
        .withColumn("retry_eligible", F.col("n_failures") < 3)
    )


# --------------------------------------------------------------------------
# A2 -- latency/value distribution by type (docs/analytics.md:56-68)
# --------------------------------------------------------------------------
def a2_value_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.round(F.median("value"), 4).alias("median_value"),
        F.count("*").alias("n"),
    )


# --------------------------------------------------------------------------
# A3 -- efficiency ratios with null-safe division (docs/analytics.md:76-94)
# --------------------------------------------------------------------------
def a3_efficiency_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("value") > 100.0, 1).otherwise(0)).alias("n_heavy"),
        F.count("*").alias("n_total"),
    )
    return agg.select(
        "event_type",
        "n_heavy",
        "n_total",
        F.round(
            100.0 * F.col("n_heavy") / F.nullif(F.col("n_total").cast("double"), F.lit(0.0)),
            2,
        ).alias("heavy_pct"),
    )


# --------------------------------------------------------------------------
# A4 -- error-rate by day, conditional aggregation (docs/analytics.md:102-114)
# --------------------------------------------------------------------------
def a4_error_rate_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(_day("ts").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_errors"),
            F.count("*").alias("n_total"),
        )
        .select(
            "day",
            "n_errors",
            "n_total",
            F.round(F.col("n_errors") / F.col("n_total").cast("double"), 4).alias("error_rate"),
        )
    )


# --------------------------------------------------------------------------
# A5 -- top-N heaviest events, deterministic tiebreak (docs/analytics.md:123-133)
# --------------------------------------------------------------------------
def a5_top20_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "user_id", "event_type", "value")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# A6 -- single-row pipeline summary (docs/analytics.md:141-151)
# --------------------------------------------------------------------------
# --------------------------------------------------------------------------
# Sketch-based aggregates -- the 100 TB form of A2/A6's exact
# distinct-count and median: HyperLogLog++ cardinality and a quantile
# sketch are one pass, fixed memory, and merge commutatively (register-
# wise max / sketch merge), so they distribute without a global sort or
# a distinct shuffle.
#
# FULL oracle via contract booleans: the raw estimates are
# engine-specific (DuckDB's approx functions use different sketches),
# so the query emits the exact halves PLUS a boolean per sketch
# asserting the estimate met its DOCUMENTED guarantee -- HLL rsd 0.02
# within 4 sigma (8% of exact), and the percentile sketch judged by
# its actual contract, which is a RANK bound, not a value bound: the
# returned element's rank (count of values <= it) must sit within
# n/1000 (+3 slack for duplicate/boundary counting) of rank 0.95n.
# The oracle computes the same exact columns and literal TRUEs, so the
# driver's row hash IS the tolerance adjudication: an out-of-contract
# sketch flips a boolean and fails the gate loudly.
#
# Shape note: the rank check adds one broadcast join + second pass
# over the group -- that is the ADJUDICATION harness; the production
# sketch is the first aggregate alone (one pass, fixed memory).
# --------------------------------------------------------------------------
def sketch_cardinality_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.expr("percentile_approx(value, 0.95, 1000)").alias("_p95_sketch"),
        F.approx_count_distinct("user_id", 0.02).alias("_hll"),
    )
    # null-safe key: a NULL event_type is a real group on both sides,
    # and a plain equi-join would silently drop it from the harness
    j = ev.join(
        F.broadcast(sk), ev["event_type"].eqNullSafe(sk["event_type"])
    ).drop(sk["event_type"])
    nd = F.countDistinct("user_id")
    n = F.count(F.lit(1))
    # the rank target and tolerance are over the VALID values (both
    # percentile forms skip NULLs); and a group with no users / no
    # values satisfies its contract trivially (estimate of nothing is
    # 0 / no percentile to bracket) -- the booleans must stay TOTAL or
    # an all-NULL group emits NULL against the oracle's literal true
    n_val = F.count("value")
    # the returned element occupies the whole rank RANGE
    # [count(< v) + 1, count(<= v)] (ties collapse to one value); the
    # contract holds iff that range INTERSECTS the target bracket --
    # judging count(<= v) alone would flip false on a heavy tie
    # spanning the quantile even though the sketch met its guarantee
    lo_rank = F.sum((F.col("value") < F.col("_p95_sketch")).cast("long")) + 1
    hi_rank = F.sum((F.col("value") <= F.col("_p95_sketch")).cast("long"))
    tol = 0.002 * n_val + F.lit(3.0)
    hll_ok = F.when(
        nd > 0, (F.abs(F.first("_hll") - nd) / nd) <= 0.08
    ).otherwise(F.first("_hll") == 0)
    bracket_ok = F.when(
        n_val > 0,
        (lo_rank <= 0.95 * n_val + tol) & (hi_rank >= 0.95 * n_val - tol),
    ).otherwise(F.lit(True))
    return j.groupBy("event_type").agg(
        nd.alias("n_users_exact"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95_exact"),
        n.alias("n"),
        hll_ok.alias("hll_within_tol"),
        bracket_ok.alias("p95_sketch_in_bracket"),
    )


def a6_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )


# --------------------------------------------------------------------------
# A7 -- weekly comparison with lag() window (docs/analytics.md:159-176)
# --------------------------------------------------------------------------
def a7_weekly_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # an event without an event time has no week: excluded on both
    # sides (Spark would otherwise emit a NULL week group whose lag
    # ORDER BY placement differs cross-engine: NULLS FIRST vs LAST)
    weekly = ev.filter(F.col("ts").isNotNull()).groupBy(
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias("week")
    ).agg(F.count("*").alias("n_events"))
    w = Window.orderBy("week")
    return weekly.select(
        "week",
        "n_events",
        F.lag("n_events").over(w).alias("prev_week_events"),
        (F.col("n_events") - F.lag("n_events").over(w)).alias("wow_delta"),
    )


# --------------------------------------------------------------------------
# A8 -- content distribution over documents (docs/analytics.md:205-223)
# --------------------------------------------------------------------------
def a8_doc_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.sum("n_chars").alias("total_chars"),
    )


# --------------------------------------------------------------------------
# A9 -- staging backlog snapshot (docs/analytics.md:231-237)
# --------------------------------------------------------------------------
def a9_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    pending = ev.filter(F.col("event_type").isin("click", "view"))
    return pending.agg(
        F.count("*").alias("n_pending"),
        F.countDistinct("user_id").alias("n_pending_users"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("newest_ts"),
    )


# --------------------------------------------------------------------------
# A10 -- per-entity timing table (docs/analytics.md:184-197)
# --------------------------------------------------------------------------
def a10_user_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("span_seconds"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )


# --------------------------------------------------------------------------
# A11 -- JSON property extraction (metadata blob semantics,
# parquet_service.py:49,88,103 -> to_json/from_json)
# --------------------------------------------------------------------------
def a11_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # try_cast both here and in the oracle: a valid-JSON non-numeric k
    # must degrade to NULL, not abort the job under ANSI casting
    k = F.get_json_object(F.col("props"), "$.k").try_cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count("*").alias("n"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H-shaped relational queries (exercise agg/join machinery at scale)
# --------------------------------------------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"), "o_orderpriority")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share. The part dimension
    broadcasts; the conditional sum is one map-side partial agg over
    the (filtered, pruned) lineitem scan -- a single shuffle of two
    doubles regardless of fact size."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order counts by priority for orders with at
    least one late-shipping lineitem (EXISTS rewritten as LEFT SEMI
    with the late predicate inside the join condition -- the semi join
    stops probing an order on first match, and both sides keep pruned
    scans). One shuffle pair for the semi join, one 5-group agg."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 90 DAYS"
    )
    return (
        orders.join(
            li.select("l_orderkey", "l_shipdate"),
            (F.col("o_orderkey") == F.col("l_orderkey")) & late,
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-side aggregation -- every predicate
    (shipdate year, discount band, quantity cap) pushes into the
    parquet scan, the projection prunes to three columns, and the
    whole query is one map-side partial sum + a scalar exchange."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer,
    top 20. The orders->lineitem join shuffles on the order key; the
    customer dimension broadcasts onto the aggregated (custkey) rows;
    the top-20 is TakeOrdered, never a global sort."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum(rev), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_custkey").alias("custkey"),
            "c_name",
            "c_mktsegment",
            "revenue",
            "n_items",
        )
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year over
    lineitem x part x supplier x nation (profit = revenue - retail cost
    stand-in). Both dimensions and the supplier->nation chain
    broadcast; the only shuffle is the final (nation, year) agg."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.4
    )
    return (
        li.join(F.broadcast(part.filter(F.col("p_type") == "PROMO")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"),
             F.count("*").alias("n_items"))
    )


# --------------------------------------------------------------------------
# Join patterns J1-J3 (SURVEY section 2.5): broadcast equi, anti, semi
# --------------------------------------------------------------------------
def join_orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (J2/J3 shape: 'not among active' cleanup/dup-check)."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_orderstatus",
                F.round("o_totalprice", 2).alias("o_totalprice"))
    )


def join_customers_with_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (J3 shape: exists-check)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        ).select("c_custkey", "c_name")
    )


# --------------------------------------------------------------------------
# Window functions (SURVEY section 2.7)
# --------------------------------------------------------------------------
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order total (cumulative window)."""
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


def window_first_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO claim ordering (job_service.py:99-109 -> row_number()==1)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type",
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"))
    )


def window_last_n_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ring-buffer trim: keep the newest 40 events per user
    (chat_session_service.py:55-60 last-40; registry.py:30-36 last-100)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 40)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.round(F.sum("value"), 2).alias("kept_value"),
        )
    )


# --------------------------------------------------------------------------
# Set ops + rollup (SURVEY section 2.8; Spark natives on the SQL surface)
# --------------------------------------------------------------------------
def set_error_not_purchase_user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT over (user, day) pairs: days a user erred but never bought."""
    ev = table(spark, sf_dir, "events")
    err = (
        ev.filter(F.col("event_type") == "error")
        .select("user_id", _day("ts").alias("day")).distinct()
    )
    pur = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", _day("ts").alias("day")).distinct()
    )
    return err.exceptAll(pur).distinct()


def rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.rollup("event_type", _day("ts").alias("day"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce("day", F.lit("(all)")).alias("day"),
            "n",
            "total_value",
        )
    )


def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user
    counts at each step only if that event happened strictly AFTER the
    user's previous-step time (first-touch attribution), the classic
    product-analytics funnel the lifecycle dashboard reads next to the
    error-rate series.

    Scale shape: the three step times are conditional-min windows over
    ONE user-keyed exchange (same partitioning, so Catalyst stacks the
    window phases on a single shuffle); the per-user reduction and the
    final 3-row unpivot are a tiny aggregate."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    df = ev.withColumn(
        "t1",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    df = df.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    df = df.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    per = df.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    row = per.agg(
        F.count("t1").alias("n1"), F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
    )
    steps = F.array(
        F.struct(F.lit("view").alias("step"), F.lit(1).alias("step_n"),
                 F.col("n1").alias("n_users")),
        F.struct(F.lit("click").alias("step"), F.lit(2).alias("step_n"),
                 F.col("n2").alias("n_users")),
        F.struct(F.lit("purchase").alias("step"), F.lit(3).alias("step_n"),
                 F.col("n3").alias("n_users")),
    )
    return row.select(F.explode(steps).alias("s"), "n1").select(
        F.col("s.step").alias("step"),
        F.col("s.step_n").alias("step_n"),
        F.col("s.n_users").alias("n_users"),
        F.round(F.col("s.n_users") / F.col("n1"), 4).alias("conv_rate"),
    )


def daily_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection over the event stream: each day's
    event count scored against the mean/stddev of its 7 PRIOR days
    (current day excluded -- the day under test must not contaminate
    its own baseline); days without a full 7-day history are not
    scored. The monitoring query behind a 'traffic dropped/spiked'
    alert.

    Scale shape: the corpus-sized step is the one map-combined daily
    count; the trailing windows then run on the AGGREGATED day
    relation, whose cardinality is the calendar, not the data -- the
    single-partition window is bounded by days-of-history and is the
    correct plan, unlike a per-event global sort.

    The day axis is DENSIFIED over [min(day), max(day)] with
    zero-count fill before windowing: a total-outage day (0 events)
    is precisely the anomaly this query alerts on and must receive a
    row and a z-score, and the 7-PRIOR-row frame is then truly 7
    PRIOR CALENDAR DAYS even across gaps."""
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    bounds = counts.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    days = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    )
    daily = days.join(counts, "d", "left").select(
        "d", F.coalesce("n", F.lit(0)).alias("n_events")
    )
    w = Window.orderBy("d").rowsBetween(-7, -1)
    rn = Window.orderBy("d")
    scored = daily.select(
        "d", "n_events",
        F.avg("n_events").over(w).alias("m"),
        F.stddev("n_events").over(w).alias("s"),
        F.row_number().over(rn).alias("rn"),
    ).filter(F.col("rn") > 7)
    return scored.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_events",
        F.round("m", 6).alias("base_mean"),
        F.round("s", 6).alias("base_std"),
        F.when(F.col("s") > 0, F.round((F.col("n_events") - F.col("m"))
                                       / F.col("s"), 4)).alias("zscore"),
    )


def rolling_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day trailing-7-day distinct users (the WAU-per-day series).
    A sliding DISTINCT cannot merge across frames, so instead of a
    range self-join each (user, day) pair is EXPLODED into the <= 7
    report days it contributes to, then one distinct aggregate per
    report day -- bounded 7x row amplification of the (already
    deduplicated, narrow) pair set, map-side expansion, one shuffle.
    Only TRAILING-edge windows are dropped (report days past the
    data's last day); report days earlier than min(day)+6 are still
    emitted with the partial history that exists before them, exactly
    as the oracle computes them."""
    ev = table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    bounds = ev.agg(F.max(F.to_date("ts")).alias("max_d"))
    return (
        days.select(
            "user_id",
            F.explode(
                F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
            ).alias("day"),
        )
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("day") <= F.col("max_d"))
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau"))
    )


def window_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill: carry each user's last known PURCHASE value forward
    onto every subsequent event (``last_value IGNORE NULLS`` over an
    unbounded-preceding frame) -- the telemetry forward-fill shape
    (last reported reading applies until the next). One shuffle per
    user key; the frame scans each partition once."""
    ev = table(spark, sf_dir, "events")
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.round(
            F.last(purchase_val, ignorenulls=True).over(w), 2
        ).alias("last_purchase_value"),
    )


def window_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) quartile assignment within each event type plus the
    event's percent_rank -- the ranking-function family (ntile /
    percent_rank) on one pass."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


def unpivot_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The melt inverse of :func:`pivot_events_daily`: wide day x type
    counts back to long (day, event_type, n) via ``stack`` -- the
    reshape pair analytics exports need in both directions. The stack
    is a map-side expression over the already-aggregated wide rows."""
    wide = pivot_events_daily(spark, sf_dir)
    n = len(EVENT_TYPES)
    stack_args = ", ".join(f"'{t}', {t}" for t in EVENT_TYPES)
    return (
        wide.selectExpr(
            "day", f"stack({n}, {stack_args}) AS (event_type, n)"
        )
        .filter(F.col("n") > 0)
    )


def props_key_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property-key histogram: parse ``props`` into a MAP, explode
    its keys, count occurrences per key -- the schema-discovery query
    run before promoting semi-structured fields to columns. Parse and
    explode are map-side; one small aggregate by key."""
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    kv = ev.select(F.explode(m).alias("prop_key", "prop_val"))
    return (
        kv.groupBy(
            "prop_key",
            # try_cast: non-numeric property values bucket as NULL on
            # both engines instead of aborting under ANSI casting
            (F.col("prop_val").try_cast("long")
             - F.pmod(F.col("prop_val").try_cast("long"), 10))
            .alias("val_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("prop_val").alias("n_distinct_vals"),
        )
    )


def grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((event_type), (day)) -- the two
    one-dimensional summaries in ONE scan/shuffle, where rollup/cube
    would also compute combinations nobody asked for. Expressed through
    ``spark.sql`` over a registered view: the engine's SQL-string
    surface is the same Catalyst plan space as the DataFrame API. The
    view name is derived from ``sf_dir`` so two callers on one shared
    session with different corpora never clobber each other's view."""
    import hashlib

    view = "events_v_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    table(spark, sf_dir, "events").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT coalesce(event_type, '(all)') AS event_type,
               coalesce(day, '(all)') AS day,
               count(*) AS n,
               round(sum(value), 2) AS total_value
        FROM (SELECT event_type, date_format(ts, 'yyyy-MM-dd') AS day, value
              FROM {view})
        GROUP BY GROUPING SETS ((event_type), (day))
        """
    )


def window_rolling_7day_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 7-DAY value sum: a RANGE window frame over
    event-time seconds (time-based, not row-based -- gaps and bursts
    weigh correctly). One shuffle by user; the frame is evaluated with
    a sliding two-pointer over each user's sorted events, so cost is
    linear in events, not events x window span."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-6 * 86400, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.round(F.sum("value").over(w), 2).alias("rolling_7d_value"),
    )


EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
_EVENT_TYPES_SQL = ", ".join(f"'{t}'" for t in EVENT_TYPES)


def pivot_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day x event-type count matrix via PIVOT -- the wide-format
    export analytics dashboards consume. The pivot value list is
    EXPLICIT (the five known event types), so Spark skips the extra
    distinct-values job and the plan is a single groupBy with one
    conditional count per column -- map-side combinable, one shuffle
    of 5 small columns per day regardless of fact size."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(_day("ts").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


def cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day): all four grouping combinations in
    one pass (SURVEY 2.6 note: the reference has no grouping sets;
    Spark's are exposed for free on the engine's SQL surface)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.cube("event_type", _day("ts").alias("day"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce("day", F.lit("(all)")).alias("day"),
            "n",
            "total_value",
        )
    )


HLL_M = 64           # registers (p = 6 index bits)
HLL_HASH_HEX = 12    # md5 hex chars used -> 48-bit hash
HLL_WBITS = 48 - 6   # bits left for the rho pattern
HLL_POW = 45         # harmonic sum scaled by 2^HLL_POW (>= WBITS+1)
# alpha_64 = 0.7213 / (1 + 1.079/64) ~ 0.709357 as a rational
HLL_ALPHA_NUM, HLL_ALPHA_DEN = 7093, 10000


def _hll_lc_case(v: str, raw: str) -> str:
    """Small-range (linear counting) correction as exact integers:
    when empty registers exist and the raw estimate is under the
    standard 5/2*m threshold, est = round(m * ln(m / V)). The ln is
    evaluated ONCE here in Python over the 64 possible V values and
    embedded as literals, so neither engine evaluates a float -- the
    cross-engine contract stays integer-exact (docs/ROUNDING.md;
    ln differs in the last ulp across libm implementations)."""
    import math

    arms = " ".join(
        f"WHEN {v} = {k} THEN {round(HLL_M * math.log(HLL_M / k))}"
        for k in range(1, HLL_M + 1)
    )
    return (
        f"CASE WHEN {v} > 0 AND {raw} <= {5 * HLL_M // 2} "
        f"THEN (CASE {arms} END) ELSE {raw} END"
    )


def _hll_rho_case(w: str) -> str:
    """SQL CASE computing rho(w) = 1 + trailing zeros of the 42-bit
    pattern ``w`` (w = 0 -> WBITS + 1), identical text for Spark SQL
    and DuckDB: only %, = and integer literals -- no engine-specific
    bit intrinsics, exact BIGINT arithmetic."""
    arms = [f"WHEN {w} = 0 THEN {HLL_WBITS + 1}"]
    arms += [
        f"WHEN {w} % {1 << (r + 1)} = {1 << r} THEN {r + 1}"
        for r in range(HLL_WBITS)
    ]
    return "CASE " + " ".join(arms) + " END"


def _hll_registers(ev: DataFrame) -> DataFrame:
    """(event_type, reg, m) register maxima of ``ev(event_type,
    user_id)`` -- the shared sketch builder (batch report, set
    algebra, and the streaming sink all consume it)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll:"), F.col("user_id").cast("string"))),
            1, HLL_HASH_HEX,
        ), 16, 10,
    ).cast("long")
    hashed = (
        ev.select("event_type", h.alias("h"))
        .select(
            "event_type",
            (F.col("h") % HLL_M).alias("reg"),
            F.expr(f"h div {HLL_M}").alias("w"),
        )
        .select("event_type", "reg",
                F.expr(_hll_rho_case("w")).alias("rho"))
    )
    return hashed.groupBy("event_type", "reg").agg(
        F.max("rho").alias("m")
    )


def hll_registers_estimate(regs: DataFrame) -> DataFrame:
    """(event_type, est_distinct) from a persisted register table --
    the read-back face of the streaming sink, running the identical
    staged-integer estimate ladder as the batch report (empty
    registers contribute via the 64-minus-present identity; present
    registers always carry rho >= 1)."""
    sm = F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_POW} - m)"))
    np_ = F.count(F.lit(1))
    raw = (f"({HLL_ALPHA_NUM} * (CAST("
           f"{HLL_M * HLL_M * (1 << HLL_POW)} AS BIGINT) div s))"
           f" div {HLL_ALPHA_DEN}")
    return (
        regs.groupBy("event_type")
        .agg(
            (sm + (HLL_M - np_)
             * F.lit(1 << HLL_POW).cast("long")).alias("s"),
            (F.lit(HLL_M) - np_).cast("long").alias("v"),
        )
        .select(
            "event_type",
            F.expr(_hll_lc_case("v", raw)).cast("long")
            .alias("est_distinct"),
        )
    )


def hll_streaming_sink(stream_events: DataFrame, path: str,
                       checkpoint_dir: str):
    """The HLL sketch's STREAMING face: maintain the per-event-type
    distinct-user registers continuously through ``foreachBatch``.
    Each micro-batch sketches ONLY its own rows and merges into the
    persisted register table by register-wise max -- the exact
    mergeability that makes HLL the 100 TB streaming sketch: max is
    idempotent, commutative and associative, so out-of-order
    delivery, replays, and partial redelivery all converge to the
    sketch of the union (stream == batch EXACTLY, not approximately:
    the register table is identical, asserted by the stream-equals-
    batch test). Read estimates back with
    :func:`hll_registers_estimate`.

    Scale shape: per batch, one hash pass over the batch's rows
    collapsing to <= |types| x 64 register rows; the persisted table
    is the same fixed size, so the merge rewrite is O(types), not
    O(history) -- the sink never rereads the event history."""
    from pyspark.errors import AnalysisException

    from ..sinks import _replace_dir, recover_replace_dir

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # heal a delete->rename crash from a prior run BEFORE reading
        # state: otherwise checkpoint replay sees "no table", treats
        # history as empty, and commits a one-batch register table
        recover_replace_dir(
            spark, path.rstrip("/") + "__hllstaging", path)
        b = _hll_registers(
            batch_df.filter(F.col("user_id").isNotNull())
            .select("event_type", "user_id")
        )
        try:
            existing = spark.read.parquet(path)
        except AnalysisException as e:
            if ("PATH_NOT_FOUND" not in str(e)
                    and "Path does not exist" not in str(e)):
                raise
            existing = None
        pool = b if existing is None else existing.unionByName(b)
        merged = pool.groupBy("event_type", "reg").agg(
            F.max("m").alias("m")
        )
        staging = path.rstrip("/") + "__hllstaging"
        merged.write.mode("overwrite").parquet(staging)
        # delete+rename flip: a partial register table is never
        # readable at `path` (crash window documented in _replace_dir)
        _replace_dir(spark, staging, path)

    return (
        stream_events.writeStream
        .foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sketch_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC HyperLogLog per event_type, bit-exact on both
    engines (unlike ``approx_count_distinct``, whose estimate is
    engine-internal and only envelope-checkable): register index =
    md5-derived 6 bits, register value = max rho of the remaining 42
    bits, estimate = the standard alpha * m^2 harmonic mean computed
    in EXACT staged integer division (docs/ROUNDING.md rule 1 -- the
    two-stage ``div`` keeps every intermediate under 2^63; truncation
    is part of the cross-engine contract). The SMALL-range
    (linear-counting) correction IS applied -- as an exact integer
    literal table via ``_hll_lc_case``, so both engines pick the same
    branch and the same value; only the large-range (2^32 hash-space
    saturation) correction is omitted, irrelevant at the 42-bit rho
    width used here. The sketch is the mergeable
    100 TB shape (register maxima are cell-wise mergeable across
    partitions/days exactly like the count-min grid), and the exact
    distinct count sits beside the estimate as the quality
    observable.

    Scale shape: one partial-aggregated groupBy on (event_type,
    register) -- 64 rows per key survive the shuffle regardless of
    row count -- then a 64-ary re-aggregation; NULL user_ids carry no
    identity and are excluded from sketch and exact count alike."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
    )
    regs = _hll_registers(ev)
    # all HLL_M registers per key: empty registers contribute 2^POW.
    # NULL event_type is a legitimate group -- every join below is
    # null-safe so it survives to the output (same convention as
    # sketch_cardinality_quantiles)
    keys = regs.select("event_type").distinct()
    grid = keys.join(
        F.broadcast(spark.range(HLL_M).select(F.col("id").alias("reg"))),
        how="cross",
    )
    full = (
        grid.join(
            regs.select(F.col("event_type").alias("_et"),
                        F.col("reg").alias("_reg"), "m"),
            grid["event_type"].eqNullSafe(F.col("_et"))
            & (grid["reg"] == F.col("_reg")),
            "left",
        )
        .select("event_type", F.coalesce("m", F.lit(0)).alias("m"))
    )
    s = F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_POW} - m)"))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct"),
    )
    # staged exact integer estimate: T = m^2 * 2^POW div S (<= 2^57 /
    # min S), then est = alpha_num * T div alpha_den -- both products
    # stay under 2^63; the small-range branch swaps in the linear-
    # counting literal table
    raw = (f"({HLL_ALPHA_NUM} * (CAST("
           f"{HLL_M * HLL_M * (1 << HLL_POW)} AS BIGINT) div s))"
           f" div {HLL_ALPHA_DEN}")
    est = (
        full.groupBy("event_type").agg(
            s.alias("s"),
            F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).alias("v"),
        )
        .select(
            "event_type",
            F.expr(_hll_lc_case("v", raw)).cast("long")
            .alias("est_distinct"),
        )
    )
    return (
        est.join(
            exact.select(F.col("event_type").alias("_et2"),
                         "exact_distinct"),
            est["event_type"].eqNullSafe(F.col("_et2")),
        )
        .select("event_type", "est_distinct", "exact_distinct")
    )


HLL_SET_A, HLL_SET_B = "click", "purchase"


def hll_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKETCH ALGEBRA on the deterministic HLL: estimate the distinct
    user cardinality of two event cohorts, their UNION (register-wise
    max -- the merge that makes HLL the 100 TB sketch: union of
    sketches == sketch of union, no rescan), and their INTERSECTION
    by inclusion-exclusion (est_a + est_b - est_union -- the standard
    HLL intersection, unbiased but higher-variance; it may even go
    negative on tiny overlaps, which the report preserves honestly).
    Each row carries the exact counterpart as the quality observable,
    same contract as the CMS and per-type HLL reports.

    All estimates are the exact staged-integer HLL ladder
    (docs/ROUNDING.md rule 1); no float anywhere.

    Scale shape: ONE hash pass over the two cohorts' rows; register
    maxima partially aggregate to <= 2 x 64 rows; the union sketch is
    a 64-row re-aggregation; exact counts ride the same scan. The
    final report is four rows assembled from two single-row frames."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull()
                & F.col("event_type").isin(HLL_SET_A, HLL_SET_B))
        .select(
            F.when(F.col("event_type") == HLL_SET_A, "a").otherwise("b")
            .alias("side"),
            "user_id",
        )
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll:"), F.col("user_id").cast("string"))),
            1, HLL_HASH_HEX,
        ), 16, 10,
    ).cast("long")
    hashed = ev.select("side", h.alias("h")).select(
        "side",
        (F.col("h") % HLL_M).alias("reg"),
        F.expr(f"h div {HLL_M}").alias("w"),
    ).select("side", "reg", F.expr(_hll_rho_case("w")).alias("rho"))
    regs = hashed.groupBy("side", "reg").agg(F.max("rho").alias("m"))
    union_regs = regs.groupBy("reg").agg(F.max("m").alias("m")).select(
        F.lit("u").alias("side"), "reg", "m"
    )
    all_regs = regs.unionByName(union_regs)

    def _sv(side: str):
        # present registers have rho >= 1; each of the (64 - present)
        # empty registers contributes 2^POW to s and 1 to v
        sm = F.sum(F.when(
            F.col("side") == side,
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_POW} - m)"),
        ))
        np_ = F.sum(F.when(F.col("side") == side, 1).otherwise(0))
        return [
            (sm + (HLL_M - np_)
             * F.lit(1 << HLL_POW).cast("long")).alias(f"s_{side}"),
            (F.lit(HLL_M) - np_).cast("long").alias(f"v_{side}"),
        ]

    sv = all_regs.agg(*(_sv("a") + _sv("b") + _sv("u")))

    def _est(side: str) -> str:
        raw = (f"({HLL_ALPHA_NUM} * (CAST("
               f"{HLL_M * HLL_M * (1 << HLL_POW)} AS BIGINT)"
               f" div s_{side})) div {HLL_ALPHA_DEN}")
        return _hll_lc_case(f"v_{side}", raw)

    ests = sv.select(*[
        F.expr(_est(sd)).cast("long").alias(f"est_{sd}")
        for sd in ("a", "b", "u")
    ])
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("side") == "a", 1).otherwise(0)).alias("ia"),
        F.max(F.when(F.col("side") == "b", 1).otherwise(0)).alias("ib"),
    )
    exact = per_user.agg(
        F.sum("ia").cast("long").alias("x_a"),
        F.sum("ib").cast("long").alias("x_b"),
        F.count(F.lit(1)).cast("long").alias("x_u"),
        F.sum(F.col("ia") * F.col("ib")).cast("long").alias("x_i"),
    )
    return (
        ests.crossJoin(F.broadcast(exact))
        .selectExpr(
            f"stack(4, "
            f"'{HLL_SET_A}', est_a, x_a, "
            f"'{HLL_SET_B}', est_b, x_b, "
            f"'union', est_u, x_u, "
            f"'intersection', est_a + est_b - est_u, x_i) "
            f"AS (set_name, est_distinct, exact_distinct)"
        )
    )


def _hll_sets_oracle_sql() -> str:
    raws = {
        sd: (f"({HLL_ALPHA_NUM} * (CAST("
             f"{HLL_M * HLL_M * (1 << HLL_POW)} AS BIGINT)"
             f" // s_{sd})) // {HLL_ALPHA_DEN}")
        for sd in ("a", "b", "u")
    }
    ests = ", ".join(
        f"CAST({_hll_lc_case(f'v_{sd}', raws[sd])} AS BIGINT) AS est_{sd}"
        for sd in ("a", "b", "u")
    )
    sv = ", ".join(
        f"CAST(sum(CASE WHEN side = '{sd}' THEN "
        f"(CAST(1 AS BIGINT) << ({HLL_POW} - m)) END)"
        f" + ({HLL_M} - count(CASE WHEN side = '{sd}' THEN 1 END))"
        f" * (CAST(1 AS BIGINT) << {HLL_POW}) AS BIGINT) AS s_{sd}, "
        f"CAST({HLL_M} - count(CASE WHEN side = '{sd}' THEN 1 END)"
        f" AS BIGINT) AS v_{sd}"
        for sd in ("a", "b", "u")
    )
    return f"""
        WITH ev AS (
            SELECT CASE WHEN event_type = '{HLL_SET_A}' THEN 'a'
                        ELSE 'b' END AS side,
                   user_id
            FROM events
            WHERE user_id IS NOT NULL
              AND event_type IN ('{HLL_SET_A}', '{HLL_SET_B}')
        ),
        hashed AS (
            SELECT side,
                   h % {HLL_M} AS reg, h // {HLL_M} AS w
            FROM (
                SELECT side,
                       CAST(CAST('0x' || substr(md5('hll:' ||
                           CAST(user_id AS VARCHAR)), 1, {HLL_HASH_HEX})
                           AS BIGINT) AS BIGINT) AS h
                FROM ev
            )
        ),
        rhos AS (
            SELECT side, reg, {_hll_rho_case("w")} AS rho FROM hashed
        ),
        regs AS (
            SELECT side, reg, max(rho) AS m FROM rhos GROUP BY side, reg
        ),
        all_regs AS (
            SELECT * FROM regs
            UNION ALL
            SELECT 'u' AS side, reg, max(m) AS m FROM regs GROUP BY reg
        ),
        sv AS (SELECT {sv} FROM all_regs),
        ests AS (SELECT {ests} FROM sv),
        per_user AS (
            SELECT user_id,
                   max(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS ia,
                   max(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS ib
            FROM ev GROUP BY user_id
        ),
        exact AS (
            SELECT CAST(sum(ia) AS BIGINT) AS x_a,
                   CAST(sum(ib) AS BIGINT) AS x_b,
                   CAST(count(*) AS BIGINT) AS x_u,
                   CAST(sum(ia * ib) AS BIGINT) AS x_i
            FROM per_user
        )
        SELECT u.set_name,
               CASE u.set_name
                   WHEN '{HLL_SET_A}' THEN e.est_a
                   WHEN '{HLL_SET_B}' THEN e.est_b
                   WHEN 'union' THEN e.est_u
                   ELSE e.est_a + e.est_b - e.est_u END AS est_distinct,
               CASE u.set_name
                   WHEN '{HLL_SET_A}' THEN x.x_a
                   WHEN '{HLL_SET_B}' THEN x.x_b
                   WHEN 'union' THEN x.x_u
                   ELSE x.x_i END AS exact_distinct
        FROM (VALUES ('{HLL_SET_A}'), ('{HLL_SET_B}'),
                     ('union'), ('intersection')) u(set_name)
        CROSS JOIN ests e CROSS JOIN exact x
    """


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly COHORT RETENTION: each user joins the cohort of their
    first active ISO week; for every (cohort, week-offset) cell the
    report emits how many of the cohort's users were active that many
    weeks later and the retained fraction -- the engagement triangle
    every product-analytics stack derives from an event stream
    (reference analytics corpus family, summary_queries.sql). Rows
    missing the user or the timestamp carry no cohort signal and are
    excluded by contract (identically in the oracle).

    The retained fraction is ONE division of two exact integer counts
    (IEEE-correctly-rounded, bit-identical across engines -- no
    rounded-value arithmetic, docs/ROUNDING.md rule 3).

    Scale shape: the (user, week) pair set is deduplicated with
    map-side combine BEFORE anything else, so every later stage works
    on |users| x |active weeks| narrow rows, not raw events; the
    cohort lookup is a shuffle equi-join on user_id reusing the
    distinct's partitioning; cohort sizes are a tiny
    (#weeks-in-history) aggregate joined broadcast."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    weeks = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    ).distinct()
    first = weeks.groupBy("user_id").agg(F.min("w").alias("cohort_w"))
    sizes = first.groupBy("cohort_w").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        weeks.join(first, "user_id")
        .groupBy(
            "cohort_w",
            F.expr("datediff(to_date(w), to_date(cohort_w)) div 7")
            .cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .join(F.broadcast(sizes), "cohort_w")
        .select(
            F.date_format("cohort_w", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.col("active_users").cast("long").alias("active_users"),
            (F.col("active_users").cast("double")
             / F.col("cohort_size").cast("double")).alias("retention"),
        )
    )


K_ANON = 5  # minimum distinct users a published cell may rest on


def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY publication gate over the (event_type, day)
    aggregation: any cell supported by fewer than ``K_ANON`` distinct
    users is SUPPRESSED -- the row is published with NULLed measures
    and a flag, never with the small count that would re-identify its
    users (Sweeney 2002; the governance twin of the PII redaction
    family: PII scrubs values, k-anonymity gates aggregates). Rows
    lacking a user or timestamp can't support any cell and are
    excluded by contract.

    Scale shape: one partially-aggregated groupBy (count + distinct
    user count on the same key); the suppression predicate is a
    map-side projection over cell-cardinality rows."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    cells = ev.groupBy(
        "event_type", F.date_format(F.to_date("ts"), "yyyy-MM-dd")
        .alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    ok = F.col("n_users") >= K_ANON
    return cells.select(
        "event_type", "day",
        F.when(ok, F.col("n_events")).cast("long").alias("n_events"),
        F.when(ok, F.col("n_users")).cast("long").alias("n_users"),
        (~ok).cast("int").alias("suppressed"),
    )


L_DIV = 3  # minimum distinct sensitive values per published QI group


def l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-DIVERSITY audit over the customer table -- the complement
    k-anonymity misses (Machanavajjhala 2007): a group of >= k rows
    that all share ONE sensitive value still discloses it. Quasi-
    identifiers here are (nation, market segment); the sensitive
    attribute is the account balance bucketed to $1000 bands in exact
    integer cents (the pinned half-up quantizer, then two truncating
    divisions -- no float floor at a band edge can disagree between
    engines). A group publishes iff it carries at least ``L_DIV``
    distinct bands; otherwise its distinct-count is NULLed and the
    row flagged, mirroring the k-anonymity suppression contract.
    NULL-balance rows carry no sensitive value and are excluded;
    NULL QI columns form their own group (both engines group NULLs
    together).

    Scale shape: ONE partially-aggregated (nation, segment) shuffle
    computing size + distinct-band count; the gate is a map-side
    projection over QI-group-cardinality rows."""
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal").isNotNull()
    )
    band = F.expr(
        "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) div 100000"
    )
    cells = cust.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct(band).cast("long").alias("n_bands"),
    )
    ok = F.col("n_bands") >= L_DIV
    return cells.select(
        "nation", "segment", "n_rows",
        F.when(ok, F.col("n_bands")).cast("long").alias("n_bands"),
        (~ok).cast("int").alias("suppressed"),
    )


T_CLOSE_BINS = 10        # ordered sensitive-value bins (global deciles)
T_CLOSE_NUM, T_CLOSE_DEN = 1, 4   # threshold t = 1/4 as an exact rational


def t_closeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-CLOSENESS audit over the customer table -- the third leg of
    the privacy trio (Li, Li & Venkatasubramanian, ICDE 2007): a QI
    group can be k-anonymous AND l-diverse yet still leak if its
    sensitive-value DISTRIBUTION sits far from the table-wide one
    (e.g. a group holding only the top balances). Quasi-identifiers
    are (nation, market segment) -- same as :func:`l_diversity_report`
    -- and the sensitive attribute is the account balance ranked into
    ``T_CLOSE_BINS`` GLOBAL deciles. Distance is the Earth Mover's
    Distance for ordered categories: EMD = (1/(b-1)) *
    sum_j |cum_p(j) - cum_q(j)| over bins j, p the group's histogram,
    q the global one. A group violates iff EMD > t.

    Exactness: deciles come from the exact two-phase global rank
    (:func:`..rank.distributed_rank` on the pinned half-up integer
    cents, custkey tiebreak) + the byte-exact ntile fill rule -- no
    single-reducer window, no float hop. The EMD numerator is the
    exact BIGINT ``sum_j |cum(n_gj)*N - cum(N_j)*n_g|`` (cum over the
    b-1 interior bins as unrolled conditional sums, so EMPTY bins
    participate); the violation flag compares
    ``num * T_CLOSE_DEN > N * n_g * (b-1) * T_CLOSE_NUM`` in exact
    integers -- no group can flip on a float boundary. The reported
    ``emd_4dp`` divides the exact integers once and rounds once.

    Scale shape: two rank passes (range-partitioned, no global
    window), ONE partial-aggregated (nation, segment) groupBy with
    b-1 unrolled conditional sums, and a one-row global histogram
    broadcast back -- group-cardinality rows after the single
    shuffle. BIGINT headroom: cum*N <= N*n_g <= N^2; at N ~ 3e9 rows
    the product crosses 2^63 and the numerator moves to DECIMAL(38)
    -- documented boundary, same one l_diversity's cents carry."""
    from .rank import distributed_rank, ntile_from_rank

    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal").isNotNull()
    )
    cents = F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)")
    ranked = distributed_rank(
        cust.select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            cents.alias("cents"), "c_custkey",
        ),
        [(F.col("cents"), True), (F.col("c_custkey"), True)],
        rn_col="_rn", n_col="_n",
    ).select(
        "nation", "segment",
        ntile_from_rank("_rn", "_n", T_CLOSE_BINS).alias("decile"),
    )
    b = T_CLOSE_BINS
    cums = [
        F.sum((F.col("decile") <= j).cast("long")).alias(f"c{j}")
        for j in range(1, b)
    ]
    # group-cardinality rows behind a lazy localCheckpoint: the global
    # histogram is the EXACT integer sum of the group histograms
    # (every ranked row lands in exactly one (nation, segment) group,
    # NULL keys included), so deriving glob from grp -- instead of a
    # second aggregate over `ranked` -- halves the rank passes (the
    # two consumers each re-executed the whole two-phase rank).
    grp = ranked.groupBy("nation", "segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"), *cums
    ).localCheckpoint(eager=False)
    glob = grp.agg(
        F.sum("n_rows").alias("n_all"),
        *[F.sum(f"c{j}").alias(f"g{j}") for j in range(1, b)],
    )
    num = sum(
        F.abs(F.col(f"c{j}") * F.col("n_all")
              - F.col(f"g{j}") * F.col("n_rows"))
        for j in range(1, b)
    )
    den = F.col("n_all") * F.col("n_rows") * F.lit(b - 1)
    return (
        grp.crossJoin(F.broadcast(glob))
        .withColumn("_num", num)
        .select(
            "nation", "segment", "n_rows",
            F.round(F.col("_num").cast("double") / den.cast("double"), 4)
            .alias("emd_4dp"),
            (F.col("_num") * F.lit(T_CLOSE_DEN)
             > den * F.lit(T_CLOSE_NUM)).cast("int").alias("t_violation"),
        )
    )


IA_MAX_POW = 22  # top power-of-two bucket (~48 days in seconds)


def _ia_bucket_case(gap: str) -> str:
    """Power-of-two bucket floor of a nonnegative BIGINT gap as one
    CASE chain -- identical text on both engines, no float log2."""
    arms = " ".join(
        f"WHEN {gap} >= {1 << k} THEN {1 << k}"
        for k in range(IA_MAX_POW, 0, -1)
    )
    return f"CASE {arms} ELSE 0 END"


def interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTER-ARRIVAL TIME distribution: the histogram of seconds
    between a user's consecutive events, bucketed by power-of-two
    floors -- the burstiness fingerprint capacity planning and bot
    detection read (humans cluster at minutes-scale buckets; scripted
    traffic piles into the sub-second ones). Emits one row per
    occupied bucket: [lo, hi) bounds in seconds, the count, and the
    share of all gaps.

    Exactness: gaps are exact integer seconds (microsecond epochs,
    truncating division), the bucket floor is a pure integer CASE
    chain, and the share is ONE division of exact counts.

    Scale shape: one per-user lag window over a pruned projection,
    then a partial-aggregated groupBy onto <= 24 bucket rows; the
    share join is against a broadcast scalar."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            (F.unix_micros(F.col("ts"))
             - F.unix_micros(F.lag("ts").over(w)))
            .cast("long").alias("us"),
        )
        .filter(F.col("us").isNotNull())
        .select(F.expr("us div 1000000").alias("gap"))
    )
    hist = gaps.groupBy(
        F.expr(_ia_bucket_case("gap")).cast("long").alias("bucket_lo")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = hist.agg(F.sum("n").alias("tot"))
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "bucket_lo",
            F.when(F.col("bucket_lo") == 0, 1)
            .otherwise(F.col("bucket_lo") * 2)
            .cast("long").alias("bucket_hi"),
            F.col("n").cast("long").alias("n"),
            (F.col("n").cast("double") / F.col("tot").cast("double"))
            .alias("share"),
        )
    )


VALUE_SCALE = 1_000_000  # event values carried in exact 1e-6 units


def _value_u(col) -> "F.Column":
    """Quantize a nonnegative double to BIGINT micro-units.
    ``floor(x * 1e6 + 0.5)`` is pure float64 mul/add/floor -- bit-
    deterministic and engine-identical (docs/ROUNDING.md)."""
    return F.floor(col * F.lit(float(VALUE_SCALE)) + F.lit(0.5)).cast("long")


def ohlc_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC CANDLESTICK downsample: per (event_type, day), the open
    (first value by event time), high, low, close (last value), event
    count, and total value -- the irregular-timeseries -> bar-chart
    rollup every telemetry dashboard draws (TimescaleDB's
    ``candlestick_agg`` shape).

    Exactness: open/close ride a lexicographic struct min/max over the
    total order (ts, event_id) -- no row_number shuffle pass; high/low
    are plain min/max (order-independent); the volume sum accumulates
    exact BIGINT micro-units and divides ONCE on emit.

    Scale shape: one partial-aggregated groupBy -- every aggregate
    (struct-min, min, max, sum, count) decomposes map-side, so the
    single shuffle carries <= |types| x |days| combiner rows no matter
    the corpus size. The same decomposability powers the STREAMING
    face :func:`ohlc_rollup_sink` (update-mode windowed agg merged by
    idempotent upsert; stream-equals-batch + replay convergence
    asserted)."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    first = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    return (
        ev.groupBy(F.col("event_type"), _day("ts").alias("day"))
        .agg(
            F.min(first).alias("fst"),
            F.max(first).alias("lst"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_value_u(F.col("value"))).alias("vol_u"),
        )
        .select(
            "event_type", "day",
            F.col("fst").getField("value").alias("open"),
            "high", "low",
            F.col("lst").getField("value").alias("close"),
            F.col("n_events").cast("long").alias("n_events"),
            (F.col("vol_u").cast("double") / float(VALUE_SCALE))
            .alias("total_value"),
        )
    )


M4_BUCKETS = 64  # fixed pixel-width bucket count of the M4 downsample


def _epoch_floor_s(col: str = "ts"):
    """Epoch seconds as FLOOR(micros / 1e6) in exact integer math for
    ANY sign. Measured reality (r12, refining the r11 ADVICE premise):
    BOTH engines' integer division truncates toward zero -- Spark DIV
    and DuckDB ``//`` on BIGINTs each give -1299993/1e6 -> -1 -- so a
    bare DIV was cross-engine CONSISTENT but semantically wrong: the
    epoch second holding t=0 spans two seconds of wall time and a
    pre-1970 M4 bucket/TWAP gap is off by one. Both sides therefore
    compute the true floor explicitly: ``m - posmod(m, q)`` is exactly
    divisible by ``q`` (posmod nonnegative), so the remaining integer
    division is exact and sign-safe with no float anywhere. Spark's
    ``pmod`` is already nonnegative; the oracle builds posmod as
    ``((m % q) + q) % q`` (:data:`_EPOCH_FLOOR_S_SQL`); the pre-epoch
    parity test covers both operators."""
    return F.expr(
        f"(unix_micros({col}) - pmod(unix_micros({col}), 1000000)) "
        "DIV 1000000"
    )


# DuckDB twin of _epoch_floor_s (see its docstring): true floor via the
# positive-mod identity, all-integer
_EPOCH_FLOOR_S_SQL = (
    "(epoch_us(ts) - ((epoch_us(ts) % 1000000) + 1000000) % 1000000) "
    "// 1000000"
)


def m4_downsample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 DOWNSAMPLING (Jugel et al., VLDB 2014): per event type,
    split the corpus's GLOBAL time range into ``M4_BUCKETS``
    equal-width buckets (one per rendered pixel column) and keep
    exactly the four extremum points per bucket -- first, last, min,
    max, each WITH its timestamp. M4 is the downsample with the
    error-free line-rendering guarantee: a chart drawn from the 4
    points per pixel is pixel-identical to one drawn from every raw
    row, which is what makes it the standard telemetry-dashboard
    reducer (vs OHLC, which keeps calendar-day bars and drops the
    extremum timestamps).

    Exactness: epoch seconds come from :func:`_epoch_floor_s` (true
    floor division, sign-safe -- both engines' bare integer division
    truncates toward zero, which is cross-engine consistent but gives
    the epoch second a double-width bucket; both sides floor
    explicitly, pre-epoch parity test-asserted); the bucket
    index is then pure integer arithmetic on them
    (``(s - mn) * B DIV (mx - mn + 1)`` -- nonneg operands once mn is
    subtracted, so Spark DIV and DuckDB // agree); first/last ride
    lexicographic
    struct min/max over the total order (s, event_id); min/max points
    over (value, s, event_id) -- event_id unique, so every selection
    is deterministic and no float math is introduced anywhere (values
    pass through untouched).

    Scale shape: one scalar min/max aggregate broadcast back (one-row
    crossJoin), then ONE partial-aggregated groupBy -- every
    aggregate (struct-min/max, count) decomposes map-side, so the
    single shuffle carries <= |types| x B combiner rows regardless of
    corpus size. The bucket width is fixed by the OUTPUT (pixels),
    not the data: 100 TB of events still reduces to the same
    |types| x B x 4 points."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    base = ev.select(
        "event_type", "event_id", "value",
        _epoch_floor_s("ts").alias("s"),
    )
    rng = base.agg(F.min("s").alias("mn"), F.max("s").alias("mx"))
    b = base.crossJoin(F.broadcast(rng)).withColumn(
        "bucket",
        F.expr(f"CAST(((s - mn) * {M4_BUCKETS}) DIV (mx - mn + 1) AS INT)"),
    )
    tkey = F.struct(F.col("s"), F.col("event_id"), F.col("value"))
    vkey = F.struct(F.col("value"), F.col("s"), F.col("event_id"))
    return (
        b.groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.min(tkey).alias("fst"), F.max(tkey).alias("lst"),
            F.min(vkey).alias("lo"), F.max(vkey).alias("hi"),
        )
        .select(
            "event_type", "bucket", "n_points",
            F.col("fst").getField("value").alias("v_first"),
            F.col("fst").getField("s").cast("long").alias("ts_first_s"),
            F.col("lo").getField("value").alias("v_min"),
            F.col("lo").getField("s").cast("long").alias("ts_min_s"),
            F.col("hi").getField("value").alias("v_max"),
            F.col("hi").getField("s").cast("long").alias("ts_max_s"),
            F.col("lst").getField("value").alias("v_last"),
            F.col("lst").getField("s").cast("long").alias("ts_last_s"),
        )
    )


def twap_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED AVERAGE value per user, last-observation-carried-
    forward: each event's value holds until the user's next event, so
    the mean is weighted by holding time, not by event count -- the
    correct "average sensor reading" / "average position" statistic
    for irregular telemetry (a burst of identical readings no longer
    dominates the mean). Weights are whole seconds; a user's last
    event carries no weight (nothing follows it to bound the hold).

    Exactness: value in BIGINT micro-units, weight = exact integer
    second gap from the lead event, ``sum(value_u * gap_s)`` an exact
    BIGINT aggregate, ONE division on emit. Headroom: the sum is
    bounded by max(value_u) x total span seconds (values <= ~1e3 over
    a 10-year span: ~3e17, inside BIGINT) because gaps telescope to
    the span. Users whose events all share one second emit NULL twap
    over zero weight.

    Scale shape: one per-user lead window over a 4-column projection,
    then a partial-aggregated per-user groupBy; no join, no second
    shuffle (the window and the groupBy share the user_id hash
    partitioning)."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    rows = ev.select(
        "user_id", "event_id",
        _epoch_floor_s("ts").alias("s"),
        _value_u(F.col("value")).alias("value_u"),
    ).withColumn("gap_s", F.lead("s").over(w) - F.col("s"))
    return (
        rows.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (F.max("s") - F.min("s")).cast("long").alias("span_s"),
            F.sum(F.col("value_u") * F.col("gap_s")).alias("num_u"),
            F.sum("gap_s").alias("den_s"),
        )
        .select(
            "user_id", "n_events", "span_s",
            (F.col("num_u").cast("double")
             / (F.nullif(F.col("den_s"), F.lit(0)) * VALUE_SCALE)
             .cast("double")).alias("twap"),
        )
    )


DEBOUNCE_SECONDS = 1800  # repeat deliveries within 30 min collapse


def event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TELEMETRY DEBOUNCE: collapse bursts of repeat deliveries of the
    same signal -- within (user_id, event_type), consecutive events
    closer than DEBOUNCE_SECONDS merge into one burst and only the
    FIRST event survives, annotated with how many deliveries it
    suppressed and the burst's span. Unlike sessionization (which
    emits per-session STATS), this emits the deduplicated EVENT rows
    -- the "drop redundant sensor re-reports" pass an MQTT ingest runs
    before counting anything.

    Boundary contract: a gap of EXACTLY the threshold stays in the
    burst (merge on gap <= D, split on strict >) -- the same rule
    Spark's session_window applies, ASSERTED by the streaming twin
    :func:`debounce_plan` (stream == batch == this operator, including
    an exactly-at-threshold pair; tests/test_streaming.py).

    Scale shape: one lag window + one running-sum window (same
    partitioning, one shuffle) numbers the bursts; the burst groupBy
    reuses that partitioning; struct-min picks the kept event without
    a row_number pass."""
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "is_start",
        F.when(gap.isNull()
               | (gap > DEBOUNCE_SECONDS * 1_000_000), 1).otherwise(0),
    ).withColumn(
        "burst",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    kept = F.struct(F.col("ts"), F.col("event_id"))
    return (
        flagged.groupBy("user_id", "event_type", "burst")
        .agg(
            F.min(kept).alias("fst"),
            F.count(F.lit(1)).alias("n"),
            (F.expr("unix_micros(max(ts))") - F.expr("unix_micros(min(ts))"))
            .alias("span_us"),
        )
        .select(
            "user_id", "event_type",
            F.col("fst").getField("event_id").alias("event_id"),
            F.date_format(F.col("fst").getField("ts"),
                          "yyyy-MM-dd HH:mm:ss").alias("kept_ts"),
            (F.col("n") - 1).cast("long").alias("n_suppressed"),
            F.expr("span_us div 1000000").cast("long").alias("burst_span_s"),
        )
    )


def debounce_plan(events: DataFrame, gap_seconds: int = DEBOUNCE_SECONDS,
                  watermark: str = "2 hours") -> DataFrame:
    """:func:`event_debounce`'s STREAMING twin, and the executable
    proof of its boundary-contract claim: ``session_window`` keyed by
    (user_id, event_type) with the debounce gap. Spark's session merge
    rule (an event extends the session while ``ts <= prev_end``) is
    exactly the batch operator's ``gap <= D`` merge, so an
    edge-aligned pair lands in ONE burst on both paths --
    ``tests/test_streaming.py`` asserts stream == batch == the lag/
    running-sum operator on a corpus with an exactly-at-threshold row.
    Keep-first is the same lexicographic struct-min; the suppressed
    count is ``n - 1``.

    Scale shape (streaming): state is per (user_id, event_type)
    session, evicted once the watermark passes the session end -- the
    native bounded-state debounce an MQTT ingest runs ahead of
    counting. On batch the same plan is one session_window agg."""
    src = (events.withWatermark("ts", watermark)
           if events.isStreaming else events)
    kept = F.struct(F.col("ts"), F.col("event_id"))
    return (
        src.filter(F.col("ts").isNotNull())
        .groupBy(
            F.session_window("ts", f"{gap_seconds} seconds"),
            "user_id", "event_type",
        )
        .agg(
            F.min(kept).alias("fst"),
            F.count(F.lit(1)).alias("n"),
            (F.expr("unix_micros(max(ts))") - F.expr("unix_micros(min(ts))"))
            .alias("span_us"),
        )
        .select(
            "user_id", "event_type",
            F.col("fst").getField("event_id").alias("event_id"),
            F.date_format(F.col("fst").getField("ts"),
                          "yyyy-MM-dd HH:mm:ss").alias("kept_ts"),
            (F.col("n") - 1).cast("long").alias("n_suppressed"),
            F.expr("span_us div 1000000").cast("long").alias("burst_span_s"),
        )
    )


def ohlc_rollup_sink(stream_events: DataFrame, path: str,
                     checkpoint_dir: str, watermark: str = "2 hours"):
    """:func:`ohlc_daily_by_type`'s STREAMING face, built on the
    ``continuous_rollup_sink`` template: daily OHLC bars maintained
    incrementally as events arrive. The day-window aggregation runs in
    update mode (each micro-batch re-emits only the bars it changed,
    computed from streaming state -- every aggregate here (struct
    min/max for open/close, min/max, count, BIGINT micro-unit sum)
    decomposes incrementally), and ``foreachBatch`` merges changed
    bars into the persisted table through the idempotent
    content-addressed upsert keyed on (event_type, day). Replays and
    late events within the watermark CONVERGE: the emitted bar is the
    state's current value, and the upsert overwrites by key.

    Returns the started StreamingQuery; read bars back with
    ``spark.read.parquet(path)`` (same columns as the batch query,
    plus the ``id`` merge key)."""
    from ..sinks import upsert_table

    src = (
        stream_events.withWatermark("ts", watermark)
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
    )
    first = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    bars = (
        src.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.min(first).alias("fst"),
            F.max(first).alias("lst"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_value_u(F.col("value"))).alias("vol_u"),
        )
        .select(
            "event_type",
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            F.col("fst").getField("value").alias("open"),
            "high", "low",
            F.col("lst").getField("value").alias("close"),
            F.col("n_events").cast("long").alias("n_events"),
            (F.col("vol_u").cast("double") / float(VALUE_SCALE))
            .alias("total_value"),
        )
    )
    keyed = bars.select(
        F.concat_ws("|", "event_type", "day").alias("id"), "*"
    )

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_table(batch_df.sparkSession, batch_df, path, id_col="id")

    return (
        keyed.writeStream
        .outputMode("update")
        .foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def m4_rollup_sink(stream_events: DataFrame, path: str,
                   checkpoint_dir: str, bucket: str = "1 hour",
                   watermark: str = "2 hours"):
    """:func:`m4_downsample_events`'s STREAMING face. One deliberate
    difference from the batch query: the batch buckets split the
    corpus's GLOBAL [min, max] time range (a data-dependent rule a
    stream cannot maintain incrementally -- every arrival could move
    the boundaries and restripe history), so the streaming face keeps
    M4 points per FIXED wall-clock window (``bucket``) -- the
    dashboard-viewport shape a live chart actually renders. Every
    aggregate (struct min/max over total orders, count) decomposes
    incrementally; update mode re-emits only changed buckets and
    ``foreachBatch`` merges them through the idempotent upsert keyed
    on (event_type, bucket_start). Replays and late-within-watermark
    events converge (state value + overwrite-by-key).

    Returns the started StreamingQuery; read points back with
    ``spark.read.parquet(path)``."""
    from ..sinks import upsert_table

    src = (
        stream_events.withWatermark("ts", watermark)
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .withColumn("s", _epoch_floor_s("ts"))
    )
    tkey = F.struct(F.col("s"), F.col("event_id"), F.col("value"))
    vkey = F.struct(F.col("value"), F.col("s"), F.col("event_id"))
    pts = (
        src.groupBy(F.window("ts", bucket).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.min(tkey).alias("fst"), F.max(tkey).alias("lst"),
            F.min(vkey).alias("lo"), F.max(vkey).alias("hi"),
        )
        .select(
            "event_type",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
            .alias("bucket_start"),
            "n_points",
            F.col("fst").getField("value").alias("v_first"),
            F.col("fst").getField("s").cast("long").alias("ts_first_s"),
            F.col("lo").getField("value").alias("v_min"),
            F.col("lo").getField("s").cast("long").alias("ts_min_s"),
            F.col("hi").getField("value").alias("v_max"),
            F.col("hi").getField("s").cast("long").alias("ts_max_s"),
            F.col("lst").getField("value").alias("v_last"),
            F.col("lst").getField("s").cast("long").alias("ts_last_s"),
        )
    )
    keyed = pts.select(
        F.concat_ws("|", "event_type", "bucket_start").alias("id"), "*"
    )

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_table(batch_df.sparkSession, batch_df, path, id_col="id")

    return (
        keyed.writeStream
        .outputMode("update")
        .foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-LITE seasonal decomposition of the daily event count:
    trend = centered 7-day moving average (NULL at the edges where
    the window is incomplete -- partial windows would fake a trend),
    seasonal = each weekday's mean detrended value, remainder = the
    rest -- the classic additive decomposition an anomaly monitor
    runs before alerting (daily_anomaly_zscore flags outliers; this
    explains the weekly shape they sit on).

    Exactness: the decomposition is carried in 7x integer units as
    long as possible -- ``det7 = 7*n - sum7`` is an exact BIGINT, the
    weekday aggregation sums those exactly, and each emitted float is
    ONE correctly-rounded division of exact integers (trend = sum7/7,
    seasonal = sum(det7)/(7*cnt)); the remainder combines them in a
    fixed operand order -- bit-identical across engines with no float
    accumulation anywhere (docs/ROUNDING.md rules 1/3).

    Scale shape: one partial-aggregated groupBy to day grain
    (365-rows-per-year output regardless of event volume), then two
    windows over that tiny frame."""
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    t = daily.select(
        "d", "n",
        F.when(F.count(F.lit(1)).over(w7) == 7, F.sum("n").over(w7))
        .alias("sum7"),
        # Spark dayofweek: 1=Sunday; DuckDB dayofweek: 0=Sunday --
        # pin the ISO convention via (dow index normalized to Monday=0)
        F.expr("(dayofweek(d) + 5) % 7").cast("int").alias("dow"),
    )
    season = (
        t.filter(F.col("sum7").isNotNull())
        .groupBy("dow")
        .agg(
            F.sum(F.expr("7 * n - sum7")).alias("det7_sum"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return (
        t.join(F.broadcast(season), "dow", "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dow",
            F.col("n").cast("long").alias("n"),
            (F.col("sum7").cast("double") / 7).alias("trend"),
            (F.col("det7_sum").cast("double")
             / (7 * F.col("cnt")).cast("double")).alias("seasonal"),
            (F.col("n").cast("double")
             - F.col("sum7").cast("double") / 7
             - F.col("det7_sum").cast("double")
             / (7 * F.col("cnt")).cast("double")).alias("remainder"),
        )
    )


SEQ_TOP = 20  # trigram patterns reported


def session_trigram_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FREQUENT BEHAVIOR SEQUENCES: the ``SEQ_TOP`` most common
    3-step event-type sequences across all users (consecutive by
    (ts, event_id) within a user) with support counts and the share
    of all trigrams -- the PrefixSpan-lite report a product team
    reads to find dominant flows (view->click->purchase vs
    view->view->view doomscrolling), completing the sequence family
    next to the pair-level Markov chain. Ties rank deterministically
    (count DESC, then the three steps ASC).

    The only float is the support share: ONE division of two exact
    integers. Scale shape: one per-user lag window over a pruned
    projection (the sessionization shuffle shape), a partially-
    aggregated trigram count (|event types|^3-bounded output), and a
    sort-LIMIT top-k -- never a global window over unbounded rows;
    the rank label is a window over the k surviving rows."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select(
            F.lag("event_type", 2).over(w).alias("t1"),
            F.lag("event_type", 1).over(w).alias("t2"),
            F.col("event_type").alias("t3"),
        )
        .filter(F.col("t1").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = tri.agg(F.sum("n").alias("tot"))
    top = (
        tri.orderBy(F.desc("n"), F.asc("t1"), F.asc("t2"), F.asc("t3"))
        .limit(SEQ_TOP)
    )
    wr = Window.orderBy(F.desc("n"), F.asc("t1"), F.asc("t2"), F.asc("t3"))
    return (
        top.withColumn("rank", F.row_number().over(wr).cast("int"))
        .crossJoin(F.broadcast(tot))
        .select(
            "rank", "t1", "t2", "t3",
            F.col("n").cast("long").alias("n"),
            (F.col("n").cast("double") / F.col("tot").cast("double"))
            .alias("support_share"),
        )
    )


AB_Z_CRIT = 1.96      # two-sided 95% critical value
AB_CONV_VALUE = 150.0  # conversion = a purchase at or above this value


def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-PROPORTION Z-TEST over an A/B assignment of the event
    stream's users: variant = user_id parity (the registry's
    deterministic stand-in for an assignment table -- production
    passes a real one and the plan is identical), conversion = the
    user produced at least one HIGH-VALUE purchase
    (``value >= AB_CONV_VALUE``; bare any-purchase is degenerate on
    this stream -- every user has one -- and a p=1 pool has zero
    variance). A zero-variance or empty-arm corpus emits a NULL
    z-score and ``significant = 0`` rather than a division crash.
    Emits one row carrying both arms' exact counts, the conversion
    rates, the pooled z-statistic, and the 95% verdict -- the
    decision query every product experiment ends with.

    Exactness: all counts are exact integers; rates and the
    z-statistic are a fixed dag of correctly-rounded double ops
    (divisions, one sqrt) over those integers, evaluated in identical
    operand order on both engines -- bit-identical without any
    rounding step (docs/ROUNDING.md rule 3, the
    embedding_standardize precedent for sqrt).

    Scale shape: one distinct aggregation per user (map-side
    combined) then a two-row conditional aggregate; the z arithmetic
    runs on a single row."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    users = ev.groupBy("user_id").agg(
        F.max(
            ((F.col("event_type") == "purchase")
             & (F.col("value") >= AB_CONV_VALUE)).cast("int")
        ).alias("converted")
    ).select(
        (F.col("user_id") % 2 == 0).cast("int").alias("variant_a"),
        "converted",
    )
    agg = users.agg(
        F.sum("variant_a").cast("long").alias("n_a"),
        F.sum(F.col("variant_a") * F.col("converted")).cast("long")
        .alias("conv_a"),
        F.sum(1 - F.col("variant_a")).cast("long").alias("n_b"),
        F.sum((1 - F.col("variant_a")) * F.col("converted")).cast("long")
        .alias("conv_b"),
    )
    # every divisor nullif-guarded: ANSI Spark throws on double/0
    # while DuckDB yields NULL -- the explicit guard pins NULL on both
    _pa = "cast(conv_a as double) / nullif(cast(n_a as double), 0.0)"
    _pb = "cast(conv_b as double) / nullif(cast(n_b as double), 0.0)"
    _pp = ("(cast(conv_a as double) + cast(conv_b as double))"
           " / nullif(cast(n_a as double) + cast(n_b as double), 0.0)")
    p_a, p_b = F.expr(_pa), F.expr(_pb)
    z = F.expr(
        f"(({_pa}) - ({_pb})) / nullif(sqrt(({_pp}) * (1.0 - ({_pp}))"
        f" * (1.0 / nullif(cast(n_a as double), 0.0)"
        f" + 1.0 / nullif(cast(n_b as double), 0.0))), 0.0)"
    )
    return agg.select(
        "n_a", "conv_a", "n_b", "conv_b",
        p_a.alias("rate_a"), p_b.alias("rate_b"),
        z.alias("z_score"),
        F.when(F.abs(z) > AB_Z_CRIT, 1).otherwise(0)
        .cast("int").alias("significant"),
    )


MKV_ITERS = 3                  # unrolled power iterations
MKV_PI_SCALE = 1_000_000       # stationary mass carried in 1e-6 units
MKV_Q_SCALE = 1_000_000_000    # transition probs in 1e-9 units


def markov_transition_stationary(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """MARKOV CHAIN of the event stream: per-user consecutive
    (src -> dst) event-type transitions, Laplace-smoothed transition
    probabilities, and the chain's stationary distribution by
    ``MKV_ITERS`` unrolled power iterations from uniform -- the
    behavioral fingerprint (where does a user's session gravitate?)
    that complements the literal next-event training pairs. Emits one
    row per (src, dst) cell carrying the transition count, the
    smoothed probability, and the src state's stationary mass.

    Exactness: probabilities are integer 1e-9 units via ONE
    truncating division; each power-iteration term is
    ``(pi_src * q) div Q_SCALE`` -- all BIGINT (pi <= 1e6, q <= 1e9:
    products <= 1e15, far under 2^63), so the fixed-iteration result
    is bit-identical to the unrolled-CTE oracle with no float
    anywhere (docs/ROUNDING.md rule 1).

    Scale shape: the transition build is one per-user lag window over
    a pruned (user, ts, type) projection -- the sessionization
    shuffle shape; everything after collapses to the |states|^2 cell
    table (event-type cardinality is small by nature), broadcast
    through the iterations; the corpus is never rescanned."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # trans is the ONLY corpus-scale pass (lag window + groupBy) and
    # collapses to <= |states|^2 rows; every downstream consumer
    # (states x2, the n_states count, grid, row_tot, q, and each
    # unrolled power iteration) re-embedded the whole subtree before
    # r12, so the final plan re-ran the events scan + window shuffle
    # ~(iters + 4) times. The lazy localCheckpoint runs it once.
    trans = (
        ev.select(
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .filter(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    states = (
        trans.select(F.col("src").alias("s"))
        .unionByName(trans.select(F.col("dst").alias("s")))
        .distinct()
    )
    n_states = states.count()  # event-type cardinality: tiny, bounded
    grid = (
        states.select(F.col("s").alias("src"))
        .crossJoin(F.broadcast(states.select(F.col("s").alias("dst"))))
    )
    row_tot = trans.groupBy("src").agg(F.sum("c").alias("rt"))
    q = (
        grid.join(trans, ["src", "dst"], "left")
        .join(row_tot, "src", "left")
        .select(
            "src", "dst",
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
            F.expr(
                f"(coalesce(c, 0) + 1) * cast({MKV_Q_SCALE} as bigint)"
                f" div (coalesce(rt, 0) + {n_states})"
            ).alias("q_u"),
        )
        # n^2 rows, re-read by every iteration and the final join
        .localCheckpoint(eager=False)
    )
    pi = states.select(
        F.col("s").alias("src"),
        F.lit(MKV_PI_SCALE // n_states).cast("long").alias("pi"),
    )
    for _ in range(MKV_ITERS):
        pi = (
            q.join(pi, "src")
            .select(
                F.col("dst").alias("s"),
                F.expr(f"(pi * q_u) div {MKV_Q_SCALE}").alias("t"),
            )
            .groupBy(F.col("s").alias("src"))
            .agg(F.sum("t").alias("pi"))
        )
    return (
        q.join(pi.withColumnRenamed("pi", "stationary_u"), "src")
        .select("src", "dst", "c", "q_u", "stationary_u")
    )


def _markov_oracle_sql(iters: int = MKV_ITERS) -> str:
    parts = [f"""
        ev AS (
            SELECT user_id, ts, event_id, event_type FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
              AND event_type IS NOT NULL
        ),
        trans AS (
            SELECT src, dst, count(*) AS c FROM (
                SELECT lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS src,
                       event_type AS dst
                FROM ev
            ) WHERE src IS NOT NULL GROUP BY src, dst
        ),
        states AS (
            SELECT src AS s FROM trans
            UNION SELECT dst FROM trans
        ),
        ns AS (SELECT count(*) AS n FROM states),
        row_tot AS (SELECT src, sum(c) AS rt FROM trans GROUP BY src),
        q AS (
            SELECT g.src, g.dst,
                   CAST(coalesce(t.c, 0) AS BIGINT) AS c,
                   CAST((coalesce(t.c, 0) + 1) * {MKV_Q_SCALE}
                        // (coalesce(r.rt, 0) + (SELECT n FROM ns))
                        AS BIGINT) AS q_u
            FROM (SELECT a.s AS src, b.s AS dst
                  FROM states a CROSS JOIN states b) g
            LEFT JOIN trans t ON t.src = g.src AND t.dst = g.dst
            LEFT JOIN row_tot r ON r.src = g.src
        ),
        pi0 AS (
            SELECT s AS src,
                   CAST({MKV_PI_SCALE} // (SELECT n FROM ns) AS BIGINT)
                       AS pi
            FROM states
        )"""]
    for t in range(1, iters + 1):
        parts.append(f"""
        pi{t} AS (
            SELECT q.dst AS src,
                   CAST(sum((p.pi * q.q_u) // {MKV_Q_SCALE}) AS BIGINT)
                       AS pi
            FROM q JOIN pi{t - 1} p ON p.src = q.src
            GROUP BY q.dst
        )""")
    return f"""
        WITH {",".join(parts)}
        SELECT q.src, q.dst, q.c, q.q_u, p.pi AS stationary_u
        FROM q JOIN pi{iters} p ON p.src = q.src
    """


EWMA_K = 8             # lags folded into the control statistic
EWMA_W_SCALE = 10 ** 9  # integer weight units
# alpha = 0.3 EWMA weights alpha*(1-alpha)^i, precomputed ONCE here as
# exact integer literals -- neither engine evaluates a float power
# (docs/ROUNDING.md: transcendentals/powers are not correctly-rounded
# cross-engine; a literal table is)
EWMA_WEIGHTS = [round(0.3 * (0.7 ** i) * EWMA_W_SCALE)
                for i in range(EWMA_K)]


def ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA CONTROL CHART over the per-(event_type, day) count series
    -- the classic SPC monitor (an EWMA reacts to small sustained
    shifts that a plain z-score misses; this sits beside
    ``daily_anomaly_zscore`` and ``seasonal_decompose_daily`` in the
    anomaly stack). For each day, the exponentially weighted moving
    average of the ``EWMA_K`` most recent PRIOR observed days (the
    current day is excluded -- SPC compares x_t against EWMA_{t-1},
    otherwise the spike under test drags its own baseline up; lag
    chain with precomputed integer weight literals, renormalized over
    the lags that exist so the series start is unbiased), and the
    deviation ratio of today's count against it; ``flag_high`` /
    ``flag_low`` mark 2x / 0.5x breaks. A series' first day has no
    baseline: ewma/dev emit NULL and both flags false.

    Exactness: weights are integer literals; the weighted sum and the
    renormalizing denominator are exact BIGINTs; ``ewma_u`` and
    ``dev_u`` are each ONE staged integer division emitted in 1e-6
    units -- bit-equal across engines, no float, no power(). The
    ``dev_u`` product ``cnt * 1e6 * den`` is staged through
    DECIMAL(38,0) (HUGEINT on the DuckDB side): ``den`` sums the
    EWMA weights (~9.4e8), so a BIGINT product would wrap silently
    (non-ANSI Spark) once a (type, day) count passed ~9.8e3 events;
    the decimal staging is exact to cnt ~ 1e22 and ``div`` still
    emits BIGINT on both engines.

    Scale shape: one partial-aggregated shuffle collapses events to
    day grain; the lag window then runs over |types| x |days| rows
    only. Missing days are absent rows, so the chart is over the
    observed series (documented; densifying to calendar days is a
    sequence-explode away and changes no machinery)."""
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        F.col("event_type"), _day("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("day")
    num = None
    den = None
    for i, wt in enumerate(EWMA_WEIGHTS):
        lagged = F.lag("cnt", i + 1).over(w)
        term = F.when(lagged.isNotNull(), lagged * F.lit(wt)) \
            .otherwise(F.lit(0)).cast("long")
        present = F.when(lagged.isNotNull(), F.lit(wt)) \
            .otherwise(F.lit(0)).cast("long")
        num = term if num is None else num + term
        den = present if den is None else den + present
    scored = daily.select(
        "event_type", "day", F.col("cnt").cast("long").alias("cnt"),
        num.alias("num"), den.alias("den"),
    )
    ewma_u = F.expr(
        "CASE WHEN den = 0 THEN NULL ELSE (num * 1000000) div den END")
    dev_u = F.expr(
        "CASE WHEN den = 0 OR num = 0 THEN NULL "
        "ELSE (CAST(cnt AS DECIMAL(38,0)) * 1000000 * den) div num END")
    return scored.select(
        "event_type", "day", "cnt",
        ewma_u.cast("long").alias("ewma_u"),
        dev_u.cast("long").alias("dev_u"),
        F.coalesce(dev_u > 2_000_000, F.lit(False)).alias("flag_high"),
        F.coalesce(dev_u < 500_000, F.lit(False)).alias("flag_low"),
    )


def _ewma_oracle_sql() -> str:
    num = " + ".join(
        f"CASE WHEN lag(cnt, {i + 1}) OVER w IS NOT NULL THEN "
        f"lag(cnt, {i + 1}) OVER w * {wt} ELSE 0 END"
        for i, wt in enumerate(EWMA_WEIGHTS)
    )
    den = " + ".join(
        f"CASE WHEN lag(cnt, {i + 1}) OVER w IS NOT NULL THEN {wt} "
        f"ELSE 0 END"
        for i, wt in enumerate(EWMA_WEIGHTS)
    )
    return f"""
        WITH daily AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events WHERE ts IS NOT NULL
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT event_type, day, cnt,
                   CAST({num} AS BIGINT) AS num,
                   CAST({den} AS BIGINT) AS den
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day)
        )
        SELECT event_type, day, cnt,
               CAST(CASE WHEN den = 0 THEN NULL
                    ELSE (num * 1000000) // den END AS BIGINT) AS ewma_u,
               CAST(CASE WHEN den = 0 OR num = 0 THEN NULL
                    ELSE (CAST(cnt AS HUGEINT) * 1000000 * den) // num END AS BIGINT)
                   AS dev_u,
               coalesce(CASE WHEN den = 0 OR num = 0 THEN NULL
                    ELSE (CAST(cnt AS HUGEINT) * 1000000 * den) // num END > 2000000,
                    FALSE) AS flag_high,
               coalesce(CASE WHEN den = 0 OR num = 0 THEN NULL
                    ELSE (CAST(cnt AS HUGEINT) * 1000000 * den) // num END < 500000,
                    FALSE) AS flag_low
        FROM scored
    """


SEQ_PATTERN = ("view", "click", "purchase")  # strict-succession motif


def seq_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: find every STRICT-SUCCESSION occurrence
    of the ``view -> click -> purchase`` motif in each user's event
    stream (no intervening events of any type) -- the row-pattern
    query SQL:2016 added and most engines still lack, expressed as a
    lead chain over the per-user total order (ts, event_id). Emits
    the anchor row and the match span; overlapping matches are all
    reported (each anchor row is its own match), exactly like
    ``MATCH_RECOGNIZE ... AFTER MATCH SKIP TO NEXT ROW``.

    Scale shape: ONE window shuffle on user_id, then map-only lead
    comparisons; output is proportional to matches."""
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    led = ev.select(
        "user_id", "event_id", "ts", "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("event_id", 2).over(w).alias("end_id"),
        F.lead("ts", 2).over(w).alias("end_ts"),
    )
    a, b, c = SEQ_PATTERN
    return (
        led.filter(
            (F.col("event_type") == a) & (F.col("t1") == b)
            & (F.col("t2") == c)
        )
        .select(
            "user_id",
            F.col("event_id").alias("start_event_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
            F.col("end_id").cast("long").alias("end_event_id"),
            (F.unix_micros("end_ts") - F.unix_micros("ts"))
            .cast("long").alias("span_us"),
        )
    )


def _seq_pattern_oracle_sql() -> str:
    a, b, c = SEQ_PATTERN
    return f"""
        WITH led AS (
            SELECT user_id, event_id, ts, event_type,
                   lead(event_type, 1) OVER w AS t1,
                   lead(event_type, 2) OVER w AS t2,
                   lead(event_id, 2) OVER w AS end_id,
                   lead(ts, 2) OVER w AS end_ts
            FROM events WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, event_id AS start_event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS start_ts,
               CAST(end_id AS BIGINT) AS end_event_id,
               CAST(epoch_us(end_ts) - epoch_us(ts) AS BIGINT) AS span_us
        FROM led
        WHERE event_type = '{a}' AND t1 = '{b}' AND t2 = '{c}'
    """


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION -- the classic customer-analytics rollup: per
    user, Recency (days since last event, anchored at the corpus max
    so the report is replay-stable), Frequency (event count), Monetary
    (exact micro-unit value sum), each scored into quintiles by
    ``ntile(5)`` over a TOTAL order (metric, then user_id -- equal
    metrics tie-break deterministically, and SQL's ntile fill rule
    (earlier tiles take the remainder) is identical in both engines),
    plus the standard segment labels marketing reads off the grid.

    Scale shape: one partial-aggregated groupBy collapses events to
    user grain; the three ntile windows then run over user-cardinality
    rows (at real scale: users ~ millions, a single global window per
    metric -- acceptable because the frame is user-grain, or swap to
    percent_rank bucketing over a range-partitioned sort; the grain
    reduction is the point)."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    anchor = ev.agg(F.max(_day("ts")).alias("anchor_day"))
    per = (
        ev.groupBy("user_id")
        .agg(
            F.max(_day("ts")).alias("last_day"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.coalesce(F.sum(_value_u(F.col("value"))), F.lit(0))
            .cast("long").alias("monetary_u"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff(F.to_date("anchor_day"), F.to_date("last_day"))
            .cast("int").alias("recency_days"),
            "frequency", "monetary_u",
        )
    )
    # score 5 = best: most recent, most frequent, highest spend.
    # r8: the three single-reducer ntile() windows became three
    # distributed_rank passes + the exact ntile fill-rule expression
    # (identical tile assignment, oracle unchanged). tie_split
    # matters for all three keys: recency has ~|days| distinct
    # values and frequency piles up at 1-2 -- exactly the heavy-tie
    # runs the second-key sub-split spreads across buckets.
    from .rank import distributed_rank, ntile_from_rank

    ranked = distributed_rank(
        per, [(F.col("recency_days"), False), (F.col("user_id"), True)],
        rn_col="_rrn", n_col="_n",
    )
    ranked = distributed_rank(
        ranked, [(F.col("frequency"), True), (F.col("user_id"), True)],
        rn_col="_frn",
    )
    ranked = distributed_rank(
        ranked, [(F.col("monetary_u"), True), (F.col("user_id"), True)],
        rn_col="_mrn",
    )
    scored = ranked.select(
        "user_id", "recency_days", "frequency", "monetary_u",
        ntile_from_rank("_rrn", "_n", 5).alias("r_score"),
        ntile_from_rank("_frn", "_n", 5).alias("f_score"),
        ntile_from_rank("_mrn", "_n", 5).alias("m_score"),
    )
    seg = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4)
               & (F.col("m_score") >= 4), "champion")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4),
              "at_risk_loyal")
        .when((F.col("r_score") >= 4) & (F.col("f_score") <= 2),
              "new_or_reactivated")
        .otherwise("core")
    )
    return scored.select("*", seg.alias("segment"))


def _rfm_oracle_sql() -> str:
    return """
        WITH ev AS (
            SELECT user_id, ts, value FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
        ),
        anchor AS (
            SELECT max(strftime(ts, '%Y-%m-%d')) AS anchor_day FROM ev
        ),
        per AS (
            SELECT user_id,
                   CAST(date_diff('day',
                        CAST(max(strftime(ts, '%Y-%m-%d')) AS DATE),
                        CAST((SELECT anchor_day FROM anchor) AS DATE))
                        AS INTEGER) AS recency_days,
                   CAST(count(*) AS BIGINT) AS frequency,
                   CAST(coalesce(sum(CAST(floor(value * 1000000.0 + 0.5)
                        AS BIGINT)), 0) AS BIGINT) AS monetary_u
            FROM ev GROUP BY user_id
        ),
        scored AS (
            SELECT user_id, recency_days, frequency, monetary_u,
                   CAST(ntile(5) OVER (ORDER BY recency_days DESC,
                        user_id ASC) AS INTEGER) AS r_score,
                   CAST(ntile(5) OVER (ORDER BY frequency ASC,
                        user_id ASC) AS INTEGER) AS f_score,
                   CAST(ntile(5) OVER (ORDER BY monetary_u ASC,
                        user_id ASC) AS INTEGER) AS m_score
            FROM per
        )
        SELECT *,
               CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                    THEN 'champion'
                    WHEN r_score <= 2 AND f_score >= 4
                    THEN 'at_risk_loyal'
                    WHEN r_score >= 4 AND f_score <= 2
                    THEN 'new_or_reactivated'
                    ELSE 'core' END AS segment
        FROM scored
    """


def time_to_event_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-EVENT label generation (survival analysis / propensity
    training): for every event, the microseconds until that user's
    NEXT purchase strictly after it -- the label a churn/conversion
    model trains on -- with ``censored = true`` when no purchase
    follows (the user's observation window ended first). Generated in
    ONE window pass: a forward-looking ``min`` over the conditional
    purchase timestamp (ROWS 1 FOLLOWING .. UNBOUNDED), never a self
    join.

    Scale shape: one shuffle on user_id, one ordered pass per user;
    output is one row per event. NULL-ts and NULL-user rows carry no
    timeline and are excluded (both engines)."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    w = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = F.min(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(w)
    return ev.select(
        "user_id", "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
        (F.unix_micros(nxt) - F.unix_micros("ts")).cast("long")
        .alias("tte_us"),
        nxt.isNull().alias("censored"),
    )


def item_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITEM-ITEM CO-OCCURRENCE with exact LIFT -- the basket-analysis
    rollup behind 'users who did A also did B': for every unordered
    pair of event types, how many users did both, and the lift
    ``P(A,B) / (P(A) * P(B))`` in exact micro-units via truncating
    integer division (``n_pair * n_users * 1e6 div (n_a * n_b)`` --
    DuckDB ``//`` == Spark ``div``; headroom: n_pair * n_users * 1e6
    stays under 2^63 up to ~3e6 users at full pair support, beyond
    which the factors cancel first or move to DECIMAL).

    Scale shape: the corpus collapses to DISTINCT (user, type) FIRST
    -- the only corpus-sized shuffle -- so the per-user self-join
    fans out over at most |types| rows per user (bounded vocabulary,
    never events^2); pair and marginal counts are partial-aggregated
    groupBys and the marginals broadcast back."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    ut = ev.select("user_id", "event_type").distinct()
    totals = ut.agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    marg = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_t")
    )
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
    )
    out = (
        pairs
        .join(F.broadcast(marg.select(
            F.col("event_type").alias("type_a"),
            F.col("n_t").alias("n_a"))), "type_a")
        .join(F.broadcast(marg.select(
            F.col("event_type").alias("type_b"),
            F.col("n_t").alias("n_b"))), "type_b")
        .crossJoin(F.broadcast(totals))
    )
    lift_u = F.expr("(n_pair * n_users * 1000000) div (n_a * n_b)")
    return out.select(
        "type_a", "type_b", "n_a", "n_b", "n_pair", "n_users",
        lift_u.alias("lift_u"),
        (lift_u.cast("double") / 1e6).alias("lift"),
    )


def anomaly_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP MOVERS -- the day-over-day ops report: the 20 largest
    per-type daily count swings, ranked by absolute change with the
    exact micro-unit percent change alongside (``(n - prev) * 1e6 div
    prev``, truncating division -- prev is always > 0 because only
    observed (type, day) rows enter the lag). Deterministic total
    order: (abs change DESC, day ASC, type ASC).

    Scale shape: one partial-aggregated shuffle collapses events to
    (type, day) grain; the lag window runs per type over calendar-
    cardinality rows; the global top-20 resolves as
    TakeOrderedAndProject -- 20 rows per partition to the driver,
    never a full sort."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    daily = ev.groupBy(
        F.col("event_type"), _day("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type", "day", "n",
        F.lag("n").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    delta = (F.col("n") - F.col("prev"))
    return (
        lagged.select(
            "event_type", "day", "n", "prev",
            delta.alias("delta"),
            F.expr("((n - prev) * 1000000) div prev").alias("pct_u"),
        )
        .orderBy(F.abs(F.col("delta")).desc(), F.col("day").asc(),
                 F.col("event_type").asc())
        .limit(20)
    )


PARETO_FRACS = (1, 5, 10, 20, 50)


def revenue_pareto_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REVENUE PARETO CURVE -- 'what share of revenue do the top k%
    of customers produce' (the 80/20 check finance asks first): rank
    customers by exact micro-unit spend (o_totalprice summed), take
    the running revenue at the ceil(k*n/100)-th customer for each
    pinned fraction, and report its share of total revenue. All sums
    and ranks are exact integers; shares are ratios of identical
    BIGINTs.

    Scale shape (r8): orders collapse to customer grain in ONE
    partial-aggregated shuffle; the rank AND the running revenue both
    come from the shared two-phase :func:`distributed_rank` (its
    ``cumsum`` face -- per-bucket revenue subtotals broadcast as
    offsets) instead of four single-reducer global windows; the
    corpus total broadcasts back as a one-row aggregate."""
    from .rank import distributed_rank

    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    spend_u = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    per = orders.select(
        "o_custkey", spend_u.alias("cents")
    ).groupBy("o_custkey").agg(F.sum("cents").alias("rev_u"))
    total = per.agg(F.sum("rev_u").cast("long").alias("total_rev_u"))
    ranked = distributed_rank(
        per, [(F.col("rev_u"), False), (F.col("o_custkey"), True)],
        rn_col="rn", n_col="n", cumsum={"run_rev_u": "rev_u"},
    ).crossJoin(F.broadcast(total)).select(
        "rn", "n", "run_rev_u", "total_rev_u"
    )
    targets = F.array(*[
        F.struct(
            F.lit(k).cast("int").alias("top_pct"),
            F.expr(f"({k} * n + 99) div 100").alias("k"),
        )
        for k in PARETO_FRACS
    ])
    hits = ranked.select(
        "rn", "n", "run_rev_u", "total_rev_u",
        F.filter(targets, lambda t: t["k"] == F.col("rn")).alias("ts"),
    ).filter(F.size("ts") > 0)
    return (
        hits.select("n", "run_rev_u", "total_rev_u",
                    F.explode("ts").alias("t"))
        .select(
            F.col("t.top_pct").alias("top_pct"),
            F.col("t.k").cast("long").alias("n_customers"),
            F.col("n").cast("long").alias("n_total"),
            "run_rev_u", "total_rev_u",
            (F.col("run_rev_u").cast("double")
             / F.col("total_rev_u").cast("double")).alias("rev_share"),
        )
    )


def _pareto_oracle_sql() -> str:
    legs = "\n        UNION ALL\n".join(
        f"""        SELECT CAST({k} AS INTEGER) AS top_pct,
               CAST(({k} * n + 99) // 100 AS BIGINT) AS n_customers,
               CAST(n AS BIGINT) AS n_total, run_rev_u, total_rev_u,
               CAST(run_rev_u AS DOUBLE) / CAST(total_rev_u AS DOUBLE)
                   AS rev_share
        FROM ranked WHERE rn = ({k} * n + 99) // 100"""
        for k in PARETO_FRACS
    )
    return f"""
        WITH per AS (
            SELECT o_custkey,
                   CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5)
                        AS BIGINT)) AS BIGINT) AS rev_u
            FROM orders
            WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
            GROUP BY o_custkey
        ),
        ranked AS (
            SELECT row_number() OVER (
                       ORDER BY rev_u DESC, o_custkey ASC) AS rn,
                   count(*) OVER () AS n,
                   CAST(sum(rev_u) OVER (
                       ORDER BY rev_u DESC, o_custkey ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS run_rev_u,
                   CAST(sum(rev_u) OVER () AS BIGINT) AS total_rev_u
            FROM per
        )
{legs}
    """


def ship_lag_by_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUPPLIER FULFILLMENT LAG -- the procurement scorecard: per
    supplier, order-date-to-ship-date lag statistics over its line
    items (count, min/max days, truncating-division mean, and the
    fraction shipping more than a year out). The fact-fact
    lineitem x orders equi-join is the classic shuffle-join shape;
    lags are exact integer day differences.

    Scale shape: both fact tables hash-partition on the order key
    (AQE handles skewed orders); the rollup is a partial-aggregated
    groupBy on supplier-cardinality keys. Lines whose order or dates
    are missing carry no lag and are excluded on both sides."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    ).filter(F.col("l_shipdate").isNotNull()
             & F.col("l_suppkey").isNotNull())
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    ).filter(F.col("o_orderdate").isNotNull())
    lag = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select("l_suppkey", lag.cast("long").alias("lag_d"))
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.min("lag_d").alias("min_lag_d"),
            F.max("lag_d").alias("max_lag_d"),
            F.expr("sum(lag_d) div count(1)").alias("mean_lag_d"),
            F.sum((F.col("lag_d") > 365).cast("long")).alias("n_over_1y"),
        )
        .select(
            "l_suppkey", "n_lines", "min_lag_d", "max_lag_d",
            "mean_lag_d", "n_over_1y",
            (F.col("n_over_1y").cast("double")
             / F.col("n_lines").cast("double")).alias("over_1y_frac"),
        )
    )


def _ship_lag_oracle_sql() -> str:
    return """
        WITH j AS (
            SELECT l.l_suppkey,
                   CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lag_d
            FROM lineitem l JOIN orders o
                ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate IS NOT NULL
              AND l.l_suppkey IS NOT NULL
              AND o.o_orderdate IS NOT NULL
        )
        SELECT l_suppkey,
               CAST(count(*) AS BIGINT) AS n_lines,
               min(lag_d) AS min_lag_d,
               max(lag_d) AS max_lag_d,
               CAST(sum(lag_d) AS BIGINT) // count(*) AS mean_lag_d,
               CAST(sum(CASE WHEN lag_d > 365 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_over_1y,
               CAST(sum(CASE WHEN lag_d > 365 THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS over_1y_frac
        FROM j GROUP BY l_suppkey
    """


def conversion_lag_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIEW-TO-PURCHASE LAG distribution in power-of-two second
    buckets -- the latency histogram a growth team reads next to the
    funnel (is conversion impulsive or slow-burn): for every view,
    the time to that user's NEXT purchase (the time_to_event label,
    restricted to views), bucketed at the largest power of two <=
    lag seconds (lag 0 -> bucket 0); views with no later purchase
    report under bucket -1 (censored). Buckets are exact integer
    arithmetic -- a shared 31-case power-of-two CASE chain generated
    identically for both engines.

    Scale shape: ONE shuffle on user_id for the forward-min window;
    the bucket projection is map-only codegen and the histogram is a
    partial-aggregated groupBy over <= 33 keys."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    w = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = F.min(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(w)
    # integer division on BOTH engines (a double cast would round in
    # DuckDB but truncate in Spark); lags are non-negative
    views = ev.select(
        "event_type",
        ((F.unix_micros(nxt) - F.unix_micros("ts")).cast("long"))
        .alias("lag_us"),
    ).filter(F.col("event_type") == "view").select(
        "event_type", F.expr("lag_us div 1000000").alias("lag_s")
    )
    cases = "CASE WHEN lag_s IS NULL THEN -1 WHEN lag_s <= 0 THEN 0 "
    cases += " ".join(
        f"WHEN lag_s < {1 << (k + 1)} THEN {1 << k}"
        for k in range(31)
    )
    cases += " ELSE -2 END"
    return (
        views.select(F.expr(cases).cast("long").alias("bucket_s"))
        .groupBy("bucket_s")
        .agg(F.count(F.lit(1)).cast("long").alias("n_views"))
    )


def _conv_lag_oracle_sql() -> str:
    cases = "CASE WHEN lag_s IS NULL THEN -1 WHEN lag_s <= 0 THEN 0 "
    cases += " ".join(
        f"WHEN lag_s < {1 << (k + 1)} THEN {1 << k}"
        for k in range(31)
    )
    cases += " ELSE -2 END"
    return f"""
        WITH lab AS (
            SELECT event_type,
                   (epoch_us(min(CASE WHEN event_type = 'purchase'
                             THEN ts END) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 1 FOLLOWING
                           AND UNBOUNDED FOLLOWING))
                         - epoch_us(ts)) // 1000000 AS lag_s
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
        )
        SELECT CAST({cases} AS BIGINT) AS bucket_s,
               CAST(count(*) AS BIGINT) AS n_views
        FROM lab WHERE event_type = 'view'
        GROUP BY 1
    """


PART_COOC_TOPK = 20


def part_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARKET-BASKET pairs over the BIG fact table: the top-20 part
    pairs by number of orders containing both, with exact micro-unit
    lift against the part marginals -- 'customers who bought A also
    bought B' run where it actually hurts at scale (lineitem, not a
    type vocabulary). Deterministic total order (n_pair DESC, part_a
    ASC, part_b ASC).

    Scale shape: lineitem collapses to DISTINCT (order, part) first
    (ONE fact-table shuffle keyed on the order); the within-order
    self-join fans out quadratically ONLY in basket size (TPC-H
    baskets are <= 7 lines; real baskets are bounded the same way --
    cap or sample pathological baskets), pair counts partial-
    aggregate, the top-20 resolves as TakeOrderedAndProject, and the
    marginals broadcast onto 20 rows."""
    # the deduped (order, part) table is consumed FOUR times (totals,
    # marginals, both self-join sides); the lazy localCheckpoint pays
    # the fact-table scan + distinct shuffle once and serves all four
    # from the materialized narrow pairs instead of re-running it per
    # consumer (ReuseExchange only deduped the two join sides)
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct().localCheckpoint(eager=False)
    # one-row aggregate kept LAZY and broadcast-cross-joined onto the
    # 20 result rows (the item_cooccurrence_lift pattern): an eager
    # .count() here would trigger a full lineitem scan at plan-
    # construction time and freeze the total into the plan
    totals = li.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n_orders")
    )
    marg = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_t")
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .orderBy(F.desc("n_pair"), F.asc("part_a"), F.asc("part_b"))
        .limit(PART_COOC_TOPK)
    )
    out = (
        pairs
        .join(F.broadcast(marg.select(
            F.col("l_partkey").alias("part_a"),
            F.col("n_t").alias("n_a"))), "part_a")
        .join(F.broadcast(marg.select(
            F.col("l_partkey").alias("part_b"),
            F.col("n_t").alias("n_b"))), "part_b")
        .crossJoin(F.broadcast(totals))
    )
    return out.select(
        "part_a", "part_b", "n_pair", "n_a", "n_b", "n_orders",
        F.expr("(n_pair * n_orders * 1000000) div (n_a * n_b)")
        .alias("lift_u"),
    )


def _part_cooc_oracle_sql() -> str:
    return f"""
        WITH lp AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        marg AS (
            SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_t
            FROM lp GROUP BY l_partkey
        ),
        totals AS (
            SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT)
                AS n_orders FROM lp
        ),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   CAST(count(*) AS BIGINT) AS n_pair
            FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
            GROUP BY a.l_partkey, b.l_partkey
            ORDER BY n_pair DESC, part_a ASC, part_b ASC
            LIMIT {PART_COOC_TOPK}
        )
        SELECT part_a, part_b, n_pair,
               ma.n_t AS n_a, mb.n_t AS n_b, n_orders,
               (n_pair * n_orders * 1000000) // (ma.n_t * mb.n_t)
                   AS lift_u
        FROM pairs
        JOIN marg ma ON ma.l_partkey = part_a
        JOIN marg mb ON mb.l_partkey = part_b
        CROSS JOIN totals
    """


def _movers_oracle_sql() -> str:
    return """
        WITH daily AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   CAST(count(*) AS BIGINT) AS n
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL
            GROUP BY event_type, strftime(ts, '%Y-%m-%d')
        ),
        lagged AS (
            SELECT event_type, day, n,
                   lag(n) OVER (PARTITION BY event_type ORDER BY day)
                       AS prev
            FROM daily
        )
        SELECT event_type, day, n, prev, n - prev AS delta,
               ((n - prev) * 1000000) // prev AS pct_u
        FROM lagged WHERE prev IS NOT NULL
        ORDER BY abs(n - prev) DESC, day ASC, event_type ASC
        LIMIT 20
    """


def _cooc_oracle_sql() -> str:
    return """
        WITH ut AS (
            SELECT DISTINCT user_id, event_type FROM events
            WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        ),
        totals AS (
            SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM ut
        ),
        marg AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
            FROM ut GROUP BY event_type
        ),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_pair
            FROM ut a JOIN ut b ON a.user_id = b.user_id
                 AND a.event_type < b.event_type
            GROUP BY a.event_type, b.event_type
        )
        SELECT type_a, type_b,
               ma.n_t AS n_a, mb.n_t AS n_b, n_pair, n_users,
               (n_pair * n_users * 1000000) // (ma.n_t * mb.n_t)
                   AS lift_u,
               CAST((n_pair * n_users * 1000000) // (ma.n_t * mb.n_t)
                    AS DOUBLE) / 1e6 AS lift
        FROM pairs
        JOIN marg ma ON ma.event_type = type_a
        JOIN marg mb ON mb.event_type = type_b
        CROSS JOIN totals
    """


def _tte_oracle_sql() -> str:
    return """
        WITH ev AS (
            SELECT user_id, event_id, ts, event_type FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
        ),
        lab AS (
            SELECT user_id, event_id, ts,
                   min(CASE WHEN event_type = 'purchase' THEN ts END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 1 FOLLOWING
                             AND UNBOUNDED FOLLOWING) AS nxt
            FROM ev
        )
        SELECT user_id, event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
               CAST(epoch_us(nxt) - epoch_us(ts) AS BIGINT) AS tte_us,
               nxt IS NULL AS censored
        FROM lab
    """


# --------------------------------------------------------------------------
# Skew: a measurable power-law key + the two-phase salted rewrite
# (round-6 verdict task #6 -- plans/diagnostics utilities demonstrated
# by registered queries, with the plan win asserted in test_plans.py)
# --------------------------------------------------------------------------
SKEW_SALTS = 8        # salt shards for the hot key
SKEW_REPORT_NPART = 32  # session-independent parallelism for the report


def _skew_key_case(bucket_expr: str) -> str:
    """Power-law key derivation as a CASE chain over integer
    thresholds (floor-log2 of a uniform 0..1023 bucket): level g9
    owns 50% of rows, g8 25%, ... g0 the tail -- a deterministic
    zipf-like distribution BOTH engines compute from the same
    comparisons (no log/float). NULL user_ids fold to g0 (the CASE
    falls through identically: NULL comparisons are never true)."""
    arms = " ".join(
        f"WHEN {bucket_expr} >= {1 << lvl} THEN 'g{lvl}'"
        for lvl in range(9, 0, -1)
    )
    return f"CASE {arms} ELSE 'g0' END"


def _skew_key_spark() -> "F.Column":
    return F.expr(_skew_key_case("pmod(user_id, 1024)"))


_SKEW_KEY_DUCK = _skew_key_case("((user_id % 1024) + 1024) % 1024")


def skew_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`plans.diagnostics.skew_report` over the power-law key:
    the pre-flight check that tells an operator the hot key g9 owns
    ~50% of the table and suggests the salt factor that levels it at
    ``SKEW_REPORT_NPART`` parallelism (passed explicitly so the
    report -- and its oracle -- do not depend on session conf).

    Scale shape: one partial-aggregated groupBy over the key (the
    raw rows never shuffle -- counts combine map-side), one scalar
    broadcast, top-N by TakeOrdered."""
    from ..plans.diagnostics import skew_report

    ev = table(spark, sf_dir, "events").select(
        _skew_key_spark().alias("skew_key")
    )
    return skew_report(ev, ["skew_key"], top_n=20,
                       n_part=SKEW_REPORT_NPART)


def skewed_distinct_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-key distinct users over the power-law key, computed
    with the two-phase SALTED rewrite -- the skew treatment that
    map-side combine canNOT provide. For algebraic aggregates (sum/
    count/min/max) partial aggregation already levels skew: only
    combiner rows shuffle. Exact COUNT(DISTINCT user) is different:
    every distinct (key, user) pair must reach the key's reducer, so
    the hot key g9 (~50% of all users) lands its entire user set on
    ONE task. The rewrite: phase 1 groups by (key, salt) where
    ``salt = pmod(xxhash64(user_id), SKEW_SALTS)`` -- the salt is a
    FUNCTION OF THE USER (via :func:`plans.diagnostics.salted_key`
    with the user as seed), so each user lands in exactly one shard
    and shard-local distinct counts PARTITION the key's user set;
    phase 2 sums shard counts per key. The heaviest reducer input
    drops by ~SKEW_SALTS (asserted with measured group sizes in
    tests/test_plans.py), and the result is identical to the naive
    single-phase aggregation -- which is exactly what the DuckDB
    oracle computes.

    Event counts ride along as plain sums (salt-decomposable like
    any algebraic aggregate)."""
    from ..plans.diagnostics import salted_key

    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(_skew_key_spark().alias("skew_key"), "user_id")
    )
    phase1 = (
        ev.withColumn(
            "salted",
            salted_key("skew_key", SKEW_SALTS, seed_col="user_id"),
        )
        .groupBy("salted")
        .agg(
            F.countDistinct("user_id").alias("part_users"),
            F.count(F.lit(1)).alias("part_rows"),
        )
    )
    return (
        phase1.groupBy(
            F.split(F.col("salted"), "#").getItem(0).alias("skew_key")
        )
        .agg(
            F.sum("part_users").cast("long").alias("n_users"),
            F.sum("part_rows").cast("long").alias("n_events"),
        )
    )


_SKEW_ORACLE = {
    "skew_report_events": f"""
        WITH keyed AS (
            SELECT {_SKEW_KEY_DUCK} AS skew_key FROM events
        ),
        counts AS (
            SELECT skew_key, CAST(count(*) AS BIGINT) AS n_rows
            FROM keyed GROUP BY skew_key
        ),
        tot AS (
            SELECT sum(n_rows) AS total_rows, count(*) AS n_keys
            FROM counts
        )
        SELECT skew_key, n_rows,
               round(n_rows / t.total_rows, 6) AS row_share,
               CAST(greatest(1, ceil(n_rows /
                    (t.total_rows / {float(SKEW_REPORT_NPART)})))
                    AS INTEGER) AS suggested_salt
        FROM counts CROSS JOIN tot t
        ORDER BY n_rows DESC, skew_key
        LIMIT 20
    """,
    "skewed_distinct_salted": f"""
        WITH keyed AS (
            SELECT {_SKEW_KEY_DUCK} AS skew_key, user_id
            FROM events WHERE user_id IS NOT NULL
        )
        SELECT skew_key,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(count(*) AS BIGINT) AS n_events
        FROM keyed GROUP BY skew_key
    """,
}


QUERIES = {
    "a1_events_per_day": a1_events_per_day,
    "a1_events_per_hour": a1_events_per_hour,
    "retention_cohorts": retention_cohorts,
    "k_anonymity_report": k_anonymity_report,
    "l_diversity_report": l_diversity_report,
    "markov_transition_stationary": markov_transition_stationary,
    "ab_test_conversion": ab_test_conversion,
    "session_trigram_mining": session_trigram_mining,
    "hll_set_operations": hll_set_operations,
    "seasonal_decompose_daily": seasonal_decompose_daily,
    "interarrival_histogram": interarrival_histogram,
    "ohlc_daily_by_type": ohlc_daily_by_type,
    "m4_downsample_events": m4_downsample_events,
    "t_closeness_report": t_closeness_report,
    "twap_by_user": twap_by_user,
    "event_debounce": event_debounce,
    "skew_report_events": skew_report_events,
    "skewed_distinct_salted": skewed_distinct_salted,
    "ewma_control_chart": ewma_control_chart,
    "seq_pattern_match": seq_pattern_match,
    "rfm_segments": rfm_segments,
    "time_to_event_labels": time_to_event_labels,
    "item_cooccurrence_lift": item_cooccurrence_lift,
    "anomaly_top_movers": anomaly_top_movers,
    "part_cooccurrence_topk": part_cooccurrence_topk,
    "conversion_lag_histogram": conversion_lag_histogram,
    "ship_lag_by_supplier": ship_lag_by_supplier,
    "revenue_pareto_report": revenue_pareto_report,
    "gatekeeper_failure_history": gatekeeper_failure_history,
    "sketch_cardinality_quantiles": sketch_cardinality_quantiles,
    "sketch_hll_distinct_users": sketch_hll_distinct_users,
    "a2_value_stats_by_type": a2_value_stats_by_type,
    "a3_efficiency_by_type": a3_efficiency_by_type,
    "a4_error_rate_by_day": a4_error_rate_by_day,
    "a5_top20_events": a5_top20_events,
    "a6_summary": a6_summary,
    "a7_weekly_lag": a7_weekly_lag,
    "a8_doc_distribution": a8_doc_distribution,
    "a9_backlog": a9_backlog,
    "a10_user_timing": a10_user_timing,
    "a11_json_props": a11_json_props,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_regional_revenue": q5_regional_revenue,
    "q9_profit_by_nation_year": q9_profit_by_nation_year,
    "q14_promo_revenue": q14_promo_revenue,
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_item_revenue": q10_returned_item_revenue,
    "join_orders_without_lineitems": join_orders_without_lineitems,
    "join_customers_with_purchases": join_customers_with_purchases,
    "window_running_total": window_running_total,
    "window_first_event_per_user": window_first_event_per_user,
    "window_last_n_per_user": window_last_n_per_user,
    "set_error_not_purchase_user_days": set_error_not_purchase_user_days,
    "rollup_events": rollup_events,
    "cube_events": cube_events,
    "pivot_events_daily": pivot_events_daily,
    "grouping_sets_events": grouping_sets_events,
    "window_rolling_7day_value": window_rolling_7day_value,
    "window_forward_fill": window_forward_fill,
    "rolling_distinct_users_7d": rolling_distinct_users_7d,
    "funnel_view_click_purchase": funnel_view_click_purchase,
    "daily_anomaly_zscore": daily_anomaly_zscore,
    "window_value_quartiles": window_value_quartiles,
    "unpivot_daily_counts": unpivot_daily_counts,
    "props_key_histogram": props_key_histogram,
}

_AB_PA = "CAST(conv_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0)"
_AB_PB = "CAST(conv_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0)"
_AB_PP = ("(CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))"
          " / nullif(CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE), 0.0)")

ORACLE = {
    "k_anonymity_report": f"""
        WITH cells AS (
            SELECT event_type,
                   strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                   count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT event_type, day,
               CAST(CASE WHEN n_users >= {K_ANON} THEN n_events END
                    AS BIGINT) AS n_events,
               CAST(CASE WHEN n_users >= {K_ANON} THEN n_users END
                    AS BIGINT) AS n_users,
               CASE WHEN n_users >= {K_ANON} THEN 0 ELSE 1 END
                   AS suppressed
        FROM cells
    """,
    "l_diversity_report": f"""
        WITH cells AS (
            SELECT c_nationkey AS nation, c_mktsegment AS segment,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(DISTINCT
                       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                       // 100000) AS BIGINT) AS n_bands
            FROM customer WHERE c_acctbal IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT nation, segment, n_rows,
               CAST(CASE WHEN n_bands >= {L_DIV} THEN n_bands END
                    AS BIGINT) AS n_bands,
               CASE WHEN n_bands >= {L_DIV} THEN 0 ELSE 1 END
                   AS suppressed
        FROM cells
    """,
    "markov_transition_stationary": _markov_oracle_sql(),
    "hll_set_operations": _hll_sets_oracle_sql(),
    "m4_downsample_events": f"""
        WITH b0 AS (
            SELECT event_type, event_id, value,
                   {_EPOCH_FLOOR_S_SQL} AS s
            FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        ),
        r AS (SELECT min(s) AS mn, max(s) AS mx FROM b0),
        b AS (
            SELECT b0.*,
                   CAST(((s - mn) * {M4_BUCKETS}) // (mx - mn + 1)
                        AS INTEGER) AS bucket
            FROM b0, r
        ),
        w AS (
            SELECT *,
                row_number() OVER (PARTITION BY event_type, bucket
                    ORDER BY s, event_id) AS ra,
                row_number() OVER (PARTITION BY event_type, bucket
                    ORDER BY s DESC, event_id DESC) AS rd,
                row_number() OVER (PARTITION BY event_type, bucket
                    ORDER BY value, s, event_id) AS rlo,
                row_number() OVER (PARTITION BY event_type, bucket
                    ORDER BY value DESC, s DESC, event_id DESC) AS rhi
            FROM b
        )
        SELECT event_type, bucket,
               CAST(count(*) AS BIGINT) AS n_points,
               max(CASE WHEN ra = 1 THEN value END) AS v_first,
               CAST(max(CASE WHEN ra = 1 THEN s END) AS BIGINT)
                   AS ts_first_s,
               max(CASE WHEN rlo = 1 THEN value END) AS v_min,
               CAST(max(CASE WHEN rlo = 1 THEN s END) AS BIGINT)
                   AS ts_min_s,
               max(CASE WHEN rhi = 1 THEN value END) AS v_max,
               CAST(max(CASE WHEN rhi = 1 THEN s END) AS BIGINT)
                   AS ts_max_s,
               max(CASE WHEN rd = 1 THEN value END) AS v_last,
               CAST(max(CASE WHEN rd = 1 THEN s END) AS BIGINT)
                   AS ts_last_s
        FROM w GROUP BY 1, 2
    """,
    "t_closeness_report": f"""
        WITH c AS (
            SELECT c_nationkey AS nation, c_mktsegment AS segment,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
                   c_custkey
            FROM customer WHERE c_acctbal IS NOT NULL
        ),
        d AS (
            SELECT nation, segment,
                   ntile({T_CLOSE_BINS}) OVER (ORDER BY cents, c_custkey)
                       AS decile
            FROM c
        ),
        grp AS (
            SELECT nation, segment,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   {", ".join(
                       f"CAST(sum(CASE WHEN decile <= {j} THEN 1 ELSE 0 "
                       f"END) AS BIGINT) AS c{j}"
                       for j in range(1, T_CLOSE_BINS))}
            FROM d GROUP BY 1, 2
        ),
        gtot AS (
            SELECT CAST(count(*) AS BIGINT) AS n_all,
                   {", ".join(
                       f"CAST(sum(CASE WHEN decile <= {j} THEN 1 ELSE 0 "
                       f"END) AS BIGINT) AS g{j}"
                       for j in range(1, T_CLOSE_BINS))}
            FROM d
        )
        SELECT nation, segment, n_rows,
               round(CAST(({" + ".join(
                   f"abs(c{j} * n_all - g{j} * n_rows)"
                   for j in range(1, T_CLOSE_BINS))}) AS DOUBLE)
                     / CAST(n_all * n_rows * {T_CLOSE_BINS - 1}
                            AS DOUBLE), 4) AS emd_4dp,
               CAST(({" + ".join(
                   f"abs(c{j} * n_all - g{j} * n_rows)"
                   for j in range(1, T_CLOSE_BINS))}) * {T_CLOSE_DEN}
                    > n_all * n_rows * {T_CLOSE_BINS - 1} * {T_CLOSE_NUM}
                    AS INTEGER) AS t_violation
        FROM grp, gtot
    """,
    "ohlc_daily_by_type": f"""
        WITH ev AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value,
                   row_number() OVER (
                       PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
                       ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (
                       PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
                       ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        )
        SELECT event_type, day,
               max(CASE WHEN rn_a = 1 THEN value END) AS open,
               max(value) AS high,
               min(value) AS low,
               max(CASE WHEN rn_d = 1 THEN value END) AS close,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(floor(value * {VALUE_SCALE}.0 + 0.5)
                             AS BIGINT)) AS DOUBLE)
                   / {VALUE_SCALE} AS total_value
        FROM ev GROUP BY 1, 2
    """,
    "twap_by_user": f"""
        WITH rows_ AS (
            SELECT user_id, event_id,
                   {_EPOCH_FLOOR_S_SQL} AS s,
                   CAST(floor(value * {VALUE_SCALE}.0 + 0.5) AS BIGINT)
                       AS value_u
            FROM events
            WHERE ts IS NOT NULL AND value IS NOT NULL
              AND user_id IS NOT NULL
        ),
        g AS (
            SELECT user_id, s, value_u,
                   lead(s) OVER (
                       PARTITION BY user_id ORDER BY s, event_id) - s
                       AS gap_s
            FROM rows_
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(max(s) - min(s) AS BIGINT) AS span_s,
               CAST(sum(value_u * gap_s) AS DOUBLE)
                   / CAST(nullif(sum(gap_s), 0) * {VALUE_SCALE}
                          AS DOUBLE) AS twap
        FROM g GROUP BY 1
    """,
    "event_debounce": f"""
        WITH flagged AS (
            SELECT user_id, event_type, event_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                > {DEBOUNCE_SECONDS} * 1000000
                        THEN 1 ELSE 0 END AS is_start
            FROM events WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id, event_type
                         ORDER BY ts, event_id)
        ),
        bursts AS (
            SELECT *, sum(is_start) OVER (
                PARTITION BY user_id, event_type ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS burst
            FROM flagged
        ),
        agg AS (
            SELECT user_id, event_type, burst,
                   min(struct_pack(ts := ts, event_id := event_id)) AS fst,
                   count(*) AS n,
                   epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us
            FROM bursts GROUP BY 1, 2, 3
        )
        SELECT user_id, event_type,
               fst.event_id AS event_id,
               strftime(fst.ts, '%Y-%m-%d %H:%M:%S') AS kept_ts,
               CAST(n - 1 AS BIGINT) AS n_suppressed,
               CAST(span_us // 1000000 AS BIGINT) AS burst_span_s
        FROM agg
    """,
    "interarrival_histogram": f"""
        WITH gaps AS (
            SELECT (epoch_us(ts) - epoch_us(prev)) // 1000000 AS gap
            FROM (
                SELECT ts, lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS prev
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
            ) WHERE prev IS NOT NULL
        ),
        hist AS (
            SELECT CAST({_ia_bucket_case("gap")} AS BIGINT)
                       AS bucket_lo,
                   count(*) AS n
            FROM gaps GROUP BY 1
        ),
        tot AS (SELECT sum(n) AS tot FROM hist)
        SELECT bucket_lo,
               CAST(CASE WHEN bucket_lo = 0 THEN 1
                         ELSE bucket_lo * 2 END AS BIGINT) AS bucket_hi,
               CAST(n AS BIGINT) AS n,
               CAST(n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS share
        FROM hist CROSS JOIN tot t
    """,
    "seasonal_decompose_daily": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events
            WHERE ts IS NOT NULL GROUP BY 1
        ),
        t AS (
            SELECT d, n,
                   CASE WHEN count(*) OVER w = 7
                        THEN sum(n) OVER w END AS sum7,
                   CAST((dayofweek(d) + 6) % 7 AS INTEGER) AS dow
            FROM daily
            WINDOW w AS (ORDER BY d
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ),
        season AS (
            SELECT dow, sum(7 * n - sum7) AS det7_sum, count(*) AS cnt
            FROM t WHERE sum7 IS NOT NULL GROUP BY dow
        )
        SELECT strftime(t.d, '%Y-%m-%d') AS day, t.dow,
               CAST(n AS BIGINT) AS n,
               CAST(sum7 AS DOUBLE) / 7 AS trend,
               CAST(det7_sum AS DOUBLE) / CAST(7 * cnt AS DOUBLE)
                   AS seasonal,
               CAST(n AS DOUBLE) - CAST(sum7 AS DOUBLE) / 7
                   - CAST(det7_sum AS DOUBLE) / CAST(7 * cnt AS DOUBLE)
                   AS remainder
        FROM t LEFT JOIN season USING (dow)
    """,
    "session_trigram_mining": f"""
        WITH ev AS (
            SELECT user_id, ts, event_id, event_type FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
              AND event_type IS NOT NULL
        ),
        tri AS (
            SELECT t1, t2, t3, count(*) AS n FROM (
                SELECT lag(event_type, 2) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS t1,
                       lag(event_type, 1) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS t2,
                       event_type AS t3
                FROM ev
            ) WHERE t1 IS NOT NULL
            GROUP BY t1, t2, t3
        ),
        tot AS (SELECT sum(n) AS tot FROM tri),
        top AS (
            SELECT *, CAST(row_number() OVER (
                ORDER BY n DESC, t1 ASC, t2 ASC, t3 ASC) AS INTEGER)
                AS rank
            FROM tri
            ORDER BY n DESC, t1 ASC, t2 ASC, t3 ASC LIMIT {SEQ_TOP}
        )
        SELECT rank, t1, t2, t3, CAST(n AS BIGINT) AS n,
               CAST(n AS DOUBLE) / CAST(t.tot AS DOUBLE)
                   AS support_share
        FROM top CROSS JOIN tot t
    """,
    "ab_test_conversion": f"""
        WITH users AS (
            SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END
                       AS variant_a,
                   max(CASE WHEN event_type = 'purchase'
                            AND value >= {AB_CONV_VALUE}
                            THEN 1 ELSE 0 END) AS converted
            FROM events WHERE user_id IS NOT NULL
            GROUP BY user_id
        ),
        agg AS (
            SELECT CAST(sum(variant_a) AS BIGINT) AS n_a,
                   CAST(sum(variant_a * converted) AS BIGINT) AS conv_a,
                   CAST(sum(1 - variant_a) AS BIGINT) AS n_b,
                   CAST(sum((1 - variant_a) * converted) AS BIGINT)
                       AS conv_b
            FROM users
        ),
        zc AS (
            SELECT *,
                   (({_AB_PA}) - ({_AB_PB}))
                   / nullif(sqrt(({_AB_PP}) * (1.0 - ({_AB_PP}))
                       * (1.0 / nullif(CAST(n_a AS DOUBLE), 0.0)
                          + 1.0 / nullif(CAST(n_b AS DOUBLE), 0.0))),
                       0.0) AS z
            FROM agg
        )
        SELECT n_a, conv_a, n_b, conv_b,
               {_AB_PA} AS rate_a,
               {_AB_PB} AS rate_b,
               z AS z_score,
               CASE WHEN abs(z) > {AB_Z_CRIT} THEN 1 ELSE 0 END
                   AS significant
        FROM zc
    """,
    "retention_cohorts": """
        WITH weeks AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS w
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ),
        first AS (
            SELECT user_id, min(w) AS cohort_w FROM weeks GROUP BY user_id
        ),
        sizes AS (
            SELECT cohort_w, count(*) AS cohort_size FROM first GROUP BY 1
        ),
        act AS (
            SELECT f.cohort_w,
                   CAST(date_diff('day', CAST(f.cohort_w AS DATE),
                                  CAST(x.w AS DATE)) // 7
                        AS INTEGER) AS week_offset,
                   count(DISTINCT x.user_id) AS active_users
            FROM weeks x JOIN first f USING (user_id)
            GROUP BY 1, 2
        )
        SELECT strftime(a.cohort_w, '%Y-%m-%d') AS cohort_week,
               a.week_offset,
               CAST(s.cohort_size AS BIGINT) AS cohort_size,
               CAST(a.active_users AS BIGINT) AS active_users,
               CAST(a.active_users AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
                   AS retention
        FROM act a JOIN sizes s USING (cohort_w)
    """,
    # bit-exact HLL twin: identical md5-derived registers, identical
    # CASE-chain rho, identical staged integer division
    "sketch_hll_distinct_users": f"""
        WITH ev AS (
            SELECT event_type, user_id FROM events
            WHERE user_id IS NOT NULL
        ),
        split AS (
            SELECT event_type,
                   h % {HLL_M} AS reg, h // {HLL_M} AS w
            FROM (
                SELECT event_type,
                       CAST('0x' || substr(
                           md5('hll:' || CAST(user_id AS VARCHAR)),
                           1, {HLL_HASH_HEX}) AS BIGINT) AS h
                FROM ev)
        ),
        regs AS (
            SELECT event_type, reg, max({_hll_rho_case('w')}) AS m
            FROM split GROUP BY event_type, reg
        ),
        grid AS (
            SELECT k.event_type, t.reg
            FROM (SELECT DISTINCT event_type FROM regs) k
            CROSS JOIN range({HLL_M}) t(reg)
        ),
        allregs AS (
            SELECT g.event_type, coalesce(r.m, 0) AS m
            FROM grid g LEFT JOIN regs r
              ON r.event_type IS NOT DISTINCT FROM g.event_type
             AND r.reg = g.reg
        ),
        agg AS (
            SELECT event_type,
                   sum(1::BIGINT << ({HLL_POW} - m)) AS s,
                   sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS v
            FROM allregs GROUP BY event_type
        ),
        est AS (
            SELECT event_type,
                   {_hll_lc_case('v', '((' + str(HLL_ALPHA_NUM)
                       + ' * (' + str(HLL_M * HLL_M * (1 << HLL_POW))
                       + ' // s)) // ' + str(HLL_ALPHA_DEN) + ')')}
                       AS est_distinct
            FROM agg
        )
        SELECT e.event_type,
               CAST(e.est_distinct AS BIGINT) AS est_distinct,
               CAST(x.exact_distinct AS BIGINT) AS exact_distinct
        FROM est e JOIN (
            SELECT event_type,
                   count(DISTINCT user_id) AS exact_distinct
            FROM ev GROUP BY event_type) x
          ON e.event_type IS NOT DISTINCT FROM x.event_type
    """,
    # bracket-boolean adjudication of the sketch query: the exact
    # halves hash-compare, and the oracle's literal TRUEs hold iff the
    # Spark sketches landed inside their documented error bounds
    "sketch_cardinality_quantiles": """
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
               round(quantile_cont(value, 0.95), 4) AS p95_exact,
               CAST(count(*) AS BIGINT) AS n,
               true AS hll_within_tol,
               true AS p95_sketch_in_bracket
        FROM events
        GROUP BY event_type
    """,
    "a1_events_per_hour": """
        WITH anchor AS (SELECT max(ts) AS now_ts FROM events)
        SELECT strftime(ts, '%Y-%m-%d %H:00') AS hour,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events, anchor
        WHERE ts >= now_ts - INTERVAL 24 HOURS
        GROUP BY 1
    """,
    "gatekeeper_failure_history": """
        SELECT 'job_' || CAST(user_id AS VARCHAR) AS slug,
               CAST(count(*) AS BIGINT) AS n_attempts,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_failures,
               round(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 4) AS failure_rate,
               strftime(max(CASE WHEN event_type = 'error' THEN ts END),
                        '%Y-%m-%d %H:%M:%S') AS last_failure_ts,
               sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) < 3
                   AS retry_eligible
        FROM events GROUP BY 1
    """,
    "a1_events_per_day": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events GROUP BY 1, 2
    """,
    "a2_value_stats_by_type": """
        SELECT event_type,
               round(avg(value), 4) AS avg_value,
               round(min(value), 4) AS min_value,
               round(max(value), 4) AS max_value,
               round(CAST(median(value) AS DOUBLE), 4) AS median_value,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    """,
    "a3_efficiency_by_type": """
        SELECT event_type,
               CAST(sum(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_heavy,
               CAST(count(*) AS BIGINT) AS n_total,
               round(100.0 * sum(CASE WHEN value > 100.0 THEN 1 ELSE 0 END)
                     / nullif(CAST(count(*) AS DOUBLE), 0.0), 2) AS heavy_pct
        FROM events GROUP BY 1
    """,
    "a4_error_rate_by_day": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
               CAST(count(*) AS BIGINT) AS n_total,
               round(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 4) AS error_rate
        FROM events GROUP BY 1
    """,
    "a5_top20_events": """
        SELECT event_id, user_id, event_type, value
        FROM events ORDER BY value DESC, event_id ASC LIMIT 20
    """,
    "a6_summary": """
        SELECT CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
               round(avg(value), 4) AS avg_value,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
        FROM events
    """,
    "a7_weekly_lag": """
        WITH weekly AS (
            SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        )
        SELECT week, n_events,
               lag(n_events) OVER (ORDER BY week) AS prev_week_events,
               n_events - lag(n_events) OVER (ORDER BY week) AS wow_delta
        FROM weekly
    """,
    "a8_doc_distribution": """
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               round(avg(n_chars), 2) AS avg_chars,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY 1
    """,
    "a9_backlog": """
        SELECT CAST(count(*) AS BIGINT) AS n_pending,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_pending_users,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS newest_ts
        FROM events WHERE event_type IN ('click', 'view')
    """,
    "a10_user_timing": """
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS span_seconds,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
        FROM events GROUP BY 1
    """,
    # integral-guarded cast: Spark try_cast(string -> int) yields NULL
    # for decimal strings ('3.7'), DuckDB TRY_CAST ROUNDS them to 4 --
    # the regexp pins both engines to the integer-literal semantic
    # (sign + digits, surrounding whitespace trimmed like Spark's cast)
    "a11_json_props": """
        WITH kx AS (
            SELECT event_type,
                   CASE WHEN json_valid(props) THEN
                       trim(json_extract_string(props, '$.k')) END AS ks
            FROM events
        ),
        kv AS (
            SELECT event_type,
                   CASE WHEN regexp_matches(ks, '^[+-]?[0-9]+$')
                        THEN TRY_CAST(ks AS INTEGER) END AS k
            FROM kx
        )
        SELECT event_type,
               round(avg(k), 4) AS avg_k,
               CAST(max(k) AS INTEGER) AS max_k,
               CAST(count(*) AS BIGINT) AS n
        FROM kv GROUP BY 1
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY 1, 2
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q5_regional_revenue": """
        SELECT r_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1
    """,
    "q4_order_priority": """
        SELECT o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority
    """,
    "q6_forecast_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q10_returned_item_revenue": """
        WITH agg AS (
            SELECT o_custkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_returnflag = 'R'
            GROUP BY o_custkey
        )
        SELECT c_custkey AS custkey, c_name, c_mktsegment, revenue, n_items
        FROM agg JOIN customer ON o_custkey = c_custkey
        ORDER BY revenue DESC, custkey ASC
        LIMIT 20
    """,
    "q14_promo_revenue": """
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4)
                   AS promo_revenue_pct,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
    """,
    "q9_profit_by_nation_year": """
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)
                         - p_retailprice * l_quantity * 0.4), 2) AS profit,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    """,
    "join_orders_without_lineitems": """
        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
    """,
    "join_customers_with_purchases": """
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    "window_running_total": """
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER)
                   AS order_seq
        FROM orders
    """,
    "window_first_event_per_user": """
        SELECT user_id, event_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "window_last_n_per_user": """
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_kept,
               round(sum(value), 2) AS kept_value
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn <= 40
        GROUP BY 1
    """,
    "set_error_not_purchase_user_days": """
        SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'error'
        EXCEPT
        SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'purchase'
    """,
    "cube_events": """
        SELECT coalesce(event_type, '(all)') AS event_type,
               coalesce(strftime(ts, '%Y-%m-%d'), '(all)') AS day,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY CUBE (event_type, strftime(ts, '%Y-%m-%d'))
    """,
    "rollup_events": """
        SELECT coalesce(event_type, '(all)') AS event_type,
               coalesce(strftime(ts, '%Y-%m-%d'), '(all)') AS day,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY ROLLUP (event_type, strftime(ts, '%Y-%m-%d'))
    """,
    # trailing-window anomaly baseline over the DENSIFIED day axis
    # (zero-event days get a row; the frame is 7 true calendar days)
    "daily_anomaly_zscore": """
        WITH counts AS (
            SELECT CAST(ts AS DATE) AS d,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ),
        b AS (SELECT min(d) AS lo, max(d) AS hi FROM counts),
        days AS (
            SELECT CAST(unnest(generate_series(lo::TIMESTAMP,
                       hi::TIMESTAMP, INTERVAL 1 DAY)) AS DATE) AS d
            FROM b
        ),
        daily AS (
            SELECT days.d, coalesce(c.n, 0) AS n_events
            FROM days LEFT JOIN counts c ON days.d = c.d
        ),
        wd AS (
            SELECT d, n_events,
                   avg(n_events) OVER w AS m,
                   stddev(n_events) OVER w AS s,
                   row_number() OVER (ORDER BY d) AS rn
            FROM daily
            WINDOW w AS (ORDER BY d ROWS BETWEEN 7 PRECEDING
                         AND 1 PRECEDING)
        )
        SELECT strftime(d, '%Y-%m-%d') AS day, n_events,
               round(m, 6) AS base_mean,
               round(s, 6) AS base_std,
               CASE WHEN s > 0 THEN round((n_events - m) / s, 4) END
                   AS zscore
        FROM wd WHERE rn > 7
    """,
    # first-touch ordered funnel: step times via correlated mins with
    # STRICT after-previous-step comparisons (NULL-propagating on both
    # engines: a user missing step k never reaches step k+1)
    "funnel_view_click_purchase": """
        WITH u1 AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN ts END) AS t1
            FROM events GROUP BY user_id
        ),
        u2 AS (
            SELECT u1.user_id, u1.t1,
                   (SELECT min(e.ts) FROM events e
                    WHERE e.user_id = u1.user_id
                      AND e.event_type = 'click' AND e.ts > u1.t1) AS t2
            FROM u1
        ),
        u3 AS (
            SELECT u2.*, (SELECT min(e.ts) FROM events e
                          WHERE e.user_id = u2.user_id
                            AND e.event_type = 'purchase'
                            AND e.ts > u2.t2) AS t3
            FROM u2
        ),
        c AS (SELECT count(t1) AS n1, count(t2) AS n2, count(t3) AS n3
              FROM u3)
        SELECT 'view' AS step, CAST(1 AS INTEGER) AS step_n,
               CAST(n1 AS BIGINT) AS n_users,
               round(n1::DOUBLE / n1, 4) AS conv_rate FROM c
        UNION ALL
        SELECT 'click', CAST(2 AS INTEGER), CAST(n2 AS BIGINT),
               round(n2::DOUBLE / n1, 4) FROM c
        UNION ALL
        SELECT 'purchase', CAST(3 AS INTEGER), CAST(n3 AS BIGINT),
               round(n3::DOUBLE / n1, 4) FROM c
    """,
    "rolling_distinct_users_7d": """
        WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        mx AS (SELECT max(CAST(ts AS DATE)) AS max_d FROM events)
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        FROM (SELECT user_id, d + CAST(i AS INTEGER) AS day
              FROM du, unnest(range(0, 7)) t(i)), mx
        WHERE day <= max_d
        GROUP BY 1
    """,
    "window_forward_fill": """
        SELECT user_id, event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
               round(last_value(CASE WHEN event_type = 'purchase' THEN value END
                                IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY ts NULLS FIRST, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS last_purchase_value
        FROM events
    """,
    "window_value_quartiles": """
        SELECT event_id, event_type, value,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank
        FROM events
        WINDOW w AS (PARTITION BY event_type
                     ORDER BY value ASC NULLS FIRST, event_id ASC)
    """,
    "unpivot_daily_counts": f"""
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM events
        WHERE event_type IN ({_EVENT_TYPES_SQL})
        GROUP BY 1, 2
    """,
    # twin of the Spark side's exact semantics on ANY props payload:
    # integral-guarded TRY_CAST (Spark try_cast NULLs decimal strings
    # where DuckDB TRY_CAST rounds them -- the regexp pins the
    # integer-literal semantic on both engines), pmod-style floor
    # bucketing (DuckDB % takes the dividend's sign), and distinct
    # over the RAW STRING value (the Spark side counts distinct
    # prop_val strings)
    "props_key_histogram": """
        WITH kv AS (
            SELECT k AS prop_key,
                   json_extract_string(props, '$.' || k) AS s,
                   CASE WHEN regexp_matches(
                            trim(json_extract_string(props, '$.' || k)),
                            '^[+-]?[0-9]+$')
                        THEN TRY_CAST(trim(json_extract_string(
                            props, '$.' || k)) AS BIGINT) END AS v
            FROM (SELECT props, unnest(json_keys(props)) AS k
                  FROM events
                  WHERE props IS NOT NULL AND json_valid(props))
        )
        SELECT prop_key, v - ((v % 10 + 10) % 10) AS val_bucket,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT s) AS BIGINT) AS n_distinct_vals
        FROM kv GROUP BY 1, 2
    """,
    "grouping_sets_events": """
        SELECT coalesce(event_type, '(all)') AS event_type,
               coalesce(day, '(all)') AS day,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS total_value
        FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value
              FROM events)
        GROUP BY GROUPING SETS ((event_type), (day))
    """,
    "window_rolling_7day_value": """
        SELECT user_id, event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
               round(sum(value) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(epoch(ts) AS BIGINT)
                   RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW
               ), 2) AS rolling_7d_value
        FROM events
    """,
    "pivot_events_daily": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        FROM events GROUP BY 1
    """,
}

ORACLE.update(_SKEW_ORACLE)
ORACLE["ewma_control_chart"] = _ewma_oracle_sql()
ORACLE["seq_pattern_match"] = _seq_pattern_oracle_sql()
ORACLE["rfm_segments"] = _rfm_oracle_sql()
ORACLE["time_to_event_labels"] = _tte_oracle_sql()
ORACLE["item_cooccurrence_lift"] = _cooc_oracle_sql()
ORACLE["anomaly_top_movers"] = _movers_oracle_sql()
ORACLE["part_cooccurrence_topk"] = _part_cooc_oracle_sql()
ORACLE["conversion_lag_histogram"] = _conv_lag_oracle_sql()
ORACLE["ship_lag_by_supplier"] = _ship_lag_oracle_sql()
ORACLE["revenue_pareto_report"] = _pareto_oracle_sql()
