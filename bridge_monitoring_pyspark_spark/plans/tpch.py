"""Relational-completeness queries over the TPC-H-ish driver tables.

These cover the capability classes SURVEY.md §2.11 lists as absent from the
reference — semi/anti/range/as-of joins, distinct aggregation, rollup/cube,
analytic window functions, intersect/except, pivot — plus classic multi-join
aggregations (TPC-H Q1/Q3/Q5 shapes) that exercise the same operators the
reference uses, at star-schema scale.

Scale notes are in each builder's docstring; the common themes:
* dimension joins (region/nation/customer/supplier/part) are explicit
  broadcasts — the fact side never shuffles for them;
* fact-fact joins (orders⋈lineitem) shuffle on the join key once, and AQE
  handles skew/coalescing;
* floating aggregates are rounded to 4dp in both engines (catalog.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.joins import anti_join, asof_join, range_join, semi_join
from ..operators.topk import top_k, top_k_per_group
from ..sources.readers import load_table
from .catalog import Query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- TPC-H Q1 shape: scan-heavy grouped aggregation --------------------------
def _q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sums/avgs/count over lineitem with a date filter — the classic
    scan+partial-agg benchmark shape. The filter pushes to the parquet scan;
    the group-by has 6 groups so the shuffle is trivial; all the work is the
    vectorized scan plus map-side partial aggregation."""
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- TPC-H Q3 shape: 3-way join + grouped revenue + top-k --------------------
def _q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer⋈orders⋈lineitem with opposing date filters, revenue per
    order, top-10. customer is broadcast (small dim); orders⋈lineitem
    shuffles once on orderkey; top-10 is TakeOrderedAndProject."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    revenue = F.round(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
    ).alias("revenue")
    joined = l.join(
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(revenue)
    return top_k(
        agg, [F.col("revenue").desc(), F.col("l_orderkey").asc()], 10
    ).select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")


_Q3_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- TPC-H Q5 shape: star join through region→nation→customer/supplier -------
def _q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table star join: all dims broadcast, facts shuffle once on
    orderkey. The c_nationkey = s_nationkey constraint is the classic Q5
    'local supplier' predicate."""
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    joined = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


_Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# --- Semi / anti joins --------------------------------------------------------
def _customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: customers having >=1 URGENT order. Only the key crosses
    the join — no payload duplication, no fan-out."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return semi_join(
        c, o.select(F.col("o_custkey").alias("c_custkey")), on=["c_custkey"]
    ).select("c_custkey", "c_name", "c_mktsegment")


_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


def _customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI: the complement of the semi join (NOT EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return anti_join(
        c, o.select(F.col("o_custkey").alias("c_custkey")), on=["c_custkey"]
    ).select("c_custkey", "c_name", "c_mktsegment")


_ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


# --- Range join ----------------------------------------------------------------
def _lineitems_shipped_within_90d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi(orderkey) + range(shipdate within 90 days of orderdate) join.
    Catalyst plans the hash join on the equi key with the range as a
    post-join filter — the scalable shape for mixed conditions."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    out = range_join(
        l,
        o,
        equi=F.col("l_orderkey") == F.col("o_orderkey"),
        range_cond=(F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
    )
    return out.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.round(F.avg(F.col("l_extendedprice")), 4).alias("avg_price"),
    ).orderBy("o_orderpriority")


_RANGE_JOIN_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       round(avg(l_extendedprice), 4) AS avg_price
FROM lineitem l JOIN orders o
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- As-of join -----------------------------------------------------------------
def _asof_last_order_before_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks its user's most recent order at-or-before
    the event time (composition: equi-join + rank-1 per event —
    operators/joins.py:asof_join). Restricted to the first 500 events to keep
    the oracle's brute-force pair set small."""
    e = _t(spark, sf_dir, "events").where(F.col("event_id") < 500)
    o = _t(spark, sf_dir, "orders")
    out = asof_join(
        e,
        o,
        left_key=F.col("user_id"),
        right_key=F.col("o_custkey"),
        left_time=F.col("ts"),
        right_time=F.col("o_orderdate"),
        left_row_id=["event_id"],
        tiebreak=[F.col("o_orderkey").desc()],
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").alias("last_orderdate"),
    )


_ASOF_SQL = """
SELECT e.event_id, e.user_id, e.ts,
       o.o_orderkey AS last_orderkey, o.o_orderdate AS last_orderdate
FROM events e JOIN orders o
  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
WHERE e.event_id < 500
QUALIFY row_number() OVER (
    PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) = 1
"""


# --- Distinct aggregation --------------------------------------------------------
def _distinct_suppliers_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group — expands to a two-phase aggregate; the
    companion approx_count_distinct (HLL, constant memory) is what the
    100 TB path should prefer and is tested for closeness in pytest."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


_DISTINCT_SQL = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- Rollup / cube -----------------------------------------------------------------
def _rollup_revenue_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region→nation hierarchy with grand total; GROUPING()
    ids disambiguate NULL group labels from real NULLs."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    c = _t(spark, sf_dir, "customer")
    joined = c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")).join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("c_acctbal"), 4).alias("total_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
            F.grouping_id().alias("grouping_level"),
        )
        .orderBy(
            F.col("grouping_level").asc(),
            F.col("r_name").asc_nulls_last(),
            F.col("n_name").asc_nulls_last(),
        )
    )


_ROLLUP_SQL = """
SELECT r_name, n_name,
       round(sum(c_acctbal), 4) AS total_acctbal,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS grouping_level
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY grouping_level ASC, r_name ASC NULLS LAST, n_name ASC NULLS LAST
"""


def _cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two independent dimensions (all 4 grouping-set combos)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
            F.grouping_id().alias("grouping_level"),
        )
        .orderBy(
            F.col("grouping_level").asc(),
            F.col("o_orderstatus").asc_nulls_last(),
            F.col("o_orderpriority").asc_nulls_last(),
        )
    )


_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 4) AS total_price,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
           AS grouping_level
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY grouping_level ASC, o_orderstatus ASC NULLS LAST, o_orderpriority ASC NULLS LAST
"""


# --- Analytic window functions -------------------------------------------------------
def _running_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag + rank per customer over order history — the
    analytic-window surface the reference lacks (SURVEY.md §2.5). One
    shuffle on the partition key; within-partition sort feeds all three
    functions. Restricted to 20 customers for a compact oracle diff."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") < 20)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ), 4).alias("running_total"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.row_number().over(w).alias("order_seq"),
    )


_RUNNING_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
       lag(o_totalprice, 1) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
       CAST(row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS order_seq
FROM orders
WHERE o_custkey < 20
"""


def _top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number (operators/topk.py) — the idiomatic
    upgrade of the reference's group-max + sort + show pattern."""
    p = _t(spark, sf_dir, "part")
    out = top_k_per_group(
        p,
        ["p_brand"],
        [F.col("p_retailprice").desc(), F.col("p_partkey").asc()],
        3,
        rank_col="brand_rank",
    )
    return out.select("p_brand", "brand_rank", "p_partkey", "p_name", "p_retailprice")


_TOP_PARTS_SQL = """
SELECT p_brand, CAST(brand_rank AS INT) AS brand_rank, p_partkey, p_name, p_retailprice
FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         row_number() OVER (
             PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC
         ) AS brand_rank
  FROM part
)
WHERE brand_rank <= 3
"""


# --- Set operations -------------------------------------------------------------------
def _building_and_urgent_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: BUILDING-segment customers ∩ customers with urgent orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return building.intersect(urgent).orderBy("custkey")


_INTERSECT_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
ORDER BY custkey
"""


def _building_minus_urgent_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: BUILDING-segment customers − customers with urgent orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return building.exceptAll(urgent.distinct()).orderBy("custkey")


_EXCEPT_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
ORDER BY custkey
"""


# --- Full outer join ---------------------------------------------------------------------
def _full_outer_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER equi-join of two sparse daily-activity aggregates — rows
    survive from either side with nulls coalesced. Same single-shuffle
    shape as inner; the outer-ness only changes null handling."""
    e = _t(spark, sf_dir, "events")
    clicks = (
        e.where(F.col("event_type") == "click")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    return (
        clicks.join(purchases, on=["user_id", "day"], how="full_outer")
        .select(
            "user_id",
            "day",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
    )


_FULL_OUTER_SQL = """
WITH clicks AS (
  SELECT user_id, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
), purchases AS (
  SELECT user_id, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT coalesce(c.user_id, p.user_id) AS user_id,
       coalesce(c.day, p.day) AS day,
       coalesce(c.n_clicks, 0) AS n_clicks,
       coalesce(p.n_purchases, 0) AS n_purchases
FROM clicks c FULL OUTER JOIN purchases p
  ON c.user_id = p.user_id AND c.day = p.day
"""


# --- Pivot -------------------------------------------------------------------------------
def _event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts into one column per type. Expressed as conditional
    aggregation (count-if) rather than ``GroupedData.pivot`` so the output
    column names are explicit — same single-shuffle physical plan."""
    e = _t(spark, sf_dir, "events")
    def cnt(t: str):
        return F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
    return (
        e.groupBy("user_id")
        .agg(cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error"))
        .orderBy("user_id")
    )


_PIVOT_SQL = """
SELECT user_id,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error
FROM events
GROUP BY user_id
ORDER BY user_id
"""


QUERIES = [
    Query("q1_pricing_summary", _q1_pricing_summary, _Q1_SQL, ("tpch", "agg")),
    Query("q3_shipping_priority", _q3_shipping_priority, _Q3_SQL, ("tpch", "join", "topk")),
    Query("q5_region_revenue", _q5_region_revenue, _Q5_SQL, ("tpch", "join")),
    Query("semi_join_urgent_customers", _customers_with_urgent_orders, _SEMI_SQL, ("join", "semi")),
    Query("anti_join_no_urgent_customers", _customers_without_urgent_orders, _ANTI_SQL, ("join", "anti")),
    Query("range_join_shipped_90d", _lineitems_shipped_within_90d, _RANGE_JOIN_SQL, ("join", "range")),
    Query("asof_last_order_before_event", _asof_last_order_before_event, _ASOF_SQL, ("join", "asof")),
    Query("distinct_agg_suppliers", _distinct_suppliers_per_flag, _DISTINCT_SQL, ("agg", "distinct")),
    Query("rollup_revenue_region_nation", _rollup_revenue_region_nation, _ROLLUP_SQL, ("agg", "rollup")),
    Query("cube_orders_status_priority", _cube_orders_status_priority, _CUBE_SQL, ("agg", "cube")),
    Query("window_running_order_totals", _running_order_totals, _RUNNING_SQL, ("window",)),
    Query("topk_parts_per_brand", _top_parts_per_brand, _TOP_PARTS_SQL, ("window", "topk")),
    Query("intersect_building_urgent", _building_and_urgent_custkeys, _INTERSECT_SQL, ("setop",)),
    Query("except_building_urgent", _building_minus_urgent_custkeys, _EXCEPT_SQL, ("setop",)),
    Query("pivot_event_type_counts", _event_type_pivot, _PIVOT_SQL, ("agg", "pivot")),
    Query("full_outer_daily_activity", _full_outer_daily_activity, _FULL_OUTER_SQL, ("join", "outer")),
]
