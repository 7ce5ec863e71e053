"""Relational query surface (SURVEY.md §2.5 gap list → §7 Phase 3).

The reference delegates all relational computation to external engines as
SQL strings; a user switching to this repo gets the full surface natively:
joins (broadcast/shuffle/semi/anti), aggregations (hash, rollup/cube),
window functions, sorts/limits/top-k, set ops, and scalar functions — all
Catalyst built-ins, each oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from extract_transform_load_template_multidb_spark.catalog import load_table
from extract_transform_load_template_multidb_spark.queries import query
from extract_transform_load_template_multidb_spark.queries._util import (
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_base_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {sql_davg('l_quantity', 'avg_qty')},
       {sql_davg('l_extendedprice', 'avg_price')},
       {sql_davg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= (SELECT max(l_shipdate) FROM lineitem) - INTERVAL 90 DAY
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=_Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan → filter → hash aggregate.

    Flagship query. The date anchor is ``max(l_shipdate) − 90 days``
    computed as a broadcast 1-row aggregate (deterministic, no
    ``current_date()``). Partial aggregation (map-side combine) happens
    automatically; the decimal-routed sums stay exact under any partition
    combine order.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cut = li.agg(
        (F.max("l_shipdate") - F.expr("INTERVAL 90 DAY")).alias("__cut")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.join(F.broadcast(cut), F.col("l_shipdate") <= F.col("__cut"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_JOIN_BROADCAST_ORACLE = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice', 'revenue')}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@query("join_broadcast_dim", oracle=_JOIN_BROADCAST_ORACLE)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dimension with an explicit broadcast hint.

    At 100 TB the customer dimension may not be broadcastable — the hint
    documents intent; AQE falls back to shuffle join above the threshold.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "revenue"),
        )
    )


_Q3_ORACLE = f"""
SELECT o_orderkey,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", oracle=_Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style 3-way join + aggregate + top-k.

    The selective ``c_mktsegment`` filter is applied before the join
    (Catalyst pushes it into the customer scan); the final ORDER BY+LIMIT
    executes as TakeOrderedAndProject — no global sort at scale.
    """
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


_Q5_ORACLE = f"""
SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


@query("q5_local_supplier_volume", oracle=_Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way join: region-filtered local-supplier revenue.

    nation/region/supplier are broadcast; the customer⋈orders⋈lineitem
    chain shuffles on its join keys once each — the plan Catalyst picks is
    the one you'd hand-write at 100 TB.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
    )


_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000
)
"""


@query("join_semi", oracle=_SEMI_ORACLE)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one large order."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000
    )
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@query("join_anti", oracle=_ANTI_ORACLE)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders at all."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


_WINDOW_RANK_ORACLE = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ) AS rn
  FROM orders
) WHERE rn <= 3
"""


@query("window_rank_topn_per_group", oracle=_WINDOW_RANK_ORACLE)
def window_rank_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window function: top-3 orders per customer.

    The tie-break on ``o_orderkey`` makes row_number deterministic — a
    requirement for oracle hashing and good practice anywhere.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


_WINDOW_RUNNING_ORACLE = """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(CASE WHEN isinf(value) OR isnan(value) THEN 0 ELSE value END
                AS DECIMAL(38,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS running_value
FROM events
"""


@query("window_running_sum", oracle=_WINDOW_RUNNING_ORACLE)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window frame: per-user running sum over event time.

    ±inf/NaN are zeroed first so the running decimal sum is well-defined;
    frame is ROWS UNBOUNDED PRECEDING..CURRENT ROW with a deterministic
    (ts, event_id) order.
    """
    ev = load_table(spark, sf_dir, "events")
    safe = F.when(
        F.isnan("value") | F.col("value").isin(float("inf"), float("-inf")),
        F.lit(0.0),
    ).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(safe.cast("decimal(38,6)")).over(w).cast("double").alias(
            "running_value"
        ),
    )


_ROLLUP_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       {sql_dsum('l_quantity', 'sum_qty')}
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("agg_rollup", oracle=_ROLLUP_ORACLE)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregate: GROUP BY ROLLUP with subtotals + grand total."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(F.col("l_quantity"), "sum_qty"),
    )


_CUBE_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice', 'total')}
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("agg_cube", oracle=_CUBE_ORACLE)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE over two dimensions of orders."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice"), "total"),
    )


_SORT_LIMIT_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
"""


@query("sort_limit_topk", oracle=_SORT_LIMIT_ORACLE)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY + LIMIT → TakeOrderedAndProject (no full sort)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


_SETOP_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


@query("set_union_distinct", oracle=_SETOP_ORACLE)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): nations present among customers or suppliers."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .union(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


_INTERSECT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


@query("set_intersect", oracle=_INTERSECT_ORACLE)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations with both customers and suppliers."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


_EXCEPT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
"""


@query("set_except", oracle=_EXCEPT_ORACLE)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: nations with customers but no suppliers."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).subtract(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


_HAVING_ORACLE = f"""
SELECT o_custkey, COUNT(*) AS n_orders, {sql_dsum('o_totalprice', 'spend')}
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 5
"""


@query("agg_having", oracle=_HAVING_ORACLE)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING: repeat customers (≥5 orders)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "spend"),
        )
        .filter(F.col("n_orders") >= 5)
    )


_SCALAR_ORACLE = """
SELECT p_partkey,
       UPPER(p_brand) AS brand_upper,
       LENGTH(p_name) AS name_len,
       SUBSTR(p_type, 1, 5) AS type_prefix,
       CAST(ROUND(p_retailprice * 1.1, 2) AS DOUBLE) AS price_with_tax,
       CAST(FLOOR(p_size / 10) AS BIGINT) AS size_bucket,
       CONCAT(p_brand, '#', p_type) AS brand_type
FROM part
"""


@query("scalar_string_math", oracle=_SCALAR_ORACLE)
def scalar_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function library: string/math expressions, all codegen'd."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.round(F.col("p_retailprice") * 1.1, 2).cast("double").alias(
            "price_with_tax"
        ),
        F.floor(F.col("p_size") / 10).cast("bigint").alias("size_bucket"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
    )


_DATE_ORACLE = """
SELECT event_id,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(year(ts) AS INT) AS y,
       CAST(month(ts) AS INT) AS m,
       CAST(dayofweek(ts) AS INT) AS dow,
       CAST(ts + INTERVAL 7 DAY AS TIMESTAMP) AS ts_plus_week
FROM events
"""


@query("scalar_datetime", oracle=_DATE_ORACLE)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions: trunc, field extraction, interval arithmetic.

    DuckDB ``dayofweek`` is 0=Sunday..6; Spark ``dayofweek`` is 1=Sunday..7,
    so the Spark side subtracts 1 to align on one public convention.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("day", "ts").alias("day"),
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("m"),
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        (F.col("ts") + F.expr("INTERVAL 7 DAY")).alias("ts_plus_week"),
    )


_JSON_ORACLE = """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
"""


@query("scalar_json_extract", oracle=_JSON_ORACLE)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events ``props`` column."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )


_DISTINCT_ORACLE = """
SELECT COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT event_type) AS n_types
FROM events
"""


@query("agg_count_distinct", oracle=_DISTINCT_ORACLE)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column COUNT DISTINCT (expand + two-phase aggregate)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
    )


_FULL_OUTER_ORACLE = """
WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS cnt FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nk, COUNT(*) AS cnt FROM supplier GROUP BY 1)
SELECT COALESCE(c.nk, s.nk) AS nationkey,
       COALESCE(c.cnt, 0) AS n_cust,
       COALESCE(s.cnt, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c.nk = s.nk
"""


@query("join_outer_full", oracle=_FULL_OUTER_ORACLE)
def join_outer_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides with key coalescing.

    Aggregating BEFORE the join shrinks both sides to one row per nation —
    at 100 TB this turns a fact⋈fact shuffle into a trivial join, the
    standard pre-aggregation rewrite.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cust.join(supp, cust.nk == supp.nk, "full_outer").select(
        F.coalesce(cust.nk, supp.nk).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


_RANGE_FRAME_ORACLE = """
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
         PARTITION BY o_custkey
         ORDER BY datediff('day', TIMESTAMP '1970-01-01 00:00:00', o_orderdate)
         RANGE BETWEEN 90 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS trailing_spend
FROM orders
"""


@query("window_range_frame", oracle=_RANGE_FRAME_ORACLE)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based window frame: per-customer trailing-90-day spend.

    RANGE frames are defined on the ORDER BY *values* (days since epoch),
    so ties share one frame and the sum is deterministic without a unique
    tie-break — unlike ROWS frames.
    """
    orders = load_table(spark, sf_dir, "orders")
    day_num = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_num)
        .rangeBetween(-90, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("trailing_spend"),
    )


_DISTRIBUTION_ORACLE = """
SELECT o_orderkey, o_orderpriority,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM orders
WINDOW w AS (
  PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
)
"""


@query("window_distribution", oracle=_DISTRIBUTION_ORACLE)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist.

    The (o_totalprice, o_orderkey) order is unique, making ntile
    deterministic; percent_rank and cume_dist are exact integer ratios so
    the double results are bit-identical across engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


_EXPLODE_ORACLE = """
SELECT p_partkey, unnest(string_split(p_type, ' ')) AS tok
FROM part
"""


@query("explode_unnest", oracle=_EXPLODE_ORACLE)
def explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode (UNNEST): one row per whitespace token of p_type.

    Generate/explode runs inside whole-stage codegen — no shuffle; row
    count multiplies, so at scale this goes before filters that cut it
    back down, never after a wide join.
    """
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.explode(F.split("p_type", " ")).alias("tok"),
    )


_Q13_ORACLE = """
WITH per_cust AS (
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
SELECT n_orders, count(*) AS n_customers
FROM per_cust
GROUP BY n_orders
"""


@query("q13_order_count_distribution", oracle=_Q13_ORACLE)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count histogram — LEFT join keeps
    zero-order customers (count(col) skips their NULLs), then a second,
    much smaller aggregation over the distribution. The first groupBy is
    the only corpus-sized shuffle; the histogram agg moves one row per
    customer."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


_Q18_ORACLE = f"""
SELECT c_custkey, o_orderkey, o_orderdate,
       {sql_dsum('l_quantity', 'total_qty')}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 150
)
GROUP BY c_custkey, o_orderkey, o_orderdate
"""


@query("q18_large_volume_orders", oracle=_Q18_ORACLE)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (HAVING over a pre-aggregate), semi-joined back to the fact tables.
    The HAVING aggregate runs FIRST and shrinks the key set before any
    wide join — the right order at 100 TB."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), "__qty"))
        .filter(F.col("__qty") > 150)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_quantity"), "total_qty"))
    )


_Q2_ORACLE = """
WITH costs AS (
    SELECT l_partkey, l_suppkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
               AS supply_cost
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
best AS (
    SELECT l_partkey, min(supply_cost) AS min_cost
    FROM costs GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_brand, c.l_suppkey AS best_suppkey,
       c.supply_cost AS min_supply_cost
FROM part p
JOIN best b ON b.l_partkey = p.p_partkey
JOIN costs c ON c.l_partkey = b.l_partkey AND c.supply_cost = b.min_cost
"""


@query("q2_min_cost_supplier", oracle=_Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per part, the supplier(s) achieving the minimum
    supply cost — aggregate, group-min, equality join-back (Catalyst's
    decorrelation of the Q2 scalar subquery). Ties keep every minimal
    supplier, exactly like the SQL."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        dsum(F.col("l_extendedprice"), "supply_cost")
    )
    best = costs.groupBy("l_partkey").agg(
        F.min("supply_cost").alias("__min_cost")
    ).withColumnRenamed("l_partkey", "__bp")
    return (
        part.join(best, part.p_partkey == F.col("__bp"))
        .join(
            costs,
            (F.col("l_partkey") == F.col("__bp"))
            & (F.col("supply_cost") == F.col("__min_cost")),
        )
        .select(
            "p_partkey",
            "p_brand",
            F.col("l_suppkey").alias("best_suppkey"),
            F.col("supply_cost").alias("min_supply_cost"),
        )
    )


_Q16_ORACLE = """
SELECT p_brand, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
GROUP BY p_brand, p_size
"""


@query("q16_supplier_variety", oracle=_Q16_ORACLE)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per part attribute group with a
    dimension exclusion. COUNT(DISTINCT) plans as the two-phase expand +
    partial-agg shape; the part dimension broadcast-joins the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") != "Brand#1"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


_WFIRSTLAST_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderdate,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS last_order,
       nth_value(o_orderkey, 2) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@query("window_first_last_nth", oracle=_WFIRSTLAST_ORACLE)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional analytic window functions: each order sees its
    customer's first, last, and second order (explicit full frame for
    last/nth — the default running frame is a classic silent-wrong-answer
    trap both engines share)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(full).alias("second_order"),
    )


_SCALAR_TEXT2_ORACLE = """
SELECT c_custkey,
       split_part(c_name, '#', 2) AS cust_num,
       CAST(regexp_extract(c_name, '#0*(\\d+)$', 1) AS BIGINT) AS cust_id,
       translate(c_name, '#0', '-_') AS translated,
       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
       reverse(c_name) AS reversed,
       repeat('-', CAST(c_custkey % 5 AS INT)) AS bar
FROM customer
"""


@query("scalar_text_functions", oracle=_SCALAR_TEXT2_ORACLE)
def scalar_text_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function breadth: split extraction, regex capture groups,
    translate, padding, reverse, repeat — all codegen'd narrow maps."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.substring_index("c_name", "#", -1).alias("cust_num"),
        F.regexp_extract("c_name", r"#0*(\d+)$", 1)
        .cast("long")
        .alias("cust_id"),
        F.translate("c_name", "#0", "-_").alias("translated"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded"),
        F.reverse("c_name").alias("reversed"),
        F.repeat(F.lit("-"), (F.col("c_custkey") % 5).cast("int")).alias(
            "bar"
        ),
    )


_INTERSECT_ALL_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT ALL
SELECT user_id FROM events WHERE event_type = 'view'
"""


@query("set_intersect_all", oracle=_INTERSECT_ALL_ORACLE)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset semantics: a user clicking 5× and viewing
    3× contributes 3 rows (min of the multiplicities), where INTERSECT
    collapses to 1. Plans as a count-compare aggregate, not a join."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    return clicks.intersectAll(views)


_EXCEPT_ALL_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT ALL
SELECT user_id FROM events WHERE event_type = 'view'
"""


@query("set_except_all", oracle=_EXCEPT_ALL_ORACLE)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference: clicks minus views per user by
    multiplicity (5 clicks − 3 views → 2 rows), where EXCEPT drops the
    user entirely if they viewed even once."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    return clicks.exceptAll(views)


_NULLSAFE_ORACLE = """
SELECT DISTINCT a.user_id
FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'click') a
JOIN (SELECT DISTINCT user_id FROM events WHERE event_type = 'error') b
  ON a.user_id IS NOT DISTINCT FROM b.user_id
"""


@query("join_null_safe_equal", oracle=_NULLSAFE_ORACLE)
def join_null_safe_equal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
    each other instead of vanishing — the semantics CDC/merge pipelines
    need when the business key is nullable. Still plans as a hash join
    (null-safe equality is a valid equi-key), not a cartesian filter."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    b = (
        ev.filter(F.col("event_type") == "error")
        .select(F.col("user_id").alias("b_uid"))
        .distinct()
    )
    return (
        a.join(b, F.col("user_id").eqNullSafe(F.col("b_uid")))
        .select("user_id")
        .distinct()
    )


_BITWISE_ORACLE = """
SELECT event_id,
       event_id & 255 AS low_byte,
       event_id | 4096 AS with_flag,
       xor(event_id, user_id) AS xored,
       event_id << 2 AS shifted_l,
       event_id >> 3 AS shifted_r,
       bit_count(event_id) AS popcount
FROM events
WHERE user_id IS NOT NULL AND event_id < 1000
"""


@query("scalar_bitwise_ops", oracle=_BITWISE_ORACLE)
def scalar_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface (AND/OR/XOR, shifts, popcount) — flag-field
    and bitmap-index manipulation; all JVM-side codegen expressions."""
    ev = load_table(spark, sf_dir, "events")
    e = F.col("event_id")
    return ev.filter(F.col("user_id").isNotNull() & (e < 1000)).select(
        "event_id",
        e.bitwiseAND(F.lit(255)).alias("low_byte"),
        e.bitwiseOR(F.lit(4096)).alias("with_flag"),
        e.bitwiseXOR(F.col("user_id")).alias("xored"),
        F.shiftleft(e, 2).alias("shifted_l"),
        F.shiftright(e, 3).alias("shifted_r"),
        F.bit_count(e).alias("popcount"),
    )


_URL_ORACLE = """
WITH u AS (
    SELECT doc_id,
           'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang
               || '&sz=' || CAST(n_chars AS VARCHAR) AS url
    FROM documents
)
SELECT doc_id,
       regexp_extract(url, '^https://([^/]+)/', 1) AS host,
       regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
       CAST(regexp_extract(url, '[?&]sz=([^&]*)', 1) AS BIGINT) AS sz_param,
       regexp_extract(url, '\\.([a-z]+)\\.com', 1) AS subdomain_tld
FROM u
"""


@query("scalar_url_parsing", oracle=_URL_ORACLE)
def scalar_url_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition — host / path / query-parameter extraction via
    Spark's ``parse_url`` (plus one regexp), the log-parsing scalar
    surface every clickstream pipeline needs. ``parse_url(url, 'QUERY',
    key)`` does keyed query-string lookup natively; the oracle proves
    the same semantics in portable regexp form. Pure narrow projection:
    no shuffle, whole-stage codegen, scales linearly."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&sz="),
        F.col("n_chars").cast("string"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url(url, F.lit("QUERY"), F.lit("sz"))
        .cast("long")
        .alias("sz_param"),
        F.regexp_extract(url, r"\.([a-z]+)\.com", 1).alias("subdomain_tld"),
    )


_IP_ORACLE = """
WITH ip AS (
    SELECT event_id,
           (user_id * 2654435761) % 4294967296 AS ip_int
    FROM events
),
oct AS (
    SELECT event_id, ip_int,
           ip_int // 16777216 AS o1,
           (ip_int // 65536) % 256 AS o2,
           (ip_int // 256) % 256 AS o3,
           ip_int % 256 AS o4
    FROM ip
),
q AS (
    SELECT event_id, ip_int,
           CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.'
               || CAST(o3 AS VARCHAR) || '.' || CAST(o4 AS VARCHAR)
               AS ip_addr,
           CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.'
               || CAST(o3 AS VARCHAR) || '.0/24' AS subnet,
           (ip_int // 256) * 256 AS subnet_base
    FROM oct
)
SELECT subnet,
       CAST(subnet_base AS BIGINT) AS subnet_base,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT ip_int) AS BIGINT) AS n_ips,
       min(ip_addr) AS sample_ip
FROM q
GROUP BY subnet, subnet_base
ORDER BY n_events DESC, subnet
LIMIT 20
"""


@query("scalar_ipv4_subnet_rollup", oracle=_IP_ORACLE)
def scalar_ipv4_subnet_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 integer↔dotted-quad conversion and /24 CIDR rollup — the
    network-log scalar surface (the fixture has no IP column, so a
    deterministic Knuth-hash of user_id stands in; the arithmetic under
    test is the octet decomposition and subnet masking itself). Pure
    integer div/mod in whole-stage codegen, one map-side-combined count
    per subnet, top-20 via TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    ip_int = (F.col("user_id") * F.lit(2654435761)) % F.lit(4294967296)
    o1 = (ip_int / 16777216).cast("long")
    o2 = ((ip_int / 65536) % 256).cast("long")
    o3 = ((ip_int / 256) % 256).cast("long")
    o4 = (ip_int % 256).cast("long")
    q = ev.select(
        "event_id",
        ip_int.alias("ip_int"),
        F.concat_ws(
            ".",
            o1.cast("string"),
            o2.cast("string"),
            o3.cast("string"),
            o4.cast("string"),
        ).alias("ip_addr"),
        F.concat(
            F.concat_ws(
                ".",
                o1.cast("string"),
                o2.cast("string"),
                o3.cast("string"),
            ),
            F.lit(".0/24"),
        ).alias("subnet"),
        ((ip_int / 256).cast("long") * 256).alias("subnet_base"),
    )
    return (
        q.groupBy("subnet", "subnet_base")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_distinct("ip_int").cast("long").alias("n_ips"),
            F.min("ip_addr").alias("sample_ip"),
        )
        .orderBy(F.col("n_events").desc(), "subnet")
        .limit(20)
    )


_SCALAR_DT_ORACLE = """
SELECT o_orderkey,
       o_orderdate,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
       CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mth,
       CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dom,
       CAST(EXTRACT(dayofyear FROM o_orderdate) AS INT) AS doy,
       CAST(EXTRACT(dow FROM o_orderdate) + 1 AS INT) AS dow_sun1,
       CAST(EXTRACT(week FROM o_orderdate) AS INT) AS iso_week,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       last_day(o_orderdate) AS month_end,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
       CAST(datediff('day', DATE '1995-01-01', o_orderdate)
            AS BIGINT) AS days_since_95
FROM orders
"""


@query("scalar_datetime_functions", oracle=_SCALAR_DT_ORACLE)
def scalar_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime-function breadth: calendar field extraction (year/
    quarter/month/day/day-of-year), day-of-week under the Sunday=1
    convention (Spark's `dayofweek` natively; DuckDB's 0-based `dow`
    shifted to match — the classic cross-engine off-by-one), ISO week,
    month boundaries (`date_trunc`/`last_day`), month arithmetic with
    end-of-month clamping (`add_months`), and an epoch-anchored day
    difference. All codegen'd narrow maps on the date column — scalar
    date work must never leave the JVM."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        "o_orderdate",
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mth"),
        F.dayofmonth(d).alias("dom"),
        F.dayofyear(d).alias("doy"),
        F.dayofweek(d).alias("dow_sun1"),
        F.weekofyear(d).alias("iso_week"),
        F.trunc(d, "month").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.add_months(d, 3).alias("plus_3m"),
        F.datediff(d, F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
    )


_SYMDIFF_ORACLE = """
WITH h1 AS (
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-06-30'
),
h2 AS (
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate BETWEEN DATE '1995-07-01' AND DATE '1995-12-31'
)
SELECT o_custkey, 'h1_only' AS side FROM (
    SELECT o_custkey FROM h1 EXCEPT SELECT o_custkey FROM h2)
UNION ALL
SELECT o_custkey, 'h2_only' AS side FROM (
    SELECT o_custkey FROM h2 EXCEPT SELECT o_custkey FROM h1)
"""


@query("set_symmetric_difference", oracle=_SYMDIFF_ORACLE)
def set_symmetric_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference of the 1995-H1 vs 1995-H2 active-customer
    sets, tagged by side — the churn/acquisition split in one set
    expression ((A∖B) ∪ (B∖A); completes the set-op family:
    union/intersect/except all have registry entries, symmetric
    difference is the composition users actually reach for). Both
    halves come from ONE orders scan predicate-split into two DISTINCT
    aggregates; each EXCEPT plans as a left-anti hash join on the
    already-deduped key sets."""
    o = load_table(spark, sf_dir, "orders")
    h1 = (
        o.where(
            F.col("o_orderdate").between("1995-01-01", "1995-06-30")
        )
        .select("o_custkey")
        .distinct()
    )
    h2 = (
        o.where(
            F.col("o_orderdate").between("1995-07-01", "1995-12-31")
        )
        .select("o_custkey")
        .distinct()
    )
    return h1.exceptAll(h2).select(
        "o_custkey", F.lit("h1_only").alias("side")
    ).unionAll(
        h2.exceptAll(h1).select(
            "o_custkey", F.lit("h2_only").alias("side")
        )
    )


_RANGE_COUNT_ORACLE = """
WITH bounds AS (
    SELECT min(CAST(o_orderdate AS DATE)) AS lo,
           max(CAST(o_orderdate AS DATE)) AS hi
    FROM orders
),
cal AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
    FROM bounds
),
daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM orders GROUP BY 1
),
cum AS (
    SELECT c.day,
           CAST(SUM(coalesce(d.c, 0)) OVER (ORDER BY c.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_orders
    FROM cal c LEFT JOIN daily d ON d.day = c.day
),
sample AS (
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(l.l_shipdate AS DATE) AS ship,
           CAST(l.l_shipdate AS DATE)
               + to_days(CAST(1 + l.l_linenumber % 14 AS INT)) AS receipt,
           b.lo, b.hi
    FROM lineitem l CROSS JOIN bounds b
    WHERE l.l_orderkey % 997 = 0
)
SELECT s.l_orderkey, s.l_linenumber, s.ship,
       CAST(s.receipt AS DATE) AS receipt,
       CAST(chi.cum_orders
            - coalesce(clo.cum_orders, 0) AS BIGINT) AS in_transit_orders
FROM sample s
JOIN cum chi ON chi.day = least(s.receipt, s.hi)
LEFT JOIN cum clo
    ON clo.day = least(s.ship - INTERVAL 1 DAY, CAST(s.hi AS TIMESTAMP))
"""


@query("join_range_count_prefix_sum", oracle=_RANGE_COUNT_ORACLE)
def join_range_count_prefix_sum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interval range-COUNT without a range join: how many orders were
    placed while each (sampled) lineitem was in transit
    [l_shipdate, l_receiptdate]. The naive plan is a non-equi
    point-in-interval join (quadratic at 100 TB); this densifies the
    bounded calendar (sequence + explode), takes ONE running prefix sum
    of daily order counts, and turns every interval count into TWO
    broadcast equi-lookups: C(receipt) − C(ship−1). The calendar is
    bounded by time, not data size, so the broadcast side stays ~2.4k
    rows at any corpus scale — the textbook prefix-sum decomposition
    for range aggregation (cf. `join_theta_price_band`, which keeps the
    non-equi form for genuinely unbounded band predicates)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bounds = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    cum = (
        cal.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
        .select(
            "day",
            F.sum("c")
            .over(
                Window.orderBy("day").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            .cast("long")
            .alias("cum_orders"),
        )
    )
    sample = (
        li.where(F.col("l_orderkey") % 997 == 0)
        .crossJoin(F.broadcast(bounds))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").cast("date").alias("ship"),
            F.date_add(
                F.col("l_shipdate").cast("date"),
                (1 + F.col("l_linenumber") % 14).cast("int"),
            ).alias("receipt"),
            "lo",
            "hi",
        )
    )
    chi = cum.select(
        F.col("day").alias("hi_day"),
        F.col("cum_orders").alias("c_hi"),
    )
    clo = cum.select(
        F.col("day").alias("lo_day"),
        F.col("cum_orders").alias("c_lo"),
    )
    return (
        sample.join(
            F.broadcast(chi),
            F.least(F.col("receipt"), F.col("hi")) == F.col("hi_day"),
        )
        .join(
            F.broadcast(clo),
            F.least(F.date_sub(F.col("ship"), 1), F.col("hi"))
            == F.col("lo_day"),
            "left",
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "ship",
            "receipt",
            (
                F.col("c_hi") - F.coalesce(F.col("c_lo"), F.lit(0))
            ).alias("in_transit_orders"),
        )
    )


_BLOOM_ORACLE = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
           AS revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 9000
GROUP BY o.o_orderpriority
"""


@query("join_bloom_prefilter", oracle=_BLOOM_ORACLE)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via an explicit Bloom filter: a 4096-bit
    3-hash bloom of the selective customer keys is aggregated into 64
    longs, broadcast as ONE row, and applied to orders BEFORE the join —
    the manual form of the runtime row-group filter that cuts shuffle
    and scan volume when the fact side dwarfs the dim side (at 100 TB
    the bloom removes most fact rows before they ever reach the join
    exchange; false positives are harmless because the exact broadcast
    join still runs after). md5-derived positions keep the filter
    engine-portable; the oracle is the PLAIN join — a bloom has no
    false negatives, so results must be identical by construction."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    dim = c.where(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000)
    ).select("c_custkey")

    def positions(key):
        return [
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(str(s) + ":"), key.cast("string"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % 4096
            )
            for s in range(3)
        ]

    # Build: one 64-long bitmap row (positions OR-folded per word).
    pos = dim.select(
        F.explode(F.array(*positions(F.col("c_custkey")))).alias("p")
    )
    words = pos.groupBy((F.col("p") / 64).cast("int").alias("idx")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))")
        ).alias("word")
    )
    bitmap = words.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("idx", "word")))
        ).alias("bm")
    )

    probe = o.crossJoin(F.broadcast(bitmap))
    cond = None
    for pc in positions(F.col("o_custkey")):
        idx = (pc / 64).cast("int")
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pc % 64).cast("int")
        )
        t = F.element_at(F.col("bm"), idx).bitwiseAND(bit) != 0
        cond = t if cond is None else (cond & t)
    pref = probe.where(cond).drop("bm")

    return (
        pref.join(F.broadcast(dim), pref["o_custkey"] == dim["c_custkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum(F.col("o_totalprice"), "revenue"),
        )
    )


_MOD97_ORACLE = """
WITH acct AS (
    SELECT o_orderkey,
           lpad(CAST(o_orderkey AS VARCHAR), 12, '0')
             || lpad(CAST(o_custkey AS VARCHAR), 8, '0') AS acct_num
    FROM orders
    WHERE o_orderkey % 50 = 0
),
folded AS (
    SELECT o_orderkey, acct_num,
           CAST(list_reduce(
               list_transform(range(1, 21), i ->
                   CAST(substr(acct_num, i, 1) AS BIGINT)),
               (r, d) -> (r * 10 + d) % 97
           ) AS BIGINT) AS mod97
    FROM acct
)
SELECT o_orderkey, acct_num, mod97,
       mod97 = 1 AS iban_style_valid
FROM folded
"""


@query("scalar_mod97_checksum", oracle=_MOD97_ORACLE)
def scalar_mod97_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mod-97 checksum validation (the IBAN / ISO 7064 family) of
    20-digit synthetic account numbers: the number is far beyond int64,
    so the residue folds digit-by-digit with Horner's rule
    r ← (10r + d) mod 97 — a pure higher-order-function expression
    (`F.aggregate` over the digit array) that stays in whole-stage
    codegen, the pattern for ANY big-number checksum (mod-11, Luhn,
    ISBN) without strings-to-bigint overflow or Python. One narrow
    map; the oracle's ``list_reduce`` folds identically."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 50 == 0
    )
    acct = F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
        F.lpad(F.col("o_custkey").cast("string"), 8, "0"),
    )
    digits = F.transform(
        F.sequence(F.lit(1), F.lit(20)),
        lambda i: F.substring(F.col("acct_num"), 1, 20)
        .substr(i, F.lit(1))
        .cast("long"),
    )
    mod97 = F.aggregate(
        digits,
        F.lit(0).cast("long"),
        lambda r, d: (r * 10 + d) % 97,
    )
    return (
        o.select("o_orderkey", acct.alias("acct_num"))
        .select(
            "o_orderkey",
            "acct_num",
            mod97.cast("long").alias("mod97"),
        )
        .select(
            "o_orderkey",
            "acct_num",
            "mod97",
            (F.col("mod97") == 1).alias("iban_style_valid"),
        )
    )


_DIVISION_ORACLE = """
WITH divisor AS (
    SELECT s_suppkey AS s FROM supplier WHERE s_suppkey < 3
),
bought AS (
    SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_suppkey IN (SELECT s FROM divisor)
),
k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM divisor)
SELECT b.c AS custkey,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers_covered
FROM bought b
GROUP BY b.c
HAVING COUNT(*) = (SELECT k FROM k)
"""


@query("set_relational_division", oracle=_DIVISION_ORACLE)
def set_relational_division(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Relational DIVISION (the ÷ of relational algebra, the operator
    SQL never got a keyword for): customers who have bought from EVERY
    supplier in the divisor set (suppliers 0-2) — 'for all' turned into counting, the only
    scale-safe form: restrict the purchase facts to the divisor set
    (broadcast semi-join), collapse to distinct (customer, supplier),
    and keep customers whose distinct coverage equals |divisor| (a
    1-row broadcast). The textbook double-NOT-EXISTS formulation is a
    correlated anti-join per row; this is two hash stages. Completes
    the set-operator family beside INTERSECT/EXCEPT ALL and the
    quantified-comparison subqueries."""
    sup = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    divisor = sup.where(F.col("s_suppkey") < 3).select(
        F.col("s_suppkey").alias("s")
    )
    bought = (
        li.join(F.broadcast(divisor), li["l_suppkey"] == F.col("s"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), "s")
        .distinct()
    )
    k = divisor.agg(F.count(F.lit(1)).cast("long").alias("k"))
    return (
        bought.groupBy("c")
        .agg(F.count(F.lit(1)).cast("long").alias("n_suppliers_covered"))
        .crossJoin(F.broadcast(k))
        .where(F.col("n_suppliers_covered") == F.col("k"))
        .select(
            F.col("c").alias("custkey"), "n_suppliers_covered"
        )
    )


_B62 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

_BASE62_ORACLE = f"""
WITH src AS (
    SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0
),
enc AS (
    SELECT o_orderkey,
           list_reduce(
               list_transform(range(0, 7), i ->
                   substr('{_B62}',
                          CAST((o_orderkey // CAST(62 ** (6 - i)
                                                  AS BIGINT)) % 62
                               AS INT) + 1, 1)),
               (a, b) -> a || b) AS short_id
    FROM src
)
SELECT o_orderkey, short_id,
       CAST(length(short_id) AS BIGINT) AS id_len
FROM enc
"""


@query("scalar_base62_encode", oracle=_BASE62_ORACLE)
def scalar_base62_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width base-62 short-ID encoding of order keys (7 symbols
    cover up to 62⁷ ≈ 3.5e12) — the URL-shortener / share-link /
    surrogate-key encoding, as a PURE codegen expression: digit i is an
    alphabet lookup at (key div 62^(6−i)) mod 62, the 7 positions
    unrolled at plan time into one concat — no Python, no string
    building in the driver. TRUE long integer division (`div`) at
    every position, matching DuckDB's `//` bit-for-bit at ANY key
    width (double division + cast would silently diverge once
    quotients exceed 2^53). One narrow map over the filtered scan."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 97 == 0
    )
    chars = [
        F.substring(F.lit(_B62), F.lit(1), F.lit(62)).substr(
            (
                F.expr(f"o_orderkey div {62 ** (6 - i)}L") % 62
            ).cast("int")
            + 1,
            F.lit(1),
        )
        for i in range(7)
    ]
    return o.select(
        "o_orderkey",
        F.concat(*chars).alias("short_id"),
    ).select(
        "o_orderkey",
        "short_id",
        F.length("short_id").cast("long").alias("id_len"),
    )


_LUHN_ORACLE = """
WITH src AS (
    SELECT o_orderkey FROM orders WHERE o_orderkey % 37 = 0
),
d AS (
    SELECT o_orderkey,
           lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS card_no,
           list_sum(list_transform(range(1, 13), i ->
               CASE WHEN i % 2 = 1
                    THEN CASE WHEN 2 * ((o_orderkey // CAST(10 ** (12 - i)
                                         AS BIGINT)) % 10) > 9
                              THEN 2 * ((o_orderkey // CAST(10 ** (12 - i)
                                         AS BIGINT)) % 10) - 9
                              ELSE 2 * ((o_orderkey // CAST(10 ** (12 - i)
                                         AS BIGINT)) % 10) END
                    ELSE (o_orderkey // CAST(10 ** (12 - i)
                                             AS BIGINT)) % 10
               END)) AS luhn_sum
    FROM src
)
SELECT o_orderkey, card_no, CAST(luhn_sum AS BIGINT) AS luhn_sum,
       CAST(CASE WHEN luhn_sum % 10 = 0 THEN 1 ELSE 0 END AS INT)
           AS is_valid
FROM d
"""


@query("scalar_luhn_checksum", oracle=_LUHN_ORACLE)
def scalar_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn (mod-10) checksum over 12-digit identifiers derived from
    order keys — the card/IMEI/member-ID validity screen a DQ pipeline
    runs on ingested identifiers (complementing `scalar_mod97_checksum`'s
    IBAN scheme). Digit i (from the left of the zero-padded number) is
    pure long arithmetic (key div 10^(12-i)) mod 10; odd positions from
    the left of an even-length number are the ones Luhn doubles, with
    the >9 fold expressed as 2d-9. All 12 positions unroll at plan time
    into one codegen expression — no strings except the display column,
    no Python, exact at any key width."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 37 == 0
    )
    terms = []
    for i in range(1, 13):
        d = F.expr(f"o_orderkey div {10 ** (12 - i)}L") % 10
        if i % 2 == 1:
            terms.append(F.when(2 * d > 9, 2 * d - 9).otherwise(2 * d))
        else:
            terms.append(d)
    luhn = terms[0]
    for t in terms[1:]:
        luhn = luhn + t
    return o.select(
        "o_orderkey",
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias(
            "card_no"
        ),
        luhn.cast("long").alias("luhn_sum"),
        F.when(luhn % 10 == 0, 1).otherwise(0).cast("int").alias(
            "is_valid"
        ),
    )


_HAVERSINE_ORACLE = """
WITH c AS (
    SELECT n_nationkey,
           n_name,
           CAST((n_nationkey * 7) % 140 - 70 AS DOUBLE)
               + CAST(0.5 AS DOUBLE) AS lat,
           CAST((n_nationkey * 13) % 360 - 180 AS DOUBLE)
               + CAST(0.5 AS DOUBLE) AS lon
    FROM nation
),
p AS (
    SELECT a.n_name AS nation_a, b.n_name AS nation_b,
           radians(a.lat) AS la, radians(b.lat) AS lb,
           radians(b.lat - a.lat) AS dlat,
           radians(b.lon - a.lon) AS dlon
    FROM c a JOIN c b ON a.n_nationkey < b.n_nationkey
),
h AS (
    SELECT nation_a, nation_b,
           sin(dlat / 2) * sin(dlat / 2)
               + cos(la) * cos(lb) * sin(dlon / 2) * sin(dlon / 2) AS a
    FROM p
)
SELECT nation_a, nation_b,
       round(CAST(2 * 6371 AS DOUBLE)
             * atan2(sqrt(a), sqrt(1 - a)), 3) AS dist_km
FROM h
"""


@query("scalar_haversine_pairs", oracle=_HAVERSINE_ORACLE)
def scalar_haversine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle (haversine) distances between all nation pairs on
    synthetic deterministic coordinates — the geo-distance scalar every
    logistics/geo-dedup pipeline needs, in the numerically stable atan2
    form (the naive asin formulation loses precision near antipodes,
    where sqrt(a)→1). Trig runs in IEEE doubles on both engines;
    rounding to 3 decimals (meter precision) leaves ~8 orders of
    magnitude of margin over cross-libm ulp drift. The pair join is a
    tiny dimension self-join (broadcast); at scale the same expression
    applies per-row to point pairs."""
    n = load_table(spark, sf_dir, "nation")
    c = n.select(
        "n_nationkey",
        "n_name",
        ((F.col("n_nationkey") * 7) % 140 - 70 + 0.5)
        .cast("double")
        .alias("lat"),
        ((F.col("n_nationkey") * 13) % 360 - 180 + 0.5)
        .cast("double")
        .alias("lon"),
    )
    a, b = c.alias("a"), c.alias("b")
    p = a.join(
        F.broadcast(b),
        F.col("a.n_nationkey") < F.col("b.n_nationkey"),
    ).select(
        F.col("a.n_name").alias("nation_a"),
        F.col("b.n_name").alias("nation_b"),
        F.radians(F.col("a.lat")).alias("la"),
        F.radians(F.col("b.lat")).alias("lb"),
        F.radians(F.col("b.lat") - F.col("a.lat")).alias("dlat"),
        F.radians(F.col("b.lon") - F.col("a.lon")).alias("dlon"),
    )
    hav = (
        F.sin(F.col("dlat") / 2) * F.sin(F.col("dlat") / 2)
        + F.cos(F.col("la"))
        * F.cos(F.col("lb"))
        * F.sin(F.col("dlon") / 2)
        * F.sin(F.col("dlon") / 2)
    )
    return p.select(
        "nation_a",
        "nation_b",
        F.round(
            2 * 6371.0 * F.atan2(F.sqrt(hav), F.sqrt(1 - hav)), 3
        ).alias("dist_km"),
    )


_FUZZY_LEV_ORACLE = """
SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev_dist
FROM part a
JOIN part b ON a.p_brand = b.p_brand AND a.p_size = b.p_size
           AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 10
"""


@query("join_fuzzy_levenshtein", oracle=_FUZZY_LEV_ORACLE)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity matching: candidate part pairs share a
    (brand, size) blocking key — an equi-join, NOT a cartesian — and
    survive on Levenshtein edit distance ≤ 10 over the name. This is
    the classic record-linkage shape: blocking bounds the quadratic
    stage to within-block pairs (≈ n/|blocks| each), exactly how it
    must run at 100 TB, and the edit distance is the engines' native
    DP implementation on both sides (unit costs — identical results).
    Complements the token-set dedup family (`dedup_ngram_jaccard`)
    with the character-level similarity a product-catalog pipeline
    uses for typo-grade duplicates."""
    pt = load_table(spark, sf_dir, "part")
    a, b = pt.alias("a"), pt.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .where(lev <= 10)
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            lev.cast("long").alias("lev_dist"),
        )
    )


_UUID3_ORACLE = """
WITH h AS (
    SELECT o_orderkey,
           md5('orders:' || CAST(o_orderkey AS VARCHAR)) AS hx
    FROM orders WHERE o_orderkey % 53 = 0
)
SELECT o_orderkey,
       substr(hx, 1, 8) || '-' || substr(hx, 9, 4)
           || '-3' || substr(hx, 14, 3) || '-'
           || substr('89ab',
                     CAST((CAST(('0x' || substr(hx, 17, 1)) AS BIGINT) % 4)
                          AS INT) + 1, 1)
           || substr(hx, 18, 3) || '-' || substr(hx, 21, 12) AS uuid3
FROM h
"""


@query("scalar_uuid3_surrogate_keys", oracle=_UUID3_ORACLE)
def scalar_uuid3_surrogate_keys(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic name-based UUIDs (RFC 4122 version 3, md5): hash a
    namespaced business key and format the digest as
    8-4-4-4-12 with the version nibble forced to 3 and the variant
    nibble to 10xx — the surrogate-key scheme that lets independent
    pipelines mint IDENTICAL ids for the same entity with no
    coordination service (the property a distributed dimension build
    needs; sequence generators don't parallelize, random UUIDs don't
    reconcile). The variant nibble maps h&3 into '89ab' by substring
    lookup — pure codegen string surgery, identical on both engines."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 53 == 0
    )
    hx = F.md5(
        F.concat(F.lit("orders:"), F.col("o_orderkey").cast("string"))
    )
    variant = F.substring(F.lit("89ab"), F.lit(1), F.lit(4)).substr(
        (
            F.conv(F.substring(hx, 17, 1), 16, 10).cast("int") % 4
        )
        + 1,
        F.lit(1),
    )
    return o.select(
        "o_orderkey",
        F.concat(
            F.substring(hx, 1, 8),
            F.lit("-"),
            F.substring(hx, 9, 4),
            F.lit("-3"),
            F.substring(hx, 14, 3),
            F.lit("-"),
            variant,
            F.substring(hx, 18, 3),
            F.lit("-"),
            F.substring(hx, 21, 12),
        ).alias("uuid3"),
    )


# Geohash: 20 quantized bits per axis, lon on even interleave positions
# (bit 39 = lon MSB), 8 base-32 symbols of 5 bits. The standard geohash
# alphabet drops a/i/l/o.
_GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

_GEOHASH_ORACLE = f"""
WITH c AS (
    SELECT n_nationkey,
           CAST((n_nationkey * 7) % 140 - 70 AS DOUBLE)
               + CAST(0.5 AS DOUBLE) AS lat,
           CAST((n_nationkey * 13) % 360 - 180 AS DOUBLE)
               + CAST(0.5 AS DOUBLE) AS lon
    FROM nation
),
q AS (
    SELECT n_nationkey, lat, lon,
           CAST(floor((lat + 90) / 180 * 1048576) AS BIGINT) AS latq,
           CAST(floor((lon + 180) / 360 * 1048576) AS BIGINT) AS lonq
    FROM c
),
iv AS (
    SELECT n_nationkey, lat, lon,
           {" + ".join(
               f"(((lonq >> {i}) & 1) << {2 * i + 1})"
               f" + (((latq >> {i}) & 1) << {2 * i})"
               for i in range(20)
           )} AS bits
    FROM q
)
SELECT n_nationkey, lat, lon,
       {" || ".join(
           f"substr('{_GEOHASH_ALPHABET}', "
           f"CAST(((bits >> {35 - 5 * j}) & 31) AS INT) + 1, 1)"
           for j in range(8)
       )} AS geohash8
FROM iv
"""


@query("scalar_geohash_encode", oracle=_GEOHASH_ORACLE)
def scalar_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard 8-character geohash encoding (40 bits: lat/lon each
    quantized to 20 bits, bit-interleaved lon-first, base-32 with the
    a/i/l/o-free alphabet) — the geo-bucketing key for proximity
    joins, cell aggregation, and prefix-based radius search
    (complementing `scalar_haversine_pairs`' exact distances: geohash
    prefixes are the BLOCKING stage, haversine the verify stage, the
    same two-phase shape the dedup family uses). The quantization
    multiply is one exactly-representable double op; everything after
    is pure integer shift/mask unrolled at plan time into codegen —
    identical on both engines at any coordinate."""
    n = load_table(spark, sf_dir, "nation")
    c = n.select(
        "n_nationkey",
        ((F.col("n_nationkey") * 7) % 140 - 70 + 0.5)
        .cast("double")
        .alias("lat"),
        ((F.col("n_nationkey") * 13) % 360 - 180 + 0.5)
        .cast("double")
        .alias("lon"),
    )
    q = c.select(
        "n_nationkey",
        "lat",
        "lon",
        F.floor((F.col("lat") + 90) / 180 * 1048576)
        .cast("long")
        .alias("latq"),
        F.floor((F.col("lon") + 180) / 360 * 1048576)
        .cast("long")
        .alias("lonq"),
    )
    bits = None
    for i in range(20):
        term = F.shiftleft(
            F.shiftright(F.col("lonq"), i).bitwiseAND(F.lit(1)),
            2 * i + 1,
        ) + F.shiftleft(
            F.shiftright(F.col("latq"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        bits = term if bits is None else bits + term
    iv = q.select("n_nationkey", "lat", "lon", bits.alias("bits"))
    chars = [
        F.substring(
            F.lit(_GEOHASH_ALPHABET), F.lit(1), F.lit(32)
        ).substr(
            F.shiftright(F.col("bits"), 35 - 5 * j)
            .bitwiseAND(F.lit(31))
            .cast("int")
            + 1,
            F.lit(1),
        )
        for j in range(8)
    ]
    return iv.select(
        "n_nationkey", "lat", "lon", F.concat(*chars).alias("geohash8")
    )
