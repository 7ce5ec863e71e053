"""TPC-H pattern completion (SURVEY.md §2.5 relational surface).

The reference delegates every relational computation to the source/target
database engine as SQL strings (e.g. reference ``Template-to-MySQL/
BigQuery-to-MySQL-Method-1.py:56``); a user replacing those engines with
this repo needs the classic decision-support query shapes to run natively.
Rounds 1–4 shipped the Q1/Q2/Q3/Q5/Q13/Q16/Q18 patterns; this module
completes the TPC-H sweep with the remaining shapes, adapted to the
fixture schema (no ``partsupp``, no commit/receipt dates, no comments —
each adaptation keeps the *query shape*: the joins, the subquery
correlation structure, and the aggregation pattern are the TPC-H ones).

Scale notes apply throughout: ``nation``/``region`` are fixed-size and
always broadcast; ``part``/``supplier`` get broadcast hints because they
are orders-of-magnitude smaller than the fact tables at every SF (at
extreme SF AQE falls back to shuffle join above
``spark.sql.autoBroadcastJoinThreshold``); the lineitem⋈orders backbone
shuffles on its join key once and every aggregate runs partial→final.
Double aggregation is decimal-routed (see ``_util.DEC``) so results are
bit-identical under any partition combine order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from extract_transform_load_template_multidb_spark.catalog import load_table
from extract_transform_load_template_multidb_spark.queries import query
from extract_transform_load_template_multidb_spark.queries._util import (
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


@query("q4_order_priority", oracle=_Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: date-windowed EXISTS semi-join, count by priority.

    (Adaptation: the fixture lacks ``l_commitdate``/``l_receiptdate``, so
    "late" is ``l_shipdate > o_orderdate`` — the correlated-EXISTS shape
    is unchanged.) The non-equi correlation rides on the equi-key
    ``l_orderkey = o_orderkey`` so the semi join stays a hash join with a
    residual condition, not a broadcast-nested-loop.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q6_ORACLE = f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')}
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", oracle=_Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan→filter→global-agg — the pushdown showcase.

    All three predicates reach the parquet scan as PushedFilters; the
    single-row aggregate is a partial-per-partition + final combine, no
    shuffle of data rows at all.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))


_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year, {sql_dsum('volume', 'revenue')}
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", oracle=_Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional two-nation trade volume by year.

    The two nation joins are broadcasts; the disjunctive nation-pair
    predicate lands after them and prunes to two nation pairs before the
    aggregate. lineitem⋈orders⋈customer is the only shuffle chain.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("date"))
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            volume.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume"), "revenue"))
    )


_Q8_ORACLE = f"""
SELECT o_year,
       {sql_dsum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END",
                 'nation_volume')},
       {sql_dsum('volume', 'total_volume')}
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
) all_nations
GROUP BY o_year
"""


@query("q8_market_share", oracle=_Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way join, conditional share aggregation by year.

    Emits the numerator and denominator as separate decimal-routed sums
    rather than their quotient so the oracle hash is division-order-free;
    the market share is ``nation_volume / total_volume``.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("date"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rk")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            dsum(
                F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                    0.0
                ),
                "nation_volume",
            ),
            dsum(F.col("volume"), "total_volume"),
        )
    )


_Q9_ORACLE = f"""
SELECT nation, o_year, {sql_dsum('amount', 'sum_profit')}
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity
           AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


@query("q9_product_profit", oracle=_Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year.

    (Adaptation: no ``partsupp``, so unit cost is ``p_retailprice``.)
    The ``p_name LIKE '%red%'`` filter prunes part before its broadcast;
    profit per line is computed pre-aggregation so the decimal routing
    sees one expression.
    """
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount"), "sum_profit"))
    )


_Q10_ORACLE = f"""
SELECT c_custkey, c_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= DATE '1996-10-01' AND o_orderdate < DATE '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items", oracle=_Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue in a quarter.

    ORDER BY + LIMIT compiles to TakeOrderedAndProject — per-partition
    top-20 heaps then a driver merge, never a global sort.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue, "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


_Q11_ORACLE = f"""
WITH partvalue AS (
  SELECT l_partkey, {sql_dsum('p_retailprice * l_quantity', 'value')}
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY l_partkey
)
SELECT l_partkey, value FROM partvalue
WHERE value > (
  SELECT CAST(SUM(CAST(p_retailprice * l_quantity AS DECIMAL(38,6)))
              AS DOUBLE) * 0.0006
  FROM lineitem JOIN part ON p_partkey = l_partkey
)
"""


@query("q11_important_stock", oracle=_Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value vs a global-total scalar threshold (0.06% of total stock value).

    (Adaptation: no ``partsupp``, so "stock value" is retailprice-weighted
    shipped quantity per part.) The global threshold is a 1-row aggregate
    broadcast into a theta-join — the per-part aggregate is computed once
    and reused for both sides' input via one shuffle on ``l_partkey``.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    value = F.col("p_retailprice") * F.col("l_quantity")
    joined = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    per_part = joined.groupBy("l_partkey").agg(dsum(value, "value"))
    threshold = joined.agg((dsum(value, "s"))).select(
        (F.col("s") * 0.0006).alias("__thr")
    )
    return per_part.join(
        F.broadcast(threshold), F.col("value") > F.col("__thr")
    ).select("l_partkey", "value")


_Q12_ORACLE = """
SELECT l_linestatus,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY l_linestatus
"""


@query("q12_late_lines_priority", oracle=_Q12_ORACLE)
def q12_late_lines_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional counts by category.

    (Adaptation: no ``l_shipmode``/receipt dates — the category is
    ``l_linestatus`` and "late" is shipped >60 days after order date.)
    Conditional counts use COUNT(CASE …) on both sides so the result
    type is BIGINT in Spark and DuckDB alike (SUM would be HUGEINT→double
    on the DuckDB side and hash-mismatch).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


_Q14_ORACLE = f"""
SELECT {sql_dsum("CASE WHEN p_type = 'PROMO' "
                 "THEN l_extendedprice * (1 - l_discount) ELSE 0 END",
                 'promo_revenue')},
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'total_revenue')}
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-09-01' AND l_shipdate < DATE '1996-10-01'
"""


@query("q14_promo_effect", oracle=_Q14_ORACLE)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share for one ship month.

    Numerator and denominator ship as separate decimal-routed sums (the
    share is ``100 * promo_revenue / total_revenue``); part is broadcast
    against the date-pruned lineitem scan.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("date"))
    )
    part = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).agg(
        dsum(
            F.when(F.col("p_type") == "PROMO", revenue).otherwise(0.0),
            "promo_revenue",
        ),
        dsum(revenue, "total_revenue"),
    )


_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dsum('l_extendedprice * (1 - l_discount)', 'total_revenue')}
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@query("q15_top_supplier", oracle=_Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the quarter's maximum revenue.

    The revenue "view" is computed once and self-compared against its own
    1-row max via a broadcast theta-join. Equality on the double is safe
    because both sides derive from the identical decimal-routed sum.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "total_revenue",
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("__best"))
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(
            F.broadcast(best), F.col("total_revenue") == F.col("__best")
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q17_ORACLE = f"""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS t_partkey, {sql_davg('l_quantity', 't_avg_qty')}
  FROM lineitem GROUP BY l_partkey
) t ON t_partkey = l_partkey
WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * t_avg_qty
"""


@query("q17_small_qty_revenue", oracle=_Q17_ORACLE)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue of orders far below the part's average quantity.

    The correlated ``avg(l_quantity)`` subquery is decorrelated into a
    per-part aggregate joined back on ``l_partkey`` — one shuffle, reused
    by the probe side. The per-part average is decimal-routed so the
    0.2× threshold is bit-identical in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    )
    per_part = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        davg(F.col("l_quantity"), "t_avg_qty")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("t_avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast(
                    "double"
                )
                / 7.0
            ).alias("avg_yearly")
        )
    )


_Q19_ORACLE = f"""
SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


@query("q19_disjunctive_revenue", oracle=_Q19_ORACLE)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs predicate spanning both join sides.

    The disjunction references part and lineitem columns together so it
    can only apply post-join; Catalyst still derives the common
    ``p_brand IN (…)``-style implied filters for the part side via
    constraint propagation, and the join itself stays a broadcast hash
    join on the equi-key.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & q.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
        )
    )


_Q20_ORACLE = f"""
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 45
)
"""


@query("q20_part_promotion", oracle=_Q20_ORACLE)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-join chain through a HAVING aggregate.

    (Adaptation: no ``partsupp``/``availqty`` — qualifying suppliers are
    those who shipped >45 units of any 'red%' part in the year.) The
    inner aggregate groups by (supplier, part) then collapses to distinct
    suppliers feeding a left-semi join against supplier.
    """
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    heavy = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum(F.col("l_quantity"), "q"))
        .filter(F.col("q") > 45)
        .select("l_suppkey")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    return supplier.join(
        heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


_Q21_ORACLE = """
WITH flagged AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late_supp
  FROM flagged GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM flagged
JOIN per_order USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE late = 1 AND n_supp >= 2 AND n_late_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@query("q21_waiting_suppliers", oracle=_Q21_ORACLE)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole-late-supplier EXISTS/NOT-EXISTS pattern.

    (Adaptation: "late" is shipped >90 days after order date.) The
    classic EXISTS(other supplier) AND NOT EXISTS(other late supplier)
    pair is algebraized into one per-order aggregate — ``n_supp >= 2 AND
    n_late_supp = 1`` is exactly that predicate for a row whose own
    supplier is late — so the order's lineitems are shuffled once instead
    of three times (self-join per quantifier), which is the rewrite that
    matters when lineitem is the 100 TB table.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    flagged = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90), 1
            )
            .otherwise(0)
            .alias("late"),
        )
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        flagged.join(per_order, "l_orderkey")
        .filter(
            (F.col("late") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1)
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


_Q22_ORACLE = f"""
SELECT c_nationkey, COUNT(*) AS numcust,
       {sql_dsum('c_acctbal', 'totacctbal')}
FROM customer
WHERE c_acctbal > (
    SELECT {sql_davg('c_acctbal', 'a')} FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= DATE '2000-01-01'
  )
GROUP BY c_nationkey
"""


@query("q22_dormant_customers", oracle=_Q22_ORACLE)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar subquery + anti-join + group.

    (Adaptation: the phone-prefix grouping becomes ``c_nationkey``, and
    "no orders" is windowed to orders since 2000 — every fixture customer
    has some order.) The positive-balance average is a broadcast 1-row
    scalar; the NOT EXISTS compiles to a left-anti hash join against the
    date-pruned orders scan.
    """
    customer = load_table(spark, sf_dir, "customer")
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg(davg(F.col("c_acctbal"), "a"))
        .select(F.col("a").alias("__avg_bal"))
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("date")
    )
    return (
        customer.join(
            F.broadcast(avg_bal), F.col("c_acctbal") > F.col("__avg_bal")
        )
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), "totacctbal"),
        )
    )
