"""TPC-H-shaped analytical queries over the testdata star schema.

The reference validates its full query surface by running TPC-DS 1-99 through
DataFusion (src/bin/tpcds_bench.rs:68-69, :442-445). The driver testdata is
TPC-H-ish, so the headline analytical queries here are the classic TPC-H
shapes adapted to the reduced schema (no shipmode/commitdate/etc. columns).
These are also the bench.py headline queries.

All money aggregates use the exact-decimal-sum trick (functions/portable.py)
so the DuckDB oracle hash-matches regardless of execution order.

Scale notes:
- q1: single scan + 6-group agg → map-side partials, trivially scalable.
- q3/q10: fact-fact joins shuffle on orderkey/custkey; dims broadcast.
- q5: 6-way join; region/nation/supplier broadcast, customer-orders-lineitem
  shuffle on their keys. AQE reorders/skew-splits at runtime.
- q18: self-aggregation of lineitem (groupBy orderkey) then join — the
  HAVING subquery becomes a shuffled aggregate, not a correlated rescan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_datasource_orc_spark.functions.portable import (
    money_avg,
    money_avg_sql,
    money_sum,
    money_sum_sql,
)
from datafusion_datasource_orc_spark.operators.registry import query
from datafusion_datasource_orc_spark.sources.tables import load_table

# l_extendedprice*(1-l_discount): per-row double product is deterministic;
# cast to decimal(18,6) before SUM for order-independent aggregation.
_DISC_PRICE = "l_extendedprice * (1 - l_discount)"
_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"


def _disc_price() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def _charge() -> F.Column:
    return _disc_price() * (F.lit(1.0) + F.col("l_tax"))


# ---- Q1: pricing summary report -------------------------------------------
@query(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {money_sum_sql('l_quantity', 2)} AS sum_qty,
           {money_sum_sql('l_extendedprice', 2)} AS sum_base_price,
           {money_sum_sql(_DISC_PRICE, 6)} AS sum_disc_price,
           {money_sum_sql(_CHARGE, 6)} AS sum_charge,
           {money_avg_sql('l_quantity', 2)} AS avg_qty,
           {money_avg_sql('l_extendedprice', 2)} AS avg_price,
           {money_avg_sql('l_discount', 2)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity"), 2).alias("sum_qty"),
            money_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            money_sum(_disc_price(), 6).alias("sum_disc_price"),
            money_sum(_charge(), 6).alias("sum_charge"),
            money_avg(F.col("l_quantity"), 2).alias("avg_qty"),
            money_avg(F.col("l_extendedprice"), 2).alias("avg_price"),
            money_avg(F.col("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---- Q3: shipping priority (top-10 unshipped orders by revenue) ------------
@query(
    "tpch_q3",
    oracle=f"""
    SELECT o_orderkey,
           {money_sum_sql(_DISC_PRICE, 6)} AS revenue,
           CAST(o_orderdate AS TIMESTAMP) AS orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(money_sum(_disc_price(), 6).alias("revenue"))
        .select("o_orderkey", "revenue", F.col("o_orderdate").cast("timestamp_ntz").alias("orderdate"))
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


# ---- Q5: local supplier volume (6-way join) --------------------------------
@query(
    "tpch_q5",
    oracle=f"""
    SELECT n_name, {money_sum_sql(_DISC_PRICE, 6)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(money_sum(_disc_price(), 6).alias("revenue"))
    )


# ---- Q6: forecasting revenue change (pure scan-filter-agg) ------------------
@query(
    "tpch_q6",
    oracle=f"""
    SELECT {money_sum_sql('l_extendedprice * l_discount', 6)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(money_sum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"))


# ---- Q10: returned item reporting ------------------------------------------
@query(
    "tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {money_sum_sql(_DISC_PRICE, 6)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money_sum(_disc_price(), 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---- Q14: promotion effect (conditional aggregation) ------------------------
@query(
    "tpch_q14",
    oracle=f"""
    SELECT 100.0 * {money_sum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 6)}
           / {money_sum_sql(_DISC_PRICE, 6)} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * money_sum(promo, 6)
                / money_sum(_disc_price(), 6)
            ).alias("promo_revenue")
        )
    )


# ---- Q18: large volume customers (HAVING-subquery join) ---------------------
@query(
    "tpch_q18",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS TIMESTAMP) AS orderdate,
           o_totalprice,
           {money_sum_sql('l_quantity', 2)} AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(
            big.withColumnRenamed("l_orderkey", "big_orderkey"),
            F.col("o_orderkey") == F.col("big_orderkey"),
            "left_semi",
        )
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(money_sum(F.col("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp_ntz").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
    )


# ---- Q19: discounted revenue, disjunctive multi-predicate join ---------------
@query(
    "tpch_q19",
    oracle=f"""
    SELECT {money_sum_sql(_DISC_PRICE, 6)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(money_sum(_disc_price(), 6).alias("revenue"))
    )


# ---- Q4-ish: order priority checking via EXISTS -----------------------------
@query(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    matched = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))
