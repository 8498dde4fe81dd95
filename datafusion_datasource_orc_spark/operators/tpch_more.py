"""TPC-H queries 2, 7-9, 11-13, 15-17, 20-22 adapted to the testdata schema.

Completes the 22-query TPC-H surface started in operators/tpch.py — the
reference validates its query breadth wholesale by pushing TPC-DS 1-99
through DataFusion (src/bin/tpcds_bench.rs:68-69); these queries are the
equivalent breadth demonstration on the driver's TPC-H-ish tables.

Schema adaptations (testdata has no partsupp table and no shipmode/
commitdate/receiptdate/phone/container columns — see FIXTURES.md):

- q2/q9/q11/q16/q20: partsupp is reconstructed from lineitem — the observed
  (l_partkey, l_suppkey) pairs with MIN(l_extendedprice) standing in for
  ps_supplycost and summed quantity/price for availqty/value. The query
  *shapes* (correlated min, HAVING vs scalar subquery, COUNT DISTINCT) are
  unchanged.
- q12: l_linestatus stands in for l_shipmode; the commit/receipt-date lateness
  predicate is dropped (columns absent). The conditional two-way count split
  on o_orderpriority is verbatim.
- q21: the late-delivery predicate (receipt > commit) becomes l_returnflag='R';
  the multi-supplier EXISTS / sole-blame NOT EXISTS structure is verbatim.
- q22: the phone country code becomes the trailing digit of c_name.

Every money aggregate routes through the exact-decimal-sum helpers
(functions/portable.py) so DuckDB hash-comparison is order-independent;
scalar thresholds (q11/q17/q22) are likewise decimal-exact before the
double compare, so both engines cut identically.

Scale notes (100 TB):
- nation/region/supplier are broadcast everywhere they appear.
- part (q2/q9/q16/q17/q20) is broadcast here; on a real cluster part grows
  with SF but stays ≪ lineitem — AQE converts to broadcast when it fits,
  else it's an orderly shuffle on partkey.
- The q21 self-semi/anti-joins shuffle lineitem on l_orderkey three times —
  co-partitioned, so AQE coalesces; bucketing lineitem by orderkey
  (sources.orc.write_orc_bucketed) removes the shuffles entirely.
- Scalar subqueries (q11/q15/q17/q22 thresholds) are computed as one-row
  aggregates and broadcast — never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_datasource_orc_spark.functions.portable import (
    money_avg_sql,
    money_sum,
    money_sum_sql,
)
from datafusion_datasource_orc_spark.operators.registry import query
from datafusion_datasource_orc_spark.operators.tpch import _DISC_PRICE, _disc_price
from datafusion_datasource_orc_spark.sources.tables import load_table


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


# ---- Q2: minimum cost supplier (correlated MIN subquery) --------------------
@query(
    "tpch_q2",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
    FROM ps
    JOIN eu ON l_suppkey = s_suppkey
    JOIN part ON p_partkey = l_partkey
    WHERE p_size <= 5
      AND cost = (SELECT MIN(ps2.cost) FROM ps ps2
                  JOIN eu eu2 ON ps2.l_suppkey = eu2.s_suppkey
                  WHERE ps2.l_partkey = p_partkey)
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: per-part minimum 'supply cost' with the correlated-MIN
    subquery decorrelated into a groupBy-min + equality join (the plan
    Catalyst itself produces for the SQL form)."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("cost")
    )
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = ps.join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
    min_cost = cand.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("cost").alias("min_cost")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    return (
        cand.join(
            min_cost,
            (F.col("l_partkey") == F.col("mc_partkey"))
            & (F.col("cost") == F.col("min_cost")),
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "cost")
    )


# ---- Q7: volume shipping between two nations --------------------------------
@query(
    "tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {money_sum_sql('volume', 6)} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
               {_DISC_PRICE} AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1997-12-31 00:00:00'
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            _ts("1996-01-01 00:00:00"), _ts("1997-12-31 00:00:00")
        )
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            _disc_price().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(money_sum(F.col("volume"), 6).alias("revenue"))
    )


# ---- Q8: national market share ----------------------------------------------
@query(
    "tpch_q8",
    oracle=f"""
    SELECT o_year,
           {money_sum_sql("CASE WHEN nation = 'NATION_1' THEN volume ELSE 0.0 END", 6)}
           / {money_sum_sql('volume', 6)} AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               {_DISC_PRICE} AS volume,
               n1.n_name AS nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region    ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 00:00:00'
    ) GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            _ts("1996-01-01 00:00:00"), _ts("1997-12-31 00:00:00")
        )
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region"))
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("volume")
    share_num = F.when(F.col("nation") == "NATION_1", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _disc_price().alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            (money_sum(share_num, 6) / money_sum(vol, 6)).alias("mkt_share")
        )
    )


# ---- Q9: product type profit ------------------------------------------------
@query(
    "tpch_q9",
    oracle=f"""
    SELECT nation, o_year, {money_sum_sql('amount', 6)} AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               {_DISC_PRICE} AS amount
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON o_orderkey = l_orderkey
        WHERE p_name LIKE '%widget%'
    ) GROUP BY nation, o_year
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape minus ps_supplycost (no partsupp table): profit = disc price.
    The join tree and year/nation rollup are verbatim."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            _disc_price().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(money_sum(F.col("amount"), 6).alias("sum_profit"))
    )


# ---- Q11: important stock identification (HAVING vs scalar subquery) --------
@query(
    "tpch_q11",
    oracle=f"""
    WITH scoped AS (
        SELECT l_partkey, l_extendedprice
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    )
    SELECT l_partkey AS partkey, {money_sum_sql('l_extendedprice', 2)} AS value
    FROM scoped
    GROUP BY l_partkey
    HAVING {money_sum_sql('l_extendedprice', 2)} >
           (SELECT {money_sum_sql('l_extendedprice', 2)} * 0.001 FROM scoped)
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part 'stock value' (from lineitem, no partsupp) vs a
    fraction of the scoped total. The total is a one-row aggregate broadcast
    into the HAVING compare — both sides exact-decimal so the cut is
    identical on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    scoped = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_partkey", "l_extendedprice")
    )
    by_part = scoped.groupBy("l_partkey").agg(
        money_sum(F.col("l_extendedprice"), 2).alias("value")
    )
    total = scoped.agg(
        (money_sum(F.col("l_extendedprice"), 2) * F.lit(0.001)).alias("threshold")
    )
    return (
        by_part.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("partkey"), "value")
    )


# ---- Q12: shipping modes and order priority ---------------------------------
@query(
    "tpch_q12",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape with l_linestatus standing in for l_shipmode (column absent);
    the priority-split conditional counts are verbatim."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# ---- Q13: customer order-count distribution ---------------------------------
@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: left join keeps order-less customers (c_count=0 bucket); the
    comment NOT LIKE filter becomes a priority filter (column absent)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# ---- Q15: top supplier (CTE + scalar MAX) -----------------------------------
@query(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {money_sum_sql(_DISC_PRICE, 6)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: the view/CTE becomes a reused DataFrame; the scalar MAX is a
    one-row aggregate broadcast into the filter (exact doubles from the same
    decimal sum on both engines, so equality is safe)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        money_sum(_disc_price(), 6).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        F.broadcast(s)
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---- Q16: parts/supplier relationship (COUNT DISTINCT + NOT IN) -------------
@query(
    "tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#15' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: supplier fan-out per part attribute bucket, from the
    lineitem-observed (part, supplier) pairs (no partsupp table)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#15")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---- Q17: small-quantity-order revenue (correlated AVG subquery) ------------
@query(
    "tpch_q17",
    oracle=f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
      AND l_quantity < (SELECT 0.2 * {money_avg_sql('l2.l_quantity', 2)}
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: the correlated per-part AVG decorrelates into a groupBy-avg joined
    back on partkey (Catalyst's own rewrite of the SQL form). The threshold
    is exact-decimal-derived so both engines cut the same rows."""
    li = load_table(spark, sf_dir, "lineitem")
    th = li.groupBy(F.col("l_partkey").alias("th_partkey")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count("l_quantity").cast("double")
            )
        ).alias("qty_threshold")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(th, F.col("l_partkey") == F.col("th_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


# ---- Q20: potential part promotion (nested IN over HAVING) ------------------
@query(
    "tpch_q20",
    oracle="""
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%widget%'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100
    )
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: the availqty comparison becomes a shipped-quantity HAVING
    (no partsupp); the IN-subquery is a left-semi join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    qualified = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 100)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(qualified, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


# ---- Q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS) -----------
@query(
    "tpch_q21",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape verbatim (late-delivery predicate → returnflag='R', columns
    absent): the EXISTS becomes a left-semi and the NOT EXISTS a left-anti
    self-join of lineitem — all three legs shuffle on l_orderkey, so AQE
    coalesces them into co-partitioned exchanges (bucketing by orderkey
    removes them entirely)."""
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    return (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---- Q22: global sales opportunity (anti join + scalar AVG) -----------------
@query(
    "tpch_q22",
    oracle=f"""
    WITH base AS (
        SELECT RIGHT(c_name, 1) AS cntrycode, c_acctbal, c_custkey
        FROM customer
        WHERE RIGHT(c_name, 1) IN ('1', '2', '3', '4', '5', '6', '7')
    )
    SELECT cntrycode, COUNT(*) AS numcust,
           {money_sum_sql('c_acctbal', 2)} AS totacctbal
    FROM base
    WHERE c_acctbal > (SELECT {money_avg_sql('c_acctbal', 2)}
                       FROM base WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority IN ('1-URGENT', '2-HIGH'))
    GROUP BY cntrycode
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22: country code = trailing digit of c_name (no phone column). The
    scalar AVG threshold is a broadcast one-row aggregate (decimal-exact);
    'no recent orders' becomes 'no urgent/high-priority orders' (every
    customer in the testdata has at least one order) — still a left-anti
    join on custkey."""
    cntry = F.expr("right(c_name, 1)")
    base = (
        load_table(spark, sf_dir, "customer")
        .filter(cntry.isin("1", "2", "3", "4", "5", "6", "7"))
        .select(cntry.alias("cntrycode"), "c_acctbal", "c_custkey")
    )
    avg_bal = base.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("c_acctbal").cast("double")
        ).alias("avg_bal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_custkey")
    )
    return (
        base.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
    )
