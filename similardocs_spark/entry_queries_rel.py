"""Relational driver-contract pairs (TPC-H-style) — exercise the generic
aggregation/join/window operator surface on the driver's star schema, showing
the engine's host DataFrame layer handles standard analytics alongside the
full-text core. Floats encoded as rounded BIGINTs for cross-engine hashing.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-like pricing summary over lineitem."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity") * 100).cast("long").alias("sum_qty_e2"),
            F.round(F.sum("l_extendedprice") * 100).cast("long").alias("sum_base_e2"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
            ).cast("long").alias("sum_disc_e2"),
            F.count("*").alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(l_quantity) * 100) AS BIGINT) AS sum_qty_e2,
       CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS sum_base_e2,
       CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS sum_disc_e2,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-like: top 10 orders by revenue (join + agg + top-k)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("o_orderdate") < "1998-01-01")
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
            ).cast("long").alias("revenue_e2")
        )
        .orderBy(F.desc("revenue_e2"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_TOP_ORDERS = """
SELECT o.o_orderkey, o.o_orderpriority,
       CAST(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100) AS BIGINT) AS revenue_e2
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o.o_orderkey, o.o_orderpriority
ORDER BY revenue_e2 DESC, o.o_orderkey ASC LIMIT 10
"""


def q_customer_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function coverage: per-nation customer rank by account balance."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            "c_nationkey",
            "c_custkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_e2"),
            "rank",
        )
    )


SQL_CUSTOMER_RANKS = """
WITH ranked AS (
  SELECT c_nationkey, c_custkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_e2,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
  FROM customer
)
SELECT c_nationkey, c_custkey, acctbal_e2, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
"""


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-like: order-priority counts with an EXISTS semi-join."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    has_line = li.select("l_orderkey").distinct()
    return (
        o.join(has_line, o.o_orderkey == has_line.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


SQL_ORDER_PRIORITY = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
GROUP BY o_orderpriority
"""


REL_QUERIES = {
    "pricing_summary": q_pricing_summary,
    "top_orders": q_top_orders,
    "customer_ranks": q_customer_ranks,
    "order_priority": q_order_priority,
}

REL_SQL = {
    "pricing_summary": SQL_PRICING_SUMMARY,
    "top_orders": SQL_TOP_ORDERS,
    "customer_ranks": SQL_CUSTOMER_RANKS,
    "order_priority": SQL_ORDER_PRIORITY,
}
