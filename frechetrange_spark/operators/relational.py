"""General relational analytics over the TPC-H-ish star schema — the
engine's declarative layer demonstrated end-to-end (scan -> broadcast
dim joins -> partial aggregation), all stock Catalyst.

Money metrics are rounded to integer cents before summing: integer
addition is order-independent, so the DuckDB oracles compare exactly
under any partitioning. (The reference is purely geometric — these
queries exercise the surrounding engine, not reference parity.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped: per (returnflag, linestatus) volume summary with a
    shipdate predicate pushed to the scan."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "long"
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents("l_extendedprice")).alias("sum_base_cents"),
            F.sum(disc).alias("sum_disc_cents"),
            F.count("*").cast("long").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_cents",
            "sum_disc_cents",
            "count_order",
        )
    )


def shipping_priority(spark: SparkSession, sf_dir: str, segment: str = "BUILDING") -> DataFrame:
    """TPC-H Q3-shaped: top revenue orders for one market segment —
    broadcast dim join (customer) into the fact join (orders x lineitem)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == segment)
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    revenue = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), "l_orderkey")
        .limit(10)
        .select(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            "o_orderdate",
            "o_orderpriority",
            "revenue_cents",
        )
    )


def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: revenue by region through the full dim chain
    (region -> nation -> customer -> orders -> lineitem), dims broadcast."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.sum(revenue).alias("revenue_cents"))
        .select("r_name", "revenue_cents")
    )
