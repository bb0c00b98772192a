"""Approximate operators carry no oracle — their contract is bounded error
vs the exact answer, asserted here."""

from pyspark.sql import functions as F

from mapreduce_model_spark.registry import QUERIES, table


def test_approx_distinct_error_bounds(spark, sf_dir):
    """HLL++ at rsd=0.01 must land within 5% of exact counts; the KLL
    median within the central half of the distribution."""
    row = QUERIES["approx_distinct"](spark, sf_dir).collect()[0]
    li = table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("orders"),
        F.countDistinct("l_partkey").alias("parts"),
        F.expr("percentile(l_extendedprice, 0.5D)").alias("median"),
        F.expr("percentile(l_extendedprice, 0.25D)").alias("q1"),
        F.expr("percentile(l_extendedprice, 0.75D)").alias("q3"),
    ).collect()[0]
    assert abs(row.approx_orders - exact.orders) / exact.orders <= 0.05
    assert abs(row.approx_parts - exact.parts) / exact.parts <= 0.05
    assert exact.q1 <= row.median_price <= exact.q3
