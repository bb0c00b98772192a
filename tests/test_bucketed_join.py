"""Bucketed co-located joins: pre-bucketing both sides on the join key
removes the shuffle from every subsequent join — the warehouse-layout
answer for repeated fact-to-fact joins at 100 TB (bucket once at write
time, join shuffle-free forever after)."""

import pytest
from pyspark.sql import functions as F

from mapreduce_model_spark.registry import table


@pytest.fixture()
def warehouse(spark, sf_dir, tmp_path):
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "orders_b"))
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "lineitem_b"))
        .saveAsTable("lineitem_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, warehouse):
    """Same-bucket-count equi-join: the physical plan must contain NO
    exchange — both sides scan pre-bucketed files co-partitioned on the
    key. (Broadcast is disabled to force the merge path the bucketing
    optimizes.)"""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).groupBy("o_orderstatus").agg(F.sum("l_quantity").alias("qty"))
        plan = spark._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        join_section = plan.split("HashAggregate")[0]
        assert "Exchange" not in join_section, join_section
        # and the result matches the plain-parquet join
        plain = (
            table(spark, sf_dir, "lineitem")
            .join(
                table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        a = {(r.o_orderstatus, round(r.qty, 6)) for r in j.collect()}
        b = {(r.o_orderstatus, round(r.qty, 6)) for r in plain.collect()}
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
