"""Bucketed co-located join: the write-time shuffle replaces the
query-time Exchange — the key claim behind `sources.parquet.write_bucketed`."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_akkatyped_spark.catalog import load_table
from graph_database_akkatyped_spark.plans.explain import formatted_plan
from graph_database_akkatyped_spark.sources.parquet import write_bucketed
from tests.conftest import SF_SMOKE


def test_bucketed_join_has_no_exchange(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    write_bucketed(orders, "orders_bucketed", "o_custkey")
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        "customer_bucketed",
        "o_custkey",
    )
    # force the shuffle-based strategy so the assertion is meaningful
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("orders_bucketed").join(
            spark.table("customer_bucketed"), "o_custkey"
        )
        plan = formatted_plan(j)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it still computes the right thing
        assert j.count() == orders.join(
            cust, orders.o_custkey == cust.c_custkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS customer_bucketed")
