"""Scale-up sanity: replicate sf0.1 facts Nx (keys shifted so join
cardinalities scale linearly) and measure the heavyweight plans at 1x
vs Nx. Near-linear wall-clock growth = no quadratic shape / no
partition-count cliff hiding in the plan. Results recorded in
BASELINE.md.

Usage: python tools/scale_check.py [N]   (default 10)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_database_akkatyped_spark.catalog import load_table
from graph_database_akkatyped_spark.numerics import dsum, davg
from graph_database_akkatyped_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(spark, n: int) -> str:
    out = tempfile.mkdtemp(prefix=f"scale{n}_")
    KEY_STRIDE = 10**10
    for table, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        base = load_table(spark, SF_DIR, table)
        shifted = base.crossJoin(
            spark.range(n).select(F.col("id").alias("_copy"))
        ).withColumn(key, F.col(key) + F.col("_copy") * KEY_STRIDE).drop("_copy")
        shifted.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
    return out


def q1(spark, d):
    li = spark.read.parquet(f"{d}/lineitem.parquet")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", 2).alias("sum_qty"),
        dsum("l_extendedprice", 2).alias("sum_price"),
        davg("l_discount", 2).alias("avg_disc"),
        F.count(F.lit(1)).alias("n"),
    )


def join_agg(spark, d):
    li = spark.read.parquet(f"{d}/lineitem.parquet")
    orders = spark.read.parquet(f"{d}/orders.parquet")
    cust = load_table(spark, SF_DIR, "customer")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def window_run(spark, d):
    from pyspark.sql import Window

    orders = spark.read.parquet(f"{d}/orders.parquet")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,2)")).over(w).alias("r"),
    )


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    big = replicate(spark, n)
    for name, fn in (("q1_agg", q1), ("join3_agg", join_agg), ("window_running", window_run)):
        timed(fn(spark, SF_DIR))  # warm
        t1 = timed(fn(spark, SF_DIR))
        timed(fn(spark, big))  # warm
        tn = timed(fn(spark, big))
        print(
            f"{name}: 1x={t1:.2f}s {n}x={tn:.2f}s ratio={tn / t1:.1f} "
            f"(linear would be ≤{n})"
        )


if __name__ == "__main__":
    main()
