"""Sampling/layout scale-up sanity: replicate the fixture tables Nx
with key-disjoint copies and time the round-4 operator families at 1x
vs Nx. The map-only samplers must scale with scan bandwidth; the
unigram scorer and layout/profile aggregates must stay linear (their
joins are broadcast or equi-key, never pairwise).

Usage: python tools/pipeline_scale_check.py [N]   (default 10)
Results recorded in BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_database_akkatyped_spark.catalog import load_table
from graph_database_akkatyped_spark.operators import layout, relational_extras, sampling
from graph_database_akkatyped_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 10**9

QUERIES = {
    **sampling.QUERIES,
    **{k: layout.QUERIES[k] for k in
       ("zorder_layout", "incremental_agg_merge", "skew_profile")},
    "join_interval_bucketed": relational_extras.QUERIES[
        "join_interval_bucketed"
    ],
}

OPS = tuple(QUERIES)


def replicate(spark, n: int) -> str:
    out = tempfile.mkdtemp(prefix=f"pipeline_scale{n}_")
    copies = spark.range(n).select(F.col("id").alias("_copy"))
    docs = (
        load_table(spark, SF_DIR, "documents")
        .crossJoin(copies)
        .withColumn("doc_id", F.col("doc_id") + F.col("_copy") * ID_STRIDE)
        .drop("_copy")
    )
    docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .crossJoin(copies)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("_copy") * ID_STRIDE)
        .withColumn("l_partkey", F.col("l_partkey") + F.col("_copy") * ID_STRIDE)
        .withColumn("l_suppkey", F.col("l_suppkey") + F.col("_copy") * ID_STRIDE)
        .drop("_copy")
    )
    li.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    orders = (
        load_table(spark, SF_DIR, "orders")
        .crossJoin(copies)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("_copy") * ID_STRIDE)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("_copy") * ID_STRIDE)
        .drop("_copy")
    )
    orders.write.mode("overwrite").parquet(f"{out}/orders.parquet")
    return out


def run(spark, sf_dir: str) -> dict[str, tuple[float, int]]:
    res = {}
    for op in OPS:
        fn = QUERIES[op]
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        res[op] = (round(time.perf_counter() - t0, 2), df.count())
    return res


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="pipeline_scale_check")
    spark.sparkContext.setLogLevel("ERROR")
    base = run(spark, SF_DIR)
    big_dir = replicate(spark, n)
    big = run(spark, big_dir)
    print(f"op | 1x sec | {n}x sec | ratio | 1x rows | {n}x rows")
    for op in OPS:
        t1, r1 = base[op]
        tn, rn = big[op]
        ratio = round(tn / t1, 1) if t1 > 0 else float("nan")
        print(f"{op} | {t1} | {tn} | {ratio} | {r1} | {rn}")


if __name__ == "__main__":
    main()
