"""Scale-up sanity for the round-5 additions: replicate the fixtures Nx
with key-disjoint copies (events ts-shifted so hour slots stay
disjoint — see round4b_scale_check's OOM note) and time 1x vs Nx.

Expected shapes: build_user_graph_capped is slot-agg + window rank +
bounded pair join -> linear in events; stream_sink_idempotent is a
4-micro-batch foreachBatch run whose per-trigger cost is O(batch) ->
linear; motif_find_cosupplied (combinatorial plan) is one hash agg
over sourced edges -> linear in lineitem.

Usage: python tools/round5_scale_check.py [N]   (default 10)
Results recorded in BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_database_akkatyped_spark.caching import clear_frame_cache
from graph_database_akkatyped_spark.catalog import load_table
from graph_database_akkatyped_spark.operators import graph_build, llm, motif
from graph_database_akkatyped_spark.session import get_spark
from graph_database_akkatyped_spark.streaming import sinks

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 10**9

QUERIES = {
    "build_user_graph_capped": graph_build.QUERIES["build_user_graph_capped"],
    "motif_find_cosupplied": motif.QUERIES["motif_find_cosupplied"],
    "stream_sink_idempotent": sinks.QUERIES["stream_sink_idempotent"],
    # documents are replicated with IDENTICAL text: every chunk's dup
    # group grows to N copies — the boilerplate regime. Output must stay
    # linear (one winner per group), so time should scale ~N, not N^2.
    "dedup_paragraph": llm.QUERIES["dedup_paragraph"],
}


def replicate(spark, n: int) -> str:
    out = tempfile.mkdtemp(prefix=f"r5_scale{n}_")
    copies = spark.range(n).select(F.col("id").alias("_copy"))

    def shift(df, cols):
        for c in cols:
            df = df.withColumn(c, F.col(c) + F.col("_copy") * ID_STRIDE)
        return df.drop("_copy")

    shift(
        load_table(spark, SF_DIR, "events")
        .crossJoin(copies)
        .withColumn("ts", F.expr("timestampadd(HOUR, _copy * 100000, ts)")),
        ["event_id", "user_id"],
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")
    shift(
        load_table(spark, SF_DIR, "customer").crossJoin(copies), ["c_custkey"]
    ).write.mode("overwrite").parquet(f"{out}/customer.parquet")
    shift(
        load_table(spark, SF_DIR, "orders").crossJoin(copies),
        ["o_orderkey", "o_custkey"],
    ).write.mode("overwrite").parquet(f"{out}/orders.parquet")
    shift(
        load_table(spark, SF_DIR, "lineitem").crossJoin(copies),
        ["l_orderkey", "l_suppkey", "l_partkey"],
    ).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    shift(
        load_table(spark, SF_DIR, "documents").crossJoin(copies), ["doc_id"]
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def run(spark, sf_dir: str) -> dict[str, tuple[float, int]]:
    res = {}
    for op, fn in QUERIES.items():
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        clear_frame_cache()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        res[op] = (round(time.perf_counter() - t0, 2), df.count())
    return res


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="r5_scale_check")
    spark.sparkContext.setLogLevel("ERROR")
    base = run(spark, SF_DIR)
    big_dir = replicate(spark, n)
    big = run(spark, big_dir)
    print(f"op | 1x sec | {n}x sec | ratio | 1x rows | {n}x rows")
    for op in QUERIES:
        t1, r1 = base[op]
        tn, rn = big[op]
        ratio = round(tn / t1, 1) if t1 > 0 else float("nan")
        print(f"{op} | {t1} | {tn} | {ratio} | {r1} | {rn}")


if __name__ == "__main__":
    main()
