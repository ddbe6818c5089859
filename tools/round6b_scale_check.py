"""Scale-up sanity for the late round-6 additions: replicate the
fixtures Nx with key-disjoint copies and time 1x vs Nx.

Same replication recipes as tools/round6_scale_check.py (events get a
per-copy ts shift so hour slots stay disjoint; embeddings get a
per-copy vector ROTATION so 10x data is 10x distinct vectors), plus
customer/orders id-shifts for the SCD2 history build (each copy's
dimension keys are disjoint, so the per-key window pass simply sees
10x groups).

What each key should show:
- community_louvain_multi: level-1 sweeps linear in the 10x edge set;
  the contraction + level-2 sweeps run on #communities vertices and
  must NOT add a super-linear term.
- simsearch_ivf_append: O(batch x cells) broadcast assignment — batch
  grows 10x, cells fixed, so ~linear.
- cc_incremental: base CC Pregel is the linear bulk; the contracted
  merge must stay negligible at any N.
- link_predict_jaccard: capped-graph wedge join, <= n*cap^2 — linear
  in n with disjoint slots.
- merge_scd2: one shuffle + window pass, linear in |customer|+|orders|.
- timeseries_interpolate: grid is O(span*types); the ts shift grows
  the span 10x -> grid 10x, everything linear.
- sketch_countmin_heavy: sketch build linear in events; d*w cells
  fixed (the exact-count scorecard join is also linear).
- simsearch_ivf_partitioned: partitioned index WRITE is the linear
  bulk; the probe reads only the probed cells at any corpus size.
- stream_scd2: per-batch work is O(touched keys' history); 10x
  disjoint customers -> 10x batch size, linear.

Usage: python tools/round6b_scale_check.py [N]   (default 10)
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
from graph_database_akkatyped_spark.operators import (
    algos,
    centrality,
    graph_extras,
    llm,
    relational_extras,
)
from graph_database_akkatyped_spark.session import get_spark
from graph_database_akkatyped_spark.streaming import sinks, windows

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 10**9

QUERIES = {
    "community_louvain_multi": centrality.QUERIES["community_louvain_multi"],
    "simsearch_ivf_append": llm.QUERIES["simsearch_ivf_append"],
    "cc_incremental": algos.QUERIES["cc_incremental"],
    "link_predict_jaccard": graph_extras.QUERIES["link_predict_jaccard"],
    "merge_scd2": relational_extras.QUERIES["merge_scd2"],
    "timeseries_interpolate": windows.QUERIES["timeseries_interpolate"],
    "sketch_countmin_heavy": relational_extras.QUERIES[
        "sketch_countmin_heavy"
    ],
    "simsearch_ivf_partitioned": llm.QUERIES["simsearch_ivf_partitioned"],
    "stream_scd2": sinks.QUERIES["stream_scd2"],
}


def replicate(spark, n: int) -> str:
    out = tempfile.mkdtemp(prefix=f"r6b_scale{n}_")
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
    emb = load_table(spark, SF_DIR, "embeddings").crossJoin(copies)
    rot = F.when(
        F.col("_copy") == 0, F.col("embedding")
    ).otherwise(
        F.concat(
            F.slice(
                F.col("embedding"),
                (F.col("_copy") % 64 + 1).cast("int"),
                (F.lit(64) - F.col("_copy") % 64).cast("int"),
            ),
            F.slice(
                F.col("embedding"), 1, (F.col("_copy") % 64).cast("int")
            ),
        )
    )
    shift(
        emb.withColumn("embedding", rot), ["vec_id"]
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    shift(
        load_table(spark, SF_DIR, "customer").crossJoin(copies),
        ["c_custkey"],
    ).write.mode("overwrite").parquet(f"{out}/customer.parquet")
    shift(
        load_table(spark, SF_DIR, "orders").crossJoin(copies),
        ["o_orderkey", "o_custkey"],
    ).write.mode("overwrite").parquet(f"{out}/orders.parquet")
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
    spark = get_spark(app_name="r6b_scale_check")
    spark.sparkContext.setLogLevel("ERROR")
    base = run(spark, SF_DIR)
    big_dir = replicate(spark, n)
    clear_frame_cache()
    big = run(spark, big_dir)
    print(f"op | 1x sec | {n}x sec | ratio | 1x rows | {n}x rows")
    for op in QUERIES:
        t1, r1 = base[op]
        tn, rn = big[op]
        ratio = round(tn / t1, 1) if t1 > 0 else float("nan")
        print(f"{op} | {t1} | {tn} | {ratio} | {r1} | {rn}")


if __name__ == "__main__":
    main()
