"""Scale-up sanity for the round-6 additions: replicate the fixtures Nx
with key-disjoint copies and time 1x vs Nx.

Replication recipes per table:
- events: ts-shifted per copy so hour slots stay disjoint (the
  round-4b OOM lesson: identical slots couple copies N²) — feeds
  community_louvain_l1 (graph 10x, sweeps linear) and
  stream_graph_degree (micro-batches 10x, anti-join merge linear).
- embeddings: each copy ROTATES the vector by `copy` dims (an
  isometry: within-copy geometry identical, cross-copy cosine is the
  near-zero autocorrelation of random vectors at a lag) — so 10x data
  means 10x DISTINCT vectors, the honest corpus-growth regime, not 10
  exact clones (which would measure the duplicate-heavy N² pair
  regime covered by tools/dedup_skew_check.py instead). Feeds
  simsearch_ivf_filtered (cells grow 10x, probe cost linear) and
  dedup_semantic (kmeans scans linear; banded candidates grow with
  bucket occupancy — fixed 8x256 band keys fill up as the corpus
  grows, the standard cue to widen band bits at real scale).
- documents: plain id-shift — multimodal_decode is map-only, linear
  by construction.

Usage: python tools/round6_scale_check.py [N]   (default 10)
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
from graph_database_akkatyped_spark.operators import centrality, llm
from graph_database_akkatyped_spark.session import get_spark
from graph_database_akkatyped_spark.streaming import sinks

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 10**9

QUERIES = {
    "simsearch_ivf_filtered": llm.QUERIES["simsearch_ivf_filtered"],
    "dedup_semantic": llm.QUERIES["dedup_semantic"],
    "community_louvain_l1": centrality.QUERIES["community_louvain_l1"],
    "stream_graph_degree": sinks.QUERIES["stream_graph_degree"],
    "multimodal_decode": llm.QUERIES["multimodal_decode"],
}


def replicate(spark, n: int) -> str:
    out = tempfile.mkdtemp(prefix=f"r6_scale{n}_")
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
    spark = get_spark(app_name="r6_scale_check")
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
