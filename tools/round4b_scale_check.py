"""Scale-up sanity for the round-4b additions: replicate the fixture
tables Nx with key-disjoint copies and time 1x vs Nx.

Expected shapes: merge_cdc_upsert / stream_cdc_snapshot / frame-sample
are single-shuffle or map-only -> linear; hard-negative mining is
(fixed query set) x (Nx corpus) -> linear in the corpus; HITS /
assortativity / bidirectional path run on the Nx-replicated event
graph (N disjoint copies — per-superstep joins must stay linear).

Usage: python tools/round4b_scale_check.py [N]   (default 10)
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
    centrality,
    graph_extras,
    llm,
    relational_extras,
)
from graph_database_akkatyped_spark.session import get_spark
from graph_database_akkatyped_spark.streaming import windows

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 10**9

QUERIES = {
    "merge_cdc_upsert": relational_extras.QUERIES["merge_cdc_upsert"],
    "stream_cdc_snapshot": windows.QUERIES["stream_cdc_snapshot"],
    "multimodal_frame_sample": llm.QUERIES["multimodal_frame_sample"],
    "simsearch_hard_negatives": llm.QUERIES["simsearch_hard_negatives"],
    "degree_assortativity": centrality.QUERIES["degree_assortativity"],
    "hits_hubs_authorities": centrality.QUERIES["hits_hubs_authorities"],
    "path_shortest_bidirectional": graph_extras.QUERIES[
        "path_shortest_bidirectional"
    ],
    "embedding_pca_power": llm.QUERIES["embedding_pca_power"],
    "embedding_kmeans_lloyd": llm.QUERIES["embedding_kmeans_lloyd"],
}


def replicate(spark, n: int) -> str:
    out = tempfile.mkdtemp(prefix=f"r4b_scale{n}_")
    copies = spark.range(n).select(F.col("id").alias("_copy"))

    def shift(df, cols):
        for c in cols:
            df = df.withColumn(c, F.col(c) + F.col("_copy") * ID_STRIDE)
        return df.drop("_copy")

    shift(
        load_table(spark, SF_DIR, "customer").crossJoin(copies), ["c_custkey"]
    ).write.mode("overwrite").parquet(f"{out}/customer.parquet")
    shift(
        load_table(spark, SF_DIR, "orders").crossJoin(copies),
        ["o_orderkey", "o_custkey"],
    ).write.mode("overwrite").parquet(f"{out}/orders.parquet")
    # events must ALSO shift ts: the user graph equi-joins on the
    # (event_type, hour) slot key, so identical timestamps across
    # copies would connect the copies and grow edges N², not N — the
    # first run of this tool OOM'd exactly that way. ~11 years per
    # copy keeps the hour slots disjoint.
    shift(
        load_table(spark, SF_DIR, "events")
        .crossJoin(copies)
        .withColumn("ts", F.expr("timestampadd(HOUR, _copy * 100000, ts)")),
        ["event_id", "user_id"],
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")
    shift(
        load_table(spark, SF_DIR, "documents").crossJoin(copies), ["doc_id"]
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    shift(
        load_table(spark, SF_DIR, "embeddings").crossJoin(copies), ["vec_id"]
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def run(spark, sf_dir: str) -> dict[str, tuple[float, int]]:
    res = {}
    for op, fn in QUERIES.items():
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        # drop memoized frames so ops whose FULL result is memoized
        # (hits) genuinely recompute in the timed run — the timed cost
        # then includes the shared edge-frame build, identically at 1x
        # and Nx
        clear_frame_cache()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        res[op] = (round(time.perf_counter() - t0, 2), df.count())
    return res


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="r4b_scale_check")
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
