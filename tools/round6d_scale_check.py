"""Scale-up sanity for the round-6 third-session keys: replicate the
fixtures Nx with key-disjoint copies and time 1x vs Nx.

Replication recipes are round6c_scale_check's (events get a per-copy
ts shift so hour slots stay disjoint; embeddings rotate per copy;
documents are id-shifted with text left as-is).

What each key should show:
- events_markov_transitions / timeseries_ohlc: one lag-window or
  two-tier groupBy over the journal — linear in events.
- events_burst_zscore / timeseries_ewma: linear hourly pre-aggregate,
  then a window over the tiny |types| x |hours| hourly frame (hours
  grow 10x with the ts shift — still the cheap tier).
- graph_node2vec_walks: fixed seed set, per-step frontier join against
  the (10x) adjacency — cost tracks the edge build, output constant.
- graph_mis_luby: ts-shifted copies are disjoint subgraphs; per-round
  joins are linear in active edges and the active set shrinks
  geometrically — rounds stay O(log n).
- dedup_containment: banded candidates + exact intersection on
  candidates only. NOTE the identical-text replication artifact (the
  same one corpus_pipeline_funnel documents): every doc gains N-1
  EXACT twins, so candidate pairs grow ~N^2/2 per dup group by
  construction of the replica, not by a plan term — the honest check
  is pairs-vs-candidates proportionality, recorded below.
- text_collocation_lift: counts scale uniformly (identical copies), so
  lift is unchanged and the passes are linear explode + groupBy.
- stream_stream_left_join: watermarked state; one micro-batch per
  file — linear in events with bounded state.

Usage: python tools/round6d_scale_check.py [N] [key1,key2,...]
(default 10, all keys). Results recorded in BASELINE.md.
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
    behavior,
    graph_extras,
    llm,
    relational_extras,
    sampling,
)
from graph_database_akkatyped_spark.session import get_spark
from graph_database_akkatyped_spark.streaming import sinks, windows

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 10**9

QUERIES = {
    "events_markov_transitions": behavior.QUERIES["events_markov_transitions"],
    "timeseries_ohlc": behavior.QUERIES["timeseries_ohlc"],
    "events_burst_zscore": behavior.QUERIES["events_burst_zscore"],
    "timeseries_ewma": behavior.QUERIES["timeseries_ewma"],
    "graph_node2vec_walks": graph_extras.QUERIES["graph_node2vec_walks"],
    "graph_mis_luby": graph_extras.QUERIES["graph_mis_luby"],
    "dedup_containment": llm.QUERIES["dedup_containment"],
    "text_collocation_lift": llm.QUERIES["text_collocation_lift"],
    "stream_stream_left_join": windows.QUERIES["stream_stream_left_join"],
    # second batch (same session): retrieval/curation/packing/multimodal
    "simsearch_mmr": llm.QUERIES["simsearch_mmr"],
    "quality_bigram_logprob": sampling.QUERIES["quality_bigram_logprob"],
    "pack_lpt_shards": llm.QUERIES["pack_lpt_shards"],
    "dedup_semantic_recall": llm.QUERIES["dedup_semantic_recall"],
    "multimodal_phash_dedup": llm.QUERIES["multimodal_phash_dedup"],
    "stream_graph_pagerank": sinks.QUERIES["stream_graph_pagerank"],
    "dedup_containment_smallside": llm.QUERIES["dedup_containment_smallside"],
    "embedding_matryoshka_recall": llm.QUERIES["embedding_matryoshka_recall"],
    "basket_association_rules": relational_extras.QUERIES[
        "basket_association_rules"
    ],
    "simsearch_binary_hamming": llm.QUERIES["simsearch_binary_hamming"],
    "agg_weighted_median": relational_extras.QUERIES["agg_weighted_median"],
    "timeseries_seasonal_profile": behavior.QUERIES[
        "timeseries_seasonal_profile"
    ],
}


def replicate(spark, n: int) -> str:
    out = tempfile.mkdtemp(prefix=f"r6d_scale{n}_")
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
        load_table(spark, SF_DIR, "documents").crossJoin(copies),
        ["doc_id"],
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    shift(
        load_table(spark, SF_DIR, "lineitem").crossJoin(copies),
        ["l_orderkey", "l_partkey"],
    ).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    # embeddings: per-copy vector rotation + label shift (round6c recipe)
    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .crossJoin(copies)
        .withColumn("label", F.col("label") + (F.col("_copy") * 10).cast("int"))
    )
    rot = F.when(
        F.col("_copy") == 0, F.col("embedding")
    ).otherwise(
        F.concat(
            F.slice(
                F.col("embedding"),
                (F.col("_copy") % 64 + 1).cast("int"),
                (F.lit(64) - F.col("_copy") % 64).cast("int"),
            ),
            F.slice(F.col("embedding"), 1, (F.col("_copy") % 64).cast("int")),
        )
    )
    shift(
        emb.withColumn("embedding", rot), ["vec_id"]
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
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
    if len(sys.argv) > 2:
        keep = set(sys.argv[2].split(","))
        unknown = keep - set(QUERIES)
        assert not unknown, f"unknown keys: {sorted(unknown)}"
        for k in list(QUERIES):
            if k not in keep:
                del QUERIES[k]
    spark = get_spark(app_name="round6d_scale_check")
    spark.sparkContext.setLogLevel("ERROR")
    base = run(spark, SF_DIR)
    big_dir = replicate(spark, n)
    big = run(spark, big_dir)
    print(f"\n== {n}x scale check (1x = {SF_DIR}) ==")
    print(f"{'op':<30} {'1x sec':>8} {f'{n}x sec':>8} {'ratio':>6} "
          f"{'1x rows':>10} {f'{n}x rows':>10}")
    for op in QUERIES:
        t1, r1 = base[op]
        tn, rn = big[op]
        ratio = tn / t1 if t1 > 0 else float("inf")
        print(f"{op:<30} {t1:>8.2f} {tn:>8.2f} {ratio:>6.1f} "
              f"{r1:>10,} {rn:>10,}")


if __name__ == "__main__":
    main()
