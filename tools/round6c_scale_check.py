"""Scale-up sanity for the last four round-6 keys: replicate the
fixtures Nx with key-disjoint copies and time 1x vs Nx.

Replication recipes are round6b_scale_check's (events get a per-copy
ts shift so hour slots stay disjoint; embeddings get a per-copy vector
ROTATION so 10x data is 10x distinct vectors).

What each key should show:
- link_predict_resource_alloc: same capped wedge join as the jaccard
  twin (<= n*cap^2, linear in n); the z-degree join adds one
  broadcast-sized lookup, no new super-linear term.
- gnn_sample_fanout: output bounded by seeds*f1*(1+f2) at ANY corpus
  size — cost is the two frontier joins against the (10x bigger)
  adjacency, so near-linear in the edge build with a CONSTANT sample.
- simsearch_range: broadcast-queries linear scan — queries stay the
  fixture 5 (vec_id < 5 lives in copy 0), corpus grows 10x, so time
  should be ~linear in corpus size like simsearch_topk.
- decontam_semantic: banded bipartite train x eval equi-join — both
  splits grow 10x, rotated copies land in disjoint (band, key)
  buckets, so candidates grow ~10x, never 100x.
- text_bm25_topk: tf/df/dl explodes are linear; candidates are the
  inverted-index probe on the (fixed) query term set.
- quality_hashed_linear: token explode + 1024-row broadcast join —
  linear, no doubles anywhere.
- text_chunk_cdc: map-only higher-order array expressions — linear
  in tokens, zero shuffle.
- graph_mst_boruvka: per-round edge labeling is linear; contraction
  runs on the geometrically shrinking component graph.
- graph_greedy_coloring: backbone is <= 2*topk*n directed edges; JP
  rounds grow ~log n on the bounded-degree backbone.
- knn_graph_build / semantic_clusters: labels are SHIFTED per copy
  (label + 10*copy) so the IVF cell count grows with the corpus like
  a production quantizer (cells ~ sqrt(n)); work stays
  n * (cells + 2*cell_size). Without the shift 10x data would pack
  into the same 10 cells and the probe would look quadratic — an
  artifact of the replication, not of the operator.
- join_asof_forward: one window pass over the union — linear.
- dedup_banding_recall: the exact-truth join is SAMPLE-BOUNDED by
  design (doc_id < 150 regardless of corpus size), so near-flat.
- corpus_pipeline_funnel: composition of linear stages; the near-dup
  stage is the memoized banded pair frame.

Usage: python tools/round6c_scale_check.py [N] [key1,key2,...]
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
    curation,
    graph_extras,
    llm,
    relational,
)
from graph_database_akkatyped_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 10**9

QUERIES = {
    "link_predict_resource_alloc": graph_extras.QUERIES[
        "link_predict_resource_alloc"
    ],
    "gnn_sample_fanout": graph_extras.QUERIES["gnn_sample_fanout"],
    "simsearch_range": llm.QUERIES["simsearch_range"],
    "decontam_semantic": curation.QUERIES["decontam_semantic"],
    "text_bm25_topk": llm.QUERIES["text_bm25_topk"],
    "quality_hashed_linear": curation.QUERIES["quality_hashed_linear"],
    "text_chunk_cdc": llm.QUERIES["text_chunk_cdc"],
    "graph_mst_boruvka": graph_extras.QUERIES["graph_mst_boruvka"],
    "graph_greedy_coloring": graph_extras.QUERIES["graph_greedy_coloring"],
    "knn_graph_build": llm.QUERIES["knn_graph_build"],
    "semantic_clusters": llm.QUERIES["semantic_clusters"],
    "join_asof_forward": relational.QUERIES["join_asof_forward"],
    "dedup_banding_recall": llm.QUERIES["dedup_banding_recall"],
    "corpus_pipeline_funnel": curation.QUERIES["corpus_pipeline_funnel"],
}


def replicate(spark, n: int) -> str:
    out = tempfile.mkdtemp(prefix=f"r6c_scale{n}_")
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
    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .crossJoin(copies)
        # labels shift per copy so the IVF cell count scales with the
        # corpus (see module docstring) — cells stay key-disjoint
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
            F.slice(
                F.col("embedding"), 1, (F.col("_copy") % 64).cast("int")
            ),
        )
    )
    shift(
        emb.withColumn("embedding", rot), ["vec_id"]
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    # documents: id-shifted copies; text is left as-is (identical texts
    # only grow df/candidate counts linearly, which is the shape under
    # test — bm25 queries stay the 3 copy-0 docs, like the emb queries)
    shift(
        load_table(spark, SF_DIR, "documents").crossJoin(copies),
        ["doc_id"],
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
    if len(sys.argv) > 2:  # optional comma-separated key filter
        keep = set(sys.argv[2].split(","))
        unknown = keep - set(QUERIES)
        assert not unknown, f"unknown keys: {sorted(unknown)}"
        for k in list(QUERIES):
            if k not in keep:
                del QUERIES[k]
    spark = get_spark(app_name="round6c_scale_check")
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
