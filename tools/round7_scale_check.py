"""Scale-up sanity for the round-7 keys: replicate the fixtures Nx
with key-disjoint copies and time 1x vs Nx.

Replication recipe: events/documents/vec ids get per-copy ID strides
(round6b machinery), embeddings get a per-copy vector ROTATION, but —
unlike round6c — labels are NOT shifted: the IVF/PQ keys under test
model a FIXED coarse quantizer / codebook (FAISS never grows K with
the corpus; cell FILL grows instead), so the honest 10x shape keeps
K = 10 cells and 8x8 codebooks constant while every cell gets 10x
fuller. (knn_graph_build/semantic_clusters, which model a quantizer
REBUILT per corpus, are covered with shifted labels in round6c.)

What each key should show:
- dedup_lines: explode + line-hash window + doc_id regroup — linear;
  replicated texts are identical so dup-line multiplicities grow 10x
  (copy 0 keeps, 9 copies drop) — group sizes, not group count².
- simsearch_ivf_rebalance: two broadcast argmax passes + two integer
  means — linear in corpus; with unshifted labels the appended split
  (label >= 8) stays the fixture's ~20%.
- simsearch_recall_rebalance: adds the 5-query broadcast truth scan —
  linear (queries stay the copy-0 five).
- simsearch_ivfadc: PQ distance frame is n x K x M with K, M fixed →
  linear; probe candidates = 2 cells x (10x fill) → linear.
- simsearch_recall_ivfadc: ivfadc + the broadcast exact-truth scan.

Usage: python tools/round7_scale_check.py [N] [key1,key2,...]
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
from graph_database_akkatyped_spark.operators import llm
from graph_database_akkatyped_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 10**9

def _behavior_queries():
    from graph_database_akkatyped_spark.operators import behavior

    return behavior.QUERIES


QUERIES = {
    "dedup_lines": llm.QUERIES["dedup_lines"],
    "simsearch_ivf_rebalance": llm.QUERIES["simsearch_ivf_rebalance"],
    "simsearch_recall_rebalance": llm.QUERIES["simsearch_recall_rebalance"],
    "simsearch_ivfadc": llm.QUERIES["simsearch_ivfadc"],
    "simsearch_recall_ivfadc": llm.QUERIES["simsearch_recall_ivfadc"],
    # cusum: hourly aggregate (linear map-side) + two cumulative
    # windows over |types| x |hours| rows — with the per-copy ts shift
    # the hour axis grows 10x and types stay 5, so the window input
    # grows 10x and the whole key is linear
    "timeseries_changepoint_cusum": _behavior_queries()[
        "timeseries_changepoint_cusum"
    ],
}


def replicate(spark, n: int) -> str:
    out = tempfile.mkdtemp(prefix=f"r7_scale{n}_")
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
    if len(sys.argv) > 2:
        keep = set(sys.argv[2].split(","))
        unknown = keep - set(QUERIES)
        assert not unknown, f"unknown keys: {sorted(unknown)}"
        for k in list(QUERIES):
            if k not in keep:
                del QUERIES[k]
    spark = get_spark(app_name="round7_scale_check")
    spark.sparkContext.setLogLevel("ERROR")
    base = run(spark, SF_DIR)
    big_dir = replicate(spark, n)
    big = run(spark, big_dir)
    print(f"\n== {n}x scale check (1x = {SF_DIR}) ==")
    print(f"{'op':<28} {'1x sec':>8} {f'{n}x sec':>8} {'ratio':>6} "
          f"{'1x rows':>10} {f'{n}x rows':>10}")
    for op in QUERIES:
        t1, r1 = base[op]
        tn, rn = big[op]
        ratio = tn / t1 if t1 > 0 else float("inf")
        print(f"{op:<28} {t1:>8.2f} {tn:>8.2f} {ratio:>6.1f} "
              f"{r1:>10,} {rn:>10,}")


if __name__ == "__main__":
    main()
