"""Duplicate-heavy / hot-band skew check for the sign-LSH embedding
dedup (the residual 100 TB risk named in round 2's verdict: on a
near-duplicate-heavy corpus, every member of a duplicate cluster shares
one (band, key) bucket in EVERY band, so the candidate equi-join piles
that cluster's k² pairs into a single task).

Two experiments, both on corpora derived from the sf fixture:

1. 90%-DUPLICATE corpus, scaled Nx content-disjoint: every 10th base
   vector becomes a "master" with 9 scaled copies (scaling preserves
   cosine == 1.0 and the exact sign bands — maximal bucket pressure).
   Cluster size stays 10 as the corpus grows Nx (the realistic shape:
   more duplicated documents, not one infinitely-duplicated document),
   so true output grows Nx and near-linear wall-clock growth proves the
   banded join stays sub-quadratic even when 90% of rows are dups.

2. HOT-CLUSTER corpus (one master with k copies = 25% of the corpus):
   unsalted vs grid-salted (dedup_embedding_cosine_salted, g=8) on
   identical data — the salted path spreads the one hot bucket over
   g*(g+1)/2 join slots. Identical pair sets are asserted, wall-clock
   printed. At local[32]/small-k the spread is modest; on a cluster
   where one bucket exceeds a shuffle partition it is the difference
   between one straggler task and g*(g+1)/2 parallel ones.

Usage: python tools/dedup_skew_check.py [N]   (default 4)
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
from graph_database_akkatyped_spark.operators import llm
from graph_database_akkatyped_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 10**9
CLUSTER = 10  # copies per master in the 90%-dup corpus


def _rotate(col_copy: str = "_shard"):
    """Rotate embedding dims by the shard index (same decorrelation
    trick as tools/dedup_scale_check.py) so clusters never collide
    ACROSS shards and output scales exactly Nx."""
    return F.when(F.col(col_copy) == 0, F.col("embedding")).otherwise(
        F.concat(
            F.expr(
                f"slice(embedding, CAST({col_copy} % 64 AS INT) + 1, "
                f"64 - CAST({col_copy} % 64 AS INT))"
            ),
            F.expr(f"slice(embedding, 1, CAST({col_copy} % 64 AS INT))"),
        )
    )


def build_dup_heavy(spark, n_shards: int) -> str:
    out = tempfile.mkdtemp(prefix=f"dedup_skew{n_shards}_")
    masters = load_table(spark, SF_DIR, "embeddings").where(
        F.col("vec_id") % 10 == 0
    )
    copies = spark.range(CLUSTER).select(F.col("id").alias("_copy"))
    shards = spark.range(n_shards).select(F.col("id").alias("_shard"))
    (
        masters.crossJoin(copies)
        .crossJoin(shards)
        .withColumn(
            "vec_id",
            F.col("vec_id")
            + F.col("_copy") * ID_STRIDE
            + F.col("_shard") * ID_STRIDE * CLUSTER * 10,
        )
        # scale copy c by (1 + c/1000): direction (and thus every sign
        # band and every pairwise cosine) is EXACTLY preserved
        .withColumn(
            "embedding",
            F.transform(
                _rotate(),
                lambda x: (
                    x.cast("double")
                    * (1.0 + F.col("_copy").cast("double") / 1000.0)
                ).cast("float"),
            ),
        )
        .drop("_copy", "_shard")
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )
    return out


def build_hot_cluster(spark, k: int) -> str:
    out = tempfile.mkdtemp(prefix="dedup_hot_")
    emb = load_table(spark, SF_DIR, "embeddings")
    hot = (
        emb.where(F.col("vec_id") == 0)
        .crossJoin(spark.range(k).select(F.col("id").alias("_copy")))
        .withColumn("vec_id", F.col("vec_id") + F.col("_copy") * ID_STRIDE)
        .withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x: (
                    x.cast("double")
                    * (1.0 + F.col("_copy").cast("double") / 1000.0)
                ).cast("float"),
            ),
        )
        .drop("_copy")
    )
    rest = emb.where(F.col("vec_id") % 4 != 0).select("vec_id", "embedding")
    hot.select("vec_id", "embedding").unionByName(rest).write.mode(
        "overwrite"
    ).parquet(f"{out}/embeddings.parquet")
    return out


def timed(fn, spark, d, **kw) -> tuple[float, int]:
    df = fn(spark, d, **kw)
    t0 = time.perf_counter()
    n = df.count()
    return time.perf_counter() - t0, n


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="dedup_skew_check")
    spark.sparkContext.setLogLevel("ERROR")

    one = build_dup_heavy(spark, 1)
    big = build_dup_heavy(spark, n)
    t1, r1 = timed(llm.dedup_embedding_cosine, spark, one)
    tn, rn = timed(llm.dedup_embedding_cosine, spark, big)
    print(
        f"90%-dup corpus: 1x {t1:.2f}s/{r1} pairs -> {n}x {tn:.2f}s/{rn} "
        f"pairs (time ratio {tn / t1:.1f}, output ratio {rn / max(r1, 1):.1f}; "
        f"linear = {n})"
    )

    hot = build_hot_cluster(spark, 500)
    tu, ru = timed(llm.dedup_embedding_cosine, spark, hot)
    ts, rs = timed(llm.dedup_embedding_cosine_salted, spark, hot, n_salt=8)
    assert ru == rs, f"salted pair set diverged: {ru} vs {rs}"
    print(
        f"hot-cluster corpus (k=500): unsalted {tu:.2f}s, grid-salted(g=8) "
        f"{ts:.2f}s, identical {ru} pairs"
    )


if __name__ == "__main__":
    main()
