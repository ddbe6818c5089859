"""Dedup scale-up sanity: replicate documents/embeddings Nx with
CONTENT-DISJOINT copies (tokens prefixed per copy; embeddings rotated
per copy), so the true near-dup structure per shard is unchanged and
the expected output grows exactly Nx. Near-linear wall-clock growth
then proves the banded candidate generation has no hidden corpus²
shape — the property that decides whether the operator survives 100 TB.

Usage: python tools/dedup_scale_check.py [N]   (default 10)
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


def replicate(spark, n: int) -> str:
    out = tempfile.mkdtemp(prefix=f"dedup_scale{n}_")
    copies = spark.range(n).select(F.col("id").alias("_copy"))
    docs = (
        load_table(spark, SF_DIR, "documents")
        .crossJoin(copies)
        .withColumn("doc_id", F.col("doc_id") + F.col("_copy") * ID_STRIDE)
        # prefix every token with the copy index: shingle sets across
        # copies are disjoint, so near-dup pairs exist only WITHIN a copy
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                F.transform(
                    F.split("text", " "),
                    lambda x: F.concat(F.col("_copy").cast("string"), F.lit("_"), x),
                ),
            ),
        )
        .drop("_copy")
    )
    docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .crossJoin(copies)
        .withColumn("vec_id", F.col("vec_id") + F.col("_copy") * ID_STRIDE)
        # rotate dims by the copy index: sign patterns decorrelate, so
        # copies of the same vector do not collide across shards
        .withColumn(
            "embedding",
            F.when(F.col("_copy") == 0, F.col("embedding")).otherwise(
                F.concat(
                    F.expr("slice(embedding, CAST(_copy % 64 AS INT) + 1, "
                           "64 - CAST(_copy % 64 AS INT))"),
                    F.expr("slice(embedding, 1, CAST(_copy % 64 AS INT))"),
                )
            ),
        )
        .drop("_copy")
    )
    emb.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def timed(fn, spark, d) -> tuple[float, int]:
    df = fn(spark, d)
    t0 = time.perf_counter()
    n = df.count()
    return time.perf_counter() - t0, n


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="dedup_scale_check")
    spark.sparkContext.setLogLevel("ERROR")
    big = replicate(spark, n)
    checks = (
        ("minhash signatures", llm.text_minhash_signature),
        ("banded ngram near-dup", llm.dedup_ngram_jaccard),
        ("banded embedding near-dup", llm.dedup_embedding_cosine),
        ("int8 quantize", llm.embedding_quantize),
    )
    for name, fn in checks:
        t1, r1 = timed(fn, spark, SF_DIR)
        tn, rn = timed(fn, spark, big)
        print(
            f"{name}: 1x {t1:.2f}s/{r1} rows -> {n}x {tn:.2f}s/{rn} rows "
            f"(time ratio {tn / t1:.1f}, output ratio {rn / max(r1, 1):.0f})"
        )


if __name__ == "__main__":
    main()
