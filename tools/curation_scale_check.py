"""Curation scale-up sanity: replicate documents Nx with
content-disjoint copies (tokens prefixed per copy, doc_ids strided) and
time the curation operators at 1x vs Nx. Map-only ops (pii/normalize/
repetition) must scale with scan bandwidth; the decontamination join
must stay linear because its build side is the gram set, never a doc
pair join.

Usage: python tools/curation_scale_check.py [N]   (default 10)
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
from graph_database_akkatyped_spark.operators import curation
from graph_database_akkatyped_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 10**9

OPS = (
    "decontam_ngram_overlap",
    "pii_redact",
    "text_repetition",
    "doc_length_histogram",
    "corpus_mix_weights",
    "text_normalize",
)


def replicate(spark, n: int) -> str:
    out = tempfile.mkdtemp(prefix=f"curation_scale{n}_")
    copies = spark.range(n).select(F.col("id").alias("_copy"))
    docs = (
        load_table(spark, SF_DIR, "documents")
        .crossJoin(copies)
        .withColumn("doc_id", F.col("doc_id") + F.col("_copy") * ID_STRIDE)
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                F.transform(
                    F.split("text", " "),
                    lambda x: F.concat(
                        F.col("_copy").cast("string"), F.lit("_"), x
                    ),
                ),
            ),
        )
        .drop("_copy")
    )
    docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def run(spark, sf_dir: str) -> dict[str, tuple[float, int]]:
    res = {}
    for op in OPS:
        fn = curation.QUERIES[op]
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        res[op] = (round(time.perf_counter() - t0, 2), df.count())
    return res


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="curation_scale_check")
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
