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

3. BOILERPLATE-CLUSTER corpus for ``dedup_containment_smallside``
   (round-9 VERDICT #1): M planted docs share one 25-word boilerplate
   paragraph (its grams reach df = M) on top of per-doc-unique filler
   sized so the shared overlap stays BELOW the 0.5 containment
   threshold — the pairs the hot grams generate are pure verify-side
   waste. Measures the probe join's max per-gram-key fan-out
   (#sampling docs x posting length — the rows one shuffle task must
   absorb) without vs with the ``_CONTAIN_DF_CAP`` guard, asserts the
   guarded fan-out <= cap², and asserts the FINAL pair set is
   identical both ways (the dropped candidates were all
   below-threshold noise).

Usage: python tools/dedup_skew_check.py [N]   (default 4)
       python tools/dedup_skew_check.py boiler   (experiment 3 only)
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


N_BOILER = 500  # planted cluster size (>> _CONTAIN_DF_CAP so the guard fires)


def build_boiler_cluster(spark, m: int = N_BOILER) -> str:
    """Documents corpus = the sf fixture + m planted docs sharing one
    boilerplate paragraph. 60 unique filler tokens + 25 shared tokens
    per planted doc -> shared-gram containment ~ 23/83 ~ 0.28 < 0.5,
    so every boilerplate-induced candidate pair fails exact verify."""
    out = tempfile.mkdtemp(prefix="contain_boiler_")
    docs = load_table(spark, SF_DIR, "documents")
    boiler = " ".join(f"boilerplate{j}" for j in range(25))
    filler = F.concat_ws(
        " ",
        F.array(
            *[
                F.concat(F.lit("u"), F.col("id"), F.lit(f"x{j}"))
                for j in range(60)
            ]
        ),
    )
    planted = spark.range(m).select(
        (F.col("id") + ID_STRIDE).alias("doc_id"),
        F.concat(filler, F.lit(" " + boiler)).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("planted_boiler").alias("source"),
        F.length(F.concat(filler, F.lit(" " + boiler))).alias("n_chars"),
    )
    docs.unionByName(planted).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    return out


def _probe_fanout(grams, sampled) -> int:
    """Max per-gram-key fan-out of the candidate probe join: the number
    of rows the single shuffle task owning that gram must produce."""
    dff = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    ns = sampled.groupBy("g").agg(F.count(F.lit(1)).alias("ns"))
    return (
        ns.join(dff, "g")
        .agg(F.max(F.col("ns") * F.col("df")))
        .collect()[0][0]
    )


def check_containment_boilerplate(spark) -> None:
    from pyspark.sql import Window

    d = build_boiler_cluster(spark)
    docs = load_table(spark, d, "documents")
    grams = llm._gram_frame(docs).localCheckpoint(eager=True)
    wg = Window.partitionBy("doc_id").orderBy(llm._minhash(0), "g")
    sample = lambda g: (  # noqa: E731 - bottom-s sketch, same as the key
        g.withColumn("rn", F.row_number().over(wg))
        .where(F.col("rn") <= llm._CONTAIN_SAMPLE_S)
        .select("doc_id", "g")
    )
    # unguarded (the pre-round-10 shape): sample from / probe into ALL grams
    fan_raw = _probe_fanout(grams, sample(grams))
    # guarded: both sides df-capped, as dedup_containment_smallside now does
    rare = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= llm._CONTAIN_DF_CAP)
        .select("g")
    )
    low = grams.join(rare, "g", "left_semi")
    fan_cap = _probe_fanout(low, sample(low))
    cap2 = llm._CONTAIN_DF_CAP**2
    assert fan_cap is None or fan_cap <= cap2, (fan_cap, cap2)

    t0 = time.perf_counter()
    guarded = llm.dedup_containment_smallside(spark, d).select("a", "b")
    n_guard = guarded.count()
    t_guard = time.perf_counter() - t0
    # unguarded full pipeline (inline replica of the old candidate gen,
    # same exact verify) to assert the final pair set is unchanged
    t0 = time.perf_counter()
    sampled_raw = sample(grams)
    cand = (
        sampled_raw.select(F.col("doc_id").alias("q"), "g")
        .join(grams.select(F.col("doc_id").alias("t"), "g"), "g")
        .where(F.col("q") != F.col("t"))
        .select(F.least("q", "t").alias("a"), F.greatest("q", "t").alias("b"))
        .distinct()
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_g"))
    common = (
        cand.join(grams.select(F.col("doc_id").alias("a"), "g"), "a")
        .join(grams.select(F.col("doc_id").alias("b"), "g"), ["b", "g"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    raw = (
        common.join(
            sizes.select(F.col("doc_id").alias("a"), F.col("n_g").alias("n_a")),
            "a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("b"), F.col("n_g").alias("n_b")),
            "b",
        )
        .where(
            (F.col("n_common") / F.col("n_a") >= llm._CONTAIN_MIN)
            | (F.col("n_common") / F.col("n_b") >= llm._CONTAIN_MIN)
        )
        .select("a", "b")
    )
    n_raw = raw.count()
    t_raw = time.perf_counter() - t0
    assert n_raw == n_guard and raw.exceptAll(guarded).count() == 0, (
        n_raw,
        n_guard,
    )
    print(
        f"boilerplate cluster (m={N_BOILER}): max per-gram fan-out "
        f"{fan_raw} unguarded -> {fan_cap} df-capped (bound cap²={cap2}); "
        f"identical {n_guard} pairs, wall {t_raw:.2f}s -> {t_guard:.2f}s"
    )


def timed(fn, spark, d, **kw) -> tuple[float, int]:
    df = fn(spark, d, **kw)
    t0 = time.perf_counter()
    n = df.count()
    return time.perf_counter() - t0, n


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else "4"
    spark = get_spark(app_name="dedup_skew_check")
    spark.sparkContext.setLogLevel("ERROR")
    if arg == "boiler":
        check_containment_boilerplate(spark)
        return
    n = int(arg)

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
