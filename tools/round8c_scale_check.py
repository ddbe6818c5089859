"""Scale-up sanity for the round-8 session-3 keys: replicate the
fixtures Nx with key-disjoint copies and time 1x vs Nx.

Replication recipe (round-8 machinery):
- documents: per-copy alphabet rotation (copy-disjoint vocab with
  identical token-length structure) — grows RAKE's phrase space,
  DSIR's bucket occupancy and the scene-cut luma tracks honestly.
- part: p_partkey stride PLUS a per-copy +200·copy dollar price shift
  so the skyline's price-bucket axis grows 10x (identical replicated
  prices would only deepen ties, not the frontier).
- lineitem: (l_orderkey, l_partkey) stride -> copy-disjoint baskets;
  the recommender's pair join stays linear in orders.
- orders/customer: key stride (c_nationkey left alone so the nation
  dim join is unchanged); events: key stride + ~11 y ts shift per copy
  so Holt's daily axis grows 10x (longer history, not overlays).

What each key should show at Nx:
- skyline_pareto: linear bucket prefilter; candidates stay
  frontier-sized (per-bucket max filter), anti-join input ~10x.
- anonymize_k_anonymity: class tables grow ~10x, record join linear.
  Replicated balances 10x class sizes -> FEWER suppressions (honest
  artifact of replication, noted in BASELINE.md).
- text_readability / multimodal_video_scenecut: map-only, linear.
- text_keyword_rake / corpus_dsir_weights: explode + per-doc windows
  and a broadcastable feature table; linear.
- timeseries_holt: daily pre-agg linear; the sequential recursion is
  per-series over 10x more days (series count fixed at |types|).
- recommend_item_cosine: pair join linear in orders; degree table 10x.
- sink_bucketed_join: first call pays the bucketed write; the timed
  run measures the shuffle-free co-located join itself.

Usage: python tools/round8c_scale_check.py [N] [key1,key2,...]
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
    behavior,
    curation,
    llm,
    relational_extras,
)
from graph_database_akkatyped_spark.session import get_spark
from graph_database_akkatyped_spark.sources import parquet as sources_parquet

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 10**9

QUERIES = {
    "skyline_pareto": relational_extras.QUERIES["skyline_pareto"],
    "recommend_item_cosine": relational_extras.QUERIES[
        "recommend_item_cosine"
    ],
    "anonymize_k_anonymity": curation.QUERIES["anonymize_k_anonymity"],
    "text_readability": llm.QUERIES["text_readability"],
    "text_keyword_rake": llm.QUERIES["text_keyword_rake"],
    "corpus_dsir_weights": llm.QUERIES["corpus_dsir_weights"],
    "multimodal_video_scenecut": llm.QUERIES["multimodal_video_scenecut"],
    "timeseries_holt": behavior.QUERIES["timeseries_holt"],
    "sink_bucketed_join": sources_parquet.QUERIES["sink_bucketed_join"],
    "join_spatial_grid": relational_extras.QUERIES["join_spatial_grid"],
    "data_quality_fk_audit": relational_extras.QUERIES[
        "data_quality_fk_audit"
    ],
    "embedding_norm_audit": llm.QUERIES["embedding_norm_audit"],
    "skyline_grouped": relational_extras.QUERIES["skyline_grouped"],
    "orders_backlog_aging": relational_extras.QUERIES[
        "orders_backlog_aging"
    ],
    "timeseries_holt_backtest": behavior.QUERIES[
        "timeseries_holt_backtest"
    ],
    "text_bpe_fertility": llm.QUERIES["text_bpe_fertility"],
}

_AZ = "abcdefghijklmnopqrstuvwxyz"


def replicate(spark, n: int) -> str:
    out = tempfile.mkdtemp(prefix=f"r8c_scale{n}_")
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
    rotated = F.col("text")
    for k in range(1, n):
        rotated = F.when(
            F.col("_copy") == k,
            F.translate("text", _AZ, _AZ[k % 26:] + _AZ[: k % 26]),
        ).otherwise(rotated)
    shift(
        load_table(spark, SF_DIR, "documents")
        .crossJoin(copies)
        .withColumn("text", rotated),
        ["doc_id"],
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    shift(
        load_table(spark, SF_DIR, "part")
        .crossJoin(copies)
        .withColumn(
            "p_retailprice",
            F.col("p_retailprice") + F.col("_copy") * F.lit(200.0),
        ),
        ["p_partkey"],
    ).write.mode("overwrite").parquet(f"{out}/part.parquet")
    shift(
        load_table(spark, SF_DIR, "lineitem").crossJoin(copies),
        ["l_orderkey", "l_partkey", "l_suppkey"],
    ).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    shift(
        load_table(spark, SF_DIR, "orders").crossJoin(copies),
        ["o_orderkey", "o_custkey"],
    ).write.mode("overwrite").parquet(f"{out}/orders.parquet")
    shift(
        load_table(spark, SF_DIR, "customer").crossJoin(copies),
        ["c_custkey"],
    ).write.mode("overwrite").parquet(f"{out}/customer.parquet")
    load_table(spark, SF_DIR, "nation").write.mode("overwrite").parquet(
        f"{out}/nation.parquet"
    )
    shift(
        load_table(spark, SF_DIR, "supplier").crossJoin(copies),
        ["s_suppkey"],
    ).write.mode("overwrite").parquet(f"{out}/supplier.parquet")
    load_table(spark, SF_DIR, "region").write.mode("overwrite").parquet(
        f"{out}/region.parquet"
    )
    # embeddings: vec_id stride + a +2.0*copy coordinate shift on the
    # first two dims — copy-disjoint grid cells, so the spatial join
    # stays linear in copies instead of coupling them pairwise
    shift(
        load_table(spark, SF_DIR, "embeddings")
        .crossJoin(copies)
        .withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (v, i) -> CAST(CASE WHEN i < 2 "
                "THEN v + 2.0 * _copy ELSE v END AS FLOAT))"
            ),
        ),
        ["vec_id"],
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def run(spark, sf_dir: str) -> dict[str, tuple[float, int]]:
    res = {}
    for op, fn in QUERIES.items():
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
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
    spark = get_spark(app_name="round8c_scale_check")
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
