"""Scale-up sanity for the round-8 keys: replicate the fixtures Nx
with key-disjoint copies and time 1x vs Nx.

Replication recipe (round-7 machinery plus two twists):
- orders join the replicated set — ``timeseries_autocorr`` reads them;
  o_orderdate shifts ~11 y per copy so the DAILY axis grows 10x (an
  honest longer-history series, not 10 overlaid copies).
- documents get a per-copy ALPHABET ROTATION (translate a..z ->
  rotated a..z) for the BPE key: identical replicated text would leave
  the word-frequency dictionary unchanged and the key's cost constant —
  the rotation grows the vocab 10x while preserving word structure.

What each key should show:
- timeseries_autocorr: one groupBy day (linear) + 7-way self-join of
  the tiny daily frame (10x rows -> 10x pairs) + one global reduce.
- timeseries_anomaly_mad: hourly aggregate (linear) + two exact
  medians over per-type groups that grow 10x in hours.
- text_bpe_merge: explode + vocab groupBy (linear in corpus); all
  later stages are vocab-keyed (10x vocab -> 10x window/join input).
- multimodal_audio_energy: map-only synth+decode; doc subset is
  doc_id % 5 and the copy stride is a multiple of 5, so the subset
  fraction is invariant.
- corpus_curriculum_order: the DOCUMENTED single-sort hotspot — exact
  global ntile serializes into one partition; the 10x row measures
  that cost honestly (the production variant swaps in approx-quantile
  range boundaries; see the key's docstring).
- stream_backfill_merge: the tail replay grows ~10x (shifted copies
  land after the cutoff); per-batch partials stay O(batch). The timed
  run includes the events split-layout rewrite since clear_frame_cache
  now evicts layout dirs too (round-8 hygiene change).

Usage: python tools/round8_scale_check.py [N] [key1,key2,...]
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
    graph_extras,
    llm,
    relational_extras,
    sampling,
)
from graph_database_akkatyped_spark.session import get_spark
from graph_database_akkatyped_spark.streaming import sinks

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 10**9  # multiple of 5: keeps doc_id % 5 subsets invariant

QUERIES = {
    "timeseries_autocorr": behavior.QUERIES["timeseries_autocorr"],
    "timeseries_anomaly_mad": behavior.QUERIES["timeseries_anomaly_mad"],
    "text_bpe_merge": llm.QUERIES["text_bpe_merge"],
    "text_bpe_encode": llm.QUERIES["text_bpe_encode"],
    "multimodal_audio_energy": llm.QUERIES["multimodal_audio_energy"],
    "corpus_curriculum_order": sampling.QUERIES["corpus_curriculum_order"],
    "stream_backfill_merge": sinks.QUERIES["stream_backfill_merge"],
    "entity_resolve_blocked": relational_extras.QUERIES[
        "entity_resolve_blocked"
    ],
    "join_bloom_prefilter": relational_extras.QUERIES[
        "join_bloom_prefilter"
    ],
    "stream_entity_resolve": sinks.QUERIES["stream_entity_resolve"],
    "graph_temporal_reachability": graph_extras.QUERIES[
        "graph_temporal_reachability"
    ],
}

_AZ = "abcdefghijklmnopqrstuvwxyz"


def replicate(spark, n: int) -> str:
    out = tempfile.mkdtemp(prefix=f"r8_scale{n}_")
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
        load_table(spark, SF_DIR, "orders")
        .crossJoin(copies)
        .withColumn(
            "o_orderdate",
            F.expr("timestampadd(HOUR, _copy * 100000, o_orderdate)"),
        ),
        ["o_orderkey", "o_custkey"],
    ).write.mode("overwrite").parquet(f"{out}/orders.parquet")
    # per-copy alphabet rotation: copy k maps a..z -> rotate-by-k —
    # content-disjoint words, identical word-length structure
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
    # customers: per-copy DIGIT rotation on c_name (copy k maps
    # 0..9 -> rotate-by-k) — copy-disjoint names with identical edit
    # distances and blocking structure; identical replicated names
    # would couple copies N^2 through the variant join. The custkey
    # stride is a multiple of 5, so the %5 dirty-batch fraction is
    # invariant (%3 / %6 planted edits land on different members per
    # copy, which only reshuffles WHICH ~third of the batch is dirty).
    digits = "0123456789"
    rname = F.col("c_name")
    for k in range(1, n):
        rname = F.when(
            F.col("_copy") == k,
            F.translate(
                "c_name", digits, digits[k % 10:] + digits[: k % 10]
            ),
        ).otherwise(rname)
    shift(
        load_table(spark, SF_DIR, "customer")
        .crossJoin(copies)
        .withColumn("c_name", rname),
        ["c_custkey"],
    ).write.mode("overwrite").parquet(f"{out}/customer.parquet")
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
    spark = get_spark(app_name="round8_scale_check")
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
