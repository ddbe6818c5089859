"""Scale-up sanity for the ROUND-9 additions (the per-round 10x table
rounds 7/8/8c ran but round 9 skipped — closed here in round 10):
replicate the fixtures Nx with key-disjoint copies (round8c recipes:
alphabet-rotated documents, key strides, ts shifts, grid-shifted
embeddings) and time 1x vs Nx through the registered key functions,
frame cache cleared before every timed run.

What each key should show at Nx:
- corpus_source_overlap: rotated vocab makes copies gram-disjoint, so
  the per-gram source-pair term stays <= C(sources,2) and the whole
  key is linear in the (10x) vocabulary.
- anonymize_l_diversity / anonymize_t_closeness: one groupBy over the
  (10x) record set onto class tables bounded by the QI domain; the
  t-closeness EMD is per-class constant work. Linear. Replication
  artifact (same as k-anonymity in round 8c): 10x class sizes change
  WHICH classes pass the k/l/t gates, not the plan shape.
- dedup_edit_distance: MinHash-band candidates (copy-disjoint grams ->
  candidates linear), Levenshtein only on candidates.
- text_vocab_stats: explode + two groupBys, linear in tokens.
- agg_sketch_intersection: per-priority sketches from 10x orders
  (linear) + a priority-pair grid bounded by |priorities|^2.
- join_lateral_topn: per-customer top-n window over 10x orders,
  linear.
- orders_croston_demand: per-part interval recursion over 10x
  (strided = copy-disjoint) parts, linear in lineitems.
- simsearch_greedy_graph: HONEST ~N^2 EXPECTATION on this replica,
  documented rather than hidden — the walk itself is O(queries·K) per
  hop, but its input knn graph probes IVF cells whose SIZE grows 10x
  while the fixture's cell COUNT (10 labels) is fixed, so the
  n·cell_size build term grows ~100x. At corpus scale an index build
  grows cells with n (the sqrt-n rule); the replica deliberately
  cannot, making this row the measured cost of an UNDER-CELLED index,
  the failure mode the IVF lifecycle keys (append drift -> rebalance)
  exist to detect.

Usage: python tools/round10_scale_check.py [N] [key1,key2,...]
Results recorded in BASELINE.md round 10.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_database_akkatyped_spark.caching import clear_frame_cache
from graph_database_akkatyped_spark.registry import collect
from graph_database_akkatyped_spark.session import get_spark
from tools.round8c_scale_check import SF_DIR, replicate

KEYS = [
    "corpus_source_overlap",
    "anonymize_l_diversity",
    "anonymize_t_closeness",
    "dedup_edit_distance",
    "text_vocab_stats",
    "agg_sketch_intersection",
    "join_lateral_topn",
    "orders_croston_demand",
    "simsearch_greedy_graph",
]


def run(spark, queries, sf_dir: str) -> dict[str, tuple[float, int]]:
    res = {}
    for op in KEYS:
        fn = queries[op]
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        clear_frame_cache()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        res[op] = (round(time.perf_counter() - t0, 2), df.count())
    return res


def main() -> None:
    global KEYS
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    if len(sys.argv) > 2:
        keep = set(sys.argv[2].split(","))
        unknown = keep - set(KEYS)
        assert not unknown, f"unknown keys: {sorted(unknown)}"
        KEYS = [k for k in KEYS if k in keep]
    spark = get_spark(app_name="round10_scale_check")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = collect()
    base = run(spark, queries, SF_DIR)
    big_dir = replicate(spark, n)
    big = run(spark, queries, big_dir)
    print(f"\n== {n}x scale check (1x = {SF_DIR}) ==")
    print(f"{'op':<28} {'1x sec':>8} {f'{n}x sec':>8} {'ratio':>6} "
          f"{'1x rows':>10} {f'{n}x rows':>10}")
    for op in KEYS:
        t1, r1 = base[op]
        tn, rn = big[op]
        ratio = tn / t1 if t1 > 0 else float("inf")
        print(f"{op:<28} {t1:>8.2f} {tn:>8.2f} {ratio:>6.1f} "
              f"{r1:>10,} {rn:>10,}")


if __name__ == "__main__":
    main()
