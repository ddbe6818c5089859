"""Round-10 IVF lifecycle rehearsal (round-9 VERDICT #8): the
partitioned / append / rebalance trio — previously evidenced only at
fixture scale (2k vectors) — exercised through the REGISTERED key
functions on a 1M-vector / 64-dim synthetic corpus, so the lifecycle's
linear-shape and recall claims are measured rather than asserted.

Corpus construction is deterministic (hash-of-id, no RNG state), with
the same schema and label topology as the fixture embeddings table
(10 labels; labels >= _REBAL_BASE_LABELS = 8 are the 'arrived'
out-of-distribution mass the rebalance keys exist for):

  centroid_l[d] = ((l * 31 + d * 17) % 7) / 7          (inter-cell ~O(1))
  vec[id][d]    = centroid_label[d] + h(id, d) / 1e4   (noise <= 0.1)

so a vector's exact top-10 neighbours live in its own cell with
margin — recall through a 2-cell probe is meaningful, not vacuous.

Honest scope note on the recovery delta: at this clean planted
topology each arrived label's mass lands COHERENTLY in one frozen
cell (deterministic argmax, small noise), so both index generations
probe it successfully and stale == rebalanced == 1.0 — the rehearsal
pins the lifecycle's walls (linear, broadcast-assignment shapes), the
drift monitor firing, and the recall CEILING holding at 1M; the
stale-vs-rebalanced recovery GAP is a property of noisy cluster
boundaries and is exercised by the fixture-scale key itself
(simsearch_recall_rebalance at sf0.01/0.1), not by this corpus. A
planted topology that scatters arrivals (label centroid equidistant
from 4 frozen centroids) was tried and rejected: symmetric scatter
shifts all 4 stale centroids identically, ONE Lloyd step cannot
coalesce the arrived mass, and both generations sit at ~0.5 — it
demonstrates a k-means limitation, not the operator.

Measured phases (each through the registered operator, on a temp
sf_dir holding only embeddings.parquet):

1. simsearch_ivf_partitioned — physical partitionBy(cell) layout +
   centroid build + pruned 2-cell probe; recall@10 of its candidates
   vs exact brute-force truth (simsearch_topk) must hold the
   fixture-measured >= 0.8 level.
2. simsearch_ivf_append — 10% arriving batch assigned against frozen
   base centroids (broadcast argmax; nothing rescans the base), drift
   fraction reported.
3. simsearch_ivf_rebalance — one deterministic Lloyd step + move
   report.
4. simsearch_recall_rebalance — stale vs rebalanced recall for the
   worst-served (appended) queries; the rebalanced index must hold
   >= the stale recall and >= 0.8 (see the scope note below on why
   both sit at the 1.0 ceiling here).

Usage: python tools/round10_ivf_rehearsal.py [n_vectors]  (default 1e6)
Results recorded in BASELINE.md round 10.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_database_akkatyped_spark.operators import llm
from graph_database_akkatyped_spark.session import get_spark

DIMS = 64
N_LABELS = 10


def build_corpus(spark, n: int) -> str:
    out = tempfile.mkdtemp(prefix=f"ivf_rehearsal_{n}_")
    lbl = F.pmod(F.xxhash64(F.col("id") + F.lit(101)), F.lit(N_LABELS))
    dims = [
        (
            ((lbl * 31 + F.lit(d * 17)) % 7).cast("double") / 7.0
            + F.pmod(
                F.xxhash64(F.col("id") * F.lit(DIMS) + F.lit(d)), F.lit(1000)
            ).cast("double")
            / 1e4
        ).cast("float")
        for d in range(DIMS)
    ]
    (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.array(*dims).alias("embedding"),
            lbl.cast("int").alias("label"),
        )
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="round10-ivf-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    d = build_corpus(spark, n)
    print(f"corpus: {n} vectors x {DIMS} dims in {time.perf_counter()-t0:.1f}s")

    # 1) partitioned index + pruned probe, recall vs brute force
    t0 = time.perf_counter()
    part = llm.simsearch_ivf_partitioned(spark, d).localCheckpoint(eager=True)
    n_part = part.count()
    t_part = time.perf_counter() - t0
    t0 = time.perf_counter()
    truth = (
        llm.simsearch_topk(spark, d)
        .select("q_id", "vec_id")
        .localCheckpoint(eager=True)
    )
    t_truth = time.perf_counter() - t0
    rec = {
        r["q_id"]: r["recall_at_10"]
        for r in llm._recall_vs_truth(
            truth, part.select("q_id", "vec_id")
        ).collect()
    }
    macro = sum(rec.values()) / len(rec)
    print(
        f"ivf_partitioned: {t_part:.1f}s build+probe ({n_part} rows), "
        f"brute-force truth {t_truth:.1f}s, recall@10 per-q "
        f"{sorted(rec.values())}, macro {macro:.2f}"
    )
    assert macro >= 0.8, f"partitioned recall regressed: {macro}"

    # 2) append against the frozen index
    t0 = time.perf_counter()
    app = llm.simsearch_ivf_append(spark, d).localCheckpoint(eager=True)
    n_app = app.count()
    n_drift = app.where(F.col("drifted")).count()
    t_app = time.perf_counter() - t0
    print(
        f"ivf_append: {t_app:.1f}s, {n_app} appended, "
        f"drift fraction {n_drift / n_app:.3f}"
    )

    # 3) rebalance (one Lloyd step) + move report
    t0 = time.perf_counter()
    reb = llm.simsearch_ivf_rebalance(spark, d).localCheckpoint(eager=True)
    moves = reb.agg(
        F.sum("n_moved_in").alias("mi"), F.sum("n_moved_out").alias("mo")
    ).collect()[0]
    t_reb = time.perf_counter() - t0
    print(
        f"ivf_rebalance: {t_reb:.1f}s, {reb.count()} cells, "
        f"moved_in {moves['mi']} / moved_out {moves['mo']}"
    )

    # 4) recall recovery for the appended (worst-served) queries
    t0 = time.perf_counter()
    rr = llm.simsearch_recall_rebalance(spark, d).collect()
    t_rr = time.perf_counter() - t0
    stale = sum(r["n_hit_stale"] for r in rr) / sum(r["n_true"] for r in rr)
    rebal = sum(r["n_hit_rebal"] for r in rr) / sum(r["n_true"] for r in rr)
    print(
        f"recall_rebalance: {t_rr:.1f}s, stale {stale:.2f} -> "
        f"rebalanced {rebal:.2f} (recovery {rebal - stale:+.2f})"
    )
    assert rebal >= stale, (stale, rebal)
    assert rebal >= 0.8, f"rebalanced recall below fixture flag: {rebal}"


if __name__ == "__main__":
    main()
