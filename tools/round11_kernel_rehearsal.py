"""Round-11 kernel rehearsal (round-10 VERDICT #5): the two graph
kernels that had 10x-replica rows but no post-round-10 1M-V/40M-E
rehearsal row — multi-level Louvain (now WITH the deg/m2 invariant-
frame cuts, centrality.py) and the incremental-CC contract-and-merge —
re-run on the round-7 planted-partition protocol with the two named
invariant checks made explicit:

- Louvain: the PER-SWEEP modularity trace (6 sweeps/level — the
  round-7 rehearsal protocol, so walls are comparable; the shipped
  fixture default is 2). Each of the 6 level-1
  sweeps and the level-2 (contracted, weighted) sweeps is scored with
  the distributed Newman-Q helper; the trace must be non-decreasing
  (the synchronous sweep's monotone-id guard + strictly-positive-gain
  rule — this is the empirical check of the guard's soundness at 1M
  vertices, where a cyclic simultaneous move would show up as a Q
  dip). Plus wall for the whole louvain_multi_frame kernel and the
  planted-structure bar Q > 0.3.
- Incremental CC: 5% of edges (by hash) arrive as the delta; the
  cc_incremental shape (contract base components to super-vertices,
  CC over super-graph + delta, project back) must equal a full-graph
  cc_frame recompute EXACTLY — distributed anti-join on (vertex,
  label) = 0 rows, equal component counts — with walls for the batch
  run and for the merge given the base labeling.

Usage: python tools/round11_kernel_rehearsal.py [n_vertices] [n_edges]
(defaults 1_000_000 / 20_000_000 generated pairs -> ~40M directed
after symmetrization). Results recorded in BASELINE.md round 11.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_database_akkatyped_spark.caching import cut
from graph_database_akkatyped_spark.operators.algos import cc_frame
from graph_database_akkatyped_spark.operators.centrality import (
    _louvain_sweep,
    louvain_multi_frame,
)
from graph_database_akkatyped_spark.session import get_spark
from tools.round7_kernel_rehearsal import modularity, planted_graph


def rehearse_louvain_trace(spark, verts, sym) -> None:
    edges = sym.select("a", "b", F.lit(1).cast("long").alias("w"))
    # the full kernel, timed end-to-end (deg/m2 cuts included)
    t0 = time.perf_counter()
    lab = louvain_multi_frame(verts, edges, sweeps=6).localCheckpoint(
        eager=True
    )
    n_comm = lab.select("l").distinct().count()
    wall = time.perf_counter() - t0
    q_final = modularity(lab, edges)
    print(
        f"louvain_multi_frame: {wall:.1f}s, {n_comm} communities, "
        f"Q={q_final:.4f}"
    )
    assert q_final > 0.3, "planted structure not recovered"
    # per-sweep Q trace: replay the kernel's exact loop, scoring after
    # every sweep (level 1 unweighted, contraction, level 2 weighted)
    deg = cut(edges.groupBy(F.col("a").alias("v")).agg(F.sum("w").alias("d")))
    m2 = cut(edges.agg(F.sum("w").alias("m")))
    labels = verts.select("v", F.col("v").alias("l"))
    trace = [modularity(labels, edges)]
    for s in range(6):
        labels = cut(_louvain_sweep(labels, edges, deg, m2))
        trace.append(modularity(labels, edges))
    la = labels.select(F.col("v").alias("a"), F.col("l").alias("ca"))
    lb = labels.select(F.col("v").alias("b"), F.col("l").alias("cb"))
    cedges = cut(
        edges.join(la, "a")
        .join(lb, "b")
        .groupBy(F.col("ca").alias("a"), F.col("cb").alias("b"))
        .agg(F.sum("w").alias("w"))
    )
    cdeg = cut(
        cedges.groupBy(F.col("a").alias("v")).agg(F.sum("w").alias("d"))
    )
    clabels = (
        labels.select(F.col("l").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("l"))
    )
    for s in range(6):
        clabels = cut(_louvain_sweep(clabels, cedges, cdeg, m2))
        proj = clabels.select(F.col("v").alias("l"), F.col("l").alias("l2"))
        flat = labels.join(proj, "l").select("v", F.col("l2").alias("l"))
        trace.append(modularity(flat, edges))
    print("Q trace (start, l1 sweeps 1-6, l2 sweeps 1-6):",
          [round(q, 4) for q in trace])
    for i in range(1, len(trace)):
        assert trace[i] >= trace[i - 1] - 1e-12, (
            f"modularity DECREASED at sweep {i}: {trace}"
        )
    print("modularity monotone across all 12 sweeps: True")


def rehearse_cc_incremental(spark, verts, sym, max_iter: int = 50) -> None:
    # 5% of edges arrive as the delta, decided on the CANONICAL pair
    # (least, greatest): hashing the directed row would strand one
    # direction of a pair in base and its reverse in delta, making
    # both sets non-symmetric — and min-id propagation (like every CC
    # formulation here) is specified over symmetric edge sets. The
    # first run of this tool made exactly that mistake and the sparse
    # check caught it: 31,165 label mismatches, 144k vs 130k
    # components — the invariant check doing its job (on the TOOL).
    is_delta = (
        F.pmod(F.xxhash64(F.least("a", "b"), F.greatest("a", "b")), F.lit(20))
        == 0
    )
    tagged = sym.withColumn("dlt", is_delta).localCheckpoint(eager=True)
    base = tagged.where(~F.col("dlt")).select("a", "b")
    delta = tagged.where(F.col("dlt")).select("a", "b")
    base_verts = base.select(F.col("a").alias("id")).distinct()

    t0 = time.perf_counter()
    full_cc = cc_frame(verts.select(F.col("v").alias("id")), tagged
                       .select("a", "b"),
                       max_iter=max_iter).localCheckpoint(eager=True)
    t_batch = time.perf_counter() - t0

    t0 = time.perf_counter()
    base_cc = cc_frame(base_verts, base,
                       max_iter=max_iter).localCheckpoint(eager=True)
    t_base = time.perf_counter() - t0

    # the cc_incremental merge shape: contract + delta CC + project
    t0 = time.perf_counter()
    lab_a = base_cc.select(F.col("id").alias("a"),
                           F.col("component").alias("ca"))
    lab_b = base_cc.select(F.col("id").alias("b"),
                           F.col("component").alias("cb"))
    super_edges = (
        delta.join(lab_a, "a", "left")
        .join(lab_b, "b", "left")
        .select(
            F.coalesce("ca", F.col("a")).alias("a"),
            F.coalesce("cb", F.col("b")).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    c1 = (
        verts.select(F.col("v").alias("id"))
        .join(base_cc, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("c1"))
    )
    super_verts = c1.select(F.col("c1").alias("id")).distinct()
    merged = cc_frame(super_verts, super_edges, max_iter=max_iter)
    incr = c1.join(
        merged.select(F.col("id").alias("c1"),
                      F.col("component").alias("comp2")),
        "c1",
    ).select("id", F.col("comp2").alias("component"))
    incr = incr.localCheckpoint(eager=True)
    t_merge = time.perf_counter() - t0

    mism = (
        incr.join(full_cc, "id")
        .where(incr["component"] != full_cc["component"])
        .count()
    )
    nc_full = full_cc.select("component").distinct().count()
    nc_incr = incr.select("component").distinct().count()
    print(
        f"cc_incremental: batch={t_batch:.1f}s base={t_base:.1f}s "
        f"merge-given-base={t_merge:.1f}s components "
        f"batch={nc_full} incr={nc_incr} label-mismatches={mism}"
    )
    assert mism == 0 and nc_full == nc_incr, (mism, nc_full, nc_incr)
    print("incremental CC == batch CC (per-vertex, distributed): True")


def main() -> None:
    n_v = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_e = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    spark = get_spark(app_name="round11-kernel-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    sym = planted_graph(spark, n_v, n_e).localCheckpoint(eager=True)
    verts = (
        sym.select(F.col("a").alias("v")).distinct()
        .localCheckpoint(eager=True)
    )
    print(f"graph: {verts.count()} vertices, {sym.count()} directed edges")
    if "cc" not in sys.argv[3:]:  # `... 1000000 20000000 cc` = CC only
        rehearse_louvain_trace(spark, verts, sym)
    rehearse_cc_incremental(spark, verts, sym)
    # the 40M-E graph is one giant component (avg degree ~40), which
    # makes the equality check semantically weak — repeat it on a
    # SPARSE graph (avg degree ~1) where the component structure is
    # nontrivial and a wrong merge would actually scramble labels.
    # Near-critical density means the largest component's diameter is
    # ~n^(1/3) (> the 50-superstep default, which cc_frame now REFUSES
    # to silently exceed) — the frontier-only fixpoint detector makes
    # the generous cap free once converged.
    sparse = planted_graph(spark, n_v, n_v // 2).localCheckpoint(eager=True)
    sverts = (
        sparse.select(F.col("a").alias("v")).distinct()
        .unionByName(sparse.select(F.col("b").alias("v")).distinct())
        .distinct()
        .localCheckpoint(eager=True)
    )
    print(f"sparse graph: {sverts.count()} vertices, "
          f"{sparse.count()} directed edges")
    rehearse_cc_incremental(spark, sverts, sparse, max_iter=1000)


if __name__ == "__main__":
    main()
