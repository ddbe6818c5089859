"""Round-8 kernel rehearsal: the heaviest memoized kernels that still
had only 10x-replica evidence — Borůvka max-spanning-forest, SCC
coloring, and k-truss peeling — at the 1M-vertex rehearsal size, so
their 100x behavior is measured rather than asserted (the round-6/7
rehearsal series continued; see BASELINE.md).

Graphs are deterministic (hash-of-sequence-id, no RNG state):

- MST: the round-7 planted-partition graph canonicalized to weighted
  undirected edges (weight = hash in 1..100, strict (weight DESC, a, b)
  tie order). Verification is distributed and two-sided: (1) spanning —
  the forest's CC labeling equals the graph's CC labeling component-for-
  component (same vertex partition), and edge count = V_used − #comps;
  (2) maximality — cycle property on ``N_SPOT`` sampled non-forest
  edges: the endpoints must reconnect through forest edges that
  STRICTLY outrank the sampled edge in the total order.
- SCC: ``N_BLOCKS`` directed ring blocks (each block one ground-truth
  SCC) + forward-only noise edges (low block -> high block, so no
  accidental cross-block cycles). Verification: exactly N_BLOCKS SCCs,
  and the (block, scc_id) pairing is a bijection — distributed counts,
  no collect beyond scalars.
- k-truss: truss peeling to fixpoint on a DENSE-block planted graph
  (block size 100, so intra-block density ~0.18 at the default edge
  budget — the round-7 1000-vertex blocks are ~0.018 dense, where a
  K=4 truss is empty and the verification vacuous; the peel must
  instead SURVIVE something to prove the surviving-subgraph logic).
  Verification is definitional: every surviving edge closes >= K-2
  triangles INSIDE the surviving subgraph (a full support recount
  over the result), and the fixpoint confirm round is part of
  truss_frame itself.
  Why the ~240 s wall is NOT an orientation problem (round-8 VERDICT
  #6, negative result): degree-ordered edge orientation bounds the
  wedge term at O(m^1.5) only on SKEWED graphs; this rehearsal's
  blocks are near-uniform-degree, where every acyclic orientation of
  an s-dense block enumerates ~s^3/6 wedges — the triangle OUTPUT the
  support count must touch anyway — and ID order == degree order up
  to ties. See truss_frame's docstring for the full argument.

Usage: python tools/round8_kernel_rehearsal.py [n_vertices] [n_edges] [kernels]
``kernels`` is a comma list of mst,scc,truss (default: all).
Results recorded in BASELINE.md next to the round-6/7 rehearsals.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from graph_database_akkatyped_spark.operators.algos import (
    _TRUSS_K,
    cc_frame,
    truss_frame,
)
from graph_database_akkatyped_spark.operators.graph_extras import (
    cc_twophase_frame,
    mst_boruvka_frame,
    scc_frame,
)
from graph_database_akkatyped_spark.session import get_spark
from tools.round7_kernel_rehearsal import N_BLOCKS, planted_graph

N_SPOT = 5


def weighted_canonical(sym: DataFrame) -> DataFrame:
    """Canonical (a < b) weighted edges from the symmetric planted
    graph; weight = deterministic hash in 1..100."""
    ce = sym.where(F.col("a") < F.col("b")).distinct()
    return ce.select(
        "a",
        "b",
        (
            F.pmod(
                F.xxhash64(F.col("a") * F.lit(1_000_003) + F.col("b")),
                F.lit(100),
            )
            + 1
        ).alias("weight"),
    )


def rehearse_mst(spark, ce: DataFrame) -> None:
    t0 = time.perf_counter()
    forest = mst_boruvka_frame(ce).localCheckpoint(eager=True)
    wall = time.perf_counter() - t0
    n_forest = forest.count()
    print(f"mst_boruvka: {wall:.1f}s, {n_forest} forest edges")

    # (1) spanning: forest CC == graph CC as a partition of the touched
    # vertex set, and |forest| = |V_used| - #components (forest-ness +
    # spanning together, since the forest is a subgraph of the graph)
    verts = (
        ce.select(F.col("a").alias("id"))
        .union(ce.select(F.col("b").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_v = verts.count()
    gsym = ce.select("a", "b").unionByName(
        ce.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    fsym = forest.select("a", "b").unionByName(
        forest.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    # cc_twophase_frame, not cc_frame or pointer doubling: the forest
    # is a spanning TREE whose diameter defeats O(d) kernels (the 20k
    # smoke measured cc_frame not converging in 50 supersteps and
    # doubling needing 92 rounds); two-phase closes it in a handful
    gcc = cc_twophase_frame(verts, gsym).localCheckpoint(eager=True)
    fcc = cc_twophase_frame(verts, fsym).localCheckpoint(eager=True)
    n_gcomp = gcc.select("component").distinct().count()
    # same partition <=> the (graph_label, forest_label) pairing is a
    # bijection: distinct pairs == distinct graph labels == distinct
    # forest labels
    pairs = (
        gcc.withColumnRenamed("component", "gc")
        .join(fcc.withColumnRenamed("component", "fc"), "id")
        .select("gc", "fc")
        .distinct()
        .count()
    )
    n_fcomp = fcc.select("component").distinct().count()
    assert pairs == n_gcomp == n_fcomp, (pairs, n_gcomp, n_fcomp)
    assert n_forest == n_v - n_gcomp, (n_forest, n_v, n_gcomp)
    print(
        f"mst spanning verified: {n_gcomp} components, "
        f"|forest| = {n_v} - {n_gcomp}"
    )

    # (2) maximality via the cycle property on sampled non-forest edges
    non_tree = (
        ce.join(forest.select("a", "b"), ["a", "b"], "left_anti")
        .orderBy(F.xxhash64("a", "b"))
        .limit(N_SPOT)
        .collect()
    )
    for r in non_tree:
        x, y, wgt = r["a"], r["b"], r["weight"]
        # forest edges STRICTLY above (wgt, x, y) in the total order
        # (weight DESC, a ASC, b ASC)
        above = forest.where(
            (F.col("weight") > wgt)
            | (
                (F.col("weight") == wgt)
                & (
                    (F.col("a") < x)
                    | ((F.col("a") == x) & (F.col("b") < y))
                )
            )
        )
        asym = above.select("a", "b").unionByName(
            above.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        cc = cc_twophase_frame(verts, asym)
        labels = {
            row["component"]
            for row in cc.where(F.col("id").isin([x, y])).collect()
        }
        assert len(labels) == 1, (x, y, wgt, labels)
    print(
        f"mst maximality verified: cycle property holds on "
        f"{len(non_tree)} sampled non-forest edges"
    )


def ring_block_digraph(spark, n_v: int, n_e: int) -> DataFrame:
    """Directed graph with exactly ``N_BLOCKS`` ground-truth SCCs:
    each contiguous-id block is a directed ring (strongly connected)
    PLUS random intra-block chords (the ring alone has diameter =
    block size, which at 1M vertices is a 1000-hop cycle — the
    coloring Pregel's per-hop propagation would honestly need 1000
    supersteps; chords drop the effective diameter to ~log like any
    real SCC, while the ring keeps strong connectivity guaranteed).
    Noise edges only ever point from a lower block to a strictly
    higher block, so no cross-block cycle can form and the ground
    truth stays exactly one SCC per block."""
    bs = n_v // N_BLOCKS
    # ring successor within the block: blk*bs + ((id - blk*bs + 1) % bs)
    blk = F.floor(F.col("id") / bs)
    ring = spark.range(n_v).select(
        F.col("id").alias("src"),
        (blk * bs + F.pmod(F.col("id") - blk * bs + 1, F.lit(bs))).alias(
            "dst"
        ),
    )

    def h(c: int):
        return F.xxhash64(F.col("id") + F.lit(c))

    extra = max(n_e - n_v, 2)
    cblk = F.pmod(h(47), F.lit(N_BLOCKS))
    chords = spark.range(extra // 2).select(
        (cblk * bs + F.pmod(h(53), F.lit(bs))).alias("src"),
        (cblk * bs + F.pmod(h(59), F.lit(bs))).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    lo = F.pmod(h(31), F.lit(N_BLOCKS - 1))  # block 0..N_BLOCKS-2
    hi = lo + 1 + F.pmod(h(37), F.lit(N_BLOCKS) - lo - 1)  # strictly higher
    noise = spark.range(extra - extra // 2).select(
        (lo * bs + F.pmod(h(41), F.lit(bs))).alias("src"),
        (hi * bs + F.pmod(h(43), F.lit(bs))).alias("dst"),
    )
    return ring.unionByName(chords).unionByName(noise)


def rehearse_scc(spark, n_v: int, n_e: int) -> None:
    bs = n_v // N_BLOCKS
    edges = ring_block_digraph(spark, n_v, n_e).localCheckpoint(eager=True)
    verts = (
        spark.range(n_v).select(F.col("id")).localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    t0 = time.perf_counter()
    scc = scc_frame(verts, edges).localCheckpoint(eager=True)
    wall = time.perf_counter() - t0
    n_scc = scc.select("scc_id").distinct().count()
    print(f"scc_frame: {wall:.1f}s on {n_edges} edges, {n_scc} SCCs")
    assert n_scc == N_BLOCKS, (n_scc, N_BLOCKS)
    # bijection block <-> scc label, distributed
    pairs = (
        scc.select(
            F.floor(F.col("id") / bs).alias("blk"), "scc_id"
        )
        .distinct()
        .count()
    )
    assert pairs == N_BLOCKS, pairs
    print(
        f"scc verified: {N_BLOCKS} planted ring blocks recovered exactly "
        f"(block <-> label bijection)"
    )


def rehearse_truss(spark, ce: DataFrame) -> None:
    e = ce.select("a", "b").localCheckpoint(eager=True)
    n0 = e.count()
    t0 = time.perf_counter()
    # the registered key's 14-round cap is tied to its unrolled SQL
    # oracle; the rehearsal verifies definitionally (support recount
    # below), so a deep peel chain just gets a deeper bound
    truss = truss_frame(e, max_rounds=64).localCheckpoint(eager=True)
    wall = time.perf_counter() - t0
    n1 = truss.count()
    print(f"truss_frame (K={_TRUSS_K}): {wall:.1f}s, {n0} -> {n1} edges")
    # definitional recount: every surviving edge closes >= K-2
    # triangles inside the surviving subgraph
    t1 = truss.select(F.col("a").alias("x"), F.col("b").alias("y"))
    t2 = truss.select(F.col("a").alias("y"), F.col("b").alias("z"))
    t3 = truss.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = t1.join(t2, "y").join(t3, ["x", "z"])
    sup = (
        tri.select(F.col("x").alias("p"), F.col("y").alias("q"))
        .unionAll(tri.select(F.col("x").alias("p"), F.col("z").alias("q")))
        .unionAll(tri.select(F.col("y").alias("p"), F.col("z").alias("q")))
        .groupBy("p", "q")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    weak = (
        truss.join(
            sup,
            (truss["a"] == sup["p"]) & (truss["b"] == sup["q"]),
            "left",
        )
        .where(F.coalesce(F.col("c"), F.lit(0)) < _TRUSS_K - 2)
        .count()
    )
    assert weak == 0, weak
    print(
        f"truss verified: all {n1} surviving edges have support >= "
        f"{_TRUSS_K - 2} in the surviving subgraph"
    )


def dense_planted_graph(spark, n_v: int, n_e: int, bs: int = 100) -> DataFrame:
    """``planted_graph`` with an explicit block size: same hash-of-id
    construction, but small dense blocks so a K=4 truss actually
    survives (see module docstring)."""
    n_blocks = n_v // bs

    def h(c: int):
        return F.xxhash64(F.col("id") + F.lit(c))

    blk = F.pmod(h(11), F.lit(n_blocks))
    intra = F.pmod(h(13), F.lit(100)) < 90
    e = spark.range(n_e).select(
        F.when(intra, blk * bs + F.pmod(h(17), F.lit(bs)))
        .otherwise(F.pmod(h(23), F.lit(n_v)))
        .alias("a"),
        F.when(intra, blk * bs + F.pmod(h(19), F.lit(bs)))
        .otherwise(F.pmod(h(29), F.lit(n_v)))
        .alias("b"),
    ).where(F.col("a") != F.col("b"))
    return e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )


def main() -> None:
    n_v = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_e = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    kernels = (
        set(sys.argv[3].split(",")) if len(sys.argv) > 3
        else {"mst", "scc", "truss"}
    )
    spark = get_spark(app_name="round8-kernel-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    if kernels & {"mst"}:
        sym = planted_graph(spark, n_v, n_e).localCheckpoint(eager=True)
        ce = weighted_canonical(sym).localCheckpoint(eager=True)
        print(f"graph: {n_v} vertices, {ce.count()} canonical weighted edges")
        rehearse_mst(spark, ce)
    if "scc" in kernels:
        rehearse_scc(spark, n_v, n_e)
    if "truss" in kernels:
        sym_d = dense_planted_graph(spark, n_v, n_e).localCheckpoint(
            eager=True
        )
        rehearse_truss(spark, weighted_canonical(sym_d))


if __name__ == "__main__":
    main()
