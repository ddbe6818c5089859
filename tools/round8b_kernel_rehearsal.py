"""Round-8b kernel rehearsal: k-core peeling and HITS power iteration
at the 1M-vertex rehearsal size — the next-heaviest memoized kernels
after the round-6/7/8 series whose 100x behavior was still
asserted-linear rather than measured.

Graphs are deterministic (hash-of-sequence-id, no RNG state):

- k-core (K = ``_KCORE_K`` = 10, the registered key's constant): the
  planted-partition graph (~2% dense 1000-vertex blocks, where the
  10-core peels almost everything) PLUS ``N_CLIQUES`` planted
  11-cliques on reserved ids. Verification is two-sided:
  (1) fixpoint recount — every surviving vertex has degree >= K inside
  the surviving subgraph (definitional, distributed);
  (2) planted floor — every clique vertex must survive (an 11-clique
  member has degree 10 within the clique alone, so peeling can never
  touch it; a kernel that drops one is wrong, not slow).

- HITS (3 iterations, the registered key's constant): the planted
  graph's directed edges PLUS a planted bipartite block of
  ``N_HUBS`` hubs -> ``N_AUTHS`` authorities on reserved ids.
  Verification: the top-``N_AUTHS`` authority scores are exactly the
  planted authority ids and the top-``N_HUBS`` hub scores are exactly
  the planted hub ids (margin checked: min planted score > max
  non-planted score) — the fixpoint direction must find the planted
  structure, distributedly, with exact-integer scores.

Usage: python tools/round8b_kernel_rehearsal.py [n_vertices] [n_edges] [kernels]
``kernels`` is a comma list of kcore,hits (default: all).
Results recorded in BASELINE.md next to the round-8 rehearsals.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from graph_database_akkatyped_spark.operators.algos import (
    _KCORE_K,
    kcore_frame,
)
from graph_database_akkatyped_spark.operators.centrality import hits_frame
from graph_database_akkatyped_spark.session import get_spark
from tools.round7_kernel_rehearsal import planted_graph

N_CLIQUES = 50
N_HUBS = 100
N_AUTHS = 100


def planted_cliques(spark, n_v: int) -> DataFrame:
    """Symmetric edges of ``N_CLIQUES`` disjoint (K+1)-cliques on ids
    n_v .. n_v + N_CLIQUES*(K+1) - 1 (reserved: above the base graph)."""
    size = _KCORE_K + 1
    members = spark.range(N_CLIQUES * size).select(
        (F.col("id") + n_v).alias("v"),
        F.floor(F.col("id") / size).alias("c"),
    )
    pairs = (
        members.alias("m1")
        .join(members.alias("m2"), "c")
        .select(F.col("m1.v").alias("a"), F.col("m2.v").alias("b"))
        .where(F.col("a") != F.col("b"))
    )
    return pairs


def rehearse_kcore(spark, n_v: int, n_e: int) -> None:
    sym = planted_graph(spark, n_v, n_e)
    edges = (
        sym.unionByName(planted_cliques(spark, n_v))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    t0 = time.perf_counter()
    core = kcore_frame(edges, _KCORE_K, max_rounds=512).localCheckpoint(
        eager=True
    )
    wall = time.perf_counter() - t0
    n_core = core.count()
    print(f"kcore_frame (K={_KCORE_K}): {wall:.1f}s, {n_core} survivors "
          f"on {n_edges} directed edges")

    # (1) definitional recount inside the surviving subgraph
    live = edges.join(
        core.select(F.col("id").alias("a")), "a", "left_semi"
    ).join(core.select(F.col("id").alias("b")), "b", "left_semi")
    weak = (
        live.groupBy(F.col("a").alias("id"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .where(F.col("deg") < _KCORE_K)
        .count()
    )
    assert weak == 0, weak
    # every survivor appears in live edges (isolated survivors would be
    # missed by the groupBy recount above)
    isolated = core.join(
        live.select(F.col("a").alias("id")).distinct(), "id", "left_anti"
    ).count()
    assert isolated == 0, isolated
    # (2) planted floor: all clique vertices survive
    n_clique_v = N_CLIQUES * (_KCORE_K + 1)
    survived = core.where(F.col("id") >= n_v).count()
    assert survived == n_clique_v, (survived, n_clique_v)
    print(
        f"kcore verified: fixpoint recount clean, all {n_clique_v} "
        f"planted clique vertices survive"
    )


def rehearse_hits(spark, n_v: int, n_e: int) -> None:
    base = planted_graph(spark, n_v, n_e).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    hubs = spark.range(N_HUBS).select((F.col("id") + n_v).alias("src"))
    auths = spark.range(N_AUTHS).select(
        (F.col("id") + n_v + N_HUBS).alias("dst")
    )
    block = hubs.crossJoin(auths)
    edges = base.unionByName(block).localCheckpoint(eager=True)
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    t0 = time.perf_counter()
    scores = hits_frame(verts, edges).localCheckpoint(eager=True)
    wall = time.perf_counter() - t0
    print(f"hits_frame (3 iters): {wall:.1f}s on {n_edges} edges")

    planted_a = scores.where(
        (F.col("id") >= n_v + N_HUBS) & (F.col("id") < n_v + N_HUBS + N_AUTHS)
    )
    rest_a = scores.where(
        (F.col("id") < n_v) | (F.col("id") >= n_v + N_HUBS + N_AUTHS)
        | ((F.col("id") >= n_v) & (F.col("id") < n_v + N_HUBS))
    )
    min_pa = planted_a.agg(F.min("auth")).collect()[0][0]
    max_ra = rest_a.agg(F.max("auth")).collect()[0][0]
    assert min_pa > max_ra, (min_pa, max_ra)
    planted_h = scores.where(
        (F.col("id") >= n_v) & (F.col("id") < n_v + N_HUBS)
    )
    rest_h = scores.join(planted_h.select("id"), "id", "left_anti")
    min_ph = planted_h.agg(F.min("hub")).collect()[0][0]
    max_rh = rest_h.agg(F.max("hub")).collect()[0][0]
    assert min_ph > max_rh, (min_ph, max_rh)
    print(
        f"hits verified: planted {N_AUTHS} authorities / {N_HUBS} hubs "
        f"separate cleanly (min planted auth {min_pa} > max other "
        f"{max_ra}; min planted hub {min_ph} > max other {max_rh})"
    )


def main() -> None:
    n_v = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_e = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    kernels = (
        set(sys.argv[3].split(",")) if len(sys.argv) > 3
        else {"kcore", "hits"}
    )
    spark = get_spark(app_name="round8b-kernel-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    if "kcore" in kernels:
        rehearse_kcore(spark, n_v, n_e)
    if "hits" in kernels:
        rehearse_hits(spark, n_v, n_e)


if __name__ == "__main__":
    main()
