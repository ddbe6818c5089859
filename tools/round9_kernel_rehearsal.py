"""Round-9 kernel rehearsal: PageRank at the 1M-vertex scale after the
edge-frame cut fix.

Round 9 changed ``pagerank_frame`` (and ``ppr_frame``) to CUT the
weighted edge frame (edges ⋈ out-degree) ONCE before the superstep
loop: left lazy, Catalyst re-evaluated the degree groupBy + join inside
every superstep's message join — 10 recomputes of an invariant frame.
At sf0.1 that fix measured 31.4 s -> 11.2 s cold for the 10-superstep
run. This rehearsal re-runs the round-5 protocol (1M vertices, ~40M
directed edges, deterministic xxhash64 generator — the identical graph
recipe behind BASELINE.md's "PageRank (5 supersteps) ... 52.0 s" row)
so the improvement is recorded at rehearsal scale too, with the same
distributed verification (Σrank exactness: integer µ-unit PageRank
conserves total mass exactly; any drift means a lost/duplicated
message).

Usage: python tools/round9_kernel_rehearsal.py [n_vertices] [n_edges]
(defaults 1_000_000, 20_000_000 base pairs -> ~40M directed).
Results recorded in BASELINE.md round-9 section.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_database_akkatyped_spark.operators.algos import pagerank_frame
from graph_database_akkatyped_spark.session import get_spark


def main() -> None:
    n_v = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_e = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    spark = get_spark(app_name="round9-kernel-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(n_e).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_v)).alias("a"),
        F.pmod(F.xxhash64(F.col("id") + 1_000_000_007), F.lit(n_v)).alias("b"),
    ).where(F.col("a") != F.col("b"))
    sym = base.unionByName(
        base.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    verts = (
        sym.select(F.col("a").alias("id")).distinct().localCheckpoint(eager=True)
    )
    nv, ne = verts.count(), sym.count()
    print(f"graph: {nv} vertices, {ne} directed edges")

    # Two timed runs: the first pays session JIT/codegen warmup (the
    # round-5 52.0 s record ran AFTER graph_scale_check's CC pass had
    # warmed the session, so the comparable number is the second run).
    # Integer µ-unit PageRank with the 0.15 restart floor conserves a
    # deterministic total; verify distribution-side, no collect beyond
    # scalars.
    for label in ("first(jit-cold)", "warm"):
        t0 = time.perf_counter()
        pr = pagerank_frame(verts, sym, iters=5)
        total = pr.agg(F.sum("rank_e12")).first()[0]
        wall = time.perf_counter() - t0
        print(
            f"pagerank(5 iters) {label}: sum_rank={total / 1e12:.3f} "
            f"(vertices={nv}) wall={wall:.1f}s "
            f"(round-5 pre-fix warm record at this scale: 52.0 s)"
        )


if __name__ == "__main__":
    main()
