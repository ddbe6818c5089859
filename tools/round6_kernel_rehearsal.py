"""Round-6 kernel rehearsal: Luby MIS on a graph three orders of
magnitude past the fixtures — the same deterministic pseudo-random
generator as tools/graph_scale_check.py (hashed sequence ids), default
1M vertices / 20M directed edges.

Beyond wall time, the run VERIFIES the result distributedly:
independence (no edge joins two members — an equi-join count, not a
sample) and maximality (every non-member has a member neighbor).

Usage: python tools/round6_kernel_rehearsal.py [n_vertices] [n_edges]
Results recorded in BASELINE.md next to the round-5 1M-vertex
CC/PageRank/SCC/betweenness rehearsal.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_database_akkatyped_spark.operators.graph_extras import mis_frame
from graph_database_akkatyped_spark.session import get_spark


def main() -> None:
    n_v = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_e = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    spark = get_spark(app_name="round6-kernel-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(n_e).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_v)).alias("a"),
        F.pmod(F.xxhash64(F.col("id") + 1_000_000_007), F.lit(n_v)).alias("b"),
    ).where(F.col("a") != F.col("b"))
    sym = base.unionByName(
        base.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    verts = (
        spark.range(n_v).select(F.col("id").alias("v")).localCheckpoint(True)
    )
    nv, ne = verts.count(), sym.count()
    print(f"graph: {nv} vertices, {ne} directed edges")

    t0 = time.perf_counter()
    mis = mis_frame(verts, sym, rounds=24).localCheckpoint(eager=True)
    n_mis = mis.count()
    wall = time.perf_counter() - t0
    print(f"luby mis: |MIS|={n_mis} in {wall:.1f}s")

    # independence: no symmetric edge joins two members
    viol = (
        sym.join(mis.select(F.col("v").alias("a")), "a")
        .join(mis.select(F.col("v").alias("b")), "b")
        .count()
    )
    print(f"independence violations: {viol}")
    assert viol == 0
    # maximality: every non-member sees a member
    nonm = verts.join(mis, "v", "left_anti")
    uncovered = (
        nonm.join(
            sym.join(mis.select(F.col("v").alias("a")), "a")
            .select(F.col("b").alias("v"))
            .distinct(),
            "v",
            "left_anti",
        ).count()
    )
    print(f"uncovered non-members: {uncovered}")
    assert uncovered == 0
    print("mis verified: independent and maximal")


if __name__ == "__main__":
    main()
