"""Pregel kernel scale check: run CC and PageRank on a deterministic
pseudo-random graph far larger than the fixtures (default 100k vertices,
1M undirected edges) and report supersteps + wall time. Records evidence
that the kernel's checkpoint/frontier discipline holds beyond toy sizes.

Usage: python tools/graph_scale_check.py [n_vertices] [n_edges]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_database_akkatyped_spark.operators.algos import cc_frame, pagerank_frame
from graph_database_akkatyped_spark.session import get_spark


def main() -> None:
    n_v = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_e = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark(app_name="graph-scale-check")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic pseudo-random edges from hashed sequence ids
    base = spark.range(n_e).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_v)).alias("a"),
        F.pmod(F.xxhash64(F.col("id") + 1_000_000_007), F.lit(n_v)).alias("b"),
    ).where(F.col("a") != F.col("b"))
    sym = base.unionByName(
        base.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    verts = sym.select(F.col("a").alias("id")).distinct().localCheckpoint(eager=True)
    nv, ne = verts.count(), sym.count()
    print(f"graph: {nv} vertices, {ne} directed edges")

    t0 = time.perf_counter()
    cc = cc_frame(verts, sym)
    n_comp = cc.select("component").distinct().count()
    print(f"cc: {n_comp} components in {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    pr = pagerank_frame(verts, sym, iters=5)
    total = pr.agg(F.sum("rank_e12")).first()[0]
    print(
        f"pagerank(5 iters): sum_rank={total / 1e12:.3f} "
        f"(<= {nv}) in {time.perf_counter() - t0:.1f}s"
    )


if __name__ == "__main__":
    main()
