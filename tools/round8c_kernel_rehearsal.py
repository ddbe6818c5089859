"""Round-8c kernel rehearsal: ANF (approximate neighborhood function)
at the 1M-vertex rehearsal size — the newest sketch kernel, measured
instead of asserted-linear.

Graph: the deterministic planted-partition graph of the round-7/8
rehearsals (hash-of-sequence-id, no RNG state). ANF propagates 8
Flajolet-Martin bitmasks 2 rounds (bit_or aggregate — order-free), so
the kernel is two edge-join + groupBy passes over |E| rows carrying a
constant 8x64-bit payload per vertex.

Verification (distributed, same discipline as the MIS/kcore
rehearsals): on a deterministic ~1/4096 vertex sample, the EXACT 2-hop
neighborhood size is computed by two frontier joins; the rehearsal
passes iff the aggregate estimate lands within 2x of the exact
aggregate AND at least 80% of sampled vertices land within 4x
individually (8 sketches: per-vertex sigma ~ 0.42 in log2; the
aggregate must be far tighter).

Usage: python tools/round8c_kernel_rehearsal.py [n_vertices] [n_edges]
Results recorded in BASELINE.md next to the round-8 rehearsals.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_database_akkatyped_spark.operators.graph_extras import anf_frame
from graph_database_akkatyped_spark.session import get_spark
from tools.round7_kernel_rehearsal import planted_graph

SAMPLE_MOD = 4096


def main() -> None:
    n_v = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_e = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    spark = get_spark(app_name="round8c_kernel_rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    edges = planted_graph(spark, n_v, n_e).distinct()
    edges.write.mode("overwrite").format("noop").save()  # materialize input
    verts = spark.range(n_v).select(F.col("id"))

    t0 = time.perf_counter()
    est = anf_frame(verts, edges)
    est.write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    print(f"ANF: {n_v:,} vertices / ~{n_e:,} directed edges "
          f"(distinct sym: {edges.count():,}) -> {wall:.1f} s")

    # exact 2-hop on the deterministic sample
    sample = verts.where(F.pmod(F.col("id"), F.lit(SAMPLE_MOD)) == 0).select(
        F.col("id").alias("seed")
    )
    hop1 = (
        edges.join(sample.withColumnRenamed("seed", "a"), "a")
        .select(F.col("a").alias("seed"), F.col("b").alias("v"))
        .unionByName(sample.select("seed", F.col("seed").alias("v")))
        .distinct()
    )
    hop2 = (
        hop1.join(edges.withColumnRenamed("a", "v"), "v")
        .select("seed", F.col("b").alias("v"))
        .unionByName(hop1)
        .distinct()
    )
    exact = hop2.groupBy("seed").agg(F.count(F.lit(1)).alias("exact_n"))
    joined = exact.join(
        est.where(F.pmod(F.col("v"), F.lit(SAMPLE_MOD)) == 0),
        exact["seed"] == est["v"],
    ).select("seed", "exact_n", "est_ppm")
    rows = joined.collect()  # O(n_v / SAMPLE_MOD) rows only
    assert rows, "empty sample"
    est_total = sum(r.est_ppm for r in rows) / 1e6
    exact_total = sum(r.exact_n for r in rows)
    agg_ratio = est_total / exact_total
    within4 = sum(
        1 for r in rows if r.exact_n / 4 <= r.est_ppm / 1e6 <= r.exact_n * 4
    ) / len(rows)
    print(f"sampled {len(rows)} vertices: aggregate est/exact = "
          f"{agg_ratio:.3f}, within-4x fraction = {within4:.3f}")
    assert 0.5 <= agg_ratio <= 2.0, agg_ratio
    assert within4 >= 0.8, within4
    print("ANF rehearsal PASSED")


if __name__ == "__main__":
    main()
