"""Round-12 optimization locks.

1. Iterative kernels free superseded cut generations (guide §5,
   round-11 VERDICT #4): executor storage stays O(1) generations per
   kernel run instead of O(rounds) — AND the results remain fully
   readable afterwards (releasing a block a live plan still needs
   would raise "checkpoint block not found" at the collect below,
   so these tests are falsifiable in both directions).
2. The containment verify threads per-doc gram counts from candidate
   generation (round-12 restructure): min-side explode, zero sizes
   joins. (The array_intersect variant was measured slower and
   reverted — see _contain_verify's docstring.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_akkatyped_spark.caching import persistent_rdd_ids
from graph_database_akkatyped_spark.operators.graph_extras import (
    cc_twophase_frame,
    mis_frame,
    mst_boruvka_frame,
)


def _chain_edges(spark, n):
    """Path graph 0-1-...-n (worst case for round counts: many rounds,
    so a per-round block leak is maximally visible)."""
    return spark.range(n).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )


def test_mis_frame_releases_generations(spark):
    sym_src = _chain_edges(spark, 200)
    sym = sym_src.unionByName(
        sym_src.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    verts = spark.range(201).select(F.col("id").alias("v"))
    before = persistent_rdd_ids(spark)
    mis = mis_frame(verts, sym, rounds=40)
    rows = mis.collect()  # must be readable AFTER the releases
    leaked = persistent_rdd_ids(spark) - before
    # Luby on a 200-chain runs several rounds; the old code persisted
    # winners+mis+active per round (3/round). Now only the final mis
    # (and at most a trailing generation) may remain.
    assert len(leaked) <= 3, f"leaked {len(leaked)} cut generations"
    # independence + maximality: no two adjacent picks, no addable vertex
    picked = {r.v for r in rows}
    for v in picked:
        assert v + 1 not in picked
    for v in range(201):
        if v not in picked:
            assert (v - 1 in picked) or (v + 1 in picked)


def test_cc_twophase_releases_generations(spark):
    edges = _chain_edges(spark, 150)
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    verts = spark.range(151).select(F.col("id").alias("id"))
    before = persistent_rdd_ids(spark)
    residual: list = []
    cc = cc_twophase_frame(verts, sym, residual=residual)
    rows = cc.collect()
    assert {r.component for r in rows} == {0}  # one chain, one component
    assert len(rows) == 151
    leaked = persistent_rdd_ids(spark) - before
    # per round the kernel cuts e1+e2 (2/round, O(log² n) rounds); only
    # the final fixed-point edge set may remain — and the caller can
    # free even that through ``residual`` once it has consumed the
    # labeling (collect() above did).
    assert len(leaked) <= 2, f"leaked {len(leaked)} cut generations"
    assert len(residual) == 1


def test_mst_boruvka_releases_generations(spark):
    # weighted path: unique max spanning forest = all edges
    edges = _chain_edges(spark, 100).select(
        "a", "b", (F.col("a") % 7 + 1).cast("long").alias("weight")
    )
    before = persistent_rdd_ids(spark)
    forest = mst_boruvka_frame(edges)
    rows = forest.collect()
    assert len(rows) == 100  # spanning tree of a 101-vertex path
    leaked = persistent_rdd_ids(spark) - before
    # per round the old code persisted xe+sel+comp plus the inner CC's
    # e/e1/e2 per CC round. Now only the per-round sel picks (tiny,
    # referenced by the returned forest until materialized) survive —
    # Borůvka on a chain halves components per round: ~7 rounds.
    assert len(leaked) <= 10, f"leaked {len(leaked)} cut generations"


def test_jaccard_pair_frames_thread_sizes(spark):
    """Round-12: `_ngram_pairs` and `dedup_incremental` thread the
    per-doc gram count through the signature aggregate and the band
    join, so their verify subtrees contain NO per-doc sizes joins —
    exactly three joins each: the (k, mh) band join plus the two gram
    probes (the old shape had five; the two sizes joins are gone).
    Row-level parity for both keys lives in test_oracle_parity."""
    from graph_database_akkatyped_spark.caching import clear_frame_cache
    from graph_database_akkatyped_spark.operators.llm import (
        _ngram_pairs,
        dedup_incremental,
    )
    from tests.conftest import SF_SMOKE

    clear_frame_cache(SF_SMOKE)
    for frame in (
        _ngram_pairs(spark, SF_SMOKE),
        dedup_incremental(spark, SF_SMOKE),
    ):
        plan = frame._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Join") == 3, plan


def test_contain_verify_threads_sizes(spark):
    """The round-12 containment verify: candidates arrive with their
    per-doc gram counts (a, b, n_a, n_b), so the verify contains NO
    join against a per-doc sizes frame — the small-side ordering is a
    projection and the ratios read aggregated columns (VERDICT r11 #1:
    the +4 pre-explode SMJ are gone). Exactly two joins remain in the
    subtree: the (sdoc)/(mdoc, g) gram probes of the min-side explode.
    Semantics locked on a synthetic corpus, including the asymmetric-
    size orientation (n_a/n_b must follow a/b, not sdoc/mdoc); the
    registered keys' row-level parity lives in test_oracle_parity."""
    from graph_database_akkatyped_spark.operators.llm import _contain_verify

    grams = spark.createDataFrame(
        [(0, "x"), (0, "y"), (1, "x"), (1, "y"), (1, "z"), (2, "q"),
         (3, "x")],
        "doc_id long, g string",
    )
    cand = spark.createDataFrame(
        [(0, 1, 2, 3), (0, 2, 2, 1), (1, 3, 3, 1)],
        "a long, b long, n_a long, n_b long",
    )
    out = _contain_verify(cand, grams)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # two gram probes, zero sizes joins (the old shape had four)
    assert plan.count("Join") == 2, plan
    rows = {(r.a, r.b): r for r in out.collect()}
    # (0,1): |A∩B|=2, C(A in B)=2/2=1.0, C(B in A)=2/3 — survives
    # (0,2): |A∩B|=0 — empty intersection never reaches the filter
    # (1,3): |A∩B|=1, small side is b (n_b=1): C(B in A)=1/1 — survives
    #        and the orientation must report n_a=3's ratio as 1/3
    assert set(rows) == {(0, 1), (1, 3)}
    r = rows[(0, 1)]
    assert r.n_common == 2
    assert r.contain_a_in_b == pytest.approx(1.0)
    assert r.contain_b_in_a == pytest.approx(2.0 / 3.0)
    r13 = rows[(1, 3)]
    assert r13.n_common == 1
    assert r13.contain_a_in_b == pytest.approx(1.0 / 3.0)
    assert r13.contain_b_in_a == pytest.approx(1.0)


def test_lp_count_only_wedge_matches_shared_frame(spark):
    """Round-12 link-predict split (guide §2.3, VERDICT r11 #5): the
    Jaccard key scores a count-only wedge (no d_z join, (x, y)-only
    wedge rows). The candidate pair set and every cn value must be
    IDENTICAL to the shared _lp_candidates frame's (x, y, cn)
    projection — the optimization drops an unused payload column, it
    must never change what gets counted."""
    from graph_database_akkatyped_spark.operators.graph_extras import (
        _lp_candidates,
        _lp_candidates_cn,
    )

    sf = "/root/testdata/sf0.001"
    full = {
        (r.x, r.y): r.cn
        for r in _lp_candidates(spark, sf).select("x", "y", "cn").collect()
    }
    cn_only = {
        (r.x, r.y): r.cn for r in _lp_candidates_cn(spark, sf).collect()
    }
    assert cn_only == full
    # and the count-only plan really has no d_z lookup: one wedge
    # equi-join plus the ce anti-join, nothing else
    plan = (
        _lp_candidates_cn(spark, sf)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Join") == 2, plan
