"""Algorithm unit tests on tiny hand-built graphs with known answers
(SURVEY.md §5.3): diamond BFS, two triangles, weighted path SSSP."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_akkatyped_spark.operators.pregel import pregel


def _sym(edges):
    return edges + [(b, a, w) for a, b, w in edges]


def test_pregel_sssp_weighted_path(spark):
    # path 0 -1-> 1 -2-> 2 -3-> 3 -4-> 4, plus shortcut 0 -9-> 3
    edges = spark.createDataFrame(
        _sym([(0, 1, 1), (1, 2, 2), (2, 3, 3), (3, 4, 4), (0, 3, 9)]),
        "src long, dst long, weight long",
    )
    verts = spark.createDataFrame(
        [(i,) for i in range(5)], "id long"
    ).select("id", F.when(F.col("id") == 0, F.lit(0).cast("long")).alias("state"))
    res = pregel(
        verts,
        edges,
        msg=F.col("src_state") + F.col("weight"),
        agg=F.min("msg"),
        vprog=F.least(F.col("state"), F.col("agg_msg")),
        max_iter=10,
    )
    dists = {r["id"]: r["state"] for r in res.vertices.collect()}
    assert dists == {0: 0, 1: 1, 2: 3, 3: 6, 4: 10}
    assert res.converged


def test_pregel_cc_two_components(spark):
    # two disjoint triangles {0,1,2} and {10,11,12}
    tri1 = [(0, 1, 1), (1, 2, 1), (0, 2, 1)]
    tri2 = [(10, 11, 1), (11, 12, 1), (10, 12, 1)]
    edges = spark.createDataFrame(
        _sym(tri1 + tri2), "src long, dst long, weight long"
    )
    verts = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 10, 11, 12)], "id long"
    ).select("id", F.col("id").alias("state"))
    res = pregel(
        verts,
        edges,
        msg=F.col("src_state"),
        agg=F.min("msg"),
        vprog=F.least(F.col("state"), F.col("agg_msg")),
        max_iter=20,
    )
    comp = {r["id"]: r["state"] for r in res.vertices.collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}


def test_kcore_peels_pendant(spark):
    # triangle {0,1,2} is a 2-core; pendant 3-0 must be peeled
    from graph_database_akkatyped_spark.operators.algos import kcore_frame

    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0), (0, 3), (3, 0)],
        "a long, b long",
    )
    core = {r["id"]: r["degree"] for r in kcore_frame(edges, k=2).collect()}
    assert core == {0: 2, 1: 2, 2: 2}


def test_pregel_bfs_diamond(spark):
    # diamond: 0 -> 1,2 -> 3 ; unweighted levels via min-propagation
    edges = spark.createDataFrame(
        _sym([(0, 1, 1), (0, 2, 1), (1, 3, 1), (2, 3, 1)]),
        "src long, dst long, weight long",
    )
    verts = spark.createDataFrame([(i,) for i in range(4)], "id long").select(
        "id", F.when(F.col("id") == 0, F.lit(0).cast("long")).alias("state")
    )
    res = pregel(
        verts,
        edges,
        msg=F.col("src_state") + 1,
        agg=F.min("msg"),
        vprog=F.least(F.col("state"), F.col("agg_msg")),
        max_iter=10,
    )
    lvl = {r["id"]: r["state"] for r in res.vertices.collect()}
    assert lvl == {0: 0, 1: 1, 2: 1, 3: 2}


def test_truss_keeps_clique_and_peels_cascade(spark):
    """4-truss ground truths: a 4-clique survives whole (every edge in
    2 triangles); two triangles sharing one edge cascade to empty —
    the shared edge has support 2 only until its neighbors peel."""
    from graph_database_akkatyped_spark.operators.algos import truss_frame

    def edges(pairs):
        return spark.createDataFrame(sorted(pairs), "a long, b long")

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    kept = truss_frame(edges(clique)).collect()
    assert sorted((r["a"], r["b"]) for r in kept) == sorted(clique)

    bowtie = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]  # T(0,1,2)+T(1,2,3)
    assert truss_frame(edges(bowtie)).count() == 0

    # clique + pendant cascade together: clique stays, cascade dies
    both = clique + [(10, 11), (10, 12), (11, 12), (11, 13), (12, 13)]
    kept = truss_frame(edges(both)).collect()
    assert sorted((r["a"], r["b"]) for r in kept) == sorted(clique)
