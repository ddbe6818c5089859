"""Unit tests for the motif pattern compiler (operators.motif.find)
on hand-built edge frames — pattern parsing, joins, anonymous
vertices, rel filters, and negation semantics."""

from __future__ import annotations

import pytest

from graph_database_akkatyped_spark.operators.motif import find


def _edges(spark, rows, with_attrs=False):
    if with_attrs:
        return spark.createDataFrame(rows, ["src", "dst", "rel", "weight"])
    return spark.createDataFrame(rows, ["src", "dst"])


def test_triangle_pattern(spark):
    # directed triangle 1->2->3->1 plus a dangling edge
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    got = find(e, "(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)").collect()
    assert len(got) == 3  # the 3 rotations of the one triangle
    assert all(sorted((r["a"], r["b"], r["c"])) == [1, 2, 3] for r in got)


def test_anonymous_vertex_and_edge_attrs(spark):
    e = _edges(
        spark,
        [("c:1", "p:1", "bought", 5.0), ("c:1", "s:1", "sourced", 2.0)],
        with_attrs=True,
    )
    got = find(e, "(a)-[e:bought]->()").collect()
    assert len(got) == 1
    r = got[0]
    assert r["a"] == "c:1" and r["e_rel"] == "bought" and r["e_weight"] == 5.0
    assert "__anon1" not in got[0].asDict()


def test_rel_filter_restricts(spark):
    e = _edges(
        spark,
        [("c:1", "p:1", "bought", 1.0), ("c:2", "s:1", "sourced", 1.0)],
        with_attrs=True,
    )
    assert find(e, "(a)-[:bought]->(b)").count() == 1
    assert find(e, "(a)-[:sourced]->(b)").count() == 1
    assert find(e, "(a)-[]->(b)").count() == 2


def test_negation_excludes_reciprocal(spark):
    e = _edges(spark, [(1, 2), (2, 1), (1, 3)])
    got = find(e, "(a)-[]->(b); !(b)-[]->(a)").collect()
    assert [(r["a"], r["b"]) for r in got] == [(1, 3)]


def test_vee_join_binds_shared_vertex(spark):
    e = _edges(spark, [(1, 9), (2, 9), (3, 8)])
    got = find(e, "(a)-[]->(s); (b)-[]->(s)")
    # pairs on s=9: (1,1),(1,2),(2,1),(2,2); s=8: (3,3)
    assert got.count() == 5
    assert got.where("a < b").count() == 1


def test_parse_errors(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        find(e, "(a)-[x]-(b)")  # undirected not supported
    with pytest.raises(ValueError):
        find(e, "!(a)-[]->(b)")  # negation with unbound vertices
    with pytest.raises(ValueError):
        find(e, "(a)-[e:rel]->(b)") if "rel" not in e.columns else None


def test_cosupplied_combinatorial_equals_enumerated(spark):
    """The registered C(n,2) aggregate must equal the raw motif-join
    enumeration — the identity that lets the registered plan skip pair
    materialization entirely."""
    from graph_database_akkatyped_spark.operators.motif import (
        motif_cosupplied_enumerated,
        motif_find_cosupplied,
    )

    sf = "/root/testdata/sf0.001"
    fast = {r["s"]: r["n_pairs"] for r in motif_find_cosupplied(spark, sf).collect()}
    slow = {r["s"]: r["n_pairs"] for r in motif_cosupplied_enumerated(spark, sf).collect()}
    assert fast == slow and len(fast) > 0
