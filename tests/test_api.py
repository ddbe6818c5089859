"""GraphDB facade: event-sourced mutations, replayed reads, analytics
(the reference's AddNode/AddEdge/GetNode/Traverse surface)."""

from __future__ import annotations

import tempfile

import pytest

from graph_database_akkatyped_spark.api import GraphDB


@pytest.fixture()
def db(spark):
    return GraphDB(spark, tempfile.mkdtemp(prefix="graphdb_"))


def test_crud_roundtrip(db):
    db.add_vertices([("c:1", "customer", "Ann"), ("c:2", "customer", "Bob"),
                     ("p:1", "part", "widget")])
    db.add_edges([("c:1", "p:1", "bought", 10.0), ("c:2", "p:1", "bought", 5.0)])
    assert db.vertices().count() == 3
    assert db.get_vertex("c:1").collect()[0]["name"] == "Ann"
    nb = db.neighbors("c:1").collect()
    assert len(nb) == 1 and nb[0]["dst"] == "p:1" and nb[0]["name"] == "widget"


def test_upsert_and_tombstone(db):
    db.add_vertices([("v:1", "k", "old")])
    db.add_vertices([("v:1", "k", "new")])  # upsert wins by batch seq
    assert db.get_vertex("v:1").collect()[0]["name"] == "new"
    db.remove_vertex("v:1")
    assert db.get_vertex("v:1").count() == 0


def test_compact_preserves_state(db):
    db.add_vertices([("a", "k", "x"), ("b", "k", "y")])
    db.add_edges([("a", "b", "r", 1.0)])
    db.remove_vertex("b")
    # edge (a,b) is hidden once its endpoint dies (vertex-owned adjacency)
    assert db.edges().count() == 0
    before_v = sorted(r["id"] for r in db.vertices().collect())
    db.compact()
    after_v = sorted(r["id"] for r in db.vertices().collect())
    assert before_v == after_v == ["a"]
    assert db.edges().count() == 0


def test_mutations_after_compact(db):
    db.add_vertices([("a", "k", "x")])
    db.compact()
    db.add_vertices([("b", "k", "y"), ("a", "k", "x2")])  # replay spans snapshot + new batches
    names = {r["id"]: r["name"] for r in db.vertices().collect()}
    assert names == {"a": "x2", "b": "y"}
    db.remove_vertex("a")
    db.compact()
    assert [r["id"] for r in db.vertices().collect()] == ["b"]


def test_readd_does_not_resurrect_edges(db):
    # remove_vertex tombstones incident edges in the JOURNAL, so replay
    # is compaction-invariant: re-adding the same id must not revive old
    # adjacency whether or not compact() ran in between
    db.add_vertices([("a", "k", "x"), ("b", "k", "y")])
    db.add_edges([("a", "b", "r", 1.0), ("b", "a", "r", 2.0)])
    db.remove_vertex("b")
    db.add_vertices([("b", "k", "y2")])  # re-add WITHOUT compaction
    assert db.edges().count() == 0
    db.compact()
    assert db.edges().count() == 0  # same state post-compaction


def test_analytics_on_mutated_graph(db):
    # two triangles bridged after a later mutation
    for v in "abcdef":
        db.add_vertices([(v, "n", v.upper())])
    db.add_edges([("a", "b", "r", 1.0), ("b", "c", "r", 1.0), ("a", "c", "r", 1.0)])
    db.add_edges([("d", "e", "r", 1.0), ("e", "f", "r", 1.0), ("d", "f", "r", 1.0)])
    cc = {r["id"]: r["component"] for r in db.connected_components().collect()}
    assert len(set(cc.values())) == 2
    db.add_edges([("c", "d", "bridge", 1.0)])
    cc2 = {r["id"]: r["component"] for r in db.connected_components().collect()}
    assert len(set(cc2.values())) == 1
    lv = {r["id"]: r["level"] for r in db.bfs("a").collect()}
    assert lv["d"] == 2 and lv["e"] == 3
    pr = db.pagerank(iters=5)
    assert pr.count() == 6


def test_single_writer_lock(db):
    """A second writer attempting a mutation while the lock is held must
    fail loudly (ConcurrentWriterError), never interleave batches; a
    released/stale lock is recoverable via force_unlock."""
    from graph_database_akkatyped_spark.api import ConcurrentWriterError

    db.add_vertices([("v:1", "k", "a")])  # lock acquired + released per call
    with db._write_lock():
        with pytest.raises(ConcurrentWriterError):
            db.add_vertices([("v:2", "k", "b")])
    # lock released on exit -> mutations work again
    db.add_vertices([("v:2", "k", "b")])
    assert db.vertices().count() == 2
    # simulate a crashed writer: stale lock file blocks, force_unlock clears
    import os

    os.close(os.open(db._lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
    with pytest.raises(ConcurrentWriterError):
        db.add_vertices([("v:3", "k", "c")])
    db.force_unlock()
    db.add_vertices([("v:3", "k", "c")])
    assert db.vertices().count() == 3


def test_time_travel_reads(db):
    """as-of reads replay only the journal prefix: state at batch b
    excludes later upserts, tombstones, and edges."""
    db.add_vertices([("v:1", "k", "one")])
    db.add_vertices([("v:2", "k", "two")])
    batches = [r["batch"] for r in db.batches().collect()]
    assert len(batches) == 2
    t1 = batches[0]
    # as of t1 only v:1 exists
    assert [r["id"] for r in db.vertices(as_of_batch=t1).collect()] == ["v:1"]
    # later tombstone doesn't exist in the past
    db.remove_vertex("v:1")
    assert db.vertices().where("id = 'v:1'").count() == 0
    assert db.vertices(as_of_batch=t1).where("id = 'v:1'").count() == 1
    # edges respect the same as-of horizon
    db.add_vertices([("v:3", "k", "three")])
    db.add_edges([("v:2", "v:3", "rel", 1.0)])
    full_edges = db.edges().count()
    assert full_edges == 1
    assert db.edges(as_of_batch=t1).count() == 0


def test_history_and_compaction_horizon(db):
    db.add_vertices([("v:1", "k", "first")])
    db.add_vertices([("v:1", "k", "renamed")])
    hist = db.history("v:1").collect()
    assert [r["name"] for r in hist] == ["first", "renamed"]
    assert all(r["op"] == "upsert" for r in hist)
    # compaction folds history: one snapshot event survives, and the
    # latest state is what it preserves
    db.compact()
    hist2 = db.history("v:1").collect()
    assert len(hist2) == 1 and hist2[0]["name"] == "renamed"


def test_find_motif_on_live_state(db):
    db.add_vertices([("c:1", "c", "x"), ("c:2", "c", "y"), ("p:1", "p", "z")])
    db.add_edges([("c:1", "p:1", "bought", 1.0), ("c:2", "p:1", "bought", 2.0)])
    pairs = db.find("(a)-[:bought]->(p); (b)-[:bought]->(p)").where("a < b")
    got = pairs.collect()
    assert len(got) == 1
    assert (got[0]["a"], got[0]["b"], got[0]["p"]) == ("c:1", "c:2", "p:1")
    # tombstoning the shared part removes the motif match
    db.remove_vertex("p:1")
    assert db.find("(a)-[:bought]->(p); (b)-[:bought]->(p)").count() == 0


def test_round4b_analytics_facade(db):
    """hits/scc/shortest_path_len/reciprocity over live mutated state."""
    db.add_vertices([(v, "k", v) for v in ("a", "b", "c", "d", "e")])
    db.add_edges(
        [
            ("a", "b", "r", 1.0),
            ("b", "a", "r", 1.0),  # reciprocal pair
            ("b", "c", "r", 1.0),
            ("c", "d", "r", 1.0),
        ]
    )
    rec = db.reciprocity().collect()[0]
    assert rec["m_edges"] == 4 and rec["m_reciprocal"] == 2
    assert abs(rec["reciprocity"] - 0.5) < 1e-12

    hits = {r["id"]: r for r in db.hits().collect()}
    assert len(hits) == 5 and hits["e"]["hub"] == 0  # isolated vertex

    scc = {r["id"]: r["scc_id"] for r in db.scc().collect()}
    assert scc["a"] == scc["b"] != scc["c"]  # {a,b} cycle; c,d singletons

    d_ab = db.shortest_path_len("a", "d").collect()[0]
    assert d_ab["dist"] == 3
    d_ae = db.shortest_path_len("a", "e").collect()[0]
    assert d_ae["dist"] == -1  # disconnected

    # tombstone invalidates the reciprocal pair; analytics track state
    db.remove_edge("b", "a", "r")
    rec2 = db.reciprocity().collect()[0]
    assert rec2["m_edges"] == 3 and rec2["m_reciprocal"] == 0
