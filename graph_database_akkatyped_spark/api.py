"""User-facing GraphDB API — the reference's command surface on Spark.

Reference lifecycle [R]: clients send AddNode/AddEdge commands; each
vertex actor persists events to a journal (event sourcing) and answers
GetNode / Traverse asks from replayed state. The Spark-native analog is
the lakehouse event-log pattern:

- **mutations append** parquet event batches to a journal directory
  (append-only, partition-friendly — exactly how a 100 TB ingest works);
- **state is a replay**: latest event per key wins (window by batch
  seq), tombstones drop deleted entities;
- **compaction** folds the journal into a snapshot so replay cost stays
  O(live data), the Spark analog of Akka Persistence snapshots.

Reads and algorithms are plain DataFrame plans over the replayed state,
so everything composes with the operators/ modules (Pregel, BFS, ...).

Example::

    db = GraphDB(spark, "/tmp/mydb")
    db.add_vertices([("c:1", "customer", "Customer#1")])
    db.add_edges([("c:1", "p:9", "bought", 42.0)])
    db.get_vertex("c:1").show()
    db.pagerank().show()
"""

from __future__ import annotations

import os
import time
from collections.abc import Iterable
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from graph_database_akkatyped_spark.operators.algos import (
    bfs_frame,
    cc_frame,
    pagerank_frame,
)

_V_SCHEMA = "id string, kind string, name string, op string, batch long"
_E_SCHEMA = "src string, dst string, rel string, weight double, op string, batch long"


class ConcurrentWriterError(RuntimeError):
    """A second writer attempted a mutation while another held the
    journal write lock."""


class GraphDB:
    """Concurrency model — SINGLE WRITER, many readers.

    In the reference pattern, each vertex actor's mailbox serializes its
    mutations; the journal analog here serializes at the whole-DB level:
    ``batch`` ids (time_ns at append time) order events, and replay
    takes the latest batch per key, which is only correct if batches
    never interleave. Every mutation (add/remove/compact) therefore
    takes an exclusive lock file (O_CREAT|O_EXCL — atomic on POSIX and
    on object-store FUSE mounts that honor exclusive create) for the
    duration of the append; a concurrent mutation raises
    :class:`ConcurrentWriterError` instead of silently corrupting batch
    order. Readers never lock: parquet appends are atomic at file
    granularity, so a read sees a consistent prefix of the journal.
    ``compact()`` additionally requires that NO reader holds a plan over
    the journal while it swaps directories — schedule it off-path, as
    its docstring says. If a writer dies holding the lock, remove the
    stale ``journal/.write_lock`` manually (:meth:`force_unlock`)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._vdir = os.path.join(path, "journal", "vertices")
        self._edir = os.path.join(path, "journal", "edges")
        self._lock_path = os.path.join(path, "journal", ".write_lock")
        os.makedirs(self._vdir, exist_ok=True)
        os.makedirs(self._edir, exist_ok=True)

    # ------------------------------------------------------------ commands

    @contextmanager
    def _write_lock(self):
        try:
            fd = os.open(self._lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise ConcurrentWriterError(
                f"another writer holds {self._lock_path}; GraphDB is "
                "single-writer (see class docstring). If the previous "
                "writer crashed, call force_unlock()."
            ) from None
        try:
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            yield
        finally:
            os.unlink(self._lock_path)

    def force_unlock(self) -> None:
        """Remove a stale write lock left by a crashed writer. Only call
        when you KNOW no other writer is alive."""
        if os.path.exists(self._lock_path):
            os.unlink(self._lock_path)

    def _append_unlocked(self, rows: list, schema: str, dest: str) -> None:
        df = self.spark.createDataFrame(rows, schema)
        df.write.mode("append").parquet(dest)

    def _append(self, rows: list, schema: str, dest: str) -> None:
        with self._write_lock():
            self._append_unlocked(rows, schema, dest)

    def add_vertices(self, rows: Iterable[tuple]) -> None:
        """rows: (id, kind, name). Reference: AddNode command."""
        batch = time.time_ns()
        self._append(
            [(i, k, n, "upsert", batch) for i, k, n in rows], _V_SCHEMA, self._vdir
        )

    def remove_vertex(self, vid: str) -> None:
        """Tombstone a vertex AND its incident edges.

        Adjacency dies with the vertex (it is vertex-actor state in the
        reference), and that must hold in the *journal*, not just the
        read path: if only the read path filtered by live endpoints, a
        later re-add of the same id would silently resurrect old edges —
        unless compact() had run in between, which would drop them
        permanently. Appending explicit edge deletes makes replay
        compaction-invariant. The incident-edge fetch is a point lookup
        on one vertex id (OLTP-sized), not a scan."""
        with self._write_lock():  # one lock spans both appends: the
            # edge-tombstone + vertex-tombstone pair must not interleave
            # with another writer's re-add of the same id
            incident = (
                self.edges()
                .where((F.col("src") == vid) | (F.col("dst") == vid))
                .select("src", "dst", "rel")
                .collect()
            )
            batch = time.time_ns()
            if incident:
                self._append_unlocked(
                    [
                        (r.src, r.dst, r.rel, None, "delete", batch)
                        for r in incident
                    ],
                    _E_SCHEMA,
                    self._edir,
                )
            self._append_unlocked(
                [(vid, None, None, "delete", batch)], _V_SCHEMA, self._vdir
            )

    def add_edges(self, rows: Iterable[tuple]) -> None:
        """rows: (src, dst, rel, weight). Reference: AddEdge command."""
        batch = time.time_ns()
        self._append(
            [(s, d, r, float(w), "upsert", batch) for s, d, r, w in rows],
            _E_SCHEMA,
            self._edir,
        )

    def remove_edge(self, src: str, dst: str, rel: str) -> None:
        self._append(
            [(src, dst, rel, None, "delete", time.time_ns())], _E_SCHEMA, self._edir
        )

    # -------------------------------------------------------------- replay

    @staticmethod
    def _latest(df: DataFrame, keys: list[str]) -> DataFrame:
        w = Window.partitionBy(*keys).orderBy(F.col("batch").desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where((F.col("_rn") == 1) & (F.col("op") != "delete"))
            .drop("_rn", "op", "batch")
        )

    def _read_journal(self, dest: str, schema: str) -> DataFrame:
        if any(f.endswith(".parquet") for f in os.listdir(dest)):
            return self.spark.read.schema(schema).parquet(dest)
        return self.spark.createDataFrame([], schema)

    @staticmethod
    def _as_of(df: DataFrame, as_of_batch: int | None) -> DataFrame:
        return df if as_of_batch is None else df.where(
            F.col("batch") <= as_of_batch
        )

    def vertices(self, as_of_batch: int | None = None) -> DataFrame:
        """Live vertices; with ``as_of_batch`` set, the state as it was
        after that journal batch — time travel is just replay with the
        suffix filtered out, the event-sourcing feature the journal
        layout buys for free. NOTE: ``compact()`` rewrites history into
        one snapshot batch, so as-of points older than the last
        compaction are gone (same contract as Akka snapshot deletion)."""
        return self._latest(
            self._as_of(self._read_journal(self._vdir, _V_SCHEMA), as_of_batch),
            ["id"],
        )

    def edges(self, as_of_batch: int | None = None) -> DataFrame:
        """Live edges (optionally as of a journal batch). Both endpoints
        must be live vertices — in the reference, adjacency is
        vertex-actor state and dies with the vertex, so a tombstoned
        vertex implicitly drops its edges."""
        e = self._latest(
            self._as_of(self._read_journal(self._edir, _E_SCHEMA), as_of_batch),
            ["src", "dst", "rel"],
        )
        live = self.vertices(as_of_batch).select("id")
        return (
            e.join(live.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(live.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst", "rel", "weight")
        )

    def batches(self) -> DataFrame:
        """Distinct journal batch ids with event counts — the valid
        as-of points for :meth:`vertices` / :meth:`edges` time travel."""
        v = self._read_journal(self._vdir, _V_SCHEMA).select("batch")
        e = self._read_journal(self._edir, _E_SCHEMA).select("batch")
        return (
            v.unionByName(e)
            .groupBy("batch")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .orderBy("batch")
        )

    def history(self, vid: str) -> DataFrame:
        """Full event history of one vertex (the event-sourced audit
        ask: every upsert/tombstone in batch order). Point read —
        at scale, partition the journal by id-bucket so this prunes."""
        return (
            self._read_journal(self._vdir, _V_SCHEMA)
            .where(F.col("id") == vid)
            .orderBy("batch")
        )

    def compact(self) -> None:
        """Fold the journal into a single latest-state batch (snapshot).

        At scale this is the maintenance job that keeps replay cost
        O(live state); run it partition-by-partition off the write path.
        Holds the write lock for its whole duration (snapshot + swap):
        a mutation landing between the snapshot read and the directory
        swap would be silently dropped.
        """
        with self._write_lock():
            batch = time.time_ns()
            v = self.vertices().withColumn("op", F.lit("upsert")).withColumn(
                "batch", F.lit(batch)
            )
            e = self.edges().withColumn("op", F.lit("upsert")).withColumn(
                "batch", F.lit(batch)
            )
            vtmp, etmp = self._vdir + ".tmp", self._edir + ".tmp"
            v.select("id", "kind", "name", "op", "batch").write.mode(
                "overwrite"
            ).parquet(vtmp)
            e.select("src", "dst", "rel", "weight", "op", "batch").write.mode(
                "overwrite"
            ).parquet(etmp)
            import shutil

            shutil.rmtree(self._vdir)
            shutil.rmtree(self._edir)
            os.rename(vtmp, self._vdir)
            os.rename(etmp, self._edir)

    # ---------------------------------------------------------------- asks

    def get_vertex(self, vid: str) -> DataFrame:
        """Reference: ask(GetNode) — point read."""
        return self.vertices().where(F.col("id") == vid)

    def neighbors(self, vid: str) -> DataFrame:
        """Out-neighbors with edge attributes (adjacency read)."""
        e = self.edges().where(F.col("src") == vid)
        v = self.vertices()
        return e.join(v, e.dst == v.id).select("src", "dst", "rel", "weight", "kind", "name")

    def degrees(self) -> DataFrame:
        e = self.edges()
        out_d = e.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("out_degree")
        )
        in_d = e.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("in_degree")
        )
        return (
            self.vertices()
            .select("id")
            .join(out_d, "id", "left")
            .join(in_d, "id", "left")
            .na.fill(0, ["out_degree", "in_degree"])
        )

    # ------------------------------------------------- journal as a stream

    def edge_journal_stream(self) -> DataFrame:
        """The edge journal as a Structured Streaming source: every
        mutation batch appended by add_edges/remove_edge becomes a
        micro-batch — the Spark analog of subscribing to the reference's
        Akka Persistence event journal [R]."""
        return self.spark.readStream.schema(_E_SCHEMA).parquet(self._edir)

    def run_incremental_edge_counts(
        self, checkpoint: str, sink_name: str
    ) -> DataFrame:
        """Incremental per-(rel, op) event counts over the journal.

        With a persistent ``checkpoint``, successive AvailableNow runs
        consume ONLY journal files appended since the last run and fold
        them into the checkpointed state — O(new mutations) per refresh,
        which is what keeps a materialized graph view cheap at 100 TB.
        """
        q = (
            self.edge_journal_stream()
            .groupBy("rel", "op")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return self.spark.table(sink_name)

    # ----------------------------------------------------------- analytics

    def _sym_edges(self) -> DataFrame:
        e = self.edges().select(F.col("src").alias("a"), F.col("dst").alias("b"))
        return e.unionByName(
            e.select(F.col("a").alias("b"), F.col("b").alias("a")).select("a", "b")
        ).distinct()

    def bfs(self, source: str, max_level: int = 20) -> DataFrame:
        """Reference: Traverse(depth) from a seed vertex."""
        seed = self.spark.createDataFrame([(source,)], "id string")
        return bfs_frame(self._sym_edges(), seed, max_level)

    def connected_components(self) -> DataFrame:
        return cc_frame(self.vertices().select("id"), self._sym_edges())

    def pagerank(self, iters: int = 10) -> DataFrame:
        return pagerank_frame(self.vertices().select("id"), self._sym_edges(), iters)

    def find(self, pattern: str) -> DataFrame:
        """Motif pattern match over the live edge state (the graph-DB
        structural ask: ``db.find("(a)-[:bought]->(p); (b)-[:bought]->(p)")``).
        Compiles to DataFrame joins — see operators.motif."""
        from graph_database_akkatyped_spark.operators.motif import find

        return find(self.edges(), pattern)

    def hits(self, iters: int = 3) -> DataFrame:
        """HITS hubs/authorities over the live directed edge state."""
        from graph_database_akkatyped_spark.operators.centrality import (
            hits_frame,
        )

        return hits_frame(
            self.vertices().select("id"),
            self.edges().select("src", "dst"),
            iters,
        )

    def scc(self) -> DataFrame:
        """Strongly connected components of the live directed graph."""
        from graph_database_akkatyped_spark.operators.graph_extras import (
            scc_frame,
        )

        return scc_frame(
            self.vertices().select("id"), self.edges().select("src", "dst")
        )

    def shortest_path_len(self, src: str, dst: str, half: int = 4) -> DataFrame:
        """Point-to-point distance by bidirectional BFS (1-row frame
        with dist = -1 beyond 2·half or disconnected)."""
        from graph_database_akkatyped_spark.operators.graph_extras import (
            bidirectional_dist_frame,
        )

        seed = lambda v: self.spark.createDataFrame(  # noqa: E731
            [(v,)], "id string"
        )
        return bidirectional_dist_frame(
            self._sym_edges(), seed(src), seed(dst), half
        )

    def reciprocity(self) -> DataFrame:
        """Follow-back rate of the live directed edge state (1 row)."""
        e = self.edges().select("src", "dst")
        rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        tot = e.agg(F.count(F.lit(1)).alias("m_edges"))
        rec = e.join(rev, ["src", "dst"], "left_semi").agg(
            F.count(F.lit(1)).alias("m_reciprocal")
        )
        return tot.crossJoin(F.broadcast(rec)).select(
            "m_edges",
            "m_reciprocal",
            (
                F.col("m_reciprocal").cast("double")
                / F.col("m_edges").cast("double")
            ).alias("reciprocity"),
        )
