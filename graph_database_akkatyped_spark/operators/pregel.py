"""DataFrame Pregel kernel (SURVEY.md §2-C, §4.3).

The reference [R] runs traversals as actor message hops (vertex actor
receives messages, updates state, forwards to neighbors). One Pregel
superstep IS that pattern as a dataflow: join edges with source-vertex
state (message send), ``groupBy(dst).agg`` (mailbox combine), join back
with vertices (vertex program). Cf. Pregelix (PAPERS.md): Pregel on a
dataflow engine = join + groupBy per superstep.

Scale notes (the part naive Spark iteration gets wrong):
- each superstep is cut (``caching.cut``) to truncate lineage;
  otherwise the logical plan doubles per iteration and analysis time
  explodes long before data size matters. ``reliable=True`` routes the
  cut through a filesystem ``checkpoint()`` (``sc.setCheckpointDir``)
  so a lost executor re-reads checkpoint files instead of killing the
  multi-hour job — the mandatory setting for preemptible-node
  clusters; the default ``localCheckpoint`` is faster but dies with
  any executor. Results are bit-identical either way.
- the PREVIOUS superstep's blocks are unpersisted once the new cut is
  materialized, so EXECUTOR storage stays O(1) generations instead of
  O(iterations) over a long convergence run. (That synchronous bound
  covers localCheckpoint blocks; in reliable mode the superseded
  checkpoint FILES are reclaimed asynchronously by the ContextCleaner
  — requires ``spark.cleaner.referenceTracking.cleanCheckpoints``,
  which ``session.get_spark`` sets; see caching.py STORAGE LIFECYCLE.)
- The convergence check aggregates a pre-computed ``changed`` flag on
  the just-checkpointed result, so it reuses materialized blocks instead
  of recomputing the superstep.
- Messages shuffle on ``dst`` and states on ``id`` — the same key — so
  AQE can reuse/coalesce partitioning between supersteps. Skewed
  high-degree vertices are handled by AQE skew-join (session default).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from graph_database_akkatyped_spark.caching import (
    cut,
    cut_block_ids,
    _unpersist_ids,
)


@dataclass
class PregelResult:
    vertices: DataFrame  # (id, state)
    iterations: int
    converged: bool
    # Block ids of the FINAL superstep's cut (``vertices`` is a lazy
    # select over it, so caching.cut_block_ids cannot recover them
    # from the result frame). A caller that has fully materialized
    # everything it derives from ``vertices`` may free these via
    # caching._unpersist_ids — the round-12 §5 discipline scc_frame
    # applies per peeling round. Empty when no superstep was cut.
    block_ids: frozenset = frozenset()


def pregel(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    msg: Column,
    agg: Column,
    vprog: Column,
    max_iter: int,
    check_convergence: bool = True,
    checkpoint_every: int = 1,
    frontier_only: bool = False,
    reliable: bool | None = None,
) -> PregelResult:
    """Run synchronous Pregel supersteps until convergence or max_iter.

    - ``vertices``: DataFrame(id, state)
    - ``edges``: DataFrame(src, dst, weight) — direct edges as they
      should carry messages (symmetrize first for undirected semantics)
    - ``msg``: Column over (src, dst, weight, src_state) producing the
      message sent to ``dst``; NULL means "send nothing"
    - ``agg``: aggregate Column over column ``msg`` (the combiner)
    - ``vprog``: Column over (id, state, agg_msg) producing the new
      state; ``agg_msg`` is NULL for vertices that received no message
    - convergence: no vertex state changed (null-safe comparison)
    - ``frontier_only``: send messages ONLY from vertices whose state
      changed last superstep. Correct for MONOTONE algorithms (min/max
      propagation: SSSP, CC, BFS — a vertex whose state is final can
      never improve a neighbor later); per-superstep cost drops from
      O(E) to O(edges out of the frontier), which on deep graphs at
      100 TB is the difference between converging and not. NOT valid
      for PageRank-style recomputation, where every vertex contributes
      every round.
    - ``reliable``: None follows the session-wide cut policy
      (``caching.set_reliable_checkpointing``); True forces
      filesystem checkpoints that survive executor loss; False forces
      executor-local blocks (fast, non-recoverable). Identical
      results either way — only failure semantics differ.
    """
    spark = vertices.sparkSession
    v = vertices.select("id", "state")
    active = v
    iterations = 0
    converged = False
    prev_block_ids: set[int] = set()
    for i in range(max_iter):
        iterations = i + 1
        senders = active if frontier_only else v
        src_states = senders.select(
            F.col("id").alias("src"), F.col("state").alias("src_state")
        )
        triplets = edges.join(src_states, "src")
        msgs = (
            triplets.select(F.col("dst").alias("id"), msg.alias("msg"))
            .where(F.col("msg").isNotNull())
            .groupBy("id")
            .agg(agg.alias("agg_msg"))
        )
        stepped = (
            v.join(msgs, "id", "left")
            # vprog and the old-state alias are evaluated in one
            # projection, both against the incoming (id, state, agg_msg)
            .select("id", F.col("state").alias("old_state"), vprog.alias("state"))
            .select(
                "id",
                "state",
                (~F.col("state").eqNullSafe(F.col("old_state")))
                .cast("long")
                .alias("changed"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or check_convergence or frontier_only:
            stepped = cut(stepped, reliable)
            # the new generation is fully materialized; the previous
            # superstep's blocks are dead weight — free them so storage
            # stays O(1) generations over a long run. Ids come off the
            # cut frame's own plan (exact attribution — a concurrent
            # job's persists are never claimed).
            _unpersist_ids(spark, prev_block_ids)
            prev_block_ids = cut_block_ids(stepped)
        if check_convergence:
            n_changed = stepped.agg(F.sum("changed")).first()[0] or 0
            if n_changed == 0:
                converged = True
                v = stepped.select("id", "state")
                break
        v = stepped.select("id", "state")
        if frontier_only:
            active = stepped.where(F.col("changed") == 1).select("id", "state")
    return PregelResult(
        vertices=v,
        iterations=iterations,
        converged=converged,
        block_ids=frozenset(prev_block_ids),
    )
