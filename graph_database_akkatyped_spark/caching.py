"""Per-session memoization of materialized (localCheckpoint) frames.

Several registered keys start from the same expensive intermediate (the
strong-edge graph, the triangle enumeration, a dedup feature frame).
Each of those frames is cut with ``localCheckpoint(eager=True)`` because
its consumers self-join it — but a checkpoint block is never freed until
the session ends, so re-invoking such a key in a long-lived session
(bench loops, the parity sweep) used to stack a NEW block per call.
Memoizing per (kind, sf_dir, session) bounds that accumulation at one
block per distinct input, turning the leak a round-3 audit flagged into
a deliberate, bounded cache.

Cluster-scale note: ``localCheckpoint`` stores blocks on executors and
is NOT recoverable on executor loss. On a real cluster prefer
``persist(StorageLevel.MEMORY_AND_DISK_2)`` (replicated) or a reliable
``checkpoint()`` to a cluster filesystem for frames whose recomputation
is expensive; the memoization contract here is storage-level-agnostic —
swap the cut inside ``build`` without touching callers.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[str, str], tuple[SparkSession, DataFrame]] = {}


def memoized_checkpoint(
    spark: SparkSession,
    kind: str,
    sf_dir: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the memoized eager localCheckpoint of ``build()`` for this
    (kind, sf_dir), rebuilding when the session changed (a checkpointed
    frame dies with its session)."""
    hit = _CACHE.get((kind, sf_dir))
    if hit is not None and hit[0] is spark:
        return hit[1]
    df = build().localCheckpoint(eager=True)
    _CACHE[(kind, sf_dir)] = (spark, df)
    return df


def clear_frame_cache() -> None:
    """Drop all memoized frames (tests, or to release executor storage)."""
    _CACHE.clear()
