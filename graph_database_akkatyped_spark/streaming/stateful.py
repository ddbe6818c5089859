"""Arbitrary stateful streaming (SURVEY.md §2-F): running per-user
counters with ``applyInPandasWithState`` — the closest Spark analog to
the reference's per-entity actor state [R]: state is partitioned by key
(like cluster sharding), updated per micro-batch (like mailbox drain),
and persisted in the state store (like the persistence journal).

The registered query runs the stream with AvailableNow over the fixture
file and emits each user's final counter + total value; rows-only check
(the driver's SQL harness can't express arbitrary state), with a batch
equality test in tests/test_streaming.py.
"""

from __future__ import annotations

import uuid

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _update_counts(key, pdfs, state: GroupState):
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
    )


def stream_stateful_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_database_akkatyped_spark.streaming.windows import stream_events

    stream = stream_events(spark, sf_dir).select("user_id", "value")
    counted = stream.groupBy("user_id").applyInPandasWithState(
        _update_counts,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (
        counted.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # one input file -> one micro-batch -> one emission per user; dedupe
    # defensively by keeping the LATEST emission should the source split:
    # n_events is strictly monotone per user, so pair total_value with the
    # highest counter (independent maxes would mix emissions when values
    # can be negative)
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.expr("max_by(total_value, n_events)").alias("total_value"),
        )
    )


try:  # Spark 4 surface; keep module import safe on older runtimes
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor as _StatefulProcessorBase,
    )
except ImportError:  # pragma: no cover - container ships Spark 4
    _StatefulProcessorBase = object  # type: ignore[assignment,misc]


class _UserStatsProcessor(_StatefulProcessorBase):
    """StatefulProcessor for ``transformWithStateInPandas`` (Spark 4's
    successor to applyInPandasWithState: typed state handles instead of
    one tuple, plus timers/TTL we don't need here). Tracks per-user
    event count + running min/max of ``value`` in a ValueState —
    deliberately order-independent statistics, so unlike the float
    running total in ``stream_stateful_count`` the final emission is
    engine-exact and gets a real SQL oracle."""

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "stats", "n long, vmin double, vmax double"
        )

    def handleInputRows(self, key, rows, timerValues):
        n, vmin, vmax = (
            self._state.get() if self._state.exists() else (0, None, None)
        )
        for pdf in rows:
            n += len(pdf)
            lo = float(pdf["value"].min())
            hi = float(pdf["value"].max())
            vmin = lo if vmin is None else min(vmin, lo)
            vmax = hi if vmax is None else max(vmax, hi)
        self._state.update((n, vmin, vmax))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "min_value": [vmin],
                "max_value": [vmax],
            }
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def close(self) -> None:
        pass


def stream_stateful_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event count + value min/max via
    ``transformWithStateInPandas`` (real micro-batch run, AvailableNow,
    memory sink). Update mode can emit once per micro-batch per user;
    n_events is strictly monotone, so the final per-user row is the one
    with the highest counter — min/max travel with it via max_by."""
    proc = _UserStatsProcessor()
    from graph_database_akkatyped_spark.streaming.windows import stream_events

    stream = stream_events(spark, sf_dir).select("user_id", "value")
    counted = stream.groupBy("user_id").transformWithStateInPandas(
        proc,
        outputStructType=(
            "user_id long, n_events long, min_value double, max_value double"
        ),
        outputMode="Update",
        timeMode="None",
    )
    name = f"stateful_tws_{uuid.uuid4().hex[:8]}"
    q = (
        counted.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.expr("max_by(min_value, n_events)").alias("min_value"),
            F.expr("max_by(max_value, n_events)").alias("max_value"),
        )
    )


_STATEFUL_MINMAX_SQL = """
SELECT user_id, count(*) AS n_events,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY user_id
"""


def _tws_available() -> bool:
    """transformWithStateInPandas talks to the JVM state server over a
    protobuf protocol; this container ships no ``protobuf`` package (and
    installs are out of scope), so the driver worker crashes with
    ``ImportError: google.protobuf``. Register the key only where the
    dependency exists — on a normal Spark 4 cluster image it lights up
    automatically (tests/test_streaming.py carries the skip-gated
    oracle-parity check)."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


QUERIES = {"stream_stateful_count": stream_stateful_count}
# stream_stateful_count stays rows-only (float running total is
# order-dependent); the minmax key's statistics are order-independent,
# so it carries a full SQL oracle despite the arbitrary-state path.
ORACLES: dict[str, str] = {}
if _tws_available():  # pragma: no cover - container lacks protobuf
    QUERIES["stream_stateful_minmax"] = stream_stateful_minmax
    ORACLES["stream_stateful_minmax"] = _STATEFUL_MINMAX_SQL
