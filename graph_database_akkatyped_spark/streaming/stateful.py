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


QUERIES = {"stream_stateful_count": stream_stateful_count}
ORACLES: dict[str, str] = {}  # rows-only: arbitrary state is not SQL-expressible
