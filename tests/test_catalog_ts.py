"""events.ts storage-vintage adaptivity (catalog.normalize_events_ts).

The driver fixtures have shipped ts two ways across rounds: ns-precision
INT64 (read as BIGINT under nanosAsLong) and µs-precision TIMESTAMP_NTZ.
Both must normalize to the same session-TZ TIMESTAMP values.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from graph_database_akkatyped_spark.catalog import load_table, normalize_events_ts
from tests.conftest import SF_SMOKE


def test_live_fixture_ts_is_timestamp(spark):
    df = load_table(spark, SF_SMOKE, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_both_vintages_agree(spark, tmp_path):
    # same instants written as TIMESTAMP(NANOS) and as µs-timestamp.
    # The ns file must carry the real TIMESTAMP(isAdjustedToUTC, NANOS)
    # logical type — not a plain INT64 column — so the test exercises
    # the actual round-1 read path: vanilla sessions reject it, and
    # under nanosAsLong it arrives as BIGINT for the div-1000 branch.
    micros = [1_704_067_200_000_000, 1_704_070_800_123_456]
    tb_ns = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([m * 1000 for m in micros], pa.timestamp("ns")),
        }
    )
    tb_us = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(micros, pa.timestamp("us")),
        }
    )
    p_ns, p_us = str(tmp_path / "ns.parquet"), str(tmp_path / "us.parquet")
    pq.write_table(tb_ns, p_ns)
    pq.write_table(tb_us, p_us)

    a = normalize_events_ts(spark.read.parquet(p_ns)).orderBy("event_id").collect()
    b = normalize_events_ts(spark.read.parquet(p_us)).orderBy("event_id").collect()
    assert [r.ts for r in a] == [r.ts for r in b]
    assert dict(normalize_events_ts(spark.read.parquet(p_us)).dtypes)["ts"] == "timestamp"
