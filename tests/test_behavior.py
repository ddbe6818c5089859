"""Property pins for the behavioral event-stream keys (operators/
behavior.py), beyond the SQL-hash oracle parity every key gets in
test_oracle_parity: structural invariants that hold at ANY scale.

- events_markov_transitions: probabilities sum to 1 per source type,
  pair counts sum to |events| - |users-with-events| (one lost pair per
  user sequence head), and n_from is consistent with the pair counts.
- timeseries_ohlc: low <= open/close <= high per bar, volume totals
  the journal row count, and a single-row day pins open == close.
- events_burst_zscore: cold-start rows (trail_hours < 12) have NULL z,
  is_burst is never NULL and implies z > 3, and the row set is exactly
  the distinct (type, hour) buckets of the journal.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_akkatyped_spark.catalog import load_table
from graph_database_akkatyped_spark.operators.behavior import (
    events_burst_zscore,
    events_markov_transitions,
    timeseries_ohlc,
)
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_markov_probabilities_normalize(spark):
    out = events_markov_transitions(spark, SF_SMOKE)
    rows = out.collect()
    assert rows, "fixture journal should yield transitions"
    by_src = {}
    for r in rows:
        by_src.setdefault(r.prev_type, []).append(r)
    for src, grp in by_src.items():
        total = sum(g.n_pair for g in grp)
        assert all(g.n_from == total for g in grp)
        assert abs(sum(g.p for g in grp) - 1.0) < 1e-9
    ev = load_table(spark, SF_SMOKE, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_pair for r in rows) == n_events - n_users


def test_ohlc_bar_invariants(spark):
    out = timeseries_ohlc(spark, SF_SMOKE)
    rows = out.collect()
    assert rows
    for r in rows:
        assert r.low <= r.high
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.volume >= 1
        if r.volume == 1:
            assert r.open == r.close == r.high == r.low
    ev = load_table(spark, SF_SMOKE, "events")
    assert sum(r.volume for r in rows) == ev.count()
    # bar key is unique
    keys = [(r.event_type, r.d) for r in rows]
    assert len(keys) == len(set(keys))


def test_burst_zscore_cold_start_and_coverage(spark):
    out = events_burst_zscore(spark, SF_ORACLE)
    rows = out.collect()
    assert rows
    for r in rows:
        assert r.is_burst is not None
        if r.trail_hours < 12:
            assert r.z is None, "cold-start buckets must not be scored"
        if r.is_burst:
            assert r.z is not None and r.z > 3
        if r.z is not None and r.z <= 3:
            assert not r.is_burst
    ev = load_table(spark, SF_ORACLE, "events")
    n_buckets = (
        ev.select("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .distinct()
        .count()
    )
    assert len(rows) == n_buckets


def test_ewma_exact_recompute_and_coverage(spark):
    """timeseries_ewma pins: the row set is exactly the distinct
    (type, hour) buckets, and every ewma equals an independent Python
    recompute over the trailing <=8 OBSERVED buckets. Weights are
    powers of two and counts are integers, so both computations are
    exact dyadic rationals and the equality is ==, not approx."""
    from graph_database_akkatyped_spark.operators.behavior import (
        _EWMA_LAGS,
        timeseries_ewma,
    )

    out = timeseries_ewma(spark, SF_SMOKE)
    rows = out.collect()
    assert rows
    ev = load_table(spark, SF_SMOKE, "events")
    n_buckets = (
        ev.select("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .distinct()
        .count()
    )
    assert len(rows) == n_buckets
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for grp in by_type.values():
        grp.sort(key=lambda r: r.hr)
        for i, r in enumerate(grp):
            trail = [g.n for g in grp[max(0, i - _EWMA_LAGS + 1) : i + 1]]
            trail.reverse()  # index 0 = current bucket
            num = sum(n * 2.0**-k for k, n in enumerate(trail))
            den = sum(2.0**-k for k in range(len(trail)))
            assert r.ewma == num / den, (r.event_type, r.hr)
        # leading edge: first observed bucket's ewma is its own count
        assert grp[0].ewma == float(grp[0].n)


def test_seasonal_profile_offsets_and_coverage(spark):
    """timeseries_seasonal_profile: the cell set is exactly the
    observed (type, hod) buckets, counts cover the journal, and per
    type the count-weighted seasonal offsets sum to ~0 (the additive
    decomposition identity)."""
    from graph_database_akkatyped_spark.operators.behavior import (
        timeseries_seasonal_profile,
    )

    rows = timeseries_seasonal_profile(spark, SF_SMOKE).collect()
    assert rows
    ev = load_table(spark, SF_SMOKE, "events")
    n_cells = (
        ev.select("event_type", F.hour("ts").alias("h")).distinct().count()
    )
    assert len(rows) == n_cells
    assert sum(r.n for r in rows) == ev.count()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for grp in by_type.values():
        weighted = sum(r.seasonal_offset * r.n for r in grp)
        assert abs(weighted) < 1e-6 * sum(r.n for r in grp)


def test_cusum_finds_planted_level_shift(spark, tmp_path):
    """timeseries_changepoint_cusum on a planted mean shift: a type
    running at 2 events/hour for 48 h then 10/hour for 48 h must peak
    (is_peak) at the shift boundary — the CUSUM of deviations from the
    global mean is maximal exactly where the regime changes — while a
    constant-rate type carries a flat statistic (0 at its argmax rank-1
    row only because ties break earliest)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from graph_database_akkatyped_spark.operators.behavior import (
        timeseries_changepoint_cusum,
    )

    rows = []
    base = datetime.datetime(2024, 1, 1)
    eid = 0
    for h in range(96):
        ts = base + datetime.timedelta(hours=h)
        for _ in range(2 if h < 48 else 10):
            rows.append((eid, ts, eid % 7, "shifty", 1.0, "{}"))
            eid += 1
        for _ in range(3):
            rows.append((eid, ts, eid % 7, "steady", 1.0, "{}"))
            eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet")
    out = timeseries_changepoint_cusum(spark, str(d)).collect()
    peaks = {r["event_type"]: r for r in out if r["is_peak"]}
    assert set(peaks) == {"shifty", "steady"}
    # one-sided semantics: the POSITIVE statistic accumulates the
    # post-shift +4/hour drift and is maximal at the series end
    # (48 h x 4 = 192 — the "rate went up" alarm), while the NEGATIVE
    # statistic is maximal exactly at the last pre-shift hour
    # (47 h x 4 = 188 — it LOCALIZES the boundary)
    assert peaks["shifty"]["hr"] == base + datetime.timedelta(hours=95)
    assert peaks["shifty"]["cusum_norm"] == 192.0
    shifty = {r["hr"]: r for r in out if r["event_type"] == "shifty"}
    neg_max = max(shifty.values(), key=lambda r: (r["cusum_neg_k"], -r["hr"].timestamp()))
    assert neg_max["hr"] == base + datetime.timedelta(hours=47)
    assert neg_max["cusum_neg_k"] == 188 * 96  # k-units, k = 96 buckets
    # constant type: statistic identically 0
    assert peaks["steady"]["cusum_norm"] == 0.0
    assert all(
        r["cusum_norm"] == 0.0 for r in out if r["event_type"] == "steady"
    )
