"""Round-10 fix locks: the tie-safe percentile rank gate and the
hard-contract LSH scorecard's row guarantee — each test constructs the
exact adversarial input the round-9 ADVICE predicted would break the
previous formulation, and asserts the new one holds."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _write_events(tmp_path, values):
    """Minimal events.parquet with the columns agg_approx_percentile
    touches (full fixture schema so load_table's ts normalization has
    its column)."""
    n = len(values)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array([0] * n, pa.timestamp("us")),
                "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
                "event_type": pa.array(["tied"] * n, pa.string()),
                "value": pa.array(values, pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        ),
        tmp_path / "events.parquet",
    )
    return str(tmp_path)


def test_percentile_flag_survives_total_ties(spark, tmp_path):
    """1000 identical values: the GK sketch returns the tied value (in
    spec — EVERY rank is that value), count(<=) = n blows through the
    old q*n + margin gate (the round-9 ADVICE failure case), and the
    tie-safe rank-interval gate must still emit 1."""
    from graph_database_akkatyped_spark.functions.scalar import (
        agg_approx_percentile,
    )

    n = 1000
    d = _write_events(tmp_path, [5.0] * n)
    rows = agg_approx_percentile(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n"], r["p50_rank_ok"], r["p90_rank_ok"]) == (n, 1, 1)

    # prove the OLD gate really breaks on this input: count(value <=
    # p50_est) = n = 1000, and |1000*1000 - 500*1000| > 10*1000 + 1000
    le = n  # every value ties the estimate
    assert abs(le * 1000 - 500 * n) > 10 * n + 1000


def test_percentile_flag_still_rejects_wrong_estimate(spark, tmp_path):
    """The tie-safe gate must not be vacuous: feed the SCORING path a
    deliberately wrong estimate (min of a 0..999 uniform column as the
    'p50') and the rank interval [lt, le] = [0, 1] falls outside
    q*n ± margin — flag 0. Exercised on the same frame math the key
    uses (broadcast-join + two conditional sums)."""
    from graph_database_akkatyped_spark.catalog import load_table

    n = 1000
    d = _write_events(tmp_path, [float(i) for i in range(n)])
    e = load_table(spark, d, "events").select("event_type", "value")
    wrong = e.groupBy("event_type").agg(F.min("value").alias("p50_approx"))
    score = (
        e.join(F.broadcast(wrong), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("value") < F.col("p50_approx")).cast("long")).alias(
                "lt"
            ),
            F.sum((F.col("value") <= F.col("p50_approx")).cast("long")).alias(
                "le"
            ),
        )
        .collect()[0]
    )
    margin = 10 * score["n"] + 1000
    ok = (
        score["lt"] * 1000 <= 500 * score["n"] + margin
        and score["le"] * 1000 >= 500 * score["n"] - margin
    )
    assert not ok, "rank-interval gate accepted a wrong estimate"


def test_lsh_scorecard_row_survives_zero_candidates(spark, monkeypatch):
    """Hard-contract guarantee (round-9 ADVICE): a query for which
    approxSimilarityJoin returns NOTHING must still emit its scorecard
    row — flags vacuously 1, topk_capped 1 at n_returned = 0. Forced
    by stubbing _lsh_topk with an empty candidate frame; also checks
    the partial case (one query returning 3 of 10)."""
    from graph_database_akkatyped_spark.operators import llm
    from tests.conftest import SF_SMOKE

    empty = spark.createDataFrame(
        [], "q_id long, vec_id long, dist double, rnk int"
    )
    monkeypatch.setattr(llm, "_lsh_topk", lambda s, d: empty)
    rows = {r["q_id"]: r for r in llm.simsearch_lsh(spark, SF_SMOKE).collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4], "zero-candidate query lost its row"
    for r in rows.values():
        assert (r["within_radius"], r["ranks_contiguous"], r["topk_capped"]) \
            == (1, 1, 1)

    partial = spark.createDataFrame(
        [(0, 7, 1.5, 1), (0, 9, 2.5, 2), (0, 11, 9.9, 3)],
        "q_id long, vec_id long, dist double, rnk int",
    )
    monkeypatch.setattr(llm, "_lsh_topk", lambda s, d: partial)
    rows = {r["q_id"]: r for r in llm.simsearch_lsh(spark, SF_SMOKE).collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4]
    assert all(
        (r["within_radius"], r["ranks_contiguous"], r["topk_capped"])
        == (1, 1, 1)
        for r in rows.values()
    )

    # and the contracts are falsifiable: a dist past the radius and a
    # rank gap must flip their flags
    bad = spark.createDataFrame(
        [(0, 7, 11.0, 1), (1, 9, 1.0, 2)],
        "q_id long, vec_id long, dist double, rnk int",
    )
    monkeypatch.setattr(llm, "_lsh_topk", lambda s, d: bad)
    rows = {r["q_id"]: r for r in llm.simsearch_lsh(spark, SF_SMOKE).collect()}
    assert rows[0]["within_radius"] == 0
    assert rows[1]["ranks_contiguous"] == 0
