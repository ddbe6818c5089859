"""Semantic invariants of the round-4b operators — properties that
must hold for ANY input, checked on the smoke fixture (the oracle
hash-parity tests pin exact values; these pin the algebra)."""

from __future__ import annotations

import math

import pytest

from graph_database_akkatyped_spark.registry import collect
from tests.conftest import SF_SMOKE

QUERIES, _ = collect()


@pytest.fixture(scope="module")
def run():
    import pandas as pd  # noqa: F401

    cache: dict = {}

    def _run(spark, key):
        if key not in cache:
            cache[key] = QUERIES[key](spark, SF_SMOKE).toPandas()
        return cache[key]

    return _run


def test_merge_upsert_accounting(spark, run):
    """|result| = |base| - deletes + inserts, and every change_type is
    consistent with its provenance."""
    from graph_database_akkatyped_spark.catalog import load_table

    out = run(spark, "merge_cdc_upsert")
    n_base = load_table(spark, SF_SMOKE, "customer").count()
    n_ins = int((out["change_type"] == "inserted").sum())
    n_del = n_base - int((out["change_type"] != "inserted").sum())
    assert len(out) == n_base - n_del + n_ins
    assert n_del >= 0
    # inserted keys are offset past max(c_custkey), so they can never
    # collide with a real customer at any scale factor
    max_ck = (
        load_table(spark, SF_SMOKE, "customer")
        .agg({"c_custkey": "max"})
        .first()[0]
    )
    ins_keys = out.loc[out["change_type"] == "inserted", "custkey"]
    assert (ins_keys > max_ck).all()


def test_pareto_shares_sum_to_one(spark, run):
    out = run(spark, "revenue_pareto")
    assert math.isclose(out["share"].sum(), 1.0, rel_tol=1e-9)
    cum = out.sort_values("decile")["cum_share"].tolist()
    assert cum == sorted(cum) and math.isclose(cum[-1], 1.0, rel_tol=1e-9)
    # revenue deciles are ordered: decile 1 carries the most
    rev = out.sort_values("decile")["revenue"].tolist()
    assert rev == sorted(rev, reverse=True)


def test_reciprocity_bounded(spark, run):
    out = run(spark, "graph_reciprocity")
    r = out.iloc[0]
    assert 0 <= r["reciprocity"] <= 1
    assert r["m_reciprocal"] <= r["m_edges"]
    assert r["m_reciprocal"] % 2 == 0  # reciprocal edges come in pairs


def test_pattern_counts_bounded_by_sequence(spark, run):
    out = run(spark, "events_pattern_match")
    assert (out["n_strict_funnel"] <= out["n_converted"]).all()
    # each non-overlapping match consumes >= 2 chars
    assert (out["n_converted"] * 2 <= out["seq_len"]).all()
    assert ((out["n_converted"] > 0) == out["converted"]).all()


def test_assortativity_in_range(spark, run):
    out = run(spark, "degree_assortativity")
    assert -1.0 <= out.iloc[0]["assortativity"] <= 1.0


def test_modularity_partition_sums(spark, run):
    """Σ n_members = |V|; Σ e_in ≤ m; Q ≤ 1."""
    from graph_database_akkatyped_spark.operators.graph_build import (
        user_edges_sym,
        user_vertices,
    )

    out = run(spark, "community_modularity")
    n_v = user_vertices(spark, SF_SMOKE).count()
    m = user_edges_sym(spark, SF_SMOKE).count()
    assert out["n_members"].sum() == n_v
    assert out["e_in"].sum() <= m
    assert out["d_sum"].sum() == m  # total degree mass = directed edges
    assert (out["modularity"] <= 1.0).all()


def test_shingle_dup_ratio_bounds(spark, run):
    out = run(spark, "dedup_substring_shingle")
    assert (out["n_dup_shingles"] <= out["n_shingles"]).all()
    assert out["dup_ratio"].between(0.0, 1.0).all()


def test_kmeans_partitions_all_vectors(spark, run):
    from graph_database_akkatyped_spark.catalog import load_table

    out = run(spark, "embedding_kmeans_lloyd")
    n_vec = load_table(spark, SF_SMOKE, "embeddings").count()
    per_cid = out.drop_duplicates("cid")
    assert per_cid["n_members"].sum() == n_vec
    assert (per_cid["inertia_pre"] >= 0).all()
    # every cluster emits exactly one coordinate row per dimension
    assert (out.groupby("cid")["dim"].count() == 64).all()


def test_pca_vector_max_normalized(spark, run):
    out = run(spark, "embedding_pca_power")
    assert len(out) == 64
    assert out["v_e6"].abs().max() == 1_000_000


def test_tombstone_cascade_consistency(spark, run):
    out = run(spark, "tombstone_cascade").set_index("table_name")
    assert (out["n_purged"] <= out["n_total"]).all()
    # orders purge implies >= lineitem purge rows only via FK fan-out;
    # customer purge count can't exceed the victim user count
    assert out.loc["customer", "n_purged"] <= out.loc["events", "n_total"]


def test_snapshot_diff_monotone(spark, run):
    out = run(spark, "snapshot_diff")
    assert (out["n_orders_b"] >= out["n_orders_a"]).all()  # B ⊇ A
    added = out[out["change_type"] == "added"]
    assert (added["n_orders_a"] == 0).all()
    unchanged = out[out["change_type"] == "unchanged"]
    assert (unchanged["spend_a"] == unchanged["spend_b"]).all()


def test_scd2_interval_algebra(spark, run):
    """SCD2 invariants that must hold for ANY input: per key the
    intervals tile the timeline (valid_to of version k == valid_from
    of version k+1, no gaps or overlaps), versions are contiguous from
    1, exactly ONE current row per key (the only NULL valid_to), and
    |history| = |customer| + |orders| (every change produces exactly
    one version; the master row seeds version 1)."""
    from graph_database_akkatyped_spark.catalog import load_table

    out = run(spark, "merge_scd2")
    n_cust = load_table(spark, SF_SMOKE, "customer").count()
    n_ord = load_table(spark, SF_SMOKE, "orders").count()
    assert len(out) == n_cust + n_ord
    assert out["custkey"].nunique() == n_cust
    for key, g in out.groupby("custkey"):
        g = g.sort_values("version")
        assert list(g["version"]) == list(range(1, len(g) + 1))
        assert int(g["is_current"].sum()) == 1
        assert g.iloc[-1]["is_current"] and g.iloc[-1:]["valid_to"].isna().all()
        # tiling: each version closes exactly where the next opens
        vf = list(g["valid_from"])
        vt = list(g["valid_to"])
        for i in range(len(g) - 1):
            assert vt[i] == vf[i + 1], key


def test_countmin_one_sided_guarantee(spark):
    """CM sketch algebra: est >= true for EVERY item (not only the
    reported ones — the min over d counters can only overcount), and
    therefore no true heavy hitter is ever missed by the integer
    threshold. Checked by recomputing estimates for all items."""
    from pyspark.sql import functions as F

    from graph_database_akkatyped_spark.catalog import load_table
    from graph_database_akkatyped_spark.operators.relational_extras import (
        _CM_D,
        _CM_HEAVY_DIV,
        _CM_W,
        _cm_bucket_spark,
        sketch_countmin_heavy,
    )

    sf = SF_SMOKE
    e = load_table(spark, sf, "events")
    items = e.select(F.col("user_id").alias("item"))
    hj = F.explode(F.array(*[F.lit(j) for j in range(_CM_D)])).alias("j")
    rows = items.select("item", hj).withColumn(
        "b", F.expr(_cm_bucket_spark())
    )
    cm = rows.groupBy("j", "b").agg(F.count(F.lit(1)).alias("c"))
    est_all = {
        r["item"]: r["est"]
        for r in items.distinct()
        .select("item", hj)
        .withColumn("b", F.expr(_cm_bucket_spark()))
        .join(cm, ["j", "b"])
        .groupBy("item")
        .agg(F.min("c").alias("est"))
        .collect()
    }
    true_all = {
        r["item"]: r["n"]
        for r in items.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = sum(true_all.values())
    assert set(est_all) == set(true_all)
    for it, tr in true_all.items():
        assert est_all[it] >= tr, it
    reported = {
        r["item"] for r in sketch_countmin_heavy(spark, sf).collect()
    }
    true_heavy = {it for it, tr in true_all.items() if tr * _CM_HEAVY_DIV >= n}
    assert true_heavy <= reported


def test_interpolate_fills_between_neighbors(spark):
    """Interpolated values lie on the segment between the surrounding
    observations (min <= v <= max of the two endpoints), observed
    hours keep their exact integer hourly mean, and leading/trailing
    gaps carry the nearest observation."""
    from graph_database_akkatyped_spark.streaming.windows import (
        timeseries_interpolate,
    )

    sf = SF_SMOKE
    out = timeseries_interpolate(spark, sf).toPandas()
    assert not out["value_e6"].isna().any()
    for et, g in out.groupby("event_type"):
        g = g.sort_values("hr").reset_index(drop=True)
        obs_idx = list(g.index[g["observed"]])
        assert obs_idx, et
        for i in g.index[~g["observed"]]:
            prevs = [j for j in obs_idx if j < i]
            nxts = [j for j in obs_idx if j > i]
            if not prevs:
                assert g.loc[i, "value_e6"] == g.loc[nxts[0], "value_e6"]
            elif not nxts:
                assert g.loc[i, "value_e6"] == g.loc[prevs[-1], "value_e6"]
            else:
                lo = min(g.loc[prevs[-1], "value_e6"], g.loc[nxts[0], "value_e6"])
                hi = max(g.loc[prevs[-1], "value_e6"], g.loc[nxts[0], "value_e6"])
                assert lo <= g.loc[i, "value_e6"] <= hi, (et, i)
