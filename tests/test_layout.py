"""Semantic checks for the physical-layout family (operators.layout):
z-order actually tightens zone maps, compaction actually reduces file
count, partial-agg merge is actually consistent with recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_akkatyped_spark.operators import layout
from tests.conftest import SF_ORACLE


def test_zorder_tightens_zone_maps(spark):
    stats = layout.zorder_layout(spark, SF_ORACLE)
    widths = (
        stats.groupBy("layout")
        .agg(
            F.avg(F.col("max_part") - F.col("min_part")).alias("w_part"),
            F.avg(F.col("max_supp") - F.col("min_supp")).alias("w_supp"),
        )
        .collect()
    )
    by_layout = {r["layout"]: r for r in widths}
    # natural order clusters nothing: every file straddles ~the full
    # key range; z-order must shrink the average range on the wide key
    # and never widen the narrow one (at sf0.01 l_suppkey has only 100
    # distinct values — fewer than rows per file — so its per-file
    # range saturates under any layout and can only tie)
    assert by_layout["zorder"]["w_part"] < by_layout["natural"]["w_part"]
    assert by_layout["zorder"]["w_supp"] <= by_layout["natural"]["w_supp"]


def test_zorder_point_probe_prunes_files(spark):
    stats = layout.zorder_layout(spark, SF_ORACLE).collect()
    probe = 500  # a mid-range l_partkey bucket
    touched = {
        lay: sum(
            1
            for r in stats
            if r["layout"] == lay and r["min_part"] <= probe <= r["max_part"]
        )
        for lay in ("natural", "zorder")
    }
    assert touched["zorder"] < touched["natural"]


def test_compaction_preserves_data_and_reduces_files(spark):
    rows = {
        r["phase"]: r
        for r in layout.sink_compacted(spark, SF_ORACLE).collect()
    }
    assert rows["small"]["n_files"] == 64
    assert rows["compacted"]["n_files"] < rows["small"]["n_files"]
    assert rows["small"]["n_rows"] == rows["compacted"]["n_rows"]
    assert rows["small"]["checksum"] == rows["compacted"]["checksum"]


def test_incremental_merge_consistent(spark):
    out = layout.incremental_agg_merge(spark, SF_ORACLE).collect()
    assert out and all(r["consistent"] for r in out)


def test_skew_profile_shapes(spark):
    out = {r["join_key"]: r for r in layout.skew_profile(spark, SF_ORACLE).collect()}
    assert set(out) == {"l_orderkey", "l_partkey", "l_suppkey"}
    for r in out.values():
        assert r["max_cnt"] >= r["p99_cnt"] >= r["p50_cnt"] >= 1
        assert r["skew_ratio"] >= 1.0


def test_sketch_merge_matches_exact_within_tolerance(spark):
    """HLL merge-of-epochs and single-pass estimates must both land
    within the sketch's error envelope of the exact distinct, and the
    estimates must be deterministic across invocations (DataSketches
    HLL has no RNG)."""
    from graph_database_akkatyped_spark.operators.relational_extras import (
        _epoch_merge_raw,
        agg_sketch_epoch_merge,
    )

    a = _epoch_merge_raw(spark, SF_ORACLE).collect()
    assert len(a) == 5
    for r in a:
        for est in (r["merged_est"], r["full_est"]):
            assert abs(est - r["exact_distinct"]) <= 0.05 * r["exact_distinct"], r
    b = _epoch_merge_raw(spark, SF_ORACLE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # the registered scorecard carries the same contract as int flags
    for r in agg_sketch_epoch_merge(spark, SF_ORACLE).collect():
        assert r["merged_within_5pct"] == 1 and r["full_within_5pct"] == 1


def test_zorder_ranged_zone_maps_tighten(spark):
    """The production (repartitionByRange) z-order must deliver the
    same zone-map property the oracle-shape does: per-file key ranges
    tighter than the full-span natural layout on the wide key."""
    ranged = layout.zorder_layout_ranged(spark, SF_ORACLE)
    rows = ranged.collect()
    assert sum(r["n_rows"] for r in rows) == spark.read.parquet(
        f"{SF_ORACLE}/lineitem.parquet"
    ).count()
    full_span = 2000  # sf0.01 part key range
    avg_width = sum(r["max_part"] - r["min_part"] for r in rows) / len(rows)
    assert avg_width < 0.6 * full_span, avg_width
