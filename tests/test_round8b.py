"""Property tests for the round-8 session-3 keys (skyline, k-anonymity,
readability, DSIR, Holt) — semantic invariants the hash oracle can't
express (the oracle proves Spark == DuckDB; these prove both == the
operator's CONTRACT)."""

from __future__ import annotations

import pandas as pd

from graph_database_akkatyped_spark.operators.behavior import timeseries_holt
from graph_database_akkatyped_spark.operators.curation import (
    _KANON_K,
    anonymize_k_anonymity,
)
from graph_database_akkatyped_spark.operators.llm import (
    corpus_dsir_weights,
    text_readability,
)
from graph_database_akkatyped_spark.operators.relational_extras import (
    skyline_pareto,
)
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_skyline_is_exactly_the_brute_force_frontier(spark):
    # brute-force dominance over ALL parts (not just prefilter
    # candidates) — proves the bucket prefilter is lossless
    part = spark.read.parquet(f"{SF_ORACLE}/part.parquet").toPandas()
    pts = list(
        zip(
            part["p_partkey"].astype("int64"),
            (part["p_retailprice"] * 100).round().astype("int64"),
            part["p_size"].astype("int64"),
        )
    )
    expected = set()
    for key, price, sz in pts:
        dominated = any(
            (p2 <= price) and (s2 >= sz) and ((p2 < price) or (s2 > sz))
            for _, p2, s2 in pts
        )
        if not dominated:
            expected.add(int(key))
    got = set(
        r.p_partkey for r in skyline_pareto(spark, SF_ORACLE).collect()
    )
    assert got == expected


def test_kanon_every_unsuppressed_class_reaches_k(spark):
    out = anonymize_k_anonymity(spark, SF_ORACLE).toPandas()
    grp = out[out.gen_level < 4].groupby(["gen_level", "class_label"])
    sizes = grp.size()
    assert (sizes >= _KANON_K).all(), sizes[sizes < _KANON_K]
    # class_n must equal the actual class size
    counted = grp["class_n"].nunique()
    assert (counted == 1).all()
    merged = sizes.rename("real_n").reset_index().merge(
        out[out.gen_level < 4].drop_duplicates(
            ["gen_level", "class_label"]
        )[["gen_level", "class_label", "class_n"]]
    )
    assert (merged.real_n == merged.class_n).all()
    # minimality: a record at level L>0 must NOT belong to a >=k class
    # at level 0 (spot-check the strongest claim cheaply)
    lev0_classes = set(
        out[out.gen_level == 0].class_label
    )  # all >=k by the assertion above
    assert not any(
        lbl in lev0_classes for lbl in out[out.gen_level > 0].class_label
    )


def test_readability_formula_spot_check(spark):
    out = text_readability(spark, SF_ORACLE).toPandas()
    r = out.iloc[0]
    W, S, Sy = int(r.n_words), int(r.n_sents), int(r.n_syll)
    fk = (390 * W * W + 11800 * Sy * S - 15590 * W * S) // (W * S)
    # the shift makes Spark's truncation a floor; python // floors too
    assert abs(int(r.fk_grade_milli) - fk) <= 1
    assert (out.n_sents >= 1).all()
    assert (out.n_syll <= out.n_words.max() * 30).all()


def test_dsir_selects_target_like_docs(spark):
    out = corpus_dsir_weights(spark, SF_ORACLE).toPandas()
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").toPandas()
    m = out.merge(docs[["doc_id", "lang"]], on="doc_id")
    sel_en = (m[m.selected].lang == "en").mean()
    rest_en = (m[~m.selected].lang == "en").mean()
    # importance weights must enrich the target language
    assert sel_en > rest_en
    assert m.selected.sum() == len(m) // 4  # ntile quartile


def test_sink_bucketed_join_plan_is_shuffle_free_below_the_join(spark):
    from graph_database_akkatyped_spark.plans.explain import formatted_plan
    from graph_database_akkatyped_spark.sources.parquet import (
        sink_bucketed_join,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = sink_bucketed_join(spark, SF_SMOKE)
        plan = formatted_plan(df)
        assert "SortMergeJoin" in plan
        # the ONLY exchange allowed is the post-join segment aggregate;
        # the join inputs must read co-located buckets shuffle-free
        n_exchange = plan.count("Exchange hashpartitioning")
        assert n_exchange <= 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_holt_tracks_level_on_smoke_fixture(spark):
    out = timeseries_holt(spark, SF_SMOKE).toPandas()
    assert (out.groupby("event_type")["day"].count() >= 1).all()
    # smoothed level stays within the observed milli-count envelope
    # (alpha/beta in (0,1) make Holt a convex tracker after init)
    lo = out.n.min() * 1000 - abs(out.trend_q).max() * 3
    hi = out.n.max() * 1000 + abs(out.trend_q).max() * 3
    assert out.level_q.between(lo, hi).all()
