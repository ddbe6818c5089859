"""Semantic checks for the corpus-sampling family (operators.sampling)
beyond the oracle-parity hash: membership determinism, rate bounds,
and tier balance."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_akkatyped_spark.operators import sampling
from tests.conftest import SF_ORACLE


def test_stratified_membership_is_deterministic(spark):
    a = sampling.sample_stratified(spark, SF_ORACLE)
    b = sampling.sample_stratified(spark, SF_ORACLE)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_stratified_rates_near_target(spark):
    kept = (
        sampling.sample_stratified(spark, SF_ORACLE)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    total = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = {
        r["lang"]: r["k"] / r["n"]
        for r in kept.join(total, "lang").collect()
    }
    for lang, thr in sampling._LANG_THR.items():
        # md5 buckets are uniform-ish; on ~100-doc strata allow wide play
        assert abs(rows[lang] - thr / 10000) < 0.25, (lang, rows[lang])


def test_mixture_caps_only_large_sources(spark):
    out = sampling.corpus_sample_mixture(spark, SF_ORACLE).collect()
    for r in out:
        if r["n_docs"] <= 20:
            assert r["thr"] == 10000 and r["n_kept"] == r["n_docs"]
        else:
            assert r["thr"] < 10000
            assert r["n_kept"] <= r["n_docs"]


def test_unigram_terciles_balanced_per_lang(spark):
    out = (
        sampling.quality_unigram_logprob(spark, SF_ORACLE)
        .groupBy("lang", "q_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per_lang: dict = {}
    for r in out:
        per_lang.setdefault(r["lang"], {})[r["q_bucket"]] = r["n"]
    for lang, buckets in per_lang.items():
        assert set(buckets) == {1, 2, 3}, (lang, buckets)
        # ntile guarantees sizes differ by at most 1
        assert max(buckets.values()) - min(buckets.values()) <= 1


def test_bigram_logprob_structure(spark):
    """quality_bigram_logprob invariants: one row per document, nll is
    positive (corpus-trained probabilities are < 1), terciles are
    within {1,2,3} per language, and the interpolated score is finite
    everywhere (no zero branch exists for observed bigrams)."""
    from graph_database_akkatyped_spark.operators.sampling import (
        quality_bigram_logprob,
    )
    from tests.conftest import SF_SMOKE

    out = quality_bigram_logprob(spark, SF_SMOKE).collect()
    assert out
    from graph_database_akkatyped_spark.catalog import load_table

    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert len(out) == n_docs
    for r in out:
        assert r.q_bucket in (1, 2, 3)
        assert r.logprob > 0
