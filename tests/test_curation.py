"""Semantic unit tests for the curation + extras operators on
hand-built inputs with known answers (fixture parity is covered by
tests/test_oracle_parity.py; these pin the *meaning*)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_database_akkatyped_spark.operators.curation import (
    _EMAIL_RE,
    _LONGNUM_RE,
)
from graph_database_akkatyped_spark.operators.llm import _GRAM_EXPR
from graph_database_akkatyped_spark.operators.graph_extras import ppr_frame


def test_pii_patterns_redact_known_text(spark):
    df = spark.createDataFrame(
        [
            (1, "contact bob@example.com or call 5551234567 now"),
            (2, "no pii here"),
        ],
        "doc_id long, text string",
    )
    red = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _LONGNUM_RE, "<NUM>"
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.regexp_count("text", F.lit(_EMAIL_RE)).alias("n_email"),
            F.regexp_count("text", F.lit(_LONGNUM_RE)).alias("n_num"),
            red.alias("red"),
        ).collect()
    }
    assert rows[1]["n_email"] == 1 and rows[1]["n_num"] == 1
    assert rows[1]["red"] == "contact <EMAIL> or call <NUM> now"
    assert rows[2]["red"] == "no pii here"


def test_repetition_grams_on_looped_text(spark):
    # "a b a b a b" -> trigrams: "a b a","b a b","a b a","b a b" ->
    # 4 total, 2 distinct
    df = spark.createDataFrame(
        [(1, "a b a b a b")], "doc_id long, text string"
    )
    row = df.select(
        F.size(F.expr(_GRAM_EXPR)).alias("n"),
        F.size(F.array_distinct(F.expr(_GRAM_EXPR))).alias("nd"),
    ).first()
    assert (row["n"], row["nd"]) == (4, 2)


def test_short_docs_produce_no_grams(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two")], "doc_id long, text string"
    )
    assert df.select(F.explode(F.expr(_GRAM_EXPR))).count() == 0


def test_ppr_mass_concentrates_at_seed(spark):
    # star graph: seed 0 at center of 1..4
    edges = [(0, i) for i in range(1, 5)]
    sym = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "a long, b long"
    )
    verts = spark.createDataFrame([(i,) for i in range(5)], "id long")
    ranks = {
        r["id"]: r["rank_e12"]
        for r in ppr_frame(verts, sym, seed_id=0, iters=5).collect()
    }
    # seed holds the restart mass; leaves split the walk mass equally
    assert ranks[0] > ranks[1] > 0
    assert len({ranks[i] for i in range(1, 5)}) == 1


def test_topo_depth_on_chain(spark):
    from graph_database_akkatyped_spark.operators import graph_extras as ge

    # depth should equal position along the canonical chain 1<2<3
    ce = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    verts = ce.select(F.col("a").alias("id")).unionAll(
        ce.select(F.col("b").alias("id"))
    ).distinct()
    d = verts.withColumn("depth", F.lit(0).cast("long"))
    for _ in range(4):
        msgs = (
            ce.join(d.withColumnRenamed("id", "a"), "a")
            .groupBy(F.col("b").alias("id"))
            .agg(F.max(F.col("depth") + 1).alias("m"))
        )
        d = d.join(msgs, "id", "left").select(
            "id", F.greatest("depth", F.coalesce("m", F.lit(0))).alias("depth")
        )
    depths = {r["id"]: r["depth"] for r in d.collect()}
    assert depths == {1: 0, 2: 1, 3: 2}


def test_retention_cohort_offsets(spark):
    import datetime as dt

    orders = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 10)),
            (1, dt.date(2024, 3, 5)),
            (2, dt.date(2024, 2, 1)),
        ],
        "o_custkey long, o_orderdate date",
    )
    first = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    cells = {
        (r["cohort"].month, r["month_offset"]): r["n_active"]
        for r in orders.join(first, "o_custkey")
        .withColumn("m", F.date_trunc("month", "o_orderdate"))
        .groupBy(
            "cohort",
            (
                (F.year("m") - F.year("cohort")) * 12
                + (F.month("m") - F.month("cohort"))
            ).alias("month_offset"),
        )
        .agg(F.countDistinct("o_custkey").alias("n_active"))
        .collect()
    }
    # cust 1: cohort Jan, active at offsets 0 and 2; cust 2: cohort Feb
    assert cells == {(1, 0): 1, (1, 2): 1, (2, 0): 1}
