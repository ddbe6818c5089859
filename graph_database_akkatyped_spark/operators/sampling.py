"""Corpus sampling operators for training-data assembly.

Three ops a pretraining pipeline runs after curation and before
tokenization: per-stratum subsampling (language rebalancing), mixture
re-weighting of oversized sources (inverse-sqrt temperature), and a
unigram-LM quality score (the CCNet-style perplexity proxy used to
tier documents into quality buckets).

Determinism rules (same as the rest of the repo): every sampling
decision is a pure function of the row's id (md5-bucket threshold — no
``rand()``), and every float aggregate that crosses rows is summed in
scaled integers so partition order cannot change the result. That is
what makes these ops hash-checkable against the DuckDB oracle AND
replayable at 100 TB: re-running a failed task, adding executors, or
appending data never flips a keep/drop decision on an existing row.

Scale notes: ``sample_stratified`` and the keep-decision of
``corpus_sample_mixture`` are map-only (zero shuffle — the threshold
table is a handful of rows, broadcast); ``quality_unigram_logprob`` is
one explode + one equi-join against a vocabulary-sized frequency table
(broadcast on a real cluster) + one per-doc agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from graph_database_akkatyped_spark.catalog import load_table

# deterministic per-row bucket in [0, 10000) — md5 is identical across
# engines, so Spark and DuckDB agree row-by-row on keep/drop
_B10K = (
    "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) "
    "AS BIGINT) % 10000"
)
_B10K_SQL = (
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) "
    "% 10000"
)

# per-language keep rates (per-10000). A rebalancing config a curator
# would hand in: downsample the dominant language, keep the tail.
_LANG_THR = {"en": 8000, "de": 5000, "es": 5000, "fr": 5000, "zh": 2000}


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified subsample of ``documents`` by md5-bucket
    threshold: keep a row iff ``bucket(doc_id) < thr[lang]``.

    Map-only — the sampling decision needs no shuffle, no window, no
    count of the stratum: each task reads its split and keeps/drops
    rows locally. That is the only shape that survives 100 TB (an
    exact-k-per-stratum sample needs a per-stratum global sort; a rate
    sample needs nothing). The realized rate converges to thr/10000 by
    the law of large numbers; exactness of the *rate* is not the
    contract, determinism of the *membership* is.
    """
    docs = load_table(spark, sf_dir, "documents")
    thr = F.coalesce(
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in _LANG_THR.items() for x in kv]
            ),
            F.col("lang"),
        ),
        F.lit(0),
    )
    return (
        docs.withColumn("bucket", F.expr(_B10K))
        .where(F.col("bucket") < thr)
        .select("doc_id", "lang", "bucket")
    )


_CASE_THR_SQL = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _LANG_THR.items()
) + " ELSE 0 END"

_SAMPLE_STRATIFIED_SQL = f"""
SELECT doc_id, lang, bucket FROM (
  SELECT doc_id, lang, {_B10K_SQL} AS bucket FROM documents
) WHERE bucket < {_CASE_THR_SQL}
"""


def corpus_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture re-weighting: cap each ``source``'s contribution by an
    inverse-sqrt rule — sources larger than ``n_cap`` docs keep a
    ``sqrt(n_cap / n)`` fraction, small sources keep everything. The
    standard temperature-style flattening of a source-skewed corpus
    (dominant crawl dumps get downsampled, curated tails survive).

    The per-source threshold is ``floor(sqrt(n_cap/n) * 10000)`` — a
    single IEEE sqrt/divide on exact integer counts, bit-identical in
    any engine, deliberately avoiding a cross-source normalizing sum
    whose float accumulation order would differ between engines and
    partitionings. Keep-decision: md5 bucket < threshold (map-only
    after a broadcast of the ~|sources| threshold rows).
    """
    docs = load_table(spark, sf_dir, "documents")
    n_cap = 20
    per_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    thr = F.when(F.col("n_docs") <= n_cap, F.lit(10000)).otherwise(
        F.floor(
            F.sqrt(F.lit(float(n_cap)) / F.col("n_docs").cast("double"))
            * 10000
        ).cast("int")
    )
    rates = per_src.select("source", "n_docs", thr.alias("thr"))
    kept = (
        docs.withColumn("bucket", F.expr(_B10K))
        .join(F.broadcast(rates), "source")
        .where(F.col("bucket") < F.col("thr"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "thr",
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
            F.round(
                F.coalesce("n_kept", F.lit(0)).cast("double")
                / F.col("n_docs"),
                4,
            ).alias("eff_fraction"),
        )
    )


_MIXTURE_SQL = f"""
WITH per_src AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
),
rates AS (
  SELECT source, n_docs,
         CASE WHEN n_docs <= 20 THEN 10000
              ELSE CAST(floor(sqrt(20.0 / n_docs) * 10000) AS INT)
         END AS thr
  FROM per_src
),
kept AS (
  SELECT d.source, count(*) AS n_kept
  FROM (SELECT source, {_B10K_SQL} AS bucket FROM documents) d
  JOIN rates r ON r.source = d.source
  WHERE d.bucket < r.thr
  GROUP BY d.source
)
SELECT r.source, r.n_docs, r.thr,
       COALESCE(k.n_kept, 0) AS n_kept,
       round(CAST(COALESCE(k.n_kept, 0) AS DOUBLE) / r.n_docs, 4)
         AS eff_fraction
FROM rates r LEFT JOIN kept k ON k.source = r.source
"""


def quality_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality scoring: train a unigram LM on the corpus
    itself, score each document by its mean token negative-log-prob,
    and tier documents into per-language quality terciles (bucket 1 =
    most "typical" text, 3 = most surprising). The classic filter for
    keeping head/middle-quality web text and flagging gibberish.

    Cross-row float discipline: per-token ``ln p`` values are floored
    into 1e9-scaled BIGINTs before the per-doc sum, so the aggregate is
    exact integer arithmetic — partition-order-proof and engine-exact.
    The tercile assignment sorts on that integer (tie-break doc_id), so
    bucket boundaries cannot flip on a re-run either.

    Scale: vocabulary frequency table is tiny relative to the corpus —
    broadcast it; the token explode is linear; the per-doc agg is one
    hash aggregate on doc_id. The only window is per-language ntile
    over docs (not tokens); for 100 TB swap ntile for fixed score
    thresholds learned on a sample to stay fully map-side.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.expr("split(text, ' ')")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tc"))
    # corpus token total as an in-plan broadcast scalar (round 11):
    # `toks.count()` was a SECOND full tokenize+count pass executed at
    # plan-construction time (guide §5 — driver actions in a query
    # path). Σ tc over the vocabulary equals the token count exactly,
    # so the scalar now costs one |V|-row aggregate instead of a
    # corpus-sized explode — one full pass removed per invocation.
    # Same IEEE double division — the summed count cast to double
    # equals the old float literal exactly.
    total_f = F.broadcast(
        vocab.agg(F.sum("tc").cast("double").alias("tot"))
    )
    # -ln p(tok), floored into scaled integers for order-proof summing
    nll_int = F.floor(
        -F.log(F.col("tc").cast("double") / F.col("tot")) * 1e9
    ).cast("long")
    scored = (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(total_f)
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(nll_int).alias("nll_sum"),
            F.count(F.lit(1)).alias("n_toks"),
        )
    )
    # order key: double division of exact integers — IEEE-deterministic
    # for identical inputs in every engine (a long*1e6 rescale would
    # overflow int64 at ~1e13 scaled-nll per doc)
    w = Window.partitionBy("lang").orderBy(
        F.col("nll_sum").cast("double") / F.col("n_toks"), "doc_id"
    )
    return scored.select(
        "doc_id",
        "lang",
        F.round(
            F.col("nll_sum").cast("double") / (F.col("n_toks") * 1e9), 8
        ).alias("logprob"),
        F.ntile(3).over(w).alias("q_bucket"),
    )


_UNIGRAM_SQL = """
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
vocab AS (
  SELECT tok, count(*) AS tc FROM toks GROUP BY tok
),
total AS (SELECT count(*) AS n FROM toks),
scored AS (
  SELECT t.doc_id, t.lang,
         SUM(CAST(floor(-ln(CAST(v.tc AS DOUBLE) / (SELECT CAST(n AS DOUBLE) FROM total)) * 1e9) AS BIGINT)) AS nll_sum,
         count(*) AS n_toks
  FROM toks t JOIN vocab v ON v.tok = t.tok
  GROUP BY t.doc_id, t.lang
)
SELECT doc_id, lang,
       round(CAST(nll_sum AS DOUBLE) / (n_toks * 1e9), 8) AS logprob,
       CAST(ntile(3) OVER (
         PARTITION BY lang
         ORDER BY CAST(nll_sum AS DOUBLE) / n_toks, doc_id
       ) AS INT) AS q_bucket
FROM scored
"""


def quality_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM quality scoring — the next rung above
    ``quality_unigram_logprob`` on the CCNet ladder (their filter is a
    KenLM n-gram model; a self-trained interpolated bigram is the
    honest distributed analog). Token 1 of each doc scores by its
    unigram probability; every later token by 0.7·p(tok|prev) +
    0.3·p(tok) — corpus-trained, so every observed bigram has count
    ≥ 1 and no zero branch exists. Per-language terciles as before.

    Same cross-row float discipline as the unigram key: each token's
    -ln p is floored into a 1e9-scaled BIGINT before the per-doc sum
    (exact integer aggregate, partition-order-proof); both interp
    literals are CAST to DOUBLE on the DuckDB side.

    Scale: bigram + unigram count tables are vocabulary-sized
    (broadcastable); the explodes are linear; the only window is
    per-language ntile over docs — swap for sampled fixed thresholds
    at 100 TB, as the unigram docstring already prescribes.
    """
    docs = load_table(spark, sf_dir, "documents")
    ta = docs.select(
        "doc_id", "lang", F.expr("split(text, ' ')").alias("toks")
    )
    toks = ta.select(
        "doc_id", "lang", F.explode("toks").alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tc"))
    # in-plan broadcast scalar via Σ tc over the vocab instead of a
    # construction-time `toks.count()` action — one fewer full
    # tokenize pass per invocation (same rationale and exact-equality
    # argument as quality_unigram_logprob above)
    total_f = F.broadcast(
        vocab.agg(F.sum("tc").cast("double").alias("tot"))
    )
    bg = ta.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(slice(toks, 2, greatest(size(toks) - 1, 0)), "
                "(x, i) -> concat(toks[i], ' ', x))"
            )
        ).alias("bg"),
    )
    bcount = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("bc"))
    d = lambda c: F.col(c).cast("double")
    # head token: pure unigram
    head = (
        ta.select(
            "doc_id", "lang", F.element_at("toks", 1).alias("tok")
        )
        .join(F.broadcast(vocab), "tok")
        .crossJoin(total_f)
        .select(
            "doc_id",
            "lang",
            F.floor(-F.log(d("tc") / F.col("tot")) * 1e9)
            .cast("long")
            .alias("nll"),
        )
    )
    # body tokens: 0.7 * p(tok|prev) + 0.3 * p(tok)
    p_int = (F.lit(0.7) * (d("bc") / d("pc"))) + (
        F.lit(0.3) * (d("tc") / F.col("tot"))
    )
    body = (
        bg.join(F.broadcast(bcount), "bg")
        .select(
            "doc_id",
            "lang",
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("prev"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("tok"),
            "bc",
        )
        .join(F.broadcast(vocab.select(F.col("tok").alias("prev"), F.col("tc").alias("pc"))), "prev")
        .join(F.broadcast(vocab), "tok")
        .crossJoin(total_f)
        .select(
            "doc_id",
            "lang",
            F.floor(-F.log(p_int) * 1e9).cast("long").alias("nll"),
        )
    )
    scored = (
        head.unionByName(body)
        .groupBy("doc_id", "lang")
        .agg(F.sum("nll").alias("nll_sum"), F.count(F.lit(1)).alias("n_toks"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("nll_sum").cast("double") / F.col("n_toks"), "doc_id"
    )
    return scored.select(
        "doc_id",
        "lang",
        F.round(
            F.col("nll_sum").cast("double") / (F.col("n_toks") * 1e9), 8
        ).alias("logprob"),
        F.ntile(3).over(w).alias("q_bucket"),
    )


_BIGRAM_SQL = """
WITH ta AS MATERIALIZED (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
),
toks AS MATERIALIZED (
  SELECT doc_id, lang, unnest(toks) AS tok FROM ta
),
vocab AS MATERIALIZED (
  SELECT tok, count(*) AS tc FROM toks GROUP BY tok
),
total AS (SELECT count(*) AS n FROM toks),
bg AS MATERIALIZED (
  SELECT doc_id, lang,
         unnest(list_transform(
           list_slice(toks, 2, len(toks)),
           (x, i) -> toks[i] || ' ' || x)) AS bg
  FROM ta
),
bcount AS MATERIALIZED (
  SELECT bg, count(*) AS bc FROM bg GROUP BY bg
),
head AS (
  SELECT t.doc_id, t.lang,
         CAST(floor(-ln(CAST(v.tc AS DOUBLE)
                        / (SELECT CAST(n AS DOUBLE) FROM total)) * 1e9)
              AS BIGINT) AS nll
  FROM (SELECT doc_id, lang, toks[1] AS tok FROM ta) t
  JOIN vocab v ON v.tok = t.tok
),
body AS (
  SELECT g.doc_id, g.lang,
         CAST(floor(-ln(
           (CAST(0.7 AS DOUBLE) * (CAST(b.bc AS DOUBLE) / CAST(pv.tc AS DOUBLE)))
           + (CAST(0.3 AS DOUBLE) * (CAST(v.tc AS DOUBLE)
                / (SELECT CAST(n AS DOUBLE) FROM total)))
         ) * 1e9) AS BIGINT) AS nll
  FROM bg g
  JOIN bcount b ON b.bg = g.bg
  JOIN vocab pv ON pv.tok = split_part(g.bg, ' ', 1)
  JOIN vocab v ON v.tok = split_part(g.bg, ' ', 2)
),
scored AS (
  SELECT doc_id, lang, SUM(nll) AS nll_sum, count(*) AS n_toks
  FROM (SELECT * FROM head UNION ALL SELECT * FROM body)
  GROUP BY doc_id, lang
)
SELECT doc_id, lang,
       round(CAST(nll_sum AS DOUBLE) / (n_toks * 1e9), 8) AS logprob,
       CAST(ntile(3) OVER (
         PARTITION BY lang
         ORDER BY CAST(nll_sum AS DOUBLE) / n_toks, doc_id
       ) AS INT) AS q_bucket
FROM scored
"""


_CURRICULUM_BUCKETS = 3   # easy / medium / hard
_CURRICULUM_SHARDS = 8    # round-robin shard assignment over the order


def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering — the step between sampling and
    sequence packing when training wants easy→hard presentation:
    bucket documents into ``_CURRICULUM_BUCKETS`` difficulty tiers
    (short→long via ``ntile`` over (n_chars, doc_id) — the standard
    cheap difficulty proxy; swap the ORDER BY for a model-scored
    column and nothing else changes), then DETERMINISTICALLY shuffle
    within each tier (md5(doc_id) — no ``rand()``, the repo-wide
    replayability rule), emit the global training position and a
    round-robin shard assignment.

    Why the shuffle matters: without it a tier replays the corpus in
    storage order — correlated batches. md5 gives a uniform, seedless
    permutation that every re-run, retry and engine reproduces.

    Shape: ntile + row_number are two window passes over (bucket)
    partitions; at 100 TB ntile over a single global ORDER BY would
    serialize, so the production variant computes tier BOUNDARIES from
    approx quantiles of n_chars (one tiny collect) and maps rows by
    range — the fixture key keeps exact ntile so the oracle is exact;
    positions stay per-shard-writable because the final sort is only
    within the write of each shard's file."""
    docs = load_table(spark, sf_dir, "documents")
    wtier = Window.orderBy("n_chars", "doc_id")
    tiered = docs.select(
        "doc_id",
        "n_chars",
        F.ntile(_CURRICULUM_BUCKETS).over(wtier).alias("bucket"),
        F.md5(F.col("doc_id").cast("string")).alias("shuf"),
    )
    wpos = Window.orderBy("bucket", "shuf", "doc_id")
    return tiered.select(
        "doc_id",
        "bucket",
        F.row_number().over(wpos).alias("position"),
        ((F.row_number().over(wpos) - 1) % _CURRICULUM_SHARDS).alias(
            "shard_id"
        ),
    )


_CURRICULUM_SQL = f"""
WITH tiered AS (
  SELECT doc_id, n_chars,
         ntile({_CURRICULUM_BUCKETS}) OVER (ORDER BY n_chars, doc_id)
           AS bucket,
         md5(CAST(doc_id AS VARCHAR)) AS shuf
  FROM documents
)
SELECT doc_id, CAST(bucket AS INTEGER) AS bucket,
       CAST(row_number() OVER w AS BIGINT) AS position,
       CAST((row_number() OVER w - 1) % {_CURRICULUM_SHARDS} AS BIGINT)
         AS shard_id
FROM tiered
WINDOW w AS (ORDER BY bucket, shuf, doc_id)
"""


QUERIES = {
    "sample_stratified": sample_stratified,
    "corpus_sample_mixture": corpus_sample_mixture,
    "quality_unigram_logprob": quality_unigram_logprob,
    "quality_bigram_logprob": quality_bigram_logprob,
    "corpus_curriculum_order": corpus_curriculum_order,
}

ORACLES = {
    "corpus_curriculum_order": _CURRICULUM_SQL,
    "sample_stratified": _SAMPLE_STRATIFIED_SQL,
    "corpus_sample_mixture": _MIXTURE_SQL,
    "quality_unigram_logprob": _UNIGRAM_SQL,
    "quality_bigram_logprob": _BIGRAM_SQL,
}
