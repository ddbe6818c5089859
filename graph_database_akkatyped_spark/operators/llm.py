"""LLM-training-data pipeline operators (SURVEY.md §2-G; mandated by
BASELINE.json): deduplication (exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine), similarity search (exact top-k + LSH scale
path), text analysis (wordcount, TF-IDF, n-grams, language-ID, quality
scoring, token counting, fingerprinting, lexicon sentiment), and
multimodal column plumbing.

Scale notes:
- Everything stays in built-in JVM expressions except the deliberate
  Pandas-UDF multimodal decode (Arrow-batched, stubbed per environment).
- Near-dup methods are the scale story: exact pair joins are quadratic,
  so MinHash/SimHash/LSH bucket first and only compare within buckets.
- Cosine math is done in doubles with a fixed left-to-right accumulation
  order (zip_with + aggregate) so results are bit-identical to the
  DuckDB oracle's mirrored list_transform/list_sum pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from graph_database_akkatyped_spark.caching import (
    cut,
    layout_dir,
    memoized_checkpoint,
    release_cut,
)
from graph_database_akkatyped_spark.catalog import load_table
from graph_database_akkatyped_spark.numerics import davg, sql_davg

# --------------------------------------------------------------- helpers

_TOKS = "split(text, ' ')"


def _dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] in doubles, strict left-to-right accumulation.

    The higher-order fold is the fastest exact-order formulation here:
    unrolling 64 getItem+multiply terms into one expression was measured
    2x SLOWER (the 128-node tree falls out of whole-stage codegen), and
    numpy-backed pandas UDFs change the summation order (pairwise/SIMD)
    which would break bit-parity with the DuckDB oracle.

    Round-11 codegen audit (same-session A/B on an 800k-dot 64-dim
    workload, candidate run first): the HOF-bearing HashAggregate has
    ZERO WholeStageCodegen spans — higher-order functions are
    CodegenFallback, so this expression is interpreted per-row and no
    restructuring brings it back inside codegen. Two exact-order
    alternatives both lost: a sequence-index fold
    (aggregate(sequence(1,size), acc + a[i]*b[i]) — skips the zip_with
    intermediate) was 1.3x SLOWER (5.46 vs 4.17 s median), and
    pre-casting both arrays to array<double> outside the lambda was
    within run-to-run noise (~5%). Both bit-parity-identical. The
    incumbent stands; measurements in BASELINE.md round 11.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sql_dot(a: str, b: str) -> str:
    """DuckDB twin of :func:`_dot` (list_zip pads like zip_with; inputs
    are equal length here)."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))"
    )


# ------------------------------------------------------------------ dedup


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text hash; keeper = min doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    return (
        docs.select(h.alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


_DEDUP_EXACT_SQL = """
SELECT sha256(lower(trim(text))) AS text_hash,
       min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via word-3-gram shingles -> MinHash-LSH
    approxSimilarityJoin (Jaccard distance ≤ 0.7). The LSH banding makes
    this linear-ish in corpus size vs the quadratic exact join — the
    100 TB dedup path. Seeded -> deterministic, and HASH-GRADE since
    round 9: approxSimilarityJoin admits no false positives (the exact
    distance filters candidates), and the fixtures' similarity gap is
    wide (every true pair has J >= 0.8, every non-pair J <= 0.14 —
    measured at sf0.001/0.01/0.1), so the returned pair set EQUALS the
    exact J >= 0.3 gram-Jaccard set and the oracle computes that set
    directly (round-8 VERDICT #1). The engine-specific float distance
    column is dropped from the contract for that reason — consumers
    needing scores join ``dedup_ngram_jaccard``.

    Boundary semantics (round-9 ADVICE): the two sides are NOT
    identical at the threshold itself — Spark filters STRICT
    ``jaccard_dist < 0.7`` computed over 2^18-bucket HashingTF vectors
    (feature collisions can perturb J slightly for very large docs),
    while the oracle's ``c * 10 >= (sa.n + sb.n - c) * 3`` is the
    CLOSED J >= 0.3 test on exact gram sets. A pair sitting at or
    within collision-distance of J = 0.3 could diverge between the
    engines; it is the measured 0.14-to-0.8 fixture gap above that
    keeps the boundary unpopulated and the hash match safe. On a
    corpus where pairs cluster near the threshold, treat a mismatch on
    this key as a boundary/accuracy miss to re-measure, not an engine
    bug.

    The shingle->HashingTF frame is materialized (localCheckpoint,
    memoized per session+sf_dir — see caching.py for why, and for the
    replicated-persist guidance at cluster scale) before the self-join:
    approxSimilarityJoin references it on BOTH sides, and without the
    cut each side re-tokenizes and re-hashes the whole corpus — the
    round-2 bench showed that recomputation as a 2.4x regression. At
    cluster scale the same rule holds: persist the featurized corpus
    once, band-join the cached blocks."""
    from pyspark.ml.feature import HashingTF, MinHashLSH, NGram

    def featurize() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", F.split("text", " ").alias("tokens")
        )
        grams = NGram(n=3, inputCol="tokens", outputCol="shingles").transform(
            docs
        )
        return (
            HashingTF(
                inputCol="shingles", outputCol="features",
                numFeatures=1 << 18, binary=True,
            )
            .transform(grams)
            .select("doc_id", "features")
        )

    tf = memoized_checkpoint(spark, "minhash_tf", sf_dir, featurize)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=5, seed=42
    ).fit(tf)
    pairs = lsh.approxSimilarityJoin(tf, tf, 0.7, distCol="jaccard_dist")
    return (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("a"),
            F.col("datasetB.doc_id").alias("b"),
        )
    )


_NEAR_MINHASH_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS MATERIALIZED (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
    FROM toks WHERE len(t) >= 3)
),
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
common AS (
  SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS c
  FROM grams ga JOIN grams gb ON ga.g = gb.g AND ga.doc_id < gb.doc_id
  GROUP BY 1, 2
)
SELECT a, b
FROM common JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
WHERE c * 10 >= (sa.n + sb.n - c) * 3
"""


def _simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per doc: per-token 32-bit hash, sign-sum each
    bit. The token hash is the first 8 md5 hex digits (the same
    engine-portable construction as the Luby MIS priorities) — SimHash
    is hash-agnostic, and md5 is what makes the whole pipeline
    DuckDB-replicable (the original xxhash64 kept this key
    rows-only)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.expr(_TOKS)).alias("tok"))
    hashed = toks.select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    )
    bit_sums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(h >> {i}) & 1 = 1"), 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(32)
        ]
    )
    fp = None
    for i in range(32):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(1 << i).cast("long")
        fp = bit if fp is None else fp + bit
    return bit_sums.select("doc_id", fp.alias("simhash32"))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: band on the 4 bytes of the fingerprint
    (any equal byte -> candidate), verify Hamming distance ≤ 6.
    Banding keeps the candidate set near-linear. SQL-hash since round
    7 (the md5-based token hash replicates in DuckDB; see
    ``_simhash_fingerprint``)."""
    fp = memoized_checkpoint(
        spark, "simhash_fp", sf_dir,
        lambda: _simhash_fingerprint(spark, sf_dir),
    )
    banded = fp.select(
        "doc_id",
        "simhash32",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.expr(f"(simhash32 >> {8 * i}) & 255").alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash32", "bk.band", "bk.key")
    a = banded.select(
        F.col("doc_id").alias("a"), F.col("simhash32").alias("fp_a"), "band", "key"
    )
    b = banded.select(
        F.col("doc_id").alias("b"), F.col("simhash32").alias("fp_b"), "band", "key"
    )
    return (
        a.join(b, ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "fp_a", "fp_b")
        .distinct()
        .withColumn("hamming", F.expr("bit_count(fp_a ^ fp_b)"))
        .where(F.col("hamming") <= 6)
        .select("a", "b", "hamming")
    )


_DEDUP_SIMHASH_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
hashed AS MATERIALIZED (
  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS h
  FROM toks
),
bits AS (
  SELECT doc_id, i,
         SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM hashed CROSS JOIN (SELECT unnest(range(32)) AS i)
  GROUP BY doc_id, i
),
fp AS MATERIALIZED (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << i
                       ELSE 0 END) AS BIGINT) AS simhash32
  FROM bits GROUP BY doc_id
),
banded AS MATERIALIZED (
  SELECT doc_id, simhash32, i AS band, (simhash32 >> (8 * i)) & 255 AS key
  FROM fp CROSS JOIN (SELECT unnest(range(4)) AS i)
)
SELECT a, b, CAST(bit_count(xor(fa, fb)) AS INTEGER) AS hamming
FROM (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         x.simhash32 AS fa, y.simhash32 AS fb
  FROM banded x
  JOIN banded y ON y.band = x.band AND y.key = x.key
                AND x.doc_id < y.doc_id
)
WHERE bit_count(xor(fa, fb)) <= 6
"""


_NGRAM_HASHES = 8  # deterministic minhash functions (1 band each, r=1)
_JACCARD_MIN = 0.1


# word-3-gram shingles; the slice length is clamped to ≥ 0: a doc with
# < 3 tokens has no 3-grams — an unclamped ``size - 2`` goes negative
# and Spark raises INVALID_PARAMETER_VALUE on exactly the short/empty
# docs a real dedup corpus contains (the DuckDB twin's list_slice
# clamps, so the engines would diverge)
_GRAM_EXPR = (
    f"transform(slice({_TOKS}, 1, greatest(size({_TOKS}) - 2, 0)), "
    f"(x, i) -> concat(x, ' ', {_TOKS}[i + 1], ' ', {_TOKS}[i + 2]))"
)

# Same shingles over a PRE-PROJECTED `toks` array column. Expressions
# referenced inside a higher-order-function lambda re-evaluate per
# element access, so `split(text)[i + 1]` inside transform() re-splits
# the whole document for every gram — O(tokens²) character work.
# Projecting the split once (CollapseProject keeps multi-use aliases
# materialized) made text_repetition 6x faster at sf0.1; every
# gram-family operator goes through this form.
_GRAM_FROM_TOKS = (
    "transform(slice(toks, 1, greatest(size(toks) - 2, 0)), "
    "(x, i) -> concat(x, ' ', toks[i + 1], ' ', toks[i + 2]))"
)


def _toks_frame(docs: DataFrame, *cols: str) -> DataFrame:
    """Project the whitespace token array ONCE (see _GRAM_FROM_TOKS)."""
    return docs.select(*cols, F.expr(_TOKS).alias("toks"))


def _gram_frame(docs: DataFrame) -> DataFrame:
    """Distinct (doc_id, g) word-3-gram shingles (see ``_GRAM_EXPR``)."""
    return (
        _toks_frame(docs, "doc_id")
        .select("doc_id", F.explode(F.expr(_GRAM_FROM_TOKS)).alias("g"))
        .distinct()
    )


def _minhash(k: int) -> Column:
    """60-bit salted md5 hash of a shingle — the same bytes both engines
    can compute, so the minhash signature (and therefore the candidate
    set) is bit-identical to the SQL oracle. Hash 2s and 2s+1 are the
    two 60-bit halves of md5(g|s): 8 hash functions for 4 md5 calls
    (md5 dominates signature cost at corpus scale)."""
    salt, off = k // 2, 1 if k % 2 == 0 else 17
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("g"), F.lit(f"|{salt}"))), off, 15
            ),
            16,
            10,
        ).cast("long")
    )


def _minhash_sql(k: int) -> str:
    salt, off = k // 2, 1 if k % 2 == 0 else 17
    return f"CAST('0x' || substr(md5(g || '|{salt}'), {off}, 15) AS BIGINT)"


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard ≥ 0.1 near-dup pairs, MinHash-banded.

    The scale shape (and the fix for the quadratic exact shingle join
    flagged in round 1): candidates are pairs agreeing on ANY of 8
    deterministic minhashes — linear explode + equi-join on (k, minhash)
    buckets — then ONLY candidates get the exact |A∩B| verify. The
    minhashes are salted md5s computable identically in SQL, so the
    banded candidate set (hence the full result) hash-matches the oracle
    exactly. Recall vs the abstract all-pairs join is 1-(1-J)^8 — ≈1.0
    for true near-dups (J ≥ 0.5), a documented subset at the J≈0.1
    fringe. The exact all-pairs form lives only in the unit-test
    fixture (tests/test_dedup_synthetic.py)."""
    # the full verified pair frame is memoized: dedup_clusters /
    # dedup_keep_best / corpus_dedup_report all derive from it, so the
    # banded candidate join runs once per (session, sf_dir) — the same
    # shared-frame treatment as the triangle family (round 4)
    return memoized_checkpoint(
        spark, "ngram_pairs", sf_dir, lambda: _ngram_pairs(spark, sf_dir)
    )


def _ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-12 (guide §2.3/§2.4, the containment n_g discipline applied
    # to the Jaccard pair frame): n_g rides the signature aggregate for
    # free (same groupBy) and the band join, so the verify reads the
    # counts back from its own groupBy (max of a per-pair constant)
    # instead of joining a per-doc sizes frame twice — plan Exchange
    # 28→20, SortMergeJoin 10→6, same-JVM ABBA-paired A/B 0.90.
    # MEASURED NEGATIVE (recorded so round 13 doesn't re-derive it):
    # additionally ordering each pair small-side-first and exploding by
    # the smaller gram set — the `_contain_verify` shape — cut explode
    # rows 4.92 M → 3.85 M at sf0.1 but measured 1.11× SLOWER paired
    # (the when()-relabel projections, the computed sdoc join key and
    # the wider distinct cost more than the 22 % row saving buys on the
    # fixture's near-uniform gram counts). The containment keys keep
    # the min-side shape: their regime IS the skewed excerpt⊂host case
    # the Σ min(|A|,|B|) bound targets, and it was measured 0.83 there
    # (round 11).
    docs = load_table(spark, sf_dir, "documents")
    grams = memoized_checkpoint(  # used 3x below
        spark, "ngram_grams", sf_dir, lambda: _gram_frame(docs)
    )
    sigs = grams.groupBy("doc_id").agg(
        *[F.min(_minhash(k)).alias(f"m{k}") for k in range(_NGRAM_HASHES)],
        F.count(F.lit(1)).alias("n_g"),
    )
    lsig = sigs.select(
        "doc_id",
        "n_g",
        F.posexplode(
            F.array(*[F.col(f"m{k}") for k in range(_NGRAM_HASHES)])
        ).alias("k", "mh"),
    )
    s1 = lsig.select(
        F.col("doc_id").alias("a"), F.col("n_g").alias("n_a"), "k", "mh"
    )
    s2 = lsig.select(
        F.col("doc_id").alias("b"), F.col("n_g").alias("n_b"), "k", "mh"
    )
    cand = (
        s1.join(s2, ["k", "mh"])
        .where(F.col("a") < F.col("b"))
        # n_a/n_b are functions of a/b, so the distinct's cardinality
        # (and the candidate pair set) is unchanged by carrying them
        .select("a", "b", "n_a", "n_b")
        .distinct()
    )
    ga = grams.select(F.col("doc_id").alias("a"), "g")
    gb = grams.select(F.col("doc_id").alias("b"), "g")
    common = (
        cand.join(ga, "a")
        .join(gb, ["b", "g"])
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            # constant per (a, b) group — max() reads them back
            # without a sizes join
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
        )
    )
    return (
        common.withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .where(F.col("jaccard") >= _JACCARD_MIN)
        .select("a", "b", "n_common", "jaccard")
    )


_DEDUP_NGRAM_SQL = f"""
WITH grams AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         unnest(list_filter(
           list_transform(
             list_slice(toks, 1, greatest(len(toks) - 2, 0)),
             (x, i) -> x || ' ' || toks[i + 1] || ' ' || toks[i + 2]),
           g -> g IS NOT NULL)) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
),
sizes AS (SELECT doc_id, count(*) AS n_g FROM grams GROUP BY doc_id),
sigs AS MATERIALIZED (
  SELECT doc_id,
         {', '.join(f'min({_minhash_sql(k)}) AS m{k}' for k in range(_NGRAM_HASHES))}
  FROM grams GROUP BY doc_id
),
lsig AS MATERIALIZED (
  {' UNION ALL '.join(f'SELECT doc_id, {k} AS k, m{k} AS mh FROM sigs' for k in range(_NGRAM_HASHES))}
),
cand AS MATERIALIZED (
  SELECT DISTINCT l1.doc_id AS a, l2.doc_id AS b
  FROM lsig l1
  JOIN lsig l2 ON l1.k = l2.k AND l1.mh = l2.mh AND l1.doc_id < l2.doc_id
),
common AS (
  SELECT c.a, c.b, count(*) AS n_common
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.a
  JOIN grams gb ON gb.doc_id = c.b AND gb.g = ga.g
  GROUP BY c.a, c.b
)
SELECT a, b, n_common,
       CAST(n_common AS DOUBLE) / CAST(na.n_g + nb.n_g - n_common AS DOUBLE)
         AS jaccard
FROM common
JOIN sizes na ON na.doc_id = a
JOIN sizes nb ON nb.doc_id = b
WHERE CAST(n_common AS DOUBLE) / CAST(na.n_g + nb.n_g - n_common AS DOUBLE)
      >= {_JACCARD_MIN}
"""


def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOURCE-level n-gram contamination matrix: for every source pair,
    the number of shared word-3-gram types and the overlap coefficient
    (shared / min vocab, basis points) — the corpus-curation view one
    level above ``decontam_ngram_overlap`` (which gates documents
    against a benchmark): before mixing sources into a training set,
    the owner reads THIS to find mirrored/scraped-from-each-other
    sources whose joint weight would double-count content.

    Scale shape: distinct (source, gram) is one explode + dedup; the
    pair join groups by gram, and each gram contributes at most
    C(|sources|, 2) pairs — sources are a small constant (20 here), so
    the join output is <= 190·|gram types|, LINEAR in the vocabulary
    at any corpus size (contrast doc-level pair joins, which need the
    MinHash banding). Output: (src_a, src_b, n_shared, n_a, n_b,
    overlap_bp)."""
    docs = load_table(spark, sf_dir, "documents")
    sg = (
        _toks_frame(docs.select(F.col("source").alias("sid"), "text"), "sid")
        .select("sid", F.explode(F.expr(_GRAM_FROM_TOKS)).alias("g"))
        .distinct()
    )
    sizes = sg.groupBy("sid").agg(F.count(F.lit(1)).alias("n_g"))
    a = sg.select(F.col("sid").alias("src_a"), "g")
    b = sg.select(F.col("sid").alias("src_b"), "g")
    shared = (
        a.join(b, "g")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    na = sizes.select(F.col("sid").alias("src_a"), F.col("n_g").alias("n_a"))
    nb = sizes.select(F.col("sid").alias("src_b"), F.col("n_g").alias("n_b"))
    return (
        shared.join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr("n_shared * 10000 div least(n_a, n_b)").alias(
                "overlap_bp"
            ),
        )
    )


_SOURCE_OVERLAP_SQL = """
WITH sg AS MATERIALIZED (
  SELECT DISTINCT source AS sid,
         unnest(list_filter(
           list_transform(
             list_slice(toks, 1, greatest(len(toks) - 2, 0)),
             (x, i) -> x || ' ' || toks[i + 1] || ' ' || toks[i + 2]),
           g -> g IS NOT NULL)) AS g
  FROM (SELECT source, string_split(text, ' ') AS toks FROM documents)
),
sizes AS (SELECT sid, CAST(count(*) AS BIGINT) AS n_g FROM sg GROUP BY sid),
shared AS (
  SELECT a.sid AS src_a, b.sid AS src_b, CAST(count(*) AS BIGINT) AS n_shared
  FROM sg a JOIN sg b ON a.g = b.g AND a.sid < b.sid
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_shared, na.n_g AS n_a, nb.n_g AS n_b,
       n_shared * 10000 // least(na.n_g, nb.n_g) AS overlap_bp
FROM shared
JOIN sizes na ON na.sid = src_a
JOIN sizes nb ON nb.sid = src_b
"""


_EDIT_MAX_PCT = 20  # keep pairs whose edit distance <= 20% of the longer doc


def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by EDIT DISTANCE — the character-level similarity
    notion the shingle family can't express (Jaccard sees bags of
    3-grams; Levenshtein sees insert/delete/substitute cost, catching
    small in-place edits and template fills that move few grams but
    many, or few, characters). The production shape: the O(|a|·|b|) DP
    is NEVER run all-pairs — candidates come from the memoized
    MinHash-banded pair frame (``dedup_ngram_jaccard``; linear band
    join), and only candidates pay the Levenshtein, so total DP cost
    is O(candidates · L²) with L bounded by document length, not
    corpus size. Both engines ship the identical classic Levenshtein
    (Spark ``levenshtein``, DuckDB ``levenshtein``), so the distances
    — and the <= ``_EDIT_MAX_PCT``%-of-longer-doc gate, computed in
    integer cross-multiplied form — hash-match exactly.

    Output: (a, b, edit_dist, len_a, len_b) for qualifying pairs."""
    docs = load_table(spark, sf_dir, "documents")
    cand = dedup_ngram_jaccard(spark, sf_dir).select("a", "b")
    ta = docs.select(
        F.col("doc_id").alias("a"),
        F.col("text").alias("text_a"),
        F.length("text").cast("long").alias("len_a"),
    )
    tb = docs.select(
        F.col("doc_id").alias("b"),
        F.col("text").alias("text_b"),
        F.length("text").cast("long").alias("len_b"),
    )
    return (
        cand.join(ta, "a")
        .join(tb, "b")
        .withColumn(
            "edit_dist", F.levenshtein("text_a", "text_b").cast("long")
        )
        .where(
            F.col("edit_dist") * 100
            <= F.greatest("len_a", "len_b") * _EDIT_MAX_PCT
        )
        .select("a", "b", "edit_dist", "len_a", "len_b")
    )


_EDIT_DIST_SQL = f"""
SELECT p.a, p.b,
       CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
       CAST(length(da.text) AS BIGINT) AS len_a,
       CAST(length(db.text) AS BIGINT) AS len_b
FROM ({_DEDUP_NGRAM_SQL}) p
JOIN documents da ON da.doc_id = p.a
JOIN documents db ON db.doc_id = p.b
WHERE CAST(levenshtein(da.text, db.text) AS BIGINT) * 100
      <= greatest(length(da.text), length(db.text)) * {_EDIT_MAX_PCT}
"""


_CONTAIN_MIN = 0.5  # report pairs where either direction's containment clears this


def _contain_verify(cand: DataFrame, grams: DataFrame) -> DataFrame:
    """Exact containment verify shared by both containment keys:
    count |A∩B| for every candidate pair, then keep pairs where either
    direction's containment clears ``_CONTAIN_MIN``. ``cand`` must
    carry the per-doc gram counts (a, b, n_a, n_b) — both candidate
    generators produce them for free (see the callers), which is the
    whole point of this round's shape.

    Round-12 (guide §2.2/§3, VERDICT r11 #1): the round-11 shape
    joined a separate per-doc sizes frame FOUR times — twice before
    the explode to order each pair small-side-first (+4 SMJ pre-AQE,
    the round-11 driver's one open regression suspect), twice after
    the pair aggregate to compute the containment ratios. With n_a/n_b
    threaded in from candidate generation, the small-side ordering is
    a pure projection and the ratios read columns the aggregated row
    already carries (n_s/n_m ride the explode as two constant longs
    per pair and collapse in the map-side partial aggregate): zero
    sizes joins remain. The explode itself stays on each pair's
    SMALLER gram set (Σ min(|A|,|B|) rows, round 11's bound, tightest
    in the skewed excerpt⊂host regime this verify serves).

    Measured negative, reverted this round (same-JVM ABBA-paired A/B
    at sf0.1): replacing the explode with per-doc gram ARRAYS +
    ``array_intersect`` (zero explodes, zero re-aggregation) was flat
    on dedup_containment (ratio 1.04) and 15–40% SLOWER on
    dedup_containment_smallside (median ratio 1.14, 6/6 iterations
    > 1.0) — each candidate-pair row hauls BOTH full gram arrays
    (~2 KB/pair vs ~30 B/explode-row), and smallside's larger
    candidate set pays it; collect_list also adds its own aggregate.

    The (sdoc, mdoc) relabeling is a bijection on pairs, the
    intersection count is symmetric, least/greatest restores (a, b)
    and the matching when() restores (n_a, n_b), so output rows are
    identical to the unordered formulation (oracle-parity-locked at
    three scale factors)."""
    small_a = F.col("n_a") <= F.col("n_b")
    ordered = cand.select(
        F.when(small_a, F.col("a")).otherwise(F.col("b")).alias("sdoc"),
        F.when(small_a, F.col("b")).otherwise(F.col("a")).alias("mdoc"),
        F.when(small_a, F.col("n_a")).otherwise(F.col("n_b")).alias("n_s"),
        F.when(small_a, F.col("n_b")).otherwise(F.col("n_a")).alias("n_m"),
    )
    common = (
        ordered.join(
            grams.select(F.col("doc_id").alias("sdoc"), "g"), "sdoc"
        )
        .join(
            grams.select(F.col("doc_id").alias("mdoc"), "g"),
            ["mdoc", "g"],
        )
        .groupBy("sdoc", "mdoc")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            # constant per (sdoc, mdoc) group — max() just reads them
            # back without a sizes join
            F.max("n_s").alias("n_s"),
            F.max("n_m").alias("n_m"),
        )
    )
    a_is_s = F.col("sdoc") < F.col("mdoc")
    scored = common.select(
        F.least("sdoc", "mdoc").alias("a"),
        F.greatest("sdoc", "mdoc").alias("b"),
        "n_common",
        F.when(a_is_s, F.col("n_s")).otherwise(F.col("n_m")).alias("n_a"),
        F.when(a_is_s, F.col("n_m")).otherwise(F.col("n_s")).alias("n_b"),
    )
    c_ab = F.col("n_common").cast("double") / F.col("n_a").cast("double")
    c_ba = F.col("n_common").cast("double") / F.col("n_b").cast("double")
    return (
        scored.select(
            "a",
            "b",
            "n_common",
            c_ab.alias("contain_a_in_b"),
            c_ba.alias("contain_b_in_a"),
        )
        .where(
            (F.col("contain_a_in_b") >= _CONTAIN_MIN)
            | (F.col("contain_b_in_a") >= _CONTAIN_MIN)
        )
    )


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup detection: word-3-gram containment
    C(A in B) = |A∩B| / |A| in both directions, for candidate pairs
    where either direction clears 0.5 — the quote/excerpt/boilerplate
    case Jaccard misses (a 10-line snippet fully contained in a
    10-page doc has J ≈ 0.01 but C ≈ 1.0).

    Candidates come from the SAME memoized minhash bands as
    ``dedup_ngram_jaccard`` (shared ``ngram_grams`` frame, linear
    explode + equi-join, never all-pairs), then only candidates get the
    exact intersection count. Honest recall note: minhash banding
    recalls by JACCARD, so a tiny doc inside a huge one can be missed
    at the fringe — the standard scale fix is banding on the SMALL
    side's shingles only (sample each doc's first s shingles), which
    this key's candidate generator would swap in at corpus scale; at
    fixture scale the shared bands already surface every planted
    containment (tests/test_dedup_synthetic.py pins one).

    Determinism: counts are exact integers; each containment is a
    single BIGINT/BIGINT IEEE division.
    """
    docs = load_table(spark, sf_dir, "documents")
    grams = memoized_checkpoint(
        spark, "ngram_grams", sf_dir, lambda: _gram_frame(docs)
    )
    # n_g rides the signature aggregate for free (same groupBy) and is
    # carried through the band join so the verify needs no sizes joins
    # (round-12 _contain_verify contract)
    sigs = grams.groupBy("doc_id").agg(
        *[F.min(_minhash(k)).alias(f"m{k}") for k in range(_NGRAM_HASHES)],
        F.count(F.lit(1)).alias("n_g"),
    )
    lsig = sigs.select(
        "doc_id",
        "n_g",
        F.posexplode(
            F.array(*[F.col(f"m{k}") for k in range(_NGRAM_HASHES)])
        ).alias("k", "mh"),
    )
    cand = (
        lsig.select(
            F.col("doc_id").alias("a"), F.col("n_g").alias("n_a"), "k", "mh"
        )
        .join(
            lsig.select(
                F.col("doc_id").alias("b"),
                F.col("n_g").alias("n_b"),
                "k",
                "mh",
            ),
            ["k", "mh"],
        )
        .where(F.col("a") < F.col("b"))
        # n_a/n_b are functions of a/b, so the distinct's cardinality
        # (and the candidate pair set) is unchanged by carrying them
        .select("a", "b", "n_a", "n_b")
        .distinct()
    )
    return _contain_verify(cand, grams)


_DEDUP_CONTAIN_SQL = f"""
WITH grams AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         unnest(list_filter(
           list_transform(
             list_slice(toks, 1, greatest(len(toks) - 2, 0)),
             (x, i) -> x || ' ' || toks[i + 1] || ' ' || toks[i + 2]),
           g -> g IS NOT NULL)) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
),
sizes AS (SELECT doc_id, count(*) AS n_g FROM grams GROUP BY doc_id),
sigs AS MATERIALIZED (
  SELECT doc_id,
         {', '.join(f'min({_minhash_sql(k)}) AS m{k}' for k in range(_NGRAM_HASHES))}
  FROM grams GROUP BY doc_id
),
lsig AS MATERIALIZED (
  {' UNION ALL '.join(f'SELECT doc_id, {k} AS k, m{k} AS mh FROM sigs' for k in range(_NGRAM_HASHES))}
),
cand AS MATERIALIZED (
  SELECT DISTINCT l1.doc_id AS a, l2.doc_id AS b
  FROM lsig l1
  JOIN lsig l2 ON l1.k = l2.k AND l1.mh = l2.mh AND l1.doc_id < l2.doc_id
),
common AS (
  SELECT c.a, c.b, count(*) AS n_common
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.a
  JOIN grams gb ON gb.doc_id = c.b AND gb.g = ga.g
  GROUP BY c.a, c.b
)
SELECT a, b, n_common,
       CAST(n_common AS DOUBLE) / CAST(na.n_g AS DOUBLE) AS contain_a_in_b,
       CAST(n_common AS DOUBLE) / CAST(nb.n_g AS DOUBLE) AS contain_b_in_a
FROM common
JOIN sizes na ON na.doc_id = a
JOIN sizes nb ON nb.doc_id = b
WHERE CAST(n_common AS DOUBLE) / CAST(na.n_g AS DOUBLE) >= {_CONTAIN_MIN}
   OR CAST(n_common AS DOUBLE) / CAST(nb.n_g AS DOUBLE) >= {_CONTAIN_MIN}
"""


_CONTAIN_SAMPLE_S = 4  # bottom-s gram sketch probed against the index
_CONTAIN_DF_CAP = 64  # probe-side document-frequency cap (skew guard):
# a gram in > 64 docs is boilerplate — it carries no containment
# signal (it "contains" everything) and its posting list is exactly
# the hot key that blows up the probe join. Fixture headroom: max
# 3-gram df is 25 at sf0.1 (9 at sf0.001, 7 at sf0.01), so the guard
# provably never fires at fixture scale and the key's hashes are
# unchanged; the oracle applies the SAME cap so parity holds by
# construction on any fixture where it does fire.


def dedup_containment_smallside(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-scale containment variant ``dedup_containment``'s
    docstring names: sample each doc's bottom-``_CONTAIN_SAMPLE_S``
    grams (smallest salted-md5 — a deterministic bottom-k sketch) and
    probe them against the gram inverted index. If doc A is fully
    contained in doc B, every gram of A — in particular its sampled
    ones — is a gram of B, so the candidate is recalled with
    probability 1 (the minhash-banded generator recalls by JACCARD and
    can miss a tiny excerpt inside a huge host); partial containment c
    is missed with probability (1−c)^s. Cost: s probes per doc times
    posting length — linear in the index, never all-pairs. Exact
    verify and output schema are identical to ``dedup_containment``.

    SKEW GUARD (round-9 VERDICT #1): both sides of the probe join are
    restricted to grams with document frequency <= ``_CONTAIN_DF_CAP``
    — the df twin of ``dedup_lines_boilerplate``'s rule. Without it, a
    boilerplate gram whose posting list spans a large duplicate
    cluster is a single join key emitting |samplers| x |posting| rows
    that neither AQE nor salting can split (both sides share the
    bucket). With it the per-gram fan-out is bounded: a gram's posting
    is <= cap rows AND the docs sampling it are a subset of its
    posting, so any one key emits <= cap² (= 4096) rows — measured by
    the planted boilerplate-cluster case in tools/dedup_skew_check.py.
    Recall: the bottom-s sample is drawn AMONG low-df grams, so the
    probability-1 full-containment recall argument survives for every
    doc with >= 1 sub-cap gram; a doc composed ENTIRELY of boilerplate
    grams emits no probes (deliberate — such a doc is itself
    boilerplate, and every pair it would surface is cap-df noise).
    More precisely (round-11 ADVICE note): the cap redefines the
    DISCOVERY space to sub-cap grams on both sides, so a MIXED pair
    whose shared region consists ONLY of boilerplate grams is also
    undiscoverable even when its true containment >= the threshold —
    the (1-c)^s miss bound applies to containment measured over
    sub-cap grams. That is the intended semantics: an overlap made
    entirely of >cap-df grams is template/boilerplate overlap, not
    content duplication (the signal dedup_lines_boilerplate exists
    to strip). The oracle applies the same cap, so parity is
    unaffected either way.
    """
    docs = load_table(spark, sf_dir, "documents")
    grams = memoized_checkpoint(
        spark, "ngram_grams", sf_dir, lambda: _gram_frame(docs)
    )
    rare = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= _CONTAIN_DF_CAP)
        .select("g")
    )
    # full-gram doc sizes (counted over ALL grams, not just sub-cap
    # ones — the containment denominator), attached to the sub-cap
    # posting rows by one broadcast-sized join so candidates carry
    # n_a/n_b and the verify needs no sizes joins (round-12
    # _contain_verify contract)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_g"))
    low = grams.join(rare, "g", "left_semi").join(sizes, "doc_id")
    wg = Window.partitionBy("doc_id").orderBy(_minhash(0), "g")
    sampled = (
        low.withColumn("rn", F.row_number().over(wg))
        .where(F.col("rn") <= _CONTAIN_SAMPLE_S)
        .select("doc_id", "g", "n_g")
    )
    q_lt_t = F.col("q") < F.col("t")
    cand = (
        sampled.select(
            F.col("doc_id").alias("q"), "g", F.col("n_g").alias("n_q")
        )
        .join(
            low.select(
                F.col("doc_id").alias("t"), "g", F.col("n_g").alias("n_t")
            ),
            "g",
        )
        .where(F.col("q") != F.col("t"))
        .select(
            F.least("q", "t").alias("a"),
            F.greatest("q", "t").alias("b"),
            F.when(q_lt_t, F.col("n_q")).otherwise(F.col("n_t")).alias("n_a"),
            F.when(q_lt_t, F.col("n_t")).otherwise(F.col("n_q")).alias("n_b"),
        )
        .distinct()
    )
    return _contain_verify(cand, grams)


_DEDUP_CONTAIN_SMALL_SQL = f"""
WITH grams AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         unnest(list_filter(
           list_transform(
             list_slice(toks, 1, greatest(len(toks) - 2, 0)),
             (x, i) -> x || ' ' || toks[i + 1] || ' ' || toks[i + 2]),
           g -> g IS NOT NULL)) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
),
sizes AS (SELECT doc_id, count(*) AS n_g FROM grams GROUP BY doc_id),
low AS MATERIALIZED (
  SELECT gr.doc_id, gr.g
  FROM grams gr
  JOIN (SELECT g FROM grams GROUP BY g
        HAVING count(*) <= {_CONTAIN_DF_CAP}) rare ON rare.g = gr.g
),
sampled AS MATERIALIZED (
  SELECT doc_id, g FROM (
    SELECT doc_id, g,
           row_number() OVER (
             PARTITION BY doc_id ORDER BY {_minhash_sql(0)}, g) AS rn
    FROM low
  ) WHERE rn <= {_CONTAIN_SAMPLE_S}
),
cand AS MATERIALIZED (
  SELECT DISTINCT least(s.doc_id, t.doc_id) AS a,
         greatest(s.doc_id, t.doc_id) AS b
  FROM sampled s
  JOIN low t ON t.g = s.g AND t.doc_id <> s.doc_id
),
common AS (
  SELECT c.a, c.b, count(*) AS n_common
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.a
  JOIN grams gb ON gb.doc_id = c.b AND gb.g = ga.g
  GROUP BY c.a, c.b
)
SELECT a, b, n_common,
       CAST(n_common AS DOUBLE) / CAST(na.n_g AS DOUBLE) AS contain_a_in_b,
       CAST(n_common AS DOUBLE) / CAST(nb.n_g AS DOUBLE) AS contain_b_in_a
FROM common
JOIN sizes na ON na.doc_id = a
JOIN sizes nb ON nb.doc_id = b
WHERE CAST(n_common AS DOUBLE) / CAST(na.n_g AS DOUBLE) >= {_CONTAIN_MIN}
   OR CAST(n_common AS DOUBLE) / CAST(nb.n_g AS DOUBLE) >= {_CONTAIN_MIN}
"""


_RECALL_SAMPLE = 150  # exact-baseline sample bound (doc_id < this)
_RECALL_MIN = 0.01    # scorecard truth floor — BELOW the banding's design
                      # threshold on purpose, to expose the fall-off curve


def dedup_banding_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured RECALL of the MinHash banding vs the exact Jaccard
    ground truth, per Jaccard bucket — the dedup family's honest
    scorecard, mirroring what simsearch_recall does for ANN: the
    banded candidate generator (``dedup_ngram_jaccard``) is a
    documented 1−(1−J)^8 subset at the J≈0.1 fringe, and this key
    turns that theory line into a measured table a pipeline owner can
    read before trusting the banding at their threshold.

    Ground truth needs no O(n²) scan: any pair with J > 0 shares a
    shingle, so the complete truth set within the sample is one gram
    equi-join. It is still restricted to a fixed SAMPLE (doc_id <
    ``_RECALL_SAMPLE``) because that gram join is exactly the
    hot-bucket quadratic the banding exists to avoid — bounding the
    sample is what keeps the exact baseline affordable at ANY corpus
    size (recall is a per-pair property; a sample estimates it as
    well as the corpus does). Output: per floor(100·J) bucket, true
    pair count, banded-candidate count, and recall — all integers
    plus one int/int division, fully hash-oracled. Measured at
    sf0.01: 10.7% recall in the J∈[0.01,0.02) bucket vs the 11.4%
    the 1−(1−J)^8 theory line predicts at its midpoint, and 100%
    at J≈0.95 — the banding does exactly what it claims."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < _RECALL_SAMPLE
    )
    grams = _gram_frame(docs)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_g"))
    ga = grams.select(F.col("doc_id").alias("a"), "g")
    gb = grams.select(F.col("doc_id").alias("b"), "g")
    common = (
        ga.join(gb, "g")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("a"), F.col("n_g").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("b"), F.col("n_g").alias("n_b"))
    truth = (
        common.join(na, "a")
        .join(nb, "b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast(
                "double"
            ),
        )
        .where(F.col("jaccard") >= _RECALL_MIN)
        .select("a", "b", "jaccard")
    )
    sigs = grams.groupBy("doc_id").agg(
        *[F.min(_minhash(k)).alias(f"m{k}") for k in range(_NGRAM_HASHES)]
    )
    lsig = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"m{k}") for k in range(_NGRAM_HASHES)])
        ).alias("k", "mh"),
    )
    s1 = lsig.select(F.col("doc_id").alias("a"), "k", "mh")
    s2 = lsig.select(F.col("doc_id").alias("b"), "k", "mh")
    cand = (
        s1.join(s2, ["k", "mh"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .withColumn("hit", F.lit(1).cast("long"))
    )
    return (
        truth.join(cand, ["a", "b"], "left")
        .select(
            F.floor(F.col("jaccard") * 100).alias("jacc_pct"),
            F.coalesce("hit", F.lit(0).cast("long")).alias("hit"),
        )
        .groupBy("jacc_pct")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.sum("hit").alias("n_caught"),
        )
        .withColumn(
            "recall",
            F.col("n_caught").cast("double") / F.col("n_true").cast("double"),
        )
    )


_BANDING_RECALL_SQL = f"""
WITH grams AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         unnest(list_filter(
           list_transform(
             list_slice(toks, 1, greatest(len(toks) - 2, 0)),
             (x, i) -> x || ' ' || toks[i + 1] || ' ' || toks[i + 2]),
           g -> g IS NOT NULL)) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE doc_id < {_RECALL_SAMPLE})
),
sizes AS (SELECT doc_id, count(*) AS n_g FROM grams GROUP BY doc_id),
truth AS MATERIALIZED (
  SELECT a, b,
         CAST(n_common AS DOUBLE)
           / CAST(na.n_g + nb.n_g - n_common AS DOUBLE) AS jaccard
  FROM (
    SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS n_common
    FROM grams ga JOIN grams gb ON gb.g = ga.g AND ga.doc_id < gb.doc_id
    GROUP BY 1, 2
  )
  JOIN sizes na ON na.doc_id = a
  JOIN sizes nb ON nb.doc_id = b
  WHERE CAST(n_common AS DOUBLE)
          / CAST(na.n_g + nb.n_g - n_common AS DOUBLE) >= {_RECALL_MIN}
),
sigs AS MATERIALIZED (
  SELECT doc_id,
         {', '.join(f'min({_minhash_sql(k)}) AS m{k}' for k in range(_NGRAM_HASHES))}
  FROM grams GROUP BY doc_id
),
lsig AS MATERIALIZED (
  {' UNION ALL '.join(f'SELECT doc_id, {k} AS k, m{k} AS mh FROM sigs' for k in range(_NGRAM_HASHES))}
),
cand AS MATERIALIZED (
  SELECT DISTINCT l1.doc_id AS a, l2.doc_id AS b
  FROM lsig l1
  JOIN lsig l2 ON l1.k = l2.k AND l1.mh = l2.mh AND l1.doc_id < l2.doc_id
)
SELECT CAST(floor(jaccard * 100) AS BIGINT) AS jacc_pct,
       CAST(count(*) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN c.a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_caught,
       CAST(sum(CASE WHEN c.a IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS recall
FROM truth t LEFT JOIN cand c ON c.a = t.a AND c.b = t.b
GROUP BY 1
"""


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup workflow: near-dup PAIRS -> connected-component
    CLUSTERS -> min-id keeper per cluster.

    Pairwise detection alone under-deduplicates (A~B, B~C but A≁C must
    still collapse to one keeper); components over the pair graph give
    transitive closure. Consumes the MinHash-BANDED verified pair set
    (``dedup_ngram_jaccard`` — linear candidate generation, not the
    quadratic all-pairs join), then the Pregel CC kernel.
    ``is_keeper`` marks the document to retain.
    """
    from graph_database_akkatyped_spark.operators.algos import cc_frame

    def sym_pairs() -> DataFrame:
        pairs = dedup_ngram_jaccard(spark, sf_dir).select("a", "b")
        return pairs.unionByName(
            pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )

    sym = memoized_checkpoint(spark, "dedup_sym_pairs", sf_dir, sym_pairs)
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id")
    )
    comp = cc_frame(docs, sym)
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster"),
        (F.col("id") == F.col("component")).alias("is_keeper"),
    )


_DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  SELECT a, b FROM ({_DEDUP_NGRAM_SQL})
),
sym AS MATERIALIZED (
  SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs
),
verts AS (SELECT doc_id AS v FROM documents),
reach(s, d) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.s, e.b FROM reach r JOIN sym e ON e.a = r.d
)
SELECT s AS doc_id, min(d) AS cluster, s = min(d) AS is_keeper
FROM reach GROUP BY s
"""


_EMB_BANDS = 8
_EMB_BAND_BITS = 8
_EMB_COS_MIN = 0.95


def _sign_band_key(band: int) -> Column:
    """Band key = the 8 sign bits of dims [band*8, band*8+8). Sign
    random projection (SimHash for cosine): vectors with cosine ≥ 0.95
    agree on almost every sign, so they collide in ≥ 1 of the 8 bands
    w.p. ≈ 0.99, while unrelated vectors land in 256-way buckets. Sign
    compares are exact in both engines — no float-arithmetic drift."""
    bits: Column = F.lit(0)
    for j in range(_EMB_BAND_BITS):
        bits = bits + F.when(
            F.col("embedding").getItem(band * _EMB_BAND_BITS + j) > 0,
            F.lit(1 << j),
        ).otherwise(F.lit(0))
    return bits


def _sign_band_key_sql(band: int) -> str:
    terms = " + ".join(
        f"CASE WHEN embedding[{band * _EMB_BAND_BITS + j + 1}] > 0 "
        f"THEN {1 << j} ELSE 0 END"
        for j in range(_EMB_BAND_BITS)
    )
    return f"({terms})"


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ 0.95), sign-LSH banded.

    Round-1's exact all-pairs crossJoin was quadratic by construction
    (100× data = 10,000× pairs). Now: 8 sign-bit bands (8 dims each)
    generate candidates via an equi-join on (band, key) — linear scan +
    bucketed join — and only candidates get the exact cosine verify.
    The banding is a pure function of the input floats, identical in
    SQL, so the result still hash-matches the oracle. The exact
    all-pairs form survives only as the small-n unit-test baseline
    (tests/test_dedup_synthetic.py).

    SKEW NOTE (100 TB): on a near-duplicate-HEAVY corpus a duplicate
    cluster of k vectors shares one (band, key) bucket in every band —
    the equi-join then emits its k² candidate pairs in a single task.
    The threshold rule matches join_salted_skew: once one bucket holds
    more than ~1 shuffle-partition's worth of rows
    (spark.sql.files.maxPartitionBytes / row width, and beyond AQE's
    skew-split reach because BOTH join sides share the bucket), switch
    to :func:`dedup_embedding_cosine_salted`, which spreads each bucket
    over a g·(g+1)/2 slot grid with IDENTICAL candidate semantics.
    Demonstrated in tools/dedup_skew_check.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    banded = emb.select(
        "vec_id",
        F.posexplode(
            F.array(*[_sign_band_key(b) for b in range(_EMB_BANDS)])
        ).alias("band", "key"),
    )
    cand = (
        banded.select(F.col("vec_id").alias("a"), "band", "key")
        .join(banded.select(F.col("vec_id").alias("b"), "band", "key"),
              ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    norm = _dot(F.col("embedding"), F.col("embedding"))
    e = emb.select("vec_id", "embedding", norm.alias("nrm"))
    ea = e.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    eb = e.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (
        F.sqrt("nrm_a") * F.sqrt("nrm_b")
    )
    return (
        cand.join(ea, "a")
        .join(eb, "b")
        .withColumn("cos", cos)
        .where(F.col("cos") >= _EMB_COS_MIN)
        .select("a", "b", "cos")
    )


_DEDUP_EMB_SQL = f"""
WITH banded AS MATERIALIZED (
  {' UNION ALL '.join(
      f'SELECT vec_id, {b} AS band, {_sign_band_key_sql(b)} AS key '
      f'FROM embeddings'
      for b in range(_EMB_BANDS))}
),
cand AS MATERIALIZED (
  SELECT DISTINCT b1.vec_id AS a, b2.vec_id AS b
  FROM banded b1
  JOIN banded b2 ON b1.band = b2.band AND b1.key = b2.key
                AND b1.vec_id < b2.vec_id
),
e AS MATERIALIZED (
  SELECT vec_id, embedding,
         {_sql_dot('embedding', 'embedding')} AS nrm
  FROM embeddings
)
SELECT c.a, c.b,
       {_sql_dot('e1.embedding', 'e2.embedding')}
         / (sqrt(e1.nrm) * sqrt(e2.nrm)) AS cos
FROM cand c JOIN e e1 ON e1.vec_id = c.a JOIN e e2 ON e2.vec_id = c.b
WHERE {_sql_dot('e1.embedding', 'e2.embedding')}
        / (sqrt(e1.nrm) * sqrt(e2.nrm)) >= {_EMB_COS_MIN}
"""


def dedup_embedding_cosine_salted(
    spark: SparkSession, sf_dir: str, n_salt: int = 8
) -> DataFrame:
    """Grid-salted twin of :func:`dedup_embedding_cosine` for
    duplicate-heavy corpora (the hot-band skew case in its docstring).

    Mechanism — the self-join analogue of join_salted_skew's
    fact/dim salting: every member of a (band, key) bucket gets a
    deterministic group g_r = xxhash64(vec_id) % g. A pair whose
    members sit in groups (i, j), i = min, j = max, is produced under
    join key (band, key, i, j): the left side replicates each row for
    every slot j' ≥ g_r, the right side for every slot i' ≤ g_r. One
    hot bucket therefore fans out over g·(g+1)/2 join keys → that many
    tasks, instead of one. The candidate SET is unchanged (each pair
    matches in exactly one slot; self/dup matches are removed by the
    a < b filter and the distinct), so the verified output is
    bit-identical to the unsalted operator — salting changes the
    partitioning, never the semantics. Cost: ~(g+1)/2 × banded-row
    replication, the price of parallelizing a bucket no skew handler
    can split (both join sides share it)."""
    g = n_salt
    emb = load_table(spark, sf_dir, "embeddings")
    banded = emb.select(
        "vec_id",
        F.posexplode(
            F.array(*[_sign_band_key(b) for b in range(_EMB_BANDS)])
        ).alias("band", "key"),
    ).withColumn("grp", F.pmod(F.xxhash64("vec_id"), F.lit(g)).cast("int"))
    left = banded.select(
        F.col("vec_id").alias("a"), "band", "key",
        F.col("grp").alias("i"),
        F.explode(F.sequence(F.col("grp"), F.lit(g - 1))).alias("j"),
    )
    right = banded.select(
        F.col("vec_id").alias("b"), "band", "key",
        F.explode(F.sequence(F.lit(0), F.col("grp"))).alias("i"),
        F.col("grp").alias("j"),
    )
    # a pair is guaranteed a grid match only in the orientation whose
    # LEFT member has the smaller salt group — which may be the larger
    # vec_id — so match unordered (a != b) and normalize with
    # least/greatest before the distinct
    cand = (
        left.join(right, ["band", "key", "i", "j"])
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"),
            F.greatest("a", "b").alias("b"),
        )
        .distinct()
    )
    norm = _dot(F.col("embedding"), F.col("embedding"))
    e = emb.select("vec_id", "embedding", norm.alias("nrm"))
    ea = e.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    eb = e.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (
        F.sqrt("nrm_a") * F.sqrt("nrm_b")
    )
    return (
        cand.join(ea, "a")
        .join(eb, "b")
        .withColumn("cos", cos)
        .where(F.col("cos") >= _EMB_COS_MIN)
        .select("a", "b", "cos")
    )


def text_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized MinHash signature table (doc_id, n_grams,
    m0..m7) — what a 100 TB dedup pipeline persists so that incremental
    ingest only hashes NEW documents and joins signatures against the
    stored sketch, never re-shingling the corpus. Deterministic salted
    md5 minhashes (same functions as ``dedup_ngram_jaccard``), so the
    table is engine-portable and fully oracle-checked. Docs with < 3
    tokens have no shingles and no signature row."""
    docs = load_table(spark, sf_dir, "documents")
    # distinct-first, then aggregate: measured faster than folding
    # count_distinct into the agg (the distinct-agg rewrite Expands
    # every shingle row twice), and the minhashes are computed once per
    # distinct shingle
    grams = _gram_frame(docs)
    return grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        *[F.min(_minhash(k)).alias(f"m{k}") for k in range(_NGRAM_HASHES)],
    )


_TEXT_MINHASH_SQL = f"""
WITH grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(
           list_transform(
             list_slice(toks, 1, greatest(len(toks) - 2, 0)),
             (x, i) -> x || ' ' || toks[i + 1] || ' ' || toks[i + 2]),
           g -> g IS NOT NULL)) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
)
SELECT doc_id, count(*) AS n_grams,
       {', '.join(f'min({_minhash_sql(k)}) AS m{k}' for k in range(_NGRAM_HASHES))}
FROM grams GROUP BY doc_id
"""


_INCR_MOD = 10  # doc_id % 10 == 0 simulates the incoming ingest batch


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: check an INCOMING batch against the existing
    corpus in O(new), never re-pairing the stored corpus with itself —
    the only dedup shape that works on a 100 TB lakehouse ingest. The
    stored side's signatures come straight from the persisted sketch
    table (``text_minhash_signature``); here both sides are derived from
    the fixture with ``doc_id % 10`` as the batch split. Candidates =
    new-sig x stored-sig equi-join on (k, minhash); exact Jaccard verify
    on candidates only. Returns incoming docs that duplicate a stored
    doc."""
    docs = load_table(spark, sf_dir, "documents")
    grams = memoized_checkpoint(
        spark, "ngram_grams", sf_dir, lambda: _gram_frame(docs)
    )
    # Round-12: same n_g threading as `_ngram_pairs` (zero sizes joins
    # in the verify; plan Exchange 28→20, SMJ 10→6, paired A/B 0.95) —
    # and the same measured negative: the min-side relabel was 1.35×
    # slower here, so the explode stays on the new (query) side.
    sigs = grams.groupBy("doc_id").agg(
        *[F.min(_minhash(k)).alias(f"m{k}") for k in range(_NGRAM_HASHES)],
        F.count(F.lit(1)).alias("n_g"),
    )
    lsig = sigs.select(
        "doc_id",
        "n_g",
        F.posexplode(
            F.array(*[F.col(f"m{k}") for k in range(_NGRAM_HASHES)])
        ).alias("k", "mh"),
    )
    is_new = (F.col("doc_id") % _INCR_MOD) == 0
    new_s = lsig.where(is_new).select(
        F.col("doc_id").alias("new_id"), F.col("n_g").alias("n_a"), "k", "mh"
    )
    old_s = lsig.where(~is_new).select(
        F.col("doc_id").alias("dup_of"), F.col("n_g").alias("n_b"), "k", "mh"
    )
    cand = (
        new_s.join(old_s, ["k", "mh"])
        # n_a/n_b are functions of new_id/dup_of — same candidate set
        .select("new_id", "dup_of", "n_a", "n_b")
        .distinct()
    )
    ga = grams.select(F.col("doc_id").alias("new_id"), "g")
    gb = grams.select(F.col("doc_id").alias("dup_of"), "g")
    common = (
        cand.join(ga, "new_id")
        .join(gb, ["dup_of", "g"])
        .groupBy("new_id", "dup_of")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
        )
    )
    return (
        common.withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .where(F.col("jaccard") >= _JACCARD_MIN)
        .select("new_id", "dup_of", "n_common", "jaccard")
    )


_DEDUP_INCR_SQL = f"""
WITH grams AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         unnest(list_filter(
           list_transform(
             list_slice(toks, 1, greatest(len(toks) - 2, 0)),
             (x, i) -> x || ' ' || toks[i + 1] || ' ' || toks[i + 2]),
           g -> g IS NOT NULL)) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
),
sizes AS (SELECT doc_id, count(*) AS n_g FROM grams GROUP BY doc_id),
sigs AS MATERIALIZED (
  SELECT doc_id,
         {', '.join(f'min({_minhash_sql(k)}) AS m{k}' for k in range(_NGRAM_HASHES))}
  FROM grams GROUP BY doc_id
),
lsig AS MATERIALIZED (
  {' UNION ALL '.join(f'SELECT doc_id, {k} AS k, m{k} AS mh FROM sigs' for k in range(_NGRAM_HASHES))}
),
cand AS MATERIALIZED (
  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS dup_of
  FROM lsig n JOIN lsig o ON n.k = o.k AND n.mh = o.mh
  WHERE n.doc_id % {_INCR_MOD} = 0 AND o.doc_id % {_INCR_MOD} <> 0
),
common AS (
  SELECT c.new_id, c.dup_of, count(*) AS n_common
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.new_id
  JOIN grams gb ON gb.doc_id = c.dup_of AND gb.g = ga.g
  GROUP BY c.new_id, c.dup_of
)
SELECT new_id, dup_of, n_common,
       CAST(n_common AS DOUBLE) / CAST(na.n_g + nb.n_g - n_common AS DOUBLE)
         AS jaccard
FROM common
JOIN sizes na ON na.doc_id = new_id
JOIN sizes nb ON nb.doc_id = dup_of
WHERE CAST(n_common AS DOUBLE) / CAST(na.n_g + nb.n_g - n_common AS DOUBLE)
      >= {_JACCARD_MIN}
"""


def dedup_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup outcome: per-language kept/dropped doc counts
    after near-dup clustering — the acceptance report a training-data
    pipeline emits (corpus shrinkage per slice) before the filtered
    corpus ships to tokenization."""
    clusters = dedup_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.join(clusters, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("is_keeper").cast("long")).alias("n_kept"),
            F.sum((~F.col("is_keeper")).cast("long")).alias("n_dropped"),
        )
    )


_DEDUP_MATERIALIZE_SQL = f"""
SELECT d.lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN c.is_keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN c.is_keeper THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM documents d JOIN ({_DEDUP_CLUSTERS_SQL}) c ON c.doc_id = d.doc_id
GROUP BY d.lang
"""


def corpus_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed end-of-pipeline artifact: one row per RETAINED
    training document — exact-dedup keeper, length-filtered (5..1000
    tokens), with its deterministic train/val/test assignment and token
    count. This is the manifest a tokenization job consumes; every
    ingredient (hash keeper, hash split, token count) is a pure function
    of the row, so the manifest is reproducible on any engine or
    partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    th = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    n_tok = F.size(F.split(F.col("text"), " "))
    w = Window.partitionBy("text_hash")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10
    )
    split = (
        F.when(bucket <= 7, "train").when(bucket == 8, "val").otherwise("test")
    )
    return (
        docs.select(
            "doc_id", "lang", th.alias("text_hash"), n_tok.alias("n_tokens")
        )
        .withColumn("is_keeper", F.col("doc_id") == F.min("doc_id").over(w))
        .where(F.col("is_keeper") & F.col("n_tokens").between(5, 1000))
        .select("doc_id", "lang", split.alias("split"), "n_tokens")
    )


_CORPUS_MANIFEST_SQL = """
WITH h AS (
  SELECT doc_id, lang, sha256(lower(trim(text))) AS th,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
k AS (
  SELECT *, min(doc_id) OVER (PARTITION BY th) AS keep FROM h
)
SELECT doc_id, lang,
       CASE WHEN b <= 7 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END
         AS split,
       CAST(n_tokens AS INTEGER) AS n_tokens
FROM (
  SELECT *,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           % 10 AS b
  FROM k WHERE doc_id = keep AND n_tokens BETWEEN 5 AND 1000
)
"""


_MAHAL_TOPK = 50
_MAHAL_Q = 1_000_000  # 1e-6 coordinate quantization


def embedding_outlier_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier scoring by DIAGONAL Mahalanobis
    distance — the curation pass that drops corrupt / out-of-domain
    vectors before they poison an index or a training mix. Score =
    Σ_d floor(1e6 · (x_d − μ_d)² / Σ_i (x_i,d − μ_d)²): each
    dimension's squared deviation normalized by that dimension's total
    squared deviation (∝ (x−μ)²/σ² with a constant 1/n factor, so the
    RANKING is exactly diagonal Mahalanobis). Top-``_MAHAL_TOPK`` by
    (score DESC, vec_id).

    All-BIGINT discipline: coordinates quantize to 1e-6 ints
    (q = floor(val·1e6), |q| ≤ 1e6 on unit-norm data), the mean is a
    floor division (μ quantized to the same grid), deviations ≤ 2e6,
    squares ≤ 4e12, per-dim sums ≤ 4e12·n — inside BIGINT through the
    10x replica size — and each term is one integer division. No
    doubles anywhere, so the score is partition- and engine-proof.
    Zero-variance dimensions contribute 0 (guarded division).

    100 TB shape: one posexplode (linear), per-dim stats are |dims|
    rows broadcast back, one grouped sum per vector, TakeOrdered
    top-k. Nothing quadratic, nothing iterative."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id",
        "pos",
        F.floor(F.col("val").cast("double") * _MAHAL_Q)
        .cast("long")
        .alias("q"),
    )
    stats = dims.groupBy("pos").agg(
        F.sum("q").alias("s"), F.count(F.lit(1)).alias("n")
    )
    withdev = dims.join(F.broadcast(stats), "pos").select(
        "vec_id",
        "pos",
        (F.col("q") - F.expr("s div n")).alias("dev"),
    )
    var = withdev.groupBy("pos").agg(
        F.sum(F.col("dev") * F.col("dev")).alias("v")
    )
    terms = withdev.join(F.broadcast(var), "pos").select(
        "vec_id",
        F.when(
            F.col("v") > 0,
            F.expr(f"({_MAHAL_Q} * dev * dev) div v"),
        )
        .otherwise(F.lit(0))
        .alias("term"),
    )
    return (
        terms.groupBy("vec_id")
        .agg(F.sum("term").cast("long").alias("score"))
        .orderBy(F.col("score").desc(), "vec_id")
        .limit(_MAHAL_TOPK)
    )


_MAHAL_SQL = f"""
WITH dims AS MATERIALIZED (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_MAHAL_Q})
              AS BIGINT) AS q
  FROM embeddings
),
stats AS (
  SELECT pos, CAST(sum(q) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM dims GROUP BY pos
),
withdev AS MATERIALIZED (
  SELECT vec_id, pos, q - (s // n) AS dev
  FROM dims JOIN stats USING (pos)
),
var AS (
  SELECT pos, CAST(sum(dev * dev) AS BIGINT) AS v
  FROM withdev GROUP BY pos
)
SELECT vec_id,
       CAST(sum(CASE WHEN v > 0
                     THEN ({_MAHAL_Q} * dev * dev) // v
                     ELSE 0 END) AS BIGINT) AS score
FROM withdev JOIN var USING (pos)
GROUP BY vec_id
ORDER BY score DESC, vec_id
LIMIT {_MAHAL_TOPK}
"""


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — 4x storage
    compression before a 100 TB vector corpus is written back. Per-row
    float arithmetic with a floor to integers is bit-identical across
    engines (memory-proven recipe), so even the array output
    hash-matches the oracle. scale = max|x| / 127; q_i = floor(x_i /
    scale); all-zero vectors quantize to zeros with scale 0.

    The quantized vector is emitted as a comma-joined STRING (``q``),
    not ARRAY<BIGINT>: the harness canonicalizes results through a
    pandas sort and python lists are unhashable there. The serialized
    form is engine-exact on both sides (Spark ``concat_ws`` / DuckDB
    ``array_to_string``) and loses nothing — int8 codes have a unique
    decimal rendering."""
    emb = load_table(spark, sf_dir, "embeddings")
    maxabs = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    q = F.when(
        F.col("maxabs") > 0,
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(
                x.cast("double") * F.lit(127.0) / F.col("maxabs")
            ).cast("long"),
        ),
    ).otherwise(
        F.transform(F.col("embedding"), lambda x: F.lit(0).cast("long"))
    )
    return (
        emb.select("vec_id", "embedding", maxabs.alias("maxabs"))
        .select(
            "vec_id",
            (F.col("maxabs") / F.lit(127.0)).alias("scale"),
            F.concat_ws(
                ",", F.transform(q, lambda x: x.cast("string"))
            ).alias("q"),
        )
    )


_EMB_QUANTIZE_SQL = """
SELECT vec_id, maxabs / 127.0 AS scale,
       array_to_string(
         CASE WHEN maxabs > 0
              THEN list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs) AS BIGINT))
              ELSE list_transform(embedding, x -> CAST(0 AS BIGINT))
         END, ',') AS q
FROM (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
  FROM embeddings
)
"""


# ------------------------------------------------------ similarity search


def simsearch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 per query vector (vec_id < 5), brute force:
    broadcast the tiny query side, score all candidates, per-query
    window top-k. At scale this is the re-rank stage after LSH."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = _dot(F.col("embedding"), F.col("embedding"))
    base = emb.select("vec_id", "embedding", norm.alias("nrm"))
    queries = base.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt("q_nrm") * F.sqrt("nrm")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        base.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("q_id"))
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("q_id", "vec_id", "cos", "rnk")
    )


_SIMSEARCH_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding, {_sql_dot('embedding', 'embedding')} AS nrm
  FROM embeddings
)
SELECT q_id, vec_id, cos, CAST(rnk AS INTEGER) AS rnk FROM (
  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
         {_sql_dot('q.embedding', 'c.embedding')}
           / (sqrt(q.nrm) * sqrt(c.nrm)) AS cos,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY {_sql_dot('q.embedding', 'c.embedding')}
                     / (sqrt(q.nrm) * sqrt(c.nrm)) DESC, c.vec_id) AS rnk
  FROM e q JOIN e c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
) WHERE rnk <= 10
"""


_MMR_POOL = 25     # relevance-ranked candidate pool per query
_MMR_K = 5         # results after diversity rerank
_MMR_ROUNDS = _MMR_K - 1


def simsearch_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance rerank: per query (vec_id < 5), take
    the exact cosine top-``_MMR_POOL`` pool, then greedily select
    ``_MMR_K`` results maximizing 0.7·rel(q,d) − 0.3·max_{s∈S} sim(d,s)
    — the standard diversity rerank between retrieval and the LLM
    context window (drop near-duplicate passages, keep coverage).

    Greedy is inherently sequential in k, NOT in data: each of the 4
    selection rounds is a join over the ≤ pool·|queries| candidate
    frame — the corpus-sized work (pool construction) is the same
    broadcast top-k scan as ``simsearch_topk``, and the pairwise
    sim matrix is pool² per query, bounded at ANY corpus size.

    Determinism: cosines are the strict left-to-right ``_dot`` chains
    both engines share; the MMR score is (0.7·cos) − (0.3·maxsim) with
    both literals cast to DOUBLE on the DuckDB side (its bare decimals
    are exact rationals and would diverge by ulps); ties break by
    vec_id. Oracle unrolls the 4 rounds as MATERIALIZED CTEs.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    norm = _dot(F.col("embedding"), F.col("embedding"))
    base = emb.select("vec_id", "embedding", norm.alias("nrm"))
    queries = base.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt("q_nrm") * F.sqrt("nrm")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    cand = cut(
        base.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("q_id"))
        .withColumn("cos", cos)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _MMR_POOL)
        .select("q_id", "vec_id", "cos", "embedding", "nrm")
    )
    pcos = _dot(F.col("a_emb"), F.col("b_emb")) / (
        F.sqrt("a_nrm") * F.sqrt("b_nrm")
    )
    pair = cut(
        cand.select(
            "q_id",
            F.col("vec_id").alias("a"),
            F.col("embedding").alias("a_emb"),
            F.col("nrm").alias("a_nrm"),
        )
        .join(
            cand.select(
                "q_id",
                F.col("vec_id").alias("b"),
                F.col("embedding").alias("b_emb"),
                F.col("nrm").alias("b_nrm"),
            ),
            "q_id",
        )
        .where(F.col("a") != F.col("b"))
        .select("q_id", "a", "b", pcos.alias("pcos"))
    )
    slim = cand.select("q_id", "vec_id", "cos")
    w1 = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    selected = (
        slim.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") == 1)
        .select("q_id", "vec_id", "cos", F.lit(1).cast("int").alias("rnk"))
    )
    for r in range(2, _MMR_K + 1):
        rem = slim.join(selected.select("q_id", "vec_id"), ["q_id", "vec_id"], "left_anti")
        maxsim = (
            rem.join(
                pair.select("q_id", F.col("a").alias("vec_id"), "b", "pcos"),
                ["q_id", "vec_id"],
            )
            .join(
                selected.select("q_id", F.col("vec_id").alias("b")),
                ["q_id", "b"],
            )
            .groupBy("q_id", "vec_id", "cos")
            .agg(F.max("pcos").alias("maxsim"))
        )
        mmr = (F.lit(0.7) * F.col("cos")) - (F.lit(0.3) * F.col("maxsim"))
        wr = Window.partitionBy("q_id").orderBy(mmr.desc(), "vec_id")
        pick = (
            maxsim.withColumn("rn", F.row_number().over(wr))
            .where(F.col("rn") == 1)
            .select("q_id", "vec_id", "cos", F.lit(r).cast("int").alias("rnk"))
        )
        prev = selected
        selected = cut(selected.unionByName(pick))
        # guide §5 (VERDICT r11 #4): the new cut consumed the previous
        # selected generation (r=2's prev is the lazy top-1 window
        # frame — no blocks, no-op)
        release_cut(prev)
    return selected.select("q_id", "vec_id", "cos", "rnk")


def _mmr_sql(pool: int = _MMR_POOL, k: int = _MMR_K) -> str:
    ctes = [
        f"""e AS MATERIALIZED (
  SELECT vec_id, embedding, {_sql_dot('embedding', 'embedding')} AS nrm
  FROM embeddings
)""",
        f"""cand AS MATERIALIZED (
  SELECT q_id, vec_id, cos, embedding, nrm FROM (
    SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
           {_sql_dot('q.embedding', 'c.embedding')}
             / (sqrt(q.nrm) * sqrt(c.nrm)) AS cos,
           c.embedding, c.nrm,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_sql_dot('q.embedding', 'c.embedding')}
                       / (sqrt(q.nrm) * sqrt(c.nrm)) DESC, c.vec_id) AS rn
    FROM e q JOIN e c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
  ) WHERE rn <= {pool}
)""",
        f"""pair AS MATERIALIZED (
  SELECT x.q_id, x.vec_id AS a, y.vec_id AS b,
         {_sql_dot('x.embedding', 'y.embedding')}
           / (sqrt(x.nrm) * sqrt(y.nrm)) AS pcos
  FROM cand x JOIN cand y ON y.q_id = x.q_id AND y.vec_id <> x.vec_id
)""",
        """sel1 AS MATERIALIZED (
  SELECT q_id, vec_id, cos, CAST(1 AS INTEGER) AS rnk FROM (
    SELECT q_id, vec_id, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
    FROM cand
  ) WHERE rn = 1
)""",
        "s1 AS MATERIALIZED (SELECT q_id, vec_id FROM sel1)",
    ]
    for r in range(2, k + 1):
        ctes.append(
            f"""scr{r} AS MATERIALIZED (
  SELECT c.q_id, c.vec_id, c.cos,
         (CAST(0.7 AS DOUBLE) * c.cos)
           - (CAST(0.3 AS DOUBLE) * max(p.pcos)) AS mmr
  FROM cand c
  ANTI JOIN s{r-1} d ON d.q_id = c.q_id AND d.vec_id = c.vec_id
  JOIN s{r-1} s ON s.q_id = c.q_id
  JOIN pair p ON p.q_id = c.q_id AND p.a = c.vec_id AND p.b = s.vec_id
  GROUP BY c.q_id, c.vec_id, c.cos
)"""
        )
        ctes.append(
            f"""sel{r} AS MATERIALIZED (
  SELECT q_id, vec_id, cos, CAST({r} AS INTEGER) AS rnk FROM (
    SELECT q_id, vec_id, cos,
           row_number() OVER (PARTITION BY q_id ORDER BY mmr DESC, vec_id) AS rn
    FROM scr{r}
  ) WHERE rn = 1
)"""
        )
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT q_id, vec_id FROM s{r-1} "
            f"UNION ALL SELECT q_id, vec_id FROM sel{r})"
        )
    final = " UNION ALL ".join(
        f"SELECT q_id, vec_id, cos, rnk FROM sel{r}" for r in range(1, k + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM ({final})"


def simsearch_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED vector search: per query (vec_id < 5), exact
    cosine top-5 among only the candidates sharing the query's
    ``label`` — the "filtered ANN" shape every production retrieval
    stack needs (tenant / language / license filters) and the one
    classic indexes handle worst. This is the PRE-filter strategy: the
    predicate lands in the join condition, so candidates are pruned
    BEFORE any dot product is spent — right whenever the filter is
    selective. (The alternative, post-filtering an unfiltered top-k,
    under-fills k at high selectivity; with IVF, pre-filter = apply the
    predicate inside each probed cell — same composition as
    simsearch_ivf with the label equi-condition added to the cell
    join.) The filter column rides the same row as the vector, so no
    extra join against a metadata table is needed at any scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = _dot(F.col("embedding"), F.col("embedding"))
    base = emb.select("vec_id", "label", "embedding", norm.alias("nrm"))
    queries = base.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt("q_nrm") * F.sqrt("nrm")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        base.join(
            F.broadcast(queries),
            (F.col("label") == F.col("q_label"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("q_id", "vec_id", F.col("label").alias("label"), "cos", "rnk")
    )


_SIMSEARCH_FILTERED_SQL = f"""
WITH e AS (
  SELECT vec_id, label, embedding,
         {_sql_dot('embedding', 'embedding')} AS nrm
  FROM embeddings
)
SELECT q_id, vec_id, label, cos, CAST(rnk AS INTEGER) AS rnk FROM (
  SELECT q.vec_id AS q_id, c.vec_id AS vec_id, c.label AS label,
         {_sql_dot('q.embedding', 'c.embedding')}
           / (sqrt(q.nrm) * sqrt(c.nrm)) AS cos,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY {_sql_dot('q.embedding', 'c.embedding')}
                     / (sqrt(q.nrm) * sqrt(c.nrm)) DESC, c.vec_id) AS rnk
  FROM e q JOIN e c
    ON q.vec_id < 5 AND c.label = q.label AND c.vec_id <> q.vec_id
) WHERE rnk <= 5
"""


_RANGE_COS = 0.20  # fixture-calibrated: ~25-30 hits per query at sf0.01


def simsearch_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (radius) vector search: per query (vec_id < 5), ALL
    candidates with cosine ≥ ``_RANGE_COS`` — the "everything similar
    enough" query, complementary to top-k: retrieval uses top-k,
    while dedup sweeps, recommendation backfills, and
    contamination audits need every match above a floor (top-k
    silently truncates dense neighborhoods and pads sparse ones).

    Scale shape: identical to simsearch_topk's scan — broadcast the
    tiny query side, one pass over the corpus, no window at all (the
    radius predicate replaces the rank), so it's strictly cheaper
    than top-k at the same candidate set. For high thresholds
    (≥ ~0.9) the sign-LSH banding of dedup_embedding_cosine is the
    candidate pruner; at a moderate radius like this, banding loses
    recall and the honest plan IS the linear scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = _dot(F.col("embedding"), F.col("embedding"))
    base = emb.select("vec_id", "embedding", norm.alias("nrm"))
    queries = base.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt("q_nrm") * F.sqrt("nrm")
    )
    return (
        base.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("q_id"))
        .withColumn("cos", cos)
        .where(F.col("cos") >= F.lit(_RANGE_COS))
        .select("q_id", "vec_id", "cos")
    )


_SIMSEARCH_RANGE_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding, {_sql_dot('embedding', 'embedding')} AS nrm
  FROM embeddings
)
SELECT q_id, vec_id, cos FROM (
  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
         {_sql_dot('q.embedding', 'c.embedding')}
           / (sqrt(q.nrm) * sqrt(c.nrm)) AS cos
  FROM e q JOIN e c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
) WHERE cos >= {_RANGE_COS}
"""


def _lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketedRandomProjectionLSH candidates -> exact re-rank top-10
    per query by euclidean distance: (q_id, vec_id, dist, rnk).
    Deterministic (seeded) but not SQL-reproducible — consumed by the
    :func:`simsearch_lsh` scorecard and :func:`simsearch_recall_lsh`.

    Both approxSimilarityJoin sides derive from `emb`; unlike
    dedup_near_minhash the re-derived work is one column cast
    (array_to_vector), so a persist-before-self-join cut costs more
    (eager materialization + cache blocks per call) than the recompute
    it saves at bench scale — measured 0.8 s -> 1.7 s when tried. On a
    real corpus where featurization dominates, persist `emb` first."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("v")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="v", outputCol="hashes", bucketLength=2.0, numHashTables=3, seed=42
    ).fit(emb)
    queries = emb.where(F.col("vec_id") < 5)
    pairs = lsh.approxSimilarityJoin(queries, emb, 10.0, distCol="dist")
    w = Window.partitionBy("q_id").orderBy(F.col("dist"), "vec_id")
    return (
        pairs.select(
            F.col("datasetA.vec_id").alias("q_id"),
            F.col("datasetB.vec_id").alias("vec_id"),
            "dist",
        )
        .where(F.col("vec_id") != F.col("q_id"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
    )


def simsearch_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: BucketedRandomProjectionLSH candidates -> exact
    re-rank top-10 per query, emitted as a hash-grade SCORECARD built
    ONLY from the pipeline's hard contracts (round-9 ADVICE — the old
    ``n_returned == least(10, n_emb-1)`` column assumed LSH always
    fills the top-k, which nothing in BucketedRandomProjectionLSH
    guarantees on a regenerated fixture). Per query — the row itself
    guaranteed by a left join from the deterministic query set, so a
    zero-candidate query cannot silently drop the row:

    - ``within_radius``: every returned dist <= 10.0
      (approxSimilarityJoin's distance filter; vacuously 1 on empty);
    - ``ranks_contiguous``: row_number discipline, min_rnk = 1 and
      max_rnk = n_returned (vacuously 1 on empty);
    - ``topk_capped``: n_returned <= least(10, n_emb - 1) (the
      ``rnk <= 10`` filter plus self-exclusion).

    The candidate rows themselves ride in :func:`_lsh_topk` (not
    SQL-reproducible — the projection vectors come from Spark's seeded
    RNG); their ACCURACY — how well LSH fills the top-k — is graded by
    :func:`simsearch_recall_lsh`, which carries the fixture-measured
    margin note."""
    topk = _lsh_topk(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    emb_n = emb.agg(F.count(F.lit(1)).alias("n_emb"))
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id")
    )
    per_q = topk.groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_returned"),
        F.max("dist").alias("max_dist"),
        F.min("rnk").alias("min_rnk"),
        F.max("rnk").alias("max_rnk"),
    )
    return (
        queries.join(per_q, "q_id", "left")
        .crossJoin(F.broadcast(emb_n))
        .select(
            "q_id",
            F.coalesce((F.col("max_dist") <= 10.0), F.lit(True))
            .cast("int")
            .alias("within_radius"),
            F.coalesce(
                (F.col("min_rnk") == 1)
                & (F.col("max_rnk") == F.col("n_returned")),
                F.lit(True),
            )
            .cast("int")
            .alias("ranks_contiguous"),
            (
                F.coalesce(F.col("n_returned"), F.lit(0))
                <= F.least(F.lit(10), F.col("n_emb") - 1)
            )
            .cast("int")
            .alias("topk_capped"),
        )
    )


# Every column is a hard contract of the Spark pipeline (see the
# docstring), so the oracle's constant flags hold on ANY fixture — no
# fixture-measured LSH fill-rate assumption remains in this key.
_SIMSEARCH_LSH_SQL = """
SELECT e.vec_id AS q_id,
       CAST(1 AS INTEGER) AS within_radius,
       CAST(1 AS INTEGER) AS ranks_contiguous,
       CAST(1 AS INTEGER) AS topk_capped
FROM embeddings e WHERE e.vec_id < 5
"""


def simsearch_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse quantizer -> probe top-2 cells -> exact
    re-rank top-10. The 100 TB pattern: centroid scoring is O(cells),
    and only the probed cells' vectors are read (partition pruning when
    the table is laid out by cell).

    The coarse quantizer here is the label clustering; centroids are
    floor-scaled integer means (deterministic at any parallelism — a
    float mean would drift with partition order), so candidate sets and
    ranks are exact-reproducible and the whole pipeline hash-matches the
    SQL oracle. nprobe=2 gives recall < 1 by design vs `simsearch_topk`.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    # 1) deterministic per-cell centroids (64 dims)
    dims = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "val")
    )
    cdims = dims.groupBy("label", "pos").agg(
        (
            F.sum(F.floor(F.col("val").cast("double") * 1e8).cast("long")).cast(
                "double"
            )
            / (F.count(F.lit(1)).cast("double") * 1e8)
        ).alias("cval")
    )
    centroids = cdims.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))), lambda s: s.cval
        ).alias("centroid")
    )
    cnorm = _dot(F.col("centroid"), F.col("centroid"))
    cells = centroids.select("label", "centroid", cnorm.alias("cnrm"))
    # 2) probe: top-2 cells per query by centroid cosine. base feeds
    # three consumers (query filter, probe, final cell join) but the
    # re-derived work is one scan + norm fold — a checkpoint cut costs
    # more than it saves at this scale (measured); persist on a real
    # corpus where the scan dominates.
    norm = _dot(F.col("embedding"), F.col("embedding"))
    base = emb.select("vec_id", "label", "embedding", norm.alias("nrm"))
    queries = base.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c_cos = _dot(F.col("q_emb"), F.col("centroid")) / (
        F.sqrt("q_nrm") * F.sqrt("cnrm")
    )
    wc = Window.partitionBy("q_id").orderBy(F.col("c_cos").desc(), "label")
    probed = (
        queries.crossJoin(F.broadcast(cells))
        .withColumn("c_cos", c_cos)
        .withColumn("cell_rnk", F.row_number().over(wc))
        .where(F.col("cell_rnk") <= 2)
        .select("q_id", "q_emb", "q_nrm", "label")
    )
    # 3) exact re-rank inside the probed cells only
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt("q_nrm") * F.sqrt("nrm")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        base.join(probed, "label")
        .where(F.col("vec_id") != F.col("q_id"))
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("q_id", "vec_id", "cos", "rnk")
    )


_SIMSEARCH_IVF_SQL = f"""
WITH dims AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding) AS val
  FROM embeddings
),
cdims AS (
  SELECT label, pos,
         CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * 1e8) AS BIGINT)) AS DOUBLE)
           / (count(*) * 1e8) AS cval
  FROM dims GROUP BY label, pos
),
cells AS (
  SELECT label, list(cval ORDER BY pos) AS centroid FROM cdims GROUP BY label
),
cells_n AS (
  SELECT label, centroid, {_sql_dot('centroid', 'centroid')} AS cnrm FROM cells
),
base AS (
  SELECT vec_id, label, embedding,
         {_sql_dot('embedding', 'embedding')} AS nrm
  FROM embeddings
),
queries AS (
  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM base
  WHERE vec_id < 5
),
probed AS (
  SELECT q_id, q_emb, q_nrm, label FROM (
    SELECT q.q_id, q.q_emb, q.q_nrm, c.label,
           row_number() OVER (
             PARTITION BY q.q_id
             ORDER BY {_sql_dot('q.q_emb', 'c.centroid')}
                       / (sqrt(q.q_nrm) * sqrt(c.cnrm)) DESC, c.label) AS cell_rnk
    FROM queries q CROSS JOIN cells_n c
  ) WHERE cell_rnk <= 2
)
SELECT q_id, vec_id, cos, CAST(rnk AS INTEGER) AS rnk FROM (
  SELECT p.q_id, b.vec_id,
         {_sql_dot('p.q_emb', 'b.embedding')}
           / (sqrt(p.q_nrm) * sqrt(b.nrm)) AS cos,
         row_number() OVER (
           PARTITION BY p.q_id
           ORDER BY {_sql_dot('p.q_emb', 'b.embedding')}
                     / (sqrt(p.q_nrm) * sqrt(b.nrm)) DESC, b.vec_id) AS rnk
  FROM probed p JOIN base b ON b.label = p.label AND b.vec_id <> p.q_id
) WHERE rnk <= 10
"""


_KNN_K = 5
# Probe width for the knn-graph build (cells scanned per query). With
# the round-11 sqrt-n sub-cells, a wider-but-CONSTANT probe is the
# recall knob: coverage per query is probe/cells -> 0 as n grows, so
# recall rides on neighbor concentration in the nearest cells, and a
# finer grid targets the query's neighborhood more precisely than
# coarse label cells. Measured frontier (exact-5NN truth, round 11):
# on the WEAK-geometry fixture at sf0.1 (labels are not geometric
# clusters — conservative floor): old 10-label cells probe=2 ->
# recall 0.261 at 20% corpus coverage; sub-cells probe=2/4/6 ->
# 0.132 / 0.226 / 0.302 at 4/8/12% coverage. On a realistic
# micro-clustered 20k corpus (structure at the sqrt-n granularity
# real embedding corpora have): probe=2/4/6 -> 0.980 / 0.996 / 0.996
# at walls 24/41/71 s. probe=4 is the chosen point: it ties probe=6
# on realistic geometry, holds 0.87x the old default's recall on the
# adversarial one, and its build constant keeps the 10x-replica wall
# ~2x under the old quadratic shape (probe=6's larger constant only
# breaks even with old at 10x). Probe stays O(1) deliberately:
# p ~ cells would re-open the quadratic re-rank (n*p*cell_size). The
# same constant is interpolated into _KNN_GRAPH_SQL, so the oracle
# moves with it.
_KNN_PROBE = 4


def knn_graph_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds the k-NN GRAPH over the embedding corpus — every vector
    gets its top-``_KNN_K`` cosine neighbors via the IVF path (assign
    → probe top-2 cells → exact re-rank inside probed cells only).
    This is the bridge between the repo's two pillars: vectors in,
    GRAPH out — the edge list that semantic clustering (Louvain/CC on
    semantic edges), graph-based re-ranking, and diversity sampling
    consume, and the single-layer core of every graph-ANN index
    build (HNSW's layer-0 construction is exactly repeated
    probe-and-re-rank).

    Same determinism recipe as simsearch_ivf (floor-scaled integer
    centroid means, fully tie-broken ranks), so the whole edge list
    value-hashes against the oracle. 100 TB shape: queries here are
    ALL n vectors, so the re-rank term is n·cell_size = n²/cells —
    a FIXED cell count (the fixture's 10 labels, the round-≤10
    default) is quadratic-shaped under corpus growth (measured 15×
    wall at 10× data, BASELINE.md round-10 scale table). Round 11:
    the cell count now SCALES with the corpus — each label is split
    into m = ⌈√n / L⌉ geometric sub-cells (deterministic strided
    seeds by vec_id rank + one Lloyd assignment step, the same
    machinery as simsearch_ivf_rebalance), giving ≈√n cells total,
    so probe (n·cells) and re-rank (n·2·cell_size) balance at the
    O(n^1.5) IVF-flat build bound. Seeds ≈ √n rows stay broadcast-
    able (31k × 64 floats ≈ 8 MB at n = 10⁹). With the table laid
    out by cell (simsearch_ivf_partitioned) the probe side is
    partition-pruned per cell. MEMOIZED: an index build runs once
    and is then consumed (semantic_clusters, graph re-ranking); the
    scale tools clear the cache, so the true build cost stays
    measured there."""
    return memoized_checkpoint(
        spark, "knn_graph", sf_dir, lambda: _knn_graph_build(spark, sf_dir)
    )


def _knn_graph_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    norm = _dot(F.col("embedding"), F.col("embedding"))
    base = emb.select("vec_id", "label", "embedding", norm.alias("nrm"))
    # scale-aware cell count: m = ceil(sqrt(n) / L) sub-cells per
    # label -> labels*m >= sqrt(n) cells total. One global 2-scalar
    # aggregate, broadcast — keeps the whole build a single plan (no
    # driver-side collect deciding the shape).
    params = emb.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct("label").alias("n_labels"),
    ).select(
        F.ceil(
            F.sqrt(F.col("n_total").cast("double"))
            / F.col("n_labels").cast("double")
        ).cast("long").alias("m")
    )
    wr = Window.partitionBy("label").orderBy("vec_id")
    wl = Window.partitionBy("label")
    ranked = (
        base.withColumn("rnk0", F.row_number().over(wr) - F.lit(1))
        .withColumn("cnt", F.count(F.lit(1)).over(wl))
        .crossJoin(F.broadcast(params))
    )
    # deterministic seeds: the FIRST member (by vec_id rank) of each
    # of the m evenly-sized rank blocks within a label. Integer-div
    # block ids — float-free, so Spark and DuckDB agree exactly.
    blk = F.expr("(rnk0 * m) div cnt")
    prev_blk = F.expr("((rnk0 - 1) * m) div cnt")
    seeds = (
        ranked.where((F.col("rnk0") == 0) | (blk != prev_blk))
        .select(
            "label",
            blk.alias("sub"),
            F.col("embedding").alias("s_emb"),
            F.col("nrm").alias("s_nrm"),
        )
    )
    # one Lloyd assignment step: argmax cosine to the (broadcast)
    # same-label seeds, ties to the smaller sub id. n*m dots.
    a_cos = _dot(F.col("embedding"), F.col("s_emb")) / (
        F.sqrt("nrm") * F.sqrt("s_nrm")
    )
    wa = Window.partitionBy("vec_id").orderBy(F.col("a_cos").desc(), "sub")
    assign = (
        base.join(F.broadcast(seeds), "label")
        .withColumn("a_cos", a_cos)
        .withColumn("arn", F.row_number().over(wa))
        .where(F.col("arn") == 1)
        .select("vec_id", "label", "sub", "embedding", "nrm")
    )
    dims = assign.select(
        "label", "sub", F.posexplode(F.col("embedding")).alias("pos", "val")
    )
    cdims = dims.groupBy("label", "sub", "pos").agg(
        (
            F.sum(
                F.floor(F.col("val").cast("double") * 1e8).cast("long")
            ).cast("double")
            / (F.count(F.lit(1)).cast("double") * 1e8)
        ).alias("cval")
    )
    centroids = cdims.groupBy("label", "sub").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))),
            lambda s: s.cval,
        ).alias("centroid")
    )
    cnorm = _dot(F.col("centroid"), F.col("centroid"))
    cells = centroids.select("label", "sub", "centroid", cnorm.alias("cnrm"))
    queries = base.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c_cos = _dot(F.col("q_emb"), F.col("centroid")) / (
        F.sqrt("q_nrm") * F.sqrt("cnrm")
    )
    wc = Window.partitionBy("src").orderBy(
        F.col("c_cos").desc(), "label", "sub"
    )
    probed = (
        queries.crossJoin(F.broadcast(cells))
        .withColumn("c_cos", c_cos)
        .withColumn("cell_rnk", F.row_number().over(wc))
        .where(F.col("cell_rnk") <= _KNN_PROBE)
        .select("src", "q_emb", "q_nrm", "label", "sub")
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt("q_nrm") * F.sqrt("nrm")
    )
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), "vec_id")
    return (
        probed.join(assign, ["label", "sub"])
        .where(F.col("vec_id") != F.col("src"))
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _KNN_K)
        .select("src", F.col("vec_id").alias("dst"), "cos", "rnk")
    )


_KNN_GRAPH_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT vec_id, label, embedding,
         {_sql_dot('embedding', 'embedding')} AS nrm
  FROM embeddings
),
params AS (
  SELECT CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))
                   / CAST(count(DISTINCT label) AS DOUBLE)) AS BIGINT) AS m
  FROM base
),
ranked AS (
  SELECT b.vec_id, b.label, b.embedding, b.nrm,
         row_number() OVER (PARTITION BY b.label ORDER BY b.vec_id) - 1
           AS rnk0,
         count(*) OVER (PARTITION BY b.label) AS cnt, p.m
  FROM base b CROSS JOIN params p
),
seeds AS (
  SELECT label, (rnk0 * m) // cnt AS sub,
         embedding AS s_emb, nrm AS s_nrm
  FROM ranked
  WHERE rnk0 = 0 OR (rnk0 * m) // cnt <> ((rnk0 - 1) * m) // cnt
),
assign AS MATERIALIZED (
  SELECT vec_id, label, sub, embedding, nrm FROM (
    SELECT r.vec_id, r.label, s.sub, r.embedding, r.nrm,
           row_number() OVER (
             PARTITION BY r.vec_id
             ORDER BY {_sql_dot('r.embedding', 's.s_emb')}
                       / (sqrt(r.nrm) * sqrt(s.s_nrm)) DESC, s.sub) AS arn
    FROM base r JOIN seeds s USING (label)
  ) WHERE arn = 1
),
dims AS (
  SELECT label, sub, generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding) AS val
  FROM assign
),
cdims AS (
  SELECT label, sub, pos,
         CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * 1e8) AS BIGINT)) AS DOUBLE)
           / (count(*) * 1e8) AS cval
  FROM dims GROUP BY label, sub, pos
),
cells AS (
  SELECT label, sub, list(cval ORDER BY pos) AS centroid
  FROM cdims GROUP BY label, sub
),
cells_n AS (
  SELECT label, sub, centroid, {_sql_dot('centroid', 'centroid')} AS cnrm
  FROM cells
),
probed AS MATERIALIZED (
  SELECT src, q_emb, q_nrm, label, sub FROM (
    SELECT q.vec_id AS src, q.embedding AS q_emb, q.nrm AS q_nrm,
           c.label, c.sub,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_sql_dot('q.embedding', 'c.centroid')}
                       / (sqrt(q.nrm) * sqrt(c.cnrm)) DESC,
                      c.label, c.sub) AS cell_rnk
    FROM base q CROSS JOIN cells_n c
  ) WHERE cell_rnk <= {_KNN_PROBE}
)
SELECT src, dst, cos, CAST(rnk AS INTEGER) AS rnk FROM (
  SELECT p.src, b.vec_id AS dst,
         {_sql_dot('p.q_emb', 'b.embedding')}
           / (sqrt(p.q_nrm) * sqrt(b.nrm)) AS cos,
         row_number() OVER (
           PARTITION BY p.src
           ORDER BY {_sql_dot('p.q_emb', 'b.embedding')}
                     / (sqrt(p.q_nrm) * sqrt(b.nrm)) DESC, b.vec_id) AS rnk
  FROM probed p
  JOIN assign b ON b.label = p.label AND b.sub = p.sub
               AND b.vec_id <> p.src
) WHERE rnk <= {_KNN_K}
"""


_SEMCLUSTER_COS = 0.35  # edge floor: mutual-ish semantic similarity


def semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRAPH-based semantic clustering: connected components over the
    k-NN graph's strong edges (cos ≥ ``_SEMCLUSTER_COS``) — the
    graph-side complement of ``dedup_semantic``'s kmeans route, and
    the standard second stage after an ANN-graph build (cluster =
    mutually-reachable semantic neighborhood, no k to choose). Output:
    one row per vector with its cluster id (min vec_id in the
    component) and the cluster size.

    Pipeline composition story: embeddings → ``knn_graph_build`` (IVF
    probe, linear) → threshold to strong edges → Pregel CC (the same
    kernel every graph key uses) → grouped size. Every stage is an
    audited standalone key; nothing here is new machinery. Scale:
    the edge list is ≤ k·n rows by construction, so the CC runs on a
    bounded-degree graph whatever the corpus size. The result is
    memoized (like SCC/HITS/betweenness/MST): the min-label CC runs
    ~diameter Pregel rounds on the chain-heavy knn graph — ~12 s cold
    at sf0.1 after the round-9 edge-frame cut (the knn pipeline used
    to re-execute inside every superstep) — and every repeat consumer
    pays a memo fetch."""
    from graph_database_akkatyped_spark.operators.algos import cc_frame

    def build() -> DataFrame:
        edges = knn_graph_build(spark, sf_dir).where(
            F.col("cos") >= F.lit(_SEMCLUSTER_COS)
        ).select("src", "dst")
        emb = load_table(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("id")
        )
        # CUT the strong-edge frame before the Pregel loop: left lazy,
        # every CC superstep's message join re-executed the ENTIRE
        # un-memoized knn IVF pipeline (same recompute class as the
        # round-9 pagerank_frame fix).
        from graph_database_akkatyped_spark.caching import cut

        sym = cut(
            edges.select(
                F.col("src").alias("a"), F.col("dst").alias("b")
            ).unionAll(
                edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
            )
        )
        comp = cc_frame(emb, sym)
        sizes = comp.groupBy("component").agg(
            F.count(F.lit(1)).alias("cluster_size")
        )
        return (
            comp.join(sizes, "component")
            .select(
                F.col("id").alias("vec_id"),
                F.col("component").alias("cluster"),
                "cluster_size",
            )
        )

    return memoized_checkpoint(spark, "semantic_clusters", sf_dir, build)


_SEMCLUSTER_SQL = f"""
WITH RECURSIVE knn AS MATERIALIZED (
  SELECT src, dst FROM ({_KNN_GRAPH_SQL}) WHERE cos >= {_SEMCLUSTER_COS}
),
sym AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM knn
  UNION ALL SELECT dst AS a, src AS b FROM knn
),
verts AS (SELECT vec_id AS v FROM embeddings),
reach(s, d) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.s, e.b FROM reach r JOIN sym e ON e.a = r.d
),
comp AS (SELECT s AS vec_id, min(d) AS cluster FROM reach GROUP BY s)
SELECT c.vec_id, c.cluster, CAST(n.cluster_size AS BIGINT) AS cluster_size
FROM comp c
JOIN (SELECT cluster, count(*) AS cluster_size
      FROM comp GROUP BY cluster) n USING (cluster)
"""


_GREEDY_STEPS = 4  # bounded best-first hops (HNSW layer-0 search depth)
_GREEDY_ENTRY = 5  # fixed entry vertex (first non-query id)


def simsearch_greedy_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy BEST-FIRST SEARCH over the knn graph — the query-time
    half of graph-ANN (HNSW/NSG layer-0): start every query at a fixed
    entry vertex, and each hop move to the best-cosine vertex among
    the current vertex's knn out-neighbors (staying put if no neighbor
    improves). ``knn_graph_build`` is the index-construction half;
    this key demonstrates what that index is FOR. Deterministic by
    construction (fixed entry, fixed ``_GREEDY_STEPS`` hops, ties to
    the smaller vec_id), so the whole trajectory — not just the final
    hit — value-hash matches the unrolled SQL oracle.

    Scale shape: the walk state is |queries| rows; each hop is one
    equi-join into the (cut once — round-9 recompute lesson) knn edge
    list plus one broadcast-candidate lookup into the embedding table.
    Cost per hop is O(|queries|·K) candidate dot products regardless
    of corpus size — THE reason graph-ANN beats cell probing at query
    time. Output: (q_id, step, node, cos) trajectory rows."""
    edges = memoized_checkpoint(
        spark,
        "greedy_knn_edges",
        sf_dir,
        lambda: knn_graph_build(spark, sf_dir).select("src", "dst"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    norm = _dot(F.col("embedding"), F.col("embedding"))
    base = emb.select("vec_id", "embedding", norm.alias("nrm"))
    queries = base.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt("q_nrm") * F.sqrt("nrm")
    )
    state = (
        queries.crossJoin(
            F.broadcast(base.where(F.col("vec_id") == _GREEDY_ENTRY))
        )
        .select(
            "q_id",
            F.lit(0).cast("int").alias("step"),
            F.col("vec_id").alias("node"),
            cos.alias("cos"),
        )
    )
    traj = state
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "node")
    for step in range(1, _GREEDY_STEPS + 1):
        cand = (
            state.join(edges, state["node"] == edges["src"])
            .select("q_id", F.col("dst").alias("node"))
            .unionByName(state.select("q_id", "node"))
            .where(F.col("node") != F.col("q_id"))
            .distinct()
        )
        scored = (
            cand.join(base, cand["node"] == base["vec_id"])
            .join(F.broadcast(queries), "q_id")
            .select("q_id", "node", cos.alias("cos"))
        )
        state = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(
                "q_id",
                F.lit(step).cast("int").alias("step"),
                "node",
                "cos",
            )
        )
        traj = traj.unionByName(state)
    return traj


def _greedy_graph_sql() -> str:
    dotqb = _sql_dot("q.q_emb", "b.embedding")
    ctes = [
        f"knn AS MATERIALIZED (SELECT src, dst FROM ({_KNN_GRAPH_SQL}))",
        (
            "gbase AS MATERIALIZED (SELECT vec_id, embedding, "
            f"{_sql_dot('embedding', 'embedding')} AS nrm FROM embeddings)"
        ),
        (
            "gq AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm "
            "FROM gbase WHERE vec_id < 5)"
        ),
        (
            f"s0 AS (SELECT q.q_id, 0 AS step, b.vec_id AS node, "
            f"{dotqb} / (sqrt(q.q_nrm) * sqrt(b.nrm)) AS cos "
            f"FROM gq q JOIN gbase b ON b.vec_id = {_GREEDY_ENTRY})"
        ),
    ]
    for s in range(1, _GREEDY_STEPS + 1):
        p = f"s{s - 1}"
        ctes.append(
            f"s{s} AS (SELECT q_id, {s} AS step, node, cos FROM ("
            f"SELECT c.q_id, c.node, "
            f"{dotqb} / (sqrt(q.q_nrm) * sqrt(b.nrm)) AS cos, "
            f"row_number() OVER (PARTITION BY c.q_id ORDER BY "
            f"{dotqb} / (sqrt(q.q_nrm) * sqrt(b.nrm)) DESC, c.node) AS rn "
            f"FROM (SELECT DISTINCT q_id, node FROM ("
            f"SELECT {p}.q_id, k.dst AS node FROM {p} "
            f"JOIN knn k ON k.src = {p}.node "
            f"UNION ALL SELECT q_id, node FROM {p}) "
            f"WHERE node <> q_id) c "
            f"JOIN gbase b ON b.vec_id = c.node "
            f"JOIN gq q ON q.q_id = c.q_id"
            f") WHERE rn = 1)"
        )
    union = " UNION ALL ".join(
        f"SELECT q_id, CAST(step AS INT) AS step, node, cos FROM s{s}"
        for s in range(_GREEDY_STEPS + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


def _recall_vs_truth(truth: DataFrame, cand: DataFrame) -> DataFrame:
    """recall@k of a candidate set against exact ground truth: per-query
    hit counts via a left join on (q_id, vec_id), then ONE exact integer
    division per output column. The macro average is computed from the
    window-summed integer hit/truth counts (all per-query truth sets
    have equal size, so macro == micro) — never by averaging doubles,
    whose accumulation order differs between engines."""
    j = truth.join(
        cand.withColumn("hit", F.lit(1)), ["q_id", "vec_id"], "left"
    )
    per_q = (
        j.groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
        )
    )
    wall = Window.partitionBy()  # 1 row per query — trivially tiny
    return per_q.select(
        "q_id",
        "n_true",
        "n_hit",
        (F.col("n_hit").cast("double") / F.col("n_true")).alias("recall_at_10"),
        (
            F.sum("n_hit").over(wall).cast("double")
            / F.sum("n_true").over(wall)
        ).alias("macro_recall"),
    )


_MATRYOSHKA_DIMS = 32  # truncated prefix dimension (full vectors are 64)


def embedding_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of HALF-DIMENSION retrieval vs the full-dimension
    exact top-k — the Matryoshka trade-off scorecard: MRL-style models
    put the most informative components first, so serving can run ANN
    over a prefix slice (half the memory, half the FLOPs per dot
    product) and re-rank the survivors at full width. This key measures
    what the prefix costs on THIS corpus before a deployment flips that
    switch (random fixture vectors are the worst case — no information
    concentration — so the measured recall here is a floor).

    Same broadcast top-k scan on both sides (the truncated side just
    slices before the dot product); recall arithmetic is the shared
    integer ``_recall_vs_truth`` fold.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    truth = simsearch_topk(spark, sf_dir).select("q_id", "vec_id")
    sliced = emb.select(
        "vec_id", F.slice("embedding", 1, _MATRYOSHKA_DIMS).alias("embedding")
    )
    norm = _dot(F.col("embedding"), F.col("embedding"))
    base = sliced.select("vec_id", "embedding", norm.alias("nrm"))
    queries = base.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt("q_nrm") * F.sqrt("nrm")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    cand = (
        base.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("q_id"))
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("q_id", "vec_id")
    )
    return _recall_vs_truth(truth, cand)


def _matryoshka_sql(dims: int = _MATRYOSHKA_DIMS) -> str:
    half_dot = lambda a, b: _sql_dot(  # noqa: E731
        f"list_slice({a}, 1, {dims})", f"list_slice({b}, 1, {dims})"
    )
    return f"""
WITH truth AS (
  SELECT q_id, vec_id FROM ({_SIMSEARCH_TOPK_SQL})
),
eh AS MATERIALIZED (
  SELECT vec_id, embedding,
         {half_dot('embedding', 'embedding')} AS nrm
  FROM embeddings
),
cand AS (
  SELECT q_id, vec_id FROM (
    SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {half_dot('q.embedding', 'c.embedding')}
                       / (sqrt(q.nrm) * sqrt(c.nrm)) DESC, c.vec_id) AS rnk
    FROM eh q JOIN eh c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
  ) WHERE rnk <= 10
),
per_q AS (
  SELECT t.q_id, count(*) AS n_true,
         CAST(sum(CASE WHEN c.vec_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit
  FROM truth t LEFT JOIN cand c
    ON c.q_id = t.q_id AND c.vec_id = t.vec_id
  GROUP BY t.q_id
)
SELECT q_id, n_true, n_hit,
       CAST(n_hit AS DOUBLE) / n_true AS recall_at_10,
       CAST(sum(n_hit) OVER () AS DOUBLE) / sum(n_true) OVER ()
         AS macro_recall
FROM per_q
"""


def simsearch_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of BINARY-QUANTIZED retrieval vs full-precision exact
    top-k: each 64-dim float vector compresses to 64 SIGN BITS (two
    32-bit words — 32x less memory than float32, and distance becomes
    two XOR+popcount instructions), candidates rank by Hamming
    distance, and the scorecard measures what that buys back — the
    binary-quantization serving trick, completing the compression
    family (int8 ``embedding_quantize``, PQ, Matryoshka prefix).

    Exact integer arithmetic end to end: the packed words are sums of
    powers of two gated on ``emb[j] > 0`` (the same float comparison
    in both engines), Hamming is bit_count(xor) per word, ties break
    by vec_id. Random fixture vectors are again the floor case.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    truth = simsearch_topk(spark, sf_dir).select("q_id", "vec_id")

    def word(lo: int) -> Column:
        # expr form: the Python F.shiftleft wrapper demands a literal
        # shift, but the SQL function accepts the lambda variable
        return F.expr(
            f"aggregate(sequence({lo}, {lo + 31}), CAST(0 AS BIGINT), "
            f"(acc, j) -> acc + IF(element_at(embedding, CAST(j + 1 AS INT)) > 0, "
            f"shiftleft(CAST(1 AS BIGINT), CAST(j - {lo} AS INT)), "
            f"CAST(0 AS BIGINT)))"
        )

    packed = emb.select("vec_id", word(0).alias("h1"), word(32).alias("h2"))
    queries = packed.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("h1").alias("q1"),
        F.col("h2").alias("q2"),
    )
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("q1"))) + F.bit_count(
        F.col("h2").bitwiseXOR(F.col("q2"))
    )
    w = Window.partitionBy("q_id").orderBy("ham", "vec_id")
    cand = (
        packed.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("q_id"))
        .withColumn("ham", ham)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("q_id", "vec_id")
    )
    return _recall_vs_truth(truth, cand)


def _binary_hamming_sql() -> str:
    def word(lo: int) -> str:
        return (
            f"list_sum(list_transform(range({lo}, {lo + 32}), j -> "
            f"CASE WHEN embedding[j + 1] > 0 "
            f"THEN (CAST(1 AS BIGINT) << (j - {lo})) ELSE 0 END))"
        )

    return f"""
WITH truth AS (
  SELECT q_id, vec_id FROM ({_SIMSEARCH_TOPK_SQL})
),
packed AS MATERIALIZED (
  SELECT vec_id, CAST({word(0)} AS BIGINT) AS h1,
         CAST({word(32)} AS BIGINT) AS h2
  FROM embeddings
),
cand AS (
  SELECT q_id, vec_id FROM (
    SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY bit_count(xor(c.h1, q.h1))
                      + bit_count(xor(c.h2, q.h2)), c.vec_id) AS rnk
    FROM packed q JOIN packed c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
  ) WHERE rnk <= 10
),
per_q AS (
  SELECT t.q_id, count(*) AS n_true,
         CAST(sum(CASE WHEN c.vec_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit
  FROM truth t LEFT JOIN cand c
    ON c.q_id = t.q_id AND c.vec_id = t.vec_id
  GROUP BY t.q_id
)
SELECT q_id, n_true, n_hit,
       CAST(n_hit AS DOUBLE) / n_true AS recall_at_10,
       CAST(sum(n_hit) OVER () AS DOUBLE) / sum(n_true) OVER ()
         AS macro_recall
FROM per_q
"""


def simsearch_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF ANN path vs exact brute-force ground truth
    (`simsearch_topk`) — the number that tells a curator what nprobe=2
    buys: IVF reads only the probed cells, so recall < 1 by design, and
    this key turns the docstring claim into a measured, hash-checked
    value per query plus the corpus macro average. At scale the same
    query runs over a sampled query set as the standing ANN quality
    monitor."""
    truth = simsearch_topk(spark, sf_dir).select("q_id", "vec_id")
    cand = simsearch_ivf(spark, sf_dir).select("q_id", "vec_id")
    return _recall_vs_truth(truth, cand)


def simsearch_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the BucketedRandomProjectionLSH path vs the exact
    cosine ground truth, emitted as a hash-grade SCORECARD (round-8
    VERDICT #1): per query, the truth-set size (exact SQL) and an
    integer recall>=80% flag. The raw hit counts depend on Spark's
    internal seeded RNG (no SQL engine reproduces the projections),
    but they are deterministic per fixture — measured per-query recall
    is >=9/10 at sf0.001/0.01 and 10/10 at sf0.1, so the 80% gate
    carries a full miss of margin and is partition-stable. The
    deterministic-recall twin for the SQL-expressible ANN path is
    `simsearch_recall` (IVF).

    FIXTURE-MEASURED ASSUMPTION (round-9 ADVICE — this is the one
    column in the LSH pair that is an accuracy property, not a hard
    contract): nothing in BucketedRandomProjectionLSH guarantees 80%
    recall on an arbitrary corpus — the oracle's constant 1 encodes
    the margin MEASURED on these fixtures (seeded RNG makes it
    reproducible per fixture, and `n_true` stays exact-SQL either
    way). On a regenerated fixture or a new sf, treat a hash mismatch
    on this key as a sketch-accuracy miss to re-measure (then re-tune
    numHashTables/bucketLength or the gate), NOT as an engine bug;
    `simsearch_lsh`'s flags are the hard-contract half of the pair."""
    truth = simsearch_topk(spark, sf_dir).select("q_id", "vec_id")
    cand = _lsh_topk(spark, sf_dir).select("q_id", "vec_id")
    return _recall_vs_truth(truth, cand).select(
        "q_id",
        "n_true",
        (F.col("n_hit") * 10 >= F.col("n_true") * 8)
        .cast("int")
        .alias("recall_ge_80pct"),
    )


# recall_ge_80pct = 1 is FIXTURE-MEASURED (>=9/10 at sf0.001/0.01,
# 10/10 at sf0.1), not an LSH guarantee — on a regenerated fixture a
# mismatch here means "re-measure the sketch's recall", not "engine
# bug"; see the docstring above. n_true is exact SQL regardless.
_SIMSEARCH_RECALL_LSH_SQL = f"""
SELECT q_id, CAST(count(*) AS BIGINT) AS n_true,
       CAST(1 AS INTEGER) AS recall_ge_80pct
FROM ({_SIMSEARCH_TOPK_SQL})
GROUP BY q_id
"""


_SIMSEARCH_RECALL_SQL = f"""
WITH truth AS (
  SELECT q_id, vec_id FROM ({_SIMSEARCH_TOPK_SQL})
),
cand AS (
  SELECT q_id, vec_id FROM ({_SIMSEARCH_IVF_SQL})
),
per_q AS (
  SELECT t.q_id, count(*) AS n_true,
         CAST(sum(CASE WHEN c.vec_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit
  FROM truth t LEFT JOIN cand c
    ON c.q_id = t.q_id AND c.vec_id = t.vec_id
  GROUP BY t.q_id
)
SELECT q_id, n_true, n_hit,
       CAST(n_hit AS DOUBLE) / n_true AS recall_at_10,
       CAST(sum(n_hit) OVER () AS DOUBLE) / sum(n_true) OVER ()
         AS macro_recall
FROM per_q
"""


# ------------------------------------------- filtered ANN at index scale

_FILT_TENANT_MOD = 4  # synthetic tenant id = vec_id % 4 (stand-in for a
# real metadata column — license / language / tenant — riding the row)
_FILT_NPROBE = 4  # the filtered path probes MORE cells than the
# unfiltered one (nprobe 4 vs simsearch_ivf's 2): a 1-in-4 filter cuts
# eligible candidate density per cell ~4x, so the standard filtered-ANN
# compensation is to widen the probe proportionally — measured macro
# recall@10 at sf0.01: 0.22 (nprobe=2) -> 0.58 (nprobe=4)


def _tenant_col() -> Column:
    return (F.col("vec_id") % _FILT_TENANT_MOD).alias("tenant")


def simsearch_ivf_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN at INDEX scale: the round-5 pre-filter strategy
    (`simsearch_filtered_topk` put the predicate in the join condition)
    composed into the IVF path — probe the top-``_FILT_NPROBE`` cells
    per query by centroid cosine, then apply the metadata
    equi-predicate INSIDE each probed cell, so a candidate pays a dot
    product only if it is both in a probed cell AND filter-eligible. This is the shape every
    production retrieval stack needs (tenant / license / language
    filters over a cell-partitioned index): at 100 TB the cell id is
    the partition key and the filter column rides the row, so the scan
    reads only probed-cell files and Parquet row-group stats prune the
    filter before any vector math.

    The filter here is a synthetic ``tenant = vec_id % 4`` (the
    fixtures carry no second metadata column); the predicate is a pure
    function of the row, so the whole pipeline — deterministic integer
    centroids, cell probe, in-cell filter, exact re-rank — value-hash
    matches the SQL oracle. Recall < 1 by design when a query's true
    filtered neighbors live outside its probed cells; the honest
    scorecard is :func:`simsearch_recall_filtered`."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "val")
    )
    cdims = dims.groupBy("label", "pos").agg(
        (
            F.sum(F.floor(F.col("val").cast("double") * 1e8).cast("long")).cast(
                "double"
            )
            / (F.count(F.lit(1)).cast("double") * 1e8)
        ).alias("cval")
    )
    centroids = cdims.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))), lambda s: s.cval
        ).alias("centroid")
    )
    cells = centroids.select(
        "label", "centroid", _dot(F.col("centroid"), F.col("centroid")).alias("cnrm")
    )
    norm = _dot(F.col("embedding"), F.col("embedding"))
    base = emb.select(
        "vec_id", _tenant_col(), "label", "embedding", norm.alias("nrm")
    )
    queries = base.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("tenant").alias("q_tenant"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c_cos = _dot(F.col("q_emb"), F.col("centroid")) / (
        F.sqrt("q_nrm") * F.sqrt("cnrm")
    )
    wc = Window.partitionBy("q_id").orderBy(F.col("c_cos").desc(), "label")
    probed = (
        queries.crossJoin(F.broadcast(cells))
        .withColumn("c_cos", c_cos)
        .withColumn("cell_rnk", F.row_number().over(wc))
        .where(F.col("cell_rnk") <= _FILT_NPROBE)
        .select(
            "q_id", "q_tenant", "q_emb", "q_nrm",
            F.col("label").alias("p_label"),
        )
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt("q_nrm") * F.sqrt("nrm")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        base.join(
            probed,
            (F.col("label") == F.col("p_label"))
            & (F.col("tenant") == F.col("q_tenant"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("q_id", "vec_id", "tenant", "cos", "rnk")
    )


_IVF_FILTERED_SQL = f"""
WITH dims AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding) AS val
  FROM embeddings
),
cdims AS (
  SELECT label, pos,
         CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * 1e8) AS BIGINT)) AS DOUBLE)
           / (count(*) * 1e8) AS cval
  FROM dims GROUP BY label, pos
),
cells AS (
  SELECT label, list(cval ORDER BY pos) AS centroid FROM cdims GROUP BY label
),
cells_n AS (
  SELECT label, centroid, {_sql_dot('centroid', 'centroid')} AS cnrm FROM cells
),
base AS (
  SELECT vec_id, vec_id % {_FILT_TENANT_MOD} AS tenant, label, embedding,
         {_sql_dot('embedding', 'embedding')} AS nrm
  FROM embeddings
),
queries AS (
  SELECT vec_id AS q_id, tenant AS q_tenant, embedding AS q_emb,
         nrm AS q_nrm
  FROM base WHERE vec_id < 5
),
probed AS (
  SELECT q_id, q_tenant, q_emb, q_nrm, label FROM (
    SELECT q.q_id, q.q_tenant, q.q_emb, q.q_nrm, c.label,
           row_number() OVER (
             PARTITION BY q.q_id
             ORDER BY {_sql_dot('q.q_emb', 'c.centroid')}
                       / (sqrt(q.q_nrm) * sqrt(c.cnrm)) DESC, c.label) AS cell_rnk
    FROM queries q CROSS JOIN cells_n c
  ) WHERE cell_rnk <= {_FILT_NPROBE}
)
SELECT q_id, vec_id, tenant, cos, CAST(rnk AS INTEGER) AS rnk FROM (
  SELECT p.q_id, b.vec_id, b.tenant,
         {_sql_dot('p.q_emb', 'b.embedding')}
           / (sqrt(p.q_nrm) * sqrt(b.nrm)) AS cos,
         row_number() OVER (
           PARTITION BY p.q_id
           ORDER BY {_sql_dot('p.q_emb', 'b.embedding')}
                     / (sqrt(p.q_nrm) * sqrt(b.nrm)) DESC, b.vec_id) AS rnk
  FROM probed p JOIN base b
    ON b.label = p.label AND b.tenant = p.q_tenant AND b.vec_id <> p.q_id
) WHERE rnk <= 10
"""


def _filtered_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force filtered top-10 (tenant predicate only, every
    cell scanned) — the ground truth `simsearch_recall_filtered`
    measures the IVF path against."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = _dot(F.col("embedding"), F.col("embedding"))
    base = emb.select("vec_id", _tenant_col(), "embedding", norm.alias("nrm"))
    queries = base.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("tenant").alias("q_tenant"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt("q_nrm") * F.sqrt("nrm")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        base.join(
            F.broadcast(queries),
            (F.col("tenant") == F.col("q_tenant"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("q_id", "vec_id")
    )


def simsearch_recall_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the filtered IVF path vs exact filtered brute
    force — the honest scorecard for `simsearch_ivf_filtered` (mirrors
    `simsearch_recall` / `simsearch_recall_pq`): a probed cell set
    that misses a query's filtered neighborhood shows up here as a
    sub-1 recall, not as a silent wrong answer."""
    truth = _filtered_truth(spark, sf_dir)
    cand = simsearch_ivf_filtered(spark, sf_dir).select("q_id", "vec_id")
    return _recall_vs_truth(truth, cand)


_FILTERED_TRUTH_SQL = f"""
WITH base AS (
  SELECT vec_id, vec_id % {_FILT_TENANT_MOD} AS tenant, embedding,
         {_sql_dot('embedding', 'embedding')} AS nrm
  FROM embeddings
)
SELECT q_id, vec_id FROM (
  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY {_sql_dot('q.embedding', 'c.embedding')}
                     / (sqrt(q.nrm) * sqrt(c.nrm)) DESC, c.vec_id) AS rnk
  FROM base q JOIN base c
    ON q.vec_id < 5 AND c.tenant = q.tenant AND c.vec_id <> q.vec_id
) WHERE rnk <= 10
"""

_RECALL_FILTERED_SQL = f"""
WITH truth AS (
  {_FILTERED_TRUTH_SQL}
),
cand AS (
  SELECT q_id, vec_id FROM ({_IVF_FILTERED_SQL})
),
per_q AS (
  SELECT t.q_id, count(*) AS n_true,
         CAST(sum(CASE WHEN c.vec_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit
  FROM truth t LEFT JOIN cand c
    ON c.q_id = t.q_id AND c.vec_id = t.vec_id
  GROUP BY t.q_id
)
SELECT q_id, n_true, n_hit,
       CAST(n_hit AS DOUBLE) / n_true AS recall_at_10,
       CAST(sum(n_hit) OVER () AS DOUBLE) / sum(n_true) OVER ()
         AS macro_recall
FROM per_q
"""


def simsearch_ivf_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``simsearch_ivf`` with the index as a PHYSICAL layout: the
    corpus is written ``partitionBy(cell)`` and the probe reads ONLY
    the probed cells' directories — this key realizes the partition-
    pruning claim simsearch_ivf's docstring makes ("only the probed
    cells' vectors are read when the table is laid out by cell").
    tests/test_plans.py asserts the candidate scan carries a
    PartitionFilters entry on the cell column, i.e. the other cells'
    bytes are never opened.

    The probed cell set (nprobe × |queries| ≤ 10 pairs here; a bounded
    handful at any scale — it is the PROBE fan-out, not the corpus) is
    collected to the driver to form the static IN-list that the scan
    prunes on, the same bounded-collect pattern as the seed lists in
    operators.algos. Results are value-identical to ``simsearch_ivf``
    (same centroids, same probe, same re-rank over the same rows), so
    the oracle is the same SQL.

    The partitioned layout is written ONCE per sf_dir through
    ``caching.layout_dir`` (shared with the stream-replay splits in
    streaming.sinks): an index build is a one-time cost amortized over
    every probe, rewriting the corpus per invocation would both re-pay
    the partitionBy shuffle and leak a corpus-sized temp dir per call,
    and ``clear_frame_cache`` evicts + removes the layout so a
    regenerated sf_dir can never be probed through a stale one."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = layout_dir(
        "ivfpart",
        sf_dir,
        lambda d: emb.write.mode("overwrite").partitionBy("label").parquet(d),
    )
    idx = spark.read.parquet(out).select(
        "vec_id", F.col("label").cast("long").alias("label"), "embedding"
    )
    dims = idx.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "val")
    )
    cdims = dims.groupBy("label", "pos").agg(
        (
            F.sum(
                F.floor(F.col("val").cast("double") * 1e8).cast("long")
            ).cast("double")
            / (F.count(F.lit(1)).cast("double") * 1e8)
        ).alias("cval")
    )
    centroids = cdims.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))),
            lambda s: s.cval,
        ).alias("centroid")
    )
    cells = centroids.select(
        "label",
        "centroid",
        _dot(F.col("centroid"), F.col("centroid")).alias("cnrm"),
    )
    norm = _dot(F.col("embedding"), F.col("embedding"))
    queries = (
        emb.where(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            norm.alias("q_nrm"),
        )
    )
    c_cos = _dot(F.col("q_emb"), F.col("centroid")) / (
        F.sqrt("q_nrm") * F.sqrt("cnrm")
    )
    wc = Window.partitionBy("q_id").orderBy(F.col("c_cos").desc(), "label")
    probed = (
        queries.crossJoin(F.broadcast(cells))
        .withColumn("c_cos", c_cos)
        .withColumn("cell_rnk", F.row_number().over(wc))
        .where(F.col("cell_rnk") <= 2)
        .select("q_id", "q_emb", "q_nrm", "label")
    )
    # bounded probe fan-out -> static partition IN-list for the scan
    probed_cells = sorted(
        {r["label"] for r in probed.select("label").distinct().collect()}
    )
    cand = idx.where(F.col("label").isin(probed_cells)).select(
        "vec_id", "label", "embedding", norm.alias("nrm")
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt("q_nrm") * F.sqrt("nrm")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        cand.join(F.broadcast(probed), "label")
        .where(F.col("vec_id") != F.col("q_id"))
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("q_id", "vec_id", "cos", "rnk")
    )


# -------------------------------------------- incremental index append

_APPEND_MOD = 10  # vec_id % 10 == 7 -> the "new batch" (~10% of corpus)


def simsearch_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance: assign a NEW batch of vectors
    to the nearest centroid of a FROZEN index — never recluster the
    base corpus on append. The corpus splits deterministically (vec_id
    % {mod} == 7 is the arriving batch, the rest is the indexed base);
    centroids are rebuilt from the base only, with the same
    floor-scaled integer means as ``simsearch_ivf``, then each new
    vector picks its cell by centroid cosine (ties broken by cell id).

    Output per appended vector: the assigned cell, its centroid
    cosine, whether the assignment DRIFTED off the vector's own label
    cluster, and the cell's base fill count. The drifted fraction is
    the standing monitor a production index tracks — when it climbs,
    the frozen centroids no longer describe the data and a recluster
    (the expensive path this operator exists to avoid) is due.

    100 TB shape: O(batch x cells) broadcast assignment — the batch
    streams against a tiny broadcast centroid table, nothing touches
    the indexed base except the one-time centroid scan; appended rows
    land in per-cell partitions so probes keep pruning. Same shape as
    ``dedup_incremental`` (new-batch-vs-signature-table join).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    is_new = (F.col("vec_id") % _APPEND_MOD) == 7
    base = emb.where(~is_new)
    # frozen index: deterministic per-cell centroids from the BASE only
    dims = base.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "val")
    )
    cdims = dims.groupBy("label", "pos").agg(
        (
            F.sum(
                F.floor(F.col("val").cast("double") * 1e8).cast("long")
            ).cast("double")
            / (F.count(F.lit(1)).cast("double") * 1e8)
        ).alias("cval")
    )
    centroids = cdims.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))),
            lambda s: s.cval,
        ).alias("centroid")
    )
    fill = base.groupBy("label").agg(F.count(F.lit(1)).alias("cell_n_base"))
    cells = centroids.join(fill, "label").select(
        F.col("label").alias("cell"),
        "centroid",
        _dot(F.col("centroid"), F.col("centroid")).alias("cnrm"),
        "cell_n_base",
    )
    newb = emb.where(is_new).select(
        "vec_id",
        "label",
        "embedding",
        _dot(F.col("embedding"), F.col("embedding")).alias("nrm"),
    )
    c_cos = _dot(F.col("embedding"), F.col("centroid")) / (
        F.sqrt("nrm") * F.sqrt("cnrm")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("c_cos").desc(), "cell")
    return (
        newb.crossJoin(F.broadcast(cells))
        .withColumn("c_cos", c_cos)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select(
            "vec_id",
            "label",
            "cell",
            "c_cos",
            (F.col("cell") != F.col("label")).alias("drifted"),
            "cell_n_base",
        )
    )


simsearch_ivf_append.__doc__ = simsearch_ivf_append.__doc__.format(
    mod=_APPEND_MOD
)

_IVF_APPEND_SQL = f"""
WITH base AS (
  SELECT vec_id, label, embedding FROM embeddings
  WHERE vec_id % {_APPEND_MOD} <> 7
),
dims AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding) AS val
  FROM base
),
cdims AS (
  SELECT label, pos,
         CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * 1e8) AS BIGINT)) AS DOUBLE)
           / (count(*) * 1e8) AS cval
  FROM dims GROUP BY label, pos
),
cents AS (
  SELECT label AS cell, list(cval ORDER BY pos) AS centroid
  FROM cdims GROUP BY label
),
fill AS (
  SELECT label AS cell, CAST(count(*) AS BIGINT) AS cell_n_base
  FROM base GROUP BY label
),
cells AS (
  SELECT c.cell, c.centroid,
         {_sql_dot('c.centroid', 'c.centroid')} AS cnrm, f.cell_n_base
  FROM cents c JOIN fill f ON f.cell = c.cell
),
newb AS (
  SELECT vec_id, label, embedding,
         {_sql_dot('embedding', 'embedding')} AS nrm
  FROM embeddings WHERE vec_id % {_APPEND_MOD} = 7
)
SELECT vec_id, label, cell, c_cos, cell <> label AS drifted, cell_n_base
FROM (
  SELECT n.vec_id, n.label, c.cell,
         {_sql_dot('n.embedding', 'c.centroid')}
           / (sqrt(n.nrm) * sqrt(c.cnrm)) AS c_cos,
         c.cell_n_base,
         row_number() OVER (
           PARTITION BY n.vec_id
           ORDER BY {_sql_dot('n.embedding', 'c.centroid')}
                     / (sqrt(n.nrm) * sqrt(c.cnrm)) DESC, c.cell) AS rnk
  FROM newb n CROSS JOIN cells c
) WHERE rnk = 1
"""


# ------------------------------------------------ index rebalance

_REBAL_BASE_LABELS = 8  # labels >= this arrive AFTER the index build
_REBAL_NPROBE = 2
_REBAL_K = 10
_REBAL_NQ = 5


def _cell_means(members: DataFrame, key: str) -> DataFrame:
    """Deterministic per-cell centroid over ``members`` grouped by
    ``key`` — the same floor-scaled integer-mean discipline as
    ``simsearch_ivf`` (bit-identical across partitionings and engines).
    Returns (cell, centroid, cnrm)."""
    dims = members.select(
        F.col(key).alias("cell"),
        F.posexplode(F.col("embedding")).alias("pos", "val"),
    )
    cdims = dims.groupBy("cell", "pos").agg(
        (
            F.sum(
                F.floor(F.col("val").cast("double") * 1e8).cast("long")
            ).cast("double")
            / (F.count(F.lit(1)).cast("double") * 1e8)
        ).alias("cval")
    )
    cents = cdims.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))),
            lambda s: s.cval,
        ).alias("centroid")
    )
    return cents.select(
        "cell",
        "centroid",
        _dot(F.col("centroid"), F.col("centroid")).alias("cnrm"),
    )


def _nearest_cell(
    vecs: DataFrame, cells: DataFrame, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Assign every vector of ``vecs`` (vec_id, label, embedding, nrm)
    to its argmax-cosine cell from the broadcast ``cells`` table, ties
    to the smallest cell id. ``keep`` names extra caller columns to
    carry through the argmax (round-11 ADVICE: the rebalance report
    needs ``cell_stale`` on the assigned row, and re-inlining this
    window there risked the two argmaxes silently diverging — one
    definition now serves every assignment site).

    Round-11 measured negative (kept as-is on purpose): replacing this
    crossJoin + row_number window with a per-row higher-order argmax
    fold over a collected cell array (zero exchange, zero sort) timed
    simsearch_recall_rebalance 2.93s -> 4.07s same-session — the fold
    is CodegenFallback (interpreted per row, same finding as the
    ``_dot`` round-11 audit) while this shape keeps WindowGroupLimit's
    map-side top-1 prune and whole-stage codegen around the window, so
    the vec_id exchange it pays carries only one pre-pruned row per
    vector per map partition."""
    c_cos = _dot(F.col("embedding"), F.col("centroid")) / (
        F.sqrt("nrm") * F.sqrt("cnrm")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("c_cos").desc(), "cell")
    return (
        vecs.crossJoin(F.broadcast(cells))
        .withColumn("c_cos", c_cos)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select("vec_id", "label", "embedding", "nrm", "cell", *keep)
    )


def _rebal_state(spark: SparkSession, sf_dir: str):
    """Shared build for the rebalance pair: the index was built when
    only labels < ``_REBAL_BASE_LABELS`` existed (frozen per-label
    centroids); the remaining labels arrived later through the
    ``simsearch_ivf_append`` path (nearest-frozen-centroid placement —
    the drifted corpus). Rebalance = ONE Lloyd step over the drifted
    corpus: recompute each cell's centroid from its CURRENT members,
    then reassign every vector to the nearest recomputed centroid.

    Returns (corpus, frozen cells, stale assignment, rebalanced cells,
    new assignment)."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        "embedding",
        _dot(F.col("embedding"), F.col("embedding")).alias("nrm"),
    )
    base = corpus.where(F.col("label") < _REBAL_BASE_LABELS)
    app = corpus.where(F.col("label") >= _REBAL_BASE_LABELS)
    frozen = _cell_means(base, "label")
    stale = base.withColumn("cell", F.col("label")).unionByName(
        _nearest_cell(app, frozen)
    )
    rebal = _cell_means(stale, "cell")
    new = _nearest_cell(corpus, rebal)
    return corpus, frozen, stale, rebal, new


def simsearch_ivf_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index REBALANCE — the maintenance step that closes the
    lifecycle build → partition → filter → append → rebalance: after a
    batch of out-of-distribution appends (``simsearch_ivf_append``
    placed labels >= {base} into an index frozen before they existed),
    recompute every cell's centroid from its current members and
    reassign the full corpus (one deterministic Lloyd step — see
    ``_rebal_state``).

    Output per cell: stale fill, how many appended vectors landed
    there, rebalanced fill, vectors moved in/out by the reassignment,
    and the centroid shift (cosine between the frozen and recomputed
    centroid) — the report a production index owner reads to decide
    whether the rebalance changed anything. The measured recall
    recovery lives in the twin ``simsearch_recall_rebalance``.

    100 TB shape: two broadcast argmax-assignment passes over the
    corpus (tiny centroid table each time) + two integer-mean
    aggregations shuffling (cell, pos) pairs — all linear, no pairwise
    term; identical shape to one k-means iteration, which is the
    cheapest honest rebalance there is.

    Round-11 shape fix (guide §1.2/§2.4): the old report derived its
    five fill/move measures from FOUR separate aggregates over the
    stale/new assignment frames plus a corpus-sized vec_id self-join
    (stale ⋈ new) — each use re-computing the whole assignment subtree
    (plans/r11/simsearch_ivf_rebalance_before.txt: 102 Exchanges, 50
    parquet scans, zero reuse). Both assignments now ride on ONE
    per-vector row (the rebalanced cell is attached to the stale row
    by an in-place window argmax over the broadcast centroids — no
    vec_id self-join), each
    row emits its two per-cell contributions (stale-side and
    new-side), and a single partial+final aggregate produces the
    whole report. Same numbers: the stale-side contribution sums
    reproduce stale_fill/n_arrived/n_moved_out, the new-side ones
    new_fill/n_moved_in, and cells missing from a measure sum to 0 —
    exactly what the old left-join + coalesce(0) emitted. The
    rebalanced-cell attach keeps ``_nearest_cell``'s window shape
    (its HOF-fold variant was a measured negative — see that
    docstring) but runs it on the SAME rows that carry cell_stale,
    so no vec_id self-join is ever needed."""
    _, frozen, stale, rebal, _ = _rebal_state(spark, sf_dir)
    moves = _nearest_cell(
        stale.withColumnRenamed("cell", "cell_stale"),
        rebal,
        keep=("cell_stale",),
    ).select(
        "label",
        "cell_stale",
        F.col("cell").alias("cell_new"),
    )
    moved = (F.col("cell_new") != F.col("cell_stale")).cast("long")
    contrib = moves.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("cell_stale").alias("cell"),
                    F.lit(1).cast("long").alias("stale_fill"),
                    (F.col("label") >= _REBAL_BASE_LABELS)
                    .cast("long")
                    .alias("n_arrived"),
                    F.lit(0).cast("long").alias("new_fill"),
                    F.lit(0).cast("long").alias("n_moved_in"),
                    moved.alias("n_moved_out"),
                ),
                F.struct(
                    F.col("cell_new").alias("cell"),
                    F.lit(0).cast("long").alias("stale_fill"),
                    F.lit(0).cast("long").alias("n_arrived"),
                    F.lit(1).cast("long").alias("new_fill"),
                    moved.alias("n_moved_in"),
                    F.lit(0).cast("long").alias("n_moved_out"),
                ),
            )
        ).alias("c")
    ).select("c.*")
    agg = contrib.groupBy("cell").agg(
        F.sum("stale_fill").alias("stale_fill"),
        F.sum("n_arrived").alias("n_arrived"),
        F.sum("new_fill").alias("new_fill"),
        F.sum("n_moved_in").alias("n_moved_in"),
        F.sum("n_moved_out").alias("n_moved_out"),
    )
    shift = frozen.alias("f").join(rebal.alias("r"), "cell").select(
        "cell",
        (
            _dot(F.col("f.centroid"), F.col("r.centroid"))
            / (F.sqrt("f.cnrm") * F.sqrt("r.cnrm"))
        ).alias("shift_cos"),
    )
    return agg.join(shift, "cell").select(
        "cell",
        "stale_fill",
        "n_arrived",
        "new_fill",
        "n_moved_in",
        "n_moved_out",
        "shift_cos",
    )


simsearch_ivf_rebalance.__doc__ = simsearch_ivf_rebalance.__doc__.format(
    base=_REBAL_BASE_LABELS
)


def _rebal_probe(queries: DataFrame, cells: DataFrame, assign: DataFrame,
                 hit_col: str) -> DataFrame:
    """nprobe-cell probe + exact re-rank within probed cells (the same
    probe as ``simsearch_ivf``) against one (cells, assignment) index
    generation; returns (q_id, vec_id) candidate top-k."""
    c_cos = _dot(F.col("q_emb"), F.col("centroid")) / (
        F.sqrt("q_nrm") * F.sqrt("cnrm")
    )
    wc = Window.partitionBy("q_id").orderBy(F.col("c_cos").desc(), "cell")
    probed = (
        queries.crossJoin(F.broadcast(cells))
        .withColumn("c_cos", c_cos)
        .withColumn("cell_rnk", F.row_number().over(wc))
        .where(F.col("cell_rnk") <= _REBAL_NPROBE)
        .select("q_id", "q_emb", "q_nrm", "cell")
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt("q_nrm") * F.sqrt("nrm")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        assign.join(F.broadcast(probed), "cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _REBAL_K)
        .select(
            F.col("q_id").alias(f"q_{hit_col}"),
            F.col("vec_id").alias(hit_col),
        )
    )


def simsearch_recall_rebalance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recall twin of ``simsearch_ivf_rebalance`` — measures (never
    asserts) the recovery: the {nq} lowest-id APPENDED vectors query
    both index generations (stale frozen-centroid placement vs the
    rebalanced one) with the standard nprobe={np} probe, scored against
    exact brute-force top-{k} truth over the full corpus. Appended
    queries are exactly the ones a drifted index serves worst: their
    cosine to every frozen centroid is noise, so the stale probe picks
    near-arbitrary cells, while the rebalanced centroids carry the
    arrived mass and point the probe back at it."""
    corpus, frozen, stale, rebal, new = _rebal_state(spark, sf_dir)
    queries = (
        corpus.where(F.col("label") >= _REBAL_BASE_LABELS)
        .orderBy("vec_id")
        .limit(_REBAL_NQ)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt("q_nrm") * F.sqrt("nrm")
    )
    wt = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    truth = (
        corpus.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("q_id"))
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(wt))
        .where(F.col("rnk") <= _REBAL_K)
        .select("q_id", "vec_id")
    )
    c_stale = _rebal_probe(queries, frozen, stale, "hit_stale")
    c_rebal = _rebal_probe(queries, rebal, new, "hit_rebal")
    per_q = (
        truth.join(
            c_stale,
            (F.col("q_id") == F.col("q_hit_stale"))
            & (F.col("vec_id") == F.col("hit_stale")),
            "left",
        )
        .join(
            c_rebal,
            (F.col("q_id") == F.col("q_hit_rebal"))
            & (F.col("vec_id") == F.col("hit_rebal")),
            "left",
        )
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.count("hit_stale").alias("n_hit_stale"),
            F.count("hit_rebal").alias("n_hit_rebal"),
        )
    )
    return per_q.select(
        "q_id",
        "n_true",
        "n_hit_stale",
        "n_hit_rebal",
        (F.col("n_hit_stale").cast("double") / F.col("n_true")).alias(
            "recall_stale"
        ),
        (F.col("n_hit_rebal").cast("double") / F.col("n_true")).alias(
            "recall_rebal"
        ),
        (
            F.sum("n_hit_stale").over(Window.partitionBy()).cast("double")
            / F.sum("n_true").over(Window.partitionBy())
        ).alias("macro_stale"),
        (
            F.sum("n_hit_rebal").over(Window.partitionBy()).cast("double")
            / F.sum("n_true").over(Window.partitionBy())
        ).alias("macro_rebal"),
    )


simsearch_recall_rebalance.__doc__ = simsearch_recall_rebalance.__doc__.format(
    nq=_REBAL_NQ, np=_REBAL_NPROBE, k=_REBAL_K
)

_REBAL_STATE_SQL = f"""
corpus AS MATERIALIZED (
  SELECT vec_id, CAST(label AS BIGINT) AS label, embedding,
         {_sql_dot('embedding', 'embedding')} AS nrm
  FROM embeddings
),
fdims AS (
  SELECT label AS cell, generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding) AS val
  FROM corpus WHERE label < {_REBAL_BASE_LABELS}
),
fcd AS MATERIALIZED (
  SELECT cell, pos,
         CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * 1e8) AS BIGINT)) AS DOUBLE)
           / (count(*) * 1e8) AS cval
  FROM fdims GROUP BY cell, pos
),
frozen AS (
  SELECT cell, list(cval ORDER BY pos) AS centroid FROM fcd GROUP BY cell
),
frozen2 AS MATERIALIZED (
  SELECT cell, centroid, {_sql_dot('centroid', 'centroid')} AS cnrm
  FROM frozen
),
app_assign AS MATERIALIZED (
  SELECT vec_id, label, embedding, nrm, cell FROM (
    SELECT c.vec_id, c.label, c.embedding, c.nrm, f.cell,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY {_sql_dot('c.embedding', 'f.centroid')}
                       / (sqrt(c.nrm) * sqrt(f.cnrm)) DESC, f.cell) AS rnk
    FROM corpus c CROSS JOIN frozen2 f
    WHERE c.label >= {_REBAL_BASE_LABELS}
  ) WHERE rnk = 1
),
stale AS MATERIALIZED (
  SELECT vec_id, label, embedding, nrm, label AS cell
  FROM corpus WHERE label < {_REBAL_BASE_LABELS}
  UNION ALL
  SELECT vec_id, label, embedding, nrm, cell FROM app_assign
),
rdims AS (
  SELECT cell, generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding) AS val
  FROM stale
),
rcd AS MATERIALIZED (
  SELECT cell, pos,
         CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * 1e8) AS BIGINT)) AS DOUBLE)
           / (count(*) * 1e8) AS cval
  FROM rdims GROUP BY cell, pos
),
rebalc AS (
  SELECT cell, list(cval ORDER BY pos) AS centroid FROM rcd GROUP BY cell
),
rebal2 AS MATERIALIZED (
  SELECT cell, centroid, {_sql_dot('centroid', 'centroid')} AS cnrm
  FROM rebalc
),
newa AS MATERIALIZED (
  SELECT vec_id, label, embedding, nrm, cell FROM (
    SELECT c.vec_id, c.label, c.embedding, c.nrm, r.cell,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY {_sql_dot('c.embedding', 'r.centroid')}
                       / (sqrt(c.nrm) * sqrt(r.cnrm)) DESC, r.cell) AS rnk
    FROM corpus c CROSS JOIN rebal2 r
  ) WHERE rnk = 1
)"""

_IVF_REBALANCE_SQL = f"""
WITH {_REBAL_STATE_SQL}
SELECT f.cell,
       sf.stale_fill, sf.n_arrived,
       coalesce(nf.new_fill, 0) AS new_fill,
       coalesce(mi.n_moved_in, 0) AS n_moved_in,
       coalesce(mo.n_moved_out, 0) AS n_moved_out,
       {_sql_dot('f.centroid', 'r.centroid')}
         / (sqrt(f.cnrm) * sqrt(r.cnrm)) AS shift_cos
FROM frozen2 f
JOIN rebal2 r ON r.cell = f.cell
JOIN (
  SELECT cell, CAST(count(*) AS BIGINT) AS stale_fill,
         CAST(sum(CASE WHEN label >= {_REBAL_BASE_LABELS}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_arrived
  FROM stale GROUP BY cell
) sf ON sf.cell = f.cell
LEFT JOIN (
  SELECT cell, CAST(count(*) AS BIGINT) AS new_fill
  FROM newa GROUP BY cell
) nf ON nf.cell = f.cell
LEFT JOIN (
  SELECT n.cell, CAST(count(*) AS BIGINT) AS n_moved_in
  FROM newa n JOIN stale s ON s.vec_id = n.vec_id
  WHERE n.cell <> s.cell GROUP BY n.cell
) mi ON mi.cell = f.cell
LEFT JOIN (
  SELECT s.cell, CAST(count(*) AS BIGINT) AS n_moved_out
  FROM newa n JOIN stale s ON s.vec_id = n.vec_id
  WHERE n.cell <> s.cell GROUP BY s.cell
) mo ON mo.cell = f.cell
"""

_REBAL_PROBE_SQL_TMPL = """
probed_{tag} AS MATERIALIZED (
  SELECT q_id, q_emb, q_nrm, cell FROM (
    SELECT q.q_id, q.q_emb, q.q_nrm, x.cell,
           row_number() OVER (
             PARTITION BY q.q_id
             ORDER BY {qdot} / (sqrt(q.q_nrm) * sqrt(x.cnrm)) DESC,
                      x.cell) AS cell_rnk
    FROM qs q CROSS JOIN {cells} x
  ) WHERE cell_rnk <= {nprobe}
),
cand_{tag} AS MATERIALIZED (
  SELECT q_id, vec_id FROM (
    SELECT p.q_id, a.vec_id,
           row_number() OVER (
             PARTITION BY p.q_id
             ORDER BY {adot} / (sqrt(p.q_nrm) * sqrt(a.nrm)) DESC,
                      a.vec_id) AS rnk
    FROM {assign} a JOIN probed_{tag} p ON p.cell = a.cell
    WHERE a.vec_id <> p.q_id
  ) WHERE rnk <= {k}
)"""

_RECALL_REBALANCE_SQL = f"""
WITH {_REBAL_STATE_SQL},
qs AS MATERIALIZED (
  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm
  FROM corpus WHERE label >= {_REBAL_BASE_LABELS}
  ORDER BY vec_id LIMIT {_REBAL_NQ}
),
truth AS MATERIALIZED (
  SELECT q_id, vec_id FROM (
    SELECT q.q_id, c.vec_id,
           row_number() OVER (
             PARTITION BY q.q_id
             ORDER BY {_sql_dot('q.q_emb', 'c.embedding')}
                       / (sqrt(q.q_nrm) * sqrt(c.nrm)) DESC,
                      c.vec_id) AS rnk
    FROM corpus c CROSS JOIN qs q WHERE c.vec_id <> q.q_id
  ) WHERE rnk <= {_REBAL_K}
),{_REBAL_PROBE_SQL_TMPL.format(
    tag='stale', cells='frozen2', assign='stale',
    nprobe=_REBAL_NPROBE, k=_REBAL_K,
    qdot=_sql_dot('q.q_emb', 'x.centroid'),
    adot=_sql_dot('p.q_emb', 'a.embedding'))},{_REBAL_PROBE_SQL_TMPL.format(
    tag='rebal', cells='rebal2', assign='newa',
    nprobe=_REBAL_NPROBE, k=_REBAL_K,
    qdot=_sql_dot('q.q_emb', 'x.centroid'),
    adot=_sql_dot('p.q_emb', 'a.embedding'))},
per_q AS (
  SELECT t.q_id, count(*) AS n_true,
         CAST(sum(CASE WHEN cs.vec_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit_stale,
         CAST(sum(CASE WHEN cr.vec_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit_rebal
  FROM truth t
  LEFT JOIN cand_stale cs ON cs.q_id = t.q_id AND cs.vec_id = t.vec_id
  LEFT JOIN cand_rebal cr ON cr.q_id = t.q_id AND cr.vec_id = t.vec_id
  GROUP BY t.q_id
)
SELECT q_id, n_true, n_hit_stale, n_hit_rebal,
       CAST(n_hit_stale AS DOUBLE) / n_true AS recall_stale,
       CAST(n_hit_rebal AS DOUBLE) / n_true AS recall_rebal,
       CAST(sum(n_hit_stale) OVER () AS DOUBLE) / sum(n_true) OVER ()
         AS macro_stale,
       CAST(sum(n_hit_rebal) OVER () AS DOUBLE) / sum(n_true) OVER ()
         AS macro_rebal
FROM per_q
"""


# ------------------------------------------------- product quantization

_PQ_SUB = 8  # subspaces (64 dims -> 8 x 8-dim subvectors)


def _pq_dist_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, c_label, m, d_int): 1e9-scaled integer squared L2
    distance between every vector's m-th subvector and every codebook
    centroid for that subspace. The codebook is the label clustering's
    floor-scaled integer mean (same deterministic construction as
    ``simsearch_ivf``), sliced per subspace; per-dim squared errors are
    floored into BIGINTs BEFORE the per-subspace sum so the aggregate
    is partition-order-proof and engine-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", "label", F.posexplode(F.col("embedding")).alias("pos", "val")
    )
    cdims = dims.groupBy(F.col("label").alias("c_label"), "pos").agg(
        (
            F.sum(F.floor(F.col("val").cast("double") * 1e8).cast("long")).cast(
                "double"
            )
            / (F.count(F.lit(1)).cast("double") * 1e8)
        ).alias("cval")
    )
    diff = F.col("val").cast("double") - F.col("cval")
    se = dims.join(F.broadcast(cdims), "pos").select(
        "vec_id",
        "c_label",
        F.expr(f"pos div {64 // _PQ_SUB}").alias("m"),
        F.floor(diff * diff * 1e9).cast("long").alias("se_int"),
    )
    return se.groupBy("vec_id", "c_label", "m").agg(
        F.sum("se_int").alias("d_int")
    )


def simsearch_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: encode every vector as 8 sub-codes
    (nearest codebook centroid per 8-dim subspace), then answer queries
    by Asymmetric Distance Computation — the query's exact distance to
    each centroid, summed over the stored codes. This is THE 100 TB
    ANN memory layout: 64 floats (256 B) compress to 8 code bytes, the
    ADC lookup table is |queries| x M x K (tiny, broadcast), and scan
    cost per query is one byte-table lookup-join instead of a float
    dot product per vector.

    Determinism: codebook = deterministic integer-mean centroids;
    distances are 1e9-scaled integer sums; code assignment and final
    ranking break ties by label/vec_id — the whole ANN pipeline
    hash-matches the DuckDB oracle, like `simsearch_ivf`.
    """
    dist = _pq_dist_frame(spark, sf_dir)
    wc = Window.partitionBy("vec_id", "m").orderBy("d_int", "c_label")
    codes = (
        dist.withColumn("rn", F.row_number().over(wc))
        .where(F.col("rn") == 1)
        .select("vec_id", "m", F.col("c_label").alias("code"))
    )
    # ADC lookup table: the query's OWN subspace distances to centroids
    qd = dist.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("c_label").alias("code"),
        "m",
        "d_int",
    )
    adc = (
        codes.join(F.broadcast(qd), ["m", "code"])
        .where(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("d_int").alias("adc_e9"))
    )
    w = Window.partitionBy("q_id").orderBy("adc_e9", "vec_id")
    return (
        adc.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select(
            "q_id",
            "vec_id",
            "adc_e9",
            F.round(F.col("adc_e9").cast("double") / 1e9, 6).alias("adc_dist"),
            "rnk",
        )
    )


_PQ_DIST_SQL = f"""
dims AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding) AS val
  FROM embeddings
),
cdims AS (
  SELECT label AS c_label, pos,
         CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * 1e8) AS BIGINT)) AS DOUBLE)
           / (count(*) * 1e8) AS cval
  FROM dims GROUP BY label, pos
),
pq_dist AS (
  SELECT vec_id, c_label, m, CAST(SUM(se_int) AS BIGINT) AS d_int
  FROM (
    SELECT d.vec_id, c.c_label, d.pos // {64 // _PQ_SUB} AS m,
           CAST(floor((CAST(d.val AS DOUBLE) - c.cval)
                    * (CAST(d.val AS DOUBLE) - c.cval) * 1e9) AS BIGINT)
             AS se_int
    FROM dims d JOIN cdims c ON c.pos = d.pos
  )
  GROUP BY vec_id, c_label, m
)
"""

_SIMSEARCH_PQ_SQL = f"""
WITH {_PQ_DIST_SQL.strip()},
codes AS (
  SELECT vec_id, m, c_label AS code FROM (
    SELECT vec_id, m, c_label,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY d_int, c_label) AS rn
    FROM pq_dist
  ) WHERE rn = 1
),
qd AS (
  SELECT vec_id AS q_id, c_label AS code, m, d_int
  FROM pq_dist WHERE vec_id < 5
),
adc AS (
  SELECT qd.q_id, c.vec_id, CAST(SUM(qd.d_int) AS BIGINT) AS adc_e9
  FROM codes c JOIN qd ON qd.m = c.m AND qd.code = c.code
  WHERE c.vec_id <> qd.q_id
  GROUP BY qd.q_id, c.vec_id
)
SELECT q_id, vec_id, adc_e9,
       round(CAST(adc_e9 AS DOUBLE) / 1e9, 6) AS adc_dist, rnk
FROM (
  SELECT q_id, vec_id, adc_e9,
         CAST(row_number() OVER (PARTITION BY q_id
                                 ORDER BY adc_e9, vec_id) AS INT) AS rnk
  FROM adc
) WHERE rnk <= 10
"""


def simsearch_recall_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the PQ/ADC path vs exact cosine ground truth — the
    compression-vs-quality number (8 code bytes per vector vs 256
    float bytes). PQ approximates L2 on raw vectors while the truth is
    cosine top-k, so this also surfaces the metric mismatch a curator
    must know about before swapping PQ in."""
    truth = simsearch_topk(spark, sf_dir).select("q_id", "vec_id")
    cand = simsearch_pq(spark, sf_dir).select("q_id", "vec_id")
    return _recall_vs_truth(truth, cand)


_SIMSEARCH_RECALL_PQ_SQL = f"""
WITH truth AS (
  SELECT q_id, vec_id FROM ({_SIMSEARCH_TOPK_SQL})
),
cand AS (
  SELECT q_id, vec_id FROM ({_SIMSEARCH_PQ_SQL})
),
per_q AS (
  SELECT t.q_id, count(*) AS n_true,
         CAST(sum(CASE WHEN c.vec_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit
  FROM truth t LEFT JOIN cand c
    ON c.q_id = t.q_id AND c.vec_id = t.vec_id
  GROUP BY t.q_id
)
SELECT q_id, n_true, n_hit,
       CAST(n_hit AS DOUBLE) / n_true AS recall_at_10,
       CAST(sum(n_hit) OVER () AS DOUBLE) / sum(n_true) OVER ()
         AS macro_recall
FROM per_q
"""


def simsearch_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse probe × PQ/ADC fine ranking — the composition FAISS
    ships as IVFADC and the layout every billion-vector deployment
    actually runs: the coarse quantizer prunes the corpus to the
    probed cells (here the same per-label centroids and nprobe=2 probe
    as ``simsearch_ivf``), and inside those cells candidates are
    ranked by PQ asymmetric distance (8 code bytes per vector, the
    broadcast ADC table of ``simsearch_pq``) instead of exact float
    dot products. Cost per query: |probed cells| ÷ |corpus| of the
    scan × 1 byte-lookup-join per candidate — both axes compressed.

    This repo's PQ codes raw vectors (production IVFADC encodes the
    RESIDUAL vs the coarse centroid — finer quantization, same
    plumbing; the raw variant keeps the codes shared with
    ``simsearch_pq`` so the two keys pin the same codebook).
    Determinism: integer-mean centroids, 1e9-floored integer ADC
    sums, (adc, vec_id) tie-breaks — full SQL-hash oracle. Recall
    twin: ``simsearch_recall_ivfadc``."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        "embedding",
        _dot(F.col("embedding"), F.col("embedding")).alias("nrm"),
    )
    cells = _cell_means(corpus, "label")
    queries = corpus.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c_cos = _dot(F.col("q_emb"), F.col("centroid")) / (
        F.sqrt("q_nrm") * F.sqrt("cnrm")
    )
    wc = Window.partitionBy("q_id").orderBy(F.col("c_cos").desc(), "cell")
    probed = (
        queries.crossJoin(F.broadcast(cells))
        .withColumn("c_cos", c_cos)
        .withColumn("cell_rnk", F.row_number().over(wc))
        .where(F.col("cell_rnk") <= 2)
        .select("q_id", F.col("cell").alias("label"))
    )
    dist = _pq_dist_frame(spark, sf_dir)
    wcode = Window.partitionBy("vec_id", "m").orderBy("d_int", "c_label")
    codes = (
        dist.withColumn("rn", F.row_number().over(wcode))
        .where(F.col("rn") == 1)
        .select("vec_id", "m", F.col("c_label").alias("code"))
    )
    qd = dist.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("c_label").alias("code"),
        "m",
        "d_int",
    )
    cand = (
        corpus.select("vec_id", "label")
        .join(F.broadcast(probed), "label")
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
    )
    adc = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(qd), ["q_id", "m", "code"])
        .groupBy("q_id", "vec_id")
        .agg(F.sum("d_int").alias("adc_e9"))
    )
    w = Window.partitionBy("q_id").orderBy("adc_e9", "vec_id")
    return (
        adc.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select(
            "q_id",
            "vec_id",
            "adc_e9",
            F.round(F.col("adc_e9").cast("double") / 1e9, 6).alias(
                "adc_dist"
            ),
            "rnk",
        )
    )


def simsearch_recall_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVFADC path vs exact cosine ground truth — the
    twin every approximate path in this module carries. IVFADC stacks
    TWO approximations (cell pruning × PQ distance); its recall is
    bounded above by ``simsearch_recall`` (IVF alone: same probe, same
    candidate pool, and the exact re-rank is the optimal selection
    from that pool, so any PQ re-rank of it can only tie or lose),
    while ``simsearch_recall_pq`` (PQ alone) is a reference, not a
    bound — pruning can remove PQ distractors. Measured at sf0.01:
    IVF 0.30, PQ 0.10, IVFADC 0.10 — the quantization dominates the
    loss on the weakly-clustered fixture geometry."""
    truth = simsearch_topk(spark, sf_dir).select("q_id", "vec_id")
    cand = simsearch_ivfadc(spark, sf_dir).select("q_id", "vec_id")
    return _recall_vs_truth(truth, cand)


_IVFADC_SQL = f"""
WITH {_PQ_DIST_SQL.strip()},
codes AS (
  SELECT vec_id, m, c_label AS code FROM (
    SELECT vec_id, m, c_label,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY d_int, c_label) AS rn
    FROM pq_dist
  ) WHERE rn = 1
),
qd AS (
  SELECT vec_id AS q_id, c_label AS code, m, d_int
  FROM pq_dist WHERE vec_id < 5
),
ccell AS (
  -- coarse centroids = the SAME per-label integer means the PQ
  -- codebook already computed (cdims), re-keyed as cells
  SELECT c_label AS label, list(cval ORDER BY pos) AS centroid
  FROM cdims GROUP BY c_label
),
cells_n AS (
  SELECT label, centroid, {_sql_dot('centroid', 'centroid')} AS cnrm
  FROM ccell
),
qs AS (
  SELECT vec_id AS q_id, embedding AS q_emb,
         {_sql_dot('embedding', 'embedding')} AS q_nrm
  FROM embeddings WHERE vec_id < 5
),
probed AS (
  SELECT q_id, label FROM (
    SELECT q.q_id, c.label,
           row_number() OVER (
             PARTITION BY q.q_id
             ORDER BY {_sql_dot('q.q_emb', 'c.centroid')}
                       / (sqrt(q.q_nrm) * sqrt(c.cnrm)) DESC,
                      c.label) AS cell_rnk
    FROM qs q CROSS JOIN cells_n c
  ) WHERE cell_rnk <= 2
),
cand AS (
  SELECT p.q_id, e.vec_id
  FROM embeddings e JOIN probed p ON p.label = e.label
  WHERE e.vec_id <> p.q_id
),
adc AS (
  SELECT ca.q_id, co.vec_id, CAST(SUM(qd.d_int) AS BIGINT) AS adc_e9
  FROM cand ca
  JOIN codes co ON co.vec_id = ca.vec_id
  JOIN qd ON qd.q_id = ca.q_id AND qd.m = co.m AND qd.code = co.code
  GROUP BY ca.q_id, co.vec_id
)
SELECT q_id, vec_id, adc_e9,
       round(CAST(adc_e9 AS DOUBLE) / 1e9, 6) AS adc_dist, rnk
FROM (
  SELECT q_id, vec_id, adc_e9,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY adc_e9, vec_id) AS rnk
  FROM adc
) WHERE rnk <= 10
"""

_RECALL_IVFADC_SQL = f"""
WITH truth AS (
  SELECT q_id, vec_id FROM ({_SIMSEARCH_TOPK_SQL})
),
cand AS (
  SELECT q_id, vec_id FROM ({_IVFADC_SQL})
),
per_q AS (
  SELECT t.q_id, count(*) AS n_true,
         CAST(sum(CASE WHEN c.vec_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hit
  FROM truth t LEFT JOIN cand c
    ON c.q_id = t.q_id AND c.vec_id = t.vec_id
  GROUP BY t.q_id
)
SELECT q_id, n_true, n_hit,
       CAST(n_hit AS DOUBLE) / n_true AS recall_at_10,
       CAST(sum(n_hit) OVER () AS DOUBLE) / sum(n_true) OVER ()
         AS macro_recall
FROM per_q
"""


def simsearch_pairs_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avg intra-label cosine similarity (clustering sanity check) —
    computed WITHOUT the all-pairs self-join.

    For unit vectors v̂, Σ_{i<j} v̂_i·v̂_j = (‖Σv̂‖² − Σ‖v̂‖²) / 2, so the
    per-label pair-sum needs only the per-label component sums: O(n·d)
    work and two hash aggregations instead of the O(n²/L) join that made
    this the worst scale-killer in round 2 (3.5 s at sf0.1; unbounded at
    100 TB).

    Exact-decimal discipline: each normalized component is floor-scaled
    to integer micro-units (u_k = floor(v̂_k·1e6), BIGINT), so every sum
    and square is exact integer math — bit-identical across engines and
    partition orders. ``sum2_cos_e12`` is TWICE the pair-sum in e12
    units (kept doubled so it stays a pure BIGINT; halving happens only
    in the float ``avg_cos``). Headroom, stage by stage: ``ss`` and all
    later sums accumulate in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB)
    from the FIRST aggregation — a LONG accumulator for Σui² would wrap
    at ~9.2e6 rows per label. The remaining limits are the LONG ``s``
    (|Σui| ≤ n·1e6 → n ≲ 9e12), the DECIMAL(38,0) ‖Σu‖² (n ≲ 1e12),
    and — tightest — the e12-scaled BIGINT output ``sum2_cos_e12``
    itself (≈ n²·avg_cos·1e12 ≤ 9.2e18 → n ≲ 3e3/√avg_cos for tightly
    clustered labels). That last one is an output-unit choice, not an
    internal hazard: both engines fail the final cast loudly and
    identically; for corpora beyond it, drop the unit scale (e6) or
    emit the DECIMAL directly."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = _dot(F.col("embedding"), F.col("embedding"))
    # single pass: explode the RAW embedding alongside a once-per-row
    # nrm column (Generate copies it to each emitted row — quantizing
    # inside a transform() lambda instead would let CollapseProject
    # inline the 64-term norm fold per ELEMENT, a measured 6x slowdown),
    # quantize per exploded row in codegen, then the (label, pos) agg
    # yields component sums S_k AND per-component square sums AND the
    # row count n (identical at every pos) — so the whole identity
    # reduces to two chained hash aggs, no join, one parquet scan
    ui = F.floor(
        F.col("x").cast("double") / F.sqrt(F.col("nrm")) * F.lit(1e6)
    ).cast("long")
    comp = (
        emb.select(
            "label",
            norm.alias("nrm"),
            F.posexplode("embedding").alias("pos", "x"),
        )
        .select("label", "pos", ui.alias("ui"))
        .groupBy("label", "pos")
        .agg(
            F.sum("ui").alias("s"),
            # each product fits BIGINT (|ui| <= 1e6 -> ui^2 <= 1e12) but
            # the SUM must accumulate in DECIMAL(38,0): a LONG
            # accumulator wraps at ~9.2e6 rows per label (silent with
            # ANSI off, ARITHMETIC_OVERFLOW under Spark 4's ANSI
            # default) while the DuckDB oracle sums into HUGEINT —
            # engine parity would break exactly at scale
            F.sum((F.col("ui") * F.col("ui")).cast("decimal(38,0)")).alias("ss"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return (
        comp.groupBy("label")
        .agg(
            F.max("cnt").alias("n"),
            F.sum(F.col("s").cast("decimal(38,0)") * F.col("s"))
            .alias("snorm2"),
            F.sum(F.col("ss").cast("decimal(38,0)")).alias("sum_unorm2"),
        )
        .where(F.col("n") >= 2)
        .select(
            "label",
            F.expr("n * (n - 1) DIV 2").alias("n_pairs"),
            (
                F.col("snorm2") - F.col("sum_unorm2").cast("decimal(38,0)")
            ).cast("long").alias("sum2_cos_e12"),
            (
                (
                    F.col("snorm2")
                    - F.col("sum_unorm2").cast("decimal(38,0)")
                ).cast("double")
                / F.lit(2e12)
                / F.expr("n * (n - 1) DIV 2")
            ).alias("avg_cos"),
        )
    )


_SIMSEARCH_PAIRS_SQL = f"""
WITH e AS (
  SELECT vec_id, label, embedding, {_sql_dot('embedding', 'embedding')} AS nrm
  FROM embeddings
),
q AS (
  SELECT label,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) / sqrt(nrm) * 1e6) AS BIGINT)) AS u
  FROM e
),
comp AS (
  SELECT label, pos,
         CAST(SUM(ui) AS BIGINT) AS s,
         CAST(SUM(ui * ui) AS HUGEINT) AS ss,
         count(*) AS cnt
  FROM (
    SELECT label, unnest(u) AS ui, generate_subscripts(u, 1) AS pos
    FROM q
  ) GROUP BY label, pos
),
agg AS (
  SELECT label, MAX(cnt) AS n,
         SUM(CAST(s AS HUGEINT) * s) AS snorm2,
         SUM(ss) AS sum_unorm2
  FROM comp GROUP BY label
)
SELECT label,
       n * (n - 1) // 2 AS n_pairs,
       CAST(snorm2 - sum_unorm2 AS BIGINT) AS sum2_cos_e12,
       CAST(snorm2 - sum_unorm2 AS DOUBLE) / 2e12
         / (n * (n - 1) // 2) AS avg_cos
FROM agg
WHERE n >= 2
"""


# ----------------------------------------------------------- text analysis


def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 words per language."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(F.expr(_TOKS)).alias("token"))
    counts = toks.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "token")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
    )


_TEXT_WORDCOUNT_SQL = """
SELECT lang, token, cnt, CAST(rnk AS INTEGER) AS rnk FROM (
  SELECT lang, token, count(*) AS cnt,
         row_number() OVER (PARTITION BY lang
                            ORDER BY count(*) DESC, token) AS rnk
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY lang, token
) WHERE rnk <= 10
"""


def text_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary profile: token count, vocabulary size,
    hapax-legomena count (tokens seen exactly once in that source),
    type-token ratio and hapax share in integer basis points. The
    corpus diagnostic a data curator reads next to ``text_zipf_fit``:
    synthetic/templated sources show collapsed vocabularies and low
    hapax shares, scraped natural text shows Heaps-law growth — and a
    dedup or decontamination pass shifts both, so this doubles as the
    before/after scorecard for curation runs.

    Shape: explode -> ONE (source, token) count (map-side combinable)
    -> one |vocab|-sized aggregate per source. No joins, no windows;
    linear at 100 TB with shuffle bounded by the vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(F.expr(_TOKS)).alias("tok"))
    vt = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("tc"))
    g = vt.groupBy("source").agg(
        F.sum("tc").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum((F.col("tc") == 1).cast("long")).alias("hapax"),
    )
    docs_per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return g.join(docs_per_src, "source").select(
        "source",
        "n_docs",
        "n_tokens",
        "vocab",
        "hapax",
        F.expr("vocab * 10000 div n_tokens").alias("ttr_bp"),
        F.expr("hapax * 10000 div vocab").alias("hapax_bp"),
    )


_TEXT_VOCAB_SQL = """
WITH vt AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS tc
  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents)
  GROUP BY source, tok
),
g AS (
  SELECT source, CAST(sum(tc) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS vocab,
         CAST(sum(CASE WHEN tc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
  FROM vt GROUP BY source
),
d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source)
SELECT g.source, d.n_docs, g.n_tokens, g.vocab, g.hapax,
       g.vocab * 10000 // g.n_tokens AS ttr_bp,
       g.hapax * 10000 // g.vocab AS hapax_bp
FROM g JOIN d ON d.source = g.source
"""


_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10
_BM25_NQ = 3  # pseudo-query docs: the _BM25_NQ smallest doc_ids


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval — the canonical sparse scorer (Robertson
    k1/b form, idf = ln((N − df + 0.5)/(df + 0.5) + 1)): for each
    pseudo-query (the DISTINCT tokens of the ``_BM25_NQ`` smallest
    docs, a deterministic stand-in for user queries), score candidate
    docs that share ≥ 1 term and keep the top-``_BM25_TOPK``. This is
    the text-side baseline simsearch_hybrid_rrf's rank fusion expects
    from a production retrieval stack (its own sparse branch is plain
    token overlap; BM25 is what real pipelines run there).

    Determinism: the per-term partial score is a double (ln + division
    chain — bit-identical across engines, same precedent as
    text_tfidf's round-8 ln), but the per-(query, doc) SUM over terms
    would be order-dependent in doubles — so each term is rounded to 8
    decimals and scaled to an exact BIGINT (floor(x·1e8 + 0.5)) BEFORE
    the sum: integer addition is order-free, making even the float
    ``score`` column (score_e8 / 1e8) hash-exact.

    100 TB shape: tf/df/dl are the linear token-explode aggregates the
    tfidf key already runs; the query side is ≤ |query terms| rows —
    broadcast; candidate generation is one equi-join on the token key
    (inverted-index probe), never query × corpus. avgdl is a 1-row
    broadcast. The window ranks ≤ candidates-per-query."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.expr(_TOKS)).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tc"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    qtoks = (
        tf.where(F.col("doc_id") < _BM25_NQ)
        .select(F.col("doc_id").alias("q_doc"), "token")
        .distinct()
    )
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term = idf * (
        F.col("tc") * (_BM25_K1 + 1)
    ) / (
        F.col("tc")
        + _BM25_K1
        * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    term_e8 = F.floor(F.round(term, 8) * F.lit(1e8) + F.lit(0.5)).cast(
        "long"
    )
    scored = (
        tf.join(F.broadcast(qtoks), "token")
        .where(F.col("doc_id") != F.col("q_doc"))
        .join(dl, "doc_id")
        .join(df_, "token")
        .crossJoin(F.broadcast(stats))
        .select("q_doc", "doc_id", term_e8.alias("term_e8"))
        .groupBy("q_doc", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("term_e8").alias("score_e8"),
        )
    )
    w = Window.partitionBy("q_doc").orderBy(
        F.col("score_e8").desc(), "doc_id"
    )
    return (
        scored.withColumn("score", F.col("score_e8").cast("double") / 1e8)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _BM25_TOPK)
        .select("q_doc", "doc_id", "n_terms", "score_e8", "score", "rnk")
    )


_TEXT_BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tc
       FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
qtoks AS (
  SELECT DISTINCT doc_id AS q_doc, token FROM tf WHERE doc_id < {_BM25_NQ}
),
terms AS (
  -- every operand is forced to DOUBLE before arithmetic: DuckDB would
  -- otherwise evaluate the 0.5/2.2/0.75 literals in DECIMAL (exact
  -- rational) lanes, which can differ from Spark's all-double chain
  -- by 1 ulp — enough to flip the e8 floor
  SELECT q.q_doc, tf.doc_id,
         CAST(floor(round(
           ln((CAST(s.n - df.df AS DOUBLE) + 0.5)
              / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
           * (CAST(tf.tc AS DOUBLE) * {_BM25_K1 + 1!r})
           / (CAST(tf.tc AS DOUBLE) + {_BM25_K1!r}
              * ({1 - _BM25_B!r}
                 + {_BM25_B!r} * CAST(dl.dl AS DOUBLE) / s.avgdl)),
           8) * 1e8 + 0.5) AS BIGINT) AS term_e8
  FROM tf
  JOIN qtoks q ON q.token = tf.token AND tf.doc_id <> q.q_doc
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN df ON df.token = tf.token
  CROSS JOIN stats s
),
scored AS (
  SELECT q_doc, doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(term_e8) AS BIGINT) AS score_e8
  FROM terms GROUP BY 1, 2
)
SELECT q_doc, doc_id, n_terms, score_e8,
       CAST(score_e8 AS DOUBLE) / 1e8 AS score,
       CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY q_doc ORDER BY score_e8 DESC, doc_id) AS rnk
  FROM scored
) WHERE rnk <= {_BM25_TOPK}
"""


def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per doc, in plain DataFrame math (tf =
    count/len, idf = ln(N/df)) — kept oracle-able instead of ml.IDF."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.select(F.countDistinct("doc_id").alias("n"))
    toks = docs.select("doc_id", F.explode(F.expr(_TOKS)).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tc"))
    doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(doclen, "doc_id")
        .join(df_, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf_r8",
            F.round(
                (F.col("tc").cast("double") / F.col("dl"))
                * F.log(F.col("n").cast("double") / F.col("df")),
                8,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf_r8").desc(), "token")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("doc_id", "token", "tfidf_r8", "rnk")
    )


_TEXT_TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tc FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token,
         round((CAST(tc AS DOUBLE) / dl) * ln(CAST(n AS DOUBLE) / df), 8)
           AS tfidf_r8
  FROM tf JOIN dl ON dl.doc_id = tf.doc_id
  JOIN df ON df.token = tf.token CROSS JOIN n
)
SELECT doc_id, token, tfidf_r8, CAST(rnk AS INTEGER) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf_r8 DESC, token) AS rnk
  FROM scored
) WHERE rnk <= 5
"""


def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 word bigrams per language."""
    docs = load_table(spark, sf_dir, "documents")
    grams = _toks_frame(docs, "lang").select(
        "lang",
        F.explode(
            F.expr(
                "transform(slice(toks, 1, size(toks) - 1), "
                "(x, i) -> concat(x, ' ', toks[i + 1]))"
            )
        ).alias("bigram"),
    )
    counts = grams.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "bigram")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
    )


_TEXT_NGRAMS_SQL = """
SELECT lang, bigram, cnt, CAST(rnk AS INTEGER) AS rnk FROM (
  SELECT lang, bigram, count(*) AS cnt,
         row_number() OVER (PARTITION BY lang
                            ORDER BY count(*) DESC, bigram) AS rnk
  FROM (
    SELECT lang,
           unnest(list_filter(
             list_transform(list_slice(toks, 1, len(toks) - 1),
                            (x, i) -> x || ' ' || toks[i + 1]),
             g -> g IS NOT NULL)) AS bigram
    FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents)
  )
  GROUP BY lang, bigram
) WHERE rnk <= 10
"""


_ZIPF_HEAD = 1000  # fit the distribution head — Zipf's law holds there,
                   # and top-k keeps the rank a TakeOrdered, not a sort


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Zipf diagnostics: least-squares slope of ln(freq) on
    ln(rank) over the top-``_ZIPF_HEAD`` terms — the corpus-health
    number (natural text ≈ −1; machine-generated or boilerplate-heavy
    corpora drift off it) plus intercept and r². One row.

    Numeric discipline: x = ln(rank) and y = ln(count) are floored
    into 1e6-scaled BIGINTs per term (the unigram-logprob recipe), so
    Σx, Σy, Σxy, Σx², Σy² are exact integers; the normal-equation
    numerator/denominator are exact DECIMAL(38,0) products of those
    sums, and slope/intercept/r² are final IEEE divisions on identical
    operands in both engines.

    Scale: the only order-dependent step is top-k by frequency —
    orderBy+limit (per-partition heaps), never a full vocabulary sort;
    the rank is then a window over ≤1000 rows. Everything before is
    one explode + one groupBy.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.expr(_TOKS)).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tc"))
    head = vocab.orderBy(F.col("tc").desc(), "tok").limit(_ZIPF_HEAD)
    w = Window.orderBy(F.col("tc").desc(), "tok")
    pts = head.select(
        F.floor(F.log(F.row_number().over(w).cast("double")) * 1e6)
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("tc").cast("double")) * 1e6)
        .cast("long")
        .alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = dec("n") * dec("sxy") - dec("sx") * dec("sy")
    den = dec("n") * dec("sxx") - dec("sx") * dec("sx")
    dyy = dec("n") * dec("syy") - dec("sy") * dec("sy")
    slope = num.cast("double") / den.cast("double")
    return sums.select(
        "n",
        slope.alias("slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / (F.col("n").cast("double") * F.lit(1e6))
        ).alias("intercept"),
        (
            (num.cast("double") * num.cast("double"))
            / (den.cast("double") * dyy.cast("double"))
        ).alias("r2"),
    )


_ZIPF_SQL = f"""
WITH vocab AS (
  SELECT tok, count(*) AS tc
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
),
head AS (
  SELECT tc, row_number() OVER (ORDER BY tc DESC, tok) AS rnk
  FROM vocab ORDER BY tc DESC, tok LIMIT {_ZIPF_HEAD}
),
pts AS (
  SELECT CAST(floor(ln(CAST(rnk AS DOUBLE)) * 1e6) AS BIGINT) AS x,
         CAST(floor(ln(CAST(tc AS DOUBLE)) * 1e6) AS BIGINT) AS y
  FROM head
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pts
)
SELECT n,
       CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy
            AS DOUBLE)
         / CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx
                AS DOUBLE) AS slope,
       (CAST(sy AS DOUBLE)
          - (CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy
                  AS DOUBLE)
             / CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx
                    AS DOUBLE)) * CAST(sx AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(1e6 AS DOUBLE)) AS intercept,
       (CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy
             AS DOUBLE)
        * CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy
               AS DOUBLE))
         / (CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx
                 AS DOUBLE)
            * CAST(CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy
                   AS DOUBLE)) AS r2
FROM sums
"""


_BPE_TOPK = 20  # post-merge pair stats reported


def text_bpe_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE tokenizer-training step over the corpus — the primitive
    a byte-pair-encoding trainer iterates: count adjacent symbol
    pairs, pick the most frequent (count DESC, pair ASC on ties —
    deterministic), APPLY the merge greedily left-to-right, and
    report the refreshed top-``_BPE_TOPK`` pair statistics alongside
    the chosen merge. The full trainer is this step in a loop; one
    step exercises every distributed piece (the loop adds nothing new
    to the plan, just iterations).

    The classic scale trick is structural here: BPE trains on the
    WORD-FREQUENCY DICTIONARY, not the corpus — one explode + groupBy
    folds 100 TB of text into a vocab-bounded frame (|vocab| ~ 1e7
    rows at corpus scale), and every subsequent window/join/aggregate
    shuffles on ``word``, the dictionary's key. Corpus size only ever
    enters through the one initial groupBy.

    The greedy-apply step needs left-to-right non-overlap semantics
    ("aaa" + merge (a,a) → [aa, a], not two overlapping merges).
    That is sequential on its face, but within a word the match sites
    form runs of consecutive positions, and greedy keeps exactly the
    even offsets within each run — so the application is two window
    functions (run id = pos − row_number, then parity against the
    run's min pos), no UDF, no per-row Python. All counts are exact
    BIGINTs; strings and integers only — hash-stable by construction.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    wseq = Window.partitionBy("word").orderBy("pos")
    syms = words.select(
        "word",
        "wc",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("pos"),
    ).withColumn("sym", F.col("word").substr(F.col("pos"), F.lit(1)))
    adj = syms.withColumn("nxt", F.lead("sym").over(wseq))
    pair0 = (
        adj.where(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("l"), F.col("nxt").alias("r"))
        .agg(F.sum("wc").alias("cnt"))
    )
    top = (
        pair0.orderBy(F.col("cnt").desc(), "l", "r")
        .limit(1)
        .select(F.col("l").alias("ml"), F.col("r").alias("mr"))
    )
    hits = (
        adj.crossJoin(F.broadcast(top))
        .where((F.col("sym") == F.col("ml")) & (F.col("nxt") == F.col("mr")))
        .withColumn("run", F.col("pos") - F.row_number().over(wseq))
    )
    wrun = Window.partitionBy("word", "run")
    starts = (
        hits.withColumn(
            "keep", ((F.col("pos") - F.min("pos").over(wrun)) % 2) == 0
        )
        .where("keep")
        .select("word", F.col("pos").alias("mpos"))
    )
    merged = (
        adj.join(
            starts.select(
                "word", F.col("mpos").alias("pos"), F.lit(True).alias("m")
            ),
            ["word", "pos"],
            "left",
        )
        .join(
            starts.select(
                "word",
                (F.col("mpos") + 1).alias("pos"),
                F.lit(True).alias("gone"),
            ),
            ["word", "pos"],
            "left",
        )
        .where(F.col("gone").isNull())
        .select(
            "word",
            "wc",
            "pos",
            F.when(F.col("m"), F.concat("sym", "nxt"))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )
    adj2 = merged.withColumn("nxt", F.lead("sym").over(wseq))
    pair1 = (
        adj2.where(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("l"), F.col("nxt").alias("r"))
        .agg(F.sum("wc").alias("cnt"))
    )
    return (
        pair1.crossJoin(F.broadcast(top))
        .orderBy(F.col("cnt").desc(), "l", "r")
        .limit(_BPE_TOPK)
        .select("ml", "mr", "l", "r", "cnt")
    )


_BPE_SQL = f"""
WITH words AS (
  SELECT word, CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
        FROM documents)
  WHERE word <> '' GROUP BY word
),
syms AS (
  SELECT word, wc, CAST(pos AS BIGINT) AS pos,
         substr(word, CAST(pos AS INTEGER), 1) AS sym
  FROM (SELECT word, wc, unnest(range(1, length(word) + 1)) AS pos
        FROM words)
),
adj AS MATERIALIZED (
  SELECT word, wc, pos, sym,
         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
  FROM syms
),
pair0 AS (
  SELECT sym AS l, nxt AS r, CAST(sum(wc) AS BIGINT) AS cnt
  FROM adj WHERE nxt IS NOT NULL GROUP BY 1, 2
),
top AS MATERIALIZED (
  SELECT l AS ml, r AS mr FROM pair0 ORDER BY cnt DESC, l, r LIMIT 1
),
hits AS (
  SELECT a.word, a.pos,
         a.pos - row_number() OVER (PARTITION BY a.word ORDER BY a.pos)
           AS run
  FROM adj a, top t
  WHERE a.sym = t.ml AND a.nxt = t.mr
),
starts AS MATERIALIZED (
  SELECT word, pos AS mpos FROM (
    SELECT word, pos,
           (pos - min(pos) OVER (PARTITION BY word, run)) % 2 = 0 AS keep
    FROM hits) WHERE keep
),
merged AS (
  SELECT a.word, a.wc, a.pos,
         CASE WHEN s.mpos IS NOT NULL THEN a.sym || a.nxt
              ELSE a.sym END AS sym
  FROM adj a
  LEFT JOIN starts s ON s.word = a.word AND s.mpos = a.pos
  LEFT JOIN starts d ON d.word = a.word AND d.mpos + 1 = a.pos
  WHERE d.mpos IS NULL
),
adj2 AS (
  SELECT word, wc, sym,
         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
  FROM merged
),
pair1 AS (
  SELECT sym AS l, nxt AS r, CAST(sum(wc) AS BIGINT) AS cnt
  FROM adj2 WHERE nxt IS NOT NULL GROUP BY 1, 2
)
SELECT t.ml, t.mr, p.l, p.r, p.cnt
FROM pair1 p, top t
ORDER BY p.cnt DESC, p.l, p.r LIMIT {_BPE_TOPK}
"""


# Fixed merge table for text_bpe_encode, applied in rank order. The
# third merge consumes the first's output symbol ("table" -> ta b le
# -> tab le), so the multi-character-symbol path is exercised.
_BPE_MERGES = (("t", "a"), ("l", "e"), ("ta", "b"))


def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a FIXED BPE merge table to the corpus and report exact
    per-document token counts — the inference-side twin of
    ``text_bpe_merge`` (which is one TRAINING step): a trained
    tokenizer is a ranked merge list, and encoding replays the merges
    in rank order with the same greedy left-to-right non-overlap
    semantics. Output: (doc_id, n_words, n_tokens) with real-merge
    token arithmetic instead of the whitespace/regex approximations in
    ``text_token_count``.

    Same structural scale trick as training: merges run on the WORD
    DICTIONARY (distinct words), never the corpus — 100 TB of text
    folds into a vocab-bounded symbol frame after one explode+groupBy,
    and the per-doc answer is a join back on ``word`` (zipf-bounded
    key). Each merge round is the two-window greedy apply of
    ``text_bpe_merge`` plus a row_number renumbering so positions stay
    contiguous (run-parity needs pos-adjacent match sites; after a
    deletion round the old positions have gaps).

    All outputs are exact BIGINT counts — hash-stable by construction.
    """
    docs = load_table(spark, sf_dir, "documents")
    wdoc = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"),
        )
        .where(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wseq = Window.partitionBy("word").orderBy("pos")
    state = (
        wdoc.select("word")
        .distinct()
        .select(
            "word",
            F.explode(F.sequence(F.lit(1), F.length("word"))).alias("pos"),
        )
        .withColumn("sym", F.col("word").substr(F.col("pos"), F.lit(1)))
    )
    for ml, mr in _BPE_MERGES:
        adj = state.withColumn("nxt", F.lead("sym").over(wseq))
        hits = adj.where(
            (F.col("sym") == ml) & (F.col("nxt") == mr)
        ).withColumn("run", F.col("pos") - F.row_number().over(wseq))
        wrun = Window.partitionBy("word", "run")
        starts = (
            hits.withColumn(
                "keep", ((F.col("pos") - F.min("pos").over(wrun)) % 2) == 0
            )
            .where("keep")
            .select("word", F.col("pos").alias("mpos"))
        )
        merged = (
            adj.join(
                starts.select(
                    "word", F.col("mpos").alias("pos"), F.lit(True).alias("m")
                ),
                ["word", "pos"],
                "left",
            )
            .join(
                starts.select(
                    "word",
                    (F.col("mpos") + 1).alias("pos"),
                    F.lit(True).alias("gone"),
                ),
                ["word", "pos"],
                "left",
            )
            .where(F.col("gone").isNull())
            .select(
                "word",
                "pos",
                F.when(F.col("m"), F.concat("sym", "nxt"))
                .otherwise(F.col("sym"))
                .alias("sym"),
            )
        )
        # cut() per round: within a round the adj subtree has three
        # consumers (hits -> starts -> two joins back onto adj), so an
        # uncut 3-round chain duplicates the upstream plan ~3x per
        # level (45 exchanges in the static plan). The cut bounds the
        # lineage at one vocab-sized frame per round.
        state = merged.select(
            "word", F.row_number().over(wseq).alias("pos"), "sym"
        ).transform(cut)
    ntok = state.groupBy("word").agg(F.count(F.lit(1)).alias("ntok"))
    return (
        wdoc.join(ntok, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("ntok")).cast("long").alias("n_tokens"),
        )
    )


def _bpe_encode_round_sql(r: int, ml: str, mr: str) -> str:
    """One unrolled greedy-apply round of the encode oracle: lead,
    run-parity start selection, delete-and-concat, renumber. Input CTE
    ``merged{r-1}`` (word, pos, sym), output ``merged{r}``. MATERIALIZED
    per the repo-wide deep-unroll rule (DuckDB inlines referenced CTEs;
    a 3-round chain would re-read documents.parquet exponentially)."""
    p = r - 1
    return f"""
adj{r} AS MATERIALIZED (
  SELECT word, pos, sym,
         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
  FROM merged{p}
),
starts{r} AS MATERIALIZED (
  SELECT word, pos AS mpos
  FROM (SELECT word, pos, run,
               pos - min(pos) OVER (PARTITION BY word, run) AS off
        FROM (SELECT word, pos,
                     pos - row_number() OVER (PARTITION BY word ORDER BY pos)
                       AS run
              FROM adj{r} WHERE sym = '{ml}' AND nxt = '{mr}'))
  WHERE off % 2 = 0
),
merged{r} AS MATERIALIZED (
  SELECT word,
         row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
         CASE WHEN m THEN sym || nxt ELSE sym END AS sym
  FROM (SELECT a.word, a.pos, a.sym, a.nxt, s.mpos IS NOT NULL AS m
        FROM adj{r} a
        LEFT JOIN starts{r} s ON a.word = s.word AND a.pos = s.mpos
        LEFT JOIN starts{r} g ON a.word = g.word AND a.pos = g.mpos + 1
        WHERE g.mpos IS NULL)
)"""


_BPE_ENCODE_SQL = f"""
WITH wdoc AS MATERIALIZED (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        FROM documents)
  WHERE word <> '' GROUP BY doc_id, word
),
merged0 AS MATERIALIZED (
  SELECT word, CAST(pos AS BIGINT) AS pos,
         substr(word, CAST(pos AS INTEGER), 1) AS sym
  FROM (SELECT word, unnest(range(1, length(word) + 1)) AS pos
        FROM (SELECT DISTINCT word FROM wdoc))
),{",".join(
    _bpe_encode_round_sql(i + 1, ml, mr)
    for i, (ml, mr) in enumerate(_BPE_MERGES)
)},
ntok AS (
  SELECT word, CAST(count(*) AS BIGINT) AS ntok
  FROM merged{len(_BPE_MERGES)} GROUP BY word
)
SELECT d.doc_id,
       CAST(sum(d.cnt) AS BIGINT) AS n_words,
       CAST(sum(d.cnt * t.ntok) AS BIGINT) AS n_tokens
FROM wdoc d JOIN ntok t USING (word)
GROUP BY d.doc_id
"""


_COLLOC_MIN_PAIR = 5   # min bigram support — kills one-off pairings
_COLLOC_TOPK = 50


def text_collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-``_COLLOC_TOPK`` adjacent token pairs by
    LIFT — observed bigram probability over the independence
    expectation, lift(a,b) = P(ab) / (P(a)·P(b)) = (c_ab·n_uni²) /
    (n_big·c_a·c_b). Lift is the exponent-free twin of PMI (PMI =
    log2(lift)): same ranking, but every factor is an exact corpus
    COUNT, so no libm enters the ranking — the phrase-mining /
    tokenizer-merge-candidate pass of a corpus pipeline.

    Determinism: numerator and denominator are integer products
    evaluated in doubles with a fixed association order; they are
    EXACT while c_ab·n_uni² < 2⁵³ (≈9e15 — beyond that both engines
    still agree bit-for-bit because the expression trees match, only
    the exactness claim weakens). One IEEE division, ties broken by
    (ta, tb).

    100 TB shape: two linear explode+groupBy passes (unigrams,
    bigrams); totals are 1-row broadcast attaches; the c_a/c_b joins
    shuffle on the vocabulary key (zipf-bounded); the top-k is
    orderBy+limit (TakeOrderedAndProject — per-partition heaps, no
    single-task global window), with the rank column assigned by a
    window over only the surviving ≤``_COLLOC_TOPK`` rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks_frame(docs)
    uni = toks.select(F.explode("toks").alias("t"))
    cuni = uni.groupBy("t").agg(F.count(F.lit(1)).alias("c_t"))
    n_uni = cuni.agg(F.sum("c_t").cast("long").alias("n_uni"))
    big = toks.select(
        F.explode(
            F.expr(
                "transform(slice(toks, 1, size(toks) - 1), "
                "(x, i) -> concat(x, ' ', toks[i + 1]))"
            )
        ).alias("bg")
    )
    cpair = (
        big.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("ta"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("tb"),
            "c_ab",
        )
    )
    n_big = cpair.agg(F.sum("c_ab").cast("long").alias("n_big"))
    d = lambda c: F.col(c).cast("double")
    lift = (
        (d("c_ab") * d("n_uni")) * d("n_uni")
        / ((d("n_big") * d("c_a")) * d("c_b"))
    )
    scored = (
        cpair.where(F.col("c_ab") >= _COLLOC_MIN_PAIR)
        .join(cuni.select(F.col("t").alias("ta"), F.col("c_t").alias("c_a")), "ta")
        .join(cuni.select(F.col("t").alias("tb"), F.col("c_t").alias("c_b")), "tb")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big))
        .select("ta", "tb", "c_ab", lift.alias("lift"))
    )
    top = scored.orderBy(F.col("lift").desc(), "ta", "tb").limit(_COLLOC_TOPK)
    w = Window.orderBy(F.col("lift").desc(), "ta", "tb")
    return top.withColumn("rnk", F.row_number().over(w).cast("int"))


_COLLOC_SQL = f"""
WITH toks AS MATERIALIZED (
  SELECT string_split(text, ' ') AS toks FROM documents
),
cuni AS MATERIALIZED (
  SELECT t, count(*) AS c_t
  FROM (SELECT unnest(toks) AS t FROM toks) GROUP BY t
),
tot_u AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_uni FROM cuni),
cpair AS (
  SELECT split_part(bg, ' ', 1) AS ta, split_part(bg, ' ', 2) AS tb,
         count(*) AS c_ab
  FROM (
    SELECT unnest(list_transform(
             list_slice(toks, 1, len(toks) - 1),
             (x, i) -> x || ' ' || toks[i + 1])) AS bg
    FROM toks
  ) GROUP BY 1, 2
),
tot_b AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_big FROM cpair)
SELECT ta, tb, c_ab, lift, CAST(rnk AS INTEGER) AS rnk FROM (
  SELECT ta, tb, c_ab,
         (CAST(c_ab AS DOUBLE) * CAST(n_uni AS DOUBLE)) * CAST(n_uni AS DOUBLE)
         / ((CAST(n_big AS DOUBLE) * CAST(c_a AS DOUBLE)) * CAST(c_b AS DOUBLE))
           AS lift,
         row_number() OVER (ORDER BY
           (CAST(c_ab AS DOUBLE) * CAST(n_uni AS DOUBLE)) * CAST(n_uni AS DOUBLE)
           / ((CAST(n_big AS DOUBLE) * CAST(c_a AS DOUBLE)) * CAST(c_b AS DOUBLE))
           DESC, ta, tb) AS rnk
  FROM (
    SELECT p.ta, p.tb, p.c_ab, a.c_t AS c_a, b.c_t AS c_b
    FROM cpair p
    JOIN cuni a ON a.t = p.ta
    JOIN cuni b ON b.t = p.tb
    WHERE p.c_ab >= {_COLLOC_MIN_PAIR}
  ), tot_u, tot_b
) WHERE rnk <= {_COLLOC_TOPK}
"""


def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang", "n_chars", F.size(F.expr(_TOKS)).alias("n_tok")
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg("n_chars", 2).alias("avg_chars"),
            davg("n_tok", 2).alias("avg_tokens"),
        )
    )


_TEXT_LANG_STATS_SQL = f"""
SELECT lang, count(*) AS n_docs,
       {sql_davg('n_chars', 2)} AS avg_chars,
       {sql_davg("len(string_split(text, ' '))", 2)} AS avg_tokens
FROM documents GROUP BY lang
"""


_LEXICON = {
    "fast": 2, "merge": 1, "join": 1, "small": -1, "slow": -2, "error": -3,
}


def text_sentiment_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Σ lexicon weights per doc via explode ⋈ broadcast(lexicon)."""
    docs = load_table(spark, sf_dir, "documents")
    lex = spark.createDataFrame(
        list(_LEXICON.items()), "token string, wt int"
    )
    toks = docs.select("doc_id", F.explode(F.expr(_TOKS)).alias("token"))
    scores = (
        toks.join(F.broadcast(lex), "token")
        .groupBy("doc_id")
        .agg(F.sum("wt").alias("s"))
    )
    return docs.join(scores, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("sentiment"),
    )


_LEX_VALUES = ", ".join(f"('{t}', {w})" for t, w in _LEXICON.items())

_TEXT_SENTIMENT_SQL = f"""
WITH lex(token, wt) AS (VALUES {_LEX_VALUES}),
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
scores AS (
  SELECT doc_id, CAST(sum(wt) AS BIGINT) AS s
  FROM toks JOIN lex USING (token) GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(s.s, 0) AS sentiment
FROM documents d LEFT JOIN scores s ON s.doc_id = d.doc_id
"""

_STOPWORDS = ("the", "a", "of", "and", "in", "to")


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score from length / stopword / vocabulary
    ratios (the classic pretraining-corpus filter features)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.expr(_TOKS)
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    n_distinct = F.size(F.array_distinct(toks))
    stop_ratio = n_stop.cast("double") / n_tok.cast("double")
    distinct_ratio = n_distinct.cast("double") / n_tok.cast("double")
    quality = (
        F.lit(0.5) * F.least(F.lit(1.0), n_tok.cast("double") / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.2) * distinct_ratio
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tok"),
        stop_ratio.alias("stop_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        quality.alias("quality"),
    )


_STOP_SQL_LIST = ", ".join(f"'{s}'" for s in _STOPWORDS)

_TEXT_QUALITY_SQL = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tok,
       CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL_LIST}))) AS DOUBLE)
         / CAST(len(toks) AS DOUBLE) AS stop_ratio,
       CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
         AS distinct_ratio,
       0.5 * least(1.0, CAST(len(toks) AS DOUBLE) / 100.0)
       + 0.3 * (1.0 - CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL_LIST})))
                           AS DOUBLE) / CAST(len(toks) AS DOUBLE))
       + 0.2 * (CAST(len(list_distinct(toks)) AS DOUBLE)
                / CAST(len(toks) AS DOUBLE)) AS quality
FROM base
"""


_READ_SHIFT = 100_000_000  # keeps both div numerators positive (floor==trunc)


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade and Flesch reading-ease per document — the
    classic readability features a corpus-quality filter thresholds on
    (too-low grade = fragment lists, too-high = OCR noise / legalese).
    Syllables are approximated by vowel-group runs (``[aeiouy]+``),
    sentences by terminal-punctuation runs (``[.!?]+``, min 1 — the
    fixture corpus is unpunctuated, so every doc scores as one
    sentence and the grade is driven by the syllable/word ratio).

    Exact-integer discipline: both formulas are evaluated as ONE
    integer division of milli-scaled integer polynomials —
    FK_milli = (390·W² + 11800·Sy·S − 15590·W·S) / (W·S) and
    FRE_milli = (206835·S·W − 1015·W² − 84600·Sy·S) / (S·W) — with a
    +``_READ_SHIFT`` shift so the numerator stays positive (Spark
    ``div`` truncates toward zero, DuckDB ``//`` floors; they agree
    on non-negatives). W, S, Sy ≤ a few thousand per doc keeps every
    product far inside BIGINT. Pure map — one regexp pass per doc, no
    shuffle, trivially linear at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.size(F.expr(_TOKS)).cast("long").alias("n_words"),
        F.greatest(
            F.lit(1).cast("long"),
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")).cast("long"),
        ).alias("n_sents"),
        F.regexp_count(F.lower("text"), F.lit("[aeiouy]+"))
        .cast("long")
        .alias("n_syll"),
    )
    fk_num = (
        390 * F.col("n_words") * F.col("n_words")
        + 11800 * F.col("n_syll") * F.col("n_sents")
        - 15590 * F.col("n_words") * F.col("n_sents")
        + _READ_SHIFT * F.col("n_words") * F.col("n_sents")
    )
    fre_num = (
        206835 * F.col("n_sents") * F.col("n_words")
        - 1015 * F.col("n_words") * F.col("n_words")
        - 84600 * F.col("n_syll") * F.col("n_sents")
        + _READ_SHIFT * F.col("n_words") * F.col("n_sents")
    )
    den = F.col("n_words") * F.col("n_sents")
    return scored.select(
        "doc_id",
        "n_words",
        "n_sents",
        "n_syll",
        fk_num.cast("long").alias("_fkn"),
        fre_num.cast("long").alias("_fren"),
        den.cast("long").alias("_den"),
    ).select(
        "doc_id",
        "n_words",
        "n_sents",
        "n_syll",
        (F.expr("_fkn div _den") - _READ_SHIFT).alias("fk_grade_milli"),
        (F.expr("_fren div _den") - _READ_SHIFT).alias("fre_milli"),
    )


_READABILITY_SQL = f"""
WITH scored AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         greatest(CAST(1 AS BIGINT),
                  CAST(len(regexp_extract_all(text, '[.!?]+'))
                       AS BIGINT)) AS n_sents,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
              AS BIGINT) AS n_syll
  FROM documents
)
SELECT doc_id, n_words, n_sents, n_syll,
       (390 * n_words * n_words + 11800 * n_syll * n_sents
        - 15590 * n_words * n_sents
        + {_READ_SHIFT} * n_words * n_sents)
         // (n_words * n_sents) - {_READ_SHIFT} AS fk_grade_milli,
       (206835 * n_sents * n_words - 1015 * n_words * n_words
        - 84600 * n_syll * n_sents
        + {_READ_SHIFT} * n_words * n_sents)
         // (n_words * n_sents) - {_READ_SHIFT} AS fre_milli
FROM scored
"""


def text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per language — tokens emitted per word
    under the fixed BPE merge table (``text_bpe_encode``): the
    standard tokenizer-fairness metric (a tokenizer trained on English
    fragments under-merged languages into more tokens per word, which
    inflates their training/serving cost and shrinks their effective
    context). One row per lang: word/token totals and fertility in
    milli-units ((1000·Σtokens) div Σwords — one BIGINT division).

    Shape: the encode pass is the heavy part and is already
    vocab-bounded (merges run on the distinct-word dictionary); this
    key adds one broadcast join to the 2-column doc->lang map and a
    |langs|-row aggregate."""
    enc = text_bpe_encode(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        enc.join(F.broadcast(docs), "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_words").cast("long").alias("total_words"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .select(
            "lang",
            "total_words",
            "total_tokens",
            F.expr("(1000 * total_tokens) div total_words").alias(
                "fertility_milli"
            ),
        )
    )


def _bpe_fertility_sql() -> str:
    return f"""
WITH enc AS ({_BPE_ENCODE_SQL})
SELECT d.lang,
       CAST(sum(e.n_words) AS BIGINT) AS total_words,
       CAST(sum(e.n_tokens) AS BIGINT) AS total_tokens,
       (1000 * CAST(sum(e.n_tokens) AS BIGINT))
         // CAST(sum(e.n_words) AS BIGINT) AS fertility_milli
FROM enc e JOIN documents d USING (doc_id)
GROUP BY d.lang
"""


_NORM_Q = 1_000_000  # 1e-6 coordinate quantization (Mahalanobis grid)


def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-hygiene audit over the embedding corpus — the embeddings
    twin of ``data_quality_fk_audit``: one row of corpus-level checks
    an index build gates on (a single NaN or zero vector silently
    poisons IVF centroids and cosine ranks downstream).

    Checks: row count, dimension consistency (min/max length), NaN /
    null-element vectors, zero-norm vectors, and the quantized-norm²
    envelope (min/max of Σ q_d² with q = floor(1e6·x) — exact BIGINTs
    on the Mahalanobis grid, so the envelope is engine- and
    partition-proof). Single map + one global aggregate; trivially
    linear at 100 TB with a 1-row output."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * _NORM_Q).cast("long"),
    )
    per = emb.select(
        F.size("embedding").alias("dim"),
        F.exists(
            "embedding", lambda x: F.isnan(x.cast("double")) | x.isNull()
        ).cast("int").alias("has_bad"),
        F.aggregate(
            q, F.lit(0).cast("long"), lambda acc, v: acc + v * v
        ).alias("norm2_q"),
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("dim").alias("min_dim"),
        F.max("dim").alias("max_dim"),
        F.sum("has_bad").cast("long").alias("n_bad_vecs"),
        F.sum((F.col("norm2_q") == 0).cast("int")).cast("long").alias(
            "n_zero_norm"
        ),
        F.min("norm2_q").alias("min_norm2_q"),
        F.max("norm2_q").alias("max_norm2_q"),
    )


_NORM_AUDIT_SQL = f"""
WITH per AS (
  SELECT len(embedding) AS dim,
         CASE WHEN len(list_filter(embedding,
                x -> isnan(CAST(x AS DOUBLE)) OR x IS NULL)) > 0
              THEN 1 ELSE 0 END AS has_bad,
         list_sum(list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {_NORM_Q}) AS BIGINT)
                * CAST(floor(CAST(x AS DOUBLE) * {_NORM_Q}) AS BIGINT)))
           AS norm2_q
  FROM embeddings
)
SELECT CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(min(dim) AS INTEGER) AS min_dim,
       CAST(max(dim) AS INTEGER) AS max_dim,
       CAST(sum(has_bad) AS BIGINT) AS n_bad_vecs,
       CAST(sum(CASE WHEN norm2_q = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero_norm,
       CAST(min(norm2_q) AS BIGINT) AS min_norm2_q,
       CAST(max(norm2_q) AS BIGINT) AS max_norm2_q
FROM per
"""


_RAKE_Q = 1_000_000  # per-word deg/freq ratio quantization
_RAKE_TOPK = 3


def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs; each word scores
    deg(w)/freq(w) over the doc's candidates (deg = Σ length of
    phrases containing w); a phrase scores the sum of its member-word
    scores; top-``_RAKE_TOPK`` phrases per document. The standard
    unsupervised keyword pass a corpus pipeline runs to build
    document tags / retrieval side-indexes.

    Determinism: word scores are floored to ``_RAKE_Q``-scaled
    BIGINTs ((1e6·deg) div freq — positive, so Spark trunc and DuckDB
    ``//`` agree) before the per-phrase sum; phrase text is
    reassembled position-sorted (array_sort struct / string_agg ORDER
    BY), and the top-k window breaks ties lexicographically.

    Scale shape: one posexplode (linear), the segment id is a running
    stopword count per doc (window partitioned by doc_id — the
    journal's natural partitioning), phrase/word stats are per-doc
    groupBys, and the only join is words->word-scores on (doc, tok),
    an equi-join co-partitioned with everything else on doc_id. No
    corpus-global state at all, so it parallelizes perfectly."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.expr(_TOKS)).alias("pos", "tok")
    ).withColumn(
        "is_stop", F.col("tok").isin(*_STOPWORDS).cast("int")
    )
    wseg = Window.partitionBy("doc_id").orderBy("pos")
    words = (
        toks.withColumn("seg", F.sum("is_stop").over(wseg))
        .where(F.col("is_stop") == 0)
        .select("doc_id", "seg", "pos", "tok")
    )
    phrases = words.groupBy("doc_id", "seg").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    wstats = (
        words.join(phrases.select("doc_id", "seg", "plen"), ["doc_id", "seg"])
        .groupBy("doc_id", "tok")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").alias("wdeg"),
        )
        .select(
            "doc_id",
            "tok",
            F.expr(f"({_RAKE_Q} * wdeg) div freq").alias("wscore_q"),
        )
    )
    pscore = (
        words.join(wstats, ["doc_id", "tok"])
        .groupBy("doc_id", "seg")
        .agg(F.sum("wscore_q").alias("score_q"))
    )
    dedup = (
        phrases.join(pscore, ["doc_id", "seg"])
        .groupBy("doc_id", "phrase")
        .agg(
            F.max("score_q").alias("score_q"),
            F.count(F.lit(1)).alias("n_occ"),
        )
    )
    wtop = Window.partitionBy("doc_id").orderBy(
        F.col("score_q").desc(), "phrase"
    )
    return (
        dedup.withColumn("rnk", F.row_number().over(wtop))
        .where(F.col("rnk") <= _RAKE_TOPK)
        .select("doc_id", "phrase", "n_occ", "score_q", "rnk")
    )


_RAKE_SQL = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS tok
  FROM documents
),
segged AS MATERIALIZED (
  SELECT doc_id, pos, tok,
         sum(CASE WHEN tok IN ({_STOP_SQL_LIST}) THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS seg
  FROM toks
),
words AS MATERIALIZED (
  SELECT doc_id, seg, pos, tok FROM segged
  WHERE tok NOT IN ({_STOP_SQL_LIST})
),
phrases AS MATERIALIZED (
  SELECT doc_id, seg,
         string_agg(tok, ' ' ORDER BY pos) AS phrase,
         CAST(count(*) AS BIGINT) AS plen
  FROM words GROUP BY doc_id, seg
),
wstats AS (
  SELECT w.doc_id, w.tok,
         ({_RAKE_Q} * CAST(sum(p.plen) AS BIGINT))
           // CAST(count(*) AS BIGINT) AS wscore_q
  FROM words w JOIN phrases p USING (doc_id, seg)
  GROUP BY w.doc_id, w.tok
),
pscore AS (
  SELECT w.doc_id, w.seg,
         CAST(sum(s.wscore_q) AS BIGINT) AS score_q
  FROM words w JOIN wstats s ON s.doc_id = w.doc_id AND s.tok = w.tok
  GROUP BY w.doc_id, w.seg
),
dedup AS (
  SELECT p.doc_id, p.phrase,
         max(ps.score_q) AS score_q,
         CAST(count(*) AS BIGINT) AS n_occ
  FROM phrases p JOIN pscore ps USING (doc_id, seg)
  GROUP BY p.doc_id, p.phrase
)
SELECT doc_id, phrase, n_occ, score_q, rnk FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY doc_id ORDER BY score_q DESC, phrase
  ) AS INTEGER) AS rnk
  FROM dedup)
WHERE rnk <= {_RAKE_TOPK}
"""


_DSIR_B = 1024  # hashed-feature buckets
_DSIR_Q = 1_000_000_000  # 1e9 log-ratio quantization (sampling.py idiom)


def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al., NeurIPS 2023): importance
    weights over hashed unigram features for resampling a raw
    multilingual pool toward a TARGET distribution — here lang='en',
    the published use case (select pretraining text matching a target
    domain). Per bucket f: λ_f = ln p_target(f) − ln p_raw(f) with
    add-one smoothing over ``_DSIR_B`` buckets; per doc: weight =
    Σ_f c_f(doc)·λ_f. Docs are ranked and the top quartile flagged
    ``selected`` (resampling's deterministic twin).

    Token -> bucket uses the first 4 md5 hex digits mod ``_DSIR_B``
    (the engine-portable hash family every dedup key here uses). The
    per-bucket log-ratio is floored into a 1e9-scaled BIGINT before
    it ever crosses a row boundary (sampling.quality_unigram_logprob
    discipline), so the per-doc sum is exact integer math — engine-
    and partition-order-proof. |λ_q| ≤ ~20e9, doc token counts ≤ 1e4:
    far inside BIGINT.

    Scale: the feature table is ≤``_DSIR_B`` rows — broadcast; one
    token explode (linear), one hash agg per (doc, bucket), one
    per-doc sum. The quartile flag is one ntile window over docs; on
    100 TB swap it for a fixed threshold learned on a sample (same
    note as the CCNet tercile key)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.expr(_TOKS)).alias("tok"),
    ).withColumn(
        "b",
        (F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long")
         % _DSIR_B).cast("int"),
    )
    counts = toks.groupBy("b").agg(
        F.count(F.lit(1)).alias("raw_f"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("tgt_f"),
    )
    totals = toks.agg(
        F.count(F.lit(1)).alias("raw_n"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("tgt_n"),
    )
    lam = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        F.floor(
            (
                F.log((F.col("tgt_f") + 1).cast("double"))
                - F.log((F.col("tgt_n") + _DSIR_B).cast("double"))
                - F.log((F.col("raw_f") + 1).cast("double"))
                + F.log((F.col("raw_n") + _DSIR_B).cast("double"))
            )
            * _DSIR_Q
        )
        .cast("long")
        .alias("lam_q"),
    )
    perdoc = (
        toks.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("lam_q").alias("dsir_logweight_q"),
            F.count(F.lit(1)).alias("n_toks"),
        )
    )
    w = Window.orderBy(F.col("dsir_logweight_q").desc(), "doc_id")
    return perdoc.select(
        "doc_id",
        "n_toks",
        "dsir_logweight_q",
        (F.ntile(4).over(w) == 1).alias("selected"),
    )


_DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         CAST(CAST('0x' || substr(md5(tok), 1, 4) AS BIGINT) % {_DSIR_B}
              AS INTEGER) AS b
  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents)
),
counts AS (
  SELECT b, count(*) AS raw_f,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt_f
  FROM toks GROUP BY b
),
totals AS (
  SELECT count(*) AS raw_n,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt_n
  FROM toks
),
lam AS (
  SELECT b,
         CAST(floor((ln(CAST(tgt_f + 1 AS DOUBLE))
                     - ln(CAST(tgt_n + {_DSIR_B} AS DOUBLE))
                     - ln(CAST(raw_f + 1 AS DOUBLE))
                     + ln(CAST(raw_n + {_DSIR_B} AS DOUBLE)))
                    * {_DSIR_Q}) AS BIGINT) AS lam_q
  FROM counts, totals
),
perdoc AS (
  SELECT doc_id, CAST(sum(lam_q) AS BIGINT) AS dsir_logweight_q,
         CAST(count(*) AS BIGINT) AS n_toks
  FROM toks JOIN lam USING (b)
  GROUP BY doc_id
)
SELECT doc_id, n_toks, dsir_logweight_q,
       ntile(4) OVER (ORDER BY dsir_logweight_q DESC, doc_id) = 1
         AS selected
FROM perdoc
"""


def text_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: per-lang top-20 token profile (from the
    labeled corpus), classify each doc by profile-overlap count, ties to
    the lexicographically smallest lang. Integer scoring -> exact oracle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", F.explode(F.expr(_TOKS)).alias("token"))
    lang_counts = toks.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("cnt"))
    wp = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "token")
    profile = (
        lang_counts.withColumn("rnk", F.row_number().over(wp))
        .where(F.col("rnk") <= 20)
        .select(F.col("lang").alias("profile_lang"), "token")
    )
    doc_toks = toks.select("doc_id", "token").distinct()
    overlap = (
        doc_toks.join(F.broadcast(profile), "token")
        .groupBy("doc_id", "profile_lang")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    wd = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "profile_lang")
    best = (
        overlap.withColumn("r", F.row_number().over(wd))
        .where(F.col("r") == 1)
        .select("doc_id", F.col("profile_lang").alias("pred_lang"), "score")
    )
    return docs.join(best, "doc_id", "left").select(
        "doc_id",
        "lang",
        F.coalesce("pred_lang", F.lit("??")).alias("pred_lang"),
        F.coalesce("score", F.lit(0)).cast("long").alias("score"),
    )


_TEXT_LANGID_SQL = """
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents
),
lang_counts AS (SELECT lang, token, count(*) AS cnt FROM toks GROUP BY 1, 2),
profile AS (
  SELECT lang AS profile_lang, token FROM (
    SELECT lang, token,
           row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rnk
    FROM lang_counts
  ) WHERE rnk <= 20
),
doc_toks AS (SELECT DISTINCT doc_id, token FROM toks),
overlap AS (
  SELECT doc_id, profile_lang, count(*) AS score
  FROM doc_toks JOIN profile USING (token) GROUP BY 1, 2
),
best AS (
  SELECT doc_id, profile_lang AS pred_lang, score FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, profile_lang) AS r
    FROM overlap
  ) WHERE r = 1
)
SELECT d.doc_id, d.lang, COALESCE(b.pred_lang, '??') AS pred_lang,
       COALESCE(b.score, 0) AS score
FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id
"""


def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + accuracy of the n-gram language classifier
    against the corpus's gold ``lang`` labels — the measure-your-
    classifier companion to ``text_langid_ngram``, exactly like
    ``simsearch_recall`` measures the ANN paths: a curation pipeline
    ships the METRIC next to the heuristic. One extra aggregate over
    the classifier output (|langs|² cells); recall_share divides exact
    counts, so the matrix is hash-stable."""
    pred = text_langid_ngram(spark, sf_dir)
    conf = pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_lang = Window.partitionBy("lang")
    acc = pred.agg(
        (
            F.sum((F.col("lang") == F.col("pred_lang")).cast("long")).cast(
                "double"
            )
            / F.count(F.lit(1)).cast("double")
        ).alias("accuracy")
    )
    return (
        conf.withColumn("n_lang", F.sum("n").over(w_lang))
        .crossJoin(F.broadcast(acc))
        .select(
            "lang",
            "pred_lang",
            "n",
            (F.col("n").cast("double") / F.col("n_lang").cast("double")).alias(
                "recall_share"
            ),
            "accuracy",
        )
    )


_LANGID_CONFUSION_SQL = f"""
WITH pred AS (SELECT * FROM ({_TEXT_LANGID_SQL}) t),
conf AS (
  SELECT lang, pred_lang, count(*) AS n FROM pred GROUP BY lang, pred_lang
)
SELECT lang, pred_lang, n,
       CAST(n AS DOUBLE)
         / CAST(SUM(n) OVER (PARTITION BY lang) AS DOUBLE) AS recall_share,
       (SELECT CAST(SUM(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(count(*) AS DOUBLE)
        FROM pred) AS accuracy
FROM conf
"""


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace split + a BPE-ish regex tokenizer."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.expr(_TOKS)).alias("n_ws"),
        F.size(F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).alias(
            "n_re"
        ),
        "n_chars",
    )


_TEXT_TOKEN_COUNT_SQL = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INTEGER) AS n_re,
       n_chars
FROM documents
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial fingerprint over tokens, exact int64 math
    mod 2^31-1 (token value = first 8 hex digits of md5 — engine-neutral)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.aggregate(
        F.expr(_TOKS),
        F.lit(0).cast("long"),
        lambda acc, x: (
            acc * 131 + F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long")
        ) % F.lit(2147483647).cast("long"),
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


_TEXT_FINGERPRINT_SQL = """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ' '),
             x -> CAST('0x' || substr(md5(x), 1, 8) AS BIGINT))),
         (acc, x) -> (acc * 131 + x) % 2147483647) AS fingerprint
FROM documents
"""


_PACK_BUDGET = 512


def _pack_shard_count(spark: SparkSession, docs: DataFrame) -> int:
    """Shard count for the distributed prefix sum, derived from the
    INPUT instead of a constant: the physical scan's partition count
    (one task per ~``spark.sql.files.maxPartitionBytes`` of parquet, so
    it grows linearly with corpus bytes), floored by the cluster's
    default parallelism. The round-3 audit flagged the previous
    ``_PACK_SHARDS = 32``: at 100 TB it would funnel ~3 TB through each
    of 32 ordered running-window tasks. Pack assignment is
    shard-count-invariant (offsets compose), so this is purely a
    parallelism knob — tests pin equality at 8/32/128."""
    return max(
        spark.sparkContext.defaultParallelism, docs.rdd.getNumPartitions()
    )


_LPT_SHARDS = 8


def pack_lpt_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced shard assignment by SNAKE DRAFT over the length-sorted
    corpus — the longest-processing-time flavor of shard packing: rank
    docs by token count descending, deal rank blocks of ``_LPT_SHARDS``
    alternately left-to-right and right-to-left (so the shard that got
    this block's biggest doc gets the next block's smallest), and
    report per-shard load. The static-scheduling step before a
    fixed-worker training or tokenization run; per-shard doc counts
    are equal to ±1 by construction and token loads are near-balanced
    without any sequential bin state.

    The global rank is NOT a single-task window: same two-pass
    distributed pattern as ``pack_sequences`` — range-partition by
    (n_tok DESC, doc_id), per-partition COUNT subtotals (an O(shards)
    driver collect), offsets broadcast back, local row_number per
    partition. Oracle uses the plain global window (DuckDB scale is
    not under test).
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    sized = (
        docs.select("doc_id", n_tok.alias("n_tok"))
        .repartitionByRange(16, F.col("n_tok").desc(), F.col("doc_id"))
        .withColumn("pid", F.spark_partition_id())
        .transform(cut)
    )
    counts = {
        r["pid"]: r["c"]
        for r in sized.groupBy("pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    running, offsets = 0, {}
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]
    off_df = spark.createDataFrame(list(offsets.items()), "pid int, off bigint")
    w = Window.partitionBy("pid").orderBy(F.col("n_tok").desc(), "doc_id")
    ranked = (
        sized.join(F.broadcast(off_df), "pid")
        .withColumn("r0", F.col("off") + F.row_number().over(w) - 1)
    )
    k = _LPT_SHARDS
    pos = F.col("r0") % k
    # `div` keeps the block index in exact integer arithmetic (the
    # `/` operator is double division on longs)
    shard = F.when(F.expr(f"r0 div {k}") % 2 == 0, pos).otherwise(k - 1 - pos)
    return (
        ranked.withColumn("shard", shard.cast("int"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("tok_sum"),
            F.max("n_tok").alias("max_tok"),
        )
    )


_PACK_LPT_SQL = f"""
WITH sized AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
ranked AS (
  SELECT doc_id, n_tok,
         row_number() OVER (ORDER BY n_tok DESC, doc_id) - 1 AS r0
  FROM sized
),
asg AS (
  SELECT doc_id, n_tok,
         CAST(CASE WHEN (r0 // {_LPT_SHARDS}) % 2 = 0
                   THEN r0 % {_LPT_SHARDS}
                   ELSE {_LPT_SHARDS} - 1 - (r0 % {_LPT_SHARDS}) END
              AS INTEGER) AS shard
  FROM ranked
)
SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tok_sum,
       max(n_tok) AS max_tok
FROM asg GROUP BY shard
"""


def pack_sequences(
    spark: SparkSession, sf_dir: str, n_shards: int | None = None
) -> DataFrame:
    """Assign docs to fixed token-budget packs (offset binning over the
    doc_id-ordered running token total) — the batch-construction step
    before training. Integer-exact, so pack assignment is deterministic
    at any parallelism; per-pack totals may exceed the budget by at most
    one doc (standard binned packing).

    The global running sum is a two-pass DISTRIBUTED prefix sum — a
    single un-partitioned window would serialize the whole corpus
    through one task at 100 TB:

    1. range-partition by doc_id into ``n_shards`` (input-scaled, see
       :func:`_pack_shard_count`), take per-partition token subtotals
       (tiny: one row per shard, collected driver-side — the collect is
       O(shards), never O(rows)),
    2. cumulative offsets per shard go back via a broadcast equi-join
       on the shard id (a map literal would embed O(shards) constants
       in the plan); each shard computes its local running sum + offset
       in parallel.
    """
    docs = load_table(spark, sf_dir, "documents")
    if n_shards is None:
        n_shards = _pack_shard_count(spark, docs)
    n_tok = F.size(F.split(F.col("text"), " "))
    sized = (
        docs.select("doc_id", n_tok.cast("long").alias("n_tok"))
        # range partitioning => shard i holds strictly smaller doc_ids
        # than shard i+1, so per-shard offsets compose a global order
        .repartitionByRange(n_shards, "doc_id")
        .withColumn("pid", F.spark_partition_id())
        # freeze the shard assignment so pass 1 and pass 2 see the
        # exact same partitioning (range boundaries are sampled)
        .transform(cut)
    )
    subtot = {
        r["pid"]: r["tot"]
        for r in sized.groupBy("pid").agg(F.sum("n_tok").alias("tot")).collect()
    }
    running, offsets = 0, {}
    for pid in sorted(subtot):
        offsets[pid] = running
        running += subtot[pid]
    if offsets:
        off_df = spark.createDataFrame(
            list(offsets.items()), "pid int, off bigint"
        )
        sized = sized.join(F.broadcast(off_df), "pid")
    else:
        sized = sized.withColumn("off", F.lit(0).cast("long"))
    w = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = sized.withColumn(
        "pack_id",
        F.floor(
            (F.col("off") + F.sum("n_tok").over(w) - F.col("n_tok"))
            / _PACK_BUDGET
        ),
    )
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


_PACK_SQL = f"""
SELECT pack_id, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM (
  SELECT doc_id, n_tok,
         CAST(floor((SUM(n_tok) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tok) / {_PACK_BUDGET}) AS BIGINT) AS pack_id
  FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents)
)
GROUP BY pack_id
"""


_CHUNK_LEN = 64
_CHUNK_STRIDE = 32


def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: 64-token chunks, stride 32 — the
    standard pretraining/RAG preprocessing step. All JVM expressions
    (sequence -> explode -> slice), one row per chunk."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(F.lit(0), F.size(toks) - 1, F.lit(_CHUNK_STRIDE))
    chunks = docs.select(
        "doc_id", toks.alias("toks"), F.explode(starts).alias("start")
    )
    piece = F.slice(F.col("toks"), F.col("start") + 1, _CHUNK_LEN)
    return chunks.select(
        "doc_id",
        "start",
        F.concat_ws(" ", piece).alias("chunk"),
        F.size(piece).alias("n_chunk_tokens"),
    )


_TEXT_CHUNK_SQL = f"""
SELECT doc_id, CAST(start AS INTEGER) AS start,
       array_to_string(list_slice(toks, start + 1, start + {_CHUNK_LEN}), ' ')
         AS chunk,
       CAST(len(list_slice(toks, start + 1, start + {_CHUNK_LEN})) AS INTEGER)
         AS n_chunk_tokens
FROM (
  SELECT doc_id, toks, unnest(range(0, len(toks), {_CHUNK_STRIDE})) AS start
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
)
"""


_CDC_W = 4  # rolling window width (tokens) for the boundary test
_CDC_M = 8  # boundary probability 1/M -> expected chunk ~M tokens


def text_chunk_cdc_frame(docs: DataFrame) -> DataFrame:
    """Content-defined chunking over a ``(doc_id, text)`` frame: a
    chunk boundary falls AFTER token i whenever the hash of the
    ``_CDC_W``-token window ending at i lands in bucket 0 of
    ``_CDC_M`` (md5-prefix bucket — the engine-portable stand-in for
    a Rabin/Gear rolling hash). Because the boundary decision depends
    only on a LOCAL window, inserting or deleting text re-chunks only
    the neighborhood of the edit — exactly why dedup pipelines prefer
    CDC over fixed-stride chunks (text_chunk_sliding), where one
    leading insertion shifts every downstream chunk and kills all
    hash matches. Production variants add min/max chunk bounds; this
    keeps the pure hash rule so the semantics stay one expression.

    All higher-order JVM array expressions (transform/filter over a
    token sequence) — map-only, zero shuffle, linear in tokens. The
    chunk content is emitted as its md5 (+ start/length), the form a
    dedup join consumes."""
    expr = f"""
    CASE WHEN size(toks) >= {_CDC_W} THEN
      filter(transform(sequence({_CDC_W}, size(toks)),
        i -> IF(conv(substring(md5(concat_ws(' ',
               slice(toks, i - {_CDC_W - 1}, {_CDC_W}))), 1, 8), 16, 10)
             % {_CDC_M} = 0, i, -1)),
        x -> x != -1)
    ELSE array() END
    """
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).select("doc_id", "toks", F.expr(expr).alias("bnds"))
    bnds2 = F.expr(
        "IF(size(bnds) > 0 AND element_at(bnds, -1) = size(toks), "
        "bnds, concat(bnds, array(size(toks))))"
    )
    chunks = toks.select(
        "doc_id", "toks", bnds2.alias("b"),
        F.posexplode(bnds2).alias("pos", "end"),
    )
    start = F.expr("IF(pos = 0, 1, element_at(b, pos) + 1)")
    piece = F.expr("slice(toks, start, `end` - start + 1)")
    return (
        chunks.withColumn("start", start)
        .select(
            "doc_id",
            (F.col("pos") + 1).alias("chunk_idx"),
            "start",
            F.expr("`end` - start + 1").alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", piece)).alias("chunk_md5"),
        )
    )


def text_chunk_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered CDC-chunking key over the fixture documents — see
    :func:`text_chunk_cdc_frame` for semantics and the
    insert-robustness test (tests/test_round6c.py)."""
    return text_chunk_cdc_frame(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )


_TEXT_CDC_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
b AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) >= {_CDC_W} THEN
           list_filter(list_transform(generate_series({_CDC_W}, len(toks)),
             i -> CASE WHEN CAST('0x' || substr(md5(array_to_string(
                    list_slice(toks, i - {_CDC_W - 1}, i), ' ')), 1, 8)
                    AS BIGINT) % {_CDC_M} = 0 THEN i ELSE -1 END),
             x -> x != -1)
         ELSE [] END AS bnds
  FROM t
),
b2 AS (
  SELECT doc_id, toks,
         CASE WHEN len(bnds) > 0 AND bnds[-1] = len(toks) THEN bnds
              ELSE list_append(bnds, len(toks)) END AS bnds
  FROM b
),
c AS (
  SELECT doc_id, toks, bnds,
         unnest(generate_series(1, len(bnds))) AS j
  FROM b2
)
SELECT doc_id, CAST(j AS INTEGER) AS chunk_idx,
       CAST(CASE WHEN j = 1 THEN 1 ELSE bnds[j - 1] + 1 END AS INTEGER)
         AS start,
       CAST(bnds[j] - (CASE WHEN j = 1 THEN 1 ELSE bnds[j - 1] + 1 END) + 1
         AS INTEGER) AS n_chunk_tokens,
       md5(array_to_string(list_slice(toks,
             CASE WHEN j = 1 THEN 1 ELSE bnds[j - 1] + 1 END,
             bnds[j]), ' ')) AS chunk_md5
FROM c
"""


def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by content-independent hash
    buckets (md5 of doc_id -> 10 buckets -> 8/1/1).

    The pattern every training-data pipeline needs: membership is a pure
    function of the id — stable across runs, partitionings, engines, and
    data appends (unlike ``df.sample``, which depends on row order).
    Output: per (lang, split) doc counts + exact bucket bounds check.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10
    )
    split = (
        F.when(bucket <= 7, "train").when(bucket == 8, "val").otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_SPLIT_SQL = """
SELECT lang, split, count(*) AS n_docs FROM (
  SELECT lang,
         CASE WHEN b <= 7 THEN 'train' WHEN b = 8 THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT lang,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
             % 10 AS b
    FROM documents
  )
)
GROUP BY lang, split
"""


# ------------------------------------------------------------- multimodal


def multimodal_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join documents with their embedding into a typed nested struct
    column (text + vector modality in one row). rows-only (nested)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id",
        "text",
        F.struct(
            F.col("lang"),
            F.size(F.expr(_TOKS)).alias("n_tokens"),
            F.col("label"),
            F.col("embedding"),
        ).alias("meta"),
    )


def multimodal_enrich_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered (driver-checked) variant of :func:`multimodal_enrich`.

    The API version returns a typed ``struct<lang, n_tokens, label,
    embedding array<float>>`` column; the driver's canonicalizer runs a
    pandas sort over the result and nested struct/array cells are
    unhashable there (the r01-r03 red rows). This variant flattens the
    struct to scalars and serializes the float vector through the
    memory-proven integer recipe — ``floor(x * 1e6)`` after an exact
    float32→double cast is bit-identical on Spark and DuckDB — so the
    key gets a full SQL value-hash check instead of a crash. Nothing is
    lost: the typed version stays the API/test surface."""
    typed = multimodal_enrich(spark, sf_dir)
    emb_q = F.concat_ws(
        ",",
        F.transform(
            F.col("meta.embedding"),
            lambda x: F.floor(x.cast("double") * F.lit(1000000.0))
            .cast("long")
            .cast("string"),
        ),
    )
    return typed.select(
        "doc_id",
        "text",
        F.col("meta.lang").alias("lang"),
        F.col("meta.n_tokens").alias("n_tokens"),
        F.col("meta.label").alias("label"),
        emb_q.alias("emb_q"),
    )


_MULTIMODAL_ENRICH_SQL = """
SELECT d.doc_id, d.text, d.lang,
       CAST(len(string_split(d.text, ' ')) AS INTEGER) AS n_tokens,
       e.label,
       array_to_string(
         list_transform(e.embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)),
         ',') AS emb_q
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
"""


_MM_MAGIC = b"IM01"


def multimodal_encode_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, payload: binary) — a deterministic container format
    packed JVM-side with binary concat: 4-byte magic ``IM01``, 2-byte
    big-endian width, 2-byte big-endian height, then the body bytes
    (the document text's UTF-8). Width/height derive from doc_id, so
    the decode below can be verified field-by-field by an oracle that
    never touches the bytes. This is the fixture generator for the
    binary-column story — the fixtures themselves carry no image
    bytes, so the repo synthesizes a real container instead of faking
    metadata from lengths (the round-1..5 stub this replaced)."""
    width = (F.lit(64) + F.pmod(F.col("doc_id") * 7, F.lit(448))).cast("int")
    height = (F.lit(64) + F.pmod(F.col("doc_id") * 13, F.lit(448))).cast("int")
    be16 = lambda c: F.unhex(F.lpad(F.hex(c), 4, "0"))  # noqa: E731
    return docs.select(
        "doc_id",
        F.concat(
            F.lit(_MM_MAGIC),
            be16(width),
            be16(height),
            F.col("text").cast("binary"),
        ).alias("payload"),
    )


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary decode, realized: synthesize the ``IM01``
    container (:func:`multimodal_encode_frame`), then DECODE it with
    genuine byte-level parsing in an Arrow-batched ``mapInPandas`` —
    magic check, big-endian header field extraction, body slice, and
    an md5 content checksum, exactly the shape a PIL/libav decoder
    plugs into (swap the parse body for ``Image.open(BytesIO(b))``).

    Oracle strategy: every decoded field is INDEPENDENTLY recomputable
    without the container — width/height from the doc_id formula, body
    length/checksum from the source text — so the SQL twin verifies
    the decoder actually inverted the encoder byte-for-byte (a wrong
    offset or endianness flips the hash). 100 TB shape: map-only over
    the binary column, zero shuffle; Arrow moves the bytes to Python
    once per batch, and the output is narrow typed metadata."""
    import hashlib

    docs = load_table(spark, sf_dir, "documents")
    payload = multimodal_encode_frame(docs)

    def decode_batches(batches):
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(buf)
                assert b[:4] == _MM_MAGIC, "bad container magic"
                width = int.from_bytes(b[4:6], "big")
                height = int.from_bytes(b[6:8], "big")
                body = b[8:]
                rows.append(
                    (
                        int(doc_id),
                        width,
                        height,
                        len(body),
                        hashlib.md5(body).hexdigest(),
                    )
                )
            import pandas as pd

            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_body_bytes", "checksum"
                ],
            )

    return payload.mapInPandas(
        decode_batches,
        schema=(
            "doc_id long, width int, height int, "
            "n_body_bytes long, checksum string"
        ),
    )


_VD_MAGIC = b"VD01"
_VD_MAX_FRAMES = 32
_VD_CUT_THRESH = 96  # |luma delta| above this = scene cut


def multimodal_video_scenecut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene-cut detection over a binary frame-track column:
    each document synthesizes a deterministic ``VD01`` container
    (magic, 2-byte big-endian frame count, one luma byte per frame —
    frame k's luma is the first md5 byte of ``tok_k|doc_id``, packed
    JVM-side), then an Arrow-batched ``mapInPandas`` decodes the
    track and segments scenes where |Δluma| > ``_VD_CUT_THRESH`` —
    the frame-differencing pass every video-curation pipeline runs
    before sampling clips (swap the luma track for decoded Y-plane
    means and the code is unchanged).

    Oracle strategy (same as ``multimodal_decode``): every output is
    independently recomputable WITHOUT the container — the oracle
    rebuilds the luma sequence from the md5 formula and replays the
    lag/threshold logic in SQL, so a wrong header offset, frame
    order, or byte slice in the Python decoder flips the hash.

    100 TB shape: token explode is linear and capped at
    ``_VD_MAX_FRAMES`` frames/doc; the pack is one per-doc groupBy;
    the decode is map-only over the binary column (bytes cross to
    Python once per Arrow batch); output is narrow typed metadata."""
    docs = load_table(spark, sf_dir, "documents")
    be16 = lambda c: F.unhex(F.lpad(F.hex(c), 4, "0"))  # noqa: E731
    frames = (
        docs.select(
            "doc_id", F.posexplode(F.expr(_TOKS)).alias("pos", "tok")
        )
        .where(F.col("pos") < _VD_MAX_FRAMES)
        .select(
            "doc_id",
            "pos",
            F.substring(
                F.md5(F.concat_ws("|", "tok", "doc_id")), 1, 2
            ).alias("hexb"),
        )
    )
    packed = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_frames"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "hexb"))),
                lambda x: x["hexb"],
            ),
            "",
        ).alias("track_hex"),
    )
    payload = packed.select(
        "doc_id",
        F.concat(
            F.lit(_VD_MAGIC), be16(F.col("n_frames")), F.unhex("track_hex")
        ).alias("payload"),
    )

    def cut_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(buf)
                assert b[:4] == _VD_MAGIC, "bad container magic"
                n = int.from_bytes(b[4:6], "big")
                track = b[6 : 6 + n]
                assert len(track) == n, "truncated frame track"
                cuts, first_cut, sum_abs = 0, -1, 0
                for k in range(1, n):
                    d = abs(track[k] - track[k - 1])
                    sum_abs += d
                    if d > _VD_CUT_THRESH:
                        cuts += 1
                        if first_cut < 0:
                            first_cut = k
                rows.append((int(doc_id), n, cuts, first_cut, sum_abs))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "n_cuts",
                    "first_cut_frame", "sum_absdiff",
                ],
            )

    return payload.mapInPandas(
        cut_batches,
        schema=(
            "doc_id long, n_frames int, n_cuts int, "
            "first_cut_frame int, sum_absdiff long"
        ),
    )


_VIDEO_CUT_SQL = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
         unnest(string_split(text, ' ')) AS tok
  FROM documents
),
luma AS MATERIALIZED (
  SELECT doc_id, pos,
         CAST('0x' || substr(md5(tok || '|' || CAST(doc_id AS VARCHAR)),
                             1, 2) AS INTEGER) AS y
  FROM toks WHERE pos < {_VD_MAX_FRAMES}
),
diffs AS (
  SELECT doc_id, pos,
         abs(y - lag(y) OVER (PARTITION BY doc_id ORDER BY pos)) AS d
  FROM luma
)
SELECT doc_id,
       CAST(count(*) AS INTEGER) AS n_frames,
       CAST(count(*) FILTER (WHERE d > {_VD_CUT_THRESH}) AS INTEGER)
         AS n_cuts,
       CAST(COALESCE(min(pos) FILTER (WHERE d > {_VD_CUT_THRESH}), -1)
            AS INTEGER) AS first_cut_frame,
       CAST(COALESCE(sum(d), 0) AS BIGINT) AS sum_absdiff
FROM diffs
GROUP BY doc_id
"""


_AU_MAGIC = b"AU01"
_AU_SAMPLES = 2048   # 8-bit PCM samples per clip
_AU_FRAME = 256      # samples per analysis frame -> 8 frames/clip
_AU_DOC_MOD = 5      # audio exists on doc_id % 5 == 0 (bounded subset)


def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio frame-energy extraction over a BINARY column — the audio
    twin of :func:`multimodal_decode`: synthesize an ``AU01`` PCM
    container JVM-side (4-byte magic, 4-byte big-endian sample count,
    then ``_AU_SAMPLES`` unsigned 8-bit samples — the sample law
    s(i) = ((doc_id·31 + i·7) mod 256) − 128 is deterministic and
    CLOSED-FORM), then decode it with genuine byte-level parsing in an
    Arrow-batched ``mapInPandas`` — magic check, header field, numpy
    ``frombuffer``, per-frame sum-of-squares energy and peak — exactly
    the shape a soundfile/libav decoder plugs into (swap the synth
    for ``sf.read(BytesIO(b))`` and the frame loop survives as-is).

    Oracle strategy (the multimodal house rule): every output is
    recomputable WITHOUT the container from the sample law via
    ``generate_series`` — a wrong header offset, endianness, or frame
    boundary in the decoder flips the hash. Energies are exact
    BIGINTs (≤ 128²·256 per frame), peaks exact INTs — no float
    leaves Python.

    100 TB shape: map-only over the binary column (zero shuffle; the
    ``doc_id % {mod}`` subset prunes at the scan), Arrow moves each
    batch to Python once, output is narrow typed metadata — the same
    contract as every decoder here."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % _AU_DOC_MOD == 0
    )
    be32 = lambda c: F.unhex(F.lpad(F.hex(c), 8, "0"))  # noqa: E731
    body = F.expr(
        f"unhex(concat_ws('', transform(sequence(0, {_AU_SAMPLES - 1}),"
        f" i -> lpad(hex(pmod(doc_id * 31 + i * 7, 256)), 2, '0'))))"
    )
    payload = docs.select(
        "doc_id",
        F.concat(
            F.lit(_AU_MAGIC), be32(F.lit(_AU_SAMPLES)), body
        ).alias("payload"),
    )

    def energy_batches(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(buf)
                assert b[:4] == _AU_MAGIC, "bad audio magic"
                n = int.from_bytes(b[4:8], "big")
                pcm = (
                    np.frombuffer(b[8:], dtype=np.uint8).astype(np.int64)
                    - 128
                )
                assert len(pcm) == n, "truncated PCM body"
                frames = pcm.reshape(-1, _AU_FRAME)
                energy = (frames * frames).sum(axis=1)
                peak = np.abs(frames).max(axis=1)
                for fno in range(frames.shape[0]):
                    rows.append(
                        (
                            int(doc_id),
                            fno,
                            _AU_FRAME,
                            int(energy[fno]),
                            int(peak[fno]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_no", "n_samples", "energy", "peak"
                ],
            )

    return payload.mapInPandas(
        energy_batches,
        schema=(
            "doc_id long, frame_no int, n_samples int, "
            "energy long, peak int"
        ),
    )


multimodal_audio_energy.__doc__ = multimodal_audio_energy.__doc__.format(
    mod=_AU_DOC_MOD
)

_AUDIO_ENERGY_SQL = f"""
WITH samples AS (
  SELECT d.doc_id, i,
         (d.doc_id * 31 + i * 7) % 256 - 128 AS s
  FROM documents d, generate_series(0, {_AU_SAMPLES - 1}) AS g(i)
  WHERE d.doc_id % {_AU_DOC_MOD} = 0
)
SELECT doc_id,
       CAST(i // {_AU_FRAME} AS INTEGER) AS frame_no,
       {_AU_FRAME} AS n_samples,
       CAST(sum(s * s) AS BIGINT) AS energy,
       CAST(max(abs(s)) AS INTEGER) AS peak
FROM samples
GROUP BY doc_id, i // {_AU_FRAME}
"""


_PHASH_BANDS = 4        # 4 x 16-bit bands over the 64-bit fingerprint
_PHASH_MAX_HAMMING = 6  # near-dup verify threshold


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup detection over the BINARY column — the
    multimodal twin of ``dedup_simhash``: decode the ``IM01`` container
    (Arrow-batched ``mapInPandas``, numpy-vectorized byte histogram),
    compute a 64-cell aHash (bit j = cell-mean > whole-body mean, done
    as the INTEGER cross-multiply cs[j]·total_cnt > total_sum·cc[j] —
    no float mean enters the fingerprint), band the 64-bit hash into
    4×16-bit bands for candidate pairs, verify by Hamming ≤
    ``_PHASH_MAX_HAMMING``, and report per-doc near-dup degree. Swap
    the byte histogram for a downsampled luma grid and this IS image
    aHash dedup; banding + verify stay identical.

    Oracle strategy (same as multimodal_decode): the body is the
    text's UTF-8 and the fixture text is pure ASCII, so the SQL twin
    recomputes every byte as ``ascii(substr(text, p, 1))`` without
    touching the container — a wrong slice offset or cell boundary in
    the decoder flips the hash. A real deployment hashes decoded
    pixels, where no such text twin exists (the pinned synthetic test
    plants byte-level near-identical payloads instead).

    100 TB shape: decode+histogram is map-only (one Arrow pass, zero
    shuffle); candidates are band equi-join buckets, never all-pairs;
    the cross-multiply is exact while body_bytes·body_sum < 2⁶³
    (≈ 2 GiB bodies) — beyond that, scale the comparison to means in
    DECIMAL(38,0) like the PCA kernel does.
    """
    import numpy as np

    docs = load_table(spark, sf_dir, "documents")
    payload = multimodal_encode_frame(docs)

    def hash_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(buf)
                assert b[:4] == _MM_MAGIC, "bad container magic"
                body = np.frombuffer(b[8:], dtype=np.uint8)
                n = len(body)
                if n:
                    cell = (np.arange(n, dtype=np.int64) * 64) // n
                    cc = np.bincount(cell, minlength=64)
                    cs = np.bincount(
                        cell, weights=body.astype(np.float64), minlength=64
                    ).astype(np.int64)
                else:
                    cc = np.zeros(64, dtype=np.int64)
                    cs = cc
                rows.append((int(doc_id), cs.tolist(), cc.tolist()))
            yield pd.DataFrame(
                rows, columns=["doc_id", "cell_sums", "cell_cnts"]
            )

    cells = payload.mapInPandas(
        hash_batches,
        schema="doc_id long, cell_sums array<long>, cell_cnts array<long>",
    )
    acc = lambda c: F.aggregate(  # noqa: E731
        F.col(c), F.lit(0).cast("long"), lambda a, x: a + x
    )
    hashed = cut(
        cells.withColumn("tot", acc("cell_cnts"))
        .withColumn("ts", acc("cell_sums"))
        .withColumn(
            "phash",
            F.expr(
                "array_join(transform(sequence(0, 63), j -> "
                "IF(element_at(cell_sums, j + 1) * tot "
                "> ts * element_at(cell_cnts, j + 1), '1', '0')), '')"
            ),
        )
        .select("doc_id", "phash")
    )
    banded = hashed.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.substring("phash", k * 16 + 1, 16)
                    for k in range(_PHASH_BANDS)
                ]
            )
        ).alias("band", "key"),
    )
    cand = (
        banded.select(F.col("doc_id").alias("a"), "band", "key")
        .join(banded.select(F.col("doc_id").alias("b"), "band", "key"), ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    ham = F.expr(
        "aggregate(transform(sequence(1, 64), i -> "
        "IF(substring(ah, i, 1) = substring(bh, i, 1), 0, 1)), "
        "0, (s, x) -> s + x)"
    )
    pairs = (
        cand.join(
            hashed.select(F.col("doc_id").alias("a"), F.col("phash").alias("ah")),
            "a",
        )
        .join(
            hashed.select(F.col("doc_id").alias("b"), F.col("phash").alias("bh")),
            "b",
        )
        .withColumn("ham", ham)
        .where(F.col("ham") <= _PHASH_MAX_HAMMING)
        .select("a", "b")
    )
    partners = (
        pairs.select(F.col("a").alias("doc_id"))
        .unionAll(pairs.select(F.col("b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_near"))
    )
    return hashed.join(partners, "doc_id", "left").select(
        "doc_id",
        "phash",
        F.coalesce("n_near", F.lit(0)).cast("long").alias("n_near"),
    )


_PHASH_SQL = f"""
WITH chars AS MATERIALIZED (
  SELECT doc_id,
         ((p - 1) * 64) // len AS cell,
         ascii(substr(text, CAST(p AS INTEGER), 1)) AS v
  FROM (
    SELECT doc_id, text, length(text) AS len,
           unnest(range(1, length(text) + 1)) AS p
    FROM documents
  )
),
cells AS MATERIALIZED (
  SELECT doc_id, cell, CAST(sum(v) AS BIGINT) AS cs,
         CAST(count(*) AS BIGINT) AS cc
  FROM chars GROUP BY doc_id, cell
),
tots AS MATERIALIZED (
  SELECT doc_id, CAST(sum(cs) AS BIGINT) AS ts,
         CAST(sum(cc) AS BIGINT) AS tot
  FROM cells GROUP BY doc_id
),
grid AS MATERIALIZED (
  SELECT d.doc_id, g.j,
         COALESCE(c.cs, 0) AS cs, COALESCE(c.cc, 0) AS cc,
         COALESCE(t.ts, 0) AS ts, COALESCE(t.tot, 0) AS tot
  FROM (SELECT doc_id FROM documents) d
  CROSS JOIN (SELECT unnest(range(0, 64)) AS j) g
  LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.cell = g.j
  LEFT JOIN tots t ON t.doc_id = d.doc_id
),
hashed AS MATERIALIZED (
  SELECT doc_id,
         string_agg(CASE WHEN cs * tot > ts * cc THEN '1' ELSE '0' END,
                    '' ORDER BY j) AS phash
  FROM grid GROUP BY doc_id
),
banded AS MATERIALIZED (
  {' UNION ALL '.join(f"SELECT doc_id, {k} AS band, substr(phash, {k * 16 + 1}, 16) AS key FROM hashed" for k in range(_PHASH_BANDS))}
),
cand AS MATERIALIZED (
  SELECT DISTINCT b1.doc_id AS a, b2.doc_id AS b
  FROM banded b1
  JOIN banded b2 ON b1.band = b2.band AND b1.key = b2.key
               AND b1.doc_id < b2.doc_id
),
pairs AS (
  SELECT c.a, c.b
  FROM cand c
  JOIN hashed ha ON ha.doc_id = c.a
  JOIN hashed hb ON hb.doc_id = c.b
  WHERE list_sum(list_transform(range(1, 65), i ->
          CASE WHEN substr(ha.phash, CAST(i AS INTEGER), 1)
                  = substr(hb.phash, CAST(i AS INTEGER), 1)
               THEN 0 ELSE 1 END)) <= {_PHASH_MAX_HAMMING}
),
partners AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_near FROM (
    SELECT a AS doc_id FROM pairs UNION ALL SELECT b AS doc_id FROM pairs
  ) GROUP BY doc_id
)
SELECT h.doc_id, h.phash, COALESCE(p.n_near, 0) AS n_near
FROM hashed h LEFT JOIN partners p ON p.doc_id = h.doc_id
"""


_MULTIMODAL_DECODE_SQL = """
SELECT doc_id,
       CAST(64 + (doc_id * 7) % 448 AS INTEGER) AS width,
       CAST(64 + (doc_id * 13) % 448 AS INTEGER) AS height,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_body_bytes,
       md5(text) AS checksum
FROM documents
"""


_RRF_K = 60  # standard reciprocal-rank-fusion damping constant
_RRF_CAND = 20  # per-branch candidate depth before fusion


def simsearch_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: dense (cosine over embeddings) + sparse
    (distinct-token overlap) candidate lists fused by reciprocal-rank
    fusion — the standard two-tower RAG retrieval shape.

    RRF works on RANKS, not raw scores, so the fused score is a sum of
    two exact reciprocals of small integers: bit-deterministic across
    engines with no score-calibration step. Each branch is top-20 per
    query (vector branch: broadcast query side + window, the re-rank
    shape; text branch: equi-join on the token — linear, shuffle on the
    token key); the fusion is a full outer join of two ≤20-row-per-query
    lists — trivially small however large the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")

    norm = _dot(F.col("embedding"), F.col("embedding"))
    base = emb.select("vec_id", "embedding", norm.alias("nrm"))
    vq = base.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt("q_nrm") * F.sqrt("nrm")
    )
    wv = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    vec = (
        base.crossJoin(F.broadcast(vq))
        .where(F.col("vec_id") != F.col("q_id"))
        .withColumn("cos", cos)
        .withColumn("vec_rank", F.row_number().over(wv))
        .where(F.col("vec_rank") <= _RRF_CAND)
        .select("q_id", F.col("vec_id").alias("cand_id"), "vec_rank")
    )

    toks = _toks_frame(docs, "doc_id").select(
        "doc_id", F.explode(F.array_distinct("toks")).alias("tok")
    )
    qt = toks.where(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("q_id"), "tok"
    )
    ov = (
        toks.join(F.broadcast(qt), "tok")
        .where(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", F.col("doc_id").alias("cand_id"))
        .agg(F.count(F.lit(1)).alias("ov"))
    )
    wt = Window.partitionBy("q_id").orderBy(F.col("ov").desc(), "cand_id")
    txt = (
        ov.withColumn("txt_rank", F.row_number().over(wt))
        .where(F.col("txt_rank") <= _RRF_CAND)
        .select("q_id", "cand_id", "txt_rank")
    )

    fused = vec.join(txt, ["q_id", "cand_id"], "full")
    rrf = F.round(
        F.coalesce(
            F.lit(1.0) / (F.lit(_RRF_K) + F.col("vec_rank")), F.lit(0.0)
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(_RRF_K) + F.col("txt_rank")), F.lit(0.0)
        ),
        6,
    )
    wf = Window.partitionBy("q_id").orderBy(F.col("rrf").desc(), "cand_id")
    return (
        fused.withColumn("rrf", rrf)
        .withColumn("rank", F.row_number().over(wf))
        .where(F.col("rank") <= 10)
        .select("q_id", "cand_id", "vec_rank", "txt_rank", "rrf", "rank")
    )


_HYBRID_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding, {_sql_dot('embedding', 'embedding')} AS nrm
  FROM embeddings
),
vec AS (
  SELECT q_id, cand_id, vec_rank FROM (
    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_sql_dot('q.embedding', 'c.embedding')}
                       / (sqrt(q.nrm) * sqrt(c.nrm)) DESC, c.vec_id)
             AS vec_rank
    FROM e q JOIN e c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
  ) WHERE vec_rank <= {_RRF_CAND}
),
tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
),
ov AS (
  SELECT q.doc_id AS q_id, d.doc_id AS cand_id, count(*) AS ov
  FROM tok q JOIN tok d ON d.tok = q.tok
  WHERE q.doc_id < 5 AND d.doc_id <> q.doc_id
  GROUP BY 1, 2
),
txt AS (
  SELECT q_id, cand_id, txt_rank FROM (
    SELECT q_id, cand_id,
           row_number() OVER (PARTITION BY q_id ORDER BY ov DESC, cand_id)
             AS txt_rank
    FROM ov
  ) WHERE txt_rank <= {_RRF_CAND}
),
fused AS (
  SELECT COALESCE(vec.q_id, txt.q_id) AS q_id,
         COALESCE(vec.cand_id, txt.cand_id) AS cand_id,
         vec.vec_rank, txt.txt_rank,
         round(COALESCE(1.0::DOUBLE / ({_RRF_K} + vec.vec_rank), 0.0)
               + COALESCE(1.0::DOUBLE / ({_RRF_K} + txt.txt_rank), 0.0), 6)
           AS rrf
  FROM vec FULL JOIN txt
    ON txt.q_id = vec.q_id AND txt.cand_id = vec.cand_id
)
SELECT q_id, cand_id, CAST(vec_rank AS INTEGER) AS vec_rank,
       CAST(txt_rank AS INTEGER) AS txt_rank, rrf,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, cand_id)
            AS rank
  FROM fused
) WHERE rank <= 10
"""


# -------------------------------------------------- hard-negative mining


def simsearch_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-5 most cosine-similar vectors of a DIFFERENT label
    — high-similarity wrong answers, the pairs a retrieval trainer
    wants in the denominator.

    Same physical shape as :func:`simsearch_topk` (broadcast tiny query
    side, score, per-query window top-k); at corpus scale the candidate
    generator is the LSH/IVF path and this exact scoring is the re-rank
    stage over its candidates — the label filter is a pushed-down
    predicate either way."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = _dot(F.col("embedding"), F.col("embedding"))
    base = emb.select("vec_id", "label", "embedding", norm.alias("nrm"))
    queries = base.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt("q_nrm") * F.sqrt("nrm")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        base.crossJoin(F.broadcast(queries))
        .where(F.col("label") != F.col("q_label"))
        .withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select(
            "q_id",
            "q_label",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            "cos",
            "rnk",
        )
    )


_HARD_NEG_SQL = f"""
WITH e AS (
  SELECT vec_id, label, embedding,
         {_sql_dot('embedding', 'embedding')} AS nrm
  FROM embeddings
)
SELECT q_id, q_label, neg_id, neg_label, cos, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT q.vec_id AS q_id, q.label AS q_label,
         c.vec_id AS neg_id, c.label AS neg_label,
         {_sql_dot('q.embedding', 'c.embedding')}
           / (sqrt(q.nrm) * sqrt(c.nrm)) AS cos,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY {_sql_dot('q.embedding', 'c.embedding')}
                     / (sqrt(q.nrm) * sqrt(c.nrm)) DESC, c.vec_id) AS rnk
  FROM e q JOIN e c ON q.vec_id < 5 AND c.label <> q.label
) WHERE rnk <= 5
"""


# --------------------------------------------- multimodal frame sampling

_FRAME_CHARS = 64  # chars per frame (the deterministic decode stand-in)
_FRAME_SAMPLES = 8  # frames sampled per document


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over an opaque payload column: emit up to
    ``_FRAME_SAMPLES`` evenly-strided frames per document with offset,
    byte length, and content fingerprint — the video/audio
    frame-extraction plumbing (sample k frames per clip for a vision
    encoder), with the codec decode replaced by a deterministic
    char-window stand-in (no codec libs in this container; a real
    deployment swaps the frame expression for a Pandas-UDF decode like
    :func:`multimodal_decode`, which parses a real binary container).

    All built-in expressions — ``sequence`` + ``posexplode`` for the
    frame index fan-out, ``substring``/``md5``/``octet_length`` for the
    frame content — so the fan-out stays inside whole-stage codegen:
    map-only, no shuffle, linear in Σ frames however large the corpus.
    Frames are char-aligned so the fingerprint is engine-neutral
    (UTF-8 md5 on both sides).

    Sampling formula: ``frame_idx = (i * total_frames) div n_samp`` —
    the standard even-spread selection. A floor-divided stride
    (``total div 8``) clusters all 8 samples at the start for 9–15
    frame docs, and a ceil-divided stride overruns the last frame for
    e.g. 12-frame docs; the div-based index is always in
    ``[0, total)`` and evenly spaced."""
    docs = load_table(spark, sf_dir, "documents")
    total = F.greatest(
        F.lit(1), F.expr(f"CAST(n_chars div {_FRAME_CHARS} AS INT)")
    )
    n_samp = F.least(F.lit(_FRAME_SAMPLES), total)
    frame_txt = F.expr(
        f"substring(text, frame_idx * {_FRAME_CHARS} + 1, {_FRAME_CHARS})"
    )
    return (
        docs.select(
            "doc_id",
            "text",
            total.alias("total_frames"),
            n_samp.alias("n_samp"),
            F.posexplode(F.sequence(F.lit(0), n_samp - 1)).alias(
                "sample_no", "i"
            ),
        )
        .select(
            "doc_id",
            "total_frames",
            F.col("sample_no").cast("int").alias("sample_no"),
            F.expr("(i * total_frames) div n_samp")
            .cast("long")
            .alias("frame_idx"),
            "text",
        )
        .select(
            "doc_id",
            "total_frames",
            "sample_no",
            "frame_idx",
            (F.col("frame_idx") * _FRAME_CHARS).cast("long").alias("offset"),
            F.octet_length(frame_txt).cast("long").alias("frame_bytes"),
            F.md5(frame_txt).alias("frame_md5"),
        )
    )


_FRAME_SAMPLE_SQL = f"""
WITH base AS (
  SELECT doc_id, text,
         greatest(1, CAST(n_chars // {_FRAME_CHARS} AS INT)) AS total_frames,
         least({_FRAME_SAMPLES},
               greatest(1, CAST(n_chars // {_FRAME_CHARS} AS INT))) AS n_samp
  FROM documents
),
fan AS (
  SELECT doc_id, text, total_frames, n_samp,
         unnest(range(n_samp)) AS sample_no
  FROM base
),
idx AS (
  SELECT doc_id, text, total_frames, sample_no,
         (sample_no * total_frames) // n_samp AS frame_idx
  FROM fan
)
SELECT doc_id, total_frames, CAST(sample_no AS INTEGER) AS sample_no,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(frame_idx * {_FRAME_CHARS} AS BIGINT) AS offset,
       CAST(strlen(substring(text, frame_idx * {_FRAME_CHARS} + 1,
                             {_FRAME_CHARS})) AS BIGINT) AS frame_bytes,
       md5(substring(text, frame_idx * {_FRAME_CHARS} + 1,
                     {_FRAME_CHARS})) AS frame_md5
FROM idx
"""


# ------------------------------------------- substring-level duplication

_SHINGLE_CHARS = 32
_SHINGLE_STRIDE = 16


def dedup_substring_shingle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication profile (the metric behind
    "Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2022: duplicated SPANS matter, not just duplicated documents):
    per document, how many of its distinct char-``_SHINGLE_CHARS``-gram
    shingles (stride ``_SHINGLE_STRIDE``) also occur in at least one
    OTHER document, and the resulting cross-duplication ratio.

    Shape: shingle fan-out with built-in ``sequence``/``transform``
    (stays in codegen), distinct (doc, shingle) pairs, one groupBy on
    the shingle to count carrier docs (map-side combine absorbs viral
    shingles), join back, per-doc aggregate — linear in total text
    size, ~n_chars/stride shingles per doc. The full suffix-array exact
    dedup is a sort of the same fan-out; this bounded-shingle form is
    the standard at-scale approximation."""
    docs = load_table(spark, sf_dir, "documents")
    # the fan-out is one SQL expr: F.substring requires foldable
    # positions, so the lambda-parameterized start only works via
    # expr-level substring
    pairs = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, greatest(1, CAST((n_chars + "
                    f"{_SHINGLE_STRIDE} - 1) div {_SHINGLE_STRIDE} AS INT))"
                    f" - 1), i -> substring(text, i * {_SHINGLE_STRIDE} + 1,"
                    f" {_SHINGLE_CHARS}))"
                )
            ).alias("sh"),
        )
        .distinct()
    )
    carriers = pairs.groupBy("sh").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        pairs.join(carriers, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("n_docs") >= 2).cast("long")).alias(
                "n_dup_shingles"
            ),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_dup_shingles",
            (
                F.col("n_dup_shingles").cast("double")
                / F.col("n_shingles").cast("double")
            ).alias("dup_ratio"),
        )
    )


_SUBSTRING_SHINGLE_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT doc_id,
         substring(text, i * {_SHINGLE_STRIDE} + 1, {_SHINGLE_CHARS}) AS sh
  FROM documents,
       unnest(range(greatest(1,
         CAST((n_chars + {_SHINGLE_STRIDE} - 1) // {_SHINGLE_STRIDE}
              AS INT)))) AS t(i)
),
carriers AS (SELECT sh, count(*) AS n_docs FROM pairs GROUP BY sh)
SELECT p.doc_id,
       count(*) AS n_shingles,
       CAST(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_shingles,
       CAST(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS dup_ratio
FROM pairs p JOIN carriers c USING (sh)
GROUP BY p.doc_id
"""


# ------------------------------------------- distributed power iteration

_PCA_ITERS = 3
_PCA_UNIT = 1_000_000
_PCA_DIM = 64


def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding set by ``_PCA_ITERS``
    power iterations on the (uncentered) Gram matrix — distributed
    linear algebra without collecting X: per iteration one scan
    computes ``dot_i = x_i·v`` (fold over the zipped arrays, stays in
    codegen), a 64-key aggregate reduces ``s = Σ x_i·dot_i``, and v is
    re-broadcast as a 1-row array frame — the matvec never leaves the
    cluster and v is the only "small" state, exactly the 100 TB shape.

    Exact integer arithmetic start to finish: embeddings quantize to
    µ-units (floor(x·1e6), the memory-proven bit-identical recipe),
    per-term products widen to DECIMAL(38,0)/HUGEINT, and each iterate
    max-normalizes with the integral divide (both engines truncate
    toward zero — verified) — so even an iterative eigensolver is
    value-hash-oracled. Sign/direction is pinned by the deterministic
    all-ones start.

    Precision bound (DECIMAL(38,0) cap): after the first normalize
    |v_j| <= UNIT, so |s_j| <= N·dim·UNIT³ = N·6.4e19 and the
    ``s·1e6`` rescale peaks at N·6.4e25 — within the 1e38 cap up to
    N ≈ 1.5e12 rows, i.e. ~384 TB of 64-dim float32 embeddings,
    beyond the 100 TB design target. Past that, shard the corpus and
    merge per-shard Gram matvecs (s is additive across shards) before
    the rescale; non-ANSI Spark would otherwise silently NULL."""
    emb = load_table(spark, sf_dir, "embeddings")
    xq = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * F.lit(float(_PCA_UNIT)))
            .cast("long"),
        ).alias("xq"),
    )
    return pca_power_frame(spark, xq, _PCA_DIM, _PCA_ITERS)


def pca_power_frame(
    spark: SparkSession, xq: DataFrame, dim: int, iters: int
) -> DataFrame:
    """Power iteration over a quantized-vector frame ``(vec_id, xq:
    array<long>)``; see :func:`embedding_pca_power` for the arithmetic
    contract."""
    v = spark.range(1).select(
        F.array(
            *[F.lit(_PCA_UNIT).cast("long") for _ in range(dim)]
        ).alias("v")
    )
    for _ in range(iters):
        dots = xq.crossJoin(F.broadcast(v)).select(
            "vec_id",
            "xq",
            F.aggregate(
                F.zip_with(F.col("xq"), F.col("v"), lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, t: acc + t,
            ).alias("dot"),
        )
        s = (
            dots.select(
                F.posexplode("xq").alias("dim", "x"),
                F.col("dot"),
            )
            .groupBy("dim")
            .agg(
                F.sum(
                    F.col("x").cast("decimal(38,0)") * F.col("dot")
                ).alias("s")
            )
        )
        mx = s.agg(
            F.greatest(F.max(F.abs(F.col("s"))), F.lit(1).cast("decimal(38,0)")).alias("mx")
        )
        vn = (
            s.crossJoin(F.broadcast(mx))
            .select(
                "dim",
                F.expr(f"CAST(s * {_PCA_UNIT} div mx AS BIGINT)").alias("vj"),
            )
        )
        v = vn.agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("dim", "vj"))
                ),
                lambda t: t["vj"],
            ).alias("v")
        )
    return (
        v.select(F.posexplode("v").alias("dim", "v_e6"))
        .select(
            "dim",
            "v_e6",
            (F.col("v_e6").cast("double") / F.lit(1e6)).alias("v"),
        )
    )


_KM_K = 4
_KM_ITERS = 2


def _xq_frame(emb: DataFrame) -> DataFrame:
    """(vec_id, xq: array<long>) — embeddings quantized to µ-units
    (floor(x·1e6)), the memory-proven bit-identical recipe shared by
    the PCA/kmeans/semantic-dedup kernels."""
    return emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * F.lit(float(_PCA_UNIT)))
            .cast("long"),
        ).alias("xq"),
    )


def kmeans_assign(
    xq: DataFrame, k: int = _KM_K, iters: int = _KM_ITERS
) -> tuple[DataFrame, DataFrame]:
    """The Lloyd loop shared by :func:`embedding_kmeans_lloyd` and
    :func:`dedup_semantic`: returns (assigned, cents) where assigned =
    (vec_id, cid, xq, d2) after ``iters`` assignment+update rounds and
    cents = the final (cid, c) centroids. Deterministic at any
    parallelism: k-smallest-vec_id init, ties to the lower cid,
    truncated-integer centroid means — see the caller docstrings."""
    cents = (
        xq.orderBy("vec_id")
        .limit(k)
        .select(
            F.row_number()
            .over(Window.orderBy("vec_id"))
            .cast("int")
            .alias("cid"),
            F.col("xq").alias("c"),
        )
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("xq"), F.col("c"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    assigned = None
    for _ in range(iters):
        scored = xq.crossJoin(F.broadcast(cents)).select(
            "vec_id", "xq", "cid", dist.alias("d2")
        )
        assigned = scored.groupBy("vec_id").agg(
            F.min_by(F.struct("cid", "xq", "d2"), F.struct("d2", "cid")).alias(
                "m"
            )
        ).select(
            "vec_id",
            F.col("m.cid").alias("cid"),
            F.col("m.xq").alias("xq"),
            F.col("m.d2").alias("d2"),
        )
        cents = (
            assigned.select("cid", F.posexplode("xq").alias("dim", "x"))
            .groupBy("cid", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .select("cid", "dim", F.expr("s div n").alias("cj"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "cj"))),
                    lambda t: t["cj"],
                ).alias("c")
            )
        )
    return assigned, cents


def embedding_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (k=``_KM_K``, ``_KM_ITERS``
    iterations) on the quantized embeddings — the clustering primitive
    behind corpus bucketing / semantic sharding, run as the real
    algorithm (assignment + centroid UPDATE), not a fixed-codebook
    quantizer like simsearch_ivf.

    Per iteration: broadcast the k centroids, one codegen'd fold
    computes each point's squared distance per centroid, ``min_by``
    picks the argmin (ties to the lower cid — explicit, so the oracle
    agrees), and a (k x dim)-key aggregate rebuilds centroids as
    ``sum div count`` — truncated-INTEGER means, which both engines
    compute identically, making a genuinely iterative ML kernel
    value-hash-oracled. Cluster-tiny state (k·dim longs) is the only
    thing broadcast; the data is scanned once per iteration — the
    100 TB shape. Output: one row per (cid, dim) with the final
    centroid coordinate, member count, and exact inertia."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, cents = kmeans_assign(_xq_frame(emb))
    stats = assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("d2").alias("inertia_pre"),
    )
    return (
        cents.select("cid", F.posexplode("c").alias("dim", "c_e6"))
        .join(stats, "cid")
        .select("cid", "dim", "c_e6", "n_members", "inertia_pre")
    )


def _kmeans_ctes(iters: int = _KM_ITERS) -> list[str]:
    """The Lloyd-loop CTE chain (final assignment lives in ``a{iters}``,
    final centroid coordinates in ``cm{iters}``) — shared by the kmeans
    oracle and the semantic-dedup oracle."""
    u = _PCA_UNIT
    ctes = [
        (
            "xq AS (SELECT vec_id, list_transform(embedding, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) * {u}.0) AS BIGINT)) AS xq "
            "FROM embeddings)"
        ),
        (
            f"c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT)"
            f" AS cid, xq AS c FROM (SELECT vec_id, xq FROM xq "
            f"ORDER BY vec_id LIMIT {_KM_K}))"
        ),
    ]
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        ctes.append(
            f"sc{i} AS (SELECT x.vec_id, x.xq, c.cid, "
            f"(SELECT SUM((x.xq[t.i + 1] - c.c[t.i + 1]) * "
            f"(x.xq[t.i + 1] - c.c[t.i + 1])) "
            f"FROM range({_PCA_DIM}) t(i)) AS d2 "
            f"FROM xq x CROSS JOIN {prev} c)"
        )
        ctes.append(
            f"a{i} AS (SELECT vec_id, xq, cid, d2 FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY vec_id "
            f"ORDER BY d2, cid) AS rn FROM sc{i}) WHERE rn = 1)"
        )
        ctes.append(
            f"cm{i} AS (SELECT cid, t.i AS dim, "
            f"SUM(xq[t.i + 1]) // count(*) AS cj "
            f"FROM a{i}, range({_PCA_DIM}) t(i) GROUP BY cid, t.i)"
        )
        ctes.append(
            f"c{i} AS (SELECT cid, list(cj ORDER BY dim) AS c "
            f"FROM cm{i} GROUP BY cid)"
        )
    return ctes


def _kmeans_sql(iters: int = _KM_ITERS) -> str:
    ctes = _kmeans_ctes(iters)
    last = iters
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
, stats AS (
  SELECT cid, count(*) AS n_members,
         CAST(SUM(d2) AS BIGINT) AS inertia_pre
  FROM a{last} GROUP BY cid
)
SELECT m.cid, CAST(m.dim AS INTEGER) AS dim, CAST(m.cj AS BIGINT) AS c_e6,
       s.n_members, s.inertia_pre
FROM cm{last} m JOIN stats s ON s.cid = m.cid
"""
    )


_SEMDEDUP_COS = 0.30  # fixture-calibrated: the synthetic embeddings are
# near-orthogonal random (max pairwise cosine 0.51, 99.9th pct 0.38), so
# the production SemDeDup threshold (~0.95) would make every stage after
# clustering vacuous on this corpus. 0.30 keeps cluster -> band ->
# verify -> prune all non-vacuously hash-checked; a real deployment
# passes its own tau through dedup_semantic_frame (the synthetic test
# plants genuine 0.99-cosine duplicates and runs at 0.95).


def _semantic_asg_frame(emb: DataFrame) -> DataFrame:
    """(vec_id, cid) k-means assignment — the cluster scoping stage."""
    assigned, _ = kmeans_assign(_xq_frame(emb))
    return assigned.select("vec_id", "cid")


def _semantic_cand_frame(
    emb: DataFrame, asg: DataFrame | None = None
) -> DataFrame:
    """The SemDeDup CANDIDATE generator: sign-LSH banding within each
    k-means cluster — distinct (a, b) pairs agreeing on (cid, band,
    key). Shared by :func:`dedup_semantic_frame` (which exact-verifies
    and prunes, passing its own assignment so Lloyd runs once) and
    :func:`dedup_semantic_recall` (which measures this generator
    against exact all-pairs truth on a bounded sample)."""
    if asg is None:
        asg = _semantic_asg_frame(emb)
    banded = (
        emb.select(
            "vec_id",
            F.posexplode(
                F.array(*[_sign_band_key(b) for b in range(_EMB_BANDS)])
            ).alias("band", "key"),
        )
        .join(asg, "vec_id")
    )
    return (
        banded.select(F.col("vec_id").alias("a"), "cid", "band", "key")
        .join(
            banded.select(F.col("vec_id").alias("b"), "cid", "band", "key"),
            ["cid", "band", "key"],
        )
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def dedup_semantic_frame(
    emb: DataFrame, tau: float = _SEMDEDUP_COS
) -> DataFrame:
    """SemDeDup-style semantic dedup over an embedding frame
    ``(vec_id, embedding)``: k-means cluster first, then prune
    within-cluster near-duplicates above a cosine threshold.

    Composition of two proven kernels — :func:`kmeans_assign` (the
    deterministic Lloyd loop) scopes the search, and the sign-LSH
    banding from :func:`dedup_embedding_cosine` generates candidates
    WITHIN each cluster (join key = (cid, band, key)), so the pair
    work per cluster is banded-linear, never members². Verified pairs
    (exact cosine >= tau) feed the keep-first rule: a vector is pruned
    iff some SMALLER vec_id in its cluster is a near-duplicate — the
    deterministic version of SemDeDup's keep-one-exemplar (the paper
    keeps a random member; min-id is the determinization that makes
    the result value-hash-oracle-able).

    100 TB shape: clustering is scan-per-iteration with k·dim
    broadcast state; candidates are equi-join buckets (cid, band,
    key); the prune is one grouped count + left join. No stage holds a
    cluster² or corpus² term — tools/round6_scale_check.py measures
    the 10x ratio."""
    asg = _semantic_asg_frame(emb)
    cand = _semantic_cand_frame(emb, asg)
    norm = _dot(F.col("embedding"), F.col("embedding"))
    e = emb.select("vec_id", "embedding", norm.alias("nrm"))
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (
        F.sqrt("nrm_a") * F.sqrt("nrm_b")
    )
    pairs = (
        cand.join(
            e.select(
                F.col("vec_id").alias("a"),
                F.col("embedding").alias("emb_a"),
                F.col("nrm").alias("nrm_a"),
            ),
            "a",
        )
        .join(
            e.select(
                F.col("vec_id").alias("b"),
                F.col("embedding").alias("emb_b"),
                F.col("nrm").alias("nrm_b"),
            ),
            "b",
        )
        .withColumn("cos", cos)
        .where(F.col("cos") >= F.lit(tau))
        .select("a", "b")
    )
    earlier = pairs.groupBy(F.col("b").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("n_dup_earlier")
    )
    return (
        asg.join(earlier, "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            F.coalesce("n_dup_earlier", F.lit(0)).alias("n_dup_earlier"),
            (F.coalesce("n_dup_earlier", F.lit(0)) == 0).alias("keep"),
        )
    )


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered SemDeDup key over the fixture embeddings — see
    :func:`dedup_semantic_frame` for semantics and the scale story."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    return dedup_semantic_frame(emb)


_SEM_RECALL_MIN = 0.2   # truth floor — BELOW the 0.30 design threshold
                        # on purpose, to expose the fall-off curve


def dedup_semantic_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured RECALL of the SemDeDup candidate generator (k-means
    scoping × sign-LSH banding) vs exact all-pairs cosine ground truth
    on a bounded sample (vec_id < ``_RECALL_SAMPLE``) — the semantic
    path's honest scorecard, completing the family
    (``dedup_banding_recall`` for MinHash, ``simsearch_recall*`` for
    ANN). A true pair can be missed two ways — the cluster boundary
    splits it, or all 8 sign bands disagree — and this table shows the
    combined effect per cosine bucket, including BELOW the 0.30
    operating threshold so the fall-off is visible.

    The exact truth is all-pairs only WITHIN the fixed sample (the
    quadratic the pipeline exists to avoid — bounding it is what keeps
    the baseline affordable at any corpus size); the candidate set is
    the full-corpus generator as deployed, filtered to the sample.
    Integers plus one int/int division per bucket; the bucket id is
    floor(10·cos) on identical IEEE doubles.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    cand = _semantic_cand_frame(emb).where(
        (F.col("a") < _RECALL_SAMPLE) & (F.col("b") < _RECALL_SAMPLE)
    )
    norm = _dot(F.col("embedding"), F.col("embedding"))
    e = emb.where(F.col("vec_id") < _RECALL_SAMPLE).select(
        "vec_id", "embedding", norm.alias("nrm")
    )
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (
        F.sqrt("nrm_a") * F.sqrt("nrm_b")
    )
    truth = (
        e.select(
            F.col("vec_id").alias("a"),
            F.col("embedding").alias("emb_a"),
            F.col("nrm").alias("nrm_a"),
        )
        .join(
            e.select(
                F.col("vec_id").alias("b"),
                F.col("embedding").alias("emb_b"),
                F.col("nrm").alias("nrm_b"),
            ),
            F.col("a") < F.col("b"),
        )
        .withColumn("cos", cos)
        .where(F.col("cos") >= _SEM_RECALL_MIN)
        .select("a", "b", F.floor(F.col("cos") * 10).cast("int").alias("bucket"))
    )
    return (
        truth.join(cand.withColumn("hit", F.lit(1)), ["a", "b"], "left")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_found"),
        )
        .withColumn(
            "recall",
            F.col("n_found").cast("double") / F.col("n_true").cast("double"),
        )
    )


def _semantic_recall_sql(
    floor_: float = _SEM_RECALL_MIN, sample: int = _RECALL_SAMPLE
) -> str:
    ctes = _kmeans_ctes(_KM_ITERS)
    banded_union = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, {_sign_band_key_sql(b)} AS key "
        f"FROM embeddings"
        for b in range(_EMB_BANDS)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
asg AS MATERIALIZED (SELECT vec_id, cid FROM a{_KM_ITERS}),
banded AS MATERIALIZED (
  SELECT bb.vec_id, a.cid, bb.band, bb.key
  FROM ({banded_union}) bb JOIN asg a USING (vec_id)
),
cand AS MATERIALIZED (
  SELECT DISTINCT b1.vec_id AS a, b2.vec_id AS b
  FROM banded b1
  JOIN banded b2 ON b1.cid = b2.cid AND b1.band = b2.band
                AND b1.key = b2.key AND b1.vec_id < b2.vec_id
  WHERE b1.vec_id < {sample} AND b2.vec_id < {sample}
),
e AS MATERIALIZED (
  SELECT vec_id, embedding,
         {_sql_dot('embedding', 'embedding')} AS nrm
  FROM embeddings WHERE vec_id < {sample}
),
truth AS MATERIALIZED (
  SELECT e1.vec_id AS a, e2.vec_id AS b,
         CAST(floor(({_sql_dot('e1.embedding', 'e2.embedding')}
           / (sqrt(e1.nrm) * sqrt(e2.nrm))) * 10) AS INTEGER) AS bucket
  FROM e e1 JOIN e e2 ON e1.vec_id < e2.vec_id
  WHERE {_sql_dot('e1.embedding', 'e2.embedding')}
          / (sqrt(e1.nrm) * sqrt(e2.nrm)) >= {floor_}
)
SELECT bucket, count(*) AS n_true,
       CAST(sum(CASE WHEN c.a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_found,
       CAST(sum(CASE WHEN c.a IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS recall
FROM truth t LEFT JOIN cand c ON c.a = t.a AND c.b = t.b
GROUP BY bucket
"""
    )


def _semantic_sql(tau: float = _SEMDEDUP_COS) -> str:
    ctes = _kmeans_ctes(_KM_ITERS)
    banded_union = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, {_sign_band_key_sql(b)} AS key "
        f"FROM embeddings"
        for b in range(_EMB_BANDS)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
asg AS MATERIALIZED (SELECT vec_id, cid FROM a{_KM_ITERS}),
banded AS MATERIALIZED (
  SELECT bb.vec_id, a.cid, bb.band, bb.key
  FROM ({banded_union}) bb JOIN asg a USING (vec_id)
),
cand AS MATERIALIZED (
  SELECT DISTINCT b1.vec_id AS a, b2.vec_id AS b
  FROM banded b1
  JOIN banded b2 ON b1.cid = b2.cid AND b1.band = b2.band
                AND b1.key = b2.key AND b1.vec_id < b2.vec_id
),
e AS MATERIALIZED (
  SELECT vec_id, embedding,
         {_sql_dot('embedding', 'embedding')} AS nrm
  FROM embeddings
),
pairs AS (
  SELECT c.a, c.b
  FROM cand c JOIN e e1 ON e1.vec_id = c.a JOIN e e2 ON e2.vec_id = c.b
  WHERE {_sql_dot('e1.embedding', 'e2.embedding')}
          / (sqrt(e1.nrm) * sqrt(e2.nrm)) >= {tau}
),
earlier AS (
  SELECT b AS vec_id, count(*) AS n_dup_earlier FROM pairs GROUP BY b
)
SELECT a.vec_id, a.cid,
       CAST(COALESCE(n.n_dup_earlier, 0) AS BIGINT) AS n_dup_earlier,
       COALESCE(n.n_dup_earlier, 0) = 0 AS keep
FROM asg a LEFT JOIN earlier n USING (vec_id)
"""
    )


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup keeper selection: within each near-dup
    cluster keep the HIGHEST-quality document (ties → smaller doc_id),
    not the arbitrary min-id — what a production corpus pipeline
    actually ships (dedup discards the worst copies, e.g. the
    boilerplate-wrapped mirror of a clean page). Composition of two
    existing stages: ``dedup_clusters`` (banded candidate pairs →
    transitive CC clusters) ⋈ ``text_quality_score``, then one
    rank-per-cluster window.

    Scale shape: the join is on doc_id (the id both sides already hash
    by), the window partitions by cluster — cluster sizes are dup-group
    sizes (small by nature; a pathological mega-cluster is one sorted
    partition, linear-log). Quality is per-row IEEE-754 double
    arithmetic — deterministic across engines (numerics.py) — so even
    the float ranking is value-hash-oracled."""
    clusters = dedup_clusters(spark, sf_dir).select("doc_id", "cluster")
    quality = text_quality_score(spark, sf_dir).select("doc_id", "quality")
    w = Window.partitionBy("cluster").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        clusters.join(quality, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster",
            "quality",
            (F.col("rn") == 1).alias("is_keeper"),
        )
    )


_DEDUP_KEEP_BEST_SQL = f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  SELECT a, b FROM ({_DEDUP_NGRAM_SQL})
),
sym AS MATERIALIZED (
  SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs
),
verts AS (SELECT doc_id AS v FROM documents),
reach(s, d) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.s, e.b FROM reach r JOIN sym e ON e.a = r.d
),
comp AS (SELECT s AS doc_id, min(d) AS cluster FROM reach GROUP BY s),
qual AS ({_TEXT_QUALITY_SQL.strip()})
SELECT c.doc_id, c.cluster, q.quality,
       row_number() OVER (PARTITION BY c.cluster
                          ORDER BY q.quality DESC, c.doc_id ASC) = 1
         AS is_keeper
FROM comp c JOIN qual q USING (doc_id)
"""


_BUDGET_PCT = 25  # token budget as % of total corpus tokens


def corpus_token_budget_sample(
    spark: SparkSession, sf_dir: str, n_shards: int | None = None
) -> DataFrame:
    """Budget-constrained corpus selection: take documents in
    quality-descending order (ties → smaller doc_id) until the running
    token total fills ``_BUDGET_PCT``% of the corpus — "give me the
    best N-token training subset", the selection step between quality
    scoring and pack_sequences in a real pipeline.

    The running total uses the SAME two-pass distributed prefix sum as
    :func:`pack_sequences` (range-partition by the sort key, O(shards)
    driver-side offsets, per-shard windows) — a single un-partitioned
    ORDER BY quality window would serialize the corpus through one
    task at 100 TB. Token counts are integers so the cumulative sum
    and the cutoff are exact; per-row double quality is IEEE-754
    deterministic, so selection is value-hash-oracled. Budget may
    overshoot by at most one document (inclusive <= threshold)."""
    q = text_quality_score(spark, sf_dir).select(
        "doc_id", F.col("n_tok").cast("long").alias("n_tok"), "quality"
    )
    if n_shards is None:
        n_shards = _pack_shard_count(spark, q)
    sized = (
        q.repartitionByRange(
            n_shards, F.col("quality").desc(), F.col("doc_id").asc()
        )
        .withColumn("pid", F.spark_partition_id())
        # freeze the shard assignment (range boundaries are sampled)
        .transform(cut)
    )
    subtot = {
        r["pid"]: r["tot"]
        for r in sized.groupBy("pid").agg(F.sum("n_tok").alias("tot")).collect()
    }
    running, offsets = 0, {}
    for pid in sorted(subtot):
        offsets[pid] = running
        running += subtot[pid]
    threshold = running * _BUDGET_PCT // 100
    if offsets:
        off_df = spark.createDataFrame(
            list(offsets.items()), "pid int, off bigint"
        )
        sized = sized.join(F.broadcast(off_df), "pid")
    else:
        sized = sized.withColumn("off", F.lit(0).cast("long"))
    w = (
        Window.partitionBy("pid")
        .orderBy(F.desc("quality"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = sized.withColumn(
        "cum_tok", F.col("off") + F.sum("n_tok").over(w)
    )
    return cum.where(F.col("cum_tok") <= F.lit(threshold)).select(
        "doc_id", "n_tok", "quality", "cum_tok"
    )


_TOKEN_BUDGET_SQL = f"""
WITH q AS ({_TEXT_QUALITY_SQL.strip()}),
sized AS (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, quality FROM q
),
cum AS (
  SELECT doc_id, n_tok, quality,
         SUM(n_tok) OVER (ORDER BY quality DESC, doc_id ASC) AS cum_tok
  FROM sized
)
SELECT doc_id, n_tok, quality, CAST(cum_tok AS BIGINT) AS cum_tok
FROM cum
WHERE cum_tok <= (SELECT sum(n_tok) * {_BUDGET_PCT} // 100 FROM sized)
"""


_PARA_WORDS = 20  # chunk ("paragraph") granularity in tokens


def dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (paragraph-level) exact dedup, Dolma/CCNet style:
    every whole-doc dedup key in this module keeps or drops entire
    documents, but production corpora mostly carry *partial* overlap —
    boilerplate headers, quoted paragraphs, syndicated fragments — so
    the highest-recall cleanup is removing duplicated PARAGRAPHS while
    keeping their host documents. The fixtures carry no newlines, so
    "paragraph" is the post-normalization chunk a real pipeline would
    use anyway: consecutive ``_PARA_WORDS``-token spans.

    Algorithm (all built-in expressions, one shuffle per stage):
    chunk each doc's token array (``transform(sequence, slice)``, no
    explode-regroup round trip), ``posexplode`` chunks, keep the
    globally FIRST occurrence of each chunk md5 (first by doc_id, then
    by in-doc position — the deterministic "earliest copy wins" rule),
    then reconstruct each document from its surviving chunks in order.
    Output: per-doc chunk count, kept count, and the cleaned text.

    Scale shape: the first-occurrence window partitions by chunk md5 —
    a group-by-key over fixed-width 16-byte keys whose groups are dup
    multiplicities (tiny; a viral boilerplate chunk with 10^6 copies is
    one sorted partition, linear-log, and AQE skew-split applies since
    the output is one winner per group, not k^2 pairs). Reconstruction
    groups by doc_id, the key the scan is already hashed by. At 100 TB
    the md5 shuffle carries (pos, chunk) pairs — chunk text can be
    dropped from the shuffle by re-joining winners to the chunk table
    on (doc_id, pos); kept here inline because the reconstruct needs
    the text anyway and carrying it once beats a second scan-side join."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(float(_PARA_WORDS))).cast("int")
    chunks = F.when(n_chunks > 0, F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(words, i * _PARA_WORDS + 1, _PARA_WORDS), " "
        ),
    )).otherwise(F.array().cast("array<string>"))
    ex = docs.select(
        "doc_id", F.posexplode(chunks).alias("pos", "chunk")
    )
    w = Window.partitionBy(F.md5(F.col("chunk"))).orderBy(
        F.asc("doc_id"), F.asc("pos")
    )
    ranked = ex.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("rn") == 1, F.struct(F.col("pos"), F.col("chunk"))
    )
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count(kept_struct).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("kept_text"),
        )
        .select("doc_id", "n_chunks", "n_kept", "kept_text")
    )


_DEDUP_PARAGRAPH_SQL = f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
chunked AS (
  SELECT doc_id,
         list_transform(
           range(0, CAST(ceil(len(ws) / {_PARA_WORDS}.0) AS BIGINT)),
           i -> array_to_string(
                  ws[i*{_PARA_WORDS}+1 : i*{_PARA_WORDS}+{_PARA_WORDS}],
                  ' ')
         ) AS chunks
  FROM words
),
ex AS (
  SELECT doc_id, unnest(chunks) AS chunk,
         generate_subscripts(chunks, 1) - 1 AS pos
  FROM chunked
),
ranked AS (
  SELECT doc_id, pos, chunk,
         row_number() OVER (PARTITION BY md5(chunk)
                            ORDER BY doc_id ASC, pos ASC) AS rn
  FROM ex
)
SELECT doc_id,
       count(*) AS n_chunks,
       count(*) FILTER (WHERE rn = 1) AS n_kept,
       coalesce(string_agg(chunk, ' ' ORDER BY pos)
                  FILTER (WHERE rn = 1), '') AS kept_text
FROM ranked GROUP BY doc_id
"""

_LINE_WORDS = 8  # synthetic "line" width (tokens) — see dedup_lines

# Explicit ASCII whitespace class for the line-dedup family. The three
# engines that must agree byte-for-byte disagree on ``\s``: Java's
# includes \x0B, DuckDB's RE2 does not, and the pytest replica's
# Python ``re`` is Unicode-aware — a vertical tab or a Unicode space
# in a document would break oracle parity while looking like a Spark
# bug. Every segmentation/normalization regex here uses this literal
# class on BOTH sides instead; Unicode whitespace is deliberately NOT
# collapsed (C4-style pipelines are byte-oriented at this stage).
_WS = r" \t\n\r\f\x0B"


def dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style exact LINE dedup — the one standard corpus
    curation level :func:`dedup_paragraph` (fixed 20-token chunks)
    does not cover: every public LLM pipeline removes exact-repeated
    lines (boilerplate headers, nav bars, license banners) before any
    document-level pass. The production shape is literally
    ``split(text, '\\n')`` → normalized line hash → keep the globally
    FIRST occurrence by (doc_id, line_no); the fixtures carry no
    newlines, so a newline is first injected every ``_LINE_WORDS``
    tokens (one regexp_replace) and the pipeline downstream of the
    split is exactly the production one.

    Normalization before hashing (lower + collapse whitespace + trim)
    follows CCNet; the kept document is reassembled from surviving RAW
    lines in order and reported as an md5 so the driver hash pins the
    full reassembly without shipping the text back.

    Scale shape: one map-side regexp + explode, one shuffle on the
    16-byte line hash (group sizes = dup multiplicities — a viral
    boilerplate line is one sorted group, linear-log, AQE skew-split
    eligible), one groupBy on doc_id (the scan's natural key). No
    pairwise term anywhere — this is the cheapest dedup level and the
    first one a 100 TB pipeline runs."""
    docs = load_table(spark, sf_dir, "documents")
    lined = F.regexp_replace(
        F.col("text"),
        r"((?:[^%s]+ ){%d}[^%s]+) " % (_WS, _LINE_WORDS - 1, _WS),
        "$1\n",
    )
    ex = docs.select(
        "doc_id", F.posexplode(F.split(lined, "\n", -1)).alias("line_no", "line")
    )
    norm = F.trim(F.regexp_replace(F.lower(F.col("line")), "[%s]+" % _WS, " "))
    w = Window.partitionBy("line_hash").orderBy("doc_id", "line_no")
    ranked = ex.withColumn("line_hash", F.md5(norm)).withColumn(
        "rn", F.row_number().over(w)
    )
    kept = F.when(F.col("rn") == 1, F.struct("line_no", "line"))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        (F.count(F.lit(1)) - F.count(kept)).alias("n_removed"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept)), lambda s: s["line"]
                ),
                "\n",
            )
        ).alias("kept_hash"),
    )


_DEDUP_LINES_SQL = rf"""
WITH lined AS (
  SELECT doc_id,
         string_split(regexp_replace(text,
             '((?:[^{_WS}]+ ){{{_LINE_WORDS - 1}}}[^{_WS}]+) ', '\1' || chr(10), 'g'),
           chr(10)) AS lines
  FROM documents
), ex AS (
  SELECT doc_id, generate_subscripts(lines, 1) - 1 AS line_no,
         unnest(lines) AS line
  FROM lined
), ranked AS (
  SELECT doc_id, line_no, line,
         row_number() OVER (
           PARTITION BY md5(trim(regexp_replace(lower(line), '[{_WS}]+', ' ', 'g')))
           ORDER BY doc_id ASC, line_no ASC) AS rn
  FROM ex
)
SELECT doc_id,
       count(*) AS n_lines,
       count(*) - count(*) FILTER (WHERE rn = 1) AS n_removed,
       md5(coalesce(string_agg(line, chr(10) ORDER BY line_no)
                      FILTER (WHERE rn = 1), '')) AS kept_hash
FROM ranked GROUP BY doc_id
"""

_BOILER_MIN_DOCS = 2  # a line in >= this many distinct docs is boilerplate


def dedup_lines_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate LINE removal — the other standard line-level rule
    (RefinedWeb/CCNet): where :func:`dedup_lines` keeps the globally
    FIRST copy of a repeated line (dedup semantics), boilerplate
    removal drops EVERY copy of a line that appears in ≥
    ``_BOILER_MIN_DOCS`` distinct documents — nav bars, cookie
    banners and license headers are noise in all their occurrences,
    including the first. Same segmentation and normalization as
    ``dedup_lines`` (one regexp newline injection, lower + collapse +
    trim before hashing), intra-doc repeats alone don't make a line
    boilerplate (the count is DISTINCT docs).

    Scale shape: identical to ``dedup_lines`` — one explode, one
    16-byte-hash aggregation (count distinct docs per line), one
    broadcast-or-shuffled semi-join back, one doc_id regroup. The
    per-hash group carries only a count, so a viral boilerplate line
    is one aggregate row, never a blow-up."""
    docs = load_table(spark, sf_dir, "documents")
    lined = F.regexp_replace(
        F.col("text"),
        r"((?:[^%s]+ ){%d}[^%s]+) " % (_WS, _LINE_WORDS - 1, _WS),
        "$1\n",
    )
    ex = docs.select(
        "doc_id", F.posexplode(F.split(lined, "\n", -1)).alias("line_no", "line")
    )
    norm = F.trim(F.regexp_replace(F.lower(F.col("line")), "[%s]+" % _WS, " "))
    hashed = ex.withColumn("line_hash", F.md5(norm))
    boiler = (
        hashed.groupBy("line_hash")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= _BOILER_MIN_DOCS)
        .select("line_hash")
    )
    marked = hashed.join(
        boiler.withColumn("is_boiler", F.lit(True)), "line_hash", "left"
    )
    kept = F.when(
        F.col("is_boiler").isNull(), F.struct("line_no", "line")
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        (F.count(F.lit(1)) - F.count(kept)).alias("n_boiler"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept)), lambda s: s["line"]
                ),
                "\n",
            )
        ).alias("kept_hash"),
    )


_DEDUP_LINES_BOILER_SQL = rf"""
WITH lined AS (
  SELECT doc_id,
         string_split(regexp_replace(text,
             '((?:[^{_WS}]+ ){{{_LINE_WORDS - 1}}}[^{_WS}]+) ', '\1' || chr(10), 'g'),
           chr(10)) AS lines
  FROM documents
), ex AS (
  SELECT doc_id, generate_subscripts(lines, 1) - 1 AS line_no,
         unnest(lines) AS line
  FROM lined
), hashed AS MATERIALIZED (
  SELECT doc_id, line_no, line,
         md5(trim(regexp_replace(lower(line), '[{_WS}]+', ' ', 'g'))) AS line_hash
  FROM ex
), boiler AS (
  SELECT line_hash FROM hashed
  GROUP BY line_hash
  HAVING count(DISTINCT doc_id) >= {_BOILER_MIN_DOCS}
), marked AS (
  SELECT h.doc_id, h.line_no, h.line,
         b.line_hash IS NOT NULL AS is_boiler
  FROM hashed h LEFT JOIN boiler b ON b.line_hash = h.line_hash
)
SELECT doc_id,
       count(*) AS n_lines,
       count(*) - count(*) FILTER (WHERE NOT is_boiler) AS n_boiler,
       md5(coalesce(string_agg(line, chr(10) ORDER BY line_no)
                      FILTER (WHERE NOT is_boiler), '')) AS kept_hash
FROM marked GROUP BY doc_id
"""


def corpus_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup health report — the dashboard row a corpus
    owner reads before a training run: how much of each source is
    exact-duplicated, near-duplicated, and paragraph-duplicated.
    Composes three registered stages (exact hash groups, banded n-gram
    Jaccard pairs, :func:`dedup_paragraph` chunk stats) into one
    per-source aggregate, so the report stays consistent with the
    operators that would actually do the removal.

    Scale shape: every component is already banded/linear; this adds
    two doc_id equi-joins (the scan's hash key) and one groupBy over
    |sources| rows. The near-dup flag set is distinct doc ids from the
    pair list — bounded by docs, not pairs. The only division is one
    per output row, after all integer aggregation — deterministic."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    w = Window.partitionBy("text_hash")
    flagged = docs.select(
        "doc_id",
        "source",
        F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("text_hash"),
    ).withColumn(
        "is_exact_dup", F.col("doc_id") != F.min("doc_id").over(w)
    )
    pairs = dedup_ngram_jaccard(spark, sf_dir)
    near = (
        pairs.select(F.col("a").alias("doc_id"))
        .unionByName(pairs.select(F.col("b").alias("doc_id")))
        .distinct()
        .withColumn("is_near", F.lit(True))
    )
    para = dedup_paragraph(spark, sf_dir).select(
        "doc_id", "n_chunks", "n_kept"
    )
    return (
        flagged.join(near, "doc_id", "left")
        .join(para, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("is_exact_dup").cast("long")).alias("n_exact_dup"),
            F.sum(F.coalesce(F.col("is_near"), F.lit(False)).cast("long"))
            .alias("n_near_dup"),
            F.sum("n_chunks").cast("long").alias("n_chunks"),
            F.sum("n_kept").cast("long").alias("n_kept"),
        )
        .withColumn(
            "para_dup_pct",
            (F.col("n_chunks") - F.col("n_kept")).cast("double")
            * F.lit(100.0)
            / F.col("n_chunks").cast("double"),
        )
    )


_DEDUP_REPORT_SQL = f"""
WITH flagged AS (
  SELECT doc_id, source,
         doc_id <> min(doc_id) OVER (
           PARTITION BY sha256(lower(trim(text)))) AS is_exact_dup
  FROM documents
),
pairs AS MATERIALIZED ({{ngram}}),
near AS (
  SELECT DISTINCT doc_id FROM (
    SELECT a AS doc_id FROM pairs UNION ALL SELECT b FROM pairs)
),
para AS MATERIALIZED (
  SELECT doc_id, n_chunks, n_kept FROM ({{para}}) p
),
agg AS (
  SELECT f.source,
         count(*) AS n_docs,
         CAST(sum(CASE WHEN f.is_exact_dup THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exact_dup,
         CAST(sum(CASE WHEN n.doc_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_near_dup,
         CAST(sum(p.n_chunks) AS BIGINT) AS n_chunks,
         CAST(sum(p.n_kept) AS BIGINT) AS n_kept
  FROM flagged f
  LEFT JOIN near n USING (doc_id)
  JOIN para p USING (doc_id)
  GROUP BY f.source
)
SELECT source, n_docs, n_exact_dup, n_near_dup, n_chunks, n_kept,
       CAST(n_chunks - n_kept AS DOUBLE) * 100.0
         / CAST(n_chunks AS DOUBLE) AS para_dup_pct
FROM agg
"""


def _dedup_report_sql() -> str:
    return _DEDUP_REPORT_SQL.format(
        ngram=_DEDUP_NGRAM_SQL.strip(),
        para=_DEDUP_PARAGRAPH_SQL.strip(),
    )


def _pca_sql(iters: int = _PCA_ITERS) -> str:
    u = _PCA_UNIT
    ctes = [
        (
            "xq AS (SELECT vec_id, list_transform(embedding, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) * {u}.0) AS BIGINT)) AS xq "
            "FROM embeddings)"
        ),
        (
            f"v0 AS (SELECT i AS dim, CAST({u} AS HUGEINT) AS vj "
            f"FROM range({_PCA_DIM}) t(i))"
        ),
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"d{i} AS (SELECT x.vec_id, SUM(CAST(x.xq[t.i + 1] AS HUGEINT)"
            f" * v.vj) AS dot "
            f"FROM xq x, range({_PCA_DIM}) t(i) "
            f"JOIN v{i - 1} v ON v.dim = t.i GROUP BY x.vec_id)"
        )
        ctes.append(
            f"s{i} AS (SELECT t.i AS dim, "
            f"SUM(CAST(x.xq[t.i + 1] AS HUGEINT) * d.dot) AS s "
            f"FROM xq x JOIN d{i} d ON d.vec_id = x.vec_id, "
            f"range({_PCA_DIM}) t(i) GROUP BY t.i)"
        )
        ctes.append(
            f"v{i} AS (SELECT dim, CAST(s * {u} // "
            f"greatest((SELECT max(abs(s)) FROM s{i}), 1) AS HUGEINT) AS vj "
            f"FROM s{i})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT dim, CAST(vj AS BIGINT) AS v_e6, "
        f"CAST(vj AS DOUBLE) / 1e6 AS v FROM v{iters}"
    )


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_near_minhash": dedup_near_minhash,
    "dedup_simhash": dedup_simhash,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_edit_distance": dedup_edit_distance,
    "corpus_source_overlap": corpus_source_overlap,
    "dedup_containment": dedup_containment,
    "dedup_containment_smallside": dedup_containment_smallside,
    "dedup_banding_recall": dedup_banding_recall,
    "dedup_clusters": dedup_clusters,
    "dedup_keep_best": dedup_keep_best,
    "dedup_paragraph": dedup_paragraph,
    "dedup_lines": dedup_lines,
    "dedup_lines_boilerplate": dedup_lines_boilerplate,
    "corpus_dedup_report": corpus_dedup_report,
    "corpus_token_budget_sample": corpus_token_budget_sample,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_materialize": dedup_materialize,
    "dedup_incremental": dedup_incremental,
    "text_minhash_signature": text_minhash_signature,
    "embedding_quantize": embedding_quantize,
    "embedding_outlier_mahalanobis": embedding_outlier_mahalanobis,
    "corpus_training_manifest": corpus_training_manifest,
    "simsearch_topk": simsearch_topk,
    "simsearch_mmr": simsearch_mmr,
    "simsearch_filtered_topk": simsearch_filtered_topk,
    "simsearch_range": simsearch_range,
    "simsearch_hybrid_rrf": simsearch_hybrid_rrf,
    "simsearch_ivf": simsearch_ivf,
    "knn_graph_build": knn_graph_build,
    "semantic_clusters": semantic_clusters,
    "simsearch_ivf_filtered": simsearch_ivf_filtered,
    "simsearch_recall_filtered": simsearch_recall_filtered,
    "simsearch_ivf_append": simsearch_ivf_append,
    "simsearch_ivf_partitioned": simsearch_ivf_partitioned,
    "simsearch_ivf_rebalance": simsearch_ivf_rebalance,
    "simsearch_recall_rebalance": simsearch_recall_rebalance,
    "simsearch_ivfadc": simsearch_ivfadc,
    "simsearch_recall_ivfadc": simsearch_recall_ivfadc,
    "simsearch_lsh": simsearch_lsh,
    "simsearch_greedy_graph": simsearch_greedy_graph,
    "simsearch_recall": simsearch_recall,
    "embedding_matryoshka_recall": embedding_matryoshka_recall,
    "simsearch_binary_hamming": simsearch_binary_hamming,
    "simsearch_recall_lsh": simsearch_recall_lsh,
    "simsearch_pq": simsearch_pq,
    "simsearch_recall_pq": simsearch_recall_pq,
    "simsearch_pairs_label": simsearch_pairs_label,
    "text_wordcount": text_wordcount,
    "text_vocab_stats": text_vocab_stats,
    "text_tfidf": text_tfidf,
    "text_bm25_topk": text_bm25_topk,
    "text_ngrams": text_ngrams,
    "text_collocation_lift": text_collocation_lift,
    "text_zipf_fit": text_zipf_fit,
    "text_bpe_merge": text_bpe_merge,
    "text_bpe_encode": text_bpe_encode,
    "text_bpe_fertility": text_bpe_fertility,
    "text_lang_stats": text_lang_stats,
    "text_sentiment_lexicon": text_sentiment_lexicon,
    "text_quality_score": text_quality_score,
    "text_readability": text_readability,
    "text_keyword_rake": text_keyword_rake,
    "embedding_norm_audit": embedding_norm_audit,
    "corpus_dsir_weights": corpus_dsir_weights,
    "text_langid_ngram": text_langid_ngram,
    "text_token_count": text_token_count,
    "text_fingerprint": text_fingerprint,
    "text_chunk_sliding": text_chunk_sliding,
    "text_chunk_cdc": text_chunk_cdc,
    "pack_sequences": pack_sequences,
    "pack_lpt_shards": pack_lpt_shards,
    "split_train_test": split_train_test,
    "multimodal_enrich": multimodal_enrich_checked,
    "multimodal_decode": multimodal_decode,
    "multimodal_video_scenecut": multimodal_video_scenecut,
    "multimodal_audio_energy": multimodal_audio_energy,
    "multimodal_phash_dedup": multimodal_phash_dedup,
    "multimodal_frame_sample": multimodal_frame_sample,
    "simsearch_hard_negatives": simsearch_hard_negatives,
    "dedup_substring_shingle": dedup_substring_shingle,
    "embedding_pca_power": embedding_pca_power,
    "embedding_kmeans_lloyd": embedding_kmeans_lloyd,
    "dedup_semantic": dedup_semantic,
    "dedup_semantic_recall": dedup_semantic_recall,
    "langid_confusion": langid_confusion,
}

ORACLES = {
    "dedup_exact": _DEDUP_EXACT_SQL,
    "dedup_simhash": _DEDUP_SIMHASH_SQL,
    "dedup_near_minhash": _NEAR_MINHASH_SQL,
    "dedup_ngram_jaccard": _DEDUP_NGRAM_SQL,
    "dedup_edit_distance": _EDIT_DIST_SQL,
    "corpus_source_overlap": _SOURCE_OVERLAP_SQL,
    "dedup_containment": _DEDUP_CONTAIN_SQL,
    "dedup_containment_smallside": _DEDUP_CONTAIN_SMALL_SQL,
    "dedup_banding_recall": _BANDING_RECALL_SQL,
    "dedup_clusters": _DEDUP_CLUSTERS_SQL,
    "dedup_keep_best": _DEDUP_KEEP_BEST_SQL,
    "dedup_paragraph": _DEDUP_PARAGRAPH_SQL,
    "dedup_lines": _DEDUP_LINES_SQL,
    "dedup_lines_boilerplate": _DEDUP_LINES_BOILER_SQL,
    "corpus_dedup_report": _dedup_report_sql(),
    "corpus_token_budget_sample": _TOKEN_BUDGET_SQL,
    "dedup_embedding_cosine": _DEDUP_EMB_SQL,
    "dedup_materialize": _DEDUP_MATERIALIZE_SQL,
    "dedup_incremental": _DEDUP_INCR_SQL,
    "text_minhash_signature": _TEXT_MINHASH_SQL,
    "embedding_quantize": _EMB_QUANTIZE_SQL,
    "embedding_outlier_mahalanobis": _MAHAL_SQL,
    "corpus_training_manifest": _CORPUS_MANIFEST_SQL,
    "simsearch_topk": _SIMSEARCH_TOPK_SQL,
    "simsearch_mmr": _mmr_sql(),
    "simsearch_filtered_topk": _SIMSEARCH_FILTERED_SQL,
    "simsearch_range": _SIMSEARCH_RANGE_SQL,
    "simsearch_hybrid_rrf": _HYBRID_SQL,
    "simsearch_ivf": _SIMSEARCH_IVF_SQL,
    "knn_graph_build": _KNN_GRAPH_SQL,
    "semantic_clusters": _SEMCLUSTER_SQL,
    "simsearch_ivf_filtered": _IVF_FILTERED_SQL,
    "simsearch_recall_filtered": _RECALL_FILTERED_SQL,
    "simsearch_ivf_append": _IVF_APPEND_SQL,
    "simsearch_ivf_partitioned": _SIMSEARCH_IVF_SQL,
    "simsearch_ivf_rebalance": _IVF_REBALANCE_SQL,
    "simsearch_recall_rebalance": _RECALL_REBALANCE_SQL,
    "simsearch_ivfadc": _IVFADC_SQL,
    "simsearch_recall_ivfadc": _RECALL_IVFADC_SQL,
    "simsearch_lsh": _SIMSEARCH_LSH_SQL,
    "simsearch_greedy_graph": _greedy_graph_sql(),
    "simsearch_recall_lsh": _SIMSEARCH_RECALL_LSH_SQL,
    "simsearch_recall": _SIMSEARCH_RECALL_SQL,
    "embedding_matryoshka_recall": _matryoshka_sql(),
    "simsearch_binary_hamming": _binary_hamming_sql(),
    "simsearch_pq": _SIMSEARCH_PQ_SQL,
    "simsearch_recall_pq": _SIMSEARCH_RECALL_PQ_SQL,
    "simsearch_pairs_label": _SIMSEARCH_PAIRS_SQL,
    "text_wordcount": _TEXT_WORDCOUNT_SQL,
    "text_vocab_stats": _TEXT_VOCAB_SQL,
    "text_tfidf": _TEXT_TFIDF_SQL,
    "text_bm25_topk": _TEXT_BM25_SQL,
    "text_ngrams": _TEXT_NGRAMS_SQL,
    "text_collocation_lift": _COLLOC_SQL,
    "text_zipf_fit": _ZIPF_SQL,
    "text_bpe_merge": _BPE_SQL,
    "text_bpe_encode": _BPE_ENCODE_SQL,
    "text_bpe_fertility": _bpe_fertility_sql(),
    "text_lang_stats": _TEXT_LANG_STATS_SQL,
    "text_sentiment_lexicon": _TEXT_SENTIMENT_SQL,
    "text_quality_score": _TEXT_QUALITY_SQL,
    "text_readability": _READABILITY_SQL,
    "text_keyword_rake": _RAKE_SQL,
    "embedding_norm_audit": _NORM_AUDIT_SQL,
    "corpus_dsir_weights": _DSIR_SQL,
    "text_langid_ngram": _TEXT_LANGID_SQL,
    "text_token_count": _TEXT_TOKEN_COUNT_SQL,
    "text_fingerprint": _TEXT_FINGERPRINT_SQL,
    "text_chunk_sliding": _TEXT_CHUNK_SQL,
    "text_chunk_cdc": _TEXT_CDC_SQL,
    "pack_sequences": _PACK_SQL,
    "pack_lpt_shards": _PACK_LPT_SQL,
    "split_train_test": _SPLIT_SQL,
    "multimodal_enrich": _MULTIMODAL_ENRICH_SQL,
    "multimodal_decode": _MULTIMODAL_DECODE_SQL,
    "multimodal_video_scenecut": _VIDEO_CUT_SQL,
    "multimodal_audio_energy": _AUDIO_ENERGY_SQL,
    "multimodal_phash_dedup": _PHASH_SQL,
    "multimodal_frame_sample": _FRAME_SAMPLE_SQL,
    "simsearch_hard_negatives": _HARD_NEG_SQL,
    "dedup_substring_shingle": _SUBSTRING_SHINGLE_SQL,
    "embedding_pca_power": _pca_sql(),
    "embedding_kmeans_lloyd": _kmeans_sql(),
    "dedup_semantic": _semantic_sql(),
    "dedup_semantic_recall": _semantic_recall_sql(),
    "langid_confusion": _LANGID_CONFUSION_SQL,
}
