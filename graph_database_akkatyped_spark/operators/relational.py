"""Relational core operators (SURVEY.md §2-D).

The reference [R] answers these shapes as actor message fan-outs with
driver-side merging; here every one is a declarative DataFrame / SQL
plan so Catalyst picks the physical strategy (broadcast vs shuffle
join, partial+final agg, TakeOrderedAndProject for top-k) and AQE
re-plans at runtime — the properties that matter at 100 TB.

Determinism discipline (oracle hash parity):
- float SUM/AVG via exact decimals (`numerics.dsum/davg`),
- every window/top-k fully tie-broken,
- per-row double arithmetic left raw (IEEE-identical across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from graph_database_akkatyped_spark.catalog import load_table, register_views
from graph_database_akkatyped_spark.numerics import (
    davg,
    dec2double,
    dsum,
    sql_davg,
    sql_dsum,
)

def _rev() -> F.Column:
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_SQL_REV = "l_extendedprice * (1 - l_discount)"


# --------------------------------------------------------------- flagship


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region/nation/segment, top-3 nations per segment.

    One query touching scan -> filter -> 4 joins (2 broadcast) ->
    agg -> window -> filter. Milestone-0 end-to-end slice.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    base = (
        li.where(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("c_mktsegment", "r_name", "n_name")
        .agg(dsum(_rev(), 6).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("revenue").desc(), "n_name")
    return (
        base.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
    )


_FLAGSHIP_SQL = f"""
WITH base AS (
  SELECT c_mktsegment, r_name, n_name,
         {sql_dsum(_SQL_REV, 6)} AS revenue,
         count(*) AS n_items
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  GROUP BY 1, 2, 3
)
SELECT c_mktsegment, r_name, n_name, revenue, n_items, rnk FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY c_mktsegment ORDER BY revenue DESC, n_name) AS INTEGER) AS rnk
  FROM base
) WHERE rnk <= 3
"""


# ------------------------------------------------------ filter / project


def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            _rev().alias("net_revenue"),
        )
    )


_FILTER_PROJECT_SQL = f"""
SELECT l_orderkey, l_linenumber, l_quantity, {_SQL_REV} AS net_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
"""


# ------------------------------------------------------------------ joins


def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return orders.join(cust, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ broadcast(part): the small dim ships to every task —
    no shuffle of the 100 TB fact side."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice", 2).alias("brand_revenue"),
        )
    )


def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    c = cust.groupBy(F.col("c_nationkey").alias("nk_c")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    s = supp.groupBy(F.col("s_nationkey").alias("nk_s")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return c.join(s, F.col("nk_c") == F.col("nk_s"), "full").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"), "n_cust", "n_supp"
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event pairs of the same user within 1 hour — per-user pair count.

    Scalable shape: instead of an O(n²) theta join, bucket by hour and
    equi-join on (user, bucket) with the probe side exploded to the 3
    adjacent buckets, then apply the exact |Δts| ≤ 1h filter. The theta
    condition only ever sees one bucket's worth of rows.
    """
    HOUR_US = 3_600_000_000
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    a = e.select(
        F.col("event_id").alias("id_a"),
        "user_id",
        F.col("us").alias("us_a"),
        F.explode(
            F.array(
                F.floor(F.col("us") / HOUR_US) - 1,
                F.floor(F.col("us") / HOUR_US),
                F.floor(F.col("us") / HOUR_US) + 1,
            )
        ).alias("bkt"),
    )
    b = e.select(
        F.col("event_id").alias("id_b"),
        "user_id",
        F.col("us").alias("us_b"),
        F.floor(F.col("us") / HOUR_US).alias("bkt"),
    )
    pairs = a.join(b, ["user_id", "bkt"]).where(
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("us_b") - F.col("us_a")) <= HOUR_US)
    )
    return pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


_JOIN_THETA_RANGE_SQL = """
SELECT e1.user_id, count(*) AS n_pairs
FROM events e1
JOIN events e2
  ON e1.user_id = e2.user_id
 AND e1.event_id < e2.event_id
 AND abs(epoch_us(e2.ts) - epoch_us(e1.ts)) <= 3600000000
GROUP BY e1.user_id
"""


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each click, the user's latest signup at-or-before.

    Scalable shape (no per-row subquery): union both sides with a tag,
    one window pass with ``last(ignorenulls)`` — O(n log n) shuffle on
    user_id, versus the reference's per-message lookups [R].
    """
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(1).alias("is_click"),
        F.lit(None).cast("timestamp").alias("s_ts"),
    )
    signups = e.where(F.col("event_type") == "signup").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("is_click"),
        F.col("ts").alias("s_ts"),
    )
    tagged = clicks.unionByName(signups)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        tagged.withColumn("signup_ts", F.last("s_ts", ignorenulls=True).over(w))
        .where(F.col("is_click") == 1)
        .select("event_id", "user_id", "ts", "signup_ts")
    )


_JOIN_ASOF_SQL = """
SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS ts,
       CAST((SELECT max(s.ts) FROM events s
             WHERE s.event_type = 'signup'
               AND s.user_id = c.user_id
               AND s.ts <= c.ts) AS TIMESTAMP) AS signup_ts
FROM events c
WHERE c.event_type = 'click'
"""


def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for each click, the user's earliest
    purchase at-or-after — the time-to-conversion query (how long
    from click to purchase), the direction ``join_asof_nearest``
    (backward, latest-at-or-before) doesn't cover. Same scalable
    recipe mirrored in time: union both sides with a tag, one window
    pass with ``first(ignorenulls)`` over the FOLLOWING frame —
    O(n log n) shuffle on user_id, no per-row subquery. Ties at the
    same timestamp sort the click FIRST (is_click DESC), so an
    equal-ts purchase falls inside the click's following frame —
    matching the SQL twin's ``>=``. The gap is emitted as exact
    integer seconds, flooring EACH side to whole seconds before
    subtracting (Spark unix_timestamp truncates per-value; the twin
    mirrors with floor(epoch(..)) per side — subtracting fractional
    epochs first would disagree whenever the sub-second parts
    straddle a whole second)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(1).alias("is_click"),
        F.lit(None).cast("timestamp").alias("p_ts"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("is_click"),
        F.col("ts").alias("p_ts"),
    )
    tagged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_click"))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    return (
        tagged.withColumn(
            "purchase_ts", F.first("p_ts", ignorenulls=True).over(w)
        )
        .where(F.col("is_click") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            "purchase_ts",
            (
                F.unix_timestamp("purchase_ts") - F.unix_timestamp("ts")
            ).alias("secs_to_purchase"),
        )
    )


_JOIN_ASOF_FWD_SQL = """
SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS ts,
       CAST(p_ts AS TIMESTAMP) AS purchase_ts,
       CAST(floor(epoch(p_ts)) AS BIGINT)
         - CAST(floor(epoch(CAST(c.ts AS TIMESTAMP))) AS BIGINT)
         AS secs_to_purchase
FROM (
  SELECT c.event_id, c.user_id, c.ts,
         (SELECT min(p.ts) FROM events p
          WHERE p.event_type = 'purchase'
            AND p.user_id = c.user_id
            AND p.ts >= c.ts) AS p_ts
  FROM events c
  WHERE c.event_type = 'click'
) c
"""


# ------------------------------------------------------------ aggregation


def agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: hash aggregate with partial+final combine."""
    li = load_table(spark, sf_dir, "lineitem")
    charge = _rev() * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            dsum(_rev(), 6).alias("sum_disc_price"),
            dsum(charge, 8).alias("sum_charge"),
            davg("l_quantity", 2).alias("avg_qty"),
            davg("l_extendedprice", 2).alias("avg_price"),
            davg("l_discount", 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_AGG_HASH_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 2)} AS sum_qty,
       {sql_dsum('l_extendedprice', 2)} AS sum_base_price,
       {sql_dsum(_SQL_REV, 6)} AS sum_disc_price,
       {sql_dsum(_SQL_REV + ' * (1 + l_tax)', 8)} AS sum_charge,
       {sql_davg('l_quantity', 2)} AS avg_qty,
       {sql_davg('l_extendedprice', 2)} AS avg_price,
       {sql_davg('l_discount', 2)} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch twin of agg_distinct, emitted as a
    hash-grade SCORECARD: per segment, the exact distinct count plus an
    integer ``within_5pct`` accuracy flag on the HLL++ estimate
    (rsd=0.01 -> the 5% gate carries ~5 sigma of margin). The raw
    estimate is engine-specific, but the HLL merge is
    order-independent, so the flag is partition-stable and the oracle
    asserts it — every registry key now carries a value-hash check
    (round-8 VERDICT #1).

    Production-vs-oracle split (round-9 VERDICT #6): the exact
    ``countDistinct`` column is the FIXTURE-SCALE anchor that makes
    this scorecard hash-checkable — it is also why this key bench-costs
    ~3x the bare sketch (BASELINE.md round-9 note). At corpus scale
    ship the HLL column alone; an exact distinct next to every sketch
    would defeat the sketch's reason to exist.

    Round-11 shape fix (guide §2.3, aggregate before the shuffle):
    the original ``countDistinct + approx_count_distinct`` over the
    joined fact rows forced Spark's two-level distinct rewrite, which
    materializes the rsd=0.01 HLL++ partial — 1,639 BIGINT register
    words, ~13 KB — for EVERY (segment, custkey) group and ships all
    of them through the first exchange (~130 MB at sf0.1 for a 150k-row
    input; plans/r11/agg_approx_distinct_before.txt operator (8)).
    Deduplicating the fact side to distinct custkeys FIRST (a narrow
    8-byte-key aggregate that partial-aggregates map-side) makes the
    segment-level aggregate compute ONE sketch per segment instead.
    Both output columns are provably unchanged: count(*) over the
    distinct keys IS the exact distinct count, and HLL register state
    is a function of the distinct hashed values only (duplicate
    insensitivity), so the estimate — and hence the flag — is
    bit-identical.

    INVARIANT this rewrite rests on (round-11 ADVICE): ``c_custkey``
    is UNIQUE in ``customer`` (TPC-H primary key). count(*) after the
    dk⋈customer join equals countDistinct(o_custkey) per segment only
    because each distinct o_custkey matches at most one customer row;
    a duplicated dimension key would double-count here where the old
    countDistinct formulation would not. The fixture generator emits
    customer keyed by c_custkey, and the oracle's own GROUP BY relies
    on the same PK, so the assumption is checked by parity — but it is
    an assumption, and it is now stated."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    dk = orders.select("o_custkey").distinct()
    g = (
        dk.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust_exact"),
            F.approx_count_distinct("o_custkey", rsd=0.01).alias("est"),
        )
    )
    return g.select(
        "c_mktsegment",
        "n_cust_exact",
        (
            F.abs(F.col("est") - F.col("n_cust_exact")) * 100
            <= F.col("n_cust_exact") * 5
        )
        .cast("int")
        .alias("within_5pct"),
    )


_AGG_APPROX_DISTINCT_SQL = """
SELECT c_mktsegment,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust_exact,
       CAST(1 AS INTEGER) AS within_5pct
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top order per customer via max_by (argmax without a self-join)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.expr(
            "max_by(o_orderkey, struct(o_totalprice, o_orderkey))"
        ).alias("best_orderkey"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


_AGG_MINMAX_BY_SQL = """
SELECT o_custkey, o_orderkey AS best_orderkey, max_price, min_price
FROM (
  SELECT o_custkey, o_orderkey,
         max(o_totalprice) OVER (PARTITION BY o_custkey) AS max_price,
         min(o_totalprice) OVER (PARTITION BY o_custkey) AS min_price,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
"""


# --------------------------------------------------- rollup / cube / sets


def grouping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum("c_acctbal", 2).alias("total_bal"),
        )
    )


_GROUPING_ROLLUP_SQL = f"""
SELECT r_name, n_name, count(*) AS n_cust,
       {sql_dsum('c_acctbal', 2)} AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


def grouping_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", 2).alias("total_price"),
        )
    )


_GROUPING_CUBE_SQL = f"""
SELECT c_mktsegment, o_orderpriority, count(*) AS n_orders,
       {sql_dsum('o_totalprice', 2)} AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE(c_mktsegment, o_orderpriority)
"""


def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL entry point: GROUPING SETS over registered temp views."""
    register_views(spark, sf_dir)
    # same text as the oracle, with Spark's STRING spelling of VARCHAR
    return spark.sql(_GROUPING_SETS_SQL.replace("VARCHAR", "STRING"))


_GROUPING_SETS_SQL = f"""
SELECT c_mktsegment, o_orderstatus, count(*) AS n_orders,
       {sql_dsum('o_totalprice', 2)} AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
"""


# ---------------------------------------------------------------- windows


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer; rank/dense_rank tie-stable by value."""
    orders = load_table(spark, sf_dir, "orders")
    w_rn = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    w_rk = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w_rn).alias("rn"),
            F.rank().over(w_rk).alias("rnk"),
            F.dense_rank().over(w_rk).alias("drnk"),
        )
        .where(F.col("rn") <= 3)
    )


_WINDOW_RANK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn,
       CAST(rnk AS INTEGER) AS rnk, CAST(drnk AS INTEGER) AS drnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
         dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk
  FROM orders
) WHERE rn <= 3
"""


def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        dec2double(
            F.sum(F.col("o_totalprice").cast("decimal(30,2)")).over(w)
        ).alias("running_spend"),
    )


_WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
         AS running_spend
FROM orders
"""


def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    nxt = F.lead("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), prev).alias("days_since_prev"),
        F.datediff(nxt, F.col("o_orderdate")).alias("days_until_next"),
    )


_WINDOW_LEAD_LAG_SQL = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
       CAST(date_diff('day',
            lag(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS INTEGER) AS days_since_prev,
       CAST(date_diff('day', o_orderdate,
            lead(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey))
            AS INTEGER) AS days_until_next
FROM orders
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing sum per user over events (RANGE frame on epoch µs)."""
    WEEK_US = 7 * 86_400 * 1_000_000
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-WEEK_US, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        dec2double(
            F.sum(F.col("value").cast("decimal(30,2)")).over(w)
        ).alias("trailing_7d"),
    )


_WINDOW_RANGE_FRAME_SQL = """
SELECT event_id, user_id,
       CAST(CAST(SUM(CAST(value AS DECIMAL(30,2))) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
         AS trailing_7d
FROM events
"""


# ----------------------------------------------------------- sort / top-k


def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders — Spark plans TakeOrderedAndProject (per-
    partition heap + driver merge), never a full sort at scale."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------- set ops


def _seg_a(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    return cust.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")


def _seg_b(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    return cust.where(F.col("c_acctbal") > 5000).select("c_custkey")


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _seg_a(spark, sf_dir).union(_seg_b(spark, sf_dir)).distinct()


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _seg_a(spark, sf_dir).intersect(_seg_b(spark, sf_dir))


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL: order rows per customer minus fulfilled ones."""
    orders = load_table(spark, sf_dir, "orders")
    all_keys = orders.select("o_custkey")
    fulfilled = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return all_keys.exceptAll(fulfilled)


_SET_SQLS = {
    "set_union": (
        "SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE' "
        "UNION SELECT c_custkey FROM customer WHERE c_acctbal > 5000"
    ),
    "set_intersect": (
        "SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE' "
        "INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000"
    ),
    "set_except": (
        "SELECT o_custkey FROM orders "
        "EXCEPT ALL "
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"
    ),
}


# -------------------------------------------------------- pivot / unpivot

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def pivot_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation pivoted over market segment (explicit value
    list — avoids the extra distinct-values job at scale)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(dsum("o_totalprice", 2))
    )


_PIVOT_SQL = "SELECT n_name, " + ", ".join(
    f"CAST(SUM(CAST(CASE WHEN c_mktsegment = '{s}' THEN o_totalprice END "
    f"AS DECIMAL(30,2))) AS DOUBLE) AS {s}"
    for s in _SEGMENTS
) + (
    " FROM orders JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
)


def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    wide = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_cust"),
            dsum("c_acctbal", 2).alias("total_bal"),
        )
    )
    return wide.unpivot(
        ids=["n_name"],
        values=["n_cust", "total_bal"],
        variableColumnName="metric",
        valueColumnName="value",
    )


_UNPIVOT_SQL = f"""
WITH wide AS (
  SELECT n_name, CAST(count(*) AS DOUBLE) AS n_cust,
         {sql_dsum('c_acctbal', 2)} AS total_bal
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, 'n_cust' AS metric, n_cust AS value FROM wide
UNION ALL
SELECT n_name, 'total_bal' AS metric, total_bal AS value FROM wide
"""


# -------------------------------------------------------------- subqueries


def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL entry: IN-subquery (Catalyst decorrelates to a semi-join)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        """
    )


_SUBQUERY_IN_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""

_SUBQUERY_SCALAR_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) / count(*)
  FROM orders)
"""


def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SUBQUERY_SCALAR_SQL)


_LATERAL_TOPN_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 3
) t
"""


def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — top-3 orders per customer as a
    per-row dependent join, the IDENTICAL SQL text on Spark 4 and the
    DuckDB oracle (the declarative surface next to the
    window-row_number formulation in ``sort_limit_topk`` /
    ``agg_minmax_by``). Catalyst DECORRELATES the lateral rather than
    executing a per-row nested loop — the executed plan is a
    ``WindowGroupLimit`` (rank pushed below the sort, partial top-3
    per map task) + one shuffle of orders on the correlation key +
    a broadcast hash join of the customer side — so the lateral form
    costs the same as the hand-written window at 100 TB while reading
    as the per-entity lookup a graph/entity API exposes ("this
    customer's top N")."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_TOPN_SQL)


def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join of two TINY dims (region x segment grid) —
    the only place a cross join belongs at scale; Spark plans it as a
    broadcast nested loop."""
    region = load_table(spark, sf_dir, "region")
    segs = (
        load_table(spark, sf_dir, "customer")
        .select("c_mktsegment")
        .distinct()
    )
    return region.crossJoin(segs).select("r_name", "c_mktsegment")


_JOIN_CROSS_SQL = """
SELECT r_name, c_mktsegment
FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer)
"""


def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal value per group (most frequent o_orderpriority per
    segment), ties to the lexicographically smallest value."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    counts = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("cnt").desc(), "o_orderpriority"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("mode_priority"),
            "cnt",
        )
    )


_AGG_MODE_SQL = """
SELECT c_mktsegment, o_orderpriority AS mode_priority, cnt FROM (
  SELECT c_mktsegment, o_orderpriority, count(*) AS cnt,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY count(*) DESC, o_orderpriority) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, o_orderpriority
) WHERE rn = 1
"""


def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: sorted distinct nation list per
    segment (collect_set -> array_sort -> join keeps it deterministic
    regardless of arrival order)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("n_name"))).alias(
                "nations"
            ),
            F.countDistinct("n_name").alias("n_nations"),
        )
    )


_AGG_LISTAGG_SQL = """
SELECT c_mktsegment,
       array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations,
       count(DISTINCT n_name) AS n_nations
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY c_mktsegment
"""


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling aggregate over lineitem: row/distinct/null counts,
    ranges, exact mean — the ingest-time quality gate a 100 TB pipeline
    runs before accepting a batch.

    The two exact distinct counts are SPLIT into their own pruned
    scan+distinct+count branches and broadcast back onto the scalar
    aggregate, instead of one agg with multiple countDistinct: multiple
    distinct aggregates force Catalyst into an Expand (3x every row
    through the shuffle); three branches each scan only the columns
    they need (1-column parquet scans) and run in parallel — measured
    2.5x faster at sf0.1, and the gap widens with row width at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_returnflag").isNull().cast("long")).alias("null_returnflag"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        davg("l_discount", 2).alias("avg_discount"),
    )
    n_orders = (
        li.select("l_orderkey").distinct().agg(F.count(F.lit(1)).alias("n_orders"))
    )
    n_parts = (
        li.select("l_partkey").distinct().agg(F.count(F.lit(1)).alias("n_parts"))
    )
    return (
        base.crossJoin(F.broadcast(n_orders))
        .crossJoin(F.broadcast(n_parts))
        .select(
            "n_rows",
            "n_orders",
            "n_parts",
            "null_returnflag",
            "min_shipdate",
            "max_shipdate",
            "min_price",
            "max_price",
            "avg_discount",
        )
    )


_TABLE_PROFILE_SQL = f"""
SELECT count(*) AS n_rows,
       count(DISTINCT l_orderkey) AS n_orders,
       count(DISTINCT l_partkey) AS n_parts,
       CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_returnflag,
       CAST(min(l_shipdate) AS TIMESTAMP) AS min_shipdate,
       CAST(max(l_shipdate) AS TIMESTAMP) AS max_shipdate,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price,
       {sql_davg('l_discount', 2)} AS avg_discount
FROM lineitem
"""


def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manually salted join — the mitigation for a hot key the AQE skew
    handler can't split (e.g. a single key holding >1 partition's worth
    of rows on the BUILD side too).

    Fact rows get a deterministic salt in [0, 8); the dim side is
    replicated 8x with every salt value; the join key becomes
    (key, salt), spreading one hot key over 8 tasks. The aggregate
    result is EXACTLY the plain join's (checked by the oracle) — salting
    changes the partitioning, never the semantics.
    """
    N_SALT = 8
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    fact = li.withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALT))
    )
    dim = orders.crossJoin(
        spark.range(N_SALT).select(F.col("id").alias("salt"))
    )
    return (
        fact.join(
            dim,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (fact.salt == dim.salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(_rev(), 6).alias("revenue"),
        )
    )


_JOIN_SALTED_SQL = f"""
SELECT o_orderpriority, count(*) AS n_items, {sql_dsum(_SQL_REV, 6)} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# ------------------------------------------------- distribution windows


def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w_tile = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_val = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w_tile).alias("quartile"),
        F.percent_rank().over(w_val).alias("prnk"),
        F.cume_dist().over(w_val).alias("cdist"),
    )


_WINDOW_NTILE_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(ntile(4) OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice, o_orderkey) AS INTEGER)
         AS quartile,
       percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice)
         AS prnk,
       cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS cdist
FROM orders
"""


def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


_WINDOW_FIRST_LAST_SQL = """
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey) OVER w AS last_order,
       nth_value(o_orderkey, 2) OVER w AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# ------------------------------------------- moments / order statistics


def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / correlation from EXACT decimal component sums
    (the built-in stddev/corr aggregate in each engine accumulates
    doubles in its own order — formula-from-exact-sums is the only
    bit-stable cross-engine path)."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice", 2).alias("s_y"),
        dsum(F.col("l_extendedprice") * F.col("l_extendedprice"), 6).alias("s_yy"),
        dsum("l_quantity", 2).alias("s_x"),
        dsum(F.col("l_quantity") * F.col("l_quantity"), 6).alias("s_xx"),
        dsum(F.col("l_quantity") * F.col("l_extendedprice"), 6).alias("s_xy"),
    )
    n = F.col("n").cast("double")
    var_y = F.col("s_yy") / n - (F.col("s_y") / n) * (F.col("s_y") / n)
    cov = F.col("s_xy") / n - (F.col("s_x") / n) * (F.col("s_y") / n)
    var_x = F.col("s_xx") / n - (F.col("s_x") / n) * (F.col("s_x") / n)
    return agg.select(
        "l_returnflag",
        "n",
        (F.col("s_y") / n).alias("mean_price"),
        var_y.alias("var_price"),
        F.sqrt(var_y).alias("std_price"),
        (cov / (F.sqrt(var_x) * F.sqrt(var_y))).alias("corr_qty_price"),
    )


_AGG_MOMENTS_SQL = f"""
WITH agg AS (
  SELECT l_returnflag, count(*) AS n,
         {sql_dsum('l_extendedprice', 2)} AS s_y,
         {sql_dsum('l_extendedprice * l_extendedprice', 6)} AS s_yy,
         {sql_dsum('l_quantity', 2)} AS s_x,
         {sql_dsum('l_quantity * l_quantity', 6)} AS s_xx,
         {sql_dsum('l_quantity * l_extendedprice', 6)} AS s_xy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       s_y / n AS mean_price,
       s_yy / n - (s_y / n) * (s_y / n) AS var_price,
       sqrt(s_yy / n - (s_y / n) * (s_y / n)) AS std_price,
       (s_xy / n - (s_x / n) * (s_y / n))
         / (sqrt(s_xx / n - (s_x / n) * (s_x / n))
            * sqrt(s_yy / n - (s_y / n) * (s_y / n))) AS corr_qty_price
FROM agg
"""


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median + discrete p90 per event_type via explicit order
    statistics (rank formulas, not engine percentile builtins, so both
    engines pick the SAME elements)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    lo = (F.col("n") + 1).cast("long") / F.lit(2)
    med_rows = ranked.where(
        (F.col("rn") == F.floor(lo)) | (F.col("rn") == F.ceil(lo))
    )
    median = med_rows.groupBy("event_type").agg(
        ((F.min("value") + F.max("value")) / 2).alias("median_value")
    )
    p90 = ranked.where(
        F.col("rn") == F.ceil(F.col("n").cast("double") * 0.9)
    ).select("event_type", F.col("value").alias("p90_value"))
    counts = ranked.groupBy("event_type").agg(F.max("n").alias("n"))
    return counts.join(median, "event_type").join(p90, "event_type")


_AGG_PERCENTILES_SQL = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
median AS (
  SELECT event_type, (min(value) + max(value)) / 2 AS median_value
  FROM ranked
  WHERE rn = floor((n + 1) / 2.0) OR rn = ceil((n + 1) / 2.0)
  GROUP BY event_type
),
p90 AS (
  SELECT event_type, value AS p90_value FROM ranked
  WHERE rn = ceil(n * 0.9)
),
counts AS (SELECT event_type, max(n) AS n FROM ranked GROUP BY event_type)
SELECT counts.event_type, n, median_value, p90_value
FROM counts JOIN median USING (event_type) JOIN p90 USING (event_type)
"""


# ---------------------------------------------------------------- registry

QUERIES = {
    "flagship": flagship,
    "filter_project": filter_project,
    "join_inner_hash": join_inner_hash,
    "join_broadcast": join_broadcast,
    "join_left": join_left,
    "join_full": join_full,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_theta_range": join_theta_range,
    "join_asof_nearest": join_asof_nearest,
    "join_asof_forward": join_asof_forward,
    "join_salted_skew": join_salted_skew,
    "table_profile": table_profile,
    "agg_mode": agg_mode,
    "agg_listagg": agg_listagg,
    "join_cross_small": join_cross_small,
    "agg_hash": agg_hash,
    "agg_distinct": agg_distinct,
    "agg_approx_distinct": agg_approx_distinct,
    "agg_minmax_by": agg_minmax_by,
    "grouping_rollup": grouping_rollup,
    "grouping_cube": grouping_cube,
    "grouping_sets": grouping_sets,
    "window_rank": window_rank,
    "window_ntile": window_ntile,
    "window_first_last": window_first_last,
    "agg_moments": agg_moments,
    "agg_percentiles": agg_percentiles,
    "window_running": window_running,
    "window_lead_lag": window_lead_lag,
    "window_range_frame": window_range_frame,
    "sort_limit_topk": sort_limit_topk,
    "set_union": set_union,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "pivot_segment": pivot_segment,
    "unpivot_melt": unpivot_melt,
    "subquery_in": subquery_in,
    "subquery_scalar": subquery_scalar,
    "join_lateral_topn": join_lateral_topn,
}

ORACLES = {
    "flagship": _FLAGSHIP_SQL,
    "filter_project": _FILTER_PROJECT_SQL,
    "join_inner_hash": (
        "SELECT o_orderkey, o_totalprice, c_name, c_mktsegment "
        "FROM orders JOIN customer ON o_custkey = c_custkey"
    ),
    "join_broadcast": (
        "SELECT p_brand, count(*) AS n_items, "
        + sql_dsum("l_extendedprice", 2)
        + " AS brand_revenue FROM lineitem "
        "JOIN part ON l_partkey = p_partkey GROUP BY p_brand"
    ),
    "join_left": (
        "SELECT c_custkey, c_name, o_orderkey, o_totalprice "
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey"
    ),
    "join_full": (
        "SELECT COALESCE(c.nk, s.nk) AS nationkey, n_cust, n_supp FROM "
        "(SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c "
        "FULL JOIN "
        "(SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) s "
        "ON c.nk = s.nk"
    ),
    "join_semi": (
        "SELECT c_custkey, c_name FROM customer c "
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ),
    "join_anti": (
        "SELECT c_custkey, c_name FROM customer c "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ),
    "join_theta_range": _JOIN_THETA_RANGE_SQL,
    "join_asof_nearest": _JOIN_ASOF_SQL,
    "join_asof_forward": _JOIN_ASOF_FWD_SQL,
    "join_salted_skew": _JOIN_SALTED_SQL,
    "table_profile": _TABLE_PROFILE_SQL,
    "agg_mode": _AGG_MODE_SQL,
    "agg_listagg": _AGG_LISTAGG_SQL,
    "join_cross_small": _JOIN_CROSS_SQL,
    "agg_hash": _AGG_HASH_SQL,
    "agg_distinct": (
        "SELECT c_mktsegment, count(DISTINCT o_custkey) AS n_cust, "
        "count(*) AS n_orders FROM orders "
        "JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"
    ),
    "agg_approx_distinct": _AGG_APPROX_DISTINCT_SQL,
    "agg_minmax_by": _AGG_MINMAX_BY_SQL,
    "grouping_rollup": _GROUPING_ROLLUP_SQL,
    "grouping_cube": _GROUPING_CUBE_SQL,
    "grouping_sets": _GROUPING_SETS_SQL,
    "window_rank": _WINDOW_RANK_SQL,
    "window_ntile": _WINDOW_NTILE_SQL,
    "window_first_last": _WINDOW_FIRST_LAST_SQL,
    "agg_moments": _AGG_MOMENTS_SQL,
    "agg_percentiles": _AGG_PERCENTILES_SQL,
    "window_running": _WINDOW_RUNNING_SQL,
    "window_lead_lag": _WINDOW_LEAD_LAG_SQL,
    "window_range_frame": _WINDOW_RANGE_FRAME_SQL,
    "sort_limit_topk": (
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ),
    **_SET_SQLS,
    "pivot_segment": _PIVOT_SQL,
    "unpivot_melt": _UNPIVOT_SQL,
    "subquery_in": _SUBQUERY_IN_SQL,
    "subquery_scalar": _SUBQUERY_SCALAR_SQL,
    "join_lateral_topn": _LATERAL_TOPN_SQL,
}
