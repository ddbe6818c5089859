"""Parquet scan/sink operators (SURVEY.md §2-A).

Reference analog [R]: the Akka journal/snapshot store is the only
"source"; here the columnar parquet scan is the front door and Catalyst
pushes filters/projections into the parquet reader (row-group and page
skipping) — verify with ``.explain``: ``PushedFilters`` + ``ReadSchema``.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from graph_database_akkatyped_spark.catalog import load_table


def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of one fixture table, all columns."""
    return load_table(spark, sf_dir, "nation")


def scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan with column pruning + predicate pushdown.

    The physical plan must read only 3 columns (``ReadSchema``) and push
    ``l_shipdate > 2000-01-01`` into the parquet scan (``PushedFilters``)
    — at 100 TB that is the difference between reading 3% and 100% of
    the table bytes.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") > F.lit("2000-01-01").cast("timestamp"))
        .select("l_orderkey", "l_partkey", "l_extendedprice")
    )


def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write results partitioned by a key column, read them back.

    Partitioned layout is the 100 TB story: downstream queries with a
    ``l_returnflag`` predicate prune entire directories. rows-only check.
    """
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    out = tempfile.mkdtemp(prefix="spark_graft_sink_")
    agg.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out)
    # partition column comes back as the last column; normalize order/types
    return back.select(
        F.col("l_returnflag").cast("string"),
        F.col("l_linestatus"),
        F.col("cnt"),
    )


def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source: write a table as CSV, read it back with an
    explicit schema (never infer in production — schema drift at 100 TB
    is silent data corruption). Oracle-checked against the original."""
    nation = load_table(spark, sf_dir, "nation")
    out = tempfile.mkdtemp(prefix="spark_graft_csv_")
    nation.write.mode("overwrite").option("header", True).csv(out)
    return spark.read.schema(nation.schema).option("header", True).csv(out)


def sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source with explicit schema on re-read."""
    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="spark_graft_json_")
    docs.write.mode("overwrite").json(out)
    return spark.read.schema(docs.schema).json(out)


def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source (the other columnar format Spark ships a
    native vectorized reader for). DuckDB cannot read ORC, so the
    oracle checks the roundtrip against the ORIGIN table — byte-exact
    values surviving the format hop is precisely the claim."""
    supplier = load_table(spark, sf_dir, "supplier")
    out = tempfile.mkdtemp(prefix="spark_graft_orc_")
    supplier.write.mode("overwrite").orc(out)
    return spark.read.schema(supplier.schema).orc(out)


def sink_partitioned_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned write + partition-PRUNED read as a first-class
    operator: orders laid out by o_orderpriority, then one partition
    read back with a key predicate. At 100 TB the predicate prunes
    whole directories (PartitionFilters, asserted in
    tests/test_plans.py) — the scan never touches the other partitions'
    bytes."""
    orders = load_table(spark, sf_dir, "orders")
    out = tempfile.mkdtemp(prefix="spark_graft_part_")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    back = spark.read.parquet(out).where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return back.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderpriority").cast("string").alias("o_orderpriority"),
        "o_totalprice",
    )


def write_bucketed(
    df, table: str, key: str, buckets: int = 8, sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist a table bucketed (and sorted) by its join key.

    Bucketing is the 100 TB co-location story: two tables bucketed on
    the same key by the same bucket count join WITHOUT an Exchange —
    the shuffle is paid once at write time instead of on every query.
    Proven by tests/test_bucketing.py (plan contains no Exchange).

    ``path`` makes the table EXTERNAL (data under the given dir) so a
    vanilla driver session never writes a ./spark-warehouse into the
    working directory."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join as a first-class operator: orders and
    customer are both written bucketed (and sorted) on the customer
    key, then joined WITHOUT a query-time shuffle — the write-time
    shuffle is paid once and every subsequent join on that key reads
    co-located buckets (SortMergeJoin with zero Exchange below it;
    asserted in tests/test_round8b.py). THE layout decision for a
    100 TB fact table that is joined on the same key by every
    dashboard query.

    The ``merge`` hint pins the strategy so the demonstration doesn't
    silently degrade to a broadcast join on small fixtures. Output is
    the per-segment order count + exact-decimal total price (the only
    post-join Exchange is the tiny aggregate)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    tag = "".join(c if c.isalnum() else "_" for c in sf_dir)
    t_orders, t_cust = f"orders_bkt{tag}", f"customer_bkt{tag}"
    # Rebuild gate covers BOTH tables AND both backing dirs: a failure
    # between the two writes, or a clear_frame_cache() that rmtree'd
    # the layout dirs under a still-live catalog, must trigger a full
    # rebuild — gating on t_orders alone left the pair half-built
    # forever (round-8 ADVICE parquet.py:149). Customer is written
    # first and orders LAST so the last-written table doubles as the
    # completion marker; the data dirs are registered in the shared
    # layout-dir cache so eviction cleans them like every other sink.
    from graph_database_akkatyped_spark import caching

    k_orders, k_cust = ("bkt_orders", sf_dir), ("bkt_customer", sf_dir)
    fresh = (
        spark.catalog.tableExists(t_orders)
        and spark.catalog.tableExists(t_cust)
        and all(
            (d := caching._LAYOUT_DIRS.get(k)) is not None
            and os.path.isdir(d)
            for k in (k_orders, k_cust)
        )
    )
    if not fresh:
        for t in (t_orders, t_cust):
            spark.sql(f"DROP TABLE IF EXISTS `{t}`")
        for k in (k_orders, k_cust):
            old = caching._LAYOUT_DIRS.pop(k, None)
            if old is not None:
                shutil.rmtree(old, ignore_errors=True)
        d_cust = tempfile.mkdtemp(prefix="spark_graft_bkt_c_")
        caching._LAYOUT_DIRS[k_cust] = d_cust
        write_bucketed(
            cust.withColumnRenamed("c_custkey", "o_custkey"),
            t_cust, "o_custkey", path=d_cust,
        )
        d_orders = tempfile.mkdtemp(prefix="spark_graft_bkt_o_")
        caching._LAYOUT_DIRS[k_orders] = d_orders
        write_bucketed(orders, t_orders, "o_custkey", path=d_orders)
    from graph_database_akkatyped_spark.numerics import dsum

    j = spark.table(t_orders).hint("merge").join(
        spark.table(t_cust), "o_custkey"
    )
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", 2).alias("total_price"),
    )


QUERIES = {
    "scan_parquet": scan_parquet,
    "scan_pruned": scan_pruned,
    "sink_parquet": sink_parquet,
    "sink_csv_roundtrip": sink_csv_roundtrip,
    "sink_json_roundtrip": sink_json_roundtrip,
    "sink_orc_roundtrip": sink_orc_roundtrip,
    "sink_partitioned_pruned": sink_partitioned_pruned,
    "sink_bucketed_join": sink_bucketed_join,
}

ORACLES = {
    "scan_parquet": "SELECT * FROM nation",
    "scan_pruned": (
        "SELECT l_orderkey, l_partkey, l_extendedprice FROM lineitem "
        "WHERE l_shipdate > TIMESTAMP '2000-01-01'"
    ),
    "sink_parquet": (
        "SELECT l_returnflag, l_linestatus, count(*) AS cnt "
        "FROM lineitem GROUP BY 1, 2"
    ),
    "sink_csv_roundtrip": "SELECT * FROM nation",
    "sink_json_roundtrip": "SELECT * FROM documents",
    "sink_orc_roundtrip": "SELECT * FROM supplier",
    "sink_partitioned_pruned": (
        "SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice "
        "FROM orders WHERE o_orderpriority = '1-URGENT'"
    ),
    "sink_bucketed_join": (
        "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders, "
        "CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS VARCHAR) "
        "AS DOUBLE) AS total_price "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_mktsegment"
    ),
}
