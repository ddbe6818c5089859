"""UDF/UDAF/UDTF surface (SURVEY.md §2-H).

These demonstrate the Python extension points and their cost model:
- row-at-a-time Python UDF: ~10-100x slower than built-ins — shown with
  a SQL-expressible twin so the oracle can verify it; never use in a
  100 TB hot path when an expression exists.
- pandas_udf: Arrow-batched, vectorized — the acceptable Python path.
- applyInPandas: per-group pandas aggregation (median family — not
  expressible as a built-in distributed agg).
- Python UDTF (Spark 4): table function exploding JSON props.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from graph_database_akkatyped_spark.catalog import load_table, register_views
from graph_database_akkatyped_spark.numerics import dsum, sql_dsum


def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Python UDF: slug of the customer name. Deliberately
    SQL-twinnable so correctness (not just execution) is checked."""

    @udf(returnType="string")
    def slugify(name: str) -> str:
        return name.lower().replace("#", "-").replace(" ", "_")

    cust = load_table(spark, sf_dir, "customer")
    return cust.select("c_custkey", slugify(F.col("c_name")).alias("slug"))


_UDF_PYTHON_SQL = """
SELECT c_custkey, replace(replace(lower(c_name), '#', '-'), ' ', '_') AS slug
FROM customer
"""


def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized z-score of event value vs global moments (moments
    computed exactly via decimal sums, so results are deterministic)."""

    @pandas_udf("double")
    def zscore(v: pd.Series, mean: pd.Series, std: pd.Series) -> pd.Series:
        return (v - mean) / std

    e = load_table(spark, sf_dir, "events")
    moments = e.agg(
        dsum("value", 2).alias("s1"),
        dsum(F.col("value") * F.col("value"), 6).alias("s2"),
        F.count(F.lit(1)).cast("double").alias("n"),
    ).select(
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("std"),
    )
    return e.crossJoin(F.broadcast(moments)).select(
        "event_id",
        zscore(F.col("value"), F.col("mean"), F.col("std")).alias("z"),
    )


_UDF_PANDAS_SQL = f"""
WITH m AS (
  SELECT {sql_dsum('value', 2)} AS s1,
         {sql_dsum('value * value', 6)} AS s2,
         CAST(count(*) AS DOUBLE) AS n
  FROM events
),
mm AS (
  SELECT s1 / n AS mean, sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std FROM m
)
SELECT event_id, (value - mean) / std AS z FROM events CROSS JOIN mm
"""


def udaf_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event_type via grouped pandas —
    a rank statistic no built-in distributed aggregate expresses."""

    def mad(pdf: pd.DataFrame) -> pd.DataFrame:
        med = pdf["value"].median()
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "median_value": [med],
                "mad": [(pdf["value"] - med).abs().median()],
                "n": [len(pdf)],
            }
        )

    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    return e.groupBy("event_type").applyInPandas(
        mad, schema="event_type string, median_value double, mad double, n long"
    )


_UDAF_SQL = """
WITH med AS (
  SELECT event_type, median(value) AS m FROM events GROUP BY event_type
)
SELECT e.event_type, m.m AS median_value,
       median(abs(e.value - m.m)) AS mad, count(*) AS n
FROM events e JOIN med m ON m.event_type = e.event_type
GROUP BY e.event_type, m.m
"""


def udf_mapinarrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: RecordBatch-level transform with zero pandas
    conversion — the lowest-overhead Python batch path (what the
    multimodal decoders would use for raw buffers)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def batch_len(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [b.column("doc_id"), pc.utf8_length(b.column("text"))],
                ["doc_id", "n_chars_arrow"],
            )

    return docs.mapInArrow(batch_len, "doc_id long, n_chars_arrow int")


_UDF_MAPINARROW_SQL = """
SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars_arrow FROM documents
"""


def udaf_cogrouped_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: the as-of join done as per-user
    ``pandas.merge_asof`` over two cogrouped tables — same semantics
    (and same oracle) as the pure-Spark window formulation in
    ``relational.join_asof_nearest``, demonstrating the per-key
    two-sided pandas extension point.

    Scoped to a deterministic quarter of the users (`user_id % 4 == 0`):
    the pandas cogroup pays per-group Python/Arrow overhead by design
    (that's the demonstrated cost model), and the full-corpus as-of join
    already runs pure-Spark as ``join_asof_nearest`` — re-running the
    slow path over every user spent 11% of the round-1 bench budget on
    a duplicate answer."""
    e = load_table(spark, sf_dir, "events")
    cohort = (F.col("user_id") % 4) == 0
    clicks = e.where((F.col("event_type") == "click") & cohort).select(
        "user_id", "event_id", "ts"
    )
    signups = e.where((F.col("event_type") == "signup") & cohort).select(
        "user_id", F.col("ts").alias("s_ts")
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "ts", "signup_ts"]
            )
        left = left.sort_values("ts")
        right = right.sort_values("s_ts")
        out = pd.merge_asof(
            left, right[["s_ts"]], left_on="ts", right_on="s_ts",
            direction="backward",
        )
        return pd.DataFrame(
            {
                "event_id": out["event_id"],
                "user_id": out["user_id"],
                "ts": out["ts"],
                "signup_ts": out["s_ts"],
            }
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(signups.groupBy("user_id"))
        .applyInPandas(
            lambda left, right: merge(left, right),
            schema="event_id long, user_id long, ts timestamp, signup_ts timestamp",
        )
    )


# same shape as the join_asof_nearest oracle, cohort-scoped to match
_UDAF_COGROUP_SQL = """
SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS ts,
       CAST((SELECT max(s.ts) FROM events s
             WHERE s.event_type = 'signup'
               AND s.user_id = c.user_id
               AND s.ts <= c.ts) AS TIMESTAMP) AS signup_ts
FROM events c
WHERE c.event_type = 'click' AND c.user_id % 4 = 0
"""


@udtf(returnType="k string, v string")
class PropsExploder:
    """Python UDTF: one output row per JSON property (Spark 4)."""

    def eval(self, props: str):
        import json

        try:
            for k, v in json.loads(props).items():
                yield (str(k), str(v))
        except (ValueError, TypeError):
            return


def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.udtf.register("props_exploder", PropsExploder)
    return spark.sql(
        """
        SELECT e.event_id, t.k, t.v
        FROM events e, LATERAL props_exploder(e.props) t
        """
    )


_UDTF_SQL = """
SELECT event_id, 'k' AS k, json_extract_string(props, '$.k') AS v FROM events
"""


QUERIES = {
    "udf_python": udf_python,
    "udf_pandas": udf_pandas,
    "udaf_applyinpandas": udaf_applyinpandas,
    "udaf_cogrouped_asof": udaf_cogrouped_asof,
    "udf_mapinarrow": udf_mapinarrow,
    "udtf_python": udtf_python,
}

ORACLES = {
    "udf_python": _UDF_PYTHON_SQL,
    "udf_pandas": _UDF_PANDAS_SQL,
    "udaf_applyinpandas": _UDAF_SQL,
    "udaf_cogrouped_asof": _UDAF_COGROUP_SQL,
    "udf_mapinarrow": _UDF_MAPINARROW_SQL,
    "udtf_python": _UDTF_SQL,
}
