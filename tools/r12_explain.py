"""Capture ``explain('formatted')`` for a set of registered keys.

Usage: python tools/r12_explain.py <suffix> key [key ...]

Writes ``plans/r12/<key>_<suffix>.txt`` (suffix is ``before`` /
``after``) so optimization-round plan claims are checkable without
running Spark. Memoized frames are cleared first so the captured plan
is the true build plan, not a cache fetch.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from graph_database_akkatyped_spark.caching import clear_frame_cache
from graph_database_akkatyped_spark.registry import collect
from graph_database_akkatyped_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(_REPO, "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="r12_explain")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = collect()
    for key in keys:
        clear_frame_cache(sf_dir)
        df = queries[key](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
