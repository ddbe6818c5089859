"""Benchmark harness (driver contract + BASELINE.md protocol).

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric", "value", "unit", "queries": {...}, "sf"}``.

Execution is a ``noop``-format write: the full plan runs on executors
(no column pruning shortcut like ``count()``, no driver collect skew).
Per query: 1 warm-up, then median of ``$SPARK_GRAFT_BENCH_RUNS`` (default
2) timed runs.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from graph_database_akkatyped_spark.registry import collect
from graph_database_akkatyped_spark.session import get_spark


def _run_once(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = collect()

    timings: dict[str, float] = {}
    for key in sorted(queries):
        fn = queries[key]
        try:
            _run_once(fn(spark, sf_dir))  # warm-up (JIT, broadcast, FS cache)
            timings[key] = round(
                statistics.median(_run_once(fn(spark, sf_dir)) for _ in range(runs)), 4
            )
        except Exception as exc:  # noqa: BLE001 - record, keep benching
            print(f"bench: {key} failed: {exc}", file=sys.stderr)
            timings[key] = -1.0

    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0
    total = round(sum(v for v in timings.values() if v >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
