"""Spot oracle-parity check for a subset of keys — the per-key twin of
tools/oracle_parity_sweep.py, for iterating on new operators without
paying the full-registry sweep.

Usage: python tools/parity_keys.py KEY [KEY ...] [--sf SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_REPO, os.path.join(_REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

from graph_database_akkatyped_spark.registry import collect
from graph_database_akkatyped_spark.session import get_spark
from tests.conftest import make_duck
from tests.oracle_utils import compare


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    spark = get_spark(app_name="parity_keys")
    spark.sparkContext.setLogLevel("ERROR")
    duck = make_duck(sf_dir)
    queries, oracles = collect()
    bad = 0
    for key in args:
        if key not in queries:
            print(f"{key}: NOT REGISTERED")
            bad += 1
            continue
        t0 = time.perf_counter()
        try:
            spark_pd = queries[key](spark, sf_dir).toPandas()
            if key not in oracles:
                assert len(spark_pd.columns) > 0
                print(
                    f"{key}: rows-only ok ({len(spark_pd)} rows, "
                    f"{time.perf_counter() - t0:.2f}s)"
                )
                continue
            problems = compare(spark_pd, duck.execute(oracles[key]).fetchdf())
        except Exception as exc:  # noqa: BLE001
            problems = [f"EXCEPTION: {exc}"]
        if problems:
            bad += 1
            print(f"{key}: MISMATCH {problems[0][:500]}")
        else:
            print(
                f"{key}: ok ({len(spark_pd)} rows, "
                f"{time.perf_counter() - t0:.2f}s)"
            )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
