"""Oracle-parity sweep at an arbitrary scale factor — the sf0.1 twin of
tests/test_oracle_parity.py (which the driver mirrors at sf0.01).

Runs every registered query against its DuckDB oracle at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) and prints one
line per mismatch plus a final tally. Keys without an oracle get the
driver's weaker rows-only check (runs clean, ≥1 column). Exit code 1 on
any mismatch so the sweep is CI-able.

Usage: python tools/oracle_parity_sweep.py [sf_dir]
Results recorded in BASELINE.md ("Oracle parity beyond the gate").
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
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    spark = get_spark(app_name="oracle_parity_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    duck = make_duck(sf_dir)
    queries, oracles = collect()

    t0 = time.perf_counter()
    n_sql = n_rows_only = n_bad = 0
    for key in sorted(queries):
        try:
            spark_pd = queries[key](spark, sf_dir).toPandas()
            if key not in oracles:
                assert len(spark_pd.columns) > 0
                n_rows_only += 1
                continue
            problems = compare(spark_pd, duck.execute(oracles[key]).fetchdf())
        except Exception as exc:  # noqa: BLE001 - tally and continue
            problems = [f"EXCEPTION: {exc}"]
        if problems:
            n_bad += 1
            print(f"MISMATCH {key}: {problems[0][:500]}")
        else:
            n_sql += 1
    print(
        f"parity@{sf_dir}: {n_sql} SQL-hash ok, {n_rows_only} rows-only ok, "
        f"{n_bad} mismatched, {time.perf_counter() - t0:.0f}s"
    )
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
