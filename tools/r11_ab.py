"""Same-session A/B harness for the round-11 optimization pass.

For each key given: verify oracle parity at sf0.001 / sf0.01 / sf0.1
(exact compare used by the driver-mirror tests), then time the key at
sf0.1 (median of N warm noop-sink runs, frame cache cleared before the
parity pass so memoized builds are honest).

Usage: python tools/r11_ab.py [-n RUNS] key [key ...]

The environment this round measures ~2.5x slower on shuffle paths than
the round-10 close (BENCH_R11_PRE.json canary_drift 2.576), so every
optimization claim is same-session before/after, never vs committed
artifacts.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_REPO, os.path.join(_REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

from graph_database_akkatyped_spark.caching import clear_frame_cache
from graph_database_akkatyped_spark.registry import collect
from graph_database_akkatyped_spark.session import get_spark
from tests.conftest import make_duck
from tests.oracle_utils import compare

_SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)


def main() -> None:
    args = sys.argv[1:]
    runs = 5
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    keys = args
    spark = get_spark(app_name="r11_ab")
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = collect()
    ducks = {d: make_duck(d) for d in _SF_DIRS}
    bad = 0
    for key in keys:
        fn = queries[key]
        for d in _SF_DIRS:
            clear_frame_cache(d)
            try:
                spark_pd = fn(spark, d).toPandas()
                if key in oracles:
                    problems = compare(
                        spark_pd, ducks[d].execute(oracles[key]).fetchdf()
                    )
                else:
                    problems = [] if len(spark_pd.columns) > 0 else ["empty"]
            except Exception as exc:  # noqa: BLE001
                problems = [f"EXCEPTION: {exc}"]
            if problems:
                bad += 1
                print(f"PARITY FAIL {key} @ {d}: {problems[0][:400]}")
            else:
                print(f"parity ok {key} @ {d} ({len(spark_pd)} rows)")
        sf = _SF_DIRS[-1]
        df = fn(spark, sf)
        df.write.mode("overwrite").format("noop").save()  # warm-up
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
        print(
            f"TIME {key}: median {statistics.median(samples):.3f}s "
            f"runs {[round(s, 3) for s in samples]}"
        )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
