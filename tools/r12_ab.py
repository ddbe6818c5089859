"""Timing-only paired A/B harness for the round-12 optimization pass.

Times each key at sf0.1 with the bench's noop-sink action, in either
regime:

- warm (default): clear the frame cache once per key, one warm-up run
  (memoized frames materialize there), then ``-n`` timed runs, median —
  the bench.py warm protocol.
- ``--cold``: clear the frame cache before EVERY timed run and time
  plan construction + the noop write together — the bench.py cold
  protocol (memoized kernels pay their real build).

Run it alternately from the before-tree worktree and the repo HEAD
(the package resolves relative to this file, so each tree times its
own code); include the three canary keys in every pass so inter-JVM
drift between the paired runs is visible in the output itself.

Usage: python tools/r12_ab.py [--cold] [-n RUNS] key [key ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from graph_database_akkatyped_spark.caching import clear_frame_cache
from graph_database_akkatyped_spark.registry import collect
from graph_database_akkatyped_spark.session import get_spark

_SF = "/root/testdata/sf0.1"


def main() -> None:
    args = sys.argv[1:]
    cold = "--cold" in args
    if cold:
        args.remove("--cold")
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    spark = get_spark(app_name="r12_ab")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = collect()
    print(f"# tree={_REPO} regime={'cold' if cold else 'warm'} runs={runs}")
    for key in args:
        fn = queries[key]
        samples = []
        if cold:
            for _ in range(runs):
                clear_frame_cache(_SF)
                t0 = time.perf_counter()
                fn(spark, _SF).write.mode("overwrite").format("noop").save()
                samples.append(time.perf_counter() - t0)
        else:
            clear_frame_cache(_SF)
            fn(spark, _SF).write.mode("overwrite").format("noop").save()
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, _SF).write.mode("overwrite").format(
                    "noop"
                ).save()
                samples.append(time.perf_counter() - t0)
        print(
            f"TIME {key}: median {statistics.median(samples):.3f}s "
            f"runs {[round(s, 3) for s in samples]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
