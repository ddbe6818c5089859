"""Diff two BENCH_FULL.json records and flag per-key regressions —
the triage step the round-2 noise taught us to run before chasing any
"slow" key (5 of 7 round-2 flags were single-run noise).

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold=1.5]

Prints keys slower than threshold x old (ignoring keys under 0.5 s,
where scheduler noise dominates), plus added/removed keys and totals.
Exit 1 if any flagged regression, so it is CI-able; remember the
protocol: re-run a flagged key median-of-3 before believing it.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = old["queries"], new["queries"]
    flagged = []
    for k in sorted(set(oq) & set(nq)):
        a, b = oq[k], nq[k]
        if a <= 0 or b <= 0:
            continue
        if b > thr * a and b >= 0.5:
            flagged.append((k, a, b, b / a))
    print(
        f"old: {old['value']}s/{len(oq)} keys   "
        f"new: {new['value']}s/{len(nq)} keys"
    )
    added, removed = sorted(set(nq) - set(oq)), sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    failed = sorted(k for k, v in nq.items() if v < 0)
    if failed:
        print(f"FAILED in new: {', '.join(failed)}")
    if flagged:
        print(f"regressions > {thr}x (and >= 0.5 s):")
        for k, a, b, r in sorted(flagged, key=lambda t: -t[3]):
            print(f"  {k}: {a:.2f}s -> {b:.2f}s ({r:.1f}x)")
    else:
        print(f"no regressions > {thr}x")
    raise SystemExit(1 if flagged or failed else 0)


if __name__ == "__main__":
    main()
