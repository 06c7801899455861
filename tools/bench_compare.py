#!/usr/bin/env python
"""Compare two BENCH_DETAIL.json files (round-over-round regression triage).

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold_ratio]

Prints per-query deltas sorted by ratio (new/old), flagging queries slower
than the threshold (default 1.5x) or newly failing; exits 1 if any flagged.
A query's in-suite number can wobble ~1.5x on a busy host — confirm a flagged
row with an isolated best-of-3 before treating it as a plan regression
(VERDICT r2: two 'regressions' measured at/below their old numbers isolated).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    rows = []
    for name, t_new in new.items():
        t_old = old.get(name)
        if t_old is None:
            rows.append((name, None, t_new, None, "new"))
        elif t_new < 0:
            rows.append((name, t_old, t_new, None, "FAILS"))
        elif t_old <= 0:
            rows.append((name, t_old, t_new, None, "was-failing"))
        else:
            ratio = t_new / t_old
            flag = "SLOWER" if ratio > threshold and t_new > 0.3 else ""
            rows.append((name, t_old, t_new, ratio, flag))
    gone = [n for n in old if n not in new]

    rows.sort(key=lambda r: -(r[3] or 0))
    flagged = 0
    print(f"{'query':40} {'old':>7} {'new':>7} {'ratio':>6} flag")
    for name, t_old, t_new, ratio, flag in rows:
        if flag in ("SLOWER", "FAILS"):
            flagged += 1
        if flag or (ratio or 0) > 1.2:
            print(
                f"{name:40} {t_old if t_old is not None else '-':>7} "
                f"{t_new:>7} {f'{ratio:.2f}' if ratio else '-':>6} {flag}"
            )
    for n in gone:
        print(f"{n:40} {'(removed)':>20}")
    tot_old = sum(v for v in old.values() if v > 0)
    tot_new = sum(v for v in new.values() if v > 0)
    print(f"\ntotal {tot_old:.1f}s -> {tot_new:.1f}s ({len(old)} -> {len(new)} queries), "
          f"{flagged} flagged (threshold {threshold}x)")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
