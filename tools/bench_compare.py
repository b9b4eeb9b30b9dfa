#!/usr/bin/env python
"""Compare two BENCH_FULL-style JSON files: per-query before/after table.

Usage: python tools/bench_compare.py BEFORE.json AFTER.json [threshold]
"""

import json
import sys


def main() -> None:
    before = json.load(open(sys.argv[1]))["queries"]
    after = json.load(open(sys.argv[2]))["queries"]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    rows = []
    for name, b in before.items():
        a = after.get(name)
        if a is None or a < 0 or b < 0:
            continue
        rows.append((name, b, a, a / b if b else float("inf")))
    rows.sort(key=lambda r: r[3])
    tb = sum(r[1] for r in rows)
    ta = sum(r[2] for r in rows)
    print(f"{'query':<28} {'before':>7} {'after':>7} {'ratio':>6}")
    for name, b, a, r in rows:
        if abs(b - a) >= thr:
            print(f"{name:<28} {b:7.2f} {a:7.2f} {r:6.2f}")
    print(f"{'TOTAL (common)':<28} {tb:7.2f} {ta:7.2f} {ta/tb:6.2f}")
    new = sorted(set(after) - set(before))
    if new:
        print("only in after:", ", ".join(f"{n}={after[n]}" for n in new))


if __name__ == "__main__":
    main()
