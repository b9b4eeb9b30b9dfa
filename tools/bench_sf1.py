#!/usr/bin/env python
"""Regenerate BENCH_SF1.json from a SAME-DAY sf0.1 / sf1 bench pair
(VERDICT r5 item 7: the 10x point is round-over-round scale evidence, so it
must be re-measured each round, not carried forward).

Runs bench.py in isolated mode (fresh JVM per query — the only
cross-round-comparable protocol, BENCH_TRIAGE.md) twice:

  1. at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), --runs RUNS01;
  2. at /tmp/bench_sf1/sf1 (built by tools/make_sf1.py if absent), --runs 1
     (each sf1 query still gets a warm-up + timed run inside its JVM);

then writes BENCH_SF1.json with per-query sf1 seconds, the sf1/sf0.1 ratio
map, both totals, and the run date. bench.py attaches this file BY SUMMARY
to every headline line (never inlined — the r5 parsed:null lesson).

Do not run Spark workloads concurrently with this (contaminates timings).
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = "/tmp/bench_sf1/sf1"


def _bench(sf_dir: str, runs: int) -> dict:
    env = {**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--runs", str(runs)],
        capture_output=True, text=True, env=env, cwd=REPO, check=False,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    if not lines:
        sys.stderr.write(out.stderr[-4000:] + "\n")
        raise SystemExit(f"bench at {sf_dir} produced no output")
    # the FIRST stdout line is the complete record; the LAST is the compact
    # <=1.8KB summary whose "queries" keeps only the slowest entries (the
    # 2000-byte driver-capture contract, bench.py::_emit) — parsing the
    # last line here would silently truncate the ratio map
    obj = json.loads(lines[0])
    if obj.get("failed"):
        raise SystemExit(f"bench at {sf_dir} had failures: {obj['failed']}")
    return obj


def main() -> None:
    if not os.path.isdir(SF1):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_sf1.py")],
            check=True, cwd=REPO,
        )
    runs01 = int(os.environ.get("BENCH_SF01_RUNS", "1"))
    reuse = os.environ.get("BENCH_SF01_FROM")
    if reuse:
        # reuse a SAME-DAY sf0.1 record (e.g. the round's official
        # BENCH_FULL.json) instead of re-running leg 1 — the pair stays
        # same-day/same-protocol; the caller owns the same-day guarantee
        with open(reuse) as fh:
            b01 = json.load(fh)
        assert b01.get("mode", "").startswith("isolated"), reuse
    else:
        b01 = _bench(SF01, runs01)
    b1 = _bench(SF1, 1)
    q01, q1 = b01["queries"], b1["queries"]
    ratios = {
        n: round(q1[n] / q01[n], 2)
        for n in q1
        if n in q01 and q01[n] > 0 and q1[n] > 0
    }
    blob = {
        "generated_by": (
            "tools/bench_sf1.py (isolated mode, fresh JVM per query, "
            f"warm + timed; sf0.1 --runs {runs01}, sf1 --runs 1, same day)"
        ),
        "date": datetime.date.today().isoformat(),
        "sf": 1.0,
        "dataset": SF1,
        "total_sec": round(sum(t for t in q1.values() if t > 0), 3),
        "sf01_same_day_total_sec": round(
            sum(t for t in q01.values() if t > 0), 3
        ),
        "ratio_vs_sf0.1": ratios,
        "queries": q1,
    }
    path = os.path.join(REPO, "BENCH_SF1.json")
    with open(path, "w") as f:
        json.dump(blob, f, indent=1)
        f.write("\n")
    meds = sorted(ratios.values())
    print(json.dumps({
        "file": path,
        "total_sec": blob["total_sec"],
        "sf01_total_sec": blob["sf01_same_day_total_sec"],
        "ratio_median": meds[len(meds) // 2] if meds else None,
        "date": blob["date"],
    }))


if __name__ == "__main__":
    main()
