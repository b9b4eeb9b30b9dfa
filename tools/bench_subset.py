#!/usr/bin/env python
"""Quick shared-JVM subset bench for optimization target-picking.

One session, min-of-2 per query (first run warms). NOT the headline
methodology (bench.py isolated mode is); suite-position effects apply —
use `bench.py --only <q>` for any number that backs a before/after claim.

Usage: python tools/bench_subset.py q1 q2 ... | python tools/bench_subset.py --top N
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import run_query
    from pharmacodi_spark.session import get_spark

    names = sys.argv[1:]
    if names and names[0] == "--top":
        n = int(names[1])
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_BASELINE_r12opt.json")) as fh:
            base = json.load(fh)["queries"]
        names = [q for q, _ in sorted(base.items(), key=lambda kv: -kv[1])[:n]]
    spark = get_spark(app_name="bench_subset")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for q in names:
        try:
            t = round(min(run_query(spark, q, SF_DIR) for _ in range(2)), 3)
        except Exception as exc:  # noqa: BLE001 — record and continue
            sys.stderr.write(f"{q} FAILED: {exc}\n")
            t = -1.0
        out[q] = t
        print(f"{t:7.2f}  {q}", flush=True)
    print(json.dumps({"queries": out, "sf_dir": SF_DIR, "mode": "subset"}))
    spark.stop()


if __name__ == "__main__":
    main()
