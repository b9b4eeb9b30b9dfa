#!/usr/bin/env python
"""Stage-level profile of one query: run it against the noop sink with the
Spark UI enabled, then read the REST status API for per-job / per-stage
wall time and shuffle metrics (guide §1.1/§7.1 — decide WHERE the time
goes before touching anything).

Usage: python tools/profile_query.py <query> [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pharmacodi_spark.plans import QUERIES
from pharmacodi_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark(
        app_name=f"profile_{name}", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES[name][0]
    # warm run (codegen/JIT/AQE), not profiled
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    base = "http://localhost:4040/api/v1/applications"
    app = _get(base)[0]["id"]
    jobs_before = {j["jobId"] for j in _get(f"{base}/{app}/jobs")}
    t0 = time.perf_counter()
    for _ in range(runs):
        spark.sparkContext.setJobDescription(f"profile:{name}")
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    jobs = [j for j in _get(f"{base}/{app}/jobs") if j["jobId"] not in jobs_before]
    stages = _get(f"{base}/{app}/stages?status=complete")
    stage_ids = {s for j in jobs for s in j["stageIds"]}
    mine = [s for s in stages if s["stageId"] in stage_ids]
    mine.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(f"query={name} runs={runs} wall={wall:.2f}s jobs={len(jobs)} stages={len(mine)}")
    tot_run = sum(s.get("executorRunTime") or 0 for s in mine)
    print(f"total executorRunTime={tot_run/1000:.2f}s (sum over tasks)")
    for s in mine[:18]:
        sub = ""
        if s.get("shuffleWriteBytes"):
            sub += f" shw={s['shuffleWriteBytes']/1e6:.1f}MB"
        if s.get("shuffleReadBytes"):
            sub += f" shr={s['shuffleReadBytes']/1e6:.1f}MB"
        print(
            f"  stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3} "
            f"run={(s.get('executorRunTime') or 0)/1000:6.2f}s "
            f"cpu={(s.get('executorCpuTime') or 0)/1e9:6.2f}s{sub}  "
            f"{(s.get('name') or '')[:70]}"
        )
    # job-level wall (submission->completion) to see scheduling overhead
    jl = []
    for j in jobs:
        try:
            st = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            en = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            jl.append((j["jobId"], time.mktime(en) - time.mktime(st)))
        except (KeyError, ValueError):
            pass
    if jl:
        print(f"jobs wall (s, coarse): {sorted(jl)}")
    spark.stop()


if __name__ == "__main__":
    main()
