#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named queries to plans/<round>/<q>_<tag>.txt.

Usage: python tools/dump_plan.py <tag> <query> [<query> ...]
Tag is typically "before" or "after". SPARK_GRAFT_SF_DIR picks the data
(default sf0.1 — the bench scale, so plan shapes match the measured runs).
PLANS_ROUND picks the output subdir (default r13).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pharmacodi_spark.plans import QUERIES
from pharmacodi_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLANS_ROUND", "r13"),
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="dump_plan")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = QUERIES[name][0]
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
