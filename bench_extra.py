#!/usr/bin/env python
"""Extra benchmark probes (guide §1.4): per-query plan-vs-execute split with
a noop-equivalent drain (count, same as bench.py), repeated samples.

Usage: python bench_extra.py [query ...]   (default: the bench HEADLINE list)
Prints one JSON line per query:
  {"query": name, "plan_sec": p, "exec_sec": [s1, s2, ...]}
This file is NOT part of the driver contract (bench.py is frozen).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from bench import HEADLINE, build_spark  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_EXTRA_RUNS", "3"))
    names = sys.argv[1:] or HEADLINE

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from aide_spark.queries import QUERIES

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for name in names:
        fn = QUERIES[name][0]
        spark.sparkContext.setJobDescription(name)
        # planning: analysis -> optimization -> physical plan, forced pre-clock
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        cnt = df.groupBy().count()
        qe = cnt._jdf.queryExecution()
        qe.executedPlan()
        plan_sec = round(time.perf_counter() - t0, 3)
        execs = []
        for _ in range(runs):
            df = fn(spark, sf_dir)
            cnt = df.groupBy().count()
            qe = cnt._jdf.queryExecution()
            qe.executedPlan()
            t0 = time.perf_counter()
            qe.executedPlan().executeCollect()
            execs.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps({"query": name, "plan_sec": plan_sec, "exec_sec": execs}),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
