#!/usr/bin/env python
"""Loop the timed spans_out pass so a sibling shell can jstack-sample the JVM
(guide §7.3). Prints the pid, then runs the pipeline steadily for ~90 s."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from bench import build_spark  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from aide_spark.generator import GENERATOR_VERSION, spark_corpus
    from aide_spark.plans import pipeline

    corpus_path = f"/tmp/aide_spark_bench_corpus_v{GENERATOR_VERSION}_{n_docs}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        spark_corpus(spark, n_docs, partitions=max(cpus, 8)).write.mode(
            "overwrite"
        ).partitionBy("bank_id").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)

    import subprocess

    jvm_pid = None
    out = subprocess.run(["pgrep", "-f", "org.apache.spark.deploy.SparkSubmit"],
                         capture_output=True, text=True)
    pids = [p for p in out.stdout.split() if p.strip()]
    if pids:
        jvm_pid = pids[0]
    print(f"JVM_PID={jvm_pid}", flush=True)

    warm = pipeline.run(docs, persist=True)
    warm["spans_out"].count()
    pipeline.release(warm)
    spark.catalog.clearCache()
    print("WARM_DONE", flush=True)

    t_end = time.time() + float(os.environ.get("SPARK_GRAFT_PROFILE_SECS", "90"))
    runs = 0
    while time.time() < t_end:
        out = pipeline.run(docs, persist=True)
        out["spans_out"].groupBy().count()._jdf.queryExecution().executedPlan().executeCollect()
        pipeline.release(out)
        spark.catalog.clearCache()
        runs += 1
    print(f"RUNS={runs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
