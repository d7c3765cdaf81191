#!/usr/bin/env python
"""Stage-level profile of the bench's timed spans_out pass (guide §1.1/§7.1).

Replays bench.py's extract methodology (warm-up run, cleared cache, steady
timed executions) with the event log enabled, then attributes wall time to
stages from the log (submission -> completion, executor run time, shuffle
bytes). NOT part of the driver contract.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

EVDIR = "/tmp/spark-events-profile"


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    os.makedirs(EVDIR, exist_ok=True)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"aide-spark-profile-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    from aide_spark.generator import GENERATOR_VERSION, spark_corpus
    from aide_spark.plans import pipeline

    corpus_path = os.environ.get(
        "SPARK_GRAFT_CORPUS", f"/tmp/aide_spark_bench_corpus_v{GENERATOR_VERSION}_{n_docs}"
    )
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        spark_corpus(spark, n_docs, partitions=max(cpus, 8)).write.mode(
            "overwrite"
        ).partitionBy("bank_id").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)

    warm = pipeline.run(docs, persist=True)
    warm["spans_out"].count()
    pipeline.release(warm)
    spark.catalog.clearCache()

    runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3"))
    windows = []
    for i in range(runs):
        out = pipeline.run(docs, persist=True)
        cnt = out["spans_out"].groupBy().count()
        qe = cnt._jdf.queryExecution()
        qe.executedPlan()
        t0 = time.time()
        qe.executedPlan().executeCollect()[0].getLong(0)
        t1 = time.time()
        windows.append((t0 * 1000, t1 * 1000, t1 - t0))
        pipeline.release(out)
        spark.catalog.clearCache()
    spark.stop()

    # parse the event log: stage submission/completion inside each window
    path = os.path.join(EVDIR, app_id)
    stages = {}  # id -> dict
    tasks = {}  # stage id -> [run_time_ms]
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                scopes = []
                for ri in si.get("RDD Info", []):
                    sc = ri.get("Scope")
                    if sc:
                        try:
                            nm = json.loads(sc).get("name")
                        except Exception:
                            nm = None
                        if nm and nm not in scopes:
                            scopes.append(nm)
                stages[si["Stage ID"]] = {
                    "name": ",".join(scopes[:14]) or si["Stage Name"],
                    "sub": si.get("Submission Time"),
                    "done": si.get("Completion Time"),
                    "ntask": si["Number of Tasks"],
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                tasks.setdefault(sid, []).append(
                    (
                        m.get("Executor Run Time", 0),
                        (m.get("Shuffle Read Metrics") or {}).get("Remote Bytes Read", 0)
                        + (m.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0),
                        (m.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0),
                    )
                )
    for wi, (w0, w1, wall) in enumerate(windows):
        print(f"--- run {wi}: wall={wall:.3f}s")
        rows = []
        for sid, s in sorted(stages.items()):
            if s["sub"] is None or s["done"] is None:
                continue
            if s["done"] < w0 or s["sub"] > w1:
                continue
            tm = tasks.get(sid, [])
            run_ms = sum(t[0] for t in tm)
            srd = sum(t[1] for t in tm)
            swr = sum(t[2] for t in tm)
            rt = sorted(t[0] for t in tm)
            mx = rt[-1] if rt else 0
            md = rt[len(rt) // 2] if rt else 0
            rows.append(
                (
                    s["done"] - s["sub"],
                    f"    stage {sid:4d} wall={(s['done'] - s['sub']) / 1000:6.2f}s "
                    f"tasksum={run_ms / 1000:7.2f}s n={s['ntask']:3d} "
                    f"max/med={mx / 1000:5.2f}/{md / 1000:5.2f}s "
                    f"sread={srd / 1e6:7.1f}MB swrite={swr / 1e6:7.1f}MB  {s['name'][:80]}",
                )
            )
        for _, line in sorted(rows, reverse=True):
            print(line)


if __name__ == "__main__":
    main()
