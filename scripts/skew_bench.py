#!/usr/bin/env python
"""Measured heavy-tail skew benchmark (r4 VERDICT #1, the one unclosed r3
item): does :func:`aide_spark.operators.skew.repartition_by_span_count`
actually flatten the decode stage on a realistic heavy-tail corpus, in
wall-clock and in per-task time spread — not just by design argument?

Corpus (deterministic, built in-process): ``n_light`` 1-page raw PDFs
(~0.8 KB, ~2 ms decode) plus ``n_heavy`` 500-page raw PDFs (~260 KB,
~0.5 s decode — the reference's own page cap, apgvb_extractor.py:68),
written heavy-docs-FIRST into one parquet file so the natural input order
clusters the heavy tail — exactly what a crawl segment from one site looks
like. Per-doc decode is the engine's real from-scratch PDF codec via
``ingest_binary_pdf`` (mapInPandas), the canonical narrow per-doc stage.

Arms (each in its OWN SparkSession with its own event log; every arm
performs exactly ONE payload shuffle, so the comparison isolates WHERE the
heavy docs land, not whether a shuffle happens):

* ``clustered`` — ``repartitionByRange(n, "doc_id")``: models input-order /
  range placement, where the heavy segment (adjacent ids, the crawl-segment
  shape) lands contiguously in one partition — no skew handling at all;
* ``hash`` — ``repartition(n, "doc_id")``: what any doc-keyed stage does by
  default; heavy docs co-locate by birthday collision (~k²/2n pairs);
* ``spread`` — ``repartition_by_span_count`` (exact round-robin, max
  ``ceil(k/n)`` heavy docs per partition).

Metrics per arm, from the Spark event log (SparkListenerTaskEnd):
wall-clock of the drain, and max / median / p90 task duration of the decode
stage (identified as the stage with the largest total task time). Results
append to BENCH/skew_runs.jsonl; BENCH/SKEW.md carries the round's table.

Run: ``python scripts/skew_bench.py [--cpus 8] [--parts 24]``
(~2-4 min on a quiet host; shared-host noise affects all arms equally and
the signal — max-task ratio — is an order of magnitude, not percent).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

CORPUS = "/tmp/aide_spark_skew_corpus_v2"
EVBASE = "/tmp/aide_spark_skew_events"
N_LIGHT = 6000
N_HEAVY = 24
LINES_PER_PAGE = 30
HEAVY_PAGES = 500


def build_corpus() -> None:
    """Heavy docs first (input-clustered), one parquet file, built with
    pyarrow directly — no Spark needed, ~12 MB total."""
    if os.path.exists(os.path.join(CORPUS, "_DONE")):
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aide_spark.schemas import PAGE_BREAK
    from aide_spark.sources.pdf_codec import encode_pdf

    def spans_for(pages: int) -> list[tuple]:
        spans, off = [], 0
        for p in range(pages):
            if p:
                spans.append(("text", PAGE_BREAK, "", off))
                off += 1
            for ln in range(LINES_PER_PAGE):
                spans.append(
                    (
                        "text",
                        f"01/02/2023 TXN {p:04d}-{ln:03d} payment to vendor "
                        f"account 1234{ln:03d} 1,234.56 Dr balance 99,876.54",
                        "",
                        off,
                    )
                )
                off += 1
        return spans

    heavy_pdf = encode_pdf(spans_for(HEAVY_PAGES))
    light_pdf = encode_pdf(spans_for(1))
    ids, payloads, pages = [], [], []
    for i in range(N_HEAVY):  # heavy docs FIRST: input-order clustering
        ids.append(f"HEAVY-{i:06d}")
        payloads.append(heavy_pdf)
        pages.append(HEAVY_PAGES)
    for i in range(N_LIGHT):
        ids.append(f"LIGHT-{i:06d}")
        payloads.append(light_pdf)
        pages.append(1)
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "content": pa.array(payloads, pa.binary()),
            "n_pages": pa.array(pages, pa.int32()),
        }
    )
    shutil.rmtree(CORPUS, ignore_errors=True)
    os.makedirs(CORPUS)
    pq.write_table(
        table, os.path.join(CORPUS, "part-0.parquet"), row_group_size=500
    )
    open(os.path.join(CORPUS, "_DONE"), "w").close()


def parse_decode_stage(evdir: str) -> dict:
    """Event log → task-duration stats of the stage with the largest total
    task time (= the decode stage; every other stage is milliseconds)."""
    stages: dict[int, list[float]] = {}
    for root, _dirs, files in os.walk(evdir):
        for fname in files:
            with open(os.path.join(root, fname)) as fh:
                for line in fh:
                    try:
                        ev = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if ev.get("Event") != "SparkListenerTaskEnd":
                        continue
                    info = ev.get("Task Info", {})
                    dur = (info.get("Finish Time", 0) - info.get("Launch Time", 0)) / 1e3
                    stages.setdefault(ev.get("Stage ID", -1), []).append(dur)
    if not stages:
        return {}
    sid, durs = max(stages.items(), key=lambda kv: sum(kv[1]))
    durs.sort()
    return {
        "stage_id": sid,
        "n_tasks": len(durs),
        "task_max_sec": round(durs[-1], 3),
        "task_median_sec": round(statistics.median(durs), 3),
        "task_p90_sec": round(durs[int(0.9 * (len(durs) - 1))], 3),
        "task_total_sec": round(sum(durs), 3),
    }


def run_arm(name: str, cpus: int, parts: int, light_cap: int | None = None) -> dict:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from aide_spark.operators.skew import repartition_by_span_count
    from aide_spark.sources.binary_ingest import ingest_binary_pdf

    evdir = os.path.join(EVBASE, f"{name}-{light_cap or 'full'}")
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"skew-bench-{name}")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "false")  # fixed partitioning:
        # AQE coalescing would merge the tiny test-SF shuffle partitions and
        # blur the arm comparison (same reason bench.py disables coalescing)
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.dir", "file:" + evdir)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = spark.read.parquet(CORPUS)
        n_light = N_LIGHT
        if light_cap is not None:
            # thin-light scenario: heavy work dominates per-core work, so the
            # collision tail is the wall-clock (the regime where placement
            # guarantees matter, not just total throughput)
            docs = docs.where(
                (F.col("n_pages") > 100)
                | (F.col("doc_id") < f"LIGHT-{light_cap:06d}")
            )
            n_light = light_cap
        if name == "clustered":
            arranged = docs.repartitionByRange(parts, "doc_id")
        elif name == "hash":
            arranged = docs.repartition(parts, "doc_id")
        elif name == "spread":
            arranged = repartition_by_span_count(
                docs, parts, heavy_threshold=100, size_col=F.col("n_pages")
            )
        else:
            raise ValueError(name)
        # warm ALL python workers + JIT on a light-only slice spread over
        # every core (a limit() would collapse to one partition and warm a
        # single worker — measured ~0.5 s cold-start inflating every task),
        # so the timed run is steady-state in every arm
        ingest_binary_pdf(
            docs.where("n_pages = 1 AND doc_id < 'LIGHT-000400'")
            .repartition(cpus)
            .select("doc_id", "content")
        ).select(F.size("spans")).groupBy().count().collect()
        out = ingest_binary_pdf(arranged.select("doc_id", "content"))
        agg = out.select(F.size("spans").alias("n")).groupBy().sum("n")
        t0 = time.perf_counter()
        total = agg.collect()[0][0]
        wall = round(time.perf_counter() - t0, 3)
    finally:
        spark.stop()
    time.sleep(1)  # let the event log flush
    stats = parse_decode_stage(evdir)
    expect = N_HEAVY * (HEAVY_PAGES * (LINES_PER_PAGE + 1) - 1) + n_light * LINES_PER_PAGE
    assert total == expect, (total, expect)
    return {"arm": name, "n_light": n_light, "wall_sec": wall, **stats}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_SKEW_CPUS", "8")))
    ap.add_argument("--parts", type=int, default=24)
    args = ap.parse_args()

    build_corpus()
    results = []
    for light_cap in (None, 500):
        for arm in ("clustered", "hash", "spread"):
            r = run_arm(arm, args.cpus, args.parts, light_cap=light_cap)
            results.append(r)
            print(json.dumps(r))
    rec = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "cpus": args.cpus,
        "parts": args.parts,
        "n_light": N_LIGHT,
        "n_heavy": N_HEAVY,
        "heavy_pages": HEAVY_PAGES,
        "arms": results,
    }
    with open(os.path.join(REPO, "BENCH", "skew_runs.jsonl"), "a") as fh:
        fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
