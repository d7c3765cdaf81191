#!/usr/bin/env python
"""Same-window A/B + per-stage evidence for the driver-bench headline
(r3 VERDICT #1 — the one standing `weak`).

Two measurements, interleaved in ONE host window so host noise cannot
explain a difference:

* A/B pairs: r1's bench.py (commit ``409180f``, headline 1073 docs/sec on
  the driver's window) vs HEAD's bench.py, run back-to-back in alternating
  order, both with SPARK_GRAFT_SKIP_QUERIES=1. If HEAD ≥ r1 in the same
  window, the r2/r3 "regression" was host scheduling, not code.
* A per-stage timing table at HEAD: cumulative materializations of the
  extract pipeline (scan → validate → line explode → parser windows → span
  assembly), deltas attributing the cost to named stages.

Appends JSON lines to ``BENCH/ab_runs.jsonl``. Run ONLY on a quiet host
(loadavg < ~3, nothing else running — same hygiene as scaling_bench).

Usage: python scripts/ab_stage_bench.py [--pairs N] [--stages-only]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R1 = os.environ.get("SPARK_GRAFT_R1_COMMIT", "409180f")
R1_DIR = os.environ.get("SPARK_GRAFT_R1_DIR", "/tmp/aide_r1_worktree")
CPUS = int(os.environ.get("SPARK_GRAFT_AB_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
OUT = os.path.join(REPO, "BENCH", "ab_runs.jsonl")


def ensure_worktree() -> None:
    if not os.path.exists(os.path.join(R1_DIR, "bench.py")):
        subprocess.run(
            ["git", "worktree", "add", "--detach", R1_DIR, R1], cwd=REPO, check=True
        )


def run_bench(workdir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SKIP_QUERIES="1")
    env.pop("SPARK_GRAFT_CORPUS", None)  # each tree stages its own version
    out = subprocess.run(
        [sys.executable, "bench.py", "--cpus", str(CPUS)],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=1800,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith('{"metric"')]
    if not lines:
        return {"err": (out.stdout[-400:] + out.stderr[-400:])}
    return json.loads(lines[-1])


def stage_table() -> dict:
    """Cumulative stage materializations at HEAD (warm JVM, cleared cache):
    each timing includes its predecessors — the DELTA is the stage cost."""
    sys.path.insert(0, REPO)
    os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    import bench as B

    spark = B.build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    from aide_spark.generator import GENERATOR_VERSION, spark_corpus
    from aide_spark.operators.lines import line_table
    from aide_spark.plans import pipeline

    corpus_path = f"/tmp/aide_spark_bench_corpus_v{GENERATOR_VERSION}_{N_DOCS}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        spark_corpus(spark, N_DOCS, partitions=max(CPUS, 8)).write.mode(
            "overwrite"
        ).partitionBy("bank_id").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)

    # JIT warm-up (full pipeline), then clear
    warm = pipeline.run(docs, persist=True)
    warm["spans_out"].count()
    spark.catalog.clearCache()

    def timed(df) -> float:
        t0 = time.perf_counter()
        df.groupBy().count().collect()
        return round(time.perf_counter() - t0, 3)

    cum: dict[str, float] = {}
    cum["scan"] = timed(docs)
    val, valid, _q = pipeline.split_valid(docs)
    cum["validate"] = timed(val)
    cum["line_explode"] = timed(line_table(valid, carry=("bank_id",)))
    parsed = pipeline.parse_all(valid, persist=False)
    cum["parser_windows"] = timed(parsed["transactions"])
    out = pipeline.run(docs, persist=True)
    t0 = time.perf_counter()
    n_spans = out["spans_out"].groupBy().count().collect()[0][0]
    cum["span_assembly_full"] = round(time.perf_counter() - t0, 3)
    spark.catalog.clearCache()
    spark.stop()

    keys = list(cum)
    deltas = {
        k: round(cum[k] - (cum[keys[i - 1]] if i else 0.0), 3)
        for i, k in enumerate(keys)
    }
    return {
        "kind": "stage_table", "ts": time.time(), "cpus": CPUS,
        "n_docs": N_DOCS, "n_spans": int(n_spans),
        "cumulative_sec": cum, "delta_sec": deltas,
        "docs_per_sec_full": round(N_DOCS / cum["span_assembly_full"], 1),
    }


def main() -> None:
    pairs = 2
    if "--pairs" in sys.argv:
        pairs = int(sys.argv[sys.argv.index("--pairs") + 1])
    stages_only = "--stages-only" in sys.argv
    os.makedirs(os.path.dirname(OUT), exist_ok=True)

    recs: list[dict] = []
    if not stages_only:
        ensure_worktree()
        for i in range(pairs):
            # alternate order so slow-drift host noise cancels across pairs
            order = [("r1", R1_DIR), ("head", REPO)]
            if i % 2:
                order.reverse()
            rec: dict = {"kind": "ab_pair", "ts": time.time(), "cpus": CPUS,
                         "order": [o[0] for o in order]}
            for label, d in order:
                r = run_bench(d)
                rec[label] = {
                    k: r.get(k) for k in ("value", "plan_sec", "spans_emitted", "err")
                }
            recs.append(rec)
            print(json.dumps(rec), flush=True)

    st = stage_table()
    recs.append(st)
    print(json.dumps(st), flush=True)

    with open(OUT, "a") as fh:
        for r in recs:
            fh.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
