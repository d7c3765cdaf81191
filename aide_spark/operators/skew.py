"""Skew handling for per-document compute (SURVEY.md §4.1).

Per-doc work is proportional to span count, and the tail is capped by the
reference's own 500-page limit (apgvb_extractor.py:68) — so skew is bounded
but real. Two distinct places to handle it:

* **Narrow per-doc stages** (binary decode, mapInPandas feature extraction):
  partitioning set BEFORE the stage sticks. :func:`repartition_by_span_count`
  hash-distributes light docs and EXACTLY round-robins the rare heavy docs
  (max ``ceil(k / num_partitions)`` heavy docs per partition — provable, not
  probabilistic; the r1-r4 salted-hash spread had the same birthday-collision
  odds as plain hashing, ~k²/2n co-located pairs).
* **Window/groupBy stages** (the parsers): every window requires the whole
  doc in one partition, so a heavy doc is indivisible. The controls are the
  shuffle partition count (expected collision of two heavy docs in one hash
  partition falls as 1/partitions), the 500-page cap, and AQE for the join
  side. This is stated, not hidden: no pre-shuffle trick survives the
  window's own hash exchange.

Measured (scripts/skew_bench.py; full tables + analysis in BENCH/SKEW.md):
6 000×1-page + 24×500-page raw-PDF corpus, local[8], 24 partitions, decode
stage task times from the Spark event log —

=============  =======  ==========  ============
arm            wall s   task max s  task median s
=============  =======  ==========  ============
input-ordered  11.29    10.78       0.38
hash           3.89     2.27        0.91
round-robin    4.17     1.54        0.90
=============  =======  ==========  ============

Input-order clustering is the catastrophe (28× task spread, 2.7× wall);
hash leaves a 3-4-heavy birthday tail that round-robin removes (max task
1.5× lower, exactly 1 heavy/partition verified). Hash-vs-spread WALL parity
here is the shared test host's all-cores-busy ceiling (concurrent heavy
decodes inflate 0.52 → ~0.9 s/doc, event-log totals on file); on dedicated
executors the flattened max task is the wall-clock, since a stage ends when
its slowest task ends.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_preimages(spark, n: int) -> dict[int, int]:
    """partition j → an int x with ``pmod(murmur3(x), n) == j``, so that
    ``repartition(n, <mapped column>)`` places slot j in partition j
    EXACTLY. RangePartitioner placement (the first r5 draft) needed a
    sampling job over the input inside the hot path AND quantized adjacent
    slots together (±1 heavy doc per partition); hash preimages cost one
    tiny driver-local job (``spark.range(64n)``) and are exact. With 64n
    uniform draws the chance of a missing residue class is ~n·e^{-64} ≈ 0;
    the assert documents the impossibility rather than handling it."""
    cand = spark.range(0, 64 * n).select(
        F.col("id").cast("int").alias("x"),
        F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("j"),
    )
    m = {
        int(r["j"]): int(r["x"])
        for r in cand.groupBy("j").agg(F.min("x").alias("x")).collect()
    }
    missing = set(range(n)) - set(m)
    assert not missing, f"no murmur3 preimage found for partitions {missing}"
    return m


def repartition_by_span_count(
    docs: DataFrame,
    num_partitions: int,
    heavy_threshold: int = 2000,
    size_col: Column | None = None,
) -> DataFrame:
    """Balance narrow per-doc compute: hash-partition light docs; spread the
    heavy tail by EXACT round-robin so no partition carries more than
    ``ceil(k / num_partitions)`` of the k heavy docs.

    The round-robin rank is computed scale-clean, without ever serializing
    heavy PAYLOADS through one task (the r2 trap) and without a global-order
    ``Exchange SinglePartition`` anywhere (pinned by test_plans):

    1. project heavy docs to their IDS ONLY, salt with
       ``pmod(xxhash64(doc_id), n)``;
    2. one tiny action collects the ≤ n per-salt COUNTS to the driver and
       prefix-sums them into per-salt offsets (the ``zipWithIndex`` trick);
    3. a salt-partitioned ``row_number`` (narrow id-frame exchange, never the
       payloads) plus the broadcast offsets yields a dense global rank;
       ``slot = rank % n``;
    4. the (doc_id → slot) map joins back onto the full rows (broadcast
       while small; plain equi-join past ~5M heavies); light docs keep
       their hash slot, and slot j is pinned to partition j EXACTLY via a
       murmur3 preimage (:func:`_hash_preimages`) — one payload scan, one
       payload shuffle, no RangePartitioner sampling job.

    Placement is a pure function of the doc_id set, so it is DETERMINISTIC
    across retries and resumes (a ``monotonically_increasing_id`` spread
    would depend on the incidental input partitioning and break idempotent
    re-runs). Cost: one extra narrow pass over the heavy subset for the
    counts — pass a cheap scalar ``size_col`` (e.g. a stored ``n_pages``)
    when the default ``size(spans)`` would force reading wide payloads.

    ``size_col`` defaults to ``size(spans)``; raw-bytes corpora pass e.g.
    ``F.length("content")`` or a stored page/span-count column.
    """
    size = F.coalesce(size_col if size_col is not None else F.size("spans"), F.lit(0))
    hash_slot = F.pmod(F.xxhash64("doc_id"), F.lit(num_partitions))

    # side plan over IDS ONLY (column-pruned scan — never touches payloads):
    # salt the heavy ids, collect the ≤ n per-salt counts, prefix-sum into
    # offsets, then a salt-partitioned row_number gives a dense global rank
    ids = docs.where(size > heavy_threshold).select(
        "doc_id", hash_slot.alias("_salt")
    )
    counts = {
        int(r["_salt"]): int(r["c"])
        for r in ids.groupBy("_salt").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    if not counts:  # no heavy tail: plain hash repartition
        return docs.repartition(num_partitions, "doc_id")
    offsets, acc = {}, 0
    for s in sorted(counts):
        offsets[s] = acc
        acc += counts[s]
    # per-salt offsets as a LITERAL map, not a createDataFrame join: a
    # driver-list DataFrame is a Python RDD whose scan cold-starts one
    # python worker per default-parallelism task (~1.3 s each, measured via
    # event log) just to deserialize ≤ n rows; the literal map is pure JVM
    off_map = F.create_map(
        *[F.lit(v) for s_o in sorted(offsets.items()) for v in s_o]
    )
    w = Window.partitionBy("_salt").orderBy("doc_id")
    slots = (
        ids.withColumn(
            "_p",
            F.pmod(
                off_map[F.col("_salt")] + F.row_number().over(w) - 1,
                F.lit(num_partitions),
            ),
        )
        .select("doc_id", F.col("_p").alias("_heavy_p"))
    )
    if acc <= 5_000_000:  # k heavy ids fit a broadcast comfortably
        slots = F.broadcast(slots)

    # ONE pass over the payload rows: left-join the tiny slot map, lights
    # keep their hash slot, and slot j is pinned to partition j exactly by
    # hashing its murmur3 preimage. One payload scan + one payload shuffle —
    # the r5 union-of-branches draft paid a second scan and 2n partitions,
    # which cost more than the collisions it removed.
    pre = _hash_preimages(docs.sparkSession, num_partitions)
    slot_to_pre = F.array(*[F.lit(pre[j]) for j in range(num_partitions)])
    return (
        docs.join(slots, "doc_id", "left")
        .withColumn("_p", F.coalesce(F.col("_heavy_p"), hash_slot))
        .withColumn("_px", F.element_at(slot_to_pre, F.col("_p").cast("int") + 1))
        .repartition(num_partitions, "_px")
        .drop("_p", "_px", "_heavy_p")
    )


def explain_shuffles(df: DataFrame) -> int:
    """Count Exchange operators in the physical plan (used by plan tests to
    pin the shuffle budget of a pipeline)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
