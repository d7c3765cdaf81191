"""Skew handling for per-document compute (SURVEY.md §4.1).

Per-doc work is proportional to span count, and the tail is capped by the
reference's own 500-page limit (apgvb_extractor.py:68) — so skew is bounded
but real. Two distinct places to handle it:

* **Narrow per-doc stages** (binary decode, mapInPandas feature extraction):
  partitioning set BEFORE the stage sticks. :func:`repartition_by_span_count`
  hash-distributes light docs and ROUND-ROBINS the rare heavy docs across
  partitions (range-partitioning a size bucket would do the opposite —
  adjacentize all heavy docs into one range).
* **Window/groupBy stages** (the parsers): every window requires the whole
  doc in one partition, so a heavy doc is indivisible. The controls are the
  shuffle partition count (expected collision of two heavy docs in one hash
  partition falls as 1/partitions), the 500-page cap, and AQE for the join
  side. This is stated, not hidden: no pre-shuffle trick survives the
  window's own hash exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repartition_by_span_count(
    docs: DataFrame, num_partitions: int, heavy_threshold: int = 2000
) -> DataFrame:
    """Balance narrow per-doc compute: hash-partition light docs; spread the
    heavy tail by RANGE on a SALTED HASH id — ``pmod(xxhash64(doc_id), n)``
    is computed rowwise (no exchange, no single task; the r2 global
    ``row_number`` window serialized every heavy doc through one task) and
    range placement maps distinct salt values to distinct partitions. Two
    heavy docs co-locate only on a salt collision (~k²/2n for k heavy docs —
    rare by definition; raise ``heavy_threshold`` if they are not). The salt
    is a pure function of ``doc_id``, so placement is DETERMINISTIC across
    retries and resumes (a ``monotonically_increasing_id`` spread would
    depend on the incidental input partitioning and break idempotent
    re-runs)."""
    size = F.coalesce(F.size("spans"), F.lit(0))
    light = docs.where(size <= heavy_threshold).repartition(num_partitions, "doc_id")
    heavy = docs.where(size > heavy_threshold)
    heavy_rr = (
        heavy.withColumn("_p", F.pmod(F.xxhash64("doc_id"), F.lit(num_partitions)))
        .repartitionByRange(num_partitions, "_p")
        .drop("_p")
    )
    return light.unionByName(heavy_rr)


def explain_shuffles(df: DataFrame) -> int:
    """Count Exchange operators in the physical plan (used by plan tests to
    pin the shuffle budget of a pipeline)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
