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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def repartition_by_span_count(
    docs: DataFrame, num_partitions: int, heavy_threshold: int = 2000
) -> DataFrame:
    """Balance narrow per-doc compute: hash-partition light docs; round-robin
    the heavy tail by RANGE on the round-robin id — distinct ids land in
    distinct ranges, so heavy docs spread across partitions (hash
    partitioning pmod(hash(_p), n) is NOT a bijection on 0..n-1 and could
    still co-locate two heavy docs). Range boundaries come from sampling, so
    the spread is near-perfect rather than guaranteed one-per-partition.

    The heavy branch uses a global row_number (single-task) — acceptable
    precisely because heavy docs are rare by definition; if they are not,
    raise ``heavy_threshold``.
    """
    size = F.coalesce(F.size("spans"), F.lit(0))
    light = docs.where(size <= heavy_threshold).repartition(num_partitions, "doc_id")
    heavy = docs.where(size > heavy_threshold)
    rr = (
        F.row_number().over(Window.orderBy(F.desc(F.size("spans")), "doc_id")) - 1
    ) % num_partitions
    heavy_rr = (
        heavy.withColumn("_p", rr)
        .repartitionByRange(num_partitions, "_p")
        .drop("_p")
    )
    return light.unionByName(heavy_rr)


def explain_shuffles(df: DataFrame) -> int:
    """Count Exchange operators in the physical plan (used by plan tests to
    pin the shuffle budget of a pipeline)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
