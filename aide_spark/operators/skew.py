"""Skew handling for per-document compute (SURVEY.md §4.1).

Per-doc parse work is proportional to span count; a heavy tail (the
reference caps at 500 pages, apgvb_extractor.py:68) starves partitions. AQE
skew handling only splits join/shuffle skew, NOT UDF/window compute skew, so
the parse stage repartitions explicitly by a size-salted key before any
per-doc window work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repartition_by_span_count(
    docs: DataFrame, num_partitions: int, heavy_threshold: int = 2000
) -> DataFrame:
    """Range-partition docs so heavy documents spread across partitions.

    Docs are bucketed by log2(span count); within a bucket, ``doc_id`` hash
    spreads them. Heavy docs (> heavy_threshold spans) land in dedicated
    partitions instead of hiding inside light-doc partitions.
    """
    size = F.coalesce(F.size("spans"), F.lit(0))
    bucket = F.when(size > heavy_threshold, F.lit(99)).otherwise(
        F.floor(F.log2(size + 1)).cast("int")
    )
    return (
        docs.withColumn("_sz_bucket", bucket)
        .repartitionByRange(num_partitions, "_sz_bucket", "doc_id")
        .drop("_sz_bucket")
    )


def explain_shuffles(df: DataFrame) -> int:
    """Count Exchange operators in the physical plan (used by plan tests to
    pin the shuffle budget of a pipeline)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
