"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction query; ``queries``/``oracle_sql``
expose the operator battery of SURVEY.md §2 (implemented in
``aide_spark/queries.py``), each Spark DataFrame paired with a DuckDB oracle
engineered for exact value equality (integer-cents money, string dates,
left-fold vector math).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# import works regardless of the harness's cwd; executors also need the
# package for the two Arrow-batched functions (corpus gen, multimodal stub)
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from aide_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: synthesize Union-grammar statement
    lines from orders, regex-parse them back, aggregate per-account summaries
    (scan → parse → window → quirky positional aggregates)."""
    return QUERIES["e2e_union_extract"][0](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
