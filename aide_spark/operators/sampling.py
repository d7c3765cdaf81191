"""Deterministic stratified corpus sampling — the data-mixing operator.

Assembling a training mix means sampling each stratum (language, source,
quality band) at its own rate, and doing it *deterministically*: the same
document must make the same keep/drop decision on every run, on any
cluster size, under resume — ``df.sample()`` (seeded per partition) gives
none of that. The standard trick is a content-keyed hash coin:

    u(doc) = first 8 hex chars of md5(salt || ':' || key)  / 2^32
    keep   = u(doc) < rate(stratum)

* **Portable**: ``md5`` is bit-identical in Spark and DuckDB (the
  engine-wide convention, functions/hashing.py), so oracles and resumed
  runs agree exactly. Integer compare — ``hash32 * 1.0 < rate * 2^32``
  — avoids float division entirely.
* **Uniform**: md5's avalanche makes the 32-bit prefix uniform on
  [0, 2^32); each stratum's realized rate concentrates at its target
  (binomial, pinned by test).
* **Salt** decorrelates independent sampling passes (a doc kept in the
  50% eval split must not be auto-kept in a 50% train split — different
  salts give independent coins). crc32-style linear salting would NOT
  decorrelate (see the xxhash64 note in operators/skew.py); md5 mixes.

Plan shape: one narrow projection + a broadcast join against the
literal rate table — no shuffle at all; the filter pushes through
whatever scan follows.

Reference scope: beyond-reference LLM-data surface (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SCALE = 1 << 32


def hash_coin(key: Column, salt: str) -> Column:
    """Deterministic 32-bit coin in [0, 2^32) from md5(salt || ':' || key)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def rates_df(spark: SparkSession, rates: dict[str, float]) -> DataFrame:
    """(stratum, threshold) literal table — thresholds pre-scaled to the
    integer coin domain so the comparison is exact. JVM literal array
    explode (never createDataFrame(list) — python-RDD scan pitfall)."""
    rows = F.array(
        *[
            F.struct(
                F.lit(s).alias("stratum"),
                F.lit(int(round(r * SCALE))).alias("threshold"),
            )
            for s, r in sorted(rates.items())
        ]
    )
    return spark.range(1).select(F.explode(rows).alias("r")).select("r.*")


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "stratum",
    key_col: str = "doc_id",
    salt: str = "sample",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, decided by the
    content-keyed hash coin. Strata missing from ``rates`` fall back to
    ``default_rate`` (0 = drop unmapped strata — the safe default for a
    mixing recipe). Returns the input rows + ``coin`` (the integer coin,
    for audit) filtered to the kept set.
    """
    spark = docs.sparkSession
    coin = hash_coin(F.col(key_col), salt)
    default_t = int(round(default_rate * SCALE))
    # internal names so a caller column named "stratum" can't collide
    rdf = rates_df(spark, rates).select(
        F.col("stratum").alias("_strat"), F.col("threshold").alias("_thr")
    )
    joined = docs.withColumn("coin", coin).join(
        F.broadcast(rdf), F.col(stratum_col) == F.col("_strat"), "left"
    )
    kept = joined.where(
        F.col("coin") < F.coalesce(F.col("_thr"), F.lit(default_t))
    )
    return kept.drop("_strat", "_thr")


def oracle_coin_sql(key_expr: str, salt: str) -> str:
    """The identical coin in DuckDB."""
    return (
        f"CAST(('0x' || substr(md5('{salt}:' || CAST({key_expr} AS VARCHAR)), "
        "1, 8)) AS BIGINT)"
    )
