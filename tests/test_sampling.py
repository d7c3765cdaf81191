"""Deterministic stratified sampling (operators/sampling.py)."""

from pyspark.sql import functions as F

from aide_spark.operators.sampling import (
    SCALE,
    hash_coin,
    stratified_sample,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("a")).otherwise(F.lit("b")).alias(
            "stratum"
        ),
    )


def test_rates_concentrate(spark):
    out = (
        stratified_sample(_docs(spark), {"a": 0.3, "b": 0.9})
        .groupBy("stratum")
        .count()
        .collect()
    )
    got = {r["stratum"]: r["count"] for r in out}
    # 1000 per stratum; binomial(1000, p) stays well within ±5pp
    assert abs(got["a"] / 1000 - 0.3) < 0.05, got
    assert abs(got["b"] / 1000 - 0.9) < 0.05, got


def test_deterministic_and_partition_independent(spark):
    a = set(
        r["doc_id"]
        for r in stratified_sample(
            _docs(spark).repartition(3), {"a": 0.5, "b": 0.5}
        ).collect()
    )
    b = set(
        r["doc_id"]
        for r in stratified_sample(
            _docs(spark).repartition(11), {"a": 0.5, "b": 0.5}
        ).collect()
    )
    assert a == b and len(a) > 0


def test_salts_decorrelate(spark):
    base = _docs(spark)
    s1 = set(
        r["doc_id"]
        for r in stratified_sample(base, {"a": 0.5, "b": 0.5}, salt="s1").collect()
    )
    s2 = set(
        r["doc_id"]
        for r in stratified_sample(base, {"a": 0.5, "b": 0.5}, salt="s2").collect()
    )
    # independent 50% coins: overlap ≈ 25% of the universe, far from either
    # identity (100% of s1) or disjointness (0)
    inter = len(s1 & s2) / 2000
    assert 0.15 < inter < 0.35, inter


def test_unmapped_stratum_uses_default(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("mystery").alias("stratum")
    )
    assert stratified_sample(docs, {"a": 1.0}).count() == 0
    assert (
        stratified_sample(docs, {"a": 1.0}, default_rate=1.0).count() == 100
    )


def test_coin_domain_and_plan(spark):
    df = _docs(spark, 200).select(hash_coin(F.col("doc_id"), "x").alias("c"))
    vals = [r["c"] for r in df.collect()]
    assert all(0 <= v < SCALE for v in vals)
    plan = (
        stratified_sample(_docs(spark, 100), {"a": 0.5, "b": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # broadcast rate join only — no shuffle exchange anywhere
    assert "Exchange hashpartitioning" not in plan
