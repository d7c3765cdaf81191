"""IVF similarity search: probing all clusters must equal brute force;
probing a subset must retain useful recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aide_spark.functions.vectors import cosine
from aide_spark.operators.similarity import ivf_index, ivf_search

SF = "/root/testdata/sf0.001"
K = 8


@pytest.fixture(scope="module")
def index(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assigned, centroids = ivf_index(emb, k=K, seed=42)
    assigned = assigned.cache()
    query = emb.where("vec_id = 0").collect()[0].embedding
    brute = [
        r.vec_id
        for r in emb.where("vec_id != 0")
        .select("vec_id", cosine(F.col("embedding"),
                                 F.array(*[F.lit(float(x)) for x in query])).alias("s"))
        .orderBy(F.desc("s"), "vec_id")
        .limit(10)
        .collect()
    ]
    return {"assigned": assigned, "centroids": centroids, "query": list(query),
            "brute": brute}


def test_full_probe_equals_brute_force(index):
    got = [
        r.vec_id
        for r in ivf_search(
            index["assigned"].where("vec_id != 0"), index["centroids"],
            index["query"], nprobe=K, topk=10,
        ).collect()
    ]
    assert got == index["brute"]


def test_partial_probe_recall(index):
    got = {
        r.vec_id
        for r in ivf_search(
            index["assigned"].where("vec_id != 0"), index["centroids"],
            index["query"], nprobe=4, topk=10,
        ).collect()
    }
    recall = len(got & set(index["brute"])) / 10
    assert recall >= 0.5, recall


def test_clusters_cover_all_vectors(index):
    n = index["assigned"].count()
    assert index["assigned"].where("cluster IS NOT NULL").count() == n
    assert index["assigned"].select("cluster").distinct().count() <= K


def test_fixed_centroid_full_probe_equals_brute_force(spark, index):
    """The deterministic (oracle-able) IVF variant obeys the same exactness
    law: probing every cluster == brute force."""
    from aide_spark.operators.similarity import fixed_centroid_table, ivf_assign

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = fixed_centroid_table(emb, every=10, k=K)
    assigned = ivf_assign(emb, cents)
    got = [
        r.vec_id
        for r in ivf_search(
            assigned.where("vec_id != 0"), cents, index["query"], nprobe=K, topk=10
        ).collect()
    ]
    assert got == index["brute"]


def test_ivf_assign_plan_is_aggregate_not_window(spark):
    """Assignment must be the map-side-combinable max_by aggregate (partial
    aggregation before the shuffle), not a per-vector window sort."""
    from aide_spark.operators.similarity import fixed_centroid_table, ivf_assign

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = ivf_assign(emb, fixed_centroid_table(emb))._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max_by" in plan or "HashAggregate" in plan


def test_ivf_assign_flat_matches_join_and_has_no_join_plan(spark):
    """ivf_assign_flat (single-projection fold over a literal centroid
    array) must produce the identical assignment as the broadcast-join
    ivf_assign — same argmax, same lowest-id tie rule — with a physical
    plan containing no join or exchange at all."""
    from aide_spark.operators.similarity import (
        fixed_centroid_table, ivf_assign, ivf_assign_flat,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents_df = fixed_centroid_table(emb, every=10, k=8)
    cents = [(r.cluster, list(r.centroid)) for r in cents_df.collect()]

    flat = ivf_assign_flat(emb, cents)
    plan = flat._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan, plan[:400]

    got = {r.vec_id: r.cluster for r in flat.collect()}
    want = {r.vec_id: r.cluster for r in ivf_assign(emb, cents_df).collect()}
    assert got == want


def test_ivf_assign_auto_delegates_above_threshold(spark):
    """r4 VERDICT #5: above flat_threshold centroids, ivf_assign dispatches
    to the join-free literal fold (no Join in the plan); at or below it, it
    keeps the broadcast-join + max_by aggregate."""
    from aide_spark.operators.similarity import fixed_centroid_table, ivf_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents = fixed_centroid_table(emb, every=10, k=8)
    joined = ivf_assign(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Join" in joined
    flat = (
        ivf_assign(emb, cents, flat_threshold=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in flat
