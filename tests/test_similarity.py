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


# ---------------------------------------------------------------------- PQ


def _np_book():
    import numpy as np

    from aide_spark.operators.similarity import pq_codebook

    return np.array(pq_codebook())  # (8, 16, 8)


def test_pq_encode_matches_numpy(spark):
    import numpy as np

    from aide_spark.operators.similarity import pq_encode

    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 64).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["pq_code"] for r in pq_encode(df).collect()}
    book = _np_book()
    for i, v in enumerate(vecs):
        v64 = v.astype(np.float64)
        want = [
            int(np.argmin(((v64[m * 8 : m * 8 + 8] - book[m]) ** 2).sum(axis=1)))
            for m in range(8)
        ]
        assert got[i] == want, f"vec {i}"


def test_pq_topk_matches_numpy_adc(spark):
    import numpy as np

    from aide_spark.operators.similarity import pq_encode, pq_topk

    rng = np.random.RandomState(11)
    vecs = rng.randn(40, 64).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = [(r["vec_id"], r["adist"]) for r in pq_topk(df, 0, 5).collect()]

    book = _np_book()
    q = vecs[0].astype(np.float64)
    ad = {}
    for i, v in enumerate(vecs):
        if i == 0:
            continue
        v64 = v.astype(np.float64)
        code = [
            int(np.argmin(((v64[m * 8 : m * 8 + 8] - book[m]) ** 2).sum(axis=1)))
            for m in range(8)
        ]
        ad[i] = sum(
            float(((q[m * 8 : m * 8 + 8] - book[m][code[m]]) ** 2).sum())
            for m in range(8)
        )
    want = sorted(ad.items(), key=lambda t: (t[1], t[0]))[:5]
    assert [v for v, _ in got] == [v for v, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) < 1e-5


def test_pq_code_is_narrow_plan(spark):
    """No shuffle, no join in the encode plan — a pure projection."""
    import numpy as np

    from aide_spark.operators.similarity import pq_encode

    df = spark.createDataFrame(
        [(0, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    plan = pq_encode(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
