"""Similarity search over embedding columns — the scale paths beyond
brute force (which lives in queries.py as ``ann_cosine_topk``).

* Random-hyperplane LSH buckets: queries.py ``ann_lsh_buckets`` (md5-derived
  planes, oracle-checked).
* IVF (inverted-file) index here: a KMeans coarse quantizer (MLlib, JVM-side)
  assigns every vector to a centroid; search probes only the ``nprobe``
  nearest clusters — at 10^9+ vectors this turns a full scan into a
  partition-pruned scan when the table is written partitioned by cluster id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def ivf_index(embeddings: DataFrame, k: int = 16, seed: int = 42) -> DataFrame:
    """Assign each (vec_id, embedding) to a KMeans cluster.

    Returns the input plus a ``cluster`` column. At production scale, write
    the result ``partitionBy("cluster")`` so probes prune partitions.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = embeddings.withColumn("features", array_to_vector("embedding"))
    model = KMeans(k=k, seed=seed, featuresCol="features", predictionCol="cluster").fit(
        feats
    )
    assigned = model.transform(feats).drop("features")
    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    centroids_df = embeddings.sparkSession.createDataFrame(
        centroids, "cluster int, centroid array<double>"
    )
    return assigned, centroids_df


def ivf_search(
    assigned: DataFrame,
    centroids: DataFrame,
    query: list[float],
    nprobe: int = 4,
    topk: int = 10,
) -> DataFrame:
    """Top-k by cosine within the ``nprobe`` clusters nearest to the query.

    The query vector is a literal (broadcast by construction); only the
    probed clusters are scanned — with a cluster-partitioned table this is
    partition pruning, not a filter.
    """
    q = F.array(*[F.lit(float(x)) for x in query])
    probe = (
        centroids.select("cluster", cosine(F.col("centroid"), q).alias("csim"))
        .orderBy(F.desc("csim"))
        .limit(nprobe)
    )
    return (
        assigned.join(F.broadcast(probe.select("cluster")), "cluster", "left_semi")
        .select("vec_id", cosine(F.col("embedding"), q).alias("sim"))
        .orderBy(F.desc("sim"), "vec_id")
        .limit(topk)
    )
