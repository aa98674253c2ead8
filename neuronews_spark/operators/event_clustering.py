"""Event clustering over embedding columns — the reference's KMeans event
grouping (``/root/reference/src/nlp/event_clusterer.py:151-260``: embed →
KMeans with silhouette-selected k → per-cluster summary stats,
``:300-520``) re-hosted on ``pyspark.ml.clustering.KMeans``.

The embeddings stay distributed end-to-end: ``array_to_vector`` converts
the ``array<float>`` column JVM-side (no Python workers), the fit runs
Spark's parallel Lloyd iterations, and the summary is one groupBy. Model
selection mirrors the reference's auto-k (``:180-220``) as a small driver
loop over candidate k values scored by a distributed cost (WSSSE) —
silhouette on a sample would also work but costs an O(n·k) pass per k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_clusters(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 17,
    max_iter: int = 20,
) -> DataFrame:
    """Assign each vector to one of ``k`` clusters:
    (id, cluster_id, dist_to_centroid)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = df.select(
        F.col(id_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    assigned = model.transform(feats)
    # distance to own centroid, JVM-side: broadcast the k centroids as a
    # literal array-of-arrays and index by the prediction
    cents = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in c])
            for c in model.clusterCenters()
        ]
    )
    v = vector_to_array(F.col("features"))
    diff = F.zip_with(
        v, F.element_at(cents, F.col("prediction") + 1), lambda a, b: a - b
    )
    dist = F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x))
    return assigned.select(
        F.col(id_col),
        F.col("prediction").alias("cluster_id"),
        F.round(dist, 6).alias("dist_to_centroid"),
    )


def cluster_summary(assignments: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Per-cluster summary (event_clusterer.py:300-520 shape): member
    count, mean/max distance to centroid, sample member ids."""
    return assignments.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg("dist_to_centroid"), 6).alias("avg_dist"),
        F.round(F.max("dist_to_centroid"), 6).alias("max_dist"),
        F.slice(F.array_sort(F.collect_list(id_col)), 1, 5).alias("sample_ids"),
    )


def auto_k(
    df: DataFrame,
    candidates: tuple[int, ...] = (4, 6, 8, 12),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 17,
) -> int:
    """Pick k by the elbow of the WSSSE curve (largest relative drop),
    mirroring the reference's auto-k selection loop. Each candidate fit is
    fully distributed; only the k-sized cost list reaches the driver."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    ).persist()
    # k=1 (total within-set SSE around the global mean) anchors the curve:
    # without it the largest relative drop always chases ever-finer splits
    # of residual noise. Spark's KMeans needs k ≥ 2, so compute it directly.
    from pyspark.ml.functions import vector_to_array

    arr = feats.select(vector_to_array(F.col("features")).alias("a"))
    d = int(arr.select(F.size("a").alias("d")).first()["d"])
    mean_row = arr.agg(
        *[F.avg(F.element_at("a", i + 1)).alias(f"m{i}") for i in range(d)]
    ).first()
    mean = F.array(*[F.lit(float(mean_row[f"m{i}"])) for i in range(d)])
    sse1 = arr.select(
        F.sum(
            F.aggregate(
                F.zip_with(F.col("a"), mean, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("sse")
    ).first()["sse"]

    ks = (1,) + tuple(candidates)
    costs = [float(sse1)]
    for k in candidates:
        model = KMeans(k=k, seed=seed, maxIter=10).fit(feats)
        costs.append(model.summary.trainingCost)
    feats.unpersist()
    drops = [
        (costs[i - 1] - costs[i]) / max(costs[i - 1], 1e-12)
        for i in range(1, len(costs))
    ]
    return ks[1 + max(range(len(drops)), key=lambda i: drops[i])]
