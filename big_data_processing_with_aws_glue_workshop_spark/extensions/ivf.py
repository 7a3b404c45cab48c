"""IVF (inverted-file) approximate nearest-neighbor search — the coarse-
quantizer alternative to the hyperplane LSH in ``similarity.py``.

Index: a seeded k-means (pyspark.ml, deterministic via initSteps + seed)
partitions the corpus into nlist cells; each vector is stored under its
nearest centroid. Query: probe the nprobe nearest cells only, then exact-
cosine rerank within them. At 100 TB the cell assignment is the partition
key — a probe touches nprobe/nlist of the data instead of all of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..queries.vectors import dot, norm


def _require_ml():
    try:
        from pyspark.ml.clustering import KMeans  # noqa: F401
        from pyspark.ml.functions import array_to_vector  # noqa: F401
    except ImportError as e:  # pragma: no cover - pyspark.ml ships with pyspark
        raise ModuleNotFoundError("pyspark.ml is required for IVF indexing") from e


def train_ivf_index(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 16,
    seed: int = 42,
    max_iter: int = 20,
    init_mode: str = "k-means||",
):
    """Returns (assigned_corpus, centroids_df, model): corpus rows tagged
    with their cell id, plus the centroid table for query-side probing.

    ``max_iter`` / ``init_mode`` let callers that only need a coarse
    partition (e.g. the exact near-dup pruner, whose recall is guaranteed
    by the triangle inequality regardless of cluster quality) trade
    centroid quality for fewer distributed passes; both are deterministic
    under a fixed seed."""
    _require_ml()
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    featurized = corpus.withColumn("__features", array_to_vector(F.col(vec_col)))
    model = KMeans(
        k=nlist,
        seed=seed,
        featuresCol="__features",
        predictionCol="__cell",
        maxIter=max_iter,
        initMode=init_mode,
    ).fit(featurized)
    assigned = model.transform(featurized).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.col("__cell").alias("cell"),
    )
    centroids = corpus.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    return assigned, centroids, model


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: assign corpus to cells, route each query to its
    nprobe nearest centroids (broadcast centroid table — tiny), rerank
    exactly within the probed cells."""
    assigned, centroids, _ = train_ivf_index(corpus, vec_col, id_col, nlist, seed)

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qnorm"),
    )
    # probe ranking must use the SAME metric the k-means quantizer assigned
    # with (Euclidean): rank by -||q-c||^2 = 2*dot(q,c) - ||c||^2 (the
    # ||q||^2 term is constant per query). Raw dot product would bias toward
    # large-norm centroids and systematically miss the assigned cells.
    with_norm2 = centroids.withColumn(
        "__cnorm2", dot(F.col("centroid"), F.col("centroid"))
    )
    qc = q.crossJoin(F.broadcast(with_norm2)).select(
        "query_id",
        "qv",
        "qnorm",
        "cell",
        (F.lit(2.0) * dot(F.col("qv"), F.col("centroid")) - F.col("__cnorm2")).alias(
            "__sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__sim").desc(), F.col("cell"))
    probed = (
        qc.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= nprobe)
        .select("query_id", "qv", "qnorm", "cell")
    )

    candidates = probed.join(assigned, "cell").filter(
        F.col("query_id") != F.col("vec_id")
    )
    scored = candidates.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            dot(F.col("qv"), F.col("embedding"))
            / (F.col("qnorm") * norm(F.col("embedding")))
        ).alias("cos_sim"),
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )
