"""Similarity search over the ``embeddings`` table (array<float> column).

Brute-force cosine top-k is the exact baseline (and the oracle-checked
query); the LSH-bucketed approximate variant lives in
extensions/similarity.py (rows-only check — not SQL-expressible).

Numeric determinism: dot products fold left-to-right over the array with a
double accumulator (F.aggregate), which matches DuckDB's sequential
list_dot_product bit-for-bit (verified empirically), so raw doubles are
emitted without rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._tables import load

N_QUERIES = 20  # first N vec_ids serve as the query set
TOP_K = 5


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product of two float arrays (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for the first 20 vectors, brute force.

    Plan shape: the tiny query side is broadcast against the full table
    (a broadcast nested-loop join), then per-query top-k via window rank —
    the pattern that scales to 'small query batch x huge corpus'. Tiebreak
    on neighbor id keeps LIMIT deterministic."""
    e = load(spark, sf_dir, "embeddings")
    # norms are precomputed per vector BEFORE the pair join: one fold per
    # pair instead of three (dot + both norms) — 3x less expression work on
    # the quadratic path, same values bit-for-bit
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        norm(F.col("embedding")).alias("qnorm"),
    )
    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("nv"),
        norm(F.col("embedding")).alias("nnorm"),
        F.col("label").alias("neighbor_label"),
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            (dot(F.col("qv"), F.col("nv")) / (F.col("qnorm") * F.col("nnorm"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "neighbor_label", "cos_sim")
    )


def q_label_similarity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean pairwise cosine within vs across labels for a deterministic
    probe subset — a separability profile. Sums go through the sequential
    fold; the final mean is a single double division."""
    e = load(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        F.col("label").alias("label_a"),
    )
    other = e.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        F.col("label").alias("label_b"),
    )
    pairs = (
        probe.crossJoin(other)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.when(F.col("label_a") == F.col("label_b"), 1)
            .otherwise(0)
            .cast("int")
            .alias("same_label"),
            cosine(F.col("va"), F.col("vb")).alias("cos_sim"),
        )
    )
    # decimal-exact mean: quantize each similarity to 9 dp (floor) before the
    # sum so accumulation order cannot perturb the result
    q = F.floor(F.col("cos_sim") * F.lit(1e9)).cast("decimal(28,0)")
    return (
        pairs.groupBy("same_label")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(q).alias("_sum_q"),
        )
        .select(
            "same_label",
            "n_pairs",
            (F.col("_sum_q").cast("double") / (F.col("n_pairs") * F.lit(1e9))).alias(
                "mean_cos_sim"
            ),
        )
    )


NEAR_DUP_THRESHOLD = 0.45  # calibrated: max pairwise cosine in testdata ~0.51


def q_embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold — exact
    all-pairs VERIFICATION baseline (a < b). The production scale path is
    q_embedding_near_dup_clustered (triangle-inequality cluster pruning,
    same oracle, no cross join); keep this crossJoin form only as the
    ground-truth twin."""
    e = load(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        norm(F.col("embedding")).alias("norm_a"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        norm(F.col("embedding")).alias("norm_b"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("norm_a") * F.col("norm_b"))).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= NEAR_DUP_THRESHOLD)
    )


def q_embedding_near_dup_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine near-dup pairs via the SCALE path: k-means cluster pruning with
    the angular triangle inequality (extensions/similarity.py). Exact by
    construction (recall 1.0 — pruned cluster pairs provably cannot contain a
    qualifying pair), so it shares the all-pairs oracle; the crossJoin form in
    q_embedding_near_dup_pairs is the verification baseline."""
    from ..extensions.similarity import near_dup_pairs_clustered

    e = load(spark, sf_dir, "embeddings")
    return near_dup_pairs_clustered(
        e, threshold=NEAR_DUP_THRESHOLD, nlist=16, seed=42
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors via random-hyperplane LSH (rows-only
    check: approximate by design; recall vs the exact top-k is asserted in
    tests/test_extensions.py). Implementation: extensions/similarity.py."""
    from ..extensions.similarity import ann_lsh_topk

    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    return ann_lsh_topk(e, queries, k=TOP_K, n_planes=4, n_tables=16, seed=42)


def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer ANN (rows-only: k-means index is approximate by
    design; recall vs brute force asserted in tests/test_extensions.py).
    Implementation: extensions/ivf.py."""
    from ..extensions.ivf import ivf_topk

    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    return ivf_topk(e, queries, k=TOP_K, nlist=16, nprobe=6, seed=42)


QUERIES = {
    "cosine_topk": q_cosine_topk,
    "label_similarity_profile": q_label_similarity_profile,
    "embedding_near_dup_pairs": q_embedding_near_dup_pairs,
    "embedding_near_dup_clustered": q_embedding_near_dup_clustered,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ivf_ann_topk": q_ivf_ann_topk,
}

ORACLES = {
    "cosine_topk": f"""
        WITH q AS (
          SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id < {N_QUERIES}
        ),
        c AS (
          SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS nv,
                 label AS neighbor_label
          FROM embeddings
        ),
        scored AS (
          SELECT query_id, neighbor_id, neighbor_label,
                 list_dot_product(qv, nv)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv)))
                   AS cos_sim
          FROM q, c
          WHERE query_id <> neighbor_id
        ),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
               neighbor_label, cos_sim
        FROM ranked WHERE rank <= {TOP_K}
    """,
    "label_similarity_profile": """
        WITH probe AS (
          SELECT vec_id, embedding::DOUBLE[] AS v, label
          FROM embeddings WHERE vec_id % 10 = 0
        ),
        pairs AS (
          SELECT CAST(CASE WHEN a.label = b.label THEN 1 ELSE 0 END AS INTEGER)
                   AS same_label,
                 list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
                   AS cos_sim
          FROM probe a JOIN probe b ON a.vec_id < b.vec_id
        )
        SELECT same_label,
               COUNT(1) AS n_pairs,
               CAST(SUM(CAST(FLOOR(cos_sim * 1e9) AS DECIMAL(28,0))) AS DOUBLE)
                 / (COUNT(1) * 1e9) AS mean_cos_sim
        FROM pairs
        GROUP BY same_label
    """,
    "embedding_near_dup_pairs": f"""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
                 AS cos_sim
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.e, b.e)
                / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
              >= {NEAR_DUP_THRESHOLD}
    """,
    # the clustered scale path is EXACT (triangle-inequality pruning never
    # drops a qualifying pair), so it is held to the same all-pairs oracle
    "embedding_near_dup_clustered": f"""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
                 AS cos_sim
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.e, b.e)
                / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
              >= {NEAR_DUP_THRESHOLD}
    """,
}
