"""Approximate nearest-neighbor search over embedding columns.

Random-hyperplane LSH: L independent tables of P hyperplanes each; a
vector's bucket in a table is the P-bit sign pattern of its projections.
Query cost is (candidates-in-matching-buckets x exact rerank) instead of
the full corpus — at 100 TB the bucket join replaces the cross join.

Hyperplanes are seeded driver-side constants (deterministic, no runtime
randomness) injected as array literals; projections fold sequentially
JVM-side like the exact path in queries/vectors.py.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int) -> list[list[list[float]]]:
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]


def lsh_bucketize(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(id, table_idx, bucket): one row per vector per table.

    Projection is an Arrow-batched pandas UDF doing ONE numpy matmul
    (batch x dim) @ (dim x tables*planes) per batch — the documented
    slow-path exception: unrolling tables*planes fold expressions into
    Catalyst produced multi-thousand-term codegen units (~10s compile);
    the vectorized matmul is both faster to plan and to run. Sign bits are
    robust to summation-order effects, so determinism is unaffected."""
    planes = np.array(_hyperplanes(dim, n_planes, n_tables, seed))  # (T, P, D)
    proj_matrix = planes.reshape(n_tables * n_planes, dim).T  # (D, T*P)
    weights = np.power(2.0, np.arange(n_planes))  # bit packing per table

    @F.pandas_udf("array<long>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype("float64")  # (B, D)
        signs = (mat @ proj_matrix) >= 0  # (B, T*P)
        bits = signs.reshape(len(mat), n_tables, n_planes)
        packed = (bits * weights).sum(axis=2).astype("int64")  # (B, T)
        return pd.Series(list(packed))

    bucketed = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.posexplode(_buckets(F.col(vec_col))).alias("table_idx", "bucket"),
    )
    return bucketed


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: join query buckets to corpus buckets per table,
    union candidates across tables (distinct), exact-cosine rerank, then
    window top-k. Output: (query_id, rank, neighbor_id, cos_sim)."""
    from pyspark.sql import Window

    from ..queries.vectors import dot, norm

    cb = lsh_bucketize(corpus, vec_col, id_col, dim, n_planes, n_tables, seed)
    qb = lsh_bucketize(queries, vec_col, id_col, dim, n_planes, n_tables, seed)
    # dedup candidate PAIRS (ids only — distinct over array columns would
    # shuffle the vectors themselves), then re-attach vectors + precomputed
    # norms for the exact rerank
    cand_pairs = (
        qb.select(F.col("vec_id").alias("query_id"), "table_idx", "bucket")
        .join(
            cb.select(F.col("vec_id").alias("neighbor_id"), "table_idx", "bucket"),
            ["table_idx", "bucket"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qnorm"),
    )
    n_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        norm(F.col(vec_col)).alias("nnorm"),
    )
    scored = (
        cand_pairs.join(F.broadcast(q_vecs), "query_id")
        .join(n_vecs, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("nv")) / (F.col("qnorm") * F.col("nnorm"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )
