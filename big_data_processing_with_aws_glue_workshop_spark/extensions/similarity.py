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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..queries.vectors import cosine


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int) -> list[list[list[float]]]:
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]


def _bucket(vec: Column, planes: list[list[float]]) -> Column:
    """P-bit sign pattern of the projections onto ``planes`` as a bigint."""
    acc = F.lit(0).cast("bigint")
    for p_idx, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(w) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        bit = F.when(proj >= 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        acc = acc + F.shiftleft(bit, p_idx)
    return acc


def lsh_bucketize(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(id, table_idx, bucket): one row per vector per table."""
    planes = _hyperplanes(dim, n_planes, n_tables, seed)
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("table_idx"),
                _bucket(F.col(vec_col), planes[t]).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.explode(buckets).alias("tb"),
    ).select(
        "vec_id",
        "embedding",
        F.col("tb.table_idx").alias("table_idx"),
        F.col("tb.bucket").alias("bucket"),
    )


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

    cb = lsh_bucketize(corpus, vec_col, id_col, dim, n_planes, n_tables, seed)
    qb = lsh_bucketize(queries, vec_col, id_col, dim, n_planes, n_tables, seed).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        "table_idx",
        "bucket",
    )
    candidates = (
        qb.join(
            cb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("nv"),
                "table_idx",
                "bucket",
            ),
            ["table_idx", "bucket"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "nv")
        .distinct()
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("nv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )
