"""IVF (inverted-file) approximate nearest-neighbor search — the coarse-
quantizer alternative to the hyperplane LSH in ``similarity.py``.

Index: a seeded k-means partitions the corpus into nlist cells; each vector
is stored under its nearest centroid. Query: probe the nprobe nearest cells
only, then exact-cosine rerank within them. At 100 TB the cell assignment is
the partition key — a probe touches nprobe/nlist of the data instead of all
of it.

Training is SAMPLE-BASED by design, not a distributed k-means: a
deterministic fixed-size sample is collected to the driver (one TakeOrdered
pass, bounded bytes), Lloyd's iterations run in numpy there (milliseconds
for 4096 x 64), and the full corpus is assigned in ONE Arrow-batched pass
against the broadcast centroid matrix. A k-means|| fit would re-scan 100 TB
once per iteration; sample-fit + broadcast-assign scans it once total,
which is how production IVF indexes (FAISS et al.) train at scale. Under a
fixed seed the whole pipeline is deterministic.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..queries.vectors import dot, norm


def _kmeans_fit(sample: np.ndarray, nlist: int, seed: int, iters: int = 15) -> np.ndarray:
    """Seeded Lloyd's on a driver-side sample. Empty clusters keep their
    previous centroid (deterministic; they simply attract no members)."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    k = min(nlist, n)
    centroids = sample[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        # pairwise squared distances via ||x||^2 - 2 x.c + ||c||^2
        d2 = (
            (sample * sample).sum(axis=1)[:, None]
            - 2.0 * sample @ centroids.T
            + (centroids * centroids).sum(axis=1)[None, :]
        )
        labels = d2.argmin(axis=1)
        for c in range(k):
            members = sample[labels == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    if k < nlist:  # degenerate corpus smaller than nlist: pad by repetition
        centroids = np.vstack([centroids, centroids[np.arange(nlist - k) % k]])
    return centroids


def train_ivf_index(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int | None = 16,
    seed: int = 42,
    sample_cap: int = 4096,
    iters: int = 15,
    emit_angle: bool = False,
):
    """Returns (assigned_corpus, centroids_df, centroid_matrix): corpus rows
    tagged with their cell id, the centroid table for query-side probing,
    and the raw numpy centroid matrix — or (None, None, None) for an empty
    corpus.

    One TakeOrdered sample pass + one assignment pass over the corpus; the
    sample order key is ``xxhash64(id)`` so the sample is deterministic and
    independent of partitioning. ``iters`` trades centroid quality for
    driver CPU only — callers that need just a coarse partition (e.g. the
    exact near-dup pruner, whose recall is guaranteed by the triangle
    inequality regardless of cluster quality) can lower it freely.

    ``nlist=None`` (r17) derives the cell count from the sample the fit
    already collects — ``derive_nlist(len(sample))`` — instead of making
    the caller pay a separate COUNT job for the same decision: below the
    sample cap the sample size IS the exact corpus count, and at/above the
    cap ``derive_nlist`` is pinned at its cap for every count >= 1024, so
    the derived value equals ``derive_nlist(true count)`` exactly (holds
    while the default cap 32 <= isqrt(sample_cap) = 64 — raise-checked).

    ``emit_angle`` adds a ``theta`` column — the angle (radians) between
    each member and its cell centroid, computed from the SAME matmul that
    picked the cell (no extra pass, no Catalyst fold expressions); a
    zero-norm member or centroid yields the worst-case pi so downstream
    triangle-inequality bounds stay conservative.
    """
    sample_rows = (
        corpus.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample_cap)
        .collect()
    )
    if not sample_rows:
        # empty corpus: nothing to index. Returning (None, None, None) lets
        # callers choose their empty-result shape instead of hitting an
        # obscure numpy axis error inside Lloyd's.
        return None, None, None
    if nlist is None:
        from .similarity import derive_nlist, _DERIVED_NLIST_CAP

        if _DERIVED_NLIST_CAP ** 2 > sample_cap:
            raise ValueError(
                "nlist=None requires derive_nlist's cap^2 <= sample_cap "
                "(otherwise the sample-derived value can differ from the "
                f"true-count one): cap={_DERIVED_NLIST_CAP}, "
                f"sample_cap={sample_cap}"
            )
        nlist = derive_nlist(len(sample_rows))
    sample = np.array([r["v"] for r in sample_rows], dtype="float64")
    centroids_np = _kmeans_fit(sample, nlist, seed, iters)
    assigned = assign_to_centroids(
        corpus, centroids_np, vec_col=vec_col, id_col=id_col, emit_angle=emit_angle
    )
    centroids = corpus.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids_np)],
        "cell int, centroid array<double>",
    )
    return assigned, centroids, centroids_np


def assign_to_centroids(
    corpus: DataFrame,
    centroids_np: "np.ndarray",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    emit_angle: bool = False,
) -> DataFrame:
    """Assign every corpus vector to its nearest FIXED centroid — the
    assignment half of :func:`train_ivf_index`, exposed separately so
    incremental maintenance (plans/incremental.py's semantic refresh)
    can route new vectors against the PINNED centroid matrix its
    standing state was built with instead of refitting (refitting would
    silently re-cell the corpus and invalidate every stored angle).

    ``emit_angle`` adds each member's angle to its centroid from the
    SAME matmul (zero-norm rows report worst-case pi so downstream
    triangle-inequality bounds stay conservative)."""
    # the assignment matmul is the expensive narrow stage; an under-split
    # source (one row group) would run it on one core. Keyed on the vector
    # id: deterministic, and downstream per-cell work reshuffles anyway.
    from ..queries._tables import parallelize_scan

    corpus = parallelize_scan(corpus, id_col)

    # broadcast-assign: one Arrow-batched matmul per batch against the
    # (nlist x dim) centroid matrix captured in the closure
    cmat = np.asarray(centroids_np, dtype="float64")
    cnorm2 = (cmat * cmat).sum(axis=1)
    cnorm = np.sqrt(cnorm2)

    @F.pandas_udf("struct<cell:int,theta:double>")
    def _assign(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for vecs in it:
            X = np.vstack(vecs.to_numpy()).astype("float64")
            dots = X @ cmat.T
            xnorm2 = (X * X).sum(axis=1)
            d2 = xnorm2[:, None] - 2.0 * dots + cnorm2[None, :]
            cells = d2.argmin(axis=1)
            rows = np.arange(len(X))
            denom = np.sqrt(xnorm2) * cnorm[cells]
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = dots[rows, cells] / denom
            theta = np.where(
                denom == 0.0, np.pi, np.arccos(np.clip(cos, -1.0, 1.0))
            )
            yield pd.DataFrame(
                {"cell": cells.astype("int32"), "theta": theta}
            )

    return corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        _assign(F.col(vec_col)).alias("__a"),
    ).select(
        "vec_id",
        "embedding",
        F.col("__a.cell").alias("cell"),
        *([F.col("__a.theta").alias("theta")] if emit_angle else []),
    )


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
    if assigned is None:
        raise ValueError("cannot build an IVF index over an empty corpus")

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
