"""Product-quantization ANN (PQ + ADC, Jégou et al. 2011) — the
memory-bounded member of the similarity family, next to the hyperplane
LSH (``similarity.py``) and the IVF coarse quantizer (``ivf.py``).

What PQ buys at 100 TB: the corpus's float vectors (dim d, 8d bytes)
are replaced by m sub-space codeword ids (m bytes at 256 codewords) —
a 64-dim float64 corpus compresses 64x, which is the difference
between an index that fits executor memory and one that doesn't.
Scoring never touches the original vectors: a query builds an m x k
lookup table of sub-space dot products once, and every corpus vector's
approximate score is m table lookups (ADC — asymmetric distance
computation).

Cosine contract: vectors are L2-NORMALIZED before quantization (the
standard trick), making inner product == cosine, so the ADC score
approximates cos(q, x) directly and ranks compatibly with
``cosine_topk`` / ``ivf_topk`` / ``ann_lsh_topk``.

Spark shape: training is sample-fit on the driver exactly like the IVF
index (one TakeOrdered pass, m tiny k-means fits in numpy — a
distributed fit would re-scan the corpus per iteration); encoding is
ONE Arrow-batched pass against the broadcast codebooks; ADC scoring is
corpus-parallel with the query lookup tables broadcast in the closure,
emitting only a bounded top-shortlist per (partition, query); the final
exact-cosine RERANK of the shortlist (standard PQ practice) joins back
just ``rerank`` candidate vectors per query. Deterministic under the
seed end-to-end. Recall is pytest-pinned against the exact brute-force
top-k (tests/test_extensions.py), the same contract class as the other
approximate paths.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..queries.vectors import dot, norm
from .ivf import _kmeans_fit


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 64,
    seed: int = 42,
    sample_cap: int = 4096,
    iters: int = 12,
) -> np.ndarray | None:
    """Fit m per-sub-space codebooks of k codewords each on a
    deterministic driver-side sample of the L2-normalized corpus.
    Returns an (m, k, d/m) array, or None for an empty corpus. The
    vector dimension must divide evenly by m."""
    rows = (
        corpus.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample_cap)
        .collect()
    )
    if not rows:
        return None
    X = np.array([r["v"] for r in rows], dtype="float64")
    d = X.shape[1]
    if d % m:
        raise ValueError(f"vector dim {d} not divisible by m={m} sub-spaces")
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    X = np.divide(X, norms, out=np.zeros_like(X), where=norms != 0)
    dsub = d // m
    return np.stack(
        [
            _kmeans_fit(X[:, j * dsub : (j + 1) * dsub], k, seed + j, iters)
            for j in range(m)
        ]
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One Arrow-batched pass: L2-normalize each vector and quantize each
    sub-space to its nearest codeword. Returns ``(vec_id, codes
    array<int>)`` — the m-byte-per-vector index."""
    from ..queries._tables import parallelize_scan

    m, k, dsub = codebooks.shape
    cb = codebooks
    cb_norm2 = (cb * cb).sum(axis=2)  # (m, k)

    @F.pandas_udf("array<int>")
    def _encode(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in it:
            X = np.vstack(vecs.to_numpy()).astype("float64")
            norms = np.linalg.norm(X, axis=1, keepdims=True)
            X = np.divide(X, norms, out=np.zeros_like(X), where=norms != 0)
            codes = np.empty((len(X), m), dtype="int32")
            for j in range(m):
                sub = X[:, j * dsub : (j + 1) * dsub]
                d2 = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2.0 * sub @ cb[j].T
                    + cb_norm2[j][None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd.Series(list(codes))

    corpus = parallelize_scan(corpus, id_col)
    return corpus.select(
        F.col(id_col).alias("vec_id"), _encode(F.col(vec_col)).alias("codes")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    kneighbors: int = 5,
    m: int = 8,
    k: int = 64,
    rerank: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-``kneighbors``: PQ-encode the corpus, ADC-
    score it against every query (corpus-parallel, query tables
    broadcast), keep a ``rerank``-deep shortlist per query, then rerank
    the shortlist with exact cosine against the original vectors.
    Output schema matches the family: (query_id, rank, neighbor_id,
    cos_sim) with cos_sim EXACT (rerank recomputes it)."""
    codebooks = train_pq_codebooks(
        corpus, vec_col, id_col, m=m, k=k, seed=seed
    )
    if codebooks is None:
        raise ValueError("cannot build a PQ index over an empty corpus")
    encoded = pq_encode(corpus, codebooks, vec_col, id_col)

    q_rows = (
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("v"))
        .collect()
    )
    if not q_rows:
        # empty-but-valid query frame: empty result, not a numpy axis
        # error out of the normalize (r9 review, shared with ivfpq)
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, rank int, neighbor_id long, cos_sim double"
        )
    qids = np.array([r["qid"] for r in q_rows])
    Q = np.array([r["v"] for r in q_rows], dtype="float64")
    qnorms = np.linalg.norm(Q, axis=1, keepdims=True)
    Qn = np.divide(Q, qnorms, out=np.zeros_like(Q), where=qnorms != 0)
    mm, kk, dsub = codebooks.shape
    # per-query ADC lookup tables: T[q, j, c] = dot(q_j, codebook[j, c])
    tables = np.stack(
        [
            Qn[:, j * dsub : (j + 1) * dsub] @ codebooks[j].T
            for j in range(mm)
        ],
        axis=1,
    )  # (nq, m, k)
    shortlist = int(rerank)

    def _adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # mapInPandas, not a pandas_udf: each corpus batch emits
        # nq * shortlist candidate ROWS (a different row count than the
        # input batch — exactly what mapInPandas exists for)
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.vstack(pdf["codes"].to_numpy()).astype("int64")  # (nb, m)
            ids = pdf["vec_id"].to_numpy()
            # scores[b, q] = sum_j tables[q, j, C[b, j]]
            scores = np.zeros((len(C), len(qids)))
            for j in range(mm):
                scores += tables[:, j, :][:, C[:, j]].T  # (nb, nq)
            top = min(shortlist, len(C))
            q_out, v_out = [], []
            for qi in range(len(qids)):
                idx = np.argpartition(-scores[:, qi], top - 1)[:top]
                q_out.append(np.full(top, qids[qi]))
                v_out.append(ids[idx])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(q_out),
                    "neighbor_id": np.concatenate(v_out),
                }
            )

    cand = (
        encoded.mapInPandas(_adc, "query_id long, neighbor_id long")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .distinct()
    )
    return exact_rerank(cand, corpus, queries, kneighbors, vec_col, id_col)


def exact_rerank(
    cand: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    kneighbors: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact-cosine rerank of a ``(query_id, neighbor_id)`` shortlist
    against the original vectors — the standard PQ/IVF-PQ finishing
    stage, shared by both index families. Output: (query_id, rank,
    neighbor_id, cos_sim) with cos_sim EXACT."""
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qnorm"),
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        norm(F.col(vec_col)).alias("nnorm"),
    )
    scored = (
        cand.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
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
        .filter(F.col("rank") <= kneighbors)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )
