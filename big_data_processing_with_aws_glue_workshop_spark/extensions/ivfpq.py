"""IVF-PQ: the coarse quantizer composed with product quantization —
the architecture billion-scale vector indexes (FAISS IVFPQ, Jégou et
al. 2011 §IV) actually run, closing the repo's ANN method table:

- LSH (``similarity.py``): no full pass, bucket-collision candidates
- IVF (``ivf.py``): bounded partition fraction, raw vectors kept
- PQ (``pq.py``): full pass over 64x-compressed codes
- **IVF-PQ (here)**: bounded partition fraction over compressed codes —
  probe nprobe/nlist of the corpus AND read only m bytes per vector

Residual encoding (the FAISS trick): each vector quantizes ``x - c``
(its offset from its cell centroid), not ``x`` itself. Residuals are
centered near zero, so the same codebook budget spends its codewords on
a much smaller ball — lower quantization error than plain PQ at equal
m, k. With L2-normalized vectors and inner-product scoring the
decomposition is exact at the algebra level:

    cos(q, x) = q . x = q . c  +  q . (x - c)
                ^^^^^^^ scalar per (query, cell)
                           ^^^^^^^^^ ADC over residual codes

so the ADC lookup tables are shared across cells (one table per query,
T[j, code] = q_j . codebook[j, code]) and the per-cell correction is
one scalar — scoring cost is identical to plain PQ, restricted to the
probed cells.

Spark shape: the coarse centroids AND the residual codebooks are
sample-fit on the driver (one TakeOrdered pass; Lloyd's in numpy —
``ivf.py`` documents why distributed k-means would re-scan the corpus
per iteration); the corpus is assigned + residual-encoded in ONE
Arrow-batched pass; queries probe their nprobe nearest cells (computed
driver-side from the same centroid matrix — queries are the small
side); the ADC scan is corpus-parallel over probed rows only, emitting
a bounded shortlist per (partition, query); the exact-cosine rerank
(``pq.exact_rerank``) joins back just the shortlist. Deterministic
under the seed end-to-end; recall pytest-pinned, and with
``nprobe == nlist`` and ``rerank >= corpus size`` the result equals
brute force EXACTLY (tests/test_extensions.py) — the knobs trade
nothing away silently.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ivf import _kmeans_fit
from .pq import exact_rerank


def _normalize(X: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    return np.divide(X, norms, out=np.zeros_like(X), where=norms != 0)


def train_ivfpq(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 16,
    m: int = 8,
    k: int = 64,
    seed: int = 42,
    sample_cap: int = 4096,
) -> tuple[np.ndarray, np.ndarray] | tuple[None, None]:
    """Sample-fit the coarse centroids and the residual codebooks.
    Returns (centroids (nlist, d), codebooks (m, k, d/m)) — both from
    ONE driver-side sample of the normalized corpus — or (None, None)
    for an empty corpus."""
    rows = (
        corpus.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample_cap)
        .collect()
    )
    if not rows:
        return None, None
    X = _normalize(np.array([r["v"] for r in rows], dtype="float64"))
    d = X.shape[1]
    if d % m:
        raise ValueError(f"vector dim {d} not divisible by m={m} sub-spaces")
    centroids = _kmeans_fit(X, nlist, seed)
    d2 = (
        (X * X).sum(axis=1)[:, None]
        - 2.0 * X @ centroids.T
        + (centroids * centroids).sum(axis=1)[None, :]
    )
    R = X - centroids[d2.argmin(axis=1)]  # residuals: what PQ quantizes
    dsub = d // m
    codebooks = np.stack(
        [
            _kmeans_fit(R[:, j * dsub : (j + 1) * dsub], k, seed + 1 + j)
            for j in range(m)
        ]
    )
    return centroids, codebooks


def ivfpq_encode(
    corpus: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One Arrow-batched pass: normalize, assign the nearest cell, and
    quantize the RESIDUAL per sub-space. Returns ``(vec_id, cell,
    codes array<int>)`` — m bytes + a cell id per vector."""
    from ..queries._tables import parallelize_scan

    m, k, dsub = codebooks.shape
    cmat, cb = centroids, codebooks
    cnorm2 = (cmat * cmat).sum(axis=1)
    cb_norm2 = (cb * cb).sum(axis=2)  # (m, k)

    @F.pandas_udf("struct<cell:int,codes:array<int>>")
    def _encode(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for vecs in it:
            X = _normalize(np.vstack(vecs.to_numpy()).astype("float64"))
            d2 = (
                (X * X).sum(axis=1)[:, None]
                - 2.0 * X @ cmat.T
                + cnorm2[None, :]
            )
            cells = d2.argmin(axis=1)
            R = X - cmat[cells]
            codes = np.empty((len(X), m), dtype="int32")
            for j in range(m):
                sub = R[:, j * dsub : (j + 1) * dsub]
                dd = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2.0 * sub @ cb[j].T
                    + cb_norm2[j][None, :]
                )
                codes[:, j] = dd.argmin(axis=1)
            yield pd.DataFrame(
                {"cell": cells.astype("int32"), "codes": list(codes)}
            )

    corpus = parallelize_scan(corpus, id_col)
    return corpus.select(
        F.col(id_col).alias("vec_id"), _encode(F.col(vec_col)).alias("__e")
    ).select(
        "vec_id",
        F.col("__e.cell").alias("cell"),
        F.col("__e.codes").alias("codes"),
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    kneighbors: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    k: int = 64,
    rerank: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-``kneighbors`` via IVF-PQ: probe each
    query's ``nprobe`` nearest cells, ADC-score only their rows from
    residual codes (score = q.c + sum_j T[j, code_j]), shortlist
    ``rerank`` deep per (partition, query), exact-cosine rerank. Output
    schema matches the family: (query_id, rank, neighbor_id, cos_sim)
    with cos_sim EXACT."""
    centroids, codebooks = train_ivfpq(
        corpus, vec_col, id_col, nlist=nlist, m=m, k=k, seed=seed
    )
    if centroids is None:
        raise ValueError("cannot build an IVF-PQ index over an empty corpus")
    encoded = ivfpq_encode(corpus, centroids, codebooks, vec_col, id_col)

    q_rows = (
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("v"))
        .collect()
    )
    if not q_rows:
        # an empty-but-valid query frame returns an empty result, not a
        # numpy axis error out of the normalize (r9 review)
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, rank int, neighbor_id long, cos_sim double"
        )
    qids = np.array([r["qid"] for r in q_rows])
    Qn = _normalize(np.array([r["v"] for r in q_rows], dtype="float64"))
    mm, kk, dsub = codebooks.shape

    # probe ranking uses the quantizer's own metric (Euclidean on the
    # normalized space) — same contract as ivf.py's probe ranking
    qd2 = (
        (Qn * Qn).sum(axis=1)[:, None]
        - 2.0 * Qn @ centroids.T
        + (centroids * centroids).sum(axis=1)[None, :]
    )
    probe_sets = [
        set(np.argsort(qd2[i], kind="stable")[:nprobe].tolist())
        for i in range(len(qids))
    ]
    cell_dot = Qn @ centroids.T  # (nq, nlist): the per-cell scalar term
    tables = np.stack(
        [Qn[:, j * dsub : (j + 1) * dsub] @ codebooks[j].T for j in range(mm)],
        axis=1,
    )  # (nq, m, k)
    shortlist = int(rerank)

    def _adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            cells = pdf["cell"].to_numpy()
            C = np.vstack(pdf["codes"].to_numpy()).astype("int64")
            ids = pdf["vec_id"].to_numpy()
            q_out, v_out = [], []
            for qi in range(len(qids)):
                mask = np.isin(cells, list(probe_sets[qi]))
                if not mask.any():
                    continue
                Cm, idm = C[mask], ids[mask]
                scores = cell_dot[qi, cells[mask]].astype("float64")
                for j in range(mm):
                    scores += tables[qi, j, Cm[:, j]]
                top = min(shortlist, len(Cm))
                idx = np.argpartition(-scores, top - 1)[:top]
                q_out.append(np.full(top, qids[qi]))
                v_out.append(idm[idx])
            if not q_out:
                continue
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
