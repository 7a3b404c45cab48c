"""Approximate nearest-neighbor search over embedding columns.

Random-hyperplane LSH: L independent tables of P hyperplanes each; a
vector's bucket in a table is the P-bit sign pattern of its projections.
Query cost is (candidates-in-matching-buckets x exact rerank) instead of
the full corpus — at 100 TB the bucket join replaces the cross join.

Hyperplanes are seeded driver-side constants (deterministic, no runtime
randomness) injected as array literals; projections fold sequentially
JVM-side like the exact path in queries/vectors.py.

Also here: ``near_dup_pairs_clustered`` — the EXACT (recall-1.0) pruned
alternative to the all-pairs cosine near-dup cross join, via the angular
triangle inequality over a k-means coarse partition.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import tracked_cache


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
    from ..queries._tables import parallelize_scan

    # the projection matmul is the expensive narrow stage; under-split
    # sources (one row group) would run it on one core
    df = parallelize_scan(df, id_col)
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


# Block-prefilter slack: numpy's pairwise-summation float64 dot differs
# from the exact JVM sequential fold by far less, so candidates kept at
# threshold - margin are a strict SUPERSET of qualifying pairs.
_PREFILTER_MARGIN = 1e-6

# r17 (guide §4.2): the block matmul — the FLOP-dominant stage of every
# clustered similarity path at scale — runs in float32 when the dimension
# allows, at ~2x float64 throughput on AVX512. Normalization still happens
# in float64 (norms of huge-magnitude vectors overflow float32), then the
# unit rows are cast. Error bound for a float32 dot of unit vectors:
# |err| <= (dim + 2) * 2^-23 * ||a||*||b|| ~ dim * 1.2e-7. The headroom of
# the widened 1e-3 margin is dim-dependent: ~130x at dim 64, but only
# ~2x AT THE DIM CAP below (4096 * 1.2e-7 ~ 4.9e-4) — anyone raising
# _PREFILTER_F32_DIM_CAP must widen _PREFILTER_MARGIN_F32 in proportion
# (the raise-check below enforces the 2x floor so the superset guarantee
# cannot silently erode; past the cap the float64 path with the original
# margin runs instead). Candidates only grow by the extra margin sliver;
# the EXACT sequential-fold verify stage downstream remains the arbiter,
# so emitted values are unchanged.
_PREFILTER_MARGIN_F32 = 1e-3
_PREFILTER_F32_DIM_CAP = 4096
# static tie between the cap and the margin (r17 ADVICE low): the f32
# error bound at the cap must leave >= 2x headroom under the margin
if not _PREFILTER_F32_DIM_CAP * 1.2e-7 * 2 <= _PREFILTER_MARGIN_F32:
    raise AssertionError(
        "_PREFILTER_F32_DIM_CAP raised without widening "
        "_PREFILTER_MARGIN_F32: the float32 superset guarantee needs "
        "margin >= 2 * cap * 1.2e-7"
    )


def _block_pair_indices(left_pdf: pd.DataFrame, right_pdf: pd.DataFrame, threshold: float):
    """Shared Arrow-batch block-scorer core for the clustered similarity
    paths: ONE numpy matmul per cogrouped cell-pair block, returning the
    positional index arrays (ia, ib) of pairs to KEEP — approximate
    cosine >= threshold - margin, plus force-kept degenerate
    rows. Force-keeps make the prefilter a superset on ARBITRARY data:
    NaN cells (the JVM baseline evaluates NaN >= t as true), zero-norm
    members (engine cosine NULL or NaN depending on the partner), and
    non-finite-norm members (a huge all-finite vector can overflow the
    norm fold to Inf engine-side and yield a NaN cosine the normalized
    numpy product would smooth over). The EXACT verify stage downstream,
    never this float approximation, is the arbiter for all of them."""
    A = np.vstack(left_pdf["embedding"].to_numpy()).astype("float64")
    B = np.vstack(right_pdf["embedding"].to_numpy()).astype("float64")
    na = np.sqrt((A * A).sum(axis=1))
    nb = np.sqrt((B * B).sum(axis=1))
    da = (na == 0.0) | ~np.isfinite(na)
    db = (nb == 0.0) | ~np.isfinite(nb)
    na[da] = 1.0
    nb[db] = 1.0
    if A.shape[1] <= _PREFILTER_F32_DIM_CAP:
        # float32 matmul over float64-normalized unit rows (see margin note
        # above): same superset guarantee, ~half the prefilter wall. A unit
        # row's entries are <= 1 in magnitude, so the cast cannot overflow;
        # NaN/Inf from degenerate rows survive the cast and are force-kept.
        cos = (A / na[:, None]).astype("float32") @ (
            (B / nb[:, None]).astype("float32").T
        )
        margin = _PREFILTER_MARGIN_F32
    else:
        cos = (A / na[:, None]) @ (B / nb[:, None]).T
        margin = _PREFILTER_MARGIN
    keep = (
        (cos >= threshold - margin)
        | np.isnan(cos)
        | da[:, None]
        | db[None, :]
        # norm-PRODUCT overflow (r11 ADVICE low): two individually
        # finite norms ≳1e154 overflow their float64 product, so the
        # engine cosine is inf/inf = NaN (baseline keeps: NaN >= t is
        # true) while the normalized numpy product stays finite and
        # could prune (e.g. anti-aligned huge vectors). By
        # Cauchy–Schwarz |dot| <= na*nb, so engine dot overflow implies
        # norm-product overflow — this term exactly covers the
        # remaining NaN-cosine class the per-row force-keeps miss.
        | ~np.isfinite(na[:, None] * nb[None, :])
    )
    return np.nonzero(keep)


def blocked_candidate_pairs(
    l_members: DataFrame,
    r_members: DataFrame,
    allowed: list[tuple[int, int]],
    threshold: float,
) -> DataFrame | None:
    """Stage-1 cogrouped block-matmul prefilter shared by the exact
    similarity paths (:func:`cosine_similarity_join`, the incremental
    semantic refresh): join each side's member frame — columns
    ``(vec_id, cell, embedding)`` — to the driver-side allowlist,
    cogroup by the (cell_l, cell_r) pair, and score each block with ONE
    Arrow-batched numpy matmul (:func:`_block_pair_indices`). Returns a
    ``(__lid, __rid)`` candidate frame that is a strict SUPERSET of the
    qualifying (cos >= threshold) pairs — margin slack plus degenerate
    force-keeps — or None for an empty allowlist. Callers MUST
    re-verify survivors with the exact sequential-fold cosine; this
    stage exists so the fold runs over the near-threshold sliver
    instead of every allowed block pair (the r10 verdict's
    pair-row-materialization finding). Id dtypes pass through from the
    member frames (string ids are common in record linkage)."""
    if not allowed:
        return None
    spark = l_members.sparkSession
    allow_df = spark.createDataFrame(allowed, "cell_l int, cell_r int")
    lmem = (
        l_members.alias("lm")
        .join(F.broadcast(allow_df.alias("la")), F.col("lm.cell") == F.col("la.cell_l"))
        .select(
            F.col("la.cell_l").alias("cell_l"),
            F.col("la.cell_r").alias("cell_r"),
            F.col("lm.vec_id").alias("vec_id"),
            F.col("lm.embedding").alias("embedding"),
        )
    )
    rmem = (
        r_members.alias("rm")
        .join(F.broadcast(allow_df.alias("ra")), F.col("rm.cell") == F.col("ra.cell_r"))
        .select(
            F.col("ra.cell_l").alias("cell_l"),
            F.col("ra.cell_r").alias("cell_r"),
            F.col("rm.vec_id").alias("vec_id"),
            F.col("rm.embedding").alias("embedding"),
        )
    )

    def _join_block_candidates(
        left_pdf: pd.DataFrame, right_pdf: pd.DataFrame
    ) -> pd.DataFrame:
        if len(left_pdf) == 0 or len(right_pdf) == 0:
            return pd.DataFrame(
                {
                    "__lid": left_pdf["vec_id"].iloc[:0],
                    "__rid": right_pdf["vec_id"].iloc[:0],
                }
            )
        ia, ib = _block_pair_indices(left_pdf, right_pdf, threshold)
        return pd.DataFrame(
            {
                "__lid": left_pdf["vec_id"].to_numpy()[ia],
                "__rid": right_pdf["vec_id"].to_numpy()[ib],
            }
        )

    l_id_t = l_members.schema["vec_id"].dataType.simpleString()
    r_id_t = r_members.schema["vec_id"].dataType.simpleString()
    return (
        lmem.groupBy("cell_l", "cell_r")
        .cogroup(rmem.groupBy("cell_l", "cell_r"))
        .applyInPandas(_join_block_candidates, f"__lid {l_id_t}, __rid {r_id_t}")
    )


def angle_between(u, v) -> float:
    """Angle (radians) between two vectors; a zero-norm operand reports
    0.0 so triangle-inequality ALLOWLISTS built on this can only widen
    (the undefined-angle cell pair stays allowed). THE shared pruning
    primitive — near_dup_pairs_clustered, cosine_similarity_join, the
    incremental semantic refresh, and tools/semantic_probe.py must all
    use this one definition or their recall-1.0 guarantees silently
    diverge (r10 review finding)."""
    du = math.sqrt(sum(x * x for x in u))
    dv = math.sqrt(sum(x * x for x in v))
    if du == 0.0 or dv == 0.0:
        return 0.0  # undefined angle -> keep the cluster pair allowed
    c = sum(x * y for x, y in zip(u, v)) / (du * dv)
    return math.acos(max(-1.0, min(1.0, c)))


def allowed_cell_pairs(
    cents, radii_a: dict, radii_b: dict, threshold: float
) -> list[tuple[int, int]]:
    """Driver-side triangle-inequality allowlist over cell pairs: every
    (ca, cb) with theta(cent_ca, cent_cb) <= r_a(ca) + r_b(cb) +
    arccos(threshold) + eps — the pairs that COULD hold a qualifying
    (cos >= threshold) member pair. Pruned pairs provably cannot; the
    eps float slack only widens. Both orientations are emitted (the
    self-join caller filters to ca <= cb itself)."""
    theta_t = math.acos(max(-1.0, min(1.0, threshold)))
    eps = 1e-6  # float slack: widens the bound, can only ADD candidates
    return [
        (ca, cb)
        for ca, ra in radii_a.items()
        for cb, rb in radii_b.items()
        if ca == cb
        or angle_between(cents[ca], cents[cb]) <= ra + rb + theta_t + eps
    ]


def near_dup_pairs_clustered(
    corpus: DataFrame,
    threshold: float = 0.45,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Exact cosine near-duplicate pairs (cos >= threshold) WITHOUT the
    all-pairs cross join, by pruning cluster pairs with the angular triangle
    inequality.

    Angular distance theta(a,b) = arccos(cos(a,b)) is a metric on the unit
    sphere, so for vectors a in cluster c1 and b in cluster c2:

        theta(a,b) >= theta(cent1,cent2) - radius(c1) - radius(c2)

    Any cluster pair whose centroids are further apart than
    radius(c1) + radius(c2) + arccos(threshold) therefore cannot contain a
    qualifying pair and is never joined — recall is 1.0 by construction,
    unlike an LSH band scheme whose recall is probabilistic. The verify step
    recomputes the exact sequential-fold cosine, so emitted values are
    bit-identical to the all-pairs baseline (queries/vectors.py).

    Plan shape: sample-fit k-means assignment (one pass, angles piggybacked
    on the assignment matmul), per-cluster radius (one narrow groupBy over
    nlist rows), a driver-side nlist x nlist allowlist, then a TWO-STAGE
    scorer over the
    allowed cluster pairs: (1) cogrouped block-matmul prefilter — one
    Arrow-batched numpy matmul per allowed (c1, c2) block, emitting id
    pairs whose approximate cosine clears threshold-minus-margin (a strict
    superset of qualifying pairs); (2) exact sequential-fold re-verify of
    that tiny candidate set, so emitted cos_sim values are bit-identical to
    the all-pairs baseline. Pruning scales with how clustered the corpus
    is: random testdata is the worst case (most cluster pairs stay
    allowed) — the matmul keeps even that case cheap; real embedding
    corpora cluster strongly and drop most of the n^2 work. 100 TB posture:
    the cluster id is the shuffle key, block volume is sum over allowed
    (c1,c2) of |c1|+|c2| replicated rows (not pair rows), and per-block
    work is a dense matmul.
    """
    from ..queries.vectors import dot, norm
    from .ivf import train_ivf_index

    # coarse partition only: exactness never depends on cluster quality
    # (triangle-inequality bound), so spend 5 Lloyd's iterations on the
    # driver-side sample rather than the trainer's full budget. emit_angle
    # piggybacks each member's angle-to-centroid on the assignment matmul
    # (zero-norm members report worst-case pi, so the bound below can only
    # widen — recall stays 1.0 on arbitrary data). assigned is cache()d:
    # one materialization feeds the radius collect, both sides of the block
    # join, AND the exact-verify stage. Cache entries are plan-keyed
    # (identical re-invocations share one) and LRU-evictable, so storage is
    # bounded; an eager localCheckpoint here measured ~25% slower per call.
    assigned, _, cmat = train_ivf_index(
        corpus, vec_col, id_col, nlist, seed, iters=5, emit_angle=True
    )
    if assigned is None:  # empty corpus: no vectors, no pairs
        return corpus.sparkSession.createDataFrame(
            [], "id_a bigint, id_b bigint, cos_sim double"
        )
    assigned = tracked_cache(assigned)

    # Driver-side allowlist metadata: radii from one narrow groupBy collect
    # (nlist rows, not data rows); centroids already driver-side from fit.
    cent_rows = {i: [float(x) for x in c] for i, c in enumerate(cmat)}
    # NULL/NaN thetas (NaN-component vectors via the Arrow transfer) pin
    # to the worst-case pi — see cosine_similarity_join's radius note
    radius_rows = {
        r["cell"]: r["radius"]
        for r in assigned.groupBy("cell")
        .agg(
            F.max(
                F.coalesce(F.nanvl(F.col("theta"), F.lit(math.pi)), F.lit(math.pi))
            ).alias("radius")
        )
        .collect()
    }
    # one orientation (c1 <= c2): the shared helper emits both
    allowed = sorted(
        (c1, c2)
        for c1, c2 in allowed_cell_pairs(cent_rows, radius_rows, radius_rows, threshold)
        if c1 <= c2
    )
    allow_df = corpus.sparkSession.createDataFrame(allowed, "c1 int, c2 int")

    # Stage 1 — block-matmul PREFILTER over allowed cluster pairs. Scoring
    # 12.5M surviving pairs as Catalyst fold expressions would materialize
    # two 64-float arrays per pair row (~GBs mid-plan) and cost ~2us/pair;
    # instead each allowed (c1, c2) block is cogrouped and scored by the
    # shared _block_pair_indices core: ONE Arrow-batched numpy matmul
    # (members(c1) x members(c2)), superset-by-margin with degenerate
    # rows force-kept (see the core's docstring), so recall stays 1.0 on
    # arbitrary data.
    def _block_candidates(
        left_pdf: pd.DataFrame, right_pdf: pd.DataFrame
    ) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
            }
        )
        if len(left_pdf) == 0 or len(right_pdf) == 0:
            return empty
        ia, ib = _block_pair_indices(left_pdf, right_pdf, threshold)
        id_a = left_pdf["vec_id"].to_numpy()[ia].astype("int64")
        id_b = right_pdf["vec_id"].to_numpy()[ib].astype("int64")
        if left_pdf["c1"].iat[0] == left_pdf["c2"].iat[0]:
            # diagonal block: both orientations of every pair are present,
            # so the original-orientation filter both dedups and drops selfs
            m = id_a < id_b
            return pd.DataFrame({"id_a": id_a[m], "id_b": id_b[m]})
        # off-diagonal block: each unordered pair appears exactly once;
        # normalize the orientation to id_a < id_b
        lo, hi = np.minimum(id_a, id_b), np.maximum(id_a, id_b)
        return pd.DataFrame({"id_a": lo, "id_b": hi})

    members = assigned.select("cell", "vec_id", "embedding")
    left = (
        members.alias("lm")
        .join(F.broadcast(allow_df.alias("la")), F.col("lm.cell") == F.col("la.c1"))
        .select(
            F.col("la.c1").alias("c1"),
            F.col("la.c2").alias("c2"),
            F.col("lm.vec_id").alias("vec_id"),
            F.col("lm.embedding").alias("embedding"),
        )
    )
    right = (
        members.alias("rm")
        .join(F.broadcast(allow_df.alias("ra")), F.col("rm.cell") == F.col("ra.c2"))
        .select(
            F.col("ra.c1").alias("c1"),
            F.col("ra.c2").alias("c2"),
            F.col("rm.vec_id").alias("vec_id"),
            F.col("rm.embedding").alias("embedding"),
        )
    )
    cand = (
        left.groupBy("c1", "c2")
        .cogroup(right.groupBy("c1", "c2"))
        .applyInPandas(_block_candidates, "id_a long, id_b long")
    )

    # Stage 2 — exact verify on the (near-dup-sized, tiny) candidate set:
    # the sequential-fold cosine, so emitted values stay bit-identical to
    # the all-pairs baseline / DuckDB oracle. Candidates are broadcast —
    # near-dup output is small relative to the corpus by the premise of
    # dedup (and the margin admits almost nothing extra).
    a = assigned.select(
        F.col("vec_id").alias("ia"),
        F.col("embedding").alias("va"),
        norm(F.col("embedding")).alias("norm_a"),
    )
    b = assigned.select(
        F.col("vec_id").alias("ib"),
        F.col("embedding").alias("vb"),
        norm(F.col("embedding")).alias("norm_b"),
    )
    return (
        F.broadcast(cand)
        .join(a, cand["id_a"] == a["ia"])
        .join(b, cand["id_b"] == b["ib"])
        .select(
            F.col("ia").alias("id_a"),
            F.col("ib").alias("id_b"),
            (dot(F.col("va"), F.col("vb")) / (F.col("norm_a") * F.col("norm_b"))).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Embedding-level benchmark decontamination: flag every corpus row
    whose max cosine similarity against ANY benchmark embedding reaches
    ``threshold`` — the semantic complement to the n-gram overlap
    decontamination in queries/textops.py (which catches verbatim leaks;
    this catches paraphrases and translations that share an embedding
    neighborhood, the leak mode n-grams cannot see).

    Returns ``(id_col, max_benchmark_sim, contaminated)`` — one row per
    corpus row, so the caller can either filter or audit the margin
    distribution.

    Scale shape: eval benchmarks are small (10^3-10^5 rows), so the
    benchmark side BROADCASTS and the corpus streams through one
    map-side pass — a broadcast nested-loop with a max-aggregate, no
    shuffle of the corpus beyond the final groupBy on ``id_col`` (and
    Spark fuses that partial-agg map-side: the per-task state is one
    running max per corpus row in the task). Cost is O(|corpus| x
    |benchmark|) dot products — the price every exact decontamination
    pays; for benchmark sets too big to broadcast, use
    :func:`cosine_similarity_join` (exact, recall 1.0 by the two-sided
    triangle inequality — no broadcast needed) or pre-prune with the
    IVF/LSH index in this module and verify only bucket collisions
    (recall then inherits the index's guarantee instead of being exact).
    """
    from ..queries.vectors import dot, norm

    bench = benchmark.select(
        F.col(emb_col).alias("__b_emb"), norm(F.col(emb_col)).alias("__b_norm")
    )
    scored = (
        corpus.select(id_col, emb_col, norm(F.col(emb_col)).alias("__c_norm"))
        .crossJoin(F.broadcast(bench))
        .select(
            id_col,
            (
                dot(F.col(emb_col), F.col("__b_emb"))
                / (F.col("__c_norm") * F.col("__b_norm"))
            ).alias("__sim"),
        )
        .groupBy(id_col)
        .agg(F.max("__sim").alias("max_benchmark_sim"))
    )
    return scored.select(
        id_col,
        "max_benchmark_sim",
        (F.col("max_benchmark_sim") >= F.lit(threshold)).alias("contaminated"),
    )


_DERIVED_NLIST_CAP = 32


def derive_nlist(n_fit: int, cap: int = _DERIVED_NLIST_CAP) -> int:
    """Default cell count for the similarity-join family from the fit-side
    row count: min(cap, isqrt(n_fit)), floor 4.

    The cap REPLACES the r12 sqrt(n)-to-1024 rule on direct measurement
    (docs/SCALE.md r13 nlist ladder): at 500k fit rows the wall optimum
    sat at 32-64 cells on ALL three geometries probed (production-Zipf
    333 blobs, 16 tight blobs, structureless uniform), while sqrt(n)=707
    cells cost 2-10x the optimum — k-means fit, the O(nlist^2) driver
    allowlist and block fragmentation all grow with nlist, and the dense
    block matmul prefers fewer, larger blocks. cap=32 lands within 12%
    of the per-shape optimum everywhere measured; exactness NEVER
    depends on the cell count (recall 1.0 by the triangle-inequality
    allowlist), so this is purely a performance default. Raise ``cap``
    explicitly when cluster parallelism needs more concurrent blocks
    (allowed cell pairs ~ nlist^2/2 bounds the task count) or a block's
    rows exceed executor memory."""
    import math

    return max(4, min(cap, math.isqrt(max(0, n_fit))))


def cosine_similarity_join(
    left: DataFrame,
    right: DataFrame,
    threshold: float = 0.9,
    left_id: str = "left_id",
    right_id: str = "right_id",
    left_vec: str = "embedding",
    right_vec: str = "embedding",
    nlist: int | None = 16,
    seed: int = 42,
) -> DataFrame:
    """EXACT two-frame cosine similarity join: every (left, right) pair
    with cos >= threshold, WITHOUT the cross join — the two-sided
    generalization of :func:`near_dup_pairs_clustered`'s angular
    triangle-inequality pruning (which stays the tuned SELF-join path).

    The named join modern engines call a "vector similarity join":
    match two corpora by embedding neighborhood — cross-dataset
    decontamination where the benchmark side is too big to broadcast
    (:func:`semantic_contamination`'s documented limit), record linkage
    by description embedding, query-to-corpus candidate generation with
    an exactness guarantee.

    Mechanics: k-means cells fit on a deterministic RIGHT sample
    (ivf.py), BOTH sides assigned against the same pinned matrix with
    per-member angles; a driver-side (left-cell, right-cell) allowlist
    keeps exactly the pairs theta(c1,c2) <= r_left(c1) + r_right(c2) +
    arccos(threshold) + eps — any pruned cell pair provably cannot hold
    a qualifying pair, so recall is 1.0 BY CONSTRUCTION on arbitrary
    data. Surviving cell-pair blocks then run the TWO-STAGE scorer its
    self-join sibling :func:`near_dup_pairs_clustered` uses (the r10
    review's perf finding — the old per-pair Catalyst fold materialized
    two float arrays per pair row, exactly the shape the sibling
    rejects): (1) cogrouped block-matmul prefilter — one Arrow-batched
    numpy matmul per allowed block via the shared
    :func:`_block_pair_indices` core, a strict superset of qualifying
    pairs by margin with degenerate rows force-kept; (2) exact
    sequential-fold re-verify of the surviving sliver, so emitted
    cos_sim values are bit-identical to the cross-join baseline.

    Degenerate vectors follow the baseline's ENGINE semantics exactly.
    A vector with NaN/Inf components has NaN cosines, which Spark's >=
    treats as TRUE: it stays in the main path (the != 0 filter keeps
    NaN norms), its cell radius is nanvl'd to pi so the allowlist keeps every
    pair the baseline would emit, and the prefilter force-keeps it. A
    zero-norm vector's cosine against any all-finite partner is NULL
    (0/0 division) and never matches, so zero-norm rows are excluded
    from the main candidate path (keeping them would pin pi radii that
    widen the allowlist to every cell pair — a perf cliff); BUT against
    a partner with non-finite norm the engine cosine is NaN/NaN = NaN,
    which the baseline MATCHES (the r10 advice finding), so when one
    side has zero-norm rows AND the other has non-finite-norm rows,
    that (tiny x tiny) cross product is exact-verified out-of-band and
    unioned in — output-identical to the baseline with no allowlist
    widening.

    Scale shape: one assignment matmul per side, two narrow per-cell
    stats aggregates, a shuffle keyed on the cell pair whose volume is
    sum over ALLOWED pairs of |left cell| + |right cell| replicated
    rows, one dense matmul per block, then an id-keyed re-verify join
    sized by the near-threshold sliver (AQE broadcasts it when small).
    Clustered corpora discard most cell pairs driver-side (measured in
    docs/SCALE.md's semantic-probe section); the uniform worst case
    degrades toward the cross join's pair COUNT but pays it at dense
    matmul speed — the intrinsic bound of any exact join. Choosing
    nlist: use :func:`derive_nlist` unless you have a measured reason
    not to — the r13 three-shape ladder (SCALE.md) found the optimum at
    32-64 cells across 80k-500k fit rows on production-Zipf, tight-blob
    and uniform geometries, with sqrt(n) cells up to 10x off (fit +
    O(nlist^2) allowlist + fragmented blocks grow with nlist; block
    matmul efficiency favors fewer, larger blocks). On a large cluster
    raise it only as far as parallelism needs (allowed cell pairs ~
    nlist^2/2 bounds concurrent tasks). For candidate-only workloads at
    extreme scale, swap the exact verify for the PQ-ADC scorer
    (extensions/pq.py).
    """
    from ..queries.vectors import dot, norm
    from .ivf import assign_to_centroids, train_ivf_index

    if left_id == right_id:
        raise ValueError(
            "cosine_similarity_join needs distinct output id column names; "
            f"both sides were given {left_id!r} — alias one side first"
        )

    def _empty():
        # preserve the CALLERS' id dtypes in the empty result (string ids
        # are common in record linkage; a hardcoded long schema would make
        # empty and non-empty runs union-incompatible)
        return (
            left.select(F.col(left_id))
            .limit(0)
            .crossJoin(right.select(F.col(right_id)).limit(0))
            .withColumn("cos_sim", F.lit(0.0).cast("double"))
        )

    fitted, _, cmat = train_ivf_index(
        right, right_vec, right_id, nlist, seed, iters=5, emit_angle=True
    )
    if fitted is None:  # empty right side: no pairs
        return _empty()
    # one materialization per side feeds the per-cell stats collect, both
    # cogroup sides, the verify join, AND the degenerate slivers (the
    # near_dup_pairs_clustered reuse pattern; without it the assignment
    # matmul and upstream scans run once per consumer). The norm rides
    # the cache so filters and the verify join share one fold.
    r_all = tracked_cache(fitted.withColumn("__n", norm(F.col("embedding"))))
    l_all = tracked_cache(
        assign_to_centroids(
            left, cmat, vec_col=left_vec, id_col=left_id, emit_angle=True
        ).withColumn("__n", norm(F.col("embedding")))
    )

    _zero = F.col("__n") == 0
    _nonfinite = F.isnan(F.col("__n")) | (F.col("__n") == F.lit(float("inf")))

    # ONE fused per-(side, cell) collect for BOTH sides (r17, guide §1.2:
    # two separate collects paid two job launches and materialized the two
    # assignment caches in two actions; the union materializes both in one
    # — identical per-cell arithmetic, so the allowlist is unchanged).
    #
    # Radius: a vector with a NaN/Inf component gets a NaN theta from
    # the assignment matmul, which the Arrow pandas transfer surfaces
    # as NULL (pandas NaN is Arrow's null sentinel) — F.max would
    # silently SKIP it, under-reporting the radius and letting the
    # allowlist prune a cell whose NaN cosines the crossJoin baseline
    # MATCHES (Spark evaluates NaN >= t as true). Pin both
    # representations to the worst-case pi (coalesce for the NULL
    # form, nanvl for a genuine NaN). Zero-norm rows are EXCLUDED
    # from the radius (they never ride the main candidate path, and
    # their pinned-pi thetas would widen the allowlist to every cell
    # pair); a cell holding only zero-norm rows reports no radius and
    # drops out of the allowlist entirely.
    _stat_cols = [
        "cell",
        F.col("__n").alias("__n"),
        F.col("theta").alias("theta"),
    ]
    tagged = l_all.select(F.lit(0).alias("__side"), *_stat_cols).unionByName(
        r_all.select(F.lit(1).alias("__side"), *_stat_cols)
    )
    stat_rows = (
        tagged.groupBy("__side", "cell")
        .agg(
            F.max(
                F.when(
                    ~_zero,
                    F.coalesce(
                        F.nanvl(F.col("theta"), F.lit(math.pi)), F.lit(math.pi)
                    ),
                )
            ).alias("radius"),
            F.max(_zero.cast("int")).alias("has_zero"),
            F.max(_nonfinite.cast("int")).alias("has_nonfinite"),
        )
        .collect()
    )

    def _side_stats(side: int):
        rows = [r for r in stat_rows if r["__side"] == side]
        radii = {r["cell"]: r["radius"] for r in rows if r["radius"] is not None}
        return (
            radii,
            any(r["has_zero"] for r in rows),
            any(r["has_nonfinite"] for r in rows),
        )

    cents = [[float(x) for x in c] for c in cmat]
    l_radii, l_has_zero, l_has_nonfinite = _side_stats(0)
    r_radii, r_has_zero, r_has_nonfinite = _side_stats(1)
    allowed = allowed_cell_pairs(cents, l_radii, r_radii, threshold)

    def _lsel(frame):
        return frame.select(
            F.col("vec_id").alias("__lid"),
            F.col("embedding").alias("va"),
            F.col("__n").alias("norm_a"),
        )

    def _rsel(frame):
        return frame.select(
            F.col("vec_id").alias("__rid"),
            F.col("embedding").alias("vb"),
            F.col("__n").alias("norm_b"),
        )

    _cos = (dot(F.col("va"), F.col("vb")) / (F.col("norm_a") * F.col("norm_b"))).alias(
        "cos_sim"
    )

    def _exact_verify(pairs_with_vecs):
        # the sequential-fold cosine: bit-identical to the baseline
        return pairs_with_vecs.select(
            F.col("__lid").alias(left_id), F.col("__rid").alias(right_id), _cos
        ).filter(F.col("cos_sim") >= threshold)

    parts = []
    if allowed:
        # NaN/Inf-norm rows stay; zero-norm rows leave the main path
        # (their engine cosine vs the all-finite bulk is NULL and never
        # matches — the degenerate sliver below covers the one partner
        # class that DOES match). The predicate is != 0, NOT > 0: on a
        # CACHED frame the in-memory columnar batch filter evaluates
        # NaN > 0 as false (stats-pruned), silently dropping NaN-norm
        # rows the uncached stream keeps — != has no such divergence.
        l_main = l_all.filter(F.col("__n") != 0)
        r_main = r_all.filter(F.col("__n") != 0)
        cand = blocked_candidate_pairs(
            l_main.select("vec_id", "cell", "embedding"),
            r_main.select("vec_id", "cell", "embedding"),
            allowed,
            threshold,
        )
        # id-keyed re-verify joins; cand is the near-threshold sliver, so
        # AQE broadcasts it when small — unhinted on purpose, since a
        # low-threshold linkage join can make the sliver corpus-sized
        parts.append(
            _exact_verify(
                cand.join(_lsel(l_main), "__lid").join(_rsel(r_main), "__rid")
            )
        )
    # Degenerate sliver (r10 advice finding): zero-norm x non-finite-norm
    # pairs have engine cosine NaN/NaN = NaN, which the baseline MATCHES.
    # Exact-verify that (tiny x tiny) cross product out-of-band — the
    # non-finite side broadcasts (pathological rows are rare by premise;
    # the output is the full product either way, as the baseline's is).
    if l_has_zero and r_has_nonfinite:
        parts.append(
            _exact_verify(
                _lsel(l_all.filter(_zero)).crossJoin(
                    F.broadcast(_rsel(r_all.filter(_nonfinite)))
                )
            )
        )
    if l_has_nonfinite and r_has_zero:
        parts.append(
            _exact_verify(
                F.broadcast(_lsel(l_all.filter(_nonfinite))).crossJoin(
                    _rsel(r_all.filter(_zero))
                )
            )
        )
    if not parts:
        return _empty()
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
