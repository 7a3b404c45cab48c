"""Scaling probe for the incremental SEMANTIC dedup refresh: per-wave
cost and candidate-pruning rate as the standing vector corpus grows.

The claims in plans/incremental.py::incremental_semantic_refresh:

1. per-wave candidate volume is increment x (standing members of ALLOWED
   cells), not increment x corpus — on clustered data the driver-side
   triangle-inequality allowlist discards most cell pairs before any
   shuffle;
2. the batch alternative ("re-run semantic dedup over everything
   landed") pays the full pair computation over a linearly-growing
   corpus every wave, while the refresh pays only the increment's share.

Fixture: ``n_blobs`` Gaussian blobs on the unit sphere (the clustered
regime real embedding corpora exhibit; --uniform switches to the
documented worst case). Each wave lands WAVE vectors: ~15% near-copies
of earlier-wave vectors (small perturbation, cos >= threshold), the
rest fresh blob samples. Printed per wave: refresh wall, allowed cell
pairs / total cell pairs, candidate rows actually verified vs the
increment x standing quadratic, and the drop counts.

Usage: python tools/semantic_probe.py [n_waves] [wave_size] [--uniform]
       python tools/semantic_probe.py --join [right_sizes ...]
       python tools/semantic_probe.py --join-prod [right_sizes ...]
       python tools/semantic_probe.py --recell [n_waves] [wave_size]

``--join-prod`` re-runs the derived-vs-fixed nlist comparison on a
PRODUCTION-SHAPED fixture (cluster count scaling with the corpus,
Zipf-skewed membership) — the r12 verdict's watch item on the derived
~sqrt(n) default, whose only measured downside came from the 16-blob
synthetic whose cluster count does NOT scale.

``--recell`` measures the pinned-centroid decay + recovery story: a
fixture with far MORE blob structure (128 blobs) than the pinned 16
cells can resolve, so the allowlist share sits high for every wave;
after the landed waves, ``semantic_recell`` refits nlist ~ sqrt(n)
cells on the standing corpus and one more wave lands under the new
calibration — the before/after allow_share and per-wave wall are the
measured recovery.

``--join`` mode measures the two-frame cosine_similarity_join against
the crossJoin baseline at growing right-side sizes (fixed 2k-query
left side, clustered blobs): wall for each path plus the matched-pair
count equality check — the crossover curve for the exact similarity
join's pruning.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
    incremental_semantic_refresh,
    read_deduped,
)
from big_data_processing_with_aws_glue_workshop_spark.session import get_session
from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import JobBookmark

DIM = 64
THRESHOLD = 0.95
NLIST = 16


def make_waves(
    n_waves: int, wave, n_blobs: int, uniform: bool, seed: int = 7,
    zipf: float | None = None,
):
    """``wave`` is a per-wave size (int) or a list of per-wave sizes.
    ``zipf`` skews blob membership heavy-tailed (weight 1/rank^zipf) —
    the production-shaped regime where a few dominant topics hold most
    of the corpus and a long tail of small clusters holds the rest."""
    sizes = wave if isinstance(wave, list) else [wave] * n_waves
    rng = random.Random(seed)
    nrng = np.random.default_rng(seed)
    centers = nrng.normal(size=(n_blobs, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    blob_ids = list(range(n_blobs))
    blob_weights = (
        [1.0 / (r + 1) ** zipf for r in blob_ids] if zipf is not None else None
    )
    waves, all_rows, vid = [], [], 0
    for size in sizes:
        rows = []
        for _ in range(size):
            vid += 1
            if all_rows and rng.random() < 0.15:
                _, base = rng.choice(all_rows)
                v = np.array(base) + nrng.normal(scale=0.01, size=DIM)
            elif uniform:
                v = nrng.normal(size=DIM)
            elif blob_weights is not None:
                c = centers[rng.choices(blob_ids, weights=blob_weights, k=1)[0]]
                v = c + nrng.normal(scale=0.035, size=DIM)
            else:
                # sigma 0.035/dim => perturbation length ~0.28 vs unit
                # centers: blob angular radius ~16 deg, so intra-blob
                # member pairs (~22 deg apart) do NOT qualify as dups at
                # cos 0.95 (18.2 deg) while random centers (~90 deg
                # apart at dim 64) prune far outside the 2r+theta_t
                # ~50 deg bound (sigma 0.15 would give ~50 deg radii —
                # every cell pair allowed, the --uniform worst case)
                c = centers[rng.randrange(n_blobs)]
                v = c + nrng.normal(scale=0.035, size=DIM)
            rows.append((vid, [float(np.float32(x)) for x in v]))
        waves.append(rows)
        all_rows.extend(rows)
    return waves


def join_mode(sizes: list[int], derived: bool = False, brute: bool = True) -> None:
    import pyspark.sql.functions as F

    from big_data_processing_with_aws_glue_workshop_spark.extensions.similarity import (
        cosine_similarity_join,
    )
    from big_data_processing_with_aws_glue_workshop_spark.queries.vectors import dot, norm

    spark = get_session(app_name="semantic-probe-join")
    thr = THRESHOLD
    for n in sizes:
        # two waves from ONE generator (same blob centers, so the query
        # side clusters like the corpus): wave 0 = the right corpus,
        # wave 1 = the 2k queries — make_waves' ~15% cross-wave
        # near-copy planting gives the queries genuine matches
        # (a single-wave split would leave only chance intra-blob
        # matches — r10 follow-up review)
        right_rows, left_rows = make_waves(
            2, [n, 2_000], n_blobs=NLIST, uniform=False
        )
        ldf = spark.createDataFrame(
            left_rows, "qid long, embedding array<float>"
        ).repartition(32).cache()
        rdf = spark.createDataFrame(
            right_rows, "cid long, embedding array<float>"
        ).repartition(32).cache()
        ldf.count(), rdf.count()

        # --derived: the operator's own derivation rule (shared helper,
        # so probe and query can never fork) instead of the pinned
        # fixture NLIST — r13 capped it at 32 after the three-shape
        # ladder (SCALE.md r13)
        from big_data_processing_with_aws_glue_workshop_spark.extensions.similarity import (
            derive_nlist,
        )

        nlist = derive_nlist(n) if derived else NLIST
        t0 = time.time()
        pruned = cosine_similarity_join(
            ldf, rdf, threshold=thr, left_id="qid", right_id="cid",
            nlist=nlist,
        ).count()
        t_pruned = time.time() - t0

        row = {
            "right_n": n, "left_n": 2_000, "nlist": nlist, "pairs": pruned,
            "join_wall_s": round(t_pruned, 2),
        }
        if brute:
            la = ldf.select("qid", F.col("embedding").alias("va"), norm(F.col("embedding")).alias("na"))
            rb = rdf.select("cid", F.col("embedding").alias("vb"), norm(F.col("embedding")).alias("nb"))
            t0 = time.time()
            bc = (
                la.crossJoin(rb)
                .select((dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("s"))
                .filter(F.col("s") >= thr)
                .count()
            )
            t_brute = time.time() - t0
            row.update({
                "pairs_match": pruned == bc,
                "crossjoin_wall_s": round(t_brute, 2),
                "speedup": round(t_brute / t_pruned, 2),
            })
        print(json.dumps(row))
        ldf.unpersist(), rdf.unpersist()


def join_prod_mode(sizes: list[int]) -> None:
    """Production-shaped fixture for the derived-nlist rule (the r12
    verdict's standing watch: the 16-blob synthetic showed derived
    ~sqrt(n) cells up to 1.8x SLOWER at 80k-200k because over-celling a
    16-cluster corpus pays fit + allowlist + finer blocks for no extra
    pruning). Here the cluster structure scales WITH the corpus —
    n_blobs = n/1500 (capped 2048), Zipf-1.1 membership (a few dominant
    topics, long tail) — the regime a real embedding corpus exhibits.
    Both nlist policies run the SAME fixture; the exact join's recall is
    1.0 for any nlist, so equal pair counts double as the cross-check.
    (r13: this probe's first results + the follow-up three-shape ladder
    at 500k are what replaced the sqrt-to-1024 rule with derive_nlist's
    cap-32 — see SCALE.md r13.)"""
    from big_data_processing_with_aws_glue_workshop_spark.extensions.similarity import (
        cosine_similarity_join,
        derive_nlist,
    )

    spark = get_session(app_name="semantic-probe-join-prod")
    for n in sizes:
        n_blobs = max(16, min(2048, n // 1500))
        right_rows, left_rows = make_waves(
            2, [n, 2_000], n_blobs=n_blobs, uniform=False, zipf=1.1
        )
        ldf = spark.createDataFrame(
            left_rows, "qid long, embedding array<float>"
        ).repartition(32).cache()
        rdf = spark.createDataFrame(
            right_rows, "cid long, embedding array<float>"
        ).repartition(32).cache()
        ldf.count(), rdf.count()
        pair_counts = {}
        for derived in (False, True):
            nlist = derive_nlist(n) if derived else NLIST
            t0 = time.time()
            pairs = cosine_similarity_join(
                ldf, rdf, threshold=THRESHOLD, left_id="qid", right_id="cid",
                nlist=nlist,
            ).count()
            wall = time.time() - t0
            pair_counts["derived" if derived else "fixed"] = pairs
            print(json.dumps({
                "right_n": n, "n_blobs": n_blobs, "policy":
                "derived" if derived else "fixed16", "nlist": nlist,
                "pairs": pairs, "join_wall_s": round(wall, 2),
            }))
        assert pair_counts["derived"] == pair_counts["fixed"], pair_counts
        ldf.unpersist(), rdf.unpersist()


def allow_report(spark, target: str) -> dict:
    """Thin wrapper over the LIBRARY report (promoted r12 — the CLI
    `semantic-allow-report` and this probe read the same math, so the
    probe can never drift from what operators see)."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        semantic_allow_report,
    )

    rep = semantic_allow_report(spark, target)
    return {
        "nlist": rep["nlist"],
        "allowed_cell_pairs": rep["allowed_cell_pairs"],
        "total_cell_pairs": rep["total_cell_pairs"],
        "allow_share": (
            round(rep["allow_share"], 3) if rep["allow_share"] is not None else None
        ),
    }


def recell_mode(n_waves: int, wave: int) -> None:
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        semantic_recell,
    )

    spark = get_session(app_name="semantic-probe-recell")
    base = "/tmp/semantic_probe_recell"
    shutil.rmtree(base, ignore_errors=True)
    landing = os.path.join(base, "landing")
    target = os.path.join(base, "corpus")
    os.makedirs(landing)
    bm = JobBookmark(os.path.join(base, "bm.json"), "probe-recell")

    # 8x more blob structure than the pinned 16 cells can resolve: the
    # decay regime the re-cell exists for
    waves = make_waves(n_waves + 1, wave, n_blobs=128, uniform=False)
    nlist = NLIST
    for w, rows in enumerate(waves):
        if w == n_waves:  # maintenance point: refit cells ~ sqrt(n)
            t0 = time.time()
            rc = semantic_recell(spark, target)
            print(json.dumps({
                "recell": rc,
                "recell_wall_s": round(time.time() - t0, 2),
                **allow_report(spark, target),
            }))
            nlist = rc["new_nlist"]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).coalesce(4).write.parquet(os.path.join(landing, f"w{w}"))
        t0 = time.time()
        stats = incremental_semantic_refresh(
            spark, bm, os.path.join(landing, "*"), target,
            threshold=THRESHOLD, nlist=nlist,
        )
        print(json.dumps({
            "wave": w, "new": stats["new_docs"], "accepted": stats["accepted"],
            "dropped_vs_corpus": stats["dropped_vs_corpus"],
            "dropped_within": stats["dropped_within"],
            "wall_s": round(time.time() - t0, 2),
            **allow_report(spark, target),
        }))
    shutil.rmtree(base, ignore_errors=True)


def sweep_mode(sizes: list[int]) -> None:
    """Measure queries/vectors.py::semantic_threshold_sweep's cost
    split: ONE clustered exact-pair pass at the floor eps vs the per-eps
    readout cost (filter + CC over the cached pair set — the corpus must
    never be re-touched), at growing corpus sizes; plus the floor's
    allowlist-cost claim (lowering the floor widens the cell allowlist
    toward all-pairs; recall is exact at every floor, so the floor is a
    pure cost knob).

    Fixture geometry matters here: blob members sit at ~22 deg pairwise
    (cos ~0.93), so any floor below ~0.93 turns the whole blob structure
    into qualifying pairs (~n^2/nlist of them) — the eps ladder probes
    the DUP tiers planted above that background (tight copies at scale
    0.01 -> cos ~0.997, moderate at 0.03 -> cos ~0.97), and the
    floor-cost claim is measured on the driver-side allowlist share
    (the quantity the floor actually controls), not by materializing a
    quadratic pair set."""
    import pyspark.sql.functions as F

    from big_data_processing_with_aws_glue_workshop_spark.extensions.dedup_fuzzy import (
        connected_components,
    )
    from big_data_processing_with_aws_glue_workshop_spark.extensions.ivf import (
        train_ivf_index,
    )
    from big_data_processing_with_aws_glue_workshop_spark.extensions.similarity import (
        allowed_cell_pairs,
        near_dup_pairs_clustered,
    )
    from big_data_processing_with_aws_glue_workshop_spark.queries.vectors import (
        semantic_threshold_sweep,
    )

    spark = get_session(app_name="semantic-probe-sweep")
    # the floor is the COST knob the op documents: 0.95 sits inside the
    # intra-blob background tail (~8M qualifying pairs at 100k vectors —
    # the measured "too-loose floor" regime, a catastrophic-dedup
    # threshold the audit exists to catch), 0.97 sits above it (pairs
    # bounded by the planted duplicate mass — the scaling regime)
    floor = 0.95 if "--loose" in sys.argv else 0.97
    eps_list = sorted({floor, 0.98, 0.995})
    rng = random.Random(11)
    nrng = np.random.default_rng(11)
    centers = nrng.normal(size=(NLIST, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    for n in sizes:
        # fresh blob samples + two planted dup tiers (8% each), built
        # VECTORIZED in numpy and landed via pyarrow: the per-row
        # Python-list construction make_waves uses blew the process
        # memory cap at 400k x 64 (OOM-killed twice; numpy holds the
        # same fixture in ~100 MB)
        import pyarrow as pa
        import pyarrow.parquet as pq

        n_dup = int(n * 0.08)
        n_fresh = n - 2 * n_dup
        assign = nrng.integers(0, NLIST, size=n_fresh)
        fresh = (
            centers[assign] + nrng.normal(scale=0.035, size=(n_fresh, DIM))
        ).astype(np.float32)
        tight = (
            fresh[nrng.integers(0, n_fresh, size=n_dup)]
            + nrng.normal(scale=0.01, size=(n_dup, DIM))
        ).astype(np.float32)
        moderate = (
            fresh[nrng.integers(0, n_fresh, size=n_dup)]
            + nrng.normal(scale=0.03, size=(n_dup, DIM))
        ).astype(np.float32)
        mat = np.concatenate([fresh, tight, moderate])
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.ListArray.from_arrays(
                    pa.array(
                        np.arange(0, (n + 1) * DIM, DIM, dtype=np.int32)
                    ),
                    pa.array(mat.reshape(-1)),
                ),
            }
        )
        fixture = f"/tmp/semantic_probe_sweep_{n}.parquet"
        pq.write_table(tbl, fixture)
        del mat, fresh, tight, moderate, tbl
        corpus = (
            spark.read.parquet(fixture)
            .select(
                "vec_id",
                F.col("embedding").cast("array<float>").alias("embedding"),
            )
            .repartition(32)
            .cache()
        )
        corpus.count()

        # nlist scales with the corpus (the r13 ladder's posture): at
        # 400k vectors, nlist=16 leaves ~25k-member cells whose
        # block-matmul workers (~2.5 GB of pair scores each) blow this
        # sandbox's process memory cap — measured OOM; 64 cells keep
        # blocks ~150 MB
        nl = 16 if n <= 150_000 else 64

        # cost split: the one-shot pair pass at the floor...
        t0 = time.time()
        pairs = near_dup_pairs_clustered(
            corpus, threshold=floor, nlist=nl
        ).persist()
        n_floor_pairs = pairs.count()
        pass_wall = time.time() - t0
        # ...vs each eps readout over the CACHED pair set
        per_eps = []
        for t in eps_list:
            t0 = time.time()
            sub = pairs.filter(F.col("cos_sim") >= t)
            n_pairs = sub.count()
            removed = 0
            if n_pairs:
                labels = connected_components(sub, "id_a", "id_b")
                removed = labels.count() - labels.select("label").distinct().count()
            per_eps.append(
                {
                    "eps": t,
                    "n_pairs": n_pairs,
                    "docs_removed": removed,
                    "readout_wall_s": round(time.time() - t0, 2),
                }
            )
        pairs.unpersist()

        # end-to-end through the public op (pass + all readouts)
        t0 = time.time()
        semantic_threshold_sweep(corpus, eps_list, nlist=nl).collect()
        sweep_wall = time.time() - t0

        # the floor-cost claim, measured on what the floor controls: the
        # driver-side cell allowlist share (block volume follows it).
        # One assignment pass, then each floor is pure driver arithmetic.
        assigned, _, cmat = train_ivf_index(
            corpus, "embedding", "vec_id", nl, 42, iters=5, emit_angle=True
        )
        cent_rows = {i: [float(x) for x in c] for i, c in enumerate(cmat)}
        import math as _math

        radius_rows = {
            r["cell"]: r["radius"]
            for r in assigned.groupBy("cell")
            .agg(
                F.max(
                    F.coalesce(
                        F.nanvl(F.col("theta"), F.lit(_math.pi)), F.lit(_math.pi)
                    )
                ).alias("radius")
            )
            .collect()
        }
        total_cell_pairs = nl * (nl + 1) // 2
        allow = {}
        for f in (0.995, 0.95, 0.8, 0.5):
            allowed = {
                (min(c1, c2), max(c1, c2))
                for c1, c2 in allowed_cell_pairs(
                    cent_rows, radius_rows, radius_rows, f
                )
            }
            allow[str(f)] = {
                "allowed_cell_pairs": len(allowed),
                "share": round(len(allowed) / total_cell_pairs, 3),
            }
        print(json.dumps({
            "n_vectors": n,
            "floor": floor,
            "floor_pairs": n_floor_pairs,
            "pair_pass_wall_s": round(pass_wall, 2),
            "per_eps": per_eps,
            "sweep_total_wall_s": round(sweep_wall, 2),
            "allowlist_share_by_floor": allow,
        }), flush=True)
        corpus.unpersist()
        try:
            os.remove(fixture)
        except OSError:
            pass


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--sweep" in sys.argv:
        sweep_mode([int(a) for a in args] or [100_000, 400_000])
        return
    if "--join-prod" in sys.argv:
        join_prod_mode([int(a) for a in args] or [80_000, 200_000])
        return
    if "--join" in sys.argv:
        join_mode(
            [int(a) for a in args] or [20_000, 80_000, 200_000],
            derived="--derived" in sys.argv,
            brute="--no-brute" not in sys.argv,
        )
        return
    if "--recell" in sys.argv:
        recell_mode(
            int(args[0]) if args else 4,
            int(args[1]) if len(args) > 1 else 5_000,
        )
        return
    uniform = "--uniform" in sys.argv
    n_waves = int(args[0]) if args else 5
    wave = int(args[1]) if len(args) > 1 else 20_000

    spark = get_session(app_name="semantic-probe")
    base = "/tmp/semantic_probe"
    shutil.rmtree(base, ignore_errors=True)
    landing = os.path.join(base, "landing")
    target = os.path.join(base, "corpus")
    os.makedirs(landing)
    bm = JobBookmark(os.path.join(base, "bm.json"), "probe")

    waves = make_waves(n_waves, wave, n_blobs=NLIST, uniform=uniform)
    standing = 0
    for w, rows in enumerate(waves):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).coalesce(4).write.parquet(os.path.join(landing, f"w{w}"))
        t0 = time.time()
        stats = incremental_semantic_refresh(
            spark,
            bm,
            os.path.join(landing, "*"),
            target,
            threshold=THRESHOLD,
            nlist=NLIST,
        )
        wall = time.time() - t0
        # pruning diagnostics: recompute the allowlist ratio the refresh
        # used (same math over the published state)
        with open(os.path.join(target, "current.json")) as f:
            pointer = json.load(f)
        cents = pointer["centroids"]
        st = read_deduped(spark, target)
        import pyspark.sql.functions as F

        radii = {
            r["cell"]: r["radius"]
            for r in st.groupBy("cell").agg(F.max("theta").alias("radius")).collect()
        }
        from big_data_processing_with_aws_glue_workshop_spark.extensions.similarity import (
            allowed_cell_pairs,
        )

        total_pairs = len(radii) * len(radii)
        allowed = len(allowed_cell_pairs(cents, radii, radii, THRESHOLD))
        cell_sizes = {
            r["cell"]: r["n"]
            for r in st.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        # candidate rows the verify stage paid ~= sum over allowed pairs of
        # inc-share x standing cell size; report the allowlist share as the
        # structural number (exact volume depends on the increment's cells)
        print(
            json.dumps(
                {
                    "wave": w,
                    "standing_before": standing,
                    "new": stats["new_docs"],
                    "accepted": stats["accepted"],
                    "dropped_vs_corpus": stats["dropped_vs_corpus"],
                    "dropped_within": stats["dropped_within"],
                    "allowed_cell_pairs": allowed,
                    "total_cell_pairs": total_pairs,
                    "allow_share": round(allowed / total_pairs, 3),
                    "wall_s": round(wall, 2),
                }
            )
        )
        standing += stats["accepted"]
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
