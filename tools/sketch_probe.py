"""Measure the Count-Min sketch against exact groupBy counting on a
wide-key-domain Zipf workload: state size, build wall time, and
head-key estimate accuracy, at growing row counts.

Usage: python tools/sketch_probe.py [n_rows ...]   (default 2M 8M 32M)
Prints one JSON line per size; paste into docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import cms_estimate, cms_sketch
from big_data_processing_with_aws_glue_workshop_spark.session import get_session

DEPTH, WIDTH = 5, 65_536


def zipf(spark, n, offset=0):
    # realistic URL/shingle shape: 90% of rows over a ~1000-key hot head
    # (mass ~ 1/k), 10% a long tail of UNIQUE keys — distinct count
    # ~n/10, which is what makes exact counting state corpus-scale.
    # offset decorrelates two sides' row-level draws (shared hot-head
    # key SPACE, different per-row assignment) for the join-size probe.
    ido = F.col("id") + F.lit(offset)
    h = F.pmod(F.xxhash64(ido), F.lit(1000))
    head = F.concat(
        F.lit("hot_"),
        F.floor(F.lit(1000.0) / (h.cast("double") + F.lit(1.0))).cast("string"),
    )
    tail = F.concat(F.lit("tail_"), ido.cast("string"))
    return spark.range(n).select(
        F.when(F.pmod(F.xxhash64(ido, F.lit(1)), F.lit(10)) < 9, head)
        .otherwise(tail)
        .alias("k")
    )


def probe(spark, n) -> dict:
    df = zipf(spark, n).persist()
    df.count()

    t0 = time.time()
    exact = df.groupBy("k").agg(F.count("*").alias("n"))
    n_distinct = exact.count()
    t_exact = time.time() - t0

    t0 = time.time()
    sketch = cms_sketch(df, "k", depth=DEPTH, width=WIDTH).persist()
    state_rows = sketch.count()
    t_sketch = time.time() - t0

    # probe head keys (the ones heavy-hitter queries care about) plus a
    # slice of the count-1 tail; the CMS guarantee is ABSOLUTE (eps*N),
    # so the tail's relative error is meaningless by design
    top = exact.orderBy(F.desc("n"), "k").limit(200).collect()
    truth = {r["k"]: r["n"] for r in top}
    keys_df = spark.createDataFrame([(k,) for k in truth], "k string")
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(sketch, keys_df, "k", depth=DEPTH, width=WIDTH).collect()
    }
    eps_n = (2.718 / WIDTH) * n
    max_abs = max(est[k] - truth[k] for k in truth)
    head = {k: c for k, c in truth.items() if c >= 1000}
    head_rel = (
        max((est[k] - truth[k]) / truth[k] for k in head) if head else None
    )
    df.unpersist()
    sketch.unpersist()
    return {
        "n_rows": n,
        "n_distinct": n_distinct,
        "exact_sec": round(t_exact, 2),
        "sketch_sec": round(t_sketch, 2),
        "state_rows": state_rows,
        "state_vs_distinct": round(state_rows / n_distinct, 4),
        "max_abs_overestimate": max_abs,
        "eps_n_bound": round(eps_n, 1),
        "head_max_rel_overestimate": (
            round(head_rel, 6) if head_rel is not None else None
        ),
    }


def probe_bloom(spark, n, m=100_000, contam_pct=1) -> dict:
    """Decontamination-at-scale shape: corpus of n keys (contam_pct%
    contaminated from an m-key benchmark set) de-contaminated two ways,
    with autoBroadcastJoinThreshold=-1 emulating the 100 TB case where
    the RAW benchmark shingle set is too big to broadcast (its 128 KB
    Bloom bitmap still broadcasts via the explicit hint):

    - plain: one shuffle anti-join of all n corpus rows vs the benchmark
    - bloom: map-side k-bit membership on the corpus (no probe shuffle),
      then the exact verify + anti-join touch only bloom-POSITIVE rows

    Survivor counts must be EQUAL (zero false negatives); the measured
    quantities are wall times and the pruning factor (positives /
    corpus), which is what bounds the shuffle at scale."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    bench = (
        spark.range(m).select(F.concat(F.lit("b"), "id").alias("s")).persist()
    )
    bench.count()
    corpus = (
        spark.range(n)
        .select(
            F.when(
                F.pmod(F.xxhash64("id"), F.lit(100)) < contam_pct,
                F.concat(
                    F.lit("b"),
                    F.pmod(F.xxhash64("id", F.lit(2)), F.lit(m)).cast("string"),
                ),
            )
            .otherwise(F.concat(F.lit("c"), F.col("id").cast("string")))
            .alias("s")
        )
        .persist()
    )
    corpus.count()

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t0 = time.time()
        survivors_plain = corpus.join(bench, "s", "left_anti").count()
        t_plain = time.time() - t0

        t0 = time.time()
        bloom = bloom_build(bench, "s").persist()
        bloom.count()
        t_build = time.time() - t0

        t0 = time.time()
        pos = bloom_probe(bloom, corpus, "s").persist()
        n_pos = pos.count()
        t_probe = time.time() - t0

        t0 = time.time()
        survivors_bloom = n - pos.join(bench, "s", "left_semi").count()
        t_verify = time.time() - t0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    for df in (bench, corpus, bloom, pos):
        df.unpersist()
    assert survivors_bloom == survivors_plain, "false negative!"
    return {
        "mode": "bloom",
        "corpus_rows": n,
        "bench_keys": m,
        "plain_antijoin_sec": round(t_plain, 2),
        "bloom_build_sec": round(t_build, 2),
        "bloom_probe_sec": round(t_probe, 2),
        "verify_sec": round(t_verify, 2),
        "bloom_total_sec": round(t_build + t_probe + t_verify, 2),
        "positives": n_pos,
        "pruning_factor": round(n_pos / n, 4),
        "survivors": survivors_plain,
    }


def probe_minima(spark, n, slots) -> dict:
    """Slot-minima sample probe: one corpus pass builds the <= slots
    state; measure wall time vs the exact quantile job it substitutes
    for, quantile RANK error on a skewed (cubed) value column, the
    rank-minima distinct estimate error, and Jaccard error on a
    constructed 1/3 overlap."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import (
        minima_distinct_estimate,
        minima_jaccard,
        minima_sample,
        sample_quantiles,
    )

    df = (
        spark.range(n)
        .select(
            F.concat(F.lit("k"), "id").alias("k"),
            F.pow(F.col("id").cast("double") / n, 3).alias("v"),
        )
        .persist()
    )
    df.count()

    t0 = time.time()
    st = minima_sample(df, "k", ["v"], slots=slots).persist()
    st.count()
    t_build = time.time() - t0

    qs = sample_quantiles(st, "v", [0.1, 0.5, 0.9])
    # v = (rank_fraction)^3, so the exact rank of a value is v^(1/3)
    rank_errs = {q: abs(v ** (1.0 / 3) - q) for q, v in qs.items()}

    t0 = time.time()
    exact_q = df.agg(
        F.percentile_approx("v", [0.1, 0.5, 0.9], 10_000)
    ).first()[0]
    t_exact = time.time() - t0
    del exact_q

    est = minima_distinct_estimate(st, slots)

    a = minima_sample(df.filter(F.col("id") < 2 * n // 3), "k", slots=slots)
    b = minima_sample(df.filter(F.col("id") >= n // 3), "k", slots=slots)
    jac = minima_jaccard(a, b)  # truth: (n/3) / n = 1/3

    df.unpersist()
    st.unpersist()
    return {
        "n_rows": n,
        "slots": slots,
        "build_sec": round(t_build, 2),
        "exact_percentile_sec": round(t_exact, 2),
        "q_rank_err": {str(q): round(e, 4) for q, e in rank_errs.items()},
        "distinct_rel_err": round(abs(est - n) / n, 4),
        "jaccard_abs_err": round(abs(jac - 1 / 3), 4),
    }


def probe_joinsize(spark, n) -> dict:
    """cms_join_size_estimate vs the true equi-join output cardinality
    on two decorrelated Zipf sides (shared ~1000-key hot head, unique
    tails): the skewed many-to-many regime where the OUTPUT explodes
    far past either input size and the planner needs the inner product,
    not |A| or |B|. Truth comes from the count-vector inner product
    (sum of cnt_a*cnt_b over shared keys) — same number as the join's
    count, without materializing the quadratic output."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_join_size_estimate,
        cms_sketch,
    )

    a = zipf(spark, n).persist()
    b = zipf(spark, n, offset=1_000_000_007).persist()
    a.count(), b.count()

    t0 = time.time()
    ca = a.groupBy("k").agg(F.count("*").alias("na"))
    cb = b.groupBy("k").agg(F.count("*").alias("nb"))
    true_size = (
        ca.join(cb, "k")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("s"))
        .first()["s"]
        or 0
    )
    t_truth = time.time() - t0

    t0 = time.time()
    est = cms_join_size_estimate(
        cms_sketch(a, "k", depth=CMS_DEPTH, width=CMS_WIDTH),
        cms_sketch(b, "k", depth=CMS_DEPTH, width=CMS_WIDTH),
        depth=CMS_DEPTH,
    )
    t_est = time.time() - t0

    a.unpersist(), b.unpersist()
    return {
        "n_rows_per_side": n,
        "true_join_size": int(true_size),
        "cms_estimate": est,
        "rel_overestimate": round((est - true_size) / true_size, 6)
        if true_size
        else None,
        "t_exact_truth_s": round(t_truth, 2),
        "t_cms_estimate_s": round(t_est, 2),
    }


def probe_hll_intersection(spark, n_side, overlap) -> dict:
    """hll_intersection_estimate vs exact |A ∩ B| at a given overlap
    size: quantifies the docstring's caveat that inclusion-exclusion
    error is driven by the UNION's cardinality, so small true overlaps
    drown in register noise (and minima_jaccard is the tool there)."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.sketch import (
        hll_intersection_estimate,
        hll_sketch,
    )

    a = spark.range(0, n_side).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    b = spark.range(n_side - overlap, 2 * n_side - overlap).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    t0 = time.time()
    est = hll_intersection_estimate(hll_sketch(a, "k"), hll_sketch(b, "k"))
    t = time.time() - t0
    return {
        "n_per_side": n_side,
        "true_intersection": overlap,
        "hll_estimate": round(est, 1),
        "abs_err": round(abs(est - overlap), 1),
        "err_vs_union": round(abs(est - overlap) / (2 * n_side - overlap), 4),
        "wall_s": round(t, 2),
    }


def probe_drift_sustained(spark, n_waves=12, wave_docs=50_000, n_buckets=4096):
    """Sustained-load curve for the streaming drift monitor (r14, r13
    verdict #6): the batch/stream parity tests pin correctness, but no
    measured curve existed for the per-wave cost as the standing
    histogram accumulates. Claims under test:
      1. per-wave commit wall is FLAT across waves (the merge cost is
         bounded by the <= |sources| * n_buckets standing grid, never by
         how much history was streamed);
      2. the drift-report wall is flat too (target fit + bounded-grid
         arithmetic, corpus never re-read);
      3. the standing grid row count saturates at the bound.
    Each wave is sunk via the foreachBatch callable directly (exactly
    what run_stream_ngram_histogram invokes per micro-batch)."""
    import shutil
    import tempfile

    from big_data_processing_with_aws_glue_workshop_spark.streaming.sketch import (
        NgramHistogramSink,
        read_stream_sketch,
        stream_drift_report,
    )

    work = tempfile.mkdtemp(prefix="drift_probe_")
    target_dir = os.path.join(work, "hist")
    try:
        sink = NgramHistogramSink(target_dir, n_buckets=n_buckets)
        # two sources with disjoint 200-word vocabularies, deterministic
        # text; the target speaks the alpha vocabulary so the report has
        # a real drift ordering to show
        target = spark.range(2_000).select(
            F.concat_ws(
                " ", *[F.concat(F.lit("alpha"), F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(200)).cast("string")) for j in range(15)]
            ).alias("text")
        )
        rows = []
        for wave in range(n_waves):
            batch = spark.range(wave * wave_docs, (wave + 1) * wave_docs).select(
                F.when(F.col("id") % 2 == 0, F.lit("alpha_src"))
                .otherwise(F.lit("beta_src"))
                .alias("source"),
                F.concat_ws(
                    " ",
                    *[
                        F.concat(
                            F.when(F.col("id") % 2 == 0, F.lit("alpha")).otherwise(
                                F.lit("beta")
                            ),
                            F.pmod(
                                F.xxhash64(F.col("id"), F.lit(j)), F.lit(200)
                            ).cast("string"),
                        )
                        for j in range(15)
                    ],
                ).alias("text"),
            )
            t0 = time.time()
            sink(batch, wave)
            commit_wall = time.time() - t0
            t0 = time.time()
            report = stream_drift_report(spark, target_dir, target).collect()
            report_wall = time.time() - t0
            standing_rows = read_stream_sketch(spark, target_dir).count()
            rec = {
                "op": "ngram_histogram_sink_sustained",
                "wave": wave,
                "wave_docs": wave_docs,
                "commit_wall_s": round(commit_wall, 2),
                "report_wall_s": round(report_wall, 2),
                "standing_rows": standing_rows,
                "grid_bound": 2 * n_buckets,
                "jsd": {r["source"]: int(r["jsd_micro"]) for r in report},
            }
            rows.append(rec)
            print(json.dumps(rec), flush=True)
        # flatness claim: late-wave commit cost within 2x of early steady
        early = min(r["commit_wall_s"] for r in rows[1:4])
        late = min(r["commit_wall_s"] for r in rows[-3:])
        assert late <= 2 * early + 0.5, (early, late)
        assert all(r["standing_rows"] <= 2 * n_buckets for r in rows)
        return rows
    finally:
        shutil.rmtree(work, ignore_errors=True)


def probe_admission_sustained(spark, n_waves=12, wave_docs=50_000):
    """Sustained-load curve for the streaming budget-admission sink (r15,
    r14 verdict #3): the semantics test pins the wave-greedy contract and
    the fold parity, but the per-wave cost claim (bounded by the budgets
    and the wave, never the stream) was argued from construction, not
    measured. Budgets are sized so exhaustion hits MID-RUN — source
    'fast' exhausts at wave 2, 'slow' at wave 6 — so the curve shows all
    three regimes: filling, partially exhausted, fully exhausted. Claims
    under test, asserted every wave:
      1. per-source spent NEVER exceeds its budget (the invariant, at
         every moment of the stream's life);
      2. the standing admitted table is bounded by total budget mass /
         min doc tokens, and STOPS GROWING once both budgets exhaust
         while waves keep landing;
      3. per-wave commit wall is FLAT across waves — in particular the
         post-exhaustion waves (pure EXCLUDED classification + a
         bounded-table rewrite) cost no more than the filling waves.
    Each wave is sunk via the foreachBatch callable directly (exactly
    what run_stream_budget_admission invokes per micro-batch)."""
    import shutil
    import tempfile

    from big_data_processing_with_aws_glue_workshop_spark.streaming.selection import (
        BudgetAdmissionSink,
        admission_report,
        read_admitted,
    )

    # per wave per source: wave_docs/2 docs x 10 tokens
    per_wave_mass = (wave_docs // 2) * 10
    budgets = {"fast": 2 * per_wave_mass, "slow": 6 * per_wave_mass}
    rows_bound = sum(budgets.values()) // 10  # every admitted doc spends 10

    work = tempfile.mkdtemp(prefix="admission_probe_")
    target_dir = os.path.join(work, "admitted")
    try:
        sink = BudgetAdmissionSink(target_dir, budgets, "score")
        rows = []
        for wave in range(n_waves):
            batch = spark.range(wave * wave_docs, (wave + 1) * wave_docs).select(
                F.col("id").alias("doc_id"),
                F.when(F.col("id") % 2 == 0, F.lit("fast"))
                .otherwise(F.lit("slow"))
                .alias("source"),
                # deterministic quality spread inside every wave
                (F.pmod(F.xxhash64("id"), F.lit(10_000)) / 100.0).alias("score"),
                F.lit(10).cast("long").alias("n_tokens"),
            )
            t0 = time.time()
            sink(batch, wave)
            commit_wall = time.time() - t0
            rep = admission_report(target_dir)
            standing_rows = read_admitted(spark, target_dir).count()
            # claim 1: the budget invariant holds at EVERY wave
            assert all(v["spent"] <= v["budget"] for v in rep.values()), rep
            # claim 2: standing table bounded by the budgets, never the stream
            assert standing_rows <= rows_bound, (standing_rows, rows_bound)
            rec = {
                "op": "budget_admission_sink_sustained",
                "wave": wave,
                "wave_docs": wave_docs,
                "commit_wall_s": round(commit_wall, 2),
                "standing_rows": standing_rows,
                "rows_bound": rows_bound,
                "spent": {s: v["spent"] for s, v in rep.items()},
                "remaining": {s: v["remaining"] for s, v in rep.items()},
            }
            rows.append(rec)
            print(json.dumps(rec), flush=True)
        # exhaustion hit mid-run and the table stopped growing after it
        exhausted_at = next(
            i
            for i, r in enumerate(rows)
            if all(v == 0 for v in r["remaining"].values())
        )
        assert 0 < exhausted_at < n_waves - 2, exhausted_at
        assert all(
            r["standing_rows"] == rows[exhausted_at]["standing_rows"]
            for r in rows[exhausted_at:]
        )
        # claim 3: flatness — late (post-exhaustion) waves within 2x of
        # the early filling steady-state (same tolerance as the drift
        # probe; min-of-3 damps GC/JIT outliers)
        early = min(r["commit_wall_s"] for r in rows[1:4])
        late = min(r["commit_wall_s"] for r in rows[-3:])
        assert late <= 2 * early + 0.5, (early, late)
        return rows
    finally:
        shutil.rmtree(work, ignore_errors=True)


def probe_curriculum_sustained(spark, n_waves=12, wave_docs=50_000):
    """Sustained-load curve for the streaming CURRICULUM admission sink
    (r16, the flat sink's r15 curve applied to the phase-ordered
    contract): phases are sized so the regimes STAGGER — the top phase
    ('anneal', 2 waves of mass per source) exhausts first and docs
    start overflowing to 'bulk' (6 waves of mass), which exhausts
    mid-run; late waves land fully rejected. Claims, asserted every
    wave:
      1. per-(phase, source) spent NEVER exceeds its budget;
      2. the standing table is bounded by TOTAL budget mass across all
         phases / min doc tokens, and stops growing once every phase
         exhausts while waves keep landing;
      3. per-wave commit wall is FLAT across waves — P stratified
         passes over the WAVE, never history, post-exhaustion waves no
         costlier than filling ones."""
    import shutil
    import tempfile

    from big_data_processing_with_aws_glue_workshop_spark.streaming.selection import (
        CurriculumAdmissionSink,
        curriculum_admission_report,
        read_admitted,
    )

    per_wave_mass = (wave_docs // 2) * 10
    # anneal holds 1.5 waves of mass per source (exhausts INSIDE wave
    # 1, cutting a wave mid-prefix); bulk's fast lane adds 1 more wave
    # (fast fully exhausts at wave 2) while its slow lane runs to wave
    # 5 — three regimes: filling, partially exhausted (overflow
    # rerouting), fully exhausted
    phases = [
        ("anneal", {
            "fast": 3 * per_wave_mass // 2, "slow": 3 * per_wave_mass // 2,
        }),
        ("bulk", {
            "fast": 1 * per_wave_mass, "slow": 9 * per_wave_mass // 2,
        }),
    ]
    total_mass = sum(v for _, b in phases for v in b.values())
    rows_bound = total_mass // 10

    work = tempfile.mkdtemp(prefix="curriculum_probe_")
    target_dir = os.path.join(work, "admitted")
    try:
        sink = CurriculumAdmissionSink(target_dir, phases, "score")
        rows = []
        for wave in range(n_waves):
            batch = spark.range(wave * wave_docs, (wave + 1) * wave_docs).select(
                F.col("id").alias("doc_id"),
                F.when(F.col("id") % 2 == 0, F.lit("fast"))
                .otherwise(F.lit("slow"))
                .alias("source"),
                (F.pmod(F.xxhash64("id"), F.lit(10_000)) / 100.0).alias("score"),
                F.lit(10).cast("long").alias("n_tokens"),
            )
            t0 = time.time()
            sink(batch, wave)
            commit_wall = time.time() - t0
            rep = curriculum_admission_report(target_dir)
            standing_rows = read_admitted(spark, target_dir).count()
            assert all(
                v["spent"] <= v["budget"]
                for per in rep.values()
                for v in per.values()
            ), rep
            assert standing_rows <= rows_bound, (standing_rows, rows_bound)
            rec = {
                "op": "curriculum_admission_sink_sustained",
                "wave": wave,
                "wave_docs": wave_docs,
                "commit_wall_s": round(commit_wall, 2),
                "standing_rows": standing_rows,
                "rows_bound": rows_bound,
                "remaining": {
                    p: {s: v["remaining"] for s, v in per.items()}
                    for p, per in rep.items()
                },
            }
            rows.append(rec)
            print(json.dumps(rec), flush=True)
        # staggered exhaustion: anneal fully exhausts before bulk does,
        # bulk exhausts mid-run, table frozen from then on
        def exhausted(r, phase):
            return all(v == 0 for v in r["remaining"][phase].values())

        anneal_at = next(i for i, r in enumerate(rows) if exhausted(r, "anneal"))
        all_at = next(
            i
            for i, r in enumerate(rows)
            if exhausted(r, "anneal") and exhausted(r, "bulk")
        )
        assert 0 < anneal_at < all_at < n_waves - 2, (anneal_at, all_at)
        assert all(
            r["standing_rows"] == rows[all_at]["standing_rows"]
            for r in rows[all_at:]
        )
        early = min(r["commit_wall_s"] for r in rows[1:4])
        late = min(r["commit_wall_s"] for r in rows[-3:])
        assert late <= 2 * early + 0.5, (early, late)
        return rows
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    args = sys.argv[1:]
    spark = get_session(app_name="sketch-probe")
    if args and args[0] == "--curriculum-sustained":
        n_waves = int(args[1]) if len(args) > 1 else 12
        wave_docs = int(args[2]) if len(args) > 2 else 50_000
        probe_curriculum_sustained(spark, n_waves=n_waves, wave_docs=wave_docs)
        return
    if args and args[0] == "--admission-sustained":
        n_waves = int(args[1]) if len(args) > 1 else 12
        wave_docs = int(args[2]) if len(args) > 2 else 50_000
        probe_admission_sustained(spark, n_waves=n_waves, wave_docs=wave_docs)
        return
    if args and args[0] == "--drift-sustained":
        n_waves = int(args[1]) if len(args) > 1 else 12
        wave_docs = int(args[2]) if len(args) > 2 else 50_000
        probe_drift_sustained(spark, n_waves=n_waves, wave_docs=wave_docs)
        return
    if args and args[0] == "--hll-intersect":
        n = int(args[1]) if len(args) > 1 else 1_000_000
        for overlap in (n // 2, n // 10, n // 100, n // 1000):
            print(json.dumps(probe_hll_intersection(spark, n, overlap)))
        return
    if args and args[0] == "--joinsize":
        sizes = [int(a) for a in args[1:]] or [2_000_000, 8_000_000, 32_000_000]
        for n in sizes:
            print(json.dumps(probe_joinsize(spark, n)))
        return
    if args and args[0] == "--bloom":
        sizes = [int(a) for a in args[1:]] or [2_000_000, 8_000_000, 32_000_000]
        for n in sizes:
            print(json.dumps(probe_bloom(spark, n)))
        return
    if args and args[0] == "--minima":
        rest = [int(a) for a in args[1:]]
        sizes = rest or [2_000_000, 8_000_000, 32_000_000]
        for n in sizes:
            for slots in (1_024, 4_096, 16_384):
                print(json.dumps(probe_minima(spark, n, slots)))
        return
    sizes = [int(a) for a in args] or [2_000_000, 8_000_000, 32_000_000]
    for n in sizes:
        print(json.dumps(probe(spark, n)))


if __name__ == "__main__":
    main()
