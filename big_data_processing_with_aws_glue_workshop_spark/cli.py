"""Runnable medallion jobs — the drop-in replacement for the reference's
three Glue jobs (EP1 bronze, EP2 silver, EP3 gold) plus the Athena
analytics surface (EP4), on plain open-source Spark over local/posix paths.

    python -m big_data_processing_with_aws_glue_workshop_spark.cli bronze \
        --input raw.csv --output lake/bronze
    python -m big_data_processing_with_aws_glue_workshop_spark.cli silver \
        --bronze lake/bronze --catalogs data/catalogs --output lake/silver \
        --error-logs lake/logs --reference-year 2025
    python -m big_data_processing_with_aws_glue_workshop_spark.cli gold \
        --silver lake/silver --output lake/gold --today 2025-06-30
    python -m big_data_processing_with_aws_glue_workshop_spark.cli analytics \
        --gold lake/gold --query q1 --year 2025

Job parameterization (operator S9) is argparse; job bookmarks (S10) live in
``sources/bookmarks.py`` (file-set and watermark incremental ingest — the
reference declares but never uses its bookmarks, so the CLI jobs stay
full-refresh by default). Each command prints one JSON summary line on
stdout.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys

from pyspark.sql import functions as F

from .functions.text import snake_case_columns
from .operators.dq import consolidated_validation
from .operators.joins import anti_join_orphans
from .plans import analytics
from .plans.rues import (
    RuesConfig,
    apply_rules,
    bronze_year_partition,
    build_dim_empresa,
    build_fact_renovacion,
    silver_rules,
    silver_validation_rules,
    silver_year_partition,
)
from .session import get_session
from .sources import (
    read_csv_robust,
    read_parquet_lake,
    write_csv_single,
    write_parquet,
    write_parquet_partitioned,
)


def _emit(summary: dict) -> None:
    print(json.dumps(summary, default=str))


def cmd_bronze(args: argparse.Namespace) -> None:
    spark = get_session(app_name="job-bronze")
    df = snake_case_columns(read_csv_robust(spark, args.input))
    from .operators.dq import sampled_profile

    n_sample, nulls, dups = sampled_profile(df, fraction=args.sample_fraction, seed=42)
    bronze = bronze_year_partition(df)
    write_parquet_partitioned(bronze, args.output, "year_partition", args.num_files)
    _emit(
        {
            "job": "bronze",
            "output": args.output,
            "sample_rows": n_sample,
            "columns_with_nulls": sum(1 for v in nulls.values() if v > 0),
            "duplicate_rows_in_sample": dups,
        }
    )


def cmd_silver(args: argparse.Namespace) -> None:
    spark = get_session(app_name="job-silver")
    df = read_parquet_lake(spark, args.bronze, drop_partition_cols=["year_partition"])
    cat_ident = read_csv_robust(
        spark, os.path.join(args.catalogs, "catalogo_clases_identificaciones.csv")
    )
    cat_ciiu = read_csv_robust(
        spark, os.path.join(args.catalogs, "catalogo_codigos_ciuu.csv")
    )
    config = RuesConfig(reference_year=args.reference_year)
    silver = apply_rules(df, silver_rules(cat_ident, cat_ciiu, config))
    silver.cache()
    try:
        counts, error_df = consolidated_validation(silver, silver_validation_rules())
        if args.error_logs and error_df.count() > 0:
            stamp = dt.datetime.now().strftime("%Y%m%d_%H%M%S")
            write_csv_single(error_df, os.path.join(args.error_logs, f"errors_{stamp}.csv"))
        write_parquet_partitioned(
            silver_year_partition(silver), args.output, "year_partition", args.num_files
        )
    finally:
        silver.unpersist()
    _emit(
        {
            "job": "silver",
            "output": args.output,
            "violations": {k: v for k, v in counts.items() if v > 0},
        }
    )


def cmd_gold(args: argparse.Namespace) -> None:
    spark = get_session(app_name="job-gold")
    silver = read_parquet_lake(spark, args.silver, drop_partition_cols=["year_partition"])
    config = RuesConfig(today=args.today)
    # cache: dim/fact are each consumed by the integrity check, the write,
    # and the summary count — without it the silver scan + distinct re-run 3x
    dim = build_dim_empresa(silver).cache()
    fact = build_fact_renovacion(silver, config).cache()
    try:
        orphans = anti_join_orphans(fact, dim, "matricula").count()
        write_parquet(dim, os.path.join(args.output, "dim_empresa"), num_files=20)
        write_parquet_partitioned(
            fact, os.path.join(args.output, "fact_renovacion"), "estado_matricula", 30
        )
        summary = {
            "job": "gold",
            "output": args.output,
            "dim_rows": dim.count(),
            "fact_rows": fact.count(),
            "orphan_matriculas": orphans,
        }
    finally:
        dim.unpersist()
        fact.unpersist()
    _emit(summary)


def cmd_analytics(args: argparse.Namespace) -> None:
    spark = get_session(app_name="analytics")
    dim = spark.read.parquet(os.path.join(args.gold, "dim_empresa"))
    fact = spark.read.parquet(os.path.join(args.gold, "fact_renovacion"))
    analytics.register_gold_views(spark, dim, fact)
    runners = {
        "q1": lambda: analytics.q1_active_by_society_type(spark),
        "q2": lambda: analytics.q2_avg_age_by_activity(spark),
        "q3": lambda: analytics.q3_renewal_rate_by_chamber(spark),
        "q4": lambda: analytics.q4_ml_renewal_dataset(
            spark, current_year=args.year, sample_limit=args.limit, seed=args.seed
        ),
    }
    df = runners[args.query]().cache()
    try:
        summary = {
            "job": "analytics",
            "query": args.query,
            "total_rows": df.count(),
            "rows": [r.asDict() for r in df.limit(args.show).collect()],
        }
    finally:
        df.unpersist()
    _emit(summary)


def cmd_textpipe(args: argparse.Namespace) -> None:
    from .plans.textpipe import run_text_pipeline

    # flag validation BEFORE any Spark work (r14 review findings: the
    # conflicting pair used to execute four stages before raising, and
    # a lone --dsir-target was silently ignored)
    mode_flags = {
        "--dsir-budget": args.dsir_budget is not None,
        "--quality-mixture": args.quality_mixture,
        "--stratified-budgets": args.stratified_budgets is not None,
        "--dsir-stratified-budgets": args.dsir_stratified_budgets is not None,
        "--curriculum-phase": args.curriculum_phase is not None,
    }
    if sum(mode_flags.values()) > 1:
        on = sorted(k for k, v in mode_flags.items() if v)
        raise SystemExit(
            f"{' and '.join(on)} are mutually exclusive — stage 5 takes "
            "ONE selection decision"
        )
    if args.dsir_budget is not None and not args.dsir_target:
        raise SystemExit("--dsir-budget requires --dsir-target <parquet>")
    if args.dsir_stratified_budgets is not None and not args.dsir_target:
        raise SystemExit(
            "--dsir-stratified-budgets requires --dsir-target <parquet>"
        )
    needs_target = (
        args.dsir_budget is not None or args.dsir_stratified_budgets is not None
    )
    if args.dsir_target and not needs_target:
        raise SystemExit(
            "--dsir-target does nothing without --dsir-budget <tokens> or "
            "--dsir-stratified-budgets — name a budget or drop the target"
        )
    # parse (and refuse) budget dicts BEFORE any Spark work too
    strat_budgets = (
        _parse_budgets(args.stratified_budgets)
        if args.stratified_budgets is not None
        else None
    )
    dsir_strat_budgets = (
        _parse_budgets(args.dsir_stratified_budgets)
        if args.dsir_stratified_budgets is not None
        else None
    )
    curriculum = None
    if args.curriculum_phase is not None:
        curriculum = []
        seen_phases = set()
        for spec in args.curriculum_phase:
            if ":" not in spec:
                raise SystemExit(
                    f"--curriculum-phase {spec!r} is not name:src=tokens,..."
                )
            pname, budget_str = spec.split(":", 1)
            if not pname:
                raise SystemExit(
                    f"--curriculum-phase {spec!r} has an empty phase name"
                )
            if pname in seen_phases:
                raise SystemExit(f"--curriculum-phase names repeat: {pname!r}")
            seen_phases.add(pname)
            curriculum.append((pname, _parse_budgets(budget_str)))
    spark = get_session(app_name="textpipe")
    dsir_target = None
    if needs_target:
        dsir_target = spark.read.parquet(args.dsir_target)
    summary = run_text_pipeline(
        spark,
        args.sf_dir,
        out_dir=args.output,
        min_chars=args.min_chars,
        budget=args.budget,
        passage_decontam=args.passage_decontam,
        dsir_target=dsir_target,
        dsir_budget_tokens=args.dsir_budget,
        dsir_seed=args.dsir_seed,
        mixture_by_quality=args.quality_mixture,
        stratified_budgets=strat_budgets,
        dsir_stratified_budgets=dsir_strat_budgets,
        curriculum_phases=curriculum,
    )
    _emit({"job": "textpipe", **summary})


def cmd_zorder(args: argparse.Namespace) -> None:
    from .operators.layout import zorder_dataframe

    spark = get_session(app_name="zorder")
    df = spark.read.parquet(args.input)
    zorder_dataframe(df, args.by, args.num_files).write.mode("overwrite").parquet(
        args.output
    )
    _emit(
        {
            "job": "zorder",
            "input": args.input,
            "output": args.output,
            "by": args.by,
            "files": args.num_files,
            "rows": spark.read.parquet(args.output).count(),
        }
    )


def cmd_refresh(args: argparse.Namespace) -> None:
    """Bookmark-driven incremental upsert of newly-landed files into a
    versioned snapshot table (plans/incremental.py) — identity transform,
    keep-latest merge when --order-col is given."""
    from .plans.incremental import incremental_refresh, read_refreshed
    from .sources.bookmarks import JobBookmark
    from .streaming.sinks import read_pointer

    spark = get_session(app_name="refresh")
    bm = JobBookmark(args.bookmark, args.job_name)
    n = incremental_refresh(
        spark,
        bm,
        args.pattern,
        lambda df: df,
        args.target,
        keys=args.keys,
        order_col=args.order_col,
    )
    has_table = read_pointer(args.target) is not None
    _emit(
        {
            "job": "refresh",
            "new_files": n,
            "target_rows": read_refreshed(spark, args.target).count()
            if has_table
            else 0,
        }
    )


def cmd_agg_refresh(args: argparse.Namespace) -> None:
    """Incremental aggregate maintenance (plans/incremental.py): monoid-
    merge per-key partials from newly-landed files into the stored state —
    the materialized view never re-reads the fact. --agg out=kind:col,
    e.g. --agg n=count:* --agg total=sum:amount. --hll-key COL instead
    maintains a distinct-count HLL register table of COL (the max-monoid
    sketch from operators/sketch.py) and reports the running estimate;
    --bloom-key COL maintains a Bloom membership filter of COL (the
    bit-or monoid) and reports fill ratio + implied FP rate; --cms-key
    COL maintains a Count-Min frequency sketch of COL (the count
    monoid) and reports the exact rows-counted total; --sample-key COL
    maintains a slot-minima coordinated uniform sample of COL (min
    monoid on a struct) and reports its rank-minima distinct estimate.
    Each sketch mode pins its calibration in the pointer and refuses a
    mismatch."""
    from .operators.sketch import (
        BLOOM_K,
        BLOOM_N_BITS,
        CMS_DEPTH,
        CMS_WIDTH,
        HLL_P,
        SAMPLE_SLOTS,
        SKETCH_SEED,
    )
    from .plans.incremental import incremental_agg_refresh, read_refreshed
    from .sources.bookmarks import JobBookmark
    from .streaming.sinks import read_pointer

    transform = None
    calibration = None
    sketch_flags = [
        f
        for f in (args.hll_key, args.bloom_key, args.cms_key, args.sample_key)
        if f
    ]
    if len(sketch_flags) > 1:
        raise SystemExit(
            "--hll-key / --bloom-key / --cms-key / --sample-key are "
            "mutually exclusive"
        )
    if args.hll_key:
        if args.keys or args.agg:
            raise SystemExit("--hll-key replaces --keys/--agg; pass only one")
        from .operators.sketch import hll_register_pairs

        keys, aggs = ["register"], {"rho": ("max", "rho")}
        transform = lambda df: hll_register_pairs(df, args.hll_key)  # noqa: E731
        calibration = {
            "sketch": "hll",
            "p": HLL_P,
            "seed": SKETCH_SEED,
            "key_col": args.hll_key,
        }
    elif args.bloom_key:
        if args.keys or args.agg:
            raise SystemExit("--bloom-key replaces --keys/--agg; pass only one")
        from .operators.sketch import bloom_mask_pairs

        keys, aggs = ["word"], {"bits": ("bit_or", "mask")}
        transform = lambda df: bloom_mask_pairs(df, args.bloom_key)  # noqa: E731
        calibration = {
            "sketch": "bloom",
            "n_bits": BLOOM_N_BITS,
            "k": BLOOM_K,
            "seed": SKETCH_SEED,
            "key_col": args.bloom_key,
        }
    elif args.cms_key:
        if args.keys or args.agg:
            raise SystemExit("--cms-key replaces --keys/--agg; pass only one")
        from .operators.sketch import cms_bucket_pairs

        keys, aggs = ["row", "bucket"], {"n": ("count", "*")}
        transform = lambda df: cms_bucket_pairs(df, args.cms_key)  # noqa: E731
        calibration = {
            "sketch": "cms",
            "depth": CMS_DEPTH,
            "width": CMS_WIDTH,
            "seed": SKETCH_SEED,
            "key_col": args.cms_key,
        }
    elif args.sample_key:
        if args.keys or args.agg:
            raise SystemExit(
                "--sample-key replaces --keys/--agg; pass only one"
            )
        from .operators.sketch import sample_minima_pairs

        keys, aggs = ["slot"], {"r": ("min", "r")}
        transform = lambda df: sample_minima_pairs(  # noqa: E731
            df, args.sample_key
        )
        calibration = {
            "sketch": "minima_sample",
            "slots": SAMPLE_SLOTS,
            "seed": SKETCH_SEED,
            "key_col": args.sample_key,
        }
    else:
        if not (args.keys and args.agg):
            raise SystemExit(
                "--keys and --agg are required "
                "(or use --hll-key/--bloom-key/--cms-key)"
            )
        keys = args.keys
        aggs = {}
        for spec in args.agg:
            out, _, kindcol = spec.partition("=")
            kind, _, col = kindcol.partition(":")
            if not (out and kind and col):
                raise SystemExit(f"bad --agg spec {spec!r}; want out=kind:col")
            aggs[out] = (kind, col)

    # calibration pin (same contract as the streaming sketch sinks): the
    # monoid merge would happily combine sketches built with different
    # (n_bits, k, seed) into a state whose probes can FALSE-NEGATIVE —
    # refuse a mismatch before reading anything. Symmetric in BOTH
    # directions: a plain --keys/--agg run onto a sketch target is
    # refused (calibration None != stored), and a sketch run onto a
    # committed target that carries NO calibration is refused too —
    # accepting it would merge into a state of unknown provenance and
    # then stamp the new calibration over it, making the corruption look
    # pinned (r9 review).
    pointer0 = read_pointer(args.target)
    stored_cal = (pointer0 or {}).get("calibration")
    if pointer0 is not None and stored_cal != calibration:
        raise SystemExit(
            f"sketch calibration mismatch for {args.target!r}: standing "
            f"state was built with {stored_cal}, this invocation implies "
            f"{calibration} — sketches across calibrations do not merge; "
            "match the stored parameters or reset the target"
        )
    file_filter = None
    if args.published_of:
        from .plans.incremental import published_filter_for

        try:
            file_filter = published_filter_for(args.published_of)
        except ValueError as e:
            raise SystemExit(f"--published-of: {e}") from e
    spark = get_session(app_name="agg-refresh")
    bm = JobBookmark(args.bookmark, args.job_name)
    n = incremental_agg_refresh(
        spark,
        bm,
        args.pattern,
        keys,
        aggs,
        args.target,
        transform=transform,
        pointer_fields=(
            {"calibration": calibration} if calibration is not None else None
        ),
        keep_versions=args.keep_versions,
        file_filter=file_filter,
    )
    summary = {
        "job": "agg-refresh",
        "new_files": n,
        "state_rows": read_refreshed(spark, args.target).count()
        if read_pointer(args.target) is not None
        else 0,
    }
    if args.hll_key and read_pointer(args.target) is not None:
        from .operators.sketch import hll_estimate

        summary["distinct_estimate"] = round(
            hll_estimate(read_refreshed(spark, args.target)), 1
        )
    if args.bloom_key and read_pointer(args.target) is not None:
        # filter saturation readout: fraction of bits set and the implied
        # false-positive rate (fill^k) at the module constants (the same
        # values the calibration pin above guarantees the state was built
        # with)
        n_bits, k = BLOOM_N_BITS, BLOOM_K
        set_bits = (
            read_refreshed(spark, args.target)
            .agg(F.sum(F.bit_count("bits")))
            .first()[0]
            or 0
        )
        summary["bloom_fill_ratio"] = round(set_bits / n_bits, 4)
        summary["bloom_fp_rate_est"] = round((set_bits / n_bits) ** k, 6)
    if args.sample_key and read_pointer(args.target) is not None:
        # the maintained uniform sample doubles as a distinct estimator
        # (rank-minima order statistics; cross-checks --hll-key) — and
        # state_rows above IS the current sample size
        from .operators.sketch import minima_distinct_estimate

        summary["distinct_estimate_minima"] = round(
            minima_distinct_estimate(read_refreshed(spark, args.target)), 1
        )
    if args.cms_key and read_pointer(args.target) is not None:
        # each counted key contributes once to every sketch row: total
        # mass / depth = rows ever counted (exact, NULL keys excluded)
        total = (
            read_refreshed(spark, args.target).agg(F.sum("n")).first()[0] or 0
        )
        summary["cms_rows_counted"] = int(total // CMS_DEPTH)
    # drift gate: batch-id-keyed IDEMPOTENT update (operators/drift.py).
    # Every run offers the pointer's CURRENT increment; the state records
    # which batch it last histogrammed, so an already-recorded batch is a
    # no-op (never double-counted) and a rerun that still sees the same
    # pointer batch recovers a drift write lost to a crash between the
    # pointer flip and the drift update. The recovery window is exactly
    # that: if NEW files land and merge before the rerun, the pointer
    # advances and the lost batch stays unhistogrammed — the advisory
    # under-count the drift state's contract already accepts (it sits
    # outside the pointer flip by design). (r9 review, superseding the
    # r8 advisory's n>0 gate, which had to pick a failure mode.)
    pointer = read_pointer(args.target)
    if args.drift_col and pointer is not None:
        # O(increment) re-read of exactly the files the pointer's batch
        # merged (its healing list), histogrammed against the maintained
        # standing distribution of --drift-col
        from .operators.drift import update_drift_state

        inc = spark.read.parquet(*pointer["delta_files"])
        drift = update_drift_state(
            inc,
            os.path.join(args.target, "drift_hist.json"),
            args.drift_col,
            key_col=args.drift_key,
            batch_id=pointer["batch_id"],
        )
        if not drift.get("already_recorded"):
            summary["drift"] = drift
    _emit(summary)


def cmd_join_refresh(args: argparse.Namespace) -> None:
    """Incremental fact ⋈ dim materialized-view maintenance with a
    late-arriving-dimension pending buffer (plans/incremental.py::
    incremental_join_refresh) — O(increment) per refresh, append-only
    view, crash-replay exactly-once. One bookmark file hosts both
    sides under '<job>:facts' / '<job>:dims'."""
    from .plans.incremental import incremental_join_refresh
    from .sources.bookmarks import JobBookmark

    spark = get_session(app_name="join-refresh")
    stats = incremental_join_refresh(
        spark,
        JobBookmark(args.bookmark, args.job_name + ":facts"),
        args.fact_pattern,
        JobBookmark(args.bookmark, args.job_name + ":dims"),
        args.dim_pattern,
        args.target,
        args.key,
        dim_compact_at=args.dim_compact_at,
    )
    _emit({"job": "join-refresh", **stats})


def _refresh_drift_report(spark, args) -> dict | None:
    """--drift gate for the corpus refresh commands: a thin wrapper over
    the SHARED protocol in operators/drift.py::corpus_drift_report (one
    implementation for both ingestion tempos — the streaming corpus
    sinks call the same function, so the batch-id-keyed idempotence and
    the empty/missing-delta guards can never diverge between copies;
    the r9 review caught the two hand-rolled twins already differing on
    the missing-delta guard)."""
    if not args.drift:
        return None
    from .operators.drift import corpus_drift_report

    return corpus_drift_report(
        spark,
        args.target,
        args.text_col,
        drift_key=args.drift_key,
        delta_subdir=getattr(args, "drift_delta_subdir", "accepted"),
    )


def cmd_dedup_refresh(args: argparse.Namespace) -> None:
    """Incremental corpus dedup (plans/incremental.py): digest newly-landed
    crawl files, drop duplicates within the increment (min-id wins) and
    against the standing corpus digest set (standing wins), append the
    survivors — the corpus text is never re-read. With --drift, the
    increment's doc-length histogram is PSI-checked against the standing
    distribution (ingest -> dedup -> drift gate, one command)."""
    from .plans.incremental import incremental_dedup_refresh
    from .sources.bookmarks import JobBookmark

    spark = get_session(app_name="dedup-refresh")
    bm = JobBookmark(args.bookmark, args.job_name)
    stats = incremental_dedup_refresh(
        spark,
        bm,
        args.pattern,
        args.target,
        id_col=args.id_col,
        text_col=args.text_col,
    )
    drift = _refresh_drift_report(spark, args)
    if drift is not None:
        stats["drift"] = drift
    _emit({"job": "dedup-refresh", **stats})


def cmd_passage_refresh(args: argparse.Namespace) -> None:
    """Incremental PASSAGE-level dedup (plans/incremental.py): newly-
    landed documents are REWRITTEN against the standing passage-digest
    set — boilerplate paragraphs seen before are excised, the document
    survives. First wins at passage granularity; standing text is never
    re-read (the anti-join touches 16-byte digests only)."""
    from .plans.incremental import incremental_passage_dedup_refresh
    from .sources.bookmarks import JobBookmark

    spark = get_session(app_name="passage-refresh")
    bm = JobBookmark(args.bookmark, args.job_name)
    stats = incremental_passage_dedup_refresh(
        spark,
        bm,
        args.pattern,
        args.target,
        id_col=args.id_col,
        text_col=args.text_col,
        words=args.words,
    )
    # the passage layout publishes its rewritten delta under docs/
    args.drift_delta_subdir = "docs"
    drift = _refresh_drift_report(spark, args)
    if drift is not None:
        stats["drift"] = drift
    _emit({"job": "passage-refresh", **stats})


def cmd_neardup_refresh(args: argparse.Namespace) -> None:
    """Incremental NEAR-dup refresh (plans/incremental.py): banded-LSH
    bucket index + MinHash signature agreement against the standing
    corpus — a lightly-edited re-crawl is dropped without reading any
    corpus text."""
    from .plans.incremental import incremental_neardup_refresh
    from .sources.bookmarks import JobBookmark

    spark = get_session(app_name="neardup-refresh")
    bm = JobBookmark(args.bookmark, args.job_name)
    stats = incremental_neardup_refresh(
        spark,
        bm,
        args.pattern,
        args.target,
        id_col=args.id_col,
        text_col=args.text_col,
        sim_threshold=args.sim_threshold,
    )
    drift = _refresh_drift_report(spark, args)
    if drift is not None:
        stats["drift"] = drift
    _emit({"job": "neardup-refresh", **stats})


def cmd_semantic_refresh(args: argparse.Namespace) -> None:
    """Incremental SEMANTIC dedup refresh (plans/incremental.py): new
    embedding files are assigned against the centroid matrix pinned at
    first refresh, candidate cell pairs are pruned with the angular
    triangle inequality, and near-copies (cos >= threshold) of the
    standing corpus or of smaller-id increment vectors are dropped.

    With ``--recell-on-trigger``, a wave whose allow_share reaches
    RECELL_ALLOW_SHARE_TRIGGER is followed in-band by the
    semantic-recell maintenance op (the stats gain a "recell" object),
    and the stored calibration's nlist is adopted over --nlist — a
    prior auto-recell changed the calibration, and the refresh's
    mismatch guard correctly refuses a stale caller-side value."""
    from .plans.incremental import (
        incremental_semantic_refresh,
        maybe_recell_on_trigger,
        stored_semantic_nlist,
    )
    from .sources.bookmarks import JobBookmark

    spark = get_session(app_name="semantic-refresh")
    bm = JobBookmark(args.bookmark, args.job_name)
    nlist = args.nlist
    if args.recell_on_trigger:
        nlist = stored_semantic_nlist(args.target) or nlist
    stats = incremental_semantic_refresh(
        spark,
        bm,
        args.pattern,
        args.target,
        id_col=args.id_col,
        vec_col=args.vec_col,
        threshold=args.threshold,
        nlist=nlist,
        seed=args.seed,
    )
    if args.recell_on_trigger:
        rec = maybe_recell_on_trigger(
            spark,
            args.target,
            stats.get("allow_share"),
            id_col=args.id_col,
            vec_col=args.vec_col,
        )
        if rec is not None:
            stats["recell"] = rec
    _emit({"job": "semantic-refresh", **stats})


def cmd_semantic_recell(args: argparse.Namespace) -> None:
    """Maintenance re-fit of a semantic-dedup target's pinned centroid
    state (plans/incremental.py::semantic_recell): refit nlist ~ sqrt(n)
    centroids on the standing corpus, re-assign every accepted row, and
    flip to the new calibration atomically. Run on a cadence when
    measured allow_share degrades; later semantic-refresh calls must
    pass the NEW nlist this prints."""
    from .plans.incremental import semantic_recell

    spark = get_session(app_name="semantic-recell")
    stats = semantic_recell(
        spark,
        args.target,
        id_col=args.id_col,
        vec_col=args.vec_col,
        nlist=args.nlist,
    )
    _emit({"job": "semantic-recell", **stats})


def cmd_passage_decontam(args: argparse.Namespace) -> None:
    """One-shot passage-level benchmark decontamination (queries/
    textops.py::decontaminate_passages): rewrite every input document
    with benchmark-leaked passages excised — span-granularity where
    doc-level decontamination would drop the whole document. Batch-job
    style like zorder/compact: reads two parquet inputs, writes the
    rewritten corpus."""
    import pyspark.sql.functions as F

    from .queries.textops import decontaminate_passages

    spark = get_session(app_name="passage-decontam")
    docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.benchmark)
    out = decontaminate_passages(
        docs,
        bench,
        words=args.words,
        id_col=args.id_col,
        text_col=args.text_col,
        bench_text_col=args.bench_text_col,
    )
    out.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    stats = written.agg(
        F.count(F.lit(1)).alias("docs"),
        F.coalesce(F.sum("n_passages"), F.lit(0)).alias("passages"),
        F.coalesce(F.sum("n_passages_dropped"), F.lit(0)).alias("excised"),
    ).first()
    _emit(
        {
            "job": "passage-decontam",
            "input": args.input,
            "benchmark": args.benchmark,
            "output": args.output,
            "docs": int(stats["docs"]),
            "passages": int(stats["passages"]),
            "excised": int(stats["excised"]),
        }
    )


def cmd_epoch_mixture(args: argparse.Namespace) -> None:
    """Epoch-aware mixture job (queries/textops.py::epoch_mixture_plan +
    materialize_epoch_mixture): plan whole-epoch upsampling + residual
    sampling from per-source weights and a global token budget, write
    the materialized corpus (one row per doc per epoch), and emit the
    per-source plan as the job summary."""
    import json as _json

    from .queries.textops import epoch_mixture_plan, materialize_epoch_mixture

    spark = get_session(app_name="epoch-mixture")
    weights = _json.loads(args.weights)
    if not isinstance(weights, dict):
        raise SystemExit("--weights must be a JSON object of source -> weight")
    docs = spark.read.parquet(args.input)
    plan = epoch_mixture_plan(
        docs,
        {str(k): float(v) for k, v in weights.items()},
        total_tokens=args.total_tokens,
        id_col=args.id_col,
        text_col=args.text_col,
        source_col=args.source_col,
    )
    materialize_epoch_mixture(
        docs, plan, id_col=args.id_col, source_col=args.source_col
    ).write.mode("overwrite").parquet(args.output)
    rows = [r.asDict() for r in plan.collect()]
    _emit(
        {
            "job": "epoch-mixture",
            "output": args.output,
            "output_rows": spark.read.parquet(args.output).count(),
            "plan": sorted(rows, key=lambda r: r[args.source_col]),
        }
    )


def cmd_component_split(args: argparse.Namespace) -> None:
    """Leakage-controlled split job (queries/textops.py::
    component_aware_split): assign train/val/test on the near-dup
    COMPONENT canonical so near-duplicates never straddle splits; write
    (id, component, split) and summarize the split sizes."""
    from .queries.textops import component_aware_split

    spark = get_session(app_name="component-split")
    docs = spark.read.parquet(args.input)
    out = component_aware_split(
        docs, id_col=args.id_col, text_col=args.text_col
    )
    out.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    import pyspark.sql.functions as F

    sizes = {
        r["split"]: r["n"]
        for r in written.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    _emit(
        {
            "job": "component-split",
            "output": args.output,
            "docs": written.count(),
            "splits": sizes,
        }
    )


def cmd_token_budget_select(args: argparse.Namespace) -> None:
    """Token-budget corpus selection job (queries/textops.py::
    token_budget_selection): score every document by lexical diversity
    (or take a precomputed score column), keep the quality-ranked prefix
    whose cumulative token mass fits the budget, write the selected ids
    with rank + running mass."""
    import pyspark.sql.functions as F

    from .queries.textops import _tokens, token_budget_selection

    spark = get_session(app_name="token-budget-select")
    docs = spark.read.parquet(args.input)
    if args.score_col:
        scored = docs.select(
            args.id_col,
            F.col(args.score_col).alias("score"),
            F.col(args.n_tokens_col).cast("bigint").alias("n_tokens"),
        )
    else:
        # the CANONICAL tokenizer (one source of truth with the operators
        # this score feeds), and NULL text filtered BEFORE scoring: under
        # legacy sizeOfNull, size(split(NULL)) = -1, which would score a
        # NULL doc (-1.0)/(-1) = 1.0 with token mass -1 — top-ranked with
        # selection-corrupting negative mass (r13 review finding)
        toks = _tokens(F.col(args.text_col))
        scored = docs.filter(F.col(args.text_col).isNotNull()).select(
            args.id_col,
            (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
                "score"
            ),
            F.size(toks).cast("bigint").alias("n_tokens"),
        )
    out = token_budget_selection(
        scored, args.budget_tokens, "score", id_col=args.id_col,
        n_buckets=args.n_buckets,
    )
    out.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    stats = written.agg(
        F.count(F.lit(1)).alias("selected_docs"),
        F.max("cum_tokens").alias("selected_tokens"),
    ).first()
    _emit(
        {
            "job": "token-budget-select",
            "output": args.output,
            "budget_tokens": args.budget_tokens,
            "selected_docs": stats["selected_docs"],
            "selected_tokens": stats["selected_tokens"] or 0,
        }
    )


def _parse_budgets(arg: str) -> dict:
    """Shared 'source=tokens,source=tokens' parser for the budgeted
    selection jobs (r14 review: it was copy-pasted in two commands)."""
    budgets = {}
    for part in arg.split(","):
        if "=" not in part:
            raise SystemExit(f"--budgets entry {part!r} is not source=tokens")
        k, v = part.rsplit("=", 1)
        try:
            budgets[k] = int(v)
        except ValueError:
            # consistent flag-error surface (r14 ADVICE): 'web=10k' used
            # to escape as a raw int() traceback while a missing '=' got
            # a clean SystemExit
            raise SystemExit(
                f"--budgets entry {part!r}: token count {v!r} is not an integer"
            ) from None
    return budgets


def cmd_stratified_budget_select(args: argparse.Namespace) -> None:
    """Per-source constrained budget selection job (queries/textops.py::
    stratified_budget_selection): every source's quality-ranked prefix is
    cut at ITS OWN token budget — the selection stage a mixture plan
    feeds. --budgets names every corpus source explicitly
    (src=tokens,src=tokens)."""
    import pyspark.sql.functions as F

    from .queries.textops import _tokens, lexical_diversity, stratified_budget_selection

    spark = get_session(app_name="stratified-budget-select")
    docs = spark.read.parquet(args.input)
    budgets = _parse_budgets(args.budgets)
    if args.score_col:
        scored = docs.select(
            args.id_col,
            args.source_col,
            F.col(args.score_col).alias("score"),
            F.col(args.n_tokens_col).cast("bigint").alias("n_tokens"),
        )
    else:
        toks = _tokens(F.col(args.text_col))
        scored = docs.filter(F.col(args.text_col).isNotNull()).select(
            args.id_col,
            args.source_col,
            lexical_diversity(F.col(args.text_col)).alias("score"),
            F.size(toks).cast("bigint").alias("n_tokens"),
        )
    out = stratified_budget_selection(
        scored, budgets, "score", source_col=args.source_col,
        id_col=args.id_col, n_buckets=args.n_buckets,
        source_batch=args.source_batch,
    )
    out.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    per_src = {
        r[args.source_col]: (int(r["docs"]), int(r["tokens"]))
        for r in written.groupBy(args.source_col)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.max("cum_tokens").alias("tokens"),
        )
        .collect()
    }
    _emit(
        {
            "job": "stratified-budget-select",
            "output": args.output,
            "budgets": budgets,
            "selected": {
                s: {"docs": d, "tokens": t} for s, (d, t) in sorted(per_src.items())
            },
        }
    )


def cmd_dedup_threshold_sweep(args: argparse.Namespace) -> None:
    """Threshold-tuning audit (queries/textops.py::dedup_threshold_sweep):
    one LSH pass at the floor threshold, exact-Jaccard readouts per
    candidate threshold — pairs fired, docs touched, exact docs a min-id
    dedup at that cut would remove."""
    from .queries.textops import dedup_threshold_sweep

    try:
        ts = [float(t) for t in args.thresholds.split(",")]
    except ValueError:
        raise SystemExit(
            f"--thresholds {args.thresholds!r} is not a comma-separated "
            "list of floats"
        ) from None
    spark = get_session(app_name="dedup-threshold-sweep")
    docs = spark.read.parquet(args.input)
    rows = dedup_threshold_sweep(
        docs, ts, id_col=args.id_col, text_col=args.text_col,
        n_hashes=args.n_hashes, bands=args.bands,
        shingle_n=args.shingle_n, seed=args.seed,
    ).collect()
    _emit(
        {
            "job": "dedup-threshold-sweep",
            "input": args.input,
            "sweep": [
                {
                    "threshold": r["threshold"],
                    "n_pairs": r["n_pairs"],
                    "n_docs_in_pairs": r["n_docs_in_pairs"],
                    "n_components": r["n_components"],
                    "docs_removed": r["docs_removed"],
                }
                for r in sorted(rows, key=lambda r: r["threshold"])
            ],
        }
    )


def cmd_simhash_threshold_sweep(args: argparse.Namespace) -> None:
    """SimHash hamming tuning audit (queries/textops.py::
    simhash_threshold_sweep): one block-join pass at the ceiling k,
    exact-hamming readouts per candidate k — pairs fired, docs touched,
    exact docs min-id dedup at hamming <= k would remove."""
    from .queries.textops import simhash_threshold_sweep

    try:
        ks = [int(k) for k in args.hammings.split(",")]
    except ValueError:
        raise SystemExit(
            f"--hammings {args.hammings!r} is not a comma-separated "
            "list of ints"
        ) from None
    spark = get_session(app_name="simhash-threshold-sweep")
    docs = spark.read.parquet(args.input)
    rows = simhash_threshold_sweep(
        docs, ks, id_col=args.id_col, text_col=args.text_col,
        n_bits=args.n_bits,
    ).collect()
    _emit(
        {
            "job": "simhash-threshold-sweep",
            "input": args.input,
            "sweep": [
                {
                    "max_hamming": r["max_hamming"],
                    "n_pairs": r["n_pairs"],
                    "n_docs_in_pairs": r["n_docs_in_pairs"],
                    "n_components": r["n_components"],
                    "docs_removed": r["docs_removed"],
                }
                for r in sorted(rows, key=lambda r: r["max_hamming"])
            ],
        }
    )


def cmd_semantic_threshold_sweep(args: argparse.Namespace) -> None:
    """Semantic eps-tuning audit (queries/vectors.py::
    semantic_threshold_sweep): one clustered exact-pair pass at the
    floor eps, exact-cosine readouts per candidate eps — pairs fired,
    vectors touched, exact docs SemDeDup min-id dedup would remove."""
    from .queries.vectors import semantic_threshold_sweep

    try:
        eps = [float(t) for t in args.eps.split(",")]
    except ValueError:
        raise SystemExit(
            f"--eps {args.eps!r} is not a comma-separated list of floats"
        ) from None
    spark = get_session(app_name="semantic-threshold-sweep")
    vecs = spark.read.parquet(args.input)
    rows = semantic_threshold_sweep(
        vecs, eps, vec_col=args.vec_col, id_col=args.id_col,
        nlist=args.nlist, seed=args.seed,
    ).collect()
    _emit(
        {
            "job": "semantic-threshold-sweep",
            "input": args.input,
            "sweep": [
                {
                    "threshold": r["threshold"],
                    "n_pairs": r["n_pairs"],
                    "n_docs_in_pairs": r["n_docs_in_pairs"],
                    "n_components": r["n_components"],
                    "docs_removed": r["docs_removed"],
                }
                for r in sorted(rows, key=lambda r: r["threshold"])
            ],
        }
    )


def cmd_curriculum_select(args: argparse.Namespace) -> None:
    """Phase-ordered exclusive curriculum selection job
    (queries/textops.py::curriculum_phase_selection): each --phase takes
    its per-source quality cut from what earlier phases left behind;
    flag order is priority order (first phase skims the best docs)."""
    import pyspark.sql.functions as F

    from .queries.textops import (
        _tokens,
        curriculum_phase_selection,
        lexical_diversity,
    )

    phases = []
    seen = set()
    for spec in args.phase:
        if ":" not in spec:
            raise SystemExit(
                f"--phase {spec!r} is not name:src=tokens,src=tokens"
            )
        name, budget_str = spec.split(":", 1)
        if not name:
            raise SystemExit(f"--phase {spec!r} has an empty phase name")
        if name in seen:
            raise SystemExit(f"--phase names repeat: {name!r}")
        seen.add(name)
        phases.append((name, _parse_budgets(budget_str)))

    spark = get_session(app_name="curriculum-select")
    docs = spark.read.parquet(args.input)
    if args.score_col:
        scored = docs.select(
            args.id_col,
            args.source_col,
            F.col(args.score_col).alias("score"),
            F.col(args.n_tokens_col).cast("bigint").alias("n_tokens"),
        )
    else:
        toks = _tokens(F.col(args.text_col))
        scored = docs.filter(F.col(args.text_col).isNotNull()).select(
            args.id_col,
            args.source_col,
            lexical_diversity(F.col(args.text_col)).alias("score"),
            F.size(toks).cast("bigint").alias("n_tokens"),
        )
    out = curriculum_phase_selection(
        scored, phases, "score", source_col=args.source_col,
        id_col=args.id_col, n_buckets=args.n_buckets,
    )
    out.write.mode("overwrite").partitionBy("phase").parquet(args.output)
    written = spark.read.parquet(args.output)
    per = {
        (r["phase"], r[args.source_col]): (int(r["docs"]), int(r["tokens"]))
        for r in written.groupBy("phase", args.source_col)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.max("cum_tokens").alias("tokens"),
        )
        .collect()
    }
    _emit(
        {
            "job": "curriculum-select",
            "output": args.output,
            "phases": [
                {
                    "name": name,
                    "budgets": budgets,
                    "selected": {
                        s: {"docs": d, "tokens": t}
                        for (p, s), (d, t) in sorted(per.items())
                        if p == name
                    },
                }
                for name, budgets in phases
            ],
        }
    )


def cmd_budget_admission(args: argparse.Namespace) -> None:
    """Streaming budget admission job (streaming/selection.py): drain
    newly-landed documents (availableNow, checkpoint-tracked) into the
    standing admitted table — each drain takes the batch stratified cut
    against the per-source budgets REMAINING after earlier drains, and
    the spent counters commit atomically with the admitted rows. Emits
    the budget-utilization report from the pointer."""
    from .streaming.selection import admission_report, run_stream_budget_admission

    spark = get_session(app_name="budget-admission")
    budgets = _parse_budgets(args.budgets)
    # readStream needs an explicit schema: take it from the landed files.
    # An empty-but-EXISTING landing dir is a legitimate first-drain/cron
    # state (r14 ADVICE): exit cleanly instead of letting Spark's opaque
    # 'unable to infer schema' surface. A NONEXISTENT path is
    # indistinguishable from a typo and stays a loud, distinct error
    # (r15 review finding: the benign message told an operator with a
    # mistyped --input to wait for a landing that would never come).
    if not os.path.isdir(args.input):
        raise SystemExit(
            f"landing dir {args.input!r} does not exist — check --input "
            "(an empty dir is fine for a first drain; a missing one is "
            "usually a typo)"
        )
    try:
        schema = spark.read.parquet(args.input).schema
    except Exception as exc:
        if "infer schema" in str(exc).lower():
            raise SystemExit(
                f"no parquet files under {args.input!r} yet — nothing to "
                "drain (run again after the first landing, or seed the dir "
                "with a schema-bearing sample file)"
            ) from None
        raise
    stream = spark.readStream.schema(schema).parquet(args.input)
    run_stream_budget_admission(
        stream,
        args.target,
        budgets,
        args.score_col,
        source_col=args.source_col,
        id_col=args.id_col,
        n_tokens_col=args.n_tokens_col,
        n_buckets=args.n_buckets,
        checkpoint_dir=args.checkpoint,
    )
    _emit(
        {
            "job": "budget-admission",
            "target": args.target,
            "report": admission_report(args.target),
        }
    )


def cmd_curriculum_admission(args: argparse.Namespace) -> None:
    """Streaming phase-ordered admission job (streaming/selection.py::
    CurriculumAdmissionSink): drain newly-landed documents into the
    standing phase-admitted table — each drain runs the batch curriculum
    cut against the per-(phase, source) budgets remaining after earlier
    drains. Emits the per-phase utilization report from the pointer."""
    from .streaming.selection import (
        curriculum_admission_report,
        run_stream_curriculum_admission,
    )

    spark = get_session(app_name="curriculum-admission")
    phases = []
    seen = set()
    for spec in args.phase:
        if ":" not in spec:
            raise SystemExit(
                f"--phase {spec!r} is not name:src=tokens,src=tokens"
            )
        name, budget_str = spec.split(":", 1)
        if not name:
            raise SystemExit(f"--phase {spec!r} has an empty phase name")
        if name in seen:
            raise SystemExit(f"--phase names repeat: {name!r}")
        seen.add(name)
        phases.append((name, _parse_budgets(budget_str)))
    # same landing-dir ergonomics as budget-admission (r14 ADVICE / r15
    # review): empty-but-existing dir = clean first-drain exit, missing
    # dir = loud distinct error
    if not os.path.isdir(args.input):
        raise SystemExit(
            f"landing dir {args.input!r} does not exist — check --input "
            "(an empty dir is fine for a first drain; a missing one is "
            "usually a typo)"
        )
    try:
        schema = spark.read.parquet(args.input).schema
    except Exception as exc:
        if "infer schema" in str(exc).lower():
            raise SystemExit(
                f"no parquet files under {args.input!r} yet — nothing to "
                "drain (run again after the first landing, or seed the dir "
                "with a schema-bearing sample file)"
            ) from None
        raise
    stream = spark.readStream.schema(schema).parquet(args.input)
    run_stream_curriculum_admission(
        stream,
        args.target,
        phases,
        args.score_col,
        source_col=args.source_col,
        id_col=args.id_col,
        n_tokens_col=args.n_tokens_col,
        n_buckets=args.n_buckets,
        checkpoint_dir=args.checkpoint,
    )
    _emit(
        {
            "job": "curriculum-admission",
            "target": args.target,
            "report": curriculum_admission_report(args.target),
        }
    )


def cmd_admission_recalibrate(args: argparse.Namespace) -> None:
    """Migrate a standing admission table to new per-source budgets
    (streaming/selection.py::recalibrate_admission): quality re-cut of
    the admitted table under the new budgets, atomic snapshot + spent
    flip; the next drain composes against the new remaining budgets."""
    from .streaming.selection import admission_report, recalibrate_admission

    spark = get_session(app_name="admission-recalibrate")
    budgets = _parse_budgets(args.budgets)
    out = recalibrate_admission(spark, args.target, budgets)
    _emit(
        {
            "job": "admission-recalibrate",
            "target": args.target,
            **out,
            "report": admission_report(args.target),
        }
    )


def cmd_curriculum_recalibrate(args: argparse.Namespace) -> None:
    """Migrate a standing phase-admitted table to a new ordered phase
    list (streaming/selection.py::recalibrate_curriculum_admission):
    phase membership recomputed from scratch under the new priority
    order (docs may move between phases), atomic snapshot + per-(phase,
    source) spent flip; the next drain composes under the new phases."""
    from .streaming.selection import (
        curriculum_admission_report,
        recalibrate_curriculum_admission,
    )

    spark = get_session(app_name="curriculum-recalibrate")
    phases = []
    seen = set()
    for spec in args.phase:
        if ":" not in spec:
            raise SystemExit(
                f"--phase {spec!r} is not name:src=tokens,src=tokens"
            )
        name, budget_str = spec.split(":", 1)
        if not name:
            raise SystemExit(f"--phase {spec!r} has an empty phase name")
        if name in seen:
            raise SystemExit(f"--phase names repeat: {name!r}")
        seen.add(name)
        phases.append((name, _parse_budgets(budget_str)))
    out = recalibrate_curriculum_admission(spark, args.target, phases)
    _emit(
        {
            "job": "curriculum-recalibrate",
            "target": args.target,
            **out,
            "report": curriculum_admission_report(args.target),
        }
    )


def cmd_admission_regret(args: argparse.Namespace) -> None:
    """Wave-greedy regret readout (streaming/selection.py::
    admission_regret): the standing admitted table vs the batch
    operator's hindsight selection over everything seen so far — docs
    swapped and score mass lost, per source. Pure readout; no sink
    state is touched."""
    from .streaming.selection import admission_regret

    spark = get_session(app_name="admission-regret")
    corpus = spark.read.parquet(args.corpus)
    out = admission_regret(spark, args.target, corpus)
    src_col = out.columns[0]
    by_source = {}
    for r in out.collect():
        d = r.asDict()
        by_source[d.pop(src_col)] = d
    _emit(
        {
            "job": "admission-regret",
            "target": args.target,
            "by_source": by_source,
        }
    )


def cmd_curriculum_regret(args: argparse.Namespace) -> None:
    """Phase-ordered regret readout (streaming/selection.py::
    curriculum_admission_regret): the standing phase-admitted table vs
    the batch curriculum's hindsight assignment over everything seen so
    far — docs swapped and score mass, per (phase, source). Pure
    readout; no sink state is touched."""
    from .streaming.selection import curriculum_admission_regret

    spark = get_session(app_name="curriculum-regret")
    corpus = spark.read.parquet(args.corpus)
    out = curriculum_admission_regret(spark, args.target, corpus)
    src_col = out.columns[1]
    by_phase: dict = {}
    for r in out.collect():
        d = r.asDict()
        by_phase.setdefault(d.pop("phase"), {})[d.pop(src_col)] = d
    _emit(
        {
            "job": "curriculum-regret",
            "target": args.target,
            "by_phase": by_phase,
        }
    )


def cmd_split_leakage_audit(args: argparse.Namespace) -> None:
    """Split leakage audit job (queries/textops.py::split_leakage_audit):
    MinHash near-dup pairs joined against a completed (id, split)
    assignment; reports pair counts per unordered split pair and the
    leaked share."""
    from .queries.textops import split_leakage_audit

    spark = get_session(app_name="split-leakage-audit")
    docs = spark.read.parquet(args.input)
    assignment = spark.read.parquet(args.assignment)
    rows = [
        r.asDict()
        for r in split_leakage_audit(
            docs, assignment, id_col=args.id_col, text_col=args.text_col,
            split_col=args.split_col, threshold=args.threshold,
        ).collect()
    ]
    total = sum(r["n_pairs"] for r in rows)
    leaked = sum(r["n_pairs"] for r in rows if r["leaked"])
    _emit(
        {
            "job": "split-leakage-audit",
            "pairs_total": total,
            "pairs_leaked": leaked,
            "leak_share": (leaked / total) if total else 0.0,
            "by_split_pair": rows,
        }
    )


def cmd_dsir_select(args: argparse.Namespace) -> None:
    """DSIR selection job (queries/textops.py::dsir_select): fit hashed
    unigram+bigram bucket models on a TARGET corpus and the raw corpus
    (optionally a sample of it), weight every raw doc by the micro-nat
    importance log ratio, keep the Gumbel-top-k — sampling without
    replacement proportional to the importance weights (Xie et al. 2023).
    Writes the selected (id, n_grams, logw_micro, key_micro) rows —
    or, with --budget-tokens instead of --k, spends a token budget
    along the same ranking (dsir_select_budget: the key projection
    composed with token_budget_selection's distributed prefix sum)."""
    import pyspark.sql.functions as F

    from .queries.textops import dsir_select, dsir_select_budget

    if (args.k is None) == (args.budget_tokens is None):
        raise SystemExit("dsir-select: pass exactly one of --k / --budget-tokens")
    spark = get_session(app_name="dsir-select")
    corpus = spark.read.parquet(args.input)
    if args.target is None and args.log_ratio is None:
        raise SystemExit("dsir-select: pass --target or a fitted --log-ratio")
    target = spark.read.parquet(args.target) if args.target is not None else None
    corpus_model = (
        corpus.sample(fraction=args.model_sample, seed=args.seed)
        if args.model_sample is not None
        else None
    )
    common = dict(
        seed=args.seed,
        sample=not args.no_sample,
        id_col=args.id_col,
        text_col=args.text_col,
        n_buckets=args.n_buckets,
        alpha=args.alpha,
        corpus_model=corpus_model,
        log_ratio=(
            _load_log_ratio(spark, args.log_ratio, args.n_buckets)
            if args.log_ratio is not None
            else None
        ),
    )
    if args.k is not None:
        out = dsir_select(corpus, target, args.k, **common)
    else:
        out = dsir_select_budget(corpus, target, args.budget_tokens, **common)
    out.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    stats = written.agg(
        F.count(F.lit(1)).alias("selected_docs"),
        F.min("key_micro").alias("cut_key_micro"),
        *(
            [F.max("cum_tokens").alias("selected_tokens")]
            if args.budget_tokens is not None
            else [F.sum("n_grams").alias("selected_grams")]
        ),
    ).first()
    report = {
        "job": "dsir-select",
        "output": args.output,
        "sampled": not args.no_sample,
        "selected_docs": stats["selected_docs"],
        "cut_key_micro": stats["cut_key_micro"],
    }
    if args.budget_tokens is not None:
        report["budget_tokens"] = args.budget_tokens
        report["selected_tokens"] = stats["selected_tokens"] or 0
    else:
        report["k"] = args.k
        report["selected_grams"] = stats["selected_grams"] or 0
    _emit(report)


def cmd_dsir_fit(args: argparse.Namespace) -> None:
    """Fit-once job for the DSIR model (queries/textops.py::
    dsir_log_ratio_table): fit the target and corpus bucket models,
    write the per-bucket micro-nat log-ratio table as a tiny (b, lam)
    parquet. At 100 TB this is the expensive pass you run ONCE (on a
    corpus sample via --model-sample); every later dsir-select
    --log-ratio run is then a single shuffle-free scan + top-k.

    ``--target`` repeats for a weighted MULTI-target mixture (r14,
    queries/textops.py::dsir_multi_target_log_ratio_table): the written
    table is the weights-geometric mixture of the per-target models —
    a pure model-side composition, so every downstream selector
    consumes it unchanged via --log-ratio."""
    from .queries.textops import (
        dsir_log_ratio_table,
        dsir_multi_target_log_ratio_table,
    )

    if (args.input is None) == (args.corpus_stream is None):
        raise SystemExit(
            "pass exactly one of --input (batch corpus) or "
            "--corpus-stream (standing histogram dir)"
        )
    if args.corpus_stream is not None and args.model_sample is not None:
        raise SystemExit(
            "--model-sample applies to a batch --input fit; the streamed "
            "histogram is already the (exact) corpus model"
        )
    if args.input is not None and args.stream_sources is not None:
        raise SystemExit(
            "--stream-sources applies to a --corpus-stream fit; a batch "
            "--input fit reads the corpus directly (filter it upstream)"
        )
    spark = get_session(app_name="dsir-fit")
    if args.corpus_stream is not None:
        # streaming-fed fit (r15): the standing drift-monitor grid IS the
        # corpus model — one bounded aggregate, no corpus re-read.
        # Single-target only: the multi-target mixture needs one shared
        # corpus model across several per-target tables, a composition
        # this command keeps on the batch path until someone needs it
        # streamed (refused loudly below, with the workaround named).
        from .streaming.sketch import dsir_fit_from_stream, read_pointer

        targets = args.target
        if len(targets) != 1:
            raise SystemExit(
                "--corpus-stream currently fits a SINGLE --target "
                "(multi-target mixtures: run dsir-fit per target, then "
                "combine, or use a batch --input fit)"
            )
        pointer = read_pointer(args.corpus_stream)
        if pointer is None:
            raise SystemExit(
                f"no committed histogram at {args.corpus_stream!r}"
            )
        stream_buckets = pointer["calibration"]["n_buckets"]
        if args.n_buckets != stream_buckets:
            raise SystemExit(
                f"--n-buckets {args.n_buckets} != the sink's pinned "
                f"calibration ({stream_buckets}) — the streamed histogram "
                "fixes the bucketing; pass the matching value"
            )
        srcs = (
            args.stream_sources.split(",")
            if args.stream_sources is not None
            else None
        )
        # --text-col names the TARGET's text column here (the streamed
        # side is already bucketed; r15 review finding: the flag was
        # silently ignored in stream mode)
        lam = dsir_fit_from_stream(
            spark,
            args.corpus_stream,
            spark.read.parquet(targets[0]),
            alpha=args.alpha,
            sources=srcs,
            target_text_col=args.text_col,
        )
        spark.createDataFrame(
            [(b, v) for b, v in enumerate(lam)], "b int, lam bigint"
        ).coalesce(1).write.mode("overwrite").parquet(args.output)
        _emit(
            {
                "job": "dsir-fit",
                "output": args.output,
                "n_buckets": args.n_buckets,
                "n_targets": 1,
                "corpus_stream": args.corpus_stream,
                "lam_min": min(lam),
                "lam_max": max(lam),
            }
        )
        return
    corpus = spark.read.parquet(args.input)
    corpus_model = (
        corpus.sample(fraction=args.model_sample, seed=args.seed)
        if args.model_sample is not None
        else corpus
    )
    targets = args.target
    if len(targets) == 1 and args.weights is None:
        lam = dsir_log_ratio_table(
            corpus_model,
            spark.read.parquet(targets[0]),
            text_col=args.text_col,
            n_buckets=args.n_buckets,
            alpha=args.alpha,
        )
    else:
        ws = (
            [float(x) for x in args.weights.split(",")]
            if args.weights
            else [1.0] * len(targets)
        )
        if len(ws) != len(targets):
            raise SystemExit(
                f"--weights names {len(ws)} values for {len(targets)} "
                "--target paths"
            )
        # zero-pad names so the weight-normalization tiebreak order is
        # the command-line order
        width = len(str(len(targets)))
        tdict = {
            f"t{i:0{width}d}": spark.read.parquet(p)
            for i, p in enumerate(targets)
        }
        wdict = {f"t{i:0{width}d}": ws[i] for i in range(len(targets))}
        lam = dsir_multi_target_log_ratio_table(
            corpus,
            tdict,
            wdict,
            text_col=args.text_col,
            n_buckets=args.n_buckets,
            alpha=args.alpha,
            corpus_model=corpus_model,
        )
    spark.createDataFrame(
        [(b, v) for b, v in enumerate(lam)], "b int, lam bigint"
    ).coalesce(1).write.mode("overwrite").parquet(args.output)
    _emit(
        {
            "job": "dsir-fit",
            "output": args.output,
            "n_buckets": args.n_buckets,
            "n_targets": len(targets),
            "lam_min": min(lam),
            "lam_max": max(lam),
        }
    )


def _load_log_ratio(spark, path: str, n_buckets: int) -> list:
    """(b, lam) parquet -> dense list; validates coverage of every bucket."""
    rows = {int(r["b"]): int(r["lam"]) for r in spark.read.parquet(path).collect()}
    if set(rows) != set(range(n_buckets)):
        raise SystemExit(
            f"log-ratio table at {path!r} covers {len(rows)} buckets; "
            f"expected exactly 0..{n_buckets - 1} (check --n-buckets "
            "matches the dsir-fit run)"
        )
    return [rows[b] for b in range(n_buckets)]


def cmd_source_divergence(args: argparse.Namespace) -> None:
    """Source drift audit job (queries/textops.py::source_divergence_audit):
    per-source Jensen-Shannon divergence (micro-nats) between the source's
    hashed n-gram distribution and a target corpus — the report that says
    WHICH sources drifted before anyone reweights a mixture."""
    from .queries.textops import source_divergence_audit

    spark = get_session(app_name="source-divergence")
    corpus = spark.read.parquet(args.input)
    target = spark.read.parquet(args.target)
    rows = sorted(
        (
            r.asDict()
            for r in source_divergence_audit(
                corpus,
                target,
                source_col=args.source_col,
                text_col=args.text_col,
                n_buckets=args.n_buckets,
                alpha=args.alpha,
            ).collect()
        ),
        key=lambda r: -r["jsd_micro"],
    )
    _emit(
        {
            "job": "source-divergence",
            "n_sources": len(rows),
            "by_source": rows,
        }
    )


def cmd_semantic_allow_report(args: argparse.Namespace) -> None:
    """On-demand re-cell trigger check (plans/incremental.py::
    semantic_allow_report): standing-vs-standing allowlist share under
    the stored calibration, no wave required. Schedule semantic-recell
    when recell_recommended is true."""
    from .plans.incremental import semantic_allow_report

    spark = get_session(app_name="semantic-allow-report")
    rep = semantic_allow_report(spark, args.target, vec_col=args.vec_col)
    _emit({"job": "semantic-allow-report", **rep})


def cmd_bpe_learn(args: argparse.Namespace) -> None:
    """Learn a BPE subword vocabulary from a document table
    (operators/bpe.py): one corpus pass builds the word-frequency
    table, then merge iterations run on that Zipf-small table only.
    Writes the ordered merge list as JSON to --output."""
    import json

    from .operators.bpe import learn_bpe, word_counts

    spark = get_session(app_name="bpe-learn")
    docs = spark.read.parquet(args.input)
    wc = word_counts(docs, text_col=args.text_col)
    merges, vocab = learn_bpe(
        wc, n_merges=args.n_merges, min_pair_freq=args.min_pair_freq
    )
    with open(args.output, "w") as f:
        json.dump({"merges": [list(m) for m in merges]}, f)
    _emit(
        {
            "job": "bpe-learn",
            "n_merges": len(merges),
            "vocab_size": vocab.count(),
            "output": args.output,
        }
    )


def cmd_lm_score(args: argparse.Namespace) -> None:
    """Score every document under a Stupid-Backoff trigram LM
    (operators/lm.py) whose count tables come from --reference (another
    document table) or, absent that, from the scored corpus itself —
    the model-based quality filter of the curation pipeline. Writes
    (id, n_tokens, lm_score_sum, lm_score_avg) parquet."""
    from .operators.lm import stupid_backoff_doc_scores, tokenize_positions

    spark = get_session(app_name="lm-score")
    ws = r"[ \t\n\f\r]+"  # the portable whitespace class (queries/textops.py)

    def toks_of(df):
        return tokenize_positions(
            df, args.id_col, F.split(F.trim(F.lower(F.col(args.text_col))), ws)
        )

    docs = spark.read.parquet(args.input)
    toks = toks_of(docs)
    ref_toks = toks_of(spark.read.parquet(args.reference)) if args.reference else toks
    scores = stupid_backoff_doc_scores(toks, ref_toks, id_col=args.id_col).cache()
    try:
        scores.write.mode("overwrite").parquet(args.output)
        agg = scores.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("lm_score_avg").alias("mean_score"),
            F.min("lm_score_avg").alias("min_score"),
            F.max("lm_score_avg").alias("max_score"),
        ).first()
        _emit(
            {
                "job": "lm-score",
                "output": args.output,
                "n_docs": agg["n_docs"],
                "mean_score": round(agg["mean_score"], 1) if agg["n_docs"] else None,
                "min_score": agg["min_score"],
                "max_score": agg["max_score"],
            }
        )
    finally:
        scores.unpersist()


def cmd_compact(args: argparse.Namespace) -> None:
    """Small-file compaction of a (possibly hive-partitioned) parquet lake
    (operators/compaction.py): rewrite each oversized partition into
    ceil(bytes / target) files; metadata-only plan with --dry-run."""
    from .operators.compaction import compact_parquet_lake, plan_compaction

    spark = get_session(app_name="compact")
    target = args.target_mb * 1024 * 1024
    if args.dry_run:
        plans = [p for p in plan_compaction(spark, args.path, target)]
        executed = [p for p in plans if p.needs_compaction]
    else:
        executed = compact_parquet_lake(spark, args.path, target)
    _emit(
        {
            "job": "compact",
            "path": args.path,
            "dry_run": args.dry_run,
            "partitions_compacted": len(executed),
            "files_before": sum(p.n_files for p in executed),
            "files_after": sum(p.target_files for p in executed),
            "bytes": sum(p.total_bytes for p in executed),
        }
    )


def cmd_query(args: argparse.Namespace) -> None:
    from .queries import ORACLES, QUERIES

    if args.list:
        for name in sorted(QUERIES):
            print(f"{name}\t{'oracle' if name in ORACLES else 'rows-only'}")
        return
    spark = get_session(app_name=f"query-{args.name}")
    df = QUERIES[args.name](spark, args.sf_dir).cache()
    try:
        summary = {
            "query": args.name,
            "sf_dir": args.sf_dir,
            "total_rows": df.count(),
            "rows": [r.asDict() for r in df.limit(args.show).collect()],
        }
    finally:
        df.unpersist()
    _emit(summary)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="big_data_processing_with_aws_glue_workshop_spark")
    sub = p.add_subparsers(dest="command", required=True)

    b = sub.add_parser("bronze", help="robust CSV ingest -> partitioned parquet")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--num-files", type=int, default=30)
    b.add_argument("--sample-fraction", type=float, default=0.01)
    b.set_defaults(func=cmd_bronze)

    s = sub.add_parser("silver", help="RN-001..RN-010 business rules")
    s.add_argument("--bronze", required=True)
    s.add_argument("--catalogs", required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--error-logs", default=None)
    s.add_argument("--reference-year", type=int, default=dt.date.today().year)
    s.add_argument("--num-files", type=int, default=30)
    s.set_defaults(func=cmd_silver)

    g = sub.add_parser("gold", help="star schema: dim_empresa + fact_renovacion")
    g.add_argument("--silver", required=True)
    g.add_argument("--output", required=True)
    g.add_argument("--today", default=str(dt.date.today()))
    g.set_defaults(func=cmd_gold)

    a = sub.add_parser("analytics", help="gold validation queries q1-q4")
    a.add_argument("--gold", required=True)
    a.add_argument("--query", choices=["q1", "q2", "q3", "q4"], default="q1")
    a.add_argument("--year", type=int, default=dt.date.today().year)
    a.add_argument("--limit", type=int, default=500_000)
    a.add_argument("--seed", type=int, default=42)
    a.add_argument("--show", type=int, default=10)
    a.set_defaults(func=cmd_analytics)

    t = sub.add_parser(
        "textpipe",
        help="end-to-end training-data prep: quality -> dedup -> "
        "decontaminate -> mix -> pack",
    )
    t.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    t.add_argument("--output", default=None)
    t.add_argument("--min-chars", type=int, default=100)
    t.add_argument("--budget", type=int, default=2048)
    t.add_argument(
        "--passage-decontam",
        action="store_true",
        help="stage 4 rewrites leaked 8-word passages out of training "
        "docs (span excision) instead of dropping whole docs that share "
        "a 5-gram with the eval slice",
    )
    t.add_argument(
        "--dsir-budget",
        type=int,
        default=None,
        help="stage 5 selects 'the best N tokens that look like the "
        "target' along the DSIR importance ranking instead of "
        "equalizing per-source token budgets (requires --dsir-target)",
    )
    t.add_argument(
        "--dsir-target",
        default=None,
        help="parquet path of the target corpus (text column) the DSIR "
        "selection should match",
    )
    t.add_argument("--dsir-seed", type=int, default=0)
    t.add_argument(
        "--quality-mixture",
        action="store_true",
        help="stage 5 fills the equalized per-source token budgets by "
        "lexical-diversity rank (stratified prefix cut) instead of by "
        "hash downsampling",
    )
    t.add_argument(
        "--stratified-budgets",
        default=None,
        metavar="SRC=TOKENS,...",
        help="stage 5 fills CALLER-NAMED per-source token budgets by "
        "lexical-diversity rank (stratified_budget_selection); every "
        "surviving source must be named (NULL sources as '(null)')",
    )
    t.add_argument(
        "--dsir-stratified-budgets",
        default=None,
        metavar="SRC=TOKENS,...",
        help="stage 5 fills CALLER-NAMED per-source token budgets by "
        "DSIR importance toward --dsir-target "
        "(dsir_select_budget_stratified)",
    )
    t.add_argument(
        "--curriculum-phase",
        default=None,
        action="append",
        metavar="NAME:SRC=TOKENS,...",
        help="stage 5 runs the phase-ordered exclusive curriculum "
        "(repeatable, ordered: the FIRST phase skims the best "
        "survivors); the packed corpus is partitioned by phase",
    )
    t.set_defaults(func=cmd_textpipe)

    z = sub.add_parser(
        "zorder",
        help="rewrite a parquet table z-ordered by several columns "
        "(multi-column file pruning; operators/layout.py)",
    )
    z.add_argument("--input", required=True)
    z.add_argument("--output", required=True)
    z.add_argument("--by", nargs="+", required=True)
    z.add_argument("--num-files", type=int, default=32)
    z.set_defaults(func=cmd_zorder)

    r = sub.add_parser(
        "refresh",
        help="bookmark-driven incremental upsert of new files into a "
        "versioned snapshot table (plans/incremental.py)",
    )
    r.add_argument("--pattern", required=True, help="glob of landing files")
    r.add_argument("--bookmark", required=True, help="bookmark state file")
    r.add_argument("--job-name", default="refresh")
    r.add_argument("--target", required=True, help="snapshot table dir")
    r.add_argument("--keys", nargs="+", required=True)
    r.add_argument("--order-col", default=None)
    r.set_defaults(func=cmd_refresh)

    ar = sub.add_parser(
        "agg-refresh",
        help="incremental aggregate maintenance: monoid-merge new-file "
        "partials into a versioned per-key state table "
        "(plans/incremental.py)",
    )
    ar.add_argument("--pattern", required=True, help="glob of landing files")
    ar.add_argument("--bookmark", required=True, help="bookmark state file")
    ar.add_argument("--job-name", default="agg-refresh")
    ar.add_argument("--target", required=True, help="state table dir")
    ar.add_argument("--keys", nargs="+", default=None)
    ar.add_argument(
        "--keep-versions",
        type=int,
        default=1,
        help="retain this many published state versions for time-travel "
        "reads / refresh audits (streaming/sinks.read_version, "
        "operators/diff.snapshot_diff); default 1 = current only",
    )
    ar.add_argument(
        "--published-of",
        default=None,
        metavar="REFRESH_DIR",
        help="exactly-once guard when --pattern globs another refresh's "
        "output (a join view's view/delta_* or a deduped corpus's "
        "accepted/delta_*): consume only delta files PUBLISHED in that "
        "refresh's pointer (plans/incremental.py published-delta "
        "filters); unpublished crash-replay rewrites would otherwise "
        "double-count",
    )
    ar.add_argument(
        "--agg",
        action="append",
        default=None,
        help="out=kind:col (kind: count|sum|min|max; col '*' with count)",
    )
    ar.add_argument(
        "--hll-key",
        default=None,
        help="maintain a distinct-count HLL register table of this "
        "column instead of --keys/--agg (operators/sketch.py)",
    )
    ar.add_argument(
        "--bloom-key",
        default=None,
        help="maintain a Bloom membership filter of this column instead "
        "of --keys/--agg (bit-or monoid, operators/sketch.py)",
    )
    ar.add_argument(
        "--cms-key",
        default=None,
        help="maintain a Count-Min frequency sketch of this column "
        "instead of --keys/--agg (count monoid, operators/sketch.py)",
    )
    ar.add_argument(
        "--sample-key",
        default=None,
        help="maintain a slot-minima coordinated uniform sample of this "
        "column instead of --keys/--agg (min monoid on a struct, "
        "operators/sketch.py; doubles as a distinct estimator)",
    )
    ar.add_argument(
        "--drift-col",
        default=None,
        help="PSI-check this numeric fact column's histogram against the "
        "maintained standing distribution (operators/drift.py)",
    )
    ar.add_argument(
        "--drift-key",
        default=None,
        help="segment the drift histogram by this column",
    )
    ar.set_defaults(func=cmd_agg_refresh)

    jr = sub.add_parser(
        "join-refresh",
        help="incremental fact-join-dim materialized view with a "
        "late-arriving-dimension pending buffer "
        "(plans/incremental.py::incremental_join_refresh)",
    )
    jr.add_argument("--fact-pattern", required=True, help="glob of fact files")
    jr.add_argument("--dim-pattern", required=True, help="glob of dim files")
    jr.add_argument("--bookmark", required=True, help="bookmark state file")
    jr.add_argument("--job-name", default="join-refresh")
    jr.add_argument("--target", required=True, help="view state dir")
    jr.add_argument("--key", required=True, help="join key column")
    jr.add_argument("--dim-compact-at", type=int, default=16)
    jr.set_defaults(func=cmd_join_refresh)

    dr = sub.add_parser(
        "dedup-refresh",
        help="dedup newly-landed crawl files against the standing corpus "
        "digest set (first wins; corpus text never re-read)",
    )
    dr.add_argument("--pattern", required=True, help="landing-glob of crawl files")
    dr.add_argument("--target", required=True, help="deduped corpus directory")
    dr.add_argument("--bookmark", required=True, help="bookmark state JSON path")
    dr.add_argument("--job-name", default="dedup-refresh")
    dr.add_argument("--id-col", default="doc_id")
    dr.add_argument("--text-col", default="text")
    dr.add_argument(
        "--drift",
        action="store_true",
        help="PSI-check the increment's doc-length histogram against the "
        "maintained standing distribution (operators/drift.py)",
    )
    dr.add_argument(
        "--drift-key",
        default=None,
        help="segment the drift histogram by this column (e.g. lang)",
    )
    dr.set_defaults(func=cmd_dedup_refresh)

    pr = sub.add_parser(
        "passage-refresh",
        help="rewrite newly-landed documents against the standing "
        "passage-digest set (boilerplate excision; first wins at "
        "passage granularity, standing text never re-read)",
    )
    pr.add_argument("--pattern", required=True, help="landing-glob of doc files")
    pr.add_argument("--target", required=True, help="rewritten corpus directory")
    pr.add_argument("--bookmark", required=True, help="bookmark state JSON path")
    pr.add_argument("--job-name", default="passage-refresh")
    pr.add_argument("--id-col", default="doc_id")
    pr.add_argument("--text-col", default="text")
    pr.add_argument("--words", type=int, default=8, help="passage cut width")
    pr.add_argument(
        "--drift",
        action="store_true",
        help="PSI-check the increment's REWRITTEN doc-length histogram "
        "against the maintained standing distribution (shared protocol, "
        "operators/drift.py; reads the passage layout's docs/ delta)",
    )
    pr.add_argument(
        "--drift-key",
        default=None,
        help="segment the drift histogram by this column (e.g. source)",
    )
    pr.set_defaults(func=cmd_passage_refresh)

    nr = sub.add_parser(
        "neardup-refresh",
        help="near-dup newly-landed crawl files against the standing "
        "corpus LSH index (signature agreement; corpus text never read)",
    )
    nr.add_argument("--pattern", required=True, help="landing-glob of crawl files")
    nr.add_argument("--target", required=True, help="deduped corpus directory")
    nr.add_argument("--bookmark", required=True, help="bookmark state JSON path")
    nr.add_argument("--job-name", default="neardup-refresh")
    nr.add_argument("--id-col", default="doc_id")
    nr.add_argument("--text-col", default="text")
    nr.add_argument("--sim-threshold", type=float, default=0.7)
    nr.add_argument(
        "--drift",
        action="store_true",
        help="PSI-check the increment's doc-length histogram against the "
        "maintained standing distribution (operators/drift.py)",
    )
    nr.add_argument(
        "--drift-key",
        default=None,
        help="segment the drift histogram by this column (e.g. lang)",
    )
    nr.set_defaults(func=cmd_neardup_refresh)

    sr = sub.add_parser(
        "semantic-refresh",
        help="semantic (embedding-cosine) dedup of newly-landed vector "
        "files against the standing pinned-centroid state",
    )
    sr.add_argument("--pattern", required=True, help="landing-glob of vector files")
    sr.add_argument("--target", required=True, help="deduped corpus directory")
    sr.add_argument("--bookmark", required=True, help="bookmark state JSON path")
    sr.add_argument("--job-name", default="semantic-refresh")
    sr.add_argument("--id-col", default="vec_id")
    sr.add_argument("--vec-col", default="embedding")
    sr.add_argument("--threshold", type=float, default=0.45)
    sr.add_argument("--nlist", type=int, default=16)
    sr.add_argument("--seed", type=int, default=42)
    sr.add_argument(
        "--recell-on-trigger",
        action="store_true",
        help="after the wave, run semantic-recell in-band iff the wave's "
        "allow_share reaches RECELL_ALLOW_SHARE_TRIGGER (0.9); adopts the "
        "stored calibration's nlist over --nlist",
    )
    sr.set_defaults(func=cmd_semantic_refresh)

    src = sub.add_parser(
        "semantic-recell",
        help="maintenance re-fit of a semantic-dedup target's pinned "
        "centroids (nlist ~ sqrt(n)); restores allowlist pruning on a "
        "grown corpus without changing any drop decision",
    )
    src.add_argument("--target", required=True, help="deduped corpus directory")
    src.add_argument("--id-col", default="vec_id")
    src.add_argument("--vec-col", default="embedding")
    src.add_argument(
        "--nlist",
        type=int,
        default=None,
        help="new cell count (default: ~sqrt(standing rows), capped at 1024)",
    )
    src.set_defaults(func=cmd_semantic_recell)

    pdc = sub.add_parser(
        "passage-decontam",
        help="one-shot passage-level benchmark decontamination: rewrite "
        "documents with benchmark-leaked passages excised (sliding "
        "windows on the benchmark side, block cut on the doc side)",
    )
    pdc.add_argument("--input", required=True, help="documents parquet path")
    pdc.add_argument("--benchmark", required=True, help="benchmark parquet path")
    pdc.add_argument("--output", required=True, help="rewritten corpus output dir")
    pdc.add_argument("--id-col", default="doc_id")
    pdc.add_argument("--text-col", default="text")
    pdc.add_argument("--bench-text-col", default="text")
    pdc.add_argument("--words", type=int, default=8, help="passage cut width")
    pdc.set_defaults(func=cmd_passage_decontam)

    em = sub.add_parser(
        "epoch-mixture",
        help="plan + materialize an epoch-aware training mixture: whole "
        "epochs for heavily-weighted small sources, deterministic "
        "residual sampling, one output row per doc per epoch",
    )
    em.add_argument("--input", required=True, help="documents parquet path")
    em.add_argument("--output", required=True, help="materialized mixture dir")
    em.add_argument(
        "--weights", required=True,
        help='JSON object of source -> weight, e.g. \'{"wiki": 5, "web": 1}\'',
    )
    em.add_argument("--total-tokens", type=int, required=True)
    em.add_argument("--id-col", default="doc_id")
    em.add_argument("--text-col", default="text")
    em.add_argument("--source-col", default="source")
    em.set_defaults(func=cmd_epoch_mixture)

    cs = sub.add_parser(
        "component-split",
        help="leakage-controlled train/val/test assignment: the split "
        "hash runs on the near-dup component canonical, so near-"
        "duplicates never straddle splits",
    )
    cs.add_argument("--input", required=True, help="documents parquet path")
    cs.add_argument("--output", required=True, help="(id, component, split) dir")
    cs.add_argument("--id-col", default="doc_id")
    cs.add_argument("--text-col", default="text")
    cs.set_defaults(func=cmd_component_split)

    tb = sub.add_parser(
        "token-budget-select",
        help="quality-ranked corpus selection under a token budget: "
        "distributed two-phase prefix sum (no single-partition global "
        "window), inclusive running mass <= budget",
    )
    tb.add_argument("--input", required=True, help="documents parquet path")
    tb.add_argument("--output", required=True, help="selected-docs dir")
    tb.add_argument("--budget-tokens", type=int, required=True)
    tb.add_argument(
        "--score-col", default=None,
        help="precomputed quality column (default: lexical-diversity "
        "score computed from --text-col)",
    )
    tb.add_argument("--n-tokens-col", default="n_tokens")
    tb.add_argument("--id-col", default="doc_id")
    tb.add_argument("--text-col", default="text")
    tb.add_argument("--n-buckets", type=int, default=256)
    tb.set_defaults(func=cmd_token_budget_select)

    sb = sub.add_parser(
        "stratified-budget-select",
        help="per-source constrained budget selection: every source's "
        "quality-ranked prefix cut at its own token budget; level-"
        "batched prefix sums, jobs scale with depth not source count",
    )
    sb.add_argument("--input", required=True, help="documents parquet path")
    sb.add_argument("--output", required=True, help="selected-docs dir")
    sb.add_argument(
        "--budgets", required=True,
        help="comma-separated source=tokens pairs naming EVERY corpus "
        "source (e.g. web=100000,code=50000)",
    )
    sb.add_argument("--score-col", default=None)
    sb.add_argument("--n-tokens-col", default="n_tokens")
    sb.add_argument("--id-col", default="doc_id")
    sb.add_argument("--source-col", default="source")
    sb.add_argument("--text-col", default="text")
    sb.add_argument("--n-buckets", type=int, default=256)
    sb.add_argument(
        "--source-batch", type=int, default=None,
        help="process the budget dict in sorted chunks of this many "
        "sources (bounds driver state at ~100k+ strata; output is "
        "byte-identical to the single pass)",
    )
    sb.set_defaults(func=cmd_stratified_budget_select)

    dts = sub.add_parser(
        "dedup-threshold-sweep",
        help="near-dup threshold tuning audit: one LSH pass at the "
        "floor, exact-Jaccard readouts per candidate threshold (pairs, "
        "docs touched, exact docs a min-id dedup would remove)",
    )
    dts.add_argument("--input", required=True, help="documents parquet path")
    dts.add_argument(
        "--thresholds", required=True,
        help="comma-separated Jaccard cuts in (0, 1], e.g. 0.6,0.8,0.9 "
        "(tune --bands for the floor — see the S-curve note in the op)",
    )
    dts.add_argument("--id-col", default="doc_id")
    dts.add_argument("--text-col", default="text")
    dts.add_argument("--n-hashes", type=int, default=64)
    dts.add_argument("--bands", type=int, default=16)
    dts.add_argument("--shingle-n", type=int, default=3)
    dts.add_argument("--seed", type=int, default=42)
    dts.set_defaults(func=cmd_dedup_threshold_sweep)

    sts = sub.add_parser(
        "semantic-threshold-sweep",
        help="semantic (cosine) eps tuning audit: one clustered "
        "exact-pair pass at the floor eps, exact-cosine readouts per "
        "candidate eps (pairs, vectors touched, exact docs SemDeDup "
        "min-id dedup would remove); recall is exact at every eps — "
        "the floor controls allowlist COST, not recall",
    )
    sts.add_argument("--input", required=True, help="embeddings parquet path")
    sts.add_argument(
        "--eps", required=True,
        help="comma-separated cosine cuts in (0, 1], e.g. 0.4,0.6,0.8 "
        "(the floor widens the cell allowlist toward all-pairs — see "
        "the cost note in the op)",
    )
    sts.add_argument("--id-col", default="vec_id")
    sts.add_argument("--vec-col", default="embedding")
    sts.add_argument("--nlist", type=int, default=16)
    sts.add_argument("--seed", type=int, default=42)
    sts.set_defaults(func=cmd_semantic_threshold_sweep)

    shs = sub.add_parser(
        "simhash-threshold-sweep",
        help="simhash hamming tuning audit: one block-join pass at the "
        "ceiling k, exact-hamming readouts per candidate k (pairs, docs "
        "touched, exact docs min-id dedup would remove); recall exact "
        "at every k (pigeonhole) — the ceiling controls candidate-join "
        "cost, not recall",
    )
    shs.add_argument("--input", required=True, help="documents parquet path")
    shs.add_argument(
        "--hammings", required=True,
        help="comma-separated hamming cuts, e.g. 1,2,3 (the ceiling "
        "sets n_blocks = max+1 — see the cost note in the op)",
    )
    shs.add_argument("--id-col", default="doc_id")
    shs.add_argument("--text-col", default="text")
    shs.add_argument("--n-bits", type=int, default=32)
    shs.set_defaults(func=cmd_simhash_threshold_sweep)

    cs = sub.add_parser(
        "curriculum-select",
        help="phase-ordered exclusive curriculum selection: each "
        "--phase takes its per-source quality cut from what earlier "
        "phases left behind (flag order = priority order)",
    )
    cs.add_argument("--input", required=True, help="documents parquet path")
    cs.add_argument("--output", required=True, help="selected-docs dir (partitioned by phase)")
    cs.add_argument(
        "--phase", required=True, action="append",
        metavar="NAME:SRC=TOKENS,...",
        help="repeatable, ordered: phase name + its per-source token "
        "budgets; the FIRST phase skims the best documents",
    )
    cs.add_argument("--score-col", default=None)
    cs.add_argument("--n-tokens-col", default="n_tokens")
    cs.add_argument("--id-col", default="doc_id")
    cs.add_argument("--source-col", default="source")
    cs.add_argument("--text-col", default="text")
    cs.add_argument("--n-buckets", type=int, default=256)
    cs.set_defaults(func=cmd_curriculum_select)

    ba = sub.add_parser(
        "budget-admission",
        help="streaming per-source budget admission: drain newly-landed "
        "docs into the standing admitted table, each drain cutting at "
        "the budgets remaining after earlier drains (exactly-once, "
        "atomic spent counters)",
    )
    ba.add_argument("--input", required=True, help="landing parquet dir/glob")
    ba.add_argument("--target", required=True, help="admission state dir")
    ba.add_argument(
        "--checkpoint", required=True,
        help="stream checkpoint dir (pinned to the target on first drain)",
    )
    ba.add_argument(
        "--budgets", required=True,
        help="comma-separated source=tokens pairs (pinned in the "
        "calibration on first drain)",
    )
    ba.add_argument("--score-col", required=True)
    ba.add_argument("--n-tokens-col", default="n_tokens")
    ba.add_argument("--id-col", default="doc_id")
    ba.add_argument("--source-col", default="source")
    ba.add_argument("--n-buckets", type=int, default=256)
    ba.set_defaults(func=cmd_budget_admission)

    ca = sub.add_parser(
        "curriculum-admission",
        help="streaming phase-ordered budget admission: each drain runs "
        "the batch curriculum cut over the wave against the per-(phase, "
        "source) budgets remaining after earlier drains — each doc lands "
        "in the highest-priority phase with headroom, exactly once",
    )
    ca.add_argument("--input", required=True, help="landing parquet dir/glob")
    ca.add_argument("--target", required=True, help="admission state dir")
    ca.add_argument(
        "--checkpoint", required=True,
        help="stream checkpoint dir (pinned to the target on first drain)",
    )
    ca.add_argument(
        "--phase", action="append", required=True,
        help="name:src=tokens,src=tokens — repeat per phase; flag order "
        "is priority order (pinned in the calibration on first drain)",
    )
    ca.add_argument("--score-col", required=True)
    ca.add_argument("--n-tokens-col", default="n_tokens")
    ca.add_argument("--id-col", default="doc_id")
    ca.add_argument("--source-col", default="source")
    ca.add_argument("--n-buckets", type=int, default=256)
    ca.set_defaults(func=cmd_curriculum_admission)

    crg = sub.add_parser(
        "curriculum-regret",
        help="phase-ordered wave-greedy regret readout: the standing "
        "phase-admitted table vs the batch curriculum's hindsight "
        "assignment over everything seen, per (phase, source)",
    )
    crg.add_argument("--target", required=True, help="admission state dir")
    crg.add_argument(
        "--corpus", required=True,
        help="parquet path holding everything seen so far (the sink "
        "retains nothing it rejected)",
    )
    crg.set_defaults(func=cmd_curriculum_regret)

    crc = sub.add_parser(
        "curriculum-recalibrate",
        help="migrate a standing phase-admitted table to a new ordered "
        "phase list: phase membership recomputed under the new priority "
        "order (docs may move between phases), atomic snapshot + "
        "per-(phase, source) spent flip",
    )
    crc.add_argument("--target", required=True, help="admission state dir")
    crc.add_argument(
        "--phase", action="append", required=True,
        help="name:src=tokens,src=tokens — repeat per phase, order is "
        "the new priority order; every source with admitted rows must "
        "be named in EVERY phase (evict explicitly with 0)",
    )
    crc.set_defaults(func=cmd_curriculum_recalibrate)

    arc = sub.add_parser(
        "admission-recalibrate",
        help="migrate a standing admission table to new per-source "
        "budgets: quality re-cut of the admitted docs (shrink evicts, "
        "grow keeps + raises headroom), atomic snapshot + spent flip",
    )
    arc.add_argument("--target", required=True, help="admission state dir")
    arc.add_argument(
        "--budgets", required=True,
        help="comma-separated source=tokens pairs — every source with "
        "admitted rows must be named (evict explicitly with 0)",
    )
    arc.set_defaults(func=cmd_admission_recalibrate)

    ar = sub.add_parser(
        "admission-regret",
        help="wave-greedy regret readout: the standing admitted table vs "
        "the batch hindsight selection over everything seen so far — "
        "docs swapped and score mass lost, per source",
    )
    ar.add_argument("--target", required=True, help="admission state dir")
    ar.add_argument(
        "--corpus", required=True,
        help="parquet of EVERYTHING seen so far (the sink retains "
        "nothing it rejected — typically the landing dir itself)",
    )
    ar.set_defaults(func=cmd_admission_regret)

    sla = sub.add_parser(
        "split-leakage-audit",
        help="post-hoc near-dup leakage audit of a completed train/val/"
        "test split: MinHash pairs x (id, split) assignment -> counts "
        "per unordered split pair + leaked share",
    )
    sla.add_argument("--input", required=True, help="documents parquet path")
    sla.add_argument(
        "--assignment", required=True, help="(id, split) assignment parquet path"
    )
    sla.add_argument("--id-col", default="doc_id")
    sla.add_argument("--text-col", default="text")
    sla.add_argument("--split-col", default="split")
    sla.add_argument("--threshold", type=float, default=0.8)
    sla.set_defaults(func=cmd_split_leakage_audit)

    ds = sub.add_parser(
        "dsir-select",
        help="DSIR distribution-matching selection: hashed n-gram bucket "
        "models (target vs corpus), micro-nat importance log ratios, "
        "Gumbel-top-k resampling — shuffle-free scoring, distributed "
        "top-k",
    )
    ds.add_argument("--input", required=True, help="raw corpus parquet path")
    ds.add_argument(
        "--target", default=None,
        help="target corpus parquet path (or pass a fitted --log-ratio)",
    )
    ds.add_argument(
        "--log-ratio", default=None,
        help="(b, lam) parquet from dsir-fit: skip both model fits",
    )
    ds.add_argument("--output", required=True, help="selected-docs dir")
    ds.add_argument("--k", type=int, default=None, help="docs to select")
    ds.add_argument(
        "--budget-tokens", type=int, default=None,
        help="spend a token budget along the DSIR ranking instead of a "
        "fixed k (exactly one of --k / --budget-tokens)",
    )
    ds.add_argument("--seed", type=int, default=0)
    ds.add_argument(
        "--no-sample", action="store_true",
        help="deterministic top-k by weight instead of Gumbel resampling",
    )
    ds.add_argument("--id-col", default="doc_id")
    ds.add_argument("--text-col", default="text")
    ds.add_argument("--n-buckets", type=int, default=4096)
    ds.add_argument("--alpha", type=float, default=1.0)
    ds.add_argument(
        "--model-sample", type=float, default=None,
        help="fit the CORPUS-side model on this sample fraction (the "
        "paper's at-scale recipe; the target side always fits in full)",
    )
    ds.set_defaults(func=cmd_dsir_select)

    df_ = sub.add_parser(
        "dsir-fit",
        help="fit the DSIR log-ratio table once (tiny (b, lam) parquet); "
        "later dsir-select --log-ratio runs skip both model fits",
    )
    df_.add_argument(
        "--input", default=None,
        help="raw corpus parquet path (exactly one of --input / "
        "--corpus-stream)",
    )
    df_.add_argument(
        "--corpus-stream", default=None,
        help="standing NgramHistogramSink dir: fit the corpus-side "
        "model from the STREAMED histogram (same featurizer), never "
        "re-reading a streamed document; bucketing comes from the "
        "sink's pinned calibration",
    )
    df_.add_argument(
        "--stream-sources", default=None,
        help="with --corpus-stream: comma-separated subset of streamed "
        "sources to fit against (default: all)",
    )
    df_.add_argument(
        "--target",
        required=True,
        action="append",
        help="target corpus parquet path; repeat for a weighted "
        "multi-target mixture",
    )
    df_.add_argument(
        "--weights",
        default=None,
        help="comma-separated positive weights, one per --target "
        "(default: equal)",
    )
    df_.add_argument("--output", required=True, help="log-ratio table dir")
    df_.add_argument(
        "--text-col", default="text",
        help="text column of the corpus AND target (batch fit) / of the "
        "TARGET (stream fit — the streamed side is already bucketed "
        "under the sink's own text_col)",
    )
    df_.add_argument("--n-buckets", type=int, default=4096)
    df_.add_argument("--alpha", type=float, default=1.0)
    df_.add_argument("--seed", type=int, default=0)
    df_.add_argument(
        "--model-sample", type=float, default=None,
        help="fit the corpus-side model on this sample fraction",
    )
    df_.set_defaults(func=cmd_dsir_fit)

    sdv = sub.add_parser(
        "source-divergence",
        help="per-source JSD drift vs a target corpus in hashed n-gram "
        "space (micro-nats): one bounded corpus aggregate, folded "
        "target model, exact bigint sums",
    )
    sdv.add_argument("--input", required=True, help="corpus parquet path")
    sdv.add_argument("--target", required=True, help="target corpus parquet path")
    sdv.add_argument("--source-col", default="source")
    sdv.add_argument("--text-col", default="text")
    sdv.add_argument("--n-buckets", type=int, default=4096)
    sdv.add_argument("--alpha", type=float, default=1.0)
    sdv.set_defaults(func=cmd_source_divergence)

    sar = sub.add_parser(
        "semantic-allow-report",
        help="on-demand allowlist-health report for a semantic-dedup "
        "target (the re-cell trigger check, no wave required): one "
        "narrow per-cell aggregate + the driver-side triangle count",
    )
    sar.add_argument("--target", required=True, help="deduped corpus directory")
    sar.add_argument("--vec-col", default="embedding")
    sar.set_defaults(func=cmd_semantic_allow_report)

    c = sub.add_parser(
        "compact",
        help="small-file compaction: rewrite oversized partitions into "
        "right-sized parquet files (operators/compaction.py)",
    )
    c.add_argument("--path", required=True, help="lake root directory")
    c.add_argument("--target-mb", type=int, default=128)
    c.add_argument("--dry-run", action="store_true")
    c.set_defaults(func=cmd_compact)

    bp = sub.add_parser(
        "bpe-learn",
        help="learn a BPE subword vocabulary from a document table "
        "(merge learning on the aggregated word-frequency table)",
    )
    bp.add_argument("--input", required=True, help="documents parquet path")
    bp.add_argument("--output", required=True, help="merges JSON output path")
    bp.add_argument("--text-col", default="text")
    bp.add_argument("--n-merges", type=int, default=200)
    bp.add_argument("--min-pair-freq", type=int, default=2)
    bp.set_defaults(func=cmd_bpe_learn)

    lm = sub.add_parser(
        "lm-score",
        help="score documents under a Stupid-Backoff trigram LM built "
        "from a reference corpus (model-based quality filtering; "
        "operators/lm.py)",
    )
    lm.add_argument("--input", required=True, help="documents parquet path")
    lm.add_argument("--output", required=True, help="scores parquet path")
    lm.add_argument(
        "--reference",
        default=None,
        help="reference documents parquet (count-table corpus); defaults "
        "to scoring the input against itself",
    )
    lm.add_argument("--id-col", default="doc_id")
    lm.add_argument("--text-col", default="text")
    lm.set_defaults(func=cmd_lm_score)

    q = sub.add_parser("query", help="run a registered engine query by name")
    q.add_argument("--name", default="pricing_summary")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--show", type=int, default=10)
    q.add_argument("--list", action="store_true", help="list registered queries")
    q.set_defaults(func=cmd_query)
    return p


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
