"""End-to-end training-data preparation pipeline over ``documents`` —
the composed counterpart of the individual query-registry operators.

Stage order follows production pretraining pipelines (quality gate before
expensive pairwise work; contamination last so eval grams can't leak back
in via near-dup survivors):

  1. quality filter      — drop SHORT docs (the cheap narrow gate first)
  2. exact dedup         — keep the min doc_id per content md5
  3. near-dup dedup      — MinHash-LSH pairs -> connected components ->
                           keep each component's canonical (min id) doc
  4. decontamination     — drop the eval slice and every training doc
                           sharing a 5-gram with it
  5. selection           — default: deterministic hash-downsample each
                           source to the smallest surviving source's
                           token budget; quality mode (flag): fill the
                           SAME equalized budgets by lexical-diversity
                           rank (stratified_budget_selection); DSIR
                           mode (flag): rank by importance toward a
                           target corpus and cut at a token budget
                           (dsir_select_budget); stratified modes
                           (flags, r15): fill CALLER-NAMED per-source
                           budgets by quality rank
                           (stratified_budget_selection) or by DSIR
                           rank (dsir_select_budget_stratified)
  6. sequence packing    — greedy-prefix pack survivors into fixed
                           token-budget sequences per source

Every stage is the SAME operator the query registry exposes individually
(docstrings there carry the 100 TB design notes); this module only wires
them, counts what each stage dropped, and writes the final packed corpus.
All selection logic is deterministic (content hashes, id hashes, min-id
canonicals) — two runs on the same input produce byte-identical stage
decisions, which is what makes a 100 TB rerun auditable.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries._tables import load, parallelize_scan
from ..queries.textops import (
    _CONTAM_N,
    _EVAL_MOD,
    _PACK_BUDGET,
    _tokens,
    lexical_diversity,
)
from ..util import release_tracked_caches, tracked_cache


def _with_tokens(docs: DataFrame) -> DataFrame:
    return docs.withColumn("n_tokens", F.size(_tokens(F.col("text"))))


def run_text_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    min_chars: int = 100,
    budget: int = _PACK_BUDGET,
    passage_decontam: bool = False,
    dsir_target: DataFrame | None = None,
    dsir_budget_tokens: int | None = None,
    dsir_seed: int = 0,
    mixture_by_quality: bool = False,
    stratified_budgets: dict | None = None,
    dsir_stratified_budgets: dict | None = None,
    curriculum_phases: list | None = None,
) -> dict:
    """Run the full pipeline; returns a summary dict of per-stage counts.
    If ``out_dir`` is given, writes the packed corpus parquet plus a
    summary.json next to it.

    ``dsir_budget_tokens`` (+ required ``dsir_target``) swaps stage 5's
    selection contract the way ``passage_decontam`` swaps stage 4's
    (r13 verdict "Next round #5" — the composed run used to take two
    CLI invocations): instead of equalizing per-source token budgets,
    the deduped+decontaminated survivors are ranked by DSIR importance
    toward the target corpus and cut at the token budget
    (queries/textops.py::dsir_select_budget — Gumbel-perturbed
    log-ratio keys, then the distributed two-phase prefix sum; no
    single-partition window, rejected mass never shuffles). "The best
    N tokens that look like the target" as the pipeline's final
    selection decision. Packing (stage 6) is contract-unchanged either
    way; the summary records selection_mode, the selected token mass
    (always <= the budget) and the budget itself.

    ``mixture_by_quality`` keeps the default mode's EQUALIZED per-source
    allocation (every source capped at the smallest surviving source's
    token mass) but fills each allocation by QUALITY instead of by
    hash: a stratified inclusive-prefix cut at the shared budget along
    the lexical-diversity ranking
    (queries/textops.py::stratified_budget_selection — level-batched
    prefix sums, never a per-source single-task window). Same mixture
    arithmetic, best documents instead of random ones; mutually
    exclusive with the DSIR mode (two final selection decisions cannot
    both apply).

    ``stratified_budgets`` (r15 — the r14 verdict's "Next round #2":
    the selection matrix existed as operators but a per-source-budget
    pipeline run took two CLI invocations) fills CALLER-NAMED per-source
    token budgets by lexical-diversity rank: the mixture planner decides
    each source's allocation, stage 5 fills each one with that source's
    best documents (queries/textops.py::stratified_budget_selection —
    level-batched prefix sums, jobs scale with refinement depth, never
    source count). ``dsir_stratified_budgets`` (+ required
    ``dsir_target``) fills the same caller-named budgets along the DSIR
    importance ranking instead
    (queries/textops.py::dsir_select_budget_stratified — one model, one
    shuffle-free scoring pass, per-source cuts). Both inherit the
    operator's coverage rule: every source surviving stage 4 must be
    named in the dict (NULL sources surface as ``'(null)'``); a missing
    source raises rather than silently selecting nothing.

    ``curriculum_phases`` (r15) runs the phase-ordered exclusive
    curriculum as stage 5 (queries/textops.py::
    curriculum_phase_selection): an ordered list of (phase_name,
    per-source budgets), the first phase skimming the top
    lexical-diversity tranche of the survivors, each later phase the
    next. The packed corpus carries a ``phase`` column so the trainer
    can replay phases in schedule order. All five selection flags are
    mutually exclusive — the pipeline takes ONE final selection
    decision.

    ``passage_decontam`` swaps stage 4's contract from doc-DROP to
    span-EXCISION (queries/textops.py::decontaminate_passages): a
    training document sharing content with the eval slice is REWRITTEN
    with the leaked 8-word passages excised instead of dropped whole —
    only documents whose entire body is leaked (empty rewrite) drop.
    Granularity trade, stated plainly: the doc-drop stage catches any
    shared 5-gram; the excision stage catches leaks at 8-word-block
    granularity (sliding on the eval side, block-cut on the doc side),
    so a sub-block leak keeps its document — span excision is for
    pipelines that accept that bound to preserve training mass.
    Downstream stages are contract-unchanged: they read the rewritten
    text through the same (doc_id, source, lang, text) columns, and the
    eval slice itself never reaches the output under either mode."""
    from ..extensions.dedup_fuzzy import connected_components, minhash_near_duplicates
    from ..functions.text import word_shingles

    # pure argument validation FIRST (r14 review finding): these used to
    # raise only when stage 5 was reached — after quality, both dedups
    # and decontamination had fully executed (hours at the 100 TB
    # target, all wasted on a flag typo)
    modes = {
        "dsir_budget_tokens": dsir_budget_tokens is not None,
        "mixture_by_quality": mixture_by_quality,
        "stratified_budgets": stratified_budgets is not None,
        "dsir_stratified_budgets": dsir_stratified_budgets is not None,
        "curriculum_phases": curriculum_phases is not None,
    }
    if sum(modes.values()) > 1:
        on = sorted(k for k, v in modes.items() if v)
        raise ValueError(
            f"{' and '.join(on)} are mutually exclusive — the pipeline "
            "takes ONE final selection decision"
        )
    if dsir_budget_tokens is not None and dsir_target is None:
        raise ValueError(
            "dsir_budget_tokens requires dsir_target (the corpus whose "
            "distribution the selection should match)"
        )
    if dsir_stratified_budgets is not None and dsir_target is None:
        raise ValueError(
            "dsir_stratified_budgets requires dsir_target (the corpus "
            "whose distribution the selection should match)"
        )
    for name, b in (
        ("stratified_budgets", stratified_budgets),
        ("dsir_stratified_budgets", dsir_stratified_budgets),
    ):
        if b is not None and not isinstance(b, dict):
            raise ValueError(f"{name} must be a dict of source -> token budget")
    if curriculum_phases is not None:
        # the operator re-validates, but these are pure-argument checks
        # and stage 5 runs AFTER four expensive stages — fail on a typo
        # before any Spark work (the same eager rule as the other flags)
        if not curriculum_phases:
            raise ValueError(
                "curriculum_phases must be a non-empty ordered list of "
                "(name, budgets)"
            )
        _names = [str(n) for n, _ in curriculum_phases]
        if len(set(_names)) != len(_names):
            raise ValueError(f"duplicate phase names: "
                             f"{sorted({n for n in _names if _names.count(n) > 1})}")
        for n, b in curriculum_phases:
            if not isinstance(b, dict):
                raise ValueError(
                    f"phase {n!r}: budgets must be a dict of source -> tokens"
                )

    # Each stage output is persisted and materialized by its own count()
    # action, so downstream stages (and their counts) read the cached stage
    # instead of re-executing the whole upstream lineage from the scan —
    # without the pins the final count re-runs quality->exact->LSH->CC->
    # decontam->mix from scratch (~6 redundant corpus passes at 100 TB).
    # All pins are released before returning (summary is a plain dict).
    # per-stage wall clock (r15): the counts already materialize each
    # stage exactly once, so the laps between them ARE the stage walls —
    # free observability for a composed run an operator would otherwise
    # have to tease out of the Spark UI
    stage_walls: dict = {}
    _lap_t = [time.time()]

    def _lap(stage: str) -> None:
        now = time.time()
        stage_walls[stage] = round(now - _lap_t[0], 2)
        _lap_t[0] = now

    docs = parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
    _lap("scan")

    # 1. quality: cheap narrow filter first — everything downstream pays
    # per-row cost, so shed rows before shuffling anything. Cached (every
    # later stage reads it); materialized by stage 2's aggregate.
    quality = tracked_cache(docs.filter(F.length("text") >= min_chars))
    _lap("quality")

    # 2. exact dedup on the 16-byte digest, min-id winner
    keep_exact = (
        quality.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    exact = tracked_cache(quality.join(keep_exact, "doc_id", "left_semi"))
    # r17 fused the input/quality counts into one narrow aggregate (no raw
    # cache); r18 (guide §1.2) fuses that aggregate with stage 2's count
    # into ONE action — a tagged union of two one-row aggregates — so the
    # scan counts, the quality cache, and the exact cache all materialize
    # in a single job launch instead of two. Counts are bit-identical:
    # same predicates, same frames, only the action boundary moved.
    # (scan/quality stage walls now record plan-build time only; the fused
    # wall lands in exact_dedup.)
    _hdr = {
        int(r["k"]): r
        for r in docs.agg(
            F.count(F.lit(1)).alias("a"),
            F.count(F.when(F.length("text") >= min_chars, 1)).alias("b"),
        )
        .select(F.lit(0).alias("k"), "a", "b")
        .unionByName(
            exact.agg(F.count(F.lit(1)).alias("a")).select(
                F.lit(1).alias("k"), "a", F.lit(None).cast("bigint").alias("b")
            )
        )
        .collect()
    }
    n_input, n_quality = int(_hdr[0]["a"]), int(_hdr[0]["b"])
    n_exact = int(_hdr[1]["a"])
    _lap("exact_dedup")

    # 3. near-dup: LSH pairs -> CC -> drop non-canonical members
    pairs = minhash_near_duplicates(
        exact, n_hashes=64, bands=16, shingle_n=3, threshold=0.8, seed=42
    )
    labels = connected_components(pairs, "d1", "d2")
    losers = labels.filter(F.col("id") != F.col("label")).select(
        F.col("id").alias("doc_id")
    )
    neardup = tracked_cache(exact.join(losers, "doc_id", "left_anti"))
    if passage_decontam:
        n_neardup = neardup.count()
        eval_shingle_bound = None
    else:
        # r18 (guide §1.2): the near-dedup survivor count and stage 4's
        # eval-shingle upper bound are BOTH narrow aggregates over the
        # cached survivor frame — fuse them into one action (the bound is
        # the same greatest(n_tokens-(N-1), 0) sum as before, expressed as
        # a conditional sum over the eval slice, so its value is
        # unchanged; the count is strategy-independent).
        _n_tok = F.size(_tokens(F.col("text")))
        _nd = neardup.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("doc_id") % _EVAL_MOD) == 0,
                        F.greatest(_n_tok - (_CONTAM_N - 1), F.lit(0)),
                    )
                ),
                F.lit(0),
            ).alias("b"),
        ).first()
        n_neardup, eval_shingle_bound = int(_nd["n"]), int(_nd["b"])
    _lap("near_dedup")

    # 4. decontamination: drop the eval slice itself and any training doc
    # sharing a _CONTAM_N-gram with it. The shingle semi-join routes
    # through the measured join planner (operators/skew.py — the same
    # decision procedure incremental_join_refresh adopted in r11):
    # benchmark/eval slices are small by construction, so the caller-
    # supplied shingle-count upper bound pins a broadcast at zero
    # marginal cost and the training-side shingles never shuffle; if a
    # huge eval suite ever outgrows the threshold, the planner degrades
    # to the measured ladder (exact count, hot-key probe, salted or
    # shuffle) instead of silently building an oversized broadcast. The
    # decision is logged in the summary dict.
    from ..operators.skew import adaptive_join, plan_equi_join

    passage_stats = None
    if passage_decontam:
        # 4'. span excision: rewrite instead of drop. The op routes its
        # benchmark anti-join through the same measured planner with its
        # own probe-0 bound (total eval token count bounds the sliding
        # digest set at zero evaluation cost) — the decision is returned
        # for the same audit-trail key the doc-drop join logs.
        from ..queries.textops import decontaminate_passages

        train = neardup.filter((F.col("doc_id") % _EVAL_MOD) != 0)
        bench = neardup.filter((F.col("doc_id") % _EVAL_MOD) == 0).select("text")
        rewritten, decontam_decision = decontaminate_passages(
            train, bench, return_decision=True
        )
        rewritten = tracked_cache(
            rewritten.withColumnRenamed("text_deduped", "text")
        )
        agg = rewritten.agg(
            F.coalesce(F.sum("n_passages_dropped"), F.lit(0)).alias("excised"),
            F.coalesce(
                F.sum(F.when(F.col("n_passages_dropped") > 0, 1).otherwise(0)),
                F.lit(0),
            ).alias("touched"),
            F.coalesce(
                F.sum(F.when(F.col("text") == "", 1).otherwise(0)), F.lit(0)
            ).alias("emptied"),
        ).first()
        passage_stats = {
            "passages_excised": int(agg["excised"]),
            "docs_rewritten": int(agg["touched"]) - int(agg["emptied"]),
            "docs_dropped_fully_leaked": int(agg["emptied"]),
        }
        clean = tracked_cache(
            rewritten.filter(F.col("text") != "").drop(
                "n_passages", "n_passages_dropped"
            )
        )
        n_clean = clean.count()
    else:
        sh = word_shingles(neardup, "doc_id", "text", n=_CONTAM_N)
        eval_sh = sh.filter((F.col("doc_id") % _EVAL_MOD) == 0).select("shingle")
        train_sh = sh.filter((F.col("doc_id") % _EVAL_MOD) != 0)
        # the planner's probe-0 bound: per-doc shingle instances are at
        # most max(n_tokens - (N-1), 0), so the narrow aggregate fused
        # into stage 3's survivor count above (no explode, no shuffle —
        # ~the eval slice's token counts) bounds the eval shingle set.
        # When even the bound fits the broadcast threshold the planner
        # never has to evaluate the eval side; a giant eval suite falls
        # through to the measured ladder.
        decontam_decision = plan_equi_join(
            train_sh,
            eval_sh,
            ["shingle"],
            right_rows_upper_bound=int(eval_shingle_bound),
        )
        contaminated = (
            adaptive_join(
                train_sh, eval_sh, ["shingle"], "left_semi", decision=decontam_decision
            )
            .select("doc_id")
            .distinct()
        )
        clean = tracked_cache(
            neardup.filter((F.col("doc_id") % _EVAL_MOD) != 0).join(
                contaminated, "doc_id", "left_anti"
            )
        )
        # n_clean is deferred: the default selection mode's per-source
        # totals collect (below) materializes the clean cache and counts
        # it in the SAME action (r18, guide §1.2); every other mode
        # counts it at selection start exactly as before.
        n_clean = None

    _lap("decontamination")

    # 5. selection on the SURVIVORS: DSIR budget mode (flag) ranks by
    # importance toward the target and cuts at the token budget;
    # default mode equalizes per-source token budgets
    with_tok = _with_tokens(clean)
    dsir_stats = None
    quality_stats = None
    # every non-default selection mode counts the decontamination
    # survivors here, exactly as stage 4 used to (the default mode's
    # per-source totals collect below subsumes it — r18 fusion)
    if n_clean is None and (
        dsir_budget_tokens is not None
        or mixture_by_quality
        or stratified_budgets is not None
        or dsir_stratified_budgets is not None
        or curriculum_phases is not None
    ):
        n_clean = clean.count()

    def _apply_selection(sel):
        """Shared tail of every per-source selection branch (r15 review
        finding: it lived four times): per-source selected masses and the
        semi-join back to the survivor frame. The selected-row count is
        NOT a separate action anymore — stage 6's packing aggregate
        counts the rows it packs (r18, guide §1.2)."""
        sel = tracked_cache(sel)
        masses = {
            r["source"]: int(r["m"])
            for r in sel.groupBy("source")
            .agg(F.max("cum_tokens").alias("m"))
            .collect()
        }
        picked = tracked_cache(
            with_tok.join(sel.select("doc_id"), "doc_id", "left_semi")
        )
        return picked, masses

    if dsir_budget_tokens is not None:
        from ..queries.textops import dsir_select_budget

        sel = tracked_cache(
            dsir_select_budget(
                with_tok,
                dsir_target,
                dsir_budget_tokens,
                seed=dsir_seed,
                n_tokens_col="n_tokens",
            )
        )
        sel_mass = int(
            sel.agg(F.coalesce(F.max("cum_tokens"), F.lit(0)).alias("m")).first()["m"]
        )
        mixed = tracked_cache(
            with_tok.join(sel.select("doc_id"), "doc_id", "left_semi")
        )
        dsir_stats = {
            "dsir_selected_tokens": sel_mass,
            "dsir_budget_tokens": int(dsir_budget_tokens),
        }
    elif mixture_by_quality:
        # the default mode's equalized allocation (smallest surviving
        # source's token mass), filled by quality: stratified inclusive-
        # prefix cut along the lexical-diversity ranking. One
        # |sources|-row aggregate fixes the shared budget; the cut
        # itself is the level-batched prefix sum (no per-source
        # single-task window). Totals key by the operator's OWN
        # NULL-source sentinel ('(null)') — keying by the raw column
        # built a None-keyed dict the operator str()'d to 'None' and
        # then refused as 'missing (null)' AFTER stages 1-4 had run
        # (r14 ADVICE finding).
        from ..queries.textops import stratified_budget_selection

        src_sentinel = F.coalesce(
            F.col("source").cast("string"), F.lit("(null)")
        )
        totals = {
            r["s"]: int(r["t"])
            for r in with_tok.groupBy(src_sentinel.alias("s"))
            .agg(F.sum("n_tokens").alias("t"))
            .collect()
        }
        target_mass = min(totals.values()) if totals else 0
        budgets = {s: target_mass for s in totals}
        scored = with_tok.withColumn("__q", lexical_diversity(F.col("text")))
        mixed, sel_masses = _apply_selection(
            stratified_budget_selection(scored, budgets, "__q")
        )
        quality_stats = {
            "mixture_budget_tokens": target_mass,
            "mixture_selected_tokens": sel_masses,
        }
    elif stratified_budgets is not None:
        # caller-named per-source budgets filled by quality rank — the
        # composed form of `textpipe | stratified-budget-select` (r14
        # verdict "Next round #2"). The operator's coverage rule applies
        # unchanged: every source surviving stage 4 must be named (NULL
        # sources as '(null)'), so a typo'd dict raises here instead of
        # silently selecting nothing for a source.
        from ..queries.textops import stratified_budget_selection

        scored = with_tok.withColumn("__q", lexical_diversity(F.col("text")))
        mixed, sel_masses = _apply_selection(
            stratified_budget_selection(scored, stratified_budgets, "__q")
        )
        quality_stats = {
            "stratified_budget_tokens": {
                str(s): int(b) for s, b in stratified_budgets.items()
            },
            "stratified_selected_tokens": sel_masses,
        }
    elif dsir_stratified_budgets is not None:
        # caller-named per-source budgets filled by DSIR importance
        # toward the target — one model, one shuffle-free scoring pass,
        # per-source level-batched cuts (dsir_select_budget_stratified).
        from ..queries.textops import dsir_select_budget_stratified

        mixed, sel_masses = _apply_selection(
            dsir_select_budget_stratified(
                with_tok,
                dsir_target,
                dsir_stratified_budgets,
                seed=dsir_seed,
                n_tokens_col="n_tokens",
            )
        )
        quality_stats = {
            "dsir_stratified_budget_tokens": {
                str(s): int(b) for s, b in dsir_stratified_budgets.items()
            },
            "dsir_stratified_selected_tokens": sel_masses,
        }
    elif curriculum_phases is not None:
        # phase-ordered exclusive curriculum as the final selection: the
        # first phase skims the survivors' top lexical-diversity
        # tranche, each later phase the next; the phase column rides
        # into packing and the written corpus so the trainer replays
        # phases in schedule order.
        from ..queries.textops import curriculum_phase_selection

        scored = with_tok.withColumn("__q", lexical_diversity(F.col("text")))
        sel = tracked_cache(
            curriculum_phase_selection(scored, curriculum_phases, "__q")
        )
        phase_masses = {
            f"{r['phase']}/{r['source']}": int(r["m"])
            for r in sel.groupBy("phase", "source")
            .agg(F.max("cum_tokens").alias("m"))
            .collect()
        }
        mixed = tracked_cache(
            with_tok.join(sel.select("doc_id", "phase"), "doc_id")
        )
        quality_stats = {
            "curriculum_phases_spec": [
                {
                    "name": str(n),
                    "budgets": {str(k): int(v) for k, v in b.items()},
                }
                for n, b in curriculum_phases
            ],
            "curriculum_selected_tokens": dict(sorted(phase_masses.items())),
        }
    else:
        # r18 (guide §1.2/§2.4): ONE per-source aggregate-collect replaces
        # the in-plan totals -> min -> rates broadcast-join chain AND the
        # separate stage-4 clean count: n_clean = Σ per-source row counts,
        # target = min total, and the keep predicate becomes a literal
        # per-source disjunction. Arithmetic is unchanged step for step —
        # rate = double(min)/double(total) (one IEEE division), compared
        # against the same md5-derived h as double, with the old inner
        # join's NULL-source drop reproduced by the equality chain — so
        # the selected row set is identical; the mixed plan loses a second
        # read of the clean cache, a crossJoin and two broadcast
        # exchanges, and stage 5 runs one action instead of two.
        src_rows = (
            with_tok.groupBy("source")
            .agg(F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("c"))
            .collect()
        )
        n_clean = sum(int(r["c"]) for r in src_rows)
        totals = [int(r["t"]) for r in src_rows if r["t"] is not None]
        target = float(min(totals)) if totals else None
        keep = F.lit(False)
        for r in src_rows:
            if r["source"] is None or r["t"] is None or target is None:
                # the old inner join on source dropped NULL-source rows;
                # a NULL total made the rate NULL (rows dropped)
                continue
            rate_x = (target / float(int(r["t"]))) * 1000000.0
            keep = keep | (
                (F.col("source") == F.lit(r["source"]))
                & (F.col("h").cast("double") < F.lit(rate_x))
            )
        h = (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("bigint")
            % 1000000
        )
        mixed = tracked_cache(
            with_tok.withColumn("h", h).filter(keep).drop("h")
        )

    _lap("selection")

    # 6. packing: greedy-prefix sequences per source in doc_id order —
    # per (source, phase) under a curriculum, so no sequence ever spans
    # a phase boundary (a training batch belongs to exactly one phase)
    pack_keys = (
        ["source", "phase"] if curriculum_phases is not None else ["source"]
    )
    w = (
        Window.partitionBy(*pack_keys)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offset = F.sum("n_tokens").over(w) - F.col("n_tokens")
    packed = mixed.withColumn(
        "seq_id", F.floor(offset.cast("double") / budget).cast("bigint")
    )
    # r18 (guide §1.2): the packed-sequence count and the selected-row
    # count ride ONE aggregate over the packing window's output — the
    # per-(keys, seq_id) group count sums back to exactly the mixed row
    # count (packing is row-preserving) and the group count IS the old
    # select(...).distinct().count(); the separate n_mixed action is gone
    # and the mixed cache materializes inside this same job.
    _pk = packed.groupBy(*pack_keys, "seq_id").agg(F.count(F.lit(1)).alias("__c"))
    _pr = _pk.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).alias("rows"),
        F.count(F.lit(1)).alias("seqs"),
    ).first()
    n_mixed, n_sequences = int(_pr["rows"]), int(_pr["seqs"])
    _lap("packing")

    summary = {
        "input_docs": n_input,
        "after_quality": n_quality,
        "after_exact_dedup": n_exact,
        "after_near_dedup": n_neardup,
        "after_decontamination": n_clean,
        "after_mixture": n_mixed,
        "packed_sequences": n_sequences,
        # the measured decontamination-join decision (audit trail, same
        # shape incremental_join_refresh logs); stage counts above are
        # strategy-independent — all planner strategies are
        # row-multiset-identical
        "decontam_join": decontam_decision,
        "decontam_mode": "passage" if passage_decontam else "drop",
        "stage_walls": stage_walls,
        "selection_mode": (
            "dsir_budget"
            if dsir_budget_tokens is not None
            else "quality_equalize"
            if mixture_by_quality
            else "stratified_budgets"
            if stratified_budgets is not None
            else "dsir_stratified_budgets"
            if dsir_stratified_budgets is not None
            else "curriculum_phases"
            if curriculum_phases is not None
            else "source_equalize"
        ),
    }
    if passage_stats is not None:
        summary.update(passage_stats)
    if dsir_stats is not None:
        summary.update(dsir_stats)
    if quality_stats is not None:
        summary.update(quality_stats)
    if out_dir:
        out_cols = ["doc_id", "source", "lang", "n_tokens", "seq_id", "text"]
        part_cols = ["source"]
        if curriculum_phases is not None:
            out_cols.append("phase")
            part_cols = ["phase", "source"]
        packed.select(*out_cols).write.mode("overwrite").partitionBy(
            *part_cols
        ).parquet(os.path.join(out_dir, "packed_corpus"))
        with open(os.path.join(out_dir, "summary.json"), "w", encoding="utf-8") as f:
            json.dump(summary, f, indent=2)
    # every consumer of the stage pins (counts, the optional write) has run;
    # release them plus the library-internal caches (LSH candidate/shingle
    # sets) so repeated pipeline runs in one session don't accumulate entries
    release_tracked_caches()
    return summary
