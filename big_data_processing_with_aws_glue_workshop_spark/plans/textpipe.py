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
    # r17 (guide §1.2/§5): the input and quality-survivor counts are ONE
    # narrow aggregate over the scan — the r16 shape cached the ENTIRE raw
    # corpus just to count it and then count the filter (at 100 TB that
    # pinned the full text column twice: raw + survivors). Only the
    # survivors are worth caching; their cache materializes inside stage
    # 2's first action, so the separate count pass disappears too.
    counts = docs.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.count(F.when(F.length("text") >= min_chars, 1)).alias("n_quality"),
    ).first()
    n_input, n_quality = int(counts["n_input"]), int(counts["n_quality"])
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
    n_exact = exact.count()
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
    n_neardup = neardup.count()
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
        # most max(n_tokens - (N-1), 0), so ONE narrow aggregate over the
        # CACHED survivor frame (no explode, no shuffle — ~the eval
        # slice's token counts) bounds the eval shingle set. When even
        # the bound fits the broadcast threshold the planner never has to
        # evaluate the eval side; a giant eval suite falls through to the
        # measured ladder.
        n_tok = F.size(_tokens(F.col("text")))
        bound = (
            neardup.filter((F.col("doc_id") % _EVAL_MOD) == 0)
            .agg(
                F.coalesce(
                    F.sum(F.greatest(n_tok - (_CONTAM_N - 1), F.lit(0))), F.lit(0)
                ).alias("b")
            )
            .first()["b"]
        )
        decontam_decision = plan_equi_join(
            train_sh, eval_sh, ["shingle"], right_rows_upper_bound=int(bound)
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
        n_clean = clean.count()

    _lap("decontamination")

    # 5. selection on the SURVIVORS: DSIR budget mode (flag) ranks by
    # importance toward the target and cuts at the token budget;
    # default mode equalizes per-source token budgets
    with_tok = _with_tokens(clean)
    dsir_stats = None
    quality_stats = None

    def _apply_selection(sel):
        """Shared tail of every per-source selection branch (r15 review
        finding: it lived four times): per-source selected masses, the
        semi-join back to the survivor frame, and its count."""
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
        return picked, picked.count(), masses

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
        n_mixed = mixed.count()
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
        mixed, n_mixed, sel_masses = _apply_selection(
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
        mixed, n_mixed, sel_masses = _apply_selection(
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

        mixed, n_mixed, sel_masses = _apply_selection(
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
        n_mixed = mixed.count()
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
        totals = with_tok.groupBy("source").agg(
            F.sum("n_tokens").alias("total_tokens")
        )
        target = totals.agg(F.min("total_tokens").cast("double").alias("target"))
        rates = totals.crossJoin(F.broadcast(target)).select(
            "source", (F.col("target") / F.col("total_tokens")).alias("rate")
        )
        h = (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("bigint")
            % 1000000
        )
        mixed = tracked_cache(
            with_tok.withColumn("h", h)
            .join(F.broadcast(rates), "source")
            .filter(F.col("h").cast("double") < F.col("rate") * 1000000.0)
            .drop("h", "rate")
        )
        n_mixed = mixed.count()

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
    n_sequences = packed.select(*pack_keys, "seq_id").distinct().count()
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
