"""End-to-end CLI pipeline: the four jobs as a user would run them
(subprocess, fresh JVMs), bronze -> silver -> gold -> analytics."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from .rues_fixture import write_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_job(args: list[str]) -> dict:
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    out = subprocess.run(
        [sys.executable, "-m", "big_data_processing_with_aws_glue_workshop_spark.cli", *args],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_cli_full_pipeline(tmp_path):
    paths = write_fixture(tmp_path / "raw")
    bronze, silver, gold = str(tmp_path / "b"), str(tmp_path / "s"), str(tmp_path / "g")

    b = run_job(["bronze", "--input", paths["raw_csv"], "--output", bronze])
    assert b["job"] == "bronze"

    s = run_job(
        [
            "silver",
            "--bronze", bronze,
            "--catalogs", str(tmp_path / "raw"),
            "--output", silver,
            "--error-logs", str(tmp_path / "logs"),
            "--reference-year", "2025",
        ]
    )
    assert s["violations"]["matricula_null"] == 1
    assert s["violations"]["antiguedad_negativa"] == 1

    g = run_job(["gold", "--silver", silver, "--output", gold, "--today", "2025-06-30"])
    assert g["dim_rows"] == g["fact_rows"] == 55
    assert g["orphan_matriculas"] == 1  # the NULL-matricula row

    a = run_job(["analytics", "--gold", gold, "--query", "q1"])
    assert a["total_rows"] > 0
    assert a["rows"][0]["total_empresas_activas"] >= a["rows"][-1]["total_empresas_activas"]


def test_cli_zorder(spark, sf_dir, tmp_path):
    """zorder subcommand rewrites a parquet table with unchanged content
    (the pruning quality itself is measured in test_layout.py)."""
    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    out = str(tmp_path / "z")
    main(
        [
            "zorder",
            "--input", f"{sf_dir}/orders.parquet",
            "--output", out,
            "--by", "o_custkey", "o_orderkey",
            "--num-files", "4",
        ]
    )
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dst = spark.read.parquet(out)
    assert dst.count() == src.count()
    assert sorted(dst.columns) == sorted(src.columns)


def test_cli_passage_decontam(spark, tmp_path, capsys):
    """passage-decontam subcommand e2e: a benchmark-leaked passage is
    excised at any benchmark alignment, the rest of the document
    survives, stats summarize the rewrite."""
    import json as _json

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    leak = "l1 l2 l3 l4 l5 l6 l7 l8"
    spark.createDataFrame(
        [
            (1, f"{leak} keep1 keep2"),
            (2, "c1 c2 c3 c4 c5 c6 c7 c8 tail"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(tmp_path / "docs"))
    spark.createDataFrame(
        [(f"pre {leak} post",)], "text string"
    ).coalesce(1).write.parquet(str(tmp_path / "bench"))

    main([
        "passage-decontam",
        "--input", str(tmp_path / "docs"),
        "--benchmark", str(tmp_path / "bench"),
        "--output", str(tmp_path / "out"),
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["docs"] == 2 and out["passages"] == 2 and out["excised"] == 1
    got = {
        r["doc_id"]: r["text_deduped"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got[1] == "keep1 keep2"
    assert got[2] == "c1 c2 c3 c4 c5 c6 c7 c8 tail"


def test_cli_epoch_mixture_and_component_split(spark, tmp_path, capsys):
    """The two r12 curation jobs e2e: epoch-mixture writes exactly the
    planned multiplicities (3 epochs + residual on the heavy source);
    component-split assigns every doc once with near-dups co-split."""
    import json as _json

    import pyspark.sql.functions as F

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    rows = []
    for i in range(10):
        rows.append((i, "prem", " ".join(f"p{i}_{j}" for j in range(10))))
    for i in range(100, 300):
        rows.append((i, "web", " ".join(f"w{i}_{j}" for j in range(10))))
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(2).write.parquet(str(tmp_path / "docs"))

    main([
        "epoch-mixture",
        "--input", str(tmp_path / "docs"),
        "--output", str(tmp_path / "mixed"),
        "--weights", '{"prem": 1.0, "web": 1.0}',
        "--total-tokens", "700",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    plan = {p["source"]: p for p in out["plan"]}
    assert plan["prem"]["epochs"] == 3
    mixed = spark.read.parquet(str(tmp_path / "mixed"))
    assert out["output_rows"] == mixed.count()
    # token mass of the output equals the plan, per source
    mass = {
        r["source"]: r["n"] * 10  # fixture: every doc is 10 tokens
        for r in mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert mass == {p["source"]: p["planned_tokens"] for p in out["plan"]}

    main([
        "component-split",
        "--input", str(tmp_path / "docs"),
        "--output", str(tmp_path / "split"),
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["docs"] == 210 and sum(out["splits"].values()) == 210


def test_textpipe_passage_decontam_stage(spark, tmp_path):
    """The passage-excision alternative to stage 4 (r12 verdict order
    #8): with ``passage_decontam=True`` a training doc that leaks an
    eval 8-word passage is REWRITTEN (leak excised, document kept)
    where the doc-drop stage removes it whole; downstream stage
    invariants (monotone counts, eval exclusion, no exact dups, packed
    output) hold unchanged. Planted corpus so the leak is certain:
    doc 1 starts with the exact 8-word passage an eval doc (id 17)
    contains mid-text."""
    import pyspark.sql.functions as F

    from big_data_processing_with_aws_glue_workshop_spark.plans.textpipe import run_text_pipeline
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import _EVAL_MOD

    leak = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = []
    # eval doc (doc_id % 17 == 0): unique filler around the leak span,
    # deliberately NOT block-aligned on the eval side (sliding windows
    # must find it anyway)
    rows.append(
        (
            17,
            "s",
            "en",
            " ".join(f"e{j}word" for j in range(5))
            + f" {leak} "
            + " ".join(f"f{j}word" for j in range(20)),
        )
    )
    # doc 1: leak block-aligned at block 0 + unique tail -> rewritten
    rows.append((1, "s", "en", f"{leak} " + " ".join(f"u1x{j}" for j in range(32))))
    # clean unique docs
    for i in range(2, 30):
        if i % _EVAL_MOD == 0:
            continue
        rows.append((i, "s", "en", " ".join(f"u{i}x{j}" for j in range(40))))
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    ).write.parquet(str(sf / "documents.parquet"))

    drop = run_text_pipeline(spark, str(sf))
    out = str(tmp_path / "pipe")
    span = run_text_pipeline(spark, str(sf), out_dir=out, passage_decontam=True)

    # drop mode loses doc 1 (shared 5-grams with the eval doc); span
    # mode keeps it rewritten
    assert drop["decontam_mode"] == "drop"
    assert span["decontam_mode"] == "passage"
    assert span["after_decontamination"] == drop["after_decontamination"] + 1
    assert span["passages_excised"] == 1
    assert span["docs_rewritten"] == 1
    assert span["docs_dropped_fully_leaked"] == 0
    # both modes log a measured planner decision; the eval side is tiny
    # so both pin broadcasts
    assert drop["decontam_join"]["strategy"] == "broadcast"
    assert span["decontam_join"]["strategy"] == "broadcast"

    # downstream invariants unchanged: monotone counts, packed output
    assert (
        span["input_docs"]
        >= span["after_quality"]
        >= span["after_exact_dedup"]
        >= span["after_near_dedup"]
        >= span["after_decontamination"]
        >= span["after_mixture"]
        > 0
    )
    corpus = spark.read.parquet(f"{out}/packed_corpus")
    assert corpus.count() == span["after_mixture"]
    assert corpus.filter(F.col("doc_id") % _EVAL_MOD == 0).count() == 0
    assert (
        corpus.select(F.md5(F.col("text").cast("binary"))).distinct().count()
        == span["after_mixture"]
    )
    # doc 1 survived WITH the leak excised and its own words intact
    doc1 = corpus.filter(F.col("doc_id") == 1).collect()
    assert len(doc1) == 1
    assert "alpha bravo" not in doc1[0]["text"]
    assert doc1[0]["text"].startswith("u1x0 ")
    # and its n_tokens reflects the REWRITTEN text (downstream stages
    # read the excised document, not the original)
    assert doc1[0]["n_tokens"] == 32


def _two_vocab_sf(spark, tmp_path):
    """48 docs, two sources with disjoint content vocabularies ('code'
    vs 'prose'), each doc 40 tokens with per-doc unique fillers
    interleaved so no near-dup pair exists; eval ids (%17==0) skipped so
    decontamination drops nothing. Returns (sf_dir, target_path) where
    the target corpus speaks the code vocabulary."""
    rows = []
    did = 1
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import _EVAL_MOD

    for source, stem in (("code", "code"), ("prose", "word")):
        made = 0
        while made < 24:
            if did % _EVAL_MOD == 0:
                did += 1
                continue
            toks = []
            for j in range(20):
                toks.append(f"{stem}{j}")
                toks.append(f"u{did}{stem[0]}{j}")
            rows.append((did, source, "en", " ".join(toks)))
            did += 1
            made += 1
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    ).write.parquet(str(sf / "documents.parquet"))
    tgt = tmp_path / "target"
    spark.createDataFrame(
        [(k, " ".join(f"code{j}" for j in range(20))) for k in range(4)],
        "tid long, text string",
    ).coalesce(1).write.parquet(str(tgt))
    return str(sf), str(tgt)


@pytest.mark.slow
def test_textpipe_dsir_selection_stage(spark, tmp_path):
    """r13 verdict "Next round #5": stage 5's DSIR budget mode — "select
    the best N tokens that look like the target" as the pipeline's final
    selection — composes behind a flag the way passage_decontam did.
    With the flag on: selected mass <= budget, the selection is enriched
    toward the target vocabulary, and stages 1-4 are bit-identical to
    the default run; with the flag off nothing changes."""
    import pyspark.sql.functions as F

    from big_data_processing_with_aws_glue_workshop_spark.plans.textpipe import run_text_pipeline

    sf, tgt = _two_vocab_sf(spark, tmp_path)
    target = spark.read.parquet(tgt)

    default = run_text_pipeline(spark, sf)
    assert default["selection_mode"] == "source_equalize"
    assert "dsir_selected_tokens" not in default

    out = str(tmp_path / "pipe")
    budget = 960  # half of the 48*40-token survivor mass
    dsir = run_text_pipeline(
        spark, sf, out_dir=out, dsir_target=target,
        dsir_budget_tokens=budget, dsir_seed=5,
    )
    assert dsir["selection_mode"] == "dsir_budget"
    assert dsir["dsir_budget_tokens"] == budget
    assert 0 < dsir["dsir_selected_tokens"] <= budget
    # upstream stages (1-4) are untouched by the selection swap
    for k in (
        "input_docs",
        "after_quality",
        "after_exact_dedup",
        "after_near_dedup",
        "after_decontamination",
    ):
        assert dsir[k] == default[k], k
    assert dsir["after_decontamination"] >= dsir["after_mixture"] > 0
    # the packed output is the selected set
    corpus = spark.read.parquet(f"{out}/packed_corpus")
    assert corpus.count() == dsir["after_mixture"]
    # enrichment: the importance ranking pulls the target's vocabulary —
    # code-source docs must dominate the selection
    by_src = {
        r["source"]: r["n"]
        for r in corpus.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src.get("code", 0) > by_src.get("prose", 0)
    # flag validation: budget without a target is a caller error
    with pytest.raises(ValueError, match="dsir_target"):
        run_text_pipeline(spark, sf, dsir_budget_tokens=10)


@pytest.mark.slow
def test_textpipe_quality_mixture_stage(spark, tmp_path):
    """r14: stage 5's quality mode — same equalized per-source token
    allocation as the default, filled by lexical-diversity rank
    (stratified_budget_selection) instead of by hash. Upstream stages
    bit-identical; per-source selected mass <= the shared budget; within
    each source the selection is its TOP-diversity prefix; mutually
    exclusive with the DSIR mode."""
    import pyspark.sql.functions as F

    from big_data_processing_with_aws_glue_workshop_spark.plans.textpipe import run_text_pipeline

    sf, tgt = _two_vocab_sf(spark, tmp_path)
    default = run_text_pipeline(spark, sf)
    out = str(tmp_path / "pipe_q")
    q = run_text_pipeline(spark, sf, out_dir=out, mixture_by_quality=True)
    assert q["selection_mode"] == "quality_equalize"
    for k in (
        "input_docs",
        "after_quality",
        "after_exact_dedup",
        "after_near_dedup",
        "after_decontamination",
    ):
        assert q[k] == default[k], k
    assert q["after_decontamination"] >= q["after_mixture"] > 0
    # every source's selected mass fits the shared equalized budget
    budget = q["mixture_budget_tokens"]
    assert budget > 0
    assert all(m <= budget for m in q["mixture_selected_tokens"].values())
    # within each source the kept docs are its top-diversity prefix: in
    # the fixture every doc has 40 tokens with 20+N distinct, identical
    # diversity — so the cut count per source is exactly budget//40
    corpus = spark.read.parquet(f"{out}/packed_corpus")
    per_src = {
        r["source"]: r["n"]
        for r in corpus.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert all(n == budget // 40 for n in per_src.values()), per_src
    # the two selection flags cannot combine
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mutually"):
        run_text_pipeline(
            spark, sf, mixture_by_quality=True, dsir_budget_tokens=10,
        )


def test_cli_textpipe_dsir_flags(spark, tmp_path, capsys):
    """textpipe --dsir-budget/--dsir-target e2e through the CLI."""
    import json as _json

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    sf, tgt = _two_vocab_sf(spark, tmp_path)
    main([
        "textpipe",
        "--sf-dir", sf,
        "--dsir-budget", "960",
        "--dsir-target", tgt,
        "--dsir-seed", "5",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["selection_mode"] == "dsir_budget"
    assert 0 < out["dsir_selected_tokens"] <= 960
    # r14 review findings: flag combinations refused BEFORE any Spark
    # work — a lone --dsir-target used to be silently ignored, and the
    # conflicting selection pair used to run four stages before raising
    with pytest.raises(SystemExit, match="without --dsir-budget"):
        main(["textpipe", "--sf-dir", sf, "--dsir-target", tgt])
    with pytest.raises(SystemExit, match="mutually exclusive"):
        main([
            "textpipe", "--sf-dir", sf, "--quality-mixture",
            "--dsir-budget", "960", "--dsir-target", tgt,
        ])


def test_textpipe_quality_mixture_null_source(spark, tmp_path):
    """r14 ADVICE finding, closed: quality-mixture mode with NULL
    `source` values used to build a None-keyed budgets dict that
    stratified_budget_selection str()'d to 'None' and then refused as
    "missing from budgets: ['(null)']" — AFTER stages 1-4 had executed.
    The totals now key by the operator's own sentinel, so NULL-source
    docs get a named '(null)' allocation and the run completes."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.textpipe import run_text_pipeline
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import _EVAL_MOD

    rows = []
    did = 1
    for source in ("web", None):
        made = 0
        while made < 6:
            if did % _EVAL_MOD == 0:
                did += 1
                continue
            rows.append(
                (did, source, "en", " ".join(f"u{did}x{j}" for j in range(40)))
            )
            did += 1
            made += 1
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    ).write.parquet(str(sf / "documents.parquet"))

    s = run_text_pipeline(spark, str(sf), mixture_by_quality=True)
    assert s["selection_mode"] == "quality_equalize"
    assert set(s["mixture_selected_tokens"]) == {"web", "(null)"}
    budget = s["mixture_budget_tokens"]
    assert budget > 0
    assert all(m <= budget for m in s["mixture_selected_tokens"].values())


@pytest.mark.slow
def test_textpipe_stratified_budgets_stage(spark, tmp_path):
    """r15 (r14 verdict "Next round #2"): stage 5 fills CALLER-NAMED
    per-source token budgets by quality rank in ONE pipeline run —
    previously `textpipe` + `stratified-budget-select` took two CLI
    invocations. Upstream stages bit-identical to the default run; every
    source's selected mass <= ITS OWN budget; the operator's coverage
    rule surfaces unnamed sources."""
    import pyspark.sql.functions as F

    from big_data_processing_with_aws_glue_workshop_spark.plans.textpipe import run_text_pipeline

    sf, _ = _two_vocab_sf(spark, tmp_path)
    default = run_text_pipeline(spark, sf)

    out = str(tmp_path / "pipe_sb")
    budgets = {"code": 400, "prose": 200}  # asymmetric on purpose
    s = run_text_pipeline(spark, sf, out_dir=out, stratified_budgets=budgets)
    assert s["selection_mode"] == "stratified_budgets"
    for k in (
        "input_docs",
        "after_quality",
        "after_exact_dedup",
        "after_near_dedup",
        "after_decontamination",
    ):
        assert s[k] == default[k], k
    assert s["stratified_budget_tokens"] == {"code": 400, "prose": 200}
    # every source's selected mass fits ITS OWN budget
    for src, mass in s["stratified_selected_tokens"].items():
        assert mass <= budgets[src], (src, mass)
    # fixture docs are 40 tokens each with identical diversity, so the
    # per-source kept count is exactly budget//40 — the asymmetry must
    # show up in the output
    corpus = spark.read.parquet(f"{out}/packed_corpus")
    per_src = {
        r["source"]: r["n"]
        for r in corpus.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per_src == {"code": 10, "prose": 5}, per_src
    assert corpus.count() == s["after_mixture"]
    # coverage rule: a budgets dict missing a surviving source raises
    # (after stages 1-4 — the dict's KEYS can't be checked against the
    # survivor set any earlier; the type/negativity checks are eager)
    with pytest.raises(ValueError, match="missing from budgets"):
        run_text_pipeline(spark, sf, stratified_budgets={"code": 400})
    # eager shape validation before any Spark work
    with pytest.raises(ValueError, match="must be a dict"):
        run_text_pipeline(spark, "/nonexistent", stratified_budgets=[1, 2])


@pytest.mark.slow
def test_textpipe_dsir_stratified_budgets_stage(spark, tmp_path):
    """r15: stage 5 fills caller-named per-source budgets along the DSIR
    importance ranking toward the target (dsir_select_budget_stratified)
    — the {per-source} x {DSIR} corner of the selection matrix composed
    into the pipeline. Upstream stages bit-identical; per-source mass <=
    its budget; both sources keep representation (unlike the GLOBAL dsir
    budget mode, which starves the off-target source)."""
    import pyspark.sql.functions as F

    from big_data_processing_with_aws_glue_workshop_spark.plans.textpipe import run_text_pipeline

    sf, tgt = _two_vocab_sf(spark, tmp_path)
    target = spark.read.parquet(tgt)
    default = run_text_pipeline(spark, sf)

    out = str(tmp_path / "pipe_dsb")
    budgets = {"code": 400, "prose": 200}
    s = run_text_pipeline(
        spark, sf, out_dir=out, dsir_target=target,
        dsir_stratified_budgets=budgets, dsir_seed=5,
    )
    assert s["selection_mode"] == "dsir_stratified_budgets"
    for k in (
        "input_docs",
        "after_quality",
        "after_exact_dedup",
        "after_near_dedup",
        "after_decontamination",
    ):
        assert s[k] == default[k], k
    for src, mass in s["dsir_stratified_selected_tokens"].items():
        assert mass <= budgets[src], (src, mass)
    # the stratified contract keeps BOTH sources represented at their own
    # budgets (40-token docs -> budget//40 docs each)
    corpus = spark.read.parquet(f"{out}/packed_corpus")
    per_src = {
        r["source"]: r["n"]
        for r in corpus.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per_src == {"code": 10, "prose": 5}, per_src
    # flag validation: budgets without a target is a caller error, eager
    with pytest.raises(ValueError, match="dsir_target"):
        run_text_pipeline(spark, sf, dsir_stratified_budgets=budgets)
    with pytest.raises(ValueError, match="mutually exclusive"):
        run_text_pipeline(
            spark, sf, dsir_target=target,
            dsir_stratified_budgets=budgets, stratified_budgets=budgets,
        )


@pytest.mark.slow
def test_textpipe_curriculum_stage(spark, tmp_path):
    """r15: stage 5 runs the phase-ordered exclusive curriculum —
    upstream stages bit-identical to the default run, phases exclusive,
    per-(phase, source) masses within their budgets, no packed sequence
    spans a phase boundary, and the written corpus is phase-partitioned
    with the phase column readable back."""
    import pyspark.sql.functions as F

    from big_data_processing_with_aws_glue_workshop_spark.plans.textpipe import run_text_pipeline

    sf, _ = _two_vocab_sf(spark, tmp_path)
    default = run_text_pipeline(spark, sf)

    out = str(tmp_path / "pipe_cur")
    phases = [("anneal", {"code": 120, "prose": 120}),
              ("bulk", {"code": 400, "prose": 200})]
    s = run_text_pipeline(spark, sf, out_dir=out, curriculum_phases=phases)
    assert s["selection_mode"] == "curriculum_phases"
    for k in (
        "input_docs",
        "after_quality",
        "after_exact_dedup",
        "after_near_dedup",
        "after_decontamination",
    ):
        assert s[k] == default[k], k
    # per-(phase, source) masses within their budgets; fixture docs are
    # 40 tokens so anneal takes 3 docs/source, bulk the next 10/5
    masses = s["curriculum_selected_tokens"]
    assert masses["anneal/code"] <= 120 and masses["anneal/prose"] <= 120
    assert masses["bulk/code"] <= 400 and masses["bulk/prose"] <= 200
    corpus = spark.read.parquet(f"{out}/packed_corpus")
    assert corpus.count() == s["after_mixture"]
    per = {
        (r["phase"], r["source"]): r["n"]
        for r in corpus.groupBy("phase", "source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per == {
        ("anneal", "code"): 3, ("anneal", "prose"): 3,
        ("bulk", "code"): 10, ("bulk", "prose"): 5,
    }, per
    # exclusivity: every doc appears exactly once across phases
    assert corpus.select("doc_id").distinct().count() == corpus.count()
    # no sequence spans a phase boundary: (source, seq_id) pairs are
    # unique per phase grouping key
    assert (
        corpus.select("phase", "source", "seq_id").distinct().count()
        == s["packed_sequences"]
    )
    # eager validation
    with pytest.raises(ValueError, match="mutually exclusive"):
        run_text_pipeline(
            spark, sf, curriculum_phases=phases, mixture_by_quality=True
        )
    with pytest.raises(ValueError, match="duplicate phase names"):
        run_text_pipeline(
            spark, sf,
            curriculum_phases=[("p", {"a": 1}), ("p", {"a": 1})],
        )
    with pytest.raises(ValueError, match="non-empty"):
        run_text_pipeline(spark, sf, curriculum_phases=[])


@pytest.mark.slow
def test_cli_textpipe_stratified_flags(spark, tmp_path, capsys):
    """textpipe --stratified-budgets / --dsir-stratified-budgets e2e
    through the CLI, plus the eager refusals (flag conflicts and budget
    parse errors surface before any Spark work)."""
    import json as _json

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    sf, tgt = _two_vocab_sf(spark, tmp_path)
    main([
        "textpipe", "--sf-dir", sf,
        "--stratified-budgets", "code=400,prose=200",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["selection_mode"] == "stratified_budgets"
    assert out["stratified_selected_tokens"]["code"] <= 400
    assert out["stratified_selected_tokens"]["prose"] <= 200

    main([
        "textpipe", "--sf-dir", sf,
        "--dsir-stratified-budgets", "code=400,prose=200",
        "--dsir-target", tgt, "--dsir-seed", "5",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["selection_mode"] == "dsir_stratified_budgets"
    assert out["dsir_stratified_selected_tokens"]["prose"] <= 200

    # eager refusals
    with pytest.raises(SystemExit, match="mutually exclusive"):
        main([
            "textpipe", "--sf-dir", sf, "--quality-mixture",
            "--stratified-budgets", "code=1,prose=1",
        ])
    with pytest.raises(SystemExit, match="requires --dsir-target"):
        main([
            "textpipe", "--sf-dir", sf,
            "--dsir-stratified-budgets", "code=1,prose=1",
        ])
    # r14 ADVICE: a non-integer token count gets the same clean
    # SystemExit surface as a missing '='
    with pytest.raises(SystemExit, match="not an integer"):
        main([
            "textpipe", "--sf-dir", sf,
            "--stratified-budgets", "code=10k,prose=1",
        ])
    # r15 curriculum flag: happy path threads ordered phases through
    main([
        "textpipe", "--sf-dir", sf,
        "--curriculum-phase", "anneal:code=120,prose=120",
        "--curriculum-phase", "bulk:code=400,prose=200",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["selection_mode"] == "curriculum_phases"
    assert [p["name"] for p in out["curriculum_phases_spec"]] == [
        "anneal", "bulk"
    ]
    assert out["curriculum_selected_tokens"]["anneal/code"] <= 120
    # ...and mutual exclusion + parse refusals, eager
    with pytest.raises(SystemExit, match="mutually exclusive"):
        main([
            "textpipe", "--sf-dir", sf, "--quality-mixture",
            "--curriculum-phase", "p:code=1,prose=1",
        ])
    with pytest.raises(SystemExit, match="not name:src=tokens"):
        main([
            "textpipe", "--sf-dir", sf, "--curriculum-phase", "code=1",
        ])
    with pytest.raises(SystemExit, match="names repeat"):
        main([
            "textpipe", "--sf-dir", sf,
            "--curriculum-phase", "p:code=1,prose=1",
            "--curriculum-phase", "p:code=2,prose=2",
        ])


def test_textpipe_end_to_end(spark, sf_dir, tmp_path):
    """The composed training-data pipeline: stage counts monotonically
    decrease, stage invariants hold on the final corpus, output written."""
    import json

    import pyspark.sql.functions as F

    from big_data_processing_with_aws_glue_workshop_spark.plans.textpipe import run_text_pipeline
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import _EVAL_MOD

    out = str(tmp_path / "pipe")
    s = run_text_pipeline(spark, sf_dir, out_dir=out)
    assert (
        s["input_docs"]
        >= s["after_quality"]
        >= s["after_exact_dedup"]
        >= s["after_near_dedup"]
        >= s["after_decontamination"]
        >= s["after_mixture"]
        > 0
    )
    assert s["packed_sequences"] > 0
    # r15: per-stage wall clocks ride the summary (the counts already
    # materialize each stage once, so the laps are free observability)
    assert set(s["stage_walls"]) == {
        "scan", "quality", "exact_dedup", "near_dedup",
        "decontamination", "selection", "packing",
    }
    assert all(v >= 0 for v in s["stage_walls"].values())
    corpus = spark.read.parquet(f"{out}/packed_corpus")
    assert corpus.count() == s["after_mixture"]
    # invariant: no exact duplicates survive
    assert (
        corpus.select(F.md5(F.col("text").cast("binary"))).distinct().count()
        == s["after_mixture"]
    )
    # invariant: the eval slice never reaches the training corpus
    assert corpus.filter(F.col("doc_id") % _EVAL_MOD == 0).count() == 0
    # the decontamination join runs through the measured planner (the
    # r11 verdict's second-consumer order): the eval shingle set is
    # small by construction, so the probe must pin a broadcast — the
    # training-side shingles never shuffle for this join — and the
    # decision is logged for audit
    assert s["decontam_join"]["strategy"] == "broadcast"
    assert s["decontam_join"]["right_rows"] > 0
    with open(f"{out}/summary.json", encoding="utf-8") as f:
        assert json.load(f) == s


def test_bench_headline_names_resolve():
    """Every bench.py HEADLINE name must exist in the registry — a renamed
    or demoted-and-deleted query would otherwise silently drop out of the
    per-round BENCH record (bench filters unknown names instead of
    failing)."""
    import bench
    from big_data_processing_with_aws_glue_workshop_spark.queries import QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"stale bench HEADLINE entries: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE)), "duplicate names"


def test_bench_segments_verdict_adjudicates_records():
    """r16 (r15 verdict #3): record adjudication is mechanical, not
    judgment — a run whose interleaved segment calibrations stay within
    the flat bound is record-grade, one that drifted past it is labeled
    non-record, and a pre-segments file returns None (nothing to
    adjudicate with). Constructed from the two real r15 close-out runs:
    the accepted run's segments (max/min 1.21) and the hand-discarded
    run 1 (2.14 -> 1.41 = 1.52x drift)."""
    import bench

    flat_segs = [
        {"after": 0, "sec": 1.12}, {"after": 20, "sec": 1.36},
        {"after": 40, "sec": 1.25}, {"after": 60, "sec": 1.18},
        {"after": 80, "sec": 1.30}, {"after": 100, "sec": 1.21},
    ]
    v = bench.segments_verdict(flat_segs)
    assert v["flat"] is True
    assert v["max_over_min"] == pytest.approx(1.36 / 1.12, abs=1e-3)

    drifting_segs = [
        {"after": 0, "sec": 2.14}, {"after": 20, "sec": 1.95},
        {"after": 40, "sec": 1.70}, {"after": 60, "sec": 1.55},
        {"after": 80, "sec": 1.48}, {"after": 100, "sec": 1.41},
    ]
    v = bench.segments_verdict(drifting_segs)
    assert v["flat"] is False
    assert v["max_over_min"] == pytest.approx(2.14 / 1.41, abs=1e-3)

    # boundary: exactly at the bound is still flat (<=)
    v = bench.segments_verdict(
        [{"after": 0, "sec": 1.0}, {"after": 20, "sec": 1.3}], bound=1.3
    )
    assert v["flat"] is True

    # pre-segments files: nothing to adjudicate with
    assert bench.segments_verdict([])["flat"] is None
    assert bench.segments_verdict(None)["flat"] is None
    assert bench.segments_verdict([{"after": 0, "sec": 1.2}])["flat"] is None


def test_bench_diff_calibration_normalizes_flags():
    """A uniformly slower box (calib ratio 1.6x) must NOT flag unchanged
    queries, while a genuine plan regression (slowdown far beyond the box
    factor) must still flag — and with no calibration fields the diff
    falls back to raw ratios (r9: three same-code suite runs spanned
    65.3-82.6 s on ambient box drift alone)."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
        ),
    )
    from bench_diff import calib_factor, diff

    prior = {
        "queries": {"steady": 1.0, "regressed": 1.0},
        "calib_pre": 1.0,
        "calib_post": 1.0,
    }
    # box 1.6x slower: 'steady' scales with the box, 'regressed' blows
    # past it (raw 4.0x, normalized 2.5x)
    current = {
        "queries": {"steady": 1.6, "regressed": 4.0},
        "calib_pre": 1.5,
        "calib_post": 1.7,
    }
    factor = calib_factor(prior, current)
    assert factor == pytest.approx(1.6)
    d = diff(prior, current, flag_ratio=1.5, abs_floor=0.2, factor=factor)
    assert d["flagged"] == ["regressed"]

    # without calibration fields, the same numbers flag both (raw ratios)
    raw_prior = {"queries": prior["queries"]}
    raw_current = {"queries": current["queries"]}
    assert calib_factor(raw_prior, raw_current) is None
    d_raw = diff(raw_prior, raw_current, flag_ratio=1.5, abs_floor=0.2)
    assert set(d_raw["flagged"]) == {"steady", "regressed"}


def test_cli_refresh_incremental_upsert(spark, tmp_path, capsys):
    """refresh subcommand: two landings, second run reads only the new
    file and upserts it (keep-latest on the order column)."""
    import json as _json
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.cli import main
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        read_refreshed,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    args = [
        "refresh",
        "--pattern", str(landing / "*.parquet"),
        "--bookmark", str(tmp_path / "bm.json"),
        "--target", str(tmp_path / "tbl"),
        "--keys", "id",
        "--order-col", "ts",
    ]

    def land(name, rows):
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame(rows, columns=["id", "v", "ts"])),
            str(landing / name),
        )

    land("b1.parquet", [(1, "a", 1), (2, "b", 1)])
    main(args)
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1 == {"job": "refresh", "new_files": 1, "target_rows": 2}

    land("b2.parquet", [(2, "b2", 2), (3, "c", 2)])
    main(args)
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2 == {"job": "refresh", "new_files": 1, "target_rows": 3}
    got = {r["id"]: r["v"] for r in read_refreshed(spark, str(tmp_path / "tbl")).collect()}
    assert got == {1: "a", 2: "b2", 3: "c"}


def test_cli_dedup_refresh(spark, tmp_path, capsys):
    """dedup-refresh subcommand: two landings; the second drops the
    re-crawled duplicate against the standing digest set and appends only
    the genuinely-new doc."""
    import json as _json
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.cli import main
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        read_deduped,
    )

    landing = tmp_path / "crawl"
    landing.mkdir()
    args = [
        "dedup-refresh",
        "--pattern", str(landing / "*.parquet"),
        "--bookmark", str(tmp_path / "bm.json"),
        "--target", str(tmp_path / "corpus"),
    ]

    def land(name, rows):
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame(rows, columns=["doc_id", "text"]),
                preserve_index=False,
            ),
            str(landing / name),
        )

    land("c1.parquet", [(1, "alpha"), (2, "beta"), (3, "alpha")])
    main(args)
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1 == {
        "job": "dedup-refresh", "new_files": 1, "new_docs": 3,
        "accepted": 2, "dropped_within": 1, "dropped_vs_corpus": 0,
    }

    land("c2.parquet", [(4, "beta"), (5, "gamma")])
    main(args)
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2 == {
        "job": "dedup-refresh", "new_files": 1, "new_docs": 2,
        "accepted": 1, "dropped_within": 0, "dropped_vs_corpus": 1,
    }
    got = {r["text"] for r in read_deduped(spark, str(tmp_path / "corpus")).collect()}
    assert got == {"alpha", "beta", "gamma"}


def test_cli_bpe_learn(spark, tmp_path, capsys):
    """bpe-learn subcommand: learns merges from a tiny document table and
    writes the ordered merge list JSON; the first merge must be the most
    frequent adjacent pair of the corpus."""
    import json as _json
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    docs = tmp_path / "docs.parquet"
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                [(1, "aaab aaab aaab"), (2, "aaab ccc")],
                columns=["doc_id", "text"],
            ),
            preserve_index=False,
        ),
        str(docs),
    )
    out_path = tmp_path / "merges.json"
    main([
        "bpe-learn",
        "--input", str(docs),
        "--output", str(out_path),
        "--n-merges", "3",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["job"] == "bpe-learn" and out["n_merges"] == 3
    merges = _json.loads(out_path.read_text())["merges"]
    # "aa" appears 2x per "aaab" occurrence (4 words) = freq 8, the max
    assert merges[0] == ["a", "a"]
    assert len(merges) == 3


def test_cli_neardup_refresh(spark, tmp_path, capsys):
    """neardup-refresh subcommand: a lightly-edited re-crawl is dropped
    against the standing LSH index on the second landing."""
    import json as _json
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.cli import main
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        read_deduped,
    )

    landing = tmp_path / "crawl"
    landing.mkdir()
    args = [
        "neardup-refresh",
        "--pattern", str(landing / "*.parquet"),
        "--bookmark", str(tmp_path / "bm.json"),
        "--target", str(tmp_path / "corpus"),
        "--sim-threshold", "0.5",
    ]

    def land(name, rows):
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame(rows, columns=["doc_id", "text"]),
                preserve_index=False,
            ),
            str(landing / name),
        )

    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls softly on quiet village roofs and children watch")
    other = ("completely different prose about columnar shuffles and "
             "broadcast joins inside a distributed query engine runtime")
    land("c1.parquet", [(1, base), (2, other)])
    main(args)
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["accepted"] == 2 and out1["dropped_vs_corpus"] == 0

    land("c2.parquet", [(9, base.replace("children watch", "children wave"))])
    main(args)
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2 == {
        "job": "neardup-refresh", "new_files": 1, "new_docs": 1,
        "accepted": 0, "dropped_within": 0, "dropped_vs_corpus": 1,
    }
    got = {r["doc_id"] for r in read_deduped(spark, str(tmp_path / "corpus")).collect()}
    assert got == {1, 2}


def test_cli_dedup_refresh_drift_gate(spark, tmp_path, capsys):
    """--drift: the first wave seeds the histogram state, the second
    reports PSI against it — ingest -> dedup -> drift gate, one command."""
    import json as _json
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    landing = tmp_path / "crawl"
    landing.mkdir()
    args = [
        "dedup-refresh",
        "--pattern", str(landing / "*.parquet"),
        "--bookmark", str(tmp_path / "bm.json"),
        "--target", str(tmp_path / "corpus"),
        "--drift",
    ]

    def land(name, rows):
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame(rows, columns=["doc_id", "text"]),
                preserve_index=False,
            ),
            str(landing / name),
        )

    land("c1.parquet", [(i, "word " * (8 + i % 3)) for i in range(40)])
    main(args)
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["drift"]["first_refresh"] and out1["drift"]["psi"] == {}

    # second wave: same length distribution -> PSI reads stable
    land("c2.parquet", [(100 + i, "term " * (8 + i % 3)) for i in range(40)])
    main(args)
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not out2["drift"]["first_refresh"]
    assert out2["drift"]["psi"]["all"] < 0.10

    # third wave: 16x longer docs -> significant drift
    land("c3.parquet", [(200 + i, "token " * (128 + i % 3)) for i in range(40)])
    main(args)
    out3 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out3["drift"]["psi"]["all"] > 0.25


def test_cli_agg_refresh_keep_versions_time_travel(spark, tmp_path, capsys):
    """--keep-versions reaches the snapshot retention from the supported
    CLI entry point (the same unreachable-from-the-API class the r9
    review flagged on the streaming drift gate): two refreshes with
    --keep-versions 2 leave both state versions readable."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.cli import main
    from big_data_processing_with_aws_glue_workshop_spark.streaming.sinks import (
        list_versions,
        read_version,
    )

    landing = tmp_path / "facts"
    landing.mkdir()
    target = str(tmp_path / "state")
    args = [
        "agg-refresh",
        "--pattern", str(landing / "*.parquet"),
        "--bookmark", str(tmp_path / "bm.json"),
        "--target", target,
        "--keys", "svc",
        "--agg", "n=count:*",
        "--keep-versions", "2",
    ]

    def land(name, rows):
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame(rows, columns=["svc", "latency"]),
                preserve_index=False,
            ),
            str(landing / name),
        )

    land("f1.parquet", [("api", 1.0), ("api", 2.0)])
    main(args)
    land("f2.parquet", [("db", 3.0)])
    main(args)
    capsys.readouterr()

    assert list_versions(target) == [0, 1]
    v0 = {(r["svc"], r["n"]) for r in read_version(spark, target, 0).collect()}
    v1 = {(r["svc"], r["n"]) for r in read_version(spark, target, 1).collect()}
    assert v0 == {("api", 2)}
    assert v1 == {("api", 2), ("db", 1)}


def test_cli_agg_refresh_published_of_skips_unpublished(spark, tmp_path, capsys):
    """--published-of runs the exactly-once composition from the CLI:
    a dedup-refreshed corpus feeds agg-refresh, and an on-disk
    unpublished accepted-delta dir is neither counted nor
    bookmark-committed."""
    from big_data_processing_with_aws_glue_workshop_spark.cli import main
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_dedup_refresh,
        read_refreshed,
    )
    from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import (
        JobBookmark,
    )

    landing = tmp_path / "crawl"
    landing.mkdir()
    corpus = str(tmp_path / "corpus")
    bm = JobBookmark(str(tmp_path / "bm_dedup.json"), "dedup")
    _land_docs_cli(landing / "w0.parquet", [(1, "alpha"), (2, "beta"), (7, "alpha")])
    incremental_dedup_refresh(spark, bm, str(landing / "*.parquet"), corpus)

    stale = tmp_path / "corpus" / "accepted" / "delta_55"
    stale.mkdir(parents=True)
    _land_docs_cli(stale / "part-0.parquet", [(99, "ghost")])

    main([
        "agg-refresh",
        "--pattern", str(tmp_path / "corpus" / "accepted" / "delta_*" / "*.parquet"),
        "--bookmark", str(tmp_path / "bm_stats.json"),
        "--target", str(tmp_path / "stats"),
        "--keys", "text",
        "--agg", "docs=count:*",
        "--published-of", corpus,
    ])
    capsys.readouterr()
    got = {
        (r["text"], r["docs"])
        for r in read_refreshed(spark, str(tmp_path / "stats")).collect()
    }
    assert got == {("alpha", 1), ("beta", 1)}  # survivors only, no ghost


def _land_docs_cli(path, rows):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["doc_id", "text"]), preserve_index=False
        ),
        str(path),
    )


def test_cli_agg_refresh_drift_gate(spark, tmp_path, capsys):
    """agg-refresh --drift-col: the refresh's own delta_files are re-read
    (O(increment)) and PSI-checked against the maintained standing fact
    distribution."""
    import json as _json
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    landing = tmp_path / "facts"
    landing.mkdir()
    args = [
        "agg-refresh",
        "--pattern", str(landing / "*.parquet"),
        "--bookmark", str(tmp_path / "bm.json"),
        "--target", str(tmp_path / "state"),
        "--keys", "svc",
        "--agg", "n=count:*",
        "--agg", "total=sum:latency",
        "--drift-col", "latency",
    ]

    def land(name, rows):
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame(rows, columns=["svc", "latency"]),
                preserve_index=False,
            ),
            str(landing / name),
        )

    land("f1.parquet", [("api", 10.0 + i % 7) for i in range(60)])
    main(args)
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["drift"]["first_refresh"]

    land("f2.parquet", [("api", 160.0 + i % 7) for i in range(60)])
    main(args)
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["drift"]["psi"]["all"] > 0.25  # 16x latency shift = drift
    assert out2["state_rows"] == 1  # the aggregate state itself still merged

    # r8 advisory regression: a HEAL-ONLY run (crash lost the bookmark
    # commit; the pointer shows f2 already merged) reports n > 0 but must
    # NOT re-histogram an increment whose drift write already landed —
    # the batch-id-keyed idempotence makes it a no-op
    bm_path = tmp_path / "bm.json"
    bm_state = _json.loads(bm_path.read_text())
    job = next(iter(bm_state))
    bm_state[job]["processed_files"] = [
        f for f in bm_state[job]["processed_files"] if "f2" not in f
    ]
    bm_path.write_text(_json.dumps(bm_state))
    hist_before = (tmp_path / "state" / "drift_hist.json").read_text()
    main(args)
    out3 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out3["new_files"] == 1  # the heal
    assert "drift" not in out3  # already recorded: no double count
    assert (tmp_path / "state" / "drift_hist.json").read_text() == hist_before


def test_cli_agg_refresh_drift_recovers_lost_write(spark, tmp_path, capsys):
    """r9 review regression: if the drift write never happened for the
    pointer's current batch (crash between the pointer flip and the
    drift update — simulated by refreshing WITHOUT --drift-col), a later
    run with --drift-col histograms that increment instead of skipping
    it forever; rerunning again is then a no-op (idempotent)."""
    import json as _json
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    landing = tmp_path / "facts"
    landing.mkdir()
    base = [
        "agg-refresh",
        "--pattern", str(landing / "*.parquet"),
        "--bookmark", str(tmp_path / "bm.json"),
        "--target", str(tmp_path / "state"),
        "--keys", "svc",
        "--agg", "n=count:*",
    ]
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame([("api", 10.0 + i % 7) for i in range(60)],
                         columns=["svc", "latency"]),
            preserve_index=False,
        ),
        str(landing / "f1.parquet"),
    )
    main(base)  # no --drift-col: the increment merges, drift never recorded
    capsys.readouterr()

    main(base + ["--drift-col", "latency"])  # n=0 run: recovers the write
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["new_files"] == 0
    assert out["drift"]["first_refresh"]
    assert out["drift"]["n_rows"] == 60

    main(base + ["--drift-col", "latency"])  # and again: no double count
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "drift" not in out2
    state = _json.loads((tmp_path / "state" / "drift_hist.json").read_text())
    assert sum(n for _, _, n in state["hist"]) == 60


def test_cli_lm_score(spark, tmp_path, capsys):
    """lm-score subcommand: reference-corpus count tables, scores written
    as parquet, every input id present (empty-doc contract included)."""
    import json as _json
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    ref_rows = [(i, "the cat sat on the mat and the dog sat on the rug")
                for i in range(10)]
    doc_rows = [(100, "the cat sat on the rug"), (101, "rug the on cat mat sat")]
    for name, rows in [("ref.parquet", ref_rows), ("docs.parquet", doc_rows)]:
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame(rows, columns=["doc_id", "text"]),
                preserve_index=False,
            ),
            str(tmp_path / name),
        )
    out = str(tmp_path / "scores")
    main([
        "lm-score",
        "--input", str(tmp_path / "docs.parquet"),
        "--output", out,
        "--reference", str(tmp_path / "ref.parquet"),
    ])
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_docs"] == 2
    got = {r["doc_id"]: r["lm_score_avg"] for r in spark.read.parquet(out).collect()}
    assert got[100] > got[101] > 0  # prose outranks token salad


def test_cli_agg_refresh_hll_distinct_state(spark, tmp_path, capsys):
    """agg-refresh --hll-key: a distinct-count register table maintained
    across waves from raw files, reporting the running estimate."""
    import json as _json
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    landing = tmp_path / "facts"
    landing.mkdir()
    args = [
        "agg-refresh",
        "--pattern", str(landing / "*.parquet"),
        "--bookmark", str(tmp_path / "bm.json"),
        "--target", str(tmp_path / "state"),
        "--hll-key", "url",
    ]

    def land(name, lo, hi):
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame({"url": [f"u{i}" for i in range(lo, hi)]}),
                preserve_index=False,
            ),
            str(landing / name),
        )

    land("w0.parquet", 0, 20_000)
    main(args)
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(out1["distinct_estimate"] - 20_000) / 20_000 < 0.05

    land("w1.parquet", 15_000, 45_000)  # overlap: union distinct = 45k
    main(args)
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(out2["distinct_estimate"] - 45_000) / 45_000 < 0.05
    assert out2["state_rows"] <= 4096  # bounded register table


@pytest.mark.slow
def test_cli_semantic_refresh(spark, tmp_path, capsys):
    """semantic-refresh subcommand: a near-copy embedding re-landing is
    dropped against the standing pinned-centroid state on the second
    landing."""
    import json as _json
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.cli import main
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        read_deduped,
    )

    landing = tmp_path / "vecs"
    landing.mkdir()
    args = [
        "semantic-refresh",
        "--pattern", str(landing / "*.parquet"),
        "--bookmark", str(tmp_path / "bm.json"),
        "--target", str(tmp_path / "corpus"),
        "--threshold", "0.95",
        "--nlist", "2",
    ]

    def land(name, rows):
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame(
                    {"vec_id": [r[0] for r in rows],
                     "embedding": [r[1] for r in rows]}
                ),
                preserve_index=False,
            ).cast(
                pa.schema(
                    [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
                )
            ),
            str(landing / name),
        )

    land("v1.parquet", [(1, [1.0, 0.2, -0.5, 0.8]), (2, [-0.2, 1.0, 0.8, 0.1])])
    main(args)
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["accepted"] == 2 and out1["dropped_vs_corpus"] == 0

    land("v2.parquet", [(9, [1.01, 0.21, -0.49, 0.82]), (10, [0.1, -0.9, 0.3, 0.6])])
    main(args)
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["dropped_vs_corpus"] == 1 and out2["accepted"] == 1
    got = {r["vec_id"] for r in read_deduped(spark, str(tmp_path / "corpus")).collect()}
    assert got == {1, 2, 10}

    # semantic-recell maintenance: state collapses to one delta under the
    # new calibration, standing rows unchanged; later refreshes name the
    # printed nlist
    main(["semantic-recell", "--target", str(tmp_path / "corpus"), "--nlist", "3"])
    rc = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc["job"] == "semantic-recell"
    assert rc["rows"] == 3 and rc["old_nlist"] == 2 and rc["new_nlist"] == 3
    got = {r["vec_id"] for r in read_deduped(spark, str(tmp_path / "corpus")).collect()}
    assert got == {1, 2, 10}
    land("v3.parquet", [(11, [0.11, -0.89, 0.31, 0.59])])  # near-copy of 10
    main([a if a != "2" else "3" for a in args])
    out3 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out3["dropped_vs_corpus"] == 1 and out3["accepted"] == 0

    # semantic-allow-report: on-demand trigger check, no wave required
    main(["semantic-allow-report", "--target", str(tmp_path / "corpus")])
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["job"] == "semantic-allow-report"
    assert rep["rows"] == 3 and 0.0 <= rep["allow_share"] <= 1.0
    assert rep["trigger"] == 0.9 and isinstance(rep["recell_recommended"], bool)

    # --recell-on-trigger wiring: the flag adopts the STORED calibration's
    # nlist (3, from the recell above) even though the command line still
    # says --nlist 2 — without the flag that stale value would trip the
    # refresh's calibration mismatch guard — and a wave below the
    # trigger emits no "recell" object. (The firing path is pinned by
    # test_incremental.py::test_recell_on_trigger_closes_the_loop and the
    # streaming twin.)
    land("v4.parquet", [(12, [0.98, 0.22, -0.48, 0.79])])  # near-copy of 1
    main(args + ["--recell-on-trigger"])  # args still carries --nlist 2
    out4 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out4["dropped_vs_corpus"] == 1 and out4["accepted"] == 0
    assert "recell" not in out4
    got = {r["vec_id"] for r in read_deduped(spark, str(tmp_path / "corpus")).collect()}
    assert got == {1, 2, 10}


def test_cli_passage_refresh(spark, tmp_path, capsys):
    """passage-refresh subcommand: a boilerplate passage re-landing is
    excised from the new document while the document itself survives."""
    import json as _json
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.cli import main
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        read_deduped,
    )

    landing = tmp_path / "docs"
    landing.mkdir()
    args = [
        "passage-refresh",
        "--pattern", str(landing / "*.parquet"),
        "--bookmark", str(tmp_path / "bm.json"),
        "--target", str(tmp_path / "corpus"),
    ]

    def land(name, rows):
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame({"doc_id": [r[0] for r in rows],
                              "text": [r[1] for r in rows]}),
                preserve_index=False,
            ),
            str(landing / name),
        )

    boiler = "a b c d e f g h"
    land("d1.parquet", [(1, f"{boiler} i j k l m n o p")])
    main(args + ["--drift"])
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["kept_passages"] == 2 and out1["dropped_vs_corpus"] == 0
    # --drift parity with the other refresh commands: the first wave
    # seeds the standing histogram from the docs/ delta layout
    assert out1["drift"]["first_refresh"]

    land("d2.parquet", [(2, f"{boiler} q r s t u v w x trailing tail")])
    main(args + ["--drift"])
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["dropped_vs_corpus"] == 1 and out2["kept_passages"] == 1
    assert "psi" in out2["drift"] and not out2["drift"]["first_refresh"]
    got = {
        r["doc_id"]: r["text"]
        for r in read_deduped(spark, str(tmp_path / "corpus")).collect()
    }
    assert got[2] == "q r s t u v w x trailing tail"


def test_cli_token_budget_select_and_split_leakage_audit(spark, tmp_path, capsys):
    """The two r13 curation jobs e2e: token-budget-select keeps the
    quality-ranked prefix whose running mass fits the budget (default
    lexical-diversity score: the all-repeats doc is ranked last and
    falls outside the budget); split-leakage-audit reports the planted
    cross-split near-dup pair against a hand-written assignment."""
    import json as _json

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    # twins: 20 distinct words, each twice -> diversity ~21/41, BETWEEN
    # the high-diversity short docs (1.0) and the spam doc (0.1)
    body = " ".join(f"w{j % 20}" for j in range(40))
    rows = [
        (1, "s", " ".join(f"a{j}" for j in range(10))),   # diversity 1.0
        (2, "s", " ".join(f"b{j}" for j in range(10))),   # diversity 1.0
        (3, "s", "spam " * 9 + "spam"),                   # diversity 0.1
        (10, "s", body + " alpha"),                       # near-dup twin A
        (11, "s", body + " beta"),                        # near-dup twin B
    ]
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.parquet(str(tmp_path / "docs"))

    main([
        "token-budget-select",
        "--input", str(tmp_path / "docs"),
        "--output", str(tmp_path / "sel"),
        "--budget-tokens", "65",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    sel = spark.read.parquet(str(tmp_path / "sel"))
    ids = {r["doc_id"] for r in sel.collect()}
    # exact membership: ranks by (score desc): 1,2 (1.0, tiebreak
    # between them), then 10/11 (~0.51, tiebreak), then 3 (0.1).
    # 10+10+41 = 61 <= 65; the second twin would blow the budget, and
    # doc 3 ranks after it so the PREFIX rule stops at 61.
    assert ids == {1, 2, 10} or ids == {1, 2, 11}
    assert out["selected_docs"] == 3 and out["selected_tokens"] == 61

    assignment = [(1, "train"), (2, "train"), (3, "val"), (10, "train"), (11, "test")]
    spark.createDataFrame(
        assignment, "doc_id long, split string"
    ).coalesce(1).write.parquet(str(tmp_path / "assign"))
    main([
        "split-leakage-audit",
        "--input", str(tmp_path / "docs"),
        "--assignment", str(tmp_path / "assign"),
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["pairs_total"] == 1 and out["pairs_leaked"] == 1
    assert out["leak_share"] == 1.0
    assert out["by_split_pair"] == [
        {"split_a": "test", "split_b": "train", "n_pairs": 1, "leaked": 1}
    ]


def test_cli_dedup_threshold_sweep(spark, tmp_path, capsys):
    """dedup-threshold-sweep e2e: near-identical pairs survive the tight
    cut, the loose cut also fires on moderate-overlap pairs, docs_removed
    tracks the pair tiers; a malformed thresholds list is refused."""
    import json as _json
    import random

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    rng = random.Random(9)
    vocab = [f"w{j}" for j in range(400)]
    rows = []
    for k in range(6):
        body = [rng.choice(vocab) for _ in range(40)]
        rows.append((10 * k, "s", " ".join(body) + " alpha"))
        rows.append((10 * k + 1, "s", " ".join(body) + " beta"))
        rows.append(
            (10 * k + 2, "s",
             " ".join(body[:30] + [rng.choice(vocab) for _ in range(10)]))
        )
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.parquet(str(tmp_path / "docs"))

    main([
        "dedup-threshold-sweep",
        "--input", str(tmp_path / "docs"),
        "--thresholds", "0.4,0.9",
        "--bands", "32",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    sweep = {s["threshold"]: s for s in out["sweep"]}
    assert sweep[0.9]["n_pairs"] >= 6  # the near-identical tier
    assert sweep[0.4]["n_pairs"] > sweep[0.9]["n_pairs"]  # + moderate tier
    assert sweep[0.4]["docs_removed"] > sweep[0.9]["docs_removed"]

    with pytest.raises(SystemExit, match="not a comma-separated"):
        main([
            "dedup-threshold-sweep", "--input", str(tmp_path / "docs"),
            "--thresholds", "0.4;0.9",
        ])


def test_cli_semantic_threshold_sweep(spark, tmp_path, capsys):
    """semantic-threshold-sweep e2e: near-identical vector pairs survive
    the tight eps, the loose eps also fires on moderate-cosine pairs,
    docs_removed tracks the tiers; a malformed eps list is refused."""
    import json as _json
    import math as _math

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    dims = 12
    rows = []
    for k in range(5):
        a, b = 2 * k, 2 * k + 1

        def vec(theta, a=a, b=b):
            v = [0.0] * dims
            v[a] = _math.cos(theta)
            v[b] = _math.sin(theta)
            return v

        rows.append((10 * k, vec(0.0)))
        rows.append((10 * k + 1, vec(_math.acos(0.97))))
        rows.append((10 * k + 2, vec(_math.acos(0.65))))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).coalesce(1).write.parquet(str(tmp_path / "vecs"))

    main([
        "semantic-threshold-sweep",
        "--input", str(tmp_path / "vecs"),
        "--eps", "0.5,0.9",
        "--nlist", "4",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    sweep = {s["threshold"]: s for s in out["sweep"]}
    assert sweep[0.9]["n_pairs"] == 5  # the near-identical tier
    assert sweep[0.5]["n_pairs"] > sweep[0.9]["n_pairs"]  # + moderate tier
    assert sweep[0.5]["docs_removed"] > sweep[0.9]["docs_removed"]

    with pytest.raises(SystemExit, match="not a comma-separated"):
        main([
            "semantic-threshold-sweep", "--input", str(tmp_path / "vecs"),
            "--eps", "0.5;0.9",
        ])


def test_cli_simhash_threshold_sweep(spark, tmp_path, capsys):
    """simhash-threshold-sweep e2e: the tight hamming cut fires on the
    near-identical tier, the loose cut at least as much, docs_removed
    monotone; a malformed hammings list is refused."""
    import json as _json
    import random

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    rng = random.Random(5)
    vocab = [f"w{j}" for j in range(400)]
    rows = []
    for k in range(8):
        body = [rng.choice(vocab) for _ in range(40)]
        rows.append((10 * k, "s", " ".join(body) + " alpha"))
        rows.append((10 * k + 1, "s", " ".join(body) + " beta"))
        rows.append((10 * k + 3, "s", " ".join(rng.choice(vocab) for _ in range(40))))
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.parquet(str(tmp_path / "docs"))

    main([
        "simhash-threshold-sweep",
        "--input", str(tmp_path / "docs"),
        "--hammings", "2,6",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    sweep = {s["max_hamming"]: s for s in out["sweep"]}
    assert sweep[2]["n_pairs"] >= 1  # near-identical tier fires tight
    assert sweep[6]["n_pairs"] >= sweep[2]["n_pairs"]
    assert sweep[6]["docs_removed"] >= sweep[2]["docs_removed"]

    with pytest.raises(SystemExit, match="not a comma-separated"):
        main([
            "simhash-threshold-sweep", "--input", str(tmp_path / "docs"),
            "--hammings", "2;6",
        ])


def test_cli_curriculum_select(spark, tmp_path, capsys):
    """curriculum-select e2e: two ordered --phase flags produce an
    exclusive phase-partitioned selection, the first phase skims the
    top-diversity docs, per-phase masses respect their budgets; flag
    parse errors and repeated names are refused eagerly."""
    import json as _json

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    rows = []
    for src in ("web", "code"):
        for i in range(8):
            did = (0 if src == "web" else 100) + i
            # diversity falls with i (doc i repeats its first word i times)
            words = [f"{src}{did}w{j}" for j in range(10 - i)] + [f"{src}{did}w0"] * i
            rows.append((did, src, " ".join(words)))
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.parquet(str(tmp_path / "docs"))

    main([
        "curriculum-select",
        "--input", str(tmp_path / "docs"),
        "--output", str(tmp_path / "sel"),
        "--phase", "anneal:web=20,code=20",
        "--phase", "bulk:web=40,code=40",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [p["name"] for p in out["phases"]] == ["anneal", "bulk"]
    sel = spark.read.parquet(str(tmp_path / "sel")).collect()
    by_phase: dict = {}
    for r in sel:
        by_phase.setdefault(r["phase"], set()).add(r["doc_id"])
    # exclusive, and anneal (every doc is 10 tokens) got 2 docs/source,
    # bulk the next 4
    assert not (by_phase["anneal"] & by_phase["bulk"])
    assert {d for d in by_phase["anneal"] if d < 100} == {0, 1}
    assert {d for d in by_phase["bulk"] if d < 100} == {2, 3, 4, 5}
    for p in out["phases"]:
        for s, st in p["selected"].items():
            assert st["tokens"] <= p["budgets"][s]

    # eager refusals
    with pytest.raises(SystemExit, match="not name:src=tokens"):
        main([
            "curriculum-select", "--input", str(tmp_path / "docs"),
            "--output", str(tmp_path / "x"), "--phase", "web=20",
        ])
    with pytest.raises(SystemExit, match="names repeat"):
        main([
            "curriculum-select", "--input", str(tmp_path / "docs"),
            "--output", str(tmp_path / "x"),
            "--phase", "p:web=20,code=20", "--phase", "p:web=1,code=1",
        ])


@pytest.mark.slow
def test_cli_budget_admission(spark, tmp_path, capsys):
    """budget-admission e2e: two drains against one checkpoint — the
    second drain only sees the new file and cuts at the REMAINING
    budgets; the report tracks utilization from the pointer."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    landing = tmp_path / "landing"
    landing.mkdir()

    def land(name, rows):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "source": pa.array([r[1] for r in rows], pa.string()),
                    "score": pa.array([r[2] for r in rows], pa.float64()),
                    "n_tokens": pa.array([r[3] for r in rows], pa.int64()),
                }
            ),
            str(landing / name),
        )

    args = [
        "budget-admission",
        "--input", str(landing),
        "--target", str(tmp_path / "adm"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--budgets", "a=30,b=20",
        "--score-col", "score",
    ]
    land("w0.parquet", [(i, "a" if i % 2 == 0 else "b", 5.0, 10) for i in range(4)])
    main(args)
    out0 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # wave 0: 2 a-docs (20) + 2 b-docs (20, budget full)
    assert out0["report"]["a"] == {"budget": 30, "spent": 20, "remaining": 10}
    assert out0["report"]["b"] == {"budget": 20, "spent": 20, "remaining": 0}

    land("w1.parquet", [(10 + i, "a" if i % 2 == 0 else "b", 9.0, 10) for i in range(4)])
    main(args)
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # wave 1: a admits ONE more doc (10 remaining), b none
    assert out1["report"]["a"] == {"budget": 30, "spent": 30, "remaining": 0}
    assert out1["report"]["b"] == {"budget": 20, "spent": 20, "remaining": 0}
    adm = spark.read.parquet(
        str(tmp_path / "adm" / _json.loads(
            (tmp_path / "adm" / "current.json").read_text()
        )["version"])
    ).collect()
    assert len(adm) == 5
    assert sum(1 for r in adm if r["admitted_batch"] == 1) == 1

    # r15: admission-regret readout over the landing dir (everything
    # seen) — waves 0 and 1 had EQUAL scores within each source slice
    # here, so the greedy admissions coincide with the hindsight top-up
    # only partially: wave 1 carried strictly better scores (9.0 > 5.0),
    # so hindsight prefers wave-1 docs wherever budget allows
    main([
        "admission-regret",
        "--target", str(tmp_path / "adm"),
        "--corpus", str(landing),
    ])
    reg = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert reg["job"] == "admission-regret"
    for s in ("a", "b"):
        r = reg["by_source"][s]
        assert r["hindsight_score_sum"] >= r["admitted_score_sum"]
        assert r["admitted_tokens"] <= {"a": 30, "b": 20}[s]
        assert r["hindsight_tokens"] <= {"a": 30, "b": 20}[s]
    # a admitted 2 wave-0 docs before wave 1 landed; hindsight swaps them
    assert reg["by_source"]["a"]["only_hindsight_docs"] >= 1

    # r15: admission-recalibrate migrates the standing table to new
    # budgets (shrink a 30->20 evicts its lowest-quality admitted doc;
    # the emitted report reflects the new calibration)
    main([
        "admission-recalibrate",
        "--target", str(tmp_path / "adm"),
        "--budgets", "a=20,b=20",
    ])
    rec = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["job"] == "admission-recalibrate"
    assert rec["kept_docs"] == 4 and rec["evicted_docs"] == 1
    assert rec["report"]["a"] == {"budget": 20, "spent": 20, "remaining": 0}
    assert rec["report"]["b"] == {"budget": 20, "spent": 20, "remaining": 0}

    # r14 ADVICE: an EMPTY landing dir is a legitimate first-drain/cron
    # state — clean SystemExit, not Spark's opaque schema-inference error
    empty = tmp_path / "empty_landing"
    empty.mkdir()
    with pytest.raises(SystemExit, match="nothing to drain"):
        main([
            "budget-admission",
            "--input", str(empty),
            "--target", str(tmp_path / "adm2"),
            "--checkpoint", str(tmp_path / "ckpt2"),
            "--budgets", "a=30",
            "--score-col", "score",
        ])
    # and a non-integer budget token count gets the consistent flag error
    with pytest.raises(SystemExit, match="not an integer"):
        main([
            "budget-admission",
            "--input", str(landing),
            "--target", str(tmp_path / "adm3"),
            "--checkpoint", str(tmp_path / "ckpt3"),
            "--budgets", "a=10k",
            "--score-col", "score",
        ])


@pytest.mark.slow
def test_cli_curriculum_admission(spark, tmp_path, capsys):
    """curriculum-admission e2e: two drains against one checkpoint — the
    second drain only sees the new file, its docs fill the
    highest-priority phase with remaining headroom and overflow to the
    next; the per-phase report tracks utilization from the pointer;
    empty landing dir and malformed --phase are refused eagerly."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    landing = tmp_path / "landing"
    landing.mkdir()

    def land(name, rows):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "source": pa.array([r[1] for r in rows], pa.string()),
                    "score": pa.array([r[2] for r in rows], pa.float64()),
                    "n_tokens": pa.array([r[3] for r in rows], pa.int64()),
                }
            ),
            str(landing / name),
        )

    args = [
        "curriculum-admission",
        "--input", str(landing),
        "--target", str(tmp_path / "cadm"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--phase", "anneal:a=20",
        "--phase", "bulk:a=30",
        "--score-col", "score",
    ]
    # wave 0: 3 docs x 10 tokens — top 2 fill anneal, third overflows
    land("w0.parquet", [(i, "a", 10.0 - i, 10) for i in range(3)])
    main(args)
    out0 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out0["report"]["anneal"]["a"] == {
        "budget": 20, "spent": 20, "remaining": 0,
    }
    assert out0["report"]["bulk"]["a"] == {
        "budget": 30, "spent": 10, "remaining": 20,
    }

    # wave 1: anneal exhausted — both docs land in bulk (filling it)
    land("w1.parquet", [(10 + i, "a", 99.0 - i, 10) for i in range(2)])
    main(args)
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["report"]["anneal"]["a"]["spent"] == 20
    assert out1["report"]["bulk"]["a"] == {
        "budget": 30, "spent": 30, "remaining": 0,
    }
    adm = spark.read.parquet(
        str(tmp_path / "cadm" / _json.loads(
            (tmp_path / "cadm" / "current.json").read_text()
        )["version"])
    ).collect()
    by_phase: dict = {}
    for r in adm:
        by_phase.setdefault(r["phase"], set()).add(r["doc_id"])
    assert by_phase == {"anneal": {0, 1}, "bulk": {2, 10, 11}}

    # r16: the phase-ordered regret readout over the landing dir —
    # wave 1's strictly better docs (99, 98) hindsight-claim the anneal
    # slots the greedy stream gave wave 0's best
    main([
        "curriculum-regret",
        "--target", str(tmp_path / "cadm"),
        "--corpus", str(landing),
    ])
    reg = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert reg["job"] == "curriculum-regret"
    anneal = reg["by_phase"]["anneal"]["a"]
    assert anneal["hindsight_score_sum"] >= anneal["admitted_score_sum"]
    assert anneal["only_hindsight_docs"] >= 1  # the swapped-in wave-1 docs
    for ph in ("anneal", "bulk"):
        r = reg["by_phase"][ph]["a"]
        assert r["admitted_tokens"] <= {"anneal": 20, "bulk": 30}[ph]
        assert r["hindsight_tokens"] <= {"anneal": 20, "bulk": 30}[ph]

    # r16: curriculum-recalibrate — phase membership recomputed under a
    # reshaped curriculum. Standing docs (score): anneal {0 (10), 1 (9)},
    # bulk {2 (8), 10 (99), 11 (98)}. Re-cut at anneal=10/bulk=30:
    # wave-1's doc 10 claims anneal, {11, 0, 1} fill bulk, doc 2 evicted
    # — three docs changed phase
    main([
        "curriculum-recalibrate",
        "--target", str(tmp_path / "cadm"),
        "--phase", "anneal:a=10",
        "--phase", "bulk:a=30",
    ])
    rec = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["job"] == "curriculum-recalibrate"
    assert rec["evicted_docs"] == 1 and rec["kept_docs"] == 4
    assert rec["moved_docs"] == 3
    assert rec["report"]["anneal"]["a"] == {
        "budget": 10, "spent": 10, "remaining": 0,
    }
    assert rec["report"]["bulk"]["a"] == {
        "budget": 30, "spent": 30, "remaining": 0,
    }

    empty = tmp_path / "empty_landing"
    empty.mkdir()
    with pytest.raises(SystemExit, match="nothing to drain"):
        main([
            "curriculum-admission",
            "--input", str(empty),
            "--target", str(tmp_path / "cadm2"),
            "--checkpoint", str(tmp_path / "ckpt2"),
            "--phase", "anneal:a=20",
            "--score-col", "score",
        ])
    with pytest.raises(SystemExit, match="not name:src=tokens"):
        main([
            "curriculum-admission",
            "--input", str(landing),
            "--target", str(tmp_path / "cadm3"),
            "--checkpoint", str(tmp_path / "ckpt3"),
            "--phase", "a=20",
            "--score-col", "score",
        ])
    with pytest.raises(SystemExit, match="names repeat"):
        main([
            "curriculum-admission",
            "--input", str(landing),
            "--target", str(tmp_path / "cadm4"),
            "--checkpoint", str(tmp_path / "ckpt4"),
            "--phase", "p:a=20", "--phase", "p:a=30",
            "--score-col", "score",
        ])


def test_cli_stratified_budget_select(spark, tmp_path, capsys):
    """stratified-budget-select e2e: each source's quality-ranked prefix
    cut at its own --budgets allocation; an unnamed corpus source is
    refused with the coverage error."""
    import json as _json

    import pytest as _pytest

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    rows = []
    for src in ("web", "code"):
        for i in range(6):
            did = (0 if src == "web" else 100) + i
            # diversity falls with i: doc i repeats its first word i times
            words = [f"{src}{did}w{j}" for j in range(10 - i)] + [f"{src}{did}w0"] * i
            rows.append((did, src, " ".join(words)))
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.parquet(str(tmp_path / "docs"))

    main([
        "stratified-budget-select",
        "--input", str(tmp_path / "docs"),
        "--output", str(tmp_path / "sel"),
        "--budgets", "web=30,code=20",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["budgets"] == {"web": 30, "code": 20}
    # every doc is 10 tokens: web keeps its best 3, code its best 2
    assert out["selected"]["web"] == {"docs": 3, "tokens": 30}
    assert out["selected"]["code"] == {"docs": 2, "tokens": 20}
    sel = spark.read.parquet(str(tmp_path / "sel")).collect()
    by_src = {}
    for r in sel:
        by_src.setdefault(r["source"], []).append(r)
    # the per-source ranking is by diversity: lowest doc ids win
    assert sorted(r["doc_id"] for r in by_src["web"]) == [0, 1, 2]
    assert sorted(r["doc_id"] for r in by_src["code"]) == [100, 101]
    for src, picks in by_src.items():
        assert sorted(r["sel_rank"] for r in picks) == list(
            range(1, len(picks) + 1)
        )

    # coverage: a corpus source not named in --budgets refuses
    with _pytest.raises(ValueError, match="missing from budgets"):
        main([
            "stratified-budget-select",
            "--input", str(tmp_path / "docs"),
            "--output", str(tmp_path / "sel2"),
            "--budgets", "web=30",
        ])


def test_cli_dsir_select(spark, tmp_path, capsys):
    """dsir-select e2e: a target drawn from the apple vocabulary pulls the
    selection entirely from the apple half of a two-population corpus;
    the emitted JSON reports the selection size and cut key."""
    import json as _json
    import random

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    rng = random.Random(11)
    va = [f"apple{j}" for j in range(80)]
    vb = [f"zebra{j}" for j in range(80)]
    rows = [
        (i, " ".join(rng.choice(va) for _ in range(25))) for i in range(120)
    ] + [
        (i, " ".join(rng.choice(vb) for _ in range(25)))
        for i in range(120, 240)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        2
    ).write.parquet(str(tmp_path / "corpus"))
    spark.createDataFrame(
        [
            (1000 + i, " ".join(rng.choice(va) for _ in range(25)))
            for i in range(30)
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(tmp_path / "target"))

    main([
        "dsir-select",
        "--input", str(tmp_path / "corpus"),
        "--target", str(tmp_path / "target"),
        "--output", str(tmp_path / "sel"),
        "--k", "40",
        "--seed", "5",
        "--n-buckets", "512",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["job"] == "dsir-select" and out["selected_docs"] == 40
    sel = spark.read.parquet(str(tmp_path / "sel"))
    ids = [r["doc_id"] for r in sel.collect()]
    assert len(ids) == 40
    assert sum(1 for i in ids if i < 120) >= 38  # apple-enriched


def test_cli_source_divergence(spark, tmp_path, capsys):
    """source-divergence e2e: the disjoint-vocabulary source tops the
    drift report, the matched source sits far below it."""
    import json as _json
    import random

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    rng = random.Random(13)
    va = [f"apple{j}" for j in range(80)]
    vb = [f"zebra{j}" for j in range(80)]
    rows = [
        ("match", " ".join(rng.choice(va) for _ in range(25)))
        for _ in range(100)
    ] + [
        ("drift", " ".join(rng.choice(vb) for _ in range(25)))
        for _ in range(100)
    ]
    spark.createDataFrame(rows, "source string, text string").coalesce(
        2
    ).write.parquet(str(tmp_path / "corpus"))
    spark.createDataFrame(
        [(" ".join(rng.choice(va) for _ in range(25)),) for _ in range(30)],
        "text string",
    ).coalesce(1).write.parquet(str(tmp_path / "target"))

    main([
        "source-divergence",
        "--input", str(tmp_path / "corpus"),
        "--target", str(tmp_path / "target"),
        "--n-buckets", "512",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["job"] == "source-divergence" and out["n_sources"] == 2
    assert out["by_source"][0]["source"] == "drift"
    assert (
        out["by_source"][0]["jsd_micro"] > 5 * out["by_source"][1]["jsd_micro"]
    )


@pytest.mark.slow
def test_cli_dsir_select_budget_mode(spark, tmp_path, capsys):
    """dsir-select --budget-tokens e2e: the budget cut reports its spent
    mass; --k and --budget-tokens are mutually exclusive."""
    import json as _json
    import random

    import pytest as _pytest

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    rng = random.Random(17)
    va = [f"apple{j}" for j in range(60)]
    rows = [
        (i, " ".join(rng.choice(va) for _ in range(20))) for i in range(200)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        2
    ).write.parquet(str(tmp_path / "corpus"))
    spark.createDataFrame(
        [(1000 + i, " ".join(rng.choice(va) for _ in range(20))) for i in range(20)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(tmp_path / "target"))

    main([
        "dsir-select",
        "--input", str(tmp_path / "corpus"),
        "--target", str(tmp_path / "target"),
        "--output", str(tmp_path / "sel"),
        "--budget-tokens", "2000",
        "--n-buckets", "512",
    ])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["job"] == "dsir-select"
    assert out["budget_tokens"] == 2000
    assert out["selected_docs"] == 100  # uniform 20-token docs
    assert out["selected_tokens"] == 2000
    with _pytest.raises(SystemExit, match="exactly one"):
        main([
            "dsir-select",
            "--input", str(tmp_path / "corpus"),
            "--target", str(tmp_path / "target"),
            "--output", str(tmp_path / "sel2"),
        ])


@pytest.mark.slow
def test_cli_dsir_fit_then_select(spark, tmp_path, capsys):
    """The fit-once/select-many flow: dsir-fit writes the (b, lam) table,
    dsir-select --log-ratio (no --target) reproduces the fit-inline
    selection exactly; a bucket-count mismatch is refused."""
    import json as _json
    import random

    import pytest as _pytest

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    rng = random.Random(29)
    va = [f"apple{j}" for j in range(60)]
    vb = [f"zebra{j}" for j in range(60)]
    rows = [
        (i, " ".join(rng.choice(va if i % 2 == 0 else vb) for _ in range(20)))
        for i in range(200)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        2
    ).write.parquet(str(tmp_path / "corpus"))
    spark.createDataFrame(
        [(1000 + i, " ".join(rng.choice(va) for _ in range(20))) for i in range(25)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(tmp_path / "target"))

    main([
        "dsir-fit",
        "--input", str(tmp_path / "corpus"),
        "--target", str(tmp_path / "target"),
        "--output", str(tmp_path / "lam"),
        "--n-buckets", "512",
    ])
    fit = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert fit["job"] == "dsir-fit" and fit["lam_min"] < 0 < fit["lam_max"]

    common = [
        "--input", str(tmp_path / "corpus"),
        "--k", "50", "--seed", "9", "--n-buckets", "512",
    ]
    main(["dsir-select", *common, "--target", str(tmp_path / "target"),
          "--output", str(tmp_path / "sel_inline")])
    capsys.readouterr()
    main(["dsir-select", *common, "--log-ratio", str(tmp_path / "lam"),
          "--output", str(tmp_path / "sel_fitted")])
    capsys.readouterr()
    inline = sorted(
        tuple(r) for r in spark.read.parquet(str(tmp_path / "sel_inline")).collect()
    )
    fitted = sorted(
        tuple(r) for r in spark.read.parquet(str(tmp_path / "sel_fitted")).collect()
    )
    assert fitted == inline and len(fitted) == 50

    # bucket-count mismatch refused; missing both --target/--log-ratio too
    with _pytest.raises(SystemExit, match="covers 512 buckets"):
        main(["dsir-select", "--input", str(tmp_path / "corpus"),
              "--k", "5", "--n-buckets", "1024",
              "--log-ratio", str(tmp_path / "lam"),
              "--output", str(tmp_path / "x")])
    with _pytest.raises(SystemExit, match="--target or a fitted"):
        main(["dsir-select", "--input", str(tmp_path / "corpus"),
              "--k", "5", "--output", str(tmp_path / "y")])


@pytest.mark.slow
def test_cli_dsir_fit_multi_target(spark, tmp_path, capsys):
    """r14: repeated --target + --weights writes the weighted geometric-
    mixture table (queries/textops.py::dsir_multi_target_log_ratio_table)
    — verified bit-for-bit against the library call — and a weights/
    targets arity mismatch is refused."""
    import json as _json
    import random

    import pytest as _pytest

    from big_data_processing_with_aws_glue_workshop_spark.cli import main
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dsir_multi_target_log_ratio_table,
    )

    rng = random.Random(31)
    va = [f"apple{j}" for j in range(60)]
    vb = [f"zebra{j}" for j in range(60)]
    rows = [
        (i, " ".join(rng.choice(va if i % 2 == 0 else vb) for _ in range(20)))
        for i in range(200)
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    corpus.coalesce(2).write.parquet(str(tmp_path / "corpus"))
    tframes = {}
    for name, v in (("t0", va), ("t1", vb)):
        tf = spark.createDataFrame(
            [(2000 + i, " ".join(rng.choice(v) for _ in range(20))) for i in range(25)],
            "doc_id long, text string",
        )
        tframes[name] = tf
        tf.coalesce(1).write.parquet(str(tmp_path / name))

    main([
        "dsir-fit",
        "--input", str(tmp_path / "corpus"),
        "--target", str(tmp_path / "t0"),
        "--target", str(tmp_path / "t1"),
        "--weights", "7,3",
        "--output", str(tmp_path / "lam_mix"),
        "--n-buckets", "512",
    ])
    fit = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert fit["n_targets"] == 2
    got = {
        int(r["b"]): int(r["lam"])
        for r in spark.read.parquet(str(tmp_path / "lam_mix")).collect()
    }
    want = dsir_multi_target_log_ratio_table(
        corpus, tframes, {"t0": 7, "t1": 3}, n_buckets=512
    )
    assert [got[b] for b in range(512)] == want

    with _pytest.raises(SystemExit, match="names 1 values for 2"):
        main([
            "dsir-fit",
            "--input", str(tmp_path / "corpus"),
            "--target", str(tmp_path / "t0"),
            "--target", str(tmp_path / "t1"),
            "--weights", "7",
            "--output", str(tmp_path / "lam_bad"),
            "--n-buckets", "512",
        ])


@pytest.mark.slow
def test_cli_dsir_fit_from_stream(spark, tmp_path, capsys):
    """r15: dsir-fit --corpus-stream fits the corpus-side model from the
    standing NgramHistogramSink grid (no corpus re-read) and the written
    table is bit-identical to a batch --input fit over everything
    streamed; mismatched bucketing, --input+--corpus-stream together,
    --model-sample with a stream, and multi-target+stream are all
    refused eagerly."""
    import json as _json

    import pytest as _pytest

    from big_data_processing_with_aws_glue_workshop_spark.cli import main
    from big_data_processing_with_aws_glue_workshop_spark.streaming.sketch import (
        NgramHistogramSink,
    )

    rows = [
        (i,
         "even_src" if i % 2 == 0 else "odd_src",
         " ".join(f"{'apple' if i % 2 == 0 else 'zebra'}{(i + j) % 40}"
                  for j in range(12)))
        for i in range(240)
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, source string, text string")
    corpus.coalesce(2).write.parquet(str(tmp_path / "corpus"))
    spark.createDataFrame(
        [(900 + k, " ".join(f"apple{j % 40}" for j in range(12))) for k in range(8)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(tmp_path / "target"))

    hist = str(tmp_path / "hist")
    sink = NgramHistogramSink(hist, n_buckets=512)
    sink(corpus.filter("doc_id < 120"), 0)
    sink(corpus.filter("doc_id >= 120"), 1)

    main([
        "dsir-fit",
        "--corpus-stream", hist,
        "--target", str(tmp_path / "target"),
        "--output", str(tmp_path / "lam_stream"),
        "--n-buckets", "512",
    ])
    fit = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert fit["corpus_stream"] == hist
    main([
        "dsir-fit",
        "--input", str(tmp_path / "corpus"),
        "--target", str(tmp_path / "target"),
        "--output", str(tmp_path / "lam_batch"),
        "--n-buckets", "512",
    ])
    capsys.readouterr()
    stream_tab = sorted(
        tuple(r) for r in spark.read.parquet(str(tmp_path / "lam_stream")).collect()
    )
    batch_tab = sorted(
        tuple(r) for r in spark.read.parquet(str(tmp_path / "lam_batch")).collect()
    )
    assert stream_tab == batch_tab and len(stream_tab) == 512

    common = ["--target", str(tmp_path / "target"), "--output", str(tmp_path / "x")]
    with _pytest.raises(SystemExit, match="exactly one of"):
        main(["dsir-fit", "--input", str(tmp_path / "corpus"),
              "--corpus-stream", hist, *common])
    with _pytest.raises(SystemExit, match="exactly one of"):
        main(["dsir-fit", *common])
    with _pytest.raises(SystemExit, match="pinned calibration"):
        main(["dsir-fit", "--corpus-stream", hist, *common, "--n-buckets", "1024"])
    with _pytest.raises(SystemExit, match="model-sample"):
        main(["dsir-fit", "--corpus-stream", hist, *common,
              "--n-buckets", "512", "--model-sample", "0.5"])
    with _pytest.raises(SystemExit, match="SINGLE --target"):
        main(["dsir-fit", "--corpus-stream", hist,
              "--target", str(tmp_path / "target"),
              "--target", str(tmp_path / "target"),
              "--output", str(tmp_path / "y"), "--n-buckets", "512"])
    with _pytest.raises(SystemExit, match="no committed histogram"):
        main(["dsir-fit", "--corpus-stream", str(tmp_path / "nowhere"),
              *common, "--n-buckets", "512"])
    # r15 review: --stream-sources with a batch fit was silently ignored
    with _pytest.raises(SystemExit, match="stream-sources"):
        main(["dsir-fit", "--input", str(tmp_path / "corpus"),
              "--stream-sources", "even_src", *common, "--n-buckets", "512"])
    # ...and --text-col now names the TARGET's column in stream mode
    spark.read.parquet(str(tmp_path / "target")).withColumnRenamed(
        "text", "body"
    ).coalesce(1).write.parquet(str(tmp_path / "target_body"))
    main([
        "dsir-fit",
        "--corpus-stream", hist,
        "--target", str(tmp_path / "target_body"),
        "--text-col", "body",
        "--output", str(tmp_path / "lam_body"),
        "--n-buckets", "512",
    ])
    capsys.readouterr()
    body_tab = sorted(
        tuple(r) for r in spark.read.parquet(str(tmp_path / "lam_body")).collect()
    )
    assert body_tab == stream_tab
