"""Scale probes for the r12/r13 curation ops: the epoch-mixture
MATERIALIZER and the composed component-aware split (r12 verdict
orders #5/#6), plus the r13 additions — token-budget selection
(--budget) and the split leakage audit (--leakage) — and the r14
stratified per-source budget selection (--stratified).

--mixture [sizes...]  (default 20000 80000 200000)
    epoch_mixture_plan + materialize_epoch_mixture over a corpus with a
    small high-quality source (1% of docs) weighted to run ~8 whole
    epochs while the web bulk sub-samples. Claims under test
    (queries/textops.py::materialize_epoch_mixture):
      1. written token mass == the plan's planned_tokens EXACTLY at
         every size (the explode(sequence) membership is the same
         salted-hash set the plan counted);
      2. wall is dominated by output volume (the parquet write of
         planned-mass rows) — the explode itself adds no shuffle, so
         docs/s of OUTPUT rows should hold roughly flat with size.
    Prints one JSON line per size: wall, input docs, output rows,
    planned vs written mass, output rows/s.

--split [sizes...]  (default 20000 80000 200000)
    component_aware_split over a duplicate-heavy corpus (every 8th doc
    has a one-word-changed near-copy — 25% of docs sit in a near-dup
    pair). The parts (MinHash-LSH banding,
    min-label CC) have measured curves (docs/SCALE.md r7/r9); this
    composes them + one narrow projection + an id-keyed left join, so
    the composed wall should track the LSH+CC shape. Prints one JSON
    line per size: wall, docs, near-dup components (size >= 2),
    docs/s, split shares (expect ~90/5/5).
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from big_data_processing_with_aws_glue_workshop_spark.session import get_session


def _mixture_corpus(spark, n_docs: int):
    """1% 'prem' + 99% 'web'; ~32 words/doc, deterministic content."""
    words = F.transform(
        F.sequence(F.lit(0), F.lit(31)),
        lambda i: F.concat(
            F.lit("w"),
            ((F.col("doc_id") * 37 + i * 101) % 50_000).cast("string"),
        ),
    )
    return (
        spark.range(n_docs)
        .withColumnRenamed("id", "doc_id")
        .select(
            "doc_id",
            F.when((F.col("doc_id") % 100) == 0, "prem").otherwise("web").alias("source"),
            F.array_join(words, " ").alias("text"),
        )
    )


def probe_mixture(sizes: list[int]) -> None:
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        _tokens,
        epoch_mixture_plan,
        materialize_epoch_mixture,
    )

    spark = get_session(app_name="curation-probe-mixture")
    for n in sizes:
        docs = _mixture_corpus(spark, n)
        total_mass = docs.select(F.sum(F.size(_tokens(F.col("text"))))).first()[0]
        # prem (1% of mass) weighted to ~8.5 epochs; web sub-samples
        weights = {"prem": 0.085, "web": 0.915}
        out_dir = tempfile.mkdtemp(prefix="mixprobe_")
        t0 = time.time()
        plan = epoch_mixture_plan(docs, weights, total_tokens=int(total_mass))
        planned = {r["source"]: r for r in plan.collect()}
        t_plan = time.time() - t0
        t1 = time.time()
        materialize_epoch_mixture(docs, plan).write.mode("overwrite").parquet(
            os.path.join(out_dir, "epoch0")
        )
        t_mat = time.time() - t1
        written = (
            spark.read.parquet(os.path.join(out_dir, "epoch0"))
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.size(_tokens(F.col("text")))).alias("mass"),
            )
        )
        got = {r["source"]: r for r in written.collect()}
        out_rows = sum(int(r["rows"]) for r in got.values())
        exact = all(
            int(got[s]["mass"]) == int(planned[s]["planned_tokens"])
            for s in got
        ) and set(got) == {s for s, r in planned.items() if r["planned_tokens"] > 0}
        print(
            json.dumps(
                {
                    "op": "materialize_epoch_mixture",
                    "docs": n,
                    "prem_epochs": int(planned["prem"]["epochs"]),
                    "plan_s": round(t_plan, 2),
                    "materialize_s": round(t_mat, 2),
                    "out_rows": out_rows,
                    "out_rows_per_s": int(out_rows / t_mat),
                    "mass_exact": exact,
                    "planned_mass": int(sum(r["planned_tokens"] for r in planned.values())),
                }
            ),
            flush=True,
        )
        shutil.rmtree(out_dir, ignore_errors=True)


def _dup_heavy_corpus(spark, n_docs: int):
    """40-word docs; every doc_id % 8 == 1 row is a near-copy (one word
    changed) of the preceding row — n/8 near-dup pairs, 25% of docs in
    a pair."""
    # md5-derived words: no cross-doc arithmetic alignment (a linear
    # congruence here creates SHIFTED near-dup chains — components of
    # depth n/delta that no curation corpus exhibits)
    base_words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.substring(
            F.md5(F.concat(F.col("base").cast("string"), F.lit("_"), i.cast("string"))),
            1,
            8,
        ),
    )
    return (
        spark.range(n_docs)
        .withColumnRenamed("id", "doc_id")
        # near-copy rows share the previous row's base; others own theirs
        .withColumn(
            "base",
            F.when((F.col("doc_id") % 8) == 1, F.col("doc_id") - 1).otherwise(
                F.col("doc_id")
            ),
        )
        .withColumn("w", base_words)
        # the near-copy flips one word so jaccard stays high but < 1
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 8) == 1,
                F.concat(
                    F.array_join(F.slice("w", 1, 39), " "), F.lit(" CHANGED")
                ),
            )
            .otherwise(F.array_join("w", " "))
            .alias("text"),
        )
    )


def probe_split(sizes: list[int]) -> None:
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        component_aware_split,
    )

    spark = get_session(app_name="curation-probe-split")
    for n in sizes:
        docs = _dup_heavy_corpus(spark, n)
        t0 = time.time()
        out = component_aware_split(docs)
        agg = out.agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct("component").alias("components"),
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("tr"),
            F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("va"),
            F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("te"),
        ).first()
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "op": "component_aware_split",
                    "docs": n,
                    "wall_s": round(wall, 2),
                    "docs_per_s": int(n / wall),
                    "neardup_components": int(agg["rows"]) - int(agg["components"]),
                    "shares": [
                        round(int(agg[k]) / int(agg["rows"]), 4)
                        for k in ("tr", "va", "te")
                    ],
                }
            ),
            flush=True,
        )


def probe_budget(sizes: list[int]) -> None:
    """token_budget_selection over a corpus with a deterministic,
    id-uncorrelated score at budget = 50% of total mass. Claims under
    test (queries/textops.py::token_budget_selection):
      1. NO single-partition global window: the running sum is a window
         PARTITIONED BY the score bucket (checked from the plan text);
      2. wall grows ~linearly (two narrow aggregates + one bucketed
         window over survivors), docs/s roughly flat with size;
      3. selected mass is the maximal <=-budget prefix: max(cum_tokens)
         <= budget < max + the smallest unselected FULL/PARTIAL doc —
         verified exactly against the per-size totals."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        token_budget_selection,
    )

    spark = get_session(app_name="curation-probe-budget")
    for n in sizes:
        docs = _dup_heavy_corpus(spark, n)
        # score: md5-derived uniform in [0,1), uncorrelated with id order;
        # n_tokens varies 10..49 so the boundary cuts mid-bucket
        scored = docs.select(
            "doc_id",
            (
                F.conv(F.substring(F.md5(F.concat(F.lit("s:"), F.col("doc_id"))), 1, 6), 16, 10)
                .cast("double")
                / F.lit(float(16**6))
            ).alias("score"),
            (10 + F.col("doc_id") % 40).cast("bigint").alias("n_tokens"),
        ).cache()
        total = int(scored.agg(F.sum("n_tokens")).first()[0])
        budget = total // 2
        t0 = time.time()
        out = token_budget_selection(scored, budget, "score")
        agg = out.agg(
            F.count(F.lit(1)).alias("sel"), F.max("cum_tokens").alias("mass")
        ).first()
        wall = time.time() - t0
        # a global ORDER BY window plans an `Exchange SinglePartition`;
        # the bucketed window plans hashpartitioning(bucket)
        plan = out._jdf.queryExecution().executedPlan().toString()
        single_part_window = "SinglePartition" in plan
        print(
            json.dumps(
                {
                    "op": "token_budget_selection",
                    "docs": n,
                    "wall_s": round(wall, 2),
                    "docs_per_s": int(n / wall),
                    "selected": int(agg["sel"]),
                    "selected_mass": int(agg["mass"]),
                    "budget": budget,
                    "mass_within_budget": int(agg["mass"]) <= budget,
                    "single_partition_window": single_part_window,
                }
            ),
            flush=True,
        )
        assert int(agg["mass"]) <= budget
        assert not single_part_window, "global-window scale-killer detected"

        # DISCRETE-grade pass (r14, closing the r13 known limit): a 0-4
        # classifier grade collapses each selected grade into one giant
        # FULL bucket; the worklist must keep every emitted window
        # partition <= recurse_min. Claim under test: max_window_rows
        # <= recurse_min even though each live grade holds n/5 tied rows.
        disc = docs.select(
            "doc_id",
            (F.col("doc_id") % 5).cast("double").alias("score"),
            (10 + F.col("doc_id") % 40).cast("bigint").alias("n_tokens"),
        ).cache()
        d_total = int(disc.agg(F.sum("n_tokens")).first()[0])
        d_budget = d_total // 2  # ~grades 4,3 FULL + a cut inside grade 2
        recurse_min = 20_000
        diag: dict = {}
        t0 = time.time()
        d_out = token_budget_selection(
            disc, d_budget, "score", recurse_min=recurse_min, _diag=diag
        )
        d_agg = d_out.agg(
            F.count(F.lit(1)).alias("sel"), F.max("cum_tokens").alias("mass")
        ).first()
        d_wall = time.time() - t0
        print(
            json.dumps(
                {
                    "op": "token_budget_selection_discrete",
                    "docs": n,
                    "grades": 5,
                    "recurse_min": recurse_min,
                    "wall_s": round(d_wall, 2),
                    "docs_per_s": int(n / d_wall),
                    "selected": int(d_agg["sel"]),
                    "mass_within_budget": int(d_agg["mass"]) <= d_budget,
                    "max_window_rows": diag["max_window_rows"],
                    "worklist_items": diag["items"],
                    "bounded": diag["max_window_rows"] <= recurse_min,
                }
            ),
            flush=True,
        )
        assert int(d_agg["mass"]) <= d_budget
        assert diag["max_window_rows"] <= recurse_min, (
            f"FULL-bucket skew: window partition of {diag['max_window_rows']} "
            f"rows exceeds recurse_min={recurse_min}"
        )
        disc.unpersist()
        scored.unpersist()


def probe_stratified(sizes: list[int]) -> None:
    """stratified_budget_selection (r14) over 8 sources with DISCRETE 0-2
    grades (the worst shape: every (source, grade) is one giant tied
    group) and per-source budgets cutting inside grade 1. Claims under
    test (queries/textops.py::stratified_budget_selection):
      1. per-source masses all land within their own budgets;
      2. refinement is LEVEL-batched: one aggregate per level, so
         _diag['levels'] stays at 2 regardless of the source count
         (16 oversized (source, grade) regions refine in ONE pass);
      3. the largest emitted window partition stays under recurse_min —
         no (source, grade) group ever windows as one task."""
    from pyspark.sql import functions as F

    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        stratified_budget_selection,
    )

    spark = get_session(app_name="curation-probe-stratified")
    recurse_min = 5_000
    n_sources = int(os.environ.get("STRATIFIED_PROBE_SOURCES", "8"))
    for n in sizes:
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % n_sources).cast("string")).alias(
                "source"
            ),
            ((F.col("id") / n_sources).cast("bigint") % 3).cast("double").alias(
                "score"
            ),
            (10 + F.col("id") % 40).cast("bigint").alias("n_tokens"),
        ).cache()
        budgets = {
            r["source"]: int(r["t"]) // 2
            for r in docs.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
        }
        diag: dict = {}
        t0 = time.time()
        out = stratified_budget_selection(
            docs, budgets, "score", recurse_min=recurse_min, _diag=diag
        )
        per_src = {
            r["source"]: int(r["m"])
            for r in out.groupBy("source").agg(F.max("cum_tokens").alias("m")).collect()
        }
        wall = time.time() - t0
        within = all(per_src[s] <= budgets[s] for s in per_src)
        print(
            json.dumps(
                {
                    "op": "stratified_budget_selection",
                    "docs": n,
                    "sources": n_sources,
                    "grades": 3,
                    "recurse_min": recurse_min,
                    "wall_s": round(wall, 2),
                    "docs_per_s": int(n / wall),
                    "all_within_budget": within,
                    "levels": diag["levels"],
                    "regions": diag["regions"],
                    "max_window_rows": diag["max_window_rows"],
                    "bounded": diag["max_window_rows"] <= recurse_min,
                }
            ),
            flush=True,
        )
        assert within
        assert diag["max_window_rows"] <= recurse_min
        assert diag["levels"] <= 2
        docs.unpersist()


def probe_stratified_batched(sizes: list[int]) -> None:
    """source_batch wrapper at WIDTH (r15, the r14 verdict's stretch #8
    measured): 512 sources with discrete grades, budgets cutting inside
    a tied grade, run single-pass vs source_batch=64 (8 chunks). Claims:
      1. the chunked output is byte-identical to the single pass (the
         provable independence claim, checked at width, not argued);
      2. per-level driver state drops by the chunking factor: the
         single pass's per-level region table covers all 512 sources,
         each chunk's covers <= 64 (diag regions reported per run);
      3. all budgets respected either way; wall overhead is the
         ceil(512/64)=8 filtered corpus passes, reported honestly."""
    from pyspark.sql import functions as F

    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        stratified_budget_selection,
    )

    spark = get_session(app_name="curation-probe-stratified-batched")
    recurse_min = 5_000
    n_sources = 512
    batch = 64
    for n in sizes:
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % n_sources).cast("string")).alias(
                "source"
            ),
            ((F.col("id") / n_sources).cast("bigint") % 3).cast("double").alias(
                "score"
            ),
            (10 + F.col("id") % 40).cast("bigint").alias("n_tokens"),
        ).cache()
        budgets = {
            r["source"]: int(r["t"]) // 2
            for r in docs.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
        }
        runs = {}
        for label, kw in (
            ("single", {}),
            ("batched", {"source_batch": batch}),
        ):
            diag: dict = {}
            t0 = time.time()
            rows = sorted(
                tuple(r)
                for r in stratified_budget_selection(
                    docs, budgets, "score", recurse_min=recurse_min,
                    _diag=diag, **kw,
                ).collect()
            )
            wall = time.time() - t0
            runs[label] = (rows, wall, dict(diag))
        identical = runs["single"][0] == runs["batched"][0]
        per_src = {}
        for r in runs["batched"][0]:
            per_src[r[1]] = max(per_src.get(r[1], 0), r[5])
        within = all(per_src[s] <= budgets[s] for s in per_src)
        rec = {
            "op": "stratified_budget_selection_batched",
            "docs": n,
            "sources": n_sources,
            "source_batch": batch,
            "recurse_min": recurse_min,
            "byte_identical": identical,
            "all_within_budget": within,
            "single_wall_s": round(runs["single"][1], 2),
            "batched_wall_s": round(runs["batched"][1], 2),
            "single_regions": runs["single"][2]["regions"],
            "batched_regions_total": runs["batched"][2]["regions"],
            "batched_levels_max": runs["batched"][2]["levels"],
            "max_window_rows": runs["batched"][2]["max_window_rows"],
        }
        print(json.dumps(rec), flush=True)
        assert identical
        assert within
        assert runs["batched"][2]["max_window_rows"] <= recurse_min
        docs.unpersist()


def probe_stratified_pruning(sizes: list[int]) -> None:
    """source_batch partition pruning on a REAL layout (r16, r15 verdict
    #4): the r15 width probe ran the 8 chunk passes against a cached
    unpartitioned frame (8 full filtered scans, 2.4x wall) and the
    docstring CLAIMED the passes are partition-prunable by source. This
    writes the same 512-source fixture ``partitionBy(source)`` and
    measures what each chunk pass actually touches:

      1. bytes each chunk pass actually reads, via the JVM-global
         Hadoop FileSystem bytesRead counter (delta around one action;
         inputFiles() is NOT a pruning measure — it reports the
         relation's full file list pre-pruning, measured) — the chunk's
         IN-filter references only the partition column (the
         coalesce/cast wrapper included, verified), so file-source
         partition pruning must cut each pass to ~1/K of the layout;
      2. total bytes + wall for the full batched run from disk,
         partitioned vs unpartitioned layout, same chunking — the
         measured crossover the docstring guidance cites;
      3. output equality across both layouts and the single pass."""
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as F

    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        stratified_budget_selection,
    )

    spark = get_session(app_name="curation-probe-stratified-pruning")
    recurse_min = 5_000
    n_sources = 512
    batch = 64
    base = "/tmp/curation_probe_pruning"
    for n in sizes:
        _shutil.rmtree(base, ignore_errors=True)
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % n_sources).cast("string")).alias(
                "source"
            ),
            ((F.col("id") / n_sources).cast("bigint") % 3).cast("double").alias(
                "score"
            ),
            (10 + F.col("id") % 40).cast("bigint").alias("n_tokens"),
        )
        part_path = _os.path.join(base, "by_source")
        flat_path = _os.path.join(base, "flat")
        # repartition by source BEFORE partitionBy: without it every one
        # of the 32 writer tasks emits a sliver into every partition dir
        # (~16k tiny files) and small-file open costs swamp the pruning
        # win — measured 53.7s batched vs 23.7s flat on that layout, with
        # pruning ENGAGED (bytes exactly 1/K). File sizing is part of the
        # layout contract, same as any hive-partitioned table.
        docs.repartition(n_sources, "source").write.partitionBy(
            "source"
        ).parquet(part_path)
        docs.write.parquet(flat_path)

        jvm = spark.sparkContext._jvm

        def fs_bytes_read() -> int:
            stats = (
                jvm.org.apache.hadoop.fs.FileSystem
                .getGlobalStorageStatistics().get("file")
            )
            return int(stats.getLong("bytesRead")) if stats else 0

        part_scan = spark.read.parquet(part_path)
        flat_scan = spark.read.parquet(flat_path)
        budgets = {
            r["source"]: int(r["t"]) // 2
            for r in part_scan.groupBy("source")
            .agg(F.sum("n_tokens").alias("t"))
            .collect()
        }

        # 1. pruning: bytes each chunk's pruned SCAN actually reads
        # (count of the filtered frame — pure scan, no selection work),
        # via the EXACT filter expression the batched op applies
        keys = sorted(budgets)
        src_expr = F.coalesce(F.col("source").cast("string"), F.lit("(null)"))
        b0 = fs_bytes_read()
        part_scan.count()
        full_scan_bytes = fs_bytes_read() - b0
        chunk_bytes = []
        for i in range(0, len(keys), batch):
            chunk = keys[i : i + batch]
            b0 = fs_bytes_read()
            part_scan.filter(src_expr.isin(chunk)).count()
            chunk_bytes.append(fs_bytes_read() - b0)
        n_chunks = len(chunk_bytes)
        share = [round(b / full_scan_bytes, 4) for b in chunk_bytes]

        # 2. bytes + wall from disk for the three full runs
        runs = {}
        for label, frame, kw in (
            ("batched_partitioned", part_scan, {"source_batch": batch}),
            ("batched_flat", flat_scan, {"source_batch": batch}),
            ("single_partitioned", part_scan, {}),
        ):
            b0 = fs_bytes_read()
            t0 = time.time()
            rows = sorted(
                tuple(r)
                for r in stratified_budget_selection(
                    frame.select("doc_id", "source", "score", "n_tokens"),
                    budgets, "score", recurse_min=recurse_min, **kw,
                ).collect()
            )
            runs[label] = (
                rows, round(time.time() - t0, 2), fs_bytes_read() - b0,
            )
        identical = (
            runs["batched_partitioned"][0]
            == runs["batched_flat"][0]
            == runs["single_partitioned"][0]
        )
        rec = {
            "op": "stratified_batched_pruning",
            "docs": n,
            "sources": n_sources,
            "source_batch": batch,
            "n_chunks": n_chunks,
            "full_scan_bytes": full_scan_bytes,
            "chunk_scan_share": share,
            "mean_chunk_share": round(sum(share) / n_chunks, 4),
            "ideal_share": round(1 / n_chunks, 4),
            "byte_identical_across_layouts": identical,
            "walls_s": {k: v[1] for k, v in runs.items()},
            "run_bytes_read": {k: v[2] for k, v in runs.items()},
        }
        print(json.dumps(rec), flush=True)
        assert identical
        # pruning must actually engage: each pass reads ~1/K, not ~1
        assert max(share) < 2.5 / n_chunks, share
    _shutil.rmtree(base, ignore_errors=True)


def probe_curriculum(sizes: list[int]) -> None:
    """curriculum_phase_selection (r15) at scale: 3 phases x 8 sources
    over discrete grades (the tied-group worst case), phase budgets
    cutting inside tied grades. Claims under test:
      1. phases are EXCLUSIVE (no doc appears twice) and every
         (phase, source) mass lands within its budget;
      2. the pass count is the phase count: each phase runs the
         level-batched machinery once over the shrinking remainder —
         wall grows roughly linearly in phases, never quadratically
         (the per-phase cache pin is what prevents later phases from
         recomputing earlier windows);
      3. priority order holds: phase 1's minimum selected score per
         source >= phase 2's maximum (ties excepted), i.e. the first
         phase skimmed the better tranche."""
    from pyspark.sql import functions as F

    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        curriculum_phase_selection,
    )

    spark = get_session(app_name="curation-probe-curriculum")
    n_sources = 8
    for n in sizes:
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % n_sources).cast("string")).alias(
                "source"
            ),
            ((F.col("id") / n_sources).cast("bigint") % 5).cast("double").alias(
                "score"
            ),
            (10 + F.col("id") % 40).cast("bigint").alias("n_tokens"),
        ).cache()
        totals = {
            r["source"]: int(r["t"])
            for r in docs.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
        }
        phases = [
            ("anneal", {s: t // 10 for s, t in totals.items()}),
            ("main", {s: t // 2 for s, t in totals.items()}),
            ("warmup", {s: t // 5 for s, t in totals.items()}),
        ]
        t0 = time.time()
        out = curriculum_phase_selection(docs, phases, "score").cache()
        n_sel = out.count()
        wall = time.time() - t0
        n_distinct = out.select("doc_id").distinct().count()
        per = {
            (r["phase"], r["source"]): int(r["m"])
            for r in out.groupBy("phase", "source")
            .agg(F.max("cum_tokens").alias("m"))
            .collect()
        }
        budgets_by_phase = dict(phases)
        within = all(
            m <= budgets_by_phase[p][s] for (p, s), m in per.items()
        )
        prio = {
            (r["phase"], r["source"]): (r["lo"], r["hi"])
            for r in out.groupBy("phase", "source")
            .agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
            .collect()
        }
        prio_ok = all(
            prio[("anneal", s)][0] >= prio[("main", s)][1]
            for s in totals
            if ("anneal", s) in prio and ("main", s) in prio
        )
        rec = {
            "op": "curriculum_phase_selection",
            "docs": n,
            "sources": n_sources,
            "phases": len(phases),
            "selected": n_sel,
            "wall_s": round(wall, 2),
            "docs_per_s": int(n / wall),
            "exclusive": n_distinct == n_sel,
            "all_within_budget": within,
            "priority_order_holds": prio_ok,
        }
        print(json.dumps(rec), flush=True)
        assert n_distinct == n_sel
        assert within
        assert prio_ok
        out.unpersist()
        docs.unpersist()


def probe_curriculum_deep(sizes: list[int]) -> None:
    """curriculum_phase_selection at DEPTH (r16, r15 verdict stretch
    #7): P=6 phases x 256 sources (the r15 probe ran 3 x 8). Claims:
      1. per-phase fixed cost amortizes — wall at P phases grows
         roughly linearly in P (measured at P=2/4/6 over the same
         corpus and total budget mass), because each phase is ONE pass
         of the level-batched machinery over the shrinking remainder
         and the per-phase cache pin prevents quadratic re-execution;
      2. exclusivity/budget/priority hold at depth (asserted at 4M);
      3. the exclusion anti-join's physical shape is OBSERVED from the
         executed plan (broadcast vs shuffle anti as the taken set
         grows) rather than claimed."""
    from pyspark.sql import functions as F

    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        curriculum_phase_selection,
    )

    spark = get_session(app_name="curation-probe-curriculum-deep")
    n_sources = 256
    phase_names = ["warmup", "ramp", "main", "consolidate", "anneal", "final"]
    for n in sizes:
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % n_sources).cast("string")).alias(
                "source"
            ),
            ((F.col("id") / n_sources).cast("bigint") % 5).cast("double").alias(
                "score"
            ),
            (10 + F.col("id") % 40).cast("bigint").alias("n_tokens"),
        ).cache()
        totals = {
            r["source"]: int(r["t"])
            for r in docs.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
        }
        # 6 phases, each 1/12 of per-source mass (half the corpus total),
        # every cut landing inside a tied discrete grade
        all_phases = [
            (name, {s: t // 12 for s, t in totals.items()})
            for name in phase_names
        ]
        walls = {}
        for p_count in (2, 4, 6):
            t0 = time.time()
            out = curriculum_phase_selection(
                docs, all_phases[:p_count], "score"
            ).cache()
            n_sel = out.count()
            walls[p_count] = round(time.time() - t0, 2)
            if p_count < 6:
                out.unpersist()
        # depth-scale invariants on the P=6 result
        n_distinct = out.select("doc_id").distinct().count()
        per = {
            (r["phase"], r["source"]): int(r["m"])
            for r in out.groupBy("phase", "source")
            .agg(F.max("cum_tokens").alias("m"))
            .collect()
        }
        budgets_by_phase = dict(all_phases)
        within = all(m <= budgets_by_phase[p][s] for (p, s), m in per.items())
        prio = {
            (r["phase"], r["source"]): (r["lo"], r["hi"])
            for r in out.groupBy("phase", "source")
            .agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
            .collect()
        }
        order_ok = True
        for earlier, later in zip(phase_names, phase_names[1:]):
            for s in totals:
                if (earlier, s) in prio and (later, s) in prio:
                    if prio[(earlier, s)][0] < prio[(later, s)][1]:
                        order_ok = False
        # observed anti-join shape from the EXECUTED plan (AQE-final)
        plan = out._jdf.queryExecution().executedPlan().toString()
        anti_lines = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
        shapes = {
            "broadcast_anti": sum(1 for ln in anti_lines if "Broadcast" in ln),
            "shuffle_anti": sum(1 for ln in anti_lines if "Broadcast" not in ln),
        }
        rec = {
            "op": "curriculum_phase_selection_deep",
            "docs": n,
            "sources": n_sources,
            "phases": 6,
            "selected": n_sel,
            "wall_s_by_phase_count": walls,
            "marginal_wall_s_per_phase": round(
                (walls[6] - walls[2]) / 4, 2
            ),
            "exclusive": n_distinct == n_sel,
            "all_within_budget": within,
            "priority_order_holds": order_ok,
            "anti_join_shapes": shapes,
        }
        print(json.dumps(rec), flush=True)
        assert n_distinct == n_sel
        assert within
        assert order_ok
        out.unpersist()
        docs.unpersist()


def probe_leakage(sizes: list[int]) -> None:
    """split_leakage_audit over the dup-heavy corpus with the PER-DOC
    hash split (the assignment that CAN leak). Claims under test:
      1. the audit wall tracks the minhash pair stream (the measured
         LSH shape) + two id-keyed joins + one tiny aggregate;
      2. the observed leak share of near-dup pairs is ~2*(0.05+0.05+
         0.05*0.05... i.e. 1 - (0.9^2+0.05^2+0.05^2 normalized)) — the
         split-independence arithmetic: P(two independent docs land in
         different splits) = 1 - (0.9^2 + 0.05^2 + 0.05^2) = 0.185."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        _SPLIT_TRAIN_LT,
        _SPLIT_VAL_LT,
        split_leakage_audit,
    )

    spark = get_session(app_name="curation-probe-leakage")
    for n in sizes:
        docs = _dup_heavy_corpus(spark, n).cache()
        docs.count()
        h = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 1_000_000
        )
        assignment = docs.select(
            "doc_id",
            F.when(h < _SPLIT_TRAIN_LT, "train")
            .when(h < _SPLIT_VAL_LT, "val")
            .otherwise("test")
            .alias("split"),
        )
        t0 = time.time()
        rows = split_leakage_audit(docs, assignment).collect()
        wall = time.time() - t0
        total = sum(r["n_pairs"] for r in rows)
        leaked = sum(r["n_pairs"] for r in rows if r["leaked"])
        print(
            json.dumps(
                {
                    "op": "split_leakage_audit",
                    "docs": n,
                    "wall_s": round(wall, 2),
                    "docs_per_s": int(n / wall),
                    "pairs": total,
                    "leaked": leaked,
                    "leak_share": round(leaked / total, 4) if total else None,
                }
            ),
            flush=True,
        )
        docs.unpersist()


def probe_dsir(sizes: list[int]) -> None:
    """dsir_select over the dup-heavy corpus with a 1%-slice target drawn
    from the SAME generator (so weights spread around zero and the
    selection exercises a real boundary). Claims under test
    (queries/textops.py::dsir_importance_weights / dsir_select):
      1. the scoring pass is shuffle-free (no Exchange in the weights
         plan — checked from the plan text), so docs/s should RISE as
         fixed overhead (two model-fit aggregates + plan build)
         amortizes;
      2. model fit cost is bounded: the two histograms collect
         <= n_buckets rows regardless of corpus size;
      3. k rows come back exactly, keyed deterministically."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dsir_importance_weights,
        dsir_select,
    )

    spark = get_session(app_name="curation-probe-dsir")
    for n in sizes:
        docs = _dup_heavy_corpus(spark, n).cache()
        docs.count()
        target = docs.filter((F.col("doc_id") % 100) == 0)
        k = n // 10
        t0 = time.time()
        sel = dsir_select(docs, target, k, seed=1)
        got = sel.agg(
            F.count(F.lit(1)).alias("rows"), F.min("key_micro").alias("cut")
        ).first()
        wall = time.time() - t0
        plan = dsir_importance_weights(
            docs, target, n_buckets=16
        )._jdf.queryExecution().executedPlan().toString()
        print(
            json.dumps(
                {
                    "op": "dsir_select",
                    "docs": n,
                    "k": k,
                    "wall_s": round(wall, 2),
                    "docs_per_s": int(n / wall),
                    "selected": int(got["rows"]),
                    "cut_key_micro": int(got["cut"]),
                    "scoring_shuffle_free": "Exchange" not in plan,
                }
            ),
            flush=True,
        )
        assert int(got["rows"]) == k
        assert "Exchange" not in plan, "scoring pass shuffles"
        docs.unpersist()


def probe_dsir_multi(sizes: list[int]) -> None:
    """dsir_multi_target_log_ratio_table (r14) fit-cost curve: the
    combined model fits ONE corpus histogram + one histogram PER TARGET,
    and the combination is driver-side bigint arithmetic over
    <= n_buckets rows. Claims under test:
      1. fit wall grows ~linearly with the target count (each target is
         one bounded aggregate) at fixed corpus size;
      2. the SCORING cost is target-count-INVARIANT: whatever the target
         count, the combined table is one folded literal array and the
         weights plan stays shuffle-free."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        dsir_importance_weights,
        dsir_multi_target_log_ratio_table,
    )

    spark = get_session(app_name="curation-probe-dsir-multi")
    n = sizes[-1] if sizes else 200_000
    docs = _dup_heavy_corpus(spark, n).cache()
    docs.count()
    for n_targets in (1, 2, 4):
        targets = {
            f"t{j}": docs.filter((F.col("doc_id") % (100 * n_targets)) == j)
            for j in range(n_targets)
        }
        weights = {k: 1.0 for k in targets}
        t0 = time.time()
        lam = dsir_multi_target_log_ratio_table(docs, targets, weights)
        fit_wall = time.time() - t0
        t0 = time.time()
        w = dsir_importance_weights(docs, log_ratio=lam)
        w.agg(F.count(F.lit(1))).first()
        score_wall = time.time() - t0
        plan = w._jdf.queryExecution().executedPlan().toString()
        print(
            json.dumps(
                {
                    "op": "dsir_multi_target_fit",
                    "docs": n,
                    "targets": n_targets,
                    "fit_wall_s": round(fit_wall, 2),
                    "score_wall_s": round(score_wall, 2),
                    "table_len": len(lam),
                    "scoring_shuffle_free": "Exchange" not in plan,
                }
            ),
            flush=True,
        )
        assert "Exchange" not in plan
    docs.unpersist()


def probe_divergence(sizes: list[int]) -> None:
    """source_divergence_audit over the dup-heavy corpus tagged into 16
    sources, 1%-slice target. Claims under test
    (queries/textops.py::source_divergence_audit):
      1. after the ONE corpus explode+aggregate, everything runs on the
         bounded |sources| x n_buckets grid — so docs/s rises with size
         (the corpus pass dominates and amortizes fixed grid cost);
      2. all 16 hash-tagged sources draw from the same generator, so
         their JSDs cluster in a tight ABSOLUTE band (sampling noise
         only — measured spread ~4k micro-nats at every size, while the
         level itself falls as the corpus grows and the 1% target slice
         becomes representative)."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        source_divergence_audit,
    )

    spark = get_session(app_name="curation-probe-divergence")
    for n in sizes:
        docs = _dup_heavy_corpus(spark, n).cache()
        docs.count()
        tagged = docs.select(
            F.concat(F.lit("src"), (F.col("doc_id") % 16).cast("string")).alias(
                "source"
            ),
            "text",
        )
        target = docs.filter((F.col("doc_id") % 100) == 0)
        t0 = time.time()
        rows = source_divergence_audit(tagged, target).collect()
        wall = time.time() - t0
        jsds = sorted(r["jsd_micro"] for r in rows)
        print(
            json.dumps(
                {
                    "op": "source_divergence_audit",
                    "docs": n,
                    "wall_s": round(wall, 2),
                    "docs_per_s": int(n / wall),
                    "sources": len(rows),
                    "jsd_min": jsds[0],
                    "jsd_max": jsds[-1],
                }
            ),
            flush=True,
        )
        assert len(rows) == 16
        assert jsds[-1] - jsds[0] < 10_000, "same-generator sources diverged"
        docs.unpersist()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "--mixture"
    sizes = [int(x) for x in sys.argv[2:]] or [20_000, 80_000, 200_000]
    if mode == "--mixture":
        probe_mixture(sizes)
    elif mode == "--split":
        probe_split(sizes)
    elif mode == "--budget":
        probe_budget(sizes)
    elif mode == "--leakage":
        probe_leakage(sizes)
    elif mode == "--dsir":
        probe_dsir(sizes)
    elif mode == "--divergence":
        probe_divergence(sizes)
    elif mode == "--stratified":
        probe_stratified(sizes)
    elif mode == "--stratified-batched":
        probe_stratified_batched(sizes)
    elif mode == "--stratified-pruning":
        probe_stratified_pruning(sizes)
    elif mode == "--curriculum":
        probe_curriculum(sizes)
    elif mode == "--curriculum-deep":
        probe_curriculum_deep(sizes)
    elif mode == "--dsir-multi":
        probe_dsir_multi(sizes)
    else:
        raise SystemExit(
            f"unknown mode {mode!r} (use --mixture, --split, --budget, "
            "--leakage, --dsir, --dsir-multi, --divergence, --stratified "
            "or --stratified-batched)"
        )
