"""Streaming budget admission: the streaming member of the selection
family (token_budget_selection / stratified_budget_selection in
queries/textops.py).

An unbounded document stream cannot run the batch operators' GLOBAL
quality ranking — the best document of wave 40 is unknowable at wave 3.
The streaming contract is therefore WAVE-GREEDY, stated plainly: each
micro-batch takes a stratified quality cut against the budgets
REMAINING after every earlier wave, using the exact batch operator
(`stratified_budget_selection`) per wave — the cut math cannot fork
from the batch semantics because it IS the batch op. A later great
document can be crowded out by an earlier mediocre one; pipelines that
need the global ranking run the batch operator over the landed corpus
instead. What the sink guarantees exactly:

- per-source admitted mass NEVER exceeds the budget, at every moment
  of the stream's life (the inclusive-prefix rule per wave + exact
  bigint spent counters carried in the pointer);
- within one wave, admission is the batch operator's quality order
  (score DESC, md5 tiebreak) per source;
- deterministic and exactly-once: replayed batch ids are skipped, the
  admitted table and the spent counters commit ATOMICALLY in one
  snapshot (a crash between write and pointer flip leaves the old
  state), and a re-run over the same waves is byte-identical;
- the calibration (budgets, columns, bucket count) is pinned on first
  commit and refused on mismatch — admissions across different budget
  tables do not compose.

Scale shape per micro-batch: the batch operator's level-batched prefix
sums over the WAVE (never history), one bounded per-source aggregate of
the newly admitted mass, and a standing-table union whose size is
bounded by the BUDGETS, not by the stream: the sink admits only
TOKEN-BEARING documents (n_tokens > 0), so the admitted row count is
<= the total budget mass (every admitted row spends >= 1 token). The
batch operator's inclusive boundary deliberately admits zero-token
documents (they spend nothing); a stream of them would grow the
standing table without bound even after every budget is exhausted
(r14 ADVICE finding), so the streaming contract excludes them — filter
or re-tokenize upstream if zero-token rows are meaningful. Corollary:
a stream source carrying ONLY zero-token documents never reaches the
batch operator's unknown-source coverage raise (it has no admissible
mass to mis-budget).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sinks import commit_snapshot, read_current, read_pointer


class BudgetAdmissionSink:
    """``foreachBatch`` sink: admit each micro-batch's best documents
    into the per-source token budgets remaining after earlier waves."""

    def __init__(
        self,
        target_dir: str,
        budgets: dict,
        score_col: str,
        *,
        source_col: str = "source",
        id_col: str = "doc_id",
        n_tokens_col: str = "n_tokens",
        n_buckets: int = 256,
        checkpoint_dir: str | None = None,
    ) -> None:
        self.target_dir = target_dir
        self.budgets = {str(k): int(v) for k, v in budgets.items()}
        self.score_col = score_col
        self.source_col = source_col
        self.id_col = id_col
        self.n_tokens_col = n_tokens_col
        self.n_buckets = n_buckets
        self.checkpoint_dir = checkpoint_dir

    @property
    def calibration(self) -> dict:
        return {
            "budgets": self.budgets,
            "score_col": self.score_col,
            "source_col": self.source_col,
            "id_col": self.id_col,
            "n_tokens_col": self.n_tokens_col,
            "n_buckets": self.n_buckets,
        }

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..queries.textops import stratified_budget_selection

        pointer = read_pointer(self.target_dir)
        # replay gate on the STREAM batch id, decoupled from the snapshot
        # version counter (r15, the corpus_dedup precedent): maintenance
        # commits (recalibrate_admission) bump the version without
        # consuming a stream id, so the gate must key on
        # last_stream_batch (falling back to batch_id for pre-r15
        # pointers, where the two were the same number)
        if pointer is not None and batch_id <= pointer.get(
            "last_stream_batch", pointer["batch_id"]
        ):
            return  # replayed batch after recovery: already admitted
        spent: dict = {}
        if pointer is not None:
            stored = pointer.get("calibration")
            if stored is not None and stored != self.calibration:
                raise ValueError(
                    f"admission calibration mismatch for {self.target_dir!r}: "
                    f"standing state was built with {stored}, sink configured "
                    f"with {self.calibration} — admissions across different "
                    "budget tables do not compose; match the stored "
                    "parameters or reset the target"
                )
            spent = {k: int(v) for k, v in pointer.get("spent", {}).items()}
        remaining = {
            s: max(0, b - spent.get(s, 0)) for s, b in self.budgets.items()
        }
        # zero-token rows are inadmissible mass (module docstring: the
        # inclusive boundary would admit them forever past exhaustion —
        # the boundedness claim holds only over token-bearing rows)
        wave = batch_df.filter(
            F.col(self.n_tokens_col).isNotNull()
            & (F.col(self.n_tokens_col) > 0)
        )
        # the batch operator IS the per-wave cut over the token-bearing
        # rows (its coverage raise also surfaces unknown stream sources
        # loudly); its cum_tokens are relative to THIS wave's remaining
        # budget — the spent offset lifts them to the global running mass
        admitted = stratified_budget_selection(
            wave,
            remaining,
            self.score_col,
            source_col=self.source_col,
            id_col=self.id_col,
            n_tokens_col=self.n_tokens_col,
            n_buckets=self.n_buckets,
        )
        spark = batch_df.sparkSession
        off = spark.createDataFrame(
            [(s, spent.get(s, 0)) for s in self.budgets],
            f"{self.source_col} string, __spent long",
        )
        # persisted: the selection plan (scan -> prefix sums -> windows)
        # is consumed TWICE below — the spent-counter aggregate and the
        # snapshot write — and without the pin each action re-runs it
        # from the wave scan (r14 review finding: ~2x per-wave work;
        # correctness survived only because the cut is deterministic)
        inc = (
            admitted.join(F.broadcast(off), self.source_col)
            .select(
                self.id_col,
                self.source_col,
                "score",
                "n_tokens",
                (F.col("cum_tokens") + F.col("__spent")).alias("cum_tokens"),
                F.lit(batch_id).cast("long").alias("admitted_batch"),
            )
            .persist()
        )
        try:
            # the spent counters and the admitted table flip together:
            # one snapshot commit, so a crash can never leave them
            # disagreeing
            new_mass = {
                r[self.source_col]: int(r["m"])
                for r in inc.groupBy(self.source_col)
                .agg(F.sum("n_tokens").alias("m"))
                .collect()
            }
            new_spent = {
                s: spent.get(s, 0) + new_mass.get(s, 0) for s in self.budgets
            }
            # bounded: the admitted table never outgrows the budgets
            if pointer is not None:
                merged = read_current(spark, self.target_dir).unionByName(inc)
            else:
                merged = inc
            extra: dict = {
                "calibration": self.calibration,
                "spent": new_spent,
                "last_stream_batch": batch_id,
            }
            if self.checkpoint_dir is not None:
                extra["stream_checkpoint"] = os.path.abspath(
                    self.checkpoint_dir
                )
            # snapshot versions are a monotone counter independent of the
            # stream id: a recalibration commit in between must not force
            # a version-dir collision with the next stream batch
            version = (pointer["batch_id"] + 1) if pointer is not None else batch_id
            # pre-commit pointer re-read (r16-ADVICE low, mirroring the
            # recalibration-side guard): a recalibration that committed
            # while THIS batch was draining would otherwise be silently
            # destroyed — the drain writes at the stale version and
            # commit_snapshot's stale-leftover cleanup removes the
            # recalibration's newer dir. The target is checkpoint-pinned
            # to one stream, so ANY mid-batch pointer change is a
            # forbidden concurrent writer: fail loud, write nothing.
            now = read_pointer(self.target_dir)
            if now != pointer:
                raise RuntimeError(
                    f"admission state at {self.target_dir!r} changed while "
                    "this batch was draining (a concurrent writer committed "
                    f"version {now and now.get('batch_id')} past the "
                    f"{pointer and pointer.get('batch_id')} this batch "
                    "read) — recalibration must not run against a target "
                    "with an in-flight drain; re-run the drain after it "
                    "settles"
                )
            commit_snapshot(merged, self.target_dir, version, extra)
        finally:
            inc.unpersist()


def run_stream_budget_admission(
    stream_df: DataFrame,
    target_dir: str,
    budgets: dict,
    score_col: str,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    n_buckets: int = 256,
    checkpoint_dir: str | None = None,
) -> None:
    """availableNow drain into the standing admitted table; same
    checkpoint-ownership discipline as the sketch sinks."""
    from .sketch import _drain, _guard_checkpoint

    _guard_checkpoint(target_dir, checkpoint_dir)
    sink = BudgetAdmissionSink(
        target_dir,
        budgets,
        score_col,
        source_col=source_col,
        id_col=id_col,
        n_tokens_col=n_tokens_col,
        n_buckets=n_buckets,
        checkpoint_dir=checkpoint_dir,
    )
    _drain(stream_df, sink, checkpoint_dir)


def read_admitted(spark: SparkSession, target_dir: str) -> DataFrame:
    """The live standing admitted table (snapshot-isolated)."""
    return read_current(spark, target_dir)


def recalibrate_admission(
    spark: SparkSession, target_dir: str, new_budgets: dict
) -> dict:
    """Migrate a standing admission table to NEW per-source budgets
    (r15): the sink refuses a recalibrated configuration by design
    (admissions across different budget tables do not compose), which
    protected correctness but left no path for the real operational
    event "the mixture plan changed mid-stream". This maintenance op IS
    that path, with semantics stated plainly:

    - the new admitted set is the batch operator's quality cut
      (``stratified_budget_selection`` — score DESC, md5 tiebreak,
      inclusive prefix) applied to the STANDING ADMITTED TABLE under the
      new budgets. Shrinking a budget evicts exactly the re-cut
      complement; growing one keeps every admitted doc (their mass fits
      the old budget, hence the larger one) and raises headroom.
    - recalibration CANNOT resurrect documents earlier waves rejected —
      the sink retains nothing it rejected (the same wave-greedy
      information bound the module docstring states; admission_regret
      quantifies what hindsight would have kept).
    - every source with admitted rows must be named in ``new_budgets``
      (the operator's coverage rule — evict a source explicitly with
      budget 0, never by omission); new sources may be added freely and
      apply from the next drain.
    - the commit is atomic and versioned: new snapshot + updated
      calibration/spent flip together; the stream's replay gate
      (``last_stream_batch``) and checkpoint pin carry forward
      unchanged, so the next drain composes against the remaining
      budgets with no stream id consumed.
    - CONCURRENCY CONTRACT (r16, the r15-ADVICE medium finding):
      recalibration must NOT run against a target with an active drain.
      Both writers commit at ``pointer.batch_id + 1`` from their own
      pointer read, so an interleaved drain commit would collide with
      (and ``commit_snapshot`` would rmtree) this recalibration's
      version dir, silently losing the new budgets/spent. Enforced: the
      pointer is RE-READ immediately before commit and the whole
      operation raises if anything changed since the initial read —
      nothing has been written at that point, so the refusal is clean
      (re-run the recalibration after the drain settles). The residual
      window between the re-read and the pointer flip is microseconds
      vs the batch-start-to-commit seconds the check closes; the
      operational rule above remains the guarantee, the check makes
      violating it loud instead of silent.

    Returns {"evicted_docs", "kept_docs", "spent": {source: tokens}}."""
    from ..queries.textops import stratified_budget_selection

    pointer = read_pointer(target_dir)
    if pointer is None:
        raise ValueError(f"no committed admission state at {target_dir!r}")
    cal = pointer["calibration"]
    bmap = {str(k): int(v) for k, v in new_budgets.items()}
    for s, b in bmap.items():
        if b < 0:
            raise ValueError(f"budget for source {s!r} must be >= 0, got {b}")
    src, idc = cal["source_col"], cal["id_col"]
    admitted = read_current(spark, target_dir).persist()
    try:
        n_admitted = admitted.count()
        recut = stratified_budget_selection(
            admitted.select(idc, src, "score", "n_tokens"),
            bmap,
            "score",
            source_col=src,
            id_col=idc,
            n_buckets=cal["n_buckets"],
        )
        # carry each surviving doc's original admitted_batch; cum_tokens
        # are the re-cut's fresh per-source running mass under the new
        # ranking-prefix (the standing table's old offsets described a
        # budget table that no longer exists). The batch lookup is
        # aggregated to ONE row per (id, source) first (r15-ADVICE low
        # finding): the sink never dedups doc ids across waves, so a doc
        # admitted in two waves has two standing rows — joining the raw
        # frame would fan the re-cut out multiplicatively and inflate
        # kept_docs/spent beyond the re-cut mass. F.min = the earliest
        # wave that admitted the doc.
        merged = recut.select(
            idc, src, "score", "n_tokens", "cum_tokens"
        ).join(
            admitted.groupBy(idc, src).agg(
                F.min("admitted_batch").alias("admitted_batch")
            ),
            [idc, src],
        ).persist()
        try:
            kept = merged.count()
            new_spent_rows = {
                r[src]: int(r["m"])
                for r in merged.groupBy(src)
                .agg(F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("m"))
                .collect()
            }
            new_spent = {s: new_spent_rows.get(s, 0) for s in bmap}
            extra = {
                k: v
                for k, v in pointer.items()
                if k not in ("batch_id", "version", "keep_versions")
            }
            extra["calibration"] = {**cal, "budgets": bmap}
            extra["spent"] = new_spent
            extra.setdefault(
                "last_stream_batch", pointer["batch_id"]
            )
            # concurrent-writer guard (docstring CONCURRENCY CONTRACT):
            # refuse — before anything is written — if a drain committed
            # since the initial pointer read; proceeding would collide on
            # version batch_id+1 and one writer's commit would be lost
            now = read_pointer(target_dir)
            if now != pointer:
                raise RuntimeError(
                    f"admission state at {target_dir!r} changed while "
                    "recalibrating (an active drain committed "
                    f"version {now and now.get('batch_id')} past the "
                    f"{pointer['batch_id']} this recalibration read) — "
                    "recalibrate_admission must not run against a target "
                    "with an in-flight drain; re-run after it settles"
                )
            commit_snapshot(
                merged, target_dir, pointer["batch_id"] + 1, extra
            )
        finally:
            merged.unpersist()
    finally:
        admitted.unpersist()
    return {
        "evicted_docs": int(n_admitted - kept),
        "kept_docs": int(kept),
        "spent": new_spent,
    }


def admission_regret(
    spark: SparkSession, target_dir: str, corpus: DataFrame
) -> DataFrame:
    """Quantify the wave-greedy tradeoff (r15, r14 verdict stretch #7):
    compare the standing admitted table against what the BATCH operator
    would have selected over ``corpus`` (everything seen so far, caller-
    supplied — the sink deliberately retains nothing it rejected) under
    the SAME calibration. The divergence is documented and pinned as a
    semantics fact ("a later great document can be crowded out by an
    earlier mediocre one"); this readout turns it into numbers an
    operator can act on: how many documents the greedy stream kept that
    hindsight would swap, and how much score mass the swaps cost.

    Output one row per source (plus every budgeted source, zero-filled):
    (source, admitted_docs, hindsight_docs, common_docs,
    only_streaming_docs, only_hindsight_docs, admitted_tokens,
    hindsight_tokens, admitted_score_sum, hindsight_score_sum) —
    ``hindsight_*`` being the batch selection. regret in score mass =
    hindsight_score_sum - admitted_score_sum (>= 0 per source whenever
    the corpus truly contains everything the stream saw, since the batch
    cut is the per-source optimum of the same inclusive-prefix rule).

    Pure readout: one batch selection over the corpus + one outer join
    against the budget-bounded admitted table + one |sources|-row
    aggregate. No sink state is touched; per-wave cost is unaffected.
    The zero-token exclusion mirrors the sink's admission rule, so a
    zero-token doc can never appear as false regret."""
    from ..queries.textops import stratified_budget_selection

    pointer = read_pointer(target_dir)
    if pointer is None:
        raise ValueError(f"no committed admission state at {target_dir!r}")
    cal = pointer["calibration"]
    src, idc, ntc = cal["source_col"], cal["id_col"], cal["n_tokens_col"]
    # one row per (id, source) BEFORE the outer join (r16-ADVICE low,
    # mirroring the recalibrate lookup aggregation): a doc admitted in two
    # waves has two standing rows, and unaggregated they would fan the
    # single hindsight row out — inflating hindsight_docs/common_docs/
    # hindsight_tokens for that cell. F.min keeps the dedup deterministic.
    # Stated contract (r17 ADVICE low): the sink's committed 'spent'
    # counters deliberately count RE-DELIVERIES (each admitted wave row
    # debits the budget — the at-least-once stream's conservative
    # accounting), while this readout is doc-deduplicated, so
    # admitted_tokens here can be LOWER than the spent counters when the
    # same doc was re-admitted across waves. That gap measures duplicate
    # deliveries, not lost tokens.
    admitted = (
        read_current(spark, target_dir)
        .select(
            F.col(idc).alias("__id"),
            F.col(src).alias("__src"),
            F.col("n_tokens").alias("a_toks"),
            F.col("score").alias("a_score"),
        )
        .groupBy("__id", "__src")
        .agg(F.min("a_toks").alias("a_toks"), F.min("a_score").alias("a_score"))
    )
    hindsight = stratified_budget_selection(
        corpus.filter(F.col(ntc).isNotNull() & (F.col(ntc) > 0)),
        cal["budgets"],
        cal["score_col"],
        source_col=src,
        id_col=idc,
        n_tokens_col=ntc,
        n_buckets=cal["n_buckets"],
    ).select(
        F.col(idc).alias("__id"),
        F.col(src).alias("__src"),
        F.col("n_tokens").alias("h_toks"),
        F.col("score").alias("h_score"),
    )
    both = admitted.join(hindsight, ["__id", "__src"], "full_outer")
    per_src = both.groupBy("__src").agg(
        F.count(F.col("a_toks")).alias("admitted_docs"),
        F.count(F.col("h_toks")).alias("hindsight_docs"),
        F.count(F.when(F.col("a_toks").isNotNull() & F.col("h_toks").isNotNull(), 1)).alias("common_docs"),
        F.count(F.when(F.col("a_toks").isNotNull() & F.col("h_toks").isNull(), 1)).alias("only_streaming_docs"),
        F.count(F.when(F.col("a_toks").isNull() & F.col("h_toks").isNotNull(), 1)).alias("only_hindsight_docs"),
        F.coalesce(F.sum("a_toks"), F.lit(0)).alias("admitted_tokens"),
        F.coalesce(F.sum("h_toks"), F.lit(0)).alias("hindsight_tokens"),
        F.coalesce(F.sum("a_score"), F.lit(0.0)).alias("admitted_score_sum"),
        F.coalesce(F.sum("h_score"), F.lit(0.0)).alias("hindsight_score_sum"),
    )
    # zero-fill budgeted sources the stream never admitted from (and the
    # hindsight cut skipped): the report must name every budget row
    budgeted = spark.createDataFrame(
        [(s,) for s in cal["budgets"]], "__src string"
    )
    zero = [
        "admitted_docs", "hindsight_docs", "common_docs",
        "only_streaming_docs", "only_hindsight_docs",
        "admitted_tokens", "hindsight_tokens",
    ]
    out = budgeted.join(per_src, "__src", "full_outer").select(
        F.col("__src").alias(src),
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in zero],
        F.coalesce(F.col("admitted_score_sum"), F.lit(0.0)).alias(
            "admitted_score_sum"
        ),
        F.coalesce(F.col("hindsight_score_sum"), F.lit(0.0)).alias(
            "hindsight_score_sum"
        ),
    )
    return out


class CurriculumAdmissionSink:
    """``foreachBatch`` sink: PHASE-ORDERED wave-greedy admission (r16,
    r15 verdict stretch #5) — the streaming member of the curriculum
    family, closing the same batch<->stream gap for
    :func:`~..queries.textops.curriculum_phase_selection` that
    :class:`BudgetAdmissionSink` closed for the flat stratified cut.

    Contract, stated plainly: each micro-batch runs the EXACT batch
    curriculum operator over the wave's token-bearing documents against
    the per-(phase, source) budgets REMAINING after every earlier wave —
    each document is admitted to the highest-priority phase with
    remaining budget for its source (list order IS priority order,
    exclusively, the batch op's structural anti-join), or rejected
    forever. The cut math cannot fork from the batch semantics because
    it IS the batch op, wave by wave. What is NOT promised: equality
    with the batch curriculum over the concatenated corpus — the same
    wave-greedy information bound the module docstring states (an early
    mediocre doc can hold a phase slot hindsight would give a later
    great one); pipelines needing the global ranking run the batch
    operator over the landed corpus.

    Guarantees (all pinned): per-(phase, source) admitted mass never
    exceeds that phase's budget at any moment; a document lands in AT
    MOST ONE phase; replayed batch ids are no-ops; admitted rows and
    the per-(phase, source) spent counters commit ATOMICALLY in one
    snapshot; the calibration (ordered phases + budgets, columns,
    bucket count) is pinned on first commit and refused on mismatch;
    zero-token rows are inadmissible (the boundedness rule inherited
    from BudgetAdmissionSink — admitted rows <= total budget mass
    across all phases).

    Scale shape per micro-batch: P stratified passes over the WAVE
    (never history; P = phase count, a small constant), one bounded
    per-(phase, source) aggregate of newly admitted mass, one standing
    union. The batch op's per-phase tracked caches are released
    surgically after each commit (a long-lived stream must not
    accumulate P cache pins per wave)."""

    def __init__(
        self,
        target_dir: str,
        phases,
        score_col: str,
        *,
        source_col: str = "source",
        id_col: str = "doc_id",
        n_tokens_col: str = "n_tokens",
        n_buckets: int = 256,
        checkpoint_dir: str | None = None,
    ) -> None:
        if not phases:
            raise ValueError(
                "phases must be a non-empty ordered list of (name, budgets)"
            )
        self.phases = [
            (str(n), {str(k): int(v) for k, v in b.items()}) for n, b in phases
        ]
        names = [n for n, _ in self.phases]
        if len(set(names)) != len(names):
            dupes = sorted({n for n in names if names.count(n) > 1})
            raise ValueError(f"duplicate phase names: {dupes}")
        if "phase" in (source_col, id_col, n_tokens_col, score_col):
            raise ValueError(
                "'phase' is the sink's output phase-label column — rename "
                "the colliding input column"
            )
        self.target_dir = target_dir
        self.score_col = score_col
        self.source_col = source_col
        self.id_col = id_col
        self.n_tokens_col = n_tokens_col
        self.n_buckets = n_buckets
        self.checkpoint_dir = checkpoint_dir

    @property
    def calibration(self) -> dict:
        return {
            # JSON-shaped (lists, not tuples) so the stored pointer
            # round-trips to an == comparable structure
            "phases": [[n, dict(b)] for n, b in self.phases],
            "score_col": self.score_col,
            "source_col": self.source_col,
            "id_col": self.id_col,
            "n_tokens_col": self.n_tokens_col,
            "n_buckets": self.n_buckets,
        }

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..queries.textops import curriculum_phase_selection
        from ..util import _LIVE_CACHES

        pointer = read_pointer(self.target_dir)
        if pointer is not None and batch_id <= pointer.get(
            "last_stream_batch", pointer["batch_id"]
        ):
            return  # replayed batch after recovery: already admitted
        spent: dict = {}
        if pointer is not None:
            stored = pointer.get("calibration")
            if stored is not None and stored != self.calibration:
                raise ValueError(
                    f"admission calibration mismatch for {self.target_dir!r}: "
                    f"standing state was built with {stored}, sink configured "
                    f"with {self.calibration} — admissions across different "
                    "curricula do not compose; match the stored parameters "
                    "or reset the target"
                )
            spent = {
                p: {s: int(v) for s, v in per.items()}
                for p, per in pointer.get("spent", {}).items()
            }
        remaining = [
            (
                name,
                {
                    s: max(0, b - spent.get(name, {}).get(s, 0))
                    for s, b in budgets.items()
                },
            )
            for name, budgets in self.phases
        ]
        wave = batch_df.filter(
            F.col(self.n_tokens_col).isNotNull()
            & (F.col(self.n_tokens_col) > 0)
        )
        spark = batch_df.sparkSession
        n_cached = len(_LIVE_CACHES)
        try:
            # the batch operator IS the per-wave phase-ordered cut; its
            # cum_tokens are per (phase, source) relative to THIS wave's
            # remaining budgets — the spent offsets lift them to the
            # global running mass
            admitted = curriculum_phase_selection(
                wave,
                remaining,
                self.score_col,
                source_col=self.source_col,
                id_col=self.id_col,
                n_tokens_col=self.n_tokens_col,
                n_buckets=self.n_buckets,
            )
            off = spark.createDataFrame(
                [
                    (name, s, spent.get(name, {}).get(s, 0))
                    for name, budgets in self.phases
                    for s in budgets
                ],
                f"phase string, {self.source_col} string, __spent long",
            )
            inc = (
                admitted.join(F.broadcast(off), ["phase", self.source_col])
                .select(
                    self.id_col,
                    self.source_col,
                    "score",
                    "n_tokens",
                    (F.col("cum_tokens") + F.col("__spent")).alias("cum_tokens"),
                    "phase",
                    F.lit(batch_id).cast("long").alias("admitted_batch"),
                )
                .persist()
            )
            try:
                new_mass = {
                    (r["phase"], r[self.source_col]): int(r["m"])
                    for r in inc.groupBy("phase", self.source_col)
                    .agg(F.sum("n_tokens").alias("m"))
                    .collect()
                }
                new_spent = {
                    name: {
                        s: spent.get(name, {}).get(s, 0)
                        + new_mass.get((name, s), 0)
                        for s in budgets
                    }
                    for name, budgets in self.phases
                }
                if pointer is not None:
                    merged = read_current(spark, self.target_dir).unionByName(inc)
                else:
                    merged = inc
                extra: dict = {
                    "calibration": self.calibration,
                    "spent": new_spent,
                    "last_stream_batch": batch_id,
                }
                if self.checkpoint_dir is not None:
                    extra["stream_checkpoint"] = os.path.abspath(
                        self.checkpoint_dir
                    )
                version = (
                    (pointer["batch_id"] + 1) if pointer is not None else batch_id
                )
                # pre-commit pointer re-read (r16-ADVICE low) — see
                # BudgetAdmissionSink.__call__: a recalibration committed
                # mid-drain must refuse THIS commit loudly instead of
                # being silently destroyed by the stale-version write.
                now = read_pointer(self.target_dir)
                if now != pointer:
                    raise RuntimeError(
                        f"admission state at {self.target_dir!r} changed "
                        "while this batch was draining (a concurrent "
                        "writer committed version "
                        f"{now and now.get('batch_id')} past the "
                        f"{pointer and pointer.get('batch_id')} this batch "
                        "read) — recalibration must not run against a "
                        "target with an in-flight drain; re-run the drain "
                        "after it settles"
                    )
                commit_snapshot(merged, self.target_dir, version, extra)
            finally:
                inc.unpersist()
        finally:
            # surgical release of THIS wave's phase caches only (the
            # curriculum op tracked-caches each phase's selection to
            # avoid quadratic re-execution; a stream must not accumulate
            # P pins per wave, and a blanket release would evict caches
            # the surrounding session owns)
            while len(_LIVE_CACHES) > n_cached:
                df = _LIVE_CACHES.pop()
                try:
                    df.unpersist()
                except Exception:
                    pass


def run_stream_curriculum_admission(
    stream_df: DataFrame,
    target_dir: str,
    phases,
    score_col: str,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    n_buckets: int = 256,
    checkpoint_dir: str | None = None,
) -> None:
    """availableNow drain into the standing phase-admitted table; same
    checkpoint-ownership discipline as the sketch sinks."""
    from .sketch import _drain, _guard_checkpoint

    _guard_checkpoint(target_dir, checkpoint_dir)
    sink = CurriculumAdmissionSink(
        target_dir,
        phases,
        score_col,
        source_col=source_col,
        id_col=id_col,
        n_tokens_col=n_tokens_col,
        n_buckets=n_buckets,
        checkpoint_dir=checkpoint_dir,
    )
    _drain(stream_df, sink, checkpoint_dir)


def recalibrate_curriculum_admission(
    spark: SparkSession, target_dir: str, new_phases
) -> dict:
    """Migrate a standing PHASE-admitted table to a NEW ordered phase
    list (r16): the curriculum sink refuses a changed calibration by
    design; this is its sanctioned migration path — the
    ``recalibrate_admission`` contract applied to the curriculum sink,
    with the r15-ADVICE hardening built in from day one. Semantics:

    - the new standing table is the batch curriculum
      (:func:`~..queries.textops.curriculum_phase_selection`) applied to
      the standing admitted DOCUMENTS (all phases pooled — phase
      membership is recomputed from scratch under the new priority
      order) with the new budgets. Shrinking total budget evicts
      exactly the re-cut complement; documents may MOVE between phases
      (that is the point of a phase recalibration).
    - cannot resurrect documents earlier waves rejected (the sink
      retains nothing it rejected; ``curriculum_admission_regret``
      quantifies that bound).
    - every source with admitted rows must be named in EVERY new
      phase's budgets (each phase's cut inherits the stratified
      coverage rule — evict a source explicitly with budget 0, never by
      omission); new sources may be added freely and apply from the
      next drain.
    - provenance: each surviving doc keeps the EARLIEST
      ``admitted_batch`` that admitted it, via a lookup aggregated to
      one row per (id, source) BEFORE the join (duplicate standing rows
      from re-delivered docs cannot fan the re-cut out).
    - atomic + guarded: new snapshot, calibration and per-(phase,
      source) spent flip together; the pointer is RE-READ immediately
      before commit and the operation refuses (nothing written) if a
      drain committed since the initial read — the same
      version-collision race ``recalibrate_admission`` guards; the
      stream replay gate and checkpoint pin carry forward unchanged.

    Returns {"evicted_docs", "kept_docs", "moved_docs",
    "spent": {phase: {source: tokens}}} — moved_docs counts survivors
    whose phase changed."""
    from ..queries.textops import curriculum_phase_selection

    pointer = read_pointer(target_dir)
    if pointer is None:
        raise ValueError(f"no committed admission state at {target_dir!r}")
    cal = pointer["calibration"]
    if "phases" not in cal:
        raise ValueError(
            f"{target_dir!r} holds a FLAT admission table (no phases in "
            "its calibration) — use recalibrate_admission for it"
        )
    if not new_phases:
        raise ValueError(
            "new_phases must be a non-empty ordered list of (name, budgets)"
        )
    phases = [
        (str(n), {str(k): int(v) for k, v in b.items()}) for n, b in new_phases
    ]
    names = [n for n, _ in phases]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate phase names: {dupes}")
    for n, b in phases:
        for s, v in b.items():
            if v < 0:
                raise ValueError(
                    f"phase {n!r}: budget for source {s!r} must be >= 0, got {v}"
                )
    src, idc = cal["source_col"], cal["id_col"]
    admitted = read_current(spark, target_dir).persist()
    try:
        n_admitted = admitted.count()
        recut = curriculum_phase_selection(
            admitted.select(idc, src, "score", "n_tokens"),
            phases,
            "score",
            source_col=src,
            id_col=idc,
            n_buckets=cal["n_buckets"],
        )
        lookup = admitted.groupBy(idc, src).agg(
            F.min("admitted_batch").alias("admitted_batch"),
            # one standing phase per (id, source) suffices for the moved
            # count; duplicates across waves always share a phase or the
            # earliest wins — F.min keeps it deterministic
            F.min("phase").alias("__old_phase"),
        )
        merged = (
            recut.select(idc, src, "score", "n_tokens", "cum_tokens", "phase")
            .join(lookup, [idc, src])
            .persist()
        )
        try:
            kept = merged.count()
            moved = merged.filter(F.col("phase") != F.col("__old_phase")).count()
            new_mass = {
                (r["phase"], r[src]): int(r["m"])
                for r in merged.groupBy("phase", src)
                .agg(F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("m"))
                .collect()
            }
            new_spent = {
                n: {s: new_mass.get((n, s), 0) for s in b} for n, b in phases
            }
            extra = {
                k: v
                for k, v in pointer.items()
                if k not in ("batch_id", "version", "keep_versions")
            }
            extra["calibration"] = {
                **cal, "phases": [[n, dict(b)] for n, b in phases],
            }
            extra["spent"] = new_spent
            extra.setdefault("last_stream_batch", pointer["batch_id"])
            now = read_pointer(target_dir)
            if now != pointer:
                raise RuntimeError(
                    f"admission state at {target_dir!r} changed while "
                    "recalibrating (an active drain committed "
                    f"version {now and now.get('batch_id')} past the "
                    f"{pointer['batch_id']} this recalibration read) — "
                    "recalibration must not run against a target with an "
                    "in-flight drain; re-run after it settles"
                )
            commit_snapshot(
                merged.drop("__old_phase"),
                target_dir,
                pointer["batch_id"] + 1,
                extra,
            )
        finally:
            merged.unpersist()
    finally:
        admitted.unpersist()
    return {
        "evicted_docs": int(n_admitted - kept),
        "kept_docs": int(kept),
        "moved_docs": int(moved),
        "spent": new_spent,
    }


def curriculum_admission_regret(
    spark: SparkSession, target_dir: str, corpus: DataFrame
) -> DataFrame:
    """Phase-ordered wave-greedy tradeoff readout (r16, the
    ``admission_regret`` shape applied to :class:`CurriculumAdmissionSink`):
    compare the standing phase-admitted table against what the BATCH
    curriculum (:func:`~..queries.textops.curriculum_phase_selection`)
    would assign over ``corpus`` (everything seen so far,
    caller-supplied — the sink retains nothing it rejected) under the
    SAME calibration. Output one row per (phase, source) — every
    budgeted pair present, zero-filled — with the same columns as
    ``admission_regret`` (admitted/hindsight doc + token counts,
    common/only-streaming/only-hindsight splits, score sums).

    A document the stream admitted to one phase and hindsight assigns
    to ANOTHER counts as only_streaming in its streamed phase and
    only_hindsight in its hindsight phase — per-(phase, source)
    accounting, deliberately: phase membership IS the decision this
    sink makes, so a phase swap is two divergences, not zero.

    HONEST BOUND, and it is weaker than the flat readout's: for the
    FIRST-listed phase, hindsight_score_sum >= admitted_score_sum per
    source whenever the corpus contains everything streamed (phase 1's
    batch cut is the per-source optimum of the same inclusive-prefix
    rule over a superset). For LATER phases no such inequality holds —
    each selects from what earlier phases left, and greedy-vs-global
    divergence upstream reshuffles the remainder both ways. The
    readout reports the numbers; it does not claim per-phase optimality
    it does not have.

    Pure readout: one batch curriculum over the corpus + one outer
    join against the budget-bounded admitted table + one bounded
    |phases|x|sources|-row aggregate. No sink state is touched."""
    from ..queries.textops import curriculum_phase_selection

    pointer = read_pointer(target_dir)
    if pointer is None:
        raise ValueError(f"no committed admission state at {target_dir!r}")
    cal = pointer["calibration"]
    if "phases" not in cal:
        raise ValueError(
            f"{target_dir!r} holds a FLAT admission table (no phases in "
            "its calibration) — use admission_regret for it"
        )
    phases = [(n, {str(k): int(v) for k, v in b.items()}) for n, b in cal["phases"]]
    src, idc, ntc = cal["source_col"], cal["id_col"], cal["n_tokens_col"]
    # one row per (phase, source, id) BEFORE the outer join (r16-ADVICE
    # low, mirroring the recalibrate lookup aggregation): duplicate
    # standing rows from a doc re-delivered across waves must not fan the
    # single hindsight row out. F.min keeps the dedup deterministic.
    # Same stated contract as admission_regret (r17 ADVICE low): 'spent'
    # counters count re-deliveries; this readout is doc-deduplicated, so
    # the gap between them measures duplicate deliveries.
    admitted = (
        read_current(spark, target_dir)
        .select(
            F.col("phase").alias("__phase"),
            F.col(src).alias("__src"),
            F.col(idc).alias("__id"),
            F.col("n_tokens").alias("a_toks"),
            F.col("score").alias("a_score"),
        )
        .groupBy("__phase", "__src", "__id")
        .agg(F.min("a_toks").alias("a_toks"), F.min("a_score").alias("a_score"))
    )
    hindsight = curriculum_phase_selection(
        corpus.filter(F.col(ntc).isNotNull() & (F.col(ntc) > 0)),
        phases,
        cal["score_col"],
        source_col=src,
        id_col=idc,
        n_tokens_col=ntc,
        n_buckets=cal["n_buckets"],
    ).select(
        F.col("phase").alias("__phase"),
        F.col(src).alias("__src"),
        F.col(idc).alias("__id"),
        F.col("n_tokens").alias("h_toks"),
        F.col("score").alias("h_score"),
    )
    both = admitted.join(hindsight, ["__phase", "__src", "__id"], "full_outer")
    per = both.groupBy("__phase", "__src").agg(
        F.count(F.col("a_toks")).alias("admitted_docs"),
        F.count(F.col("h_toks")).alias("hindsight_docs"),
        F.count(
            F.when(F.col("a_toks").isNotNull() & F.col("h_toks").isNotNull(), 1)
        ).alias("common_docs"),
        F.count(
            F.when(F.col("a_toks").isNotNull() & F.col("h_toks").isNull(), 1)
        ).alias("only_streaming_docs"),
        F.count(
            F.when(F.col("a_toks").isNull() & F.col("h_toks").isNotNull(), 1)
        ).alias("only_hindsight_docs"),
        F.coalesce(F.sum("a_toks"), F.lit(0)).alias("admitted_tokens"),
        F.coalesce(F.sum("h_toks"), F.lit(0)).alias("hindsight_tokens"),
        F.coalesce(F.sum("a_score"), F.lit(0.0)).alias("admitted_score_sum"),
        F.coalesce(F.sum("h_score"), F.lit(0.0)).alias("hindsight_score_sum"),
    )
    budgeted = spark.createDataFrame(
        [(n, s) for n, b in phases for s in b], "__phase string, __src string"
    )
    zero = [
        "admitted_docs", "hindsight_docs", "common_docs",
        "only_streaming_docs", "only_hindsight_docs",
        "admitted_tokens", "hindsight_tokens",
    ]
    return budgeted.join(per, ["__phase", "__src"], "full_outer").select(
        F.col("__phase").alias("phase"),
        F.col("__src").alias(src),
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in zero],
        F.coalesce(F.col("admitted_score_sum"), F.lit(0.0)).alias(
            "admitted_score_sum"
        ),
        F.coalesce(F.col("hindsight_score_sum"), F.lit(0.0)).alias(
            "hindsight_score_sum"
        ),
    )


def curriculum_admission_report(target_dir: str) -> dict:
    """Per-phase budget utilization from the pointer alone (no Spark):
    {phase: {source: {budget, spent, remaining}}}, phases in priority
    order."""
    pointer = read_pointer(target_dir)
    if pointer is None:
        raise ValueError(f"no committed admission state at {target_dir!r}")
    spent = pointer.get("spent", {})
    report: dict = {}
    for name, budgets in pointer["calibration"]["phases"]:
        report[name] = {
            s: {
                "budget": int(b),
                "spent": int(spent.get(name, {}).get(s, 0)),
                "remaining": int(b) - int(spent.get(name, {}).get(s, 0)),
            }
            for s, b in sorted(budgets.items())
        }
    return report


def admission_report(target_dir: str) -> dict:
    """Budget utilization from the pointer alone (no Spark needed):
    {source: {budget, spent, remaining}}."""
    pointer = read_pointer(target_dir)
    if pointer is None:
        raise ValueError(f"no committed admission state at {target_dir!r}")
    budgets = pointer["calibration"]["budgets"]
    spent = pointer.get("spent", {})
    return {
        s: {
            "budget": int(b),
            "spent": int(spent.get(s, 0)),
            "remaining": int(b) - int(spent.get(s, 0)),
        }
        for s, b in sorted(budgets.items())
    }
