"""Streaming sketch maintenance: ``foreachBatch`` sinks that fold each
micro-batch into a standing monoid sketch table (operators/sketch.py) —
Count-Min for heavy hitters, Bloom for membership/decontamination — on
the repo's snapshot-commit protocol.

Why the monoid matters here: the sketch of everything-ever-streamed is
``merge(standing, build(batch))`` — one bounded-size union + groupBy
per micro-batch, never a re-read of history, and the state stays
bounded no matter how wide the key domain grows (CMS: depth x width
counters; Bloom: n_bits/64 words — measured curves in docs/SCALE.md).
Heavy-hitter queries (``cms_heavy_hitters``) and membership probes
(``bloom_probe``) run against the live snapshot at any time — for the
Bloom case that means a crawl stream continuously maintains the
decontamination filter that ``bloom_decontaminated_docs`` prunes with.

Exactly-once and ownership: same contracts as UpsertSink —
``commit_snapshot`` versioned dirs + atomic pointer, replayed batch ids
skipped, the stream checkpoint recorded in the pointer and enforced
(a fresh checkpoint would restart ids and silently skip data), and the
sketch calibration pinned on first commit and refused on mismatch
(sketches across calibrations do not merge — same contract as the
near-dup signature state).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.sketch import (
    BLOOM_K,
    BLOOM_N_BITS,
    CMS_DEPTH,
    CMS_WIDTH,
    SAMPLE_SLOTS,
    SKETCH_SEED,
    bloom_build,
    bloom_merge,
    cms_merge,
    cms_sketch,
    minima_merge,
    minima_sample,
)
from .sinks import commit_snapshot, read_current, read_pointer


class _MonoidSketchSink:
    """``foreachBatch`` template: merge each micro-batch's sketch into
    the standing sketch table at ``target_dir``. Subclasses supply the
    per-batch ``_build`` and the monoid ``_merge`` plus ``calibration``."""

    def __init__(self, target_dir: str, checkpoint_dir: str | None) -> None:
        self.target_dir = target_dir
        self.checkpoint_dir = checkpoint_dir

    @property
    def calibration(self) -> dict:
        raise NotImplementedError

    def _build(self, batch_df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def _merge(self, standing: DataFrame, inc: DataFrame) -> DataFrame:
        raise NotImplementedError

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        pointer = read_pointer(self.target_dir)
        if pointer is not None and batch_id <= pointer["batch_id"]:
            return  # replayed batch after recovery: already merged
        if pointer is not None:
            stored = pointer.get("calibration")
            if stored is not None and stored != self.calibration:
                raise ValueError(
                    f"sketch calibration mismatch for {self.target_dir!r}: "
                    f"standing state was built with {stored}, sink configured "
                    f"with {self.calibration} — sketches across calibrations "
                    "do not merge; match the stored parameters or reset the "
                    "target"
                )
        inc = self._build(batch_df)
        if pointer is not None:
            merged = self._merge(
                read_current(batch_df.sparkSession, self.target_dir), inc
            )
        else:
            merged = inc
        extra: dict = {"calibration": self.calibration}
        if self.checkpoint_dir is not None:
            extra["stream_checkpoint"] = os.path.abspath(self.checkpoint_dir)
        commit_snapshot(merged, self.target_dir, batch_id, extra)


class CmsSketchSink(_MonoidSketchSink):
    """Standing Count-Min sketch of ``key_col`` frequencies."""

    def __init__(
        self,
        target_dir: str,
        key_col: str,
        depth: int = CMS_DEPTH,
        width: int = CMS_WIDTH,
        seed: int = SKETCH_SEED,
        checkpoint_dir: str | None = None,
    ) -> None:
        super().__init__(target_dir, checkpoint_dir)
        self.key_col = key_col
        self.depth = depth
        self.width = width
        self.seed = seed

    @property
    def calibration(self) -> dict:
        return {
            "depth": self.depth,
            "width": self.width,
            "seed": self.seed,
            "key_col": self.key_col,
        }

    def _build(self, batch_df: DataFrame) -> DataFrame:
        return cms_sketch(
            batch_df,
            self.key_col,
            depth=self.depth,
            width=self.width,
            seed=self.seed,
        )

    def _merge(self, standing: DataFrame, inc: DataFrame) -> DataFrame:
        return cms_merge(standing, inc)


class BloomFilterSink(_MonoidSketchSink):
    """Standing Bloom membership filter of ``key_col`` (bit-or monoid):
    the streaming twin of the batch ``--bloom-key`` refresh."""

    def __init__(
        self,
        target_dir: str,
        key_col: str,
        n_bits: int = BLOOM_N_BITS,
        k: int = BLOOM_K,
        seed: int = SKETCH_SEED,
        checkpoint_dir: str | None = None,
    ) -> None:
        super().__init__(target_dir, checkpoint_dir)
        self.key_col = key_col
        self.n_bits = n_bits
        self.k = k
        self.seed = seed

    @property
    def calibration(self) -> dict:
        return {
            "n_bits": self.n_bits,
            "k": self.k,
            "seed": self.seed,
            "key_col": self.key_col,
        }

    def _build(self, batch_df: DataFrame) -> DataFrame:
        return bloom_build(
            batch_df, self.key_col, n_bits=self.n_bits, k=self.k, seed=self.seed
        )

    def _merge(self, standing: DataFrame, inc: DataFrame) -> DataFrame:
        return bloom_merge(standing, inc)


class MinimaSampleSink(_MonoidSketchSink):
    """Standing slot-minima coordinated uniform sample of ``key_col``
    (min monoid on a struct) — a bounded eval-set sample maintained
    over an unbounded stream, exactly-once under replay like the other
    sketch sinks."""

    def __init__(
        self,
        target_dir: str,
        key_col: str,
        slots: int = SAMPLE_SLOTS,
        seed: int = SKETCH_SEED,
        checkpoint_dir: str | None = None,
    ) -> None:
        super().__init__(target_dir, checkpoint_dir)
        self.key_col = key_col
        self.slots = slots
        self.seed = seed

    @property
    def calibration(self) -> dict:
        return {
            "slots": self.slots,
            "seed": self.seed,
            "key_col": self.key_col,
        }

    def _build(self, batch_df: DataFrame) -> DataFrame:
        return minima_sample(
            batch_df, self.key_col, slots=self.slots, seed=self.seed
        )

    def _merge(self, standing: DataFrame, inc: DataFrame) -> DataFrame:
        return minima_merge(standing, inc)


class NgramHistogramSink(_MonoidSketchSink):
    """Standing per-(source, bucket) hashed-n-gram occurrence histogram
    (count-sum monoid) — the streaming side of the corpus drift monitor.
    Each micro-batch folds its documents' hashed unigram+bigram bucket
    counts into the standing table (queries/textops.py::
    ngram_bucket_histogram, <= |sources| * n_buckets rows forever);
    ``stream_drift_report`` then scores the LIVE distribution of every
    source against a target corpus with the exact batch-audit arithmetic
    (jsd_from_histogram), so an operator watches mixture drift on an
    unbounded ingest stream without ever re-reading history."""

    def __init__(
        self,
        target_dir: str,
        source_col: str = "source",
        text_col: str = "text",
        n_buckets: int = None,
        checkpoint_dir: str | None = None,
    ) -> None:
        from ..queries.textops import _DSIR_BUCKETS

        super().__init__(target_dir, checkpoint_dir)
        self.source_col = source_col
        self.text_col = text_col
        self.n_buckets = _DSIR_BUCKETS if n_buckets is None else n_buckets

    @property
    def calibration(self) -> dict:
        return {
            "n_buckets": self.n_buckets,
            "source_col": self.source_col,
            "text_col": self.text_col,
        }

    def _build(self, batch_df: DataFrame) -> DataFrame:
        from ..queries.textops import ngram_bucket_histogram

        return ngram_bucket_histogram(
            batch_df,
            source_col=self.source_col,
            text_col=self.text_col,
            n_buckets=self.n_buckets,
        )

    def _merge(self, standing: DataFrame, inc: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        return (
            standing.unionByName(inc)
            .groupBy(self.source_col, "b")
            .agg(F.sum("c").alias("c"))
        )


def stream_drift_report(
    spark: SparkSession,
    target_dir: str,
    target: DataFrame,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-source JSD of the STANDING streamed histogram vs a target
    corpus — byte-identical to running source_divergence_audit over
    everything ever streamed (same jsd_from_histogram core, pinned by
    test), priced at one target fit + bounded-grid arithmetic: the
    corpus itself is never re-read."""
    from ..queries.textops import _dsir_bucket_histogram, jsd_from_histogram

    pointer = read_pointer(target_dir)
    if pointer is None:
        raise ValueError(f"no committed histogram at {target_dir!r}")
    calib = pointer["calibration"]
    tb = _dsir_bucket_histogram(target, calib["text_col"], calib["n_buckets"])
    return jsd_from_histogram(
        read_current(spark, target_dir),
        tb,
        source_col=calib["source_col"],
        n_buckets=calib["n_buckets"],
        alpha=alpha,
    )


def dsir_fit_from_stream(
    spark: SparkSession,
    target_dir: str,
    target: DataFrame,
    *,
    alpha: float = 1.0,
    sources: list | None = None,
    target_text_col: str | None = None,
) -> list:
    """Fit the DSIR log-ratio table with the STREAMED corpus as the
    corpus-side model (r15): the standing ``NgramHistogramSink`` grid
    uses the exact DSIR featurizer (hashed unigram+bigram buckets, the
    shared ``_dsir_buckets``), so its per-(source, bucket) counts summed
    over sources ARE the corpus bucket histogram — the corpus side of
    the fit costs one aggregate over the <= |sources| * n_buckets
    standing grid and NEVER re-reads a streamed document. The returned
    table is byte-identical to ``dsir_log_ratio_table`` over everything
    ever streamed (same ``_log_ratio_from_histograms`` arithmetic —
    pinned by test), so every selector consumes it unchanged via
    ``log_ratio=`` / ``--log-ratio``.

    This closes the loop between the drift monitor and the selection
    family: the same standing state that tells an operator WHICH sources
    drifted (``stream_drift_report``) now also fits the model that
    selects AGAINST the drift, with zero additional corpus passes.

    ``sources`` optionally restricts the corpus model to a subset of
    streamed sources (fit "importance vs the web slice only"); unknown
    names raise — a typo'd source silently fitting the full mixture
    would be the exact failure mode the budget operators' coverage rule
    refuses. ``target`` is featurized with the sink's pinned
    ``n_buckets`` calibration (stream and target models can never
    disagree on bucketing); ``target_text_col`` names the TARGET
    frame's text column when it differs from the sink's ``text_col``
    (r15 review finding: the target is a different table and need not
    share the stream's column name — bucketing is pinned, column
    naming is the caller's)."""
    from pyspark.sql import functions as F

    from ..queries.textops import (
        _dsir_bucket_histogram,
        _log_ratio_from_histograms,
    )

    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    pointer = read_pointer(target_dir)
    if pointer is None:
        raise ValueError(f"no committed histogram at {target_dir!r}")
    calib = pointer["calibration"]
    n_buckets, src_col = calib["n_buckets"], calib["source_col"]
    grid = read_current(spark, target_dir)
    if sources is not None:
        wanted = [str(s) for s in sources]
        have = {
            r["s"]
            for r in grid.select(
                F.col(src_col).cast("string").alias("s")
            )
            .distinct()
            .collect()
        }
        unknown = sorted(set(wanted) - have)
        if unknown:
            raise ValueError(
                f"sources not present in the streamed histogram: {unknown} "
                f"(streamed: {sorted(have)}) — a typo here would silently "
                "fit the wrong corpus model"
            )
        grid = grid.filter(F.col(src_col).cast("string").isin(wanted))
    cb = {
        int(r["b"]): int(r["c"])
        for r in grid.groupBy("b").agg(F.sum("c").alias("c")).collect()
    }
    tb = _dsir_bucket_histogram(
        target, target_text_col or calib["text_col"], n_buckets
    )
    return _log_ratio_from_histograms(tb, cb, n_buckets, alpha)


def _guard_checkpoint(target_dir: str, checkpoint_dir: str | None) -> None:
    """Refuse the silent-skip hole: a committed target must be resumed
    under its ORIGINAL checkpoint, or batch ids restart at 0 and the
    idempotence guard drops all new data."""
    pointer = read_pointer(target_dir)
    if pointer is None:
        return
    if checkpoint_dir is None:
        raise ValueError(
            f"target {target_dir!r} has committed batches; running "
            "without a checkpoint restarts batch ids at 0 and the "
            "idempotence guard would silently skip all new data — pass "
            "the original checkpoint_dir (or reset the target)"
        )
    stored = pointer.get("stream_checkpoint")
    if stored is not None and os.path.abspath(checkpoint_dir) != stored:
        raise ValueError(
            f"target {target_dir!r} has committed stream batches under "
            f"checkpoint {stored!r}; a different checkpoint restarts "
            "batch ids at 0 and the idempotence guard would silently "
            "skip all new data — pass the original checkpoint_dir (or "
            "reset the target)"
        )


def _drain(stream_df: DataFrame, sink, checkpoint_dir: str | None) -> None:
    writer = stream_df.writeStream.foreachBatch(sink)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_stream_cms_sketch(
    stream_df: DataFrame,
    target_dir: str,
    key_col: str,
    checkpoint_dir: str | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = SKETCH_SEED,
) -> None:
    """availableNow drain into the standing CMS; same checkpoint
    ownership discipline as run_foreach_batch_upsert."""
    _guard_checkpoint(target_dir, checkpoint_dir)
    sink = CmsSketchSink(
        target_dir,
        key_col,
        depth=depth,
        width=width,
        seed=seed,
        checkpoint_dir=checkpoint_dir,
    )
    _drain(stream_df, sink, checkpoint_dir)


def run_stream_bloom_filter(
    stream_df: DataFrame,
    target_dir: str,
    key_col: str,
    checkpoint_dir: str | None = None,
    n_bits: int = BLOOM_N_BITS,
    k: int = BLOOM_K,
    seed: int = SKETCH_SEED,
) -> None:
    """availableNow drain into the standing Bloom filter; same
    checkpoint ownership discipline as run_stream_cms_sketch."""
    _guard_checkpoint(target_dir, checkpoint_dir)
    sink = BloomFilterSink(
        target_dir,
        key_col,
        n_bits=n_bits,
        k=k,
        seed=seed,
        checkpoint_dir=checkpoint_dir,
    )
    _drain(stream_df, sink, checkpoint_dir)


def run_stream_minima_sample(
    stream_df: DataFrame,
    target_dir: str,
    key_col: str,
    checkpoint_dir: str | None = None,
    slots: int = SAMPLE_SLOTS,
    seed: int = SKETCH_SEED,
) -> None:
    """availableNow drain into the standing slot-minima sample; same
    checkpoint ownership discipline as run_stream_cms_sketch."""
    _guard_checkpoint(target_dir, checkpoint_dir)
    sink = MinimaSampleSink(
        target_dir,
        key_col,
        slots=slots,
        seed=seed,
        checkpoint_dir=checkpoint_dir,
    )
    _drain(stream_df, sink, checkpoint_dir)


def run_stream_ngram_histogram(
    stream_df: DataFrame,
    target_dir: str,
    source_col: str = "source",
    text_col: str = "text",
    n_buckets: int = None,
    checkpoint_dir: str | None = None,
) -> None:
    """availableNow drain into the standing n-gram histogram; same
    checkpoint ownership discipline as run_stream_cms_sketch."""
    _guard_checkpoint(target_dir, checkpoint_dir)
    sink = NgramHistogramSink(
        target_dir,
        source_col=source_col,
        text_col=text_col,
        n_buckets=n_buckets,
        checkpoint_dir=checkpoint_dir,
    )
    _drain(stream_df, sink, checkpoint_dir)


def read_stream_sketch(spark: SparkSession, target_dir: str) -> DataFrame:
    """The live standing sketch (snapshot-isolated)."""
    return read_current(spark, target_dir)
