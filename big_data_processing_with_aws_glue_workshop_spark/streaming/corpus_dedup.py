"""Streaming corpus dedup: a ``foreachBatch`` sink that dedups each
micro-batch of crawled documents against the SAME standing-corpus state
the batch refresh maintains (plans/incremental.py — append-only accepted
deltas + digest deltas + atomic pointer).

Why this shape: a 100 TB crawl usually lands BOTH ways — bulk backfills
as files (the bookmark-driven ``incremental_dedup_refresh``) and a live
firehose as a stream. Because both paths call the same
``apply_dedup_increment`` core against the same on-disk layout, they can
interleave on one corpus: a doc accepted by a streaming batch dedups a
later file-based backfill of the same text, and vice versa (pinned by
tests/test_corpus_dedup_stream.py). One corpus, two ingestion tempos, no
drifting second implementation.

Exactly-once: Structured Streaming replays the last uncommitted batch
after a failure; the sink records ``last_stream_batch`` in the pointer it
flips, and skips any batch id at or below it — the same idempotence
protocol as streaming/sinks.UpsertSink, composed with the dedup core's
own crash discipline (delta dirs are overwritten on same-batch replay;
the pointer flip is the only publish). The batch path's ``delta_files``
healing field and this sink's ``last_stream_batch`` coexist in the
pointer: each ingestion path consults only its own key.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.incremental import apply_dedup_increment, read_deduped
from .sinks import read_pointer


def _drift_after_commit(
    spark: SparkSession,
    target_dir: str,
    text_col: str,
    drift_key: str | None,
    delta_subdir: str = "accepted",
) -> dict | None:
    """Streaming alias of the shared corpus-drift protocol
    (operators/drift.py::corpus_drift_report — ONE implementation for
    both ingestion tempos; the CLI --drift gate wraps the same call).
    ``delta_subdir``: "accepted" for the doc/near-dup sinks, "docs" for
    the passage sink's rewritten-delta layout."""
    from ..operators.drift import corpus_drift_report

    return corpus_drift_report(
        spark, target_dir, text_col, drift_key=drift_key, delta_subdir=delta_subdir
    )


def _checkpoint_guard(target_dir: str, checkpoint_dir: str | None) -> None:
    """A target with committed stream batches refuses to run without THE
    checkpoint whose batch-id sequence makes the replay guard meaningful.
    Both failure modes are caught (r7 advisory closed the second): no
    checkpoint at all, and a FRESH (different) checkpoint — either
    restarts batch ids at 0, and the sink's ``batch_id <=
    last_stream_batch`` guard would then silently skip all new data up to
    the standing watermark. The pointer records the checkpoint location on
    the first streamed batch (``stream_checkpoint``) and this guard
    enforces identity on every later run."""
    pointer = read_pointer(target_dir)
    if pointer is None or "last_stream_batch" not in pointer:
        return
    if checkpoint_dir is None:
        raise ValueError(
            f"target {target_dir!r} has committed stream batches; running "
            "without a checkpoint restarts batch ids at 0 and the "
            "idempotence guard would silently skip new data — pass the "
            "original checkpoint_dir (or reset the target)"
        )
    stored = pointer.get("stream_checkpoint")
    if stored is not None and os.path.abspath(checkpoint_dir) != stored:
        raise ValueError(
            f"target {target_dir!r} has committed stream batches under "
            f"checkpoint {stored!r}; a different checkpoint "
            f"({os.path.abspath(checkpoint_dir)!r}) restarts batch ids at 0 "
            "and the idempotence guard would silently skip all new data up "
            "to the standing watermark — pass the original checkpoint_dir "
            "(or reset the target)"
        )


class CorpusDedupSink:
    """``foreachBatch`` callable: first-wins dedup of each micro-batch
    against the standing corpus at ``target_dir``. ``checkpoint_dir``
    (when known — the run_stream_* drivers pass it) is recorded in the
    pointer so later runs can enforce checkpoint identity."""

    def __init__(
        self,
        target_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        snapshot_compact_at: int = 16,
        checkpoint_dir: str | None = None,
        drift: bool = False,
        drift_key: str | None = None,
    ) -> None:
        self.target_dir = target_dir
        self.id_col = id_col
        self.text_col = text_col
        self.snapshot_compact_at = snapshot_compact_at
        self.checkpoint_dir = checkpoint_dir
        self.drift = drift
        self.drift_key = drift_key
        #: latest non-empty drift report (advisory, like the CLI summary
        #: field; a foreachBatch callable has no return channel)
        self.last_drift: dict | None = None

    def _pointer_fields(self, batch_id: int) -> dict:
        fields = {"last_stream_batch": batch_id}
        if self.checkpoint_dir is not None:
            fields["stream_checkpoint"] = os.path.abspath(self.checkpoint_dir)
        return fields

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        pointer = read_pointer(self.target_dir)
        if pointer is not None and batch_id <= pointer.get("last_stream_batch", -1):
            return  # replayed batch after recovery: already applied
        apply_dedup_increment(
            batch_df.sparkSession,
            batch_df,
            self.target_dir,
            pointer,
            id_col=self.id_col,
            text_col=self.text_col,
            snapshot_compact_at=self.snapshot_compact_at,
            extra_pointer_fields=self._pointer_fields(batch_id),
        )
        if self.drift:
            rep = _drift_after_commit(
                batch_df.sparkSession, self.target_dir, self.text_col, self.drift_key
            )
            if rep is not None:
                self.last_drift = rep


def run_stream_corpus_dedup(
    stream_df: DataFrame,
    target_dir: str,
    checkpoint_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    drift: bool = False,
    drift_key: str | None = None,
) -> CorpusDedupSink:
    """Drain ``stream_df`` into the deduped corpus with availableNow.
    Checkpoint discipline: see ``_checkpoint_guard``. ``drift=True``
    enables the per-batch drift gate (the streaming twin of the CLI's
    --drift); returns the sink so callers can read ``sink.last_drift``
    — a foreachBatch callable has no other return channel."""
    sink = CorpusDedupSink(
        target_dir,
        id_col=id_col,
        text_col=text_col,
        checkpoint_dir=checkpoint_dir,
        drift=drift,
        drift_key=drift_key,
    )
    _checkpoint_guard(target_dir, checkpoint_dir)
    writer = stream_df.writeStream.foreachBatch(sink)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return sink


def read_stream_deduped(spark: SparkSession, target_dir: str) -> DataFrame:
    """Alias of the batch reader — it is the same corpus."""
    return read_deduped(spark, target_dir)


class CorpusNearDupSink:
    """``foreachBatch`` twin of CorpusDedupSink for NEAR-duplicates:
    each micro-batch is dropped against the standing LSH bucket index +
    signature state (plans/incremental.py::apply_neardup_increment) —
    the same state the file-based ``incremental_neardup_refresh``
    maintains, so a streamed firehose and batch backfills interleave on
    one near-deduped corpus with one similarity calibration."""

    def __init__(
        self,
        target_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        sim_threshold: float = 0.7,
        snapshot_compact_at: int = 16,
        checkpoint_dir: str | None = None,
        drift: bool = False,
        drift_key: str | None = None,
    ) -> None:
        self.target_dir = target_dir
        self.id_col = id_col
        self.text_col = text_col
        self.sim_threshold = sim_threshold
        self.snapshot_compact_at = snapshot_compact_at
        self.checkpoint_dir = checkpoint_dir
        self.drift = drift
        self.drift_key = drift_key
        self.last_drift: dict | None = None

    _pointer_fields = CorpusDedupSink._pointer_fields

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..plans.incremental import apply_neardup_increment

        pointer = read_pointer(self.target_dir)
        if pointer is not None and batch_id <= pointer.get("last_stream_batch", -1):
            return
        apply_neardup_increment(
            batch_df.sparkSession,
            batch_df,
            self.target_dir,
            pointer,
            id_col=self.id_col,
            text_col=self.text_col,
            sim_threshold=self.sim_threshold,
            snapshot_compact_at=self.snapshot_compact_at,
            extra_pointer_fields=self._pointer_fields(batch_id),
        )
        if self.drift:
            rep = _drift_after_commit(
                batch_df.sparkSession, self.target_dir, self.text_col, self.drift_key
            )
            if rep is not None:
                self.last_drift = rep


class CorpusSemanticDupSink:
    """``foreachBatch`` twin of CorpusNearDupSink for SEMANTIC
    (embedding-cosine) duplicates: each micro-batch is dropped against
    the standing pinned-centroid vector state
    (plans/incremental.py::apply_semantic_increment) — the same state
    the file-based ``incremental_semantic_refresh`` maintains, so a
    streamed embedding firehose and batch backfills interleave on one
    semantically-deduped corpus with one (threshold, nlist, seed)
    calibration. The first COMMITTED batch fits and pins the centroids;
    every later batch (either tempo) assigns against them. No drift
    option: the corpus-drift report is text-keyed; embedding drift is
    the centroid-radius story, surfaced per batch as
    ``last_allow_share`` (the refresh stats' allowlist share — compare
    against plans/incremental.py::RECELL_ALLOW_SHARE_TRIGGER to
    schedule the `semantic-recell` maintenance op, or pass
    ``recell_on_trigger=True`` to have the sink run it itself after any
    batch whose share crosses the trigger).

    ``recell_on_trigger``: when True, a batch reporting allow_share >=
    RECELL_ALLOW_SHARE_TRIGGER is followed by an in-band
    ``semantic_recell`` (atomic; carry-forward keeps
    ``last_stream_batch``, so exactly-once replay is unaffected), and
    the sink ADOPTS the stored calibration's nlist before every batch —
    the recell changed the calibration, and on restart the constructor
    value would otherwise trip the refresh's mismatch guard. A crash
    between the batch flip and the recell flip leaves the post-batch
    state; the next triggered batch re-fires the recell."""

    def __init__(
        self,
        target_dir: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        threshold: float = 0.45,
        nlist: int = 16,
        seed: int = 42,
        checkpoint_dir: str | None = None,
        recell_on_trigger: bool = False,
    ) -> None:
        self.target_dir = target_dir
        self.id_col = id_col
        self.vec_col = vec_col
        self.threshold = threshold
        self.nlist = nlist
        self.seed = seed
        self.checkpoint_dir = checkpoint_dir
        self.recell_on_trigger = recell_on_trigger
        # allowlist pruning health of the most recent applied batch
        # (None until one applies; see RECELL_ALLOW_SHARE_TRIGGER) —
        # post-recell, the recovered standing-vs-standing share
        self.last_allow_share: float | None = None
        # recell executions this sink performed (observability + tests)
        self.recell_count: int = 0

    _pointer_fields = CorpusDedupSink._pointer_fields

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..plans.incremental import (
            apply_semantic_increment,
            maybe_recell_on_trigger,
        )

        pointer = read_pointer(self.target_dir)
        if pointer is not None and batch_id <= pointer.get("last_stream_batch", -1):
            return
        if batch_df.isEmpty() and pointer is None:
            return  # cannot fit centroids on an empty first batch
        if self.recell_on_trigger and pointer is not None:
            stored = (pointer.get("calibration") or {}).get("nlist")
            if stored is not None:
                self.nlist = int(stored)
        stats = apply_semantic_increment(
            batch_df.sparkSession,
            batch_df,
            self.target_dir,
            pointer,
            id_col=self.id_col,
            vec_col=self.vec_col,
            threshold=self.threshold,
            nlist=self.nlist,
            seed=self.seed,
            extra_pointer_fields=self._pointer_fields(batch_id),
        )
        self.last_allow_share = stats.get("allow_share")
        if self.recell_on_trigger:
            rec = maybe_recell_on_trigger(
                batch_df.sparkSession,
                self.target_dir,
                self.last_allow_share,
                id_col=self.id_col,
                vec_col=self.vec_col,
            )
            if rec is not None:
                self.recell_count += 1
                self.nlist = int(rec["new_nlist"])
                self.last_allow_share = rec["allow_share"]


def run_stream_corpus_semantic(
    stream_df: DataFrame,
    target_dir: str,
    checkpoint_dir: str | None = None,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
    recell_on_trigger: bool = False,
) -> CorpusSemanticDupSink:
    """availableNow drain into the semantically-deduped corpus; same
    checkpoint discipline as the other two sinks."""
    sink = CorpusSemanticDupSink(
        target_dir,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        nlist=nlist,
        seed=seed,
        checkpoint_dir=checkpoint_dir,
        recell_on_trigger=recell_on_trigger,
    )
    _checkpoint_guard(target_dir, checkpoint_dir)
    writer = stream_df.writeStream.foreachBatch(sink)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return sink


def run_stream_corpus_neardup(
    stream_df: DataFrame,
    target_dir: str,
    checkpoint_dir: str | None = None,
    sim_threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    drift: bool = False,
    drift_key: str | None = None,
) -> CorpusNearDupSink:
    """availableNow drain into the near-deduped corpus; same checkpoint
    and drift-gate plumbing as run_stream_corpus_dedup (returns the
    sink — read ``sink.last_drift``)."""
    sink = CorpusNearDupSink(
        target_dir,
        id_col=id_col,
        text_col=text_col,
        sim_threshold=sim_threshold,
        checkpoint_dir=checkpoint_dir,
        drift=drift,
        drift_key=drift_key,
    )
    _checkpoint_guard(target_dir, checkpoint_dir)
    writer = stream_df.writeStream.foreachBatch(sink)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return sink


class CorpusPassageDedupSink:
    """``foreachBatch`` twin for PASSAGE-level dedup: each micro-batch's
    documents are REWRITTEN against the standing passage-digest state
    (plans/incremental.py::apply_passage_increment) — the same state the
    file-based ``incremental_passage_dedup_refresh`` maintains, so a
    streamed document firehose and batch backfills interleave on one
    boilerplate-excised corpus under one pinned cut-width calibration.
    First wins at passage granularity across tempos; standing text is
    never re-read (the anti-join touches 16-byte digests only).
    ``drift=True`` enables the shared per-batch drift gate the other
    two sinks carry (r11 verdict stretch item) — PSI of the batch's
    REWRITTEN doc-length histogram against the standing distribution,
    read from the passage layout's ``docs/`` delta."""

    def __init__(
        self,
        target_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        words: int = 8,
        snapshot_compact_at: int = 16,
        checkpoint_dir: str | None = None,
        drift: bool = False,
        drift_key: str | None = None,
    ) -> None:
        self.target_dir = target_dir
        self.id_col = id_col
        self.text_col = text_col
        self.words = words
        self.snapshot_compact_at = snapshot_compact_at
        self.checkpoint_dir = checkpoint_dir
        self.drift = drift
        self.drift_key = drift_key
        self.last_drift: dict | None = None

    _pointer_fields = CorpusDedupSink._pointer_fields

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..plans.incremental import apply_passage_increment

        pointer = read_pointer(self.target_dir)
        if pointer is not None and batch_id <= pointer.get("last_stream_batch", -1):
            return  # replayed batch after recovery: already applied
        apply_passage_increment(
            batch_df.sparkSession,
            batch_df,
            self.target_dir,
            pointer,
            id_col=self.id_col,
            text_col=self.text_col,
            words=self.words,
            snapshot_compact_at=self.snapshot_compact_at,
            extra_pointer_fields=self._pointer_fields(batch_id),
        )
        if self.drift:
            rep = _drift_after_commit(
                batch_df.sparkSession,
                self.target_dir,
                self.text_col,
                self.drift_key,
                delta_subdir="docs",
            )
            if rep is not None:
                self.last_drift = rep


def run_stream_corpus_passages(
    stream_df: DataFrame,
    target_dir: str,
    checkpoint_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    words: int = 8,
    drift: bool = False,
    drift_key: str | None = None,
) -> CorpusPassageDedupSink:
    """availableNow drain into the passage-rewritten corpus; same
    checkpoint and drift-gate plumbing as the other corpus sinks
    (returns the sink — read ``sink.last_drift``)."""
    sink = CorpusPassageDedupSink(
        target_dir,
        id_col=id_col,
        text_col=text_col,
        words=words,
        checkpoint_dir=checkpoint_dir,
        drift=drift,
        drift_key=drift_key,
    )
    _checkpoint_guard(target_dir, checkpoint_dir)
    writer = stream_df.writeStream.foreachBatch(sink)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return sink
