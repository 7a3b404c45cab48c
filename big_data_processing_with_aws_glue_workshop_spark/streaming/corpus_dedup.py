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

from pyspark.sql import DataFrame, SparkSession

from ..plans.incremental import apply_dedup_increment, read_deduped
from .sinks import read_pointer


class CorpusDedupSink:
    """``foreachBatch`` callable: first-wins dedup of each micro-batch
    against the standing corpus at ``target_dir``."""

    def __init__(
        self,
        target_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        snapshot_compact_at: int = 16,
    ) -> None:
        self.target_dir = target_dir
        self.id_col = id_col
        self.text_col = text_col
        self.snapshot_compact_at = snapshot_compact_at

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
            extra_pointer_fields={"last_stream_batch": batch_id},
        )


def run_stream_corpus_dedup(
    stream_df: DataFrame,
    target_dir: str,
    checkpoint_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Drain ``stream_df`` into the deduped corpus with availableNow.
    Same checkpoint discipline as run_foreach_batch_upsert: a target with
    committed stream batches refuses to run without the checkpoint whose
    batch-id sequence makes the replay guard meaningful."""
    sink = CorpusDedupSink(target_dir, id_col=id_col, text_col=text_col)
    pointer = read_pointer(target_dir)
    if (
        checkpoint_dir is None
        and pointer is not None
        and "last_stream_batch" in pointer
    ):
        raise ValueError(
            f"target {target_dir!r} has committed stream batches; running "
            "without a checkpoint restarts batch ids at 0 and the "
            "idempotence guard would silently skip new data — pass the "
            "original checkpoint_dir (or reset the target)"
        )
    writer = stream_df.writeStream.foreachBatch(sink)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


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
    ) -> None:
        self.target_dir = target_dir
        self.id_col = id_col
        self.text_col = text_col
        self.sim_threshold = sim_threshold
        self.snapshot_compact_at = snapshot_compact_at

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
            extra_pointer_fields={"last_stream_batch": batch_id},
        )


def run_stream_corpus_neardup(
    stream_df: DataFrame,
    target_dir: str,
    checkpoint_dir: str | None = None,
    sim_threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """availableNow drain into the near-deduped corpus; same checkpoint
    discipline as run_stream_corpus_dedup."""
    sink = CorpusNearDupSink(
        target_dir, id_col=id_col, text_col=text_col, sim_threshold=sim_threshold
    )
    pointer = read_pointer(target_dir)
    if (
        checkpoint_dir is None
        and pointer is not None
        and "last_stream_batch" in pointer
    ):
        raise ValueError(
            f"target {target_dir!r} has committed stream batches; running "
            "without a checkpoint restarts batch ids at 0 and the "
            "idempotence guard would silently skip new data — pass the "
            "original checkpoint_dir (or reset the target)"
        )
    writer = stream_df.writeStream.foreachBatch(sink)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
