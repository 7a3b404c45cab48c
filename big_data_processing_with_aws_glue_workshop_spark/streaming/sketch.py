"""Streaming heavy-hitter tracking: a ``foreachBatch`` sink that folds
each micro-batch into a standing Count-Min sketch (operators/sketch.py)
— the classic streaming-frequency shape, on the repo's snapshot-commit
protocol.

Why the monoid matters here: the sketch of everything-ever-streamed is
``cms_merge(standing, cms_sketch(batch))`` — one bounded-size union +
groupBy per micro-batch, never a re-read of history, and the state is
depth x width counters no matter how wide the key domain grows (the
measured saturation curve is in docs/SCALE.md). Heavy-hitter queries
(``cms_heavy_hitters``) run against the live snapshot at any time with
perfect recall over their candidates.

Exactly-once and ownership: same contracts as UpsertSink —
``commit_snapshot`` versioned dirs + atomic pointer, replayed batch ids
skipped, the stream checkpoint recorded in the pointer and enforced
(a fresh checkpoint would restart ids and silently skip data), and the
sketch calibration {depth, width, seed, key_col} pinned on first commit
and refused on mismatch (sketches across calibrations do not merge —
same contract as the near-dup signature state).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.sketch import cms_merge, cms_sketch
from .sinks import commit_snapshot, read_current, read_pointer


class CmsSketchSink:
    """``foreachBatch`` callable: merge each micro-batch's sketch into
    the standing sketch table at ``target_dir``."""

    def __init__(
        self,
        target_dir: str,
        key_col: str,
        depth: int = 5,
        width: int = 65_536,
        seed: int = 42,
        checkpoint_dir: str | None = None,
    ) -> None:
        self.target_dir = target_dir
        self.key_col = key_col
        self.depth = depth
        self.width = width
        self.seed = seed
        self.checkpoint_dir = checkpoint_dir

    @property
    def calibration(self) -> dict:
        return {
            "depth": self.depth,
            "width": self.width,
            "seed": self.seed,
            "key_col": self.key_col,
        }

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
        inc = cms_sketch(
            batch_df,
            self.key_col,
            depth=self.depth,
            width=self.width,
            seed=self.seed,
        )
        if pointer is not None:
            merged = cms_merge(
                read_current(batch_df.sparkSession, self.target_dir), inc
            )
        else:
            merged = inc
        extra: dict = {"calibration": self.calibration}
        if self.checkpoint_dir is not None:
            extra["stream_checkpoint"] = os.path.abspath(self.checkpoint_dir)
        commit_snapshot(merged, self.target_dir, batch_id, extra)


def run_stream_cms_sketch(
    stream_df: DataFrame,
    target_dir: str,
    key_col: str,
    checkpoint_dir: str | None = None,
    depth: int = 5,
    width: int = 65_536,
    seed: int = 42,
) -> None:
    """availableNow drain into the standing sketch; same checkpoint
    ownership discipline as run_foreach_batch_upsert."""
    sink = CmsSketchSink(
        target_dir,
        key_col,
        depth=depth,
        width=width,
        seed=seed,
        checkpoint_dir=checkpoint_dir,
    )
    pointer = read_pointer(target_dir)
    if pointer is not None:
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
    writer = stream_df.writeStream.foreachBatch(sink)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def read_stream_sketch(spark: SparkSession, target_dir: str) -> DataFrame:
    """The live standing sketch (snapshot-isolated)."""
    return read_current(spark, target_dir)
