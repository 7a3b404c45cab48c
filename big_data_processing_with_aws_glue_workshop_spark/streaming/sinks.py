"""Streaming sinks: foreachBatch keyed upsert into a plain-parquet table.

Structured Streaming's file sink is append-only; keyed UPSERT into a lake
table normally needs Delta/Iceberg (no jars in this environment). This
module provides the same semantics with a minimal snapshot mechanism:

- each committed micro-batch writes a full new snapshot directory
  ``<target>/v<batch_id>/`` (parquet, immutable),
- a one-line JSON pointer file (``current.json``, written tmp + rename)
  names the live snapshot — readers get snapshot isolation for free,
- the pointer records the last applied ``batch_id``; foreachBatch replays
  the last batch after a failure, and the sink skips any batch id it has
  already applied — idempotent, so end-to-end exactly-once.

Scale notes: the rewrite cost is one upsert plan per micro-batch (anti join
on the keys + union — see operators/merge.py), shuffling only on the merge
keys. For 100 TB targets the same sink pattern applies with a partitioned
rewrite (replace only affected partitions) or a real table format; the
checkpoint/pointer/idempotence contract is identical.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..util import atomic_write_json


def read_pointer(target_dir: str) -> dict | None:
    """The snapshot table's current-pointer JSON, or None before the
    first commit."""
    path = os.path.join(target_dir, "current.json")
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def commit_snapshot(
    df: DataFrame,
    target_dir: str,
    batch_id: int,
    extra_pointer_fields: dict | None = None,
    keep_versions: int | None = None,
) -> None:
    """The shared snapshot-commit protocol (used by UpsertSink and
    plans/incremental.py — one implementation, not two drifting copies):
    write ``df`` as the immutable version directory ``v<batch_id>``, flip
    the pointer atomically (tmp + rename), then retire every version
    directory beyond the retention window — not just the immediate
    predecessor, so a version orphaned by a crash between a previous
    pointer flip and its cleanup is healed by the next successful commit
    and disk stays O(keep_versions x table).

    ``keep_versions`` retains that many newest PUBLISHED versions,
    enabling time-travel reads (``read_version``) and
    version-over-version auditing (``operators/diff.py::snapshot_diff``
    between two retained versions). Published means batch id <= the
    pointer's: a leftover dir from a crashed never-flipped attempt is
    always deleted, whatever its id, so retention can never resurrect
    unpublished data. The retention policy is DURABLE: the effective
    value is recorded in the pointer, and ``None`` (the default)
    inherits it — so one invocation that omits the flag (a cron twin, a
    teammate's shell) cannot silently destroy the audit window. Pass an
    explicit int to change the policy; 1 = current only, the original
    behavior and the first-commit default.
    """
    prior = read_pointer(target_dir)
    if keep_versions is None:
        keep_versions = (prior or {}).get("keep_versions", 1)
    version_dir = f"v{batch_id}"
    out = os.path.join(target_dir, version_dir)
    if os.path.exists(out):  # stale leftover from a crashed attempt
        shutil.rmtree(out)
    df.write.mode("overwrite").parquet(out)
    os.makedirs(target_dir, exist_ok=True)
    atomic_write_json(
        os.path.join(target_dir, "current.json"),
        {
            "batch_id": batch_id,
            "version": version_dir,
            "keep_versions": keep_versions,
            **(extra_pointer_fields or {}),
        },
    )
    # retention sweep: keep the (keep_versions - 1) newest published
    # predecessors alongside the just-committed current
    others: list[int] = []
    for entry in os.listdir(target_dir):
        if entry == version_dir or not entry.startswith("v"):
            continue
        if not os.path.isdir(os.path.join(target_dir, entry)):
            continue
        try:
            vid = int(entry[1:])
        except ValueError:
            continue
        others.append(vid)
    retained = set(
        sorted((v for v in others if v < batch_id), reverse=True)[
            : max(0, keep_versions - 1)
        ]
    )
    for vid in others:
        if vid not in retained:
            shutil.rmtree(os.path.join(target_dir, f"v{vid}"), ignore_errors=True)


class UpsertSink:
    """``foreachBatch`` callable: SCD1-upsert each micro-batch into the
    versioned parquet table at ``target_dir``, keyed by ``keys``.

    Rows within a batch are deduplicated keep-latest by ``order_col`` (if
    given) before merging, so a key updated twice in one batch lands once.
    """

    def __init__(
        self,
        target_dir: str,
        keys: Sequence[str],
        order_col: str | None = None,
        checkpoint_dir: str | None = None,
        keep_versions: int | None = None,
    ) -> None:
        self.target_dir = target_dir
        self.keys = list(keys)
        self.order_col = order_col
        # recorded in the pointer so later runs can enforce checkpoint
        # identity (run_foreach_batch_upsert's guard) — a fresh checkpoint
        # restarts batch ids and the replay guard would skip new data
        self.checkpoint_dir = checkpoint_dir
        # retention window for time-travel reads; None inherits the
        # pointer's durable policy (commit_snapshot)
        self.keep_versions = keep_versions

    # -- pointer management ----------------------------------------------

    @property
    def _pointer_path(self) -> str:
        return os.path.join(self.target_dir, "current.json")

    def _read_pointer(self) -> dict | None:
        return read_pointer(self.target_dir)

    # -- the sink ----------------------------------------------------------

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import keep_latest
        from ..operators.merge import upsert

        pointer = self._read_pointer()
        if pointer is not None and batch_id <= pointer["batch_id"]:
            return  # replayed batch after recovery: already applied

        source = batch_df
        if self.order_col is not None:
            source = keep_latest(source, self.keys, self.order_col)

        spark = batch_df.sparkSession
        if pointer is not None:
            current = spark.read.parquet(
                os.path.join(self.target_dir, pointer["version"])
            )
            if self.order_col is not None:
                # order-aware merge: a LATE (older order_col) source row must
                # not regress a newer target row — blind replace-by-key only
                # applies when no ordering column is declared. Ties go to the
                # incoming row (stream order) via the priority tiebreak.
                merged = keep_latest(
                    current.withColumn("__src", F.lit(0)).unionByName(
                        source.withColumn("__src", F.lit(1))
                    ),
                    self.keys,
                    self.order_col,
                    tiebreak_cols=["__src"],
                ).drop("__src")
            else:
                merged = upsert(current, source, self.keys)
        else:
            merged = source

        extra = (
            {"stream_checkpoint": os.path.abspath(self.checkpoint_dir)}
            if self.checkpoint_dir is not None
            else None
        )
        commit_snapshot(
            merged, self.target_dir, batch_id, extra, keep_versions=self.keep_versions
        )


def read_current(spark: SparkSession, target_dir: str) -> DataFrame:
    """Read the live snapshot of an UpsertSink table (snapshot-isolated:
    a concurrent batch commit flips the pointer atomically)."""
    with open(os.path.join(target_dir, "current.json"), encoding="utf-8") as f:
        pointer = json.load(f)
    return spark.read.parquet(os.path.join(target_dir, pointer["version"]))


def list_versions(target_dir: str) -> list[int]:
    """Batch ids of the PUBLISHED, INTACT versions currently on disk
    (newest last) — the time-travel index. Published = id <= the
    pointer's; a leftover dir from a crashed never-flipped attempt (id
    beyond the pointer) is excluded, the same rule the retention sweep
    applies. Intact = the Spark write's ``_SUCCESS`` marker is present:
    the sweep's best-effort rmtree can leave a half-deleted aged-out
    dir behind on a transient FS error, and serving it as data would
    silently truncate a time-travel read — no marker, not a version."""
    pointer = read_pointer(target_dir)
    if pointer is None:
        return []
    out = []
    for entry in os.listdir(target_dir):
        if not entry.startswith("v"):
            continue
        if not os.path.isdir(os.path.join(target_dir, entry)):
            continue
        try:
            vid = int(entry[1:])
        except ValueError:
            continue
        if vid <= pointer["batch_id"] and os.path.exists(
            os.path.join(target_dir, entry, "_SUCCESS")
        ):
            out.append(vid)
    return sorted(out)


def read_version(spark: SparkSession, target_dir: str, batch_id: int) -> DataFrame:
    """Time-travel read of a RETAINED published version (Delta-style
    ``VERSION AS OF``, over the retention window ``commit_snapshot``'s
    ``keep_versions`` keeps). Pairs with ``operators/diff.py::
    snapshot_diff`` for version-over-version change auditing of any
    state riding the snapshot protocol (upsert tables, agg-refresh
    states, sketch states). Raises with the available ids when the
    requested version was never published or already aged out."""
    available = list_versions(target_dir)
    if batch_id not in available:
        raise ValueError(
            f"version {batch_id} is not retained at {target_dir!r} "
            f"(available: {available}) — raise keep_versions on the "
            "writer to widen the time-travel window"
        )
    return spark.read.parquet(os.path.join(target_dir, f"v{batch_id}"))


def run_foreach_batch_upsert(
    stream_df: DataFrame,
    target_dir: str,
    keys: Sequence[str],
    order_col: str | None = None,
    checkpoint_dir: str | None = None,
    keep_versions: int | None = None,
) -> None:
    """Drive a stream into an UpsertSink with availableNow (drain-the-source
    batch mode); with a checkpoint dir the batch-id sequence survives
    restarts, which is what makes the skip-replayed-batch check meaningful.

    Refuses to run WITHOUT a checkpoint against a target that already has
    committed batches: a fresh (or absent) checkpoint restarts batch ids at
    0, every batch would hit the replay guard, and new data would be
    silently discarded instead of merged. The pointer records the
    checkpoint location on the first streamed commit, so a DIFFERENT
    checkpoint (same failure mode, restarted ids) and a target owned by
    the BATCH upsert path (plans/incremental.py — whose batch-id
    sequence is pointer+1, incompatible with checkpoint ids) are both
    refused loudly instead of silently dropping data."""
    sink = UpsertSink(
        target_dir,
        keys,
        order_col,
        checkpoint_dir=checkpoint_dir,
        keep_versions=keep_versions,
    )
    pointer = sink._read_pointer()
    if pointer is not None:
        if checkpoint_dir is None:
            raise ValueError(
                f"target {target_dir!r} has committed batches; running without "
                "a checkpoint restarts batch ids at 0 and the idempotence "
                "guard would silently skip all new data — pass the original "
                "checkpoint_dir (or reset the target)"
            )
        stored = pointer.get("stream_checkpoint")
        if stored is None:
            raise ValueError(
                f"target {target_dir!r} was committed by the batch upsert "
                "path (no stream_checkpoint in its pointer); streaming onto "
                "it would compare checkpoint batch ids against the batch "
                "sequence and silently skip data — use a separate target "
                "(or reset it)"
            )
        if os.path.abspath(checkpoint_dir) != stored:
            raise ValueError(
                f"target {target_dir!r} has committed stream batches under "
                f"checkpoint {stored!r}; a different checkpoint "
                f"({os.path.abspath(checkpoint_dir)!r}) restarts batch ids "
                "at 0 and the idempotence guard would silently skip all new "
                "data — pass the original checkpoint_dir (or reset the "
                "target)"
            )
    writer = stream_df.writeStream.foreachBatch(sink)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
