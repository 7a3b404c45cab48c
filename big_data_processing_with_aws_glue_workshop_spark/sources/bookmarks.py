"""Job bookmarks: incremental-ingest state, the native analog of Glue's
``Job.init()/job.commit()`` lifecycle (operator S10; reference
src/bronze/job-bronze-rues.py:34-35,174 — declared there but never used for
incremental reads, so this generalizes the reference's surface into a real
operator).

Two bookmark modes, matching what Glue bookmarks actually track:

- **File-set bookmarks** (Glue's mechanism for S3/file sources): remember
  which input files a committed run has processed and read ONLY the new
  ones. Pruning happens driver-side *before* the scan — the reader is given
  the explicit new-file list, so Spark never opens, lists into, or schedules
  tasks for already-ingested data. At 100 TB this is the difference between
  an incremental job costing O(new data) and O(corpus).

- **Column watermarks** (high-watermark incremental): remember the max value
  of a monotonic column (event time, sequence id) and filter newer rows.
  The filter is a plain Column predicate, so it pushes down to the scan
  (PushedFilters) and prunes partitions under hive layout.

Commit semantics replicate Glue's: state advances ONLY on ``commit_*`` —
a failed run replays the same increment next time (at-least-once). State
persists as one JSON file written atomically (tmp + rename), so a crash
mid-commit leaves the previous bookmark intact.
"""

from __future__ import annotations

import contextlib
import datetime
import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..util import atomic_write_json

try:  # POSIX advisory locking; absent on some platforms
    import fcntl
except ImportError:  # pragma: no cover
    fcntl = None


@contextlib.contextmanager
def _state_lock(state_path: str):
    """Serialize read-modify-write of the shared state file across jobs
    (different job_names may share one state_path): an flock'd sidecar so
    one job's commit can't overwrite another's from a stale read."""
    if fcntl is None:
        yield
        return
    parent = os.path.dirname(os.path.abspath(state_path))
    os.makedirs(parent, exist_ok=True)
    with open(state_path + ".lock", "a+", encoding="utf-8") as lock_f:
        fcntl.flock(lock_f, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(lock_f, fcntl.LOCK_UN)


class JobBookmark:
    """Persistent incremental-processing state for one named job.

    ``state_path`` is a JSON file (its directory is created on commit).
    A missing file means "never run": every input is new.
    """

    def __init__(self, state_path: str, job_name: str = "default") -> None:
        self.state_path = state_path
        self.job_name = job_name
        self._state = self._load()

    # -- state persistence ---------------------------------------------------

    def _load(self) -> dict:
        if os.path.exists(self.state_path):
            with open(self.state_path, encoding="utf-8") as f:
                all_state = json.load(f)
            return all_state.get(self.job_name, {})
        return {}

    def _persist(self) -> None:
        # lock across the re-read + write so a concurrent job committing a
        # different job_name between them isn't erased
        with _state_lock(self.state_path):
            all_state: dict = {}
            if os.path.exists(self.state_path):
                with open(self.state_path, encoding="utf-8") as f:
                    all_state = json.load(f)
            all_state[self.job_name] = self._state
            atomic_write_json(self.state_path, all_state)

    def reset(self) -> None:
        """Glue's 'reset bookmark': forget everything; next run is full."""
        self._state = {}
        self._persist()

    # -- file-set mode -------------------------------------------------------

    @property
    def processed_files(self) -> set[str]:
        return set(self._state.get("processed_files", []))

    def pending_files(self, pattern: str, file_filter=None) -> list[str]:
        """Input files matching ``pattern`` (glob) not yet committed, sorted
        for deterministic batch composition. ``file_filter`` (optional
        path predicate) narrows the listing — e.g.
        ``plans/incremental.join_view_published_filter`` admits only
        PUBLISHED join-view delta files, keeping unpublished
        crash-replay rewrites out of the committed file set."""
        files = sorted(set(glob.glob(pattern)) - self.processed_files)
        if file_filter is not None:
            files = [f for f in files if file_filter(f)]
        return files

    def read_incremental(
        self,
        spark: SparkSession,
        pattern: str,
        fmt: str = "parquet",
        schema: T.StructType | None = None,
        file_filter=None,
        **options: str,
    ) -> tuple[DataFrame, list[str]]:
        """Read only not-yet-committed files; returns (df, new_files).

        With zero new files the DataFrame is empty but keeps the source
        schema so downstream writers/unions stay schema-stable: from the
        explicit ``schema`` if given (no filesystem access), else from one
        committed file's footer. A pattern that has never matched ANY file
        and has no schema is an error (there is nothing to infer from).
        """
        new_files = self.pending_files(pattern, file_filter=file_filter)
        reader = spark.read.format(fmt).options(**options)
        if schema is not None:
            reader = reader.schema(schema)
        if not new_files:
            if schema is not None:
                return spark.createDataFrame([], schema), []
            committed = sorted(set(glob.glob(pattern)) & self.processed_files)
            if committed:
                return reader.load(committed[0]).limit(0), []
            # nothing committed yet, but the glob may still see files a
            # file_filter excluded (e.g. not-yet-published upstream
            # deltas): borrow ONE for its schema footer only — zero rows
            # read, nothing committed, so the filter's exactly-once
            # contract ("not visible this cycle") holds and the first
            # downstream run no-ops instead of crashing
            excluded = sorted(set(glob.glob(pattern)) - self.processed_files)
            if excluded:
                return reader.load(excluded[0]).limit(0), []
            raise FileNotFoundError(
                f"bookmark '{self.job_name}': no files match {pattern!r} and "
                "no schema was given — cannot build an empty increment"
            )
        return reader.load(new_files), new_files

    def commit_files(self, files: list[str]) -> None:
        """Advance the file bookmark (call only after the batch's outputs are
        durably written — the Glue ``job.commit()`` point)."""
        self._state["processed_files"] = sorted(self.processed_files | set(files))
        self._persist()

    # -- watermark mode ------------------------------------------------------

    @property
    def watermark(self):
        return self._state.get("watermark")

    def filter_new_rows(self, df: DataFrame, col: str) -> DataFrame:
        """Rows strictly newer than the committed high watermark. A plain
        pushdown-able predicate; no-op filter on first run."""
        if self.watermark is None:
            return df
        return df.filter(F.col(col) > F.lit(self.watermark))

    def advance_watermark(self, df: DataFrame, col: str) -> None:
        """Commit the max of ``col`` in this batch as the new watermark
        (one tiny agg action; skipped for empty batches). Numerics persist
        as JSON numbers (numeric comparison), timestamps/dates as ISO-8601
        strings — which compare correctly lexicographically, and which
        Spark's string->timestamp cast accepts back in the filter."""
        row = df.agg(F.max(col).alias("m")).first()
        m = row["m"] if row is not None else None
        if m is None:
            return
        m = _jsonable(m)
        current = self.watermark
        if current is None or m > current:
            self._state["watermark"] = m
            self._persist()


def _jsonable(value):
    if isinstance(value, datetime.datetime):
        return value.isoformat(sep=" ")
    if isinstance(value, datetime.date):
        return value.isoformat()
    return value
