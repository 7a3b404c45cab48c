"""Small-file compaction for plain-parquet lakes.

The 100 TB failure mode this addresses: incremental/streaming writers and
over-parallel jobs leave Hive partitions holding thousands of KB-scale
parquet files. Every downstream scan then pays per-file open/footer-parse
costs, the driver pays O(files) listing and split planning, and the
NameNode/object-store pays the metadata load — scan time becomes dominated
by file count, not data volume. Compaction rewrites each oversized
partition into ``ceil(bytes / target_file_bytes)`` right-sized files
(the reference hand-sizes its writes for the same reason — repartition(30)
at src/bronze/job-bronze-rues.py:135-136 — but never maintains the layout
after the fact; this operator is the missing maintenance half).

Design:

- **Metadata-bounded planning.** The plan comes from a recursive Hadoop
  ``FileSystem.listFiles`` walk (works on HDFS/S3A/local alike) grouped by
  partition directory — no data is read to decide what to compact. Only
  partitions whose file count exceeds their byte-derived target are
  touched; an already-compact lake is a no-op (idempotent).
- **Per-partition rewrite, not a global one.** Each selected partition is
  read from its explicit file list (so the job scans exactly the files
  being replaced, never the whole lake) and rewritten with
  ``repartition(target_files)``. Partition-column values never enter the
  job: hive layout keeps them in directory names and the rewritten files
  land back in the same directory. A driver-side loop over partitions is
  metadata-scale work; each iteration is one bounded Spark job.
- **Crash-recoverable swap protocol (write-ahead commit marker).** Plain
  parquet has no transaction log, so a fully atomic swap is impossible
  (that is what table formats add; see
  ``sources/formats.py::require_format``). The protocol here makes every
  crash window recoverable with no duplicates and no loss:

      1. write compacted files under <root>/.compaction_tmp/<partition>/
      2. write <tmp-partition>/.COMPACT_COMMIT recording the OLD file list
      3. delete the partition's OLD data files
      4. rename each tmp data file into the partition directory
      5. remove the tmp partition directory (marker included)

  The marker is the transaction boundary: written only after the tmp copy
  is complete, and its content names exactly the files step 3 deletes.
  ``recover_compaction`` therefore never has to guess which side owns the
  rows — a tmp partition WITHOUT a marker is an uncommitted write (the
  old files are all still present) and is discarded; a tmp partition WITH
  a marker is committed (the tmp copy is the source of truth), so
  recovery re-runs steps 3-5: it deletes whichever listed old files still
  survive, then moves the tmp copy in. Both paths are idempotent, so
  re-running recovery is safe, and ``compact_parquet_lake`` runs recovery
  FIRST so a routine re-run after a crash heals the lake instead of
  clobbering the parked copy. Rename is atomic per file on HDFS and local
  filesystems. Concurrent readers during the swap can see a partial
  partition — schedule compaction off-peak, or use a transactional table
  format where that is unacceptable. On S3A, rename is copy+delete
  (slower, still per-file recoverable via the same protocol).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024
TMP_DIR_NAME = ".compaction_tmp"
COMMIT_MARKER = ".COMPACT_COMMIT"


@dataclass(frozen=True)
class PartitionPlan:
    """One partition's compaction decision (partition == '' for an
    unpartitioned lake root)."""

    partition: str
    n_files: int
    total_bytes: int
    target_files: int

    @property
    def needs_compaction(self) -> bool:
        return self.n_files > self.target_files


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm  # noqa: SLF001 — Hadoop FS API has no public pyspark surface
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    return fs, hpath, jvm


def _is_hidden(name: str) -> bool:
    return name.startswith(".") or name.startswith("_")


def list_data_files(
    spark: SparkSession, root: str
) -> dict[str, list[tuple[str, int]]]:
    """Recursively list the lake's data files, grouped by partition
    directory relative to ``root`` ('' for files directly under it).
    Hidden files/dirs (``_SUCCESS``, ``.compaction_tmp``, ...) are skipped,
    mirroring what Spark's own file index ignores."""
    fs, hroot, _ = _fs_and_path(spark, root)
    root_uri = fs.makeQualified(hroot).toString().rstrip("/")
    groups: dict[str, list[tuple[str, int]]] = {}
    it = fs.listFiles(hroot, True)
    while it.hasNext():
        status = it.next()
        p = status.getPath()
        rel = p.toString()[len(root_uri) :].lstrip("/")
        parts = rel.split("/")
        if any(_is_hidden(seg) for seg in parts):
            continue
        partition = "/".join(parts[:-1])
        groups.setdefault(partition, []).append((p.toString(), status.getLen()))
    return groups


def _plans_from_groups(
    groups: dict[str, list[tuple[str, int]]], target_file_bytes: int
) -> list[PartitionPlan]:
    plans = []
    for partition, files in sorted(groups.items()):
        total = sum(size for _, size in files)
        target = max(1, math.ceil(total / target_file_bytes))
        plans.append(
            PartitionPlan(
                partition=partition,
                n_files=len(files),
                total_bytes=total,
                target_files=target,
            )
        )
    return plans


def plan_compaction(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> list[PartitionPlan]:
    """Metadata-only compaction plan: one row per partition, with the
    byte-derived target file count. Nothing is read or written."""
    return _plans_from_groups(list_data_files(spark, root), target_file_bytes)


def _write_marker(fs, jvm, marker_path: str, rel_old_files: list[str]) -> None:
    """Commit marker content: the swap's old-file list, root-RELATIVE.

    Published atomically: the bytes go to a temp name first and are
    renamed into place, so a crash mid-write can never leave a
    present-but-truncated marker at the commit path (rename is atomic on
    HDFS/local; on S3A the copy is all-or-nothing per object). Recovery
    additionally treats an unparseable marker as uncommitted — belt and
    braces for filesystems with weaker rename semantics."""
    tmp_path = marker_path + ".inprogress"
    htmp = jvm.org.apache.hadoop.fs.Path(tmp_path)
    out = fs.create(htmp, True)
    try:
        out.write(json.dumps({"old_files": sorted(rel_old_files)}).encode())
    finally:
        out.close()
    if not fs.rename(htmp, jvm.org.apache.hadoop.fs.Path(marker_path)):
        raise IOError(f"marker publish rename failed: {tmp_path} -> {marker_path}")


def _read_marker(fs, jvm, marker_path: str) -> list[str]:
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(marker_path))
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        while True:
            line = reader.readLine()
            if line is None:
                break
            lines.append(line)
    finally:
        stream.close()
    return json.loads("\n".join(lines))["old_files"]


def _move_data_files(fs, jvm, tmp_dir: str, dest_dir: str) -> int:
    """Step 4 of the swap: rename every DATA file directly under
    ``tmp_dir`` into ``dest_dir`` (markers/_SUCCESS are hidden and stay;
    subdirectories are never renamed — a tmp partition dir holds only
    files, and renaming a directory would nest layouts). Idempotent —
    each file moves at most once, so completing a crashed swap is a
    re-run."""
    htmp = jvm.org.apache.hadoop.fs.Path(tmp_dir)
    if not fs.exists(htmp):
        return 0
    moved = 0
    for status in fs.listStatus(htmp):
        name = status.getPath().getName()
        if _is_hidden(name) or status.isDirectory():
            continue
        dest = jvm.org.apache.hadoop.fs.Path(dest_dir + "/" + name)
        if not fs.rename(status.getPath(), dest):  # pragma: no cover
            raise IOError(f"rename failed: {status.getPath()} -> {dest}")
        moved += 1
    return moved


def compact_parquet_lake(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> list[PartitionPlan]:
    """Rewrite every partition holding more files than its byte-derived
    target into exactly ``target_files`` files. Returns the plans that were
    executed (empty list == lake already compact). Values, schema, and
    hive partition layout are preserved bit-for-bit; only file boundaries
    change."""
    fs, hroot, jvm = _fs_and_path(spark, root)
    root_uri = fs.makeQualified(hroot).toString().rstrip("/")
    # heal any crashed prior swap FIRST — a routine re-run must complete
    # the committed partitions and discard uncommitted tmp writes, never
    # clobber a parked copy (the tmp root may hold a partition's only
    # surviving data after a mid-swap crash)
    recover_compaction(spark, root)
    executed = []
    # one metadata walk serves both the plan and the per-partition old-file
    # lists (re-listing the whole lake inside the loop is O(P x F) listing
    # calls — the exact object-store cost compaction exists to remove)
    groups = list_data_files(spark, root)
    for plan in _plans_from_groups(groups, target_file_bytes):
        if not plan.needs_compaction:
            continue
        part_suffix = f"/{plan.partition}" if plan.partition else ""
        part_dir = root_uri + part_suffix
        tmp_dir = f"{root_uri}/{TMP_DIR_NAME}{part_suffix}"
        old_files = [f for f, _ in groups[plan.partition]]
        # 1. write right-sized files to the hidden tmp dir (reads ONLY the
        # files being replaced; partition values stay in the dir name)
        (
            spark.read.parquet(*old_files)
            .repartition(plan.target_files)
            .write.mode("overwrite")
            .option("compression", "snappy")
            .parquet(tmp_dir)
        )
        # 2. commit marker: from here on the tmp copy owns the rows.
        # Paths are recorded RELATIVE to the lake root so recovery still
        # resolves them if the whole lake directory is relocated between
        # a crash and the recover run.
        rel_old = [f[len(root_uri) :].lstrip("/") for f in old_files]
        _write_marker(fs, jvm, f"{tmp_dir}/{COMMIT_MARKER}", rel_old)
        # 3. delete the replaced files; 4.+5. swap the new ones in
        for f in old_files:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f), False)
        _move_data_files(fs, jvm, tmp_dir, part_dir)
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp_dir), True)
        executed.append(plan)
    # drop the (now empty) tmp root so readers never see the hidden dir
    fs.delete(jvm.org.apache.hadoop.fs.Path(root_uri + "/" + TMP_DIR_NAME), True)
    return executed


def recover_compaction(spark: SparkSession, root: str) -> int:
    """Heal a swap interrupted in ANY window, using the commit marker:

    - tmp partition WITH ``.COMPACT_COMMIT``: committed — the tmp copy
      owns the rows. Re-run the swap's tail: delete whichever of the
      marker's listed old files still survive (a crash mid-delete leaves
      some), then move the tmp data files in. No duplicates: every old
      row's file is either in the marker list (deleted here) or was
      already deleted.
    - tmp partition WITHOUT a marker: uncommitted — the old files are all
      still in place and the tmp copy may be incomplete. Discard it
      (rollback); the interrupted compaction simply never happened.

    Returns the number of files restored (moved out of tmp). Idempotent
    and safe to run unconditionally (no tmp dir == 0);
    ``compact_parquet_lake`` runs it automatically before planning."""
    fs, hroot, jvm = _fs_and_path(spark, root)
    root_uri = fs.makeQualified(hroot).toString().rstrip("/")
    tmp_root = root_uri + "/" + TMP_DIR_NAME
    htmp_root = jvm.org.apache.hadoop.fs.Path(tmp_root)
    if not fs.exists(htmp_root):
        return 0
    # tmp mirrors the partition tree: walk to the dirs that hold files.
    # Nothing is deleted during the walk (a recursive delete would race
    # the stack on mixed file+subdir layouts); the single recursive
    # delete of tmp_root at the end clears markers and empty dirs.
    restored = 0
    stack = [htmp_root]
    while stack:
        d = stack.pop()
        statuses = list(fs.listStatus(d))
        subdirs = [s for s in statuses if s.isDirectory()]
        data_files = [
            s
            for s in statuses
            if not s.isDirectory() and not _is_hidden(s.getPath().getName())
        ]
        marker = f"{d.toString()}/{COMMIT_MARKER}"
        marker_old_files = None
        if fs.exists(jvm.org.apache.hadoop.fs.Path(marker)):
            # An empty/truncated marker means the crash hit before the
            # atomic publish completed (possible only on filesystems with
            # non-atomic rename): the old files are then still intact, so
            # the safe reading is UNCOMMITTED — fall through to rollback
            # rather than wedging every future recover/compact run.
            try:
                marker_old_files = _read_marker(fs, jvm, marker)
            except (ValueError, KeyError):
                marker_old_files = None
        if marker_old_files is not None:
            rel = d.toString()[len(tmp_root) :].lstrip("/")
            dest = root_uri + (f"/{rel}" if rel else "")
            for rel_old in marker_old_files:
                fs.delete(
                    jvm.org.apache.hadoop.fs.Path(f"{root_uri}/{rel_old}"),
                    False,
                )
            restored += _move_data_files(fs, jvm, d.toString(), dest)
        elif data_files:
            # uncommitted write: olds intact, tmp copy possibly partial —
            # rollback by leaving it for the final tmp_root delete
            pass
        stack.extend(s.getPath() for s in subdirs)
    fs.delete(htmp_root, True)
    return restored


def read_lake(spark: SparkSession, root: str) -> DataFrame:
    """Plain partition-discovering read of the lake (convenience for
    CLI/test verification)."""
    return spark.read.parquet(root)
