"""Small-file compaction (operators/compaction.py): content preservation,
per-partition targeting, idempotence, and crash recovery of the swap
protocol."""

import os

from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.operators.compaction import (
    COMMIT_MARKER,
    TMP_DIR_NAME,
    compact_parquet_lake,
    list_data_files,
    plan_compaction,
    recover_compaction,
)


def _content_fingerprint(df):
    """Order-insensitive whole-table checksum: per-row hash, summed."""
    return df.select(
        F.sum(F.xxhash64(*sorted(df.columns))).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]


def _file_counts(spark, root):
    return {p: len(fs) for p, fs in list_data_files(spark, root).items()}


def test_compact_unpartitioned_preserves_content(spark, sf_dir, tmp_path):
    lake = str(tmp_path / "lake")
    src = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    src.repartition(64).write.parquet(lake)
    before = _content_fingerprint(spark.read.parquet(lake))
    assert _file_counts(spark, lake)[""] == 64

    # target sized so the whole table fits in a handful of files
    total = sum(s for _, s in list_data_files(spark, lake)[""])
    executed = compact_parquet_lake(spark, lake, target_file_bytes=total // 4 + 1)

    assert len(executed) == 1 and executed[0].n_files == 64
    n_after = _file_counts(spark, lake)[""]
    assert n_after == executed[0].target_files <= 5
    after = _content_fingerprint(spark.read.parquet(lake))
    assert (before["h"], before["n"]) == (after["h"], after["n"])
    # tmp dir must be gone
    assert not os.path.exists(os.path.join(lake, TMP_DIR_NAME))


def test_compact_partitioned_only_touches_oversized(spark, sf_dir, tmp_path):
    lake = str(tmp_path / "plake")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    # one hot partition fragmented into many files, others already compact
    frag = orders.filter(F.col("o_orderpriority") == "1-URGENT").repartition(32)
    rest = orders.filter(F.col("o_orderpriority") != "1-URGENT").repartition(1)
    for part in (frag, rest):
        part.write.mode("append").partitionBy("o_orderpriority").parquet(lake)
    before = _content_fingerprint(spark.read.parquet(lake))
    counts_before = _file_counts(spark, lake)
    assert counts_before["o_orderpriority=1-URGENT"] == 32

    # big target: every partition fits in ONE file -> only fragmented
    # partitions (the URGENT one) exceed their target and get rewritten
    executed = compact_parquet_lake(spark, lake, target_file_bytes=1 << 30)

    touched = {p.partition for p in executed}
    assert "o_orderpriority=1-URGENT" in touched
    counts_after = _file_counts(spark, lake)
    assert counts_after["o_orderpriority=1-URGENT"] == 1
    # untouched partitions keep their exact file sets
    for part, files in list_data_files(spark, lake).items():
        if part not in touched:
            assert len(files) == counts_before[part]
    after = _content_fingerprint(spark.read.parquet(lake))
    assert (before["h"], before["n"]) == (after["h"], after["n"])
    # hive layout intact: partition-pruned read still works
    pruned = spark.read.parquet(lake).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    assert pruned.count() == frag.count()


def test_compact_is_idempotent(spark, sf_dir, tmp_path):
    lake = str(tmp_path / "ilake")
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).repartition(
        8
    ).write.parquet(lake)
    first = compact_parquet_lake(spark, lake, target_file_bytes=1 << 30)
    assert len(first) == 1
    second = compact_parquet_lake(spark, lake, target_file_bytes=1 << 30)
    assert second == []  # already compact -> metadata-only no-op


def test_plan_is_metadata_only(spark, sf_dir, tmp_path):
    lake = str(tmp_path / "dlake")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).repartition(
        6
    ).write.parquet(lake)
    n_written = _file_counts(spark, lake)[""]  # 5 rows -> empty splits skipped
    plans = plan_compaction(spark, lake, target_file_bytes=1 << 30)
    assert [(p.partition, p.n_files, p.target_files) for p in plans] == [
        ("", n_written, 1)
    ]
    # dry plan must not change the lake
    assert _file_counts(spark, lake)[""] == n_written


def _simulate_crash(spark, lake, *, marker: bool, delete: str = "all"):
    """Run the swap protocol up to a chosen crash point: tmp write (step
    1), optionally the commit marker (step 2), then delete all / half /
    none of the old files (step 3). Returns the pre-crash fingerprint."""
    import json

    before = _content_fingerprint(spark.read.parquet(lake))
    old_files = [f for f, _ in list_data_files(spark, lake)[""]]
    tmp_dir = os.path.join(lake, TMP_DIR_NAME)
    spark.read.parquet(*old_files).repartition(2).write.parquet(tmp_dir)
    if marker:
        # the protocol records old files root-RELATIVE (lake relocation
        # between crash and recovery must not strand them)
        rel = sorted(
            f.removeprefix("file:").removeprefix(lake).lstrip("/")
            for f in old_files
        )
        with open(os.path.join(tmp_dir, COMMIT_MARKER), "w") as f:
            json.dump({"old_files": rel}, f)
    doomed = {
        "all": old_files,
        "half": old_files[: len(old_files) // 2],
        "none": [],
    }[delete]
    for f in doomed:
        os.remove(f.removeprefix("file:"))
    return before


def test_recover_completes_interrupted_swap(spark, sf_dir, tmp_path):
    """Crash between the delete step and the move step (marker written,
    olds gone): recover must restore the partition — no loss, no dups."""
    lake = str(tmp_path / "rlake")
    src = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    src.repartition(16).write.parquet(lake)
    before = _simulate_crash(spark, lake, marker=True, delete="all")

    restored = recover_compaction(spark, lake)
    assert restored == 2
    after = _content_fingerprint(spark.read.parquet(lake))
    assert (before["h"], before["n"]) == (after["h"], after["n"])
    assert not os.path.exists(os.path.join(lake, TMP_DIR_NAME))
    # idempotent: nothing left to recover
    assert recover_compaction(spark, lake) == 0


def test_recover_heals_mid_delete_crash_without_duplicates(spark, sf_dir, tmp_path):
    """Crash DURING the delete step (marker written, only half the olds
    gone): the marker lists which files the committed swap owns, so
    recovery deletes the survivors before moving the tmp copy in — the
    window where marker-less recovery would duplicate every surviving
    row."""
    lake = str(tmp_path / "hlake")
    src = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    src.repartition(8).write.parquet(lake)
    before = _simulate_crash(spark, lake, marker=True, delete="half")

    assert recover_compaction(spark, lake) == 2
    after = _content_fingerprint(spark.read.parquet(lake))
    assert (before["h"], before["n"]) == (after["h"], after["n"])


def test_recover_discards_uncommitted_tmp(spark, sf_dir, tmp_path):
    """Crash during/after the tmp write but BEFORE the commit marker: the
    old files are all still in place, so the (possibly incomplete) tmp
    copy must be rolled back, not moved in alongside them."""
    lake = str(tmp_path / "ulake")
    src = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    src.repartition(6).write.parquet(lake)
    before = _simulate_crash(spark, lake, marker=False, delete="none")
    n_files = _file_counts(spark, lake)[""]

    assert recover_compaction(spark, lake) == 0
    assert not os.path.exists(os.path.join(lake, TMP_DIR_NAME))
    assert _file_counts(spark, lake)[""] == n_files
    after = _content_fingerprint(spark.read.parquet(lake))
    assert (before["h"], before["n"]) == (after["h"], after["n"])


def test_recover_treats_truncated_marker_as_uncommitted(spark, sf_dir, tmp_path):
    """Crash mid-marker-write on a filesystem without atomic rename: a
    present-but-empty (or garbage) marker means the publish never
    completed, so the old files are all intact — recovery must read the
    partition as UNCOMMITTED and roll the tmp copy back, not raise on
    json.loads and wedge every future recover/compact run."""
    lake = str(tmp_path / "tlake")
    src = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    src.repartition(6).write.parquet(lake)
    before = _simulate_crash(spark, lake, marker=False, delete="none")
    n_files = _file_counts(spark, lake)[""]
    # simulate the torn write: marker exists but holds no parseable JSON
    with open(os.path.join(lake, TMP_DIR_NAME, COMMIT_MARKER), "w") as f:
        f.write('{"old_fi')

    assert recover_compaction(spark, lake) == 0
    assert not os.path.exists(os.path.join(lake, TMP_DIR_NAME))
    assert _file_counts(spark, lake)[""] == n_files
    after = _content_fingerprint(spark.read.parquet(lake))
    assert (before["h"], before["n"]) == (after["h"], after["n"])
    # and a routine compact re-run stays healthy afterwards
    compact_parquet_lake(spark, lake, target_file_bytes=1 << 30)
    healed = _content_fingerprint(spark.read.parquet(lake))
    assert (before["h"], before["n"]) == (healed["h"], healed["n"])


def test_compact_rerun_after_crash_heals_instead_of_destroying(
    spark, sf_dir, tmp_path
):
    """The operational trap: after a mid-swap crash the partition's only
    copy lives under tmp, and the operator re-runs compact_parquet_lake
    (not recover). The re-run must heal the lake — a version that clears
    tmp without recovering first destroys the partition silently."""
    lake = str(tmp_path / "clake2")
    src = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    src.repartition(16).write.parquet(lake)
    before = _simulate_crash(spark, lake, marker=True, delete="all")

    compact_parquet_lake(spark, lake, target_file_bytes=1 << 30)
    after = _content_fingerprint(spark.read.parquet(lake))
    assert (before["h"], before["n"]) == (after["h"], after["n"])
    assert not os.path.exists(os.path.join(lake, TMP_DIR_NAME))


def test_compact_cli_dry_run(spark, sf_dir, tmp_path, capsys):
    import json

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    lake = str(tmp_path / "clake")
    spark.read.parquet(os.path.join(sf_dir, "supplier.parquet")).repartition(
        12
    ).write.parquet(lake)
    main(["compact", "--path", lake, "--target-mb", "1024", "--dry-run"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["partitions_compacted"] == 1
    assert out["files_before"] == 12
    assert _file_counts(spark, lake)[""] == 12  # dry run left it alone
