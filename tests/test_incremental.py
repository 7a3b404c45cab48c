"""Bookmark-driven incremental refresh (plans/incremental.py): the
composed production shape — file-set bookmark -> per-increment transform
-> versioned-snapshot keyed upsert — must (a) read only new files,
(b) equal the full rebuild regardless of how rows split across
increments, (c) never regress a newer row on late arrivals, and
(d) be idempotent under crash-replay (re-applying an increment whose
bookmark commit was lost)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F

from big_data_processing_with_aws_glue_workshop_spark.operators.dedup import keep_latest
from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
    incremental_refresh,
    read_refreshed,
)
from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import (
    JobBookmark,
)


def _write_batch(path, rows):
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["id", "name", "updated_at"])
        ),
        str(path),
    )


def _transform(df):
    return df.select(
        "id", F.upper("name").alias("name"), "updated_at",
        F.length("name").alias("name_len"),
    )


def _snapshot(spark, target):
    return {
        r["id"]: (r["name"], r["updated_at"], r["name_len"])
        for r in read_refreshed(spark, target).collect()
    }


def test_incremental_refresh_equals_full_rebuild(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    target = str(tmp_path / "gold")
    bm = JobBookmark(str(tmp_path / "bm.json"), "refresh")
    pattern = str(landing / "*.parquet")

    _write_batch(landing / "b1.parquet", [(1, "ana", 10), (2, "bob", 10), (3, "eve", 10)])
    n = incremental_refresh(
        spark, bm, pattern, _transform, target, keys=["id"], order_col="updated_at"
    )
    assert n == 1
    assert _snapshot(spark, target) == {
        1: ("ANA", 10, 3), 2: ("BOB", 10, 3), 3: ("EVE", 10, 3)
    }

    # batch 2: newer update for 2, NEW key 4, and a LATE (older) row for 3
    _write_batch(
        landing / "b2.parquet", [(2, "bobby", 20), (4, "dan", 20), (3, "stale", 5)]
    )
    n = incremental_refresh(
        spark, bm, pattern, _transform, target, keys=["id"], order_col="updated_at"
    )
    assert n == 1
    got = _snapshot(spark, target)
    # late arrival must NOT regress key 3; update lands; insert lands
    assert got == {
        1: ("ANA", 10, 3), 2: ("BOBBY", 20, 5), 3: ("EVE", 10, 3), 4: ("DAN", 20, 3)
    }

    # equals the full rebuild over all files ever landed
    full = keep_latest(
        _transform(spark.read.parquet(str(landing / "*.parquet"))),
        ["id"],
        "updated_at",
    )
    assert {
        r["id"]: (r["name"], r["updated_at"], r["name_len"]) for r in full.collect()
    } == got

    # no new files -> no work, table untouched
    assert (
        incremental_refresh(
            spark, bm, pattern, _transform, target, keys=["id"], order_col="updated_at"
        )
        == 0
    )
    assert _snapshot(spark, target) == got


def test_incremental_refresh_crash_replay_is_idempotent(spark, tmp_path):
    """Crash between snapshot commit and bookmark commit: the next run
    re-reads the same files and re-applies the same delta under a new
    batch id — the table must not change."""
    landing = tmp_path / "landing"
    landing.mkdir()
    target = str(tmp_path / "gold")
    pattern = str(landing / "*.parquet")

    _write_batch(landing / "b1.parquet", [(1, "ana", 10), (2, "bob", 10)])
    bm = JobBookmark(str(tmp_path / "bm.json"), "refresh")
    incremental_refresh(
        spark, bm, pattern, _transform, target, keys=["id"], order_col="updated_at"
    )
    before = _snapshot(spark, target)

    # a bookmark whose commit was lost (fresh state: b1 never committed)
    crashed = JobBookmark(str(tmp_path / "bm_crashed.json"), "refresh")
    n = incremental_refresh(
        spark, crashed, pattern, _transform, target, keys=["id"], order_col="updated_at"
    )
    assert n == 1
    assert _snapshot(spark, target) == before
