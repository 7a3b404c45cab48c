"""Bookmark-driven incremental refresh (plans/incremental.py): the
composed production shape — file-set bookmark -> per-increment transform
-> versioned-snapshot keyed upsert — must (a) read only new files,
(b) equal the full rebuild regardless of how rows split across
increments, (c) never regress a newer row on late arrivals, and
(d) be idempotent under crash-replay (re-applying an increment whose
bookmark commit was lost)."""

from __future__ import annotations

import pandas as pd
import pytest
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


# ---------------------------------------------------------------------------
# Incremental AGGREGATE maintenance (incremental_agg_refresh)
# ---------------------------------------------------------------------------

_AGG_SPEC = {
    "n_rows": ("count", "*"),
    "total": ("sum", "amount"),
    "first_seen": ("min", "updated_at"),
    "last_seen": ("max", "updated_at"),
}


def _write_fact(path, rows):
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["key", "amount", "updated_at"])
        ),
        str(path),
    )


def _agg_state(spark, target):
    return {
        r["key"]: (r["n_rows"], r["total"], r["first_seen"], r["last_seen"])
        for r in read_refreshed(spark, target).collect()
    }


def _full_rebuild(spark, landing):
    df = spark.read.parquet(str(landing))
    return {
        r["key"]: (r["n_rows"], r["total"], r["first_seen"], r["last_seen"])
        for r in df.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("amount").alias("total"),
            F.min("updated_at").alias("first_seen"),
            F.max("updated_at").alias("last_seen"),
        )
        .collect()
    }


def test_incremental_agg_refresh_equals_full_rebuild(spark, tmp_path):
    """Three waves with overlapping keys: after each refresh the state
    must equal the one-shot groupBy over every row ever landed, and the
    published schema must stay stable across refreshes."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_agg_refresh,
    )

    landing = tmp_path / "facts"
    landing.mkdir()
    target = str(tmp_path / "agg")
    bm = JobBookmark(str(tmp_path / "bm_agg.json"), "agg")
    pattern = str(landing / "*.parquet")

    waves = [
        [(1, 10, 100), (1, 5, 90), (2, 7, 100)],
        [(2, 3, 110), (3, 8, 50)],
        [(1, 1, 200), (3, 2, 40), (4, 9, 300)],
    ]
    schema_seen = None
    for i, rows in enumerate(waves):
        _write_fact(landing / f"w{i}.parquet", rows)
        n = incremental_agg_refresh(
            spark, bm, pattern, ["key"], _AGG_SPEC, target
        )
        assert n == 1
        assert _agg_state(spark, target) == _full_rebuild(spark, landing)
        schema = read_refreshed(spark, target).schema
        if schema_seen is None:
            schema_seen = schema
        assert schema == schema_seen, "published schema drifted across refreshes"

    # no new files -> no work
    assert incremental_agg_refresh(spark, bm, pattern, ["key"], _AGG_SPEC, target) == 0


def test_agg_refresh_retention_enables_state_time_travel(spark, tmp_path):
    """keep_versions > 1 on the agg refresh: the previous state version
    stays readable (what did the counts look like before this
    increment?) and snapshot_diff over the two versions shows exactly
    the keys the increment moved — the refresh-audit story for any
    monoid state riding this machinery (counts, CMS, HLL, Bloom,
    minima sample)."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.diff import (
        snapshot_diff,
    )
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_agg_refresh,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.sinks import (
        list_versions,
        read_version,
    )

    landing = tmp_path / "facts"
    landing.mkdir()
    target = str(tmp_path / "agg")
    bm = JobBookmark(str(tmp_path / "bm_agg.json"), "agg")
    pattern = str(landing / "*.parquet")

    _write_fact(landing / "w0.parquet", [(1, 10, 100), (2, 7, 100)])
    incremental_agg_refresh(
        spark, bm, pattern, ["key"], _AGG_SPEC, target, keep_versions=2
    )
    _write_fact(landing / "w1.parquet", [(2, 3, 110), (3, 8, 50)])
    incremental_agg_refresh(
        spark, bm, pattern, ["key"], _AGG_SPEC, target, keep_versions=2
    )

    assert list_versions(target) == [0, 1]
    moved = {
        r["key"]: r["change_type"]
        for r in snapshot_diff(
            read_version(spark, target, 0),
            read_version(spark, target, 1),
            keys=["key"],
        ).collect()
        if r["change_type"] != "unchanged"
    }
    assert moved == {2: "changed", 3: "added"}  # key 1 untouched by wave 1


def test_incremental_agg_refresh_crash_replay_never_double_counts(spark, tmp_path):
    """The monoid-merge trap: re-applying a sum delta double-counts. A rerun
    whose increment fingerprint is already in the pointer (crash between
    pointer flip and bookmark commit) must only re-commit the bookmark."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_agg_refresh,
    )

    landing = tmp_path / "facts"
    landing.mkdir()
    target = str(tmp_path / "agg")
    pattern = str(landing / "*.parquet")

    _write_fact(landing / "w0.parquet", [(1, 10, 100), (2, 7, 100)])
    bm = JobBookmark(str(tmp_path / "bm_agg.json"), "agg")
    incremental_agg_refresh(spark, bm, pattern, ["key"], _AGG_SPEC, target)
    _write_fact(landing / "w1.parquet", [(1, 5, 110)])
    incremental_agg_refresh(spark, bm, pattern, ["key"], _AGG_SPEC, target)
    before = _agg_state(spark, target)
    assert before[1] == (2, 15, 100, 110)

    # bookmark that lost ONLY the last commit: w0 committed, w1 pending again
    crashed = JobBookmark(str(tmp_path / "bm_crashed.json"), "agg")
    crashed.commit_files([str(landing / "w0.parquet")])
    n = incremental_agg_refresh(spark, crashed, pattern, ["key"], _AGG_SPEC, target)
    assert n == 1
    assert _agg_state(spark, target) == before  # NOT (3, 20, ...)
    # and the bookmark is healed: nothing pending
    assert incremental_agg_refresh(spark, crashed, pattern, ["key"], _AGG_SPEC, target) == 0


def test_incremental_agg_refresh_rejects_unknown_kind(spark, tmp_path):
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_agg_refresh,
    )

    with pytest.raises(ValueError, match="unsupported kind"):
        incremental_agg_refresh(
            spark,
            JobBookmark(str(tmp_path / "bm.json"), "agg"),
            str(tmp_path / "*.parquet"),
            ["key"],
            {"d": ("avg", "amount")},
            str(tmp_path / "agg"),
        )


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_incremental_agg_refresh_random_wave_splits(spark, tmp_path, seed):
    """Seeded random rows split into random-size waves: the final state
    must equal a pandas groupby over all rows, for ANY split — the
    associativity the monoid merge promises."""
    import random

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_agg_refresh,
    )

    rng = random.Random(seed)
    rows = [
        (rng.randrange(12), rng.randrange(-50, 500), rng.randrange(1000))
        for _ in range(400)
    ]
    cuts = sorted(rng.sample(range(1, 400), rng.randrange(2, 6)))
    waves = [rows[a:b] for a, b in zip([0] + cuts, cuts + [400])]

    landing = tmp_path / "facts"
    landing.mkdir()
    target = str(tmp_path / "agg")
    bm = JobBookmark(str(tmp_path / "bm.json"), "agg")
    for i, wave in enumerate(waves):
        _write_fact(landing / f"w{i}.parquet", wave)
        incremental_agg_refresh(
            spark, bm, str(landing / "*.parquet"), ["key"], _AGG_SPEC, target
        )

    df = pd.DataFrame(rows, columns=["key", "amount", "updated_at"])
    expect = {
        int(k): (int(g["amount"].count()), int(g["amount"].sum()),
                 int(g["updated_at"].min()), int(g["updated_at"].max()))
        for k, g in df.groupby("key")
    }
    assert _agg_state(spark, target) == expect


def test_incremental_agg_refresh_crash_replay_with_new_arrivals(spark, tmp_path):
    """The hard replay case: the crash loses the bookmark commit AND a new
    file lands before the rerun. The rerun must heal the replayed file
    (no re-merge) and process ONLY the genuinely-new one — a fingerprint-
    equality guard misses this and double-counts."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_agg_refresh,
    )

    landing = tmp_path / "facts"
    landing.mkdir()
    target = str(tmp_path / "agg")
    pattern = str(landing / "*.parquet")

    _write_fact(landing / "w0.parquet", [(1, 10, 100)])
    bm = JobBookmark(str(tmp_path / "bm.json"), "agg")
    incremental_agg_refresh(spark, bm, pattern, ["key"], _AGG_SPEC, target)
    _write_fact(landing / "w1.parquet", [(1, 5, 110)])
    incremental_agg_refresh(spark, bm, pattern, ["key"], _AGG_SPEC, target)

    # crash: w1's bookmark commit is lost; w2 lands before the rerun
    crashed = JobBookmark(str(tmp_path / "bm_crashed.json"), "agg")
    crashed.commit_files([str(landing / "w0.parquet")])
    _write_fact(landing / "w2.parquet", [(1, 2, 120)])

    n = incremental_agg_refresh(spark, crashed, pattern, ["key"], _AGG_SPEC, target)
    assert n == 2  # 1 healed + 1 genuinely new
    # exactly once: 10 + 5 + 2, NOT 10 + 5 + 5 + 2
    assert _agg_state(spark, target)[1] == (3, 17, 100, 120)


def test_incremental_agg_refresh_next_commit_heals_orphaned_versions(
    spark, tmp_path
):
    """A crash between the pointer flip and the old-version cleanup
    orphans a snapshot dir; the NEXT successful commit must sweep it
    (retention = O(table), not O(crashes x table))."""
    import os

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_agg_refresh,
    )

    landing = tmp_path / "facts"
    landing.mkdir()
    target = str(tmp_path / "agg")
    pattern = str(landing / "*.parquet")
    bm = JobBookmark(str(tmp_path / "bm.json"), "agg")

    _write_fact(landing / "w0.parquet", [(1, 10, 100)])
    incremental_agg_refresh(spark, bm, pattern, ["key"], _AGG_SPEC, target)
    # simulate the orphan a crashed cleanup leaves behind
    os.makedirs(os.path.join(target, "v998"))
    _write_fact(landing / "w1.parquet", [(2, 7, 100)])
    incremental_agg_refresh(spark, bm, pattern, ["key"], _AGG_SPEC, target)
    versions = sorted(d for d in os.listdir(target) if d.startswith("v"))
    assert versions == ["v1"], versions


def test_incremental_agg_refresh_rejects_key_collision(spark, tmp_path):
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_agg_refresh,
    )

    with pytest.raises(ValueError, match="collides with a group key"):
        incremental_agg_refresh(
            spark,
            JobBookmark(str(tmp_path / "bm.json"), "agg"),
            str(tmp_path / "*.parquet"),
            ["key"],
            {"key": ("sum", "amount")},
            str(tmp_path / "agg"),
        )


# ---------------------------------------------------------------------------
# Incremental corpus dedup
# ---------------------------------------------------------------------------

def _write_docs(path, rows):
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["doc_id", "text"]),
            preserve_index=False,
        ),
        str(path),
    )


def test_incremental_dedup_first_wins_across_waves(spark, tmp_path):
    """New-file digests anti-join the standing digest set: a re-crawled
    duplicate is DROPPED (standing corpus wins, stable doc identity);
    within one increment the min-doc_id copy survives; the live view
    equals the global first-wins dedup replayed in arrival order."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_dedup_refresh,
        read_deduped,
    )

    landing = tmp_path / "crawl"
    landing.mkdir()
    target = str(tmp_path / "corpus")
    pattern = str(landing / "*.parquet")
    bm = JobBookmark(str(tmp_path / "bm_dedup.json"), "dedup")

    _write_docs(landing / "w0.parquet", [(3, "alpha"), (1, "beta"), (9, "alpha")])
    stats = incremental_dedup_refresh(spark, bm, pattern, target)
    assert stats == {
        "new_files": 1, "new_docs": 3, "accepted": 2,
        "dropped_within": 1, "dropped_vs_corpus": 0,
    }
    got = {(r["doc_id"], r["text"]) for r in read_deduped(spark, target).collect()}
    assert got == {(3, "alpha"), (1, "beta")}  # min id wins within wave

    # wave 1: one standing dup (alpha), one internal dup pair (gamma), one new
    _write_docs(
        landing / "w1.parquet",
        [(2, "alpha"), (7, "gamma"), (5, "gamma"), (8, "delta")],
    )
    stats = incremental_dedup_refresh(spark, bm, pattern, target)
    assert stats == {
        "new_files": 1, "new_docs": 4, "accepted": 2,
        "dropped_within": 1, "dropped_vs_corpus": 1,
    }
    got = {(r["doc_id"], r["text"]) for r in read_deduped(spark, target).collect()}
    assert got == {(3, "alpha"), (1, "beta"), (5, "gamma"), (8, "delta")}

    # nothing new -> zero work, view unchanged
    stats = incremental_dedup_refresh(spark, bm, pattern, target)
    assert stats["new_files"] == 0 and stats["accepted"] == 0
    assert {(r["doc_id"], r["text"]) for r in read_deduped(spark, target).collect()} == got


def test_incremental_dedup_crash_replay_never_duplicates(spark, tmp_path):
    """Crash between the pointer flip and the bookmark commit: the rerun
    must heal the bookmark from the pointer's file list and process only
    genuinely-new files — even when MORE files landed meanwhile — never
    re-appending the already-published increment."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_dedup_refresh,
        read_deduped,
    )

    landing = tmp_path / "crawl"
    landing.mkdir()
    target = str(tmp_path / "corpus")
    pattern = str(landing / "*.parquet")

    _write_docs(landing / "w0.parquet", [(1, "alpha"), (2, "beta")])
    bm = JobBookmark(str(tmp_path / "bm.json"), "dedup")
    incremental_dedup_refresh(spark, bm, pattern, target)
    _write_docs(landing / "w1.parquet", [(4, "beta"), (5, "gamma")])
    incremental_dedup_refresh(spark, bm, pattern, target)
    before = {(r["doc_id"], r["text"]) for r in read_deduped(spark, target).collect()}
    assert before == {(1, "alpha"), (2, "beta"), (5, "gamma")}

    # bookmark that lost ONLY the last commit, while a new wave landed too
    crashed = JobBookmark(str(tmp_path / "bm_crashed.json"), "dedup")
    crashed.commit_files([str(landing / "w0.parquet")])
    _write_docs(landing / "w2.parquet", [(6, "gamma"), (7, "epsilon")])
    stats = incremental_dedup_refresh(spark, crashed, pattern, target)
    # healed w1 + processed w2
    assert stats["new_files"] == 2 and stats["accepted"] == 1
    after = {(r["doc_id"], r["text"]) for r in read_deduped(spark, target).collect()}
    assert after == before | {(7, "epsilon")}
    # fully caught up
    assert incremental_dedup_refresh(spark, crashed, pattern, target)["new_files"] == 0


def test_incremental_neardup_refresh(spark, tmp_path):
    """Near-dup twin: a lightly-edited re-crawl of a standing doc is
    dropped via the signature agreement estimator (no corpus text read);
    within-increment near-dups collapse to the smallest id; genuinely new
    docs append."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_neardup_refresh,
        read_deduped,
    )

    landing = tmp_path / "crawl"
    landing.mkdir()
    target = str(tmp_path / "corpus")
    pattern = str(landing / "*.parquet")
    bm = JobBookmark(str(tmp_path / "bm.json"), "neardup")

    base = ("the quick brown fox jumps over the lazy dog while rain falls "
            "softly on the quiet village roofs and children watch from warm "
            "windows counting drops")
    edited = base.replace("counting drops", "counting stars")
    other = ("completely unrelated text about distributed query engines "
             "shuffling partitioned columnar data across executor nodes "
             "with adaptive plans and broadcast joins everywhere")

    _write_docs(landing / "w0.parquet", [(1, base), (2, base + " extra"), (3, other)])
    stats = incremental_neardup_refresh(
        spark, bm, pattern, target, sim_threshold=0.5
    )
    assert stats["new_docs"] == 3
    assert stats["dropped_within"] == 1      # 2 collapses into 1
    assert stats["accepted"] == 2
    got = {r["doc_id"] for r in read_deduped(spark, target).collect()}
    assert got == {1, 3}

    # re-crawl: lightly-edited base (near-dup of standing doc 1) + new doc
    fresh = ("a genuinely novel document describing medieval bread baking "
             "guild regulations and the millers seasonal water rights "
             "disputes along the upper river valley")
    _write_docs(landing / "w1.parquet", [(9, edited), (10, fresh)])
    stats = incremental_neardup_refresh(
        spark, bm, pattern, target, sim_threshold=0.5
    )
    assert stats["dropped_vs_corpus"] == 1   # edited ~ standing base
    assert stats["accepted"] == 1
    got = {r["doc_id"] for r in read_deduped(spark, target).collect()}
    assert got == {1, 3, 10}

    # crash between pointer flip and bookmark commit: heal, no re-append
    crashed = JobBookmark(str(tmp_path / "bm_crashed.json"), "neardup")
    crashed.commit_files([str(landing / "w0.parquet")])
    stats = incremental_neardup_refresh(
        spark, crashed, pattern, target, sim_threshold=0.5
    )
    assert stats == {
        "new_files": 1, "new_docs": 0, "accepted": 0,
        "dropped_within": 0, "dropped_vs_corpus": 0,
    }
    assert {r["doc_id"] for r in read_deduped(spark, target).collect()} == {1, 3, 10}


def test_incremental_dedup_snapshot_compaction(spark, tmp_path):
    """Digest metadata is append-only deltas; at snapshot_compact_at the
    deltas collapse into one dir, superseded dirs are GC'd, and dedup
    semantics are unchanged across the compaction boundary."""
    import json

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_dedup_refresh,
        read_deduped,
    )

    landing = tmp_path / "crawl"
    landing.mkdir()
    target = str(tmp_path / "corpus")
    pattern = str(landing / "*.parquet")
    bm = JobBookmark(str(tmp_path / "bm.json"), "compact")

    for w in range(4):
        _write_docs(
            landing / f"w{w}.parquet",
            [(w * 10, f"fresh text {w}"), (w * 10 + 1, "repeated text")],
        )
        incremental_dedup_refresh(
            spark, bm, pattern, target, snapshot_compact_at=3
        )

    pointer = json.loads((tmp_path / "corpus" / "current.json").read_text())
    # wave 3 hit the threshold (3 deltas), compacted; wave 4 appended one
    assert pointer["digest_deltas"] == ["digests/compact_2", "digests/d3"]
    import os

    live = set(os.listdir(tmp_path / "corpus" / "digests"))
    assert live == {"compact_2", "d3"}  # superseded d0/d1/d2 GC'd

    got = {r["doc_id"] for r in read_deduped(spark, target).collect()}
    # "repeated text" kept only from wave 0; fresh rows all kept
    assert got == {0, 1, 10, 20, 30}


def test_incremental_neardup_snapshot_compaction(spark, tmp_path):
    """Near-dup twin: signature/bucket deltas compact at the threshold
    and the standing index still drops a later re-crawl."""
    import json
    import os

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_neardup_refresh,
        read_deduped,
    )

    landing = tmp_path / "crawl"
    landing.mkdir()
    target = str(tmp_path / "corpus")
    pattern = str(landing / "*.parquet")
    bm = JobBookmark(str(tmp_path / "bm.json"), "ncompact")

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon",
        "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen sixteen seventeen",
        "red orange yellow green blue indigo violet crimson amber "
        "teal navy maroon olive coral salmon ivory",
    ]
    for w, t in enumerate(texts):
        _write_docs(landing / f"w{w}.parquet", [(w * 10, t)])
        incremental_neardup_refresh(
            spark, bm, pattern, target, sim_threshold=0.5, snapshot_compact_at=2
        )

    pointer = json.loads((tmp_path / "corpus" / "current.json").read_text())
    assert pointer["signature_deltas"] == ["signatures/compact_2"]
    assert pointer["bucket_deltas"] == ["buckets/compact_2"]
    assert set(os.listdir(tmp_path / "corpus" / "signatures")) == {"compact_2"}

    # a light edit of wave-0's doc must still be dropped via the
    # COMPACTED standing index
    edited = texts[0].replace("upsilon", "omega")
    _write_docs(landing / "w9.parquet", [(99, edited)])
    stats = incremental_neardup_refresh(
        spark, bm, pattern, target, sim_threshold=0.5, snapshot_compact_at=2
    )
    assert stats["dropped_vs_corpus"] == 1
    assert {r["doc_id"] for r in read_deduped(spark, target).collect()} == {0, 10, 20}


def test_incremental_percentiles_via_log_histogram(spark, tmp_path):
    """Percentile maintenance with zero new framework: the log2 bucket
    rides the group keys, the count monoid keeps the histogram EXACT
    across waves, and the readout's relative error is bounded by the
    bucket width."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        approx_percentiles_from_hist,
        incremental_agg_refresh,
        log2_bucket,
        read_refreshed,
    )

    landing = tmp_path / "facts"
    landing.mkdir()
    pattern = str(landing / "*.parquet")
    state = str(tmp_path / "state")
    bm = JobBookmark(str(tmp_path / "bm.json"), "hist")

    import random

    rng = random.Random(7)
    all_rows = []
    for w in range(3):
        rows = [("api", rng.lognormvariate(3, 1)) for _ in range(4000)] + [
            ("batch", float(rng.randrange(0, 2))) for _ in range(1000)
        ]
        all_rows += rows
        pq.write_table(
            pa.table(
                {"svc": [r[0] for r in rows], "v": [r[1] for r in rows]}
            ),
            str(landing / f"w{w}.parquet"),
        )
        # the landing transform computes the bucket; the refresh then
        # maintains plain counts over (svc, bucket)
        bucketed = spark.read.parquet(str(landing / f"w{w}.parquet")).select(
            "svc", log2_bucket(F.col("v")).alias("bucket")
        )
        tmp_out = str(landing / f"b{w}.parquet")
        bucketed.write.mode("overwrite").parquet(tmp_out)
    incremental_agg_refresh(
        spark, bm, str(landing / "b*.parquet"), ["svc", "bucket"],
        {"n": ("count", "*")}, state,
    )

    hist = read_refreshed(spark, state)
    # histogram is exact: equals one-shot bucket counts over everything
    exact = {}
    for svc, v in all_rows:
        b = -(2**31) if v == 0 else math.floor(8 * math.log2(v))
        exact[(svc, b)] = exact.get((svc, b), 0) + 1
    got = {(r["svc"], r["bucket"]): r["n"] for r in hist.collect()}
    assert got == exact

    pct = approx_percentiles_from_hist(hist, ["svc"], [0.5, 0.99]).collect()
    by_svc = {r["svc"]: r for r in pct}
    api_vals = sorted(v for s, v in all_rows if s == "api")
    for q, col in ((0.5, "p50"), (0.99, "p99")):
        exact_q = api_vals[math.ceil(q * len(api_vals)) - 1]
        assert abs(by_svc["api"][col] - exact_q) / exact_q < 0.10
    # the batch service's median is one of {0, 1}: zero bucket reads 0.0
    assert by_svc["batch"]["p50"] in (0.0, pytest.approx(2 ** (0.5 / 8)))


def _land_docs(path, rows):
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["doc_id", "text"]), preserve_index=False
        ),
        str(path),
    )


def test_corpus_published_filter_chains_dedup_into_incremental_stats(
    spark, tmp_path
):
    """The crawl -> dedup -> incremental-stats chain, exactly-once: a
    downstream agg refresh globs the corpus's accepted/delta_* files
    with corpus_published_filter and maintains per-text-length doc
    counts over exactly the ACCEPTED corpus — end state equals the
    one-shot stats over read_deduped, an on-disk unpublished delta dir
    stays invisible, and every stage is O(increment)."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        corpus_published_filter,
        incremental_agg_refresh,
        incremental_dedup_refresh,
        read_deduped,
        read_refreshed,
    )

    landing = tmp_path / "crawl"
    landing.mkdir()
    target = str(tmp_path / "corpus")
    pattern = str(landing / "*.parquet")
    bm = JobBookmark(str(tmp_path / "bm_dedup.json"), "dedup")

    stats_target = str(tmp_path / "stats")
    stats_bm = JobBookmark(str(tmp_path / "bm_stats.json"), "stats")
    accepted_glob = str(tmp_path / "corpus" / "accepted" / "delta_*" / "*.parquet")
    aggs = {"docs": ("count", "*")}

    waves = [
        [(3, "alpha"), (1, "beta"), (9, "alpha")],  # within-wave dup
        [(12, "beta"), (15, "gamma!!")],  # re-crawl dup vs corpus + new
        [(20, "delta-longer-text"), (21, "gamma!!")],
    ]
    for i, rows in enumerate(waves):
        _land_docs(landing / f"w{i}.parquet", rows)
        incremental_dedup_refresh(spark, bm, pattern, target)
        if i == 1:
            # a crash-before-flip leftover must stay invisible downstream
            stale = tmp_path / "corpus" / "accepted" / "delta_77"
            stale.mkdir(parents=True)
            _land_docs(stale / "part-0.parquet", [(99, "ghost")])
        incremental_agg_refresh(
            spark,
            stats_bm,
            accepted_glob,
            ["length"],
            aggs,
            stats_target,
            transform=lambda df: df.select(F.length("text").alias("length")),
            file_filter=corpus_published_filter(target),
        )

    got = {
        (r["length"], r["docs"]) for r in read_refreshed(spark, stats_target).collect()
    }
    want = {
        (r["length"], r["docs"])
        for r in read_deduped(spark, target)
        .select(F.length("text").alias("length"))
        .groupBy("length")
        .agg(F.count(F.lit(1)).alias("docs"))
        .collect()
    }
    assert got == want
    assert not any("delta_77" in f for f in stats_bm.processed_files)


def test_concurrent_writer_detected_on_pointer_flip(spark, tmp_path):
    """Two writers deriving batch_id+1 from the same pointer must not
    silently overwrite each other's delta and pointer: the flip's CAS
    guard re-reads the pointer and fails loudly when it advanced under
    the increment's feet (r7 advisory)."""
    import json
    import os

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        apply_dedup_increment,
    )

    target = str(tmp_path / "corpus")
    first = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    apply_dedup_increment(spark, first, target, None)
    with open(os.path.join(target, "current.json")) as f:
        stale = json.load(f)

    # writer B advances the pointer while writer A holds the stale read
    apply_dedup_increment(
        spark,
        spark.createDataFrame([(2, "beta")], "doc_id long, text string"),
        target,
        stale,
    )
    with pytest.raises(RuntimeError, match="concurrent writer"):
        apply_dedup_increment(
            spark,
            spark.createDataFrame([(3, "gamma")], "doc_id long, text string"),
            target,
            stale,
        )


def test_neardup_calibration_mismatch_raises(spark, tmp_path):
    """A refresh with a different hash-family calibration scores ~0
    agreement against every standing signature — near-dups of the corpus
    would all silently pass. The calibration is pinned in the pointer on
    first commit and enforced afterwards (r7 advisory)."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_neardup_refresh,
    )

    landing = tmp_path / "crawl"
    landing.mkdir()
    target = str(tmp_path / "corpus")
    pattern = str(landing / "*.parquet")
    text = "some document text long enough to shingle into several grams"
    _land_docs(landing / "w0.parquet", [(1, text)])
    bm = JobBookmark(str(tmp_path / "bm.json"), "cal")
    incremental_neardup_refresh(spark, bm, pattern, target, seed=42)

    _land_docs(landing / "w1.parquet", [(2, text + " extra")])
    with pytest.raises(ValueError, match="calibration mismatch"):
        incremental_neardup_refresh(spark, bm, pattern, target, seed=43)
    # matching calibration proceeds normally
    stats = incremental_neardup_refresh(spark, bm, pattern, target, seed=42)
    assert stats["new_files"] == 1


# ---------------------------------------------------------------------------
# Incremental JOIN-VIEW maintenance (fact ⋈ dim, late-arriving dims)
# ---------------------------------------------------------------------------


def _jv(tmp_path, name="jv"):
    from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import (
        JobBookmark,
    )

    facts = tmp_path / "facts"
    dims = tmp_path / "dims"
    facts.mkdir(exist_ok=True)
    dims.mkdir(exist_ok=True)
    return {
        "facts": facts,
        "dims": dims,
        "fact_pattern": str(facts / "*.parquet"),
        "dim_pattern": str(dims / "*.parquet"),
        "fbm": JobBookmark(str(tmp_path / "fbm.json"), "facts"),
        "dbm": JobBookmark(str(tmp_path / "dbm.json"), "dims"),
        "target": str(tmp_path / name),
    }


def _land(path, df_dict):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(df_dict), preserve_index=False),
        str(path),
    )


def _jv_refresh(spark, e):
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_join_refresh,
    )

    return incremental_join_refresh(
        spark,
        e["fbm"],
        e["fact_pattern"],
        e["dbm"],
        e["dim_pattern"],
        e["target"],
        "k",
        dim_compact_at=16,
    )


def _jv_state(spark, e):
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        read_join_pending,
        read_join_view,
    )

    try:
        view = {
            (r["k"], r["x"], r["attr"])
            for r in read_join_view(spark, e["target"]).collect()
        }
    except ValueError:
        view = set()
    pending = {
        (r["k"], r["x"]) for r in read_join_pending(spark, e["target"]).collect()
    }
    return view, pending


def test_join_refresh_equals_oneshot_any_arrival_order(spark, tmp_path):
    """The delta-rule invariant: after ANY interleaving of fact/dim
    arrivals, view == one-shot inner join of everything landed and
    pending == the unmatched remainder (facts partition exactly into
    the two)."""
    e = _jv(tmp_path)
    # wave 1: facts for keys 0..9, dims only for 0..4
    _land(e["facts"] / "f0.parquet", {"k": list(range(10)), "x": list(range(10))})
    _land(e["dims"] / "d0.parquet", {"k": list(range(5)), "attr": [f"a{i}" for i in range(5)]})
    s = _jv_refresh(spark, e)
    assert s["matched_new"] == 5 and s["pending_rows"] == 5
    view, pending = _jv_state(spark, e)
    assert view == {(i, i, f"a{i}") for i in range(5)}
    assert pending == {(i, i) for i in range(5, 10)}

    # wave 2: late dims 5..7 arrive alone — pending drains WITHOUT
    # re-reading the fact corpus
    _land(e["dims"] / "d1.parquet", {"k": [5, 6, 7], "attr": ["a5", "a6", "a7"]})
    s = _jv_refresh(spark, e)
    assert s["matched_new"] == 3 and s["pending_rows"] == 2

    # wave 3: facts and dims together; fact 20 matches the NEW dim 20,
    # fact 8 matches nothing, fact 3 matches the STANDING dim 3
    _land(e["facts"] / "f1.parquet", {"k": [20, 8, 3], "x": [100, 101, 102]})
    _land(e["dims"] / "d2.parquet", {"k": [20, 9], "attr": ["a20", "a9"]})
    s = _jv_refresh(spark, e)
    assert s["matched_new"] == 3  # fact 20, fact 3, pending fact 9
    view, pending = _jv_state(spark, e)
    assert (20, 100, "a20") in view and (3, 102, "a3") in view
    assert (9, 9, "a9") in view  # drained from pending by the new dim
    assert pending == {(8, 8), (8, 101)}  # both key-8 facts, old and new
    # one-shot equivalence: 5 (wave1) + 3 (wave2 drain) + 3 (wave3)
    assert len(view) == 11 and len(pending) == 2


def test_join_refresh_dims_before_any_fact(spark, tmp_path):
    """Dims landing before the fact pattern has EVER matched a file is
    the normal bootstrap order, not an error; the first fact wave then
    joins the standing dims."""
    e = _jv(tmp_path)
    _land(e["dims"] / "d0.parquet", {"k": [1, 2], "attr": ["a1", "a2"]})
    s = _jv_refresh(spark, e)
    assert s["new_dim_files"] == 1 and s["matched_new"] == 0
    _land(e["facts"] / "f0.parquet", {"k": [1, 3], "x": [10, 30]})
    s = _jv_refresh(spark, e)
    assert s["matched_new"] == 1 and s["pending_rows"] == 1
    view, pending = _jv_state(spark, e)
    assert view == {(1, 10, "a1")} and pending == {(3, 30)}


def test_join_refresh_dim_first_wins(spark, tmp_path):
    """A re-arrived dim key with different attributes never changes the
    standing dim or the published view (immutable-dim contract): both
    the already-matched row and later matches keep the FIRST attrs."""
    e = _jv(tmp_path)
    _land(e["facts"] / "f0.parquet", {"k": [1], "x": [10]})
    _land(e["dims"] / "d0.parquet", {"k": [1], "attr": ["first"]})
    _jv_refresh(spark, e)
    _land(e["dims"] / "d1.parquet", {"k": [1], "attr": ["second"]})
    _land(e["facts"] / "f1.parquet", {"k": [1], "x": [11]})
    s = _jv_refresh(spark, e)
    assert s["matched_new"] == 1
    view, _ = _jv_state(spark, e)
    assert view == {(1, 10, "first"), (1, 11, "first")}

    # within-increment duplicate keys resolve deterministically (min
    # attr struct), independent of file/partition order
    _land(e["dims"] / "d2.parquet", {"k": [7, 7], "attr": ["zz", "aa"]})
    _land(e["facts"] / "f2.parquet", {"k": [7], "x": [70]})
    _jv_refresh(spark, e)
    view, _ = _jv_state(spark, e)
    assert (7, 70, "aa") in view and (7, 70, "zz") not in view


def test_join_refresh_crash_replay_is_exactly_once(spark, tmp_path):
    """Crash between the pointer flip and the bookmark commits: a rerun
    with un-committed bookmarks heals both sides from the pointer's file
    lists and leaves the view/pending byte-identical — no duplicated
    matches, no lost facts."""
    from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import (
        JobBookmark,
    )

    e = _jv(tmp_path)
    _land(e["facts"] / "f0.parquet", {"k": [1, 2, 3], "x": [10, 20, 30]})
    _land(e["dims"] / "d0.parquet", {"k": [1, 2], "attr": ["a1", "a2"]})
    _jv_refresh(spark, e)
    before = _jv_state(spark, e)

    # simulate the crash: fresh bookmark states that never saw the commit
    e["fbm"] = JobBookmark(str(tmp_path / "fbm2.json"), "facts")
    e["dbm"] = JobBookmark(str(tmp_path / "dbm2.json"), "dims")
    s = _jv_refresh(spark, e)
    assert s["healed"] == 2 and s["matched_new"] == 0
    assert _jv_state(spark, e) == before

    # and new arrivals after the heal process normally
    _land(e["dims"] / "d1.parquet", {"k": [3], "attr": ["a3"]})
    s = _jv_refresh(spark, e)
    assert s["matched_new"] == 1 and s["pending_rows"] == 0


def test_join_refresh_measured_join_planner(spark, tmp_path):
    """The ΔF ⋈ D_full join runs through the measured planner
    (operators/skew.py) and the decision lands in the refresh stats:
    a small standing dim takes the pinned-broadcast exit; past the
    broadcast threshold a planted hot increment key trips the salted
    strategy — and either way the published view/pending state is
    identical to the one-shot join (the planner's pinned equivalence,
    exercised end to end inside the refresh pipeline)."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_join_refresh,
    )

    e = _jv(tmp_path)
    # wave 1: dim comfortably under the default broadcast threshold
    _land(e["facts"] / "f0.parquet", {"k": [1, 2, 3], "x": [10, 20, 30]})
    _land(e["dims"] / "d0.parquet", {"k": [1, 2], "attr": ["a1", "a2"]})
    s = _jv_refresh(spark, e)
    assert s["join_decision"]["strategy"] == "broadcast"
    assert s["join_decision"]["right_rows"] == 2
    assert s["matched_new"] == 2 and s["pending_rows"] == 1

    # wave 2: thresholds forced low + a planted hot key in the fact
    # increment -> salted path, sized by the measured hot-key mass
    _land(
        e["facts"] / "f1.parquet",
        {"k": [7] * 12 + [8], "x": list(range(100, 113))},
    )
    _land(e["dims"] / "d1.parquet", {"k": [7, 8, 9], "attr": ["a7", "a8", "a9"]})
    s = incremental_join_refresh(
        spark,
        e["fbm"],
        e["fact_pattern"],
        e["dbm"],
        e["dim_pattern"],
        e["target"],
        "k",
        join_broadcast_threshold_rows=2,  # standing dim (5 rows) won't broadcast
        join_rows_per_partition=4,  # hot key 7 (12 rows) trips salting
    )
    d = s["join_decision"]
    assert d["strategy"] == "salted"
    assert d["left_max_key_rows"] == 12 and d["n_salts"] == 3
    assert d["right_rows"] == 5 and d["right_rows_basis"] == "all rows (exact)"
    assert s["matched_new"] == 13
    view, pending = _jv_state(spark, e)
    expect_view = {(1, 10, "a1"), (2, 20, "a2"), (8, 112, "a8")} | {
        (7, 100 + i, "a7") for i in range(12)
    }
    assert view == expect_view and pending == {(3, 30)}


def test_join_refresh_dim_compaction_preserves_results(spark, tmp_path):
    """Past the compaction threshold the dim deltas collapse into one
    dir with identical join semantics (and the pointer stops listing
    the superseded dirs)."""
    import json
    import os

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_join_refresh,
    )

    e = _jv(tmp_path)
    _land(e["facts"] / "f0.parquet", {"k": list(range(8)), "x": list(range(8))})
    for i in range(4):
        _land(e["dims"] / f"d{i}.parquet", {"k": [2 * i, 2 * i + 1], "attr": [f"a{2*i}", f"a{2*i+1}"]})
        incremental_join_refresh(
            spark,
            e["fbm"],
            e["fact_pattern"],
            e["dbm"],
            e["dim_pattern"],
            e["target"],
            "k",
            dim_compact_at=3,
        )
    with open(os.path.join(e["target"], "current.json")) as f:
        pointer = json.load(f)
    assert len(pointer["dim_deltas"]) <= 3
    assert any("compact" in d for d in pointer["dim_deltas"])
    view, pending = _jv_state(spark, e)
    assert view == {(i, i, f"a{i}") for i in range(8)}
    assert pending == set()


def test_cli_join_refresh(spark, tmp_path, capsys):
    """join-refresh CLI: one bookmark file hosts both sides; summary
    reports matched/pending; a dim-only follow-up drains pending."""
    import json

    from big_data_processing_with_aws_glue_workshop_spark.cli import main

    e = _jv(tmp_path)
    base = [
        "join-refresh",
        "--fact-pattern", e["fact_pattern"],
        "--dim-pattern", e["dim_pattern"],
        "--bookmark", str(tmp_path / "bm.json"),
        "--target", e["target"],
        "--key", "k",
    ]
    _land(e["facts"] / "f0.parquet", {"k": [1, 2], "x": [10, 20]})
    _land(e["dims"] / "d0.parquet", {"k": [1], "attr": ["a1"]})
    main(base)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["matched_new"] == 1 and out["pending_rows"] == 1

    _land(e["dims"] / "d1.parquet", {"k": [2], "attr": ["a2"]})
    main(base)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["matched_new"] == 1 and out["pending_rows"] == 0
    view, pending = _jv_state(spark, e)
    assert view == {(1, 10, "a1"), (2, 20, "a2")} and pending == set()


def test_join_refresh_crash_replay_with_new_arrivals(spark, tmp_path):
    """The hard replay case: crash between the pointer flip and the
    bookmark commits, AND new files (fact + dim) land before the rerun.
    The heal must commit exactly the pointer-listed files and process
    only the genuinely-new remainder — replayed matches land once,
    new matches land once."""
    from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import (
        JobBookmark,
    )

    e = _jv(tmp_path)
    _land(e["facts"] / "f0.parquet", {"k": [1, 2], "x": [10, 20]})
    _land(e["dims"] / "d0.parquet", {"k": [1], "attr": ["a1"]})
    _jv_refresh(spark, e)

    # crash: bookmarks lost; new files land before the rerun
    e["fbm"] = JobBookmark(str(tmp_path / "fbm2.json"), "facts")
    e["dbm"] = JobBookmark(str(tmp_path / "dbm2.json"), "dims")
    _land(e["facts"] / "f1.parquet", {"k": [3], "x": [30]})
    _land(e["dims"] / "d1.parquet", {"k": [2, 3], "attr": ["a2", "a3"]})
    s = _jv_refresh(spark, e)
    assert s["healed"] == 2
    assert s["new_fact_files"] == 1 and s["new_dim_files"] == 1
    # new fact 3 matches new dim 3; pending fact 2 drains via new dim 2
    assert s["matched_new"] == 2 and s["pending_rows"] == 0
    view, pending = _jv_state(spark, e)
    assert view == {(1, 10, "a1"), (2, 20, "a2"), (3, 30, "a3")}
    assert pending == set()


def test_join_refresh_gc_superseded_dirs(spark, tmp_path):
    """Post-flip GC: compaction-superseded dim dirs and the previous
    pending version are removed; only pointer-referenced dirs remain."""
    import json
    import os

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_join_refresh,
    )

    e = _jv(tmp_path)
    _land(e["facts"] / "f0.parquet", {"k": list(range(6)), "x": list(range(6))})
    for i in range(4):
        _land(e["dims"] / f"d{i}.parquet", {"k": [i], "attr": [f"a{i}"]})
        incremental_join_refresh(
            spark, e["fbm"], e["fact_pattern"], e["dbm"], e["dim_pattern"],
            e["target"], "k", dim_compact_at=3,
        )
    with open(os.path.join(e["target"], "current.json")) as f:
        pointer = json.load(f)
    on_disk_dim = {f"dim/{d}" for d in os.listdir(os.path.join(e["target"], "dim"))}
    on_disk_pending = {
        f"pending/{d}" for d in os.listdir(os.path.join(e["target"], "pending"))
    }
    assert on_disk_dim == set(pointer["dim_deltas"])
    assert on_disk_pending == {pointer["pending"]}


def test_join_refresh_null_key_facts_stay_pending(spark, tmp_path):
    """NULL-join-key facts never match (SQL inner-join semantics) and
    never disappear: they remain in the pending/RI report across
    refreshes."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    e = _jv(tmp_path)
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"k": pd.array([1, None], dtype="Int64"), "x": [10, 99]}),
            preserve_index=False,
        ),
        str(e["facts"] / "f0.parquet"),
    )
    _land(e["dims"] / "d0.parquet", {"k": [1, 2], "attr": ["a1", "a2"]})
    s = _jv_refresh(spark, e)
    assert s["matched_new"] == 1 and s["pending_rows"] == 1
    _land(e["dims"] / "d1.parquet", {"k": [3], "attr": ["a3"]})
    s = _jv_refresh(spark, e)
    assert s["pending_rows"] == 1  # the NULL-key fact persists
    _, pending = _jv_state(spark, e)
    assert pending == {(None, 99)}


def test_join_view_feeds_agg_refresh_two_stage_pipeline(spark, tmp_path):
    """Composability: the join view's APPEND-ONLY delta dirs are ordinary
    parquet files, so a second incremental_agg_refresh bookmark consumes
    them directly — a fully incremental star rollup (facts land ->
    join-enrich -> per-attr aggregate) where EVERY stage is O(increment)
    and the end state equals the one-shot join+groupBy of everything
    ever landed."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_agg_refresh,
        incremental_join_refresh,
        join_view_published_filter,
        read_refreshed,
    )
    from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import (
        JobBookmark,
    )

    e = _jv(tmp_path)
    agg_target = str(tmp_path / "rollup")
    agg_bm = JobBookmark(str(tmp_path / "agg_bm.json"), "rollup")
    view_glob = str(tmp_path / "jv" / "view" / "delta_*" / "*.parquet")

    waves = [
        ({"k": [1, 2, 1], "x": [10, 20, 30]}, {"k": [1], "attr": ["a"]}),
        ({"k": [2, 3], "x": [40, 50]}, {"k": [2], "attr": ["b"]}),
        ({"k": [3], "x": [60]}, {"k": [3], "attr": ["a"]}),
    ]
    for i, (facts, dims) in enumerate(waves):
        _land(e["facts"] / f"f{i}.parquet", facts)
        _land(e["dims"] / f"d{i}.parquet", dims)
        _jv_refresh(spark, e)
        incremental_agg_refresh(
            spark,
            agg_bm,
            view_glob,
            ["attr"],
            {"n": ("count", "*"), "total": ("sum", "x")},
            agg_target,
            # the exactly-once contract for glob-consuming another
            # refresh's output: admit only pointer-published delta files
            # (fresh filter per cycle — it snapshots the pointer)
            file_filter=join_view_published_filter(e["target"]),
        )

    got = {
        r["attr"]: (r["n"], r["total"])
        for r in read_refreshed(spark, agg_target).collect()
    }
    # one-shot truth: all matched facts grouped by dim attr
    # attr a: k=1 facts (10, 30) + k=3 facts (50, 60); attr b: k=2 (20, 40)
    assert got == {"a": (4, 150), "b": (2, 60)}


def test_two_stage_filter_skips_unpublished_delta_until_published(spark, tmp_path):
    """The exactly-once hole the published filter closes: a view delta
    dir that exists on disk but is NOT pointer-listed (a crash-before-
    flip leftover, about to be rewritten by replay) must be invisible to
    the downstream agg refresh — and consumed exactly once after it
    publishes."""
    import json

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_agg_refresh,
        join_view_published_filter,
        read_refreshed,
    )
    from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import (
        JobBookmark,
    )

    e = _jv(tmp_path)
    _land(e["facts"] / "f0.parquet", {"k": [1, 1], "x": [10, 30]})
    _land(e["dims"] / "d0.parquet", {"k": [1], "attr": ["a"]})
    _jv_refresh(spark, e)

    # simulate a crash-before-flip leftover: an on-disk delta dir the
    # pointer does not list (same thing the staging rename narrowly
    # avoids mid-write, reproduced here at rest)
    stale = tmp_path / "jv" / "view" / "delta_99"
    stale.mkdir(parents=True)
    _land(stale / "part-0.parquet", {"k": [7], "x": [700], "attr": ["a"]})

    agg_target = str(tmp_path / "rollup")
    agg_bm = JobBookmark(str(tmp_path / "agg_bm.json"), "rollup")
    view_glob = str(tmp_path / "jv" / "view" / "delta_*" / "*.parquet")
    aggs = {"n": ("count", "*"), "total": ("sum", "x")}

    incremental_agg_refresh(
        spark, agg_bm, view_glob, ["attr"], aggs, agg_target,
        file_filter=join_view_published_filter(e["target"]),
    )
    got = {r["attr"]: (r["n"], r["total"]) for r in read_refreshed(spark, agg_target).collect()}
    assert got == {"a": (2, 40)}  # the unpublished 700 is invisible
    # and its path is NOT bookmark-committed (it will be consumed when
    # its generation publishes, not silently skipped forever)
    assert not any("delta_99" in f for f in agg_bm.processed_files)

    # "publish" it (what the replayed join refresh's flip does), rerun:
    # consumed exactly once
    ptr_path = tmp_path / "jv" / "current.json"
    ptr = json.loads(ptr_path.read_text())
    ptr["view_deltas"].append("view/delta_99")
    ptr_path.write_text(json.dumps(ptr))
    incremental_agg_refresh(
        spark, agg_bm, view_glob, ["attr"], aggs, agg_target,
        file_filter=join_view_published_filter(e["target"]),
    )
    got = {r["attr"]: (r["n"], r["total"]) for r in read_refreshed(spark, agg_target).collect()}
    assert got == {"a": (3, 740)}


def test_agg_refresh_first_run_noops_when_filter_rejects_all(spark, tmp_path):
    """The composition's cold start: upstream wrote a delta but crashed
    before its flip, downstream's FIRST run sees files the published
    filter rejects and nothing committed — must return 0 (admit-none),
    not crash in schema inference (r9 review: read_incremental raised
    FileNotFoundError here)."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_agg_refresh,
    )

    landing = tmp_path / "facts"
    landing.mkdir()
    _land(landing / "f0.parquet", {"k": [1], "x": [1]})
    bm = JobBookmark(str(tmp_path / "bm.json"), "agg")
    n = incremental_agg_refresh(
        spark,
        bm,
        str(landing / "*.parquet"),
        ["k"],
        {"n": ("count", "*")},
        str(tmp_path / "state"),
        file_filter=lambda _p: False,
    )
    assert n == 0
    assert bm.processed_files == set()  # nothing consumed, nothing committed


def test_join_refresh_drops_null_dim_keys(spark, tmp_path):
    """NULL-key dim rows can never match a fact (inner-join semantics)
    and would defeat the first-wins left_anti guard (NULL never equals
    the standing NULLs), re-appending one garbage row per increment —
    they are dropped at ingest, keeping the one-row-per-key dim
    invariant. NULL-key FACTS keep their pinned pending-resident
    semantics."""
    import json

    e = _jv(tmp_path)
    _land(e["facts"] / "f0.parquet", {"k": [1.0, None], "x": [10, 99]})
    _land(e["dims"] / "d0.parquet", {"k": [1.0, None], "attr": ["a", "junk0"]})
    _jv_refresh(spark, e)
    _land(e["dims"] / "d1.parquet", {"k": [None, 2.0], "attr": ["junk1", "b"]})
    _jv_refresh(spark, e)

    ptr = json.loads((tmp_path / "jv" / "current.json").read_text())
    dim_state = spark.read.parquet(
        *[str(tmp_path / "jv" / d) for d in ptr["dim_deltas"]]
    )
    rows = {(r["k"], r["attr"]) for r in dim_state.collect()}
    assert rows == {(1.0, "a"), (2.0, "b")}  # no NULL-key rows, ever
    # the NULL-key fact is still the RI signal in pending
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        read_join_pending,
    )

    pend = {(r["k"], r["x"]) for r in read_join_pending(spark, e["target"]).collect()}
    assert pend == {(None, 99)}


def test_read_join_pending_dims_only_raises_descriptively(spark, tmp_path):
    """A dims-only state has no pending buffer (and no fact schema):
    read_join_pending must raise a descriptive error, not TypeError on
    os.path.join(..., None)."""
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        read_join_pending,
    )

    e = _jv(tmp_path)
    _land(e["dims"] / "d0.parquet", {"k": [1], "attr": ["a"]})
    _jv_refresh(spark, e)
    with pytest.raises(ValueError, match="no pending buffer"):
        read_join_pending(spark, e["target"])


def test_read_join_view_left_equals_oneshot_left_join(spark, tmp_path):
    """The derived LEFT materialization equals the one-shot left join:
    matched rows carry dim attrs, unmatched carry NULLs, nothing lost."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        read_join_view_left,
    )

    e = _jv(tmp_path)
    _land(e["facts"] / "f0.parquet", {"k": [1, 2, 3], "x": [10, 20, 30]})
    _land(e["dims"] / "d0.parquet", {"k": [1, 3], "attr": ["a1", "a3"]})
    _jv_refresh(spark, e)
    got = {
        (r["k"], r["x"], r["attr"])
        for r in read_join_view_left(spark, e["target"]).collect()
    }
    assert got == {(1, 10, "a1"), (3, 30, "a3"), (2, 20, None)}


def test_join_refresh_refuses_foreign_target(spark, tmp_path):
    """Pointing join-refresh at another refresh family's target raises a
    descriptive error, not a KeyError deep in the plan."""
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_agg_refresh,
    )

    e = _jv(tmp_path)
    _land(e["facts"] / "f0.parquet", {"k": [1], "x": [1]})
    incremental_agg_refresh(
        spark,
        JobBookmark(str(tmp_path / "abm.json"), "agg"),
        e["fact_pattern"],
        ["k"],
        {"n": ("count", "*")},
        e["target"],  # an AGG state now lives at the join target path
    )
    with pytest.raises(ValueError, match="not a join-view state"):
        _jv_refresh(spark, e)


# ---------------------------------------------------------------------------
# Incremental SEMANTIC (embedding) near-dup refresh
# ---------------------------------------------------------------------------


def _write_vecs(path, rows):
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]}
            ),
            preserve_index=False,
        ).cast(
            pa.schema(
                [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
            )
        ),
        str(path),
    )


def _cos(u, v):
    import math

    du = math.sqrt(sum(x * x for x in u))
    dv = math.sqrt(sum(x * x for x in v))
    if du == 0.0 or dv == 0.0:
        return float("nan")
    return sum(x * y for x, y in zip(u, v)) / (du * dv)


def test_incremental_semantic_refresh(spark, tmp_path):
    """Semantic twin of the near-dup refresh: a re-embedded near-copy of
    a standing vector is dropped via the pinned-centroid cell pruning +
    exact cosine verify; within-increment near-dups collapse to the
    smallest id; genuinely new vectors append; crash healing replays
    cleanly."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_semantic_refresh,
        read_deduped,
    )

    landing = tmp_path / "vecs"
    landing.mkdir()
    target = str(tmp_path / "corpus")
    pattern = str(landing / "*.parquet")
    bm = JobBookmark(str(tmp_path / "bm.json"), "semantic")

    base = [1.0, 0.2, -0.5, 0.8]
    near = [1.01, 0.21, -0.49, 0.82]       # cos ~0.9999 with base
    ortho = [-0.2, 1.0, 0.8, 0.1]          # far from base
    _write_vecs(landing / "w0.parquet", [(1, base), (2, near), (3, ortho)])
    stats = incremental_semantic_refresh(
        spark, bm, pattern, target, threshold=0.95, nlist=2
    )
    assert stats["new_docs"] == 3
    assert stats["dropped_within"] == 1     # 2 collapses into 1
    assert stats["accepted"] == 2
    assert {r["vec_id"] for r in read_deduped(spark, target).collect()} == {1, 3}

    near2 = [0.99, 0.19, -0.51, 0.79]       # near-dup of standing base
    fresh = [0.1, -0.9, 0.3, 0.6]           # genuinely new direction
    _write_vecs(landing / "w1.parquet", [(9, near2), (10, fresh)])
    stats = incremental_semantic_refresh(
        spark, bm, pattern, target, threshold=0.95, nlist=2
    )
    assert stats["dropped_vs_corpus"] == 1
    assert stats["accepted"] == 1
    assert {r["vec_id"] for r in read_deduped(spark, target).collect()} == {1, 3, 10}

    # crash between pointer flip and bookmark commit: heal, no re-append
    crashed = JobBookmark(str(tmp_path / "bm_crashed.json"), "semantic")
    crashed.commit_files([str(landing / "w0.parquet")])
    stats = incremental_semantic_refresh(
        spark, crashed, pattern, target, threshold=0.95, nlist=2
    )
    assert stats == {
        "new_files": 1, "new_docs": 0, "accepted": 0,
        "dropped_within": 0, "dropped_vs_corpus": 0, "allow_share": None,
    }
    assert {r["vec_id"] for r in read_deduped(spark, target).collect()} == {1, 3, 10}


def test_semantic_calibration_mismatch_raises(spark, tmp_path):
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_semantic_refresh,
    )

    landing = tmp_path / "vecs"
    landing.mkdir()
    target = str(tmp_path / "corpus")
    pattern = str(landing / "*.parquet")
    bm = JobBookmark(str(tmp_path / "bm.json"), "semantic")
    _write_vecs(landing / "w0.parquet", [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
    incremental_semantic_refresh(spark, bm, pattern, target, threshold=0.9)
    _write_vecs(landing / "w1.parquet", [(3, [0.5, 0.5])])
    with pytest.raises(ValueError, match="calibration mismatch"):
        incremental_semantic_refresh(spark, bm, pattern, target, threshold=0.8)
    stats = incremental_semantic_refresh(spark, bm, pattern, target, threshold=0.9)
    assert stats["new_docs"] == 1


@pytest.mark.parametrize("seed", [5, 17])
@pytest.mark.slow
def test_semantic_refresh_randomized_parity(spark, tmp_path, seed):
    """Candidate recall 1.0 is a THEOREM (triangle inequality), so the
    incremental path must reproduce, on random data with planted
    near-dups, exactly the accepted set of a quadratic pure-Python
    reference implementing the same conservative semantics: per wave,
    drop vectors similar to any smaller-id wave member (even a dropped
    one), then drop survivors similar to any previously-ACCEPTED vector."""
    import random

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_semantic_refresh,
        read_deduped,
    )

    rng = random.Random(seed)
    dim, thr = 6, 0.92
    def rand_vec():
        return [rng.uniform(-1, 1) for _ in range(dim)]

    vid = 0
    waves = []
    for _ in range(3):
        wave = []
        for _ in range(25):
            vid += 1
            v = rand_vec()
            wave.append((vid, [float(x) for x in v]))
            if rng.random() < 0.4:  # plant a near-copy (higher id)
                vid += 1
                w = [x * rng.uniform(0.97, 1.03) + rng.uniform(-0.01, 0.01) for x in v]
                wave.append((vid, [float(x) for x in w]))
        # plant a zero-norm vector: NaN cosine on either side => it can
        # neither drop nor be dropped (the engine excludes it from the
        # pruning entirely; the reference's NaN >= thr is false)
        vid += 1
        wave.append((vid, [0.0] * dim))
        waves.append(wave)

    # float32 storage: the engine reads float32 parquet; round-trip the
    # reference vectors through float32 so both sides score identical bits
    import numpy as np

    waves = [
        [(i, [float(np.float32(x)) for x in v]) for i, v in wave]
        for wave in waves
    ]

    # quadratic reference with identical semantics
    accepted: list[tuple[int, list]] = []
    for wave in waves:
        drop_within = set()
        for i, (ida, va) in enumerate(wave):
            for idb, vb in wave[:i]:
                if _cos(vb, va) >= thr:
                    drop_within.add(ida)
                    break
        for ida, va in wave:
            if ida in drop_within:
                continue
            if any(_cos(vs, va) >= thr for _, vs in accepted):
                continue
            accepted.append((ida, va))
    expected = {ida for ida, _ in accepted}

    landing = tmp_path / "vecs"
    landing.mkdir()
    target = str(tmp_path / "corpus")
    pattern = str(landing / "*.parquet")
    bm = JobBookmark(str(tmp_path / "bm.json"), "semantic")
    for w, wave in enumerate(waves):
        _write_vecs(landing / f"w{w}.parquet", wave)
        incremental_semantic_refresh(
            spark, bm, pattern, target, threshold=thr, nlist=4, seed=seed
        )
    got = {r["vec_id"] for r in read_deduped(spark, target).collect()}
    assert got == expected
    assert len(expected) < vid  # the fixture actually dropped something


@pytest.mark.slow
def test_semantic_recell_preserves_decisions(spark, tmp_path):
    """Drop decisions are CALIBRATION-INDEPENDENT given the same
    threshold (the allowlist is recall-1.0 for ANY centroid matrix and
    the verify stage is exact), so a maintenance re-cell must change
    per-refresh candidate volume ONLY: two targets fed identical waves,
    one re-celled mid-stream, accept and drop identically — and the
    re-celled state collapses to one delta under the new calibration,
    which later refreshes must name (the mismatch guard refuses the old
    nlist)."""
    import random

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_semantic_refresh,
        read_deduped,
        semantic_recell,
    )

    rng = random.Random(11)
    dim, thr = 6, 0.92

    def rand_vec():
        return [float(rng.uniform(-1, 1)) for _ in range(dim)]

    vid = 0
    waves = []
    for _ in range(2):
        wave = []
        for _ in range(15):
            vid += 1
            wave.append((vid, rand_vec()))
        waves.append(wave)
    # wave 3: near-copies of standing wave-1 vectors (must drop vs
    # corpus on BOTH targets) + fresh directions
    wave3 = []
    for base_id, base_v in waves[0][:4]:
        vid += 1
        wave3.append(
            (vid, [x * rng.uniform(0.99, 1.01) + rng.uniform(-0.005, 0.005) for x in base_v])
        )
    for _ in range(6):
        vid += 1
        wave3.append((vid, rand_vec()))
    waves.append(wave3)

    import numpy as np

    waves = [
        [(i, [float(np.float32(x)) for x in v]) for i, v in wave] for wave in waves
    ]

    landing = tmp_path / "vecs"
    landing.mkdir()
    pattern = str(landing / "*.parquet")
    targets = {n: str(tmp_path / f"corpus_{n}") for n in ("a", "b")}
    bms = {n: JobBookmark(str(tmp_path / f"bm_{n}.json"), f"sem_{n}") for n in ("a", "b")}

    # waves 1-2 land on both targets identically (nlist 4)
    for w, wave in enumerate(waves[:2]):
        _write_vecs(landing / f"w{w}.parquet", wave)
        for n in ("a", "b"):
            incremental_semantic_refresh(
                spark, bms[n], pattern, targets[n], threshold=thr, nlist=4, seed=7
            )
    before = {r["vec_id"] for r in read_deduped(spark, targets["b"]).collect()}

    # re-cell target B: state rewritten under nlist ~ sqrt(n), one delta
    rc = semantic_recell(spark, targets["b"])
    assert rc["old_nlist"] == 4 and rc["new_nlist"] != 4
    assert rc["rows"] == len(before)
    # the maintenance op confirms its own effect: post-flip share
    assert rc["allow_share"] is not None and 0.0 <= rc["allow_share"] <= 1.0
    import json as _json
    import os as _os

    with open(_os.path.join(targets["b"], "current.json")) as f:
        ptr = _json.load(f)
    assert ptr["deltas"] == [f"accepted/recell_{rc['batch_id']}"]
    assert ptr["calibration"]["nlist"] == rc["new_nlist"]
    assert len(ptr["centroids"]) == rc["new_nlist"]
    # the standing set itself is unchanged by the re-cell
    assert {r["vec_id"] for r in read_deduped(spark, targets["b"]).collect()} == before

    # wave 3: the old calibration is refused on B ...
    _write_vecs(landing / "w2.parquet", waves[2])
    with pytest.raises(ValueError, match="calibration mismatch"):
        incremental_semantic_refresh(
            spark, bms["b"], pattern, targets["b"], threshold=thr, nlist=4, seed=7
        )
    # ... and under the new one, A (never re-celled) and B decide
    # identically, row for row and stat for stat
    sa = incremental_semantic_refresh(
        spark, bms["a"], pattern, targets["a"], threshold=thr, nlist=4, seed=7
    )
    sb = incremental_semantic_refresh(
        spark, bms["b"], pattern, targets["b"], threshold=thr,
        nlist=rc["new_nlist"], seed=7,
    )
    for k in ("new_docs", "accepted", "dropped_within", "dropped_vs_corpus"):
        assert sa[k] == sb[k], k
    assert sa["dropped_vs_corpus"] >= 1  # the planted near-copies really drop
    got_a = {r["vec_id"] for r in read_deduped(spark, targets["a"]).collect()}
    got_b = {r["vec_id"] for r in read_deduped(spark, targets["b"]).collect()}
    assert got_a == got_b


@pytest.mark.slow
def test_semantic_refresh_allow_share_decay_signal(spark, tmp_path):
    """The r11 verdict's operational gap: the measured pinned-centroid
    decay (SCALE.md r11's 128-blob fixture, waves degrading 2-4x) had no
    signal in the refresh stats. Every refresh now reports
    ``allow_share`` — allowed / possible cell pairs in the vs-standing
    allowlist — and the documented trigger must separate a corpus that
    stayed clustered (share far below) from one that decayed off its
    pinned centroids (share at/above): same wave-1 fit, different
    wave 2."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        RECELL_ALLOW_SHARE_TRIGGER,
        incremental_semantic_refresh,
    )

    dim, thr = 6, 0.99

    def blob(axis, vid, eps):
        v = [0.0] * dim
        v[axis] = 1.0
        v[(axis + 1) % dim] = eps  # small tilt: blob members, not copies
        return (vid, v)

    # wave 1 (both targets): 4 tight blobs along e0..e3 — the fit pins
    # one centroid per blob and the standing radii stay small
    wave1 = [blob(a, 10 * a + j, 0.02 * (j + 1)) for a in range(4) for j in range(3)]
    # clustered wave 2: more members of the same blobs -> tiny radii,
    # cross-cell pairs stay pruned (cell separation ~pi/2 each)
    wave2_clustered = [blob(a, 100 + 10 * a + j, 0.03 * (j + 1)) for a in range(4) for j in range(2)]
    # decayed wave 2: one far member PER CELL, deterministically — a
    # small component along the cell's own axis pins the assignment
    # (cos 0.12 beats the 0 of every other centroid) while the bulk of
    # the vector points off into dims the pinned cells never saw
    # (+/-e4, +/-e5: four distinct directions, pairwise |cos| <= 0.986
    # < thr so nothing drops), so EVERY cell's radius inflates to
    # arccos(0.12) ~ 1.45 rad and the triangle inequality can rule
    # nothing out
    wave2_decayed = []
    for a in range(4):
        v = [0.0] * dim
        v[a] = 0.12
        v[4 + a % 2] = 0.993 * (1.0 if a < 2 else -1.0)
        wave2_decayed.append((200 + a, v))

    shares = {}
    for name, wave2 in (("clustered", wave2_clustered), ("decayed", wave2_decayed)):
        landing = tmp_path / f"vecs_{name}"
        landing.mkdir()
        pattern = str(landing / "*.parquet")
        target = str(tmp_path / f"corpus_{name}")
        bm = JobBookmark(str(tmp_path / f"bm_{name}.json"), f"sem_{name}")
        _write_vecs(landing / "w0.parquet", wave1)
        s1 = incremental_semantic_refresh(
            spark, bm, pattern, target, threshold=thr, nlist=4, seed=7
        )
        # first refresh: no standing corpus yet — the within-increment
        # share is reported (clustered fit: only same-cell pairs allowed)
        assert s1["allow_share"] is not None
        _write_vecs(landing / "w1.parquet", wave2)
        s2 = incremental_semantic_refresh(
            spark, bm, pattern, target, threshold=thr, nlist=4, seed=7
        )
        shares[name] = s2["allow_share"]

    assert shares["clustered"] < RECELL_ALLOW_SHARE_TRIGGER, shares
    assert shares["decayed"] >= RECELL_ALLOW_SHARE_TRIGGER, shares
    # and the clustered corpus genuinely still prunes most cell pairs
    assert shares["clustered"] <= 0.5, shares

    # the on-demand report (no wave required) reads the same signal
    # from the published state and carries the recommendation bit
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        semantic_allow_report,
    )

    rep_c = semantic_allow_report(spark, str(tmp_path / "corpus_clustered"))
    rep_d = semantic_allow_report(spark, str(tmp_path / "corpus_decayed"))
    assert not rep_c["recell_recommended"], rep_c
    assert rep_d["recell_recommended"], rep_d
    assert rep_c["allow_share"] < RECELL_ALLOW_SHARE_TRIGGER <= rep_d["allow_share"]
    assert rep_c["rows"] > 0 and rep_c["cells_occupied"] <= rep_c["nlist"]
    # guard parity with semantic_recell: a non-semantic target refuses
    import json as _json

    other = tmp_path / "other_family"
    other.mkdir()
    (other / "current.json").write_text(
        _json.dumps({"batch_id": 0, "deltas": [], "view_deltas": []})
    )
    with pytest.raises(ValueError, match="not a semantic-dedup state"):
        semantic_allow_report(spark, str(other))


def test_semantic_recell_guards(spark, tmp_path):
    """Re-cell refuses targets that aren't semantic-dedup states (wrong
    refresh family, no state at all) with actionable errors instead of
    corrupting a pointer it doesn't own."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        semantic_recell,
    )

    with pytest.raises(ValueError, match="nothing to re-cell"):
        semantic_recell(spark, str(tmp_path / "nowhere"))

    import json as _json

    other = tmp_path / "other_family"
    other.mkdir()
    (other / "current.json").write_text(
        _json.dumps({"batch_id": 0, "deltas": [], "view_deltas": []})
    )
    with pytest.raises(ValueError, match="not a semantic-dedup state"):
        semantic_recell(spark, str(other))


def test_semantic_recell_explicit_nlist_ignores_cap(spark, tmp_path):
    """r13 ADVICE: nlist_cap binds only the DERIVED sqrt(n) default. An
    explicitly passed nlist is the caller's deliberate parallelism
    choice and must be taken verbatim even above the cap (the old code
    silently clamped it, so a caller who previously got nlist=128 got
    32 when the default cap dropped)."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_semantic_refresh,
        semantic_recell,
    )
    from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import (
        JobBookmark,
    )

    landing = tmp_path / "vecs"
    landing.mkdir()
    rows = [_axis_blob(16, i % 8, i, 0.02 * (i // 8)) for i in range(64)]
    _write_vecs(landing / "w0.parquet", rows)
    target = str(tmp_path / "corpus")
    bm = JobBookmark(str(tmp_path / "bm.json"), "sem")
    incremental_semantic_refresh(
        spark, bm, str(landing / "*.parquet"), target,
        threshold=0.999, nlist=4, seed=7,
    )
    # explicit nlist above the cap wins outright
    rc = semantic_recell(spark, target, nlist=40, nlist_cap=32)
    assert rc["new_nlist"] == 40
    # the derived default still respects the cap
    rc2 = semantic_recell(spark, target, nlist_cap=1)
    assert rc2["new_nlist"] == 1


def _axis_blob(dim, a, vid, theta):
    """Unit vector cos(theta)*e_a + sin(theta)*e_(9 + a%3): blob `a`
    member at exact angle theta off its axis — pairwise within-blob
    angles are exact theta differences, so the dedup threshold can be
    placed with zero slop."""
    import math

    v = [0.0] * dim
    v[a] = math.cos(theta)
    v[9 + a % 3] = math.sin(theta)
    return (vid, v)


@pytest.mark.slow
def test_recell_on_trigger_closes_the_loop(spark, tmp_path):
    """The r12 verdict's order #4 — acting on allow_share is no longer a
    human reading stats. The decision point
    (plans/incremental.py::maybe_recell_on_trigger, shared by the CLI
    flag and the streaming sink flag) must: fire EXACTLY ONCE on a
    decayed corpus (the wave after the recell reports a share back below
    the trigger), never fire on a corpus that stayed clustered, and stay
    consistent across a crash between the wave flip and the recell flip
    (both flips are individually atomic; the restart path re-adopts the
    stored nlist and simply re-fires).

    Fixture: 9 tight blobs along axes e0..e8 (members at exact angles
    0, .05, .., .40 off-axis; threshold 0.999 = 0.0447 rad, below the
    .05 spacing, so nothing dedups away). Wave 1 fits+pins 3 cells on
    blobs 0-2; a decayed wave 2 lands blobs 3-8, whose members sit
    ~pi/2 from every pinned centroid — radii inflate to ~1.5 rad and
    the allowlist degrades to share 1.0."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        RECELL_ALLOW_SHARE_TRIGGER,
        incremental_semantic_refresh,
        maybe_recell_on_trigger,
        read_deduped,
        semantic_allow_report,
        stored_semantic_nlist,
    )

    dim, thr = 12, 0.999
    wave1 = [_axis_blob(dim, a, 100 * a + j, 0.05 * j) for a in range(3) for j in range(9)]
    wave2_decayed = [
        _axis_blob(dim, a, 100 * a + j, 0.05 * j) for a in range(3, 9) for j in range(9)
    ]
    wave2_clustered = [
        _axis_blob(dim, a, 100 * a + 50 + j, 0.05 * (9 + j))
        for a in range(3)
        for j in range(3)
    ]
    wave3 = [
        _axis_blob(dim, a, 100 * a + 50 + j, 0.05 * (9 + j))
        for a in range(9)
        for j in range(2)
    ]

    def auto_wave(name, idx, rows):
        """One CLI-shaped auto-recell wave: land the file, adopt the
        stored nlist, refresh, act on the trigger."""
        landing = tmp_path / f"vecs_{name}"
        landing.mkdir(exist_ok=True)
        target = str(tmp_path / f"corpus_{name}")
        bm = JobBookmark(str(tmp_path / f"bm_{name}.json"), f"sem_{name}")
        _write_vecs(landing / f"w{idx}.parquet", rows)
        s = incremental_semantic_refresh(
            spark, bm, str(landing / "*.parquet"), target,
            threshold=thr, nlist=stored_semantic_nlist(target) or 3, seed=7,
        )
        rec = maybe_recell_on_trigger(spark, target, s["allow_share"])
        return s, rec

    # --- decayed corpus: exactly one recell, at the decayed wave ---
    s1, r1 = auto_wave("decay", 0, wave1)
    assert s1["accepted"] == 27 and r1 is None  # clustered first fit: no trigger
    s2, r2 = auto_wave("decay", 1, wave2_decayed)
    assert s2["allow_share"] >= RECELL_ALLOW_SHARE_TRIGGER
    assert r2 is not None and r2["old_nlist"] == 3 and r2["new_nlist"] == 9
    # the recell recovered pruning: its own post-flip share is the next
    # wave's regime, far below the trigger
    assert r2["allow_share"] < RECELL_ALLOW_SHARE_TRIGGER
    s3, r3 = auto_wave("decay", 2, wave3)
    assert s3["allow_share"] < RECELL_ALLOW_SHARE_TRIGGER and r3 is None
    assert s3["accepted"] == len(wave3)  # post-recell refreshes still work
    decay_ids = {r["vec_id"] for r in read_deduped(spark, str(tmp_path / "corpus_decay")).collect()}
    assert len(decay_ids) == 27 + 54 + 18

    # --- clustered corpus: the trigger never fires ---
    c1, rc1 = auto_wave("clus", 0, wave1)
    c2, rc2 = auto_wave("clus", 1, wave2_clustered)
    assert rc1 is None and rc2 is None
    assert c2["allow_share"] < RECELL_ALLOW_SHARE_TRIGGER
    assert stored_semantic_nlist(str(tmp_path / "corpus_clus")) == 3

    # --- crash between the wave flip and the recell flip ---
    # Simulate: wave 2 lands and flips, but the process dies before
    # maybe_recell_on_trigger runs (refresh WITHOUT the recell step).
    landing = tmp_path / "vecs_crash"
    landing.mkdir()
    target = str(tmp_path / "corpus_crash")
    bm = JobBookmark(str(tmp_path / "bm_crash.json"), "sem_crash")
    _write_vecs(landing / "w0.parquet", wave1)
    incremental_semantic_refresh(
        spark, bm, str(landing / "*.parquet"), target, threshold=thr, nlist=3, seed=7
    )
    _write_vecs(landing / "w1.parquet", wave2_decayed)
    s_crash = incremental_semantic_refresh(
        spark, bm, str(landing / "*.parquet"), target, threshold=thr, nlist=3, seed=7
    )
    assert s_crash["allow_share"] >= RECELL_ALLOW_SHARE_TRIGGER  # would have fired
    # post-crash state: the wave committed, calibration still the old one,
    # and the standing report still reads (the acting signal is the NEXT
    # wave's per-wave share — the standing-vs-standing share measures a
    # different matrix and may legitimately sit lower)
    assert stored_semantic_nlist(target) == 3
    rep_crash = semantic_allow_report(spark, target)
    assert rep_crash["allow_share"] is not None and rep_crash["rows"] == 81
    # restart the auto path: the next wave adopts the stored nlist (3),
    # still sees the degraded share, and the recell fires now
    s_r, rec_r = auto_wave("crash", 2, wave3)
    assert rec_r is not None and rec_r["old_nlist"] == 3
    assert rec_r["allow_share"] < RECELL_ALLOW_SHARE_TRIGGER
    # the crashed-around corpus converges to the SAME accepted set as the
    # no-crash decayed corpus (drop decisions are calibration-independent)
    crash_ids = {r["vec_id"] for r in read_deduped(spark, target).collect()}
    assert crash_ids == decay_ids


def _passage_reference(waves, words=8):
    """Sequential single-node reference: walk passage instances in
    (wave, doc_id, block) order, keep a passage iff its digest was never
    seen before, rebuild each doc from kept blocks + tail."""
    import hashlib

    seen = set()
    out = {}
    for wave in waves:
        for doc_id, text in sorted(wave):
            import re

            # mirror passage_frames: CASE-PRESERVING split on whitespace
            # runs after trim; matching case-folds inside the digest only
            w = re.split(r"[ \t\n\f\r]+", (text or "").strip())
            nblk = len(w) // words
            kept_blocks = []
            for b in range(nblk):
                h = hashlib.md5(
                    " ".join(w[b * words:(b + 1) * words]).lower().encode()
                ).hexdigest()
                if h in seen:
                    continue
                seen.add(h)
                kept_blocks.append(b)
            rebuilt = []
            for b in kept_blocks:
                rebuilt += w[b * words:(b + 1) * words]
            rebuilt += w[nblk * words:]
            out[doc_id] = (" ".join(rebuilt), nblk, nblk - len(kept_blocks))
    return out


@pytest.mark.parametrize("seed", [2, 19])
@pytest.mark.slow
def test_passage_dedup_refresh_randomized_parity(spark, tmp_path, seed):
    """The incremental passage rewrite must reproduce, on random waves
    with planted boilerplate, exactly the sequential never-seen-before
    reference: same rewritten text, same per-doc passage counts, every
    doc present once."""
    import random

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_passage_dedup_refresh,
        read_deduped,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    boiler = [
        " ".join(rng.choice(vocab) for _ in range(8)) for _ in range(4)
    ]  # 4 reusable boilerplate passages

    def make_doc():
        parts = []
        for _ in range(rng.randrange(0, 4)):
            if rng.random() < 0.5:
                parts.append(rng.choice(boiler))
            else:
                parts.append(" ".join(rng.choice(vocab) for _ in range(8)))
        tail = " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 7)))
        return (" ".join(parts + ([tail] if tail else []))) or "x"

    vid = 0
    waves = []
    for _ in range(3):
        wave = []
        for _ in range(20):
            vid += 1
            wave.append((vid, make_doc()))
        waves.append(wave)

    landing = tmp_path / "docs"
    landing.mkdir()
    target = str(tmp_path / "corpus")
    pattern = str(landing / "*.parquet")
    bm = JobBookmark(str(tmp_path / "bm.json"), "passages")
    for i, wave in enumerate(waves):
        spark.createDataFrame(
            wave, "doc_id long, text string"
        ).coalesce(1).write.parquet(str(landing / f"w{i}.parquet"))
        incremental_passage_dedup_refresh(spark, bm, pattern, target)

    expected = _passage_reference(waves)
    got = {
        r["doc_id"]: (r["text"], r["n_passages"], r["n_passages_dropped"])
        for r in read_deduped(spark, target).collect()
    }
    assert set(got) == set(expected)
    assert got == expected
    assert any(v[2] > 0 for v in got.values())  # boilerplate really excised


def test_passage_dedup_refresh_healing_and_calibration(spark, tmp_path):
    """Crash between flip and bookmark commit heals without re-applying;
    a mismatched cut width refuses before touching state."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_passage_dedup_refresh,
        read_deduped,
    )

    landing = tmp_path / "docs"
    landing.mkdir()
    target = str(tmp_path / "corpus")
    pattern = str(landing / "*.parquet")
    bm = JobBookmark(str(tmp_path / "bm.json"), "passages")
    p = "a b c d e f g h"
    spark.createDataFrame(
        [(1, f"{p} i j k l m n o q")], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(landing / "w0.parquet"))
    s = incremental_passage_dedup_refresh(spark, bm, pattern, target)
    assert (s["passages"], s["kept_passages"]) == (2, 2)

    with pytest.raises(ValueError, match="calibration mismatch"):
        incremental_passage_dedup_refresh(spark, bm, pattern, target, words=4)

    # second wave: the boilerplate passage is excised from the new doc
    spark.createDataFrame(
        [(2, f"{p} z z z z z z z z trailing")], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(landing / "w1.parquet"))
    s = incremental_passage_dedup_refresh(spark, bm, pattern, target)
    assert s["dropped_vs_corpus"] == 1 and s["kept_passages"] == 1
    got = {r["doc_id"]: r["text"] for r in read_deduped(spark, target).collect()}
    assert got[2] == "z z z z z z z z trailing"

    # crash replay: fresh bookmark that never saw the commits
    crashed = JobBookmark(str(tmp_path / "bm2.json"), "passages")
    crashed.commit_files([str(landing / "w0.parquet")])
    before = got
    s = incremental_passage_dedup_refresh(spark, crashed, pattern, target)
    assert s["healed"] == 1 and s["new_docs"] == 0
    got2 = {r["doc_id"]: r["text"] for r in read_deduped(spark, target).collect()}
    assert got2 == before
