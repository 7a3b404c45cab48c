"""Unit tests for the standalone operators: salted aggregation equivalence,
range join vs naive BETWEEN join, MERGE/upsert/SCD2 semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.operators.dedup import (
    exact_dedup_count,
    keep_latest,
    keep_latest_salted,
    salt_partitions,
)
from big_data_processing_with_aws_glue_workshop_spark.operators.merge import (
    scd2_apply,
    upsert,
)
from big_data_processing_with_aws_glue_workshop_spark.operators.rangejoin import (
    bucketized_range_join,
)


def test_salted_two_phase_agg_equals_direct(spark, sf_dir):
    """Salted (skew-safe) two-phase aggregation must produce exactly the
    direct aggregation's result."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    direct = {
        (r["l_returnflag"], r["l_linestatus"]): r["n"]
        for r in l.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # salt derives from a column that varies WITHIN each group (the row's
    # order key) — salting on the group keys themselves would map a hot
    # key's rows to one bucket and split nothing
    salted = salt_partitions(l, ["l_orderkey", "l_linenumber"], buckets=16)
    two_phase = (
        salted.groupBy("l_returnflag", "l_linestatus", "__salt")
        .agg(F.count(F.lit(1)).alias("pn"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("pn").alias("n"))
    )
    got = {
        (r["l_returnflag"], r["l_linestatus"]): r["n"] for r in two_phase.collect()
    }
    assert got == direct


def test_keep_latest_salted_equals_unsalted_and_splits_hot_key(spark):
    """Skew demo (SURVEY stretch / r3 verdict #8): keep-latest over a
    90%-one-key corpus must (a) produce exactly the unsalted operator's
    rows and (b) physically split the hot partition — phase 1's exchange
    hash-partitions on (key, __salt), so the hot key occupies `buckets`
    reducers instead of one."""
    import contextlib
    import io

    # 90% of rows share key 'HOT'; unique uid makes the ordering total so
    # both paths are deterministic and comparable row-for-row
    rows = spark.range(0, 100_000).select(
        F.when(F.col("id") % 10 != 0, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 1000).cast("string")))
        .alias("k"),
        (F.col("id") * 37 % 86_400).alias("ts"),
        F.col("id").alias("uid"),
    )

    unsalted = keep_latest(rows, ["k"], "ts", tiebreak_cols=("uid",))
    salted = keep_latest_salted(
        rows, ["k"], "ts", tiebreak_cols=("uid",), buckets=16
    )
    expect = sorted(map(tuple, unsalted.collect()))
    got = sorted(map(tuple, salted.collect()))
    assert got == expect

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        salted.explain("formatted")
    plan = buf.getvalue()
    # phase 1 shuffles on (k, __salt): the hot key's rows spread across
    # buckets; phase 2's exchange on k alone sees <=16 rows per key
    assert "__salt" in plan, plan
    import re

    assert re.search(r"hashpartitioning\(k[^)]*__salt", plan), plan


def test_bucketized_range_join_equals_naive(spark, sf_dir):
    """Bucketized interval join must equal the naive BETWEEN join."""
    # nanos→micros handled by the queries loader; reuse it
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load

    ev = load(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    # deterministic synthetic intervals: 12h windows every 50h across January
    base = dt.datetime(2024, 1, 1)
    intervals = spark.createDataFrame(
        [
            (i, base + dt.timedelta(hours=50 * i), base + dt.timedelta(hours=50 * i + 12))
            for i in range(15)
        ],
        "interval_id long, start timestamp, end timestamp",
    )
    fast = bucketized_range_join(ev, intervals, "ts", "start", "end")
    naive = ev.join(
        intervals, (F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end"))
    )
    fast_set = {(r["event_id"], r["interval_id"]) for r in fast.collect()}
    naive_set = {(r["event_id"], r["interval_id"]) for r in naive.collect()}
    assert fast_set == naive_set
    assert fast_set, "intervals must capture some events"


def test_bucketized_interval_join_equals_streaming_twin(spark, sf_dir):
    """The time-bucketized interval join (the deep-history scale path) must
    produce the exact pair set of the direct plan the streaming operator
    builds — same keys, same 10-minute bound, real events data."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.rangejoin import (
        bucketized_interval_join,
    )
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load
    from big_data_processing_with_aws_glue_workshop_spark.streaming.windows import (
        streaming_interval_join,
    )

    ev = load(spark, sf_dir, "events")
    direct = streaming_interval_join(ev)  # watermark no-op in batch
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("l_id")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("r_id")
    )
    fast = bucketized_interval_join(
        clicks, errors, ["user_id"], "l_ts", "r_ts", within_seconds=600
    )
    # a bucket width NOT dividing the bound exercises the ceil fanout path
    fast_odd = bucketized_interval_join(
        clicks, errors, ["user_id"], "l_ts", "r_ts",
        within_seconds=600, bucket_seconds=450,
    )
    direct_set = {(r["l_id"], r["r_id"]) for r in direct.collect()}
    fast_set = {(r["l_id"], r["r_id"]) for r in fast.collect()}
    odd_set = {(r["l_id"], r["r_id"]) for r in fast_odd.collect()}
    assert fast_set == direct_set
    assert odd_set == direct_set
    assert fast_set, "bound must capture some pairs"


@pytest.mark.slow
def test_bucketized_interval_join_randomized_equivalence(spark):
    """Seeded randomized sweep over adversarial timestamp layouts (bucket
    boundaries, exact-bound hits, duplicate timestamps): the bucketized
    join must equal the naive BETWEEN join for bucket widths equal to,
    smaller than, and larger than the bound."""
    import random

    from big_data_processing_with_aws_glue_workshop_spark.operators.rangejoin import (
        bucketized_interval_join,
    )

    rng = random.Random(7)
    within = 600
    for trial in range(5):
        rows = [
            (
                i,
                rng.randrange(3),
                # offsets cluster near multiples of the bound to hit edges
                rng.choice([0, within, 2 * within]) + rng.randrange(-2, 3),
            )
            for i in range(120)
        ]
        ev = spark.createDataFrame(rows, "event_id long, user_id long, off long").select(
            "event_id",
            "user_id",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("off")).alias("ts"),
            (F.col("event_id") % 2 == 0).alias("is_left"),
        )
        left = ev.filter("is_left").select(
            "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("l_id")
        )
        right = ev.filter("NOT is_left").select(
            "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("r_id")
        )
        naive = left.join(
            right,
            (left["user_id"] == right["user_id"])
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within} SECONDS")),
        )
        want = {(r["l_id"], r["r_id"]) for r in naive.collect()}
        for bucket in (within, 137, 7 * within):
            got = {
                (r["l_id"], r["r_id"])
                for r in bucketized_interval_join(
                    left, right, ["user_id"], "l_ts", "r_ts",
                    within_seconds=within, bucket_seconds=bucket,
                ).collect()
            }
            assert got == want, f"trial {trial} bucket {bucket}"


def test_upsert(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, name string, v long"
    )
    source = spark.createDataFrame(
        [(2, "B", 21), (4, "d", 40)], "id long, name string, v long"
    )
    got = {r["id"]: (r["name"], r["v"]) for r in upsert(target, source, ["id"]).collect()}
    assert got == {1: ("a", 10), 2: ("B", 21), 3: ("c", 30), 4: ("d", 40)}


def test_scd2_apply(spark):
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 6, 1)
    target = spark.createDataFrame(
        [
            (1, "alice@old", t0, t1, False),   # closed history
            (1, "alice@mid", t1, None, True),  # current, will be closed
            (2, "bob@v1", t0, None, True),     # untouched current
        ],
        "id long, email string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    t2 = dt.datetime(2024, 9, 1)
    source = spark.createDataFrame(
        [(1, "alice@new", t2), (3, "carol@v1", t2)],
        "id long, email string, changed_at timestamp",
    )
    out = scd2_apply(target, source, ["id"], "changed_at").collect()
    rows = {(r["id"], r["email"]): r for r in out}
    assert len(out) == 5
    # old history preserved untouched
    assert rows[(1, "alice@old")]["valid_to"] == t1
    # previous current closed at the source effective time
    closed = rows[(1, "alice@mid")]
    assert closed["valid_to"] == t2 and not closed["is_current"]
    # new versions open-ended and current
    for key in [(1, "alice@new"), (3, "carol@v1")]:
        assert rows[key]["is_current"] and rows[key]["valid_to"] is None
    # unrelated key untouched
    assert rows[(2, "bob@v1")]["is_current"]


def test_range_join_left_keeps_unmatched(spark):
    """how='left' must keep points with no containing interval (review
    finding: the post-join filter used to drop the null-padded rows)."""
    pts = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 1)), (2, dt.datetime(2024, 3, 1))],
        "pid long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(10, dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2))],
        "interval_id long, start timestamp, end timestamp",
    )
    got = {
        r["pid"]: r["interval_id"]
        for r in bucketized_range_join(pts, iv, "ts", "start", "end", how="left").collect()
    }
    assert got == {1: 10, 2: None}
    with pytest.raises(ValueError, match="inner.*left"):
        bucketized_range_join(pts, iv, "ts", "start", "end", how="full")


def test_scd2_chains_multiple_source_versions(spark):
    """Two source versions of one key must chain: v1 closes at v2's
    effective time; only v2 stays current (review finding)."""
    t0, t1, t2 = (dt.datetime(2024, m, 1) for m in (1, 6, 9))
    target = spark.createDataFrame(
        [(1, "v0", t0, None, True)],
        "id long, email string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    source = spark.createDataFrame(
        [(1, "v1", t1), (1, "v2", t2)], "id long, email string, changed_at timestamp"
    )
    rows = {r["email"]: r for r in scd2_apply(target, source, ["id"], "changed_at").collect()}
    assert rows["v0"]["valid_to"] == t1 and not rows["v0"]["is_current"]
    assert rows["v1"]["valid_to"] == t2 and not rows["v1"]["is_current"]
    assert rows["v2"]["valid_to"] is None and rows["v2"]["is_current"]


def test_shingles_short_documents(spark):
    """Documents with fewer than n tokens yield zero shingles, not a crash
    (review finding: descending sequence hit element_at index 0)."""
    from big_data_processing_with_aws_glue_workshop_spark.functions.text import word_shingles

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "one"), (3, ""), (4, "a b c d")],
        "doc_id long, text string",
    )
    got = word_shingles(docs, "doc_id", "text", n=3).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r["shingle"])
    assert set(by_doc) == {4}
    assert sorted(by_doc[4]) == ["a b c", "b c d"]


def test_lsh_banding_bounds_checked(spark):
    from big_data_processing_with_aws_glue_workshop_spark.extensions.dedup_fuzzy import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g x")], "doc_id long, text string"
    )
    sigs = minhash_signatures(docs, n_hashes=16)
    with pytest.raises(ValueError, match="exceeds the signature length"):
        lsh_candidate_pairs(sigs, bands=8, rows_per_band=4, n_hashes=16)


def test_range_join_left_null_attribute_no_duplicates(spark):
    """A matched point carrying a NULL attribute must appear exactly once
    (review finding: null-unsafe anti-join re-emitted it as unmatched)."""
    pts = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 1), None), (2, dt.datetime(2024, 3, 1), "x")],
        "pid long, ts timestamp, attr string",
    )
    iv = spark.createDataFrame(
        [(10, dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2))],
        "interval_id long, start timestamp, end timestamp",
    )
    rows = bucketized_range_join(pts, iv, "ts", "start", "end", how="left").collect()
    assert len(rows) == 2
    got = {r["pid"]: r["interval_id"] for r in rows}
    assert got == {1: 10, 2: None}


def test_upsert_null_key_replaced(spark):
    """NULL-keyed target rows are replaced by NULL-keyed source rows
    (review finding: null-unsafe anti-join kept both)."""
    target = spark.createDataFrame([(None, "old")], "id string, v string")
    source = spark.createDataFrame([(None, "new")], "id string, v string")
    got = upsert(target, source, ["id"]).collect()
    assert [(r["id"], r["v"]) for r in got] == [(None, "new")]


def test_scd2_null_current_flag_preserved(spark):
    """Target rows with NULL is_current are history, not silently dropped
    (review finding: F.col/~F.col both excluded NULL)."""
    t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1)
    target = spark.createDataFrame(
        [(1, "legacy", t0, None, None)],
        "id long, email string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    source = spark.createDataFrame(
        [(1, "new", t1)], "id long, email string, changed_at timestamp"
    )
    rows = {r["email"]: r for r in scd2_apply(target, source, ["id"], "changed_at").collect()}
    assert set(rows) == {"legacy", "new"}
    assert rows["new"]["is_current"]


def test_resample_fills_gaps_both_modes(spark):
    """Hand-computable fixture: user 1 has events in minutes 0, 1 and 4
    (gap at 2-3); counts zero-fill, the gauge forward-fills; spans are
    per-key (user 2's single bucket emits one row, no global spine)."""
    import datetime as dt

    from big_data_processing_with_aws_glue_workshop_spark.operators.resample import (
        resample,
    )

    base = dt.datetime(2024, 5, 1, 10, 0, 0)
    rows = [
        (1, base + dt.timedelta(minutes=0, seconds=10), 10.0),
        (1, base + dt.timedelta(minutes=1, seconds=5), 20.0),
        (1, base + dt.timedelta(minutes=1, seconds=40), 30.0),
        (1, base + dt.timedelta(minutes=4, seconds=59), 40.0),
        (2, base + dt.timedelta(minutes=2), 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = resample(
        df,
        ["user_id"],
        "ts",
        60,
        aggs={"n": F.count(F.lit(1)), "last_value": F.max("value")},
        fill={"n": "zero", "last_value": "ffill"},
    )
    got = {
        (r["user_id"], r["bucket_ts"].minute): (r["n"], r["last_value"])
        for r in out.collect()
    }
    assert got == {
        (1, 0): (1, 10.0),
        (1, 1): (2, 30.0),
        (1, 2): (0, 30.0),  # gap: count zero-filled, gauge carried forward
        (1, 3): (0, 30.0),
        (1, 4): (1, 40.0),
        (2, 2): (1, 7.0),
    }


def test_resample_events_table_dense_spans(spark, sf_dir):
    """On the real events table: per event_type hourly resampling emits
    exactly (max_hour - min_hour + 1) rows per type — no missing buckets —
    and zero-filled counts sum to the raw row count."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.resample import (
        resample,
    )
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load

    ev = load(spark, sf_dir, "events")
    out = resample(
        ev, ["event_type"], "ts", 3600,
        aggs={"n": F.count(F.lit(1))}, fill={"n": "zero"},
    ).cache()
    try:
        spans = (
            ev.groupBy("event_type")
            .agg(
                (
                    F.floor(F.unix_timestamp(F.max("ts")) / 3600)
                    - F.floor(F.unix_timestamp(F.min("ts")) / 3600)
                    + 1
                ).alias("want_rows")
            )
            .collect()
        )
        got_rows = {r["event_type"]: r["n"] for r in out.groupBy("event_type").count().withColumnRenamed("count", "n").collect()}
        for r in spans:
            assert got_rows[r["event_type"]] == r["want_rows"]
        assert out.agg(F.sum("n")).collect()[0][0] == ev.count()
    finally:
        out.unpersist()


def test_time_rollup_three_level_chain(spark, sf_dir):
    """Deep chaining: the day level built from hour partials (which were
    built from minute partials) must equal direct day aggregation of raw
    rows — plus pre-epoch bucketing floors (not truncates) and the
    non-multiple level validation raises."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.rollup_time import (
        time_rollup_chain,
    )
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load

    ev = load(spark, sf_dir, "events")
    levels = time_rollup_chain(
        ev, ts_col="ts", key_cols=["event_type"], levels_seconds=(60, 3600, 86400)
    )
    chained_day = {
        (r["bucket_ts"], r["event_type"]): (r["n"], float(r["total"]), r["max_value"])
        for r in levels[86400].collect()
    }
    direct_day = {
        (r["b"], r["event_type"]): (r["n"], float(r["t"]), r["m"])
        for r in ev.groupBy(
            F.timestamp_seconds(
                F.floor(F.unix_timestamp("ts") / 86400).cast("long") * 86400
            ).alias("b"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("t"),
            F.max("value").alias("m"),
        )
        .collect()
    }
    assert chained_day == direct_day

    # pre-epoch timestamps floor into the PREVIOUS bucket
    pre = spark.createDataFrame(
        [(1, dt.datetime(1969, 12, 31, 23, 59, 30), 1.0)],
        "event_id long, ts timestamp, value double",
    )
    minute = time_rollup_chain(pre, ts_col="ts", levels_seconds=(60,))[60].collect()
    assert minute[0]["bucket_ts"] == dt.datetime(1969, 12, 31, 23, 59, 0)

    with pytest.raises(ValueError, match="not a multiple"):
        time_rollup_chain(ev, ts_col="ts", levels_seconds=(60, 90))


def test_ntz_to_utc_instant_is_session_tz_independent(spark):
    """The NTZ wall->instant conversion must not depend on
    spark.sql.session.timeZone: ensure_session_confs pins UTC but swallows
    conf-set failures, so a locked non-UTC session would silently shift
    every event timestamp if the conversion went through a plain cast."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import ntz_to_utc_instant

    walls = [
        dt.datetime(2024, 5, 1, 10, 0, 0, 123456),
        dt.datetime(1969, 12, 31, 23, 59, 59, 999999),  # pre-epoch, -1 us
        dt.datetime(2000, 2, 29, 0, 0, 0),
    ]
    df = spark.createDataFrame(
        [(w,) for w in walls], T.StructType([T.StructField("ts", T.TimestampNTZType())])
    )
    want = [
        int(w.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) for w in walls
    ]
    original_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = [
                r["m"]
                for r in df.select(
                    F.unix_micros(ntz_to_utc_instant(F.col("ts"))).alias("m")
                ).collect()
            ]
            assert got == want, f"shifted under session TZ {tz}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", original_tz)


def test_keep_tracked_caches_suspends_registry_release(spark):
    """The registry wrapper's hygiene release must be suspendable across a
    warm+timed rerun pair (bench.py) but active by default."""
    from big_data_processing_with_aws_glue_workshop_spark import util

    df = spark.range(10)
    util.tracked_cache(df)
    assert len(util._LIVE_CACHES) == 1
    with util.keep_tracked_caches():
        util.maybe_release_tracked_caches()
        assert len(util._LIVE_CACHES) == 1  # suppressed inside the scope
        with util.keep_tracked_caches():
            util.maybe_release_tracked_caches()
            assert len(util._LIVE_CACHES) == 1  # nesting-safe
    util.maybe_release_tracked_caches()
    assert len(util._LIVE_CACHES) == 0  # active again after the scope


def test_snapshot_diff_classifies_all_change_shapes(spark):
    """snapshot_diff must classify added/removed/changed/unchanged with
    null-safe comparison: NULL vs NULL is unchanged, NULL vs value is a
    change, and changed_cols lists differing columns in caller order."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 20.0), (3, "c", None), (4, "d", 40.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 21.0), (3, "c2", None), (5, "e", 50.0)],
        "k int, s string, v double",
    )
    rows = {
        r["k"]: (r["change_type"], r["changed_cols"])
        for r in snapshot_diff(old, new, keys=["k"]).collect()
    }
    assert rows[1] == ("unchanged", None)  # incl. NULL==NULL on s? no: s='a'
    assert rows[2] == ("changed", "v")  # NULL s on both sides is NOT a change
    assert rows[3] == ("changed", "s")  # NULL v on both sides is NOT a change
    assert rows[4] == ("removed", None)
    assert rows[5] == ("added", None)
    # multi-column change keeps compare_cols order
    both = snapshot_diff(
        spark.createDataFrame([(1, "x", 1.0)], "k int, s string, v double"),
        spark.createDataFrame([(1, "y", None)], "k int, s string, v double"),
        keys=["k"],
    ).collect()[0]
    assert both["change_type"] == "changed"
    assert both["changed_cols"] == "s,v"  # value->NULL counts as a change
    # evidence columns are carried through
    assert both["old_v"] == 1.0 and both["new_v"] is None


# ---------------------------------------------------------------------------
# operators/graph.py — integer-exact PageRank
# ---------------------------------------------------------------------------


def _adj(spark, pairs):
    """Adjacency DataFrame from a {src: [dsts]} dict."""
    return spark.createDataFrame(
        [(s, ds) for s, ds in pairs.items()], "src long, dsts array<long>"
    )


def test_pagerank_hand_checked_triangle_plus_pendant(spark):
    """4-node graph checked by hand in the integer algebra: a triangle
    (1,2,3, all mutual) with node 4 attached to 1 only. After one round,
    1 (two in-edges + the pendant) must outrank 2/3 (two in-edges), which
    outrank 4 (one in-edge from a degree-3 node)."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.graph import (
        pagerank_integer,
    )

    adj = _adj(
        spark,
        {1: [2, 3, 4], 2: [1, 3], 3: [1, 2], 4: [1]},
    )
    base = 10**12 // 4
    got = {
        r["node"]: r["pr"]
        for r in pagerank_integer(adj, n_iter=1).collect()
    }
    # hand-computed: contrib(1->each)=base div 3, contrib(2/3->each)=base div 2,
    # contrib(4->1)=base
    c1, c2 = base // 3, base // 2
    expect = {
        1: (15 * base + 85 * (c2 + c2 + base)) // 100,
        2: (15 * base + 85 * (c1 + c2)) // 100,
        3: (15 * base + 85 * (c1 + c2)) // 100,
        4: (15 * base + 85 * c1) // 100,
    }
    assert got == expect
    assert got[1] > got[2] == got[3] > got[4]


def test_pagerank_mass_conserved_and_deterministic(spark):
    """Total micro-mass is conserved up to integer-truncation loss, and a
    repartitioned input yields bit-identical ranks (the order-independence
    the integer algebra buys)."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.graph import (
        pagerank_integer,
    )

    # ring of 12 nodes, each linked both ways (symmetric, outdeg 2)
    ring = {i: [(i - 1) % 12, (i + 1) % 12] for i in range(12)}
    adj = _adj(spark, ring)
    r1 = {r["node"]: r["pr"] for r in pagerank_integer(adj, n_iter=4).collect()}
    total = sum(r1.values())
    scale = 10**12
    # per round loss <= n_edges + n_nodes + 100; 4 rounds of a 24-edge graph
    assert scale - 4 * (24 + 12 + 100) <= total <= scale
    r2 = {
        r["node"]: r["pr"]
        for r in pagerank_integer(adj.repartition(7), n_iter=4).collect()
    }
    assert r1 == r2


def test_pagerank_deep_iteration_checkpoint_path(spark):
    """n_iter past checkpoint_every exercises the lineage-truncation
    branch; ranks must still be finite, conserved, and uniform on a
    symmetric ring (symmetry is preserved by every round)."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.graph import (
        pagerank_integer,
    )

    ring = {i: [(i - 1) % 8, (i + 1) % 8] for i in range(8)}
    got = pagerank_integer(
        _adj(spark, ring), n_iter=5, checkpoint_every=2
    ).collect()
    prs = {r["pr"] for r in got}
    assert len(got) == 8
    assert len(prs) == 1  # uniform: ring symmetry
    assert abs(next(iter(prs)) - 10**12 // 8) < 1000


def test_copurchase_adjacency_matches_naive_pairs(spark):
    """The one-shuffle adjacency build equals the naive distinct-pair
    self-join edge set."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.graph import (
        copurchase_adjacency,
    )

    rows = [
        (1, 10), (1, 11), (1, 12),
        (2, 10), (2, 11),
        (3, 13),          # single-part order: no edges
        (4, 10), (4, 10),  # duplicate part in one order: no self-edge
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    adj = {
        r["src"]: sorted(r["dsts"])
        for r in copurchase_adjacency(li).collect()
    }
    assert adj == {10: [11, 12], 11: [10, 12], 12: [10, 11]}


def test_triangle_census_hand_checked(spark):
    """K4 (complete on 4): C(4,3)=4 triangles, 4*C(3,2)=12 wedges,
    clustering 1.0. A 4-path (0-1-2-3): zero triangles, wedges 2."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.graph import (
        triangle_census,
    )

    k4 = _adj(spark, {i: [j for j in range(4) if j != i] for i in range(4)})
    row = triangle_census(k4).collect()[0]
    assert (
        row["n_nodes"], row["n_edges"], row["n_wedges"], row["n_triangles"]
    ) == (4, 6, 12, 4)
    assert row["global_clustering"] == 1.0

    path = _adj(spark, {0: [1], 1: [0, 2], 2: [1, 3], 3: [2]})
    row = triangle_census(path).collect()[0]
    assert (row["n_edges"], row["n_wedges"], row["n_triangles"]) == (3, 2, 0)


def test_triangle_census_star_plus_rim_orientation(spark):
    """Hub-and-rim graph: hub 0 linked to all 6 rim nodes, rim a 6-cycle —
    12 edges, 6 triangles (hub + each rim edge). The hub has the highest
    degree, so after orientation it receives edges and contributes NO
    candidate pairs — the case where naive wedge counting at the hub
    would generate C(6,2) candidates and the orientation generates none."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.graph import (
        triangle_census,
    )

    adj = {0: list(range(1, 7))}
    for i in range(1, 7):
        left = 6 if i == 1 else i - 1
        right = 1 if i == 6 else i + 1
        adj[i] = [0, left, right]
    row = triangle_census(_adj(spark, adj)).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (7, 12, 6)


def test_triangle_census_degenerate_graphs(spark):
    """In-contract degenerate shapes: a perfect matching (every degree 1)
    has zero wedges -> clustering must be a defined 0.0, not NULL; an
    empty adjacency yields zero counts, not NULL sums."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.graph import (
        triangle_census,
    )

    matching = _adj(spark, {0: [1], 1: [0], 2: [3], 3: [2]})
    row = triangle_census(matching).collect()[0]
    assert (row["n_edges"], row["n_wedges"], row["n_triangles"]) == (2, 0, 0)
    assert row["global_clustering"] == 0.0

    empty = spark.createDataFrame([], "src long, dsts array<long>")
    row = triangle_census(empty).collect()[0]
    assert (
        row["n_nodes"], row["n_edges"], row["n_wedges"],
        row["n_triangles"], row["global_clustering"],
    ) == (0, 0, 0, 0, 0.0)


def test_pagerank_rejects_empty_adjacency(spark):
    from big_data_processing_with_aws_glue_workshop_spark.operators.graph import (
        pagerank_integer,
    )

    empty = spark.createDataFrame([], "src long, dsts array<long>")
    with pytest.raises(ValueError, match="adjacency is empty"):
        pagerank_integer(empty, n_iter=1)


def test_pagerank_checkpoint_every_zero_means_never(spark):
    from big_data_processing_with_aws_glue_workshop_spark.operators.graph import (
        pagerank_integer,
    )

    ring = {i: [(i - 1) % 4, (i + 1) % 4] for i in range(4)}
    got = pagerank_integer(
        _adj(spark, ring), n_iter=3, checkpoint_every=0
    ).collect()
    assert len(got) == 4


def test_cap_vertex_degree_deterministic_and_bounded(spark):
    """Capping keeps the lexicographically-smallest `cap` neighbors
    (partitioning-independent), never grows a list, and rejects cap<1."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.graph import (
        cap_vertex_degree,
    )

    adj = _adj(spark, {1: [9, 3, 7, 5], 2: [4], 3: [1, 2, 8]})
    capped = {
        r["src"]: r["dsts"]
        for r in cap_vertex_degree(adj, 2).collect()
    }
    assert capped == {1: [3, 5], 2: [4], 3: [1, 2]}
    # repartitioned input yields the identical capped lists
    capped2 = {
        r["src"]: r["dsts"]
        for r in cap_vertex_degree(adj.repartition(5), 2).collect()
    }
    assert capped2 == capped
    with pytest.raises(ValueError, match="cap must be"):
        cap_vertex_degree(adj, 0)


def test_cap_vertex_degree_resymmetrize_restores_input_contract(spark):
    """resymmetrize=True keeps an edge only if it survived the slice in
    BOTH directions, so the output is a valid symmetric adjacency for
    pagerank/census (the raw slice drops a capped hub from neighbors'
    lists one-sidedly — its base mass would leak from the rank vector)."""
    from big_data_processing_with_aws_glue_workshop_spark.operators.graph import (
        cap_vertex_degree,
        pagerank_integer,
    )

    # hub 9 touches everyone; cap=2 keeps only [1, 2] on the hub's side
    sym = {9: [1, 2, 3, 4, 5], 1: [2, 9], 2: [1, 9], 3: [9], 4: [9], 5: [9]}
    got = {
        r["src"]: sorted(r["dsts"])
        for r in cap_vertex_degree(_adj(spark, sym), 2, resymmetrize=True).collect()
    }
    # 3/4/5 lost their only (one-sided) edge and drop out entirely
    assert got == {9: [1, 2], 1: [2, 9], 2: [1, 9]}
    for src, dsts in got.items():
        assert len(dsts) <= 2
        for dst in dsts:
            assert src in got[dst]  # symmetric
    # the capped graph satisfies pagerank's contract: nobody vanishes,
    # mass conserved up to integer-division truncation
    scale = 1_000_000_000_000
    ranks = pagerank_integer(
        _adj(spark, got), n_iter=3, scale=scale
    ).collect()
    assert len(ranks) == 3
    total = sum(r["pr"] for r in ranks)
    assert scale - total < 1000  # truncation-bounded, no leaked base mass


def test_range_join_left_null_rearranged_rows_both_kept(spark):
    """Two DISTINCT points whose column values are value/NULL
    rearrangements of each other (review finding: xxhash64 skips NULL
    inputs, so an id hashed over the columns collided here and the
    anti-join dropped the unmatched one). The ON-condition join keeps
    both with their own match status."""
    pts = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 1), None),
            (None, dt.datetime(2024, 1, 1, 1)),
        ],
        "ts timestamp, ts2 timestamp",
    )
    iv = spark.createDataFrame(
        [(10, dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2))],
        "interval_id long, start timestamp, end timestamp",
    )
    rows = bucketized_range_join(pts, iv, "ts", "start", "end", how="left").collect()
    assert len(rows) == 2
    got = {(r["ts"] is None): r["interval_id"] for r in rows}
    # the valid-ts point matched; the NULL-ts point survives null-padded
    assert got == {False: 10, True: None}
