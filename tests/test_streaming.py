"""Structured Streaming lifecycle: the batch-verified window plans run
under a watermarked stream and produce the same aggregate totals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.streaming import (
    read_events_stream,
    run_streaming_query,
    streaming_session_agg,
    streaming_sliding_agg,
    streaming_tumbling_agg,
)
from big_data_processing_with_aws_glue_workshop_spark.queries import (
    QUERIES,
    RETIRED_QUERIES,
)


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    result = run_streaming_query(
        streaming_tumbling_agg(stream), "t_tumbling", output_mode="complete"
    )
    # tumbling_windows is retired from the driver registry (late-r6 swap)
    # but keeps its implementation — the batch-stream parity contract is
    # pinned against the retained retired-query mapping
    batch = RETIRED_QUERIES["tumbling_windows"](spark, sf_dir)
    # complete mode emits every window (append would withhold windows
    # newer than the final watermark — bounded-lateness semantics)
    s = result.agg(
        F.sum("n_events").alias("n"), F.count(F.lit(1)).alias("w")
    ).collect()[0]
    b = batch.agg(F.sum("n_events").alias("n"), F.count(F.lit(1)).alias("w")).collect()[0]
    assert s["n"] == b["n"]
    assert s["w"] == b["w"]


def test_streaming_sliding(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    result = run_streaming_query(
        streaming_sliding_agg(stream), "t_sliding", output_mode="complete"
    )
    total_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # every event lands in exactly 2 sliding windows
    assert result.agg(F.sum("n_events")).collect()[0][0] == 2 * total_events


def test_streaming_sessions(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    result = run_streaming_query(
        streaming_session_agg(stream), "t_sessions", output_mode="complete"
    )
    batch = QUERIES["session_windows"](spark, sf_dir)
    assert result.count() == batch.count()
    assert (
        result.agg(F.sum("n_events")).collect()[0][0]
        == batch.agg(F.sum("n_events")).collect()[0][0]
    )


def test_stateful_running_user_stats(spark, sf_dir):
    """applyInPandasWithState lifetime counters equal the batch aggregation
    after the finite stream drains."""
    from big_data_processing_with_aws_glue_workshop_spark.streaming.stateful import (
        running_user_stats,
    )

    stream = read_events_stream(spark, sf_dir)
    result = run_streaming_query(
        running_user_stats(stream), "t_stateful", output_mode="update"
    )
    # update mode may emit a row per user per micro-batch: keep the last
    got = {
        r["user_id"]: r
        for r in result.collect()  # single-batch source -> one row per user
    }
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    )
    assert len(got) == len(batch)
    for r in batch:
        g = got[r["user_id"]]
        assert g["n_events"] == r["n_events"]
        assert abs(g["total_value"] - r["total_value"]) < 1e-6
        assert g["max_value"] == r["max_value"]


def test_stateful_running_user_stats_transform_with_state(spark, sf_dir):
    """The transformWithState (Spark 4.x StatefulProcessor) implementation
    must produce the same lifetime counters as the GroupState one — both
    are pinned against the identical batch aggregation. Requires the
    RocksDB state store provider; skipped on engines without the API."""
    from big_data_processing_with_aws_glue_workshop_spark.streaming.stateful import (
        HAS_TRANSFORM_WITH_STATE,
        running_user_stats_tws,
    )

    if not HAS_TRANSFORM_WITH_STATE:
        pytest.skip(
            "transformWithStateInPandas unavailable (needs Spark >= 4.0 "
            "AND the protobuf package for the state-server protocol)"
        )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, sf_dir)
        result = run_streaming_query(
            running_user_stats_tws(stream), "t_stateful_tws", output_mode="update"
        )
        got = {r["user_id"]: r for r in result.collect()}
        batch = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("total_value"),
                F.max("value").alias("max_value"),
            )
            .collect()
        )
        assert len(got) == len(batch)
        for r in batch:
            g = got[r["user_id"]]
            assert g["n_events"] == r["n_events"]
            assert abs(g["total_value"] - r["total_value"]) < 1e-6
            assert g["max_value"] == r["max_value"]
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)


def test_sessionize_with_timeout_both_close_paths(spark, tmp_path):
    """Timer-based sessionization must close sessions BOTH ways: by a
    later same-user event past the gap (emitted in that batch) and by the
    WATERMARK passing last_event + gap with no further events (the
    EventTimeTimeout path — the part session_window can't customize).
    Three ordered micro-batches; only closed sessions are ever emitted."""
    import datetime as dt
    import time as _time

    from big_data_processing_with_aws_glue_workshop_spark.streaming.stateful import (
        sessionize_with_timeout,
    )

    src = tmp_path / "sess_src"
    src.mkdir()

    def write_file(name, rows):
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        part = next(
            p for p in (tmp_path / name).iterdir() if p.name.endswith(".parquet")
        )
        part.rename(src / f"{name}.parquet")

    base = dt.datetime(2024, 5, 1, 10, 0, 0)
    m = lambda k: base + dt.timedelta(minutes=k)
    ms = lambda k: int((m(k) - dt.datetime(1970, 1, 1)).total_seconds() * 1000)

    # batch 1 — user 1: 10:00, 10:05, then 10:50 (>=30 min gap closes the
    # first session IN-BATCH); user 2: a single event at 10:00
    write_file("f1", [(1, m(0), 1.0), (1, m(5), 2.0), (1, m(50), 4.0), (2, m(0), 8.0)])
    _time.sleep(1.1)
    # batch 2 — user 1 at 13:00: closes the 10:50 session by arrival;
    # advances the watermark to 12:30 (in force next batch)
    write_file("f2", [(1, m(180), 16.0)])
    _time.sleep(1.1)
    # batch 3 — user 3 keeps the stream moving; under the now-enforced
    # 12:30 watermark user 2's timer (10:30) fires -> timeout-close
    write_file("f3", [(3, m(240), 32.0)])

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = run_streaming_query(
        sessionize_with_timeout(stream, gap_minutes=30),
        "t_sessions_timeout",
        output_mode="update",
    )
    got = {
        (r["user_id"], r["session_start_ms"]): r for r in out.collect()
    }
    # exactly three CLOSED sessions; the open ones (u1@13:00, u3@14:00) absent
    assert set(got) == {(1, ms(0)), (1, ms(50)), (2, ms(0))}
    s1 = got[(1, ms(0))]
    assert (s1["session_end_ms"], s1["n_events"], s1["total_value"]) == (ms(5), 2, 3.0)
    s2 = got[(1, ms(50))]
    assert (s2["session_end_ms"], s2["n_events"], s2["total_value"]) == (ms(50), 1, 4.0)
    s3 = got[(2, ms(0))]  # closed by TIMEOUT, not by a later event
    assert (s3["session_end_ms"], s3["n_events"], s3["total_value"]) == (ms(0), 1, 8.0)


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode watermark semantics with REAL late data: a second
    micro-batch carrying events older than the advanced watermark must be
    dropped from the aggregation (the bounded-lateness contract that makes
    streaming state finite)."""
    import datetime as dt
    import time as _time

    from pyspark.sql import functions as F

    src = tmp_path / "stream_src"
    src.mkdir()

    def write_file(name, rows):
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        # move the part file into the watched dir; batch ORDER comes from the
        # original write mtimes plus the sleeps between writes (rename
        # preserves mtime — the sleeps are what keep ordering deterministic)
        part = next(
            p for p in (tmp_path / name).iterdir() if p.name.endswith(".parquet")
        )
        dest = src / f"{name}.parquet"
        part.rename(dest)
        return dest

    base = dt.datetime(2024, 5, 1, 10, 0, 0)
    on_time = [
        (i, base + dt.timedelta(minutes=10 * i), 1.0) for i in range(12)
    ]  # 10:00 .. 11:50 -> watermark advances to 11:20
    write_file("f1", on_time)
    _time.sleep(1.1)
    # a watermark becomes ENFORCEABLE one batch after it advances (Spark
    # updates it at batch end); this middle on-time batch puts it in force
    write_file("f2", [(50, base + dt.timedelta(hours=2), 1.0)])
    _time.sleep(1.1)
    late = [(100, base - dt.timedelta(hours=1), 99.0)]  # 09:00 — far too late
    write_file("f3", late)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("start"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["start"]: r["n"] for r in spark.sql("SELECT * FROM t_late").collect()}

    # the late 09:00 event's window must NOT appear; on-time windows below
    # the final watermark were emitted; the drop is visible in the metrics
    assert dt.datetime(2024, 5, 1, 9, 0) not in got
    assert got.get(dt.datetime(2024, 5, 1, 10, 0)) == 1
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    assert dropped == 1


# ---------------------------------------------------------------------------
# foreachBatch upsert sink: exactly-once keyed merge into versioned parquet
# ---------------------------------------------------------------------------


def test_upsert_sink_merges_and_skips_replayed_batches(spark, tmp_path):
    from big_data_processing_with_aws_glue_workshop_spark.streaming.sinks import (
        UpsertSink,
        read_current,
    )

    target = str(tmp_path / "table")
    sink = UpsertSink(target, keys=["user_id"], order_col="seq")

    b0 = spark.createDataFrame(
        [(1, 10, "a"), (1, 11, "b"), (2, 10, "x")], "user_id int, seq int, v string"
    )
    sink(b0, 0)
    t0 = {(r["user_id"], r["v"]) for r in read_current(spark, target).collect()}
    assert t0 == {(1, "b"), (2, "x")}  # within-batch keep-latest by seq

    b1 = spark.createDataFrame([(2, 20, "y"), (3, 20, "z")], "user_id int, seq int, v string")
    sink(b1, 1)
    t1 = {(r["user_id"], r["v"]) for r in read_current(spark, target).collect()}
    assert t1 == {(1, "b"), (2, "y"), (3, "z")}  # update + insert + untouched

    # replay of an applied batch (foreachBatch after recovery) is a no-op
    sink(b0, 0)
    assert {
        (r["user_id"], r["v"]) for r in read_current(spark, target).collect()
    } == t1


def test_snapshot_retention_time_travel_and_diff(spark, tmp_path):
    """keep_versions > 1: the newest N published versions stay readable
    (read_version = Delta-style VERSION AS OF), aged-out and
    never-published versions are not, default behavior (current only)
    is unchanged — and snapshot_diff over two retained versions audits
    exactly what a refresh changed."""
    import os

    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.operators.diff import (
        snapshot_diff,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.sinks import (
        UpsertSink,
        list_versions,
        read_current,
        read_version,
    )

    target = str(tmp_path / "table")
    sink = UpsertSink(target, keys=["user_id"], order_col="seq", keep_versions=2)
    schema = "user_id int, seq int, v string"
    sink(spark.createDataFrame([(1, 10, "a"), (2, 10, "x")], schema), 0)
    sink(spark.createDataFrame([(2, 20, "y"), (3, 20, "z")], schema), 1)
    sink(spark.createDataFrame([(1, 30, "c")], schema), 2)

    # v0 aged out; v1 and v2 retained; a never-published leftover is
    # excluded from the index even before the next sweep deletes it
    os.makedirs(os.path.join(target, "v9"))
    assert list_versions(target) == [1, 2]
    with pytest.raises(ValueError, match="available: \\[1, 2\\]"):
        read_version(spark, target, 0)
    with pytest.raises(ValueError, match="not retained"):
        read_version(spark, target, 9)

    v1 = {(r["user_id"], r["v"]) for r in read_version(spark, target, 1).collect()}
    assert v1 == {(1, "a"), (2, "y"), (3, "z")}
    assert {
        (r["user_id"], r["v"]) for r in read_version(spark, target, 2).collect()
    } == {(r["user_id"], r["v"]) for r in read_current(spark, target).collect()}

    # the audit composition: what did batch 2 change?
    d = snapshot_diff(
        read_version(spark, target, 1),
        read_version(spark, target, 2),
        keys=["user_id"],
    )
    changed = {
        r["user_id"]: r["change_type"] for r in d.collect() if r["change_type"] != "unchanged"
    }
    assert changed == {1: "changed"}

    # the retention policy is DURABLE: a writer invocation that omits
    # keep_versions (the cron-twin scenario) inherits the pointer's
    # policy instead of collapsing the audit window to 1
    plain = UpsertSink(target, keys=["user_id"], order_col="seq")
    plain(spark.createDataFrame([(4, 40, "d")], schema), 3)
    assert list_versions(target) == [2, 3]

    # a half-deleted aged-out dir (no _SUCCESS marker) is NOT a version:
    # serving it would silently truncate a time-travel read
    os.remove(os.path.join(target, "v2", "_SUCCESS"))
    assert list_versions(target) == [3]
    with pytest.raises(ValueError, match="not retained"):
        read_version(spark, target, 2)

    # default writer (keep_versions=1 on first commit) still retires all
    # predecessors
    t2 = str(tmp_path / "table1")
    s2 = UpsertSink(t2, keys=["user_id"])
    s2(spark.createDataFrame([(1, 1, "a")], schema), 0)
    s2(spark.createDataFrame([(2, 1, "b")], schema), 1)
    assert list_versions(t2) == [1]


def test_foreach_batch_upsert_end_to_end(spark, sf_dir, tmp_path):
    """Drive the real writeStream.foreachBatch path: stream the events table
    and keep the latest event per user; result equals the batch keep-latest."""
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load
    from big_data_processing_with_aws_glue_workshop_spark.streaming.sinks import (
        read_current,
        run_foreach_batch_upsert,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.windows import (
        read_events_stream,
    )
    from big_data_processing_with_aws_glue_workshop_spark.operators.dedup import keep_latest

    target = str(tmp_path / "latest_per_user")
    stream = read_events_stream(spark, sf_dir).select("user_id", "ts", "event_type")
    run_foreach_batch_upsert(
        stream,
        target,
        keys=["user_id"],
        order_col="ts",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    got = read_current(spark, target)
    expected = keep_latest(
        load(spark, sf_dir, "events").select("user_id", "ts", "event_type"),
        ["user_id"],
        "ts",
    )
    assert got.count() == expected.count()
    joined = got.select("user_id", F.col("ts").alias("got_ts")).join(
        expected.select("user_id", F.col("ts").alias("exp_ts")), "user_id"
    )
    assert joined.filter(F.col("got_ts") != F.col("exp_ts")).count() == 0


def test_upsert_sink_late_rows_and_retention(spark, tmp_path):
    """Order-aware merge: a late (older order_col) row in a later batch must
    not regress the table; superseded snapshot dirs are vacuumed."""
    import os

    from big_data_processing_with_aws_glue_workshop_spark.streaming.sinks import (
        UpsertSink,
        read_current,
    )

    target = str(tmp_path / "table")
    sink = UpsertSink(target, keys=["user_id"], order_col="seq")
    sink(spark.createDataFrame([(1, 12, "new")], "user_id int, seq int, v string"), 0)
    sink(spark.createDataFrame([(1, 11, "late"), (2, 5, "x")],
                               "user_id int, seq int, v string"), 1)
    rows = {(r["user_id"], r["seq"], r["v"]) for r in read_current(spark, target).collect()}
    assert rows == {(1, 12, "new"), (2, 5, "x")}  # late row did not win
    # equal-order ties go to the incoming batch
    sink(spark.createDataFrame([(2, 5, "y")], "user_id int, seq int, v string"), 2)
    assert (2, 5, "y") in {
        (r["user_id"], r["seq"], r["v"]) for r in read_current(spark, target).collect()
    }
    versions = [d for d in os.listdir(target) if d.startswith("v")]
    assert versions == ["v2"]  # superseded snapshots vacuumed


def test_foreach_batch_refuses_checkpointless_restart(spark, tmp_path):
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.streaming.sinks import (
        UpsertSink,
        run_foreach_batch_upsert,
    )

    target = str(tmp_path / "table")
    UpsertSink(target, keys=["k"])(spark.createDataFrame([(1,)], "k int"), 0)
    with pytest.raises(ValueError, match="checkpoint"):
        run_foreach_batch_upsert(spark.createDataFrame([(2,)], "k int"), target, ["k"])


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark suppresses re-delivered keys across
    micro-batches (at-least-once source -> exactly-once downstream) while
    keeping state bounded by the watermark horizon."""
    import datetime as dt
    import time as _time

    from big_data_processing_with_aws_glue_workshop_spark.streaming.windows import (
        run_streaming_query,
        streaming_dedup,
    )

    src = tmp_path / "dedup_src"
    src.mkdir()

    def write_file(name, rows):
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        part = next(
            p for p in (tmp_path / name).iterdir() if p.name.endswith(".parquet")
        )
        part.rename(src / f"{name}.parquet")

    base = dt.datetime(2024, 5, 1, 10, 0, 0)
    write_file(
        "b1",
        [
            (1, base, 1.0),
            (2, base + dt.timedelta(minutes=1), 2.0),
            (3, base + dt.timedelta(minutes=2), 3.0),
        ],
    )
    _time.sleep(1.1)
    # batch 2 re-delivers key 2 (different payload — first arrival wins)
    # and adds key 4; all within the 30-minute watermark horizon
    write_file(
        "b2",
        [
            (2, base + dt.timedelta(minutes=3), 99.0),
            (4, base + dt.timedelta(minutes=4), 4.0),
        ],
    )

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = run_streaming_query(streaming_dedup(stream), "dedup_test")
    rows = {r["event_id"]: r["value"] for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2] == 2.0  # the first arrival's payload survived


def test_stream_static_enrichment_join(spark, sf_dir):
    """Stream-static broadcast join: the events stream enriched with a
    static user-tier dim; per-tier counts must equal the batch equivalent."""
    from pyspark.sql import functions as F

    from big_data_processing_with_aws_glue_workshop_spark.streaming.windows import (
        read_events_stream,
        run_streaming_query,
        streaming_enrich,
    )

    dim = spark.range(0, 2000).select(
        F.col("id").alias("user_id"),
        F.when(F.col("id") % 3 == 0, "gold").otherwise("basic").alias("tier"),
    )
    stream = read_events_stream(spark, sf_dir)
    enriched = streaming_enrich(stream, dim).groupBy("tier").agg(
        F.count(F.lit(1)).alias("n")
    )
    out = run_streaming_query(enriched, "enrich_test", output_mode="complete")
    got = {r["tier"]: r["n"] for r in out.collect()}

    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .join(F.broadcast(dim), "user_id", "left")
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {r["tier"]: r["n"] for r in batch.collect()}
    assert got == want and set(got) == {"gold", "basic"}


# ---------------------------------------------------------------------------
# Reader parity: the streaming events reader must yield the SAME instants as
# the batch loader on every Spark build (the r4 Spark-4.1 upgrade silently
# split the two paths — this pins them together)
# ---------------------------------------------------------------------------


def test_batch_stream_reader_parity(spark, sf_dir):
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load

    stream = read_events_stream(spark, sf_dir)
    # drain the finite stream with a passthrough projection; checksum ts
    got = run_streaming_query(
        stream.select("event_id", "ts"), "t_reader_parity", output_mode="append"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
        F.sum(F.unix_micros("ts")).alias("checksum"),
    ).collect()[0]
    want = (
        load(spark, sf_dir, "events")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
            F.sum(F.unix_micros("ts")).alias("checksum"),
        )
        .collect()[0]
    )
    assert got["n"] == want["n"] and got["n"] > 0
    assert got["lo"] == want["lo"] and got["hi"] == want["hi"]
    assert got["checksum"] == want["checksum"]


@pytest.mark.parametrize("source_type", ["int64_nanos", "timestamp_ntz", "timestamp"])
def test_stream_reader_source_type_variants(spark, tmp_path, source_type):
    """read_events_stream handles every physical shape the ts column can
    arrive in — int64 nanos (pre-4.1 nanosAsLong), TIMESTAMP_NTZ (Spark
    4.1+ native nanos read), and plain TIMESTAMP — producing identical
    instants from each, so a driver Spark bump can't silently change
    values again."""
    import datetime as dt

    from pyspark.sql import types as T

    base = dt.datetime(2024, 5, 1, 10, 0, 0)
    instants = [base + dt.timedelta(minutes=7 * i, microseconds=i) for i in range(5)]
    sf = tmp_path / f"sf_{source_type}"
    sf.mkdir()

    common = [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
    if source_type == "int64_nanos":
        rows = [
            (i, int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) * 1000,
             i, "click", 1.0, "{}")
            for i, t in enumerate(instants)
        ]
        ts_field = T.StructField("ts", T.LongType())
    elif source_type == "timestamp_ntz":
        rows = [(i, t, i, "click", 1.0, "{}") for i, t in enumerate(instants)]
        ts_field = T.StructField("ts", T.TimestampNTZType())
    else:
        rows = [(i, t, i, "click", 1.0, "{}") for i, t in enumerate(instants)]
        ts_field = T.StructField("ts", T.TimestampType())
    schema = T.StructType([common[0], ts_field] + common[1:])
    staging = tmp_path / f"staging_{source_type}"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        str(staging)
    )
    # testdata layout is a single FILE named events.parquet (the reader's
    # pathGlobFilter matches file names) — relocate the part file to match
    part = next(p for p in staging.iterdir() if p.name.endswith(".parquet"))
    part.rename(sf / "events.parquet")

    stream = read_events_stream(spark, str(sf))
    out = run_streaming_query(
        stream.select("event_id", "ts"), f"t_src_{source_type}", output_mode="append"
    )
    got = {r["event_id"]: r["ts"] for r in out.collect()}
    assert got == {i: t for i, t in enumerate(instants)}


def test_stateless_text_op_runs_on_stream(spark, sf_dir):
    """The PII per-doc projection (a stateless narrow op) runs UNCHANGED on
    a streaming source: stream the documents table, apply pii_per_doc, and
    the drained totals must equal the batch run. This is the pattern that
    lifts every stateless text operator onto a file-arrival ingest stream
    without a rewrite."""
    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        pii_per_doc,
    )

    batch_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stream_docs = (
        spark.readStream.schema(batch_docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    out = run_streaming_query(pii_per_doc(stream_docs), "t_pii_stream")
    got = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("e").alias("e"),
        F.sum("p").alias("p"),
        F.sum("i").alias("i"),
        F.sum("removed").alias("removed"),
    ).collect()[0]
    want = pii_per_doc(batch_docs).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("e").alias("e"),
        F.sum("p").alias("p"),
        F.sum("i").alias("i"),
        F.sum("removed").alias("removed"),
    ).collect()[0]
    assert got.asDict() == want.asDict() and got["n"] > 0


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """Stream-stream watermarked interval join (click ⋈ error within 10
    minutes per user) drained over the finite source must produce exactly
    the batch join's pairs — the append-mode inner-join contract."""
    from big_data_processing_with_aws_glue_workshop_spark.queries._tables import load
    from big_data_processing_with_aws_glue_workshop_spark.streaming.windows import (
        streaming_interval_join,
    )

    stream = read_events_stream(spark, sf_dir)
    got = run_streaming_query(
        streaming_interval_join(stream), "t_interval_join"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_id") * F.lit(1_000_003) + F.col("r_id")).alias("pair_sum"),
    ).collect()[0]

    ev = load(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("l_user"), F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_id"),
    )
    right = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_id"),
    )
    want = left.join(
        right,
        F.expr("l_user = r_user AND r_ts >= l_ts AND r_ts <= l_ts + INTERVAL 10 minutes"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_id") * F.lit(1_000_003) + F.col("r_id")).alias("pair_sum"),
    ).collect()[0]

    assert want["n"] > 0  # the fixture must actually exercise the join
    assert got["n"] == want["n"]
    assert got["pair_sum"] == want["pair_sum"]  # same PAIRS, not just count


def test_sessionize_late_event_never_regresses_session_bounds(spark, tmp_path):
    """A LATE event (older than the open session's last event) arriving in
    a later micro-batch within the allowed lateness must merge WITHOUT
    regressing the session bounds: start extends backward (min), the end
    and the event-time timer stay at the newest event (max). The buggy
    arrival-order overwrite emitted session_end < a member event's ts."""
    import datetime as dt
    import time as _time

    from big_data_processing_with_aws_glue_workshop_spark.streaming.stateful import (
        sessionize_with_timeout,
    )

    src = tmp_path / "late_src"
    src.mkdir()

    def write_file(name, rows):
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        part = next(
            p for p in (tmp_path / name).iterdir() if p.name.endswith(".parquet")
        )
        part.rename(src / f"{name}.parquet")

    base = dt.datetime(2024, 5, 1, 10, 0, 0)
    m = lambda k: base + dt.timedelta(minutes=k)
    ms = lambda k: int((m(k) - dt.datetime(1970, 1, 1)).total_seconds() * 1000)

    # batch 1 opens the session at 10:10; batch 2 delivers a LATE 10:05
    # event (within lateness: watermark still trails); batch 3's 12:00
    # event closes the session by arrival
    write_file("f1", [(1, m(10), 1.0)])
    _time.sleep(1.1)
    write_file("f2", [(1, m(5), 2.0)])
    _time.sleep(1.1)
    write_file("f3", [(1, m(120), 4.0)])

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = run_streaming_query(
        sessionize_with_timeout(stream, gap_minutes=30),
        "t_sessions_late",
        output_mode="update",
    )
    rows = out.collect()
    assert len(rows) == 1
    s = rows[0]
    # start = min(10:05, 10:10), end = max: the late event extended the
    # start backward and did NOT drag the end (or the timer) to 10:05
    assert (s["session_start_ms"], s["session_end_ms"]) == (ms(5), ms(10))
    assert (s["n_events"], s["total_value"]) == (2, 3.0)


def test_upsert_target_ownership_is_enforced(spark, tmp_path):
    """r8 hardening of the sink-pointer protocol: a different stream
    checkpoint, a stream run onto a batch-owned target, and a batch
    refresh onto a stream-owned target are all refused loudly — each
    would otherwise collide batch-id sequences and silently skip data."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_refresh,
    )
    from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import (
        JobBookmark,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.sinks import (
        UpsertSink,
        run_foreach_batch_upsert,
    )

    landing = tmp_path / "in"
    landing.mkdir()
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame([(1, 10)], columns=["k", "v"]), preserve_index=False
        ),
        str(landing / "a.parquet"),
    )

    # stream-owned target
    stream_target = str(tmp_path / "stream_table")
    stream = spark.readStream.schema("k long, v long").parquet(str(landing))
    run_foreach_batch_upsert(
        stream, stream_target, ["k"], checkpoint_dir=str(tmp_path / "ckptA")
    )
    # different checkpoint refused
    stream = spark.readStream.schema("k long, v long").parquet(str(landing))
    with pytest.raises(ValueError, match="different checkpoint"):
        run_foreach_batch_upsert(
            stream, stream_target, ["k"], checkpoint_dir=str(tmp_path / "ckptB")
        )
    # batch refresh onto the stream-owned target refused
    with pytest.raises(ValueError, match="streaming upsert path"):
        incremental_refresh(
            spark,
            JobBookmark(str(tmp_path / "bm.json"), "j"),
            str(landing / "*.parquet"),
            lambda df: df,
            stream_target,
            keys=["k"],
        )

    # batch-owned target: streaming onto it refused even WITH a checkpoint
    batch_target = str(tmp_path / "batch_table")
    UpsertSink(batch_target, keys=["k"])(
        spark.createDataFrame([(1, 10)], "k long, v long"), 0
    )
    stream = spark.readStream.schema("k long, v long").parquet(str(landing))
    with pytest.raises(ValueError, match="batch upsert path"):
        run_foreach_batch_upsert(
            stream, batch_target, ["k"], checkpoint_dir=str(tmp_path / "ckptC")
        )
