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
from big_data_processing_with_aws_glue_workshop_spark.queries import QUERIES


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    result = run_streaming_query(
        streaming_tumbling_agg(stream), "t_tumbling", output_mode="complete"
    )
    batch = QUERIES["tumbling_windows"](spark, sf_dir)
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
