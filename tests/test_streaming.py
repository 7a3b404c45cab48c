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
