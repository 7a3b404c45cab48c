"""Structured Streaming event-time operators (SURVEY §2.10 extension).

The SAME window expressions as the batch queries in queries/events.py,
lifted onto a streaming source with watermarked late-data handling. Batch
mode verifies values (DuckDB oracle); these verify the streaming lifecycle:
watermark, incremental state, append/update output.

Source here is the file stream reader over the testdata parquet (one-shot);
production swaps in kafka/kinesis without touching the aggregation plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..queries._tables import ensure_session_confs, ntz_to_utc_instant


def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_type, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )


# Historical alias (the int64-nanos shape under nanosAsLong); kept for
# callers that imported the constant, superseded by the adaptive probe below.
EVENTS_SCHEMA = _events_schema(T.LongType())


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-based streaming source over the events table.

    The parquet ``ts`` column is physical TIMESTAMP(NANOS), which arrives
    differently depending on the Spark build:

    - pre-4.1 with ``spark.sql.legacy.parquet.nanosAsLong``: int64 nanos —
      declare LongType and convert with integer ``DIV 1000`` (floor to
      micros, matching DuckDB's truncation);
    - Spark 4.1+: read natively as TIMESTAMP_NTZ (micros truncation), the
      legacy conf is ignored — declare TimestampNTZType and cast to
      TIMESTAMP under the UTC session timezone.

    A streaming reader must declare its schema up front, so instead of
    branching on the loaded frame's dtype (what the batch loader
    queries/_tables.py::load does) we probe the batch reader's inferred
    schema once — a footer-only read, no data scan — and declare the
    matching streaming schema. This keeps batch and stream ``ts`` values
    identical on every Spark build (pinned by
    tests/test_streaming.py::test_batch_stream_reader_parity).
    """
    ensure_session_confs(spark)
    path = f"{sf_dir}/events.parquet"
    probed = spark.read.parquet(path).schema["ts"].dataType
    raw = (
        spark.readStream.schema(_events_schema(probed))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(probed, T.LongType):
        # integer DIV, not float '/': nanos ~1.7e18 exceed double's 53-bit
        # exact-integer range, so float division would corrupt low micros
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if isinstance(probed, T.TimestampNTZType):
        # session-TZ-independent wall->instant conversion, same helper as
        # the batch loader (a plain cast would shift on locked non-UTC TZs)
        return raw.withColumn("ts", ntz_to_utc_instant(F.col("ts")))
    if isinstance(probed, T.TimestampType):
        return raw
    raise TypeError(
        f"events.ts arrived as unsupported type {probed}; expected int64 "
        "nanos (nanosAsLong), TIMESTAMP_NTZ (Spark 4.1+), or TIMESTAMP"
    )


def streaming_tumbling_agg(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Watermarked 10-minute tumbling counts per event type. State for a
    window is dropped once the watermark passes its end — bounded memory on
    unbounded streams."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_sliding_agg(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def streaming_session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Watermarked session windows per user — native stateful session
    operator; merges adjacent state as events arrive."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def streaming_enrich(
    events: DataFrame, dim: DataFrame, on: str = "user_id", how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    CURRENT state of the static side (Spark re-plans the static scan per
    batch, so slowly-changing dims refresh without restarting the query).
    The static side is broadcast-pinned — dim enrichment must never
    shuffle the stream. Stateless: no watermark required."""
    return events.join(F.broadcast(dim), on, how)


def streaming_dedup(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming exact deduplication for at-least-once sources:
    ``dropDuplicatesWithinWatermark`` keeps the FIRST arrival of each key
    and suppresses re-deliveries while the key is within the watermark
    horizon, then expires the key's state — bounded memory on unbounded
    streams (a plain dropDuplicates would grow state forever).

    This is the streaming face of the batch exact-dedup family
    (queries/textops.py::q_doc_dedup_profile): same hash-key semantics,
    state lifetime bounded by event-time instead of corpus size. In a
    training-data ingest pipeline this is the first stage after the
    source — duplicate suppression before any expensive enrichment."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_streaming_query(
    agg: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Drive a streaming aggregation to completion against the finite file
    source via the memory sink; returns the materialized result table."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return agg.sparkSession.sql(f"SELECT * FROM {name}")


def streaming_interval_join(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "error",
    within: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join — the hardest Structured Streaming
    operator surface: match every ``right_type`` event to the same user's
    ``left_type`` events in the preceding ``within`` interval.

    Both sides carry a watermark AND the join condition bounds their time
    difference; together these let Spark EXPIRE buffered rows (a left
    click older than right-watermark - within can never match again), so
    state stays finite on unbounded streams — without the time bound the
    state store would grow forever. Inner join in append mode: a match is
    emitted once both sides have arrived, exactly the semantics of the
    batch twin (tests/test_streaming.py pins count parity against the
    equivalent batch join on the same data).

    The two sides here are two filters over ONE source stream; Spark
    plans them as independent stream inputs, so the same code serves two
    genuinely distinct sources (clicks topic ⋈ errors topic)."""
    left = (
        events.filter(F.col("event_type") == left_type)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("ts").alias("l_ts"),
            F.col("event_id").alias("l_id"),
        )
        .withWatermark("l_ts", watermark)
    )
    right = (
        events.filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("r_ts"),
            F.col("event_id").alias("r_id"),
        )
        .withWatermark("r_ts", watermark)
    )
    return left.join(
        right,
        F.expr(
            f"l_user = r_user AND r_ts >= l_ts AND r_ts <= l_ts + INTERVAL {within}"
        ),
    )
