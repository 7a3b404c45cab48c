"""Event-time windowing over the ``events`` table (SURVEY §2.10 extension).

The reference is batch-only; these queries add the standard event-time
operator family — tumbling / sliding / session windows + semi-structured
extraction — as pure DataFrame plans that work identically in batch and
(minus the oracle) under Structured Streaming (see ``streaming/``).

Window timestamps are emitted as epoch MILLISECOND bigints so the DuckDB
comparison is timezone-proof. Spark's window origin (1970-01-01) and
DuckDB's time_bucket origin (2000-01-01) coincide for minute-granularity
buckets (2000-01-01 is a whole multiple of 5/10 minutes since the epoch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._tables import load


def _dec(c: str):
    return F.col(c).cast("decimal(18,2)")


def q_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling window aggregation per event type. At scale this is
    a single hash shuffle on (window, event_type) with map-side partials."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes: each event lands in exactly
    two windows (Spark materializes this as a windows-array explode)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "n_events",
            "total_value",
        )
    )


def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization per user via the native session_window
    operator (batch mode here; the same expression runs under Structured
    Streaming). Session end = last event + gap."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            F.unix_millis(F.col("w.end")).alias("session_end_ms"),
            "n_events",
            "total_value",
        )
    )


def q_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull a typed field out of the JSON props
    column and aggregate on it (JVM-side get_json_object, no UDF)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k", F.get_json_object(F.col("props"), "$.k").cast("int")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("k").isNotNull(), 1)).alias("n_with_k"),
            F.sum(F.col("k").cast("bigint")).alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_asof_last_click_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operator Spark lacks natively; operators/asof.py): for
    every 'error' event, the most recent 'click' by the same user at or
    before it. One shuffle on user_id — checked against DuckDB's native
    ASOF JOIN."""
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join(
        errors,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="click_ts",
        value_cols=["click_ts", "click_value"],
        suffix="",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("error_ts_ms"),
        F.unix_millis("click_ts").alias("last_click_ts_ms"),
        F.col("click_value").alias("last_click_value"),
    )


# deterministic interval set for the range-join query, single source of
# truth for BOTH the Spark query and the SQL oracle below
N_INTERVALS = 15
INTERVAL_SPACING_H = 50
INTERVAL_WIDTH_H = 12
INTERVAL_BASE = "2024-01-01 00:00:00"


def q_range_join_interval_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (point-in-interval) join via the bucketized equi-join rewrite
    (operators/rangejoin.py): events counted into literal 12h windows.
    Oracle: the naive BETWEEN join — same answer, quadratic plan."""
    from ..operators.rangejoin import bucketized_range_join

    ev = load(spark, sf_dir, "events").select("event_id", "ts")
    base = F.lit(INTERVAL_BASE).cast("timestamp")
    intervals = spark.createDataFrame(
        [(i,) for i in range(N_INTERVALS)], "interval_id long"
    ).select(
        "interval_id",
        (base + F.make_interval(hours=F.col("interval_id") * INTERVAL_SPACING_H)).alias(
            "start"
        ),
        (
            base
            + F.make_interval(
                hours=F.col("interval_id") * INTERVAL_SPACING_H + INTERVAL_WIDTH_H
            )
        ).alias("end"),
    )
    joined = bucketized_range_join(ev, intervals, "ts", "start", "end")
    return joined.groupBy("interval_id").agg(F.count(F.lit(1)).alias("n_events"))


def q_user_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-analytics family (lag + running frame aggregates + rank) —
    beyond the reference's row_number-only usage: per user, time since the
    previous event, running event count, and per-user recency rank."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w_time = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    w_run = w_time.rowsBetween(Window.unboundedPreceding, 0)
    return (
        ev.filter(F.col("event_id") < 2000)
        .select(
            "event_id",
            "user_id",
            F.unix_millis("ts").alias("ts_ms"),
            (
                F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w_time))
            ).alias("ms_since_prev"),
            F.row_number().over(w_time).alias("event_seq"),
            F.count(F.lit(1)).over(w_run).alias("running_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .over(w_run)
            .cast("double")
            .alias("running_value"),
        )
    )


def q_event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per event type (sort-based; the approximate
    percentile_approx is the 100-TB variant, same API shape — MEASURED
    at 10M/60M rows in docs/SCALE.md: 9-13x faster with <0.1% value
    error at accuracy 10k, fixed-width sketch state vs a value-count
    map that grows with distinct values)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.percentile("value", 0.5).alias("p50_value"),
        F.percentile("value", 0.9).alias("p90_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def q_value_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly flagging with EXACT moment computation:
    sum and sum-of-squares accumulate in decimal (order-independent), the
    mean/variance arithmetic is a fixed sequence of IEEE double ops written
    identically in the oracle, so z-scores match bit-for-bit."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    d = F.col("value").cast("decimal(18,2)")
    n = F.count(F.lit(1)).over(w)
    s = F.sum(d).over(w).cast("double")
    ss = F.sum(d * d).over(w).cast("double")
    mean = s / n
    var = ss / n - mean * mean
    z = (F.col("value") - mean) / F.sqrt(var)
    # degenerate groups are excluded BEFORE sqrt: FP cancellation can leave
    # var at a tiny negative (sqrt -> NaN, and Spark orders NaN above any
    # number, flagging entire constant groups), and var == 0 divides by zero
    # with different engine semantics — the guard is mirrored in the oracle
    scored = ev.select(
        "event_id", "event_type", "value", var.alias("__var"), z.alias("zscore")
    ).filter(F.col("__var") > 1e-12)
    return scored.drop("__var").filter(
        (F.col("zscore") > 3.0) | (F.col("zscore") < -3.0)
    )


def q_hourly_rollup_from_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (operators/rollup_time.py): hourly
    aggregates computed FROM the minute-level rollup, not from raw rows —
    partial-aggregate reuse. Oracle: direct hourly aggregation of the raw
    table, which must be identical (sum/count/max are decomposable)."""
    from ..operators.rollup_time import time_rollup_chain

    ev = load(spark, sf_dir, "events")
    levels = time_rollup_chain(
        ev, ts_col="ts", key_cols=["event_type"], levels_seconds=(60, 3600)
    )
    hourly = levels[3600]
    return hourly.select(
        F.unix_millis("bucket_ts").alias("hour_start_ms"),
        "event_type",
        "n",
        F.col("total").cast("double").alias("total_value"),
        "max_value",
    )


_FUNNEL = ("view", "click", "purchase")


def q_user_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel analysis (view -> click -> purchase): a user
    converts a stage only with an event STRICTLY AFTER their previous
    stage's converting event (first view, then first click after that
    view, then first purchase after that click). This is the sequential-
    pattern family the as-of join does not cover — order matters, not
    just proximity.

    Spark-first shape: ONE shuffle (groupBy user collecting the sorted
    (ts, type) sequence), then the stage walk runs entirely in
    higher-order array functions (filter + element_at) inside the same
    stage — no self-joins, no second shuffle, no per-row Python. At
    100 TB the alternative 3-level dependent-join plan (the oracle's CTE
    chain) costs three shuffles; the collected per-user sequence here is
    bounded by events-per-user, the natural skew unit either way.

    Output: one row per stage with converted-user counts and the
    conversion rate from the previous stage (one IEEE division of exact
    ints; NULL for the first stage)."""
    return funnel_stages(load(spark, sf_dir, "events"))


def funnel_stages(events: DataFrame) -> DataFrame:
    """The funnel core on any events frame (stress.py drives it on
    synthetic hot-user corpora; see q_user_conversion_funnel for the
    operator story and SCALE.md for the measured depth curve)."""
    seq = F.sort_array(F.collect_list(F.struct("ts", "event_type")))
    per_user = (
        events.filter(F.col("event_type").isin(*_FUNNEL))
        .groupBy("user_id")
        .agg(seq.alias("seq"))
    )

    def first_after(typ, prev_ts):
        cond = (
            (lambda x: x["event_type"] == typ)
            if prev_ts is None
            else (lambda x: (x["event_type"] == typ) & (x["ts"] > prev_ts))
        )
        return F.element_at(F.filter(F.col("seq"), cond), 1)["ts"]

    staged = (
        per_user.withColumn("vt", first_after("view", None))
        .withColumn("ct", first_after("click", F.col("vt")))
        .withColumn("pt", first_after("purchase", F.col("ct")))
    )
    # ts_checksum pins WHICH event converted each user (sum of the stage
    # timestamps in epoch millis) — on a dense corpus the raw counts alone
    # would not distinguish a broken ordering walk from the correct one
    counts = staged.agg(
        F.count("vt").alias("n_view"),
        F.count("ct").alias("n_click"),
        F.count("pt").alias("n_purchase"),
        F.sum(F.unix_millis("vt")).alias("vt_sum"),
        F.sum(F.unix_millis("ct")).alias("ct_sum"),
        F.sum(F.unix_millis("pt")).alias("pt_sum"),
    )
    stages = counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("1_view").alias("stage"),
                    F.col("n_view").alias("n_users"),
                    F.lit(None).cast("double").alias("rate_from_prev"),
                    F.col("vt_sum").alias("ts_checksum"),
                ),
                F.struct(
                    F.lit("2_click").alias("stage"),
                    F.col("n_click").alias("n_users"),
                    (F.col("n_click").cast("double") / F.col("n_view")).alias(
                        "rate_from_prev"
                    ),
                    F.col("ct_sum").alias("ts_checksum"),
                ),
                F.struct(
                    F.lit("3_purchase").alias("stage"),
                    F.col("n_purchase").alias("n_users"),
                    (F.col("n_purchase").cast("double") / F.col("n_click")).alias(
                        "rate_from_prev"
                    ),
                    F.col("pt_sum").alias("ts_checksum"),
                ),
            )
        ).alias("r")
    )
    return stages.select("r.stage", "r.n_users", "r.rate_from_prev", "r.ts_checksum")


def q_trailing_window_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-interval window frames — the frame family the row-based
    running windows (user_event_deltas) can't express: per user, the
    TRAILING 1-HOUR event count and value sum at every event, where the
    frame is bounded by event-time distance, not row position (rate
    limiting, rolling quotas, short-horizon feature windows).

    rangeBetween over unix seconds includes ALL peers at equal timestamps
    on both engines — tie semantics are the point of RANGE vs ROWS and
    are pinned by the oracle. One shuffle on user_id; the frame scan is
    the sorted per-user pass. Sum runs in decimal (order-independent),
    one cast to double at the end."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-3599, Window.currentRow)
    )
    return ev.filter(F.col("event_id") < 2000).select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_events"),
        F.sum(_dec("value")).over(w).cast("double").alias("trailing_1h_value"),
    )


def q_interval_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream watermarked interval join
    (streaming/windows.py:175): every 'error' event matched to the same
    user's 'click' events in the preceding 10 minutes, rolled up to one
    row per matched error.

    This calls the STREAMING operator itself — ``withWatermark`` is a
    no-op on batch DataFrames, so the identical plan-building code serves
    both execution modes (the batch/stream unification Structured
    Streaming promises). The join is a hash join on user_id with the
    time bound as a residual predicate plus a map-side partial count —
    one shuffle; at 100 TB the user_id key is the natural skew unit and
    AQE skew-join splitting applies. Inner-join semantics match the
    streaming append-mode emission exactly (tests/test_streaming.py pins
    count parity between the two modes on the same data)."""
    from ..streaming.windows import streaming_interval_join

    ev = load(spark, sf_dir, "events")
    pairs = streaming_interval_join(ev)  # click ⋈ error, 10-minute bound
    # ts_checksum pins WHICH clicks matched, not just how many
    return (
        pairs.groupBy(
            F.col("r_id").alias("error_event_id"),
            F.col("r_user").alias("user_id"),
            F.unix_millis("r_ts").alias("error_ts_ms"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_clicks_before"),
            F.sum(F.unix_millis("l_ts")).alias("click_ts_checksum"),
        )
    )


def q_event_type_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: for each user's event
    sequence (ordered by ts, event_id), count event_type -> next
    event_type transitions and each origin state's outgoing share — the
    Markov-chain profile behind session-behavior modeling.

    One shuffle on user_id for the lead() window, then a hash aggregate
    on the (from, to) pair — at 100 TB the pair space is tiny (|types|²),
    so the final agg is map-side-combined to almost nothing. The share is
    one IEEE division of exact counts (both < 2^53, exactly
    representable)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    pairs = (
        ev.withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .select(F.col("event_type").alias("from_type"), "to_type")
    )
    counted = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_from = Window.partitionBy("from_type")
    return counted.withColumn(
        "share_from",
        F.col("n_transitions").cast("double") / F.sum("n_transitions").over(w_from),
    )


def q_user_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: bucket every user into the epoch-week of
    their FIRST event (the cohort), then count, for each (cohort, weeks
    since first), how many of that cohort's users were active — the
    standard product-analytics retention triangle.

    Week buckets are integer floor-divisions of epoch microseconds
    (``unix_micros(ts) DIV week``) — exact int64 arithmetic on both
    engines, no timezone/week-start convention in play.

    Spark plan: ONE shuffle on user_id computes the per-user first week as
    a window MIN (no self-join back to a firsts table — the window reuses
    the same hash partitioning the naive join would shuffle twice for),
    then a count-distinct aggregate on the tiny (cohort, offset) matrix;
    Spark plans the distinct as the standard two-phase Expand. The final
    retention share divides each cell by its cohort's week-0 size via a
    window over the matrix — a few dozen rows, cost-free. At 100 TB the
    only big exchange is the user_id partitioning, and user_id is also the
    natural key to pre-bucket the events lake on (making this, the funnel,
    the transition matrix, and sessionization all exchange-free)."""
    week_us = 7 * 24 * 3600 * 1_000_000
    ev = load(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id")
    weekly = (
        ev.select(
            "user_id",
            F.expr(f"unix_micros(ts) DIV {week_us}").alias("epoch_week"),
        )
        .withColumn("cohort_week", F.min("epoch_week").over(w_user))
    )
    matrix = weekly.groupBy(
        "cohort_week",
        (F.col("epoch_week") - F.col("cohort_week"))
        .cast("int")
        .alias("weeks_since_first"),
    ).agg(
        F.count_distinct("user_id").alias("n_active_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_cohort = Window.partitionBy("cohort_week")
    cohort_size = F.max(
        F.when(F.col("weeks_since_first") == 0, F.col("n_active_users"))
    ).over(w_cohort)
    return matrix.select(
        "cohort_week",
        "weeks_since_first",
        "n_active_users",
        "n_events",
        (F.col("n_active_users").cast("double") / cohort_size).alias(
            "retention_share"
        ),
    )


QUERIES = {
    "tumbling_windows": q_tumbling_windows,
    "user_cohort_retention": q_user_cohort_retention,
    "interval_join_batch": q_interval_join_batch,
    "event_type_transition_matrix": q_event_type_transition_matrix,
    "trailing_window_rates": q_trailing_window_rates,
    "user_conversion_funnel": q_user_conversion_funnel,
    "hourly_rollup_from_minutes": q_hourly_rollup_from_minutes,
    "value_zscore_outliers": q_value_zscore_outliers,
    "event_value_percentiles": q_event_value_percentiles,
    "user_event_deltas": q_user_event_deltas,
    "sliding_windows": q_sliding_windows,
    "session_windows": q_session_windows,
    "json_props_extract": q_json_props_extract,
    "asof_last_click_before_error": q_asof_last_click_before_error,
    "range_join_interval_counts": q_range_join_interval_counts,
}

ORACLES = {
    # retention twin: per-user first week via window MIN, then the cohort
    # matrix with a MAX(CASE) window for the week-0 cohort size. Integer
    # epoch-microsecond floor-division matches the engine exactly.
    "user_cohort_retention": """
        WITH weekly AS (
          SELECT user_id,
                 epoch_us(ts) // 604800000000 AS epoch_week,
                 MIN(epoch_us(ts) // 604800000000)
                   OVER (PARTITION BY user_id) AS cohort_week
          FROM events
        ),
        matrix AS (
          SELECT cohort_week,
                 CAST(epoch_week - cohort_week AS INTEGER)
                   AS weeks_since_first,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_users,
                 CAST(COUNT(1) AS BIGINT) AS n_events
          FROM weekly
          GROUP BY 1, 2
        )
        SELECT cohort_week, weeks_since_first, n_active_users, n_events,
               CAST(n_active_users AS DOUBLE)
                 / MAX(CASE WHEN weeks_since_first = 0 THEN n_active_users END)
                     OVER (PARTITION BY cohort_week) AS retention_share
        FROM matrix
    """,
    # funnel twin: the classic 3-level dependent-aggregation chain (each
    # stage joins the previous stage's converting timestamp); the engine's
    # single-shuffle array walk must reproduce these counts exactly
    "user_conversion_funnel": """
        WITH v AS (
          SELECT user_id, MIN(ts) AS vt FROM events
          WHERE event_type = 'view' GROUP BY 1
        ),
        c AS (
          SELECT e.user_id, MIN(e.ts) AS ct
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.vt GROUP BY 1
        ),
        p AS (
          SELECT e.user_id, MIN(e.ts) AS pt
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.ct GROUP BY 1
        ),
        n AS (
          SELECT (SELECT COUNT(*) FROM v) AS n_view,
                 (SELECT COUNT(*) FROM c) AS n_click,
                 (SELECT COUNT(*) FROM p) AS n_purchase,
                 (SELECT SUM(epoch_ms(vt)) FROM v) AS vt_sum,
                 (SELECT SUM(epoch_ms(ct)) FROM c) AS ct_sum,
                 (SELECT SUM(epoch_ms(pt)) FROM p) AS pt_sum
        )
        SELECT '1_view' AS stage, CAST(n_view AS BIGINT) AS n_users,
               CAST(NULL AS DOUBLE) AS rate_from_prev,
               CAST(vt_sum AS BIGINT) AS ts_checksum FROM n
        UNION ALL
        SELECT '2_click', CAST(n_click AS BIGINT),
               CAST(n_click AS DOUBLE) / n_view,
               CAST(ct_sum AS BIGINT) FROM n
        UNION ALL
        SELECT '3_purchase', CAST(n_purchase AS BIGINT),
               CAST(n_purchase AS DOUBLE) / n_click,
               CAST(pt_sum AS BIGINT) FROM n
    """,
    "tumbling_windows": """
        SELECT
          epoch_ms(time_bucket(INTERVAL '10 minutes', ts)) AS window_start_ms,
          event_type,
          COUNT(1) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    # every event belongs to 2 sliding windows: the 5-min bucket it sits in
    # and the one starting 5 minutes earlier
    "sliding_windows": """
        WITH assigned AS (
          SELECT epoch_ms(time_bucket(INTERVAL '5 minutes', ts)) AS window_start_ms,
                 value
          FROM events
          UNION ALL
          SELECT epoch_ms(time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'),
                 value
          FROM events
        )
        SELECT window_start_ms,
               COUNT(1) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM assigned
        GROUP BY 1
    """,
    # gaps-and-islands sessionization: a new session starts when the gap from
    # the previous event of the same user reaches 30 minutes. '>=' matches
    # Spark's half-open [ts, ts+gap) session windows: an event exactly at the
    # previous window's end starts a NEW session
    "session_windows": """
        WITH flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           >= INTERVAL '30 minutes'
                      OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ),
        sessions AS (
          SELECT user_id, ts, value,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged
        )
        SELECT user_id,
               epoch_ms(MIN(ts)) AS session_start_ms,
               epoch_ms(MAX(ts) + INTERVAL '30 minutes') AS session_end_ms,
               COUNT(1) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM sessions
        GROUP BY user_id, session_id
    """,
    "hourly_rollup_from_minutes": """
        SELECT
          epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS hour_start_ms,
          event_type,
          COUNT(1) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
          MAX(value) AS max_value
        FROM events
        GROUP BY 1, 2
    """,
    "value_zscore_outliers": """
        WITH stats AS (
          SELECT event_id, event_type, value,
                 COUNT(1) OVER w AS n,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s,
                 CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                      OVER w AS DOUBLE) AS ss
          FROM events
          WINDOW w AS (PARTITION BY event_type)
        )
        SELECT event_id, event_type, value,
               (value - s / n) / sqrt(ss / n - (s / n) * (s / n)) AS zscore
        FROM stats
        WHERE ss / n - (s / n) * (s / n) > 1e-12
          AND ((value - s / n) / sqrt(ss / n - (s / n) * (s / n)) > 3.0
            OR (value - s / n) / sqrt(ss / n - (s / n) * (s / n)) < -3.0)
    """,
    "event_value_percentiles": """
        SELECT event_type,
               COUNT(1) AS n_events,
               quantile_cont(value, 0.5) AS p50_value,
               quantile_cont(value, 0.9) AS p90_value,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events
        GROUP BY event_type
    """,
    "user_event_deltas": """
        SELECT event_id,
               user_id,
               epoch_ms(ts) AS ts_ms,
               epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) AS ms_since_prev,
               CAST(ROW_NUMBER() OVER w AS INTEGER) AS event_seq,
               COUNT(1) OVER (w ROWS UNBOUNDED PRECEDING) AS running_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2)))
                    OVER (w ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
        FROM events
        WHERE event_id < 2000
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    # LEFT ASOF JOIN: nearest click at-or-before each error per user
    "asof_last_click_before_error": """
        WITH errors AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
        ),
        clicks AS (
          SELECT user_id, ts AS click_ts, value AS click_value
          FROM events WHERE event_type = 'click'
        )
        SELECT e.event_id,
               e.user_id,
               epoch_ms(e.ts) AS error_ts_ms,
               epoch_ms(c.click_ts) AS last_click_ts_ms,
               c.click_value AS last_click_value
        FROM errors e
        ASOF LEFT JOIN clicks c
          ON e.user_id = c.user_id AND e.ts >= c.click_ts
    """,
    "range_join_interval_counts": f"""
        WITH intervals AS (
          SELECT i AS interval_id,
                 TIMESTAMP '{INTERVAL_BASE}'
                   + to_hours({INTERVAL_SPACING_H} * i) AS w_start,
                 TIMESTAMP '{INTERVAL_BASE}'
                   + to_hours({INTERVAL_SPACING_H} * i + {INTERVAL_WIDTH_H}) AS w_end
          FROM range(0, {N_INTERVALS}) t(i)
        )
        SELECT interval_id, COUNT(1) AS n_events
        FROM events JOIN intervals
          ON ts >= w_start AND ts < w_end
        GROUP BY interval_id
    """,
    # RANGE frame twin: same event-time-bounded trailing frame; equal-ts
    # peers are included by RANGE semantics in both engines
    "trailing_window_rates": """
        SELECT event_id,
               user_id,
               epoch_ms(ts) AS ts_ms,
               COUNT(1) OVER w AS trailing_1h_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                 AS trailing_1h_value
        FROM events
        WHERE event_id < 2000
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                     RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    """,
    # interval-join twin: the naive BETWEEN self-join, rolled up per error;
    # inner join == streaming append-mode emission (only matched errors)
    "interval_join_batch": """
        SELECT r.event_id AS error_event_id,
               r.user_id,
               epoch_ms(r.ts) AS error_ts_ms,
               COUNT(1) AS n_clicks_before,
               CAST(SUM(epoch_ms(l.ts)) AS BIGINT) AS click_ts_checksum
        FROM events r
        JOIN events l
          ON l.user_id = r.user_id
         AND r.event_type = 'error' AND l.event_type = 'click'
         AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL '10 minutes'
        GROUP BY 1, 2, 3
    """,
    "event_type_transition_matrix": """
        WITH seq AS (
          SELECT event_type,
                 LEAD(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS to_type
          FROM events
        )
        SELECT event_type AS from_type,
               to_type,
               COUNT(1) AS n_transitions,
               CAST(COUNT(1) AS DOUBLE)
                 / SUM(COUNT(1)) OVER (PARTITION BY event_type) AS share_from
        FROM seq
        WHERE to_type IS NOT NULL
        GROUP BY 1, 2
    """,
    "json_props_extract": """
        SELECT
          event_type,
          COUNT(CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) IS NOT NULL
                     THEN 1 END) AS n_with_k,
          CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
          MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS min_k,
          MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
        FROM events
        GROUP BY event_type
    """,
}
