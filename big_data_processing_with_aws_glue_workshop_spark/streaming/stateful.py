"""Custom stateful streaming operators.

``running_user_stats`` keeps (n_events, total_value, max_value) per user in
managed state across micro-batches and emits the updated running totals
whenever the user receives events — the arbitrary-stateful pattern
(GroupState) the built-in window aggregations can't express, e.g. lifetime
counters, per-entity CUSUM/anomaly scores, or custom session logic.

Two implementations of the same semantics, one per Spark stateful API
generation — both kept because the old API is the compatibility path and
the new one is where Spark 4.x invests (state schema evolution, timers,
composite state):

- ``running_user_stats`` — applyInPandasWithState (GroupState; Spark 3.4+).
- ``running_user_stats_tws`` — transformWithStateInPandas
  (StatefulProcessor + ValueState; Spark 4.x, requires the RocksDB state
  store provider). tests/test_streaming.py pins both against the same
  batch aggregation.

State is a single fixed-width row per user: memory is O(distinct users),
independent of stream length; the state store shuffles by user_id so each
partition owns its keys — the layout that scales to a real cluster.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
        T.StructField("max_value", T.DoubleType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
        T.StructField("max_value", T.DoubleType(), False),
    ]
)


def _update(
    key: tuple[Any, ...], batches: Iterable[pd.DataFrame], state: GroupState
):
    (user_id,) = key
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in batches:
        vals = pdf["value"].dropna()
        n += len(pdf)
        total += float(vals.sum())
        if len(vals):
            mx = max(mx, float(vals.max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        [(user_id, n, total, mx if mx != float("-inf") else None)],
        columns=["user_id", "n_events", "total_value", "max_value"],
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user lifetime counters maintained in GroupState. Input must be a
    streaming DataFrame with (user_id, value)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start_ms", T.LongType(), False),
        T.StructField("session_end_ms", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType(), False),
        T.StructField("last_ms", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)


def sessionize_with_timeout(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "30 minutes"
) -> DataFrame:
    """Custom sessionization with EVENT-TIME TIMERS — the stateful pattern
    the built-in ``session_window`` cannot express when the per-session
    output needs custom close logic: a user's session closes either when
    a later event arrives past the gap (emitted immediately) or when the
    WATERMARK passes last_event + gap with no further events
    (``GroupStateTimeout.EventTimeTimeout`` fires the handler with
    ``state.hasTimedOut``, emitting the final open session and freeing
    its state). Only CLOSED sessions are emitted, exactly once.

    State: one fixed-width row per user with an open session; timers and
    the watermark bound both memory and emission latency. Cross-batch
    event-time regressions inside the allowed lateness merge into the
    open session by arrival order (the same contract as any incremental
    sessionizer); the watermark drops older ones.

    Timestamps are emitted as epoch millis (timezone-proof, matching the
    batch event-time queries)."""
    gap_ms = gap_minutes * 60_000

    def update(
        key: tuple[Any, ...], batches: Iterable[pd.DataFrame], state: GroupState
    ):
        (user_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            start_ms, last_ms, n, total = state.get
            state.remove()
            closed.append((user_id, start_ms, last_ms, n, total))
        else:
            cur = state.get if state.exists else None
            for pdf in batches:
                if not len(pdf):
                    continue
                pdf = pdf.sort_values("ts")
                ts_ms = pdf["ts"].values.astype("datetime64[ms]").astype("int64")
                vals = pdf["value"].astype(float).values
                for t, v in zip(ts_ms, vals):
                    if cur is None:
                        cur = (int(t), int(t), 1, float(v))
                    elif t - cur[1] >= gap_ms:
                        closed.append((user_id, *cur))
                        cur = (int(t), int(t), 1, float(v))
                    else:
                        # a LATE event (t < last) inside the allowed
                        # lateness merges without regressing the session
                        # bounds or the event-time timer
                        cur = (
                            min(cur[0], int(t)),
                            max(cur[1], int(t)),
                            cur[2] + 1,
                            cur[3] + float(v),
                        )
            if cur is not None:
                state.update(cur)
                # fire when the watermark passes the open session's gap end
                state.setTimeoutTimestamp(cur[1] + gap_ms)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_start_ms",
                    "session_end_ms",
                    "n_events",
                    "total_value",
                ],
            )

    return (
        events.select("user_id", "ts", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


try:  # Spark 4.x arbitrary-state API
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # the TransformWithState Python driver worker talks to the JVM state
    # server over protobuf — without the protobuf package the worker
    # crashes at init (measured: STREAMING_PYTHON_RUNNER_INITIALIZATION_
    # FAILURE, ImportError google.protobuf.descriptor), so availability
    # means BOTH the API and its wire dependency
    try:
        from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

        HAS_TRANSFORM_WITH_STATE = True
    except ImportError:
        HAS_TRANSFORM_WITH_STATE = False
except ImportError:  # pragma: no cover — Spark < 4.0 fallback
    StatefulProcessor = object
    HAS_TRANSFORM_WITH_STATE = False


class _RunningStatsProcessor(StatefulProcessor):
    """Same fold as _update, expressed as a StatefulProcessor with a
    single ValueState cell per user (fixed-width, O(distinct users))."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("stats", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values):
        if self._state.exists():
            n, total, mx = self._state.get()
        else:
            n, total, mx = 0, 0.0, float("-inf")
        for pdf in rows:
            vals = pdf["value"].dropna()
            n += len(pdf)
            total += float(vals.sum())
            if len(vals):
                mx = max(mx, float(vals.max()))
        self._state.update((n, total, mx))
        yield pd.DataFrame(
            [(key[0], n, total, mx if mx != float("-inf") else None)],
            columns=["user_id", "n_events", "total_value", "max_value"],
        )

    def close(self) -> None:
        pass


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """``running_user_stats`` on the transformWithState API (Spark 4.x) —
    the forward path for custom stateful operators: explicit state cells
    (ValueState here; List/MapState and timers are available for session
    logic), state-schema evolution, and the RocksDB provider requirement
    that also unlocks changelog checkpointing at cluster scale. Semantics
    are identical to the GroupState implementation; the session must set
    spark.sql.streaming.stateStore.providerClass to the RocksDB provider
    before starting the query."""
    if not HAS_TRANSFORM_WITH_STATE:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0 and the "
            "protobuf package (the state-server wire protocol)"
        )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_RunningStatsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
