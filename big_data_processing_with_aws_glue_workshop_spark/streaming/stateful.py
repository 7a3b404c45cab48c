"""Custom stateful streaming operator via applyInPandasWithState.

``running_user_stats`` keeps (n_events, total_value, max_value) per user in
managed state across micro-batches and emits the updated running totals
whenever the user receives events — the arbitrary-stateful pattern
(GroupState) the built-in window aggregations can't express, e.g. lifetime
counters, per-entity CUSUM/anomaly scores, or custom session logic.

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
