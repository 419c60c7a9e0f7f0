"""Custom stateful streaming operator via applyInPandasWithState —
the north-star "custom stateful operator" surface.

Keeps a per-user running profile (event count, value sum, last event
time) across micro-batches; emits the updated profile each batch.
State is bounded per key; with a watermark upstream, expired keys are
timed out (here ``NoTimeout`` since local verification is one batch).

Scale notes: state lives in the executors' state store partitioned by
the grouping key — the same shuffle boundary as a groupBy. Arrow moves
each group's rows into pandas in batches; keep per-key state small
(a few scalars) so 100 M users fit the store.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id LONG, n_events LONG, total_value DOUBLE, last_ts TIMESTAMP"
)
STATE_SCHEMA = "n LONG, total DOUBLE, last_ts TIMESTAMP"


def _update_user_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, total, last_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_ts": [last_ts],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Stateful per-user profile over a stream of events."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
