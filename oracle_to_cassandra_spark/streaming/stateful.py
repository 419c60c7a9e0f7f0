"""Custom stateful streaming operator via applyInPandasWithState —
the north-star "custom stateful operator" surface.

Keeps a per-user running profile (event count, value sum, last event
time) across micro-batches; emits the updated profile each batch.
State is bounded per key; with a watermark upstream, expired keys are
timed out (here ``NoTimeout`` since local verification is one batch).

Exactness: the value column is quantized to int64 MICRO-units in the
JVM (``F.round(value*1e6)`` — the same expression the batch twins and
DuckDB oracles run) BEFORE crossing the Arrow boundary, so the Python
side only ever sums integers. A pandas ``.round()`` here would be
half-to-EVEN while SQL round is half-away — a rounding-mode mismatch
inside the exactnum contract. Totals are emitted as integer CENTS
(truncating int division, matching Spark ``div`` / DuckDB ``//``),
never as a final float round.

Scale notes: state lives in the executors' state store partitioned by
the grouping key — the same shuffle boundary as a groupBy. Arrow moves
each group's rows into pandas in batches; keep per-key state small
(a few scalars) so 100 M users fit the store.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id LONG, n_events LONG, total_value_c LONG, last_ts TIMESTAMP"
)
STATE_SCHEMA = "n LONG, total_u LONG, last_ts TIMESTAMP"


def _micro_to_cents(total_u: int) -> int:
    """micro-units → cents with truncation toward zero — the exact
    semantics of Spark ``div`` and DuckDB ``//`` (verified: both give
    -7÷2 → -3), so the Python emission matches the SQL twins even for
    negative running totals."""
    q = abs(total_u) // 10_000
    return q if total_u >= 0 else -q


def _quantized(events: DataFrame) -> DataFrame:
    """JVM-side micro-unit quantization — identical expression to the
    batch twins/oracles, so the Arrow boundary carries exact int64."""
    return events.withColumn(
        "value_u", F.round(F.col("value") * 1000000).cast("long")
    )


def _update_user_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, total_u, last_ts = state.get if state.exists else (0, 0, None)
    for pdf in pdfs:
        n += len(pdf)
        # exact int64 sum of JVM-quantized micro-units: independent of
        # batch slicing, accumulation order, and pandas rounding modes
        total_u += int(pdf["value_u"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, total_u, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value_c": [_micro_to_cents(total_u)],
            "last_ts": [last_ts],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Stateful per-user profile over a stream of events."""
    return (
        _quantized(events).select("user_id", "ts", "value_u")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- transformWithStateInPandas (Spark 4 arbitrary-state API) ---------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

TWS_OUTPUT_SCHEMA = (
    "user_id LONG, n_events LONG, total_value_c LONG, n_event_types LONG"
)


class UserActivityProcessor(StatefulProcessor):
    """Per-user activity profile on the Spark 4 ``transformWithState``
    API — the successor to ``applyInPandasWithState`` above, with
    TYPED state primitives instead of one opaque tuple: a ValueState
    for the scalar running aggregate and a MapState keyed by
    event_type for the per-type tally (on a cluster each is a
    separate RocksDB column family, so the map grows per-key without
    rewriting the scalar state).

    Emits the CUMULATIVE profile for every key touched in a batch;
    the consumer keeps the row with the highest n_events per key,
    which makes the final answer independent of how the file source
    slices micro-batches (cumulative state is monotone in n_events).
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", "n LONG, total_u LONG")
        self._by_type = handle.getMapState("by_type", "t STRING", "c LONG")

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        n, total_u = self._agg.get() if self._agg.exists() else (0, 0)
        for pdf in rows:
            n += len(pdf)
            total_u += int(pdf["value_u"].sum())
            for t, c in pdf["event_type"].value_counts().items():
                prev = (
                    self._by_type.getValue((t,))[0]
                    if self._by_type.containsKey((t,))
                    else 0
                )
                self._by_type.updateValue((t,), (prev + int(c),))
        self._agg.update((n, total_u))
        n_types = sum(1 for _ in self._by_type.keys())
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value_c": [_micro_to_cents(total_u)],
                "n_event_types": [n_types],
            }
        )

    def close(self) -> None:
        pass


def _tws_available() -> bool:
    """transformWithStateInPandas runs a protobuf-based state server
    between the JVM and the Python worker; without the ``protobuf``
    package the worker crashes at init. Capability-probe it."""
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # parent "google" namespace absent
        return False


def _update_user_activity_fallback(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """applyInPandasWithState twin of UserActivityProcessor — same
    cumulative emission contract (monotone n_events), with the typed
    MapState flattened into an ARRAY<STRING> of seen event types."""
    (user_id,) = key
    n, total_u, types = state.get if state.exists else (0, 0, [])
    seen = set(types)
    for pdf in pdfs:
        n += len(pdf)
        total_u += int(pdf["value_u"].sum())
        seen.update(pdf["event_type"].dropna().unique().tolist())
    state.update((n, total_u, sorted(seen)))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value_c": [_micro_to_cents(total_u)],
            "n_event_types": [len(seen)],
        }
    )


def user_activity_tws_stream(events: DataFrame) -> DataFrame:
    """Stateful per-user activity profile. Primary path is the Spark 4
    ``transformWithStateInPandas`` API (typed ValueState + MapState);
    when the protobuf dependency its state server needs is absent the
    SAME cumulative-emission semantics run on applyInPandasWithState,
    so the output contract (and the DuckDB oracle that checks it) is
    identical on both paths."""
    keyed = (
        _quantized(events)
        .select("user_id", "event_type", "value_u")
        .groupBy("user_id")
    )
    if _tws_available():
        return keyed.transformWithStateInPandas(
            UserActivityProcessor(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    return keyed.applyInPandasWithState(
        _update_user_activity_fallback,
        outputStructType=TWS_OUTPUT_SCHEMA,
        stateStructType="n LONG, total_u LONG, types ARRAY<STRING>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
