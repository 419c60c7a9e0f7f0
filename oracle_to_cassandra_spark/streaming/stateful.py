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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id LONG, n_events LONG, total_value_c LONG, last_ts TIMESTAMP"
)
STATE_SCHEMA = "n LONG, total_u LONG, last_ts TIMESTAMP"


def _int_sum(col: "pd.Series") -> int:
    """Exact int64 sum of a JVM-quantized micro-unit column. A NULL
    anywhere in the Arrow batch lands the column in pandas as float64
    + NaN, and ``int(float_series.sum())`` silently rounds once the
    running total passes 2^53 — so drop the NaNs and restore int64
    BEFORE summing (empty-after-drop sums to exact 0, matching the
    oracles' ``coalesce(sum(...), 0)``)."""
    return int(col.dropna().astype("int64").sum())


def _as_ts(x) -> "pd.Timestamp":
    """Normalize a state-store timestamp to ``pd.Timestamp``.

    The two stateful APIs hand back different physical types for a
    TIMESTAMP state column: ``applyInPandasWithState`` pickles the
    value through ``to_pydatetime`` (returns ``datetime.datetime`` —
    which has no ``.value``), and ``transformWithState``'s ValueState
    serializes via ``schema.toInternal`` (returns bare int64 MICROS
    with no ``fromInternal`` on read). Folding everything to
    pd.Timestamp at the state boundary keeps the session algebra
    (interval sweep, ``.value`` timer arithmetic, TIMESTAMP output
    columns) correct on every path.

    The integer guard must be TOTAL over integer-like types: a bare
    ``pd.Timestamp(np.int64(...))`` interprets the value as
    NANOseconds, landing timestamps ~1000× too early. The current
    TWS path hands back Python ints (``schema.toInternal``), so the
    numpy branch is latent — but a future serializer returning
    ``np.int64`` micros must not silently change units (r11 ADVICE
    item 1)."""
    if isinstance(x, (int, float, np.integer, np.floating)):
        return pd.Timestamp(int(x), unit="us")
    return pd.Timestamp(x)


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
        total_u += _int_sum(pdf["value_u"])
        batch_max = pdf["ts"].max()
        last_ts = (
            batch_max if last_ts is None else max(_as_ts(last_ts), batch_max)
        )
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
            total_u += _int_sum(pdf["value_u"])
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
    try:
        # import the concrete module, not find_spec: a namespace-only
        # or partial google.protobuf install returns a spec but still
        # crashes the TWS state server at init
        # (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE) — the probe
        # must fail exactly when the runner would
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
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
        total_u += _int_sum(pdf["value_u"])
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


SESSION_OUTPUT_SCHEMA = (
    "user_id LONG, session_start TIMESTAMP, session_end TIMESTAMP, "
    "n_events LONG, closed_by STRING"
)

#: gap that separates two sessions (strictly greater closes)
SESSION_GAP_MIN = 30

#: watermark delay for the session-expiry stream
SESSION_WM_MIN = 10


def _fold_sessions(
    ts: "pd.Series", state: tuple | None, user_id: int
) -> tuple[list[tuple], tuple]:
    """Merge a sorted batch of event times into the open session from
    ``state`` (``(s_start, last_ts, n)`` or None): returns the list of
    GAP-CLOSED session rows and the new open-session state.

    Vectorized (diff > gap → cumsum → groupby agg), so a hot key with
    100k events in one batch costs a few pandas array ops, not a
    Python-level loop per event (skew-stress safety).

    ORDER-ROBUST state merge: the open session is folded in as an
    interval ``[s_start, last_ts]`` and merged with the batch's
    gap-groups by a gap-tolerant interval sweep, not by checking only
    the batch head. This is exact even for out-of-order-across-batch
    events landing INSIDE the open session's span: a session whose
    internal gaps are all <= gap has no point in its span farther
    than gap from some member event, so span-overlap (extended by
    gap on both sides) IS membership. Under the query's watermark
    such stragglers are dropped upstream anyway — the sweep removes
    the hidden ordering precondition rather than relying on it."""
    gap = pd.Timedelta(minutes=SESSION_GAP_MIN)
    sid = (ts.diff() > gap).cumsum()
    g = ts.groupby(sid)
    intervals = list(
        zip(g.min().tolist(), g.max().tolist(),
            (int(c) for c in g.size().tolist()))
    )
    if state is not None:
        s_start, last_ts, n = state
        # normalize at the state boundary: AIPWS returns datetime,
        # TWS ValueState returns int64 micros — both lack the
        # pd.Timestamp algebra the sweep and timer math rely on
        intervals.append((_as_ts(s_start), _as_ts(last_ts), int(n)))
        intervals.sort(key=lambda iv: (iv[0], iv[1]))
    merged = [intervals[0]]
    for s, e, c in intervals[1:]:
        m_start, m_end, m_n = merged[-1]
        if s - m_end <= gap:
            merged[-1] = (m_start, max(m_end, e), m_n + c)
        else:
            merged.append((s, e, c))
    closed = [(user_id, s, e, c, "gap") for s, e, c in merged[:-1]]
    return closed, merged[-1]


class SessionExpiryProcessor(StatefulProcessor):
    """Timer-driven session expiry on the Spark 4 ``transformWithState``
    API: per-user sessions close EITHER when a successor event arrives
    more than ``SESSION_GAP_MIN`` after the session's last event
    (``closed_by='gap'``) OR when the event-time watermark passes
    last_ts + gap with no successor — an EXPIRY TIMER registered via
    ``handle.registerTimer`` and delivered to ``handleExpiredTimer``
    (``closed_by='timer'``). The timer is how a 100 TB clickstream
    flushes dormant sessions without waiting for the user to return:
    state for a quiet key is emitted and dropped the moment the
    watermark proves no in-gap event can still arrive.

    Local runs capability-dispatch to the applyInPandasWithState twin
    (``_session_expiry_fallback`` — EventTimeTimeout +
    ``setTimeoutTimestamp``, the pre-4.x spelling of the same timer).
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState(
            "sess", "s_start TIMESTAMP, last_ts TIMESTAMP, n LONG"
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        parts = [pdf["ts"] for pdf in rows if len(pdf)]
        if not parts:
            return
        ts = pd.concat(parts).sort_values().reset_index(drop=True)
        state = self._sess.get() if self._sess.exists() else None
        closed, open_sess = _fold_sessions(ts, state, user_id)
        self._sess.update(open_sess)
        # (re-)arm the expiry timer at last_ts + gap; clear any stale one
        for old in self._handle.listTimers():
            self._handle.deleteTimer(old)
        self._handle.registerTimer(
            int(open_sess[1].value // 1_000_000) + SESSION_GAP_MIN * 60_000
        )
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_start", "session_end",
                    "n_events", "closed_by",
                ],
            )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        (user_id,) = key
        if self._sess.exists():
            s_start, last_ts, n = self._sess.get()
            self._sess.clear()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    # _as_ts: ValueState hands TIMESTAMP columns back
                    # as raw int64 micros (toInternal with no
                    # fromInternal on read) — emit real timestamps
                    "session_start": [_as_ts(s_start)],
                    "session_end": [_as_ts(last_ts)],
                    "n_events": [int(n)],
                    "closed_by": ["timer"],
                }
            )

    def close(self) -> None:
        pass


def _session_expiry_fallback(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """applyInPandasWithState twin of SessionExpiryProcessor: the
    expiry timer is ``GroupStateTimeout.EventTimeTimeout`` +
    ``state.setTimeoutTimestamp(last_ts + gap)`` — fired as a
    ``state.hasTimedOut`` call with no input rows once the watermark
    passes that instant."""
    (user_id,) = key
    cols = ["user_id", "session_start", "session_end", "n_events", "closed_by"]
    if state.hasTimedOut:
        s_start, last_ts, n = state.get
        state.remove()
        yield pd.DataFrame(
            [(user_id, s_start, last_ts, n, "timer")], columns=cols
        )
        return
    parts = [pdf["ts"] for pdf in pdfs if len(pdf)]
    if not parts:
        return
    ts = pd.concat(parts).sort_values().reset_index(drop=True)
    prev = tuple(state.get) if state.exists else None
    closed, open_sess = _fold_sessions(ts, prev, user_id)
    state.update(open_sess)
    state.setTimeoutTimestamp(
        int(open_sess[1].value // 1_000_000) + SESSION_GAP_MIN * 60_000
    )
    if closed:
        yield pd.DataFrame(closed, columns=cols)


def session_expiry_stream(events: DataFrame) -> DataFrame:
    """Per-user session close events (gap- and timer-closed) over a
    watermarked event stream. Primary path: Spark 4 transformWithState
    timers; fallback: applyInPandasWithState EventTimeTimeout."""
    keyed = (
        events.select("user_id", "ts")
        .withWatermark("ts", f"{SESSION_WM_MIN} minutes")
        .groupBy("user_id")
    )
    if _tws_available():
        return keyed.transformWithStateInPandas(
            SessionExpiryProcessor(),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    return keyed.applyInPandasWithState(
        _session_expiry_fallback,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType="s_start TIMESTAMP, last_ts TIMESTAMP, n LONG",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
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
