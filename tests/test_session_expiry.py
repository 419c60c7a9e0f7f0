"""Timer-driven session expiry: unit tests for the vectorized session
folder plus the ms-knife-edge pin for the event-time timer boundary the
DuckDB oracle mirrors (fires iff floor_ms(last_ts) + gap_ms is STRICTLY
below floor_ms(max_ts) - wm_ms — probed empirically; if a Spark upgrade
shifts this, the boundary test fails before the differential sweep
flakes on a regenerated fixture)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from oracle_to_cassandra_spark.streaming.stateful import (
    SESSION_GAP_MIN,
    _as_ts,
    _fold_sessions,
    _int_sum,
    _update_user_profile,
)


def _ts(*vals):
    return pd.Series(
        pd.to_datetime(list(vals), format="mixed")
    ).reset_index(drop=True)


class TestStateHelpers:
    def test_as_ts_is_total_over_integer_like_micros(self):
        """Every integer-like physical type a state serializer could
        hand back must be read as MICROS: a bare pd.Timestamp(np.int64)
        interprets nanoseconds — timestamps ~1000x too early (r11
        ADVICE item 1)."""
        import numpy as np

        micros = 1_700_000_000_000_000  # 2023-11-14T22:13:20 UTC
        want = pd.Timestamp(micros, unit="us")
        for raw in (
            micros,
            float(micros),
            np.int64(micros),
            np.uint64(micros),
            np.float64(micros),
        ):
            assert _as_ts(raw) == want, type(raw)
        # non-integer paths unchanged
        assert _as_ts(want) == want
        assert _as_ts(want.to_pydatetime()) == want

    def test_int_sum_is_exact_with_nulls(self):
        """A NULL in the Arrow batch lands value_u in pandas as
        float64 + NaN; a float sum silently rounds above 2^53 —
        _int_sum must drop NaNs and sum in int64."""
        # each addend is individually exact in float64 (< 2^53) —
        # the realistic Arrow shape — but their float SUM lands on
        # 2^53 + 1, which float64 rounds to 2^53; int64 summation
        # keeps it exact
        a, b = (1 << 53) - 2, 3
        col = pd.Series([float(a), float(b), None], dtype="float64")
        assert int(col.sum()) != a + b  # the bug being guarded against
        assert _int_sum(col) == a + b
        assert _int_sum(pd.Series([None], dtype="float64")) == 0
        assert _int_sum(pd.Series([], dtype="float64")) == 0
        assert _int_sum(pd.Series([2, 3], dtype="int64")) == 5

    def test_profile_fold_second_batch_with_datetime_state(self):
        """Multi-batch regression: applyInPandasWithState returns the
        stored last_ts as datetime.datetime; the max() against the new
        batch must not compare datetime vs Timestamp incorrectly and
        the emitted row must carry the later instant."""
        import datetime as dt

        class _FakeState:
            exists = True
            get = (2, 5_000_000, dt.datetime(2024, 1, 1, 10, 20))

            def update(self, v):
                self.updated = v

        st = _FakeState()
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime(["2024-01-01 10:05"]),
                "value_u": pd.Series([1_500_000], dtype="int64"),
            }
        )
        (out,) = list(_update_user_profile((7,), [pdf], st))
        assert out["n_events"].iloc[0] == 3
        assert out["total_value_c"].iloc[0] == 650  # 6.5e6 micro → cents
        assert out["last_ts"].iloc[0] == pd.Timestamp("2024-01-01 10:20")


class TestFoldSessions:
    def test_single_session_no_state(self):
        closed, open_sess = _fold_sessions(
            _ts("2024-01-01 10:00", "2024-01-01 10:10"), None, 7
        )
        assert closed == []
        assert open_sess == (
            pd.Timestamp("2024-01-01 10:00"), pd.Timestamp("2024-01-01 10:10"), 2
        )

    def test_gap_splits_and_ties_do_not(self):
        closed, open_sess = _fold_sessions(
            _ts(
                "2024-01-01 10:00", "2024-01-01 10:00",  # tie: same session
                "2024-01-01 10:30",                      # exactly gap: stays
                "2024-01-01 11:00:00.000001",            # gap exceeded: splits
            ),
            None,
            7,
        )
        assert closed == [
            (7, pd.Timestamp("2024-01-01 10:00"),
             pd.Timestamp("2024-01-01 10:30"), 3, "gap")
        ]
        assert open_sess[2] == 1

    def test_state_continues_session(self):
        state = (pd.Timestamp("2024-01-01 09:50"),
                 pd.Timestamp("2024-01-01 09:55"), 4)
        closed, open_sess = _fold_sessions(
            _ts("2024-01-01 10:10"), state, 7
        )
        assert closed == []
        # merged: start from state, count 4+1
        assert open_sess == (
            pd.Timestamp("2024-01-01 09:50"), pd.Timestamp("2024-01-01 10:10"), 5
        )

    def test_state_closed_by_new_batch(self):
        state = (pd.Timestamp("2024-01-01 08:00"),
                 pd.Timestamp("2024-01-01 08:05"), 2)
        closed, open_sess = _fold_sessions(
            _ts("2024-01-01 10:00"), state, 7
        )
        assert closed == [
            (7, pd.Timestamp("2024-01-01 08:00"),
             pd.Timestamp("2024-01-01 08:05"), 2, "gap")
        ]
        assert open_sess[2] == 1

    def test_state_as_datetime_objects_still_folds_and_times(self):
        """applyInPandasWithState hands state TIMESTAMPs back as
        ``datetime.datetime`` (pickled via to_pydatetime) — the fold
        must normalize them so the merged open session supports the
        ``.value`` timer arithmetic (regression: AttributeError on
        the SECOND micro-batch of any key whose batch events all land
        at/inside the open session's span)."""
        import datetime as dt

        state = (dt.datetime(2024, 1, 1, 10, 0),
                 dt.datetime(2024, 1, 1, 10, 20), 3)
        # duplicate-ts straggler AT the open session's last_ts: the
        # merged end is the STATE's value, the exact crash shape
        closed, open_sess = _fold_sessions(
            _ts("2024-01-01 10:20"), state, 7
        )
        assert closed == []
        assert open_sess == (
            pd.Timestamp("2024-01-01 10:00"),
            pd.Timestamp("2024-01-01 10:20"), 4,
        )
        assert isinstance(open_sess[1], pd.Timestamp)
        # the timer expression the processors run on open_sess[1]
        assert int(open_sess[1].value // 1_000_000) > 0

    def test_state_as_int_micros_still_folds(self):
        """transformWithState's ValueState serializes TIMESTAMP state
        via schema.toInternal (int64 micros) and returns the bare ints
        on get() — the fold must accept them (regression: TypeError
        comparing int vs Timestamp on the first multi-batch key)."""
        base = pd.Timestamp("2024-01-01 10:00")
        state = (base.value // 1000, (base + pd.Timedelta(minutes=20)).value // 1000, 3)
        closed, open_sess = _fold_sessions(
            _ts("2024-01-01 10:25"), state, 7
        )
        assert closed == []
        assert open_sess == (
            pd.Timestamp("2024-01-01 10:00"),
            pd.Timestamp("2024-01-01 10:25"), 4,
        )
        assert isinstance(open_sess[0], pd.Timestamp)

    def test_out_of_order_merge_keeps_extremes(self):
        # a late-but-in-gap event older than the open session's last_ts
        state = (pd.Timestamp("2024-01-01 10:00"),
                 pd.Timestamp("2024-01-01 10:20"), 3)
        closed, open_sess = _fold_sessions(
            _ts("2024-01-01 10:10"), state, 7
        )
        assert closed == []
        assert open_sess == (
            pd.Timestamp("2024-01-01 10:00"), pd.Timestamp("2024-01-01 10:20"), 4
        )


@pytest.fixture(scope="module")
def boundary_dir(tmp_path_factory):
    """Events engineered around the exact timer boundary: max ts
    2024-01-01 12:00:00.000500 → final watermark floor_ms = 11:50:00.000;
    a 30-min-gap timer from a session ending at 11:20:00.000xxx lands
    exactly ON the watermark (must NOT fire), at 11:19:59.999xxx lands
    1 ms below (must fire)."""
    import duckdb

    d = tmp_path_factory.mktemp("sess_boundary")
    con = duckdb.connect()
    con.execute(f"""
    COPY (
      SELECT * FROM (VALUES
        (1::BIGINT, TIMESTAMP '2024-01-01 11:20:00.000500', 1::BIGINT, 'view', 1.0, 'p'),
        (2::BIGINT, TIMESTAMP '2024-01-01 11:20:00.001500', 2::BIGINT, 'view', 1.0, 'p'),
        (3::BIGINT, TIMESTAMP '2024-01-01 11:19:59.999500', 3::BIGINT, 'view', 1.0, 'p'),
        (4::BIGINT, TIMESTAMP '2024-01-01 11:20:00.000999', 4::BIGINT, 'view', 1.0, 'p'),
        (5::BIGINT, TIMESTAMP '2024-01-01 11:20:00.000001', 5::BIGINT, 'view', 1.0, 'p'),
        (9::BIGINT, TIMESTAMP '2024-01-01 12:00:00.000500', 9::BIGINT, 'view', 1.0, 'p')
      ) t(event_id, ts, user_id, event_type, value, props)
    ) TO '{d}/events.parquet' (FORMAT PARQUET)
    """)
    return str(d)


def test_timer_boundary_is_ms_floored_strict_less(spark, boundary_dir):
    from oracle_to_cassandra_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
    )
    from oracle_to_cassandra_spark.streaming.stateful import (
        session_expiry_stream,
    )

    out = run_stream_to_memory(
        session_expiry_stream(read_events_stream(spark, boundary_dir)),
        output_mode="append",
    )
    fired = sorted(
        r.user_id for r in out.filter("closed_by = 'timer'").collect()
    )
    # only user 3 (timer_ms 11:49:59.999 < wm 11:50:00.000); users 1/4/5
    # floor to exactly the watermark and 2 floors past it
    assert fired == [3]
    assert out.filter("closed_by = 'gap'").count() == 0


def test_oracle_mirrors_boundary(boundary_dir):
    import duckdb

    import __spark_entry__ as E

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{boundary_dir}/events.parquet')"
    )
    rows = con.execute(
        E.oracle_sql()["stream_session_expiry_timers"]
    ).fetchall()
    timer_users = sorted(r[0] for r in rows if r[4] == "timer")
    assert timer_users == [3]
    assert SESSION_GAP_MIN == 30  # fixture arithmetic assumes 30/10


class TestFoldSessionsOrderRobust:
    """The r10 interval-sweep rewrite: out-of-order-across-batch
    events landing anywhere relative to the open session must merge
    exactly (not just at the batch head — the pre-r10 fold's hidden
    precondition)."""

    def test_interleaved_in_span_events_do_not_split(self):
        # open session spans [10:00, 12:00]; the batch carries two
        # events INSIDE that span, >gap apart from each other — the
        # head-only merge closed [10:00,12:00] and spuriously opened
        # a new session at the second event
        state = (pd.Timestamp("2024-01-01 10:00"),
                 pd.Timestamp("2024-01-01 12:00"), 9)
        closed, open_sess = _fold_sessions(
            _ts("2024-01-01 10:20", "2024-01-01 11:40"), state, 7
        )
        assert closed == []
        assert open_sess == (
            pd.Timestamp("2024-01-01 10:00"),
            pd.Timestamp("2024-01-01 12:00"), 11,
        )

    def test_stale_group_before_open_session_closes_separately(self):
        # a batch group ending >gap before the open session START must
        # close on its own — the head-only merge glued it into the
        # open session through last_ts
        state = (pd.Timestamp("2024-01-01 10:00"),
                 pd.Timestamp("2024-01-01 12:00"), 3)
        closed, open_sess = _fold_sessions(
            _ts("2024-01-01 08:00", "2024-01-01 08:10"), state, 7
        )
        assert closed == [
            (7, pd.Timestamp("2024-01-01 08:00"),
             pd.Timestamp("2024-01-01 08:10"), 2, "gap")
        ]
        assert open_sess == (
            pd.Timestamp("2024-01-01 10:00"),
            pd.Timestamp("2024-01-01 12:00"), 3,
        )

    def test_backward_extension_chains_through_gap(self):
        # two batch groups each within gap of the NEXT interval but
        # not of last_ts directly: 09:10 <-25min-> 09:35 <-25min->
        # state start 10:00; the sweep must chain-merge all three
        state = (pd.Timestamp("2024-01-01 10:00"),
                 pd.Timestamp("2024-01-01 10:30"), 2)
        closed, open_sess = _fold_sessions(
            _ts("2024-01-01 09:10", "2024-01-01 09:35"), state, 7
        )
        assert closed == []
        assert open_sess == (
            pd.Timestamp("2024-01-01 09:10"),
            pd.Timestamp("2024-01-01 10:30"), 4,
        )


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    _minutes = st.lists(
        st.integers(min_value=0, max_value=24 * 60), min_size=1,
        max_size=40,
    )

    def _series(mins):
        base = pd.Timestamp("2024-01-01")
        return pd.Series(
            sorted(base + pd.Timedelta(minutes=m) for m in mins)
        ).reset_index(drop=True)

    def _brute_sessions(mins):
        """Independent reference: O(n) loop over sorted minutes."""
        out = []
        for m in sorted(mins):
            if out and m - out[-1][1] <= SESSION_GAP_MIN:
                out[-1][1] = max(out[-1][1], m)
                out[-1][2] += 1
            else:
                out.append([m, m, 1])
        return [tuple(s) for s in out]

    class TestFoldSessionsProperties:
        @settings(max_examples=200, deadline=None)
        @given(_minutes)
        def test_matches_brute_force_without_state(self, mins):
            closed, open_sess = _fold_sessions(_series(mins), None, 1)
            got = [
                (int((s - pd.Timestamp("2024-01-01")).total_seconds() // 60),
                 int((e - pd.Timestamp("2024-01-01")).total_seconds() // 60),
                 n)
                for (_, s, e, n, _) in closed
            ] + [(
                int((open_sess[0] - pd.Timestamp("2024-01-01"))
                    .total_seconds() // 60),
                int((open_sess[1] - pd.Timestamp("2024-01-01"))
                    .total_seconds() // 60),
                open_sess[2],
            )]
            assert got == _brute_sessions(mins)

        @settings(max_examples=200, deadline=None)
        @given(_minutes, st.integers(0, 24 * 60), st.integers(0, 90),
               st.integers(1, 50))
        def test_invariants_with_state(self, mins, s_start_min, span, n):
            state = (
                pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=s_start_min),
                pd.Timestamp("2024-01-01")
                + pd.Timedelta(minutes=s_start_min + span),
                n,
            )
            closed, open_sess = _fold_sessions(_series(mins), state, 1)
            sessions = [(s, e, c) for (_, s, e, c, _) in closed] + [
                tuple(open_sess)
            ]
            # count conservation
            assert sum(c for (_, _, c) in sessions) == len(mins) + n
            # well-formed, chronologically ordered, gap-separated
            gap = pd.Timedelta(minutes=SESSION_GAP_MIN)
            for s, e, c in sessions:
                assert s <= e and c >= 1
            for (s1, e1, _), (s2, e2, _) in zip(sessions, sessions[1:]):
                assert s2 - e1 > gap
            # every input instant (batch + state bounds) is inside
            # exactly one session
            instants = [_series(mins).iloc[i] for i in range(len(mins))]
            instants += [state[0], state[1]]
            for t in instants:
                assert sum(1 for s, e, _ in sessions if s <= t <= e) == 1
