"""Property-based check of the as-of join: against randomly generated
(key, ts) streams, the union+window implementation must agree with an
oracle computed row-by-row in plain Python (most recent right row with
r.ts <= l.ts; ties on ts broken by the largest payload struct, i.e.
largest id here).

One Spark job per example is slow, so the strategy generates a BATCH
of scenarios and runs them as one DataFrame — hypothesis explores the
space, Spark executes it in a handful of examples.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracle_to_cassandra_spark.operators.asof import asof_join

_KEYS = st.integers(min_value=0, max_value=3)
_TS = st.integers(min_value=0, max_value=20)

_SCENARIO = st.tuples(
    st.lists(st.tuples(_KEYS, _TS), min_size=1, max_size=12),   # left (key, ts)
    st.lists(st.tuples(_KEYS, _TS), min_size=0, max_size=12),   # right (key, ts)
)


def _expected(left, right):
    """Per left row: payload id of the latest right row at or before
    its ts (ties: max id), or None."""
    out = {}
    for li, (lk, lt) in enumerate(left):
        best = None
        for ri, (rk, rt) in enumerate(right):
            if rk == lk and rt <= lt:
                cand = (rt, ri)
                if best is None or cand > best:
                    best = cand
        out[li] = None if best is None else best[1]
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_SCENARIO)
def test_asof_join_matches_naive(spark, scenario):
    left_rows, right_rows = scenario
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        "l_id int, user_id int, ts int",
    ).selectExpr("l_id", "user_id", "timestamp_seconds(ts) AS ts")
    right = spark.createDataFrame(
        [(i, k, t, float(i)) for i, (k, t) in enumerate(right_rows)],
        "p_event_id int, user_id int, p_ts int, p_value double",
    ).selectExpr(
        "p_event_id", "user_id", "timestamp_seconds(p_ts) AS p_ts", "p_value"
    ).repartition(3)

    got = {
        r["l_id"]: r["asof_p_event_id"]
        for r in asof_join(
            left, right, "user_id", "ts", "p_ts", ["p_event_id", "p_value"]
        ).collect()
    }
    want = _expected(left_rows, right_rows)
    assert got == want
