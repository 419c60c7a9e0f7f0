"""The highest-value test: every registered query runs against its
DuckDB oracle at sf0.001 — a local replica of the driver's t2 gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from tests.compare import compare_query
from tests.conftest import SF_DIR


def _names():
    return sorted(E.queries().keys())


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_every_query_has_callable_shape():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert qs, "no queries registered"
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracle_sql keys without queries: {unknown}"


def test_driver_window_is_exactly_the_staged_fifty():
    """The driver verifies the FIRST 50 entries of ``queries()``; the
    r9 ADVICE off-by-one (a claimed 50-window spanning 51 names) must
    be structurally impossible: the explicit ``_WINDOW`` tuple IS the
    first 50 iteration order, every window/queue name is registered,
    and the two never overlap."""
    from oracle_to_cassandra_spark import registry

    names = list(E.queries())
    assert len(registry._WINDOW) == registry.DRIVER_WINDOW == 50
    assert names[: registry.DRIVER_WINDOW] == list(registry._WINDOW)
    assert not set(registry._WINDOW) & set(registry._QUEUE)
    assert set(registry._QUEUE) <= set(names)


def test_reorder_rejects_duplicate_window_names(monkeypatch):
    """A duplicate inside _WINDOW passes the length check but dedups
    at dict insertion, silently pulling the queue head into slot 50 —
    _reorder must reject it at import time, not leave it to pytest."""
    import pytest

    from oracle_to_cassandra_spark import registry

    dup = list(registry._WINDOW)
    dup[-1] = dup[0]
    monkeypatch.setattr(registry, "_WINDOW", tuple(dup))
    with pytest.raises(ValueError, match="duplicate names in _WINDOW"):
        registry._reorder()


def test_rotation_matches_the_evidence_ledger():
    """The registry's rotation comments make arithmetic claims about
    driver-evidence freshness ("44 r2-stale rows", "the r11 queue is
    exactly the r4-stale tail") — the kind of claim the r9 ADVICE
    caught drifting from reality. Derive freshness from the actual
    ``CORRECTNESS_r*.json`` ledger and assert the structural
    invariants, so the claims can never silently rot:

    * every registered query NOT in the current window has a green
      driver row from round 4 or later (no forgotten stale strays);
    * the staged ``_QUEUE`` is exactly the live queries whose
      freshest evidence is the oldest remaining round.

    Both invariants survive the driver landing a new CORRECTNESS
    file (window rows then carry the new round, leaving the queue as
    the oldest tail until the next rotation edits both tuples)."""
    import glob
    import json
    import os
    import re

    from oracle_to_cassandra_spark import registry

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fresh: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        # basename first: an r-digit run in the checkout PATH (e.g.
        # /home/user/r2/repo) must not shadow the filename round
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for q, row in json.load(open(f)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
            ):
                fresh[q] = max(rnd, fresh.get(q, 0))
    assert fresh, "no CORRECTNESS ledger files found"

    live = set(E.queries())
    window = set(registry._WINDOW)
    # a live query with NO ledger row at all (registered but never
    # rotated into any window) is the worst stray — it would be
    # invisible to the freshness checks below, which only see names
    # present in `fresh`
    unverified = sorted(live - window - set(fresh))
    assert not unverified, (
        f"live queries with zero driver evidence outside the window "
        f"(rotate them in): {unverified}"
    )
    outside = {q: r for q, r in fresh.items() if q in live - window}
    strays = sorted(q for q, r in outside.items() if r < 4)
    assert not strays, (
        f"live queries outside the window with pre-r4 evidence "
        f"(rotate them in): {strays}"
    )
    oldest = min(outside.values())
    stalest_tail = {q for q, r in outside.items() if r == oldest}
    assert stalest_tail <= set(registry._QUEUE), (
        f"stalest live rows (r{oldest}) missing from the staged "
        f"queue: {sorted(stalest_tail - set(registry._QUEUE))}"
    )


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, name):
    qs = E.queries()
    oracles = E.oracle_sql()
    df = qs[name](spark, SF_DIR)
    if name not in oracles:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        return
    # the driver's pandas-based hasher cannot hash nested cells —
    # an oracled query returning array/map/struct would pass the local
    # tuple-izing compare but fail the real gate (bit us in round 1)
    from pyspark.sql.types import ArrayType, MapType, StructType

    nested = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not nested, f"{name}: nested output columns {nested} break the driver hasher"
    compare_query(df, duck, oracles[name], name=name)
