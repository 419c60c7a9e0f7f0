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
