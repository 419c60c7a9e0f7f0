"""Testdata-drift guard: assert the PHYSICAL parquet schemas of the
driver-generated tables match FIXTURES.md §B.

Round 4 lost 13 driver-correctness rows because ``events.ts`` silently
changed from parquet timestamp[ns] to timestamp[us] between testdata
generations and the loader assumed the old type. These checks use
pyarrow (no Spark session — they run in milliseconds, before any
engine code) so a regenerated testdata directory fails HERE first,
with a message naming the drifted column, instead of surfacing as 13
cryptic AnalysisExceptions in the driver's correctness run.

If a type here changes intentionally, update FIXTURES.md §B and audit
``sources/parquet.py::load_table`` / ``streaming/core.py`` — both
dispatch on the read type for ``events.ts`` specifically.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

# column -> acceptable pyarrow type strings, per FIXTURES.md §B.
# events.ts accepts the two generations the loader is built to handle.
_EXPECTED = {
    "region": {
        "r_regionkey": {"int32", "int64"},
        "r_name": {"string", "large_string"},
    },
    "nation": {
        "n_nationkey": {"int32", "int64"},
        "n_name": {"string", "large_string"},
        "n_regionkey": {"int32", "int64"},
    },
    "customer": {"c_custkey": {"int64"}, "c_acctbal": {"double"}},
    "supplier": {"s_suppkey": {"int64"}, "s_nationkey": {"int32", "int64"}},
    "part": {"p_partkey": {"int64"}, "p_retailprice": {"double"}},
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[ms]", "timestamp[us]", "timestamp[ns]"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_shipdate": {"timestamp[ms]", "timestamp[us]", "timestamp[ns]"},
    },
    "events": {
        "event_id": {"int64"},
        "ts": {"timestamp[us]", "timestamp[ns]", "int64"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<item: float>", "list<element: float>"},
        "label": {"int32", "int64"},
    },
}


@pytest.mark.parametrize("table", sorted(_EXPECTED))
def test_physical_schema_matches_fixtures(table):
    schema = pq.read_schema(f"{SF_DIR}/{table}.parquet")
    names = set(schema.names)
    for col, allowed in _EXPECTED[table].items():
        assert col in names, (
            f"TESTDATA DRIFT: {table}.parquet lost column '{col}' "
            f"(has: {sorted(names)}) — update FIXTURES.md §B and the loaders"
        )
        actual = str(schema.field(col).type)
        assert actual in allowed, (
            f"TESTDATA DRIFT: {table}.{col} is physically '{actual}', "
            f"expected one of {sorted(allowed)} per FIXTURES.md §B — "
            "audit sources/parquet.py::load_table and streaming/core.py "
            "before trusting any events-based query"
        )


def test_events_ts_loads_as_timestamp(spark):
    """End-to-end: whatever the physical type, the loader must hand
    every query a TimestampType ts whose values sit in the documented
    2024-01 domain (a mis-dispatch reads the µs int64 as nanos and
    lands everything in 1970)."""
    from pyspark.sql import types as T

    from oracle_to_cassandra_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType), (
        f"loader produced {ev.schema['ts'].dataType}, want TimestampType"
    )
    import pyspark.sql.functions as F

    row = ev.agg(
        F.min(F.year("ts")).alias("lo"), F.max(F.year("ts")).alias("hi")
    ).first()
    assert 2020 <= row["lo"] <= row["hi"] <= 2030, (
        f"event years [{row['lo']}, {row['hi']}] outside the documented "
        "domain — ts was probably misinterpreted (1970 = epoch misread)"
    )
