from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from oracle_to_cassandra_spark.session import get_spark

    s = get_spark(app_name="oracle_to_cassandra_spark-tests", cpus=8)
    yield s
    s.stop()


def make_duckdb(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Mirror the driver's oracle setup: each table pre-registered as a
    view over its parquet file."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def duck():
    con = make_duckdb(SF_DIR)
    yield con
    con.close()
