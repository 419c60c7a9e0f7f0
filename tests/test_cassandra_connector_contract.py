"""Contract tests for the REAL spark-cassandra-connector path.

The test environment has neither the connector jar nor a Cassandra
cluster, so ``write_to_cassandra`` normally exercises only its
capability-probe failure (tests/test_sources_sinks.py).  These tests
pin the rest of the contract so a user who DOES add the jar gets the
documented mapping (reference README.md:839,967 — `df.write.format(
"org.apache.spark.sql.cassandra").options(keyspace=…, table=…)`):

1. ``connector_write_spec`` — the exact format/options/mode the save
   executes, asserted as data (needs no jar: the format string only
   resolves at ``save()`` time).
2. A jar-gated end-to-end write→read-back that runs whenever the
   connector IS on the classpath and ``CASSANDRA_CONTACT_POINTS`` is
   set; skipped (with the reason visible in the pytest report) here.
"""

from __future__ import annotations

import os

import pytest

from oracle_to_cassandra_spark.sinks import (
    CONNECTOR_FORMAT,
    CONNECTOR_PACKAGE,
    connector_available,
    connector_write_spec,
)


def test_write_spec_pins_the_documented_connector_mapping():
    spec = connector_write_spec("hr", "customer")
    # the DataSource v2 shortname the connector registers — the same
    # string the reference tutorial saves through
    assert spec["format"] == "org.apache.spark.sql.cassandra"
    assert spec["format"] == CONNECTOR_FORMAT
    # keyspace/table travel as writer OPTIONS (not path / saveAsTable)
    assert spec["options"] == {"keyspace": "hr", "table": "customer"}
    # Cassandra upserts: append is the idempotent default; overwrite
    # (TRUNCATE-then-load) must be an explicit opt-in
    assert spec["mode"] == "append"
    assert connector_write_spec("hr", "t", mode="overwrite")["mode"] == (
        "overwrite"
    )


def test_write_spec_rejects_blank_identifiers():
    with pytest.raises(ValueError):
        connector_write_spec("", "customer")
    with pytest.raises(ValueError):
        connector_write_spec("hr", "")


def test_connector_package_coordinate_shape():
    # what the error message tells users to add — keep it a valid
    # group:artifact Maven coordinate for spark.jars.packages
    group, artifact = CONNECTOR_PACKAGE.split(":")
    assert group == "com.datastax.spark"
    assert artifact.startswith("spark-cassandra-connector_")


def test_probe_is_consistent_with_error_path(spark):
    from oracle_to_cassandra_spark.sinks import write_to_cassandra

    df = spark.range(1).toDF("id")
    if connector_available(spark):
        pytest.skip("connector jar present: covered by the e2e test")
    with pytest.raises(RuntimeError, match=CONNECTOR_PACKAGE.split(":")[0]):
        write_to_cassandra(df, keyspace="hr", table="t")


@pytest.mark.skipif(
    "CASSANDRA_CONTACT_POINTS" not in os.environ,
    reason="no Cassandra cluster configured (set CASSANDRA_CONTACT_POINTS "
    f"and add {CONNECTOR_PACKAGE} to spark.jars.packages)",
)
def test_connector_roundtrip_end_to_end(spark):
    """The real-cluster contract: write through the connector, read
    back through the same format, and get the rows out — runs only
    when a cluster + jar are provisioned."""
    from oracle_to_cassandra_spark.sinks import write_to_cassandra

    if not connector_available(spark):
        pytest.fail(
            "CASSANDRA_CONTACT_POINTS set but connector jar missing — "
            f"add {CONNECTOR_PACKAGE} to spark.jars.packages"
        )
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id BIGINT, payload STRING"
    )
    write_to_cassandra(df, keyspace="sink_test", table="roundtrip")
    back = (
        spark.read.format(CONNECTOR_FORMAT)
        .options(keyspace="sink_test", table="roundtrip")
        .load()
    )
    assert back.count() >= 2
