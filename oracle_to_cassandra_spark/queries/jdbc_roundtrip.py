"""JDBC end-to-end round-trip (S1–S3) against an EMBEDDED Apache Derby
database — the one reference surface (`/root/reference/README.md:462-577`,
the Oracle → Spark load path) that previously had no end-to-end
evidence because no database server runs in this sandbox. Derby ships
inside PySpark's own jars (it backs the Hive metastore), so the real
``spark.read.format("jdbc")`` code path — DriverManager, dialect
mapping, stride partitioning, fetchsize — executes for real here.

Scale notes: the partitioned read is the reference's 4-way stride scan
(`README.md:549-558`) — lowerBound/upperBound set the stride, NOT a
filter (`README.md:542`); every partition opens its own connection, so
``numPartitions`` is what parallelizes a 100 TB initial load (and must
be capped to protect the source DB, `README.md:561`).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from oracle_to_cassandra_spark import scratch
from oracle_to_cassandra_spark.registry import query
from oracle_to_cassandra_spark.sources import load_table
from oracle_to_cassandra_spark.sources.jdbc import read_jdbc_table

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

#: Derby URLs already seeded in this interpreter session. The scratch
#: path carries the session token, so a fresh JVM always reseeds; within
#: a session the S1 write (load → Derby) runs exactly once per SF dir
#: and the repeatable probe is the S3 partitioned read-back — the same
#: build-once/probe-many split the bucketed-join query uses, so bench
#: passes measure the stride scan, not Derby boot + bulk insert.
_SEEDED: set[str] = set()


def _derby_url(sf_dir: str) -> str:
    """One Derby database per (session, SF dir): Derby embedded allows
    a SINGLE booting JVM per database directory, so the path carries
    both the session token (concurrent pytest/bench/driver JVMs never
    contend for the boot lock) and the SF name (one session probing
    several SFs keeps separate databases)."""
    name = os.path.basename(os.path.normpath(sf_dir)) or "default"
    return f"jdbc:derby:{scratch.session_path(f'derby_{name}')};create=true"


@query(
    "jdbc_partitioned_roundtrip",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey,
           round(c_acctbal, 2) AS c_acctbal, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
)
def jdbc_partitioned_roundtrip(spark, sf_dir):
    """S1→S3 end-to-end: load customer into Derby over JDBC (the
    reference's Oracle table stands in), then read it back with the
    4-partition stride scan of `README.md:549-558` plus a pushed
    segment predicate, and verify the rows survived the round trip.

    The single driver-side ``max(c_custkey)`` fetch is the standard
    bounds-metadata query every partitioned JDBC load starts with —
    one scalar, not a data collect."""
    # keep Derby's boot log out of the repo root
    spark._jvm.java.lang.System.setProperty(
        "derby.stream.error.file", scratch.session_path("derby.log")
    )
    url = _derby_url(sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    if url not in _SEEDED:
        (
            cust.write.format("jdbc")
            .option("url", url)
            .option("dbtable", "customer_jdbc")
            .option("driver", DERBY_DRIVER)
            # Derby's default StringType mapping is CLOB, which rejects
            # comparisons — VARCHAR keeps the segment predicate pushable
            .option(
                "createTableColumnTypes",
                "c_name VARCHAR(64), c_mktsegment VARCHAR(16)",
            )
            .mode("overwrite")
            .save()
        )
        _SEEDED.add(url)
    hi = cust.agg(F.max("c_custkey")).first()[0]
    back = read_jdbc_table(
        spark,
        url=url,
        dbtable="customer_jdbc",
        driver=DERBY_DRIVER,
        partition_column="c_custkey",
        lower_bound=0,
        # max() is NULL on an empty source; (0, 1) is a valid stride
        # spec over zero rows
        upper_bound=(int(hi) + 1) if hi is not None else 1,
        num_partitions=4,
        fetchsize=1000,
    )
    return back.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    ).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    )
