"""Parquet source registry for the test star schema.

The reference's sources are whole-table JDBC scans of the Oracle HR
schema (`/root/reference/README.md:462,466`) registered as temp views
for SparkSQL (`README.md:774-776` → ``createOrReplaceTempView``).
Here the same surface is served by the driver-generated parquet tables
(TESTDATA.md): scans (S1/S2), view registration (S7), catalog listing
(S4), and schema introspection (S5/S6) all map onto the built-ins.

Scale notes:
  * Parquet scans get vectorized reads, predicate pushdown, and column
    pruning from Catalyst for free — queries should filter/project
    early so the pushdown reaches the scan (check ``PushedFilters`` /
    ``ReadSchema`` in ``.explain("formatted")``).
  * ``DIM_TABLES`` marks the star-schema dimensions that stay
    broadcast-joinable at any realistic SF; fact tables (orders,
    lineitem, events, documents, embeddings) scale with the data and
    must shuffle on their join keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: every table the driver generates (TESTDATA.md / FIXTURES.md §B)
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

#: dimensions small enough to broadcast at any SF we target
#: (region=5, nation=25 are constant; supplier/part/customer grow with
#: SF but stay ≪ fact tables — broadcast them up to the 10 MB–1 GB
#: threshold, beyond which Catalyst/AQE falls back to shuffle joins)
DIM_TABLES = ("region", "nation", "supplier", "part", "customer")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1/S2 analog: whole-table scan → DataFrame (lazy; no data read
    until an action — the reference calls this out at README.md:577).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read it as long (legacy conf, settable at runtime)
    and truncate to microsecond TimestampType — the same truncation
    DuckDB applies, so the oracle compare stays exact. Integer DIV
    avoids double rounding on ~1.7e18 ns epoch values.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """S7 analog of ``registerTempTable`` (README.md:774-776): expose
    each table to ``spark.sql``. Returns the DataFrames too."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
