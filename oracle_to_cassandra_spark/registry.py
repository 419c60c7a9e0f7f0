"""Query registry — the single place each operator registers its
Spark implementation and (when SQL-expressible) its DuckDB oracle twin.

The driver contract (`__spark_entry__.py`) requires, per query name:
  * a callable ``(spark, sf_dir) -> DataFrame``
  * an ANSI-SQL string DuckDB runs on the same parquet tables

Conventions that make the driver's hash compare succeed (SURVEY.md
§7.4): alias every computed column identically on both sides; round
floating aggregates in BOTH texts; format timestamps to ISO strings;
cast DuckDB integer SUMs to BIGINT (DuckDB widens to HUGEINT, Spark
keeps LongType).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

#: modules that register queries on import.
#:
#: ORDER MATTERS for the driver: its correctness run covered exactly
#: the first 50 registered queries in round 1, so the highest-risk /
#: previously-unverified families (dedup, similarity, text, tfidf,
#: training_prep, multimodal, pipelines) plus the round-1 fixes
#: (scalar_funcs array serialization, stats_funcs sketch tolerances)
#: are registered FIRST; the families with green round-1 rows come
#: last. Registration order has no semantic effect — every module is
#: import-order independent (similarity_eval composes its oracle from
#: exported SQL helpers, not the registry).
_QUERY_MODULES = (
    "oracle_to_cassandra_spark.queries.dedup",
    "oracle_to_cassandra_spark.queries.similarity",
    "oracle_to_cassandra_spark.queries.similarity_eval",
    "oracle_to_cassandra_spark.queries.text_analysis",
    "oracle_to_cassandra_spark.queries.tfidf",
    "oracle_to_cassandra_spark.queries.training_prep",
    "oracle_to_cassandra_spark.queries.dedup_clusters",
    "oracle_to_cassandra_spark.queries.multimodal",
    "oracle_to_cassandra_spark.queries.scalar_funcs",
    "oracle_to_cassandra_spark.queries.stats_funcs",
    "oracle_to_cassandra_spark.queries.jdbc_roundtrip",
    "oracle_to_cassandra_spark.queries.pipelines",
    "oracle_to_cassandra_spark.queries.advanced_ops",
    "oracle_to_cassandra_spark.queries.scale_queries",
    "oracle_to_cassandra_spark.queries.sampling",
    "oracle_to_cassandra_spark.queries.curation",
    "oracle_to_cassandra_spark.queries.cohorts",
    "oracle_to_cassandra_spark.queries.tpch_shapes",
    "oracle_to_cassandra_spark.queries.joins_extended",
    "oracle_to_cassandra_spark.queries.subqueries",
    "oracle_to_cassandra_spark.queries.nested",
    "oracle_to_cassandra_spark.queries.timeseries",
    "oracle_to_cassandra_spark.queries.catalog",
    "oracle_to_cassandra_spark.queries.udfs",
    "oracle_to_cassandra_spark.queries.custom_source",
    "oracle_to_cassandra_spark.queries.sql_surface",
    "oracle_to_cassandra_spark.queries.event_time",
    "oracle_to_cassandra_spark.queries.relational",
    "oracle_to_cassandra_spark.queries.aggregates",
    "oracle_to_cassandra_spark.queries.windows",
    "oracle_to_cassandra_spark.queries.setops",
    "oracle_to_cassandra_spark.queries.streaming",
)

_loaded = False


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _loaded = True


def query(name: str, oracle: str | None = None):
    """Register a query. ``oracle=None`` marks a non-SQL-expressible
    op (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
