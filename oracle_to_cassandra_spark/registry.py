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
    "oracle_to_cassandra_spark.queries.corpus_ops",
    "oracle_to_cassandra_spark.queries.corpus_quality",
    "oracle_to_cassandra_spark.queries.cohorts",
    "oracle_to_cassandra_spark.queries.tpch_shapes",
    "oracle_to_cassandra_spark.queries.tpch_suite",
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

#: Query-level registration order for the driver's correctness window.
#:
#: The driver verifies the FIRST 50 entries of ``queries()`` per round.
#: Rounds 1-2 proved 90 of 139 queries green; the 49 below never had a
#: driver CORRECTNESS row (they pass the local DuckDB-diff replica in
#: ``tests/test_driver_contract.py``, but that is the builder's own
#: harness). They are promoted to the head of the dict so round 3's
#: window covers them all, bringing ever-driver-verified to 139/139.
#: Slot 50 re-checks ``top_bigrams_corpus``, whose round-2 row was
#: vacuously green (0 rows on both engines at sf0.01 — see ADVICE);
#: its frequency threshold is now scale-aware so the re-check compares
#: real values. Module import order alone can't express this: the 49
#: span 16 modules that also contain 3 already-green queries, which
#: would overflow the window.
_PRIORITY: tuple[str, ...] = (
    # streaming (rows-only by contract — no oracle twin)
    "stream_tumbling_event_counts",
    "stream_sessionization_watermark",
    "stream_static_enrichment_join",
    "stream_dedup_within_watermark",
    "stream_stateful_user_profile",
    # UDF surface
    "pandas_udf_scalar_score",
    "grouped_map_zscore",
    "udtf_chunk_documents",
    # catalog / metadata
    "catalog_list_tables",
    "catalog_describe_customer",
    # subqueries
    "scalar_subquery_above_avg",
    "in_subquery_customers",
    "correlated_exists_orders",
    "not_exists_anti_join",
    "derived_table_top_segment",
    # extended joins
    "left_outer_customer_orders",
    "full_outer_key_reconciliation",
    "asof_join_last_purchase",
    # event-time windows
    "tumbling_6h_windows",
    "sliding_2d_1d_windows",
    "session_windows_per_user",
    "late_data_watermark_semantics",
    # TPC-H shapes
    "tpch_q3_shipping_priority",
    "tpch_q6_revenue_change",
    "tpch_q10_returned_items",
    # sampling / stats
    "hash_systematic_sample",
    "stratified_quota_sample",
    "histogram_binning_prices",
    "ordered_string_agg_nations",
    # cohorts / timeseries
    "cohort_weekly_retention",
    "forward_fill_last_purchase_value",
    "inter_event_gap_stats",
    # scale demos
    "bucketed_join_orders_customers",
    "salted_skew_aggregate",
    # curation
    "levenshtein_candidate_pairs",
    "calendar_spine_daily_orders",
    "cdc_latest_version_dedup",
    "null_handling_outer_join",
    "funnel_signup_to_purchase",
    "corpus_curation_pipeline",
    # custom source / SQL-text surface
    "custom_pysource_aggregate",
    "variant_json_extraction",
    "cte_sql_text_pipeline",
    "na_fill_drop_imputation",
    # nested / semi-structured
    "struct_pack_unpack",
    "json_to_map_explode",
    "map_construction_lookup",
    "unpivot_stack_measures",
    # remaining advanced op
    "embedding_int8_quantization",
    # slot 50: round-2 row was vacuous (0-row compare) — re-verify
    "top_bigrams_corpus",
)

_loaded = False


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _reorder()
    _loaded = True


def _reorder() -> None:
    """Rebuild QUERIES/ORACLE so ``_PRIORITY`` names iterate first.

    Dict insertion order is the driver's verification order; names not
    in ``_PRIORITY`` keep their module-registration order after it.
    """
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:
        raise ValueError(f"_PRIORITY names not registered: {missing}")
    ordered = list(_PRIORITY) + [n for n in QUERIES if n not in set(_PRIORITY)]
    for d in (QUERIES, ORACLE):
        tail = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(tail)


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
