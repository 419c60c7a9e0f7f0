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
    "oracle_to_cassandra_spark.queries.migration_ops",
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
#: After rounds 1-4, 43 registered queries still have no driver
#: CORRECTNESS row (the round-3 window froze before they were added):
#: 42 oracle-able + 1 rows-only stream. All 43 are promoted below,
#: which brings ever-driver-verified to 182/182. The remaining 7 slots
#: re-check the queries the round-4 events.ts drift invalidated: the
#: 5 watermark streams whose rows-only r4 rows were computed from
#: misread timestamps (silently landing in 1970 — their batch-equality
#: tests were red), plus 2 representatives of the 13 batch queries
#: that erred, exercising the fixed loader dispatch end-to-end.
#: Module import order alone can't express this — the 43 span modules
#: that also contain already-green queries, which would overflow the
#: window.
_PRIORITY: tuple[str, ...] = (
    # --- never driver-verified: TPC-H completion (18) ---
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q12_shipping_lateness",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive_predicates",
    "tpch_q20_excess_shipping",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_global_sales_opportunity",
    # --- never driver-verified: corpus curation / hygiene (9) ---
    "doc_repetition_stats",
    "decontamination_overlap",
    "corpus_global_shuffle",
    "quota_cap_per_source",
    "corpus_mixture_weights",
    "mixture_weighted_sample",
    "pii_redaction_stats",
    "duplicate_span_stats",
    "oov_rate_top_vocab",
    # --- never driver-verified: dedup / similarity (5) ---
    "dedup_simhash_near_stats",
    "incremental_lsh_dedup",
    "similarity_hyperplane_ann_topk",
    "ivf_centroid_refinement",
    "dense_global_ids",
    # --- never driver-verified: retrieval (2) ---
    "inverted_index_postings",
    "bm25_retrieval_topk",
    # --- never driver-verified: scale / ops tooling (7) ---
    "hll_sketch_union_rollup",
    "incremental_rollup_merge",
    "runtime_bloom_filtered_join",
    "quantile_cutpoint_bucketing",
    "skew_diagnostics_orders_custkey",
    "compaction_bin_packing",
    "map_in_arrow_token_stats",
    # --- never driver-verified: streaming (2; interval join is
    #     rows-only by contract) ---
    "stream_stream_interval_join",
    "stream_ingest_sink_roundtrip",
    # --- new this round: migration validation, layout planning,
    #     quality-aware dedup keepers, split-leakage audit ---
    "migration_bucket_reconciliation",
    "zorder_layout_audit",
    "dedup_keep_best_quality",
    "split_leakage_audit",
    "cms_heavy_hitters",
    # --- re-check after the events.ts timestamp[us] fix: the
    #     heaviest-state watermark stream r4 recorded with misread
    #     event times (all 7 share the fixed read_events_stream; the
    #     rest are covered by tests/test_streaming_equality.py) ---
    "stream_stateful_user_profile",
    # --- re-check: batch representative of the fixed loader path ---
    "asof_join_last_purchase",
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
