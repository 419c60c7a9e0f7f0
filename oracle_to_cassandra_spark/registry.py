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
    "oracle_to_cassandra_spark.queries.similarity_pq",
    "oracle_to_cassandra_spark.queries.similarity_jl",
    "oracle_to_cassandra_spark.queries.text_analysis",
    "oracle_to_cassandra_spark.queries.bpe_train",
    "oracle_to_cassandra_spark.queries.hybrid_retrieval",
    "oracle_to_cassandra_spark.queries.tfidf",
    "oracle_to_cassandra_spark.queries.training_prep",
    "oracle_to_cassandra_spark.queries.dedup_clusters",
    "oracle_to_cassandra_spark.queries.semantic_dedup",
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
    "oracle_to_cassandra_spark.queries.dataset_card",
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
#: Round-6 final composition: (a) ``packed_sequence_offsets`` (zero
#: history before this round), (b) the 14 r4 events.ts-drift
#: casualties with no post-fix driver row, (c) rows-only re-checks for
#: the 4 watermark streams last checked with misread event times,
#: (d) the 5 events-reading r1-only backfills, (e) the §2-core
#: relational/aggregate backfills that still fit, and (f) this round's
#: zero-history additions (multimodal decode + fingerprints, PQ/JL
#: audits, TWS stream, RRF, winsorization, multi-probe, BPE train,
#: dataset card, migration diff, format roundtrip, semantic capstone)
#: — zero-history outranks re-verification of r1-green rows.
#:
#: NEXT-ROUND rotation queue (r1-green rows displaced this round, plus
#: r6 additions committed after the window filled): rename_bulk_customer,
#: filter_eq_numeric, self_join_adjacent_lines, full_scan_region,
#: projection_orders, top_orders_limit, clustering_order_scan,
#: distinct_departments, static_column_per_partition, global_counts,
#: count_distinct_custkeys, rollup_region_nation,
#: cube_order_status_priority, grouping_sets_status_priority,
#: stats_dispersion_per_segment, and the post-window r6 set
#: (incremental_pq_encode, bpe_merge_candidates, bpe_apply_tokenize,
#: migration_column_profile, hard_negative_mining, rag_chunking_overlap,
#: stratified_split_audit, quality_quantile_normalization,
#: token_length_psi_drift, stream_gopher_quality_gate,
#: ab_assignment_srm_check, schema_evolution_merge_read,
#: weighted_sample_without_replacement, event_transition_matrix,
#: markov_surprise_anomaly_users, quality_length_regression_per_source,
#: corpus_snapshot_delta, scd2_interval_build,
#: label_centroid_separation, temporal_embargo_split,
#: matryoshka_prefix_recall, robust_quality_outliers,
#: pmi_collocations_topk, text_normalization_stats,
#: stream_trending_event_types, zipf_fit_per_corpus,
#: json_corrupt_records_handling, pareto_revenue_concentration,
#: rfm_customer_segments, monthly_revenue_yoy_growth,
#: supplier_concentration_hhi, funnel_time_to_convert,
#: referential_integrity_audit, benford_first_digit_audit,
#: functional_dependency_audit, unpivot_order_measures,
#: lateral_top2_orders_per_customer, keyset_pagination_page3,
#: merge_upsert_apply, event_path_trigrams,
#: purchase_regularity_churn_signal, weekly_event_spike_alerts,
#: user_behavior_entropy, curation_pipeline_v2,
#: asof_join_with_tolerance, event_type_association_rules).
_PRIORITY: tuple[str, ...] = (
    # --- zero driver history (committed after the r5 run) ---
    "packed_sequence_offsets",
    # --- r4 events-loader casualties with no post-fix driver row (14) ---
    "filter_eq_string",
    "tumbling_daily_event_counts",
    "tumbling_6h_windows",
    "sliding_2d_1d_windows",
    "session_windows_per_user",
    "late_data_watermark_semantics",
    "cohort_weekly_retention",
    "forward_fill_last_purchase_value",
    "inter_event_gap_stats",
    "cdc_latest_version_dedup",
    "funnel_signup_to_purchase",
    "variant_json_extraction",
    "json_to_map_explode",
    "map_construction_lookup",
    # --- rows-only re-checks: watermark streams whose last driver rows
    #     (r4) were computed from misread event times (4) ---
    "stream_tumbling_event_counts",
    "stream_sessionization_watermark",
    "stream_static_enrichment_join",
    "stream_dedup_within_watermark",
    # --- backfill: r1-only green rows, events-reading first (5) ---
    "pivot_user_event_counts",
    "lag_lead_user_events",
    "json_extract_events",
    "from_json_struct_events",
    "explode_collect_roundtrip",
    # --- backfill: r1-only relational core (13) ---
    "point_lookup_customer",
    "denorm_orders_by_customer",
    "fk_chain_walk",
    # (full_scan_region / projection_orders rotate next round: trivial,
    #  r1-green, replica-covered — the rows below are zero-history)
    "bpe_train_merges",
    "dataset_card_per_source",
    # (rename_bulk_customer / filter_eq_numeric / self_join_adjacent_lines
    #  are r1-green and rotate next round — the decoded-content
    #  fingerprint family below is zero-history)
    "multimodal_phash_dedup_groups",
    "multimodal_wav_energy_fingerprint",
    "multimodal_y4m_temporal_fingerprint",
    "migration_row_diff",
    "format_roundtrip_digest",
    # (top_orders_limit / clustering_order_scan / distinct_departments /
    #  static_column_per_partition / global_counts are r1-green and
    #  rotate next round — zero-history additions outrank
    #  re-verification, per the r5 verdict)
    "hybrid_rrf_retrieval",
    "embedding_winsorization_stats",
    "lsh_multiprobe_recall",
    # --- backfill: r1-only aggregates (2; the other 5 — count_distinct,
    #     rollup, cube, grouping_sets, dispersion — rotate next round to
    #     make room for this round's zero-history additions below) ---
    "tpch_q1_pricing_summary",
    "group_customer_stats",
    # --- new this round, part 2: quality-rule battery, PQ/JL
    #     compression audits, Spark-4 stateful stream (zero driver
    #     history — highest priority per the r5 verdict's own logic) ---
    "gopher_quality_rules",
    "similarity_pq_adc_topk",
    "similarity_pq_recall_at_10",
    "jl_projection_recall_distortion",
    "stream_tws_user_activity",
    # --- new this round, part 1: real multimodal decode (r5 item 3;
    #     image, audio, pixel, video) and the semantic-dedup capstone
    #     (item 6) ---
    "multimodal_png_header_decode",
    "multimodal_wav_pcm_stats",
    "multimodal_bmp_pixel_stats",
    "multimodal_y4m_frame_sample_stats",
    "stream_multimodal_wav_decode",
    "embedding_cluster_keepers",
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
