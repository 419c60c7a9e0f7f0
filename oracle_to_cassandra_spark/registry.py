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
    "oracle_to_cassandra_spark.queries.graph_rank",
    "oracle_to_cassandra_spark.queries.scale_queries",
    "oracle_to_cassandra_spark.queries.sampling",
    "oracle_to_cassandra_spark.queries.privacy",
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
#: Round-7 composition (executes item 1 of the round-6 verdict): the
#: 46 round-6 additions that were committed AFTER the r6 window filled
#: and therefore have ZERO driver history (all green in the local
#: DuckDB replica, `tests/test_driver_contract.py`), followed by the
#: 4 oldest displaced r1-only-green rows to fill the 50-window. New
#: round-7 queries are inserted at the TOP as they land (zero-history
#: outranks everything); each insertion displaces one r1-green filler.
#:
#: NEXT-ROUND (r8) rotation queue — the remaining r1-only-green rows
#: whose driver evidence predates the testdata regenerations:
#: full_scan_region, projection_orders, top_orders_limit,
#: clustering_order_scan, distinct_departments,
#: static_column_per_partition, global_counts, rollup_region_nation,
#: cube_order_status_priority, grouping_sets_status_priority,
#: stats_dispersion_per_segment, plus any round-7 additions that do
#: not fit this window.
#:
#: ROUND-8 rotation (executes item 1 of the round-7 verdict): the
#: 50-window = 50 of the 56 zero-driver-history oracled queries
#: (every late-r7 addition past the r7 window), in their r7 queue
#: order, with lsh_candidate_precision_audit promoted into the 50
#: because round 8 changed it (integral-div ppm) alongside
#: lsh_dedup_recall_vs_exact (df-capped ground truth). The 6
#: deferred zero-history rows + the 31 r1-stale rows queue for the
#: r9 window (37 items, 13 slots spare for re-verifying round-8
#: integer-units conversions).
#:
#: ROUND-8 hardening (executes item 2): every `round(SUM(float), k)`
#: / `round(AVG(float), k)` compare column — the accumulation-order-
#: dependent family that flipped 3 queries at sf0.1 in round 7 — is
#: converted to integer-units form (per-row `round(x*scale)::BIGINT`,
#: exact int64 sum, at most ONE float division at the end, which is
#: deterministic across engines because both divide the same exact
#: integer). Deterministic round() sites are NOT converted: integer/
#: integer ratios, per-row rounds of 2-dp money columns, and exact
#: quantile interpolation are order-insensitive by construction.
#: COMPLETE as of r8: the last float-accumulation compares
#: (stddev/var via closed-form integer s1/s2 in
#: stats_dispersion_per_segment; the rows-only streaming twins'
#: total_value, so micro-batch slicing can never move them off their
#: batch twins) are converted; `grep round\((sum|avg|stddev)` over
#: oracle texts now hits only integer-unit or flag-sum forms, and
#: `tests/test_exactness_guard.py` enforces that invariant against
#: regression (4 audited integer-argument exceptions documented
#: there). 82 registered queries changed in the r8 conversion; 8 sit
#: in the r8 window, the other 74 keep their prior green driver rows
#: valid off rounding boundaries (values are identical except on the
#: knife edges the conversion removes) and are re-proved by this
#: round's full sf0.1 differential sweep + the per-session replica,
#: so they queue BEHIND the 37 genuinely stale/zero-history items.
#: ROUND-9 rotation (executes item 1 of the round-8 verdict): the
#: 50-window = the full r9 queue the r8 comments staged (6 deferred
#: zero-history + 31 r1-stale + 4 r8 net-new = 41), PLUS the two
#: TPC-H ratio queries round 9 changed (int64-headroom hardening per
#: r8 ADVICE item 2 — tpch_q14_promo_revenue, tpch_q8_market_share;
#: stats_dispersion_per_segment, changed by ADVICE item 1, already
#: sits in the 41), PLUS 7 fillers drawn from the oldest remaining
#: driver evidence (r2 rows, by CORRECTNESS_r02.json), preferring the
#: float-audited and dedup cores. After r9 the remaining backlog is
#: r2-green rows only (~39) — they queue for r10.
#:
#: ROUND-10 rotation (executes item 1 of the round-9 verdict, and the
#: r9 ADVICE off-by-one fix: the window is now an EXPLICIT 50-slot
#: tuple, length-asserted in ``_reorder`` and pinned by
#: ``tests/test_driver_contract.py``, so "claimed 50, spanned 51" can
#: never recur). Composition: 3 zero-history rows (the two queries
#: that replaced the retired multimodal formula stubs, plus
#: stream_dedup_within_watermark — first-ever hash oracle), then the
#: 44 remaining rows whose freshest driver evidence is
#: CORRECTNESS_r02 (leading with the three dedup-core queries whose
#: implementation file operators/dedup.py was heavily edited in r9),
#: then tpch_q8_market_share (ratio form changed in r9 but its
#: freshest driver row is pre-change r5 — the r9 off-by-one victim),
#: then the 2 batch WAV queries whose planting formula changed this
#: round (3+44+1+2 = 50, verified against the CORRECTNESS_r0*.json
#: ledger by tests/test_driver_contract.py). After r10, the oldest
#: remaining evidence on any LIVE query is r4 (exactly the 32 r4
#: rows of the r11 queue below, which also leads with the one
#: changed-this-round query that did not fit the window; the two
#: retired multimodal formula stubs keep older ledger rows but are
#: no longer registered).
_WINDOW: tuple[str, ...] = (
    # ROUND-13 rotation (executes item 1 of the round-12 verdict):
    # the one net-new query of the round (zero driver history
    # outranks everything — r12 verdict item 6's watermark-emitted
    # stream-stream LEFT OUTER interval join), then the staged r13
    # queue — json_extract_events (r6-stale, displaced from the r12
    # window by that round's net-new row), the 23 remaining r6-stale
    # rows, and the first 25 of the 27 staged alphabetical heads of
    # the 50 r7-stale rows (monthly_revenue_yoy_growth and
    # oracle_to_cassandra_e2e, displaced by the net-new row, head the
    # r14 queue). After r13 the oldest driver evidence on any live
    # query is r7 (the 25 rows of the r14 queue below).
    # --- zero driver history (net-new this round): left-outer
    #     interval join with watermark-gated null emission ---
    "stream_stream_left_outer_interval_join",
    # --- the 24 r6-stale rows (json_extract_events first — displaced
    #     from the r12 window — then alphabetical) ---
    "json_extract_events",
    "json_to_map_explode",
    "lag_lead_user_events",
    "late_data_watermark_semantics",
    "lsh_multiprobe_recall",
    "map_construction_lookup",
    "migration_row_diff",
    "multimodal_bmp_pixel_stats",
    "multimodal_phash_dedup_groups",
    "multimodal_png_header_decode",
    "multimodal_y4m_frame_sample_stats",
    "multimodal_y4m_temporal_fingerprint",
    "packed_sequence_offsets",
    "pivot_user_event_counts",
    "point_lookup_customer",
    "session_windows_per_user",
    "similarity_pq_adc_topk",
    "similarity_pq_recall_at_10",
    "sliding_2d_1d_windows",
    "stream_tws_user_activity",
    "tpch_q1_pricing_summary",
    "tumbling_6h_windows",
    "tumbling_daily_event_counts",
    "variant_json_extraction",
    # --- first 25 of the 27 staged alphabetical heads of the
    #     r7-stale backlog ---
    "ab_assignment_srm_check",
    "asof_join_with_tolerance",
    "benford_first_digit_audit",
    "bpe_apply_tokenize",
    "bpe_merge_candidates",
    "corpus_snapshot_delta",
    "curation_pipeline_v2",
    "event_path_trigrams",
    "event_transition_matrix",
    "event_type_association_rules",
    "functional_dependency_audit",
    "funnel_time_to_convert",
    "fuzzy_eval_decontamination",
    "hard_negative_mining",
    "incremental_pq_encode",
    "json_corrupt_records_handling",
    "kanonymity_quasi_identifier_audit",
    "keyset_pagination_page3",
    "label_centroid_separation",
    "lateral_top2_orders_per_customer",
    "markov_surprise_anomaly_users",
    "matryoshka_prefix_recall",
    "merge_upsert_apply",
    "migration_column_profile",
    "migration_column_profile_approx",
)

#: r14 queue (stages the final leg of the r10/r11 cadence): the two
#: r7-stale rows displaced from the r13 window by the net-new
#: left-outer interval join, then the 23 remaining r7-stale rows
#: (pareto_revenue_concentration onward, alphabetical). 25 items —
#: the r14 window tops up with 25 fillers from the oldest r8 rows,
#: giving the full 325-query surface r8+ external certification by
#: r14, the cadence the r10/r11 verdicts ordered.
_QUEUE: tuple[str, ...] = (
    # --- displaced from the r13 window by the net-new
    #     stream_stream_left_outer_interval_join row (r7-stale) ---
    "monthly_revenue_yoy_growth",
    "oracle_to_cassandra_e2e",
    # --- the 23 remaining r7-stale rows (alphabetical) ---
    "pareto_revenue_concentration",
    "pmi_collocations_topk",
    "purchase_regularity_churn_signal",
    "quality_length_regression_per_source",
    "quality_quantile_normalization",
    "rag_chunking_overlap",
    "referential_integrity_audit",
    "rfm_customer_segments",
    "robust_quality_outliers",
    "scd2_interval_build",
    "schema_evolution_merge_read",
    "stratified_split_audit",
    "stream_gopher_quality_gate",
    "stream_trending_event_types",
    "supplier_concentration_hhi",
    "temporal_embargo_split",
    "text_normalization_stats",
    "token_length_psi_drift",
    "unpivot_order_measures",
    "user_behavior_entropy",
    "weekly_event_spike_alerts",
    "weighted_sample_without_replacement",
    "zipf_fit_per_corpus",
)

#: the driver verifies the FIRST 50 registered queries each round
DRIVER_WINDOW = 50

_PRIORITY: tuple[str, ...] = _WINDOW + _QUEUE

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
    if len(_WINDOW) != DRIVER_WINDOW:
        raise ValueError(
            f"_WINDOW must hold exactly {DRIVER_WINDOW} names, "
            f"has {len(_WINDOW)}"
        )
    # a DUPLICATE inside either tuple passes the length check but
    # dedups at dict insertion — the driver's first-50 iteration would
    # silently pull the queue head into slot 50 (the exact
    # claimed-50-spanned-51 failure this guard exists to prevent)
    for label, names in (("_WINDOW", _WINDOW), ("_QUEUE", _QUEUE)):
        if len(set(names)) != len(names):
            dupes = sorted(n for n in set(names) if names.count(n) > 1)
            raise ValueError(f"duplicate names in {label}: {dupes}")
    if set(_WINDOW) & set(_QUEUE):
        raise ValueError(
            f"window/queue overlap: {sorted(set(_WINDOW) & set(_QUEUE))}"
        )
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
