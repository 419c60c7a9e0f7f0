"""Semantic invariants for the round-7 fixes — the FAILFAST negative
promised by json_corrupt_records_handling's docstring, the empty-token
guard in the BPE char fold, and the 63-bit fingerprint cap in the
multimodal decoders."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import __spark_entry__ as E
from tests.conftest import SF_DIR


def test_json_failfast_raises(spark):
    """FAILFAST on the same malformed-JSON input that PERMISSIVE
    quarantines must raise instead of yielding rows — the negative
    half of the json_corrupt_records_handling contract."""
    raw = spark.createDataFrame(
        [('{"doc_id": 1, "n_chars": 10}',), ('{"doc_id": 2, "n_ch',)],
        ["js"],
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    bad = raw.select(F.from_json("js", schema, {"mode": "FAILFAST"}).alias("r"))
    with pytest.raises(Exception) as exc:
        bad.collect()
    assert "FAILFAST" in str(exc.value) or "Malformed" in str(exc.value)


def test_json_permissive_rescue_column(spark):
    """PERMISSIVE quarantines the raw malformed line verbatim in the
    _corrupt_record rescue column and leaves good rows untouched."""
    good, bad = '{"doc_id": 1, "n_chars": 10}', '{"doc_id": 2, "n_ch'
    raw = spark.createDataFrame([(good,), (bad,)], ["js"])
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    rows = raw.select(
        F.from_json(
            "js",
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("r")
    ).collect()
    by_rescue = {r["r"]["_corrupt_record"]: r["r"] for r in rows}
    assert by_rescue[None]["n_chars"] == 10
    assert by_rescue[bad]["n_chars"] is None


def test_bpe_char_fold_empty_token(spark):
    """A zero-length token must fold to '' (the DuckDB range(0)
    behavior), not '··' — Spark's sequence(1, 0) counts DOWN and would
    fabricate two empty symbols without the guard."""
    from oracle_to_cassandra_spark.queries.bpe_train import _CHARS_FOLD

    rows = (
        spark.createDataFrame([("",), ("ab",)], ["w"])
        .select("w", F.expr(_CHARS_FOLD).alias("sym"))
        .collect()
    )
    by_w = {r["w"]: r["sym"] for r in rows}
    assert by_w[""] == ""
    assert by_w["ab"] == "·a·b"


def test_fingerprint_63bit_cap(spark):
    """A planted blob whose fingerprint would need >= 64 bits must
    raise (engines' int64 shift semantics diverge there), not silently
    produce an engine-dependent hash."""
    from oracle_to_cassandra_spark.operators.multimodal import (
        decode_bmp_phash,
        plant_bmp_blobs,
    )
    from oracle_to_cassandra_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(4)
    # widen the planted BMP far past 63 px by inflating dimensions
    planted = plant_bmp_blobs(docs)
    decoded = decode_bmp_phash(planted)
    assert decoded.count() > 0  # in-contract blobs decode fine

    # build one oversized BMP (16x8 = 128 px) by hand and expect the cap
    import struct

    w, h = 16, 8
    stride = (w * 3 + 3) // 4 * 4
    pixels = bytes(stride * h)
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 0, 0, 0, 0)
    )
    big = spark.createDataFrame(
        [(99, header + pixels, "image/bmp")], ["doc_id", "payload", "media_kind"]
    )
    with pytest.raises(Exception) as exc:
        decode_bmp_phash(big).collect()
    assert "63-bit" in str(exc.value)


def test_e2e_flagship_plan_and_values(spark):
    """The flagship pipeline's final plan: dim joins broadcast (both
    the JDBC customer side and the parquet recompute side), the
    read-back prunes to the BUILDING partition, no Python stages, and
    every occupied bucket reconciles."""
    from oracle_to_cassandra_spark.plans import formatted_plan

    df = E.queries()["oracle_to_cassandra_e2e"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "Python" not in plan
    assert plan.count("BroadcastHashJoin") >= 2, (
        "dim joins regressed to shuffle joins"
    )
    assert "PartitionFilters: [isnotnull(c_mktsegment" in plan, (
        "read-back does not prune on the partition column"
    )
    rows = df.collect()
    assert rows and all(r["content_match"] for r in rows)
    assert all(r["n_src"] == r["n_dst"] and r["n_src"] > 0 for r in rows)


def test_column_profile_approx_expand_free(spark):
    """Both profile variants must plan WITHOUT an Expand node and
    WITHOUT SortAggregate: the approx form by construction (HLL
    sketches), the exact form since the r13 rewrite that split
    min/max/null counts into one no-grouping pass and computes exact
    distincts over a melted (column_name, value) relation with
    hash-based partial dedup — the old single 6-distinct aggregate
    planned as SortAggregate over a ×7 Expand (see
    plans/r13/migration_column_profile_before.txt). The sketch must
    still land within tolerance on every column."""
    from oracle_to_cassandra_spark.plans import formatted_plan

    approx_df = E.queries()["migration_column_profile_approx"](spark, SF_DIR)
    assert "Expand" not in formatted_plan(approx_df)
    exact_df = E.queries()["migration_column_profile"](spark, SF_DIR)
    exact_plan = formatted_plan(exact_df)
    assert "Expand" not in exact_plan, (
        "exact profile regressed to the multi-distinct-in-one-agg form"
    )
    # the one-pass min/max/null agg may still PLAN as SortAggregate
    # (string min/max buffers are not hash-supported) but with empty
    # grouping keys it must not require an actual row Sort
    assert not re.search(r"^\(\d+\) Sort\s*$", exact_plan, re.M), (
        "exact profile regressed to a sorted wide-row aggregation"
    )
    rows = approx_df.collect()
    assert len(rows) == 6
    assert all(r["approx_within_tol"] for r in rows)


def test_shuffle_hash_hint_respected(spark):
    """The SHUFFLE_HASH hint must produce a ShuffledHashJoin — a
    silently-ignored hint (falling back to broadcast or sort-merge)
    would invalidate the query's documented purpose."""
    from oracle_to_cassandra_spark.plans import formatted_plan

    df = E.queries()["hinted_shuffle_hash_join"](spark, SF_DIR)
    assert "ShuffledHashJoin" in formatted_plan(df)


def test_gdpr_cascade_consistency(spark):
    """Purge+keep must equal each table's row count, and the orders
    and lineitem purge fractions must reflect the same tombstone set
    (an order is purged iff its customer is, every line of a purged
    order is purged)."""
    from oracle_to_cassandra_spark.sources import load_table

    rows = {
        r["table_name"]: r
        for r in E.queries()["gdpr_delete_propagation"](spark, SF_DIR).collect()
    }
    for t in ("customer", "orders", "lineitem", "events"):
        n = load_table(spark, SF_DIR, t).count()
        assert rows[t]["n_purge"] + rows[t]["n_keep"] == n, t
    assert rows["customer"]["n_purge"] > 0, "tombstone set empty at this SF"


def test_pagerank_mass_conservation(spark):
    """Integer PageRank invariants: every node's rank is at least the
    teleport floor, total mass never exceeds the scale (floor
    divisions only LOSE mass), and at least ~95% of the mass
    survives 3 rounds of truncation."""
    from oracle_to_cassandra_spark.queries.graph_rank import PR_SCALE

    rows = E.queries()["trade_graph_pagerank"](spark, SF_DIR).collect()
    n = len(rows)
    teleport = ((15 * PR_SCALE) // 100) // n
    total = sum(r["pagerank_nano"] for r in rows)
    assert all(r["pagerank_nano"] >= teleport for r in rows)
    assert total <= PR_SCALE
    assert total >= int(0.95 * PR_SCALE), f"too much floored mass: {total}"


def test_kanonymity_bands_partition_rows(spark):
    """The k-band histogram must partition the customer table exactly
    and each band's min/max class sizes must respect its boundaries."""
    from oracle_to_cassandra_spark.sources import load_table

    rows = E.queries()["kanonymity_quasi_identifier_audit"](
        spark, SF_DIR
    ).collect()
    n_customers = load_table(spark, SF_DIR, "customer").count()
    assert sum(r["n_rows"] for r in rows) == n_customers
    bounds = {
        "k=1 (unique)": (1, 1),
        "k in [2,5)": (2, 4),
        "k in [5,20)": (5, 19),
        "k >= 20": (20, 10**9),
    }
    for r in rows:
        lo, hi = bounds[r["k_band"]]
        assert lo <= r["min_k"] <= r["max_k"] <= hi, r


def test_secondary_index_dpp(spark):
    """The base-table scan must carry a dynamic-pruning partition
    filter fed by the broadcast index side (checked on the
    pre-execution plan — AQE substitutes the materialized subquery
    after the first run), plus no Python stages."""
    from oracle_to_cassandra_spark.plans import formatted_plan

    df = E.queries()["secondary_index_dpp_lookup"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "dynamicpruning" in plan, "base scan lost dynamic partition pruning"
    assert "Python" not in plan


def test_tar_decoder_rejects_corrupt_header(spark):
    """Flipping one payload byte inside a tar header must trip the
    checksum re-verification — a corrupt shard fails loudly."""
    from oracle_to_cassandra_spark.operators.multimodal import (
        decode_tar_members,
        plant_tar_blobs,
    )
    from oracle_to_cassandra_spark.sources import load_table

    d = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") == 1)
    planted = plant_tar_blobs(d)
    blob = bytearray(planted.collect()[0]["payload"])
    blob[5] ^= 0xFF  # corrupt inside the first header's name field
    bad = spark.createDataFrame(
        [(1, bytes(blob))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception) as exc:
        decode_tar_members(bad).collect()
    assert "checksum mismatch" in str(exc.value)


def test_sft_spans_consistent_with_render(spark):
    """Loss-mask spans must lie inside the rendered transcript and be
    strictly ascending and non-overlapping per user — the render and
    the spans share one turn order by construction."""
    qs = E.queries()
    render = {
        r["user_id"]: r["n_chars"]
        for r in qs["sft_conversation_render"](spark, SF_DIR).collect()
    }
    spans = {}
    for r in qs["sft_loss_mask_spans"](spark, SF_DIR).collect():
        spans.setdefault(r["user_id"], []).append(
            (r["turn_idx"], r["span_begin"], r["span_end"])
        )
    assert spans, "no assistant turns at this SF"
    for uid, ss in spans.items():
        ss.sort()
        assert ss[-1][2] <= render[uid], f"user {uid}: span past transcript end"
        for (_, b, e), (_, b2, _e2) in zip(ss, ss[1:]):
            assert b < e <= b2, f"user {uid}: overlapping/unordered spans"
