"""Semantic invariants for the round-6 operator additions — properties
the DuckDB value-compare can't express (it checks equality with the
oracle, not that BOTH engines satisfy the operator's contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as E
from tests.conftest import SF_DIR


def test_scd2_intervals_partition_time(spark):
    """Per user: intervals must not overlap, exactly one open-ended
    current row, and consecutive intervals must abut (valid_to of one
    equals valid_from of the next)."""
    df = E.queries()["scd2_interval_build"](spark, SF_DIR).cache()
    per_user_current = (
        df.groupBy("user_id")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_current"))
        .filter(F.col("n_current") != 1)
        .count()
    )
    assert per_user_current == 0, "a user has != 1 current row"
    a = df.alias("a")
    b = df.alias("b")
    overlaps = (
        a.join(b, (F.col("a.user_id") == F.col("b.user_id")))
        .filter(F.col("a.valid_from") < F.col("b.valid_from"))
        .filter(
            (F.col("a.valid_to") == "CURRENT")
            | (F.col("a.valid_to") > F.col("b.valid_from"))
        )
        .filter(F.col("a.valid_to") != F.col("b.valid_from"))
        .count()
    )
    assert overlaps == 0, "validity intervals overlap or leave gaps"
    df.unpersist()


def test_temporal_embargo_ranges_disjoint(spark):
    """train.max < embargo.min window < test.min, and the embargo
    width actually separates train from test."""
    rows = {
        r["split"]: r
        for r in E.queries()["temporal_embargo_split"](spark, SF_DIR).collect()
    }
    assert set(rows) == {"train", "embargo", "test"}
    assert rows["train"]["max_ts"] < rows["embargo"]["min_ts"]
    assert rows["embargo"]["max_ts"] < rows["test"]["min_ts"]


def test_snapshot_delta_totals_consistent(spark):
    """Per-source doc counts must sum to the corpus size, and
    already-in-snapshot can never exceed the new-batch size."""
    df = E.queries()["corpus_snapshot_delta"](spark, SF_DIR)
    tot = df.agg(
        F.sum(F.col("n_docs_snapshot") + F.col("n_docs_new")).alias("n"),
        F.sum(
            (F.col("n_new_already_in_snapshot") > F.col("n_docs_new")).cast("int")
        ).alias("bad"),
    ).first()
    from oracle_to_cassandra_spark.sources import load_table

    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert tot["n"] == n_docs
    assert tot["bad"] == 0


def test_weighted_sample_is_valid_sample(spark):
    """Exactly 20 DISTINCT documents with contiguous ranks 1..20 and
    strictly positive weights."""
    rows = E.queries()["weighted_sample_without_replacement"](
        spark, SF_DIR
    ).collect()
    assert len(rows) == 20
    assert len({r["doc_id"] for r in rows}) == 20
    assert sorted(r["rnk"] for r in rows) == list(range(1, 21))
    assert all(r["weight_ppm"] > 0 for r in rows)


def test_psi_terms_nonnegative_with_spine(spark):
    """Every PSI term is ≥ 0 (the (q−p)·ln(q/p) form is nonnegative
    by construction) and all 10 spine buckets report."""
    rows = E.queries()["token_length_psi_drift"](spark, SF_DIR).collect()
    assert len(rows) == 10
    assert sorted(r["bucket"] for r in rows) == list(range(10))
    assert all(r["psi_term"] >= 0 for r in rows)


def test_snapshot_delta_broadcast_membership(spark):
    """The snapshot-hash membership join must broadcast the hash set
    side, not shuffle the corpus against it."""
    from oracle_to_cassandra_spark.plans import formatted_plan

    df = E.queries()["corpus_snapshot_delta"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "Python" not in plan
    assert "BroadcastHashJoin" in plan, (
        "snapshot membership join regressed to a shuffle join"
    )


def test_transition_probs_sum_to_one(spark):
    """Per prev_type the transition ppm shares must sum to ~1e6
    (floor division under-counts by at most one ppm per row)."""
    df = E.queries()["event_transition_matrix"](spark, SF_DIR)
    bad = (
        df.groupBy("prev_type")
        .agg(F.sum("transition_ppm").alias("s"), F.count("*").alias("k"))
        .filter(
            (F.col("s") > 1_000_000) | (F.col("s") < 1_000_000 - F.col("k"))
        )
        .count()
    )
    assert bad == 0, "a transition row does not normalize to 1e6 ppm"
