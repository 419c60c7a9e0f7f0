"""Semantic invariants for the round-8 additions — properties the
DuckDB differential can't see because both engines could share the
same misconception (e.g. a sampler that selects the wrong NUMBER of
docs identically on both sides would still hash-match)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as E
from tests.conftest import SF_DIR


def test_systematic_sample_grid_count(spark):
    """Systematic sampling selects exactly the docs whose cumulative
    interval contains >= 1 grid point. Re-derive that count with an
    independent driver-side walk over the per-doc weights (grid points
    minus the collapse when one doc spans several points — docs
    heavier than `step` are selected once, not multiple times)."""
    from oracle_to_cassandra_spark.queries.training_prep import SAMPLE_TARGET
    from oracle_to_cassandra_spark.sources import load_table

    df = E.queries()["weighted_systematic_sample"](spark, SF_DIR)
    n_selected = df.agg(F.sum("n_selected")).collect()[0][0]
    weights = [
        r["w"]
        for r in load_table(spark, SF_DIR, "documents")
        .select(F.greatest(F.col("n_chars"), F.lit(1)).alias("w"))
        .collect()
    ]
    w_total = sum(weights)
    step = max(w_total // SAMPLE_TARGET, 1)
    # order-independent: how many docs contain >=1 grid point depends
    # on the interval layout, but SUM over docs of min(points_in, 1)
    # == n_grid_points - sum(points_in - 1 over multi-point docs);
    # multi-point docs require w > step, so when max(w) <= step the
    # count is exactly w_total // step regardless of ordering.
    assert max(weights) <= step, (
        "fixture grew a doc heavier than the grid step — rewrite this "
        "test to walk the hash ordering instead of using the closed form"
    )
    assert n_selected == w_total // step, (
        f"grid selected {n_selected} docs, expected {w_total // step}"
    )


def test_systematic_sample_weight_proportionality(spark):
    """Selected COUNT per source tracks the source's share of total
    weight (the whole point of weighted sampling): expected count is
    w_src/step; because sources are interleaved by the hash-shuffled
    ordering, per-source counts behave like Bernoulli(w_i/step) sums
    (σ ≈ √exp), so assert a gross band — a sampler that ignores
    weights, drops a source, or over-selects 3× fails; honest
    systematic variance passes."""
    from oracle_to_cassandra_spark.queries.training_prep import SAMPLE_TARGET
    from oracle_to_cassandra_spark.sources import load_table

    df = E.queries()["weighted_systematic_sample"](spark, SF_DIR)
    per_source = {r["source"]: r["n_selected"] for r in df.collect()}
    totals = {
        r["source"]: r["w"]
        for r in load_table(spark, SF_DIR, "documents")
        .groupBy("source")
        .agg(F.sum(F.greatest(F.col("n_chars"), F.lit(1))).alias("w"))
        .collect()
    }
    w_total = sum(totals.values())
    step = max(w_total // SAMPLE_TARGET, 1)
    for src, w_src in totals.items():
        exp = w_src / step
        got = per_source.get(src, 0)
        assert exp / 3 - 2 <= got <= 3 * exp + 2, (
            f"source {src}: selected {got} docs, expected ≈{exp:.1f}"
        )


def test_fertility_floor_and_consistency(spark):
    """Every word yields >= 1 subword, so fertility_ppm >= 1e6; and a
    subword never exceeds its word, so chars_per_subword_ppm >= 1e6
    only when merges happened — at minimum it's >= 1e6 iff every
    subword is >= 1 char (always true)."""
    rows = E.queries()["tokenizer_fertility_per_lang"](spark, SF_DIR).collect()
    assert rows, "no languages in fertility rollup"
    for r in rows:
        assert r["fertility_ppm"] >= 1_000_000, (
            f"lang {r['lang']}: fertility below 1 subword/word"
        )
        assert r["chars_per_subword_ppm"] >= 1_000_000, (
            f"lang {r['lang']}: subwords longer than their words"
        )
        assert r["n_subwords"] >= r["n_words"]


def test_width_sensitivity_containment_bounds(spark):
    """n_common is an intersection: bounded by both pair counts, and
    the ppm column must be exactly n_common*1e6 div n_pairs_w3."""
    r = E.queries()["shingle_width_sensitivity"](spark, SF_DIR).collect()[0]
    assert r["n_common"] <= min(r["n_pairs_w3"], r["n_pairs_w5"])
    if r["n_pairs_w3"]:
        assert (
            r["w5_containment_ppm"]
            == r["n_common"] * 1_000_000 // r["n_pairs_w3"]
        )
