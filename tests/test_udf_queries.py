"""Python-batch-tier regression tests (the exactnum.py fold audit).

The r11 streaming fix (`streaming/stateful.py:_int_sum`) closed one
instance of the float64/2^53 hazard: an int64 quantity that transits a
float64 dtype silently rounds past 2^53. The r11 verdict (item 4)
ordered an audit of every remaining pandas-boundary integer fold; the
one hit was `queries/udfs.py:cogrouped_order_reconciliation`, where
the LEFT-merge of per-order line totals upcast the int64 column to
float64 whenever any header had zero lines (NaN forces the upcast).
The fix casts to nullable Int64 BEFORE the merge. This test drives
the full cogroup query over planted parquet where one order's cents
total lands on 2^53 + odd — unrepresentable in float64 — alongside a
header-only order that forces the NaN upcast pre-fix.
"""

from __future__ import annotations


# 91 lines of 1e14 cents + 1 line of 1 cent = 9_100_000_000_000_001,
# which exceeds 2^53 (~9.007e15) and is ODD, so float64 (spacing 2 up
# there) cannot represent it — the pre-fix merge would round it.
_BIG_CENTS_LINES = 91
_BIG_PRICE = 1.0e12  # cents 1e14 per line, individually float64-exact
_EXPECT_TOTAL = _BIG_CENTS_LINES * 10**14 + 1
assert _EXPECT_TOTAL > 2**53 and _EXPECT_TOTAL % 2 == 1
assert float(_EXPECT_TOTAL) != _EXPECT_TOTAL  # the hazard being guarded


def test_reconcile_merge_exact_past_2_53(spark, tmp_path):
    from oracle_to_cassandra_spark.queries.udfs import (
        cogrouped_order_reconciliation,
    )

    # both keys pass the query's `% 5 == 0` pushdown filter; key 10
    # has NO lines, which is what forced the float64 upcast pre-fix
    spark.createDataFrame(
        [(5, 1.0), (10, 123.0)], "o_orderkey long, o_totalprice double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    lines = [(5, _BIG_PRICE)] * _BIG_CENTS_LINES + [(5, 0.01)]
    spark.createDataFrame(
        lines, "l_orderkey long, l_extendedprice double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")

    rows = {
        r["o_orderkey"]: r
        for r in cogrouped_order_reconciliation(spark, str(tmp_path)).collect()
    }
    assert rows[5]["lines_total_cents"] == _EXPECT_TOTAL
    assert rows[5]["n_lines"] == _BIG_CENTS_LINES + 1
    assert rows[10]["lines_total_cents"] == 0
    assert rows[10]["n_lines"] == 0
