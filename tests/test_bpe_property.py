"""Property test for the BPE greedy-merge fold: the Spark string fold
(`queries/bpe_train._MERGE_FOLD`) must agree with a straightforward
Python reference implementation of greedy left-to-right pair merging
on arbitrary words and arbitrary merge pairs — including the
consecutive-identical-pair and suffix-collision cases the edge test
pins by hand."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.queries.bpe_train import _MERGE_FOLD

_ALPHA = "abc"  # tiny alphabet maximizes pair collisions


def _ref_merge(symbols: list[str], p1: str, p2: str) -> list[str]:
    """Reference greedy left-to-right non-overlapping merge."""
    out: list[str] = []
    for s in symbols:
        if out and out[-1] == p1 and s == p2:
            out[-1] = p1 + p2
        else:
            out.append(s)
    return out


#: symbol lists, not raw words: later BPE rounds operate on already-
#: merged MULTI-character symbols, so the property must cover them
_SYMBOL = st.text(alphabet=_ALPHA, min_size=1, max_size=2)


@settings(max_examples=30, deadline=None)
@given(
    symbol_lists=st.lists(
        st.lists(_SYMBOL, min_size=1, max_size=8), min_size=1, max_size=8
    ),
    pair=st.tuples(_SYMBOL, _SYMBOL),
)
def test_merge_fold_matches_reference(spark, symbol_lists, pair):
    p1, p2 = pair
    rows = [(i, "·" + "·".join(syms)) for i, syms in enumerate(symbol_lists)]
    df = (
        spark.createDataFrame(rows, ["i", "sym"])
        .withColumn("p1", F.lit(p1))
        .withColumn("p2", F.lit(p2))
        .withColumn("merged", F.expr(_MERGE_FOLD))
    )
    got = {r["i"]: r["merged"] for r in df.collect()}
    for i, syms in enumerate(symbol_lists):
        expect = _ref_merge(syms, p1, p2)
        assert got[i] == "·" + "·".join(expect), (
            f"syms={syms!r} pair=({p1!r},{p2!r}): {got[i]!r} != {expect!r}"
        )
