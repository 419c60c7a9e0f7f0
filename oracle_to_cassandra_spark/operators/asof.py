"""As-of join — a custom operator Spark lacks natively (north-star
"operator the reference/Spark doesn't have", SURVEY.md §2.6 table:
composition of existing DataFrame ops).

Semantics: for each left row, attach the most recent right row with
the same key and right.ts <= left.ts (ties: latest right wins; equal
right timestamps broken by the largest id).

Implementation — the SCALABLE union+window rewrite, not a range
cross-join:

  1. tag both inputs and union them on (key, ts) — one dataset,
     right rows interleaved before the left rows they answer
  2. per key ordered by (ts, side): last_value(right_payload,
     ignoreNulls) over rows-unbounded-preceding carries the latest
     right row forward
  3. keep left rows

Cost: ONE shuffle on the key + a within-partition sort — linear at
100 TB, vs the quadratic blow-up of the naive
``l JOIN r ON key AND r.ts <= l.ts`` + argmax rewrite. (The same
union-scan trick is how streaming engines do temporal joins.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right``
    payload at or before its timestamp (NULLs where none exists).

    Tie-break contract: the struct comparison that resolves EQUAL
    right timestamps is lexicographic over ``payload_cols`` order, so
    the intended tie-break column (the id) must come FIRST in
    ``payload_cols`` — callers choosing a different leading column
    get max-of-that-column tie-breaks instead.

    A right row with NULL ``right_ts`` is dropped up front: it can
    never satisfy ``right.ts <= left.ts`` (SQL three-valued logic —
    the DuckDB argmax twin excludes it), but ascending-NULLS-FIRST
    ordering would otherwise place it at the partition head where
    ``last(ignorenulls)`` carries it into every left row."""
    l_tag = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r_tag = (
        right.filter(F.col(right_ts).isNotNull())
        .withColumn("_side", F.lit(0))
        .withColumn("_ts", F.col(right_ts))
        .withColumn("_payload", F.struct(*[F.col(c) for c in payload_cols]))
    )
    l_cols = [c for c in left.columns]
    unioned = l_tag.select(
        key, "_ts", "_side", *[c for c in l_cols if c != key], F.lit(None).cast(
            r_tag.schema["_payload"].dataType
        ).alias("_payload")
    ).unionByName(
        r_tag.select(
            key, "_ts", "_side", *[F.lit(None).alias(c) for c in l_cols if c != key], "_payload"
        )
    )
    # right rows (_side=0) sort before left rows at equal timestamps →
    # an exactly-simultaneous right row IS visible to the left row.
    # "_payload" is the final sort key: among right rows with EQUAL
    # timestamps, struct ordering (lexicographic over payload_cols)
    # makes F.last deterministically carry the max-payload row — the
    # "largest id wins" tie rule, independent of partition input order
    # (left rows all have NULL payload, which sorts first and never
    # reorders them relative to each other's distinct output rows)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side", "_payload")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_asof", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).select(
        key,
        *[c for c in l_cols if c != key],
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in payload_cols],
    )
    return out
