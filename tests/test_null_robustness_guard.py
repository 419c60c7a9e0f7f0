"""Static tripwire for the cross-engine NULL-semantics classes the
round-8 null-injection stress sweep (NULL_SWEEP.json) actually hit:

1. **Unpinned window ORDER BY over a nullable sort key.** Spark's ASC
   default is NULLS FIRST; DuckDB's is NULLS LAST — identical SQL
   diverges the moment the key acquires NULLs (bit
   `percent_rank_cume_dist` and `window_distribution_functions` live).
   Any oracle window ORDER BY naming a null-injectable column must
   carry an explicit ``NULLS FIRST|LAST``, and the Spark side the
   matching ``asc_nulls_*`` / ``desc_nulls_*``.

2. **NULL-propagating concat feeding a compare column.** ``concat``
   nulls the whole result if ANY argument is NULL, silently dropping
   rows from one side only (bit `url_parse_host_rollup` and
   `xpath_sidecar_extraction` live). Sites that build strings from
   nullable columns must coalesce them.

The guard is deliberately scoped to the columns the null stress
generator actually injects (tools/make_stress_data.py NULLS map) —
those are the columns whose nullability is part of the data contract;
keys, timestamps, and TPC-H measure columns are contractually
non-null and stay unguarded.
"""

from __future__ import annotations

import re

import __spark_entry__ as E

#: columns tools/make_stress_data.py --mode null actually nulls
NULLABLE_COLS = ("c_acctbal", "value", "props", "lang")

_WINDOW_ORDER = re.compile(
    r"over\s*(?:\w+\s*$|\()|window\s+\w+\s+as\s*\(", re.IGNORECASE
)


def _window_order_clauses(sql: str) -> list[str]:
    """Every ORDER BY clause that lives inside an OVER(...) or a named
    WINDOW spec (top-level ORDER BYs don't diverge: the compare sorts
    rows itself)."""
    out = []
    low = sql.lower()
    for m in re.finditer(r"(?:over|window\s+\w+\s+as)\s*\(", low):
        depth, i = 1, m.end()
        while i < len(low) and depth:
            depth += low[i] == "("
            depth -= low[i] == ")"
            i += 1
        body = low[m.end():i - 1]
        ob = body.find("order by")
        if ob >= 0:
            out.append(body[ob:])
        # frame clause after ORDER BY is harmless to include
    return out


def test_oracle_window_order_pins_nulls_on_nullable_cols():
    offenders = []
    for name, sql in E.oracle_sql().items():
        for clause in _window_order_clauses(sql):
            for col in NULLABLE_COLS:
                if not re.search(rf"\b{col}\b", clause):
                    continue
                # the NULLS directive must follow the column before
                # the next comma / end of clause
                seg = clause.split(col, 1)[1].split(",", 1)[0]
                if "nulls" not in seg:
                    offenders.append((name, col, clause[:80]))
    assert not offenders, (
        "window ORDER BY over a null-injectable column without an "
        "explicit NULLS FIRST/LAST (Spark and DuckDB default "
        f"OPPOSITE placements): {offenders}"
    )


def test_fixed_queries_survive_nulls_end_to_end(spark, tmp_path):
    """Dynamic twin of the static guard: rebuild the two live failure
    shapes on a 6-row frame with a NULL and assert Spark matches what
    the pinned-NULLS oracle computes (DuckDB checked in the full
    NULL_SWEEP; here the expectation is stated inline so the test
    stays hermetic)."""
    from pyspark.sql import Window, functions as F

    df = spark.createDataFrame(
        [(1, "A", 10.0), (2, "A", None), (3, "A", 30.0),
         (4, "B", None), (5, "B", 5.0), (6, "B", 5.0)],
        "k INT, seg STRING, bal DOUBLE",
    )
    w = Window.partitionBy("seg").orderBy(F.asc_nulls_first("bal"))
    got = {
        r["k"]: r["pr"]
        for r in df.select(
            "k", F.round(F.percent_rank().over(w), 6).alias("pr")
        ).collect()
    }
    # NULLS FIRST: the NULL row ranks lowest in each segment
    assert got[2] == 0.0 and got[4] == 0.0
    assert got[3] == 1.0 and got[1] == 0.5
    assert got[5] == 0.5 and got[6] == 0.5

    # concat propagates NULL; the coalesced build must not
    built = df.select(
        F.concat(
            F.lit("x="), F.coalesce(F.col("bal").cast("string"), F.lit(""))
        ).alias("u")
    )
    assert built.filter(F.col("u").isNull()).count() == 0
