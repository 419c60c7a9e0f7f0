"""Local replica of the driver's differential check: run the Spark
query and its DuckDB oracle, normalize (columns sorted by name, rows
sorted by all columns, timestamps → ISO strings), and compare values.

If this passes at sf0.001/sf0.01 the driver's hash compare should too.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
from pyspark.sql import DataFrame


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver hashes exact values; we normalize through repr after
        # the queries' own explicit rounding
        return repr(round(v, 9))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _normalize(rows: list[tuple], cols: list[str]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple(str(x) for x in r))
    return [cols[i] for i in order], out


def compare_query(
    spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"
) -> None:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    cur = con.execute(sql)
    d_cols = [d[0] for d in cur.description]
    d_rows = [tuple(r) for r in cur.fetchall()]

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    _, s_norm = _normalize(s_rows, s_cols)
    _, d_norm = _normalize(d_rows, d_cols)
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        assert a == b, f"{name}: first differing row #{i}: spark={a} duckdb={b}"
