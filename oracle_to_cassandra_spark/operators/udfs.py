"""Pandas-UDF surface (north-star: the sanctioned Python escape hatch).

The reference has no UDFs (SURVEY.md §2.6); these exist to prove the
Arrow-vectorized path end-to-end with deterministic formulas that SQL
can mirror, so even the Python stages are driver-hash-checked.

Scale notes: scalar pandas UDFs stream Arrow batches through one
Python worker per core — ~10-100× faster than row-at-a-time UDFs but
still ~5-10× slower than JVM built-ins; use ONLY when built-ins can't
express the op. ``applyInPandas`` additionally shuffles on the group
key and materializes each group in memory — bound group sizes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


@F.pandas_udf(DoubleType())
def log_price_score(price: pd.Series, quantity: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: a deterministic scoring formula
    computed with numpy ufuncs over Arrow batches."""
    import numpy as np

    return np.log1p(price) * np.sqrt(quantity)


def zscore_per_group(df: DataFrame, key: str, value: str) -> DataFrame:
    """Grouped-map applyInPandas: per-group z-score normalization —
    the 'custom per-group algorithm' template (each group arrives as
    one pandas DataFrame).

    The same semantics ARE expressible with window functions (and the
    SQL oracle uses exactly that) — this operator exists to verify the
    grouped-map plumbing against a known-good twin."""
    out_schema = f"{key} string, {value} double, zscore double"

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf[value].mean()
        sd = pdf[value].std(ddof=1)
        pdf = pdf[[key, value]].copy()
        # single-row/zero-variance groups: pandas yields NaN (std
        # NaN or 0-division) where SQL stddev_samp arithmetic yields
        # NULL — map to None so the twins agree on the exact bytes
        z = (pdf[value] - mu) / sd
        pdf["zscore"] = z.round(6).where(z.notna(), None)
        return pdf

    return df.select(key, value).groupBy(key).applyInPandas(_z, schema=out_schema)
