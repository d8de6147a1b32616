"""Grouped robust outlier flagging — ``groupBy().applyInPandas`` plumbing.

Median / MAD (median absolute deviation) are the robust location/scale
pair quality pipelines prefer over mean/stddev (one corrupt 100 MB
document shifts a mean; it barely moves a median).  Neither is a
distributive aggregate, so the natural Spark shape is the grouped-map
pandas API: one shuffle on the group key, each task gets a whole group
as an Arrow-backed frame, numpy computes the exact medians.

Per-task memory is bounded by the largest group — right for grouping
keys like source/language/date whose groups fit a task (millions of
rows), wrong for a single giant group; pre-split such keys or fall
back to ``approx_percentile``-based scoring.

Reference analogue: none (the reference has no statistics at all);
part of the engine's data-quality surface next to
``operators/expectations.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def grouped_mad_outliers(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Rows whose ``value_col`` deviates from its group median by more
    than ``k`` × the group's MAD, annotated with the group stats.

    Output: input schema + ``group_median``, ``group_mad`` (doubles).
    Groups with MAD 0 (constant values) flag nothing.
    """
    for c in (group_col, value_col):
        if c not in df.columns:
            raise ValueError(f"missing column {c!r}")
    out_schema = StructType(
        df.schema.fields
        + [
            StructField("group_median", DoubleType(), True),
            StructField("group_mad", DoubleType(), True),
        ]
    )

    def flag(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].astype(float).to_numpy()
        # nan-aware stats: SQL median/mad ignore NULLs, so one NULL row
        # must not poison the whole group's median/MAD to NaN (which
        # would silently disable detection for the group); NULL rows
        # themselves are never flagged (NaN comparisons are False)
        med = float(np.nanmedian(x)) if np.any(~np.isnan(x)) else float("nan")
        mad = float(np.nanmedian(np.abs(x - med)))
        out = pdf.copy()
        out["group_median"] = med
        out["group_mad"] = mad
        if not mad > 0.0:  # constant group (0) or all-NULL group (nan)
            return out.iloc[0:0]
        with np.errstate(invalid="ignore"):
            return out[np.abs(x - med) > k * mad]

    return df.groupBy(group_col).applyInPandas(flag, schema=out_schema)
