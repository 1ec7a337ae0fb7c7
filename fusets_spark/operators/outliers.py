"""Temporal outlier filter — rolling z-score replace.

Mirror of the reference's `temporal_outliers_f` (temporal_outliers.py:48-70):
centered time-based rolling window (pandas rolling('20D', center=True,
closed='both')), rolling mean and std (ddof=1), and |z| > threshold values
replaced by the rolling mean.

Entirely native Spark window functions (no UDF): pandas' closed='both'
centered window of '20D' == rangeBetween(-10 days, +10 days) on epoch
seconds with avg / stddev_samp (ddof=1). Golden regression values pinned in
tests (reference tests/test_temporal_outliers.py:12-15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import epoch_us

SERIES_KEYS = ("source", "doc_id")


def temporal_outliers(
    df: DataFrame,
    window: str = "20D",
    threshold: float = 3.0,
    value_col: str = "value",
    out_col: str = "value_filtered",
) -> DataFrame:
    """Replace |z|>threshold points with the centered rolling mean.

    window: pandas-style day window 'ND' (centered, inclusive both ends).
    """
    assert window.endswith("D"), "window must be 'ND' days"
    days = float(window[:-1])
    half_us = int(days * 86400 * 10**6 // 2)  # µs: exact window boundaries
    w = (
        Window.partitionBy(*SERIES_KEYS)
        .orderBy(epoch_us("ts"))
        .rangeBetween(-half_us, half_us)
    )
    v = F.col(value_col)
    mean = F.avg(v).over(w)
    # pandas .std() default ddof=1 == stddev_samp
    std = F.stddev_samp(v).over(w)
    z = (v - mean) / std
    out = F.when(std.isNull() | (std == 0), v).otherwise(
        F.when(F.abs(z) > threshold, mean).otherwise(v)
    )
    return df.withColumn(out_col, out)
