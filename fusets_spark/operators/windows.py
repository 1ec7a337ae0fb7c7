"""Per-series window features — native Spark window functions.

Mirrors (SURVEY.md §2.5):
  * lag/lead t±1, t±2 edge-padded features (reference
    improved_s1_ndvi_fusion_v2.py:94-155)
  * 3/5-point moving averages (same file, ~:124-131)
  * shift ±1 neighbors (reference _phenolopy.py:291-300)
  * time derivative (reference _phenolopy.py:1342 `differentiate('time')`)

No UDFs — everything stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import epoch_us

SERIES_KEYS = ("source", "doc_id")


def _w():
    return Window.partitionBy(*SERIES_KEYS).orderBy("ts")


def lag_lead_features(df: DataFrame, value_col: str = "value") -> DataFrame:
    """t±1, t±2 temporal features with EDGE padding (np.pad mode='edge' in
    the reference: boundary value replicated), plus the derived features the
    reference emits (improved_s1_ndvi_fusion_v2.py:116-153): 3/5-point
    averages over padded values, backward/forward diffs, weighted trend
    (2·fwd + bwd)/3, and volatility |fwd| + |bwd|."""
    w = _w()
    v = F.col(value_col)
    lag1 = F.coalesce(F.lag(v, 1).over(w), v)
    lag2 = F.coalesce(F.lag(v, 2).over(w), F.lag(v, 1).over(w), v)
    lead1 = F.coalesce(F.lead(v, 1).over(w), v)
    lead2 = F.coalesce(F.lead(v, 2).over(w), F.lead(v, 1).over(w), v)
    out = (
        df.withColumn("v_lag1", lag1)
        .withColumn("v_lag2", lag2)
        .withColumn("v_lead1", lead1)
        .withColumn("v_lead2", lead2)
    )
    bwd = v - F.col("v_lag1")
    fwd = F.col("v_lead1") - v
    return (
        out.withColumn("avg3", (F.col("v_lag1") + v + F.col("v_lead1")) / 3)
        .withColumn(
            "avg5",
            (
                F.col("v_lag2") + F.col("v_lag1") + v
                + F.col("v_lead1") + F.col("v_lead2")
            ) / 5,
        )
        .withColumn("backward_diff", bwd)
        .withColumn("forward_diff", fwd)
        .withColumn("trend", (2 * fwd + bwd) / 3)
        .withColumn("volatility", F.abs(fwd) + F.abs(bwd))
    )


def moving_average(df: DataFrame, n_points: int, value_col: str = "value",
                   out_col: str | None = None) -> DataFrame:
    """Centered n-point moving average (n odd): rowsBetween(-k, k)."""
    assert n_points % 2 == 1
    k = n_points // 2
    w = _w().rowsBetween(-k, k)
    return df.withColumn(
        out_col or f"ma{n_points}", F.avg(F.col(value_col)).over(w)
    )


def time_derivative(df: DataFrame, value_col: str = "value",
                    out_col: str = "dvdt") -> DataFrame:
    """(v - lag(v)) / Δt_seconds — the reference's differentiate('time')
    scaled to per-second; NULL at each series head."""
    w = _w()
    v = F.col(value_col)
    dv = v - F.lag(v, 1).over(w)
    dt_us = epoch_us("ts") - F.lag(epoch_us("ts"), 1).over(w)
    return df.withColumn(out_col, dv / (dt_us / F.lit(1000000.0)))


def linear_interpolate(df: DataFrame, value_col: str = "value",
                       out_col: str = "value_interp") -> DataFrame:
    """Linear interpolation of NULL values along time per series
    (reference _phenolopy.py:601-690 interpolate_na(dim='time')).

    Pure window plan: last/next non-null value and timestamp, then the
    two-point line formula. Leading/trailing gaps stay at nearest value
    (ffill/bfill at edges like xarray with fill_value extrapolation off).
    """
    v = F.col(value_col)
    t = epoch_us("ts")
    wp = (
        Window.partitionBy(*SERIES_KEYS)
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(*SERIES_KEYS)
        .orderBy("ts")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last(v, ignorenulls=True).over(wp)
    next_v = F.first(v, ignorenulls=True).over(wn)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wp)
    next_t = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(wn)
    interp = F.when(v.isNotNull(), v).otherwise(
        F.when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .when(next_t == prev_t, prev_v)
        .otherwise(
            prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
        )
    )
    return df.withColumn(out_col, interp)
