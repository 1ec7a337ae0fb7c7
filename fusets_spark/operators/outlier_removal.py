"""Outlier removal — the reference's `remove_outliers` (reference
_phenolopy.py:176-315), median and zscore methods, as a native window plan.

median: a value is an outlier candidate when |v − rolling_median| exceeds
cutoff = std_pop(series) · user_factor; the centered count-based rolling
median uses the reference's window-sizing rule (n_obs/7/n_years, min 3,
forced odd — computed dataset-level like the reference's cube-level window,
:246-265) with edge windows falling back to the original value (:264-268).
zscore: candidate when |(v − mean)/std_pop| > the critical value for the
p-value (:276-291).

Both then apply the neighbor check (:293-300): the candidate survives only
if v < mean(prev, next) − cutoff OR v > fmax(prev, next) + cutoff (NULL
neighbors behave like the reference's NaNs: greatest() skips them; the
mean-branch NULLs out, i.e. can't fire).

Output: input columns + value_clean (NULL where outlier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SERIES_KEYS = ("source", "doc_id")

_CRIT = {0.01: 2.3263, 0.05: 1.6449, 0.1: 1.2816}


def derive_window_size(df: DataFrame, value_col: str = "value") -> int:
    """Reference window rule at dataset level: (time steps per series) / 7
    / (number of years), min 3, forced odd."""
    stats = df.agg(
        (F.count(value_col) / F.count_distinct(*SERIES_KEYS)).alias("n"),
        F.count_distinct(F.year("ts")).alias("yrs"),
    ).collect()[0]
    win = int(int(stats["n"]) / 7 / max(int(stats["yrs"]), 1))
    if win < 3:
        win = 3
    elif win % 2 == 0:
        win += 1
    return win


def remove_outliers(
    df: DataFrame,
    method: str = "median",
    user_factor: float = 2.0,
    z_pval: float = 0.05,
    win_size: int | None = None,
    value_col: str = "value",
    out_col: str = "value_clean",
) -> DataFrame:
    assert method in ("median", "zscore")
    v = F.col(value_col)
    w = Window.partitionBy(*SERIES_KEYS)
    wo = Window.partitionBy(*SERIES_KEYS).orderBy("ts")

    cutoff = F.stddev_pop(v).over(w) * F.lit(user_factor)

    if method == "median":
        if win_size is None:
            win_size = derive_window_size(df, value_col)
        k = win_size // 2
        wroll = wo.rowsBetween(-k, k)
        med = F.expr(f"percentile({value_col}, 0.5)").over(wroll)
        full = F.count(v).over(wroll) == win_size
        # edge windows: reference replaces the NaN median with the original
        # value -> |v - v| = 0 -> never a candidate
        center = F.when(full, med).otherwise(v)
        candidate = F.abs(v - center) > cutoff
    else:
        crit = _CRIT[z_pval]
        z = (v - F.avg(v).over(w)) / F.stddev_pop(v).over(w)
        candidate = F.abs(z) > F.lit(crit)

    prev_v = F.lag(v).over(wo)
    next_v = F.lead(v).over(wo)
    nbr_mean = (prev_v + next_v) / 2
    nbr_max = F.greatest(prev_v, next_v)
    outlier = candidate & (
        (v < (nbr_mean - cutoff)) | (v > (nbr_max + cutoff))
    )
    return df.withColumn(out_col, F.when(outlier, F.lit(None)).otherwise(v))
