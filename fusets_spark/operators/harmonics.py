"""CCDC-style harmonic curve fit (reference ccdc.py:118-154
`fit_harmonics_curve`): per series, regress the values on a Fourier design
matrix [1, t, cos(2πkt/365.25), sin(2πkt/365.25) for k=1..K] where t = days
since the series' FIRST observation (reference ccdc.py:140-141
`dates_np - dates_np[0]`). The reference uses lcmap-pyccd's lasso
(tiny regularization); plain OLS recovers the same coefficients within the
reference's own tolerance (tests/test_ccdc.py:32-34, atol=3) and is
closed-form + deterministic.

num_coefficients: 4 (intercept, slope, cos1, sin1), 6 (+cos2, sin2),
8 (+cos3, sin3) — the CCDC model sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AVG_DAYS_YR = 365.25


def design_matrix(t_days: np.ndarray, num_coefficients: int) -> np.ndarray:
    assert num_coefficients in (4, 6, 8)
    w = 2 * np.pi / AVG_DAYS_YR
    cols = [np.ones_like(t_days), t_days]
    for k in range(1, (num_coefficients - 2) // 2 + 1):
        cols.append(np.cos(k * w * t_days))
        cols.append(np.sin(k * w * t_days))
    return np.stack(cols, axis=1)


def fit_harmonics_series(
    t_days: np.ndarray, y: np.ndarray, num_coefficients: int = 4
) -> np.ndarray:
    """OLS fit; returns num_coefficients coefficients. NaNs dropped
    (reference ccdc.py:95-97)."""
    ok = ~np.isnan(y)
    X = design_matrix(t_days[ok] - t_days[ok][0], num_coefficients)
    coef, *_ = np.linalg.lstsq(X, y[ok], rcond=None)
    return coef


def harmonic_fit(
    df: DataFrame,
    num_coefficients: int = 4,
    groups_per_source: int | None = None,
) -> DataFrame:
    """Per-series harmonic coefficients over (source, doc_id, ts, value).

    Output: (source, doc_id, n_obs, c0..c{k-1}) with c0=intercept,
    c1=slope/day, then cos/sin pairs per harmonic."""
    cols = ", ".join(f"c{i} double" for i in range(num_coefficients))
    schema = f"source string, doc_id string, n_obs long, {cols}"

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["doc_id", "ts"], kind="mergesort")
        rows = []
        for doc, g in pdf.groupby("doc_id", sort=False):
            day = (g["ts"].astype("int64") // 10**9).to_numpy() / 86400.0
            y = g["value"].to_numpy(np.float64)
            ok = ~np.isnan(y)
            if ok.sum() < num_coefficients:
                continue
            coef = fit_harmonics_series(day, y, num_coefficients)
            rows.append((g["source"].iloc[0], doc, int(ok.sum()), *coef))
        return pd.DataFrame(
            rows,
            columns=["source", "doc_id", "n_obs"]
            + [f"c{i}" for i in range(num_coefficients)],
        )

    from ..session import default_groups, repartition_for_kernel

    groups_per_source = groups_per_source or default_groups(df)
    grouped = df.withColumn(
        "_g", F.pmod(F.xxhash64("doc_id"), F.lit(groups_per_source))
    )
    return repartition_for_kernel(grouped, "source", "_g").groupBy("source", "_g").applyInPandas(_fit, schema=schema)


def harmonic_fitted(
    df: DataFrame,
    num_coefficients: int = 4,
    groups_per_source: int | None = None,
) -> DataFrame:
    """Per-point FITTED values ŷ = X(XᵀX)⁻¹Xᵀy of the harmonic OLS fit —
    the verifiable face of harmonic_fit: fitted values are invariant to the
    basis spanning the model space, so a SQL oracle can evaluate the same
    projection through a stable orthogonalized basis and match to 6dp,
    where raw normal-equation COEFFICIENTS of the near-collinear Fourier
    design would not be comparable. Series with fewer than
    num_coefficients observations are dropped (as in harmonic_fit)."""

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["doc_id", "ts"], kind="mergesort")
        outs = []
        for doc, g in pdf.groupby("doc_id", sort=False):
            day = (g["ts"].astype("int64") // 10**9).to_numpy() / 86400.0
            y = g["value"].to_numpy(np.float64)
            ok = ~np.isnan(y)
            if ok.sum() < num_coefficients:
                continue
            coef = fit_harmonics_series(day, y, num_coefficients)
            X = design_matrix(day - day[ok][0], num_coefficients)
            outs.append(
                pd.DataFrame(
                    {
                        "source": g["source"].to_numpy(),
                        "doc_id": doc,
                        "ts": g["ts"].to_numpy(),
                        "yhat": X @ coef,
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                columns=["source", "doc_id", "ts", "yhat"]
            ).astype({"source": str, "doc_id": str, "yhat": np.float64})
        return pd.concat(outs, ignore_index=True)

    from ..session import default_groups, repartition_for_kernel

    groups_per_source = groups_per_source or default_groups(df)
    grouped = df.withColumn(
        "_g", F.pmod(F.xxhash64("doc_id"), F.lit(groups_per_source))
    )
    return repartition_for_kernel(grouped, "source", "_g").groupBy("source", "_g").applyInPandas(
        _fit, schema="source string, doc_id string, ts timestamp, yhat double"
    )
