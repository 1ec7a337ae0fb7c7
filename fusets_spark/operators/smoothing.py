"""Savitzky–Golay and Gaussian smoothing (reference _phenolopy.py:765-779
`remove_noise_savitsky` / `remove_noise_gaussian`, scipy savgol_filter /
gaussian_filter1d) — reimplemented in pure numpy with scipy's default
semantics, run vectorized across many whole series per Arrow group.

Savitzky–Golay (mode='interp', scipy default): interior = convolution with
the least-squares coefficient window; the first/last half-windows are
evaluated from a polyorder-degree polynomial fit to the first/last `window`
samples (exactly scipy's _fit_edges_polyfit).

Gaussian (mode='reflect', truncate=4.0, scipy defaults): convolution with a
normalized Gaussian kernel over reflect-padded values.

Both assume regular sampling along the row order (the reference applies
them to resampled/interpolated cubes, _phenolopy.py:711-800).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SMOOTH_SCHEMA = "source string, doc_id string, ts timestamp, value_smooth double"


def savgol_coeffs(window: int, polyorder: int) -> np.ndarray:
    """Least-squares smoothing coefficients for the centered window
    (equivalent to scipy.signal.savgol_coeffs(..., deriv=0), derived from
    the normal equations of a polynomial fit on [-k..k])."""
    assert window % 2 == 1 and polyorder < window
    k = window // 2
    x = np.arange(-k, k + 1, dtype=np.float64)
    A = np.vander(x, polyorder + 1, increasing=True)  # (window, p+1)
    # projection of the delta at center onto the polynomial space:
    # coeffs = e0^T (A^T A)^{-1} A^T
    ATA_inv = np.linalg.inv(A.T @ A)
    return (A @ ATA_inv)[:, 0]  # value at x=0 is the 0th poly coefficient


def savgol_1d(y: np.ndarray, window: int, polyorder: int) -> np.ndarray:
    n = len(y)
    if n < window:
        # degenerate: single global polynomial fit (scipy raises; we fit)
        x = np.arange(n, dtype=np.float64)
        if n <= polyorder:
            return y.astype(np.float64).copy()
        c = np.polynomial.polynomial.polyfit(x, y, polyorder)
        return np.polynomial.polynomial.polyval(x, c)
    k = window // 2
    c = savgol_coeffs(window, polyorder)
    out = np.convolve(y, c[::-1], mode="same")
    # edges: polynomial fit to the first/last `window` samples (mode=interp)
    x = np.arange(window, dtype=np.float64)
    cl = np.polynomial.polynomial.polyfit(x, y[:window], polyorder)
    out[:k] = np.polynomial.polynomial.polyval(x[:k], cl)
    cr = np.polynomial.polynomial.polyfit(x, y[-window:], polyorder)
    out[-k:] = np.polynomial.polynomial.polyval(x[-k:], cr)
    return out


def gaussian_kernel(sigma: float, truncate: float = 4.0) -> np.ndarray:
    r = int(truncate * sigma + 0.5)
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_1d(y: np.ndarray, sigma: float, truncate: float = 4.0) -> np.ndarray:
    k = gaussian_kernel(sigma, truncate)
    r = len(k) // 2
    if r == 0 or len(y) == 0:
        return y.astype(np.float64).copy()
    # scipy mode='reflect' (edge sample included) == np.pad 'symmetric';
    # np.pad handles pad width > len(y) via repeated reflection
    yp = np.pad(y.astype(np.float64), r, mode="symmetric")
    return np.convolve(yp, k[::-1], mode="valid")


def _per_series(df: DataFrame, fn, groups_per_source: int) -> DataFrame:
    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["doc_id", "ts"], kind="mergesort")
        outs = []
        for doc, g in pdf.groupby("doc_id", sort=False):
            outs.append(
                pd.DataFrame(
                    {
                        "source": g["source"].to_numpy(),
                        "doc_id": doc,
                        "ts": g["ts"].to_numpy(),
                        "value_smooth": fn(g["value"].to_numpy(np.float64)),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    grouped = df.withColumn(
        "_g", F.pmod(F.xxhash64("doc_id"), F.lit(groups_per_source))
    )
    return grouped.groupBy("source", "_g").applyInPandas(_run, SMOOTH_SCHEMA)


def savgol_smooth(
    df: DataFrame, window: int = 7, polyorder: int = 2,
    groups_per_source: int = 64,
) -> DataFrame:
    return _per_series(
        df, lambda y: savgol_1d(y, window, polyorder), groups_per_source
    )


def gaussian_smooth(
    df: DataFrame, sigma: float = 1.5, groups_per_source: int = 64
) -> DataFrame:
    return _per_series(df, lambda y: gaussian_1d(y, sigma), groups_per_source)
