"""Whittaker–Eilers gap-fill + smoothing (2nd order).

Solves (W + λ·D₂ᵀD₂) z = W·y per series on a dense regular grid, where W is
the 0/1 observation-weight diagonal (missing = weight 0, the reference's NaN
convention; reference whittaker.py:40-42, 154-176 via the Cython
`vam.whittaker.ws2d`). Here the pentadiagonal system is solved with a pure
numpy banded LDLᵀ factorization, vectorized ACROSS SERIES: one Spark group =
many whole series padded to a (S, n_max) matrix, so the sequential time loop
runs O(n) numpy ops each covering S series — no per-row or per-series Python
in the hot path.

Grid semantics mirror the reference (whittaker.py:123-196): dense grid from
each series' first to last observation at `grid_seconds` cadence; multiple
observations landing in one grid cell -> last assignment wins (whittaker.py
:158-169 does exactly this via integer day indexing); `sample_every=d`
stride-samples grid points 0, d, 2d, ... (whittaker.py:181-190).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SMOOTH_SCHEMA = "source string, doc_id string, ts timestamp, value_smooth double"


def second_diff_bands(n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Bands (main, first-off, second-off) of D₂ᵀD₂ for n grid points."""
    m0 = np.zeros(n)
    m1 = np.zeros(max(n - 1, 0))
    m2 = np.zeros(max(n - 2, 0))
    if n >= 3:
        for k, c in enumerate((1.0, -2.0, 1.0)):
            m0[k : k + n - 2] += c * c
        for k, (c0, c1) in enumerate(((1.0, -2.0), (-2.0, 1.0))):
            m1[k : k + n - 2] += c0 * c1
        m2[: n - 2] += 1.0
    return m0, m1, m2


def whittaker_solve(Y: np.ndarray, W: np.ndarray, lmbd: float) -> np.ndarray:
    """Solve (diag(w) + λ D₂ᵀD₂) z = w*y for each row of Y (shape S×n).

    W rows may be 0/1 or arbitrary nonnegative weights. Fully-masked columns
    (padding) must carry w=0 AND be beyond the series' own length — callers
    pass per-series n via padding with w=0, which keeps the system SPD as
    long as each series has ≥1 observed point (a tiny ridge guards the rest).
    """
    Y = np.asarray(Y, dtype=np.float64)
    W = np.asarray(W, dtype=np.float64)
    S, n = Y.shape
    if n == 0:
        return Y.copy()
    m0, m1, m2 = second_diff_bands(n)
    ridge = 1e-9  # keeps padded/empty rows nonsingular without moving results
    a0 = W + lmbd * m0 + ridge
    a1 = np.broadcast_to(lmbd * m1, (S, max(n - 1, 0)))
    a2 = np.broadcast_to(lmbd * m2, (S, max(n - 2, 0)))
    b = W * Y

    # banded LDLᵀ, time loop sequential, series axis vectorized
    d = np.empty((S, n))
    l1 = np.zeros((S, n))
    l2 = np.zeros((S, n))
    d[:, 0] = a0[:, 0]
    if n > 1:
        l1[:, 1] = a1[:, 0] / d[:, 0]
        d[:, 1] = a0[:, 1] - l1[:, 1] ** 2 * d[:, 0]
    for i in range(2, n):
        l2[:, i] = a2[:, i - 2] / d[:, i - 2]
        l1[:, i] = (a1[:, i - 1] - l2[:, i] * l1[:, i - 1] * d[:, i - 2]) / d[:, i - 1]
        d[:, i] = (
            a0[:, i] - l1[:, i] ** 2 * d[:, i - 1] - l2[:, i] ** 2 * d[:, i - 2]
        )

    # forward substitution L c = b
    c = np.empty((S, n))
    c[:, 0] = b[:, 0]
    if n > 1:
        c[:, 1] = b[:, 1] - l1[:, 1] * c[:, 0]
    for i in range(2, n):
        c[:, i] = b[:, i] - l1[:, i] * c[:, i - 1] - l2[:, i] * c[:, i - 2]
    c /= d
    # back substitution Lᵀ z = c
    z = np.empty((S, n))
    z[:, n - 1] = c[:, n - 1]
    if n > 1:
        z[:, n - 2] = c[:, n - 2] - l1[:, n - 1] * z[:, n - 1]
    for i in range(n - 3, -1, -1):
        z[:, i] = c[:, i] - l1[:, i + 1] * z[:, i + 1] - l2[:, i + 2] * z[:, i + 2]
    return z


def whittaker_vcurve(
    Y: np.ndarray,
    W: np.ndarray,
    llas: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-series V-curve λ selection (Eilers' V-curve, the reference's
    `ws2doptv` path taken when smoothing_lambda < 0, whittaker.py:172-174):
    solve on a log10-λ grid, compute fit = Σ w(y−z)² and penalty = Σ(Δ²z)²
    per λ, and pick λ = 10^midpoint at the minimum of
    v = sqrt(Δlog(fit)² + Δlog(pen)²) / Δlog10(λ) between consecutive grid
    points. Vectorized across series (one grid solve per λ over the whole
    (S, n) batch).

    Returns (z, lambda) per series: the final solve uses each series' own
    selected λ."""
    if llas is None:
        llas = np.arange(-2.0, 8.0, 0.5)  # log10 grid
    S, n = Y.shape
    n_l = len(llas)
    fits = np.empty((n_l, S))
    pens = np.empty((n_l, S))
    for i, la in enumerate(llas):
        z = whittaker_solve(Y, W, 10.0**la)
        fits[i] = np.sum(W * (Y - z) ** 2, axis=1)
        d2 = np.diff(z, 2, axis=1)
        pens[i] = np.sum(d2**2, axis=1)
    eps = 1e-300
    lf = np.log10(fits + eps)
    lp = np.log10(pens + eps)
    dl = np.diff(llas)
    v = np.sqrt(np.diff(lf, axis=0) ** 2 + np.diff(lp, axis=0) ** 2) / dl[:, None]
    k = np.argmin(v, axis=0)  # per series
    lopt = 10.0 ** ((llas[k] + llas[k + 1]) / 2)
    z_final = np.empty((S, n))
    # final solve batched per distinct selected λ (grid has few values)
    for lam in np.unique(lopt):
        sel = lopt == lam
        z_final[sel] = whittaker_solve(Y[sel], W[sel], float(lam))
    return z_final, lopt


def whittaker_smooth_series(
    epoch: np.ndarray,
    values: np.ndarray,
    lmbd: float,
    grid_seconds: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Single-series helper (numpy oracle + small inputs): returns
    (grid_epoch, smoothed) on the dense grid from first to last obs."""
    idx = ((epoch - epoch[0]) // grid_seconds).astype(np.int64)
    n = int(idx[-1]) + 1
    y = np.zeros(n)
    w = np.zeros(n)
    y[idx] = values  # last assignment wins, as in the reference
    w[idx] = 1.0
    z = whittaker_solve(y[None, :], w[None, :], lmbd)[0]
    grid = epoch[0] + grid_seconds * np.arange(n)
    return grid, z


def whittaker_gapfill(
    points: DataFrame,
    lmbd: float = 10000.0,
    grid_seconds: int = 86400,
    sample_every: int | None = None,
    groups_per_source: int | None = None,
    max_grid: int = 100_000,
) -> DataFrame:
    """Distributed gap-fill: dense-grid Whittaker smoothing per series.

    points: (source, doc_id, ts, value) with missing rows absent.
    Output: (source, doc_id, ts, value_smooth) on each series' dense grid
    (optionally stride-sampled every `sample_every` grid steps).

    Scale design: groups are (source, hash(doc_id) % groups_per_source) so one
    applyInPandas call receives MANY whole series; they are padded to a
    common grid length and solved as one (S, n_max) matrix. groups_per_source
    tunes task granularity at cluster scale; results are independent of it.
    """

    def _smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        out_frames = []
        pdf = pdf.sort_values(["doc_id", "ts"], kind="mergesort")
        epoch_all = pdf["ts"].astype("int64").to_numpy() // 10**9
        vals_all = pdf["value"].to_numpy(dtype=np.float64)
        codes, starts = np.unique(pdf["doc_id"].to_numpy(), return_index=True)
        bounds = np.r_[starts, len(pdf)]
        series = []
        for k in range(len(codes)):
            sl = slice(bounds[k], bounds[k + 1])
            ep, vv = epoch_all[sl], vals_all[sl]
            idx = ((ep - ep[0]) // grid_seconds).astype(np.int64)
            n = min(int(idx[-1]) + 1, max_grid)
            keep = idx < n
            series.append((codes[k], ep[0], n, idx[keep], vv[keep]))
        if not series:
            return pd.DataFrame(
                columns=["source", "doc_id", "ts", "value_smooth"]
            )
        n_max = max(s[2] for s in series)
        S = len(series)
        Y = np.zeros((S, n_max))
        W = np.zeros((S, n_max))
        for r, (_, _, n, idx, vv) in enumerate(series):
            Y[r, idx] = vv
            W[r, idx] = 1.0
        Z = whittaker_solve(Y, W, lmbd)
        src = pdf["source"].iloc[0]
        for r, (doc, ep0, n, _, _) in enumerate(series):
            take = np.arange(0, n, sample_every) if sample_every else np.arange(n)
            grid = ep0 + grid_seconds * take
            out_frames.append(
                pd.DataFrame(
                    {
                        "source": src,
                        "doc_id": doc,
                        "ts": pd.to_datetime(grid * 10**9),
                        "value_smooth": Z[r, take],
                    }
                )
            )
        return pd.concat(out_frames, ignore_index=True)

    from ..session import default_groups

    groups_per_source = groups_per_source or default_groups(points)
    grouped = points.withColumn(
        "_g", F.pmod(F.xxhash64("doc_id"), F.lit(groups_per_source))
    )
    return grouped.groupBy("source", "_g").applyInPandas(
        _smooth, schema=SMOOTH_SCHEMA
    )
