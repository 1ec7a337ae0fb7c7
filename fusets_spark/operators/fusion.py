"""Multi-signal fusion — the reference's MOGPR (mogpr.py:139-221, 339-461)
recast as DETERMINISTIC per-series vectorized GP interpolation.

Reference structure preserved:
  * per series (pixel), per signal: drop NaNs (mogpr.py:384-385) and
    z-normalize with that signal's own mean/std (mogpr.py:390-393, ddof=0);
  * master-signal gating: no master data -> no output for the series
    (mogpr.py:395-399);
  * joint GP over ALL signals' observations with a coregionalized kernel,
    predict mean + std on the output grid, denormalize per signal
    (mogpr.py:434-449) -> `value_fused` / `value_std` (the reference's
    *_FUSED / *_STD bands, mogpr.py:202-211).

Where the reference optimizes GPy hyperparameters per pixel (L-BFGS,
NOT reproducible run-to-run — its own tests assert shapes only,
tests/test_mogpr.py:21-37), this engine fixes them: Matern-3/2 kernel with
lengthscale ℓ days, signal-correlation ρ (rank-1-style coregionalization:
B = (1-ρ)I + ρ·11ᵀ, PSD for 0 ≤ ρ ≤ 1), noise σₙ². Fixed hyperparameters
make outputs bit-reproducible at any parallelism — the engine's parity
requirement — and mirror the reference's own fit-once/apply-many
MOGPRTransformer pattern (mogpr.py:35-68, 414-426).

Scale note: exact GP is O(n³) per series; series here are single training
sequences (n ~ 10²-10³), solved dense per series inside a hash-bucketed
applyInPandas. For longer series, chunk the grid or use inducing points.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FUSED_SCHEMA = (
    "doc_id string, source string, ts timestamp, "
    "value_fused double, value_std double"
)

SQRT3 = float(np.sqrt(3.0))


def matern32(dist: np.ndarray, lengthscale: float) -> np.ndarray:
    r = SQRT3 * np.abs(dist) / lengthscale
    return (1.0 + r) * np.exp(-r)


def mogpr_fuse_series(
    signals: dict[str, tuple[np.ndarray, np.ndarray]],
    out_t: np.ndarray,
    lengthscale: float = 32.0,
    noise: float = 0.05,
    rho: float = 0.7,
    master: str | None = None,
) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Fuse one series. signals: {name: (t_days, values)} with NaNs allowed;
    returns {name: (fused_mean, fused_std)} on out_t (day floats).

    Empty master signal -> empty dict (reference qflag gating)."""
    names = sorted(signals)
    master = master or names[0]
    clean: dict[str, tuple[np.ndarray, np.ndarray, float, float]] = {}
    for name in names:
        t, y = signals[name]
        ok = ~np.isnan(y)
        if ok.sum() == 0:
            continue
        yy = y[ok]
        mu, sd = float(np.mean(yy)), float(np.std(yy))
        if sd == 0.0:
            sd = 1.0
        clean[name] = (t[ok], (yy - mu) / sd, mu, sd)
    if master not in clean:
        return {}

    sig_names = list(clean)
    T = np.concatenate([clean[s][0] for s in sig_names])
    Y = np.concatenate([clean[s][1] for s in sig_names])
    S = np.concatenate(
        [np.full(len(clean[s][0]), i) for i, s in enumerate(sig_names)]
    )
    n_sig = len(sig_names)
    B = (1.0 - rho) * np.eye(n_sig) + rho * np.ones((n_sig, n_sig))

    K = B[S[:, None], S[None, :]] * matern32(T[:, None] - T[None, :], lengthscale)
    A = K + noise * np.eye(len(T))
    L = np.linalg.cholesky(A)
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, Y))

    out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    base = matern32(out_t[:, None] - T[None, :], lengthscale)
    for i, s in enumerate(sig_names):
        Ks = B[i, S][None, :] * base  # (grid, obs)
        mu_n = Ks @ alpha
        v = np.linalg.solve(L, Ks.T)
        var = np.maximum(B[i, i] - np.sum(v * v, axis=0), 0.0)
        _, _, mean_s, std_s = clean[s]
        out[s] = (mu_n * std_s + mean_s, np.sqrt(var) * std_s)
    return out


def _log_marginal_likelihood(
    signals: dict[str, tuple[np.ndarray, np.ndarray]],
    lengthscale: float,
    noise: float,
    rho: float,
) -> float:
    """GP log marginal likelihood of one series' joint observations under
    the fixed-hyperparameter kernel (normalized per signal)."""
    names = sorted(signals)
    ts, ys, ss = [], [], []
    for i, name in enumerate(names):
        t, y = signals[name]
        ok = ~np.isnan(y)
        if ok.sum() == 0:
            continue
        yy = y[ok]
        sd = float(np.std(yy)) or 1.0
        ts.append(t[ok])
        ys.append((yy - np.mean(yy)) / sd)
        ss.append(np.full(ok.sum(), i))
    if not ts:
        return -np.inf
    T, Y, S = np.concatenate(ts), np.concatenate(ys), np.concatenate(ss)
    n_sig = len(names)
    B = (1.0 - rho) * np.eye(n_sig) + rho * np.ones((n_sig, n_sig))
    K = B[S[:, None], S[None, :]] * matern32(T[:, None] - T[None, :], lengthscale)
    A = K + noise * np.eye(len(T))
    try:
        L = np.linalg.cholesky(A)
    except np.linalg.LinAlgError:
        return -np.inf
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, Y))
    return float(
        -0.5 * Y @ alpha - np.log(np.diag(L)).sum() - 0.5 * len(T) * np.log(2 * np.pi)
    )


def fit_fusion_params(
    df: DataFrame,
    sample_docs: int = 8,
    lengthscales: tuple[float, ...] = (8.0, 16.0, 32.0, 64.0),
    noises: tuple[float, ...] = (0.01, 0.05, 0.2),
    rho: float = 0.7,
) -> dict[str, float]:
    """Fit-once / apply-many (the reference's MOGPRTransformer pattern,
    mogpr.py:35-68: train on a small subgrid, freeze hyperparameters,
    apply everywhere): grid-search (lengthscale, noise) by summed GP log
    marginal likelihood over a deterministic driver-side sample of series,
    then broadcast the frozen values into mogpr_fuse. Fully deterministic
    (sample = first `sample_docs` doc_ids in sorted order)."""
    sample_ids = [
        r[0]
        for r in df.select("doc_id").distinct().orderBy("doc_id")
        .limit(sample_docs).collect()
    ]
    pdf = df.filter(F.col("doc_id").isin(sample_ids)).toPandas()
    series = []
    for _, g in pdf.groupby("doc_id", sort=True):
        day = g["ts"].astype("int64").to_numpy() / 86400e9
        series.append(
            {
                s: (day[(g["source"] == s).to_numpy()],
                    g["value"].to_numpy(np.float64)[(g["source"] == s).to_numpy()])
                for s in sorted(g["source"].unique())
            }
        )
    best, best_ll = None, -np.inf
    for ls in lengthscales:
        for nz in noises:
            ll = sum(
                _log_marginal_likelihood(sig, ls, nz, rho) for sig in series
            )
            if ll > best_ll:
                best, best_ll = (ls, nz), ll
    return {"lengthscale": best[0], "noise": best[1], "rho": rho}


def mogpr_fuse(
    df: DataFrame,
    lengthscale: float = 32.0,
    noise: float = 0.05,
    rho: float = 0.7,
    prediction_period_days: float | None = None,
    groups: int | None = None,
) -> DataFrame:
    """Distributed fusion over long rows (doc_id, source, ts, value) —
    source = signal name (the reference's band/variable). Output grid per
    doc: union of observed timestamps (reference default), or a regular
    grid every `prediction_period_days` (the reference's ISO-8601
    prediction_period, _xarray_utils.py:43-46)."""

    def _fuse(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["doc_id", "source", "ts"], kind="mergesort")
        outs = []
        for doc, g in pdf.groupby("doc_id", sort=False):
            epoch = g["ts"].astype("int64").to_numpy() // 10**9
            day = epoch / 86400.0
            sigs = {
                s: (day[(g["source"] == s).to_numpy()],
                    g["value"].to_numpy(np.float64)[(g["source"] == s).to_numpy()])
                for s in g["source"].unique()
            }
            obs_days = np.unique(day[~np.isnan(g["value"].to_numpy(np.float64))])
            if len(obs_days) == 0:
                continue
            if prediction_period_days:
                out_t = np.arange(
                    obs_days[0], obs_days[-1] + 1e-9, prediction_period_days
                )
            else:
                out_t = obs_days
            fused = mogpr_fuse_series(
                sigs, out_t, lengthscale=lengthscale, noise=noise, rho=rho
            )
            ts_out = pd.to_datetime((out_t * 86400.0 * 1e6).round() * 1000)
            for s, (mu, sd) in fused.items():
                outs.append(
                    pd.DataFrame(
                        {
                            "doc_id": doc,
                            "source": s,
                            "ts": ts_out,
                            "value_fused": mu,
                            "value_std": sd,
                        }
                    )
                )
        if not outs:
            return pd.DataFrame(
                columns=["doc_id", "source", "ts", "value_fused", "value_std"]
            )
        return pd.concat(outs, ignore_index=True)

    from ..session import default_groups, repartition_for_kernel

    groups = groups or default_groups(df)
    grouped = df.withColumn("_g", F.pmod(F.xxhash64("doc_id"), F.lit(groups)))
    return repartition_for_kernel(grouped, "_g").groupBy("_g").applyInPandas(_fuse, schema=FUSED_SCHEMA)
