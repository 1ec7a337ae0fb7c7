"""Window/aggregate analytics vs pandas oracles + reference goldens.

Golden source: reference tests/test_temporal_outliers.py:12-15 (filtered
mean == 0.09904716, std == 0.71552783 to 6 decimals on the seed-42 fixture).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from fusets_spark.datagen import harmonic_fixture, outlier_fixture
from fusets_spark.operators.outliers import temporal_outliers
from fusets_spark.operators.phenology import phenometrics
from fusets_spark.operators.resample import group_by_calendar, resample
from fusets_spark.operators.windows import (
    lag_lead_features,
    linear_interpolate,
    moving_average,
    time_derivative,
)


def _as_series_df(spark, pdf, source="s2ndvi", doc_id="d-0"):
    p = pdf.copy()
    p["source"] = source
    p["doc_id"] = doc_id
    return spark.createDataFrame(p[["source", "doc_id", "ts", "value"]])


def _outlier_oracle(pdf: pd.DataFrame, window="20D", thr=3.0) -> np.ndarray:
    # pandas implementation identical to reference temporal_outliers.py:62-70
    s = pd.Series(pdf["value"].to_numpy(), index=pd.DatetimeIndex(pdf["ts"]))
    mean = s.rolling(window=window, center=True, closed="both").mean()
    std = s.rolling(window=window, center=True, closed="both").std()
    z = (s - mean) / std
    return np.where(z.abs() > thr, mean, s)


def test_temporal_outliers_reference_golden(spark):
    fx = outlier_fixture()
    # Spark timestamps are µs; truncate the oracle input identically
    fx["ts"] = fx["ts"].astype("datetime64[us]")
    sdf = _as_series_df(spark, fx)
    got = (
        temporal_outliers(sdf, window="20D", threshold=3.0)
        .orderBy("ts")
        .toPandas()
    )
    want = _outlier_oracle(fx)
    assert np.allclose(got["value_filtered"].to_numpy(), want, atol=1e-12)
    # reference goldens (tests/test_temporal_outliers.py:12-15); the
    # reference asserts numpy mean/std (ddof=0) to 6 decimals
    np.testing.assert_almost_equal(
        got["value_filtered"].to_numpy().mean(), 0.09904716, decimal=6
    )
    np.testing.assert_almost_equal(
        got["value_filtered"].to_numpy().std(), 0.71552783, decimal=6
    )


def test_lag_lead_and_moving_average(spark):
    fx = harmonic_fixture()[:50]
    sdf = _as_series_df(spark, fx)
    got = (
        moving_average(lag_lead_features(sdf), 3)
        .orderBy("ts")
        .toPandas()
    )
    v = fx["value"].to_numpy()
    # numpy oracle identical to reference create_advanced_temporal_features
    vp = np.pad(v, 3, mode="edge")
    t_m1, t_m2 = vp[2:-4], vp[1:-5]
    t_p1, t_p2 = vp[4:-2], vp[5:-1]
    assert np.allclose(got["v_lag1"], t_m1)
    assert np.allclose(got["v_lag2"], t_m2)
    assert np.allclose(got["v_lead1"], t_p1)
    assert np.allclose(got["v_lead2"], t_p2)
    assert np.allclose(got["avg3"], (t_m1 + v + t_p1) / 3)
    assert np.allclose(got["avg5"], (t_m2 + t_m1 + v + t_p1 + t_p2) / 5)
    assert np.allclose(got["trend"], (2 * (t_p1 - v) + (v - t_m1)) / 3)
    assert np.allclose(got["volatility"], np.abs(t_p1 - v) + np.abs(v - t_m1))
    ma = pd.Series(v).rolling(3, center=True, min_periods=1).mean().to_numpy()
    assert np.allclose(got["ma3"], ma)


def test_time_derivative(spark):
    fx = harmonic_fixture()[:30]
    got = time_derivative(_as_series_df(spark, fx)).orderBy("ts").toPandas()
    v = fx["value"].to_numpy()
    dt = np.diff(fx["ts"].astype("int64").to_numpy() // 10**9)
    want = np.diff(v) / dt
    assert np.isnan(got["dvdt"].iloc[0]) or got["dvdt"].iloc[0] is None
    assert np.allclose(got["dvdt"].to_numpy()[1:], want)


def test_linear_interpolate(spark):
    ts = pd.date_range("2020-01-01", periods=10, freq="D")
    v = [None, 1.0, None, None, 4.0, 5.0, None, 7.0, None, None]
    pdf = pd.DataFrame({"ts": ts, "value": v})
    got = linear_interpolate(_as_series_df(spark, pdf)).orderBy("ts").toPandas()
    want = [1.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 7.0, 7.0]
    assert np.allclose(got["value_interp"].to_numpy(), want)


def test_resample_mean_median(spark):
    fx = harmonic_fixture()
    sdf = _as_series_df(spark, fx)
    for reducer, fn in [("mean", "mean"), ("median", "median")]:
        got = (
            resample(sdf, "month", reducer)
            .orderBy("bucket_ts")
            .toPandas()
        )
        want = (
            fx.set_index("ts")["value"]
            .resample("MS")
            .agg(fn)
            .dropna()
        )
        assert np.allclose(got["value"].to_numpy(), want.to_numpy())
        assert (got["bucket_ts"].to_numpy() == want.index.to_numpy()).all()
    got = group_by_calendar(sdf, "month", "mean").orderBy("month").toPandas()
    want = fx.groupby(fx["ts"].dt.month)["value"].mean()
    assert np.allclose(got["value"].to_numpy(), want.to_numpy())


def _masked_gradient(mv: np.ndarray, doy: np.ndarray) -> np.ndarray:
    """Central differences over the masked series, one-sided at the array
    edges, NaN-propagating (xarray differentiate on a slope-masked array)."""
    n = len(mv)
    g = np.full(n, np.nan)
    if n >= 2:
        g[0] = (mv[1] - mv[0]) / (doy[1] - doy[0])
        g[-1] = (mv[-1] - mv[-2]) / (doy[-1] - doy[-2])
    if n >= 3:
        g[1:-1] = (mv[2:] - mv[:-2]) / (doy[2:] - doy[:-2])
    return g


def _pheno_oracle(pdf: pd.DataFrame, factor=0.5) -> dict:
    """Reference semantics (_phenolopy.py get_sos/get_eos,
    seasonal_amplitude two_sided, base_metric=bse)."""
    v = pdf["value"].to_numpy()
    doy = pdf["ts"].dt.dayofyear.to_numpy().astype(float)
    i_pos = int(np.argmax(v))
    i_vos = int(np.argmin(v))
    pos_v, pos_d = v[i_pos], int(doy[i_pos])
    vos_v, vos_d = v[i_vos], int(doy[i_vos])
    ml = np.where(doy <= pos_d, v, np.nan)
    mr = np.where(doy >= pos_d, v, np.nan)
    bse = (np.nanmin(ml) + np.nanmin(mr)) / 2
    aos = pos_v - bse
    mos = (
        np.nanmean(np.where(ml >= 0.8 * pos_v, ml, np.nan))
        + np.nanmean(np.where(mr >= 0.8 * pos_v, mr, np.nan))
    ) / 2
    cand_l = ~np.isnan(ml) & (_masked_gradient(ml, doy) > 0)
    cand_r = ~np.isnan(mr) & (_masked_gradient(mr, doy) < 0)
    target = bse + factor * aos

    def argmin_first(mask):
        d = np.where(mask, np.abs(v - target), np.inf)
        order = np.lexsort((doy, d))
        return order[0]

    i_sos = argmin_first(cand_l)
    i_eos = argmin_first(cand_r)
    liot = float(np.sum((v[:-1] + v[1:]) / 2 * np.diff(doy)))
    return dict(
        pos_value=pos_v, pos_doy=pos_d, vos_value=vos_v, vos_doy=vos_d,
        aos_value=aos, bse_value=bse, mos_value=mos,
        sos_value=v[i_sos], sos_doy=int(doy[i_sos]),
        eos_value=v[i_eos], eos_doy=int(doy[i_eos]),
        liot_value=liot,
    )


def test_phenometrics_vs_numpy_oracle(spark):
    # single-season series: one harmonic year
    i = np.arange(60)
    d = 6.0 * i  # within one year
    v = 0.2 + 0.6 * np.exp(-((d - 180) ** 2) / (2 * 60.0**2))
    ts = pd.Timestamp("2021-01-01") + pd.to_timedelta(d, unit="D")
    pdf = pd.DataFrame({"ts": ts, "value": v})
    got = phenometrics(_as_series_df(spark, pdf)).toPandas().iloc[0]
    want = _pheno_oracle(pdf)
    for k, wv in want.items():
        assert np.isclose(got[k], wv, atol=1e-9), f"{k}: {got[k]} != {wv}"
    # season length + rates are consistent
    assert got["los_value"] == got["eos_doy"] - got["sos_doy"]
    assert got["lios_value"] <= got["liot_value"]


def test_focal_stats_constant_grid(spark):
    """Full 5x4 constant grid: interior cells see 9 neighbors, corners 4,
    mean == the constant, std == 0."""
    from fusets_spark.operators.spatial import focal_stats

    rows = [(x, y, 7.5) for x in range(5) for y in range(4)]
    grid = spark.createDataFrame(rows, "x long, y long, value double")
    out = focal_stats(grid).toPandas().set_index(["x", "y"])
    assert out.loc[(2, 2), "n_nbr"] == 9
    assert out.loc[(0, 0), "n_nbr"] == 4
    assert out.loc[(0, 2), "n_nbr"] == 6
    assert (out["f_mean"] == 7.5).all()
    assert (out["f_std"].abs() < 1e-9).all()
    assert len(out) == 20  # output domain == input cells


def test_polygon_mask_known_points(spark):
    """Unit square-ish quadrilateral (no horizontal edges): inside/outside
    points classified correctly, boundary-adjacent exteriors excluded."""
    from fusets_spark.operators.spatial import polygon_mask

    poly = [(0.0, 0.0), (10.0, 1.0), (9.0, 11.0), (-1.0, 10.0)]
    pts = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 50.0, 5.0), (3, -5.0, -5.0), (4, 0.5, 1.0)],
        "id long, x double, y double",
    )
    got = sorted(
        polygon_mask(pts, poly).toPandas()["id"].tolist()
    )
    assert got == [1, 4]


def test_polygon_mask_matches_halfplane_on_convex(spark):
    """Property check of the ray-casting expression: for CONVEX polygons
    membership has an independent closed form (inside iff the point is on
    the interior side of every edge), which must agree with ray casting for
    points away from edges."""
    import numpy as np

    from fusets_spark.operators.spatial import polygon_mask

    rng = np.random.default_rng(17)
    angles = np.sort(rng.uniform(0, 2 * np.pi, 7))
    # vertices on a circle => convex; tiny per-vertex y-jitter rules out
    # exactly-horizontal edges
    poly = [
        (float(10 + 8 * np.cos(a)), float(10 + 8 * np.sin(a) + 1e-3 * i))
        for i, a in enumerate(angles)
    ]
    pts = rng.uniform(-2, 22, size=(300, 2))

    def halfplane_inside(p):
        n = len(poly)
        sides = []
        for i in range(n):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % n]
            sides.append(np.sign((x2 - x1) * (p[1] - y1) - (y2 - y1) * (p[0] - x1)))
        sides = [s for s in sides if s != 0]
        return all(s > 0 for s in sides) or all(s < 0 for s in sides)

    # drop points too close to any edge (both methods are exact off-edge)
    def edge_dist(p):
        d = np.inf
        for i in range(len(poly)):
            a = np.array(poly[i]); b = np.array(poly[(i + 1) % len(poly)])
            t = np.clip(np.dot(p - a, b - a) / np.dot(b - a, b - a), 0, 1)
            d = min(d, np.linalg.norm(p - (a + t * (b - a))))
        return d

    keep = [p for p in pts if edge_dist(p) > 1e-3]
    pdf = [(i, float(p[0]), float(p[1])) for i, p in enumerate(keep)]
    df = spark.createDataFrame(pdf, "id long, x double, y double")
    got = set(polygon_mask(df, poly).toPandas()["id"])
    want = {i for i, p in enumerate(keep) if halfplane_inside(np.array(p))}
    assert got == want
