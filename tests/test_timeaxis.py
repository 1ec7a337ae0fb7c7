"""F6 date-grid golden (reference tests/test_xarray_utils.py:4-12) +
V-curve λ selection + fusion hyperparameter fitting."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fusets_spark.timeaxis import iso_period_seconds, output_dates


def test_iso_period_parse():
    assert iso_period_seconds("P5D") == 5 * 86400
    assert iso_period_seconds("P1W") == 7 * 86400
    assert iso_period_seconds("PT1H") == 3600
    assert iso_period_seconds("P1DT12H") == 129600
    with pytest.raises(ValueError):
        iso_period_seconds("P1M")  # calendar months unsupported, like the ref


def test_output_dates_f6_golden(spark):
    got = output_dates(spark, "P5D", "2023-03-15", "2024-02-29").toPandas()
    assert len(got) == 71
    assert got["ts"].iloc[0] == pd.Timestamp("2023-03-15")
    assert got["ts"].iloc[1] == pd.Timestamp("2023-03-20")
    assert got["ts"].iloc[70] == pd.Timestamp("2024-02-28")


def test_vcurve_lambda_selection():
    from fusets_spark.operators.whittaker import whittaker_solve, whittaker_vcurve

    rng = np.random.default_rng(0)
    n, S = 150, 12
    x = np.arange(n, dtype=float)
    clean = np.cos(2 * np.pi * x / 60.0)[None, :] * np.linspace(0.5, 1.5, S)[:, None]
    Y = clean + rng.normal(scale=0.15, size=(S, n))
    W = (rng.random((S, n)) > 0.2).astype(float)
    z, lam = whittaker_vcurve(Y * W, W)
    assert lam.shape == (S,)
    assert (lam > 0).all()
    # v-curve choice beats both grid extremes on reconstruction error
    err = lambda zz: float(np.sqrt(np.mean((zz - clean) ** 2)))
    e_v = err(z)
    e_lo = err(whittaker_solve(Y * W, W, 10.0**-2))
    e_hi = err(whittaker_solve(Y * W, W, 10.0**7.5))
    assert e_v < e_lo and e_v < e_hi


def test_fit_fusion_params(spark):
    from fusets_spark.datagen import fusion_fixture
    from fusets_spark.operators.fusion import fit_fusion_params, mogpr_fuse

    sdf = spark.createDataFrame(fusion_fixture())
    params = fit_fusion_params(
        sdf, sample_docs=2,
        lengthscales=(8.0, 32.0), noises=(0.01, 0.2),
    )
    assert set(params) == {"lengthscale", "noise", "rho"}
    # frozen params apply cleanly everywhere (fit-once / apply-many)
    out = mogpr_fuse(sdf, **params).toPandas()
    assert len(out) > 0 and not out["value_fused"].isna().any()
    # deterministic fit
    params2 = fit_fusion_params(
        sdf, sample_docs=2, lengthscales=(8.0, 32.0), noises=(0.01, 0.2)
    )
    assert params == params2
