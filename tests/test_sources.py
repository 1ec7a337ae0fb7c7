"""Sources: CSV point-series loader, wide->long melt, cube merge."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fusets_spark.sources import (
    load_points_csv,
    load_sits_netcdf,
    merge_cubes,
    wide_to_long,
)


def test_load_points_csv(spark, tmp_path):
    ts = pd.date_range("2022-01-01", periods=10, freq="5D")
    pdf = pd.DataFrame(
        {
            "Index": ts.strftime("%Y-%m-%d"),
            "plot": ["p1"] * 5 + ["p2"] * 5,
            "ndvi": np.linspace(0.1, 0.9, 10),
            "evi": np.linspace(0.2, 0.8, 10),
            "note": ["x"] * 10,  # non-numeric -> ignored
        }
    )
    path = str(tmp_path / "sits.csv")
    pdf.to_csv(path, index=False)
    got = load_points_csv(
        spark, path, time_col="Index", series_cols=["plot"]
    ).toPandas()
    assert set(got["source"].unique()) == {"ndvi", "evi"}
    assert set(got["doc_id"].unique()) == {"p1", "p2"}
    assert len(got) == 20
    g = got[(got["source"] == "ndvi") & (got["doc_id"] == "p1")].sort_values("ts")
    np.testing.assert_allclose(g["value"].to_numpy(), np.linspace(0.1, 0.9, 10)[:5])


def test_wide_to_long_roundtrip(spark):
    pdf = pd.DataFrame(
        {"k": [1, 2], "b1": [1.0, 2.0], "b2": [3.0, 4.0], "txt": ["a", "b"]}
    )
    got = wide_to_long(spark.createDataFrame(pdf), ["k"]).toPandas()
    assert len(got) == 4
    assert set(got["band"]) == {"b1", "b2"}


def test_merge_cubes_union_and_outer(spark):
    t = pd.date_range("2022-01-01", periods=4, freq="D")
    a = pd.DataFrame({"source": "vv", "doc_id": "d", "ts": t[:3], "value": [1.0, 2, 3]})
    b = pd.DataFrame({"source": "vh", "doc_id": "d", "ts": t[1:], "value": [9.0, 8, 7]})
    fa, fb = spark.createDataFrame(a), spark.createDataFrame(b)
    u = merge_cubes(fa, fb).toPandas()
    assert len(u) == 6
    w = merge_cubes(fa, fb, how="outer").toPandas().sort_values("ts")
    # union of time grids with NULLs where a band lacks data
    assert len(w) == 4
    assert w["vv"].isna().sum() == 1 and w["vh"].isna().sum() == 1


def test_netcdf_gated(spark):
    with pytest.raises(NotImplementedError):
        load_sits_netcdf(spark, "/nonexistent.nc")
