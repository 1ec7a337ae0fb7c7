"""Mimic the driver's correctness gate: run every __spark_entry__.queries()
entry at sf0.01 and compare against its oracle_sql() via DuckDB —
row count + schema + order-insensitive exact values."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parents[1]
SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _entry_mod():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object and len(pdf) and isinstance(
            pdf[c].iloc[0], (list, np.ndarray)
        ):
            pdf[c] = pdf[c].map(lambda v: tuple(np.asarray(v).tolist()))
        if str(pdf[c].dtype).startswith("datetime64"):
            pdf[c] = pdf[c].astype("datetime64[us]")
        if pdf[c].dtype == np.float32:
            pdf[c] = pdf[c].astype(np.float64)
        if str(pdf[c].dtype) in ("int32", "uint32", "int16", "uint64"):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _query_names():
    return sorted(_entry_mod().queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_duckdb_oracle(spark, duck, name):
    mod = _entry_mod()
    q = mod.queries()[name]
    oracles = mod.oracle_sql()
    got = _canon(q(spark, SF_DIR).toPandas())
    if name not in oracles:
        assert len(got) >= 0  # rows-only check, mirrors driver behavior
        return
    want = _canon(duck.execute(oracles[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # The driver's value hash is SIGN-SENSITIVE: -0.0 != +0.0 there, while
    # assert_frame_equal treats them as equal. Compare raw float64 bits too.
    for c in got.columns:
        if got[c].dtype == np.float64:
            gb = got[c].to_numpy(np.float64).tobytes()
            wb = want[c].to_numpy(np.float64).tobytes()
            assert gb == wb, (
                f"{name}.{c}: float bit mismatch (likely -0.0 vs +0.0 — "
                "add the `+ 0.0` sign normalization on both sides)"
            )


def test_entry_smoke(spark):
    mod = _entry_mod()
    df = mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.1"])
def test_ivf_oracle_exact_off_contract_sf(spark, sf_dir):
    """ann_ivf_topk parity OFF the contract SF (VERDICT r3 #9): the query
    applies the frozen contract-SF quantizer at every sf_dir, so the
    oracle's embedded literal centroids match at sf0.001 and sf0.1 too."""
    mod = _entry_mod()
    got = _canon(mod.queries()["ann_ivf_topk"](spark, sf_dir).toPandas())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    want = _canon(con.execute(mod.oracle_sql()["ann_ivf_topk"]).df())
    con.close()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=True
    )


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.1"])
def test_mogpr_oracle_exact_off_contract_sf(spark, sf_dir):
    """mogpr_fusion parity OFF the contract SF: the recursive-CTE
    Gauss-Jordan oracle and the engine's Cholesky path agree bit-for-bit
    (after the shared 5dp rounding) at every SF, not just the driver's
    sf0.01 — the 5-day subset keeps joint n small at any corpus size
    because per-user event density is SF-independent."""
    mod = _entry_mod()
    got = _canon(mod.queries()["mogpr_fusion"](spark, sf_dir).toPandas())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    want = _canon(con.execute(mod.oracle_sql()["mogpr_fusion"]).df())
    con.close()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=True
    )
    for c in ("value_fused", "value_std"):
        assert (
            got[c].to_numpy(np.float64).tobytes()
            == want[c].to_numpy(np.float64).tobytes()
        )
