"""Sources / sinks (SURVEY.md §2.1).

* load_points_csv — the reference's `load_sits_csv` (sits_bridge.py:44-112):
  CSV point time series -> long frame; parses the time column, auto-detects
  numeric band columns, melts wide bands to long rows.
* wide_to_long — the xarray band-stacking dual (melt via stack()).
* merge_cubes — the reference's multi-sensor cube merge
  (openeo/__init__.py:131, tests/test_cube_construction.py:4-19): full
  outer join of band frames on (series, ts), or unionByName in long form.
* load_sits_netcdf — netCDF has no native Spark source; production path is
  ingest-time conversion to parquet (sits_bridge.py:115-145 equivalent).
  Implemented behind an import-guard: converts via xarray when available,
  raises a clear error here (xarray absent from this container).

Sinks are plain `df.write.parquet` / the TierStore commit protocol — the
reference's netCDF sink (tests/test_whittaker.py:73-76) maps to the tier
store (SURVEY.md §2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.DoubleType, T.FloatType, T.IntegerType, T.LongType,
    T.ShortType, T.DecimalType,
)


def wide_to_long(
    df: DataFrame,
    id_cols: list[str],
    band_cols: list[str] | None = None,
    band_name: str = "band",
    value_name: str = "value",
) -> DataFrame:
    """Melt wide band columns into (id_cols..., band, value) rows —
    the long-format dual of the reference's per-variable Dataset."""
    if band_cols is None:
        band_cols = [
            f.name
            for f in df.schema.fields
            if f.name not in id_cols and isinstance(f.dataType, _NUMERIC)
        ]
    stack_expr = ", ".join(
        f"'{c}', cast(`{c}` as double)" for c in band_cols
    )
    return df.selectExpr(
        *id_cols,
        f"stack({len(band_cols)}, {stack_expr}) as ({band_name}, {value_name})",
    )


def load_points_csv(
    spark: SparkSession,
    path: str,
    time_col: str = "Index",
    band_cols: list[str] | None = None,
    series_cols: list[str] | None = None,
    time_format: str | None = None,
) -> DataFrame:
    """CSV point-timeseries -> long frame (source=band, doc_id=series id,
    ts, value). Band columns auto-detected as numeric non-key columns,
    like the reference's sits_bridge loader."""
    raw = spark.read.csv(path, header=True, inferSchema=True)
    ts = (
        F.to_timestamp(F.col(time_col), time_format)
        if time_format
        else F.to_timestamp(F.col(time_col))
    )
    df = raw.withColumn("ts", ts).drop(time_col)
    series_cols = series_cols or []
    id_cols = ["ts", *series_cols]
    long = wide_to_long(df, id_cols, band_cols, band_name="source")
    if series_cols:
        doc = F.concat_ws("-", *[F.col(c).cast("string") for c in series_cols])
    else:
        doc = F.lit("series-0")
    return long.select(
        "source", doc.alias("doc_id"), "ts", "value"
    ).filter(F.col("value").isNotNull())


def merge_cubes(*band_frames: DataFrame, how: str = "union") -> DataFrame:
    """Merge per-band long frames (source, doc_id, ts, value).

    how='union': long-format concat (the engine's preferred shape — each
    band stays a row, no alignment needed; reference xarray.concat,
    mogpr.py:211).
    how='outer': wide alignment via full outer join on (doc_id, ts) with one
    value column per band (reference merge_cubes semantics — union of time
    grids, NULL where a band lacks an observation)."""
    assert band_frames
    if how == "union":
        out = band_frames[0]
        for f in band_frames[1:]:
            out = out.unionByName(f)
        return out
    assert how == "outer"
    wide = None
    for f in band_frames:
        bands = [r[0] for r in f.select("source").distinct().collect()]
        assert len(bands) == 1, "each frame must carry exactly one band"
        b = f.select(
            "doc_id", "ts", F.col("value").alias(bands[0])
        )
        wide = b if wide is None else wide.join(b, ["doc_id", "ts"], "outer")
    return wide


def load_sits_netcdf(spark: SparkSession, path: str) -> DataFrame:
    """netCDF ingest: converts to long rows via xarray at ingest time (no
    native Spark netCDF source). Gated on xarray availability."""
    try:
        import xarray  # noqa: F401
    except ImportError as e:  # pragma: no cover - container has no xarray
        raise NotImplementedError(
            "netCDF ingest needs xarray (absent here); convert to parquet "
            "offline or install xarray — see sources/loaders.py docstring"
        ) from e
    import pandas as pd
    import xarray as xr

    ds = xr.load_dataset(path)
    pdf = ds.to_dataframe().reset_index()
    return spark.createDataFrame(pd.DataFrame(pdf))
