"""Time-axis utilities: ISO-8601 period parsing and output-grid generation
(reference _xarray_utils.py:43-46 `_output_dates`, pinned by the F6 golden:
P5D over 2023-03-15 -> 2024-02-29 yields 71 dates)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ISO = re.compile(
    r"^P(?:(?P<weeks>\d+)W)?(?:(?P<days>\d+)D)?"
    r"(?:T(?:(?P<hours>\d+)H)?(?:(?P<minutes>\d+)M)?(?:(?P<seconds>\d+)S)?)?$"
)


def iso_period_seconds(period: str) -> int:
    """'P5D' -> 432000; supports W/D/TH/TM/TS components (the reference
    feeds these to pd.Timedelta, which has the same fixed-width semantics —
    calendar months are intentionally unsupported, like pd.Timedelta)."""
    m = _ISO.match(period)
    if not m or not any(m.groupdict().values()):
        raise ValueError(f"unsupported ISO-8601 period: {period!r}")
    g = {k: int(v or 0) for k, v in m.groupdict().items()}
    return (
        g["weeks"] * 7 * 86400
        + g["days"] * 86400
        + g["hours"] * 3600
        + g["minutes"] * 60
        + g["seconds"]
    )


def output_dates(
    spark: SparkSession, period: str, start: str, end: str
) -> DataFrame:
    """Regular output grid [start, end] at `period` spacing — one `ts` row
    per grid point, built with sequence() + explode (JVM-side)."""
    step = iso_period_seconds(period)
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit(start)),
                F.to_timestamp(F.lit(end)),
                F.expr(f"INTERVAL {step} SECONDS"),
            )
        ).alias("ts")
    )
