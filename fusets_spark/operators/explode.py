"""Raw tier: tokenized sequences -> point rows.

Token position i maps to timestamp ``t0 + i seconds``; sentinel token -1 is a
missing observation (the reference's NaN / cloud-mask convention,
whittaker.py:40-42). The explode stays entirely JVM-side (posexplode +
timestamp arithmetic) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import TOKEN_MISSING

DEFAULT_EPOCH = "2024-01-01 00:00:00"


def explode_raw(
    tokens_df: DataFrame,
    t0: str = DEFAULT_EPOCH,
    keep_missing: bool = False,
    value_col: str = "value",
) -> DataFrame:
    """(doc_id, tokens, n_tok, source) -> (source, doc_id, pos, ts, value).

    value is DoubleType with missing tokens as NULL (dropped by default —
    mirrors the reference's per-series NaN drop, mogpr.py:272-273).
    """
    df = tokens_df.select(
        "source",
        "doc_id",
        F.posexplode("tokens").alias("pos", "tok"),
    ).withColumn(
        "ts",
        F.timestamp_seconds(
            F.unix_timestamp(F.lit(t0).cast("timestamp")) + F.col("pos")
        ),
    )
    value = F.when(F.col("tok") != TOKEN_MISSING, F.col("tok").cast("double"))
    df = df.withColumn(value_col, value).drop("tok")
    if not keep_missing:
        df = df.filter(F.col(value_col).isNotNull())
    return df


def bucket(ts: Column | str, seconds: int) -> Column:
    """Deterministic tier bucket start: epoch-aligned floor to `seconds`.

    Uses integer floor on unix seconds — identical semantics to DuckDB
    time_bucket and immune to the pandas '1M' month-end labeling trap
    (SURVEY.md §7.3). For calendar months use date_trunc instead.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_seconds(
        (F.unix_timestamp(c) - F.pmod(F.unix_timestamp(c), F.lit(seconds)))
    )
