"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship rollup ladder on sf0.001.
queries()     -> one entry per implemented operator (SURVEY.md §2).
oracle_sql()  -> DuckDB-equivalent SQL per query (correctness gate).

Conventions shared by queries and oracles:
  * events is the canonical point-series table: series key =
    (event_type AS source, user_id AS doc_id), unique order key = event_id.
  * double aggregates are rounded (sum->4dp, avg/std->6dp) in BOTH engines so
    the driver's value-hash is insensitive to float summation order.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# Make fusets_spark importable regardless of the loader's cwd/sys.path.
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fusets_spark.operators.explode import DEFAULT_EPOCH  # noqa: F401 (re-export)
from fusets_spark.operators.rollup import rollup_from_raw, rollup_from_tier

SF0001 = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Pin UTC: bucket math is epoch-based (tz-independent) but timestamp
    # rendering at the Arrow boundary and timestamp literals are not. The
    # DuckDB oracle treats parquet timestamps as naive-UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Ship fusets_spark to executor Python workers (the --py-files story);
    # the driver process may not have been launched from the repo root.
    from fusets_spark.session import ship_package

    ship_package(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _event_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("source"),
        F.col("user_id").alias("doc_id"),
        F.col("event_id").alias("pos"),
        "ts",
        "value",
    )


def _round_rollup(df: DataFrame) -> DataFrame:
    return df.select(
        "source",
        "doc_id",
        "bucket_ts",
        "n_obs",
        F.round("sum_val", 4).alias("sum_val"),
        "min_val",
        "max_val",
        "first_val",
        "last_val",
        F.round("avg_val", 6).alias("avg_val"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full retention ladder over the sf0.001 event stream; returns
    the 1h tier (raw -> 1m -> 5m -> 1h, coarse tiers derived from fine)."""
    pts = _event_points(spark, SF0001)
    t1m = rollup_from_raw(pts, "1m", integer_values=False)
    t5m = rollup_from_tier(t1m, "5m")
    t1h = rollup_from_tier(t5m, "1h")
    return _round_rollup(t1h)


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT event_type AS source,
       user_id AS doc_id,
       time_bucket(INTERVAL '{interval}', ts) AS bucket_ts,
       count(value) AS n_obs,
       round(sum(value), 4) AS sum_val,
       min(value) AS min_val,
       max(value) AS max_val,
       arg_min(value, event_id) AS first_val,
       arg_max(value, event_id) AS last_val,
       round(sum(value) / count(value), 6) AS avg_val
FROM events
GROUP BY 1, 2, 3
"""


def _mk_rollup(tier: str) -> Callable[[SparkSession, str], DataFrame]:
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        pts = _event_points(spark, sf_dir)
        return _round_rollup(rollup_from_raw(pts, tier, integer_values=False))

    return q


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style multi-aggregate (reference analog: the 18-metric
    phenology groupBy, SURVEY.md §2.4) — exercises partial+final agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_whittaker_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whittaker gap-fill (reference whittaker.py:123-196) over the event
    stream: per-series dense 1h grid, λ=100. Non-SQL-expressible (banded
    solve) -> rows-only check; numeric parity is pinned by
    tests/test_whittaker.py against a dense-solve numpy oracle."""
    from fusets_spark.operators.whittaker import whittaker_gapfill

    pts = _event_points(spark, sf_dir).select(
        "source", F.col("doc_id").cast("string").alias("doc_id"), "ts", "value"
    )
    out = whittaker_gapfill(pts, lmbd=100.0, grid_seconds=3600, groups_per_source=8)
    return out.select(
        "source", "doc_id", "ts", F.round("value_smooth", 6).alias("value_smooth")
    )


def q_gorilla_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla DoD+XOR block codec (north rule): encode the event stream into
    per-(series, 1h-bucket) binary blocks, decode, and return restored points.

    The oracle checks encode∘decode == identity: the restored points must
    equal the plain projection of the input (SQL-expressible!)."""
    from fusets_spark.codec.blocks import decode_blocks, encode_blocks

    pts = _event_points(spark, sf_dir).select(
        "source", F.col("doc_id").cast("string").alias("doc_id"), "ts", "value"
    )
    blocks = encode_blocks(pts, block_seconds=3600)
    return decode_blocks(blocks).select("source", "doc_id", "ts", "value")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rollup_1m": _mk_rollup("1m"),
        "rollup_5m": _mk_rollup("5m"),
        "rollup_1h": _mk_rollup("1h"),
        "pricing_summary": q_pricing_summary,
        "whittaker_gapfill": q_whittaker_gapfill,
        "gorilla_roundtrip": q_gorilla_roundtrip,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "gorilla_roundtrip": """
SELECT event_type AS source,
       CAST(user_id AS VARCHAR) AS doc_id,
       ts,
       value
FROM events
""",
        "rollup_1m": _ROLLUP_ORACLE.format(interval="1 minute"),
        "rollup_5m": _ROLLUP_ORACLE.format(interval="5 minutes"),
        "rollup_1h": _ROLLUP_ORACLE.format(interval="1 hour"),
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    }
