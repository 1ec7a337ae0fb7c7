"""Tiered continuous aggregates: raw -> 1m -> 5m -> 1h.

Semantics mirror the reference's temporal resample (reference
_phenolopy.py:448-511, ds.resample(time=interval)) generalized to the
TimescaleDB-style retention ladder required by the north rule.

Exactness strategy (parity at every tier):
  * sums are computed on the integer token domain (int64) so they are
    order-insensitive and bit-exact under any shuffle/salting;
  * avg is derived as sum/count at read time (one deterministic double
    division), never re-averaged across tiers;
  * first/last are argmin/argmax by a *unique* ordering key (pos / ts),
    so min_by/max_by are deterministic without a sort.

Tier k+1 is computed FROM tier k (partial+final reuse — the map-side combine
the reference never had), so the 1h tier never rescans raw points.

Skew: `salted_rollup` exposes the two-phase salted aggregation required for
hot (source, bucket) keys — phase 1 aggregates on (keys..., salt), phase 2
merges. Because all merge functions (sum/count/min/max + argmin/argmax by
unique key) are associative+commutative, salting cannot change results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIERS = {"1m": 60, "5m": 300, "1h": 3600}
SERIES_KEYS = ["source", "doc_id"]

_AGG_COLS = ["n_obs", "sum_val", "min_val", "max_val", "first_val", "last_val"]


def _with_avg(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "avg_val", F.col("sum_val").cast("double") / F.col("n_obs")
    )


def rollup_from_raw(
    points: DataFrame,
    tier: str,
    value_col: str = "value",
    order_col: str = "pos",
    integer_values: bool = True,
) -> DataFrame:
    """Aggregate raw points into one tier.

    points: (source, doc_id, <order_col>, ts, value) — value NULL rows already
    dropped; order_col must be unique per series (token pos / event_id).
    integer_values=True sums on int64 (bit-exact under any shuffle order);
    False keeps double sums (token tables are the integer domain, generic
    event streams are not).

    Output: (source, doc_id, bucket_ts, n_obs, sum_val, min_val, max_val,
             first_val, last_val, avg_val)
    """
    seconds = TIERS[tier]
    bucket_ts = F.timestamp_seconds(
        F.unix_timestamp("ts") - F.pmod(F.unix_timestamp("ts"), F.lit(seconds))
    )
    v = F.col(value_col)
    sum_expr = F.sum(v.cast("long")) if integer_values else F.sum(v)
    out = (
        points.groupBy(*SERIES_KEYS, bucket_ts.alias("bucket_ts"))
        .agg(
            F.count(v).alias("n_obs"),
            sum_expr.alias("sum_val"),
            F.min(v).alias("min_val"),
            F.max(v).alias("max_val"),
            F.min_by(v, F.col(order_col)).alias("first_val"),
            F.max_by(v, F.col(order_col)).alias("last_val"),
        )
    )
    return _with_avg(out)


def rollup_from_tier(lower: DataFrame, tier: str) -> DataFrame:
    """Re-aggregate a finer tier into a coarser one (1m->5m, 5m->1h).

    first/last merge by bucket_ts (unique per series within the coarser
    bucket), so the result is identical to aggregating raw directly.
    """
    seconds = TIERS[tier]
    bucket_ts = F.timestamp_seconds(
        F.unix_timestamp("bucket_ts")
        - F.pmod(F.unix_timestamp("bucket_ts"), F.lit(seconds))
    )
    out = (
        lower.groupBy(*SERIES_KEYS, bucket_ts.alias("bucket_ts"))
        .agg(
            F.sum("n_obs").alias("n_obs"),
            F.sum("sum_val").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
            F.min_by("first_val", F.col("bucket_ts")).alias("first_val"),
            F.max_by("last_val", F.col("bucket_ts")).alias("last_val"),
        )
    )
    return _with_avg(out)


def rollup_ladder(points: DataFrame) -> dict[str, DataFrame]:
    """Full retention ladder; coarser tiers derive from finer ones."""
    t1m = rollup_from_raw(points, "1m")
    t5m = rollup_from_tier(t1m, "5m")
    t1h = rollup_from_tier(t5m, "1h")
    return {"1m": t1m, "5m": t5m, "1h": t1h}


def salted_rollup(
    points: DataFrame, tier: str, n_salts: int = 16, value_col: str = "value"
) -> DataFrame:
    """Two-phase salted aggregation for hot (source, bucket) skew.

    Phase 1 groups by (series, bucket, salt) — the salt (pos % n_salts)
    spreads one hot key over n_salts reducers, bounding any single task.
    Phase 2 merges partials. Integer sums + argmin/argmax-by-unique-key make
    the result independent of the salt count. AQE handles join skew but not
    groupBy skew on hot series — this does (SURVEY.md §4).
    """
    seconds = TIERS[tier]
    bucket_ts = F.timestamp_seconds(
        F.unix_timestamp("ts") - F.pmod(F.unix_timestamp("ts"), F.lit(seconds))
    )
    v = F.col(value_col)
    partial = (
        points.withColumn("_salt", F.pmod(F.col("pos"), F.lit(n_salts)))
        .groupBy(*SERIES_KEYS, bucket_ts.alias("bucket_ts"), F.col("_salt"))
        .agg(
            F.count(v).alias("n_obs"),
            F.sum(v.cast("long")).alias("sum_val"),
            F.min(v).alias("min_val"),
            F.max(v).alias("max_val"),
            F.min_by(v, F.col("pos")).alias("first_val"),
            F.min("pos").alias("_first_pos"),
            F.max_by(v, F.col("pos")).alias("last_val"),
            F.max("pos").alias("_last_pos"),
        )
    )
    out = (
        partial.groupBy(*SERIES_KEYS, "bucket_ts")
        .agg(
            F.sum("n_obs").alias("n_obs"),
            F.sum("sum_val").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
            F.min_by("first_val", F.col("_first_pos")).alias("first_val"),
            F.max_by("last_val", F.col("_last_pos")).alias("last_val"),
        )
    )
    return _with_avg(out)
