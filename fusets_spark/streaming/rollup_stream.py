"""Structured Streaming rollup — the streaming twin of the batch ladder.

The reference is batch-only (SURVEY.md §2.8); the continuous-aggregate
requirement comes from the north rule. The batch-incremental pipeline
(plans/pipeline.py) is the primary path because its commit protocol gives
exact resume; this module provides the alternative `readStream` shape for
true streaming ingestion: tumbling-window aggregates with a watermark for
late data, checkpointed by Spark's own offset log.

Aggregate set matches the batch tiers EXACTLY (n_obs/sum/min/max/avg +
first/last): min_by/max_by are not streaming-supported, but
min/max over struct(pos, value) is a streaming-legal commutative aggregate
and pos is unique per series, so struct ordering == ordering by pos —
first_val/last_val agree with the batch ladder bit-for-bit."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

POINTS_DDL = (
    "source string, doc_id string, pos long, ts timestamp, value double"
)


def stream_rollup_df(
    stream: DataFrame,
    tier_seconds: int = 60,
    watermark: str = "10 minutes",
    integer_values: bool = True,
) -> DataFrame:
    """Windowed tier aggregation over a streaming points frame."""
    v = F.col("value")
    sum_expr = F.sum(v.cast("long")) if integer_values else F.sum(v)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(
            "source",
            "doc_id",
            F.window("ts", f"{tier_seconds} seconds").alias("w"),
        )
        .agg(
            F.count(v).alias("n_obs"),
            sum_expr.alias("sum_val"),
            F.min(v).alias("min_val"),
            F.max(v).alias("max_val"),
            # streaming-legal first/last: pos is unique per series, so
            # min/max of struct(pos, value) == argmin/argmax by pos
            F.min(F.struct(F.col("pos"), v.alias("v"))).alias("_first"),
            F.max(F.struct(F.col("pos"), v.alias("v"))).alias("_last"),
        )
    )
    return agg.select(
        "source",
        "doc_id",
        F.col("w.start").alias("bucket_ts"),
        "n_obs",
        "sum_val",
        "min_val",
        "max_val",
        (F.col("sum_val").cast("double") / F.col("n_obs")).alias("avg_val"),
        F.col("_first.v").alias("first_val"),
        F.col("_last.v").alias("last_val"),
    )


def start_file_stream_rollup(
    spark,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    tier_seconds: int = 60,
    watermark: str = "10 minutes",
) -> StreamingQuery:
    """Production shape: parquet file source -> windowed agg -> parquet sink,
    append mode (only watermark-finalized windows are emitted), exactly-once
    via the checkpointed offset/commit log. Trigger availableNow processes
    the current backlog and stops (incremental batch over a stream API)."""
    stream = (
        spark.readStream.schema(POINTS_DDL)
        .option("maxFilesPerTrigger", "16")
        .parquet(input_path)
    )
    out = stream_rollup_df(stream, tier_seconds, watermark)
    return (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
