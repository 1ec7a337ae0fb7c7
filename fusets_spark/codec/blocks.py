"""Spark operators for compressed point blocks.

One block = one (source, doc_id, block bucket) — a block is NEVER split
across tasks (groupBy guarantees one group per task; SURVEY.md §7.3).

encode_blocks:  points -> (source, doc_id, bucket_ts, n_points, min/max ts,
                           codec, block: binary)
decode_blocks:  inverse, restores exact (ts, value) points.

The codec runs inside applyInPandas / mapInPandas over Arrow batches —
numpy bit-packing per group, no per-row Python in the Spark plan. Salted
repartitioning is unnecessary here because the grouping key includes doc_id
(high cardinality); skew handling for the coarse (source, bucket) keys lives
in rollup.salted_rollup and pipeline.write_partitioned.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .gorilla import decode_block, encode_block

BLOCK_SCHEMA = (
    "source string, doc_id string, bucket_ts timestamp, n_points long, "
    "min_ts timestamp, max_ts timestamp, codec string, block binary"
)
POINTS_SCHEMA = "source string, doc_id string, ts timestamp, value double"

CODEC_NAME = "gorilla-dod-xor-v1"


def encode_blocks(
    points: DataFrame, block_seconds: int = 3600, value_col: str = "value"
) -> DataFrame:
    """Compress raw points into per-(series, bucket) Gorilla blocks."""

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts", kind="mergesort")
        epoch_us = pdf["ts"].astype("int64") // 10**3  # µs: exact roundtrip
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        blk = encode_block(epoch_us.to_numpy(), vals)
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "doc_id": [pdf["doc_id"].iloc[0]],
                "bucket_ts": [pdf["_bucket"].iloc[0]],
                "n_points": [len(pdf)],
                "min_ts": [pdf["ts"].iloc[0]],
                "max_ts": [pdf["ts"].iloc[-1]],
                "codec": [CODEC_NAME],
                "block": [blk],
            }
        )

    bucket = F.timestamp_seconds(
        F.unix_timestamp("ts") - F.pmod(F.unix_timestamp("ts"), F.lit(block_seconds))
    )
    return (
        points.withColumn("_bucket", bucket)
        .groupBy("source", "doc_id", "_bucket")
        .applyInPandas(_encode, schema=BLOCK_SCHEMA)
    )


def decode_blocks(blocks: DataFrame) -> DataFrame:
    """Restore exact points from Gorilla blocks (verification / read path)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                ts, vals = decode_block(bytes(row.block))
                outs.append(
                    pd.DataFrame(
                        {
                            "source": row.source,
                            "doc_id": row.doc_id,
                            "ts": pd.to_datetime(ts * 10**3),
                            "value": vals,
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return blocks.select("source", "doc_id", "block").mapInPandas(
        _decode, schema=POINTS_SCHEMA
    )
