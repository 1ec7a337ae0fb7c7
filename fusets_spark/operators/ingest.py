"""Fused single-scan ingest: every retention tier AND the Gorilla block
store from ONE pass over the tokenized-sequence table.

The separate from-tokens operators (rollup_ladder_from_tokens,
encode_blocks_from_tokens) each scan the corpus and each pay the dominant
cost — parquet array decode + Arrow transfer + token flattening (~85% of
kernel CPU at bench shape; the numpy folds are ~15%). A production ingest
materializes tiers and blocks together, so this operator shares one
decode_token_batch per Arrow batch and emits a superset-schema frame with
a `kind` discriminator ('tier' rows carry the rollup columns, 'block'
rows the codec columns; the other side is null). Splitting downstream is
a cheap filter; the expensive scan happens once.

Outputs are IDENTICAL to the separate operators by construction (shared
decode + shared frame builders; pinned in tests/test_rollup.py)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..codec.blocks import block_frame
from .rollup import decode_token_batch, ladder_frames

INGEST_SCHEMA = (
    "kind string, source string, doc_id string, bucket_ts timestamp, "
    # tier columns
    "n_obs long, sum_val long, min_val double, max_val double, "
    "first_val double, last_val double, avg_val double, tier string, "
    # block columns
    "n_points long, min_ts timestamp, max_ts timestamp, codec string, "
    "block binary"
)
INGEST_SCHEMA_ORDER_KEYS = INGEST_SCHEMA + ", first_pos long, last_pos long"

_TIER_COLS = [
    "n_obs", "sum_val", "min_val", "max_val",
    "first_val", "last_val", "avg_val", "tier",
]
_BLOCK_COLS = ["n_points", "min_ts", "max_ts", "codec", "block"]


def ingest_from_tokens(
    tokens_df: DataFrame,
    t0: str = "2024-01-01 00:00:00",
    block_seconds: int = 3600,
    with_order_keys: bool = False,
) -> DataFrame:
    """tokens -> one frame holding all three rollup tiers (kind='tier')
    and the encoded Gorilla blocks (kind='block'), from a single scan.
    with_order_keys adds first_pos/last_pos to tier rows (the late-data
    merge keys the pipeline stores; null on block rows)."""
    t0_s = int(pd.Timestamp(t0).value // 10**9)
    t0_us = t0_s * 10**6

    tier_cols = _TIER_COLS + (
        ["first_pos", "last_pos"] if with_order_keys else []
    )
    order = ["kind", "source", "doc_id", "bucket_ts", *_TIER_COLS, *_BLOCK_COLS] + (
        ["first_pos", "last_pos"] if with_order_keys else []
    )

    def _pad_nulls(frame: pd.DataFrame, null_cols: list[str]) -> pd.DataFrame:
        # Pad the other kind's columns with NATIVE-dtype placeholders.
        # Two hard constraints, both measured:
        #   * NEVER concat tier+block frames into one — mixing typed
        #     numerics with object Nones coerces the numeric columns to
        #     object dtype and Arrow serialization goes per-element
        #     (2x wall on the whole job);
        #   * NEVER use pandas extension dtypes ("Int64" masked ints) for
        #     the padded long columns — their Arrow conversion crashed
        #     Python workers sporadically under load (silent worker exit
        #     mid-stage, which local mode turns into a hung job). Integer
        #     placeholders are 0, not null: consumers (split_ingest, the
        #     pipeline stage filters) select only the columns matching the
        #     row's `kind`, so padded cells are never read.
        for col in null_cols:
            if col in ("min_ts", "max_ts", "bucket_ts"):
                frame[col] = pd.Series(pd.NaT, index=frame.index)
            elif col in ("codec", "tier"):
                frame[col] = ""
            elif col == "block":
                frame[col] = None  # binary: object column either way
            elif col in ("n_obs", "sum_val", "n_points", "first_pos",
                         "last_pos"):
                frame[col] = np.int64(0)
            else:
                frame[col] = np.nan
        return frame[order]

    def _ingest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dec = decode_token_batch(pdf)
            if dec is None:
                continue
            src_arr, doc_arr, d, pos, v = dec
            tiers = pd.concat(
                ladder_frames(
                    src_arr, doc_arr, d, pos, v, t0_s, with_order_keys
                ),
                ignore_index=True,
            )
            tiers.insert(0, "kind", "tier")
            yield _pad_nulls(tiers, _BLOCK_COLS)
            blocks = block_frame(
                src_arr,
                doc_arr,
                d,
                t0_us + pos * 10**6,
                v.astype(np.float64),
                block_seconds,
            )
            blocks.insert(0, "kind", "block")
            yield _pad_nulls(blocks, tier_cols)

    return tokens_df.select("source", "doc_id", "tokens").mapInPandas(
        _ingest,
        schema=INGEST_SCHEMA_ORDER_KEYS if with_order_keys else INGEST_SCHEMA,
    )


def split_ingest(ingested: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(tiers, blocks) views of a fused ingest frame — cheap filters; use
    after persisting the fused output (or over its parquet sink) so the
    token scan is not recomputed per side."""
    keys = [c for c in ("first_pos", "last_pos") if c in ingested.columns]
    tiers = ingested.filter("kind = 'tier'").select(
        "source", "doc_id", "bucket_ts", *_TIER_COLS, *keys
    )
    blocks = ingested.filter("kind = 'block'").select(
        "source", "doc_id", "bucket_ts", *_BLOCK_COLS
    )
    return tiers, blocks
