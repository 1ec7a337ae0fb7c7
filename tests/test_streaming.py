"""Streaming rollup: the streaming windowed aggregation must agree with the
batch rollup on every window it emits (complete-mode memory sink for full
equality; append-mode file pipeline for the production shape)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from fusets_spark.datagen import generate_tokens
from fusets_spark.operators.explode import explode_raw
from fusets_spark.operators.rollup import rollup_from_raw
from fusets_spark.streaming.rollup_stream import (
    POINTS_DDL,
    start_file_stream_rollup,
    stream_rollup_df,
)


def _points_pdf(spark, n_docs=40, seed=5):
    toks = generate_tokens(spark, n_docs, seed=seed, min_tok=32, max_tok=200)
    return explode_raw(toks)


def test_streaming_equals_batch_complete_mode(spark, tmp_path):
    pts = _points_pdf(spark)
    src = str(tmp_path / "pts")
    pts.write.parquet(src)

    stream = (
        spark.readStream.schema(POINTS_DDL).parquet(src)
    )
    q = (
        stream_rollup_df(stream, tier_seconds=60)
        .writeStream.format("memory")
        .queryName("t1m_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cols = ["source", "doc_id", "bucket_ts", "n_obs", "sum_val",
            "min_val", "max_val", "first_val", "last_val", "avg_val"]
    got = spark.table("t1m_stream").select(*cols).toPandas()
    want = rollup_from_raw(spark.read.parquet(src), "1m").select(*cols).toPandas()
    key = ["source", "doc_id", "bucket_ts"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_streaming_file_pipeline_append_mode(spark, tmp_path):
    pts = _points_pdf(spark, n_docs=30, seed=9)
    src = str(tmp_path / "pts2")
    pts.write.parquet(src)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    q = start_file_stream_rollup(spark, src, out, ckpt, tier_seconds=60)
    q.awaitTermination(120)

    emitted = spark.read.parquet(out).toPandas()
    batch = rollup_from_raw(spark.read.parquet(src), "1m").toPandas()
    # append mode emits only watermark-finalized windows: a subset of batch
    key = ["source", "doc_id", "bucket_ts"]
    b = batch.set_index(key)
    for _, row in emitted.iterrows():
        k = (row["source"], row["doc_id"], row["bucket_ts"])
        assert k in b.index
        assert row["n_obs"] == b.loc[k, "n_obs"]
        assert row["sum_val"] == b.loc[k, "sum_val"]
    # restarting on the same checkpoint emits nothing new (exactly-once)
    n_before = len(emitted)
    q2 = start_file_stream_rollup(spark, src, out, ckpt, tier_seconds=60)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_before


def test_stream_output_feeds_coarser_tiers(spark, tmp_path):
    """The streaming 1m output composes with the batch ladder: re-aggregating
    the streamed tier through rollup_from_tier gives exactly the 1h tier the
    batch ladder computes from raw — the continuous-aggregate contract."""
    from fusets_spark.operators.rollup import rollup_from_tier

    pts = _points_pdf(spark, n_docs=25, seed=11)
    src = str(tmp_path / "pts3")
    pts.write.parquet(src)
    stream = spark.readStream.schema(POINTS_DDL).parquet(src)
    q = (
        stream_rollup_df(stream, tier_seconds=60)
        .writeStream.format("memory")
        .queryName("t1m_compose")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed_1m = spark.table("t1m_compose")
    got = rollup_from_tier(streamed_1m, "1h").toPandas()
    want = rollup_from_raw(spark.read.parquet(src), "1h").toPandas()
    key = ["source", "doc_id", "bucket_ts"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stateful_stream_blocks_match_batch_encoder(spark, tmp_path):
    """The applyInPandasWithState streaming block builder, drained with
    the sentinel recipe, must produce byte-identical Gorilla blocks to the
    batch encoder over the same points."""
    from fusets_spark.codec.blocks import encode_blocks
    from fusets_spark.datagen import generate_tokens
    from fusets_spark.operators.explode import explode_raw
    from fusets_spark.streaming.block_stream import seal_all_with_sentinels

    toks = generate_tokens(spark, 40, seed=9, min_tok=32, max_tok=128)
    pts = explode_raw(toks).select("source", "doc_id", "ts", "value")

    got = seal_all_with_sentinels(
        spark, pts, str(tmp_path / "drain"), block_seconds=60
    ).toPandas()
    want = encode_blocks(pts, block_seconds=60).toPandas()

    def bag(pdf):
        return sorted(
            (r.source, r.doc_id, r.bucket_ts, r.min_ts, r.max_ts,
             int(r.n_points), bytes(r.block))
            for r in pdf.itertuples()
        )

    assert len(got) == len(want) and len(got) > 0
    assert bag(got) == bag(want)


def test_stream_blocks_file_sink_byte_identical(spark, tmp_path):
    """PRODUCTION sink path (round 6): the sealed-block stream written
    through a parquet file sink + checkpoint — no memory sink, no driver
    collect — must hold the SAME byte-identical Gorilla blocks as the
    batch encoder."""
    from fusets_spark.codec.blocks import encode_blocks
    from fusets_spark.datagen import generate_tokens
    from fusets_spark.operators.explode import explode_raw
    from fusets_spark.streaming.block_stream import seal_all_with_sentinels

    toks = generate_tokens(spark, 35, seed=13, min_tok=32, max_tok=128)
    pts = explode_raw(toks).select("source", "doc_id", "ts", "value")
    work = str(tmp_path / "drain_file")

    got_df = seal_all_with_sentinels(
        spark, pts, work, block_seconds=60, sink="parquet"
    )
    got = got_df.toPandas()
    want = encode_blocks(pts, block_seconds=60).toPandas()

    def bag(pdf):
        return sorted(
            (r.source, r.doc_id, r.bucket_ts, r.min_ts, r.max_ts,
             int(r.n_points), bytes(r.block))
            for r in pdf.itertuples()
        )

    assert len(got) == len(want) and len(got) > 0
    assert bag(got) == bag(want)
