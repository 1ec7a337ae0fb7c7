"""Kill-and-resume: after a simulated failure mid-commit, resuming must
produce content identical to an uninterrupted run (manifest hashes + full
row content per tier + blocks), per the north rule."""

from __future__ import annotations

import shutil

import pandas as pd
import pytest

from fusets_spark.datagen import generate_tokens
from fusets_spark.plans.pipeline import STAGES, RollupPipeline


@pytest.fixture()
def batches(spark):
    return {
        f"b{str(i).zfill(3)}": generate_tokens(
            spark, 60, seed=100 + i, min_tok=32, max_tok=200
        )
        for i in range(3)
    }


def _content(spark, pipe, stage):
    df = pipe.read_tier(spark, stage).toPandas()
    if "block" in df.columns:
        df["block"] = df["block"].map(bytes)
    return df.sort_values(
        [c for c in df.columns if c != "block"]
    ).reset_index(drop=True)


def test_kill_and_resume_identical(spark, batches, tmp_path):
    clean_root = str(tmp_path / "clean")
    crash_root = str(tmp_path / "crash")

    clean = RollupPipeline(clean_root)
    clean.run(spark, batches)

    crash = RollupPipeline(crash_root)
    with pytest.raises(RuntimeError, match="simulated failure"):
        crash.run(spark, batches, fail_at=("b001", "5m"))
    # crash mid-batch: b000 fully committed, b001 partially (5m data +
    # manifest written, watermark NOT advanced past 1m)
    assert crash.store.watermark("1m") == "b001"
    assert crash.store.watermark("5m") == "b000"
    # resume
    crash.run(spark, batches)

    for stage in STAGES:
        assert crash.store.watermark(stage) == "b002"
        cm = {m.batch_id: m for m in clean.store.manifests(stage)}
        xm = {m.batch_id: m for m in crash.store.manifests(stage)}
        assert cm.keys() == xm.keys()
        for b in cm:
            assert cm[b].content_hash == xm[b].content_hash, (stage, b)
            assert cm[b].n_rows == xm[b].n_rows
        a = _content(spark, clean, stage)
        b = _content(spark, crash, stage)
        pd.testing.assert_frame_equal(a, b)

    shutil.rmtree(clean_root)
    shutil.rmtree(crash_root)


def test_partition_pruning_on_source(spark, batches, tmp_path):
    """Tier storage is partitioned by (batch, source): a source filter must
    prune partitions at scan time, and manifests carry byte counts."""
    root = str(tmp_path / "prune")
    pipe = RollupPipeline(root)
    pipe.run(spark, dict(list(batches.items())[:1]))
    df = pipe.read_tier(spark, "1m").filter("source = 's2ndvi'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(source" in plan
    for m in pipe.store.manifests("1m"):
        assert m.n_bytes > 0
    shutil.rmtree(root)


def test_rerun_is_idempotent(spark, batches, tmp_path):
    import os

    root = str(tmp_path / "idem")
    pipe = RollupPipeline(root)
    pipe.run(spark, batches)
    before = {
        s: {m.batch_id: m.content_hash for m in pipe.store.manifests(s)}
        for s in STAGES
    }
    # force FULL reprocessing by dropping every watermark (commit state),
    # leaving data + manifests in place
    for s in STAGES:
        os.remove(pipe.store._wm_path(s))
    pipe.run(spark, batches)
    after = {
        s: {m.batch_id: m.content_hash for m in pipe.store.manifests(s)}
        for s in STAGES
    }
    assert before == after
    shutil.rmtree(root)


def test_resume_with_non_padded_batch_ids(spark, tmp_path):
    """Commit state is a SET of batch ids, not a string-ordered watermark:
    lexicographically 'batch-10' < 'batch-9', so ordering-based resume
    would silently SKIP batch-10 after committing batch-9."""
    root = str(tmp_path / "pad")
    b9 = generate_tokens(spark, 20, seed=9, min_tok=32, max_tok=64)
    b10 = generate_tokens(spark, 20, seed=10, min_tok=32, max_tok=64)
    pipe = RollupPipeline(root)
    pipe.run(spark, {"batch-9": b9})
    assert pipe.store.is_committed("1m", "batch-9")
    assert not pipe.store.is_committed("1m", "batch-10")
    pipe.run(spark, {"batch-9": b9, "batch-10": b10})
    for s in STAGES:
        got = {m.batch_id for m in pipe.store.manifests(s)}
        assert got == {"batch-9", "batch-10"}, (s, got)
    shutil.rmtree(root)
