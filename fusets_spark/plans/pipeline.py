"""The continuous-aggregate rollup pipeline (north rule's production job).

Incremental batch processing over an append-only tokenized-sequence table:
each input batch flows through the shuffle-free ladder
(rollup_ladder_from_tokens) and the Gorilla block encoder
(encode_blocks_from_tokens); every tier + the block store commit per batch
through the TierStore protocol (lineage manifest -> atomic watermark), so a
kill at ANY point resumes to byte-identical content (tested).

Deployment shape (cluster): `spark-submit --py-files fusets_spark.zip
fusets_spark/plans/pipeline.py <input> <store>` against Iceberg; batches =
Iceberg snapshot ranges. Here batches are parquet subdirectories.

Ordering: batches are processed in sorted batch_id order for determinism,
but commit/resume decisions use SET MEMBERSHIP of committed batch ids
(never id ordering — non-zero-padded ids like 'batch-10' < 'batch-9' would
otherwise skip uncommitted batches or reprocess committed ones).
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codec.blocks import encode_blocks_from_tokens
from ..operators.rollup import TIERS, rollup_ladder_from_tokens
from .lineage import TierStore

STAGES = [*TIERS.keys(), "blocks"]

# TimescaleDB-style default retention: fine data is the shortest-lived,
# coarser aggregates keep longer, the 1h tier forever (None).
DEFAULT_RETENTION: dict[str, float | None] = {
    "blocks": 7 * 86400.0,
    "1m": 30 * 86400.0,
    "5m": 180 * 86400.0,
    "1h": None,
}


def _read_tier_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a tier's partitioned parquet with partition-column type
    inference OFF (save/restore, mirroring write_batch): a numeric-
    looking batch id like '0123' would otherwise infer as int and the
    string isin() batch filters would silently drop every row. Keeping
    `batch` a string also keeps those filters plan-time partition-pruning
    predicates. Inference happens eagerly at read() time, so restoring
    the conf afterwards is safe."""
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    try:
        prev_infer = spark.conf.get(infer_key)
    except Exception:
        prev_infer = None
    spark.conf.set(infer_key, "false")
    try:
        return spark.read.parquet(path)
    finally:
        if prev_infer is None:
            spark.conf.unset(infer_key)
        else:
            spark.conf.set(infer_key, prev_infer)


def _config_hash(cfg: dict) -> str:
    return hashlib.sha256(
        json.dumps(cfg, sort_keys=True).encode()
    ).hexdigest()[:16]


class RollupPipeline:
    def __init__(
        self,
        store_root: str,
        t0: str = "2024-01-01 00:00:00",
        block_seconds: int = 3600,
    ):
        self.store = TierStore(store_root)
        self.cfg = {"t0": t0, "block_seconds": block_seconds, "v": 1}
        self.cfg_hash = _config_hash(self.cfg)
        self.t0 = t0
        self.block_seconds = block_seconds

    def _stage_df(self, tokens: DataFrame, stage: str) -> DataFrame:
        if stage == "blocks":
            return encode_blocks_from_tokens(
                tokens, t0=self.t0, block_seconds=self.block_seconds
            )
        # order keys stored with every tier row so cross-batch partials for
        # the same (series, bucket) — late data — merge EXACTLY on read
        ladder = rollup_ladder_from_tokens(
            tokens, t0=self.t0, with_order_keys=True
        )
        return ladder.filter(ladder["tier"] == stage).drop("tier")

    def _staged_stage_df(self, staged: DataFrame, stage: str) -> DataFrame:
        if stage == "blocks":
            return staged.filter(staged["kind"] == "block").select(
                "source", "doc_id", "bucket_ts", "n_points",
                "min_ts", "max_ts", "codec", "block",
            )
        return staged.filter(
            (staged["kind"] == "tier") & (staged["tier"] == stage)
        ).select(
            "source", "doc_id", "bucket_ts", "n_obs", "sum_val",
            "min_val", "max_val", "first_val", "last_val", "avg_val",
            "first_pos", "last_pos",
        )

    def process_batch(
        self,
        tokens: DataFrame,
        batch_id: str,
        fail_after_stage: str | None = None,
        fused: bool = True,
    ) -> None:
        """Commit one input batch through every stage. `fail_after_stage`
        simulates an executor/driver loss mid-commit (for the resume test):
        the stage's data+manifest are written but the watermark is NOT.

        fused=True (default, and the 10^12-scale path): ONE token scan
        materializes every tier + the blocks into an uncommitted staging
        dir (operators/ingest.py); each stage then commits from the cheap
        staged parquet instead of re-scanning the corpus — 4 corpus scans
        -> 1. Staging is overwrite-idempotent: a crash at any point
        resumes by re-materializing it, and committed stages are skipped
        exactly as before (content is byte-identical either way — the
        fused operator shares the separate operators' frame builders)."""
        import shutil

        staging = f"{self.store.root}/_staging/{batch_id}"
        pending = [
            s for s in STAGES if not self.store.is_committed(s, batch_id)
        ]
        if not pending:
            # a crashed fused run may have left staging behind after its
            # last stage committed — clean it whenever the batch is done
            shutil.rmtree(staging, ignore_errors=True)
            return
        if fused and len(pending) > 1:
            from ..operators.ingest import ingest_from_tokens

            spark = tokens.sparkSession
            ingest_from_tokens(
                tokens,
                t0=self.t0,
                block_seconds=self.block_seconds,
                with_order_keys=True,
            ).write.mode("overwrite").parquet(staging)
            staged = spark.read.parquet(staging)
            for stage in STAGES:
                if self.store.is_committed(stage, batch_id):
                    continue
                self.store.write_batch(
                    self._staged_stage_df(staged, stage),
                    stage, batch_id, self.cfg_hash,
                )
                if fail_after_stage == stage:
                    raise RuntimeError(
                        f"simulated failure after {stage}/{batch_id}"
                    )
                self.store.commit_watermark(stage, batch_id)
            shutil.rmtree(staging, ignore_errors=True)
            return
        for stage in STAGES:
            if self.store.is_committed(stage, batch_id):
                continue  # already committed (resume path)
            self.store.write_batch(
                self._stage_df(tokens, stage), stage, batch_id, self.cfg_hash
            )
            if fail_after_stage == stage:
                raise RuntimeError(f"simulated failure after {stage}/{batch_id}")
            self.store.commit_watermark(stage, batch_id)
        # non-fused completion of a batch whose fused run crashed with one
        # stage left: its orphaned staging parquet is no longer needed
        shutil.rmtree(staging, ignore_errors=True)

    def run(
        self,
        spark: SparkSession,
        batches: dict[str, DataFrame],
        fail_at: tuple[str, str] | None = None,
    ) -> None:
        """Process pending batches in order, skipping committed ones.
        fail_at = (batch_id, stage) simulated crash point."""
        for batch_id in sorted(batches):
            if all(self.store.is_committed(s, batch_id) for s in STAGES):
                continue
            fail_stage = fail_at[1] if fail_at and fail_at[0] == batch_id else None
            self.process_batch(batches[batch_id], batch_id, fail_stage)

    def read_tier(
        self,
        spark: SparkSession,
        stage: str,
        merged: bool = False,
        as_of_batches: set[str] | None = None,
    ) -> DataFrame:
        """SNAPSHOT-CONSISTENT tier read: only batch partitions in the
        store's live set (committed, not retired by retention or a
        committed compaction rewrite) are visible — a raw directory read
        would see crashed uncommitted writes, and duplicated data in the
        window between a compaction's commit and its source-partition
        drops. The batch filter is on the partition column, so Spark
        prunes at planning time (scale cost: zero data touched for dead
        batches).

        as_of_batches: explicit batch subset for time travel — read the
        store as it stood when exactly these batches were live (ids must
        be a subset of currently-readable partitions; retention-dropped
        data is gone). Default: the current live set.

        merged=True re-merges per-batch partial rows for the same
        (series, bucket) — exact under late data because stored rows carry
        first_pos/last_pos (see rollup.merge_tier_partials); a
        no-op-by-value when batches never share a bucket."""
        live = (
            as_of_batches
            if as_of_batches is not None
            else self.store.live_batches(stage)
        )
        df = _read_tier_parquet(spark, self.store.tier_path(stage)).filter(
            F.col("batch").isin(sorted(live))
        )
        if merged and stage != "blocks":
            from ..operators.rollup import merge_tier_partials

            missing = {"first_pos", "last_pos"} - set(df.columns)
            if missing:
                raise ValueError(
                    f"read_tier(merged=True) on '{stage}': stored rows lack "
                    f"order-key columns {sorted(missing)} — the tier was "
                    "written without with_order_keys=True (pre-upgrade or "
                    "external writer). Re-materialize the tier, or read "
                    "with merged=False."
                )
            return merge_tier_partials(df)
        return df

    def apply_compaction(
        self,
        spark: SparkSession,
        now: str,
        age_seconds: float = 7 * 86400.0,
        target_seconds: int = 86400,
    ) -> str | None:
        """POLICY-driven rewrite compaction — retention's sibling: find
        every live blocks batch whose newest data is at least `age_seconds`
        old at `now` and rewrite them into one coarser `target_seconds`
        batch (TimescaleDB's compress_chunk policy / Iceberg's
        rewrite_data_files, scheduled instead of hand-picked).

        Metadata-only selection: manifests carry each batch's max_ts, and
        batches already produced by this policy are recognized by their
        compaction config hash and skipped — re-running the policy on a
        quiet store is a no-op, so it can run on every pipeline tick.
        The new batch id is derived from the sorted source ids, making a
        crashed run resume into the SAME rewrite (is_committed skips the
        recompute; the drop loop finishes).

        Returns the new batch id, or None if nothing qualified."""
        from datetime import datetime, timedelta

        compact_hash = _config_hash(
            {**self.cfg, "compacted_to": target_seconds}
        )
        cutoff = datetime.fromisoformat(now) - timedelta(
            seconds=float(age_seconds)
        )
        live = self.store.live_batches("blocks")
        sources = sorted(
            m.batch_id
            for m in self.store.manifests("blocks")
            if m.batch_id in live
            and m.max_ts
            and m.config_hash != compact_hash
            and datetime.fromisoformat(m.max_ts) < cutoff
        )
        if not sources:
            return None
        new_id = "compact-" + hashlib.sha256(
            ",".join(sources).encode()
        ).hexdigest()[:12]
        self.compact_block_batches(
            spark, sources, new_id, target_seconds, config_hash=compact_hash
        )
        return new_id

    def compact_block_batches(
        self,
        spark: SparkSession,
        batch_ids: list[str],
        new_batch_id: str,
        target_seconds: int = 86400,
        config_hash: str | None = None,
    ) -> None:
        """Rewrite aged fine-block batches into ONE coarser-bucket batch
        (the TimescaleDB/Iceberg rewrite-compaction step of the retention
        lifecycle): whole blocks regrouped + re-encoded via
        codec.compact_blocks — never split, byte-identical to encoding the
        raw points at target_seconds directly.

        Crash-safe with the same commit discipline as ingest:
          1. read exactly the source batch partitions (pruned filter),
             compact, write as `new_batch_id` + manifest, commit watermark;
          2. drop each source partition and flag its manifest
             superseded_by=new_batch_id (lineage kept, committed set
             untouched so resume keeps skipping the old ids).
        A crash before the step-1 commit resumes by recomputing (overwrite-
        idempotent); after it, re-running skips straight to finishing the
        drops (mark_superseded is idempotent). The new batch's manifest
        carries `supersedes=batch_ids`, so snapshot readers
        (read_tier/live_batches) retire the sources ATOMICALLY with the
        step-1 commit — a crash inside the step-2 drop loop leaves both
        data trees on disk but never a duplicated read."""
        from ..codec.blocks import compact_blocks

        if not self.store.is_committed("blocks", new_batch_id):
            src = (
                _read_tier_parquet(spark, self.store.tier_path("blocks"))
                .filter(F.col("batch").isin(batch_ids))
                .drop("batch")
            )
            compacted = compact_blocks(src, target_seconds)
            self.store.write_batch(
                compacted, "blocks", new_batch_id,
                config_hash or self.cfg_hash,
                supersedes=batch_ids,
            )
            self.store.commit_watermark("blocks", new_batch_id)
        for bid in batch_ids:
            self.store.mark_superseded("blocks", bid, new_batch_id)

    def apply_retention(
        self, now: str, policy: dict[str, float | None] | None = None
    ) -> dict[str, list[str]]:
        """Drop batch partitions past each tier's horizon (see
        TierStore.apply_retention); commit state and lineage stay intact."""
        return self.store.apply_retention(policy or DEFAULT_RETENTION, now)


def main(argv: list[str] | None = None) -> None:
    """spark-submit entrypoint (the deployment shape in the module
    docstring; spark-submit takes a script path, not a module flag):

        spark-submit --py-files fusets_spark.zip \\
            fusets_spark/plans/pipeline.py <input_root> <store_root> \\
            [--t0 ...] [--block-seconds N] [--retention-now ISO] \\
            [--compact-now ISO] [--compact-age-days D] \\
            [--compact-target-seconds T]

    <input_root> holds one parquet subdirectory per batch (batch id =
    directory name; on Iceberg, snapshot ranges take this role). Committed
    batches are skipped via the TierStore watermark set, so re-running the
    same command after any crash resumes exactly."""
    import argparse
    import os

    from pyspark.sql import SparkSession

    ap = argparse.ArgumentParser(description="fusets_spark rollup pipeline")
    ap.add_argument("input_root", help="dir of per-batch parquet subdirs")
    ap.add_argument("store_root", help="tier-store root")
    ap.add_argument("--t0", default="2024-01-01 00:00:00")
    ap.add_argument("--block-seconds", type=int, default=3600)
    ap.add_argument(
        "--retention-now",
        default=None,
        help="apply the default retention policy as of this ISO timestamp",
    )
    ap.add_argument(
        "--compact-now",
        default=None,
        help="run policy-driven block compaction as of this ISO timestamp",
    )
    ap.add_argument("--compact-age-days", type=float, default=7.0)
    ap.add_argument("--compact-target-seconds", type=int, default=86400)
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("fusets-rollup").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    pipe = RollupPipeline(
        args.store_root, t0=args.t0, block_seconds=args.block_seconds
    )
    batches = {
        name: spark.read.parquet(os.path.join(args.input_root, name))
        for name in sorted(os.listdir(args.input_root))
        if os.path.isdir(os.path.join(args.input_root, name))
    }
    pipe.run(spark, batches)
    # retention BEFORE compaction: a batch past the retention horizon is
    # dropped outright, so the compaction pass never wastes a rewrite on
    # doomed data (expired batches leave the live set and are not
    # compaction candidates).
    if args.retention_now:
        dropped = pipe.apply_retention(args.retention_now)
        print(f"retention dropped: {dropped}")
    if args.compact_now:
        new_id = pipe.apply_compaction(
            spark,
            args.compact_now,
            age_seconds=args.compact_age_days * 86400.0,
            target_seconds=args.compact_target_seconds,
        )
        print(f"compaction: {new_id or 'nothing to compact'}")


if __name__ == "__main__":
    main()
