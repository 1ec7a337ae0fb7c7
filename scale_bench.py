"""Scale-proof run (the empirical 100× argument): 10× the per-round bench
corpus — 8M token sequences, ~2×10⁹ points — through BOTH the raw fused
ingest job and the FULL production pipeline lifecycle (fused ingest commit
→ late-data batch + exact partial merge → block rewrite compaction →
retention), at two parallelism levels.

Not part of the per-round bench.py (whose budget is ~5 minutes): run
manually, results land in SCALE.json at the repo root and bench.py folds
them into its JSON line (key "scale_proof") so the round artifact carries
the evidence. Usage:

    python scale_bench.py            # 8M docs, levels 16 and 32
    SCALE_N_DOCS=2000000 python scale_bench.py   # smaller dry run

Measurements per level: wall + process-tree CPU-seconds per stage, peak
process-tree RSS (sampled at 4 Hz), ingest-only throughput in seq/s
(directly comparable to bench.py's sf0.1 `seq_per_sec` figure — the
within-20% criterion), and end-to-end pipeline wall.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SCALE_N_DOCS", "8000000"))
LEVELS = [int(x) for x in os.environ.get("SCALE_LEVELS", "16,32").split(",")]
CORPUS = f"/tmp/fusets_scale_tokens_{N_DOCS}"
LATE = f"/tmp/fusets_scale_late_{N_DOCS}"
STORE = "/tmp/fusets_scale_store"
# dedup/similarity scale leg (VERDICT r6 #6): replicate the driver's sf0.1
# text/embedding corpus DEDUP_REPS× with a per-replica vocabulary
# bijection (text) / fixed dimension permutation (embeddings) —
# deterministic, preserves each replica's internal near-dup structure,
# decorrelates replicas (no artificial cross-replica near-dups).
DEDUP_REPS = int(os.environ.get("SCALE_DEDUP_REPS", "40"))
DEDUP_BASE = os.environ.get("SCALE_DEDUP_BASE", "/root/testdata/sf0.1")
DEDUP_DOCS = f"/tmp/fusets_scale_docs_{DEDUP_REPS}x"
DEDUP_EMB = f"/tmp/fusets_scale_emb_{DEDUP_REPS}x"


def _materialize_dedup_corpus() -> None:
    """One-time (not timed) DEDUP_REPS× replication of the sf0.1
    documents/embeddings tables; pure pandas/pyarrow, no Spark session."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    if not os.path.exists(DEDUP_DOCS):
        docs = pq.read_table(
            os.path.join(DEDUP_BASE, "documents.parquet")
        ).to_pandas()
        frames = []
        for rep in range(DEDUP_REPS):
            d = docs.copy()
            d["doc_id"] = d["doc_id"] + rep * 10_000_000
            if rep:
                cache: dict[str, str] = {}

                def remap(t, rep=rep, cache=cache):
                    out = []
                    for w in t.split(" "):
                        m = cache.get(w)
                        if m is None:
                            m = hashlib.md5(
                                (w + str(rep)).encode()
                            ).hexdigest()[: max(8, len(w))]
                            cache[w] = m
                        out.append(m)
                    return " ".join(out)

                d["text"] = d["text"].map(remap)
                d["n_chars"] = d["text"].str.len()
            frames.append(d)
        pq.write_table(
            pa.Table.from_pandas(
                pd.concat(frames, ignore_index=True), preserve_index=False
            ),
            DEDUP_DOCS + ".tmp.parquet",
        )
        os.replace(DEDUP_DOCS + ".tmp.parquet", DEDUP_DOCS)
    if not os.path.exists(DEDUP_EMB):
        emb = pq.read_table(
            os.path.join(DEDUP_BASE, "embeddings.parquet")
        ).to_pandas()
        frames = []
        for rep in range(DEDUP_REPS):
            e = emb.copy()
            e["vec_id"] = e["vec_id"] + rep * 10_000_000
            if rep:
                perm = np.random.RandomState(rep).permutation(64)
                e["embedding"] = e["embedding"].map(
                    lambda v: np.asarray(v, dtype=np.float32)[perm]
                )
            frames.append(e)
        t = pa.Table.from_pandas(
            pd.concat(frames, ignore_index=True), preserve_index=False
        )
        t = t.set_column(
            t.schema.get_field_index("embedding"),
            "embedding",
            t.column("embedding").cast(pa.list_(pa.float32())),
        )
        pq.write_table(t, DEDUP_EMB + ".tmp.parquet")
        os.replace(DEDUP_EMB + ".tmp.parquet", DEDUP_EMB)
# Hard peak-RSS abort (GiB): a run that approaches box memory must FAIL
# loudly, not swap the whole box into noise (VERDICT r4: the committed
# local[32] evidence mixed a 131 GiB memory-pressured run on a 128 GiB
# box with a clean one — an ambiguous artifact is worse than an aborted
# run). 100 GiB default leaves ~28 GiB for OS + page cache.
RSS_ABORT_GIB = float(os.environ.get("SCALE_RSS_ABORT_GIB", "100"))


def _tree_rss_bytes() -> int:
    """Process-tree memory via PSS (proportional set size), not summed RSS:
    the 33+ pyspark workers fork from one daemon and share JVM/numpy pages
    copy-on-write, so summing statm RSS double-counts shared pages wildly
    (observed: a '208 GiB' sum on a 125 GiB swapless box — physically
    impossible). smaps_rollup's Pss divides each shared page across its
    mappers, so the tree sum is the true physical footprint. Falls back to
    statm RSS where smaps_rollup is unavailable."""
    from bench import _tree_pids  # the one shared /proc tree parser

    total = 0
    page = os.sysconf("SC_PAGE_SIZE")
    for p in _tree_pids():
        try:
            with open(f"/proc/{p}/smaps_rollup") as f:
                for line in f:
                    if line.startswith("Pss:"):
                        total += int(line.split()[1]) * 1024
                        break
        except OSError:
            try:
                with open(f"/proc/{p}/statm") as f:
                    total += int(f.read().split()[1]) * page
            except OSError:
                continue
    return total


class RssSampler:
    """Peak process-tree RSS, sampled at 4 Hz in a daemon thread.

    If the peak crosses RSS_ABORT_GIB the sampler hard-aborts the whole
    process (os._exit) after writing SCALE_ABORTED.json — the main thread
    is blocked inside a Spark action at that point and cannot be
    interrupted cleanly, and letting the box swap would poison every
    concurrent measurement anyway."""

    def __init__(self) -> None:
        self.peak = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        limit = RSS_ABORT_GIB * 2**30
        while not self._stop.is_set():
            self.peak = max(self.peak, _tree_rss_bytes())
            if self.peak > limit:
                note = {
                    "aborted": True,
                    "reason": f"peak tree RSS {self.peak / 2**30:.1f} GiB "
                    f"exceeded SCALE_RSS_ABORT_GIB={RSS_ABORT_GIB}",
                }
                with open(os.path.join(REPO, "SCALE_ABORTED.json"), "w") as f:
                    json.dump(note, f)
                print(f"scale: ABORT {note['reason']}", file=sys.stderr)
                os._exit(3)
            self._stop.wait(0.25)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(timeout=2)


def main() -> None:
    # local mode hosts every executor thread inside the ONE driver JVM, so
    # size its heap like the executor fleet it stands in for (32 tasks ×
    # ~1.5g like a real cluster's executor memory): the default 8g heap
    # OOMs in parquet read/write at 32 concurrent tasks over the 10x
    # corpus, which a multi-JVM cluster would never see.
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    from bench import _cpu_by_pid, _noop_write, _tree_cpu_sec

    from fusets_spark.datagen import generate_tokens
    from fusets_spark.operators.ingest import ingest_from_tokens
    from fusets_spark.plans.pipeline import RollupPipeline
    from fusets_spark.session import get_spark, ship_package

    def _mk_session(cores: int):
        spark = get_spark(
            "fusets-scale",
            cores=cores,
            shuffle_partitions=max(2 * cores, 16),
            extra_conf={
                "spark.python.worker.faulthandler.enabled": "true",
                "spark.sql.execution.pyspark.udf.faulthandler.enabled": "true",
                # a silently-dying Python worker hangs a local-mode job
                # forever (observed ~1/10 heavy runs under memory
                # pressure); speculation resubmits the straggler — the
                # same setting a production fleet runs with for slow or
                # lost executors
                "spark.speculation": "true",
                "spark.speculation.multiplier": "4",
                "spark.speculation.quantile": "0.9",
            },
        )
        ship_package(spark)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return spark

    out: dict = {"n_docs": N_DOCS, "levels": {}}

    # --- one-time corpus materialization (not timed) ----------------------
    prep = _mk_session(max(LEVELS))
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        print(f"scale: generating {N_DOCS} docs at {CORPUS}", file=sys.stderr)
        generate_tokens(
            prep, N_DOCS, min_tok=128, max_tok=384, partitions=512
        ).write.mode("overwrite").parquet(CORPUS)
    if not os.path.exists(os.path.join(LATE, "_SUCCESS")):
        # late batch: 1% extra sequences, same time range -> real cross-batch
        # partial merges on shared (series, bucket) keys
        generate_tokens(
            prep, N_DOCS // 100, seed=77, min_tok=128, max_tok=384,
            partitions=32,
        ).write.mode("overwrite").parquet(LATE)
    out["corpus_bytes"] = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(CORPUS) for f in fs
    )
    prep.stop()
    print(
        f"scale: materializing {DEDUP_REPS}x dedup corpus", file=sys.stderr
    )
    _materialize_dedup_corpus()
    out["dedup_reps"] = DEDUP_REPS

    for cores in LEVELS:
        spark = _mk_session(cores)
        level: dict = {}
        toks = spark.read.parquet(CORPUS)
        late = spark.read.parquet(LATE)

        with RssSampler() as rss:
            # (1) raw fused ingest job — bench.py's seq/s unit. Best-of-2:
            # the first run after a session hand-off pays JIT warmup plus
            # the OS reclaiming the previous level's worker memory, which
            # once inflated a single-run local[32] wall by 2x.
            samples = []
            for _ in range(2):
                cpu0, t0 = _tree_cpu_sec(), time.monotonic()
                _noop_write(ingest_from_tokens(toks, block_seconds=3600))
                samples.append(
                    (time.monotonic() - t0, _tree_cpu_sec() - cpu0)
                )
            wall, cpu = min(samples)
            level["ingest_noop_sec"] = round(wall, 1)
            level["ingest_noop_cpu_sec"] = round(cpu, 1)
            level["ingest_samples"] = [round(w, 1) for w, _ in samples]
            level["seq_per_sec"] = round(N_DOCS / level["ingest_noop_sec"], 1)

            # (2) full pipeline lifecycle against a fresh store
            stages: dict[str, float] = {}

            def timed(name, fn):
                c0, s0 = _cpu_by_pid(), time.monotonic()
                fn()
                stages[name] = round(time.monotonic() - s0, 1)
                # Per-PID delta, not tree-total delta: pyspark workers
                # from the PREVIOUS stage exit mid-window and take their
                # accumulated CPU with them, driving a tree-total delta
                # NEGATIVE (round-5 artifact: commit_main_cpu null at
                # both levels). Summing max(0, now - then) per surviving
                # or new pid is never negative; CPU of workers that exit
                # WITHIN the window is still lost, so this is a lower
                # bound — fine for the "wall moved, CPU didn't" check.
                c1 = _cpu_by_pid()
                dc = sum(max(0.0, v - c0.get(p, 0.0)) for p, v in c1.items())
                stages[name + "_cpu"] = round(dc, 1)

            # commit_main best-of-2 against a FRESH store per rep, like
            # the ingest stage: it is the longest single-shot window and
            # the first heavy WRITE of the level, so one cold pass under
            # phantom host load swung it 175→377 s across otherwise
            # identical runs (round 6; an isolated warm rep measured
            # 129.6 s). The commit is deterministic (kill/resume tests
            # pin byte identity), so the kept store is the same either
            # way; min wall is the house estimator under interference.
            commit_samples = []
            for _rep in range(2):
                # one retry per rep: the documented ~1/10
                # silently-crashed-Python-worker mode (Arrow stream
                # reader dies mid-save) killed two otherwise-clean runs
                # once the rep count doubled the heavy-commit exposure;
                # a crashed rep leaves a half-written store that the
                # fresh rmtree+pipeline below discards anyway
                for attempt in range(2):
                    shutil.rmtree(STORE, ignore_errors=True)
                    pipe = RollupPipeline(STORE, block_seconds=3600)
                    try:
                        timed(
                            "commit_main",
                            lambda: pipe.process_batch(toks, "b1"),
                        )
                        break
                    except Exception as e:  # noqa: BLE001
                        if attempt:
                            raise
                        print(
                            f"scale: commit_main crashed ({type(e).__name__}),"
                            " retrying once",
                            file=sys.stderr,
                        )
                commit_samples.append(
                    (stages["commit_main"], stages["commit_main_cpu"])
                )
            stages["commit_main"], stages["commit_main_cpu"] = min(
                commit_samples
            )
            level["commit_samples"] = [w for w, _ in commit_samples]
            timed("commit_late", lambda: pipe.process_batch(late, "b2"))
            timed(
                "merged_read_1m",
                lambda: _noop_write(pipe.read_tier(spark, "1m", merged=True)),
            )
            timed(
                "compact_blocks",
                lambda: pipe.compact_block_batches(
                    spark, ["b1", "b2"], "compact-1", 86400
                ),
            )
            timed(
                "retention",
                lambda: pipe.apply_retention("2024-02-15 00:00:00"),
            )
            level["pipeline_stages"] = stages
            level["pipeline_e2e_sec"] = round(
                sum(v for k, v in stages.items() if not k.endswith("_cpu")), 1
            )

            # (3) dedup/similarity training ops over the replicated text/
            # embedding corpus (VERDICT r6 #6: a local[16]→local[32] point
            # for the dedup family). Best-of-2 walls, build+execute like
            # bench.py's training loop (components runs its iterative
            # actions at build time). The capped (star) configuration is
            # the components-consumer pipeline being scaled.
            from fusets_spark.operators.dedup import (
                minhash_lsh_pairs,
                neardup_components,
            )
            from fusets_spark.operators.similarity import (
                embedding_neardup_pairs,
            )

            sdocs = spark.read.parquet(DEDUP_DOCS)
            semb = spark.read.parquet(DEDUP_EMB)
            dedup: dict = {"n_docs": sdocs.count(), "n_vecs": semb.count()}

            def _timed_best2(name, build):
                walls = []
                for _ in range(2):
                    t0 = time.monotonic()
                    _noop_write(build())
                    walls.append(round(time.monotonic() - t0, 1))
                    spark.catalog.clearCache()
                dedup[name] = min(walls)
                dedup[name + "_samples"] = walls

            _timed_best2(
                "minhash_lsh",
                lambda: minhash_lsh_pairs(sdocs, max_bucket_size=64),
            )
            _timed_best2(
                "components",
                lambda: neardup_components(
                    sdocs,
                    minhash_lsh_pairs(
                        sdocs, max_bucket_size=64, distinct=False
                    ),
                ),
            )
            _timed_best2(
                "embedding_neardup",
                lambda: embedding_neardup_pairs(semb, max_bucket_size=64),
            )
            level["dedup"] = dedup
        level["peak_rss_gib"] = round(rss.peak / 2**30, 2)
        level["store_bytes"] = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(STORE) for f in fs
        )
        out["levels"][f"local[{cores}]"] = level
        spark.stop()
        print(f"scale local[{cores}]: {level}", file=sys.stderr)

    out["loadavg"] = open("/proc/loadavg").read().split()[:3]
    with open(os.path.join(REPO, "SCALE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
