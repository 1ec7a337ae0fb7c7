"""Plan-quality regressions: predicate pushdown and column pruning must
reach the parquet scans (SURVEY.md §4); UDF stages must not widen scans."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "error")
        .select("event_id", "value")
    )
    plan = _plan(ev)
    assert "DataFilters: [isnotnull(event_type" in plan
    assert "props" not in plan  # column pruning


def test_pricing_summary_pushdown(spark):
    import importlib.util, sys
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    plan = _plan(mod.queries()["pricing_summary"](spark, SF))
    assert "l_shipdate" in plan.split("DataFilters:")[1][:200]
    # only the needed 6 columns are read
    read = plan.split("ReadSchema:")[1][:400]
    assert "l_partkey" not in read and "l_suppkey" not in read


def test_udf_stage_does_not_widen_scan(spark):
    """Column pruning must survive the applyInPandas optimizer barrier:
    the whittaker query never reads `props` or `event_id`."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    plan = _plan(mod.queries()["whittaker_gapfill"](spark, SF))
    scan = plan.split("FileScan parquet")[1][:300]
    assert "props" not in scan and "event_id" not in scan


def test_topk_has_no_global_window_sort(spark):
    """Top-k must compile to TakeOrderedAndProject (parallel partial top-k),
    never a single-partition global sort feeding a window: the window may
    only run AFTER the k-row limit."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for name in ("cosine_topk", "ann_lsh_topk"):
        plan = _plan(mod.queries()[name](spark, SF))
        assert "TakeOrderedAndProject" in plan, name
        # any Window must sit above the TakeOrderedAndProject (k rows only)
        if "Window" in plan:
            assert plan.index("Window") < plan.index("TakeOrderedAndProject"), (
                f"{name}: window below the top-k limit = global sort"
            )


def test_phenometrics_single_scan_single_exchange(spark):
    """phenometrics must stay a one-pass window plan: ONE parquet scan and
    ONE hash exchange on the series key (the old groupBy + join-back shape
    re-scanned and re-shuffled the input 7x — at 100 TB that is 7x the IO)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    plan = _plan(mod.queries()["phenometrics"](spark, SF))
    assert plan.count("FileScan parquet") == 1, "phenometrics re-scans input"
    assert plan.count("Exchange hashpartitioning") == 1, (
        "phenometrics re-shuffles beyond the series-key exchange"
    )


def test_dedup_reuses_materialized_intermediates(spark):
    """Plan-shape contract per operator (round 6): ngram_jaccard's
    shingle table feeds several branches (cap, both join sides, exact
    verify) and must be persisted (InMemoryTableScan); minhash_lsh is
    the opposite — since the bucket-groupBy rewrite it is ONE
    single-consumer subtree, so it must scan the corpus exactly once
    and carry NO cache (a persist there is a pure extra
    materialization pass); banded/near-dup stacking must be an explode,
    not a per-band union that re-scans the corpus."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    plan = _plan(mod.queries()["dedup_ngram_jaccard"](spark, SF))
    assert "InMemoryTableScan" in plan, "ngram: shingles not cached"
    plan = _plan(mod.queries()["dedup_minhash_lsh"](spark, SF))
    assert "InMemoryTableScan" not in plan, "minhash: needless cache"
    assert plan.count("FileScan parquet") == 1, "minhash re-scans corpus"
    plan = _plan(mod.queries()["embedding_neardup"](spark, SF))
    # round 7 contract (second pass): ONE corpus scan into the
    # per-(table, bucket) pair+cosine kernel — the only exchange is the
    # small stacked (vector × table) repartition; pair generation, the
    # lowest-shared-table dedup and the exact cosine all happen inside
    # FlatMapGroupsInPandas, so no corpus-scale pair exchange may exist.
    assert plan.count("FileScan parquet") == 1, "neardup re-scans corpus"
    assert "FlatMapGroupsInPandas" in plan, "neardup: pair kernel missing"
    assert "hashpartitioning(vec_a" not in plan, (
        "neardup: corpus-scale pair exchange crept back in"
    )


def test_broadcast_join_for_small_side(spark):
    """The cosine top-k query must broadcast its 1-row query side."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    plan = _plan(mod.queries()["cosine_topk"](spark, SF))
    assert "Broadcast" in plan


def test_whittaker_groups_scale_with_parallelism(spark):
    """The whittaker driver query must inherit session.default_groups (task
    count scales with defaultParallelism) — a hardcoded group cap would
    ceiling solver parallelism on a real cluster."""
    import importlib.util

    from fusets_spark.session import default_groups

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.queries()["whittaker_gapfill"](spark, SF)
    # whittaker uses per_core=2/min 32 (sequential per-group loop — see
    # whittaker_gapfill docstring); still scales with defaultParallelism
    expected = default_groups(df, minimum=32, per_core=2)
    assert expected == max(32, spark.sparkContext.defaultParallelism * 2)
    # the bucket key literal appears in the plan: pmod(xxhash64(...), G)
    plan = _plan(df)
    assert f", {expected})" in plan.replace("L", ""), (
        f"expected group count {expected} not found in plan"
    )


def test_kernel_stages_resist_aqe_coalescing(spark):
    """Compute-bound applyInPandas kernels must keep their task count under
    AQE: session.repartition_for_kernel issues a user-specified
    REPARTITION_BY_NUM (exempt from size-based coalescing — AQE was
    measured collapsing the few-MB kernel shuffle to 2 of 32 cores) that
    also satisfies the groupBy distribution, so exactly ONE exchange
    appears and it is the non-coalescible kind."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for name in ("whittaker_gapfill", "gorilla_roundtrip"):
        df = mod.queries()[name](spark, SF)
        plan = _plan(df)
        assert "REPARTITION_BY_NUM" in plan, (
            f"{name}: kernel shuffle lost its AQE-coalesce exemption"
        )
        n_parts = spark.sparkContext.defaultParallelism * 4
        assert f", {n_parts}), REPARTITION_BY_NUM" in plan, (
            f"{name}: kernel partition count does not track parallelism"
        )
