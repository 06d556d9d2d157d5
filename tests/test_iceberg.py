"""Iceberg-proper snapshot backend (north rule: "Iceberg snapshots").

The sandbox ships no Iceberg runtime jar and has no network to resolve one,
so the full-engine test SKIPS here and runs on any deployment where
``iceberg-spark-runtime`` is on the classpath (set ``SPARK_GRAFT_ICEBERG=1``
and build the session with ``iceberg_session_builder_conf``). What always
runs in-sandbox: the fallback gating (make_store must warn + fall back, and
the engine must stay golden-exact through it).
"""

import os

import pytest

from warc_bench_spark.config import CrawlConfig
from warc_bench_spark.iceberg import iceberg_available, iceberg_enabled
from warc_bench_spark.state import SnapshotStore, make_store


def test_make_store_falls_back_without_jar(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ICEBERG", "1")
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present — fallback path not reachable")
    with pytest.warns(UserWarning, match="no Iceberg runtime"):
        store = make_store(spark, str(tmp_path / "state"))
    assert isinstance(store, SnapshotStore)


def test_make_store_default_is_parquet(spark, tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_ICEBERG", raising=False)
    assert isinstance(make_store(spark, str(tmp_path / "state")), SnapshotStore)


needs_iceberg = pytest.mark.skipif(
    not (iceberg_enabled() and os.environ.get("SPARK_GRAFT_ICEBERG_WAREHOUSE")),
    reason="needs SPARK_GRAFT_ICEBERG=1 + warehouse + runtime jar on the classpath",
)


@needs_iceberg
def test_engine_golden_on_iceberg(tmp_path):
    """Full golden + resume on real Iceberg tables (cluster deployments)."""
    from pyspark.sql import SparkSession

    from warc_bench_spark.iceberg import IcebergSnapshotStore, iceberg_session_builder_conf
    from warc_bench_spark.operators.crawl import CrawlEngine
    from warc_bench_spark.simulator import simulate_crawl
    from warc_bench_spark.synth import generate_corpus, write_corpus

    builder = SparkSession.builder.appName("iceberg-golden").master("local[8]")
    for k, v in iceberg_session_builder_conf(
        os.environ["SPARK_GRAFT_ICEBERG_WAREHOUSE"]
    ).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime not on the classpath")
    cfg = CrawlConfig(
        seed=11, n_urls=500, n_hosts=10, n_seeds=12, budget_per_wave=80, max_waves=4
    )
    corpus = generate_corpus(cfg)
    d = str(tmp_path / "corpus")
    write_corpus(spark, corpus, d)
    state = str(tmp_path / "state")
    eng = CrawlEngine(spark, cfg, d, state)
    assert isinstance(eng.store, IcebergSnapshotStore)
    eng.run(max_waves=2)
    # resume mid-crawl from the committed Iceberg snapshots
    eng2 = CrawlEngine(spark, cfg, d, state)
    eng2.run()
    got = [(r["seq"], r["canonical_url"]) for r in eng2.crawl_log().collect()]
    want = [(s, c) for (s, _w, c, _h, _v, _p) in simulate_crawl(corpus, cfg).crawl_log]
    assert got == want
    eng2.store.destroy()
