"""Cluster-side corpus == lazy Python view (bit-for-bit), and the engine
matches the simulator golden on a Spark-generated corpus."""

import dataclasses

import pytest
from pyspark.sql import functions as F

from warc_bench_spark.config import CrawlConfig
from warc_bench_spark.operators.crawl import CrawlEngine
from warc_bench_spark.simulator import simulate_crawl
from warc_bench_spark.synth_spark import (
    SparkCorpusView,
    _u_py,
    _url_py,
    write_spark_corpus,
)

CFG = CrawlConfig(
    seed=2024,
    n_urls=3000,
    n_hosts=40,
    n_seeds=15,
    budget_per_wave=250,
    max_waves=4,
    hot_host_threshold=100,  # the head host IS hot -> split path exercised
)


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("spark_corpus"))
    write_spark_corpus(spark, d, CFG)
    return d


def test_spark_tables_match_python_view(spark, corpus_dir):
    view = SparkCorpusView(CFG)

    pages = {
        r["canonical_url"]: r["doc_id"]
        for r in spark.read.parquet(f"{corpus_dir}/pages").collect()
    }
    # spot-check coverage + exact doc ids through the lazy view
    assert len(pages) > 0.85 * CFG.n_urls
    for canonical, doc_id in list(pages.items())[:200]:
        assert view.pages.get(canonical) == doc_id

    probe_ids = [view.pages.get(c) for c in list(pages)[:200]]
    docs = {
        r["doc_id"]: r["spans"]
        for r in spark.read.parquet(f"{corpus_dir}/documents")
        .filter(F.col("doc_id").isin(probe_ids))
        .collect()
    }
    assert len(docs) == len(set(probe_ids))
    for doc_id, spans in docs.items():
        got = view.documents[doc_id]
        assert [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans] == got

    seeds = spark.read.parquet(f"{corpus_dir}/seeds").collect()
    assert sorted((r["url"], r["base_url"], r["goal"], r["priority"]) for r in seeds) == sorted(view.seeds)

    robots = {
        r["host"]: (list(r["disallow_prefixes"]), r["crawl_delay_ms"])
        for r in spark.read.parquet(f"{corpus_dir}/robots").collect()
    }
    assert robots == view.robots


def test_engine_matches_simulator_on_spark_corpus(spark, corpus_dir, tmp_path):
    golden = simulate_crawl(SparkCorpusView(CFG), CFG)
    eng = CrawlEngine(spark, CFG, corpus_dir, str(tmp_path / "state"), use_bloom=True)
    eng.run()
    got = [
        (r["seq"], r["wave"], r["canonical_url"], r["host"], r["vt"], r["priority"])
        for r in eng.crawl_log().collect()
    ]
    want = [tuple(x) for x in golden.crawl_log]
    assert len(got) == len(want) and got == want
    assert len(got) >= CFG.budget_per_wave  # the crawl expanded well past seeds
