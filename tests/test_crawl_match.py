"""Golden crawl-order + URL-seen equality: Spark engine vs pure-Python
reference simulator (the north rule's core invariant).

Also proves:
* parallelism invariance — plain vs skew-split ranking produce the same
  total order (SURVEY.md §7.4 item 2/3);
* Bloom prefilter exactness — same result as the plain anti-join
  (§7.4 item 4).
"""

from collections import Counter

import pytest

from warc_bench_spark.config import CrawlConfig
from warc_bench_spark.operators.crawl import CrawlEngine
from warc_bench_spark.simulator import simulate_crawl
from warc_bench_spark.synth import generate_corpus, write_corpus

CFG = CrawlConfig(
    seed=42,
    n_urls=800,
    n_hosts=15,
    n_seeds=20,
    budget_per_wave=120,
    max_waves=6,
)


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(CFG)


@pytest.fixture(scope="module")
def corpus_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(spark, corpus, d)
    return d


@pytest.fixture(scope="module")
def golden(corpus):
    return simulate_crawl(corpus, CFG)


def run_engine(spark, corpus_dir, tmp, **kw):
    eng = CrawlEngine(spark, CFG, corpus_dir, str(tmp / "state"), **kw)
    eng.run()
    return eng


def log_tuples(eng):
    return [
        (r["seq"], r["wave"], r["canonical_url"], r["host"], r["vt"], r["priority"])
        for r in eng.crawl_log().collect()
    ]


def assert_matches_golden(eng, golden):
    got = log_tuples(eng)
    want = [(s, w, c, h, v, p) for (s, w, c, h, v, p) in golden.crawl_log]
    assert len(got) == len(want)
    # exact crawl order (seq -> canonical_url) — list equality
    assert [(g[0], g[2]) for g in got] == [(w[0], w[2]) for w in want]
    # and full row equality (wave, host, vt, priority)
    assert got == want
    # URL-seen multiset equality (Counter semantics, evaluator.py:137-148)
    seen = Counter((r["url_hash"], r["wave"]) for r in eng.url_seen().collect())
    want_seen = Counter(golden.url_seen.items())
    assert seen == want_seen


def test_engine_matches_simulator(spark, corpus_dir, golden, tmp_path):
    eng = run_engine(spark, corpus_dir, tmp_path, use_bloom=False)
    assert_matches_golden(eng, golden)
    assert len(log_tuples(eng)) > 200  # the crawl actually expanded


def test_bloom_path_identical(spark, corpus_dir, golden, tmp_path):
    eng = run_engine(spark, corpus_dir, tmp_path, use_bloom=True)
    assert_matches_golden(eng, golden)


def test_skew_split_rank_identical(spark, corpus_dir, golden, tmp_path):
    eng = run_engine(spark, corpus_dir, tmp_path, use_bloom=False, force_rank="split")
    assert_matches_golden(eng, golden)


def test_metrics_lineage_recorded(spark, corpus_dir, tmp_path):
    eng = run_engine(spark, corpus_dir, tmp_path, use_bloom=False)
    m = eng.metrics()
    metrics = {r["metric"] for r in m.collect()}
    assert {"admitted", "new_urls", "frontier_left", "frontier_partition_rows"} <= metrics
