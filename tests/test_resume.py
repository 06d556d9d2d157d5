"""Checkpoint/resume: kill after wave k, restart from the latest snapshot,
and the completed run must be bit-identical to an uninterrupted one — no
re-fetch, no politeness violation (the reference's resumability semantics,
parallel_computing_tasks.py:213-220, lifted to snapshot level)."""

from collections import Counter

import pytest

from warc_bench_spark.config import CrawlConfig
from warc_bench_spark.operators.crawl import CrawlEngine
from warc_bench_spark.simulator import simulate_crawl
from warc_bench_spark.synth import generate_corpus, write_corpus

CFG = CrawlConfig(
    seed=1234,
    n_urls=500,
    n_hosts=12,
    n_seeds=15,
    budget_per_wave=80,
    max_waves=5,
)


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(CFG)


@pytest.fixture(scope="module")
def corpus_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus_resume"))
    write_corpus(spark, corpus, d)
    return d


@pytest.mark.parametrize("use_bloom", [False, True])
def test_kill_and_resume_identical(spark, corpus, corpus_dir, tmp_path, use_bloom):
    golden = simulate_crawl(corpus, CFG)

    state = str(tmp_path / f"state_{use_bloom}")
    # run only 2 waves, then "kill" (drop the engine object entirely)
    eng1 = CrawlEngine(spark, CFG, corpus_dir, state, use_bloom=use_bloom)
    eng1.run(max_waves=2)
    manifest = eng1.store.latest()
    assert manifest["next_wave"] == 2
    seq_after_2 = manifest["seq_end"]
    del eng1

    # a fresh engine resumes from the snapshot and finishes the crawl
    eng2 = CrawlEngine(spark, CFG, corpus_dir, state, use_bloom=use_bloom)
    eng2.run()

    got = [(r["seq"], r["canonical_url"]) for r in eng2.crawl_log().collect()]
    want = [(s, c) for (s, _w, c, _h, _v, _p) in golden.crawl_log]
    assert got == want  # identical total order across the kill

    # no URL fetched twice (no re-fetch after resume)
    seqs = [g[0] for g in got]
    urls = [g[1] for g in got]
    assert len(set(urls)) == len(urls)
    assert seqs == list(range(1, len(seqs) + 1))
    assert len(got) > seq_after_2  # resume actually continued

    # url_seen multiset equality
    seen = Counter((r["url_hash"], r["wave"]) for r in eng2.url_seen().collect())
    assert seen == Counter(golden.url_seen.items())


def test_uncommitted_wave_is_invisible(spark, corpus_dir, tmp_path):
    """A manifest-less data dir (crash before rename) must be ignored."""
    import os

    state = str(tmp_path / "state2")
    eng = CrawlEngine(spark, CFG, corpus_dir, state, use_bloom=False)
    eng.run(max_waves=1)
    before = eng.store.latest()

    # simulate a crash mid-commit: orphan data files, no manifest
    orphan = os.path.join(state, "data", "crawl_log", "wave=99")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "garbage.parquet"), "w") as f:
        f.write("not parquet")

    eng2 = CrawlEngine(spark, CFG, corpus_dir, state, use_bloom=False)
    assert eng2.store.latest() == before  # orphan invisible
    log = eng2.crawl_log().collect()
    assert all(r["wave"] == 0 for r in log)


def test_compaction_preserves_golden(spark, corpus, corpus_dir, tmp_path):
    """Compacting url_seen/crawl_log every 2 waves must not change results,
    and must shrink the manifest's dir lists."""
    import dataclasses

    cfg = dataclasses.replace(CFG, compact_every=2)
    golden = simulate_crawl(corpus, cfg)
    eng = CrawlEngine(spark, cfg, corpus_dir, str(tmp_path / "state_c"), use_bloom=True)
    eng.run()
    got = [(r["seq"], r["canonical_url"]) for r in eng.crawl_log().collect()]
    want = [(s, c) for (s, _w, c, _h, _v, _p) in golden.crawl_log]
    assert got == want
    manifest = eng.store.latest()
    # after a compaction wave the url_seen list is short, not one-per-wave
    assert len(manifest["tables"]["url_seen"]) <= 2
    assert len(manifest["tables"]["crawl_log"]) <= 2
