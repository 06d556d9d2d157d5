"""Cuckoo-filter prefilter: exactness discipline (no false negatives,
prefilter == exact anti-join) and saturation degradation."""

import numpy as np
from pyspark.sql import functions as F

from warc_bench_spark.config import CrawlConfig
from warc_bench_spark.functions.urls import sha256_hex
from warc_bench_spark.operators.cuckoo import (
    CuckooShard,
    CuckooShards,
    _parts,
    not_seen_cuckoo,
)
from warc_bench_spark.operators.dedup import not_seen_exact

CFG = CrawlConfig(bloom_shards=4)


def _hashes_df(spark, start, n):
    rows = [(sha256_hex(f"url-{i}"), f"https://u/{i}") for i in range(start, start + n)]
    return spark.createDataFrame(rows, "url_hash string, canonical_url string")


def test_cuckoo_no_false_negatives(spark):
    seen = _hashes_df(spark, 0, 3000)
    filt = CuckooShards(CFG, m_buckets=1 << 12).insert_df(spark, seen)
    maybe = filt.maybe_udf(spark)
    misses = seen.select(maybe(F.col("url_hash")).alias("m")).filter(~F.col("m"))
    assert misses.count() == 0


def test_cuckoo_prefilter_equals_exact(spark):
    seen = _hashes_df(spark, 0, 2000)
    cand = _hashes_df(spark, 1500, 2000)  # 500 overlap, 1500 fresh
    filt = CuckooShards(CFG, m_buckets=1 << 12).insert_df(spark, seen)
    got = {r["url_hash"] for r in not_seen_cuckoo(spark, cand, seen, filt).collect()}
    want = {r["url_hash"] for r in not_seen_exact(cand, seen).collect()}
    assert got == want and len(want) == 1500


def test_cuckoo_has_low_false_positive_rate(spark):
    seen = _hashes_df(spark, 0, 2000)
    fresh = _hashes_df(spark, 10_000, 2000)
    filt = CuckooShards(CFG, m_buckets=1 << 12).insert_df(spark, seen)
    maybe = filt.maybe_udf(spark)
    fp = fresh.select(maybe(F.col("url_hash")).alias("m")).filter(F.col("m")).count()
    assert fp / 2000 < 0.01  # 16-bit fingerprints -> ~2*4/65535 per probe


def test_cuckoo_million_row_distributed_build(spark):
    """The build must be per-shard on executors — the seen table is never
    driver-materialized (round-1 defect: insert_df used toPandas). Built
    from a 10^6-row Spark-generated table; exactness spot-checked on both
    member and non-member samples."""
    from warc_bench_spark.operators.cuckoo import insert_distributed

    seen = spark.range(0, 1_000_000).select(
        F.sha2(F.concat(F.lit("m"), F.col("id").cast("string")), 256).alias("url_hash")
    )
    payload = insert_distributed(spark, seen, CFG)
    assert set(payload) <= set(range(CFG.bloom_shards)) and len(payload) == CFG.bloom_shards
    assert not any(sat for _t, sat in payload.values()), "should not saturate at 0.5 load"
    filt = CuckooShards(CFG, payload=payload)
    maybe = filt.maybe_udf(spark)
    members = seen.sample(0.01, seed=1)
    assert members.select(maybe("url_hash").alias("m")).filter(~F.col("m")).count() == 0
    outsiders = spark.range(0, 20_000).select(
        F.sha2(F.concat(F.lit("x"), F.col("id").cast("string")), 256).alias("url_hash")
    )
    fp = outsiders.select(maybe("url_hash").alias("m")).filter(F.col("m")).count()
    assert fp / 20_000 < 0.01


def test_cuckoo_store_roundtrip_and_incremental(spark, tmp_path):
    from warc_bench_spark.operators.cuckoo import CuckooStore

    store = CuckooStore(str(tmp_path), CFG, m_buckets=1 << 12)
    p0 = store.update(spark, {}, _hashes_df(spark, 0, 500), wave=0)
    p1 = store.update(spark, p0, _hashes_df(spark, 500, 500), wave=1)
    loaded, stamp = store.load(up_to_wave=1)
    assert stamp == 1
    filt = CuckooShards(CFG, m_buckets=1 << 12, payload=loaded)
    maybe = filt.maybe_udf(spark)
    both = _hashes_df(spark, 0, 1000)
    assert both.select(maybe("url_hash").alias("m")).filter(~F.col("m")).count() == 0
    # stale load: only wave-0 stamp available below wave 1
    _p, stamp0 = store.load(up_to_wave=0)
    assert stamp0 == 0
    # a crash leftover .tmp file must never be picked up
    (tmp_path / "_cuckoo" / "shards_000009.npz.tmp.npz").write_bytes(b"torn")
    _p2, stamp2 = store.load(up_to_wave=9)
    assert stamp2 == 1


def test_cuckoo_saturation_degrades_to_maybe():
    # tiny table forced to overflow: probes must return True (never False)
    import pandas as pd

    shard = CuckooShard(m_buckets=4)
    hexes = pd.Series([sha256_hex(f"k{i}") for i in range(200)])
    h1, fp = _parts(hexes)
    shard.insert_many(h1, fp)
    assert shard.saturated
    assert shard.contains_many(h1, fp).all()
    other_h1, other_fp = _parts(pd.Series([sha256_hex("unseen-x")]))
    assert shard.contains_many(other_h1, other_fp).all()


def test_engine_golden_with_cuckoo_filter(spark, tmp_path):
    from warc_bench_spark.operators.crawl import CrawlEngine
    from warc_bench_spark.simulator import simulate_crawl
    from warc_bench_spark.synth import generate_corpus, write_corpus

    cfg = CrawlConfig(
        seed=42, n_urls=500, n_hosts=10, n_seeds=12, budget_per_wave=80, max_waves=4
    )
    corpus = generate_corpus(cfg)
    d = str(tmp_path / "corpus")
    write_corpus(spark, corpus, d)
    eng = CrawlEngine(spark, cfg, d, str(tmp_path / "state"), seen_filter="cuckoo")
    eng.run()
    got = [(r["seq"], r["canonical_url"]) for r in eng.crawl_log().collect()]
    want = [(s, c) for (s, _w, c, _h, _v, _p) in simulate_crawl(corpus, cfg).crawl_log]
    assert got == want
