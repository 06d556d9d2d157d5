"""Binary url_hash key equivalence (the SPARK_GRAFT_BINARY_HASH lever).

The kernel can carry url_hash as unhex(sha256) BINARY instead of the
64-char hex string (bench.py) — a pure re-encode. These tests pin the
invariant that makes that safe: unsigned byte order == lowercase-hex
order, so ranking, salting (byte-prefix vs nibble-prefix), dedup
anti-join, and virtual time are all unchanged.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from warc_bench_spark.config import CrawlConfig
from warc_bench_spark.operators.dedup import not_seen_exact
from warc_bench_spark.operators.politeness import schedule_wave

CFG = CrawlConfig(seed=7, hot_host_threshold=20, default_delay_ms=100, window_limit=5)


def _skewed_candidates(spark):
    # one host with 120 URLs (over the hot threshold -> split path), a few
    # cold hosts; urls deterministic
    rows = [(f"https://hot.example/p{i}", "hot.example", i % 3) for i in range(120)]
    for h in range(4):
        rows += [
            (f"https://cold{h}.example/p{i}", f"cold{h}.example", i % 3)
            for i in range(10)
        ]
    df = spark.createDataFrame(rows, "canonical_url string, host string, priority int")
    return df.withColumn("url_hash", F.sha2("canonical_url", 256))


def _schedule(spark, cand, binary: bool):
    if binary:
        cand = cand.withColumn("url_hash", F.unhex("url_hash"))
    robots = spark.createDataFrame(
        [("hot.example", 50)], "host string, crawl_delay_ms int"
    )
    out = schedule_wave(cand, robots, CFG)
    return sorted(
        (r["canonical_url"], r["k"], r["vt"]) for r in out.collect()
    )


def test_binary_key_schedule_identical_to_hex(spark):
    cand = _skewed_candidates(spark)
    assert _schedule(spark, cand, binary=False) == _schedule(spark, cand, binary=True)


def test_binary_key_anti_join_identical(spark):
    cand = _skewed_candidates(spark)
    seen = cand.limit(40).select("url_hash")
    hex_out = {
        r["canonical_url"] for r in not_seen_exact(cand, seen).collect()
    }
    cand_b = cand.withColumn("url_hash", F.unhex("url_hash"))
    seen_b = seen.withColumn("url_hash", F.unhex("url_hash"))
    bin_out = {
        r["canonical_url"] for r in not_seen_exact(cand_b, seen_b).collect()
    }
    assert hex_out == bin_out and len(hex_out) == 160 - 40


def test_binary_order_matches_hex_order(spark):
    """The load-bearing fact: sorting by the BINARY key yields exactly the
    hex-string sort order (lowercase hex is a monotone byte encoding)."""
    cand = _skewed_candidates(spark)
    hex_sorted = [
        r["canonical_url"]
        for r in cand.orderBy("url_hash").select("canonical_url").collect()
    ]
    bin_sorted = [
        r["canonical_url"]
        for r in cand.withColumn("url_hash", F.unhex("url_hash"))
        .orderBy("url_hash")
        .select("canonical_url")
        .collect()
    ]
    assert hex_sorted == bin_sorted
