"""End-to-end: the crawl engine fed from RAW SOURCE BYTES stays golden.

Round-1 corpora handed the engine pre-built robots and seeds tables; this
test re-derives both from the byte formats a crawler actually fetches —
robots.txt text parsed by sources/robots.py and a sitemap.xml seed list —
and asserts the crawl_log still equals the pure-Python simulator exactly.
That closes the loop: bytes -> parsed dimensions -> schedule -> golden
order.
"""

from warc_bench_spark.config import CrawlConfig
from warc_bench_spark.operators.crawl import CrawlEngine
from warc_bench_spark.simulator import simulate_crawl
from warc_bench_spark.sources.robots import robots_table, seeds_from_sitemap, sitemap_entries
from warc_bench_spark.synth import generate_corpus, write_corpus

CFG = CrawlConfig(
    seed=21, n_urls=500, n_hosts=12, n_seeds=15, budget_per_wave=80, max_waves=4
)


def test_crawl_from_raw_source_bytes(spark, tmp_path):
    corpus = generate_corpus(CFG)
    d = str(tmp_path / "corpus")
    write_corpus(spark, corpus, d)

    # --- robots dimension from robots.txt TEXT --------------------------
    robots_txt_rows = [
        (
            host,
            "User-agent: otherbot\nDisallow: /\n\nUser-agent: *\n"
            + "".join(f"Disallow: {p}\n" for p in prefixes)
            + f"Crawl-delay: {delay_ms / 1000}\n",
        )
        for host, (prefixes, delay_ms) in corpus.robots.items()
    ]
    parsed_robots = robots_table(
        spark.createDataFrame(robots_txt_rows, "host string, robots_txt string"),
        user_agent="warcbench-crawler",
        default_delay_ms=CFG.default_delay_ms,
    )
    parsed_robots.write.mode("overwrite").parquet(f"{d}/robots")

    # --- seed list from a sitemap.xml ------------------------------------
    # every corpus seed has priority 0 -> sitemap priority 1.0 maps back to 0
    locs = []
    for url, _base, _goal, priority in corpus.seeds:
        assert priority == 0
        full = url if "://" in url else f"https://{url}"
        locs.append(f"<url><loc>{full}</loc><priority>1.0</priority></url>")
    xml = '<?xml version="1.0"?><urlset>' + "".join(locs) + "</urlset>"
    entries = sitemap_entries(
        spark.createDataFrame([(0, xml)], "sid long, sitemap_xml string"), ["sid"]
    )
    seeds_from_sitemap(entries).write.mode("overwrite").parquet(f"{d}/seeds")

    # --- crawl from the byte-derived tables must stay golden ------------
    eng = CrawlEngine(spark, CFG, d, str(tmp_path / "state"), use_bloom=True)
    eng.run()
    got = [
        (r["seq"], r["wave"], r["canonical_url"], r["host"], r["vt"], r["priority"])
        for r in eng.crawl_log().collect()
    ]
    want = simulate_crawl(corpus, CFG).crawl_log
    assert len(got) > 50
    assert got == want
