"""robots.txt + sitemap.xml byte parsing (sources/robots.py)."""

from pyspark.sql import functions as F

from warc_bench_spark.sources.robots import (
    parse_robots_txt,
    parse_sitemap,
    robots_table,
    seeds_from_sitemap,
    sitemap_entries,
)

ROBOTS = """
# example
User-agent: googlebot
Disallow: /nogoogle
Crawl-delay: 2

User-agent: warcbench
User-agent: otherbench
Disallow: /private
Disallow: /tmp/
Crawl-delay: 1.5

User-agent: *
Disallow: /all
"""


def test_parse_robots_group_selection():
    # exact/most-specific agent group wins over *
    dis, delay = parse_robots_txt(ROBOTS, user_agent="warcbench-crawler/1.0")
    assert dis == ["/private", "/tmp/"] and delay == 1500
    # shared group via consecutive User-agent lines
    dis2, _ = parse_robots_txt(ROBOTS, user_agent="otherbench")
    assert dis2 == ["/private", "/tmp/"]
    # unknown agent falls to *
    dis3, delay3 = parse_robots_txt(ROBOTS, user_agent="randombot")
    assert dis3 == ["/all"] and delay3 is None
    # empty / no match
    assert parse_robots_txt("", default_delay_ms=250) == ([], 250)
    # empty Disallow value = allow all
    dis4, _ = parse_robots_txt("User-agent: *\nDisallow:\n", "x")
    assert dis4 == []


def test_parse_sitemap_entries():
    xml = (
        '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://a.com/1</loc><priority>0.9</priority></url>"
        "<url><loc> https://a.com/2 </loc><lastmod>2024-02-03</lastmod></url>"
        "</urlset>"
    )
    es = parse_sitemap(xml)
    assert [(e["kind"], e["loc"]) for e in es] == [
        ("url", "https://a.com/1"),
        ("url", "https://a.com/2"),
    ]
    assert es[0]["priority"] == 0.9 and es[1]["lastmod"] == "2024-02-03"
    idx = parse_sitemap(
        "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc></sitemap></sitemapindex>"
    )
    assert idx == [
        {"kind": "sitemap", "loc": "https://a.com/s1.xml", "lastmod": None, "priority": None}
    ]
    assert parse_sitemap("") == [] and parse_sitemap("<urlset></urlset>") == []


def test_robots_table_matches_engine_schema(spark):
    """The parsed table slots straight into the engine's robots dimension
    (same schema the simulator's robots dict serializes to)."""
    df = spark.createDataFrame(
        [
            ("h1.example.com", "User-agent: *\nDisallow: /priv\nCrawl-delay: 2\n"),
            ("h2.example.com", "User-agent: x\nDisallow: /only-x\n"),
        ],
        "host string, robots_txt string",
    )
    parsed = robots_table(df, user_agent="warcbench", default_delay_ms=100)
    rows = {r["host"]: r for r in parsed.collect()}
    assert rows["h1.example.com"]["disallow_prefixes"] == ["/priv"]
    assert rows["h1.example.com"]["crawl_delay_ms"] == 2000
    assert rows["h2.example.com"]["disallow_prefixes"] == []
    assert rows["h2.example.com"]["crawl_delay_ms"] == 100
    assert [f.name for f in parsed.schema] == ["host", "disallow_prefixes", "crawl_delay_ms"]


def test_sitemap_to_seeds(spark):
    xml = (
        "<urlset><url><loc>https://s.com/a</loc><priority>0.8</priority></url>"
        "<url><loc>https://s.com/b</loc></url></urlset>"
    )
    df = spark.createDataFrame([(1, xml)], "sid long, sitemap_xml string")
    seeds = seeds_from_sitemap(sitemap_entries(df, ["sid"])).collect()
    got = {r["url"]: (r["base_url"], r["priority"]) for r in seeds}
    assert got == {"https://s.com/a": ("s.com", 2), "https://s.com/b": ("s.com", 0)}
    assert all(r["goal"].startswith("sitemap seed ") for r in seeds)
