"""Archive-bytes queries: the WACZ/WARC path under the oracle gate (S8/S9).

``q54_wacz_index`` drives the full byte pipeline — zip member read, gunzip,
from-scratch WARC parse, request↔response pairing, URL normalization
(``sources/wacz.py``, mirroring ``webreplay-standalone/src/libs/warc/
wacz.ts:17-66`` + ``warc-record.ts:21-120``) — over a deterministic .wacz
fixture synthesized from the ``documents`` table, so DuckDB can recompute
the expected index rows (URL + payload sha256) straight from the table.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from .relational import register, t

N_DOCS = 20  # fixture size: 2 archives x 10 exchanges


def _fixture_dir(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(tempfile.gettempdir(), f"wbs_wacz_fixture_{tag}")


def _doc_url(doc_id: int) -> str:
    # a stable param plus a volatile one, so normalization does real work:
    # canonicalize drops nothing but rewrites timestamp=... -> %7Btimestamp%7D
    return f"https://archive.example.com/doc/{doc_id}?ts={doc_id}&timestamp=9{doc_id}7"


def build_fixture(spark, sf_dir: str) -> str:
    """Synthesize 2 .wacz archives from the first N_DOCS documents.

    Setup code, not a measured path: the collect is N_DOCS rows. Payload
    bytes are the document text — DuckDB recomputes their sha256 from the
    table while Spark recomputes it from the *archived bytes*.
    """
    from ..sources.wacz import write_wacz

    out = _fixture_dir(sf_dir)
    # ALWAYS rebuilt: the fixture's bytes must reflect the CURRENT table
    # contents (a cached fixture from a prior driver round with regenerated
    # testdata would silently diverge from the oracle). Cost: a 20-row
    # collect + two small zip writes.
    rows = (
        t(spark, sf_dir, "documents", spread=True)
        .filter(F.col("doc_id") < N_DOCS)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    half = (len(rows) + 1) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        if not chunk:
            continue
        write_wacz(
            os.path.join(out, f"arch{i}.wacz"),
            [
                {"url": _doc_url(r["doc_id"]), "payload": r["text"].encode("utf-8")}
                for r in chunk
            ],
        )
    return out


@register(
    "q54_wacz_index",
    f"""
    SELECT doc_id,
           'https://archive.example.com/doc/' || doc_id || '?ts=' || doc_id
               || '&timestamp=%7Btimestamp%7D' AS normalized_url,
           sha256(text) AS payload_sha
    FROM documents WHERE doc_id < {N_DOCS} ORDER BY doc_id
    """,
)
def q54(spark, sf_dir):
    """S8+S9 bytes path: the request↔response index built from real archive
    bytes must reproduce, per document, the normalized URL and the payload
    digest that DuckDB derives from the source table."""
    from ..sources.wacz import scan_wacz_records, warc_request_index

    fixture = build_fixture(spark, sf_dir)
    records = scan_wacz_records(spark, os.path.join(fixture, "*.wacz"))
    idx = warc_request_index(records)
    return idx.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)", 1).cast("bigint").alias("doc_id"),
        "normalized_url",
        F.sha2(F.col("payload"), 256).alias("payload_sha"),
    ).orderBy("doc_id")


@register(
    "q57_robots_parse",
    """
    SELECT 'h' || s_suppkey || '.example.com' AS host,
           '/priv' || s_suppkey || '|/tmp' AS disallow,
           CAST(((s_suppkey % 5) + 1) * 1000 AS INT) AS crawl_delay_ms
    FROM supplier WHERE s_suppkey < 100 ORDER BY host
    """,
)
def q57(spark, sf_dir):
    """robots.txt byte parsing (sources/robots.py): group selection picks
    the ``*`` group for our agent over a more specific other-bot group;
    prefixes and Crawl-delay are recovered from real text the oracle
    constructed — the engine's robots dimension built from bytes."""
    from ..sources.robots import robots_table

    s = t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") < 100)
    k = F.col("s_suppkey").cast("string")
    text = F.concat(
        F.lit("# synthetic robots\nUser-agent: otherbot\nDisallow: /\n\n"),
        F.lit("User-agent: *\nDisallow: /priv"), k,
        F.lit("\nDisallow: /tmp\nCrawl-delay: "),
        ((F.col("s_suppkey") % 5) + 1).cast("string"),
        F.lit("\n"),
    )
    hosts = s.select(
        F.concat(F.lit("h"), k, F.lit(".example.com")).alias("host"),
        text.alias("robots_txt"),
    )
    parsed = robots_table(hosts, user_agent="warcbench-crawler")
    return parsed.select(
        "host",
        F.array_join("disallow_prefixes", "|").alias("disallow"),
        "crawl_delay_ms",
    ).orderBy("host")


@register(
    "q58_sitemap_seeds",
    """
    WITH o AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey < 100)
    SELECT url, base_url, 'sitemap seed ' || url AS goal, priority FROM (
        SELECT 'https://s' || k || '.example.com/a' AS url,
               's' || k || '.example.com' AS base_url, 2 AS priority FROM o
        UNION ALL
        SELECT 'https://s' || k || '.example.com/b' AS url,
               's' || k || '.example.com' AS base_url, 0 AS priority FROM o)
    ORDER BY url
    """,
)
def q58(spark, sf_dir):
    """sitemap.xml byte parsing -> the engine's seeds schema
    (sources/robots.py parse_sitemap + seeds_from_sitemap): loc/priority
    extracted from real XML text, priority remapped to the engine's
    ascending-int convention."""
    from ..sources.robots import seeds_from_sitemap, sitemap_entries

    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    k = F.col("o_orderkey").cast("string")
    xml = F.concat(
        F.lit('<?xml version="1.0"?><urlset><url><loc>https://s'), k,
        F.lit(".example.com/a</loc><priority>0.8</priority></url>"),
        F.lit("<url><loc>https://s"), k,
        F.lit(".example.com/b</loc><lastmod>2024-01-0"),
        ((F.col("o_orderkey") % 9) + 1).cast("string"),
        F.lit("</lastmod></url></urlset>"),
    )
    docs = o.select("o_orderkey", xml.alias("sitemap_xml"))
    entries = sitemap_entries(docs, ["o_orderkey"])
    return seeds_from_sitemap(entries).orderBy("url")
