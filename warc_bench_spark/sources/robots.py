"""robots.txt + sitemap.xml byte parsing — the crawler-native sources that
feed the engine's robots dimension table and seed list.

The north star's robots handling is "robots.txt cache joined as a broadcast
dimension"; round 1 consumed that cache as a pre-built table. This module
closes the byte gap with from-scratch parsers for the two public formats a
crawler actually fetches:

* ``parse_robots_txt`` — the Robots Exclusion Protocol subset a scheduler
  needs (RFC 9309 semantics, simplified): ``User-agent`` groups (the most
  specific matching group wins — longest agent token, ``*`` as fallback;
  consecutive agent lines share one group), ``Disallow`` path prefixes
  (empty value = allow all), ``Crawl-delay`` seconds -> ms, ``#`` comments,
  case-insensitive field names.
* ``parse_sitemap`` — ``<urlset>`` entries (``loc``, optional ``lastmod``,
  ``priority``) and ``<sitemapindex>`` child sitemaps, namespace-agnostic
  regex extraction (sitemaps.org protocol).

Spark lifts run the parsers as Arrow-batched stages and emit exactly the
engine's schemas: ``robots(host, disallow_prefixes, crawl_delay_ms)`` and
``seeds(url, base_url, goal, priority)``.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOC_RE = re.compile(r"<\s*loc\s*>\s*(.*?)\s*<\s*/\s*loc\s*>", re.I | re.S)
_URL_BLOCK_RE = re.compile(r"<\s*(url|sitemap)\s*>(.*?)<\s*/\s*\1\s*>", re.I | re.S)
_LASTMOD_RE = re.compile(r"<\s*lastmod\s*>\s*(.*?)\s*<\s*/\s*lastmod\s*>", re.I | re.S)
_PRIORITY_RE = re.compile(r"<\s*priority\s*>\s*(.*?)\s*<\s*/\s*priority\s*>", re.I | re.S)


def parse_robots_txt(
    text: str, user_agent: str = "*", default_delay_ms: int | None = None
) -> tuple[list[str], int | None]:
    """(disallow_prefixes, crawl_delay_ms) for ``user_agent``.

    Group selection: the group whose agent token is the longest prefix of
    (or equal to) ``user_agent`` wins; ``*`` matches anything with the
    lowest specificity. Returns ``([], default)`` when no group applies.
    """
    groups: list[tuple[list[str], list[str], int | None]] = []  # agents, disallows, delay
    agents: list[str] = []
    disallows: list[str] = []
    delay: int | None = None
    in_group_body = False

    def flush():
        nonlocal agents, disallows, delay, in_group_body
        if agents:
            groups.append((agents, disallows, delay))
        agents, disallows, delay = [], [], None
        in_group_body = False

    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:
                flush()
            agents.append(value.lower())
        elif field == "disallow":
            in_group_body = True
            if value:
                disallows.append(value)
        elif field == "crawl-delay":
            in_group_body = True
            try:
                delay = int(float(value) * 1000)
            except ValueError:
                pass
        else:
            in_group_body = bool(agents) and in_group_body
    flush()

    ua = user_agent.lower()
    best: tuple[int, list[str], int | None] | None = None
    for group_agents, dis, dly in groups:
        for a in group_agents:
            if a == "*":
                score = 0
            elif ua.startswith(a):
                score = len(a)
            else:
                continue
            if best is None or score > best[0]:
                best = (score, dis, dly)
    if best is None:
        return [], default_delay_ms
    return best[1], best[2] if best[2] is not None else default_delay_ms


def parse_sitemap(xml: str) -> list[dict]:
    """Entries of a urlset/sitemapindex: kind ('url'|'sitemap'), loc,
    lastmod, priority (None when absent)."""
    out = []
    for kind, block in _URL_BLOCK_RE.findall(xml or ""):
        loc = _LOC_RE.search(block)
        if not loc:
            continue
        lastmod = _LASTMOD_RE.search(block)
        prio = _PRIORITY_RE.search(block)
        out.append(
            {
                "kind": kind.lower(),
                "loc": loc.group(1),
                "lastmod": lastmod.group(1) if lastmod else None,
                "priority": float(prio.group(1)) if prio else None,
            }
        )
    return out


# ---------------------------------------------------------------------------
# Spark lifts
# ---------------------------------------------------------------------------

def robots_table(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    user_agent: str = "*",
    default_delay_ms: int | None = None,
) -> DataFrame:
    """(host, robots.txt bytes) -> the engine's robots dimension schema."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf[text_col].map(
                lambda t: parse_robots_txt(t, user_agent, default_delay_ms)
            )
            yield pd.DataFrame(
                {
                    "host": pdf[host_col],
                    "disallow_prefixes": parsed.map(lambda p: p[0]),
                    "crawl_delay_ms": parsed.map(lambda p: p[1]).astype("Int32"),
                }
            )

    return df.select(host_col, text_col).mapInPandas(
        parse, "host string, disallow_prefixes array<string>, crawl_delay_ms int"
    )


def sitemap_entries(df: DataFrame, id_cols: list[str], xml_col: str = "sitemap_xml") -> DataFrame:
    """(id_cols..., sitemap xml) -> one row per <url>/<sitemap> entry."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema if f.name in id_cols
    ) + ", kind string, loc string, lastmod string, priority double"

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # itertuples, not iterrows: each row is a whole XML document so the
        # regex parse dominates, but iterrows materializes a pandas Series
        # per row — pure overhead on an ingestion path
        for pdf in batches:
            rows = {k: [] for k in (*id_cols, "kind", "loc", "lastmod", "priority")}
            for tup in pdf[[*id_cols, xml_col]].itertuples(index=False):
                ids, xml = tup[: len(id_cols)], tup[len(id_cols)]
                for e in parse_sitemap(xml):
                    for c, v in zip(id_cols, ids):
                        rows[c].append(v)
                    rows["kind"].append(e["kind"])
                    rows["loc"].append(e["loc"])
                    rows["lastmod"].append(e["lastmod"])
                    rows["priority"].append(e["priority"])
            yield pd.DataFrame(rows)

    return df.select(*id_cols, xml_col).mapInPandas(parse, schema)


def seeds_from_sitemap(entries: DataFrame, default_priority: int = 0) -> DataFrame:
    """Sitemap url entries -> the engine's seeds schema. Sitemap priority is
    0..1 descending-good; the engine's priority is ascending-good ints, so
    p = round((1 - priority) * 10) with absent -> default."""
    urls = entries.filter(F.col("kind") == "url")
    prio = F.when(
        F.col("priority").isNotNull(),
        F.round((1 - F.col("priority")) * 10, 0).cast("int"),
    ).otherwise(F.lit(default_priority))
    return urls.select(
        F.col("loc").alias("url"),
        F.regexp_extract("loc", r"^[a-z]+://([^/]+)", 1).alias("base_url"),
        F.concat(F.lit("sitemap seed "), F.col("loc")).alias("goal"),
        prio.alias("priority"),
    )
