"""Deterministic synthetic web corpus (FIXTURES.md §1-§3).

Generates, as a pure function of ``CrawlConfig.seed``:

* ``documents(doc_id, spans[])`` — interleaved text+media docs in the exact
  ``input_hint`` schema. ``spans[i] = (kind, text, media_ref, offset)``:
  ``kind='text'`` rows carry prose with embedded outlink URLs (raw form —
  volatile params like ``timestamp=<rand>`` present, exercising
  canonicalization); ``kind='media'`` rows carry an opaque
  ``blob://<hash>`` ref. ``offset`` is the dense 0-based order — the
  reference's ``repeated actions`` ordering invariant
  (``/root/reference/src/orby/protos/trajectory_data.proto:10-34``,
  ``action_data.proto:85-96``, append order at
  ``single_task_trajectory_collector.py:427-435``).
* ``pages(canonical_url, doc_id, host)`` — the fetch mapping (which URL
  yields which document; URLs without a page row 404).
* ``seeds(url, base_url, goal, priority)`` — frontier bootstrap; some URLs
  scheme-less to exercise https:// completion
  (``parallel_computing_tasks.py:199-208``).
* ``robots(host, disallow_prefixes, crawl_delay_ms)`` — broadcast dimension
  (the robots.txt cache of the north star; join pattern mirrors the
  task-config broadcast lookup ``subtask_benchmark/utils/utils.py:31-37``).

Host popularity is Zipf(alpha) to force skew (the hot-domain axis). A small
slice of URLs live on ``www.google.com/search`` to exercise the
host-conditional param drops of C1.

The same structures feed both the Spark engine and the pure-Python
simulator, so golden comparisons are a pure function of (seed, config).
"""

from __future__ import annotations

import random
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .config import CrawlConfig
from .functions.urls import canonicalize_url, sha256_hex

SECTIONS = ["a", "b", "c", "priv"]
GOOGLE_HOST = "www.google.com"

SPANS_SCHEMA = ArrayType(
    StructType(
        [
            StructField("kind", StringType()),
            StructField("text", StringType()),
            StructField("media_ref", StringType()),
            StructField("offset", IntegerType()),
        ]
    )
)

DOCUMENTS_SCHEMA = StructType(
    [StructField("doc_id", StringType()), StructField("spans", SPANS_SCHEMA)]
)


@dataclass
class UrlSpec:
    host: str
    path: str
    stable_query: str       # canonical-defining query (already encoded) or ""
    volatile_key: str | None  # a volatile param this URL always carries

    def canonical(self) -> str:
        # delegate to the engine's canonicalizer so the universe's canonical
        # form can never drift from C1 semantics
        q = self.stable_query
        if self.volatile_key:
            q = f"{q}&{self.volatile_key}=0" if q else f"{self.volatile_key}=0"
        raw = f"https://{self.host}{self.path}" + (f"?{q}" if q else "")
        return canonicalize_url(raw)

    def raw(self, rng: random.Random) -> str:
        """A raw appearance of this URL: random volatile value, sometimes
        extra droppable google params."""
        q = self.stable_query
        if self.volatile_key:
            vol = f"{self.volatile_key}={rng.randint(1, 10**9)}"
            q = f"{q}&{vol}" if q else vol
        if self.host == GOOGLE_HOST and rng.random() < 0.7:
            junk = f"ved={rng.randint(1, 10**6)}&ei=x{rng.randint(1, 10**6)}"
            q = f"{q}&{junk}" if q else junk
        return f"https://{self.host}{self.path}" + (f"?{q}" if q else "")


@dataclass
class Corpus:
    urls: list[UrlSpec]                 # the closed URL universe
    canonicals: list[str]               # canonical form per UrlSpec
    pages: dict[str, str]               # canonical_url -> doc_id
    documents: dict[str, list[tuple]]   # doc_id -> [(kind, text, media_ref, offset)]
    outlinks: dict[str, list[str]]      # doc_id -> raw outlink strings (as in text)
    seeds: list[tuple]                  # (url, base_url, goal, priority)
    robots: dict[str, tuple]            # host -> (disallow_prefixes, crawl_delay_ms)
    hosts: list[str]


def _zipf_weights(n: int, alpha: float) -> list[float]:
    return [1.0 / ((i + 1) ** alpha) for i in range(n)]


def generate_corpus(cfg: CrawlConfig) -> Corpus:
    rng = random.Random(cfg.seed)
    hosts = [cfg.host_name(i) for i in range(cfg.n_hosts)]
    weights = _zipf_weights(cfg.n_hosts, cfg.zipf_alpha)

    # --- URL universe -----------------------------------------------------
    urls: list[UrlSpec] = []
    for i in range(cfg.n_urls):
        if i % 37 == 5:  # a slice of google-search URLs (C1 host rule)
            spec = UrlSpec(GOOGLE_HOST, "/search", f"q=term{i}", None)
        else:
            host = rng.choices(hosts, weights=weights, k=1)[0]
            section = rng.choices(SECTIONS, weights=[5, 3, 2, 1], k=1)[0]
            stable = f"id={i}" if rng.random() < 0.4 else ""
            volatile = (
                rng.choice(["timestamp", "width", "r", "_"])
                if rng.random() < cfg.frac_volatile_params
                else None
            )
            spec = UrlSpec(host, f"/{section}/{i}", stable, volatile)
        urls.append(spec)
    canonicals = [u.canonical() for u in urls]

    # --- robots ------------------------------------------------------------
    robots: dict[str, tuple] = {}
    for i, h in enumerate(hosts):
        if rng.random() < cfg.n_disallow_hosts_frac:
            delay = rng.choice([250, 500, 1000, 2000, 3000])
            robots[h] = (["/priv"], delay)
    # google always has a delay and no disallows
    robots[GOOGLE_HOST] = ([], 500)

    # --- pages + documents ---------------------------------------------------
    pages: dict[str, str] = {}
    documents: dict[str, list[tuple]] = {}
    outlinks_map: dict[str, list[str]] = {}
    for spec, canon in zip(urls, canonicals):
        if rng.random() >= 0.9:  # ~10% of URLs 404
            continue
        doc_id = sha256_hex(canon)[:20]
        pages[canon] = doc_id
        drng = random.Random(f"{cfg.seed}:doc:{doc_id}")
        n_out = drng.randint(cfg.outlinks_min, cfg.outlinks_max)
        targets = [urls[drng.randrange(cfg.n_urls)] for _ in range(n_out)]
        raw_links = [t.raw(drng) for t in targets]
        outlinks_map[doc_id] = raw_links

        n_spans = drng.randint(2, cfg.spans_per_doc_max)
        spans: list[tuple] = []
        links_left = list(raw_links)
        for off in range(n_spans):
            is_last_text_slot = off == n_spans - 1 and links_left
            if not is_last_text_slot and drng.random() < cfg.frac_media_spans:
                ref = "blob://" + sha256_hex(f"{doc_id}:{off}")[:32]
                spans.append(("media", None, ref, off))
            else:
                take = 0
                if links_left:
                    take = drng.randint(1, min(2, len(links_left))) if off < n_spans - 1 else len(links_left)
                chunk, links_left = links_left[:take], links_left[take:]
                words = " ".join(
                    f"w{drng.randint(0, 999)}" for _ in range(drng.randint(3, 12))
                )
                body = words
                for link in chunk:
                    body += f" see {link} ."
                spans.append(("text", body, None, off))
        documents[doc_id] = spans

    # --- seeds ---------------------------------------------------------------
    doc_urls = [c for c in canonicals if c in pages]
    seeds: list[tuple] = []
    seen_seed = set()
    i = 0
    while len(seeds) < cfg.n_seeds and i < 10 * cfg.n_seeds:
        i += 1
        canon = doc_urls[rng.randrange(len(doc_urls))]
        if canon in seen_seed:
            continue
        seen_seed.add(canon)
        raw = canon
        if rng.random() < cfg.frac_schemeless_urls:
            raw = raw[len("https://"):]  # exercise complete_scheme (C2)
        host = canon.split("/", 3)[2]
        seeds.append((raw, host, f"goal {len(seeds)} for {host}", 0))

    return Corpus(
        urls=urls,
        canonicals=canonicals,
        pages=pages,
        documents=documents,
        outlinks=outlinks_map,
        seeds=seeds,
        robots=robots,
        hosts=hosts + [GOOGLE_HOST],
    )


# ---------------------------------------------------------------------------
# Spark materialization
# ---------------------------------------------------------------------------

def documents_df(spark: SparkSession, corpus: Corpus) -> DataFrame:
    rows = [
        (
            doc_id,
            [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for (k, t, m, o) in spans
            ],
        )
        for doc_id, spans in sorted(corpus.documents.items())
    ]
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)


def pages_df(spark: SparkSession, corpus: Corpus) -> DataFrame:
    rows = [
        (canon, doc_id, canon.split("/", 3)[2])
        for canon, doc_id in sorted(corpus.pages.items())
    ]
    return spark.createDataFrame(rows, "canonical_url string, doc_id string, host string")


def seeds_df(spark: SparkSession, corpus: Corpus) -> DataFrame:
    return spark.createDataFrame(
        corpus.seeds, "url string, base_url string, goal string, priority int"
    )


def robots_df(spark: SparkSession, corpus: Corpus) -> DataFrame:
    rows = [
        (host, prefixes, delay)
        for host, (prefixes, delay) in sorted(corpus.robots.items())
    ]
    return spark.createDataFrame(
        rows, "host string, disallow_prefixes array<string>, crawl_delay_ms int"
    )


def write_corpus(spark: SparkSession, corpus: Corpus, out_dir: str) -> None:
    documents_df(spark, corpus).write.mode("overwrite").parquet(f"{out_dir}/documents")
    pages_df(spark, corpus).write.mode("overwrite").parquet(f"{out_dir}/pages")
    seeds_df(spark, corpus).write.mode("overwrite").parquet(f"{out_dir}/seeds")
    robots_df(spark, corpus).write.mode("overwrite").parquet(f"{out_dir}/robots")


def is_allowed(canonical_url: str, robots: dict[str, tuple]) -> bool:
    """Robots check shared by simulator + tests: path-prefix disallow.

    The query string is stripped before the prefix match so the path here
    is exactly what the engine's ``F.parse_url(url, 'PATH')`` yields —
    keeping it would let a disallow prefix match into ``?query`` bytes on
    this side only (a latent engine/simulator parity hole).
    """
    parts = canonical_url.split("/", 3)
    host = parts[2]
    path = "/" + (parts[3] if len(parts) > 3 else "")
    path = path.partition("?")[0]
    rule = robots.get(host)
    if rule is None:
        return True
    return not any(path.startswith(p) for p in rule[0])


def crawl_delay_ms(host: str, robots: dict[str, tuple], default_ms: int) -> int:
    rule = robots.get(host)
    return rule[1] if rule is not None else default_ms
