"""Cluster-side synthetic web corpus (the large-scale twin of synth.py).

synth.py builds the corpus in driver Python — right for unit-test sizes,
impossible at 10^6+ URLs. This module generates the same table shapes
(documents/pages/seeds/robots) entirely with JVM column expressions, and
every derivation is sha256-based so the pure-Python simulator can recompute
the identical web graph lazily (``SparkCorpusView``) — golden crawl-order
verification works at million-URL scale.

Shared spec (Spark exprs == Python below, bit for bit):

    u(tag, i)  = int(sha256(f"{seed}:{tag}:{i}").hexdigest()[:15], 16)
    host_id(i) = floor(((u('u', i) % 10^6) / 10^6)^3 * n_hosts)   # power-law skew
    url(i)     = https://host{host_id:05d}.sbench.example.com/p/{i}?id={i}
    has_doc(i) = u('d', i) % 10 < 9                                # ~10% 404
    doc_id(i)  = sha256(url(i))[:20]
    target(i,j)= u(f'o{j}', i) % n_urls, j in 0..outlinks-1
    spans(i)   = one text span: 'see {url(t0)} . see {url(t1)} . ...'
    robots     = hosts with host_id % 3 == 0: delay [250,500,1000,2000,3000][host_id % 5]
    seeds      = first n_seeds ids with has_doc, priority 0

URLs carry no volatile params (already canonical — the canonicalizer's
fast path applies); volatile handling is exercised by synth.py and the
kernel bench.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import CrawlConfig
from .functions.urls import sha256_hex

HOST_FMT = "host%05d.sbench.example.com"
DELAYS = [250, 500, 1000, 2000, 3000]


# ---------------------------------------------------------------------------
# shared derivations — Spark side
# ---------------------------------------------------------------------------

def _u_col(tag: str, i: Column, seed: int) -> Column:
    s = F.concat(F.lit(f"{seed}:{tag}:"), i.cast("string"))
    return F.conv(F.substring(F.sha2(s, 256), 1, 15), 16, 10).cast("long")


def _host_id_col(i: Column, seed: int, n_hosts: int) -> Column:
    u = (_u_col("u", i, seed) % 1_000_000).cast("double") / 1_000_000.0
    return F.floor(F.pow(u, 3.0) * n_hosts).cast("long")


def _url_col(i: Column, seed: int, n_hosts: int) -> Column:
    return F.concat(
        F.lit("https://"),
        F.format_string(HOST_FMT, _host_id_col(i, seed, n_hosts)),
        F.lit("/p/"),
        i.cast("string"),
        F.lit("?id="),
        i.cast("string"),
    )


def write_spark_corpus(
    spark: SparkSession,
    out_dir: str,
    cfg: CrawlConfig,
    outlinks: int = 4,
) -> None:
    seed, n, n_hosts = cfg.seed, cfg.n_urls, cfg.n_hosts
    ids = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    i = F.col("id")
    url = _url_col(i, seed, n_hosts)
    has_doc = (_u_col("d", i, seed) % 10) < 9
    doc_id = F.substring(F.sha2(url, 256), 1, 20)

    pages = ids.filter(has_doc).select(
        url.alias("canonical_url"),
        doc_id.alias("doc_id"),
        F.format_string(HOST_FMT, _host_id_col(i, seed, n_hosts)).alias("host"),
    )
    pages.write.mode("overwrite").parquet(f"{out_dir}/pages")

    link_parts = []
    for j in range(outlinks):
        t = (_u_col(f"o{j}", i, seed) % n).cast("long")
        link_parts += [F.lit(" see "), _url_col(t, seed, n_hosts), F.lit(" .")]
    text = F.concat(*link_parts)
    docs = ids.filter(has_doc).select(
        doc_id.alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                text.alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    docs.write.mode("overwrite").parquet(f"{out_dir}/documents")

    seeds = (
        ids.filter(has_doc)
        .filter(i < cfg.n_seeds * 3)
        .orderBy(i)  # deterministic pick: ascending id, same as the view
        .limit(cfg.n_seeds)
        .select(
            url.alias("url"),
            F.format_string(HOST_FMT, _host_id_col(i, seed, n_hosts)).alias("base_url"),
            F.concat(F.lit("goal "), i.cast("string")).alias("goal"),
            F.lit(0).alias("priority"),
        )
    )
    seeds.write.mode("overwrite").parquet(f"{out_dir}/seeds")

    hosts = spark.range(0, n_hosts).filter(F.col("id") % 3 == 0)
    robots = hosts.select(
        F.format_string(HOST_FMT, F.col("id")).alias("host"),
        F.array().cast("array<string>").alias("disallow_prefixes"),
        F.element_at(
            F.array(*[F.lit(d) for d in DELAYS]), (F.col("id") % 5).cast("int") + 1
        ).cast("int").alias("crawl_delay_ms"),
    )
    robots.write.mode("overwrite").parquet(f"{out_dir}/robots")


# ---------------------------------------------------------------------------
# shared derivations — Python side (lazy Corpus view for the simulator)
# ---------------------------------------------------------------------------

def _u_py(tag: str, i: int, seed: int) -> int:
    return int(hashlib.sha256(f"{seed}:{tag}:{i}".encode()).hexdigest()[:15], 16)


def _host_id_py(i: int, seed: int, n_hosts: int) -> int:
    u = (_u_py("u", i, seed) % 1_000_000) / 1_000_000.0
    return int(u**3 * n_hosts)


def _url_py(i: int, seed: int, n_hosts: int) -> str:
    h = HOST_FMT % _host_id_py(i, seed, n_hosts)
    return f"https://{h}/p/{i}?id={i}"


class _LazyPages:
    def __init__(self, view: "SparkCorpusView"):
        self.v = view

    def get(self, canonical: str):
        i = self.v.id_of(canonical)
        if i is None or not self.v.has_doc(i):
            return None
        doc_id = sha256_hex(canonical)[:20]
        self.v._doc_to_id[doc_id] = i
        return doc_id


class _LazyDocuments:
    def __init__(self, view: "SparkCorpusView"):
        self.v = view

    def __getitem__(self, doc_id: str):
        i = self.v._doc_to_id[doc_id]
        cfg = self.v.cfg
        parts = []
        for j in range(self.v.outlinks):
            t = _u_py(f"o{j}", i, cfg.seed) % cfg.n_urls
            parts.append(f" see {_url_py(t, cfg.seed, cfg.n_hosts)} .")
        return [("text", "".join(parts), None, 0)]


class SparkCorpusView:
    """Duck-typed ``synth.Corpus`` over the shared sha-derived spec — lazy,
    so the simulator handles million-URL universes without materializing
    them. Matches ``write_spark_corpus`` bit for bit."""

    def __init__(self, cfg: CrawlConfig, outlinks: int = 4):
        self.cfg = cfg
        self.outlinks = outlinks
        self._doc_to_id: dict[str, int] = {}
        self.pages = _LazyPages(self)
        self.documents = _LazyDocuments(self)
        self.robots = {
            HOST_FMT % h: ([], DELAYS[h % 5])
            for h in range(0, cfg.n_hosts, 3)
        }
        self.seeds = []
        picked = 0
        for i in range(cfg.n_seeds * 3):
            if picked >= cfg.n_seeds:
                break
            if self.has_doc(i):
                url = _url_py(i, cfg.seed, cfg.n_hosts)
                host = url.split("/", 3)[2]
                self.seeds.append((url, host, f"goal {i}", 0))
                picked += 1

    def has_doc(self, i: int) -> bool:
        return _u_py("d", i, self.cfg.seed) % 10 < 9

    def id_of(self, canonical: str) -> int | None:
        q = canonical.rsplit("?id=", 1)
        if len(q) != 2 or not q[1].isdigit():
            return None
        i = int(q[1])
        if 0 <= i < self.cfg.n_urls and _url_py(i, self.cfg.seed, self.cfg.n_hosts) == canonical:
            return i
        return None
