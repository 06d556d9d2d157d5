"""Pure-Python single-threaded reference crawl simulator.

Implements the deterministic crawl spec of ``config.CrawlConfig`` exactly as
the Spark engine does, but with plain dicts and sorts — no Spark, no
parallelism. It is the analog of the reference's golden-sequence comparison
(``/root/reference/src/orby/subtask_benchmark/webreplay-standalone/copy/
evaluate/compare.ts:11-80``): the engine's ``crawl_log`` must equal the
simulator's list exactly (seq -> canonical_url), and the final URL-seen set
must be multiset-equal (the Counter-equality semantics of
``subtask_benchmark/evaluator/evaluator.py:137-148``).

Semantics being simulated (with their reference origins):

* dedup/skip-if-seen  — ``parallel_computing_tasks.py:209-220``
* politeness window   — ``ray_scripts/frequency_limiter.py:24-47`` lifted to
  per-host virtual time (see CrawlConfig docstring)
* deterministic order — descending-lex task sort of ``eval_runner.py:77-83``
  replaced by the total order (vt, priority, url_hash)
* wave/barrier loop   — ``parallel_computing_controller.py:239-282``
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .config import CrawlConfig
from .functions.urls import URL_PATTERN, canonical_host, canonicalize_url, sha256_hex
from .synth import Corpus, crawl_delay_ms, is_allowed

_URL_RE = re.compile(URL_PATTERN)


@dataclass
class SimResult:
    # (seq, wave, canonical_url, host, vt, priority)
    crawl_log: list[tuple] = field(default_factory=list)
    url_seen: dict[str, int] = field(default_factory=dict)  # url_hash -> wave
    seen_urls: dict[str, str] = field(default_factory=dict)  # url_hash -> canonical
    waves_run: int = 0
    frontier_left: int = 0


def _host(canonical: str) -> str:
    # the one shared host definition (netloc, port preserved) — see
    # urls.canonical_host; the engine's identity UDF uses the same function
    return canonical_host(canonical)


def simulate_crawl(corpus: Corpus, cfg: CrawlConfig, max_waves: int | None = None) -> SimResult:
    max_waves = max_waves if max_waves is not None else cfg.max_waves
    res = SimResult()

    # frontier: url_hash -> (canonical, host, priority, discovered_wave)
    frontier: dict[str, tuple] = {}

    def try_insert(canonical: str | None, priority: int, wave: int) -> None:
        if canonical is None:
            return
        if not is_allowed(canonical, corpus.robots):
            return
        h = sha256_hex(canonical)
        if h in res.url_seen or h in frontier:
            return  # first discovery wins; seen URLs never re-enter
        frontier[h] = (canonical, _host(canonical), priority, wave)

    # bootstrap from seeds (canonicalize handles scheme completion)
    seed_best: dict[str, int] = {}
    seed_canon: dict[str, str] = {}
    for url, _base, _goal, priority in corpus.seeds:
        canonical = canonicalize_url(url)
        if canonical is None:
            continue
        h = sha256_hex(canonical)
        if h not in seed_best or priority < seed_best[h]:
            seed_best[h] = priority
            seed_canon[h] = canonical
    for h, priority in seed_best.items():
        try_insert(seed_canon[h], priority, 0)

    seq = 0
    wave = 0
    while wave < max_waves and frontier:
        # --- schedule: per-host virtual time -----------------------------
        by_host: dict[str, list[tuple]] = {}
        for h, (canonical, host, priority, _w) in frontier.items():
            by_host.setdefault(host, []).append((priority, h, canonical))
        scheduled: list[tuple] = []  # (vt, priority, url_hash, canonical, host)
        for host, items in by_host.items():
            items.sort()  # (priority asc, url_hash asc)
            delay = crawl_delay_ms(host, corpus.robots, cfg.default_delay_ms)
            for k, (priority, h, canonical) in enumerate(items):
                vt = max(k * delay, (k // cfg.window_limit) * cfg.window_ms)
                scheduled.append((vt, priority, h, canonical, host))
        scheduled.sort()  # total order: (vt, priority, url_hash)
        admitted = scheduled[: cfg.budget_per_wave]

        # --- admit: log + seen + frontier removal ------------------------
        new_links: dict[str, tuple] = {}  # canonical -> (min_priority,)
        for vt, priority, h, canonical, host in admitted:
            seq += 1
            res.crawl_log.append((seq, wave, canonical, host, vt, priority))
            res.url_seen[h] = wave
            res.seen_urls[h] = canonical
            del frontier[h]
            # --- fetch + expand (extract URLs from spans, in span order) --
            doc_id = corpus.pages.get(canonical)
            if doc_id is None:
                continue  # 404
            for kind, text, _media, _off in corpus.documents[doc_id]:
                if kind != "text" or not text:
                    continue
                for raw in _URL_RE.findall(text):
                    c = canonicalize_url(raw)
                    if c is None:
                        continue
                    p = priority + 1
                    if c not in new_links or p < new_links[c][0]:
                        new_links[c] = (p,)

        for c in sorted(new_links):
            try_insert(c, new_links[c][0], wave + 1)

        wave += 1
        res.waves_run = wave
        if not admitted:
            break

    res.frontier_left = len(frontier)
    return res
