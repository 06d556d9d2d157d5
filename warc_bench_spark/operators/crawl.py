"""The crawl engine: wave loop over snapshot-committed frontier state.

Spark re-expression of the reference crawl pipeline (SURVEY.md §3.1,
``/root/reference/src/orby/trajectory_collector/ray_scripts/
parallel_computing_controller.py:239-282`` — schedule batch, barrier, write,
next). One wave =

    frontier ──anti-join seen (Bloom prefilter)──▶ candidates
             ──robots broadcast join + per-host virtual-time schedule──▶
             ──total order (vt, priority, url_hash), take budget──▶ admitted
    admitted ──▶ crawl_log Δ, url_seen Δ
    admitted ⋈ pages ⋈ documents ──explode spans, extract+canonicalize──▶
             new frontier rows (first discovery wins)
    one atomic snapshot commit (frontier replace + log/seen/metrics append)

Determinism: every step is a pure function of (corpus, config); the final
order comes only from the explicit sort keys, so partition counts and skew
salting cancel out (SURVEY.md §7.3) — verified by the local[2]-vs-local[32]
and plain-vs-split tests.

Resume: `run()` always starts from the latest committed snapshot; a kill
between commits replays at most one wave's work and can never re-fetch a URL
recorded in url_seen (the D1 "skip existing" semantics of
``parallel_computing_tasks.py:213-220`` lifted to snapshot level).

Scale notes (100 TB / 10^10-URL design point):
* frontier and url_seen are hash-partitioned on url_hash at write time so
  the per-wave anti-join is a co-partitioned shuffle; with Iceberg both
  sides would be bucketed on url_hash making it shuffle-free.
* the admitted set is bounded by the politeness budget, so the global sort
  is a TakeOrderedAndProject (top-B), never a full sort of the frontier.
* the only Python in the hot path is the Arrow-vectorized canonicalizer and
  the Bloom probe; scheduling, hashing, extraction, joins are all JVM.
* url_hash is carried as the 32-byte BINARY digest (cfg.binary_url_hash,
  default on since round 7) instead of the 64-char hex string: ~32 B/row
  less traffic through every exchange, sort, cache and persisted table at
  equal CPU — the r6-accepted kernel lever (BENCH/BASELINE.md) applied
  engine-wide. Ordering, salting and shard assignment are bit-identical
  in either encoding; the public readers still expose lowercase hex.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from ..config import CrawlConfig
from ..functions.urls import canonicalize_udf, host_from_canonical_col, url_hash_col
from ..state import make_store
from .dedup import BloomStore, not_seen_bloom, not_seen_exact
from .extract import extract_outlinks
from .politeness import schedule_wave

FRONTIER_COLS = ["url_hash", "canonical_url", "host", "priority", "discovered_wave"]


@dataclass
class WaveStats:
    wave: int
    admitted: int
    new_urls: int
    frontier_left: int
    # wall seconds per wave phase (keyed by the action that triggers the
    # compute: Spark is lazy, so 'seen_write' includes the whole candidate
    # pipeline + politeness schedule + admission that its write forces).
    # Self-diagnosing bench records: BENCH/last_run.json carries the sums.
    phases: dict[str, float] = field(default_factory=dict)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        cfg: CrawlConfig,
        corpus_dir: str,
        state_dir: str,
        use_bloom: bool = True,
        force_rank: str | None = None,
        seen_filter: str | None = None,
    ):
        """``seen_filter``: 'bloom' (default when use_bloom), 'cuckoo', or
        None (exact anti-join only). Both filters are prefilters with the
        same exactness discipline."""
        self.spark = spark
        self.cfg = cfg
        self.seen_filter = seen_filter or ("bloom" if use_bloom else None)
        self.use_bloom = self.seen_filter == "bloom"
        self.force_rank = force_rank
        self.store = make_store(spark, state_dir)
        self.blooms = BloomStore(state_dir, cfg)
        if self.seen_filter == "cuckoo":
            from .cuckoo import CuckooStore

            self.cuckoos = CuckooStore(state_dir, cfg)
        self.pages = spark.read.parquet(os.path.join(corpus_dir, "pages"))
        self.documents = spark.read.parquet(os.path.join(corpus_dir, "documents"))
        self.seeds = spark.read.parquet(os.path.join(corpus_dir, "seeds"))
        self.robots = spark.read.parquet(os.path.join(corpus_dir, "robots"))

    # ------------------------------------------------------------------ utils

    def _with_url_identity(self, df: DataFrame, url_col: str) -> DataFrame:
        """raw url column -> canonical_url, url_hash, host (C1+C2+C3).

        The canonicalize UDF returns ONE string column over Arrow; host is
        derived JVM-side (``host_from_canonical_col`` — netloc, port
        preserved, exactly the simulator's ``canonical_host``; ``parse_url
        ('HOST')`` would strip ports and diverge). Deriving host in the
        JVM instead of the UDF struct halves the Arrow return traffic —
        the r5 kernel t8 win (see urls.py docstring / BENCH/BASELINE.md).

        url_hash encoding follows ``cfg.binary_url_hash`` (32-byte BINARY
        by default since round 7 — the r6-accepted kernel lever applied
        engine-wide; identical ordering/salting/shard semantics, see
        config.py and tests/test_binary_key.py).
        """
        keep = [c for c in df.columns if c != url_col]
        return (
            df.withColumn("canonical_url", canonicalize_udf(F.col(url_col)))
            .select(*keep, "canonical_url")
            .filter(F.col("canonical_url").isNotNull())
            .withColumn("host", host_from_canonical_col(F.col("canonical_url")))
            .withColumn(
                "url_hash",
                url_hash_col(
                    F.col("canonical_url"), binary=self.cfg.binary_url_hash
                ),
            )
        )

    @staticmethod
    def _encode_key(df: DataFrame, binary: bool) -> DataFrame:
        """Re-encode url_hash to the requested carry (bijection both ways:
        unhex / lower∘hex — F.hex emits uppercase, the simulator lowercase)."""
        is_bin = isinstance(df.schema["url_hash"].dataType, BinaryType)
        if is_bin == binary:
            return df
        if binary:
            return df.withColumn("url_hash", F.unhex("url_hash"))
        return df.withColumn("url_hash", F.lower(F.hex("url_hash")))

    def _coerce_key(self, df: DataFrame | None) -> DataFrame | None:
        """Re-encode a persisted table's url_hash to cfg's carry encoding.

        A resume may load state written under the other encoding (e.g. a
        crawl started with SPARK_GRAFT_BINARY_HASH=0 resumed without it);
        joins between a binary and a string key would fail analysis. The
        Bloom/cuckoo shard files need no conversion at all — their bit
        positions derive from the same 60-bit digest slices in either
        encoding (dedup.hex_slices_u64).

        IMPORTANT (append-table discipline): this converts the IN-FLIGHT
        frame only. Deltas APPENDED to a persisted table must be written in
        the table's STORED encoding — parquet stores string and binary both
        as BYTE_ARRAY, so a mixed-encoding table reads back silently wrong
        (raw digest bytes decoded as "strings"), not as an analysis error.
        The stored encoding switches only on a compaction rewrite (replace
        mode). See _run_wave's url_seen write.
        """
        if df is None or "url_hash" not in df.columns:
            return df
        return self._encode_key(df, self.cfg.binary_url_hash)

    def _robots_allowed(self, df: DataFrame) -> DataFrame:
        """Drop robots-disallowed URLs (broadcast dimension join, J6).

        Path extraction is a regexp, not ``parse_url``: java.net.URI rejects
        URLs with raw non-URI chars (returns null), which would silently
        drop rows the simulator keeps. The regexp mirrors the simulator's
        string slicing exactly: everything from the first ``/`` after the
        netloc up to ``?``.
        """
        rules = self.robots.select("host", "disallow_prefixes")
        with_rules = df.join(F.broadcast(rules), "host", "left")
        # regexp_extract returns '' (never NULL) on no match, so the empty-
        # path guard must compare against '', matching the simulator's
        # path = '/' + rest default (synth.is_allowed)
        raw_path = F.regexp_extract("canonical_url", r"^[^:]+://[^/]+([^?]*)", 1)
        path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
        blocked = F.exists(
            "disallow_prefixes", lambda p: path.startswith(p)
        )
        return with_rules.filter(
            F.col("disallow_prefixes").isNull() | ~blocked
        ).drop("disallow_prefixes")

    # -------------------------------------------------------------- bootstrap

    def bootstrap(self) -> None:
        """Seed list -> wave-0 frontier snapshot (idempotent).

        Only the frontier is written: url_seen/crawl_log start as ABSENT
        tables (the wave-0 manifest lists no dirs for them) rather than
        empty parquet datasets — two empty-DataFrame write jobs saved, and
        the seed count rides the frontier write as an Observation instead
        of a dedicated count() action."""
        if self.store.latest() is not None:
            return
        from pyspark.sql import Observation

        seeded = self._with_url_identity(self.seeds, "url")
        # one row per canonical URL, min priority wins (deterministic)
        frontier = (
            seeded.groupBy("url_hash", "canonical_url", "host")
            .agg(F.min("priority").alias("priority"))
            .withColumn("discovered_wave", F.lit(0))
        )
        frontier = self._robots_allowed(frontier).select(*FRONTIER_COLS)
        obs = Observation()
        frontier = frontier.repartition(
            self.cfg.shuffle_partitions, "url_hash"
        ).observe(obs, F.count(F.lit(1)).alias("n"))
        rel = self.store.write_table("frontier", frontier, 0, mode="replace")
        self.store.publish(
            0,
            {"frontier": rel},
            {},
            extra={"next_wave": 0, "seq_end": 0, "frontier_count": int(obs.get["n"])},
        )

    # ------------------------------------------------------------------- wave

    def _run_wave(self, wave: int, seq_start: int, frontier_count: int) -> WaveStats:
        spark, cfg = self.spark, self.cfg
        phases: dict[str, float] = {}
        _t0 = time.perf_counter()

        def _mark(phase: str) -> None:
            nonlocal _t0
            now = time.perf_counter()
            phases[phase] = phases.get(phase, 0.0) + (now - _t0)
            _t0 = now

        frontier = self._coerce_key(self.store.read_table(spark, "frontier"))
        seen_raw = self.store.read_table(spark, "url_seen")
        # the persisted table's key encoding — appends must match it
        # (see _coerce_key's append-table discipline note)
        seen_stored_binary = (
            isinstance(seen_raw.schema["url_hash"].dataType, BinaryType)
            if seen_raw is not None
            else cfg.binary_url_hash
        )
        seen = self._coerce_key(seen_raw)
        if seen is None:  # wave 0: the bootstrap manifest lists no url_seen
            key_t = "binary" if cfg.binary_url_hash else "string"
            seen = spark.createDataFrame(
                [], f"url_hash {key_t}, canonical_url string, wave int"
            )
        seen_nonempty = seq_start > 0  # manifest metadata, no Spark job

        # 1. dedup: Bloom prefilter + exact anti-join (D1/S11). Shards are
        #    maintained incrementally across waves (BloomStore). Persisted:
        #    the skew-aware rank consumes candidates twice (window + offsets
        #    histogram), and admission reuses them — one materialization.
        shards: dict[int, bytes] = {}
        cuckoo_payload = {}
        if self.use_bloom and seen_nonempty:
            # Bloom false NEGATIVES would skip the exact anti-join and
            # re-admit seen URLs, so the shard set must cover every
            # committed seen delta: stamp >= wave-1, else rebuild from the
            # full table (covers crashes and bloom-disabled stretches).
            shards, stamp = self.blooms.load(up_to_wave=wave)
            if stamp < wave - 1:
                from .dedup import build_bloom_shards

                shards = build_bloom_shards(seen, cfg)
            cand = not_seen_bloom(spark, frontier, seen, cfg, shards=shards or None)
        elif self.seen_filter == "cuckoo" and seen_nonempty:
            from .cuckoo import CuckooShards, insert_distributed, not_seen_cuckoo

            # same stamp discipline as Bloom (false negatives bypass the
            # exact join); build/extend is distributed per shard
            cuckoo_payload, stamp = self.cuckoos.load(up_to_wave=wave)
            if stamp < wave - 1:
                cuckoo_payload = insert_distributed(spark, seen, cfg)
            filt = CuckooShards(cfg, payload=cuckoo_payload)
            cand = not_seen_cuckoo(spark, frontier, seen, filt)
        else:
            cand = not_seen_exact(frontier, seen)
        cand = cand.persist()

        # 2. politeness schedule (per-host virtual time, skew-aware rank).
        #    Hot-host detection reads the materialized frontier table (a
        #    pruned column scan), never the candidate pipeline — see
        #    rank_in_host's docstring.
        hot_hosts = (
            frontier.groupBy("host")
            .agg(F.count(F.lit(1)).alias("_pending"))
            .filter(F.col("_pending") > cfg.hot_host_threshold)
            .select("host")
        )
        # (A narrow-rank variant — ranking on (url_hash, host, priority)
        # only and re-joining canonical_url onto the bounded admitted set —
        # was A/B'd in round 4 and measured a TIE at the 10^6 scale: the
        # narrower window exchange saves what the extra cache scan + join
        # cost. Rejected to keep one admission path; BENCH/BASELINE.md.)
        sched = schedule_wave(
            cand, self.robots, cfg, force=self.force_rank, hot_hosts=hot_hosts
        )

        # 3. admission: top-budget of the total order; seq assignment.
        #    (top-k via sort+limit: below spark.sql.execution.
        #    topKSortFallbackThreshold this is TakeOrderedAndProject; above,
        #    a global sort + limit — both bounded by the budget on output.)
        #    The admitted COUNT rides as an Observation on the first snapshot
        #    write (no dedicated count() job); if the wave turns out empty,
        #    the already-written url_seen delta dir stays an unpublished
        #    orphan — exactly Iceberg's uncommitted-data-file semantics.
        from pyspark.sql import Observation

        order = [F.col("vt").asc(), F.col("priority").asc(), F.col("url_hash").asc()]
        obs_admitted = Observation()
        admitted = (
            sched.orderBy(*order)
            .limit(cfg.budget_per_wave)
            .withColumn("seq", F.row_number().over(Window.orderBy(*order)) + F.lit(seq_start))
            .observe(obs_admitted, F.count(F.lit(1)).alias("n"))
            .cache()
        )

        log_delta = admitted.select(
            F.col("seq").cast("long"),
            F.lit(wave).alias("wave"),
            "canonical_url",
            "host",
            F.col("vt").cast("long"),
            F.col("priority").cast("int"),
        )
        seen_delta = admitted.select(
            "url_hash", "canonical_url", F.lit(wave).alias("wave")
        )

        # first write triggers the admitted cache + observation
        compacting = (wave + 1) % cfg.compact_every == 0
        replace_rels: dict[str, str] = {}
        append_rels: dict[str, str] = {}
        if compacting:
            replace_rels["url_seen"] = self.store.write_table(
                "url_seen",
                seen.unionByName(seen_delta).repartition(cfg.shuffle_partitions, "url_hash"),
                wave + 1,
                mode="replace",
            )
        else:
            append_rels["url_seen"] = self.store.write_table(
                "url_seen",
                # append in the TABLE's stored encoding (a mixed-encoding
                # parquet table reads back silently wrong — both encodings
                # are BYTE_ARRAY physically); cfg's encoding takes over at
                # the next compaction rewrite
                self._encode_key(seen_delta, seen_stored_binary),
                wave + 1,
                mode="append",
            )
        n_admitted = int(obs_admitted.get["n"])
        _mark("schedule_seen_write")  # candidate pipeline + politeness +
        # admission + url_seen write — everything the first action forces
        if n_admitted == 0:
            admitted.unpersist()
            cand.unpersist()
            return WaveStats(wave, 0, 0, 0, phases)

        # 4. fetch + expand: admitted is budget-bounded -> broadcast side
        fetched = F.broadcast(admitted.select("canonical_url", "priority")).join(
            self.pages.select("canonical_url", "doc_id"), "canonical_url"
        )
        docs = fetched.join(self.documents, "doc_id")
        links = extract_outlinks(docs.select("doc_id", "priority", "spans"))
        expanded = self._with_url_identity(links, "raw_url")
        new_urls = expanded.groupBy("url_hash", "canonical_url", "host").agg(
            (F.min("priority") + 1).alias("priority")
        )
        new_urls = self._robots_allowed(new_urls)

        # 5. next frontier: remove admitted; add first-discovered new URLs.
        #    fresh excludes the whole frontier TABLE, not `remaining`: for
        #    rows already anti-joined against `admitted`,  x ∉ remaining
        #    ⟺ x ∉ frontier ∨ x ∈ admitted  ⟺ x ∉ frontier — same set,
        #    but the anti-join's build side is the materialized parquet
        #    scan instead of a second frontier⟂admitted subtree (the
        #    union branch below already computes `remaining` once).
        remaining = frontier.join(admitted.select("url_hash"), "url_hash", "left_anti")
        fresh = (
            new_urls.join(seen.select("url_hash"), "url_hash", "left_anti")
            .join(admitted.select("url_hash"), "url_hash", "left_anti")
            .join(frontier.select("url_hash"), "url_hash", "left_anti")
            .withColumn("discovered_wave", F.lit(wave + 1))
            .select(*FRONTIER_COLS)
        )
        # the frontier count AND the per-partition lineage histogram ride
        # the frontier WRITE as one Observation — no dedicated count() job
        # and no lineage groupBy job (round-1 had ~8 actions/wave; round 2
        # still spent a shuffle job on the lineage histogram). One
        # count-if per shuffle partition: the partition count is a config
        # constant, so this is a fixed-width aggregate evaluated in the
        # same pass as the write, regardless of data size.
        # Version-sensitivity note: spark_partition_id() is flagged
        # nondeterministic, and some Spark contexts reject nondeterministic
        # expressions inside aggregates — inside an Observation on the
        # deployed version this is accepted (pinned by the golden tests
        # that run run_wave end-to-end). The histogram width is capped so
        # the Observation stays a fixed-width aggregate even under a
        # shuffle_partitions=2000 cluster config; above the cap, partition
        # ids fold into `width` buckets (mod), which keeps the skew signal
        # while bounding the driver-side row width.
        hist_width = min(cfg.shuffle_partitions, 64)
        obs_frontier = Observation()
        part_counts = [
            F.count(F.when(F.spark_partition_id() % hist_width == i, 1)).alias(f"p{i}")
            for i in range(hist_width)
        ]
        # no cache: the write below is next_frontier's ONLY action now that
        # the count and the lineage histogram ride its Observation (round 2
        # cached it for the lineage groupBy's second pass)
        next_frontier = (
            remaining.select(*FRONTIER_COLS)
            .unionByName(fresh)
            .repartition(cfg.shuffle_partitions, "url_hash")
            .observe(obs_frontier, F.count(F.lit(1)).alias("n"), *part_counts)
        )
        replace_rels["frontier"] = self.store.write_table(
            "frontier", next_frontier, wave + 1, mode="replace"
        )
        n_frontier = int(obs_frontier.get["n"])
        n_new = n_frontier - (frontier_count - n_admitted)
        _mark("expand_frontier_write")

        if compacting:
            # periodic rewrite of the append tables as one compact version
            # (small-files control; Iceberg's rewrite_data_files)
            old_log = self.store.read_table(spark, "crawl_log")
            full_log = (
                old_log.unionByName(log_delta) if old_log is not None else log_delta
            )
            replace_rels["crawl_log"] = self.store.write_table(
                "crawl_log", full_log.repartition(4), wave + 1, mode="replace"
            )
        else:
            append_rels["crawl_log"] = self.store.write_table(
                "crawl_log", log_delta, wave + 1, mode="append"
            )
        _mark("log_write")

        # 6. metrics + per-partition lineage (X10 analog / north-star
        #    lineage). The histogram came out of the frontier write's
        #    Observation, so the metrics delta is a driver-local DataFrame:
        #    its write is one single-task job with no cache scan or shuffle.
        obs_row = obs_frontier.get
        metric_rows = [
            (wave, "frontier_partition_rows", str(i), int(obs_row[f"p{i}"]))
            for i in range(hist_width)
            if int(obs_row[f"p{i}"]) > 0
        ] + [
            (wave, "admitted", None, n_admitted),
            (wave, "new_urls", None, max(n_new, 0)),
            (wave, "frontier_left", None, n_frontier),
        ]
        # all values are driver scalars already — write_local_table puts
        # them down without a Spark job on the parquet store (the Iceberg
        # store routes the same call through a normal table commit, since
        # every Iceberg write must go through the table format)
        import pyarrow as pa

        cols = list(zip(*metric_rows))
        pa_tbl = pa.table(
            {
                "wave": pa.array(cols[0], pa.int32()),
                "metric": pa.array(cols[1], pa.string()),
                "key": pa.array(cols[2], pa.string()),
                "value": pa.array(cols[3], pa.int64()),
            }
        )
        append_rels["metrics"] = self.store.write_local_table(
            "metrics", pa_tbl, wave + 1
        )

        # 7. atomic snapshot publish: every data dir above exists; one
        #    manifest rename makes them all visible together.
        self.store.publish(
            wave + 1,
            replace_rels,
            append_rels,
            extra={
                "next_wave": wave + 1,
                "seq_end": seq_start + n_admitted,
                "frontier_count": n_frontier,
            },
        )
        _mark("metrics_publish")
        if self.use_bloom:
            # OR this wave's seen delta into the persisted shard set; done
            # after the snapshot commit so a crash between the two leaves
            # shards stale-behind, which the stamp check repairs on resume
            self.blooms.update(shards, seen_delta, wave)
        elif self.seen_filter == "cuckoo":
            self.cuckoos.update(spark, cuckoo_payload, seen_delta, wave)
        admitted.unpersist()
        cand.unpersist()
        _mark("filter_update")
        return WaveStats(wave, n_admitted, max(n_new, 0), n_frontier, phases)

    # -------------------------------------------------------------------- run

    def run(self, max_waves: int | None = None) -> list[WaveStats]:
        """Run (or resume) until the frontier drains or the wave cap hits."""
        self.bootstrap()
        cap = max_waves if max_waves is not None else self.cfg.max_waves
        stats: list[WaveStats] = []
        while True:
            manifest = self.store.latest()
            wave = manifest["next_wave"]
            if wave >= cap:
                break
            n_frontier = manifest.get("frontier_count")
            if n_frontier is None:  # manifest from an older layout
                f = self.store.read_table(self.spark, "frontier")
                n_frontier = f.count() if f is not None else 0
            if n_frontier == 0:
                break
            s = self._run_wave(wave, manifest["seq_end"], n_frontier)
            stats.append(s)
            if s.admitted == 0:
                break
        return stats

    # ---------------------------------------------------------------- readers
    # Absent tables (a bootstrap-only store, or a corpus whose seeds were
    # all robots-blocked) read as typed EMPTY DataFrames, never None — the
    # golden comparison against the simulator's empty log must still work.

    def crawl_log(self) -> DataFrame:
        df = self.store.read_table(self.spark, "crawl_log")
        if df is None:
            return self.spark.createDataFrame(
                [],
                "seq long, wave int, canonical_url string, host string, "
                "vt long, priority int",
            )
        return df.orderBy("seq")

    def url_seen(self) -> DataFrame:
        """Public reader: url_hash is ALWAYS the lowercase sha256 hex here
        regardless of the internal carry encoding (golden comparisons and
        downstream consumers key on the hex form)."""
        df = self.store.read_table(self.spark, "url_seen")
        if df is None:
            return self.spark.createDataFrame(
                [], "url_hash string, canonical_url string, wave int"
            )
        if isinstance(df.schema["url_hash"].dataType, BinaryType):
            df = df.withColumn("url_hash", F.lower(F.hex("url_hash")))
        return df

    def metrics(self) -> DataFrame:
        df = self.store.read_table(self.spark, "metrics")
        if df is None:
            return self.spark.createDataFrame(
                [], "wave int, metric string, key string, value long"
            )
        return df
