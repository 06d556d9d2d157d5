"""Cuckoo-filter URL-seen prefilter — the 'cuckoo' half of the north star's
"partitioned Bloom/cuckoo URL-seen set held as broadcast shards".

Same exactness discipline as the Bloom shards (operators/dedup.py): the
filter is only ever a prefilter; candidates it flags go through the exact
anti-join; candidates it clears are provably unseen. A cuckoo filter's
guarantee is the same as Bloom's (no false negatives for successfully
inserted keys) with better space at low FP rates and support for deletion
(unused here — url_seen only grows). If an insertion fails (table too
full), the shard is marked SATURATED and probes in it return "maybe" for
everything — degrading to the exact join, never to a wrong answer.

Layout per shard: ``m`` buckets (power of two) × ``slots`` uint16
fingerprints (0 = empty). Key derivations reuse the sha256 hex the engine
already carries:

    fp  = 1 + (int(hex[15:30], 16) % 65535)          # nonzero 16-bit
    i1  = int(hex[:15], 16) & (m - 1)
    i2  = i1 XOR (fp * 0x5bd1e995) & (m - 1)          # partial-key cuckoo

Build is DISTRIBUTED, mirroring the Bloom pattern: keys group by
``hash64 % n_shards`` and each shard's table is built (or incrementally
extended) inside one ``applyInPandas`` task against a broadcast copy of the
existing shard; only the finished ~1 MB tables return to the driver. The
seen table itself never materializes on the driver — at the 10^10-URL
design point that was the round-1 defect in this module. Table layout may
vary with within-shard insertion order (Spark does not fix group row
order), but membership semantics never do.

``CuckooStore`` persists the shard set next to the snapshots with the SAME
wave-stamp discipline as ``BloomStore`` — and the same safety-critical
caveat: a stale shard set yields false negatives which bypass the exact
anti-join, so the caller (``crawl.py``) must rebuild whenever
``stamp < wave - 1``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from ..config import CrawlConfig
from .dedup import hash64_expr, hex_slices_u64, is_binary_key, not_seen_exact

SLOTS = 4
MAX_KICKS = 500
MIX = 0x5BD1E995
DEFAULT_M_BUCKETS = 1 << 17

# payload: shard id -> (m x SLOTS uint16 table, saturated flag)
Payload = dict[int, tuple[np.ndarray, bool]]


def _parts(
    keys: pd.Series, binary: bool | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """(bucket hash, nonzero 16-bit fingerprint) — vectorized decode of
    either key encoding; ``binary`` is the schema-derived flag
    (dedup.is_binary_key), threaded so the dispatch is structural."""
    h1u, h2u = hex_slices_u64(keys, binary)
    return h1u.astype(np.int64), (h2u % np.uint64(65535)).astype(np.int64) + 1


def _alt(i: np.ndarray, fp: np.ndarray, mask: int) -> np.ndarray:
    return (i ^ (fp * MIX)) & mask


class CuckooShard:
    def __init__(self, m_buckets: int, table: np.ndarray | None = None, saturated: bool = False):
        assert m_buckets & (m_buckets - 1) == 0, "m must be a power of two"
        self.m = m_buckets
        self.table = table if table is not None else np.zeros((m_buckets, SLOTS), dtype=np.uint16)
        self.saturated = saturated

    def insert_many(self, h1: np.ndarray, fp: np.ndarray) -> None:
        if self.saturated:
            return
        mask = self.m - 1
        rng = np.random.default_rng(12345)  # deterministic kick choice
        for a, b, f in zip(h1 & mask, _alt(h1 & mask, fp, mask), fp):
            f = np.uint16(f)
            placed = False
            for bucket in (a, b):
                row = self.table[bucket]
                empt = np.flatnonzero(row == 0)
                if empt.size:
                    row[empt[0]] = f
                    placed = True
                    break
            if placed:
                continue
            cur, cf = int(a), f
            for _ in range(MAX_KICKS):
                slot = int(rng.integers(0, SLOTS))
                cf, self.table[cur, slot] = self.table[cur, slot], cf
                cur = int(_alt(np.array([cur]), np.array([int(cf)]), mask)[0])
                row = self.table[cur]
                empt = np.flatnonzero(row == 0)
                if empt.size:
                    row[empt[0]] = cf
                    break
            else:
                self.saturated = True  # degrade: everything is "maybe"
                return

    def contains_many(self, h1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        if self.saturated:
            return np.ones(len(h1), dtype=bool)
        mask = self.m - 1
        i1 = h1 & mask
        i2 = _alt(i1, fp, mask)
        f = fp.astype(np.uint16)
        hit = np.zeros(len(h1), dtype=bool)
        for s in range(SLOTS):
            hit |= self.table[i1, s] == f
            hit |= self.table[i2, s] == f
        return hit


def _shard_col(df: DataFrame, n_shards: int):
    # same sharding as the Bloom shards: int(hex[:15], 16) % n_shards —
    # hash64_expr derives the identical value from either key encoding,
    # so persisted shard sets survive a hex<->binary switch
    return (hash64_expr(df) % n_shards).cast("int")


def insert_distributed(
    spark: SparkSession,
    df: DataFrame,
    cfg: CrawlConfig,
    m_buckets: int = DEFAULT_M_BUCKETS,
    existing: Payload | None = None,
) -> Payload:
    """Insert ``df.url_hash`` into (a copy of) the shard set, per-shard on
    executors; returns the merged payload. Untouched shards pass through."""
    n_shards = cfg.bloom_shards
    binary = is_binary_key(df)  # plan-time fact, fixed into the closure
    bexist = spark.sparkContext.broadcast(
        {s: (t.tobytes(), sat) for s, (t, sat) in (existing or {}).items()}
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["_shard"].iloc[0])
        prior = bexist.value.get(sid)
        table = (
            np.frombuffer(prior[0], dtype=np.uint16).reshape(m_buckets, SLOTS).copy()
            if prior
            else None
        )
        sh = CuckooShard(m_buckets, table=table, saturated=bool(prior[1]) if prior else False)
        h1, fp = _parts(pdf["url_hash"], binary)
        sh.insert_many(h1, fp)
        return pd.DataFrame(
            {"shard": [sid], "table": [sh.table.tobytes()], "saturated": [sh.saturated]}
        )

    keyed = df.select("url_hash")
    rows = (
        keyed.withColumn("_shard", _shard_col(keyed, n_shards))
        .groupBy("_shard")
        .applyInPandas(build, "shard int, table binary, saturated boolean")
        .collect()
    )
    merged: Payload = dict(existing or {})
    for r in rows:
        merged[r["shard"]] = (
            np.frombuffer(r["table"], dtype=np.uint16).reshape(m_buckets, SLOTS),
            bool(r["saturated"]),
        )
    return merged


class CuckooShards:
    """n_shards CuckooShard keyed by hash64 % n_shards (broadcastable)."""

    def __init__(
        self,
        cfg: CrawlConfig,
        m_buckets: int = DEFAULT_M_BUCKETS,
        payload: Payload | None = None,
    ):
        self.cfg = cfg
        self.m = m_buckets
        self.payload: Payload = payload or {}

    def insert_df(self, spark: SparkSession, seen: DataFrame) -> "CuckooShards":
        """Distributed insert of a DataFrame's url_hash column."""
        self.payload = insert_distributed(
            spark, seen, self.cfg, self.m, existing=self.payload
        )
        return self

    def maybe_udf(self, spark: SparkSession, binary: bool = False):
        """``binary`` is the probed column's schema-derived encoding."""
        payload = {s: (t.copy(), sat) for s, (t, sat) in self.payload.items()}
        n_shards = self.cfg.bloom_shards
        m = self.m
        b = spark.sparkContext.broadcast(payload)

        @pandas_udf(BooleanType())
        def maybe_seen(hexes: pd.Series) -> pd.Series:
            local = b.value
            h1, fp = _parts(hexes, binary)
            sid = h1 % n_shards
            out = np.zeros(len(hexes), dtype=bool)
            for s in np.unique(sid):
                sel = sid == s
                entry = local.get(int(s))
                if entry is None:
                    continue  # empty shard -> definitely unseen
                table, saturated = entry
                shard = CuckooShard(m, table=table, saturated=saturated)
                out[sel] = shard.contains_many(h1[sel], fp[sel])
            return pd.Series(out)

        return maybe_seen


class CuckooStore:
    """Incremental persisted cuckoo shard set (BloomStore twin).

    Same crash-safety contract: files are wave-stamped; a stale set causes
    false NEGATIVES, so the caller must rebuild when ``stamp < wave - 1``
    (see BloomStore's docstring for why this gate is load-bearing)."""

    def __init__(self, root: str, cfg: CrawlConfig, m_buckets: int = DEFAULT_M_BUCKETS):
        import os

        self.dir = os.path.join(root, "_cuckoo")
        os.makedirs(self.dir, exist_ok=True)
        self.cfg = cfg
        self.m = m_buckets

    def _path(self, wave: int) -> str:
        import os

        return os.path.join(self.dir, f"shards_{wave:06d}.npz")

    def load(self, up_to_wave: int) -> tuple[Payload, int]:
        import os

        best = -1
        for name in os.listdir(self.dir):
            if name.startswith("shards_") and name.endswith(".npz") and ".tmp" not in name:
                w = int(name[7:13])
                if w <= up_to_wave and w > best:
                    best = w
        if best < 0:
            return {}, -1
        try:
            data = np.load(self._path(best))
            sat = set(int(x) for x in data["_sat"])
            payload = {
                int(k[1:]): (data[k].reshape(self.m, SLOTS), int(k[1:]) in sat)
                for k in data.files
                if k.startswith("t")
            }
            return payload, best
        except Exception:
            return {}, -1  # torn write -> caller's stamp gate rebuilds

    def save(self, payload: Payload, wave: int) -> None:
        import os

        tmp = self._path(wave) + ".tmp.npz"
        arrays = {f"t{sid}": t for sid, (t, _sat) in payload.items()}
        arrays["_sat"] = np.array(
            [sid for sid, (_t, sat) in payload.items() if sat], dtype=np.int64
        )
        np.savez(tmp.removesuffix(".npz"), **arrays)
        os.rename(tmp, self._path(wave))

    def update(
        self, spark: SparkSession, payload: Payload, delta: DataFrame, wave: int
    ) -> Payload:
        """Insert the wave's seen delta (distributed) and persist."""
        merged = insert_distributed(spark, delta, self.cfg, self.m, existing=payload)
        self.save(merged, wave)
        return merged


def not_seen_cuckoo(
    spark: SparkSession,
    candidates: DataFrame,
    seen: DataFrame,
    filt: CuckooShards,
) -> DataFrame:
    """Cuckoo prefilter + exact anti-join for the flagged residue."""
    maybe = filt.maybe_udf(spark, binary=is_binary_key(candidates))
    flagged = candidates.withColumn("_maybe", maybe(F.col("url_hash")))
    fresh = flagged.filter(~F.col("_maybe")).drop("_maybe")
    residue = not_seen_exact(flagged.filter(F.col("_maybe")).drop("_maybe"), seen)
    return fresh.unionByName(residue)
