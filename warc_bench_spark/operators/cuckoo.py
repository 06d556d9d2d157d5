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

Insertion is a bounded-kick loop (numpy state, per-delta volumes are small
— one politeness budget per wave); the probe is fully vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from ..config import CrawlConfig
from .dedup import not_seen_exact

SLOTS = 4
MAX_KICKS = 500
MIX = 0x5BD1E995


def _parts(hexes: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    h1 = hexes.str.slice(0, 15).apply(lambda s: int(s, 16)).to_numpy(dtype=np.int64)
    fp = (
        hexes.str.slice(15, 30).apply(lambda s: int(s, 16)).to_numpy(dtype=np.int64)
        % 65535
        + 1
    )
    return h1, fp


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


class CuckooShards:
    """n_shards CuckooShard keyed by hash64 % n_shards (broadcastable)."""

    def __init__(self, cfg: CrawlConfig, m_buckets: int = 1 << 17):
        self.cfg = cfg
        self.m = m_buckets
        self.shards: dict[int, CuckooShard] = {}

    def insert_df(self, seen: DataFrame) -> "CuckooShards":
        rows = seen.select("url_hash").toPandas()["url_hash"]
        if len(rows) == 0:
            return self
        h1, fp = _parts(rows)
        sid = h1 % self.cfg.bloom_shards
        for s in np.unique(sid):
            sel = sid == s
            self.shards.setdefault(int(s), CuckooShard(self.m)).insert_many(
                h1[sel], fp[sel]
            )
        return self

    def maybe_udf(self, spark: SparkSession):
        payload = {
            s: (sh.table.copy(), sh.saturated) for s, sh in self.shards.items()
        }
        n_shards = self.cfg.bloom_shards
        m = self.m
        b = spark.sparkContext.broadcast(payload)

        @pandas_udf(BooleanType())
        def maybe_seen(hexes: pd.Series) -> pd.Series:
            local = b.value
            h1, fp = _parts(hexes)
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


def not_seen_cuckoo(
    spark: SparkSession,
    candidates: DataFrame,
    seen: DataFrame,
    filt: CuckooShards,
) -> DataFrame:
    """Cuckoo prefilter + exact anti-join for the flagged residue."""
    maybe = filt.maybe_udf(spark)
    flagged = candidates.withColumn("_maybe", maybe(F.col("url_hash")))
    fresh = flagged.filter(~F.col("_maybe")).drop("_maybe")
    residue = not_seen_exact(flagged.filter(F.col("_maybe")).drop("_maybe"), seen)
    return fresh.unionByName(residue)
