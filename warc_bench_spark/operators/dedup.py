"""URL-seen deduplication: Bloom-shard prefilter + exact anti-join.

The reference's URL-seen set is the S3 keyspace itself, probed with per-URL
HEAD requests (``/root/reference/src/orby/digitalagent/utils/s3_utils.py:
152-180``, used at ``parallel_computing_tasks.py:213-220``). That check is
**exact**, so ours must be too (SURVEY.md §7.4 item 4): the Bloom shards are
only ever a prefilter that lets the vast majority of genuinely-new URLs skip
the shuffle of the anti-join; the ``left_anti`` join against the ``url_seen``
table is always the authoritative answer for URLs the Bloom flags.

    new = candidates ⟕̸ url_seen            (exact, always correct)
        = candidates[¬bloom]  ∪  candidates[bloom] ⟕̸ url_seen

A Bloom false positive only costs one extra row through the anti-join; a
false negative is impossible by construction, so no unseen URL is ever
dropped and no seen URL ever re-admitted.

Shards are partitioned by ``hash64 % n_shards`` and broadcast as a dict of
numpy bitmaps; the probe is an Arrow-vectorized pandas UDF. Bit positions
use double hashing: pos_i = (h1 + i*h2) mod m with h1, h2 taken from
disjoint 60-bit slices of the sha256 digest — the same values whether the
key is carried as the hex string or the 32-byte binary form
(cfg.binary_url_hash), so shard files are encoding-independent and
deterministic across engine runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, BooleanType

from ..config import CrawlConfig


def is_binary_key(df: DataFrame, col: str = "url_hash") -> bool:
    """Schema-derived key-encoding flag (cfg.binary_url_hash's ground
    truth for a given frame). Thread THIS into the Arrow closures below —
    the encoding is a plan-time fact, and deciding it structurally keeps
    the safety-critical Bloom/cuckoo decode from ever mis-dispatching on
    a surprising element representation."""
    return isinstance(df.schema[col].dataType, BinaryType)


def hex_slices_u64(
    keys: pd.Series, binary: bool | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """(digest bits 0-59, bits 60-119) as uint64 — fully vectorized, for
    EITHER key encoding (the name predates the binary carry).

    Hex strings: ``(int(hex[:15], 16), int(hex[15:30], 16))`` — the
    per-element ``int(s, 16)`` this replaces was row-at-a-time Python
    inside the Arrow batch (the kernel's hottest inner loop). The hex
    strings become a byte matrix; digits decode with one arithmetic pass
    and fold column-wise (30 vector ops total, independent of row count).

    32-byte BINARY digests (cfg.binary_url_hash): the same two 60-bit
    values folded straight from the raw bytes — bits 0-63 >> 4 and
    bits 56-119 masked to the low 60 — so shard assignment and Bloom/
    cuckoo bit positions are IDENTICAL across encodings (persisted shard
    files survive an encoding switch; tests/test_binary_key.py pins it).
    Shared with the cuckoo filter (operators/cuckoo.py).

    ``binary``: pass the schema-derived flag (``is_binary_key``) from
    every engine call site — the encoding is a plan-time fact, and a
    structural flag can never mis-dispatch on an unexpected element
    representation. ``None`` (tests/ad-hoc only) sniffs the first
    element.
    """
    if binary is None:
        binary = bool(len(keys)) and isinstance(keys.iloc[0], (bytes, bytearray))
    if binary and len(keys):
        b = np.frombuffer(
            np.asarray(keys, dtype="S32").tobytes(), dtype=np.uint8
        ).reshape(-1, 32)
        h1 = np.zeros(len(b), dtype=np.uint64)
        h2 = np.zeros(len(b), dtype=np.uint64)
        for j in range(8):
            h1 = (h1 << np.uint64(8)) | b[:, j]
        for j in range(7, 15):
            h2 = (h2 << np.uint64(8)) | b[:, j]
        return h1 >> np.uint64(4), h2 & np.uint64((1 << 60) - 1)
    b = np.frombuffer(
        np.asarray(keys, dtype="S30").tobytes(), dtype=np.uint8
    ).reshape(-1, 30)
    d = np.where(b >= 97, b - 87, b - 48).astype(np.uint64)  # 'a'-'f' | '0'-'9'
    h1 = np.zeros(len(d), dtype=np.uint64)
    h2 = np.zeros(len(d), dtype=np.uint64)
    for j in range(15):
        h1 = (h1 << np.uint64(4)) | d[:, j]
        h2 = (h2 << np.uint64(4)) | d[:, j + 15]
    return h1, h2


def hash64_expr(df: DataFrame, col: str = "url_hash") -> Column:
    """JVM column for ``int(hex[:15], 16)`` under either key encoding.

    Used only on bounded build paths (shard assignment of a wave's seen
    delta), so the ``hex()`` round-trip for binary keys is off the hot
    path. ``conv`` parses uppercase hex (what ``F.hex`` emits) the same
    as lowercase.
    """
    c = F.col(col)
    if is_binary_key(df, col):
        c = F.hex(c)
    return F.conv(F.substring(c, 1, 15), 16, 10).cast("long")


def _hex_slices_u64(
    hexes: pd.Series, binary: bool | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Bloom variant: (h1, h2|1) — h2 forced odd for double hashing."""
    h1, h2 = hex_slices_u64(hexes, binary)
    return h1, h2 | np.uint64(1)


def not_seen_exact(candidates: DataFrame, seen: DataFrame) -> DataFrame:
    """The authoritative dedup: left anti join on url_hash (D1/S11).

    Strategy: SHUFFLE_HASH, not broadcast — at the 10^10-URL design point
    url_seen can never broadcast, and even locally the broadcast build is a
    serial driver-side constant that caps scaling. With both tables
    hash-partitioned on url_hash at write time (Iceberg bucketing on a real
    deployment) the exchange is co-partitioned; the Bloom shards
    (not_seen_bloom) are the broadcast-sized fast path.
    """
    return candidates.join(
        seen.select("url_hash").hint("SHUFFLE_HASH"), "url_hash", "left_anti"
    )


def build_bloom_shards(seen: DataFrame, cfg: CrawlConfig) -> dict[int, bytes]:
    """Aggregate url_seen into n_shards bitmap blobs (one groupBy pass)."""
    m = cfg.bloom_bits_per_shard
    k = cfg.bloom_hashes
    n_shards = cfg.bloom_shards
    binary = is_binary_key(seen)  # plan-time fact, fixed into the closure

    def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m // 8, dtype=np.uint8)
        h1, h2 = _hex_slices_u64(pdf["url_hash"], binary)
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
            np.bitwise_or.at(bits, (pos // 8).astype(np.int64), (1 << (pos % 8)).astype(np.uint8))
        return pd.DataFrame(
            {"shard": [int(pdf["_shard"].iloc[0])], "bitmap": [bits.tobytes()]}
        )

    keyed = seen.select("url_hash")
    sharded = keyed.withColumn(
        "_shard", (hash64_expr(keyed) % n_shards).cast("int")
    )
    rows = (
        sharded.groupBy("_shard")
        .applyInPandas(build_shard, "shard int, bitmap binary")
        .collect()
    )
    return {r["shard"]: r["bitmap"] for r in rows}


def bloom_maybe_udf(
    spark: SparkSession,
    shards: dict[int, bytes],
    cfg: CrawlConfig,
    binary: bool = False,
):
    """Vectorized membership probe against broadcast shards. ``binary`` is
    the probed column's schema-derived encoding (``is_binary_key``)."""
    m = cfg.bloom_bits_per_shard
    k = cfg.bloom_hashes
    n_shards = cfg.bloom_shards
    arrays = {s: np.frombuffer(b, dtype=np.uint8) for s, b in shards.items()}
    bshards = spark.sparkContext.broadcast(arrays)

    @pandas_udf(BooleanType())
    def maybe_seen(hexes: pd.Series) -> pd.Series:
        local = bshards.value
        h1, h2 = _hex_slices_u64(hexes, binary)
        shard_ids = (h1 % np.uint64(n_shards)).astype(np.int64)
        out = np.zeros(len(hexes), dtype=bool)
        for sid in np.unique(shard_ids):
            bits = local.get(int(sid))
            sel = shard_ids == sid
            if bits is None:
                continue  # empty shard -> definitely unseen
            ok = np.ones(sel.sum(), dtype=bool)
            hh1, hh2 = h1[sel], h2[sel]
            for i in range(k):
                pos = (hh1 + np.uint64(i) * hh2) % np.uint64(m)
                ok &= (bits[(pos // 8).astype(np.int64)] >> (pos % 8).astype(np.uint8)) & 1 == 1
            out[sel] = ok
        return pd.Series(out)

    return maybe_seen


def not_seen_bloom(
    spark: SparkSession,
    candidates: DataFrame,
    seen: DataFrame,
    cfg: CrawlConfig,
    shards: dict[int, bytes] | None = None,
) -> DataFrame:
    """Bloom prefilter + exact anti-join for the flagged residue.

    ``shards`` may be supplied from a persisted incremental store
    (``BloomStore``); otherwise they are rebuilt from the full seen table.
    """
    if shards is None:
        shards = build_bloom_shards(seen, cfg)
    if not shards:
        return candidates
    maybe = bloom_maybe_udf(spark, shards, cfg, binary=is_binary_key(candidates))
    flagged = candidates.withColumn("_maybe", maybe(F.col("url_hash")))
    fresh = flagged.filter(~F.col("_maybe")).drop("_maybe")
    residue = not_seen_exact(flagged.filter(F.col("_maybe")).drop("_maybe"), seen)
    return fresh.unionByName(residue)


class BloomStore:
    """Incremental sharded Bloom filter persisted alongside the snapshots.

    The seen set only ever grows, and Bloom bitmaps OR monotonically, so
    instead of rebuilding the shards from the full url_seen table every wave
    (a full-table aggregation), each wave ORs in the bitmap of its *delta*
    and writes the merged shards next to the snapshot manifest.

    Crash safety — read carefully, this is the safety-critical invariant: a
    stale (pre-crash) shard set produces false NEGATIVES, and in
    ``not_seen_bloom`` a false negative BYPASSES the exact anti-join — a
    seen URL would be re-admitted. Stale shards are therefore only safe
    because ``crawl.py`` checks the wave stamp before use and rebuilds from
    the full url_seen table whenever ``stamp < wave - 1`` (see
    ``CrawlEngine._run_wave`` step 1). Do not remove that stamp gate; the
    shards alone are NOT advisory. Files are stamped with the wave they
    cover; resume loads the newest stamp <= the committed wave.
    """

    def __init__(self, root: str, cfg: CrawlConfig):
        import os

        self.dir = os.path.join(root, "_bloom")
        os.makedirs(self.dir, exist_ok=True)
        self.cfg = cfg

    def _path(self, wave: int) -> str:
        import os

        return os.path.join(self.dir, f"shards_{wave:06d}.npz")

    def load(self, up_to_wave: int) -> tuple[dict[int, bytes], int]:
        """Newest shard set covering a wave <= up_to_wave; ({}, -1) if none."""
        import os

        best = -1
        for name in os.listdir(self.dir):
            # crash leftovers look like 'shards_000005.npz.tmp.npz' — they
            # must never be selected (a truncated npz would fail np.load)
            if name.startswith("shards_") and name.endswith(".npz") and ".tmp" not in name:
                w = int(name[7:13])
                if w <= up_to_wave and w > best:
                    best = w
        if best < 0:
            return {}, -1
        try:
            data = np.load(self._path(best))
            return {int(k): data[k].tobytes() for k in data.files}, best
        except Exception:
            # unreadable shard file (e.g. torn write): fall back to "no
            # shards" — the caller's stamp gate then rebuilds from the full
            # seen table, which is always correct
            return {}, -1

    def update(
        self, shards: dict[int, bytes], delta: DataFrame, wave: int
    ) -> dict[int, bytes]:
        """OR the delta's bitmaps into the shard set and persist atomically."""
        import os

        delta_shards = build_bloom_shards(delta, self.cfg)
        merged = dict(shards)
        for sid, blob in delta_shards.items():
            if sid in merged:
                merged[sid] = (
                    np.frombuffer(merged[sid], dtype=np.uint8)
                    | np.frombuffer(blob, dtype=np.uint8)
                ).tobytes()
            else:
                merged[sid] = blob
        tmp = self._path(wave) + ".tmp.npz"
        np.savez(
            tmp.removesuffix(".npz"),
            **{str(k): np.frombuffer(v, dtype=np.uint8) for k, v in merged.items()},
        )
        os.rename(tmp, self._path(wave))
        return merged
