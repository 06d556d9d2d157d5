#!/usr/bin/env python
"""Build an sf1.0-scale measurement PROXY from /root/testdata/sf0.1.

The driver's round-end bench may run at a driver-generated sf1.0 that is
not present on disk here (BENCH_r07.json: "sf": 1.0). For optimization
work we need a dataset of that scale to measure against. This script
replicates every sf0.1 table R times with per-replica id offsets chosen
so that every modulus the queries apply to an id column (2,3,4,5,7,9,16,
17,24,25,50,64,200,256) is preserved exactly — the offset M is a common
multiple of them all — so filters/selectivities keyed on id mod classes
keep their sf0.1 rates while cardinalities scale linearly, matching the
driver generator's observed pattern (fixed time span, 10x density and
10x id range per sf step).

Two columns get per-replica mutation so cross-replica rows do not create
artificial duplicate structure that the real sf1.0 would not have:
  * documents.text — a per-replica a-z letter permutation (length- and
    token-structure-preserving, but no k-gram survives across replicas,
    so ExactSubstr/near-dup workloads scale like real data);
  * embeddings.embedding — a circular shift of the 64 dims per replica
    (norms exact, cross-replica cosines decorrelated).

PROXY ONLY: used for perf measurement; correctness stays pinned to the
DuckDB oracle on the real /root/testdata sfs.

Usage: python tools/make_sf_proxy.py [out_dir] [replicas]
"""
from __future__ import annotations

import os
import random
import string
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
M = 6_854_400  # 2^8 * 3^2 * 5^2 * 7 * 17 — common multiple of every id modulus

ID_COLS = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
COPY_ONCE = ["nation", "region"]


def letter_perm(k: int) -> bytes:
    """Deterministic a-z permutation for replica k (k=0 = identity)."""
    letters = list(string.ascii_lowercase)
    if k:
        rng = random.Random(1000 + k)
        rng.shuffle(letters)
    table = bytearray(range(256))
    for i, ch in enumerate(letters):
        table[ord("a") + i] = ord(ch)
    return bytes(table)


def replicate(name: str, out_dir: str, replicas: int) -> None:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for k in range(replicas):
        cols = {}
        for field in t.schema.names:
            col = t[field]
            if field in ID_COLS.get(name, []):
                col = pc.add(col, pa.scalar(k * M, type=col.type))
            elif name == "documents" and field == "text" and k:
                perm = letter_perm(k)
                col = pa.array(
                    s.translate({i: chr(perm[i]) for i in range(97, 123)})
                    for s in col.to_pylist()
                )
            elif name == "embeddings" and field == "embedding" and k:
                shift = k % 64
                col = pa.array(
                    v[shift:] + v[:shift] for v in col.to_pylist()
                ).cast(col.type)
            cols[field] = col
        parts.append(pa.table(cols, schema=t.schema))
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/{name}.parquet")
    print(f"{name}: {t.num_rows} -> {t.num_rows * replicas}")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/sfproxy/sf1.0"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    for name in ID_COLS:
        replicate(name, out_dir, replicas)
    for name in COPY_ONCE:
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"), f"{out_dir}/{name}.parquet")
        print(f"{name}: copied")


if __name__ == "__main__":
    main()
