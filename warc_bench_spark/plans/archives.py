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
    done = os.path.join(out, "_done")
    if os.path.exists(done):
        return out
    rows = (
        t(spark, sf_dir, "documents")
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
    with open(done, "w") as f:
        f.write("ok")
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
