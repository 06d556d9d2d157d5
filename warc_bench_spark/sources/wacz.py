"""WACZ / WARC byte ingestion (SURVEY.md §2 S8 + S9, the bytes path).

Round-1 modeled web archives with the relational spans tables; this module
reads the actual container format the reference consumes
(``/root/reference/src/orby/subtask_benchmark/webreplay-standalone/src/libs/
warc/wacz.ts:17-39`` zip member + gunzip, ``:40-52`` datapackage.json,
``:54-66`` pages/pages.jsonl) and rebuilds the request↔response index of
``warc-record.ts:21-120`` ``createWarcIndex``:

1. responses pair to requests via ``WARC-Concurrent-To`` == the request's
   ``WARC-Record-ID``;
2. responses WITHOUT that header fall back to an unmatched request with the
   same ``WARC-Target-URI``;
3. ``revisit`` records resolve their payload by ``WARC-Payload-Digest``
   from any response that carried the bytes;
4. exchanges group by the *normalized* URL (our C1 canonicalizer — the
   reference calls its ``normalizeUrl`` at warc-record.ts:96).

Spark shape: ``spark.read.format('binaryFile')`` gives one row per archive
(S10 listing semantics included), and a ``mapInPandas`` stage unzips +
gunzips + WARC-parses each archive *inside the executor* — archives never
touch the driver, the fan-out unit is one archive per task, and downstream
pairing/grouping is ordinary joins. The WARC parser itself is written from
scratch against the public WARC/1.1 format (ISO 28500): header block, CRLF
CRLF, Content-Length payload bytes, CRLF CRLF.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import json
import os
import zipfile
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

WARC_MEMBER = "archive/data.warc.gz"
PAGES_MEMBER = "pages/pages.jsonl"
METADATA_MEMBER = "datapackage.json"

RECORDS_SCHEMA = (
    "archive string, kind string, record_id string, concurrent_to string, "
    "target_uri string, payload binary, payload_digest string"
)
PAGES_SCHEMA = "archive string, line_no int, url string, title string"


# ---------------------------------------------------------------------------
# WARC bytes <-> records (pure functions, executor-side)
# ---------------------------------------------------------------------------

def _sha256_digest_header(payload: bytes) -> str:
    return "sha-256:" + hashlib.sha256(payload).hexdigest()


def strip_digest_algorithm(digest: str) -> str:
    """``excludeAlgorithm`` analog (warc-record.ts): keep the hex only."""
    return digest.split(":", 1)[1] if ":" in digest else digest


def build_warc_record(headers: dict[str, str], payload: bytes) -> bytes:
    head = "WARC/1.1\r\n" + "".join(f"{k}: {v}\r\n" for k, v in headers.items())
    head += f"Content-Length: {len(payload)}\r\n\r\n"
    return head.encode("utf-8") + payload + b"\r\n\r\n"


def parse_warc(buf: bytes) -> Iterator[dict]:
    """From-scratch WARC/1.1 reader: yields header dict + payload per record."""
    pos, n = 0, len(buf)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and buf[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = buf.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        head = buf[pos:head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}: {lines[0]!r}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        length = int(headers.get("Content-Length", "0"))
        body_start = head_end + 4
        payload = buf[body_start : body_start + length]
        pos = body_start + length
        yield {"headers": headers, "payload": payload}


# ---------------------------------------------------------------------------
# Fixture writer (tests / deterministic oracle inputs)
# ---------------------------------------------------------------------------

def write_wacz(
    path: str,
    exchanges: list[dict],
    pages: list[dict] | None = None,
    metadata: dict | None = None,
) -> None:
    """Write a .wacz archive with the member layout the reference reads.

    ``exchanges``: dicts with keys ``url``, ``payload`` (bytes) and optional
    ``record_id``, ``drop_concurrent_to`` (exercise the URI fallback),
    ``revisit_of`` (a prior exchange's url whose payload digest this revisit
    points at — exercises step 3).
    """
    warc = io.BytesIO()
    digests: dict[str, str] = {}
    for i, ex in enumerate(exchanges):
        rid = ex.get("record_id", f"<urn:uuid:req-{i:04d}>")
        url = ex["url"]
        req_payload = f"GET {url} HTTP/1.1\r\nHost: x\r\n\r\n".encode()
        warc.write(
            build_warc_record(
                {
                    "WARC-Type": "request",
                    "WARC-Record-ID": rid,
                    "WARC-Target-URI": url,
                    "Content-Type": "application/http;msgtype=request",
                },
                req_payload,
            )
        )
        if ex.get("revisit_of") is not None:
            digest = digests[ex["revisit_of"]]
            headers = {
                "WARC-Type": "revisit",
                "WARC-Record-ID": f"<urn:uuid:rev-{i:04d}>",
                "WARC-Target-URI": url,
                "WARC-Payload-Digest": digest,
            }
            if not ex.get("drop_concurrent_to"):
                headers["WARC-Concurrent-To"] = rid
            warc.write(build_warc_record(headers, b""))
        else:
            payload = ex["payload"]
            digest = _sha256_digest_header(payload)
            digests[url] = digest
            body = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
            )
            headers = {
                "WARC-Type": "response",
                "WARC-Record-ID": f"<urn:uuid:resp-{i:04d}>",
                "WARC-Target-URI": url,
                "WARC-Payload-Digest": digest,
                "Content-Type": "application/http;msgtype=response",
            }
            if not ex.get("drop_concurrent_to"):
                headers["WARC-Concurrent-To"] = rid
            warc.write(build_warc_record(headers, body))

    page_rows = pages if pages is not None else [
        {"url": ex["url"], "title": f"page {i}"} for i, ex in enumerate(exchanges)
    ]
    pages_lines = json.dumps(
        {"format": "json-pages-1.0", "id": "pages", "title": "All Pages"}
    ) + "\n"
    for p in page_rows:
        # wacz.ts:54-66 reads lines[1]['startUrl'] — carry both spellings
        pages_lines += json.dumps({"startUrl": p["url"], **p}) + "\n"

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as z:
        z.writestr(WARC_MEMBER, gzip.compress(warc.getvalue(), mtime=0))
        z.writestr(PAGES_MEMBER, pages_lines)
        z.writestr(
            METADATA_MEMBER,
            json.dumps(metadata or {"mainPageUrl": exchanges[0]["url"] if exchanges else None}),
        )


# ---------------------------------------------------------------------------
# Spark scans
# ---------------------------------------------------------------------------

def _records_from_archives(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {
            k: [] for k in (
                "archive", "kind", "record_id", "concurrent_to",
                "target_uri", "payload", "payload_digest",
            )
        }
        for path, content in zip(pdf["path"], pdf["content"]):
            with zipfile.ZipFile(io.BytesIO(content)) as z:
                warc_bytes = gzip.decompress(z.read(WARC_MEMBER))
            for rec in parse_warc(warc_bytes):
                h = rec["headers"]
                kind = h.get("WARC-Type", "")
                if kind == "warcinfo":
                    continue
                payload = rec["payload"]
                if kind in ("response", "revisit") and b"\r\n\r\n" in payload:
                    payload = payload.split(b"\r\n\r\n", 1)[1]  # strip HTTP head
                out["archive"].append(os.path.basename(path))
                out["kind"].append(kind)
                out["record_id"].append(h.get("WARC-Record-ID"))
                out["concurrent_to"].append(h.get("WARC-Concurrent-To"))
                out["target_uri"].append(h.get("WARC-Target-URI"))
                out["payload"].append(bytes(payload))
                out["payload_digest"].append(h.get("WARC-Payload-Digest"))
        yield pd.DataFrame(out)


def scan_wacz_records(spark: SparkSession, path_glob: str) -> DataFrame:
    """One row per WARC record across all matched .wacz archives (S8)."""
    raw = spark.read.format("binaryFile").load(path_glob)
    return raw.select("path", "content").mapInPandas(
        _records_from_archives, RECORDS_SCHEMA
    )


def _pages_from_archives(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: dict[str, list] = {"archive": [], "line_no": [], "url": [], "title": []}
        for path, content in zip(pdf["path"], pdf["content"]):
            with zipfile.ZipFile(io.BytesIO(content)) as z:
                lines = z.read(PAGES_MEMBER).decode("utf-8").splitlines()
            # line 0 is the jsonl header; pages start at line 1 (wacz.ts:62)
            for i, line in enumerate(lines[1:], start=1):
                if not line.strip():
                    continue
                obj = json.loads(line)
                rows["archive"].append(os.path.basename(path))
                rows["line_no"].append(i)
                rows["url"].append(obj.get("startUrl") or obj.get("url"))
                rows["title"].append(obj.get("title"))
        yield pd.DataFrame(rows)


def scan_wacz_pages(spark: SparkSession, path_glob: str) -> DataFrame:
    """pages/pages.jsonl rows per archive (S9, wacz.ts:54-66)."""
    raw = spark.read.format("binaryFile").load(path_glob)
    return raw.select("path", "content").mapInPandas(
        _pages_from_archives, PAGES_SCHEMA
    )


def scan_wacz_metadata(spark: SparkSession, path_glob: str) -> DataFrame:
    """datapackage.json per archive (wacz.ts:40-52) — tiny, JVM json parse."""
    raw = spark.read.format("binaryFile").load(path_glob)

    def _meta(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"archive": [], "metadata_json": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(content)) as z:
                    rows["archive"].append(os.path.basename(path))
                    rows["metadata_json"].append(z.read(METADATA_MEMBER).decode("utf-8"))
            yield pd.DataFrame(rows)

    return raw.select("path", "content").mapInPandas(
        _meta, "archive string, metadata_json string"
    )


def warc_request_index(records: DataFrame) -> DataFrame:
    """Pair requests with responses and group by normalized URL
    (createWarcIndex steps 1-4, see module docstring).

    Returns one row per exchange:
    (archive, normalized_url, target_uri, request_id, payload,
    payload_digest_hex).
    """
    from ..functions.urls import canonicalize_udf

    req = records.filter(F.col("kind") == "request").select(
        "archive",
        F.col("record_id").alias("request_id"),
        F.col("target_uri").alias("req_uri"),
    )
    resp = records.filter(F.col("kind").isin("response", "revisit")).select(
        F.col("archive").alias("r_archive"),
        "kind",
        "record_id",
        "concurrent_to",
        "target_uri",
        "payload",
        "payload_digest",
    )

    # step 1: direct pairing on WARC-Concurrent-To
    direct = (
        resp.filter(F.col("concurrent_to").isNotNull())
        .join(
            req,
            (F.col("r_archive") == F.col("archive"))
            & (F.col("concurrent_to") == F.col("request_id")),
        )
        .select("archive", "request_id", "req_uri", "kind", "payload", "payload_digest")
    )

    # step 2: orphans match an unmatched request with the same target URI,
    # deterministically (k-th orphan of a URI pairs with its k-th unmatched
    # request, ordered by record id on both sides)
    matched_ids = direct.select("archive", "request_id")
    unmatched_req = req.join(matched_ids, ["archive", "request_id"], "left_anti")
    orphans = resp.filter(F.col("concurrent_to").isNull())
    w_req = Window.partitionBy("archive", "req_uri").orderBy("request_id")
    w_orp = Window.partitionBy("r_archive", "target_uri").orderBy("record_id")
    fallback = (
        unmatched_req.withColumn("_k", F.row_number().over(w_req))
        .join(
            orphans.withColumn("_j", F.row_number().over(w_orp)),
            (F.col("archive") == F.col("r_archive"))
            & (F.col("req_uri") == F.col("target_uri"))
            & (F.col("_k") == F.col("_j")),
        )
        .select("archive", "request_id", "req_uri", "kind", "payload", "payload_digest")
    )

    paired = direct.unionByName(fallback)

    # step 3: revisits borrow the payload bytes of the response that carried
    # the same digest (possibly under a different URL — warc-record.ts:104)
    digest_hex = F.split(F.col("payload_digest"), ":").getItem(1)
    payloads = (
        paired.filter(F.col("kind") == "response")
        .select(
            "archive",
            digest_hex.alias("digest_hex"),
            F.col("payload").alias("cached_payload"),
        )
        .dropDuplicates(["archive", "digest_hex"])
    )
    resolved = (
        paired.withColumn("digest_hex", digest_hex)
        .join(payloads, ["archive", "digest_hex"], "left")
        .withColumn(
            "payload",
            F.when(F.col("kind") == "revisit", F.col("cached_payload")).otherwise(
                F.col("payload")
            ),
        )
    )

    # step 4: group key = normalized URL (C1 canonicalizer)
    return resolved.select(
        "archive",
        canonicalize_udf(F.col("req_uri")).alias("normalized_url"),
        F.col("req_uri").alias("target_uri"),
        "request_id",
        "payload",
        F.col("digest_hex").alias("payload_digest_hex"),
    )


def stream_wacz_records(spark: SparkSession, path_glob: str) -> DataFrame:
    """Streaming form of ``scan_wacz_records`` (§2.13): new .wacz archives
    landing in a directory become WARC record rows incrementally.

    ``binaryFile`` is a file streaming source (fixed schema), so the same
    mapInPandas parse stage runs per micro-batch; with
    ``trigger(availableNow=True)`` this drains a backlog exactly once —
    verified equal to the batch scan in tests/test_wacz.py.
    """
    raw = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .load(path_glob)
    )
    return raw.select("path", "content").mapInPandas(
        _records_from_archives, RECORDS_SCHEMA
    )
