"""WACZ/WARC byte ingestion (S8/S9): zip + gzip + WARC parse + req↔resp index.

Mirrors the pairing semantics of webreplay-standalone's createWarcIndex
(warc-record.ts:21-120): Concurrent-To pairing, same-URI fallback for
responses missing the header, revisit payload resolution by digest, and
grouping by the normalized URL.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from warc_bench_spark.sources.wacz import (
    parse_warc,
    scan_wacz_metadata,
    scan_wacz_pages,
    scan_wacz_records,
    warc_request_index,
    write_wacz,
)


@pytest.fixture(scope="module")
def wacz_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("wacz")
    p = str(root / "site.wacz")
    write_wacz(
        p,
        [
            {"url": "https://ex.com/a?timestamp=123", "payload": b"payload-A"},
            {"url": "https://ex.com/b", "payload": b"payload-B"},
            # response with no WARC-Concurrent-To -> same-URI fallback
            {
                "url": "https://ex.com/orphan",
                "payload": b"payload-O",
                "drop_concurrent_to": True,
            },
            # revisit: same bytes as /b under a different URL (spacer.gif case)
            {"url": "https://ex.com/b-again", "revisit_of": "https://ex.com/b"},
        ],
    )
    return p


def test_parse_warc_roundtrip(wacz_path):
    import gzip
    import io
    import zipfile

    with zipfile.ZipFile(wacz_path) as z:
        buf = gzip.decompress(z.read("archive/data.warc.gz"))
    recs = list(parse_warc(buf))
    kinds = [r["headers"]["WARC-Type"] for r in recs]
    assert kinds.count("request") == 4
    assert kinds.count("response") == 3
    assert kinds.count("revisit") == 1
    # payload bytes survive exactly (Content-Length framing)
    resp_a = next(
        r
        for r in recs
        if r["headers"]["WARC-Type"] == "response"
        and "a?" in r["headers"]["WARC-Target-URI"]
    )
    assert resp_a["payload"].endswith(b"payload-A")


def test_scan_records_and_pages(spark, wacz_path):
    recs = scan_wacz_records(spark, wacz_path)
    by_kind = {
        r["kind"]: r["n"]
        for r in recs.groupBy("kind").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_kind == {"request": 4, "response": 3, "revisit": 1}

    pages = scan_wacz_pages(spark, wacz_path).collect()
    assert [p["url"] for p in pages][0] == "https://ex.com/a?timestamp=123"
    assert len(pages) == 4

    meta = scan_wacz_metadata(spark, wacz_path).collect()
    assert "mainPageUrl" in meta[0]["metadata_json"]


def test_request_index_pairing(spark, wacz_path):
    idx = warc_request_index(scan_wacz_records(spark, wacz_path))
    rows = {r["target_uri"]: r for r in idx.collect()}
    assert len(rows) == 4  # every request paired, including the orphan case

    # direct pairing + payload bytes
    assert bytes(rows["https://ex.com/b"]["payload"]) == b"payload-B"
    # fallback pairing (response had no Concurrent-To)
    assert bytes(rows["https://ex.com/orphan"]["payload"]) == b"payload-O"
    # revisit resolved to the digest-matching response's bytes
    assert bytes(rows["https://ex.com/b-again"]["payload"]) == b"payload-B"
    assert (
        rows["https://ex.com/b-again"]["payload_digest_hex"]
        == hashlib.sha256(b"payload-B").hexdigest()
    )
    # normalization applied to the group key (volatile timestamp rewritten)
    assert (
        rows["https://ex.com/a?timestamp=123"]["normalized_url"]
        == "https://ex.com/a?timestamp=%7Btimestamp%7D"
    )


def test_stream_wacz_records_equals_batch(spark, tmp_path):
    """§2.13: archives landing in a directory stream into WARC record rows;
    an availableNow drain must equal the batch scan exactly."""
    from warc_bench_spark.sources.wacz import scan_wacz_records, stream_wacz_records

    d = str(tmp_path / "inbox")
    for i in range(3):
        write_wacz(
            f"{d}/s{i}.wacz",
            [{"url": f"https://st{i}.com/p?timestamp=1", "payload": f"sdata-{i}".encode()}],
        )
    stream = stream_wacz_records(spark, d)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("wacz_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["archive"], r["kind"], r["target_uri"], bytes(r["payload"]))
        for r in spark.sql("SELECT * FROM wacz_stream").collect()
    }
    want = {
        (r["archive"], r["kind"], r["target_uri"], bytes(r["payload"]))
        for r in scan_wacz_records(spark, f"{d}/*.wacz").collect()
    }
    assert got == want and len(want) == 6  # 3 requests + 3 responses


def test_index_from_many_archives(spark, tmp_path):
    for i in range(3):
        write_wacz(
            str(tmp_path / f"arch{i}.wacz"),
            [{"url": f"https://m{i}.com/p", "payload": f"data-{i}".encode()}],
        )
    idx = warc_request_index(scan_wacz_records(spark, str(tmp_path / "*.wacz")))
    got = {r["archive"]: bytes(r["payload"]) for r in idx.collect()}
    assert got == {f"arch{i}.wacz": f"data-{i}".encode() for i in range(3)}
