"""Streaming URL-seen dedup: a key seen in ANY earlier micro-batch must
never re-emit (state-store persistence across batches), in both the
unbounded and the watermark-bounded forms."""

import pytest
from pyspark.sql import functions as F


def _run(stream_df, out, ckpt):
    q = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _write_batches(spark, src):
    """Two parquet files (one micro-batch each via maxFilesPerTrigger=1)
    with duplicates WITHIN and ACROSS the files."""
    import os

    b1 = [(f"h{i % 8:016x}", f"https://a.example/p/{i % 8}", "2024-01-01 00:00:05")
          for i in range(16)]  # 8 distinct, each twice
    b2 = [(f"h{i % 12:016x}", f"https://a.example/p/{i % 12}", "2024-01-01 00:00:06")
          for i in range(12)]  # 8 overlap batch 1, 4 new
    schema = "url_hash string, canonical_url string, ts_s string"
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(os.path.join(src, "f1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(os.path.join(src, "f2"))


@pytest.mark.parametrize("within", [None, "7 days"])
def test_first_seen_exactly_once_across_batches(spark, tmp_path, within):
    from warc_bench_spark.streaming.dedup import first_seen_urls_stream

    src, out, ckpt = (str(tmp_path / d) for d in ("src", f"out_{bool(within)}", f"ckpt_{bool(within)}"))
    _write_batches(spark, src)

    stream = (
        spark.readStream.schema("url_hash string, canonical_url string, ts_s string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", True)
        .parquet(src)
        .withColumn("event_time", F.col("ts_s").cast("timestamp"))
    )
    deduped = first_seen_urls_stream(
        stream, key="url_hash", event_time="event_time", within=within
    )
    _run(deduped.select("url_hash", "canonical_url"), out, ckpt)

    got = [r["url_hash"] for r in spark.read.parquet(out).collect()]
    assert sorted(got) == sorted(set(got)), "a key emitted more than once"
    assert set(got) == {f"h{i:016x}" for i in range(12)}  # every key once


def test_within_watermark_requires_event_time(spark):
    from warc_bench_spark.streaming.dedup import first_seen_urls_stream

    df = spark.createDataFrame([], "url_hash string")
    with pytest.raises(ValueError):
        first_seen_urls_stream(df, within="1 hour")
