"""Structured Streaming re-expression of the crawl's wave/metrics flow.

The reference has no streaming engine (SURVEY.md §2.13): its crawl proceeds
in batch waves. This module shows the streaming-native form for consumers
who want continuous frontier ingestion: a file-source stream of event rows,
event-time tumbling windows with a watermark for late data, and an
append-mode sink — the Structured Streaming idioms (readStream →
withWatermark → window agg → writeStream) the engine would use if the
frontier arrived as a feed rather than snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> None:
    """Run the file-source stream to completion (availableNow) and write
    closed windows to parquet. Late rows beyond the watermark are dropped —
    the standard late-data contract."""
    schema = spark.read.parquet(input_dir).schema
    stream = (
        spark.readStream.schema(schema)
        # one file per micro-batch: the watermark only advances between
        # micro-batches, so a single-batch read would emit no closed windows
        # in append mode
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_event_counts_batch(
    spark: SparkSession, input_dir: str, window: str = "1 hour"
) -> DataFrame:
    """The batch equivalent — used to verify the streaming output on the
    closed (pre-watermark) windows."""
    return (
        spark.read.parquet(input_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )
