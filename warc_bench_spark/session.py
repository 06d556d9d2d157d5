"""SparkSession factory.

Local sessions are tuned for the sandbox (single JVM, ``local[N]``), but the
configuration is the one we would ship on a real cluster: AQE on (runtime
coalesce + skew-join splitting), Arrow on (every pandas UDF crosses the
JVM/Python boundary in columnar batches, never per row).

Iceberg note (SURVEY.md §7.0): the sandbox has no Iceberg runtime jar and no
network to fetch one, so table state uses the snapshot-manifest layer in
``state.py`` which implements the same contract (atomic multi-table wave
commits, resume from the latest committed snapshot). On a real cluster set
``SPARK_GRAFT_ICEBERG=1`` after adding
``org.apache.iceberg:iceberg-spark-runtime-*`` to ``spark.jars.packages``;
``state.py`` documents the 1:1 mapping.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _package_zip() -> str:
    """Zip warc_bench_spark for worker shipment — the local analog of
    ``spark-submit --py-files`` (the north rule's deployment mode). Python
    workers deserialize our pandas UDFs and must import this package."""
    out = os.path.join(tempfile.gettempdir(), "warc_bench_spark_pyfiles.zip")
    pkg = os.path.join(_PKG_ROOT, "warc_bench_spark")
    with zipfile.ZipFile(out, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, _PKG_ROOT))
    return out


def get_spark(
    app_name: str = "warc-bench-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    max_partition_bytes: int | None = None,
) -> SparkSession:
    """``max_partition_bytes`` sizes scan splits; locally our parquet inputs
    are tiny, so the default 128MB would bin-pack a whole table into 1-2
    scan tasks and serialize the map stage — benchmarks pass a small value
    so scan parallelism matches core count (on a real cluster the data
    volume does this naturally)."""
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # r8: 16g (was 8g). At 5x the r7 driver measurement scale the query
        # suite OOMs a broadcast build in-suite under 8g: localCheckpoint
        # blocks + broadcasts from the preceding heavy queries transiently
        # fill the unified region faster than the 1-min periodic-GC cleaner
        # drains them, and the next broadcast build finds no headroom
        # (isolated, the same query fits comfortably). Heap is lazily
        # committed, so small runs pay nothing; kernel t2/t8/t32 A/B'd flat.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # r8: localCheckpoint blocks (reused intermediates in the heavy
        # query plans) are only released after a JVM GC lets the
        # ContextCleaner's weak references fire; the default periodic-GC
        # interval (30 min) lets blocks from earlier queries pile up in
        # the protected storage region of a long-lived session and
        # squeeze later queries' execution memory. One minute bounds the
        # accumulation at negligible GC cost.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "1min"),
        )
        # GC knob for kernel experiments (local mode = driver JVM only).
        # Measured on the 8M kernel: default G1 is the best of G1-tuned /
        # ParallelGC / ZGC — the knob stays for cluster-side tuning.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_GC_OPTS", ""),
        )
        .config("spark.ui.enabled", "false")
        # shuffle/cache block codec — kernel A/B knob (zstd trades CPU for
        # bytes, the t8-biased direction; accept/reject history in
        # BENCH/BASELINE.md)
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # off-heap columnar vectors for the parquet scan — kernel A/B knob
        # (candidate lever for the 8->32 DRAM/GC ceiling; accept/reject
        # history in BENCH/BASELINE.md)
        .config(
            "spark.sql.columnVector.offheap.enabled",
            os.environ.get("SPARK_GRAFT_OFFHEAP_CV", "false"),
        )
        # in-memory columnar cache compression for the persisted rank
        # input — second kernel A/B knob (accept/reject history in
        # BENCH/BASELINE.md)
        .config(
            "spark.sql.inMemoryColumnarStorage.compressed",
            os.environ.get("SPARK_GRAFT_CACHE_COMPRESS", "true"),
        )
    )
    if max_partition_bytes is None and os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES"):
        # r8 session default (env-tunable): local sf parquet is one file of
        # ~1M-row row groups, so the 128MB default bin-packs a whole table
        # into one scan task; a smaller split lets multi-row-group files
        # scan at row-group parallelism with NO added exchange. Callers
        # that pass an explicit value (kernel/wave benches) are unchanged,
        # and on a cluster the env is simply not set.
        max_partition_bytes = int(os.environ["SPARK_GRAFT_MAX_PARTITION_BYTES"])
    if max_partition_bytes is not None:
        builder = builder.config(
            "spark.sql.files.maxPartitionBytes", str(max_partition_bytes)
        ).config("spark.sql.files.openCostInBytes", str(max_partition_bytes // 4))
    spark = builder.getOrCreate()
    spark.sparkContext.addPyFile(_package_zip())
    return spark
