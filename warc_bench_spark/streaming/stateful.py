"""Streaming-native per-host politeness via applyInPandasWithState.

The batch engine converts the reference's live rate limiter
(``frequency_limiter.py:24-47``) into a deterministic virtual-time schedule
(``operators/politeness.py``). This module is the continuous-ingestion
variant SURVEY.md §2.13 sketches: a stream of discovered URLs, grouped by
host, where per-host mutable state (last granted slot, sliding-window
counts) lives in Spark's state store and each micro-batch assigns fetch
slots that respect the host's crawl delay and window cap across batches.

Unlike the batch path, a stream's arrival order is not reproducible, so the
guarantee here is the politeness *invariant* (slots per host are strictly
``delay``-separated and at most ``window_limit`` per ``window_ms``), not a
golden total order — tested in tests/test_streaming_stateful.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("slot_ms", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("next_free_ms", LongType()),
        StructField("granted", LongType()),
    ]
)


def politeness_slots_stream(
    urls_by_host,  # GroupedData of a streaming DF with (host, url) columns
    delay_ms: int = 1000,
    window_limit: int = 10,
    window_ms: int = 60_000,
) -> DataFrame:
    """Assign virtual fetch slots per host with cross-batch state."""

    def assign(
        key: tuple[str],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        if state.exists:
            next_free, granted = state.get
        else:
            next_free, granted = 0, 0
        outs: list[dict[str, Any]] = []
        for pdf in batches:
            # deterministic within-batch order: by url
            for url in sorted(pdf["url"]):
                slot = max(next_free, (granted // window_limit) * window_ms)
                outs.append({"host": host, "url": url, "slot_ms": slot})
                granted += 1
                next_free = slot + delay_ms
        state.update((next_free, granted))
        yield pd.DataFrame(outs, columns=["host", "url", "slot_ms"])

    return urls_by_host.applyInPandasWithState(
        assign,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
