"""Span explosion + URL extraction (the document side of the crawl).

Documents are the ``input_hint`` schema:
``(doc_id, spans:array<struct<kind,text,media_ref,offset>>)`` — the Spark
form of the reference's ``TrajectoryData.actions`` ordered sequence with the
``LLMContent`` text/media oneof (``/root/reference/src/orby/protos/
trajectory_data.proto:10-34``, ``llm_data.proto:7-17``).

URL extraction is entirely JVM-side: ``explode`` the spans array, keep
``kind = 'text'`` cells, ``regexp_extract_all`` the URL tokens, explode
again. The ordering column ``offset`` rides along so downstream consumers
can reproduce span order (the per-row invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import extract_urls_col


def explode_spans(documents: DataFrame) -> DataFrame:
    """One row per span, ordering preserved via the offset column."""
    return documents.select(
        "doc_id",
        F.explode("spans").alias("span"),
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def extract_outlinks(docs_with_meta: DataFrame) -> DataFrame:
    """(doc_id, spans, priority, ...) -> (doc_id, priority, raw_url).

    `priority` (and any other parent metadata column present) is carried
    through so expansion can assign child priorities.
    """
    carry = [c for c in docs_with_meta.columns if c not in ("spans",)]
    spans = docs_with_meta.select(*carry, F.explode("spans").alias("span"))
    texts = spans.filter(
        (F.col("span.kind") == "text") & F.col("span.text").isNotNull()
    )
    return texts.select(
        *carry,
        F.explode(extract_urls_col(F.col("span.text"))).alias("raw_url"),
    )


def reconstruct_documents(spans_rows: DataFrame) -> DataFrame:
    """Inverse of explode_spans — re-nest spans in offset order.

    ``sort_array`` over (offset, struct) restores the reference's append
    order (``single_task_trajectory_collector.py:427-435``); used by the
    span-sequence-equality invariant test (compare.ts:11-80 analog).
    """
    nested = spans_rows.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
        ).alias("_ordered")
    )
    return nested.select(
        "doc_id",
        F.transform(
            "_ordered",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ).alias("spans"),
    )
