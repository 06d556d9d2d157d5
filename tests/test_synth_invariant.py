"""Span-sequence equality invariant (the per-row invariant of the
input_hint): (kind, text, media_ref, order) per doc_id must survive a
write/read/explode/reconstruct round trip — the golden-sequence comparison
shape of webreplay-standalone/copy/evaluate/compare.ts:11-80."""

import pytest

from warc_bench_spark.config import CrawlConfig
from warc_bench_spark.operators.extract import explode_spans, reconstruct_documents
from warc_bench_spark.synth import documents_df, generate_corpus


CFG = CrawlConfig(seed=7, n_urls=300, n_hosts=10, n_seeds=10)


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(CFG)


def test_generator_deterministic(corpus):
    again = generate_corpus(CFG)
    assert corpus.documents == again.documents
    assert corpus.seeds == again.seeds
    assert corpus.robots == again.robots


def test_span_sequence_roundtrip(spark, corpus, tmp_path):
    df = documents_df(spark, corpus)
    path = str(tmp_path / "docs")
    df.write.parquet(path)
    back = spark.read.parquet(path)

    rebuilt = reconstruct_documents(explode_spans(back))
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in rebuilt.collect()
    }
    assert got == corpus.documents  # exact (kind, text, media_ref, order) per doc_id


def test_offsets_dense_and_ordered(corpus):
    for doc_id, spans in corpus.documents.items():
        assert [s[3] for s in spans] == list(range(len(spans)))
