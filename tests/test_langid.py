"""Trained Naive Bayes language ID (operators/langid.py, q68).

The q68 oracle proves Spark == DuckDB; these tests prove the model is
actually GOOD — cross-engine equality alone would also hold for a broken
classifier. Accuracy on the held-out fold must be ~perfect by profile
construction (strongly separated gram distributions, 120-char docs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from warc_bench_spark.operators.langid import (
    LANGS,
    PROFILES,
    synth_labeled_corpus,
    train_predict_langid,
)


def _ids(spark, n=420):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_profiles_well_formed():
    assert len(LANGS) == 5
    for lang in LANGS:
        assert len(PROFILES[lang]) == 64
    # shapes genuinely differ (the classifier has something to learn)
    assert len({p for p in PROFILES.values()}) == 5


def test_corpus_deterministic_and_balanced(spark):
    c = synth_labeled_corpus(_ids(spark), n_chars=40)
    rows = {r["doc_id"]: (r["lang"], r["text"]) for r in c.collect()}
    assert len(rows) == 420
    # lang = LANGS[doc_id % 5]; text length pinned
    for d in (0, 1, 7, 123):
        assert rows[d][0] == LANGS[d % 5]
        assert len(rows[d][1]) == 40
    # re-derivation is byte-identical (pure function of doc_id)
    again = {r["doc_id"]: (r["lang"], r["text"])
             for r in synth_labeled_corpus(_ids(spark), n_chars=40).collect()}
    assert rows == again


def test_heldout_accuracy_near_perfect(spark):
    corpus = synth_labeled_corpus(_ids(spark), n_chars=120)
    pred = train_predict_langid(corpus, n=2, test_mod=7)
    rows = pred.collect()
    # the held-out fold covers every language (7 coprime with 5)
    assert {r["true_lang"] for r in rows} == set(LANGS)
    acc = sum(r["is_correct"] for r in rows) / len(rows)
    assert acc >= 0.95, acc
    # one prediction per held-out doc, every held-out doc present
    assert sorted(r["doc_id"] for r in rows) == list(range(0, 420, 7))


def test_degenerate_test_mod_rejected(spark):
    """r6 ADVICE: test_mod sharing a factor with len(LANGS) holds entire
    languages out of training — must raise, not silently misclassify."""
    import pytest

    from warc_bench_spark.operators.langid import (
        LANGS,
        synth_labeled_corpus,
        train_predict_langid,
    )

    docs = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    corpus = synth_labeled_corpus(docs, "doc_id", n_chars=40)
    with pytest.raises(ValueError, match="factor"):
        train_predict_langid(corpus, test_mod=len(LANGS))
