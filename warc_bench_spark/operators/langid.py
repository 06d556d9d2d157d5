"""Trained character-n-gram Naive Bayes language ID (the q29 upgrade).

q29 is the reference-shaped *heuristic* scorer (stopword/character-class
ratios). This module is the production shape: a multinomial Naive Bayes
over character bigrams, trained from scratch on a deterministic labeled
corpus — no external data, no pretrained weights, pure DataFrame algebra:

* **Corpus synthesis** (``synth_labeled_corpus``) — the q66
  by-construction oracle pattern: every (label, text) pair is derived
  from ``doc_id`` with BIGINT modular arithmetic and per-language
  64-slot frequency-profile strings, so DuckDB re-derives the identical
  corpus from the identical parquet column and the oracle can value-check
  the whole train→predict pipeline end-to-end.
* **Training** = one groupBy: the train split's (lang, gram) counts,
  bounded by langs x alphabet^n (the vocabulary, never the corpus), are
  collected once — no persist pinned for the session — and the dense
  Laplace-smoothed log P(gram | lang) model is rebuilt as a local
  ``langs x vocab`` DataFrame, broadcast-joined into scoring.
* **Scoring** = explode test-doc grams, join the model, one sum per
  (doc, lang), argmax via ``row_number``. Unseen grams fall back to the
  smoothing floor via the langs-x-vocab dense matrix (a cross join of two
  SMALL dimension tables, never corpus-sized).

Determinism across engines: every output column is integral/categorical;
the double-valued NB scores only feed the per-doc argmax, and the
profiles are constructed with strongly separated gram distributions, so
per-engine float summation order (hundreds-of-nats margins vs last-ulp
noise) can never flip a prediction. Tie-break pinned at (score desc,
lang asc) in both engines anyway.

Scale shape: gram explosion is linear in corpus chars; the model table is
``n_langs x vocab`` (bounded by the alphabet, not the corpus) and
broadcastable at any corpus size; the score aggregation is one shuffle on
(doc_id, lang).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 64-slot per-language character-frequency profiles. Multiplicity in the
# string == generation probability (slot picked by modular arithmetic) ==
# what the NB should learn. Shared alphabet, strongly different shapes —
# overlapping enough that the classifier is doing real work, separated
# enough that argmax margins dwarf float noise. (Letter weights loosely
# echo real letter-frequency tables; 'zh' stands in for a pinyin-ish
# consonant-heavy profile.)
_WEIGHTS: dict[str, list[tuple[str, int]]] = {
    "en": [("e", 12), ("t", 9), ("a", 8), ("o", 7), ("i", 6), ("n", 6),
           ("s", 5), ("r", 4), ("h", 3), ("l", 2), ("d", 1), ("c", 1)],
    "de": [("e", 14), ("n", 10), ("i", 7), ("s", 6), ("r", 6), ("t", 5),
           ("a", 4), ("d", 3), ("h", 3), ("u", 2), ("c", 2), ("g", 1), ("z", 1)],
    "es": [("e", 11), ("a", 11), ("o", 8), ("s", 7), ("r", 6), ("n", 6),
           ("i", 5), ("d", 4), ("l", 3), ("c", 2), ("u", 1)],
    "fr": [("e", 13), ("s", 7), ("a", 7), ("i", 6), ("t", 6), ("n", 6),
           ("r", 5), ("u", 5), ("l", 4), ("o", 3), ("d", 1), ("c", 1)],
    "zh": [("z", 9), ("h", 9), ("g", 7), ("x", 6), ("q", 6), ("w", 5),
           ("s", 5), ("j", 4), ("k", 4), ("l", 3), ("m", 3), ("n", 3)],
}
N_SLOTS = 64


def _expand(weights: list[tuple[str, int]]) -> str:
    s = "".join(ch * w for ch, w in weights)
    assert len(s) <= N_SLOTS, (len(s), s)
    return s + " " * (N_SLOTS - len(s))  # remainder: spaces (word breaks)


PROFILES: dict[str, str] = {lang: _expand(w) for lang, w in _WEIGHTS.items()}
LANGS = sorted(PROFILES)


def synth_labeled_corpus(
    docs: DataFrame, id_col: str = "doc_id", n_chars: int = 120
) -> DataFrame:
    """(doc_id) -> (doc_id, lang, text): deterministic labeled corpus.

    lang = LANGS[doc_id % 5]; char i = profile[(doc_id*131 + i*7919 + i*i)
    % 64] — BIGINT arithmetic DuckDB reproduces verbatim.
    """
    lang_arr = "array(" + ", ".join(f"'{l}'" for l in LANGS) + ")"
    prof_map = "map(" + ", ".join(f"'{l}', '{PROFILES[l]}'" for l in LANGS) + ")"
    return docs.select(F.col(id_col).alias("doc_id")).select(
        "doc_id",
        F.expr(f"element_at({lang_arr}, CAST(doc_id % 5 AS INT) + 1)").alias("lang"),
        F.expr(
            f"concat_ws('', transform(sequence(0, {n_chars - 1}), i -> "
            f"substring(element_at({prof_map}, element_at({lang_arr}, "
            f"CAST(doc_id % 5 AS INT) + 1)), "
            f"CAST((doc_id * 131 + i * 7919 + i * i) % {N_SLOTS} AS INT) + 1, 1)))"
        ).alias("text"),
    )


def _grams(corpus: DataFrame, n: int) -> DataFrame:
    """(doc_id, lang, gram) — one row per character n-gram position."""
    return corpus.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(text) - {n - 1}),"
                f" j -> substring(text, j, {n}))"
            )
        ).alias("gram"),
    )


def train_predict_langid(
    corpus: DataFrame, n: int = 2, test_mod: int = 7
) -> DataFrame:
    """Train on doc_id % test_mod != 0, predict the held-out fold.

    Returns (doc_id, true_lang, pred_lang, is_correct) for test docs.
    ``test_mod`` must be coprime with ``len(LANGS)`` (asserted): since
    lang = doc_id % len(LANGS), a common factor holds entire languages
    out of the training split — the model could never predict them and
    the balanced-folds floor argument below collapses (r6 ADVICE: the
    old default of 5 was exactly that degenerate split).
    """
    import math

    if math.gcd(test_mod, len(LANGS)) != 1:
        raise ValueError(
            f"test_mod={test_mod} shares a factor with {len(LANGS)} languages; "
            "the held-out fold would contain languages absent from training"
        )
    # train and test branches both explode the corpus; materialize it once
    # so the (synthesized or scanned) text column is not recomputed per
    # branch (r8, guide §5 — corpus rows are narrow, the explode is not)
    corpus = corpus.localCheckpoint()
    grams = _grams(corpus, n)
    train = grams.filter(F.col("doc_id") % test_mod != 0)

    # The (lang, gram) count table is bounded by langs x alphabet^n — the
    # vocabulary, never the corpus — so collect it once: the corpus-sized
    # explode+shuffle runs exactly once with NO persist left pinned in a
    # long-lived session (r6 ADVICE: bench.py times all registry queries
    # in one SparkSession, and a leaked cached block taxes every later
    # query). Bounded driver collects off the hot path follow the
    # kmeans-sample precedent; the dense Laplace-smoothed model is then
    # rebuilt as a LOCAL DataFrame, which the scoring join broadcasts.
    rows = train.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("c")).collect()
    counts = {(r["lang"], r["gram"]): r["c"] for r in rows}
    vocab = sorted({g for _, g in counts})
    totals: dict[str, int] = {}
    for (lang, _g), c in counts.items():
        totals[lang] = totals.get(lang, 0) + c
    v_size = float(len(vocab))
    model = corpus.sparkSession.createDataFrame(
        [
            (lang, g, math.log((counts.get((lang, g), 0) + 1.0) / (tot + v_size)))
            for lang, tot in sorted(totals.items())
            for g in vocab
        ],
        "cand_lang string, gram string, logp double",
    )

    test = grams.filter(F.col("doc_id") % test_mod == 0).select(
        "doc_id", F.col("lang").alias("true_lang"), "gram"
    )
    # inner join: a test gram absent from the train vocab ENTIRELY matches
    # no model row and is dropped — strictly, full NB would charge each
    # language its own floor log(1/(tot+V)), which differs across langs by
    # log(tot_a/tot_b). Here doc_id % 5 balances the folds, so the tots are
    # equal up to one doc's grams (|floor gap| < 1e-3 nats/gram) against
    # hundreds-of-nats argmax margins — and the q68 oracle SQL mirrors this
    # same inner join, so both engines drop identically
    scored = (
        test.join(F.broadcast(model), "gram")
        .groupBy("doc_id", "true_lang", "cand_lang")
        .agg(F.sum("logp").alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cand_lang"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "doc_id",
            "true_lang",
            F.col("cand_lang").alias("pred_lang"),
            (F.col("cand_lang") == F.col("true_lang")).alias("is_correct"),
        )
    )
