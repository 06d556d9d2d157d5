"""Grouped TF-IDF cosine near-duplicate removal (SURVEY.md §2 D3, literal form).

Re-expresses ``/root/reference/scripts/goal_filtering.py:8-100``
``remove_similar_goals_by_url``: within each group (the reference groups
subtask goals by ``start_url``), build TF-IDF vectors, compute pairwise
cosine similarity, and greedily drop near-duplicates (cosine > threshold),
keeping the first-seen representative of every similar cluster.

The TF-IDF here reimplements the sklearn ``TfidfVectorizer`` defaults the
reference relies on, from scratch in numpy:

* tokens: ``\\b\\w\\w+\\b`` on the lowercased text (>= 2 word chars);
* smooth idf: ``ln((1 + n) / (1 + df)) + 1``;
* l2-normalized rows; cosine = normalized dot product.

Spark shape: ``groupBy(group_col).applyInPandas`` — each group is small
(goals per start URL), so the quadratic similarity matrix is a per-group
numpy kernel while the group fan-out is cluster-wide. At 100 TB the groups
stay bounded (per-URL goal counts), so the shuffle is by group key and no
task sees more than one group's matrix. A degenerate giant group would need
the LSH family (``plans/similarity_text.py``) instead — this operator is
the reference-literal semantics, not the scale path.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_TOKEN_RE = re.compile(r"\b\w\w+\b")


def tfidf_matrix(texts: list[str]) -> np.ndarray:
    """l2-normalized TF-IDF matrix (sklearn-default semantics, from scratch)."""
    token_lists = [_TOKEN_RE.findall((t or "").lower()) for t in texts]
    vocab: dict[str, int] = {}
    for toks in token_lists:
        for tok in toks:
            if tok not in vocab:
                vocab[tok] = len(vocab)
    n, v = len(texts), len(vocab)
    tf = np.zeros((n, v), dtype=np.float64)
    for i, toks in enumerate(token_lists):
        for tok in toks:
            tf[i, vocab[tok]] += 1.0
    df = (tf > 0).sum(axis=0)
    idf = np.log((1.0 + n) / (1.0 + df)) + 1.0
    w = tf * idf
    norms = np.sqrt((w * w).sum(axis=1))
    norms[norms == 0.0] = 1.0
    return w / norms[:, None]


def similar_pair_mask(
    texts: list[str], threshold: float, sim_decimals: int | None = None
) -> np.ndarray:
    """Boolean keep-mask per text — the greedy loop of goal_filtering.py.

    ``sim_decimals`` rounds the cosine matrix before the threshold compare.
    The reference compares raw floats (``sim_decimals=None``, the default,
    pinned in tests); rounding only changes decisions for cosines within a
    summation-order ulp of a decimal boundary, and makes the operator
    cross-engine deterministic — that is what puts q53 under the driver's
    value-hash oracle (same discipline as q49's ``is_near_dup``).
    """
    n = len(texts)
    if n <= 1:
        return np.ones(n, dtype=bool)
    w = tfidf_matrix(texts)
    sim = w @ w.T
    if sim_decimals is not None:
        sim = np.round(sim, sim_decimals)
    np.fill_diagonal(sim, 0.0)
    keep: set[int] = set()
    remove: set[int] = set()
    for i in range(n):
        if i in remove:
            continue
        similar = np.nonzero(sim[i] > threshold)[0]
        if len(similar) > 0:
            keep.add(i)
            remove.update(int(j) for j in similar)
    return np.array([i not in remove or i in keep for i in range(n)], dtype=bool)


def remove_similar_in_group(
    df: DataFrame,
    group_col: str,
    text_col: str,
    threshold: float = 0.99,
    order_col: str | None = None,
    sim_decimals: int | None = None,
) -> DataFrame:
    """Drop near-duplicate rows within each group (D3 literal semantics).

    ``order_col`` pins the greedy iteration order (the reference iterates in
    DataFrame row order; distributed inputs need an explicit total order per
    group to be deterministic). ``sim_decimals`` — see similar_pair_mask.
    """
    schema = df.schema
    order = order_col or text_col

    def filter_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        mask = similar_pair_mask(list(pdf[text_col]), threshold, sim_decimals)
        return pdf[mask]

    return df.groupBy(group_col).applyInPandas(filter_group, schema)
