"""AXTree similarity (M2), TF-IDF near-dup (D3 literal), add_query_param (C16)."""

from difflib import SequenceMatcher

import numpy as np
import pytest
from pyspark.sql import functions as F

from warc_bench_spark.functions.textsim import (
    axtree_similarity,
    axtrees_differ,
    keep_middle,
)
from warc_bench_spark.functions.urls import add_query_param
from warc_bench_spark.operators.neardup import (
    remove_similar_in_group,
    similar_pair_mask,
    tfidf_matrix,
)


# ---------------------------------------------------------------- M2 difflib

def test_keep_middle_matches_reference_slicing():
    """data_utils.py:154-171: string[(len-L)//2 : (len+L)//2]."""
    s = "abcdefghij"  # len 10
    assert keep_middle(s, 10) == s
    assert keep_middle(s, 11) == s
    assert keep_middle(s, 4) == s[3:7]
    assert keep_middle(s, 5) == s[2:7]
    assert keep_middle("", 5) == ""


def test_axtree_similarity_equals_difflib():
    a = "button Submit\nlink Home\ntext Hello"
    b = "button Submit\nlink Home\ntext World"
    assert axtree_similarity(a, b) == SequenceMatcher(None, a, b).ratio()
    assert axtree_similarity(a, a) == 1.0


def test_axtrees_differ_threshold():
    """Reference semantics: differ iff ratio < 0.9999."""
    a = "x" * 1000
    assert not axtrees_differ(a, a)
    assert axtrees_differ(a, a[:-1] + "y")
    # truncation path: strings longer than max_length compare by middle part
    long_a = "p" * 200_000
    long_b = "q" * 60_000 + "p" * 80_000 + "q" * 60_000
    # middles (50k) are both all-'p' -> identical -> NOT different
    assert not axtrees_differ(long_a, long_b)


def test_equal_string_shortcircuit_is_exact_under_autojunk():
    """Pins the fast-path justification documented in textsim.py: equal
    strings ratio to exactly 1.0 even when autojunk junks every character
    (matches extend through adjacent equal junk; ties break to the
    diagonal), so the a == b short-circuit changes nothing. The
    near-identical control proves autojunk IS active on these inputs —
    if either pin breaks on a future Python, revisit the docstring."""
    for s in ["a" * 300, "ab" * 150, "aab" * 100, "a" * 199 + "b", "the " * 100]:
        assert SequenceMatcher(None, s, s).ratio() == 1.0, s[:20]
        assert axtree_similarity(s, s) == 1.0
        assert not axtrees_differ(s, s)
    # control: autojunk really does junk 'a' here — one changed char
    # collapses the ratio to 0.0 instead of ~0.997
    assert SequenceMatcher(None, "a" * 300, "b" + "a" * 299).ratio() == 0.0


def test_cdifflib_backend_matches_stdlib():
    """Gated parity check for the C backend (reference's data_utils.py:14
    dependency): CSequenceMatcher must produce the identical ratio. Skips
    where cdifflib is absent — then the module already IS stdlib difflib."""
    from warc_bench_spark.functions import textsim

    if not textsim.cdifflib_available():
        pytest.skip("cdifflib not installed — pure-python backend active")
    from cdifflib import CSequenceMatcher

    pairs = [
        ("button A\nlink B", "button A\nlink C"),
        ("x" * 5000, "x" * 4999 + "y"),
        ("", "nonempty"),
        ("päge ünïcode", "päge unicode"),
    ]
    for a, b in pairs:
        assert textsim.axtree_similarity(a, b) == SequenceMatcher(None, a, b).ratio()
        assert CSequenceMatcher(None, a, b).ratio() == SequenceMatcher(None, a, b).ratio()


def test_axtree_similarity_udf_matches_python(spark):
    rows = [
        ("button A\nlink B", "button A\nlink C"),
        ("same", "same"),
        ("", "x"),
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    from warc_bench_spark.functions.textsim import axtree_similarity_udf

    got = [r["s"] for r in df.select(axtree_similarity_udf("a", "b").alias("s")).collect()]
    want = [axtree_similarity(a, b) for a, b in rows]
    assert got == pytest.approx(want, abs=1e-12)


# ------------------------------------------------------------- D3 TF-IDF

def _sklearn_style_cosine(texts):
    w = tfidf_matrix(texts)
    sim = w @ w.T
    np.fill_diagonal(sim, 0.0)
    return sim


def test_tfidf_matrix_l2_normalized():
    w = tfidf_matrix(["red apple pie", "green apple tart", "red red wine"])
    norms = np.sqrt((w * w).sum(axis=1))
    assert norms == pytest.approx([1.0, 1.0, 1.0], abs=1e-12)


def test_similar_pair_mask_greedy_semantics():
    """goal_filtering.py greedy loop: first of a similar cluster is kept."""
    texts = [
        "buy the blue shirt from the store",
        "buy the blue shirt from the store",   # dup of 0 -> removed
        "find cheapest flight to tokyo",
        "buy the blue shirt from the store",   # dup of 0 -> removed
        "completely different query about maps",
    ]
    mask = similar_pair_mask(texts, threshold=0.99)
    assert list(mask) == [True, False, True, False, True]
    sim = _sklearn_style_cosine(texts)
    assert sim[0, 1] > 0.99 and sim[0, 3] > 0.99 and sim[0, 2] < 0.5


def test_remove_similar_in_group_spark_matches_python(spark):
    rows = []
    for g, texts in {
        "u1": ["alpha beta gamma", "alpha beta gamma", "delta epsilon zeta"],
        "u2": ["single goal here"],
        "u3": ["pay the bill online", "pay the bill online now", "watch a movie"],
    }.items():
        for i, txt in enumerate(texts):
            rows.append((g, i, txt))
    df = spark.createDataFrame(rows, "grp string, idx int, text string")
    kept = remove_similar_in_group(
        df, group_col="grp", text_col="text", threshold=0.99, order_col="idx"
    )
    got = {(r["grp"], r["idx"]) for r in kept.collect()}
    # python reference, per group in idx order
    want = set()
    for g in ("u1", "u2", "u3"):
        grp = sorted((r for r in rows if r[0] == g), key=lambda r: r[1])
        mask = similar_pair_mask([r[2] for r in grp], 0.99)
        want |= {(g, r[1]) for r, m in zip(grp, mask) if m}
    assert got == want
    assert ("u1", 0) in got and ("u1", 1) not in got
    assert ("u2", 0) in got


# --------------------------------------------------------------- C16 params

def test_add_query_param_reference_semantics():
    """auth_utils.py:10-27: parse_qs + replace + urlencode(doseq)."""
    assert (
        add_query_param("https://a.com/p?x=1", "tok", "abc")
        == "https://a.com/p?x=1&tok=abc"
    )
    assert add_query_param("https://a.com/p", "tok", "abc") == "https://a.com/p?tok=abc"
    # replace semantics: existing key is overwritten (all occurrences)
    assert (
        add_query_param("https://a.com/p?tok=old&y=2&tok=old2", "tok", "new")
        == "https://a.com/p?tok=new&y=2"
    )


# ------------------------------------------------------ winnowing (q59 op)

def _py_winnow(txt, k=8, w=4, mod=1_000_000_007, base=131):
    def h(i):
        v = 0
        for j in range(k - 1, -1, -1):  # Horner, mod each step (no overflow)
            v = (v * base + ord(txt[i + j])) % mod
        return v

    hs = [h(i) for i in range(len(txt) - k + 1)]
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


def test_winnowing_matches_python_reference(spark):
    from warc_bench_spark.plans.similarity_text import winnowing_fingerprints

    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs today"),
        (3, "the quick brown fox naps under the warm sun"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, txt string")
    got = {}
    for r in winnowing_fingerprints(df, "txt", "doc_id").collect():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    for doc_id, txt in texts:
        assert got[doc_id] == _py_winnow(txt), doc_id


def test_winnowing_guarantee_shared_substring(spark):
    """Winnowing's detection guarantee: documents sharing a substring of
    length >= k + w - 1 share at least one fingerprint; unrelated docs
    (different alphabets) share none."""
    from warc_bench_spark.plans.similarity_text import winnowing_fingerprints

    shared = "a very distinctive common passage of text"
    df = spark.createDataFrame(
        [
            (1, f"prefix one {shared} suffix alpha"),
            (2, f"totally different lead-in {shared} and ending"),
            (3, "zzzz qqqq xxxx wwww vvvv uuuu yyyy kkkk jjjj"),
        ],
        "doc_id long, txt string",
    )
    fps = {}
    for r in winnowing_fingerprints(df, "txt", "doc_id").collect():
        fps.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert fps[1] & fps[2], "shared passage must yield a shared fingerprint"
    assert not (fps[1] & fps[3])


def test_q63_sql_oracle_matches_difflib_adversarial():
    """The q63 oracle re-derives difflib's matching-blocks recursion in SQL;
    pin it against stdlib difflib on adversarial short pairs (repetitive
    alphabets maximize tie-break pressure; <200 chars so autojunk is off).
    Runs entirely in DuckDB — no Spark session."""
    import random

    import duckdb

    from warc_bench_spark.plans.relational import REGISTRY
    import warc_bench_spark.plans.evalmetrics  # noqa: F401  (registers q63)

    # the unmodified oracle SQL runs against an injected `documents` view
    # below (pairs are encoded as the consecutive doc_ids its join expects)
    sql = REGISTRY["q63_seqmatch_ratio_exact"].sql

    rng = random.Random(7)
    rows = []
    pid = 0
    for _ in range(120):
        la, lb = rng.randint(0, 40), rng.randint(0, 40)
        rows.append((pid, "".join(rng.choice("ab") for _ in range(la)),
                     "".join(rng.choice("ab") for _ in range(lb))))
        pid += 1
    rows += [(pid, "", ""), (pid + 1, "xyz", ""), (pid + 2, "", "xyz"),
             (pid + 3, "same text", "same text")]

    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (doc_id BIGINT, text VARCHAR)")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM fixture"
    )
    # encode pairs as consecutive doc_ids the query's own join reconstructs
    docs = []
    for i, (p, sa, sb) in enumerate(rows):
        docs.append((2 * i, sa))
        docs.append((2 * i + 1, sb))
    con.executemany("INSERT INTO fixture VALUES (?, ?)", docs)
    # the query joins doc_id+1 and filters doc_id < 100: use even ids < 100
    got = dict(con.execute(sql).fetchall())
    for i, (p, sa, sb) in enumerate(rows):
        a_id = 2 * i
        if a_id >= 100:
            break
        sa120, sb120 = sa[:120], sb[:120]
        want = (
            1.0
            if not (sa120 or sb120)
            else round(SequenceMatcher(None, sa120, sb120).ratio(), 6)
        )
        assert got[a_id] == pytest.approx(want, abs=1e-12), (a_id, sa, sb)
