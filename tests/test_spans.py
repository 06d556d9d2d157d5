"""Exact substring-span dedup (operators/spans.py) — planted-duplicate tests.

The operator's contract (Lee et al. 2022 ExactSubstr semantics, distributed
as seed-and-extend): one row per MAXIMAL shared token run per document
pair, exact by construction (hash seeds + slice-equality verify). These
tests plant known shared runs and assert byte-precise recovery — offsets,
lengths, maximality, the stop-gram cap, and the min-length floor.
"""

from __future__ import annotations

from pyspark.sql import Row

from warc_bench_spark.operators.spans import duplicate_spans


def _docs(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in sorted(texts.items())]
    )


def _run(spark, texts, **kw):
    rows = duplicate_spans(_docs(spark, texts), "doc_id", "text", **kw).collect()
    return sorted(
        (r.doc_a, r.doc_b, r.a_start, r.b_start, r.len_tokens) for r in rows
    )


def words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_planted_run_exact_offsets(spark):
    # doc 1 carries tokens s0..s11 at offset 3; doc 2 carries them at 0
    shared = words("s", 12)
    texts = {
        1: words("a", 3) + " " + shared + " " + words("b", 4),
        2: shared + " " + words("c", 5),
    }
    got = _run(spark, texts, k=4, min_tokens=8)
    assert got == [(1, 2, 3, 0, 12)]


def test_run_is_maximal_not_fragmented(spark):
    # a 20-token shared run must come back as ONE span, not per-seed grams
    shared = words("s", 20)
    texts = {1: shared + " " + words("x", 6), 2: words("y", 2) + " " + shared}
    got = _run(spark, texts, k=5, min_tokens=8)
    assert got == [(1, 2, 0, 2, 20)]


def test_two_disjoint_runs_two_rows(spark):
    r1, r2 = words("p", 9), words("q", 10)
    texts = {
        1: r1 + " " + words("x", 5) + " " + r2,
        2: r2 + " " + words("z", 7) + " " + r1,
    }
    got = _run(spark, texts, k=4, min_tokens=8)
    assert got == [(1, 2, 0, 17, 9), (1, 2, 14, 0, 10)]


def test_below_min_tokens_dropped(spark):
    shared = words("s", 7)
    texts = {1: shared + " " + words("x", 5), 2: shared + " " + words("y", 5)}
    assert _run(spark, texts, k=4, min_tokens=8) == []
    # same corpus, lower floor: now reported
    assert _run(spark, texts, k=4, min_tokens=7) == [(1, 2, 0, 0, 7)]


def test_self_overlap_within_one_doc_not_reported(spark):
    # duplicate run INSIDE one document (doc_a < doc_b excludes self-pairs)
    rep = words("r", 10)
    texts = {1: rep + " " + words("m", 4) + " " + rep, 2: words("u", 12)}
    assert _run(spark, texts, k=4, min_tokens=8) == []


def test_stop_gram_cap_drops_boilerplate(spark):
    # the same 12-token boilerplate in 6 docs: with cap=4 no pair survives;
    # with cap=8 all 15 pairs do — both sides of the cap exercised
    shared = words("s", 12)
    texts = {i: words(f"u{i}_", 3) + " " + shared for i in range(1, 7)}
    assert _run(spark, texts, k=4, min_tokens=8, max_docs_per_gram=4) == []
    got = _run(spark, texts, k=4, min_tokens=8, max_docs_per_gram=8)
    assert len(got) == 15 and all(g[4] == 12 for g in got)


def test_three_docs_pairwise_spans(spark):
    shared = words("s", 10)
    texts = {
        1: shared + " " + words("a", 3),
        2: words("b", 2) + " " + shared,
        3: words("c", 4) + " " + shared + " " + words("d", 2),
    }
    got = _run(spark, texts, k=4, min_tokens=8)
    assert got == [(1, 2, 0, 2, 10), (1, 3, 0, 4, 10), (2, 3, 2, 4, 10)]


# ---------------------------------------------------------------------------
# excise_spans — the dedup ACTION (keep-first removal of duplicate runs)
# ---------------------------------------------------------------------------

from warc_bench_spark.operators.spans import excise_spans


def _excise(spark, texts, **kw):
    docs = _docs(spark, texts)
    spans = duplicate_spans(docs, "doc_id", "text", **kw)
    rows = excise_spans(docs, spans, "doc_id", "text").collect()
    return {r.doc_id: (r.clean_text, r.n_removed) for r in rows}


def test_excise_keeps_first_removes_second(spark):
    shared = words("s", 12)
    texts = {
        1: words("a", 3) + " " + shared,
        2: shared + " " + words("c", 5),
    }
    got = _excise(spark, texts, k=4, min_tokens=8)
    # doc 1 (lowest id) keeps its copy verbatim; doc 2 loses exactly the run
    assert got[1] == (texts[1], 0)
    assert got[2] == (words("c", 5), 12)


def test_excise_three_way_share_single_survivor(spark):
    shared = words("s", 10)
    texts = {
        1: shared + " " + words("a", 3),
        2: words("b", 2) + " " + shared,
        3: words("c", 4) + " " + shared + " " + words("d", 2),
    }
    got = _excise(spark, texts, k=4, min_tokens=8)
    assert got[1] == (texts[1], 0)
    assert got[2] == (words("b", 2), 10)
    assert got[3] == (words("c", 4) + " " + words("d", 2), 10)


def test_excise_overlapping_cuts_count_once(spark):
    # doc 3 holds s0..s11; doc 1 shares s0..s7, doc 2 shares s4..s11 —
    # the two cut ranges overlap on s4..s7, and the union must excise
    # exactly 12 tokens (the 1-2 overlap s4..s7 is below min_tokens and
    # cuts nothing there)
    s = [f"s{i}" for i in range(12)]
    texts = {
        1: " ".join(s[:8]) + " " + words("x", 4),
        2: " ".join(s[4:]) + " " + words("y", 4),
        3: " ".join(s) + " " + words("z", 3),
    }
    got = _excise(spark, texts, k=4, min_tokens=8)
    assert got[1] == (texts[1], 0)
    assert got[2] == (texts[2], 0)
    assert got[3] == (words("z", 3), 12)


def test_excise_entirely_duplicate_doc_empties(spark):
    shared = words("s", 9)
    texts = {1: shared + " " + words("a", 2), 2: shared}
    got = _excise(spark, texts, k=4, min_tokens=8)
    assert got[1] == (texts[1], 0)
    assert got[2] == ("", 9)


def test_excise_untouched_docs_pass_through(spark):
    texts = {1: words("a", 10), 2: words("b", 10), 3: "x"}
    got = _excise(spark, texts, k=4, min_tokens=8)
    assert got == {1: (texts[1], 0), 2: (texts[2], 0), 3: ("x", 0)}


# ---------------------------------------------------------------------------
# contaminated_docs — benchmark decontamination (asymmetric ExactSubstr)
# ---------------------------------------------------------------------------

from warc_bench_spark.operators.spans import contaminated_docs


def _bench_df(spark, bench: dict[int, str]):
    return spark.createDataFrame(
        [Row(bench_id=i, text=t) for i, t in sorted(bench.items())]
    )


def _contam(spark, texts, bench, **kw):
    rows = contaminated_docs(
        _docs(spark, texts), _bench_df(spark, bench), **kw
    ).collect()
    return {r.doc_id: (r.n_bench_docs, r.n_runs, r.max_run_tokens) for r in rows}


def test_contam_flags_planted_overlap_only(spark):
    shared = words("s", 10)
    texts = {
        1: words("a", 3) + " " + shared,  # contaminated
        2: words("b", 12),                # clean
    }
    bench = {100: shared + " " + words("q", 2)}
    got = _contam(spark, texts, bench, k=4, min_tokens=8)
    assert got == {1: (1, 1, 10)}


def test_contam_single_doc_gram_still_flags(spark):
    # unlike duplicate_spans, there is NO >=2-docs gram floor: a run unique
    # to one training doc is exactly the contamination we must find
    shared = words("s", 9)
    texts = {1: shared + " " + words("x", 3)}
    bench = {7: words("p", 2) + " " + shared}
    assert _contam(spark, texts, bench, k=4, min_tokens=8) == {1: (1, 1, 9)}


def test_contam_counts_multiple_bench_docs_and_runs(spark):
    r1, r2 = words("p", 9), words("q", 10)
    texts = {1: r1 + " " + words("x", 3) + " " + r2}
    bench = {100: r1 + " " + words("m", 2), 200: words("n", 2) + " " + r2}
    # doc 1 shares a run with both bench docs; max run is the 10-token one
    assert _contam(spark, texts, bench, k=4, min_tokens=8) == {1: (2, 2, 10)}


def test_contam_corpus_stop_gram_cap(spark):
    # boilerplate present in 6 training docs: with cap=4 its grams are
    # dropped (no contamination signal), with cap=8 all 6 docs flag
    shared = words("s", 12)
    texts = {i: words(f"u{i}_", 3) + " " + shared for i in range(1, 7)}
    bench = {100: shared}
    assert _contam(spark, texts, bench, k=4, min_tokens=8, max_docs_per_gram=4) == {}
    got = _contam(spark, texts, bench, k=4, min_tokens=8, max_docs_per_gram=8)
    assert sorted(got) == [1, 2, 3, 4, 5, 6]
    assert all(v == (1, 1, 12) for v in got.values())


def test_contam_below_min_tokens_clean(spark):
    shared = words("s", 7)
    texts = {1: shared + " " + words("x", 4)}
    bench = {100: shared}
    assert _contam(spark, texts, bench, k=4, min_tokens=8) == {}


def test_contam_probe_broadcast_is_the_bounded_exception(spark):
    # the PROBE side carries a deliberate broadcast hint (bounded by the
    # benchmark, not by corpus duplication) — in contrast to q67/q69,
    # whose plans must carry none (test_plan_quality)
    df = contaminated_docs(
        _docs(spark, {1: words("a", 10)}),
        _bench_df(spark, {100: words("a", 10)}),
        k=4,
        min_tokens=8,
    )
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" in logical


def test_gram_hash_equality_classes_match_string_grams(spark):
    # r8: the gram hash is xxhash64 over k per-token xxhash64 values (one
    # hash per token, 8k fixed bytes per position) instead of xxhash64 of a
    # re-built k-token string per position. This pins the internals: the
    # equality classes of the hashed gram table must be EXACTLY the equality
    # classes of the literal gram strings — same positions grouped, no
    # merges (collisions) and no splits — on a corpus with planted repeats,
    # near-miss grams (one token differs), and tokens that are prefixes of
    # each other ("s1" vs "s11", where a string-level separator matters).
    from pyspark.sql import functions as F

    from warc_bench_spark.operators.spans import _gram_hash_args

    k = 4
    shared = words("s", 12)  # includes s1/s11-style prefix tokens
    texts = {
        1: shared + " " + words("x", 5),
        2: words("y", 3) + " " + shared,
        3: shared.replace("s5", "zz") + " " + words("w", 4),  # near-miss
    }
    toks = _docs(spark, texts).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    hashed = toks.withColumn(
        "_th", F.expr("transform(toks, t -> xxhash64(t))")
    ).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(_th) - {k}),"
                f" i -> xxhash64({_gram_hash_args(k)}))"
            )
        ).alias("pos", "g"),
    )
    strings = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - {k}),"
                f" i -> concat_ws(' ', slice(toks, i + 1, {k})))"
            )
        ).alias("pos", "gs"),
    )
    joined = hashed.join(strings, ["doc_id", "pos"]).collect()
    by_hash: dict[int, set[str]] = {}
    by_string: dict[str, set[int]] = {}
    for r in joined:
        by_hash.setdefault(r.g, set()).add(r.gs)
        by_string.setdefault(r.gs, set()).add(r.g)
    assert all(len(v) == 1 for v in by_hash.values()), "hash collision merged distinct grams"
    assert all(len(v) == 1 for v in by_string.values()), "equal grams split across hashes"
