"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query (revenue-by-nation multi-join rollup) on
               sf0.001.
queries()    — the operator inventory from SURVEY.md §2, one DataFrame plan
               per operator family (see warc_bench_spark/plans/relational.py
               for the reference citations per query).
oracle_sql() — DuckDB-equivalent ANSI SQL per query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# ---------------------------------------------------------------------------
# WINDOW CONTRACT (the driver evaluates only the FIRST 50 queries() entries):
#   1. every query not yet holding a green driver row of record (a
#      CORRECTNESS_r0N.json row with hash_match=true, or err="no_oracle"
#      with a row count for the explicitly rows-only set) MUST sit inside
#      the first 50 entries — import order below controls this;
#   2. queries rotated OUT of the window must already hold a green row in a
#      committed CORRECTNESS_r0N.json AND stay covered by the local oracle
#      harness (tests/test_oracle_local.py runs the FULL registry);
#   3. every entry has oracle SQL, or is listed in ROWS_ONLY with the
#      reason it cannot be SQL-expressed.
# tests/test_registry_window.py asserts all three against the committed
# correctness records, so a reorder that silently strands an unverified
# query fails CI.
# ---------------------------------------------------------------------------
# Current order: the newest operator families (evalmetrics, archives,
# domtree, the q59/q60 pipeline ops) register BEFORE relational2 — whose
# operator families are also exercised by q01-q31 and hold green round-2
# driver rows (VERDICT r2 item: q50-q58 had no driver correctness row).
from warc_bench_spark.plans.relational import REGISTRY  # noqa: E402
import warc_bench_spark.plans.similarity_text  # noqa: E402,F401  (extends REGISTRY)
import warc_bench_spark.plans.evalmetrics  # noqa: E402,F401  (extends REGISTRY)
import warc_bench_spark.plans.archives  # noqa: E402,F401  (extends REGISTRY)
import warc_bench_spark.plans.domtree  # noqa: E402,F401  (extends REGISTRY)
import warc_bench_spark.plans.scheduling  # noqa: E402,F401  (extends REGISTRY)
import warc_bench_spark.plans.relational2  # noqa: E402,F401  (extends REGISTRY)
import warc_bench_spark.plans.media  # noqa: E402,F401  (extends REGISTRY)

# Window rotation, round 7: new queries register in their family module
# (which may sit past entry 50), so each one is PROMOTED to the position
# of a query that already holds a green driver row of record; the green
# query shifts out of the window on that row (contract item 2). The
# rotation is explicit data here — not a silent import reorder — and
# tests/test_registry_window.py still verifies the result.
_DEMOTE: list[str] = [
    # green-row queries moved to the END of the registry to free window
    # slots (each verified green in a committed CORRECTNESS record)
    "q54_wacz_index",  # green r5
    "q51_bbox_iou",  # green r6 (frees a slot for q74)
    "q52_add_query_param",  # green r6 (frees a slot for q75)
    "q49_tfidf_cosine_pairs",  # green r6 (frees a slot for q76)
    "q50_t_confidence_interval",  # green r6 (frees a slot for q77)
    "q53_tfidf_neardup_filter",  # green r6 (frees a slot for q78)
    "q63_seqmatch_ratio_exact",  # green r6 (frees a slot for q79)
    "q22_minhash_signatures",  # green r6 (frees a slot for q80)
    "q23_shingle_minhash",  # green r6 (frees a slot for q81)
    "q25_token_jaccard_pairs",  # green r6 (frees a slot for q82)
    "q26_simhash",  # green r6 (frees a slot for q83)
    "q24_lsh_candidate_pairs",  # green r6 (frees a slot for q84)
    "q27_embedding_knn",  # green r6 (frees a slot for q85)
    "q28_embedding_norms_by_label",  # green r6 (frees a slot for q86)
    "q29_lang_id_heuristic",  # green r6 (frees a slot for q87)
]
_PROMOTE: dict[str, str] = {
    # new query              -> green-row query it is inserted before
    # (applied in order, after _DEMOTE; q57 [green r3/r4/r5], q58 and
    # q55 [green r5] shift out of the window on those rows)
    "q70_asof_salted_state": "q57_robots_parse",
    "q71_embed_cosine_neardup": "q57_robots_parse",
    "q72_range_join_recent_views": "q57_robots_parse",
    "q73_exact_quantiles": "q57_robots_parse",
    "q74_image_pair_stats": "q57_robots_parse",
    "q75_benchmark_decontam": "q57_robots_parse",
    "q76_repetition_signals": "q57_robots_parse",
    "q77_freq_quality": "q57_robots_parse",
    "q78_pii_redaction": "q57_robots_parse",
    "q79_pretokenizer_counts": "q57_robots_parse",
    "q80_pagerank_scaled": "q57_robots_parse",
    "q81_hll_registers": "q57_robots_parse",
    "q82_scd2_intervals": "q57_robots_parse",
    "q83_inverted_index": "q57_robots_parse",
    "q84_countmin_sketch": "q57_robots_parse",
    "q85_retention_cohorts": "q57_robots_parse",
    "q86_triangle_count": "q57_robots_parse",
    "q87_funnel_conversion": "q57_robots_parse",
}
_order = list(REGISTRY)
for _name in _DEMOTE:
    _order.append(_order.pop(_order.index(_name)))
for _new, _out in _PROMOTE.items():
    _q = _order.pop(_order.index(_new))  # pop FIRST (a pre-pop index of
    _order.insert(_order.index(_out), _q)  # _out would be stale by one)
REGISTRY = {name: REGISTRY[name] for name in _order}


# Queries that CANNOT have a DuckDB value-hash oracle, with why; the driver
# records the weaker rows-only check for these (window-contract item 3).
ROWS_ONLY: dict[str, str] = {
    "q48_axtree_similarity": (
        "the LONG-string form: 50k-char middle-truncated difflib ratio, "
        "where autojunk activates and a SQL re-derivation is intractable; "
        "pinned against the pure-Python reference in tests/test_textsim.py."
        " The bounded form IS value-hash-oracled as q63 (matching-blocks "
        "recursion in SQL, <200 chars so autojunk never fires)"
    ),
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q02_revenue_by_nation"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.sql for name, q in REGISTRY.items() if q.sql is not None}
