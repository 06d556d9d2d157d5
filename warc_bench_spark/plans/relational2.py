"""Batch-3 oracle queries: set operations, JSON extraction, cross products,
geometric predicates, stratified sampling — the remaining SURVEY.md §2
operator families."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .relational import register, t


@register(
    "q32_config_cross_product",
    """
    SELECT r.r_name AS region, p.p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n_cells
    FROM region r CROSS JOIN (SELECT DISTINCT p_brand FROM part) p
    GROUP BY r.r_name, p.p_brand ORDER BY region, brand
    """,
)
def q32(spark, sf_dir):
    """X7: the benchmarks × agents × models config cross-product
    (eval_runner.py:437-536) as crossJoin."""
    r = t(spark, sf_dir, "region")
    p = t(spark, sf_dir, "part").select("p_brand").distinct()
    return (
        r.crossJoin(p)
        .groupBy(F.col("r_name").alias("region"), F.col("p_brand").alias("brand"))
        .agg(F.count(F.lit(1)).alias("n_cells"))
        .orderBy("region", "brand")
    )


@register(
    "q33_union_merge",
    """
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id FROM events WHERE event_type = 'purchase')
    GROUP BY user_id ORDER BY n DESC, user_id LIMIT 20
    """,
)
def q33(spark, sf_dir):
    """SE1/J7: union of per-batch result streams
    (parallel_computing_controller.py:277-282; eval_runner.py:829)."""
    ev = t(spark, sf_dir, "events")
    u = ev.filter(F.col("event_type") == "click").select("user_id").unionAll(
        ev.filter(F.col("event_type") == "purchase").select("user_id")
    )
    return (
        u.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "user_id")
        .limit(20)
    )


@register(
    "q34_except_users",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_click_only_users FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      EXCEPT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
    """,
)
def q34(spark, sf_dir):
    """SE2: except / listing-minus-key (s3_utils.py:147-149)."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    errs = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    return clicks.exceptAll(errs).agg(F.count(F.lit(1)).alias("n_click_only_users"))


@register(
    "q35_duplicate_guard",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_duplicate_keys FROM (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, COUNT(*) AS c
      FROM orders GROUP BY o_custkey, d HAVING COUNT(*) > 1)
    """,
)
def q35(spark, sf_dir):
    """D6: duplicate-result guard (eval_runner.py:683-687 duplicated() →
    raise) as groupBy-count-filter."""
    o = t(spark, sf_dir, "orders")
    dups = (
        o.groupBy("o_custkey", F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
    )
    return dups.agg(F.count(F.lit(1)).alias("n_duplicate_keys"))


@register(
    "q36_json_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q36(spark, sf_dir):
    """C18/S7: JSON-as-string parse into typed values
    (task_completion_verifier.py:193-210; from_json/get_json_object)."""
    ev = t(spark, sf_dir, "events", spread=True)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(F.sum(k).alias("total_k"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@register(
    "q37_regex_field_extract",
    """
    SELECT kval, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT regexp_extract(props, '"k": (\\d+)', 1) AS kval FROM events)
    WHERE kval <> '' GROUP BY kval ORDER BY n DESC, kval LIMIT 15
    """,
)
def q37(spark, sf_dir):
    """C7/C10: quoted/tagged substring extraction via regexp_extract
    (data_utils.py:226-239; action_parsing_utils.py:146-168)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.select(F.regexp_extract("props", r'"k": (\d+)', 1).alias("kval"))
        .filter(F.col("kval") != "")
        .groupBy("kval")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "kval")
        .limit(15)
    )


@register(
    "q38_middle_truncation",
    """
    SELECT doc_id,
           CASE WHEN len(text) <= 100 THEN text
                ELSE substr(text, 1, 50) || ' ... ' || substr(text, len(text) - 49, 50)
           END AS truncated
    FROM documents ORDER BY doc_id LIMIT 50
    """,
)
def q38(spark, sf_dir):
    """C12: middle-truncation of long strings
    (data_utils.py:154-171 _keep_the_middle_part_of_string)."""
    d = t(spark, sf_dir, "documents")
    trunc = F.when(F.length("text") <= 100, F.col("text")).otherwise(
        F.concat(
            F.substring("text", 1, 50),
            F.lit(" ... "),
            F.col("text").substr(F.length("text") - 49, F.lit(50)),
        )
    )
    return d.select("doc_id", trunc.alias("truncated")).orderBy("doc_id").limit(50)


@register(
    "q39_stratified_topk",
    """
    SELECT lang, doc_id, n_chars FROM (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents) WHERE rn <= 3 ORDER BY lang, n_chars DESC, doc_id
    """,
)
def q39(spark, sf_dir):
    """A12: exact stratified per-class top-k (trajectory_utils.py:21-73
    stratified sampling, made deterministic via window ranking)."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", F.desc("n_chars"), "doc_id")
    )


@register(
    "q40_point_in_bbox",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_quantity >= 10 AND l_quantity <= 40
                          AND l_discount * 100 >= 2 AND l_discount * 100 < 8
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q40(spark, sf_dir):
    """W6: point-in-bbox predicate as pure column arithmetic
    (action_grounding_utils.py:132-201 within_bbox_metric)."""
    li = t(spark, sf_dir, "lineitem")
    inside = (
        (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 40)
        & (F.col("l_discount") * 100 >= 2)
        & (F.col("l_discount") * 100 < 8)
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(inside, 1).otherwise(0)).cast("long").alias("n_inside"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q41_zip_alignment",
    """
    SELECT doc_id,
           CAST(len(list_filter(list_zip(a, b), p -> p[1] = p[2])) AS BIGINT) AS n_aligned,
           CAST(len(a) AS BIGINT) AS n
    FROM (
      SELECT doc_id,
             string_split(text, ' ')[1:10] AS a,
             string_split(lower(text), ' ')[1:10] AS b
      FROM documents) ORDER BY doc_id LIMIT 100
    """,
)
def q41(spark, sf_dir):
    """J10: element-wise GT↔prediction list alignment via zip_with
    (executor_eval.py:460-520 _correct_bids/_correct_coordinates)."""
    d = t(spark, sf_dir, "documents", spread=True)
    a = F.slice(F.split("text", " "), 1, 10)
    b = F.slice(F.split(F.lower("text"), " "), 1, 10)
    aligned = F.size(
        F.filter(F.zip_with(a, b, lambda x, y: x.eqNullSafe(y)), lambda v: v)
    )
    return (
        d.select(
            "doc_id",
            aligned.cast("long").alias("n_aligned"),
            F.size(a).cast("long").alias("n"),
        )
        .orderBy("doc_id")
        .limit(100)
    )


@register(
    "q42_host_task_classifier",
    """
    SELECT task_type, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT CASE WHEN source IN ('src0','src1','src2') THEN 'shopping'
                  WHEN source IN ('src3','src4') THEN 'shopping_admin'
                  WHEN source IN ('src5','src6','src7') THEN 'forum'
                  ELSE 'openended' END AS task_type
      FROM documents)
    GROUP BY task_type ORDER BY task_type
    """,
)
def q42(spark, sf_dir):
    """C5: port/host -> task-type chained-when classifier
    (trajectory_collector/utils/webarena_openended_task.py:9-22)."""
    d = t(spark, sf_dir, "documents")
    tt = (
        F.when(F.col("source").isin("src0", "src1", "src2"), "shopping")
        .when(F.col("source").isin("src3", "src4"), "shopping_admin")
        .when(F.col("source").isin("src5", "src6", "src7"), "forum")
        .otherwise("openended")
    )
    return (
        d.select(tt.alias("task_type"))
        .groupBy("task_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("task_type")
    )


@register(
    "q43_round_robin_pool",
    """
    SELECT pool_url, CAST(COUNT(*) AS BIGINT) AS n_assigned FROM (
      SELECT (['https://a.example','https://b.example','https://c.example'])
             [CAST(c_custkey % 3 AS INTEGER) + 1] AS pool_url
      FROM customer)
    GROUP BY pool_url ORDER BY pool_url
    """,
)
def q43(spark, sf_dir):
    """J9: round-robin url_pool assignment task i -> pool[i % len]
    (eval_runner.py:108-121)."""
    c = t(spark, sf_dir, "customer")
    pool = F.array(
        F.lit("https://a.example"), F.lit("https://b.example"), F.lit("https://c.example")
    )
    assigned = F.element_at(pool, (F.col("c_custkey") % 3).cast("int") + 1)
    return (
        c.select(assigned.alias("pool_url"))
        .groupBy("pool_url")
        .agg(F.count(F.lit(1)).alias("n_assigned"))
        .orderBy("pool_url")
    )


@register(
    "q44_repetitive_action_guard",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_repetitive_users FROM (
      SELECT user_id, MAX(c) AS max_repeat FROM (
        SELECT user_id, event_type, COUNT(*) AS c FROM events
        WHERE event_type <> 'view'
        GROUP BY user_id, event_type)
      GROUP BY user_id HAVING MAX(c) > 8)
    """,
)
def q44(spark, sf_dir):
    """A4/D4: repetitive-action detector — frequency Counter over non-scroll
    actions, trip when max count exceeds the cap
    (task_completion_verifier.py:92-108)."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") != "view")
    per = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    tripped = per.groupBy("user_id").agg(F.max("c").alias("max_repeat")).filter(
        F.col("max_repeat") > 8
    )
    return tripped.agg(F.count(F.lit(1)).alias("n_repetitive_users"))


@register(
    "q45_rollup_summary",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def q45(spark, sf_dir):
    """Hierarchical ROLLUP totals — beyond the reference (SURVEY §2.5 notes
    it has no grouping sets; its closest is the config cross-product), but
    table stakes for an analytics engine."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "total_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "q46_url_canonicalize_udf",
    """
    SELECT url_hash, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT sha256(regexp_replace(
               'https://h' || CAST(c_custkey % 50 AS VARCHAR) || '.example.com/x?id='
                 || CAST(c_custkey % 200 AS VARCHAR) || '&timestamp=' || CAST(c_custkey AS VARCHAR),
               'timestamp=\\d+', 'timestamp=%7Btimestamp%7D')) AS url_hash
      FROM customer)
    GROUP BY url_hash ORDER BY n DESC, url_hash LIMIT 50
    """,
)
def q46(spark, sf_dir):
    """C1 under the oracle gate: the engine's actual Arrow-vectorized
    canonicalizer (functions/urls.py, the normalizeUrl reimplementation)
    run over synthesized volatile-param URLs; the DuckDB oracle mirrors the
    rewrite with a regexp for this constrained URL shape. Dedup pressure:
    distinct custkeys collapse to shared canonical URLs."""
    from ..functions.urls import canonicalize_udf

    c = t(spark, sf_dir, "customer")
    raw = F.concat(
        F.lit("https://h"),
        (F.col("c_custkey") % 50).cast("string"),
        F.lit(".example.com/x?id="),
        (F.col("c_custkey") % 200).cast("string"),
        F.lit("&timestamp="),
        F.col("c_custkey").cast("string"),
    )
    return (
        c.select(F.sha2(canonicalize_udf(raw), 256).alias("url_hash"))
        .groupBy("url_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "url_hash")
        .limit(50)
    )


# exact discrete quantiles: positions as INTEGER ceil-divisions so no
# float quantile definition can diverge between engines
QUANTILES = [(1, 4, "p25"), (1, 2, "p50"), (3, 4, "p75"), (19, 20, "p95")]


def _q73_sql() -> str:
    cases = ",\n           ".join(
        f"MAX(CASE WHEN rn = ({num}*n + {den - 1}) // {den} THEN value END)"
        f" AS {name}"
        for num, den, name in QUANTILES
    )
    return f"""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value NULLS LAST) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events)
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_rows,
           {cases}
    FROM ranked GROUP BY event_type ORDER BY event_type
    """


@register("q73_exact_quantiles", _q73_sql())
def q73(spark, sf_dir):
    """Exact distributed order statistics (discrete percentiles) per
    group: one window pass ranks each group (row_number + an unordered
    COUNT over the same partition — one exchange, keyed on the group),
    and the p-quantile is the value at 1-based position ceil(p*n),
    computed as the INTEGER ceil-division (num*n + den-1) div den so no
    float quantile definition or interpolation rule can diverge between
    engines (ties among equal values can land any of them at rank k —
    the selected VALUE is identical either way). Scale note: exact
    quantiles need the per-group sort this window does; at 100 TB the
    sketch path is approx_percentile (t-digest) when the exactness
    contract can be relaxed — this query is the exact form."""
    ev = t(spark, sf_dir, "events").select("event_type", "value")
    w = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        # NULLS LAST explicitly on BOTH engines (r6 ADVICE): Spark ranks
        # ascending NULLS FIRST by default, DuckDB NULLS LAST — a NULL in
        # events.value would silently shift every rank between them
        F.row_number().over(w.orderBy(F.asc_nulls_last("value"))).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n_rows")] + [
        F.max(
            F.when(
                F.col("rn") == F.expr(f"({num}*n + {den - 1}) div {den}"),
                F.col("value"),
            )
        ).alias(name)
        for num, den, name in QUANTILES
    ]
    return ranked.groupBy("event_type").agg(*aggs).orderBy("event_type")


# ---------------------------------------------------------------------------
# Training-data quality filters (Gopher-style repetition + trained frequency
# scoring) — the repetition/quality heuristics every LLM data pipeline runs
# (Rae et al. 2021 "Scaling Language Models" table A1), re-expressed as
# exact-integer DataFrame algebra so the value-hash oracle can check them.
# ---------------------------------------------------------------------------

_Q76_SQL = """
WITH stats AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(list_sum(list_transform(string_split(text, ' '), x -> len(x))) AS BIGINT) AS tok_chars
  FROM documents),
bg AS (
  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS gram
  FROM stats, unnest(generate_series(1, len(ws) - 1)) AS u(i)),
bgc AS (
  SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM bg GROUP BY doc_id, gram),
top2 AS (
  SELECT doc_id, gram, cnt FROM (
    SELECT doc_id, gram, cnt,
           row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram) AS rn
    FROM bgc) WHERE rn = 1),
tg AS (
  SELECT doc_id, i, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
  FROM stats, unnest(generate_series(1, len(ws) - 2)) AS u(i)),
tgc AS (
  SELECT doc_id, i, COUNT(*) OVER (PARTITION BY doc_id, g) AS cnt FROM tg),
cov AS (
  SELECT doc_id, CAST(COUNT(DISTINCT p) AS BIGINT) AS dup3_tokens
  FROM tgc, unnest([i, i + 1, i + 2]) AS v(p)
  WHERE cnt >= 2 GROUP BY doc_id)
SELECT s.doc_id,
       s.n_tokens,
       s.tok_chars,
       COALESCE(t.gram, '') AS top2_gram,
       CAST(COALESCE(t.cnt, 0) AS BIGINT) AS top2_count,
       CASE WHEN 5 * COALESCE(t.cnt, 0) * (len(COALESCE(t.gram, '')) - 1) > s.tok_chars
            THEN 1 ELSE 0 END AS rep2_flag,
       CAST(COALESCE(c.dup3_tokens, 0) AS BIGINT) AS dup3_tokens,
       CASE WHEN 10 * COALESCE(c.dup3_tokens, 0) > 3 * s.n_tokens THEN 1 ELSE 0 END AS dup3_flag
FROM stats s LEFT JOIN top2 t USING (doc_id) LEFT JOIN cov c USING (doc_id)
ORDER BY s.doc_id
"""


@register("q76_repetition_signals", _Q76_SQL)
def q76(spark, sf_dir):
    """Gopher-style repetition quality filters, exact-integer form: per
    document the most-frequent word 2-gram (ties broken lexicographically
    — deterministic on both engines), its character share, and the number
    of token positions covered by any 3-gram repeated within the document
    (the duplicate-n-gram coverage signal). The published thresholds are
    fractions (top-2-gram char fraction > 0.20, dup-3-gram coverage >
    0.30); both flags compare via integer cross-multiplication so no
    float division touches the value hash. Scale shape: the gram counts
    are per-(doc, gram) partial-aggregated map-side, the top-gram rank
    is one window keyed on doc_id, and coverage dedups positions per doc
    — every stage keys on doc_id or (doc_id, gram), so parallelism is
    per-document and nothing is corpus-global. The parquet scan is read
    once per branch (three cheap column-pruned scans) rather than
    persisted — at 100 TB re-reading a pruned scan beats caching the
    exploded grams."""
    d = t(spark, sf_dir, "documents", spread=True).select("doc_id", F.split("text", " ").alias("ws"))
    stats = d.select(
        "doc_id",
        "ws",
        F.size("ws").cast("long").alias("n_tokens"),
        F.expr("aggregate(ws, 0L, (a, x) -> a + length(x))").alias("tok_chars"),
    ).localCheckpoint()  # r8: three branches (bigrams/trigrams/out) read
    # stats — materialize the scan+split+aggregate once (guide §5)
    # Spark's sequence(1, n) DESCENDS when n < 1 (DuckDB's generate_series
    # is empty there), so gram positions are guarded with a when().
    bigrams = stats.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    bgc = bigrams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("gram"))
    top2 = (
        bgc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "gram", "cnt")
    )
    trigrams = stats.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ws") >= 3,
                F.expr(
                    "transform(sequence(1, size(ws) - 2), i -> struct(i AS i,"
                    " concat(element_at(ws, i), ' ', element_at(ws, i + 1), ' ',"
                    " element_at(ws, i + 2)) AS g))"
                ),
            ).otherwise(F.expr("array()").cast("array<struct<i:int,g:string>>"))
        ).alias("s"),
    ).select("doc_id", F.col("s.i").alias("i"), F.col("s.g").alias("g"))
    wg = Window.partitionBy("doc_id", "g")
    cov = (
        trigrams.withColumn("cnt", F.count(F.lit(1)).over(wg))
        .filter(F.col("cnt") >= 2)
        .select("doc_id", F.explode(F.expr("array(i, i + 1, i + 2)")).alias("p"))
        .groupBy("doc_id")
        .agg(F.countDistinct("p").cast("long").alias("dup3_tokens"))
    )
    out = (
        stats.drop("ws")
        .join(top2, "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "tok_chars",
            F.coalesce("gram", F.lit("")).alias("top2_gram"),
            F.coalesce("cnt", F.lit(0)).cast("long").alias("top2_count"),
            F.when(
                5 * F.coalesce("cnt", F.lit(0))
                * (F.length(F.coalesce("gram", F.lit(""))) - 1)
                > F.col("tok_chars"),
                1,
            )
            .otherwise(0)
            .alias("rep2_flag"),
            F.coalesce("dup3_tokens", F.lit(0)).cast("long").alias("dup3_tokens"),
            F.when(
                10 * F.coalesce("dup3_tokens", F.lit(0)) > 3 * F.col("n_tokens"), 1
            )
            .otherwise(0)
            .alias("dup3_flag"),
        )
        .orderBy("doc_id")
    )
    return out


_Q77_SQL = """
WITH tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tk2 AS (SELECT doc_id, token FROM tk WHERE token <> ''),
vocab AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM tk2 GROUP BY token)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(freq) AS BIGINT) AS sum_freq,
       CAST((100 * CAST(SUM(freq) AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS BIGINT)
           AS avg_freq_x100
FROM tk2 JOIN vocab USING (token)
GROUP BY doc_id ORDER BY doc_id
"""


@register("q77_freq_quality", _Q77_SQL)
def q77(spark, sf_dir):
    """Corpus-trained unigram-frequency quality score — the train-then-
    apply shape (like q68's langid): pass 1 learns the corpus vocabulary
    frequency table, pass 2 scores every document by the summed corpus
    frequency of its token instances (the integer-exact core of a
    CCNet-style LM quality bucket; avg_freq_x100 is a BIGINT floor
    division so no float reaches the hash). Scale shape: the vocabulary
    aggregate partial-combines map-side and is sublinear in the corpus
    (Heaps' law), but it is NOT hint-broadcast — at 100 TB a web-scale
    vocab has billions of rare tokens, so the token->freq lookup stays
    an equi-join for AQE to pick the build side, exactly the spans.py
    lesson from VERDICT r6."""
    d = t(spark, sf_dir, "documents", spread=True)
    tk = d.select("doc_id", F.explode(F.split("text", " ")).alias("token")).filter(
        F.col("token") != ""
    )
    vocab = tk.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    return (
        tk.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("freq").cast("long").alias("sum_freq"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_freq",
            F.expr("(100 * sum_freq) div n_tokens").cast("long").alias("avg_freq_x100"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# PII scrubbing + regex pre-tokenization — the remaining text-pipeline ops
# a production training-data run performs before tokenizer training.
# ---------------------------------------------------------------------------

# PII is INJECTED by construction (the q66/q74 pattern — the synthetic
# corpus contains none), from doc_id arithmetic identical on both engines,
# so the redaction really fires and the value hash checks real work.
_Q78_SQL = r"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
                      || CAST((doc_id * 7) % 256 AS VARCHAR)
                 ELSE '' END AS t
  FROM documents),
red AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t, '[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', 0)) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(t, '\b(\d{1,3}\.){3}\d{1,3}\b', 0)) AS BIGINT) AS n_ips,
         regexp_replace(
           regexp_replace(t, '[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS clean
  FROM aug)
SELECT doc_id, n_emails, n_ips,
       sha256(clean) AS clean_fp,
       CAST(len(clean) AS BIGINT) AS clean_chars
FROM red ORDER BY doc_id
"""


@register("q78_pii_redaction", _Q78_SQL)
def q78(spark, sf_dir):
    """PII scrubbing: detect and redact email addresses and IPv4 literals,
    emitting per-doc match counts plus a digest of the redacted text (the
    digest proves the REPLACEMENT is byte-identical across engines, not
    just the counts). Patterns avoid lookahead/backreferences so Java
    regex (Spark) and RE2 (DuckDB) agree. The PII is injected from doc_id
    arithmetic because the synthetic corpus contains none — the oracle
    injects identically, so a redactor that missed real matches would
    hash-mismatch. Scale shape: pure per-row JVM string work, no shuffle
    until the final presentation sort; at 100 TB this is a map-only stage
    that rides whatever partitioning the scan gives."""
    d = t(spark, sf_dir, "documents", spread=True)
    email_re = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ip_re = r"\b(\d{1,3}\.){3}\d{1,3}\b"
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit("."),
                    ((F.col("doc_id") * 7) % 256).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    clean = F.regexp_replace(
        F.regexp_replace("t", email_re, "<EMAIL>"), ip_re, "<IP>"
    )
    # r'...' raw literals: a plain Spark SQL string literal would eat the
    # regex backslashes ('\b' -> backspace); DuckDB literals keep them as-is
    return aug.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(t, r'{email_re}', 0)")).cast("long").alias("n_emails"),
        F.size(F.expr(f"regexp_extract_all(t, r'{ip_re}', 0)")).cast("long").alias("n_ips"),
        F.sha2(clean, 256).alias("clean_fp"),
        F.length(clean).cast("long").alias("clean_chars"),
    ).orderBy("doc_id")


# Digits/punctuation are injected from doc_id (the corpus is pure words,
# which would leave n_number/n_punct degenerately zero).
_Q79_SQL = r"""
WITH aug AS (
  SELECT doc_id,
         text || ' v' || CAST(doc_id AS VARCHAR) || '.'
              || CAST(doc_id % 7 AS VARCHAR) || '-rc!' AS t
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '\p{L}+', 0)) AS BIGINT) AS n_word,
       CAST(len(regexp_extract_all(t, '[0-9]+', 0)) AS BIGINT) AS n_number,
       CAST(len(regexp_extract_all(t, '[^\p{L}0-9\s]+', 0)) AS BIGINT) AS n_punct,
       CAST(len(regexp_extract_all(t, '\p{L}+|[0-9]+|[^\p{L}0-9\s]+', 0)) AS BIGINT) AS n_tokens
FROM aug ORDER BY doc_id
"""


@register("q79_pretokenizer_counts", _Q79_SQL)
def q79(spark, sf_dir):
    """Regex pre-tokenizer statistics — the GPT-2-style class split
    (letter runs | digit runs | punctuation runs) used to estimate token
    budgets before tokenizer training. The real GPT-2 pattern needs
    lookahead, which RE2 (DuckDB) lacks, so the class-run form is used —
    same run boundaries on ASCII text. \\p{L} and \\s parse identically
    in Java regex and RE2 (POSIX [[:alpha:]] classes would NOT — Java
    rejects them). Digit/punct material is injected from doc_id since
    the synthetic corpus is pure words. Map-only per-row JVM work; the
    alternation is one scan pass per row."""
    d = t(spark, sf_dir, "documents", spread=True)
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" v"),
            F.col("doc_id").cast("string"),
            F.lit("."),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("-rc!"),
        ).alias("tx"),
    )

    def n(pat, alias):
        return (
            F.size(F.expr(f"regexp_extract_all(tx, r'{pat}', 0)"))
            .cast("long")
            .alias(alias)
        )

    counted = aug.select(
        "doc_id",
        n(r"\p{L}+", "n_word"),
        n("[0-9]+", "n_number"),
        n(r"[^\p{L}0-9\s]+", "n_punct"),
    )
    # r8: the three classes are disjoint and jointly cover every non-\s
    # char, so the alternation's leftmost-longest runs are exactly the
    # union of the three class runs — n_tokens is their sum, and the
    # fourth regex scan per row is dropped (result identical; the oracle
    # SQL keeps the textbook alternation form)
    return counted.select(
        "doc_id",
        "n_word",
        "n_number",
        "n_punct",
        (F.col("n_word") + F.col("n_number") + F.col("n_punct")).alias("n_tokens"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Link-graph authority scoring + cardinality sketching — the frontier-
# prioritization and distinct-counting ops a crawl/training pipeline runs
# at corpus scale.
# ---------------------------------------------------------------------------

_PR_SCALE = 1_000_000_000_000  # rank fixed-point scale (10^12)
_PR_TELEPORT = 150_000_000_000  # floor(0.15 * scale)
_PR_ITERS = 4


def _q80_sql() -> str:
    it = """
r{k} AS (
  SELECT nodes.v,
         (85 * CAST(COALESCE(s.c, 0) AS BIGINT)) // 100 + {tp} AS r
  FROM nodes LEFT JOIN (
    SELECT e.v, SUM(r{p}.r // e.outdeg) AS c
    FROM edges e JOIN r{p} ON r{p}.v = e.u GROUP BY e.v) s ON s.v = nodes.v)"""
    its = ",".join(
        it.format(k=k, p=k - 1, tp=_PR_TELEPORT) for k in range(1, _PR_ITERS + 1)
    )
    return f"""
WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
nodes AS (SELECT doc_id AS v FROM documents),
edges AS (
  SELECT d.doc_id AS u, (1 + d.doc_id % 3) AS outdeg,
         (d.doc_id * p.a + p.j) % nn.n AS v
  FROM documents d, nn, (VALUES (7, 0), (13, 1), (31, 2)) AS p(a, j)
  WHERE p.j <= d.doc_id % 3),
r0 AS (SELECT v, CAST({_PR_SCALE} AS BIGINT) AS r FROM nodes),{its}
SELECT v AS doc_id, r AS rank_scaled
FROM r{_PR_ITERS} ORDER BY rank_scaled DESC, doc_id LIMIT 100
"""


@register("q80_pagerank_scaled", _q80_sql())
def q80(spark, sf_dir):
    """PageRank over a by-construction link graph (edge targets from
    doc_id arithmetic — the corpus carries no links), in FIXED-POINT
    integer arithmetic: ranks are BIGINTs scaled by 10^12, each edge
    contributes rank div outdeg, and the damping step is (85*sum) div
    100 + floor(0.15*scale) — integer sums are order-invariant, so no
    float accumulation can diverge between engines or between partition
    orders. Every node has outdeg >= 1 by construction (no dangling-mass
    term). The 4 iterations are unrolled into the plan (each round is
    one equi-join keyed on the source + one groupBy keyed on the target
    — the standard distributed PageRank shuffle pair); at 100 TB each
    round's rank vector would be persisted/checkpointed between rounds
    exactly as operators/components.py does for label propagation — here
    each intermediate is referenced once, so the linear chain needs no
    cache. The crawl use: URL authority as a frontier priority signal."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    cnt = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # one-row aggregate: the broadcast is structurally bounded (q75 pattern)
    edges = (
        docs.crossJoin(F.broadcast(cnt))
        .select(
            F.col("doc_id").alias("u"),
            (1 + F.col("doc_id") % 3).cast("long").alias("outdeg"),
            "n",
            F.explode(
                F.expr(
                    "filter(array(struct(7L AS a, 0L AS j), struct(13L AS a, 1L AS j),"
                    " struct(31L AS a, 2L AS j)), s -> s.j <= doc_id % 3)"
                )
            ).alias("p"),
        )
        .select(
            "u",
            "outdeg",
            ((F.col("u") * F.col("p.a") + F.col("p.j")) % F.col("n")).alias("v"),
        )
    )
    # the edge list is referenced by every iteration; a lazy localCheckpoint
    # makes all 4 subtrees share ONE concrete RDD stage (components.py's
    # iterative-plan treatment) instead of re-deriving scan+explode per round
    edges = edges.localCheckpoint(eager=False)
    nodes = docs.select(F.col("doc_id").alias("v"))
    ranks = nodes.select("v", F.lit(_PR_SCALE).cast("long").alias("r"))
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(ranks.withColumnRenamed("v", "u"), "u")
            .groupBy("v")
            .agg(F.sum(F.expr("r div outdeg")).alias("c"))
        )
        ranks = nodes.join(contrib, "v", "left").select(
            "v",
            F.expr(f"(85 * coalesce(c, 0L)) div 100 + {_PR_TELEPORT}").alias("r"),
        )
    return (
        ranks.select(F.col("v").alias("doc_id"), F.col("r").alias("rank_scaled"))
        .orderBy(F.desc("rank_scaled"), "doc_id")
        .limit(100)
    )


# HLL with m=16 registers (bucket = first hex nibble of sha256) and a
# 48-bit rank stream (next 12 hex chars): rank <= 49, so
# sum_pow = SUM(2^(49-reg)) <= 16*2^49 = 2^53 — still exactly
# representable in an IEEE double, which makes the one float division in
# the estimate bit-identical across engines.
_Q81_SQL = """
WITH hashes AS (
  SELECT DISTINCT sha256(CAST(user_id AS VARCHAR)) AS h FROM events),
ranked AS (
  SELECT substr(h, 1, 1) AS bucket,
         4 * len(regexp_extract(substr(h, 2, 12), '^0*', 0))
         + CASE substr(substr(h, 2, 12), len(regexp_extract(substr(h, 2, 12), '^0*', 0)) + 1, 1)
             WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
             WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
             ELSE 0 END
         + 1 AS rank
  FROM hashes),
regs AS (
  SELECT printf('%x', i) AS bucket, CAST(COALESCE(mx, 0) AS BIGINT) AS register
  FROM generate_series(0, 15) AS t(i)
  LEFT JOIN (SELECT bucket, MAX(rank) AS mx FROM ranked GROUP BY bucket) r
    ON r.bucket = printf('%x', i)),
summary AS (
  SELECT CAST(SUM(CAST(2 AS BIGINT) ** (49 - register)) AS BIGINT) AS sum_pow FROM regs),
exact AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct FROM events)
SELECT regs.bucket, regs.register, summary.sum_pow,
       CAST(floor(CAST(0.673 AS DOUBLE) * CAST(256 AS DOUBLE) * CAST(562949953421312 AS DOUBLE)
                  / CAST(summary.sum_pow AS DOUBLE)) AS BIGINT) AS hll_est,
       exact.exact_distinct
FROM regs, summary, exact
ORDER BY regs.bucket
"""


@register("q81_hll_registers", _Q81_SQL)
def q81(spark, sf_dir):
    """From-scratch HyperLogLog: sha256-keyed register construction as
    pure DataFrame algebra. The leading-zero rank is computed ON THE HEX
    STRING (4 bits per leading '0' char + a nibble CASE for the first
    non-zero char) so no hex->int conversion is needed — the exact trick
    that keeps both engines identical. Registers are the distributed
    sketch state (a groupBy MAX — mergeable, the whole point of HLL at
    100 TB: map-side partial MAX per bucket, 16..2^14 rows total
    regardless of input size). The estimate's single float division has
    both operands exactly double-representable (sum_pow <= 2^53), and
    the small-range linear-counting correction is deliberately omitted —
    it needs ln(), and libm transcendentals are NOT bit-portable across
    engines. exact_distinct rides along as the accuracy reference.
    2^49 = 562949953421312 appears as a literal so neither engine's
    integer-power semantics enter the hash."""
    ev = t(spark, sf_dir, "events")
    hashes = ev.select(
        F.sha2(F.col("user_id").cast("string"), 256).alias("h")
    ).distinct()
    rest = F.substring("h", 2, 12)
    zeros = F.length(F.regexp_extract(rest, "^0*", 0))
    first = F.expr("substring(substring(h, 2, 12), length(regexp_extract(substring(h, 2, 12), '^0*', 0)) + 1, 1)")
    extra = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    ranked = hashes.select(
        F.substring("h", 1, 1).alias("bucket"),
        (4 * zeros + extra + 1).alias("rank"),
    )
    maxes = ranked.groupBy("bucket").agg(F.max("rank").alias("mx"))
    buckets = spark.range(16).select(F.format_string("%x", F.col("id").cast("int")).alias("bucket"))
    regs = buckets.join(maxes, "bucket", "left").select(
        "bucket", F.coalesce("mx", F.lit(0)).cast("long").alias("register")
    )
    summary = regs.agg(
        F.sum(F.expr("CAST(pow(2, 49 - register) AS BIGINT)")).cast("long").alias("sum_pow")
    )
    exact = ev.agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
    return (
        regs.crossJoin(F.broadcast(summary))
        .crossJoin(F.broadcast(exact))
        .select(
            "bucket",
            "register",
            "sum_pow",
            F.floor(
                F.lit(0.673) * F.lit(256) * F.lit(562949953421312.0)
                / F.col("sum_pow").cast("double")
            )
            .cast("long")
            .alias("hll_est"),
            "exact_distinct",
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Temporal dimension modeling + index construction
# ---------------------------------------------------------------------------

_Q82_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS its
  FROM events WHERE user_id % 25 = 0),
vers AS (
  SELECT user_id,
         row_number() OVER w AS version,
         event_type AS state,
         its AS valid_from_us,
         lead(its) OVER w AS valid_to_us
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY its, event_id))
SELECT user_id, version, state, valid_from_us,
       COALESCE(valid_to_us, CAST(253402300799000000 AS BIGINT)) AS valid_to_us,
       CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END AS is_current
FROM vers ORDER BY user_id, version
"""


@register("q82_scd2_intervals", _Q82_SQL)
def q82(spark, sf_dir):
    """Slowly-changing-dimension (SCD2) interval build: turn a change
    stream into versioned validity intervals [valid_from, valid_to) with
    one window pass per key — row_number for the version, lead(ts) to
    close each interval, a NULL lead marking the current row (closed
    with the 9999-12-31 sentinel so both engines emit identical BIGINTs).
    Timestamps are exact integer microseconds (unix_micros / epoch_us —
    the q65/q70 rule: DuckDB epoch() is DOUBLE and would round). Equal-ts
    ties break on event_id, making the version order a deterministic
    total order. Scale shape: one exchange keyed on user_id, then a
    per-key sort — the canonical distributed CDC-to-warehouse transform;
    no self-join (the naive formulation) and nothing corpus-global."""
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") % 25 == 0)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("its"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("its", "event_id")
    vers = ev.select(
        "user_id",
        F.row_number().over(w).alias("version"),
        F.col("event_type").alias("state"),
        F.col("its").alias("valid_from_us"),
        F.lead("its").over(w).alias("valid_to_us_raw"),
    )
    return vers.select(
        "user_id",
        "version",
        "state",
        "valid_from_us",
        F.coalesce("valid_to_us_raw", F.lit(253402300799000000).cast("long")).alias(
            "valid_to_us"
        ),
        F.when(F.col("valid_to_us_raw").isNull(), 1).otherwise(0).alias("is_current"),
    ).orderBy("user_id", "version")


_Q83_SQL = """
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
pl AS (
  SELECT token,
         CAST(COUNT(*) AS BIGINT) AS doc_freq,
         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
  FROM pairs WHERE token <> '' GROUP BY token)
SELECT token, doc_freq, postings FROM pl
WHERE doc_freq >= 2 ORDER BY doc_freq DESC, token LIMIT 100
"""


@register("q83_inverted_index", _Q83_SQL)
def q83(spark, sf_dir):
    """Inverted-index construction: token -> sorted posting list of the
    documents containing it, plus document frequency — the IR/search
    primitive (and the BM25/dedup-blocking precursor). The posting list
    is emitted as a comma-joined SORTED string so the value hash is
    order-invariant even though collect_set's accumulation order is not
    (sort_array + array_join on Spark, string_agg ... ORDER BY on
    DuckDB). Scale shape: one distinct + one groupBy, both keyed on
    token; posting lists for stop-like tokens grow with the corpus, so a
    production index would shard long lists (the q67 stop-gram cap
    pattern) — here the LIMIT keeps the driver row set bounded while the
    aggregation itself stays unbounded and distributed."""
    d = t(spark, sf_dir, "documents", spread=True)
    pairs = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )
    return (
        pairs.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.expr(
                "array_join(transform(sort_array(collect_set(doc_id)),"
                " x -> cast(x AS string)), ',')"
            ).alias("postings"),
        )
        .filter(F.col("doc_freq") >= 2)
        .orderBy(F.desc("doc_freq"), "token")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Frequency-estimation sketch + cohort analytics
# ---------------------------------------------------------------------------

# Count-Min with d=4 rows and w=256 buckets, where the bucket KEY is the
# first two hex chars of sha256('cm{i}:' || token) — a string key, so like
# q81 no hex->int conversion exists anywhere. The estimate is the MIN over
# rows of the probed counters (classic CM upper bound: estimate >= truth).
_Q84_SQL = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
tk AS (SELECT token FROM toks WHERE token <> ''),
rows_ AS (SELECT unnest(generate_series(0, 3)) AS i),
counters AS (
  SELECT i, substr(sha256('cm' || CAST(i AS VARCHAR) || ':' || token), 1, 2) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tk, rows_ GROUP BY 1, 2),
probes AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM tk GROUP BY token ORDER BY token LIMIT 10),
est AS (
  SELECT p.token, p.true_count,
         CAST(MIN(c.cnt) AS BIGINT) AS cm_estimate
  FROM probes p CROSS JOIN rows_ r JOIN counters c ON c.i = r.i
  WHERE c.bucket = substr(sha256('cm' || CAST(r.i AS VARCHAR) || ':' || p.token), 1, 2)
  GROUP BY p.token, p.true_count)
SELECT token, true_count, cm_estimate,
       CASE WHEN cm_estimate >= true_count THEN 1 ELSE 0 END AS bound_holds
FROM est ORDER BY token
"""


@register("q84_countmin_sketch", _Q84_SQL)
def q84(spark, sf_dir):
    """Count-Min sketch: token-frequency estimation with a mergeable
    d x w counter table (d=4 hash rows, w=256 buckets keyed by the first
    two sha256 hex chars — string buckets, so no hex->int conversion,
    the q81 trick). The counter build is one groupBy on (row, bucket) —
    map-side partial sums, 1024 output rows REGARDLESS of corpus size,
    which is the whole point of the sketch at 100 TB. Probes are the 10
    lexicographically-smallest tokens; the estimate is MIN over rows of
    the probed counters and bound_holds asserts the CM guarantee
    (estimate >= truth) inside the hashed values themselves."""
    d = t(spark, sf_dir, "documents", spread=True)
    tk = d.select(F.explode(F.split("text", " ")).alias("token")).filter(
        F.col("token") != ""
    )
    rows = spark.range(4).select(F.col("id").cast("int").alias("i"))
    bucket = F.substring(
        F.sha2(F.concat(F.lit("cm"), F.col("i").cast("string"), F.lit(":"), F.col("token")), 256),
        1,
        2,
    )
    # r8 (guide §2.3 "aggregate before you shuffle"): the counter build
    # used to cross-join every token OCCURRENCE with the 4 sketch rows and
    # sha256 each of the 4N copies. Counting per token FIRST (one pass,
    # map-side partial agg) and summing counts into buckets is the same
    # arithmetic — sum over tokens in a bucket of the token's count — but
    # hashes 4x|vocab| strings instead of 4x|corpus| and feeds the probe
    # top-10 from the same aggregate instead of a second full explode.
    vocab = tk.groupBy("token").agg(F.count(F.lit(1)).alias("true_count"))
    vocab = vocab.localCheckpoint()  # counters + probes share one pass
    counters = (
        vocab.crossJoin(F.broadcast(rows))
        .select("i", bucket.alias("bucket"), "true_count")
        .groupBy("i", "bucket")
        .agg(F.sum("true_count").alias("cnt"))
    )
    probes = vocab.orderBy("token").limit(10)
    probed = probes.crossJoin(F.broadcast(rows)).select(
        "token", "true_count", "i", bucket.alias("bucket")
    )
    est = (
        probed.join(counters, ["i", "bucket"])
        .groupBy("token", "true_count")
        .agg(F.min("cnt").cast("long").alias("cm_estimate"))
    )
    return est.select(
        "token",
        F.col("true_count").cast("long").alias("true_count"),
        "cm_estimate",
        F.when(F.col("cm_estimate") >= F.col("true_count"), 1).otherwise(0).alias("bound_holds"),
    ).orderBy("token")


# Day numbers are integer floor-divisions of the exact microsecond epoch
# (its // 86400000000) — no date/tz function from either engine enters the
# hash (the q65/q70 timestamp rule extended to calendar arithmetic).
_Q85_SQL = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
firsts AS (
  SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day // 7 AS cohort_week,
         (e.day - f.cohort_day) // 7 AS week_offset
  FROM ev e JOIN firsts f USING (user_id))
SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
       CAST(week_offset AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM activity GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


@register("q85_retention_cohorts", _Q85_SQL)
def q85(spark, sf_dir):
    """Retention-cohort rollup: users bucketed by first-seen week, counted
    per week offset since their cohort — the standard product-analytics
    triangle. Day/week numbers are integer floor-divisions of the exact
    microsecond epoch, so no date_trunc/timezone semantics from either
    engine can diverge. Scale shape: one groupBy for first-seen, one
    distinct on (user, cohort_week, offset), one count rollup — all keyed
    on user_id or the (small) cohort grid; the firsts join is an
    equi-join AQE can broadcast when the user dimension is small and
    shuffle when it is not."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(cast(ts AS timestamp)) div 86400000000").alias("day"),
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            F.expr("cohort_day div 7").alias("cohort_week"),
            F.expr("(day - cohort_day) div 7").alias("week_offset"),
            "user_id",
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# Graph analytics: triangle counting with degree-ordered orientation
# ---------------------------------------------------------------------------

# Same by-construction link graph as q80 (doc_id arithmetic), symmetrized
# and deduplicated to an undirected simple graph (self-loops dropped).
_Q86_SQL = """
WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
raw AS (
  SELECT d.doc_id AS a, (d.doc_id * p.x + p.j) % nn.n AS b
  FROM documents d, nn, (VALUES (7, 0), (13, 1), (31, 2)) AS p(x, j)
  WHERE p.j <= d.doc_id % 3),
und AS (
  SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi
  FROM raw WHERE a <> b),
deg AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT lo AS v FROM und UNION ALL SELECT hi AS v FROM und)
  GROUP BY v),
keyed AS (
  SELECT u.lo, u.hi,
         dl.d * (SELECT n FROM nn) + u.lo AS klo,
         dh.d * (SELECT n FROM nn) + u.hi AS khi
  FROM und u JOIN deg dl ON dl.v = u.lo JOIN deg dh ON dh.v = u.hi),
oriented AS (
  SELECT CASE WHEN klo < khi THEN lo ELSE hi END AS s,
         CASE WHEN klo < khi THEN hi ELSE lo END AS t,
         CASE WHEN klo < khi THEN khi ELSE klo END AS kt
  FROM keyed),
wedges AS (
  SELECT e1.t AS b, e2.t AS c
  FROM oriented e1 JOIN oriented e2 ON e1.s = e2.s AND e1.kt < e2.kt)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_vertices
FROM wedges w
JOIN oriented e3 ON e3.s = w.b AND e3.t = w.c
"""


@register("q86_triangle_count", _Q86_SQL)
def q86(spark, sf_dir):
    """Distributed triangle counting with DEGREE-ORDERED orientation (the
    Suri & Vassilvitskii / Cohen MapReduce formulation): every undirected
    edge points from its lower-(degree, id) endpoint to the higher, so
    each triangle is counted exactly once at its lowest-ordered vertex
    and — the scale property — wedge fan-out at a vertex is bounded by
    its ORIENTED out-degree, O(sqrt(|E|)) for any graph, instead of the
    raw degree that makes naive wedge joins quadratic on power-law hubs.
    The order key packs (degree, id) into one BIGINT (deg * n + id, id <
    n by construction). Plan: symmetrize+distinct, degree groupBy, two
    equi-joins (wedge build on the shared source, closure probe on the
    wedge tips) — every stage keyed, nothing all-pairs. Same
    by-construction graph as q80."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    cnt = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    raw = (
        docs.crossJoin(F.broadcast(cnt))
        .select(
            F.col("doc_id").alias("a"),
            "n",
            F.explode(
                F.expr(
                    "filter(array(struct(7L AS x, 0L AS j), struct(13L AS x, 1L AS j),"
                    " struct(31L AS x, 2L AS j)), s -> s.j <= doc_id % 3)"
                )
            ).alias("p"),
        )
        .select("a", "n", ((F.col("a") * F.col("p.x") + F.col("p.j")) % F.col("n")).alias("b"))
    )
    und = (
        raw.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("lo"),
            F.greatest("a", "b").alias("hi"),
            "n",
        )
        .distinct()
    )
    deg = (
        und.select(F.col("lo").alias("v"))
        .unionAll(und.select(F.col("hi").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    keyed = (
        und.join(deg.withColumnRenamed("v", "lo").withColumnRenamed("d", "dlo"), "lo")
        .join(deg.withColumnRenamed("v", "hi").withColumnRenamed("d", "dhi"), "hi")
        .select(
            "lo",
            "hi",
            (F.col("dlo") * F.col("n") + F.col("lo")).alias("klo"),
            (F.col("dhi") * F.col("n") + F.col("hi")).alias("khi"),
        )
    )
    oriented = keyed.select(
        F.when(F.col("klo") < F.col("khi"), F.col("lo")).otherwise(F.col("hi")).alias("s"),
        F.when(F.col("klo") < F.col("khi"), F.col("hi")).otherwise(F.col("lo")).alias("t"),
        F.greatest("klo", "khi").alias("kt"),
    )
    e1 = oriented.select(F.col("s").alias("s1"), F.col("t").alias("b"), F.col("kt").alias("k1"))
    e2 = oriented.select(F.col("s").alias("s2"), F.col("t").alias("c"), F.col("kt").alias("k2"))
    wedges = e1.join(e2, (F.col("s1") == F.col("s2")) & (F.col("k1") < F.col("k2"))).select(
        "b", "c"
    )
    closure = oriented.select(F.col("s").alias("b"), F.col("t").alias("c"))
    tri = wedges.join(closure, ["b", "c"]).agg(F.count(F.lit(1)).alias("n_triangles"))
    n_edges = und.agg(F.count(F.lit(1)).alias("n_edges"))
    n_vertices = deg.agg(F.count(F.lit(1)).alias("n_vertices"))
    return tri.crossJoin(F.broadcast(n_edges)).crossJoin(F.broadcast(n_vertices))


_Q87_SQL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS its FROM events),
s1 AS (
  SELECT user_id, MIN(its) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, MIN(e.its) AS t2
  FROM ev e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.its > s1.t1
    AND e.its <= s1.t1 + 21600000000 GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, MIN(e.its) AS t3
  FROM ev e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.its > s2.t2
    AND e.its <= s2.t2 + 21600000000 GROUP BY e.user_id)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_step1,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_step2,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_step3,
       CAST((10000 * (SELECT COUNT(*) FROM s2)) // (SELECT COUNT(*) FROM s1) AS BIGINT) AS conv_12_bps,
       CAST((10000 * (SELECT COUNT(*) FROM s3)) // (SELECT COUNT(*) FROM s2) AS BIGINT) AS conv_23_bps
"""


@register("q87_funnel_conversion", _Q87_SQL)
def q87(spark, sf_dir):
    """Ordered-step funnel (view -> click -> purchase): a user completes
    step k only with an event STRICTLY AFTER their step-(k-1) time AND
    within a 6-hour attribution window (21600000000 us) — the
    product-analytics semantics that a naive per-type count gets wrong,
    and the window is what makes drop-off real on a dense corpus.
    Each step is one filtered min-aggregate plus an equi-join on user_id
    (never a window over the whole event stream, never a self-join on
    raw events). Conversion rates as integer basis points (BIGINT floor
    division). Timestamps exact integer µs (the q65/q70 rule). Scale
    shape: per-step state is one row per surviving user, monotonically
    shrinking down the funnel."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("its"),
    )
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("its").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("its") > F.col("t1")) & (F.col("its") <= F.col("t1") + 21600000000))
        .groupBy("user_id")
        .agg(F.min("its").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("its") > F.col("t2")) & (F.col("its") <= F.col("t2") + 21600000000))
        .groupBy("user_id")
        .agg(F.min("its").alias("t3"))
    )
    c1 = s1.agg(F.count(F.lit(1)).alias("n_step1"))
    c2 = s2.agg(F.count(F.lit(1)).alias("n_step2"))
    c3 = s3.agg(F.count(F.lit(1)).alias("n_step3"))
    return (
        c1.crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(c3))
        .select(
            "n_step1",
            "n_step2",
            "n_step3",
            F.expr("(10000 * n_step2) div n_step1").alias("conv_12_bps"),
            F.expr("(10000 * n_step3) div n_step2").alias("conv_23_bps"),
        )
    )
