"""Evaluation-metric operators (round-2 additions to the oracle inventory).

Closes the VERDICT round-1 gaps: exact ROUGE-1 F1 (A10), AXTree/difflib
similarity (M2), grouped TF-IDF cosine near-dup (D3 literal), t-distribution
confidence intervals (A9), IoU (W7), and a dedicated ``add_query_param``
(C16). Reference file:line citations on each query.

Float-exactness notes (same discipline as ``relational.py``):
* per-row arithmetic (IoU, F1 from integer set sizes) is identical IEEE on
  both engines — rounded to 6 dp only as a safety margin;
* cross-row float SUMs (TF-IDF dots/norms, mean/stddev) are order-dependent
  in the last ulp, so those outputs are rounded to 4-6 dp;
* the t multiplier is one driver-side scalar (as in the reference) embedded
  as the SAME literal in both the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.stats import t_ppf
from .relational import register, t

# sklearn TfidfVectorizer default token pattern — shared by the Spark plan,
# the DuckDB oracle and operators/neardup.py (all three regex dialects agree
# on this ASCII subset)
TOKEN_PATTERN = r"\b\w\w+\b"

T_CRIT_DF9 = t_ppf(0.975, 9)  # n=10 per group below → df=9


def _tokens_distinct(col):
    """Distinct whitespace tokens — str.split() semantics on single-space
    text (empty tokens dropped)."""
    return F.array_distinct(F.filter(F.split(col, " "), lambda x: x != ""))


@register(
    "q47_rouge1_f1",
    """
    WITH pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               list_distinct(list_filter(string_split(a.text, ' '), x -> x <> '')) AS ta,
               list_distinct(list_filter(string_split(b.text, ' '), x -> x <> '')) AS tb
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id < 300
    ), m AS (
        SELECT doc_a, doc_b,
               len(list_intersect(ta, tb)) AS inter,
               len(ta) AS na, len(tb) AS nb
        FROM pairs
    )
    SELECT doc_a, doc_b,
           CASE WHEN na = 0 OR nb = 0 THEN 0.0
                ELSE round(inter / na, 6) END AS precision_1,
           CASE WHEN na = 0 OR nb = 0 THEN 0.0
                ELSE round(inter / nb, 6) END AS recall_1,
           CASE WHEN na = 0 OR nb = 0 OR inter = 0 THEN 0.0
                ELSE round(2.0 * (inter / na) * (inter / nb)
                           / ((inter / na) + (inter / nb)), 6) END AS rouge1_f1
    FROM m
    ORDER BY doc_a
    """,
)
def q47(spark, sf_dir):
    """A10 exact ROUGE-1 F1 (action_grounding_utils.py:101-130): the
    reference tokenizes with str.split() into SETS, so precision/recall are
    distinct-token-overlap ratios — pure JVM array ops, no UDF."""
    d = t(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    a = d.filter(F.col("doc_id") < 300).select(
        F.col("doc_id").alias("doc_a"), _tokens_distinct("text").alias("ta")
    )
    b = d.select((F.col("doc_id") - 1).alias("doc_a"),
                 F.col("doc_id").alias("doc_b"),
                 _tokens_distinct("text").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb")).cast("double")
    na = F.size("ta").cast("double")
    nb = F.size("tb").cast("double")
    p, r = inter / na, inter / nb
    degenerate = (na == 0) | (nb == 0)
    return (
        a.join(b, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            F.when(degenerate, 0.0).otherwise(F.round(p, 6)).alias("precision_1"),
            F.when(degenerate, 0.0).otherwise(F.round(r, 6)).alias("recall_1"),
            F.when(degenerate | (inter == 0), 0.0)
            .otherwise(F.round(2 * p * r / (p + r), 6))
            .alias("rouge1_f1"),
        )
        .orderBy("doc_a")
    )


@register("q48_axtree_similarity", None)  # difflib ratio: not SQL-expressible
def q48(spark, sf_dir):
    """M2 AXTree change detection (data_utils.py:75-100): SequenceMatcher
    ratio over middle-truncated strings, threshold 0.9999. Arrow-batched
    pandas UDF; rows-only oracle + golden numbers in tests/test_textsim.py."""
    from ..functions.textsim import DEFAULT_SIMILARITY_THRESHOLD, axtree_similarity_udf

    # no scan spread here (r8): the pair set is bounded to doc_id < 100 by
    # construction, so the real UDF work is ~100 rows — spreading only
    # multiplies Python-worker startup under the broadcast join
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    a = d.filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a")
    )
    b = d.select((F.col("doc_id") - 1).alias("doc_a"), F.col("text").alias("text_b"))
    sim = axtree_similarity_udf(F.col("text_a"), F.col("text_b"))
    return (
        a.join(b, "doc_a")
        .select(
            "doc_a",
            F.round(sim, 6).alias("similarity"),
            (sim < F.lit(DEFAULT_SIMILARITY_THRESHOLD)).alias("changed"),
        )
        .orderBy("doc_a")
    )


@register(
    "q63_seqmatch_ratio_exact",
    r"""
    WITH RECURSIVE pairs AS (
        SELECT a.doc_id AS pair_id,
               substr(a.text, 1, 120) AS sa, substr(b.text, 1, 120) AS sb
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id < 100
    ), pos_a AS (
        SELECT pair_id, CAST(u.i AS BIGINT) AS i,
               substr(sa, CAST(u.i AS INT), 1) AS ch
        FROM pairs, unnest(range(1, CAST(length(sa) AS BIGINT) + 1)) AS u(i)
    ), pos_b AS (
        SELECT pair_id, CAST(u.j AS BIGINT) AS j,
               substr(sb, CAST(u.j AS INT), 1) AS ch
        FROM pairs, unnest(range(1, CAST(length(sb) AS BIGINT) + 1)) AS u(j)
    ), m0 AS (
        SELECT a.pair_id, a.i, b.j
        FROM pos_a a JOIN pos_b b ON b.pair_id = a.pair_id AND b.ch = a.ch
    ), isl AS (
        SELECT pair_id, i, j,
               i - row_number() OVER (PARTITION BY pair_id, j - i ORDER BY i) AS grp
        FROM m0
    ), matches AS (
        -- k = forward run length of the common substring starting at (i,j)
        SELECT pair_id, i, j,
               max(i) OVER (PARTITION BY pair_id, j - i, grp) - i + 1 AS k
        FROM isl
    ), roles AS (
        SELECT * FROM (VALUES ('blk'), ('lft'), ('rgt')) r(role)
    ), step AS (
        -- difflib.get_matching_blocks as interval recursion: each step
        -- resolves every pending [alo,ahi)x[blo,bhi) interval to its
        -- longest match (argmax packed as k*1e6 - i*1e3 - j, giving the
        -- reference tie-break max k, then min i, then min j) and emits the
        -- block row plus the left/right child intervals
        SELECT pair_id, CAST(1 AS BIGINT) AS alo,
               CAST(length(sa) AS BIGINT) + 1 AS ahi,
               CAST(1 AS BIGINT) AS blo,
               CAST(length(sb) AS BIGINT) + 1 AS bhi,
               CAST(0 AS BIGINT) AS k
        FROM pairs
        UNION ALL
        SELECT b.pair_id,
               CASE r.role WHEN 'lft' THEN b.alo ELSE b.bi + b.bk END,
               CASE r.role WHEN 'lft' THEN b.bi ELSE b.ahi END,
               CASE r.role WHEN 'lft' THEN b.blo ELSE b.bj + b.bk END,
               CASE r.role WHEN 'lft' THEN b.bj ELSE b.bhi END,
               CASE r.role WHEN 'blk' THEN b.bk ELSE CAST(0 AS BIGINT) END
        FROM (
            SELECT pair_id, alo, ahi, blo, bhi,
                   CAST(ceil(enc / 1000000.0) AS BIGINT) AS bk,
                   (CAST(ceil(enc / 1000000.0) AS BIGINT) * 1000000 - enc)
                       // 1000 AS bi,
                   (CAST(ceil(enc / 1000000.0) AS BIGINT) * 1000000 - enc)
                       % 1000 AS bj
            FROM (
                SELECT s.pair_id, s.alo, s.ahi, s.blo, s.bhi,
                       (SELECT max(least(m.k, s.ahi - m.i, s.bhi - m.j)
                                   * 1000000 - m.i * 1000 - m.j)
                        FROM matches m
                        WHERE m.pair_id = s.pair_id
                          AND m.i >= s.alo AND m.i < s.ahi
                          AND m.j >= s.blo AND m.j < s.bhi) AS enc
                FROM step s WHERE s.k = 0
            ) WHERE enc IS NOT NULL
        ) b CROSS JOIN roles r
        WHERE r.role = 'blk'
           OR (r.role = 'lft' AND b.alo < b.bi AND b.blo < b.bj)
           OR (r.role = 'rgt' AND b.bi + b.bk < b.ahi AND b.bj + b.bk < b.bhi)
    ), msum AS (
        SELECT pair_id, SUM(k) AS m FROM step GROUP BY pair_id
    )
    SELECT p.pair_id AS doc_a,
           CASE WHEN length(p.sa) + length(p.sb) = 0 THEN 1.0
                ELSE round(2.0 * COALESCE(s.m, 0)
                           / (length(p.sa) + length(p.sb)), 6)
           END AS ratio
    FROM pairs p LEFT JOIN msum s USING (pair_id)
    ORDER BY doc_a
    """,
)
def q63(spark, sf_dir):
    """M2 under the FULL value-hash oracle (the q62 quantization playbook
    applied to difflib): SequenceMatcher.ratio over bounded 120-char
    prefixes, where 2*M/(la+lb) is exact rational-in-double arithmetic on
    both engines. The oracle re-derives difflib's matching blocks in SQL —
    run lengths per diagonal via island windows, then get_matching_blocks'
    interval recursion as a recursive CTE with the reference (max k, min i,
    min j) tie-break (data_utils.py:75-100 semantics; strings < 200 chars
    so difflib's autojunk never activates and stdlib == cdifflib == this
    SQL). Validated against difflib on 700+ randomized/adversarial pairs
    incl. empty strings. q48 keeps the long-string/keep_middle boundary as
    the rows-only form."""
    from ..functions.textsim import axtree_similarity_udf

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 120).alias("s")
    )
    a = d.filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("doc_a"), F.col("s").alias("sa")
    )
    b = d.select((F.col("doc_id") - 1).alias("doc_a"), F.col("s").alias("sb"))
    return (
        a.join(b, "doc_a")
        .select(
            "doc_a",
            F.round(axtree_similarity_udf(F.col("sa"), F.col("sb")), 6).alias("ratio"),
        )
        .orderBy("doc_a")
    )


@register(
    "q49_tfidf_cosine_pairs",
    f"""
    WITH docs AS (
        SELECT doc_id, source, lower(text) AS txt
        FROM documents WHERE doc_id < 60
    ), tok AS (
        SELECT doc_id, source, u.token
        FROM docs, unnest(regexp_extract_all(txt, '{TOKEN_PATTERN}')) AS u(token)
    ), tf AS (
        SELECT doc_id, source, token, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM tok GROUP BY doc_id, source, token
    ), ng AS (
        SELECT source, CAST(COUNT(*) AS DOUBLE) AS n FROM docs GROUP BY source
    ), dfreq AS (
        SELECT source, token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
        FROM tok GROUP BY source, token
    ), w AS (
        SELECT tf.doc_id, tf.source, tf.token,
               tf.tf * (ln((1 + ng.n) / (1 + dfreq.df)) + 1) AS w
        FROM tf JOIN ng USING (source) JOIN dfreq USING (source, token)
    ), norms AS (
        SELECT doc_id, source, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY doc_id, source
    ), pairs AS (
        SELECT w1.source, w1.doc_id AS doc_a, w2.doc_id AS doc_b,
               SUM(w1.w * w2.w) AS dot
        FROM w w1 JOIN w w2
          ON w1.source = w2.source AND w1.token = w2.token AND w1.doc_id < w2.doc_id
        GROUP BY w1.source, w1.doc_id, w2.doc_id
    )
    SELECT p.source, doc_a, doc_b,
           round(dot / (n1.nrm * n2.nrm), 4) AS cosine,
           round(dot / (n1.nrm * n2.nrm), 4) > 0.99 AS is_near_dup
    FROM pairs p
    JOIN norms n1 ON n1.source = p.source AND n1.doc_id = p.doc_a
    JOIN norms n2 ON n2.source = p.source AND n2.doc_id = p.doc_b
    ORDER BY p.source, doc_a, doc_b
    """,
)
def q49(spark, sf_dir):
    """D3 literal (goal_filtering.py:8-100): sklearn-default TF-IDF cosine
    within a group — here fully declarative (explode + joins + aggregates,
    zero Python); the greedy filter built on it is operators/neardup.py."""
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "source", F.lower("text").alias("txt"))
    )
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(F.regexp_extract_all("txt", F.lit(TOKEN_PATTERN), 0)).alias("token"),
    )
    tf = tok.groupBy("doc_id", "source", "token").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    ng = docs.groupBy("source").agg(F.count(F.lit(1)).cast("double").alias("n"))
    dfreq = tok.groupBy("source", "token").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    w = (
        tf.join(F.broadcast(ng), "source")
        .join(dfreq, ["source", "token"])
        .select(
            "doc_id",
            "source",
            "token",
            (F.col("tf") * (F.log((1 + F.col("n")) / (1 + F.col("df"))) + 1)).alias("w"),
        )
    )
    norms = w.groupBy("doc_id", "source").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    w1 = w.select("source", "token", F.col("doc_id").alias("doc_a"), F.col("w").alias("wa"))
    w2 = w.select("source", "token", F.col("doc_id").alias("doc_b"), F.col("w").alias("wb"))
    pairs = (
        w1.join(w2, ["source", "token"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("source", "doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    n1 = norms.select("source", F.col("doc_id").alias("doc_a"), F.col("nrm").alias("nrm_a"))
    n2 = norms.select("source", F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nrm_b"))
    cos = F.col("dot") / (F.col("nrm_a") * F.col("nrm_b"))
    return (
        pairs.join(n1, ["source", "doc_a"])
        .join(n2, ["source", "doc_b"])
        .select(
            "source",
            "doc_a",
            "doc_b",
            # the boolean derives from the ROUNDED cosine: cross-row float
            # sums are order-dependent in the last ulp, so comparing the raw
            # sum to 0.99 could flip between engines within summation noise
            F.round(cos, 4).alias("cosine"),
            (F.round(cos, 4) > 0.99).alias("is_near_dup"),
        )
        .orderBy("source", "doc_a", "doc_b")
    )


@register(
    "q53_tfidf_neardup_filter",
    rf"""
    WITH RECURSIVE docs AS (
        SELECT doc_id, source, lower(text) AS txt,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS idx
        FROM documents WHERE doc_id < 200
    ), grp AS (
        SELECT source, COUNT(*) AS n FROM docs GROUP BY source
    ), tok AS (
        SELECT doc_id, source, u.token
        FROM docs, unnest(regexp_extract_all(txt, '{TOKEN_PATTERN}')) AS u(token)
    ), tf AS (
        SELECT doc_id, source, token, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM tok GROUP BY doc_id, source, token
    ), dfreq AS (
        SELECT source, token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
        FROM tok GROUP BY source, token
    ), w AS (
        SELECT tf.doc_id, tf.source, tf.token,
               tf.tf * (ln((1 + grp.n) / (1 + dfreq.df)) + 1) AS w
        FROM tf JOIN grp USING (source) JOIN dfreq USING (source, token)
    ), norms AS (
        SELECT doc_id, source, sqrt(SUM(w*w)) AS nrm FROM w GROUP BY doc_id, source
    ), pairs AS (
        SELECT w1.source, w1.doc_id AS doc_a, w2.doc_id AS doc_b,
               SUM(w1.w * w2.w) AS dot
        FROM w w1 JOIN w w2
          ON w1.source = w2.source AND w1.token = w2.token
         AND w1.doc_id < w2.doc_id
        GROUP BY w1.source, w1.doc_id, w2.doc_id
    ), simpairs AS (
        -- rounded cosine > threshold (the q49 exactness discipline: both
        -- engines round before comparing, so summation-order ulps can't
        -- flip a greedy decision)
        SELECT p.source, ia.idx AS i, ib.idx AS j
        FROM pairs p
        JOIN norms n1 ON n1.source = p.source AND n1.doc_id = p.doc_a
        JOIN norms n2 ON n2.source = p.source AND n2.doc_id = p.doc_b
        JOIN docs ia ON ia.source = p.source AND ia.doc_id = p.doc_a
        JOIN docs ib ON ib.source = p.source AND ib.doc_id = p.doc_b
        WHERE round(p.dot / (n1.nrm * n2.nrm), 4) > 0.8
    ), sims AS (
        SELECT source, i, j FROM simpairs
        UNION ALL
        SELECT source, j, i FROM simpairs
    ), step AS (
        -- goal_filtering.py's greedy loop as a recursive CTE: one step per
        -- doc (in doc_id order) per source, carrying the keep/remove sets
        SELECT source, CAST(0 AS BIGINT) AS i,
               CAST([] AS BIGINT[]) AS keep, CAST([] AS BIGINT[]) AS rem
        FROM grp
        UNION ALL
        SELECT s.source, s.i + 1,
            CASE WHEN list_contains(s.rem, s.i) THEN s.keep
                 WHEN EXISTS (SELECT 1 FROM sims d
                              WHERE d.source = s.source AND d.i = s.i)
                 THEN list_append(s.keep, s.i) ELSE s.keep END,
            CASE WHEN list_contains(s.rem, s.i) THEN s.rem
                 ELSE list_distinct(s.rem ||
                      COALESCE((SELECT list(d.j) FROM sims d
                                WHERE d.source = s.source AND d.i = s.i),
                               CAST([] AS BIGINT[]))) END
        FROM step s JOIN grp g ON g.source = s.source
        WHERE s.i < g.n
    ), final AS (
        SELECT s.source, s.keep, s.rem
        FROM step s JOIN grp g ON g.source = s.source AND s.i = g.n
    )
    SELECT d.doc_id, d.source
    FROM docs d JOIN final f ON f.source = d.source
    WHERE NOT list_contains(f.rem, d.idx) OR list_contains(f.keep, d.idx)
    ORDER BY d.doc_id
    """,
)
def q53(spark, sf_dir):
    """D3 literal, full semantics: the greedy keep/remove loop of
    goal_filtering.py:8-100 over (source, text) groups via applyInPandas.
    Under the full value-hash oracle since round 4: the cosine threshold
    compares the 4-dp-ROUNDED similarity on both sides (sim_decimals=4 —
    the q62 quantization playbook), and the oracle expresses the greedy
    loop as a DuckDB recursive CTE over the bounded per-group candidate
    lists. Threshold 0.8 so the removal path does real work on this corpus
    (~10% of docs are near-dups at 0.8; at the reference default 0.99 the
    loop is a no-op here). The raw-float reference default stays pinned in
    tests/test_textsim.py."""
    from ..operators.neardup import remove_similar_in_group

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "source", "text")
    )
    kept = remove_similar_in_group(
        docs,
        group_col="source",
        text_col="text",
        threshold=0.8,
        order_col="doc_id",
        sim_decimals=4,
    )
    return kept.select("doc_id", "source").orderBy("doc_id")


@register(
    "q50_t_confidence_interval",
    f"""
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
        FROM events
    ), s AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               AVG(value) AS mean_val, STDDEV_SAMP(value) AS sd
        FROM ranked WHERE rn <= 10 GROUP BY event_type
    )
    SELECT event_type, n, round(mean_val, 6) AS mean_val, round(sd, 6) AS std_dev,
           round(mean_val - {T_CRIT_DF9!r} * sd / sqrt(n), 6) AS ci_lo,
           round(mean_val + {T_CRIT_DF9!r} * sd / sqrt(n), 6) AS ci_hi
    FROM s ORDER BY event_type
    """,
)
def q50(spark, sf_dir):
    """A9 t-distribution CI (stats_utils.py:5-31): mean ± t*(s/sqrt(n)) over
    the first 10 events per type. The t quantile is a from-scratch
    incomplete-beta inversion (functions/stats.py), one scalar literal shared
    with the oracle SQL — exactly the reference's scalar-t shape."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy("event_id")
    )
    s = (
        ev.withColumn("rn", rn)
        .filter(F.col("rn") <= 10)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("mean_val"),
            F.stddev_samp("value").alias("sd"),
        )
    )
    margin = F.lit(T_CRIT_DF9) * F.col("sd") / F.sqrt(F.col("n"))
    return s.select(
        "event_type",
        "n",
        F.round("mean_val", 6).alias("mean_val"),
        F.round("sd", 6).alias("std_dev"),
        F.round(F.col("mean_val") - margin, 6).alias("ci_lo"),
        F.round(F.col("mean_val") + margin, 6).alias("ci_hi"),
    ).orderBy("event_type")


@register(
    "q51_bbox_iou",
    """
    WITH boxes AS (
        SELECT event_id,
               value AS ax1, value / 2 AS ay1,
               value + (user_id % 7) + 1 AS ax2, value / 2 + (event_id % 5) + 1 AS ay2,
               value * 0.8 AS bx1, value * 0.4 AS by1,
               value * 0.8 + ((user_id + 3) % 6) + 2 AS bx2,
               value * 0.4 + ((event_id + 2) % 4) + 2 AS by2
        FROM events WHERE event_id < 200
    ), m AS (
        SELECT event_id,
               greatest(0, least(ax2, bx2) - greatest(ax1, bx1))
                 * greatest(0, least(ay2, by2) - greatest(ay1, by1)) AS inter,
               (ax2 - ax1) * (ay2 - ay1) AS area_a,
               (bx2 - bx1) * (by2 - by1) AS area_b
        FROM boxes
    )
    SELECT event_id,
           CASE WHEN area_a + area_b - inter = 0 THEN 0.0
                ELSE round(inter / (area_a + area_b - inter), 6) END AS iou
    FROM m ORDER BY event_id
    """,
)
def q51(spark, sf_dir):
    """W7 IoU (image_utils.py:289-333): xyxy boxes synthesized per event row,
    intersection/union as pure column arithmetic (identical IEEE per row)."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    v, uid, eid = F.col("value"), F.col("user_id"), F.col("event_id")
    ax1, ay1 = v, v / 2
    ax2, ay2 = v + (uid % 7) + 1, v / 2 + (eid % 5) + 1
    bx1, by1 = v * 0.8, v * 0.4
    bx2, by2 = v * 0.8 + ((uid + 3) % 6) + 2, v * 0.4 + ((eid + 2) % 4) + 2
    inter = F.greatest(F.lit(0), F.least(ax2, bx2) - F.greatest(ax1, bx1)) * F.greatest(
        F.lit(0), F.least(ay2, by2) - F.greatest(ay1, by1)
    )
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    union = area_a + area_b - inter
    return ev.select(
        "event_id",
        F.when(union == 0, 0.0).otherwise(F.round(inter / union, 6)).alias("iou"),
    ).orderBy("event_id")


@register(
    "q52_add_query_param",
    """
    WITH u AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 2 = 0
                    THEN 'https://shop.example.com/item/' || o_orderkey
                    ELSE 'https://shop.example.com/item/' || o_orderkey
                         || '?id=' || o_orderkey END AS url,
               'tok' || o_custkey AS tok
        FROM orders WHERE o_orderkey < 400
    )
    SELECT o_orderkey,
           url || CASE WHEN contains(url, '?') THEN '&' ELSE '?' END
               || 'token=' || tok AS with_param
    FROM u ORDER BY o_orderkey
    """,
)
def q52(spark, sf_dir):
    """C16 add_query_param (auth_utils.py:10-27): the Spark side runs the
    reference-faithful parse/re-encode UDF; on these inputs (well-formed
    URL, key not present) its output provably equals the oracle's append
    — which is what pins the UDF's semantics under the hash gate."""
    from ..functions.urls import add_query_param_udf

    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    okey = F.col("o_orderkey").cast("string")
    url = F.when(
        F.col("o_orderkey") % 2 == 0,
        F.concat(F.lit("https://shop.example.com/item/"), okey),
    ).otherwise(
        F.concat(F.lit("https://shop.example.com/item/"), okey, F.lit("?id="), okey)
    )
    tok = F.concat(F.lit("tok"), F.col("o_custkey").cast("string"))
    return o.select(
        "o_orderkey",
        add_query_param_udf(url, F.lit("token"), tok).alias("with_param"),
    ).orderBy("o_orderkey")
