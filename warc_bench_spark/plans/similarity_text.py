"""Batch-2 oracle queries: dedup/similarity/text-analysis pipeline operators.

These are the large-scale training-data-pipeline operators (exact dedup is
in relational.py as q09): MinHash+LSH over shingles, n-gram Jaccard,
SimHash, embedding-cosine ANN, language-ID heuristic, session windows, and
the WARC request↔response join pipeline re-expressed relationally.

Cross-engine exactness: hashes are sha256 strings (identical in Spark and
DuckDB); set minima over strings are order-invariant; dot products cast
float→double elementwise (exact) and fold left-to-right in both engines,
then round(…, 4).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .relational import register, t

NB_SIMHASH_BITS = 8
HEXD = "0123456789abcdef"


# ---------------------------------------------------------------------------
# MinHash over word-trigram shingles + LSH candidate pairs
# ---------------------------------------------------------------------------

_SHINGLE_SQL = """
  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       unnest(generate_series(1, len(ws) - 2)) AS t(i)
"""


def _shingles(spark, sf_dir):
    d = t(spark, sf_dir, "documents", spread=True)
    ws = d.select("doc_id", F.split("text", " ").alias("ws"))
    idx = ws.select(
        "doc_id", "ws", F.explode(F.sequence(F.lit(1), F.size("ws") - 2)).alias("i")
    )
    return idx.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.element_at("ws", F.col("i")),
            F.element_at("ws", F.col("i") + 1),
            F.element_at("ws", F.col("i") + 2),
        ).alias("shingle"),
    )


def _minhash_sig(spark, sf_dir):
    sh = _shingles(spark, sf_dir)
    aggs = [
        F.min(F.sha2(F.concat(F.lit(f"p{i}:"), F.col("shingle")), 256)).alias(f"mh{i}")
        for i in (1, 2, 3, 4)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


_MINHASH_SIG_SQL = f"""
  SELECT doc_id,
         MIN(sha256('p1:' || shingle)) AS mh1,
         MIN(sha256('p2:' || shingle)) AS mh2,
         MIN(sha256('p3:' || shingle)) AS mh3,
         MIN(sha256('p4:' || shingle)) AS mh4
  FROM ({_SHINGLE_SQL}) GROUP BY doc_id
"""


@register(
    "q23_shingle_minhash",
    f"SELECT * FROM ({_MINHASH_SIG_SQL}) ORDER BY doc_id LIMIT 100",
)
def q23(spark, sf_dir):
    """MinHash signatures over word-trigram shingles — the shingle→minhash
    stage of MinHash-LSH near-dup detection (the D3 near-duplicate removal
    of scripts/goal_filtering.py:8-100 re-expressed at web scale)."""
    return _minhash_sig(spark, sf_dir).orderBy("doc_id").limit(100)


@register(
    "q24_lsh_candidate_pairs",
    f"""
    WITH sig AS ({_MINHASH_SIG_SQL}),
    ok AS (
      SELECT mh1, mh2, mh3, mh4 FROM sig
      GROUP BY mh1, mh2, mh3, mh4 HAVING COUNT(*) <= 64),
    bounded AS (SELECT sig.* FROM sig JOIN ok USING (mh1, mh2, mh3, mh4))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bounded a JOIN bounded b
      ON a.mh1 = b.mh1 AND a.mh2 = b.mh2 AND a.mh3 = b.mh3 AND a.mh4 = b.mh4
     AND a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
    """,
)
def q24(spark, sf_dir):
    """LSH banding: docs agreeing on the full 4-hash band are near-dup
    candidates (band→bucket self-join). Buckets above the stop-bucket cap
    are excluded — the guard that keeps a degenerate boilerplate band from
    going quadratic at scale (operators/similarity.py
    banded_candidate_pairs; identical HAVING filter in the oracle)."""
    from ..operators.similarity import banded_candidate_pairs

    sig = _minhash_sig(spark, sf_dir)
    return banded_candidate_pairs(
        sig, ["mh1", "mh2", "mh3", "mh4"], max_bucket_size=64
    ).orderBy("doc_a", "doc_b")


@register(
    "q25_token_jaccard_pairs",
    """
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents WHERE doc_id < 30),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS i
      FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def q25(spark, sf_dir):
    """Exact n-gram (token-set) Jaccard similarity for pairs, thresholded —
    the verification stage after LSH candidate generation."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("i").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("i")
    ).cast("double")
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash_bit_sql(b: int) -> str:
    nib, k = 1 + b // 4, b % 4
    return (
        f"CASE WHEN (CAST(floor((strpos('{HEXD}', substr(h, {nib}, 1)) - 1) "
        f"/ {2 ** k}) AS BIGINT) % 2) = 1 THEN 1 ELSE -1 END"
    )


@register(
    "q26_simhash",
    f"""
    WITH th AS (
      SELECT doc_id, sha256(token) AS h FROM (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> '')
    SELECT doc_id,
           CAST({' + '.join(f"(CASE WHEN SUM({_simhash_bit_sql(b)}) > 0 THEN {2 ** b} ELSE 0 END)" for b in range(NB_SIMHASH_BITS))} AS BIGINT) AS simhash
    FROM th GROUP BY doc_id ORDER BY doc_id LIMIT 200
    """,
)
def q26(spark, sf_dir):
    """SimHash fingerprint: per-bit majority vote over token hashes
    (8-bit variant; the standard near-dup sketch)."""
    d = t(spark, sf_dir, "documents", spread=True)
    toks = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )
    th = toks.select("doc_id", F.sha2("token", 256).alias("h"))

    def bit_vote(b: int):
        nib, k = 1 + b // 4, b % 4
        v = F.instr(F.lit(HEXD), F.substring("h", nib, 1)) - 1
        bit = F.floor(v / (2 ** k)).cast("long") % 2
        return F.when(bit == 1, 1).otherwise(-1)

    aggs = [
        F.when(F.sum(bit_vote(b)) > 0, 2 ** b).otherwise(0).alias(f"_b{b}")
        for b in range(NB_SIMHASH_BITS)
    ]
    per_doc = th.groupBy("doc_id").agg(*aggs)
    total = sum(F.col(f"_b{b}") for b in range(NB_SIMHASH_BITS))
    return (
        per_doc.select("doc_id", total.cast("long").alias("simhash"))
        .orderBy("doc_id")
        .limit(200)
    )


# ---------------------------------------------------------------------------
# Embedding similarity (ANN baseline)
# ---------------------------------------------------------------------------

@register(
    "q27_embedding_knn",
    """
    WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
    dots AS (
      SELECT e.vec_id,
             CAST(list_dot_product(
                 list_transform(CAST(e.embedding AS DOUBLE[]), x -> round(x * 1000)),
                 list_transform(CAST(probe.p AS DOUBLE[]), x -> round(x * 1000))
             ) AS BIGINT) AS dot_q
      FROM embeddings e, probe WHERE e.vec_id <> 0)
    SELECT vec_id, dot_q FROM dots ORDER BY dot_q DESC, vec_id LIMIT 10
    """,
)
def q27(spark, sf_dir):
    """Brute-force dot-product top-k against a probe vector — the ANN
    baseline (JVM-side zip_with/aggregate fold, no Python).

    Components are quantized to a 1/1000 integer grid BEFORE the dot
    product, so the accumulation is exact integer arithmetic in both
    engines and the oracle no longer depends on DuckDB float-summation
    rounding agreeing with Spark's at the 4th decimal."""
    e = t(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("p"))
    joined = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(probe))
    dot_q = F.aggregate(
        F.zip_with(
            "embedding",
            "p",
            lambda a, b: F.round(a.cast("double") * 1000, 0)
            * F.round(b.cast("double") * 1000, 0),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ).cast("long")
    return (
        joined.select("vec_id", dot_q.alias("dot_q"))
        .orderBy(F.desc("dot_q"), "vec_id")
        .limit(10)
    )


@register(
    "q28_embedding_norms_by_label",
    """
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(SUM(CAST(round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6) AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_norm
    FROM embeddings GROUP BY label ORDER BY label
    """,
)
def q28(spark, sf_dir):
    """Vector-norm rollup per label (array fold + decimal-exact sum)."""
    e = t(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.round(F.sqrt(sq), 6)
    return (
        e.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(norm.cast("decimal(18,6)")).cast("double"), 4
            ).alias("total_norm"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Language-ID heuristic + sessionization + WARC join pipeline
# ---------------------------------------------------------------------------

@register(
    "q29_lang_id_heuristic",
    """
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the','a','key','row'))) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio
      FROM documents)
    SELECT CASE WHEN stop_ratio >= 0.05 THEN 'en_like' ELSE 'other' END AS predicted,
           lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM scored GROUP BY predicted, lang ORDER BY predicted, lang
    """,
)
def q29(spark, sf_dir):
    """Language-ID n-gram/stopword heuristic: stopword-ratio classifier,
    cross-tabbed against the labeled lang column."""
    d = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stops = F.filter(toks, lambda x: x.isin("the", "a", "key", "row"))
    ratio = F.size(stops).cast("double") / F.size(toks).cast("double")
    return (
        d.select(
            F.when(ratio >= 0.05, "en_like").otherwise("other").alias("predicted"),
            "lang",
        )
        .groupBy("predicted", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("predicted", "lang")
    )


@register(
    "q30_sessionize",
    """
    WITH flagged AS (
      -- gap compared at SECOND precision on both engines: the Spark side
      -- uses unix_timestamp (whole seconds), so the raw microsecond ts here
      -- would flip boundaries for gaps in (1800s, 1801s)
      SELECT user_id, ts,
             CASE WHEN date_trunc('second', ts)
                       - date_trunc('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events)
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM flagged GROUP BY user_id ORDER BY user_id
    """,
)
def q30(spark, sf_dir):
    """Sessionization: 30-min-gap session boundaries via lag + running sum —
    the W1/W9 window pattern composed."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts is TIMESTAMP_NTZ; epoch-seconds via an explicit ltz hop
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    prev = F.lag(epoch).over(w)
    new_s = F.when(prev.isNull() | (epoch - prev > 1800), 1).otherwise(0)
    return (
        ev.select("user_id", new_s.alias("new_session"))
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "q31_warc_index_join",
    """
    WITH req AS (
      SELECT event_id AS record_id,
             'https://site.example/' || CAST(user_id % 50 AS VARCHAR) AS uri
      FROM events WHERE event_id % 3 = 0),
    resp AS (
      SELECT event_id AS resp_id,
             CASE WHEN event_id % 5 = 1 THEN NULL ELSE event_id - 2 END AS concurrent_to,
             'https://site.example/' || CAST(user_id % 50 AS VARCHAR) AS uri
      FROM events WHERE event_id % 3 = 2),
    direct AS (
      SELECT p.resp_id, r.record_id FROM resp p JOIN req r ON p.concurrent_to = r.record_id),
    leftover AS (SELECT * FROM resp WHERE concurrent_to IS NULL),
    fallback AS (
      SELECT resp_id, record_id FROM (
        SELECT l.resp_id, r.record_id,
               row_number() OVER (PARTITION BY l.resp_id ORDER BY r.record_id) AS rn
        FROM leftover l JOIN req r ON l.uri = r.uri) WHERE rn = 1)
    SELECT CAST((SELECT COUNT(*) FROM direct) AS BIGINT) AS n_direct,
           CAST((SELECT COUNT(*) FROM fallback) AS BIGINT) AS n_fallback,
           CAST((SELECT COUNT(*) FROM leftover) AS BIGINT) AS n_orphan_resp
    """,
)
def q31(spark, sf_dir):
    """The WARC index build re-expressed relationally: request↔response hash
    join on record id (J1, warc-record.ts:26-53) + first-unmatched-wins
    fallback repair join on URI (J2/W8, warc-record.ts:55-79)."""
    ev = t(spark, sf_dir, "events")
    uri = F.concat(F.lit("https://site.example/"), (F.col("user_id") % 50).cast("string"))
    req = ev.filter(F.col("event_id") % 3 == 0).select(
        F.col("event_id").alias("record_id"), uri.alias("uri")
    )
    resp = ev.filter(F.col("event_id") % 3 == 2).select(
        F.col("event_id").alias("resp_id"),
        F.when(F.col("event_id") % 5 == 1, F.lit(None)).otherwise(
            F.col("event_id") - 2
        ).alias("concurrent_to"),
        uri.alias("uri"),
    )
    # record_id (= event_id) is unique, so a LEFT join preserves resp's row
    # count and yields n_direct AND n_orphan in ONE pass — one fewer events
    # scan and one fewer 1x1 crossJoin than aggregating direct/leftover
    # separately (result-identical; the oracle SQL keeps the textbook CTEs)
    matched = resp.join(
        req.select("record_id"),
        resp.concurrent_to == F.col("record_id"),
        "left",
    )
    direct_orphan = matched.agg(
        F.count("record_id").alias("n_direct"),
        F.count(F.when(F.col("concurrent_to").isNull(), 1)).alias("n_orphan_resp"),
    )
    leftover = resp.filter(F.col("concurrent_to").isNull())
    # The oracle's fallback CTE keeps rn=1 per resp_id over the uri join —
    # exactly ONE row per leftover resp that has >= 1 req with the same
    # uri. Its COUNT therefore equals a semi-join count, and the uri
    # domain is tiny (user_id % 50 -> <= 50 values), so the inner join
    # was an exploding |leftover| x |req| / 50 pair blow-up (r7 driver
    # record: 189 s at sf1.0) feeding a window that kept one row per
    # resp_id anyway. The semi-join against the distinct uris computes
    # the identical count with zero fan-out (guide §3: avoid exploding
    # joins; broadcast the provably-small side).
    fallback = leftover.join(req.select("uri").distinct(), "uri", "semi")
    return direct_orphan.crossJoin(
        fallback.agg(F.count(F.lit(1)).alias("n_fallback"))
    ).select("n_direct", "n_fallback", "n_orphan_resp")


# ---------------------------------------------------------------------------
# Winnowing fingerprints (rolling hash, Schleimer/Wilkerson/Aiken 2003)
# ---------------------------------------------------------------------------

WINNOW_K = 8          # character k-gram width
WINNOW_W = 4          # winnowing window (fingerprints = window minima)
WINNOW_MOD = 1_000_000_007
WINNOW_BASE = 131


def _winnow_hash_terms(txt: str, idx: str) -> str:
    """SQL for the k-gram polynomial hash at 1-based position ``idx`` —
    Horner form with a mod after every step so intermediates stay below
    ~1.3e11 (<< BIGINT max) for ANY codepoint up to 0x10FFFF; the plain
    sum-of-powers form overflowed BIGINT on non-ASCII input. Pure integer
    arithmetic, identical expression text in Spark SQL and DuckDB."""
    expr = f"CAST(ascii(substr({txt}, {idx}+{WINNOW_K - 1}, 1)) AS BIGINT)"
    for j in range(WINNOW_K - 2, -1, -1):
        expr = (
            f"(({expr}) * {WINNOW_BASE} + "
            f"CAST(ascii(substr({txt}, {idx}+{j}, 1)) AS BIGINT)) % {WINNOW_MOD}"
        )
    return expr


def winnowing_fingerprints(df, text_col: str, id_col: str):
    """Distinct winnowing fingerprints per document — the rolling-hash
    document-fingerprinting dedup (MOSS algorithm): hash every character
    k-gram, keep the minimum of each w-window. Entirely JVM expression
    trees (sequence/transform/slice/array_min) — no Python, no shuffle
    until the final distinct.

    The k-gram hash array is MATERIALIZED as a column before the window
    transform. Inlining the ``hs`` transform-expression into the windowing
    lambda makes Catalyst re-evaluate the full O(n) hash array once per
    window position — O(n²) per document (round-2 VERDICT measured 47.9 s
    for 50 short docs; materializing drops it ~95x). The DuckDB oracle's
    CTE already does the same."""
    from pyspark.sql import functions as F

    hs = (
        f"transform(sequence(1, length({text_col}) - {WINNOW_K - 1}), "
        f"i -> {_winnow_hash_terms(text_col, 'i')})"
    )
    fps = (
        f"transform(sequence(1, size(_hs) - {WINNOW_W - 1}), "
        f"i -> array_min(slice(_hs, i, {WINNOW_W})))"
    )
    return (
        df.filter(F.length(text_col) >= WINNOW_K + WINNOW_W - 1)
        .withColumn("_hs", F.expr(hs))
        .select(id_col, F.explode(F.expr(fps)).alias("fingerprint"))
        .distinct()
    )


@register(
    "q59_winnowing_fingerprints",
    f"""
    WITH d AS (
      SELECT doc_id, text AS txt FROM documents
      WHERE doc_id < 50 AND length(text) >= {WINNOW_K + WINNOW_W - 1}),
    h AS (
      SELECT doc_id,
             list_transform(range(1, length(txt) - {WINNOW_K} + 2),
                            i -> ({_winnow_hash_terms('txt', 'i')}) % {WINNOW_MOD}) AS hs
      FROM d),
    fp AS (
      SELECT doc_id,
             list_transform(range(1, len(hs) - {WINNOW_W} + 2),
                            i -> list_min(hs[i:i+{WINNOW_W - 1}])) AS fps
      FROM h)
    SELECT DISTINCT doc_id, unnest(fps) AS fingerprint
    FROM fp ORDER BY doc_id, fingerprint
    """,
)
def q59(spark, sf_dir):
    """Rolling-hash document fingerprinting (winnowing): the task brief's
    'document fingerprinting (rolling hash)' in its standard form. At 100 TB
    the fingerprint table joins doc-to-doc on equal fingerprints (bounded
    per-doc set, guaranteed-overlap property for long shared substrings) —
    exact integer arithmetic, identical in both engines."""
    from pyspark.sql import functions as F

    d = (
        t(spark, sf_dir, "documents", spread=True)
        .filter(F.col("doc_id") < 50)
        .select("doc_id", F.col("text").alias("txt"))
    )
    return winnowing_fingerprints(d, "txt", "doc_id").orderBy("doc_id", "fingerprint")


# ---------------------------------------------------------------------------
# ANN under the oracle: integer-quantized banded LSH top-k
# ---------------------------------------------------------------------------
# The float ANN operators (operators/similarity.py lsh_knn / ivf_knn) are
# recall-tested in pytest; this query puts the SAME banded-LSH shape under
# the DuckDB value-hash oracle by quantizing embeddings AND hyperplanes to
# integers (the q27 precedent): every dot product is then exact integer
# arithmetic in double range (|qv|<=500, |qp|<=5000, dim 64 -> |dot| < 2e8
# << 2^53), so bucket membership and the final ranking are bit-identical
# across engines.

ANN_Q = 1000          # quantization scale
ANN_BAND_BITS = 4
ANN_N_BANDS = 2
ANN_TOPK = 5
ANN_N_PROBES = 5
ANN_MAX_BUCKET = 64   # corpus-side stop-bucket cap (same guard as q24)


def _ann_planes() -> list[list[int]]:
    import numpy as np

    rng = np.random.default_rng(7)
    return (
        np.round(rng.standard_normal((ANN_N_BANDS * ANN_BAND_BITS, 64)) * ANN_Q)
        .astype(int)
        .tolist()
    )


def _ann_band_sql(planes, band: int) -> str:
    terms = []
    for k in range(ANN_BAND_BITS):
        p = planes[band * ANN_BAND_BITS + k]
        lit = "[" + ",".join(f"{float(v)!r}" for v in p) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(qv, {lit}) > 0 THEN {1 << k} ELSE 0 END)"
        )
    return " + ".join(terms)


def _q62_sql() -> str:
    planes = _ann_planes()
    return f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * {ANN_Q})) AS qv
      FROM embeddings),
    sig AS (
      SELECT vec_id, qv,
             {_ann_band_sql(planes, 0)} AS s0,
             {_ann_band_sql(planes, 1)} AS s1
      FROM q),
    pb AS (
      SELECT vec_id AS probe_id, qv AS pqv, 0 AS band, s0 AS sig
      FROM sig WHERE vec_id < {ANN_N_PROBES}
      UNION ALL
      SELECT vec_id, qv, 1, s1 FROM sig WHERE vec_id < {ANN_N_PROBES}),
    cb0 AS (
      SELECT vec_id AS cand_id, qv, 0 AS band, s0 AS sig
      FROM sig WHERE vec_id >= {ANN_N_PROBES}
      UNION ALL
      SELECT vec_id, qv, 1, s1 FROM sig WHERE vec_id >= {ANN_N_PROBES}),
    cb AS (
      SELECT cand_id, qv, band, sig FROM (
        SELECT cb0.*, COUNT(*) OVER (PARTITION BY band, sig) AS _bn FROM cb0)
      WHERE _bn <= {ANN_MAX_BUCKET}),
    cand AS (
      SELECT DISTINCT p.probe_id, c.cand_id, c.qv, p.pqv
      FROM pb p JOIN cb c ON p.band = c.band AND p.sig = c.sig),
    scored AS (
      SELECT probe_id, cand_id,
             CAST(list_dot_product(qv, pqv) AS BIGINT) AS dot_q
      FROM cand),
    ranked AS (
      SELECT probe_id, cand_id, dot_q,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY dot_q DESC, cand_id) AS rank
      FROM scored)
    SELECT probe_id, cand_id, dot_q, rank
    FROM ranked WHERE rank <= {ANN_TOPK} ORDER BY probe_id, rank
    """


@register("q62_ann_lsh_topk", _q62_sql())
def q62(spark, sf_dir):
    """Banded-LSH ANN with an exact integer re-rank, fully oracled: quantize,
    signature per band (sign of plane dots), explode to (band, sig) buckets,
    probe-corpus equi-join on the bucket key (never all pairs), exact
    quantized-dot top-k per probe. The bucket join is the 10^10-row scale
    path — candidates per probe are bounded by bucket occupancy."""
    from ..operators.similarity import dot_col, signature_col

    planes = _ann_planes()
    e = t(spark, sf_dir, "embeddings", spread=True)
    qv = F.transform(
        F.col("embedding").cast("array<double>"), lambda x: F.round(x * ANN_Q, 0)
    )
    base = e.select("vec_id", qv.alias("qv"))

    def band_sig(b: int):
        # the SAME signature formula the recall-tested float operator uses
        # (operators/similarity.py::signature_col), fed this band's slice
        # of the quantized planes — one definition, no drift
        sub = [
            [float(v) for v in p]
            for p in planes[b * ANN_BAND_BITS : (b + 1) * ANN_BAND_BITS]
        ]
        return signature_col(F.col("qv"), sub)

    sig = base.select(
        "vec_id",
        "qv",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_sig(b).alias("sig"))
                    for b in range(ANN_N_BANDS)
                ]
            )
        ).alias("_bs"),
    ).select("vec_id", "qv", "_bs.band", "_bs.sig")
    # probes + corpus both read sig — materialize the quantize/signature
    # lambda work once (interpreted higher-order functions are the cost
    # here, not the bytes; r8, guide §5)
    sig = sig.localCheckpoint()
    probes = sig.filter(F.col("vec_id") < ANN_N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("qv").alias("pqv"), "band", "sig"
    )
    # stop-bucket guard (q24's cap, ANN flavor): a degenerate band value at
    # 10^10 rows would make one bucket's candidate fan-out unbounded; such
    # buckets carry no discriminative signal and are dropped — the same
    # unordered window count the dedup path uses, co-partitioned with the
    # bucket join
    corpus = (
        sig.filter(F.col("vec_id") >= ANN_N_PROBES)
        .withColumn(
            "_bn", F.count(F.lit(1)).over(Window.partitionBy("band", "sig"))
        )
        .filter(F.col("_bn") <= ANN_MAX_BUCKET)
        .select(F.col("vec_id").alias("cand_id"), "qv", "band", "sig")
    )
    cand = (
        corpus.join(F.broadcast(probes), ["band", "sig"])
        .select("probe_id", "cand_id", "qv", "pqv")
        .dropDuplicates(["probe_id", "cand_id"])
    )
    scored = cand.select(
        "probe_id",
        "cand_id",
        dot_col(F.col("qv"), F.col("pqv")).cast("long").alias("dot_q"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("dot_q"), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= ANN_TOPK)
        .orderBy("probe_id", "rank")
    )


# embedding-cosine near-dup: LSH-bucketed candidate pairs, verdict by an
# ALL-INTEGER cosine-threshold test (no float compare can flip the hash)
NEARDUP_TAU_NUM = 2  # cosine threshold tau = 2/5 = 0.4
NEARDUP_TAU_DEN = 5


def _q71_sql() -> str:
    planes = _ann_planes()
    t2n, t2d = NEARDUP_TAU_NUM**2, NEARDUP_TAU_DEN**2
    return f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * {ANN_Q})) AS qv
      FROM embeddings),
    qn AS (
      SELECT vec_id, qv, CAST(list_dot_product(qv, qv) AS BIGINT) AS n2
      FROM q),
    sig AS (
      SELECT vec_id, qv, n2,
             {_ann_band_sql(planes, 0)} AS s0,
             {_ann_band_sql(planes, 1)} AS s1
      FROM qn),
    b0 AS (
      SELECT vec_id, qv, n2, 0 AS band, s0 AS sig FROM sig
      UNION ALL
      SELECT vec_id, qv, n2, 1, s1 FROM sig),
    b AS (
      SELECT vec_id, qv, n2, band, sig FROM (
        SELECT b0.*, COUNT(*) OVER (PARTITION BY band, sig) AS _bn FROM b0)
      WHERE _bn <= {ANN_MAX_BUCKET}),
    cand AS (
      SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b,
                      x.qv AS qa, y.qv AS qb, x.n2 AS na2, y.n2 AS nb2
      FROM b x JOIN b y ON x.band = y.band AND x.sig = y.sig
                       AND x.vec_id < y.vec_id)
    SELECT vec_a, vec_b,
           CAST(list_dot_product(qa, qb) AS BIGINT) AS dot_q,
           na2, nb2,
           (CAST(list_dot_product(qa, qb) AS BIGINT) > 0 AND
            {t2d} * CAST(list_dot_product(qa, qb) AS BIGINT)
                  * CAST(list_dot_product(qa, qb) AS BIGINT)
            >= {t2n} * na2 * nb2) AS is_dup
    FROM cand ORDER BY vec_a, vec_b
    """


@register("q71_embed_cosine_neardup", _q71_sql())
def q71(spark, sf_dir):
    """Embedding-cosine near-dup detection, fully oracled: quantize to
    integers (q62's machinery), band into hyperplane-sign buckets, self-
    join candidate pairs inside each bucket (with q24's stop-bucket cap —
    candidates scale with bucket occupancy, never corpus²), then decide
    cosine(a,b) >= tau with the all-integer test

        dot > 0  AND  tau_den^2 * dot^2 >= tau_num^2 * |a|^2 * |b|^2

    so both engines compare exact BIGINTs — no float threshold can
    diverge (the q62/q53 exactness discipline; bounds: |qv_i| <= ~525,
    dot <= 6.4e7, 25*dot^2 <= 1.1e17 < 2^63). This is the embedding
    flavor of the near-dup family (D3): q60 is token-Jaccard, q71 is
    cosine — the pair-scoring stage a dedup-cluster election (q64)
    consumes."""
    from ..operators.similarity import dot_col, signature_col

    planes = _ann_planes()
    e = t(spark, sf_dir, "embeddings", spread=True)
    qv = F.transform(
        F.col("embedding").cast("array<double>"), lambda x: F.round(x * ANN_Q, 0)
    )
    base = e.select("vec_id", qv.alias("qv")).withColumn(
        "n2", dot_col(F.col("qv"), F.col("qv")).cast("long")
    )

    def band_sig(b: int):
        sub = [
            [float(v) for v in p]
            for p in planes[b * ANN_BAND_BITS : (b + 1) * ANN_BAND_BITS]
        ]
        return signature_col(F.col("qv"), sub)

    sig = base.select(
        "vec_id",
        "qv",
        "n2",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_sig(b).alias("sig"))
                    for b in range(ANN_N_BANDS)
                ]
            )
        ).alias("_bs"),
    ).select("vec_id", "qv", "n2", "_bs.band", "_bs.sig")
    # kept + members both read sig — materialize the quantize/signature
    # lambda work once (r8, same rationale as q62)
    sig = sig.localCheckpoint()
    # Plan shape (vs the obvious window + self-join): the stop-bucket
    # guard is a partially-aggregable COUNT, so a degenerate bucket at
    # 10^10 rows is dropped via map-side combine without ever
    # concentrating its raw rows in one task (a count window would);
    # and pairs are enumerated per bucket with JVM higher-order
    # functions over ONE collected member list (<= cap rows by the
    # guard) — one scan, one groupBy, no self-join re-executing the
    # signature subtree twice per side.
    kept = (
        sig.groupBy("band", "sig")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .filter(F.col("_bn") <= ANN_MAX_BUCKET)
        .select("band", "sig")
    )
    members = (
        sig.join(kept, ["band", "sig"])
        .groupBy("band", "sig")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("vec_id", "qv", "n2"))
            ).alias("ms")
        )
    )
    # ascending vec_id inside ms (sort_array on the struct, vec_id
    # first), so (element, any later element) is exactly vec_a < vec_b
    pairs = F.flatten(
        F.transform(
            "ms",
            lambda x, i: F.transform(
                F.slice(F.col("ms"), i + F.lit(2), F.size("ms")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    cand = (
        members.select(F.explode(pairs).alias("p"))
        .select(
            F.col("p.a.vec_id").alias("vec_a"),
            F.col("p.b.vec_id").alias("vec_b"),
            F.col("p.a.qv").alias("qa"),
            F.col("p.b.qv").alias("qb"),
            F.col("p.a.n2").alias("na2"),
            F.col("p.b.n2").alias("nb2"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    dot_q = dot_col(F.col("qa"), F.col("qb")).cast("long")
    t2n, t2d = F.lit(NEARDUP_TAU_NUM**2), F.lit(NEARDUP_TAU_DEN**2)
    return (
        cand.withColumn("dot_q", dot_q)
        .select(
            "vec_a",
            "vec_b",
            "dot_q",
            "na2",
            "nb2",
            (
                (F.col("dot_q") > 0)
                & (
                    t2d * F.col("dot_q") * F.col("dot_q")
                    >= t2n * F.col("na2") * F.col("nb2")
                )
            ).alias("is_dup"),
        )
        .orderBy("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# End-to-end near-dup pipeline: LSH candidates -> exact Jaccard verify
# ---------------------------------------------------------------------------

@register(
    "q60_lsh_jaccard_dedup",
    f"""
    WITH sig AS ({_MINHASH_SIG_SQL}),
    ok AS (
      SELECT mh1, mh2, mh3, mh4 FROM sig
      GROUP BY mh1, mh2, mh3, mh4 HAVING COUNT(*) <= 64),
    bounded AS (SELECT sig.* FROM sig JOIN ok USING (mh1, mh2, mh3, mh4)),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bounded a JOIN bounded b
        ON a.mh1 = b.mh1 AND a.mh2 = b.mh2 AND a.mh3 = b.mh3 AND a.mh4 = b.mh4
       AND a.doc_id < b.doc_id),
    toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS i
      FROM cand c
      JOIN toks ta ON ta.doc_id = c.doc_a
      JOIN toks tb ON tb.doc_id = c.doc_b AND tb.token = ta.token
      GROUP BY c.doc_a, c.doc_b)
    SELECT c.doc_a, c.doc_b,
           round(CAST(COALESCE(i, 0) AS DOUBLE)
                 / CAST(sa.n + sb.n - COALESCE(i, 0) AS DOUBLE), 6) AS jaccard,
           round(CAST(COALESCE(i, 0) AS DOUBLE)
                 / CAST(sa.n + sb.n - COALESCE(i, 0) AS DOUBLE), 6) >= 0.5 AS is_dup
    FROM cand c
    LEFT JOIN inter USING (doc_a, doc_b)
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
    ORDER BY doc_a, doc_b
    """,
)
def q60(spark, sf_dir):
    """The real 100-TB dedup pipeline shape, end to end: MinHash signatures
    -> capped LSH band self-join (q24's candidate generator) -> exact
    token-set Jaccard verification OVER THOSE CANDIDATES ONLY (q25's verify
    stage, no longer bounded by a doc_id slice). The verify cost scales with
    the candidate count, not the corpus squared. ``is_dup`` compares the
    ROUNDED jaccard so the boolean can't flip on cross-engine float noise."""
    from ..operators.similarity import banded_candidate_pairs

    sig = _minhash_sig(spark, sf_dir)
    cand = banded_candidate_pairs(sig, ["mh1", "mh2", "mh3", "mh4"], max_bucket_size=64)
    # token sets feed THREE consumers (sizes + both intersection sides);
    # materialize the explode+distinct once (r8, guide §5 — the same
    # localCheckpoint discipline as operators/spans.py)
    toks = (
        t(spark, sf_dir, "documents", spread=True)
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .distinct()
        .localCheckpoint()
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ta = toks.select(F.col("doc_id").alias("doc_a"), "token")
    tb = toks.select(F.col("doc_id").alias("doc_b"), "token")
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "token"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    i0 = F.coalesce(F.col("i"), F.lit(0)).cast("double")
    jac = F.round(i0 / (F.col("na") + F.col("nb") - i0).cast("double"), 6)
    return (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            jac.alias("jaccard"),
            (jac >= 0.5).alias("is_dup"),
        )
        .orderBy("doc_a", "doc_b")
    )


@register(
    "q64_dedup_components",
    f"""
    WITH RECURSIVE sig AS ({_MINHASH_SIG_SQL}),
    ok AS (
      SELECT mh1, mh2, mh3, mh4 FROM sig
      GROUP BY mh1, mh2, mh3, mh4 HAVING COUNT(*) <= 64),
    bounded AS (SELECT sig.* FROM sig JOIN ok USING (mh1, mh2, mh3, mh4)),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bounded a JOIN bounded b
        ON a.mh1 = b.mh1 AND a.mh2 = b.mh2 AND a.mh3 = b.mh3 AND a.mh4 = b.mh4
       AND a.doc_id < b.doc_id),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM p
      UNION
      SELECT doc_b AS a, doc_a AS b FROM p),
    verts AS (SELECT DISTINCT a AS id FROM edges),
    reach AS (
      -- transitive closure to a fixpoint (UNION dedups, so the recursion
      -- terminates); min reachable id == the min-label-propagation result
      SELECT id AS a, id AS b FROM verts
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b)
    SELECT a AS doc_id, MIN(b) AS component, a = MIN(b) AS is_canonical
    FROM reach GROUP BY a ORDER BY doc_id
    """,
)
def q64(spark, sf_dir):
    """Dedup-cluster election — the step that turns candidate PAIRS into
    duplicate CLUSTERS with one canonical survivor each (the at-scale
    counterpart of goal_filtering.py's keep-first rule; min doc id per
    component = keep-first under the corpus order). The edge set is the
    band-bucket STAR graph (banded_star_edges: doc ↔ bucket-min — same
    components as q24's clique pairs with |E| linear, no self-join);
    components via min-label propagation (operators/components.py —
    join+groupBy rounds, sum-monotone convergence check), seeded with the
    bucket minimum so the clique-shaped common case converges in one
    confirming round. The oracle computes the identical fixpoint from the
    PAIR graph as a recursive-CTE transitive closure — equality of the two
    edge formulations is exactly the clique≡star components claim."""
    from ..operators.components import connected_components
    from ..operators.similarity import banded_star_edges

    sig = _minhash_sig(spark, sf_dir)
    edges = banded_star_edges(
        sig, ["mh1", "mh2", "mh3", "mh4"], max_bucket_size=64
    ).persist()
    seeds = edges.select(F.col("doc_a").alias("id"), F.col("doc_b").alias("comp"))
    cc = connected_components(edges, "doc_a", "doc_b", init=seeds)
    edges.unpersist()
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("component"),
        (F.col("id") == F.col("comp")).alias("is_canonical"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Exact substring-span dedup (Lee et al. 2022 ExactSubstr, seed-and-extend)
# ---------------------------------------------------------------------------

SPAN_K = 6
SPAN_MIN_TOKENS = 8
SPAN_GRAM_CAP = 16


@register(
    "q67_duplicate_spans",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    g AS (
      SELECT doc_id, unnest(generate_series(1, len(t) - {SPAN_K} + 1)) AS i, t
      FROM toks WHERE len(t) >= {SPAN_K}),
    grams AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(t[i:i+{SPAN_K - 1}], ' ') AS gram FROM g),
    keep AS (
      SELECT gram FROM (
        SELECT gram, count(distinct doc_id) AS nd FROM grams GROUP BY gram)
      WHERE nd BETWEEN 2 AND {SPAN_GRAM_CAP}),
    seeds AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb,
             a.pos - b.pos AS diag
      FROM grams a JOIN grams b USING (gram) JOIN keep USING (gram)
      WHERE a.doc_id < b.doc_id),
    isl AS (
      SELECT *, CASE WHEN pa - lag(pa) OVER w = 1 THEN 0 ELSE 1 END AS brk
      FROM seeds WINDOW w AS (PARTITION BY doc_a, doc_b, diag ORDER BY pa)),
    runs AS (
      SELECT *, sum(brk) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa
                               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM isl)
    SELECT doc_a, doc_b,
           CAST(min(pa) AS BIGINT) AS a_start,
           CAST(min(pb) AS BIGINT) AS b_start,
           CAST(max(pa) + {SPAN_K} - min(pa) AS BIGINT) AS len_tokens
    FROM runs GROUP BY doc_a, doc_b, diag, run_id
    HAVING max(pa) + {SPAN_K} - min(pa) >= {SPAN_MIN_TOKENS}
    ORDER BY doc_a, doc_b, a_start, b_start
    """,
)
def q67(spark, sf_dir):
    """Exact substring-span dedup — maximal cross-document duplicate token
    runs (the missing tier between exact-doc q09 and near-dup q60/q64;
    Lee et al. 2022 ExactSubstr semantics, seed-and-extend formulation).
    The oracle re-derives the identical spans from the gram STRINGS with
    the same stop-cap and diagonal-island windows, so the green row proves
    both the hashing prefilter (collision-free here by the exact-verify
    join) and the island/extension algebra. Scale notes in
    operators/spans.py — no all-pairs anywhere; seed fan-out is bounded by
    the gram cap."""
    from ..operators.spans import duplicate_spans

    d = t(spark, sf_dir, "documents", spread=True)
    return duplicate_spans(
        d,
        "doc_id",
        "text",
        k=SPAN_K,
        min_tokens=SPAN_MIN_TOKENS,
        max_docs_per_gram=SPAN_GRAM_CAP,
    ).orderBy("doc_a", "doc_b", "a_start", "b_start")


# ---------------------------------------------------------------------------
# Trained char-bigram Naive Bayes language ID (the q29 heuristic upgraded
# to a real model; operators/langid.py)
# ---------------------------------------------------------------------------

from ..operators.langid import LANGS as _NB_LANGS  # noqa: E402
from ..operators.langid import N_SLOTS as _NB_SLOTS  # noqa: E402
from ..operators.langid import PROFILES as _NB_PROFILES  # noqa: E402

_NB_CHARS = 120
_NB_TEST_MOD = 7  # held-out fold: coprime with len(LANGS) so every
#                   language appears in BOTH splits

_NB_LANG_LIST = "[" + ", ".join(f"'{l}'" for l in _NB_LANGS) + "]"
_NB_PROF_VALUES = ", ".join(f"('{l}', '{_NB_PROFILES[l]}')" for l in _NB_LANGS)

_Q68_SQL = f"""
    WITH profiles(lang, prof) AS (VALUES {_NB_PROF_VALUES}),
    corpus AS (
      SELECT d.doc_id,
             p.lang,
             array_to_string(list_transform(generate_series(0, {_NB_CHARS - 1}),
               i -> substr(p.prof,
                 CAST((d.doc_id * 131 + i * 7919 + i * i) % {_NB_SLOTS} AS INT) + 1,
                 1)), '') AS text
      FROM documents d
      JOIN profiles p
        ON p.lang = ({_NB_LANG_LIST})[CAST(d.doc_id % {len(_NB_LANGS)} AS INT) + 1]),
    grams AS (
      SELECT doc_id, lang, substr(text, j, 2) AS gram
      FROM corpus, unnest(generate_series(1, length(text) - 1)) AS u(j)),
    counts AS (
      SELECT lang, gram, count(*) AS c FROM grams
      WHERE doc_id % {_NB_TEST_MOD} <> 0 GROUP BY 1, 2),
    vocab AS (SELECT DISTINCT gram FROM counts),
    totals AS (SELECT lang, sum(c) AS tot FROM counts GROUP BY 1),
    model AS (
      SELECT t.lang, v.gram,
             ln((coalesce(c.c, 0) + 1.0)
                / (t.tot + (SELECT count(*) FROM vocab))) AS logp
      FROM totals t CROSS JOIN vocab v
      LEFT JOIN counts c ON c.lang = t.lang AND c.gram = v.gram),
    scored AS (
      SELECT g.doc_id, g.lang AS true_lang, m.lang AS cand_lang,
             sum(m.logp) AS score
      FROM grams g JOIN model m ON m.gram = g.gram
      WHERE g.doc_id % {_NB_TEST_MOD} = 0
      GROUP BY 1, 2, 3),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, cand_lang ASC) AS rk
      FROM scored)
    SELECT doc_id, true_lang, cand_lang AS pred_lang,
           (cand_lang = true_lang) AS is_correct
    FROM ranked WHERE rk = 1 ORDER BY doc_id
    """


@register("q68_langid_nb", _Q68_SQL)
def q68(spark, sf_dir):
    """Language ID as a TRAINED model (multinomial Naive Bayes over char
    bigrams) rather than the q29 heuristic — train and predict are both
    pure DataFrame algebra (operators/langid.py), the model is a
    broadcastable langs x vocab table, and the labeled corpus is
    synthesized by-construction from doc_id arithmetic so DuckDB
    re-derives the identical train/test splits and the oracle value-checks
    the whole train->predict pipeline. Output columns are all
    integral/categorical; the double-valued NB scores only feed the
    per-doc argmax, whose margins (hundreds of nats by profile
    construction) dwarf cross-engine float-summation noise."""
    from ..operators.langid import synth_labeled_corpus, train_predict_langid

    d = t(spark, sf_dir, "documents", spread=True)
    corpus = synth_labeled_corpus(d, "doc_id", n_chars=_NB_CHARS)
    return train_predict_langid(corpus, n=2, test_mod=_NB_TEST_MOD).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Span excision — the ExactSubstr dedup ACTION (q67 finds the duplicate
# runs; this removes them from the later document, keep-first)
# ---------------------------------------------------------------------------

_Q69_SQL = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= {SPAN_K}),
    g AS (
      SELECT doc_id, unnest(generate_series(1, len(t) - {SPAN_K} + 1)) AS i, t
      FROM toks),
    grams AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(t[i:i+{SPAN_K - 1}], ' ') AS gram FROM g),
    keep AS (
      SELECT gram FROM (
        SELECT gram, count(distinct doc_id) AS nd FROM grams GROUP BY gram)
      WHERE nd BETWEEN 2 AND {SPAN_GRAM_CAP}),
    seeds AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb,
             a.pos - b.pos AS diag
      FROM grams a JOIN grams b USING (gram) JOIN keep USING (gram)
      WHERE a.doc_id < b.doc_id),
    isl AS (
      SELECT *, CASE WHEN pa - lag(pa) OVER w = 1 THEN 0 ELSE 1 END AS brk
      FROM seeds WINDOW w AS (PARTITION BY doc_a, doc_b, diag ORDER BY pa)),
    runs AS (
      SELECT *, sum(brk) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa
                               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM isl),
    spans AS (
      SELECT doc_b, min(pb) AS b_start,
             max(pa) + {SPAN_K} - min(pa) AS len_tokens
      FROM runs GROUP BY doc_a, doc_b, diag, run_id
      HAVING max(pa) + {SPAN_K} - min(pa) >= {SPAN_MIN_TOKENS}),
    allt AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    pos AS (
      SELECT doc_id, unnest(generate_series(1, len(t))) AS i, t FROM allt),
    cut AS (
      SELECT DISTINCT p.doc_id, p.i
      FROM pos p JOIN spans s ON s.doc_b = p.doc_id
       AND p.i - 1 >= s.b_start AND p.i - 1 < s.b_start + s.len_tokens),
    kept AS (
      SELECT p.doc_id, p.i, p.t[p.i] AS tok
      FROM pos p LEFT JOIN cut c ON c.doc_id = p.doc_id AND c.i = p.i
      WHERE c.i IS NULL)
    SELECT a.doc_id AS doc_id,
           coalesce(string_agg(k.tok, ' ' ORDER BY k.i), '') AS clean_text,
           CAST(len(a.t) - count(k.i) AS BIGINT) AS n_removed
    FROM allt a LEFT JOIN kept k ON k.doc_id = a.doc_id
    GROUP BY a.doc_id, len(a.t)
    ORDER BY a.doc_id
    """


# ---------------------------------------------------------------------------
# Benchmark decontamination — the asymmetric ExactSubstr variant (flag
# training docs sharing a verbatim run with a benchmark suite); the probe
# "benchmark" is synthesized by construction as a token slice of every
# 17th document, so contamination is guaranteed to exist and DuckDB
# re-derives the identical probe corpus from the same parquet column
# ---------------------------------------------------------------------------

_Q75_BENCH_MOD = 17  # every 17th doc donates tokens 3..42 to the "benchmark"
_Q75_SLICE = (3, 40)  # 1-based start, length — a PROPER substring probe

_Q75_SQL = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    ct AS (SELECT doc_id, t FROM toks WHERE len(t) >= {SPAN_K}),
    bt AS (
      SELECT doc_id AS bench_id,
             t[{_Q75_SLICE[0]}:{_Q75_SLICE[0] + _Q75_SLICE[1] - 1}] AS b
      FROM toks WHERE doc_id % {_Q75_BENCH_MOD} = 0
        AND len(t[{_Q75_SLICE[0]}:{_Q75_SLICE[0] + _Q75_SLICE[1] - 1}]) >= {SPAN_K}),
    cg AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+{SPAN_K - 1}], ' ') AS gram
      FROM (SELECT doc_id, unnest(generate_series(1, len(t) - {SPAN_K} + 1)) AS i, t
            FROM ct)),
    bg AS (
      SELECT bench_id, i - 1 AS bpos, array_to_string(b[i:i+{SPAN_K - 1}], ' ') AS gram
      FROM (SELECT bench_id, unnest(generate_series(1, len(b) - {SPAN_K} + 1)) AS i, b
            FROM bt)),
    keep AS (
      SELECT gram FROM (
        SELECT gram, count(distinct doc_id) AS nd FROM cg GROUP BY gram)
      WHERE nd <= {SPAN_GRAM_CAP}),
    seeds AS (
      SELECT c.doc_id, b.bench_id, c.pos, b.bpos, c.pos - b.bpos AS diag
      FROM cg c JOIN keep USING (gram) JOIN bg b USING (gram)),
    isl AS (
      SELECT *, CASE WHEN pos - lag(pos) OVER w = 1 THEN 0 ELSE 1 END AS brk
      FROM seeds WINDOW w AS (PARTITION BY doc_id, bench_id, diag ORDER BY pos)),
    runs AS (
      SELECT *, sum(brk) OVER (PARTITION BY doc_id, bench_id, diag ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM isl),
    spans AS (
      SELECT doc_id, bench_id, max(pos) + {SPAN_K} - min(pos) AS len_tokens
      FROM runs GROUP BY doc_id, bench_id, diag, run_id
      HAVING max(pos) + {SPAN_K} - min(pos) >= {SPAN_MIN_TOKENS})
    SELECT doc_id,
           CAST(count(distinct bench_id) AS BIGINT) AS n_bench_docs,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(max(len_tokens) AS BIGINT) AS max_run_tokens
    FROM spans GROUP BY doc_id ORDER BY doc_id
    """


@register("q75_benchmark_decontam", _Q75_SQL)
def q75(spark, sf_dir):
    """Benchmark-decontamination join — the one production dedup
    APPLICATION the family lacked (VERDICT r6 item 5): flag training
    documents sharing a verbatim >= min_tokens token run with any
    benchmark document (the GPT-3/PaLM appendix n-gram-overlap recipe).
    Asymmetric reuse of the q67 machinery (operators/spans.py::
    contaminated_docs): the PROBE side's gram table is bounded by the
    benchmark suite's size — a structural bound, independent of corpus
    size and duplication — so broadcasting THAT side is correct, exactly
    where q67's span-set broadcast was the r6 scale defect. The probe
    corpus is a by-construction token slice of every 17th document, so
    the oracle re-derives both sides from the same parquet column and
    value-checks seeds, islands, and the per-doc contamination report."""
    from ..operators.spans import contaminated_docs

    d = t(spark, sf_dir, "documents", spread=True)
    bench = d.filter(F.col("doc_id") % _Q75_BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(
            " ",
            F.expr(f"slice(split(text, ' '), {_Q75_SLICE[0]}, {_Q75_SLICE[1]})"),
        ).alias("text"),
    )
    return contaminated_docs(
        d,
        bench,
        "doc_id",
        "text",
        "bench_id",
        "text",
        k=SPAN_K,
        min_tokens=SPAN_MIN_TOKENS,
        max_docs_per_gram=SPAN_GRAM_CAP,
    ).orderBy("doc_id")


@register("q69_excise_spans", _Q69_SQL)
def q69(spark, sf_dir):
    """Span excision — turns q67's duplicate-run REPORT into the dedup
    ACTION (Lee et al. 2022 ExactSubstr: remove every shared run from all
    but one occurrence). Pairwise spans carry doc_a < doc_b, so cutting
    each run from doc_b leaves exactly the lowest doc id holding the text
    — the same keep-first rule as q53/q64. Every input document comes back
    (clean_text = surviving tokens rejoined with single spaces, n_removed
    = excised token count); the coverage test is one JVM filter/exists
    lambda over the split array with the cap-bounded cut list
    broadcast-joined in — no corpus shuffle, no Python
    (operators/spans.py::excise_spans). The oracle re-derives the spans
    from gram STRINGS (the q67 chain) and replays the excision as a
    position anti-join, so the green row value-checks find AND remove
    end-to-end."""
    from ..operators.spans import duplicate_spans, excise_spans

    d = t(spark, sf_dir, "documents", spread=True)
    spans = duplicate_spans(
        d,
        "doc_id",
        "text",
        k=SPAN_K,
        min_tokens=SPAN_MIN_TOKENS,
        max_docs_per_gram=SPAN_GRAM_CAP,
    )
    return excise_spans(d, spans, "doc_id", "text").orderBy("doc_id")
