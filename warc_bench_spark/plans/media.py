"""Multimodal driver-oracle queries (VERDICT r6 item 2).

The M1/M4 family (from-scratch BMP/PPM codecs, the reference's
normalized-MSE screenshot diff — ``/root/reference/src/orby/
trajectory_collector/utils/data_utils.py:45-73``, decode semantics
``digitalagent/utils/image_utils.py:19-120``) was the one first-class
component with pytest-only evidence: every other family holds a
driver-checked CORRECTNESS row. q74 closes that by the by-construction
pattern (q66 markup, q68 language profiles — now pixels): image bytes are
synthesized deterministically from doc_id arithmetic, ENCODED and DECODED
through the real codecs inside Arrow-batched ``mapInPandas`` stages, and
every output column is an integer (or a pure-integer threshold boolean)
that DuckDB re-derives from the same generator arithmetic — the oracle
never sees bytes, so a green row proves encode → sniff → decode → stats
round-trips the exact pixels.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .relational import register, t

# generator parameters (shared by the Spark UDFs and the oracle SQL)
_W = 8          # fixed width
_H_BASE, _H_MOD = 6, 3   # height = 6 + doc_id % 3
_SHIFT, _SHIFT_EVERY = 77, 16  # every 16th doc: pixels shifted +77 (mod 256)
_RESIZE_EVERY = 24             # every 24th doc: after image one row taller
# normalized-MSE threshold 0.01 (data_utils.py:64-69) as a BIGINT
# inequality: mse = ssd / (n*255^2) > 1/100  <=>  100*ssd > n*65025

_Q74_SQL = f"""
    WITH img AS (
      SELECT doc_id,
             {_H_BASE} + doc_id % {_H_MOD} AS h,
             {_W} AS w,
             {_H_BASE} + doc_id % {_H_MOD}
               + CASE WHEN doc_id % {_RESIZE_EVERY} = 0 THEN 1 ELSE 0 END AS ah,
             CASE WHEN doc_id % {_SHIFT_EVERY} = 0 THEN {_SHIFT} ELSE 0 END AS s
      FROM documents),
    px AS (
      SELECT i.doc_id, i.h, i.w, i.ah, c,
             (i.doc_id*31 + y*17 + x*7 + c*101) % 256 AS va,
             (i.doc_id*31 + y*17 + x*7 + c*101 + i.s) % 256 AS vb
      FROM img i,
           unnest(generate_series(0, i.h - 1)) AS ys(y),
           unnest(generate_series(0, i.w - 1)) AS xs(x),
           unnest(generate_series(0, 2)) AS cs(c)),
    agg AS (
      SELECT doc_id, max(h) AS h, max(w) AS w, max(ah) AS ah,
             CAST(sum(va) FILTER (WHERE c = 0) AS BIGINT) AS sum_r,
             CAST(sum(va) FILTER (WHERE c = 1) AS BIGINT) AS sum_g,
             CAST(sum(va) FILTER (WHERE c = 2) AS BIGINT) AS sum_b,
             CASE WHEN max(ah) <> max(h) THEN 0
                  ELSE CAST(sum((va - vb)*(va - vb)) AS BIGINT) END AS ssd_pair
      FROM px GROUP BY doc_id)
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(ah AS INT) AS after_height, sum_r, sum_g, sum_b, ssd_pair,
           (ah <> h OR 100*ssd_pair > h*w*3*65025) AS differs
    FROM agg ORDER BY doc_id
    """


@register("q74_image_pair_stats", _Q74_SQL)
def q74(spark, sf_dir):
    """Screenshot-pair decode + MSE diff under the full value-hash oracle —
    the multimodal family's first driver CORRECTNESS row. Before/after
    image pairs are synthesized by construction (pixel (y,x,c) of doc d =
    (d*31+y*17+x*7+c*101) % 256; every 16th doc's after-image pixel-shifted
    far past the MSE threshold, every 24th resized), ENCODED as real
    BMP/PPM bytes (even docs BMP->PPM, odd PPM->BMP — cross-format pairs),
    then DECODED back via the sniffing dispatch, all in two Arrow
    ``mapInPandas`` stages (operators/multimodal.py::synth_image_pair_bytes
    / image_pair_stats). The differ verdict is ``screenshots_differ``
    (data_utils.py:45-73) re-stated as pure BIGINTs: size mismatch OR
    100*ssd > n*255^2, with TRUE rows from both branches and FALSE rows
    from identical pairs. DuckDB re-derives every column from the generator
    arithmetic alone — a green row proves the codec round-trip bit-exactly.
    Scale shape: per-image granularity in Arrow batches, no shuffle at all
    until the final orderBy; binary columns ride the Arrow transport the
    same way a real screenshot column would."""
    from ..operators.multimodal import synth_image_pair_stats

    d = t(spark, sf_dir, "documents", spread=True)
    # r8 (guide §4): the fused single-stage path — same generate → encode
    # → sniff → decode → stats loop via the same shared helpers as the
    # two-stage operators (equality pinned by test), but the encoded
    # blobs never cross the JVM↔Python boundary
    stats = synth_image_pair_stats(
        d,
        "doc_id",
        width=_W,
        height_base=_H_BASE,
        height_mod=_H_MOD,
        shift=_SHIFT,
        shift_every=_SHIFT_EVERY,
        resize_every=_RESIZE_EVERY,
    )
    n_sub = F.col("height").cast("long") * F.col("width") * F.lit(3)
    return stats.select(
        "doc_id",
        "width",
        "height",
        "after_height",
        "sum_r",
        "sum_g",
        "sum_b",
        "ssd_pair",
        (
            (F.col("after_height") != F.col("height"))
            | (F.lit(100) * F.col("ssd_pair") > n_sub * F.lit(65025))
        ).alias("differs"),
    ).orderBy("doc_id")
