"""Multimodal (image/audio/video) column plumbing.

The reference carries media as opaque binary cells — JPEG screenshots in
``WebState.viewport`` (``/root/reference/src/orby/protos/action_data.proto:
21-24``, encode path ``record_utils.py:445-481``) and ``image_url`` refs in
the interleaved ``LLMContent`` (``llm_data.proto:7-17``). Our engine keeps
the same contract: media are ``binary`` (or ``media_ref`` pointer) columns
with typed metadata, and decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages.

Decode backends:

* ``'numpy'`` (real bytes) — ``decode_media_meta_bytes`` /
  ``extract_media_features_bytes`` / ``screenshots_differ_df`` decode
  actual binary columns with the from-scratch codecs in
  ``functions/codecs.py`` (uncompressed BMP/PPM/WAV): real pixels and
  samples, real width/height/frame counts, real per-channel statistics,
  and the reference's normalized-MSE screenshot diff
  (``data_utils.py:45-73``).
* ``'fake'`` — deterministic sha-derived outputs for plumbing tests on
  ref-only (no-bytes) corpora.
* ``'real'`` — the ref-based probes (no bytes column) need a blob store,
  which stays the one un-gateable boundary here. For BYTES columns every
  compressed format is availability-gated, never faked: JPEG/PNG on
  ``codecs.pil_available()`` (reference ``image_utils.py`` semantics) and
  MP4 frame decode on ``codecs.video_available()`` (imageio[ffmpeg] or
  PyAV probe) — real clusters with the lib installed get real decode;
  this sandbox raises NotImplementedError exactly at those boundaries.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("media_type", StringType()),   # image/jpeg, video/mp4, ...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _fake_decode(ref: str) -> np.ndarray:
    """Deterministic stand-in for a codec: 8 floats derived from the ref
    hash. A real backend replaces exactly this function."""
    h = hashlib.sha256(ref.encode()).digest()
    return np.frombuffer(h[:32], dtype=np.uint8).reshape(8, 4).mean(axis=1) / 255.0


def decode_media_meta(docs: DataFrame, backend: str = "fake") -> DataFrame:
    """media spans -> typed metadata rows (one per media cell).

    Plumbing is real (explode + mapInPandas over Arrow batches); only the
    byte-level probe is backend-dependent.
    """
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend == "real":
                raise NotImplementedError(
                    "real media probing needs an image/video codec (PIL/ffmpeg) "
                    "— not available in this environment; plug it in here"
                )
            h = pdf["media_ref"].map(
                lambda r: int(hashlib.sha256(r.encode()).hexdigest()[:8], 16)
            )
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": np.where(h % 4 == 0, "video/mp4", "image/jpeg"),
                    "width": (64 + h % 1920).astype("int32"),
                    "height": (64 + (h // 7) % 1080).astype("int32"),
                    "n_frames": np.where(h % 4 == 0, (1 + h % 240), 1).astype("int32"),
                }
            )

    return refs.mapInPandas(probe, MEDIA_META_SCHEMA)


def extract_media_features(docs: DataFrame, backend: str = "fake") -> DataFrame:
    """media cells -> fixed-width float feature vectors (Arrow-batched)."""
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend == "real":
                raise NotImplementedError("plug a real feature extractor in here")
            feats = [
                [float(x) for x in _fake_decode(r)] for r in pdf["media_ref"]
            ]
            yield pd.DataFrame({"media_ref": pdf["media_ref"], "feature": feats})

    return refs.mapInPandas(featurize, FEATURES_SCHEMA)


def decode_media_meta_bytes(
    media: DataFrame, ref_col: str = "media_ref", bytes_col: str = "content"
) -> DataFrame:
    """Real-bytes metadata probe: sniff + decode with the from-scratch
    numpy codecs (BMP/PPM images, PCM WAV audio). For audio, ``n_frames``
    carries the sample count and width/height are null."""
    from ..functions import codecs

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_ref": [], "media_type": [], "width": [], "height": [], "n_frames": []}
            for ref, blob in zip(pdf[ref_col], pdf[bytes_col]):
                data = bytes(blob)
                kind = codecs.sniff_media_type(data)
                w = h = n = None
                if codecs.image_decodable(kind):
                    # BMP/PPM always; JPEG/PNG when the PIL-gated backend
                    # is available (codecs.pil_available)
                    img = codecs.decode_image(data)
                    h, w, n = img.shape[0], img.shape[1], 1
                elif kind == "audio/wav":
                    samples, _rate = codecs.decode_wav(data)
                    n = int(samples.shape[0])
                elif codecs.video_decodable(kind):
                    # MP4 when the ffmpeg-gated backend is available
                    # (codecs.video_available); without it the row keeps
                    # its sniffed type with null dims — degraded, not fake
                    frames, n = codecs.decode_video_frames(data, every_n=1 << 30)
                    if frames:
                        h, w = frames[0].shape[0], frames[0].shape[1]
                out["media_ref"].append(ref)
                out["media_type"].append(kind)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(n)
            yield pd.DataFrame(out).astype(
                {"width": "Int32", "height": "Int32", "n_frames": "Int32"}
            )

    return media.select(
        F.col(ref_col).alias(ref_col), F.col(bytes_col).alias(bytes_col)
    ).mapInPandas(probe, MEDIA_META_SCHEMA)


def extract_media_features_bytes(
    media: DataFrame, ref_col: str = "media_ref", bytes_col: str = "content"
) -> DataFrame:
    """Real-bytes features: images -> [mean R, mean G, mean B, pixel std,
    h/4096, w/4096, aspect, 0]; audio -> [rms, mean, peak, zero-cross rate,
    seconds, channels, 0, 1] (all computed from decoded pixels/samples)."""
    from ..functions import codecs

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, feats = [], []
            for ref, blob in zip(pdf[ref_col], pdf[bytes_col]):
                data = bytes(blob)
                kind = codecs.sniff_media_type(data)
                if kind == "audio/wav":
                    samples, rate = codecs.decode_wav(data)
                    x = samples.astype(np.float64) / 32768.0
                    zc = float(np.mean(np.abs(np.diff(np.signbit(x[:, 0]).astype(np.int8)))))
                    f = [
                        float(np.sqrt(np.mean(x**2))),
                        float(np.mean(x)),
                        float(np.max(np.abs(x))),
                        zc,
                        samples.shape[0] / rate,
                        float(samples.shape[1]),
                        0.0,
                        1.0,
                    ]
                else:
                    img = codecs.decode_image(data).astype(np.float64) / 255.0
                    h, w = img.shape[:2]
                    f = [
                        float(img[:, :, 0].mean()),
                        float(img[:, :, 1].mean()),
                        float(img[:, :, 2].mean()),
                        float(img.std()),
                        h / 4096.0,
                        w / 4096.0,
                        h / w,
                        0.0,
                    ]
                refs.append(ref)
                feats.append([float(v) for v in f])
            yield pd.DataFrame({"media_ref": refs, "feature": feats})

    return media.select(
        F.col(ref_col).alias(ref_col), F.col(bytes_col).alias(bytes_col)
    ).mapInPandas(featurize, FEATURES_SCHEMA)


def screenshots_differ_df(
    pairs: DataFrame,
    a_col: str = "before",
    b_col: str = "after",
    image_mse_threshold: float = 0.01,
) -> DataFrame:
    """M1 screenshot diff over real bytes: one boolean per (before, after)
    binary pair, with data_utils.py:45-73 semantics (size mismatch or
    normalized MSE above threshold -> changed)."""
    from ..functions import codecs

    keep = [c for c in pairs.columns if c not in (a_col, b_col)]

    def diff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            changed = [
                codecs.screenshots_differ(
                    codecs.decode_image(bytes(a)),
                    codecs.decode_image(bytes(b)),
                    image_mse_threshold=image_mse_threshold,
                )
                for a, b in zip(pdf[a_col], pdf[b_col])
            ]
            out = pdf[keep].copy()
            out["changed"] = changed
            yield out

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in pairs.schema
        if f.name in keep
    )
    return pairs.mapInPandas(diff, out_schema + ", changed boolean")


def web_states_differ_df(
    pairs: DataFrame,
    url_a: str = "url_a",
    url_b: str = "url_b",
    shot_a: str = "shot_a",
    shot_b: str = "shot_b",
    axtree_a: str = "axtree_a",
    axtree_b: str = "axtree_b",
    image_mse_threshold: float = 0.01,
    axtree_similarity_threshold: float = 0.9999,
    max_axtree_length: int = 50_000,
) -> DataFrame:
    """M3 literal form — ``data_utils.py:103-152`` ``web_states_differ``:
    two web states differ if the URL changed, OR the screenshots differ by
    normalized MSE, OR the AXTrees' SequenceMatcher ratio falls below the
    threshold. Short-circuits in that order, exactly like the reference
    (the expensive difflib ratio only runs for same-URL same-screenshot
    pairs). One Arrow batch stage; screenshots decode with the from-scratch
    codecs (uncompressed formats)."""
    from ..functions import codecs
    from ..functions.textsim import axtrees_differ

    keep = [
        c
        for c in pairs.columns
        if c not in (url_a, url_b, shot_a, shot_b, axtree_a, axtree_b)
    ]

    def diff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            changed = []
            for ua, ub, sa, sb, ta, tb in zip(
                pdf[url_a], pdf[url_b], pdf[shot_a], pdf[shot_b],
                pdf[axtree_a], pdf[axtree_b],
            ):
                if ua != ub:
                    changed.append(True)
                    continue
                if codecs.screenshots_differ(
                    codecs.decode_image(bytes(sa)),
                    codecs.decode_image(bytes(sb)),
                    image_mse_threshold,
                ):
                    changed.append(True)
                    continue
                changed.append(
                    axtrees_differ(
                        ta, tb, axtree_similarity_threshold, max_axtree_length
                    )
                )
            out = pdf[keep].copy()
            out["changed"] = changed
            yield out

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in pairs.schema if f.name in keep
    )
    return pairs.mapInPandas(diff, out_schema + ", changed boolean")


FRAME_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("frame_index", IntegerType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("mean_rgb", ArrayType(FloatType())),
    ]
)


def sample_video_frames_bytes(
    media: DataFrame,
    every_n: int = 30,
    ref_col: str = "media_ref",
    bytes_col: str = "content",
    backend: str = "real",
) -> DataFrame:
    """Video bytes -> one row per sampled frame (every ``every_n``-th frame
    in decode order, deterministic — the M4 frame-sampling stage).

    ``backend='real'`` decodes with the ffmpeg-gated codec
    (``codecs.decode_video_frames``); where no backend exists the task
    raises at that documented boundary. ``backend='fake'`` produces
    sha-derived frames with the SAME schema and sampling pattern so the
    Spark plumbing (mapInPandas batching, per-frame fan-out, schema) is
    exercised end-to-end in codec-less environments.
    """
    import hashlib as _hl

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_ref": [], "frame_index": [], "height": [],
                   "width": [], "mean_rgb": []}
            for ref, blob in zip(pdf[ref_col], pdf[bytes_col]):
                if backend == "fake":
                    h = int(_hl.sha256(str(ref).encode()).hexdigest()[:8], 16)
                    n_frames, fh, fw = 1 + h % 240, 64 + h % 256, 64 + (h // 7) % 256
                    frames = [
                        (
                            i,
                            fh,
                            fw,
                            [
                                float(b) / 255.0
                                for b in _hl.sha256(
                                    f"{ref}#{i}".encode()
                                ).digest()[:3]
                            ],
                        )
                        for i in range(0, n_frames, every_n)
                    ]
                else:
                    from ..functions import codecs

                    decoded, _total = codecs.decode_video_frames(
                        bytes(blob), every_n=every_n
                    )
                    frames = [
                        (
                            i * every_n,
                            f.shape[0],
                            f.shape[1],
                            [float(v) for v in f.reshape(-1, 3).mean(axis=0) / 255.0],
                        )
                        for i, f in enumerate(decoded)
                    ]
                for idx, fh, fw, rgb in frames:
                    out["media_ref"].append(ref)
                    out["frame_index"].append(idx)
                    out["height"].append(fh)
                    out["width"].append(fw)
                    out["mean_rgb"].append(rgb)
            yield pd.DataFrame(out).astype(
                {"frame_index": "int32", "height": "int32", "width": "int32"}
            )

    return media.select(
        F.col(ref_col).alias(ref_col), F.col(bytes_col).alias(bytes_col)
    ).mapInPandas(sample, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# By-construction image synthesis + decoded pixel stats (the q74 pair):
# the multimodal family's driver-checkable oracle path — real encode and
# real decode through the from-scratch BMP/PPM codecs, with every output
# an integer a SQL engine can re-derive from the generator arithmetic
# ---------------------------------------------------------------------------

IMG_PAIR_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("before", BinaryType()),
        StructField("after", BinaryType()),
    ]
)

IMG_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("after_height", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("ssd_pair", LongType()),
    ]
)


def _synth_pixels(d: int, h: int, w: int, shift: int) -> np.ndarray:
    """Pixel (y, x, c) of doc d = (d*31 + y*17 + x*7 + c*101 + shift) % 256
    — BIGINT arithmetic a SQL engine re-derives verbatim (the q66/q68
    by-construction oracle pattern, applied to pixels)."""
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    return ((d * 31 + y * 17 + x * 7 + c * 101 + shift) % 256).astype(np.uint8)


def _synth_pair_blobs(
    ids,
    width: int,
    height_base: int,
    height_mod: int,
    shift: int,
    shift_every: int,
    resize_every: int,
) -> tuple[list[bytes], list[bytes]]:
    """Shared per-batch generator: (before, after) encoded blobs per id —
    the single definition both the two-stage path and the fused q74 path
    run, so they cannot drift."""
    from ..functions import codecs

    befores, afters = [], []
    for d in ids:
        d = int(d)
        h = height_base + d % height_mod
        ah = h + (1 if d % resize_every == 0 else 0)
        s = shift if d % shift_every == 0 else 0
        img_a = _synth_pixels(d, h, width, 0)
        img_b = _synth_pixels(d, ah, width, s)
        enc_a = codecs.encode_bmp if d % 2 == 0 else codecs.encode_ppm
        enc_b = codecs.encode_ppm if d % 2 == 0 else codecs.encode_bmp
        befores.append(enc_a(img_a))
        afters.append(enc_b(img_b))
    return befores, afters


def _pair_stats_columns(ids, befores, afters) -> dict:
    """Shared per-batch decode+stats: the exact loop of image_pair_stats,
    factored so the fused path runs the identical decode."""
    from ..functions import codecs

    out = {f.name: [] for f in IMG_STATS_SCHEMA.fields}
    for d, a, b in zip(ids, befores, afters):
        ia = codecs.decode_image(bytes(a)).astype(np.int64)
        ib = codecs.decode_image(bytes(b)).astype(np.int64)
        out["doc_id"].append(int(d))
        out["height"].append(ia.shape[0])
        out["width"].append(ia.shape[1])
        out["after_height"].append(ib.shape[0])
        out["sum_r"].append(int(ia[:, :, 0].sum()))
        out["sum_g"].append(int(ia[:, :, 1].sum()))
        out["sum_b"].append(int(ia[:, :, 2].sum()))
        out["ssd_pair"].append(
            0 if ia.shape != ib.shape else int(((ia - ib) ** 2).sum())
        )
    return out


def synth_image_pair_bytes(
    docs: DataFrame,
    id_col: str = "doc_id",
    width: int = 8,
    height_base: int = 6,
    height_mod: int = 3,
    shift: int = 77,
    shift_every: int = 16,
    resize_every: int = 24,
) -> DataFrame:
    """(doc_id) -> (doc_id, before, after): deterministic before/after
    screenshot pairs, REAL bytes through the from-scratch encoders.

    ``before`` is the base pixel field at height ``height_base + d %
    height_mod``; ``after`` repeats it except that every ``shift_every``-th
    doc gets all pixel values shifted by ``shift`` (mod 256 — a change far
    above the reference's 0.01 normalized-MSE threshold) and every
    ``resize_every``-th doc gains one pixel row (the size-mismatch branch
    of ``screenshots_differ``). Everything else is bit-identical, so the
    differ verdict downstream has real TRUE and FALSE rows from all three
    branches of ``data_utils.py:45-73``.

    ``before`` encodes as BMP for even doc_ids and P6 PPM for odd;
    ``after`` uses the OPPOSITE format — both codecs and the byte-sniffing
    dispatch sit on the driver-checked path, and the pair compare is
    cross-format (pixels, not bytes, decide). The blobs are real encodings
    (``codecs.encode_bmp``/``encode_ppm``): a PIL cluster decoding these
    files reads the same pixels back.
    """
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            befores, afters = _synth_pair_blobs(
                ids, width, height_base, height_mod, shift, shift_every, resize_every
            )
            # ids as a plain array: mixing an index-carrying Series with
            # positional lists would silently misalign on a non-default
            # index (r7 ADVICE; Arrow batches carry a RangeIndex today,
            # but the contract should not depend on it)
            yield pd.DataFrame(
                {"doc_id": ids.to_numpy(), "before": befores, "after": afters}
            )

    return docs.select(F.col(id_col).cast("long").alias("doc_id")).mapInPandas(
        gen, IMG_PAIR_SCHEMA
    )


def image_pair_stats(
    media: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "before",
    b_col: str = "after",
) -> DataFrame:
    """Decoded-pixel pair statistics, all integers: dims of both sides,
    per-channel sums of ``before`` (the decode-roundtrip proof), and the
    sum of squared differences between the pair (``ssd_pair``; 0 when the
    shapes differ — the size-mismatch branch decides without an MSE, same
    short-circuit as ``screenshots_differ``). The integer SSD is the exact
    content of the reference's normalized MSE (``data_utils.py:64-69``):
    ``mse = ssd / (n * 255^2)``, so the threshold verdict downstream is a
    pure-BIGINT inequality — no float ever touches a value hash. Decode is
    format-sniffed (``codecs.decode_image``), the same dispatch as the
    real-bytes metadata probe."""
    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _pair_stats_columns(pdf[id_col], pdf[a_col], pdf[b_col])
            yield pd.DataFrame(out).astype(
                {"width": "int32", "height": "int32", "after_height": "int32"}
            )

    return media.select(
        F.col(id_col).alias(id_col), F.col(a_col).alias(a_col), F.col(b_col).alias(b_col)
    ).mapInPandas(stats, IMG_STATS_SCHEMA)


def synth_image_pair_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    width: int = 8,
    height_base: int = 6,
    height_mod: int = 3,
    shift: int = 77,
    shift_every: int = 16,
    resize_every: int = 24,
) -> DataFrame:
    """Fused synth→stats path for plans that only need the STATS (q74):
    one ``mapInPandas`` stage runs the identical generate → encode →
    sniff → decode → stats loop (the same shared helpers as the two-stage
    operators, so the codec round-trip is still exercised on real bytes),
    but the encoded blobs never cross the JVM↔Python boundary — r8, guide
    §4: two Arrow transposes and one whole Python stage removed.
    Equality with the two-stage composition is pinned by
    tests/test_similarity_multimodal_streaming.py."""

    def fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            befores, afters = _synth_pair_blobs(
                ids, width, height_base, height_mod, shift, shift_every, resize_every
            )
            out = _pair_stats_columns(ids.to_numpy(), befores, afters)
            yield pd.DataFrame(out).astype(
                {"width": "int32", "height": "int32", "after_height": "int32"}
            )

    return docs.select(F.col(id_col).cast("long").alias("doc_id")).mapInPandas(
        fused, IMG_STATS_SCHEMA
    )


def sample_frames(meta: DataFrame, every_n: int = 30) -> DataFrame:
    """video rows -> (media_ref, frame_index) sampling plan — pure JVM
    column ops (sequence + explode), no Python."""
    vids = meta.filter(F.col("media_type").startswith("video"))
    return vids.select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_index"),
    )
