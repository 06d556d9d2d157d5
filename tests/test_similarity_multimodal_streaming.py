"""Engine-side tests for ANN, multimodal plumbing, and streaming."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _numpy_topk(vectors: dict, probe: np.ndarray, k: int):
    sims = {
        vid: float(np.dot(v, probe) / (np.linalg.norm(v) * np.linalg.norm(probe)))
        for vid, v in vectors.items()
    }
    return sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_brute_force_knn_matches_numpy(spark, emb):
    from warc_bench_spark.operators.similarity import brute_force_knn

    rows = emb.collect()
    vectors = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    probe_vec = vectors[7]
    probes = spark.createDataFrame(
        [(7, [float(x) for x in probe_vec])], "probe_id long, probe_vec array<double>"
    )
    got = brute_force_knn(emb, probes, k=5).collect()
    want = _numpy_topk({k: v for k, v in vectors.items()}, probe_vec, 5)
    assert [(r["vec_id"], round(r["cosine"], 9)) for r in got] == [
        (vid, round(s, 9)) for vid, s in want
    ]


def test_lsh_knn_finds_self(spark, emb):
    """The probe itself shares every band with itself -> always a candidate,
    and the exact re-rank must put it first with cosine 1."""
    from warc_bench_spark.operators.similarity import lsh_knn

    probe_row = emb.filter(F.col("vec_id") == 3).first()
    probes = spark.createDataFrame(
        [(3, [float(x) for x in probe_row["embedding"]])],
        "probe_id long, probe_vec array<double>",
    )
    got = lsh_knn(emb, probes, dim=64, k=5, band_bits=6, n_bands=3, seed=1).collect()
    assert got, "probe bucket empty"
    assert got[0]["vec_id"] == 3 and abs(got[0]["cosine"] - 1.0) < 1e-9


def _planted_corpus(spark, dim=16, n_probes=4, planted=12, noise=1500):
    rng = np.random.default_rng(7)
    rows, probes_rows = [], []
    vid = 0
    for p in range(n_probes):
        center = rng.standard_normal(dim)
        center /= np.linalg.norm(center)
        probes_rows.append((p, [float(x) for x in center]))
        for _ in range(planted):  # planted near-neighbors (cosine ~0.99)
            v = center + 0.08 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(noise):  # background
        v = rng.standard_normal(dim)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = spark.createDataFrame(probes_rows, "probe_id long, probe_vec array<double>")
    return emb, probes


def _mean_recall(exact_rows, approx_rows, k):
    want, got = {}, {}
    for r in exact_rows:
        want.setdefault(r["probe_id"], set()).add(r["vec_id"])
    for r in approx_rows:
        got.setdefault(r["probe_id"], set()).add(r["vec_id"])
    recalls = [len(want[p] & got.get(p, set())) / k for p in want]
    return sum(recalls) / len(recalls), recalls


def test_lsh_knn_recall_vs_brute_force(spark):
    """Planted-neighbor recall: banded multi-probe LSH must recover the true
    top-k (points genuinely close to each probe) from a noisy background.
    This is the scale-path guarantee — candidates come from bucket joins,
    never a cross join, yet recall stays high."""
    from warc_bench_spark.operators.similarity import brute_force_knn, lsh_knn

    dim, k = 16, 8
    emb, probes = _planted_corpus(spark, dim=dim)
    exact = brute_force_knn(emb, probes, k=k).collect()
    approx = lsh_knn(
        emb, probes, dim=dim, k=k, band_bits=8, n_bands=4, multi_probe=True, seed=42
    ).collect()
    mean, recalls = _mean_recall(exact, approx, k)
    assert mean >= 0.9, recalls


def test_ivf_knn_recall_vs_brute_force(spark):
    """IVF scale path: coarse k-means cells + n_probe nearest-cell search
    must recover the planted neighbors too (FAISS-style IVF recipe)."""
    from warc_bench_spark.operators.similarity import brute_force_knn, ivf_knn

    dim, k = 16, 8
    emb, probes = _planted_corpus(spark, dim=dim)
    exact = brute_force_knn(emb, probes, k=k).collect()
    approx = ivf_knn(
        emb, probes, dim=dim, k=k, n_centroids=32, n_probe=4, seed=42
    ).collect()
    mean, recalls = _mean_recall(exact, approx, k)
    assert mean >= 0.9, recalls


def test_banded_pairs_stop_bucket_cap(spark):
    """A degenerate bucket (boilerplate shared by >cap docs) must be
    excluded from candidate generation; small buckets still pair fully."""
    from warc_bench_spark.operators.similarity import banded_candidate_pairs

    rows = [(i, 1, 1) for i in range(100)]        # degenerate bucket (100)
    rows += [(200 + i, 7, 7) for i in range(4)]   # healthy bucket (4)
    sig = spark.createDataFrame(rows, "doc_id long, mh1 long, mh2 long")
    pairs = banded_candidate_pairs(sig, ["mh1", "mh2"], max_bucket_size=64).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert got == {(200, 201), (200, 202), (200, 203), (201, 202), (201, 203), (202, 203)}


def test_kmeans_fit_deterministic_and_normalized():
    from warc_bench_spark.operators.similarity import kmeans_fit

    rng = np.random.default_rng(3)
    x = rng.standard_normal((500, 8))
    c1 = kmeans_fit(x, 16, seed=5)
    c2 = kmeans_fit(x, 16, seed=5)
    assert (c1 == c2).all()
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_multimodal_plumbing(spark):
    from warc_bench_spark.config import CrawlConfig
    from warc_bench_spark.operators.multimodal import (
        decode_media_meta,
        extract_media_features,
        sample_frames,
    )
    from warc_bench_spark.synth import documents_df, generate_corpus

    corpus = generate_corpus(CrawlConfig(seed=3, n_urls=200, n_hosts=8))
    docs = documents_df(spark, corpus)

    meta = decode_media_meta(docs)
    m = meta.collect()
    n_media = sum(
        1 for spans in corpus.documents.values() for s in spans if s[0] == "media"
    )
    assert len(m) == n_media
    assert all(r["width"] >= 64 and r["height"] >= 64 for r in m)

    feats = extract_media_features(docs).collect()
    assert len(feats) == n_media
    assert all(len(r["feature"]) == 8 for r in feats)
    # deterministic: same ref -> same feature
    by_ref = {}
    for r in feats:
        if r["media_ref"] in by_ref:
            assert by_ref[r["media_ref"]] == r["feature"]
        by_ref[r["media_ref"]] = r["feature"]

    frames = sample_frames(meta, every_n=30)
    fr = frames.collect()
    vids = [r for r in m if r["media_type"] == "video/mp4"]
    if vids:
        assert len(fr) == sum(1 + (v["n_frames"] - 1) // 30 for v in vids)

    # the 'real' backend stubs loudly instead of silently faking
    with pytest.raises(Exception, match="NotImplementedError|real media"):
        decode_media_meta(docs, backend="real").collect()


def test_sample_video_frames_bytes_fake_backend(spark):
    """M4 frame-sampling plumbing with the deterministic fake decoder: the
    mapInPandas fan-out, schema, and every-n-th sampling pattern are real;
    only the codec is sha-derived (the real path is ffmpeg-gated below)."""
    import hashlib

    from warc_bench_spark.operators.multimodal import sample_video_frames_bytes

    rows = [(f"vid{i}", b"\x00\x00\x00\x18ftypisom" + bytes([i])) for i in range(5)]
    df = spark.createDataFrame(rows, "media_ref string, content binary")
    out = sample_video_frames_bytes(df, every_n=30, backend="fake").collect()

    by_ref: dict[str, list] = {}
    for r in out:
        by_ref.setdefault(r["media_ref"], []).append(r)
    for ref, frames in by_ref.items():
        h = int(hashlib.sha256(ref.encode()).hexdigest()[:8], 16)
        n_frames = 1 + h % 240
        idxs = sorted(r["frame_index"] for r in frames)
        assert idxs == list(range(0, n_frames, 30))
        assert all(len(r["mean_rgb"]) == 3 for r in frames)
        assert all(r["height"] == 64 + h % 256 for r in frames)


def test_sample_video_frames_bytes_gated_real(spark, tmp_path):
    """Gated on codecs.video_available(): real MP4 bytes through the Spark
    stage; skips (documented boundary) where no video backend exists."""
    from warc_bench_spark.functions import codecs
    from warc_bench_spark.operators.multimodal import sample_video_frames_bytes

    if not codecs.video_available():
        df = spark.createDataFrame(
            [("v", b"\x00\x00\x00\x18ftypisom" + b"\x00" * 16)],
            "media_ref string, content binary",
        )
        with pytest.raises(Exception, match="imageio|av|NotImplementedError"):
            sample_video_frames_bytes(df, every_n=5).collect()
        pytest.skip("no video backend — raise-at-boundary verified instead")

    import imageio.v3 as iio
    import numpy as np

    frames = [np.full((16, 24, 3), i * 20, dtype=np.uint8) for i in range(11)]
    path = tmp_path / "clip.mp4"
    iio.imwrite(path, frames, fps=5, extension=".mp4")
    df = spark.createDataFrame(
        [("clip", path.read_bytes())], "media_ref string, content binary"
    )
    out = sample_video_frames_bytes(df, every_n=5).collect()
    assert sorted(r["frame_index"] for r in out) == [0, 5, 10]
    assert all((r["height"], r["width"]) == (16, 24) for r in out)


def test_streaming_windowed_counts(spark, tmp_path):
    from warc_bench_spark.streaming.windowed import (
        windowed_event_counts_batch,
        windowed_event_counts_stream,
    )

    # split events into time-contiguous slices written sequentially: the
    # file source processes them oldest-first, so the watermark advances
    # monotonically between micro-batches (no late-drops) and closed
    # windows are emitted deterministically
    import time as _time

    events_dir = str(tmp_path / "events_src")
    all_rows = (
        spark.read.parquet(f"{SF}/events.parquet").orderBy("ts", "event_id").collect()
    )
    schema = spark.read.parquet(f"{SF}/events.parquet").schema
    step = (len(all_rows) + 5) // 6
    for i in range(0, len(all_rows), step):
        spark.createDataFrame(all_rows[i : i + step], schema).coalesce(1).write.mode(
            "append"
        ).parquet(events_dir)
        _time.sleep(0.1)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    windowed_event_counts_stream(spark, events_dir, ckpt, out)

    got = spark.read.parquet(out)
    batch = windowed_event_counts_batch(spark, events_dir)
    # append mode emits only watermark-closed windows; every emitted window
    # must match the batch result exactly, and most windows must be emitted
    key = lambda r: (r["window_start"], r["event_type"])
    batch_map = {key(r): r["n"] for r in batch.collect()}
    got_rows = got.collect()
    assert len(got_rows) >= 0.5 * len(batch_map)
    for r in got_rows:
        assert batch_map[key(r)] == r["n"]


def test_image_pair_synth_and_stats_branches(spark):
    """q74's operator pair: real encode -> sniff -> decode round-trip, with
    all three screenshots_differ branches represented (identical pair,
    pixel-shifted pair, resized pair) and pixel sums matching the generator
    arithmetic computed independently in numpy."""
    from warc_bench_spark.operators.multimodal import (
        image_pair_stats,
        synth_image_pair_bytes,
    )

    docs = spark.range(0, 48).withColumnRenamed("id", "doc_id")
    pairs = synth_image_pair_bytes(docs)
    stats = {r["doc_id"]: r.asDict() for r in image_pair_stats(pairs).collect()}
    assert len(stats) == 48

    for d, r in stats.items():
        h = 6 + d % 3
        assert (r["height"], r["width"]) == (h, 8)
        assert r["after_height"] == h + (1 if d % 24 == 0 else 0)
        # independent pixel re-derivation
        y, x = np.ogrid[0:h, 0:8]
        for c, col in enumerate(("sum_r", "sum_g", "sum_b")):
            v = (d * 31 + y * 17 + x * 7 + c * 101) % 256
            assert r[col] == int(v.sum()), (d, col)
        if d % 24 == 0:
            assert r["ssd_pair"] == 0  # size-mismatch branch short-circuits
        elif d % 16 == 0:
            assert r["ssd_pair"] > 0  # shifted far past the MSE threshold
            n = h * 8 * 3
            assert 100 * r["ssd_pair"] > n * 65025
        else:
            assert r["ssd_pair"] == 0  # bit-identical pair


def test_image_pair_fused_stats_match_two_stage(spark):
    """r8: q74's fused single-Python-stage path (synth_image_pair_stats)
    must produce row-for-row the same stats as the two-stage composition —
    the fusion only removes the boundary crossing of the blobs, never the
    encode -> sniff -> decode round-trip itself."""
    from warc_bench_spark.operators.multimodal import (
        image_pair_stats,
        synth_image_pair_bytes,
        synth_image_pair_stats,
    )

    docs = spark.range(0, 48).withColumnRenamed("id", "doc_id")
    two_stage = sorted(
        tuple(r) for r in image_pair_stats(synth_image_pair_bytes(docs)).collect()
    )
    fused = sorted(tuple(r) for r in synth_image_pair_stats(docs).collect())
    assert fused == two_stage


def test_image_pair_bytes_are_real_encodings(spark):
    """The pair blobs are genuine BMP/PPM files in opposite formats."""
    from warc_bench_spark.functions import codecs
    from warc_bench_spark.operators.multimodal import synth_image_pair_bytes

    docs = spark.range(0, 4).withColumnRenamed("id", "doc_id")
    rows = {r["doc_id"]: r for r in synth_image_pair_bytes(docs).collect()}
    for d, r in rows.items():
        kinds = (
            codecs.sniff_media_type(bytes(r["before"])),
            codecs.sniff_media_type(bytes(r["after"])),
        )
        want = (
            ("image/bmp", "image/x-portable-pixmap")
            if d % 2 == 0
            else ("image/x-portable-pixmap", "image/bmp")
        )
        assert kinds == want
        a = codecs.decode_image(bytes(r["before"]))
        b = codecs.decode_image(bytes(r["after"]))
        assert a.shape == (6 + d % 3, 8, 3)
        if d % 16 and d % 24:
            np.testing.assert_array_equal(a, b)
