"""From-scratch media codecs (M4) + real-bytes multimodal operators (M1)."""

import numpy as np
import pytest

from warc_bench_spark.functions.codecs import (
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    image_mse,
    resize_nearest,
    screenshots_differ,
    sniff_media_type,
)

rng = np.random.default_rng(7)


def test_bmp_roundtrip_with_row_padding():
    img = rng.integers(0, 256, (9, 5, 3), dtype=np.uint8)  # 5*3=15 -> 1-byte pad
    data = encode_bmp(img)
    assert sniff_media_type(data) == "image/bmp"
    assert (decode_bmp(data) == img).all()


def test_ppm_roundtrip_and_comments():
    img = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    data = encode_ppm(img)
    assert (decode_ppm(data) == img).all()
    with_comment = data.replace(b"P6\n", b"P6\n# a comment\n", 1)
    assert (decode_ppm(with_comment) == img).all()


def test_wav_roundtrip_mono_and_stereo():
    stereo = (rng.standard_normal((333, 2)) * 5000).astype(np.int16)
    dec, rate = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and (dec == stereo).all()
    mono = (rng.standard_normal(100) * 100).astype(np.int16)
    dec2, rate2 = decode_wav(encode_wav(mono, 8000))
    assert rate2 == 8000 and (dec2[:, 0] == mono).all()


def test_screenshots_differ_reference_semantics():
    """data_utils.py:45-73: size mismatch -> differ; normalized MSE > 0.01
    -> differ; tiny single-pixel change -> same."""
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert not screenshots_differ(img, img)
    assert screenshots_differ(img, img[:16])
    tweaked = img.copy()
    tweaked[0, 0] = 255 - tweaked[0, 0]
    assert not screenshots_differ(img, tweaked)
    assert screenshots_differ(img, 255 - img)
    assert image_mse(img, img) == 0.0


def test_resize_nearest_shape_and_identity():
    img = rng.integers(0, 256, (8, 6, 3), dtype=np.uint8)
    assert (resize_nearest(img, 8, 6) == img).all()
    up = resize_nearest(img, 16, 12)
    assert up.shape == (16, 12, 3) and (up[::2, ::2] == img).all()


@pytest.fixture(scope="module")
def media_df(spark):
    rows = []
    for i in range(6):
        img = rng.integers(0, 256, (10 + i, 8, 3), dtype=np.uint8)
        rows.append((f"img{i}", bytearray(encode_bmp(img))))
    for i in range(3):
        s = (rng.standard_normal((200 + 50 * i, 2)) * 3000).astype(np.int16)
        rows.append((f"wav{i}", bytearray(encode_wav(s, 16000))))
    return spark.createDataFrame(rows, "media_ref string, content binary")


def test_decode_media_meta_bytes(spark, media_df):
    from warc_bench_spark.operators.multimodal import decode_media_meta_bytes

    meta = {r["media_ref"]: r for r in decode_media_meta_bytes(media_df).collect()}
    assert meta["img0"]["media_type"] == "image/bmp"
    assert (meta["img0"]["width"], meta["img0"]["height"]) == (8, 10)
    assert meta["img3"]["height"] == 13
    assert meta["wav1"]["media_type"] == "audio/wav"
    assert meta["wav1"]["n_frames"] == 250 and meta["wav1"]["width"] is None


def test_extract_media_features_bytes(spark, media_df):
    from warc_bench_spark.operators.multimodal import extract_media_features_bytes

    feats = {
        r["media_ref"]: r["feature"]
        for r in extract_media_features_bytes(media_df).collect()
    }
    assert len(feats) == 9 and all(len(v) == 8 for v in feats.values())
    # image features are real pixel means in [0, 1]
    for i in range(6):
        assert all(0.0 <= x <= 1.0 for x in feats[f"img{i}"][:4])
    # audio: duration = n/rate, channels recorded
    assert feats["wav0"][4] == pytest.approx(200 / 16000)
    assert feats["wav0"][5] == 2.0


def test_web_states_differ_df(spark):
    """M3 literal: URL change OR screenshot MSE OR axtree ratio < 0.9999
    (data_utils.py:103-152 ordering)."""
    from warc_bench_spark.operators.multimodal import web_states_differ_df

    base = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    shot = bytearray(encode_bmp(base))
    shot_inv = bytearray(encode_bmp(255 - base))
    ax = "button A\nlink B\n" * 50
    rows = [
        ("same", "https://a/x", "https://a/x", shot, shot, ax, ax),
        ("url", "https://a/x", "https://a/y", shot, shot, ax, ax),
        ("shot", "https://a/x", "https://a/x", shot, shot_inv, ax, ax),
        ("axtree", "https://a/x", "https://a/x", shot, shot, ax, ax + "extra node"),
    ]
    df = spark.createDataFrame(
        rows,
        "pair string, url_a string, url_b string, shot_a binary, shot_b binary, "
        "axtree_a string, axtree_b string",
    )
    got = {r["pair"]: r["changed"] for r in web_states_differ_df(df).collect()}
    assert got == {"same": False, "url": True, "shot": True, "axtree": True}


def test_screenshots_differ_df(spark):
    from warc_bench_spark.operators.multimodal import screenshots_differ_df

    base = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    tweak = base.copy()
    tweak[0, 0] = 255 - tweak[0, 0]
    rows = [
        ("same", bytearray(encode_bmp(base)), bytearray(encode_bmp(base))),
        ("tiny", bytearray(encode_bmp(base)), bytearray(encode_bmp(tweak))),
        ("inverted", bytearray(encode_bmp(base)), bytearray(encode_bmp(255 - base))),
        ("resized", bytearray(encode_bmp(base)), bytearray(encode_bmp(base[:10]))),
    ]
    df = spark.createDataFrame(rows, "pair string, before binary, after binary")
    got = {r["pair"]: r["changed"] for r in screenshots_differ_df(df).collect()}
    assert got == {"same": False, "tiny": False, "inverted": True, "resized": True}


# ------------------------------------------------- PIL-gated compressed path

# minimal valid 1x1 PNG and JPEG byte prefixes (magic-sniff only; full
# decode is exercised in the gated test below with PIL-encoded bytes)
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n" + b"\x00" * 8
_JPEG_MAGIC = b"\xff\xd8\xff\xe0" + b"\x00" * 8


def test_sniff_compressed_magic_without_pil():
    """Magic-byte sniffing for JPEG/PNG needs no codec at all."""
    assert sniff_media_type(_PNG_MAGIC) == "image/png"
    assert sniff_media_type(_JPEG_MAGIC) == "image/jpeg"


def test_compressed_boundary_without_pil():
    """Without PIL the compressed branch raises the documented
    NotImplementedError (not a silent fake); with PIL it must decode."""
    from warc_bench_spark.functions.codecs import (
        decode_image,
        image_decodable,
        pil_available,
    )

    if pil_available():
        pytest.skip("PIL present: covered by test_pil_decode_roundtrip")
    assert not image_decodable("image/png")
    assert not image_decodable("image/jpeg")
    assert image_decodable("image/bmp")
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(_PNG_MAGIC)


@pytest.mark.skipif(
    not __import__("warc_bench_spark.functions.codecs", fromlist=["pil_available"]).pil_available(),
    reason="PIL not installed (the documented compressed-codec boundary)",
)
def test_pil_decode_roundtrip():
    """Gated on pil_available(): PNG decodes losslessly to the source RGB
    array; JPEG decodes to the right shape/dtype (lossy, so approximate
    values); both feed the same screenshots_differ semantics as BMP."""
    import io

    from PIL import Image

    from warc_bench_spark.functions.codecs import decode_image, image_decodable

    img = rng.integers(0, 256, (12, 17, 3), dtype=np.uint8)
    png_buf, jpg_buf = io.BytesIO(), io.BytesIO()
    Image.fromarray(img).save(png_buf, format="PNG")
    Image.fromarray(img).save(jpg_buf, format="JPEG", quality=95)

    assert image_decodable("image/png") and image_decodable("image/jpeg")
    png_dec = decode_image(png_buf.getvalue())
    assert png_dec.shape == img.shape and png_dec.dtype == np.uint8
    np.testing.assert_array_equal(png_dec, img)  # PNG is lossless

    jpg_dec = decode_image(jpg_buf.getvalue())
    assert jpg_dec.shape == img.shape and jpg_dec.dtype == np.uint8
    assert image_mse(jpg_dec, img) < 0.05  # lossy but close

    assert not screenshots_differ(png_dec, png_dec)


# ---------------------------------------------- ffmpeg-gated video path (M4)

# minimal ISO-BMFF prefix: 4-byte box size + 'ftyp' + brand (magic-sniff
# only; full decode is exercised in the gated test below)
_MP4_MAGIC = b"\x00\x00\x00\x18ftypisom" + b"\x00" * 16


def test_sniff_mp4_magic_without_backend():
    """ftyp-box sniffing (ISO/IEC 14496-12) needs no codec at all."""
    assert sniff_media_type(_MP4_MAGIC) == "video/mp4"
    assert sniff_media_type(b"\x00\x00\x00\x18stypisom") is None


def test_video_boundary_without_backend():
    """Without imageio[ffmpeg]/av the video branch raises the documented
    NotImplementedError (not a silent fake); with a backend it must decode."""
    from warc_bench_spark.functions.codecs import (
        decode_video_frames,
        video_available,
        video_decodable,
    )

    if video_available():
        pytest.skip("video backend present: covered by the gated roundtrip")
    assert not video_decodable("video/mp4")
    with pytest.raises(NotImplementedError, match="imageio|av"):
        decode_video_frames(_MP4_MAGIC, every_n=10)


@pytest.mark.skipif(
    not __import__(
        "warc_bench_spark.functions.codecs", fromlist=["video_available"]
    ).video_available(),
    reason="no imageio[ffmpeg]/av (the documented compressed-video boundary)",
)
def test_video_decode_roundtrip(tmp_path):
    """Gated on video_available(): encode a tiny synthetic clip with the
    installed backend, then decode_video_frames must return every-n-th
    frame in order with the right shapes and total count."""
    import imageio.v3 as iio

    frames = [
        np.full((16, 24, 3), (i * 23) % 256, dtype=np.uint8) for i in range(12)
    ]
    path = tmp_path / "clip.mp4"
    iio.imwrite(path, frames, fps=6, extension=".mp4")
    data = path.read_bytes()
    assert sniff_media_type(data) == "video/mp4"

    from warc_bench_spark.functions.codecs import decode_video_frames

    sampled, total = decode_video_frames(data, every_n=5)
    assert total == 12
    assert len(sampled) == 3  # frames 0, 5, 10
    assert all(f.shape == (16, 24, 3) for f in sampled)
