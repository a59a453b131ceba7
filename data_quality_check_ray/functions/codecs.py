"""Real, dependency-free multimodal codecs (numpy + stdlib only).

The sandbox has no PIL/soundfile, but these formats are fully specified
and trivially decodable, so the multimodal stages get a REAL decode path
instead of a stub:

  * BMP — 24-bit uncompressed BITMAPINFOHEADER (BGR rows, 4-byte padded,
    bottom-up) — the Windows bitmap everyone can write;
  * PPM — binary P6 (RGB, maxval 255);
  * WAV — RIFF PCM 16-bit via the stdlib ``wave`` module.

JPEG/PNG/MP3 still require external libraries; the stages fall back to a
clearly-marked deterministic fake for those magics (see
stages/multimodal.py).

Also: vectorized bilinear resize — the standard image preprocessing step
for a multimodal training pipeline, as a pure numpy kernel.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ---------------------------------------------------------------------------
# BMP (24-bit, BI_RGB)
# ---------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BMP bytes."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = img.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    image_size = stride * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size,
                      2835, 2835, 0, 0)
    # BGR, bottom-up, padded rows — one vectorized assembly
    bgr = img[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    return header + dib + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BMP bytes -> (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    dib_size = struct.unpack_from("<I", data, 14)[0]
    if dib_size < 40:
        raise ValueError("unsupported BMP DIB header")
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"degenerate BMP dimensions ({w}x{h})")
    stride = (w * 3 + 3) & ~3
    px = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = px.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if flip else rgb


# ---------------------------------------------------------------------------
# PPM (binary P6)
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    # header parsing shared with the stream reader (_ppm_frame_size)
    w, h, start = _ppm_frame_size(data, 0)
    return np.frombuffer(
        data, dtype=np.uint8, count=h * w * 3, offset=start
    ).reshape(h, w, 3)


def sniff_image(data: bytes) -> str | None:
    """-> 'bmp' | 'ppm' | None (unknown format)."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"P6":
        return "ppm"
    return None


def decode_image(data: bytes) -> np.ndarray:
    kind = sniff_image(data)
    if kind == "bmp":
        return decode_bmp(data)
    if kind == "ppm":
        return decode_ppm(data)
    raise ValueError("unknown image format")


# ---------------------------------------------------------------------------
# bilinear resize (pure numpy, vectorized)
# ---------------------------------------------------------------------------


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(h, w, c) uint8/float -> (out_h, out_w, c), align-corners=False
    (the OpenCV/PIL convention: sample at pixel centers)."""
    h, w = img.shape[:2]
    src = img.astype(np.float32)
    ys = (np.arange(out_h, dtype=np.float32) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float32) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = src[y0][:, x0] * (1 - wx) + src[y0][:, x1] * wx
    bot = src[y1][:, x0] * (1 - wx) + src[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    if np.issubdtype(img.dtype, np.integer):
        # round, don't truncate: astype alone biases every non-integral
        # interpolation half an LSB dark vs the cv2/PIL convention
        return np.rint(out).astype(img.dtype)
    return out


# ---------------------------------------------------------------------------
# PPM stream "video" (concatenated P6 frames — the NetPBM stream
# convention ffmpeg's image2pipe emits/consumes)
# ---------------------------------------------------------------------------


def encode_ppm_stream(frames) -> bytes:
    """List of (h, w, 3) uint8 frames -> concatenated-P6 stream bytes."""
    return b"".join(encode_ppm(f) for f in frames)


def _ppm_frame_size(data: bytes, pos: int) -> tuple[int, int, int]:
    """-> (w, h, payload_start) of the P6 frame at ``pos``."""
    if data[pos : pos + 2] != b"P6":
        raise ValueError(f"not a P6 frame at offset {pos}")
    parts = []
    i = pos + 2
    while len(parts) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        parts.append(int(data[i:j]))
        i = j
    i += 1
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    if w <= 0 or h <= 0:
        raise ValueError(f"degenerate PPM dimensions ({w}x{h})")
    return w, h, i


def iter_ppm_stream(data: bytes):
    """Yield (h, w, 3) uint8 frames from a concatenated-P6 stream."""
    pos = 0
    while pos < len(data):
        w, h, start = _ppm_frame_size(data, pos)
        yield np.frombuffer(
            data, dtype=np.uint8, count=h * w * 3, offset=start
        ).reshape(h, w, 3)
        pos = start + h * w * 3


def sample_ppm_stream(data: bytes, stride: int = 2):
    """-> (n_frames_total, sampled frames [0, stride, 2*stride, ...]).

    Frame SAMPLING, not full decode: non-sampled frames are skipped by
    header arithmetic (seek past the payload) — only every ``stride``-th
    frame's pixels are materialized, the standard cost-saver for video
    feature extraction."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    frames = []
    n = 0
    pos = 0
    while pos < len(data):
        w, h, start = _ppm_frame_size(data, pos)
        if n % stride == 0:
            frames.append(np.frombuffer(
                data, dtype=np.uint8, count=h * w * 3, offset=start
            ).reshape(h, w, 3))
        n += 1
        pos = start + h * w * 3
    return n, frames


# ---------------------------------------------------------------------------
# WAV (RIFF PCM16) via stdlib wave
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16_000,
                     channels: int = 1) -> bytes:
    """int16 samples (interleaved when channels > 1) -> WAV bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav_pcm16 expects int16 samples")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> (rate, channels, int16 samples interleaved)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only PCM16 supported")
        rate = w.getframerate()
        channels = w.getnchannels()
        frames = w.readframes(w.getnframes())
    return rate, channels, np.frombuffer(frames, dtype=np.int16)
