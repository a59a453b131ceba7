"""Multimodal columns: opaque binary payloads + typed metadata.

Decode paths (functions/codecs.py — numpy + stdlib, no external libs):

  * REAL: 24-bit BMP and binary-P6 PPM images (full decode to pixels,
    bilinear resize); RIFF PCM16 WAV audio (stdlib ``wave``).
  * STUBBED: JPEG/PNG/MP3 need external codecs the sandbox lacks; those
    magics fall back to a clearly-marked deterministic fake (PIL is used
    when importable).

Scale notes: payload rows are large (images MBs each), so these stages are
meant to run with SMALL batch_size (32-256) and `target_max_block_size`
raised so Ray doesn't split blocks absurdly; features are emitted as
fixed-width list<float> columns so downstream ANN (stages/ann.py) applies
unchanged.
"""

from __future__ import annotations

import hashlib
from struct import error as struct_error

import numpy as np
import pyarrow as pa


def byte_histogram_features(payload: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """REAL kernel (no stub): (n, 16) float32 features per binary payload —
    coarse byte-value histogram (16 buckets, L1-normalized) + nothing
    image-specific.  Vectorized: one pass over the flattened buffer."""
    if isinstance(payload, pa.ChunkedArray):
        payload = payload.combine_chunks()
    # flatten binary column via offsets
    offs = np.frombuffer(payload.buffers()[1], dtype=np.int32 if payload.type == pa.binary() else np.int64)
    offs = offs[payload.offset : payload.offset + len(payload) + 1].astype(np.int64)
    data = np.frombuffer(payload.buffers()[2], dtype=np.uint8) if payload.buffers()[2] else np.empty(0, np.uint8)
    b = data[offs[0] : offs[-1]]
    offs = offs - offs[0]
    n = len(payload)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    bucket = (b >> 4).astype(np.int64)  # 16 coarse buckets
    flat = np.bincount(row_ids * 16 + bucket, minlength=n * 16).reshape(n, 16)
    totals = flat.sum(axis=1, keepdims=True)
    totals[totals == 0] = 1
    return (flat / totals).astype(np.float32)


def _fake_decode_image(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """STUB decoder: deterministic fake (md5-derived dims + byte-stat
    "pixels"); replaces PIL in this sandbox.  NOT a real image decode."""
    h = hashlib.md5(data).digest()
    height = 64 + h[0] % 192
    width = 64 + h[1] % 192
    channels = 3
    arr = np.frombuffer(data[:3072] if len(data) >= 3 else b"\x00\x00\x00", dtype=np.uint8)
    mean_rgb = np.resize(arr.astype(np.float32), 3) / 255.0
    return height, width, channels, mean_rgb


class ImageFeatureStage:
    """Actor-pool stage: binary image column -> (height, width, channels,
    mean_rgb list<float>, feat list<float>).

    __init__ resolves the codec ONCE per actor: real PIL when available,
    else the deterministic fake (sandbox).  Run with
    ``map_batches(ImageFeatureStage, batch_size=64, concurrency=(1, N),
    num_cpus=1, batch_format="pyarrow")``.
    """

    def __init__(self, payload_col: str = "payload") -> None:
        self.payload_col = payload_col
        try:  # pragma: no cover - PIL absent in sandbox
            from PIL import Image  # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False

    def _decode(self, data: bytes | None):
        if data is None:
            return None
        from ..functions.codecs import decode_image, sniff_image

        if sniff_image(data) is not None:  # REAL decode: BMP / PPM
            arr = decode_image(data)
            h, w = arr.shape[:2]
            return h, w, 3, arr.reshape(-1, 3).mean(axis=0) / 255.0
        if self._pil:  # pragma: no cover
            import io

            from PIL import Image

            im = Image.open(io.BytesIO(data)).convert("RGB")
            arr = np.asarray(im, dtype=np.float32) / 255.0
            return im.height, im.width, 3, arr.mean(axis=(0, 1))
        return _fake_decode_image(data)

    def __call__(self, batch: pa.Table) -> pa.Table:
        heights, widths, chans, means = [], [], [], []
        for data in batch[self.payload_col].to_pylist():
            try:
                dec = self._decode(data)
            except (ValueError, struct_error, OSError):
                # corrupt payload: mark (nulls), never fail the job.
                # OSError covers PIL's UnidentifiedImageError/truncated-file
                # errors on deployments where PIL is present.
                dec = None
            if dec is None:
                heights.append(None); widths.append(None); chans.append(None)
                means.append(None)
            else:
                h, w, c, m = dec
                heights.append(h); widths.append(w); chans.append(c)
                means.append([float(x) for x in m])
        feats = byte_histogram_features(batch[self.payload_col])
        batch = batch.append_column("height", pa.array(heights, type=pa.int32()))
        batch = batch.append_column("width", pa.array(widths, type=pa.int32()))
        batch = batch.append_column("channels", pa.array(chans, type=pa.int32()))
        batch = batch.append_column("mean_rgb", pa.array(means, type=pa.list_(pa.float32())))
        return batch.append_column("feat", pa.array(list(feats), type=pa.list_(pa.float32())))


class ImageResizeStage:
    """Actor-pool stage: decode (BMP/PPM) -> bilinear resize to a fixed
    (out_h, out_w) -> re-encode as BMP.  The standard normalize-resolution
    preprocessing step of an image training pipeline, all real numpy."""

    def __init__(self, out_h: int = 32, out_w: int = 32,
                 payload_col: str = "payload", out_col: str = "payload_resized") -> None:
        self.out_h, self.out_w = out_h, out_w
        self.payload_col, self.out_col = payload_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import (
            decode_image,
            encode_bmp,
            resize_bilinear,
            sniff_image,
        )

        out = []
        for data in batch[self.payload_col].to_pylist():
            if data is None or sniff_image(data) is None:
                out.append(None)
                continue
            try:
                img = resize_bilinear(decode_image(data), self.out_h, self.out_w)
            except (ValueError, struct_error, OSError):
                out.append(None)  # corrupt payload: mark, never fail the job
                continue
            out.append(encode_bmp(np.ascontiguousarray(img)))
        return batch.append_column(self.out_col, pa.array(out, type=pa.binary()))


class VideoFrameSampleStage:
    """Actor-pool stage: PPM-stream "video" column -> (n_frames,
    n_sampled, per-sampled-frame mean luma list<float>).

    REAL codec (concatenated P6 frames — the NetPBM stream convention of
    ffmpeg's image2pipe); frame SAMPLING skips non-sampled frames by
    header arithmetic, so decode cost scales with sampled frames only.
    Compressed containers (mp4/webm) would need external libraries.
    """

    def __init__(self, payload_col: str = "payload", stride: int = 2) -> None:
        if stride < 1:
            raise ValueError(f"stride must be >= 1, got {stride}")
        self.payload_col = payload_col
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import sample_ppm_stream

        n_frames, n_sampled, luma = [], [], []
        for data in batch[self.payload_col].to_pylist():
            if data is None or len(data) == 0:
                n_frames.append(0)
                n_sampled.append(0)
                luma.append([])
                continue
            try:
                n, frames = sample_ppm_stream(data, self.stride)
            except (ValueError, struct_error):
                n_frames.append(None)   # corrupt stream: mark, don't fail
                n_sampled.append(None)
                luma.append(None)
                continue
            n_frames.append(n)
            n_sampled.append(len(frames))
            # BT.601 luma of each sampled frame's mean color
            luma.append([
                float(np.dot(f.reshape(-1, 3).mean(axis=0),
                             [0.299, 0.587, 0.114]))
                for f in frames
            ])
        batch = batch.append_column("n_frames", pa.array(n_frames, type=pa.int32()))
        batch = batch.append_column("n_sampled", pa.array(n_sampled, type=pa.int32()))
        return batch.append_column(
            "frame_luma", pa.array(luma, type=pa.list_(pa.float32()))
        )


class AudioFrameStage:
    """Actor-pool stage: binary audio column -> frame-sampled stats
    (n_frames, sample_rate, per-frame RMS list<float>).

    REAL codec for RIFF/WAV PCM16 (functions/codecs.decode_wav via the
    stdlib ``wave`` module); non-WAV payloads fall back to raw-int16-PCM
    interpretation (sample_rate 0 = unknown).  Compressed formats
    (mp3/ogg) would need external libraries.
    """

    def __init__(self, payload_col: str = "payload", frame_len: int = 1024) -> None:
        self.payload_col = payload_col
        self.frame_len = frame_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import decode_wav

        n_frames, rates, rms = [], [], []
        for data in batch[self.payload_col].to_pylist():
            if data is None or len(data) < 2:
                n_frames.append(0)
                rates.append(0)
                rms.append([])
                continue
            if data[:4] == b"RIFF":
                try:
                    rate, _ch, pcm16 = decode_wav(data)
                except Exception:  # wave.Error/EOFError: corrupt container
                    n_frames.append(None)
                    rates.append(None)
                    rms.append(None)
                    continue
                pcm = pcm16.astype(np.float32)
            else:  # raw PCM fallback (rate unknown)
                rate = 0
                pcm = np.frombuffer(
                    data[: len(data) - len(data) % 2], dtype=np.int16
                ).astype(np.float32)
            k = max(1, len(pcm) // self.frame_len)
            frames = np.array_split(pcm[: k * self.frame_len], k)
            n_frames.append(k)
            rates.append(rate)
            rms.append([float(np.sqrt(np.mean(f**2))) for f in frames])
        batch = batch.append_column("n_frames", pa.array(n_frames, type=pa.int32()))
        batch = batch.append_column("sample_rate", pa.array(rates, type=pa.int32()))
        return batch.append_column("frame_rms", pa.array(rms, type=pa.list_(pa.float32())))
