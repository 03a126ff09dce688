"""Pure stdlib/numpy media codecs — REAL decode paths for the multimodal
stages, no external imaging/audio libraries (none exist in this
environment):

- 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up, 4-byte row
  padding) encode/decode per the public file-format spec
- PCM WAV mono 16-bit encode/decode via the stdlib ``wave`` module
- ``RVID`` — a minimal length-prefixed frame container for video
  plumbing (magic + frame count + [uint32 length][BMP frame]...), built
  so FrameSample can seek-decode ONLY the sampled frames (the property
  a real container/codec gives you); the per-frame codec is real BMP
- nearest-neighbor resize (deterministic integer index mapping)
- 16-float feature vectors for image/audio (the downstream contract of
  stages/multimodal.py)

Everything is a pure function of its input bytes — no RNG, no clock.
"""

from __future__ import annotations

import io
import struct
import wave
from typing import List, Tuple

import numpy as np

FEATURE_DIM = 16

# ---------------------------------------------------------------------------
# BMP (24-bit, uncompressed)
# ---------------------------------------------------------------------------

_BMP_HEADER_FMT = "<2sIHHI"           # signature, file size, res1, res2, data offset
_BMP_INFO_FMT = "<IiiHHIIiiII"        # BITMAPINFOHEADER


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BMP bytes (rows bottom-up, padded)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w = img.shape[:2]
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    data_size = (row_bytes + pad) * h
    offset = struct.calcsize(_BMP_HEADER_FMT) + struct.calcsize(_BMP_INFO_FMT)
    header = struct.pack(_BMP_HEADER_FMT, b"BM", offset + data_size, 0, 0, offset)
    info = struct.pack(_BMP_INFO_FMT, struct.calcsize(_BMP_INFO_FMT),
                       w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    # BMP stores BGR, bottom-up
    bgr = img[::-1, :, ::-1]
    if pad:
        rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
        rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    return header + info + body


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BMP bytes → (h, w, 3) uint8 RGB."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, offset = struct.unpack_from(_BMP_HEADER_FMT, data, 0)
    (hdr_size, w, h, planes, bpp, comp, _, _, _, _, _) = struct.unpack_from(
        _BMP_INFO_FMT, data, struct.calcsize(_BMP_HEADER_FMT))
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    if len(data) < offset + stride * h:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    bgr = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if bottom_up else rgb


def resize_nearest(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (integer index mapping)."""
    h, w = img.shape[:2]
    ys = (np.arange(new_h) * h) // max(new_h, 1)
    xs = (np.arange(new_w) * w) // max(new_w, 1)
    return img[np.clip(ys, 0, h - 1)][:, np.clip(xs, 0, w - 1)]


# ---------------------------------------------------------------------------
# WAV (PCM mono 16-bit)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples → WAV bytes (stdlib wave writer)."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> Tuple[np.ndarray, int]:
    """WAV bytes → (int16 mono samples, rate). Multi-channel is averaged."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        n_ch, sw, rate, n_frames = (wf.getnchannels(), wf.getsampwidth(),
                                    wf.getframerate(), wf.getnframes())
        if sw != 2:
            raise ValueError(f"unsupported sample width {sw}")
        raw = wf.readframes(n_frames)
    samples = np.frombuffer(raw, dtype=np.int16)
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1).astype(np.int16)
    return samples, rate


# ---------------------------------------------------------------------------
# RVID — minimal seekable frame container (frames are BMP)
# ---------------------------------------------------------------------------

_RVID_MAGIC = b"RVID1"


def encode_rvid(frames: List[np.ndarray]) -> bytes:
    parts = [_RVID_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        b = encode_bmp(f)
        parts.append(struct.pack("<I", len(b)))
        parts.append(b)
    return b"".join(parts)


def rvid_frame_count(data: bytes) -> int:
    if len(data) < 9 or data[:5] != _RVID_MAGIC:
        raise ValueError("not an RVID payload")
    return struct.unpack_from("<I", data, 5)[0]


def decode_rvid_frame(data: bytes, idx: int) -> np.ndarray:
    """Seek-decode frame ``idx`` without touching the other frames."""
    n = rvid_frame_count(data)
    if not 0 <= idx < n:
        raise ValueError(f"frame {idx} out of range (n={n})")
    pos = 9
    for i in range(n):
        (ln,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if i == idx:
            return decode_bmp(data[pos:pos + ln])
        pos += ln
    raise ValueError("corrupt RVID payload")


# ---------------------------------------------------------------------------
# 16-float feature vectors (the stages' downstream contract)
# ---------------------------------------------------------------------------

def image_features(img: np.ndarray) -> np.ndarray:
    """16 floats: dims, global channel stats, quadrant luminance, extrema.

    [w/4096, h/4096, aspect, meanR, meanG, meanB, stdR, stdG, stdB,
     q00, q01, q10, q11 (quadrant luma means), min, max, grad] / 255-scaled
    """
    h, w = img.shape[:2]
    f = img.astype(np.float32) / 255.0
    luma = f.mean(axis=2)
    hh, ww = max(h // 2, 1), max(w // 2, 1)
    quads = [luma[:hh, :ww].mean(), luma[:hh, ww:].mean() if w > 1 else 0.0,
             luma[hh:, :ww].mean() if h > 1 else 0.0,
             luma[hh:, ww:].mean() if (h > 1 and w > 1) else 0.0]
    grad = float(np.abs(np.diff(luma, axis=1)).mean()) if w > 1 else 0.0
    out = np.array(
        [w / 4096.0, h / 4096.0, w / max(h, 1),
         f[:, :, 0].mean(), f[:, :, 1].mean(), f[:, :, 2].mean(),
         f[:, :, 0].std(), f[:, :, 1].std(), f[:, :, 2].std(),
         quads[0], quads[1], quads[2], quads[3],
         float(f.min()), float(f.max()), grad],
        dtype=np.float32,
    )
    assert out.shape == (FEATURE_DIM,)
    return out


def ahash64(img: np.ndarray) -> int:
    """64-bit average hash (the classic aHash perceptual fingerprint):
    nearest-resize to 8×8, grayscale by channel mean, bit = pixel above
    the 64-cell mean; packed row-major MSB-first. Small pixel noise,
    re-encoding, and modest rescaling keep the hash within a few bits;
    Hamming distance is the near-duplicate metric."""
    small = resize_nearest(img, 8, 8).astype(np.float32).mean(axis=2)
    bits = (small > small.mean()).astype(np.uint64).ravel()
    return int((bits << np.arange(63, -1, -1, dtype=np.uint64)).sum())


def audio_fingerprints_hk(samples: np.ndarray,
                          win: int = 2048,
                          hop: int = 1024,
                          n_bands: int = 33) -> np.ndarray:
    """Haitsma–Kalker (2002) audio sub-fingerprints: one 32-bit word per
    analysis window. bit(n,m) = sign of the time-AND-band double
    difference of band energies — invariant to uniform amplitude
    scaling (all energies scale together, double differences keep
    sign). Returns uint64[n_windows-1] (first window is the diff
    seed). Deterministic: rectangular window, linear band edges, rfft.
    """
    x = samples.astype(np.float64)
    n_win = (len(x) - win) // hop + 1 if len(x) >= win else 0
    if n_win < 2:
        return np.zeros(0, dtype=np.uint64)
    idx = np.arange(win)[None, :] + hop * np.arange(n_win)[:, None]
    spec = np.abs(np.fft.rfft(x[idx], axis=1)) ** 2
    edges = np.linspace(1, spec.shape[1], n_bands + 1).astype(np.int64)
    bands = np.add.reduceat(spec, edges[:-1], axis=1)      # (n_win, n_bands)
    dd = np.diff(np.diff(bands, axis=1), axis=0)           # (n_win-1, 32)
    bits = (dd > 0).astype(np.uint64)
    return (bits << np.arange(bits.shape[1] - 1, -1, -1,
                              dtype=np.uint64)).sum(axis=1)


def audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """16 floats: duration, rate, RMS, zero-crossings, extrema + 8
    log-magnitude FFT bands (np.fft — real spectral features)."""
    x = samples.astype(np.float32) / 32768.0
    n = len(x)
    dur = n / max(rate, 1)
    rms = float(np.sqrt((x ** 2).mean())) if n else 0.0
    zcr = float((np.diff(np.signbit(x)).sum()) / max(n - 1, 1)) if n > 1 else 0.0
    if n:
        spec = np.abs(np.fft.rfft(x))
        bands = np.array_split(spec, 8)
        sb = [float(np.log1p(b.mean())) if len(b) else 0.0 for b in bands]
        xmin, xmax = float(x.min()), float(x.max())
    else:
        sb, xmin, xmax = [0.0] * 8, 0.0, 0.0
    out = np.array([dur, rate / 48000.0, rms, zcr, xmin, xmax, *sb, 0.0, 0.0],
                   dtype=np.float32)
    assert out.shape == (FEATURE_DIM,)
    return out
