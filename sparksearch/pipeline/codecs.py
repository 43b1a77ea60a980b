"""Pure-python media codecs (stdlib + numpy only — no PIL/torchaudio).

Real decoders for the formats that need no external codec library:

- PNG (8-bit gray/RGB/RGBA, non-interlaced): zlib inflate + per-row
  unfilter (spec: https://www.w3.org/TR/png-3/, public).
- BMP (24/32-bit uncompressed BITMAPINFOHEADER).
- WAV (PCM 8/16-bit) via the stdlib ``wave`` module.

Plus real feature extraction:
- image embedding: block-mean downsampled grayscale, zero-centered.
- audio MFCCs: frame → rFFT power → mel filterbank → log → DCT-II,
  all in numpy.

Encoders for PNG and WAV exist so the synthetic test corpus contains
REAL files and the decode path is exercised end-to-end.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # colortype → channels


def is_png(data: bytes) -> bool:
    return bool(data) and data[:8] == _PNG_SIG


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w, channels)."""
    if not is_png(data):
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    idat = b""
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, colortype, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0 or colortype not in _CHANNELS:
        raise ValueError(f"unsupported PNG variant (depth={depth}, "
                         f"colortype={colortype}, interlace={interlace})")
    ch = _CHANNELS[colortype]
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)],
            dtype=np.uint8).astype(np.int32)
        if f == 0:
            cur = row
        elif f == 2:  # up
            cur = (row + prev) % 256
        else:  # sequential filters: sub / average / paeth
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = int(prev[x])
                if f == 1:
                    cur[x] = (row[x] + a) % 256
                elif f == 3:
                    cur[x] = (row[x] + (a + b) // 2) % 256
                elif f == 4:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                    cur[x] = (row[x] + pred) % 256
                else:
                    raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out.reshape(h, w, ch)


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 (h, w, channels∈{1,3,4}) → PNG bytes (filter 0 rows)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    colortype = {1: 0, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# BMP (24/32-bit uncompressed)
# ---------------------------------------------------------------------------

def is_bmp(data: bytes) -> bool:
    return bool(data) and data[:2] == b"BM"


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → uint8 (h, w, 3) — 24/32-bit BI_RGB only."""
    if not is_bmp(data):
        raise ValueError("not a BMP")
    off = struct.unpack("<I", data[10:14])[0]
    hsz = struct.unpack("<I", data[14:18])[0]
    if hsz < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack("<ii", data[18:26])
    bpp = struct.unpack("<H", data[28:30])[0]
    comp = struct.unpack("<I", data[30:34])[0]
    if bpp not in (24, 32) or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = h > 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = []
    for y in range(h):
        row = np.frombuffer(data[off + y * stride: off + y * stride + w * nch],
                            dtype=np.uint8).reshape(w, nch)
        rows.append(row[:, :3][:, ::-1])  # BGR(A) → RGB
    arr = np.stack(rows)
    return arr[::-1] if flip else arr


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def is_wav(data: bytes) -> bool:
    return bool(data) and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple:
    """WAV bytes → (sample_rate, float32 mono samples in [-1, 1])."""
    import wave
    with wave.open(io.BytesIO(data), "rb") as wf:
        sr = wf.getframerate()
        n = wf.getnframes()
        width = wf.getsampwidth()
        nch = wf.getnchannels()
        raw = wf.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return sr, x


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float mono [-1,1] → 16-bit PCM WAV bytes."""
    import wave
    buf = io.BytesIO()
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1, 1)
    pcm = (pcm * 32767).astype("<i2")
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# features
# ---------------------------------------------------------------------------

def image_embedding(pixels: np.ndarray, dim: int = 16) -> list:
    """Zero-centered block-mean grayscale embedding of length ``dim``."""
    px = pixels.astype(np.float32)
    gray = px.mean(axis=2) if px.ndim == 3 else px
    side = max(1, int(np.sqrt(dim)))
    n = side * side
    h, w = gray.shape
    ys = np.linspace(0, h, side + 1).astype(int)
    xs = np.linspace(0, w, side + 1).astype(int)
    cells = []
    for i in range(side):
        for j in range(side):
            block = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                         xs[j]:max(xs[j + 1], xs[j] + 1)]
            cells.append(float(block.mean()) / 255.0 - 0.5)
    cells += [0.0] * (dim - n)
    return cells[:dim]


def _mel_filterbank(n_mels: int, n_fft: int, sr: int) -> np.ndarray:
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel2hz(m):
        return 700.0 * (10 ** (m / 2595.0) - 1.0)

    mels = np.linspace(hz2mel(0), hz2mel(sr / 2), n_mels + 2)
    bins = np.floor((n_fft + 1) * mel2hz(mels) / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        lo, mid, hi = bins[i], bins[i + 1], bins[i + 2]
        for k in range(lo, mid):
            if mid > lo:
                fb[i, k] = (k - lo) / (mid - lo)
        for k in range(mid, hi):
            if hi > mid:
                fb[i, k] = (hi - k) / (hi - mid)
    return fb


def mfcc(samples: np.ndarray, sr: int, n_mfcc: int = 13,
         n_fft: int = 512, hop: int = 256, n_mels: int = 26) -> list:
    """Mean MFCC vector over frames — rFFT power → mel filterbank →
    log → DCT-II, numpy only."""
    x = np.asarray(samples, dtype=np.float64)
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    win = np.hanning(n_fft)
    frames = []
    for start in range(0, len(x) - n_fft + 1, hop):
        spec = np.abs(np.fft.rfft(x[start:start + n_fft] * win)) ** 2
        frames.append(spec)
    power = np.stack(frames)
    fb = _mel_filterbank(n_mels, n_fft, sr)
    mel = np.log(power @ fb.T + 1e-10)
    # DCT-II
    k = np.arange(n_mfcc)[:, None]
    n = np.arange(n_mels)[None, :]
    dct = np.cos(np.pi * k * (2 * n + 1) / (2 * n_mels))
    coef = mel @ dct.T
    return [float(v) for v in coef.mean(axis=0)]
