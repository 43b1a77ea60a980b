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


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT, ITU-T T.81 — public spec)
#
# Decoder: SOI/APPn/DQT/SOF0/DHT/DRI/SOS/RSTn/EOI, 8-bit precision,
# grayscale or YCbCr with any sampling factors (chroma upsampled by
# replication), restart intervals, byte-stuffed entropy data.
# Encoder: 4:4:4 (no subsampling), Annex K example quantization and
# Huffman tables — exists so tests exercise decode on REAL jpeg bytes
# without any external codec library.  Progressive/arithmetic/12-bit
# JPEG are out of scope (raise ValueError → callers' fallback path).
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# ITU-T T.81 Annex K.1 example quantization tables (quality ~50)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99])
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99])

# Annex K.3 typical Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
_HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
_HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    C = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    C[0, :] /= np.sqrt(2)
    return C


def _huff_codes(bits, vals):
    """Canonical Huffman (T.81 Annex C): {(length, code): symbol}."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return out


def is_jpeg(data: bytes) -> bool:
    return len(data) > 3 and data[:2] == b"\xff\xd8"


class _BitReader:
    """MSB-first bit reader over byte-stuffed JPEG entropy data."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:          # stuffed byte
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RST handled by caller via align
                raise _RestartMarker()
            else:
                # EOI or other marker: feed 0 bits (T.81 F.2.2.5 allows
                # padding past the end of a correctly terminated scan)
                self.bits = (self.bits << 8) & 0xFFFFFFFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bits = ((self.bits << 8) | b) & 0xFFFFFFFF
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_past_restart(self):
        """Skip to just past the next RSTn marker, dropping pad bits."""
        self.bits = 0
        self.nbits = 0
        d = self.data
        while not (d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    pass


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_huff(br: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 array (h, w) gray or (h, w, 3) RGB."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG")
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    restart_interval = 0
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = struct.unpack(">H", data[i + 2:i + 4])[0]
        body = data[i + 4:i + 2 + seglen]
        if marker == 0xDB:                      # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(body[j + 1:j + 65], np.uint8
                                       ).astype(np.int32)
                j += 65
        elif marker == 0xC4:                    # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1:j + 17])
                nv = sum(bits)
                vals = list(body[j + 17:j + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_codes(bits, vals)
                j += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + c * 3:9 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDD:                    # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:                    # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + c * 2], body[2 + c * 2]
                scan.append((cs, tt >> 4, tt & 0x0F))
            return _decode_scan(data, i + 2 + seglen, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        i += 2 + seglen
    raise ValueError("no SOS marker")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    C = _dct_matrix()
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               np.float64))
    by_id = {c["id"]: (k, c) for k, c in enumerate(comps)}
    order = []
    for cs, td, ta in scan:
        k, c = by_id[cs]
        order.append((k, c, huff_dc[td], huff_ac[ta],
                      qt[c["tq"]].astype(np.float64)))
    pred = [0] * len(comps)
    br = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_past_restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for k, c, hdc, hac, q in order:
                for byi in range(c["v"]):
                    for bxi in range(c["h"]):
                        zz = np.zeros(64, np.float64)
                        try:
                            t = _decode_huff(br, hdc)
                            diff = _extend(br.receive(t), t)
                            pred[k] += diff
                            zz[0] = pred[k]
                            j = 1
                            while j < 64:
                                rs = _decode_huff(br, hac)
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r == 15:
                                        j += 16
                                        continue
                                    break          # EOB
                                j += r
                                if j > 63:
                                    break
                                zz[j] = _extend(br.receive(s), s)
                                j += 1
                        except _RestartMarker:
                            raise ValueError("unexpected restart marker")
                        blk = np.zeros(64, np.float64)
                        blk[_ZIGZAG] = zz * q
                        B = blk.reshape(8, 8)
                        pix = C.T @ B @ C + 128.0
                        y0 = (my * c["v"] + byi) * 8
                        x0 = (mx * c["h"] + bxi) * 8
                        planes[k][y0:y0 + 8, x0:x0 + 8] = pix
    # upsample to full resolution by replication, crop to (h, w)
    out = []
    for k, c in enumerate(comps):
        p = planes[k]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(out[0].round(), 0, 255).astype(np.uint8)
    Y, Cb, Cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = Y + 1.402 * Cr
    g = Y - 0.344136 * Cb - 0.714136 * Cr
    b = Y + 1.772 * Cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255
                   ).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                b = self.acc
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)      # byte stuffing
                self.acc = 0
                self.nacc = 0

    def pad(self):
        """1-pad to byte boundary (T.81 F.1.2.3)."""
        while self.nacc:
            self.write(1, 1)


def _enc_table(bits, vals):
    codes = _huff_codes(bits, vals)
    return {sym: (code, ln) for (ln, code), sym in codes.items()}


def _mag(v: int) -> tuple:
    """(category, magnitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


def encode_jpeg(pixels: np.ndarray, restart_interval: int = 0) -> bytes:
    """Baseline JPEG encoder: 8-bit gray or RGB, 4:4:4, Annex K tables.
    Exists so the decode path can be tested on real jpeg bytes."""
    px = np.asarray(pixels)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        comps = [px.astype(np.float64)]
    else:
        r, g, b = (px[..., k].astype(np.float64) for k in range(3))
        comps = [0.299 * r + 0.587 * g + 0.114 * b,
                 -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    C = _dct_matrix()
    qts = [_QT_LUMA] + ([] if gray else [_QT_CHROMA, _QT_CHROMA])
    dc_t = [_enc_table(*_HT_DC_LUMA)] + (
        [] if gray else [_enc_table(*_HT_DC_CHROMA)] * 2)
    ac_t = [_enc_table(*_HT_AC_LUMA)] + (
        [] if gray else [_enc_table(*_HT_AC_CHROMA)] * 2)
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = []
    for p in comps:
        q = np.empty((bh * 8, bw * 8))
        q[:h, :w] = p
        q[h:, :w] = p[-1:, :]
        q[:, w:] = q[:, w - 1:w]
        padded.append(q)

    bwriter = _BitWriter()
    pred = [0] * len(comps)
    mcu = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bwriter.pad()
                bwriter.out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                pred = [0] * len(comps)
            mcu += 1
            for k, p in enumerate(padded):
                B = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                D = C @ B @ C.T
                qz = np.round(D.flatten() / qts[k]
                              .reshape(8, 8).flatten()).astype(int)
                zz = qz[_ZIGZAG]
                diff = int(zz[0]) - pred[k]
                pred[k] = int(zz[0])
                t, m = _mag(diff)
                code, ln = dc_t[k][t]
                bwriter.write(code, ln)
                if t:
                    bwriter.write(m, t)
                run = 0
                for j in range(1, 64):
                    v = int(zz[j])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_t[k][0xF0]     # ZRL
                        bwriter.write(code, ln)
                        run -= 16
                    t, m = _mag(v)
                    code, ln = ac_t[k][(run << 4) | t]
                    bwriter.write(code, ln)
                    bwriter.write(m, t)
                    run = 0
                if run:
                    code, ln = ac_t[k][0x00]         # EOB
                    bwriter.write(code, ln)
    bwriter.pad()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    nc = len(comps)
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(_QT_LUMA.tolist()))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(_QT_CHROMA.tolist()))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for k in range(nc):
        sof += bytes([k + 1, 0x11, 0 if k == 0 else 1])
    out += seg(0xC0, sof)
    for tc, th, (bits, vals) in (
            [(0, 0, _HT_DC_LUMA), (1, 0, _HT_AC_LUMA)] +
            ([] if gray else [(0, 1, _HT_DC_CHROMA), (1, 1, _HT_AC_CHROMA)])):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for k in range(nc):
        sos += bytes([k + 1, 0x00 if k == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bwriter.out
    out += b"\xff\xd9"
    return bytes(out)
