"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched ``mapInPandas``.

Decode paths, by format:

* **binary PPM (P6)** — REALLY decoded, pure Python/numpy (the format
  is a whitespace header + raw RGB bytes; no codec library needed).
  Features are genuine pixel statistics (dimensions, channel moments,
  luma histogram) — see :func:`ppm_features`.
* **RIFF WAV (16-bit PCM)** — REALLY decoded, pure Python/numpy (the
  format is a 44-ish-byte chunked header + raw little-endian int16
  samples; no codec library needed). Features are genuine signal
  statistics (duration, RMS, peak, zero-crossing rate, amplitude
  histogram) — see :func:`wav_features`.
* **PNG (8-bit, non-interlaced; gray / RGB / palette / gray+alpha /
  RGBA)** — REALLY decoded with stdlib ``zlib`` + pure-Python filter
  reconstruction (None/Sub/Up/Average/Paeth per the PNG spec §9);
  converted to RGB and featurized by the SAME pixel-statistics layout
  as PPM — see :func:`decode_png` / :func:`png_features`.
* **Y4M video (YUV4MPEG2)** — REALLY decoded, pure Python/numpy (the
  format is a plain-text header + uncompressed per-frame YUV planes;
  the raw interchange format ffmpeg pipelines emit).  Frame sampling
  emits ACTUAL luma planes and features are genuine signal statistics
  (dimensions, frame rate, luma moments, temporal motion) — see
  :func:`decode_y4m` / :func:`y4m_features`.
* **baseline JPEG (ITU-T T.81 sequential DCT, Huffman, 8-bit; 4:4:4 /
  4:2:2 / 4:2:0, restart intervals)** — REALLY decoded, pure
  Python/numpy (canonical Huffman entropy decode, dequant, exact
  float64 IDCT, JFIF YCbCr→RGB); the dominant web image format no
  longer routes to the stub — see :func:`decode_jpeg` /
  :func:`jpeg_features`.
* **everything else** (progressive JPEG/MP3/compressed video) — the
  container ships no codec libraries, so those fall back to a
  clearly-marked stub (deterministic fake features keyed on the
  content hash). The Spark-side plumbing — schema, Arrow batching,
  partitioning — is identical for both paths; a real cluster swaps the
  fallback for PIL/torchaudio inside ``_fake_decode`` and nothing else
  changes.

Pattern per the north-star spec: binary payload stays opaque to
Catalyst; metadata columns (mime, width/height, duration) are real
columns so filters on them prune before any decode runs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_binary_meta",
    "decode_ppm",
    "ppm_features",
    "decode_png",
    "png_features",
    "decode_jpeg",
    "jpeg_features",
    "decode_image_features",
    "decode_wav",
    "wav_features",
    "wav_spectral_frames",
    "decode_audio_features",
    "decode_audio_spectral",
    "decode_y4m",
    "y4m_features",
    "video_features",
    "sample_video_frames",
]

HAS_CODECS = False  # no PIL/libav in this container; formats beyond PPM/PNG/baseline-JPEG/WAV/Y4M use the digest stub


def attach_binary_meta(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Typed metadata for an opaque binary column: byte length and
    sha256 content id — pure expressions, no decode. At scale these are
    written at ingest so dedup/filtering never touches the payload."""
    return df.withColumn("n_bytes", F.length(F.col(bin_col))).withColumn(
        "content_id", F.sha2(F.col(bin_col), 256)
    )


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray] | None:
    """REAL image decode for binary PPM (P6) — no codec library needed.

    Parses the header (magic, optional ``#`` comments, width, height,
    maxval, one whitespace byte) and returns ``(width, height, pixels)``
    with ``pixels`` a ``(h, w, 3)`` uint8 array, or ``None`` when the
    payload is not a well-formed 8-bit P6 image (wrong magic, truncated
    data, maxval ≠ 255)."""
    if not payload or not payload.startswith(b"P6"):
        return None
    i, n, vals = 2, len(payload), []
    while len(vals) < 3 and i < n:
        ch = payload[i : i + 1]
        if ch.isspace():
            i += 1
            continue
        if ch == b"#":
            while i < n and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
            continue
        j = i
        while j < n and payload[j : j + 1].isdigit():
            j += 1
        if j == i:
            return None
        vals.append(int(payload[i:j]))
        i = j
    if len(vals) < 3 or i >= n or not payload[i : i + 1].isspace():
        return None
    w, h, maxval = vals
    if maxval != 255 or w <= 0 or h <= 0:
        return None
    i += 1  # exactly one whitespace byte separates header from raster
    data = payload[i : i + w * h * 3]
    if len(data) < w * h * 3:
        return None
    return w, h, np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def _popstd(a: np.ndarray) -> float:
    m = a.mean()
    return float(np.sqrt(np.mean((a - m) ** 2)))


def ppm_features(payload: bytes, dim: int) -> np.ndarray | None:
    """Real pixel-statistics features from a decoded P6 image (``None``
    if the payload isn't one). Fixed 16-slot layout, zero-padded /
    truncated to ``dim``:

    ``[w, h, aspect, mean_r/255, mean_g/255, mean_b/255, std_r/255,
    std_g/255, std_b/255, mean_luma/255, luma_hist_0..3 (fractions in
    64-wide bins), min/255, max/255]``

    Every op is plain IEEE arithmetic with a fixed evaluation order
    (luma = ``(0.299r + 0.587g) + 0.114b``), so an external oracle that
    knows the pixel values reproduces the features bit-for-bit.
    """
    parsed = decode_ppm(payload)
    if parsed is None:
        return None
    w, h, px = parsed
    return _rgb_features(w, h, px, dim)


def _rgb_features(w: int, h: int, px: np.ndarray, dim: int) -> np.ndarray:
    """The shared 16-slot pixel-statistics layout over an ``(h, w, 3)``
    uint8 raster — one arithmetic body for every REAL image decode
    (PPM, PNG), so the analytic DuckDB oracles apply unchanged to any
    format that yields the same pixels."""
    pxf = px.astype(np.float64)
    r, g, b = pxf[..., 0], pxf[..., 1], pxf[..., 2]
    luma = (0.299 * r + 0.587 * g) + 0.114 * b
    bins = np.floor(luma / 64.0)
    feats = [
        float(w),
        float(h),
        w / h,
        r.mean() / 255.0,
        g.mean() / 255.0,
        b.mean() / 255.0,
        _popstd(r) / 255.0,
        _popstd(g) / 255.0,
        _popstd(b) / 255.0,
        luma.mean() / 255.0,
        float((bins == 0).mean()),
        float((bins == 1).mean()),
        float((bins == 2).mean()),
        float((bins == 3).mean()),
        pxf.min() / 255.0,
        pxf.max() / 255.0,
    ]
    out = np.zeros(dim, dtype=np.float64)
    k = min(dim, len(feats))
    out[:k] = feats[:k]
    return out


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per PNG color type (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor, PNG spec §9.4 — tie-breaks EXACTLY per
    spec (a, then b, then c) or real encoders' output misdecodes."""
    pp = a + b - c
    pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> tuple[int, int, np.ndarray] | None:
    """REAL image decode for PNG — stdlib ``zlib`` inflate plus
    pure-Python per-row filter reconstruction (None/Sub/Up/Average/
    Paeth, spec §9), no codec library needed (the PPM/WAV
    zero-dependency discipline; r11 verdict #5).

    Supports bit depth 8, interlace 0 (the overwhelming majority of
    real-world PNGs), all five color types — grayscale (0), RGB (2),
    palette (3, via PLTE lookup), gray+alpha (4), RGBA (6) — and
    multiple concatenated IDAT chunks.  Output is normalized to an
    ``(h, w, 3)`` uint8 RGB raster (alpha dropped, gray broadcast,
    palette resolved) so :func:`_rgb_features` and its analytic
    oracles apply unchanged.  Returns ``None`` for anything else
    (16-bit, Adam7, truncated, bad zlib stream, wrong magic) — the
    caller falls through to the digest stub.  CRCs are NOT verified:
    corrupt-but-inflatable data is the storage layer's problem, and
    skipping the check keeps the per-row cost at the filter math.
    """
    import zlib

    if not payload or not payload.startswith(_PNG_SIG):
        return None
    i, n = len(_PNG_SIG), len(payload)
    w = h = bitdepth = color = interlace = None
    plte = None
    idat = bytearray()
    while i + 8 <= n:
        clen = int.from_bytes(payload[i : i + 4], "big")
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + clen]
        if len(data) < clen:
            return None
        if ctype == b"IHDR":
            if clen != 13:
                return None
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            bitdepth, color = data[8], data[9]
            interlace = data[12]
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + clen  # len + tag + data + crc
    if (
        w is None
        or not w
        or not h
        or bitdepth != 8
        or interlace != 0
        or color not in _PNG_CHANNELS
        or not idat
    ):
        return None
    ch = _PNG_CHANNELS[color]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) < h * (stride + 1):
        return None
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += stride + 1
        # filter reconstruction cost probed on 256x256 RGB (BASELINE.md
        # r13): the original np-scalar loops ran Sub 80 ms / Average
        # 324 ms / Paeth 283 ms per image. Sub is a per-channel prefix
        # sum mod 256 — exactly vectorizable. Average/Paeth carry a
        # left-pixel dependency through a nonlinear >>1 / predictor, so
        # they stay sequential — but over bytearray ints (no numpy
        # scalar boxing), which is ~15-20x faster. Bit-identical by the
        # existing encoder round-trip tests.
        if ft == 0:
            pass
        elif ft == 1:  # Sub: row[x] = raw[x] + row[x-ch] == channel cumsum
            row = (
                (row.reshape(-1, ch).cumsum(axis=0, dtype=np.int64) & 0xFF)
                .astype(np.uint8)
                .reshape(-1)
            )
        elif ft == 2:  # Up
            row += prev
        elif ft == 3:  # Average
            r = bytearray(row.tobytes())
            p = prev.tobytes()
            for x in range(ch):
                r[x] = (r[x] + (p[x] >> 1)) & 0xFF
            for x in range(ch, stride):
                r[x] = (r[x] + ((r[x - ch] + p[x]) >> 1)) & 0xFF
            row = np.frombuffer(bytes(r), dtype=np.uint8)
        elif ft == 4:  # Paeth
            r = bytearray(row.tobytes())
            p = prev.tobytes()
            for x in range(ch):
                # left = ul = 0 -> the spec predictor reduces to up
                r[x] = (r[x] + p[x]) & 0xFF
            for x in range(ch, stride):
                a = r[x - ch]
                b = p[x]
                c = p[x - ch]
                pp = a + b - c
                pa = pp - a if pp >= a else a - pp
                pb = pp - b if pp >= b else b - pp
                pc = pp - c if pp >= c else c - pp
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                r[x] = (r[x] + pred) & 0xFF
            row = np.frombuffer(bytes(r), dtype=np.uint8)
        else:
            return None
        out[y] = row
        prev = row
    px = out.reshape(h, w, ch)
    if color == 2:
        rgb = px
    elif color == 6:
        rgb = px[..., :3]
    elif color == 0:
        rgb = np.repeat(px, 3, axis=2)
    elif color == 4:
        rgb = np.repeat(px[..., :1], 3, axis=2)
    else:  # palette
        if plte is None or len(plte) % 3:
            return None
        table = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idxs = px[..., 0]
        if int(idxs.max(initial=0)) >= len(table):
            return None
        rgb = table[idxs]
    return w, h, np.ascontiguousarray(rgb)


def png_features(payload: bytes, dim: int) -> np.ndarray | None:
    """Real pixel-statistics features from a decoded PNG (``None`` if
    the payload isn't one) — same 16-slot layout and arithmetic as
    :func:`ppm_features` via the shared :func:`_rgb_features` body, so
    the analytic oracle formula is format-independent."""
    parsed = decode_png(payload)
    if parsed is None:
        return None
    w, h, px = parsed
    return _rgb_features(w, h, px, dim)


# --------------------------------------------------------------------------
# baseline JPEG (ITU-T T.81): pure-Python Huffman + dequant + IDCT + YCbCr
# --------------------------------------------------------------------------

#: zigzag scan order (T.81 Figure 5): position k in the entropy stream
#: -> linear index row*8+col in the 8x8 block
_JPEG_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: 8x8 DCT-II basis M[u, x] = C(u)/2 * cos((2x+1) u pi / 16); the
#: 2-D inverse transform is M.T @ S @ M — one float64 matmul pair per
#: block, the exact T.81 A.3.3 definition (no integer fast-IDCT
#: approximation: the oracle replays the same arithmetic)
_JPEG_IDCT_M = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.float64,
)


class _JpegErr(Exception):
    pass


def _jpeg_canonical(bits: bytes, vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman assignment (T.81 Annex C): BITS[1..16] code
    counts + HUFFVAL -> {(length, code): symbol}."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise _JpegErr
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBits:
    """Entropy-segment bit reader: MSB-first, 0xFF00 byte unstuffing;
    any other 0xFF-marker mid-read raises (truncated/invalid scan)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        try:
            b = self.buf[self.pos]
            if b == 0xFF and self.buf[self.pos + 1] != 0x00:
                raise _JpegErr
        except IndexError:
            raise _JpegErr from None
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 2 if b == 0xFF else 1
        return v

    def receive(self, s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 2 if self.buf[self.pos] == 0xFF else 1

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise _JpegErr


def _jpeg_extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s received magnitude bits to the
    signed coefficient value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray] | None:
    """REAL image decode for baseline JPEG (ITU-T T.81 sequential DCT,
    Huffman, 8-bit) — pure Python/numpy, no codec library (the PNG
    recipe applied to the dominant web image format; r12 verdict
    next-round #4, retiring the digest stub for JPEG).

    Supports SOF0/SOF1 frames with 1 or 3 components, sampling factors
    1-2 (4:4:4 / 4:2:2 / 4:2:0), 8- and 16-bit DQT precision, multiple
    DQT/DHT tables per segment, restart intervals (DRI + RSTn with DC
    predictor reset), and 0xFF00 byte stuffing.  The pipeline is the
    spec's: canonical-Huffman entropy decode (DC category+EXTEND
    diffs, AC run/size with ZRL and EOB), dequantize in zigzag order,
    float64 separable IDCT (the exact A.3.3 basis — no fast-IDCT
    integer approximation, so the test encoder's analytic expectations
    hold to fp epsilon), +128 level shift with floor(x+0.5) rounding
    and [0,255] clamp, per-plane nearest-neighbor chroma upsample, and
    the JFIF YCbCr->RGB matrix with the same rounding.  Returns
    ``(w, h, (h,w,3) uint8 RGB)`` or ``None`` for anything non-baseline
    (progressive SOF2, arithmetic coding, 12-bit, >3 components,
    truncated streams) — the caller falls through to the digest stub.

    Per-bit Python entropy decode is the honest zero-dependency cost
    (same discipline as the PNG per-pixel filter loops); at 100 TB the
    decode is embarrassingly per-row inside the Arrow batches and the
    swap-in point for a C codec is this one function."""
    if not payload or not payload.startswith(b"\xff\xd8"):
        return None
    try:
        return _decode_jpeg_inner(payload)
    except (_JpegErr, IndexError, ValueError):
        return None


def _decode_jpeg_inner(payload: bytes) -> tuple[int, int, np.ndarray] | None:
    n = len(payload)
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    restart = 0
    rgb = None
    while i + 2 <= n:
        if payload[i] != 0xFF:
            return None
        m = payload[i + 1]
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:  # standalone
            i += 2
            continue
        if i + 4 > n:
            return None
        seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
        data = payload[i + 4 : i + 2 + seglen]
        if len(data) != seglen - 2:
            return None
        if m == 0xDB:  # DQT
            p = 0
            while p < len(data):
                prec, tid = data[p] >> 4, data[p] & 15
                p += 1
                if prec == 0:
                    q = np.frombuffer(data, np.uint8, 64, p).astype(np.float64)
                    p += 64
                else:
                    q = np.frombuffer(data, ">u2", 64, p).astype(np.float64)
                    p += 128
                qt[tid] = q
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(data):
                cls, tid = data[p] >> 4, data[p] & 15
                bits = data[p + 1 : p + 17]
                nv = sum(bits)
                vals = data[p + 17 : p + 17 + nv]
                huff[(cls, tid)] = _jpeg_canonical(bits, vals)
                p += 17 + nv
        elif m in (0xC0, 0xC1):  # SOF0/SOF1 (both baseline-Huffman)
            if data[0] != 8:
                return None  # 12-bit
            fh = int.from_bytes(data[1:3], "big")
            fw = int.from_bytes(data[3:5], "big")
            nc = data[5]
            if nc not in (1, 3) or not fh or not fw:
                return None
            comps = []
            for c in range(nc):
                o = 6 + 3 * c
                comps.append(
                    (data[o], data[o + 1] >> 4, data[o + 1] & 15, data[o + 2])
                )
            if any(hs not in (1, 2) or vs not in (1, 2) for _, hs, vs, _ in comps):
                return None
            frame = (fh, fw, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical
        elif m == 0xDD:  # DRI
            restart = int.from_bytes(data[0:2], "big")
        elif m == 0xDA:  # SOS
            if frame is None:
                return None
            rgb, i = _jpeg_scan(payload, i + 2 + seglen, data, frame, qt, huff, restart)
            continue
        i += 2 + seglen
    if rgb is None or frame is None:
        return None
    fh, fw = frame[0], frame[1]
    return fw, fh, rgb


def _jpeg_scan(payload, pos, sos, frame, qt, huff, restart):
    fh, fw, comps = frame
    ns = sos[0]
    if ns != len(comps):
        return None, pos  # partial scans (progressive-style) unsupported
    tabsel = {}
    for c in range(ns):
        cid, tt = sos[1 + 2 * c], sos[2 + 2 * c]
        tabsel[cid] = (tt >> 4, tt & 15)
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mx = -(-fw // (8 * hmax))
    my = -(-fh // (8 * vmax))
    planes = {}
    for cid, hs, vs, tq in comps:
        planes[cid] = np.zeros((my * vs * 8, mx * hs * 8), dtype=np.float64)
        if tq not in qt:
            raise _JpegErr
    bits = _JpegBits(payload, pos)
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for yy in range(my):
        for xx in range(mx):
            if restart and mcu_count and mcu_count % restart == 0:
                bits.align()
                if not (
                    payload[bits.pos] == 0xFF
                    and 0xD0 <= payload[bits.pos + 1] <= 0xD7
                ):
                    raise _JpegErr
                bits.pos += 2
                pred = {cid: 0 for cid, *_ in comps}
            for cid, hs, vs, tq in comps:
                dc_t, ac_t = tabsel[cid]
                try:
                    dct = huff[(0, dc_t)]
                    act = huff[(1, ac_t)]
                except KeyError:
                    raise _JpegErr from None
                q = qt[tq]
                for by in range(vs):
                    for bx in range(hs):
                        coef = np.zeros(64, dtype=np.float64)
                        s = bits.huff(dct)
                        if s > 11:
                            raise _JpegErr
                        diff = _jpeg_extend(bits.receive(s), s)
                        pred[cid] += diff
                        coef[0] = pred[cid] * q[0]
                        k = 1
                        while k < 64:
                            rs = bits.huff(act)
                            r, sz = rs >> 4, rs & 15
                            if sz == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise _JpegErr
                            coef[k] = _jpeg_extend(bits.receive(sz), sz) * q[k]
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_JPEG_ZIGZAG] = coef
                        sblk = block.reshape(8, 8)
                        pix = _JPEG_IDCT_M.T @ sblk @ _JPEG_IDCT_M + 128.0
                        py0 = (yy * vs + by) * 8
                        px0 = (xx * hs + bx) * 8
                        planes[cid][py0 : py0 + 8, px0 : px0 + 8] = pix
            mcu_count += 1
    bits.align()
    end = bits.pos
    # clamp + round each plane, upsample to full geometry, crop
    full = {}
    for cid, hs, vs, tq in comps:
        p = np.clip(np.floor(planes[cid] + 0.5), 0.0, 255.0)
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full[cid] = p[:fh, :fw]
    if len(comps) == 1:
        g = full[comps[0][0]].astype(np.uint8)
        rgb = np.repeat(g[:, :, None], 3, axis=2)
    else:
        y = full[comps[0][0]]
        cb = full[comps[1][0]] - 128.0
        cr = full[comps[2][0]] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack(
            [
                np.clip(np.floor(ch + 0.5), 0.0, 255.0).astype(np.uint8)
                for ch in (r, g, b)
            ],
            axis=2,
        )
    return rgb, end


def jpeg_features(payload: bytes, dim: int) -> np.ndarray | None:
    """Real pixel-statistics features from a decoded baseline JPEG
    (``None`` if the payload isn't one) — the shared
    :func:`_rgb_features` body, so the analytic oracle layout is
    format-independent across PPM/PNG/JPEG."""
    parsed = decode_jpeg(payload)
    if parsed is None:
        return None
    w, h, px = parsed
    return _rgb_features(w, h, px, dim)


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray] | None:
    """REAL audio decode for RIFF WAV, 16-bit PCM — no codec library
    needed (the format is public: RIFF container, ``fmt `` chunk with
    the sample geometry, ``data`` chunk with raw little-endian int16).

    Walks the chunk list (tolerating extra chunks like ``LIST``/
    ``fact`` and odd-size padding), requires PCM format 1 at 16 bits,
    and returns ``(sample_rate, n_channels, samples)`` with ``samples``
    an ``(n_frames, n_channels)`` int16 array, or ``None`` when the
    payload is not a well-formed 16-bit PCM WAV."""
    import struct

    if not payload or len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    rate = channels = None
    data: bytes | None = None
    i, n = 12, len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        (size,) = struct.unpack_from("<I", payload, i + 4)
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt != 1 or bits != 16 or channels < 1 or rate <= 0:
                return None
        elif cid == b"data":
            if len(body) < size:
                return None  # truncated raster
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or channels is None or data is None:
        return None
    n_frames = len(data) // (2 * channels)
    if n_frames == 0:
        return None
    raw = np.frombuffer(data[: n_frames * 2 * channels], dtype="<i2")
    return rate, channels, raw.reshape(n_frames, channels)


def wav_features(payload: bytes, dim: int) -> np.ndarray | None:
    """Real signal-statistics features from a decoded 16-bit PCM WAV
    (``None`` if the payload isn't one). Fixed 16-slot layout,
    zero-padded / truncated to ``dim``:

    ``[n_frames, sample_rate, n_channels, duration_s, mean/32768,
    rms/32768, peak_abs/32768, zcr_ch0, rms_ch0/32768, rms_ch1/32768
    (0 when mono), abs_hist_0..3 (fractions in 8192-wide bins, top bin
    clamped), min/32768, max/32768]``

    Every op is plain IEEE arithmetic with a fixed evaluation order, so
    an external oracle that knows the sample values reproduces the
    features bit-for-bit (same contract as :func:`ppm_features`)."""
    parsed = decode_wav(payload)
    if parsed is None:
        return None
    rate, channels, samples = parsed
    s = samples.astype(np.float64)
    flat = s.ravel()
    absf = np.abs(flat)
    ch0 = s[:, 0]
    zcr = float((ch0[1:] * ch0[:-1] < 0).mean()) if len(ch0) > 1 else 0.0
    bins = np.minimum(np.floor(absf / 8192.0), 3.0)
    feats = [
        float(s.shape[0]),
        float(rate),
        float(channels),
        s.shape[0] / rate,
        flat.mean() / 32768.0,
        float(np.sqrt(np.mean(flat * flat))) / 32768.0,
        absf.max() / 32768.0,
        zcr,
        float(np.sqrt(np.mean(ch0 * ch0))) / 32768.0,
        float(np.sqrt(np.mean(s[:, 1] * s[:, 1]))) / 32768.0 if channels > 1 else 0.0,
        float((bins == 0).mean()),
        float((bins == 1).mean()),
        float((bins == 2).mean()),
        float((bins == 3).mean()),
        flat.min() / 32768.0,
        flat.max() / 32768.0,
    ]
    out = np.zeros(dim, dtype=np.float64)
    k = min(dim, len(feats))
    out[:k] = feats[:k]
    return out


def decode_audio_features(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id", dim: int = 16, batch_limit: int = 1024
) -> DataFrame:
    """Decode + featurize binary audio via ``mapInPandas`` — the audio
    twin of :func:`decode_image_features`. Payloads that parse as
    16-bit PCM WAV get REAL signal-statistics features
    (:func:`wav_features`); other formats fall back to the
    deterministic digest stub. Same Arrow-batched plumbing and schema
    contract ``(id, feature: array<double>, n_bytes: int)``."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, feature array<double>, n_bytes int"

    def _decode(p: bytes) -> list[float]:
        real = wav_features(p, dim)
        return (real if real is not None else _fake_decode(p, dim)).tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "feature": [_decode(p) for p in pdf[bin_col]],
                    "n_bytes": [len(p or b"") for p in pdf[bin_col]],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)


def wav_spectral_frames(
    payload: bytes, frame_len: int = 256, use_fft: bool = True
) -> list[tuple] | None:
    """REAL frequency-domain audio features per non-overlapping frame
    of channel 0 of a 16-bit PCM WAV (``None`` if the payload isn't
    one) — the DSP layer :func:`wav_features`' time-domain stats lack:
    spectral centroid/bandwidth/rolloff(0.85)/flatness plus 4-band
    power fractions, the standard audio-quality/VAD feature set.

    The spectrum is the plain DFT of the RAW int16 frame (no window
    function, no pre-emphasis — deliberately the simplest spec an
    external oracle can restate: ``re_k = Σ_n v_n·cos(2π·k·n/N)``,
    ``im_k = -Σ_n v_n·sin(2π·k·n/N)``, k = 0..N/2).  ``use_fft=True``
    computes it with ``np.fft.rfft`` (O(N log N), the production
    path); ``False`` uses the literal cos/sin matmul — same values to
    ~1e-12 relative (pytest-asserted), and the matmul's operand order
    matches the SQL mirror's ``(2·pi())·(k·n)/N`` float sequence
    exactly, so the contract entry runs that path.

    Per frame: ``(frame_idx, rms, dc, zcr, centroid_hz, bandwidth_hz,
    rolloff_hz, flatness, band_frac[4])``.  rms/dc normalized by
    32768 like :func:`wav_features`; zcr = fraction of adjacent
    strict sign flips; silent frames get centroid/bandwidth/rolloff 0
    and band fractions 0 (guarded, not NaN).  The tail shorter than
    ``frame_len`` is dropped (the standard STFT convention).
    """
    parsed = decode_wav(payload)
    if parsed is None:
        return None
    rate, _channels, samples = parsed
    x = samples[:, 0].astype(np.float64)
    n_frames = len(x) // frame_len
    if n_frames == 0:
        return []
    Xf = x[: n_frames * frame_len].reshape(n_frames, frame_len)
    K = frame_len // 2 + 1
    if use_fft:
        spec = np.fft.rfft(Xf, axis=1)
        re, im = spec.real, spec.imag
    else:
        n = np.arange(frame_len, dtype=np.float64)
        k = np.arange(K, dtype=np.float64)
        ang = (2.0 * np.pi) * np.outer(n, k) / float(frame_len)
        re = Xf @ np.cos(ang)
        im = -(Xf @ np.sin(ang))
    power = re * re + im * im
    mag = np.sqrt(power)
    freqs = np.arange(K, dtype=np.float64) * float(rate) / float(frame_len)
    msum = mag.sum(axis=1)
    psum = power.sum(axis=1)
    safe_m = np.where(msum > 0, msum, 1.0)
    centroid = np.where(msum > 0, (mag @ freqs) / safe_m, 0.0)
    dev = freqs[None, :] - centroid[:, None]
    bandwidth = np.where(
        msum > 0, np.sqrt((mag * dev * dev).sum(axis=1) / safe_m), 0.0
    )
    p1 = power[:, 1:]
    flatness = np.exp(np.mean(np.log(p1 + 1e-12), axis=1)) / (
        np.mean(p1, axis=1) + 1e-12
    )
    cum = np.cumsum(power, axis=1)
    roll_idx = np.argmax(cum >= 0.85 * psum[:, None], axis=1)
    rolloff = np.where(psum > 0, freqs[roll_idx], 0.0)
    band = np.minimum(np.arange(K) // max(1, K // 4), 3)
    safe_p = np.where(psum > 0, psum, 1.0)
    band_frac = np.stack(
        [
            np.where(psum > 0, power[:, band == b].sum(axis=1) / safe_p, 0.0)
            for b in range(4)
        ],
        axis=1,
    )
    rms = np.sqrt((Xf * Xf).mean(axis=1)) / 32768.0
    dc = Xf.mean(axis=1) / 32768.0
    zcr = (Xf[:, 1:] * Xf[:, :-1] < 0).mean(axis=1)
    return [
        (
            int(f),
            float(rms[f]),
            float(dc[f]),
            float(zcr[f]),
            float(centroid[f]),
            float(bandwidth[f]),
            float(rolloff[f]),
            float(flatness[f]),
            [float(v) for v in band_frac[f]],
        )
        for f in range(n_frames)
    ]


def decode_audio_spectral(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    frame_len: int = 256,
    use_fft: bool = True,
) -> DataFrame:
    """Framewise spectral featurization of binary audio via
    ``mapInPandas`` (:func:`wav_spectral_frames` per payload) — one
    output row per (payload, frame).  Non-WAV payloads produce zero
    rows (featurize what decodes, skip what doesn't — the multimodal
    hygiene convention; pair with :func:`attach_binary_meta` to audit
    skip rates).  Same Arrow-batch plumbing as
    :func:`decode_audio_features`; work is embarrassingly parallel
    across rows, so at 100 TB the operator scales with the scan."""
    id_type = dict(df.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, frame_idx int, rms double, dc double, "
        "zcr double, centroid_hz double, bandwidth_hz double, "
        "rolloff_hz double, flatness double, band_frac array<double>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {c: [] for c in (
                id_col, "frame_idx", "rms", "dc", "zcr", "centroid_hz",
                "bandwidth_hz", "rolloff_hz", "flatness", "band_frac",
            )}
            for rid, p in zip(pdf[id_col], pdf[bin_col]):
                frames = wav_spectral_frames(p, frame_len=frame_len, use_fft=use_fft)
                if not frames:
                    continue
                for fr in frames:
                    out[id_col].append(rid)
                    for name, val in zip(
                        ("frame_idx", "rms", "dc", "zcr", "centroid_hz",
                         "bandwidth_hz", "rolloff_hz", "flatness", "band_frac"),
                        fr,
                    ):
                        out[name].append(val)
            if not out[id_col]:
                # an all-skipped batch: an empty default-dtype frame
                # would make Arrow refuse the list<double> column
                continue
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """STUB decode: deterministic pseudo-features from the content hash
    — feature j is sha256 digest byte j scaled to [-1, 1].

    Raises nothing — a real deployment replaces this with
    `PIL.Image.open` / `torchaudio.load` (PPM, PNG and PCM WAV
    already decode for real above); it is isolated so that swap
    touches one function. Marked fake so no one mistakes the features
    for real embeddings. Chosen over an RNG fake because any engine can
    reproduce it (the DuckDB oracle value-checks the whole decode
    pipeline); dim ≤ 32 (sha256 digest length).
    """
    if HAS_CODECS:  # pragma: no cover
        raise NotImplementedError("real codec path not available in this container")
    if dim > 32:
        raise ValueError("stub features support dim <= 32 (sha256 digest bytes)")
    digest = hashlib.sha256(payload or b"").digest()
    return np.array([(b / 255.0) * 2.0 - 1.0 for b in digest[:dim]], dtype=np.float64)


def decode_image_features(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id", dim: int = 16, batch_limit: int = 1024
) -> DataFrame:
    """Decode + featurize binary images via ``mapInPandas``.

    Real plumbing: Arrow batches in, one vectorized pass per batch,
    schema ``(id, feature: array<float>, n_bytes: int)``. Payloads that
    parse as binary PPM (P6), 8-bit non-interlaced PNG, or baseline
    JPEG get REAL pixel-statistics features (:func:`ppm_features` /
    :func:`png_features` / :func:`jpeg_features` — one shared
    arithmetic body, so the feature contract is format-independent);
    other formats fall back to the deterministic digest stub. ``spark.sql.execution.arrow.
    maxRecordsPerBatch`` bounds batch memory when payloads are MBs each
    (set ``batch_limit`` accordingly on a real cluster)."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, feature array<double>, n_bytes int"

    def _decode(p: bytes) -> list[float]:
        real = ppm_features(p, dim)
        if real is None:
            real = png_features(p, dim)
        if real is None:
            real = jpeg_features(p, dim)
        return (real if real is not None else _fake_decode(p, dim)).tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [_decode(p) for p in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "feature": feats,
                    "n_bytes": [len(p or b"") for p in pdf[bin_col]],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)


def decode_y4m(payload: bytes) -> tuple[int, int, tuple[int, int], np.ndarray] | None:
    """REAL video decode for Y4M (YUV4MPEG2) — no codec library
    needed: a plain-text stream header (``YUV4MPEG2 W<w> H<h>
    F<num>:<den> ... [C<cs>]``) followed by ``FRAME`` markers and raw
    uncompressed planes.  This is the raw interchange format ffmpeg
    pipelines read/write (``-f yuv4mpegpipe``), so at 100 TB the
    decode step upstream is a transcode INTO this shape, and the
    Spark-side featurization is real, not stubbed.

    Supports 8-bit ``C420`` (+jpeg/mpeg2/paldv tags), ``C444`` and
    ``Cmono``; returns ``(width, height, (fps_num, fps_den),
    frames)`` with ``frames`` an ``(n, h, w)`` uint8 array of LUMA
    planes (the Y channel — chroma is parsed past, not returned:
    every downstream feature here is luma-based, the standard
    video-statistics practice).  ``None`` for anything malformed
    (wrong magic, truncated frame, unknown chroma, missing W/H).
    """
    if not payload or not payload.startswith(b"YUV4MPEG2"):
        return None
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    fn, fd = 30, 1
    cs = b"420"
    for p in payload[9:nl].split():
        tag, val = p[:1], p[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F" and b":" in val:
            a, b = val.split(b":", 1)
            fn, fd = int(a), int(b)
        elif tag == b"C":
            cs = val
    if not w or not h or fd <= 0:
        return None
    if cs.startswith(b"420"):
        fsize = w * h + 2 * ((w // 2) * (h // 2))
    elif cs == b"444":
        fsize = 3 * w * h
    elif cs == b"mono":
        fsize = w * h
    else:
        return None
    frames = []
    i, n = nl + 1, len(payload)
    while i < n:
        if payload[i : i + 5] != b"FRAME":
            return None
        nl2 = payload.find(b"\n", i)
        if nl2 < 0:
            return None
        data = payload[nl2 + 1 : nl2 + 1 + fsize]
        if len(data) < fsize:
            return None
        frames.append(
            np.frombuffer(data, dtype=np.uint8, count=w * h).reshape(h, w)
        )
        i = nl2 + 1 + fsize
    if not frames:
        return None
    return w, h, (fn, fd), np.stack(frames)


def y4m_features(payload: bytes) -> dict | None:
    """Real video-signal statistics from a decoded Y4M stream
    (``None`` if the payload isn't one): dimensions, frame count,
    frame rate, luma mean/std over ALL frames' pixels, and ``motion``
    — the mean absolute luma difference between consecutive frames
    (0.0 for a single frame), the standard cheap temporal-activity
    readout.  Plain IEEE arithmetic in a fixed order, so an analytic
    oracle that knows the luma formula reproduces every value."""
    parsed = decode_y4m(payload)
    if parsed is None:
        return None
    w, h, (fn, fd), Y = parsed
    Yf = Y.astype(np.float64)
    feats = {
        "width": w,
        "height": h,
        "n_frames": int(Y.shape[0]),
        "fps_num": fn,
        "fps_den": fd,
        "mean_luma": float(Yf.mean()),
        "std_luma": _popstd(Yf),
        "motion": float(np.abs(np.diff(Yf, axis=0)).mean())
        if Y.shape[0] > 1
        else 0.0,
    }
    return feats


def video_features(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode + featurize binary video via ``mapInPandas`` — the video
    member of the decode family (images: :func:`decode_image_features`,
    audio: :func:`decode_audio_features`).  Y4M payloads get REAL
    signal statistics (:func:`y4m_features`); other formats yield NULL
    feature columns with ``is_real=false`` (videos are opaque without
    codecs — a NULL row is honest where the digest stub would
    masquerade as measurement; filter on ``is_real`` downstream).
    Schema: ``(id, width, height, n_frames, fps_num, fps_den,
    mean_luma, std_luma, motion, n_bytes, is_real)``."""
    id_type = dict(df.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, width int, height int, n_frames int, "
        "fps_num int, fps_den int, mean_luma double, std_luma double, "
        "motion double, n_bytes int, is_real boolean"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "width", "height", "n_frames", "fps_num", "fps_den",
            "mean_luma", "std_luma", "motion",
        ]
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                f = y4m_features(payload)
                base = {id_col: rid, "n_bytes": len(payload or b"")}
                if f is None:
                    base.update({c: None for c in cols})
                    base["is_real"] = False
                else:
                    base.update(f)
                    base["is_real"] = True
                rows.append(base)
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)


def sample_video_frames(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 10,
    frame_bytes: int = 64,
) -> DataFrame:
    """Frame sampling for video payloads, row shape
    ``(id, frame_idx, frame_payload)``.

    Y4M payloads (:func:`decode_y4m`) take the REAL path: every
    ``every_n``-th ACTUAL frame is emitted with ``frame_idx`` = its
    source frame index and ``frame_payload`` = the raw luma plane
    bytes (r12 — the stub retired for the format the decode family
    supports).  Other payloads keep the documented stub (byte-stream
    slices at fixed strides — a codec-equipped deployment swaps the
    slice for its decoder at the same row shape)."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, frame_idx int, frame_payload binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, idxs, frames = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                payload = payload or b""
                parsed = decode_y4m(payload)
                if parsed is not None:
                    _, _, _, Y = parsed
                    for i in range(0, Y.shape[0], max(every_n, 1)):
                        ids.append(rid)
                        idxs.append(i)
                        frames.append(Y[i].tobytes())
                    continue
                stride = frame_bytes * every_n
                for i, off in enumerate(range(0, max(len(payload), 1), max(stride, 1))):
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(payload[off : off + frame_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_payload": frames})

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)
