"""Pure NumPy + stdlib-zlib PNG codec (8-bit RGB, color type 2).

Implements the public PNG specification (W3C PNG / RFC 2083):
IHDR/IDAT/IEND chunk framing with CRC-32, DEFLATE via stdlib ``zlib``,
and the five scanline filters.  No image library needed — this makes
``fmt='png'`` a REAL decodable payload format in this engine rather
than a stub (the reference engine treats image payloads as decodable
bytes; see reference README data model).  Standards compliance is
cross-checked in tests against libpng itself (via libgd through
ctypes, when present): every PNG this module writes decodes to exact
pixel equality under libpng, and every libpng-written RGB PNG decodes
exactly under this module.

Performance shape: ENCODING is fully vectorized for all five filter
types (each predictor reads ORIGINAL neighbor bytes, all known up
front), including the spec's adaptive minimum-sum-of-absolutes
heuristic.  DECODING is vectorized for filters 0/None (copy), 1/Sub
(per-row prefix sum mod 256) and 2/Up (previous reconstructed row);
filters 3/Average and 4/Paeth reconstruct sequentially in the scan
direction by definition, so they take a per-byte loop — our encoder's
adaptive heuristic rarely picks them, and the loop only runs for
foreign PNGs that used them.  All of this executes inside
Arrow-batched ``mapInPandas`` workers (one call per image, vectorized
over pixels), never per-row-of-DataFrame Python.
"""
from __future__ import annotations

import struct
import zlib
from typing import Optional

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _filter_all(img: np.ndarray) -> dict:
    """Filtered scanline bytes for every filter type, each (h, w*3)
    uint8.  Vectorized: predictors read original bytes (encode side
    has no sequential dependency)."""
    h, w, _ = img.shape
    raw = img.reshape(h, w * 3).astype(np.int16)
    left = np.zeros_like(raw)
    left[:, 3:] = raw[:, :-3]          # a: byte one pixel (bpp=3) left
    up = np.zeros_like(raw)
    up[1:, :] = raw[:-1, :]            # b: byte above
    ul = np.zeros_like(raw)
    ul[1:, 3:] = raw[:-1, :-3]         # c: upper-left
    out = {0: raw.copy(), 1: raw - left, 2: raw - up,
           3: raw - (left + up) // 2}
    p = left + up - ul
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
    pred = np.where((pa <= pb) & (pa <= pc), left,
                    np.where(pb <= pc, up, ul))
    out[4] = raw - pred
    return {k: (v & 0xFF).astype(np.uint8) for k, v in out.items()}


def encode_png(img: np.ndarray, level: int = 6,
               filter_strategy: str = "adaptive") -> bytes:
    """Encode ``(h, w, 3)`` uint8 -> standards-compliant PNG bytes.

    ``filter_strategy``: ``'adaptive'`` picks per row the filter
    minimizing the sum of absolute filtered values (the spec's
    suggested heuristic); ``'fixed:N'`` forces filter N on every row
    (tests use this to exercise each decode path).
    """
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError(f"expected (h, w, 3) RGB, got {img.shape}")
    cand = _filter_all(img)
    if filter_strategy.startswith("fixed:"):
        choice = np.full(h, int(filter_strategy.split(":")[1]),
                         dtype=np.uint8)
    else:
        # minimum sum of |signed filtered byte| per row, over filters
        costs = np.stack([
            np.abs(cand[k].astype(np.int16)
                   - 256 * (cand[k] > 127)).sum(axis=1)
            for k in range(5)])                        # (5, h)
        choice = costs.argmin(axis=0).astype(np.uint8)
    stream = np.empty((h, 1 + w * 3), dtype=np.uint8)
    stream[:, 0] = choice
    for k in range(5):
        rows = choice == k
        if rows.any():
            stream[rows, 1:] = cand[k][rows]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(stream.tobytes(), level)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def decode_png(buf: bytes, expect_w: Optional[int] = None,
               expect_h: Optional[int] = None) -> np.ndarray:
    """Decode PNG bytes -> ``(h, w, 3)`` uint8.  Supports 8-bit RGB
    (color type 2), non-interlaced — the profile this engine writes;
    other profiles raise ``NotImplementedError``.  Chunk CRCs are
    verified; ancillary chunks are skipped."""
    if buf[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos, w, h = 8, None, None
    idat = []
    saw_iend = False
    while pos + 12 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos:pos + 4])
        if pos + 12 + length > len(buf):
            raise ValueError("PNG truncated mid-chunk")
        tag = buf[pos + 4:pos + 8]
        payload = buf[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", buf[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, bitd, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", payload)
            if (bitd, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit RGB non-interlaced PNG is supported; "
                    f"got bitdepth={bitd} colortype={ctype} "
                    f"interlace={inter}")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            saw_iend = True
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    if not saw_iend:
        raise ValueError("PNG truncated: no IEND chunk")
    if expect_w is not None and (w, h) != (expect_w, expect_h):
        raise ValueError(
            f"PNG is {w}x{h}, metadata says {expect_w}x{expect_h}")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"PNG IDAT stream corrupt: {e}") from e
    stream = np.frombuffer(raw, dtype=np.uint8)
    if stream.size != h * (1 + w * 3):
        raise ValueError("PNG IDAT stream has wrong length")
    stream = stream.reshape(h, 1 + w * 3)
    filters = stream[:, 0]
    data = stream[:, 1:]
    recon = np.zeros((h, w * 3), dtype=np.uint8)
    prev = np.zeros(w * 3, dtype=np.uint8)
    row = 0
    while row < h:
        f = filters[row]
        if f in (0, 2):
            # None/Up run: recon[r] = data[r] (+ recon[r-1] if Up).
            # Row loop with a fully vectorized body over the width.
            end = row
            while end < h and filters[end] in (0, 2):
                end += 1
            cur = prev.astype(np.int16)
            for r in range(row, end):
                if filters[r] == 2:
                    cur = (data[r] + cur) & 0xFF
                else:
                    cur = data[r].astype(np.int16)
                recon[r] = cur.astype(np.uint8)
            prev = recon[end - 1]
            row = end
        elif f == 1:
            # Sub: prefix sum with stride bpp=3 — one cumsum per row
            r3 = data[row].reshape(w, 3).astype(np.int64)
            recon[row] = (np.cumsum(r3, axis=0) & 0xFF).astype(
                np.uint8).reshape(-1)
            prev = recon[row]
            row += 1
        else:
            # Average (3) / Paeth (4): per-byte sequential by spec
            rowdata = data[row].astype(np.int32)
            up_row = prev.astype(np.int32)
            rec = np.zeros(w * 3, dtype=np.int32)
            for i in range(w * 3):
                a = rec[i - 3] if i >= 3 else 0
                b = up_row[i]
                if f == 3:
                    pr = (a + b) >> 1
                elif f == 4:
                    cc = up_row[i - 3] if i >= 3 else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pr = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else cc)
                else:
                    raise ValueError(f"bad PNG filter type {f}")
                rec[i] = (rowdata[i] + pr) & 0xFF
            recon[row] = rec.astype(np.uint8)
            prev = recon[row]
            row += 1
    return recon.reshape(h, w, 3)
