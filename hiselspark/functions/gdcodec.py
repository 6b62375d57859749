"""JPEG / WebP codecs backed by the SYSTEM libgd (ctypes, no pip).

The sandbox has no PIL/libvips, but it does ship ``libgd.so`` linked
against libjpeg-turbo and libwebp — public system libraries.  This
module binds the four entropy-codec entry points through ``ctypes``
and moves pixels between C and NumPy via an UNCOMPRESSED-level PNG
intermediate handled by our own vectorized codec
(:mod:`hiselspark.functions.png`):

* decode:  jpeg/webp bytes --libgd--> gdImage --libgd png(level 0)-->
  PNG bytes --our NumPy decoder--> ``(h, w, 3) uint8``
* encode:  ndarray --our NumPy encoder--> PNG bytes --libgd-->
  gdImage --libgd--> jpeg/webp bytes

The PNG hop exists because reading pixels out of a ``gdImage`` struct
any other way is a per-pixel ctypes call (``gdImageGetTrueColorPixel``
— a Python-loop over every pixel) or a fragile poke at private struct
layout; routing through PNG keeps every per-pixel operation inside C
or vectorized NumPy.  Level-0 (stored) deflate makes the hop a
memcpy-with-framing, not a recompression.  Correctness of the hop is
cross-checked in tests against per-pixel ``gdImageGetTrueColorPixel``
reads on small images (exact equality).

Everything degrades honestly: if ``libgd`` is absent,
:func:`available` is False and the codec registry keeps raising
``NotImplementedError`` exactly as before.

Reference parity note: the reference engine's data model treats image
payloads as decodable bytes with a PSNR >= 40 dB contract for lossy
formats (see reference README data model); this module is what makes
``fmt='jpeg'``/``'webp'`` real here, with the contract exercised in
tests and the driver gate rather than assumed.
"""
from __future__ import annotations

import ctypes
import ctypes.util
from typing import Optional

import numpy as np

from .png import decode_png, encode_png

# libgd's gd.h: #define gdWebpLossless 101 — quality above 100 selects
# the lossless VP8L path in gdImageWebpPtrEx.
GD_WEBP_LOSSLESS = 101

_gd = None
_gd_tried = False


def _libgd():
    """Load-and-prototype the system libgd once per process (Spark
    Python workers are processes, so each worker pays this once)."""
    global _gd, _gd_tried
    if _gd_tried:
        return _gd
    _gd_tried = True
    path = ctypes.util.find_library("gd")
    if path is None:
        return None
    try:
        gd = ctypes.CDLL(path)
        gd.gdImageCreateFromJpegPtr.restype = ctypes.c_void_p
        gd.gdImageCreateFromJpegPtr.argtypes = [ctypes.c_int,
                                                ctypes.c_char_p]
        gd.gdImageCreateFromWebpPtr.restype = ctypes.c_void_p
        gd.gdImageCreateFromWebpPtr.argtypes = [ctypes.c_int,
                                                ctypes.c_char_p]
        gd.gdImageCreateFromPngPtr.restype = ctypes.c_void_p
        gd.gdImageCreateFromPngPtr.argtypes = [ctypes.c_int,
                                               ctypes.c_char_p]
        gd.gdImagePngPtrEx.restype = ctypes.c_void_p
        gd.gdImagePngPtrEx.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_int),
                                       ctypes.c_int]
        gd.gdImageJpegPtr.restype = ctypes.c_void_p
        gd.gdImageJpegPtr.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_int),
                                      ctypes.c_int]
        gd.gdImageWebpPtrEx.restype = ctypes.c_void_p
        gd.gdImageWebpPtrEx.argtypes = [ctypes.c_void_p,
                                        ctypes.POINTER(ctypes.c_int),
                                        ctypes.c_int]
        gd.gdImageSaveAlpha.restype = None
        gd.gdImageSaveAlpha.argtypes = [ctypes.c_void_p, ctypes.c_int]
        gd.gdImageDestroy.restype = None
        gd.gdImageDestroy.argtypes = [ctypes.c_void_p]
        gd.gdFree.restype = None
        gd.gdFree.argtypes = [ctypes.c_void_p]
        _gd = gd
    except (OSError, AttributeError):
        _gd = None
    return _gd


def available() -> bool:
    """True iff the system libgd with jpeg+webp support is loadable."""
    return _libgd() is not None


def _require():
    gd = _libgd()
    if gd is None:
        raise NotImplementedError(
            "jpeg/webp codecs need the system libgd, which is not "
            "available in this environment; extend CODECS to add one")
    return gd


def _image_to_array(gd, im, w: Optional[int], h: Optional[int]
                    ) -> np.ndarray:
    """gdImage -> (h, w, 3) uint8 via a stored-level PNG hop."""
    gd.gdImageSaveAlpha(im, 0)          # force RGB (color type 2) out
    size = ctypes.c_int(0)
    ptr = gd.gdImagePngPtrEx(im, ctypes.byref(size), 0)
    if not ptr:
        raise ValueError("libgd failed to serialize decoded image")
    try:
        png_bytes = ctypes.string_at(ptr, size.value)
    finally:
        gd.gdFree(ptr)
    return decode_png(png_bytes, w, h)


def _array_to_image(gd, img: np.ndarray):
    """(h, w, 3) uint8 -> gdImage via our PNG encoder (level 0)."""
    buf = encode_png(np.ascontiguousarray(img, dtype=np.uint8), level=0)
    im = gd.gdImageCreateFromPngPtr(len(buf), buf)
    if not im:
        raise ValueError("libgd failed to parse intermediate PNG")
    return im


def decode_jpeg(buf: bytes, w: Optional[int] = None,
                h: Optional[int] = None) -> np.ndarray:
    gd = _require()
    im = gd.gdImageCreateFromJpegPtr(len(buf), bytes(buf))
    if not im:
        raise ValueError("libjpeg could not decode buffer")
    try:
        return _image_to_array(gd, im, w, h)
    finally:
        gd.gdImageDestroy(im)


def decode_webp(buf: bytes, w: Optional[int] = None,
                h: Optional[int] = None) -> np.ndarray:
    gd = _require()
    im = gd.gdImageCreateFromWebpPtr(len(buf), bytes(buf))
    if not im:
        raise ValueError("libwebp could not decode buffer")
    try:
        return _image_to_array(gd, im, w, h)
    finally:
        gd.gdImageDestroy(im)


def encode_jpeg(img: np.ndarray, quality: int = 95) -> bytes:
    """Encode ``(h, w, 3) uint8`` as baseline JPEG.  Used by tests and
    fixture synthesis; production corpora arrive already encoded."""
    gd = _require()
    im = _array_to_image(gd, img)
    try:
        size = ctypes.c_int(0)
        ptr = gd.gdImageJpegPtr(im, ctypes.byref(size), int(quality))
        if not ptr:
            raise ValueError("libjpeg could not encode image")
        try:
            return ctypes.string_at(ptr, size.value)
        finally:
            gd.gdFree(ptr)
    finally:
        gd.gdImageDestroy(im)


def encode_webp(img: np.ndarray, quality: int = GD_WEBP_LOSSLESS
                ) -> bytes:
    """Encode as WebP — default ``quality=101`` is libgd's lossless
    (VP8L) mode; 0..100 selects lossy VP8."""
    gd = _require()
    im = _array_to_image(gd, img)
    try:
        size = ctypes.c_int(0)
        ptr = gd.gdImageWebpPtrEx(im, ctypes.byref(size), int(quality))
        if not ptr:
            raise ValueError("libwebp could not encode image")
        try:
            return ctypes.string_at(ptr, size.value)
        finally:
            gd.gdFree(ptr)
    finally:
        gd.gdImageDestroy(im)
