"""JPEG/WebP codecs (system libgd through ctypes).

Checks the lossy-payload contract end-to-end: PSNR >= 40 dB vs the
encoder input for corpus-like (smooth) images, exactness for WebP
lossless, and — the load-bearing one — that the vectorized PNG-hop
pixel transfer agrees EXACTLY with per-pixel
``gdImageGetTrueColorPixel`` reads, so the hop is pure plumbing and
libgd's own decode is what we ship.
"""
import ctypes
import ctypes.util

import numpy as np
import pandas as pd
import pytest

from hiselspark.functions import gdcodec
from hiselspark.functions.image import decode_image, psnr

pytestmark = pytest.mark.skipif(
    not gdcodec.available(), reason="system libgd not present")


def smooth_image(h, w, seed=0):
    """Corpus-like content: gradients + low-frequency sinusoids (what
    the synthetic fixtures use) — the regime where JPEG's 8x8 DCT at
    quality 95 sits comfortably above the 40 dB contract."""
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        xx * 255.0 / max(w - 1, 1),
        yy * 255.0 / max(h - 1, 1),
        127 + 120 * np.sin(xx / (7.0 + seed)) * np.cos(yy / (5.0 + seed)),
    ], axis=-1).clip(0, 255).astype(np.uint8)


def test_jpeg_roundtrip_psnr_contract():
    for seed, (h, w) in enumerate([(48, 64), (33, 57), (8, 8)]):
        img = smooth_image(h, w, seed)
        buf = gdcodec.encode_jpeg(img, quality=95)
        if img.size >= 4096:        # header overhead dominates tiny images
            assert len(buf) < img.size      # actually compressed
        dec = decode_image(buf, w, h, "jpeg")   # via the registry
        assert dec.shape == (h, w, 3) and dec.dtype == np.uint8
        assert psnr(img, dec) >= 40.0


def test_webp_lossless_exact_and_lossy_contract():
    img = smooth_image(40, 56, 2)
    lossless = gdcodec.encode_webp(img)     # default quality=101
    assert (decode_image(lossless, 56, 40, "webp") == img).all()
    lossy = gdcodec.encode_webp(img, quality=95)
    assert psnr(img, decode_image(lossy, 56, 40, "webp")) >= 40.0


def test_png_hop_matches_per_pixel_gd_reads():
    gd = ctypes.CDLL(ctypes.util.find_library("gd"))
    gd.gdImageCreateFromJpegPtr.restype = ctypes.c_void_p
    gd.gdImageCreateFromJpegPtr.argtypes = [ctypes.c_int, ctypes.c_char_p]
    gd.gdImageCreateFromWebpPtr.restype = ctypes.c_void_p
    gd.gdImageCreateFromWebpPtr.argtypes = [ctypes.c_int, ctypes.c_char_p]
    gd.gdImageGetTrueColorPixel.restype = ctypes.c_int
    gd.gdImageGetTrueColorPixel.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    gd.gdImageDestroy.argtypes = [ctypes.c_void_p]
    h, w = 12, 18
    img = smooth_image(h, w, 1)
    for fmt, buf in [("jpeg", gdcodec.encode_jpeg(img, 90)),
                     ("webp", gdcodec.encode_webp(img))]:
        ours = decode_image(buf, w, h, fmt)
        creator = (gd.gdImageCreateFromJpegPtr if fmt == "jpeg"
                   else gd.gdImageCreateFromWebpPtr)
        im = creator(len(buf), buf)
        assert im
        try:
            for y in range(h):
                for x in range(w):
                    p = gd.gdImageGetTrueColorPixel(im, x, y)
                    assert tuple(ours[y, x]) == (
                        (p >> 16) & 255, (p >> 8) & 255, p & 255), (fmt, x, y)
        finally:
            gd.gdImageDestroy(im)


def test_dimension_mismatch_rejected():
    img = smooth_image(10, 10)
    buf = gdcodec.encode_jpeg(img, 95)
    with pytest.raises(ValueError):
        decode_image(buf, 11, 10, "jpeg")
    with pytest.raises(ValueError):
        gdcodec.decode_jpeg(b"\x00not a jpeg")


def test_pixel_stats_spark_jpeg(spark):
    """fmt='jpeg' flows through the Arrow-batched pixel-stats operator;
    channel means match a NumPy decode oracle to float32 tolerance."""
    from hiselspark.functions.image import with_pixel_stats
    rows, expect = [], {}
    for i in range(10):
        h, w = 16 + i, 24 + 2 * i
        img = smooth_image(h, w, i)
        buf = gdcodec.encode_jpeg(img, quality=95)
        rows.append((f"im{i}", bytearray(buf), w, h, "jpeg"))
        expect[f"im{i}"] = gdcodec.decode_jpeg(buf, w, h).reshape(
            -1, 3).mean(axis=0)
    pdf = pd.DataFrame(rows,
                       columns=["image_id", "bytes", "w", "h", "fmt"])
    out = with_pixel_stats(
        spark.createDataFrame(pdf).repartition(3)).toPandas()
    assert len(out) == 10 and "bytes" not in out.columns
    for _, r in out.iterrows():
        exp = expect[r["image_id"]]
        got = np.array([r["px_mean_r"], r["px_mean_g"], r["px_mean_b"]])
        assert np.allclose(got, exp, atol=1e-3)
