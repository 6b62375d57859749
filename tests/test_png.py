"""PNG codec: round-trip exactness, per-filter decode paths, chunk
validation, standards cross-check against libpng (via libgd, ctypes),
and the fmt='png' Spark pixel-stats path.

The codec (hiselspark/functions/png.py) implements the public W3C PNG
spec; the reference engine's data model treats image payloads as
decodable bytes with PSNR>=40dB fidelity (reference README data model)
— PNG is lossless, so round trips must be EXACT."""
import ctypes
import ctypes.util

import numpy as np
import pandas as pd
import pytest

from hiselspark.functions.png import decode_png, encode_png


def _rand_img(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("strategy", ["adaptive", "fixed:0", "fixed:1",
                                      "fixed:2", "fixed:3", "fixed:4"])
def test_round_trip_exact_per_filter(strategy):
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (16, 16), (37, 23)]:
        img = _rand_img(rng, h, w)
        back = decode_png(encode_png(img, filter_strategy=strategy), w, h)
        assert (back == img).all(), (strategy, h, w)


def test_round_trip_structured_images():
    # gradients/flat regions exercise the adaptive heuristic's
    # non-trivial filter choices (Sub/Up/Paeth actually win rows)
    rng = np.random.default_rng(11)
    grad = (np.arange(64)[None, :, None]
            + np.arange(48)[:, None, None] * np.array([1, 2, 3])) % 256
    imgs = [grad.astype(np.uint8),
            np.zeros((8, 8, 3), np.uint8),
            np.full((5, 9, 3), 255, np.uint8),
            (_rand_img(rng, 20, 20) // 64) * 64]
    for img in imgs:
        h, w = img.shape[:2]
        buf = encode_png(img)
        assert decode_png(buf, w, h).tobytes() == img.tobytes()


def test_chunk_crc_and_profile_validation():
    img = np.zeros((4, 4, 3), np.uint8)
    buf = bytearray(encode_png(img))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x00" * 20)
    corrupt = buf.copy()
    corrupt[20] ^= 0xFF  # inside IHDR payload -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))
    with pytest.raises(ValueError, match="metadata"):
        decode_png(bytes(buf), 5, 5)


def _libgd():
    path = ctypes.util.find_library("gd")
    if not path:
        return None
    gd = ctypes.CDLL(path)
    gd.gdImageCreateFromPngPtr.restype = ctypes.c_void_p
    gd.gdImageCreateFromPngPtr.argtypes = [ctypes.c_int, ctypes.c_char_p]
    gd.gdImageGetTrueColorPixel.restype = ctypes.c_int
    gd.gdImageGetTrueColorPixel.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                            ctypes.c_int]
    gd.gdImageCreateTrueColor.restype = ctypes.c_void_p
    gd.gdImageCreateTrueColor.argtypes = [ctypes.c_int, ctypes.c_int]
    gd.gdImageSetPixel.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_int]
    gd.gdImagePngPtr.restype = ctypes.c_void_p
    gd.gdImagePngPtr.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_int)]
    gd.gdImageDestroy.argtypes = [ctypes.c_void_p]
    gd.gdFree.argtypes = [ctypes.c_void_p]
    return gd


def _gd_pixels(gd, im, w, h):
    out = np.empty((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            p = gd.gdImageGetTrueColorPixel(im, x, y)
            out[y, x] = ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
    return out


@pytest.mark.parametrize("strategy", ["adaptive", "fixed:3", "fixed:4"])
def test_libpng_decodes_our_pngs_exactly(strategy):
    gd = _libgd()
    if gd is None:
        pytest.skip("libgd/libpng not available")
    rng = np.random.default_rng(13)
    img = _rand_img(rng, 19, 31)
    buf = encode_png(img, filter_strategy=strategy)
    im = gd.gdImageCreateFromPngPtr(len(buf), buf)
    assert im, "libpng rejected our PNG"
    try:
        assert (_gd_pixels(gd, im, 31, 19) == img).all()
    finally:
        gd.gdImageDestroy(im)


def test_we_decode_libpng_written_pngs_exactly():
    gd = _libgd()
    if gd is None:
        pytest.skip("libgd/libpng not available")
    rng = np.random.default_rng(17)
    img = _rand_img(rng, 12, 18)
    im = gd.gdImageCreateTrueColor(18, 12)
    assert im
    try:
        for y in range(12):
            for x in range(18):
                r, g, b = (int(v) for v in img[y, x])
                gd.gdImageSetPixel(im, x, y, (r << 16) | (g << 8) | b)
        size = ctypes.c_int(0)
        ptr = gd.gdImagePngPtr(im, ctypes.byref(size))
        assert ptr
        try:
            buf = ctypes.string_at(ptr, size.value)
        finally:
            gd.gdFree(ptr)
    finally:
        gd.gdImageDestroy(im)
    assert (decode_png(buf, 18, 12) == img).all()


def test_png_through_spark_pixel_stats(spark):
    """fmt='png' rides the SAME mapInPandas pixel-stats path as raw,
    and being lossless must produce bit-identical stats to the raw
    encoding of the same image."""
    from hiselspark.functions.image import with_pixel_stats
    rng = np.random.default_rng(23)
    rows = []
    for i in range(12):
        img = _rand_img(rng, 16, 16)
        rows.append((f"p{i}", encode_png(img), 16, 16, "png"))
        rows.append((f"r{i}", img.tobytes(), 16, 16, "raw"))
    pdf = pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h",
                                      "fmt"])
    out = (with_pixel_stats(spark.createDataFrame(pdf).repartition(3))
           .toPandas().set_index("image_id").sort_index())
    stat_cols = [c for c in out.columns
                 if c not in ("fmt", "bytes")]
    for i in range(12):
        a, b = out.loc[f"p{i}"], out.loc[f"r{i}"]
        for col in stat_cols:
            assert a[col] == b[col] or (
                a[col] != a[col] and b[col] != b[col]), (i, col)


def test_truncation_and_missing_idat_raise_valueerror():
    img = np.zeros((4, 4, 3), np.uint8)
    buf = encode_png(img)
    for cut in (10, 20, 40, len(buf) - 3):
        with pytest.raises(ValueError):
            decode_png(buf[:cut])
    # signature + IHDR only, no IDAT
    ihdr_end = 8 + 12 + 13
    with pytest.raises(ValueError, match="IDAT|truncated"):
        decode_png(buf[:ihdr_end] + buf[-12:])
