"""Round-trip tests for the REAL pixel decoders (no codec libraries):
PNG via stdlib zlib inflate + filter reconstruction, GIF via the
pure-Python variable-code-width LZW decoder, and their wiring into the
mapInPandas kernels (strict decode / resize / features).

The encoders here are test fixtures built from the public format specs
(PNG spec §9 filters, GIF89a appendix F LZW) — they apply real
compression (zlib.compress, true LZW with code-width growth and
deferred clear), so a decoder that only handles the degenerate
stored/literal cases would fail these."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from geomesa_hive_spark.pipeline import multimodal
from geomesa_hive_spark.pipeline.multimodal import (
    decode_gif_pixels,
    decode_pixels,
    decode_png_pixels,
)


# ---------------------------------------------------------------- PNG fixture
def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big")
        + tag
        + data
        + zlib.crc32(tag + data).to_bytes(4, "big")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def make_png(px: np.ndarray, color_type: int, filters=None, palette=None) -> bytes:
    """Encode an (h, w, ch) uint8 raster as a real zlib-compressed PNG,
    applying the requested filter id per row (default: cycle 0..4)."""
    h, w, ch = px.shape
    filters = filters if filters is not None else [y % 5 for y in range(h)]
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        cur = px[y].reshape(-1).astype(np.int32)
        f = filters[y]
        line = np.zeros(w * ch, dtype=np.int32)
        for x in range(w * ch):
            a = int(cur[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                pred = _paeth(a, b, c)
            line[x] = (int(cur[x]) - pred) & 0xFF
        raw.append(f)
        raw += bytes(line.astype(np.uint8))
        prev = cur
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    comp = zlib.compress(bytes(raw), 6)
    # split the stream across two IDAT chunks to test concatenation
    mid = len(comp) // 2
    out += _png_chunk(b"IDAT", comp[:mid]) + _png_chunk(b"IDAT", comp[mid:])
    return out + _png_chunk(b"IEND", b"")


def _rng_raster(h, w, ch, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8).astype(np.uint8)


def test_png_rgb_all_filters_roundtrip():
    px = _rng_raster(10, 7, 3, 1)
    for f in range(5):
        got = decode_png_pixels(make_png(px, 2, filters=[f] * 10))
        assert got is not None and np.array_equal(got, px), f"filter {f}"
    # mixed filters per row
    got = decode_png_pixels(make_png(px, 2))
    assert np.array_equal(got, px)


def test_png_rgba_gray_palette_roundtrip():
    rgba = _rng_raster(6, 5, 4, 2)
    got = decode_png_pixels(make_png(rgba, 6))
    assert np.array_equal(got, rgba[:, :, :3])

    gray = _rng_raster(6, 5, 1, 3)
    got = decode_png_pixels(make_png(gray, 0))
    assert np.array_equal(got, np.repeat(gray, 3, axis=2))

    ga = _rng_raster(6, 5, 2, 4)
    got = decode_png_pixels(make_png(ga, 4))
    assert np.array_equal(got, np.repeat(ga[:, :, :1], 3, axis=2))

    pal = _rng_raster(16, 1, 3, 5).reshape(16, 3)
    idx = _rng_raster(6, 5, 1, 6) % 16
    got = decode_png_pixels(make_png(idx, 3, palette=pal))
    assert np.array_equal(got, pal[idx[:, :, 0]])


def test_png_rejects_unsupported():
    px = _rng_raster(4, 4, 3, 7)
    good = make_png(px, 2)
    assert decode_png_pixels(good[:30]) is None           # truncated
    assert decode_png_pixels(b"\x89PNG\r\n\x1a\n") is None  # no chunks
    # interlaced flag set -> unsupported, not garbage output
    bad = bytearray(good)
    bad[8 + 8 + 12] = 1  # IHDR interlace byte
    assert decode_png_pixels(bytes(bad)) is None
    # 16-bit depth
    bad = bytearray(good)
    bad[8 + 8 + 8] = 16
    assert decode_png_pixels(bytes(bad)) is None
    # palette image without PLTE
    idx = _rng_raster(4, 4, 1, 8) % 4
    no_plte = make_png(idx, 3, palette=np.zeros((4, 3)))
    stripped = no_plte.replace(_png_chunk(b"PLTE", bytes(12)), b"")
    assert decode_png_pixels(stripped) is None


# ---------------------------------------------------------------- GIF fixture
def _gif_lzw_encode(indices, min_code: int) -> bytes:
    """Real GIF LZW encoder (spec appendix F): variable code width that
    tracks the DECODER's table-size schedule, 12-bit cap with deferred
    clear (keeps emitting, dictionary frozen, until explicitly cleared
    here: never — exercising the decoder's frozen-table path)."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    bitbuf = bitlen = 0
    width = min_code + 1
    table_len = clear + 2
    first_after_clear = True

    def emit(code):
        nonlocal bitbuf, bitlen, width, table_len, first_after_clear
        bitbuf |= code << bitlen
        bitlen += width
        while bitlen >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitlen -= 8
        if code == clear:
            width, table_len, first_after_clear = min_code + 1, clear + 2, True
        elif code != eoi:
            if first_after_clear:
                first_after_clear = False
            elif table_len < 4096:
                table_len += 1
                if table_len >= (1 << width) and width < 12:
                    width += 1

    emit(clear)
    d = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    w = b""
    for k in indices:
        wk = w + bytes([int(k)])
        if wk in d:
            w = wk
            continue
        emit(d[w])
        if next_code < 4096:
            d[wk] = next_code
            next_code += 1
        w = bytes([int(k)])
    if w:
        emit(d[w])
    emit(eoi)
    if bitlen:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def make_gif(
    idx: np.ndarray, palette: np.ndarray, interlace=False, local_table=False,
    leading_extension=False,
) -> bytes:
    """Encode an (h, w) index raster as a real LZW-compressed GIF89a."""
    h, w = idx.shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    pal_bytes = palette.astype(np.uint8).tobytes() + bytes(3 * ((1 << bits) - n))
    min_code = max(2, bits)
    rows = idx
    if interlace:
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8),
             np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        rows = idx[order]
    data = _gif_lzw_encode(rows.reshape(-1), min_code)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    if local_table:
        out += bytes([0x00, 0, 0])  # no global table
    else:
        out += bytes([0x80 | (bits - 1), 0, 0]) + pal_bytes
    if leading_extension:  # graphic-control extension, must be skipped
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + bytes(4) + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    iflags = (0x40 if interlace else 0) | (0x80 | (bits - 1) if local_table else 0)
    out += bytes([iflags])
    if local_table:
        out += pal_bytes
    out += bytes([min_code])
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    return bytes(out)


def _gif_case(h, w, ncolors, seed):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, size=(ncolors, 3), dtype=np.uint8)
    idx = rng.randint(0, ncolors, size=(h, w)).astype(np.uint8)
    return idx, pal


def test_gif_lzw_roundtrip_small():
    idx, pal = _gif_case(9, 13, 8, 11)
    got = decode_gif_pixels(make_gif(idx, pal))
    assert got is not None and np.array_equal(got, pal[idx])


def test_gif_lzw_code_width_growth_and_frozen_table():
    # 120x90 random 64-color image: thousands of dictionary adds pushes
    # the code width through 7->12 bits and into the frozen-table
    # (deferred clear) regime — any off-by-one in the width schedule
    # desynchronizes encoder and decoder and corrupts the raster.
    idx, pal = _gif_case(90, 120, 64, 12)
    got = decode_gif_pixels(make_gif(idx, pal))
    assert got is not None and np.array_equal(got, pal[idx])


def test_gif_interlace_local_table_extensions():
    idx, pal = _gif_case(17, 11, 16, 13)
    for interlace in (False, True):
        for local in (False, True):
            b = make_gif(idx, pal, interlace=interlace, local_table=local,
                         leading_extension=True)
            got = decode_gif_pixels(b)
            assert got is not None and np.array_equal(got, pal[idx]), (interlace, local)


def test_gif_rejects_garbage():
    idx, pal = _gif_case(5, 5, 4, 14)
    good = make_gif(idx, pal)
    assert decode_gif_pixels(good[:12]) is None
    assert decode_gif_pixels(b"GIF89a" + b"\x00" * 7) is None
    # truncated LZW stream: expected pixel count never reached
    assert decode_gif_pixels(good[: len(good) - 6]) is None
    # header-only synthetic GIF from the contract query shape
    assert decode_gif_pixels(b"GIF89a" + bytes(7) + b"some text payload") is None


# ------------------------------------------------------- kernel wiring (Spark)
def test_strict_kernels_accept_png_and_gif(spark):
    px = _rng_raster(8, 6, 3, 21)
    png = make_png(px, 2)
    idx, pal = _gif_case(8, 6, 8, 22)
    gif = make_gif(idx, pal)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(gif))], "doc_id LONG, media BINARY"
    )
    rows = {r.doc_id: r for r in
            multimodal.decode_image_batch(df, "media", strict=True).collect()}
    assert rows[1].mime == "image/png" and rows[1].width == 6 and rows[1].height == 8
    assert rows[2].mime == "image/gif"
    lum = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2])
    assert rows[1].brightness == pytest.approx(float(lum.mean()) / 255.0)

    rs = {r.doc_id: r for r in
          multimodal.resize_images(df, "media", 3, 2, strict=True).collect()}
    # nearest-neighbor resample of the real rasters
    for did, src in ((1, px), (2, pal[idx])):
        sh, sw = src.shape[:2]
        ri = np.minimum((np.arange(2) * sh) // 2, sh - 1)
        ci = np.minimum((np.arange(3) * sw) // 3, sw - 1)
        assert bytes(rs[did].media) == src[np.ix_(ri, ci)].tobytes()

    feats = multimodal.extract_image_features(df, "media", dim=8).collect()
    assert all(len(r.features) == 8 for r in feats)


def test_strict_still_raises_on_jpeg(spark):
    jpeg = (b"\xff\xd8" + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
            + (4).to_bytes(2, "big") + (4).to_bytes(2, "big")
            + b"\x03" + b"\x01\x11\x00" * 3)
    df = spark.createDataFrame([(1, bytearray(jpeg))], "doc_id LONG, media BINARY")
    with pytest.raises(Exception):
        multimodal.decode_image_batch(df, "media", strict=True).collect()
    assert decode_pixels(jpeg) is None


def test_dhash_blocking_complete_vs_bruteforce(spark):
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from geomesa_hive_spark.pipeline.multimodal import (
        DHASH_BITS, dhash_near_dup_pairs, dhash_pixels,
    )

    rng = np.random.default_rng(21)
    # random hashes + planted near-dup pairs at various distances
    hashes = [int(rng.integers(0, 1 << 60)) for _ in range(120)]
    for i in range(0, 40, 2):
        flips = rng.choice(60, size=(i // 2) % 4, replace=False)
        h = hashes[i]
        for b in flips:
            h ^= 1 << int(b)
        hashes[i + 1] = h
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(120), "dhash": pd.array(hashes, dtype="Int64")})
    )
    got = {(r.id_a, r.id_b): r.hamming
           for r in dhash_near_dup_pairs(df, "id", "dhash", max_hamming=3).collect()}
    want = {}
    for i in range(120):
        for j in range(i + 1, 120):
            d = bin(hashes[i] ^ hashes[j]).count("1")
            if d <= 3:
                want[(i, j)] = d
    assert got == want and len(want) >= 20  # pigeonhole found EVERY pair

    # dhash_pixels invariances: scale-invariant (NN grid), brightness-shift
    # changes nothing while content changes do
    base = rng.integers(0, 256, (6, 11, 3)).astype(np.uint8)
    big = np.kron(base, np.ones((4, 4, 1))).astype(np.uint8)  # 24x44 upscale
    assert dhash_pixels(base) == dhash_pixels(big)
    shifted = np.clip(base.astype(int) + 40, 0, 255).astype(np.uint8)
    # monotone shift preserves most comparisons (clipping may flip a few)
    d = bin(dhash_pixels(base) ^ dhash_pixels(shifted)).count("1")
    assert d <= 10
    scrambled = base[:, ::-1, :].copy()
    assert dhash_pixels(base) != dhash_pixels(scrambled)


def test_decode_raster_batch_matches_two_pass_chain(spark):
    """decode_raster_batch + resize_raster (decode ONCE, operate on the
    raster) must be byte-identical to the decode_image_batch +
    resize_images chain that runs the entropy decoder twice — the
    round-6 decode-once path the GIF contract query switched to."""
    px = _rng_raster(8, 6, 3, 31)
    png = make_png(px, 2)
    idx, pal = _gif_case(10, 7, 8, 32)
    gif = make_gif(idx, pal)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(gif))], "doc_id LONG, media BINARY"
    )

    dec = multimodal.decode_raster_batch(df, "media", strict=True)
    one = {r.doc_id: r for r in
           multimodal.resize_raster(dec, "raster", "width", "height", 3, 2)
           .collect()}
    two = {r.doc_id: r for r in
           multimodal.resize_images(df, "media", 3, 2, strict=True).collect()}
    hdr = {r.doc_id: r for r in
           multimodal.decode_image_batch(df, "media", strict=True).collect()}
    for did, src in ((1, px), (2, pal[idx])):
        assert bytes(one[did].raster) == src.tobytes()
        assert bytes(one[did].resized) == bytes(two[did].media)
        assert (one[did].mime, one[did].width, one[did].height) == (
            hdr[did].mime, hdr[did].width, hdr[did].height
        )
    # null row stays null end to end
    dfn = spark.createDataFrame([(3, None)], "doc_id LONG, media BINARY")
    r = multimodal.resize_raster(
        multimodal.decode_raster_batch(dfn, "media"), "raster",
        "width", "height", 3, 2,
    ).collect()[0]
    assert r.raster is None and r.resized is None

def test_decode_raster_batch_gif_frame_smaller_than_screen(spark):
    """Optimized GIFs declare a logical screen LARGER than the first
    frame's image descriptor. decode_raster_batch must report the
    DECODED raster's dims (frame), not the header's (screen), or
    resize_raster's reshape(height, width, 3) explodes on valid input."""
    idx, pal = _gif_case(7, 5, 8, 33)
    gif = bytearray(make_gif(idx, pal))
    # enlarge the logical screen to 100x100; frame descriptor stays 5x7
    gif[6:8] = (100).to_bytes(2, "little")
    gif[8:10] = (100).to_bytes(2, "little")
    assert multimodal.parse_image_header(bytes(gif))[1:] == (100, 100)
    df = spark.createDataFrame(
        [(1, bytearray(bytes(gif)))], "doc_id LONG, media BINARY"
    )
    dec = multimodal.decode_raster_batch(df, "media", strict=True)
    r = multimodal.resize_raster(
        dec, "raster", "width", "height", 3, 2
    ).collect()[0]
    assert (r.width, r.height) == (5, 7)
    assert bytes(r.raster) == pal[idx].tobytes()
    # nearest-neighbor reference on the true frame dims
    src = pal[idx]
    ri = np.minimum((np.arange(2) * 7) // 2, 6)
    ci = np.minimum((np.arange(3) * 5) // 3, 4)
    assert bytes(r.resized) == src[np.ix_(ri, ci)].tobytes()
