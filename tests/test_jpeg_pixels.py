"""Round-trip tests for the pure-Python baseline JPEG decoder.

The encoder here is a REAL baseline JPEG encoder built from the public
spec (ITU T.81): forward DCT, quantization, zig-zag, per-stream
canonical Huffman table construction (Annex C code assignment — the
tables are derived from the actual symbol frequencies, so the decoder
faces genuinely variable-length codes), 0xFF byte stuffing, optional
4:2:0 subsampling and restart markers. Decoded output is compared
against an INDEPENDENT reconstruction (naive O(N^4) IDCT written
differently from the decoder's einsum path) — so the decoder's Huffman,
dezigzag, dequantize, IDCT, upsample and color-convert stages are each
cross-checked, not self-checked."""

from __future__ import annotations

import heapq
import math

import numpy as np
import pytest

from geomesa_hive_spark.pipeline.multimodal import (
    _ZIGZAG,
    decode_jpeg_pixels,
    decode_pixels,
)

# standard Annex-K luminance quant table (quality 50 base)
_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)
_QT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

_M = np.array([
    [
        (math.sqrt(1 / 8) if k == 0 else math.sqrt(2 / 8))
        * math.cos((2 * n + 1) * k * math.pi / 16)
        for n in range(8)
    ]
    for k in range(8)
])


def _fdct(block):
    return _M @ block @ _M.T


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def pad(self):
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec


def _huff_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Symbol → code length via the plain Huffman algorithm (max length
    asserted ≤ 16 — true for these test sizes)."""
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    lengths = {s: 0 for s in freqs}
    uid = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (f1 + f2, uid, s1 + s2))
        uid += 1
    assert max(lengths.values()) <= 16
    return lengths


def _canonical_codes(lengths: dict[int, int]):
    """Annex-C canonical assignment: (BITS, HUFFVAL, symbol→(code,len))."""
    bits = [0] * 16
    order = sorted(lengths.items(), key=lambda kv: (kv[1], kv[0]))
    for _, ln in order:
        bits[ln - 1] += 1
    vals = bytes(s for s, _ in order)
    codes = {}
    # walk lengths in ascending order, shifting like the decoder builds
    code = 0
    cur = 0
    for s, ln in order:
        while cur < ln:
            code <<= 1
            cur += 1
        codes[s] = (code, ln)
        code += 1
    return bits, vals, codes


def make_jpeg(
    px: np.ndarray, subsample: bool = False, restart: int = 0
) -> bytes:
    """Encode an (h, w, 3) RGB raster (or (h, w) grayscale) as a real
    baseline JPEG."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
        qts = [0]
    else:
        p = px.astype(np.float64)
        y = 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]
        cb = -0.168736 * p[:, :, 0] - 0.331264 * p[:, :, 1] + 0.5 * p[:, :, 2] + 128.0
        cr = 0.5 * p[:, :, 0] - 0.418688 * p[:, :, 1] - 0.081312 * p[:, :, 2] + 128.0
        if subsample:
            # box-average 2x2 (pad to even first)
            def box(pl):
                ph = np.pad(pl, ((0, pl.shape[0] % 2), (0, pl.shape[1] % 2)),
                            mode="edge")
                return (ph[0::2, 0::2] + ph[1::2, 0::2]
                        + ph[0::2, 1::2] + ph[1::2, 1::2]) / 4.0
            planes = [y, box(cb), box(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qts = [0, 1, 1]
    qtabs = {0: _QT_LUM, 1: _QT_CHR}
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # pad planes to their MCU-aligned sizes (edge replicate)
    blocks = []  # per component: (by, bx, 8, 8) quantized coefficients
    for pl, (sh, sv), tq in zip(planes, samp, qts):
        th_, tw_ = mcus_y * sv * 8, mcus_x * sh * 8
        pl = np.pad(
            pl, ((0, th_ - pl.shape[0]), (0, tw_ - pl.shape[1])), mode="edge"
        )
        by, bx = th_ // 8, tw_ // 8
        co = np.zeros((by, bx, 8, 8))
        for yb in range(by):
            for xb in range(bx):
                blk = pl[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8] - 128.0
                co[yb, xb] = np.round(_fdct(blk) / qtabs[tq])
        blocks.append(co)

    # ---- symbol stream (two passes: gather freqs, then emit) ----
    def mcu_emissions():
        pred = [0] * len(planes)
        n_mcu = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart and n_mcu and n_mcu % restart == 0:
                    pred = [0] * len(planes)
                    yield ("RST", n_mcu // restart - 1, None, None, None)
                for ci, (sh, sv) in enumerate(samp):
                    for by in range(sv):
                        for bx in range(sh):
                            co = blocks[ci][my * sv + by, mx * sh + bx]
                            zz = co.reshape(-1)[_ZIGZAG]
                            dc = int(zz[0])
                            diff = dc - pred[ci]
                            pred[ci] = dc
                            cat = _category(diff)
                            yield ("DC", ci, cat, diff, cat)
                            run = 0
                            nz = np.nonzero(zz[1:])[0]
                            last = nz[-1] + 1 if len(nz) else 0
                            k = 1
                            while k <= last:
                                v = int(zz[k])
                                if v == 0:
                                    run += 1
                                    if run == 16:
                                        yield ("AC", ci, 0xF0, 0, 0)
                                        run = 0
                                else:
                                    s = _category(v)
                                    yield ("AC", ci, (run << 4) | s, v, s)
                                    run = 0
                                k += 1
                            if last < 63:
                                yield ("AC", ci, 0x00, 0, 0)
                n_mcu += 1

    dc_freq = [dict() for _ in planes]
    ac_freq = [dict() for _ in planes]
    for kind, ci, sym, _v, _n in mcu_emissions():
        if kind == "DC":
            dc_freq[ci][sym] = dc_freq[ci].get(sym, 0) + 1
        elif kind == "AC":
            ac_freq[ci][sym] = ac_freq[ci].get(sym, 0) + 1
    # luma uses table 0; all chroma share table 1 (merge freqs)
    def merge(freqs, idxs):
        out = {}
        for i in idxs:
            for s, f in freqs[i].items():
                out[s] = out.get(s, 0) + f
        return out

    groups = [[0]] if gray else [[0], [1, 2]]
    dc_tabs, ac_tabs = {}, {}
    for t, idxs in enumerate(groups):
        dc_tabs[t] = _canonical_codes(_huff_lengths(merge(dc_freq, idxs)))
        ac_tabs[t] = _canonical_codes(_huff_lengths(merge(ac_freq, idxs)))
    comp_tab = [0] if gray else [0, 1, 1]

    bw = _BitWriter()
    body = bytearray()
    for kind, ci, sym, v, nbits in mcu_emissions():
        if kind == "RST":
            bw.pad()
            body += bw.out
            bw.out = bytearray()
            body += bytes([0xFF, 0xD0 + (ci & 7)])
            continue
        t = comp_tab[ci]
        code, ln = (dc_tabs[t] if kind == "DC" else ac_tabs[t])[2][sym]
        bw.write(code, ln)
        if nbits:
            bw.write(v if v > 0 else v + (1 << nbits) - 1, nbits)
    bw.pad()
    body += bw.out

    # ---- markers ----
    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    for tq in sorted(set(qts)):
        zzq = qtabs[tq].reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
        out += seg(0xDB, bytes([tq]) + zzq)
    nf = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nf])
    for ci in range(nf):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qts[ci]])
    out += seg(0xC0, sof)
    for t in dc_tabs:
        bits, vals, _ = dc_tabs[t]
        out += seg(0xC4, bytes([t]) + bytes(bits) + vals)
        bits, vals, _ = ac_tabs[t]
        out += seg(0xC4, bytes([0x10 | t]) + bytes(bits) + vals)
    if restart:
        out += seg(0xDD, restart.to_bytes(2, "big"))
    sos = bytes([nf])
    for ci in range(nf):
        t = comp_tab[ci]
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += body
    out += b"\xff\xd9"
    return bytes(out)


def _naive_idct(coef):
    """Independent O(N^4) IDCT for the reference reconstruction."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
                    cv = math.sqrt(1 / 8) if v == 0 else math.sqrt(2 / 8)
                    s += cu * cv * coef[u, v] * math.cos(
                        (2 * y + 1) * u * math.pi / 16
                    ) * math.cos((2 * x + 1) * v * math.pi / 16)
            out[y, x] = s
    return out


def _reference_decode(px, subsample):
    """Re-derive the expected decoded raster: same fdct/quant pipeline
    as the encoder, then the naive IDCT + upsample + color convert."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
        qts = [0]
    else:
        p = px.astype(np.float64)
        y = 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]
        cb = -0.168736 * p[:, :, 0] - 0.331264 * p[:, :, 1] + 0.5 * p[:, :, 2] + 128.0
        cr = 0.5 * p[:, :, 0] - 0.418688 * p[:, :, 1] - 0.081312 * p[:, :, 2] + 128.0
        if subsample:
            def box(pl):
                ph = np.pad(pl, ((0, pl.shape[0] % 2), (0, pl.shape[1] % 2)),
                            mode="edge")
                return (ph[0::2, 0::2] + ph[1::2, 0::2]
                        + ph[0::2, 1::2] + ph[1::2, 1::2]) / 4.0
            planes = [y, box(cb), box(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qts = [0, 1, 1]
    qtabs = {0: _QT_LUM, 1: _QT_CHR}
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    recon = []
    for pl, (sh, sv), tq in zip(planes, samp, qts):
        th_, tw_ = mcus_y * sv * 8, mcus_x * sh * 8
        pl = np.pad(pl, ((0, th_ - pl.shape[0]), (0, tw_ - pl.shape[1])),
                    mode="edge")
        rp = np.zeros_like(pl)
        for yb in range(th_ // 8):
            for xb in range(tw_ // 8):
                blk = pl[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8] - 128.0
                q = np.round(_fdct(blk) / qtabs[tq]) * qtabs[tq]
                rp[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8] = _naive_idct(q) + 128.0
        rp = np.repeat(np.repeat(rp, vmax // sv, axis=0), hmax // sh, axis=1)
        recon.append(rp[: mcus_y * vmax * 8, : mcus_x * hmax * 8])
    if gray:
        yv = np.clip(np.round(recon[0]), 0, 255).astype(np.uint8)[:h, :w]
        return np.repeat(yv[:, :, None], 3, axis=2)
    yv, cbv, crv = (r[:h, :w] for r in recon)
    rch = yv + 1.402 * (crv - 128.0)
    gch = yv - 0.344136 * (cbv - 128.0) - 0.714136 * (crv - 128.0)
    bch = yv + 1.772 * (cbv - 128.0)
    return np.clip(np.round(np.stack([rch, gch, bch], axis=2)), 0, 255).astype(np.uint8)


def _smooth_raster(h, w, seed, gray=False):
    """Smooth-ish content (JPEG-friendly) with some structure."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128
        + 80 * np.sin(xx / 7.0)
        + 60 * np.cos(yy / 5.0)
        + rng.randint(-12, 13, size=(h, w))
    )
    if gray:
        return np.clip(base, 0, 255).astype(np.uint8)
    chans = [np.clip(base * f, 0, 255) for f in (1.0, 0.8, 0.6)]
    return np.stack(chans, axis=2).astype(np.uint8)


@pytest.mark.parametrize("gray", [False, True])
def test_jpeg_roundtrip_444(gray):
    px = _smooth_raster(24, 17, 3, gray=gray)  # non-multiple-of-8 dims
    jp = make_jpeg(px)
    got = decode_jpeg_pixels(jp)
    assert got is not None and got.shape == (24, 17, 3)
    ref = _reference_decode(px, subsample=False)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_jpeg_roundtrip_420_subsampled():
    px = _smooth_raster(21, 30, 4)
    jp = make_jpeg(px, subsample=True)
    got = decode_jpeg_pixels(jp)
    assert got is not None and got.shape == (21, 30, 3)
    ref = _reference_decode(px, subsample=True)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_jpeg_restart_markers():
    px = _smooth_raster(16, 40, 5)
    jp = make_jpeg(px, restart=2)
    assert b"\xff\xd0" in jp or b"\xff\xd1" in jp
    got = decode_jpeg_pixels(jp)
    ref = _reference_decode(px, subsample=False)
    assert got is not None
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_jpeg_rejects_progressive_and_garbage():
    px = _smooth_raster(8, 8, 6)
    jp = bytearray(make_jpeg(px))
    i = jp.find(b"\xff\xc0")
    jp[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    assert decode_jpeg_pixels(bytes(jp)) is None
    assert decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None
    good = make_jpeg(px)
    assert decode_jpeg_pixels(good[: len(good) // 2]) is None
    # contract-style header-only synthetic JPEG falls back to None
    synth = (b"\xff\xd8\xff\xc0\x00\x11\x08" + (16).to_bytes(2, "big")
             + (16).to_bytes(2, "big") + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
             + b"text payload")
    assert decode_jpeg_pixels(synth) is None
    assert decode_pixels(synth) is None


def test_jpeg_via_decode_pixels_dispatch():
    px = _smooth_raster(16, 16, 7)
    assert decode_pixels(make_jpeg(px)) is not None


# ------------------------------------------------------------- MJPEG AVI
def _le(v, n):
    return int(v).to_bytes(n, "little")


def make_mjpeg_avi(frames: list[bytes], w: int, h: int) -> bytes:
    """Minimal valid MJPEG AVI: RIFF/AVI , LIST hdrl (avih), LIST movi
    with word-aligned 00dc chunks."""
    items = b"".join(
        b"00dc" + _le(len(f), 4) + f + (b"\x00" if len(f) % 2 else b"")
        for f in frames
    )
    movi = b"LIST" + _le(4 + len(items), 4) + b"movi" + items
    avih = (b"avih" + _le(56, 4) + _le(40000, 4) + bytes(12)
            + _le(len(frames), 4) + bytes(12) + _le(w, 4) + _le(h, 4) + bytes(16))
    hdrl = b"LIST" + _le(4 + len(avih), 4) + b"hdrl" + avih
    body = b"AVI " + hdrl + movi
    return b"RIFF" + _le(len(body), 4) + body


def test_parse_avi_frames_real_mjpeg():
    from geomesa_hive_spark.pipeline.multimodal import parse_avi_frames

    rasters = [_smooth_raster(16, 16, 30 + f) for f in range(5)]
    frames = [make_jpeg(px) for px in rasters]
    avi = make_mjpeg_avi(frames, 16, 16)
    got = parse_avi_frames(avi)
    assert got is not None and len(got) == 5
    assert all(g == f for g, f in zip(got, frames))  # exact payload slicing
    for g, px in zip(got, rasters):
        dec = decode_jpeg_pixels(g)
        ref = _reference_decode(px, subsample=False)
        assert np.abs(dec.astype(int) - ref.astype(int)).max() <= 1
    assert parse_avi_frames(avi[:20]) is None
    assert parse_avi_frames(b"RIFF" + _le(4, 4) + b"WAVE") is None


def test_sample_video_frames_real_avi(spark):
    from geomesa_hive_spark.pipeline import multimodal

    frames = [make_jpeg(_smooth_raster(8, 8, 40 + f)) for f in range(6)]
    avi = make_mjpeg_avi(frames, 8, 8)
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"not a video at all, just bytes"))],
        "doc_id LONG, media BINARY",
    )
    out = multimodal.sample_video_frames(df, "media", "doc_id", n_frames=3).collect()
    real = sorted((r.frame_index, bytes(r.frame)) for r in out if r.id == 1)
    # evenly spaced: stream indices 0, 2, 4 with EXACT jpeg payloads
    assert [i for i, _ in real] == [0, 2, 4]
    assert all(b == frames[i] for i, b in real)
    # non-AVI input keeps the declared byte-slice stub shape
    stub = [r for r in out if r.id == 2]
    assert len(stub) == 3 and all(r.frame is not None for r in stub)
