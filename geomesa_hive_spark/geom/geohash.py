"""Geohash encode/decode, precision expressed in BITS.

The reference's geohash functions take precision in bits (GeoMesa
``ST_GeomFromGeoHash(s, prec)`` / ``ST_AsGeoHash(geom, prec)`` — SURVEY.md
§2.2): a geohash string covers 5 bits per base-32 character.
"""

from __future__ import annotations

import math

__all__ = ["encode", "decode_bbox", "decode_point"]

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_BASE32_INV = {c: i for i, c in enumerate(_BASE32)}


def encode(lat: float, lon: float, precision_bits: int) -> str:
    """Geohash of a point at the given bit precision (chars = ceil(bits/5)).

    Closed-form quantization — lon/lat each floor-scaled into their bit
    budget in ONE arithmetic expression, then bit-interleaved (lon
    first) — instead of the textbook iterative interval-halving. The two
    agree except when a coordinate sits within ~2 ulp of a cell
    boundary; the closed form is used because any SQL engine replays
    floor((lon+180)/360 * 2^n) bit-identically (same IEEE ops in the
    same order), which makes geohash outputs oracle-verifiable."""
    nchars = max(1, math.ceil(precision_bits / 5))
    nbits = nchars * 5
    lon_nb = (nbits + 1) // 2  # lon takes even bit positions, so one more on odd totals
    lat_nb = nbits // 2
    lx = min(max(int((lon + 180.0) / 360.0 * float(1 << lon_nb)), 0), (1 << lon_nb) - 1)
    ly = min(max(int((lat + 90.0) / 180.0 * float(1 << lat_nb)), 0), (1 << lat_nb) - 1)
    z = 0
    for p in range(nbits):
        if p % 2 == 0:
            bit = (lx >> (lon_nb - 1 - p // 2)) & 1
        else:
            bit = (ly >> (lat_nb - 1 - p // 2)) & 1
        z = (z << 1) | bit
    return "".join(
        _BASE32[(z >> (5 * (nchars - 1 - i))) & 31] for i in range(nchars)
    )


def decode_bbox(gh: str, precision_bits: int | None = None) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) of the geohash cell.

    ``precision_bits`` caps how many bits of the string are honored
    (reference passes it explicitly; None = all bits of the string).
    """
    total_bits = len(gh) * 5 if precision_bits is None else min(precision_bits, len(gh) * 5)
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    used = 0
    for ch in gh.lower():
        v = _BASE32_INV[ch]
        for shift in range(4, -1, -1):
            if used >= total_bits:
                break
            b = (v >> shift) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if b:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if b:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
            used += 1
        if used >= total_bits:
            break
    return (lon_lo, lat_lo, lon_hi, lat_hi)


def decode_point(gh: str, precision_bits: int | None = None) -> tuple[float, float]:
    """(lon, lat) center of the geohash cell."""
    xmin, ymin, xmax, ymax = decode_bbox(gh, precision_bits)
    return ((xmin + xmax) / 2, (ymin + ymax) / 2)
