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
    """Geohash of a point at the given bit precision (chars = ceil(bits/5))."""
    nchars = max(1, math.ceil(precision_bits / 5))
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True  # longitude first
    while len(bits) < nchars * 5:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for i in range(0, len(bits), 5):
        v = 0
        for b in bits[i : i + 5]:
            v = (v << 1) | b
        out.append(_BASE32[v])
    return "".join(out)


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
