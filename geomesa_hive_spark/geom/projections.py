"""Map projections for st_geomReproject: WGS84 ↔ Web Mercator and
WGS84 ↔ UTM (Transverse Mercator, any zone, both hemispheres).

The reference delegates reprojection to a full proj engine
(``spatial-index/.../ST_GeomReproject.scala:25``); this container has
no pyproj, so the two families real users hit first are implemented
directly: the spherical Web Mercator pair (see functions/st.py) and the
ellipsoidal UTM forward/inverse below (USGS/Snyder series, the same
formulation every proj implementation uses; accurate to ~1 mm within a
zone, degrading gracefully a few degrees outside).

Numerical layout is deliberate: every coefficient is precomputed as a
Python double and the per-point expressions use explicit left-to-right
association (``A*A*A`` not ``A**3``), so a SQL oracle that mirrors the
same expression text computes bit-near-identical results (differences
bounded by 1-ulp libm sin/cos deviations, far below the rounding used
in verified outputs).
"""

from __future__ import annotations

import math
import re

import numpy as np

__all__ = ["parse_crs", "utm_forward", "utm_inverse", "UTM_CONSTS"]

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_EP2 = _E2 / (1.0 - _E2)
_K0 = 0.9996

# meridian-arc series coefficients (Snyder 3-21)
_M1 = 1.0 - _E2 / 4.0 - 3.0 * _E2 * _E2 / 64.0 - 5.0 * _E2 * _E2 * _E2 / 256.0
_M2 = 3.0 * _E2 / 8.0 + 3.0 * _E2 * _E2 / 32.0 + 45.0 * _E2 * _E2 * _E2 / 1024.0
_M3 = 15.0 * _E2 * _E2 / 256.0 + 45.0 * _E2 * _E2 * _E2 / 1024.0
_M4 = 35.0 * _E2 * _E2 * _E2 / 3072.0

# footpoint-latitude series (Snyder 3-26)
_E1 = (1.0 - math.sqrt(1.0 - _E2)) / (1.0 + math.sqrt(1.0 - _E2))
_P1 = 3.0 * _E1 / 2.0 - 27.0 * _E1 * _E1 * _E1 / 32.0
_P2 = 21.0 * _E1 * _E1 / 16.0 - 55.0 * _E1 * _E1 * _E1 * _E1 / 32.0
_P3 = 151.0 * _E1 * _E1 * _E1 / 96.0
_P4 = 1097.0 * _E1 * _E1 * _E1 * _E1 / 512.0

#: constants an oracle-SQL generator needs to replay utm_forward exactly
UTM_CONSTS = {
    "a": _A, "e2": _E2, "ep2": _EP2, "k0": _K0,
    "m1": _M1, "m2": _M2, "m3": _M3, "m4": _M4,
}

_UTM_RE = re.compile(r"^EPSG:(32[67])(\d{2})$", re.IGNORECASE)


def parse_crs(crs: str):
    """Classify a CRS string: ``("longlat",)``, ``("webmerc",)`` or
    ``("utm", zone, north)``. Raises ValueError for anything else —
    silent nulls on unsupported CRSes lose data invisibly."""
    c = crs.strip()
    m = _UTM_RE.match(c)
    if m:
        zone = int(m.group(2))
        if not 1 <= zone <= 60:
            raise ValueError(f"UTM zone out of range in {crs!r}")
        return ("utm", zone, m.group(1) == "326")
    low = c.lower()
    if "4326" in low or "longlat" in low:
        return ("longlat",)
    if "3857" in low or "merc" in low:
        return ("webmerc",)
    if "utm" in low:  # proj4 '+proj=utm +zone=NN [+south]'
        zm = re.search(r"\+zone=(\d+)", low)
        if zm:
            return ("utm", int(zm.group(1)), "+south" not in low)
    raise ValueError(
        f"unsupported CRS {crs!r}: supported are EPSG:4326 (lon/lat), "
        "EPSG:3857 (web mercator), EPSG:326xx/327xx (UTM north/south) "
        "and their proj4 equivalents"
    )


def lon0_rad(zone: int) -> float:
    """Central meridian of a UTM zone, radians."""
    return math.radians(float(-183 + 6 * zone))


def utm_forward(coords: np.ndarray, zone: int, north: bool) -> np.ndarray:
    """(lon°, lat°) → UTM (easting, northing) meters. Vectorized."""
    out = coords.copy()
    lam = np.radians(coords[:, 0])
    phi = np.radians(coords[:, 1])
    lam0 = lon0_rad(zone)
    sp = np.sin(phi)
    cp = np.cos(phi)
    nn = _A / np.sqrt(1.0 - _E2 * sp * sp)
    t = np.tan(phi) * np.tan(phi)
    c = _EP2 * cp * cp
    aa = (lam - lam0) * cp
    m = _A * (_M1 * phi - _M2 * np.sin(2.0 * phi) + _M3 * np.sin(4.0 * phi) - _M4 * np.sin(6.0 * phi))
    out[:, 0] = 500000.0 + _K0 * nn * (
        aa
        + (1.0 - t + c) * aa * aa * aa / 6.0
        + (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * _EP2) * aa * aa * aa * aa * aa / 120.0
    )
    y = _K0 * (
        m
        + nn * np.tan(phi) * (
            aa * aa / 2.0
            + (5.0 - t + 9.0 * c + 4.0 * c * c) * aa * aa * aa * aa / 24.0
            + (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * _EP2) * aa * aa * aa * aa * aa * aa / 720.0
        )
    )
    out[:, 1] = y if north else y + 10000000.0
    return out


def utm_inverse(coords: np.ndarray, zone: int, north: bool) -> np.ndarray:
    """UTM (easting, northing) meters → (lon°, lat°). Vectorized."""
    out = coords.copy()
    x = coords[:, 0] - 500000.0
    y = coords[:, 1] if north else coords[:, 1] - 10000000.0
    lam0 = lon0_rad(zone)
    m = y / _K0
    mu = m / (_A * _M1)
    phi1 = (
        mu
        + _P1 * np.sin(2.0 * mu)
        + _P2 * np.sin(4.0 * mu)
        + _P3 * np.sin(6.0 * mu)
        + _P4 * np.sin(8.0 * mu)
    )
    sp1 = np.sin(phi1)
    cp1 = np.cos(phi1)
    tp1 = np.tan(phi1)
    c1 = _EP2 * cp1 * cp1
    t1 = tp1 * tp1
    n1 = _A / np.sqrt(1.0 - _E2 * sp1 * sp1)
    r1 = _A * (1.0 - _E2) / (1.0 - _E2 * sp1 * sp1) ** 1.5
    d = x / (n1 * _K0)
    phi = phi1 - (n1 * tp1 / r1) * (
        d * d / 2.0
        - (5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1 * c1 - 9.0 * _EP2) * d * d * d * d / 24.0
        + (61.0 + 90.0 * t1 + 298.0 * c1 + 45.0 * t1 * t1 - 252.0 * _EP2 - 3.0 * c1 * c1)
        * d * d * d * d * d * d / 720.0
    )
    lam = lam0 + (
        d
        - (1.0 + 2.0 * t1 + c1) * d * d * d / 6.0
        + (5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1 * c1 + 8.0 * _EP2 + 24.0 * t1 * t1)
        * d * d * d * d * d / 120.0
    ) / cp1
    out[:, 0] = np.degrees(lam)
    out[:, 1] = np.degrees(phi)
    return out
