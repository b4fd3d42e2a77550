"""Map projections for st_geomReproject: WGS84 ↔ Web Mercator,
WGS84 ↔ UTM (Transverse Mercator, any zone, both hemispheres), and
WGS84 ↔ Lambert conformal conic (param-driven, 1SP or 2SP — covers
Lambert-93 / State Plane / Canada Atlas and any proj4 ``+proj=lcc``).

The reference delegates reprojection to a full proj engine
(``spatial-index/.../ST_GeomReproject.scala:25``); this container has
no pyproj, so the three families real users hit first are implemented
directly: the spherical Web Mercator pair (see functions/st.py), the
ellipsoidal UTM forward/inverse, and the ellipsoidal LCC forward/
inverse below (USGS/Snyder formulations, the same every proj
implementation uses; accurate to ~1 mm within the projection's
validity area, degrading gracefully outside).

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

__all__ = [
    "parse_crs",
    "utm_forward",
    "utm_inverse",
    "UTM_CONSTS",
    "lcc_forward",
    "lcc_inverse",
    "lcc_consts",
]

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

# Well-known LCC systems by EPSG code: (lat_1, lat_2, lat_0, lon_0,
# x_0, y_0), parameters from the public EPSG registry definitions.
# (2154/3978 are defined on GRS80; GRS80 and WGS84 differ by ~0.1 mm
# in flattening — far below this module's 1 mm accuracy statement.)
_LCC_EPSG = {
    2154: (49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0),     # RGF93 / Lambert-93
    3978: (49.0, 77.0, 49.0, -95.0, 0.0, 0.0),              # NAD83 / Canada Atlas
    3347: (49.0, 77.0, 63.390675, -91.86666666666666, 6200000.0, 3000000.0),  # StatsCan
}


def _proj4_num(low: str, key: str, default: float | None) -> float:
    m = re.search(rf"\+{key}=([-+0-9.eE]+)", low)
    if m:
        return float(m.group(1))
    if default is None:
        raise ValueError(f"proj4 lcc string is missing required +{key}=")
    return default


def parse_crs(crs: str):
    """Classify a CRS string: ``("longlat",)``, ``("webmerc",)``,
    ``("utm", zone, north)`` or ``("lcc", lat1, lat2, lat0, lon0, x0,
    y0)``. Raises ValueError for anything else — silent nulls on
    unsupported CRSes lose data invisibly."""
    c = crs.strip()
    m = _UTM_RE.match(c)
    if m:
        zone = int(m.group(2))
        if not 1 <= zone <= 60:
            raise ValueError(f"UTM zone out of range in {crs!r}")
        return ("utm", zone, m.group(1) == "326")
    low = c.lower()
    em = re.match(r"^epsg:(\d+)$", low)
    if em and int(em.group(1)) in _LCC_EPSG:
        return ("lcc",) + _LCC_EPSG[int(em.group(1))]
    if "+proj=lcc" in low:  # param-driven: any conic of the family
        lat1 = _proj4_num(low, "lat_1", None)
        lat2 = _proj4_num(low, "lat_2", lat1)
        lat0 = _proj4_num(low, "lat_0", 0.0)
        lon0 = _proj4_num(low, "lon_0", 0.0)
        x0 = _proj4_num(low, "x_0", 0.0)
        y0 = _proj4_num(low, "y_0", 0.0)
        return ("lcc", lat1, lat2, lat0, lon0, x0, y0)
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
        "EPSG:3857 (web mercator), EPSG:326xx/327xx (UTM north/south), "
        "Lambert conformal conic (proj4 '+proj=lcc +lat_1=.. [+lat_2=..] "
        "[+lat_0=..] [+lon_0=..] [+x_0=..] [+y_0=..]' or EPSG:2154/3347/3978) "
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


# ---------------------------------------------------------------------------
# Lambert conformal conic (ellipsoidal, 1SP/2SP — Snyder pp. 107-109,
# the EPSG 9802 method used by Lambert-93, US State Plane, Canada Atlas)
# ---------------------------------------------------------------------------

_E = math.sqrt(_E2)


def _lcc_t_scalar(phi: float) -> float:
    sp = math.sin(phi)
    return math.tan(math.pi / 4.0 - phi / 2.0) / (
        (1.0 - _E * sp) / (1.0 + _E * sp)
    ) ** (_E / 2.0)


def _lcc_m_scalar(phi: float) -> float:
    sp = math.sin(phi)
    return math.cos(phi) / math.sqrt(1.0 - _E2 * sp * sp)


def lcc_consts(lat1: float, lat2: float, lat0: float, lon0: float) -> dict:
    """Projection constants (n, F, a·F, ρ0, λ0, e) for an LCC defined by
    standard parallels lat1/lat2 (degrees; equal → the 1SP tangent
    cone), latitude/longitude of origin lat0/lon0. All plain Python
    doubles so an oracle-SQL generator can embed them as literals and
    replay the per-point expressions exactly."""
    p1, p2, p0 = (math.radians(v) for v in (lat1, lat2, lat0))
    t1, t0 = _lcc_t_scalar(p1), _lcc_t_scalar(p0)
    m1 = _lcc_m_scalar(p1)
    if abs(p1 - p2) < 1e-12:
        n = math.sin(p1)
    else:
        t2, m2 = _lcc_t_scalar(p2), _lcc_m_scalar(p2)
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    f = m1 / (n * t1**n)
    af = _A * f
    return {
        "n": n,
        "f": f,
        "af": af,
        "rho0": af * t0**n,
        "lam0": math.radians(lon0),
        "e": _E,
    }


def lcc_forward(coords: np.ndarray, params: tuple) -> np.ndarray:
    """(lon°, lat°) → LCC (easting, northing) meters. Vectorized.
    ``params`` = (lat1, lat2, lat0, lon0, x0, y0) in degrees/meters."""
    lat1, lat2, lat0, lon0, x0, y0 = params
    k = lcc_consts(lat1, lat2, lat0, lon0)
    out = coords.copy()
    lam = np.radians(coords[:, 0])
    phi = np.radians(coords[:, 1])
    sp = np.sin(phi)
    t = np.tan(math.pi / 4.0 - phi / 2.0) / (
        (1.0 - k["e"] * sp) / (1.0 + k["e"] * sp)
    ) ** (k["e"] / 2.0)
    rho = k["af"] * t ** k["n"]
    th = k["n"] * (lam - k["lam0"])
    out[:, 0] = x0 + rho * np.sin(th)
    out[:, 1] = y0 + k["rho0"] - rho * np.cos(th)
    return out


def lcc_inverse(coords: np.ndarray, params: tuple) -> np.ndarray:
    """LCC (easting, northing) meters → (lon°, lat°). Vectorized.
    Latitude is recovered by the standard fixed-point iteration on the
    isometric-latitude relation (8 rounds: converges to <1e-12 rad —
    double precision — in ≤5 for |φ|<89°)."""
    lat1, lat2, lat0, lon0, x0, y0 = params
    k = lcc_consts(lat1, lat2, lat0, lon0)
    out = coords.copy()
    sgn = 1.0 if k["n"] >= 0 else -1.0
    xp = coords[:, 0] - x0
    yp = k["rho0"] - (coords[:, 1] - y0)
    rho = sgn * np.sqrt(xp * xp + yp * yp)
    th = np.arctan2(sgn * xp, sgn * yp)
    t = (rho / k["af"]) ** (1.0 / k["n"])
    phi = math.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        sp = np.sin(phi)
        phi = math.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - k["e"] * sp) / (1.0 + k["e"] * sp)) ** (k["e"] / 2.0)
        )
    out[:, 0] = np.degrees(th / k["n"] + k["lam0"])
    out[:, 1] = np.degrees(phi)
    return out
