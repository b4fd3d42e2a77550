"""Spherical-earth geodesy (no pyproj in this environment).

The reference's sphere functions (``st_distanceSphere``,
``st_lengthSphere``, ``st_bufferPoint`` — SURVEY.md §2.2) delegate to
GeoMesa's fast spheroid approximations; we use great-circle (haversine)
math on the WGS84 mean radius. Tolerance-checked, not hash-checked.
"""

from __future__ import annotations

import math

import numpy as np

from geomesa_hive_spark.geom.core import Geometry, Point, Polygon
from geomesa_hive_spark.geom import algorithms as alg

__all__ = [
    "EARTH_RADIUS_M",
    "haversine_m",
    "distance_sphere",
    "vincenty_m",
    "length_spheroid",
    "length_sphere",
    "area_spheroid",
    "buffer_point",
]

#: WGS84 mean radius (meters)
EARTH_RADIUS_M = 6_371_008.7714


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Vectorized great-circle distance in meters between lon/lat degrees."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(v, dtype=np.float64)) for v in (lon1, lat1, lon2, lat2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def distance_sphere(a: Geometry, b: Geometry) -> float:
    """Great-circle distance (m) between the planar closest points of a and b.

    Matches GeoMesa's approach: find closest points in lon/lat space, then
    measure the sphere distance between them.
    """
    if a.is_empty or b.is_empty:
        return float("nan")
    if alg.intersects(a, b):
        return 0.0
    _, ax, ay = alg._closest_pair(a, b)
    _, bx, by = alg._closest_pair(b, a)
    return float(haversine_m(ax, ay, bx, by))


def length_sphere(g: Geometry) -> float:
    """Sum of great-circle lengths of every segment (meters)."""
    segs = alg._geom_segments(g)
    if segs.shape[0] == 0:
        return 0.0
    d = haversine_m(segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3])
    return float(np.sum(d))


def _destination(lon: float, lat: float, bearing_rad: np.ndarray, dist_m: float):
    """Spherical direct problem: destination lon/lat for bearings+distance."""
    delta = dist_m / EARTH_RADIUS_M
    phi1 = math.radians(lat)
    lam1 = math.radians(lon)
    sin_phi2 = math.sin(phi1) * math.cos(delta) + math.cos(phi1) * math.sin(delta) * np.cos(bearing_rad)
    phi2 = np.arcsin(np.clip(sin_phi2, -1.0, 1.0))
    y = np.sin(bearing_rad) * math.sin(delta) * math.cos(phi1)
    x = math.cos(delta) - math.sin(phi1) * sin_phi2
    lam2 = lam1 + np.arctan2(y, x)
    return np.degrees(lam2), np.degrees(phi2)


def buffer_point(p: Point, radius_m: float, quad_segs: int = 16) -> Polygon:
    """Geodesic buffer: polygon of points at great-circle distance radius_m
    around a lon/lat point (the reference buffers on the spheroid,
    ``ST_BufferPoint.scala:24``)."""
    if p.is_empty:
        return Polygon(None)
    n = max(8, 4 * quad_segs)
    bearings = np.linspace(0.0, 2 * math.pi, n, endpoint=False)
    lons, lats = _destination(p.x, p.y, bearings, radius_m)
    ring = np.column_stack([lons, lats])
    ring = np.vstack([ring, ring[:1]])
    # enforce CCW shell
    if alg._ring_area(ring) < 0:
        ring = ring[::-1]
    return Polygon(ring)


#: WGS84 defining constants for the spheroidal (Vincenty) path
_V_A = 6378137.0
_V_F = 1.0 / 298.257223563
_V_B = _V_A * (1.0 - _V_F)

#: fixed Vincenty iteration count: λ converges to double precision in
#: <6 rounds except near-antipodally; a FIXED count keeps the kernel
#: vectorized, deterministic, and oracle-unrollable (the Mollweide
#: fixed-Newton convention)
VINCENTY_ITERS = 12


def vincenty_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Vectorized WGS84 ellipsoidal (geodesic) distance in meters —
    Vincenty's inverse formula (1975), the spheroidal upgrade of
    ``haversine_m`` (which assumes the 6371.0088 km mean sphere; the
    flattening correction is worth up to ~0.5% ≈ 50 km/10000 km).

    Fixed ``VINCENTY_ITERS`` λ-iterations; coincident points return
    exactly 0. Honest limit: NEARLY-antipodal pairs (the classic
    Vincenty non-convergence region within ~0.5° of the antipode) get
    the fixed-iteration approximation rather than a λ>π bail-out —
    fine for the intra-regional distances this engine computes;
    beyond it, Karney's algorithm is the public successor."""
    lon1, lat1, lon2, lat2 = (
        np.radians(np.asarray(v, dtype=np.float64))
        for v in (lon1, lat1, lon2, lat2)
    )
    u1 = np.arctan((1.0 - _V_F) * np.tan(lat1))
    u2 = np.arctan((1.0 - _V_F) * np.tan(lat2))
    ll = lon2 - lon1
    su1, cu1 = np.sin(u1), np.cos(u1)
    su2, cu2 = np.sin(u2), np.cos(u2)
    lam = ll.copy() if isinstance(ll, np.ndarray) else np.asarray(ll)
    sin_sig = np.zeros_like(lam)
    cos_sig = np.ones_like(lam)
    sig = np.zeros_like(lam)
    cos2a = np.ones_like(lam)
    cos2sm = np.zeros_like(lam)
    for _ in range(VINCENTY_ITERS):
        sl, cl = np.sin(lam), np.cos(lam)
        t1 = cu2 * sl
        t2 = cu1 * su2 - su1 * cu2 * cl
        sin_sig = np.sqrt(t1 * t1 + t2 * t2)
        cos_sig = su1 * su2 + cu1 * cu2 * cl
        sig = np.arctan2(sin_sig, cos_sig)
        safe = np.where(sin_sig == 0.0, 1.0, sin_sig)
        sin_a = np.where(sin_sig == 0.0, 0.0, cu1 * cu2 * sl / safe)
        cos2a = 1.0 - sin_a * sin_a
        safe_c = np.where(cos2a == 0.0, 1.0, cos2a)
        cos2sm = np.where(
            cos2a == 0.0, 0.0, cos_sig - 2.0 * su1 * su2 / safe_c
        )
        c = _V_F / 16.0 * cos2a * (4.0 + _V_F * (4.0 - 3.0 * cos2a))
        lam = ll + (1.0 - c) * _V_F * sin_a * (
            sig + c * sin_sig * (
                cos2sm + c * cos_sig * (-1.0 + 2.0 * cos2sm * cos2sm)
            )
        )
    usq = cos2a * (_V_A * _V_A - _V_B * _V_B) / (_V_B * _V_B)
    aa = 1.0 + usq / 16384.0 * (
        4096.0 + usq * (-768.0 + usq * (320.0 - 175.0 * usq))
    )
    bb = usq / 1024.0 * (256.0 + usq * (-128.0 + usq * (74.0 - 47.0 * usq)))
    dsig = bb * sin_sig * (
        cos2sm + bb / 4.0 * (
            cos_sig * (-1.0 + 2.0 * cos2sm * cos2sm)
            - bb / 6.0 * cos2sm * (-3.0 + 4.0 * sin_sig * sin_sig)
            * (-3.0 + 4.0 * cos2sm * cos2sm)
        )
    )
    return _V_B * aa * (sig - dsig)


def length_spheroid(g: Geometry) -> float:
    """Sum of WGS84 ellipsoidal (Vincenty) segment lengths in meters —
    the spheroidal upgrade of ``length_sphere`` (PostGIS
    ST_LengthSpheroid semantics)."""
    segs = alg._geom_segments(g)
    if segs.shape[0] == 0:
        return 0.0
    d = vincenty_m(segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3])
    return float(np.sum(d))


# ---------------------------------------------------------------------------
# ellipsoidal polygon area (round 13) — st_areaSpheroid
# ---------------------------------------------------------------------------

# 8-point Gauss–Legendre nodes/weights on [-1, 1] (Abramowitz & Stegun
# 25.4.30) — fixed order keeps the quadrature DETERMINISTIC; the
# integrand F(φ(λ)) is analytic and an 8-point rule is exact to degree
# 15 in λ, far past the double-precision floor for geographic spans.
_GL8 = (
    (-0.9602898564975363, 0.1012285362903763),
    (-0.7966664774136267, 0.2223810344533745),
    (-0.5255324099163290, 0.3137066458778873),
    (-0.1834346424956498, 0.3626837833783620),
    (0.1834346424956498, 0.3626837833783620),
    (0.5255324099163290, 0.3137066458778873),
    (0.7966664774136267, 0.2223810344533745),
    (0.9602898564975363, 0.1012285362903763),
)

_AS_E2 = _V_F * (2.0 - _V_F)          # WGS84 e²
_AS_E = math.sqrt(_AS_E2)
_AS_HB2 = 0.5 * _V_B * _V_B           # b²/2


def _area_antideriv(sinphi: float) -> float:
    """F(φ) = (b²/2)·[ sinφ/(1−e²sin²φ) + (1/2e)·ln((1+e·sinφ)/(1−e·sinφ)) ]
    — the exact antiderivative of the WGS84 area element
    b²·cosφ/(1−e²sin²φ)² over latitude (the textbook closed form for
    the area between the equator and the parallel at φ, per radian of
    longitude)."""
    s = sinphi
    return _AS_HB2 * (
        s / (1.0 - _AS_E2 * s * s)
        + math.log((1.0 + _AS_E * s) / (1.0 - _AS_E * s)) / (2.0 * _AS_E)
    )


def _ring_area_spheroid(ring: np.ndarray) -> float:
    """|∮ F(φ) dλ| over a closed ring whose edges are STRAIGHT IN THE
    (λ, φ) PLANE — the same plate-carrée edge model every predicate and
    planar measure in this kernel uses, with the EXACT WGS84 area
    element. Constant-latitude edges integrate in closed form (F is
    constant); slanted edges use the fixed 8-point Gauss–Legendre rule
    with φ linear in λ. Meridian edges (Δλ = 0) contribute nothing."""
    total = 0.0
    for i in range(ring.shape[0] - 1):
        lam1, phi1 = math.radians(ring[i, 0]), math.radians(ring[i, 1])
        lam2, phi2 = math.radians(ring[i + 1, 0]), math.radians(ring[i + 1, 1])
        dlam = lam2 - lam1
        if dlam == 0.0:
            continue
        if phi1 == phi2:
            total += _area_antideriv(math.sin(phi1)) * dlam
            continue
        mid = 0.5 * (lam1 + lam2)
        half = 0.5 * dlam
        slope = (phi2 - phi1) / dlam
        acc = 0.0
        for x, w in _GL8:
            lam = mid + half * x
            phi = phi1 + slope * (lam - lam1)
            acc += w * _area_antideriv(math.sin(phi))
        total += acc * half
    return abs(total)


def area_spheroid(g: Geometry) -> float:
    """WGS84 ellipsoidal polygon area in m² (PostGIS geography
    ST_Area's role; reference has planar st_area only —
    spatial/src/.../package.scala area delegates to JTS planar). Edge
    semantics: vertices connect along plate-carrée straight lines
    (linear in lon/lat) — consistent with every other measure and
    predicate in this kernel, and EXACT (closed form, no quadrature
    error) for the meridian/parallel-bounded quadrangles of classical
    geodesy. Holes subtract; multi-part geometries sum; non-areal
    geometries are 0. Longitudes are used as given — split
    antimeridian-crossing rings first (st_antimeridianSafe)."""
    total = 0.0
    for part in g.geometries():
        if part.geom_type != "Polygon" or part.is_empty:
            continue
        total += _ring_area_spheroid(part.shell)
        for hole in part.holes:
            total -= _ring_area_spheroid(hole)
    return float(total)
