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
    "length_sphere",
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
