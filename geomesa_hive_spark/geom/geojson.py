"""GeoJSON (RFC 7946) reader/writer for the kernel geometry classes."""

from __future__ import annotations

import json

import numpy as np

from geomesa_hive_spark.geom.core import (
    Geometry,
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
)

__all__ = ["from_geojson", "to_geojson"]


def from_geojson(s: str | None) -> Geometry | None:
    if s is None:
        return None
    obj = json.loads(s)
    return _from_obj(obj)


def _from_obj(obj: dict) -> Geometry:
    t = obj["type"]
    if t == "Feature":
        return _from_obj(obj["geometry"])
    if t == "FeatureCollection":
        return GeometryCollection([_from_obj(f) for f in obj["features"]])
    if t == "GeometryCollection":
        return GeometryCollection([_from_obj(g) for g in obj["geometries"]])
    c = obj.get("coordinates")
    if t == "Point":
        return Point([c]) if c else Point(None)
    if t == "LineString":
        return LineString(c or [])
    if t == "Polygon":
        if not c:
            return Polygon(None)
        return Polygon(c[0], c[1:])
    if t == "MultiPoint":
        return MultiPoint([Point([p]) for p in (c or [])])
    if t == "MultiLineString":
        return MultiLineString([LineString(l) for l in (c or [])])
    if t == "MultiPolygon":
        return MultiPolygon([Polygon(p[0], p[1:]) for p in (c or [])])
    raise ValueError(f"unknown GeoJSON type {t}")


def _coords_list(a: np.ndarray) -> list:
    return [[_num(v) for v in row] for row in a]


def _num(v: float):
    f = float(v)
    return int(f) if f.is_integer() and abs(f) < 1e15 else f


def to_geojson(g: Geometry | None) -> str | None:
    if g is None:
        return None
    return json.dumps(_to_obj(g), separators=(",", ":"))


def _to_obj(g: Geometry) -> dict:
    t = g.geom_type
    if t == "Point":
        return {"type": "Point", "coordinates": [] if g.is_empty else [_num(v) for v in g.coords[0]]}
    if t == "LineString":
        return {"type": "LineString", "coordinates": _coords_list(g.coords)}
    if t == "Polygon":
        return {"type": "Polygon", "coordinates": [_coords_list(r) for r in g.rings]}
    if t == "MultiPoint":
        return {"type": "MultiPoint", "coordinates": [[_num(v) for v in p.coords[0]] for p in g.geoms if not p.is_empty]}
    if t == "MultiLineString":
        return {"type": "MultiLineString", "coordinates": [_coords_list(l.coords) for l in g.geoms]}
    if t == "MultiPolygon":
        return {
            "type": "MultiPolygon",
            "coordinates": [[_coords_list(r) for r in p.rings] for p in g.geoms],
        }
    return {"type": "GeometryCollection", "geometries": [_to_obj(p) for p in g.geoms]}
