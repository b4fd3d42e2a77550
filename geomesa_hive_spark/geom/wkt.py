"""WKT reader/writer (OGC Simple Features, incl. Z / M / ZM and EMPTY).

Output formatting matches JTS defaults (full double precision, no
trailing-zero trimming games) since the reference's ``st_asText`` is JTS
``WKTWriter`` via GeoMesa (``spatial/.../ST_AsText.scala:23``).
"""

from __future__ import annotations

import re

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

__all__ = ["from_wkt", "to_wkt"]

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<word>[A-Za-z]+)
      | (?P<num>[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)
      | (?P<punct>[(),])
    )""",
    re.VERBOSE,
)


class _Tokens:
    def __init__(self, s: str):
        self.toks: list[str] = []
        pos = 0
        n = len(s)
        while pos < n:
            m = _TOKEN.match(s, pos)
            if m is None:
                if s[pos:].strip() == "":
                    break
                raise ValueError(f"bad WKT near {s[pos:pos+20]!r}")
            self.toks.append(m.group().strip())
            pos = m.end()
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of WKT")
        self.i += 1
        return t

    def expect(self, tok: str):
        t = self.next()
        if t.upper() != tok:
            raise ValueError(f"expected {tok}, got {t}")


def from_wkt(s: str | None) -> Geometry | None:
    if s is None:
        return None
    toks = _Tokens(s)
    g = _parse_geom(toks)
    return g


def _parse_dims(toks: _Tokens) -> tuple[bool, bool]:
    t = toks.peek()
    if t and t.upper() in ("Z", "M", "ZM"):
        toks.next()
        u = t.upper()
        return "Z" in u, "M" in u
    return False, False


def _parse_coord_seq(toks: _Tokens, ndim: int) -> np.ndarray:
    toks.expect("(")
    rows = []
    while True:
        row = [float(toks.next())]
        while toks.peek() not in (",", ")"):
            row.append(float(toks.next()))
        rows.append(row)
        if toks.next() == ")":
            break
    width = max(len(r) for r in rows)
    if width < 2:
        raise ValueError("coordinates need at least x y")
    a = np.full((len(rows), width), np.nan)
    for i, r in enumerate(rows):
        a[i, : len(r)] = r
    return a


def _is_empty(toks: _Tokens) -> bool:
    t = toks.peek()
    if t and t.upper() == "EMPTY":
        toks.next()
        return True
    return False


def _parse_geom(toks: _Tokens) -> Geometry:
    word = toks.next().upper()
    has_z, has_m = _parse_dims(toks)

    if word == "POINT":
        if _is_empty(toks):
            return Point(None, has_z=has_z, has_m=has_m)
        c = _parse_coord_seq(toks, 2)
        return Point(c, has_z=has_z or c.shape[1] == 3 and not has_m, has_m=has_m)
    if word == "LINESTRING":
        if _is_empty(toks):
            return LineString(None, has_z=has_z, has_m=has_m)
        return LineString(_parse_coord_seq(toks, 2), has_z=has_z, has_m=has_m)
    if word == "POLYGON":
        if _is_empty(toks):
            return Polygon(None, has_z=has_z, has_m=has_m)
        toks.expect("(")
        rings = [_parse_coord_seq(toks, 2)]
        while toks.peek() == ",":
            toks.next()
            rings.append(_parse_coord_seq(toks, 2))
        toks.expect(")")
        return Polygon(rings[0], rings[1:], has_z=has_z, has_m=has_m)
    if word in ("MULTIPOINT", "MULTILINESTRING", "MULTIPOLYGON"):
        cls = {
            "MULTIPOINT": (MultiPoint, Point),
            "MULTILINESTRING": (MultiLineString, LineString),
            "MULTIPOLYGON": (MultiPolygon, Polygon),
        }[word]
        multi_cls, part_cls = cls
        if _is_empty(toks):
            return multi_cls([], has_z=has_z, has_m=has_m)
        toks.expect("(")
        parts = []
        while True:
            if word == "MULTIPOINT" and toks.peek() not in ("(",):
                # bare form: MULTIPOINT (1 2, 3 4)
                row = [float(toks.next())]
                while toks.peek() not in (",", ")"):
                    row.append(float(toks.next()))
                parts.append(Point([row], has_z=has_z, has_m=has_m))
            elif word == "MULTIPOINT":
                c = _parse_coord_seq(toks, 2)
                parts.append(Point(c, has_z=has_z, has_m=has_m))
            elif word == "MULTILINESTRING":
                parts.append(LineString(_parse_coord_seq(toks, 2), has_z=has_z, has_m=has_m))
            else:  # MULTIPOLYGON
                toks.expect("(")
                rings = [_parse_coord_seq(toks, 2)]
                while toks.peek() == ",":
                    toks.next()
                    rings.append(_parse_coord_seq(toks, 2))
                toks.expect(")")
                parts.append(Polygon(rings[0], rings[1:], has_z=has_z, has_m=has_m))
            if toks.next() == ")":
                break
        return multi_cls(parts, has_z=has_z, has_m=has_m)
    if word == "GEOMETRYCOLLECTION":
        if _is_empty(toks):
            return GeometryCollection([], has_z=has_z, has_m=has_m)
        toks.expect("(")
        parts = [_parse_geom(toks)]
        while toks.peek() == ",":
            toks.next()
            parts.append(_parse_geom(toks))
        toks.expect(")")
        return GeometryCollection(parts, has_z=has_z, has_m=has_m)
    raise ValueError(f"unknown WKT type {word}")


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _fmt_num(v: float, rp: int | None) -> str:
    if rp is not None:
        v = round(v, rp)
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _fmt_coords(a: np.ndarray, rp: int | None) -> str:
    return ", ".join(" ".join(_fmt_num(v, rp) for v in row) for row in a)


def _dims_tag(g: Geometry) -> str:
    if g.has_z and g.has_m:
        return " ZM"
    if g.has_m:
        return " M"
    # JTS WKTWriter does not tag Z
    return ""


def to_wkt(g: Geometry | None, rounding_precision: int | None = None) -> str | None:
    if g is None:
        return None
    rp = rounding_precision
    t = g.geom_type
    tag = t.upper() + _dims_tag(g)
    if g.is_empty:
        return f"{tag} EMPTY"
    if t == "Point":
        return f"{tag} ({_fmt_coords(g.coords, rp)})"
    if t == "LineString":
        return f"{tag} ({_fmt_coords(g.coords, rp)})"
    if t == "Polygon":
        inner = ", ".join(f"({_fmt_coords(r, rp)})" for r in g.rings)
        return f"{tag} ({inner})"
    if t == "MultiPoint":
        inner = ", ".join(f"({_fmt_coords(p.coords, rp)})" for p in g.geoms)
        return f"{tag} ({inner})"
    if t == "MultiLineString":
        inner = ", ".join(f"({_fmt_coords(l.coords, rp)})" for l in g.geoms)
        return f"{tag} ({inner})"
    if t == "MultiPolygon":
        inner = ", ".join(
            "(" + ", ".join(f"({_fmt_coords(r, rp)})" for r in p.rings) + ")"
            for p in g.geoms
        )
        return f"{tag} ({inner})"
    # GeometryCollection
    inner = ", ".join(to_wkt(p, rp) for p in g.geoms)
    return f"{tag} ({inner})"
