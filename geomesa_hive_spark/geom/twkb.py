"""TWKB (Tiny WKB) codec.

Only ``st_asTWKB`` exposes this format (the reference implements write
AND read at ``jts/src/main/scala/com/azavea/hiveless/spatial/util/TWKBUtils.scala:21-37``,
default precision 6 like the TWKB spec's common usage). We implement the
standard TWKB wire format: zigzag varint deltas of scaled coordinates.
The decoder exists for symmetry/testing; no SQL name reads TWKB in the
reference surface.
"""

from __future__ import annotations

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

__all__ = ["to_twkb", "from_twkb"]

_TYPE_IDS = {
    "Point": 1,
    "LineString": 2,
    "Polygon": 3,
    "MultiPoint": 4,
    "MultiLineString": 5,
    "MultiPolygon": 6,
    "GeometryCollection": 7,
}


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _svarint(n: int) -> bytes:
    return _varint((n << 1) ^ (n >> 63))


class _Enc:
    def __init__(self, precision: int):
        self.scale = 10 ** precision
        self.prev = [0, 0]

    def coords(self, arr) -> bytes:
        out = bytearray()
        for x, y in arr[:, :2]:
            ix = round(float(x) * self.scale)
            iy = round(float(y) * self.scale)
            out += _svarint(ix - self.prev[0])
            out += _svarint(iy - self.prev[1])
            self.prev = [ix, iy]
        return bytes(out)


def to_twkb(g: Geometry | None, precision: int = 6) -> bytes | None:
    if g is None:
        return None
    type_id = _TYPE_IDS[g.geom_type]
    zz_prec = ((precision << 1) ^ (precision >> 31)) & 0x0F
    header = bytes([type_id | (zz_prec << 4)])
    if g.is_empty:
        # metadata byte with the empty bit (0x10)
        return header + bytes([0x10])
    meta = bytes([0x00])
    enc = _Enc(precision)
    body = bytearray()
    t = g.geom_type
    if t == "Point":
        body += enc.coords(g.coords)
    elif t == "LineString":
        body += _varint(g.coords.shape[0])
        body += enc.coords(g.coords)
    elif t == "Polygon":
        rings = g.rings
        body += _varint(len(rings))
        for r in rings:
            # TWKB drops the duplicated closing point
            body += _varint(r.shape[0] - 1)
            body += enc.coords(r[:-1])
    elif t in ("MultiPoint", "MultiLineString", "MultiPolygon", "GeometryCollection"):
        body += _varint(len(g.geoms))
        if t == "MultiPoint":
            for p in g.geoms:
                body += enc.coords(p.coords)
        elif t == "MultiLineString":
            for l in g.geoms:
                body += _varint(l.coords.shape[0])
                body += enc.coords(l.coords)
        elif t == "MultiPolygon":
            for p in g.geoms:
                body += _varint(len(p.rings))
                for r in p.rings:
                    body += _varint(r.shape[0] - 1)
                    body += enc.coords(r[:-1])
        else:
            for p in g.geoms:
                body += to_twkb(p, precision)
    return header + meta + bytes(body)


_EMPTY = {
    1: Point,
    2: LineString,
    3: Polygon,
    4: MultiPoint,
    5: MultiLineString,
    6: MultiPolygon,
    7: GeometryCollection,
}


class _Dec:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos
        self.prev = [0, 0]

    def varint(self) -> int:
        n = shift = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                return n
            shift += 7

    def svarint(self) -> int:
        n = self.varint()
        return (n >> 1) ^ -(n & 1)

    def coords(self, count: int, scale: float, close: bool = False) -> np.ndarray:
        pts = np.empty((count + (1 if close else 0), 2), dtype=np.float64)
        for i in range(count):
            self.prev[0] += self.svarint()
            self.prev[1] += self.svarint()
            pts[i, 0] = self.prev[0] / scale
            pts[i, 1] = self.prev[1] / scale
        if close:
            pts[count] = pts[0]
        return pts


def _parse(d: _Dec) -> Geometry:
    header = d.buf[d.pos]
    d.pos += 1
    type_id = header & 0x0F
    zz = header >> 4
    precision = (zz >> 1) ^ -(zz & 1)
    scale = float(10 ** precision)
    meta = d.buf[d.pos]
    d.pos += 1
    if meta & 0x0F:
        # bbox (0x01) / size (0x02) / idlist (0x04) / extended-dims
        # (0x08): spec-valid but outside this roundtrip decoder's scope
        # (our encoder never sets them). Raising beats silently decoding
        # the bbox varints as coordinate deltas.
        raise ValueError(
            f"TWKB optional blocks not supported (metadata byte 0x{meta:02x}: "
            "bbox/size/idlist/extended-dims); this decoder handles the "
            "roundtrip subset produced by to_twkb"
        )
    if meta & 0x10:
        return _EMPTY[type_id]()
    if type_id == 1:
        return Point(d.coords(1, scale)[0])
    if type_id == 2:
        return LineString(d.coords(d.varint(), scale))
    if type_id == 3:
        rings = [d.coords(d.varint(), scale, close=True) for _ in range(d.varint())]
        return Polygon(rings[0], rings[1:])
    n = d.varint()
    if type_id == 4:
        return MultiPoint([Point(d.coords(1, scale)[0]) for _ in range(n)])
    if type_id == 5:
        return MultiLineString(
            [LineString(d.coords(d.varint(), scale)) for _ in range(n)]
        )
    if type_id == 6:
        polys = []
        for _ in range(n):
            rings = [d.coords(d.varint(), scale, close=True) for _ in range(d.varint())]
            polys.append(Polygon(rings[0], rings[1:]))
        return MultiPolygon(polys)
    if type_id == 7:
        # nested full TWKB per part, each with its own delta state
        parts = []
        for _ in range(n):
            sub = _Dec(d.buf, d.pos)
            parts.append(_parse(sub))
            d.pos = sub.pos
        return GeometryCollection(parts)
    raise ValueError(f"unknown TWKB type id {type_id}")


def from_twkb(b: bytes | bytearray | None) -> Geometry | None:
    if b is None:
        return None
    return _parse(_Dec(bytes(b)))
