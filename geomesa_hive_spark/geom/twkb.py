"""TWKB (Tiny WKB) encoder.

Only ``st_asTWKB`` exposes this format (the reference implements it at
``jts/src/main/scala/com/azavea/hiveless/spatial/util/TWKBUtils.scala``,
default precision 6 like the TWKB spec's common usage). We implement the
standard TWKB wire format: zigzag varint deltas of scaled coordinates.
"""

from __future__ import annotations

from geomesa_hive_spark.geom.core import Geometry

__all__ = ["to_twkb"]

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
