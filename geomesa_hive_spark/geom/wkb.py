"""WKB codec (ISO + EWKB-flag tolerant on read; writes little-endian ISO).

This is the engine's canonical on-column geometry encoding: geometry
columns are ``BinaryType`` holding WKB, mirroring the reference's
TWKB-bytes-in-BinaryType model
(``spatial/src/main/scala/com/azavea/hiveless/spatial/package.scala:35-38``)
— the concrete byte format is internal, only ``st_asBinary``/``st_asTWKB``
expose specific encodings.

Includes fully vectorized NumPy fast paths for Point columns (the
dominant shape at scale): a 2-D point is a fixed 21-byte record, so a
whole pandas Series encodes/decodes with one ``frombuffer`` pass.
"""

from __future__ import annotations

import struct

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

__all__ = [
    "from_wkb",
    "to_wkb",
    "points_to_wkb_array",
    "wkb_array_to_points",
    "POINT_WKB_SIZE",
]

_TYPE_IDS = {
    "Point": 1,
    "LineString": 2,
    "Polygon": 3,
    "MultiPoint": 4,
    "MultiLineString": 5,
    "MultiPolygon": 6,
    "GeometryCollection": 7,
}
_ID_TYPES = {v: k for k, v in _TYPE_IDS.items()}

# EWKB dimension flags
_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000

POINT_WKB_SIZE = 21  # 1 + 4 + 8 + 8

_POINT_REC = np.dtype(
    {
        "names": ["bo", "typ", "x", "y"],
        "formats": ["u1", "<u4", "<f8", "<f8"],
        "offsets": [0, 1, 5, 13],
        "itemsize": POINT_WKB_SIZE,
    }
)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _type_code(g: Geometry) -> int:
    base = _TYPE_IDS[g.geom_type]
    # ISO: +1000 for Z, +2000 for M
    if g.has_z:
        base += 1000
    if g.has_m:
        base += 2000
    return base


def _write_coords(parts: list[bytes], coords: np.ndarray) -> None:
    parts.append(struct.pack("<I", coords.shape[0]))
    parts.append(np.ascontiguousarray(coords, dtype="<f8").tobytes())


def to_wkb(g: Geometry) -> bytes:
    """Serialize a geometry to little-endian ISO WKB."""
    parts: list[bytes] = []
    _write_geom(parts, g)
    return b"".join(parts)


def _write_geom(parts: list[bytes], g: Geometry) -> None:
    parts.append(b"\x01")
    parts.append(struct.pack("<I", _type_code(g)))
    t = g.geom_type
    if t == "Point":
        if g.is_empty:
            parts.append(struct.pack("<%dd" % g.ndim, *([float("nan")] * g.ndim)))
        else:
            parts.append(np.ascontiguousarray(g.coords[0], dtype="<f8").tobytes())
    elif t == "LineString":
        _write_coords(parts, g.coords)
    elif t == "Polygon":
        rings = g.rings
        parts.append(struct.pack("<I", len(rings)))
        for r in rings:
            _write_coords(parts, r)
    else:  # multi / collection
        parts.append(struct.pack("<I", len(g.geoms)))
        for part in g.geoms:
            _write_geom(parts, part)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, fmt: str):
        v = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += struct.calcsize(fmt)
        return v


def from_wkb(buf: bytes | bytearray | memoryview | None) -> Geometry | None:
    """Parse WKB bytes. Returns None for None input."""
    if buf is None:
        return None
    if isinstance(buf, (bytearray, memoryview)):
        buf = bytes(buf)
    if len(buf) == POINT_WKB_SIZE and buf[0] == 1:
        # hot path: plain 2-D little-endian point
        typ, x, y = struct.unpack_from("<Idd", buf, 1)
        if typ == 1:
            return Point([[x, y]])
    return _read_geom(_Reader(buf))


def _read_geom(r: _Reader) -> Geometry:
    (bo,) = r.read("B")
    endian = "<" if bo == 1 else ">"
    (raw,) = r.read(endian + "I")
    has_z = bool(raw & _EWKB_Z)
    has_m = bool(raw & _EWKB_M)
    if raw & _EWKB_SRID:
        r.read(endian + "I")  # skip SRID
    code = raw & 0x0FFFFFFF
    if code >= 1000:  # ISO Z/M encoding
        kind = code % 1000
        zm = code // 1000
        has_z = has_z or zm in (1, 3)
        has_m = has_m or zm in (2, 3)
    else:
        kind = code
    ndim = 2 + has_z + has_m
    t = _ID_TYPES.get(kind)
    if t is None:
        raise ValueError(f"unknown WKB geometry type {raw:#x}")

    def coords(n: int) -> np.ndarray:
        flat = np.frombuffer(
            r.buf, dtype=endian + "f8", count=n * ndim, offset=r.pos
        )
        r.pos += n * ndim * 8
        return flat.reshape(n, ndim).astype(np.float64, copy=True)

    if t == "Point":
        c = coords(1)
        if np.isnan(c[0, :2]).all():
            return Point(None, has_z=has_z, has_m=has_m)
        return Point(c, has_z=has_z, has_m=has_m)
    if t == "LineString":
        (n,) = r.read(endian + "I")
        return LineString(coords(n), has_z=has_z, has_m=has_m)
    if t == "Polygon":
        (nr,) = r.read(endian + "I")
        rings = []
        for _ in range(nr):
            (n,) = r.read(endian + "I")
            rings.append(coords(n))
        if not rings:
            return Polygon(None, has_z=has_z, has_m=has_m)
        return Polygon(rings[0], rings[1:], has_z=has_z, has_m=has_m)
    # multi / collection
    (ng,) = r.read(endian + "I")
    parts = [_read_geom(r) for _ in range(ng)]
    cls = {
        "MultiPoint": MultiPoint,
        "MultiLineString": MultiLineString,
        "MultiPolygon": MultiPolygon,
        "GeometryCollection": GeometryCollection,
    }[t]
    return cls(parts, has_z=has_z, has_m=has_m)


# ---------------------------------------------------------------------------
# vectorized point fast paths
# ---------------------------------------------------------------------------


def points_to_wkb_array(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized: two float64 arrays -> object array of 21-byte point WKB."""
    n = len(x)
    rec = np.zeros(n, dtype=_POINT_REC)
    rec["bo"] = 1
    rec["typ"] = 1
    rec["x"] = x
    rec["y"] = y
    raw = rec.tobytes()
    out = np.empty(n, dtype=object)
    for i in range(n):
        out[i] = raw[i * POINT_WKB_SIZE : (i + 1) * POINT_WKB_SIZE]
    return out


def wkb_array_to_points(vals) -> tuple[np.ndarray, np.ndarray] | None:
    """Vectorized decode when every element is a plain 2-D point WKB.

    Returns ``(x, y)`` float64 arrays (NaN at None slots), or None when
    any element is not a 21-byte LE point — caller falls back to the
    generic per-row path.
    """
    n = len(vals)
    x = np.full(n, np.nan)
    y = np.full(n, np.nan)
    chunks = []
    idx = []
    for i, b in enumerate(vals):
        if b is None:
            continue
        if len(b) != POINT_WKB_SIZE or b[0] != 1:
            return None
        chunks.append(bytes(b))
        idx.append(i)
    if chunks:
        rec = np.frombuffer(b"".join(chunks), dtype=_POINT_REC)
        if not np.all(rec["typ"] == 1):
            return None
        ii = np.asarray(idx)
        x[ii] = rec["x"]
        y[ii] = rec["y"]
    return x, y
