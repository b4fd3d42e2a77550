"""Geometry value classes.

Coordinates are ``numpy.float64`` arrays of shape ``(n, ndim)`` where
``ndim`` is 2, 3 or 4 (XY / XYZ or XYM / XYZM).  The classes are plain
containers; all computation lives in :mod:`geomesa_hive_spark.geom.algorithms`.

Type semantics mirror JTS 1.18 (what the reference delegates to through
GeoMesa — SURVEY.md §2.2), e.g. ``dimension`` is the topological
dimension and empty geometries are representable for every type.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "Geometry",
    "Point",
    "LineString",
    "Polygon",
    "MultiPoint",
    "MultiLineString",
    "MultiPolygon",
    "GeometryCollection",
]


def _as_coords(coords, ndim: int | None = None) -> np.ndarray:
    a = np.asarray(coords, dtype=np.float64)
    if a.size == 0:
        return a.reshape(0, ndim or 2)
    if a.ndim == 1:
        a = a.reshape(1, -1)
    if a.ndim != 2 or a.shape[1] < 2 or a.shape[1] > 4:
        raise ValueError(f"bad coordinate array shape {a.shape}")
    return a


class Geometry:
    """Abstract base. ``has_z``/``has_m`` describe extra ordinate columns."""

    geom_type: str = "Geometry"
    #: topological dimension: 0 points, 1 curves, 2 surfaces
    dimension: int = -1

    has_z: bool = False
    has_m: bool = False

    def __init__(self):
        self._bounds = None

    # -- shared surface --------------------------------------------------
    @property
    def is_empty(self) -> bool:
        raise NotImplementedError

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        """(xmin, ymin, xmax, ymax); NaNs when empty."""
        if self._bounds is None:
            self._bounds = self._compute_bounds()
        return self._bounds

    def _compute_bounds(self):
        raise NotImplementedError

    @property
    def ndim(self) -> int:
        return 2 + (1 if self.has_z else 0) + (1 if self.has_m else 0)

    def geometries(self) -> list[Geometry]:
        """Component geometries (self for atomic types)."""
        return [self]

    def __repr__(self):  # pragma: no cover - debug aid
        from geomesa_hive_spark.geom.wkt import to_wkt

        try:
            return f"<{to_wkt(self, rounding_precision=6)}>"
        except Exception:
            return f"<{self.geom_type}>"

    def __eq__(self, other):
        """Exact structural equality (same type, same coordinates).

        Topological equality is ``algorithms.equals``.
        """
        if type(self) is not type(other):
            return NotImplemented
        from geomesa_hive_spark.geom.wkb import to_wkb

        return to_wkb(self) == to_wkb(other)

    def __hash__(self):
        from geomesa_hive_spark.geom.wkb import to_wkb

        return hash(to_wkb(self))


class Point(Geometry):
    geom_type = "Point"
    dimension = 0

    __slots__ = ("coords", "has_z", "has_m", "_bounds")

    def __init__(self, coords=None, has_z=False, has_m=False):
        super().__init__()
        if coords is None:
            self.coords = np.empty((0, 2), dtype=np.float64)
        else:
            self.coords = _as_coords(coords)
        self.has_z = has_z or (self.coords.shape[1] == 3 and not has_m)
        self.has_m = has_m
        if self.coords.shape[0] > 1:
            raise ValueError("Point holds at most one coordinate")

    @property
    def is_empty(self):
        return self.coords.shape[0] == 0 or bool(np.isnan(self.coords[0, :2]).all())

    @property
    def x(self) -> float:
        return float(self.coords[0, 0])

    @property
    def y(self) -> float:
        return float(self.coords[0, 1])

    def _compute_bounds(self):
        if self.is_empty:
            return (np.nan, np.nan, np.nan, np.nan)
        x, y = self.coords[0, 0], self.coords[0, 1]
        return (x, y, x, y)


class LineString(Geometry):
    geom_type = "LineString"
    dimension = 1

    __slots__ = ("coords", "has_z", "has_m", "_bounds")

    def __init__(self, coords=None, has_z=False, has_m=False):
        super().__init__()
        self.coords = _as_coords(coords if coords is not None else [])
        if self.coords.shape[0] == 1:
            raise ValueError("LineString needs 0 or >=2 points")
        self.has_z = has_z or (self.coords.shape[1] == 3 and not has_m)
        self.has_m = has_m

    @property
    def is_empty(self):
        return self.coords.shape[0] == 0

    @property
    def is_closed(self) -> bool:
        c = self.coords
        return c.shape[0] >= 2 and bool(np.all(c[0, :2] == c[-1, :2]))

    @property
    def is_ring(self) -> bool:
        from geomesa_hive_spark.geom.algorithms import is_simple

        return self.is_closed and is_simple(self)

    def _compute_bounds(self):
        if self.is_empty:
            return (np.nan, np.nan, np.nan, np.nan)
        xy = self.coords[:, :2]
        mn = xy.min(axis=0)
        mx = xy.max(axis=0)
        return (mn[0], mn[1], mx[0], mx[1])


class Polygon(Geometry):
    """Shell + holes, each an ``(n, ndim)`` closed coordinate array."""

    geom_type = "Polygon"
    dimension = 2

    __slots__ = ("shell", "holes", "has_z", "has_m", "_bounds")

    def __init__(self, shell=None, holes=None, has_z=False, has_m=False):
        super().__init__()
        self.shell = _as_coords(shell if shell is not None else [])
        self.holes = [_as_coords(h) for h in (holes or [])]
        width = self.shell.shape[1] if self.shell.size else 2
        self.has_z = has_z or (width == 3 and not has_m)
        self.has_m = has_m

    @property
    def is_empty(self):
        return self.shell.shape[0] == 0

    @property
    def rings(self) -> list[np.ndarray]:
        return ([] if self.is_empty else [self.shell]) + self.holes

    def _compute_bounds(self):
        if self.is_empty:
            return (np.nan, np.nan, np.nan, np.nan)
        xy = self.shell[:, :2]
        mn = xy.min(axis=0)
        mx = xy.max(axis=0)
        return (mn[0], mn[1], mx[0], mx[1])


class _Multi(Geometry):
    __slots__ = ("geoms", "has_z", "has_m", "_bounds")

    part_type: type = Geometry

    def __init__(self, geoms=None, has_z=False, has_m=False):
        super().__init__()
        self.geoms: list[Geometry] = list(geoms or [])
        for g in self.geoms:
            if self.part_type is not Geometry and not isinstance(g, self.part_type):
                raise ValueError(
                    f"{self.geom_type} parts must be {self.part_type.__name__}, got {g.geom_type}"
                )
        self.has_z = has_z or any(g.has_z for g in self.geoms)
        self.has_m = has_m or any(g.has_m for g in self.geoms)

    @property
    def is_empty(self):
        return all(g.is_empty for g in self.geoms)

    def geometries(self):
        return list(self.geoms)

    def _compute_bounds(self):
        parts = [g.bounds for g in self.geoms if not g.is_empty]
        if not parts:
            return (np.nan, np.nan, np.nan, np.nan)
        a = np.asarray(parts)
        return (a[:, 0].min(), a[:, 1].min(), a[:, 2].max(), a[:, 3].max())


class MultiPoint(_Multi):
    geom_type = "MultiPoint"
    dimension = 0
    part_type = Point


class MultiLineString(_Multi):
    geom_type = "MultiLineString"
    dimension = 1
    part_type = LineString


class MultiPolygon(_Multi):
    geom_type = "MultiPolygon"
    dimension = 2
    part_type = Polygon


class GeometryCollection(_Multi):
    geom_type = "GeometryCollection"
    part_type = Geometry

    @property
    def dimension(self):  # type: ignore[override]
        return max((g.dimension for g in self.geoms if not g.is_empty), default=-1)


COLLECTION_TYPES = frozenset(
    {"MultiPoint", "MultiLineString", "MultiPolygon", "GeometryCollection"}
)
