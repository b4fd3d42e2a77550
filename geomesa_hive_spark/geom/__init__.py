"""Pure Python/NumPy geometry kernel (no shapely/JTS available here).

Semantics follow OGC Simple Features as implemented by JTS 1.18 — the
engine the reference delegates to via GeoMesa (`SURVEY.md §2.2`).
"""

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
from geomesa_hive_spark.geom.wkb import from_wkb, to_wkb
from geomesa_hive_spark.geom.wkt import from_wkt, to_wkt

__all__ = [
    "Geometry",
    "Point",
    "LineString",
    "Polygon",
    "MultiPoint",
    "MultiLineString",
    "MultiPolygon",
    "GeometryCollection",
    "from_wkb",
    "to_wkb",
    "from_wkt",
    "to_wkt",
]
