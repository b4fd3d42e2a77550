"""DataFrame-API wrappers for the ST_* surface.

Two kinds of wrappers:

- **native** (zero-UDF): functions whose semantics are plain column
  algebra get pure Catalyst expressions — ``st_makeExtent`` is
  ``F.struct`` (reference note: "no UDF needed", SURVEY.md §2.3),
  extent-vs-extent ``st_intersects``/``st_contains`` are min/max
  comparisons (exactly what the reference's rewrite rules emit, §4.1) so
  they participate in predicate pushdown / partition pruning;
- **UDF-backed**: everything geometric dispatches to the registered
  pandas UDF by name via ``F.call_function`` (``register_all(spark)``
  must have run).

Usage::

    from geomesa_hive_spark.functions import api as ST
    df.select(ST.st_makePoint("lon", "lat").alias("geom"))
    df.filter(ST.extent_intersects_extent("bbox", ST.make_extent_lit(-76, 40, -72, 43.2)))
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from geomesa_hive_spark.functions.st import ALIASES, SPEC

__all__ = [
    "make_extent",
    "make_extent_lit",
    "extent_intersects_extent",
    "extent_contains_extent",
    "extent_intersects_bounds",
    "extent_contains_bounds",
]


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


# -- native (pure Catalyst) expressions -------------------------------------


def make_extent(xmin, ymin, xmax, ymax) -> Column:
    """Extent struct from 4 numeric columns — pure ``F.struct``."""
    return F.struct(
        _c(xmin).cast("double").alias("xmin"),
        _c(ymin).cast("double").alias("ymin"),
        _c(xmax).cast("double").alias("xmax"),
        _c(ymax).cast("double").alias("ymax"),
    )


def make_extent_lit(xmin: float, ymin: float, xmax: float, ymax: float) -> Column:
    return F.struct(
        F.lit(float(xmin)).alias("xmin"),
        F.lit(float(ymin)).alias("ymin"),
        F.lit(float(xmax)).alias("xmax"),
        F.lit(float(ymax)).alias("ymax"),
    )


def extent_intersects_bounds(extent, xmin: float, ymin: float, xmax: float, ymax: float) -> Column:
    """Tight bbox-intersects as native comparisons on struct fields —
    pushable to Parquet row-group stats (the observable behavior the
    reference's STIntersectsRule produces, but with the tight test —
    SURVEY.md §4.1 ⚠️)."""
    e = _c(extent)
    return (
        e.isNotNull()
        & (e["xmin"] <= float(xmax))
        & (e["xmax"] >= float(xmin))
        & (e["ymin"] <= float(ymax))
        & (e["ymax"] >= float(ymin))
    )


def extent_contains_bounds(extent, xmin: float, ymin: float, xmax: float, ymax: float) -> Column:
    """extent-column contains the literal bbox? Reference semantics for
    ST_Contains(extentCol, extentLit) are 'extent within literal bbox'
    (STContainsRule.scala:61-71): column ⊆ literal."""
    e = _c(extent)
    return (
        e.isNotNull()
        & (e["xmin"] >= float(xmin))
        & (e["ymin"] >= float(ymin))
        & (e["xmax"] <= float(xmax))
        & (e["ymax"] <= float(ymax))
    )


def extent_intersects_extent(a, b) -> Column:
    ea, eb = _c(a), _c(b)
    return (
        ea.isNotNull()
        & eb.isNotNull()
        & (ea["xmin"] <= eb["xmax"])
        & (ea["xmax"] >= eb["xmin"])
        & (ea["ymin"] <= eb["ymax"])
        & (ea["ymax"] >= eb["ymin"])
    )


def extent_contains_extent(a, b) -> Column:
    ea, eb = _c(a), _c(b)
    return (
        ea.isNotNull()
        & eb.isNotNull()
        & (ea["xmin"] <= eb["xmin"])
        & (ea["ymin"] <= eb["ymin"])
        & (ea["xmax"] >= eb["xmax"])
        & (ea["ymax"] >= eb["ymax"])
    )


# -- UDF-backed wrappers, generated for every registered name ----------------


def _make_wrapper(sql_name: str):
    def wrapper(*cols) -> Column:
        return F.call_function(sql_name, *[_c(c) for c in cols])

    wrapper.__name__ = sql_name
    wrapper.__doc__ = f"Column wrapper for the registered `{sql_name}` UDF."
    return wrapper


_CAMEL = {
    n: n for n in list(SPEC) + list(ALIASES)
}

for _name in _CAMEL:
    globals()[_name] = _make_wrapper(_name)
    __all__.append(_name)

# camelCase conveniences matching the reference's SQL spellings
for _camel in [
    "st_geomFromWKT", "st_makePoint", "st_makePointM", "st_makeLine",
    "st_makePolygon", "st_makeBBOX", "st_makeBox2D", "st_extentFromGeom",
    "st_extentToGeom", "st_makeExtent", "st_geomFromWKB", "st_geomFromGeoJson",
    "st_asText", "st_asBinary", "st_asGeoJson", "st_asGeoHash",
    "st_partitionCentroid", "st_z2LatLon", "st_bufferPoint",
]:
    lower = _camel.lower()
    if lower in _CAMEL:
        globals()[_camel] = globals()[lower]
        __all__.append(_camel)
