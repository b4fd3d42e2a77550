"""Distributed convex-hull aggregate.

The reference's only UDAF: incremental convex hull of a geometry column
(``spatial/.../ST_ConvexHull.scala:24-38``), distributed through Hive's
partial/merge lifecycle (``HGenericUDAFEvaluator.scala:44-58``:
iterate → terminatePartial → shuffle → merge → terminate).

Spark-first equivalents here:

- :func:`convex_hull_agg` — global hull, two-phase exactly like the
  Hive lifecycle: per-partition partial hulls via ``mapInPandas``
  (map-side combine: each partition reduces to ≤1 tiny hull), then a
  single-group ``applyInPandas`` final reduce ON THE EXECUTORS —
  nothing touches the driver and the result is a composable 1-row
  DataFrame. Shuffle payload = a few dozen points per partition,
  independent of input size.
- :func:`convex_hull_grouped` — hull per group key via
  ``applyInPandas``.
- :func:`register_convex_hull_udaf` — SQL-callable GROUPED_AGG pandas
  UDF ``st_convexhull``. Spark runs GROUPED_AGG UDFs in COMPLETE mode
  only (no partial merge), so the bare registration ships each whole
  group to one task; since round 14 the installed
  ``operators/spatial_sql.py`` wrapper rewrites recognized
  ``st_convexhull`` aggregate queries to the two-phase
  partial-hull-per-input-partition + hull-of-hulls shape in SQL text
  (``rewrite_convexhull_agg``), so the raw-SQL surface reaches the
  same scale plan as :func:`convex_hull_agg`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from geomesa_hive_spark.geom import algorithms as alg
from geomesa_hive_spark.geom.wkb import from_wkb, to_wkb

__all__ = ["convex_hull_agg", "convex_hull_grouped", "register_convex_hull_udaf",
           "register_extent_udaf"]


def _hull_of_wkbs(wkbs) -> bytes | None:
    pts = []
    for b in wkbs:
        if b is None:
            continue
        g = from_wkb(bytes(b))
        c = alg.all_coords(g)
        if len(c):
            pts.append(c)
    if not pts:
        return None
    return to_wkb(alg.convex_hull_of_coords(np.vstack(pts)))


def convex_hull_agg(df: DataFrame, geom_col: str) -> DataFrame:
    """Global convex hull of a geometry column as a 1-row DataFrame with
    column ``hull`` (WKB bytes; all-null/empty input → empty DataFrame).

    Phase 1 (executors): each partition collapses to one partial-hull
    row. Phase 2: the handful of partials reduce in a single-group
    ``applyInPandas`` — still on an executor, so no driver-side compute
    and the result composes with further DataFrame ops (join it, write
    it, pass it on) instead of materializing bytes on the driver.
    """
    schema = T.StructType([T.StructField("partial", T.BinaryType())])

    def partial(iterator):
        acc: list[bytes] = []
        for pdf in iterator:
            h = _hull_of_wkbs(pdf[geom_col])
            if h is not None:
                acc.append(h)
                if len(acc) > 64:
                    acc = [_hull_of_wkbs(acc)]
        if acc:
            yield pd.DataFrame({"partial": [_hull_of_wkbs(acc)]})

    partials = df.select(geom_col).mapInPandas(partial, schema)
    out_schema = T.StructType([T.StructField("hull", T.BinaryType())])

    def final(key, pdf):
        return pd.DataFrame({"hull": [_hull_of_wkbs(pdf["partial"])]})

    return (
        partials.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(final, out_schema)
    )


def convex_hull_grouped(df: DataFrame, geom_col: str, *group_cols: str) -> DataFrame:
    """Per-group convex hull: ``SELECT k, st_convexHull(geom) GROUP BY k``."""
    if not group_cols:
        raise ValueError("use convex_hull_agg for a global hull")
    out_schema = T.StructType(
        [df.schema[c] for c in group_cols] + [T.StructField("hull", T.BinaryType())]
    )

    def per_group(key, pdf):
        row = {c: [k] for c, k in zip(group_cols, key)}
        row["hull"] = [_hull_of_wkbs(pdf[geom_col])]
        return pd.DataFrame(row)

    slim = df.select(*group_cols, geom_col)
    return slim.groupBy(*group_cols).applyInPandas(per_group, out_schema)


def register_convex_hull_udaf(spark: SparkSession) -> None:
    """Register SQL `st_convexhull` (GROUPED_AGG pandas UDF)."""

    @pandas_udf(T.BinaryType())
    def st_convexhull(s: pd.Series) -> bytes:  # Series→scalar hint ⇒ GROUPED_AGG
        return _hull_of_wkbs(s)

    spark.udf.register("st_convexhull", st_convexhull)


def _extent_of_wkbs(wkbs) -> bytes | None:
    """Bbox-union POLYGON of a geometry column slice (the PostGIS
    ST_Extent::geometry shape — GROUPED_AGG cannot return a struct,
    so the aggregate yields the extent polygon's WKB); NULL and empty
    geometries contribute nothing, all-null → None."""
    import math

    xmin = ymin = math.inf
    xmax = ymax = -math.inf
    for b in wkbs:
        if b is None:
            continue
        g = from_wkb(bytes(b))
        c = alg.all_coords(g)
        if not len(c):
            continue
        xmin = min(xmin, float(np.min(c[:, 0])))
        ymin = min(ymin, float(np.min(c[:, 1])))
        xmax = max(xmax, float(np.max(c[:, 0])))
        ymax = max(ymax, float(np.max(c[:, 1])))
    if xmin > xmax:
        return None
    from geomesa_hive_spark.geom.core import Polygon

    ring = [[xmin, ymin], [xmax, ymin], [xmax, ymax],
            [xmin, ymax], [xmin, ymin]]
    return to_wkb(Polygon(ring))


def register_extent_udaf(spark: SparkSession) -> None:
    """Register SQL `st_extent` (round 14 — the PostGIS bbox-union
    aggregate; COMPLETE-mode GROUPED_AGG like st_convexhull). The
    installed spatial_sql wrapper rewrites recognized st_extent
    aggregate queries to a FULLY NATIVE min/max plan
    (rewrite_extent_agg) — this registration is the fallback for
    shapes outside the rewrite envelope, and the semantic anchor both
    paths are hash-compared against."""

    @pandas_udf(T.BinaryType())
    def st_extent(s: pd.Series) -> bytes:  # Series→scalar ⇒ GROUPED_AGG
        return _extent_of_wkbs(s)

    spark.udf.register("st_extent", st_extent)
