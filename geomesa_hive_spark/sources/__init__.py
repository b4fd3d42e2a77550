"""Spatial-aware readers and writers.

The reference's only sources are CSV (header inference) and Parquet, with
geometry derived in views (``SpatialTestTables.scala:27-47``:
``geom = ST_GeomFromWKT(wkt)``, ``bbox = ST_ExtentFromGeom(geom)``). These
helpers fold that derivation into the read, and pair the write path with
Z2 clustering so the files carry prunable bbox statistics.
"""

from geomesa_hive_spark.sources.spatial_io import (
    read_csv_wkt,
    read_geojson_lines,
    read_spatial_parquet,
    write_spatial_parquet,
)

__all__ = [
    "read_csv_wkt",
    "read_geojson_lines",
    "read_spatial_parquet",
    "write_spatial_parquet",
]
