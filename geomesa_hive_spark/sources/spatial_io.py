"""CSV/GeoJSON/Parquet sources and sinks with geometry columns.

Reference parity (all file:line in /root/reference):

- CSV with header + WKT column, geometry derived in a view:
  ``spatial/src/test/scala/com/azavea/hiveless/SpatialTestTables.scala:27-47``.
- Parquet scan whose bbox struct participates in row-group pruning:
  ``spatial-index/src/test/scala/com/azavea/hiveless/spatial/index/STIndexSpec.scala:47-83``.
- Parquet CTAS sink: ``SpatialTestTables.scala:50-59``.

Scale notes: the readers keep the window predicate as native struct
comparisons (pushed to Parquet min/max stats — ``PushedFilters`` in the
plan) and apply the exact geometry predicate only to the surviving rows;
the writer clusters along the Z2 curve so those statistics are tight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geomesa_hive_spark.functions import api as ST
from geomesa_hive_spark.operators.partitioning import write_spatially_partitioned

__all__ = [
    "read_csv_wkt",
    "read_geojson_lines",
    "read_spatial_parquet",
    "write_spatial_parquet",
]


def read_csv_wkt(
    spark: SparkSession,
    path: str,
    wkt_col: str = "wkt",
    geom_col: str = "geom",
    bbox_col: str | None = "bbox",
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV scan + derived binary geometry (and optional bbox extent).

    Mirrors the reference's view pattern: the raw column stays, ``geom``
    is WKB bytes parsed from WKT, ``bbox`` is the prunable extent struct.
    """
    df = spark.read.option("header", str(header).lower()).options(**options).csv(path)
    out = df.withColumn(geom_col, ST.st_geomfromwkt(F.col(wkt_col)))
    if bbox_col:
        out = out.withColumn(bbox_col, ST.st_extentfromgeom(F.col(geom_col)))
    return out


def read_geojson_lines(
    spark: SparkSession,
    path: str,
    geom_col: str = "geom",
    bbox_col: str | None = "bbox",
) -> DataFrame:
    """Newline-delimited GeoJSON geometries/features → (raw json, geom, bbox).

    The geometry parse itself is the registered ``st_geomFromGeoJson``
    pandas UDF (vectorized shapely ``from_geojson``); property extraction
    is left to ``F.get_json_object`` on the raw column so it stays native.
    """
    df = spark.read.text(path).withColumnRenamed("value", "json")
    out = df.withColumn(geom_col, ST.st_geomfromgeojson(F.col("json")))
    if bbox_col:
        out = out.withColumn(bbox_col, ST.st_extentfromgeom(F.col(geom_col)))
    return out


def read_spatial_parquet(
    spark: SparkSession,
    path: str,
    bbox: tuple[float, float, float, float] | None = None,
    bbox_col: str = "bbox",
    geom_col: str | None = "geom",
    exact: bool = True,
) -> DataFrame:
    """Parquet scan with an optional spatial window.

    When ``bbox`` is given, emits the tight native bbox conjunction on the
    extent struct first (pushed to Parquet row-group stats — the observable
    behavior of the reference's STIntersectsRule, SURVEY.md §4.1), then the
    exact ``st_intersects`` UDF on the survivors when ``exact`` and a
    geometry column exists. This is exactly the coarse-then-exact filter
    shape that keeps a 100 TB window query from touching cold row groups.
    """
    df = spark.read.parquet(path)
    if bbox is None:
        return df
    xmin, ymin, xmax, ymax = bbox
    cols = set(df.columns)
    if bbox_col in cols:
        df = df.filter(ST.extent_intersects_bounds(bbox_col, xmin, ymin, xmax, ymax))
    if exact and geom_col and geom_col in cols:
        window_wkt = (
            f"POLYGON (({xmin} {ymin}, {xmax} {ymin}, {xmax} {ymax}, "
            f"{xmin} {ymax}, {xmin} {ymin}))"
        )
        df = df.filter(
            ST.st_intersects(F.col(geom_col), ST.st_geomfromwkt(F.lit(window_wkt)))
        )
    return df


def write_spatial_parquet(
    df: DataFrame,
    path: str,
    geom_col: str = "geom",
    zoom: int = 6,
    mode: str = "overwrite",
    partition_dirs: bool = False,
) -> None:
    """Z2-clustered Parquet sink (delegates to the partitioning operator)."""
    write_spatially_partitioned(
        df, path, geom_col, zoom=zoom, mode=mode, partition_dirs=partition_dirs
    )
