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


# ---------------------------------------------------------------------------
# GeoParquet 1.1 — the OGC-standard interchange format for geometry-in-parquet
# ---------------------------------------------------------------------------
# What the spec requires (github.com/opengeospatial/geoparquet, v1.1.0):
# each file carries a JSON document under the footer metadata key "geo"
# naming a primary geometry column, its encoding (WKB here — the repo's
# native geometry representation), the file-level bbox, and (1.1) an
# optional "covering" declaration pointing at a per-row bbox struct column
# that readers may use for predicate pushdown. Files written here open in
# GeoPandas/GDAL/DuckDB-spatial unchanged, and their parquet is plain
# enough that Spark's reader scans it natively (Spark ignores unknown
# footer keys) — interop in both directions.
#
# Why the writer is executor-side pyarrow instead of df.write.parquet:
# Spark cannot attach custom footer metadata, and rewriting footers after
# the fact would double the I/O. Each task writes its own partition with
# pyarrow (the same executor-side Arrow-write pattern as the morlake sink,
# sources/datasource.py), computing that FILE's bbox as it goes — so the
# per-file "geo" metadata is exact, the write stays one distributed pass,
# and nothing row-sized ever reaches the driver (the collected summaries
# are one row per FILE). Z2 clustering before the write is what makes the
# per-file bboxes tight — same argument as write_spatially_partitioned.

_GEO_KEY = b"geo"


def write_geoparquet(
    df: DataFrame,
    path: str,
    geom_col: str = "geom",
    crs: dict | str | None = None,
    geometry_types: list[str] | None = None,
    n_files: int = 16,
    zoom: int = 6,
    version: str = "1.1.0",
) -> list[dict]:
    """Write ``df`` (with a WKB binary ``geom_col``) as GeoParquet 1.1:
    Z2-clustered files, each with spec-compliant ``geo`` footer metadata
    (primary column, WKB encoding, exact per-file bbox, bbox covering
    declaration) plus a per-row ``bbox`` struct column for stats/row-group
    pushdown. Returns one summary dict per written file
    ``{file, n_rows, xmin, ymin, xmax, ymax}``.

    ``crs`` is embedded verbatim (PROJJSON per spec; omitted = spec
    default OGC:CRS84, which matches the repo's lon/lat convention)."""
    import json as _json
    import os as _os

    from geomesa_hive_spark.functions.registry import register_all
    from geomesa_hive_spark.operators.partitioning import add_z2_columns

    spark = df.sparkSession
    register_all(spark)
    if geom_col not in df.columns:
        raise ValueError(f"geometry column {geom_col!r} not in DataFrame")
    if "bbox" in df.columns:
        # refuse, don't silently replace: the writer emits its own
        # per-row covering struct under the spec's conventional name,
        # and quietly dropping a user column of that name is data loss
        # on round-trip (ADVICE r7)
        raise ValueError(
            "input already has a 'bbox' column; rename it — "
            "write_geoparquet emits the GeoParquet covering struct "
            "under that name"
        )
    data_cols = list(df.columns)
    enriched = add_z2_columns(df.select(*data_cols), geom_col, zoom=zoom)
    clustered = (
        enriched.repartitionByRange(int(n_files), "z2")
        .sortWithinPartitions("z2")
        .drop("z2")
        .select(
            *data_cols,
            F.col("bbox.xmin").alias("__bx0"),
            F.col("bbox.ymin").alias("__by0"),
            F.col("bbox.xmax").alias("__bx1"),
            F.col("bbox.ymax").alias("__by1"),
        )
    )
    gtypes = list(geometry_types) if geometry_types else []
    crs_val = crs

    def _write_part(it):
        import uuid

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        chunks = [pdf for pdf in it if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        fx0, fy0 = float(pdf["__bx0"].min()), float(pdf["__by0"].min())
        fx1, fy1 = float(pdf["__bx1"].max()), float(pdf["__by1"].max())
        tbl = pa.Table.from_pandas(pdf[data_cols], preserve_index=False)
        bbox_struct = pa.StructArray.from_arrays(
            [
                pa.array(pdf["__bx0"], type=pa.float64()),
                pa.array(pdf["__by0"], type=pa.float64()),
                pa.array(pdf["__bx1"], type=pa.float64()),
                pa.array(pdf["__by1"], type=pa.float64()),
            ],
            names=["xmin", "ymin", "xmax", "ymax"],
        )
        tbl = tbl.append_column("bbox", bbox_struct)
        import math

        col_meta = {
            "encoding": "WKB",
            "geometry_types": gtypes,
            # a file of only NULL/empty geometries has no extent — omit
            # bbox (it's optional per spec) rather than emit NaN, which
            # is not valid JSON
            **({"bbox": [fx0, fy0, fx1, fy1]}
               if not any(math.isnan(v) for v in (fx0, fy0, fx1, fy1))
               else {}),
            "covering": {
                "bbox": {
                    "xmin": ["bbox", "xmin"],
                    "ymin": ["bbox", "ymin"],
                    "xmax": ["bbox", "xmax"],
                    "ymax": ["bbox", "ymax"],
                }
            },
        }
        if crs_val is not None:
            col_meta["crs"] = crs_val
        geo = {
            "version": version,
            "primary_column": geom_col,
            "columns": {geom_col: col_meta},
        }
        meta = dict(tbl.schema.metadata or {})
        meta[_GEO_KEY] = _json.dumps(geo).encode()
        tbl = tbl.replace_schema_metadata(meta)
        _os.makedirs(path, exist_ok=True)
        fname = _os.path.join(path, f"part-{uuid.uuid4().hex}.parquet")
        pq.write_table(tbl, fname)
        yield pd.DataFrame(
            [
                {
                    "file": fname,
                    "n_rows": len(pdf),
                    "xmin": fx0,
                    "ymin": fy0,
                    "xmax": fx1,
                    "ymax": fy1,
                }
            ]
        )

    summaries = clustered.mapInPandas(
        _write_part,
        schema="file string, n_rows long, xmin double, ymin double, "
               "xmax double, ymax double",
    ).collect()
    return sorted((r.asDict() for r in summaries), key=lambda d: d["file"])


def geoparquet_meta(path: str) -> dict:
    """The parsed ``geo`` footer metadata from one file under ``path``
    (file-level bbox differs per file; the schema-level fields —
    primary column, encoding, covering — are uniform by construction)."""
    import json as _json
    import os as _os

    import pyarrow.parquet as pq

    target = path
    if _os.path.isdir(path):
        cand = sorted(
            f for f in _os.listdir(path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        if not cand:
            raise ValueError(f"no parquet files under {path}")
        target = _os.path.join(path, cand[0])
    meta = pq.read_schema(target).metadata or {}
    if _GEO_KEY not in meta:
        raise ValueError(f"{target} has no 'geo' footer metadata (not GeoParquet)")
    return _json.loads(meta[_GEO_KEY])


def read_geoparquet(
    spark: SparkSession,
    path: str,
    bbox: tuple[float, float, float, float] | None = None,
    exact: bool = True,
    prune_files: bool = False,
    prune_report: dict | None = None,
) -> DataFrame:
    """Read GeoParquet: Spark's native parquet scan (unknown footer keys
    are ignored, WKB binary comes back as BinaryType — directly usable
    by every ST_* function). With ``bbox``, the spec's declared covering
    column drives a NATIVE min/max window conjunction first (pushed to
    parquet row-group stats — the same coarse-then-exact shape as
    :func:`read_spatial_parquet`), then the exact ``st_intersects`` on
    survivors when ``exact``.

    ``prune_files=True`` additionally cuts the FILE LIST on the
    per-file ``geo`` bbox before Spark plans — the coarse cut that
    works on EXTERNAL GeoParquet 1.0 files, which carry the file bbox
    but no covering column (GDAL's read strategy). Opt-in because it
    costs one driver-side footer read per file (~1 ms each): right for
    up to ~10⁴ files; past that, store a manifest (the
    ``sources/manifest.py`` argument). Files lacking a bbox are kept —
    a superset cut, never wrong. ``prune_report`` (filled in place)
    records files_kept/files_total."""
    import json as _json
    import os as _os

    meta = geoparquet_meta(path)
    gcol = meta["primary_column"]
    if bbox is not None and prune_files and _os.path.isdir(path):
        import pyarrow.parquet as pq

        wx0, wy0, wx1, wy1 = bbox
        files = sorted(
            _os.path.join(path, f) for f in _os.listdir(path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        keep = []
        for f in files:
            md = pq.read_schema(f).metadata or {}
            fb = None
            if _GEO_KEY in md:
                g = _json.loads(md[_GEO_KEY])
                fb = g["columns"].get(g["primary_column"], {}).get("bbox")
            if fb is None or not (
                fb[2] < wx0 or fb[0] > wx1 or fb[3] < wy0 or fb[1] > wy1
            ):
                keep.append(f)
        if prune_report is not None:
            prune_report.update(files_kept=len(keep), files_total=len(files))
        if not keep:
            return spark.read.parquet(path).filter(F.lit(False))
        df = spark.read.parquet(*keep)
    else:
        df = spark.read.parquet(path)
    if bbox is None:
        return df
    xmin, ymin, xmax, ymax = bbox
    covering = meta["columns"][gcol].get("covering", {}).get("bbox")
    if covering:
        bx0, by0 = ".".join(covering["xmin"]), ".".join(covering["ymin"])
        bx1, by1 = ".".join(covering["xmax"]), ".".join(covering["ymax"])
        df = df.filter(
            (F.col(bx0) <= F.lit(xmax)) & (F.col(bx1) >= F.lit(xmin))
            & (F.col(by0) <= F.lit(ymax)) & (F.col(by1) >= F.lit(ymin))
        )
    if exact:
        window_wkt = (
            f"POLYGON (({xmin} {ymin}, {xmax} {ymin}, {xmax} {ymax}, "
            f"{xmin} {ymax}, {xmin} {ymin}))"
        )
        df = df.filter(
            ST.st_intersects(F.col(gcol), ST.st_geomfromwkt(F.lit(window_wkt)))
        )
    return df
