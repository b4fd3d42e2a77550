"""geomesa_hive_spark — a PySpark-native spatial analytics engine.

A from-scratch reimplementation of the capabilities of azavea/hiveless
("geomesa-hive": Hive ``ST_*`` UDFs + GeoMesa spatial helpers + bbox
filter-pushdown Catalyst rules), re-expressed Spark-first:

- geometry = WKB bytes in a ``BinaryType`` column (reference: TWKB bytes,
  ``spatial/src/main/scala/com/azavea/hiveless/spatial/package.scala:35-38``)
- extent  = ``struct<xmin,ymin,xmax,ymax:double>`` (reference:
  ``spatial-index/.../StandardEncoders.scala:28-31``)
- all ``ST_*`` scalar names from the reference's
  ``spatial/sql/createUDFs.sql`` registered via ``register_all(spark)``
- bbox filter pushdown implemented at the API layer (Python cannot inject
  Catalyst rules), mirroring the observable behavior of the reference's
  ``SpatialFilterPushdownRules``
- beyond-reference large-scale pipeline operators (dedup, similarity
  search, text analysis, multimodal) under ``pipeline/``
- spatial-aware readers/writers under ``sources/`` and a Structured
  Streaming extension (watermarked rollups, session windows, custom
  stateful operators) under ``streaming/``.

The geometry kernel is pure Python/NumPy (this environment has no
shapely/pyproj/JTS); points and extents take fully vectorized NumPy fast
paths, general geometries fall back to per-row computation inside
Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"


def register_all(spark):
    """Register every ST_* SQL function on the session (lazy import so the
    geometry kernel is importable without pyspark)."""
    from geomesa_hive_spark.functions.registry import register_all as _impl

    return _impl(spark)


__all__ = ["register_all", "__version__"]
