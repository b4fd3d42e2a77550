"""spatial_sql: SQL-string pushdown rewrite — correctness vs the raw
UDF predicate, plan shape (no Python eval; filters reach the Parquet
scan), and the analysis-failure fallback."""

import re

import pytest

from pyspark.sql import functions as F

from geomesa_hive_spark.functions import api as ST
from geomesa_hive_spark.functions.registry import register_all
from geomesa_hive_spark.operators.spatial_sql import (
    rewrite_spatial_predicates,
    spatial_sql,
)


def _grid(spark):
    register_all(spark)
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 10).cast("double").alias("x"),
        (F.col("id") / 10).cast("int").cast("double").alias("y"),
    )
    df = df.withColumn("bbox", ST.make_extent("x", "y", "x", "y")).withColumn(
        "geom", F.call_function("st_makepoint", F.col("x"), F.col("y"))
    )
    df.createOrReplaceTempView("sql_grid")
    return df


def test_rewrite_extent_literal_both_orders():
    out = rewrite_spatial_predicates(
        "SELECT * FROM t WHERE st_intersects(bbox, st_makeBBOX(1, 2, 3, 4))"
    )
    assert "st_intersects" not in out.lower()
    assert "bbox.xmin <= 3" in out and "bbox.ymax >= 2" in out
    out2 = rewrite_spatial_predicates(
        "SELECT * FROM t WHERE st_intersects(st_makeExtent(1, 2, 3, 4), bbox)"
    )
    assert "st_intersects" not in out2.lower()


def test_rewrite_contains_within_orientation():
    # st_contains(col, lit): col ⊇ lit → col.xmin <= lit.xmin
    out = rewrite_spatial_predicates(
        "SELECT * FROM t WHERE st_contains(bbox, st_makeBBOX(1, 2, 3, 4))"
    )
    assert "bbox.xmin <= 1" in out and "bbox.xmax >= 3" in out
    # st_contains(lit, col): lit ⊇ col → col ⊆ lit → col.xmin >= lit.xmin
    out2 = rewrite_spatial_predicates(
        "SELECT * FROM t WHERE st_contains(st_makeBBOX(1, 2, 3, 4), bbox)"
    )
    assert "bbox.xmin >= 1" in out2 and "bbox.xmax <= 3" in out2
    out3 = rewrite_spatial_predicates(
        "SELECT * FROM t WHERE st_within(bbox, st_makeBBOX(1, 2, 3, 4))"
    )
    assert "bbox.xmin >= 1" in out3


def test_rewrite_geometry_literal_keeps_original():
    sql = "SELECT * FROM t WHERE st_intersects(bbox, st_geomFromWKT('POLYGON ((0 0, 4 0, 0 4, 0 0))'))"
    out = rewrite_spatial_predicates(sql)
    assert "st_geomfromwkt" in out.lower()      # original retained…
    assert "bbox.xmin <=" in out               # …behind the bbox prefilter


def test_spatial_sql_matches_udf(spark):
    _grid(spark)
    raw = "SELECT id FROM sql_grid WHERE st_intersects(bbox, st_makeBBOX(2.5, 2.5, 5.5, 5.5)) ORDER BY id"
    got = [r.id for r in spatial_sql(spark, raw).collect()]
    want = [r.id for r in spark.sql(raw).collect()]
    assert got == want and len(got) == 9  # x,y in 3..5 × 3..5


def test_spatial_sql_plan_is_native_and_pushed(spark, tmp_path):
    df = _grid(spark)
    path = str(tmp_path / "grid_parquet")
    df.write.mode("overwrite").parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("sql_grid_pq")
    out = spatial_sql(
        spark,
        "SELECT id FROM sql_grid_pq WHERE st_intersects(bbox, st_makeBBOX(2.5, 2.5, 5.5, 5.5))",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan            # no Python hop left
    # plan strings truncate long filter lists, so match within the line
    m = re.search(r"PushedFilters: \[[^\n]*xmin", plan)
    assert m                                   # bbox comparisons reached the scan


def test_spatial_sql_fallback_on_geometry_column(spark):
    _grid(spark)
    # binary geom column has no .xmin field: rewrite fails analysis,
    # original SQL (polymorphic UDF) must run and give the right answer
    raw = "SELECT id FROM sql_grid WHERE st_intersects(geom, st_makeBBOX(2.5, 2.5, 5.5, 5.5)) ORDER BY id"
    got = [r.id for r in spatial_sql(spark, raw).collect()]
    want = [r.id for r in spark.sql(raw).collect()]
    assert got == want and len(got) == 9
