"""End-to-end integration: the full spatial-lake workflow in one test —
Z2-clustered write → pushed windowed read → grid spatial join → tile
rollup. Each stage is unit-tested elsewhere; this guards the seams."""

from pyspark.sql import functions as F

from geomesa_hive_spark.operators.partitioning import write_spatially_partitioned
from geomesa_hive_spark.operators.pushdown import intersects_pushdown
from geomesa_hive_spark.operators.spatial_join import spatial_join
from geomesa_hive_spark.geom import from_wkt, to_wkb


def test_lake_workflow(spark, tmp_path):
    # 1. land 2k points as a Z2-clustered layout
    base = spark.range(2000).select(
        F.col("id"),
        ((F.col("id") * 7) % 360 - 180).cast("double").alias("lon"),
        ((F.col("id") * 13) % 180 - 90).cast("double").alias("lat"),
    ).withColumn("geom", F.call_function("st_makepoint", "lon", "lat"))
    path = str(tmp_path / "lake")
    write_spatially_partitioned(base, path, "geom", zoom=6, num_files=8)
    stored = spark.read.parquet(path)
    assert stored.count() == 2000

    # 2. windowed read with pushdown (plan must push bbox stats filters)
    win = (-60.5, -30.5, 59.5, 29.5)
    view = intersects_pushdown(stored, win, geom_col="geom", bbox_col="bbox", exact=True)
    plan = view._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "xmin" in plan
    n_win = view.count()
    brute = stored.filter(
        (F.col("lon") >= win[0]) & (F.col("lon") <= win[2])
        & (F.col("lat") >= win[1]) & (F.col("lat") <= win[3])
    ).count()
    assert n_win == brute > 0

    # 3. join window survivors to coverage zones
    zones = spark.createDataFrame(
        [(0, bytearray(to_wkb(from_wkt("POLYGON ((-60 -30, 0 -30, 0 30, -60 30, -60 -30))")))),
         (1, bytearray(to_wkb(from_wkt("POLYGON ((0 -30, 60 -30, 60 30, 0 30, 0 -30))"))))],
        "zone INT, zgeom BINARY")
    hits = spatial_join(view, zones, predicate="intersects",
                        left_geom="geom", right_geom="zgeom",
                        left_bbox="bbox", cell_size=30.0)

    # 4. rollup per zone + per Z2 partition key
    roll = hits.groupBy("zone", "z2").agg(F.count("*").alias("cnt"))
    per_zone = {r.zone: r.n for r in
                hits.groupBy("zone").agg(F.count("*").alias("n")).collect()}
    assert set(per_zone) == {0, 1}
    assert sum(per_zone.values()) == roll.agg(F.sum("cnt")).collect()[0][0]
