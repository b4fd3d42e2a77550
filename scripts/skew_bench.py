"""Skew evidence for the PBSM grid spatial join (claim: skewed cells are
handled by AQE skew-join splitting, since the candidate stage is a plain
shuffled hash join — operators/spatial_join.py module docstring).

Builds a deliberately skewed workload: ``HOT_FRAC`` of all left points
land in ONE grid cell (a "city"), and half the right boxes overlap that
cell, so one shuffle partition carries a quadratic candidate hotspot.
Runs the identical join twice — AQE skew splitting ON vs OFF — and
reports wall time and the max-task-time share of the candidate stage.
AQE thresholds are lowered so splitting triggers at bench scale (the
defaults are sized for 256 MB partitions).

Writes nothing outside /tmp. Usage: python scripts/skew_bench.py [n_left]
"""
from __future__ import annotations

import sys
import time

ROOT = "/root/repo"
sys.path.insert(0, ROOT)

HOT_FRAC = 0.5
CELL = 0.25


def build(spark, n_left: int, n_right: int):
    from pyspark.sql import functions as F

    from geomesa_hive_spark.functions import api as ST

    # left: HOT_FRAC of points inside the single hot cell [0, 0.2]^2,
    # the rest spread over the globe (keys decorrelated via primes)
    left = spark.range(n_left).select(
        F.col("id").alias("lid"),
        F.when(
            F.col("id") % 100 < int(HOT_FRAC * 100),
            ((F.col("id") * 7919) % 2000) / 10000.0,
        )
        .otherwise(((F.col("id") * 104729) % 3_400_000) / 10000.0 - 170.0)
        .alias("x"),
        F.when(
            F.col("id") % 100 < int(HOT_FRAC * 100),
            ((F.col("id") * 6151) % 2000) / 10000.0,
        )
        .otherwise(((F.col("id") * 95479) % 1_600_000) / 10000.0 - 80.0)
        .alias("y"),
    )
    left = left.withColumn(
        "geom", F.call_function("st_makepoint", F.col("x"), F.col("y"))
    ).select("lid", "geom")

    # right: small boxes, 1% centered in the hot cell — the hotspot is
    # hot_points × hot_boxes, so this keeps the skewed partition ~50×
    # the median rather than unboundedly quadratic
    right = spark.range(n_right).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 100 == 0, ((F.col("id") * 31) % 2000) / 10000.0)
        .otherwise(((F.col("id") * 104729) % 3_400_000) / 10000.0 - 170.0)
        .alias("cx"),
        F.when(F.col("id") % 100 == 0, ((F.col("id") * 57) % 2000) / 10000.0)
        .otherwise(((F.col("id") * 95479) % 1_600_000) / 10000.0 - 80.0)
        .alias("cy"),
    )
    right = (
        right.withColumn("bbox", ST.make_extent(
            F.col("cx") - 0.05, F.col("cy") - 0.05,
            F.col("cx") + 0.05, F.col("cy") + 0.05))
        .withColumn(
            "pgeom",
            F.call_function(
                "st_makebbox",
                F.col("cx") - 0.05, F.col("cy") - 0.05,
                F.col("cx") + 0.05, F.col("cy") + 0.05,
            ),
        )
        .select("rid", "pgeom", "bbox")
    )
    return left, right


def run_once(spark, n_left: int, n_right: int, skew_on: bool):
    from geomesa_hive_spark.operators.spatial_join import spatial_join

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
    left, right = build(spark, n_left, n_right)
    t0 = time.time()
    out = spatial_join(
        left, right, left_geom="geom", right_geom="pgeom",
        right_bbox="bbox", predicate="intersects", cell_size=CELL,
    )
    cnt = out.count()
    return time.time() - t0, cnt


def main() -> int:
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_right = max(10_000, n_left // 100)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from geomesa_hive_spark import register_all

    register_all(spark)

    # warm up the worker pool so the comparison isn't polluted by
    # first-UDF-call worker spawn cost
    run_once(spark, 50_000, 5_000, True)

    t_off, c_off = run_once(spark, n_left, n_right, skew_on=False)
    t_on, c_on = run_once(spark, n_left, n_right, skew_on=True)
    assert c_on == c_off, f"result mismatch: {c_on} vs {c_off}"
    print(
        f'{{"n_left": {n_left}, "n_right": {n_right}, "hot_frac": {HOT_FRAC}, '
        f'"pairs": {c_on}, "skew_off_sec": {t_off:.2f}, "skew_on_sec": {t_on:.2f}, '
        f'"speedup": {t_off / t_on:.2f}}}'
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
