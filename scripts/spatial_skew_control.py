"""Hot-cell skew evidence for the PBSM grid spatial join.

The real-world skew case for a fixed-grid spatial join is a CITY: every
geometry of a clustered dataset lands in ~one grid cell, so the cell
equi-join's whole candidate stream (|L_cell| x |R_cell| bbox probes)
lands on the ONE reducer owning that key — the straggler that caps a
1000-executor cluster at single-task speed. Claim under test
(operators/spatial_join.py::spatial_join, round-13 VERDICT watch item
3): AQE's skew-join split detects skew by input partition BYTES and can
split the probe-side partition when thresholds trip, but the
candidate blow-up is in the join OUTPUT (the lsh/entity finding), so
the structural fix is the round-14 ``salt`` knob — each left row's
cell key gains a deterministic shard, the right side replicates xsalt,
and one hot cell fans across ``salt`` reducers by construction with
salt-invariant output.

Workload: n points uniform inside ONE 1-degree cell (the city) x m
small boxes in the same cell — candidate stream n*m from one key —
plus a uniform control (same n points spread over a 10x10 cell grid,
same m boxes spread likewise). Runs the identical spatial_join four
ways, reports wall time + pair counts:

  clustered_aqe     — salt=1, AQE skew-join ON (thresholds lowered so
                      input-based splitting triggers if it ever could)
  clustered_no_skew — salt=1, skew splitting OFF (control: AQE delta)
  clustered_salted  — salt=8, skew splitting ON
  uniform           — salt=1 (the layout the grid join was built for)

Writes SPATIAL_SKEW_CONTROL.json at the repo root. Nothing outside
/tmp and the artifact. Usage: python scripts/spatial_skew_control.py [n]
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = "/root/repo"
sys.path.insert(0, ROOT)

M_BOXES = 200


def build(spark, n: int, clustered: bool):
    """(points, boxes): points get deterministic id-derived positions;
    clustered=True packs everything into cell [0,1)x[0,1), else spreads
    the same density over a 10x10 cell grid."""
    from pyspark.sql import functions as F

    u = ((F.col("id") * 7919) % 100000).cast("double") / 100000.0
    v = ((F.col("id") * 104729) % 100000).cast("double") / 100000.0
    if clustered:
        px, py = u, v
    else:
        cellx = ((F.col("id") * 31) % 10).cast("double")
        celly = ((F.col("id") * 37) % 10).cast("double")
        px, py = cellx + u, celly + v
    pts = spark.range(n).select(
        F.col("id").alias("pid"),
        F.call_function("st_makepoint", px, py).alias("geom"),
    )
    bu = ((F.col("id") * 613) % 1000).cast("double") / 1000.0 * 0.96
    bv = ((F.col("id") * 389) % 1000).cast("double") / 1000.0 * 0.96
    if clustered:
        bx, by = bu, bv
    else:
        bx = ((F.col("id") * 11) % 10).cast("double") + bu
        by = ((F.col("id") * 13) % 10).cast("double") + bv
    boxes = spark.range(M_BOXES).select(
        F.col("id").alias("bid"),
        F.call_function(
            "st_extenttogeom",
            F.call_function("st_makeextent", bx, by,
                            bx + F.lit(0.02), by + F.lit(0.02)),
        ).alias("bgeom"),
    )
    return pts, boxes


def run_once(spark, pts, boxes, salt: int, skew_on: bool) -> dict:
    from geomesa_hive_spark.operators.spatial_join import spatial_join

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
                   str(skew_on).lower())
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # SMJ, as at scale

    t0 = time.time()
    out = spatial_join(
        pts, boxes, predicate="intersects",
        left_geom="geom", right_geom="bgeom", cell_size=1.0, salt=salt,
    )
    n_pairs = out.count()
    wall = round(time.time() - t0, 2)
    spark.catalog.clearCache()
    return {"pairs": n_pairs, "wall_s": wall}


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("spatial-skew-control")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from geomesa_hive_spark import register_all

    register_all(spark)
    cp, cb = build(spark, n, clustered=True)
    up, ub = build(spark, n, clustered=False)
    for d in (cp, cb, up, ub):
        d.cache().count()

    run_once(spark, up, ub, 1, True)   # untimed warmup

    runs = {"n_points": n, "m_boxes": M_BOXES}
    for name, (p, b), salt, skew in [
        ("clustered_aqe", (cp, cb), 1, True),
        ("clustered_no_skew", (cp, cb), 1, False),
        ("clustered_salted", (cp, cb), 8, True),
        ("uniform", (up, ub), 1, True),
    ]:
        runs[name] = run_once(spark, p, b, salt, skew)
        print(f"# {name}: {runs[name]}", file=sys.stderr)
    runs["pairs_identical_clustered"] = (
        runs["clustered_aqe"]["pairs"]
        == runs["clustered_no_skew"]["pairs"]
        == runs["clustered_salted"]["pairs"]
    )
    art = {
        "metric": "hot-cell PBSM join skew control: AQE skew-split vs "
                  "round-14 cell salting",
        "workload": f"spatial_join intersects, {n} points x {M_BOXES} "
                    "boxes all in ONE 1-deg cell (candidate stream n*m "
                    "from one key) vs the same density uniform over "
                    "10x10 cells; local[32], warm, broadcast disabled "
                    "(SMJ as at scale)",
        "script": "scripts/spatial_skew_control.py",
        "recorded": os.environ.get("SKEW_RECORDED", "round 14"),
        "runs": [runs],
    }
    with open(os.path.join(ROOT, "SPATIAL_SKEW_CONTROL.json"), "w") as fh:
        json.dump(art, fh, indent=1)
    print(json.dumps(runs))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
