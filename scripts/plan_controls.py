"""Plan-level controls for BASELINE.md (§ protocol, items 1-2).

1. Pruning ratio: write the sf0.1 lineitem points as a Z2-clustered
   spatial parquet (the layout ``write_spatially_partitioned`` produces),
   then compare a windowed read with the API-layer bbox pushdown against
   a full-scan exact filter: wall time, and the fraction of parquet row
   groups whose [min,max] bbox stats intersect the window (what the scan
   actually has to read).
2. UDF overhead factor: the exact ``st_intersects`` pandas-UDF filter vs
   the native bbox-conjunction column expression over the same rows.

Writes only under /tmp. Usage: python scripts/plan_controls.py
"""
from __future__ import annotations

import shutil
import sys
import tempfile
import time

ROOT = "/root/repo"
sys.path.insert(0, ROOT)

SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from geomesa_hive_spark import register_all
    from geomesa_hive_spark.functions import api as ST
    from geomesa_hive_spark.operators.partitioning import write_spatially_partitioned
    from geomesa_hive_spark.operators.pushdown import intersects_pushdown

    register_all(spark)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    lon = ((F.col("l_orderkey") * F.lit(7919)) % F.lit(36000)) / 100.0 - 180.0
    lat = ((F.col("l_partkey") * F.lit(4799)) % F.lit(18000)) / 100.0 - 90.0
    pts = (
        li.select("l_orderkey", "l_partkey", "l_quantity")
        .withColumn("lon", lon)
        .withColumn("lat", lat)
        .withColumn("geom", F.call_function("st_makepoint", F.col("lon"), F.col("lat")))
        .withColumn("bbox", ST.make_extent("lon", "lat", "lon", "lat"))
    )

    out = tempfile.mkdtemp(prefix="plan_controls_")
    path = f"{out}/points_z2"
    write_spatially_partitioned(pts, path, zoom=8, geom_col="geom", num_files=64)
    n_total = spark.read.parquet(path).count()

    win = (-50.005, 10.005, -20.005, 40.005)

    # --- control 1: pruning ratio ------------------------------------
    import pyarrow.parquet as pq
    import glob as _glob

    rg_total = rg_hit = 0
    for f in _glob.glob(f"{path}/**/*.parquet", recursive=True):
        md = pq.ParquetFile(f).metadata
        sch = md.schema
        idx = {sch.column(i).path: i for i in range(len(sch))}
        cx, cy = idx["bbox.xmin"], idx["bbox.ymin"]
        for g in range(md.num_row_groups):
            rg_total += 1
            sx = md.row_group(g).column(cx).statistics
            sy = md.row_group(g).column(cy).statistics
            if sx.min <= win[2] and sx.max >= win[0] and sy.min <= win[3] and sy.max >= win[1]:
                rg_hit += 1

    stored = spark.read.parquet(path)

    def timed(df):
        """Median of 3 warm runs (BASELINE.md protocol)."""
        runs = []
        for _ in range(3):
            t0 = time.time()
            n = df.count()
            runs.append(time.time() - t0)
        return round(sorted(runs)[1], 3), n

    # warm the scan + the full python worker pool once
    stored.select(F.call_function("st_astext", "geom")).count()

    pruned = intersects_pushdown(stored, win, geom_col="geom", bbox_col="bbox", exact=True)
    t_pruned, n_win = timed(pruned)
    full = stored.filter(
        F.call_function(
            "st_intersects",
            F.col("geom"),
            F.call_function("st_makebbox", *[F.lit(float(v)) for v in win]),
        )
    )
    t_full, n_full = timed(full)
    assert n_win == n_full, (n_win, n_full)

    # --- control 2: UDF overhead factor ------------------------------
    t_native, n1 = timed(
        stored.filter(
            (F.col("bbox.xmin") <= win[2])
            & (F.col("bbox.xmax") >= win[0])
            & (F.col("bbox.ymin") <= win[3])
            & (F.col("bbox.ymax") >= win[1])
        )
    )
    t_udf, n2 = timed(full)
    assert n1 == n2, (n1, n2)

    # --- control 3: XZ2 extended-geometry layout pruning --------------
    # boxes (not points): the workload the centroid-Z2 key cannot index
    # without false negatives. Write the XZ2-clustered layout, then
    # measure what fraction of row groups the window's code-range
    # BETWEENs allow the scan to SKIP via xz2 min/max stats.
    from geomesa_hive_spark.geom.xz2 import xz2_query_ranges
    from geomesa_hive_spark.operators.xz2 import (
        write_xz2_partitioned,
        xz2_range_predicate,
        xz2_window_filter,
    )

    boxes = (
        li.select("l_orderkey", "l_partkey")
        .withColumn("bxmin", lon)
        .withColumn("bymin", lat)
        .withColumn("bxmax", F.expr("least(bxmin + (l_orderkey % 11), 180.0)"))
        .withColumn("bymax", F.expr("least(bymin + (l_partkey % 7), 90.0)"))
    )
    xz2_path = f"{out}/boxes_xz2"
    write_xz2_partitioned(
        boxes, xz2_path, "bxmin", "bymin", "bxmax", "bymax", num_files=64
    )
    ranges = xz2_query_ranges(*win, max_level=7)
    xrg_total = xrg_hit = 0
    for f in _glob.glob(f"{xz2_path}/**/*.parquet", recursive=True):
        md = pq.ParquetFile(f).metadata
        sch = md.schema
        idx = {sch.column(i).path: i for i in range(len(sch))}
        cz = idx["xz2"]
        for g in range(md.num_row_groups):
            xrg_total += 1
            s = md.row_group(g).column(cz).statistics
            if any(s.min <= hi and s.max >= lo for lo, hi in ranges):
                xrg_hit += 1

    xstored = spark.read.parquet(xz2_path)
    xpred = xz2_range_predicate(win, max_level=7)
    xwin = xz2_window_filter(
        xstored.filter(F.expr(xpred)), win, "bxmin", "bymin", "bxmax", "bymax"
    )
    t_xz2, n_xwin = timed(xwin)
    xfull = xstored.filter(
        (F.col("bxmin") <= win[2]) & (F.col("bxmax") >= win[0])
        & (F.col("bymin") <= win[3]) & (F.col("bymax") >= win[1])
    )
    t_xfull, n_xfull = timed(xfull)
    assert n_xwin == n_xfull, (n_xwin, n_xfull)

    print(
        f"rows={n_total} window_rows={n_win}\n"
        f"row_groups: {rg_hit}/{rg_total} intersect the window "
        f"(pruning ratio {1 - rg_hit / rg_total:.2%} skippable)\n"
        f"windowed read: pushed={t_pruned}s full-scan-exact={t_full}s "
        f"({t_full / t_pruned:.1f}x)\n"
        f"filter only: native-bbox={t_native}s st_intersects-udf={t_udf}s "
        f"(UDF overhead {t_udf / t_native:.1f}x)\n"
        f"xz2 layout (boxes): {xrg_hit}/{xrg_total} row groups intersect "
        f"{len(ranges)} code ranges ({1 - xrg_hit / xrg_total:.2%} skippable); "
        f"window rows={n_xwin}; ranged+refine={t_xz2}s full-exact={t_xfull}s "
        f"({t_xfull / max(t_xz2, 1e-9):.1f}x)"
    )
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
