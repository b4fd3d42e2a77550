"""Isolated per-query timing for optimization work (round 14).

Usage:
    python scripts/time_query.py [-n TRIALS] [--jobs] <query> [query ...]

Times the named declared queries with bench.py's exact protocol (same
session config, same warmup, same per-query isolation: clearCache +
driver GC + 1s cleaner drain, best-of-N trials) and prints one line per
query. This is a measurement tool only — BENCH_FULL.json and the driver
contract come from bench.py, unchanged.

--jobs additionally records Spark JOB and STAGE counts per query (via a
per-trial job group + statusTracker) — the round-14 verdict item 4
evidence artifact for execution-count optimizations, which `.explain`
on the returned frame can structurally never show (a removed extra
pass/job leaves the final plan identical modulo expression IDs).
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    args = sys.argv[1:]
    n_trials = 3
    want_jobs = False
    if args and args[0] == "-n":
        n_trials = int(args[1])
        args = args[2:]
    if args and args[0] == "--jobs":
        want_jobs = True
        args = args[1:]
    if not args:
        print(__doc__)
        return 2
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("time-query")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from geomesa_hive_spark import register_all

    register_all(spark)
    spark.range(int(cpus) * 10000).repartition(int(cpus)).select(
        F.call_function(
            "st_astext",
            F.call_function(
                "st_makepoint", F.col("id").cast("double"), F.lit(2.0)
            ),
        )
    ).count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def _isolate() -> None:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)

    def _canary() -> float:
        # bench.py's fixed JVM-native contention canary: pure CPU +
        # small shuffle, so its wall time moves only with external
        # host noise — labels each query's window in the output
        t0 = time.time()
        spark.range(4_000_000).select(
            (F.xxhash64(F.col("id")) % 997).alias("b"), "id"
        ).groupBy("b").agg(
            F.sum("id"), F.count("*"), F.avg(F.col("id") * 2 + 1)
        ).count()
        return round(time.time() - t0, 3)

    _canary()  # warm the shuffle codegen path once, untimed

    qs = E.queries()
    rc = 0
    for name in args:
        if name not in qs:
            print(f"unknown query: {name}", file=sys.stderr)
            rc = 1
            continue
        spark.sparkContext.setJobDescription(f"time:{name}")
        trial_times: list[float] = []
        job_counts: list[int] = []
        stage_counts: list[int] = []
        rows = -1
        for ti in range(n_trials):
            grp = f"tq-{name}-{ti}"
            try:
                if want_jobs:
                    spark.sparkContext.setJobGroup(grp, f"time:{name}")
                t0 = time.time()
                rows = qs[name](spark, sf_dir).count()
                trial_times.append(round(time.time() - t0, 3))
                if want_jobs:
                    st = spark.sparkContext.statusTracker()
                    jids = st.getJobIdsForGroup(grp)
                    job_counts.append(len(jids))
                    n_stages = 0
                    for j in jids:
                        ji = st.getJobInfo(j)
                        if ji is not None:
                            n_stages += len(ji.stageIds)
                    stage_counts.append(n_stages)
            except Exception as exc:
                trial_times.append(-1.0)
                print(f"# {name}: trial FAILED {type(exc).__name__}: {exc}",
                      file=sys.stderr)
                rc = 1
            finally:
                if want_jobs:
                    spark.sparkContext.setJobGroup(
                        f"iso-{name}-{ti}", "isolate")
            _isolate()
        ok = [t for t in trial_times if t >= 0]
        best = min(ok) if ok else -1.0
        extra = ""
        if want_jobs:
            extra = f" jobs={job_counts} stages={stage_counts}"
        print(f"{name}: best {best}s rows={rows} trials={trial_times}"
              f"{extra} canary={_canary()}s", flush=True)
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
