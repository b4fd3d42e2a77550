"""Capture .explain('formatted') for declared queries into plans/r14/.

Usage:
    python scripts/r14_explain.py <tag> <query> [query ...]

Writes plans/r14/<query>_<tag>.txt for each query. <tag> is typically
'before' or 'after'. Runs at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] with the same session configuration bench.py
uses, so the plans match what the bench measures.

NOTE: many declared queries are composites that do eager work (index
builds, MOR commits) inside the query function; the captured plan is
the plan of the RETURNED DataFrame — the timed final materialization.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    tag = sys.argv[1]
    names = sys.argv[2:]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r14-explain")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from geomesa_hive_spark import register_all

    register_all(spark)

    qs = E.queries()
    outdir = os.path.join(repo, "plans", "r14")
    os.makedirs(outdir, exist_ok=True)
    rc = 0
    for name in names:
        if name not in qs:
            print(f"unknown query: {name}", file=sys.stderr)
            rc = 1
            continue
        spark.sparkContext.setJobDescription(f"explain:{name}")
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            out = os.path.join(outdir, f"{name}_{tag}.txt")
            with open(out, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {out}")
        except Exception as exc:  # keep going; report at exit
            print(f"{name}: FAILED {type(exc).__name__}: {exc}", file=sys.stderr)
            rc = 1
        spark.catalog.clearCache()
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
