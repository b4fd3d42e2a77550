"""Sweep all queries() entries: compare the pandas dtype *kind* of every
column as materialized from Spark vs from the DuckDB oracle.

The round-3 root cause (VERDICT r03 "what's wrong" #1) was DuckDB returning
integer sums as HUGEINT -> pandas float64 while Spark returns int64; a plain
string hash then sees "16.0" vs "16". This script finds every latent
instance of that class in minutes instead of waiting for the driver to
sample the query.

Usage: PYTHONPATH=/root/repo python scripts/dtype_sweep.py [query ...]
Prints one line per mismatched column; exit 0 iff none.
"""
from __future__ import annotations

import sys
import traceback

import duckdb

SF_CHECK = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def kind(dtype) -> str:
    k = dtype.kind  # i/u -> int, f -> float, O -> object, b -> bool, M -> datetime
    return {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "ts", "O": "obj"}.get(k, k)


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dtype-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_CHECK}/{t}.parquet')")

    only = set(sys.argv[1:])
    qs, oracles = E.queries(), E.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            spdf = fn(spark, SF_CHECK).limit(200).toPandas()
            opdf = con.execute(sql).df().head(200)
        except Exception:
            print(f"ERR  {name}: raised")
            traceback.print_exc()
            bad.append((name, "raised"))
            continue
        for c in spdf.columns:
            if c not in opdf.columns:
                continue
            ks, ko = kind(spdf[c].dtype), kind(opdf[c].dtype)
            # object-vs-numeric is usually fine (decimals, strings); the
            # dangerous class is int-vs-float (plain str diverges: 16 vs 16.0)
            if ks != ko and {ks, ko} <= {"int", "float", "bool"}:
                print(f"MISMATCH {name}.{c}: spark={spdf[c].dtype} oracle={opdf[c].dtype}")
                bad.append((name, c))
            elif ks != ko:
                print(f"note     {name}.{c}: spark={spdf[c].dtype} oracle={opdf[c].dtype} (kinds {ks}/{ko})")
    print(f"\n=== {'CLEAN' if not bad else f'{len(bad)} dtype mismatches: {sorted(set(n for n,_ in bad))}'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
