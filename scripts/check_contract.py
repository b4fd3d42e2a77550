"""Local stand-in for the driver's correctness gate.

Runs entry() at sf0.001, every queries() entry plus its oracle_sql()
twin at sf0.01 (DuckDB), and compares row-count, schema (column
names), and a value hash computed the driver's way: sort columns by
name, sort rows, hash stringified values.

Usage: python scripts/check_contract.py [--artifact] [query ...]

``--artifact`` (full runs only) also writes CONTRACT_FULL.json at the
repo root: one record per query with pass/fail, row counts, the value
hash, and oracle coverage — the committed, per-round, full-surface
correctness record (round-5 VERDICT item #1: 60 queries had never been
driver-sampled and their green evidence lived only in prose).
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

SF_SMOKE = "/root/testdata/sf0.001"
SF_CHECK = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)

    def cell(v):
        # STRICT stringify: no float formatting that collapses int-vs-float
        # differences ("16.0" vs "16"). The driver stringifies plainly, so a
        # DuckDB HUGEINT-sum materialized as float64 must FAIL here too —
        # round-3 root cause was this function hiding exactly that mismatch.
        if v is None:
            return "NULL"
        try:
            if pd.isna(v):
                return "NULL"
        except (TypeError, ValueError):
            pass  # list/array cells: not NA-checkable, stringify below
        if isinstance(v, (bytes, bytearray)):
            return hashlib.md5(bytes(v)).hexdigest()
        return str(v)

    rows = sorted("|".join(cell(v) for v in row) for row in pdf.itertuples(index=False))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("contract-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    args = sys.argv[1:]
    artifact = "--artifact" in args
    only = set(a for a in args if a != "--artifact")
    if artifact and only:
        # a subset run must never clobber the committed full-surface record
        print("--artifact is full-surface only; ignoring it for a subset run")
        artifact = False
    fails = []
    record: dict[str, dict] = {}

    if not only or "entry" in only:
        t0 = time.time()
        try:
            n = E.entry(spark).count()
            print(f"entry(): {n} rows  [{time.time()-t0:.1f}s]")
            if n < 1:
                fails.append("entry")
        except Exception:
            traceback.print_exc()
            fails.append("entry")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_CHECK}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_CHECK)
            spdf = sdf.toPandas()
        except Exception:
            print(f"FAIL {name}: spark query raised")
            traceback.print_exc()
            fails.append(name)
            record[name] = {"pass": False, "err": "spark query raised"}
            continue
        el = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: {len(spdf)} rows (rows-only, no oracle)  [{el:.1f}s]")
            record[name] = {
                "pass": True, "check": "rows_only", "spark_rows": len(spdf),
            }
            if len(spdf) < 0:
                fails.append(name)
            continue
        try:
            opdf = con.execute(sql).df()
        except Exception:
            print(f"FAIL {name}: oracle SQL raised")
            traceback.print_exc()
            fails.append(name)
            record[name] = {"pass": False, "err": "oracle SQL raised"}
            continue
        sc, oc = sorted(spdf.columns), sorted(opdf.columns)
        if sc != oc:
            print(f"FAIL {name}: schema {sc} vs oracle {oc}")
            fails.append(name)
            record[name] = {"pass": False, "err": "schema mismatch"}
            continue
        if len(spdf) != len(opdf):
            print(f"FAIL {name}: rows {len(spdf)} vs oracle {len(opdf)}")
            fails.append(name)
            record[name] = {
                "pass": False, "err": "row count mismatch",
                "spark_rows": len(spdf), "oracle_rows": len(opdf),
            }
            continue
        hs, ho = norm_hash(spdf), norm_hash(opdf)
        if hs != ho:
            print(f"FAIL {name}: value hash mismatch ({len(spdf)} rows)")
            merged = spdf.reindex(sorted(spdf.columns), axis=1)
            om = opdf.reindex(sorted(opdf.columns), axis=1)
            key = sc[0]
            try:
                m = merged.sort_values(sc).reset_index(drop=True)
                o = om.sort_values(oc).reset_index(drop=True)
                diff = (m.astype(str) != o.astype(str)).any(axis=1)
                print("  first diffs (spark | oracle):")
                for i in m.index[diff][:3]:
                    print("   S:", dict(m.loc[i]))
                    print("   O:", dict(o.loc[i]))
            except Exception:
                pass
            fails.append(name)
            record[name] = {
                "pass": False, "err": "value hash mismatch",
                "spark_rows": len(spdf), "oracle_rows": len(opdf),
            }
        else:
            print(f"PASS {name}: {len(spdf)} rows hash={hs[:8]}  [{el:.1f}s]")
            record[name] = {
                "pass": True, "check": "hash", "rows": len(spdf), "hash": hs,
                "sec": round(el, 2),
            }

    if artifact:
        payload = {
            "sf": SF_CHECK,
            "n_queries": len(record),
            "n_pass": sum(1 for r in record.values() if r["pass"]),
            "n_hash_checked": sum(
                1 for r in record.values() if r.get("check") == "hash"
            ),
            "queries": record,
        }
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CONTRACT_FULL.json",
        )
        with open(out, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(f"wrote {out}: {payload['n_pass']}/{payload['n_queries']} pass, "
              f"{payload['n_hash_checked']} hash-checked")

    print("\n=== ", "ALL GREEN" if not fails else f"FAILURES: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
