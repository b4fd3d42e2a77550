"""Manifest-based file skipping — the lakehouse metadata pattern
(Iceberg/Delta file statistics) on plain parquet + a JSON sidecar:
``write_with_manifest`` range-clusters the data so each file holds a
tight slice of the stats columns and records per-file min/max in
``_manifest.json``; ``read_pruned`` filters the FILE LIST on the
driver before Spark plans anything, so a selective predicate reads a
handful of files regardless of table size — pruning one level above
parquet row-group stats (which still apply inside each kept file).

Why this matters at 100 TB: row-group pruning still costs a footer
read per file; with millions of files the LISTING is the bottleneck.
A manifest makes the first cut O(files) driver-side metadata work with
zero object-store reads — and the manifest itself stays small (one
JSON row per file; at extreme file counts it would be sharded/stored
as parquet exactly like Iceberg's manifest lists, noted in SCALE.md).

The write does one extra read-back scan to collect per-file stats via
``input_file_name()`` — one map-side-combined groupBy over data just
written (still warm in page cache), the simple-and-correct alternative
to intercepting parquet footers mid-write.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_with_manifest", "read_pruned", "manifest_stats", "compact"]

_MANIFEST = "_manifest.json"


def write_with_manifest(
    df: DataFrame,
    path: str,
    stats_cols: list[str],
    n_files: int = 16,
) -> dict:
    """Range-cluster ``df`` by ``stats_cols`` into ``n_files`` parquet
    files and write a ``_manifest.json`` of per-file min/max for each
    stats column. Returns the manifest dict. Clustering is what makes
    the stats TIGHT — stats over randomly-placed rows span everything
    and prune nothing (same argument as the Z2 writer)."""
    d = df.repartitionByRange(int(n_files), *[F.col(c) for c in stats_cols])
    d.write.mode("overwrite").parquet(path)
    spark = df.sparkSession
    back = spark.read.parquet(path).withColumn("__f", F.input_file_name())
    aggs = []
    for c in stats_cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    aggs.append(F.count("*").alias("n_rows"))
    rows = back.groupBy("__f").agg(*aggs).collect()
    files = []
    for r in rows:
        entry = {"file": r["__f"], "n_rows": r["n_rows"]}
        for c in stats_cols:
            entry[f"min_{c}"] = _plain(r[f"min_{c}"])
            entry[f"max_{c}"] = _plain(r[f"max_{c}"])
        files.append(entry)
    manifest = {"stats_cols": list(stats_cols), "files": sorted(files, key=lambda e: e["file"])}
    with open(os.path.join(path, _MANIFEST), "w") as fh:
        json.dump(manifest, fh)
    return manifest


def _plain(v):
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (int, float, str)) or v is None:
        return v
    return str(v)


def manifest_stats(path: str) -> dict:
    with open(os.path.join(path, _MANIFEST)) as fh:
        return json.load(fh)


def read_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    lo,
    hi,
) -> tuple[DataFrame, int, int]:
    """(df, files_kept, files_total): read only the files whose
    [min, max] range for ``col`` overlaps [lo, hi], per the manifest —
    the predicate itself is STILL applied (manifest pruning is a
    superset cut, exactly like row-group stats), so results equal a
    full-scan filter by construction."""
    m = manifest_stats(path)
    if col not in m["stats_cols"]:
        raise ValueError(f"column {col!r} has no manifest stats (have {m['stats_cols']})")
    keep = [
        e["file"] for e in m["files"]
        if not (e[f"max_{col}"] < lo or e[f"min_{col}"] > hi)
    ]
    total = len(m["files"])
    if not keep:
        empty = spark.read.parquet(path).filter(F.lit(False))
        return empty, 0, total
    df = spark.read.parquet(*keep).filter(
        (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    )
    return df, len(keep), total


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_rows_per_file: int,
    stats_cols: list[str] | None = None,
) -> dict:
    """Small-files compaction — THE operational maintenance job at
    lake scale (a 100 TB table accreted from streaming micro-batches
    easily holds 10⁶ kilobyte files whose per-file open/footer costs
    dwarf the data read). Reads the table, re-clusters into
    ``ceil(rows / target_rows_per_file)`` files (range-clustered when
    ``stats_cols`` is given, so the rewrite ALSO tightens manifest
    stats), writes to ``out_path`` and refreshes its manifest. Returns
    {"files_in", "files_out", "rows"}.

    Content is preserved exactly (same rows, no transformation) — the
    invariant the contract oracle checks. Deliberately writes to a NEW
    path: atomic swap/commit protocols are a table format's job, and
    pretending an in-place rewrite is safe without one would be wrong
    at any scale."""
    import math

    df = spark.read.parquet(path)
    files_in = df.select(F.input_file_name()).distinct().count()
    rows = df.count()
    n_out = max(1, math.ceil(rows / int(target_rows_per_file)))
    cols = stats_cols or []
    if cols:
        manifest = write_with_manifest(df, out_path, cols, n_files=n_out)
        files_out = len(manifest["files"])
    else:
        df.repartition(n_out).write.mode("overwrite").parquet(out_path)
        files_out = (
            spark.read.parquet(out_path)
            .select(F.input_file_name()).distinct().count()
        )
    return {"files_in": files_in, "files_out": files_out, "rows": rows}
