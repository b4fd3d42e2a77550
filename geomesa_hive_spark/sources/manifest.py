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

__all__ = [
    "write_with_manifest", "read_pruned", "manifest_stats", "compact",
    "write_delta", "read_snapshot",
]

_MANIFEST = "_manifest.json"
_DELTA_LOG = "_deltas.json"


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


def _delta_log(path: str) -> list[dict]:
    p = os.path.join(path, _DELTA_LOG)
    if not os.path.exists(p):
        return []
    with open(p) as fh:
        return json.load(fh)


def write_delta(
    df: DataFrame | None,
    path: str,
    key_col: str,
    delete_keys: DataFrame | None = None,
) -> dict:
    """Commit a merge-on-read delta against the base table at ``path``
    — the Iceberg/Delta/Hudi MOR write pattern on plain parquet + a
    JSON commit log: upserted rows (``df``) and key-only tombstones
    (``delete_keys``, a one-column frame of ``key_col`` values) land
    in a NEW file set ``_delta_<seq>/`` without touching base files;
    ``_deltas.json`` records commit order. Within one commit a delete
    beats an upsert of the same key (delete-after-write, matching
    Delta's MERGE semantics); across commits the later commit wins.

    Why this matters at 100 TB: rewriting a base file to change one
    row is an O(file) write amplification — a day of point updates
    would rewrite the table many times over. MOR makes the write
    O(changed rows) and defers the merge to readers/compaction.
    Single-writer by design, like the manifest writer: multi-writer
    commit protocols (atomic log swap, conflict checks) are a table
    format's job and are honestly out of scope.

    Returns the appended log entry. Reference scope: the reference has
    no table maintenance at all — its sources are static Hive tables.
    """
    log = _delta_log(path)
    seq = (log[-1]["seq"] + 1) if log else 1
    dpath = os.path.join(path, f"_delta_{seq:04d}")
    base_cols = None
    n_up = n_del = 0
    if df is not None:
        base_cols = df.columns
        if key_col not in base_cols:
            raise ValueError(f"key column {key_col!r} not in delta columns")
        up = df.withColumn("__deleted", F.lit(False))
        n_up = df.count()
    if delete_keys is not None:
        if len(delete_keys.columns) != 1:
            raise ValueError("delete_keys must be a single-column frame of keys")
        spark = delete_keys.sparkSession
        if base_cols is None:
            base_cols = _snapshot_base(spark, path).columns
        tomb = delete_keys.toDF(key_col)
        for c in base_cols:
            if c != key_col:
                tomb = tomb.withColumn(c, F.lit(None))
        tomb = tomb.select(*base_cols).withColumn("__deleted", F.lit(True))
        n_del = delete_keys.count()
        up = up.unionByName(tomb) if df is not None else tomb
    if df is None and delete_keys is None:
        raise ValueError("write_delta needs upserts, delete_keys, or both")
    up.write.mode("overwrite").parquet(dpath)
    entry = {"seq": seq, "path": dpath, "n_upserts": int(n_up),
             "n_deletes": int(n_del)}
    log.append(entry)
    with open(os.path.join(path, _DELTA_LOG), "w") as fh:
        json.dump(log, fh)
    return entry


def _snapshot_base(spark: SparkSession, path: str) -> DataFrame:
    """Base files only — everything in ``path`` except delta dirs (a
    glob can't express 'not _delta_*', so list driver-side like the
    manifest reader does)."""
    files = [
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    if not files:
        raise ValueError(f"no base parquet files under {path}")
    return spark.read.parquet(*files)


def read_snapshot(
    spark: SparkSession,
    path: str,
    key_col: str,
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Merge-on-read snapshot of the table at ``path``: for each key,
    the latest committed version; tombstoned keys are gone. The merge
    is the textbook MOR reader plan — NOT a window over base∪deltas:

    1. resolve the deltas alone (window over the SMALL side: latest
       ``__seq`` per key, delete-beats-upsert within a commit),
    2. base LEFT ANTI JOIN resolved-delta keys (broadcast by default —
       the base never shuffles; flip ``broadcast_deltas=False`` when a
       backfill produced a delta set too big to broadcast and AQE
       should pick the strategy),
    3. UNION the surviving delta upserts.

    At 100 TB that means a snapshot read costs one base scan plus a
    broadcast hash anti-join — zero base shuffle — while the window
    shuffle touches only the delta rows. Readers needing repeated
    snapshots should compact() deltas into a new base instead."""
    log = _delta_log(path)
    base = _snapshot_base(spark, path)
    if not log:
        return base
    parts = []
    for e in log:
        parts.append(
            spark.read.parquet(e["path"]).withColumn("__seq", F.lit(e["seq"]))
        )
    alld = parts[0]
    for p in parts[1:]:
        alld = alld.unionByName(p)
    from pyspark.sql import Window

    # within a commit, deletes sort after upserts (delete-beats-upsert)
    w = Window.partitionBy(key_col).orderBy(
        F.col("__seq").desc(), F.col("__deleted").desc()
    )
    resolved = (
        alld.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__seq")
    )
    keys = resolved.select(key_col).distinct()
    if broadcast_deltas:
        keys = F.broadcast(keys)
    survivors = base.join(keys, on=key_col, how="left_anti")
    fresh = resolved.filter(~F.col("__deleted")).drop("__deleted")
    return survivors.unionByName(fresh.select(*base.columns))
