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
    "write_delta", "read_snapshot", "current_seq", "ConcurrentWriteConflict",
]

_MANIFEST = "_manifest.json"
_DELTA_LOG = "_deltas.json"   # legacy single-file log (read-compat only)
_COMMIT_DIR = "_commits"      # one JSON per commit, name = zero-padded seq


class ConcurrentWriteConflict(Exception):
    """Raised when a writer's optimistic commit detects that a commit
    which landed after the writer's read snapshot touches overlapping
    keys — the writer's delta was computed against stale data and must
    be recomputed, not blindly layered on top."""

    def __init__(self, message: str, overlap_count: int, conflicting_seqs: list[int]):
        super().__init__(message)
        self.overlap_count = int(overlap_count)
        self.conflicting_seqs = list(conflicting_seqs)


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
    """All committed deltas in seq order: the legacy single-file log
    (if present) plus one JSON per commit under ``_commits/``. A commit
    file is the atomic commit point — it appears fully-written or not
    at all (hard-linked into place, never written in place)."""
    entries: list[dict] = []
    p = os.path.join(path, _DELTA_LOG)
    if os.path.exists(p):
        with open(p) as fh:
            entries.extend(json.load(fh))
    cdir = os.path.join(path, _COMMIT_DIR)
    if os.path.isdir(cdir):
        for name in os.listdir(cdir):
            if name.endswith(".json") and not name.startswith("."):
                with open(os.path.join(cdir, name)) as fh:
                    entries.append(json.load(fh))
    entries.sort(key=lambda e: e["seq"])
    return entries


def current_seq(path: str) -> int:
    """Latest committed delta seq (0 = base only). A read-modify-write
    writer snapshots this BEFORE computing its delta and passes it as
    ``write_delta(..., check_conflict_from_seq=...)`` so commits that
    land in between are conflict-checked against its keys."""
    log = _delta_log(path)
    return log[-1]["seq"] if log else 0


def _atomic_commit(cdir: str, seq: int, entry: dict, token: str) -> bool:
    """Claim commit number ``seq`` by hard-linking a fully-written temp
    file to ``<seq>.json`` — link(2) fails with EEXIST if the name is
    taken, which makes claim-if-absent ATOMIC on POSIX local/NFS
    filesystems (on an object store the same protocol is a conditional
    PUT / If-None-Match; on HDFS, create-with-overwrite=false). Returns
    False when the seq was lost to another writer."""
    tmp = os.path.join(cdir, f".tmp_{token}_{seq}")
    with open(tmp, "w") as fh:
        json.dump(entry, fh)
        fh.flush()
        os.fsync(fh.fileno())
    final = os.path.join(cdir, f"{seq:06d}.json")
    try:
        os.link(tmp, final)
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


def write_delta(
    df: DataFrame | None,
    path: str,
    key_col: str,
    delete_keys: DataFrame | None = None,
    check_conflict_from_seq: int | None = None,
    max_attempts: int = 50,
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

    MULTI-WRITER commit protocol (optimistic concurrency, the
    Delta-log discipline): data files land first under a
    writer-unique directory, then the commit CLAIMS the next dense
    seq by atomically creating ``_commits/<seq>.json`` (hard-link of
    a fully-written temp file — fails if the name exists, so exactly
    one writer wins each number; on an object store the same step is
    a conditional PUT). A loser re-reads the log and retries with the
    next number — blind upserts always serialize cleanly this way.

    A read-modify-write writer additionally passes
    ``check_conflict_from_seq`` = :func:`current_seq` taken BEFORE it
    computed its delta: at commit time every commit that landed after
    that snapshot is checked for key overlap (exact — the newer
    deltas' key columns are read back and joined against this
    writer's upsert+delete keys; delta files are small by
    construction, so the check is delta-sized, never table-sized).
    Overlap raises :class:`ConcurrentWriteConflict` with the count
    and the conflicting seqs — the delta was computed against stale
    versions of those keys and silently layering it would lose the
    other writer's update. Disjoint-key writers interleave freely.

    Returns the committed log entry. Reference scope: the reference
    has no table maintenance at all — its sources are static Hive
    tables.
    """
    import uuid

    base_cols = None
    n_up = n_del = 0
    spark = None
    if df is not None:
        base_cols = df.columns
        if key_col not in base_cols:
            raise ValueError(f"key column {key_col!r} not in delta columns")
        spark = df.sparkSession
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
    token = uuid.uuid4().hex[:12]
    dpath = os.path.join(path, f"_delta_{token}")
    up.write.mode("overwrite").parquet(dpath)
    cdir = os.path.join(path, _COMMIT_DIR)
    os.makedirs(cdir, exist_ok=True)
    my_keys = None
    if check_conflict_from_seq is not None:
        my_keys = up.select(key_col).distinct()
    for _ in range(int(max_attempts)):
        log = _delta_log(path)
        seq = (log[-1]["seq"] + 1) if log else 1
        if my_keys is not None:
            newer = [e for e in log if e["seq"] > int(check_conflict_from_seq)]
            if newer:
                other = spark.read.parquet(
                    *[e["path"] for e in newer]
                ).select(key_col).distinct()
                overlap = my_keys.join(other, key_col).count()
                if overlap:
                    raise ConcurrentWriteConflict(
                        f"{overlap} key(s) were modified by commit(s) "
                        f"{[e['seq'] for e in newer]} after snapshot seq "
                        f"{check_conflict_from_seq}; recompute the delta "
                        f"against the current snapshot",
                        overlap_count=overlap,
                        conflicting_seqs=[e["seq"] for e in newer],
                    )
        entry = {"seq": seq, "path": dpath, "n_upserts": int(n_up),
                 "n_deletes": int(n_del)}
        if _atomic_commit(cdir, seq, entry, token):
            return entry
    raise RuntimeError(
        f"could not claim a commit seq after {max_attempts} attempts "
        f"(extreme contention on {path})"
    )


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
