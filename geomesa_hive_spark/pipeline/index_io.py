"""Shared lifecycle machinery for the three persisted indexes
(MinHash ``pipeline/dedup.py``, BM25 ``pipeline/retrieval.py``, IVF
``pipeline/similarity.py``) — one implementation of the pieces their
docstrings claim are "the same design", so the semantics cannot drift
per index (round-10 review finding: three hand-rolled copies had
already diverged on tombstone generations and report counts).

The design, once:

- **Generation-versioned tombstones.** Index rows carry the append
  GENERATION they were born at (build = 0, each append bumps the
  ``gen`` counter in the index's metadata JSON). A delete appends
  ``(id, gen-at-delete)`` rows to ``tombstones/``; queries hide only
  rows with ``id`` matched AND ``row.gen <= tombstone.gen`` (max per
  id). That makes UPSERT — delete then re-append the same id — a pure
  log operation whose new rows are immediately visible, with no
  maintain required in between and no risk of the re-appended content
  being silently destroyed at the next maintain.
- **Apply-at-maintain.** maintain() drops covered rows physically
  during the compaction rewrite it already pays, reports the number of
  distinct ids whose rows were ACTUALLY removed (an unknown-id delete
  is a no-op and does not count), and clears the log.
- **Rename-based swap.** Rewrites land in ``<dir>.compact`` and swap
  in via rename under the single-maintainer contract (no concurrent
  query/append/maintain) shared with ``manifest.vacuum``.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "write_tombstones", "read_tombstones", "apply_tombstones",
    "removed_ids_count", "clear_tombstones", "swap_dir", "n_part_files",
    "require_generation_column", "require_generation_meta",
    "run_concurrently",
]


def run_concurrently(*thunks) -> list:
    """Run independent Spark actions from a small driver thread pool
    (optimization guide §2.6: actions are only sequential because the
    driver calls them sequentially — overlapping independent jobs lets
    one job's tasks back-fill executors freed by another's tail, and
    at index-write scale it overlaps the fixed per-job latency of
    planning + scheduling + the parquet commit protocol). Used for the
    independent per-dataset writes of one index mutation (postings vs
    docs vs positions — different directories, no shared state beyond
    the already-materialized input). Re-raises the first failure after
    all thunks settle, so a failed write can never be silently skipped.
    Returns the thunk results in order."""
    from concurrent.futures import ThreadPoolExecutor

    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futs = [pool.submit(t) for t in thunks]
        # wait on all before raising: a half-settled mutation with an
        # in-flight write behind a raised exception would race cleanup
        errs = []
        out = []
        for f in futs:
            try:
                out.append(f.result())
            except Exception as exc:  # noqa: BLE001 — re-raised below
                errs.append(exc)
                out.append(None)
        if errs:
            raise errs[0]
        return out


def require_generation_meta(meta: dict, what: str) -> dict:
    """Metadata-level twin of :func:`require_generation_column` — refuse
    any mutation (append/delete/upsert) of an index whose stored
    metadata predates generation versioning, BEFORE anything is
    written. Validate-before-write: a tombstone or gen-stamped append
    landing in a legacy layout leaves the index half-mutated and every
    later read failing with a confusing unresolved-'gen' error (or,
    worse, silently un-hidden rows if Spark samples a gen-carrying
    footer)."""
    if "gen" not in meta:
        raise ValueError(
            f"{what} predates generation-versioned tombstones — "
            f"rebuild the index with the current version"
        )
    return meta


def write_tombstones(keys: DataFrame, id_col: str, path: str,
                     gen: int) -> None:
    """Append (id, gen) tombstone rows — O(ids), never an index scan."""
    keys.select(
        F.col(id_col).alias("id"), F.lit(int(gen)).alias("gen")
    ).write.mode("append").parquet(os.path.join(path, "tombstones"))


def read_tombstones(spark, path: str) -> DataFrame | None:
    """Distinct tombstoned ids with the LATEST generation each was
    deleted at (max — a re-delete after a re-append must hide the
    younger rows too). None when no log exists."""
    t = os.path.join(path, "tombstones")
    if not os.path.isdir(t):
        return None
    return spark.read.parquet(t).groupBy("id").agg(
        F.max("gen").alias("gen")
    )


def apply_tombstones(rows: DataFrame, tomb: DataFrame | None,
                     id_col: str) -> DataFrame:
    """Hide rows whose (id, gen) is covered by a tombstone: same id AND
    row generation <= tombstone generation. ``rows`` must carry a
    ``gen`` column (see :func:`require_generation_column`)."""
    if tomb is None:
        return rows
    t = tomb.select(
        F.col("id").alias("__t_id"), F.col("gen").alias("__t_gen")
    )
    return rows.join(
        F.broadcast(t),
        (rows[id_col] == t["__t_id"]) & (F.col("gen") <= t["__t_gen"]),
        "left_anti",
    )


def removed_ids_count(rows: DataFrame, tomb: DataFrame | None,
                      id_col: str) -> int:
    """Distinct ids whose rows a maintain() ACTUALLY removes (covered
    by a tombstone AND present) — the uniform report semantics across
    the three indexes; unknown-id deletes contribute nothing."""
    if tomb is None:
        return 0
    t = tomb.select(
        F.col("id").alias("__t_id"), F.col("gen").alias("__t_gen")
    )
    return (
        rows.join(
            F.broadcast(t),
            (rows[id_col] == t["__t_id"]) & (F.col("gen") <= t["__t_gen"]),
            "left_semi",
        )
        .select(id_col).distinct().count()
    )


def clear_tombstones(path: str) -> None:
    t = os.path.join(path, "tombstones")
    if os.path.isdir(t):
        shutil.rmtree(t)


def swap_dir(src: str, tmp: str) -> None:
    """Retire ``src`` and move ``tmp`` into its place (rename-based;
    single-maintainer contract)."""
    old = src + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(src, old)
    os.rename(tmp, src)
    shutil.rmtree(old)


def n_part_files(d: str) -> int:
    return len(glob.glob(os.path.join(d, "*", "*.parquet")))


def require_generation_column(rows: DataFrame, what: str) -> DataFrame:
    """Refuse indexes written before generation versioning: appending
    gen-carrying files into a gen-less dir would create a MIXED parquet
    schema, and whichever footer Spark samples would either read old
    rows as gen=NULL (tombstones silently stop hiding them) or drop the
    column entirely (fresh upserts get over-hidden). A loud rebuild
    instruction beats either silent corruption."""
    if "gen" not in rows.columns:
        raise ValueError(
            f"{what} predates generation-versioned tombstones (no 'gen' "
            f"column) — rebuild the index with the current version"
        )
    return rows
