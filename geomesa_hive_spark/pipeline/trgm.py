"""pg_trgm-style trigram substring index (round 14).

Accelerated ``WHERE text LIKE '%pattern%'``: the full-scan form is a
per-row ``contains()`` over 100 TB of text; PostgreSQL's answer is the
pg_trgm GIN index, and this module is its lakehouse twin in the repo's
persisted-index family (BM25 / MinHash / IVF — same bucket-partitioned
layout, same ``pipeline/index_io.py`` generation-versioned tombstone
lifecycle):

- ``build_trgm_index`` extracts each document's DISTINCT character
  trigrams with NATIVE exprs (lower → transform/substring →
  array_distinct — no Python in the build hot path) and stores
  ``postings/`` (tri, id) partitioned by ``bucket =
  pmod(xxhash64(tri), n_buckets)`` plus a ``docs/`` side table of
  lowered text partitioned by id-hash for pruned verification reads.
- ``substring_query_index`` reads ONLY the pattern's trigram buckets
  (≤ len(pattern) − 2 of them), intersects posting lists (a candidate
  must contain ALL the pattern's trigrams — necessary, not
  sufficient: trigrams can be scattered), then rechecks survivors
  with an exact ``contains`` against the pruned docs slice — so the
  result is EXACTLY the full-scan answer at index-read cost.
- append / delete / maintain follow the shared discipline: appends
  land gen-stamped rows in the same buckets, deletes are tombstones
  applied at query time (anti-join — a deleted doc is never
  returned), maintain physically drops covered rows and compacts to
  one file per bucket.

Patterns shorter than 3 characters cannot name a trigram and are
REFUSED (the index cannot prune for them — run the scan instead);
documents shorter than 3 characters have no postings, which is exact:
no ≥3-char pattern can occur in them. Trigrams are over the raw
lowered text (no pg_trgm word padding — this index serves substring
containment, not pg_trgm's similarity operator).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "build_trgm_index",
    "append_to_trgm_index",
    "delete_from_trgm_index",
    "maintain_trgm_index",
    "substring_query_index",
    "trgm_index_meta",
]

# distinct character trigrams of the (already lowered) column `t`;
# the <3 guard matters: Spark's sequence(1, 0) counts DOWN
_TRIS = (
    "CASE WHEN length(t) < 3 THEN array() "
    "ELSE array_distinct(transform(sequence(1, length(t) - 2), "
    "i -> substring(t, i, 3))) END"
)


def trgm_index_meta(path: str) -> dict:
    with open(os.path.join(path, "_index.json")) as fh:
        return json.load(fh)


def _base(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # spread_parallelism BEFORE projecting lower(): a small parquet
    # arrives as ONE input split and the whole trigram explode +
    # bucket hash downstream of this frame would run on one core (the
    # shared round-13 tokenization guard; a no-op at production scale
    # where inputs carry splits >> cores)
    from geomesa_hive_spark.pipeline.text import spread_parallelism

    raw = spread_parallelism(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")),
        "id",
    )
    return (
        raw.select("id", F.lower(F.col("__t")).alias("t"))
        .filter(F.col("t").isNotNull())
    )


def _write_batch(base: DataFrame, path: str, nb: int, gen: int,
                 mode: str) -> None:
    from geomesa_hive_spark.pipeline import index_io

    posts = (
        base.select("id", F.explode(F.expr(_TRIS)).alias("tri"))
        .withColumn("bucket",
                    F.pmod(F.xxhash64("tri"), F.lit(nb)).cast("int"))
        .withColumn("gen", F.lit(int(gen)))
    )
    docs = (
        base.withColumn(
            "dbucket", F.pmod(F.xxhash64("id"), F.lit(nb)).cast("int"))
        .withColumn("gen", F.lit(int(gen)))
    )
    # the two writes are independent (different dirs, both fed by the
    # materialized base) — overlap them (guide §2.6)
    index_io.run_concurrently(
        lambda: posts.repartition(nb, "bucket").write.mode(mode)
        .partitionBy("bucket").parquet(os.path.join(path, "postings")),
        lambda: docs.repartition(nb, "dbucket").write.mode(mode)
        .partitionBy("dbucket").parquet(os.path.join(path, "docs")),
    )


def build_trgm_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    n_buckets: int = 32,
) -> dict:
    """Extract and persist the corpus's trigram postings once. Returns
    the metadata dict (pinned in ``_index.json``)."""
    nb = int(n_buckets)
    base = _base(df, id_col, text_col).localCheckpoint()
    _write_batch(base, path, nb, gen=0, mode="overwrite")
    meta = {"n_buckets": nb, "gen": 0, "n_docs": base.count()}
    with open(os.path.join(path, "_index.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def append_to_trgm_index(
    new_docs: DataFrame, id_col: str, text_col: str, path: str
) -> dict:
    """Index a new batch into the same bucket layout (gen-stamped,
    append-only — existing files never rewritten). Caller contract:
    ids must be new; a re-crawled id is tombstoned first (delete +
    append = upsert, the shared index discipline)."""
    from geomesa_hive_spark.pipeline import index_io

    meta = index_io.require_generation_meta(
        trgm_index_meta(path), "trigram index")
    nb = int(meta["n_buckets"])
    g = int(meta["gen"]) + 1
    base = _base(new_docs, id_col, text_col).localCheckpoint()
    _write_batch(base, path, nb, gen=g, mode="append")
    meta["gen"] = g
    meta["n_docs"] = int(meta["n_docs"]) + base.count()
    tmp = os.path.join(path, "_index.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "_index.json"))
    return meta


def delete_from_trgm_index(keys: DataFrame, id_col: str,
                           path: str) -> None:
    """Tombstone documents out (applied at query time immediately;
    physically dropped at the next maintain). Unknown ids no-op."""
    from geomesa_hive_spark.pipeline import index_io

    meta = index_io.require_generation_meta(
        trgm_index_meta(path), "trigram index")
    index_io.write_tombstones(keys, id_col, path, int(meta["gen"]))


def maintain_trgm_index(spark: SparkSession, path: str) -> dict:
    """Apply tombstones physically and compact to one file per bucket
    (the uniform maintain contract; ``n_tombstones_applied`` reports
    distinct ids actually removed)."""
    from geomesa_hive_spark.pipeline import index_io

    meta = index_io.require_generation_meta(
        trgm_index_meta(path), "trigram index")
    nb = int(meta["n_buckets"])
    tomb = index_io.read_tombstones(spark, path)
    docs = index_io.require_generation_column(
        spark.read.parquet(os.path.join(path, "docs")),
        "trigram index docs")
    n_removed = index_io.removed_ids_count(docs, tomb, "id")

    def _compact(sub: str, part: str) -> None:
        rows = index_io.require_generation_column(
            spark.read.parquet(os.path.join(path, sub)),
            f"trigram index {sub}")
        kept = index_io.apply_tombstones(rows, tomb, "id")
        tmp = os.path.join(path, f"_{sub}_tmp")
        kept.repartition(nb, part).write.mode("overwrite").partitionBy(
            part
        ).parquet(tmp)
        index_io.swap_dir(os.path.join(path, sub), tmp)

    # postings and docs compact independently (guide §2.6)
    index_io.run_concurrently(
        lambda: _compact("postings", "bucket"),
        lambda: _compact("docs", "dbucket"),
    )
    index_io.clear_tombstones(path)
    meta["n_docs"] = int(meta["n_docs"]) - n_removed
    tmp = os.path.join(path, "_index.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "_index.json"))
    return {
        "n_tombstones_applied": int(n_removed),
        "postings_files": index_io.n_part_files(
            os.path.join(path, "postings")),
        "docs_files": index_io.n_part_files(os.path.join(path, "docs")),
        "n_docs": int(meta["n_docs"]),
    }


def substring_query_index(
    spark: SparkSession,
    path: str,
    pattern: str,
    prune_report: dict | None = None,
) -> DataFrame:
    """(id) of every indexed document whose text CONTAINS ``pattern``
    (case-insensitive) — exactly the full-scan
    ``contains(lower(text), lower(pattern))`` answer, at the cost of
    the pattern's trigram buckets + the candidates' doc buckets.
    ``prune_report`` (filled in place) records the pruning.

    The candidate set is BROADCAST into the docs-side join (its size
    drives dynamic partition pruning of the doc buckets). That is the
    right trade for the index's use case — selective patterns with few
    survivors of the all-trigrams intersection; a pattern common enough
    to name millions of candidates defeats a trigram index everywhere
    (pg_trgm included) and should run as the plain contains() scan."""
    from geomesa_hive_spark.pipeline import index_io

    meta = trgm_index_meta(path)
    nb = int(meta["n_buckets"])
    pat = pattern.lower()
    if len(pat) < 3:
        raise ValueError(
            "pattern shorter than 3 characters cannot name a trigram — "
            "the index cannot prune; run contains() over the corpus "
            "instead"
        )
    tris = sorted({pat[i:i + 3] for i in range(len(pat) - 2)})
    # trigram→bucket via the shared literal-frame helper (one tiny
    # local-relation job, python-side dedup — no distinct shuffle;
    # same rationale as retrieval._term_buckets: Python has no
    # xxhash64 twin, reimplementing it would be a drift hazard)
    from geomesa_hive_spark.pipeline.retrieval import _term_buckets

    need = _term_buckets(spark, tris, nb)
    tomb = index_io.read_tombstones(spark, path)
    posts = spark.read.parquet(os.path.join(path, "postings")).filter(
        F.col("bucket").isin(need) & F.col("tri").isin(tris)
    )
    posts = index_io.apply_tombstones(posts, tomb, "id")
    # candidates carry their doc bucket (the same pmod(xxhash64(id))
    # the writer used); the docs side is then pruned by DYNAMIC
    # partition pruning off the broadcast join on (id, dbucket) —
    # round-15: this folds what used to be three driver round-trips
    # (cands localCheckpoint, a collect_set of the buckets, then the
    # isin-filtered docs scan) into the single final job, and the
    # partition cut is identical (dbucket is a function of id).
    cands = (
        posts.groupBy("id")
        .agg(F.countDistinct("tri").alias("nt"))
        .filter(F.col("nt") == len(tris))
        .select("id")
        .withColumn("dbucket",
                    F.pmod(F.xxhash64("id"), F.lit(nb)).cast("int"))
    )
    if prune_report is not None:
        prune_report.update({
            "post_buckets_read": len(need),
            "doc_pruning": "dpp-broadcast",
            "n_buckets": nb,
            "n_trigrams": len(tris),
        })
    docs = spark.read.parquet(os.path.join(path, "docs"))
    docs = index_io.apply_tombstones(docs, tomb, "id")
    return (
        docs.join(F.broadcast(cands), ["id", "dbucket"])
        .filter(F.col("t").contains(pat))
        .select("id")
    )
