"""Recall/precision evidence for MinHash-LSH dedup vs exact Jaccard.

The banded-minhash pipeline (pipeline/dedup.py — minhash_lsh_pairs and
the round-7 persisted index sharing its arithmetic) trades exactness
two ways: (a) banding misses some true pairs whose signatures never
agree on a full band (recall < 1), and (b) the 64-perm jaccard ESTIMATE
ranks survivors, not true jaccard (precision < 1 near the threshold).
This control measures both against the exact word-n-gram Jaccard pairs
(ngram_jaccard_pairs, strategy="count" — exact by construction) on the
documents table, at the contract configuration (num_perm=64, bands=16,
ngram n=3, threshold sweep) — the quantified version of the S-curve
argument in SCALE.md's dedup section.

Prints one JSON line:
  {"sf": ..., "n_docs": N, "configs": {"t0.5": {"true_pairs": ...,
   "lsh_pairs": ..., "recall": ..., "precision": ...}, ...}}

Recall = |LSH∩true| / |true|; precision = |LSH∩true| / |LSH| where
'true' is exact jaccard ≥ t and LSH is est_jaccard ≥ t.

Usage: PYTHONPATH=/root/repo python scripts/dedup_recall_control.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01 — the exact
all-candidate ground truth is quadratic-ish in hot grams; 0.01 runs in
seconds).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    from geomesa_hive_spark.pipeline import dedup

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .appName("dedup_recall_control")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()

    out: dict = {"sf": sf_dir, "n_docs": n_docs, "configs": {}}
    for t in (0.5, 0.7, 0.9):
        true_pairs = {
            (r.id_a, r.id_b)
            for r in dedup.ngram_jaccard_pairs(
                docs, "doc_id", "text", n=3, threshold=t
            ).collect()
        }
        lsh = {
            (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
            for r in dedup.minhash_lsh_pairs(
                docs, "doc_id", "text", num_perm=64, bands=16, threshold=t
            ).collect()
        }
        hit = len(lsh & true_pairs)
        out["configs"][f"t{t}"] = {
            "true_pairs": len(true_pairs),
            "lsh_pairs": len(lsh),
            "hits": hit,
            "recall": round(hit / len(true_pairs), 4) if true_pairs else None,
            "precision": round(hit / len(lsh), 4) if lsh else None,
        }
        spark.catalog.clearCache()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
