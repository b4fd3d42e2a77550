"""Recall evidence for the approximate ANN paths.

Measures recall@k of knn_lsh (sign-LSH, multiprobe) and knn_ivf
(inverted-file) against the exact knn_brute baseline over a sample of
query vectors from the embeddings table — the accuracy half of the
accuracy/cost trade the SCALE.md ANN sections argue. Prints one JSON
line.

Usage: PYTHONPATH=/root/repo python scripts/ann_recall.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), ANN_QUERIES,
ANN_K.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from geomesa_hive_spark.pipeline import similarity

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_queries = int(os.environ.get("ANN_QUERIES", "20"))
    k = int(os.environ.get("ANN_K", "10"))

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("ann-recall")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvecs = {
        r.vec_id: list(r.embedding)
        for r in emb.filter(F.col("vec_id") < n_queries).collect()
    }

    def topk_ids(df):
        return {r.id for r in df.collect()}

    rec_lsh, rec_ivf = [], []
    for qid, qv in sorted(qvecs.items()):
        exact = topk_ids(similarity.knn_brute(emb, "vec_id", "embedding", qv, k=k))
        lsh = topk_ids(
            similarity.knn_lsh(emb, "vec_id", "embedding", qv, k=k, probe_hamming=1)
        )
        ivf = topk_ids(similarity.knn_ivf(emb, "vec_id", "embedding", qv, k=k))
        rec_lsh.append(len(exact & lsh) / k)
        rec_ivf.append(len(exact & ivf) / k)
        print(
            f"# q={qid}: recall@{k} lsh={rec_lsh[-1]:.2f} ivf={rec_ivf[-1]:.2f}",
            file=sys.stderr,
        )

    out = {
        "metric": f"ANN recall@{k} vs exact",
        "queries": len(qvecs),
        "recall_lsh": round(sum(rec_lsh) / len(rec_lsh), 4),
        "recall_ivf": round(sum(rec_ivf) / len(rec_ivf), 4),
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
