"""Recall evidence for the approximate ANN paths.

Measures recall@k AND candidate fraction (share of the corpus scored)
for a curve of knn_lsh / knn_ivf configurations against the exact
knn_brute baseline, over a sample of query vectors from the embeddings
table — the accuracy/cost trade the SCALE.md ANN sections argue.
Prints one JSON line with one entry per configuration.

Round-3 headline configurations (BASELINE.md):
- lsh_h2_l4  — bits=8, Hamming-2, 4 tables (the knn_lsh DEFAULT)
- ivf_32_8   — pivot IVF, 32 lists, 8 probes (the knn_ivf contract config)
- pq_* — product quantization: the candidate cut is the top-``refine``
  by ADC (so cand_frac == refine/n by construction); pivot is the
  oracle-verified contract config, kmeans the trained-quality config
Round-2's single-table Hamming-1 config is kept as `lsh_h1_l1` so the
curve records why the default moved.

Usage: PYTHONPATH=/root/repo python scripts/ann_recall.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), ANN_QUERIES,
ANN_K, ANN_CONFIGS (comma-separated subset of config names — a partial
run measures the SAME per-config protocol, for iterating on one row
without paying the full ~15 min curve).
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
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n_total = emb.count()
    qvecs = {
        r.vec_id: list(r.embedding)
        for r in emb.filter(F.col("vec_id") < n_queries).collect()
    }

    def lsh_candidates(qv, bits, h, tables):
        out, cond = emb, None
        for t in range(tables):
            s = similarity._table_seed(42, t)
            out = similarity.random_hyperplane_buckets(
                out, "embedding", dim=len(qv), bits=bits, seed=s,
                out_col=f"bucket_{t}",
            )
            probes = similarity._query_buckets(qv, bits, s, h)
            c = F.col(f"bucket_{t}").isin(probes)
            cond = c if cond is None else (cond | c)
        return out.filter(cond)

    def pq_topk(qv, refine, method):
        return {
            r.id
            for r in similarity.knn_pq(
                emb, "vec_id", "embedding", qv, k=k, refine=refine, method=method
            ).collect()
        }

    import numpy as _np

    _opq_state: dict[str, object] = {}

    def pq_opq_topk(qv, refine, method):
        if not _opq_state:
            R = similarity.opq_rotation(emb, "vec_id", "embedding", 64, m=8)
            rot = (
                similarity.rotate_vecs(emb, "embedding", R, "rvec")
                .select("vec_id", F.col("rvec").alias("embedding"))
                .cache()
            )
            rot.count()
            _opq_state["R"], _opq_state["rot"] = R, rot
        R, rot = _opq_state["R"], _opq_state["rot"]
        qr = list(R @ _np.asarray(qv, dtype=float))
        return {
            r.id
            for r in similarity.knn_pq(
                rot, "vec_id", "embedding", qr, k=k, refine=refine, method=method
            ).collect()
        }

    def ivfpq_topk(qv, n_lists, n_probe, refine, method):
        return {
            r.id
            for r in similarity.knn_ivfpq(
                emb, "vec_id", "embedding", qv, k=k,
                n_lists=n_lists, n_probe=n_probe, refine=refine, method=method,
            ).collect()
        }

    def ivf_candidates(qv, n_lists, n_probe):
        cents = similarity._pivot_centroids(emb, "vec_id", "embedding", n_lists)
        order = similarity._probe_lists(cents, qv, n_probe)
        return emb.withColumn(
            "__list", similarity._list_id_expr(cents, "embedding")
        ).filter(F.col("__list").isin(order))

    # round 12: SQ8 stored index — coarse over dequantized int8 codes
    # (vec_q-only scan), exact re-rank on rerank_k survivors
    _sq8_state: dict[str, str] = {}

    def sq8_topk(qv, n_lists, n_probe, rerank_k):
        if "path" not in _sq8_state:
            import tempfile

            p = tempfile.mkdtemp(prefix="ann_sq8_")
            similarity.build_ivf_index(
                emb, "vec_id", "embedding", p, n_lists=n_lists, sq8=True)
            _sq8_state["path"] = p
        return {
            r.id
            for r in similarity.knn_query_index(
                spark, _sq8_state["path"], qv, k=k, n_probe=n_probe,
                rerank_k=rerank_k,
            ).collect()
        }

    configs = {
        "lsh_h1_l1": dict(kind="lsh", bits=8, h=1, tables=1),
        "lsh_h2_l1": dict(kind="lsh", bits=8, h=2, tables=1),
        "lsh_h2_l4": dict(kind="lsh", bits=8, h=2, tables=4),
        "ivf_16_4": dict(kind="ivf", n_lists=16, n_probe=4),
        "ivf_32_8": dict(kind="ivf", n_lists=32, n_probe=8),
        "pq_pivot_r200": dict(kind="pq", refine=200, method="pivot"),
        "pq_kmeans_r200": dict(kind="pq", refine=200, method="kmeans"),
        # cand_frac here = refine/n (exact-scored share), consistent with the
        # pq rows; the ADC pass additionally scores ~n_probe/n_lists of the
        # corpus from 8-byte codes (noted in BASELINE.md)
        # OPQ rotation (similarity.opq_rotation — PCA eigenbasis with
        # eigenvalue-balanced subspace allocation) before PQ: measured
        # ≈ no-op on THIS corpus (flat spectrum, top/median eigenvalue
        # 1.35 — OPQ's gain is bounded by anisotropy; kept on the curve
        # because real embedding spectra are steep and the rotation is
        # free at write time)
        "pq_opq_kmeans_r200": dict(kind="pq_opq", refine=200, method="kmeans"),
        "ivfpq_pivot_32_8_r200": dict(
            kind="ivfpq", n_lists=32, n_probe=8, refine=200, method="pivot"
        ),
        "ivfpq_kmeans_32_8_r200": dict(
            kind="ivfpq", n_lists=32, n_probe=8, refine=200, method="kmeans"
        ),
        # round 11: FILTERED search (knn_query_index pre_filter) — recall
        # vs the exact FILTERED brute force as the filter gets more
        # selective (sel = keep 1/sel of the corpus) and as n_probe
        # compensates; the recall-vs-selectivity knob SCALE.md states
        # round 12: SQ8 (int8 per-dim linear quantization) vs the same
        # probes unquantized — recall lost to quantization alone is the
        # delta vs ivf_32_8; cand_frac = rerank/n (exact-scored share,
        # the pq convention; the coarse pass additionally scores
        # ~n_probe/n_lists of the corpus from 1-byte codes)
        "ivf_sq8_32_8_r20": dict(kind="ivf_sq8", n_lists=32, n_probe=8,
                                 rerank=20),
        "ivf_sq8_32_8_r40": dict(kind="ivf_sq8", n_lists=32, n_probe=8,
                                 rerank=40),
        "ivff_32_8_s3": dict(kind="ivf_filtered", n_lists=32, n_probe=8,
                             sel=3),
        "ivff_32_16_s3": dict(kind="ivf_filtered", n_lists=32, n_probe=16,
                              sel=3),
        "ivff_32_8_s10": dict(kind="ivf_filtered", n_lists=32, n_probe=8,
                              sel=10),
        "ivff_32_16_s10": dict(kind="ivf_filtered", n_lists=32, n_probe=16,
                               sel=10),
    }
    subset = os.environ.get("ANN_CONFIGS")
    if subset:
        names = {s.strip() for s in subset.split(",") if s.strip()}
        unknown = names - set(configs)
        if unknown:
            raise SystemExit(f"unknown ANN_CONFIGS: {sorted(unknown)} "
                             f"(have {sorted(configs)})")
        configs = {c: cfg for c, cfg in configs.items() if c in names}
    recalls: dict[str, list[float]] = {c: [] for c in configs}
    fracs: dict[str, list[float]] = {c: [] for c in configs}

    for qid, qv in sorted(qvecs.items()):
        exact = {
            r.id for r in similarity.knn_brute(emb, "vec_id", "embedding", qv, k=k).collect()
        }
        for cname, cfg in configs.items():
            if cfg["kind"] == "pq":
                got = pq_topk(qv, cfg["refine"], cfg["method"])
                recalls[cname].append(len(exact & got) / k)
                fracs[cname].append(cfg["refine"] / n_total)
                continue
            if cfg["kind"] == "pq_opq":
                got = pq_opq_topk(qv, cfg["refine"], cfg["method"])
                recalls[cname].append(len(exact & got) / k)
                fracs[cname].append(cfg["refine"] / n_total)
                continue
            if cfg["kind"] == "ivfpq":
                got = ivfpq_topk(
                    qv, cfg["n_lists"], cfg["n_probe"], cfg["refine"], cfg["method"]
                )
                recalls[cname].append(len(exact & got) / k)
                fracs[cname].append(cfg["refine"] / n_total)
                continue
            if cfg["kind"] == "ivf_sq8":
                got = sq8_topk(qv, cfg["n_lists"], cfg["n_probe"],
                               cfg["rerank"])
                recalls[cname].append(len(exact & got) / k)
                fracs[cname].append(cfg["rerank"] / n_total)
                continue
            if cfg["kind"] == "ivf_filtered":
                pred = F.col("vec_id") % cfg["sel"] == 0
                fcand = ivf_candidates(
                    qv, cfg["n_lists"], cfg["n_probe"]).filter(pred)
                got = {
                    r.id for r in similarity.knn_brute(
                        fcand, "vec_id", "embedding", qv, k=k).collect()
                }
                exactf = {
                    r.id for r in similarity.knn_brute(
                        emb.filter(pred), "vec_id", "embedding", qv, k=k
                    ).collect()
                }
                recalls[cname].append(len(exactf & got) / k)
                fracs[cname].append(fcand.count() / n_total)
                continue
            if cfg["kind"] == "lsh":
                cand = lsh_candidates(qv, cfg["bits"], cfg["h"], cfg["tables"])
            else:
                cand = ivf_candidates(qv, cfg["n_lists"], cfg["n_probe"])
            got = {
                r.id
                for r in similarity.knn_brute(cand, "vec_id", "embedding", qv, k=k).collect()
            }
            recalls[cname].append(len(exact & got) / k)
            fracs[cname].append(cand.count() / n_total)
        print(f"# q={qid} done", file=sys.stderr)

    out = {
        "metric": f"ANN recall@{k} vs exact (with candidate fraction)",
        "queries": len(qvecs),
        "configs": {
            c: {
                "recall": round(sum(recalls[c]) / len(recalls[c]), 4),
                "cand_frac": round(sum(fracs[c]) / len(fracs[c]), 4),
            }
            for c in configs
        },
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
