"""Distributed multinomial Naive Bayes over hashed n-gram buckets —
the fastText-style linear text classifier every large-scale training
-data pipeline carries for language ID and quality gating (cf. the
CCNet/fastText pairing the `pipeline/lm.py` docstring cites). Training
is ONE map-side-combined groupBy over the gram stream; the model is
C×B rows (classes × hash buckets) — CONSTANT in corpus size — and
broadcasts into the scoring join, so scoring a 100 TB corpus is a
map-side join plus one grouped integer sum per (doc, class).

Exactness (the contract hash): per-gram class log-likelihoods and the
class priors are quantized to integer micro-nats BEFORE any per-doc
aggregation (the `pipeline/lm.py` pattern), so (doc, class) scores are
order-independent integer sums under any shuffle, and the argmax is a
deterministic (score DESC, label ASC) pick that DuckDB replays
verbatim. Every smoothed ratio is explicitly CAST AS DOUBLE on both
engines — Spark parses bare ``1.0`` literals as DECIMAL and silently
truncates long+decimal ratio chains to 6-digit scale (the observed
micro-nat drift documented in `pipeline/dsir.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geomesa_hive_spark.pipeline.dsir import gram_bucket_stream

__all__ = ["nb_train", "nb_score"]

_SCALE = 1_000_000  # micro-nats


def nb_train(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    n_buckets: int = 1024,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """(counts, classes): ``counts`` = (label, b, cnt) hashed-bucket
    gram counts per class; ``classes`` = (label, tot, prior_q) with
    ``tot`` the class's total gram count and ``prior_q`` the integer
    micro-nat log prior ``round(ln(n_docs_c / n_docs)·1e6)``. Both are
    bounded (C×B and C rows) regardless of corpus size."""
    g = gram_bucket_stream(docs, id_col, text_col, n_buckets, seed,
                           extra_cols=[label_col])
    # pin the C×B model: it is consumed by tots here AND by every
    # scoring join later, and each un-pinned consumer re-executes the
    # corpus-sized gram explode (round-6 plan audit); the materialized
    # operand is bounded at classes × buckets rows regardless of corpus
    counts = (
        g.groupBy(F.col(label_col).alias("label"), "b")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint()
    )
    tots = counts.groupBy("label").agg(F.sum("cnt").alias("tot"))
    ndocs = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("nd")
    )
    ntot = ndocs.agg(F.sum("nd").alias("ndt"))
    classes = (
        ndocs.crossJoin(F.broadcast(ntot))
        .join(tots, "label", "left")
        .select(
            "label",
            F.coalesce("tot", F.lit(0)).cast("long").alias("tot"),
            F.expr(
                f"CAST(round(ln(CAST(nd AS DOUBLE) / CAST(ndt AS DOUBLE))"
                f" * {_SCALE}.0) AS BIGINT)"
            ).alias("prior_q"),
        )
    )
    return counts, classes


def nb_score(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    counts: DataFrame,
    classes: DataFrame,
    n_buckets: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """(id, pred, score_q): the argmax class per document under
    add-one-smoothed multinomial NB, ``score = prior_q +
    Σ_grams round(ln((cnt+1)/(tot+B))·1e6)``. Every document gets a
    prediction — a zero-gram doc scores priors only. The gram stream
    is first collapsed to per-(id, bucket) COUNTS (≤ B rows per doc by
    construction — round 6: widening the RAW gram stream ×C made the
    crossJoin the dominant operand), the counts are widened ×C
    (classes crossJoin — C is tiny) so absent (label, b) pairs still
    contribute the smoothing floor, then the C×B model LEFT-joins in
    as a broadcast and each document's score is the exact integer
    multiply-sum Σ_b cnt(id,b)·lp_q(label,b) ≡ Σ_grams lp_q."""
    bb = float(int(n_buckets))
    g = gram_bucket_stream(docs, id_col, text_col, n_buckets, seed)
    doc_cnt = g.groupBy("id", "b").agg(F.count("*").alias("dc"))
    cls = F.broadcast(classes)
    per_gram = (
        doc_cnt.crossJoin(cls.select("label", "tot"))
        .join(F.broadcast(counts), ["label", "b"], "left")
        .select(
            "id", "label", "dc",
            # floor(x + 0.5), not round(): Spark's round() on doubles
            # allocates a BigDecimal per value, and this expression runs
            # once per (doc-bucket, class) row — the one hot
            # quantization in the scorer. Identical to round() except at
            # exact .5 ties, which transcendental ln outputs never hit;
            # the oracle replays the same floor form.
            F.expr(
                f"CAST(floor(ln((CAST(coalesce(cnt, 0) AS DOUBLE) + 1.0)"
                f" / (CAST(tot AS DOUBLE) + {bb})) * {_SCALE}.0 + 0.5) AS BIGINT)"
            ).alias("lp_q"),
        )
    )
    gram_sums = per_gram.groupBy("id", "label").agg(
        F.sum(F.col("dc") * F.col("lp_q")).alias("s")
    )
    scored = (
        docs.select(F.col(id_col).alias("id"))
        .crossJoin(cls.select("label", "prior_q"))
        .join(gram_sums, ["id", "label"], "left")
        .select(
            "id", "label",
            (F.coalesce("s", F.lit(0)) + F.col("prior_q")).alias("score_q"),
        )
    )
    rnk = F.row_number().over(
        Window.partitionBy("id").orderBy(F.desc("score_q"), F.asc("label"))
    )
    return (
        scored.withColumn("rnk", rnk)
        .filter(F.col("rnk") == 1)
        .select("id", F.col("label").alias("pred"),
                F.col("score_q").cast("long").alias("score_q"))
    )
