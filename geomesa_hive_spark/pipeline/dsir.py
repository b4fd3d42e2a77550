"""DSIR-style data selection via importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling"):
pick raw-corpus documents that look like a small high-quality target
corpus by (1) fitting hashed-n-gram bag-of-words models to both
corpora, (2) scoring every raw document with the log importance ratio
log p_target(x) − log p_raw(x), and (3) Gumbel-top-k resampling on the
log weights — the standard trick that turns weighted sampling WITHOUT
replacement into a deterministic top-k.

Everything is expressed as DataFrame ops and is exactly replayable in
SQL (the contract oracle):

- features are unigrams + bigrams hashed into ``n_buckets`` buckets via
  the portable md5 bucket placement the count-min sketch already uses
  (``conv(substr(md5('dsir:seed:gram'),1,8),16,10) % B``);
- per-bucket log ratios are quantized to integer micro-nats BEFORE the
  per-document sum (the ``pipeline/lm.py`` exactness pattern), so doc
  weights are order-independent integer sums under any partitioning;
- the Gumbel key is ``-ln(-ln(u))`` with ``u`` the md5 unit hash
  (``pipeline/sampling.py``) — fully deterministic, no RNG state.

Scale: one shuffle to build the bucket models (map-side-combined
groupBy over the gram stream — B buckets is tiny), then scoring is a
BROADCAST join of the B-row model to the gram stream plus one grouped
integer sum per document; selection is a single top-k. No all-pairs
step anywhere, and the model side never grows with the corpus — at
100 TB the only heavy operand is the gram stream, which is the same
token explode every other text operator here already prices.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geomesa_hive_spark.pipeline.lm import tokens_lower
from geomesa_hive_spark.pipeline.sampling import unit_hash

__all__ = ["gram_bucket_stream", "dsir_weights", "dsir_select"]

_SCALE = 1_000_000  # micro-nats


def gram_bucket_stream(
    docs: DataFrame, id_col: str, text_col: str, n_buckets: int,
    seed: int = 42, extra_cols: list[str] | None = None,
) -> DataFrame:
    """(id, b[, extra…]) — one row per unigram AND per bigram of each
    document, hashed to a bucket in [0, n_buckets) with the portable
    md5 placement (replayable in DuckDB via the _hex2int_sql twin)."""
    from geomesa_hive_spark.pipeline.text import spread_parallelism

    # the tokenize + md5-gram explode is the corpus-sized map stage and
    # runs BEFORE any shuffle, so it inherits the raw input's split
    # count — one core for a single-file local parquet (the round-13
    # single-split problem). Spread first; a no-op at production scale.
    docs = spread_parallelism(
        docs.select(F.col(id_col).alias("id"),
                    F.col(text_col).alias("__txt"),
                    *[F.col(c) for c in (extra_cols or [])]),
        "id",
    )
    toks = tokens_lower("__txt")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bigrams)
    keep = [F.col(c) for c in (extra_cols or [])]
    out = docs.select("id", *keep, F.explode(grams).alias("g"))
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("dsir"), F.lit(str(seed)), F.col("g"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % F.lit(int(n_buckets))
    )
    return out.select("id", *[F.col(c) for c in (extra_cols or [])], b.alias("b"))


def dsir_weights(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    n_buckets: int = 256,
    seed: int = 42,
) -> DataFrame:
    """Per-RAW-document importance weights: (id, n_grams, lw_q) where
    ``lw_q = Σ_grams round(ln(p̂_t(b)/p̂_r(b))·1e6)`` over the doc's
    hashed grams, with Laplace-smoothed bucket models
    ``p̂(b) = (c_b+1)/(total+B)`` fitted on the target (is_target) and
    raw (¬is_target) partitions of ``docs``. Raw docs with zero grams
    are kept at (0, 0) — dropping them silently would bias selection.

    Plan shape: the md5-gram explode — the only corpus-sized operand —
    runs ONCE and is immediately collapsed to per-(id, b) counts
    (map-side-combined; ≤ B rows per document by construction, vs
    n_grams rows in the raw stream), which a localCheckpoint pins so
    the model aggregation and the scoring join both read the counts
    instead of re-running the explode+hash (round 6: the previous
    shape scanned the gram stream twice and the second md5 pass
    dominated the query). Model totals ride along as a cross-joined
    1-row aggregate (no driver collect) and the B-row model broadcasts
    into the scoring join; all per-document sums stay exact integer
    arithmetic (Σ_grams lr_q(b) ≡ Σ_b cnt·lr_q(b))."""
    flagged = docs.withColumn("__t", is_target.cast("int"))
    g = gram_bucket_stream(flagged, id_col, text_col, n_buckets, seed,
                           extra_cols=["__t"])
    cnt = (
        g.groupBy("id", "__t", "b")
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    bstats = cnt.groupBy("b").agg(
        F.sum(F.col("c") * F.col("__t")).alias("ct"),
        F.sum(F.col("c") * (1 - F.col("__t"))).alias("cr"),
    )
    # totals from the B-row bucket table, NOT another pass over the
    # counts (let alone the gram stream)
    tot = bstats.agg(
        F.sum("ct").alias("tt"),
        F.sum("cr").alias("tr"),
    )
    bb = float(int(n_buckets))
    # explicit CAST AS DOUBLE everywhere: Spark parses bare 1.0/256.0
    # literals as DECIMAL, and long+decimal stays decimal — a 6-digit
    # truncated ratio that drifts micro-nats away from the oracle's
    # double arithmetic (observed, not theoretical)
    model = bstats.crossJoin(F.broadcast(tot)).select(
        "b",
        F.expr(
            f"CAST(round(ln(((CAST(ct AS DOUBLE) + 1.0) / (CAST(tt AS DOUBLE) + {bb}))"
            f" / ((CAST(cr AS DOUBLE) + 1.0) / (CAST(tr AS DOUBLE) + {bb})))"
            f" * {_SCALE}.0) AS BIGINT)"
        ).alias("lr_q"),
    )
    raw_cnt = cnt.filter(F.col("__t") == 0).select("id", "b", "c")
    per_doc = (
        raw_cnt.join(F.broadcast(model), "b")
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.col("c") * F.col("lr_q")).alias("lw_q"),
        )
    )
    return (
        flagged.filter(F.col("__t") == 0)
        .select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("lw_q", F.lit(0)).cast("long").alias("lw_q"),
        )
    )


def dsir_select(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    k: int,
    n_buckets: int = 256,
    seed: int = 42,
) -> DataFrame:
    """Gumbel-top-k importance resampling: (id, n_grams, lw_q,
    selected). Priority = lw_q/1e6 + Gumbel(0,1) with the Gumbel key
    ``-ln(-ln(u))`` derived from the deterministic md5 unit hash, so
    the selected set is sampling-without-replacement ∝ exp(lw) and
    identical on every engine/partitioning. Ties (astronomically
    unlikely with distinct ids) break by id."""
    w = dsir_weights(docs, id_col, text_col, is_target, n_buckets, seed)
    u = unit_hash(F.col("id"), seed=seed, salt="dsir") + F.lit(2.0 ** -33)
    pri = (F.col("lw_q") / F.lit(float(_SCALE))) + (-F.log(-F.log(u)))
    # pin the scored table: both the top-k and the final membership
    # join consume it, and without the checkpoint each re-executes the
    # whole weights DAG (gram explode + model + scoring join) — round-6
    # plan audit measured the query at ~2x its one-pass cost. The
    # materialized operand is one (id, 3 numbers) row per raw document
    # — the query's own output size, never wider.
    scored = w.withColumn("pri", pri).localCheckpoint()
    # TakeOrderedAndProject (per-partition top-k + driver merge), the
    # same no-global-sort shape as sampling.weighted_sample — a window
    # rank here would funnel every row through one partition
    topk = scored.orderBy(F.desc("pri"), F.asc("id")).limit(int(k)).select("id")
    return (
        scored.join(
            F.broadcast(topk.withColumn("__sel", F.lit(1))), "id", "left"
        )
        .select(
            "id", "n_grams", "lw_q",
            F.coalesce("__sel", F.lit(0)).cast("int").alias("selected"),
        )
    )
