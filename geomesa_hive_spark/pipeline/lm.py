"""Distributed n-gram language-model scoring — the CCNet-style quality
signal (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data"): score every document by its per-token
negative log-likelihood under a corpus-trained LM and filter on the
score. CCNet uses KenLM; at pipeline scale the same signal comes from a
bigram model with add-one smoothing, trained and applied entirely as
DataFrame ops.

Exactness across engines (the contract hash): each bigram's log-prob is
quantized to integer micro-nats (``round(ln(p)·1e6)``) *before* any
aggregation, so per-document sums are exact integer arithmetic —
order-independent under any shuffle/partitioning. The ``ln`` argument is
a ratio of exact integers (counts), identical as an IEEE double in every
engine; libm ``ln`` parity between the JVM and DuckDB is the same
empirical contract the geodesy suite (sin/cos/atan2) already
hash-verifies. Outputs are integers (total and per-token micro-nats via
integer division) — zero floating point leaves the operator.

Scale: training is two map-side-combined groupBys over the token
stream. Scoring joins the document bigram stream to the model on
(w1, w2) — a plain equi-join whose shuffle carries (doc_id, w1, w2);
Zipfian hot bigrams ("of the") are ordinary hash-join skew, split by
AQE like any other. For a bounded model (top-K pruned vocab) the join
side collapses to a broadcast and scoring becomes map-only — the knob a
100 TB run would turn.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokens_lower",
    "train_bigram_lm",
    "bigram_nll",
    "perplexity_buckets",
    "pmi_collocations",
]

_SCALE = 1_000_000  # micro-nats


def tokens_lower(col) -> Column:
    """Lowercase alnum-word tokens (empty strings dropped) — the same
    tokenization the TF-IDF and dedup oracles replay in DuckDB as
    ``list_filter(regexp_split_to_array(lower(text),'[^a-z0-9]+'), ...)``."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda t: t != "")


def _spread_docs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, <text_col>) with the input-split parallelism guard applied
    ONCE — callers that feed several token/bigram streams off the same
    corpus share this frame so each query plan carries a single spread
    exchange (identical subplans also collapse to a ReusedExchange)
    and a single partition-count probe."""
    from geomesa_hive_spark.pipeline.text import spread_parallelism

    return spread_parallelism(
        docs.select(F.col(id_col).alias("id"), F.col(text_col)), "id"
    )


def _bigram_pairs(spread: DataFrame, text_col: str) -> DataFrame:
    """(id, w1, w2) from a :func:`_spread_docs` frame — one row per
    consecutive token pair per document."""
    toks = tokens_lower(text_col)
    n = F.size(toks)
    zipped = F.when(
        n >= 2, F.arrays_zip(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1))
    ).otherwise(F.array())
    return (
        spread.select(F.col("id"), F.explode(zipped).alias("bg"))
        .select("id", F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2"))
    )


def _bigram_stream(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per consecutive token pair per document.

    The tokenize + zip + explode is map-stage CPU projected BEFORE any
    shuffle, so it inherits the INPUT's split count — one core for a
    small parquet (the round-13 single-split problem); spread first
    (a no-op when the input already carries splits >= cores)."""
    return _bigram_pairs(_spread_docs(docs, id_col, text_col), text_col)


def train_bigram_lm(
    docs: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame, int]:
    """(unigram counts (w, c1), bigram counts (w1, w2, c2), vocab size).

    Two shuffles total (token groupBy, bigram groupBy), both map-side
    combined. The vocab size is the one scalar collected (bounded)."""
    spread = _spread_docs(docs, id_col, text_col)
    toks = spread.select(F.explode(tokens_lower(text_col)).alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").alias("c1"))
    bi = (
        _bigram_pairs(spread, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )
    vocab = uni.count()
    return uni, bi, int(vocab)


def bigram_nll(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    uni: DataFrame,
    bi: DataFrame,
    vocab: int,
) -> DataFrame:
    """Per-document add-one-smoothed bigram NLL in integer micro-nats:
    (id, n_bg, nll_q, avg_q) where
    ``nll_q = -Σ round(ln((c2+1)/(c1+V))·1e6)`` and ``avg_q = nll_q DIV
    n_bg`` (per-token micro-nats — the CCNet filter signal; lower is
    more fluent). Documents with < 2 tokens score (0, 0, 0).

    Unseen bigrams back off to the add-one floor 1/(c1+V); an unseen
    *history* (held-out scoring) backs off to the uniform 1/V."""
    stream = _bigram_stream(docs, id_col, text_col)
    j = (
        stream.join(bi, ["w1", "w2"], "left")
        .join(uni.select(F.col("w").alias("w1"), "c1"), "w1", "left")
    )
    lp = F.expr(
        f"CAST(round(ln((coalesce(c2, 0) + 1.0) / (coalesce(c1, 0) + {int(vocab)}))"
        f" * {_SCALE}.0) AS BIGINT)"
    )
    per_doc = (
        j.select("id", lp.alias("lp"))
        .groupBy("id")
        .agg(F.count("*").alias("n_bg"), (-F.sum("lp")).alias("nll_q"))
        .withColumn("avg_q", F.expr("nll_q DIV n_bg"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_bg", F.lit(0)).cast("long").alias("n_bg"),
            F.coalesce("nll_q", F.lit(0)).cast("long").alias("nll_q"),
            F.coalesce("avg_q", F.lit(0)).cast("long").alias("avg_q"),
        )
    )


def perplexity_buckets(
    scored: DataFrame,
    score_col: str = "avg_q",
    cuts: tuple = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style perplexity partition (Wenzek et al. 2020 — the
    head/middle/tail split CCNet applies to per-token LM scores before
    sampling pretraining data): cutoffs are the corpus percentiles at
    ``cuts`` of ``score_col`` (the integer micro-nat ``avg_q`` from
    :func:`bigram_nll`; perplexity is monotone in it, so bucketing the
    score IS bucketing perplexity), and every row gains a ``bucket``
    label. Two-stage, no global sort: ONE aggregate computes the
    cutoff row, which broadcast-joins back onto the corpus — at 100 TB
    the only extra shuffle is the one-row percentile agg, not an
    ntile() window over a single partition. Cutoffs are floor()ed to
    integers so the bucket boundary cannot wobble on cross-engine
    percentile-interpolation rounding (scores are integers; a
    boundary flip would need two engines to disagree by >= 1.0 on the
    same interpolated value)."""
    if len(labels) != len(cuts) + 1:
        raise ValueError("need exactly one more label than cuts")
    cs = scored.agg(
        *[
            F.floor(F.expr(f"percentile({score_col}, {p!r})"))
            .cast("long")
            .alias(f"_c{i}")
            for i, p in enumerate(cuts)
        ]
    )
    out = scored.join(F.broadcast(cs))
    b = None
    for i, lab in enumerate(labels[:-1]):
        cond = F.col(score_col) <= F.col(f"_c{i}")
        b = F.when(cond, F.lit(lab)) if b is None else b.when(cond, F.lit(lab))
    b = b.otherwise(F.lit(labels[-1]))
    return out.withColumn("bucket", b).drop(*[f"_c{i}" for i in range(len(cuts))])


def pmi_collocations(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information — the
    corpus-statistics pass behind tokenizer/vocab merges and phrase
    mining: ``PMI(w1,w2) = ln( p(w1,w2) / (p(w1)·p(w2)) )`` with
    bigram probability over the bigram total B and unigram
    probabilities over the token total T.

    Exactness discipline: counts are BIGINT; T and B are the only two
    collected scalars (1-row aggregates, bounded); the probability
    ratio is built with a FIXED double operation order
    ``(c2/B) / ((c1a/T)·(c1b/T))`` replayed identically in the oracle,
    and the PMI is quantized to integer micro-nats
    (``round(ln(ratio)·1e6)`` — the lm.py micro-nat convention, which
    absorbs the 1-ulp cross-libm ln wiggle like profile.psi_report).
    ``min_count`` cuts hapax pairs (PMI's classic pathology: a 1-count
    pair of two 1-count words maximizes the ratio); ordering is
    (pmi_micro DESC, w1, w2) — fully deterministic.

    Scale shape: two map-side-combined groupBys (tokens, bigrams), two
    vocab-sized joins to attach unigram counts, one top-k. No
    all-pairs anything — only OBSERVED bigrams are scored."""
    spread = _spread_docs(docs, id_col, text_col)
    toks = spread.select(F.explode(tokens_lower(text_col)).alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").cast("long").alias("c1"))
    bi = (
        _bigram_pairs(spread, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c2"))
    )
    T = int(uni.agg(F.sum("c1")).collect()[0][0] or 0)
    B = int(bi.agg(F.sum("c2")).collect()[0][0] or 0)
    if T == 0 or B == 0:
        return bi.select(
            "w1", "w2", "c2", F.lit(None).cast("long").alias("pmi_micro")
        ).limit(0)
    cand = (
        bi.filter(F.col("c2") >= int(min_count))
        .join(uni.select(F.col("w").alias("w1"),
                         F.col("c1").alias("c1a")), "w1")
        .join(uni.select(F.col("w").alias("w2"),
                         F.col("c1").alias("c1b")), "w2")
    )
    ratio = (
        (F.col("c2").cast("double") / F.lit(float(B)))
        / ((F.col("c1a").cast("double") / F.lit(float(T)))
           * (F.col("c1b").cast("double") / F.lit(float(T))))
    )
    return (
        cand.withColumn(
            "pmi_micro",
            F.round(F.log(ratio) * F.lit(1000000.0)).cast("long"),
        )
        .select("w1", "w2", "c2", "pmi_micro")
        .orderBy(F.col("pmi_micro").desc(), "w1", "w2")
        .limit(int(top_k))
    )
