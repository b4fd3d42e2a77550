"""Distributed BPE (byte-pair-encoding) tokenizer: training and
encoding as native Spark plans.

The core trick that keeps everything JVM-side AND SQL-replayable is the
DOUBLE-SPACE token string: a word's token sequence is stored as
``"␣␣t1␣␣t2␣␣…␣␣tn␣␣"`` (two spaces between tokens and at both ends).
Applying merge (a, b) is then exactly

    replace(s, ' a  b ', ' ab ')

— the pattern consumes ONE space from each boundary and the replacement
restores it, so consecutive matches regenerate each other's context and
left-to-right non-overlapping ``replace`` is provably equivalent to the
standard greedy BPE fold (including 'aaa' → [aa, a] and 'abab' →
[ab, ab]). No per-row Python, no array folds — one ``replace`` per
merge, whole-stage codegen, and a DuckDB oracle can replay the exact
same string operations.

Training (:func:`train_bpe`) is the classic frequency-table loop:

1. corpus → (word, freq) — ONE shuffle over the corpus; every later
   round touches only this vocab-sized table (≪ corpus).
2. per round: adjacent-pair counts weighted by word freq (one groupBy
   over ~Σ|word| rows), pick the max pair with a deterministic
   (count DESC, pair ASC) tie-break, collect that ONE row, and apply
   the merge with a native replace. O(n_merges) small jobs, exactly
   the broadcast-Lloyd shape k-means uses.

Encoding (:func:`bpe_encode`) applies the learned merges in rank order
as a chain of replaces — map-only over the corpus, no shuffle.

Tie-break note: ties on pair count are broken lexicographically
((count DESC, left ASC, right ASC)), not by insertion order as in some
reference implementations — determinism across engines is the property
the oracle needs; the merge QUALITY is equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_freqs", "to_token_string", "train_bpe", "bpe_encode"]

#: end-of-word marker (kept out of the merge alphabet: words are
#: lowercased [a-z0-9]+ so '</w>' can never collide with a char token)
EOW = "</w>"


def word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the lowercased [a-z0-9]+ words of the corpus —
    the one corpus-wide shuffle of BPE training."""
    from geomesa_hive_spark.pipeline.text import spread_parallelism

    # the lower+split+explode map stage runs pre-shuffle on the raw
    # input's split count (one core for a single-file local parquet —
    # the round-13 single-split problem); spread on the text itself
    # since this surface has no id column. No-op at production scale.
    df = spread_parallelism(df.select(F.col(text_col)), text_col)
    return (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def to_token_string(word_col) -> "F.Column":
    """Initial double-space token string of a word: each char a token,
    plus the end-of-word marker. 'ab' → '  a  b  </w>  '."""
    core = F.regexp_replace(word_col, "(.)", " $1 ")
    return F.concat(F.lit(" "), core, F.lit(f" {EOW}  "))


def _toks_array(s_col) -> "F.Column":
    """Token array from a double-space token string."""
    return F.filter(F.split(s_col, " +"), lambda t: t != "")


def _pair_counts(words: DataFrame) -> DataFrame:
    """Freq-weighted adjacent-pair counts over the token strings."""
    toks = words.select("freq", _toks_array(F.col("s")).alias("t"))
    # guard: Spark's sequence(1, 0) is DESCENDING, so a fully-merged
    # single-token word would fabricate a (t[0], null) pair
    toks = toks.filter(F.size("t") >= 2)
    pairs = toks.select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(t[i - 1] AS a, t[i] AS b))"
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    ).agg(F.sum("freq").alias("cnt"))


def _merge_expr(s_col, a: str, b: str) -> "F.Column":
    return F.replace(
        s_col, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")
    )


def train_bpe(
    df: DataFrame, text_col: str, n_merges: int, min_count: int = 2,
    batch: int = 1,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    [(left, right, pair_count), …] in merge order. Stops early when the
    best pair's weighted count drops below ``min_count``.

    ``batch=1`` is EXACT classic BPE: each round collects the single
    argmax pair — the same bounded-scalar pattern as k-means' centroid
    collect. The corpus is touched once (word_freqs); every round runs
    on the vocab-sized frequency table; merge application is a native
    replace.

    ``batch=m`` divides the driver-round count by up to m — the real
    ceiling for a 30k-merge vocab is sequential Spark-job latency, not
    data size. Per round the top pairs are collected (a bounded ~4m-row
    collect) and up to m MUTUALLY TOKEN-DISJOINT pairs are greedily
    selected in (count DESC, a ASC, b ASC) order, then applied in one
    chained-replace pass. Disjointness makes the batch exact in the
    following sense: applying merge (a, b) only destroys/creates
    adjacencies that involve a, b, or the new token ab, so the counts of
    token-disjoint pairs are invariant under it — each selected pair's
    recorded count is its true count at application time, and the
    application order within a round is immaterial. The sequence can
    still differ from classic BPE when a merge CREATES a pair (x, ab)
    that would have out-ranked the round's later picks — the standard,
    documented batched-BPE trade (vocab quality equivalent in practice;
    the contract/oracle config stays batch=1)."""
    if batch < 1:
        raise ValueError(f"batch must be >= 1 (got {batch})")
    words = word_freqs(df, text_col).withColumn(
        "s", to_token_string(F.col("word"))
    )
    # vocab-sized working set, materialized with the lineage CUT each
    # round: a cache alone keeps the full logical plan, which grows by a
    # nested replace-chain per round — observed OOMing the driver on plan
    # stringification at ~30 rounds, far below a real vocab's merge count
    words = words.select("freq", "s").localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    try:
        while len(merges) < n_merges:
            m = min(batch, n_merges - len(merges))
            top = (
                _pair_counts(words)
                .filter(F.col("cnt") >= min_count)
                .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .limit(4 * m)
                .collect()
            )
            if not top:
                break
            # greedy disjoint selection over the deterministic ordering:
            # no token may appear in two selected pairs (a shared token
            # would make application order observable)
            used: set[str] = set()
            picked: list[tuple[str, str, int]] = []
            for r in top:
                if len(picked) >= m:
                    break
                if r.a in used or r.b in used:
                    continue
                picked.append((r.a, r.b, int(r.cnt)))
                used.update((r.a, r.b))
            merges.extend(picked)
            s = F.col("s")
            for a, b, _ in picked:
                s = _merge_expr(s, a, b)
            words = words.select("freq", s.alias("s")).localCheckpoint()
    finally:
        words.unpersist()
    return merges


def bpe_encode(
    df: DataFrame, text_col: str, id_col: str,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
) -> DataFrame:
    """Tokenize each document with a learned merge list: words to char
    token strings, merges applied in rank order (chained native
    replaces — map-only, no shuffle), then per-document token
    concatenation. Adds ``tokens`` (array<string>, in document order)
    and ``n_tokens``."""
    w = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
        ).alias("pos", "word"),
    ).filter(F.col("word") != "")
    s = to_token_string(F.col("word"))
    for m in merges:
        s = _merge_expr(s, m[0], m[1])
    toked = w.select(id_col, "pos", _toks_array(s).alias("t"))
    return (
        toked.groupBy(id_col)
        .agg(
            F.expr(
                "flatten(transform(array_sort(collect_list(struct(pos, t))),"
                " x -> x.t))"
            ).alias("tokens")
        )
        .withColumn("n_tokens", F.size("tokens"))
    )
