"""Sequence packing for LLM training pipelines: assign documents to
fixed-token-budget training sequences.

Two semantics, matching the two layouts real pipelines use:

- :func:`chunk_pack` — GPT-style concat-then-chunk: documents are
  concatenated in a deterministic per-shard order and the token stream
  is cut every ``budget`` tokens; a document may span a chunk boundary.
  This is a closed-form computation (exclusive running sum + integer
  division), so it is fully native — one window over (shard, order),
  zero Python.

- :func:`greedy_pack` — no-split first-fit-in-order: each document
  lands wholly in one sequence; a new sequence starts when the current
  one cannot fit the next document. The recurrence (current fill
  depends on every prior placement) has no closed form, so this is the
  documented ``applyInPandas`` custom-operator path: one shuffle by
  shard, then a sequential pass per shard.

Scale (100 TB): both operators shuffle ONCE, by ``shard_col``. Packing
is inherently order-sequential, so the parallelism unit is the shard:
pick the shard count so one shard's metadata (id + token count, ~16
bytes/doc — never the text) fits an executor; 10k shards over 100 TB of
documents is ~10M docs/shard ≈ 160 MB of packing state. Per-shard
results are independent, and sequence ids are (shard, local_seq) pairs
so no cross-shard coordination exists. The greedy pass is O(docs) per
shard in pandas; the chunk path stays entirely in Tungsten.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["chunk_pack", "greedy_pack", "pack_utilization"]


def chunk_pack(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    shard_col: str | None = None,
) -> DataFrame:
    """Concat-then-chunk packing (documents may split across sequence
    boundaries). Adds ``tok_start`` (exclusive running token sum within
    the shard), ``first_seq``/``last_seq`` (the budget-sized chunks this
    document's tokens land in) and ``n_seqs`` (how many chunks it
    touches; 0 for zero-token documents).

    ``order_col`` must be unique within a shard for deterministic
    output. Without ``shard_col`` the window is global — correct, but a
    single-reducer sort; always shard at scale."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = (
        Window.partitionBy(shard_col) if shard_col else Window.partitionBy()
    ).orderBy(order_col)
    start = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("long")
    out = df.withColumn("tok_start", start)
    b = str(int(budget))
    tok = F.col(token_col).cast("long")
    out = (
        out.withColumn("first_seq", F.expr(f"tok_start DIV {b}"))
        .withColumn(
            "last_seq",
            F.when(tok > 0, F.expr(f"(tok_start + {token_col} - 1) DIV {b}"))
            .otherwise(F.expr(f"tok_start DIV {b}")),
        )
        .withColumn(
            "n_seqs",
            F.when(tok > 0, F.col("last_seq") - F.col("first_seq") + 1)
            .otherwise(F.lit(0))
            .cast("int"),
        )
    )
    return out


def greedy_pack(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    shard_col: str,
) -> DataFrame:
    """First-fit-in-order packing without splitting: walk the shard's
    documents in ``order_col`` order, start a new sequence whenever the
    current fill plus the next document exceeds ``budget``. Documents
    larger than the budget occupy a sequence alone (and still force the
    next document into a fresh sequence). Adds ``seq_bin`` (0-based
    within the shard) and ``seq_fill`` (the sequence's running fill
    after placing this document).

    Sequential recurrence → ``applyInPandas`` per shard; see the module
    docstring for the 100 TB argument."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("seq_bin", T.LongType()),
            T.StructField("seq_fill", T.LongType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        bins, fills = [], []
        cur_bin, fill = -1, 0
        for tok in pdf[token_col].astype("int64"):
            if cur_bin < 0 or fill + tok > budget:
                cur_bin += 1
                fill = int(tok)
            else:
                fill += int(tok)
            bins.append(cur_bin)
            fills.append(fill)
        pdf["seq_bin"] = pd.array(bins, dtype="int64")
        pdf["seq_fill"] = pd.array(fills, dtype="int64")
        return pdf

    return df.repartition(shard_col).groupBy(shard_col).applyInPandas(pack, schema)


def pack_utilization(
    packed: DataFrame, token_col: str, budget: int, shard_col: str
) -> DataFrame:
    """Packing-efficiency report over :func:`greedy_pack` output: per
    shard, the sequence count and the fraction of the token budget
    actually filled (1.0 = perfect packing). Native aggregation."""
    return (
        packed.groupBy(shard_col)
        .agg(
            (F.max("seq_bin") + 1).alias("n_seqs"),
            F.sum(F.col(token_col).cast("long")).alias("total_tokens"),
        )
        .withColumn(
            "utilization",
            F.col("total_tokens") / (F.col("n_seqs") * F.lit(int(budget))),
        )
    )
