"""Bloom-filter membership for incremental corpus dedup.

The operational shape a 100 TB pipeline actually uses: the existing
corpus is summarized ONCE into an m-bit Bloom bitmap (a parquet table of
non-zero 32-bit words — at most m/32 rows, i.e. kilobytes-to-megabytes
for billions of documents), and every new crawl probes that bitmap with
a broadcast join — the corpus itself is never re-read and never crosses
a shuffle again. "Definitely new" documents pass; "possibly seen" ones
(bounded false-positive rate (1-e^(-kn/m))^k) go to the exact/MinHash
stages, which now see a tiny fraction of the crawl.

Everything is portable integer arithmetic so the DuckDB oracle replays
the bitmap bit-for-bit: positions come from md5 substrings (the same
unit-hash family as ``sampling.py``), words are 32-bit masks held in
BIGINTs (shift <= 31 — no signed-overflow divergence between engines),
and the bitmap is a ``bit_or`` aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_positions", "bloom_build", "bloom_probe"]


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def bloom_positions(col, k: int, m_bits: int, seed: int = 42) -> Column:
    """Array of k bit positions in [0, m_bits) for a value: position j =
    first 60 bits of md5('bloom:seed:j:value') mod m. Same construction
    as sampling.unit_hash — replayable as plain SQL in any engine."""
    v = _c(col).cast("string")
    return F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit("bloom"), F.lit(str(seed)), F.lit(str(j)), v)),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("bigint")
            .__mod__(F.lit(int(m_bits)))
            for j in range(int(k))
        ]
    )


def bloom_build(
    df: DataFrame,
    value_col,
    k: int = 4,
    m_bits: int = 1 << 14,
    seed: int = 42,
) -> DataFrame:
    """Sparse Bloom bitmap over the column: (word_idx, word) rows, 32
    bits per word, only non-zero words. One explode (xk) + one
    map-side-combined bit_or groupBy over the corpus — the output is at
    most m/32 rows regardless of corpus size."""
    pos = df.select(
        F.explode(bloom_positions(value_col, k=k, m_bits=m_bits, seed=seed)).alias("p")
    )
    return (
        pos.selectExpr(
            "CAST(p DIV 32 AS BIGINT) AS word_idx",
            "shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT)) AS m",
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(m)").alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    id_col: str,
    value_col,
    bitmap: DataFrame,
    k: int = 4,
    m_bits: int = 1 << 14,
    seed: int = 42,
) -> DataFrame:
    """(id, bloom_member) for every row: 1 iff ALL k probe bits are set
    — "possibly seen"; 0 is a Bloom guarantee of "definitely new". The
    bitmap side is tiny (<= m/32 rows) and broadcast: probing a 100 TB
    crawl is map-side only, no shuffle of the crawl."""
    probes = df.select(
        F.col(id_col).alias("id"),
        F.explode(bloom_positions(value_col, k=k, m_bits=m_bits, seed=seed)).alias("p"),
    ).selectExpr(
        "id",
        "CAST(p DIV 32 AS BIGINT) AS word_idx",
        "shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT)) AS m",
    )
    joined = probes.join(F.broadcast(bitmap), "word_idx", "left")
    hit = (
        F.when(
            F.col("word").isNotNull()
            & (F.col("word").bitwiseAND(F.col("m")) == F.col("m")),
            1,
        )
        .otherwise(0)
    )
    return (
        joined.select("id", hit.alias("h"))
        .groupBy("id")
        .agg(F.min("h").cast("int").alias("bloom_member"))
    )
