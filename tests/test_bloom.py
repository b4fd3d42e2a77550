"""Bloom membership: no false negatives ever, FP rate near theory."""

import math

from pyspark.sql import functions as F

from geomesa_hive_spark.pipeline.bloom import bloom_build, bloom_probe


def test_no_false_negatives_and_fp_rate(spark):
    n, m, k = 400, 1 << 12, 4
    corpus = spark.range(n).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("val")
    )
    bitmap = bloom_build(corpus, "val", k=k, m_bits=m)
    # every word is a 32-bit mask in a BIGINT
    stats = bitmap.agg(F.min("word"), F.max("word")).collect()[0]
    assert 0 < stats[1] < (1 << 32) and stats[0] > 0

    # members: all corpus values MUST hit (Bloom guarantee)
    got = bloom_probe(
        corpus.select(F.col("val").alias("id"), "val"), "id", "val", bitmap,
        k=k, m_bits=m,
    )
    assert got.filter(F.col("bloom_member") == 0).count() == 0

    # non-members: FP rate should be near (1 - e^(-kn/m))^k
    others = spark.range(2000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("val")
    )
    fp = (
        bloom_probe(
            others.select(F.col("val").alias("id"), "val"), "id", "val", bitmap,
            k=k, m_bits=m,
        )
        .agg(F.sum("bloom_member"))
        .collect()[0][0]
    )
    expect = (1 - math.exp(-k * n / m)) ** k
    assert fp / 2000 < max(4 * expect, 0.02)


def test_bitmap_is_sparse_and_bounded(spark):
    corpus = spark.range(50).select(F.col("id").cast("string").alias("val"))
    bm = bloom_build(corpus, "val", k=4, m_bits=1 << 14)
    assert bm.count() <= (1 << 14) // 32
    assert bm.count() <= 50 * 4  # at most one word per set bit
