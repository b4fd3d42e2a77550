"""Bigram LM scoring: hand-computed NLL, edge docs, held-out backoff."""

import math

from geomesa_hive_spark.pipeline import lm


def test_bigram_nll_hand_computed(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a a"), (2, "c"), (3, "")],
        "id INT, text STRING",
    )
    uni, bi, vocab = lm.train_bigram_lm(docs, "id", "text")
    assert vocab == 3  # {a, b, c}
    uc = {r.w: r.c1 for r in uni.collect()}
    assert uc == {"a": 4, "b": 2, "c": 1}
    bc = {(r.w1, r.w2): r.c2 for r in bi.collect()}
    assert bc == {("a", "b"): 2, ("b", "a"): 1, ("a", "a"): 1}

    out = {r.id: (r.n_bg, r.nll_q, r.avg_q)
           for r in lm.bigram_nll(docs, "id", "text", uni, bi, vocab).collect()}

    def lp(c2, c1):
        return round(math.log((c2 + 1.0) / (c1 + 3)) * 1_000_000)

    # doc 0: bigrams ab, ba, ab
    want0 = -(lp(2, 4) + lp(1, 2) + lp(2, 4))
    assert out[0] == (3, want0, want0 // 3)
    # doc 1: one bigram aa
    want1 = -lp(1, 4)
    assert out[1] == (1, want1, want1)
    # docs with < 2 tokens score zeros
    assert out[2] == (0, 0, 0)
    assert out[3] == (0, 0, 0)


def test_heldout_unseen_history_backoff(spark):
    train = spark.createDataFrame([(0, "a b a b")], "id INT, text STRING")
    uni, bi, vocab = lm.train_bigram_lm(train, "id", "text")
    assert vocab == 2
    held = spark.createDataFrame([(9, "z q")], "id INT, text STRING")
    out = lm.bigram_nll(held, "id", "text", uni, bi, vocab).collect()[0]
    # unseen history: c1=0, c2=0 -> p = 1/V
    want = -round(math.log(1.0 / 2) * 1_000_000)
    assert (out.n_bg, out.nll_q) == (1, want)


def test_fluent_scores_below_scrambled(spark):
    # repetition of a trained pattern scores lower NLL than rare pairs
    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows.append((100, "mat the on cat the sat"))
    docs = spark.createDataFrame(rows, "id INT, text STRING")
    uni, bi, vocab = lm.train_bigram_lm(docs, "id", "text")
    out = {r.id: r.avg_q
           for r in lm.bigram_nll(docs, "id", "text", uni, bi, vocab).collect()}
    assert out[0] < out[100]
