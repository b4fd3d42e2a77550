"""Record linkage: FastSS blocking completeness vs brute force."""

import numpy as np
import pandas as pd

from geomesa_hive_spark.pipeline.entity import deletion_variants, link_records


def _lev(a, b):
    m, n = len(a), len(b)
    d = np.arange(n + 1)
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            cur = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev, d[j] = d[j], cur
    return int(d[n])


def _rand_words(rng, n):
    out = []
    for _ in range(n):
        L = rng.integers(3, 9)
        out.append("".join(chr(97 + c) for c in rng.integers(0, 5, L)))
    return out


def test_link_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    an = _rand_words(rng, 120)
    # B: half are mutations of A entries (sub/del/ins), half random
    bn = []
    for i in range(120):
        if i % 2 == 0:
            s = list(an[i])
            op = i % 6
            p = int(rng.integers(0, len(s)))
            if op == 0:
                s[p] = "z"
            elif op == 2:
                s.pop(p)
            else:
                s.insert(p, "q")
            bn.append("".join(s))
        else:
            bn.append(_rand_words(rng, 1)[0])
    a = spark.createDataFrame(pd.DataFrame({"a_id": range(120), "an": an}))
    b = spark.createDataFrame(pd.DataFrame({"b_id": range(120), "bn": bn}))
    got = {r.b_id: (r.a_id, r.dist) for r in
           link_records(a, b, "a_id", "an", "b_id", "bn").collect()}

    want = {}
    for bi, bs in enumerate(bn):
        best = None
        for ai, s in enumerate(an):
            d = _lev(bs, s)
            if d <= 1 and (best is None or (d, ai) < best):
                best = (d, ai)
        if best is not None:
            want[bi] = (best[1], best[0])
    assert got == want
    assert len(want) >= 50  # the mutated half links back


def test_deletion_variants_shape(spark):
    df = spark.createDataFrame([("abc",), ("",)], "s STRING")
    rows = df.select(deletion_variants("s").alias("v")).collect()
    assert rows[0].v == ["abc", "bc", "ac", "ab"]
    assert rows[1].v == [""]
