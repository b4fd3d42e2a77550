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


def test_phonetic_code_values(spark):
    from pyspark.sql import functions as F

    from geomesa_hive_spark.pipeline.entity import phonetic_code

    cases = [
        ("Robert", "R163"),
        ("Rupert", "R163"),       # the classic pair
        ("smith", "S530"),
        ("smyth", "S530"),        # y ~ vowel
        ("blue bolt", "B414"),    # space stripped
        ("a", "A000"),
        ("", None),
        ("123", None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "s STRING")
    got = [r.c for r in df.select(phonetic_code("s").alias("c")).collect()]
    assert got == [c for _, c in cases]


def test_link_phonetic_beats_fastss_bound(spark):
    """Vowel substitution + vowel append = edit distance 2: FastSS k=1
    blocking provably cannot pair these, phonetic blocking still links
    every record to its clean source."""
    from pyspark.sql import functions as F

    from geomesa_hive_spark.pipeline.entity import link_phonetic, link_records

    names = ["goldenrod gear", "lavender bolt", "crimson widget",
             "plum gizmo", "turquoise ring"]
    a = spark.createDataFrame(list(enumerate(names)), "a_id LONG, an STRING")
    dirty = [n.replace("o", "a", 1) + "o" for n in names]
    b = spark.createDataFrame(list(enumerate(dirty)), "b_id LONG, bn STRING")

    got = {r.b_id: (r.a_id, r.dist) for r in
           link_phonetic(a, b, "a_id", "an", "b_id", "bn", 2)[0].collect()}
    assert {k: v[0] for k, v in got.items()} == {i: i for i in range(len(names))}
    assert all(1 <= d <= 2 for _, d in got.values())
    # at least one pair is genuinely distance 2 (the FastSS-impossible case)
    assert any(d == 2 for _, d in got.values())

    # FastSS k=1 finds only the pairs that degenerate to distance 1
    k1 = {r.b_id for r in link_records(a, b, "a_id", "an", "b_id", "bn").collect()}
    d2 = {bid for bid, (_, d) in got.items() if d == 2}
    assert k1.isdisjoint(d2) and d2


def test_block_shards_invariant(spark):
    """Salting is a pure physical rewrite: every shard count produces
    the identical linkage, including under a hot blocking key (many
    records sharing one surname/code — the join-output-skew case the
    salt exists for)."""
    from geomesa_hive_spark.pipeline.entity import link_phonetic

    # 40 A x 40 B records share the code of 'smith'; 20 clean pairs too
    hot_a = [(i, f"smith") for i in range(40)]
    hot_b = [(i, f"smyth") for i in range(40)]
    clean_a = [(100 + i, f"uniq{chr(97+i)}word{i}") for i in range(20)]
    clean_b = [(100 + i, f"uniq{chr(97+i)}word{i}x") for i in range(20)]
    a = spark.createDataFrame(hot_a + clean_a, "a_id LONG, an STRING")
    b = spark.createDataFrame(hot_b + clean_b, "b_id LONG, bn STRING")

    base = sorted(
        (r.b_id, r.a_id, r.dist)
        for r in link_phonetic(
            a, b, "a_id", "an", "b_id", "bn", 2)[0].collect()
    )
    assert len(base) == 60  # every B record links
    for s in (2, 8):
        salted = sorted(
            (r.b_id, r.a_id, r.dist)
            for r in link_phonetic(
                a, b, "a_id", "an", "b_id", "bn", 2, block_shards=s
            )[0].collect()
        )
        assert salted == base

    got1 = sorted(
        (r.b_id, r.a_id, r.dist)
        for r in link_records(a, b, "a_id", "an", "b_id", "bn").collect()
    )
    got4 = sorted(
        (r.b_id, r.a_id, r.dist)
        for r in link_records(
            a, b, "a_id", "an", "b_id", "bn", block_shards=4
        ).collect()
    )
    assert got4 == got1 and len(got1) >= 40  # smith<->smyth is distance 1


def test_link_phonetic_max_block_size_cap(spark):
    """max_block_size degrades recall EXPLICITLY: below the cap the
    linkage is identical to uncapped (plus an empty drop report); above
    it the hot block's matches vanish and the dropped report names the
    code with its A-side count — never a silent cut."""
    from geomesa_hive_spark.pipeline.entity import link_phonetic, phonetic_code

    hot_a = [(i, "smith") for i in range(40)]
    hot_b = [(i, "smyth") for i in range(40)]
    clean_a = [(100 + i, f"uniq{chr(97+i)}word{i}") for i in range(20)]
    clean_b = [(100 + i, f"uniq{chr(97+i)}word{i}x") for i in range(20)]
    a = spark.createDataFrame(hot_a + clean_a, "a_id LONG, an STRING")
    b = spark.createDataFrame(hot_b + clean_b, "b_id LONG, bn STRING")

    base_m, base_d = link_phonetic(
        a, b, "a_id", "an", "b_id", "bn", 2, max_block_size=None)
    base = sorted((r.b_id, r.a_id, r.dist) for r in base_m.collect())
    assert base_d.count() == 0  # uncapped: empty report, pair shape kept
    # the DEFAULT cap (1000, round-11) is far above these blocks:
    # identical output to uncapped
    dm, dd = link_phonetic(a, b, "a_id", "an", "b_id", "bn", 2)
    assert sorted((r.b_id, r.a_id, r.dist) for r in dm.collect()) == base
    assert dd.count() == 0
    # cap above every block size: identical output, empty report
    m, d = link_phonetic(
        a, b, "a_id", "an", "b_id", "bn", 2, max_block_size=40
    )
    assert sorted((r.b_id, r.a_id, r.dist) for r in m.collect()) == base
    assert d.count() == 0
    # cap below the hot blocks: 'smith' (40 A rows) and the colliding
    # clean code U526 (12 A rows) both drop; every dropped block is
    # NAMED in the report with its exact A-side count
    m2, d2 = link_phonetic(
        a, b, "a_id", "an", "b_id", "bn", 2, max_block_size=10
    )
    got2 = sorted((r.b_id, r.a_id, r.dist) for r in m2.collect())
    smith_code = spark.createDataFrame([("smith",)], "s STRING").select(
        phonetic_code("s").alias("c")
    ).collect()[0].c
    assert {(r.code, r.a_count) for r in d2.collect()} == {
        (smith_code, 40), ("U526", 12)
    }
    surviving = {101, 103, 105, 111, 112, 113, 115, 119}  # not smith/U526
    assert got2 == [t for t in base if t[0] in surviving]
    assert len(got2) == 8
    import pytest as _pytest
    with _pytest.raises(ValueError):
        link_phonetic(a, b, "a_id", "an", "b_id", "bn", 2, max_block_size=0)


def test_link_records_max_block_size_cap(spark):
    """round 8 (motivated by the scale-slope m-big incident): a
    registry where many records share ONE name does m² verification
    work under that name's variants; max_block_size drops hot variants
    EXPLICITLY — cold-name matches are bit-identical to the uncapped
    run, hot-name records match nothing, and the dropped frame is the
    auditable record. Cap=0 raises."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from geomesa_hive_spark.pipeline.entity import link_records

    # 60 records named 'commonname' + 40 distinct names
    rows = [(i, "commonname") for i in range(60)]
    rows += [(100 + i, f"name{i:03d}x") for i in range(40)]
    a = spark.createDataFrame(rows, "a_id long, an string")
    # B: same registry with a 1-char deletion on the distinct names
    b = spark.createDataFrame(
        [(i, "commonname") for i in range(60)]
        + [(100 + i, f"name{i:03d}") for i in range(40)],
        "b_id long, bn string",
    )
    base = sorted(
        tuple(r) for r in
        link_records(a, b, "a_id", "an", "b_id", "bn").collect()
    )
    capped, dropped = link_records(
        a, b, "a_id", "an", "b_id", "bn", max_block_size=30
    )
    got = sorted(tuple(r) for r in capped.collect())
    dr = {r.variant: r.a_count for r in dropped.collect()}
    # every dropped variant really was hot (the common name's variants)
    assert dr and all(c > 30 for c in dr.values())
    assert all("commonname".startswith(v[:4]) or "ommon" in v or v == "commonname"
               or len(v) == len("commonname") - 1 for v in dr)
    # cold-name matches identical to uncapped; hot-name records gone
    cold = [t for t in base if t[0] >= 100]
    assert [t for t in got if t[0] >= 100] == cold and len(cold) == 40
    assert all(t[0] >= 100 for t in got)
    with _pytest.raises(ValueError):
        link_records(a, b, "a_id", "an", "b_id", "bn", max_block_size=0)
