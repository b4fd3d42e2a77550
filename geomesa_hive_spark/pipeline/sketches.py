"""Count-min sketch over a key column — sublinear-memory frequency
estimation for heavy-hitter / vocabulary workloads.

Why a pipeline needs it: exact token/url/ngram counting at 100 TB
produces a result as large as the distinct-key space (billions of
rows); a count-min sketch is a FIXED (depth x width) integer table —
kilobytes — with the classic one-sided guarantee
``true <= est <= true + (e/width)·N`` w.p. ``1 - e^-depth`` per query.
The sketch composes: tables built on different shards merge by cell-
wise addition (it's just a sum aggregation), which is what makes it a
streaming/partitioned-friendly counter.

Determinism: cell positions come from md5 substrings (the portable
unit-hash family used across the repo), counts are integer sums, and
estimation is an integer ``min`` over depth cells — every step replays
exactly in SQL, so the contract hash covers the sketch itself, not
just its outputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "countmin_positions", "countmin_build", "countmin_estimate",
    "hll_build", "hll_merge", "hll_estimate", "hll_estimate_py",
]


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch (Flajolet et al. 2007) — STORED, MERGEABLE
# registers, unlike approx_count_distinct whose sketch dies with the query.
# The sketch-table pattern: build per-(group, shard/day) register tables
# once, persist them, and answer any later rollup (per-group, global,
# cross-day) by max-merging registers — the raw data is never re-scanned.
# ---------------------------------------------------------------------------

# 60-bit md5 hash split: low HLL_P bits pick the register, the remaining
# HLL_W bits feed the rank (leading-zero count). rho ∈ [1, HLL_W+1].
_HLL_BITS = 60


def _hll_hash(col, seed: int) -> Column:
    v = (col if isinstance(col, Column) else F.col(col)).cast("string")
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit("hll"), F.lit(str(seed)), v)), 1, 15
        ),
        16,
        10,
    ).cast("bigint")


def hll_build(
    df: DataFrame,
    group_cols: list[str],
    value_col,
    p: int = 9,
    seed: int = 7,
) -> DataFrame:
    """Per-group HLL register table: (group..., idx, rho) with at most
    ``2**p`` rows per group whatever the input size. ``idx`` = low
    ``p`` bits of a 60-bit md5 hash, ``rho`` = 1 + leading zeros of
    the remaining ``60-p`` bits (computed as bit-length via
    ``length(bin(w))`` — no floating log), ``rho`` per register is the
    MAX over values. Every step is native integer expression —
    whole-stage codegen, one map-side-combined groupBy — and replays
    exactly in SQL, so the contract hash covers the sketch itself.

    Register tables are the MERGEABLE artifact: union any number of
    them (different days, shards, sources) and re-max with
    :func:`hll_merge` — merged-then-estimated is EXACTLY equal to
    built-on-the-union, which the pytest pins."""
    m = 1 << int(p)
    wbits = _HLL_BITS - int(p)
    v = value_col if isinstance(value_col, Column) else F.col(value_col)
    # NULLs are excluded, matching count(DISTINCT ...) semantics —
    # concat_ws silently DROPS a NULL operand, so without this filter
    # every NULL row would hash the salt alone and the sketch would
    # report one phantom distinct value (round-10 review finding)
    df = df.filter(v.isNotNull())
    h = _hll_hash(v, seed)
    idx = (h % F.lit(m)).cast("int").alias("idx")
    # integer shift, NOT `/` — Column `/` is double division and a
    # 60-bit hash exceeds double exactness (2^53)
    w = F.shiftright(h, int(p))
    rho = (
        F.when(w == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - F.length(F.bin(w)))
        .cast("int")
        .alias("rho")
    )
    return (
        df.select(*group_cols, idx, rho)
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables by (group, idx) max — the HLL union. Use
    after unionByName-ing stored sketches, or to roll a finer grouping
    (per day) up to a coarser one (per month): just drop the finer
    column from ``group_cols`` and re-max."""
    return (
        registers.groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    p: int = 9,
) -> DataFrame:
    """(group..., est) from a register table. The harmonic-mean sum is
    computed in INTEGER units of 2^-(wbits+1): each register
    contributes ``2**(wbits+1-rho)``, each EMPTY register ``2**
    (wbits+1)`` — an exact, order-independent BIGINT sum (a double sum
    of 2^-rho values spanning 50 binary orders would be
    partition-order-dependent and break hash parity). One double
    division at the end + the standard small-range linear-counting
    correction (E ≤ 2.5m with empty registers → m·ln(m/V))."""
    m = 1 << int(p)
    wbits = _HLL_BITS - int(p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    unit = F.lit(int(2 ** (wbits + 1))).cast("bigint")  # empty register
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {wbits + 1} - rho)")
        ).alias("s_present"),
    )
    s_total = (
        F.col("s_present")
        + (F.lit(m) - F.col("n_present")).cast("bigint") * unit
    )
    # numerator folded to ONE Python double (alpha·m²·2^(wbits+1)) so
    # the runtime arithmetic is a single division — scalar-constant
    # pre-folding, the same rule the BM25/IDF oracles follow
    raw = F.lit(alpha * m * m * float(2 ** (wbits + 1))) / s_total.cast(
        "double"
    )
    v = (F.lit(m) - F.col("n_present")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias("est"))


def hll_estimate_py(rhos, p: int = 9) -> float:
    """Driver-side estimate twin of :func:`hll_estimate` — IDENTICAL
    arithmetic, for register tables that live OUTSIDE Spark (the
    manifest tier's per-file NDV sketches, merged from metadata):
    integer harmonic sum via Python ints (exact, like the BIGINT sum),
    the same Python-folded constant, one double division, and the
    linear-counting correction in the same operation order. The only
    cross-engine wiggle is libm's ln (1-ulp class), absorbed by the
    result rounding every consumer applies. ``rhos``: m integers,
    0 = empty register."""
    import math

    m = 1 << int(p)
    wbits = _HLL_BITS - int(p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = 0
    n_present = 0
    for r in rhos:
        r = int(r)
        if r > 0:
            n_present += 1
            s += 1 << (wbits + 1 - r)
        else:
            s += 1 << (wbits + 1)
    raw = alpha * m * m * float(2 ** (wbits + 1)) / float(s)
    v = float(m - n_present)
    if raw <= 2.5 * m and v > 0:
        return float(m) * math.log(float(m) / v)
    return raw


def countmin_positions(col, depth: int, width: int, seed: int = 42) -> Column:
    """Array of ``depth`` structs (row, pos): row j's cell index is the
    first 60 bits of md5('cm:seed:j:value') mod width."""
    v = (col if isinstance(col, Column) else F.col(col)).cast("string")
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":", F.lit("cm"), F.lit(str(seed)), F.lit(str(j)), v
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                )
                .cast("bigint")
                .__mod__(F.lit(int(width)))
                .alias("pos"),
            )
            for j in range(int(depth))
        ]
    )


def countmin_build(
    df: DataFrame,
    key_col,
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
    weight_col: str | None = None,
) -> DataFrame:
    """(row, pos, cnt) sketch cells — at most depth*width rows whatever
    the input size. One explode (x depth) + one map-side-combined
    groupBy; sketches over shards/streams merge by summing cnt."""
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    cells = df.select(
        F.explode(countmin_positions(key_col, depth, width, seed)).alias("c"),
        w.alias("w"),
    )
    return (
        cells.groupBy(F.col("c.row").alias("row"), F.col("c.pos").alias("pos"))
        .agg(F.sum("w").alias("cnt"))
    )


def countmin_estimate(
    keys: DataFrame,
    key_col: str,
    sketch: DataFrame,
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """(key, est) for every row of ``keys``: min over the key's depth
    cells. The sketch side is tiny (<= depth*width rows) and broadcast
    — estimating any number of keys is map-side + one small groupBy."""
    probes = keys.select(
        F.col(key_col).alias("key"),
        F.explode(countmin_positions(key_col, depth, width, seed)).alias("c"),
    ).select("key", F.col("c.row").alias("row"), F.col("c.pos").alias("pos"))
    joined = probes.join(F.broadcast(sketch), ["row", "pos"], "left")
    return (
        joined.groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
