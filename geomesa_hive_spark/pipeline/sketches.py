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
    "quantile_sketch_build", "quantile_sketch_merge",
    "quantile_estimate", "quantile_estimate_py",
    "dd_sketch_build", "dd_sketch_merge", "dd_quantile",
    "dd_quantile_py",
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


# ---------------------------------------------------------------------------
# Fixed-grid quantile sketch (round 12) — STORED, MERGEABLE bucket counts,
# the quantile member of the sketch-table family next to hll_build.
# A KLL/GK summary has data-dependent compaction (merge order changes the
# stored summary, breaking merged-over-shards ≡ built-direct hash parity);
# a fixed grid is the discipline the repo's sketches demand: integer bucket
# counts, merge = cell-wise SUM (exact, order-independent), one double
# interpolation at estimate time. The grid (lo, hi, m) is a CONTRACT like
# HLL's p — all sketches that will ever merge must share it. Error is
# bounded by one bucket width (hi-lo)/m; values outside [lo, hi) clamp to
# the edge buckets (degrades edge accuracy, never merge determinism).
# ---------------------------------------------------------------------------


def _q_bucket(v: Column, lo: float, hi: float, m: int) -> Column:
    # ONE spelling of the bucket arithmetic, shared by build and every
    # oracle replay: floor((v - lo) / wb) with wb pre-folded in Python
    # to a single double literal — (v-lo)*m/(hi-lo) is a DIFFERENT
    # float expression and would bucket boundary values differently
    wb = (float(hi) - float(lo)) / int(m)
    b = F.floor((v.cast("double") - F.lit(float(lo))) / F.lit(wb))
    return F.least(F.greatest(b, F.lit(0)), F.lit(int(m) - 1)).cast("int")


def quantile_sketch_build(
    df: DataFrame,
    group_cols: list[str],
    value_col,
    lo: float,
    hi: float,
    m: int = 256,
) -> DataFrame:
    """Per-group grid sketch: (group..., bucket, cnt) with at most ``m``
    rows per group whatever the input size. NULLs are excluded
    (matching percentile/quantile SQL semantics). Every step is a
    native integer expression — one map-side-combined groupBy — and
    replays exactly in SQL. Sketches over shards/days/sources merge
    with :func:`quantile_sketch_merge`; merged-then-estimated is
    EXACTLY built-on-the-union (integer sums are order-independent),
    which the gate asserts in-query."""
    if not (float(hi) > float(lo)):
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    v = value_col if isinstance(value_col, Column) else F.col(value_col)
    return (
        df.filter(v.isNotNull())
        .select(*group_cols, _q_bucket(v, lo, hi, m).alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def quantile_sketch_merge(
    registers: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge sketch tables by (group, bucket) SUM — exact. Also rolls a
    finer grouping up to a coarser one (drop the finer column)."""
    return (
        registers.groupBy(*group_cols, "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def quantile_estimate(
    registers: DataFrame,
    group_cols: list[str],
    qs_permille: list[int],
    lo: float,
    hi: float,
    m: int = 256,
) -> DataFrame:
    """(group..., q_permille, est) for each requested quantile.
    Quantiles are INTEGER PERMILLE (500 = median): rank = ceil(q·N/1000)
    computed as floor((q*N + 999) / 1000.0) — the product stays well
    under 2^53 so the double floor is exact and spells identically in
    Spark and DuckDB (their integer-DIV semantics differ; their double
    floor does not). The estimate linearly interpolates inside the
    first bucket whose cumulative count reaches the rank:
    ``lo + wb·(bucket + (rank - cum_below)/cnt)`` — integer cumulative
    window, one double division, every literal Python-folded."""
    from pyspark.sql import Window

    bad = [q for q in qs_permille if not 1 <= int(q) <= 1000]
    if bad:
        raise ValueError(
            f"q_permille must be in [1, 1000], got {bad} — a q > 1000 "
            "yields rank > N and the quantile would silently vanish "
            "from the output"
        )
    wb = (float(hi) - float(lo)) / int(m)
    spark = registers.sparkSession
    qs = spark.createDataFrame(
        [(int(q),) for q in qs_permille], "q_permille int"
    )
    w = Window.partitionBy(*group_cols).orderBy("bucket")
    cum = registers.select(
        *group_cols, "bucket", "cnt",
        F.sum("cnt").over(w).cast("long").alias("cum"),
    )
    tot = registers.groupBy(*group_cols).agg(
        F.sum("cnt").cast("long").alias("n_total")
    )
    ranked = tot.join(F.broadcast(qs)).withColumn(
        "rank",
        F.greatest(
            F.floor((F.col("q_permille").cast("bigint") * F.col("n_total")
                     + F.lit(999)).cast("double") / F.lit(1000.0))
            .cast("long"),
            F.lit(1).cast("long"),
        ),
    )
    # both join sides derive from the SAME registers frame — aliasing
    # the ranked side's group columns mints fresh attribute ids, or a
    # memory-sink/view source hits "Conflicting attributes" at resolve
    ranked = ranked.select(
        *[F.col(c).alias(f"__rk_{c}") for c in group_cols],
        "q_permille", "rank",
    )
    cond = None
    for c in group_cols:
        eq = cum[c] == ranked[f"__rk_{c}"]
        cond = eq if cond is None else (cond & eq)
    hit = (cum.join(ranked, cond) if cond is not None
           else cum.join(ranked)).filter(
        (F.col("cum") >= F.col("rank"))
        & (F.col("cum") - F.col("cnt") < F.col("rank"))
    )
    est = (
        F.lit(float(lo))
        + F.lit(wb)
        * (F.col("bucket").cast("double")
           + (F.col("rank") - (F.col("cum") - F.col("cnt")))
           .cast("double") / F.col("cnt").cast("double"))
    )
    return hit.select(*group_cols, "q_permille", est.alias("est"))


def quantile_estimate_py(
    counts, qs_permille, lo: float, hi: float
) -> dict:
    """Driver-side estimate twin of :func:`quantile_estimate` —
    IDENTICAL arithmetic, for sketch registers that live OUTSIDE Spark
    (the manifest tier's per-file ``q_<col>`` counts, merged from
    metadata): integer cumulative sum, the same double rank floor, the
    same interpolation operation order. ``counts``: m integers (dense,
    0 = empty bucket). Returns {q_permille: est}; empty sketch → {}."""
    bad = [q for q in qs_permille if not 1 <= int(q) <= 1000]
    if bad:
        raise ValueError(f"q_permille must be in [1, 1000], got {bad}")
    m = len(counts)
    wb = (float(hi) - float(lo)) / m
    n_total = 0
    for c in counts:
        n_total += int(c)
    if n_total == 0:
        return {}
    out = {}
    for q in qs_permille:
        import math

        rank = max(int(math.floor((int(q) * n_total + 999) / 1000.0)), 1)
        cum = 0
        for b, c in enumerate(counts):
            c = int(c)
            if c == 0:
                continue
            cum += c
            if cum >= rank:
                out[int(q)] = (
                    float(lo)
                    + wb * (float(b) + float(rank - (cum - c)) / float(c))
                )
                break
    return out


# ---------------------------------------------------------------------------
# DD (relative-error, log-bucket) quantile sketch — the RANGE-FREE rank
# sketch next to the fixed-grid one (round 13). The fixed grid needs a
# caller-chosen [lo, hi) and resolution; this sketch needs neither:
# buckets are logarithmic in |value| (DDSketch, Masson et al. 2019 —
# Datadog's production quantile sketch), so any positive/negative/zero
# double lands in a bucket and the estimate carries a GUARANTEED
# relative error of e^(step/2e6) − 1 (~0.5% at the default step).
#
# Why this and not KLL (the other standard rank sketch): KLL's
# compactors keep/drop alternating items under a coin flip, so its
# merge result depends on merge ORDER and randomness — merged-over-
# shards ≡ built-direct (this repo's mergeability gate, and the
# property that makes a sketch table trustworthy) is impossible to
# assert for it, and a DuckDB oracle could not replay it. Log buckets
# are a pure function of the value: counts merge by SUM, any partition
# or merge order gives the SAME table, and the whole pipeline replays
# in SQL.
#
# Cross-engine determinism discipline (the text_pmi/round-12 rules):
# ln() is quantized to INTEGER micro-nats via floor(ln|x|·1e6 + 0.5)
# before bucketing, absorbing cross-libm 1-ulp drift; the bucket index
# divides that integer by the integer step through a DOUBLE floor
# (exact — integer distances dwarf the division's rounding; integer
# DIV is avoided because Spark and DuckDB disagree on negatives). The
# bucket KEY is a single BIGINT that orders like the values:
# negatives → −(10^9 + log-bucket of |x|), zero → 0, positives →
# 10^9 + log-bucket (|ln·1e6| < 7.1e8 bounds the log-bucket under
# 10^9 for any step ≥ 1).
# ---------------------------------------------------------------------------

_DD_BIG = 1_000_000_000


def _dd_key(v: Column, step: int) -> Column:
    def lb(mag: Column) -> Column:
        mnat = F.floor(F.log(mag) * F.lit(1e6) + F.lit(0.5)).cast("long")
        return F.floor(mnat / F.lit(float(int(step)))).cast("long")

    return (
        F.when(v > 0, F.lit(_DD_BIG) + lb(v))
        .when(v < 0, -(F.lit(_DD_BIG) + lb(-v)))
        .otherwise(F.lit(0).cast("long"))
    )


def dd_sketch_build(
    df: DataFrame, group_cols: list[str], value_col,
    step: int = 10_000,
) -> DataFrame:
    """(group..., bucket, cnt) — log-bucket counts per group. NULLs AND
    NaNs are excluded (the fixed-grid convention — a NaN would flow
    through ln() into an engine-dependent junk bucket that no SQL
    oracle can replay, so it is dropped like NULL, never bucketed);
    ``step`` is the bucket width in micro-nats: relative error ≤
    e^(step/2e6) − 1 (0.50% at the default), buckets per decade ≈
    ln(10)·1e6/step (~230)."""
    if int(step) < 1:
        raise ValueError(f"step must be >= 1 micro-nat, got {step}")
    v = value_col if isinstance(value_col, Column) else F.col(value_col)
    return (
        df.filter(v.isNotNull() & ~F.isnan(v.cast("double")))
        .select(*group_cols, _dd_key(v, step).alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def dd_sketch_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge by (group, bucket) SUM — exact, order-independent; also
    rolls a finer grouping up to a coarser one (drop the finer col)."""
    return (
        registers.groupBy(*group_cols, "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def dd_quantile(
    registers: DataFrame,
    group_cols: list[str],
    qs_permille: list[int],
    step: int = 10_000,
) -> DataFrame:
    """(group..., q_permille, mid_mnat, est) per requested quantile —
    the same integer-permille rank logic as :func:`quantile_estimate`
    (rank = floor((q·N + 999)/1000.0), exact and engine-identical),
    cumulative counts ordered by the value-ordered bucket key.
    ``mid_mnat`` is the EXACT signed integer micro-nat midpoint of the
    hit bucket (0 for the zero bucket) — the hash-stable answer;
    ``est`` = sign · e^(mid_mnat/1e6) is the human-unit value (one
    transcendental per output row; round it before hashing)."""
    from pyspark.sql import Window

    bad = [q for q in qs_permille if not 1 <= int(q) <= 1000]
    if bad:
        raise ValueError(f"q_permille must be in [1, 1000], got {bad}")
    step = int(step)
    spark = registers.sparkSession
    qs = spark.createDataFrame(
        [(int(q),) for q in qs_permille], "q_permille int"
    )
    w = Window.partitionBy(*group_cols).orderBy("bucket")
    cum = registers.select(
        *group_cols, "bucket", "cnt",
        F.sum("cnt").over(w).cast("long").alias("cum"),
    )
    tot = registers.groupBy(*group_cols).agg(
        F.sum("cnt").cast("long").alias("n_total")
    )
    ranked = tot.join(F.broadcast(qs)).withColumn(
        "rank",
        F.greatest(
            F.floor((F.col("q_permille").cast("bigint") * F.col("n_total")
                     + F.lit(999)).cast("double") / F.lit(1000.0))
            .cast("long"),
            F.lit(1).cast("long"),
        ),
    )
    # fresh attribute ids on the ranked side (both sides derive from
    # the SAME registers frame — the quantile_estimate alias rule)
    ranked = ranked.select(
        *[F.col(c).alias(f"__rk_{c}") for c in group_cols],
        "q_permille", "rank",
    )
    cond = None
    for c in group_cols:
        eq = cum[c].eqNullSafe(ranked[f"__rk_{c}"])
        cond = eq if cond is None else (cond & eq)
    hit = (cum.join(ranked, cond) if cond is not None
           else cum.join(ranked)).filter(
        (F.col("cum") >= F.col("rank"))
        & (F.col("cum") - F.col("cnt") < F.col("rank"))
    )
    # mid_mnat is the LOG-midpoint of |value| (negative for |x| < 1);
    # side carries the VALUE sign — the two must not be conflated
    lb = F.abs(F.col("bucket")) - F.lit(_DD_BIG)
    mid = (lb * F.lit(step) + F.lit(step // 2)).cast("long")
    zero = F.col("bucket") == 0
    side = F.when(zero, F.lit(0)).otherwise(
        F.signum(F.col("bucket")).cast("int"))
    mid_mnat = F.when(zero, F.lit(0).cast("long")).otherwise(mid)
    est = (
        F.when(zero, F.lit(0.0))
        .otherwise(
            F.signum(F.col("bucket"))
            * F.exp(mid.cast("double") / F.lit(1e6))
        )
    )
    return hit.select(
        *group_cols, "q_permille", side.alias("side"),
        mid_mnat.alias("mid_mnat"), est.alias("est"),
    )


def dd_quantile_py(pairs, qs_permille, step: int = 10_000) -> dict:
    """Driver-side estimate twin of :func:`dd_quantile` — IDENTICAL
    arithmetic, for sparse DD registers that live OUTSIDE Spark (the
    manifest tier's per-file ``ddsk_<col>`` pairs, merged from
    metadata): integer cumulative walk in value-ordered bucket-key
    order, the same double rank floor, the same integer log-midpoint.
    ``pairs``: mapping/iterable of (bucket_key, cnt). Returns
    {q_permille: {"side", "mid_mnat", "est"}} — ``side`` and
    ``mid_mnat`` are exact integers (the hash-stable answer);
    ``est`` = side · e^(mid_mnat/1e6) carries one transcendental.
    Empty sketch → {}."""
    import math

    bad = [q for q in qs_permille if not 1 <= int(q) <= 1000]
    if bad:
        raise ValueError(f"q_permille must be in [1, 1000], got {bad}")
    step = int(step)
    items = sorted(
        pairs.items() if isinstance(pairs, dict) else pairs)
    n_total = 0
    for _, c in items:
        if int(c) < 0:
            raise ValueError("negative DD register count")
        n_total += int(c)
    if n_total == 0:
        return {}
    out = {}
    for q in qs_permille:
        rank = max(int(math.floor((int(q) * n_total + 999) / 1000.0)), 1)
        cum = 0
        for key, c in items:
            c = int(c)
            if c == 0:
                continue
            cum += c
            if cum >= rank:
                key = int(key)
                if key == 0:
                    out[int(q)] = {"side": 0, "mid_mnat": 0, "est": 0.0}
                else:
                    side = 1 if key > 0 else -1
                    mid = (abs(key) - _DD_BIG) * step + step // 2
                    out[int(q)] = {
                        "side": side,
                        "mid_mnat": int(mid),
                        "est": side * math.exp(mid / 1e6),
                    }
                break
    return out
