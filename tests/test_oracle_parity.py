"""Engine-parity pins for the contract-gate quantization arithmetic.

The driver hash-compares Spark results against DuckDB oracles, so every
quantization helper used in a gate must produce BIT-IDENTICAL output in
both engines — not merely close. These tests feed adversarial inputs at
the exact boundaries where the two engines could diverge:

- `ann_opq_property`'s raw-column gate is ``round(cast(cast(x AS FLOAT)
  AS DOUBLE), 3) + 0.0``. A binary double is an exact 3-decimal
  midpoint iff it is an odd multiple of 2^-4 (1000·m·2^e has fraction
  .5 only at e=-4, m odd) — the one place HALF_UP vs HALF_EVEN vs
  multiply-then-std::round implementations could disagree.
- The raw sums themselves must be bit-identical: Spark's F.aggregate
  fold and DuckDB's list_sum both reduce left-to-right over the same
  float32-derived doubles, and double addition is deterministic given
  order. If either engine ever re-orders (pairwise/compensated
  summation), this test catches it before the contract hash does.
"""

from __future__ import annotations

import math
import struct

import duckdb
import numpy as np
from pyspark.sql import functions as F


def _nextafter(x: float, direction: float) -> float:
    return float(np.nextafter(np.float64(x), np.float64(direction)))


def _adversarial_values() -> list[float]:
    """Exact 3-decimal midpoints representable in float32 (odd m·2^-4),
    their ±1ulp neighbours, and a spread of awkward magnitudes."""
    vals: list[float] = []
    for m in [1, 3, 5, 7, 9, 11, 13, 99, 101, 999, 1001, 12345]:
        v = m / 16.0  # odd multiple of 2^-4 → x·1000 ends in exactly .5
        for s in (v, -v):
            vals.append(s)
            vals.append(_nextafter(s, math.inf))
            vals.append(_nextafter(s, -math.inf))
    vals += [0.0, -0.0, 1e-30, -1e-30, 2.5e-4, 62.5, 0.0625, -0.0625]
    return vals


def test_round3_float_gate_engine_parity(spark):
    """round(float32→double, 3) + 0.0 is bit-identical Spark vs DuckDB
    on exact 3-decimal midpoints and their ulp neighbours — the
    `ann_opq_property` raw-column gate is therefore midpoint-safe."""
    vals = _adversarial_values()
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                "i long, x double")
    got_spark = {
        r.i: r.q
        for r in sdf.select(
            "i",
            (F.round(F.col("x").cast("float").cast("double"), 3)
             + F.lit(0.0)).alias("q"),
        ).collect()
    }
    con = duckdb.connect()
    got_duck = {}
    for i, v in enumerate(vals):
        q = con.execute(
            "SELECT round(CAST(CAST(? AS FLOAT) AS DOUBLE), 3) + 0.0",
            [v],
        ).fetchone()[0]
        got_duck[i] = q
    for i, v in enumerate(vals):
        a, b = got_spark[i], got_duck[i]
        assert struct.pack("<d", a) == struct.pack("<d", b), (
            f"engine divergence at x={v!r}: spark={a!r} duckdb={b!r}"
        )


def test_fold_sum_engine_parity(spark):
    """F.aggregate's left-to-right fold and DuckDB's list_sum produce
    bit-identical doubles over the same float32-derived elements — the
    assumption behind comparing `n2_orig`/`dot_orig` raw (pre-round)
    across engines."""
    rng = np.random.default_rng(7)
    rows = []
    for i in range(50):
        # float32 values spanning signs and magnitudes, incl. heavy
        # cancellation (sums near zero are where order matters most)
        v = (rng.standard_normal(64) * 10.0 ** rng.integers(-3, 4, 64))
        v = np.asarray(v, dtype=np.float32)
        rows.append((i, [float(x) for x in v]))
    sdf = spark.createDataFrame(rows, "i long, v array<float>")
    got_spark = {
        r.i: r.s
        for r in sdf.select(
            "i",
            F.aggregate(
                F.transform("v", lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ).alias("s"),
        ).collect()
    }
    con = duckdb.connect()
    for i, v in rows:
        s = con.execute(
            "SELECT list_sum(list_transform(CAST(? AS DOUBLE[]), x -> x*x))",
            [v],
        ).fetchone()[0]
        assert struct.pack("<d", got_spark[i]) == struct.pack("<d", s), (
            f"fold order divergence on row {i}: "
            f"spark={got_spark[i]!r} duckdb={s!r}"
        )
