"""Driver-side unit/property tests for manifest stat handling — no
Spark session (pure Python), so these run in milliseconds and pin the
round-8 ADVICE fix independently of the integration gates."""

from __future__ import annotations

import decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from geomesa_hive_spark.sources.manifest import _json_stat

_DECIMALS = st.decimals(
    min_value=-10**12, max_value=10**12, allow_nan=False,
    allow_infinity=False, places=6,
)


@given(_DECIMALS)
@settings(max_examples=300, deadline=None)
def test_json_stat_never_shrinks_range(d):
    """The conservative-widening property: a recorded min is <= the true
    value and a recorded max is >= it — float rounding may only WIDEN
    the [min, max] box, never shrink it (a shrunken box skips files
    that contain matching rows)."""
    lo = _json_stat(d, "min")
    hi = _json_stat(d, "max")
    # exact binary expansion (Decimal(float)), NOT Decimal(str(float)) —
    # str() is shortest-roundtrip repr and can sit on the other side of
    # the true value even when the float itself doesn't
    assert decimal.Decimal(lo) <= d <= decimal.Decimal(hi)
    # JSON-serializable (the whole point: these land in commit logs)
    assert isinstance(lo, (int, float)) and isinstance(hi, (int, float))


@given(st.integers(min_value=-10**15, max_value=10**15))
@settings(max_examples=200, deadline=None)
def test_json_stat_integral_decimals_exact(n):
    """Integral Decimals become exact ints on BOTH sides (no widening
    needed, no float precision loss for > 2^53 keys)."""
    d = decimal.Decimal(n)
    assert _json_stat(d, "min") == n and _json_stat(d, "max") == n


def test_json_stat_passthrough():
    """Non-Decimal values route through _plain untouched: numerics and
    strings stay themselves, datetimes ISO-format."""
    import datetime

    assert _json_stat(7, "min") == 7
    assert _json_stat(7.25, "max") == 7.25
    assert _json_stat("abc", "min") == "abc"
    assert _json_stat(None, "max") is None
    ts = datetime.datetime(2026, 8, 15, 12, 0, 0)
    assert _json_stat(ts, "min") == "2026-08-15T12:00:00"


def test_pruned_ndv_registers_and_ranges(spark, tmp_path):
    """Manifest NDV sketches: full-range merge equals Spark
    hll_build+estimate exactly (register merge is the union's sketch);
    partial ranges merge fewer files and stay superset-monotone;
    all-NULL files contribute nothing; json tier and unknown columns
    are refused."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from geomesa_hive_spark.pipeline import sketches as sk
    from geomesa_hive_spark.sources import manifest as M

    df = spark.range(30000).select(
        F.col("id").alias("k"),
        # v NULL in the top k-range: those files' sketches are NULL
        F.when(F.col("id") < 24000, F.col("id") % 997).alias("v"),
    )
    path = str(tmp_path / "ndv")
    M.write_with_manifest(df, path, ["k"], n_files=10,
                          manifest_format="parquet", ndv_cols=["v"])
    est, rep = M.pruned_ndv(path, "v")
    assert rep["n_files"] == 10
    want = sk.hll_estimate(
        sk.hll_build(df.withColumn("g", F.lit(0)), ["g"], "v", p=9),
        ["g"], p=9).collect()[0].est
    # rounded compare: the linear-counting branch runs Python math.log
    # vs JVM Math.log — a 1-ulp libm wiggle is the documented slack,
    # absorbed by the rounding every consumer applies
    assert round(est, 4) == round(want, 4)
    e_part, r_part = M.pruned_ndv(path, "v", lo=0, hi=2999)
    assert r_part["files_merged"] < rep["files_merged"]
    assert e_part <= est
    # a range in the NULL zone merges at most boundary files' sketches
    # (file cuts are SAMPLED — a boundary file may straddle the 24000
    # NULL cut and legitimately contribute): superset-monotone only
    e_null, r_null = M.pruned_ndv(path, "v", lo=27000, hi=29999)
    assert e_null <= est and r_null["files_merged"] < rep["files_merged"]
    # a range beyond every file: nothing merged, empty-sketch estimate
    e_out, r_out = M.pruned_ndv(path, "v", lo=50000, hi=60000)
    assert e_out < 1.0 and r_out["files_merged"] == 0
    with _pytest.raises(ValueError, match="no NDV sketch"):
        M.pruned_ndv(path, "k")
    p2 = str(tmp_path / "nojson")
    with _pytest.raises(ValueError, match="parquet"):
        M.write_with_manifest(df, p2, ["k"], n_files=4,
                              manifest_format="json", ndv_cols=["v"])


def test_pruned_quantile_metadata_answers(spark, tmp_path):
    """Manifest quantile sketches (round 12): full-range sum-merge
    equals Spark quantile_sketch_build+estimate bit-for-bit (count
    merge is the union's sketch; the py estimator is the arithmetic
    twin); partial ranges merge fewer files (superset semantics);
    all-NULL files contribute nothing; the probe scan is column-pruned
    to exactly the needed manifest columns; json tier and unknown
    columns are refused."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from geomesa_hive_spark.pipeline import sketches as sk
    from geomesa_hive_spark.sources import manifest as M

    LO, HI, m = 0.0, 1000.0, 128
    df = spark.range(30000).select(
        F.col("id").alias("k"),
        # v NULL in the top k-range: those files pack a NULL sketch
        F.when(F.col("id") < 24000,
               (F.col("id") * 37 % 1000).cast("double")).alias("v"),
    )
    path = str(tmp_path / "qsk")
    M.write_with_manifest(df, path, ["k"], n_files=10,
                          manifest_format="parquet",
                          quantile_cols={"v": (LO, HI)}, quantile_m=m)
    qs = [250, 500, 900]
    est, rep = M.pruned_quantile(path, "v", qs)
    assert rep["n_files"] == 10
    assert M._LAST_QSK_SCAN_COLUMNS == ["file", "min_k", "max_k", "qsk_v"]
    want = {
        r.q_permille: r.est
        for r in sk.quantile_estimate(
            sk.quantile_sketch_build(
                df.withColumn("g", F.lit(0)), ["g"], "v", LO, HI, m),
            ["g"], qs, LO, HI, m).collect()
    }
    assert est == want                      # bit-for-bit, no rounding
    e_part, r_part = M.pruned_quantile(path, "v", qs, lo=0, hi=2999)
    assert 0 < r_part["files_merged"] < rep["files_merged"]
    # a range beyond every file: nothing merged, empty estimate
    e_out, r_out = M.pruned_quantile(path, "v", qs, lo=50000, hi=60000)
    assert e_out == {} and r_out["files_merged"] == 0
    with _pytest.raises(ValueError, match="no quantile sketch"):
        M.pruned_quantile(path, "k", qs)
    with _pytest.raises(ValueError, match="parquet"):
        M.write_with_manifest(df, str(tmp_path / "nojson"), ["k"],
                              n_files=4, manifest_format="json",
                              quantile_cols={"v": (LO, HI)})


def test_pruned_dd_quantile_metadata_answers(spark, tmp_path):
    """Manifest DD sketches (round 14): full-range pair sum-merge
    equals Spark dd_sketch_build+dd_quantile integer-for-integer
    (side, mid_mnat — count merge is the union's sketch; dd_quantile_py
    is the arithmetic twin); NaN/NULL values excluded from registers;
    partial ranges merge fewer files (superset semantics); all-NULL
    files contribute nothing; the probe scan is column-pruned to
    exactly the needed manifest columns; json tier, unknown columns,
    and corrupt registers are refused."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from geomesa_hive_spark.pipeline import sketches as sk
    from geomesa_hive_spark.sources import manifest as M

    STEP = 10_000
    df = spark.range(20000).select(
        F.col("id").alias("k"),
        # mixes signs and zeros; NULL in the top k-range (those files
        # pack a NULL register); NaN sprinkled in to pin exclusion
        F.when(F.col("id") >= 15000, F.lit(None).cast("double"))
        .when(F.col("id") % 997 == 0, F.lit(float("nan")))
        .when(F.col("id") % 11 == 0, F.lit(0.0))
        .when(F.col("id") % 3 == 0,
              -(F.col("id") % 5000).cast("double") - 0.5)
        .otherwise((F.col("id") % 7000).cast("double") + 0.25)
        .alias("v"),
    )
    path = str(tmp_path / "ddt")
    root = M.write_with_manifest(
        df, path, ["k"], n_files=8, manifest_format="parquet",
        dd_cols=["v"], dd_step=STEP,
    )
    assert root["dd"] == {"step": STEP, "cols": ["v"]}
    qs = [100, 500, 900]
    est, rep = M.pruned_dd_quantile(path, "v", qs)
    assert rep["n_files"] == 8
    assert M._LAST_DDSK_SCAN_COLUMNS == ["file", "min_k", "max_k", "ddsk_v"]
    want = {
        r.q_permille: (r.side, r.mid_mnat)
        for r in sk.dd_quantile(
            sk.dd_sketch_build(df, [], "v", STEP), [], qs, STEP).collect()
    }
    assert {q: (e["side"], e["mid_mnat"]) for q, e in est.items()} == want
    e_part, r_part = M.pruned_dd_quantile(path, "v", qs, lo=0, hi=2999)
    assert 0 < r_part["files_merged"] < rep["files_merged"]
    # a range deep inside the all-NULL tail (the top quarter of keys
    # spans >= 2 range-clustered files): the only overlapping file(s)
    # pack a NULL register, so nothing merges and the estimate is empty
    e_null, r_null = M.pruned_dd_quantile(path, "v", qs,
                                          lo=19000, hi=19900)
    assert e_null == {} and r_null["files_merged"] == 0
    with _pytest.raises(ValueError, match="no DD sketch"):
        M.pruned_dd_quantile(path, "k", qs)
    with _pytest.raises(ValueError, match="parquet"):
        M.write_with_manifest(df, str(tmp_path / "ddjson"), ["k"],
                              n_files=4, manifest_format="json",
                              dd_cols=["v"])
    with _pytest.raises(ValueError, match=r"\[1, 1000\]"):
        M.pruned_dd_quantile(path, "v", [0])
