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
