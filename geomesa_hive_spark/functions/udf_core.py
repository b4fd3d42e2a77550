"""Builders that turn kernel functions into Arrow-batched pandas UDFs.

Replaces the reference's typeclass UDF-derivation machinery
(``core/src/main/scala/com/azavea/hiveless/HUDF.scala:25-40``) with the
idiomatic PySpark equivalent. Shared semantics reproduced here:

- **null in ⇒ null out** for every argument (reference
  ``HUDF.scala:31-39`` catches ``NullArgument`` → SQL NULL);
- **numeric coercion** (int/decimal arguments accepted where doubles are
  expected — ``HDeserializer.scala:150-186``) via pandas ``astype``;
- per-batch **parse cache** so a literal geometry argument (arriving as a
  constant column) is deserialized once per batch, not once per row.

Vectorized fast paths: when a geometry column is all 2-D point WKB the
batch is decoded with one ``frombuffer`` (``wkb.wkb_array_to_points``)
and predicates/measures run as numpy array ops — the 100-TB hot path.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from geomesa_hive_spark.geom import algorithms as alg
from geomesa_hive_spark.geom.core import Geometry, Point
from geomesa_hive_spark.geom.wkb import (
    from_wkb,
    points_to_wkb_array,
    to_wkb,
    wkb_array_to_points,
)

__all__ = [
    "parse_cache",
    "geoms_of",
    "wkbs_of",
    "g2g_udf",
    "g2scalar_udf",
    "gg2scalar_udf",
    "predicate_udf",
    "numeric_series",
]


def parse_cache() -> Callable[[bytes | None], Geometry | None]:
    """Per-batch WKB→Geometry parser with a cache keyed by the raw bytes
    (constant/literal columns parse once per batch)."""
    cache: dict[bytes, Geometry] = {}

    def parse(b):
        if b is None:
            return None
        key = bytes(b)
        g = cache.get(key)
        if g is None:
            g = from_wkb(key)
            cache[key] = g
        return g

    return parse


def geoms_of(s: pd.Series) -> list[Geometry | None]:
    parse = parse_cache()
    return [parse(b) for b in s]


def wkbs_of(geoms) -> pd.Series:
    return pd.Series(
        [None if g is None or (hasattr(g, "is_empty") and g is None) else to_wkb(g) for g in geoms],
        dtype=object,
    )


def numeric_series(s: pd.Series) -> np.ndarray:
    """Coerce int/decimal/float input to float64 (reference's numeric
    widening, ``HDeserializer.scala:150-186``); None → NaN."""
    if s.dtype == object:
        return pd.to_numeric(s, errors="coerce").to_numpy(dtype=np.float64)
    return s.to_numpy(dtype=np.float64, na_value=np.nan)


# ---------------------------------------------------------------------------
# UDF builders
# ---------------------------------------------------------------------------


def g2g_udf(fn: Callable[[Geometry], Geometry | None]):
    """Geometry → Geometry (WKB→WKB) with null propagation."""

    def impl(s: pd.Series) -> pd.Series:
        parse = parse_cache()
        out = []
        for b in s:
            g = parse(b)
            if g is None:
                out.append(None)
                continue
            r = fn(g)
            out.append(None if r is None else to_wkb(r))
        return pd.Series(out, dtype=object)

    return pandas_udf(impl, T.BinaryType())


def g2scalar_udf(fn, return_type, point_fast: Callable[[np.ndarray, np.ndarray], np.ndarray] | None = None):
    """Geometry → scalar. ``point_fast(x, y)`` handles an all-points batch
    vectorized (NaN slots = null)."""

    def impl(s: pd.Series) -> pd.Series:
        if point_fast is not None:
            fp = wkb_array_to_points(s.to_numpy(dtype=object))
            if fp is not None:
                x, y = fp
                vals = point_fast(x, y)
                res = pd.Series(vals)
                return res.where(~pd.isna(pd.Series(x)), None)
        parse = parse_cache()
        out = []
        for b in s:
            g = parse(b)
            out.append(None if g is None else fn(g))
        return pd.Series(out, dtype=object)

    return pandas_udf(impl, return_type)


def gg2scalar_udf(fn, return_type):
    """(Geometry, Geometry) → scalar with null propagation."""

    def impl(a: pd.Series, b: pd.Series) -> pd.Series:
        parse = parse_cache()
        out = []
        for ba, bb in zip(a, b):
            ga, gb = parse(ba), parse(bb)
            out.append(None if ga is None or gb is None else fn(ga, gb))
        return pd.Series(out, dtype=object)

    return pandas_udf(impl, return_type)


def predicate_udf(fn, vec_points_vs_const: Callable[[np.ndarray, np.ndarray, Geometry], np.ndarray] | None = None):
    """(Geometry, Geometry) → Boolean.

    Fast path: if one side is a batch of plain point WKB and the other is
    a single distinct geometry (a literal), run the vectorized
    points-vs-geometry kernel instead of per-row DE-9IM.
    """

    def impl(a: pd.Series, b: pd.Series) -> pd.Series:
        av = a.to_numpy(dtype=object)
        bv = b.to_numpy(dtype=object)
        if vec_points_vs_const is not None:
            res = _try_vec(av, bv, swap=False)
            if res is None:
                res = _try_vec(bv, av, swap=True)
            if res is not None:
                return res
        parse = parse_cache()
        out = []
        for ba, bb in zip(av, bv):
            ga, gb = parse(ba), parse(bb)
            out.append(None if ga is None or gb is None else bool(fn(ga, gb)))
        return pd.Series(out, dtype=object)

    def _try_vec(pts_side, const_side, swap):
        # constant side: all non-null values identical
        first = None
        for v in const_side:
            if v is not None:
                if first is None:
                    first = bytes(v)
                elif bytes(v) != first:
                    return None
        if first is None:
            return pd.Series([None] * len(pts_side), dtype=object)
        fp = wkb_array_to_points(pts_side)
        if fp is None:
            return None
        x, y = fp
        const_g = from_wkb(first)
        vals = vec_points_vs_const(x, y, const_g, swap)
        out = pd.Series(vals, dtype=object)
        null_mask = pd.isna(x)
        for i, v in enumerate(const_side):
            if v is None:
                null_mask[i] = True
        out[null_mask] = None
        return out

    return pandas_udf(impl, T.BooleanType())
