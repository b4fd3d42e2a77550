"""XZ2 extended-geometry index: NumPy derivation, SQL replay, layout.

The index must satisfy three independent contracts:
1. the query-range cover never misses an intersecting box (the property
   that makes the scan + refine exact);
2. the native SQL stage arithmetic equals the NumPy derivation
   bit-for-bit in BOTH engines (dyadic ops only);
3. the stored layout actually prunes (BETWEEN predicates on the stored
   code reach the parquet scan).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from geomesa_hive_spark.geom.xz2 import (
    DEFAULT_G,
    subtree_span,
    xz2_index,
    xz2_query_ranges,
)
from geomesa_hive_spark.operators.xz2 import (
    add_xz2_column,
    wrap_oracle_sql,
    write_xz2_partitioned,
    xz2_range_predicate,
    xz2_sql_stages,
    xz2_window_filter,
)


def _random_boxes(seed, n):
    rng = np.random.default_rng(seed)
    x0 = rng.uniform(-180, 180, n)
    y0 = rng.uniform(-90, 90, n)
    w = rng.uniform(0, 50, n) * (rng.random(n) < 0.6)  # 40% points
    h = rng.uniform(0, 50, n) * (rng.random(n) < 0.6)
    return x0, y0, np.minimum(x0 + w, 180.0), np.minimum(y0 + h, 90.0)


def test_codes_bounded_and_levels_sane():
    x0, y0, x1, y1 = _random_boxes(1, 5000)
    cs, ln = xz2_index(x0, y0, x1, y1)
    assert cs.min() >= 0
    assert cs.max() <= subtree_span(DEFAULT_G, 0)
    assert ln.min() >= 0 and ln.max() <= DEFAULT_G
    # points (zero extent) always land at the deepest level
    pts = (x1 == x0) & (y1 == y0)
    assert (ln[pts] == DEFAULT_G).all()


@settings(max_examples=40, deadline=None)
@given(
    qx=st.floats(-180, 170), qy=st.floats(-90, 80),
    qw=st.floats(0.01, 80), qh=st.floats(0.01, 60),
    depth=st.sampled_from([5, 7, None]),
)
def test_query_ranges_never_miss(qx, qy, qw, qh, depth):
    x0, y0, x1, y1 = _random_boxes(2, 4000)
    cs, _ = xz2_index(x0, y0, x1, y1)
    qx1, qy1 = min(qx + qw, 180.0), min(qy + qh, 90.0)
    ranges = xz2_query_ranges(qx, qy, qx1, qy1, max_level=depth)
    assert ranges == sorted(ranges)
    member = np.zeros(len(cs), dtype=bool)
    for lo, hi in ranges:
        member |= (cs >= lo) & (cs <= hi)
    inter = (x0 <= qx1) & (x1 >= qx) & (y0 <= qy1) & (y1 >= qy)
    assert not (inter & ~member).any()


def test_sql_stages_match_numpy_in_duckdb():
    x0, y0, x1, y1 = _random_boxes(3, 20000)
    cs, ln = xz2_index(x0, y0, x1, y1)
    con = duckdb.connect()
    con.register("boxes", pd.DataFrame({"a": x0, "b": y0, "c": x1, "d": y1}))
    sql = "SELECT xz2, xz2_len FROM " + wrap_oracle_sql(
        "SELECT * FROM boxes", xz2_sql_stages("a", "b", "c", "d")
    )
    res = con.execute(sql).fetchnumpy()
    assert (res["xz2"] == cs).all()
    assert (res["xz2_len"] == ln).all()


def test_native_stages_match_udf_in_spark(spark):
    x0, y0, x1, y1 = _random_boxes(4, 3000)
    pdf = pd.DataFrame({"a": x0, "b": y0, "c": x1, "d": y1}).reset_index()
    df = spark.createDataFrame(pdf)
    native = (
        add_xz2_column(df, "a", "b", "c", "d", native=True)
        .select("index", "xz2", "xz2_len").toPandas().sort_values("index")
    )
    udf = (
        add_xz2_column(df, "a", "b", "c", "d")
        .select("index", "xz2", "xz2_len").toPandas().sort_values("index")
    )
    assert (native["xz2"].to_numpy() == udf["xz2"].to_numpy()).all()
    assert (native["xz2_len"].to_numpy() == udf["xz2_len"].to_numpy()).all()
    cs, _ = xz2_index(x0, y0, x1, y1)
    assert (udf.sort_values("index")["xz2"].to_numpy() == cs).all()


def test_window_filter_exact_and_layout_prunes(spark, tmp_path):
    # synth 4000 boxes, lay out along the XZ2 curve
    base = spark.range(4000).selectExpr(
        "id",
        "CAST((id * 29) % 360 - 180 AS DOUBLE) AS bxmin",
        "CAST((id * 17) % 180 - 90 AS DOUBLE) AS bymin",
        "least(CAST((id * 29) % 360 - 180 AS DOUBLE) + (id % 11), 180.0) AS bxmax",
        "least(CAST((id * 17) % 180 - 90 AS DOUBLE) + (id % 7), 90.0) AS bymax",
    )
    path = str(tmp_path / "xz2lake")
    write_xz2_partitioned(base, path, "bxmin", "bymin", "bxmax", "bymax", num_files=8)
    stored = spark.read.parquet(path)
    assert stored.count() == 4000

    win = (-60.5, -30.5, 59.5, 29.5)
    # stored-column path: BETWEEN predicates reach the parquet scan
    pred = xz2_range_predicate(win, max_level=5)
    pushed = stored.filter(F.expr(pred))
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "xz2" in plan

    hits = xz2_window_filter(
        pushed, win, "bxmin", "bymin", "bxmax", "bymax", max_level=7
    )
    got = {r.id for r in hits.select("id").collect()}
    brute = {
        r.id
        for r in stored.filter(
            (F.col("bxmin") <= win[2]) & (F.col("bxmax") >= win[0])
            & (F.col("bymin") <= win[3]) & (F.col("bymax") >= win[1])
        ).select("id").collect()
    }
    assert got == brute and len(brute) > 0


def test_coarse_depth_is_superset(spark):
    # coarser traversal may only ADD candidates, never drop any
    full = xz2_query_ranges(-10.0, -10.0, 25.0, 20.0)
    coarse = xz2_query_ranges(-10.0, -10.0, 25.0, 20.0, max_level=4)
    x0, y0, x1, y1 = _random_boxes(5, 3000)
    cs, _ = xz2_index(x0, y0, x1, y1)

    def member(ranges):
        m = np.zeros(len(cs), dtype=bool)
        for lo, hi in ranges:
            m |= (cs >= lo) & (cs <= hi)
        return m

    mf, mc = member(full), member(coarse)
    assert not (mf & ~mc).any()
