"""XZ2 index as *generated SQL arithmetic* + layout/pruning helpers.

The index math lives in ``geom/xz2.py`` (NumPy, documented derivation).
This module emits the same computation as a list of plain SQL column
stages that parse identically in Spark SQL and DuckDB — every operation
is dyadic (powers of two), so floor/compare/multiply are exact IEEE
doubles in both engines and the replay is bit-identical. That keeps the
hot path 100% native (whole-stage codegen, no Python), and lets the
DuckDB oracle replay the index value for the correctness gate.

At scale: ``write_xz2_partitioned`` range-clusters rows along the XZ2
curve so a window query's handful of code BETWEENs maps to contiguous
file/row-group spans — same layout story as the Z2 point path
(``operators/partitioning.py``), but sound for extended geometries: a
polygon's single XZ2 code *always* falls inside one of the query ranges
when the polygon intersects the window (no centroid-miss false
negatives; see geom/xz2.py docstring).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from geomesa_hive_spark.geom.xz2 import DEFAULT_G, xz2_index, xz2_query_ranges

__all__ = [
    "xz2_sql_stages",
    "apply_stages",
    "wrap_oracle_sql",
    "xz2_range_predicate",
    "add_xz2_column",
    "write_xz2_partitioned",
    "xz2_window_filter",
]


def _half_pow_literal(l: int) -> str:
    # 0.5**l has an exact finite decimal expansion; repr() emits it fully
    return repr(0.5**l)


def xz2_sql_stages(
    xmin: str,
    ymin: str,
    xmax: str,
    ymax: str,
    g: int = DEFAULT_G,
    out: str = "xz2",
) -> list[tuple[str, str]]:
    """[(column_name, sql_expr)] stages computing the XZ2 code ``out``
    (and ``out || '_len'``) from lon/lat bbox expressions. Later stages
    reference earlier stage names, so apply them in order (Spark:
    ``apply_stages``; DuckDB: ``wrap_oracle_sql``). Dialect-neutral SQL:
    CASE/least/greatest/floor/CAST/%/arithmetic only."""
    n = f"_{out}_"  # scratch column prefix
    stages: list[tuple[str, str]] = []
    stages.append((f"{n}nxmin", f"least(greatest((({xmin}) + 180.0) / 360.0, 0.0), 1.0)"))
    stages.append((f"{n}nymin", f"least(greatest((({ymin}) + 90.0) / 180.0, 0.0), 1.0)"))
    stages.append(
        (f"{n}nxmax", f"greatest(least(greatest((({xmax}) + 180.0) / 360.0, 0.0), 1.0), {n}nxmin)")
    )
    stages.append(
        (f"{n}nymax", f"greatest(least(greatest((({ymax}) + 90.0) / 180.0, 0.0), 1.0), {n}nymin)")
    )
    stages.append((f"{n}md", f"greatest({n}nxmax - {n}nxmin, {n}nymax - {n}nymin)"))
    # l1 = max l with md <= 0.5^l  (descending CASE chain of exact dyadic literals)
    whens = " ".join(
        f"WHEN {n}md <= {_half_pow_literal(l)} THEN {l}" for l in range(g, 0, -1)
    )
    stages.append((f"{n}l1", f"(CASE {whens} ELSE 0 END)"))
    w2s = " ".join(f"WHEN {l} THEN {_half_pow_literal(l + 1)}" for l in range(0, g))
    stages.append((f"{n}w2", f"(CASE {n}l1 {w2s} ELSE {_half_pow_literal(g + 1)} END)"))
    fit = (
        "({mx} <= CAST(floor({mn} / {w2}) AS BIGINT) * {w2} + 2.0 * {w2})"
    )
    fx = fit.format(mx=f"{n}nxmax", mn=f"{n}nxmin", w2=f"{n}w2")
    fy = fit.format(mx=f"{n}nymax", mn=f"{n}nymin", w2=f"{n}w2")
    stages.append(
        (
            f"{out}_len",
            f"(CASE WHEN {n}l1 >= {g} THEN {g} "
            f"WHEN {fx} AND {fy} THEN {n}l1 + 1 ELSE {n}l1 END)",
        )
    )
    terms = []
    for i in range(g):
        p = 1 << (i + 1)
        ic = (4 ** (g - i) - 1) // 3
        qx = f"(least(CAST(floor({n}nxmin * {p}.0) AS BIGINT), {p - 1}) % 2)"
        qy = f"(least(CAST(floor({n}nymin * {p}.0) AS BIGINT), {p - 1}) % 2)"
        terms.append(
            f"(CASE WHEN {i} < {out}_len THEN CAST(1 + ({qx} + 2 * {qy}) * {ic} AS BIGINT) ELSE 0 END)"
        )
    stages.append((out, "(" + " + ".join(terms) + ")"))
    return stages


def apply_stages(
    df: DataFrame, stages: list[tuple[str, str]], keep_scratch: bool = False
) -> DataFrame:
    """Apply SQL stages on Spark (each stage may reference earlier ones).

    Scratch stages (leading underscore) are projected away at the end —
    Catalyst collapses the whole chain into one Project, so they never
    materialize."""
    for name, expr in stages:
        df = df.selectExpr("*", f"{expr} AS {name}")
    if not keep_scratch:
        df = df.drop(*[name for name, _ in stages if name.startswith("_")])
    return df


def wrap_oracle_sql(inner: str, stages: list[tuple[str, str]]) -> str:
    """Nest ``inner`` (a SELECT) under the same stages for DuckDB."""
    sql = f"({inner})"
    for name, expr in stages:
        sql = f"(SELECT *, {expr} AS {name} FROM {sql})"
    return sql


def xz2_range_predicate(
    window: tuple[float, float, float, float],
    col: str = "xz2",
    g: int = DEFAULT_G,
    max_level: int | None = 7,
) -> str:
    """SQL predicate string: ORed BETWEENs over the window's code ranges.

    Parquet min/max stats prune on each BETWEEN; on an XZ2-clustered
    layout the ranges are contiguous file spans. ``max_level`` bounds the
    range count (the 100 TB knob): measured on 20k random boxes, depth 7
    gives ~48 ranges/query at the same ~2.4% pre-refine false-positive
    floor as full depth (~1400 ranges) — deeper traversal buys nothing
    because stored codes at shallow levels (big geometries) must be
    enumerated as singletons either way. Pass None for full depth."""
    ranges = xz2_query_ranges(*window, g=g, max_level=max_level)
    parts = [f"({col} BETWEEN {lo} AND {hi})" for lo, hi in ranges]
    return "(" + " OR ".join(parts) + ")"


@pandas_udf(T.StructType([
    T.StructField("xz2", T.LongType()),
    T.StructField("xz2_len", T.IntegerType()),
]))
def _xz2_udf(xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series) -> pd.DataFrame:
    cs, length = xz2_index(
        xmin.to_numpy(), ymin.to_numpy(), xmax.to_numpy(), ymax.to_numpy()
    )
    return pd.DataFrame({"xz2": cs, "xz2_len": length.astype("int32")})


def add_xz2_column(
    df: DataFrame,
    xmin: str,
    ymin: str,
    xmax: str,
    ymax: str,
    g: int = DEFAULT_G,
    out: str = "xz2",
    native: bool = False,
) -> DataFrame:
    """XZ2 code (+ ``{out}_len``) column for a lon/lat bbox.

    Default path is the Arrow-vectorized NumPy UDF — identical values to
    the SQL stages (property-tested), and crucially an **optimizer
    barrier**: any later filter over the code (window-range membership)
    stops at the Python eval node instead of substituting a ~10-deep
    aliased expression chain into every predicate clause. Catalyst's
    PushDownPredicates/InferFiltersFromConstraints both do that
    substitution unconditionally and the expression product blew the
    driver heap in testing (see ``xz2_window_filter``).

    ``native=True`` applies the pure-SQL stages instead — right for the
    *write* path (``write_xz2_partitioned``), where nothing filters over
    the computed column in-plan and the arithmetic stays inside
    whole-stage codegen."""
    if native:
        return apply_stages(df, xz2_sql_stages(xmin, ymin, xmax, ymax, g=g, out=out))
    if g != DEFAULT_G:
        raise ValueError("UDF path is compiled for DEFAULT_G; use native=True for custom g")
    s = _xz2_udf(F.col(xmin), F.col(ymin), F.col(xmax), F.col(ymax))
    return (
        df.withColumn("_xz2_s", s)
        .withColumn(out, F.col("_xz2_s.xz2"))
        .withColumn(f"{out}_len", F.col("_xz2_s.xz2_len"))
        .drop("_xz2_s")
    )


def write_xz2_partitioned(
    df: DataFrame,
    path: str,
    xmin: str,
    ymin: str,
    xmax: str,
    ymax: str,
    g: int = DEFAULT_G,
    mode: str = "overwrite",
    num_files: int | None = None,
) -> None:
    """Range-cluster on the XZ2 code and write parquet (cf. Z2 writer at
    ``partitioning.py:36`` — same layout-bound pruning argument, but the
    key is sound for extended geometries). Uses the native-SQL code
    computation — write-time indexing of 100 TB stays in whole-stage
    codegen, no Python in the ingest path."""
    enriched = add_xz2_column(df, xmin, ymin, xmax, ymax, g=g, native=True)
    clustered = (
        enriched.repartitionByRange(num_files, "xz2")
        if num_files
        else enriched.repartitionByRange("xz2")
    ).sortWithinPartitions("xz2")
    clustered.write.mode(mode).parquet(path)


def xz2_window_filter(
    df: DataFrame,
    window: tuple[float, float, float, float],
    xmin: str,
    ymin: str,
    xmax: str,
    ymax: str,
    xz2_col: str = "xz2",
    g: int = DEFAULT_G,
    max_level: int | None = 7,
) -> DataFrame:
    """Window query: XZ2 range scan + exact bbox refine.

    Two shapes depending on where the key lives:

    - **stored column** (the write-time layout, ``write_xz2_partitioned``):
      use ``xz2_range_predicate`` directly — ORed BETWEENs on a physical
      long column reach the parquet scan and prune on min/max stats.
    - **computed column** (this helper): the BETWEEN form is a trap —
      Catalyst pushes the filter through the Project and substitutes the
      full stage expression into EVERY clause, and a broadcast interval
      join is just as bad (InferFiltersFromConstraints chases the alias
      chain through the non-equi condition); both blew the driver heap
      in testing. The shape that stays linear is a higher-order
      ``exists()`` over a *literal array* of range structs: the key
      expression appears exactly once, the constant array folds once,
      and the whole filter stays inside whole-stage codegen. O(ranges)
      comparisons per row on a long — ranges are query-constant
      (~10^1-10^2), never data-sized, so this holds at any scale."""
    qx0, qy0, qx1, qy1 = window
    ranges = xz2_query_ranges(qx0, qy0, qx1, qy1, g=g, max_level=max_level)
    arr = "array(" + ",".join(
        f"named_struct('lo',CAST({lo} AS BIGINT),'hi',CAST({hi} AS BIGINT))"
        for lo, hi in ranges
    ) + ")"
    hits = df.filter(
        F.expr(f"exists({arr}, r -> `{xz2_col}` >= r.lo AND `{xz2_col}` <= r.hi)")
    )
    refine = (
        f"({xmin}) <= {qx1!r} AND ({xmax}) >= {qx0!r} "
        f"AND ({ymin}) <= {qy1!r} AND ({ymax}) >= {qy0!r}"
    )
    return hits.filter(F.expr(refine))
