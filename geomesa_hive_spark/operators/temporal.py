"""Temporal/interval joins Spark lacks as built-ins: as-of join, range join.

``asof_join(left, right, ...)`` matches each left row with the most
recent right row at-or-before its timestamp, per key — the time-series
enrichment primitive (trades→quotes, events→device state).

Spark-first plan, no UDFs and no range explosion: tag and UNION the two
sides, then one window pass per key ordered by (ts, side) carrying the
last-seen right ROW forward — the right timestamp and every payload
column packed into ONE struct, carried with a single
``last(struct, ignorenulls=True)`` over rows unbounded-preceding — then
keep the left rows and unpack the struct's fields. Carrying one struct
(rather than each column independently) guarantees row coherence: all
returned right values, and the timestamp the tolerance check validates,
come from the same matched right row even when some of its payload
fields are NULL. Cost = one shuffle on the key + an in-partition sort —
identical shape to any windowed aggregate, so it scales exactly as far
as Spark windows do. The naive alternatives both die at scale: an
inequality join degenerates to a per-key cross product, and a broadcast
of the right side caps at driver memory.

DuckDB's native ``ASOF JOIN`` provides the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join", "scd2_intervals"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right.on <= left.on`` (and equal ``by`` keys), else nulls.

    ``tolerance``: an INTERVAL string (e.g. ``'2 hours'``) — matches
    older than ``left.on - tolerance`` are discarded (null result), the
    pandas ``merge_asof`` semantics. Output = all left rows + the chosen
    right columns renamed with ``suffix``.
    """
    from pyspark.sql.types import StructField, StructType

    by_cols = [by] if isinstance(by, str) else list(by or [])
    rcols = right_cols or [
        c for c in right.columns if c != on and c not in by_cols
    ]

    # one struct = one coherent right row: its timestamp + every payload
    # column. NULL payload fields stay NULL; the struct itself is only
    # NULL on left rows, so last(ignorenulls) always lands on a real row.
    pack_t = StructType(
        [StructField("__rts", right.schema[on].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in rcols]
    )
    lpay = [c for c in left.columns if c not in by_cols and c != on]
    l_u = left.select(
        *by_cols,
        F.col(on),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lpay],
        F.lit(None).cast(pack_t).alias("__rpack"),
    )
    r_u = right.select(
        *by_cols,
        F.col(on),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        F.struct(
            F.col(on).alias("__rts"),
            *[F.col(c) for c in rcols],
        ).alias("__rpack"),
    )
    u = l_u.unionByName(r_u)

    # right rows sort BEFORE left rows at equal ts (side 0 < 1), so an
    # exactly-simultaneous right row is visible to the left row — the
    # standard at-or-before semantics
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *by_cols,
        F.col(on),
        F.col("__side"),
        *[F.col(c) for c in lpay],
        F.last("__rpack", ignorenulls=True).over(w).alias("__rpack"),
    )
    out = carried.filter(F.col("__side") == 1)
    ok = F.lit(True)
    if tolerance is not None:
        ok = F.col("__rpack.__rts") >= F.col(on) - F.expr(
            f"INTERVAL {tolerance}"
        )
    return out.select(
        *by_cols,
        F.col(on),
        *[F.col(c) for c in lpay],
        *[
            F.when(ok, F.col(f"__rpack.{c}")).alias(f"{c}{suffix}")
            for c in rcols
        ],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_size: float,
    inclusive: str = "both",
) -> DataFrame:
    """Join left rows to right intervals containing their value:
    ``lo <= v <= hi`` (bounds per ``inclusive``: both|left|right|neither).

    The 1-D sibling of the grid spatial join: a plain inequality join
    would be planned as a broadcast-nested-loop (O(|L|·|R|)); instead
    each interval explodes to the fixed-size bins it overlaps, the value
    bins to exactly one, and the join is an equi-join on bin id — hash
    shuffle both sides once, exact bound check on bin-collocated
    candidates. No dedup pass is needed: a (value, interval) pair
    co-occurs in exactly the value's single bin. Pick ``bin_size`` ≈ p95
    interval width so intervals explode to ≤ 2-3 bins.
    """
    checks = {
        "both": (F.col("__v") >= F.col(lo_col)) & (F.col("__v") <= F.col(hi_col)),
        "left": (F.col("__v") >= F.col(lo_col)) & (F.col("__v") < F.col(hi_col)),
        "right": (F.col("__v") > F.col(lo_col)) & (F.col("__v") <= F.col(hi_col)),
        "neither": (F.col("__v") > F.col(lo_col)) & (F.col("__v") < F.col(hi_col)),
    }
    if inclusive not in checks:
        raise ValueError(f"inclusive must be one of {sorted(checks)}")
    bs = F.lit(float(bin_size))
    l = left.withColumn("__v", F.col(value_col).cast("double")).withColumn(
        "__bin", F.floor(F.col("__v") / bs).cast("long")
    )
    r = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col).cast("double") / bs).cast("long"),
                F.floor(F.col(hi_col).cast("double") / bs).cast("long"),
            )
        ),
    )
    return l.join(r, "__bin").filter(checks[inclusive]).drop("__bin", "__v")


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 interval builder from a change
    stream — the warehouse primitive that turns an event log into
    versioned validity ranges: per key, order rows by (ts, tiebreak),
    drop rows whose tracked attributes ALL equal the previous row's
    (CDC compaction, null-safe), then emit one row per surviving change
    with ``valid_from`` = its timestamp, ``valid_to`` = the next
    change's timestamp (null = current version) and a 1-based
    ``version``. Deterministic under any partitioning: the tiebreak
    column makes the per-key order total.

    Scale: two window passes over the same (key) partitioning — one
    shuffle; Spark external-sorts within keys so arbitrarily long
    histories hold. No joins, no state beyond the window frame."""
    from functools import reduce as _reduce

    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    lag_cols = [
        F.lag(F.col(a)).over(w).alias(f"__lag_{a}") for a in attr_cols
    ]
    d2 = df.select(
        key_col, ts_col, tiebreak_col, *attr_cols,
        *lag_cols,
        F.lag(F.col(tiebreak_col)).over(w).isNull().alias("__first"),
    )
    same = _reduce(
        lambda a, b: a & b,
        [F.col(a).eqNullSafe(F.col(f"__lag_{a}")) for a in attr_cols],
    )
    changed = d2.filter(F.col("__first") | ~same)
    w2 = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    return changed.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    )
