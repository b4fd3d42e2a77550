"""Column profiling — the data-quality report every ingest pipeline
runs before training: per column, row count, null count, exact
distinct count, and lexicographic min/max (stringified so one output
schema covers every input type). One wide aggregate per column batch;
`count(DISTINCT)` per column is the exact variant — swap to
`approx_count_distinct` at 100 TB (the HLL path `approx_stats` already
verifies) when exactness isn't worth the extra shuffle, which is the
standard trade and stated here rather than silently chosen.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(
    df: DataFrame, cols: list[str], exact_distinct: bool = True
) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_s, max_s) — one row per
    profiled column, deterministic output across partitionings (counts
    are exact; min/max stringify AFTER aggregation so numeric order is
    used, not string order)."""
    parts = []
    for c in cols:
        nd = (
            F.count_distinct(F.col(c)) if exact_distinct
            else F.approx_count_distinct(F.col(c))
        )
        parts.append(
            df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.col(c).isNull().cast("long")).cast("long").alias("n_null"),
                nd.cast("long").alias("n_distinct"),
                F.min(F.col(c)).cast("string").alias("min_s"),
                F.max(F.col(c)).cast("string").alias("max_s"),
            ).select(F.lit(c).alias("column"), "*")
        )
    return reduce(DataFrame.unionByName, parts)
