"""Column profiling — the data-quality report every ingest pipeline
runs before training: per column, row count, null count, distinct
count, and min/max (stringified AFTER aggregation so numeric order is
used, then one output schema covers every input type).

Single-scan by construction: ALL profiled columns are computed in ONE
``df.agg`` (flat list of per-column null/distinct/min/max aggregates
plus one shared row count), then the wide single row is unpivoted to
the per-column report schema with an explode over literal structs —
a driver-free reshape of one row. The DEFAULT distinct count is
``approx_count_distinct`` (HLL sketches, ~2% error): it needs no
Expand and is the right 100 TB trade. Opting into
``exact_distinct=True`` plans the multiple ``count(DISTINCT)``
aggregates as a single-scan Expand — the source parquet is still
read once, but every row is replicated ``len(cols)``× inside the
stage, so at 100 TB the exact path shuffles N_cols× the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "key_skew"]


def profile_columns(
    df: DataFrame, cols: list[str], exact_distinct: bool = False
) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_s, max_s) — one row per
    profiled column, deterministic output across partitionings (min/max
    stringify AFTER aggregation so numeric order is used, not string
    order). One scan of ``df`` regardless of ``len(cols)``.
    ``n_distinct`` is an HLL estimate by default; pass
    ``exact_distinct=True`` to accept the Expand's ``len(cols)``× row
    replication inside the aggregation stage in exchange for exact
    counts (fine at audit scale, wrong at 100 TB)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for i, c in enumerate(cols):
        nd = (
            F.count_distinct(F.col(c)) if exact_distinct
            else F.approx_count_distinct(F.col(c))
        )
        aggs += [
            F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0))
            .cast("long").alias(f"_nn_{i}"),
            nd.cast("long").alias(f"_nd_{i}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{i}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{i}"),
        ]
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"_nn_{i}").alias("n_null"),
            F.col(f"_nd_{i}").alias("n_distinct"),
            F.col(f"_mn_{i}").alias("min_s"),
            F.col(f"_mx_{i}").alias("max_s"),
        )
        for i, c in enumerate(cols)
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


def key_skew(
    df: DataFrame,
    key_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Join-key skew report — the pre-join diagnostic that decides
    between a plain shuffle join, AQE skew handling, and explicit
    salting (the entity-linkage `block_shards` lesson: AQE's
    input-byte skew detection cannot see compute-heavy hot keys, so
    you MEASURE first). One map-side-combined groupBy counts keys;
    the tiny aggregate then yields the global totals by a second
    count-sized aggregation, and shares are integer PPM (exact under
    any partitioning).

    Returns the ``top_k`` heaviest keys: (key, cnt, share_ppm,
    cum_rank) ordered by (cnt desc, key) — a key with share_ppm ≫
    1e6/shuffle-partitions is the one that makes a straggler."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("t")).collect()[0]["t"]
    if total is None:
        # empty input: sum() aggregates to NULL — return an empty
        # report with the output schema (key keeps its input type)
        # instead of crashing on the DIV-by-total expression
        from pyspark.sql.types import LongType, StructField, StructType

        key_type = df.schema[key_col].dataType
        return df.sparkSession.createDataFrame(
            [],
            StructType([
                StructField("key", key_type),
                StructField("cnt", LongType()),
                StructField("share_ppm", LongType()),
                StructField("cum_rank", LongType()),
            ]),
        )
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("key"))
        .limit(int(top_k))
        .select(
            "key",
            F.col("cnt").cast("long").alias("cnt"),
            # integer DIV, not float-divide-then-cast: Spark's
            # double→long cast truncates while DuckDB's ROUNDS —
            # exact integer arithmetic sidesteps the mismatch
            F.expr(f"(cnt * 1000000L) DIV {int(total)}")
            .cast("long").alias("share_ppm"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cnt").desc(), F.col("key"))
    return top.withColumn(
        "cum_rank", F.row_number().over(w).cast("long")
    )
