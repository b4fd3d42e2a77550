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

__all__ = ["distribution_drift", "profile_columns", "key_skew"]


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


def distribution_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    bin_edges: list,
) -> DataFrame:
    """Population-Stability-Index drift report between two snapshots of
    one column — the scheduled data-quality check that catches a
    training-data distribution shifting under a model (repricing,
    scraper change, upstream schema drift) before it reaches a run.

    Fixed ``bin_edges`` (caller-owned — drift must be measured against
    a STABLE binning, never per-snapshot quantiles, or the report
    drifts with the data): bin id = number of edges ≤ value (0..n),
    NULLs get bin -1. Per observed bin the report carries exact counts,
    Laplace-smoothed integer-PPM shares (``(cnt+1)·1e6 DIV
    (total+n_bins)`` — smoothing keeps ln finite on one-sided bins,
    integer DIV keeps shares exact under any partitioning, the key_skew
    convention), and the PSI contribution quantized to integer
    micro-units (``round((pa−pb)·ln(pa/pb)·1e6)`` — the lm.py micro-nat
    convention, so Σ psi_micro is order-independent and a SQL oracle
    replays it). Bins observed in NEITHER snapshot are omitted (their
    smoothed contribution is not computed — stated, not hidden).

    Two snapshot scans + two 1-row collects + a bin-count full-outer
    merge (|bins| rows); nothing data-sized leaves the executors.
    PSI reading per industry convention: < 0.10 stable, 0.10–0.25
    moderate shift, > 0.25 investigate."""
    edges = sorted(float(e) for e in bin_edges)
    if not edges:
        raise ValueError("bin_edges must be non-empty")
    n_bins = len(edges) + 2  # value bins + the NULL bin

    def binned(df):
        b = None
        for x in edges:
            t = (F.col(col) >= F.lit(x)).cast("int")
            b = t if b is None else b + t
        return df.select(
            F.when(F.col(col).isNull(), F.lit(-1)).otherwise(b).alias("bin")
        ).groupBy("bin").agg(F.count("*").cast("long").alias("cnt"))

    # localCheckpoint the tiny per-bin counts (|bins| rows): each side
    # feeds both its total and the merge — unpinned, every consumer
    # would re-scan the snapshot, turning "two scans" into four
    ca, cb = binned(df_a).localCheckpoint(), binned(df_b).localCheckpoint()
    ta = int(ca.agg(F.sum("cnt")).collect()[0][0] or 0)
    tb = int(cb.agg(F.sum("cnt")).collect()[0][0] or 0)
    merged = (
        ca.alias("a").join(cb.alias("b"), "bin", "full_outer")
        .select(
            "bin",
            F.coalesce(F.col("a.cnt"), F.lit(0)).cast("long").alias("cnt_a"),
            F.coalesce(F.col("b.cnt"), F.lit(0)).cast("long").alias("cnt_b"),
        )
        .withColumn(
            "ppm_a",
            F.expr(f"((cnt_a + 1) * 1000000) DIV {ta + n_bins}").cast("long"),
        )
        .withColumn(
            "ppm_b",
            F.expr(f"((cnt_b + 1) * 1000000) DIV {tb + n_bins}").cast("long"),
        )
    )
    pa = F.col("ppm_a") / F.lit(1000000.0)
    pb = F.col("ppm_b") / F.lit(1000000.0)
    return merged.withColumn(
        "psi_micro",
        F.round((pa - pb) * F.log(pa / pb) * F.lit(1000000.0))
        .cast("long"),
    )
