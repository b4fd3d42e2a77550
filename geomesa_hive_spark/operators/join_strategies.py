"""Join strategies for scale: bucketed co-located joins and skew salting.

Neither exists in the reference (it delegates all joins to Spark), but
both are core to running its workloads at 100 TB:

- **Bucketing** pre-shuffles a table ONCE at write time
  (`bucketBy(n, key)` + `saveAsTable`); any later equi-join or
  aggregation on the bucket key reads co-located buckets and skips the
  shuffle entirely — the biggest single lever for repeated fact-fact
  joins. Verified by the test suite: a bucketed-bucketed join plan
  contains zero Exchange operators.
- **Salting** splits a hot key into ``salt`` sub-keys: the skewed side
  gets a random salt per row, the other side is exploded ``salt``-fold
  so every sub-key still finds its match. Turns one straggler task into
  ``salt`` even ones at the price of replicating the smaller side.
  (AQE's skew-join split handles moderate skew automatically; salting is
  for the pathological single-key case where one key exceeds an
  executor.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_bucketed", "salted_join", "assert_no_exchange",
    "bucketed_equijoin",
]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 64,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) parquet table.

    Join/groupBy on ``bucket_cols`` against another table bucketed the
    SAME way (same columns, same ``num_buckets``) runs shuffle-free;
    sorting within buckets additionally enables shuffle-free
    sort-merge-join. At 100 TB pick ``num_buckets`` ≈ cluster cores so
    one bucket ≈ one task. ``path`` makes the table EXTERNAL (data at
    the caller's location, layout in the catalog — bucketing only
    lives in a catalog table; plain ``parquet(path)`` reads lose it)."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *cols)
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sc)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def assert_no_exchange(df: DataFrame) -> str:
    """Assert the physical plan for ``df`` contains NO Exchange (i.e.
    no shuffle) — the property bucketing exists to buy. Returns the
    plan string for logging/tests; raises AssertionError with the plan
    when an exchange is present."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(f"plan contains an Exchange:\n{plan}")
    return plan


def bucketed_equijoin(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key and PROVE
    the join shuffled nothing (``assert_no_exchange`` on the join
    subplan). The merge hint pins SortMergeJoin so a small side can't
    be broadcast — broadcasting would also avoid the exchange but
    would prove nothing about the bucket layout."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    joined = left.hint("merge").join(right, on=on)
    assert_no_exchange(joined)
    return joined


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join on ``on`` with the LEFT side treated as skewed.

    left gets ``__salt`` = uniform[0, salt); right is exploded into all
    ``salt`` replicas; the join key becomes (on, __salt), so a hot key's
    rows spread over ``salt`` partitions. Result columns = the plain
    join's (salt column dropped). Join semantics are preserved for
    inner/left joins (every left row still matches exactly the rows it
    would have)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join preserves semantics for inner/left only")
    l = left.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l.join(r, [on, "__salt"], how).drop("__salt")
