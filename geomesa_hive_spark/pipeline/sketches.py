"""Count-min sketch over a key column — sublinear-memory frequency
estimation for heavy-hitter / vocabulary workloads.

Why a pipeline needs it: exact token/url/ngram counting at 100 TB
produces a result as large as the distinct-key space (billions of
rows); a count-min sketch is a FIXED (depth x width) integer table —
kilobytes — with the classic one-sided guarantee
``true <= est <= true + (e/width)·N`` w.p. ``1 - e^-depth`` per query.
The sketch composes: tables built on different shards merge by cell-
wise addition (it's just a sum aggregation), which is what makes it a
streaming/partitioned-friendly counter.

Determinism: cell positions come from md5 substrings (the portable
unit-hash family used across the repo), counts are integer sums, and
estimation is an integer ``min`` over depth cells — every step replays
exactly in SQL, so the contract hash covers the sketch itself, not
just its outputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["countmin_positions", "countmin_build", "countmin_estimate"]


def countmin_positions(col, depth: int, width: int, seed: int = 42) -> Column:
    """Array of ``depth`` structs (row, pos): row j's cell index is the
    first 60 bits of md5('cm:seed:j:value') mod width."""
    v = (col if isinstance(col, Column) else F.col(col)).cast("string")
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":", F.lit("cm"), F.lit(str(seed)), F.lit(str(j)), v
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                )
                .cast("bigint")
                .__mod__(F.lit(int(width)))
                .alias("pos"),
            )
            for j in range(int(depth))
        ]
    )


def countmin_build(
    df: DataFrame,
    key_col,
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
    weight_col: str | None = None,
) -> DataFrame:
    """(row, pos, cnt) sketch cells — at most depth*width rows whatever
    the input size. One explode (x depth) + one map-side-combined
    groupBy; sketches over shards/streams merge by summing cnt."""
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    cells = df.select(
        F.explode(countmin_positions(key_col, depth, width, seed)).alias("c"),
        w.alias("w"),
    )
    return (
        cells.groupBy(F.col("c.row").alias("row"), F.col("c.pos").alias("pos"))
        .agg(F.sum("w").alias("cnt"))
    )


def countmin_estimate(
    keys: DataFrame,
    key_col: str,
    sketch: DataFrame,
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """(key, est) for every row of ``keys``: min over the key's depth
    cells. The sketch side is tiny (<= depth*width rows) and broadcast
    — estimating any number of keys is map-side + one small groupBy."""
    probes = keys.select(
        F.col(key_col).alias("key"),
        F.explode(countmin_positions(key_col, depth, width, seed)).alias("c"),
    ).select("key", F.col("c.row").alias("row"), F.col("c.pos").alias("pos"))
    joined = probes.join(F.broadcast(sketch), ["row", "pos"], "left")
    return (
        joined.groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
