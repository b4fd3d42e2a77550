"""Graph analytics over edge lists. Connected components (hash-min
label propagation) lives in ``pipeline/dedup.py``; this module adds
PageRank — the canonical iterative join-shaped workload.

Exactness design (the repo's standard trick, cf. TF-IDF and the
decimal centroid means): ranks are INTEGER micro-units and every
operation is integer arithmetic — contribution = r DIV out_deg, new
rank = base + (damping·Σinflow) DIV 100 — so per-iteration results are
independent of Spark's aggregation order and a DuckDB oracle replays
the loop bit-for-bit. The DIV quantization loses < 1 micro-unit per
edge per iteration (~1e-6 relative), far below any ranking use; in
exchange, an ITERATIVE float algorithm becomes hash-verifiable.

Scale: per iteration, one shuffle joining ranks to edges on src (edges
can be pre-partitioned by src so the join is co-located across
iterations) and one aggregation by dst. Rank state is 16 bytes/node.
Dangling nodes (no out-edges) drop their mass instead of
redistributing it — the common simplification; total mass therefore
decays slightly rather than staying 1·N, which is fine for ranking and
keeps the loop one-shuffle-per-iteration (mass redistribution would
add a global scalar per round — a bounded collect if ever needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000,
) -> DataFrame:
    """Integer-quantized PageRank. Returns (node, r) with r in
    micro-units of ``scale`` (uniform start = ``scale`` per node).
    ``damping_pct`` is the damping factor in percent (85 ≙ 0.85)."""
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    base = ((100 - damping_pct) * scale) // 100
    ranks = nodes.withColumn("r", F.lit(int(scale)).cast("long"))
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(F.col("dst"), F.expr("r DIV deg").alias("c"))
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("inflow"))
        ranks = nodes.join(
            inflow.withColumnRenamed("dst", "node"), "node", "left"
        ).select(
            "node",
            (
                F.lit(int(base))
                + F.expr(f"({int(damping_pct)} * coalesce(inflow, 0)) DIV 100")
            ).cast("long").alias("r"),
        )
    return ranks
