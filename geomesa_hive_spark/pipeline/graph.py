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

__all__ = ["pagerank", "shortest_paths", "triangle_count"]


def shortest_paths(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    landmarks: list,
    max_iters: int = 6,
) -> DataFrame:
    """Unweighted single-source shortest-path distances from a set of
    LANDMARK nodes (GraphFrames' ``shortestPaths`` shape, the landmark
    trick behind approximate graph distances at scale): returns
    ``(node, landmark, dist)`` for every node reachable from a landmark
    within ``max_iters`` hops, following edge direction.

    Distributed BFS, one frontier round per hop: expand the frontier
    across the edge list (a join on ``src``), drop nodes whose
    (node, landmark) pair is already settled (first visit = shortest
    distance in an unweighted graph — a broadcast-able anti-join while
    the settled set is small, Spark's planner picks), and stop early
    when the frontier empties. Work per round is O(frontier-adjacent
    edges), never the whole graph; state is one row per reached
    (node, landmark) pair — |landmarks| × reachable nodes, the exact
    output size. ``localCheckpoint`` cuts the growing lineage each
    round (the iterative-loop discipline pagerank's 3 fixed rounds can
    skip).

    Everything is exact integer arithmetic, so a recursive-CTE oracle
    (bounded walk + MIN per pair) replays it bit-for-bit."""
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct()
    spark = edges.sparkSession
    state = spark.createDataFrame(
        [(int(l), int(l), 0) for l in landmarks],
        "node long, landmark long, dist int",
    )
    frontier = state
    for d in range(1, int(max_iters) + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                F.col("landmark"),
                F.lit(d).cast("int").alias("dist"),
            )
            .distinct()
            .join(state, ["node", "landmark"], "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        state = state.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return state


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


def triangle_count(
    edges: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Per-node triangle counts (node, tri) over the UNDIRECTED graph —
    the standard degree-ordered wedge join: rank nodes by (degree, id),
    orient every undirected edge low→high rank, pair each node's
    out-edges into wedges, and close them against the oriented edge
    set. Each triangle is emitted exactly once (its rank-lowest vertex
    owns it) and the wedge fan-out is bounded by the ORIENTED
    out-degree — the classic O(m^1.5) total-work bound that survives
    power-law skew, because a hub's edges orient INTO it and never pair
    (the naive wedge-on-any-vertex join explodes quadratically on
    hubs). Nodes in no triangle are omitted (LEFT-join a node table
    with coalesce(0) if zeros are needed).

    Shuffles: degree groupBy, the wedge self-join on the owning vertex,
    the closing-edge equi-join, one final explode+groupBy. Everything
    is exact integer counting — no quantization needed."""
    e0 = edges.select(
        F.least(F.col(src_col), F.col(dst_col)).cast("long").alias("lo"),
        F.greatest(F.col(src_col), F.col(dst_col)).cast("long").alias("hi"),
    ).filter(F.col("lo") != F.col("hi")).distinct()
    deg = (
        e0.select(F.col("lo").alias("node"))
        .union(e0.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    dl = deg.select(F.col("node").alias("lo"), F.col("deg").alias("ldeg"))
    dh = deg.select(F.col("node").alias("hi"), F.col("deg").alias("hdeg"))
    ranked = e0.join(dl, "lo").join(dh, "hi")
    fwd = F.col("ldeg") < F.col("hdeg")
    tie = (F.col("ldeg") == F.col("hdeg")) & (F.col("lo") < F.col("hi"))
    oe = ranked.select(
        F.when(fwd | tie, F.col("lo")).otherwise(F.col("hi")).alias("src"),
        F.when(fwd | tie, F.col("hi")).otherwise(F.col("lo")).alias("dst"),
        F.when(fwd | tie, F.col("ldeg")).otherwise(F.col("hdeg")).alias("sdeg"),
        F.when(fwd | tie, F.col("hdeg")).otherwise(F.col("ldeg")).alias("ddeg"),
    )
    w1 = oe.select(
        F.col("src").alias("a"), F.col("dst").alias("b"),
        F.col("ddeg").alias("bdeg"),
    )
    w2 = oe.select(
        F.col("src").alias("a"), F.col("dst").alias("c"),
        F.col("ddeg").alias("cdeg"),
    )
    wedges = w1.join(w2, "a").filter(
        (F.col("bdeg") < F.col("cdeg"))
        | ((F.col("bdeg") == F.col("cdeg")) & (F.col("b") < F.col("c")))
    )
    closing = oe.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tris = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    return (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("tri"))
    )
