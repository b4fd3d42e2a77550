"""Grid DBSCAN vs a brute-force single-node reference implementation."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from geomesa_hive_spark.operators.dbscan import dbscan, eps_neighbor_pairs


def _brute_dbscan(xs, ys, eps, min_pts):
    """Reference: same semantics (self-inclusive counts, min-core-id
    labels, min-label border assignment, -1 noise)."""
    n = len(xs)
    d2 = (xs[:, None] - xs[None, :]) ** 2 + (ys[:, None] - ys[None, :]) ** 2
    nb = d2 <= eps * eps
    counts = nb.sum(axis=1)  # self-inclusive
    core = counts >= min_pts
    # union-find over core-core edges
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        if not core[i]:
            continue
        for j in range(i + 1, n):
            if core[j] and nb[i, j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    label = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        if core[i]:
            label[i] = find(i)
    # min core id per component
    comp_min = {}
    for i in range(n):
        if core[i]:
            r = find(i)
            comp_min[r] = min(comp_min.get(r, i), i)
    for i in range(n):
        if core[i]:
            label[i] = comp_min[find(i)]
    for i in range(n):
        if not core[i]:
            cands = [label[j] for j in range(n) if core[j] and nb[i, j]]
            if cands:
                label[i] = min(cands)
    return core.astype(int), label


def test_dbscan_matches_bruteforce(spark):
    rng = np.random.default_rng(5)
    # three dense blobs + uniform noise
    blob = lambda cx, cy, n: (
        rng.normal(cx, 1.0, n), rng.normal(cy, 1.0, n)
    )
    xs = np.concatenate([blob(0, 0, 60)[0], blob(20, 10, 40)[0], blob(-15, -5, 30)[0],
                         rng.uniform(-50, 50, 40)])
    ys = np.concatenate([blob(0, 0, 60)[1], blob(20, 10, 40)[1], blob(-15, -5, 30)[1],
                         rng.uniform(-30, 30, 40)])
    n = len(xs)
    df = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n, dtype=np.int64), "x": xs, "y": ys})
    )
    eps, min_pts = 2.0, 5
    got = dbscan(df, "id", "x", "y", eps, min_pts).toPandas().sort_values("id")
    core, label = _brute_dbscan(xs, ys, eps, min_pts)
    assert (got["is_core"].to_numpy() == core).all()
    assert (got["cluster_id"].to_numpy() == label).all()
    # sanity: the three blobs produced clusters and some noise exists
    assert len(set(label[label >= 0])) >= 3
    assert (label == -1).any()


def test_pairs_match_bruteforce_across_cells(spark):
    rng = np.random.default_rng(6)
    xs = rng.uniform(-10, 10, 120)
    ys = rng.uniform(-10, 10, 120)
    df = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(120, dtype=np.int64), "x": xs, "y": ys})
    )
    eps = 3.0
    got = {
        (r.id_a, r.id_b)
        for r in eps_neighbor_pairs(df, "id", "x", "y", eps).collect()
    }
    d2 = (xs[:, None] - xs[None, :]) ** 2 + (ys[:, None] - ys[None, :]) ** 2
    want = {
        (i, j)
        for i in range(120)
        for j in range(120)
        if i != j and d2[i, j] <= eps * eps
    }
    assert got == want


def test_isolated_core_singleton_and_all_noise(spark):
    # two tight triplets far apart + a lone point
    pdf = pd.DataFrame({
        "id": [1, 2, 3, 10, 11, 12, 99],
        "x": [0.0, 0.1, 0.2, 50.0, 50.1, 50.2, -80.0],
        "y": [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    })
    df = spark.createDataFrame(pdf)
    out = {r.id: (r.is_core, r.cluster_id)
           for r in dbscan(df, "id", "x", "y", 0.5, 3).collect()}
    assert out[1] == (1, 1) and out[2] == (1, 1) and out[3] == (1, 1)
    assert out[10] == (1, 10) and out[12] == (1, 10)
    assert out[99] == (0, -1)
    # min_pts too high -> everything is noise
    out2 = {r.id: (r.is_core, r.cluster_id)
            for r in dbscan(df, "id", "x", "y", 0.5, 5).collect()}
    assert all(v == (0, -1) for v in out2.values())


def test_min_pts_one_zero_neighbor_singleton(spark):
    """min_pts=1 is satisfied by self-inclusion alone: a point with ZERO
    eps-neighbors must be a singleton core cluster, not noise (r3 ADVICE
    regression — the pair-derived count path had no row for it)."""
    pdf = pd.DataFrame({
        "id": [1, 2, 3],
        "x": [0.0, 0.1, 99.0],
        "y": [0.0, 0.0, 99.0],
    })
    out = {r.id: (r.is_core, r.cluster_id)
           for r in dbscan(spark.createDataFrame(pdf), "id", "x", "y", 0.5, 1).collect()}
    assert out == {1: (1, 1), 2: (1, 1), 3: (1, 3)}
