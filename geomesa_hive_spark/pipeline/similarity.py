"""Similarity search over embedding columns (``array<float>``).

- :func:`knn_brute` — exact cosine top-k against a query vector: native
  array expressions (zip_with/aggregate in float64), a single scan +
  ``orderBy limit k`` (Spark's TakeOrderedAndProject — no full sort).
  The correctness baseline.
- :func:`random_hyperplane_buckets` / :func:`knn_lsh` — sign-LSH: b
  fixed random hyperplanes (seeded, materialized as literal arrays) →
  b-bit bucket id, all native expressions. Probing the query's bucket
  (optionally multi-probe with Hamming-1 neighbors) touches ~n/2^b of
  the data — the scale path: at 100 TB the bucket id is a stored,
  partitionable column and a probe is partition pruning.
- :func:`knn_ivf` — IVF-style: coarse centroids (sampled + refined),
  rows assigned to nearest centroid; query probes the p nearest lists.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geomesa_hive_spark.pipeline.dedup import cosine_sim

__all__ = [
    "cosine_to_query",
    "knn_brute",
    "random_hyperplane_buckets",
    "knn_lsh",
    "knn_ivf",
    "knn_join_brute",
    "knn_join_lsh",
]


def _query_lit(query_vec) -> Column:
    return F.array(*[F.lit(float(v)) for v in query_vec])


def cosine_to_query(vec_col, query_vec) -> Column:
    """Cosine similarity of an array column against a literal query vector."""
    q = _query_lit(query_vec)
    return cosine_sim(F.col(vec_col) if isinstance(vec_col, str) else vec_col, q)


def knn_brute(
    df: DataFrame, id_col: str, vec_col: str, query_vec, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine (ties broken by id for determinism)."""
    sim = cosine_to_query(vec_col, query_vec)
    return (
        df.select(F.col(id_col).alias("id"), F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("id"))
        .limit(k)
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bits, dim))


def random_hyperplane_buckets(
    df: DataFrame, vec_col: str, dim: int, bits: int = 8, seed: int = 42
) -> DataFrame:
    """Add ``bucket``: b-bit sign-LSH id, all native expressions.

    The plane matrix enters the plan as ONE nested-array literal and the
    per-bit dot products as ONE indexed ``transform`` lambda — an
    unrolled per-plane expression chain is semantically identical but
    grows the Catalyst tree ~``bits``×, and analysis/codegen time on a
    many-KLOC plan swamps small-input runtimes."""
    planes = _hyperplanes(dim, bits, seed)
    planes_lit = F.lit([[float(x) for x in p] for p in planes])
    v = F.col(vec_col)
    bucket = F.aggregate(
        F.transform(
            planes_lit,
            lambda p, i: F.when(
                F.aggregate(
                    F.zip_with(v, p, lambda x, y: x.cast("double") * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                >= 0,
                F.call_function("shiftleft", F.lit(1), i),
            ).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, b: acc + b,
    )
    return df.withColumn("bucket", bucket)


def _query_buckets(query_vec, bits: int, seed: int, probe_hamming: int) -> list[int]:
    planes = _hyperplanes(len(query_vec), bits, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    base = 0
    for i in range(bits):
        if planes[i] @ q >= 0:
            base |= 1 << i
    buckets = {base}
    if probe_hamming >= 1:
        for i in range(bits):
            buckets.add(base ^ (1 << i))
    if probe_hamming >= 2:
        for i in range(bits):
            for j in range(i + 1, bits):
                buckets.add(base ^ (1 << i) ^ (1 << j))
    return sorted(buckets)


def knn_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec,
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: scan only rows in the query's LSH bucket(s).

    With a pre-bucketed/persisted table, the `bucket IN (...)` filter is
    partition pruning; here it's computed on the fly for parity."""
    bucketed = random_hyperplane_buckets(df, vec_col, dim=len(query_vec), bits=bits, seed=seed)
    probes = _query_buckets(query_vec, bits, seed, probe_hamming)
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return knn_brute(cand, id_col, vec_col, query_vec, k)


def knn_ivf(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    sample_fraction: float = 0.2,
) -> DataFrame:
    """IVF-flat: coarse centroids from a driver-side sample (one tiny
    collect), assignment + probe as native expressions.

    The inverted-list assignment is the stored-layout piece at scale:
    write ``list_id`` once, bucket/partition by it, and a query probes
    n_probe/n_lists of the data."""
    dim = len(query_vec)
    sample = (
        df.select(vec_col).sample(fraction=sample_fraction, seed=seed).limit(50 * n_lists).collect()
    )
    pts = np.asarray([r[0] for r in sample], dtype=np.float64)
    if len(pts) < n_lists:
        return knn_brute(df, id_col, vec_col, query_vec, k)
    rng = np.random.RandomState(seed)
    centroids = pts[rng.choice(len(pts), n_lists, replace=False)]
    for _ in range(5):  # few Lloyd iterations on the sample
        d = ((pts[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_lists):
            sel = pts[assign == c]
            if len(sel):
                centroids[c] = sel.mean(axis=0)

    # the centroid matrix is ONE nested-array literal and the distances
    # ONE transform lambda: an unrolled per-centroid chain multiplies the
    # Catalyst tree by n_lists and compile time dominates small inputs
    cents_lit = F.lit([[float(x) for x in c] for c in centroids])
    dists = F.transform(
        cents_lit,
        lambda c: F.aggregate(
            F.zip_with(
                F.col(vec_col),
                c,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    list_id = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    q = np.asarray(query_vec, dtype=np.float64)
    order = np.argsort(((centroids - q) ** 2).sum(axis=1))[:n_probe].tolist()
    cand = df.withColumn("__list", list_id).filter(F.col("__list").isin([int(i) for i in order]))
    return knn_brute(cand, id_col, vec_col, query_vec, k)


def knn_join_brute(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact k-NN JOIN: for every left vector the top-k right vectors by
    cosine (ties broken by right id). Block-nested-loop over the full
    right side — the correctness baseline and the small-left case
    (probe batches against a corpus); `knn_join_lsh` is the scale path.

    Returns (left_id, right_id, cos_sim, rk). Norms are hoisted per-side
    before the pair stage so each pair costs one dot product."""
    from pyspark.sql import Window

    norm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    l = left.select(
        F.col(left_id).alias("lid"), F.col(vec_col).alias("lv")
    ).withColumn("ln", norm(F.col("lv")))
    r = right.select(
        F.col(right_id).alias("rid"), F.col(vec_col).alias("rv")
    ).withColumn("rn", norm(F.col("rv")))
    dot = F.aggregate(
        F.zip_with(F.col("lv"), F.col("rv"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    sim = F.when((F.col("ln") > 0) & (F.col("rn") > 0), dot / (F.col("ln") * F.col("rn"))).otherwise(F.lit(0.0))
    scored = l.crossJoin(r).select(
        "lid", "rid", F.round(sim, 6).alias("cos_sim")
    )
    w = Window.partitionBy("lid").orderBy(F.col("cos_sim").desc(), F.col("rid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("lid", "rid", "cos_sim", "rk")
    )


def knn_join_lsh(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    bits: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate k-NN JOIN at scale: bucket both sides with the SAME
    hyperplanes, explode each left row to its bucket plus Hamming-≤1
    probes, equi-join on bucket, then per-left top-k. One hash shuffle of
    each side on the bucket key; candidate count ≈ n·(1+bits)/2^bits per
    left row instead of n. May return <k rows for sparse buckets (the
    approximate contract)."""
    from pyspark.sql import Window

    lb = random_hyperplane_buckets(left, vec_col, dim=dim, bits=bits, seed=seed)
    rb = random_hyperplane_buckets(right, vec_col, dim=dim, bits=bits, seed=seed)
    probes = F.array_distinct(
        F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(bits if probe_hamming >= 1 else 0)
            ],
        )
    )
    l = lb.select(
        F.col(left_id).alias("lid"), F.col(vec_col).alias("lv"), F.explode(probes).alias("bucket")
    )
    r = rb.select(F.col(right_id).alias("rid"), F.col(vec_col).alias("rv"), "bucket")
    cand = l.join(r, "bucket")
    sim = cosine_sim(F.col("lv"), F.col("rv"))
    scored = cand.select("lid", "rid", F.round(sim, 6).alias("cos_sim"))
    w = Window.partitionBy("lid").orderBy(F.col("cos_sim").desc(), F.col("rid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("lid", "rid", "cos_sim", "rk")
    )
