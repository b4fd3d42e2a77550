"""Distributed PCA over an embedding column — mean/covariance as ONE
Arrow-batched partial-gram pass (`mapInPandas` computing X^T X per
batch in NumPy), a d×d eigendecomposition on the driver (d is tiny —
the ONLY collect, d(d+1)/2+d+1 rows), and projection as a broadcast-
literal map. Whitening/decorrelating embeddings before ANN or dedup is
a standard pipeline step (it is also the OPQ rotation ingredient).

Exactness across engines (the contract hash): embedding values are
quantized to integers (``round(x·10^4)``) INSIDE the pass, so the
partial gram/mean sums are exact int64 arithmetic — order-independent
under any partitioning — and the covariance NUMERATOR
``n·Σqᵢqⱼ − Σqᵢ·Σqⱼ`` is an exact integer a DuckDB self-join replays
bit-for-bit. No float leaves the distributed part; the
eigendecomposition consumes the exact integers.

Scale: the mapInPandas pass emits d(d+1)/2 + d + 1 rows PER BATCH
regardless of batch size — the shuffle is constant-width, the
aggregation is a trivial groupBy over (i, j). The naive alternative
(posexplode + self-join on the row id) shuffles n·d(d+1)/2 rows and is
what the ORACLE does at sf0.01; the operator never does. At 100 TB the
pass is bandwidth-bound on the parquet scan, exactly like a count.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["covariance_q", "pca_components", "project"]

_SCALE = 10_000


def covariance_q(
    emb: DataFrame, id_col: str, vec_col: str, dim: int, scale: int = _SCALE
) -> DataFrame:
    """(i, j, s) exact-integer moment sums: for 0 ≤ i ≤ j < dim the
    gram entry Σ qᵢqⱼ; row (i, -1) the dimension sum Σ qᵢ; row
    (-1, -1) the count n — everything downstream (mean, covariance
    numerator, PCA) derives from these d(d+1)/2 + d + 1 integers."""
    d = int(dim)
    sc = float(int(scale))
    iu, ju = np.triu_indices(d)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = np.zeros((d, d), dtype=np.int64)
        sums = np.zeros(d, dtype=np.int64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(x * sc + 0.5).astype(np.int64)  # round half up
            gram += q.T @ q
            sums += q.sum(axis=0)
            n += q.shape[0]
        if n == 0:
            return
        yield pd.DataFrame({
            "i": np.concatenate([iu, np.arange(d), [-1]]),
            "j": np.concatenate([ju, np.full(d, -1), [-1]]),
            "s": np.concatenate([gram[iu, ju], sums, [n]]),
        })

    parts = emb.select(vec_col).mapInPandas(part, "i INT, j INT, s LONG")
    return parts.groupBy("i", "j").agg(F.sum("s").cast("long").alias("s"))


def pca_components(
    moments: pd.DataFrame, dim: int, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """(components k×d, eigenvalues, mean, n) from the collected moment
    rows — the bounded driver-side step (d² numbers; d is the embedding
    width, never the corpus). Covariance numerator n·G − s·sᵀ is exact
    int64 (object-dtype accumulation guards overflow for huge n);
    eigenvectors get a deterministic sign (largest-|coord| positive)."""
    d = int(dim)
    g = np.zeros((d, d), dtype=np.float64)
    s = np.zeros(d, dtype=np.float64)
    n = 0
    for r in moments.itertuples(index=False):
        if r.i == -1:
            n = int(r.s)
        elif r.j == -1:
            s[int(r.i)] = float(r.s)
        else:
            g[int(r.i), int(r.j)] = float(r.s)
            g[int(r.j), int(r.i)] = float(r.s)
    cov = (n * g - np.outer(s, s)) / (float(n) * float(n) * float(_SCALE) ** 2)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comp = vecs[:, order].T
    flip = np.sign(comp[np.arange(len(order)), np.abs(comp).argmax(axis=1)])
    comp = comp * flip[:, None]
    return comp, vals[order], s / (n * float(_SCALE)), n


def project(
    emb: DataFrame, id_col: str, vec_col: str,
    components: np.ndarray, mean: np.ndarray,
) -> DataFrame:
    """(id, scores array<double>) — centered projection onto the
    components, as a broadcast-literal native expression (k·d fused
    multiply-adds per row, no Python in the hot path)."""
    terms = []
    for row in components:
        expr = None
        for j, (c, m) in enumerate(zip(row, mean)):
            t = (F.col(vec_col)[j].cast("double") - F.lit(float(m))) * F.lit(float(c))
            expr = t if expr is None else expr + t
        terms.append(expr)
    return emb.select(F.col(id_col).alias("id"), F.array(*terms).alias("scores"))
