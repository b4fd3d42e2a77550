"""XZ2 space-filling index for *extended* geometries (boxes, polygons,
lines), after the XZ-ordering of Böhm, Klump & Kriegel ("XZ-Ordering: A
Space-Filling Curve for Objects with Spatial Extension", SSD'99).

Why this exists: the reference indexes points only — ``st_z2LatLon``
interleaves a *point* grid cell and ``st_partitionCentroid`` keys a
geometry by its centroid cell (`spatial-index/.../ST_Z2LatLon.scala:34-36`,
`ST_PartitionCentroid.scala:40-50`). A polygon spanning cell boundaries is
invisible to a centroid key: a window query that touches the polygon but
not its centroid cell would be pruned away. GeoMesa proper (the system the
reference delegates to) solves this with its XZ2 index for non-point
geometries; this module re-derives that index from the published
XZ-ordering construction — pure dyadic arithmetic, no library code.

Scheme (resolution ``g`` levels, unit square [0,1]^2):

- An *element* at level ``l`` is a quadtree cell enlarged 2x to the
  upper-right (so a geometry up to one cell wide always fits in the
  enlarged cell whose lower-left quadrant contains its lower-left
  corner).
- A geometry's level is the deepest ``l`` such that its normalized bbox
  still fits in an enlarged level-``l`` element:
  ``l1 = max{l : maxdim <= 0.5^l}`` then one optional extra level when
  the bbox happens to fit the *specific* enlarged child element at
  ``l1+1`` (the standard XZ two-step: most boxes of size ~0.5^l fit two
  cells wide at the next level).
- Its code is the preorder rank of that quadtree node: descending into
  quadrant ``q`` at step ``i`` (of ``g``) skips ``q`` full subtrees of
  ``(4^(g-i) - 1)/3`` nodes, plus 1 for the node itself:
  ``cs = sum_{i<l} 1 + q_i * (4^(g-i)-1)/3``.
- A window query selects the codes of every node whose enlarged cell
  intersects the window — contiguous code ranges (a node's descendants
  occupy ``[cs, cs + subtree(l)]``), so the filter is a handful of
  BETWEENs that parquet min/max statistics and Z-ordered layout can
  prune on. Exactness comes from a cheap bbox-intersects refine;
  the ranges guarantee **no false negatives**.

Everything is dyadic (powers of two): every comparison and floor is
exact in IEEE doubles, which is what makes the SQL replay in
``operators/xz2.py`` bit-identical across Spark and DuckDB.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "DEFAULT_G",
    "subtree_span",
    "xz2_index",
    "xz2_query_ranges",
]

DEFAULT_G = 12  # 4^13/3 ~ 22.4M max code — small longs, deep enough for ~10m cells


def _normalize(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    nx = (np.asarray(lon, dtype=np.float64) + 180.0) / 360.0
    ny = (np.asarray(lat, dtype=np.float64) + 90.0) / 180.0
    return np.clip(nx, 0.0, 1.0), np.clip(ny, 0.0, 1.0)


def _interval_count(g: int, i: int) -> int:
    """Nodes in one full subtree hanging off a level-``i`` step: (4^(g-i)-1)/3."""
    return (4 ** (g - i) - 1) // 3


def subtree_span(g: int, level: int) -> int:
    """Code span of a level-``level`` node's descendants: max(cs_desc - cs)."""
    # descending with q=3 at every remaining step: sum_{i=level}^{g-1} 4^(g-i)
    return (4 ** (g - level + 1) - 4) // 3 if level < g else 0


def xz2_index(
    xmin, ymin, xmax, ymax, g: int = DEFAULT_G
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (code, level) for lon/lat bboxes.

    Matches the SQL replay in ``operators/xz2.py`` exactly (all dyadic
    arithmetic). Degenerate boxes (points) land at level ``g``.
    """
    nxmin, nymin = _normalize(xmin, ymin)
    nxmax, nymax = _normalize(xmax, ymax)
    nxmax = np.maximum(nxmin, nxmax)
    nymax = np.maximum(nymin, nymax)

    md = np.maximum(nxmax - nxmin, nymax - nymin)
    # l1 = number of halvings the box still fits: max l with md <= 0.5^l
    l1 = np.zeros(md.shape, dtype=np.int64)
    for l in range(1, g + 1):
        l1 += (md <= 0.5**l).astype(np.int64)

    # one extra level when the box fits the enlarged child element it
    # would land in (XZ two-step) — exact dyadic floor arithmetic
    w2 = np.power(0.5, (l1 + 1).astype(np.float64))
    fits_x = nxmax <= np.floor(nxmin / w2) * w2 + 2.0 * w2
    fits_y = nymax <= np.floor(nymin / w2) * w2 + 2.0 * w2
    length = np.where(l1 >= g, g, np.where(fits_x & fits_y, l1 + 1, l1))

    cs = np.zeros(md.shape, dtype=np.int64)
    for i in range(g):
        p = 1 << (i + 1)
        qx = np.minimum(np.floor(nxmin * p).astype(np.int64), p - 1) & 1
        qy = np.minimum(np.floor(nymin * p).astype(np.int64), p - 1) & 1
        term = 1 + (qx + 2 * qy) * _interval_count(g, i)
        cs += np.where(i < length, term, 0)
    return cs, length


def xz2_query_ranges(
    qxmin: float,
    qymin: float,
    qxmax: float,
    qymax: float,
    g: int = DEFAULT_G,
    max_level: int | None = None,
) -> list[tuple[int, int]]:
    """Merged, sorted [lo, hi] code ranges covering every element whose
    enlarged cell intersects the lon/lat window — i.e. every code a
    geometry intersecting the window could carry. No false negatives;
    false positives are removed by the bbox refine.

    ``max_level`` coarsens the traversal (fewer, wider ranges) — the
    scale knob: a 100 TB scan wants ~hundreds of BETWEENs, not 10^5.
    """
    nxmin, nymin = (float(v) for v in _normalize(qxmin, qymin))
    nxmax, nymax = (float(v) for v in _normalize(qxmax, qymax))
    stop = g if max_level is None else min(max_level, g)
    out: list[tuple[int, int]] = []

    def visit(x0: float, y0: float, size: float, level: int, cs: int) -> None:
        ex, ey = x0 + 2.0 * size, y0 + 2.0 * size  # enlarged cell
        if x0 > nxmax or ex < nxmin or y0 > nymax or ey < nymin:
            return  # children's enlarged cells all sit inside this one
        if x0 >= nxmin and ex <= nxmax and y0 >= nymin and ey <= nymax:
            out.append((cs, cs + subtree_span(g, level)))
            return
        if level >= stop:
            out.append((cs, cs + subtree_span(g, level)))
            return
        out.append((cs, cs))  # the element stored AT this node
        half = size / 2.0
        step = _interval_count(g, level)
        for q, (dx, dy) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
            visit(x0 + dx * half, y0 + dy * half, half, level + 1, cs + 1 + q * step)

    visit(0.0, 0.0, 1.0, 0, 0)
    out.sort()
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged
