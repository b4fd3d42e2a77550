"""Linear referencing: interpolate / locate / substring along a
LineString (round 14).

The PostGIS trio ``ST_LineInterpolatePoint`` / ``ST_LineLocatePoint``
/ ``ST_LineSubstring`` — beyond the reference surface (its measures
stop at length/distance/closestPoint, ``spatial/.../package.scala``),
but the operations every GPS-trace / route pipeline reaches for first.
Planar 2-D, like the reference's st_length; fractions are of the total
cartesian length. All pure NumPy on the kernel's coordinate arrays;
the SQL surface wraps these as pandas UDFs in ``functions/st.py``.

Conventions (PostGIS parity):
- fractions clamp to [0, 1] rather than raise (PostGIS errors on
  out-of-range for interpolate but clamps for substring; here both
  CLAMP — documented divergence, the forgiving choice for computed
  fractions like ``elapsed/total`` that land at 1 + 1e-16);
- a zero-length line interpolates/substrings to its first point;
- locate returns the fraction of the CLOSEST point on the line
  (projection onto each segment, global argmin; first hit wins ties —
  segment order, the PostGIS tie rule).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "line_interpolate_point",
    "line_locate_point",
    "line_substring",
    "segmentize_coords",
]


def _seg_lengths(coords: np.ndarray) -> np.ndarray:
    d = np.diff(coords[:, :2], axis=0)
    return np.hypot(d[:, 0], d[:, 1])


def line_interpolate_point(coords: np.ndarray, frac: float) -> np.ndarray:
    """Point (x, y) at ``frac`` of the line's length from its start.
    ``coords``: (n, 2+) vertex array, n >= 1."""
    coords = np.asarray(coords, dtype=float)
    if len(coords) == 0:
        raise ValueError("empty coordinate array")
    f = min(max(float(frac), 0.0), 1.0)
    if len(coords) == 1:
        return coords[0, :2].copy()
    seg = _seg_lengths(coords)
    total = float(seg.sum())
    if total == 0.0:
        return coords[0, :2].copy()
    target = f * total
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    # first segment whose END reaches the target (ties → earlier seg)
    i = int(np.searchsorted(cum[1:], target, side="left"))
    i = min(i, len(seg) - 1)
    seg_len = seg[i]
    t = 0.0 if seg_len == 0.0 else (target - cum[i]) / seg_len
    return coords[i, :2] + t * (coords[i + 1, :2] - coords[i, :2])


def line_locate_point(coords: np.ndarray, pt) -> float:
    """Fraction in [0, 1] of the line's length at the point on the
    line CLOSEST to ``pt`` (projection onto each segment, global
    argmin; segment order breaks ties)."""
    coords = np.asarray(coords, dtype=float)
    if len(coords) == 0:
        raise ValueError("empty coordinate array")
    p = np.asarray(pt, dtype=float)[:2]
    if len(coords) == 1:
        return 0.0
    a = coords[:-1, :2]
    b = coords[1:, :2]
    ab = b - a
    seg2 = (ab * ab).sum(axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        t = ((p - a) * ab).sum(axis=1) / seg2
    t = np.where(seg2 == 0.0, 0.0, np.clip(t, 0.0, 1.0))
    proj = a + t[:, None] * ab
    d2 = ((proj - p) ** 2).sum(axis=1)
    i = int(np.argmin(d2))          # first minimum wins
    seg = np.sqrt(seg2)
    total = float(seg.sum())
    if total == 0.0:
        return 0.0
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    return float((cum[i] + t[i] * seg[i]) / total)


def line_substring(coords: np.ndarray, f0: float, f1: float) -> np.ndarray:
    """Vertex array of the sub-line between fractions ``f0 <= f1`` of
    the total length (both clamped to [0, 1]). Degenerate ranges
    (f0 == f1, or a zero-length line) return a 2-vertex zero-length
    line at the interpolated point — keeps the result a LineString,
    PostGIS parity."""
    coords = np.asarray(coords, dtype=float)
    if len(coords) == 0:
        raise ValueError("empty coordinate array")
    a = min(max(float(f0), 0.0), 1.0)
    b = min(max(float(f1), 0.0), 1.0)
    if b < a:
        raise ValueError(f"need f0 <= f1, got {f0} > {f1}")
    p0 = line_interpolate_point(coords, a)
    p1 = line_interpolate_point(coords, b)
    if len(coords) == 1 or a == b:
        return np.vstack([p0, p1])
    seg = _seg_lengths(coords)
    total = float(seg.sum())
    if total == 0.0:
        return np.vstack([p0, p1])
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    lo, hi = a * total, b * total
    # interior vertices strictly between the cut points
    keep = coords[1:-1, :2][(cum[1:-1] > lo) & (cum[1:-1] < hi)] \
        if len(coords) > 2 else np.empty((0, 2))
    out = [p0]
    for v in keep:
        if not np.array_equal(v, out[-1]):
            out.append(v)
    if not np.array_equal(p1, out[-1]) or len(out) == 1:
        out.append(p1)
    return np.vstack(out)


def segmentize_coords(coords: np.ndarray, max_len: float) -> np.ndarray:
    """Vertex array with each segment longer than ``max_len`` split
    into equal parts of ceil(len/max_len) (PostGIS ST_Segmentize
    semantics: existing vertices are KEPT, inserted points are evenly
    spaced per segment, geometry shape unchanged). ``max_len`` must be
    positive; zero-length segments pass through untouched."""
    coords = np.asarray(coords, dtype=float)
    if not (float(max_len) > 0.0):
        raise ValueError(f"max_len must be > 0, got {max_len}")
    if len(coords) < 2:
        return coords[:, :2].copy()
    out = [coords[0, :2]]
    seg = _seg_lengths(coords)
    for i in range(len(coords) - 1):
        n = max(int(np.ceil(seg[i] / float(max_len))), 1) \
            if seg[i] > 0 else 1
        a, b = coords[i, :2], coords[i + 1, :2]
        for j in range(1, n):
            out.append(a + (j / n) * (b - a))
        out.append(b)
    return np.vstack(out)
