"""Planar geometry algorithms: measures, DE-9IM predicates, hulls, simplify.

Pure NumPy. Semantics target JTS 1.18 / OGC SFS (what the reference's
``st_*`` functions compute via GeoMesa — SURVEY.md §2.2): predicates are
derived from a computed DE-9IM intersection matrix, measures are planar
in coordinate units.

Robustness model (round 13 — filtered EXACT orientation): orientation
signs are decided by :func:`orient` — a Shewchuk-style A-filtered
determinant (the float value is trusted only when it exceeds the
forward error bound; otherwise the sign is recomputed in exact rational
arithmetic, doubles being exact binary rationals) — so ray-crossing
parity, convex-hull turns, and proper-crossing decisions can never be
flipped by floating-point error. ON TOP of the exact signs, a small
relative epsilon (``_EPS * _scale``) classifies "on boundary": this is
a deliberate SNAP-BAND SEMANTIC, not arithmetic slack — it is what
makes computed points usable (an interpolated or intersection-computed
point lands ~ulps off the exact line; JTS-exact semantics would call
it disjoint, which no downstream pipeline wants). Round 11's
adversarial suite (tests/test_geom_properties.py: relate-transpose,
shared-edge/corner boxes, collinear segment families, interpolated and
COMPUTED-intersection points, redundant collinear vertices, 1e7-coord
stress) passes unchanged. The one residual, now PINNED by tests rather
than latent: a sliver thinner than eps*scale classifies as boundary
contact — the snap band's defined behavior (both suite-required
computed-point tolerance and sub-band sliver interiors cannot be
honored at once; slivers wider than the band classify exactly, also
pinned).
"""

from __future__ import annotations

import math

import numpy as np

from geomesa_hive_spark.geom.core import (
    Geometry,
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
)

__all__ = [
    "area",
    "length",
    "centroid",
    "distance",
    "closest_point",
    "envelope",
    "boundary",
    "convex_hull",
    "convex_hull_of_coords",
    "simplify",
    "translate",
    "is_simple",
    "relate",
    "relate_pattern",
    "intersects",
    "contains",
    "within",
    "covers",
    "crosses",
    "touches",
    "overlaps",
    "disjoint",
    "equals",
    "points_in_polygon_vec",
    "all_coords",
    "orient",
]

_EPS = 1e-9

# Shewchuk's ccwerrboundA = (3 + 16·ε)·ε with ε = 2^-53: if the float
# orientation determinant exceeds this bound times the sum of the two
# product magnitudes, its SIGN is provably the exact sign (Shewchuk,
# "Adaptive Precision Floating-Point Arithmetic and Fast Robust
# Geometric Predicates", 1997, §4 — the stage-A filter; instead of his
# stages B-D we fall back to exact rational arithmetic, which is
# slower but unconditionally exact and only reached by near-degenerate
# triples).
_CCW_ERRBOUND_A = (3.0 + 16.0 * 2.0 ** -53) * 2.0 ** -53


def orient(ax: float, ay: float, bx: float, by: float,
           cx: float, cy: float) -> int:
    """Exact sign of the orientation determinant (b−a)×(c−a):
    +1 = c strictly left of a→b, −1 = strictly right, 0 = exactly
    collinear. Float fast path behind the A-filter; exact
    ``fractions.Fraction`` fallback otherwise (doubles are exact binary
    rationals, so Fraction arithmetic has no rounding at all)."""
    detl = (bx - ax) * (cy - ay)
    detr = (by - ay) * (cx - ax)
    det = detl - detr
    if abs(det) > _CCW_ERRBOUND_A * (abs(detl) + abs(detr)):
        return 1 if det > 0.0 else -1
    from fractions import Fraction as _Fr

    d = ((_Fr(bx) - _Fr(ax)) * (_Fr(cy) - _Fr(ay))
         - (_Fr(by) - _Fr(ay)) * (_Fr(cx) - _Fr(ax)))
    return (d > 0) - (d < 0)


# ---------------------------------------------------------------------------
# coordinate helpers
# ---------------------------------------------------------------------------


def all_coords(g: Geometry) -> np.ndarray:
    """All XY coordinates of a geometry as an (n, 2) array."""
    t = g.geom_type
    if t == "Point":
        return g.coords[:, :2]
    if t == "LineString":
        return g.coords[:, :2]
    if t == "Polygon":
        if g.is_empty:
            return np.empty((0, 2))
        return np.vstack([r[:, :2] for r in g.rings])
    parts = [all_coords(p) for p in g.geoms]
    return np.vstack(parts) if parts else np.empty((0, 2))


def _scale(*geoms: Geometry) -> float:
    """Characteristic magnitude, for relative epsilon."""
    m = 0.0
    for g in geoms:
        b = g.bounds
        if not math.isnan(b[0]):
            m = max(m, abs(b[0]), abs(b[1]), abs(b[2]), abs(b[3]))
    return m if m > 0 else 1.0


def _segments(coords: np.ndarray) -> np.ndarray:
    """(n,2) closed/open coord array -> (n-1, 4) [x1,y1,x2,y2]."""
    if coords.shape[0] < 2:
        return np.empty((0, 4))
    return np.hstack([coords[:-1, :2], coords[1:, :2]])


def _geom_segments(g: Geometry) -> np.ndarray:
    t = g.geom_type
    if t == "LineString":
        return _segments(g.coords)
    if t == "Polygon":
        rings = g.rings
        return (
            np.vstack([_segments(r) for r in rings]) if rings else np.empty((0, 4))
        )
    if t in ("MultiLineString", "MultiPolygon", "GeometryCollection"):
        parts = [_geom_segments(p) for p in g.geoms]
        parts = [p for p in parts if p.size]
        return np.vstack(parts) if parts else np.empty((0, 4))
    return np.empty((0, 4))


def _bboxes_disjoint(a: Geometry, b: Geometry, eps: float = 0.0) -> bool:
    ab, bb = a.bounds, b.bounds
    if math.isnan(ab[0]) or math.isnan(bb[0]):
        return True
    return (
        ab[2] < bb[0] - eps
        or bb[2] < ab[0] - eps
        or ab[3] < bb[1] - eps
        or bb[3] < ab[1] - eps
    )


# ---------------------------------------------------------------------------
# point-vs-ring / point-vs-polygon classification
# ---------------------------------------------------------------------------


def _point_on_segments(px, py, segs: np.ndarray, eps: float) -> bool:
    if segs.shape[0] == 0:
        return False
    x1, y1, x2, y2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    dx, dy = x2 - x1, y2 - y1
    ln2 = dx * dx + dy * dy
    # projection parameter clamped to [0,1]
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(ln2 > 0, ((px - x1) * dx + (py - y1) * dy) / ln2, 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx, cy = x1 + t * dx, y1 + t * dy
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    return bool(np.any(d2 <= eps * eps))


def _point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    """Crossing-number inside test (boundary handled separately by caller)."""
    return bool(
        _points_in_ring_vec(
            np.asarray([px], dtype=np.float64),
            np.asarray([py], dtype=np.float64),
            ring,
        )[0]
    )


def _point_polygon_side(px: float, py: float, poly: Polygon, eps: float) -> int:
    """+1 interior, 0 boundary, -1 exterior."""
    b = poly.bounds
    if px < b[0] - eps or px > b[2] + eps or py < b[1] - eps or py > b[3] + eps:
        return -1
    for ring in poly.rings:
        if _point_on_segments(px, py, _segments(ring), eps):
            return 0
    if not _point_in_ring(px, py, poly.shell):
        return -1
    for hole in poly.holes:
        if _point_in_ring(px, py, hole):
            return -1
    return 1


def _point_area_side(px: float, py: float, g: Geometry, eps: float) -> int:
    """Side of a point vs an areal geometry (Polygon/MultiPolygon)."""
    best = -1
    for part in g.geometries():
        if part.geom_type != "Polygon" or part.is_empty:
            continue
        s = _point_polygon_side(px, py, part, eps)
        if s == 1:
            return 1
        best = max(best, s)
    return best


def points_in_polygon_vec(
    xs: np.ndarray, ys: np.ndarray, g: Geometry, include_boundary: bool = True
) -> np.ndarray:
    """Vectorized point-in-areal-geometry test for many points vs ONE geometry.

    The hot path for `ST_Intersects(point_col, window_literal)` filters:
    crossing-number over all points at once, plus an epsilon boundary pass.
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    out = np.zeros(len(xs), dtype=bool)
    eps = _EPS * _scale(g)
    for poly in g.geometries():
        if poly.geom_type != "Polygon" or poly.is_empty:
            continue
        b = poly.bounds
        cand = (xs >= b[0] - eps) & (xs <= b[2] + eps) & (ys >= b[1] - eps) & (ys <= b[3] + eps)
        cand &= ~out
        if not cand.any():
            continue
        cx, cy = xs[cand], ys[cand]
        inside = _points_in_ring_vec(cx, cy, poly.shell)
        for hole in poly.holes:
            inside &= ~_points_in_ring_vec(cx, cy, hole)
        # crossing-number parity is unreliable exactly ON the boundary, so
        # the boundary pass runs in BOTH modes: include adds boundary
        # points the parity test missed, exclude removes ones it
        # accidentally counted as interior (e.g. a vertex on a horizontal
        # edge crosses an incident edge once → odd parity).
        onb = np.zeros(len(cx), dtype=bool)
        target = ~inside if include_boundary else inside
        for ring in poly.rings:
            todo = target & ~onb
            if not todo.any():
                break
            onb[todo] = _points_on_segments_vec(
                cx[todo], cy[todo], _segments(ring), eps
            )
        if include_boundary:
            inside |= onb
        else:
            inside &= ~onb
        idx = np.nonzero(cand)[0]
        out[idx[inside]] = True
    return out


def _points_in_ring_vec(xs, ys, ring) -> np.ndarray:
    """Crossing-number parity, orientation-sign formulation (round 13):
    an edge straddling the ray's height crosses to the point's right
    iff the point is strictly LEFT of an upward edge / strictly RIGHT
    of a downward one — a multiply-only determinant instead of the old
    interpolated-x division, decided EXACTLY: pairs inside the
    A-filter's ambiguity band (point within float error of the edge's
    line) re-resolve through :func:`orient`'s rational fallback, so the
    parity can never be flipped by rounding."""
    x = ring[:, 0]
    y = ring[:, 1]
    x1, y1 = x[:-1], y[:-1]
    x2, y2 = x[1:], y[1:]
    # broadcast points (n,1) against edges (m,)
    py = ys[:, None]
    px = xs[:, None]
    up = y1 <= py
    cond = up != (y2 <= py)
    detl = (x2 - x1) * (py - y1)
    detr = (y2 - y1) * (px - x1)
    d = detl - detr
    cross = cond & np.where(up, d > 0.0, d < 0.0)
    amb = cond & (
        np.abs(d) <= _CCW_ERRBOUND_A * (np.abs(detl) + np.abs(detr))
    )
    if amb.any():
        pi, ei = np.nonzero(amb)
        for p_i, e_i in zip(pi.tolist(), ei.tolist()):
            s = orient(
                float(x1[e_i]), float(y1[e_i]),
                float(x2[e_i]), float(y2[e_i]),
                float(xs[p_i]), float(ys[p_i]),
            )
            cross[p_i, e_i] = (s > 0) if bool(up[p_i, e_i]) else (s < 0)
    return (np.count_nonzero(cross, axis=1) % 2).astype(bool)


def _points_on_segments_vec(xs, ys, segs, eps) -> np.ndarray:
    if segs.shape[0] == 0:
        return np.zeros(len(xs), dtype=bool)
    x1, y1, x2, y2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    dx, dy = x2 - x1, y2 - y1
    ln2 = dx * dx + dy * dy
    px = xs[:, None]
    py = ys[:, None]
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(ln2 > 0, ((px - x1) * dx + (py - y1) * dy) / ln2, 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx, cy = x1 + t * dx, y1 + t * dy
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    return np.any(d2 <= eps * eps, axis=1)


# ---------------------------------------------------------------------------
# segment splitting against a boundary (for DE-9IM)
# ---------------------------------------------------------------------------


def _split_params(p: np.ndarray, q: np.ndarray, segs: np.ndarray, eps: float) -> list[float]:
    """Parameters t in [0,1] where segment p->q meets any segment in segs."""
    if segs.shape[0] == 0:
        return []
    r = q - p
    u = segs[:, 0:2]
    v = segs[:, 2:4]
    s = v - u
    denom = r[0] * s[:, 1] - r[1] * s[:, 0]
    w = u - p
    t_num = w[:, 0] * s[:, 1] - w[:, 1] * s[:, 0]
    s_num = w[:, 0] * r[1] - w[:, 1] * r[0]
    ts: list[float] = []
    nz = np.abs(denom) > 0
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(nz, t_num / np.where(nz, denom, 1.0), np.nan)
        ss = np.where(nz, s_num / np.where(nz, denom, 1.0), np.nan)
    ok = nz & (t >= -1e-12) & (t <= 1 + 1e-12) & (ss >= -1e-12) & (ss <= 1 + 1e-12)
    ts.extend(np.clip(t[ok], 0.0, 1.0).tolist())
    # collinear segments: project endpoints of overlapping collinear segs
    rlen2 = float(r @ r)
    if rlen2 > 0:
        col = (~nz) & (np.abs(t_num) <= eps * max(1.0, np.sqrt(rlen2)))
        if col.any():
            for uv in (u[col], v[col]):
                tt = ((uv - p) @ r) / rlen2
                sel = (tt >= 0) & (tt <= 1)
                ts.extend(tt[sel].tolist())
    return ts


def _classify_path(
    coords: np.ndarray, target: Geometry, eps: float
) -> tuple[bool, bool, bool]:
    """Classify a polyline against an areal/lineal target.

    Splits every segment at boundary crossings, classifies each piece by
    its midpoint: returns (any_in_interior, any_on_boundary, any_in_exterior).
    For a lineal target 'interior' means 'on the line' (used for L/L).
    """
    segs_t = _geom_segments(target)
    areal = target.dimension == 2
    any_i = any_b = any_e = False
    for i in range(coords.shape[0] - 1):
        p = coords[i, :2]
        q = coords[i + 1, :2]
        if np.all(p == q):
            continue
        ts = _split_params(p, q, segs_t, eps)
        ts = sorted(set([0.0, 1.0] + [float(t) for t in ts]))
        for t0, t1 in zip(ts[:-1], ts[1:]):
            if t1 - t0 <= 1e-12:
                continue
            m = p + (q - p) * ((t0 + t1) / 2.0)
            if areal:
                side = _point_area_side(m[0], m[1], target, eps)
                if side > 0:
                    any_i = True
                elif side == 0:
                    any_b = True
                else:
                    any_e = True
            else:
                if _point_on_segments(m[0], m[1], segs_t, eps):
                    any_b = True  # piece lies ON the target line
                else:
                    any_e = True
        if any_i and any_b and any_e:
            break
    return any_i, any_b, any_e


def _boundaries_cross_info(a: Geometry, b: Geometry, eps: float) -> tuple[bool, bool]:
    """(any_intersection_point, any_collinear_overlap) between the 1-D
    boundaries/segments of a and b."""
    A = _geom_segments(a)
    B = _geom_segments(b)
    if A.shape[0] == 0 or B.shape[0] == 0:
        return False, False
    p1 = A[:, None, 0:2]
    p2 = A[:, None, 2:4]
    q1 = B[None, :, 0:2]
    q2 = B[None, :, 2:4]
    d1 = np.cross((p2 - p1), (q1 - p1))
    d2 = np.cross((p2 - p1), (q2 - p1))
    d3 = np.cross((q2 - q1), (p1 - q1))
    d4 = np.cross((q2 - q1), (p2 - q1))
    tol_a = eps * np.maximum(1.0, np.linalg.norm((p2 - p1), axis=-1))
    tol_b = eps * np.maximum(1.0, np.linalg.norm((q2 - q1), axis=-1))
    z1 = np.abs(d1) <= tol_a
    z2 = np.abs(d2) <= tol_a
    z3 = np.abs(d3) <= tol_b
    z4 = np.abs(d4) <= tol_b
    proper = ((d1 > tol_a) != (d2 > tol_a)) & ((d3 > tol_b) != (d4 > tol_b)) & ~(
        z1 | z2 | z3 | z4
    )
    if proper.any():
        return True, _collinear_overlap(A, B, z1 & z2, eps)

    # touching via endpoint-on-segment
    touch = False
    for P in (A[:, 0:2], A[:, 2:4]):
        if _any_points_on_segments(P, B, eps):
            touch = True
            break
    if not touch:
        for Q in (B[:, 0:2], B[:, 2:4]):
            if _any_points_on_segments(Q, A, eps):
                touch = True
                break
    coll = _collinear_overlap(A, B, z1 & z2, eps)
    return touch or coll, coll


def _any_points_on_segments(P: np.ndarray, segs: np.ndarray, eps: float) -> bool:
    x1, y1, x2, y2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    dx, dy = x2 - x1, y2 - y1
    ln2 = dx * dx + dy * dy
    px = P[:, 0:1]
    py = P[:, 1:2]
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(ln2 > 0, ((px - x1) * dx + (py - y1) * dy) / ln2, 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx, cy = x1 + t * dx, y1 + t * dy
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    return bool(np.any(d2 <= eps * eps))


def _collinear_overlap(A, B, both_zero, eps) -> bool:
    """True when some segment pair is collinear with positive-length overlap."""
    if not both_zero.any():
        return False
    ii, jj = np.nonzero(both_zero)
    for i, j in zip(ii[:256], jj[:256]):
        p1, p2 = A[i, 0:2], A[i, 2:4]
        q1, q2 = B[j, 0:2], B[j, 2:4]
        r = p2 - p1
        rl2 = float(r @ r)
        if rl2 == 0:
            continue
        t1 = float((q1 - p1) @ r) / rl2
        t2 = float((q2 - p1) @ r) / rl2
        lo, hi = min(t1, t2), max(t1, t2)
        if min(hi, 1.0) - max(lo, 0.0) > 1e-12:
            return True
    return False


# ---------------------------------------------------------------------------
# DE-9IM
# ---------------------------------------------------------------------------

_F, _D0, _D1, _D2 = -1, 0, 1, 2


def _dim_max(*vals: int) -> int:
    return max(vals)


def _interior_point(g: Geometry) -> tuple[float, float] | None:
    """A representative point guaranteed in the interior (areal) / on the
    geometry (lineal, puntal)."""
    t = g.geom_type
    if g.is_empty:
        return None
    if t == "Point":
        return (g.x, g.y)
    if t == "LineString":
        c = g.coords
        return (
            float((c[0, 0] + c[1, 0]) / 2.0),
            float((c[0, 1] + c[1, 1]) / 2.0),
        )
    if t == "Polygon":
        eps = _EPS * _scale(g)
        b = g.bounds
        cy = (b[1] + b[3]) / 2.0
        # scanline at mid-height: take midpoint of first inside interval
        xs: list[float] = []
        for ring in g.rings:
            x, y = ring[:, 0], ring[:, 1]
            x1, y1, x2, y2 = x[:-1], y[:-1], x[1:], y[1:]
            condm = (y1 <= cy) != (y2 <= cy)
            with np.errstate(invalid="ignore", divide="ignore"):
                xi = x1 + (cy - y1) * (x2 - x1) / np.where(y2 != y1, y2 - y1, np.nan)
            xs.extend(xi[condm].tolist())
        xs.sort()
        for a_, b_ in zip(xs[::2], xs[1::2]):
            if b_ - a_ > eps:
                m = (a_ + b_) / 2.0
                if _point_polygon_side(m, cy, g, eps) == 1:
                    return (m, cy)
        # fallback: centroid then first vertex
        cx, cyy = _polygon_centroid(g)
        if _point_polygon_side(cx, cyy, g, eps) == 1:
            return (cx, cyy)
        return None
    for p in g.geoms:
        ip = _interior_point(p)
        if ip is not None:
            return ip
    return None


def _lineal_boundary_points(g: Geometry) -> np.ndarray:
    """Mod-2 boundary of a lineal geometry: endpoints appearing odd times."""
    pts: dict[tuple[float, float], int] = {}
    for part in g.geometries():
        if part.geom_type != "LineString" or part.is_empty:
            continue
        for idx in (0, -1):
            key = (float(part.coords[idx, 0]), float(part.coords[idx, 1]))
            pts[key] = pts.get(key, 0) + 1
    odd = [k for k, v in pts.items() if v % 2 == 1]
    return np.asarray(odd, dtype=np.float64).reshape(-1, 2)


def _flatten(g: Geometry) -> tuple[list[Point], list[LineString], list[Polygon]]:
    P: list[Point] = []
    L: list[LineString] = []
    A: list[Polygon] = []

    def rec(x: Geometry):
        t = x.geom_type
        if t == "Point":
            if not x.is_empty:
                P.append(x)
        elif t == "LineString":
            if not x.is_empty:
                L.append(x)
        elif t == "Polygon":
            if not x.is_empty:
                A.append(x)
        else:
            for p in x.geoms:
                rec(p)

    rec(g)
    return P, L, A


def relate(a: Geometry, b: Geometry) -> str:
    """DE-9IM matrix as a 9-char string (row-major II IB IE / BI BB BE / EI EB EE)."""
    m = _relate_matrix(a, b)
    chars = {-1: "F", 0: "0", 1: "1", 2: "2"}
    return "".join(chars[v] for v in m)


def relate_pattern(a: Geometry, b: Geometry, pattern: str) -> bool:
    m = relate(a, b)
    if len(pattern) != 9:
        raise ValueError("DE-9IM pattern must be 9 chars")
    for got, want in zip(m, pattern):
        w = want.upper() if want in "ft" else want
        if w == "*":
            continue
        if w == "T":
            if got == "F":
                return False
        elif w != got:
            return False
    return True


def _relate_matrix(a: Geometry, b: Geometry) -> list[int]:
    # matrix[i][j], i/j in (0=interior,1=boundary,2=exterior)
    M = [[_F] * 3 for _ in range(3)]
    M[2][2] = _D2
    if a.is_empty or b.is_empty:
        if not a.is_empty:
            M[0][2] = a.dimension
            M[1][2] = _boundary_dim(a)
        if not b.is_empty:
            M[2][0] = b.dimension
            M[2][1] = _boundary_dim(b)
        return [v for row in M for v in row]

    eps = _EPS * _scale(a, b)
    Pa, La, Aa = _flatten(a)
    Pb, Lb, Ab = _flatten(b)

    def upd(i, j, d):
        if d > M[i][j]:
            M[i][j] = d

    # --- puntal components of a vs b ---
    for p in Pa:
        i_side = _locate(p.x, p.y, b, Pb, Lb, Ab, eps)
        upd(0, i_side, _D0)  # point interior meets b's (interior|boundary|exterior)
    # --- puntal components of b vs a ---
    for p in Pb:
        i_side = _locate(p.x, p.y, a, Pa, La, Aa, eps)
        upd(i_side, 0, _D0)

    # --- lineal/areal structure ---
    bnd_a_pts = _lineal_boundary_points(MultiLineString(La)) if La else np.empty((0, 2))
    bnd_b_pts = _lineal_boundary_points(MultiLineString(Lb)) if Lb else np.empty((0, 2))

    # lineal a against b
    for l in La:
        _line_vs_geom(l, b, Pb, Lb, Ab, bnd_a_pts, M, transpose=False, eps=eps)
    for l in Lb:
        _line_vs_geom(l, a, Pa, La, Aa, bnd_b_pts, M, transpose=True, eps=eps)

    # areal vs areal
    if Aa and Ab:
        _area_vs_area(Aa, Ab, M, eps)
    # representative interior points of areal parts: an open 2-D
    # neighborhood around the point meets the other's interior/boundary/
    # exterior with known dimensions
    if Aa:
        ip = _interior_point(MultiPolygon(Aa))
        if ip is not None and Ab:
            s = _point_area_side(ip[0], ip[1], MultiPolygon(Ab), eps)
            if s == 1:
                upd(0, 0, _D2)
            elif s == 0:
                upd(0, 0, _D2)
                upd(0, 1, _D1)
                upd(0, 2, _D2)
            else:
                upd(0, 2, _D2)
        elif ip is not None:
            upd(0, 2, _D2)
    if Ab:
        ip = _interior_point(MultiPolygon(Ab))
        if ip is not None and Aa:
            s = _point_area_side(ip[0], ip[1], MultiPolygon(Aa), eps)
            if s == 1:
                upd(0, 0, _D2)
            elif s == 0:
                upd(0, 0, _D2)
                upd(1, 0, _D1)
                upd(2, 0, _D2)
            else:
                upd(2, 0, _D2)
        elif ip is not None:
            upd(2, 0, _D2)

    # exterior coverage rows/cols: does b extend outside a, etc.
    _exterior_entries(a, b, Pa, La, Aa, Pb, Lb, Ab, M, eps)
    return [v for row in M for v in row]


def _boundary_dim(g: Geometry) -> int:
    if g.dimension == 2:
        return _D1
    if g.dimension == 1:
        pts = _lineal_boundary_points(g)
        return _D0 if len(pts) else _F
    return _F


def _locate(px, py, g: Geometry, P: list, L: list, A: list, eps) -> int:
    """0 interior, 1 boundary, 2 exterior of geometry g for one point."""
    if A:
        s = _point_area_side(px, py, MultiPolygon(A), eps)
        if s == 1:
            return 0
        if s == 0:
            return 1
    if L:
        for l in L:
            if _point_on_segments(px, py, _segments(l.coords), eps):
                bpts = _lineal_boundary_points(MultiLineString(L))
                if len(bpts) and bool(
                    np.any((np.abs(bpts[:, 0] - px) <= eps) & (np.abs(bpts[:, 1] - py) <= eps))
                ):
                    return 1
                return 0
    if P:
        for p in P:
            if abs(p.x - px) <= eps and abs(p.y - py) <= eps:
                return 0
    return 2


def _line_vs_geom(l: LineString, other: Geometry, Po, Lo, Ao, own_bnd, M, transpose, eps):
    def upd(i, j, d):
        if transpose:
            i, j = j, i
        if d > M[i][j]:
            M[i][j] = d

    if Ao:
        target = MultiPolygon(Ao)
        any_i, any_b, any_e = _classify_path(l.coords, target, eps)
        if any_i:
            upd(0, 0, _D1)
        if any_b:
            upd(0, 1, _D1)
        if any_e:
            upd(0, 2, _D1)
    if Lo:
        target_l = MultiLineString(Lo)
        any_i, any_on, any_e = _classify_path(l.coords, target_l, eps)
        if any_on:
            upd(0, 0, _D1)  # collinear overlap: interiors share a 1-D piece
        if any_e:
            upd(0, 2, _D1)
        # point intersections, classified per side as interior/boundary
        segs_o = _geom_segments(target_l)
        bnd_o = _lineal_boundary_points(target_l)
        for i in range(l.coords.shape[0] - 1):
            p = l.coords[i, :2]
            q = l.coords[i + 1, :2]
            for tv in _split_params(p, q, segs_o, eps):
                pt = p + (q - p) * tv
                if not _point_on_segments(pt[0], pt[1], segs_o, eps):
                    continue
                at_own_bnd = len(own_bnd) > 0 and bool(
                    np.any(
                        (np.abs(own_bnd[:, 0] - pt[0]) <= eps)
                        & (np.abs(own_bnd[:, 1] - pt[1]) <= eps)
                    )
                )
                if at_own_bnd:
                    continue  # handled by the own-boundary loop below
                at_o_bnd = len(bnd_o) > 0 and bool(
                    np.any(
                        (np.abs(bnd_o[:, 0] - pt[0]) <= eps)
                        & (np.abs(bnd_o[:, 1] - pt[1]) <= eps)
                    )
                )
                upd(0, 1 if at_o_bnd else 0, _D0)
    if not Ao and not Lo and Po:
        upd(0, 2, _D1)

    # boundary points of this line against other
    for bx, by in own_bnd:
        side = _locate(bx, by, other, Po, Lo, Ao, eps)
        upd(1, side, _D0)


def _area_vs_area(Aa: list[Polygon], Ab: list[Polygon], M, eps):
    ga = MultiPolygon(Aa)
    gb = MultiPolygon(Ab)

    def upd(i, j, d):
        if d > M[i][j]:
            M[i][j] = d

    # classify a's rings against b and b's rings against a
    for poly in Aa:
        for ring in poly.rings:
            any_i, any_b, any_e = _classify_path(ring, gb, eps)
            if any_i:
                upd(1, 0, _D1)
            if any_b:
                upd(1, 1, _D1)
            if any_e:
                upd(1, 2, _D1)
    for poly in Ab:
        for ring in poly.rings:
            any_i, any_b, any_e = _classify_path(ring, ga, eps)
            if any_i:
                upd(0, 1, _D1)
            if any_b:
                upd(1, 1, _D1)
            if any_e:
                upd(2, 1, _D1)
    # point-only boundary touches (corner contacts)
    if M[1][1] < _D1:
        touch, _ = _boundaries_cross_info(ga, gb, eps)
        if touch:
            upd(1, 1, _D0)
    # interiors overlap if: some ∂b inside a (M[0][1]==1), some ∂a inside b
    # (M[1][0]==1), or one contains the other entirely (rep-point tests below
    # in _relate_matrix), or identical boundaries with same interiors.
    if M[0][1] >= _D1 or M[1][0] >= _D1:
        upd(0, 0, _D2)


def _exterior_entries(a, b, Pa, La, Aa, Pb, Lb, Ab, M, eps):
    def upd(i, j, d):
        if d > M[i][j]:
            M[i][j] = d

    # a-side pieces in b's exterior were mostly computed by path walks.
    # Remaining: areal interiors vs exterior (is a fully covered by b?)
    if Aa:
        covered = M[0][2] == _F and M[1][2] == _F
        # if any part of a's boundary is in b's exterior, interior also leaks
        if M[1][2] >= 0:
            upd(0, 2, _D2)
        elif covered and Ab:
            # boundary inside closure(b): interior leaks only via holes of b
            for poly in Ab:
                for hole in poly.holes:
                    hx, hy = float(hole[0, 0]), float(hole[0, 1])
                    mid = _interior_point(Polygon(hole))
                    if mid is not None and _point_area_side(mid[0], mid[1], MultiPolygon(Aa), eps) == 1:
                        upd(0, 2, _D2)
    if Ab:
        if M[2][1] >= 0:
            upd(2, 0, _D2)
        else:
            for poly in Aa:
                for hole in poly.holes:
                    mid = _interior_point(Polygon(hole))
                    if mid is not None and _point_area_side(mid[0], mid[1], MultiPolygon(Ab), eps) == 1:
                        upd(2, 0, _D2)
    # lineal-only / puntal-only geometries always leave most of the plane
    if not Aa and (La or Pa):
        # does any piece of a lie outside b? computed in walks; fine.
        pass
    if not Ab and (Lb or Pb):
        pass
    # exterior of a vs b pieces when a is lower-dimensional: b areal always
    # has interior outside a (unless b subset handled above)
    if Ab and not Aa:
        upd(2, 0, _D2)
        upd(2, 1, _D1)
    if Aa and not Ab:
        upd(0, 2, _D2)
        upd(1, 2, _D1)


# ---------------------------------------------------------------------------
# named predicates (derived from the matrix, with cheap fast paths)
# ---------------------------------------------------------------------------


def intersects(a: Geometry, b: Geometry) -> bool:
    # The bbox prefilter must use the SAME relative epsilon as the
    # classifier behind it: with eps=0 a computed intersection point
    # sitting 1e-14 off a segment is bbox-disjoint yet relate() says
    # boundary — the engine would contradict itself.
    if a.is_empty or b.is_empty:
        return False
    eps = _EPS * _scale(a, b)
    if _bboxes_disjoint(a, b, eps):
        return False
    Pa, La, Aa = _flatten(a)
    Pb, Lb, Ab = _flatten(b)
    # fast: any point of one inside/on other
    for p in Pa:
        if _locate(p.x, p.y, b, Pb, Lb, Ab, eps) != 2:
            return True
    for p in Pb:
        if _locate(p.x, p.y, a, Pa, La, Aa, eps) != 2:
            return True
    if (La or Aa) and (Lb or Ab):
        touch, _ = _boundaries_cross_info(a, b, eps)
        if touch:
            return True
        # containment without boundary contact
        if Aa:
            for g in Lb + Ab:
                c = all_coords(g)
                if len(c) and _point_area_side(c[0, 0], c[0, 1], MultiPolygon(Aa), eps) == 1:
                    return True
        if Ab:
            for g in La + Aa:
                c = all_coords(g)
                if len(c) and _point_area_side(c[0, 0], c[0, 1], MultiPolygon(Ab), eps) == 1:
                    return True
    return False


def disjoint(a: Geometry, b: Geometry) -> bool:
    return not intersects(a, b)


def contains(a: Geometry, b: Geometry) -> bool:
    if a.is_empty or b.is_empty or _bboxes_disjoint(a, b, _EPS * _scale(a, b)):
        return False
    return relate_pattern(a, b, "T*****FF*")


def within(a: Geometry, b: Geometry) -> bool:
    return contains(b, a)


def covers(a: Geometry, b: Geometry) -> bool:
    if a.is_empty or b.is_empty or _bboxes_disjoint(a, b, _EPS * _scale(a, b)):
        return False
    m = relate(a, b)
    if m[6] != "F" or m[7] != "F":
        return False
    return any(m[i] != "F" for i in (0, 1, 3, 4))


def crosses(a: Geometry, b: Geometry) -> bool:
    if a.is_empty or b.is_empty or _bboxes_disjoint(a, b, _EPS * _scale(a, b)):
        return False
    da, db = a.dimension, b.dimension
    m = relate(a, b)
    if da < db:
        return m[0] != "F" and m[2] != "F"
    if da > db:
        return m[0] != "F" and m[6] != "F"
    if da == 1 and db == 1:
        return m[0] == "0"
    return False


def touches(a: Geometry, b: Geometry) -> bool:
    if a.is_empty or b.is_empty or _bboxes_disjoint(a, b, _EPS * _scale(a, b)):
        return False
    m = relate(a, b)
    return m[0] == "F" and (m[1] != "F" or m[3] != "F" or m[4] != "F")


def overlaps(a: Geometry, b: Geometry) -> bool:
    if a.is_empty or b.is_empty or _bboxes_disjoint(a, b, _EPS * _scale(a, b)):
        return False
    da, db = a.dimension, b.dimension
    if da != db:
        return False
    m = relate(a, b)
    if da == 1:
        return m[0] == "1" and m[2] != "F" and m[6] != "F"
    return m[0] != "F" and m[2] != "F" and m[6] != "F"


def equals(a: Geometry, b: Geometry) -> bool:
    if a.is_empty and b.is_empty:
        return True
    if a.is_empty or b.is_empty:
        return False
    m = relate(a, b)
    return m[0] != "F" and m[2] == "F" and m[5] == "F" and m[6] == "F" and m[7] == "F"


# ---------------------------------------------------------------------------
# measures
# ---------------------------------------------------------------------------


def _ring_area(ring: np.ndarray) -> float:
    x = ring[:, 0]
    y = ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def area(g: Geometry) -> float:
    t = g.geom_type
    if t == "Polygon":
        if g.is_empty:
            return 0.0
        a = abs(_ring_area(g.shell))
        for h in g.holes:
            a -= abs(_ring_area(h))
        return a
    if t in ("MultiPolygon", "GeometryCollection"):
        return float(sum(area(p) for p in g.geoms))
    return 0.0


def length(g: Geometry) -> float:
    t = g.geom_type
    if t == "LineString":
        if g.is_empty:
            return 0.0
        d = np.diff(g.coords[:, :2], axis=0)
        return float(np.sqrt((d * d).sum(axis=1)).sum())
    if t == "Polygon":
        # JTS: length of a polygon is its perimeter
        return float(
            sum(
                np.sqrt((np.diff(r[:, :2], axis=0) ** 2).sum(axis=1)).sum()
                for r in g.rings
            )
        )
    if t in ("MultiLineString", "MultiPolygon", "GeometryCollection"):
        return float(sum(length(p) for p in g.geoms))
    return 0.0


def _polygon_centroid(g: Polygon) -> tuple[float, float]:
    cx = cy = 0.0
    total = 0.0
    for k, ring in enumerate(g.rings):
        x = ring[:-1, 0]
        y = ring[:-1, 1]
        x2 = ring[1:, 0]
        y2 = ring[1:, 1]
        cr = x * y2 - x2 * y
        a = float(cr.sum()) / 2.0
        if a == 0:
            continue
        sgn = 1.0 if k == 0 else -1.0
        a_abs = abs(a) * sgn
        cxi = float(((x + x2) * cr).sum()) / (6.0 * a)
        cyi = float(((y + y2) * cr).sum()) / (6.0 * a)
        cx += cxi * a_abs
        cy += cyi * a_abs
        total += a_abs
    if total == 0:
        xy = all_coords(g)
        m = xy.mean(axis=0)
        return float(m[0]), float(m[1])
    return cx / total, cy / total


def centroid(g: Geometry) -> Point:
    """JTS semantics: centroid of the highest-dimension components."""
    if g.is_empty:
        return Point(None)
    P, L, A = _flatten(g)
    if A:
        sx = sy = tot = 0.0
        for poly in A:
            c = _polygon_centroid(poly)
            w = area(poly)
            if w == 0:
                continue
            sx += c[0] * w
            sy += c[1] * w
            tot += w
        if tot > 0:
            return Point([[sx / tot, sy / tot]])
    if L:
        sx = sy = tot = 0.0
        for line in L:
            c = line.coords[:, :2]
            d = np.diff(c, axis=0)
            seg_len = np.sqrt((d * d).sum(axis=1))
            mids = (c[:-1] + c[1:]) / 2.0
            sx += float((mids[:, 0] * seg_len).sum())
            sy += float((mids[:, 1] * seg_len).sum())
            tot += float(seg_len.sum())
        if tot > 0:
            return Point([[sx / tot, sy / tot]])
    xy = np.vstack([all_coords(p) for p in (P or [g])])
    m = xy.mean(axis=0)
    return Point([[float(m[0]), float(m[1])]])


def _min_dist_point_segs(px, py, segs) -> tuple[float, float, float]:
    """(dist, cx, cy): closest point on segs to (px,py)."""
    if segs.shape[0] == 0:
        return math.inf, np.nan, np.nan
    x1, y1, x2, y2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    dx, dy = x2 - x1, y2 - y1
    ln2 = dx * dx + dy * dy
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(ln2 > 0, ((px - x1) * dx + (py - y1) * dy) / ln2, 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx, cy = x1 + t * dx, y1 + t * dy
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    i = int(np.argmin(d2))
    return float(math.sqrt(d2[i])), float(cx[i]), float(cy[i])


def distance(a: Geometry, b: Geometry) -> float:
    """Planar min distance; 0 when intersecting."""
    if a.is_empty or b.is_empty:
        return float("nan")
    if intersects(a, b):
        return 0.0
    d, _, _ = _closest_pair(a, b)
    return d


def _closest_pair(a: Geometry, b: Geometry) -> tuple[float, float, float]:
    """(dist, ax, ay): closest point ON A to b (assumes not intersecting)."""
    ca = all_coords(a)
    cb = all_coords(b)
    sa = _geom_segments(a)
    sb = _geom_segments(b)
    best = (math.inf, np.nan, np.nan)
    # vertices of a -> segments/vertices of b
    for px, py in ca:
        if sb.shape[0]:
            d, _, _ = _min_dist_point_segs(px, py, sb)
        else:
            d2 = ((cb[:, 0] - px) ** 2 + (cb[:, 1] - py) ** 2).min() if len(cb) else math.inf
            d = math.sqrt(d2)
        if d < best[0]:
            best = (d, float(px), float(py))
    # vertices of b -> segments of a (closest point lies on a's segment)
    for px, py in cb:
        if sa.shape[0]:
            d, cx, cy = _min_dist_point_segs(px, py, sa)
            if d < best[0]:
                best = (d, cx, cy)
    return best


def closest_point(a: Geometry, b: Geometry) -> Point:
    """Point on A closest to B (GeoMesa st_closestPoint semantics)."""
    if a.is_empty or b.is_empty:
        return Point(None)
    if a.geom_type == "Point":
        return Point([[a.x, a.y]])
    if intersects(a, b):
        # any shared point; use a vertex of b inside a or an intersection pt
        Pb, Lb, Ab = _flatten(b)
        Pa, La, Aa = _flatten(a)
        eps = _EPS * _scale(a, b)
        for c in all_coords(b):
            if _locate(c[0], c[1], a, Pa, La, Aa, eps) != 2:
                return Point([[float(c[0]), float(c[1])]])
        for c in all_coords(a):
            if _locate(c[0], c[1], b, Pb, Lb, Ab, eps) != 2:
                return Point([[float(c[0]), float(c[1])]])
    d, x, y = _closest_pair(a, b)
    return Point([[x, y]])


# ---------------------------------------------------------------------------
# constructive ops
# ---------------------------------------------------------------------------


def envelope(g: Geometry) -> Geometry:
    if g.is_empty:
        return Point(None)
    xmin, ymin, xmax, ymax = g.bounds
    if xmin == xmax and ymin == ymax:
        return Point([[xmin, ymin]])
    if xmin == xmax or ymin == ymax:
        return LineString([[xmin, ymin], [xmax, ymax]])
    return Polygon(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]]
    )


def boundary(g: Geometry) -> Geometry:
    t = g.geom_type
    if t == "Point" or t == "MultiPoint":
        return GeometryCollection([])
    if t == "LineString":
        pts = _lineal_boundary_points(g)
        if len(pts) == 0:
            return MultiPoint([])
        return MultiPoint([Point([p]) for p in pts])
    if t == "MultiLineString":
        pts = _lineal_boundary_points(g)
        return MultiPoint([Point([p]) for p in pts])
    if t == "Polygon":
        rings = [LineString(r) for r in g.rings]
        if len(rings) == 1:
            return rings[0]
        return MultiLineString(rings)
    if t == "MultiPolygon":
        rings = [LineString(r) for p in g.geoms for r in p.rings]
        if len(rings) == 1:
            return rings[0]
        return MultiLineString(rings)
    return GeometryCollection([boundary(p) for p in g.geoms])


def convex_hull_of_coords(xy: np.ndarray) -> Geometry:
    """Andrew monotone chain. Returns Point/LineString/Polygon like JTS."""
    if len(xy) == 0:
        return GeometryCollection([])
    pts = np.unique(xy[~np.isnan(xy).any(axis=1)], axis=0)
    if len(pts) == 0:
        return GeometryCollection([])
    if len(pts) == 1:
        return Point([pts[0]])
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(points):
        # pop on non-left turns, decided by the filtered-exact orient
        # (round 13): float-only cross products can keep a concave
        # vertex on near-collinear adversaries; orient's A-filter keeps
        # the common case on the float fast path
        h: list[np.ndarray] = []
        for p in points:
            while len(h) >= 2 and orient(
                float(h[-2][0]), float(h[-2][1]),
                float(h[-1][0]), float(h[-1][1]),
                float(p[0]), float(p[1]),
            ) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 3:
        return LineString([pts[0], pts[-1]])
    ring = np.vstack(hull + [hull[0]])
    return Polygon(ring)


def convex_hull(g: Geometry) -> Geometry:
    return convex_hull_of_coords(all_coords(g))


def _dp_mask(coords: np.ndarray, tol: float) -> np.ndarray:
    n = coords.shape[0]
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        p = coords[i, :2]
        q = coords[j, :2]
        seg = np.array([[p[0], p[1], q[0], q[1]]])
        sub = coords[i + 1 : j, :2]
        dmax = -1.0
        imax = -1
        for k, (px, py) in enumerate(sub):
            d, _, _ = _min_dist_point_segs(px, py, seg)
            if d > dmax:
                dmax = d
                imax = i + 1 + k
        if dmax > tol:
            keep[imax] = True
            stack.append((i, imax))
            stack.append((imax, j))
    return keep


def simplify(g: Geometry, tolerance: float, preserve_topology: bool = False) -> Geometry:
    """Douglas-Peucker (reference st_simplify = JTS DouglasPeuckerSimplifier,
    ``spatial/.../ST_Simplify.scala:24``). preserve_topology keeps rings
    valid by falling back to the original ring when the result collapses."""
    t = g.geom_type
    if t in ("Point", "MultiPoint") or g.is_empty:
        return g
    if t == "LineString":
        keep = _dp_mask(g.coords, tolerance)
        c = g.coords[keep]
        if c.shape[0] < 2:
            c = g.coords[[0, -1]]
        return LineString(c, has_z=g.has_z, has_m=g.has_m)

    def simp_ring(r: np.ndarray) -> np.ndarray | None:
        keep = _dp_mask(r, tolerance)
        c = r[keep]
        if c.shape[0] < 4:
            return r if preserve_topology else None
        return c

    if t == "Polygon":
        shell = simp_ring(g.shell)
        if shell is None:
            return Polygon(None)
        holes = [h for h in (simp_ring(x) for x in g.holes) if h is not None]
        return Polygon(shell, holes, has_z=g.has_z, has_m=g.has_m)
    # multis
    parts = [simplify(p, tolerance, preserve_topology) for p in g.geoms]
    parts = [p for p in parts if not p.is_empty]
    cls = type(g)
    return cls(parts, has_z=g.has_z, has_m=g.has_m)


def translate(g: Geometry, dx: float, dy: float) -> Geometry:
    t = g.geom_type
    if t == "Point":
        if g.is_empty:
            return g
        c = g.coords.copy()
        c[:, 0] += dx
        c[:, 1] += dy
        return Point(c, has_z=g.has_z, has_m=g.has_m)
    if t == "LineString":
        c = g.coords.copy()
        if c.size:
            c[:, 0] += dx
            c[:, 1] += dy
        return LineString(c, has_z=g.has_z, has_m=g.has_m)
    if t == "Polygon":
        if g.is_empty:
            return g

        def mv(r):
            r = r.copy()
            r[:, 0] += dx
            r[:, 1] += dy
            return r

        return Polygon(mv(g.shell), [mv(h) for h in g.holes], has_z=g.has_z, has_m=g.has_m)
    return type(g)([translate(p, dx, dy) for p in g.geoms], has_z=g.has_z, has_m=g.has_m)


def is_simple(g: Geometry) -> bool:
    """No self-intersection other than shared endpoints (lineal); points:
    no duplicates; polygons assumed valid → simple."""
    t = g.geom_type
    if t == "Point":
        return True
    if t == "MultiPoint":
        xy = all_coords(g)
        return len(np.unique(xy, axis=0)) == len(xy)
    if t in ("Polygon", "MultiPolygon"):
        return True
    if t == "GeometryCollection":
        return all(is_simple(p) for p in g.geoms)
    # lineal
    segs = _geom_segments(g)
    n = segs.shape[0]
    if n <= 1:
        return True
    eps = _EPS * _scale(g)
    for i in range(n):
        p = segs[i, 0:2]
        q = segs[i, 2:4]
        others = segs[i + 1 :]
        if others.shape[0] == 0:
            continue
        ts = _split_params(p, q, others, eps)
        for tv in ts:
            # intersections allowed only at shared endpoints of adjacent segs
            pt = p + (q - p) * tv
            at_end_i = tv <= 1e-12 or tv >= 1 - 1e-12
            # check whether pt is an endpoint of every segment it touches
            on_adj = False
            for j in range(i + 1, n):
                s = segs[j]
                if _point_on_segments(pt[0], pt[1], s.reshape(1, 4), eps):
                    is_endpoint_j = (
                        np.hypot(*(pt - s[0:2])) <= eps or np.hypot(*(pt - s[2:4])) <= eps
                    )
                    if not (at_end_i and is_endpoint_j):
                        return False
                    on_adj = True
            if not on_adj and not at_end_i:
                return False
    return True
