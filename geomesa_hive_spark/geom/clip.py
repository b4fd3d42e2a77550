"""Constructive boolean ops: intersection and difference.

Backs ``st_intersection`` / ``st_difference`` (reference delegates to JTS
overlay via GeoMesa — ``ST_Intersection.scala:24``, ``ST_Difference.scala:24``).

Scope (documented, round-1): polygon/polygon via Greiner–Hormann on
shells with hole handling for the common cases; line/areal via
split-and-classify; puntal via membership. Degenerate vertex-on-edge
inputs are nudged by a relative epsilon and retried — adequate for
analytics workloads, not a full robust-overlay engine.
"""

from __future__ import annotations

import math

import numpy as np

from geomesa_hive_spark.geom import algorithms as alg
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

__all__ = ["intersection", "difference"]


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------


def intersection(a: Geometry, b: Geometry) -> Geometry:
    if a.is_empty or b.is_empty or alg._bboxes_disjoint(a, b):
        return GeometryCollection([])
    da, db = a.dimension, b.dimension
    if da == 0:
        return _points_in(a, b)
    if db == 0:
        return _points_in(b, a)
    if da == 1 and db == 2:
        return _line_areal(a, b, keep_inside=True)
    if da == 2 and db == 1:
        return _line_areal(b, a, keep_inside=True)
    if da == 1 and db == 1:
        return _line_line_intersection(a, b)
    return _poly_poly(a, b, op="intersection")


def difference(a: Geometry, b: Geometry) -> Geometry:
    if a.is_empty:
        return GeometryCollection([])
    if b.is_empty or alg._bboxes_disjoint(a, b):
        return a
    da, db = a.dimension, b.dimension
    if da == 0:
        return _points_out(a, b)
    if da == 1 and db == 2:
        return _line_areal(a, b, keep_inside=False)
    if da == 1 and db == 1:
        return _line_line_difference(a, b)
    if da == 2 and db < 2:
        return a  # subtracting lower-dim leaves an areal geometry unchanged
    return _poly_poly(a, b, op="difference")


# ---------------------------------------------------------------------------
# puntal
# ---------------------------------------------------------------------------


def _pack_points(pts: list[Point]) -> Geometry:
    if not pts:
        return GeometryCollection([])
    if len(pts) == 1:
        return pts[0]
    return MultiPoint(pts)


def _points_in(a: Geometry, b: Geometry) -> Geometry:
    eps = alg._EPS * alg._scale(a, b)
    Pb, Lb, Ab = alg._flatten(b)
    keep = [
        p
        for p in alg._flatten(a)[0]
        if alg._locate(p.x, p.y, b, Pb, Lb, Ab, eps) != 2
    ]
    return _pack_points(keep)


def _points_out(a: Geometry, b: Geometry) -> Geometry:
    eps = alg._EPS * alg._scale(a, b)
    Pb, Lb, Ab = alg._flatten(b)
    keep = [
        p
        for p in alg._flatten(a)[0]
        if alg._locate(p.x, p.y, b, Pb, Lb, Ab, eps) == 2
    ]
    return _pack_points(keep)


# ---------------------------------------------------------------------------
# lineal vs areal: split segments at the boundary, keep classified pieces
# ---------------------------------------------------------------------------


def _line_areal(lines: Geometry, areal: Geometry, keep_inside: bool) -> Geometry:
    eps = alg._EPS * alg._scale(lines, areal)
    segs_t = alg._geom_segments(areal)
    out: list[np.ndarray] = []
    for part in lines.geometries():
        if part.geom_type != "LineString" or part.is_empty:
            continue
        run: list[np.ndarray] = []
        for i in range(part.coords.shape[0] - 1):
            p = part.coords[i, :2]
            q = part.coords[i + 1, :2]
            ts = sorted(set([0.0, 1.0] + alg._split_params(p, q, segs_t, eps)))
            for t0, t1 in zip(ts[:-1], ts[1:]):
                if t1 - t0 <= 1e-12:
                    continue
                m = p + (q - p) * ((t0 + t1) / 2)
                side = alg._point_area_side(m[0], m[1], areal, eps)
                keep = (side >= 0) if keep_inside else (side < 0)
                if keep:
                    p0 = p + (q - p) * t0
                    p1 = p + (q - p) * t1
                    if run and np.allclose(run[-1], p0, atol=eps):
                        run.append(p1)
                    else:
                        if len(run) >= 2:
                            out.append(np.vstack(run))
                        run = [p0, p1]
                else:
                    if len(run) >= 2:
                        out.append(np.vstack(run))
                    run = []
        if len(run) >= 2:
            out.append(np.vstack(run))
    if not out:
        return GeometryCollection([])
    if len(out) == 1:
        return LineString(out[0])
    return MultiLineString([LineString(c) for c in out])


# ---------------------------------------------------------------------------
# lineal vs lineal
# ---------------------------------------------------------------------------


def _line_line_intersection(a: Geometry, b: Geometry) -> Geometry:
    eps = alg._EPS * alg._scale(a, b)
    segs_b = alg._geom_segments(b)
    pieces: list[np.ndarray] = []
    pts: list[tuple[float, float]] = []
    for part in a.geometries():
        if part.geom_type != "LineString" or part.is_empty:
            continue
        for i in range(part.coords.shape[0] - 1):
            p = part.coords[i, :2]
            q = part.coords[i + 1, :2]
            ts = sorted(set([0.0, 1.0] + alg._split_params(p, q, segs_b, eps)))
            for t0, t1 in zip(ts[:-1], ts[1:]):
                if t1 - t0 <= 1e-12:
                    continue
                m = p + (q - p) * ((t0 + t1) / 2)
                if alg._point_on_segments(m[0], m[1], segs_b, eps):
                    pieces.append(np.vstack([p + (q - p) * t0, p + (q - p) * t1]))
            for tv in ts[1:-1]:
                pt = p + (q - p) * tv
                if alg._point_on_segments(pt[0], pt[1], segs_b, eps):
                    pts.append((float(pt[0]), float(pt[1])))
    if pieces:
        if len(pieces) == 1:
            return LineString(pieces[0])
        return MultiLineString([LineString(c) for c in pieces])
    uniq = sorted(set(pts))
    return _pack_points([Point([list(p)]) for p in uniq])


def _line_line_difference(a: Geometry, b: Geometry) -> Geometry:
    eps = alg._EPS * alg._scale(a, b)
    segs_b = alg._geom_segments(b)
    out: list[np.ndarray] = []
    for part in a.geometries():
        if part.geom_type != "LineString" or part.is_empty:
            continue
        run: list[np.ndarray] = []
        for i in range(part.coords.shape[0] - 1):
            p = part.coords[i, :2]
            q = part.coords[i + 1, :2]
            ts = sorted(set([0.0, 1.0] + alg._split_params(p, q, segs_b, eps)))
            for t0, t1 in zip(ts[:-1], ts[1:]):
                if t1 - t0 <= 1e-12:
                    continue
                m = p + (q - p) * ((t0 + t1) / 2)
                if not alg._point_on_segments(m[0], m[1], segs_b, eps):
                    p0 = p + (q - p) * t0
                    p1 = p + (q - p) * t1
                    if run and np.allclose(run[-1], p0, atol=eps):
                        run.append(p1)
                    else:
                        if len(run) >= 2:
                            out.append(np.vstack(run))
                        run = [p0, p1]
                else:
                    if len(run) >= 2:
                        out.append(np.vstack(run))
                    run = []
        if len(run) >= 2:
            out.append(np.vstack(run))
    if not out:
        return GeometryCollection([])
    if len(out) == 1:
        return LineString(out[0])
    return MultiLineString([LineString(c) for c in out])


# ---------------------------------------------------------------------------
# polygon vs polygon — Greiner–Hormann on rings
# ---------------------------------------------------------------------------


class _V:
    __slots__ = ("x", "y", "next", "prev", "neighbor", "inter", "entry", "alpha", "visited")

    def __init__(self, x, y, inter=False, alpha=0.0):
        self.x = x
        self.y = y
        self.next = None
        self.prev = None
        self.neighbor = None
        self.inter = inter
        self.entry = False
        self.alpha = alpha
        self.visited = False


def _ring_ccw(ring: np.ndarray) -> np.ndarray:
    return ring if alg._ring_area(ring) > 0 else ring[::-1]


def _build_list(ring: np.ndarray) -> _V:
    head = None
    prev = None
    for x, y in ring[:-1, :2]:
        v = _V(float(x), float(y))
        if head is None:
            head = v
        else:
            prev.next = v
            v.prev = prev
        prev = v
    prev.next = head
    head.prev = prev
    return head


def _iter_ring(head: _V):
    v = head
    while True:
        yield v
        v = v.next
        if v is head:
            break


def _insert_intersections(ha: _V, hb: _V, eps: float) -> int:
    count = 0
    va = ha
    a_verts = list(_iter_ring(ha))
    b_verts = list(_iter_ring(hb))
    for va in a_verts:
        a0 = np.array([va.x, va.y])
        a1 = np.array([va.next.x if not va.next.inter else _skip(va).x,
                       va.next.y if not va.next.inter else _skip(va).y])
        # always use the ORIGINAL ring edge (skip inserted intersection verts)
        nb = _skip(va)
        a1 = np.array([nb.x, nb.y])
        for vb in b_verts:
            nb2 = _skip(vb)
            b0 = np.array([vb.x, vb.y])
            b1 = np.array([nb2.x, nb2.y])
            r = a1 - a0
            s = b1 - b0
            denom = r[0] * s[1] - r[1] * s[0]
            if abs(denom) < 1e-30:
                continue
            w = b0 - a0
            t = (w[0] * s[1] - w[1] * s[0]) / denom
            u = (w[0] * r[1] - w[1] * r[0]) / denom
            if 1e-12 < t < 1 - 1e-12 and 1e-12 < u < 1 - 1e-12:
                px, py = a0 + t * r
                ia = _V(float(px), float(py), inter=True, alpha=t)
                ib = _V(float(px), float(py), inter=True, alpha=u)
                ia.neighbor = ib
                ib.neighbor = ia
                _insert_sorted(va, ia)
                _insert_sorted(vb, ib)
                count += 1
    return count


def _skip(v: _V) -> _V:
    n = v.next
    while n.inter:
        n = n.next
    return n


def _insert_sorted(orig: _V, nv: _V):
    cur = orig
    nxt = orig.next
    while nxt.inter and nxt.alpha < nv.alpha:
        cur = nxt
        nxt = nxt.next
    cur.next = nv
    nv.prev = cur
    nv.next = nxt
    nxt.prev = nv


def _mark_entries(head: _V, other: Polygon, eps: float, invert: bool):
    first = head
    inside = alg._point_polygon_side(first.x, first.y, other, eps) > 0
    status = not inside  # next crossing is an entry iff we start outside
    if invert:
        status = not status
    for v in _iter_ring(head):
        if v.inter:
            v.entry = status
            status = not status


def _on_any_boundary(ring: np.ndarray, other: Polygon, eps: float) -> bool:
    segs = np.vstack([alg._segments(r) for r in other.rings])
    for x, y in ring[:-1, :2]:
        if alg._point_on_segments(x, y, segs, eps):
            return True
    return False


def _gh_rings(ring_a: np.ndarray, ring_b: np.ndarray, op: str, eps: float) -> list[np.ndarray] | None:
    """Greiner–Hormann between two simple rings (both CCW input).

    Returns result rings, or None when no crossings exist (caller handles
    containment/disjoint)."""
    ring_a = _ring_ccw(ring_a[:, :2])
    ring_b = _ring_ccw(ring_b[:, :2])
    pa = Polygon(ring_a)
    pb = Polygon(ring_b)
    # perturb until no vertex lies exactly on the other boundary
    scale = alg._scale(pa, pb)
    nudge = scale * 1e-11
    tries = 0
    while (_on_any_boundary(ring_a, pb, eps) or _on_any_boundary(ring_b, pa, eps)) and tries < 3:
        ring_b = ring_b + np.array([nudge, nudge * 0.7])
        pb = Polygon(ring_b)
        nudge *= 13
        tries += 1
    ha = _build_list(ring_a)
    hb = _build_list(ring_b)
    n = _insert_intersections(ha, hb, eps)
    if n == 0:
        return None
    # Greiner–Hormann flag convention: intersection = no inversion;
    # difference A−B = invert the subject's flags (walk A where outside B)
    _mark_entries(ha, pb, eps, invert=(op == "difference"))
    _mark_entries(hb, pa, eps, invert=False)
    results = []
    for v in _iter_ring(ha):
        if v.inter and not v.visited:
            ring = []
            cur = v
            while not cur.visited:
                cur.visited = True
                if cur.neighbor is not None:
                    cur.neighbor.visited = True
                if cur.entry:
                    while True:
                        ring.append((cur.x, cur.y))
                        cur = cur.next
                        if cur.inter:
                            break
                else:
                    while True:
                        ring.append((cur.x, cur.y))
                        cur = cur.prev
                        if cur.inter:
                            break
                cur = cur.neighbor
            if len(ring) >= 3:
                arr = np.array(ring + [ring[0]])
                if abs(alg._ring_area(arr)) > (scale * 1e-12) ** 2:
                    results.append(arr)
    return results


def _pack_polys(rings: list[np.ndarray]) -> Geometry:
    """Assemble rings into Polygon/MultiPolygon, nesting holes."""
    if not rings:
        return GeometryCollection([])
    polys = [Polygon(_ring_ccw(r)) for r in rings]
    # nest: a ring strictly inside another becomes its hole
    eps = alg._EPS * alg._scale(*polys)
    shells: list[Polygon] = []
    holes: list[tuple[int, np.ndarray]] = []
    order = sorted(range(len(polys)), key=lambda i: -alg.area(polys[i]))
    placed = []
    for i in order:
        parent = None
        for j, sp in enumerate(placed):
            c = alg._interior_point(polys[i])
            if c and alg._point_polygon_side(c[0], c[1], shells[j], eps) == 1:
                parent = j
                break
        if parent is None:
            shells.append(polys[i])
            placed.append(i)
        else:
            shells[parent] = Polygon(
                shells[parent].shell, shells[parent].holes + [polys[i].shell]
            )
    if len(shells) == 1:
        return shells[0]
    return MultiPolygon(shells)


def _poly_poly(a: Geometry, b: Geometry, op: str) -> Geometry:
    eps = alg._EPS * alg._scale(a, b)
    Aa = [p for p in a.geometries() if p.geom_type == "Polygon" and not p.is_empty]
    Ab = [p for p in b.geometries() if p.geom_type == "Polygon" and not p.is_empty]
    out_parts: list[Polygon] = []
    if op == "intersection":
        # a ∩ (b1 ∪ b2 ∪ …) = ∪ (a ∩ bi) — parts of a MultiPolygon are
        # disjoint, so the pairwise pieces don't overlap
        for pa in Aa:
            for pb in Ab:
                piece = _poly_pair(pa, pb, "intersection", eps)
                for g in piece.geometries():
                    if g.geom_type == "Polygon" and not g.is_empty:
                        out_parts.append(g)
    else:
        # a − (b1 ∪ b2 ∪ …): fold the subtrahends through each part of a
        for pa in Aa:
            current: list[Polygon] = [pa]
            for pb in Ab:
                nxt: list[Polygon] = []
                for cur in current:
                    piece = _poly_pair(cur, pb, "difference", eps)
                    for g in piece.geometries():
                        if g.geom_type == "Polygon" and not g.is_empty:
                            nxt.append(g)
                current = nxt
                if not current:
                    break
            out_parts.extend(current)
    if not out_parts:
        return GeometryCollection([])
    if len(out_parts) == 1:
        return out_parts[0]
    return MultiPolygon(out_parts)


def _ring_inside_ring(inner: np.ndarray, outer: np.ndarray, eps: float) -> bool:
    """With no boundary crossings, a whole ring lies on one side of the
    other: test one vertex (falling back past boundary-grazing vertices)."""
    op_ = Polygon(outer)
    for x, y in inner[:-1, :2]:
        s = alg._point_polygon_side(float(x), float(y), op_, eps)
        if s != 0:
            return s > 0
    return True  # every vertex on the boundary: treat as contained


def _poly_pair(a: Polygon, b: Polygon, op: str, eps: float) -> Geometry:
    """op between two polygons (shell + holes each).

    intersection(a, b) = (shellA ∩ shellB) − holesA − holesB
    difference(a, b)   = (shellA − shellB) − holesA  ∪  (a ∩ holesB)
    """
    rings = _gh_rings(a.shell, b.shell, op, eps)
    if rings is None:
        # no shell crossings: containment or disjoint
        a_in_b = _ring_inside_ring(a.shell, b.shell, eps)
        b_in_a = not a_in_b and _ring_inside_ring(b.shell, a.shell, eps)
        if op == "intersection":
            if a_in_b:
                base: Geometry = Polygon(a.shell)
            elif b_in_a:
                base = Polygon(b.shell)
            else:
                return GeometryCollection([])
        else:  # difference
            if a_in_b:
                base = GeometryCollection([])
            elif b_in_a:
                base = Polygon(a.shell, [b.shell])  # b punches a hole in a
            else:
                base = Polygon(a.shell)
    else:
        base = _pack_polys(rings)
    # carve out both inputs' holes from the shell-level result
    for hole in list(a.holes) + (list(b.holes) if op == "intersection" else []):
        base = _subtract_ring(base, hole, eps)
    if op == "difference":
        # region of a lying inside a hole of b is NOT subtracted
        for hole in b.holes:
            extra = _poly_pair(a, Polygon(hole), "intersection", eps)
            for g in extra.geometries():
                if g.geom_type == "Polygon" and not g.is_empty:
                    base = _merge(base, g)
    return base


def _subtract_ring(base: Geometry, hole: np.ndarray, eps: float) -> Geometry:
    parts = []
    for g in base.geometries():
        if g.geom_type != "Polygon" or g.is_empty:
            continue
        piece = _poly_pair_no_holes(g, Polygon(hole), "difference", eps)
        for r in piece.geometries():
            if r.geom_type == "Polygon" and not r.is_empty:
                parts.append(r)
    if not parts:
        return GeometryCollection([])
    if len(parts) == 1:
        return parts[0]
    return MultiPolygon(parts)


def _shell_in_some_hole(shell: np.ndarray, holes: list[np.ndarray], eps: float) -> bool:
    return any(
        not _rings_cross(shell, h, eps) and _ring_inside_ring(shell, h, eps)
        for h in holes
    )


def _rings_cross(r1: np.ndarray, r2: np.ndarray, eps: float) -> bool:
    touch, _ = alg._boundaries_cross_info(LineString(r1), LineString(r2), eps)
    return touch


def _poly_pair_no_holes(a: Polygon, b: Polygon, op: str, eps: float) -> Geometry:
    rings = _gh_rings(a.shell, b.shell, op, eps)
    if rings is None:
        a_in_b = _ring_inside_ring(a.shell, b.shell, eps)
        b_in_a = not a_in_b and _ring_inside_ring(b.shell, a.shell, eps)
        if b_in_a and _shell_in_some_hole(b.shell, a.holes, eps):
            # b sits inside a hole of a: no actual overlap
            if op == "intersection":
                return GeometryCollection([])
            return Polygon(a.shell, a.holes)
        if op == "intersection":
            if a_in_b:
                return Polygon(a.shell, a.holes)
            if b_in_a:
                return Polygon(b.shell)
            return GeometryCollection([])
        if a_in_b:
            return GeometryCollection([])
        if b_in_a:
            return Polygon(a.shell, list(a.holes) + [b.shell])
        return Polygon(a.shell, a.holes)
    base = _pack_polys(rings)
    for hole in a.holes:
        base = _subtract_ring(base, hole, eps)
    return base


def _merge(base: Geometry, extra: Polygon) -> Geometry:
    parts = [g for g in base.geometries() if g.geom_type == "Polygon" and not g.is_empty]
    parts.append(extra)
    if len(parts) == 1:
        return parts[0]
    return MultiPolygon(parts)
