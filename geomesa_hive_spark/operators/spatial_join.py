"""Distributed spatial join: geometry × geometry, no cross join.

The reference has no join operator at all — its users fall back to a
Cartesian ``ST_Intersects`` filter, which dies at scale. This is the
standard partition-based spatial-merge join (PBSM / GeoSpark-style)
re-expressed in DataFrame ops so every stage is a stock Spark shuffle:

1. each side's geometry bbox is exploded to the fixed-grid cells it
   overlaps (native ``sequence``/``transform``/``explode`` expressions —
   a point lands in exactly one cell);
2. candidates = equi-join on cell id (hash shuffle both sides on the
   SAME key → co-located, no broadcast needed at any scale);
3. a native bbox-overlap conjunction prunes non-touching candidates
   before anything expensive runs;
4. duplicate pair suppression via the reference-point rule: a pair is
   kept only in the one cell that contains the reference corner
   ``(max(xmin_a, xmin_b), max(ymin_a, ymin_b))`` of the bbox overlap —
   dedup happens inside the joined partition, NOT as a global distinct
   (which would be a second full shuffle of the candidate stream);
5. the exact geometry predicate (pandas UDF over the WKB pair) runs
   last, on the few bbox-confirmed survivors.

At 100 TB the only tunables are ``cell_size`` (match it to the p95
geometry extent so most rows explode to ≤4 cells) and the shuffle
partition count; skewed cells (cities, null islands) are handled by
AQE skew-join splitting since stage 2 is a plain shuffled hash join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "spatial_join", "spatial_knn_join",
    "distance_join", "distance_join_sphere",
]

# grid-cell encoding: cell = (ix + OFFSET) * STRIDE + (iy + OFFSET).
# OFFSET = 2^30 supports |coord / cell_size| up to ~1.07e9 — degree
# grids down to ~1.7e-7° cells or projected-meter grids to ±2^30 m —
# while (ix + OFFSET) * STRIDE + (iy + OFFSET) < 2^62 stays a positive
# long. Indices outside that range raise at runtime (assert_true in
# _cells) instead of silently aliasing far-apart cells.
_OFFSET = 1 << 30
_STRIDE = 1 << 31

_PREDICATES = {
    "intersects": "st_intersects",
    "contains": "st_contains",
    "within": "st_within",
    "covers": "st_covers",
    "crosses": "st_crosses",
    "touches": "st_touches",
    "overlaps": "st_overlaps",
    "equals": "st_equals",
}


def _cells(bbox: Column, cell_size: float) -> Column:
    """Array of encoded cell ids the bbox [xmin..xmax]×[ymin..ymax] overlaps.

    Null/empty geometries (NaN bounds) yield NULL, which ``explode``
    drops — null never joins, matching SQL join semantics."""
    cs = F.lit(float(cell_size))
    ix0 = F.floor(bbox["xmin"] / cs).cast("long")
    ix1 = F.floor(bbox["xmax"] / cs).cast("long")
    iy0 = F.floor(bbox["ymin"] / cs).cast("long")
    iy1 = F.floor(bbox["ymax"] / cs).cast("long")
    grid = F.flatten(
        F.transform(
            F.sequence(ix0, ix1),
            lambda ix: F.transform(
                F.sequence(iy0, iy1),
                lambda iy: (ix + F.lit(_OFFSET)) * F.lit(_STRIDE) + iy + F.lit(_OFFSET),
            ),
        )
    )
    # encoding-capacity guard: indices at/over ±OFFSET would alias
    # distinct cells (silently merging far-apart geometry) — raise
    in_range = (
        (ix0 > F.lit(-_OFFSET))
        & (ix1 < F.lit(_OFFSET))
        & (iy0 > F.lit(-_OFFSET))
        & (iy1 < F.lit(_OFFSET))
    )
    ok = F.when(F.isnan(bbox["xmin"]), F.lit(True)).otherwise(in_range)
    guard = F.assert_true(
        ok,
        F.lit(
            "spatial_join: grid index exceeds encoding capacity "
            f"(|coord/cell_size| must stay < {_OFFSET}); increase cell_size"
        ),
    )
    return F.when(guard.isNull() & ~F.isnan(bbox["xmin"]), grid)


def _prepared(df: DataFrame, geom_col: str, bbox_col: str | None, side: str, cell_size: float) -> DataFrame:
    bbox = (
        F.col(bbox_col)
        if bbox_col
        else F.call_function("st_extentfromgeom", F.col(geom_col))
    )
    pref = f"__{side}"
    out = df.withColumn(f"{pref}_bbox", bbox)
    out = out.withColumn(f"{pref}_cell", F.explode(_cells(F.col(f"{pref}_bbox"), cell_size)))
    return out


def spatial_join(
    left: DataFrame,
    right: DataFrame,
    predicate: str = "intersects",
    left_geom: str = "geom",
    right_geom: str = "geom",
    left_bbox: str | None = None,
    right_bbox: str | None = None,
    cell_size: float = 1.0,
    exact: bool = True,
    broadcast_right: bool = False,
    salt: int = 1,
) -> DataFrame:
    """Inner spatial join of ``left`` × ``right`` on a geometry predicate.

    Returns all column pairs (left columns first; name collisions are the
    caller's to alias beforehand, as with any Spark join). ``exact=False``
    stops after the bbox-overlap test — correct for point × point
    "same-cell" semantics and for prefiltering pipelines that run their
    own refinement.

    ``broadcast_right=True`` is the small-dimension knob: the right
    side's exploded cell table ships to every executor and the cell
    equi-join becomes a BroadcastHashJoin — the BIG side is never
    shuffled at all (the default hash join shuffles both sides on the
    cell key). The classic case is points × admin-boundaries: 100 TB of
    points against a few thousand zone polygons should move zero point
    bytes across the network. The right side's exploded size must fit
    the broadcast budget; Spark errors past
    ``spark.sql.autoBroadcastJoinThreshold``-independent hint limits
    rather than silently degrading.

    ``salt > 1`` is the HOT-CELL knob (the ``block_shards`` pattern from
    pipeline/entity.py, round 14): a clustered dataset — every geometry
    in one city — lands its whole candidate workload on the ONE reducer
    owning that cell, and AQE's skew split only rescues the sort-merge
    path when partition-size thresholds trip. Salting fixes it
    structurally: each LEFT row's cell key gains a deterministic shard
    ``xxhash64(geom) % salt`` and the RIGHT side replicates each
    exploded cell row ×salt, so one hot cell fans across ``salt``
    reducers. Every candidate pair still meets exactly once (the left
    row carries ONE shard; the replicated right matches it there), so
    reference-point dedup and the exact predicate are untouched —
    results are row-identical to ``salt=1`` (pytest-pinned). Cost:
    right-side shuffle volume ×salt — keep the replicated side the
    smaller one. Incompatible with ``broadcast_right`` (that path
    shuffles nothing, so there is no skew to split — and replicating
    the broadcast table would only inflate it).

    Register the ST surface first (``register_all(spark)``) —
    the exact predicate and the bbox derivation call the SQL functions.
    """
    if predicate not in _PREDICATES:
        raise ValueError(f"predicate must be one of {sorted(_PREDICATES)}")
    salt = int(salt)
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    if salt > 1 and broadcast_right:
        raise ValueError(
            "salt > 1 with broadcast_right: the broadcast path has no "
            "shuffle to skew — drop one of the two"
        )
    a = _prepared(left, left_geom, left_bbox, "l", cell_size)
    b = _prepared(right, right_geom, right_bbox, "r", cell_size)
    if salt > 1:
        # deterministic per-row shard over ALL left columns (not just
        # the geometry: stacked identical points would otherwise share
        # a shard and stay hot); fully-duplicate rows are genuinely
        # indistinguishable and keep sharing one
        a = a.withColumn(
            "__l_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                   F.lit(salt)),
        )
        b = b.withColumn(
            "__r_salt",
            F.explode(F.array(*[F.lit(i) for i in range(salt)])),
        )
    if broadcast_right:
        b = F.broadcast(b)

    cond = a["__l_cell"] == b["__r_cell"]
    if salt > 1:
        cond = cond & (a["__l_salt"] == b["__r_salt"])
    joined = a.join(b, cond)

    la, ra = F.col("__l_bbox"), F.col("__r_bbox")
    overlap = (
        (la["xmin"] <= ra["xmax"])
        & (la["xmax"] >= ra["xmin"])
        & (la["ymin"] <= ra["ymax"])
        & (la["ymax"] >= ra["ymin"])
    )
    # reference-point dedup: keep the pair only in the cell that owns the
    # lower-left corner of the bbox intersection
    cs = F.lit(float(cell_size))
    rx = F.greatest(la["xmin"], ra["xmin"])
    ry = F.greatest(la["ymin"], ra["ymin"])
    ref_cell = (
        (F.floor(rx / cs).cast("long") + F.lit(_OFFSET)) * F.lit(_STRIDE)
        + F.floor(ry / cs).cast("long")
        + F.lit(_OFFSET)
    )
    cand = joined.filter(overlap & (F.col("__l_cell") == ref_cell))

    if exact:
        cand = cand.filter(
            F.call_function(_PREDICATES[predicate], a[left_geom], b[right_geom])
        )
    drop = ["__l_bbox", "__l_cell", "__r_bbox", "__r_cell"]
    if salt > 1:
        drop += ["__l_salt", "__r_salt"]
    return cand.drop(*drop)


def spatial_knn_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_xy: tuple[str, str],
    right_xy: tuple[str, str],
    k: int,
    radius: float,
) -> DataFrame:
    """Bounded-radius k-nearest-neighbor spatial join: for each left
    point, the ``k`` nearest right points within ``radius`` (planar
    distance), deterministically tie-broken by (distance², right id).

    Bounded-radius kNN is the practical form (GeoMesa's knn command is
    radius-bounded the same way, and at 100 TB an unbounded global kNN
    would need expanding-ring re-shuffles): with grid cell size =
    ``radius``, every right point within the radius of a left point
    lies in the 3×3 cell neighborhood, so ONE equi-join on cell id
    captures all candidates — the left side explodes ×9, the right
    side lands in exactly one cell, the shuffle carries (cell, id, x,
    y) rows only, and AQE's skew split applies to hot cells like any
    hash join. Candidates are then distance-filtered and ranked with a
    per-left-id window. Left points with no neighbor in range produce
    no rows (inner semantics).

    Exactness: distance² = dx·dx + dy·dy in doubles — identical IEEE
    arithmetic in any engine, so the (d2, right_id) ordering is
    deterministic and the whole operator is oracle-replayable."""
    lx, ly = left_xy
    rx, ry = right_xy
    cs = float(radius)
    li = F.floor(F.col(lx) / cs).cast("long")
    lj = F.floor(F.col(ly) / cs).cast("long")
    # 3x3 neighborhood of the left point's cell
    neigh = F.array(
        *[
            (li + dx + _OFFSET) * _STRIDE + (lj + dy + _OFFSET)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = left.select(
        F.col(left_id).alias("__lid"),
        F.col(lx).alias("__lx"),
        F.col(ly).alias("__ly"),
        F.explode(neigh).alias("__cell"),
    )
    ri = F.floor(F.col(rx) / cs).cast("long")
    rj = F.floor(F.col(ry) / cs).cast("long")
    b = right.select(
        F.col(right_id).alias("__rid"),
        F.col(rx).alias("__rx"),
        F.col(ry).alias("__ry"),
        ((ri + _OFFSET) * _STRIDE + (rj + _OFFSET)).alias("__cell"),
    )
    d2 = (
        (F.col("__lx") - F.col("__rx")) * (F.col("__lx") - F.col("__rx"))
        + (F.col("__ly") - F.col("__ry")) * (F.col("__ly") - F.col("__ry"))
    )
    cand = (
        a.join(b, "__cell")
        .withColumn("__d2", d2)
        .filter(F.col("__d2") <= F.lit(cs * cs))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__lid").orderBy(F.asc("__d2"), F.asc("__rid"))
    out = (
        cand.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(k))
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            F.col("__d2").alias("dist_sq"),
            F.col("__rk").alias("rank"),
        )
    )
    return out


def _check_dist_col(dist_col, left: DataFrame, right: DataFrame) -> None:
    """Refuse a ``dist_col`` that already exists on either input
    (ADVICE r7): appending it via rename would produce a duplicate-name
    DataFrame that breaks downstream select/collect — the explicit-
    refusal style the repo uses elsewhere (write_geoparquet 'bbox')."""
    if dist_col and (dist_col in left.columns or dist_col in right.columns):
        raise ValueError(
            f"dist_col {dist_col!r} already exists on an input; pass a "
            f"different name (or dist_col=None to omit the distance)"
        )


def distance_join(
    left: DataFrame,
    right: DataFrame,
    distance: float,
    left_geom: str = "geom",
    right_geom: str = "geom",
    left_bbox: str | None = None,
    right_bbox: str | None = None,
    cell_size: float | None = None,
    dist_col: str | None = "dist",
) -> DataFrame:
    """All pairs within planar ``distance`` — PostGIS ``ST_DWithin`` as
    a distributed join (the reference exposes only scalar st_distance;
    its users' DWithin query is a Cartesian filter — this is the
    join-shaped version that survives scale).

    Same PBSM skeleton as :func:`spatial_join` with the ONE-SIDED bbox
    expansion of ``hausdorff_join`` (operators/trajectory.py): only the
    LEFT bbox grows by ``distance`` before cell explosion, which is
    sufficient — a qualifying pair's expanded-left bbox always overlaps
    the right bbox — and half as much fan-out as expanding both sides.
    Candidate pruning is the bbox-GAP test (gapx² + gapy² ≤ d², native
    arithmetic on the UNEXPANDED boxes); the exact ``st_distance``
    pandas UDF runs last on gap-confirmed survivors, and for
    point × point inputs the gap test IS the distance, so the exact
    pass confirms rather than discovers. Reference-point dedup keeps a
    pair only in the cell owning the lower-left corner of the
    expanded-left × right bbox intersection — no global distinct.

    ``dist_col`` (default ``"dist"``) appends the planar distance;
    pass None to omit. ``cell_size`` defaults to ``max(distance, 1.0)``
    so the expansion adds at most ~2 cells per axis."""
    d = float(distance)
    if d < 0:
        raise ValueError("distance must be >= 0")
    _check_dist_col(dist_col, left, right)
    cs = float(cell_size) if cell_size is not None else max(d, 1.0)

    lb = (
        F.col(left_bbox)
        if left_bbox
        else F.call_function("st_extentfromgeom", F.col(left_geom))
    )
    a = left.withColumn("__l_bbox", lb)
    ebox = F.struct(
        (F.col("__l_bbox")["xmin"] - F.lit(d)).alias("xmin"),
        (F.col("__l_bbox")["ymin"] - F.lit(d)).alias("ymin"),
        (F.col("__l_bbox")["xmax"] + F.lit(d)).alias("xmax"),
        (F.col("__l_bbox")["ymax"] + F.lit(d)).alias("ymax"),
    )
    a = a.withColumn("__l_ebox", ebox)
    a = a.withColumn("__l_cell", F.explode(_cells(F.col("__l_ebox"), cs)))
    b = _prepared(right, right_geom, right_bbox, "r", cs)

    joined = a.join(b, a["__l_cell"] == b["__r_cell"])
    ea, la, ra = F.col("__l_ebox"), F.col("__l_bbox"), F.col("__r_bbox")
    overlap = (
        (ea["xmin"] <= ra["xmax"])
        & (ea["xmax"] >= ra["xmin"])
        & (ea["ymin"] <= ra["ymax"])
        & (ea["ymax"] >= ra["ymin"])
    )
    csl = F.lit(cs)
    rx = F.greatest(ea["xmin"], ra["xmin"])
    ry = F.greatest(ea["ymin"], ra["ymin"])
    ref_cell = (
        (F.floor(rx / csl).cast("long") + F.lit(_OFFSET)) * F.lit(_STRIDE)
        + F.floor(ry / csl).cast("long")
        + F.lit(_OFFSET)
    )
    gapx = F.greatest(
        F.lit(0.0), F.greatest(la["xmin"], ra["xmin"]) - F.least(la["xmax"], ra["xmax"])
    )
    gapy = F.greatest(
        F.lit(0.0), F.greatest(la["ymin"], ra["ymin"]) - F.least(la["ymax"], ra["ymax"])
    )
    cand = joined.filter(
        overlap
        & (F.col("__l_cell") == ref_cell)
        & (gapx * gapx + gapy * gapy <= F.lit(d * d))
    )
    dist = F.call_function("st_distance", a[left_geom], b[right_geom])
    cand = cand.withColumn("__dist", dist).filter(F.col("__dist") <= F.lit(d))
    drop = ["__l_bbox", "__l_ebox", "__l_cell", "__r_bbox", "__r_cell"]
    if dist_col:
        return cand.withColumnRenamed("__dist", dist_col).drop(*drop)
    return cand.drop("__dist", *drop)


def distance_join_sphere(
    left: DataFrame,
    right: DataFrame,
    meters: float,
    left_geom: str = "geom",
    right_geom: str = "geom",
    left_bbox: str | None = None,
    right_bbox: str | None = None,
    cell_size: float | None = None,
    dist_col: str | None = "dist_m",
) -> DataFrame:
    """Great-circle ``ST_DWithin`` (PostGIS geography semantics): all
    pairs within ``meters`` along the 6371008.7714 m mean sphere —
    the radius of every st_distanceSphere/geodesy kernel in this repo
    (geom/geodesy.py:29), so results compose with the rest of the ST
    surface and replay in the same SQL haversine the geodesy gates
    hash-verify.

    Same one-sided-expansion skeleton as :func:`distance_join`, with
    two spherical corrections the planar version doesn't need:

    - the longitude envelope is the EXACT inverse haversine bound,
      Δλ = 2·asin(sin(d/2R) / cos φ*) at the expanded envelope's
      worst-case |φ*| — the linearized d/(R·cosφ) UNDERESTIMATES at
      high latitude (great circles cut poleward of the parallel) and
      provably drops pairs; when sin(d/2R) ≥ cos φ* the cap sees
      every longitude and the envelope degenerates to ±180°;
    - the envelope WRAPS the antimeridian: each left row explodes
      under the longitude offsets {-360, 0, +360} whose shifted
      envelope still intersects [-180, 180], so a pair whose short
      arc crosses ±180° is found under exactly one offset (offsets
      are 360° apart and the envelope is clamped to full-range
      before it could span 360°, so no pair is found twice — pair
      dedup stays the reference-cell rule, never a global distinct).

    The exact ``st_distanceSphere`` pandas UDF runs last on
    bbox-confirmed candidates."""
    import math

    d = float(meters)
    if d < 0:
        raise ValueError("distance must be >= 0")
    _check_dist_col(dist_col, left, right)
    R = 6_371_008.7714
    dlat = d / R * 180.0 / math.pi
    sin_half = math.sin(min(d / (2.0 * R), math.pi / 2.0))
    cs = float(cell_size) if cell_size is not None else max(dlat * 2.0, 1.0)

    lb = (
        F.col(left_bbox)
        if left_bbox
        else F.call_function("st_extentfromgeom", F.col(left_geom))
    )
    a = left.withColumn("__l_bbox", lb)
    y0 = F.col("__l_bbox")["ymin"] - F.lit(dlat)
    y1 = F.col("__l_bbox")["ymax"] + F.lit(dlat)
    # smallest cos|φ| over the EXPANDED band; envelope goes full-range
    # when the inverse-haversine bound is undefined there (polar caps)
    wlat = F.greatest(F.abs(y0), F.abs(y1))
    cosmin = F.cos(F.radians(F.least(wlat, F.lit(90.0))))
    full = (F.lit(sin_half) >= cosmin) | (wlat >= F.lit(89.99))
    dlon = F.when(full, F.lit(180.0)).otherwise(
        F.degrees(F.lit(2.0) * F.asin(F.lit(sin_half) / cosmin))
    )
    ex0 = F.col("__l_bbox")["xmin"] - dlon
    ex1 = F.col("__l_bbox")["xmax"] + dlon
    # a ≥360°-wide envelope sees every longitude: clamp and use only
    # offset 0 (any wider and a pair could be found under two offsets)
    full_span = full | ((ex1 - ex0) >= F.lit(360.0))
    ex0 = F.when(full_span, F.lit(-180.0)).otherwise(ex0)
    ex1 = F.when(full_span, F.lit(180.0)).otherwise(ex1)
    offs = F.when(full_span, F.array(F.lit(0.0))).otherwise(
        F.filter(
            F.array(F.lit(-360.0), F.lit(0.0), F.lit(360.0)),
            lambda o: (ex1 + o >= F.lit(-180.0)) & (ex0 + o <= F.lit(180.0)),
        )
    )
    a = a.withColumn("__off", F.explode(offs))
    ebox = F.struct(
        (ex0 + F.col("__off")).alias("xmin"),
        y0.alias("ymin"),
        (ex1 + F.col("__off")).alias("xmax"),
        y1.alias("ymax"),
    )
    a = a.withColumn("__l_ebox", ebox)
    a = a.withColumn("__l_cell", F.explode(_cells(F.col("__l_ebox"), cs)))
    b = _prepared(right, right_geom, right_bbox, "r", cs)

    joined = a.join(b, a["__l_cell"] == b["__r_cell"])
    ea, ra = F.col("__l_ebox"), F.col("__r_bbox")
    overlap = (
        (ea["xmin"] <= ra["xmax"])
        & (ea["xmax"] >= ra["xmin"])
        & (ea["ymin"] <= ra["ymax"])
        & (ea["ymax"] >= ra["ymin"])
    )
    csl = F.lit(cs)
    rx = F.greatest(ea["xmin"], ra["xmin"])
    ry = F.greatest(ea["ymin"], ra["ymin"])
    ref_cell = (
        (F.floor(rx / csl).cast("long") + F.lit(_OFFSET)) * F.lit(_STRIDE)
        + F.floor(ry / csl).cast("long")
        + F.lit(_OFFSET)
    )
    cand = joined.filter(overlap & (F.col("__l_cell") == ref_cell))
    dist = F.call_function("st_distancesphere", a[left_geom], b[right_geom])
    cand = cand.withColumn("__dist", dist).filter(F.col("__dist") <= F.lit(d))
    drop = ["__l_bbox", "__l_ebox", "__l_cell", "__r_bbox", "__r_cell", "__off"]
    if dist_col:
        return cand.withColumnRenamed("__dist", dist_col).drop(*drop)
    return cand.drop("__dist", *drop)
