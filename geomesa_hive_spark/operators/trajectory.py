"""Per-entity trajectory assembly — the moving-object workload the
GeoMesa ecosystem is built around (tracks from timestamped point
observations), expressed as one grouped aggregation.

Shape: one map-side-combinable groupBy per entity collecting the
(ts, tiebreak, lon, lat) structs, sorted in-array (``sort_array`` on
the struct — field-order comparison, deterministic given a unique
tiebreak), then segment measures folded over consecutive pairs with
``aggregate``. Everything after the single shuffle is per-row array
math in whole-stage codegen.

Exactness: each segment's great-circle length is rounded to WHOLE
METERS before summation — integer track totals are order-independent
and engine-exact. The haversine itself is emitted from ONE SQL template
(``haversine_sql``) used verbatim by the Spark expression and the
DuckDB oracle, so both engines evaluate the identical double
arithmetic (libm parity for sin/cos/asin is the contract the geodesy
suite already hash-verifies).

Scale: state per entity is its own point list — fine for bounded
tracks (the usual day/flight/voyage windowing); an entity with
unboundedly many points needs pre-windowing (e.g. groupBy user+day),
which composes with this operator unchanged. This honest limit is the
same one GeoMesa's track aggregations carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["haversine_sql", "build_tracks"]

_R = "6371008.7714"  # WGS84 mean radius — matches geom/geodesy.py


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Great-circle meters as a dialect-neutral SQL expression (the
    exact formula the spatial_geodesy oracle hash-verifies)."""
    dlat = f"radians(({lat2}) - ({lat1})) / 2.0"
    dlon = f"radians(({lon2}) - ({lon1})) / 2.0"
    # least(..., 1.0): near-antipodal pairs can push the argument one
    # ulp past 1.0 and asin would return NaN — clamp identically in
    # both engines
    arg = (
        f"least(sin({dlat}) * sin({dlat}) "
        f"+ cos(radians({lat1})) * cos(radians({lat2})) "
        f"* sin({dlon}) * sin({dlon}), 1.0)"
    )
    return f"2.0 * {_R} * asin(sqrt({arg}))"


def build_tracks(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    tiebreak_col: str,
    lon_col: str,
    lat_col: str,
) -> DataFrame:
    """Per-entity track stats: (entity, n_pts, track_m, dur_s, avg_mps,
    plus the track bbox). ``track_m`` is the integer-meter sum of
    consecutive great-circle segments in (ts, tiebreak) order."""
    grouped = df.groupBy(F.col(entity_col).alias("entity")).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("t"),
                    F.col(tiebreak_col).alias("k"),
                    F.col(lon_col).alias("x"),
                    F.col(lat_col).alias("y"),
                )
            )
        ).alias("a"),
        F.count("*").alias("n_pts"),
        F.round(F.min(lon_col), 2).alias("xmin"),
        F.round(F.min(lat_col), 2).alias("ymin"),
        F.round(F.max(lon_col), 2).alias("xmax"),
        F.round(F.max(lat_col), 2).alias("ymax"),
    )
    seg = haversine_sql(
        "element_at(a, i).y", "element_at(a, i).x",
        "element_at(a, i + 1).y", "element_at(a, i + 1).x",
    )
    track = F.expr(
        "CASE WHEN size(a) < 2 THEN CAST(0 AS BIGINT) ELSE "
        "aggregate(sequence(1, size(a) - 1), CAST(0 AS BIGINT), "
        f"(acc, i) -> acc + CAST(round({seg}) AS BIGINT)) END"
    )
    dur = F.expr(
        "(unix_micros(element_at(a, size(a)).t) - unix_micros(element_at(a, 1).t))"
        " DIV 1000000"
    )
    staged = grouped.select(
        "entity",
        "n_pts",
        track.alias("track_m"),
        dur.alias("dur_s"),
        "xmin",
        "ymin",
        "xmax",
        "ymax",
    )
    return staged.select(
        "entity",
        "n_pts",
        "track_m",
        "dur_s",
        F.when(F.col("dur_s") > 0, F.round(F.col("track_m") / F.col("dur_s"), 3))
        .otherwise(F.lit(0.0))
        .cast("double")
        .alias("avg_mps"),
        "xmin",
        "ymin",
        "xmax",
        "ymax",
    )
