"""Engine-level spatial operators: filter pushdown, spatial partitioning,
distributed aggregates, schema introspection."""

from geomesa_hive_spark.operators.pushdown import (
    contains_pushdown,
    intersects_pushdown,
)
from geomesa_hive_spark.operators.partitioning import (
    add_z2_columns,
    write_spatially_partitioned,
)
from geomesa_hive_spark.operators.convex_hull_agg import (
    convex_hull_agg,
    convex_hull_grouped,
    register_convex_hull_udaf,
)
from geomesa_hive_spark.operators.geom_fields import is_geom_field
from geomesa_hive_spark.operators.spatial_join import spatial_join
from geomesa_hive_spark.operators.spatial_sql import (
    rewrite_spatial_predicates,
    spatial_sql,
)
from geomesa_hive_spark.operators.join_strategies import salted_join, write_bucketed
from geomesa_hive_spark.operators.temporal import asof_join, range_join, scd2_intervals

__all__ = [
    "spatial_join",
    "write_bucketed",
    "salted_join",
    "asof_join",
    "scd2_intervals",
    "range_join",
    "intersects_pushdown",
    "contains_pushdown",
    "spatial_sql",
    "rewrite_spatial_predicates",
    "add_z2_columns",
    "write_spatially_partitioned",
    "convex_hull_agg",
    "convex_hull_grouped",
    "register_convex_hull_udaf",
    "is_geom_field",
]
