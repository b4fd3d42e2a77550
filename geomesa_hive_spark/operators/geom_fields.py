"""Schema introspection: which columns hold geometry?

The reference's only UDTF, ``st_isGeomField``
(``spatial/.../ST_IsGeomField.scala:27-39``): per-column boolean — is the
value a Geometry or a WKT-parseable string. As SURVEY.md §2.4 notes it's
really a schema utility, so here it's a DataFrame helper rather than a
table function: sample a few rows, classify each column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from geomesa_hive_spark.geom.wkb import from_wkb
from geomesa_hive_spark.geom.wkt import from_wkt

__all__ = ["is_geom_field"]


def is_geom_field(df: DataFrame, sample_rows: int = 10) -> dict[str, bool]:
    """True per column iff every sampled non-null value parses as WKB
    (binary columns) or WKT (string columns)."""
    rows = df.take(sample_rows)
    out: dict[str, bool] = {}
    for field in df.schema.fields:
        name = field.name
        if isinstance(field.dataType, T.BinaryType):
            parser = lambda v: from_wkb(bytes(v))
        elif isinstance(field.dataType, T.StringType):
            parser = from_wkt
        else:
            out[name] = False
            continue
        vals = [r[name] for r in rows if r[name] is not None]
        if not vals:
            out[name] = False
            continue
        ok = True
        for v in vals:
            try:
                if parser(v) is None:
                    ok = False
                    break
            except Exception:
                ok = False
                break
        out[name] = ok
    return out
