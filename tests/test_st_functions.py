"""SQL-surface tests: every ST_* name callable from spark.sql, semantics
spot-checked against the reference's documented behavior (SURVEY.md §2.2),
null-in → null-out everywhere."""

import pytest


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


def test_registration_surface(spark):
    from geomesa_hive_spark.functions.st import ALIASES, SPEC

    # SHOW FUNCTIONS (not USER): Spark 4.1 ships built-ins named
    # st_asbinary/st_geomfromwkb; our registrations still win resolution
    # (semantics verified in test_constructors) but list as system names.
    fns = {r["function"] for r in spark.sql("SHOW FUNCTIONS LIKE 'st_*'").collect()}
    missing = (set(SPEC) | set(ALIASES)) - {f.split(".")[-1] for f in fns}
    assert not missing, f"unregistered: {sorted(missing)}"


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("st_asText(st_geomFromWKT('POINT (1 2)'))", "POINT (1 2)"),
        ("st_asText(st_geometryFromText('POINT (1 2)'))", "POINT (1 2)"),
        ("st_asText(st_makePoint(1.5, 2.5))", "POINT (1.5 2.5)"),
        ("st_asText(st_pointFromText('POINT (3 4)'))", "POINT (3 4)"),
        ("st_asText(st_makeBBOX(0, 0, 2, 3))", "POLYGON ((0 0, 2 0, 2 3, 0 3, 0 0))"),
        (
            "st_asText(st_makeBox2D(st_makePoint(0,0), st_makePoint(2,3)))",
            "POLYGON ((0 0, 2 0, 2 3, 0 3, 0 0))",
        ),
        ("st_asText(st_geomFromWKB(st_asBinary(st_makePoint(1, 2))))", "POINT (1 2)"),
        ("st_asText(st_geomFromGeoJson('{\"type\":\"Point\",\"coordinates\":[1,2]}'))", "POINT (1 2)"),
        (
            "st_asText(st_makeLine(array(st_makePoint(0,0), st_makePoint(1,1))))",
            "LINESTRING (0 0, 1 1)",
        ),
        (
            "st_asText(st_makePolygon(st_lineFromText('LINESTRING (0 0, 1 0, 1 1, 0 0)')))",
            "POLYGON ((0 0, 1 0, 1 1, 0 0))",
        ),
    ],
)
def test_constructors(spark, expr, expected):
    assert one(spark, expr) == expected


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("st_dimension(st_makePoint(1,2))", 0),
        ("st_dimension(st_lineFromText('LINESTRING (0 0, 1 1)'))", 1),
        ("st_dimension(st_makeBBOX(0,0,1,1))", 2),
        ("st_coordDim(st_makePoint(1,2))", 2),
        ("st_numPoints(st_lineFromText('LINESTRING (0 0, 1 1, 2 2)'))", 3),
        ("st_numGeometries(st_geomFromWKT('MULTIPOINT ((0 0), (1 1))'))", 2),
        ("st_isValid(st_makeBBOX(0,0,1,1))", True),
        ("st_isEmpty(st_geomFromWKT('POINT EMPTY'))", True),
        ("st_isCollection(st_geomFromWKT('MULTIPOINT ((0 0))'))", True),
        ("st_isClosed(st_lineFromText('LINESTRING (0 0, 1 0, 0 0)'))", True),
        ("st_isRing(st_lineFromText('LINESTRING (0 0, 1 0, 1 1, 0 0)'))", True),
        ("st_isSimple(st_lineFromText('LINESTRING (0 0, 1 1)'))", True),
        # 1-based indexing per OGC (SURVEY: get_geometry(g, n-1))
        ("st_asText(st_geometryN(st_geomFromWKT('MULTIPOINT ((0 0), (1 1))'), 2))", "POINT (1 1)"),
        ("st_asText(st_pointN(st_lineFromText('LINESTRING (0 0, 5 5, 9 9)'), 2))", "POINT (5 5)"),
        (
            "st_asText(st_exteriorRing(st_makeBBOX(0,0,1,1)))",
            "LINESTRING (0 0, 1 0, 1 1, 0 1, 0 0)",
        ),
        ("st_asText(st_envelope(st_lineFromText('LINESTRING (0 0, 2 3)')))", "POLYGON ((0 0, 2 0, 2 3, 0 3, 0 0))"),
    ],
)
def test_accessors(spark, expr, expected):
    assert one(spark, expr) == expected


def test_xy_are_float32(spark):
    # reference returns java.lang.Float (float32) — ST_X.scala:25
    row = spark.sql(
        "SELECT st_x(st_makePoint(1.5, 2.5)) AS x, st_y(st_makePoint(1.5, 2.5)) AS y"
    ).collect()[0]
    assert row.x == pytest.approx(1.5) and row.y == pytest.approx(2.5)
    [xf, yf] = [f.dataType.typeName() for f in spark.sql(
        "SELECT st_x(st_makePoint(1.5, 2.5)) AS x, st_y(st_makePoint(1.5, 2.5)) AS y"
    ).schema.fields]
    assert xf == "float" and yf == "float"


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("st_intersects(st_makeBBOX(0,0,2,2), st_makeBBOX(1,1,3,3))", True),
        ("st_disjoint(st_makeBBOX(0,0,1,1), st_makeBBOX(2,2,3,3))", True),
        ("st_contains(st_makeBBOX(0,0,10,10), st_makePoint(5,5))", True),
        ("st_within(st_makePoint(5,5), st_makeBBOX(0,0,10,10))", True),
        ("st_covers(st_makeBBOX(0,0,10,10), st_makePoint(10,5))", True),
        ("st_contains(st_makeBBOX(0,0,10,10), st_makePoint(10,5))", False),
        ("st_touches(st_makeBBOX(0,0,1,1), st_makeBBOX(1,0,2,1))", True),
        ("st_overlaps(st_makeBBOX(0,0,2,2), st_makeBBOX(1,1,3,3))", True),
        ("st_crosses(st_lineFromText('LINESTRING (-1 1, 3 1)'), st_makeBBOX(0,0,2,2))", True),
        ("st_equals(st_makeBBOX(0,0,1,1), st_geomFromWKT('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))", True),
        ("st_relate(st_makePoint(5,5), st_makeBBOX(0,0,10,10))", "0FFFFF212"),
        ("st_relateBool(st_makePoint(5,5), st_makeBBOX(0,0,10,10), 'T*F**F***')", True),
    ],
)
def test_predicates(spark, expr, expected):
    assert one(spark, expr) == expected


def test_measures(spark):
    assert one(spark, "st_area(st_makeBBOX(0,0,2,3))") == pytest.approx(6.0)
    assert one(spark, "st_length(st_lineFromText('LINESTRING (0 0, 3 4)'))") == pytest.approx(5.0)
    assert one(spark, "st_distance(st_makePoint(0,0), st_makePoint(3,4))") == pytest.approx(5.0)
    assert one(spark, "st_asText(st_centroid(st_makeBBOX(0,0,10,10)))") == "POINT (5 5)"
    cp = one(spark, "st_asText(st_closestPoint(st_lineFromText('LINESTRING (5 -5, 5 5)'), st_makePoint(0,0)))")
    assert cp == "POINT (5 0)"
    # ~111 km per degree at the equator
    d = one(spark, "st_distanceSphere(st_makePoint(0,0), st_makePoint(1,0))")
    assert d == pytest.approx(111_195, rel=0.01)
    ls = one(spark, "st_lengthSphere(st_lineFromText('LINESTRING (0 0, 1 0)'))")
    assert ls == pytest.approx(111_195, rel=0.01)


def test_processing(spark):
    assert one(spark, "st_asText(st_translate(st_makePoint(1,2), 10, 20))") == "POINT (11 22)"
    s = one(spark, "st_numPoints(st_simplify(st_lineFromText('LINESTRING (0 0, 1 0.01, 2 0)'), 0.1))")
    assert s == 2
    sp = one(spark, "st_numPoints(st_simplifyPreserveTopology(st_lineFromText('LINESTRING (0 0, 1 0.01, 2 0)'), 0.1))")
    assert sp == 2
    # geodesic buffer: ~1km circle around a point, area ~ pi*r^2 in m^2
    buf_ok = one(spark, "st_isValid(st_bufferPoint(st_makePoint(-74, 40.7), 1000.0))")
    assert buf_ok is True
    # antimeridian-crossing bbox split into multi-geometry
    n = one(spark, "st_numGeometries(st_antimeridianSafeGeom(st_makeBBOX(175, 0, 185, 10)))")
    assert n == 2
    assert one(spark, "st_numGeometries(st_idlSafeGeom(st_makeBBOX(175, 0, 185, 10)))") == 2


def test_outputs(spark):
    # integral ordinates trim to ints, as GeoTools' GeometryJSON writer does
    assert one(spark, "st_asGeoJson(st_makePoint(1, 2))") == '{"type":"Point","coordinates":[1,2]}'
    assert one(spark, "st_asGeoJson(st_makePoint(1.5, 2))") == '{"type":"Point","coordinates":[1.5,2]}'
    gh = one(spark, "st_geoHash(st_makePoint(10.40744, 57.64911), 30)")
    assert gh.startswith("u4pruy")
    assert one(spark, "st_asGeoHash(st_makePoint(10.40744, 57.64911), 30)") == gh
    box = one(spark, "st_asText(st_geomFromGeoHash(st_geoHash(st_makePoint(10, 57), 25), 25))")
    assert box.startswith("POLYGON")
    pt = one(spark, "st_asText(st_pointFromGeoHash(st_geoHash(st_makePoint(10, 57), 25), 25))")
    assert pt.startswith("POINT")
    latlon = one(spark, "st_asLatLonText(st_makePoint(-73.5, 40.25))")
    assert "40" in latlon and "73" in latlon
    twkb = one(spark, "st_asTWKB(st_makePoint(1, 2))")
    assert isinstance(twkb, (bytes, bytearray)) and len(twkb) > 2
    assert bytes(one(spark, "st_byteArray('ab')")) == b"ab"


def test_casts(spark):
    assert one(spark, "st_asText(st_castToPoint(st_makePoint(1,2)))") == "POINT (1 2)"
    assert one(spark, "st_castToPoint(st_makeBBOX(0,0,1,1))") is None
    assert one(spark, "st_asText(st_castToPolygon(st_makeBBOX(0,0,1,1)))").startswith("POLYGON")
    assert one(spark, "st_asText(st_castToLineString(st_lineFromText('LINESTRING (0 0, 1 1)')))").startswith("LINE")
    assert one(spark, "st_asText(st_castToGeometry(st_makePoint(1,2)))") == "POINT (1 2)"


def test_is_geom_field(spark):
    # reference ST_IsGeomField.scala:31-38: geometry/WKT-string → TRUE,
    # everything else (incl. null) → FALSE
    assert one(spark, "st_isGeomField('POINT (1 2)')") is True
    assert one(spark, "st_isGeomField(st_makePoint(1, 2))") is True
    assert one(spark, "st_isGeomField('not a geometry')") is False
    assert one(spark, "st_isGeomField(CAST(NULL AS STRING))") is False
    assert one(spark, "st_isGeomField(1.5)") is False


def test_extent_index_functions(spark):
    row = spark.sql("SELECT st_makeExtent(1.0, 2.0, 3.0, 4.0) AS e").collect()[0].e
    assert (row.xmin, row.ymin, row.xmax, row.ymax) == (1.0, 2.0, 3.0, 4.0)
    row = spark.sql("SELECT st_extentFromGeom(st_makeBBOX(0,0,2,3)) AS e").collect()[0].e
    assert (row.xmin, row.ymin, row.xmax, row.ymax) == (0.0, 0.0, 2.0, 3.0)
    assert one(spark, "st_asText(st_extentToGeom(st_makeExtent(0.0,0.0,1.0,1.0)))").startswith("POLYGON")
    crs = one(spark, "st_crsFromText('EPSG:4326')")
    assert "longlat" in crs or "4326" in crs
    z = spark.sql("SELECT st_z2LatLon(st_makePoint(0, 0)) AS z").collect()[0].z
    assert z.min == z.max and z.min > 0
    pk = one(spark, "st_partitionCentroid(st_makePoint(0, 0), 5)")
    assert isinstance(pk, int)


def test_polymorphic_intersects_contains(spark):
    # index module shadows st_intersects/st_contains with Extent|Geometry args
    assert one(
        spark,
        "st_intersects(st_makeExtent(0.0,0.0,2.0,2.0), st_makeExtent(1.0,1.0,3.0,3.0))",
    ) is True
    assert one(
        spark, "st_intersects(st_makeExtent(0.0,0.0,2.0,2.0), st_makePoint(1, 1))"
    ) is True
    assert one(
        spark, "st_contains(st_makeBBOX(0,0,10,10), st_makeExtent(1.0,1.0,2.0,2.0))"
    ) is True


def test_reproject(spark):
    row = spark.sql(
        "SELECT st_extentFromGeom(st_geomReproject(st_makePoint(1, 0), 'EPSG:4326', 'EPSG:3857')) AS e"
    ).collect()[0].e
    assert row.xmin == pytest.approx(111_319.49, rel=1e-4)
    assert row.ymin == pytest.approx(0.0, abs=1e-6)


def test_reproject_utm(spark):
    # central meridian of zone 33 at the equator is exactly (500000, 0)
    row = spark.sql(
        "SELECT st_extentFromGeom(st_geomReproject(st_makePoint(15, 0), 'EPSG:4326', 'EPSG:32633')) AS e"
    ).collect()[0].e
    assert row.xmin == pytest.approx(500000.0, abs=1e-6)
    assert row.ymin == pytest.approx(0.0, abs=1e-6)
    # southern-hemisphere zone adds the 10,000 km false northing
    row2 = spark.sql(
        "SELECT st_extentFromGeom(st_geomReproject(st_makePoint(15, 0), 'EPSG:4326', 'EPSG:32733')) AS e"
    ).collect()[0].e
    assert row2.ymin == pytest.approx(10_000_000.0, abs=1e-6)
    # forward→inverse round-trip through the SQL surface
    row3 = spark.sql(
        "SELECT st_extentFromGeom(st_geomReproject(st_geomReproject("
        "st_makePoint(14.3, 47.1), 'EPSG:4326', 'EPSG:32633'), "
        "'EPSG:32633', 'EPSG:4326')) AS e"
    ).collect()[0].e
    assert row3.xmin == pytest.approx(14.3, abs=1e-6)
    assert row3.ymin == pytest.approx(47.1, abs=1e-6)


def test_reproject_unsupported_pair_raises(spark):
    # unsupported CRS ARGUMENT is an error (silent nulls lose data);
    # null INPUT stays null-in→null-out
    with pytest.raises(Exception):
        # EPSG:3375 (GDM2000 / Peninsula RSO — Hotine oblique Mercator
        # with rectified skew) — a named system outside the supported
        # family registry (EPSG:27700 became real in round 4, EPSG:2056
        # in round 6, so neither serves as the unsupported example)
        spark.sql(
            "SELECT st_geomReproject(st_makePoint(1, 1), 'EPSG:4326', 'EPSG:3375') AS g"
        ).collect()
    assert one(spark, "st_geomReproject(NULL, 'EPSG:4326', 'EPSG:3857')") is None


NULLARY = [
    "st_asText(NULL)",
    "st_area(NULL)",
    "st_x(NULL)",
    "st_intersects(NULL, st_makePoint(1,1))",
    "st_intersects(st_makePoint(1,1), NULL)",
    "st_geomFromWKT(NULL)",
    "st_distance(NULL, NULL)",
    "st_castToPoint(NULL)",
    "st_geoHash(NULL, 25)",
]


@pytest.mark.parametrize("expr", NULLARY)
def test_null_in_null_out(spark, expr):
    assert one(spark, expr) is None


def test_numeric_coercion(spark):
    # int args accepted where doubles expected (HDeserializer coercion §1.2)
    assert one(spark, "st_asText(st_makePoint(1, 2))") == "POINT (1 2)"
    assert one(spark, "st_asText(st_makePoint(CAST(1 AS DECIMAL(10,2)), 2.0D))") == "POINT (1 2)"


def test_reference_acceptance_query(spark, tmp_path):
    """The reference's own E2E acceptance flow (STSpec.scala:24-32 +
    SpatialTestTables.scala:27-47): CSV of WKT building footprints → view
    with SQL-computed geom/bbox columns → ST_Intersects against the
    canonical Hudson-valley window (STSpec.scala:27) → 5 rows. A sixth
    far-away polygon proves the predicate filters."""
    rows = [
        ("4050660250", "POLYGON((-73.83616 40.75531, -73.83622 40.75555, -73.83723 40.75507, -73.83616 40.75531))"),
        ("1002710036", "POLYGON((-73.98955 40.71278, -73.98958 40.71299, -73.98962 40.71299, -73.98955 40.71278))"),
        ("3013810001", "POLYGON((-73.96 40.72, -73.955 40.72, -73.955 40.725, -73.96 40.72))"),
        ("2028950035", "POLYGON((-73.90 40.85, -73.895 40.85, -73.895 40.855, -73.90 40.85))"),
        ("5000150001", "POLYGON((-74.07 40.64, -74.065 40.64, -74.065 40.645, -74.07 40.64))"),
        ("0000000000", "POLYGON((-120.0 35.0, -119.9 35.0, -119.9 35.1, -120.0 35.0))"),
    ]
    p = tmp_path / "polygons.csv"
    p.write_text("bbl,wkt\n" + "\n".join(f'{b},"{w}"' for b, w in rows))
    spark.read.option("header", "true").csv(str(p)).createOrReplaceTempView("polygons_csv")
    spark.sql(
        """CREATE OR REPLACE TEMPORARY VIEW polygons_csv_view AS (
             SELECT *, ST_GeomFromWKT(wkt) AS geom,
                    ST_ExtentFromGeom(ST_GeomFromWKT(wkt)) AS bbox
             FROM polygons_csv)"""
    )
    df = spark.sql(
        """SELECT * FROM polygons_csv_view WHERE ST_Intersects(geom, ST_GeomFromGeoJSON(
             '{"type":"Polygon","coordinates":[[[-75.5859375,40.32517767999294],[-75.5859375,43.197167282501276],[-72.41015625,43.197167282501276],[-72.41015625,40.32517767999294],[-75.5859375,40.32517767999294]]]}'))"""
    )
    assert df.count() == 5
    # the extent-literal variant (STIndexSpec.scala:88) — pure bbox math
    df2 = spark.sql(
        """SELECT * FROM polygons_csv_view
           WHERE bbox.xmin <= -72.4101562 AND bbox.xmax >= -75.5859375
             AND bbox.ymin <= 43.1971673 AND bbox.ymax >= 40.3251777"""
    )
    assert df2.count() == 5


def test_azimuth_and_length_spheroid(spark):
    """st_azimuth (PostGIS semantics: radians clockwise from north,
    NULL for coincident points — exact compass quadrants at the
    equator) and st_lengthSpheroid (Vincenty segment sum: two 1-degree
    meridian arcs; empty line is 0)."""
    import math

    from geomesa_hive_spark import register_all

    register_all(spark)
    r = spark.sql(
        """
        SELECT st_azimuth(st_makePoint(0,0), st_makePoint(0,1)) AS n,
               st_azimuth(st_makePoint(0,0), st_makePoint(1,0)) AS e,
               st_azimuth(st_makePoint(0,0), st_makePoint(0,-1)) AS s,
               st_azimuth(st_makePoint(0,0), st_makePoint(-1,0)) AS w,
               st_azimuth(st_makePoint(3,3), st_makePoint(3,3)) AS same,
               st_azimuth(NULL, st_makePoint(0,1)) AS nul,
               st_lengthSpheroid(
                 st_geomFromWKT('LINESTRING(0 0, 0 1, 0 2)')) AS len2,
               st_lengthSpheroid(st_makePoint(1, 1)) AS pt
        """
    ).collect()[0]
    assert abs(r.n) < 1e-12
    assert abs(r.e - math.pi / 2) < 1e-12
    assert abs(r.s - math.pi) < 1e-12
    assert abs(r.w - 3 * math.pi / 2) < 1e-12
    assert r.same is None and r.nul is None
    assert abs(r.len2 - 221149.4533724559) < 1e-4
    assert r.pt == 0.0


def test_st_partition_centroid_optional_sql_args(spark):
    """st_partitionCentroid full reference arity through bare SQL
    (ST_PartitionCentroid.scala:27-51): 2-arg default equals the
    6-arg call with default-valued (inert) tileSize/resThreshold;
    non-default bits shifts the key; EPSG:3857 switches to the square
    web-mercator pyramid; NULL geom → NULL."""
    from geomesa_hive_spark.functions.registry import register_all

    register_all(spark)
    r = spark.sql(
        """
        SELECT st_partitionCentroid(st_makePoint(10.0, 20.0), 5) AS two,
               st_partitionCentroid(st_makePoint(10.0, 20.0), 5,
                                    512, 8, 'EPSG:4326', 0.5) AS six,
               st_partitionCentroid(st_makePoint(10.0, 20.0), 5, 256, 0) AS b0,
               st_partitionCentroid(st_makePoint(10.0, 20.0), 5, 256, 2) AS b2,
               st_partitionCentroid(st_makePoint(1000000.0, 2000000.0), 4,
                                    256, 4, 'EPSG:3857') AS merc,
               st_partitionCentroid(NULL, 5) AS nul
        """
    ).collect()[0]
    assert r.two == r.six            # inert args don't change the key
    assert r.b0 >> 2 == r.b2         # bits is a plain right shift
    assert r.b0 >> 8 == r.two
    assert r.nul is None
    # web-mercator: zoom 4 square pyramid, hand-computed cell
    import numpy as np

    from geomesa_hive_spark.geom.z2 import partition_centroid_key

    exp = partition_centroid_key(
        np.array([1000000.0]), np.array([2000000.0]), 4,
        bits=4, crs="EPSG:3857",
    )[0]
    assert r.merc == exp


def test_linear_ref_sql_surface_nulls(spark):
    """Round 14 linear-referencing SQL surface: NULL/empty/mismatched
    inputs are NULL — including a SQL NULL fraction, which arrives in
    the float64 pandas series as NaN (`is None` never fires; caught by
    the round-14 verify probe, pinned here)."""
    from geomesa_hive_spark import register_all

    register_all(spark)
    r = spark.sql("""SELECT
      st_asText(st_lineInterpolatePoint(
        st_geomFromWKT('LINESTRING (0 0, 3 0, 3 4)'), 0.5)) AS p,
      st_lineLocatePoint(st_geomFromWKT('LINESTRING (0 0, 3 0, 3 4)'),
        st_makePoint(1.0, -5.0)) AS f,
      st_asText(st_lineSubstring(
        st_geomFromWKT('LINESTRING (0 0, 3 0, 3 4)'), 0.0, 1.0)) AS s,
      st_lineInterpolatePoint(CAST(NULL AS BINARY), 0.5) AS n1,
      st_lineInterpolatePoint(st_geomFromWKT('LINESTRING (0 0, 1 0)'),
        CAST(NULL AS DOUBLE)) AS n2,
      st_lineSubstring(st_geomFromWKT('LINESTRING (0 0, 1 0)'),
        CAST(NULL AS DOUBLE), 0.9) AS n3,
      st_lineLocatePoint(st_geomFromWKT('POINT (1 1)'),
        st_makePoint(0.0, 0.0)) AS n4,
      st_lineInterpolatePoint(st_geomFromWKT('LINESTRING EMPTY'),
        0.5) AS n5
    """).collect()[0]
    assert r.p == "POINT (3 0.5)"
    assert abs(r.f - 1.0 / 7.0) < 1e-12
    assert r.s == "LINESTRING (0 0, 3 0, 3 4)"
    assert all(getattr(r, f"n{i}") is None for i in range(1, 6))
