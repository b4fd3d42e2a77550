"""Pure-Python kernel tests (no Spark session) — WKT/WKB codecs, DE-9IM
predicates, measures, hulls, geohash and Z2 curves.

Golden semantics follow JTS 1.18 (the engine behind the reference's
GeoMesa delegates, SURVEY.md §2.2)."""

import math

import numpy as np
import pytest

from geomesa_hive_spark.geom import (
    LineString,
    Point,
    Polygon,
    from_wkb,
    from_wkt,
    to_wkb,
    to_wkt,
)
from geomesa_hive_spark.geom import algorithms as alg
from geomesa_hive_spark.geom import geohash, z2

WKT_CASES = [
    "POINT (1 2)",
    "POINT EMPTY",
    "LINESTRING (0 0, 1 1, 2 0)",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
    "MULTIPOINT ((0 0), (1 1))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 2 2))",
]


@pytest.mark.parametrize("wkt", WKT_CASES)
def test_wkt_wkb_roundtrip(wkt):
    g = from_wkt(wkt)
    assert to_wkt(from_wkb(to_wkb(g))) == to_wkt(g)


def test_wkt_parse_canonical():
    assert to_wkt(from_wkt("POINT(1.5   2.5)")) == "POINT (1.5 2.5)"


SQ = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")


@pytest.mark.parametrize(
    "wkt,pred,expected",
    [
        ("POINT (5 5)", "within", True),
        ("POINT (5 5)", "intersects", True),
        ("POINT (15 5)", "disjoint", True),
        ("POINT (10 5)", "touches", True),  # on boundary
        ("LINESTRING (-5 5, 15 5)", "crosses", True),
        ("LINESTRING (0 0, 10 0)", "touches", True),  # along edge
        ("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))", "overlaps", True),
        ("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))", "within", True),
        ("POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))", "touches", True),
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "equals", True),
    ],
)
def test_predicates_vs_square(wkt, pred, expected):
    g = from_wkt(wkt)
    assert getattr(alg, pred)(g, SQ) is expected


def test_relate_de9im():
    # textbook: point inside polygon
    assert alg.relate(from_wkt("POINT (5 5)"), SQ) == "0FFFFF212"
    assert alg.relate_pattern(from_wkt("POINT (5 5)"), SQ, "T*F**F***")  # within


def test_contains_excludes_boundary():
    # OGC contains: boundary-only point is NOT contained (but is covered)
    p = from_wkt("POINT (10 5)")
    assert not alg.contains(SQ, p)
    assert alg.covers(SQ, p)


def test_measures():
    assert alg.area(SQ) == pytest.approx(100.0)
    hole = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    assert alg.area(hole) == pytest.approx(96.0)
    assert alg.length(from_wkt("LINESTRING (0 0, 3 4)")) == pytest.approx(5.0)
    # JTS: polygon length = perimeter
    assert alg.length(SQ) == pytest.approx(40.0)
    c = alg.centroid(SQ)
    assert (c.x, c.y) == (pytest.approx(5.0), pytest.approx(5.0))


def test_distance_and_closest_point():
    a = from_wkt("POINT (0 0)")
    b = from_wkt("LINESTRING (5 -5, 5 5)")
    assert alg.distance(a, b) == pytest.approx(5.0)
    cp = alg.closest_point(b, a)
    assert (cp.x, cp.y) == (pytest.approx(5.0), pytest.approx(0.0))
    assert alg.distance(from_wkt("POINT (5 5)"), SQ) == 0.0


def test_convex_hull():
    pts = from_wkt("MULTIPOINT ((0 0), (10 0), (10 10), (0 10), (5 5))")
    h = alg.convex_hull(pts)
    assert alg.area(h) == pytest.approx(100.0)
    assert alg.equals(h, SQ)


def test_simplify():
    line = from_wkt("LINESTRING (0 0, 1 0.01, 2 0, 3 0.01, 4 0)")
    s = alg.simplify(line, 0.1)
    assert len(s.coords) == 2


def test_envelope_boundary():
    env = alg.envelope(from_wkt("LINESTRING (1 2, 3 7)"))
    assert to_wkt(env) == "POLYGON ((1 2, 3 2, 3 7, 1 7, 1 2))"
    b = alg.boundary(SQ)
    assert b.geom_type in ("LineString", "MultiLineString")
    assert alg.length(b) == pytest.approx(40.0)


def test_geohash_roundtrip():
    # 25 bits = 5 base32 chars; reference geohashes are bit-precision
    gh = geohash.encode(40.7, -74.0, 25)
    assert len(gh) == 5
    xmin, ymin, xmax, ymax = geohash.decode_bbox(gh, 25)
    assert xmin <= -74.0 <= xmax and ymin <= 40.7 <= ymax
    lon, lat = geohash.decode_point(gh, 25)
    assert lon == pytest.approx((xmin + xmax) / 2)
    # well-known value: geohash of (57.64911, 10.40744) is u4pruyd...
    assert geohash.encode(57.64911, 10.40744, 30).startswith("u4pruy")


def test_z2_interleave():
    x = np.array([0b101], dtype=np.uint64)
    y = np.array([0b011], dtype=np.uint64)
    # interleave x into even bits, y into odd: (x=101, y=011) -> 0b011011 +
    # exact per-bit: z = sum(x_i<<2i | y_i<<(2i+1))
    z = z2.interleave2(x, y)[0]
    expected = 0
    for i in range(3):
        expected |= ((0b101 >> i) & 1) << (2 * i)
        expected |= ((0b011 >> i) & 1) << (2 * i + 1)
    assert int(z) == expected


def test_z2_latlon_matches_reference_scaling():
    # ST_Z2Lat Lon.scala:34-35 — lon/lat scaled into 2^30 grid then interleaved
    lo, hi = z2.z2_latlon_range(
        np.array([0.0]), np.array([0.0]), np.array([0.0]), np.array([0.0])
    )
    gx = int((0.0 + 180.0) / 360.0 * (1 << 30))
    gy = int((0.0 + 90.0) / 180.0 * (1 << 30))
    expected = z2.interleave2(np.array([gx], np.uint64), np.array([gy], np.uint64))[0]
    assert lo[0] == hi[0] == int(expected)


def test_twkb_encode_headers():
    # encoder only — the reference exposes just st_asTWKB (TWKBUtils.write);
    # check the TWKB type nibble (low 4 bits of byte 0): 1=pt, 2=line, 3=poly
    from geomesa_hive_spark.geom import twkb

    for wkt, type_id in [
        ("POINT (1 2)", 1),
        ("LINESTRING (0 0, 1 1, 2 0)", 2),
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", 3),
    ]:
        enc = twkb.to_twkb(from_wkt(wkt), precision=7)
        assert isinstance(enc, bytes) and len(enc) > 2
        assert enc[0] & 0x0F == type_id


def test_twkb_optional_blocks_rejected():
    # spec-valid TWKB with bbox/size/idlist/extended-dims blocks (e.g.
    # PostGIS ST_AsTWKB with bbox) must raise, not decode bbox varints
    # as coordinate deltas
    from geomesa_hive_spark.geom import twkb

    enc = bytearray(twkb.to_twkb(from_wkt("POINT (1 2)"), precision=0))
    for flag in (0x01, 0x02, 0x04, 0x08):
        bad = bytes([enc[0], enc[1] | flag]) + bytes(enc[2:])
        with pytest.raises(ValueError, match="optional blocks"):
            twkb.from_twkb(bad)
    # clean roundtrip still works
    assert not twkb.from_twkb(bytes(enc)).is_empty


def test_geodesy_distance_sphere():
    from geomesa_hive_spark.geom import geodesy

    # JFK -> LHR great-circle ~ 5554.6 km (spherical approximations vary ~0.3%)
    d = geodesy.distance_sphere(from_wkt("POINT (-73.7781 40.6413)"), from_wkt("POINT (-0.4543 51.4700)"))
    assert d == pytest.approx(5_554_600, rel=0.005)


def test_null_and_empty_handling():
    assert alg.area(from_wkt("POLYGON EMPTY")) == 0.0
    assert from_wkt("POINT EMPTY").is_empty
    assert len(from_wkt("POINT EMPTY").coords) == 0


def test_lcc_forward_matches_published_and_roundtrips():
    """Lambert-93 forward agrees with the published EPSG:2154 values
    for Paris to <1 m, and inverse(forward) is identity to ~1e-12°
    across the projection's whole validity area."""
    import numpy as np

    from geomesa_hive_spark.geom import projections as P

    paris = np.array([[2.3522, 48.8566]])
    xy = P.lcc_forward(paris, P._LCC_EPSG[2154])
    assert abs(xy[0, 0] - 652469.02) < 1.0 and abs(xy[0, 1] - 6862035.26) < 1.0
    rng = np.random.RandomState(7)
    pts = np.column_stack([rng.uniform(-10, 15, 200), rng.uniform(35, 55, 200)])
    rt = P.lcc_inverse(P.lcc_forward(pts, P._LCC_EPSG[2154]), P._LCC_EPSG[2154])
    assert np.abs(rt - pts).max() < 1e-11


def test_lcc_proj4_param_driven_and_1sp():
    """Any +proj=lcc string parses param-driven; lat_2 defaults to
    lat_1 (the 1SP tangent cone), and the 1SP forward/inverse
    round-trips."""
    import numpy as np

    from geomesa_hive_spark.geom import projections as P

    kind = P.parse_crs(
        "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=39 +lon_0=-96 +x_0=0 +y_0=0"
    )
    assert kind == ("lcc", 33.0, 45.0, 39.0, -96.0, 0.0, 0.0)
    one_sp = P.parse_crs("+proj=lcc +lat_1=40 +lon_0=5")
    assert one_sp == ("lcc", 40.0, 40.0, 0.0, 5.0, 0.0, 0.0)
    pts = np.column_stack([np.linspace(-5, 15, 50), np.linspace(30, 50, 50)])
    rt = P.lcc_inverse(P.lcc_forward(pts, one_sp[1:]), one_sp[1:])
    assert np.abs(rt - pts).max() < 1e-11


def test_lcc_via_st_geomreproject(spark):
    """End-to-end through the SQL surface: EPSG:4326 → EPSG:2154 on a
    point column, checked against the kernel directly."""
    import numpy as np

    from geomesa_hive_spark.functions.registry import register_all
    from geomesa_hive_spark.geom import projections as P
    from pyspark.sql import functions as F

    register_all(spark)
    df = spark.createDataFrame([(1, 2.3522, 48.8566)], "id LONG, x DOUBLE, y DOUBLE")
    out = df.select(
        F.call_function(
            "st_x",
            F.call_function(
                "st_geomreproject",
                F.call_function("st_makepoint", F.col("x"), F.col("y")),
                F.lit("EPSG:4326"), F.lit("EPSG:2154"),
            ),
        ).alias("e")
    ).collect()[0].e
    want = P.lcc_forward(np.array([[2.3522, 48.8566]]), P._LCC_EPSG[2154])[0, 0]
    assert abs(out - want) < 0.5  # st_x is float32


def test_aea_equal_area_property_and_roundtrip():
    """Albers must actually preserve area: the numeric Jacobian of the
    forward map equals the ellipsoidal surface element to ~1e-6
    relative, everywhere in the validity window — this checks the
    authalic math itself, not just self-consistency. Plus
    inverse(forward) identity and unit scale on standard parallels."""
    import math

    import numpy as np

    from geomesa_hive_spark.geom import projections as P

    params = P._AEA_EPSG[5070]
    a, e2 = P._A, P._E2
    rng = np.random.RandomState(3)
    lon = rng.uniform(-120, -75, 150)
    lat = rng.uniform(25, 49, 150)
    pts = np.column_stack([lon, lat])
    # numeric Jacobian via central differences (degrees step)
    h = 1e-5
    fx = lambda q: P.aea_forward(q, params)
    dxdlon = (fx(pts + [h, 0]) - fx(pts - [h, 0])) / (2 * h)
    dxdlat = (fx(pts + [0, h]) - fx(pts - [0, h])) / (2 * h)
    jac = np.abs(
        dxdlon[:, 0] * dxdlat[:, 1] - dxdlon[:, 1] * dxdlat[:, 0]
    )  # m^2 per deg^2
    phi = np.radians(lat)
    sp = np.sin(phi)
    # ellipsoidal surface element per (rad lon x rad lat):
    # M * N * cos(phi) with M = a(1-e2)/w^3, N = a/w, w = sqrt(1-e2 sp^2)
    w2 = 1.0 - e2 * sp * sp
    surf = (a * (1 - e2) / w2**1.5) * (a / np.sqrt(w2)) * np.cos(phi)
    surf_deg = surf * (math.pi / 180.0) ** 2
    assert np.abs(jac / surf_deg - 1.0).max() < 1e-5
    rt = P.aea_inverse(P.aea_forward(pts, params), params)
    assert np.abs(rt - pts).max() < 1e-9
    # along-parallel scale is 1 on both standard parallels, >1 outside
    for latp, expect_one in ((29.5, True), (45.5, True), (60.0, False)):
        p0 = np.array([[-96.0, latp], [-95.999, latp]])
        xy = P.aea_forward(p0, params)
        d_proj = math.hypot(*(xy[1] - xy[0]))
        spp = math.sin(math.radians(latp))
        r_par = a * math.cos(math.radians(latp)) / math.sqrt(1 - e2 * spp * spp)
        d_true = r_par * math.radians(0.001)
        k = d_proj / d_true
        assert abs(k - 1.0) < 1e-6 if expect_one else k > 1.0001


def test_laea_published_value_equal_area_and_roundtrip():
    """Lambert azimuthal equal-area (EPSG:3035): (a) the EPSG-registry
    worked example for method 9820 — φ=50°N λ=5°E → E 3962799.45,
    N 2999718.85 — to 1 cm; (b) the numeric Jacobian of the forward
    map equals the ellipsoidal surface element (the defining equal-area
    trait, same harness as the Albers test); (c) inverse(forward)
    identity over Europe; (d) the polar aspect (EPSG:3574) round-trips
    and pins the pole to the false origin."""
    import math

    import numpy as np

    from geomesa_hive_spark.geom import projections as P

    params = P._LAEA_EPSG[3035]
    f = P.laea_forward(np.array([[5.0, 50.0]]), params)
    assert abs(f[0, 0] - 3962799.45) < 0.01
    assert abs(f[0, 1] - 2999718.85) < 0.01

    a, e2 = P._A, P._E2
    rng = np.random.RandomState(7)
    lon = rng.uniform(-10, 30, 150)
    lat = rng.uniform(35, 70, 150)
    pts = np.column_stack([lon, lat])
    h = 1e-5
    fx = lambda q: P.laea_forward(q, params)
    dxdlon = (fx(pts + [h, 0]) - fx(pts - [h, 0])) / (2 * h)
    dxdlat = (fx(pts + [0, h]) - fx(pts - [0, h])) / (2 * h)
    jac = np.abs(dxdlon[:, 0] * dxdlat[:, 1] - dxdlon[:, 1] * dxdlat[:, 0])
    phi = np.radians(lat)
    sp = np.sin(phi)
    w2 = 1.0 - e2 * sp * sp
    surf = (a * (1 - e2) / w2**1.5) * (a / np.sqrt(w2)) * np.cos(phi)
    surf_deg = surf * (math.pi / 180.0) ** 2
    assert np.abs(jac / surf_deg - 1.0).max() < 1e-5
    rt = P.laea_inverse(P.laea_forward(pts, params), params)
    assert np.abs(rt - pts).max() < 1e-9
    # origin maps to the false origin exactly, and inverts to itself
    o = P.laea_forward(np.array([[10.0, 52.0]]), params)
    assert abs(o[0, 0] - 4321000.0) < 1e-6 and abs(o[0, 1] - 3210000.0) < 1e-6
    ro = P.laea_inverse(o, params)
    assert abs(ro[0, 0] - 10.0) < 1e-9 and abs(ro[0, 1] - 52.0) < 1e-9

    # polar aspect: round-trip + pole at false origin + equal-area there too
    pp = P._LAEA_EPSG[3574]
    north = np.column_stack(
        [rng.uniform(-180, 180, 100), rng.uniform(30, 89.5, 100)]
    )
    rtp = P.laea_inverse(P.laea_forward(north, pp), pp)
    dlon = np.abs(rtp[:, 0] - north[:, 0])
    dlon = np.minimum(dlon, 360.0 - dlon)
    assert dlon.max() < 1e-9 and np.abs(rtp[:, 1] - north[:, 1]).max() < 1e-9
    pole = P.laea_forward(np.array([[123.0, 90.0]]), pp)
    assert abs(pole[0, 0]) < 1e-6 and abs(pole[0, 1]) < 1e-6
    assert P.laea_inverse(pole, pp)[0, 1] == 90.0


def test_stere_polar_conformal_and_roundtrip():
    """Polar stereographic: true scale on lat_ts, conformal (isotropic
    local scale), pole maps to the false origin, round-trip identity,
    both aspects + UPS variant."""
    import math

    import numpy as np

    from geomesa_hive_spark.geom import projections as P

    a, e2 = P._A, P._E2
    south = P._STERE_EPSG[3031]
    # pole -> (x0, y0)
    assert np.allclose(P.stere_forward(np.array([[123.0, -90.0]]), south), [[0.0, 0.0]])
    # true scale at lat_ts = -71: projected distance along the parallel
    # equals the ellipsoidal parallel arc
    p0 = np.array([[10.0, -71.0], [10.001, -71.0]])
    xy = P.stere_forward(p0, south)
    d_proj = math.hypot(*(xy[1] - xy[0]))
    spp = math.sin(math.radians(71.0))
    r_par = a * math.cos(math.radians(71.0)) / math.sqrt(1 - e2 * spp * spp)
    assert abs(d_proj / (r_par * math.radians(0.001)) - 1.0) < 1e-6
    # conformal: meridian scale == parallel scale (to first order)
    q0 = np.array([[45.0, -75.0]])
    h = 1e-5
    dpar = P.stere_forward(q0 + [h, 0], south) - P.stere_forward(q0 - [h, 0], south)
    dmer = P.stere_forward(q0 + [0, h], south) - P.stere_forward(q0 - [0, h], south)
    sp = math.sin(math.radians(-75.0))
    w2 = 1.0 - e2 * sp * sp
    k_par = math.hypot(*dpar[0]) / (
        (a * math.cos(math.radians(-75.0)) / math.sqrt(w2)) * math.radians(2 * h)
    )
    k_mer = math.hypot(*dmer[0]) / (
        (a * (1 - e2) / w2**1.5) * math.radians(2 * h)
    )
    assert abs(k_par / k_mer - 1.0) < 1e-6
    # round-trips, south + north + UPS
    rng = np.random.RandomState(5)
    pts_s = np.column_stack([rng.uniform(-180, 180, 200), rng.uniform(-89, -60, 200)])
    rt = P.stere_inverse(P.stere_forward(pts_s, south), south)
    dl = (rt[:, 0] - pts_s[:, 0] + 180) % 360 - 180  # longitude wraps
    assert np.abs(dl).max() < 1e-9 and np.abs(rt[:, 1] - pts_s[:, 1]).max() < 1e-9
    north = P._STERE_EPSG[3413]
    pts_n = np.column_stack([rng.uniform(-180, 180, 200), rng.uniform(60, 89, 200)])
    rt = P.stere_inverse(P.stere_forward(pts_n, north), north)
    dl = (rt[:, 0] - pts_n[:, 0] + 180) % 360 - 180
    assert np.abs(dl).max() < 1e-9 and np.abs(rt[:, 1] - pts_n[:, 1]).max() < 1e-9
    # UPS north: pole at the (2e6, 2e6) false origin
    ups = P._STERE_EPSG[32661]
    assert np.allclose(
        P.stere_forward(np.array([[0.0, 90.0]]), ups), [[2000000.0, 2000000.0]]
    )
    rt = P.stere_inverse(P.stere_forward(pts_n, ups), ups)
    dl = (rt[:, 0] - pts_n[:, 0] + 180) % 360 - 180
    assert np.abs(dl).max() < 1e-9 and np.abs(rt[:, 1] - pts_n[:, 1]).max() < 1e-9


def test_mill_vandg_roundtrip_anchors_and_parse():
    """Miller cylindrical + Van der Grinten I (round 14): (1) exact
    closed-form round-trips world-wide incl. the special-case axes;
    (2) published anchors — Miller y(45°) = 1.25R·ln tan(63°),
    Van der Grinten rim at x = πR (λ=180, φ=0), pole at y = πR,
    equator linear x = Rλ; (3) Van der Grinten's bounding circle:
    every projected point satisfies x² + y² ≤ (πR)²; (4) parse_crs
    dispatch for ESRI codes and proj strings."""
    import math

    import numpy as np

    from geomesa_hive_spark.geom import projections as P

    rng = np.random.RandomState(11)
    pts = np.column_stack([
        rng.uniform(-179.9, 179.9, 200), rng.uniform(-89.9, 89.9, 200)])
    axes = np.array([[0.0, 37.0], [120.0, 0.0], [0.0, 0.0],
                     [-45.0, -88.0], [179.99, 89.99]])
    allp = np.vstack([pts, axes])
    for fam, tol in (("mill", 1e-9), ("vandg", 1e-6)):
        f = getattr(P, f"{fam}_forward")
        inv = getattr(P, f"{fam}_inverse")
        xy = f(allp, (0.0, 3.0, -4.0))
        rt = inv(xy, (0.0, 3.0, -4.0))
        assert np.abs(rt - allp).max() < tol, fam

    m45 = P.mill_forward(np.array([[0.0, 45.0]]), (0.0, 0.0, 0.0))
    want = P._A * 1.25 * math.log(math.tan(math.pi / 4 + 0.4 * math.pi / 4))
    assert abs(m45[0, 1] - want) < 1e-6

    pr = P._A * math.pi
    rim = P.vandg_forward(np.array([[180.0, 0.0]]), (0.0, 0.0, 0.0))
    assert abs(rim[0, 0] - pr) < 1e-6
    pole = P.vandg_forward(np.array([[0.0, 90.0]]), (0.0, 0.0, 0.0))
    assert abs(pole[0, 1] - pr) < 1e-6
    eq = P.vandg_forward(np.array([[72.5, 0.0]]), (0.0, 0.0, 0.0))
    assert abs(eq[0, 0] - P._A * math.radians(72.5)) < 1e-6
    world = P.vandg_forward(allp, (0.0, 0.0, 0.0))
    assert (world[:, 0] ** 2 + world[:, 1] ** 2
            <= pr * pr * (1 + 1e-9)).all()

    assert P.parse_crs("ESRI:54003") == ("mill", 0.0, 0.0, 0.0)
    assert P.parse_crs("ESRI:54029") == ("vandg", 0.0, 0.0, 0.0)
    assert P.parse_crs("+proj=mill +lon_0=10") == ("mill", 10.0, 0.0, 0.0)
    assert P.parse_crs("+proj=vandg")[0] == "vandg"


def test_igh_equal_area_seam_gaps_and_parse():
    """Goode homolosine (round 14): (1) world-wide round-trips across
    all six lobes and both zones; (2) the equal-area property via
    numeric Jacobian ≡ spherical surface element everywhere sampled;
    (3) y is CONTINUOUS at the 40°44′11.8″ seam (sub-meter — the
    classical Goode x-kink stays sub-meter too because φ_b makes the
    x-scales match); (4) interruption-gap and beyond-pole points
    raise (no preimage — the raise-don't-corrupt convention);
    (5) parse_crs dispatch."""
    import math

    import numpy as np
    import pytest as _pytest

    from geomesa_hive_spark.geom import projections as P

    rng = np.random.RandomState(13)
    pts = np.column_stack([
        rng.uniform(-179.9, 179.9, 400), rng.uniform(-89.5, 89.5, 400)])
    xy = P.igh_forward(pts, (0.0, 3.0, -4.0))
    rt = P.igh_inverse(xy, (0.0, 3.0, -4.0))
    assert np.abs(rt - pts).max() < 1e-9

    h = 1e-5
    f = lambda q: P.igh_forward(q, (0.0, 0.0, 0.0))
    sample = np.column_stack([
        rng.uniform(-175, 175, 80), rng.uniform(-85, 85, 80)])
    # keep samples off lobe boundaries and the seam (the Jacobian is
    # discontinuous across them by construction)
    keep = np.ones(len(sample), bool)
    for b in (-180, -100, -40, -20, 80, 180):
        keep &= np.abs(sample[:, 0] - b) > 2 * h * 360
    pbd = math.degrees(P._IGH_PHI_B)
    for b in (-pbd, 0.0, pbd):
        keep &= np.abs(sample[:, 1] - b) > 2 * h * 360
    sample = sample[keep]
    dx = (f(sample + [h, 0]) - f(sample - [h, 0])) / (2 * h)
    dy = (f(sample + [0, h]) - f(sample - [0, h])) / (2 * h)
    jac = np.abs(dx[:, 0] * dy[:, 1] - dx[:, 1] * dy[:, 0])
    surf = (P._A ** 2 * np.cos(np.radians(sample[:, 1]))
            * (math.pi / 180.0) ** 2)
    assert np.abs(jac / surf - 1.0).max() < 1e-5

    lo = P.igh_forward(np.array([[50.0, pbd - 1e-9]]), (0.0, 0.0, 0.0))
    hi2 = P.igh_forward(np.array([[50.0, pbd + 1e-9]]), (0.0, 0.0, 0.0))
    assert np.abs(lo - hi2).max() < 1.0

    with _pytest.raises(ValueError, match="interruption gap"):
        # x just west of the northern lobe boundary at high y: the gap
        P.igh_inverse(np.array([
            [P._A * math.radians(-41.0), P._A * 1.2]]), (0.0, 0.0, 0.0))
    with _pytest.raises(ValueError, match="beyond the pole"):
        P.igh_inverse(np.array([
            [P._A * math.radians(30.0), P._A * 2.0]]), (0.0, 0.0, 0.0))

    assert P.parse_crs("ESRI:54052") == ("igh", 0.0, 0.0, 0.0)
    assert P.parse_crs("+proj=igh +lon_0=5")[0] == "igh"


def test_eqdc_meridian_scale_roundtrip_and_parse():
    """Equidistant conic (round 14): (1) the meridian-arc series
    matches numeric quadrature of the ellipsoidal integrand to sub-mm
    (independent check of Snyder 3-21, not self-consistency); (2) the
    defining property — meridians TRUE TO SCALE: projected distance
    along any meridian equals the ellipsoidal meridional arc, pinned
    via the numeric Jacobian at 1e-9 relative; (3) along-parallel
    scale is 1 exactly on both standard parallels, >1 outside;
    (4) inverse(forward) identity for 2SP and 1SP; (5) degenerate
    n = 0 cones raise; (6) parse_crs dispatch for ESRI codes and
    proj strings."""
    import math

    import numpy as np

    from geomesa_hive_spark.geom import projections as P

    a, e2 = P._A, P._E2
    # (1) series vs numeric quadrature of a(1-e2)(1-e2 sin^2 t)^(-3/2)
    for lat in (0.0, 17.3, 43.0, 62.0, 85.0, -50.0):
        phi = math.radians(lat)
        ts = np.linspace(0.0, phi, 20001)
        integ = np.trapz(
            (1.0 - e2) / (1.0 - e2 * np.sin(ts) ** 2) ** 1.5, ts)
        series = float(P._merid_arc(np.array([phi]))[0])
        assert abs(a * series - a * integ) < 1e-3, lat

    params = (43.0, 62.0, 30.0, 10.0, 0.0, 0.0)       # ESRI:102031
    rng = np.random.RandomState(7)
    pts = np.column_stack([
        rng.uniform(-10, 40, 120), rng.uniform(30, 72, 120)])
    # (2) meridian scale == 1: d(projected)/d(meridian arc) via
    # central differences in latitude along constant lon
    h = 1e-4   # big enough that fp cancellation (~5e-10 m on ~5e6 m
    #            coords) stays below 1e-9 of the ~44 m difference
    up = P.eqdc_forward(pts + [0, h], params)
    dn = P.eqdc_forward(pts - [0, h], params)
    d_proj = np.hypot(up[:, 0] - dn[:, 0], up[:, 1] - dn[:, 1])
    phi = np.radians(pts[:, 1])
    m_rad = a * (1.0 - e2) / (1.0 - e2 * np.sin(phi) ** 2) ** 1.5
    d_arc = m_rad * math.radians(2 * h)
    assert np.abs(d_proj / d_arc - 1.0).max() < 1e-8

    # (3) parallel scale: exactly 1 on both standard parallels
    for latp, expect_one in ((43.0, True), (62.0, True), (30.0, False)):
        p0 = np.array([[10.0, latp], [10.001, latp]])
        xy = P.eqdc_forward(p0, params)
        d = math.hypot(*(xy[1] - xy[0]))
        spp = math.sin(math.radians(latp))
        r_par = a * math.cos(math.radians(latp)) / math.sqrt(
            1 - e2 * spp * spp)
        k = d / (r_par * math.radians(0.001))
        assert abs(k - 1.0) < 1e-6 if expect_one else k > 1.0001

    # (4) round-trips, 2SP and 1SP (incl. southern hemisphere cone)
    rt = P.eqdc_inverse(P.eqdc_forward(pts, params), params)
    assert np.abs(rt - pts).max() < 1e-7
    p1sp = (60.0, 60.0, 0.0, 0.0, 0.0, 0.0)           # ESRI:54027
    rt1 = P.eqdc_inverse(P.eqdc_forward(pts, p1sp), p1sp)
    assert np.abs(rt1 - pts).max() < 1e-7
    psouth = (-20.0, -45.0, -30.0, 135.0, 0.0, 0.0)
    spts = np.column_stack([
        rng.uniform(110, 155, 60), rng.uniform(-45, -10, 60)])
    rts = P.eqdc_inverse(P.eqdc_forward(spts, psouth), psouth)
    assert np.abs(rts - spts).max() < 1e-7

    # (5) degenerate cone raises
    import pytest as _pytest
    with _pytest.raises(ValueError, match="degenerate cone"):
        P.eqdc_consts(-30.0, 30.0, 0.0, 0.0)

    # (6) dispatch
    assert P.parse_crs("ESRI:102031") == ("eqdc", 43.0, 62.0, 30.0,
                                          10.0, 0.0, 0.0)
    assert P.parse_crs("ESRI:54027")[0] == "eqdc"
    assert P.parse_crs(
        "+proj=eqdc +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96"
    ) == ("eqdc", 29.5, 45.5, 23.0, -96.0, 0.0, 0.0)


def test_aea_stere_parse_crs_forms():
    from geomesa_hive_spark.geom import projections as P

    assert P.parse_crs("EPSG:5070")[0] == "aea"
    assert P.parse_crs("+proj=aea +lat_1=-18 +lat_2=-36 +lon_0=132") == (
        "aea", -18.0, -36.0, 0.0, 132.0, 0.0, 0.0)
    assert P.parse_crs("EPSG:3031") == ("stere", False, -71.0, 0.0, 0.0, 0.0)
    assert P.parse_crs("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45") == (
        "stere", True, 70.0, -45.0, 0.0, 0.0)
    import pytest as _pt
    with _pt.raises(ValueError):
        P.parse_crs("+proj=stere +lat_0=30")  # oblique aspect unsupported


def test_merc_ellipsoidal_properties_and_roundtrip():
    """Ellipsoidal Mercator (round 4): unit scale on lat_ts, conformal
    (isotropic local scale), meridian-arc-consistent, and DISTINCT from
    web mercator (the pre-round-4 +proj=merc bug mapped it to the
    spherical form)."""
    import numpy as np

    from geomesa_hive_spark.geom import projections as proj

    pts = np.array([[10.0, 50.0], [-74.0, 40.7], [151.2, -33.9], [0.0, 0.0]])
    k = proj.parse_crs("+proj=merc +ellps=WGS84")
    assert k[0] == "merc" and k[1] == 1.0
    fwd = proj.merc_forward(pts, k[1:])
    back = proj.merc_inverse(fwd, k[1:])
    assert np.allclose(back, pts, atol=1e-9)
    # x is spherical-identical, y must differ from web mercator by the
    # ellipsoidal latitude stretch (~0.3% at mid latitudes, >10 km)
    y_web = np.log(np.tan(np.pi / 4 + np.radians(50.0) / 2)) * 6378137.0
    assert abs(fwd[0][1] - y_web) > 10000.0
    assert fwd[0][1] < y_web  # ellipsoidal y is SMALLER (e-term shrinks t)
    # EPSG:3395 equals +proj=merc k0=1
    k2 = proj.parse_crs("EPSG:3395")
    assert np.allclose(proj.merc_forward(pts, k2[1:]), fwd)
    # unit scale on the standard parallel: forward distance of a tiny
    # east step at lat_ts equals the true parallel arc there
    kts = proj.parse_crs("+proj=merc +lat_ts=30")
    a, e2 = 6378137.0, 0.0066943799901413165
    sp = np.sin(np.radians(30.0))
    arc = a * np.cos(np.radians(30.0)) / np.sqrt(1 - e2 * sp * sp) * np.radians(1e-4)
    two = proj.merc_forward(np.array([[0.0, 30.0], [1e-4, 30.0]]), kts[1:])
    assert abs((two[1][0] - two[0][0]) - arc) < 1e-6
    # conformality at 50N: local scale isotropic to 1e-9 relative
    eps = 1e-6
    tri = proj.merc_forward(
        np.array([[10.0, 50.0], [10.0 + eps, 50.0], [10.0, 50.0 + eps]]), k[1:]
    )
    dx = tri[1][0] - tri[0][0]
    dy = tri[2][1] - tri[0][1]
    sp5 = np.sin(np.radians(50.0))
    # parallel arc per deg vs meridian arc per deg on the ellipsoid
    arc_par = a * np.cos(np.radians(50.0)) / np.sqrt(1 - e2 * sp5 * sp5) * np.radians(eps)
    arc_mer = a * (1 - e2) / (1 - e2 * sp5 * sp5) ** 1.5 * np.radians(eps)
    assert abs(dx / arc_par - dy / arc_mer) < 1e-6 * (dx / arc_par)


def test_eqc_equidistant_property_and_roundtrip():
    """Equidistant cylindrical (round 4): y IS the meridian arc (checked
    against the published arc to 50° ≈ 5540847.04 m), x scales with the
    lat_ts parallel radius, exact roundtrip."""
    import numpy as np

    from geomesa_hive_spark.geom import projections as proj

    k = proj.parse_crs("+proj=eqc +ellps=WGS84")
    assert k[0] == "eqc"
    pts = np.array([[10.0, 50.0], [-74.0, 40.7], [151.2, -33.9], [0.0, 0.0]])
    fwd = proj.eqc_forward(pts, k[1:])
    back = proj.eqc_inverse(fwd, k[1:])
    assert np.allclose(back, pts, atol=1e-9)
    # WGS84 meridian arc equator->50°N: 5540847.04 m (published value)
    assert abs(fwd[0][1] - 5540847.04) < 0.5
    # at lat_ts=60 the x unit is the 60° parallel radius
    k60 = proj.parse_crs("+proj=eqc +lat_ts=60")
    f60 = proj.eqc_forward(np.array([[1.0, 0.0]]), k60[1:])
    a, e2 = 6378137.0, 0.0066943799901413165
    sp = np.sin(np.radians(60.0))
    assert abs(f60[0][0] - a * np.cos(np.radians(60.0)) / np.sqrt(1 - e2 * sp * sp) * np.radians(1.0)) < 1e-6
    # EPSG:4087 is the lat_ts=0 instance
    assert proj.parse_crs("EPSG:4087") == ("eqc", 0.0, 0.0, 0.0, 0.0)


def test_merc_not_webmerc_dispatch(spark):
    """'+proj=merc' must route to the ellipsoidal family; 'EPSG:3857'
    stays web mercator — through the SQL surface end-to-end."""
    rows = spark.sql(
        """SELECT st_asText(st_geomReproject(st_makePoint(10.0D, 50.0D),
                   'EPSG:4326', '+proj=merc +ellps=WGS84')) AS m,
                  st_asText(st_geomReproject(st_makePoint(10.0D, 50.0D),
                   'EPSG:4326', 'EPSG:3857')) AS w"""
    ).collect()[0]
    ym = float(rows.m.split()[-1].rstrip(")"))
    yw = float(rows.w.split()[-1].rstrip(")"))
    assert abs(ym - yw) > 10000.0


def test_krovak_published_value_conformal_and_roundtrip():
    """Krovak (EPSG:5514 S-JTSK): (a) the EPSG Guidance Note 7-2
    worked example for method 9819 — Bessel geodetic φ=50°12'32.4416"N
    λ=16°50'59.1790"E Greenwich → Southing 1050538.64, Westing
    568991.00 (East-North axes negate both) — to 1 cm, plus the four
    published projection constants; (b) local conformality (isotropic,
    orthogonal numeric Jacobian — Krovak's defining trait) with scale
    ≈ k=0.9999 near the projection centre; (c) inverse(forward)
    identity over the Czech/Slovak territory; (d) parse_crs wiring for
    EPSG:5514 and '+proj=krovak'."""
    import math

    import numpy as np

    from geomesa_hive_spark.geom import projections as P

    a, rf = P.ELLIPSOIDS["bessel"]
    e2 = P._ellps_e2(a, rf)
    params = (a, e2, P._KROVAK_LATC, P._KROVAK_LON0, P._KROVAK_ALPHAC,
              P._KROVAK_LATP, P._KROVAK_K, 0.0, 0.0)

    k = P.krovak_consts(*params[:7])
    assert abs(k["b"] - 1.000597498372) < 1e-9
    assert abs(k["t0"] - 1.003419164) < 1e-8
    assert abs(k["n"] - 0.979924705) < 1e-9
    assert abs(k["r0"] - 1298039.005) < 0.01

    lat = 50 + 12 / 60 + 32.4416 / 3600
    lon = 16 + 50 / 60 + 59.1790 / 3600
    f = P.krovak_forward(np.array([[lon, lat]]), params)
    assert abs(f[0, 0] - (-568991.00)) < 0.01
    assert abs(f[0, 1] - (-1050538.64)) < 0.01

    rng = np.random.RandomState(13)
    pts = np.column_stack(
        [rng.uniform(12, 23, 200), rng.uniform(47.5, 51.5, 200)]
    )
    rt = P.krovak_inverse(P.krovak_forward(pts, params), params)
    assert np.abs(rt - pts).max() < 1e-9

    h = 1e-6
    for lo, la in [(14.42, 50.09), (18.5, 49.2), (21.0, 48.6)]:
        p0 = P.krovak_forward(np.array([[lo, la]]), params)[0]
        dx = (P.krovak_forward(np.array([[lo + h, la]]), params)[0] - p0) / h
        dy = (P.krovak_forward(np.array([[lo, la + h]]), params)[0] - p0) / h
        sp = math.sin(math.radians(la))
        nu = a / math.sqrt(1 - e2 * sp * sp)
        rho = a * (1 - e2) / (1 - e2 * sp * sp) ** 1.5
        kx = np.linalg.norm(dx) * 180 / math.pi / (nu * math.cos(math.radians(la)))
        ky = np.linalg.norm(dy) * 180 / math.pi / rho
        assert abs(kx / ky - 1) < 1e-6          # isotropic
        assert abs(np.dot(dx, dy)) < 1e-4 * np.linalg.norm(dx) * np.linalg.norm(dy)
        assert abs(kx - 0.9999) < 4e-4          # ~k0 over the territory

    t = P.parse_crs("EPSG:5514")
    assert t[0] == "krovak" and t[10] == P._KROVAK_TOWGS84
    t2 = P.parse_crs("+proj=krovak +ellps=bessel +towgs84=589,76,480")
    assert t2 == t


def test_somerc_swisstopo_crosscheck_conformal_and_roundtrip():
    """Swiss Oblique Mercator (EPSG:21781): (a) the projection centre
    maps EXACTLY to the false origin (600000, 200000) — the tangency
    anchor; (b) the full WGS84 → CH1903 Helmert → somerc chain matches
    swisstopo's PUBLISHED approximate LV03 formulas (which take WGS84
    input and absorb the datum shift) within their stated ~0.2 m
    accuracy across Switzerland; (c) conformality (isotropic,
    orthogonal Jacobian) with scale exactly 1 at the centre; (d)
    inverse(forward) identity; (e) parse_crs wiring for EPSG:21781,
    EPSG:2056 (LV95 false origin) and '+proj=somerc'."""
    import math

    import numpy as np

    from geomesa_hive_spark.geom import projections as P

    a, rf = P.ELLIPSOIDS["bessel"]
    e2 = P._ellps_e2(a, rf)
    params = (a, e2, P._SOMERC_LAT0, P._SOMERC_LON0, 1.0, 600000.0, 200000.0)

    f0 = P.somerc_forward(
        np.array([[P._SOMERC_LON0, P._SOMERC_LAT0]]), params
    )[0]
    assert abs(f0[0] - 600000.0) < 1e-6 and abs(f0[1] - 200000.0) < 1e-6

    def swisstopo_approx(lon_deg, lat_deg):
        # public swisstopo "approximate formulas" WGS84 -> LV03 (~0.2 m)
        p = (lat_deg * 3600.0 - 169028.66) / 10000.0
        l = (lon_deg * 3600.0 - 26782.5) / 10000.0
        E = (600072.37 + 211455.93 * l - 10938.51 * l * p
             - 0.36 * l * p * p - 44.54 * l ** 3)
        N = (200147.07 + 308807.95 * p + 3745.25 * l * l + 76.63 * p * p
             - 194.56 * l * l * p + 119.79 * p ** 3)
        return E, N

    for lon, lat in [(7.0, 47.0), (8.5, 46.5), (9.5, 46.2), (6.2, 46.3),
                     (10.3, 46.6)]:
        ll = P.datum_from_wgs84(np.array([[lon, lat]]), a, e2,
                                P._CH1903_TOWGS84)
        f = P.somerc_forward(ll, params)[0]
        ea, na = swisstopo_approx(lon, lat)
        assert abs(f[0] - ea) < 0.5 and abs(f[1] - na) < 0.5, (lon, lat)

    rng = np.random.RandomState(6)
    pts = np.column_stack(
        [rng.uniform(5.9, 10.5, 200), rng.uniform(45.8, 47.8, 200)]
    )
    rt = P.somerc_inverse(P.somerc_forward(pts, params), params)
    assert np.abs(rt - pts).max() < 1e-9

    h = 1e-6
    for lo, la in [(P._SOMERC_LON0, P._SOMERC_LAT0), (9.8, 46.5)]:
        p0 = P.somerc_forward(np.array([[lo, la]]), params)[0]
        dx = (P.somerc_forward(np.array([[lo + h, la]]), params)[0] - p0) / h
        dy = (P.somerc_forward(np.array([[lo, la + h]]), params)[0] - p0) / h
        sp = math.sin(math.radians(la))
        nu = a / math.sqrt(1 - e2 * sp * sp)
        rho = a * (1 - e2) / (1 - e2 * sp * sp) ** 1.5
        kx = np.linalg.norm(dx) * 180 / math.pi / (nu * math.cos(math.radians(la)))
        ky = np.linalg.norm(dy) * 180 / math.pi / rho
        assert abs(kx / ky - 1) < 1e-6
        assert abs(np.dot(dx, dy)) < 1e-4 * np.linalg.norm(dx) * np.linalg.norm(dy)
    # tangent at the centre: unit scale
    p0 = P.somerc_forward(np.array([[P._SOMERC_LON0, P._SOMERC_LAT0]]), params)[0]
    dx = (P.somerc_forward(
        np.array([[P._SOMERC_LON0 + h, P._SOMERC_LAT0]]), params)[0] - p0) / h
    sp = math.sin(math.radians(P._SOMERC_LAT0))
    nu = a / math.sqrt(1 - e2 * sp * sp)
    k_c = np.linalg.norm(dx) * 180 / math.pi / (
        nu * math.cos(math.radians(P._SOMERC_LAT0)))
    assert abs(k_c - 1.0) < 1e-7

    t = P.parse_crs("EPSG:21781")
    assert t[0] == "somerc" and t[8] == P._CH1903_TOWGS84
    t95 = P.parse_crs("EPSG:2056")
    assert t95[6] == 2600000.0 and t95[7] == 1200000.0
    tp = P.parse_crs(
        "+proj=somerc +lat_0=46.952405555555565 +lon_0=7.439583333333333 "
        "+k_0=1 +x_0=600000 +y_0=200000 +ellps=bessel "
        "+towgs84=674.374,15.056,405.346"
    )
    assert tp == t


def test_omerc_published_value_and_roundtrip():
    """Hotine Oblique Mercator variant B (EPSG:29873 Timbalai / RSO
    Borneo): (a) the EPSG GN7-2 worked example for method 9815 —
    φ=5°23'14.1129"N λ=115°48'19.8196"E → E 679245.73, N 596562.78 —
    to 1 cm, plus the published B/A/uc constants; (b) conformality
    (isotropic, orthogonal Jacobian); (c) inverse(forward) identity
    over a wide Borneo window; (d) parse_crs wiring for EPSG:29873 and
    '+proj=omerc'; (e) variant A (+no_uoff, EPSG method 9812 — how
    proj expresses EPSG:3375/3376 Malaysia RSO) differs from B by
    EXACTLY the rotated uc offset and round-trips."""
    import math

    import numpy as np
    import pytest

    from geomesa_hive_spark.geom import projections as P

    a, rf = P.ELLIPSOIDS["evrst67"]
    e2 = P._ellps_e2(a, rf)
    params = (a, e2, 4.0, 115.0, 53.31582047222222, 53.13010236111111,
              0.99984, 590476.87, 442857.65, False)
    k = P.omerc_consts(a, e2, 4.0, 115.0, 53.31582047222222,
                       53.13010236111111, 0.99984)
    assert abs(k["b"] - 1.003303209) < 1e-8
    assert abs(k["a2"] - 6376278.686) < 0.01
    assert abs(k["uc"] - 738096.09) < 0.01

    lat = 5 + 23 / 60 + 14.1129 / 3600
    lon = 115 + 48 / 60 + 19.8196 / 3600
    f = P.omerc_forward(np.array([[lon, lat]]), params)
    assert abs(f[0, 0] - 679245.73) < 0.01
    assert abs(f[0, 1] - 596562.78) < 0.01

    rng = np.random.RandomState(8)
    pts = np.column_stack(
        [rng.uniform(108, 120, 200), rng.uniform(0.5, 8.0, 200)]
    )
    rt = P.omerc_inverse(P.omerc_forward(pts, params), params)
    assert np.abs(rt - pts).max() < 1e-9

    h = 1e-6
    for lo, la in [(115.0, 4.0), (117.5, 5.5), (110.0, 1.5)]:
        p0 = P.omerc_forward(np.array([[lo, la]]), params)[0]
        dx = (P.omerc_forward(np.array([[lo + h, la]]), params)[0] - p0) / h
        dy = (P.omerc_forward(np.array([[lo, la + h]]), params)[0] - p0) / h
        sp = math.sin(math.radians(la))
        nu = a / math.sqrt(1 - e2 * sp * sp)
        rho = a * (1 - e2) / (1 - e2 * sp * sp) ** 1.5
        kx = np.linalg.norm(dx) * 180 / math.pi / (nu * math.cos(math.radians(la)))
        ky = np.linalg.norm(dy) * 180 / math.pi / rho
        assert abs(kx / ky - 1) < 1e-6
        assert abs(np.dot(dx, dy)) < 1e-4 * np.linalg.norm(dx) * np.linalg.norm(dy)
        assert abs(kx - 0.99984) < 5e-4  # ~kc near the initial line

    t = P.parse_crs("EPSG:29873")
    assert t[0] == "omerc" and t[10] is False
    assert t[11] == (-679.0, 669.0, -48.0)
    tp = P.parse_crs(
        "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31582047222222 "
        "+gamma=53.13010236111111 +k_0=0.99984 +x_0=590476.87 "
        "+y_0=442857.65 +ellps=evrst67 +towgs84=-679,669,-48"
    )
    assert tp == t
    # no +alpha must fail LOUDLY at parse time, not as a TypeError deep
    # inside the executor-side kernel (review finding)
    with pytest.raises(ValueError, match="alpha"):
        P.parse_crs("+proj=omerc +lat_0=4 +lonc=115")

    # (e) variant A: for identical parameters, coordinates differ from
    # variant B by exactly the rotated uc shift (GN7-2: variant B moves
    # the false origin to the projection centre, i.e. subtracts uc
    # along the initial line before rotation by γc)
    ta = P.parse_crs(
        "+proj=omerc +no_uoff +lat_0=4 +lonc=115 "
        "+alpha=53.31582047222222 +gamma=53.13010236111111 "
        "+k_0=0.99984 +x_0=590476.87 +y_0=442857.65 +ellps=evrst67"
    )
    assert ta[0] == "omerc" and ta[10] is True
    pa = ta[1:11]
    fa = P.omerc_forward(pts, pa)
    fb = P.omerc_forward(pts, params)
    gc = math.radians(53.13010236111111)
    assert np.abs(fa[:, 0] - (fb[:, 0] + k["uc"] * math.sin(gc))).max() < 1e-6
    assert np.abs(fa[:, 1] - (fb[:, 1] + k["uc"] * math.cos(gc))).max() < 1e-6
    rta = P.omerc_inverse(fa, pa)
    assert np.abs(rta - pts).max() < 1e-9


def test_cass_properties_and_parse():
    """Cassini-Soldner (EPSG method 9806, Snyder 13-7..13-10): (a) on
    the central meridian it IS the k0=1 transverse Mercator (both
    reduce to the meridian arc M - M0) — exact; (b) the meridian-arc
    series matches independent numerical quadrature of the meridian
    radius to sub-mm; (c) unit scale along AND across the central
    meridian (the projection's defining equidistance); (d) roundtrip
    over a Berlin window; (e) parse_crs wiring incl. +towgs84 via the
    shared tmerc datum vocabulary."""
    import math

    import numpy as np
    import pytest

    from geomesa_hive_spark.geom import projections as P

    a, rf = P.ELLIPSOIDS["bessel"]
    e2 = P._ellps_e2(a, rf)
    lat0, lon0 = 52.41864827777778, 13.62720366666667  # Soldner Berlin
    params = (a, e2, lat0, lon0, 40000.0, 10000.0)
    tparams = (a, e2, lat0, lon0, 1.0, 40000.0, 10000.0)

    lats = np.linspace(47, 56, 19)
    pts = np.column_stack([np.full_like(lats, lon0), lats])
    assert np.abs(
        P.cass_forward(pts.copy(), params) - P.tmerc_forward(pts.copy(), tparams)
    ).max() == 0.0

    phis = np.linspace(math.radians(lat0), math.radians(54.0), 400_001)
    integrand = a * (1 - e2) / (1 - e2 * np.sin(phis) ** 2) ** 1.5
    arc = np.trapz(integrand, phis)
    y = P.cass_forward(np.array([[lon0, 54.0]]), params)[0, 1] - 10000.0
    assert abs(arc - y) < 1e-3

    h = 1e-7
    for la in (50.0, lat0, 54.5):
        p0 = P.cass_forward(np.array([[lon0, la]]), params)[0]
        dx = (P.cass_forward(np.array([[lon0 + h, la]]), params)[0] - p0) / h
        dy = (P.cass_forward(np.array([[lon0, la + h]]), params)[0] - p0) / h
        sp = math.sin(math.radians(la))
        nu = a / math.sqrt(1 - e2 * sp * sp)
        rho = a * (1 - e2) / (1 - e2 * sp * sp) ** 1.5
        kx = np.linalg.norm(dx) * 180 / math.pi / (nu * math.cos(math.radians(la)))
        ky = np.linalg.norm(dy) * 180 / math.pi / rho
        assert abs(kx - 1.0) < 1e-6 and abs(ky - 1.0) < 1e-6

    rng = np.random.RandomState(3)
    w = np.column_stack([rng.uniform(11, 16, 500), rng.uniform(50, 55, 500)])
    rt = P.cass_inverse(P.cass_forward(w.copy(), params), params)
    assert np.abs(rt - w).max() < 2e-7  # ~2 cm

    t = P.parse_crs(
        "+proj=cass +lat_0=52.41864827777778 +lon_0=13.62720366666667 "
        "+x_0=40000 +y_0=10000 +ellps=bessel"
    )
    assert t[0] == "cass" and t[1] == a and t[7] is None
    td = P.parse_crs(
        "+proj=cass +lat_0=52.4 +lon_0=13.6 +ellps=bessel "
        "+towgs84=598.1,73.7,418.2"
    )
    assert td[7] == (598.1, 73.7, 418.2)
    with pytest.raises(ValueError):
        P.parse_crs("+proj=cass +ellps=nosuch")


def test_sterea_epsg_worked_example_conformal_and_roundtrip():
    """Oblique Stereographic (EPSG method 9809, RD New EPSG:28992):
    (a) the EPSG Guidance Note 7-2 worked example — φ=53°N, λ=6°E on
    the Amersfoort datum → E=196105.283, N=557057.739 — to sub-mm;
    (b) the natural origin maps EXACTLY to (FE, FN) = (155000,
    463000); (c) conformality (isotropic, orthogonal Jacobian) with
    scale exactly k0 at the origin; (d) inverse(forward) identity
    across the Netherlands; (e) parse_crs wiring for EPSG:28992 and
    '+proj=sterea', and that '+proj=stere' (the NON-conformal-sphere
    family) still routes to the polar-stereo branch, not sterea."""
    import math

    import numpy as np

    from geomesa_hive_spark.geom import projections as P

    a, rf = P.ELLIPSOIDS["bessel"]
    e2 = P._ellps_e2(a, rf)
    params = (a, e2, P._RDNEW_LAT0, P._RDNEW_LON0, 0.9999079,
              155000.0, 463000.0)

    # (a) EPSG GN7-2 worked example
    f = P.sterea_forward(np.array([[6.0, 53.0]]), params)[0]
    assert abs(f[0] - 196105.283) < 5e-4 and abs(f[1] - 557057.739) < 5e-4

    # (b) origin → false origin exactly
    f0 = P.sterea_forward(
        np.array([[P._RDNEW_LON0, P._RDNEW_LAT0]]), params
    )[0]
    assert abs(f0[0] - 155000.0) < 1e-6 and abs(f0[1] - 463000.0) < 1e-6

    # (d) roundtrip across the Netherlands
    rng = np.random.RandomState(9)
    pts = np.column_stack(
        [rng.uniform(3.3, 7.2, 200), rng.uniform(50.7, 53.6, 200)]
    )
    rt = P.sterea_inverse(P.sterea_forward(pts, params), params)
    assert np.abs(rt - pts).max() < 1e-9

    # (c) conformal Jacobian; scale = k0 at the natural origin
    h = 1e-6
    for lo, la in [(P._RDNEW_LON0, P._RDNEW_LAT0), (6.6, 52.2)]:
        p0 = P.sterea_forward(np.array([[lo, la]]), params)[0]
        dx = (P.sterea_forward(np.array([[lo + h, la]]), params)[0] - p0) / h
        dy = (P.sterea_forward(np.array([[lo, la + h]]), params)[0] - p0) / h
        sp = math.sin(math.radians(la))
        nu = a / math.sqrt(1 - e2 * sp * sp)
        rho = a * (1 - e2) / (1 - e2 * sp * sp) ** 1.5
        kx = np.linalg.norm(dx) * 180 / math.pi / (
            nu * math.cos(math.radians(la)))
        ky = np.linalg.norm(dy) * 180 / math.pi / rho
        assert abs(kx / ky - 1) < 1e-6
        assert abs(np.dot(dx, dy)) < 1e-4 * np.linalg.norm(dx) * np.linalg.norm(dy)
    p0 = P.sterea_forward(np.array([[P._RDNEW_LON0, P._RDNEW_LAT0]]), params)[0]
    dx = (P.sterea_forward(
        np.array([[P._RDNEW_LON0 + h, P._RDNEW_LAT0]]), params)[0] - p0) / h
    sp = math.sin(math.radians(P._RDNEW_LAT0))
    nu = a / math.sqrt(1 - e2 * sp * sp)
    k_c = np.linalg.norm(dx) * 180 / math.pi / (
        nu * math.cos(math.radians(P._RDNEW_LAT0)))
    assert abs(k_c - 0.9999079) < 1e-7

    # (e) parse_crs wiring
    t = P.parse_crs("EPSG:28992")
    assert t[0] == "sterea" and t[8] == P._RDNEW_TOWGS84
    tp = P.parse_crs(
        "+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889 "
        "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel"
    )
    assert tp[:8] == t[:8] and tp[8] is None
    # '+proj=stere' must NOT be swallowed by the sterea branch
    ps = P.parse_crs("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45")
    assert ps[0] == "stere"
    # full WGS84 chain: Helmert reverse is the negated-parameter
    # approximation, good to ~1 cm (same convention as the OSGB chain)
    ll = P.datum_from_wgs84(np.array([[5.2, 52.1]]), a, e2,
                            P._RDNEW_TOWGS84)
    back = P.datum_to_wgs84(ll, a, e2, P._RDNEW_TOWGS84)
    assert np.abs(back - [[5.2, 52.1]]).max() < 2e-7


def test_poly_snyder_example_parallel_scale_and_roundtrip():
    """American Polyconic (EPSG method 9818): (a) the Snyder p. 304
    numerical example — Clarke 1866, φ0=30° λ0=−96°, point 40°N 75°W →
    (1776774.5, 1319657.8) — within the published 0.1 m rounding; (b)
    the DEFINING property: scale along every parallel is exactly 1
    (each parallel is its tangent cone's arc laid off true) and the
    central meridian is true-scale with x = x0; (c) the equator row
    degenerates to the exact a·(λ−λ0) line; (d) the Newton inverse
    round-trips Brazil-window points to 1e-9°; (e) parse_crs wiring
    for EPSG:29101 (SAD69 + Helmert), EPSG:5880 (SIRGAS 2000) and
    '+proj=poly'."""
    import math

    import numpy as np

    from geomesa_hive_spark.geom import projections as P

    # (a) Snyder worked example
    params = (6378206.4, 0.00676866, 30.0, -96.0, 0.0, 0.0)
    f = P.poly_forward(np.array([[-75.0, 40.0]]), params)[0]
    assert abs(f[0] - 1776774.5) < 0.6 and abs(f[1] - 1319657.8) < 0.6
    inv = P.poly_inverse(np.array([f]), params)[0]
    assert abs(inv[0] + 75.0) < 1e-9 and abs(inv[1] - 40.0) < 1e-9

    # (e) parse wiring
    k = P.parse_crs("EPSG:29101")
    assert k[0] == "poly" and k[7] == P._SAD69_TOWGS84
    k5 = P.parse_crs("EPSG:5880")
    assert k5[7] is None and k5[4] == -54.0
    kp = P.parse_crs(
        "+proj=poly +lat_0=0 +lon_0=-54 +x_0=5000000 +y_0=10000000 "
        "+ellps=grs80"
    )
    assert kp[:7] == k5[:7]
    p58 = k5[1:7]

    # (d) roundtrip across Brazil (incl. near-equator rows)
    rng = np.random.RandomState(3)
    pts = np.column_stack(
        [rng.uniform(-70, -35, 500), rng.uniform(-33, -0.01, 500)]
    )
    rt = P.poly_inverse(P.poly_forward(pts, p58), p58)
    assert np.abs(rt - pts).max() < 1e-9

    # (b) true scale along parallels everywhere; true central meridian
    h = 1e-6
    for lo, la in [(-60.0, -15.0), (-40.0, -30.0), (-54.0, -10.0),
                   (-38.0, -3.0)]:
        pp = P.poly_forward(np.array([[lo + h, la]]), p58)[0]
        pm = P.poly_forward(np.array([[lo - h, la]]), p58)[0]
        dx = (pp - pm) / (2 * h)
        sp = math.sin(math.radians(la))
        nu = p58[0] / math.sqrt(1 - p58[1] * sp * sp)
        kpar = np.linalg.norm(dx) * 180 / math.pi / (
            nu * math.cos(math.radians(la)))
        assert abs(kpar - 1) < 1e-7, (lo, la, kpar)
    cm = P.poly_forward(np.array([[-54.0, -20.0]]), p58)[0]
    assert abs(cm[0] - 5000000.0) < 1e-6
    pp = P.poly_forward(np.array([[-54.0, -20.0 + h]]), p58)[0]
    pm = P.poly_forward(np.array([[-54.0, -20.0 - h]]), p58)[0]
    dy = (pp - pm) / (2 * h)
    sp = math.sin(math.radians(-20.0))
    rho = p58[0] * (1 - p58[1]) / (1 - p58[1] * sp * sp) ** 1.5
    km = np.linalg.norm(dy) * 180 / math.pi / rho
    assert abs(km - 1) < 1e-7, km

    # (c) exact equator degenerate row
    eq = P.poly_forward(np.array([[-50.0, 0.0]]), p58)[0]
    assert abs(eq[0] - (5000000.0 + p58[0] * math.radians(4.0))) < 1e-6
    assert abs(eq[1] - 10000000.0) < 1e-6
    ieq = P.poly_inverse(np.array([eq]), p58)[0]
    assert abs(ieq[0] + 50.0) < 1e-12 and abs(ieq[1]) < 1e-12


def test_eqearth_and_cea_equal_area_and_roundtrip():
    """Equal Earth (EPSG:8857, method 1078) and Lambert cylindrical
    equal-area (EPSG:6933 EASE-Grid 2.0, method 9835): (a) the
    equal-area property holds pointwise — the projected Jacobian
    determinant equals the ellipsoid's area element ν·ρ·cosφ to 1e-6
    relative (for Equal Earth this verifies the x-denominator IS dy/dθ
    and the authalic plumbing; for cea the q scaling); (b) Equal
    Earth's θ parameterization puts the pole at exactly θ=60° and the
    pole-line/equator length ratio at the published ≈0.59; (c) cea's
    standard parallels ±30° are exactly true-to-scale; (d) Newton +
    authalic-iteration inverses round-trip to 1e-9°; (e) parse_crs
    wiring for EPSG:8857/6933, '+proj=eqearth', '+proj=cea +lat_ts'
    (Gall-Peters at 45)."""
    import math

    import numpy as np

    from geomesa_hive_spark.geom import projections as P

    k = P.parse_crs("EPSG:8857")
    assert k == ("eqearth", 0.0, 0.0, 0.0)
    p = k[1:]
    kc = P.parse_crs("EPSG:6933")
    assert kc == ("cea", 30.0, 0.0, 0.0, 0.0)
    pc = kc[1:]
    h = 1e-6

    def area_ratio(fwd, params, lo, la):
        dx = (fwd(np.array([[lo + h, la]]), params)[0]
              - fwd(np.array([[lo - h, la]]), params)[0]) / (2 * h)
        dy = (fwd(np.array([[lo, la + h]]), params)[0]
              - fwd(np.array([[lo, la - h]]), params)[0]) / (2 * h)
        det = abs(dx[0] * dy[1] - dx[1] * dy[0]) * (180 / math.pi) ** 2
        sp = math.sin(math.radians(la))
        nu = P._A / math.sqrt(1 - P._E2 * sp * sp)
        rho = P._A * (1 - P._E2) / (1 - P._E2 * sp * sp) ** 1.5
        return det / (nu * math.cos(math.radians(la)) * rho)

    for lo, la in [(10.0, 40.0), (-120.0, -55.0), (60.0, 75.0), (0.0, 0.0)]:
        assert abs(area_ratio(P.eqearth_forward, p, lo, la) - 1) < 1e-6
    for lo, la in [(100.0, 62.0), (-30.0, -15.0), (5.0, 0.0)]:
        assert abs(area_ratio(P.cea_forward, pc, lo, la) - 1) < 1e-6

    # (b) θ(pole) = 60° exactly; published pole-line ratio
    f = P.eqearth_forward(np.array([[0.0, 90.0]]), p)[0]
    kk = P.eqearth_consts(0.0)
    th = math.pi / 3
    y_pole = kk["rq"] * (P._EE_A1 * th + P._EE_A2 * th ** 3
                         + th ** 7 * (P._EE_A3 + P._EE_A4 * th * th))
    assert abs(f[1] - y_pole) < 1e-6
    xp = P.eqearth_forward(np.array([[180.0, 90.0]]), p)[0][0]
    xe = P.eqearth_forward(np.array([[180.0, 0.0]]), p)[0][0]
    assert 0.57 < xp / xe < 0.61

    # (c) cea standard parallels true-to-scale
    for la in [30.0, -30.0]:
        f0 = P.cea_forward(np.array([[10.0, la]]), pc)[0]
        dx = (P.cea_forward(np.array([[10.0 + h, la]]), pc)[0] - f0) / h
        sp = math.sin(math.radians(la))
        nu = P._A / math.sqrt(1 - P._E2 * sp * sp)
        kpar = np.linalg.norm(dx) * 180 / math.pi / (
            nu * math.cos(math.radians(la)))
        assert abs(kpar - 1) < 1e-7

    # (d) roundtrips incl. high latitude
    rng = np.random.RandomState(5)
    pts = np.column_stack(
        [rng.uniform(-179, 179, 500), rng.uniform(-88, 88, 500)]
    )
    assert np.abs(P.eqearth_inverse(P.eqearth_forward(pts, p), p) - pts).max() < 1e-9
    assert np.abs(P.cea_inverse(P.cea_forward(pts, pc), pc) - pts).max() < 1e-9
    # poles survive (clip/at_pole paths)
    pole = P.eqearth_inverse(P.eqearth_forward(np.array([[0.0, 90.0]]), p), p)
    assert abs(pole[0, 1] - 90.0) < 1e-9

    # (e) proj-string forms
    assert P.parse_crs("+proj=eqearth +lon_0=11.5")[1] == 11.5
    assert P.parse_crs("+proj=cea +lat_ts=45")[1] == 45.0


def test_wintri_exact_anchors_symmetry_and_roundtrip():
    """Winkel Tripel (ESRI:54042, '+proj=wintri'): (a) the EXACT
    closed-form anchors — on the central meridian the Aitoff half
    degenerates and y = R·φ with x = 0; on the equator x =
    R·λ·(cosφ1+1)/2 with y = 0; (b) point symmetry through the
    origin; (c) the 2-D Newton inverse round-trips the whole world to
    1e-7°; (d) the default standard parallel is Winkel's own
    acos(2/π); (e) parse wiring for ESRI:54042/EPSG-spelled 54042 and
    '+proj=wintri +lat_1'."""
    import math

    import numpy as np

    from geomesa_hive_spark.geom import projections as P

    k = P.parse_crs("ESRI:54042")
    assert k[0] == "wintri"
    p = k[1:]
    assert abs(p[0] - math.degrees(math.acos(2 / math.pi))) < 1e-12
    assert P.parse_crs("EPSG:54042") == k
    assert P.parse_crs("+proj=wintri +lat_1=40")[1] == 40.0

    A = P._A
    c1 = 2 / math.pi
    f = P.wintri_forward(np.array([[0.0, 47.0]]), p)[0]
    assert abs(f[0]) < 1e-9 and abs(f[1] - A * math.radians(47.0)) < 1e-6
    f2 = P.wintri_forward(np.array([[120.0, 0.0]]), p)[0]
    assert abs(f2[1]) < 1e-9
    assert abs(f2[0] - A * math.radians(120.0) * (c1 + 1) / 2) < 1e-6

    fp = P.wintri_forward(np.array([[30.0, 40.0]]), p)[0]
    fm = P.wintri_forward(np.array([[-30.0, -40.0]]), p)[0]
    assert abs(fp[0] + fm[0]) < 1e-9 and abs(fp[1] + fm[1]) < 1e-9

    rng = np.random.RandomState(11)
    pts = np.column_stack(
        [rng.uniform(-179, 179, 600), rng.uniform(-89, 89, 600)]
    )
    rt = P.wintri_inverse(P.wintri_forward(pts, p), p)
    assert np.abs(rt - pts).max() < 1e-7
    o = P.wintri_forward(np.array([[0.0, 0.0]]), p)[0]
    assert abs(o[0]) < 1e-12 and abs(o[1]) < 1e-12


def test_vincenty_published_anchors_and_properties():
    """WGS84 ellipsoidal distance (geom/geodesy.py vincenty_m):
    (a) published anchors — one degree of meridian arc from the
    equator is 110574.389 m and one degree along the equator is
    exactly a·π/180 (the equator is a geodesic); (b) symmetry;
    (c) coincident points are exactly 0; (d) the spheroid kernel
    diverges from the sphere kernel by the expected ≤~0.55% and is
    NOT the sphere (the pre-round-6 st_distanceSpheroid alias bug);
    (e) known long-line value: Flinders Peak → Buninyong (Vincenty's
    classic test line transplanted to WGS84) within 0.1 m of
    54972.271 m."""
    import numpy as np

    from geomesa_hive_spark.geom.geodesy import haversine_m, vincenty_m

    one = lambda *a: vincenty_m(*[np.array([v]) for v in a])[0]
    assert abs(one(0.0, 0.0, 0.0, 1.0) - 110574.389) < 0.01
    assert abs(one(0.0, 0.0, 1.0, 0.0) - 6378137.0 * np.pi / 180) < 1e-4
    assert one(5.0, 5.0, 5.0, 5.0) == 0.0
    assert abs(one(10.0, 50.0, -70.0, -30.0)
               - one(-70.0, -30.0, 10.0, 50.0)) < 1e-6
    # (e) GDA reference line (WGS84 coords): Flinders Peak→Buninyong
    d = one(144.4248678889, -37.9510334167, 143.9264955278, -37.6528211388)
    assert abs(d - 54972.271) < 0.15, d
    # (d) spheroid ≠ sphere, bounded by the flattening
    rng = np.random.RandomState(2)
    lo1 = rng.uniform(-170, 170, 300)
    la1 = rng.uniform(-80, 80, 300)
    lo2 = lo1 + rng.uniform(-30, 30, 300)
    la2 = np.clip(la1 + rng.uniform(-30, 30, 300), -89, 89)
    v = vincenty_m(lo1, la1, lo2, la2)
    h = haversine_m(lo1, la1, lo2, la2)
    rel = np.abs(v - h) / np.maximum(h, 1.0)
    assert rel.max() < 0.006
    assert np.median(rel) > 1e-5  # really a different kernel


def test_robinson_nodes_linear_y_and_roundtrip():
    """Robinson (ESRI:54030, '+proj=robin'): (a) every one of
    Robinson's published 5°-table nodes maps EXACTLY (the spline
    passes through its defining values); (b) the documented property
    that Y is linear below 38° (equal 10°-steps to within the table's
    rounding); (c) symmetry in both hemispheres; (d) the Newton
    inverse round-trips the world to 1e-8°; (e) parse wiring for
    ESRI:54030 and '+proj=robin'."""
    import math

    import numpy as np

    from geomesa_hive_spark.geom import projections as P

    k = P.parse_crs("ESRI:54030")
    assert k == ("robin", 0.0, 0.0, 0.0)
    assert P.parse_crs("+proj=robin +lon_0=10")[1] == 10.0
    p = k[1:]
    for i, lat in enumerate(range(0, 95, 5)):
        f = P.robin_forward(np.array([[100.0, float(lat)]]), p)[0]
        ex = P._ROBIN_XF * P._A * P._ROBIN_X[i] * math.radians(100.0)
        ey = P._ROBIN_YF * P._A * P._ROBIN_Y[i]
        assert abs(f[0] - ex) < 1e-6 and abs(f[1] - ey) < 1e-6, lat
    y10 = P.robin_forward(np.array([[0.0, 10.0]]), p)[0][1]
    y20 = P.robin_forward(np.array([[0.0, 20.0]]), p)[0][1]
    y30 = P.robin_forward(np.array([[0.0, 30.0]]), p)[0][1]
    assert abs((y20 - y10) - (y30 - y20)) < 1.0
    fp = P.robin_forward(np.array([[40.0, 55.0]]), p)[0]
    fm = P.robin_forward(np.array([[-40.0, -55.0]]), p)[0]
    assert abs(fp[0] + fm[0]) < 1e-9 and abs(fp[1] + fm[1]) < 1e-9
    rng = np.random.RandomState(3)
    pts = np.column_stack(
        [rng.uniform(-179, 179, 500), rng.uniform(-89.9, 89.9, 500)]
    )
    rt = P.robin_inverse(P.robin_forward(pts, p), p)
    assert np.abs(rt - pts).max() < 1e-8


def test_aeqd_true_center_distance_and_roundtrip():
    """Azimuthal equidistant (ESRI:54032, '+proj=aeqd'): (a) the
    DEFINING property — planar distance from the center equals the
    spherical angular distance × R for every point (checked against
    the independent haversine kernel, rescaled to the semi-major
    sphere); (b) the center maps exactly to the origin; (c) the
    closed spherical inverse round-trips the world including
    antimeridian-wrapped longitudes; (d) parse wiring."""
    import numpy as np

    from geomesa_hive_spark.geom import projections as P
    from geomesa_hive_spark.geom.geodesy import EARTH_RADIUS_M, haversine_m

    k = P.parse_crs("+proj=aeqd +lat_0=52 +lon_0=5")
    assert k == ("aeqd", 52.0, 5.0, 0.0, 0.0)
    assert P.parse_crs("ESRI:54032") == ("aeqd", 0.0, 0.0, 0.0, 0.0)
    p = k[1:]
    rng = np.random.RandomState(1)
    pts = np.column_stack(
        [rng.uniform(-179, 179, 400), rng.uniform(-89, 89, 400)]
    )
    f = P.aeqd_forward(pts, p)
    rho = np.hypot(f[:, 0], f[:, 1])
    hav = haversine_m(
        np.full(400, 5.0), np.full(400, 52.0), pts[:, 0], pts[:, 1]
    ) * (P._A / EARTH_RADIUS_M)
    assert np.abs(rho - hav).max() < 2e-6
    rt = P.aeqd_inverse(f, p)
    assert np.abs(rt - pts).max() < 1e-8
    o = P.aeqd_forward(np.array([[5.0, 52.0]]), p)
    assert abs(o[0, 0]) < 1e-9 and abs(o[0, 1]) < 1e-9


def test_area_spheroid_quadrangle_closed_form_and_gl():
    """area_spheroid (round 13): (1) meridian/parallel quadrangles
    match the textbook closed form to float precision; (2) slanted
    edges (triangles) converge — the fixed 8-point Gauss–Legendre
    matches a dense trapezoid integration of the same integrand to
    ~1e-12 relative; (3) holes subtract exactly and multipolygons sum;
    (4) near-full-earth box recovers the WGS84 surface area; (5)
    non-areal geometry is 0."""
    import math

    import numpy as np

    from geomesa_hive_spark.geom import from_wkt
    from geomesa_hive_spark.geom.geodesy import (
        _area_antideriv, area_spheroid,
    )

    # (1) closed form on boxes at several latitudes incl. southern
    for (x0, y0, x1, y1) in [(10, 20, 30, 32), (-170, -80, -150, -60),
                             (0, -5, 1, 5), (100, 60, 140, 85)]:
        g = from_wkt(f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, "
                     f"{x0} {y1}, {x0} {y0}))")
        exact = (math.radians(x1 - x0)
                 * (_area_antideriv(math.sin(math.radians(y1)))
                    - _area_antideriv(math.sin(math.radians(y0)))))
        got = area_spheroid(g)
        assert abs(got - exact) / exact < 1e-12, (x0, y0, x1, y1)

    # (2) slanted edges: triangle vs dense trapezoid of F(phi(lam))
    tri = from_wkt("POLYGON ((0 0, 40 10, 20 50, 0 0))")
    got = area_spheroid(tri)

    def edge_num(lam1, phi1, lam2, phi2, n=200000):
        lams = np.linspace(math.radians(lam1), math.radians(lam2), n)
        phis = np.linspace(math.radians(phi1), math.radians(phi2), n)
        f = np.array([_area_antideriv(math.sin(p)) for p in phis])
        return np.trapz(f, lams)

    num = abs(edge_num(0, 0, 40, 10) + edge_num(40, 10, 20, 50)
              + edge_num(20, 50, 0, 0))
    assert abs(got - num) / num < 1e-9, (got, num)

    # (3) holes and multiparts
    outer = "0 0, 10 0, 10 10, 0 10, 0 0"
    hole = "2 2, 4 2, 4 4, 2 4, 2 2"
    a_outer = area_spheroid(from_wkt(f"POLYGON (({outer}))"))
    a_hole = area_spheroid(from_wkt(f"POLYGON (({hole}))"))
    a_with = area_spheroid(from_wkt(f"POLYGON (({outer}), ({hole}))"))
    assert abs(a_with - (a_outer - a_hole)) < 1e-3
    a_multi = area_spheroid(from_wkt(
        f"MULTIPOLYGON ((({outer})), (({hole})))"))
    assert abs(a_multi - (a_outer + a_hole)) < 1e-3

    # (4) near-full earth ≈ WGS84 surface area 5.100657e14 m²
    g = from_wkt("POLYGON ((-180 -90, 180 -90, 180 90, -180 90, "
                 "-180 -90))")
    assert abs(area_spheroid(g) - 5.100657e14) / 5.100657e14 < 1e-4

    # (5) non-areal
    assert area_spheroid(from_wkt("LINESTRING (0 0, 10 10)")) == 0.0
    assert area_spheroid(from_wkt("POINT (1 2)")) == 0.0


def test_ortho_eck4_natearth_roundtrip_and_anchors():
    """Round-13 projection families: forward/inverse round-trips at
    float precision; Eckert IV pole/equator anchors (x spans
    ±2·Cx·R·π at the equator, y = ±Cy·R at the poles); Natural Earth
    equator scaling (x = 0.8707·R·λ, y = 0); orthographic
    far-hemisphere points raise instead of folding through the
    projection plane."""
    import math

    import numpy as np
    import pytest

    from geomesa_hive_spark.geom import projections as P

    vis = np.array([[12.5, 47.25], [30.0, 20.0], [0.0, 60.0],
                    [50.0, 35.0], [10.0, 40.0]])
    world = np.array([[12.5, 47.25], [-60.0, -33.5], [0.0, 0.0],
                      [150.0, 80.0], [-179.5, -89.0]])
    for fwd, inv, params, pts in [
        (P.ortho_forward, P.ortho_inverse, (40.0, 10.0, 100.0, -50.0), vis),
        (P.eck4_forward, P.eck4_inverse, (15.0, 3000.0, -2000.0), world),
        (P.natearth_forward, P.natearth_inverse, (15.0, 3000.0, -2000.0),
         world),
    ]:
        xy = fwd(pts, params)
        rt = inv(xy, params)
        assert np.abs(rt - pts).max() < 1e-6, fwd.__name__

    # anchors (lon0 = 0, no offsets)
    eq = P.eck4_forward(np.array([[180.0, 0.0], [0.0, 90.0]]),
                        (0.0, 0.0, 0.0))
    cx = 2.0 / math.sqrt(math.pi * (4.0 + math.pi))
    cy = 2.0 * math.sqrt(math.pi / (4.0 + math.pi))
    assert abs(eq[0, 0] - cx * P._A * math.pi * 2.0) < 1e-3   # θ=0: 1+cosθ=2
    assert abs(eq[1, 1] - cy * P._A) < 1e-3                    # pole: sinθ=1
    ne = P.natearth_forward(np.array([[180.0, 0.0]]), (0.0, 0.0, 0.0))
    assert abs(ne[0, 0] - 0.8707 * P._A * math.pi) < 1e-3
    assert abs(ne[0, 1]) < 1e-9

    with pytest.raises(ValueError, match="far hemisphere"):
        P.ortho_forward(np.array([[-150.0, -40.0]]), (40.0, 10.0, 0.0, 0.0))

    # gnomonic: round-trip, straight-great-circle anchor (the equator
    # through a lat_0=0 center maps to y = 0), horizon raises
    vis0 = np.array([[20.0, 30.0], [-40.0, -20.0], [10.0, 0.0]])
    xy = P.gnom_forward(vis0, (0.0, 10.0, 0.0, 0.0))
    rt = P.gnom_inverse(xy, (0.0, 10.0, 0.0, 0.0))
    assert np.abs(rt - vis0).max() < 1e-9
    eqline = P.gnom_forward(
        np.array([[50.0, 0.0], [-60.0, 0.0]]), (0.0, 10.0, 0.0, 0.0))
    assert np.abs(eqline[:, 1]).max() < 1e-6
    with pytest.raises(ValueError, match="horizon"):
        P.gnom_forward(np.array([[-150.0, -40.0]]), (40.0, 10.0, 0.0, 0.0))

    # hammer: exact closed-form inverse round-trips the whole world;
    # pole anchor y = R*sqrt(2); equal-area ellipse edge x = 2*sqrt(2)*R
    world2 = np.array([[12.5, 47.25], [-60.0, -33.5], [0.0, 0.0],
                       [150.0, 80.0], [-170.0, -85.0]])
    xy = P.hammer_forward(world2, (0.0, 3.0, -4.0))
    rt = P.hammer_inverse(xy, (0.0, 3.0, -4.0))
    assert np.abs(rt - world2).max() < 1e-9
    pole = P.hammer_forward(np.array([[0.0, 90.0]]), (0.0, 0.0, 0.0))
    assert abs(pole[0, 1] - P._A * math.sqrt(2.0)) < 1e-6
    edge = P.hammer_forward(np.array([[180.0, 0.0]]), (0.0, 0.0, 0.0))
    assert abs(edge[0, 0] - 2.0 * math.sqrt(2.0) * P._A) < 1e-6
    # raise-don't-corrupt: a point outside the projection ellipse has
    # no preimage — must raise, not clamp to a plausible lon/lat
    # (rim points themselves still invert: the clip only absorbs
    # rounding-level negatives)
    with pytest.raises(ValueError, match="outside the projection ellipse"):
        P.hammer_inverse(
            np.array([[2.1 * math.sqrt(2.0) * P._A, 0.0]]), (0.0, 0.0, 0.0))
    rim = P.hammer_inverse(edge, (0.0, 0.0, 0.0))
    assert abs(abs(rim[0, 0]) - 180.0) < 1e-6

    # parse_crs dispatch: ESRI code + proj strings resolve
    assert P.parse_crs("ESRI:54012")[0] == "eck4"
    assert P.parse_crs("ESRI:54044")[0] == "hammer"
    assert P.parse_crs("+proj=ortho +lat_0=40 +lon_0=10")[0] == "ortho"
    assert P.parse_crs("+proj=gnom +lat_0=40 +lon_0=10")[0] == "gnom"
    assert P.parse_crs("+proj=natearth")[0] == "natearth"
    assert P.parse_crs("+proj=hammer")[0] == "hammer"


def test_linear_referencing_kernel():
    """Linear referencing trio (round 14, geom/linear.py): interpolate
    at exact breakpoints and midpoints, clamping, locate as the exact
    inverse of interpolate plus off-line projection, substring
    endpoint/interior-vertex algebra, degenerate (zero-length,
    single-point, duplicate-vertex) inputs, and the f0 > f1 refusal."""
    import numpy as np
    import pytest

    from geomesa_hive_spark.geom.linear import (
        line_interpolate_point as lip,
        line_locate_point as llp,
        line_substring as lsub,
    )

    L = np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 4.0]])  # lengths 3, 4
    assert np.allclose(lip(L, 0.0), [0, 0])
    assert np.allclose(lip(L, 1.0), [3, 4])
    assert np.allclose(lip(L, 3 / 7), [3, 0])        # exact breakpoint
    assert np.allclose(lip(L, 0.5), [3, 0.5])
    assert np.allclose(lip(L, 1.5), [3, 4])          # clamp high
    assert np.allclose(lip(L, -0.2), [0, 0])         # clamp low
    for f in (0.0, 0.2, 3 / 7, 0.9, 1.0):
        assert abs(llp(L, lip(L, f)) - f) < 1e-12, f
    assert abs(llp(L, [1.0, -5.0]) - 1 / 7) < 1e-12  # projects to seg 1
    assert abs(llp(L, [10.0, 10.0]) - 1.0) < 1e-12   # beyond the end
    assert np.allclose(lsub(L, 1 / 7, 5 / 7), [[1, 0], [3, 0], [3, 2]])
    assert np.allclose(lsub(L, 0.5, 0.5), [[3, 0.5], [3, 0.5]])
    assert np.allclose(lsub(L, 0.0, 1.0), L[:, :2])
    with pytest.raises(ValueError, match="f0 <= f1"):
        lsub(L, 0.8, 0.2)

    Z = np.array([[2.0, 2.0], [2.0, 2.0]])           # zero length
    assert np.allclose(lip(Z, 0.7), [2, 2])
    assert llp(Z, [5.0, 5.0]) == 0.0
    assert np.allclose(lsub(Z, 0.1, 0.9), [[2, 2], [2, 2]])
    P1 = np.array([[4.0, 5.0]])                      # single vertex
    assert np.allclose(lip(P1, 0.3), [4, 5])
    D = np.array([[0, 0], [1, 0], [1, 0], [2, 0]], float)  # dup vertex
    assert np.allclose(lip(D, 0.5), [1, 0])
    assert np.allclose(lsub(D, 0.25, 0.75),
                       [[0.5, 0], [1, 0], [1.5, 0]])
    with pytest.raises(ValueError, match="empty"):
        lip(np.empty((0, 2)), 0.5)


def test_segmentize_kernel():
    """st_segmentize kernel (round 14): equal split counts, kept
    vertices, length invariance, no-op when d exceeds every segment,
    zero-length segments pass through, d <= 0 raises."""
    import numpy as np
    import pytest

    from geomesa_hive_spark.geom.linear import segmentize_coords as sc

    L = np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 4.0]])
    r = sc(L, 1.0)
    assert len(r) == 8 and np.allclose(r[:4, 0], [0, 1, 2, 3])
    assert np.allclose(np.hypot(*np.diff(r, axis=0).T).sum(), 7.0)
    assert np.allclose(sc(L, 10.0), L)                 # no-op
    r3 = sc(L, 2.5)                                    # ceil 2 + 2
    assert len(r3) == 5 and np.allclose(r3[1], [1.5, 0])
    D = np.array([[0, 0], [0, 0], [1, 0]], float)      # zero-length seg
    r4 = sc(D, 0.4)
    assert np.allclose(r4[0], r4[1]) and len(r4) == 5
    with pytest.raises(ValueError, match="max_len"):
        sc(L, 0.0)
    with pytest.raises(ValueError, match="max_len"):
        sc(L, -1.0)
