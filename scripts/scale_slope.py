"""Measure the sf0.1 → sf1 scaling SLOPE of the heaviest operators —
the round-8 conversion of SCALE.md's 100 TB design arguments from prose
into data (VERDICT r7 next-round #1).

Protocol
--------
Two locally-synthesized datasets, BOTH built by the same builder so
file layout/codec/row-group structure are identical:

- ``m=1``  — a rebuild of sf0.1 (same row counts),
- ``m=10`` — "sf1": 10 key-offset copies of every scaling table
  (dimension tables region/nation stay fixed, as they would at any SF).

Copies are made CONTENT-DISTINCT where identical content would change
the workload's *character* rather than its *size*:

- ``documents.text`` is letter-permuted per copy (``translate`` over
  the 10 most frequent letters) — otherwise every doc gains 9
  near-identical twins and near-dup PAIR OUTPUT grows quadratically,
  which measures the data artifact, not the plan;
- ``customer.c_name``/``part.p_name`` get per-copy 3-char suffixes
  (pairwise edit distance 3 > the linkage thresholds) so record
  linkage stays 1:1 per copy instead of 10:10;
- ``embeddings.embedding`` is perturbed per copy (distinct vectors);
- all foreign keys offset consistently (copy i of lineitem references
  copy i of orders, etc.).

Operators whose gate queries derive COORDINATES from keys modulo a
fixed window (the spatial joins + DBSCAN + Hausdorff) are measured via
CONSTANT-DENSITY runners instead: n scales ×m while the coordinate
domain area scales ×m (side ×√m), matching how a real 10× corpus
covers more world rather than stacking 10× points on the same spots.
At m=1 each runner reproduces the sf0.1 gate's workload shape.

Slope interpretation (data ×10):
- ≈10 (or below)  — linear: the plan's work is proportional to data;
- 10–15           — linear with fixed-overhead amortization or mild
                    per-key growth; acceptable;
- >15             — SUPER-LINEAR: the operator does more than
                    proportional work per row — fix or bound it.

Writes ``SCALE_SLOPE.json`` at the repo root and prints a table.

Usage:  python scripts/scale_slope.py [--only q1,q2] [--rebuild]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SCALE_SLOPE_DIR", "/tmp/ghs_scale")
M_BIG = 10

# letter-permutation alphabet per copy: copy 0 = identity, copy i is a
# Caesar rotation of the full lowercase alphabet — every word changes
# spelling, so cross-copy shingle Jaccard collapses to ~0 while length,
# token counts, and within-copy duplicate structure are preserved.
# ROTATIONS MUST BE DISTINCT PER COPY: the first m30 run reused a
# 10-char rotation set, making copies {1,11,21} share IDENTICAL text —
# cross-copy true duplicates exploded near-dup pair output ~20x and
# read as a fake super-linear slope. 26 letters → m ≤ 26.
_AB = "abcdefghijklmnopqrstuvwxyz"


def _copies_expr(m: int):
    from pyspark.sql import functions as F

    if m > len(_AB):
        raise ValueError(f"builder supports m <= {len(_AB)} "
                         f"(distinct per-copy permutations), got {m}")
    return F.explode(F.array(*[F.lit(i) for i in range(m)])).alias("__i")


def _suffix(col, m):
    """Per-copy name suffix with pairwise edit distance >= 2 (so k=1
    linkage can never match across copies): two distinct letters
    repeated twice — 'xyxy'. A single indexed letter capped the builder
    at m=10 and SILENTLY emitted the same empty tag for every copy past
    it (substring beyond the literal), making 20 copies share names."""
    from pyspark.sql import functions as F

    out = F.col(col)
    for i in range(1, m):
        c1, c2 = _AB[i // len(_AB)], _AB[i % len(_AB)]
        tag = f" {c1}{c2}{c1}{c2}"
        out = F.when(F.col("__i") == i,
                     F.concat(F.col(col), F.lit(tag))).otherwise(out)
    return out.alias(col)


def _permute_text(col, m):
    from pyspark.sql import functions as F

    out = F.col(col)
    for i in range(1, m):
        rot = _AB[i:] + _AB[:i]
        out = F.when(
            F.col("__i") == i, F.translate(F.col(col), _AB, rot)
        ).otherwise(out)
    return out.alias(col)


def build_scaled(spark, src: str, dst: str, m: int) -> None:
    """Synthesize an m× dataset under ``dst`` (parquet per table)."""
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)

    def _t(name):
        return spark.read.parquet(os.path.join(src, f"{name}.parquet"))

    def _w(df, name, n_files=8):
        df.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet")
        )

    # dims: fixed at any SF
    for d in ("region", "nation"):
        _w(_t(d), d, n_files=1)

    # key offsets = (max key + 1) per table, consistent across FKs
    offs = {}
    for tbl, key in (("customer", "c_custkey"), ("supplier", "s_suppkey"),
                     ("part", "p_partkey"), ("orders", "o_orderkey"),
                     ("documents", "doc_id"), ("embeddings", "vec_id"),
                     ("events", "event_id")):
        offs[tbl] = int(_t(tbl).agg(F.max(key)).collect()[0][0]) + 1
    offs["user"] = int(_t("events").agg(F.max("user_id")).collect()[0][0]) + 1

    i = F.col("__i")

    c = _t("customer").select("*", _copies_expr(m))
    _w(c.select(
        (F.col("c_custkey") + i * offs["customer"]).alias("c_custkey"),
        _suffix("c_name", m),
        "c_nationkey", "c_acctbal", "c_mktsegment"), "customer")

    s = _t("supplier").select("*", _copies_expr(m))
    _w(s.select(
        (F.col("s_suppkey") + i * offs["supplier"]).alias("s_suppkey"),
        _suffix("s_name", m), "s_nationkey", "s_acctbal"), "supplier")

    p = _t("part").select("*", _copies_expr(m))
    _w(p.select(
        (F.col("p_partkey") + i * offs["part"]).alias("p_partkey"),
        _suffix("p_name", m),
        "p_brand", "p_type", "p_size", "p_retailprice"), "part")

    o = _t("orders").select("*", _copies_expr(m))
    _w(o.select(
        (F.col("o_orderkey") + i * offs["orders"]).alias("o_orderkey"),
        (F.col("o_custkey") + i * offs["customer"]).alias("o_custkey"),
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
    ), "orders")

    li = _t("lineitem").select("*", _copies_expr(m))
    keep = [c_ for c_ in _t("lineitem").columns
            if c_ not in ("l_orderkey", "l_partkey", "l_suppkey")]
    _w(li.select(
        (F.col("l_orderkey") + i * offs["orders"]).alias("l_orderkey"),
        (F.col("l_partkey") + i * offs["part"]).alias("l_partkey"),
        (F.col("l_suppkey") + i * offs["supplier"]).alias("l_suppkey"),
        *keep), "lineitem", n_files=16)

    d = _t("documents").select("*", _copies_expr(m))
    _w(d.select(
        (F.col("doc_id") + i * offs["documents"]).alias("doc_id"),
        _permute_text("text", m), "lang", "source", "n_chars"), "documents")

    e = _t("embeddings").select("*", _copies_expr(m))
    _w(e.select(
        (F.col("vec_id") + i * offs["embeddings"]).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: (x + i.cast("float") * F.lit(0.0009765625)).cast("float"),
        ).alias("embedding"),
        "label"), "embeddings")

    ev = _t("events").select("*", _copies_expr(m))
    cols = [c_ for c_ in _t("events").columns
            if c_ not in ("event_id", "user_id")]
    _w(ev.select(
        (F.col("event_id") + i * offs["events"]).alias("event_id"),
        (F.col("user_id") + i * offs["user"]).alias("user_id"),
        *cols), "events", n_files=16)


# ---------------------------------------------------------------------------
# constant-density spatial runners (m=1 ≈ the sf0.1 gate workload shape)
# ---------------------------------------------------------------------------

def _pts(spark, n, mult_x, mult_y, w_cm, h_cm, dx=0.0, dy=0.0):
    from pyspark.sql import functions as F

    return spark.range(1, n + 1).select(
        F.col("id"),
        (((F.col("id") * mult_x) % w_cm) / 100.0 + F.lit(dx)).alias("x"),
        (((F.col("id") * mult_y) % h_cm) / 100.0 + F.lit(dy)).alias("y"),
    )


def run_spatial_distance_join(spark, sf_dir, m):
    from pyspark.sql import functions as F

    from geomesa_hive_spark.functions.registry import register_all
    from geomesa_hive_spark.operators.spatial_join import distance_join

    register_all(spark)
    s = math.sqrt(m)
    w_cm, h_cm = int(35000 * s), int(17000 * s)
    a = _pts(spark, 15000 * m, 9973, 7919, w_cm, h_cm).select(
        F.col("id").alias("ida"),
        F.call_function("st_makepoint", "x", "y").alias("geom"))
    b = _pts(spark, 1000 * m, 6101, 5471, w_cm, h_cm, 0.003, 0.003).select(
        F.col("id").alias("idb"),
        F.call_function("st_makepoint", "x", "y").alias("geom2"))
    return distance_join(a, b, 2.0, left_geom="geom", right_geom="geom2")


def run_spatial_distance_join_sphere(spark, sf_dir, m):
    from pyspark.sql import functions as F

    from geomesa_hive_spark.functions.registry import register_all
    from geomesa_hive_spark.operators.spatial_join import (
        distance_join_sphere,
    )

    register_all(spark)
    # lon/lat must stay in range: grow POINT COUNT ×m and shrink the
    # radius by √m instead of growing the domain (equivalent constant-
    # expected-output scaling for a geodesic join on the full globe)
    a = _pts(spark, 15000 * m, 9973, 7919, 35000, 17000).select(
        F.col("id").alias("ida"),
        F.call_function(
            "st_makepoint", F.col("x") - 175.0, F.col("y") - 85.0
        ).alias("geom"))
    b = _pts(spark, 1000 * m, 6101, 5471, 35600, 17400).select(
        F.col("id").alias("idb"),
        F.call_function(
            "st_makepoint", F.col("x") - 178.0, F.col("y") - 87.0
        ).alias("geom2"))
    # radius ÷√m keeps expected OUTPUT ∝ m on the fixed globe
    # (pairs ∝ n_a·n_b·r² = m²·r0²/m): the constant-density analogue
    # for a geodesic join whose domain cannot grow
    return distance_join_sphere(a, b, 500_000.0 / math.sqrt(m),
                                left_geom="geom", right_geom="geom2")


def run_spatial_dbscan(spark, sf_dir, m):
    from geomesa_hive_spark.operators.dbscan import dbscan

    s = math.sqrt(m)
    w_cm, h_cm = int(35000 * s), int(16993 * s)
    pts = _pts(spark, 15000 * m, 9973, 7919, w_cm, h_cm)
    return dbscan(pts, "id", "x", "y", 2.0, 3)


def run_spatial_hausdorff(spark, sf_dir, m):
    from pyspark.sql import functions as F

    from geomesa_hive_spark.operators.trajectory import hausdorff_join

    users = 48 * m
    grid = max(5, int(round(5 * math.sqrt(m))))  # ~same users per box
    # per-user DECORRELATED tracks (u*997/u*1013 phase + k*prime stride):
    # consecutive-id tracks would be shifted copies exactly 20 units
    # apart — just past max_dist, yielding zero pairs at m=1
    u = (F.col("id") / 24).cast("long")
    k = F.col("id") % 24
    pts = spark.range(users * 24).select(
        u.alias("user_id"),
        F.col("id").alias("event_id"),
        (((u * 997 + k * 7919) % 400) / 10.0 + u % grid * 60.0).alias("x"),
        (((u * 1013 + k * 4799) % 400) / 10.0
         + (u / grid).cast("long") % grid * 60.0).alias("y"),
    )
    return hausdorff_join(pts, "user_id", "event_id", "x", "y",
                          max_dist=19.0)


# ---------------------------------------------------------------------------
# manifest-write family (round-10, VERDICT r9 #10): cost is FILE-COUNT-
# dependent, so the gate workloads are replayed with n_files ∝ m — at a
# fixed file size a 10× corpus IS 10× the files, and these slopes measure
# manifest build + prune machinery against that, not just row volume.
# ---------------------------------------------------------------------------

def _scaled_pts(spark, sf_dir):
    from pyspark.sql import functions as _F  # noqa: F401 (selectExpr only)

    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    return c.selectExpr(
        "c_custkey",
        "CAST((c_custkey * 9973) % 35000 AS DOUBLE) / 100.0 - 175.0 AS x",
        "CAST((c_custkey * 7919) % 17000 AS DOUBLE) / 100.0 - 85.0 AS y",
    )


def run_spatial_window_read(spark, sf_dir, m):
    import tempfile

    from geomesa_hive_spark.sources.manifest import (
        read_window, write_window_manifest,
    )

    pts = _scaled_pts(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="ghs_sw_")
    write_window_manifest(pts, path, "x", "y", zoom=8, n_files=16 * m,
                          manifest_format="parquet")
    out, kept, total = read_window(
        spark, path, "x", "y", (-60.005, 0.005, -10.005, 50.005))
    assert 0 < kept < total, (kept, total)
    return out


def run_manifest_window_count(spark, sf_dir, m):
    import tempfile

    from geomesa_hive_spark.sources.manifest import (
        window_count, write_window_manifest,
    )

    pts = _scaled_pts(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="ghs_wc_")
    write_window_manifest(pts, path, "x", "y", zoom=8, n_files=16 * m,
                          manifest_format="parquet")
    cnt, rep = window_count(
        spark, path, "x", "y", (-120.005, -60.005, 100.005, 70.005))
    assert rep["files_metadata"] > 0, rep
    assert rep["files_scanned"] < 16 * m, rep
    return spark.createDataFrame([(cnt,)], "cnt long")


def run_bm25_positions_build(spark, sf_dir, m):
    """Positional-dataset slope with the BUILD dominant (round 14 —
    VERDICT r13 item 7: the gate-verbatim ``bm25_index_phrase`` slope
    of 0.87 is stage-overhead-dominated and carries no number for the
    SCALE.md claim that ``positions/`` is Σ-token-count rows, the
    largest artifact the BM25 family writes). This runner isolates
    exactly that artifact: build_bm25_index(positions=True) over the
    scaled corpus, one bucket-pruned phrase query (the steady-state
    read path, O(phrase-term buckets) regardless of m), and the
    RETURNED frame is the positions dataset itself — so ``rows_m*``
    in the slope row IS the measured Σ-token-count row count, pinning
    the artifact-size claim alongside the build-time slope."""
    import os as _os
    import tempfile

    from geomesa_hive_spark.pipeline.retrieval import (
        bm25_phrase_query_index, build_bm25_index,
    )

    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    path = tempfile.mkdtemp(prefix="ghs_pos_") + "/idx"
    build_bm25_index(docs, "doc_id", "text", path, n_buckets=16,
                     positions=True)
    res = bm25_phrase_query_index(spark, path, "fast sort", k=25)
    assert res.count() > 0
    return spark.read.parquet(_os.path.join(path, "positions"))


def run_manifest_zorder(spark, sf_dir, m):
    import tempfile

    from pyspark.sql import functions as F

    from geomesa_hive_spark.sources.manifest import (
        read_pruned, write_zordered,
    )

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")) \
        .select("l_orderkey", "l_partkey", "l_returnflag", "l_quantity")
    path = tempfile.mkdtemp(prefix="ghs_zo_")
    write_zordered(li, path, ["l_orderkey", "l_partkey"], n_files=32 * m)
    mx = li.agg(F.max("l_orderkey").alias("mo"),
                F.max("l_partkey").alias("mp")).collect()[0]
    parts = []
    for dim, mv in (("l_orderkey", int(mx["mo"])),
                    ("l_partkey", int(mx["mp"]))):
        lo, hi = mv * 2 // 10, mv * 3 // 10
        pruned, kept, total = read_pruned(spark, path, dim, lo, hi)
        assert kept < total, (dim, kept, total)
        parts.append(pruned.groupBy("l_returnflag").count())
    return parts[0].unionByName(parts[1])


def run_manifest_bloom(spark, sf_dir, m):
    import tempfile

    from pyspark.sql import functions as F

    from geomesa_hive_spark.sources.manifest import (
        read_point_lookup, write_with_manifest,
    )

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")) \
        .select("o_orderkey", "o_custkey", "o_totalprice")
    path = tempfile.mkdtemp(prefix="ghs_bl_")
    write_with_manifest(o, path, ["o_custkey"], n_files=16 * m,
                        bloom_cols=["o_orderkey"], bloom_bits=1 << 17,
                        manifest_format="parquet",
                        manifest_shards=max(1, m // 2))
    r = o.agg(F.min("o_orderkey").alias("lo"),
              F.max("o_orderkey").alias("hi")).collect()[0]
    got, kept, total = read_point_lookup(
        spark, path, "o_orderkey", [int(r["lo"]), int(r["hi"])])
    assert kept < total, (kept, total)
    return got


# IVM family (round-10): the claim under test is "refresh cost ∝ delta,
# never a base re-aggregation" — so the DELTA IS HELD CONSTANT while the
# base grows ×m (key filters use moduli scaled by m: |delta| ≈ const).
# Setup (base + commits + stored view) is memoized per (dir, m) via an
# on-disk marker OUTSIDE the timed region's steady state: trial 1 pays
# the build, best-of-N takes the refresh-only trials. The control row
# is the full recompute on the same tables — that one must scale ~×m,
# the incremental row must not.


# base AMPLIFICATION inside the runner: at sf0.1-derived sizes a 1.5M-row
# aggregate sits at the local[32] scheduling floor (~1 s) and every slope
# reads "flat" — the ×_IVM_AMP per-row explode (keys re-uniqued) lifts the
# base to 6M/60M rows at m=1/10 so the control's base-sized shuffle is
# measurable while the delta stays ~86k rows at every m (moduli scale ×m)
_IVM_AMP = 40


def _ivm_setup(spark, sf_dir, m):
    from pyspark.sql import functions as F

    from geomesa_hive_spark.sources.incremental import group_agg
    from geomesa_hive_spark.sources.manifest import write_delta

    root = os.path.join(sf_dir, "_ivm_runner")
    marker = os.path.join(root, "_built")
    tbl = os.path.join(root, "tbl")
    view = os.path.join(root, "view0")
    if os.path.exists(marker):
        return tbl, view
    if os.path.exists(root):
        shutil.rmtree(root)
    o0 = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")) \
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    o = (
        o0.withColumn("rep", F.explode(F.sequence(F.lit(0),
                                                  F.lit(_IVM_AMP - 1))))
        .select(
            (F.col("o_orderkey") * _IVM_AMP + F.col("rep"))
            .alias("o_orderkey"),
            "o_custkey", "o_totalprice", "o_orderstatus",
        )
    )
    o.repartition(32).write.mode("overwrite").parquet(tbl)
    o = spark.read.parquet(tbl)
    up1 = (
        o.filter(F.col("o_orderkey") % (7 * _IVM_AMP * m) == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
        .withColumn("o_orderstatus", F.lit("U"))
    )
    write_delta(up1, tbl, "o_orderkey")
    up2 = (
        o.filter(F.col("o_orderkey") % (13 * _IVM_AMP * m) == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") - F.lit(500.0))
        .withColumn("o_orderstatus", F.lit("V"))
    )
    dels = o.filter(F.col("o_orderkey") % (11 * _IVM_AMP * m) == 0) \
        .select("o_orderkey")
    write_delta(up2, tbl, "o_orderkey", delete_keys=dels)
    group_agg(o, "o_custkey", "o_totalprice") \
        .write.mode("overwrite").parquet(view)
    with open(marker, "w") as fh:
        fh.write("1")
    return tbl, view


def run_ivm_refresh_fixed_delta(spark, sf_dir, m):
    from geomesa_hive_spark.sources.incremental import incremental_group_agg

    tbl, view = _ivm_setup(spark, sf_dir, m)
    agg0 = spark.read.parquet(view)
    return incremental_group_agg(
        spark, tbl, "o_orderkey", "o_custkey", "o_totalprice",
        agg0, 0, 2,
    )


def run_ivm_full_refresh_control(spark, sf_dir, m):
    from geomesa_hive_spark.sources.incremental import group_agg
    from geomesa_hive_spark.sources.manifest import read_snapshot

    tbl, _ = _ivm_setup(spark, sf_dir, m)
    return group_agg(
        read_snapshot(spark, tbl, "o_orderkey"),
        "o_custkey", "o_totalprice",
    )


def _stream_ivm_setup(spark, sf_dir, m):
    """Templates for the STREAMING composition rows (round 11, VERDICT
    r10 #9: stream_cdc_ivm's bench number is orchestration-dominated —
    these rows separate the fixed streaming-cycle overhead from the
    per-delta cost with a measured slope each).

    Built once per dataset: the amplified MOR table from
    :func:`_ivm_setup` (2 pending commits, delta held CONSTANT across m
    via ×m moduli), a PRISTINE seq-0 view state (so the timed runner
    never pays the bootstrap full-aggregate), and a DRAINED state whose
    checkpoint has already consumed every commit (the zero-delta
    control)."""
    from geomesa_hive_spark.sources.incremental import (
        _store_ivm_state, group_agg, maintain_group_agg_stream,
    )
    from geomesa_hive_spark.sources.manifest import read_snapshot

    tbl, _ = _ivm_setup(spark, sf_dir, m)
    root = os.path.join(sf_dir, "_stream_ivm_runner")
    pristine = os.path.join(root, "view_seq0")
    drained = os.path.join(root, "view_drained")
    marker = os.path.join(root, "_built")
    if os.path.exists(marker):
        return tbl, pristine, drained
    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(pristine)
    group_agg(
        read_snapshot(spark, tbl, "o_orderkey", as_of_seq=0),
        "o_custkey", "o_totalprice",
    ).write.mode("overwrite").parquet(os.path.join(pristine, "agg_0"))
    _store_ivm_state(pristine, {"seq": 0, "data": "agg_0"})
    shutil.copytree(pristine, drained)
    rep = maintain_group_agg_stream(
        spark, tbl, "o_orderkey", "o_custkey", "o_totalprice", drained
    )
    assert rep["batches"] >= 1, rep
    with open(marker, "w") as fh:
        fh.write("1")
    return tbl, pristine, drained


def run_stream_ivm_cycle(spark, sf_dir, m):
    """One full availableNow CDC→IVM cycle from a pristine seq-0 state:
    fixed stream start/stop + the delta-sized roll-forward (delta
    constant across m; the pre-image semi-join's base-scan input is the
    only m-proportional term, same as ivm_refresh_fixed_delta)."""
    import tempfile

    from geomesa_hive_spark.sources.incremental import (
        maintain_group_agg_stream, read_maintained_view,
    )

    tbl, pristine, _ = _stream_ivm_setup(spark, sf_dir, m)
    tmp = tempfile.mkdtemp(prefix="ghs_sivm_slope_")
    shutil.rmtree(tmp)
    shutil.copytree(pristine, tmp)
    rep = maintain_group_agg_stream(
        spark, tbl, "o_orderkey", "o_custkey", "o_totalprice", tmp
    )
    assert rep["batches"] >= 1, rep
    return read_maintained_view(spark, tmp)


def run_stream_ivm_cycle_overhead(spark, sf_dir, m):
    """The zero-delta control: an availableNow cycle whose checkpoint
    has already consumed every commit — processes NOTHING, so the wall
    time IS the fixed streaming orchestration (start, offset check,
    stop). Flat across m by construction; the difference to
    run_stream_ivm_cycle is the per-delta cost."""
    import tempfile

    from geomesa_hive_spark.sources.incremental import (
        maintain_group_agg_stream, read_maintained_view,
    )

    tbl, _, drained = _stream_ivm_setup(spark, sf_dir, m)
    tmp = tempfile.mkdtemp(prefix="ghs_sivm_slope0_")
    shutil.rmtree(tmp)
    shutil.copytree(drained, tmp)
    rep = maintain_group_agg_stream(
        spark, tbl, "o_orderkey", "o_custkey", "o_totalprice", tmp
    )
    assert rep["batches"] == 0, rep
    return read_maintained_view(spark, tmp)


CUSTOM = {
    "spatial_distance_join": run_spatial_distance_join,
    "spatial_distance_join_sphere": run_spatial_distance_join_sphere,
    "spatial_dbscan": run_spatial_dbscan,
    "spatial_hausdorff": run_spatial_hausdorff,
    "spatial_window_read": run_spatial_window_read,
    "manifest_window_count": run_manifest_window_count,
    "bm25_positions_build": run_bm25_positions_build,
    "manifest_zorder": run_manifest_zorder,
    "manifest_bloom": run_manifest_bloom,
    "ivm_refresh_fixed_delta": run_ivm_refresh_fixed_delta,
    "ivm_full_refresh_control": run_ivm_full_refresh_control,
    "stream_ivm_cycle": run_stream_ivm_cycle,
    "stream_ivm_cycle_overhead": run_stream_ivm_cycle_overhead,
}

# gate queries that scale with their tables — reused verbatim
GATE = [
    "dedup_minhash_lsh", "dedup_index", "bm25_index", "knn_ivfpq",
    "entity_link", "mor_merge", "mor_tpch_refresh",
    # round-10 index lifecycles: build+append+maintain+query verbatim —
    # the maintain rewrite is corpus-proportional by design, so these
    # pin that the WHOLE lifecycle stays linear, not just the build
    "dedup_index_upsert", "bm25_index_delete",
    # round-13: positional index build+phrase-query verbatim — the
    # positions dataset is Σ token-count rows, the largest artifact the
    # BM25 family writes, so its build linearity is the claim to pin
    # (the phrase itself only matches copy 0 of the letter-permuted
    # corpus, so the query stage is sublinear by construction — build
    # dominates the gate)
    "bm25_index_phrase",
    "entity_resolve", "manifest_ndv",
    # round-8 coverage extension: the broader pipeline families
    "dedup_clusters", "curation_pipeline", "text_keywords", "bpe_train",
    "graph_pagerank",
    # relational representatives (pure Spark SQL — scan-agg, join-heavy,
    # multi-join): Catalyst's scaling measured, not assumed
    "tpch_q1", "tpch_q10", "tpch_q21",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of operator names")
    ap.add_argument("--rebuild", action="store_true",
                    help="rebuild the synthetic datasets")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--m-big", type=int, default=10,
                    help="scale multiplier for the big point (default "
                         "10; use 30 for a third-point check)")
    args = ap.parse_args()
    global M_BIG
    M_BIG = int(args.m_big)

    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ghs-scale-slope")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    dirs = {}
    for m in (1, M_BIG):
        d = os.path.join(WORK, f"m{m}")
        marker = os.path.join(d, "_built.json")
        if args.rebuild and os.path.exists(d):
            shutil.rmtree(d)
        if not os.path.exists(marker):
            print(f"# building m={m} at {d} ...", file=sys.stderr)
            t0 = time.time()
            build_scaled(spark, SRC, d, m)
            with open(marker, "w") as fh:
                json.dump({"m": m, "src": SRC}, fh)
            print(f"# built in {time.time()-t0:.1f}s", file=sys.stderr)
        dirs[m] = d

    qs = E.queries()
    names = GATE + list(CUSTOM)
    if args.only:
        only = set(args.only.split(","))
        names = [n for n in names if n in only]

    def _isolate():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)

    # warm up workers once (same rationale as bench.py)
    from pyspark.sql import functions as F

    from geomesa_hive_spark.functions.registry import register_all

    register_all(spark)
    spark.range(int(cpus) * 10000).repartition(int(cpus)).select(
        F.call_function("st_astext", F.call_function(
            "st_makepoint", F.col("id").cast("double"), F.lit(2.0)))
    ).count()

    results = {}
    for name in names:
        row = {}
        for m in (1, M_BIG):
            best, rows = -1.0, -1
            for _ in range(args.trials):
                try:
                    t0 = time.time()
                    if name in CUSTOM:
                        rows = CUSTOM[name](spark, dirs[m], m).count()
                    else:
                        rows = qs[name](spark, dirs[m]).count()
                    el = round(time.time() - t0, 3)
                    best = el if best < 0 else min(best, el)
                except Exception as exc:
                    print(f"# {name} m={m} FAILED: "
                          f"{type(exc).__name__}: {exc}", file=sys.stderr)
                _isolate()
            row[f"t_m{m}"] = best
            row[f"rows_m{m}"] = rows
        if row["t_m1"] > 0 and row[f"t_m{M_BIG}"] > 0:
            row["slope"] = round(row[f"t_m{M_BIG}"] / row["t_m1"], 2)
            row["verdict"] = (
                "linear" if row["slope"] <= 12.0
                else "amortizing" if row["slope"] <= 15.0
                else "SUPER-LINEAR"
            )
        results[name] = row
        print(f"# {name}: m1={row['t_m1']}s ({row['rows_m1']} rows)  "
              f"m{M_BIG}={row[f't_m{M_BIG}']}s ({row[f'rows_m{M_BIG}']} "
              f"rows)  slope={row.get('slope')} {row.get('verdict','')}",
              file=sys.stderr)

    payload = {
        "protocol": (
            f"m=1 vs m={M_BIG} locally-synthesized datasets (same builder, "
            f"same layout); table ops reuse the gate queries verbatim on "
            f"key-offset content-distinct copies; spatial ops use constant-"
            f"density runners (n×m, domain area ×m). best of "
            f"{args.trials} isolated trials per point. slope = "
            f"t(m{M_BIG})/t(m1); data grows ×{M_BIG}, so linear ≈ "
            f"{M_BIG} and anything >15 is super-linear."
        ),
        "src": SRC,
        "results": results,
    }
    # non-default big points get their own artifact so a third-point
    # run never clobbers the standing m=10 record; a --only SUBSET run
    # MERGES into the existing artifact instead of clobbering the other
    # operators' rows (same rule as check_contract's subset guard)
    art = ("SCALE_SLOPE.json" if M_BIG == 10
           else f"SCALE_SLOPE_m{M_BIG}.json")
    art_path = os.path.join(REPO, art)
    if args.only and os.path.exists(art_path):
        with open(art_path) as fh:
            prev = json.loads(fh.readline())
        merged = dict(prev.get("results", {}))
        merged.update(results)
        payload["results"] = merged
    line = json.dumps(payload)
    print(line)
    with open(art_path, "w") as fh:
        fh.write(line + "\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
