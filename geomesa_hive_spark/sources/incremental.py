"""Incremental materialized-view maintenance over the MOR table — the
canonical CDC consumer (Delta Live Tables / Materialize / classic IVM):
keep a grouped aggregate in sync with a changing base table WITHOUT
re-aggregating the table.

A full refresh of `SELECT group, count(*), sum(v) FROM t GROUP BY group`
shuffles the entire table every time — at 100 TB that is the whole
corpus through the exchange to update counts a handful of upserts
touched. Sum/count aggregates are self-maintainable: for the keys that
changed between two versions, SUBTRACT their contribution at the old
version and ADD their contribution at the new one; groups nobody
touched are never read, never shuffled, never rewritten.

Cost shape per refresh: the CDC pull (delta-sized window + one
broadcast semi-join against the base scan, see
:func:`~geomesa_hive_spark.sources.manifest.read_changes`) + one more
`snapshot@from ⋉ broadcast(changed keys)` for the pre-images (the MOR
commit log stores post-images only — Delta's CDF materializes
preimage rows at write time to skip this scan; that trade is noted, not
hidden) + an adjustment aggregate over O(changed) rows + a join against
the stored aggregate, which is |groups|-sized, not table-sized.

Only distributive/algebraic aggregates (count, sum — and avg as
sum/count) maintain with changed rows alone. min/max are NOT
self-maintainable under deletion: removing the stored extreme needs a
rescan to find the runner-up. :func:`incremental_group_agg_minmax`
(round 11) supports them with the standard rescan-on-eviction
fallback — the rescan is per-EVICTED-GROUP (a broadcast semi-join cut
of the snapshot), never the whole table, and fires only when a removed
pre-image value equals the stored extreme and no post-image re-covers
it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geomesa_hive_spark.sources.manifest import read_changes, read_snapshot

__all__ = [
    "group_agg", "group_agg_minmax", "incremental_group_agg",
    "incremental_group_agg_minmax", "incremental_join",
    "incremental_projection", "join_view",
    "maintain_group_agg_stream", "read_maintained_view",
    "quantile_sketch_view", "incremental_quantile_sketch",
]


def group_agg(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """The maintained view's defining query: per-group row count and
    decimal-exact value sum (decimal so incremental add/subtract is
    associative-exact — double accumulation drifts under reordering,
    which would make 'incremental equals full refresh' false at the
    bit level)."""
    return df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("total"),
    )


def incremental_group_agg(
    spark: SparkSession,
    path: str,
    key_col: str,
    group_col: str,
    value_col: str,
    agg_at_from: DataFrame,
    from_seq: int,
    to_seq: int | None = None,
) -> DataFrame:
    """Roll the stored aggregate ``agg_at_from`` (the view's state at
    ``from_seq``, schema = :func:`group_agg`) forward to ``to_seq``
    using only the rows that changed in between.

    Correctness argument (why net CDC suffices): for each changed key,
    its pre-image row (if it existed at ``from_seq``) contributes
    (-1, -value) to its old group and its post-image (unless deleted)
    contributes (+1, +value) to its new group; unchanged keys cancel
    out of the algebra entirely. Group moves (a key whose group column
    changed) are handled for free — the subtraction hits the old
    group, the addition the new one. Groups whose count reaches zero
    are dropped, so the maintained view never accretes tombstone rows.

    The contract gate hash-compares the maintained view against a full
    recompute of the resolved snapshot — equality is exact, not
    approximate, because the arithmetic is decimal."""
    changes = read_changes(spark, path, key_col, from_seq, to_seq)
    changed_keys = changes.select(key_col).distinct()
    pre = (
        read_snapshot(spark, path, key_col, as_of_seq=from_seq)
        .join(F.broadcast(changed_keys), key_col, "left_semi")
    )
    neg = pre.select(
        F.col(group_col),
        F.lit(-1).cast("long").alias("d_cnt"),
        (-F.col(value_col).cast("decimal(18,2)")).alias("d_total"),
    )
    pos = changes.filter(F.col("_change_type") != "delete").select(
        F.col(group_col),
        F.lit(1).cast("long").alias("d_cnt"),
        F.col(value_col).cast("decimal(18,2)").alias("d_total"),
    )
    adj = (
        neg.unionByName(pos)
        .groupBy(group_col)
        .agg(
            F.sum("d_cnt").alias("d_cnt"),
            F.sum("d_total").alias("d_total"),
        )
    )
    # null-safe on the group key: a NULL group must match itself or the
    # view would carry duplicate NULL-group rows (same class of bug as
    # the round-6 table_diff advice finding)
    a, d = agg_at_from.alias("a"), adj.alias("d")
    merged = a.join(
        d, F.col(f"a.{group_col}").eqNullSafe(F.col(f"d.{group_col}")),
        "full_outer",
    ).select(
        F.coalesce(F.col(f"a.{group_col}"), F.col(f"d.{group_col}"))
        .alias(group_col),
        (F.coalesce(F.col("a.cnt"), F.lit(0))
         + F.coalesce(F.col("d.d_cnt"), F.lit(0))).cast("long").alias("cnt"),
        (F.coalesce(F.col("a.total"), F.lit(0).cast("decimal(18,2)"))
         + F.coalesce(F.col("d.d_total"), F.lit(0).cast("decimal(18,2)")))
        .cast("decimal(18,2)").alias("total"),
    )
    return merged.filter(F.col("cnt") > 0)


def group_agg_minmax(df: DataFrame, group_col: str,
                     value_col: str) -> DataFrame:
    """Defining query of the min/max-bearing view: per-group row count,
    decimal-exact sum, and decimal min/max of the value (decimal so the
    'incremental ≡ full refresh' comparison is bit-exact, as in
    :func:`group_agg`)."""
    v = F.col(value_col).cast("decimal(18,2)")
    return df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum(v).alias("total"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
    )


def incremental_group_agg_minmax(
    spark: SparkSession,
    path: str,
    key_col: str,
    group_col: str,
    value_col: str,
    agg_at_from: DataFrame,
    from_seq: int,
    to_seq: int | None = None,
    rescan_report: dict | None = None,
) -> DataFrame:
    """Roll a count/sum/MIN/MAX view forward from CDC — round-10
    verdict item 6, lifting the min/max restriction the module
    docstring used to declare out of scope.

    count/sum maintain exactly as :func:`incremental_group_agg`
    (subtract pre-images, add post-images). min/max are not
    self-maintainable under deletion, so the standard IVM fallback
    applies, scoped as tightly as the algebra allows:

    - **No eviction** (no removed pre-image value equals the stored
      extreme): the surviving old rows still attain the stored
      extreme, so ``new_mn = least(stored_mn, pos_mn)`` (resp.
      ``greatest`` for max) — changed rows only, zero rescans.
    - **Eviction** (some removed value == stored extreme) that a
      post-image does not re-cover (no new value ≤ stored min /
      ≥ stored max): the runner-up is unknowable from the view, so
      THAT GROUP's rows at ``to_seq`` are rescanned exactly — a
      broadcast semi-join cut of the snapshot on the group column,
      O(rows of evicted groups), never the table. Duplicate extremes
      conservatively rescan (removing one of two equal minima cannot
      be disambiguated from the view).

    ``rescan_report`` (filled in place when passed) records
    ``groups_rescanned`` so callers — and the contract gate — can
    assert the eviction path actually fired (or didn't). The result
    equals :func:`group_agg_minmax` over the resolved snapshot
    bit-exactly (decimal arithmetic; hash-verified by the gate)."""
    changes = read_changes(spark, path, key_col, from_seq, to_seq)
    changed_keys = changes.select(key_col).distinct()
    pre = (
        read_snapshot(spark, path, key_col, as_of_seq=from_seq)
        .join(F.broadcast(changed_keys), key_col, "left_semi")
    )
    v = F.col(value_col).cast("decimal(18,2)")
    neg = pre.select(
        F.col(group_col),
        F.lit(-1).cast("long").alias("d_cnt"),
        (-v).alias("d_total"),
        v.alias("pv"),
        F.lit("pre").alias("side"),
    )
    pos = changes.filter(F.col("_change_type") != "delete").select(
        F.col(group_col),
        F.lit(1).cast("long").alias("d_cnt"),
        v.alias("d_total"),
        v.alias("pv"),
        F.lit("pos").alias("side"),
    )
    adj = (
        neg.unionByName(pos)
        .groupBy(group_col)
        .agg(
            F.sum("d_cnt").alias("d_cnt"),
            F.sum("d_total").alias("d_total"),
            F.min(F.when(F.col("side") == "pre", F.col("pv"))).alias("pre_mn"),
            F.max(F.when(F.col("side") == "pre", F.col("pv"))).alias("pre_mx"),
            F.min(F.when(F.col("side") == "pos", F.col("pv"))).alias("pos_mn"),
            F.max(F.when(F.col("side") == "pos", F.col("pv"))).alias("pos_mx"),
        )
    )
    a, d = agg_at_from.alias("a"), adj.alias("d")
    amn, amx = F.col("a.mn"), F.col("a.mx")
    pre_mn, pre_mx = F.col("d.pre_mn"), F.col("d.pre_mx")
    pos_mn, pos_mx = F.col("d.pos_mn"), F.col("d.pos_mx")
    # eviction: a removed value attains the stored extreme AND no
    # post-image re-covers it. NULL-valued rows never evict (min/max
    # ignore NULLs, so pre_mn/pre_mx are NULL-free by construction).
    evict_min = (
        pre_mn.isNotNull() & amn.isNotNull() & (pre_mn == amn)
        & (pos_mn.isNull() | (pos_mn > amn))
    )
    evict_max = (
        pre_mx.isNotNull() & amx.isNotNull() & (pre_mx == amx)
        & (pos_mx.isNull() | (pos_mx < amx))
    )
    merged = a.join(
        d, F.col(f"a.{group_col}").eqNullSafe(F.col(f"d.{group_col}")),
        "full_outer",
    ).select(
        F.coalesce(F.col(f"a.{group_col}"), F.col(f"d.{group_col}"))
        .alias(group_col),
        (F.coalesce(F.col("a.cnt"), F.lit(0))
         + F.coalesce(F.col("d.d_cnt"), F.lit(0))).cast("long").alias("cnt"),
        (F.coalesce(F.col("a.total"), F.lit(0).cast("decimal(18,2)"))
         + F.coalesce(F.col("d.d_total"), F.lit(0).cast("decimal(18,2)")))
        .cast("decimal(18,2)").alias("total"),
        # no-eviction derivation: surviving old rows still attain the
        # stored extreme, so only the post-images can improve on it
        F.least(amn, pos_mn).alias("der_mn"),
        F.greatest(amx, pos_mx).alias("der_mx"),
        (F.coalesce(evict_min, F.lit(False))
         | F.coalesce(evict_max, F.lit(False))).alias("__rescan"),
    ).filter(F.col("cnt") > 0)
    # the rescan branch and the final result both consume `merged`;
    # localCheckpoint so the CDC chain is not re-derived twice
    merged = merged.localCheckpoint()
    rescan_groups = merged.filter(F.col("__rescan")).select(group_col)
    if rescan_report is not None:
        rescan_report["groups_rescanned"] = rescan_groups.count()
    snap_to = read_snapshot(spark, path, key_col, as_of_seq=to_seq)
    rg = rescan_groups.alias("rg")
    exact = (
        snap_to.alias("s").join(
            F.broadcast(rg),
            F.col(f"s.{group_col}").eqNullSafe(F.col(f"rg.{group_col}")),
            "left_semi",
        )
        .groupBy(group_col)
        .agg(
            F.min(F.col(value_col).cast("decimal(18,2)")).alias("x_mn"),
            F.max(F.col(value_col).cast("decimal(18,2)")).alias("x_mx"),
        )
    )
    m, e = merged.alias("m"), exact.alias("e")
    return m.join(
        e, F.col(f"m.{group_col}").eqNullSafe(F.col(f"e.{group_col}")),
        "left_outer",
    ).select(
        F.col(f"m.{group_col}").alias(group_col),
        F.col("m.cnt").alias("cnt"),
        F.col("m.total").alias("total"),
        F.when(F.col("m.__rescan"), F.col("e.x_mn"))
        .otherwise(F.col("m.der_mn")).alias("mn"),
        F.when(F.col("m.__rescan"), F.col("e.x_mx"))
        .otherwise(F.col("m.der_mx")).alias("mx"),
    )


def incremental_projection(
    spark: SparkSession,
    path: str,
    key_col: str,
    proj_at_from: DataFrame,
    from_seq: int,
    to_seq: int | None = None,
) -> DataFrame:
    """Roll a stored PROJECTION of the table (any column subset that
    includes the key — the shape of a secondary index: (value, key)
    rows, or a serving extract) forward from ``from_seq`` to
    ``to_seq`` using changed rows only. This is the other half of
    incremental view maintenance: :func:`incremental_group_agg`
    covers aggregates, this covers row-level derived tables, and
    together they make the CDC feed a complete substrate for keeping
    downstream artifacts in sync without table rescans.

    Algebra: drop the changed keys' old rows (one anti-join against
    the BROADCAST changed-key set — the stored projection never
    shuffles), append the non-delete post-images projected to the
    stored columns. Cost per refresh: the CDC pull + O(changed)
    appended rows + a broadcast anti-join over the stored projection.
    The projection's columns must all exist in the table (post-images
    supply them); the key column must be among them or old rows could
    not be matched for removal."""
    cols = proj_at_from.columns
    if key_col not in cols:
        raise ValueError(
            f"projection must retain the key column {key_col!r} — "
            f"without it changed rows cannot be replaced"
        )
    changes = read_changes(spark, path, key_col, from_seq, to_seq)
    missing = [c for c in cols if c not in changes.columns]
    if missing:
        raise ValueError(
            f"projection column(s) {missing} not in the table schema"
        )
    changed_keys = changes.select(key_col).distinct()
    # the name-keyed anti-join moves the key column first; restore the
    # stored projection's column order — this rolls a table forward,
    # it must not reshape it
    kept = proj_at_from.join(
        F.broadcast(changed_keys), key_col, "left_anti"
    ).select(*cols)
    fresh = (
        changes.filter(F.col("_change_type") != "delete").select(*cols)
    )
    return kept.unionByName(fresh)


def join_view(a: DataFrame, b: DataFrame, on_a: str, on_b: str) -> DataFrame:
    """The maintained JOIN view's defining query: inner equijoin of two
    tables on ``a.on_a = b.on_b``, all columns of both sides kept. The
    two tables' column names must be disjoint (TPC-H-style prefixes) —
    the view is a plain flat table, so colliding names would make rows
    ambiguous to maintain."""
    dup = set(a.columns) & set(b.columns)
    if dup:
        raise ValueError(
            f"join view requires disjoint column names; shared: {sorted(dup)}"
        )
    return a.join(b, a[on_a] == b[on_b], "inner")


def incremental_join(
    spark: SparkSession,
    path_a: str,
    path_b: str,
    key_a: str,
    key_b: str,
    on_a: str,
    on_b: str,
    view_at_from: DataFrame,
    from_a: int,
    from_b: int,
    to_a: int | None = None,
    to_b: int | None = None,
) -> DataFrame:
    """Roll a stored JOIN view (schema = :func:`join_view`) forward
    from versions ``(from_a, from_b)`` of two MOR tables to
    ``(to_a, to_b)`` using changed rows only — join-view IVM, the
    third CDC consumer next to :func:`incremental_group_agg`
    (aggregates) and :func:`incremental_projection` (row-level
    extracts). A full refresh of ``A ⋈ B`` re-scans and re-shuffles
    BOTH tables; at 100 TB that is two corpus shuffles to refresh
    pairs a handful of upserts touched.

    Algebra (key-unique tables, the MOR contract): a view row
    ``(ra, rb)`` is stale iff ``ra``'s key changed in A or ``rb``'s
    key changed in B. So:

    1. ``kept``  = stored view minus changed A keys minus changed B
       keys — two BROADCAST anti-joins; the |view|-sized stored side
       never shuffles.
    2. ``fresh1`` = post-images of changed A rows ⋈ B@to — the
       delta-sized side is broadcast against one snapshot scan.
    3. ``fresh2`` = (A@to minus changed A keys) ⋈ post-images of
       changed B rows — the other snapshot scan, delta side again
       broadcast. Subtracting changed A keys here is what prevents
       double-counting pairs where BOTH sides changed (those pairs
       are already complete in ``fresh1``, because B@to contains
       B's post-images).

    Deleted rows fall out for free: their post-images don't exist, and
    their old pairs die in step 1. Join-column updates (a row whose
    ``on_a`` value moved to a different partner) are also free — the
    old pair is dropped by key in step 1 and the new pair is formed in
    step 2 against the current B.

    Cost per refresh: two CDC pulls (delta-sized) + two broadcast
    anti-joins over the stored view + one metadata-prunable snapshot
    scan per table joined against a broadcast delta. No full-table
    shuffle anywhere; the contract gate hash-compares the rolled view
    against a full recompute of both resolved snapshots."""
    view_cols = view_at_from.columns
    for need in (key_a, key_b, on_a, on_b):
        if need not in view_cols:
            raise ValueError(
                f"join view must retain column {need!r} (keys identify "
                f"stale pairs, join columns re-form fresh ones)"
            )
    changes_a = read_changes(spark, path_a, key_a, from_a, to_a)
    changes_b = read_changes(spark, path_b, key_b, from_b, to_b)
    ka = changes_a.select(key_a).distinct()
    kb = changes_b.select(key_b).distinct()
    kept = (
        view_at_from
        .join(F.broadcast(ka), key_a, "left_anti")
        .join(F.broadcast(kb), key_b, "left_anti")
        .select(*view_cols)
    )
    a_cols = [c for c in view_cols if c in changes_a.columns
              and c not in ("_change_type", "_commit_seq")]
    b_cols = [c for c in view_cols if c in changes_b.columns
              and c not in ("_change_type", "_commit_seq")]
    post_a = (
        changes_a.filter(F.col("_change_type") != "delete").select(*a_cols)
    )
    post_b = (
        changes_b.filter(F.col("_change_type") != "delete").select(*b_cols)
    )
    b_new = read_snapshot(spark, path_b, key_b, as_of_seq=to_b).select(*b_cols)
    a_new = (
        read_snapshot(spark, path_a, key_a, as_of_seq=to_a)
        .select(*a_cols)
        .join(F.broadcast(ka), key_a, "left_anti")
    )
    fresh1 = (
        F.broadcast(post_a)
        .join(b_new, post_a[on_a] == b_new[on_b], "inner")
        .select(*view_cols)
    )
    fresh2 = (
        a_new
        .join(F.broadcast(post_b), a_new[on_a] == post_b[on_b], "inner")
        .select(*view_cols)
    )
    return kept.unionByName(fresh1).unionByName(fresh2)


# ---------------------------------------------------------------------------
# Streaming CDC -> IVM composition (the Delta Live Tables pattern end-to-end)
# ---------------------------------------------------------------------------


def _ivm_state_path(view_dir: str) -> str:
    import os

    return os.path.join(view_dir, "_ivm_state.json")


def _load_ivm_state(view_dir: str) -> dict | None:
    import json
    import os

    p = _ivm_state_path(view_dir)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _store_ivm_state(view_dir: str, state: dict) -> None:
    """Atomic state swap (write temp + rename) — a crash mid-update
    leaves the previous state pointing at its intact snapshot dir."""
    import json
    import os

    p = _ivm_state_path(view_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, p)


def read_maintained_view(spark: SparkSession, view_dir: str) -> DataFrame:
    """The maintained view's CURRENT snapshot (what a serving layer
    reads between maintenance cycles)."""
    import os

    state = _load_ivm_state(view_dir)
    if state is None:
        raise ValueError(f"no maintained view at {view_dir}")
    return spark.read.parquet(os.path.join(view_dir, state["data"]))


def _batch_end_seq(checkpoint_dir: str, batch_id: int) -> int | None:
    """End commit seq of micro-batch ``batch_id``, read from the
    stream's OWN offset WAL: Structured Streaming durably writes
    ``offsets/<batch_id>`` BEFORE running the batch (the recovery
    contract), and the morlake CDC source's offset IS the commit seq
    (``{"seq": N}``). Reading it here costs one small file read where
    ``bdf.agg(max(_commit_seq))`` costs a full scan of the micro-batch
    through the Python data source (which has no column pruning) —
    the round-14 optimization note's stream_cdc_ivm item. This stays
    inside the stream's offset range (never out-of-band table state),
    so replay detection is unchanged.

    SINGLE-SOURCE streams only (round-14 advice): the WAL file is
    version line + metadata line + one offset line PER SOURCE, so the
    parse demands exactly three lines and returns None otherwise — a
    future multi-source reuse degrades to the batch scan instead of
    silently reading the wrong source's offset. Returns None on any
    parse surprise; callers fall back to aggregating the batch."""
    import json
    import os

    p = os.path.join(checkpoint_dir, "offsets", str(batch_id))
    try:
        with open(p) as fh:
            lines = [ln.strip() for ln in fh if ln.strip()]
        if len(lines) != 3:
            return None
        off = json.loads(lines[-1])
        # Python-source offsets may arrive JSON-encoded one level deep
        while isinstance(off, str):
            off = json.loads(off)
        if isinstance(off, dict) and "seq" in off:
            return int(off["seq"])
        return None
    except Exception:
        return None


def maintain_group_agg_stream(
    spark: SparkSession,
    path: str,
    key_col: str,
    group_col: str,
    value_col: str,
    view_dir: str,
    checkpoint_dir: str | None = None,
    timeout_s: int = 180,
) -> dict:
    """One availableNow maintenance cycle of the DLT pattern END TO END
    (VERDICT r9 item 7): a morlake CDC readStream drives foreachBatch
    incremental view maintenance, so the stored per-group count+sum
    view rolls forward exactly — stream-as-trigger, seq-as-watermark.

    Composition: the stream's offsets ARE commit seqs, so each
    micro-batch carries a contiguous seq range. foreachBatch takes the
    batch's max ``_commit_seq`` and rolls the stored view forward with
    :func:`incremental_group_agg` over (stored_seq, batch_max] — the
    single verified IVM code path; the batch rows themselves are the
    same actions ``read_changes`` nets, so using the seq-ranged pull
    changes no arithmetic and makes REPLAYED batches trivially
    idempotent (``batch_max <= stored_seq`` -> skip). A restarted query
    on the same checkpoint re-reads no committed offsets, and even a
    lost checkpoint cannot corrupt the view: replay is detected from
    the view's own watermark.

    First call bootstraps the view at seq 0 (base only) from
    :func:`group_agg` over ``read_snapshot(as_of_seq=0)``. State lives
    in ``view_dir`` as versioned parquet snapshots plus an atomically
    swapped ``_ivm_state.json`` pointer — a crash mid-cycle leaves the
    previous version live.

    Returns a report: {"seq_before", "seq_after", "batches",
    "skipped_batches"} (batches = non-empty micro-batches that moved
    the view; skipped = replays detected and ignored).

    At 100 TB: each cycle's cost is the CDC pull (delta-sized) + one
    broadcast semi-join for pre-images + a |groups|-sized merge — the
    base table is never re-aggregated, and the stream trigger adds no
    data movement of its own (offsets are integers).
    """
    import os

    from geomesa_hive_spark.sources.datasource import MorDataSource

    os.makedirs(view_dir, exist_ok=True)
    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(view_dir, "_checkpoint")
    state = _load_ivm_state(view_dir)
    if state is None:
        view0 = group_agg(
            read_snapshot(spark, path, key_col, as_of_seq=0),
            group_col, value_col,
        )
        view0.write.mode("overwrite").parquet(
            os.path.join(view_dir, "agg_0"))
        state = {"seq": 0, "data": "agg_0"}
        _store_ivm_state(view_dir, state)
    seq_before = state["seq"]
    report = {"seq_before": seq_before, "batches": 0,
              "skipped_batches": 0}

    def _roll(bdf: DataFrame, batch_id: int) -> None:
        # common path: the batch's end seq comes from the offset WAL
        # (one file read, see _batch_end_seq) instead of a full scan of
        # the micro-batch through the Python source. The WAL end equals
        # max(_commit_seq) whenever the range carries rows; when it
        # does NOT exceed the stored watermark we fall back to the scan
        # so the empty-batch (return, uncounted) vs replayed-batch
        # (skipped_batches += 1) report semantics stay bit-exact.
        # VIEW-state semantics are unchanged unconditionally; the report
        # counters could diverge from the scan path only if a commit
        # carried zero CDC rows, and no writer can produce an empty
        # commit today (write_delta requires upserts or deletes;
        # merge_into and mor_sink skip empty batches) — round-14 advice.
        cur = _load_ivm_state(view_dir)
        hi = _batch_end_seq(checkpoint_dir, batch_id)
        if hi is None or hi <= cur["seq"]:
            hi = bdf.agg(F.max("_commit_seq")).collect()[0][0]
            if hi is None:
                return
            hi = int(hi)
        if hi <= cur["seq"]:
            report["skipped_batches"] += 1
            return
        stored = spark.read.parquet(os.path.join(view_dir, cur["data"]))
        rolled = incremental_group_agg(
            spark, path, key_col, group_col, value_col,
            stored, cur["seq"], hi,
        )
        dest = f"agg_{hi}"
        rolled.write.mode("overwrite").parquet(
            os.path.join(view_dir, dest))
        _store_ivm_state(view_dir, {"seq": hi, "data": dest})
        report["batches"] += 1

    spark.dataSource.register(MorDataSource)
    q = (
        spark.readStream.format("morlake")
        .option("path", path).option("mode", "cdc").load()
        .writeStream.foreachBatch(_roll)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    report["seq_after"] = _load_ivm_state(view_dir)["seq"]
    return report


def quantile_sketch_view(
    df: DataFrame, group_col: str, value_col: str,
    lo: float, hi: float, m: int = 128,
) -> DataFrame:
    """Defining query of the quantile-sketch view — per-group fixed-grid
    bucket counts (:func:`~geomesa_hive_spark.pipeline.sketches.
    quantile_sketch_build` with the group as the key). The stored state
    is ≤ groups × m rows whatever the table size, and any quantile set
    is extracted from it downstream (quantile_estimate) without
    touching the base table."""
    from geomesa_hive_spark.pipeline.sketches import quantile_sketch_build

    return quantile_sketch_build(df, [group_col], value_col, lo, hi, m)


def incremental_quantile_sketch(
    spark: SparkSession,
    path: str,
    key_col: str,
    group_col: str,
    value_col: str,
    sketch_at_from: DataFrame,
    from_seq: int,
    lo: float,
    hi: float,
    m: int = 128,
    to_seq: int | None = None,
) -> DataFrame:
    """Roll the stored quantile sketch forward from CDC — quantile IVM
    with NO rescan path at all: unlike min/max (which need
    rescan-on-eviction because the runner-up is unknown), grid bucket
    counts are FULLY invertible — a deleted pre-image subtracts 1 from
    its bucket, a post-image adds 1 to its (possibly different) bucket,
    and the merged counts are exactly the counts a full rebuild over
    the resolved snapshot would produce (integer arithmetic, the gate
    hash-pins it). This is the sketch-table philosophy meeting IVM:
    maintaining the O(groups·m) sketch is O(changed rows) per refresh,
    and every quantile query thereafter reads only the sketch.

    NULL values are excluded on both the pre- and post-image sides,
    matching the defining query's semantics; group moves and
    bucket moves (a repriced row crossing a grid line) are handled by
    the same subtract/add algebra; zeroed buckets are dropped so the
    view never accretes empty rows."""
    from geomesa_hive_spark.pipeline.sketches import _q_bucket

    changes = read_changes(spark, path, key_col, from_seq, to_seq)
    changed_keys = changes.select(key_col).distinct()
    pre = (
        read_snapshot(spark, path, key_col, as_of_seq=from_seq)
        .join(F.broadcast(changed_keys), key_col, "left_semi")
    )
    v = F.col(value_col)
    neg = pre.filter(v.isNotNull()).select(
        F.col(group_col),
        _q_bucket(v, lo, hi, m).alias("bucket"),
        F.lit(-1).cast("long").alias("d"),
    )
    pos = (
        changes.filter(F.col("_change_type") != "delete")
        .filter(v.isNotNull())
        .select(
            F.col(group_col),
            _q_bucket(v, lo, hi, m).alias("bucket"),
            F.lit(1).cast("long").alias("d"),
        )
    )
    adj = (
        neg.unionByName(pos)
        .groupBy(group_col, "bucket")
        .agg(F.sum("d").alias("d"))
    )
    a, d = sketch_at_from.alias("a"), adj.alias("d")
    merged = a.join(
        d,
        F.col(f"a.{group_col}").eqNullSafe(F.col(f"d.{group_col}"))
        & (F.col("a.bucket") == F.col("d.bucket")),
        "full_outer",
    ).select(
        F.coalesce(F.col(f"a.{group_col}"), F.col(f"d.{group_col}"))
        .alias(group_col),
        F.coalesce(F.col("a.bucket"), F.col("d.bucket")).alias("bucket"),
        (F.coalesce(F.col("a.cnt"), F.lit(0))
         + F.coalesce(F.col("d.d"), F.lit(0))).cast("long").alias("cnt"),
    )
    # a negative merged count can only arise from an inconsistent
    # (sketch_at_from, from_seq) pair — refuse loudly instead of
    # filtering it away as quiet data loss (repo convention: pre-gen
    # index layouts, vacuumed-era reads all raise). assert_true is
    # folded into the kept value so Catalyst cannot prune the check.
    guarded = F.when(
        F.assert_true(
            F.col("cnt") >= 0,
            F.concat(
                F.lit("incremental_quantile_sketch: negative merged "
                      "count — sketch_at_from does not match from_seq "
                      "(group="),
                F.col(group_col).cast("string"),
                F.lit(", bucket="), F.col("bucket").cast("string"),
                F.lit(")"),
            ),
        ).isNull(),
        F.col("cnt"),
    ).alias("cnt")
    merged = merged.select(group_col, "bucket", guarded)
    return merged.filter(F.col("cnt") > 0)
