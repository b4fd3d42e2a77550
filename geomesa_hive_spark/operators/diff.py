"""Keyed table diff — the snapshot-comparison primitive behind CDC
validation, migration sign-off, and MOR-compaction audits ("did the
rewrite change anything?"): classify every key as added / removed /
changed / unchanged between two table versions and name the columns
that changed.

Shape: ONE full outer join on the key (co-partitioned shuffle both
sides — at 100 TB this is the one unavoidable movement, and bucketed
tables make it a zero-shuffle sort-merge), then pure native
expressions: presence flags from key nullness, per-column null-safe
equality (``<=>`` — NULL↔NULL is unchanged, NULL↔value is a change),
and the changed-column list assembled with ``filter`` over a struct
array so the whole classification runs in whole-stage codegen. No
UDFs, no second pass, no per-column joins.

Reference scope: the reference has no table utilities at all; this is
part of the beyond-reference operational battery (with
manifest/compact/MOR in sources/manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["table_diff"]


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str] | str,
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff ``new`` against ``old`` by key.

    Returns (key..., change, changed_cols) where ``change`` ∈
    {'added', 'removed', 'changed', 'unchanged'} ('unchanged' rows are
    dropped unless ``include_unchanged``) and ``changed_cols`` is the
    sorted array of differing column names (empty for added/removed —
    there is no counterpart to compare against).

    ``compare_cols`` defaults to every shared non-key column; a
    compare column missing from either side raises (comparing against
    nothing would silently report 'unchanged')."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    else:
        missing = [
            c for c in compare_cols
            if c not in old.columns or c not in new.columns
        ]
        if missing:
            raise ValueError(f"compare columns missing from a side: {missing}")
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__o_present"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__n_present"),
    )
    # eqNullSafe (<=>) so a NULL key matches a NULL key — Spark still
    # plans a null-safe equi-join (shuffled hash / sort-merge), not a
    # cartesian. Presence comes from explicit flags, not key nullness:
    # once NULL keys are legal, key-isNotNull can't signal "row exists".
    cond = None
    for k in keys:
        c = F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    in_old = F.col("__o_present").isNotNull()
    in_new = F.col("__n_present").isNotNull()
    diffs = F.array_sort(
        F.filter(
            F.array(*[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                    F.lit(c),
                )
                for c in compare_cols
            ]),
            lambda x: x.isNotNull(),
        )
    )
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
            for k in keys
        ],
        change.alias("change"),
        F.when(
            in_old & in_new, diffs
        ).otherwise(F.array().cast("array<string>")).alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out
