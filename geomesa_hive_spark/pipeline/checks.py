"""Declarative data-quality constraint validation — the Deequ /
Great-Expectations pattern as ONE Spark aggregate: every constraint
compiles to a conditional-count expression and the whole suite runs in
a single scan of the table (plan-asserted in pytest), then the one
result row is unpivoted driver-free with ``stack`` into a tidy
(name, kind, col, violations, n_rows, passed) report.

Why single-scan matters at 100 TB: a naive checker runs one job per
constraint — 20 constraints = 20 full table scans. Compiling them into
one aggregate costs exactly one scan regardless of suite size; even
``unique`` fits, because count(col) − count(DISTINCT col) is an
aggregate pair, not a self-join (Spark plans the distinct via Expand —
more rows through the ONE shuffle, still one source scan).

Constraint kinds (each a dict in the ``constraints`` list):

- ``{"kind": "not_null", "col": c}`` — violations = rows with NULL c.
- ``{"kind": "unique", "col": c}`` — violations = non-null rows minus
  distinct non-null values (0 ⇔ no duplicated value; NULLs are the
  not_null constraint's job, mirroring SQL UNIQUE).
- ``{"kind": "range", "col": c, "lo": x, "hi": y}`` — violations =
  non-null rows outside [lo, hi] (bounds optional, either side).
- ``{"kind": "in_set", "col": c, "values": [...]}`` — non-null rows
  whose value is not in the set.
- ``{"kind": "regex", "col": c, "pattern": p}`` — non-null rows not
  matching the (RE2-portable) pattern.
- ``{"kind": "custom", "expr": sql}`` — rows where the boolean SQL
  expression is not TRUE (NULL counts as a violation: an assertion
  that cannot be evaluated did not hold).

Each may carry ``"name"``; default is ``<kind>_<col>``.

Reference scope: the reference has no data-quality surface; this is
the pipeline extension (training corpora live or die by these checks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check_constraints"]


def _violations(c: dict) -> Column:
    kind = c["kind"]
    if kind == "not_null":
        return F.count(F.when(F.col(c["col"]).isNull(), 1))
    if kind == "unique":
        return F.count(F.col(c["col"])) - F.countDistinct(F.col(c["col"]))
    if kind == "range":
        col, bad = F.col(c["col"]), F.lit(False)
        if "lo" in c:
            bad = bad | (col < F.lit(c["lo"]))
        if "hi" in c:
            bad = bad | (col > F.lit(c["hi"]))
        return F.count(F.when(bad, 1))
    if kind == "in_set":
        return F.count(
            F.when(
                F.col(c["col"]).isNotNull()
                & ~F.col(c["col"]).isin(list(c["values"])), 1,
            )
        )
    if kind == "regex":
        return F.count(
            F.when(
                F.col(c["col"]).isNotNull()
                & ~F.col(c["col"]).rlike(c["pattern"]), 1,
            )
        )
    if kind == "custom":
        return F.count(F.when(~F.coalesce(F.expr(c["expr"]), F.lit(False)), 1))
    raise ValueError(f"unknown constraint kind {kind!r}")


def check_constraints(df: DataFrame, constraints: list[dict]) -> DataFrame:
    """Validate ``constraints`` against ``df`` in one aggregate scan.

    Returns a DataFrame (name, kind, col, violations, n_rows, passed)
    with one row per constraint; ``passed`` is 1 when violations == 0.
    """
    if not constraints:
        raise ValueError("empty constraint list")
    names = []
    for c in constraints:
        name = c.get("name") or f"{c['kind']}_{c.get('col', 'expr')}"
        if name in names:
            raise ValueError(f"duplicate constraint name {name!r}")
        names.append(name)
    aggs = [
        _violations(c).cast("long").alias(f"__v{i}")
        for i, c in enumerate(constraints)
    ]
    aggs.append(F.count("*").cast("long").alias("__n"))
    one = df.agg(*aggs)
    # unpivot the single row: stack(k, name, kind, col, v_i, ...) — no
    # collect, the report stays a (tiny) DataFrame
    parts = []
    for i, (c, name) in enumerate(zip(constraints, names)):
        parts += [
            F.lit(name), F.lit(c["kind"]), F.lit(c.get("col", "")),
            F.col(f"__v{i}"),
        ]
    stacked = one.select(
        F.stack(
            F.lit(len(constraints)), *parts
        ).alias("name", "kind", "col", "violations"),
        F.col("__n").alias("n_rows"),
    )
    return stacked.withColumn(
        "passed", F.when(F.col("violations") == 0, 1).otherwise(0).cast("int")
    )
