"""Entity resolution / record linkage at corpus scale.

Match records of registry B to registry A by edit distance without the
O(|A|x|B|) cross join: **deletion-neighborhood blocking** (the FastSS
scheme, Bocek et al. 2007). For edit distance <= 1, two strings always
share a member of each other's deletion neighborhood (the string itself
plus every single-character deletion):

- equal strings share the string itself;
- a substitution at position i makes both deletion-at-i variants equal;
- an insertion/deletion makes one string equal to a deletion variant of
  the other.

So ONE equi-join on the exploded variant column finds every candidate
pair — blocking is *provably complete* at k=1, not a recall heuristic,
which is why the contract oracle can be a brute-force cross join with
`levenshtein` and still hash-match. Candidates are verified with the
built-in `levenshtein` (same DP definition in Spark and DuckDB) and the
best match per B record is a (distance, a_id) window — deterministic
tie-break.

Scale: the variant explode multiplies each record by (len+1) short
strings; the join shuffle carries (variant, id) rows — ~L times the
registry, never |A|x|B|. Hot variants (very common names) are plain
equi-join skew, AQE-split. The k=1 bound is structural: k=2 needs
two-deletion neighborhoods (O(L^2) variants/record) — documented, not
silently extended.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["deletion_variants", "link_records"]


def deletion_variants(col) -> Column:
    """Array of the string itself plus every single-character deletion."""
    s = col if isinstance(col, Column) else F.col(col)
    L = F.length(s)
    dels = F.when(
        L >= 1,
        F.transform(
            F.sequence(F.lit(1), L),
            lambda i: F.concat(s.substr(F.lit(1), i - 1), s.substr(i + 1, L)),
        ),
    ).otherwise(F.array())
    return F.concat(F.array(s), dels)


def link_records(
    a: DataFrame,
    b: DataFrame,
    a_id: str,
    a_name: str,
    b_id: str,
    b_name: str,
) -> DataFrame:
    """Best edit-distance<=1 match in A for every B record that has one:
    (b_id, a_id, dist), deterministically tie-broken by (dist, a_id).
    Unmatched B records produce no row (inner semantics)."""
    av = a.select(
        F.col(a_id).alias("_aid"),
        F.col(a_name).alias("_an"),
        F.explode(deletion_variants(a_name)).alias("_v"),
    )
    bv = b.select(
        F.col(b_id).alias("_bid"),
        F.col(b_name).alias("_bn"),
        F.explode(deletion_variants(b_name)).alias("_v"),
    )
    cand = (
        bv.join(av, "_v")
        .select("_bid", "_bn", "_aid", "_an")
        .distinct()  # a pair can share several variants
        .withColumn("_d", F.levenshtein("_bn", "_an"))
        .filter(F.col("_d") <= 1)
    )
    w = Window.partitionBy("_bid").orderBy(F.asc("_d"), F.asc("_aid"))
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            F.col("_bid").alias(b_id),
            F.col("_aid").alias(a_id),
            F.col("_d").cast("int").alias("dist"),
        )
    )
