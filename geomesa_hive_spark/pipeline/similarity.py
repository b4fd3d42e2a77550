"""Similarity search over embedding columns (``array<float>``).

- :func:`knn_brute` — exact cosine top-k against a query vector: native
  array expressions (zip_with/aggregate in float64), a single scan +
  ``orderBy limit k`` (Spark's TakeOrderedAndProject — no full sort).
  The correctness baseline.
- :func:`random_hyperplane_buckets` / :func:`knn_lsh` — sign-LSH: b
  fixed random hyperplanes (seeded, materialized as literal arrays) →
  b-bit bucket id, all native expressions. Probing the query's bucket
  (optionally multi-probe with Hamming-1 neighbors) touches ~n/2^b of
  the data — the scale path: at 100 TB the bucket id is a stored,
  partitionable column and a probe is partition pruning.
- :func:`knn_ivf` — IVF-style: coarse centroids (``method="kmeans"``:
  sampled + Lloyd-refined; ``method="pivot"``: the n_lists smallest-id
  rows — deterministic and SQL-replayable, the oracle-verified path),
  rows assigned to nearest centroid; query probes the p nearest lists.

Oracle story: bucket assignment (sign-LSH) and pivot-IVF list
assignment are pure arithmetic over the vectors plus seeded plane
literals, so a DuckDB oracle replays them exactly (plane matrices are
embedded in the oracle SQL as literals; pivots are re-derived from the
data in SQL). Cross-engine float caveat: dot-product sign tests could
in principle flip when a dot is within float-rounding of 0 — with
real-valued embeddings the probability is negligible, and the contract
queries are hash-verified end-to-end.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geomesa_hive_spark.pipeline.dedup import cosine_sim


def _lit_nested(x, kind: str) -> Column:
    """Nested array literal built as ONE SQL expression string (a
    single py4j call + one parse) instead of element-wise ``F.lit`` —
    measured round 5: a (32, 8, 16) LUT literal costs ~6 ms this way
    vs ~2.4 s of per-element py4j round-trips, and the analysis pass
    over the parsed tree is ~3× faster (Catalyst constant-folds the
    CreateArray into a single Literal either way, but reaches it
    sooner). Values are bit-identical to the F.lit path: ``bigint``
    renders SQL long literals (``42L``); ``double`` renders shortest
    round-trip reprs with the ``D`` suffix, which parse back to the
    exact same IEEE doubles.

    Non-finite values are rejected up front: ``repr(nan)`` would render
    ``nanD``, which Catalyst treats as an unresolved identifier and
    fails with an obscure AnalysisException far from the real cause
    (a NaN/Inf embedding propagating into a centroid/codebook/LUT)."""
    def render(v) -> str:
        if isinstance(v, (list, tuple, np.ndarray)):
            return "array(" + ",".join(render(u) for u in v) + ")"
        if kind == "bigint":
            return str(int(v)) + "L"
        f = float(v)
        if not math.isfinite(f):
            raise ValueError(
                f"_lit_nested: non-finite value {f!r} in literal — a NaN/Inf "
                "embedding has propagated into a centroid/codebook/LUT"
            )
        return repr(f) + "D"
    return F.expr(render(x))

__all__ = [
    "cosine_to_query",
    "knn_brute",
    "random_hyperplane_buckets",
    "knn_lsh",
    "knn_ivf",
    "knn_join_brute",
    "knn_join_lsh",
    "write_lsh_bucketed",
    "knn_lsh_stored",
    "assign_ivf_lists",
    "write_ivf_partitioned",
    "knn_ivf_stored",
    "build_ivf_index",
    "ivf_index_meta",
    "append_to_ivf_index",
    "delete_from_ivf_index",
    "maintain_ivf_index",
    "upsert_into_ivf_index",
    "knn_query_index",
    "knn_join_index",
    "embedding_centroids",
    "kmeans",
]


def _query_lit(query_vec) -> Column:
    return F.array(*[F.lit(float(v)) for v in query_vec])


def cosine_to_query(vec_col, query_vec) -> Column:
    """Cosine similarity of an array column against a literal query vector."""
    q = _query_lit(query_vec)
    return cosine_sim(F.col(vec_col) if isinstance(vec_col, str) else vec_col, q)


def knn_brute(
    df: DataFrame, id_col: str, vec_col: str, query_vec, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine (ties broken by id for determinism)."""
    sim = cosine_to_query(vec_col, query_vec)
    return (
        df.select(F.col(id_col).alias("id"), F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("id"))
        .limit(k)
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bits, dim))


def random_hyperplane_buckets(
    df: DataFrame, vec_col: str, dim: int, bits: int = 8, seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    """Add ``out_col``: b-bit sign-LSH id, all native expressions.

    The plane matrix enters the plan as ONE nested-array literal and the
    per-bit dot products as ONE indexed ``transform`` lambda — an
    unrolled per-plane expression chain is semantically identical but
    grows the Catalyst tree ~``bits``×, and analysis/codegen time on a
    many-KLOC plan swamps small-input runtimes."""
    planes = _hyperplanes(dim, bits, seed)
    planes_lit = _lit_nested(planes, "double")
    v = F.col(vec_col)
    bucket = F.aggregate(
        F.transform(
            planes_lit,
            lambda p, i: F.when(
                F.aggregate(
                    F.zip_with(v, p, lambda x, y: x.cast("double") * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                >= 0,
                F.call_function("shiftleft", F.lit(1), i),
            ).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, b: acc + b,
    )
    return df.withColumn(out_col, bucket)


def _probe_masks(bits: int, probe_hamming: int) -> list[int]:
    """All XOR masks with popcount ≤ probe_hamming (supported: 0, 1, 2).
    Raising beyond 2 keeps the approximation contract honest — silently
    degrading to fewer probes than requested would inflate miss rates."""
    if probe_hamming not in (0, 1, 2):
        raise ValueError(f"probe_hamming must be 0, 1, or 2 (got {probe_hamming})")
    masks = [0]
    if probe_hamming >= 1:
        masks += [1 << i for i in range(bits)]
    if probe_hamming >= 2:
        masks += [(1 << i) | (1 << j) for i in range(bits) for j in range(i + 1, bits)]
    return masks


def _query_buckets(query_vec, bits: int, seed: int, probe_hamming: int) -> list[int]:
    planes = _hyperplanes(len(query_vec), bits, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    base = 0
    for i in range(bits):
        if planes[i] @ q >= 0:
            base |= 1 << i
    return sorted({base ^ m for m in _probe_masks(bits, probe_hamming)})


def _table_seed(seed: int, table: int) -> int:
    """Seed for table t of a multi-table index — a fixed affine offset so
    every component (on-the-fly path, stored layout, SQL oracle, recall
    control) derives the identical plane sets from (seed, t)."""
    return seed + 1000 * table


def knn_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec,
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    probe_hamming: int = 2,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE sign-LSH: ``n_tables``
    independent plane sets (seeds ``seed + 1000*t``); a row is a
    candidate if ANY table puts it within Hamming-``probe_hamming`` of
    the query's bucket in that table. Union-of-tables is the standard
    recall fix for sign-LSH on near-uniform-sphere embeddings, where a
    single 8-bit table at Hamming-1 measures recall@10 ≈ 0.17
    (`scripts/ann_recall.py`); the default (bits=8, Hamming-2, L=4)
    measures ≈ 0.83 at ~47% of the corpus scanned — an honest sign-LSH
    ceiling on this data; `knn_ivf` (pivot, 32 lists / 8 probes, recall
    ≈ 0.98 at ~25%) is the recommended path when a coarse quantizer is
    affordable.

    On the fly this is ONE scan computing L bucket expressions; with a
    stored layout (`write_lsh_bucketed(n_tables=L)`) each table's probe
    is partition pruning over its own replica."""
    n_tables = max(1, int(n_tables))
    out, cond = df, None
    for t in range(n_tables):
        s = _table_seed(seed, t)
        out = random_hyperplane_buckets(
            out, vec_col, dim=len(query_vec), bits=bits, seed=s,
            out_col=f"bucket_{t}",
        )
        probes = _query_buckets(query_vec, bits, s, probe_hamming)
        c = F.col(f"bucket_{t}").isin(probes)
        cond = c if cond is None else (cond | c)
    return knn_brute(out.filter(cond), id_col, vec_col, query_vec, k)


def write_lsh_bucketed(
    df: DataFrame, path: str, vec_col: str, dim: int,
    bits: int = 8, seed: int = 42, n_tables: int = 1,
) -> None:
    """Materialize the sign-LSH bucket as a stored PARTITION column —
    the layout the knn_lsh scale story assumes. At 100 TB a probe then
    reads |probes|/2^bits of the FILES via partition pruning (the
    directory listing filters before any scan), instead of computing
    buckets per row per query.

    With ``n_tables > 1`` the layout is the classic multi-table LSH
    index: one replica per table under ``path/table=t/``, each
    partitioned by that table's bucket (seed ``seed + 1000*t``). Storage
    is L× the data — the textbook space-for-recall trade — and a query
    probes each replica with partition pruning independently."""
    for t in range(max(1, int(n_tables))):
        bucketed = random_hyperplane_buckets(
            df, vec_col, dim=dim, bits=bits, seed=_table_seed(seed, t)
        )
        sub = path if n_tables <= 1 else f"{path}/table={t}"
        bucketed.write.mode("overwrite").partitionBy("bucket").parquet(sub)


def knn_lsh_stored(
    spark,
    path: str,
    id_col: str,
    vec_col: str,
    query_vec,
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    probe_hamming: int = 2,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k against a :func:`write_lsh_bucketed` layout.
    The ``bucket IN (...)`` filter lands on the partition column, so the
    scan touches only the probed directories — check the plan's
    ``PartitionFilters`` to see it (tested in test_pipeline.py).
    Defaults to Hamming-2 probing: Hamming-1 on a single 8-bit table
    measures recall@10 ≈ 0.17 on the recall control — too weak to ship
    as a default. For a multi-table layout (``n_tables > 1``) each
    replica is probed with its own table's buckets (pruned
    independently), candidates unioned and deduped by id before the
    exact top-k."""
    if n_tables <= 1:
        df = spark.read.parquet(path)
        probes = _query_buckets(query_vec, bits, seed, probe_hamming)
        cand = df.filter(F.col("bucket").isin(probes))
    else:
        cand = None
        for t in range(int(n_tables)):
            df = spark.read.parquet(f"{path}/table={t}")
            probes = _query_buckets(
                query_vec, bits, _table_seed(seed, t), probe_hamming
            )
            part = df.filter(F.col("bucket").isin(probes))
            cand = part if cand is None else cand.unionByName(part)
        cand = cand.dropDuplicates([id_col])
    return knn_brute(cand, id_col, vec_col, query_vec, k)


def knn_ivf(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    sample_fraction: float = 0.2,
    method: str = "kmeans",
) -> DataFrame:
    """IVF-flat: coarse centroids + nearest-list assignment + probe, all
    native expressions after one tiny bounded collect.

    ``method="kmeans"`` (default): centroids from a driver-side sample
    refined with a few Lloyd iterations — better list balance, but the
    sample makes results engine-specific. ``method="pivot"``: centroids
    are the embeddings of the ``n_lists`` smallest-id rows — the
    standard random-pivot IVF baseline, fully deterministic, so a SQL
    oracle can re-derive the exact same lists from the data (this is
    the hash-verified contract path).

    The inverted-list assignment is the stored-layout piece at scale:
    write ``list_id`` once, bucket/partition by it, and a query probes
    n_probe/n_lists of the data."""
    dim = len(query_vec)
    if method == "pivot":
        try:
            centroids = _pivot_centroids(df, id_col, vec_col, n_lists)
        except ValueError:  # fewer rows than lists: exact scan is free
            return knn_brute(df, id_col, vec_col, query_vec, k)
    elif method == "kmeans":
        sample = (
            df.select(vec_col).sample(fraction=sample_fraction, seed=seed).limit(50 * n_lists).collect()
        )
        pts = np.asarray([r[0] for r in sample], dtype=np.float64)
        if len(pts) < n_lists:
            return knn_brute(df, id_col, vec_col, query_vec, k)
        rng = np.random.RandomState(seed)
        centroids = pts[rng.choice(len(pts), n_lists, replace=False)]
        for _ in range(5):  # few Lloyd iterations on the sample
            d = ((pts[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(n_lists):
                sel = pts[assign == c]
                if len(sel):
                    centroids[c] = sel.mean(axis=0)
    else:
        raise ValueError(f"method must be 'kmeans' or 'pivot' (got {method!r})")

    order = _probe_lists(centroids, query_vec, n_probe)
    cand = assign_list_ids(df, vec_col, centroids, out_col="__list").filter(
        F.col("__list").isin(order)
    )
    return knn_brute(cand, id_col, vec_col, query_vec, k)


def _list_id_expr(centroids: np.ndarray, vec_col: str) -> Column:
    """Nearest-centroid assignment as ONE native expression. The
    centroid matrix is ONE nested-array literal and the distances ONE
    transform lambda: an unrolled per-centroid chain multiplies the
    Catalyst tree by n_lists and compile time dominates small inputs."""
    cents_lit = _lit_nested(centroids, "double")
    dists = F.transform(
        cents_lit,
        lambda c: F.aggregate(
            F.zip_with(
                F.col(vec_col),
                c,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


# n_lists*dim above which nearest-centroid assignment switches from the
# folded-literal expression to the broadcast pandas-UDF argmin: the
# literal path embeds the whole centroid matrix in the plan (clean at a
# few hundred lists; MBs of Literal at thousands x dim 128+, serialized
# into every task binary), while the broadcast path ships it ONCE per
# executor via sc.broadcast (round-10 verdict item 5)
_ASSIGN_LITERAL_MAX = 32768


def _list_id_broadcast_udf(spark, centroids: np.ndarray):
    """Nearest-centroid assignment as an Arrow-batched pandas UDF over
    an executor-broadcast centroid matrix — the large-n_lists twin of
    :func:`_list_id_expr`. argmin over squared distance uses the
    ``-2·x·cᵀ + |c|²`` expansion (the |x|² term is constant per row),
    chunked so scratch memory stays bounded at any Arrow batch size;
    ties break to the FIRST index, same as array_position(array_min).
    NULL vectors assign NULL, matching the expression path."""
    import pandas as pd

    C = np.ascontiguousarray(np.asarray(centroids, dtype=np.float64))
    bc = spark.sparkContext.broadcast(C)

    # no pd.Series type hints: this module has `from __future__ import
    # annotations`, which stringifies them and breaks pandas_udf's
    # hint inference (the round-10 manifest-bloom gotcha) — the
    # explicit return type on F.pandas_udf is the contract instead
    def fn(vs):
        cents = bc.value
        c2 = (cents * cents).sum(axis=1)
        out = np.zeros(len(vs), dtype=np.int64)
        mask = vs.notna().to_numpy()
        if mask.any():
            M = np.stack(vs[mask].to_numpy()).astype(np.float64)
            # chunk rows so the distance scratch stays ~32 MB
            step = max(1, 4_000_000 // max(1, cents.shape[0]))
            res = np.empty(M.shape[0], dtype=np.int64)
            for i in range(0, M.shape[0], step):
                d = M[i:i + step] @ cents.T * -2.0 + c2[None, :]
                res[i:i + step] = d.argmin(axis=1)
            out[mask] = res
        ser = pd.Series(out).astype("object")
        ser[~mask] = None
        return ser

    return F.pandas_udf(fn, "int")


def assign_list_ids(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    out_col: str = "list_id",
    strategy: str = "auto",
) -> DataFrame:
    """Add the nearest-centroid ``out_col``, auto-picking the physical
    strategy by centroid-matrix size: the folded-literal native
    expression below ``_ASSIGN_LITERAL_MAX = n_lists*dim`` elements
    (whole-stage-codegen, zero Python), the broadcast pandas-UDF argmin
    above it (one matrix copy per executor instead of MBs of Literal in
    every serialized task). ``strategy`` forces ``"literal"`` or
    ``"broadcast"`` (parity is pytest-pinned on identical data)."""
    cents = np.asarray(centroids, dtype=np.float64)
    if strategy not in ("auto", "literal", "broadcast"):
        raise ValueError(f"unknown assign strategy {strategy!r}")
    use_literal = (strategy == "literal") or (
        strategy == "auto" and cents.size <= _ASSIGN_LITERAL_MAX
    )
    if use_literal:
        return df.withColumn(out_col, _list_id_expr(cents, vec_col))
    return df.withColumn(
        out_col, _list_id_broadcast_udf(df.sparkSession, cents)(F.col(vec_col))
    )


def _probe_lists(centroids: np.ndarray, query_vec, n_probe: int) -> list[int]:
    q = np.asarray(query_vec, dtype=np.float64)
    return [int(i) for i in np.argsort(((centroids - q) ** 2).sum(axis=1))[:n_probe]]


def _pivot_centroids(df: DataFrame, id_col: str, vec_col: str, n_lists: int) -> np.ndarray:
    """Deterministic pivots: embeddings of the n_lists smallest ids —
    re-derivable from the data by anyone (including a SQL oracle or a
    later reader of a stored layout), no RNG, no sample drift."""
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(n_lists).collect()
    if len(rows) < n_lists:
        raise ValueError(f"need at least n_lists={n_lists} rows, got {len(rows)}")
    return np.asarray([r[1] for r in rows], dtype=np.float64)


def assign_ivf_lists(
    df: DataFrame, id_col: str, vec_col: str, n_lists: int = 16
) -> DataFrame:
    """Add ``list_id``: deterministic-pivot IVF assignment as a native
    expression — the column a stored layout partitions by."""
    centroids = _pivot_centroids(df, id_col, vec_col, n_lists)
    return assign_list_ids(df, vec_col, centroids)


def write_ivf_partitioned(
    df: DataFrame, path: str, id_col: str, vec_col: str, n_lists: int = 16
) -> None:
    """Materialize the IVF layout: ``list_id`` as a parquet PARTITION
    column, so a query's n_probe lists are read via partition pruning —
    the write-once/probe-cheap contract IVF exists for."""
    assign_ivf_lists(df, id_col, vec_col, n_lists).write.mode(
        "overwrite"
    ).partitionBy("list_id").parquet(path)


def _sq8_params(df: DataFrame, vec_col: str, dim: int) -> tuple[list, list]:
    """Per-dimension linear-quantization parameters from ONE corpus agg:
    (mins, scales) with scale_d = (max_d − min_d)/255 folded to a Python
    double. 2·dim aggregate expressions in a single map-side-combined
    pass — O(dim) driver rows, never O(rows)."""
    aggs = []
    for i in range(int(dim)):
        e = F.element_at(F.col(vec_col), i + 1)
        aggs += [F.min(e), F.max(e)]
    row = df.agg(*aggs).collect()[0]
    mins = [float(row[2 * i]) for i in range(int(dim))]
    scales = [(float(row[2 * i + 1]) - mins[i]) / 255.0
              for i in range(int(dim))]
    return mins, scales


def _sq8_quantize(vec_col, mins: list, scales: list) -> Column:
    """array<double> → array<tinyint> codes: per-dim
    ``clamp(floor((v−lo)/s + 0.5), 0, 255) − 128`` — floor(x+0.5), never
    round() (Spark round on double allocates a BigDecimal per value), and
    every op replays exactly in SQL. A degenerate dimension (s = 0)
    stores −128 and dequantizes back to its constant min."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    m = _lit_nested(mins, "double")
    s = _lit_nested(scales, "double")
    d = F.zip_with(v, m, lambda x, lo: x - lo)
    return F.zip_with(
        d, s,
        lambda x, sc: F.when(sc == F.lit(0.0), F.lit(-128))
        .otherwise(
            F.least(F.greatest(F.floor(x / sc + F.lit(0.5)), F.lit(0)),
                    F.lit(255)) - F.lit(128)
        )
        .cast("tinyint"),
    )


def _sq8_dequantize(q_col, mins: list, scales: list) -> Column:
    """array<tinyint> codes → array<double> reconstruction:
    ``(c + 128)·s + lo`` — the asymmetric-distance convention (query
    stays float, stored side reconstructs), same as PQ's ADC."""
    q = F.col(q_col) if isinstance(q_col, str) else q_col
    m = _lit_nested(mins, "double")
    s = _lit_nested(scales, "double")
    t = F.zip_with(
        q, s, lambda c, sc: (c.cast("double") + F.lit(128.0)) * sc
    )
    return F.zip_with(t, m, lambda x, lo: x + lo)


def build_ivf_index(
    df: DataFrame, id_col: str, vec_col: str, path: str,
    n_lists: int = 16,
    sq8: bool = False,
) -> dict:
    """Persisted ANN index (round 10 — the stored-index philosophy of
    build_minhash_index/build_bm25_index applied to vectors): pivot
    centroids are derived ONCE at build time and stored in
    ``_index.json`` alongside the parameters, and the vectors land
    partitioned by ``list_id`` (bucket-ALIGNED repartition first, one
    file per list — partitionBy alone writes tasks × lists small
    files). Queries then never touch the corpus to find centroids:
    :func:`knn_ivf_stored` re-derives pivots with a smallest-ids scan
    per query, which is the side-channel-free trade — this index makes
    the opposite one, O(probed partitions) per query at any corpus
    size. JSON float repr round-trips exactly, so stored centroids ≡
    derived centroids bit-for-bit.

    ``sq8=True`` additionally stores a scalar-quantized (int8) copy of
    every vector (``vec_q``, per-dimension linear quantization — the
    faiss SQ8 idea in SQL-replayable form): the coarse candidate pass
    of :func:`knn_query_index` then scores DEQUANTIZED vectors reading
    ONLY the 1-byte-per-dim column (Catalyst column pruning keeps the
    8-byte float column out of the scan — a ~4–8× I/O cut on the hot
    path), keeps the top ``rerank_k``, and re-ranks those few rows
    EXACTLY on the float column. Quantization params (mins, scales)
    live in ``_index.json`` like the centroids — appends quantize with
    the stored grid, so appended codes ≡ rebuild codes."""
    import json
    import os

    centroids = _pivot_centroids(df, id_col, vec_col, n_lists)
    assigned = assign_list_ids(
        df.select(id_col, vec_col), vec_col, centroids
    ).withColumn("gen", F.lit(0))
    meta = {
        "n_lists": int(n_lists), "id_col": id_col, "vec_col": vec_col,
        "dim": int(centroids.shape[1]), "gen": 0,
        "centroids": [[float(x) for x in c] for c in centroids],
    }
    if sq8:
        mins, scales = _sq8_params(df, vec_col, centroids.shape[1])
        assigned = assigned.withColumn(
            "vec_q", _sq8_quantize(vec_col, mins, scales)
        )
        meta["sq8"] = {"mins": mins, "scales": scales}
    assigned.repartition(int(n_lists), "list_id").write.mode(
        "overwrite"
    ).partitionBy("list_id").parquet(os.path.join(path, "lists"))
    with open(os.path.join(path, "_index.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def ivf_index_meta(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path, "_index.json")) as fh:
        return json.load(fh)


def append_to_ivf_index(new_df: DataFrame, path: str) -> dict:
    """Index a new batch with the STORED centroids (the index is the
    parameter commitment — appended vectors join exactly the lists a
    full rebuild over build-corpus pivots would give them) and append
    into the same list partitions; existing files are never rewritten.
    Caller contract: ids must be new — replaced vectors go through
    :func:`upsert_into_ivf_index`, whose generation-versioned
    tombstones make the swap safe. Re-bucketing is
    :func:`maintain_ivf_index`'s job. Returns the metadata with the
    bumped generation."""
    import json
    import os

    from geomesa_hive_spark.pipeline import index_io

    m = index_io.require_generation_meta(ivf_index_meta(path), "IVF index")
    g = int(m["gen"]) + 1
    centroids = np.asarray(m["centroids"], dtype=np.float64)
    assigned = assign_list_ids(
        new_df.select(m["id_col"], m["vec_col"]), m["vec_col"], centroids
    ).withColumn("gen", F.lit(g))
    if "sq8" in m:
        # the stored grid is the commitment: appended codes ≡ the codes
        # a full rebuild over the build corpus's params would give
        assigned = assigned.withColumn(
            "vec_q",
            _sq8_quantize(m["vec_col"], m["sq8"]["mins"],
                          m["sq8"]["scales"]),
        )
    assigned.repartition(int(m["n_lists"]), "list_id").write.mode(
        "append"
    ).partitionBy("list_id").parquet(os.path.join(path, "lists"))
    m["gen"] = g
    tmp = os.path.join(path, "_index.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(m, fh)
    os.replace(tmp, os.path.join(path, "_index.json"))
    return m


def upsert_into_ivf_index(new_df: DataFrame, path: str) -> dict:
    """Replace vectors in place (re-embedded documents: same ids, new
    vectors): tombstone the ids at the current generation, append the
    new vectors at the next — probes immediately see only the new
    vectors (which may land in DIFFERENT lists; the stored centroids
    never move, so both old hiding and new placement stay valid), and
    the next maintain() drops the old rows physically. Cost: O(ids) +
    O(batch) — never a list rewrite."""
    m = ivf_index_meta(path)
    delete_from_ivf_index(new_df.select(m["id_col"]), path)
    return append_to_ivf_index(new_df, path)


def delete_from_ivf_index(keys: DataFrame, path: str) -> None:
    """Tombstone vectors out of the IVF index — Lucene-style delete
    semantics shared with the minhash/BM25 indexes (generation-
    versioned via pipeline/index_io.py, so an upsert's re-appended
    vectors stay visible): ids land in an append-only ``tombstones/``
    table, :func:`knn_query_index` anti-joins them out immediately (a
    deleted vector can never be a neighbor), and the next
    :func:`maintain_ivf_index` drops the rows physically during its
    rewrite and clears the log. The stored centroids are NOT
    re-derived on delete — the index is the parameter commitment, and
    probes stay valid for any corpus subset (deleting vectors can only
    shrink lists, never move one). Deleting an unknown id is a
    no-op."""
    from geomesa_hive_spark.pipeline import index_io

    m = index_io.require_generation_meta(ivf_index_meta(path), "IVF index")
    index_io.write_tombstones(keys, m["id_col"], path, int(m["gen"]))


def _ivf_tombstones(spark, path: str):
    from geomesa_hive_spark.pipeline import index_io

    return index_io.read_tombstones(spark, path)


def maintain_ivf_index(spark, path: str) -> dict:
    """Compact the list partitions back to one file per list (each
    append adds ≥1 file per touched list — after K appends a probe
    reads K small files per list) and apply pending tombstones
    physically (see :func:`delete_from_ivf_index`). Content- and
    centroid-identical when nothing was deleted; same
    single-maintainer contract as the minhash/manifest maintenance
    ops. Returns {files_before, files_after, n_tombstones_applied}
    with the count = distinct ids whose rows were ACTUALLY removed
    (pipeline/index_io.py's uniform semantics)."""
    import os
    import shutil

    from geomesa_hive_spark.pipeline import index_io

    m = ivf_index_meta(path)
    src = os.path.join(path, "lists")
    tomb = _ivf_tombstones(spark, path)
    before = index_io.n_part_files(src)
    tmp = src + ".compact"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    rows = spark.read.parquet(src)
    n_removed = 0
    if tomb is not None:
        rows = index_io.require_generation_column(rows, "IVF index")
        n_removed = index_io.removed_ids_count(rows, tomb, m["id_col"])
        rows = index_io.apply_tombstones(rows, tomb, m["id_col"])
    (
        rows.repartition(int(m["n_lists"]), "list_id")
        .write.mode("overwrite").partitionBy("list_id").parquet(tmp)
    )
    index_io.swap_dir(src, tmp)
    rep = {"files_before": before,
           "files_after": index_io.n_part_files(src),
           "n_tombstones_applied": n_removed}
    index_io.clear_tombstones(path)
    return rep


def knn_query_index(
    spark, path: str, query_vec, k: int = 10, n_probe: int = 4,
    prune_report: dict | None = None,
    pre_filter=None,
    rerank_k: int | None = None,
) -> DataFrame:
    """Approximate top-k against a :func:`build_ivf_index` layout:
    query-to-centroid distances are computed driver-side on the STORED
    centroids (n_lists floats — no corpus scan, unlike
    :func:`knn_ivf_stored`), the n_probe nearest lists are read via
    partition pruning, and the exact cosine top-k runs within them.
    ``prune_report`` (filled in place) records lists_read / n_lists.

    ``pre_filter`` (round 11) is FILTERED vector search — a Column (or
    SQL-string) predicate over the stored rows, applied to the probed
    candidates BEFORE the exact top-k: top-k among allowed vectors, not
    allowed rows of the unfiltered top-k (post-filtering, which
    under-returns). The standard filtered-ANN caveat applies and is the
    caller's knob, not hidden: probes are chosen by the query vector
    alone, so a highly selective filter thins the probed lists and
    recall degrades — raise ``n_probe`` with filter selectivity (at
    probe = all lists the result is exact filtered search).

    On an ``sq8=True`` index (round 12) the candidate pass is TWO
    stages: a coarse cosine over DEQUANTIZED int8 codes — the scan
    reads only the 1-byte-per-dim ``vec_q`` column (column pruning,
    recorded in ``prune_report['coarse_read_schema']``) — keeps the
    top ``rerank_k`` ids (default ``4*k``), then the EXACT cosine
    re-ranks those few rows via an id-pushed float-column read. The
    collect in between is bounded by ``rerank_k``. On a float index
    ``rerank_k`` is ignored."""
    import os

    m = ivf_index_meta(path)
    centroids = np.asarray(m["centroids"], dtype=np.float64)
    order = _probe_lists(centroids, query_vec, n_probe)
    if prune_report is not None:
        prune_report.update(lists_read=len(order), n_lists=m["n_lists"])
    cand = (
        spark.read.parquet(os.path.join(path, "lists"))
        .filter(F.col("list_id").isin(order))
    )
    # pending deletes: tombstoned generations are never neighbors —
    # upserted (re-appended) vectors are younger and stay visible
    # (physical removal happens at maintain)
    tomb = _ivf_tombstones(spark, path)
    if tomb is not None:
        from geomesa_hive_spark.pipeline import index_io

        cand = index_io.apply_tombstones(
            index_io.require_generation_column(cand, "IVF index"),
            tomb, m["id_col"],
        )
    if pre_filter is not None:
        cand = cand.filter(
            F.expr(pre_filter) if isinstance(pre_filter, str) else pre_filter
        )
    if "sq8" not in m:
        return knn_brute(cand, m["id_col"], m["vec_col"], query_vec, k)
    # SQ8 two-stage: coarse over dequantized codes (float column never
    # scanned — Catalyst prunes it), exact re-rank on the survivors
    if rerank_k is not None and int(rerank_k) < 1:
        raise ValueError(
            f"rerank_k must be >= 1, got {rerank_k} — a non-positive "
            "rerank would silently return an empty result"
        )
    # floor the effective rerank at k: rerank_k < k would silently
    # return fewer than k neighbors
    rk = (max(int(rerank_k), int(k)) if rerank_k is not None
          else 4 * int(k))
    sq = m["sq8"]
    vhat = _sq8_dequantize("vec_q", sq["mins"], sq["scales"])
    coarse = (
        cand.select(
            F.col(m["id_col"]).alias("id"),
            cosine_sim(vhat, _query_lit(query_vec)).alias("coarse"),
        )
        .orderBy(F.col("coarse").desc(), F.col("id"))
        .limit(rk)
    )
    if prune_report is not None:
        plan = coarse._jdf.queryExecution().executedPlan().toString()
        rs = [ln.strip() for ln in plan.splitlines() if "ReadSchema" in ln]
        prune_report["coarse_read_schema"] = rs[0] if rs else ""
        prune_report["rerank_k"] = rk
    survivor_ids = [r.id for r in coarse.collect()]    # bounded by rk
    exact = cand.filter(F.col(m["id_col"]).isin(survivor_ids))
    return knn_brute(exact, m["id_col"], m["vec_col"], query_vec, k)


def knn_join_index(
    queries: DataFrame,
    q_id: str,
    q_vec: str,
    path: str,
    k: int = 5,
    n_probe: int = 4,
    prune_report: dict | None = None,
) -> DataFrame:
    """Batch ANN JOIN served from a :func:`build_ivf_index` index —
    the stored index answering a whole query TABLE, not one vector:
    each query row computes its ``n_probe`` nearest stored centroids
    as a NATIVE expression (distances to the centroid literal matrix,
    struct-sort, slice — no per-query driver work, unlike
    :func:`knn_query_index`'s single-vector path), explodes to
    (query, list_id), and equi-joins the probed list partitions; exact
    cosine + a per-query top-k window finish. The only collect is the
    DISTINCT probed-list union (≤ n_lists ints — the bounded-collect
    rule), which makes the scan an explicit partition-pruned read.
    Tombstoned generations are excluded like every index read. Probe
    ties break by (distance², list index) — deterministic and
    SQL-replayable. Returns (qid, id, cos_sim); may return <k rows
    per query when probed lists hold fewer vectors (the approximate
    contract, as knn_join_lsh)."""
    import os

    from pyspark.sql import Window

    spark = queries.sparkSession
    m = ivf_index_meta(path)
    centroids = np.asarray(m["centroids"], dtype=np.float64)
    d2s = _d2_all(centroids, q_vec)
    pairs = F.transform(
        d2s, lambda d, i: F.struct(d.alias("d"), i.cast("int").alias("i"))
    )
    probes = F.transform(
        F.slice(F.array_sort(pairs), 1, int(n_probe)), lambda s: s["i"]
    )
    q = queries.select(
        F.col(q_id).alias("qid"),
        F.col(q_vec).alias("qv"),
        F.explode(probes).alias("list_id"),
    ).localCheckpoint()
    # bounded collect (≤ n_lists); collect_set aggregates partially
    # executor-side into one row — no distinct shuffle
    need = sorted(
        int(b) for b in q.agg(F.collect_set("list_id")).collect()[0][0]
    )
    if prune_report is not None:
        prune_report.update(lists_read=len(need), n_lists=m["n_lists"])
    cand = (
        spark.read.parquet(os.path.join(path, "lists"))
        .filter(F.col("list_id").isin(need))
    )
    tomb = _ivf_tombstones(spark, path)
    if tomb is not None:
        from geomesa_hive_spark.pipeline import index_io

        cand = index_io.apply_tombstones(
            index_io.require_generation_column(cand, "IVF index"),
            tomb, m["id_col"],
        )
    sim = cosine_sim(F.col("qv"), F.col(m["vec_col"]))
    # no pair dedup needed: every vector lives in exactly ONE list
    # partition, so (qid, id) appears at most once in the join
    scored = q.join(cand, "list_id").select(
        "qid",
        F.col(m["id_col"]).alias("id"),
        F.round(sim, 6).alias("cos_sim"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("id")
    )
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= int(k))
        .drop("__r")
    )


def knn_ivf_stored(
    spark,
    path: str,
    id_col: str,
    vec_col: str,
    query_vec,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k against a :func:`write_ivf_partitioned` layout.
    Pivots are re-derived from the stored table (smallest ids — the
    deterministic contract), so no side-channel centroid file is needed;
    the ``list_id IN (...)`` probe is partition pruning."""
    df = spark.read.parquet(path)
    centroids = _pivot_centroids(df, id_col, vec_col, n_lists)
    order = _probe_lists(centroids, query_vec, n_probe)
    cand = df.filter(F.col("list_id").isin(order))
    return knn_brute(cand, id_col, vec_col, query_vec, k)


def knn_join_brute(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact k-NN JOIN: for every left vector the top-k right vectors by
    cosine (ties broken by right id). Block-nested-loop over the full
    right side — the correctness baseline and the small-left case
    (probe batches against a corpus); `knn_join_lsh` is the scale path.

    Returns (left_id, right_id, cos_sim, rk). Norms are hoisted per-side
    before the pair stage so each pair costs one dot product."""
    from pyspark.sql import Window

    norm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    l = left.select(
        F.col(left_id).alias("lid"), F.col(vec_col).alias("lv")
    ).withColumn("ln", norm(F.col("lv")))
    r = right.select(
        F.col(right_id).alias("rid"), F.col(vec_col).alias("rv")
    ).withColumn("rn", norm(F.col("rv")))
    dot = F.aggregate(
        F.zip_with(F.col("lv"), F.col("rv"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    sim = F.when((F.col("ln") > 0) & (F.col("rn") > 0), dot / (F.col("ln") * F.col("rn"))).otherwise(F.lit(0.0))
    scored = l.crossJoin(r).select(
        "lid", "rid", F.round(sim, 6).alias("cos_sim")
    )
    w = Window.partitionBy("lid").orderBy(F.col("cos_sim").desc(), F.col("rid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("lid", "rid", "cos_sim", "rk")
    )


def knn_join_lsh(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    bits: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate k-NN JOIN at scale: bucket both sides with the SAME
    hyperplanes, explode each left row to its bucket plus all Hamming-≤
    ``probe_hamming`` probes, equi-join on bucket, then per-left top-k.
    One hash shuffle of each side on the bucket key; candidate count ≈
    n·|probes|/2^bits per left row instead of n. May return <k rows for
    sparse buckets (the approximate contract)."""
    from pyspark.sql import Window

    lb = random_hyperplane_buckets(left, vec_col, dim=dim, bits=bits, seed=seed)
    rb = random_hyperplane_buckets(right, vec_col, dim=dim, bits=bits, seed=seed)
    probes = F.array_distinct(
        F.array(
            *[
                F.col("bucket").bitwiseXOR(F.lit(m))
                for m in _probe_masks(bits, probe_hamming)
            ]
        )
    )
    l = lb.select(
        F.col(left_id).alias("lid"), F.col(vec_col).alias("lv"), F.explode(probes).alias("bucket")
    )
    r = rb.select(F.col(right_id).alias("rid"), F.col(vec_col).alias("rv"), "bucket")
    cand = l.join(r, "bucket")
    sim = cosine_sim(F.col("lv"), F.col("rv"))
    scored = cand.select("lid", "rid", F.round(sim, 6).alias("cos_sim"))
    w = Window.partitionBy("lid").orderBy(F.col("cos_sim").desc(), F.col("rid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("lid", "rid", "cos_sim", "rk")
    )


# ---------------------------------------------------------------------------
# centroids / k-means
# ---------------------------------------------------------------------------


def embedding_centroids(df: DataFrame, label_col: str, vec_col: str) -> DataFrame:
    """Element-wise mean vector per label: (label, centroid, n_members).

    posexplode(vec) → groupBy(label, dim) → exact decimal sums / count →
    reassemble the ordered array. The shuffle carries n·dim scalars with
    map-side combine (so it compresses to labels·dim partials per input
    partition) and the result is labels·dim rows — never collected.
    Decimal(27,9) partials make the mean order-independent: a double sum
    would wobble in its last ulp with shuffle merge order, which breaks
    both reproducibility and the hash oracle."""
    ex = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    )
    per = ex.groupBy("label", "i").agg(
        (
            F.sum(F.col("x").cast("double").cast("decimal(27,9)")).cast("double")
            / F.count("*")
        ).alias("m"),
        F.count("*").alias("n"),
    )
    return per.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "m"))), lambda s: s["m"]
        ).alias("centroid"),
        F.max("n").alias("n_members"),
    )


def _d2_all(centroids, vec_col) -> Column:
    """Array of squared euclidean distances of an array column to EVERY
    literal centroid — sequential left fold per centroid, the
    structural twin of the oracle's
    list_sum(list_transform(list_zip(...))). The centroid matrix is
    one _lit_nested SQL-string literal and the per-centroid distances
    one transform lambda (the _list_id_expr shape): an unrolled
    per-centroid chain multiplies both py4j construction and the
    Catalyst tree by k."""
    v = vec_col if isinstance(vec_col, Column) else F.col(vec_col)
    return F.transform(
        _lit_nested(centroids, "double"),
        lambda c: F.aggregate(
            F.zip_with(
                v, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
    )


def kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Deterministic Lloyd k-means: pivot init (the k smallest-id rows,
    the same SQL-replayable convention as IVF), then ``iters`` rounds of
    assign → decimal-mean centroid update. Returns the final assignment
    (id, cluster_id, d2).

    Scale shape per round: assignment is a pure map — the k centroids
    are collected to the driver (bounded: k·dim doubles, the
    similarity.py IVF-sampling precedent) and embedded as literals, so
    NO shuffle touches the points; the update is one posexplode groupBy
    (n·dim scalars, map-side combined). Ties in distance go to the
    lowest cluster id; an emptied cluster keeps its previous centroid
    so k is stable across rounds. Every arithmetic step (pivot order,
    decimal means, fold order) has an exact DuckDB twin, so even the
    2-iteration fixpoint is hash-verifiable."""
    pts = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    init = pts.orderBy("id").limit(k).collect()  # bounded: k rows
    cents = [list(r.v) for r in init]

    def _assign(centroids):
        d2s = _d2_all(centroids, F.col("v"))
        best = F.array_position(d2s, F.array_min(d2s)).cast("int") - 1
        return pts.select(
            "id",
            "v",
            best.alias("cluster_id"),
            F.array_min(d2s).alias("d2"),
        )

    assigned = None
    for _ in range(iters):
        assigned = _assign(cents)
        upd = embedding_centroids(assigned, "cluster_id", "v")
        got = {r.label: list(r.centroid) for r in upd.collect()}  # bounded: k rows
        cents = [got.get(c, cents[c]) for c in range(k)]
    return _assign(cents).select("id", "cluster_id", "d2")


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ's PQ half): 32x vector compression + ADC
# ---------------------------------------------------------------------------

_PQ_SCALE = 1_000_000_000_000  # per-dimension squared-diff quantum (1e-12)


def pq_codebooks_pivot(
    df: DataFrame, id_col: str, vec_col: str, m: int = 8, ksub: int = 16
) -> np.ndarray:
    """(m, ksub, subdim) codebooks from the ``ksub`` smallest-id
    embeddings' subvectors — the deterministic pivot construction
    (cf. _pivot_centroids) that a SQL oracle or a later stored-layout
    reader can re-derive from the data alone."""
    pivots = _pivot_centroids(df, id_col, vec_col, ksub)  # (ksub, dim)
    dim = pivots.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return np.stack([pivots[:, s * sub:(s + 1) * sub] for s in range(m)])


def _qdist(vec_slice: Column, cent) -> Column:
    """Integer-quantized squared distance: per-dimension terms
    quantized to 1e-12 quanta BEFORE the sum, so the total is exact
    integer arithmetic — identical in any engine regardless of
    summation order (a raw double fold risks last-ulp divergence on
    argmin near-ties). Quantization is ``floor(t + 0.5)`` — exact
    HALF_UP for the non-negative squared terms, the same formula as
    the NumPy twin ``_qdist_np`` and the oracle SQL replay, and pure
    IEEE arithmetic in codegen: Spark's ``round()`` on doubles
    allocates a BigDecimal per value, which round-5 profiling measured
    as the entire hot cost of the IVF assignment pass (2.5 s on 2k
    rows × 32 centroids × 64 dims in one task)."""
    return F.aggregate(
        F.zip_with(
            vec_slice,
            cent,
            lambda x, y: F.floor(
                (x.cast("double") - y) * (x.cast("double") - y)
                * F.lit(float(_PQ_SCALE)) + F.lit(0.5)
            ).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t,
    )


def pq_code_expr(codebooks: np.ndarray, vec_col: str) -> Column:
    """Native array<int> PQ code column: per subspace, argmin over the
    ksub codebook entries (ties -> smallest code). Codebooks enter the
    plan as one nested literal per subspace; everything stays in
    whole-stage codegen — encoding 100 TB at write time never leaves
    the JVM."""
    m, _, sub = codebooks.shape
    v = F.col(vec_col)
    codes = []
    for s in range(m):
        cb_lit = _lit_nested(codebooks[s], "double")
        dists = F.transform(cb_lit, lambda c: _qdist(F.slice(v, s * sub + 1, sub), c))
        codes.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    return F.array(*codes)


def pq_codebooks_kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    ksub: int = 16,
    iters: int = 10,
    sample_rows: int = 800,
) -> np.ndarray:
    """Lloyd-trained codebooks from a DETERMINISTIC bounded sample (the
    ``sample_rows`` smallest ids — no RNG, reproducible across runs),
    initialized at the pivot codebooks. Measured on the recall control
    (scripts/ann_recall.py, recorded in BASELINE.md): kmeans 0.81@10%
    refine vs pivot's 0.775 — training still pays for itself; the
    pivot path stays the hash-oracled contract config because replaying
    10 Lloyd rounds x m subspaces in SQL buys no additional trust."""
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(int(sample_rows)).collect()
    X = np.asarray([r[1] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    out = []
    for s in range(m):
        sx = X[:, s * sub:(s + 1) * sub]
        C = sx[:ksub].copy()
        for _ in range(iters):
            d = ((sx[:, None, :] - C[None]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for j in range(ksub):
                if (a == j).any():
                    C[j] = sx[a == j].mean(axis=0)
        out.append(C)
    return np.stack(out)


def knn_pq(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    refine: int = 50,
    method: str = "pivot",
) -> DataFrame:
    """PQ-compressed approximate kNN with exact re-ranking.

    Scale path: vectors live as m small integer codes (8 bytes at
    m=8/ksub=16 vs 256 bytes of float32 — 32x), a query builds an
    (m x ksub) integer LUT of subspace distances ONCE, every vector's
    approximate distance is m LUT lookups summed (ADC — no float math
    per vector, no vector bytes read if codes are stored), the top
    ``refine`` candidates by (ADC, id) are re-ranked with the exact
    cosine. At 100 TB the scan reads the 8-byte code column only; the
    global top-``refine`` is a TakeOrdered (per-partition top-R then a
    driver merge of R rows — no full sort).

    Determinism: codebooks are pivot-derived, all distances are
    integer-quantized (see _qdist), ADC is a sum of m integers, and
    ties break on id — the whole pipeline including the candidate
    cut is hash-replayable in SQL."""
    if method == "pivot":
        codebooks = pq_codebooks_pivot(df, id_col, vec_col, m=m, ksub=ksub)
    elif method == "kmeans":
        codebooks = pq_codebooks_kmeans(df, id_col, vec_col, m=m, ksub=ksub)
    else:
        raise ValueError(f"method must be 'pivot' or 'kmeans' (got {method!r})")
    sub = codebooks.shape[2]
    q = np.asarray(query_vec, dtype=np.float64)
    # per-dimension floor(x+0.5) — the exact formula _qdist compiles
    # and the oracle SQL replays (numpy .round() is half-to-even and
    # could diverge on an exact .5 quantum)
    lut = [
        [
            int(
                np.floor((q[s * sub:(s + 1) * sub] - c) ** 2 * _PQ_SCALE + 0.5).sum()
            )
            for c in codebooks[s]
        ]
        for s in range(m)
    ]
    lut_lit = _lit_nested(lut, "bigint")
    coded = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        pq_code_expr(codebooks, vec_col).alias("codes"),
    )
    adc = F.aggregate(
        F.transform(
            F.col("codes"),
            lambda c, s: F.element_at(F.element_at(lut_lit, s + 1), c + 1),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t,
    )
    cand = (
        coded.withColumn("adc", adc)
        .orderBy(F.asc("adc"), F.asc("id"))
        .limit(int(refine))
    )
    return knn_brute(cand, "id", "v", query_vec, k)


# ---------------------------------------------------------------------------
# IVF-PQ: coarse inverted lists + residual product quantization
# ---------------------------------------------------------------------------


def _qdist_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """NumPy twin of _qdist: per-dimension integer quanta, then sum over
    the LAST axis — exact integers, same values as the SQL replay."""
    return np.floor((a - b) ** 2 * _PQ_SCALE + 0.5).astype(np.int64).sum(axis=-1)


def _list_id_expr_q(centroids: np.ndarray, vec_col: str) -> Column:
    """Quantized-integer variant of _list_id_expr: nearest-centroid id
    with distances as exact integer sums, so assignment ties and
    near-ties are engine-independent by construction (the raw-double
    variant relies on summation-order parity, which holds here but is
    not guaranteed)."""
    cents_lit = _lit_nested(centroids, "double")
    dists = F.transform(cents_lit, lambda c: _qdist(F.col(vec_col), c))
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def ivfpq_model(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_lists: int = 32,
    m: int = 8,
    ksub: int = 16,
    method: str = "pivot",
    sample_rows: int = 800,
    iters: int = 10,
) -> tuple[np.ndarray, np.ndarray]:
    """(centroids (L, dim), residual codebooks (m, ksub, subdim)).

    ``method="pivot"``: both pivot-derived (smallest-id rows), fully
    re-derivable from the data by a SQL oracle. Residual codebooks are
    the PQ pivots' residuals against THEIR OWN assigned centroids
    (quantized-integer argmin, matching the in-plan assignment exactly).

    ``method="kmeans"``: same coarse centroids (IVF-flat measures 0.97
    recall with them — the coarse stage was never the weakness), but the
    residual codebooks are Lloyd-trained per subspace over the residuals
    of a DETERMINISTIC ``sample_rows`` sample (smallest ids, no RNG),
    initialized at the pivot books. Measured equivalent to pivot books
    on this corpus (0.97 vs 0.98, BASELINE.md ivfpq rows); it is the
    lever for corpora whose residual distribution the 16 pivot samples
    represent poorly."""
    cents = _pivot_centroids(df, id_col, vec_col, n_lists)
    dim = cents.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    # codebook pivots DISJOINT from the centroid pivots (rows ranked
    # n_lists+1 .. n_lists+ksub by id): their assignments spread across
    # lists, so the residual sample is representative (measured slightly
    # better than reusing the centroid pivots, whose own residuals are 0)
    n_need = n_lists + ksub if method == "pivot" else max(n_lists + ksub, sample_rows)
    rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_need)
        .collect()[n_lists:]
    )
    P = np.asarray([r[1] for r in rows], dtype=np.float64)
    if len(P) < ksub:
        raise ValueError(f"need at least n_lists+ksub rows")
    d = _qdist_np(P[:, None, :], cents[None, :, :])  # (|P|, L) ints
    assign = d.argmin(axis=1)  # ties -> smallest list id (argmin first)
    R = P - cents[assign]
    books = np.stack([R[:ksub, s * sub:(s + 1) * sub] for s in range(m)])
    if method == "pivot":
        return cents, books
    if method != "kmeans":
        raise ValueError(f"method must be 'pivot' or 'kmeans' (got {method!r})")
    out = []
    for s in range(m):
        sx = R[:, s * sub:(s + 1) * sub]
        C = books[s].copy()
        for _ in range(iters):
            dd = ((sx[:, None, :] - C[None]) ** 2).sum(axis=2)
            a = dd.argmin(axis=1)
            for j in range(ksub):
                if (a == j).any():
                    C[j] = sx[a == j].mean(axis=0)
        out.append(C)
    return cents, np.stack(out)


def knn_ivfpq(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec,
    k: int = 10,
    n_lists: int = 32,
    n_probe: int = 8,
    m: int = 8,
    ksub: int = 16,
    refine: int = 100,
    method: str = "pivot",
) -> DataFrame:
    """IVF-PQ: the composition the standalone halves were built for —
    coarse inverted lists cut the candidate set to n_probe/n_lists of
    the corpus, and residual PQ scores those candidates from 8-byte
    codes via per-list integer LUTs.

    Measured on the standing 20-query harness (scripts/ann_recall.py,
    BASELINE.md quality table): recall@10 = **0.98 at 10% exact-scored**
    at the contract config (32 lists, 8 probes, refine=200) — IVF-flat
    recall (0.98@24.5%) at flat-PQ cost (0.775@10%), the best point on
    the curve. (Round 3 recorded 0.59 for this config from an
    uncommitted measurement; it did not reproduce once the rows joined
    the standing harness in round 4 — the harness is the record.)

    At scale: list id and PQ codes are write-time stored columns (list
    = partition key -> probing is partition pruning; codes = the only
    column the ADC pass reads). The query builds n_probe integer LUTs
    (m x ksub each) against ITS residual in each probed list, scores
    candidates with m lookups + integer adds, cuts to `refine` by
    (ADC, id), and re-ranks exactly. Every distance is per-dimension
    integer-quantized (_qdist) — assignment, encoding, LUTs, and the
    candidate cut replay bit-for-bit in SQL."""
    cents, books = ivfpq_model(
        df, id_col, vec_col, n_lists=n_lists, m=m, ksub=ksub, method=method
    )
    sub = books.shape[2]
    q = np.asarray(query_vec, dtype=np.float64)
    order = [
        int(i) for i in np.argsort(
            # stable argsort on quantized dists -> smallest list id on ties
            _qdist_np(q[None, :], cents), kind="stable"
        )[:n_probe]
    ]
    # per-list LUT: lut[list][s][j] = qdist((q - cent_list) slice_s, book[s][j])
    lut = []
    for li in range(n_lists):
        if li in order:
            qr = q - cents[li]
            lut.append(
                [
                    [int(v) for v in _qdist_np(qr[s * sub:(s + 1) * sub][None, :], books[s])]
                    for s in range(m)
                ]
            )
        else:
            lut.append([[0] * ksub for _ in range(m)])
    lut_lit = _lit_nested(lut, "bigint")

    cents_lit = _lit_nested(cents, "double")
    v = F.col(vec_col)
    assigned = df.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        _list_id_expr_q(cents, vec_col).alias("list_id"),
    ).filter(F.col("list_id").isin(order))
    resid = F.zip_with(
        F.col("v"), F.element_at(cents_lit, F.col("list_id") + 1),
        lambda x, y: x.cast("double") - y,
    )
    coded = assigned.withColumn("r", resid)
    codes = []
    for s in range(m):
        cb_lit = _lit_nested(books[s], "double")
        dists = F.transform(cb_lit, lambda c: _qdist(F.slice(F.col("r"), s * sub + 1, sub), c))
        codes.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    coded = coded.withColumn("codes", F.array(*codes))
    adc = F.aggregate(
        F.transform(
            F.col("codes"),
            lambda c, s: F.element_at(
                F.element_at(F.element_at(lut_lit, F.col("list_id") + 1), s + 1), c + 1
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t,
    )
    cand = (
        coded.withColumn("adc", adc)
        .orderBy(F.asc("adc"), F.asc("id"))
        .limit(int(refine))
    )
    return knn_brute(cand, "id", "v", query_vec, k)


# ---------------------------------------------------------------------------
# OPQ-style rotation (parametric OPQ: PCA eigenbasis + eigenvalue-
# balanced dimension allocation — Ge et al., "Optimized Product
# Quantization", CVPR 2013). A pure rotation preserves inner products
# and norms, so cosine/top-k SEMANTICS are exactly unchanged; what
# changes is the subspace variance structure PQ quantizes, which is
# where PQ loses recall on anisotropic embeddings.
# ---------------------------------------------------------------------------


def opq_rotation(
    df: DataFrame, id_col: str, vec_col: str, dim: int, m: int = 8
) -> np.ndarray:
    """(dim × dim) orthonormal rotation: rows are PCA eigenvectors
    (from the exact integer moment pass, pipeline/embeddings.py)
    reordered so each of the ``m`` subspaces receives an eigenvalue-
    balanced slice — dims are assigned greedily by descending
    eigenvalue to the non-full subspace with the smallest log-variance
    product. Deterministic end to end (integer moments + deterministic
    eigenvector signs)."""
    from geomesa_hive_spark.pipeline import embeddings as E

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    mom = E.covariance_q(df, id_col, vec_col, dim).toPandas()
    comp, vals, _mean, _n = E.pca_components(mom, dim, dim)
    import math as _math

    # Greedy min-log-sum allocation, with logs SHIFTED non-negative
    # first: raw eigen-logs go negative for λ<1, and a min-product
    # greedy then death-spirals — the bucket that takes one tiny λ
    # stays the minimum and swallows every remaining tiny λ until
    # capacity (observed: 10³× product spread). Buckets all hold
    # exactly `sub` dims, so subtracting a constant per item shifts
    # every final sum equally — the balance objective is unchanged and
    # the greedy becomes sound (all increments ≥ 0).
    lv = [_math.log(max(float(v), 1e-30)) for v in vals]
    base = min(lv)
    buckets: list[list[int]] = [[] for _ in range(m)]
    logs = [0.0] * m
    for i in range(dim):  # vals sorted descending
        cand = min(
            (b for b in range(m) if len(buckets[b]) < sub),
            key=lambda b: (logs[b], b),
        )
        buckets[cand].append(i)
        logs[cand] += lv[i] - base
    order = [i for b in buckets for i in b]
    return comp[order]


def rotate_vecs(
    df: DataFrame, vec_col: str, rotation: np.ndarray, out_col: str
) -> DataFrame:
    """Arrow-batched rotation x' = R·x (one NumPy matmul per batch) —
    at 100 TB this runs once at write time next to PQ encoding; the
    per-row cost is d²/batch flops amortized to memory bandwidth."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    R = np.ascontiguousarray(rotation, dtype=np.float64)

    def _rot_fn(s):
        x = np.stack(s.to_numpy()).astype(np.float64)
        y = x @ R.T
        return pd.Series(list(y))

    # class-object annotations (not strings) so pandas_udf's type-hint
    # inference works with the locally-imported pandas
    _rot_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _rot = pandas_udf(_rot_fn, T.ArrayType(T.DoubleType()))
    return df.withColumn(out_col, _rot(F.col(vec_col)))
