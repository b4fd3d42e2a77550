"""Streaming event rollups: watermarked windows, session windows, custom state.

Extension beyond the reference (which has zero streaming code — SURVEY.md
§0). Design choices for scale:

- **Event-time + watermark** everywhere: state is bounded, late rows are
  dropped deterministically, and the windowed agg is a streaming partial
  aggregation (map-side combine before the shuffle), so throughput scales
  with executors, not with state size.
- **``F.session_window``** for gap-based sessions — the built-in operator
  merges overlapping windows inside the state store; preferred over custom
  state when the output is per-session aggregates.
- **``applyInPandasWithState``** only for the genuinely custom stateful
  shape (running per-user session counters that built-ins can't express):
  Arrow-batched, grouped by user, timeout-driven eviction.
"""

from __future__ import annotations

import os
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DateType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

__all__ = [
    "normalize_event_ts",
    "read_events_stream",
    "hourly_rollup",
    "session_rollup",
    "stateful_sessions",
    "stateful_anomaly",
    "batch_anomaly",
    "batch_sessions",
    "enrich_stream_spatial",
    "enrich_with_dim",
    "streaming_dedup",
    "dedup_fingerprint",
    "batch_dedup",
    "streaming_contamination_filter",
    "run_to_memory",
    "quantile_sketch_rollup",
    "quantile_from_sketch",
    "dd_sketch_rollup",
    "dd_quantile_from_sketch",
]

def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the event timestamp to session-TZ ``TimestampType``.

    The events parquet has shipped with three physical encodings across
    environments: TIMESTAMP(NANOS) surfaced as long (legacy
    ``nanosAsLong``), TIMESTAMP_NTZ (Spark 4.x reads non-UTC-adjusted
    parquet timestamps natively), and plain TIMESTAMP. Watermarks and
    ``date_format`` need TimestampType; sessions here always run with
    ``spark.sql.session.timeZone=UTC`` so the NTZ→LTZ cast is
    value-preserving and matches DuckDB's micro-truncated TIMESTAMP.
    """
    t = df.schema[col].dataType
    if isinstance(t, LongType):  # raw nanos → floor to micros
        # integer `div`, not `/`: epoch nanos (~1.7e18) exceed 2^53, so
        # double division can land 1 µs off vs DuckDB's exact truncation
        return df.withColumn(
            col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
        )
    if isinstance(t, TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    if isinstance(t, DateType):  # date32 → midnight-UTC timestamp
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over an events parquet directory.

    ``maxFilesPerTrigger`` bounds per-micro-batch work; schema is taken
    from the existing files so the batch and stream plans agree. The
    event timestamp is normalized to TimestampType (see
    ``normalize_event_ts``) so watermarks resolve.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", str(max_files_per_trigger)
    )
    if os.path.isfile(path):
        # the file source lists a directory; point it at the parent and
        # glob down to the single file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return normalize_event_ts(reader.parquet(path))


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour count/sum per event_type with a watermark.

    Streaming twin of the batch ``events_hourly`` query: same grouping
    keys, incremental execution with bounded state.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def session_rollup(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessions via the built-in ``session_window`` operator."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


_SESS_STATE_SCHEMA = StructType(
    [
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
        StructField("last_ts", LongType()),  # epoch MICROS of last event seen
    ]
)

_SESS_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _session_fold(ts_us_sorted, state_tuple, gap_us: int):
    """Sequential gap fold shared VERBATIM by the streaming sessionizer
    and its batch twin — integer epoch-MICROS arithmetic both within a
    batch and against carried state, so a gap straddling a micro-batch
    boundary is measured exactly the way the batch query measures it
    (truncated whole seconds would shrink cross-batch gaps by up to 1 s
    near the threshold)."""
    n_sessions, n_events, last_ts = state_tuple
    for t in ts_us_sorted:
        if last_ts is None or (t - last_ts) > gap_us:
            n_sessions += 1
        last_ts = int(t)
        n_events += 1
    return n_sessions, n_events, last_ts


def _sessionize(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState, gap_s: float = 1800.0
):
    """Per-user running sessionizer: counts gap-delimited sessions.

    State is three longs; each micro-batch folds its (sorted) timestamps
    into the running count via :func:`_session_fold`. Emits the current
    totals every batch — update-mode semantics matching the batch
    ``events_sessions`` query.
    """
    gap_us = int(gap_s * 1_000_000)
    if state.exists:
        n_sessions, n_events, last_ts = state.get
    else:
        n_sessions, n_events, last_ts = 0, 0, None
    for pdf in pdfs:
        ts = (pd.to_datetime(pdf["ts"]).astype("int64") // 1000).to_numpy()
        ts.sort()
        n_sessions, n_events, last_ts = _session_fold(
            ts, (n_sessions, n_events, last_ts), gap_us
        )
    state.update((int(n_sessions), int(n_events), int(last_ts)))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_sessions": [n_sessions],
            "n_events": [n_events],
        }
    )


def stateful_sessions(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user session counts via
    ``applyInPandasWithState`` (Arrow-batched grouped state)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=_SESS_OUT_SCHEMA,
        stateStructType=_SESS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_sessions(events: DataFrame, gap_s: float = 1800.0) -> DataFrame:
    """Batch twin of :func:`stateful_sessions`: the IDENTICAL
    :func:`_session_fold` over each user's full sorted history in one
    pandas group — the driver-facing hash gate for the
    applyInPandasWithState sessionizer (the streaming path itself
    cannot be DuckDB-oracled, but its gap arithmetic is exercised and
    hash-compared here)."""
    gap_us = int(gap_s * 1_000_000)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = (pd.to_datetime(pdf["ts"]).astype("int64") // 1000).to_numpy()
        ts.sort()
        n_sessions, n_events, _ = _session_fold(ts, (0, 0, None), gap_us)
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    # explicit repartition: the per-user fold is Python-compute-heavy
    # while its shuffle bytes are tiny, so AQE coalesces it onto a few
    # tasks (observed 3/32 at sf0.1 — input-byte detection cannot see
    # compute cost); user-specified numPartitions is exempt
    n_part = int(events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        events.repartition(n_part, "user_id")
        .groupBy("user_id")
        .applyInPandas(run, _SESS_OUT_SCHEMA)
    )


def enrich_stream_spatial(events: DataFrame, lon_col, lat_col) -> DataFrame:
    """Attach geom/bbox/z2 columns to a streaming DataFrame.

    Works unchanged on streams because the ST surface is stateless pandas
    UDFs + native expressions — demonstrates that spatial filtering and
    Z2 keying compose with Structured Streaming sinks (e.g. partitionBy
    z2 on a parquet sink)."""
    from geomesa_hive_spark.functions import api as ST

    geom = ST.st_makepoint(F.col(lon_col).cast("double"), F.col(lat_col).cast("double"))
    out = events.withColumn("geom", geom)
    out = out.withColumn("bbox", ST.st_extentfromgeom(F.col("geom")))
    out = out.withColumn("z2", ST.st_partitioncentroid(F.col("geom"), F.lit(6)))
    return out


def streaming_dedup(
    events: DataFrame,
    text_col: str,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact dedup IN THE STREAM: keep the first arrival of each
    normalized-text fingerprint, drop later duplicates.

    ``dropDuplicatesWithinWatermark`` on the md5 fingerprint — the
    state store holds one entry per distinct fingerprint seen within
    the watermark horizon, so state is bounded by (distinct docs per
    horizon), not by stream length; without the watermark the state
    grows forever, which is the failure mode that kills naive
    streaming dedup at 100 TB/day ingest. The fingerprint is the same
    expression the batch ``exact_duplicates`` uses, so stream and batch
    agree on what counts as a duplicate."""
    return (
        events.withColumn("__fp", dedup_fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def dedup_fingerprint(text_col: str):
    """The dedup identity shared VERBATIM by the streaming dedup and
    its batch twin: md5 of the canonical normalized text (same
    normalize_text the batch exact-dedup family uses)."""
    from geomesa_hive_spark.pipeline.text import normalize_text

    return F.md5(normalize_text(F.col(text_col)))


def batch_dedup(
    events: DataFrame,
    text_col: str,
    ts_col: str = "ts",
    order_cols: tuple = (),
) -> DataFrame:
    """Batch twin of ``streaming_dedup``: IDENTICAL fingerprint
    expression, first-arrival-wins made deterministic — the keeper is
    the minimum ``(ts_col, *order_cols)`` row per fingerprint (the
    streaming operator's keeper is the first micro-batch arrival,
    which equals this whenever the stream replays in event order).
    ``dropDuplicatesWithinWatermark`` itself refuses batch frames, so
    the twin carries the window formulation; the shared fingerprint is
    what the contract gate hash-verifies."""
    from pyspark.sql import Window

    w = Window.partitionBy("__fp").orderBy(ts_col, *order_cols)
    return (
        events.withColumn("__fp", dedup_fingerprint(text_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__fp")
    )


def streaming_contamination_filter(
    docs: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    eval_text_col: str | None = None,
    ngram_n: int = 5,
    min_shared: int = 2,
) -> DataFrame:
    """Decontamination AT INGEST: drop stream documents that share ≥
    ``min_shared`` distinct word-n-grams with a static eval/benchmark
    set, before they ever land in the lake.

    STATELESS by construction: a per-row count of doc grams that hit
    the eval set needs no watermark, no state store, no stream-stream
    join (a groupBy-then-anti-join formulation would be a stateful agg
    feeding an unsupported stream join). The eval gram-code index is
    collected once (bounded — benchmarks are 10³-10⁵ docs vs the
    unbounded stream) and broadcast to executors as a hash set; the
    membership count runs in an Arrow-vectorized pandas UDF with O(1)
    per gram — the native alternative (array_intersect against a
    million-element literal) rebuilds a hash set per ROW. Gram codes
    are the same md5-prefix longs as the batch ``ngram_contamination``,
    so the stream filter and a batch backfill agree on what counts as
    contaminated."""
    from pyspark.sql.functions import pandas_udf

    from geomesa_hive_spark.pipeline.dedup import _grams_from_tokens, gram_code32
    from geomesa_hive_spark.pipeline.text import word_tokens

    eval_text_col = eval_text_col or text_col
    codes = frozenset(
        r.g
        for r in (
            eval_df.select(
                word_tokens(F.lower(F.col(eval_text_col))).alias("toks")
            )
            .select(F.explode(_grams_from_tokens("toks", ngram_n)).alias("gram"))
            .select(gram_code32(F.col("gram")).alias("g"))
            .distinct()
            .collect()  # bounded: the benchmark gram index
        )
    )
    bset = docs.sparkSession.sparkContext.broadcast(codes)

    @pandas_udf("integer")
    def _shared(grams: pd.Series) -> pd.Series:
        s = bset.value
        return grams.map(
            lambda arr: 0 if arr is None else sum(1 for g in arr if g in s)
        ).astype("int32")

    doc_grams = F.transform(
        _grams_from_tokens(word_tokens(F.lower(F.col(text_col))), ngram_n),
        lambda gr: F.conv(F.substring(F.md5(gr), 1, 8), 16, 10).cast("long"),
    )
    return (
        docs.withColumn("__shared", _shared(doc_grams))
        .filter(F.col("__shared") < min_shared)
        .drop("__shared")
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drain all available input into an in-memory table and stop.

    Test/CI helper: ``availableNow`` processes the whole backlog in
    bounded micro-batches then terminates — the streaming equivalent of a
    batch run, used to check stream/batch parity.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


_ANOM_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("ewma", DoubleType()),
        StructField("n_anomalies", LongType()),
    ]
)
_ANOM_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n", LongType()),
        StructField("ewma", DoubleType()),
        StructField("n_anomalies", LongType()),
    ]
)


def _anomaly_fold(vals, state_tuple, alpha: float, factor: float, warmup: int):
    """Sequential EWMA fold shared VERBATIM by the streaming operator and
    the batch twin — splitting the value sequence across micro-batches
    cannot change the result because the carried state is the exact
    float EWMA, not a summary."""
    n, ewma, n_anom = state_tuple
    for v in vals:
        v = float(v)
        if n >= warmup and v > factor * ewma:
            n_anom += 1
        ewma = v if n == 0 else alpha * v + (1.0 - alpha) * ewma
        n += 1
    return n, ewma, n_anom


def _anomaly(key, pdfs, state: GroupState, alpha=0.2, factor=3.0, warmup=5):
    """Per-user streaming EWMA rate-anomaly detector: flags events whose
    value exceeds ``factor``× the running EWMA (after a warmup count),
    then folds the value in. Values are processed in event-time order
    WITHIN each micro-batch; cross-batch order is arrival order — the
    standard streaming caveat (exact global order would need the batch
    job)."""
    if state.exists:
        st = state.get
    else:
        st = (0, 0.0, 0)
    for pdf in pdfs:
        pdf = pdf.sort_values("ts", kind="mergesort")
        st = _anomaly_fold(pdf["value"].to_numpy(), st, alpha, factor, warmup)
    state.update((int(st[0]), float(st[1]), int(st[2])))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n": [st[0]],
            "ewma": [st[1]],
            "n_anomalies": [st[2]],
        }
    )


def stateful_anomaly(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user EWMA anomaly counts via
    ``applyInPandasWithState`` — the streaming shape for per-entity
    drift/abuse detection. State is 3 scalars per user; emits running
    totals every micro-batch (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _anomaly,
        outputStructType=_ANOM_OUT_SCHEMA,
        stateStructType=_ANOM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class _AnomalyProcessor:
    """transformWithStateInPandas twin of :func:`_anomaly` — defined
    lazily inside :func:`stateful_anomaly_tws` would re-create the
    class per call; module level keeps it picklable. Runs the SAME
    ``_anomaly_fold`` verbatim, so old-API, new-API, and batch results
    are a three-way bit-identical parity set (pytest-pinned)."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("anom", _ANOM_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        st = self._state.get() if self._state.exists() else (0, 0.0, 0)
        for pdf in rows:
            pdf = pdf.sort_values("ts", kind="mergesort")
            st = _anomaly_fold(
                pdf["value"].to_numpy(), st, 0.2, 3.0, 5
            )
        self._state.update((int(st[0]), float(st[1]), int(st[2])))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n": [st[0]],
                "ewma": [st[1]],
                "n_anomalies": [st[2]],
            }
        )

    def close(self) -> None:
        pass


def stateful_anomaly_tws(events: DataFrame) -> DataFrame:
    """The EWMA anomaly scorer on Spark 4's NEW arbitrary-state API
    (``transformWithStateInPandas`` / StatefulProcessor — the
    successor to applyInPandasWithState, with typed state handles,
    timers, and multi-state support this operator deliberately keeps
    minimal): one ValueState of 3 scalars per user, the same
    ``_anomaly_fold`` verbatim. Exists alongside
    :func:`stateful_anomaly` as the migration target — the parity
    pytest pins old API ≡ new API ≡ batch fold, so a user can switch
    APIs without a result change.

    Requires ``google.protobuf`` (the new API's state server speaks
    protobuf); raises ImportError with a clear message where the
    dependency is absent — this container, for one — in which case
    :func:`stateful_anomaly` is the supported path."""
    try:
        from google.protobuf import descriptor as _d  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf "
            "(Spark's new-API state server protocol); use "
            "stateful_anomaly (applyInPandasWithState) here"
        ) from exc
    # second hard prerequisite (round-10 review): TWS needs state-store
    # column families, which the default HDFSBackedStateStoreProvider
    # rejects at runtime — require RocksDB explicitly rather than fail
    # deep inside the first micro-batch
    provider = events.sparkSession.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    if "RocksDB" not in (provider or ""):
        raise RuntimeError(
            "transformWithStateInPandas requires the RocksDB state "
            "store: set spark.sql.streaming.stateStore.providerClass="
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass at call time so importing this module never requires the
    # new API to exist (older Sparks)
    proc = type(
        "_AnomalyProcessorTWS", (_AnomalyProcessor, StatefulProcessor), {}
    )()
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=_ANOM_OUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


def batch_anomaly(
    events: DataFrame, order_cols: "tuple[str, ...]" = ("ts",)
) -> DataFrame:
    """Batch twin of :func:`stateful_anomaly`: the same fold over the
    full per-user event-time-ordered history (applyInPandas).
    ``order_cols``: the EWMA depends on value ORDER, so callers that
    need a deterministic result across partitionings must pass a
    tie-breaking total order (e.g. ``("ts", "event_id")``) — a bare ts
    sort leaves equal-timestamp events in Arrow arrival order."""
    schema = _ANOM_OUT_SCHEMA

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols), kind="mergesort")
        n, ewma, n_anom = _anomaly_fold(
            pdf["value"].to_numpy(), (0, 0.0, 0), 0.2, 3.0, 5
        )
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n": [n],
                "ewma": [ewma],
                "n_anomalies": [n_anom],
            }
        )

    # same AQE-blindness pin as batch_sessions: tiny bytes, Python work
    n_part = int(events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        events.repartition(n_part, "user_id")
        .groupBy("user_id")
        .applyInPandas(run, schema)
    )


def stream_interval_join(
    events: DataFrame,
    left_type: str = "view",
    right_type: str = "purchase",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join: every ``right_type``
    event joined to the same user's ``left_type`` events in the
    preceding ``horizon`` (attribution: which views led to a purchase).

    This is the canonical Structured Streaming join shape that stays
    BOUNDED: both sides carry a watermark and the join condition
    time-bounds right against left (``l.ts <= r.ts <= l.ts + horizon``),
    so the state store can evict a row as soon as the other side's
    watermark passes its horizon — without the time bound a
    stream-stream inner join would buffer both streams forever. State
    is keyed by (user_id, time-range): at 100 TB/day the state held at
    any moment is only ``watermark + horizon`` worth of events, however
    long the streams run.

    Self-join friendly: both inputs may be filtered views of the SAME
    source stream (the attribution case), which Spark plans as one scan
    feeding both join legs.

    ``how="left_outer"`` is the UNCONVERTED-VIEWS report: every left
    event that found no right partner inside its horizon is emitted
    with NULL right columns. In streaming this is exactly the shape
    Structured Streaming supports for stream-stream outer joins — the
    time bound plus both watermarks let the engine PROVE a left row
    can no longer match, at which point the NULL-padded row is emitted
    and its state evicted (an outer join without the time bound is
    rejected by Spark because that proof is impossible). In batch the
    same plan is a plain left outer join, which is what the oracle
    replays.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner|left_outer, got {how!r}")
    # watermark BEFORE the per-leg filters, on the shared source: with
    # per-leg watermark nodes the global watermark is the MIN across
    # nodes, and the purchase leg's node only ever sees purchase rows —
    # so a lull in purchases stalls the global watermark and left_outer
    # NULL-padded rows are never emitted (found by the outer-join
    # pytest; the pre-filter node sees every event, so the watermark
    # tracks the source)
    evw = events.withWatermark("ts", watermark)
    l = (
        evw.filter(F.col("event_type") == left_type)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("ts").alias("l_ts"),
            F.col("value").alias("l_value"),
        )
    )
    r = (
        evw.filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("r_ts"),
            F.col("value").alias("r_value"),
        )
    )
    joined = l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {horizon}")),
        how,
    )
    return joined.select(
        F.col("l_user").alias("user_id"),
        F.date_format("l_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format("r_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.round(F.col("l_value"), 4).alias("view_value"),
        F.round(F.col("r_value"), 4).alias("purchase_value"),
    )


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    on,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static dimension enrichment — the Kappa-architecture
    lookup join: a streaming fact frame joined to a BOUNDED dimension
    (customer, device, geo) with the dimension broadcast, so each
    micro-batch pays a hash-probe per row and the stream side NEVER
    shuffles and holds ZERO state (unlike stream-stream joins, there
    is no watermark, no buffered rows — the join is stateless because
    the static side is complete by definition).

    Works identically on batch frames (a batch join is the same plan),
    which is what lets the contract gate hash-verify the operator's
    real expressions against a DuckDB replay while the true
    micro-batch path is pinned by a stream-vs-batch parity test.

    Spark re-reads the static side's files each micro-batch (that is
    the documented way dimension updates become visible mid-stream);
    at 100 TB-fact / 1 GB-dim scale, keep the dimension compact or
    pre-filter its columns — `broadcast_dim=False` falls back to
    letting the planner choose when a dimension outgrows broadcast.

    ``how`` must keep the stream side intact ('left' or 'inner'):
    outer joins on the static side are not defined for unbounded
    streams and Spark rejects them at analysis."""
    if how not in ("left", "inner"):
        raise ValueError(f"stream-static join must be left/inner (got {how!r})")
    d = F.broadcast(dim) if broadcast_dim else dim
    return events.join(d, on=on, how=how)


def quantile_sketch_rollup(
    events: DataFrame,
    lo: float,
    hi: float,
    m: int = 120,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling 1-hour quantile SKETCH per event_type — the streaming
    member of the stored-sketch family (pipeline/sketches.py
    quantile_sketch_build shares the bucket arithmetic; this wraps it
    in the watermarked window grouping).

    The streaming-native design point: a quantile NEEDS a cumulative
    pass (a window function), which structured streaming cannot run
    after a streaming aggregation — so the stream maintains the
    MERGEABLE artifact instead: (hour, event_type, bucket, cnt) with
    bounded state (windows × types × m rows, independent of event
    volume), and :func:`quantile_from_sketch` extracts any quantile
    set downstream as a cheap batch select over the tiny sketch table.
    Integer counts merge exactly across micro-batches by construction
    (sum aggregation), so stream output ≡ the batch twin run verbatim
    on the same rows — the gate's hash and the pytest's availableNow
    parity both pin it."""
    from geomesa_hive_spark.pipeline.sketches import _q_bucket

    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour").alias("win"),
            "event_type",
            _q_bucket(F.col("value"), lo, hi, m).alias("bucket"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "bucket",
            "cnt",
        )
    )


def dd_sketch_rollup(
    events: DataFrame,
    step: int = 10_000,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling 1-hour RANGE-FREE DD quantile sketch per event_type —
    the DD member of the streaming sketch family
    (:func:`quantile_sketch_rollup` is the fixed-grid one): same
    watermarked window grouping, but log buckets
    (pipeline/sketches._dd_key shares the bucket arithmetic) so no
    [lo, hi) grid has to be chosen before the stream starts — the
    property that matters for a stream, whose value range is unknown
    up front — and every downstream estimate carries the guaranteed
    ≤ e^(step/2e6) − 1 relative error. Bounded state: windows × types
    × occupied-log-buckets rows (≈230·decades per type at the default
    step), independent of event volume. Integer counts merge exactly
    across micro-batches (sum aggregation), so stream output ≡ the
    batch twin run verbatim — gate hash + availableNow parity pytest
    pin it. NULL and NaN values are excluded like dd_sketch_build."""
    from geomesa_hive_spark.pipeline.sketches import _dd_key

    v = F.col("value")
    return (
        events.withWatermark("ts", watermark)
        .filter(v.isNotNull() & ~F.isnan(v.cast("double")))
        .groupBy(
            F.window("ts", "1 hour").alias("win"),
            "event_type",
            _dd_key(v, int(step)).alias("bucket"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "bucket",
            "cnt",
        )
    )


def dd_quantile_from_sketch(
    sketch: DataFrame,
    qs_permille: list,
    step: int = 10_000,
) -> DataFrame:
    """(hour, event_type, q_permille, side, mid_mnat, est) from a
    stored/streamed :func:`dd_sketch_rollup` table — delegates to
    pipeline/sketches.dd_quantile over the (hour, event_type)
    grouping. Runs over the bounded sketch, never the events."""
    from geomesa_hive_spark.pipeline.sketches import dd_quantile

    return dd_quantile(
        sketch, ["hour", "event_type"], qs_permille, int(step)
    )


def quantile_from_sketch(
    sketch: DataFrame,
    qs_permille: list,
    lo: float,
    hi: float,
    m: int = 120,
) -> DataFrame:
    """(hour, event_type, q_permille, est) from a stored/streamed
    :func:`quantile_sketch_rollup` table — delegates to
    pipeline/sketches.quantile_estimate over the (hour, event_type)
    grouping. Runs over the m-bounded sketch, never the events."""
    from geomesa_hive_spark.pipeline.sketches import quantile_estimate

    return quantile_estimate(
        sketch, ["hour", "event_type"], qs_permille, lo, hi, m
    )
