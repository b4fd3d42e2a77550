"""Streaming upsert sink into a merge-on-read table — Delta's
streaming MERGE pattern on the plain-parquet MOR table of
``sources/manifest.py``: every micro-batch commits ONE delta through
the optimistic commit protocol, stamped with a per-(query, batch)
transaction id so a replayed batch (foreachBatch re-runs after a
failure) lands exactly once.

Why this shape at 100 TB: a stream of point updates must never
rewrite base files (O(file) write amplification per touched row);
committing each micro-batch as an O(batch) delta file set + one
commit-log record is the only write path that keeps up, and the
existing ``read_snapshot`` / ``compact`` machinery already provides
the read and maintenance sides. Exactly-once comes from the commit
log itself (idempotent ``txn_id``), NOT from the checkpoint alone —
the checkpoint only bounds how far the source replays.

Reference scope: the reference has no streaming at all (static Hive
tables); this is the pipeline-extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.manifest import write_delta

__all__ = ["mor_sink", "stream_upsert_mor"]


def mor_sink(path: str, key_col: str, delete_col: str | None = None):
    """A ``foreachBatch`` function committing each micro-batch as one
    MOR delta. Rows where ``delete_col`` is true become tombstones
    (key-only deletes); everything else upserts. The txn id is
    ``mor-<batch_id>`` — stable across replays of the same batch."""

    def _sink(bdf: DataFrame, batch_id: int) -> None:
        txn = f"mor-{batch_id}"
        if delete_col is not None:
            dels = bdf.filter(F.col(delete_col)).select(key_col)
            ups = bdf.filter(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            ).drop(delete_col)
            # emptiness probes, not counts: isEmpty() is a limit-1
            # early-exit where count() aggregates the whole batch —
            # the batch is then scanned fully only by the write itself
            has_up, has_del = not ups.isEmpty(), not dels.isEmpty()
            if not has_up and not has_del:
                return
            write_delta(
                ups if has_up else None, path, key_col,
                delete_keys=dels if has_del else None, txn_id=txn,
            )
        else:
            if bdf.isEmpty():
                return
            write_delta(bdf, path, key_col, txn_id=txn)

    return _sink


def stream_upsert_mor(
    stream_df: DataFrame,
    path: str,
    key_col: str,
    checkpoint: str,
    delete_col: str | None = None,
    available_now: bool = True,
):
    """Run ``stream_df`` into the MOR table at ``path`` and (with
    ``available_now``) block until the backlog is drained. Returns the
    finished/running StreamingQuery."""
    w = (
        stream_df.writeStream
        .foreachBatch(mor_sink(path, key_col, delete_col))
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        q = w.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return w.start()
