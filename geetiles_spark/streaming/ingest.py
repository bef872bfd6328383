"""Structured-Streaming incremental ingestion of the docs table.

The reference's incremental story is ``skip_if_exists`` file checks
(``gee.py:267-274``); the engine's batch equivalent is the anti-join resume
in :func:`geetiles_spark.sources.chips.ingest_chips_resumable`.  This module
adds the streaming shape on top: consume the docs table as a file stream
with ``Trigger.AvailableNow`` (process-everything-then-stop), extract media
references positionally, and append the chip work-queue to a sink with
exactly-once progress tracked by the checkpoint — new doc files dropped into
the directory are picked up by the next run, already-processed files never
reprocess.

At production scale the source is the Iceberg table's incremental snapshot
stream and the sink a ``MERGE``-writing ``foreachBatch``; the watermark /
stateful operators are unnecessary because media extraction is stateless
per document (span-sequence invariant).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sources.docs import DOC_SCHEMA


def stream_events_hourly(
    spark: SparkSession,
    events_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
) -> int:
    """Watermarked windowed aggregation over a streaming events source: the
    streaming twin of the batch ``events_hourly`` contract query.

    ``withWatermark(ts, 1 hour)`` bounds state for late data; append mode
    emits each hourly (window, event_type) row exactly once, when the
    watermark passes the window end — re-running the same trigger with no
    new files appends nothing (checkpointed exactly-once).  Note append
    semantics: windows newer than (max ts - watermark) stay open in the
    state store until later data closes them.
    """
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, "
                                "event_type string, value double, props string")
        .option("maxFilesPerTrigger", 64)
        .parquet(events_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"), "event_type",
            "n_events", "sum_value",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    # AvailableNow may run several micro-batches; lastProgress is only the
    # final (often empty) one — total over recentProgress instead
    return int(sum(p["numInputRows"] for p in q.recentProgress))


def stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> int:
    """Custom stateful streaming operator: per-user sessionization with
    ``applyInPandasWithState`` (event-time timeout).

    The streaming counterpart of the batch ``events_sessions`` query: events
    group by user; a session closes when a ``gap_minutes`` silence follows
    it.  Per micro-batch the handler merges new events with the held open
    session, emits every session closed by an in-batch gap, and parks the
    open tail in the state store with an event-time timeout at
    ``session_end + gap``; when the watermark passes that point the state
    times out and the session flushes.  Exactly-once via the checkpoint.
    """
    import datetime

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap = datetime.timedelta(minutes=gap_minutes)

    def sessionize(key, pdf_iter, state):
        user_id = key[0]
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "start_us": start_us,
                  "end_us": end_us, "n_events": n}]
            )
            return
        ts = []
        for pdf in pdf_iter:
            ts.append(pdf["ts"])
        ts = pd.concat(ts).sort_values()
        us = (ts.astype("int64") // 1000).to_numpy()  # microseconds
        cur = state.get if state.exists else None
        out = []
        for t in us:
            if cur is None:
                cur = (int(t), int(t), 0)
            start_us, end_us, n = cur
            if t - end_us > gap.total_seconds() * 1e6:
                out.append((start_us, end_us, n))
                cur = (int(t), int(t), 1)
            else:
                cur = (start_us, max(end_us, int(t)), n + 1)
        state.update(cur)
        state.setTimeoutTimestamp(int(cur[1] / 1000 + gap.total_seconds() * 1000))
        if out:
            yield pd.DataFrame(
                [
                    {"user_id": user_id, "start_us": s, "end_us": e, "n_events": n}
                    for s, e, n in out
                ]
            )

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, "
                                "event_type string, value double, props string")
        .option("maxFilesPerTrigger", 64)
        .parquet(events_dir)
    )
    sessions = (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize,
            "user_id long, start_us long, end_us long, n_events long",
            "start_us long, end_us long, n long",
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    q = (
        sessions.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    return int(sum(p["numInputRows"] for p in q.recentProgress))


def stream_media_refs(
    spark: SparkSession,
    docs_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
) -> int:
    """Run one AvailableNow pass: docs parquet dir -> media-ref rows appended
    to ``sink_dir``.  Returns rows appended this pass (0 when nothing new).
    """
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(docs_dir)
    )
    refs = (
        stream.select("doc_id", F.posexplode("spans").alias("span_pos", "span"))
        .filter(F.col("span.kind") == "media")
        .select(
            "doc_id",
            "span_pos",
            F.col("span.media_ref").alias("media_ref"),
            F.split_part(F.col("span.media_ref"), F.lit("/"), F.lit(1)).alias("dataset"),
            F.split_part(F.col("span.media_ref"), F.lit("/"), F.lit(2)).alias("tile_id"),
        )
    )
    q = (
        refs.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    return int(progress["numInputRows"]) if progress else 0
