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
