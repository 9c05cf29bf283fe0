"""Structured Streaming front-end for continuous page ingest (§2.8).

`incremental_update` is the batch-over-snapshot core; this wires it behind a
real `readStream` so a deployment can point at a landing directory (or Kafka
source — swap the reader) and keep the dedup state continuously current:

    fd = FastdupSpark(spark, work_dir)
    fd.run(initial_pages)
    q = stream_pages(fd, "s3a://bucket/landing/", trigger_available_now=True)
    q.awaitTermination()

Each micro-batch flows through the same crash-repairing append path as
`fd.update()` (extracted-last ordering + per-stage anti-joins), so the
exactly-once story is identical whether batches arrive via update() calls or
the stream. Watermarking is unnecessary: idempotency comes from the doc_id
anti-join against `extracted` inside incremental_update, so late/duplicate
redeliveries drop out of each batch (the warc_ts high-water mark is
reporting-only).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("html", BinaryType(), True),
    StructField("lang", StringType(), True),
])


def stream_pages(fd, input_dir: str, checkpoint_dir: str | None = None,
                 trigger_available_now: bool = False,
                 max_files_per_trigger: int | None = None):
    """Start a file-source stream feeding micro-batches into the engine.

    Returns the StreamingQuery. The foreachBatch sink calls
    `incremental_update` — streaming and batch ingestion share one code path
    (and one idempotency contract)."""
    from fastdup_spark.streaming.incremental import incremental_update

    reader = fd.spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def _sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        incremental_update(fd, batch_df)

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation",
        checkpoint_dir or f"{fd.store.work_dir}/_stream_checkpoint")
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
