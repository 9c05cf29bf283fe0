"""Custom stateful streaming operators (applyInPandasWithState) — §2.8.

The batch engine resolves duplicates per snapshot; these operators keep the
dedup state INSIDE Structured Streaming's state store, so duplicate events
are emitted continuously, across micro-batches and across query restarts
(state survives via the checkpoint — the streaming analog of the stage-store
resume contract). The reference has no streaming layer at all; this is the
Spark-native capability its users graduate to at web scale.

Two operators:

  * `streaming_exact_dup_events` — per-content-hash first-seen state
    (applyInPandasWithState, Arrow-batched, no per-row Python): every
    incoming page emits an event row tagged is_dup vs the first url ever
    seen with that hash, no matter how many batches or restarts ago.
  * `streaming_hourly_counts` — event-time tumbling-window counts with a
    watermark: late rows inside the lateness bound still count; windows
    finalize (append mode) once the watermark passes, the streaming form
    of the batch `event_hourly_windows` oracle query.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, LongType, StringType, StructField, StructType,
)

DUP_EVENT_SCHEMA = StructType([
    StructField("content_hash", LongType(), False),
    StructField("url", StringType(), False),
    StructField("first_url", StringType(), False),
    StructField("is_dup", BooleanType(), False),
])

_STATE_SCHEMA = StructType([StructField("first_url", StringType(), True)])


def _dup_events_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: Any) -> Iterator[pd.DataFrame]:
    """Grouped-state function: state = (first_url,) per content hash.

    Batch-internal order is made deterministic by (warc_ts, url) so the
    'first seen' winner never depends on task scheduling."""
    first = state.get[0] if state.exists else None
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["warc_ts", "url"], kind="mergesort")
        for url in pdf["url"]:
            if first is None:
                first = url
                out.append((key[0], url, url, False))
            else:
                out.append((key[0], url, first, url != first))
    state.update((first,))
    yield pd.DataFrame(out, columns=[f.name for f in DUP_EVENT_SCHEMA.fields])


def streaming_exact_dup_events(pages: DataFrame,
                               text_col: str = "text") -> DataFrame:
    """pages stream -> continuous (content_hash, url, first_url, is_dup).

    Exact dedup keyed on xxhash64 of the text column; the first-seen url
    per hash lives in the state store (NoTimeout: dedup state is permanent
    by design — bound it with a timeout in deployments that only guard a
    redelivery horizon)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = pages.select(
        F.xxhash64(F.col(text_col)).alias("content_hash"),
        "url", "warc_ts")
    return keyed.groupBy("content_hash").applyInPandasWithState(
        _dup_events_fn, DUP_EVENT_SCHEMA, _STATE_SCHEMA,
        "append", GroupStateTimeout.NoTimeout)


def streaming_hourly_counts(pages: DataFrame, lateness: str = "2 hours",
                            ts_col: str = "warc_ts") -> DataFrame:
    """Event-time tumbling 1-hour counts with a watermark (late rows within
    ``lateness`` still land in their window; append-mode sinks emit each
    window once, when the watermark passes its end)."""
    return (
        pages.withWatermark(ts_col, lateness)
        .groupBy(F.window(F.col(ts_col), "1 hour").alias("w"))
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "n_pages")
    )
