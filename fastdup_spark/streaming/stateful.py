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
    Optional ``ttl`` bounds the state store (ProcessingTimeTimeout +
    eviction) for deployments that only guard a redelivery horizon —
    unbounded first-seen state at web scale is itself a 100 TB table.
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


def _empty_dup_events() -> pd.DataFrame:
    return pd.DataFrame({
        "content_hash": pd.Series([], dtype="int64"),
        "url": pd.Series([], dtype=object),
        "first_url": pd.Series([], dtype=object),
        "is_dup": pd.Series([], dtype=bool),
    })


_TTL_UNITS_MS = {"ms": 1, "millisecond": 1, "milliseconds": 1,
                 "second": 1000, "seconds": 1000, "s": 1000,
                 "minute": 60_000, "minutes": 60_000, "min": 60_000,
                 "hour": 3_600_000, "hours": 3_600_000, "h": 3_600_000,
                 "day": 86_400_000, "days": 86_400_000, "d": 86_400_000}


def _ttl_ms(ttl: str | int) -> int:
    """'10 minutes' / '1 second' / 500 -> milliseconds (GroupState's
    setTimeoutDuration only accepts an int)."""
    if isinstance(ttl, int):
        return ttl
    num, _, unit = ttl.strip().partition(" ")
    try:
        return int(float(num) * _TTL_UNITS_MS[unit.strip().lower()])
    except (ValueError, KeyError):
        raise ValueError(f"unparseable ttl {ttl!r}; use e.g. '10 minutes' or ms int")


def make_dup_events_fn(ttl: str | int | None = None):
    """Build the grouped-state function: state = (first_url,) per hash.

    The micro-batch's chunks are CONCATENATED before the one sort — a
    group's rows can stream in as multiple Arrow chunks, and sorting each
    chunk independently would make the 'first seen' winner depend on chunk
    arrival order instead of the documented (warc_ts, url) order. All
    column work is vectorized pandas (no per-row Python).

    With ``ttl`` set, every visit re-arms a processing-time timeout; a
    group idle past the ttl is evicted on the next micro-batch (the
    timed-out invocation emits no rows), after which its hash re-admits
    as first-seen."""
    ttl = _ttl_ms(ttl) if ttl is not None else None

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: Any) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield _empty_dup_events()
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            yield _empty_dup_events()
            return
        pdf = pdf.sort_values(["warc_ts", "url"], kind="mergesort",
                              ignore_index=True)
        first = state.get[0] if state.exists else pdf["url"].iloc[0]
        out = pd.DataFrame({
            "content_hash": pd.Series([key[0]] * len(pdf), dtype="int64"),
            "url": pdf["url"],
            "first_url": first,
            "is_dup": pdf["url"].ne(first),
        })
        state.update((first,))
        if ttl is not None:
            state.setTimeoutDuration(ttl)
        yield out
    return fn


# module-level default (importable / picklable name kept for API stability)
_dup_events_fn = make_dup_events_fn(None)


def streaming_exact_dup_events(pages: DataFrame, text_col: str = "text",
                               ttl: str | int | None = None) -> DataFrame:
    """pages stream -> continuous (content_hash, url, first_url, is_dup).

    Exact dedup keyed on xxhash64 of the text column; the first-seen url
    per hash lives in the state store. Default is permanent state
    (NoTimeout — every future dup is caught); pass ``ttl`` (duration
    string like "10 minutes", or ms) to bound the store to a redelivery
    horizon: hashes idle past the ttl are evicted and re-admit as
    first-seen.

    Operational note: with ``ttl`` set, a ``Trigger.AvailableNow`` query
    does NOT self-terminate after draining its input — armed timeouts keep
    the state-cleanup trigger alive. That is the right behavior for the
    operator's continuous deployments; batch-style drains should stop()
    the query once its data rows have landed (timed-out keys are processed
    within the same micro-batch as new data, so eviction is not lost)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = pages.select(
        F.xxhash64(F.col(text_col)).alias("content_hash"),
        "url", "warc_ts")
    timeout = (GroupStateTimeout.NoTimeout if ttl is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return keyed.groupBy("content_hash").applyInPandasWithState(
        make_dup_events_fn(ttl), DUP_EVENT_SCHEMA, _STATE_SCHEMA,
        "append", timeout)


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
