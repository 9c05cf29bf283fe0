"""applyInPandasWithState + watermark operators (§2.8): dedup state must
survive across micro-batches AND across query restarts (checkpoint), and
event-time windows must finalize under the watermark."""

import datetime as dt
import os
import time

import pandas as pd

from pyspark.sql.types import (
    StringType, StructField, StructType, TimestampType,
)

from fastdup_spark.streaming.stateful import (
    make_dup_events_fn, streaming_exact_dup_events, streaming_hourly_counts,
)

SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("text", StringType(), False),
])


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


def _run_stream(spark, indir, ckpt, transform, sink_rows):
    stream = spark.readStream.schema(SCHEMA).parquet(indir)
    q = (
        transform(stream).writeStream
        .foreachBatch(lambda df, _id: sink_rows.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_dup_state_survives_batches_and_restart(spark, tmp_path):
    indir, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    t = dt.datetime(2024, 1, 1, 0, 0, 0)
    _write_batch(spark, indir, [
        ("https://a/1", t, "shared text body"),
        ("https://b/1", t + dt.timedelta(minutes=1), "unique one"),
    ])
    events = []
    _run_stream(spark, indir, ckpt, streaming_exact_dup_events, events)
    by_url = {r["url"]: r for r in events}
    assert not by_url["https://a/1"]["is_dup"]
    assert not by_url["https://b/1"]["is_dup"]

    # second batch, NEW query instance, same checkpoint: the dup of a/1 must
    # be flagged against state restored from the store
    _write_batch(spark, indir, [
        ("https://c/1", t + dt.timedelta(hours=1), "shared text body"),
    ])
    events2 = []
    _run_stream(spark, indir, ckpt, streaming_exact_dup_events, events2)
    c = {r["url"]: r for r in events2}["https://c/1"]
    assert c["is_dup"] and c["first_url"] == "https://a/1"


def test_watermark_window_finalization(spark, tmp_path):
    indir, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    t = dt.datetime(2024, 1, 1, 0, 0, 0)
    _write_batch(spark, indir, [
        ("https://a/1", t + dt.timedelta(minutes=5), "x"),
        ("https://a/2", t + dt.timedelta(minutes=50), "x"),
        ("https://a/3", t + dt.timedelta(hours=1, minutes=10), "x"),
    ])
    out = []
    _run_stream(spark, indir, ckpt, streaming_hourly_counts, out)
    # watermark has not passed any window end yet -> nothing finalized
    assert out == []

    # events 6 hours later push the watermark (6h - 2h lateness) past the
    # first two windows -> they finalize with their counts
    _write_batch(spark, indir, [
        ("https://a/4", t + dt.timedelta(hours=6), "x"),
    ])
    out2 = []
    _run_stream(spark, indir, ckpt, streaming_hourly_counts, out2)
    got = {r["window_start"]: r["n_pages"] for r in out2}
    assert got.get(t) == 2
    assert got.get(t + dt.timedelta(hours=1)) == 1


class _FakeState:
    """Minimal GroupState stand-in for driving the grouped-state fn directly."""

    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._val = None
        self.timeout_set = None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = v
        self.exists = True

    def remove(self):
        self._val = None
        self.exists = False

    def setTimeoutDuration(self, d):
        self.timeout_set = d


def test_first_seen_deterministic_across_chunks():
    """applyInPandasWithState streams one group's micro-batch rows as
    MULTIPLE Arrow chunks; the first-seen winner must be the global
    (warc_ts, url) minimum regardless of chunk arrival order."""
    t = dt.datetime(2024, 1, 1)
    late = pd.DataFrame({"content_hash": [7, 7],
                         "url": ["https://z/9", "https://y/5"],
                         "warc_ts": [t + dt.timedelta(hours=2)] * 2})
    early = pd.DataFrame({"content_hash": [7],
                          "url": ["https://a/1"],
                          "warc_ts": [t]})
    # the chunk holding the true first-seen row arrives LAST
    fn = make_dup_events_fn(None)
    out = pd.concat(list(fn((7,), iter([late, early]), _FakeState())))
    assert set(out["first_url"]) == {"https://a/1"}
    by_url = out.set_index("url")["is_dup"]
    assert not by_url["https://a/1"]
    assert by_url["https://z/9"] and by_url["https://y/5"]
    # vectorized output dtypes match the declared schema
    assert str(out["content_hash"].dtype) == "int64"
    assert str(out["is_dup"].dtype) == "bool"


def test_timed_out_invocation_evicts_and_emits_nothing():
    st = _FakeState()
    st.update(("https://old/1",))
    st.hasTimedOut = True
    fn = make_dup_events_fn("5 seconds")
    out = pd.concat(list(fn((7,), iter([]), st)))
    assert len(out) == 0
    assert not st.exists, "timed-out state must be removed"


def _latest_batch_id(d):
    try:
        ids = [int(f) for f in os.listdir(d) if f.isdigit()]
    except FileNotFoundError:
        return -1
    return max(ids) if ids else -1


def _run_ttl_stream(spark, indir, ckpt, transform, sink_rows, expect_urls,
                    timeout_s=120):
    """TTL variant of _run_stream: a query with armed ProcessingTimeTimeouts
    never self-terminates (the state-cleanup trigger stays alive as long as
    ANY key has a future timeout), so it must be stop()ed manually. Two
    ordered waits make that deterministic under load:
      1. wait for the EXPECTED urls, not a row count — if an earlier run was
         stopped pre-commit, this run replays that batch first and a count
         wait would release before the new data is processed;
      2. wait for the data micro-batch's commit-log entry, so stop() never
         strands an uncommitted batch for the NEXT run to replay.
    Timed-out keys are invoked in the SAME micro-batch as the new data, so
    eviction has already happened by the time the rows land."""
    stream = spark.readStream.schema(SCHEMA).parquet(indir)
    q = (
        transform(stream).writeStream
        .foreachBatch(lambda df, _id: sink_rows.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.time()
    while (not expect_urls <= {r["url"] for r in sink_rows}
           and time.time() - t0 < timeout_s):
        time.sleep(0.2)
    assert expect_urls <= {r["url"] for r in sink_rows}, \
        f"stream missing rows: {expect_urls - {r['url'] for r in sink_rows}}"
    # offsets log is written before a batch runs, commits after it finishes;
    # the rows' batch is the latest started, so once commits catches up to
    # offsets-at-rows-landed that batch is durable.
    pending = _latest_batch_id(os.path.join(ckpt, "offsets"))
    while (_latest_batch_id(os.path.join(ckpt, "commits")) < pending
           and time.time() - t0 < timeout_s):
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()


def test_dup_state_ttl_evicts_idle_hashes(spark, tmp_path):
    """With ttl set, a hash idle past the ttl is evicted (next micro-batch
    times it out) and then RE-ADMITS as first-seen; without ttl the same
    redelivery is flagged as a dup (covered by the restart test above)."""
    indir, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    t = dt.datetime(2024, 1, 1)
    ttl_transform = lambda df: streaming_exact_dup_events(df, ttl="1 second")  # noqa: E731

    _write_batch(spark, indir, [("https://a/1", t, "shared text body")])
    ev1 = []
    _run_ttl_stream(spark, indir, ckpt, ttl_transform, ev1, {"https://a/1"})
    assert not ev1[0]["is_dup"]

    time.sleep(2.5)  # let the processing-time ttl lapse
    # unrelated key triggers a micro-batch -> the idle hash times out
    _write_batch(spark, indir, [("https://b/1", t, "unrelated")])
    ev2 = []
    _run_ttl_stream(spark, indir, ckpt, ttl_transform, ev2, {"https://b/1"})
    assert {r["url"] for r in ev2} == {"https://b/1"}

    # same content as batch 1, new url: state was evicted -> first-seen again
    _write_batch(spark, indir, [("https://c/1", t, "shared text body")])
    ev3 = []
    _run_ttl_stream(spark, indir, ckpt, ttl_transform, ev3, {"https://c/1"})
    c = {r["url"]: r for r in ev3}["https://c/1"]
    assert not c["is_dup"] and c["first_url"] == "https://c/1"
