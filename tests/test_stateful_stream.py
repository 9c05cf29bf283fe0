"""applyInPandasWithState + watermark operators (§2.8): dedup state must
survive across micro-batches AND across query restarts (checkpoint), and
event-time windows must finalize under the watermark."""

import datetime as dt

from pyspark.sql.types import (
    StringType, StructField, StructType, TimestampType,
)

from fastdup_spark.streaming.stateful import (
    streaming_exact_dup_events, streaming_hourly_counts,
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
