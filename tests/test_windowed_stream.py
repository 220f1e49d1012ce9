"""Watermarked event-time windowed aggregation: batch/stream parity,
finalization across restarts, and the late-data drop contract."""

import datetime as dt
import shutil

from pyspark.sql import types as T

from phonlp_spark.streaming.windowed import hourly_event_counts, run_hourly_stream
from tests.spark_fixtures import spark  # noqa: F401

SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])

H0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _ev(i, hour_off, etype, value, minute=0):
    return (i, H0 + dt.timedelta(hours=hour_off, minutes=minute), etype, value)


def _write(spark, path, rows):  # noqa: F811
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


def test_windowed_stream_matches_batch_and_drops_late(spark, tmp_path):  # noqa: F811
    inp, ckpt, out = (str(tmp_path / d) for d in ("in", "ckpt", "out"))

    chunk1 = [_ev(1, 0, "click", 1.25), _ev(2, 0, "click", 2.50, minute=30),
              _ev(3, 0, "view", 0.75), _ev(4, 1, "click", 4.00)]
    _write(spark, inp, chunk1)
    run_hourly_stream(spark, inp, ckpt, out, SCHEMA)

    # a fence event far past the watermark horizon finalizes H0/H1
    _write(spark, inp, [_ev(5, 10, "view", 1.00)])
    run_hourly_stream(spark, inp, ckpt, out, SCHEMA)

    got = {(r["hour"], r["event_type"]): (r["n"], r["sum_value_x100"])
           for r in spark.read.parquet(out).collect()}
    batch = {(r["hour"], r["event_type"]): (r["n"], r["sum_value_x100"])
             for r in hourly_event_counts(
                 spark.createDataFrame(chunk1, SCHEMA)).collect()}
    # every finalized window matches the batch rollup exactly
    assert batch == {k: v for k, v in got.items() if k[0] < H0 + dt.timedelta(hours=9)}
    assert (H0, "click") in got and got[(H0, "click")] == (2, 375)
    assert got[(H0 + dt.timedelta(hours=1), "click")] == (1, 400)

    # an event 10 hours behind the watermark is DROPPED: no new or
    # updated H0 row appears (append mode emits each window once)
    n_before = spark.read.parquet(out).count()
    _write(spark, inp, [_ev(6, 0, "click", 99.0), _ev(7, 20, "view", 1.0)])
    run_hourly_stream(spark, inp, ckpt, out, SCHEMA)
    rows_h0 = [r for r in spark.read.parquet(out).collect()
               if r["hour"] == H0 and r["event_type"] == "click"]
    assert len(rows_h0) == 1 and (rows_h0[0]["n"], rows_h0[0]["sum_value_x100"]) == (2, 375)
    assert spark.read.parquet(out).count() >= n_before  # H10 may finalize; H0 never changes

    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_hourly_counts_same_plan_on_batch_frames(spark):  # noqa: F811
    """The transformation is batch/stream agnostic: on a batch frame it
    is exactly the hash-agg rollup."""
    rows = [_ev(1, 0, "a", 1.10), _ev(2, 0, "a", 2.20), _ev(3, 2, "b", 3.00)]
    got = {(r["hour"], r["event_type"]): (r["n"], r["sum_value_x100"])
           for r in hourly_event_counts(
               spark.createDataFrame(rows, SCHEMA)).collect()}
    assert got == {(H0, "a"): (2, 330),
                   (H0 + dt.timedelta(hours=2), "b"): (1, 300)}
