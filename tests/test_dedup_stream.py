"""Stateful streaming dedup: first-arrival-wins across micro-batches
AND across query restarts (state store checkpoint)."""

import shutil

from pyspark.sql import types as T

from phonlp_spark.streaming.dedup_stream import run_dedup_stream
from tests.spark_fixtures import spark  # noqa: F401

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _write_batch(spark, path, rows):  # noqa: F811
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


def test_streaming_dedup_across_restarts(spark, tmp_path):  # noqa: F811
    inp, ckpt, out = (str(tmp_path / d) for d in ("in", "ckpt", "out"))

    _write_batch(spark, inp, [(1, "alpha"), (2, "beta"), (3, "alpha")])
    run_dedup_stream(spark, inp, ckpt, out, SCHEMA)
    first = {r["text"]: r["doc_id"]
             for r in spark.read.parquet(out).collect()}
    assert first == {"alpha": 1, "beta": 2}  # min doc_id wins in-batch

    # restart with new files: old duplicates suppressed by checkpointed
    # state, genuinely-new content admitted
    _write_batch(spark, inp, [(4, "alpha"), (5, "gamma"), (6, "beta")])
    run_dedup_stream(spark, inp, ckpt, out, SCHEMA)
    rows = spark.read.parquet(out).collect()
    got = {r["text"]: r["doc_id"] for r in rows}
    assert len(rows) == 3
    assert got == {"alpha": 1, "beta": 2, "gamma": 5}

    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_streaming_keep_rule_matches_batch_numeric_min(spark, tmp_path):  # noqa: F811
    """Keys keep their native type: numeric ids 10 vs 2 must pick 2
    (the batch min(doc_id) rule), not lexicographic '10' < '2'."""
    inp, ckpt, out = (str(tmp_path / d) for d in ("in", "ckpt", "out"))
    _write_batch(spark, inp, [(10, "same"), (2, "same"), (9, "same")])
    run_dedup_stream(spark, inp, ckpt, out, SCHEMA)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 2
    assert spark.read.parquet(out).schema["doc_id"].dataType == T.LongType()
    shutil.rmtree(str(tmp_path), ignore_errors=True)
