"""Event-time windowed streaming aggregation with watermarked late data.

The batch engine computes hourly event rollups as one hash aggregate
(__spark_entry__.py events_hourly).  On an unbounded stream the same
rollup is a Structured Streaming windowed aggregation:

- event-time windows (`window(ts, '1 hour')`), NOT processing time —
  replays and out-of-order delivery land in the right bucket;
- a watermark bounds state: a window finalizes (append-mode emit) once
  max(event time seen) - watermark passes its end, and events later
  than that are dropped — the explicit, documented late-data contract;
- state is sharded by the (window, event_type) grouping key, exactly
  like the batch shuffle, but persistent in the state store (RocksDB
  in production configs).

Scale shape: per-window-per-type state rows only (bounded by
 #types x watermark/window), independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_event_counts(events: DataFrame, watermark: str = "2 hours",
                        window: str = "1 hour") -> DataFrame:
    """(hour, event_type, n, sum_value_x100) — identical column
    semantics to the batch events_hourly rollup (integer-cents sums so
    the outputs compare exactly).  Works on BOTH batch and streaming
    frames: the transformation is the same declarative plan; only the
    sink mode differs.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.round(F.col("value") * 100).cast("bigint"))
             .alias("sum_value_x100"))
        .select(F.col("w.start").alias("hour"), "event_type",
                "n", "sum_value_x100")
    )


def run_hourly_stream(spark, input_dir: str, checkpoint_dir: str,
                      out_dir: str, schema, watermark: str = "2 hours") -> None:
    """Drain available input through the windowed aggregation into
    parquet (append mode: only watermark-finalized windows are
    written).  Re-invocations resume from the checkpoint and keep
    accumulating open windows across restarts."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    q = (hourly_event_counts(stream, watermark)
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
