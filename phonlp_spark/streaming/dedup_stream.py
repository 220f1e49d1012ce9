"""Streaming exact dedup: first-arrival-wins across micro-batches.

The batch engine dedups with one hash aggregate (ops/dedup.py:34); on
an unbounded stream the "have I seen this digest before" memory must
live in OPERATOR STATE, checkpointed so a restarted query continues
deduping against everything it already admitted.  This is the
`applyInPandasWithState` custom-stateful-operator pattern: rows group
by content digest, the per-group state is a single seen flag, and only
a digest's first arrival is emitted.

Scale shape: state is one tiny row per DISTINCT digest, hash-partitioned
across executors by the groupBy — the same sharding as the batch
hash-agg, but persistent.  At 100 TB the state store backs onto disk
(RocksDB state store in production configs); nothing here assumes the
digest set fits in memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def _first_arrival(key, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        # digest already admitted in an earlier batch/run: drop all
        for _ in pdfs:
            pass
        return
    first = None
    for pdf in pdfs:
        # tie-break matches the batch engine's min(doc_id)
        # (ops/dedup.py): compare in the key's NATIVE dtype — the
        # column is never cast to string, so numeric ids order
        # numerically ('10' < '2' lexicographic bugs can't happen)
        pdf = pdf.sort_values("doc_id")
        cand = pdf.iloc[0]
        if first is None or cand["doc_id"] < first["doc_id"]:
            first = cand
    state.update((True,))
    if first is not None:
        yield pd.DataFrame({"digest": [key[0]], "doc_id": [first["doc_id"]],
                            "text": [first["text"]]})


def streaming_exact_dedup(docs_stream: DataFrame,
                          text_col: str = "text",
                          key_col: str = "doc_id") -> DataFrame:
    """Streaming DataFrame in (any schema with text/key), deduped
    stream out: one row per distinct text content, ever.

    Attach to a writeStream with a checkpointLocation; the seen-set
    survives restarts via the state store.  The kept representative per
    digest is min(doc_id) IN THE KEY'S NATIVE TYPE, identical to the
    batch exact_dedup keep-rule.
    """
    keyed = docs_stream.select(
        F.md5(F.col(text_col)).alias("digest"),
        F.col(key_col).alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    out_schema = T.StructType([
        T.StructField("digest", T.StringType()),
        T.StructField("doc_id", docs_stream.schema[key_col].dataType),
        T.StructField("text", T.StringType()),
    ])
    return keyed.groupBy("digest").applyInPandasWithState(
        _first_arrival,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_stream(spark, input_dir: str, checkpoint_dir: str,
                     out_dir: str, schema: T.StructType) -> None:
    """Drain available input files through the stateful dedup into
    parquet; re-invocations continue from the checkpointed state."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    q = (streaming_exact_dedup(stream)
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
