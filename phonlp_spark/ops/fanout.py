"""Scale-adaptive fan-out for heavy post-scan stages.

The sandbox's parquet fixtures are single-row-group files, so a scan
stage runs with 1-2 tasks no matter how split sizing is configured; any
expensive operator glued to the scan stage (shingle generation,
signature hashing, cosine scoring, pair expansion) then executes nearly
serially on a 32-core machine.  Measured instance: dedup_jaccard at
sf1.0 spent 281 s averaging ~1.5 busy cores because the whole quadratic
candidate generation sat on the probe side of a broadcast join, i.e. on
the scan stage's 2 tasks (BENCH_r06, plans/r07/dedup_jaccard_before).

At real scale the same inputs arrive as thousands of splits and an
extra exchange of the corpus would be pure waste.  ``fan_out`` is the
conditional bridge: round-robin repartition to cluster width iff the
source is narrower than the target width, and a no-op on wide scans —
so the local plan gets its parallelism without hard-coding anything
cluster-specific (width derives from defaultParallelism and the
configured shuffle partitions, never from a constant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_width(df: DataFrame) -> int:
    """Target stage width: max(2x cores, configured shuffle partitions).

    Locally that is 2x defaultParallelism (enough slots that one long
    task does not straggle the stage); on a tuned cluster
    spark.sql.shuffle.partitions is sized to the data and wins.
    """
    sess = df.sparkSession
    try:
        conf_sp = int(sess.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        conf_sp = 0
    return max(2 * sess.sparkContext.defaultParallelism, conf_sp)


_PROBE_CACHE: dict[tuple[str, int], int] = {}


def _probe_partitions(df: DataFrame) -> int:
    """Partition count of ``df``'s physical plan, memoized per
    (application, semantic plan).

    The raw probe (``df.rdd.getNumPartitions()``) compiles the physical
    plan on the driver — measured 165-300 ms per call on this host —
    and identical queries are rebuilt several times per bench suite.
    The memo key is the canonicalized plan hash, so logically identical
    rebuilds skip the compile.  Staleness (files changing under an
    unchanged path mid-session) can only mis-size the fan-out, never
    change results; the cache is cleared when it grows past 256
    entries."""
    sess = df.sparkSession
    try:
        key = (sess.sparkContext.applicationId, df.semanticHash())
    except Exception:
        return df.rdd.getNumPartitions()
    n = _PROBE_CACHE.get(key)
    if n is None:
        n = df.rdd.getNumPartitions()
        if len(_PROBE_CACHE) > 256:
            _PROBE_CACHE.clear()
        _PROBE_CACHE[key] = n
    return n


def fan_out(df: DataFrame, width: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to ``width`` when its current
    plan would run narrower than that; identity otherwise.

    The partition probe compiles the physical plan (memoized — see
    _probe_partitions) but runs no job.  Results are row-identical
    either way — only placement changes.
    """
    if df.isStreaming:
        # no partition probe on streaming plans; micro-batch
        # parallelism is the source's concern
        return df
    w = width or fan_width(df)
    if _probe_partitions(df) >= w:
        return df
    return df.repartition(w)
