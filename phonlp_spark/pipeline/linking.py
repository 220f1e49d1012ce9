"""Entity linking: broadcast alias dictionary + vectorized similarity.

North-star semantics (BASELINE.json): mention -> canonical entity id
via a broadcast alias dictionary; dictionary misses fall back to
vectorized character-3-gram cosine similarity against the alias
inventory (Arrow-batched pandas UDF — never per-row Python), top-1 by
window rank; residual misses mint a content-derived entity id (md5 of
the normalized surface), so ids are stable across partitions, runs and
cluster sizes.

Scale shape: linking cost is proportional to DISTINCT mention surfaces,
not total mentions — surfaces are deduplicated before scoring and the
assignment is joined back onto the mention stream.  Only the alias
dictionary (small by contract) is ever broadcast-hinted; surface-keyed
sides are unbounded, so their join strategy is left to AQE.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SIM_DIM = 2048       # hashed char-3gram space
SIM_THRESHOLD = 0.60
# The alias inventory is "small by contract": it is collect()ed to the
# driver and its [A, SIM_DIM] float32 n-gram matrix is broadcast to
# every executor (~8 KB/alias).  The contract is ENFORCED, not assumed:
# link_surfaces counts the inventory first and fails fast past this cap
# (override via PHONLP_SPARK_MAX_ALIASES for bigger driver/executor
# memory).  1M aliases ≈ 8 GB broadcast — already past sane; at that
# size move stage 2 to an LSH/ANN join (ops/similarity.py) instead.
import os as _os

MAX_ALIASES = int(_os.environ.get("PHONLP_SPARK_MAX_ALIASES", "1000000"))

ALIAS_SCHEMA = T.StructType([
    T.StructField("alias", T.StringType()),
    T.StructField("entity_id", T.StringType()),
    T.StructField("canonical", T.StringType()),
])


def norm_surface(col):
    """Normalization used on both the alias and mention sides."""
    return F.lower(F.regexp_replace(col, "_", " "))


def build_alias_dict(spark: SparkSession, names: list[str]) -> DataFrame:
    """Deterministic alias dictionary from canonical entity names.

    Variants per canonical name: the name itself, its space form, and a
    truncation to the first two segments — enough to create alias
    collisions across entities so canonicalization has real work.
    """
    import hashlib

    rows = []
    for name in names:
        eid = "E" + hashlib.md5(name.encode()).hexdigest()[:12]
        variants = {name, name.replace("_", " ")}
        parts = name.split("_")
        if len(parts) > 2:
            variants.add("_".join(parts[:2]))
        for v in variants:
            rows.append((v, eid, name))
    return spark.createDataFrame(rows, ALIAS_SCHEMA)


def _ngram_matrix(surfs, dim: int) -> np.ndarray:
    """L2-normalized hashed char-3gram count matrix [B, dim].

    Fully vectorized (rolling polynomial hash over a padded byte
    matrix + one scatter-add): the per-surface python loop version was
    the linking stage's hotspot at scale.
    """
    enc = [("  " + (s or "") + "  ").encode("utf-8", "ignore") for s in surfs]
    n = len(enc)
    if n == 0:
        return np.zeros((0, dim), dtype=np.float32)
    lens = np.fromiter((len(b) for b in enc), np.int64, n)
    width = max(int(lens.max()), 3)
    buf = np.zeros((n, width), dtype=np.uint32)
    for i, b in enumerate(enc):
        buf[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = (buf[:, :-2] * 961 + buf[:, 1:-1] * 31 + buf[:, 2:]) % dim
    valid = np.arange(width - 2)[None, :] < (lens - 2)[:, None]
    out = np.zeros((n, dim), dtype=np.float32)
    rows = np.repeat(np.arange(n), width - 2)
    flat = valid.ravel()
    np.add.at(out, (rows[flat], h.ravel()[flat]), 1.0)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


def _ngram_vec(text: str, dim: int) -> np.ndarray:
    return _ngram_matrix([text], dim)[0]


def link_surfaces(surfaces: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """(nsurf) distinct normalized surfaces -> (nsurf, entity_id).

    Stage 1: exact broadcast hash join on the normalized surface.
    Stage 2 (misses only): cosine top-1 against the broadcast alias
    n-gram matrix inside a scalar pandas UDF.
    Stage 3: residual -> content-derived new id 'X'+md5(surface)[:12].

    Linking cost is proportional to DISTINCT surfaces; callers join the
    result back onto mention/triple streams (broadcast).
    """
    spark = surfaces.sparkSession
    alias_norm = (
        alias_dict.select(norm_surface(F.col("alias")).alias("nsurf"), "entity_id")
        .groupBy("nsurf").agg(F.min("entity_id").alias("entity_id"))
    )
    exact = surfaces.join(F.broadcast(alias_norm), "nsurf", "left")
    misses = exact.filter(F.col("entity_id").isNull()).select("nsurf")

    # one bounded collect both enforces the size contract and feeds the
    # broadcast (formerly a count job followed by a collect job); the
    # limit caps the driver transfer even when the contract is violated
    alias_rows = alias_norm.limit(MAX_ALIASES + 1).collect()
    if len(alias_rows) > MAX_ALIASES:
        raise ValueError(
            f"alias inventory exceeds the {MAX_ALIASES}-surface cap for the "
            f"collect+broadcast linking path "
            f"(~{MAX_ALIASES * SIM_DIM * 4 / 2**30:.1f} GiB n-gram matrix on "
            "the driver and every executor). Raise PHONLP_SPARK_MAX_ALIASES "
            "only with memory to match, or switch stage 2 to the LSH/ANN "
            "join in phonlp_spark/ops/similarity.py.")
    alias_surfs = [r["nsurf"] for r in alias_rows]
    alias_ids = [r["entity_id"] for r in alias_rows]
    if alias_surfs:
        amat = _ngram_matrix(alias_surfs, SIM_DIM)  # [A, D]
        bc = spark.sparkContext.broadcast((amat, alias_ids))

        @F.pandas_udf(T.StructType([
            T.StructField("sim_id", T.StringType()),
            T.StructField("sim_score", T.FloatType()),
        ]))
        def best_alias(surfs: pd.Series) -> pd.DataFrame:
            from phonlp_spark.kernel.runtime import tune_worker_runtime
            tune_worker_runtime()  # allocator fix (see kernel/runtime.py)
            mat, ids = bc.value
            qs = _ngram_matrix(list(surfs), SIM_DIM)
            scores = qs @ mat.T  # [B, A] cosine (rows are L2-normalized)
            best = scores.argmax(axis=1)
            return pd.DataFrame({
                "sim_id": [ids[i] for i in best],
                "sim_score": scores[np.arange(len(best)), best].astype(np.float32),
            })

        scored = misses.withColumn("s", best_alias(F.col("nsurf"))).select(
            "nsurf",
            F.when(F.col("s.sim_score") >= SIM_THRESHOLD, F.col("s.sim_id")).alias("sim_id"),
        )
    else:
        scored = misses.withColumn("sim_id", F.lit(None).cast("string"))

    new_id = F.concat(F.lit("X"), F.substring(F.md5(F.col("nsurf")), 1, 12))
    resolved_misses = scored.select(
        "nsurf", F.coalesce(F.col("sim_id"), new_id).alias("miss_entity_id")
    )

    # no forced broadcast: misses are a subset of DISTINCT surfaces,
    # which is unbounded at corpus scale — AQE broadcasts when small
    return (
        exact.join(resolved_misses, "nsurf", "left")
        .select("nsurf",
                F.coalesce("entity_id", "miss_entity_id").alias("entity_id"))
    )


def link_mentions(mentions: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """mentions (doc_id, sent_id, start, end, type, text) -> + entity_id.

    Thin wrapper: link the DISTINCT normalized surfaces, broadcast the
    surface->entity map back onto the mention stream.
    """
    m = mentions.withColumn("nsurf", norm_surface(F.col("text")))
    surf_map = link_surfaces(m.select("nsurf").distinct(), alias_dict)
    # surf_map is keyed by DISTINCT surfaces (unbounded at scale):
    # leave the join strategy to AQE rather than forcing a broadcast
    return m.join(surf_map, "nsurf", "left").drop("nsurf")


def same_as_edges(alias_dict: DataFrame, linked: DataFrame = None) -> DataFrame:
    """Undirected same-as edges for canonicalization: dictionary
    entities sharing a normalized alias surface.  (Same-surface ties
    between mentions need no edges: linking is deterministic per
    surface, so identical surfaces always share an entity id already.)
    Returns (src, dst) with src < dst, distinct.
    """
    a = alias_dict.select(norm_surface(F.col("alias")).alias("nsurf"),
                          F.col("entity_id"))
    return (
        a.alias("l").join(a.alias("r"), "nsurf")
        .filter(F.col("l.entity_id") < F.col("r.entity_id"))
        .select(F.col("l.entity_id").alias("src"), F.col("r.entity_id").alias("dst"))
        .distinct()
    )
