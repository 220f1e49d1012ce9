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
assignment is joined back (broadcast) onto the mention stream.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SIM_DIM = 4096       # hashed char-3gram space
SIM_THRESHOLD = 0.60

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


def _ngram_vec(text: str, dim: int) -> np.ndarray:
    v = np.zeros(dim, dtype=np.float32)
    data = ("  " + text + "  ").encode("utf-8", "ignore")
    for i in range(len(data) - 2):
        v[zlib.crc32(data[i : i + 3]) % dim] += 1.0
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def link_mentions(mentions: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """mentions (doc_id, sent_id, start, end, type, text) -> + entity_id.

    Stage 1: exact broadcast hash join on the normalized surface.
    Stage 2 (misses only, distinct surfaces): cosine top-1 against the
    broadcast alias n-gram matrix inside a scalar pandas UDF.
    Stage 3: residual -> content-derived new id 'X'+md5(surface)[:12].
    """
    spark = mentions.sparkSession
    alias_norm = (
        alias_dict.select(norm_surface(F.col("alias")).alias("nsurf"), "entity_id")
        .groupBy("nsurf").agg(F.min("entity_id").alias("entity_id"))
    )
    m = mentions.withColumn("nsurf", norm_surface(F.col("text")))
    exact = m.join(F.broadcast(alias_norm), "nsurf", "left")

    # distinct unmatched surfaces -> similarity scoring
    misses = exact.filter(F.col("entity_id").isNull()).select("nsurf").distinct()

    alias_rows = alias_norm.collect()  # alias inventory is small by contract
    alias_surfs = [r["nsurf"] for r in alias_rows]
    alias_ids = [r["entity_id"] for r in alias_rows]
    if alias_surfs:
        amat = np.stack([_ngram_vec(s, SIM_DIM) for s in alias_surfs])  # [A, D]
        bc = spark.sparkContext.broadcast((amat, alias_ids))

        @F.pandas_udf(T.StructType([
            T.StructField("sim_id", T.StringType()),
            T.StructField("sim_score", T.FloatType()),
        ]))
        def best_alias(surfs: pd.Series) -> pd.DataFrame:
            mat, ids = bc.value
            qs = np.stack([_ngram_vec(s or "", SIM_DIM) for s in surfs])
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

    out = (
        exact.join(F.broadcast(resolved_misses), "nsurf", "left")
        .withColumn("entity_id", F.coalesce("entity_id", "miss_entity_id"))
        .drop("miss_entity_id", "nsurf")
    )
    return out


def same_as_edges(alias_dict: DataFrame, linked: DataFrame) -> DataFrame:
    """Undirected same-as edges for canonicalization.

    (a) dictionary entities sharing a normalized alias surface;
    (b) linked mentions whose EXACT surface (pre-normalization) equals
        another mention's normalized surface under a different id —
        covered by (a) + content-derived ids being surface-stable, so
        in practice (b) adds exact-text ties between dictionary hits
        and minted ids of identical surfaces.
    Returns (src, dst) with src < dst, distinct.
    """
    a = alias_dict.select(norm_surface(F.col("alias")).alias("nsurf"),
                          F.col("entity_id"))
    pairs = (
        a.alias("l").join(a.alias("r"), "nsurf")
        .filter(F.col("l.entity_id") < F.col("r.entity_id"))
        .select(F.col("l.entity_id").alias("src"), F.col("r.entity_id").alias("dst"))
    )
    text_pairs = (
        linked.select(norm_surface(F.col("text")).alias("nsurf"), "entity_id")
        .groupBy("nsurf")
        .agg(F.min("entity_id").alias("a"), F.max("entity_id").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    return pairs.unionByName(text_pairs).distinct()
