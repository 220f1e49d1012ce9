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
# Broadcast-path sizing: the alias inventory is collect()ed to the
# driver and its [A, SIM_DIM] float32 n-gram matrix is broadcast to
# every executor (~8 KB/alias); 1M aliases ≈ 8 GB broadcast — the cap.
# Inventories past the cap do NOT fail: link_surfaces auto-routes
# stage 2 to the distributed inverted-index gram join
# (_score_misses_distributed), where nothing alias-sized touches the
# driver.  PHONLP_SPARK_MAX_ALIASES moves the routing point.
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


def _gram_hashes_udf():
    """Arrow-batched pandas UDF: a surface's hashed char-3gram multiset
    as an int array — EXACTLY the hashes _ngram_matrix scatter-adds
    (same padding, same polynomial, same modulus), so the distributed
    cosine below is the same tf vector as the broadcast matrix path."""
    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def gram_hashes(surfs: pd.Series) -> pd.Series:
        from phonlp_spark.kernel.runtime import tune_worker_runtime
        tune_worker_runtime()
        out = []
        for s0 in surfs:
            b = ("  " + (s0 or "") + "  ").encode("utf-8", "ignore")
            arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
            h = (arr[:-2] * 961 + arr[1:-1] * 31 + arr[2:]) % SIM_DIM
            out.append(h.astype("int32").tolist())
        return pd.Series(out)
    return gram_hashes


def _sparse_grams(df: DataFrame, key: str):
    """(key, _g, _tf) hashed-gram term frequencies + (key, _norm) L2
    norms for a one-column DataFrame of distinct surfaces.  The gram
    table is the inverted-index side of the distributed similarity
    join; both outputs shuffle on `key` once."""
    gram_hashes = _gram_hashes_udf()
    g = df.select(F.col(key), F.explode(gram_hashes(F.col(key))).alias("_g"))
    tf = g.groupBy(key, "_g").agg(
        F.count(F.lit(1)).cast("double").alias("_tf"))
    norm = tf.groupBy(key).agg(
        F.sqrt(F.sum(F.col("_tf") * F.col("_tf"))).alias("_norm"))
    return tf, norm


def _score_misses_distributed(misses: DataFrame, alias_norm: DataFrame,
                              max_gram_freq: int = 100_000) -> DataFrame:
    """Stage 2 without the driver: (nsurf) misses -> (nsurf, sim_id)
    via an inverted-index similarity join against the FULL distributed
    alias inventory — the path for alias dictionaries too large to
    collect+broadcast (the failure mode the old cap guarded).

    Shape: both sides explode to hashed char-3grams (the same hashes
    the broadcast path's matrix uses), join on the gram — an inverted
    index, never a cross product — then per-(miss, alias) dot products
    and a top-1 window.  Grams carried by more than ``max_gram_freq``
    aliases are dropped from candidate generation (the stop-shingle
    guard of ops/dedup.py applied to grams): a universal gram like
    '  t' would otherwise make the index quadratic.  A candidate pair
    sharing ONLY dropped grams is lost — at the default cap that needs
    a >100k-alias gram, where cosine contribution per gram is
    negligible anyway.

    Tie rule: equal cosines resolve to the smallest entity_id — the
    same rule the broadcast path applies (alias matrix sorted by
    entity_id, first argmax).
    """
    a_tf, a_norm = _sparse_grams(
        alias_norm.select(F.col("nsurf").alias("_asurf")), "_asurf")
    hot = (a_tf.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
           .filter(F.col("_n") > max_gram_freq).select("_g"))
    a_tf = a_tf.join(F.broadcast(hot), "_g", "left_anti")
    m_tf, m_norm = _sparse_grams(misses.select("nsurf"), "nsurf")

    num = (m_tf.join(a_tf.withColumnRenamed("_tf", "_atf"), "_g")
           .groupBy("nsurf", "_asurf")
           .agg(F.sum(F.col("_tf") * F.col("_atf")).alias("_dot")))
    scored = (num
              .join(m_norm, "nsurf")
              .join(a_norm.withColumnRenamed("_norm", "_anorm"), "_asurf")
              .join(alias_norm.withColumnRenamed("nsurf", "_asurf"), "_asurf")
              .withColumn("_cos", F.col("_dot")
                          / (F.col("_norm") * F.col("_anorm"))))
    from pyspark.sql.window import Window
    w = Window.partitionBy("nsurf").orderBy(
        F.col("_cos").desc(), F.col("entity_id").asc())
    top1 = (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("nsurf",
                    F.when(F.col("_cos") >= SIM_THRESHOLD,
                           F.col("entity_id")).alias("sim_id")))
    # a miss sharing NO gram with any alias (or only hot-dropped grams)
    # has no candidate rows and would vanish from top1 — re-attach it
    # with a NULL sim_id so the caller mints a new id, exactly as the
    # broadcast path does for below-threshold misses
    return misses.join(top1, "nsurf", "left").select("nsurf", "sim_id")


def link_surfaces(surfaces: DataFrame, alias_dict: DataFrame,
                  max_aliases: int | None = None,
                  strategy: str = "auto") -> DataFrame:
    """(nsurf) distinct normalized surfaces -> (nsurf, entity_id).

    Stage 1: exact join on the normalized surface (broadcast-hinted
    only when the inventory is known to fit the cap).
    Stage 2 (misses only): cosine top-1 against the alias char-3gram
    inventory —
      * ``broadcast`` (inventory <= max_aliases): the [A, SIM_DIM]
        matrix is collected once and broadcast; scoring is a dense
        matmul in a scalar pandas UDF;
      * ``distributed`` (bigger inventories, or forced): an
        inverted-index gram join (_score_misses_distributed) — the
        same hashes, the same tf vectors, the same threshold, so both
        paths agree on the mapping (floating-point summation order
        aside); nothing alias-sized ever touches the driver.
    ``strategy``: "auto" picks by inventory size; "broadcast" /
    "distributed" force a path (broadcast still enforces the cap).
    Stage 3: residual -> content-derived new id 'X'+md5(surface)[:12].

    Linking cost is proportional to DISTINCT surfaces; callers join the
    result back onto mention/triple streams.
    """
    spark = surfaces.sparkSession
    cap = MAX_ALIASES if max_aliases is None else max_aliases
    alias_norm = (
        alias_dict.select(norm_surface(F.col("alias")).alias("nsurf"), "entity_id")
        .groupBy("nsurf").agg(F.min("entity_id").alias("entity_id"))
    )

    if strategy == "distributed":
        alias_rows = None
    else:
        # one bounded collect both sizes the inventory and feeds the
        # broadcast; the limit caps the driver transfer even when the
        # inventory is over the cap
        alias_rows = alias_norm.limit(cap + 1).collect()
        if len(alias_rows) > cap:
            if strategy == "broadcast":
                raise ValueError(
                    f"alias inventory exceeds the {cap}-surface cap for the "
                    f"forced collect+broadcast linking path "
                    f"(~{cap * SIM_DIM * 4 / 2**30:.1f} GiB n-gram matrix on "
                    "the driver and every executor). Raise "
                    "PHONLP_SPARK_MAX_ALIASES only with memory to match, or "
                    "use strategy='distributed'/'auto'.")
            alias_rows = None  # auto: fall through to the gram join

    if alias_rows is None:
        # inventory unbounded: no broadcast hint anywhere — AQE picks
        # the stage-1 join strategy from runtime sizes
        exact = surfaces.join(alias_norm, "nsurf", "left")
        misses = exact.filter(F.col("entity_id").isNull()).select("nsurf")
        scored = _score_misses_distributed(misses, alias_norm)
    else:
        exact = surfaces.join(F.broadcast(alias_norm), "nsurf", "left")
        misses = exact.filter(F.col("entity_id").isNull()).select("nsurf")
        # deterministic tie rule shared with the distributed path:
        # order by entity_id so first-argmax == smallest id on ties
        alias_rows = sorted(alias_rows, key=lambda r: r["entity_id"])
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
                scores = qs @ mat.T  # [B, A] cosine (rows L2-normalized)
                best = scores.argmax(axis=1)
                return pd.DataFrame({
                    "sim_id": [ids[i] for i in best],
                    "sim_score": scores[np.arange(len(best)), best]
                    .astype(np.float32),
                })

            scored = misses.withColumn("s", best_alias(F.col("nsurf"))).select(
                "nsurf",
                F.when(F.col("s.sim_score") >= SIM_THRESHOLD,
                       F.col("s.sim_id")).alias("sim_id"),
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
