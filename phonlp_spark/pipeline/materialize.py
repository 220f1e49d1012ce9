"""Graph materialization, per-partition manifests, and resume.

Output layout under `out_dir` (an Iceberg-shaped Parquet catalog: data
files partitioned by content-derived bucket + a manifest table that
doubles as snapshot metadata and resume checkpoint — SURVEY.md intro):

    out_dir/annotations/bucket=K/*.parquet
    out_dir/mentions/bucket=K/*.parquet
    out_dir/triples/bucket=K/*.parquet
    out_dir/edges/bucket=K/*.parquet
    out_dir/nodes/*.parquet              (global, rebuilt per run)
    out_dir/manifest/*.parquet           (append-only)

Buckets are `pmod(xxhash64(doc_id), n_buckets)` — content-derived, so
a resumed run (or a differently-sized cluster) maps every document to
the same bucket.  Resume = anti-join of buckets against manifest rows
whose status='done' and whose input fingerprint matches; completed
buckets are never recomputed, interrupted buckets are overwritten
idempotently via dynamic partition overwrite.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from phonlp_spark.pipeline.annotate import (
    annotate_sentences_df,
    annotations_long,
    mentions_df,
    triples_df,
)
from phonlp_spark.pipeline.cc import canonical_map
from phonlp_spark.pipeline.ingest import split_sentences
from phonlp_spark.pipeline.linking import link_mentions, same_as_edges

MANIFEST_COLS = ("run_id", "bucket", "status", "docs", "sentences", "triples",
                 "wall_ms", "attempt", "input_fingerprint", "n_buckets")


def input_fingerprint(documents: DataFrame) -> str:
    row = documents.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("doc_id")), F.lit(0)).alias("h"),
    ).collect()[0]
    return f"{row['n']}:{row['h']:x}"


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = os.path.join(out_dir, "manifest")
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def done_buckets(spark: SparkSession, out_dir: str, fingerprint: str,
                 n_buckets: int) -> list[int]:
    """Bucket ids safe to skip: done, same input, AND same bucketing.

    A bucket id means a different document set under a different
    n_buckets, so manifests written with another layout never satisfy
    resume (they'd silently leave documents unprocessed)."""
    mf = read_manifest(spark, out_dir)
    if mf is None or "n_buckets" not in mf.columns:
        return []
    return [
        r["bucket"]
        for r in mf.filter((F.col("status") == "done")
                           & (F.col("input_fingerprint") == fingerprint)
                           & (F.col("n_buckets") == n_buckets))
        .select("bucket").distinct().collect()
    ]


def dict_canonical_names(alias_dict: DataFrame) -> DataFrame:
    """(cid, dict_canonical): canonical display name per alias-dict
    component.  Depends ONLY on the alias dictionary (same-as edges are
    dictionary-internal and singletons fall back to their own id), so a
    resumed run computes the identical map without re-seeing every
    mention surface."""
    sa = same_as_edges(alias_dict)
    ents = alias_dict.select(F.col("entity_id").alias("node")).distinct()
    canon = canonical_map(sa, ents).withColumnRenamed("node", "entity_id")
    return (
        alias_dict.select("entity_id", "canonical")
        .join(canon, "entity_id", "left")
        .withColumn("cid", F.coalesce("component", "entity_id"))
        .groupBy("cid").agg(F.min("canonical").alias("dict_canonical"))
    )


def nodes_from_linked(linked_mentions: DataFrame, canon_text: DataFrame) -> DataFrame:
    """Aggregate the canonical-entity node table from linked mentions.

    canon_text is bounded by the alias dictionary (small by contract)
    -> broadcast; the mention aggregate is a plain hash-agg on
    canonical_id.
    """
    return (
        linked_mentions.groupBy("canonical_id")
        .agg(F.count(F.lit(1)).alias("mention_count"),
             F.min("text").alias("top_text"),
             F.mode("type").alias("type"))
        .join(F.broadcast(canon_text),
              F.col("canonical_id") == F.col("cid"), "left")
        .select(
            F.col("canonical_id").alias("entity_id"),
            F.coalesce("dict_canonical", "top_text").alias("canonical"),
            "type", "mention_count")
    )


def build_graph(mentions: DataFrame, triples: DataFrame, alias_dict: DataFrame,
                cache_registry: list | None = None,
                linking_strategy: str = "auto"):
    """Linking -> canonicalization -> graph tables (no IO).

    Returns (linked_mentions_with_canonical_id, nodes, edges).

    Everything expensive happens once at SURFACE grain (distinct
    normalized mention texts): link, canonicalize, resolve — the
    surface->canonical map then joins back onto the mention and triple
    streams.  Those joins carry NO forced broadcast hint: distinct
    surfaces are unbounded at corpus scale (hundreds of millions of
    rows at 100 TB would OOM a forced broadcast), so AQE picks
    broadcast when the map is actually small and degrades to a shuffle
    join when it is not.  Only alias-dict-bounded sides are hinted.

    Caches created here are appended to cache_registry (if given) so
    callers can unpersist after their writes complete.
    """
    from phonlp_spark.pipeline.linking import link_surfaces, norm_surface

    m = mentions.withColumn("nsurf", norm_surface(F.col("text")))
    surf_ent = link_surfaces(m.select("nsurf").distinct(), alias_dict,
                             strategy=linking_strategy).cache()

    # canonicalization at entity grain (bounded by |alias dict| +
    # |distinct surfaces|)
    sa = same_as_edges(alias_dict)
    canon = (canonical_map(sa, surf_ent.select(F.col("entity_id").alias("node")))
             .withColumnRenamed("node", "entity_id"))
    surf_map = (
        surf_ent.join(canon, "entity_id", "left")
        .select("nsurf", "entity_id",
                F.coalesce("component", "entity_id").alias("canonical_id"))
        .cache()
    )
    if cache_registry is not None:
        cache_registry += [surf_ent, surf_map]

    linked_canon = m.join(surf_map, "nsurf", "left").drop("nsurf")

    edges = (
        triples
        .withColumn("snsurf", norm_surface(F.col("subj")))
        .withColumn("onsurf", norm_surface(F.col("obj")))
        .join(surf_map.select(F.col("nsurf").alias("snsurf"),
                              F.col("canonical_id").alias("subj_id")),
              "snsurf", "inner")
        .join(surf_map.select(F.col("nsurf").alias("onsurf"),
                              F.col("canonical_id").alias("obj_id")),
              "onsurf", "inner")
        .select("subj_id", "pred", "obj_id", "doc_id", "sent_id")
    )

    nodes = nodes_from_linked(linked_canon, dict_canonical_names(alias_dict))
    return linked_canon, nodes, edges


def run_kg(
    spark: SparkSession,
    documents: DataFrame,
    alias_dict: DataFrame,
    out_dir: str,
    n_buckets: int = 32,
    salt_partitions: int | None = None,
    resume: bool = True,
    dedup: bool = False,
    linking_strategy: str = "auto",
) -> dict:
    """Full KG construction with per-bucket lineage; returns run stats.

    All remaining buckets are processed in ONE Spark job (a per-bucket
    driver loop would serialize the cluster); the manifest rows are
    appended only after the job's writes commit, so a crash anywhere
    leaves previously-done buckets intact and the interrupted buckets
    unrecorded -> recomputed and overwritten on the next run.

    ``dedup``: exact-dedup the documents BEFORE the annotation kernel
    (the standard production layout: duplicates never pay kernel cost).
    Content key = digest of the full span sequence; the kept
    representative is min(doc_id) per digest — the same keep-rule as
    ops.dedup.exact_dedup — so output equals a run over the unique
    documents.  One hash-agg shuffle on the digest; scale-safe.
    """
    t0 = time.time()
    run_id = uuid.uuid4().hex[:12]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    if dedup:
        d = documents.withColumn("_digest", F.md5(F.to_json("spans")))
        keep = d.groupBy("_digest").agg(F.min("doc_id").alias("doc_id"))
        documents = d.join(keep, ["_digest", "doc_id"], "left_semi") \
            .drop("_digest")

    docs = documents.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int"))
    fp = input_fingerprint(documents)
    skip = done_buckets(spark, out_dir, fp, n_buckets) if resume else []
    todo = docs.filter(~F.col("bucket").isin(skip)) if skip else docs
    # per-bucket attempt lineage: a recomputed bucket's attempt is
    # 1 + its max recorded attempt for this input+layout (crashed
    # attempts append no row, so the counter tracks RECORDED runs)
    prior_attempts: dict[int, int] = {}
    mf = read_manifest(spark, out_dir)
    if mf is not None and "n_buckets" in mf.columns:
        prior_attempts = {
            int(r["bucket"]): int(r["a"])
            for r in mf.filter((F.col("input_fingerprint") == fp)
                               & (F.col("n_buckets") == n_buckets))
            .groupBy("bucket").agg(F.max("attempt").alias("a")).collect()
        }

    if todo.isEmpty():
        return {"run_id": run_id, "processed_buckets": [], "skipped_buckets": skip,
                "docs": 0, "sentences": 0, "triples": 0, "wall_ms": 0}

    sentences = split_sentences(todo.select("doc_id", "spans"))
    annotated = annotate_sentences_df(sentences, salt_partitions).cache()

    # bucket is a pure function of doc_id — recompute it as an
    # expression on every output stream instead of joining a
    # doc->bucket map (which would add one shuffle per output table)
    def with_bucket(df):
        return df.withColumn(
            "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int"))

    ann = with_bucket(annotations_long(annotated))
    # cache the narrow mention/triple streams: the linking + graph
    # plans reference them repeatedly and would otherwise re-explode
    # the annotation arrays once per consumer
    mentions = mentions_df(annotated).cache()
    triples = triples_df(annotated).cache()
    caches = [mentions, triples]

    linked_canon, _nodes, edges = build_graph(
        mentions, triples, alias_dict, cache_registry=caches,
        linking_strategy=linking_strategy)

    # writes (bucket-partitioned; dynamic overwrite = idempotent re-run)
    ann.write.mode("overwrite").partitionBy("bucket").parquet(f"{out_dir}/annotations")
    with_bucket(linked_canon).write.mode("overwrite").partitionBy("bucket") \
        .parquet(f"{out_dir}/mentions")
    with_bucket(triples).write.mode("overwrite").partitionBy("bucket") \
        .parquet(f"{out_dir}/triples")
    with_bucket(edges).write.mode("overwrite").partitionBy("bucket") \
        .parquet(f"{out_dir}/edges")
    # nodes is GLOBAL and non-partitioned: on a resumed run the
    # in-memory linked_canon covers only recomputed buckets, so rebuild
    # it from the full on-disk mentions table (all buckets) after the
    # per-bucket writes commit — otherwise a partial resume would
    # silently replace the table with a subset-derived one.
    nodes_full = nodes_from_linked(
        spark.read.parquet(f"{out_dir}/mentions"),
        dict_canonical_names(alias_dict))
    nodes_full.write.mode("overwrite").parquet(f"{out_dir}/nodes")

    # per-bucket lineage metrics
    stats = (
        todo.groupBy("bucket").agg(F.count(F.lit(1)).alias("docs"))
        .join(with_bucket(annotated.select("doc_id", F.size("triples").alias("nt")))
              .groupBy("bucket").agg(
                  F.count(F.lit(1)).alias("sentences"),
                  F.sum("nt").alias("triples")), "bucket", "left")
        .fillna(0, ["sentences", "triples"])
        .collect()
    )
    wall_ms = int((time.time() - t0) * 1000)
    manifest_rows = [
        (run_id, int(r["bucket"]), "done", int(r["docs"]), int(r["sentences"]),
         int(r["triples"]), wall_ms,
         prior_attempts.get(int(r["bucket"]), 0) + 1, fp, n_buckets)
        for r in stats
    ]
    spark.createDataFrame(manifest_rows, ", ".join(
        f"{c} {'string' if c in ('run_id', 'status', 'input_fingerprint') else 'long'}"
        for c in MANIFEST_COLS
    )).write.mode("append").parquet(f"{out_dir}/manifest")

    annotated.unpersist()
    for df in caches:  # release executor storage memory for later jobs
        df.unpersist()
    totals = {
        "docs": sum(r["docs"] for r in stats),
        "sentences": sum(r["sentences"] or 0 for r in stats),
        "triples": sum(r["triples"] or 0 for r in stats),
    }
    return {
        "run_id": run_id,
        "processed_buckets": sorted(int(r["bucket"]) for r in stats),
        "skipped_buckets": sorted(skip),
        "wall_ms": wall_ms,
        **totals,
    }
