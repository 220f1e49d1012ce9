"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: JVM-side `zip_with`/`aggregate` dot product
  over a broadcast query set — the exact baseline;
- hyperplane-LSH bucketing: seeded random hyperplanes folded into the
  plan as literal arrays, so the identical arithmetic runs in any ANSI
  SQL engine (and buckets shrink the candidate space at scale: join on
  bucket instead of full cross product).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

LSH_PLANES = 4
EMB_DIM = 64


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two array columns, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(query_id, neighbor_id, rank): exact top-k cosine neighbors.

    The query side is tiny by contract -> broadcast nested-loop join;
    the corpus streams once.  Ties broken by neighbor id for
    determinism.
    """
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    c = embeddings.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", dot(F.col("qvec"), F.col("cvec"))
                    / (norm(F.col("qvec")) * norm(F.col("cvec"))))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def seeded_hyperplanes(seed: int = 7, planes: int = LSH_PLANES,
                       dim: int = EMB_DIM) -> np.ndarray:
    return np.random.default_rng(seed).normal(size=(planes, dim))


def lsh_buckets(embeddings: DataFrame, seed: int = 7,
                id_col: str = "vec_id", vec_col: str = "embedding",
                planes: int = LSH_PLANES) -> DataFrame:
    """(vec_id, bucket): sign-bit bucket under seeded hyperplanes.

    The hyperplanes are literal constants in the plan — reproducible on
    any engine, and the bucket is a pure per-row expression (no
    shuffle); ANN search then joins candidates within a bucket only.
    `planes` scales the bucket count (2^planes) with corpus size.
    """
    hp = seeded_hyperplanes(seed, planes)
    bucket = F.lit(0)
    for p in range(hp.shape[0]):
        plane = F.array(*[F.lit(float(x)) for x in hp[p]])
        d = dot(F.col(vec_col), plane)
        bucket = bucket + F.when(d > 0, F.lit(1 << p)).otherwise(0)
    return embeddings.select(F.col(id_col).alias("vec_id"),
                             bucket.cast("int").alias("bucket"))


def ann_topk_lsh(embeddings: DataFrame, query_ids: list[int], k: int = 5,
                 seed: int = 7, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 planes: int = LSH_PLANES) -> DataFrame:
    """Approximate top-k: exact rescoring restricted to same-bucket
    candidates (the scale path: bucket join replaces the cross join)."""
    b = lsh_buckets(embeddings, seed, id_col, vec_col, planes) \
        .withColumnRenamed("vec_id", "_bid")
    e = embeddings.join(b, F.col(id_col) == F.col("_bid")).drop("_bid")
    q = e.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        F.col("bucket"))
    c = e.select(F.col(id_col).alias("neighbor_id"),
                 F.col(vec_col).alias("cvec"), F.col("bucket"))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", dot(F.col("qvec"), F.col("cvec"))
                    / (norm(F.col("qvec")) * norm(F.col("cvec"))))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_near_dups(embeddings: DataFrame, min_cos_x1000: int = 950,
                        seed: int = 7, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        planes: int = LSH_PLANES) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, cos_x1000).

    Candidates come from the hyperplane-LSH bucket join (never the full
    cross product — the 100-TB shape), then exact cosine filters at
    min_cos_x1000/1000.  Output is integer-valued (round(cos*1000)) so
    oracles hash identically; both engines compute the identical IEEE
    double expression before the round.
    """
    b = lsh_buckets(embeddings, seed, id_col, vec_col, planes)
    e = embeddings.join(b, embeddings[id_col] == b["vec_id"]).drop(b["vec_id"])
    left = e.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"),
                    F.col("bucket"))
    right = e.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
                     F.col("bucket"))
    pairs = (
        left.join(right, "bucket")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos", dot(F.col("va"), F.col("vb"))
                    / (norm(F.col("va")) * norm(F.col("vb"))))
        .withColumn("cos_x1000", F.round(F.col("cos") * 1000).cast("int"))
        .filter(F.col("cos_x1000") >= min_cos_x1000)
    )
    return pairs.select("a", "b", "cos_x1000")


def seeded_centroids(seed: int = 11, n_cells: int = 8,
                     dim: int = EMB_DIM) -> np.ndarray:
    """IVF cell centroids.  Seeded draws here (deterministic, engine-
    independent literals in the plan); production swaps in k-means-
    trained centroids from a sample — the assign/search dataflow below
    is identical either way."""
    return np.random.default_rng(seed).normal(size=(n_cells, dim))


def ivf_cells(embeddings: DataFrame, seed: int = 11, n_cells: int = 8,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cell): nearest-centroid assignment, pure per-row codegen.

    argmin ||v-c||^2 == argmax (v.c - |c|^2/2); scores go into an array
    and the cell is the FIRST index holding the max (array_position) —
    the same first-match rule ANSI engines implement, so oracles agree.
    """
    cents = seeded_centroids(seed, n_cells)
    scores = F.array(*[
        dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))
        - F.lit(float(np.dot(c, c) / 2.0))
        for c in cents
    ])
    cell = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    return embeddings.select(F.col(id_col).alias("vec_id"), cell.alias("cell"))


def ann_topk_ivf(embeddings: DataFrame, query_ids: list[int], k: int = 5,
                 seed: int = 11, n_cells: int = 8, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """IVF approximate top-k: exact cosine rescoring restricted to the
    query's own cell (n_probe=1).  Scale shape: the corpus partitions
    into n_cells inverted lists; a query touches |corpus|/n_cells
    candidates instead of everything, and n_cells grows with corpus."""
    c_assign = ivf_cells(embeddings, seed, n_cells, id_col, vec_col) \
        .withColumnRenamed("vec_id", "_cid")
    e = embeddings.join(c_assign, F.col(id_col) == F.col("_cid")).drop("_cid")
    q = e.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        F.col("cell"))
    cand = e.select(F.col(id_col).alias("neighbor_id"),
                    F.col(vec_col).alias("cvec"), F.col("cell"))
    scored = (
        cand.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", dot(F.col("qvec"), F.col("cvec"))
                    / (norm(F.col("qvec")) * norm(F.col("cvec"))))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
