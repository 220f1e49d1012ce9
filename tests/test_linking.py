"""Entity linking: exact broadcast hits, similarity fallback, minted ids."""

import pytest
from pyspark.sql import functions as F

from phonlp_spark.pipeline.linking import (
    build_alias_dict,
    link_mentions,
    same_as_edges,
)

from tests.spark_fixtures import spark  # noqa: F401

NAMES = ["Nguyễn_Văn_An", "Trần_Thị_Bình", "Hà_Nội", "Công_ty_FPT_Software"]


def _mentions(spark, texts):  # noqa: F811
    rows = [(f"d{i}", 0, 0, 0, "PER", t) for i, t in enumerate(texts)]
    return spark.createDataFrame(
        rows, "doc_id string, sent_id int, start int, end int, type string, text string")


def test_exact_and_variant_hits(spark):  # noqa: F811
    alias = build_alias_dict(spark, NAMES)
    m = _mentions(spark, ["Nguyễn_Văn_An", "nguyễn văn an", "Hà_Nội"])
    got = {r["text"]: r["entity_id"] for r in link_mentions(m, alias).collect()}
    assert got["Nguyễn_Văn_An"] == got["nguyễn văn an"]
    assert got["Hà_Nội"].startswith("E")


def test_similarity_fallback(spark):  # noqa: F811
    alias = build_alias_dict(spark, NAMES)
    # a near-variant: one extra token, high 3-gram overlap
    m = _mentions(spark, ["Công_ty FPT_Software"])
    got = link_mentions(m, alias).collect()[0]
    exact = {r["alias"]: r["entity_id"] for r in alias.collect()}
    assert got["entity_id"] == exact["Công_ty_FPT_Software"]


def test_miss_mints_stable_content_id(spark):  # noqa: F811
    alias = build_alias_dict(spark, NAMES)
    m = _mentions(spark, ["hoàn_toàn_không_liên_quan_gì_cả_xyz"])
    a = link_mentions(m, alias).collect()[0]["entity_id"]
    b = link_mentions(m, alias).collect()[0]["entity_id"]
    assert a == b and a.startswith("X")


def test_same_as_edges_connect_truncation_collisions(spark):  # noqa: F811
    # two canonicals sharing the truncated 2-segment alias "A_B"
    alias = build_alias_dict(spark, ["A_B_C", "A_B_D"])
    linked = link_mentions(_mentions(spark, ["A_B_C"]), alias)
    edges = same_as_edges(alias, linked).collect()
    ids = {r["entity_id"] for r in alias.collect()}
    assert len(ids) == 2
    assert any((e["src"] in ids and e["dst"] in ids) for e in edges)


def test_no_per_row_python_in_exact_path(spark):  # noqa: F811
    alias = build_alias_dict(spark, NAMES)
    m = _mentions(spark, ["Hà_Nội"])
    plan = link_mentions(m, alias)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_alias_cap_forced_broadcast_fails_fast(spark, monkeypatch):  # noqa: F811
    """strategy='broadcast' must die with the guard message BEFORE the
    driver collect/broadcast, not OOM mid-job."""
    import phonlp_spark.pipeline.linking as L
    monkeypatch.setattr(L, "MAX_ALIASES", 3)
    alias = L.build_alias_dict(
        spark, [f"Entity_{i}_Long_Name" for i in range(10)])
    surfaces = spark.createDataFrame([("whatever",)], "nsurf string")
    with pytest.raises(ValueError, match="exceeds the 3-surface cap"):
        L.link_surfaces(surfaces, alias, strategy="broadcast").collect()


def test_over_cap_routes_distributed_matching_broadcast(spark, monkeypatch):  # noqa: F811
    """A larger-than-cap alias dictionary links END-TO-END through the
    inverted-index stage 2 (VERDICT r4 next-round #3) and reproduces
    the broadcast path's surface->entity map on the same input —
    exact hits, similarity hits and minted misses alike."""
    import phonlp_spark.pipeline.linking as L
    names = [f"Tập_đoàn_Số_{i}_Việt_Nam" for i in range(30)] + [
        "Công_ty_FPT_Software", "Hà_Nội_Thủ_Đô"]
    alias = L.build_alias_dict(spark, names)
    surfs = [
        "công ty fpt software",       # stage-1 exact hit
        "công ty fpt softwar",        # stage-2 similarity hit
        "tập đoàn số 7 việt nam",     # stage-1 hit among near-dup names
        "tập đoàn số 7",              # stage-2: closest is the _7_ name
        "hoàn toàn khác biệt zzzz",   # miss -> minted X id
    ]
    surfaces = spark.createDataFrame([(t,) for t in surfs], "nsurf string")
    bc = {r["nsurf"]: r["entity_id"]
          for r in L.link_surfaces(surfaces, alias,
                                   strategy="broadcast").collect()}
    monkeypatch.setattr(L, "MAX_ALIASES", 5)  # force the auto reroute
    ds = {r["nsurf"]: r["entity_id"]
          for r in L.link_surfaces(surfaces, alias).collect()}
    assert ds == bc
    assert ds["hoàn toàn khác biệt zzzz"].startswith("X")
    assert ds["công ty fpt softwar"] == ds["công ty fpt software"]


def test_distributed_stage2_never_collects_aliases(spark):  # noqa: F811
    """strategy='distributed' must not run the sizing collect at all —
    the path exists precisely for inventories that cannot cross the
    driver."""
    import phonlp_spark.pipeline.linking as L
    alias = L.build_alias_dict(spark, NAMES)
    surfaces = spark.createDataFrame([("hà nội",)], "nsurf string")
    out = L.link_surfaces(surfaces, alias, max_aliases=0,
                          strategy="distributed").collect()
    assert out[0]["entity_id"].startswith("E")


def test_distributed_zero_candidate_miss_still_mints_id(spark):  # noqa: F811
    """A miss sharing NO hashed gram with any alias has zero rows in
    the inverted-index join; it must still come back with a minted X
    id (the broadcast path scores every miss, so a dropped row would
    be a silent path divergence — NULL entity_id downstream)."""
    import numpy as np
    import phonlp_spark.pipeline.linking as L

    def grams(s):
        b = ("  " + s + "  ").encode("utf-8")
        a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
        return set(((a[:-2] * 961 + a[1:-1] * 31 + a[2:]) % L.SIM_DIM).tolist())

    names, miss = ["aaaa_bbbb"], "ZZZZQQQQ"
    # precondition: the constructed miss is gram-disjoint from every alias
    alias_grams = set().union(*(grams(a.lower().replace("_", " "))
                                for n in names
                                for a in (n, n.replace("_", " "))))
    assert not (grams(miss.lower()) & alias_grams)

    alias = L.build_alias_dict(spark, names)
    surfaces = spark.createDataFrame([(miss.lower(),)], "nsurf string")
    out = L.link_surfaces(surfaces, alias, strategy="distributed").collect()
    assert len(out) == 1 and out[0]["entity_id"].startswith("X")

    # same guarantee when the hot-gram guard drops EVERY alias gram
    misses = spark.createDataFrame([("aaaa bbbb",)], "nsurf string")
    alias_norm = (alias.select(L.norm_surface(F.col("alias")).alias("nsurf"),
                               "entity_id")
                  .groupBy("nsurf").agg(F.min("entity_id").alias("entity_id")))
    scored = L._score_misses_distributed(misses, alias_norm, max_gram_freq=0)
    rows = scored.collect()
    assert len(rows) == 1 and rows[0]["sim_id"] is None
