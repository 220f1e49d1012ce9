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


def test_alias_inventory_cap_fails_fast(spark, monkeypatch):  # noqa: F811
    """An oversized alias dictionary must die with the guard message
    BEFORE the driver collect/broadcast, not OOM mid-job."""
    import phonlp_spark.pipeline.linking as L
    monkeypatch.setattr(L, "MAX_ALIASES", 3)
    alias = L.build_alias_dict(
        spark, [f"Entity_{i}_Long_Name" for i in range(10)])
    surfaces = spark.createDataFrame([("whatever",)], "nsurf string")
    with pytest.raises(ValueError, match="alias inventory exceeds the 3-surface cap"):
        L.link_surfaces(surfaces, alias).collect()
