"""Iceberg-shaped catalog: snapshots, append/overwrite, time travel."""

import pytest

from phonlp_spark.pipeline.catalog import CatalogTable

from tests.spark_fixtures import spark  # noqa: F401


def test_append_overwrite_time_travel(spark, tmp_path):  # noqa: F811
    t = CatalogTable(str(tmp_path / "tbl"))
    s1 = t.commit(spark.range(5).toDF("id"), "append")
    s2 = t.commit(spark.range(5, 8).toDF("id"), "append")
    assert t.read(spark).count() == 8
    assert t.read(spark, s1["snapshot_id"]).count() == 5

    s3 = t.commit(spark.range(100, 102).toDF("id"), "overwrite")
    assert t.read(spark).count() == 2
    # older snapshots still readable (immutability)
    assert t.read(spark, s2["snapshot_id"]).count() == 8
    hist = t.history()
    assert [h["snapshot_id"] for h in hist] == [
        s1["snapshot_id"], s2["snapshot_id"], s3["snapshot_id"]]
    assert hist[1]["parent_id"] == s1["snapshot_id"]
    assert hist[2]["total_rows"] == 2


def test_stale_lock_file_does_not_block(spark, tmp_path):  # noqa: F811
    """A lock file left behind by a kill -9'd process must not wedge
    the log: the lock is an OS flock (released when its holder dies),
    so a mere leftover file carries no lock and commits proceed."""
    t = CatalogTable(str(tmp_path / "tbl"))
    with open(t._log_path() + ".lock", "w"):
        pass  # simulate the orphaned sentinel a dead process would leave
    s1 = t.commit(spark.range(3).toDF("id"))
    assert t.read(spark).count() == 3
    assert t.history()[-1]["snapshot_id"] == s1["snapshot_id"]


def test_read_errors(spark, tmp_path):  # noqa: F811
    t = CatalogTable(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        t.read(spark)
    t.commit(spark.range(1).toDF("id"))
    with pytest.raises(KeyError):
        t.read(spark, "nope")
    with pytest.raises(ValueError):
        t.commit(spark.range(1).toDF("id"), "merge")
