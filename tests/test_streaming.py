"""Incremental mode: each run drains only new files; totals match the
batch pipeline on the union of inputs."""

from phonlp_spark.pipeline.annotate import annotate_sentences_df, annotations_long
from phonlp_spark.pipeline.ingest import split_sentences, synth_documents
from phonlp_spark.streaming.incremental import incremental_annotate

from tests.spark_fixtures import spark  # noqa: F401


def test_incremental_drains_only_new_files(spark, tmp_path):  # noqa: F811
    in_dir = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    batch1 = synth_documents(spark, 30, seed=1)
    batch1.write.mode("append").parquet(in_dir)
    assert incremental_annotate(spark, in_dir, ckpt, out, salt_partitions=4) >= 1
    n1 = spark.read.parquet(f"{out}/annotations").count()
    assert n1 > 0

    # second run with no new files: nothing appended
    incremental_annotate(spark, in_dir, ckpt, out, salt_partitions=4)
    assert spark.read.parquet(f"{out}/annotations").count() == n1

    # add new docs; only they are processed
    batch2 = synth_documents(spark, 20, seed=2)
    batch2.write.mode("append").parquet(in_dir)
    incremental_annotate(spark, in_dir, ckpt, out, salt_partitions=4)
    n2 = spark.read.parquet(f"{out}/annotations").count()

    # totals equal the one-shot batch pipeline over both batches
    expected = annotations_long(annotate_sentences_df(
        split_sentences(batch1.unionByName(batch2)))).count()
    assert n2 == expected
