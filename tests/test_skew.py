"""Long-document skew: a mega-document must fan out across partitions
at sentence grain, annotate within the length cap, and reassemble."""

from pyspark.sql import functions as F

from phonlp_spark.pipeline.annotate import (
    annotate_sentences_df,
    reassemble_documents,
)
from phonlp_spark.pipeline.ingest import DOCUMENTS_SCHEMA, split_sentences

from tests.spark_fixtures import spark  # noqa: F401


def _mega_doc(spark, n_spans=60, tokens_per_span=250):  # noqa: F811
    spans = []
    for k in range(n_spans):
        text = " ".join(f"w{k}_{i}" for i in range(tokens_per_span))
        spans.append(("text", text, "", k))
    spans.append(("image", "", "media://tail", n_spans))
    small = [("text", "ngắn thôi", "", 0)]
    return spark.createDataFrame(
        [("mega", spans), ("tiny", small)], DOCUMENTS_SCHEMA)


def test_mega_doc_fans_out_and_reassembles(spark):  # noqa: F811
    docs = _mega_doc(spark)
    sents = split_sentences(docs)
    # sentence-grain rows + salted repartition: the mega doc spreads
    parts = (
        sents.repartition(8, F.xxhash64("doc_id", "span_idx"))
        .withColumn("pid", F.spark_partition_id())
        .filter(F.col("doc_id") == "mega")
        .select("pid").distinct().count()
    )
    assert parts >= 4, f"mega doc pinned to {parts} partitions"

    ann = annotate_sentences_df(sents, salt_partitions=8)
    rows = ann.filter(F.col("doc_id") == "mega").collect()
    assert len(rows) == 60
    for r in rows:
        assert len(r["upos"]) == 250  # cap path keeps full token count

    rebuilt = {r["doc_id"]: r["spans"] for r in
               reassemble_documents(docs, ann).collect()}
    src = {r["doc_id"]: r["spans"] for r in docs.collect()}
    for d in ("mega", "tiny"):
        assert [tuple(s) for s in rebuilt[d]] == [tuple(s) for s in src[d]]
