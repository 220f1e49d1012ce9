"""CoNLL-U / token-tag IO vs the reference sample-file shapes."""

import os

import pytest

from phonlp_spark.pipeline.annotate import annotate_sentences_df, annotations_long
from phonlp_spark.pipeline.conllu import (
    annotations_to_tsv6,
    read_conllu,
    read_token_tag,
)
from phonlp_spark.pipeline.ingest import synth_documents, split_sentences

from tests.spark_fixtures import spark  # noqa: F401

REF_DEP = "/root/reference/phonlp/sample_data/dep_train.conll"
REF_NER = "/root/reference/phonlp/sample_data/ner_train.txt"


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text, encoding="utf-8")
    return str(p)


def test_read_conllu_semantics(spark, tmp_path):  # noqa: F811
    text = (
        "# comment line\n"
        "1\tAnh\t_\t_\t_\t_\t2\tsub\t_\t_\n"
        "1.1\tgap\t_\t_\t_\t_\t0\t_\t_\t_\n"
        "2\tăn\t_\t_\t_\t_\t0\troot\t_\t_\n"
        "\n"
        "1\tTốt\t_\t_\t_\t_\t0\troot\t_\t_\n"
    )
    df = read_conllu(spark, _write(tmp_path, "a.conll", text))
    rows = df.collect()
    assert [(r["sent_id"], r["id"], r["form"], r["head"], r["deprel"])
            for r in rows] == [
        (0, 1, "Anh", 2, "sub"), (0, 2, "ăn", 0, "root"), (1, 1, "Tốt", 0, "root")]


def test_read_token_tag(spark, tmp_path):  # noqa: F811
    text = "Hà_Nội\tB-LOC\nđẹp\tO\n\nTôi\tO\n"
    df = read_token_tag(spark, _write(tmp_path, "n.txt", text))
    rows = df.collect()
    assert [(r["sent_id"], r["token_id"], r["token"], r["tag"]) for r in rows] == [
        (0, 1, "Hà_Nội", "B-LOC"), (0, 2, "đẹp", "O"), (1, 1, "Tôi", "O")]


@pytest.mark.skipif(not os.path.exists(REF_DEP), reason="reference not on disk")
def test_reads_reference_vndt_sample(spark):  # noqa: F811
    df = read_conllu(spark, REF_DEP)
    assert df.count() > 100
    assert df.filter("head is null").count() == 0
    rels = {r["deprel"] for r in df.select("deprel").distinct().collect()}
    assert {"root", "sub", "dob", "nmod", "punct"} <= rels
    # every sentence has exactly one root
    roots = df.filter("head = 0").groupBy("file", "sent_id").count()
    assert roots.filter("count != 1").count() == 0


@pytest.mark.skipif(not os.path.exists(REF_NER), reason="reference not on disk")
def test_reads_reference_vlsp_ner_sample(spark):  # noqa: F811
    df = read_token_tag(spark, REF_NER)
    tags = {r["tag"] for r in df.select("tag").distinct().collect()}
    assert "O" in tags and any(t.startswith("B-") for t in tags)


def test_tsv6_export_shape(spark):  # noqa: F811
    docs = synth_documents(spark, 5, seed=8)
    ann = annotations_long(annotate_sentences_df(split_sentences(docs)))
    blocks = annotations_to_tsv6(ann).collect()
    assert blocks
    first = blocks[0]["block"].splitlines()
    cols = first[0].split("\t")
    assert len(cols) == 6 and cols[0] == "1"
    # index column is 1..n in order
    assert [ln.split("\t")[0] for ln in first] == [
        str(i + 1) for i in range(len(first))]
