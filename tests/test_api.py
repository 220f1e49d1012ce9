"""Drop-in API parity with the reference's annotate() surface."""

import phonlp_spark.api as phonlp


def test_text_mode_returns_reference_tuple():
    model = phonlp.load()
    out = model.annotate(text="Nguyễn_Văn_A thăm Hà_Nội .")
    data, pos, ner, dep = out
    assert data == [["Nguyễn_Văn_A", "thăm", "Hà_Nội", "."]]
    assert len(pos[0]) == len(ner[0]) == len(dep[0]) == 4
    assert isinstance(pos[0][0], list) and len(pos[0][0]) == 1
    head, rel = dep[0][0]
    assert head.isdigit() and isinstance(rel, str)


def test_file_mode_six_column(tmp_path):
    inp = tmp_path / "input.txt"
    inp.write_text("Tôi yêu Hà_Nội .\nTrời mưa .\n\n", encoding="utf-8")
    outp = tmp_path / "out.tsv"
    phonlp.load().annotate(input_file=str(inp), output_file=str(outp))
    blocks = outp.read_text(encoding="utf-8").strip("\n").split("\n\n")
    assert len(blocks) == 2
    rows = blocks[0].splitlines()
    assert len(rows) == 4
    assert all(len(r.split("\t")) == 6 for r in rows)
    assert rows[0].split("\t")[0] == "1"


def test_file_mode_conll(tmp_path):
    inp = tmp_path / "input.txt"
    inp.write_text("Trời mưa .\n", encoding="utf-8")
    outp = tmp_path / "out.conll"
    phonlp.load().annotate(input_file=str(inp), output_file=str(outp),
                           output_type="conll")
    rows = outp.read_text(encoding="utf-8").strip("\n").splitlines()
    assert all(len(r.split("\t")) == 10 for r in rows if r)


def test_determinism_across_loads():
    a = phonlp.load().annotate(text="Công_ty FPT đầu_tư vào Đà_Nẵng .")
    b = phonlp.load().annotate(text="Công_ty FPT đầu_tư vào Đà_Nẵng .")
    assert a == b
