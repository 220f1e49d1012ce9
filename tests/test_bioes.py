"""BIO/BIO2/BIOES semantics, incl. the reference decode quirks.

Expected values derive from the reference state machine
(phonlp/models/ner/utils.py:27-128) behavior, re-derived by hand.
"""

from phonlp_spark.kernel.bioes import bio2_to_bioes, is_bio, spans_from_bioes, to_bio2


def test_to_bio2():
    assert to_bio2(["I-PER", "I-PER", "O", "I-LOC"]) == ["B-PER", "I-PER", "O", "B-LOC"]
    assert to_bio2(["B-PER", "I-PER", "I-LOC"]) == ["B-PER", "I-PER", "B-LOC"]
    assert to_bio2(["O", "B-ORG", "I-ORG"]) == ["O", "B-ORG", "I-ORG"]


def test_bio2_to_bioes():
    assert bio2_to_bioes(["B-PER", "I-PER", "O", "B-LOC"]) == ["B-PER", "E-PER", "O", "S-LOC"]
    assert bio2_to_bioes(["B-ORG"]) == ["S-ORG"]
    assert bio2_to_bioes(["B-ORG", "I-ORG", "I-ORG"]) == ["B-ORG", "I-ORG", "E-ORG"]


def test_is_bio():
    assert is_bio(["O", "B-PER", "I-PER"])
    assert not is_bio(["O", "S-PER"])


def test_decode_basic():
    tags = ["O", "B-PER", "E-PER", "O", "S-LOC"]
    assert spans_from_bioes(tags) == [(1, 2, "PER"), (4, 4, "LOC")]


def test_decode_lenient_I_after_O():
    assert spans_from_bioes(["O", "I-ORG", "E-ORG"]) == [(1, 2, "ORG")]


def test_decode_type_switch_keeps_last_type():
    # reference keeps ONE span typed by the last tag seen
    assert spans_from_bioes(["B-PER", "I-LOC", "E-LOC"]) == [(0, 2, "LOC")]


def test_decode_unterminated_flushes_at_end():
    assert spans_from_bioes(["O", "B-MISC", "I-MISC"]) == [(1, 2, "MISC")]


def test_decode_B_after_B_flushes():
    assert spans_from_bioes(["B-PER", "B-LOC", "E-LOC"]) == [(0, 0, "PER"), (1, 2, "LOC")]


def test_decode_inert_special_tags():
    # specials neither extend nor flush (reference falls through)
    assert spans_from_bioes(["B-PER", "<PAD>", "E-PER"]) == [(0, 2, "PER")]


def test_decode_none_is_O():
    assert spans_from_bioes([None, "S-PER"]) == [(1, 1, "PER")]
