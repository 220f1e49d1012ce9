"""Annotation-kernel invariants: shape, determinism, batch invariance."""

import numpy as np

from phonlp_spark.kernel.annotate import AnnotationKernel
from phonlp_spark.kernel.triples import extract_triples
from phonlp_spark.kernel.vocab import DEP_RELS, NER_TAGS, POS_TAGS

SENTS = [
    "Nguyễn_Văn_A thăm Hà_Nội hôm_nay .".split(),
    "Công_ty FPT khai_trương chi_nhánh tại Đà_Nẵng .".split(),
    "Bà Trần_Thị_B nói về hợp_đồng với tập_đoàn Samsung .".split(),
    "Trời mưa .".split(),
    ("một " * 37 + "xong").split(),  # length-38 sentence, different bucket
]


def test_shapes_and_tagsets():
    kern = AnnotationKernel()
    anns = kern.annotate(SENTS)
    assert len(anns) == len(SENTS)
    for sent, a in zip(SENTS, anns):
        n = len(sent)
        assert a["tokens"] == sent
        assert len(a["upos"]) == len(a["ner"]) == len(a["head"]) == len(a["deprel"]) == n
        assert all(t in POS_TAGS for t in a["upos"])
        assert all(t in NER_TAGS for t in a["ner"])
        assert all(r in DEP_RELS for r in a["deprel"])
        assert all(0 <= h <= n for h in a["head"])
        # exactly one root attachment
        assert sum(1 for h in a["head"] if h == 0) == 1
        # tree: every token reaches root
        for i in range(n):
            seen, u = set(), i + 1
            while u != 0:
                assert u not in seen
                seen.add(u)
                u = a["head"][u - 1]


def test_deterministic_and_batch_invariant():
    k1, k2 = AnnotationKernel(), AnnotationKernel()
    whole = k1.annotate(SENTS)
    onebyone = [k2.annotate([s])[0] for s in SENTS]
    for a, b in zip(whole, onebyone):
        assert a == b


def test_label_diversity():
    kern = AnnotationKernel()
    anns = kern.annotate(SENTS)
    assert len({t for a in anns for t in a["upos"]}) >= 3
    assert len({t for a in anns for t in a["ner"]}) >= 2
    assert len({t for a in anns for t in a["deprel"]}) >= 3


def test_long_sentence_cap():
    kern = AnnotationKernel()
    sent = [f"w{i}" for i in range(300)]
    a = kern.annotate([sent])[0]
    assert len(a["upos"]) == 300
    assert a["upos"][299] == "N" and a["ner"][299] == "O"
    # single-root invariant survives the cap: overflow tokens chain onto
    # the previous token instead of attaching to ROOT
    assert a["head"].count(0) == 1
    assert a["head"][256] == 256  # first overflow -> last kernel token
    assert a["head"][299] == 299
    assert all(0 <= h <= 300 for h in a["head"])


def test_triple_rules_pinned():
    tokens = ["Ông_A", "mua", "nhà", "của", "Công_ty_B", "."]
    upos = ["Np", "V", "N", "E", "Np", "CH"]
    heads = [2, 0, 2, 3, 4, 2]  # A<-mua, nha<-mua(dob), cua<-nha, B<-cua
    deprels = ["sub", "root", "dob", "nmod", "pob", "punct"]
    mentions = [(0, 0, "PER"), (2, 4, "ORG")]
    got = extract_triples(tokens, upos, heads, deprels, mentions)
    assert ("Ông_A", "mua", "nhà của Công_ty_B", "PER", "ORG", "sub-dob") in got


def test_nmod_rule():
    tokens = ["giám_đốc", "Công_ty_B", "phát_biểu"]
    upos = ["N", "Np", "V"]
    heads = [3, 1, 0]
    deprels = ["sub", "nmod", "root"]
    mentions = [(0, 0, "PER"), (1, 1, "ORG")]
    got = extract_triples(tokens, upos, heads, deprels, mentions)
    assert ("giám_đốc", "nmod", "Công_ty_B", "PER", "ORG", "nmod") in got


def test_numeric_stability_helpers():
    from phonlp_spark.kernel.annotate import _logsigmoid, _softplus

    x = np.array([-1000.0, -1.0, 0.0, 1.0, 1000.0])
    ls = _logsigmoid(x)
    assert np.all(np.isfinite(ls[1:]))
    assert ls[0] <= -999
    sp = _softplus(x)
    assert np.isclose(sp[2], np.log(2))
    assert np.isclose(sp[4], 1000.0)
