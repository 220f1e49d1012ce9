"""Property-based tests (hypothesis) for the decode kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from phonlp_spark.kernel.bioes import bio2_to_bioes, spans_from_bioes, to_bio2
from phonlp_spark.kernel.mst import mst_single_root
from phonlp_spark.kernel.viterbi import viterbi_batch
from phonlp_spark.kernel.vocab import Vocab

TYPES = ["PER", "LOC", "ORG", "MISC"]
BIOES_TAGS = ["O"] + [f"{p}-{t}" for p in "BIES" for t in TYPES]
BIO_TAGS = ["O"] + [f"{p}-{t}" for p in "BI" for t in TYPES]


@given(st.lists(st.sampled_from(BIOES_TAGS), min_size=0, max_size=40))
def test_bioes_spans_are_ordered_disjoint_in_bounds(tags):
    spans = spans_from_bioes(tags)
    last_end = -1
    for s, e, t in spans:
        assert 0 <= s <= e < len(tags)
        assert s > last_end  # disjoint & ordered
        last_end = e
        assert t in TYPES


@given(st.lists(st.sampled_from(BIO_TAGS), min_size=0, max_size=40))
def test_bio_pipeline_roundtrip(tags):
    """BIO -> BIO2 -> BIOES -> decode: every non-O maximal same-type
    run that starts a fresh entity in BIO2 becomes exactly one span."""
    bio2 = to_bio2(tags)
    bioes = bio2_to_bioes(bio2)
    spans = spans_from_bioes(bioes)
    # expected segments from BIO2: a segment starts at every B- tag
    expected = sum(1 for t in bio2 if t.startswith("B-"))
    assert len(spans) == expected
    # tokens covered by spans == non-O positions
    covered = {i for s, e, _ in spans for i in range(s, e + 1)}
    assert covered == {i for i, t in enumerate(bio2) if t != "O"}


@settings(max_examples=40, deadline=None)
@given(st.integers(2, 7), st.integers(0, 10_000))
def test_mst_single_root_validity(n, seed):
    scores = np.random.default_rng(seed).normal(size=(n, n))
    tree = mst_single_root(scores)
    assert tree[0] == 0
    assert int(np.sum(tree[1:] == 0)) == 1
    for i in range(1, n):
        seen, u = set(), i
        while u != 0:
            assert u not in seen
            seen.add(u)
            u = int(tree[u])


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 9), st.integers(2, 6), st.integers(0, 10_000))
def test_viterbi_beats_random_paths(T, C, seed):
    rng = np.random.default_rng(seed)
    scores = rng.normal(size=(T, C))
    trans = rng.normal(size=(C, C))
    best = viterbi_batch(scores[None], np.array([T]), trans)[0, :T]

    def total(path):
        s = scores[0, path[0]]
        for t in range(1, T):
            s += trans[path[t - 1], path[t]] + scores[t, path[t]]
        return s

    best_score = total(best)
    for _ in range(25):
        rand = rng.integers(0, C, size=T)
        assert best_score >= total(rand) - 1e-9


def test_vocab_roundtrip_and_unk():
    v = Vocab(["N", "V"])
    assert v.unmap(v.map(["N", "V", "???"])) == ["N", "V", "<UNK>"]
    assert len(v) == 6
