"""Checkpoint IO roundtrip + the subword first-subword-gather convention
(reference phonlp/run_script.py:19-38, annotate_model.py:382-424)."""

import numpy as np
import pytest

from phonlp_spark.kernel.annotate import AnnotationKernel
from phonlp_spark.kernel.checkpoint import (
    SubwordEncoder,
    first_subword_indices,
    load_checkpoint,
    save_checkpoint,
)
from phonlp_spark.kernel.encoder import HashedNgramEncoder
from phonlp_spark.kernel.weights import seeded_weights

SENTS = [
    "Nguyễn_Văn_A thăm Hà_Nội .".split(),
    "Công_ty mua nhà của ông Minh_Phúc tại Đà_Nẵng".split(),
]


def test_roundtrip_annotations_identical(tmp_path):
    w = seeded_weights(seed=42)
    save_checkpoint(w, str(tmp_path))
    w2 = load_checkpoint(str(tmp_path))
    assert (w2.n_pos, w2.n_ner, w2.n_rel) == (w.n_pos, w.n_ner, w.n_rel)
    np.testing.assert_array_equal(w2.crf_trans, w.crf_trans)
    np.testing.assert_array_equal(w2.arc.u, w.arc.u)
    a = AnnotationKernel(weights=w).annotate(SENTS)
    b = AnnotationKernel(weights=w2).annotate(SENTS)
    assert a == b


def test_reference_state_dict_mapping_roundtrip():
    """Build a reference-shaped state_dict FROM seeded engine weights
    (inverting the transposes and the bilinear-bias fold), map it back
    through arrays_from_reference_state, and require byte-identical
    annotations — proving the torch name map and layout conventions."""
    from phonlp_spark.kernel.checkpoint import (
        _from_arrays, arrays_from_reference_state)

    w = seeded_weights(seed=42)
    state = {
        "upos_hid.weight": w.pos_w1.T, "upos_hid.bias": w.pos_b1,
        "upos_clf.weight": w.pos_w2.T, "upos_clf.bias": w.pos_b2,
        "upos_emb_matrix_ner": w.upos_emb_ner,
        "upos_emb_matrix_dep": w.upos_emb_dep,
        "ner_tag_clf.weight": w.ner_w.T, "ner_tag_clf.bias": w.ner_b,
        "crit_ner._transitions": w.crf_trans,
        "dep_hid.weight": w.dep_w.T, "dep_hid.bias": w.dep_b,
    }
    for b, prefix in (("arc", "unlabeled"), ("rel", "deprel"),
                      ("lin", "linearization"), ("dist", "distance")):
        biaff = getattr(w, b)
        u = biaff.u.copy()
        bias = np.full(u.shape[2], 0.25, dtype=np.float32)
        u[-1, -1, :] -= bias  # the loader folds it back in
        state[f"{prefix}.W1.weight"] = biaff.w1.T
        state[f"{prefix}.W1.bias"] = biaff.b1
        state[f"{prefix}.W2.weight"] = biaff.w2.T
        state[f"{prefix}.W2.bias"] = biaff.b2
        state[f"{prefix}.scorer.W_bilin.weight"] = u
        state[f"{prefix}.scorer.W_bilin.bias"] = bias

    arrays = arrays_from_reference_state(state)
    w2 = _from_arrays(arrays, {"n_pos": w.n_pos, "n_ner": w.n_ner,
                               "n_rel": w.n_rel})
    np.testing.assert_allclose(w2.arc.u, w.arc.u, rtol=0, atol=1e-6)
    a = AnnotationKernel(weights=w).annotate(SENTS)
    b = AnnotationKernel(weights=w2).annotate(SENTS)
    assert a == b


def test_meta_from_reference_vocab_uses_id2unit():
    """ckpt['vocab'][k] is BaseVocab.state_dict() — an ATTRIBUTE dict
    (models/common/vocab.py:28 state_attrs), so len() would return 6
    regardless of inventory.  Sizes must come from _id2unit."""
    from phonlp_spark.kernel.checkpoint import meta_from_reference_vocab

    def fake_vocab(units):
        return {"lang": "vi", "idx": 0, "cutoff": 0, "lower": False,
                "_unit2id": {u: i for i, u in enumerate(units)},
                "_id2unit": list(units)}

    vocab = {"upos": fake_vocab([f"P{i}" for i in range(17)]),
             "ner_tag": fake_vocab([f"N{i}" for i in range(11)]),
             "deprel": fake_vocab([f"R{i}" for i in range(29)])}
    meta = meta_from_reference_vocab(vocab)
    assert meta == {"n_pos": 17, "n_ner": 11, "n_rel": 29}
    # plain id lists (engine-native fixtures) still work
    plain = {"upos": ["A", "B"], "ner_tag": ["O"], "deprel": ["root"]}
    assert meta_from_reference_vocab(plain) == {
        "n_pos": 2, "n_ner": 1, "n_rel": 1}


def test_check_vocab_shapes_catches_mismatch():
    from phonlp_spark.kernel.checkpoint import check_vocab_shapes

    w = seeded_weights(seed=42)
    check_vocab_shapes(w)  # consistent weights pass
    import dataclasses
    bad = dataclasses.replace(w, n_pos=6)  # the attr-dict-len failure mode
    with pytest.raises(ValueError, match="n_pos=6"):
        check_vocab_shapes(bad)


def test_missing_checkpoint_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_checkpoint(str(tmp_path / "nowhere"))


def test_default_kernel_honors_checkpoint_env(tmp_path, monkeypatch):
    """PHONLP_SPARK_CHECKPOINT swaps trained weights into the
    executor-side singleton (the spark-submit production path)."""
    import phonlp_spark.kernel.annotate as ka

    w7 = seeded_weights(seed=7)
    save_checkpoint(w7, str(tmp_path))
    monkeypatch.setenv("PHONLP_SPARK_CHECKPOINT", str(tmp_path))
    monkeypatch.setattr(ka, "_DEFAULT_KERNEL", None)  # restored after test
    k = ka.default_kernel()
    np.testing.assert_array_equal(k.weights.crf_trans, w7.crf_trans)


def _reference_first_sw(counts, root_subwords=0):
    """Literal transcription of the reference bookkeeping
    (annotate_model.py:386-393 / 405-416) over subword COUNTS."""
    input_len = 1  # [cls_id]
    first = [input_len]
    if root_subwords:
        input_len += root_subwords
        first.append(input_len)
    for c in counts:
        input_len += c
        first.append(input_len)
    return first[:-1]  # drop the trailing sentinel


@pytest.mark.parametrize("counts,root", [
    ([2, 2, 2], 0),
    ([2, 2, 2], 1),
    ([1, 3, 2, 1], 0),
    ([1, 3, 2, 1], 2),
    ([5], 1),
    ([], 0),
])
def test_first_subword_matches_reference_convention(counts, root):
    assert first_subword_indices(counts, root) == _reference_first_sw(counts, root)


def test_subword_encoder_gathers_first_subword():
    base = HashedNgramEncoder(dim=32)

    def tokenize(w):  # fake 2-subword-per-word tokenizer
        return [w[: max(len(w) // 2, 1)], w[max(len(w) // 2, 1):] or "##"]

    def embed(subs):
        return np.stack([base._word_vec(s) for s in subs])

    enc = SubwordEncoder(tokenize, embed, dim=32)
    sents = [["hello", "world"], ["xy"]]
    out = enc.encode_padded(sents, max_len=3)
    assert out.shape == (2, 3, 32)
    # each word's vector must be its FIRST subword's embedding
    np.testing.assert_array_equal(out[0, 0], base._word_vec("he"))
    np.testing.assert_array_equal(out[0, 1], base._word_vec("wo"))
    np.testing.assert_array_equal(out[1, 0], base._word_vec("x"))
    assert not out[1, 1].any()  # padding stays zero


def test_subword_encoder_zero_subword_words():
    """A word whose tokenize() returns [] must not crash the gather:
    mid-sentence it points at its successor's first subword (reference
    behavior), and a zero-subword FINAL word clamps to the last real
    subword instead of indexing past the embedding."""
    base = HashedNgramEncoder(dim=16)

    def tokenize(w):
        return [] if w.startswith("∅") else [w]

    def embed(subs):
        return np.stack([base._word_vec(s) for s in subs])

    enc = SubwordEncoder(tokenize, embed, dim=16)
    out = enc.encode_padded([["a", "∅mid", "b", "∅last"]], max_len=4)
    np.testing.assert_array_equal(out[0, 0], base._word_vec("a"))
    np.testing.assert_array_equal(out[0, 1], base._word_vec("b"))  # successor
    np.testing.assert_array_equal(out[0, 2], base._word_vec("b"))
    np.testing.assert_array_equal(out[0, 3], base._word_vec("b"))  # clamped


def test_kernel_accepts_subword_encoder():
    """The annotation kernel is encoder-agnostic: swapping in the
    subword encoder changes representations, not the dataflow."""
    base = HashedNgramEncoder(dim=64)

    def tokenize(w):
        return [w, "##sfx"]

    def embed(subs):
        return np.stack([base._word_vec(s) for s in subs])

    kern = AnnotationKernel()
    kern.encoder = SubwordEncoder(tokenize, embed, dim=64)
    anns = kern.annotate(SENTS)
    assert len(anns) == 2
    for a, s in zip(anns, SENTS):
        assert a["tokens"] == s
        assert a["head"].count(0) == 1  # still a single-root tree
