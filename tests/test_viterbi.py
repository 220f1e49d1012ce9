"""Batched Viterbi vs an exhaustive / naive scalar decode."""

import itertools

import numpy as np

from phonlp_spark.kernel.viterbi import viterbi_batch, viterbi_single


def exhaustive(scores, trans):
    T, C = scores.shape
    best, best_path = -np.inf, None
    for path in itertools.product(range(C), repeat=T):
        total = scores[0, path[0]]
        for t in range(1, T):
            total += trans[path[t - 1], path[t]] + scores[t, path[t]]
        if total > best:
            best, best_path = total, path
    return list(best_path)


def test_single_vs_exhaustive():
    rng = np.random.default_rng(1)
    for T in (1, 2, 3, 5, 6):
        for _ in range(20):
            scores = rng.normal(size=(T, 4))
            trans = rng.normal(size=(4, 4))
            assert viterbi_single(scores, trans) == exhaustive(scores, trans)


def test_batch_matches_single_with_ragged_lengths():
    rng = np.random.default_rng(2)
    C = 6
    lengths = np.array([1, 3, 7, 7, 2, 5])
    T = int(lengths.max())
    scores = rng.normal(size=(len(lengths), T, C))
    trans = rng.normal(size=(C, C))
    tags = viterbi_batch(scores, lengths, trans)
    for i, ln in enumerate(lengths):
        assert tags[i, :ln].tolist() == viterbi_single(scores[i, :ln], trans)


def test_batch_composition_invariance():
    rng = np.random.default_rng(3)
    scores = rng.normal(size=(8, 5, 4))
    lengths = np.full(8, 5)
    trans = rng.normal(size=(4, 4))
    whole = viterbi_batch(scores, lengths, trans)
    for i in range(8):
        assert whole[i].tolist() == viterbi_single(scores[i], trans)
