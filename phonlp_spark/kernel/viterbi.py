"""Batched CRF Viterbi decode.

Semantics contract (reference: phonlp/models/common/crf.py:103-126,
called per sentence at phonlp/annotate_model.py:279-287): max-product
dynamic program over per-position tag scores plus a tag-transition
matrix; the reference decodes one sentence at a time — here the trellis
and backtrace are vectorized across the whole Arrow batch, which is one
of the engine's throughput wins over the reference loop.
"""

from __future__ import annotations

import numpy as np


def viterbi_batch(scores: np.ndarray, lengths: np.ndarray, trans: np.ndarray) -> np.ndarray:
    """Decode a padded batch.

    scores:  [B, T, C] emission scores (positions >= length are ignored)
    lengths: [B] true sequence lengths (>= 1)
    trans:   [C, C] transition scores (trans[prev, cur])
    returns: [B, T] int32 best tag ids (garbage past each length)
    """
    B, T, C = scores.shape
    lengths = np.asarray(lengths, dtype=np.int64)
    trellis = np.empty((B, T, C), dtype=np.float64)
    back = np.zeros((B, T, C), dtype=np.int32)
    trellis[:, 0] = scores[:, 0]
    for t in range(1, T):
        step = trellis[:, t - 1, :, None] + trans[None, :, :]  # [B, Cprev, C]
        back[:, t] = step.argmax(axis=1)
        trellis[:, t] = scores[:, t] + step.max(axis=1)

    tags = np.zeros((B, T), dtype=np.int32)
    rows = np.arange(B)
    last = lengths - 1
    cur = trellis[rows, last].argmax(axis=1).astype(np.int32)
    tags[rows, last] = cur
    for t in range(T - 1, 0, -1):
        live = last >= t  # sentence has a position t, so step back to t-1
        stepped = back[rows, t, cur]
        cur = np.where(live, stepped, cur).astype(np.int32)
        tags[live, t - 1] = cur[live]
    return tags


def viterbi_single(scores: np.ndarray, trans: np.ndarray) -> list[int]:
    """One-sentence convenience wrapper (tests / oracle spot checks)."""
    out = viterbi_batch(scores[None, :, :], np.array([scores.shape[0]]), trans)
    return out[0].tolist()
