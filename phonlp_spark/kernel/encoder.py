"""Pluggable word encoder.

The reference encodes with PhoBERT (phonlp/annotate_model.py:119,159 —
last hidden states, first-subword gather).  torch/transformers are not
available in this sandbox, so the engine ships a deterministic
feature-hashing encoder with the same interface contract: a sequence of
word-segmented tokens in, a float32 [n_words, dim] matrix out.  In
production the `Encoder` protocol is satisfied by a PhoBERT wrapper
whose weights are broadcast once per job; nothing else in the pipeline
changes.

The deterministic encoder hashes character n-grams (1..3) of each word
into `dim` signed buckets (classic feature hashing / hashing trick),
L2-normalizes, and memoizes per word — it is context-free, stable across
processes (crc32, not Python hash()), and produces enough label
diversity downstream for meaningful P/R tests.
"""

from __future__ import annotations

import zlib

import numpy as np

ROOT_TOKEN = "[ROOT]"


class HashedNgramEncoder:
    """Deterministic, process-stable, memoized word encoder."""

    def __init__(self, dim: int = 64, seed: int = 42):
        self.dim = dim
        self.seed = seed
        self._cache: dict[str, np.ndarray] = {}

    def _word_vec(self, word: str) -> np.ndarray:
        v = self._cache.get(word)
        if v is not None:
            return v
        dim = self.dim
        acc = np.zeros(dim, dtype=np.float64)
        data = word.encode("utf-8", "ignore")
        n = len(data)
        for size in (1, 2, 3):
            for i in range(n - size + 1):
                h = zlib.crc32(data[i : i + size], self.seed)
                acc[(h >> 1) % dim] += 1.0 if (h & 1) else -1.0
        # length scalar keeps very short words distinguishable
        acc[zlib.crc32(b"#len", self.seed) % dim] += min(n, 16) / 4.0
        norm = np.linalg.norm(acc)
        if norm > 0:
            acc /= norm
        v = acc.astype(np.float32)
        self._cache[word] = v
        return v

    def encode_padded(self, sentences: list[list[str]], max_len: int) -> np.ndarray:
        """[B, max_len, dim] float32; rows past each sentence length are 0."""
        out = np.zeros((len(sentences), max_len, self.dim), dtype=np.float32)
        wv = self._word_vec
        for i, sent in enumerate(sentences):
            for j, w in enumerate(sent):
                out[i, j] = wv(w)
        return out
