"""Seeded model parameters for the annotation heads.

Mirrors the parameter inventory of the reference JointModel
(phonlp/annotate_model.py:18-111): shared encoder -> POS MLP head,
soft-POS tag-embedding matrices (SEPARATE matrices for the NER and DEP
branches, annotate_model.py:47-52 — a semantic must-keep), NER linear
head + CRF transition matrix, dep hidden layer, and four deep-biaffine
scorers (arc, label, linearization, distance).

In production these arrays are the trained PhoBERT-era weights loaded
from a checkpoint and broadcast once; in this sandbox they are
deterministic seeded draws — the frozen single-process oracle and the
Spark engine consume the exact same arrays, so parity tests are exact.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from phonlp_spark.kernel.encoder import HashedNgramEncoder
from phonlp_spark.kernel.vocab import N_SPECIALS, default_vocabs

ENC_DIM = 64     # encoder hidden size (768 with real PhoBERT)
TAG_EMB = 16     # soft-POS tag embedding dim (reference tag_emb_dim=100)
BIAFF = 32       # deep-biaffine hidden dim (reference 400)


@dataclass
class Biaffine:
    """Deep biaffine scorer parameters: two input MLPs + bilinear core.

    score[b, i, j, o] = relu(x_i @ w1 + b1)^ @ u[:, :, o] @ relu(x_j @ w2 + b2)^
    where ^ appends a constant 1 (bias feature), reference
    phonlp/models/common/biaffine.py:54-85.
    """

    w1: np.ndarray
    b1: np.ndarray
    w2: np.ndarray
    b2: np.ndarray
    u: np.ndarray  # [BIAFF+1, BIAFF+1, out]


@dataclass
class ModelWeights:
    pos_w1: np.ndarray
    pos_b1: np.ndarray
    pos_w2: np.ndarray
    pos_b2: np.ndarray
    upos_emb_ner: np.ndarray
    upos_emb_dep: np.ndarray
    ner_w: np.ndarray
    ner_b: np.ndarray
    crf_trans: np.ndarray
    dep_w: np.ndarray
    dep_b: np.ndarray
    arc: Biaffine = field(default=None)
    rel: Biaffine = field(default=None)
    lin: Biaffine = field(default=None)
    dist: Biaffine = field(default=None)
    n_pos: int = 0
    n_ner: int = 0
    n_rel: int = 0


def _biaffine(rng: np.random.Generator, d_in: int, out: int, scale: float) -> Biaffine:
    return Biaffine(
        w1=rng.normal(0, scale, (d_in, BIAFF)).astype(np.float32),
        b1=rng.normal(0, scale, BIAFF).astype(np.float32),
        w2=rng.normal(0, scale, (d_in, BIAFF)).astype(np.float32),
        b2=rng.normal(0, scale, BIAFF).astype(np.float32),
        u=rng.normal(0, scale, (BIAFF + 1, BIAFF + 1, out)).astype(np.float32),
    )


def seeded_weights(seed: int = 42, enc_dim: int = ENC_DIM) -> ModelWeights:
    vocabs = default_vocabs()
    n_pos, n_ner, n_rel = len(vocabs["upos"]), len(vocabs["ner_tag"]), len(vocabs["deprel"])
    rng = np.random.default_rng(seed)
    s = 0.35
    d_cat = enc_dim + TAG_EMB
    w = ModelWeights(
        pos_w1=rng.normal(0, s, (enc_dim, BIAFF)).astype(np.float32),
        pos_b1=rng.normal(0, s, BIAFF).astype(np.float32),
        pos_w2=rng.normal(0, s, (BIAFF, n_pos)).astype(np.float32),
        pos_b2=rng.normal(0, s, n_pos).astype(np.float32),
        upos_emb_ner=rng.normal(0, s, (n_pos, TAG_EMB)).astype(np.float32),
        upos_emb_dep=rng.normal(0, s, (n_pos, TAG_EMB)).astype(np.float32),
        ner_w=rng.normal(0, s, (d_cat, n_ner)).astype(np.float32),
        ner_b=rng.normal(0, s, n_ner).astype(np.float32),
        crf_trans=rng.normal(0, s, (n_ner, n_ner)).astype(np.float32),
        dep_w=rng.normal(0, s, (d_cat, d_cat)).astype(np.float32),
        dep_b=rng.normal(0, s, d_cat).astype(np.float32),
        arc=_biaffine(rng, d_cat, 1, s),
        rel=_biaffine(rng, d_cat, n_rel, s),
        lin=_biaffine(rng, d_cat, 1, s),
        dist=_biaffine(rng, d_cat, 1, s),
        n_pos=n_pos,
        n_ner=n_ner,
        n_rel=n_rel,
    )
    _calibrate(w, rng, enc_dim, seed)
    return w


def _probe_words(rng: np.random.Generator, n: int = 400) -> list[str]:
    """Deterministic pseudo-syllable probe vocabulary for calibration."""
    cons = ["b", "c", "ch", "d", "g", "h", "k", "l", "m", "n", "ng", "nh",
            "p", "ph", "q", "r", "s", "t", "th", "tr", "v", "x"]
    vows = ["a", "e", "i", "o", "u", "y", "ai", "ao", "au", "ia", "oa", "ua"]
    words = []
    for _ in range(n):
        syls = []
        for _s in range(int(rng.integers(1, 4))):
            syls.append(cons[int(rng.integers(len(cons)))] + vows[int(rng.integers(len(vows)))])
        words.append("_".join(syls))
    return words


def _standardize_cols(scores: np.ndarray, eps: float = 1e-6):
    """Per-column (mean, std) of probe scores, specials excluded upstream."""
    return scores.mean(axis=0), scores.std(axis=0) + eps


def _relu(x):
    return np.maximum(x, 0.0)


def _calibrate(w: ModelWeights, rng: np.random.Generator, enc_dim: int, seed: int) -> None:
    """Standardize per-tag logits on a probe vocabulary (in place).

    With untrained random weights, per-tag biases dominate per-word
    features and the decode collapses onto one or two tags — which
    would leave the downstream triple factory empty.  Standardizing
    each tag's logit to zero-mean/unit-variance over a deterministic
    probe vocabulary makes tags compete on z-scores, giving realistic
    label diversity.  This is a deterministic part of weight
    construction: the frozen oracle and the Spark engine see the exact
    same calibrated arrays, so parity is unaffected.
    """
    probes = _probe_words(rng)
    enc = HashedNgramEncoder(dim=enc_dim, seed=seed)
    emb = np.stack([enc._word_vec(p) for p in probes])          # [P, E]

    # Zipf prior over the frequency-ranked tag inventories (vocab.py is
    # frequency-sorted like the reference's vocabs): real POS/deprel
    # distributions are heavily skewed toward the head of the list.
    def zipf_prior(n: int, alpha: float) -> np.ndarray:
        prior = np.zeros(n, dtype=np.float32)
        ranks = np.arange(1, n - N_SPECIALS + 1, dtype=np.float32)
        prior[N_SPECIALS:] = alpha * -np.log(ranks)
        return prior

    # POS: standardize logits per tag
    h = _relu(emb @ w.pos_w1 + w.pos_b1)
    logits = h @ w.pos_w2 + w.pos_b2
    m, s = _standardize_cols(logits)
    w.pos_w2 /= s
    w.pos_b2 = ((w.pos_b2 - m) / s + zipf_prior(w.n_pos, 0.9)).astype(np.float32)

    # soft-POS distribution with calibrated head (specials masked)
    logits = (h @ w.pos_w2 + w.pos_b2) + special_mask(w.n_pos)
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    pos_dis = e / e.sum(axis=1, keepdims=True)

    # NER: standardize pre-ReLU emissions per tag, then bias 'O' up so
    # mentions are sparse-ish (realistic density)
    x = np.concatenate([emb, pos_dis @ w.upos_emb_ner], axis=1)
    y = x @ w.ner_w + w.ner_b
    m, s = _standardize_cols(y)
    w.ner_w /= s
    w.ner_b = ((w.ner_b - m) / s).astype(np.float32)
    w.ner_b[N_SPECIALS] += 3.5  # index of 'O': realistic mention density
                                # (~1/3 of tokens inside mentions)

    # DEP labels: standardize biaffine label scores per relation using
    # probe word pairs.  The bilinear core's constant-corner weight
    # u[-1, -1, r] contributes exactly 1x to every score, so it acts as
    # the per-label bias.
    xd = np.concatenate([emb, pos_dis @ w.upos_emb_dep], axis=1)
    hid = xd @ w.dep_w + w.dep_b
    h1 = _relu(hid @ w.rel.w1 + w.rel.b1)
    h2 = _relu(hid @ w.rel.w2 + w.rel.b2)
    ones = np.ones((h1.shape[0], 1), dtype=h1.dtype)
    h1 = np.concatenate([h1, ones], axis=1)
    h2 = np.concatenate([h2, ones], axis=1)
    idx = rng.permutation(len(probes))
    pair_scores = np.einsum("pk,kle,pl->pe", h1, w.rel.u, h2[idx], optimize=True)
    m, s = _standardize_cols(pair_scores)
    w.rel.u /= s
    w.rel.u[-1, -1, :] += (-(m / s) + zipf_prior(w.n_rel, 0.9)).astype(np.float32)


def special_mask(n: int) -> np.ndarray:
    """Additive mask that bans the [PAD, UNK, EMPTY, ROOT] ids at decode.

    The trained reference never emits these ids in practice; with seeded
    weights we enforce that invariant explicitly (engine design choice,
    applied identically in oracle and engine).
    """
    m = np.zeros(n, dtype=np.float32)
    m[:N_SPECIALS] = -1e9
    return m
