"""Tag vocabularies with the reference's id layout.

The reference reserves ids 0..3 for [PAD, UNK, EMPTY, ROOT] and then
appends task tags (reference: phonlp/models/common/vocab.py:5-13,
phonlp/models/ner/vocab.py:10-15).  Tag inventories below are the public
VLSP-2013 POS tagset, VLSP-2016 NER types, and the VnDT dependency label
set, ordered by corpus frequency (frequency-sorted order is the
reference's vocab id order; harvested once from the public sample
corpora shapes and pinned here as constants so the engine has zero
runtime dependency on the reference checkout).
"""

from __future__ import annotations

PAD, UNK, EMPTY, ROOT = "<PAD>", "<UNK>", "<EMPTY>", "<ROOT>"
PAD_ID, UNK_ID, EMPTY_ID, ROOT_ID = 0, 1, 2, 3
SPECIALS = [PAD, UNK, EMPTY, ROOT]
N_SPECIALS = 4

# VLSP-2013 POS tags, frequency-sorted (most frequent first).
POS_TAGS = [
    "N", "V", "CH", "R", "E", "A", "P", "Np", "M", "Nc", "C", "L",
    "Cc", "T", "Nu", "X", "Ny", "I", "Nb", "Vb", "Y", "Z",
]

# VnDT dependency labels, frequency-sorted.
DEP_RELS = [
    "nmod", "punct", "vmod", "sub", "root", "adv", "det", "dob", "pob",
    "dep", "amod", "loc", "tmp", "conj", "coord", "prp", "prd", "mnr",
    "iob", "x", "dir", "tpc", "pmod", "voc", "ext", "xprd", "xadv", "cnc",
]

# VLSP-2016 entity types; the model predicts BIOES tags directly
# (training data is converted BIO->BIO2->BIOES up front, reference:
# phonlp/models/ner/utils.py:27-82).
NER_TYPES = ["PER", "LOC", "ORG", "MISC"]
NER_TAGS = ["O"] + [
    f"{p}-{t}" for t in NER_TYPES for p in ("B", "I", "E", "S")
]


class Vocab:
    """Bidirectional tag<->id map with the 4-special prefix.

    map(): unknown units fall back to UNK_ID (reference
    phonlp/models/common/vocab.py:55-69 semantics).
    """

    def __init__(self, units: list[str]):
        self.id2unit = SPECIALS + list(units)
        self.unit2id = {u: i for i, u in enumerate(self.id2unit)}

    def __len__(self) -> int:
        return len(self.id2unit)

    def map(self, units: list[str]) -> list[int]:
        get = self.unit2id.get
        return [get(u, UNK_ID) for u in units]

    def unmap(self, ids) -> list[str]:
        tab = self.id2unit
        return [tab[int(i)] for i in ids]


def default_vocabs() -> dict[str, Vocab]:
    return {
        "upos": Vocab(POS_TAGS),
        "ner_tag": Vocab(NER_TAGS),
        "deprel": Vocab(DEP_RELS),
    }
