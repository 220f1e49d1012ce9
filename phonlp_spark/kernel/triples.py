"""Mention -> (subj, pred, obj) triple extraction rules.

The reference stops at token-level annotations (6-column TSV,
phonlp/annotate_model.py:323-337); the KG pipeline's triple rules are
pinned here (SURVEY.md §2.11) over VnDT arc labels
(sample shapes: phonlp/sample_data/dep_train.conll):

- predicate-frame rule: for any head token P that governs BOTH a
  dependent with deprel 'sub' lying inside a mention (the subject) and
  a dependent with deprel in {'dob','pob','iob'} inside a mention (the
  object), emit (subj_text, P_surface, obj_text) with rule
  'sub-<objrel>'.  The 'sub'/'dob' labels already encode the
  predicate-argument structure, so no POS gate is applied.
- nmod rule: an arc dep--nmod-->head with BOTH endpoints inside
  (distinct) mentions emits (head_mention_text, 'nmod',
  dep_mention_text) with rule 'nmod'.

All indices are sentence-local; heads use the CoNLL convention
(0 = root, 1-based token ids).
"""

from __future__ import annotations

OBJ_RELS = ("dob", "pob", "iob")


def extract_triples(
    tokens: list[str],
    upos: list[str],
    heads: list[int],
    deprels: list[str],
    mentions: list[tuple[int, int, str]],
) -> list[tuple[str, str, str, str, str, str]]:
    """Returns [(subj, pred, obj, subj_type, obj_type, rule)]."""
    n = len(tokens)
    covering = [-1] * n  # token idx -> mention idx (first mention wins)
    for mi, (s, e, _t) in enumerate(mentions):
        for k in range(s, min(e, n - 1) + 1):
            if covering[k] < 0:
                covering[k] = mi

    def mtext(mi: int) -> str:
        s, e, _t = mentions[mi]
        return " ".join(tokens[s : e + 1])

    out: list[tuple[str, str, str, str, str, str]] = []

    # predicate-frame rule
    for v in range(n):
        subj_ms: list[int] = []
        obj_ms: list[tuple[int, str]] = []
        for d in range(n):
            if heads[d] != v + 1:
                continue
            mi = covering[d]
            if mi < 0:
                continue
            if deprels[d] == "sub":
                if mi not in subj_ms:
                    subj_ms.append(mi)
            elif deprels[d] in OBJ_RELS:
                if all(mi != o for o, _ in obj_ms):
                    obj_ms.append((mi, deprels[d]))
        for smi in subj_ms:
            for omi, orel in obj_ms:
                if smi == omi:
                    continue
                out.append((
                    mtext(smi), tokens[v], mtext(omi),
                    mentions[smi][2], mentions[omi][2], f"sub-{orel}",
                ))

    # nmod rule
    for d in range(n):
        if deprels[d] != "nmod":
            continue
        h = heads[d] - 1
        if h < 0 or h >= n:
            continue
        dmi, hmi = covering[d], covering[h]
        if dmi < 0 or hmi < 0 or dmi == hmi:
            continue
        out.append((
            mtext(hmi), "nmod", mtext(dmi),
            mentions[hmi][2], mentions[dmi][2], "nmod",
        ))

    return out
