"""BIO / BIO2 / BIOES tag-scheme utilities and mention decode.

Semantics contract (reference: phonlp/models/ner/utils.py): gold BIO is
normalized to BIO2 then BIOES for training; at decode time a BIOES tag
sequence becomes typed spans.  Quirks preserved on purpose:

- an ``I-`` right after ``O`` opens a new span (decode is lenient);
- a type switch mid-span keeps one span whose type is the LAST tag's
  type (e.g. ``B-PER I-LOC E-LOC`` -> one LOC span);
- tags that are neither ``O`` nor ``{B,I,E,S}-*`` are inert: they
  neither extend nor flush the open span.
"""

from __future__ import annotations


def is_bio(tags: list[str]) -> bool:
    return all(t == "O" or (len(t) > 2 and t[:2] in ("B-", "I-")) for t in tags)


def to_bio2(tags: list[str]) -> list[str]:
    out = []
    prev = "O"
    for t in tags:
        if t.startswith("I-") and (prev == "O" or prev[1:] != t[1:]):
            out.append("B" + t[1:])
        else:
            out.append(t)
        prev = t
    return out


def bio2_to_bioes(tags: list[str]) -> list[str]:
    out = []
    n = len(tags)
    for i, t in enumerate(tags):
        if t == "O":
            out.append(t)
            continue
        if len(t) < 2:
            raise ValueError(f"not a BIO2 tag: {t!r}")
        nxt_inside = i + 1 < n and tags[i + 1][:2] == "I-"
        if t[:2] == "I-":
            out.append(t if nxt_inside else "E-" + t[2:])
        elif t[:2] == "B-":
            out.append(t if nxt_inside else "S-" + t[2:])
        else:
            raise ValueError(f"not a BIO2 tag: {t!r}")
    return out


def spans_from_bioes(tags: list[str]) -> list[tuple[int, int, str]]:
    """BIOES tags -> [(start, end, type)] with INCLUSIVE 0-based indices."""
    spans: list[tuple[int, int, str]] = []
    open_idxs: list[int] = []
    cur_type: str | None = None

    def flush() -> None:
        if open_idxs:
            spans.append((open_idxs[0], open_idxs[-1], cur_type))

    for i, tag in enumerate(tags):
        tag = tag if tag is not None else "O"
        if tag == "O":
            flush()
            open_idxs = []
        elif tag.startswith("B-"):
            flush()
            open_idxs = [i]
            cur_type = tag[2:]
        elif tag.startswith("I-"):
            open_idxs.append(i)
            cur_type = tag[2:]
        elif tag.startswith("E-"):
            open_idxs.append(i)
            cur_type = tag[2:]
            flush()
            open_idxs = []
        elif tag.startswith("S-"):
            flush()
            open_idxs = [i]
            cur_type = tag[2:]
            flush()
            open_idxs = []
        # anything else (specials) is inert
    flush()
    return spans
