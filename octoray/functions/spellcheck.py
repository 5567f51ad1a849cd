"""Edit-distance-1 word finder (Norvig-style edits).

Semantics of the reference's spell corrector
(/root/reference/octofludb/spellcheck.py:7-51): pre-expand every
vocabulary word into all single edits (deletes, transposes, replaces,
inserts over a lowercase alphabet) and look the query up in that map.
Returns the *canonical cleaned word*, or None when nothing is within
one edit.  The expanded dictionary is built once per worker process
(module import / actor __init__) — never per batch.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def _default_clean(x: str) -> str:
    return x.strip().lower().replace(" ", "_")


def edits1(word: str, alphabet: str = _ALPHABET) -> set:
    """All strings one edit away from ``word`` (Norvig's construction,
    https://norvig.com/spell-correct.html — public domain technique)."""
    splits = [(word[:i], word[i:]) for i in range(len(word) + 1)]
    out = set()
    for left, right in splits:
        if right:
            out.add(left + right[1:])  # delete
        if len(right) > 1:
            out.add(left + right[1] + right[0] + right[2:])  # transpose
        for c in alphabet:
            if right:
                out.add(left + c + right[1:])  # replace
            out.add(left + c + right)  # insert
    return out


def make_wordfinder(
    words: Iterable[str],
    clean: Callable[[str], str] = _default_clean,
    alphabet: str = _ALPHABET,
) -> Callable[[str], Optional[str]]:
    """Build a closure mapping a (possibly misspelled) word to its
    canonical form, or None.  Exact hits win over edit-1 hits."""
    canon = {clean(w) for w in words}
    near = {}
    for w in sorted(canon):
        for e in edits1(w, alphabet):
            # first writer wins, matching the reference's dict-comp overwrite
            # order only when keys collide between words; collisions are rare
            # and resolved deterministically by sorted insertion.
            near.setdefault(e, w)

    def find(word: str) -> Optional[str]:
        cw = clean(word)
        if cw in canon:
            return cw
        return near.get(cw)

    return find
