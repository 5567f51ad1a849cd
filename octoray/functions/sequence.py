"""Biological sequence alphabets (/root/reference/octofludb/domain_sequence.py)."""

from __future__ import annotations

import re
from typing import Optional

DNASEQ_RE = re.compile(r"[ATGC_RYSWKMBDHVN-]+", re.IGNORECASE)
PROSEQ_RE = re.compile(r"[ACDEFGHIKL_MNPQRSTVWX*Y-]+", re.IGNORECASE)
_NON_SEQ = re.compile(r"[^A-Z*]")


def match_dnaseq(s: str) -> Optional[str]:
    m = DNASEQ_RE.fullmatch(s)
    return m.group(0) if m else None


def match_proseq(s: str) -> Optional[str]:
    m = PROSEQ_RE.fullmatch(s)
    return m.group(0) if m else None


def munge_seq(s: str) -> str:
    """SequenceToken.munge (classifier_flucrew.py:421-422):
    uppercase then strip everything outside ``[A-Z*]``."""
    return _NON_SEQ.sub("", s.upper())
