"""Host normalization (/root/reference/octofludb/domain_animal.py)."""

from __future__ import annotations

import re
from typing import Optional

HOST_RE = re.compile("swine|human", re.IGNORECASE)
_SEMI = re.compile(";.*")


def match_host(s: str) -> Optional[str]:
    """p_host full-match (domain_animal.py:20)."""
    m = HOST_RE.fullmatch(s)
    return m.group(0) if m else None


def clean_host(x: str) -> str:
    """domain_animal.py:5-17: synonym folding to swine/human."""
    x = _SEMI.sub("", x.strip().lower())
    if "scrofa" in x or "pig" in x or "porcine" in x or "boar" in x:
        return "swine"
    if "sapiens" in x:
        return "human"
    return x
