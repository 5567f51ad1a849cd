"""Identifier parsers: strain names, barcodes, GenBank/EPI ids, clades.

Semantics of /root/reference/octofludb/domain_identifier.py (full-match,
parse_strict).
"""

from __future__ import annotations

import re
from typing import Optional

A0_RE = re.compile(r"A0\d{7}")
TOSU_RE = re.compile(r"\d+TOSU\d+")
BARCODE_RE = re.compile(r"A0\d{7}|\d+TOSU\d+")  # classifier_flucrew.py:61
EPI_ISOLATE_RE = re.compile(r"EPI_ISL_\d+")
GB_RE = re.compile(r"[A-Z][A-Z]?\d{5,7}")
EPI_ID_RE = re.compile(r"EPI_?\d\d\d+")
GLOBAL_CLADE_RE = re.compile(
    r"\d[ABC]([._-]\d+){1,4}([_-]?like)?([_-]?vaccine)?"
    r"|Other-[A-Za-z]*[0-9.a-zA-Z-]*"
    r"|3\.[12][09]\d0\.[0-9.a-zA-Z-]+"
    r"|humanVaccine|Outgroup"
)  # domain_identifier.py:29-34

_STRAIN_NO_PAREN = re.compile(r"[ABCD]/[^/()\[\]]+/.+")
_STRAIN_PAREN = re.compile(r"\([ABCD]/[^/()\[\]]+/.+\)")
_WRAP_PAREN = re.compile(r"^\((.*)\)$")
_TERM_PAREN = re.compile(r"_*\(.*\)_*$")
_TERM_BRACKET = re.compile(r"_*\[.*\]_*$")


def clean_strain(x: str) -> str:
    """domain_identifier.py:9-17: strip wrapping parens, terminal
    parens/brackets, spaces->underscores."""
    x = x.strip().replace(" ", "_")
    x = _WRAP_PAREN.sub(r"\1", x)
    x = _TERM_PAREN.sub("", x)
    x = _TERM_BRACKET.sub("", x)
    return x


def match_strain(s: str) -> Optional[str]:
    """p_strain = paren ^ no_paren, parsecmap(clean_strain)
    (domain_identifier.py:20-22)."""
    if _STRAIN_PAREN.fullmatch(s) or _STRAIN_NO_PAREN.fullmatch(s):
        return clean_strain(s)
    return None


def _fm(pat: re.Pattern, s: str) -> Optional[str]:
    m = pat.fullmatch(s)
    return m.group(0) if m else None


def match_a0(s: str) -> Optional[str]:
    return _fm(A0_RE, s)


def match_barcode(s: str) -> Optional[str]:
    """p_tosu ^ p_A0 (classifier_flucrew.py:231)"""
    return _fm(TOSU_RE, s) or _fm(A0_RE, s)


def match_epi_isolate(s: str) -> Optional[str]:
    return _fm(EPI_ISOLATE_RE, s)


def match_genbank(s: str) -> Optional[str]:
    return _fm(GB_RE, s)


def match_epi_id(s: str) -> Optional[str]:
    return _fm(EPI_ID_RE, s)


def match_global_clade(s: str) -> Optional[str]:
    return _fm(GLOBAL_CLADE_RE, s)
