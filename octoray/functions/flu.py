"""Influenza domain vocabulary: segments, subtypes, clade wordsets.

Semantics of /root/reference/octofludb/domain_flu.py.  All parsers are
full-match (parse_strict, token.py:114-117); wordsets match the
longest term first (parser.py:6-31) and compare after
lower/underscore folding.
"""

from __future__ import annotations

import re
from typing import Iterable, Optional

# the 8 segments of the flu genome — order matters (domain_flu.py:9)
SEGMENT = ["PB2", "PB1", "PA", "HA", "NP", "NA", "M", "NS"]

_HA_RE = re.compile(r"H\d+|pdmH\d+")
_NA_RE = re.compile(r"N\d+|N\d+pdm")
_NS_RE = re.compile(r"NS1?")
_M_RE = re.compile(r"M[P1]?")
_IG_CORE = re.compile(r"PB2|PB1|PA|NP")
_CONSTELLATION_RE = re.compile(r"[A-Z-]{6}|MIXED|mixed")
_SEGNUM_RE = re.compile(r"[1-8]")
_SUBTYPE_RE = re.compile(r"(A */ *)?(H\d+)(hu|sw|av)?(N\d+)(v)?")
_MIXED_RE = re.compile("mixed", re.IGNORECASE)


def _fullmatch(pat: re.Pattern, s: str) -> Optional[str]:
    m = pat.fullmatch(s)
    return m.group(0) if m else None


def match_ha(s: str) -> Optional[str]:
    """p_HA (domain_flu.py:11)"""
    return _fullmatch(_HA_RE, s)


def match_na(s: str) -> Optional[str]:
    """p_NA (domain_flu.py:12)"""
    return _fullmatch(_NA_RE, s)


def match_internal_gene(s: str) -> Optional[str]:
    """p_internal_gene (domain_flu.py:14-16): NS1->NS, M/MP/M1->M."""
    if _IG_CORE.fullmatch(s):
        return s
    if _NS_RE.fullmatch(s):
        return "NS"
    if _M_RE.fullmatch(s):
        return "M"
    return None


def match_segment(s: str) -> Optional[str]:
    """p_segment (domain_flu.py:18)"""
    r = match_internal_gene(s)
    if r is not None:
        return r
    if s in ("HA", "NA"):
        return s
    return None


def match_segment_subtype(s: str) -> Optional[str]:
    """p_segment_subtype (domain_flu.py:21)"""
    return match_segment(s) or match_ha(s) or match_na(s)


def match_segment_number(s: str) -> Optional[str]:
    """p_segment_number (domain_flu.py:20)"""
    return _fullmatch(_SEGNUM_RE, s)


def match_constellation(s: str) -> Optional[str]:
    """p_constellation (domain_flu.py:19)"""
    return _fullmatch(_CONSTELLATION_RE, s)


def match_subtype(s: str) -> Optional[str]:
    """p_subtype = mixed ^ unmixed (domain_flu.py:24-35).
    Unmixed normalizes 'A/H1N1' -> 'H1N1' (strips the 'A/' prefix,
    keeps hu/sw/av host infix and trailing 'v')."""
    if _MIXED_RE.fullmatch(s):
        return "mixed"
    m = _SUBTYPE_RE.fullmatch(s)
    if m:
        return m.group(2) + (m.group(3) or "") + m.group(4) + (m.group(5) or "")
    return None


class WordSet:
    """Length-bucketed exact-membership matcher (parser.py:6-31):
    fold with lower/underscore, try longest lengths first, and the
    whole input must be one term (strict)."""

    def __init__(self, words: Iterable[str], fold=lambda x: x.lower().replace(" ", "_")):
        self.fold = fold
        self.terms = {fold(w) for w in words}

    def match(self, s: str) -> Optional[str]:
        # strict full-input membership; returns the ORIGINAL text like
        # the reference (wordsetParser returns the input slice)
        if self.fold(s) in self.terms:
            return s
        return None


H1_CLADES = WordSet(
    [
        "alpha", "beta", "delta1", "delta1a", "delta1b", "delta2",
        "gamma", "gamma2", "gamma2-beta-like", "gamma2_beta_like",
        "pandemic", "pdm", "pdmH1", "human-delta", "huVac", "predelta",
    ]
)  # domain_flu.py:45-65
H3_CLADES = WordSet(
    [
        "2010.1", "2010.2", "Cluster_I", "Cluster_II", "Cluster_III",
        "Cluster_IV", "Cluster_IVA", "Cluster_IVB", "Cluster_IVC",
        "Cluster_IVD", "Cluster_IVE", "Cluster_IVF", "I", "II", "III",
        "IV", "IV-A", "IV-B", "IV-C", "IV-D", "IV-E", "IV-F", "huVac",
        "human-like_2010.1", "human-like_2010.2", "human-like_2016",
    ]
)  # domain_flu.py:66-96
N1_CLADES = WordSet(
    ["Human_seasonal", "huVac", "Classical", "Pandemic", "MN99"]
)  # domain_flu.py:97-99
N2_CLADES = WordSet(
    [
        "Human_N2", "2016", "Human-like", "1998", "1998A", "98A", "98A1",
        "98A_1", "98A2", "98A_2", "1998B", "98B", "98B1", "98B_1",
        "98B2", "98B_2", "2002", "2002A", "02A1", "02A2", "2002B",
        "02B1", "02B2", "TX98",
    ]
)  # domain_flu.py:100-128
INTERNAL_GENE_CLADES = WordSet(["PDM", "TRIG", "LAIV"])  # domain_flu.py:130-132


def match_h1_clade(s: str) -> Optional[str]:
    return H1_CLADES.match(s)


def match_h3_clade(s: str) -> Optional[str]:
    return H3_CLADES.match(s)


def match_us_clade(s: str) -> Optional[str]:
    """p_h1_clade ^ p_h3_clade (classifier_flucrew.py:512-514)"""
    return H1_CLADES.match(s) or H3_CLADES.match(s)


def match_n1_clade(s: str) -> Optional[str]:
    return N1_CLADES.match(s)


def match_n2_clade(s: str) -> Optional[str]:
    return N2_CLADES.match(s)


def match_internal_gene_clade(s: str) -> Optional[str]:
    """domain_flu.py:130-132 — match then uppercase."""
    r = INTERNAL_GENE_CLADES.match(s)
    return r.upper() if r is not None else None


def clean_subtype(s: str) -> str:
    """_clean_subtype (recipes.py:279-288): extract H#/N# from noise."""
    try:
        m = re.search(r".*(H\d+).*(N\d+).*", s.upper().strip())
        if m is None:
            return ""
        return m.group(1) + m.group(2)
    except (TypeError, AttributeError):
        return ""
