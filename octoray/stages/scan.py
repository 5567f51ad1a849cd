"""Mention detection + triple emission over free text.

The north star's "batched mention detection and entity-link scoring
against a broadcast flu-entity dictionary": a callable CLASS for
``map_batches(MentionEmitter, concurrency=N)`` — the combined scan
regex, geo vocabulary alternation, and edit-1 spell dictionaries are
compiled ONCE per actor in ``__init__`` (reference analogue: octoFLU's
loaded-once reference index, script.py:175-277 / SURVEY §2.9 X1-X3).

Per page: find candidate spans (strain grammar first, then ids/dates/
subtypes, then vocabulary terms), mask as we go so a barcode inside a
strain name is not double-counted, Datum-cast each span with the
recognizer registry (classes.py:85-92), then run the reference's
Phrase.connect emission (emit.py) — a 1->N fan-out with no shuffle.

Output: triple batches (subject, predicate, object, object_datatype)
plus ``src`` (page url) for lineage; dedup happens downstream in the
canonicalization shuffle (stages/canon.py).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

import pyarrow as pa

from octoray import emit, recognize as R
from octoray.functions import geography
from octoray.sources.webtext import COUNTRIES, STATES

TRIPLE_SRC_SCHEMA = pa.schema(
    [
        ("subject", pa.string()),
        ("predicate", pa.string()),
        ("object", pa.string()),
        ("object_datatype", pa.string()),
        ("src", pa.string()),
    ]
)

_MONTH_NAMES = (
    "January|February|March|April|May|June|July|August|September|October|"
    "November|December"
)
_MONTH_ABBR = "Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec"


def _build_scan_regex() -> re.Pattern:
    """One combined alternation; longest/most-specific first."""
    strain = r"\(?[ABCD]/[A-Za-z0-9_.'-]+(?:/[A-Za-z0-9_.'-]+)+\)?"
    epi_isl = r"EPI_ISL_\d+"
    epi_id = r"EPI_?\d{3,}"
    barcode = r"A0\d{7}|\d+TOSU\d+"
    genbank = r"[A-Z][A-Z]?\d{5,7}"
    date = "|".join(
        [
            rf"(?:{_MONTH_NAMES})\s+\d{{1,2}},\s*\d{{4}}",  # May 31, 2018
            rf"\d{{1,2}}-(?:{_MONTH_ABBR})-\d{{4}}",  # 05-Jun-2011
            r"\d{4}-\d{2}-\d{2}",  # 2011-05-31
            r"\d{2}/\d{2}/\d{4}",  # 05/31/2011
            r"\d{4}/\d{2}",  # 2011/05
        ]
    )
    subtype = r"(?:A/)?H\d+(?:hu|sw|av)?N\d+v?|[Mm][Ii][Xx][Ee][Dd]"
    # NB: trailing [0-9a-zA-Z] anchor keeps a sentence period out of the span
    clade = r"\d[ABC](?:[._-]\d+){1,4}(?:[_-]?like)?(?:[_-]?vaccine)?|3\.[12][09]\d0\.[0-9.a-zA-Z-]*[0-9a-zA-Z]"
    pattern = "|".join(
        f"(?P<{name}>{pat})"
        for name, pat in [
            ("strain", strain),
            ("epi_isl", epi_isl),
            ("barcode", barcode),
            ("epi_id", epi_id),
            ("date", date),
            ("clade", clade),
            ("subtype", subtype),
            ("genbank", genbank),
        ]
    )
    return re.compile(r"(?<![A-Za-z0-9_/.-])(?:" + pattern + r")(?![A-Za-z0-9_])")


def _build_vocab_regex() -> re.Pattern:
    """Host + geographic names, longest first, word-bounded."""
    terms = sorted(set(STATES) | set(COUNTRIES), key=len, reverse=True)
    geo = "|".join(re.escape(t) for t in terms)
    return re.compile(rf"\b(?P<host>swine|human)\b|\b(?P<geo>{geo})\b")


def _build_combined_regex() -> re.Pattern:
    """Scan + vocabulary fused into ONE alternation (one text traversal
    instead of two plus an overlap check — page_mentions profiled ~45%
    of the emitter floor, half of it the second pass).

    Equivalence to the two-pass scan-then-mask form relies on finditer
    resuming AFTER each match: a vocabulary word inside a scan span
    (e.g. the state in ``A/Iowa/01/2018``) is consumed by the earlier-
    starting, higher-priority scan branch, which is exactly the
    masking rule.  The one shape that could diverge — a scan match
    *starting inside* a multi-word vocabulary span — is impossible
    here: every scan branch begins with a digit, ``[ABCD]/``, ``EPI``,
    ``A0``, ``H<digit>``, an uppercase accession pair, or a month name,
    and no vocabulary term's non-initial word starts one (pinned by
    test_scan_fused_equals_two_pass on the corpus + adversarial text).
    Per-branch boundary assertions are kept verbatim.
    """
    scan = _build_scan_regex().pattern
    vocab = _build_vocab_regex().pattern
    return re.compile(f"(?:{scan})|(?:{vocab})")


class MentionEmitter:
    """Actor-pool stage: pages (url, text) -> triples (+src)."""

    def __init__(self):
        self.scan = _build_scan_regex()
        self.vocab = _build_vocab_regex()
        self.combined = _build_combined_regex()
        self._vocab_groups = frozenset(("host", "geo"))
        # force the edit-1 dictionaries to build now, once per actor
        geography.state_to_code("iowa")
        geography.country_to_code("canada")
        # span -> Mention memo (per actor).  cast_datum runs the full
        # classifier cascade per span; vocabulary terms, subtypes,
        # clades and dates repeat across a corpus, so caching the cast
        # (and the Mention's memoized URI with it) removes most of the
        # per-page recognizer cost (profiled ~35% of emit_page).
        # Sharing one Mention object for equal spans is semantics-
        # preserving: relate()'s only identity check (`other is self`
        # in _relate_strain) is subsumed by its clean-equality guard,
        # and mentions are read-only after construction.
        self._mcache: dict = {}

    def page_mentions(self, text: str) -> List[str]:
        """Candidate field strings, scan spans (in text order) then
        unmasked vocabulary spans (in text order) — one fused pass."""
        spans: List[str] = []
        vocab_spans: List[str] = []
        is_vocab = self._vocab_groups.__contains__
        for m in self.combined.finditer(text):
            if is_vocab(m.lastgroup):
                vocab_spans.append(m.group(0))
            else:
                spans.append(m.group(0))
        spans.extend(vocab_spans)
        return spans

    def page_mentions_two_pass(self, text: str) -> List[str]:
        """Reference form of page_mentions: separate scan + vocab passes
        with explicit overlap masking.  Kept as the equivalence oracle
        for the fused single-pass regex (see _build_combined_regex)."""
        spans: List[str] = []
        consumed: List[Tuple[int, int]] = []
        for m in self.scan.finditer(text):
            spans.append(m.group(0))
            consumed.append(m.span())

        def free(i: int, j: int) -> bool:
            return all(j <= a or i >= b for a, b in consumed)

        for m in self.vocab.finditer(text):
            if free(*m.span()):
                spans.append(m.group(0))
        return spans

    def emit_page(self, url: str, text: str) -> List[emit.Triple]:
        spans = self.page_mentions(text)
        if not spans:
            return []
        cache = self._mcache
        mentions = []
        for s in spans:
            m = cache.get(s)
            if m is None:
                if len(cache) > 200_000:  # bound actor memory
                    cache.clear()
                m = emit.make_mention(R.cast_datum(s), s)
                cache[s] = m
            mentions.append(m)
        return list(emit.connect(mentions, levels=None))

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        s: List[str] = []
        p: List[str] = []
        o: List[str] = []
        dt: List[str] = []
        src: List[str] = []
        for url, text in zip(urls, texts):
            if not text:  # null/empty page — nothing to scan
                continue
            triples = self.emit_page(url, text)
            for t in triples:
                s.append(t[0])
                p.append(t[1])
                o.append(t[2])
                dt.append(t[3])
                src.append(url)
        return pa.table(
            {
                "subject": pa.array(s, pa.string()),
                "predicate": pa.array(p, pa.string()),
                "object": pa.array(o, pa.string()),
                "object_datatype": pa.array(dt, pa.string()),
                "src": pa.array(src, pa.string()),
            }
        )
