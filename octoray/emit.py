"""Phrase -> triples emission: the per-record "join within a row".

Re-expresses Phrase.connect and the Token relate/add_triples rules
(/root/reference/octofludb/classes.py:368-396 and
classifier_flucrew.py:182-499) over lightweight Mention records.  All
joins here are *within one record*, so in Ray this is a pure
``map_batches``/``flat_map`` fan-out — no shuffle (SURVEY.md §2.4).

A Mention is a classified cell/span: (classifier, dirty, match, clean,
field).  ``connect(mentions)`` returns the record's triple set as
(subject, predicate, object, object_datatype) tuples.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Iterable, List, Optional, Sequence, Set, Tuple

from octoray import recognize as R
from octoray.functions import dates, geography
from octoray.functions.flu import SEGMENT
from octoray.functions.identifiers import BARCODE_RE
from octoray.model import (
    DT_PLAIN,
    DT_URI,
    P,
    chksum,
    make_property,
    make_uri,
)

Triple = Tuple[str, str, str, str]

# STRAIN_FIELDS (classifier_flucrew.py:167-179): attribute fields that
# always attach to the strain node, never the segment node.
STRAIN_FIELDS = {
    "date",
    "submission_date",
    "collection_date",
    "country",
    "state",
    "host",
    "global_clade",
    "subtype",
    "barcode",
    "strain_name",
    "gisaid_strain_name",
}

# typenames behaving as strain attributes (classifier_flucrew.py:271-316)
_STRAIN_ATTRS = {"subtype", "constellation", "global_clade", "HA", "NA", "internal_gene"}
# typenames behaving as segment attributes (classifier_flucrew.py:383-415)
_SEGMENT_ATTRS = {"segment_name", "segment_subtype", "segment_number"}


@dataclass
class Mention:
    classifier: R.Classifier
    dirty: str
    match: Optional[str]
    clean: Optional[str]
    field: Optional[str] = None

    # typename/group are plain attributes, not properties: connect()'s
    # pair loops read them ~45x per page (profiled ~8% of the emitter
    # floor as property-descriptor calls), and they are immutable
    # copies of classifier fields.
    typename: str = dataclasses.field(init=False)
    group: Optional[str] = dataclasses.field(init=False)

    def __post_init__(self):
        self.typename = self.classifier.name
        self.group = self.classifier.group

    def choose_field(self) -> Optional[str]:
        """token.py:45-49"""
        return self.field if self.field else self.typename

    def as_uri(self) -> Optional[str]:
        """Token.as_uri variants.  Memoized per mention: relate() calls
        this O(k) times per record pair-loop (profiled 2x per mention
        on the scan path) and the mint is pure."""
        try:
            return self.__dict__["_uri_memo"]
        except KeyError:
            pass
        u = self._compute_uri()
        self.__dict__["_uri_memo"] = u
        return u

    def _compute_uri(self) -> Optional[str]:
        if self.group in (R.G_STRAIN, R.G_SEGMENT):
            return make_uri(self.clean)
        if self.group == R.G_SEQUENCE:
            return make_uri(chksum(self.clean))
        if self.classifier is R.COUNTRY:
            return geography.make_country_uri(self.dirty)
        if self.classifier is R.COUNTRY_OR_STATE and self.clean:
            return "world:" + self.clean
        return None

    def as_predicate(self) -> Optional[str]:
        try:
            return self.__dict__["_pred_memo"]
        except KeyError:
            pass
        f = self.choose_field()
        p = make_property(f) if f is not None else None
        self.__dict__["_pred_memo"] = p
        return p

    def as_object(self) -> Optional[Tuple[str, str]]:
        """(lexical, datatype) — Token.as_literal variants.  Memoized:
        pure in the mention, and relate() fan-out recomputes it once per
        page the span appears on (dates re-parse otherwise)."""
        try:
            return self.__dict__["_obj_memo"]
        except KeyError:
            pass
        o = self._compute_object()
        self.__dict__["_obj_memo"] = o
        return o

    def _compute_object(self) -> Optional[Tuple[str, str]]:
        c = self.classifier
        if c is R.DATE:
            r = dates.parse_any_date(self.dirty)
            return dates.date_literal(r) if r is not None else None
        if c is R.STRING:
            return (self.dirty, DT_PLAIN) if self.match else None
        if self.clean is None:
            return None
        return (self.clean, c.literal_dt)

    def object_of(self, uri: Optional[str]) -> Set[Triple]:
        """Token.object_of (token.py:67-74) + per-class overrides."""
        g: Set[Triple] = set()
        c = self.classifier
        if uri is None:
            return g
        if c is R.COUNTRY:
            # link even without a match, as long as dirty is non-empty
            # (classifier_flucrew.py:80-91)
            obj = self.as_uri()
            pred = self.as_predicate()
            if self.dirty and pred and obj:
                g.add((uri, pred, obj, DT_URI))
            return g
        if c is R.COUNTRY_OR_STATE:
            obj = self.as_uri()
            pred = self.as_predicate()
            if self.dirty and pred and obj:
                g.add((uri, pred, obj, DT_URI))
            return g
        if c is R.STATE_USA:
            # (uri, P.state, usa:XX) (classifier_flucrew.py:137-144)
            if self.match and self.clean:
                g.add((uri, P.state, "usa:" + self.clean, DT_URI))
            return g
        if self.typename == "segment_number":
            # two triples: number + looked-up name
            # (classifier_flucrew.py:410-415)
            if self.match and self.clean is not None:
                g.add((uri, P.segment_number, self.clean, DT_PLAIN))
                g.add((uri, P.segment_name, SEGMENT[int(self.clean) - 1], DT_PLAIN))
            return g
        if self.typename == "dnaseq":
            # Dnaseq.object_of (classifier_flucrew.py:451-456)
            if self.match:
                g.add((uri, P.chksum, chksum(self.clean), DT_PLAIN))
                g.add((uri, P.dnaseq, self.clean, DT_PLAIN))
            return g
        if self.match:
            pred = self.as_predicate()
            obj = self.as_object()
            if pred and obj:
                g.add((uri, pred, obj[0], obj[1]))
        return g

    # --- add_triples (self-description) --------------------------------
    def add_triples(self) -> Set[Triple]:
        """Memoized: a pure function of the mention, but connect()
        calls it once per PAGE the span appears on — the strain branch
        re-runs the per-element barcode/state scan each time otherwise
        (52% of the emitter floor was this fan-out family, VERDICT r2
        next-step 8).  Callers only union the result, never mutate."""
        try:
            return self.__dict__["_add_memo"]
        except KeyError:
            pass
        g = self._compute_add_triples()
        self.__dict__["_add_memo"] = g
        return g

    def _compute_add_triples(self) -> Set[Triple]:
        g: Set[Triple] = set()
        c = self.classifier
        if not self.clean:
            return g
        uri = self.as_uri()
        if c is R.BARCODE and uri:
            g.add((uri, P.barcode, self.clean, DT_PLAIN))
        elif c is R.STRAIN and uri:
            # Strain.add_triples (classifier_flucrew.py:250-267):
            # name triple + embedded barcode / US-state side-emission
            g.add((uri, P.strain_name, self.clean, DT_PLAIN))
            for el in self.clean.split("/"):
                bm = BARCODE_RE.fullmatch(el)
                state_str = geography.state_to_code(el)
                if bm is not None:
                    g.add((uri, P.barcode, bm.group(0), DT_PLAIN))
                elif state_str is not None:
                    g.add((uri, P.state, "usa:" + state_str, DT_URI))
        elif c is R.GENBANK and uri:
            g.add((uri, P.gb, self.clean, DT_PLAIN))
        elif c is R.EPI_SEQID and uri:
            g.add((uri, P.epi_id, self.clean, DT_PLAIN))
        return g

    # --- relate (cross-token links within the record) -------------------
    def relate(self, tokens: Sequence["Mention"], levels: Optional[Set[str]]) -> Set[Triple]:
        if self.group == R.G_STRAIN:
            return self._relate_strain(tokens, levels)
        if self.group == R.G_SEGMENT:
            return self._relate_segment(tokens)
        if self.typename == "dnaseq":
            return self._relate_dnaseq(tokens)
        if self.typename == "proseq":
            return self._relate_proseq(tokens)
        if self.typename in _STRAIN_ATTRS:
            return self._relate_strain_attr(tokens)
        if self.typename in _SEGMENT_ATTRS:
            return self._relate_segment_attr(tokens)
        return set()

    def _has_segment(self, tokens: Sequence["Mention"], with_dnaseq: bool) -> bool:
        for t in tokens:
            if t.group == R.G_SEGMENT or (with_dnaseq and t.typename == "dnaseq"):
                return True
        return False

    def _relate_strain(self, tokens, levels) -> Set[Triple]:
        """StrainToken.relate (classifier_flucrew.py:197-218)."""
        g: Set[Triple] = set()
        if self.clean is None or not self.match:
            return g
        uri = self.as_uri()
        has_segment = self._has_segment(tokens, with_dnaseq=True)
        use_segment = (levels is None and has_segment) or (
            levels is not None and "segment" in levels and has_segment
        )
        if self.typename is not None and uri:
            obj = self.as_object()
            if obj:
                g.add((uri, make_property(self.typename), obj[0], obj[1]))
        for other in tokens:
            if other is self:
                continue
            if not other.match or other.clean == self.clean or other.clean is None:
                continue
            if other.group == R.G_SEGMENT:
                o_uri = other.as_uri()
                if uri and o_uri:
                    g.add((uri, P.has_segment, o_uri, DT_URI))
            elif other.choose_field() in STRAIN_FIELDS:
                g.update(other.object_of(uri))
            elif not use_segment:
                g.update(other.object_of(uri))
        return g

    def _relate_strain_attr(self, tokens) -> Set[Triple]:
        """StrainAttribute.relate (classifier_flucrew.py:271-281)."""
        g: Set[Triple] = set()
        for other in tokens:
            if other.group == R.G_STRAIN and other.typename != self.typename:
                o_uri = other.as_uri()
                if o_uri is not None:
                    g.update(self.object_of(o_uri))
        return g

    def _relate_segment(self, tokens) -> Set[Triple]:
        """SegmentToken.relate (classifier_flucrew.py:327-348)."""
        g: Set[Triple] = set()
        if not self.match:
            return g
        uri = self.as_uri()
        for other in tokens:
            if other.clean is None:
                continue
            if other.match and other.group == R.G_SEGMENT and other.typename != self.typename:
                o_uri = other.as_uri()
                if uri and o_uri:
                    g.add((uri, P.sameAs, o_uri, DT_URI))
            elif other.choose_field() not in STRAIN_FIELDS and other.typename is not None:
                if uri is not None:
                    g.update(other.object_of(uri))
        return g

    def _relate_segment_attr(self, tokens) -> Set[Triple]:
        """SegmentAttribute.relate (classifier_flucrew.py:383-393)."""
        g: Set[Triple] = set()
        for other in tokens:
            if other.group == R.G_SEGMENT:
                o_uri = other.as_uri()
                if o_uri is not None:
                    g.update(self.object_of(o_uri))
        return g

    def _relate_dnaseq(self, tokens) -> Set[Triple]:
        """Dnaseq.relate (classifier_flucrew.py:458-474)."""
        g: Set[Triple] = set()
        uri = self.as_uri()
        has_segment = self._has_segment(tokens, with_dnaseq=False)
        for other in tokens:
            if other.clean is None:
                continue
            if other.group == R.G_STRAIN:
                o_uri = other.as_uri()
                if o_uri and uri:
                    g.add((o_uri, P.has_segment, uri, DT_URI))
            elif not has_segment and other.typename not in STRAIN_FIELDS and uri is not None:
                g.update(other.object_of(uri))
        return g

    def _relate_proseq(self, tokens) -> Set[Triple]:
        """Proseq.relate (classifier_flucrew.py:481-499)."""
        g: Set[Triple] = set()
        uri = self.as_uri()
        if uri and self.clean is not None:
            g.add((uri, P.proseq, self.clean, DT_PLAIN))
        has_segment = self._has_segment(tokens, with_dnaseq=False)
        for other in tokens:
            if other.clean is None:
                continue
            if other.group == R.G_SEGMENT:
                o_uri = other.as_uri()
                if o_uri and uri:
                    g.add((o_uri, P.has_feature, uri, DT_URI))
            elif other.group == R.G_STRAIN:
                pass  # reference only warns here (classifier_flucrew.py:494-495)
            elif other.choose_field() not in STRAIN_FIELDS and not has_segment:
                if uri is not None:
                    g.update(other.object_of(uri))
        return g


def make_mention(
    classifier: R.Classifier, text: Optional[str], field: Optional[str] = None,
    na_str: Sequence[str] = (),
) -> Mention:
    """Token.__init__ (token.py:21-31)."""
    if text is None or text in na_str:
        match = None
        dirty = na_str[0] if (text is None and na_str) else (text or "")
    else:
        match = classifier.test_one(text)
        dirty = text
    clean = classifier.munge(match) if match is not None else None
    return Mention(classifier=classifier, dirty=dirty, match=match, clean=clean, field=field)


def connect(
    mentions: Sequence[Mention],
    levels: Optional[Set[str]] = None,
    taguri: Optional[str] = None,
) -> Set[Triple]:
    """Phrase.connect (classes.py:368-396)."""
    g: Set[Triple] = set()
    for t in mentions:
        if t.clean is None:
            continue
        if levels is None or (t.group in levels):
            g.update(t.relate(mentions, levels))
        g.update(t.add_triples())
        if taguri and t.group:
            turi = t.as_uri()
            if turi:
                g.add((turi, P.tag, taguri, DT_URI))
    return g


def tag_triples(tag: str, timestamp: str, filename: Optional[str] = None) -> Set[Triple]:
    """addTag (classes.py:104-123) with an *injected* timestamp for
    reproducibility (SURVEY.md §2.10 bans datetime.now())."""
    from octoray.model import make_tag_uri

    taguri = make_tag_uri(tag)
    g: Set[Triple] = {
        (taguri, P.name, tag, DT_PLAIN),
        (taguri, P.time, timestamp, DT_PLAIN),
    }
    if filename:
        g.add((taguri, P.file, filename, DT_PLAIN))
    return g
