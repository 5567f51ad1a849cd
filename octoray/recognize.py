"""Token classifiers: the ~25 recognizers, registry, and column voting.

Re-expresses the reference's classifier layer
(/root/reference/octofludb/classifier_flucrew.py:532-564 allClassifiers
plus token.py primitives) as a data-driven registry of (match, munge)
pairs suitable for vectorized evaluation inside ``map_batches``:

  - ``test_one``   parse_strict semantics: whole-string match -> the
                   parser output (or None)
  - ``munge``      normalization applied to the match
  - ``full_regex`` optional RE2-safe pattern for vectorized goodness
                   via pyarrow.compute (classifiers whose semantics are
                   a pure regex); dict/spell-correction classifiers
                   fall back to a per-value loop over the (deduped)
                   column sample.

Column-type voting (HomoList.cast, classes.py:131-138 + goodness,
token.py:121-131): first classifier in registry order with
match-fraction > 0.8 over non-NA cells wins; sequence classifiers vote
over ALL rows and additionally require len > 20
(classifier_flucrew.py:433-444).  In Ray this is the two-pass
"partial counts -> argmax -> broadcast" pattern (SURVEY.md §1.4).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from octoray.functions import animal, dates, flu, geography, identifiers, sequence
from octoray.model import DT_BOOL, DT_DOUBLE, DT_INT, DT_PLAIN

# group labels (token.py / classifier_flucrew.py class attributes)
G_STRAIN = "strain"
G_SEGMENT = "segment"
G_SEQUENCE = "sequence"


def _identity(x: str) -> str:
    return x


def _upper(x: str) -> str:
    return x.upper()


@dataclass(frozen=True)
class Classifier:
    name: str  # the reference's `typename`
    test_one: Callable[[str], Optional[str]]
    munge: Callable[[str], str] = _identity
    group: Optional[str] = None
    full_regex: Optional[str] = None  # RE2-safe vectorizable fullmatch
    is_sequence: bool = False  # sequence-style goodness denominator
    literal_dt: str = DT_PLAIN  # datatype of plain literal renderings

    def clean(self, s: Optional[str]) -> Optional[str]:
        """match + munge in one step (Token.__init__, token.py:24-31)."""
        if s is None:
            return None
        m = self.test_one(s)
        return self.munge(m) if m is not None else None

    def goodness(self, items: Sequence[Optional[str]], na_str: Sequence[str] = ()) -> float:
        """token.py:121-131 / classifier_flucrew.py:433-444."""
        if self.is_sequence:
            n = len(items)
            if n == 0:
                return 0.0
            hits = sum(
                1
                for x in items
                if x is not None
                and x not in na_str
                and len(str(x)) > 20
                and self.test_one(x)
            )
            return hits / n
        vals = [x for x in items if x is not None and x not in na_str]
        if not vals:
            return 0.0
        hits = sum(1 for x in vals if self.test_one(x) is not None)
        return hits / len(vals)


def _regex_classifier(name, pattern, munge=_identity, group=None, flags=0, literal_dt=DT_PLAIN):
    rx = re.compile(pattern, flags)

    def test(s: str) -> Optional[str]:
        m = rx.fullmatch(s)
        return m.group(0) if m else None

    return Classifier(
        name=name,
        test_one=test,
        munge=munge,
        group=group,
        full_regex=pattern,
        literal_dt=literal_dt,
    )


def _bool_munge(x: str) -> str:
    return "true" if x.lower() in ("1", "t", "true", "yes", "y") else "false"


def _date_test(s: str) -> Optional[str]:
    r = dates.parse_any_date(s)
    return dates.date_str(r) if r is not None else None


# --- the classifiers ----------------------------------------------------
INTEGER = _regex_classifier("integer", r"[1-9]\d*|0", literal_dt=DT_INT)
DOUBLE = _regex_classifier(
    "double", r"0\.\d+|[1-9]\d*\.\d+|[1-9]\d*|0", literal_dt=DT_DOUBLE
)
BOOLEAN = _regex_classifier(
    "float",  # sic — the reference's Boolean.typename is "float" (token.py:205)
    r"0|1|yes|no|true|false|y|n|t|f",
    munge=_bool_munge,
    flags=re.IGNORECASE,
    literal_dt=DT_BOOL,
)
ISOLATE = Classifier(
    "isolate_id", identifiers.match_epi_isolate, _upper, G_STRAIN, r"EPI_ISL_\d+"
)
GENBANK = Classifier(
    "genbank_id", identifiers.match_genbank, _upper, G_SEGMENT, r"[A-Z][A-Z]?\d{5,7}"
)
BARCODE = Classifier(
    "barcode", identifiers.match_barcode, _upper, G_STRAIN, r"\d+TOSU\d+|A0\d{7}"
)
CONSTELLATION = Classifier(
    "constellation", flu.match_constellation, full_regex=r"[A-Z-]{6}|MIXED|mixed"
)
COUNTRY = Classifier("country", geography.country_to_code, _identity)
COUNTRY_OR_STATE = Classifier("country", geography.location_to_country_code, _identity)
DATE = Classifier("date", _date_test, str)
EPI_SEQID = Classifier(
    "epi_id",
    identifiers.match_epi_id,
    lambda x: x.upper().replace("_", ""),
    G_SEGMENT,
    r"EPI_?\d\d\d+",
)
GLOBAL_CLADE = Classifier(
    "global_clade",
    identifiers.match_global_clade,
    full_regex=identifiers.GLOBAL_CLADE_RE.pattern,
)
SUBTYPE = Classifier("subtype", flu.match_subtype)
SEGMENT_NAME = Classifier("segment_name", flu.match_segment)
SEGMENT_SUBTYPE = Classifier("segment_subtype", flu.match_segment_subtype)
HOST = Classifier("host", animal.match_host, lambda x: x.lower(), full_regex="(?i)swine|human")
INTERNAL_GENE = Classifier("internal_gene", flu.match_internal_gene)
SEGMENT_NUMBER = Classifier("segment_number", flu.match_segment_number, full_regex=r"[1-8]")
STRAIN = Classifier(
    "strain_name",
    identifiers.match_strain,
    lambda x: x.replace(" ", "_"),
    G_STRAIN,
)
STATE_USA = Classifier("state", geography.state_to_code)
INTERNAL_GENE_CLADE = Classifier("internal_gene_clade", flu.match_internal_gene_clade)
H1_CLADE = Classifier("h1_clade", flu.match_h1_clade)
H3_CLADE = Classifier("h3_clade", flu.match_h3_clade)
US_CLADE = Classifier("us_clade", flu.match_us_clade)
N1_CLADE = Classifier("n1_clade", flu.match_n1_clade)
N2_CLADE = Classifier("n2_clade", flu.match_n2_clade)
DNASEQ = Classifier(
    "dnaseq", sequence.match_dnaseq, sequence.munge_seq, G_SEQUENCE, is_sequence=True
)
PROSEQ = Classifier(
    "proseq", sequence.match_proseq, sequence.munge_seq, G_SEQUENCE, is_sequence=True
)
UNKNOWN = Classifier("unknown", lambda s: s)
STRING = Classifier("string", lambda s: s)
MISSING = Classifier("missing", lambda s: None)  # token.py:134-140
# strain attributes outside the vote registry (classifier_flucrew.py:302-311),
# used by recipe readers with explicit column->classifier assignment
HA_ATTR = Classifier("HA", flu.match_ha, full_regex=r"H\d+|pdmH\d+")
NA_ATTR = Classifier("NA", flu.match_na, full_regex=r"N\d+|N\d+pdm")

# registry in the reference's priority order (classifier_flucrew.py:532-564)
ALL_CLASSIFIERS: List[Classifier] = [
    ISOLATE,
    GENBANK,
    BARCODE,
    CONSTELLATION,
    COUNTRY,
    DATE,
    EPI_SEQID,
    GLOBAL_CLADE,
    SUBTYPE,
    SEGMENT_NAME,
    SEGMENT_SUBTYPE,
    HOST,
    INTERNAL_GENE,
    SEGMENT_NUMBER,
    STRAIN,
    STATE_USA,
    INTERNAL_GENE_CLADE,
    H1_CLADE,
    H3_CLADE,
    US_CLADE,
    N1_CLADE,
    N2_CLADE,
    DNASEQ,
    PROSEQ,
    UNKNOWN,
]

# --- §2.11 forced-role classifiers (recipes.py:510-573) -----------------
# Match ANYTHING and force a role — the ingestion mode real users hit
# whenever headers are absent / identifiers are idiosyncratic.
def _any(s: str) -> Optional[str]:
    return s if s else None


IRREGULAR_STRAIN = Classifier(
    # IrregularStrain (recipes.py:510-519): typename "strain_id",
    # parser '.+', StrainToken munge (spaces -> underscores)
    "strain_id", _any, lambda x: x.replace(" ", "_"), G_STRAIN
)
IRREGULAR_SEGMENT = Classifier(
    # IrregularSegment (recipes.py:545-555): typename None — the token
    # mints a segment URI and receives object_of links, but emits no
    # predicate of its own (Token.as_predicate returns None)
    None, _any, _identity, G_SEGMENT
)


def select_classifiers(include: Sequence[str] = (),
                       exclude: Sequence[str] = ()) -> List[Classifier]:
    """The CLI ``--include``/``--exclude`` registry amendment
    (reference ui.py:812-818): a non-empty ``include`` restricts the
    registry to the named typenames (priority order preserved),
    ``exclude`` removes typenames.  NOTE the reference's implementation
    (classes.py:25-34) pops *included* names too — contradicting its
    own help text ("Only parse using these tokens"); we implement the
    documented semantics, not the bug."""
    inc, exc = set(include), set(exclude)
    out = [c for c in ALL_CLASSIFIERS if c.name not in exc
           and (not inc or c.name in inc)]
    return out or [UNKNOWN]


BY_NAME: Dict[str, Classifier] = {}
for _c in ALL_CLASSIFIERS:
    BY_NAME.setdefault(_c.name, _c)
BY_NAME["us_clade"] = US_CLADE
BY_NAME["h1_clade"] = H1_CLADE
BY_NAME["h3_clade"] = H3_CLADE
BY_NAME["string"] = STRING
BY_NAME["HA"] = HA_ATTR
BY_NAME["NA"] = NA_ATTR
BY_NAME["missing"] = MISSING


def vote_column(
    items: Sequence[Optional[str]],
    na_str: Sequence[str] = (),
    classifiers: Optional[List[Classifier]] = None,
    default: Classifier = UNKNOWN,
    threshold: float = 0.8,
) -> Classifier:
    """HomoList.cast (classes.py:131-138): first classifier in priority
    order with goodness > threshold."""
    for c in classifiers or ALL_CLASSIFIERS:
        if c.goodness(items, na_str=na_str) > threshold:
            return c
    return default


def cast_datum(
    s: Optional[str],
    na_str: Sequence[str] = (),
    classifiers: Optional[List[Classifier]] = None,
    default: Classifier = UNKNOWN,
) -> Classifier:
    """Datum.cast (classes.py:85-92): first classifier whose token is
    truthy (match is not None and != '')."""
    if s == "":
        return MISSING  # classes.py:86-87
    if s is None or s in na_str:
        return default
    for c in classifiers or ALL_CLASSIFIERS:
        m = c.test_one(s)
        if m is not None and m != "":
            return c
    return default


def vote_columns_sampled(
    columns: Dict[str, List[Optional[str]]],
    na_str: Sequence[str] = (),
    classifiers: Optional[List[Classifier]] = None,
    default: Classifier = UNKNOWN,
) -> Dict[str, str]:
    """Vote every column; returns {column -> classifier name}.  This is
    the driver-side finalization of the distributed two-pass vote: at
    scale, pass 1 samples per-block values via map_batches and sums
    match counts (see stages/scan.py); this helper does the argmax."""
    return {
        k: vote_column(v, na_str=na_str, classifiers=classifiers, default=default).name
        for k, v in columns.items()
    }
