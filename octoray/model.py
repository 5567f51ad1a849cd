"""Triple-table data model: namespaces, URI minting, literal typing.

Re-expresses the reference's nomenclature layer
(/root/reference/octofludb/nomenclature.py:15-122) and content hashing
(/root/reference/octofludb/hash.py:7-13) for an Arrow-native triple
table.  Where the reference materializes rdflib URIRef/Literal nodes,
we keep everything as prefix-abbreviated strings in a 4-column Arrow
schema — one ``ray.data.Dataset`` of these rows is the whole graph:

    subject: string          # minted URI, prefix form (fid:..., usa:IA)
    predicate: string        # f:... term (or owl:sameAs etc.)
    object: string           # lexical form of the object
    object_datatype: string  # '' plain literal | 'uri' | 'xsd:integer' |
                             # 'xsd:double' | 'xsd:boolean' | 'xsd:date' |
                             # 'xsd:gYear' | 'xsd:gYearMonth' | 'xsd:gMonth'
                             # | 'xsd:gMonthDay' | 'xsd:gDay'

Prefix abbreviation mirrors the reference's namespace manager bindings
(nomenclature.py:22-27) so Turtle-style text output is a pure string
concat.
"""

from __future__ import annotations

import re
import urllib.parse as _url
from hashlib import md5
from typing import Optional

import pyarrow as pa

# --- namespaces (nomenclature.py:15-27) --------------------------------
PREFIXES = {
    "fid": "https://flu-crew.org/id/",
    "f": "https://flu-crew.org/term/",
    "tag": "https://flu-crew.org/tag/",
    "query": "https://flu-crew.org/query/",
    "usa": "https://flu-crew.org/geo/country/usa/",
    "world": "https://flu-crew.org/geo/country/",
    "owl": "http://www.w3.org/2002/07/owl#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}

TRIPLE_SCHEMA = pa.schema(
    [
        ("subject", pa.string()),
        ("predicate", pa.string()),
        ("object", pa.string()),
        ("object_datatype", pa.string()),
    ]
)

# datatype tags for the object_datatype column
DT_PLAIN = ""
DT_URI = "uri"
DT_INT = "xsd:integer"
DT_DOUBLE = "xsd:double"
DT_BOOL = "xsd:boolean"
DT_DATE = "xsd:date"
DT_GYEAR = "xsd:gYear"
DT_GYEARMONTH = "xsd:gYearMonth"
DT_GMONTH = "xsd:gMonth"
DT_GMONTHDAY = "xsd:gMonthDay"
DT_GDAY = "xsd:gDay"

_URI_CLEAN_PAT = re.compile(r"[ -]+")


def expand_uri(prefixed: str) -> str:
    """``fid:x`` -> full IRI; unknown prefixes pass through."""
    pfx, _, rest = prefixed.partition(":")
    base = PREFIXES.get(pfx)
    return base + rest if base is not None else prefixed


from functools import lru_cache


@lru_cache(maxsize=65536)
def make_uri(x: Optional[str], prefix: str = "fid") -> Optional[str]:
    """Mint an identifier URI (nomenclature.py:59-66).

    strip -> collapse ``[ -]+`` to ``_`` -> lowercase -> percent-encode
    (quote_plus) -> prefix.  Already-prefixed URIs pass through.
    Memoized: minting is pure and the emitter hot path re-mints the
    same identifiers many times per record (profiled at ~13% of
    emit_page before caching).
    """
    if not x:
        return None
    if is_uri(x):
        return x
    x = _URI_CLEAN_PAT.sub("_", x.strip()).lower()
    return prefix + ":" + _url.quote_plus(x)


def is_uri(x: str) -> bool:
    pfx = x.split(":", 1)[0]
    return pfx in PREFIXES


def make_property(x: str) -> str:
    """Column/field name -> predicate (nomenclature.py:107-108)."""
    return "f:" + x.lower().replace(" ", "_")


def make_tag_uri(x: str) -> str:
    """nomenclature.py:30-33"""
    tag = x.strip().replace(" ", "_").lower()
    return "tag:" + _url.quote_plus(tag)


def make_query_tag_uri(x: str = "default") -> str:
    """nomenclature.py:36-38"""
    return "query:" + _url.quote_plus(x)


def make_usa_state_uri(code: str) -> str:
    """nomenclature.py:69-77 (state code must already be valid)."""
    return "usa:" + code


def make_country_uri_from_code(code: str) -> str:
    """nomenclature.py:89-90"""
    return "world:" + code


def chksum(x: object) -> str:
    """md5 of ``str(x).strip().upper()`` — the sequence content address
    and dedup/join key (hash.py:7-13, README.md:330-335)."""
    h = md5()
    h.update(str(x).strip().upper().encode("ascii"))
    return h.hexdigest()


def uid(base: str, i: int, pad: int = 3) -> str:
    """Deterministic per-record feature id string ``<base><i zero-padded>``
    (nomenclature.py:53-56 uidgen + util.py:83-85 padDigit pad the
    COUNTER, then mint via make_uri).  Scoped to one record, so safe
    under parallelism (SURVEY.md §2.10)."""
    return base + str(i).zfill(pad)


# --- predicate vocabulary (nomenclature.py:131-230, class P) ------------
class P:
    name = "f:name"
    abbr = "f:abbr"
    sameAs = "owl:sameAs"
    chksum = "f:chksum"
    has_feature = "f:has_feature"
    tag = "f:tag"
    query_tag = "f:query_tag"
    dnaseq = "f:dnaseq"
    proseq = "f:proseq"
    global_clade = "f:global_clade"
    constellation = "f:constellation"
    segment_name = "f:segment_name"
    segment_number = "f:segment_number"
    unknown_strain = "f:unknown_strain"
    # blast predicates
    qseqid = "f:qseqid"
    sseqid = "f:sseqid"
    pident = "f:pident"
    length = "f:length"
    mismatch = "f:mismatch"
    gapopen = "f:gapopen"
    qstart = "f:qstart"
    qend = "f:qend"
    sstart = "f:sstart"
    send = "f:send"
    evalue = "f:evalue"
    bitscore = "f:bitscore"
    # sequence labels
    gb = "f:genbank_id"
    # GenBank record metadata (nomenclature.py:186-204)
    gb_locus = "f:locus"
    gb_length = "f:length"
    gb_strandedness = "f:strandedness"
    gb_moltype = "f:moltype"
    gb_topology = "f:topology"
    gb_division = "f:division"
    gb_update_date = "f:update_date"
    gb_create_date = "f:create_date"
    gb_definition = "f:definition"
    gb_primary_accession = "f:primary_accession"
    gb_accession_version = "f:accession_version"
    gb_source = "f:source"
    gb_organism = "f:organism"
    gb_taxonomy = "f:taxonomy"
    gb_location = "f:location"
    epi_id = "f:epi_id"
    # strain labels
    strain_name = "f:strain_name"
    barcode = "f:barcode"
    epi_isolate = "f:epi_isolate"
    has_segment = "f:has_segment"
    # curated data
    ref_reason = "f:ref_reason"
    country = "f:country"
    country_name = "f:country_name"
    state = "f:state"
    subtype = "f:subtype"
    ha_clade = "f:ha_clade"
    na_clade = "f:na_clade"
    date = "f:date"
    time = "f:time"
    file = "f:file"
    host = "f:host"
    encodes = "f:gene"


def triples_to_table(rows) -> pa.Table:
    """List of (s, p, o, dt) tuples -> Arrow table in TRIPLE_SCHEMA."""
    if rows:
        s, p, o, dt = zip(*rows)
    else:
        s = p = o = dt = []
    return pa.table(
        {
            "subject": pa.array(s, type=pa.string()),
            "predicate": pa.array(p, type=pa.string()),
            "object": pa.array(o, type=pa.string()),
            "object_datatype": pa.array(dt, type=pa.string()),
        }
    )


def format_turtle_line(s: str, p: str, o: str, dt: str) -> str:
    """One canonical N-Triples-ish line (prefix-abbreviated), used for
    golden-diff text output parity (reference ui.py:20-39 serializes
    sorted Turtle)."""
    if dt == DT_URI:
        obj = o
    else:
        # N-Triples short escapes: backslash first, then quote and the
        # line-control characters — a raw newline inside a value (web
        # text) would otherwise split the statement across lines
        lex = (o.replace("\\", "\\\\").replace('"', '\\"')
               .replace("\n", "\\n").replace("\r", "\\r")
               .replace("\t", "\\t"))
        obj = '"' + lex + '"' + ("" if dt == DT_PLAIN else "^^" + dt)
    return f"{s} {p} {obj} ."
