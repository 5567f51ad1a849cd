"""GenBank record emission (reference genbank.py:37-187, S4).

``gb_record_triples`` re-expresses ``make_gb_meta_triples`` — the
bespoke per-record emitter with ~15 metadata predicates, md5
content-addressed sequences, per-feature sub-entities with
deterministic ``uid`` counters, and the strain-linking block
(host/date/country cleaning + in-strain US-state and A0 extraction,
genbank.py:154-186).  ``prep_genbank`` runs it as a stateless
``map_batches`` over records serialized as JSON strings (the Entrez
fetch itself is network-bound and sandboxed away — records are
synthesized deterministically by ``synth_gb_records``; the fetch
actor-pool shape is documented in SURVEY.md §2.9 X4).

Per-record ``uid`` counters are safe under parallelism because they
are scoped to one accession (SURVEY.md §2.10).
"""

from __future__ import annotations

import json
import re
from typing import Dict, List, Optional, Set, Tuple

import numpy as np
import pyarrow as pa

from octoray.functions import animal, dates, flu, geography, identifiers
from octoray.model import (
    DT_INT,
    DT_PLAIN,
    DT_URI,
    P,
    chksum,
    make_property,
    make_uri,
    make_usa_state_uri,
    triples_to_table,
    uid,
)
from octoray.stages.canon import canonicalize

Triple = Tuple[str, str, str, str]

_INFLUENZA_RE = re.compile(r"Influenza [ABCD] virus")
_COUNTRY_TAIL = re.compile(r":.*")


def _date_lit(s: str) -> Optional[Tuple[str, str]]:
    r = dates.parse_any_date(s)
    return dates.date_literal(r) if r is not None else None


def _lit_infer(s: str) -> Tuple[str, str]:
    """make_literal(infer=True) (nomenclature.py:111-119): try date
    parse -> typed date literal, else plain."""
    d = _date_lit(s)
    return d if d is not None else (s, DT_PLAIN)


def gb_record_triples(rec: Dict, only_influenza_a: bool = True) -> Tuple[Set[Triple], str]:
    """One Entrez-style record dict -> (triples, error-string)."""
    g: Set[Triple] = set()
    acc = rec.get("GBSeq_primary-accession")
    if not acc:
        return g, "Unknown\tNo primary accession"
    acc = str(acc)
    if only_influenza_a:
        org = rec.get("GBSeq_organism")
        if org is None:
            return g, f"{acc}\tNo organsim specified"
        if not _INFLUENZA_RE.match(org):
            return g, f"{acc}\tNot influenza"

    gid = make_uri(acc)
    g.add((gid, P.gb, acc, DT_PLAIN))

    def maybe(p: str, key: str, dt: str = DT_PLAIN, date: bool = False) -> None:
        v = rec.get(key)
        if v is None:
            return
        if date:
            d = _date_lit(str(v))
            if d:
                g.add((gid, p, d[0], d[1]))
        else:
            g.add((gid, p, str(v), dt))

    maybe(P.gb_locus, "GBSeq_locus")
    maybe(P.gb_length, "GBSeq_length", dt=DT_INT)
    maybe(P.gb_strandedness, "GBSeq_strandedness")
    maybe(P.gb_moltype, "GBSeq_moltype")
    maybe(P.gb_topology, "GBSeq_topology")
    maybe(P.gb_division, "GBSeq_division")
    maybe(P.gb_update_date, "GBSeq_update-date", date=True)
    maybe(P.gb_create_date, "GBSeq_create-date", date=True)
    maybe(P.gb_definition, "GBSeq_definition")
    maybe(P.gb_primary_accession, "GBSeq_primary_accession")
    maybe(P.gb_accession_version, "GBSeq_accession-version")
    maybe(P.gb_source, "GBSeq_source")
    maybe(P.gb_organism, "GBSeq_organism")
    maybe(P.gb_taxonomy, "GBSeq_taxonomy")

    if "GBSeq_sequence" in rec:
        seq = str(rec["GBSeq_sequence"]).upper()
        g.add((gid, P.dnaseq, seq, DT_PLAIN))
        g.add((gid, P.chksum, chksum(seq), DT_PLAIN))

    strain = host = date = country = None
    error = ""

    for i, feat in enumerate(rec.get("GBSeq_feature-table", [])):
        fid = make_uri(uid(acc + "_feat_", i))
        g.add((gid, P.has_feature, fid, DT_URI))
        if feat.get("GBFeature_key") is not None:
            g.add((fid, P.name, str(feat["GBFeature_key"]), DT_PLAIN))
        if feat.get("GBFeature_location") is not None:
            g.add((fid, P.gb_location, str(feat["GBFeature_location"]), DT_PLAIN))
        for qual in feat.get("GBFeature_quals", []):
            key, val = qual.get("GBQualifier_name"), qual.get("GBQualifier_value")
            if key is None or val is None:
                continue
            if key == "translation":
                g.add((fid, P.proseq, val, DT_PLAIN))
                g.add((fid, P.chksum, chksum(val), DT_PLAIN))
            elif key == "strain":
                # p_strain.parse is a PREFIX parse (genbank.py:125);
                # fall back to the raw value with an error note
                m = identifiers.match_strain(val)
                if m is None:
                    error = f"{val}\tBad strain name"
                    strain = val
                else:
                    strain = m
            elif key == "collection_date":
                date = _date_lit(val)
            elif key == "host":
                host = val
            elif key == "country":
                country = _COUNTRY_TAIL.sub("", val)
            elif key == "gene":
                seg = flu.match_segment(val)
                if seg is not None:
                    g.add((gid, P.segment_name, seg, DT_PLAIN))
                lex, dt = _lit_infer(val)
                g.add((fid, make_property(key), lex, dt))
            else:
                lex, dt = _lit_infer(val)
                g.add((fid, make_property(key), lex, dt))

    if strain:
        sid = make_uri(strain)
        g.add((sid, P.has_segment, gid, DT_URI))
        g.add((sid, P.strain_name, strain, DT_PLAIN))
        if host:
            g.add((sid, P.host, animal.clean_host(host), DT_PLAIN))
        if date:
            g.add((sid, P.date, date[0], date[1]))
        if country:
            code = geography.country_to_code(country)
            curi = geography.make_country_uri(country)
            g.add((sid, P.country, curi, DT_URI))
            if code is None:
                g.add((curi, P.name, country, DT_PLAIN))
            if code == "USA":
                for field in strain.split("/")[1:]:
                    scode = geography.state_to_code(field)
                    if scode:
                        g.add((sid, P.state, make_usa_state_uri(scode), DT_URI))
                    if identifiers.match_a0(field):
                        g.add((sid, P.barcode, field, DT_PLAIN))
    else:
        error = f"{rec.get('GBSeq_locus', acc)}\tNo strain name"

    return g, error


# ----------------------------------------------------------------------
# Ray pipeline over JSON-serialized records
# ----------------------------------------------------------------------
def prep_genbank(records_ds, *, json_col: str = "record", canonical: bool = True):
    """Dataset[record: string(json)] -> canonical triples."""

    def f(t: pa.Table) -> pa.Table:
        triples: Set[Triple] = set()
        for s in t.column(json_col).to_pylist():
            g, _err = gb_record_triples(json.loads(s))
            triples |= g
        return triples_to_table(sorted(triples))

    out = records_ds.map_batches(f, batch_format="pyarrow")
    return canonicalize(out) if canonical else out


def genbank_errors(records_ds, *, json_col: str = "record"):
    """The reference's error side-channel (genbank.py:57-186 error
    strings) as a Dataset[(accession, error)]."""

    def f(t: pa.Table) -> pa.Table:
        accs: List[str] = []
        errs: List[str] = []
        for s in t.column(json_col).to_pylist():
            rec = json.loads(s)
            _g, err = gb_record_triples(rec)
            if err:
                accs.append(str(rec.get("GBSeq_primary-accession", "Unknown")))
                errs.append(err)
        return pa.table(
            {"accession": pa.array(accs, pa.string()), "error": pa.array(errs, pa.string())}
        )

    return records_ds.map_batches(f, batch_format="pyarrow")


# ----------------------------------------------------------------------
# deterministic synthetic Entrez records (replaces the network fetch)
# ----------------------------------------------------------------------
def _synth_gb_record(r: "np.ndarray", acc: str) -> str:
    """One Entrez-shaped record JSON from a 12-stream draw row and a
    fixed accession (shared by the index-keyed and id-keyed
    synthesizers so both stay deterministic and byte-stable)."""
    from octoray.sources.webtext import COUNTRIES, HOSTS, PLACES

    genes = ["HA", "NA", "PB2", "PB1", "PA", "NP", "M1", "NS1"]
    year = 2009 + int(r[1] % 15)
    host = HOSTS[int(r[2]) % 2]
    place = PLACES[int(r[3]) % len(PLACES)]
    a0 = f"A0{int(r[4]) % 10_000_000:07d}"
    strain = f"A/{host}/{place}/{a0}/{year}"
    seq = "ACGT" * (20 + int(r[5] % 30))
    country = "USA" if r[6] % 3 else COUNTRIES[int(r[7]) % len(COUNTRIES)]
    rec: Dict = {
        "GBSeq_primary-accession": acc,
        "GBSeq_locus": acc,
        "GBSeq_length": str(len(seq)),
        "GBSeq_moltype": "cRNA",
        "GBSeq_organism": "Influenza A virus",
        "GBSeq_update-date": f"{year}-0{1 + int(r[8] % 9)}-15",
        "GBSeq_create-date": f"0{1 + int(r[8] % 9)}/02/{year}",
        "GBSeq_definition": f"Influenza A virus ({strain}) segment",
        "GBSeq_sequence": seq.lower(),
        "GBSeq_feature-table": [
            {
                "GBFeature_key": "source",
                "GBFeature_location": f"1..{len(seq)}",
                "GBFeature_quals": [
                    {"GBQualifier_name": "strain", "GBQualifier_value": strain},
                    {"GBQualifier_name": "host", "GBQualifier_value": host},
                    {"GBQualifier_name": "country",
                     "GBQualifier_value": f"{country}: {place}"},
                    {"GBQualifier_name": "collection_date",
                     "GBQualifier_value": f"{1 + int(r[9] % 28):02d}-Mar-{year}"},
                ],
            },
            {
                "GBFeature_key": "CDS",
                "GBFeature_location": f"1..{len(seq) - 3}",
                "GBFeature_quals": [
                    {"GBQualifier_name": "gene",
                     "GBQualifier_value": genes[int(r[10]) % len(genes)]},
                    {"GBQualifier_name": "translation",
                     "GBQualifier_value": "MKV" * (10 + int(r[11] % 10))},
                ],
            },
        ],
    }
    bad_kind = int(r[11] % 30)
    if bad_kind == 0:
        rec.pop("GBSeq_organism")
    elif bad_kind == 1:
        rec["GBSeq_organism"] = "Homo sapiens"
    elif bad_kind == 2:
        rec["GBSeq_feature-table"][0]["GBFeature_quals"][0]["GBQualifier_value"] = "?!"
    return json.dumps(rec, sort_keys=True)


def synth_gb_records(n: int, seed: int = 42) -> List[str]:
    """Entrez-shaped record dicts (JSON strings) drawing on the webtext
    vocab; ~1/10 records are deliberately malformed the ways the
    reference guards against (no organism / not influenza / bad
    strain)."""
    from octoray.sources.webtext import _streams

    r = _streams(np.arange(n, dtype=np.uint64), seed ^ 0x6B4EC, 12)
    return [
        _synth_gb_record(r[i], f"MG{int(r[i, 0]) % 900000 + 100000}")
        for i in range(n)
    ]


def synth_gb_records_for_ids(ids: List[str], seed: int = 42) -> List[str]:
    """Per-ACCESSION deterministic record synthesis — the sandbox
    stand-in for the reference's `prep gbids` Entrez fetch by id list
    (_mk_gbids_cmd, ui.py:673-713): the same id always yields the same
    record, independent of request order or batching (keys derive from
    a hash of the id, not a list index)."""
    import hashlib

    from octoray.sources.webtext import _streams

    keys = np.array(
        [int.from_bytes(hashlib.md5(i.encode()).digest()[:8], "little")
         for i in ids],
        dtype=np.uint64,
    )
    r = _streams(keys, seed ^ 0x6B4EC, 12)
    return [_synth_gb_record(r[k], acc) for k, acc in enumerate(ids)]


def gb_records_dataset(n: int, seed: int = 42):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"record": pa.array(synth_gb_records(n, seed), pa.string())})
    )
