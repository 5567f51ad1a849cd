"""GenBank emitter parity (reference genbank.py:37-187)."""

import json

import pyarrow as pa

from octoray.model import chksum
from octoray.pipelines.genbank import (
    gb_record_triples,
    gb_records_dataset,
    genbank_errors,
    prep_genbank,
    synth_gb_records,
)


def _rec():
    return {
        "GBSeq_primary-accession": "MG123456",
        "GBSeq_locus": "MG123456",
        "GBSeq_length": "982",
        "GBSeq_organism": "Influenza A virus",
        "GBSeq_update-date": "2016-04-01",
        "GBSeq_sequence": "acgtacgt",
        "GBSeq_feature-table": [
            {
                "GBFeature_key": "source",
                "GBFeature_location": "1..982",
                "GBFeature_quals": [
                    {"GBQualifier_name": "strain",
                     "GBQualifier_value": "A/swine/Iowa/A01234567/2015"},
                    {"GBQualifier_name": "host", "GBQualifier_value": "porcine"},
                    {"GBQualifier_name": "country", "GBQualifier_value": "USA: Iowa"},
                    {"GBQualifier_name": "collection_date",
                     "GBQualifier_value": "21-Mar-2015"},
                ],
            },
            {
                "GBFeature_key": "CDS",
                "GBFeature_quals": [
                    {"GBQualifier_name": "gene", "GBQualifier_value": "M1"},
                    {"GBQualifier_name": "translation", "GBQualifier_value": "MKVKL"},
                ],
            },
        ],
    }


def test_gb_record_triples_full():
    g, err = gb_record_triples(_rec())
    assert err == ""
    gid = "fid:mg123456"
    sid = "fid:a%2Fswine%2Fiowa%2Fa01234567%2F2015"
    fid0 = "fid:mg123456_feat_000"
    fid1 = "fid:mg123456_feat_001"
    assert (gid, "f:genbank_id", "MG123456", "") in g
    assert (gid, "f:length", "982", "xsd:integer") in g
    assert (gid, "f:update_date", "2016-04-01", "xsd:date") in g
    # sequence uppercased + md5 content address (genbank.py:93-96)
    assert (gid, "f:dnaseq", "ACGTACGT", "") in g
    assert (gid, "f:chksum", chksum("ACGTACGT"), "") in g
    # features
    assert (gid, "f:has_feature", fid0, "uri") in g
    assert (fid0, "f:name", "source", "") in g
    assert (fid0, "f:location", "1..982", "") in g
    assert (fid1, "f:proseq", "MKVKL", "") in g
    assert (fid1, "f:chksum", chksum("MKVKL"), "") in g
    # gene: segment name normalized M1 -> M on the RECORD, raw on feature
    assert (gid, "f:segment_name", "M", "") in g
    assert (fid1, "f:gene", "M1", "") in g
    # strain-link block (genbank.py:154-186)
    assert (sid, "f:has_segment", gid, "uri") in g
    assert (sid, "f:strain_name", "A/swine/Iowa/A01234567/2015", "") in g
    assert (sid, "f:host", "swine", "") in g  # porcine -> swine
    assert (sid, "f:date", "2015-03-21", "xsd:date") in g
    assert (sid, "f:country", "world:USA", "uri") in g
    assert (sid, "f:state", "usa:IA", "uri") in g
    assert (sid, "f:barcode", "A01234567", "") in g


def test_gb_guards():
    rec = _rec(); rec.pop("GBSeq_organism")
    g, err = gb_record_triples(rec)
    assert g == set() and err.endswith("No organsim specified")

    rec = _rec(); rec["GBSeq_organism"] = "Homo sapiens"
    g, err = gb_record_triples(rec)
    assert g == set() and err.endswith("Not influenza")

    rec = _rec()
    rec["GBSeq_feature-table"][0]["GBFeature_quals"][0]["GBQualifier_value"] = "?!"
    g, err = gb_record_triples(rec)
    assert err == "?!\tBad strain name"
    # raw bad strain still links (genbank.py:126-129)
    assert any(s == "fid:%3F%21" and p == "f:strain_name" for s, p, o, dt in g)


def test_prep_genbank_pipeline(ray_session):
    ds = prep_genbank(gb_records_dataset(60))
    rows = ds.take_all()
    keys = [tuple(r.values()) for r in rows]
    assert keys == sorted(keys) and len(keys) == len(set(keys))
    # deterministic across runs
    rows2 = prep_genbank(gb_records_dataset(60)).take_all()
    assert rows == rows2
    errs = genbank_errors(gb_records_dataset(60)).take_all()
    assert 0 < len(errs) < 20  # ~1/10 malformed by construction
