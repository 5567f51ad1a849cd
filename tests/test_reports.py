"""Report-layer vectors ported from the reference
(runtests.py:767-999) + Ray groupby integration."""

from __future__ import annotations

import pandas as pd
import pytest

from octoray.functions.dates import quarter_from_date
from octoray.pipelines import reports


# --- _get_subtype precedence matrix (runtests.py:767-891) ---------------
def gs(has, nas, gisaid=(), genbank=()):
    return reports.get_subtype(has, nas, gisaid_subtypes=list(gisaid), genbank_subtypes=list(genbank))


def test_subtype_nothing():
    assert gs([], []) is None


def test_quarters():
    assert quarter_from_date("2021") == ""
    assert quarter_from_date("2021-01-01") == "2021Q1"
    assert quarter_from_date("2021-12-01") == "2021Q4"


def test_subtype_from_segments():
    assert gs(["H1"], ["N1"]) == "H1N1"
    assert gs(["h1", "H1"], ["N1"]) == "H1N1"
    assert gs(["h1 "], ["  n1 "]) == "H1N1"
    assert gs(["H1", "H1"], ["N1"]) == "H1N1"
    assert gs(["H1", "H2"], ["N1"]) == "mixed"
    assert gs(["H1"], []) is None
    assert gs([], ["N1"]) is None
    assert gs(["H1"], [], genbank=["H1N1"]) == "H1N1"
    assert gs([], ["N1"], gisaid=["H1N1"]) == "H1N1"
    assert gs([], ["N1"], gisaid=["H1N1"], genbank=["H1N1"]) == "H1N1"


def test_subtype_from_genbank_gisaid():
    assert gs([], [], genbank=["H1N1"]) == "H1N1"
    assert gs([], [], gisaid=["H1N1"]) == "H1N1"
    assert gs([], [], genbank=["H1N1", "H1N1"], gisaid=["H1N1"]) == "H1N1"
    assert gs([], [], genbank=[" H1n1 ", " h1N1 "]) == "H1N1"
    assert gs([], [], genbank=["H12avN12v"], gisaid=["H12N12pdm"]) == "H12N12"
    assert gs([], [], genbank=["H1N1", "H3N2"]) == "mixed"
    assert gs([], [], gisaid=["H1N1", "H3N2"]) == "mixed"
    assert gs([], ["H1N1"], genbank=["H1N1", "H3N2"]) == "mixed"
    assert gs([], [], genbank=["H1N1", "H3N2"], gisaid=["H1N1"]) == "mixed"
    # octoFLU HA/NA beats everything
    assert gs(["H4"], ["N6"], gisaid=["H1N1", "H3N2"]) == "H4N6"
    # genbank beats gisaid on disagreement
    assert gs([], [], gisaid=["H4N6"], genbank=["H3N2"]) == "H3N2"


# --- constellations (runtests.py:893-999, vs the CURRENT reference
#     formatting.py:70-125 behavior) -------------------------------------
def test_constellations_base():
    assert reports.make_constellations([]) == []


def test_constellations_regular():
    data = (
        [("A", s, "pdm") for s in ["PB2", "PB1", "PA", "NP", "M", "NS"]]
        + [("B", s, "TRIG") for s in ["PB2", "PA", "NP", "PB1", "M", "NS"]]
        + [("C", s, "LAIV") for s in ["PB2", "PA", "NP", "M", "PB1", "NS"]]
        + [("D", s, "humanSeasonal") for s in ["PB1", "PA", "M", "NP", "NS", "PB2"]]
        + [
            ("E", "PB1", "TRIG"),
            ("E", "PA", "humanSeasonal"),
            ("E", "NP", "LAIV"),
            ("E", "NS", "pdm"),
            ("E", "PB2", "pdm"),
        ]
    )
    assert reports.make_constellations(data) == [
        ("A", "PPPPPP"),
        ("B", "TTTTTT"),
        ("C", "VVVVVV"),
        ("D", "HHHHHH"),
        ("E", "PTHV-P"),
    ]


def test_constellations_mixed():
    data = [("A", s, "pdm") for s in ["PB2", "PB1", "PA", "NP", "M", "NS"]] + [
        ("A", "NS", "TRIG")
    ]
    assert reports.make_constellations(data) == [("A", "mixed")]


def test_constellations_irregular():
    data = [
        ("A", "PB2", "pdm"),
        ("A", "PB1", "chocolate"),
        ("A", "NP", "pdm"),
        ("A", "NS", "TRIG"),
    ]
    assert reports.make_constellations(data) == [("A", "PX-P-T")]


def test_constellations_flexible():
    # partial / case-insensitive clade containment (formatting.py:99-106)
    data = [
        ("A", "PB2", "avian"),
        ("A", "PB1", "Avian"),
        ("A", "PA", "PA-avian-spillover"),
        ("A", "NP", "NP-avian"),
        ("A", "M", "PDM"),
        ("A", "NS", "Human"),
    ]
    assert reports.make_constellations(data) == [("A", "AAAAPX")]


def test_constellations_like_is_x():
    data = [("A", "PB2", "pdm-like")]
    assert reports.make_constellations(data) == [("A", "X-----")]


def test_constellations_mp_slot():
    # MP aliases the M slot (formatting.py:72)
    data = [("A", "MP", "pdm"), ("A", "M", "pdm")]
    assert reports.make_constellations(data) == [("A", "----P-")]


# --- Ray integration ----------------------------------------------------
def test_constellations_dataset(ray_session):
    import ray.data as rd

    rows = [
        {"strain": "A", "segment": s, "clade": "pdm"}
        for s in ["PB2", "PB1", "PA", "NP", "M", "NS"]
    ] + [{"strain": "B", "segment": "PB2", "clade": "TRIG"}]
    out = reports.constellations(rd.from_items(rows)).take_all()
    got = {(r["strain_name"], r["constellation"]) for r in out}
    assert got == {("A", "PPPPPP"), ("B", "T-----")}


def test_subtype_synthesis_dataset(ray_session):
    import ray.data as rd

    rows = [
        {
            "strain_name": "A/sw/1",
            "isolates": "EPI_ISL_1+EPI_ISL_2",
            "segment_subtypes": "H1",
            "genbank_subtypes": "",
            "gisaid_subtypes": "",
        },
        {
            "strain_name": "A/sw/1",
            "isolates": "EPI_ISL_1",
            "segment_subtypes": "N1",
            "genbank_subtypes": "",
            "gisaid_subtypes": "",
        },
        {
            "strain_name": "A/sw/2",
            "isolates": "",
            "segment_subtypes": "",
            "genbank_subtypes": "H3N2",
            "gisaid_subtypes": "H1N1",
        },
    ]
    out = reports.synthesize_subtypes(rd.from_items(rows)).take_all()
    got = {(r["id"], r["level"], r["subtype"]) for r in out}
    assert got == {
        ("A/sw/1", "strain", "H1N1"),
        ("EPI_ISL_1", "isolate", "H1N1"),
        ("EPI_ISL_2", "isolate", "H1N1"),
        ("A/sw/2", "strain", "H3N2"),
    }


def test_masterlist_pivot(ray_session):
    import ray.data as rd

    rows = [
        {
            "barcode": "A01234567",
            "genbank_id": "AB111111",
            "segment": "HA",
            "segment_subtypes": "H1",
            "subtypes": "H1N1",
            "earliest_date": "2020-05-01",
            "states": "IA",
            "strains": "A/swine/Iowa/A01234567/2020",
            "us_clades": "alpha",
            "gl_clades": "1A.1.1",
            "consts": "TTTTPT",
            "h3_motifs": "", "sa_motifs": "", "sb_motifs": "",
            "ca1_motifs": "", "ca2_motifs": "", "cb_motifs": "",
        },
        {
            "barcode": "A01234567",
            "genbank_id": "AB222222",
            "segment": "NA",
            "segment_subtypes": "N1",
            "subtypes": "H1N1",
            "earliest_date": "2020-05-01",
            "states": "IA",
            "strains": "A/swine/Iowa/A01234567/2020",
            "us_clades": "Classical",
            "gl_clades": "",
            "consts": "TTTTPT",
            "h3_motifs": "", "sa_motifs": "", "sb_motifs": "",
            "ca1_motifs": "", "ca2_motifs": "", "cb_motifs": "",
        },
    ]
    out = reports.masterlist(rd.from_items(rows)).take_all()
    assert len(out) == 1
    row = out[0]
    assert row["Barcode"] == "A01234567"
    assert row["Date"] == "2020-05-01"
    assert row["Collection_Q"] == "2020Q2"
    assert row["H_Genbank"] == "AB111111"
    assert row["N_Genbank"] == "AB222222"
    assert row["US_Clade"] == "alpha"
    assert row["GL_Clade"] == "1A.1.1"
    assert row["H1"] == "alpha"
    assert row["N1"] == "Classical"
    # NB: the reference routes NA-segment us_clades to a key "NA" that is
    # NOT in MASTERLIST_HEADER (recipes.py:478) — dropped on output; we
    # reproduce that (only N1/N2 routing via segment_subtype survives).
    assert "NA" not in row
    assert row["Subtype"] == "H1N1"
    assert row["Constellation"] == "TTTTPT"
