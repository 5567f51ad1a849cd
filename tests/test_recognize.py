"""Classifier unit vectors, ported from the reference's own test suite
(/root/reference/runtests.py:80-637) — the correctness contract named
in BASELINE.json."""

from __future__ import annotations

import pytest

from octoray import recognize as R
from octoray.functions import dates


def clean(c, s):
    return c.clean(s)


# --- numbers / booleans (runtests.py:80-109) ---------------------------
@pytest.mark.parametrize(
    "s,expected",
    [("1", "1"), ("0", "0"), ("12345678", "12345678"), ("12345678.0", None), ("bogus", None)],
)
def test_integer(s, expected):
    assert clean(R.INTEGER, s) == expected


@pytest.mark.parametrize(
    "s,expected",
    [("1", "1"), ("0", "0"), ("12345678", "12345678"), ("12345678.0", "12345678.0"), ("bogus", None)],
)
def test_double(s, expected):
    assert clean(R.DOUBLE, s) == expected


@pytest.mark.parametrize(
    "s,expected",
    [
        ("1", "true"), ("y", "true"), ("t", "true"), ("yeS", "true"),
        ("tRuE", "true"), ("0", "false"), ("n", "false"), ("nO", "false"),
        ("faLse", "false"), ("bogus", None),
    ],
)
def test_boolean(s, expected):
    assert clean(R.BOOLEAN, s) == expected


# --- barcode (runtests.py:112-117) -------------------------------------
@pytest.mark.parametrize(
    "s,expected", [("A01234567", "A01234567"), ("bogus", None), ("K00869", None)]
)
def test_barcode(s, expected):
    assert clean(R.BARCODE, s) == expected


# --- constellation (runtests.py:119-125) --------------------------------
@pytest.mark.parametrize(
    "s,expected",
    [("TTTTPT", "TTTTPT"), ("TTTT--", "TTTT--"), ("mixed", "mixed"), ("MIXED", "MIXED"),
     ("TTT", None), ("TTTTTTT", None)],
)
def test_constellation(s, expected):
    assert clean(R.CONSTELLATION, s) == expected


# --- country incl. misspellings (runtests.py:128-145) -------------------
@pytest.mark.parametrize(
    "s,expected",
    [
        ("United States", "USA"), ("USA", "USA"), ("US", "USA"),
        ("Untied States", "USA"),  # edit-distance-1 correction
        ("The United States of America", "USA"),
        ("Mexico", "MEX"), ("Georgia", "GEO"), ("bogus", None),
    ],
)
def test_country(s, expected):
    assert clean(R.COUNTRY, s) == expected


# --- country-or-state (runtests.py:148-183) -----------------------------
@pytest.mark.parametrize(
    "s,expected",
    [
        ("Ontario", "CAN"), ("Quebec", "CAN"), ("Beijing", "CHN"),
        ("Sichuan", "CHN"), ("Texas", "USA"), ("Iowa", "USA"),
        ("France", "FRA"), ("bogus", None),
    ],
)
def test_country_or_state(s, expected):
    assert clean(R.COUNTRY_OR_STATE, s) == expected


# --- dates (runtests.py:186-283) ----------------------------------------
@pytest.mark.parametrize(
    "s,expected",
    [
        ("2011", "2011"), ("11", "2011"), ("90", "1990"),
        ("05-Jun-2011", "2011-06-05"), ("Jun-2011", "2011-06"),
        ("May 17, 1986", "1986-05-17"), ("May17,1986", "1986-05-17"),
        ("1986-05-17", "1986-05-17"), ("19860517", "1986-05-17"),
        ("1986/05/17", "1986-05-17"), ("05/17/1986", "1986-05-17"),
        ("05/17/1886", "1886-05-17"),
        ("1986-05-17T22:01:30Z", "1986-05-17"),
        ("1986-05-17T22:01:30+00:00", "1986-05-17"),
        # rejections
        ("May 17, 19", None), ("05 17, 1999", None), ("05/17/86", None),
        ("11/05", None), ("05/11", None), ("11/05/31", None),
        ("05/31/11", None), ("20195", None), ("201905067", None),
        ("05/06/01/6", None), ("bogus", None),
    ],
)
def test_date(s, expected):
    assert clean(R.DATE, s) == expected


@pytest.mark.parametrize(
    "s,lexical,dt",
    [
        ("1990", "1990", "xsd:gYear"),
        ("99", "1999", "xsd:gYear"),
        ("00", "2000", "xsd:gYear"),
        ("29", "2029", "xsd:gYear"),
        ("30", "1930", "xsd:gYear"),
        ("2011/05", "2011-05", "xsd:gYearMonth"),
        ("05/2011", "2011-05", "xsd:gYearMonth"),
        ("2011/05/31", "2011-05-31", "xsd:date"),
        ("20110531", "2011-05-31", "xsd:date"),
        ("05/31/2011", "2011-05-31", "xsd:date"),
        ("05312011", "2011-05-31", "xsd:date"),
    ],
)
def test_date_literal(s, lexical, dt):
    r = dates.parse_any_date(s)
    assert r is not None
    assert dates.date_literal(r) == (lexical, dt)


# --- genbank / epi (runtests.py:286-315) --------------------------------
@pytest.mark.parametrize(
    "s,expected",
    [
        ("AB12345678", None), ("AB1234567", "AB1234567"), ("AB123456", "AB123456"),
        ("AB12345", "AB12345"), ("AB1234", None), ("A123456", "A123456"),
        ("ab123456", None),  # uppercase required
        ("bogus", None),
    ],
)
def test_genbank(s, expected):
    assert clean(R.GENBANK, s) == expected


@pytest.mark.parametrize(
    "s,expected",
    [("EPI_123456", "EPI123456"), ("EPI123456", "EPI123456"), ("EPI12", None), ("bogus", None)],
)
def test_epi_seqid(s, expected):
    assert clean(R.EPI_SEQID, s) == expected


def test_epi_isolate():
    assert clean(R.ISOLATE, "EPI_ISL_12345") == "EPI_ISL_12345"
    assert clean(R.ISOLATE, "epi_isl_12345") is None
    assert clean(R.ISOLATE, "bogus") is None


# --- global clade (runtests.py:318-373, subset) -------------------------
@pytest.mark.parametrize(
    "s",
    [
        "1A.1", "1A.1.1", "1A.2.3.4", "1B.2.1", "1C.2", "3.1990.4",
        "1A.1.1-like", "1A.1.1-vaccine", "Other-Human-1B.2",
        "humanVaccine", "Outgroup", "1A_1", "1A-1",
    ],
)
def test_global_clade_accepts(s):
    assert clean(R.GLOBAL_CLADE, s) == s


@pytest.mark.parametrize("s", ["bogus", "1D.1", "A.1.1"])
def test_global_clade_rejects(s):
    assert clean(R.GLOBAL_CLADE, s) is None


# --- subtype (runtests.py:376-402) --------------------------------------
@pytest.mark.parametrize(
    "s,expected",
    [
        ("H1N1", "H1N1"), ("H10N10", "H10N10"), ("A/H1N1", "H1N1"),
        ("A / H1N1", "H1N1"), ("H1huN1", "H1huN1"), ("H1swN1", "H1swN1"),
        ("H1avN1", "H1avN1"), ("H1N1v", "H1N1v"),
        ("mixed", "mixed"), ("Mixed", "mixed"), ("MIXED", "mixed"),
        ("H1", None), ("N1", None), ("bogus", None), ("h1n1", None),
    ],
)
def test_subtype(s, expected):
    assert clean(R.SUBTYPE, s) == expected


# --- HA/NA (runtests.py:405-421) ----------------------------------------
@pytest.mark.parametrize(
    "s,expected",
    [("H1", "H1"), ("H18", "H18"), ("pdmH1", "pdmH1"), ("N1", None), ("bogus", None)],
)
def test_ha(s, expected):
    assert clean(R.HA_ATTR, s) == expected


# --- host (runtests.py:424-432) -----------------------------------------
@pytest.mark.parametrize(
    "s,expected",
    [("swine", "swine"), ("Swine", "swine"), ("SWINE", "swine"), ("human", "human"),
     ("Human", "human"), ("bogus", None)],
)
def test_host(s, expected):
    assert clean(R.HOST, s) == expected


# --- segments (runtests.py:435-500) -------------------------------------
@pytest.mark.parametrize(
    "s,expected",
    [
        ("PB2", "PB2"), ("PB1", "PB1"), ("PA", "PA"), ("NP", "NP"),
        ("HA", "HA"), ("NA", "NA"), ("NS", "NS"), ("NS1", "NS"),
        ("M", "M"), ("MP", "M"), ("M1", "M"), ("bogus", None),
    ],
)
def test_segment_name(s, expected):
    assert clean(R.SEGMENT_NAME, s) == expected


@pytest.mark.parametrize(
    "s,expected",
    [("PB2", "PB2"), ("NS1", "NS"), ("M1", "M"), ("HA", None), ("NA", None), ("bogus", None)],
)
def test_internal_gene(s, expected):
    assert clean(R.INTERNAL_GENE, s) == expected


@pytest.mark.parametrize(
    "s,expected",
    [("1", "1"), ("8", "8"), ("0", None), ("9", None), ("bogus", None)],
)
def test_segment_number(s, expected):
    assert clean(R.SEGMENT_NUMBER, s) == expected


@pytest.mark.parametrize(
    "s,expected",
    [("HA", "HA"), ("H1", "H1"), ("N2", "N2"), ("PB2", "PB2"), ("bogus", None)],
)
def test_segment_subtype(s, expected):
    assert clean(R.SEGMENT_SUBTYPE, s) == expected


# --- strain (runtests.py:503-535) ---------------------------------------
@pytest.mark.parametrize(
    "s,expected",
    [
        ("A/asdf/er", "A/asdf/er"),
        ("A/asdf/er  \t", "A/asdf/er"),
        ("A/asdf/2020", "A/asdf/2020"),
        ("B/asdf/2020", "B/asdf/2020"),
        ("C/asdf/2020", "C/asdf/2020"),
        ("D/asdf/2020", "D/asdf/2020"),
        ("E/asdf/2020", None),
        ("A/asdf foo bar/2020", "A/asdf_foo_bar/2020"),
        ("A/asdf/2020()", "A/asdf/2020"),
        ("A/asdf/2020 ()", "A/asdf/2020"),
        ("A/asdf/2020[]", "A/asdf/2020"),
        ("A/asdf/2020 []", "A/asdf/2020"),
        ("A/asdf/2020(H1N1)", "A/asdf/2020"),
        ("A/asdf/2020 (H1N1)", "A/asdf/2020"),
        ("A/asdf/2020[H1N1]", "A/asdf/2020"),
        ("A/asdf/2020 [H1N1]", "A/asdf/2020"),
        ("(A/Bratislava/6/97 (H3N2))", "A/Bratislava/6/97"),
        ("A/bogus", None),
        ("bogus", None),
    ],
)
def test_strain(s, expected):
    assert clean(R.STRAIN, s) == expected


# --- state (runtests.py:557-564) ----------------------------------------
@pytest.mark.parametrize(
    "s,expected",
    [
        ("wyoming", "WY"), ("WY", "WY"), ("District of Columbia", "DC"),
        ("North_Dakota", "ND"), ("North dakota", "ND"), ("bogus", None),
    ],
)
def test_state_usa(s, expected):
    assert clean(R.STATE_USA, s) == expected


# --- clade wordsets (runtests.py:567-602) -------------------------------
@pytest.mark.parametrize(
    "s,expected",
    [
        ("alpha", "alpha"), ("Alpha", "Alpha"), ("gamma2-beta-like", "gamma2-beta-like"),
        ("pdm", "pdm"), ("bogus", None),
    ],
)
def test_h1_clade(s, expected):
    assert clean(R.H1_CLADE, s) == expected


@pytest.mark.parametrize(
    "s,expected",
    [("2010.1", "2010.1"), ("Cluster_IVA", "Cluster_IVA"), ("cluster_iva", "cluster_iva"),
     ("IV-A", "IV-A"), ("bogus", None)],
)
def test_h3_clade(s, expected):
    assert clean(R.H3_CLADE, s) == expected


@pytest.mark.parametrize(
    "s,expected", [("pdm", "PDM"), ("TRIG", "TRIG"), ("trig", "TRIG"), ("LAIV", "LAIV"), ("bogus", None)]
)
def test_internal_gene_clade(s, expected):
    assert clean(R.INTERNAL_GENE_CLADE, s) == expected


# --- sequences (runtests.py:605-619) ------------------------------------
def test_dnaseq():
    assert clean(R.DNASEQ, "ATGG") == "ATGG"
    assert clean(R.DNASEQ, "atgg") == "ATGG"
    assert clean(R.DNASEQ, "AT_GG-NRY") == "ATGGNRY"
    assert clean(R.DNASEQ, "bogus,") is None


def test_proseq():
    assert clean(R.PROSEQ, "MSDQEW*") == "MSDQEW*"
    assert clean(R.PROSEQ, "msdqew") == "MSDQEW"
    assert clean(R.PROSEQ, "bogus,") is None


# --- column vote (runtests.py:631-637) ----------------------------------
def test_column_vote_georgia():
    # one "Georgia" is a country (country precedes state in priority)
    assert R.vote_column(["Georgia"]).name == "country"
    # "Georgia","Texas": country goodness 0.5 < 0.8 -> state wins
    assert R.vote_column(["Georgia", "Texas"]).name == "state"


def test_column_vote_sequences():
    seqs = ["ATGGCGTATGCGTAGCGTAGCTAGT" * 2] * 5
    assert R.vote_column(seqs).name == "dnaseq"
    # sequence vote requires len > 20
    assert R.vote_column(["ATGG"] * 5).name != "dnaseq"


def test_cast_datum():
    assert R.cast_datum("EPI_ISL_12345").name == "isolate_id"
    assert R.cast_datum("AB123456").name == "genbank_id"
    assert R.cast_datum("A/swine/Iowa/533/99").name == "strain_name"
    assert R.cast_datum("").name == "missing"
    assert R.cast_datum("!!weird??").name == "unknown"
