"""Triple-emission goldens ported from the reference
(/root/reference/runtests.py:640-764: TestPhrase, TestFasta)."""

from __future__ import annotations

from octoray import emit, recognize as R
from octoray.model import expand_uri


def _phrase_from_values(values, levels=None):
    mentions = [emit.make_mention(R.cast_datum(v), v) for v in values]
    return emit.connect(mentions, levels=levels)


def _show(triples):
    """Sorted (full-subject, full-predicate, object) like showTriple
    (reference graph.py:7-13): URIs expanded, literals as lexical."""
    out = []
    for s, p, o, dt in triples:
        obj = expand_uri(o) if dt == "uri" else o
        out.append((expand_uri(s), expand_uri(p), obj))
    return sorted(out)


def test_phrase_strain_subtype():
    # runtests.py:641-661
    got = _show(_phrase_from_values(["A/swine/bogus/A01234567/2021", "H1N1"]))
    assert got == [
        (
            "https://flu-crew.org/id/a%2Fswine%2Fbogus%2Fa01234567%2F2021",
            "https://flu-crew.org/term/barcode",
            "A01234567",
        ),
        (
            "https://flu-crew.org/id/a%2Fswine%2Fbogus%2Fa01234567%2F2021",
            "https://flu-crew.org/term/strain_name",
            "A/swine/bogus/A01234567/2021",
        ),
        (
            "https://flu-crew.org/id/a%2Fswine%2Fbogus%2Fa01234567%2F2021",
            "https://flu-crew.org/term/subtype",
            "H1N1",
        ),
    ]


def test_strain_barcode_parsing():
    # runtests.py:537-554
    m = emit.make_mention(R.STRAIN, "A/asdf/A01234567/sdf")
    got = _show(m.add_triples())
    assert got == [
        (
            "https://flu-crew.org/id/a%2Fasdf%2Fa01234567%2Fsdf",
            "https://flu-crew.org/term/barcode",
            "A01234567",
        ),
        (
            "https://flu-crew.org/id/a%2Fasdf%2Fa01234567%2Fsdf",
            "https://flu-crew.org/term/strain_name",
            "A/asdf/A01234567/sdf",
        ),
    ]


def test_fasta_unknown_headers():
    # runtests.py:664-706: >baz\nATGG  +  >foo||z\nATGGG
    rows = [["baz", "ATGG"], ["foo", "", "z", "ATGGG"]]
    g = set()
    for row in rows:
        g |= _phrase_from_values(row)
    got = _show(g)
    assert got == [
        (
            "https://flu-crew.org/id/4badd1687f27faae29f9b1fe1ea37e78",
            "https://flu-crew.org/term/chksum",
            "4badd1687f27faae29f9b1fe1ea37e78",
        ),
        (
            "https://flu-crew.org/id/4badd1687f27faae29f9b1fe1ea37e78",
            "https://flu-crew.org/term/dnaseq",
            "ATGGG",
        ),
        (
            "https://flu-crew.org/id/4badd1687f27faae29f9b1fe1ea37e78",
            "https://flu-crew.org/term/unknown",
            "foo",
        ),
        (
            "https://flu-crew.org/id/4badd1687f27faae29f9b1fe1ea37e78",
            "https://flu-crew.org/term/unknown",
            "z",
        ),
        (
            "https://flu-crew.org/id/5b2033ab635505389b1acfa0d6eda05c",
            "https://flu-crew.org/term/chksum",
            "5b2033ab635505389b1acfa0d6eda05c",
        ),
        (
            "https://flu-crew.org/id/5b2033ab635505389b1acfa0d6eda05c",
            "https://flu-crew.org/term/dnaseq",
            "ATGG",
        ),
        (
            "https://flu-crew.org/id/5b2033ab635505389b1acfa0d6eda05c",
            "https://flu-crew.org/term/unknown",
            "baz",
        ),
    ]


def test_fasta_genbank_headers():
    # runtests.py:708-757: >MC123456\nATGGATGG + >MC123457||z\nATGGGATGGG
    rows = [["MC123456", "ATGGATGG"], ["MC123457", "", "z", "ATGGGATGGG"]]
    g = set()
    for row in rows:
        g |= _phrase_from_values(row, levels=None)
    got = _show(g)
    assert got == [
        (
            "https://flu-crew.org/id/mc123456",
            "https://flu-crew.org/term/chksum",
            "c0a0ebddc678651ab0bcbbb4276af291",
        ),
        (
            "https://flu-crew.org/id/mc123456",
            "https://flu-crew.org/term/dnaseq",
            "ATGGATGG",
        ),
        (
            "https://flu-crew.org/id/mc123456",
            "https://flu-crew.org/term/genbank_id",
            "MC123456",
        ),
        (
            "https://flu-crew.org/id/mc123457",
            "https://flu-crew.org/term/chksum",
            "460a05ce52afb5bf34785e743d485aff",
        ),
        (
            "https://flu-crew.org/id/mc123457",
            "https://flu-crew.org/term/dnaseq",
            "ATGGGATGGG",
        ),
        (
            "https://flu-crew.org/id/mc123457",
            "https://flu-crew.org/term/genbank_id",
            "MC123457",
        ),
        (
            "https://flu-crew.org/id/mc123457",
            "https://flu-crew.org/term/unknown",
            "z",
        ),
    ]
