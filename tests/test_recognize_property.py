"""Property-based robustness of the recognizer/emission layer: no
input string may crash classification, emission, or the page scanner —
at crawl scale every weird byte sequence eventually shows up."""

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from octoray import emit, recognize as R

weird = st.text(min_size=0, max_size=40)
fluish = st.sampled_from([
    "A/swine/Iowa/A01234567/2015", "H1N1", "2015-03-15", "EPI_ISL_123",
    "MG123456", "1A.1.1", "swine", "Iowa", "PB2", "ACGTACGTACGTACGTACGTACGT",
    "", " ", "A/", "//", "H1N1)", "(mixed", "31/31/9999", "A0"
])
field = st.one_of(weird, fluish)


@settings(max_examples=200, deadline=None)
@given(s=field)
def test_cast_datum_total(s):
    c = R.cast_datum(s)
    assert c.name in R.BY_NAME or c in R.ALL_CLASSIFIERS or c is R.UNKNOWN or c is R.MISSING
    # clean() must also be total for the winning classifier
    c.clean(s)


@settings(max_examples=60, deadline=None)
@given(fields=st.lists(field, min_size=0, max_size=8))
def test_connect_total(fields):
    mentions = [emit.make_mention(R.cast_datum(x), x) for x in fields]
    triples = emit.connect(mentions, levels=None)
    for s, p, o, dt in triples:
        assert isinstance(s, str) and s
        assert p.split(":")[0] in ("f", "owl", "rdfs")
        assert isinstance(o, str)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(text=st.text(min_size=0, max_size=300))
def test_scanner_total(text):
    from octoray.stages.scan import MentionEmitter

    em = _EMITTER
    em.emit_page("u", text)


_EMITTER = None


def setup_module(module):
    from octoray.stages.scan import MentionEmitter

    module._EMITTER = MentionEmitter()


@settings(max_examples=200, deadline=None)
@given(s=field)
def test_cast_datum_first_match_priority(s):
    """The cascade semantic pinned as a property: the winner is exactly
    the FIRST classifier in ALL_CLASSIFIERS registry order whose
    test_one is truthy (Datum.cast, reference classes.py:85-92) — and
    repeated casts are deterministic."""
    c = R.cast_datum(s)
    assert R.cast_datum(s) is c
    if s == "":
        assert c is R.MISSING
        return
    for cand in R.ALL_CLASSIFIERS:
        m = cand.test_one(s)
        if m is not None and m != "":
            assert c is cand
            return
    assert c is R.UNKNOWN


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(st.lists(field, min_size=3, max_size=3), min_size=1, max_size=30),
    cut=st.integers(min_value=0, max_value=29),
)
def test_vote_types_invariant_under_batch_split(rows, cut):
    """The distributed column vote must not depend on where batch
    boundaries fall: counting hits over [rows] equals counting over
    [rows[:cut]] + [rows[cut:]] (A8; the driver-side argmax consumes
    only summed counts)."""
    cut = min(cut, len(rows))
    cols = ["c0", "c1", "c2"]

    def counts(chunks):
        agg = {}
        for chunk in chunks:
            if not chunk:
                continue
            for j, col in enumerate(cols):
                vals = [r[j] for r in chunk]
                present = [x for x in vals if x is not None and x != ""]
                for c in R.ALL_CLASSIFIERS:
                    if c.is_sequence:
                        h = sum(1 for x in present
                                if len(str(x)) > 20 and c.test_one(x))
                    else:
                        h = sum(1 for x in present if c.test_one(x) is not None)
                    k = (col, c.name)
                    agg[k] = tuple(
                        a + b for a, b in zip(agg.get(k, (0, 0, 0)),
                                              (h, len(vals), len(present))))
        return agg

    assert counts([rows]) == counts([rows[:cut], rows[cut:]])


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(text=st.text(min_size=0, max_size=200))
def test_emitter_cache_equivalence(text):
    """The per-actor span->Mention memo must be semantics-preserving:
    a cached emitter and a cache-cold emitter emit identical triple
    sets for the same page."""
    from octoray.stages.scan import MentionEmitter

    cold = MentionEmitter()
    cold._mcache.clear()
    warm = _EMITTER  # long-lived, cache populated by earlier examples
    assert set(warm.emit_page("u", text)) == set(cold.emit_page("u", text))
