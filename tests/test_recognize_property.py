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
