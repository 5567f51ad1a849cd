"""Property tests for the round-4 text operators: engine == DuckDB
twin on randomized inputs.

The NFC alphabet is restricted to stable, long-standardized ranges
(ASCII, Latin-1, combining diacritics, a few CJK) — DuckDB's utf8proc
and CPython's unicodedata may ship different Unicode versions, and
normalization of newly-assigned codepoints is the one place they may
legitimately disagree."""

import duckdb
import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import given, settings

_ALPHABET = (
    "ab c\t\n.!"                     # ascii + whitespace
    "éÅé"       # é, Å, e + combining acute
    "̀́̈"             # bare combining marks
    "中文"                   # CJK
    "ﬁ"                         # ﬁ ligature (NFC-invariant)
)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet=_ALPHABET, max_size=40),
                min_size=1, max_size=8))
def test_normalize_text_matches_duckdb_property(ray_session, texts):
    import ray.data as rd

    from octoray.stages.textops import SQL_NORMALIZE_TEXT, normalize_text

    docs = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = (normalize_text(rd.from_arrow(docs)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", docs)
    want = (con.sql(SQL_NORMALIZE_TEXT).df()
            .sort_values("doc_id").reset_index(drop=True))
    assert list(got["text_norm"]) == list(want["text_norm"])
    assert list(got["n_chars_norm"]) == list(want["n_chars_norm"])
    assert list(got["changed"]) == list(want["changed"])
