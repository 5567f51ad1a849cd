"""top_ngrams and tfidf_keywords: exactness + deterministic boundaries."""

import math

import pyarrow as pa
import ray.data as rd

from octoray.stages.tfidf import tfidf_keywords
from octoray.stages.vocab import top_ngrams


def _docs(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array(rows, pa.string()),
    }))


def test_top_ngrams_counts_and_tiebreak(ray_session):
    out = top_ngrams(
        _docs(["a b a b", "a b c", "c a"]), n=2, k=3).to_pandas()
    got = list(zip(out["gram"], out["count"]))
    # "a b": 3 (two in doc0 via overlap? no: "a b a b" has a b, b a, a b -> 2; doc1 1) = 3
    # "b a": 1, "b c": 1, "c a": 1 -> top-3 boundary broken by gram asc
    assert got[0] == ("a b", 3)
    assert got[1:] == [("b a", 1), ("b c", 1)]


def test_top_ngrams_k_larger_than_vocab(ray_session):
    out = top_ngrams(_docs(["x y"]), n=2, k=50).to_pandas()
    assert list(zip(out["gram"], out["count"])) == [("x y", 1)]


def test_tfidf_exact_scores(ray_session):
    # 3 docs; "rare" only in doc0, "common" in all
    out = tfidf_keywords(
        _docs(["rare common", "common other", "common other"]),
        k=2).to_pandas()
    d0 = out[out.doc_id == 0].set_index("token")["tfidf"]
    assert abs(d0["rare"] - round(math.log(3 / 1), 6)) < 1e-9
    # "common" has df=3 -> idf 0 -> score 0
    assert d0["common"] == 0.0
    # ranking: rare first for doc0
    assert list(out[out.doc_id == 0]["token"]) == ["rare", "common"]


def test_tfidf_k_bound(ray_session):
    out = tfidf_keywords(_docs(["a b c d e f", "a b"]), k=3).to_pandas()
    assert (out.groupby("doc_id").size() <= 3).all()


def test_inverted_index_postings_sorted(ray_session):
    from octoray.stages.vocab import inverted_index

    out = inverted_index(
        _docs(["b a", "a c", "a b"]), min_df=1).to_pandas().set_index("token")
    assert out.loc["a", "postings"] == "0+1+2" and out.loc["a", "df"] == 3
    assert out.loc["b", "postings"] == "0+2"
    assert out.loc["c", "postings"] == "1"


def test_inverted_index_min_df_prunes(ray_session):
    from octoray.stages.vocab import inverted_index

    out = inverted_index(_docs(["x y", "y z"]), min_df=2).to_pandas()
    assert list(out["token"]) == ["y"]
