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


def test_oov_rate_bruteforce(ray_session):
    """oov_rate matches a brute-force python re-derivation, including
    the deterministic (count desc, token asc) vocab boundary and the
    zero-token-doc omission."""
    import collections

    import pyarrow as pa
    import ray.data as rd

    from octoray.stages.vocab import oov_rate

    texts = ["the cat sat", "the the dog", "  ", "zz yy xx the",
             "cat dog zz", ""]
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts)}))
    V = 3
    cnt = collections.Counter(w for t in texts for w in t.split())
    vocab = {w for w, _ in sorted(cnt.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:V]}
    want = {}
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            continue
        no = sum(1 for w in toks if w not in vocab)
        want[i] = (len(toks), no, no / len(toks))
    out = oov_rate(ds, vocab_size=V).to_pandas()
    got = {int(r.doc_id): (int(r.n_tokens), int(r.n_oov), float(r.oov_rate))
           for r in out.itertuples()}
    assert got == want


def test_winnow_brute_and_guarantee(ray_session):
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from octoray.stages.textops import winnow_fingerprints

    k, w = 4, 3
    rng = np.random.default_rng(11)
    alpha = "abcd "
    shared = "zqxwvy common block yzk"  # len 23 >= w+k-1
    docs = []
    for i in range(8):
        s = "".join(rng.choice(list(alpha), size=40))
        t = "".join(rng.choice(list(alpha), size=40))
        docs.append((f"d{i}", s + (shared if i % 2 == 0 else "") + t))
    ds = rd.from_arrow(pa.table({
        "doc_id": [d[0] for d in docs],
        "text": [d[1] for d in docs]}))
    out = winnow_fingerprints(ds, k=k, w=w).to_pandas()

    def brute(text):
        import re as _re

        t = _re.sub(r"\s+", " ", text).lower()
        n_grams = len(t) - k + 1
        if n_grams < w:
            return set()
        hs = [int.from_bytes(
            hashlib.md5(t[j:j + k].encode()).digest()[8:16], "little")
            for j in range(n_grams)]
        sel = set()
        for s in range(n_grams - w + 1):
            win = hs[s:s + w]
            m = min(win)
            sel.add(s + max(j for j, v in enumerate(win) if v == m))
        return {hs[p] for p in sel}

    got = {d: set(g["fp"]) for d, g in out.groupby("doc_id")}
    for did, text in docs:
        assert got.get(did, set()) == brute(text), did
    # winnowing guarantee: docs sharing the block share >= 1 fingerprint
    assert got["d0"] & got["d2"] & got["d4"] & got["d6"]


def test_lm_quality_select_partitions(ray_session):
    """The LM quality cut keeps exactly the top 3 of 4 NTILE buckets:
    kept count == n - ntile1 size, kept scores are >= every dropped
    score (ties broken by id), and tiers are 2..4."""
    import ray.data as rd

    from octoray.stages.textops import bigram_logprob, lm_quality_select

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    all_scores = {r["doc_id"]: r["mean_logprob"]
                  for r in bigram_logprob(docs).take_all()}
    kept = lm_quality_select(docs).take_all()
    n = len(all_scores)
    tile1 = n // 4 + (1 if n % 4 else 0)
    assert len(kept) == n - tile1
    assert {r["tier"] for r in kept} <= {2, 3, 4}
    kept_ids = {r["doc_id"] for r in kept}
    dropped = sorted((v, k) for k, v in all_scores.items()
                     if k not in kept_ids)
    worst_kept = min((all_scores[i], i) for i in kept_ids)
    assert dropped[-1] < worst_kept  # strict (score, id) order boundary
