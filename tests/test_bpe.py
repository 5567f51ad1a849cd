"""Distributed BPE training (stages/bpe.py): merges must match
hand-computed byte-pair-encoding on a tiny corpus, including the
greedy consecutive-pair semantics the sentinel encoding guarantees."""

import pyarrow as pa

from octoray.stages.bpe import EOW, US, _symbolize


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(2)


def _merge_pair(needle: str):
    mid = needle[1:-1].split(US + US)
    return tuple(mid)


def test_bpe_learns_expected_merges(ray_session):
    from octoray.stages.bpe import train_bpe

    # classic Sennrich corpus: "low" x5, "lowest" x2, "newer" x6
    texts = [" ".join(["low"] * 5 + ["lowest"] * 2 + ["newer"] * 6)]
    words, merges = train_bpe(_docs_ds(texts), n_merges=3)
    got = [_merge_pair(m) for m in merges]
    # pair counts: (l,o)=7, (o,w)=7, (e,r)=6, (n,e)=6, (w,e)=8* ...
    # recompute by hand: low: l-o-w-</w>; lowest: l-o-w-e-s-t-</w>;
    # newer: n-e-w-e-r-</w>
    # (l,o)=7 (o,w)=7 (w,</w>)=5 (w,e)=2+6=8 (e,s)=2 (s,t)=2
    # (t,</w>)=2 (n,e)=6 (e,w)=6 (e,r)=6 (r,</w>)=6
    assert got[0] == ("w", "e")          # count 8
    # after merging (w,e): (l,o)=7, (o,w)=5, (o,we)=2, (n,e)=6,
    # (e,we)=6, (we,r)=6, ... argmax = (l,o)=7
    assert got[1] == ("l", "o")
    # after that: (lo,w)=5, (lo,we)=2, tie at 6 among (e,we),(n,e),
    # (r,</w>),(we,r) -> lexicographic tie-break on the sentinel
    # pattern picks the smallest pair string
    assert len(got) == 3


def test_bpe_consecutive_pair_greedy(ray_session):
    from octoray.stages.bpe import train_bpe

    # word "aaaa": pairs (a,a)x3; greedy merge must produce aa+aa,
    # not aa+a+a (the sentinel replace is non-overlapping l-to-r)
    words, merges = train_bpe(_docs_ds(["aaaa aaaa aaaa"]), n_merges=2)
    assert _merge_pair(merges[0]) == ("a", "a")
    # after merge 1 the pairs (aa,aa) and (aa,</w>) tie at 3; the
    # deterministic tie-break is lexicographic on the sentinel
    # pattern, and '<' sorts before 'a' -> (aa, </w>) merges second
    assert _merge_pair(merges[1]) == ("aa", EOW)
    symb = {r["word"]: r["symb"] for r in words.take_all()}["aaaa"]
    syms = symb.strip(US).split(US + US)
    assert syms == ["aa", "aa" + EOW]


def test_symbolize_roundtrip():
    s = _symbolize("low")
    assert s.strip(US).split(US + US) == ["l", "o", "w", EOW]


def test_bpe_driver_path_equals_distributed(ray_session):
    from octoray.stages.bpe import train_bpe

    texts = [" ".join(["low"] * 5 + ["lowest"] * 2 + ["newer"] * 6),
             "low newer lows newest"]
    wd, md = train_bpe(_docs_ds(texts), n_merges=4)  # driver fast path
    wx, mx = train_bpe(_docs_ds(texts), n_merges=4, driver_limit=0)
    assert md == mx
    rows = lambda ds: sorted(
        (r["word"], r["n"], r["symb"]) for r in ds.take_all())
    assert rows(wd) == rows(wx)
