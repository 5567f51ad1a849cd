"""Entity-resolution family (stages/entity.py): edit-distance check,
symmetric-delete blocking completeness, component semantics, both
stats-gate paths, and the sameAs graph rewrite."""

from __future__ import annotations

import pyarrow as pa
import pytest

from octoray.stages.entity import (
    _edit_leq1,
    canonicalize_graph,
    fuzzy_pairs,
    resolve_entities,
)


def test_edit_leq1_exact():
    # brute-force cross-check against a tiny DP implementation
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    vocab = ["", "a", "ab", "ba", "abc", "abd", "acb", "abcd", "xabc",
             "abcc", "aabc", "bc", "ac", "abca", "zz"]
    for a in vocab:
        for b in vocab:
            assert _edit_leq1(a, b) == (lev(a, b) <= 1), (a, b)


def _mentions(names):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "mention_id": pa.array(range(len(names)), pa.int64()),
                "name": pa.array(names, pa.string()),
            }
        )
    )


def test_fuzzy_pairs_blocking_complete(ray_session):
    # every true distance-<=1 pair (over distinct norms) must surface —
    # substitutions, deletions, insertions, and case folds
    names = ["Iowa", "iowa", "Ioa", "Iowwa", "Minnesota", "minesota",
             "Texas", "texas", "Berlin"]
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_pairs(_mentions(names)).take_all()
    }
    # distinct-norm reps: iowa->0, ioa->2, iowwa->3, minnesota->4,
    # minesota->5, texas->6, berlin->8
    assert got == {(0, 2), (0, 3), (4, 5)}


def test_resolve_entities_transitive(ray_session):
    # Ioa -- iowa -- Iowwa chain: distance 2 endpoints still share a
    # component via the middle node
    names = ["Ioa", "iowa", "Iowwa", "Berlin"]
    out = resolve_entities(_mentions(names)).take_all()
    assert [r["canonical_id"] for r in out] == [0, 0, 0, 3]


def test_resolve_entities_gate_paths_equal(ray_session):
    names = ["Iowa", "iowa", "Ioa", "Minnesota", "Minesota", "Texas"]
    a = resolve_entities(_mentions(names)).take_all()
    b = resolve_entities(_mentions(names), broadcast_limit=0).take_all()
    assert a == b
    assert [r["canonical_id"] for r in a] == [0, 0, 0, 3, 3, 5]


def test_max_block_cap_skips_degenerate(ray_session):
    # 5 identical-after-norm names collapse to ONE rep before blocking,
    # so the cap (which counts distinct norms) does not fire on heavy
    # exact duplication
    names = ["dup", "DUP", "Dup", "duP", "dup", "other"]
    out = resolve_entities(_mentions(names)).take_all()
    assert [r["canonical_id"] for r in out] == [0, 0, 0, 0, 0, 5]


def _graph():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "subject": ["fid:a", "fid:b", "fid:c", "fid:a", "fid:d"],
                "predicate": ["f:host", "f:host", "f:host", "f:ref", "f:ref"],
                "object": ["swine", "swine", "human", "fid:b", "fid:c"],
                "object_datatype": ["string", "string", "string", "uri", "uri"],
            }
        )
    )


def _pairs(rows):
    import ray.data as rd

    a, b = zip(*rows)
    return rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array(list(a), pa.string()),
                "id_b": pa.array(list(b), pa.string()),
            }
        )
    )


def test_canonicalize_graph_rewrite_and_dedup(ray_session):
    out = canonicalize_graph(_graph(), _pairs([("fid:a", "fid:b")])).take_all()
    rows = {tuple(r.values()) for r in out}
    # b folded into a: host triple deduped, uri object rewritten;
    # literal objects untouched
    assert rows == {
        ("fid:a", "f:host", "swine", "string"),
        ("fid:a", "f:ref", "fid:a", "uri"),
        ("fid:c", "f:host", "human", "string"),
        ("fid:d", "f:ref", "fid:c", "uri"),
    }


def test_canonicalize_graph_gate_paths_equal(ray_session):
    p = _pairs([("fid:a", "fid:b"), ("fid:c", "fid:d")])
    a = canonicalize_graph(_graph(), p).take_all()
    b = canonicalize_graph(_graph(), p, broadcast_limit=0).take_all()
    assert a == b


def test_string_id_components(ray_session):
    # dup_components now follows the input id dtype (string URIs)
    from octoray.stages.dedup import dup_components

    comp = dup_components(_pairs([("u:b", "u:a"), ("u:c", "u:b")])).take_all()
    m = {r["id"]: r["component"] for r in comp}
    assert m == {"u:a": "u:a", "u:b": "u:a", "u:c": "u:a"}


def test_mixture_resample_semantics(ray_session):
    import hashlib

    import ray.data as rd

    from octoray.stages.textops import mixture_resample

    t = pa.table(
        {
            "doc_id": pa.array(range(200), pa.int64()),
            "source": pa.array(
                ["s0" if i % 2 == 0 else "s1" for i in range(200)], pa.string()
            ),
        }
    )
    out = mixture_resample(
        rd.from_arrow(t), {"s0": 0.0, "s1": 0.5}, default_rate=1.0
    ).take_all()
    assert all(r["source"] == "s1" for r in out)  # zero-rate drops all
    for r in out:
        frac = int(
            hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16
        ) / 4294967296.0
        assert frac < 0.5
    # deterministic under re-execution
    out2 = mixture_resample(
        rd.from_arrow(t), {"s0": 0.0, "s1": 0.5}, default_rate=1.0
    ).take_all()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in out2)


def test_fuzzy_pairs_property_vs_bruteforce(ray_session):
    """Hypothesis: over random short alphabets (high collision rate),
    the blocked pipeline emits EXACTLY the brute-force set of
    distinct-norm pairs at edit distance <= 1 — the completeness claim
    of symmetric-delete blocking, end to end through Ray."""
    from hypothesis import given, settings, strategies as st

    name = st.text(alphabet="abAB", min_size=1, max_size=5)

    @settings(max_examples=15, deadline=None)
    @given(st.lists(name, min_size=2, max_size=25))
    def run(names):
        norms = sorted(set(n.lower() for n in names))
        # min mention id per norm, as _norm_reps computes it
        rep = {}
        for i, n in enumerate(names):
            rep.setdefault(n.lower(), i)
        want = set()
        for i, a in enumerate(norms):
            for b in norms[i + 1:]:
                if _edit_leq1(a, b):
                    ra, rb = rep[a], rep[b]
                    want.add((min(ra, rb), max(ra, rb)))
        got = {
            (r["id_a"], r["id_b"])
            for r in fuzzy_pairs(_mentions(names)).take_all()
        }
        assert got == want, (names, got, want)

    run()


def test_link_mentions_basic(ray_session):
    """Exact hit (dist 0), edit-1 hit (dist 1), miss (nulls), and the
    min-distance-then-min-entity-id tie-break."""
    import ray.data as rd

    from octoray.stages.entity import link_mentions

    lex = rd.from_arrow(pa.table({
        "entity_id": pa.array(["e:ohio", "e:iowa", "e:iowa2"]),
        "name": pa.array(["Ohio", "Iowa", "Iowaa"]),
    }))
    m = rd.from_arrow(pa.table({
        "mention_id": pa.array([1, 2, 3, 4], pa.int64()),
        "name": pa.array(["ohio", "Iowa!", "texas", "IOWAA"]),
    }))
    out = {r["mention_id"]: (r["entity_id"], r["dist"])
           for r in link_mentions(m, lex, concurrency=2).take_all()}
    assert out[1] == ("e:ohio", 0)          # exact (case-folded)
    assert out[2] == ("e:iowa", 1)          # edit-1 (trailing '!')
    assert out[3] == (None, None)           # nothing within distance 1
    # 'iowaa' is exact for e:iowa2 AND edit-1 for e:iowa: dist wins
    assert out[4] == ("e:iowa2", 0)


def test_link_mentions_tie_break_min_entity(ray_session):
    """Two lexicon entries at the same distance: min entity_id wins."""
    import ray.data as rd

    from octoray.stages.entity import link_mentions

    lex = rd.from_arrow(pa.table({
        "entity_id": pa.array(["e:b", "e:a"]),
        "name": pa.array(["abcd", "abce"]),
    }))
    m = rd.from_arrow(pa.table({
        "mention_id": pa.array([1], pa.int64()),
        "name": pa.array(["abcf"]),  # distance 1 from both
    }))
    (row,) = link_mentions(m, lex, concurrency=2).take_all()
    assert (row["entity_id"], row["dist"]) == ("e:a", 1)


def test_link_mentions_property_vs_bruteforce(ray_session):
    """Hypothesis: linking equals the brute-force min(dist)-then-
    min(entity) pick over every (mention, lexicon) pair."""
    from hypothesis import given, settings, strategies as st
    import ray.data as rd

    from octoray.stages.entity import link_mentions

    word = st.text(alphabet="abc", min_size=1, max_size=4)

    @settings(max_examples=10, deadline=None)
    @given(st.lists(word, min_size=1, max_size=8, unique=True),
           st.lists(word, min_size=1, max_size=8))
    def run(lex_names, mention_names):
        lex = rd.from_arrow(pa.table({
            "entity_id": pa.array([f"e:{i}" for i in range(len(lex_names))]),
            "name": pa.array(lex_names),
        }))
        m = rd.from_arrow(pa.table({
            "mention_id": pa.array(list(range(len(mention_names))), pa.int64()),
            "name": pa.array(mention_names),
        }))
        got = {r["mention_id"]: (r["entity_id"], r["dist"])
               for r in link_mentions(m, lex, concurrency=2).take_all()}
        for mid, nm in enumerate(mention_names):
            best = None
            for i, ln in enumerate(lex_names):
                if nm.lower() == ln.lower():
                    d = 0
                elif _edit_leq1(nm.lower(), ln.lower()):
                    d = 1
                else:
                    continue
                key = (d, f"e:{i}")
                if best is None or key < best:
                    best = key
            want = (best[1], best[0]) if best else (None, None)
            assert got[mid] == want, (nm, got[mid], want)

    run()


def _scratch_norm_map(names):
    """Brute-force from-scratch norm -> canonical map (min mention id
    over the edit-<=1 connected component)."""
    rep = {}
    for i, n in enumerate(names):
        rep.setdefault(n.lower(), i)
    norms = sorted(rep)
    parent = {rep[n]: rep[n] for n in norms}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(norms):
        for b in norms[i + 1:]:
            if _edit_leq1(a, b):
                ra, rb = find(rep[a]), find(rep[b])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return {n: find(rep[n]) for n in norms}


def _run_incremental(names_a, names_b, tmpdir):
    import ray.data as rd

    from octoray.stages.entity import (resolve_incremental,
                                       resolve_store_build)

    off = len(names_a)
    m1 = rd.from_arrow(pa.table({
        "mention_id": pa.array(list(range(off)), pa.int64()),
        "name": pa.array(names_a)}))
    m2 = rd.from_arrow(pa.table({
        "mention_id": pa.array([off + i for i in range(len(names_b))],
                               pa.int64()),
        "name": pa.array(names_b)}))
    resolve_store_build(m1, tmpdir)
    out = resolve_incremental(m2, tmpdir)
    return {r["norm"]: r["canonical_id"] for r in out.take_all()}


def test_incremental_equals_scratch(ray_session, tmp_path):
    """Known norms, novel norms, novel-old links: the updated store
    equals from-scratch re-clustering over the union."""
    a = ["iowa", "ohio", "texas", "iowa"]          # ids 0..3
    b = ["iowa", "iowaa", "kansas", "ohio!"]       # ids 4..7
    got = _run_incremental(a, b, str(tmp_path / "s1"))
    want = _scratch_norm_map(a + b)
    assert got == want
    # novel "iowaa" joins iowa's cluster; "ohio!" joins ohio's
    assert got["iowaa"] == got["iowa"] == 0
    assert got["ohio!"] == got["ohio"] == 1


def test_incremental_bridge_merges_old_clusters(ray_session, tmp_path):
    """A NEW mention within distance 1 of two previously-separate
    clusters merges them — including their untouched members — to the
    from-scratch label."""
    a = ["abcd", "abce", "xbcf", "ybcf"]   # clusters {abcd,abce} {xbcf,ybcf}
    b = ["abcf"]                           # bridges both
    got = _run_incremental(a, b, str(tmp_path / "s2"))
    want = _scratch_norm_map(a + b)
    assert got == want
    assert len({got[n] for n in ["abcd", "abce", "xbcf", "ybcf", "abcf"]}) == 1
    assert got["ybcf"] == 0   # untouched old member relabeled to the min


def test_incremental_no_novel(ray_session, tmp_path):
    """An increment of only known norms is a pure lookup — store
    unchanged."""
    a = ["iowa", "ohio"]
    b = ["IOWA", "ohio"]
    got = _run_incremental(a, b, str(tmp_path / "s3"))
    assert got == {"iowa": 0, "ohio": 1}


def test_incremental_property_vs_scratch(ray_session, tmp_path):
    """Hypothesis: random split of random short names — incremental
    always equals from-scratch."""
    from hypothesis import given, settings, strategies as st

    word = st.text(alphabet="abc", min_size=1, max_size=4)

    counter = [0]

    @settings(max_examples=8, deadline=None)
    @given(st.lists(word, min_size=1, max_size=10),
           st.lists(word, min_size=1, max_size=6))
    def run(names_a, names_b):
        counter[0] += 1
        d = str(tmp_path / f"p{counter[0]}")
        got = _run_incremental(names_a, names_b, d)
        want = _scratch_norm_map(names_a + names_b)
        assert got == want, (names_a, names_b, got, want)

    run()
