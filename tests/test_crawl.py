"""Snapshot-maintenance operators (stages/crawl.py) + the
multi-snapshot crawl synthesizer (sources/crawl.py) + the unigram
log-probability quality scorer, each pinned against a driver-side
brute-force re-derivation at small scale."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
import pyarrow as pa

from octoray.sources.crawl import crawl_batch, crawl_dataset


def _md5(t: str) -> str:
    return hashlib.md5(t.encode()).hexdigest()


def test_crawl_batch_deterministic_under_splitting():
    """Synthesis is a pure function of (seed, row id): any batch
    partitioning produces identical rows."""
    ids = np.arange(0, 400)
    whole = crawl_batch(ids, seed=7, n_snapshots=3)
    parts = pa.concat_tables(
        [crawl_batch(ids[i:i + 37], seed=7, n_snapshots=3)
         for i in range(0, 400, 37)]
    )
    assert whole.equals(parts)


def test_crawl_content_versions_change_and_persist():
    """A page's text is byte-stable until a change event and differs
    after one; every (page, version) revision is itself stable."""
    rows = crawl_batch(np.arange(0, 300 * 4), seed=42, n_snapshots=4).to_pylist()
    by_url = defaultdict(list)
    for r in rows:
        by_url[r["url"]].append(r)
    changed = same = 0
    for url, fetches in by_url.items():
        fetches.sort(key=lambda r: r["snapshot"])
        for a, b in zip(fetches, fetches[1:]):
            if a["text"] == b["text"]:
                same += 1
            else:
                changed += 1
    assert changed > 0 and same > 0  # both behaviors present


def _crawl_rows(n_pages=250, snaps=4, seed=42):
    return crawl_batch(
        np.arange(0, n_pages * snaps), seed=seed, n_snapshots=snaps
    ).to_pylist()


def test_latest_per_url_matches_bruteforce(ray_session):
    from octoray.stages.crawl import latest_per_url

    rows = _crawl_rows()
    want = {}
    for r in rows:
        ts = r["warc_ts"].timestamp() if hasattr(r["warc_ts"], "timestamp") else r["warc_ts"]
        key = (r["warc_ts"], _md5(r["text"]))
        cur = want.get(r["url"])
        if cur is None or key > cur:
            want[r["url"]] = key
    got = latest_per_url(crawl_dataset(250, n_snapshots=4)).take_all()
    assert len(got) == len(want)
    for g in got:
        ts, m = want[g["url"]]
        assert g["content_md5"] == m
        # arrow timestamp us -> the int64 epoch-us projection
        import pandas as pd

        assert g["warc_ts_us"] == int(pd.Timestamp(ts).value // 1000)


def test_crawl_delta_matches_bruteforce(ray_session):
    from octoray.stages.crawl import crawl_delta

    rows = _crawl_rows()
    a = {r["url"]: _md5(r["text"]) for r in rows if r["snapshot"] == 0}
    b = {r["url"]: _md5(r["text"]) for r in rows if r["snapshot"] == 3}
    want = {}
    for url in set(a) | set(b):
        if url not in a:
            want[url] = "added"
        elif url not in b:
            want[url] = "removed"
        elif a[url] != b[url]:
            want[url] = "changed"
    got = {r["url"]: r["status"]
           for r in crawl_delta(crawl_dataset(250, n_snapshots=4), 0, 3).take_all()}
    assert got == want


def test_domain_stats_matches_bruteforce(ray_session):
    from octoray.stages.crawl import domain_stats

    rows = _crawl_rows()
    want = defaultdict(lambda: [0, set(), 0])
    for r in rows:
        dom = r["url"].split("://")[1].split("/")[0]
        s = want[dom]
        s[0] += 1
        s[1].add(r["url"])
        s[2] += len(r["text"])
    got = domain_stats(crawl_dataset(250, n_snapshots=4)).take_all()
    assert len(got) == len(want)
    doms = [g["domain"] for g in got]
    assert doms == sorted(doms)  # merge_join leaves it domain-sorted
    for g in got:
        n, urls, chars = want[g["domain"]]
        assert (g["n_fetches"], g["n_urls"], g["total_chars"]) == (n, len(urls), chars)


def test_unigram_logprob_paths_and_bruteforce(ray_session):
    """Broadcast and distributed-join paths agree with each other AND
    with a driver-side numpy re-derivation."""
    import math

    import ray.data as rd

    from octoray.stages.textops import unigram_logprob
    from octoray.util import round_half_up

    docs = pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "text": pa.array([
            "a b c", "a a b", "c c c c", "d", "a b c d e", "e e a",
            "", "b b b a",
        ], pa.string()),
    })
    counts = defaultdict(int)
    for t in docs.column("text").to_pylist():
        for w in t.split():
            counts[w] += 1
    total = sum(counts.values())
    want = {}
    for i, t in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()):
        toks = t.split()
        if not toks:
            continue
        lp = float(np.mean([math.log(counts[w] / total) for w in toks]))
        want[i] = (len(toks), round_half_up(pa.array([lp]), 6)[0].as_py())

    for limit in (2_000_000, 1):  # broadcast path, then forced join path
        got = {r["doc_id"]: (r["n_tokens"], r["mean_logprob"])
               for r in unigram_logprob(
                   rd.from_arrow(docs), broadcast_limit=limit).take_all()}
        assert got == want, f"limit={limit}"


def test_token_entropy_bruteforce(ray_session):
    import math

    import ray.data as rd

    from octoray.stages.textops import token_entropy
    from octoray.util import round_half_up_scalar

    texts = ["a a a a", "a b c d", "a a b b c", "", "x"]
    docs = pa.table({"doc_id": pa.array(list(range(len(texts))), pa.int64()),
                     "text": pa.array(texts, pa.string())})
    for parts in (1, 3):
        got = {r["doc_id"]: (r["n_tokens"], r["token_entropy"])
               for r in token_entropy(
                   rd.from_arrow(docs).repartition(parts)).take_all()}
        want = {}
        for i, t in enumerate(texts):
            toks = t.split()
            if not toks:
                continue
            n = len(toks)
            ent = -sum((c / n) * math.log(c / n)
                       for c in defaultdict(int, {}).values())
            cnt = defaultdict(int)
            for w in toks:
                cnt[w] += 1
            ent = -sum((c / n) * math.log(c / n) for c in cnt.values())
            want[i] = (n, round_half_up_scalar(ent, 6))
        assert got == want, f"parts={parts}"
    # uniform distribution maximizes entropy; constant minimizes
    assert got[1][1] > got[2][1] > got[0][1] == 0.0


def test_ngram_novelty_bruteforce(ray_session):
    """Novelty fractions match a brute-force gram count, independent
    of partitioning (the sorted run-scan must not split equal grams
    across blocks)."""
    import ray.data as rd

    from octoray.stages.textops import ngram_novelty

    k = 3
    shared = "one two three four"          # grams shared by docs 0/1
    texts = [shared + " alpha", shared + " beta",
             "u v w x y", "too short", ""]
    docs = pa.table({"doc_id": pa.array(list(range(len(texts))), pa.int64()),
                     "text": pa.array(texts, pa.string())})
    cnt = defaultdict(int)
    grams = {}
    for i, t in enumerate(texts):
        toks = t.split()
        gs = [" ".join(toks[j:j + k]) for j in range(len(toks) - k + 1)]
        grams[i] = gs
        for g in gs:
            cnt[g] += 1
    want = {}
    for i, gs in grams.items():
        if gs:
            nov = sum(1 for g in gs if cnt[g] == 1) / len(gs)
            want[i] = (len(gs), np.floor(nov * 1e6 + 0.5) / 1e6)
    for parts in (1, 4):
        got = {r["doc_id"]: (r["n_grams"], r["novelty"])
               for r in ngram_novelty(
                   rd.from_arrow(docs).repartition(parts), k=k).take_all()}
        assert got == want, f"parts={parts}"
    # the two shared-prefix docs are partially novel; the unique doc fully
    assert want[2][1] == 1.0 and 0 < want[0][1] < 1.0
    assert 3 not in want and 4 not in want  # short/empty docs dropped


def test_group_sample_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from octoray.query import group_sample, sql_group_sample

    rng = np.random.default_rng(4)
    n = 300
    docs = pa.table({
        "source": pa.array(rng.choice(["a", "b", "c"], size=n)),
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "n_chars": pa.array(rng.integers(1, 99, size=n), pa.int64()),
    })
    for parts in (1, 5):
        got = (group_sample(rd.from_arrow(docs).repartition(parts),
                            ["source"], "doc_id", 4)
               .to_pandas().sort_values(["source", "doc_id"])
               .reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", docs)
        want = (con.sql(sql_group_sample(
            "documents", ["source"], "doc_id", 4,
            ["source", "doc_id", "n_chars"])).df()
            .sort_values(["source", "doc_id"]).reset_index(drop=True))
        assert got.equals(want), f"parts={parts}"
        assert (got.groupby("source").size() == 4).all()


def test_normalize_text_matches_duckdb(ray_session):
    """Arrow NFC + whitespace collapse must equal the DuckDB twin on
    messy unicode (decomposed accents, ligatures untouched by NFC,
    tabs/newlines, leading/trailing runs)."""
    import duckdb
    import ray.data as rd

    from octoray.stages.textops import SQL_NORMALIZE_TEXT, normalize_text

    texts = ["école  \t deux", "  lead trail  ", "a\nb\r\nc",
             "café", "ﬁne ligature", "", "plain"]
    docs = pa.table({"doc_id": pa.array(list(range(len(texts))), pa.int64()),
                     "text": pa.array(texts, pa.string())})
    got = (normalize_text(rd.from_arrow(docs)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", docs)
    want = (con.sql(SQL_NORMALIZE_TEXT).df()
            .sort_values("doc_id").reset_index(drop=True))
    assert list(got["text_norm"]) == list(want["text_norm"])
    assert list(got["n_chars_norm"]) == list(want["n_chars_norm"])
    assert list(got["changed"]) == list(want["changed"])
    # NFC actually composed the decomposed accent
    assert got["text_norm"][0].startswith("école")


def test_dsir_weights_bruteforce_and_direction(ray_session):
    """DSIR importance weights match a driver-side re-derivation,
    are partition-invariant, and rank target-vocabulary docs above
    off-target docs."""
    import hashlib
    import math

    import ray.data as rd

    from octoray.stages.textops import dsir_weights

    B = 64
    texts = ["apple banana apple", "apple cherry", "dog cat dog cat",
             "cat mouse", "apple dog", ""]
    srcs = ["tgt", "tgt", "raw", "raw", "raw", "raw"]
    docs = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(srcs, pa.string()),
    })

    def bkt(w):
        return int.from_bytes(hashlib.md5(w.encode()).digest()[8:16],
                              "little") % B

    nt, nr = defaultdict(int), defaultdict(int)
    for t, s in zip(texts, srcs):
        for w in t.split():
            nr[bkt(w)] += 1
            if s == "tgt":
                nt[bkt(w)] += 1
    NT, NR = sum(nt.values()), sum(nr.values())
    lam_micro = {b: math.floor((math.log((nt.get(b, 0) + 1.0) / (NT + B))
                                - math.log((nr[b] + 1.0) / (NR + B)))
                               * 1e6 + 0.5)
                 for b in nr}
    want = {}
    for i, t in enumerate(texts):
        toks = t.split()
        if toks:
            want[i] = (len(toks),
                       sum(lam_micro[bkt(w)] for w in toks) / 1e6)

    for parts in (1, 4):
        got = {r["doc_id"]: (r["n_tokens"], r["dsir_logw"])
               for r in dsir_weights(
                   rd.from_arrow(docs).repartition(parts),
                   target_source="tgt", n_buckets=B).take_all()}
        assert got == want, f"parts={parts}"
    # direction: the all-target-vocab doc outranks the off-target doc
    assert want[0][1] > want[2][1]


def test_canonical_url_rules():
    from octoray.stages.crawl import canonical_url as c

    assert c("HTTP://Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag") == \
        "http://example.com/a/b?a=1&b=2"
    assert c("https://h:443/") == "https://h/"
    assert c("https://h:8080/p") == "https://h:8080/p"  # non-default kept
    assert c("https://h") == "https://h/"
    assert c("https://h/p///") == "https://h/p"
    assert c("https://h/p?fbclid=1&gclid") == "https://h/p"
    assert c("https://h/p?b=2&a=1&a=0") == "https://h/p?a=0&a=1&b=2"
    assert c("not a url") == "not a url"
    # '?' after '#' is part of the fragment, not a query
    assert c("https://h/p#f?x=1") == "https://h/p"


def test_normalize_urls_dataset(ray_session):
    import ray.data as rd

    from octoray.stages.crawl import canonical_url, normalize_urls

    urls = ["HTTPS://A.ORG:443/x/?utm_medium=m&k=v#z", "plain", "http://b/"]
    ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    got = {r["url"]: r["url_canon"] for r in normalize_urls(ds).take_all()}
    assert got == {u: canonical_url(u) for u in urls}


def test_filter_urls_first_match_wins(ray_session):
    import ray.data as rd

    from octoray.stages.crawl import filter_urls

    urls = [
        "https://spam.example.org/x",            # deny: domain
        "https://a.spam.example.org/x",          # deny: subdomain
        "https://site01.example.org/private/x",  # deny: path prefix
        "https://site01.example.org/page",       # allow: example.org
        "https://site01.example.org/pic.jpg",    # allow rule fires FIRST
        "https://other.com/pic.jpg",             # deny: regex
        "https://other.com/page",                # default allow
        "plain text",                            # default allow
    ]
    ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    got = {r["url"]: r["action"]
           for r in filter_urls(ds, keep_denied=True).take_all()}
    assert [got[u] for u in urls] == [
        "deny", "deny", "deny", "allow", "allow", "deny", "allow", "allow"]
    kept = filter_urls(
        rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))).count()
    assert kept == 4


def test_filter_urls_uppercase_scheme_and_host(ray_session):
    """Raw (un-canonicalized) urls with uppercase scheme/host still hit
    domain and path rules instead of silently falling through to the
    default action."""
    import ray.data as rd

    from octoray.stages.crawl import filter_urls

    urls = [
        "HTTP://spam.example.org/a",      # deny: domain rule
        "https://Example.ORG/ok",          # allow: domain rule
        "HTTPS://other.net/private/x",     # deny: path_prefix rule
    ]
    ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    got = {r["url"]: r["action"]
           for r in filter_urls(ds, keep_denied=True).take_all()}
    assert got == {urls[0]: "deny", urls[1]: "allow", urls[2]: "deny"}


def test_per_domain_cap_matches_bruteforce(ray_session):
    """First-n-per-domain quota: two-phase combiner result equals the
    driver-side re-derivation (distinct urls, url order, head n)."""
    from octoray.stages.crawl import per_domain_cap

    rows = _crawl_rows()
    by_dom = defaultdict(set)
    for r in rows:
        dom = r["url"].split("://")[1].split("/")[0]
        by_dom[dom].add(r["url"])
    want = {(d, u) for d, urls in by_dom.items()
            for u in sorted(urls)[:3]}
    got = {(r["domain"], r["url"])
           for r in per_domain_cap(
               crawl_dataset(250, n_snapshots=4), n=3).take_all()}
    assert got == want


def test_per_domain_cap_large_n_keeps_all(ray_session):
    import ray.data as rd

    from octoray.stages.crawl import per_domain_cap

    urls = ["https://a.org/1", "https://a.org/2", "https://b.org/1",
            "https://a.org/1"]  # duplicate collapses
    ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    got = sorted((r["domain"], r["url"])
                 for r in per_domain_cap(ds, n=99).take_all())
    assert got == [("a.org", "https://a.org/1"), ("a.org", "https://a.org/2"),
                   ("b.org", "https://b.org/1")]


def test_bigram_logprob_paths_and_bruteforce(ray_session):
    """Broadcast and distributed scoring paths agree, and both match
    a hand-computed bigram MLE on a tiny corpus."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from octoray.stages.textops import bigram_logprob

    texts = ["a b a b c", "b a", "c", ""]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(3)

    # corpus: unigrams a=3 b=3 c=2 (total 8); bigrams ab=2 ba=2 bc=1
    rows = {r["doc_id"]: (r["n_tokens"], r["mean_logprob"])
            for r in bigram_logprob(docs).take_all()}
    rows_d = {r["doc_id"]: (r["n_tokens"], r["mean_logprob"])
              for r in bigram_logprob(docs, broadcast_limit=0).take_all()}
    assert rows == rows_d
    assert set(rows) == {0, 1, 2}  # empty doc drops

    # hand computation: lefts a=2 ('a b' twice), b=3 ('b a' x2,'b c')
    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
    t0 = [math.log(3 / 8), math.log(2 / 2), math.log(2 / 3),
          math.log(2 / 2), math.log(1 / 3)]
    assert rows[0] == (5, r6(sum(t0) / 5))
    t1 = [math.log(3 / 8), math.log(2 / 3)]
    assert rows[1] == (2, r6(sum(t1) / 2))
    assert rows[2] == (1, r6(math.log(2 / 8)))


def test_crawl_schedule_waves(ray_session):
    """Waves are per-domain url-ordered ranks over distinct urls; no
    domain repeats inside a wave."""
    import pyarrow as pa
    import ray.data as rd

    from octoray.stages.crawl import crawl_schedule

    urls = ["http://a.com/2", "http://a.com/1", "http://b.com/x",
            "http://a.com/1", "http://b.com/y", "http://c.com/only"]
    ds = rd.from_arrow(pa.table({"url": pa.array(urls)}))
    out = crawl_schedule(ds).to_pandas().sort_values(
        ["domain", "url"]).reset_index(drop=True)
    got = list(zip(out["domain"], out["url"], out["wave"]))
    assert got == [
        ("a.com", "http://a.com/1", 1),
        ("a.com", "http://a.com/2", 2),
        ("b.com", "http://b.com/x", 1),
        ("b.com", "http://b.com/y", 2),
        ("c.com", "http://c.com/only", 1),
    ]
    # politeness invariant: a (wave, domain) pair appears once
    assert not out.duplicated(["wave", "domain"]).any()


def test_boilerplate_lines_brute(ray_session):
    import pandas as pd
    import ray.data as rd
    import pyarrow as pa

    from octoray.stages.crawl import boilerplate_lines

    rows = [
        ("https://a.org/1", "nav bar. unique one. footer"),
        ("https://a.org/2", "nav bar. unique two. footer"),
        ("https://a.org/3", "nav bar. unique three"),
        # re-fetch of /1 (same content): must not inflate url counts
        ("https://a.org/1", "nav bar. unique one. footer"),
        ("https://b.org/1", "nav bar. other site"),
    ]
    ds = rd.from_arrow(pa.table({
        "url": [r[0] for r in rows],
        "text": [r[1] for r in rows]}))
    out = (boilerplate_lines(ds, min_urls=2).to_pandas()
           .sort_values(["domain", "line"]).reset_index(drop=True))
    exp = pd.DataFrame({
        "domain": ["a.org", "a.org"],
        "line": ["footer", "nav bar"],
        "n_urls": pd.Series([2, 3], dtype="int64")})
    pd.testing.assert_frame_equal(out, exp)


def test_strip_boilerplate_hand(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from octoray.stages.crawl import strip_boilerplate

    rows = [
        ("https://a.org/1", 0, "nav. one. footer"),
        ("https://a.org/2", 0, "nav. two. footer"),
        ("https://a.org/3", 0, "nav. three"),
        ("https://b.org/1", 0, "nav. beta"),   # 'nav' not boiler on b.org
        ("https://a.org/4", 1, "nav"),          # all-boiler fetch vanishes
    ]
    ds = rd.from_arrow(pa.table({
        "url": [r[0] for r in rows],
        "snapshot": pa.array([r[1] for r in rows], pa.int64()),
        "text": [r[2] for r in rows]}))
    out = (strip_boilerplate(ds, min_urls=3).to_pandas()
           .sort_values(["url", "snapshot"]).reset_index(drop=True))
    exp = pd.DataFrame({
        "url": ["https://a.org/1", "https://a.org/2", "https://a.org/3",
                "https://b.org/1"],
        "snapshot": pd.Series([0, 0, 0, 0], dtype="int64"),
        "text_clean": ["one. footer", "two. footer", "three",
                       "nav. beta"],
        "n_lines": pd.Series([3, 3, 2, 2], dtype="int64"),
        "n_kept": pd.Series([2, 2, 1, 2], dtype="int64")})
    pd.testing.assert_frame_equal(out, exp)


def test_recrawl_priority_hand(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from octoray.stages.crawl import recrawl_priority

    rows = [
        ("u1", 0, "a"), ("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "b"),
        ("u2", 0, "x"), ("u2", 2, "y"),
        ("u3", 1, "z"),
    ]
    ds = rd.from_arrow(pa.table({
        "url": [r[0] for r in rows],
        "snapshot": pa.array([r[1] for r in rows], pa.int64()),
        "text": [r[2] for r in rows]}))
    out = (recrawl_priority(ds).to_pandas()
           .sort_values("url").reset_index(drop=True))
    exp = pd.DataFrame({
        "url": ["u1", "u2", "u3"],
        "n_fetches": pd.Series([4, 2, 1], dtype="int64"),
        "n_changes": pd.Series([1, 1, 0], dtype="int64"),
        "change_rate": [1 / 3 * 1e6 // 1 / 1e6 + 1e-6, 1.0, 0.0]})
    exp.loc[0, "change_rate"] = 0.333333
    pd.testing.assert_frame_equal(out, exp)
