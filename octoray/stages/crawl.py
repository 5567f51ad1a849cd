"""Snapshot-maintenance operators over a multi-snapshot crawl table
(url, warc_ts, snapshot, text) — the upkeep layer every recurring
web-scale ingest needs in front of the KG/training pipelines:

  latest_per_url   collapse re-crawls to each url's newest fetch (the
                   CDX dedup step): idempotent two-phase arg-max — a
                   per-block partial keeps one candidate row per
                   (block, url), ONE url-keyed range sort co-locates
                   the candidates, a block-local second pass finishes.
                   The all-to-all moves <= one slim (url, ts, md5) row
                   per block per url, never the text payload.
  crawl_delta      what changed between two snapshots (added /
                   removed / changed urls): both sides project to
                   (url, md5, side) and ride ONE shared url sort;
                   the per-url decision is a vectorized block-local
                   pivot (a url has <= 1 row per snapshot).
  domain_stats     per-domain fetch counts / distinct urls / bytes:
                   regex domain extraction (Arrow C kernel), map-side
                   partial aggregates so the shuffle moves one row per
                   (block, domain), plus a distinct (domain, url) pass
                   for the url count; combined with one distributed
                   sort-merge join (nothing driver-side).

All three lean on the sorted-block grouping family in query.py and
inherit its co-location guard (assert_block_colocation /
OCTORAY_CHECK_BLOCKS).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from octoray.query import combined_groupby_count, distinct_values, merge_join

from octoray.plan import colocated_sort

from octoray import plan

# Scheme match is case-insensitive (RFC 3986 schemes are; raw crawls
# carry 'HTTP://...') so un-canonicalized inputs don't silently fall
# through domain/path rules with a null domain.
_DOMAIN_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?P<domain>[^/]+)"


def _domain_of(urls: pa.Array) -> pa.Array:
    return pc.struct_field(pc.extract_regex(urls, _DOMAIN_RE), "domain")


def _md5_col(text: pa.Array) -> pa.Array:
    return pa.array(
        [hashlib.md5(t.encode("utf-8")).hexdigest() for t in text.to_pylist()],
        pa.string(),
    )


def _ts_us(col: pa.Array) -> pa.Array:
    """timestamp -> int64 epoch microseconds (the cross-engine-stable
    representation; DuckDB side is epoch_us(warc_ts))."""
    return pc.cast(col, pa.int64())


def latest_per_url(crawl, *, url_col: str = "url", ts_col: str = "warc_ts",
                   text_col: str = "text"):
    """(url, warc_ts_us, content_md5) of each url's newest fetch.

    Phase 1 (map-side combine): project every row to a slim candidate
    (url, ts, md5) and keep only the per-url max-ts row within the
    block — idempotent, so phase 2 (one range sort on url + the same
    block-local reduce) is globally exact.  Ties break on max md5 so
    the result is a pure function of the input set."""

    def project(t: pa.Table) -> pa.Table:
        slim = pa.table(
            {
                "url": t.column(url_col),
                "warc_ts_us": _ts_us(t.column(ts_col)),
                "content_md5": _md5_col(t.column(text_col)),
            }
        )
        return _block_latest(slim)

    def _block_latest(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        df = t.to_pandas()
        # vectorized per-url arg-max: sort puts the winner first, then
        # one drop_duplicates keeps it (C-level, no per-group dispatch)
        df = df.sort_values(
            ["url", "warc_ts_us", "content_md5"],
            ascending=[True, False, False],
            kind="mergesort",
        ).drop_duplicates("url", keep="first")
        return pa.Table.from_pandas(df, preserve_index=False).cast(t.schema)

    partial = crawl.map_batches(project, batch_format="pyarrow")
    return colocated_sort(partial, ["url"]).map_batches(
        _block_latest, batch_format="pyarrow", batch_size=None
    )


def crawl_delta(crawl, snap_a: int, snap_b: int, *, url_col: str = "url",
                text_col: str = "text", snap_col: str = "snapshot"):
    """(url, status) for urls that differ between two snapshots:
    'added' (only in b), 'removed' (only in a), 'changed' (both, text
    differs by md5).  Unchanged urls are dropped.

    One pass projects both snapshots to (url, side, md5) and one url
    sort co-locates a url's rows for a vectorized block-local pivot.
    Duplicate (url, snapshot) fetches collapse deterministically to
    the per-side max(md5) — the SQL twin applies the same collapse, so
    engine and oracle agree on multi-fetch inputs too."""

    def project(t: pa.Table) -> pa.Table:
        snaps = pc.cast(t.column(snap_col), pa.int64())
        sel = t.filter(
            pc.or_(pc.equal(snaps, snap_a), pc.equal(snaps, snap_b))
        )
        if sel.num_rows == 0:
            return pa.table(
                {"url": pa.array([], pa.string()),
                 "side": pa.array([], pa.string()),
                 "md5": pa.array([], pa.string())}
            )
        side = pc.if_else(
            pc.equal(pc.cast(sel.column(snap_col), pa.int64()), snap_a),
            pa.scalar("a"),
            pa.scalar("b"),
        )
        return pa.table(
            {
                "url": sel.column(url_col),
                "side": side,
                "md5": _md5_col(sel.column(text_col)),
            }
        )

    def decide(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"url": pa.array([], pa.string()),
                             "status": pa.array([], pa.string())})
        df = t.to_pandas()
        # '' marks "absent on this side" (md5 is never empty), keeping
        # the aggregated columns pure-string for the object max
        df["md5_a"] = df["md5"].where(df["side"] == "a", "")
        df["md5_b"] = df["md5"].where(df["side"] == "b", "")
        g = df.groupby("url", sort=False).agg(
            md5_a=("md5_a", "max"), md5_b=("md5_b", "max")
        )
        has_a, has_b = g["md5_a"] != "", g["md5_b"] != ""
        status = np.select(
            [~has_a & has_b, has_a & ~has_b, g["md5_a"] != g["md5_b"]],
            ["added", "removed", "changed"],
            default="same",
        )
        out = pd.DataFrame({"url": g.index, "status": status})
        out = out[out["status"] != "same"]
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            pa.schema([("url", pa.string()), ("status", pa.string())])
        )

    rows = crawl.map_batches(project, batch_format="pyarrow")
    return colocated_sort(rows, ["url"]).map_batches(
        decide, batch_format="pyarrow", batch_size=None
    )


def domain_stats(crawl, *, url_col: str = "url", text_col: str = "text"):
    """Per-domain crawl statistics Dataset: (domain, n_fetches, n_urls,
    total_chars), sorted by domain.  Fetch counts and char sums
    pre-aggregate map-side; the distinct-url count reuses the
    two-phase distinct; the two per-domain partial tables combine via
    the distributed sort-merge join (query.merge_join) — nothing ever
    lands on the driver, so ~1e8 real-web domains stream like any
    other keyed table."""

    def with_domain(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "domain": _domain_of(t.column(url_col)),
                "n_chars": pc.cast(pc.utf8_length(t.column(text_col)), pa.int64()),
            }
        )

    slim = crawl.map_batches(with_domain, batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["domain"], use_threads=False).aggregate(
            [([], "count_all"), ("n_chars", "sum")]
        )
        return g.rename_columns(["domain", "_n", "_chars"])

    per_block = slim.map_batches(partial, batch_format="pyarrow")

    def final_sums(t: pa.Table) -> pa.Table:
        g = t.group_by(["domain"], use_threads=False).aggregate(
            [("_n", "sum"), ("_chars", "sum")]
        )
        return g.rename_columns(["domain", "n_fetches", "total_chars"])

    # both metrics ride ONE tiny domain sort (partial rows only)
    metrics = colocated_sort(per_block, ["domain"]).map_batches(
        final_sums, batch_format="pyarrow", batch_size=None
    )

    def url_domain(t: pa.Table) -> pa.Table:
        return pa.table(
            {"domain": _domain_of(t.column(url_col)), "url": t.column(url_col)}
        )

    urls = distinct_values(
        crawl.map_batches(url_domain, batch_format="pyarrow"), ["domain", "url"]
    )
    n_urls = combined_groupby_count(urls, ["domain"], alias="n_urls")

    # both sides derive from the same rows, so their domain sets are
    # identical — inner merge == the outer join it replaces
    joined = merge_join(metrics, n_urls, ["domain"])
    return joined.select_columns(
        ["domain", "n_fetches", "n_urls", "total_chars"])


# URL canonicalization rule set (applied in order; shared verbatim
# with the SQL twin — both sides parse with the SAME regex grammar,
# not a url library, so equality is byte-exact):
#   1. scheme and host lowercased
#   2. fragment dropped
#   3. default port stripped (http:80, https:443)
#   4. tracking params dropped (utm_*, fbclid, gclid)
#   5. remaining query params sorted (whole 'k=v' string order)
#   6. trailing slashes collapsed; empty path -> '/'
# A string without a scheme://netloc prefix is returned unchanged.
_URL_RE = None
_TRACKING_RE = r"^(utm_[^=&]*|fbclid|gclid)(=|$)"


def canonical_url(u: str) -> str:
    import re

    global _URL_RE
    if _URL_RE is None:
        _URL_RE = re.compile(
            r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?"
        )
    m = _URL_RE.match(u)
    if not m:
        return u
    scheme = m.group(1).lower()
    host = m.group(2).lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    path = re.sub(r"/+$", "", m.group(3) or "")
    if path == "":
        path = "/"
    query = m.group(4) or ""
    parts = [p for p in query.split("&")
             if p and not re.match(_TRACKING_RE, p)]
    parts.sort()
    out = f"{scheme}://{host}{path}"
    if parts:
        out += "?" + "&".join(parts)
    return out


def normalize_urls(ds, *, url_col: str = "url"):
    """(url, url_canon) for every row — the canonicalization step in
    front of any url-keyed dedup/join.  Stateless streaming map (the
    per-row regex work is the op; no shuffle)."""

    def f(t: pa.Table) -> pa.Table:
        urls = t.column(url_col).to_pylist()
        return pa.table({
            "url": t.column(url_col),
            "url_canon": pa.array([canonical_url(u) for u in urls],
                                  pa.string()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


# Crawl-governance filter rules: first-match-wins (the robots.txt
# evaluation order), each rule (action, kind, pattern) with kind one
# of 'domain' (exact host or any subdomain), 'path_prefix' (on the
# path component), 'regex' (whole url).  A url matching no rule gets
# ``default``.  The SQL twin is generated from the SAME table.
DEFAULT_URL_RULES = [
    ("deny", "domain", "spam.example.org"),
    ("deny", "path_prefix", "/private"),
    ("allow", "domain", "example.org"),
    ("deny", "regex", r"\.(jpg|png|gif|css|js)$"),
]


def filter_urls(ds, *, rules=None, default: str = "allow",
                url_col: str = "url", keep_denied: bool = False):
    """(url, action) per row under first-match-wins rules; with
    ``keep_denied=False`` (default) only allowed rows survive, ready
    to feed the ingest/KG pipelines.  Evaluation is one vectorized
    mask per rule (rules are few, rows many): an int8 'decided' lane
    records the first matching rule's action."""
    import re

    rules = DEFAULT_URL_RULES if rules is None else rules

    def f(t: pa.Table) -> pa.Table:
        urls = t.column(url_col)
        # lowercase the host for rule matching: rule patterns are
        # lowercase and hostnames are case-insensitive, so raw
        # (un-canonicalized) urls still hit domain rules
        host = pc.utf8_lower(pc.fill_null(_domain_of(urls), ""))
        path = pc.struct_field(
            pc.extract_regex(
                pc.fill_null(urls, ""),
                r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(?P<path>[^?#]*)"),
            "path")
        path = pc.fill_null(path, "")
        n = t.num_rows
        action = np.full(n, default, dtype=object)
        undecided = np.ones(n, dtype=bool)
        for act, kind, pat in rules:
            if kind == "domain":
                m = pc.or_(
                    pc.equal(host, pat),
                    pc.ends_with(host, options=None, pattern="." + pat))
            elif kind == "path_prefix":
                m = pc.starts_with(path, pattern=pat)
            elif kind == "regex":
                m = pc.match_substring_regex(urls, pat)
            else:  # pragma: no cover
                raise ValueError(f"unknown rule kind {kind}")
            mask = np.asarray(pc.fill_null(m, False).to_numpy(
                zero_copy_only=False), dtype=bool)
            hit = mask & undecided
            action[hit] = act
            undecided &= ~mask
        out = t.append_column("action", pa.array(list(action), pa.string()))
        if not keep_denied:
            out = out.filter(pc.equal(out.column("action"), pa.scalar("allow")))
        return out

    return ds.map_batches(f, batch_format="pyarrow")


def per_domain_cap(crawl, *, n: int, url_col: str = "url"):
    """Crawl-curation quota: at most ``n`` DISTINCT urls per domain,
    deterministically the first ``n`` in url order.  Returns a
    (domain, url) Dataset.

    Two-phase combiner (same family as latest_per_url): the block-local
    pass distinct-sorts and keeps the first n per (block, domain) — a
    sound pre-prune because the global first-n is a subset of the union
    of per-block first-n — then ONE domain-keyed range sort co-locates
    the survivors and the SAME pass finishes exactly.  The shuffle
    moves at most n slim rows per (block, domain); page text never
    rides it."""

    def slim(t: pa.Table) -> pa.Table:
        return pa.table({
            "domain": pc.fill_null(_domain_of(t.column(url_col)), ""),
            "url": t.column(url_col),
        })

    def local_cap(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        df = t.to_pandas().drop_duplicates(["domain", "url"]).sort_values(
            ["domain", "url"], kind="mergesort")
        return pa.Table.from_pandas(
            df.groupby("domain", sort=False).head(n), preserve_index=False
        ).cast(t.schema)

    pre = crawl.map_batches(slim, batch_format="pyarrow").map_batches(
        local_cap, batch_format="pyarrow")
    return colocated_sort(pre, ["domain"]).map_batches(
        local_cap, batch_format="pyarrow", batch_size=None)


def crawl_schedule(crawl, *, url_col: str = "url"):
    """Politeness scheduling for the fetch frontier: every distinct
    url gets a WAVE number — its url-ordered rank within its domain —
    so a fetcher draining waves in order never hits the same host
    twice in one wave (the per-host spacing every polite crawler
    enforces; wave count == the domain's url count, so hot hosts
    stretch over many waves instead of bursting).

    Plan: slim (domain, url) rows -> block-local distinct (map-side
    combiner) -> ONE domain-keyed range sort -> block-local distinct +
    vectorized cumcount (equal domains share a block — the pinned
    invariant).  Returns (domain, url, wave), wave 1-based; the
    global fetch order is the implied (wave, domain, url) sort."""
    import numpy as np

    def slim(t: pa.Table) -> pa.Table:
        tbl = pa.table({
            "domain": pc.fill_null(_domain_of(t.column(url_col)), ""),
            "url": t.column(url_col),
        })
        import pandas as pd

        df = tbl.to_pandas().drop_duplicates(["domain", "url"])
        return pa.Table.from_pandas(df, preserve_index=False).cast(
            tbl.schema)

    def rank_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("wave", pa.array([], pa.int64()))
        df = t.to_pandas().drop_duplicates(["domain", "url"]).sort_values(
            ["domain", "url"], kind="mergesort")
        wave = df.groupby("domain", sort=False).cumcount().to_numpy() + 1
        df["wave"] = wave.astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    pre = crawl.map_batches(slim, batch_format="pyarrow")
    return colocated_sort(pre, ["domain"]).map_batches(
        rank_block, batch_format="pyarrow", batch_size=None)


def sql_crawl_schedule(src: str) -> str:
    """DuckDB twin of :func:`crawl_schedule` over the raw crawl dump."""
    return f"""
        WITH d AS (SELECT DISTINCT
                     regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1) AS domain,
                     url
                   FROM {src})
        SELECT domain, url,
               CAST(row_number() OVER (PARTITION BY domain
                                       ORDER BY url) AS BIGINT) AS wave
        FROM d
    """


def boilerplate_lines(crawl, *, min_urls: int = 3, sep: str = ". ",
                      url_col: str = "url", text_col: str = "text"):
    """Per-domain boilerplate detection: lines appearing on at least
    ``min_urls`` DISTINCT urls of the same domain — the site-template
    text (nav, footers, cookie banners) quality pipelines strip before
    training, detected at the host level the way production cleaners
    do it (a line frequent on ONE site is boilerplate even when it is
    globally rare; C4's global line dedup in stages/linededup.py is
    the corpus-wide complement).  Output: (domain, line, n_urls).

    Scale shape: explode to slim (domain, url, line) rows with a
    per-row within-page dedup at emission, ONE distinct exchange over
    (domain, line, url) to collapse re-fetches across snapshots, then
    a partial-combine count per (domain, line) — the corpus text
    itself never shuffles, only distinct line strings."""
    import pyarrow.compute as _pc

    from octoray.query import distinct_values, sorted_groupby_count

    def explode(t: pa.Table) -> pa.Table:
        doms = _domain_of(t.column(url_col)).to_pylist()
        urls = t.column(url_col).to_pylist()
        out_d: list = []
        out_u: list = []
        out_l: list = []
        for dom, url, text in zip(doms, urls,
                                  t.column(text_col).to_pylist()):
            for line in set(text.split(sep)):
                out_d.append(dom)
                out_u.append(url)
                out_l.append(line)
        return pa.table({"domain": pa.array(out_d, pa.string()),
                         "url": pa.array(out_u, pa.string()),
                         "line": pa.array(out_l, pa.string())})

    slim = distinct_values(
        crawl.map_batches(explode, batch_format="pyarrow"),
        ["domain", "line", "url"])
    counts = sorted_groupby_count(slim.select_columns(["domain", "line"]),
                                  ["domain", "line"], alias="n_urls")
    return counts.map_batches(
        lambda t: t.filter(_pc.greater_equal(t.column("n_urls"),
                                             pa.scalar(int(min_urls)))),
        batch_format="pyarrow")


def sql_boilerplate_lines(src: str, *, min_urls: int = 3,
                          sep: str = ". ") -> str:
    """DuckDB twin of boilerplate_lines over the same crawl rows."""
    s = sep.replace("'", "''")
    return f"""
        WITH x AS (SELECT regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1) AS domain,
                     url,
                     unnest(string_split(text, '{s}')) AS line
                   FROM {src}),
        l AS (SELECT DISTINCT domain, url, line FROM x)
        SELECT domain, line, count(DISTINCT url) AS n_urls
        FROM l GROUP BY domain, line
        HAVING count(DISTINCT url) >= {int(min_urls)}
    """


def strip_boilerplate(crawl, *, min_urls: int = 3, sep: str = ". ",
                      url_col: str = "url", snap_col: str = "snapshot",
                      text_col: str = "text",
                      broadcast_limit: int = plan.BROADCAST_ROWS):
    """Template-aware text cleaning: detect each domain's boilerplate
    lines (boilerplate_lines, >= ``min_urls`` distinct urls) and
    rebuild every fetch's text WITHOUT them — the cleaning step a
    production corpus pipeline runs between extraction and quality
    scoring.  Output: (url, snapshot, text_clean, n_lines, n_kept);
    fetches whose every line is template text vanish (same contract
    as line_dedup's all-duplicate docs).

    Scale shape: the boilerplate set rides the stats-gated anti-join
    (per-domain template vocabularies are small — bounded by the
    site's layout, not its page count — so it broadcasts at any real
    scale; the distributed join is the fallback); the corpus text
    shuffles ONCE, for the (url, snapshot) reassembly sort."""
    import pyarrow.compute as _pc

    from octoray.query import semi_join_auto

    boiler = boilerplate_lines(crawl, min_urls=min_urls, sep=sep,
                               url_col=url_col, text_col=text_col)

    def bkey(t: pa.Table) -> pa.Table:
        return pa.table({"bk": _pc.binary_join_element_wise(
            t.column("domain").cast(pa.string()),
            t.column("line").cast(pa.string()), "\x1f")})

    bkeys = boiler.map_batches(bkey, batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        doms = _domain_of(t.column(url_col)).to_pylist()
        out: dict = {"url": [], "snapshot": [], "line_no": [],
                     "n_lines": [], "line": [], "bk": []}
        for dom, url, snap, text in zip(
                doms, t.column(url_col).to_pylist(),
                t.column(snap_col).to_pylist(),
                t.column(text_col).to_pylist()):
            parts = text.split(sep)
            for j, line in enumerate(parts, start=1):
                out["url"].append(url)
                out["snapshot"].append(snap)
                out["line_no"].append(j)
                out["n_lines"].append(len(parts))
                out["line"].append(line)
                out["bk"].append(f"{dom}\x1f{line}")
        return pa.table({
            "url": pa.array(out["url"], pa.string()),
            "snapshot": pa.array(out["snapshot"], pa.int64()),
            "line_no": pa.array(out["line_no"], pa.int64()),
            "n_lines": pa.array(out["n_lines"], pa.int64()),
            "line": pa.array(out["line"], pa.string()),
            "bk": pa.array(out["bk"], pa.string()),
        })

    exploded = crawl.map_batches(explode, batch_format="pyarrow")
    kept = semi_join_auto(exploded, "bk", bkeys, key_col="bk", anti=True,
                          broadcast_limit=broadcast_limit)

    def rebuild_block(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return pd.DataFrame({"url": [], "snapshot": [],
                                 "text_clean": [], "n_lines": [],
                                 "n_kept": []})
        df = df.sort_values(["url", "snapshot", "line_no"],
                            kind="mergesort")
        g = df.groupby(["url", "snapshot"], sort=False)
        return pd.DataFrame({
            "text_clean": g["line"].agg(sep.join),
            "n_lines": g["n_lines"].first(),
            "n_kept": g.size(),
        }).reset_index()

    return colocated_sort(kept, ["url", "snapshot"]).map_batches(
        rebuild_block, batch_format="pandas", batch_size=None)


def sql_strip_boilerplate(src: str, *, min_urls: int = 3,
                          sep: str = ". ") -> str:
    """DuckDB twin of strip_boilerplate (boilerplate re-derived from
    the same rows, anti-joined out, text reassembled in line order)."""
    s = sep.replace("'", "''")
    dom = "regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1)"
    return f"""
        WITH sp AS (SELECT {dom} AS domain, url, snapshot,
                           string_split(text, '{s}') AS parts FROM {src}),
        x AS (SELECT domain, url, snapshot,
                     unnest(range(1, len(parts) + 1)) AS line_no,
                     parts, len(parts) AS n_lines FROM sp),
        l AS (SELECT domain, url, snapshot, line_no,
                     parts[line_no] AS line, n_lines FROM x),
        bd AS (SELECT DISTINCT domain, url, line FROM l),
        bl AS (SELECT domain, line FROM bd GROUP BY domain, line
               HAVING count(DISTINCT url) >= {int(min_urls)}),
        k AS (SELECT l.* FROM l LEFT JOIN bl
              ON l.domain = bl.domain AND l.line = bl.line
              WHERE bl.line IS NULL)
        SELECT url, snapshot,
               string_agg(line, '{s}' ORDER BY line_no) AS text_clean,
               any_value(n_lines) AS n_lines,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM k GROUP BY url, snapshot
    """


def recrawl_priority(crawl, *, url_col: str = "url",
                     snap_col: str = "snapshot", text_col: str = "text"):
    """Change-frequency re-crawl scheduling [Cho & Garcia-Molina 2003,
    "Estimating frequency of change"]: per url, how many of its
    successive fetches changed content — the signal a crawler uses to
    decide revisit intervals (fast-changing news pages hourly, static
    docs yearly).  Output: (url, n_fetches, n_changes, change_rate)
    with change_rate = n_changes / (n_fetches - 1) rounded half-up to
    6 decimals (0 for single-fetch urls).

    Scale shape: one slim (url, snapshot, md5) projection, ONE url
    range sort (a url has <= n_snapshots rows), block-local vectorized
    lag compare — the text payload never shuffles."""

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t.column(url_col),
            "snapshot": pc.cast(t.column(snap_col), pa.int64()),
            "md5": _md5_col(t.column(text_col)),
        })

    def decide(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return pd.DataFrame({
                "url": pd.Series([], dtype=object),
                "n_fetches": pd.Series([], dtype="int64"),
                "n_changes": pd.Series([], dtype="int64"),
                "change_rate": pd.Series([], dtype="float64")})
        df = df.sort_values(["url", "snapshot"], kind="mergesort")
        same_url = df["url"].eq(df["url"].shift())
        changed = same_url & df["md5"].ne(df["md5"].shift())
        g = df.groupby("url", sort=False)
        out = pd.DataFrame({
            "n_fetches": g.size().astype("int64"),
            "n_changes": changed.groupby(df["url"], sort=False)
            .sum().astype("int64"),
        }).reset_index()
        denom = (out["n_fetches"] - 1).clip(lower=1)
        rate = (out["n_changes"] / denom).where(out["n_fetches"] > 1, 0.0)
        out["change_rate"] = np.floor(rate * 1e6 + 0.5) / 1e6
        return out

    slim = crawl.map_batches(project, batch_format="pyarrow")
    return colocated_sort(slim, ["url"]).map_batches(decide, batch_format="pandas",
                                          batch_size=None)


def sql_recrawl_priority(src: str) -> str:
    """DuckDB twin of recrawl_priority over the same crawl rows."""
    return f"""
        WITH s AS (SELECT url, CAST(snapshot AS BIGINT) AS snapshot,
                          md5(text) AS m FROM {src}),
        l AS (SELECT url, m,
                     lag(m) OVER (PARTITION BY url ORDER BY snapshot)
                       AS pm FROM s),
        a AS (SELECT url, count(*) AS n_fetches,
                     CAST(sum(CASE WHEN pm IS NOT NULL AND m <> pm
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_changes
              FROM l GROUP BY url)
        SELECT url, n_fetches, n_changes,
               CASE WHEN n_fetches > 1 THEN
                 floor(n_changes * 1.0 / (n_fetches - 1) * 1000000 + 0.5)
                   / 1000000
               ELSE 0.0 END AS change_rate
        FROM a
    """
