"""Deterministic Common-Crawl-style page synthesis (BASELINE.json input_hint).

Produces the engine's primary input table

    (url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

plus, on request, per-page ground-truth mention fields so the golden
harness can compute P/R of the scan->emit path against the reference
emitter semantics (BASELINE.md correctness gate).

Everything is derived from a 64-bit mix of (seed, page_id) — no global
RNG state — so synthesis is identical regardless of batch boundaries,
parallelism, or which Ray worker generates a given page.  At cluster
scale the same code runs inside ``map_batches`` over a ``range``
dataset: generation is embarrassingly parallel and streams.

The embedded mention vocabulary draws from the reference's own domains
(strain grammar domain_flu.py:168-216, barcodes domain_identifier.py:4-5,
dates domain_date.py, geography domain_geography.py) so the recognizer
layer is exercised end-to-end.
"""

from __future__ import annotations

import html as _html
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

# --- deterministic splitmix64 -------------------------------------------
_MASK = (1 << 64) - 1


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_MASK)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(_MASK)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(_MASK)
    return x ^ (x >> np.uint64(31))


def _streams(page_ids: np.ndarray, seed: int, n_streams: int) -> np.ndarray:
    """(n_pages, n_streams) independent uint64 draws per page."""
    base = _mix(page_ids.astype(np.uint64) ^ np.uint64((seed * 0x9E3779B9) & _MASK))
    cols = [
        _mix(base ^ np.uint64((k * 0xA24BAED4963EE407) & _MASK))
        for k in range(1, n_streams + 1)
    ]
    return np.stack(cols, axis=1)


# --- vocabularies -------------------------------------------------------
HOSTS = ["swine", "human"]
STATES = [
    "Iowa", "Minnesota", "North Carolina", "Illinois", "Indiana",
    "Oklahoma", "Texas", "Nebraska", "Ohio", "Missouri", "Kansas",
    "South Dakota", "North Dakota", "Wyoming", "Michigan",
]
COUNTRIES = [
    "Canada", "Mexico", "China", "Japan", "Germany", "Brazil",
    "Vietnam", "Thailand", "Denmark", "Spain",
]
SUBTYPES = ["H1N1", "H3N2", "H1N2", "H1N1v", "H3N2v", "H1huN1", "mixed"]
GLOBAL_CLADES = ["1A.1.1", "1A.2", "1A.3.3.2", "1B.2.1", "1B.2.2", "3.1990.4.1"]
PLACES = [
    "Iowa", "Minnesota", "Nebraska", "Ohio", "Texas", "Indiana",
    "Oklahoma", "Kansas", "Missouri", "Illinois", "Alberta",
    "Ontario", "New_Jersey", "North_Carolina", "South_Dakota",
]
# distractor words: no digits, no host/geo/flu vocabulary collisions
FILLER = (
    "the influenza surveillance report describes ongoing monitoring of "
    "respiratory pathogens across regional veterinary diagnostic "
    "laboratories with emphasis on molecular characterization and "
    "phylogenetic context for submitted specimens collected during "
    "routine sampling programs"
).split()

_MONTH_ABBR = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_MONTH_FULL = [
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
]

# fixed url grammar: prefix + zero-padded 12-digit page id.  The
# sharded build recovers (page_id -> shard) from the url tail, so the
# id width and prefix length are load-bearing.
URL_PREFIX = "https://crawl.example.org/flu/"

# external outlink hosts (the cross-domain tail every real crawl has)
LINK_SITES = [
    "news.example.net", "data.example.com", "vet.example.net",
    "atlas.example.org", "journal.example.com", "labs.example.net",
    "archive.example.org", "wiki.example.com",
]
# internal link-target universe.  FIXED (not the current page count) so
# a page's html is identical no matter what corpus size it was
# synthesized into (the batch-boundary/pages_batch==page_record pinned
# invariants).  Targets are drawn with a hub-skewed mix — ~1/4 of
# internal links land on 16 super-hub ids, ~5/16 on a 4096-id head —
# so the link graph has
# the power-law in-degree shape real web graphs have (the hot-key-skew
# case the north rule names) while the uniform tail mostly dangles at
# small synthesis scales, exactly like a partial crawl.
LINK_UNIVERSE = 1 << 20


def _sm(x: int) -> int:
    """Scalar splitmix64 finalizer (python-int twin of _mix)."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return (x ^ (x >> 31)) & _MASK


def page_links(page_id: int) -> List[Tuple[str, str]]:
    """Deterministic (href, anchor) outlinks for one page — a pure
    function of the page id, independent of seed/corpus size."""
    lb = _sm(page_id ^ 0x11C8A5F0D3B2E679)
    out: List[Tuple[str, str]] = []
    for k in range(lb % 5):  # 0..4 links; ~20% of pages link nowhere
        h = _sm(lb ^ (((k + 1) * 0xA24BAED4963EE407) & _MASK))
        u = h >> 16
        if h % 4 == 0:  # external outlink
            site = LINK_SITES[u % len(LINK_SITES)]
            dst = f"https://{site}/p/{u % 10000:04d}"
        else:  # internal: super-hub / head / uniform tail
            m = h % 16
            t = u % 16 if m < 3 else (u % 4096 if m < 8 else u % LINK_UNIVERSE)
            dst = f"{URL_PREFIX}{t:012d}"
        w0 = (h >> 8) % (len(FILLER) - 3)
        anchor = " ".join(FILLER[w0 : w0 + 2 + (h % 2)])
        out.append((dst, anchor))
    return out

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _fmt_date(y: int, m: int, d: int, style: int) -> str:
    if style == 0:
        return f"{y:04d}-{m:02d}-{d:02d}"
    if style == 1:
        return f"{m:02d}/{d:02d}/{y:04d}"
    if style == 2:
        return f"{d:02d}-{_MONTH_ABBR[m - 1]}-{y:04d}"
    if style == 3:
        return f"{_MONTH_FULL[m - 1]} {d}, {y}"
    return f"{y:04d}/{m:02d}"  # partial gYearMonth


def page_record(page_id: int, seed: int = 42) -> Tuple[Dict[str, object], List[str]]:
    """One synthetic page + its ground-truth mention fields.

    Returns (row, truth_fields).  ``truth_fields`` is the list of raw
    field strings whose Datum-cast Phrase (classes.py:300-316 ragged
    path) defines the expected triples; empty for no-record pages.
    """
    r = _streams(np.array([page_id]), seed, 16)[0]
    return _build_page(page_id, r)


def _build_page(page_id: int, r) -> Tuple[Dict[str, object], List[str]]:
    def pick(vocab, k):
        return vocab[int(r[k] % len(vocab))]

    url = f"{URL_PREFIX}{page_id:012d}"
    warc_ts = 1609459200_000000 + int(r[0] % (3 * 365 * 86400)) * 1_000_000

    has_record = (r[1] % 10) != 0  # ~10% pure-distractor pages
    fields: List[str] = []
    sentences: List[str] = []

    # distractor prose (deterministic words, no digits)
    n_fill = 2 + int(r[2] % 3)
    for j in range(n_fill):
        w0 = int((int(r[3]) >> (j * 8)) % max(1, len(FILLER) - 12))
        sentences.append(" ".join(FILLER[w0 : w0 + 9 + (j % 4)]) + ".")

    if has_record:
        host = pick(HOSTS, 4)
        place = pick(PLACES, 5)
        year = 2009 + int(r[6] % 15)
        ident_is_barcode = (r[7] % 3) != 0
        if ident_is_barcode:
            ident = f"A0{int(r[7] % 10_000_000):07d}"
        else:
            ident = str(1 + int(r[7] % 99999))
        strain = f"A/{host}/{place}/{ident}/{year}"
        subtype = pick(SUBTYPES, 8)
        m = 1 + int(r[9] % 12)
        d = 1 + int(r[10] % 28)
        date = _fmt_date(year, m, d, int(r[11] % 5))
        gb = f"M{chr(ord('A') + int(r[12] % 26))}{int(r[12] % 900000) + 100000}"
        loc = pick(COUNTRIES, 13) if (r[13] % 4 == 0) else pick(STATES, 13)
        clade = pick(GLOBAL_CLADES, 14) if (r[14] % 2 == 0) else None

        fields = [strain, subtype, date, host, loc, gb]
        if clade:
            fields.append(clade)

        sentences.insert(
            1 + int(r[15] % max(1, len(sentences) - 1)),
            f"Specimen {strain} typed as {subtype} was collected on {date} "
            f"from a {host} herd near {loc} and deposited as {gb}."
            + (f" Phylogenetic placement assigned global clade {clade}." if clade else ""),
        )

    text = " ".join(sentences)
    body = _html.escape(text, quote=False)
    # outlinks live in <nav>, OUTSIDE <article>: the byte-identical
    # text-extraction invariant (north rule) is untouched by them
    nav = "crawl archive " + "".join(
        f'<a href="{d}">{a}</a>' for d, a in page_links(page_id))
    html_doc = (
        f'<html><head><meta charset="utf-8"><title>surveillance {page_id}</title></head>'
        f"<body><nav>{nav}</nav><article>{body}</article>"
        f"<footer>retrieved snapshot</footer></body></html>"
    ).encode("utf-8")

    row = {
        "url": url,
        "warc_ts": warc_ts,
        "html": html_doc,
        "text": text,
        "lang": "en" if (r[1] % 17) != 0 else "es",
    }
    return row, fields


def pages_batch(page_ids: np.ndarray, seed: int = 42, with_truth: bool = False) -> pa.Table:
    """Vectorized batch synthesis for ``map_batches`` over a range dataset."""
    ids = np.asarray(page_ids)
    streams = _streams(ids, seed, 16)  # one vectorized draw per batch
    rows = []
    truths = []
    for pid, r in zip(ids.tolist(), streams):
        row, fields = _build_page(int(pid), r)
        rows.append(row)
        truths.append(fields)
    t = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )
    if with_truth:
        t = t.append_column("truth_fields", pa.array(truths, pa.list_(pa.string())))
    return t


def pages_dataset(n_pages: int, seed: int = 42, parallelism: int = -1):
    """Streaming synthetic pages as a ray.data.Dataset (no driver-side
    materialization — generation happens inside map_batches).

    Default block count targets ~8192 pages/block (measured best task
    granularity for the scan/emit stages) with a floor of 2 blocks per
    CPU so every core has work — rd.range's own default (200 blocks)
    makes 100-row blocks at small n and drowns the pipeline in
    per-task overhead."""
    import ray
    import ray.data as rd

    if parallelism <= 0:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        parallelism = max(1, min(n_pages, max(2 * cpus, n_pages // 8192)))
    ds = rd.range(n_pages, override_num_blocks=parallelism)
    return ds.map_batches(
        lambda b: pages_batch(b["id"], seed=seed),
        batch_format="numpy",
        batch_size=4096,
    )


def truth_triples(page_id: int, seed: int = 42):
    """Reference-semantics oracle: the triples the reference emitter
    would produce for this page's record (Datum-cast ragged Phrase,
    classes.py:300-316 + Phrase.connect)."""
    from octoray import emit, recognize as R

    _, fields = page_record(page_id, seed)
    mentions = [emit.make_mention(R.cast_datum(f), f) for f in fields]
    return emit.connect(mentions, levels=None)
