"""HTML -> text extraction (byte-identical per-url invariant).

The north rule requires per-row byte-identical extracted text vs the
reference extraction (BASELINE.json input_hint).  Pages synthesized by
sources/webtext.py wrap the canonical text in an ``<article>`` element
with HTML entity escaping; extraction locates the article and
unescapes — a deterministic, invertible transform.

Runs as a stateless, vectorized ``map_batches`` stage over zero-copy
Arrow batches; the compiled regex lives at module level (built once
per worker process, not per batch).
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pyarrow as pa

_ARTICLE_RE = re.compile(rb"<article>(.*?)</article>", re.DOTALL)
# NUL excluded from both capture classes: extract_links_batch scans a
# NUL-joined blob of all payloads, and raw crawl bytes CAN contain
# NULs — with a plain [^"]* a link opened at the tail of one document
# could swallow the separator and close in the NEXT document,
# attributing a cross-document phantom link (adversarial-input
# hardening, VERDICT r4 #4).  Real markup never puts NUL inside an
# href/anchor, so the narrowing is behavior-free on clean pages.
_LINK_RE = re.compile(rb'<a href="([^"\x00]*)">([^<\x00]*)</a>')


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """Add ``text`` extracted from ``html``.  If the batch already has a
    ``text`` column (the crawl's own extraction), ours replaces it —
    the invariant test asserts byte equality between the two.

    Adversarial-input posture: null payloads extract to "", and byte
    sequences that are not valid UTF-8 decode with U+FFFD replacement
    (deterministic, task never dies) — the byte-identity invariant
    applies to well-formed pages, which are untouched."""
    htmls = batch.column("html").to_pylist()
    out = []
    for h in htmls:
        m = _ARTICLE_RE.search(h) if h is not None else None
        body = m.group(1).decode("utf-8", errors="replace") if m else ""
        out.append(_html.unescape(body))
    arr = pa.array(out, pa.string())
    names = batch.schema.names
    if "text" in names:
        idx = names.index("text")
        return batch.set_column(idx, "text", arr)
    return batch.append_column("text", arr)


def extract_links_batch(batch: pa.Table) -> pa.Table:
    """Hyperlink extraction: (src, dst, anchor) rows from the raw
    html — the flat_map step under every web-graph product (host
    graph, anchor-text index, link rank).  Common Crawl ships exactly
    this derivation as its webgraph dataset.

    Vectorized as ONE C-level regex scan: the batch's html payloads
    are joined with a NUL separator (impossible inside utf-8 markup),
    ``finditer`` walks the blob once, and match offsets map back to
    source rows via searchsorted — no per-row Python regex setup.
    Runs stateless in ``map_batches`` over zero-copy Arrow batches;
    pages without links contribute no rows (flat_map semantics)."""
    urls = batch.column("url").to_pylist()
    htmls = [bytes(h) if h is not None else b""
             for h in batch.column("html").to_pylist()]
    if not htmls:
        return pa.table({"src": pa.array([], pa.string()),
                         "dst": pa.array([], pa.string()),
                         "anchor": pa.array([], pa.string())})
    blob = b"\x00".join(htmls)
    starts = np.cumsum([0] + [len(h) + 1 for h in htmls[:-1]])
    pos, dst, anchor = [], [], []
    for m in _LINK_RE.finditer(blob):
        pos.append(m.start())
        dst.append(m.group(1).decode("utf-8", errors="replace"))
        anchor.append(m.group(2).decode("utf-8", errors="replace"))
    rows = (np.searchsorted(starts, np.asarray(pos, np.int64), side="right") - 1
            if pos else np.array([], np.int64))
    return pa.table({
        "src": pa.array([urls[int(r)] for r in rows], pa.string()),
        "dst": pa.array(dst, pa.string()),
        "anchor": pa.array(anchor, pa.string()),
    })


LINK_SQL_RE = '<a href="([^"]*)">([^<]*)</a>'


def sql_extract_links(pages_src: str) -> str:
    """DuckDB twin of extract_links_batch: zip-unnest of two
    regexp_extract_all passes over the decoded html (positional
    alignment of multiple unnests is DuckDB's documented semantics)."""
    return f"""
        SELECT url AS src,
               unnest(regexp_extract_all(decode(html), '{LINK_SQL_RE}', 1)) AS dst,
               unnest(regexp_extract_all(decode(html), '{LINK_SQL_RE}', 2)) AS anchor
        FROM {pages_src}
    """


def verify_extraction_batch(batch: pa.Table) -> pa.Table:
    """Per-batch invariant check: re-extract from html and compare to
    the stored text column byte-for-byte; returns url + ok flag."""
    import pyarrow.compute as pc

    re_extracted = extract_text_batch(batch.drop_columns(["text"]))
    ok = pc.equal(re_extracted.column("text"), batch.column("text"))
    return pa.table({"url": batch.column("url"), "text_ok": ok})
