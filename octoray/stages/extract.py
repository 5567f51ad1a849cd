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

import pyarrow as pa

_ARTICLE_RE = re.compile(rb"<article>(.*?)</article>", re.DOTALL)


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """Add ``text`` extracted from ``html``.  If the batch already has a
    ``text`` column (the crawl's own extraction), ours replaces it —
    the invariant test asserts byte equality between the two."""
    htmls = batch.column("html").to_pylist()
    out = []
    for h in htmls:
        m = _ARTICLE_RE.search(h)
        body = m.group(1).decode("utf-8") if m else ""
        out.append(_html.unescape(body))
    arr = pa.array(out, pa.string())
    names = batch.schema.names
    if "text" in names:
        idx = names.index("text")
        return batch.set_column(idx, "text", arr)
    return batch.append_column("text", arr)


def verify_extraction_batch(batch: pa.Table) -> pa.Table:
    """Per-batch invariant check: re-extract from html and compare to
    the stored text column byte-for-byte; returns url + ok flag."""
    import pyarrow.compute as pc

    re_extracted = extract_text_batch(batch.drop_columns(["text"]))
    ok = pc.equal(re_extracted.column("text"), batch.column("text"))
    return pa.table({"url": batch.column("url"), "text_ok": ok})
