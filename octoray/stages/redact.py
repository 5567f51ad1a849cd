"""PII / identifier redaction over text corpora.

A standard pre-release step for web-scale training corpora (scrub
contact info) and for the reference's domain (de-identify lab sample
barcodes and accessions before sharing surveillance text — the same
identifier grammar octofludb's recognizers tag, classes.py:318-391,
applied in reverse).

Rules are applied IN ORDER, each counting its matches on the text as
left by the previous rule and then replacing them — so a barcode
inside an already-redacted span is not double-counted.  The kernel is
pure pyarrow (RE2) with no Python loop; the DuckDB twin
(octoray.oracles.sql_redact) is generated from the SAME rule table, so
pattern drift between engine and oracle is impossible.  Both pyarrow
and DuckDB execute RE2, so the patterns are shared verbatim.
"""

from __future__ import annotations

from typing import List, Tuple

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — order matters: more specific
# identifier grammars run before the generic accession rule so e.g. an
# EPI_ISL id is tagged [EPI], not chopped by the accession pattern.
REDACTION_RULES: List[Tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+?\d{1,2}[-. ]?\(\d{3}\)[-. ]?\d{3}[-. ]?\d{4}"
              r"|\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ("epi", r"EPI_ISL_\d+|EPI_?\d{6,}", "[EPI]"),
    ("barcode", r"A0\d{7}", "[BARCODE]"),
    ("accession", r"\b[A-Z]{1,2}\d{5,7}\b", "[ACCESSION]"),
]


def redact_batch(batch: pa.Table, *, id_col: str = "url",
                 text_col: str = "text") -> pa.Table:
    """id + redacted text + per-rule match counts + total.

    Stateless vectorized map_batches stage: one count + one replace
    kernel per rule over the whole batch column."""
    text = batch.column(text_col)
    cols = {id_col: batch.column(id_col)}
    counts = []
    for name, pat, repl in REDACTION_RULES:
        n = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
        text = pc.replace_substring_regex(text, pat, repl)
        cols[f"n_{name}"] = n
        counts.append(n)
    total = counts[0]
    for n in counts[1:]:
        total = pc.add(total, n)
    cols["text_clean"] = text
    cols["n_redactions"] = total
    return pa.table(cols)
