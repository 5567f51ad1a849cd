"""The end-to-end corpus-release pipeline — the composition a training
-data team actually ships, chained from the engine's own stages:

    documents (doc_id, text)
      -> PII/identifier redaction        (stages/redact.py, vectorized
                                          sequential RE2 rules)
      -> corpus-wide line dedup          (stages/linededup.py, C4-style
                                          keep-first, 2 exchanges)
      -> quality gate                    (token count + alpha ratio,
                                          pure Arrow kernels)
      -> exact dedup keep-first          (stages/dedup.drop_exact_dups,
                                          one content-address sort)
      -> deterministic train/val split   (hash fraction, shuffle-free)

    output: (doc_id, md5, n_tokens, split) — the release manifest.

Each stage is individually oracle-verified elsewhere; this pipeline's
own DuckDB twin (oracles.sql_corpus_release) chains the SAME five
derivations as CTEs, so the driver check verifies the COMPOSITION —
column handoffs, filter order, dedup-after-filter semantics — not just
the parts.  Shuffle budget: the line-dedup pair (line sort + doc sort)
plus the content-address sort; everything else streams.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from octoray.plan import colocated_sort


def corpus_release(docs, *, min_tokens: int = 10, min_alpha: float = 0.5,
                   val_frac: float = 0.1, sep: str = ". ",
                   id_col: str = "doc_id", text_col: str = "text"):
    from octoray.stages.linededup import line_dedup
    from octoray.stages.redact import redact_batch

    def redacted(t: pa.Table) -> pa.Table:
        r = redact_batch(t, id_col=id_col, text_col=text_col)
        return pa.table({id_col: r.column(id_col),
                         "text": r.column("text_clean")})

    red = docs.map_batches(redacted, batch_format="pyarrow")
    ld = line_dedup(red, id_col=id_col, text_col="text", sep=sep)

    def quality(t: pa.Table) -> pa.Table:
        text = t.column("text_dedup")
        n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        n_chars = pc.cast(pc.utf8_length(text), pa.float64())
        n_alpha = pc.cast(pc.count_substring_regex(text, r"[A-Za-z]"),
                          pa.float64())
        alpha = pc.divide(n_alpha, pc.max_element_wise(n_chars, 1.0))
        keep = pc.and_(pc.greater_equal(n_tokens, min_tokens),
                       pc.greater_equal(alpha, min_alpha))
        out = pa.table({id_col: t.column(id_col),
                        "text_dedup": text,
                        "n_tokens": n_tokens})
        return out.filter(keep)

    q = ld.map_batches(quality, batch_format="pyarrow")

    # keep-first exact dedup with n_tokens carried THROUGH the content
    # sort (inlining drop_exact_dups here avoids consuming `q` twice —
    # a second consumption re-executed redaction and both line-dedup
    # sorts — and drops the join entirely)
    from octoray.stages.dedup import _norm_ws

    def fp(t: pa.Table) -> pa.Table:
        norm = _norm_ws(t.column("text_dedup")).to_pylist()
        md5s = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in norm]
        return pa.table({
            "md5": pa.array(md5s, pa.string()),
            id_col: t.column(id_col),
            "n_tokens": t.column("n_tokens"),
        })

    def keep_first(df):
        if len(df) == 0:
            return df
        keep = (df.groupby("md5", sort=False)[id_col].transform("min")
                == df[id_col])
        return df[keep]

    joined = colocated_sort(
        q.map_batches(fp, batch_format="pyarrow"), ["md5"]).map_batches(
        keep_first, batch_format="pandas", batch_size=None)

    def with_split(t: pa.Table) -> pa.Table:
        fracs = [
            int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) / 4294967296.0
            for v in t.column(id_col).to_pylist()
        ]
        split = ["val" if x < val_frac else "train" for x in fracs]
        return pa.table({
            id_col: t.column(id_col),
            "md5": t.column("md5"),
            "n_tokens": t.column("n_tokens"),
            "split": pa.array(split, pa.string()),
        })

    return joined.map_batches(with_split, batch_format="pyarrow")
