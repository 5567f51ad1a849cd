"""Model-based quality filtering: train a logistic-regression quality
classifier over the corpus and score every document — the
CCNet/GPT-3-style "quality classifier" curation stage (a linear model
over cheap text statistics standing in for the fasttext classifier
those pipelines train; no external model, fully deterministic).

Distributed shape (the kmeans_cluster combiner pattern — NO shuffle
anywhere):

  1. ONE feature pass over the text (the quality_scores Arrow kernels
     + a token-density ratio — every feature is a single division over
     integer counts, so engine and SQL twin agree bit-for-bit),
     materialized to a slim numeric table (7 doubles + id per doc; the
     100-TB text never travels again).
  2. ONE standardization pass: per-block partial (count, sum, sumsq)
     rows -> driver reduce bounded by block count -> per-feature mean
     and std, each rounded half-up to 6 decimals (the engine/SQL
     float convention) so both engines share identical constants and
     the z-scored features stay bit-exact.
  3. Per GD iteration: weights broadcast via ``ray.put``; each block
     emits ONE partial gradient row; the averaged gradient is rounded
     to the 6-decimal grid BEFORE the update, so both engines walk
     the identical weight trajectory — float summation order can only
     differ below the grid.
  4. ONE scoring pass: sigmoid scores rounded to 6, keep = score >=
     threshold.

The logit is evaluated LEFT-TO-RIGHT per feature (w0 + w1*z1 + ...)
on both sides, so pre-sigmoid values are bit-identical, not merely
close.

Labels: the corpus carries no text-correlated quality signal at test
scale, so training uses the standard synthetic-recovery setup — a
fixed linear TEACHER rule over the raw features (alpha - digit -
upper + stop - punct + tok_density > TEACHER_CUT) labels each doc,
and the learner must recover the boundary from data; accuracy >= 0.95
is pinned in pytest.  At production scale the label column is the
pluggable part (curated-vs-crawl provenance, as CCNet does).

Reference anchor: the reference engine has no model stage (its
recognizers T1-T24 are rule-based); this operator belongs to the
beyond-reference training-data family the brief requires.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from octoray import plan

FEATURES: Tuple[str, ...] = (
    "alpha_ratio", "digit_ratio", "upper_ratio", "punct_per_token",
    "stop_per_token", "tok_per_char",
)

#: teacher-rule threshold (empirical median of the teacher score on
#: the synthetic corpus; a CONSTANT, not data-dependent, so labels are
#: reproducible at any scale)
TEACHER_CUT = 1.064


def _r6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def quality_feature_table(docs, *, id_col: str = "doc_id",
                          text_col: str = "text"):
    """Slim per-doc feature table: the quality_scores ratios plus
    token density, and the teacher label.  Every feature is one
    division over integer counts — bit-identical to the SQL twin; the
    teacher score accumulates left-to-right so the label comparison
    is exact on both sides."""
    from octoray.stages.textops import quality_scores

    def f(t: pa.Table) -> pa.Table:
        q = quality_scores(t)
        n_chars = pc.cast(q.column("n_chars"), pa.float64())
        n_tokens = pc.cast(q.column("n_tokens"), pa.float64())
        denom = pc.max_element_wise(n_chars, 1.0)
        cols = {
            id_col: t.column(id_col),
            "alpha_ratio": q.column("alpha_ratio"),
            "digit_ratio": q.column("digit_ratio"),
            "upper_ratio": q.column("upper_ratio"),
            "punct_per_token": q.column("punct_per_token"),
            "stop_per_token": q.column("stop_per_token"),
            "tok_per_char": pc.divide(n_tokens, denom),
        }
        a = {k: cols[k].to_numpy(zero_copy_only=False) for k in FEATURES}
        score = a["alpha_ratio"] - a["digit_ratio"]
        score = score - a["upper_ratio"]
        score = score + a["stop_per_token"]
        score = score - a["punct_per_token"]
        score = score + a["tok_per_char"]
        cols["label"] = pa.array((score > TEACHER_CUT).astype(np.float64))
        return pa.table(cols)

    return docs.map_batches(f, batch_format="pyarrow")


def _standardize_stats(feats) -> Tuple[List[float], List[float]]:
    """One combiner pass -> per-feature (mean, std), each rounded to
    the shared 6-decimal grid.  Variance uses the ROUNDED mean so the
    SQL twin can reproduce it exactly."""

    def partials(df):
        import pandas as pd

        row = {"_n": [float(len(df))]}
        for name in FEATURES:
            x = df[name].to_numpy(np.float64)
            row[f"s_{name}"] = [float(x.sum())]
            row[f"q_{name}"] = [float((x * x).sum())]
        return pd.DataFrame(row)

    parts = feats.map_batches(partials, batch_format="pandas").take_all()
    n = sum(r["_n"] for r in parts)
    means, stds = [], []
    for name in FEATURES:
        s = sum(r[f"s_{name}"] for r in parts)
        q = sum(r[f"q_{name}"] for r in parts)
        m = _r6(s / n)
        var = q / n - m * m
        sd = _r6(math.sqrt(max(var, 0.0)))
        means.append(m)
        stds.append(sd if sd > 0 else 1.0)
    return means, stds


def _z_logits(df, w: List[float], means: List[float],
              stds: List[float]) -> np.ndarray:
    """w0 + w1*z1 + w2*z2 + ... accumulated LEFT-TO-RIGHT over the
    standardized features, matching the SQL twin's left-associated
    expression bit-for-bit."""
    z = np.full(len(df), w[0], np.float64)
    for j, name in enumerate(FEATURES):
        zj = (df[name].to_numpy(np.float64) - means[j]) / stds[j]
        z = z + w[j + 1] * zj
    return z


def train_quality_classifier(docs, *, n_iters: int = 30, lr: float = 5.0,
                             threshold: float = 0.5,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             driver_limit: int = plan.QUALMODEL_DRIVER_ROWS):
    """Train the classifier with full-batch gradient descent over
    standardized features and score every document.

    Returns a Dataset (id, quality_prob, keep): ``quality_prob`` is
    the sigmoid score rounded half-up to 6 decimals, ``keep`` the
    threshold decision.  Deterministic and oracle-exact — see module
    docstring.

    Stats gate (the pagerank/dup_components convention): a feature
    table at or below ``driver_limit`` rows trains on ONE collected
    numpy copy — the per-iteration Ray execution round-trip is pure
    overhead when each combiner row is microseconds of math — while
    larger corpora run the distributed per-block-combiner loop.  Both
    paths round every averaged gradient on the shared 6-decimal grid,
    so they walk the identical weight trajectory (pinned in pytest)."""
    import ray

    feats = quality_feature_table(
        docs, id_col=id_col, text_col=text_col).materialize()
    means, stds = _standardize_stats(feats)

    d = len(FEATURES) + 1
    w = [0.0] * d

    if feats.count() <= driver_limit:
        df = feats.to_pandas()
        X = np.stack([(df[name].to_numpy(np.float64) - means[j]) / stds[j]
                      for j, name in enumerate(FEATURES)], axis=1)
        y = df["label"].to_numpy(np.float64)
        n = float(len(df))
        for _ in range(n_iters):
            z = np.full(len(df), w[0], np.float64)
            for j in range(len(FEATURES)):
                z = z + w[j + 1] * X[:, j]
            sig = 1.0 / (1.0 + np.exp(-z))
            err = sig - y
            g = [float(err.sum()) / n] + [
                float((err * X[:, j]).sum()) / n
                for j in range(len(FEATURES))]
            w = [wj - lr * _r6(gj) for wj, gj in zip(w, g)]
    else:
        def partials(df, *, ref):
            import pandas as pd

            wv = ray.get(ref)
            z = _z_logits(df, wv, means, stds)
            sig = 1.0 / (1.0 + np.exp(-z))
            err = sig - df["label"].to_numpy(np.float64)
            row = {"_n": [float(len(df))], "g0": [float(err.sum())]}
            for j, name in enumerate(FEATURES):
                zj = (df[name].to_numpy(np.float64) - means[j]) / stds[j]
                row[f"g{j + 1}"] = [float((err * zj).sum())]
            return pd.DataFrame(row)

        for _ in range(n_iters):
            ref = ray.put(list(w))
            parts = feats.map_batches(
                lambda df, ref=ref: partials(df, ref=ref),
                batch_format="pandas",
            ).take_all()  # bounded: ONE row per block
            n = sum(r["_n"] for r in parts)
            g = [sum(r[f"g{j}"] for r in parts) / n for j in range(d)]
            w = [wj - lr * _r6(gj) for wj, gj in zip(w, g)]

    ref = ray.put(list(w))

    def score(df, *, ref):
        import pandas as pd

        wv = ray.get(ref)
        z = _z_logits(df, wv, means, stds)
        sig = 1.0 / (1.0 + np.exp(-z))
        prob = np.floor(sig * 1e6 + 0.5) / 1e6
        return pd.DataFrame({
            id_col: df[id_col],
            "quality_prob": prob,
            "keep": prob >= threshold,
        })

    return feats.map_batches(
        lambda df, ref=ref: score(df, ref=ref), batch_format="pandas")


def sql_quality_classifier(*, n_iters: int = 30, lr: float = 5.0,
                           threshold: float = 0.5,
                           tok_expr: str,
                           stop_pattern: str) -> str:
    """DuckDB twin: re-derives the teacher labels, the rounded
    standardization constants, and the identical GD iterations as a
    generated CTE chain (the sql_kmeans pattern).  Weights live in
    single-row CTEs; every averaged gradient is rounded on the same
    6-decimal grid; the logit is the same left-associated sum the
    engine evaluates."""
    feat_exprs = {
        "alpha_ratio": "CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS "
                       "DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0)",
        "digit_ratio": "CAST(len(regexp_extract_all(text, '[0-9]')) AS "
                       "DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0)",
        "upper_ratio": "CAST(len(regexp_extract_all(text, '[A-Z]')) AS "
                       "DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0)",
        "punct_per_token": "CAST(len(regexp_extract_all(text, '[.,;:!?]')) "
                           f"AS DOUBLE) / greatest(CAST({tok_expr} AS DOUBLE), 1.0)",
        "stop_per_token": f"CAST(len(regexp_extract_all(text, '{stop_pattern}')) "
                          f"AS DOUBLE) / greatest(CAST({tok_expr} AS DOUBLE), 1.0)",
        "tok_per_char": f"CAST({tok_expr} AS DOUBLE) / "
                        "greatest(CAST(length(text) AS DOUBLE), 1.0)",
    }

    def r6(e: str) -> str:
        return f"floor(({e}) * 1000000 + 0.5) / 1000000"

    fcols = ", ".join(f"{e} AS {n}" for n, e in feat_exprs.items())
    teacher = ("alpha_ratio - digit_ratio - upper_ratio + stop_per_token"
               " - punct_per_token + tok_per_char")
    parts = [
        f"f0 AS MATERIALIZED (SELECT doc_id, {fcols} FROM documents)",
        f"f AS MATERIALIZED (SELECT *, CASE WHEN {teacher} > {TEACHER_CUT} "
        f"THEN 1.0 ELSE 0.0 END AS label FROM f0)",
        "st AS (SELECT count(*)::DOUBLE AS n, " + ", ".join(
            f"sum({name}) AS s_{name}, sum({name} * {name}) AS q_{name}"
            for name in FEATURES) + " FROM f)",
        "mz AS (SELECT " + ", ".join(
            f"{r6(f's_{name} / n')} AS m_{name}" for name in FEATURES) +
        " FROM st)",
        "sz AS (SELECT " + ", ".join(
            f"CASE WHEN {r6(f'sqrt(greatest(q_{name} / n - m_{name} * m_{name}, 0.0))')} = 0"
            f" THEN 1.0 ELSE"
            f" {r6(f'sqrt(greatest(q_{name} / n - m_{name} * m_{name}, 0.0))')} END"
            f" AS d_{name}" for name in FEATURES) + " FROM st, mz)",
        "z AS MATERIALIZED (SELECT doc_id, label, " + ", ".join(
            f"({name} - m_{name}) / d_{name} AS {name}"
            for name in FEATURES) + " FROM f, mz, sz)",
        "w0 AS MATERIALIZED (SELECT " + ", ".join(
            f"0.0 AS w{j}" for j in range(len(FEATURES) + 1)) + ")",
    ]

    def logit(wt: str) -> str:
        expr = f"{wt}.w0"
        for j, name in enumerate(FEATURES):
            expr += f" + {wt}.w{j + 1} * z.{name}"
        return expr

    for t in range(1, n_iters + 1):
        p = t - 1
        zx = logit(f"w{p}")
        terms = [f"sum((1.0 / (1.0 + exp(-({zx}))) - z.label)) / count(*) "
                 f"AS g0"]
        for j, name in enumerate(FEATURES):
            terms.append(
                f"sum((1.0 / (1.0 + exp(-({zx}))) - z.label) * z.{name}) "
                f"/ count(*) AS g{j + 1}")
        parts.append(f"g{t} AS MATERIALIZED (SELECT " + ", ".join(terms) +
                     f" FROM z, w{p})")
        ws = ", ".join(
            f"w{p}.w{j} - {lr} * {r6(f'g{t}.g{j}')} AS w{j}"
            for j in range(len(FEATURES) + 1))
        parts.append(f"w{t} AS MATERIALIZED (SELECT {ws} FROM w{p}, g{t})")
    zf = logit(f"w{n_iters}")
    prob = r6(f"1.0 / (1.0 + exp(-({zf})))")
    return ("WITH " + ",\n".join(parts) +
            f"\nSELECT z.doc_id, {prob} AS quality_prob, "
            f"{prob} >= {threshold} AS keep FROM z, w{n_iters}")
