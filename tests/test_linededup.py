"""C4 line dedup: keep-first semantics, doc disappearance, guard."""

import os

import pyarrow as pa
import ray.data as rd

from octoray.stages.linededup import line_dedup


def _run(rows, **kw):
    docs = pa.table(
        {"url": [u for u, _ in rows], "text": [t for _, t in rows]}
    )
    out = line_dedup(rd.from_arrow(docs), **kw).to_pandas()
    return out.set_index("url").sort_index()


def test_keep_first_by_url_then_lineno(ray_session):
    out = _run(
        [
            ("u1", "aa bb. cc dd. ee"),
            ("u2", "cc dd. ff gg. aa bb"),
            ("u3", "aa bb"),
        ]
    )
    # u1 is untouched (all its lines are first occurrences)
    assert out.loc["u1", "text_dedup"] == "aa bb. cc dd. ee"
    assert out.loc["u1", "n_kept"] == 3 and out.loc["u1", "n_lines"] == 3
    # u2 loses both lines first seen in u1
    assert out.loc["u2", "text_dedup"] == "ff gg"
    assert out.loc["u2", "n_kept"] == 1 and out.loc["u2", "n_lines"] == 3
    # u3's only line was seen before -> doc vanishes
    assert "u3" not in out.index


def test_within_doc_duplicates_collapse(ray_session):
    out = _run([("u1", "x y. x y. z")])
    assert out.loc["u1", "text_dedup"] == "x y. z"
    assert out.loc["u1", "n_kept"] == 2


def test_block_colocation_guard_clean(ray_session):
    # enough duplicated lines to cross block boundaries; the env flag
    # makes block_map_groups assert the co-location invariant
    rows = [(f"u{i:03d}", "common line. unique " + str(i)) for i in range(200)]
    os.environ["OCTORAY_CHECK_BLOCKS"] = "1"
    try:
        out = _run(rows)
    finally:
        del os.environ["OCTORAY_CHECK_BLOCKS"]
    # only u000 keeps the common line
    assert out.loc["u000", "n_kept"] == 2
    assert (out["n_kept"] == 1).sum() == 199
    assert len(out) == 200
