"""CLI prep kinds added for reference-surface parity: tag (S10,
ui.py:600-619), ivr/ird positional recipes (recipes.py:74-151), gbids
(per-id deterministic synthesis standing in for the Entrez fetch,
ui.py:673-713), and the named delete shapes' neighbours are covered in
test_sparql.py."""

import json
import os

import pytest


def _read(out_dir):
    import ray.data as rd

    return rd.read_parquet(out_dir).take_all()


def test_cli_prep_tag(ray_session, tmp_path):
    from octoray.__main__ import main

    ids = tmp_path / "ids.txt"
    ids.write_text("A/swine/Iowa/001/2021\nMG00001\n")
    out = str(tmp_path / "tags")
    assert main(["prep", "tag", str(ids), "--tag", "batch1",
                 "--out", out, "--timestamp", "2021-06-01"]) == 0
    rows = {(r["subject"], r["predicate"], r["object"]) for r in _read(out)}
    assert ("fid:a%2Fswine%2Fiowa%2F001%2F2021", "f:tag", "tag:batch1") in rows \
        or any(p == "f:tag" and o == "tag:batch1" for _, p, o in rows)
    # tag metadata record present (name + injected time)
    assert any(p == "f:name" and o == "batch1" for _, p, o in rows)


def test_cli_prep_ivr_ird(ray_session, tmp_path):
    from octoray.__main__ import main

    ivr = tmp_path / "ivr.tsv"
    # 11 positional columns (mk_influenza_na)
    ivr.write_text("\t".join([
        "MG11111", "Swine", "4", "H1N1", "USA", "2021-05-04", "1701",
        "Influenza A virus (A/swine/Iowa/0001/2021(H1N1))", "x", "y",
        "complete",
    ]) + "\n")
    out1 = str(tmp_path / "ivr_out")
    assert main(["prep", "ivr", str(ivr), "--out", out1]) == 0
    rows = {(r["predicate"], r["object"]) for r in _read(out1)}
    assert ("f:genbank_id", "MG11111") in rows
    assert ("f:host", "swine") in rows
    assert any(p == "f:strain_name" for p, _ in rows)

    ird = tmp_path / "ird.tsv"
    # 12 positional columns (mk_ird), with '-N/A-' folding
    ird.write_text("\t".join([
        "4", "HA", "MG22222", "Yes", "1701", "H1N1", "2021-05-04",
        "IRD:Swine", "USA", "-N/A-", "20-21", "A/swine/Iowa/0002/2021",
    ]) + "\n")
    out2 = str(tmp_path / "ird_out")
    assert main(["prep", "ird", str(ird), "--out", out2]) == 0
    rows2 = {(r["predicate"], r["object"]) for r in _read(out2)}
    assert ("f:genbank_id", "MG22222") in rows2
    assert ("f:host", "swine") in rows2
    assert ("f:flu_season", "20-21") in rows2


def test_cli_prep_gbids(ray_session, tmp_path):
    from octoray.__main__ import main

    ids = tmp_path / "gbids.txt"
    ids.write_text("MG123456\nKX000001\n")
    out = str(tmp_path / "gb_out")
    assert main(["prep", "gbids", str(ids), "--out", out]) == 0
    rows = _read(out)
    subs = {r["object"] for r in rows if r["predicate"] == "f:genbank_id"}
    # both requested accessions produce records addressed by their id
    assert {"MG123456", "KX000001"} <= subs or any(
        "mg123456" in r["subject"] for r in rows)
    # re-running with the ids reversed yields the SAME triple set
    ids.write_text("KX000001\nMG123456\n")
    out2 = str(tmp_path / "gb_out2")
    assert main(["prep", "gbids", str(ids), "--out", out2]) == 0
    a = sorted((r["subject"], r["predicate"], r["object"]) for r in rows)
    b = sorted((r["subject"], r["predicate"], r["object"]) for r in _read(out2))
    assert a == b


def test_cli_prep_update_gb(ray_session, tmp_path):
    from octoray.__main__ import main

    out = str(tmp_path / "upgb")
    assert main(["prep", "update-gb", "/dev/null", "--out", out,
                 "--timestamp", "2021-02", "--nmonths", "3",
                 "--per-month", "4"]) == 0
    # one partition per trailing month, year rollover included
    months = sorted(os.listdir(out))
    assert months == ["month=2020-12", "month=2021-01", "month=2021-02"]
    # each month's synthesis is deterministic: rerun produces the
    # identical triple set
    import ray.data as rd

    before = {tuple(sorted(r.items())) for r in
              rd.read_parquet(out).take_all()}
    assert main(["prep", "update-gb", "/dev/null", "--out", out,
                 "--timestamp", "2021-02", "--nmonths", "3",
                 "--per-month", "4"]) == 0
    after = {tuple(sorted(r.items())) for r in
             rd.read_parquet(out).take_all()}
    assert before == after and len(before) > 0
