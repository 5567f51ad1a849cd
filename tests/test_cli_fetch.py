"""CLI fetch lifecycle (reference ui.py:1090-1260): tag pushes
f:query_tag triples into the store, strain (no --ids) reports over
the pushed tags through the SPARQL engine, clear retracts them."""

import os


def test_fetch_tag_strain_clear(ray_session, tmp_path):
    import ray.data as rd

    from octoray.__main__ import main
    from octoray.sources.webtext import page_record

    kg = str(tmp_path / "kg")
    assert main(["build", "--pages", "300", "--out", kg,
                 "--shards", "2"]) == 0

    ids = []
    for pid in range(20):
        f = page_record(pid, 42)[1]
        if f:
            ids.append(f[0])
    ids = ids[:8]
    idf = str(tmp_path / "ids.txt")
    with open(idf, "w") as fh:
        fh.write("\n".join(ids))

    assert main(["fetch", "tag", "--graph", kg, "--ids", idf]) == 0
    tagged = rd.read_parquet(os.path.join(kg, "shard=querytags")).count()
    assert tagged == len(set(ids))

    out = str(tmp_path / "report.tsv")
    assert main(["fetch", "strain", "--graph", kg, "--out", out]) == 0
    with open(out) as fh:
        lines = fh.read().splitlines()
    assert lines[0].split("\t")[0] == "strain"
    reported = {ln.split("\t")[0] for ln in lines[1:]}
    # every tag that names a strain in the built graph is reported
    assert reported and reported <= set(ids) | reported

    assert main(["fetch", "clear", "--graph", kg]) == 0
    from octoray.pipelines.pull import read_graph

    left = read_graph(kg)
    import pyarrow.compute as pc

    n_tags = left.filter(
        lambda r: r["predicate"] == "f:query_tag").count()
    assert n_tags == 0


def test_fetch_isolate_segment_sequence_levels(ray_session, tmp_path):
    """Reference ui.py:1138-1205 — one bundled query per entity level;
    sequence level writes FASTA (last variable is the sequence)."""
    from octoray import sinks
    from octoray.__main__ import main
    from octoray.sources.webtext import page_record

    kg = str(tmp_path / "kg")
    assert main(["build", "--pages", "300", "--out", kg,
                 "--shards", "2"]) == 0

    strains = []
    for pid in range(30):
        f = page_record(pid, 42)[1]
        if f:
            strains.append(f[0])
    idf = str(tmp_path / "ids.txt")
    with open(idf, "w") as fh:
        fh.write("\n".join(strains[:6]))
    assert main(["fetch", "tag", "--graph", kg, "--ids", idf]) == 0

    iso = str(tmp_path / "iso.tsv")
    assert main(["fetch", "isolate", "--graph", kg, "--out", iso]) == 0
    with open(iso) as fh:
        head = fh.readline().rstrip("\n").split("\t")
    assert head == ["strain", "hosts", "subtypes", "gl_clades",
                    "constellations", "countries", "earliest_date"]

    seg = str(tmp_path / "seg.tsv")
    assert main(["fetch", "segment", "--graph", kg, "--out", seg]) == 0
    with open(seg) as fh:
        lines = fh.read().splitlines()
    assert lines[0].split("\t") == ["gb", "strain", "constellations",
                                    "gl_clades"]
    assert len(lines) > 1  # tagged strains carry segments

    # sequence level: upload sequence-bearing triples (the prep-fasta
    # vocabulary) for one tagged strain, then fetch FASTA
    ttl = str(tmp_path / "seqs.ttl")
    with open(ttl, "w") as fh:
        fh.write(f"""
@prefix f: <https://flu-crew.org/term/> .
@prefix fid: <https://flu-crew.org/id/> .
fid:x f:strain_name "{strains[0]}" .
fid:x f:has_segment fid:h1 .
fid:h1 f:dnaseq "ACGTACGT" .
fid:h1 f:genbank_id "ZZ000001" .
""")
    assert main(["upload", ttl, "--store", kg]) == 0
    fa = str(tmp_path / "seqs.fa")
    assert main(["fetch", "sequence", "--graph", kg, "--out", fa]) == 0
    with open(fa) as fh:
        entries = fh.read().strip().splitlines()
    assert f">{strains[0]}|ZZ000001" in entries
    assert "ACGTACGT" in entries


def test_sparql_cli_fasta_and_no_header(ray_session, tmp_path):
    """Reference query --fasta / --header toggles (ui.py:458-470)."""
    import os

    import pyarrow.parquet as pq

    from octoray.__main__ import main
    from octoray.model import triples_to_table

    store = str(tmp_path / "s")
    os.makedirs(os.path.join(store, "shard=00000"))
    pq.write_table(triples_to_table([
        ("fid:x", "f:strain_name", "A/sw/1", ""),
        ("fid:x", "f:has_segment", "fid:g", "uri"),
        ("fid:g", "f:dnaseq", "ACGT", ""),
    ]), os.path.join(store, "shard=00000", "p.parquet"))

    rq = str(tmp_path / "q.rq")
    with open(rq, "w") as fh:
        fh.write("""
            PREFIX f: <https://flu-crew.org/term/>
            SELECT ?n ?seq WHERE {
                ?s f:strain_name ?n .
                ?s f:has_segment ?g .
                ?g f:dnaseq ?seq .
            }
        """)
    fa = str(tmp_path / "o.fa")
    assert main(["sparql", rq, "--graph", store, "--fasta",
                 "--out", fa]) == 0
    with open(fa) as fh:
        assert fh.read().splitlines() == [">A/sw/1", "ACGT"]

    tsv = str(tmp_path / "o.tsv")
    assert main(["sparql", rq, "--graph", store, "--no-header",
                 "--out", tsv]) == 0
    with open(tsv) as fh:
        assert fh.read().splitlines() == ["A/sw/1\tACGT"]


def test_cli_construct_update_aliases(ray_session, tmp_path):
    """`construct FILE.rq` / `update FILE.rq` (reference ui.py:517-554)
    are form-dispatching aliases of `sparql`."""
    import ray.data as rd

    from octoray.__main__ import main

    kg = str(tmp_path / "kg")
    assert main(["build", "--pages", "200", "--out", kg,
                 "--shards", "1"]) == 0
    cq = str(tmp_path / "c.rq")
    with open(cq, "w") as fh:
        fh.write("""
            PREFIX f: <https://flu-crew.org/term/>
            CONSTRUCT { ?s f:hosted ?o . }
            WHERE { ?s f:host ?o . }
        """)
    out = str(tmp_path / "c.ttl")
    assert main(["construct", cq, "--graph", kg, "--out", out]) == 0
    assert os.path.getsize(out) > 0
    uq = str(tmp_path / "u.rq")
    with open(uq, "w") as fh:
        fh.write("""
            PREFIX f: <https://flu-crew.org/term/>
            DELETE { ?s f:host ?o . } WHERE { ?s f:host ?o . }
        """)
    before = rd.read_parquet(kg).to_pandas()
    n_host = (before["predicate"] == "f:host").sum()
    assert n_host > 0
    assert main(["update", uq, "--graph", kg]) == 0
    after = rd.read_parquet(kg).to_pandas()
    assert (after["predicate"] == "f:host").sum() == 0
    assert len(after) == len(before) - n_host


def test_cli_webgraph_rank(tmp_path, ray_session):
    from octoray.__main__ import main

    out = str(tmp_path / "wg_rank")
    assert main(["webgraph", "rank", "--pages", "200", "--out", out]) == 0
    import pyarrow.dataset as pds

    t = pds.dataset(out).to_table()
    assert t.num_rows > 0 and set(t.column_names) == {"node", "rank"}
