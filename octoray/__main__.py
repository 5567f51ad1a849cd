"""octoray CLI — the `octofludb` command-surface analogue.

    python -m octoray build   --pages 100000 --out /tmp/kg [--shards 8]
    python -m octoray pull    --pages 100000 --out /tmp/kg
    python -m octoray prep    fasta|unpublished|table|blast|gisaid IN [--out OUT.ttl]
                              [--tag T] [--include a,b] [--exclude c] [--segment-key]
    python -m octoray report  masterlist|subtypes|constellations|monthly IN.parquet --out OUT.tsv
    python -m octoray query   "s,p,o pattern" --graph DIR  (triple-pattern scan)
    python -m octoray fetch   strain --graph DIR --ids IDS.txt --out OUT.tsv
    python -m octoray crawl   latest|delta|domains [--input DIR | --pages N] --out OUT
    python -m octoray warc    read|write IN --out OUT
    python -m octoray ingest  PAGES_PARQUET --store DIR  (incremental snapshot ingest)
    python -m octoray upload  FILE.ttl [...] --store DIR (Turtle -> idempotent store partition)

Each subcommand owns its own local Ray session (`ray job submit` on a
real cluster runs the same module; the driver-contract entrypoints in
``__ray_entry__.py`` never init Ray themselves).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys


def _init_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_build(args) -> int:
    from octoray.pipelines.kg import run_kg_build

    res = run_kg_build(args.pages, args.out, n_shards=args.shards, resume=not args.no_resume)
    print(json.dumps({"built": res["built"], "skipped": res["skipped"],
                      "triples": sum(m["triples_out"] for m in res["manifests"])}))
    return 0


def cmd_pull(args) -> int:
    from octoray.pipelines.pull import pull

    res = pull(args.pages, args.out, n_shards=args.shards, resume=not args.no_resume)
    print(json.dumps({"built": res["base"]["built"], "steps": res["steps"]}))
    return 0


def cmd_prep(args) -> int:
    from octoray import sinks

    inc = tuple(s for s in (args.include or "").split(",") if s)
    exc = tuple(s for s in (args.exclude or "").split(",") if s)
    if args.kind == "fasta":
        from octoray.pipelines.prep import prep_fasta
        from octoray.sources.fasta import fasta_rows

        ds = prep_fasta(fasta_rows([args.input]), tag=args.tag,
                        timestamp=args.timestamp, include=inc, exclude=exc)
    elif args.kind == "unpublished":
        from octoray.pipelines.prep import prep_unpublished
        from octoray.sources.fasta import fasta_rows

        ds = prep_unpublished(fasta_rows([args.input]), tag=args.tag,
                              timestamp=args.timestamp, include=inc, exclude=exc)
    elif args.kind == "table":
        from octoray.pipelines.prep import prep_table
        from octoray.sources.tables import tsv_rows

        ds = prep_table(tsv_rows([args.input]), tag=args.tag,
                        timestamp=args.timestamp, include=inc, exclude=exc,
                        segment_key=args.segment_key)
    elif args.kind == "blast":
        from octoray.pipelines.prep import _BLAST_COLS, prep_blast
        from octoray.sources.tables import tsv_rows

        # BLAST outfmt-6 has NO header row: read with explicit column
        # names so the first alignment doesn't become the schema
        # (reference recipes.py:29-43 reads headerless the same way)
        ds = prep_blast(
            tsv_rows([args.input], column_names=[c for c, _ in _BLAST_COLS]),
            tag=args.tag, timestamp=args.timestamp,
        )
    elif args.kind == "ivr":
        from octoray.pipelines.prep import prep_ivr
        from octoray.sources.tables import tsv_rows

        # IVR influenza_na dumps are headerless positional 11-column
        # tables (reference mk_influenza_na, recipes.py:74-110)
        ds = prep_ivr(tsv_rows([args.input],
                               column_names=[f"c{i}" for i in range(11)]))
    elif args.kind == "ird":
        from octoray.pipelines.prep import prep_ird
        from octoray.sources.tables import tsv_rows

        # IRD exports: headerless positional 12-column tables with
        # '-N/A-' missing markers (reference mk_ird, recipes.py:113-151)
        ds = prep_ird(tsv_rows([args.input],
                               column_names=[f"c{i}" for i in range(12)]))
    elif args.kind == "tag":
        from octoray.pipelines.prep import tag_ids
        from octoray.sources.tables import tsv_rows

        if not args.tag:
            raise SystemExit("prep tag requires --tag NAME")
        # one free-form id per line (reference prep_tag, ui.py:600-619)
        ds = tag_ids(tsv_rows([args.input], column_names=["id"]),
                     args.tag, timestamp=args.timestamp)
    elif args.kind == "gbids":
        from octoray.pipelines.genbank import (prep_genbank,
                                               synth_gb_records_for_ids)

        # reference `prep gbids` fetches the listed accessions from
        # Entrez (ui.py:697-713).  With --base-url the REAL fetch
        # actor pool runs against that endpoint (sources/fetch.py —
        # retry/backoff envelope, tested vs a local flaky server);
        # without it the sandbox synthesizes each record
        # deterministically from its id (no network).
        import pyarrow as pa
        import ray.data as rd

        with open(args.input) as fh:
            gbids = [ln.strip() for ln in fh if ln.strip()]
        if args.base_url:
            from octoray.sources.fetch import fetch_records

            ids_ds = rd.from_arrow(pa.table(
                {"gb_id": pa.array(gbids, pa.string())}))
            recs = fetch_records(
                ids_ds, args.base_url,
                backoff_s=float(os.environ.get("OCTORAY_FETCH_BACKOFF",
                                               "15")))
        else:
            recs = rd.from_arrow(pa.table(
                {"record": pa.array(synth_gb_records_for_ids(gbids),
                                    pa.string())}))
        ds = prep_genbank(recs)
    elif args.kind == "update-gb":
        # reference `prep update_gb` (ui.py:715-760): one Entrez
        # modified-since query per trailing month, one turtle PER
        # MONTH.  The sandbox synthesizes each month's record batch
        # deterministically from the month label (seed = stable hash),
        # and the month anchor comes from --timestamp (YYYY-MM), never
        # the wall clock (§2.10 determinism contract).
        import zlib

        import pyarrow as pa
        import ray.data as rd

        from octoray.pipelines.genbank import prep_genbank, synth_gb_records

        if not args.timestamp:
            raise SystemExit("prep update-gb requires --timestamp YYYY-MM "
                             "(the month anchor; no wall clock)")
        y, m = (int(x) for x in args.timestamp.split("-")[:2])
        nmonths = args.nmonths
        os.makedirs(args.out, exist_ok=True)
        outs = []
        for back in range(nmonths):
            mm = (y * 12 + (m - 1)) - back
            label = f"{mm // 12:04d}-{mm % 12 + 1:02d}"
            seed = zlib.crc32(label.encode()) & 0x7FFFFFFF
            recs = rd.from_arrow(pa.table({"record": pa.array(
                synth_gb_records(args.per_month, seed=seed), pa.string())}))
            month_ds = prep_genbank(recs)
            dst = os.path.join(args.out, f"month={label}")
            if args.out.endswith(".ttl"):
                raise SystemExit("prep update-gb writes a directory of "
                                 "per-month partitions; --out must be a dir")
            shutil.rmtree(dst, ignore_errors=True)
            month_ds.write_parquet(dst)
            outs.append(dst)
        for d in outs:
            print(d)
        return 0
    elif args.kind == "gisaid":
        from octoray.pipelines.prep import prep_gisaid
        from octoray.sources.tables import excel_rows, tsv_rows

        # GISAID exports are .xls (reference recipes.py:158); the CFB
        # magic decides, so TSV conversions keep working too
        with open(args.input, "rb") as fh:
            is_xls = fh.read(8) == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
        rows = excel_rows(args.input) if is_xls else tsv_rows([args.input])
        ds = prep_gisaid(rows)
    else:  # pragma: no cover
        raise SystemExit(f"unknown prep kind {args.kind}")

    if args.out.endswith(".ttl"):
        sinks.write_turtle(ds, args.out)
    else:
        ds.write_parquet(args.out)
    print(args.out)
    return 0


def cmd_report(args) -> int:
    import ray.data as rd

    from octoray import sinks
    from octoray.pipelines import reports

    if args.kind == "monthly":
        from octoray.pipelines.pull import read_graph

        out = reports.kg_monthly_report(read_graph(args.input))
    else:
        ds = rd.read_parquet(args.input)
        if args.kind in ("masterlist", "quarter"):
            # reference ui.py:1325: `report quarter` IS the masterlist
            # ("may eventually be specialized")
            out = reports.masterlist(ds)
        elif args.kind == "subtypes":
            out = reports.synthesize_subtypes(ds)
        elif args.kind == "constellations":
            out = reports.constellations(ds)
        else:  # pragma: no cover
            raise SystemExit(f"unknown report kind {args.kind}")
    sinks.write_tsv(out, args.out)
    print(args.out)
    return 0


def cmd_compact(args) -> int:
    """Global exact dedup + canonical sort across all shards (the
    whole-graph idempotent materialization, K4)."""
    from octoray.pipelines.kg import compact

    print(compact(args.input, args.out))
    return 0


def cmd_delete(args) -> int:
    """Scoped retraction (reference `octofludb update` delete templates,
    ui.py:544-560 and the named `delete` subcommands, ui.py:1364-1462):
    --pred / --tag / --step / --shape over a built graph dir."""
    from octoray.pipelines.update import delete_where, retract_step

    if args.shape:
        # named delete templates (reference `octofludb delete
        # constellations|subtypes|us-clades|gl-clades|motifs`) — the
        # bundled .rq mirror runs through the SPARQL delete planner
        # (whole-predicate fast path or general pattern-bound path)
        from octoray.sparql import delete_via_file

        path = os.path.join(os.path.dirname(__file__), "data",
                            f"delete-{args.shape.replace('-', '_')}.rq")
        with open(path) as fh:
            print(json.dumps(delete_via_file(args.graph, fh.read())))
    if args.step:
        for s in args.step:
            print(retract_step(args.graph, s))
    if args.pred or args.tag:
        print(delete_where(args.graph, predicates=args.pred or None, tag=args.tag))
    return 0


def cmd_crawl(args) -> int:
    """Snapshot-maintenance ops over a crawl parquet dir (or the
    deterministic synthetic crawl when --pages is given): latest
    (CDX collapse), delta (added/removed/changed between --from/--to),
    domains (per-domain stats)."""
    from octoray.stages.crawl import crawl_delta, domain_stats, latest_per_url

    if args.pages:
        from octoray.sources.crawl import crawl_dataset

        ds = crawl_dataset(args.pages, n_snapshots=args.snapshots)
    elif args.input:
        import ray.data as rd

        ds = rd.read_parquet(args.input)
    else:
        raise SystemExit("crawl: provide either --input DIR or --pages N")
    if args.kind == "latest":
        out = latest_per_url(ds)
    elif args.kind == "delta":
        out = crawl_delta(ds, args.snap_from, args.snap_to)
    else:
        out = domain_stats(ds)
    if hasattr(out, "write_parquet"):
        out.write_parquet(args.out)
    else:
        # always a parquet DIRECTORY, same shape as the Dataset branch
        import pyarrow.parquet as pq

        os.makedirs(args.out, exist_ok=True)
        pq.write_table(out, os.path.join(args.out, "part-0.parquet"))
    print(args.out)
    return 0


def cmd_ingest(args) -> int:
    """Incremental snapshot ingestion: a pages parquet dir (url, text)
    into a provenance-tracked triple store — only changed content pays
    emission, superseded triples are retracted (pipelines/ingest.py)."""
    import ray.data as rd

    from octoray.pipelines.ingest import ingest_snapshot

    r = ingest_snapshot(rd.read_parquet(args.input), args.store)
    print(json.dumps({k: v for k, v in r.items() if k != "pages_seen"}))
    return 0


def cmd_warc(args) -> int:
    """WARC container io: ``read`` parses shards to a pages parquet
    dir; ``write`` packs a pages parquet dir into WARC shards."""
    from octoray.sources.warc import read_warc, write_warc

    if args.kind == "read":
        read_warc(args.input).write_parquet(args.out)
    else:
        import ray.data as rd

        write_warc(rd.read_parquet(args.input), args.out,
                   payload_col=args.payload_col)
    print(args.out)
    return 0


def cmd_init(args) -> int:
    """Initialize an EMPTY graph store (reference `init`, ui.py:120-160
    creates the GraphDB repository): a zero-row canonical-schema shard
    so every store consumer (query / sparql / fetch / upload / ingest)
    runs against it from zero.  Idempotent — an existing store is left
    untouched."""
    import pyarrow.parquet as pq

    from octoray.model import triples_to_table

    part = os.path.join(args.store, "shard=00000")
    if any(d.startswith("shard=") for d in os.listdir(args.store)) \
            if os.path.isdir(args.store) else False:
        print(f"store exists: {args.store}")
        return 0
    os.makedirs(part, exist_ok=True)
    pq.write_table(triples_to_table([]), os.path.join(part, "part-0.parquet"))
    print(f"initialized empty store: {args.store}")
    return 0


def cmd_upload(args) -> int:
    """Load Turtle file(s) into a graph store (reference `upload`,
    ui.py:561-589): parse distributed (one task per file), exact-dedup,
    land in a CONTENT-ADDRESSED ``shard=upload-<md5>`` partition — so
    re-uploading identical content rewrites the same partition and the
    store stays idempotent, the K4 contract."""
    from octoray.pipelines.update import land_triples
    from octoray.sources.turtle import read_turtle

    res = land_triples(args.store, read_turtle(args.files),
                       prefix="upload")
    print(f"uploaded {res['triples']} triples -> {res['partition']}")
    return 0


def cmd_fetch(args) -> int:
    """The reference's fetch lifecycle (ui.py:1090-1260):

    ``fetch tag --ids FILE``    push the ids as f:query_tag triples
                                into the store (idempotent partition);
    ``fetch strain``            with ``--ids``: the direct tagged
                                report (UNION id-resolution +
                                GROUP_CONCAT/MIN, TSV); without: run
                                the bundled get-tagged-strain-shaped
                                tagged.rq through the SPARQL engine
                                against the PUSHED tags;
    ``fetch clear``             retract every pushed tag (the
                                clear-query-tags.rq DELETE shape)."""
    import os as _os
    import shutil as _shutil

    from octoray import sinks
    from octoray.pipelines.pull import read_graph

    if args.kind == "tag":
        import pyarrow.parquet as pq

        from octoray.model import make_query_tag_uri, triples_to_table

        with open(args.ids, "r", encoding="utf-8") as fh:
            ids = [ln.strip() for ln in fh if ln.strip()]
        part = _os.path.join(args.graph, "shard=querytags")
        _shutil.rmtree(part, ignore_errors=True)
        _os.makedirs(part, exist_ok=True)
        pq.write_table(
            triples_to_table(sorted(
                {(make_query_tag_uri(), "f:query_tag", i, "")
                 for i in ids})),
            _os.path.join(part, "part-0.parquet"))
        print(f"tagged {len(set(ids))} ids -> {part}")
        return 0
    if args.kind == "clear":
        from octoray.sparql import delete_via_file

        with open(_rq_data("clear-query-tags.rq")) as fh:
            res = delete_via_file(args.graph, fh.read())
        print(res)
        return 0
    if args.kind == "strain" and args.ids:
        from octoray.pipelines.reports import tagged_strain_report

        with open(args.ids, "r", encoding="utf-8") as fh:
            ids = [ln.strip() for ln in fh if ln.strip()]
        out = tagged_strain_report(read_graph(args.graph), ids)
    else:
        # reference ui.py:1138-1205: one bundled query per entity
        # level, always against the PUSHED tags
        from octoray.sparql import run_file

        rq = {"strain": "tagged.rq",
              "isolate": "tagged-isolate.rq",
              "segment": "tagged-segment.rq",
              "sequence": "tagged-sequence.rq"}[args.kind]
        out = run_file(read_graph(args.graph), _rq_data(rq))
    if args.kind == "sequence":
        # fasta=True convention: the LAST projected variable is the
        # sequence, the header '|'-joins the rest (ui.py:1196)
        cols = out.schema().names
        sinks.write_fasta(out, cols, args.out)
    else:
        sinks.write_tsv(out, args.out)
    print(args.out)
    return 0


def _rq_data(name: str) -> str:
    import os as _os

    import octoray

    return _os.path.join(_os.path.dirname(octoray.__file__), "data", name)


def cmd_query(args) -> int:
    """Triple-pattern scan: 's,p,o' with '?' wildcards; multiple
    ';'-separated clauses are a CONJUNCTION over the subject (the
    SPARQL multi-clause family) — prints matching subjects."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from octoray.pipelines.pull import read_graph

    clauses = [c for c in args.pattern.split(";") if c.strip()]
    if len(clauses) > 1:
        from octoray.query import subjects_matching_all

        parsed = []
        for c in clauses:
            _s, p, o = (x.strip() for x in c.split(","))
            parsed.append((p, None if o == "?" else o))
        ds = read_graph(args.graph)
        n = 0
        for b in subjects_matching_all(ds, parsed).iter_batches(batch_format="pyarrow"):
            for v in b.column("subject").to_pylist():
                print(v)
                n += 1
                if args.limit and n >= args.limit:
                    return 0
        return 0

    s, p, o = (x.strip() for x in args.pattern.split(","))
    ds = read_graph(args.graph)

    def f(t: pa.Table) -> pa.Table:
        for col, want in (("subject", s), ("predicate", p), ("object", o)):
            if want != "?":
                t = t.filter(pc.equal(t.column(col), pa.scalar(want)))
        return t

    n = 0
    for batch in ds.map_batches(f, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for row in zip(*(batch.column(c).to_pylist() for c in batch.schema.names)):
            print("\t".join(row))
            n += 1
            if args.limit and n >= args.limit:
                return 0
    return 0


def cmd_classify(args) -> int:
    """Classify FASTA sequences against a clade panel — the
    reference's ``octofludb classify`` (ui.py:473-515, octoFLU-shaped
    output TSV).  The panel is a reference FASTA whose headers carry
    ``clade|gl_clade|subtype`` (``--panel``); without one, the
    deterministic synthetic panel stands in (sandbox default)."""
    import pyarrow as pa
    import ray.data as rd

    from octoray.sources.fasta import parse_fasta
    from octoray.stages.classify import classify_clades, synth_panel

    with open(args.fasta) as fh:
        rows = parse_fasta(fh.read())
    seqs = rd.from_arrow(pa.table({
        "seqid": pa.array([r[0] for r in rows], pa.string()),
        "dnaseq": pa.array([r[-1] for r in rows], pa.string()),
    }))
    if args.panel:
        with open(args.panel) as fh:
            prows = parse_fasta(fh.read())
        panel = [(r[0], r[1] if len(r) > 2 else r[0],
                  r[2] if len(r) > 3 else "", r[-1]) for r in prows]
    else:
        panel = synth_panel()
    out = classify_clades(seqs, panel)
    import sys

    fh = open(args.out, "w") if args.out else sys.stdout
    try:
        cols = None
        for b in out.iter_batches(batch_format="pyarrow"):
            if cols is None:
                cols = b.schema.names
                fh.write("\t".join(cols) + "\n")
            for row in zip(*(b.column(c).to_pylist() for c in cols)):
                fh.write("\t".join(str(v) for v in row) + "\n")
    finally:
        if args.out:
            fh.close()
    return 0


def cmd_sparql(args) -> int:
    """Run a SPARQL .rq file against a built graph store — the
    reference's arbitrary-SPARQL entry points (``octofludb query
    x.rq`` / ``construct`` / ``update``, ui.py:436-560).  SELECT
    prints TSV (header + rows); CONSTRUCT writes Turtle to --out or
    prints; DELETE applies predicate-shape retraction to the store;
    INSERT lands its result in a content-addressed store partition."""
    from octoray.pipelines.pull import read_graph
    from octoray.sparql import (delete_via_file, insert_via_file,
                                parse_sparql, execute)

    params = {}
    for kv in args.param or []:
        k, _, v = kv.partition("=")
        params[k] = v
    with open(args.file) as fh:
        text = fh.read()
    q = parse_sparql(text, params=params)
    if q.form == "delete":
        res = delete_via_file(args.graph, text, params=params)
        print(res)
        return 0
    if q.form == "insert":
        res = insert_via_file(args.graph, text, params=params)
        print(res)
        return 0
    out = execute(q, read_graph(args.graph))
    if args.parquet:
        # resumable partitioned output (the house rule for anything
        # that may be large): a directory of parts, not one file
        out.write_parquet(args.parquet)
        print(args.parquet)
        return 0
    if q.form == "construct":
        from octoray.sinks import write_turtle

        if args.out:
            write_turtle(out, args.out)
        else:
            for b in out.iter_batches(batch_format="pyarrow"):
                for row in zip(*(b.column(c).to_pylist()
                                 for c in b.schema.names)):
                    print("\t".join(row))
        return 0
    import sys

    if getattr(args, "fasta", False):
        # the reference query --fasta convention (ui.py:451-453 ->
        # formatting.py:10-27): last SELECT variable is the sequence
        from octoray import sinks

        cols = out.schema().names
        if args.out:
            sinks.write_fasta(out, cols, args.out)
        else:
            for b in sinks.fasta_text(out, cols).iter_batches(
                    batch_format="pyarrow"):
                for entry in b.column("entry").to_pylist():
                    print(entry)
        return 0
    fh = open(args.out, "w") if args.out else sys.stdout
    try:
        cols = None
        for b in out.iter_batches(batch_format="pyarrow"):
            if cols is None:
                cols = b.schema.names
                if not getattr(args, "no_header", False):
                    fh.write("\t".join(cols) + "\n")
            for row in zip(*(b.column(c).to_pylist() for c in cols)):
                fh.write("\t".join("" if v is None else str(v)
                                   for v in row) + "\n")
    finally:
        if args.out:
            fh.close()
    return 0



def cmd_webgraph(args) -> int:
    """Web link-graph products over a pages parquet dir (url, html)
    or the deterministic synthetic crawl (--pages N): the
    cc-webgraph-style release family (ranks, anchor index, structure
    stats, frontier)."""
    from octoray.stages import webgraph as W

    if args.pages:
        from octoray.sources.webtext import pages_dataset

        pages = pages_dataset(args.pages).select_columns(["url", "html"])
    elif args.input:
        import ray.data as rd

        pages = rd.read_parquet(args.input)
    else:
        raise SystemExit("webgraph: provide either --input DIR or --pages N")
    links = W.links_dataset(pages)
    kind = args.kind
    if kind == "links":
        out = links
    elif kind == "anchors":
        out = W.anchor_summary(links)
    elif kind == "names":
        out = W.anchor_names(links, k=args.k or 1)
    elif kind == "rank":
        out = W.link_rank(links)
    elif kind == "harmonic":
        out = W.harmonic_rank(links)
    elif kind == "hits":
        out = W.hits_rank(links)
    elif kind == "trustrank":
        from octoray.stages.graphalgo import trustrank_edges

        out = trustrank_edges(W.internal_edges(links))
    elif kind == "katz":
        from octoray.stages.graphalgo import katz_edges

        out = katz_edges(W.internal_edges(links))
    elif kind == "frontier":
        out = W.frontier_urls(links, pages)
    elif kind == "degrees":
        out = W.degree_histogram(links)
    elif kind == "reciprocity":
        out = W.reciprocity(links)
    elif kind == "assortativity":
        from octoray.stages.graphalgo import assortativity

        out = assortativity(W.internal_edges(links))
    elif kind == "bowtie":
        out = W.bowtie(links)
    elif kind == "cocitation":
        out = W.cocitation(links, k=args.k or 100)
    elif kind == "diameter":
        from octoray.stages.graphalgo import distance_histogram

        out = distance_histogram(W.internal_edges(links))
    else:  # hostgraph
        out = W.host_graph(links)
    out.write_parquet(args.out)
    print(f"webgraph {kind}: wrote {args.out}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="octoray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build"); b.add_argument("--pages", type=int, required=True)
    b.add_argument("--out", required=True); b.add_argument("--shards", type=int, default=8)
    b.add_argument("--no-resume", action="store_true"); b.set_defaults(fn=cmd_build)

    pl = sub.add_parser("pull"); pl.add_argument("--pages", type=int, required=True)
    pl.add_argument("--out", required=True); pl.add_argument("--shards", type=int, default=8)
    pl.add_argument("--no-resume", action="store_true"); pl.set_defaults(fn=cmd_pull)

    pr = sub.add_parser("prep"); pr.add_argument("kind",
        choices=["fasta", "unpublished", "table", "blast", "gisaid",
                 "ivr", "ird", "tag", "gbids", "update-gb"])
    pr.add_argument("input"); pr.add_argument("--out", required=True)
    pr.add_argument("--tag"); pr.add_argument("--timestamp", default="")
    pr.add_argument("--include", default="",
                    help="only parse using these classifiers (comma list)")
    pr.add_argument("--exclude", default="",
                    help="remove these classifiers (comma list)")
    pr.add_argument("--nmonths", type=int, default=3,
                    help="update-gb: trailing months to synthesize")
    pr.add_argument("--per-month", type=int, default=20, dest="per_month",
                    help="update-gb: records per month (synthetic)")
    pr.add_argument("--base-url", default="", dest="base_url",
                    help="Entrez-shaped endpoint for prep gbids: fetch "
                         "records over HTTP via the retrying actor pool "
                         "instead of the deterministic synthesizer")
    pr.add_argument("--segment-key", action="store_true", dest="segment_key",
                    help="table: treat the first column as a forced segment id")
    pr.set_defaults(fn=cmd_prep)

    rp = sub.add_parser("report"); rp.add_argument("kind",
        choices=["masterlist", "quarter", "subtypes", "constellations",
                 "monthly"])
    rp.add_argument("input"); rp.add_argument("--out", required=True)
    rp.set_defaults(fn=cmd_report)

    cp = sub.add_parser("compact"); cp.add_argument("input")
    cp.add_argument("--out", required=True); cp.set_defaults(fn=cmd_compact)

    dl = sub.add_parser("delete"); dl.add_argument("--graph", required=True)
    dl.add_argument("--pred", action="append", help="retract all triples with this predicate")
    dl.add_argument("--tag", help="retract this tag's assignment triples")
    dl.add_argument("--step", action="append", help="drop a derived step partition")
    dl.add_argument("--shape", choices=["constellations", "subtypes",
                                        "us-clades", "gl-clades", "motifs"],
                    help="named delete template (reference `octofludb "
                         "delete X`, ui.py:1364-1462)")
    dl.set_defaults(fn=cmd_delete)

    cw = sub.add_parser("crawl"); cw.add_argument("kind",
        choices=["latest", "delta", "domains"])
    cw.add_argument("--input", help="crawl parquet dir")
    cw.add_argument("--pages", type=int, default=0,
                    help="synthesize this many pages instead of --input")
    cw.add_argument("--snapshots", type=int, default=4)
    cw.add_argument("--from", dest="snap_from", type=int, default=0)
    cw.add_argument("--to", dest="snap_to", type=int, default=3)
    cw.add_argument("--out", required=True); cw.set_defaults(fn=cmd_crawl)

    wg = sub.add_parser("webgraph"); wg.add_argument("kind",
        choices=["links", "anchors", "names", "rank", "harmonic", "hits",
                 "trustrank", "katz", "frontier", "degrees", "reciprocity",
                 "assortativity", "bowtie", "cocitation", "diameter",
                 "hostgraph"])
    wg.add_argument("--input", help="pages parquet dir (url, html)")
    wg.add_argument("--pages", type=int, default=0,
                    help="synthesize this many pages instead of --input")
    wg.add_argument("-k", type=int, default=0)
    wg.add_argument("--out", required=True); wg.set_defaults(fn=cmd_webgraph)

    ig = sub.add_parser("ingest"); ig.add_argument("input",
        help="pages parquet dir (url, text)")
    ig.add_argument("--store", required=True); ig.set_defaults(fn=cmd_ingest)

    wc = sub.add_parser("warc"); wc.add_argument("kind", choices=["read", "write"])
    wc.add_argument("input"); wc.add_argument("--out", required=True)
    wc.add_argument("--payload-col", default="html"); wc.set_defaults(fn=cmd_warc)

    q = sub.add_parser("query"); q.add_argument("pattern")
    q.add_argument("--graph", required=True); q.add_argument("--limit", type=int, default=0)
    q.set_defaults(fn=cmd_query)

    cl = sub.add_parser("classify"); cl.add_argument("fasta")
    cl.add_argument("--panel", default=None)
    cl.add_argument("--out", default=None); cl.set_defaults(fn=cmd_classify)

    sq = sub.add_parser("sparql"); sq.add_argument("file")
    sq.add_argument("--graph", required=True)
    sq.add_argument("--out", default=None)
    sq.add_argument("--parquet", default=None,
                    help="write results as a partitioned parquet dir "
                         "instead of TSV/Turtle")
    sq.add_argument("--param", action="append",
                    help="macro substitution KEY=VALUE (e.g. __YEAR__=2021)")
    sq.add_argument("--fasta", action="store_true",
                    help="FASTA output: last SELECT variable is the "
                         "sequence (reference query --fasta)")
    sq.add_argument("--no-header", action="store_true", dest="no_header",
                    help="omit the TSV header row (reference --header "
                         "toggle)")
    sq.set_defaults(fn=cmd_sparql)

    # reference surface parity: `construct FILE.rq` and `update
    # FILE.rq` are the reference's dedicated commands (ui.py:517-554)
    # for what `sparql` dispatches by query form — same handler
    for alias in ("construct", "update"):
        al = sub.add_parser(
            alias, help=f"run a {alias.upper()} .rq file against a "
                        "store (alias of `sparql`)")
        al.add_argument("file")
        al.add_argument("--graph", required=True)
        al.add_argument("--out", default=None)
        al.add_argument("--parquet", default=None)
        al.add_argument("--param", action="append")
        al.set_defaults(fn=cmd_sparql, fasta=False, no_header=False)

    ini = sub.add_parser("init")
    ini.add_argument("--store", required=True)
    ini.set_defaults(fn=cmd_init)

    up = sub.add_parser("upload")
    up.add_argument("files", nargs="+", help="Turtle file(s) to load")
    up.add_argument("--store", required=True)
    up.set_defaults(fn=cmd_upload)

    fe = sub.add_parser("fetch")
    fe.add_argument("kind", choices=["tag", "isolate", "strain",
                                     "segment", "sequence", "clear"])
    fe.add_argument("--graph", required=True)
    fe.add_argument("--ids", default=None,
                    help="file with one free-form id per line (required "
                         "for 'tag'; for 'strain' omit to use the tags "
                         "pushed into the graph)")
    fe.add_argument("--out", default="/tmp/fetch_out.tsv")
    fe.set_defaults(fn=cmd_fetch)

    args = ap.parse_args(argv)
    _init_ray()
    try:
        return args.fn(args)
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
