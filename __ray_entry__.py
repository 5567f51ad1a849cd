"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline; ``queries()`` exposes one
callable per implemented operator family from SURVEY.md §2 (+ the
training-data ops); ``oracle_sql()`` gives the DuckDB twin for every
SQL-expressible query.  Cross-engine float parity follows
``octoray/util.py``: exact integer-cents sums and the shared
floor(x*10^d + 0.5)/10^d rounding formula on BOTH sides.

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code.
"""

from __future__ import annotations

import os
import re as _re
from collections.abc import Callable
from typing import Any

# ----------------------------------------------------------------------
# shared constants (must match the library defaults they mirror)
# ----------------------------------------------------------------------
_JACCARD_K = 3
_JACCARD_MAXDF = 1000  # must mirror octoray.stages.dedup.jaccard_pairs default
_KNN_IDS = [3, 7, 11, 19, 23]
_KNN_K = 5
_GAP_MIN = 30.0
_BM25_TERMS = ["sort", "window", "merge"]
_PROFILE_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
_RRF_QID = 3
_GAP_US = int(_GAP_MIN * 60 * 1_000_000)


def _sf_of(sf_dir: str) -> float:
    m = _re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.01


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _events(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"))


# ----------------------------------------------------------------------
# entry: the flagship KG construction pipeline
# ----------------------------------------------------------------------
def entry() -> Any:
    """Flagship: synthetic Common-Crawl-style pages UNION the sf0.001
    documents table (adapted to the page contract) -> extract ->
    mention scan/emit (actor pool) -> canonicalize (dedup shuffle +
    sort).  Returns the canonical triple Dataset."""
    from octoray.pipelines.kg import build_triples, docs_as_pages, pages_dataset
    from octoray.stages.canon import canonicalize

    pages = pages_dataset(500, seed=42)
    t1 = build_triples(pages, extract=True, n_rows_hint=500)
    docs = _docs("/root/testdata/sf0.001")
    t2 = build_triples(docs_as_pages(docs), extract=False, emitter_concurrency=2)
    return canonicalize(t1.union(t2))


# ----------------------------------------------------------------------
# queries
# ----------------------------------------------------------------------
_PIVOT_SPEC = {"dates": "f:date", "subtypes": "f:subtype", "names": "f:strain_name"}


def _kg_pages(sf_dir: str) -> int:
    return max(200, int(200_000 * _sf_of(sf_dir)))


_KG_RAW_CACHE: dict = {}


def _kg_raw(sf_dir: str, dump_name: str):
    """Raw (pre-dedup) emitted triples for the KG queries.  When oracle
    dumping is on, the raw stream is materialized to parquet (the
    DuckDB twin's hand-off artifact — emission upstream is covered by
    the P/R gate, everything downstream by the oracle) and read back so
    emission runs once; bench disables dumping and streams directly.

    The emitted Dataset is memoized per (sf_dir, n) for the process:
    every KG query reads the SAME synthetic corpus, and the store-backed
    deployment path builds the graph once and queries it many times —
    re-running the mention emitter per query measured the build N
    extra times, not the operators.  The flagship build cost stays
    measured by `bench.py --headline` / the kg_build manifests; oracle
    dumps still land per query (written from the cached blocks)."""
    from octoray import oracles as O
    from octoray.pipelines.kg import build_triples, pages_dataset

    n = _kg_pages(sf_dir)
    raw = _KG_RAW_CACHE.get((sf_dir, n))
    if raw is None:
        raw = build_triples(
            pages_dataset(n, seed=42), n_rows_hint=n).materialize()
        _KG_RAW_CACHE[(sf_dir, n)] = raw
    if O.dump_enabled():
        return O.read_triples(O.dump_dataset(dump_name, raw))
    return raw


def _q_tier_balanced_sample(sf_dir: str):
    """Curriculum-balancing curation primitive: equal-sized
    deterministic samples from every quality tier — global NTILE(4)
    over (n_chars, doc_id), then the md5 bottom-k rows per tier (the
    engine's hash-as-randomness convention, reproducible run-to-run
    and engine-to-oracle).  Composition of two verified pieces:
    textops.ntile_tiers -> query.group_sample."""
    from octoray.query import group_sample
    from octoray.stages.textops import ntile_tiers

    tiers = ntile_tiers(
        _docs(sf_dir).select_columns(["doc_id", "n_chars"]), 4)
    return group_sample(tiers, ["tier"], "doc_id", k=8)


def _q_kg_build(sf_dir: str):
    from octoray.stages.canon import canonicalize

    return canonicalize(_kg_raw(sf_dir, "kg_build_raw"))


def _q_kg_build_cold(sf_dir: str):
    """UNCACHED flagship build (VERDICT r4 #3): page synth -> extract ->
    mention scan/emit -> dedup shuffle -> canonical sort with NO
    memoized emission, so emitter regressions are visible in the bench
    suite, not only in ``bench.py --headline``.  Same oracle boundary
    as kg_build (raw pre-canonical dump; emission covered by the P/R
    gate)."""
    from octoray import oracles as O
    from octoray.pipelines.kg import build_triples, pages_dataset
    from octoray.stages.canon import canonicalize

    n = _kg_pages(sf_dir)
    raw = build_triples(pages_dataset(n, seed=42), n_rows_hint=n)
    if O.dump_enabled():
        raw = O.read_triples(O.dump_dataset("kg_build_cold_raw", raw))
    return canonicalize(raw)


def _q_kg_subject_degree(sf_dir: str):
    from octoray.stages.canon import dedup_triples, subject_degree

    triples = dedup_triples(_kg_raw(sf_dir, "kg_degree_raw"))
    return subject_degree(triples).sort("subject")


def _q_kg_strain_dates(sf_dir: str):
    """Triple-pattern query layer (J3 pivot family) over the built KG:
    per strain subject, '+'-joined distinct dates and subtypes."""
    from octoray.query import pivot_subjects
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "kg_pivot_raw"))
    return pivot_subjects(triples, _PIVOT_SPEC)


def _synth_n(sf_dir: str, per_sf: int = 50_000, floor: int = 50) -> int:
    return max(floor, int(per_sf * _sf_of(sf_dir)))


def _prep_canon(dump_name: str, raw_ds):
    """Dump-boundary wrapper for the prep family: the raw pre-canonical
    triple stream is the oracle hand-off artifact (recognizer emission
    upstream is covered by the ~160 ported unit vectors + the P/R
    gate); the canonicalization shuffle downstream of the artifact is
    what the DuckDB twin verifies — the same boundary as kg_build."""
    from octoray import oracles as O
    from octoray.stages.canon import canonicalize

    if O.dump_enabled():
        raw_ds = O.read_triples(O.dump_dataset(dump_name, raw_ds))
    return canonicalize(raw_ds)


def _q_prep_fasta(sf_dir: str):
    from octoray.pipelines.prep import prep_fasta
    from octoray.sources.fasta import fasta_rows
    from octoray.sources.synth import synth_fasta_text

    raw = prep_fasta(fasta_rows(synth_fasta_text(_synth_n(sf_dir, 20_000))),
                     canonical=False)
    return _prep_canon("prep_fasta_raw", raw)


def _q_prep_unpublished(sf_dir: str):
    """§2.11 forced-role ingestion (IrregularFasta, recipes.py:510-543):
    field 0 forced to strain_id, sequences auto-tagged 'unpublished'."""
    from octoray.pipelines.prep import prep_unpublished
    from octoray.sources.fasta import fasta_rows
    from octoray.sources.synth import synth_unpublished_fasta_text

    raw = prep_unpublished(
        fasta_rows(synth_unpublished_fasta_text(_synth_n(sf_dir, 20_000))),
        tag="unpub-batch", timestamp="2026-01-01T00:00:00",
        canonical=False)
    return _prep_canon("prep_unpublished_raw", raw)


def _q_prep_table(sf_dir: str):
    from octoray.pipelines.prep import prep_table
    from octoray.sources.synth import synth_tsv_text
    from octoray.sources.tables import tsv_rows

    raw = prep_table(tsv_rows(synth_tsv_text(_synth_n(sf_dir, 20_000))),
                     canonical=False)
    return _prep_canon("prep_table_raw", raw)


def _q_prep_blast(sf_dir: str):
    import ray.data as rd

    from octoray import oracles as O
    from octoray.pipelines.prep import prep_blast
    from octoray.sources.synth import synth_blast_table

    tbl = synth_blast_table(_synth_n(sf_dir))
    if O.dump_enabled():
        O.dump_table("prep_blast_input", tbl)
    return prep_blast(rd.from_arrow(tbl))


def _q_kg_rules(sf_dir: str):
    """KG build + ontology expansion (subPropertyOf + transitive
    locatedIn) — the GraphDB-reasoner semantics as explicit stages."""
    from octoray.stages.canon import dedup_triples
    from octoray.stages.rules import expand_locations, expand_subproperties

    triples = _kg_raw(sf_dir, "kg_rules_raw")
    return dedup_triples(expand_locations(expand_subproperties(triples)))


def _q_classify_clades(sf_dir: str):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from octoray import oracles as O
    from octoray.stages.classify import classify_clades, synth_panel, synth_query_seqs

    panel = synth_panel()
    q = synth_query_seqs(_synth_n(sf_dir, 20_000), panel)
    if O.dump_enabled():
        from octoray.stages.classify import _KMER, _kmer_profile

        d = 4 ** _KMER
        prof = np.stack([_kmer_profile(s) for s in q.column("dnaseq").to_pylist()])
        O.dump_table("classify_profiles", pa.table({
            "seqid": q.column("seqid"),
            "profile": pa.FixedSizeListArray.from_arrays(
                pa.array(prof.reshape(-1), pa.float64()), d),
        }))
        pprof = np.stack([_kmer_profile(s) for _, _, _, s in panel])
        O.dump_table("classify_panel", pa.table({
            "pidx": pa.array(range(len(panel)), pa.int64()),
            "clade": pa.array([c for c, _, _, _ in panel], pa.string()),
            "gl_clade": pa.array([g for _, g, _, _ in panel], pa.string()),
            "segment_subtype": pa.array([s for _, _, s, _ in panel], pa.string()),
            "profile": pa.FixedSizeListArray.from_arrays(
                pa.array(pprof.reshape(-1), pa.float64()), d),
        }))
    return classify_clades(
        rd.from_arrow(q.select(["seqid", "dnaseq"])), panel, concurrency=(1, 4)
    ).select_columns(["seqid", "segment_subtype", "clade", "gl_clade"])


def _q_motifs(sf_dir: str):
    import pyarrow as pa
    import ray.data as rd

    from octoray import oracles as O
    from octoray.stages.classify import extract_motifs, synth_panel, synth_query_seqs

    q = synth_query_seqs(_synth_n(sf_dir, 20_000), synth_panel())
    if O.dump_enabled():
        from octoray.stages.classify import dna_to_aa

        aa = [dna_to_aa(s) for s in q.column("dnaseq").to_pylist()]
        O.dump_table("motifs_aa", pa.table({
            "seqid": q.column("seqid"), "aa": pa.array(aa, pa.string())}))
    return extract_motifs(rd.from_arrow(q.select(["seqid", "dnaseq"])), subtype="H1")


def _q_kg_monthly(sf_dir: str):
    from octoray.pipelines.reports import kg_monthly_report
    from octoray.stages.canon import dedup_triples

    return kg_monthly_report(dedup_triples(_kg_raw(sf_dir, "kg_monthly_raw")))


def _q_kg_tagged_report(sf_dir: str):
    import pyarrow as pa

    from octoray import oracles as O
    from octoray.pipelines.reports import tagged_strain_report
    from octoray.sources.webtext import page_record
    from octoray.stages.canon import dedup_triples

    # tag the strains of the first 40 pages by their raw strain-name id
    ids = []
    for pid in range(40):
        fields = page_record(pid, 42)[1]
        if fields:
            ids.append(fields[0])
    if O.dump_enabled():
        O.dump_table("kg_tagged_ids", pa.table({"id": pa.array(ids, pa.string())}))
    triples = dedup_triples(_kg_raw(sf_dir, "kg_tagged_raw"))
    return tagged_strain_report(triples, ids)


def _q_pull(sf_dir: str):
    """Full incremental pull: sharded base build + fixpoint derived
    steps (quarters, located), returned as the globally-compacted
    graph (dedup across shards = the compact() semantic, and the shape
    the DuckDB twin re-derives from the raw base triples)."""
    import shutil
    import tempfile

    from octoray import oracles as O
    from octoray.pipelines.pull import pull, read_graph
    from octoray.stages.canon import dedup_triples

    n = max(200, int(50_000 * _sf_of(sf_dir)))
    if O.dump_enabled():
        from octoray.pipelines.kg import build_triples, pages_dataset

        O.dump_dataset("kg_pull_raw", build_triples(pages_dataset(n, seed=42), n_rows_hint=n))
    d = tempfile.mkdtemp(prefix="octoray_pull_")
    try:
        pull(n, d, n_shards=4)
        return dedup_triples(read_graph(d)).materialize()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _q_kg_delete(sf_dir: str):
    """The delete-then-recompute update cycle (reference ui.py:544-560):
    build + derive, retract a base predicate (partition rewrite) AND a
    whole derived class (partition drop), re-pull to recompute, return
    the compacted graph.  The oracle re-derives the same graph from the
    raw triples with the deleted predicate excluded."""
    import shutil
    import tempfile

    from octoray import oracles as O
    from octoray.pipelines.pull import pull, read_graph
    from octoray.pipelines.update import delete_where
    from octoray.stages.canon import dedup_triples

    n = max(200, int(50_000 * _sf_of(sf_dir)))
    if O.dump_enabled():
        from octoray.pipelines.kg import build_triples, pages_dataset

        O.dump_dataset("kg_delete_raw", build_triples(pages_dataset(n, seed=42), n_rows_hint=n))
    d = tempfile.mkdtemp(prefix="octoray_del_")
    try:
        pull(n, d, n_shards=4)
        delete_where(d, predicates=["f:genbank_id"])
        pull(n, d, n_shards=4, refresh=["quarters"])
        return dedup_triples(read_graph(d)).materialize()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _q_kg_delete_bound(sf_dir: str):
    """General pattern-bound SPARQL DELETE against a built store (the
    reference's delete-motifs.rq shape class, ui.py:1440-1462): the
    template is instantiated by the WHERE's bindings — here the
    subtype triples of swine-host subjects, a join constraint no
    static predicate filter expresses — then retracted EXACTLY via
    hash-probed partition rewrites (update.delete_exact).  Oracle:
    anti-join twin over the dumped raw triples."""
    import os
    import shutil
    import tempfile

    import ray.data as rd

    from octoray.sparql import delete_via_file
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(
        _kg_raw(sf_dir, "kg_delete_bound_raw")).materialize()
    d = tempfile.mkdtemp(prefix="octoray_delb_")
    try:
        triples.write_parquet(os.path.join(d, "shard=00000"))
        delete_via_file(d, """
            PREFIX f: <https://flu-crew.org/term/>
            DELETE { ?s f:subtype ?o . }
            WHERE { ?s f:subtype ?o . ?s f:host "swine" . }
        """)
        return dedup_triples(rd.read_parquet(d)).materialize()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _q_kg_construct(sf_dir: str):
    """SPARQL CONSTRUCT analogue (reference ui.py:523-541): BGP match
    on the built KG (subtype + date per subject), then template
    instantiation into a new derived graph.  Oracle re-derives with a
    SQL join + UNION ALL + DISTINCT."""
    from octoray.patterns import construct
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "kg_construct_raw"))
    return construct(
        triples,
        where=[("?s", "f:subtype", "?t"), ("?s", "f:date", "?d")],
        template=[
            ("?s", "f:dated_subtype", "?t"),
            ("?s", "f:obs_date", "?d"),
            ("?s", "f:has_observation", "yes"),
        ],
    )


def _q_kg_optional(sf_dir: str):
    """OPTIONAL clause (SPARQL left join) over the built KG: every
    subject with a subtype, its state when known, null otherwise."""
    from octoray.patterns import match_patterns, select_bindings
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "kg_optional_raw"))
    b = match_patterns(
        triples,
        [("?s", "f:subtype", "?t")],
        optionals=[("?s", "f:state", "?st")],
    )
    return select_bindings(b, ["s", "t", "st"])


def _q_kg_path(sf_dir: str):
    """Transitive property path (f:locatedIn+, SPARQL `p+`) over the
    full geography dimension via the distributed semi-naive closure;
    oracle is DuckDB's recursive CTE over the same materialized
    dimension."""
    import ray.data as rd

    from octoray import oracles as O
    from octoray.patterns import match_patterns, select_bindings
    from octoray.stages.rules import geography_facts

    geo = geography_facts()
    if O.dump_enabled():
        O.dump_table("kg_path_edges", geo)
    b = match_patterns(rd.from_arrow(geo), [("?x", "f:locatedIn+", "?a")])
    return select_bindings(b, ["x", "a"])


def _q_kg_path_star(sf_dir: str):
    """Zero-or-more property path (f:locatedIn*, SPARQL `p*`): the
    transitive closure UNION the identity over the predicate's node
    set (the engine's documented restriction of SPARQL's zero-length
    path); oracle adds the identity to the recursive-CTE closure."""
    import ray.data as rd

    from octoray import oracles as O
    from octoray.patterns import match_patterns, select_bindings
    from octoray.stages.rules import geography_facts

    geo = geography_facts()
    if O.dump_enabled():
        O.dump_table("kg_path_star_edges", geo)
    b = match_patterns(rd.from_arrow(geo), [("?x", "f:locatedIn*", "?a")])
    return select_bindings(b, ["x", "a"])


def _q_kg_incremental(sf_dir: str):
    """Incremental crawl -> KG ingestion (pipelines/ingest.py): four
    snapshots of the re-crawl ingested in order — only changed pages
    pay emission, superseded provenance is physically retracted.
    Returns the store's final graph.  The oracle hand-off is the
    immutable per-run emission log (each run's triples captured right
    after its commit, before later retractions touch the store); the
    SQL independently re-derives "per url, keep the latest run's
    triples" and must equal the physically maintained store."""
    return _kg_incremental_impl(sf_dir, suffix="", broadcast_limit=2_000_000)


def _q_kg_incremental_dist(sf_dir: str):
    """The SAME ingestion with ``broadcast_limit=0``: change detection
    runs the distributed (url, md5) anti-join instead of the broadcast
    ledger (the 100-TB path, VERDICT r2 next-step 1) and must converge
    to the identical graph under the identical latest-run oracle."""
    return _kg_incremental_impl(sf_dir, suffix="_dist", broadcast_limit=0)


def _kg_incremental_impl(sf_dir: str, *, suffix: str, broadcast_limit: int):
    import glob
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from octoray import oracles as O
    from octoray.pipelines.ingest import ingest_snapshot, read_ingest_graph
    from octoray.sources.crawl import crawl_dataset
    from octoray.stages.canon import dedup_triples

    n = max(100, int(20_000 * _sf_of(sf_dir)))
    S = 4
    store = tempfile.mkdtemp(prefix="octoray_ing_")
    log_parts = []
    try:
        for s in range(S):
            def snap(t: "pa.Table", s=s) -> "pa.Table":
                sel = t.filter(pc.equal(
                    pc.cast(t.column("snapshot"), pa.int64()), s))
                return pa.table({"url": sel.column("url"),
                                 "text": sel.column("text")})

            pages = crawl_dataset(n, n_snapshots=S).map_batches(
                snap, batch_format="pyarrow")
            r = ingest_snapshot(pages, store,
                                broadcast_limit=broadcast_limit)
            if O.dump_enabled() and r["run"] is not None:
                k = r["run"]
                for f in sorted(glob.glob(os.path.join(
                        store, "triples", f"run={k:04d}", "*.parquet"))):
                    t = pq.read_table(f)
                    log_parts.append(t.append_column(
                        "run", pa.array([k] * t.num_rows, pa.int64())))
        if O.dump_enabled():
            O.dump_table("ingest_log" + suffix, pa.concat_tables(log_parts))
            # the ledger is append-only (never rewritten), so the runs
            # on disk ARE the immutable re-ingestion record — a url
            # re-ingested with ZERO triples appears here but not in
            # the triple log, which is why the oracle keys on it
            led = [pq.read_table(f) for f in sorted(glob.glob(
                os.path.join(store, "ledger", "run=*", "*.parquet")))]
            O.dump_table("ingest_ledger" + suffix, pa.concat_tables(led))
        return dedup_triples(read_ingest_graph(store)).materialize()
    finally:
        shutil.rmtree(store, ignore_errors=True)


def _q_warc_roundtrip(sf_dir: str):
    """WARC container codec: pages -> gzipped WARC/1.0 shards (one
    gzip member per record, the Common Crawl layout) -> streaming
    read-back.  The parquet dump of the same pages is the oracle
    hand-off; equality of (url, second-truncated ts, byte length,
    payload md5) proves the codec roundtrips byte-exactly.  WARC-Date
    carries second resolution, so both sides truncate the timestamp."""
    import os

    from octoray import oracles as O
    from octoray.sources.warc import read_warc, write_warc
    from octoray.sources.webtext import pages_dataset

    n = _synth_n(sf_dir, 20_000, floor=200)

    def pages():
        return pages_dataset(n, seed=42).map_batches(
            lambda t: t.select(["url", "warc_ts", "html"]),
            batch_format="pyarrow")

    if O.dump_enabled():
        O.dump_dataset("warc_pages", pages())
    d = os.path.join(O.ORACLE_DIR, "warc_shards")
    write_warc(pages(), d)

    def project(t):
        import hashlib

        import pyarrow as pa
        import pyarrow.compute as pc

        payloads = t.column("payload").to_pylist()
        return pa.table({
            "url": t.column("url"),
            "warc_ts_us": pc.cast(t.column("warc_ts"), pa.int64()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            "payload_md5": pa.array(
                [hashlib.md5(p).hexdigest() for p in payloads], pa.string()),
        })

    return read_warc(d).map_batches(project, batch_format="pyarrow")


def _q_kg_filter_path(sf_dir: str):
    """The round-2 pattern-layer extensions in one query over
    KG ∪ geography: sequence path (f:state/f:name), alternation
    (f:genbank_id|f:barcode) and FILTER (regex + comparison).  The
    oracle re-derives the joins/filters in SQL over the dumped raw
    triples + the geo dimension."""
    import ray.data as rd

    from octoray import oracles as O
    from octoray.patterns import match_patterns, select_bindings
    from octoray.stages.canon import dedup_triples
    from octoray.stages.rules import geography_facts

    geo = geography_facts()
    if O.dump_enabled():
        O.dump_table("kg_fp_geo", geo)
    triples = dedup_triples(
        _kg_raw(sf_dir, "kg_fp_raw").union(rd.from_arrow(geo))
    )
    b = match_patterns(
        triples,
        [("?s", "f:strain_name", "?n"),
         ("?s", "f:state/f:name", "?state_name"),
         ("?s", "f:genbank_id|f:barcode", "?acc")],
        filters=[("n", "~", "^A/"), ("acc", "!=", "")],
    )
    return select_bindings(b, ["s", "n", "state_name", "acc"])


def _q_kg_filter_year(sf_dir: str):
    """Date-part accessors in the pattern-layer FILTER (reference
    wgs.rq:46-50 uses YEAR()/MONTH() in SPARQL): strains collected in
    H2 of a year.  Partial dates missing the month fail the MONTH()
    filter (SPARQL error semantics), which the oracle mirrors with
    try_cast -> NULL -> comparison false."""
    from octoray.patterns import match_patterns, select_bindings
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "kg_fy_raw"))
    b = match_patterns(
        triples,
        [("?s", "f:strain_name", "?n"), ("?s", "f:date", "?d")],
        filters=[("YEAR(?d)", ">=", 2017), ("YEAR(?d)", "<=", 2019),
                 ("MONTH(?d)", ">", 6)],
    )
    return select_bindings(b, ["s", "n", "d"])


def _q_kg_filter_or(sf_dir: str):
    """Disjunctive FILTER with BOUND() and an equality-IN — the
    reference's monthly-context.rq:28-31 expression shape
    ((date-range) || (YEAR(?d) > y && BOUND(?opt) && REGEX(?opt, ...)))
    plus masterlist.rq:28's ?x = "A" || ?x = "B" as an 'in' clause,
    over an OPTIONAL subtype binding."""
    from octoray.patterns import match_patterns, select_bindings
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "kg_for_raw"))
    b = match_patterns(
        triples,
        [("?s", "f:strain_name", "?n"), ("?s", "f:date", "?d"),
         ("?s", "f:host", "?h")],
        optionals=[("?s", "f:subtype", "?st")],
        filters=[
            ("?h", "in", ["swine", "human"]),
            ("or", [
                [("?d", ">", "2016"), ("?d", "<", "2019")],
                [("YEAR(?d)", ">", 2020), ("?st", "bound", True),
                 ("?st", "~", "^H[13]")],
            ]),
        ],
    )
    return select_bindings(b, ["s", "n", "d", "h", "st"])


def _q_kg_group_report(sf_dir: str):
    """SPARQL GROUP BY + aggregate head (the reference's
    get-tagged-strain.rq / masterlist.rq shape): BGP -> group by
    strain -> GROUP_CONCAT(DISTINCT date; separator='+') + MIN(date) +
    COUNT(DISTINCT segment)."""
    from octoray.patterns import aggregate_bindings, match_patterns
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "kg_ga_raw"))
    b = match_patterns(
        triples,
        [("?s", "f:strain_name", "?n"), ("?s", "f:date", "?d"),
         ("?s", "f:has_segment", "?g")],
    )
    return aggregate_bindings(
        b, ["s", "n"],
        [("d", "group_concat", "dates"), ("d", "min", "first_date"),
         ("g", "count_distinct", "n_segments")])


def _q_kg_monthly_bind(sf_dir: str):
    """The wgs.rq shape end-to-end through the GENERIC layer: BGP ->
    BIND(YEAR/MONTH(?date)) -> FILTER (month bound) -> GROUP BY
    (year, month) -> COUNT(DISTINCT strain).  The dedicated monthly
    report (kg_monthly_report) hard-codes this; here it runs through
    extend_bindings / apply_filters / aggregate_bindings."""
    from octoray.patterns import (aggregate_bindings, apply_filters,
                                  extend_bindings, match_patterns)
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "kg_mb_raw"))
    b = match_patterns(
        triples,
        [("?s", "f:strain_name", "?n"), ("?s", "f:date", "?d")])
    b = extend_bindings(b, [("year", "YEAR(?d)"), ("month", "MONTH(?d)")])
    b = apply_filters(b, [("MONTH(?d)", ">", 0)])
    return aggregate_bindings(
        b, ["year", "month"], [("s", "count_distinct", "n_strains")])


def _q_kg_values(sf_dir: str):
    """SPARQL VALUES analogue: an inline (host, host_label) table joins
    the BGP bindings — restricting to the listed hosts AND appending
    the mapped label column."""
    from octoray.patterns import match_patterns, select_bindings, values_bindings
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "kg_values_raw"))
    b = match_patterns(
        triples,
        [("?s", "f:strain_name", "?n"), ("?s", "f:host", "?h")])
    b = values_bindings(b, ["?h", "?host_label"],
                        [("swine", "pig"), ("human", "person")])
    return select_bindings(b, ["s", "n", "h", "host_label"])


def _q_kg_minus(sf_dir: str):
    """SPARQL MINUS (patterns.minus_bindings) — the reference's
    fetch-unclassified-swine.rq:9 shape: strains WITHOUT the inner
    conjunction (a constellation AND a subtype together).  The inner
    WHERE is a 2-pattern BGP, so the anti-join key set is itself a
    join product, not a single predicate scan."""
    from octoray.patterns import match_patterns, minus_bindings, select_bindings
    from octoray.stages.canon import dedup_triples

    # two match_patterns passes (outer + inner) read the graph: pin the
    # deduped triples once, as querying a built store does — without
    # this the lazy emission pipeline re-runs for the inner WHERE
    triples = dedup_triples(_kg_raw(sf_dir, "kg_minus_raw")).materialize()
    b = match_patterns(
        triples,
        [("?sid", "f:strain_name", "?n"), ("?sid", "f:host", "?h")],
    )
    b = minus_bindings(
        b, triples,
        [("?sid", "f:constellation", "?c"), ("?sid", "f:subtype", "?st")],
    )
    return select_bindings(b, ["sid", "n", "h"])


def _q_kg_not_exists(sf_dir: str):
    """FILTER NOT EXISTS with an inner FILTER REGEX
    (patterns.minus_bindings mode='not_exists') — the reference's
    subtypes.rq:18 / get-h3-swine.rq:11 shape: strains with no
    H3-prefixed subtype assertion."""
    from octoray.patterns import match_patterns, minus_bindings, select_bindings
    from octoray.stages.canon import dedup_triples

    # see _q_kg_minus: pin the graph once for the two pattern passes
    triples = dedup_triples(_kg_raw(sf_dir, "kg_ne_raw")).materialize()
    b = match_patterns(
        triples,
        [("?sid", "f:strain_name", "?n"), ("?sid", "f:date", "?d")],
    )
    b = minus_bindings(
        b, triples, [("?sid", "f:subtype", "?st")],
        filters=[("?st", "~", "^H3")], mode="not_exists",
    )
    return select_bindings(b, ["sid", "n", "d"])


def _q_sparql_context(sf_dir: str):
    """The monthly-context.rq shape class through the text front end:
    date-range-OR-recent disjunction over typed date literals, an
    OPTIONAL group with its own inner FILTER, GROUP_CONCAT heads."""
    from octoray.sparql import run_file
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "sparql_ctx_raw"))
    return run_file(triples, _rq_path("context.rq"),
                    params={"__MIN_DATE__": "2016-01-01",
                            "__MAX_DATE__": "2017-12-31"})


def _q_turtle_roundtrip(sf_dir: str):
    """Turtle codec roundtrip (reference `upload` path, ui.py:561-589):
    canonical KG sample -> sinks.write_turtle -> sources.read_turtle.
    The parquet dump of the same triples is the oracle hand-off;
    equality proves sink->source identity incl. escapes, datatypes and
    prefix re-abbreviation.  One golden-diff file here; at scale the
    sharded path is turtle_lines(ds).write_parquet per shard with one
    parse task per file."""
    import os

    from octoray import oracles as O
    from octoray.sinks import write_turtle
    from octoray.sources.turtle import read_turtle
    from octoray.stages.canon import TRIPLE_COLS, dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "ttl_src_raw")) \
        .select_columns(list(TRIPLE_COLS))
    if O.dump_enabled():
        O.dump_dataset("ttl_triples", triples)
    os.makedirs(O.ORACLE_DIR, exist_ok=True)
    path = os.path.join(O.ORACLE_DIR, "graph_roundtrip.ttl")
    write_turtle(triples, path)
    return read_turtle(path)


def _q_turtle_foreign(sf_dir: str):
    """Foreign-Turtle ingestion (VERDICT r4 #7): a foreign-authored
    document — triple-quoted literals with raw newlines, single-quoted
    strings, language tags, labelled blank nodes, foreign prefix names
    — parsed by sources/turtle.py and canonicalized.  The oracle is
    the fixture generator's OWN expectation table (f-string templates,
    zero parser involvement), so the compare certifies the widened
    grammar against an independent derivation."""
    import os

    from octoray import oracles as O
    from octoray.sources.synth import synth_foreign_turtle
    from octoray.sources.turtle import read_turtle
    from octoray.stages.canon import canonicalize

    n = _synth_n(sf_dir, per_sf=30_000, floor=40)
    text, expected = synth_foreign_turtle(n)
    os.makedirs(O.ORACLE_DIR, exist_ok=True)
    path = os.path.join(O.ORACLE_DIR, "foreign.ttl")
    with open(path, "w") as f:
        f.write(text)
    if O.dump_enabled():
        O.dump_table("ttl_foreign_expected", expected)
    return canonicalize(read_turtle(path))


def _q_ntriples_roundtrip(sf_dir: str):
    """Strict N-Triples export (full-IRI interop surface beside the
    prefix-form Turtle sink): the SERIALIZED LINES are the checked
    result — the oracle re-derives every statement from the dumped
    triple table with a generated prefix-expansion CASE and the
    identical escape chain, so IRI expansion, literal escaping and
    datatype tags are all value-certified.  The parse-back identity
    (NT rides the Turtle source) is pinned in pytest."""
    from octoray import oracles as O
    from octoray.sinks import ntriples_lines
    from octoray.stages.canon import TRIPLE_COLS, dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "nt_src_raw")) \
        .select_columns(list(TRIPLE_COLS))
    if O.dump_enabled():
        O.dump_dataset("nt_triples", triples)
    return ntriples_lines(triples)


def _q_sparql_stats(sf_dir: str):
    """Implicit-single-group aggregate head (no GROUP BY) through the
    text front end: COUNT(*) / COUNT(DISTINCT) / MIN / MAX /
    GROUP_CONCAT over all solutions — combiner-based partials, one
    output row (patterns.aggregate_all)."""
    from octoray.sparql import run_file
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "sparql_stats_raw"))
    return run_file(triples, _rq_path("stats.rq"))


def _q_sparql_concat_bag(sf_dir: str):
    """Non-DISTINCT GROUP_CONCAT (SPARQL bag semantics — duplicate
    solutions kept, value-sorted deterministic rendering) through the
    text front end."""
    from octoray.sparql import run_file
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "sparql_concat_bag_raw"))
    return run_file(triples, _rq_path("concat-bag.rq"))


def _q_sparql_years(sf_dir: str):
    """SUM / AVG numeric aggregates over a BIND(YEAR(?date)) column,
    grouped per host, through the text front end."""
    from octoray.sparql import run_file
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "sparql_years_raw"))
    return run_file(triples, _rq_path("years.rq"))


def _q_sparql_negated(sf_dir: str):
    """Negated property set !(p1|p2) through the text front end: every
    non-name, non-segment property value of named strains (SPARQL 1.1
    NPS — complement predicate scan, patterns._slot_mask)."""
    from octoray.sparql import execute, parse_sparql
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "sparql_neg_raw"))
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT DISTINCT ?s ?v WHERE {
            ?s f:strain_name ?n .
            ?s !(f:strain_name|f:has_segment) ?v .
        }
    """)
    return execute(q, triples)


def _q_sparql_subquery(sf_dir: str):
    """Nested subquery through the text front end: a { SELECT ...
    GROUP BY } aggregate block inner-joined into the enclosing BGP on
    the shared ?sid (SPARQL 1.1 subqueries; results lexicalized to the
    pattern layer's all-string convention)."""
    from octoray.sparql import execute, parse_sparql
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "sparql_sub_raw"))
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        SELECT ?name ?nseg WHERE {
            ?sid f:strain_name ?name .
            ?sid f:host "swine" .
            { SELECT ?sid (COUNT(DISTINCT ?g) AS ?nseg) WHERE {
                ?sid f:has_segment ?g .
              } GROUP BY ?sid }
        }
    """)
    return execute(q, triples)


def _q_sparql_ask(sf_dir: str):
    """SPARQL ASK through the text front end: does any swine strain
    carry both a barcode and a constellation?"""
    from octoray.sparql import execute, parse_sparql
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "sparql_ask_raw"))
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        ASK {
            ?sid f:host "swine" .
            ?sid f:barcode ?b .
            ?sid f:constellation ?c .
        }
    """)
    return execute(q, triples)


def _q_sparql_describe(sf_dir: str):
    """SPARQL DESCRIBE through the text front end: full descriptions
    of every strain with an H3N2 subtype assertion."""
    from octoray.sparql import execute, parse_sparql
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "sparql_desc_raw"))
    q = parse_sparql("""
        PREFIX f: <https://flu-crew.org/term/>
        DESCRIBE ?sid WHERE { ?sid f:subtype "H3N2" . }
    """)
    return execute(q, triples)


def _q_bpe_encode(sf_dir: str):
    """Train-then-encode: BPE merges learned on the corpus's word
    table, then every document re-encoded with the ordered merges
    (stages/bpe.py).  The oracle independently re-learns the merges
    and applies its own replace chain — no engine output crosses."""
    from octoray.stages.bpe import apply_bpe, train_bpe

    _, merges = train_bpe(_docs(sf_dir), n_merges=12)
    return apply_bpe(_docs(sf_dir), merges)


def _rq_path(name: str) -> str:
    import os

    import octoray

    return os.path.join(os.path.dirname(octoray.__file__), "data", name)


def _q_sparql_monthly(sf_dir: str):
    """The SPARQL TEXT front end (octoray/sparql.py) running a bundled
    .rq file that mirrors the reference's data/wgs.rq monthly-upload
    shape (OPTIONAL barcode, REGEX + equality FILTERs, BIND date
    parts, FILTER BOUND, __YEAR__ macro, GROUP BY + GROUP_CONCAT
    heads) — the whole parse -> algebra -> one-scan execution path is
    what the oracle checks."""
    from octoray.sparql import run_file
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "sparql_monthly_raw"))
    return run_file(triples, _rq_path("monthly.rq"),
                    params={"__YEAR__": 2018})


def _q_sparql_tagged(sf_dir: str):
    """SPARQL text front end: the get-tagged-strain.rq UNION shape —
    pushed f:query_tag triples resolve across three identifier kinds
    (strain name | barcode | segment genbank id), strain facts then
    aggregate per strain."""
    import re as _re

    import pyarrow as pa
    import ray.data as rd

    from octoray import oracles as O
    from octoray.model import make_query_tag_uri, triples_to_table
    from octoray.sources.webtext import page_record
    from octoray.sparql import run_file
    from octoray.stages.canon import dedup_triples

    ids = []
    for pid in range(60):
        fields = page_record(pid, 42)[1]
        if not fields:
            continue
        ids.append(fields[0])  # strain name
        for f in fields:
            # barcodes (A0 + 7 digits) and genbank ids (2 letters + 6
            # digits) exercise the other two UNION branches
            if _re.fullmatch(r"A0\d{7}", f) or _re.fullmatch(r"[A-Z]{2}\d{6}", f):
                ids.append(f)
    ids = sorted(set(ids))[:80]
    if O.dump_enabled():
        O.dump_table("sparql_tag_ids",
                     pa.table({"id": pa.array(ids, pa.string())}))
    tags = rd.from_arrow(triples_to_table(
        [(make_query_tag_uri(), "f:query_tag", i, "") for i in ids]))
    triples = dedup_triples(_kg_raw(sf_dir, "sparql_tagged_raw")).union(tags)
    return run_file(triples, _rq_path("tagged.rq"))


def _q_sparql_segment(sf_dir: str):
    """SPARQL text front end: the get-tagged-segment.rq level — tag
    resolution UNION, then SEGMENT-keyed rows (GROUP BY two variables,
    one OPTIONAL on the segment node and one on the strain node)."""
    import re as _re

    import pyarrow as pa
    import ray.data as rd

    from octoray import oracles as O
    from octoray.model import make_query_tag_uri, triples_to_table
    from octoray.sources.webtext import page_record
    from octoray.sparql import run_file
    from octoray.stages.canon import dedup_triples

    ids = []
    for pid in range(60):
        fields = page_record(pid, 42)[1]
        if not fields:
            continue
        ids.append(fields[0])
        for f in fields:
            if _re.fullmatch(r"A0\d{7}", f) or _re.fullmatch(r"[A-Z]{2}\d{6}", f):
                ids.append(f)
    ids = sorted(set(ids))[:80]
    if O.dump_enabled():
        O.dump_table("sparql_seg_ids",
                     pa.table({"id": pa.array(ids, pa.string())}))
    tags = rd.from_arrow(triples_to_table(
        [(make_query_tag_uri(), "f:query_tag", i, "") for i in ids]))
    triples = dedup_triples(_kg_raw(sf_dir, "sparql_seg_raw")).union(tags)
    return run_file(triples, _rq_path("tagged-segment.rq"))


def _q_sparql_unclassified(sf_dir: str):
    """SPARQL text front end: the fetch-unclassified-swine.rq MINUS
    shape — swine sequences lacking BOTH classification facts."""
    from octoray.sparql import run_file
    from octoray.stages.canon import dedup_triples

    triples = dedup_triples(_kg_raw(sf_dir, "sparql_uncls_raw"))
    return run_file(triples, _rq_path("unclassified.rq"))


def _q_entity_resolution(sf_dir: str):
    """Blocked fuzzy entity resolution (stages/entity.py): strain-name
    mentions with injected novel typos -> symmetric-delete blocking
    (complete for edit distance <= 1) -> exact verification ->
    connected components -> canonical min-id mapping for EVERY
    mention.  The oracle re-derives the clustering with DuckDB's own
    levenshtein over a length-banded self-join — the quadratic plan
    the engine's blocking avoids — so the two sides share no code."""
    import ray.data as rd

    from octoray import oracles as O
    from octoray.sources.synth import entity_mentions_dataset
    from octoray.stages.entity import resolve_entities

    n = _synth_n(sf_dir, 20_000, floor=200)
    m = entity_mentions_dataset(n, seed=42)
    if O.dump_enabled():
        m = rd.read_parquet(O.dump_dataset("entity_mentions", m))
    return resolve_entities(m)


def _q_entity_link(sf_dir: str):
    """Broadcast-dictionary entity linking (stages/entity.py::
    MentionLinker — the north-star actor-pool shape: lexicon via
    ray.put once, per-actor symmetric-delete index in __init__,
    batched scoring): typo-bearing mentions against the true strain
    lexicon; best = min edit distance then min entity_id, null when
    nothing is within distance 1.  The oracle re-derives the pick with
    DuckDB levenshtein over a length-banded mention x lexicon join."""
    import ray.data as rd

    from octoray import oracles as O
    from octoray.sources.synth import (entity_mentions_dataset,
                                       strain_lexicon_dataset)
    from octoray.stages.entity import link_mentions

    n = _synth_n(sf_dir, 20_000, floor=200)
    m = entity_mentions_dataset(n, seed=42)
    lex = strain_lexicon_dataset(n, seed=42)
    if O.dump_enabled():
        m = rd.read_parquet(O.dump_dataset("link_mentions", m))
        lex = rd.read_parquet(O.dump_dataset("link_lexicon", lex))
    return link_mentions(m, lex)


def _q_entity_incremental(sf_dir: str):
    """Incremental entity resolution against a persisted store
    (stages/entity.py::resolve_store_build / resolve_incremental): the
    first half of the mention stream builds the store (norm-level
    canonical map + hash-bucketed symmetric-delete key index), the
    second half resolves INCREMENTALLY — known norms via one join,
    novel norms blocked against only the key buckets they hash to,
    bridged old clusters relabeled to the merged minimum.  The oracle
    re-clusters the UNION from scratch (DuckDB levenshtein closure),
    so a pass proves incremental == from-scratch exactly."""
    import shutil

    import pyarrow as pa
    import pyarrow.compute as _pc
    import ray.data as rd

    from octoray import oracles as O
    from octoray.sources.synth import entity_mentions_dataset
    from octoray.stages.entity import (resolve_incremental,
                                       resolve_store_build)

    n = _synth_n(sf_dir, 20_000, floor=200)
    m = entity_mentions_dataset(n, seed=42)
    if O.dump_enabled():
        m = rd.read_parquet(O.dump_dataset("entity_mentions_inc", m))
    cut = pa.scalar(n // 2, pa.int64())
    first = m.map_batches(
        lambda t: t.filter(_pc.less(t.column("mention_id"), cut)),
        batch_format="pyarrow")
    second = m.map_batches(
        lambda t: t.filter(_pc.greater_equal(t.column("mention_id"), cut)),
        batch_format="pyarrow")
    store = "/tmp/octoray_entstore"
    shutil.rmtree(store, ignore_errors=True)
    resolve_store_build(first, store)
    return resolve_incremental(second, store).sort("norm")


def _q_kg_sameas(sf_dir: str):
    """owl:sameAs reasoning (stages/entity.py::canonicalize_graph):
    synthesized sameAs assertions (typo-strain URI = strain URI, the
    merge an entity resolver emits) rewrite the raw KG's subjects and
    URI objects through the equivalence closure, then DISTINCT.
    Boundary: the dumped raw triples + pair list; the oracle runs the
    same closure as a recursive CTE plus a join-rewrite."""
    import ray.data as rd

    from octoray import oracles as O
    from octoray.sources.synth import sameas_pairs_dataset
    from octoray.stages.entity import canonicalize_graph

    triples = _kg_raw(sf_dir, "kg_sameas_raw")
    pairs = sameas_pairs_dataset(_kg_pages(sf_dir), seed=42)
    if O.dump_enabled():
        pairs = rd.read_parquet(O.dump_dataset("sameas_pairs", pairs))
    return canonicalize_graph(triples, pairs)


# domain-mixture resampling targets: a few explicit per-source rates
# (including a zero) + a default for everything else — exercised
# against the generated CASE twin
_MIX_RATES = {"src0": 0.15, "src3": 0.5, "src7": 0.0, "src12": 0.85}
_MIX_DEFAULT = 0.35


def _q_mixture_resample(sf_dir: str):
    """Deterministic domain-mixture resampling (textops.py) — keep a
    doc iff md5-frac(doc_id) < rate(source); streaming filter, no
    shuffle, stable under any parallelism."""
    from octoray.stages.textops import mixture_resample

    docs = _docs(sf_dir).select_columns(["doc_id", "source"])
    return mixture_resample(docs, _MIX_RATES, default_rate=_MIX_DEFAULT)


def _q_prep_genbank(sf_dir: str):
    from octoray.pipelines.genbank import gb_records_dataset, prep_genbank

    raw = prep_genbank(gb_records_dataset(_synth_n(sf_dir, 10_000)), canonical=False)
    return _prep_canon("prep_genbank_raw", raw)


def _q_prep_ivr(sf_dir: str):
    import ray.data as rd

    from octoray.pipelines.prep import prep_ivr
    from octoray.sources.synth import synth_ivr_table

    raw = prep_ivr(rd.from_arrow(synth_ivr_table(_synth_n(sf_dir, 10_000))),
                   canonical=False)
    return _prep_canon("prep_ivr_raw", raw)


def _q_kg_comention(sf_dir: str):
    """Entity co-mention graph (relation-candidate discovery): one
    distinct exchange over (page, subject) lineage pairs, hub-capped
    per-page wedge expansion, slim pair-count combine."""
    import ray.data as rd

    from octoray import oracles as O
    from octoray.pipelines.kg import build_triples, pages_dataset
    from octoray.stages.graphalgo import comention_graph

    n = _kg_pages(sf_dir)
    raw = build_triples(pages_dataset(n, seed=42), keep_src=True,
                        n_rows_hint=n)
    if O.dump_enabled():
        raw = rd.read_parquet(O.dump_dataset("kg_comention_raw", raw))
    # min_pages=1: the synthesis gives every page a unique entity set,
    # so pair weights are degenerate at test scale — the verified
    # machinery is the distinct exchange + wedge expansion + combine
    return comention_graph(raw, min_pages=1)


def _q_kg_transe(sf_dir: str):
    """TransE/DistMult trainer export: uri->uri triples integer-
    encoded against deterministic dense entity/relation vocabularies
    (prefix-sum entity index, collected predicate-sized relation
    map)."""
    from octoray.stages.canon import dedup_triples
    from octoray.stages.graphalgo import transe_export

    return transe_export(dedup_triples(_kg_raw(sf_dir, "kg_transe_raw")))


def _q_kg_clustering(sf_dir: str):
    """Per-node local clustering coefficient (Watts-Strogatz) over the
    RULES-EXPANDED KG graph PLUS the closed geo hierarchy edges (the
    base emission is near-bipartite and triangle-free; strain ->
    state, strain -> country and state -> country close real
    triangles): degree-oriented wedge iterator, each surviving wedge
    credits all three corners, left join on degree."""
    import pyarrow as pa
    import ray.data as rd

    from octoray.stages.graphalgo import clustering_coefficients
    from octoray.stages.rules import (closure_edges, expand_locations,
                                      expand_subproperties,
                                      geography_facts)

    import pyarrow.compute as pc

    expanded = expand_locations(expand_subproperties(
        _kg_raw(sf_dir, "kg_clust_raw")))
    geo = geography_facts()
    sel = geo.filter(pc.equal(geo.column("predicate"),
                              pa.scalar("f:locatedIn")))
    closed = sorted(closure_edges(
        list(zip(sel.column("subject").to_pylist(),
                 sel.column("object").to_pylist()))))
    hier = rd.from_arrow(pa.table({
        "subject": pa.array([a for a, _ in closed], pa.string()),
        "predicate": pa.array(["f:locatedIn"] * len(closed), pa.string()),
        "object": pa.array([b for _, b in closed], pa.string()),
        "object_datatype": pa.array(["uri"] * len(closed), pa.string()),
    }))
    return clustering_coefficients(expanded.union(hier))


def _q_kg_negatives(sf_dir: str):
    """Deterministic word2vec-style negative sampling over the KG's
    node set (the trainer hand-off beside kg_walks/kg_skipgrams):
    global node index via the distributed prefix sum, md5 pick rule,
    one integer-keyed hash join."""
    from octoray.stages.canon import dedup_triples
    from octoray.stages.graphalgo import link_negatives, uri_edges

    return link_negatives(
        uri_edges(dedup_triples(_kg_raw(sf_dir, "kg_neg_raw"))), k=2)


def _q_kg_void(sf_dir: str):
    """W3C VoID property-partition profile of the built KG:
    per-predicate triple / distinct-subject / distinct-object counts
    (two slim distinct exchanges + partial-combine counts)."""
    from octoray.stages.canon import dedup_triples
    from octoray.stages.profile import void_stats

    return void_stats(dedup_triples(_kg_raw(sf_dir, "kg_void_raw")))


def _q_kg_pagerank(sf_dir: str):
    """Entity importance over the built KG: 5 PageRank iterations on
    the uri->uri edge graph (one broadcast join + one combine-sum per
    iteration; rank table is node-sized and re-broadcast per round)."""
    from octoray.stages.canon import dedup_triples
    from octoray.stages.graphalgo import pagerank

    triples = dedup_triples(_kg_raw(sf_dir, "kg_pagerank_raw"))
    return pagerank(triples, damping=0.85, n_iters=5)


def _q_value_quantiles(sf_dir: str):
    """Exact per-type quantiles of the cents-exact value column via
    the counting-sort plan (length_quantiles generalized: the value
    domain is bounded, so the exchange is one (type, cents) count
    table, never raw rows)."""
    import pyarrow as pa

    from octoray.stages.textops import length_quantiles
    from octoray.util import cents

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t.column("event_type"),
                         "vc": cents(t.column("value"))})

    ev = _events(sf_dir).map_batches(proj, batch_format="pyarrow")
    df = length_quantiles(ev, probs=(0.5, 0.9, 0.99), value_col="vc",
                          stratum_col="event_type")
    for c in ("p50", "p90", "p99"):
        df[c] = df[c] / 100.0
    return df


def _q_rrf_search(sf_dir: str):
    """Hybrid retrieval: BM25 lexical top-50 fused with embedding
    cosine top-50 (query = vec 3) by reciprocal-rank fusion.  The two
    rankers are the distributed stages; the fuse runs over their
    already-reduced k-row lists (stages/similarity.py::rrf_fuse)."""
    from octoray.stages.similarity import knn_brute, rrf_fuse
    from octoray.stages.tfidf import bm25_topk

    bm = bm25_topk(_docs(sf_dir), _BM25_TERMS, k=50).take_all()
    bm_ids = [r["doc_id"] for r in sorted(
        bm, key=lambda r: (-r["score"], r["doc_id"]))]
    kn = knn_brute(_embeddings(sf_dir), [_RRF_QID], k=50).take_all()
    kn_ids = [r["neighbor_id"] for r in sorted(
        kn, key=lambda r: (-r["score"], r["neighbor_id"]))]
    return rrf_fuse([bm_ids, kn_ids], c=60, k_out=20)


def _q_window_unique_users(sf_dir: str):
    """Windowed distinct counting: KMV sketch of distinct users per
    (event_type, 6h tumbling window) — the streaming analytics
    composition (window assignment is a vectorized epoch floor, the
    sketch bounds the exchange to k rows per group-block)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from octoray.stages.sketch import approx_distinct

    span_us = 6 * 3600 * 1_000_000

    def assign(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        start = pc.multiply(pc.divide(us, span_us), span_us)
        return pa.table({
            "event_type": t.column("event_type"),
            "window_start": pc.cast(start, pa.timestamp("us")),
            "user_id": t.column("user_id"),
        })

    ev = _events(sf_dir).map_batches(assign, batch_format="pyarrow")
    out = approx_distinct(ev, ["event_type", "window_start"], "user_id",
                          k=64)

    # the sketch's pandas finish pass upcasts timestamps to ns; pin
    # the contract schema back to timestamp[us]
    def us(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("window_start")
        return t.set_column(i, "window_start",
                            pc.cast(t.column("window_start"),
                                    pa.timestamp("us")))

    return out.map_batches(us, batch_format="pyarrow")


def _q_kg_kcore(sf_dir: str):
    """k-core of the KG's undirected uri--uri graph (iterative peel,
    stages/graphalgo.py::kcore).  Oracle: the same capped peel as a
    generated MATERIALIZED CTE chain over the raw triple dump."""
    from octoray.stages.canon import dedup_triples
    from octoray.stages.graphalgo import kcore

    triples = dedup_triples(_kg_raw(sf_dir, "kg_kcore_raw"))
    return kcore(triples, k=2, n_iters=16)


def _q_kg_hops(sf_dir: str):
    """BFS neighborhood radius from a geography hub over the KG's
    undirected uri--uri graph (stages/graphalgo.py::hop_distances).
    Oracle: recursive CTE with UNION dedup and min(depth) over the
    same symmetric edge set."""
    from octoray.stages.canon import dedup_triples
    from octoray.stages.graphalgo import hop_distances

    triples = dedup_triples(_kg_raw(sf_dir, "kg_hops_raw"))
    return hop_distances(triples, "world:CAN", max_hops=4)


def _q_kg_walks(sf_dir: str):
    """Deterministic DeepWalk corpus over the KG (graphalgo.py::
    random_walks): md5-driven neighbor picks over dst-sorted
    adjacency, so the SQL twin re-walks the identical paths."""
    from octoray.stages.canon import dedup_triples
    from octoray.stages.graphalgo import random_walks

    triples = dedup_triples(_kg_raw(sf_dir, "kg_walks_raw"))
    return random_walks(triples, n_walks=2, walk_len=3, seed=1)


def _q_kg_skipgrams(sf_dir: str):
    """Walks -> skip-gram pairs (the DeepWalk second half): symmetric
    window-2 co-occurrence counts.  The dumped walk table is the
    oracle hand-off (the walks themselves are oracle-checked by
    kg_walks); the twin is a window self-join."""
    from octoray import oracles as O
    from octoray.stages.canon import dedup_triples
    from octoray.stages.graphalgo import random_walks, walk_skipgrams

    triples = dedup_triples(_kg_raw(sf_dir, "kg_sg_raw"))
    walks = random_walks(triples, n_walks=2, walk_len=3, seed=1)
    if O.dump_enabled():
        import ray.data as rd

        src = O.dump_dataset("kg_sg_walks", walks)
        walks = rd.read_parquet(src)
    return walk_skipgrams(walks, window=2)


def _q_kg_triangles(sf_dir: str):
    """Global triangle count over the KG's undirected uri--uri graph
    (degree-oriented wedge join, stages/graphalgo.py).  Oracle: the
    canonical a<b<c three-way self-join in SQL — orientation-free, so
    equality also validates the degree-orientation bookkeeping."""
    from octoray.stages.canon import dedup_triples
    from octoray.stages.graphalgo import triangle_count

    triples = dedup_triples(_kg_raw(sf_dir, "kg_tri_raw"))
    return triangle_count(triples)


_KG_CONSTRAINTS = [("datatype", "f:date", "xsd:date"),
                   ("max_card", "f:date", 1),
                   ("requires", "f:subtype", "f:date")]


def _q_kg_validate(sf_dir: str):
    """SHACL-lite KG validation (stages/rules.py::validate_constraints):
    datatype / max-cardinality / co-occurrence shapes over the built
    graph, violations as (rule, subject, detail) rows.  The gYearMonth
    partial dates violate the xsd:date shape by construction, so the
    check is non-trivial at every scale."""
    from octoray.stages.canon import dedup_triples
    from octoray.stages.rules import validate_constraints

    triples = dedup_triples(_kg_raw(sf_dir, "kg_val_raw"))
    return validate_constraints(triples, _KG_CONSTRAINTS)


def _q_kg_adjacency(sf_dir: str):
    """Adjacency-list export of the KG's directed uri graph (the
    GNN/embedding-trainer hand-off): one src sort + block-local
    vectorized group-concat, '+'-join house convention
    (stages/graphalgo.py::adjacency_export)."""
    from octoray.stages.canon import dedup_triples
    from octoray.stages.graphalgo import adjacency_export

    triples = dedup_triples(_kg_raw(sf_dir, "kg_adj_raw"))
    return adjacency_export(triples)


def _q_kg_communities(sf_dir: str):
    """Deterministic synchronous label-propagation communities over
    the KG (3 rounds, majority label, ties to the smallest —
    stages/graphalgo.py).  Oracle: generated per-round majority-vote
    CTE chain with the identical tie-break."""
    from octoray.stages.canon import dedup_triples
    from octoray.stages.graphalgo import label_propagation

    triples = dedup_triples(_kg_raw(sf_dir, "kg_lp_raw"))
    return label_propagation(triples, n_rounds=3)


def _q_kg_jaccard_links(sf_dir: str):
    """Link prediction over the KG: top-100 non-adjacent uri pairs by
    neighborhood Jaccard (common-neighbor wedge counts, hub-capped
    centers, stats-gated edge drop — stages/graphalgo.py).  Oracle:
    the orientation-free wedge self-join with the identical center cap
    and int64->double division."""
    from octoray.stages.canon import dedup_triples
    from octoray.stages.graphalgo import neighborhood_similarity

    triples = dedup_triples(_kg_raw(sf_dir, "kg_jl_raw"))
    return neighborhood_similarity(triples, k=100, max_center_degree=512)


def _q_extract_text(sf_dir: str):
    """The byte-identical HTML->text extraction itself (the north
    rule's per-row invariant), verified against an INDEPENDENT SQL
    re-derivation over the dumped raw html — previously only the P/R
    gate covered this step."""
    import ray.data as rd

    from octoray import oracles as O
    from octoray.pipelines.kg import pages_dataset
    from octoray.stages.extract import extract_text_batch

    pages = pages_dataset(_kg_pages(sf_dir), seed=42).select_columns(
        ["url", "html"])
    if O.dump_enabled():
        pages = rd.read_parquet(O.dump_dataset("extract_pages", pages))
    return pages.map_batches(extract_text_batch,
                             batch_format="pyarrow").select_columns(
        ["url", "text"])


def _linked_pages(sf_dir: str, dump_name: str):
    """Pages (url, html) with the oracle hand-off dump for the
    web-graph queries; each query dumps under its own name so the
    DuckDB twin re-derives the FULL chain (regex link extraction
    included) independently from the raw html."""
    import ray.data as rd

    from octoray import oracles as O
    from octoray.pipelines.kg import pages_dataset

    pages = pages_dataset(_kg_pages(sf_dir), seed=42).select_columns(
        ["url", "html"])
    if O.dump_enabled():
        pages = rd.read_parquet(O.dump_dataset(dump_name, pages))
    return pages


def _q_extract_links(sf_dir: str):
    """Hyperlink extraction from raw html — the flat map under every
    web-graph product (Common Crawl's webgraph derivation)."""
    from octoray.stages.webgraph import links_dataset

    return links_dataset(_linked_pages(sf_dir, "link_pages"))


def _q_anchor_text(sf_dir: str):
    """Anchor-text index per link target (in-link count, distinct
    sources, sorted-distinct anchors) — one dst sort + block-local
    group-concat; the oracle re-derives links AND the index from the
    dumped html."""
    from octoray.stages.webgraph import anchor_summary, links_dataset

    return anchor_summary(links_dataset(_linked_pages(sf_dir, "anchor_pages")))


def _q_web_linkrank(sf_dir: str):
    """PageRank over the internal page-level link graph (hub-skewed
    in-degree by construction).  Oracle: generated power-iteration CTE
    chain over edges the SQL itself re-extracts from the dumped html."""
    from octoray.stages.webgraph import link_rank, links_dataset

    return link_rank(links_dataset(_linked_pages(sf_dir, "linkrank_pages")),
                     damping=0.85, n_iters=5)


def _q_web_harmonic(sf_dir: str):
    """Sampled harmonic centrality over the internal link graph (the
    cc-webgraph harmonic-rank release).  Oracle: recursive-CTE BFS +
    identical md5 bottom-k source sample over edges the SQL itself
    re-extracts from the dumped html."""
    from octoray.stages.webgraph import harmonic_rank, links_dataset

    return harmonic_rank(links_dataset(_linked_pages(sf_dir, "harmonic_pages")),
                         n_sources=12, max_hops=4)


def _q_web_frontier(sf_dir: str):
    """Crawl-frontier expansion: discovered-but-uncrawled internal
    urls with in-link weight (counts over all links, distinct
    sources), crawled set anti-joined out — the next wave's seed
    list.  Oracle: the same counts + NOT IN over links the SQL
    re-extracts from the dumped html."""
    from octoray.stages.webgraph import frontier_urls, links_dataset

    pages = _linked_pages(sf_dir, "frontier_pages")
    return frontier_urls(links_dataset(pages), pages)


def _q_web_degree_dist(sf_dir: str):
    """In/out-degree histogram of the internal link graph (the
    power-law shape check of every webgraph release)."""
    from octoray.stages.webgraph import degree_histogram, links_dataset

    return degree_histogram(links_dataset(_linked_pages(sf_dir,
                                                        "degdist_pages")))


def _q_web_reciprocity(sf_dir: str):
    """One-row link-reciprocity summary of the internal graph
    (self-loops excluded): edge count, reciprocated count, ratio."""
    from octoray.stages.webgraph import links_dataset, reciprocity

    return reciprocity(links_dataset(_linked_pages(sf_dir, "recip_pages")))


def _q_anchor_names(sf_dir: str):
    """Canonical name per link target: top anchor text by in-link
    count (ties lexicographic) — the entity-naming argmax over the
    anchor index."""
    from octoray.stages.webgraph import anchor_names, links_dataset

    return anchor_names(links_dataset(_linked_pages(sf_dir,
                                                    "aname_pages")), k=1)


def _q_web_diameter(sf_dir: str):
    """Sampled shortest-distance distribution (hops, n_pairs) of the
    undirected internal graph — the effective-diameter profile, over
    harmonic's deterministic md5 source sample."""
    from octoray.stages.graphalgo import distance_histogram
    from octoray.stages.webgraph import internal_edges, links_dataset

    links = links_dataset(_linked_pages(sf_dir, "diam_pages"))
    return distance_histogram(internal_edges(links), n_sources=12,
                              max_hops=4)


def _q_web_salsa(sf_dir: str):
    """SALSA authority scores (Lempel-Moran): closed-form stationary
    distribution — co-citation components + in-degree normalization,
    no power iteration."""
    from octoray.stages.webgraph import links_dataset, salsa_authorities

    return salsa_authorities(
        links_dataset(_linked_pages(sf_dir, "salsa_pages")), max_out=64)


def _q_web_salsa_hubs(sf_dir: str):
    """SALSA hub scores: bibliographic-coupling components (pages
    sharing a target, in-capped wedge expansion) + out-degree
    normalization — the closed-form hub half."""
    from octoray.stages.webgraph import links_dataset, salsa_hubs

    return salsa_hubs(
        links_dataset(_linked_pages(sf_dir, "salsahub_pages")), max_in=64)


def _q_web_katz(sf_dir: str):
    """Truncated Katz centrality (attenuated path counts) over the
    internal link graph — the rank family's path-count member."""
    from octoray.stages.graphalgo import katz_edges
    from octoray.stages.webgraph import internal_edges, links_dataset

    links = links_dataset(_linked_pages(sf_dir, "katz_pages"))
    return katz_edges(internal_edges(links), beta=0.05, n_iters=4)


def _q_web_assortativity(sf_dir: str):
    """One-row degree-assortativity summary (Newman r over edge-end
    degrees) of the undirected internal graph."""
    from octoray.stages.graphalgo import assortativity
    from octoray.stages.webgraph import internal_edges, links_dataset

    links = links_dataset(_linked_pages(sf_dir, "assort_pages"))
    return assortativity(internal_edges(links))


def _q_web_cocitation(sf_dir: str):
    """Top-k co-cited page pairs ('related pages' signal): hub-capped
    wedge expansion per citing page, map-side pair counts, one slim
    combine, deterministic sort+limit cut."""
    from octoray.stages.webgraph import cocitation, links_dataset

    return cocitation(links_dataset(_linked_pages(sf_dir, "cocit_pages")),
                      k=100, max_out=64)


def _q_web_trustrank(sf_dir: str):
    """TrustRank over the internal link graph: teleportation
    restricted to a deterministic md5 bottom-k seed set (the
    link-spam / quality-propagation rank).  Oracle: generated
    MATERIALIZED-CTE chain with the identical seed rule over links
    the SQL re-extracts from the dumped html."""
    from octoray.stages.graphalgo import trustrank_edges
    from octoray.stages.webgraph import internal_edges, links_dataset

    links = links_dataset(_linked_pages(sf_dir, "trust_pages"))
    return trustrank_edges(internal_edges(links), damping=0.85,
                           n_iters=5, n_seeds=8)


def _q_host_graph(sf_dir: str):
    """Host-level link graph (src_host, dst_host, n_links) over ALL
    links incl. the external tail — cc-webgraph's headline
    granularity."""
    from octoray.stages.webgraph import host_graph, links_dataset

    return host_graph(links_dataset(_linked_pages(sf_dir, "hostg_pages")))


def _q_web_components(sf_dir: str):
    """Weakly-connected components of the internal link graph (the
    cc-webgraph connectivity release): (node, component) with
    component = min url in the component.  Reuses the dedup family's
    stats-gated machinery — driver union-find below the edge gate,
    distributed min-label propagation with pointer jumping above."""
    from octoray.stages.dedup import dup_components
    from octoray.stages.webgraph import internal_edges, links_dataset

    import pyarrow as pa

    links = links_dataset(_linked_pages(sf_dir, "wcc_pages"))
    pairs = internal_edges(links).map_batches(
        lambda t: pa.table({"id_a": t.column("src"),
                            "id_b": t.column("dst")}),
        batch_format="pyarrow")
    return dup_components(pairs).map_batches(
        lambda t: pa.table({"node": t.column("id"),
                            "component": t.column("component")}),
        batch_format="pyarrow")


def _q_web_component_sizes(sf_dir: str):
    """WCC size distribution (component_size, n_components) — the
    giant-component check beside web_components; two chained slim
    combine-counts over the (node, component) labels."""
    import pyarrow as pa

    from octoray.query import sorted_groupby_count
    from octoray.stages.dedup import dup_components
    from octoray.stages.webgraph import internal_edges, links_dataset

    links = links_dataset(_linked_pages(sf_dir, "wccsize_pages"))
    pairs = internal_edges(links).map_batches(
        lambda t: pa.table({"id_a": t.column("src"),
                            "id_b": t.column("dst")}),
        batch_format="pyarrow")
    comp = dup_components(pairs)
    sizes = sorted_groupby_count(comp.select_columns(["component"]),
                                 ["component"], alias="component_size")
    return sorted_groupby_count(
        sizes.select_columns(["component_size"]), ["component_size"],
        alias="n_components")


def _q_kg_provenance(sf_dir: str):
    """Per-entity provenance summary (subject, n_pages, first_page):
    where each KG entity came from — distinct-page count plus the
    lexicographically first citing page, from the keep-src lineage
    (one distinct exchange + block-local min/count after a subject
    sort)."""
    import ray.data as rd

    from octoray import oracles as O
    from octoray.pipelines.kg import build_triples, pages_dataset
    from octoray.query import distinct_values

    n = _kg_pages(sf_dir)
    raw = build_triples(pages_dataset(n, seed=42), keep_src=True,
                        n_rows_hint=n)
    if O.dump_enabled():
        raw = rd.read_parquet(O.dump_dataset("kg_prov_raw", raw))
    import pandas as pd
    import pyarrow as pa

    pairs = distinct_values(
        raw.map_batches(
            lambda t: pa.table({"subject": t.column("subject"),
                                "src": t.column("src")}),
            batch_format="pyarrow"),
        ["subject", "src"])

    def summarize(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            return pd.DataFrame({"subject": pd.Series([], dtype=object),
                                 "n_pages": pd.Series([], dtype="int64"),
                                 "first_page": pd.Series([],
                                                         dtype=object)})
        df = df.sort_values(["subject", "src"], kind="mergesort")
        g = df.groupby("subject", sort=False)
        return pd.DataFrame({
            "n_pages": g.size().astype("int64"),
            "first_page": g["src"].first(),
        }).reset_index()

    return pairs.sort(["subject"]).map_batches(
        summarize, batch_format="pandas", batch_size=None)


def _q_web_bowtie(sf_dir: str):
    """Bow-tie decomposition [Broder et al. 2000] of the internal
    link graph: core/in/out/other per node relative to the
    deterministic max-in-degree pivot; two frontier-broadcast BFS
    fixpoints + two node-sized left joins (driver fast path below the
    edge gate, pinned equal).  Oracle: same pivot rule + recursive-CTE
    closures over links the SQL re-extracts from the dumped html."""
    from octoray.stages.webgraph import bowtie, links_dataset

    return bowtie(links_dataset(_linked_pages(sf_dir, "bowtie_pages")))


def _q_web_hits(sf_dir: str):
    """HITS hubs & authorities over the internal link graph
    (Kleinberg's coupled power iteration, L2-normalized half-steps).
    Oracle: generated CTE chain re-deriving every half-step over
    edges the SQL itself re-extracts from the dumped html."""
    from octoray.stages.webgraph import hits_rank, links_dataset

    return hits_rank(links_dataset(_linked_pages(sf_dir, "hits_pages")),
                     n_iters=5)


def _q_deidentify(sf_dir: str):
    """Corpus-release redaction over the pages table: scrub contact
    PII (email/phone/IP) and the domain's sample identifiers (EPI ids,
    A0 barcodes, accessions) with sequential vectorized RE2 rules.
    Boundary: the dumped (url, text) pages; the oracle re-derives the
    counts and the redacted text from the same rule table in DuckDB."""
    import ray.data as rd

    from octoray import oracles as O
    from octoray.pipelines.kg import pages_dataset
    from octoray.stages.redact import redact_batch

    pages = pages_dataset(_kg_pages(sf_dir), seed=42).select_columns(
        ["url", "text"])
    if O.dump_enabled():
        pages = rd.read_parquet(O.dump_dataset("deid_pages", pages))
    return pages.map_batches(redact_batch, batch_format="pyarrow")


def _q_line_dedup(sf_dir: str):
    """C4-style corpus-wide sentence dedup over the pages table: every
    line that repeats across the corpus keeps only its first
    (min url, line_no) occurrence; docs reassemble from survivors.
    The synthetic pages' boilerplate sentences repeat heavily, so this
    removes real volume (the op C4 used to cut web-crawl bloat)."""
    import ray.data as rd

    from octoray import oracles as O
    from octoray.pipelines.kg import pages_dataset
    from octoray.stages.linededup import line_dedup

    pages = pages_dataset(_kg_pages(sf_dir), seed=42).select_columns(
        ["url", "text"])
    if O.dump_enabled():
        pages = rd.read_parquet(O.dump_dataset("linededup_pages", pages))
    return line_dedup(pages)


def _q_prep_ird(sf_dir: str):
    import ray.data as rd

    from octoray.pipelines.prep import prep_ird
    from octoray.sources.synth import synth_ird_table

    raw = prep_ird(rd.from_arrow(synth_ird_table(_synth_n(sf_dir, 10_000))),
                   canonical=False)
    return _prep_canon("prep_ird_raw", raw)


def _q_prep_gisaid(sf_dir: str):
    import ray.data as rd

    from octoray.pipelines.prep import prep_gisaid
    from octoray.sources.synth import synth_gisaid_table

    raw = prep_gisaid(rd.from_arrow(synth_gisaid_table(_synth_n(sf_dir, 10_000))),
                      canonical=False)
    return _prep_canon("prep_gisaid_raw", raw)


def _binding_query(sf_dir: str, dump_name: str, synth_fn, pipeline_fn, per_sf: int):
    import ray.data as rd

    from octoray import oracles as O

    tbl = synth_fn(_synth_n(sf_dir, per_sf))
    if O.dump_enabled():
        O.dump_table(dump_name, tbl)
    return pipeline_fn(rd.from_arrow(tbl))


def _q_report_constellations(sf_dir: str):
    from octoray.pipelines.reports import constellations
    from octoray.sources.synth import synth_segment_bindings

    return _binding_query(sf_dir, "constellations_input", synth_segment_bindings,
                          constellations, 10_000)


def _q_report_subtypes(sf_dir: str):
    from octoray.pipelines.reports import synthesize_subtypes
    from octoray.sources.synth import synth_subtype_bindings

    return _binding_query(sf_dir, "subtypes_input", synth_subtype_bindings,
                          synthesize_subtypes, 10_000)


def _q_report_masterlist(sf_dir: str):
    from octoray.pipelines.reports import masterlist
    from octoray.sources.synth import synth_masterlist_bindings

    return _binding_query(sf_dir, "masterlist_input", synth_masterlist_bindings,
                          masterlist, 5_000)


def _q_media_image_features(sf_dir: str):
    from octoray import oracles as O
    from octoray.stages import multimodal as M

    media = M.media_dataset(_synth_n(sf_dir, 5_000))
    if O.dump_enabled():
        O.dump_dataset("media_pixels", M.image_pixels(media))
    return M.image_features(media, concurrency=(1, 4))


def _q_media_audio_features(sf_dir: str):
    from octoray import oracles as O
    from octoray.stages import multimodal as M

    media = M.media_dataset(_synth_n(sf_dir, 5_000))
    if O.dump_enabled():
        O.dump_dataset("media_pcm", M.audio_pcm(media))
    return M.audio_features(media)


def _q_media_audio_fp(sf_dir: str):
    """Banded-energy audio fingerprint (the PCM exact-dedup tier,
    multimodal.py::audio_fingerprint); the oracle re-derives every
    hash from the dumped PCM artifact with the identical integer band
    grid and threshold."""
    from octoray import oracles as O
    from octoray.stages import multimodal as M

    media = M.media_dataset(_synth_n(sf_dir, 5_000))
    if O.dump_enabled():
        O.dump_dataset("media_afp_pcm", M.audio_pcm(media))
    return M.audio_fingerprint(media, bands=8)


def _q_media_frame_sample(sf_dir: str):
    from octoray import oracles as O
    from octoray.stages import multimodal as M

    media = M.media_dataset(_synth_n(sf_dir, 5_000))
    if O.dump_enabled():
        O.dump_dataset("media_meta", media.select_columns(["media_id", "kind", "meta_n"]))
    return M.sample_frames(media, every=2).select_columns(["media_id", "frame_idx"])


def _q_media_ahash(sf_dir: str):
    from octoray import oracles as O
    from octoray.stages import multimodal as M

    media = M.media_dataset(_synth_n(sf_dir, 5_000))
    if O.dump_enabled():
        O.dump_dataset("media_ahash_pixels", M.image_pixels(media))
    return M.image_ahash(media, grid=8, concurrency=(1, 4))


def _q_media_dedup(sf_dir: str):
    """Perceptual image dedup over a corpus with injected re-crawls:
    every image whose id % 7 == 0 re-appears under media_id+1e6 with
    the IDENTICAL payload (a byte-stable re-encode).  aHash groups
    must collapse each re-crawl onto the original (min media_id) and
    report group sizes.  Oracle re-derives every hash from the dumped
    pixel artifact, so hash + grouping + keep-first are all certified
    by the one compare."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from octoray import oracles as O
    from octoray.stages import multimodal as M

    media = M.media_dataset(_synth_n(sf_dir, 5_000))

    def recrawl(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t.column("media_id").to_numpy(zero_copy_only=False)
        keep = pa.array((ids % 7 == 0))
        t = t.filter(pc.and_(
            pc.equal(t.column("kind"), pa.scalar("image")), keep))
        new_ids = pc.add(t.column("media_id"),
                         pa.scalar(1_000_000)).cast(pa.int64())
        return t.set_column(t.schema.get_field_index("media_id"),
                            "media_id", new_ids)

    media = media.union(media.map_batches(recrawl, batch_format="pyarrow"))
    if O.dump_enabled():
        O.dump_dataset("media_dedup_pixels", M.image_pixels(media))
    return M.image_dedup(media, grid=8, concurrency=(1, 4))


def _q_media_knn(sf_dir: str):
    from octoray import oracles as O
    from octoray.stages import multimodal as M
    from octoray.stages.similarity import knn_brute

    emb = M.media_embeddings(M.media_dataset(_synth_n(sf_dir, 5_000)), dim=16)
    if O.dump_enabled():
        import ray.data as rd

        src = O.dump_dataset("media_embeddings", emb)
        emb = rd.read_parquet(src)
    return knn_brute(emb, [0, 1, 2], k=5)


def _q_minhash_lsh_pairs(sf_dir: str):
    from octoray import oracles as O
    from octoray.stages import dedup as D

    docs = _docs(sf_dir)
    if O.dump_enabled():
        import ray.data as rd

        src = O.dump_dataset(
            "minhash_sigs", D.minhash_signatures(docs, concurrency=(1, 2)))
        return D.minhash_lsh_pairs(None, threshold=0.5, sigs=rd.read_parquet(src))
    return D.minhash_lsh_pairs(docs, threshold=0.5, concurrency=(1, 2))


def _q_simhash_pairs(sf_dir: str):
    from octoray import oracles as O
    from octoray.stages import dedup as D

    docs = _docs(sf_dir)
    if O.dump_enabled():
        import ray.data as rd

        src = O.dump_dataset(
            "simhash_sigs", D.simhash_signatures(docs, concurrency=(1, 2)))
        return D.simhash_pairs(None, max_hamming=3, sigs=rd.read_parquet(src))
    return D.simhash_pairs(docs, max_hamming=3, concurrency=(1, 2))


def _q_dup_components(sf_dir: str):
    from octoray import oracles as O
    from octoray.stages import dedup as D

    pairs = D.minhash_lsh_pairs(_docs(sf_dir), threshold=0.5, concurrency=(1, 2))
    if O.dump_enabled():
        import ray.data as rd

        pairs = rd.read_parquet(O.dump_dataset("dup_pairs", pairs))
    return D.dup_components(pairs)


def _q_near_dup_kept(sf_dir: str):
    """The full near-dedup decision a corpus release runs: MinHash-LSH
    pairs -> connected components -> keep min-id representative per
    component + every untouched doc."""
    from octoray import oracles as O
    from octoray.stages import dedup as D

    docs = _docs(sf_dir)
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5, concurrency=(1, 2))
    if O.dump_enabled():
        import ray.data as rd

        pairs = rd.read_parquet(O.dump_dataset("near_dup_pairs", pairs))
    return D.near_dup_kept(docs, pairs)


def _q_semantic_dup_kept(sf_dir: str):
    """SemDeDup-style retention decision (Abbas et al. 2023 shape):
    embedding-cosine near-dup pairs (LSH buckets, vectors join back
    only for surviving candidates) -> connected components -> keep each
    component's min-id representative + every untouched vector.  The
    100-TB shape is the same as text near-dedup: pairs are sketch-
    bucketed (never all-pairs), components run distributed min-label
    propagation with pointer jumping, the drop set is stats-gated."""
    from octoray import oracles as O
    from octoray.stages import dedup as D
    from octoray.stages import similarity as S

    emb = _embeddings(sf_dir)
    pairs = S.cosine_dup_pairs(emb, threshold=0.4)
    if O.dump_enabled():
        import ray.data as rd

        pairs = rd.read_parquet(O.dump_dataset("semantic_dup_pairs", pairs))
    return D.near_dup_kept(emb, pairs, id_col="vec_id")


def _q_knn_ivf_indexed(sf_dir: str):
    """IVF as a MATERIALIZED index: cluster-partitioned parquet write,
    then top-k with storage-level pruning (only the union of the
    queries' nprobe partitions is read).  The oracle hand-off is the
    ON-DISK layout itself — (vec_id, cluster) read back from the hive
    partition dirs — plus the probe sets; the same candidate-scoring
    twin as knn_ivf then re-derives the answer."""
    import glob
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from octoray import oracles as O
    from octoray.stages import similarity as S

    emb = _embeddings(sf_dir)
    d = tempfile.mkdtemp(prefix="octoray_ivf_")
    try:
        S.write_ivf_index(emb, d, n_centroids=_IVF_CENTROIDS)
        C = S.read_ivf_centroids(d)
        qids, Q = S.load_queries(emb, _KNN_IDS)
        if O.dump_enabled():
            parts = []
            for cdir in sorted(glob.glob(os.path.join(d, "cluster=*"))):
                c = int(cdir.rsplit("=", 1)[1])
                for f in sorted(glob.glob(os.path.join(cdir, "*.parquet"))):
                    t = pq.read_table(f, columns=["vec_id"])
                    parts.append(t.append_column(
                        "cluster", pa.array([c] * t.num_rows, pa.int64())))
            O.dump_table("ivf_assign_idx", pa.concat_tables(parts))
            probes = S.ivf_probe_sets(Q, C, nprobe=min(_IVF_NPROBE, len(C)))
            O.dump_table("ivf_probes_idx", pa.table({
                "query_id": pa.array(np.repeat(qids, probes.shape[1]), pa.int64()),
                "cluster": pa.array(probes.reshape(-1), pa.int64()),
            }))
        return S.ivf_index_knn(d, Q, qids, k=_KNN_K,
                               nprobe=_IVF_NPROBE).materialize()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _q_knn_ivf_increment(sf_dir: str):
    """Incremental IVF index maintenance: build the index on HALF the
    corpus, append the other half against the frozen centroids
    (stages/similarity.py::append_ivf_index — O(increment), existing
    part files untouched), then answer top-k over the merged on-disk
    index.  The oracle re-derives the answer from the post-append
    on-disk assignments + probe sets, so the append's placement is
    what the hash compare certifies."""
    import glob
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from octoray import oracles as O
    from octoray.stages import similarity as S

    emb = _embeddings(sf_dir)

    def _parity(p):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 2 == p))
        return f

    first = emb.map_batches(_parity(0), batch_format="pyarrow")
    second = emb.map_batches(_parity(1), batch_format="pyarrow")
    d = tempfile.mkdtemp(prefix="octoray_ivf_inc_")
    try:
        S.write_ivf_index(first, d, n_centroids=_IVF_CENTROIDS)
        C = S.append_ivf_index(second, d)
        qids, Q = S.load_queries(emb, _KNN_IDS)
        if O.dump_enabled():
            parts = []
            for cdir in sorted(glob.glob(os.path.join(d, "cluster=*"))):
                c = int(cdir.rsplit("=", 1)[1])
                for f in sorted(glob.glob(os.path.join(cdir, "*.parquet"))):
                    t = pq.read_table(f, columns=["vec_id"])
                    parts.append(t.append_column(
                        "cluster", pa.array([c] * t.num_rows, pa.int64())))
            O.dump_table("ivf_assign_inc", pa.concat_tables(parts))
            probes = S.ivf_probe_sets(Q, C, nprobe=min(_IVF_NPROBE, len(C)))
            O.dump_table("ivf_probes_inc", pa.table({
                "query_id": pa.array(np.repeat(qids, probes.shape[1]),
                                     pa.int64()),
                "cluster": pa.array(probes.reshape(-1), pa.int64()),
            }))
        return S.ivf_index_knn(d, Q, qids, k=_KNN_K,
                               nprobe=_IVF_NPROBE).materialize()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _q_knn_ivf_retrain(sf_dir: str):
    """Monitored-append IVF lifecycle (VERDICT r4 #2): build the index
    on half the corpus, append the other half against the frozen
    centroids, run the drift monitor (stages/similarity.py::ivf_drift
    — increment mean-assign-cosine vs the persisted training
    baseline), then retrain-and-rewrite
    (similarity.py::retrain_ivf_index — fresh centroids over the
    post-append corpus streamed out of the cluster partitions into a
    NEW directory; the old index serves throughout).  Top-k over the
    retrained index; the oracle re-derives the answer from the
    retrained on-disk assignments + probe sets."""
    import glob
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from octoray import oracles as O
    from octoray.stages import similarity as S

    emb = _embeddings(sf_dir)

    def _parity(p):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 2 == p))
        return f

    first = emb.map_batches(_parity(0), batch_format="pyarrow")
    second = emb.map_batches(_parity(1), batch_format="pyarrow")
    d = tempfile.mkdtemp(prefix="octoray_ivf_rt0_")
    d2 = tempfile.mkdtemp(prefix="octoray_ivf_rt1_")
    try:
        S.write_ivf_index(first, d, n_centroids=_IVF_CENTROIDS)
        S.append_ivf_index(second, d)
        S.ivf_drift(d, second)  # the monitor step of the lifecycle
        C = S.retrain_ivf_index(d, d2, n_centroids=_IVF_CENTROIDS)
        qids, Q = S.load_queries(emb, _KNN_IDS)
        if O.dump_enabled():
            parts = []
            for cdir in sorted(glob.glob(os.path.join(d2, "cluster=*"))):
                c = int(cdir.rsplit("=", 1)[1])
                for f in sorted(glob.glob(os.path.join(cdir, "*.parquet"))):
                    t = pq.read_table(f, columns=["vec_id"])
                    parts.append(t.append_column(
                        "cluster", pa.array([c] * t.num_rows, pa.int64())))
            O.dump_table("ivf_assign_rt", pa.concat_tables(parts))
            probes = S.ivf_probe_sets(Q, C, nprobe=min(_IVF_NPROBE, len(C)))
            O.dump_table("ivf_probes_rt", pa.table({
                "query_id": pa.array(np.repeat(qids, probes.shape[1]),
                                     pa.int64()),
                "cluster": pa.array(probes.reshape(-1), pa.int64()),
            }))
        return S.ivf_index_knn(d2, Q, qids, k=_KNN_K,
                               nprobe=_IVF_NPROBE).materialize()
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)


def _q_knn_lsh(sf_dir: str):
    from octoray import oracles as O
    from octoray.stages import similarity as S

    emb = _embeddings(sf_dir)
    cfg = S.LSH_PRESETS["balanced"]  # recall >= 0.8 gate point
    if O.dump_enabled():
        O.dump_dataset("knn_lsh_buckets", S.bucket_codes(emb, **cfg))
    return S.lsh_bucket_knn(emb, _KNN_IDS, k=_KNN_K, preset="balanced")


_IVF_CENTROIDS = 64
_IVF_NPROBE = 24  # recall@10 = 0.86 vs brute on the sf0.1 embeddings


def _q_knn_ivf(sf_dir: str):
    """IVF coarse-quantizer ANN: spherical k-means trained on a
    deterministic sample, assignment + probe sets dumped as the oracle
    hand-off; DuckDB re-derives candidate scoring + top-k from them."""
    import numpy as np
    import pyarrow as pa

    from octoray import oracles as O
    from octoray.stages import similarity as S

    emb = _embeddings(sf_dir)
    C = S.kmeans_centroids(emb, n_centroids=_IVF_CENTROIDS)
    if O.dump_enabled():
        O.dump_dataset("ivf_assign", S.ivf_assignments(emb, C))
        qids, Q = S.load_queries(emb, _KNN_IDS)
        probes = S.ivf_probe_sets(Q, C, nprobe=min(_IVF_NPROBE, len(C)))
        O.dump_table("ivf_probes", pa.table({
            "query_id": pa.array(np.repeat(qids, probes.shape[1]), pa.int64()),
            "cluster": pa.array(probes.reshape(-1), pa.int64()),
        }))
    return S.ivf_knn(emb, _KNN_IDS, k=_KNN_K, centroids=C, nprobe=_IVF_NPROBE)


def _q_kmeans(sf_dir: str):
    """Full-corpus distributed k-means (spherical Lloyd): per
    iteration one streaming pass with a map-side combiner (k partial
    rows per batch), driver reduce bounded by k x blocks, centroids
    re-broadcast via ray.put — no shuffle anywhere.  The oracle
    re-runs the identical deterministic iterations in scalar SQL."""
    from octoray.stages import similarity as S

    return S.kmeans_cluster(_embeddings(sf_dir), k=8, n_iters=3)


def _q_pq_codes(sf_dir: str):
    """Product quantization: 4 independent 16-dim spherical codebooks
    (k=8, 3 Lloyd iterations each — the kmeans_clusters recurrence per
    subspace), corpus encoded to (vec_id, subspace, code).  Oracle:
    one sql_kmeans CTE chain per sliced subspace."""
    from octoray.stages import similarity as S

    return S.pq_codes(_embeddings(sf_dir), m=4, k=8, n_iters=3)


def _q_pq_search(sf_dir: str):
    """ADC search over PQ codes: query stays float, corpus is scored
    through its m codes via a broadcast micro-quantized LUT — corpus
    floats never touched at query time (similarity.py::pq_adc_search)."""
    from octoray.stages import similarity as S

    return S.pq_adc_search(_embeddings(sf_dir), _RRF_QID, m=4, k=8,
                           n_iters=3, k_out=10)


def _q_cosine_dup_pairs(sf_dir: str):
    from octoray import oracles as O
    from octoray.stages import similarity as S

    emb = _embeddings(sf_dir)
    if O.dump_enabled():
        O.dump_dataset("cosine_buckets", S.bucket_codes(emb))
    return S.cosine_dup_pairs(emb, threshold=0.4)


def _crawl_pages(sf_dir: str) -> int:
    return _synth_n(sf_dir, 20_000, floor=100)


_CRAWL_SNAPS = 4


def _crawl_ds(sf_dir: str, dump_name: str):
    """Multi-snapshot synthetic crawl; the dumped table is the oracle
    hand-off (DuckDB re-derives md5/domain/latest from the same
    rows)."""
    from octoray import oracles as O
    from octoray.sources.crawl import crawl_dataset

    n = _crawl_pages(sf_dir)
    if O.dump_enabled():
        O.dump_dataset(dump_name, crawl_dataset(n, n_snapshots=_CRAWL_SNAPS))
    return crawl_dataset(n, n_snapshots=_CRAWL_SNAPS)


def _q_boilerplate_lines(sf_dir: str):
    """Per-domain boilerplate lines (lines on >= 3 distinct urls of
    one domain) over the multi-snapshot crawl — site-template
    detection at host granularity."""
    from octoray.stages.crawl import boilerplate_lines

    return boilerplate_lines(_crawl_ds(sf_dir, "crawl_boiler_raw"),
                             min_urls=3)


def _q_strip_boilerplate(sf_dir: str):
    """Template-aware cleaning: per-domain boilerplate lines detected
    then anti-joined out of every fetch's text, reassembled in line
    order (ONE corpus sort).  The pipeline between extraction and
    quality scoring."""
    from octoray.stages.crawl import strip_boilerplate

    return strip_boilerplate(_crawl_ds(sf_dir, "crawl_strip_raw"),
                             min_urls=3)


def _q_kg_ranges(sf_dir: str):
    """Per-(predicate, datatype) range profile: counts + lexical
    min/max — the mis-typed-emission audit one level below kg_void."""
    from octoray.stages.canon import dedup_triples
    from octoray.stages.profile import predicate_ranges

    return predicate_ranges(dedup_triples(_kg_raw(sf_dir,
                                                  "kg_ranges_raw")))


def _q_kg_functionality(sf_dir: str):
    """Ontology induction: per-predicate functionality (fraction of
    subjects with exactly one object) — key-like vs set-valued
    predicate discovery."""
    from octoray.stages.profile import predicate_functionality

    return predicate_functionality(_kg_raw(sf_dir, "kg_func_raw"))


def _q_kg_symmetry(sf_dir: str):
    """Ontology induction #2: per-predicate symmetry over uri edges
    (owl:SymmetricProperty candidates) — swapped-key self semi-join,
    one exchange for all predicates."""
    from octoray.stages.profile import predicate_symmetry

    return predicate_symmetry(_kg_raw(sf_dir, "kg_sym_raw"))


def _q_crawl_coverage(sf_dir: str):
    """Per-(domain, snapshot) distinct-url coverage matrix — the
    crawl-ops dashboard showing which sites each wave actually
    reached; one distinct exchange + slim combine count."""
    import pyarrow as pa

    from octoray.query import distinct_values, sorted_groupby_count
    from octoray.stages.crawl import _domain_of

    crawl = _crawl_ds(sf_dir, "crawl_cov_raw")

    def slim(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "domain": _domain_of(t.column("url")),
            "snapshot": pc.cast(t.column("snapshot"), pa.int64()),
            "url": t.column("url")})

    pairs = distinct_values(
        crawl.map_batches(slim, batch_format="pyarrow"),
        ["domain", "snapshot", "url"])
    return sorted_groupby_count(
        pairs.select_columns(["domain", "snapshot"]),
        ["domain", "snapshot"], alias="n_urls")


def _q_recrawl_priority(sf_dir: str):
    """Change-frequency re-crawl scheduling signal per url (successive
    fetches whose content changed): one slim projection + one url
    sort + block-local lag compare."""
    from octoray.stages.crawl import recrawl_priority

    return recrawl_priority(_crawl_ds(sf_dir, "crawl_recrawl_raw"))


def _q_latest_per_url(sf_dir: str):
    """CDX-style re-crawl collapse: newest fetch per url (two-phase
    arg-max, one slim-row shuffle)."""
    from octoray.stages.crawl import latest_per_url

    return latest_per_url(_crawl_ds(sf_dir, "crawl_latest_raw"))


def _q_kg_delta(sf_dir: str):
    """Incremental KG maintenance: the triple-level diff between the
    graphs built from the FIRST and LAST crawl snapshots (content
    changes + appearing/vanishing urls become added/removed triples).
    Each direction is one stats-gated anti-join on the composite
    triple key; oracle = EXCEPT both ways over the two raw dumps."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from octoray import oracles as O
    from octoray.pipelines.kg import build_triples
    from octoray.sources.crawl import crawl_dataset
    from octoray.stages.canon import dedup_triples, triple_delta

    n = _crawl_pages(sf_dir)
    crawl = crawl_dataset(n, n_snapshots=_CRAWL_SNAPS)

    def snap(s: int):
        def f(t):
            keep = pc.equal(t.column("snapshot"), pa.scalar(s))
            return t.filter(keep).select(["url", "text"])

        return crawl.map_batches(f, batch_format="pyarrow")

    old_raw = build_triples(snap(0), extract=False, n_rows_hint=n)
    new_raw = build_triples(snap(_CRAWL_SNAPS - 1), extract=False,
                            n_rows_hint=n)
    if O.dump_enabled():
        old_raw = rd.read_parquet(O.dump_dataset("kg_delta_old", old_raw))
        new_raw = rd.read_parquet(O.dump_dataset("kg_delta_new", new_raw))
    return triple_delta(dedup_triples(old_raw), dedup_triples(new_raw))


def _q_crawl_delta(sf_dir: str):
    """Snapshot diff: urls added/removed/changed between the first and
    last crawl snapshot (one shared url sort + block-local pivot)."""
    from octoray.stages.crawl import crawl_delta

    return crawl_delta(_crawl_ds(sf_dir, "crawl_delta_raw"), 0, _CRAWL_SNAPS - 1)


def _synth_messy_urls(n: int, seed: int = 42):
    """Deterministic messy-url table: the canonicalization torture set
    (mixed-case hosts, default ports, fragments, tracking params,
    unsorted query params, trailing slashes, plain non-urls)."""
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    urls = []
    for i in range(n):
        r = rng.integers(0, 1 << 30)
        scheme = "https" if r % 2 else "http"
        host = f"Site{r % 37:02d}.Example.ORG"
        if r % 13 == 0:
            host = "Sub.SPAM.example.org"  # governance deny target
        elif r % 29 == 0:
            host = f"other{r % 9}.net"     # falls through to the regex rule
        if r % 5 == 0:
            host += ":443" if scheme == "https" else ":80"
        elif r % 7 == 0:
            host += ":8080"
        path = f"/A/b{r % 100}" + ("/" * int(r % 3))
        if r % 17 == 0:
            path = f"/private/doc{r % 50}"
        elif r % 19 == 0:
            path = f"/img/pic{r % 50}.jpg"
        params = []
        if r % 3 == 0:
            params.append(f"utm_source=feed{r % 4}")
        if r % 4 == 0:
            params.append("z=9")
        if r % 4 == 1:
            params.append("a=1")
        if r % 11 == 0:
            params.append("fbclid=XYZ")
        q = ("?" + "&".join(params)) if params else ""
        frag = f"#sec{r % 6}" if r % 2 else ""
        u = f"{scheme}://{host}{path}{q}{frag}"
        if r % 23 == 0:
            u = f"just text {i}"  # non-url rows pass through unchanged
        urls.append(u)
    return pa.table({"url": pa.array(urls, pa.string())})


def _q_url_canon(sf_dir: str):
    """URL canonicalization over the messy-url set; the SQL twin
    applies the same regex grammar and rule order (see
    stages/crawl.canonical_url)."""
    import ray.data as rd

    from octoray import oracles as O
    from octoray.stages.crawl import normalize_urls

    tbl = _synth_messy_urls(_synth_n(sf_dir, 50_000))
    if O.dump_enabled():
        O.dump_table("messy_urls", tbl)
    return normalize_urls(rd.from_arrow(tbl))


def _q_url_filter(sf_dir: str):
    """Crawl governance: canonicalize the messy-url set, then apply
    the first-match-wins allow/deny rule table (robots-style) to the
    canonical form — a composition query; the twin chains the same
    canonicalization CTE with a CASE generated from the SAME rules."""
    import ray.data as rd

    from octoray import oracles as O
    from octoray.stages.crawl import filter_urls, normalize_urls

    tbl = _synth_messy_urls(_synth_n(sf_dir, 50_000))
    if O.dump_enabled():
        O.dump_table("filter_urls_in", tbl)
    canon = normalize_urls(rd.from_arrow(tbl))
    return filter_urls(canon, url_col="url_canon", keep_denied=True)


def _q_per_domain_cap(sf_dir: str):
    """Crawl-curation quota: first 5 distinct urls per domain in url
    order (two-phase combiner — the shuffle moves at most n slim rows
    per block per domain)."""
    from octoray.stages.crawl import per_domain_cap

    return per_domain_cap(_crawl_ds(sf_dir, "crawl_cap_raw"), n=5)


def _q_crawl_schedule(sf_dir: str):
    """Politeness fetch scheduling: per-domain url-ordered wave ranks
    (stages/crawl.py::crawl_schedule) — drain waves in order and no
    host is hit twice per wave."""
    from octoray.stages.crawl import crawl_schedule

    return crawl_schedule(_crawl_ds(sf_dir, "crawl_sched_raw"))


def _q_domain_stats(sf_dir: str):
    """Per-domain fetch/url/char statistics (map-side partial
    aggregates + one distinct pass)."""
    from octoray.stages.crawl import domain_stats

    return domain_stats(_crawl_ds(sf_dir, "crawl_domain_raw"))


def queries() -> dict[str, Callable[[str], Any]]:
    from octoray.pipelines import relational as R
    from octoray.stages import dedup as D
    from octoray.stages import similarity as S
    from octoray.stages import textops as T
    from octoray.stages import windows as W

    def token_counts(sf_dir):
        return _docs(sf_dir).map_batches(T.token_counts, batch_format="pyarrow")

    def quality_scores(sf_dir):
        return _docs(sf_dir).map_batches(T.quality_scores, batch_format="pyarrow")

    def quality_classifier(sf_dir):
        """Model-based quality filter (stages/qualmodel.py): ONE
        feature pass -> full-batch GD with per-block gradient
        combiners (no shuffle) -> per-doc sigmoid score + keep
        decision; the oracle re-runs the identical rounded-gradient
        iterations as a generated CTE chain."""
        from octoray.stages.qualmodel import train_quality_classifier

        return train_quality_classifier(_docs(sf_dir))

    def lang_id(sf_dir):
        # stateless Arrow regex scan -> plain task pool (no actor floor
        # to starve at; r1 VERDICT #9)
        return _docs(sf_dir).map_batches(T.lang_id_batch, batch_format="pyarrow")

    def repetition_stats(sf_dir):
        return _docs(sf_dir).map_batches(T.repetition_stats, batch_format="pyarrow")

    def lang_quality_crosstab(sf_dir):
        """(pred_lang, tier, n_docs) curation dashboard: language-ID
        crossed with the global length-quartile tier — one regex scan,
        one prefix-sum tier pass, a doc-keyed join, slim combine."""
        import pyarrow as pa

        from octoray.query import hash_join, sorted_groupby_count
        from octoray.stages.textops import ntile_tiers

        docs = _docs(sf_dir)
        lang = docs.map_batches(
            T.lang_id_batch, batch_format="pyarrow").map_batches(
            lambda t: t.select(["doc_id", "pred_lang"]),
            batch_format="pyarrow")
        tiers = ntile_tiers(docs, 4, order_col="n_chars").map_batches(
            lambda t: t.select(["doc_id", "tier"]),
            batch_format="pyarrow")
        j = hash_join(lang, tiers, on="doc_id")
        return sorted_groupby_count(
            j.map_batches(lambda t: t.select(["pred_lang", "tier"]),
                          batch_format="pyarrow"),
            ["pred_lang", "tier"], alias="n_docs")

    def top_ngrams(sf_dir):
        from octoray.stages.vocab import top_ngrams as V

        return V(_docs(sf_dir), n=2, k=100)

    def asof_attribution(sf_dir):
        # purchase -> most recent prior click per user (classic
        # attribution) via the distributed backward as-of join;
        # DuckDB's native ASOF LEFT JOIN is the oracle
        import pyarrow as pa
        import pyarrow.compute as pc

        from octoray.query import asof_join

        ev = _events(sf_dir)

        def pick(etype, cols):
            def f(t):
                t = t.filter(pc.equal(t.column("event_type"),
                                      pa.scalar(etype)))
                return t.select(list(cols))
            return ev.map_batches(f, batch_format="pyarrow")

        purchases = pick("purchase", ("event_id", "user_id", "ts"))
        clicks = pick("click", ("user_id", "ts", "event_id")).map_batches(
            lambda t: t.rename_columns(["user_id", "ts", "click_id"]),
            batch_format="pyarrow")
        return asof_join(purchases, clicks, by="user_id", on="ts")

    def range_click_counts(sf_dir):
        # range join: clicks in the 30 minutes up to each purchase —
        # two merge_asof rank lookups per block, no pair expansion
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc

        from octoray.query import range_join_count

        ev = _events(sf_dir)

        def pick(etype, cols):
            def f(t):
                t = t.filter(pc.equal(t.column("event_type"),
                                      pa.scalar(etype)))
                return t.select(list(cols))
            return ev.map_batches(f, batch_format="pyarrow")

        purchases = pick("purchase", ("event_id", "user_id", "ts"))
        clicks = pick("click", ("user_id", "ts"))
        return range_join_count(purchases, clicks, by="user_id", on="ts",
                                window=pd.Timedelta(minutes=30),
                                alias="n_clicks_30m")

    _MIX_RATES = {"en": 1.0, "es": 0.5, "fr": 0.25, "de": 0.1}

    def stratified_sample(sf_dir):
        return T.stratified_sample(_docs(sf_dir), rates=_MIX_RATES,
                                   default_rate=0.05)

    def length_quantiles(sf_dir):
        return T.length_quantiles(_docs(sf_dir))

    def jsonl_roundtrip(sf_dir):
        # documents -> JSONL shards -> read back (S-family interchange
        # reader for the LLM-corpus world).  The JSONL artifact is the
        # oracle hand-off: DuckDB re-reads the same shards.
        import os

        from octoray import oracles as O
        from octoray.sources.jsonl import read_docs_jsonl, write_docs_jsonl

        d = os.path.join(O.ORACLE_DIR, "docs_jsonl")
        write_docs_jsonl(_docs(sf_dir), d)
        return read_docs_jsonl(d).map_batches(
            T.token_counts, batch_format="pyarrow")

    def tfidf_keywords(sf_dir):
        from octoray.stages.tfidf import tfidf_keywords as TF

        return TF(_docs(sf_dir), k=3)

    def pack_sequences(sf_dir):
        return T.pack_sequences(_docs(sf_dir), window_tokens=512)

    def chunk_documents(sf_dir):
        return T.chunk_documents(_docs(sf_dir), chunk_tokens=64, overlap=8)

    def inverted_index(sf_dir):
        from octoray.stages.vocab import inverted_index as II

        return II(_docs(sf_dir), min_df=2)

    def decontaminate(sf_dir):
        # 3-grams (vs the published 13) so the small-vocab test corpus
        # produces real overlap; the operator itself is n-agnostic
        from octoray.stages.decontam import decontaminate as D

        return D(_docs(sf_dir), n=3, bench_mod=20)

    def corpus_release(sf_dir):
        from octoray.pipelines.release import corpus_release as CR

        return CR(_docs(sf_dir))

    def trim_spans(sf_dir):
        from octoray.stages.spandedup import trim_duplicate_spans

        return trim_duplicate_spans(_docs(sf_dir), k=8)

    def fingerprints(sf_dir):
        return (
            _docs(sf_dir)
            .map_batches(T.fingerprints, batch_format="pyarrow")
            .select_columns(["doc_id", "md5"])
        )

    def doc_fingerprints_full(sf_dir):
        return _docs(sf_dir).map_batches(T.fingerprints, batch_format="pyarrow")

    def winnow_fps(sf_dir):
        return T.winnow_fingerprints(
            _docs(sf_dir).select_columns(["doc_id", "text"]), k=8, w=4)

    return {
        # --- KG construction (flagship; non-SQL -> rows-only checks) ---
        "kg_build": _q_kg_build,
        "kg_build_cold": _q_kg_build_cold,
        "kg_subject_degree": _q_kg_subject_degree,
        "kg_strain_pivot": _q_kg_strain_dates,
        "kg_rules_expanded": _q_kg_rules,
        "kg_pull": _q_pull,
        "kg_delete": _q_kg_delete,
        "kg_delete_bound": _q_kg_delete_bound,
        "kg_incremental": _q_kg_incremental,
        "kg_incremental_dist": _q_kg_incremental_dist,
        "kg_monthly_report": _q_kg_monthly,
        "kg_tagged_report": _q_kg_tagged_report,
        # --- SPARQL-shaped pattern layer (BGP/OPTIONAL/path/CONSTRUCT) ---
        "kg_construct": _q_kg_construct,
        "kg_optional": _q_kg_optional,
        "kg_path": _q_kg_path,
        "kg_path_star": _q_kg_path_star,
        "kg_filter_path": _q_kg_filter_path,
        "kg_filter_year": _q_kg_filter_year,
        "kg_filter_or": _q_kg_filter_or,
        "kg_group_report": _q_kg_group_report,
        "kg_monthly_bind": _q_kg_monthly_bind,
        "kg_values": _q_kg_values,
        "kg_sameas": _q_kg_sameas,
        "kg_minus": _q_kg_minus,
        "kg_not_exists": _q_kg_not_exists,
        # --- SPARQL TEXT front end (parse + execute .rq files) ---
        "sparql_monthly": _q_sparql_monthly,
        "sparql_tagged": _q_sparql_tagged,
        "sparql_unclassified": _q_sparql_unclassified,
        "sparql_ask": _q_sparql_ask,
        "sparql_describe": _q_sparql_describe,
        "sparql_context": _q_sparql_context,
        "sparql_stats": _q_sparql_stats,
        "sparql_concat_bag": _q_sparql_concat_bag,
        "sparql_negated": _q_sparql_negated,
        "sparql_subquery": _q_sparql_subquery,
        "turtle_roundtrip": _q_turtle_roundtrip,
        "turtle_foreign": _q_turtle_foreign,
        "ntriples_roundtrip": _q_ntriples_roundtrip,
        "sparql_segment": _q_sparql_segment,
        "sparql_years": _q_sparql_years,
        "entity_resolution": _q_entity_resolution,
        "entity_link": _q_entity_link,
        "entity_incremental": _q_entity_incremental,
        "kg_pagerank": _q_kg_pagerank,
        "kg_void": _q_kg_void,
        "kg_delta": _q_kg_delta,
        "kg_negatives": _q_kg_negatives,
        "kg_clustering": _q_kg_clustering,
        "kg_transe": _q_kg_transe,
        "kg_comention": _q_kg_comention,
        "kg_kcore": _q_kg_kcore,
        "kg_hops": _q_kg_hops,
        "kg_walks": _q_kg_walks,
        "kg_skipgrams": _q_kg_skipgrams,
        "knn_ivf_increment": _q_knn_ivf_increment,
        "knn_ivf_retrain": _q_knn_ivf_retrain,
        "kg_triangles": _q_kg_triangles,
        "kg_jaccard_links": _q_kg_jaccard_links,
        "kg_communities": _q_kg_communities,
        "kg_adjacency": _q_kg_adjacency,
        "kg_validate": _q_kg_validate,
        # --- web link-graph products from the raw html ---
        "extract_links": _q_extract_links,
        "anchor_text": _q_anchor_text,
        "web_linkrank": _q_web_linkrank,
        "web_harmonic": _q_web_harmonic,
        "web_hits": _q_web_hits,
        "web_frontier": _q_web_frontier,
        "web_degree_dist": _q_web_degree_dist,
        "web_reciprocity": _q_web_reciprocity,
        "web_bowtie": _q_web_bowtie,
        "web_components": _q_web_components,
        "web_component_sizes": _q_web_component_sizes,
        "kg_provenance": _q_kg_provenance,
        "host_graph": _q_host_graph,
        "anchor_names": _q_anchor_names,
        "web_diameter": _q_web_diameter,
        "web_trustrank": _q_web_trustrank,
        "web_cocitation": _q_web_cocitation,
        "web_katz": _q_web_katz,
        "web_salsa": _q_web_salsa,
        "web_salsa_hubs": _q_web_salsa_hubs,
        "web_assortativity": _q_web_assortativity,
        # --- corpus-release ops over the pages table ---
        "extract_text": _q_extract_text,
        "deidentify_pages": _q_deidentify,
        "line_dedup_pages": _q_line_dedup,
        # --- snapshot maintenance over the multi-snapshot crawl ---
        "latest_per_url": _q_latest_per_url,
        "crawl_delta": _q_crawl_delta,
        "domain_stats": _q_domain_stats,
        "boilerplate_lines": _q_boilerplate_lines,
        "strip_boilerplate": _q_strip_boilerplate,
        "recrawl_priority": _q_recrawl_priority,
        "kg_ranges": _q_kg_ranges,
        "kg_functionality": _q_kg_functionality,
        "kg_symmetry": _q_kg_symmetry,
        "crawl_coverage": _q_crawl_coverage,
        "per_domain_cap": _q_per_domain_cap,
        "crawl_schedule": _q_crawl_schedule,
        "url_canon": _q_url_canon,
        "url_filter": _q_url_filter,
        # --- stateful classification stages (X1/X2 analogues) ---
        "classify_clades": _q_classify_clades,
        "motifs": _q_motifs,
        # --- prep family: delimited inputs -> triples (S1/S2/S9) ---
        "prep_fasta": _q_prep_fasta,
        "prep_unpublished": _q_prep_unpublished,
        "prep_table": _q_prep_table,
        "prep_blast": _q_prep_blast,
        "prep_genbank": _q_prep_genbank,
        "prep_gisaid": _q_prep_gisaid,
        "prep_ivr": _q_prep_ivr,
        "prep_ird": _q_prep_ird,
        # --- report aggregations (A2/A3/A4; groupby + map_groups) ---
        "report_constellations": _q_report_constellations,
        "report_subtypes": _q_report_subtypes,
        "report_masterlist": _q_report_masterlist,
        # --- relational operator family (joins/aggregates, §2.5-2.6) ---
        "pricing_summary": R.pricing_summary,
        "orders_per_nation": R.orders_per_nation,
        "customers_no_urgent_orders": R.customers_no_urgent_orders,
        "building_priority": R.building_priority,
        "nation_segments": R.nation_segments,
        "order_quarters": R.order_quarters,
        # --- windowed / sessionized aggregates (A5 family) ---
        "monthly_rollup": lambda sf: W.monthly_rollup(_events(sf)),
        "tumbling_window": lambda sf: W.tumbling_window(_events(sf), minutes=15),
        "top_users": lambda sf: W.top_users_by_events(_events(sf), k=10),
        "sessionize": lambda sf: W.sessionize(_events(sf), gap_minutes=_GAP_MIN),
        "session_stats": lambda sf: W.session_stats(_events(sf), gap_minutes=_GAP_MIN),
        "sliding_window": lambda sf: W.sliding_window(
            _events(sf), hop_minutes=60, n_hops=3),
        "window_anomalies": lambda sf: W.window_anomalies(
            _events(sf), minutes=60, z_threshold=2.0),
        "cohort_retention": lambda sf: W.cohort_retention(
            _events(sf), period_days=7),
        "value_quantiles": _q_value_quantiles,
        "event_transitions": lambda sf: W.event_transitions(_events(sf)),
        "quality_tiers": lambda sf: __import__(
            "octoray.stages.textops", fromlist=["ntile_tiers"]
        ).ntile_tiers(
            _docs(sf).select_columns(["doc_id", "n_chars"]), 4),
        "tier_balanced_sample": _q_tier_balanced_sample,
        "top_pmi_bigrams": lambda sf: __import__(
            "octoray.stages.textops", fromlist=["top_pmi_bigrams"]
        ).top_pmi_bigrams(_docs(sf), k=20, min_count=5),
        "dsir_select": lambda sf: __import__(
            "octoray.stages.textops", fromlist=["dsir_select"]
        ).dsir_select(_docs(sf), target_source="src1", quota=500),
        "dsir_weights": lambda sf: __import__(
            "octoray.stages.textops", fromlist=["dsir_weights"]
        ).dsir_weights(_docs(sf), target_source="src1", n_buckets=1024),
        "normalize_text": lambda sf: __import__(
            "octoray.stages.textops", fromlist=["normalize_text"]
        ).normalize_text(_docs(sf)),
        "token_entropy": lambda sf: __import__(
            "octoray.stages.textops", fromlist=["token_entropy"]
        ).token_entropy(_docs(sf)),
        "ngram_novelty": lambda sf: __import__(
            "octoray.stages.textops", fromlist=["ngram_novelty"]
        ).ngram_novelty(_docs(sf), k=8),
        "group_sample": lambda sf: __import__(
            "octoray.query", fromlist=["group_sample"]
        ).group_sample(
            _docs(sf).select_columns(["source", "doc_id", "n_chars"]),
            ["source"], "doc_id", 3),
        "funnel_depths": lambda sf: W.funnel_depths(
            _events(sf), ["view", "click", "purchase"], within_minutes=120),
        "approx_distinct": lambda sf: __import__(
            "octoray.stages.sketch", fromlist=["approx_distinct"]
        ).approx_distinct(
            _events(sf).select_columns(["event_type", "user_id"]),
            "event_type", "user_id", k=64),
        "approx_quantiles": lambda sf: __import__(
            "octoray.stages.sketch", fromlist=["approx_quantiles"]
        ).approx_quantiles(
            _events(sf).select_columns(["event_type", "event_id", "value"]),
            "event_type", "event_id", "value", k=256),
        "top_docs_per_source": lambda sf: __import__(
            "octoray.query", fromlist=["grouped_top_k"]
        ).grouped_top_k(
            _docs(sf).select_columns(["source", "doc_id", "n_chars"]),
            ["source"], "n_chars", 5, tie_cols=["doc_id"]),
        "bm25_topk": lambda sf: __import__(
            "octoray.stages.tfidf", fromlist=["bm25_topk"]
        ).bm25_topk(_docs(sf), _BM25_TERMS, k=10),
        "profile_events": lambda sf: __import__(
            "octoray.stages.profile", fromlist=["profile_columns"]
        ).profile_columns(_events(sf), _PROFILE_COLS, k=256),
        "rrf_search": _q_rrf_search,
        "window_unique_users": _q_window_unique_users,
        "weighted_sample": lambda sf: __import__(
            "octoray.stages.textops", fromlist=["weighted_sample"]
        ).weighted_sample(
            _docs(sf).select_columns(["doc_id", "n_chars"]), 50),
        # --- text analysis ops ---
        "token_counts": token_counts,
        "oov_rate": lambda sf: __import__(
            "octoray.stages.vocab", fromlist=["oov_rate"]
        ).oov_rate(_docs(sf), vocab_size=1000),
        "zipf_fit": lambda sf: __import__(
            "octoray.stages.vocab", fromlist=["zipf_fit"]
        ).zipf_fit(_docs(sf), top_n=1000),
        "quality_scores": quality_scores,
        "quality_classifier": quality_classifier,
        "unigram_logprob": lambda sf: T.unigram_logprob(_docs(sf)),
        "quality_calibration": lambda sf: T.quality_calibration(
            _docs(sf), n_tiles=10),
        "bigram_logprob": lambda sf: T.bigram_logprob(_docs(sf)),
        "lm_quality_select": lambda sf: T.lm_quality_select(_docs(sf)),
        "perplexity_by_language": lambda sf: T.perplexity_by_language(_docs(sf)),
        "repetition_stats": repetition_stats,
        "decontaminate": decontaminate,
        "top_ngrams": top_ngrams,
        "heavy_hitters": lambda sf: __import__(
            "octoray.stages.vocab", fromlist=["heavy_hitters"]
        ).heavy_hitters(_docs(sf), phi=0.005),
        "bpe_train": lambda sf: __import__(
            "octoray.stages.bpe", fromlist=["train_bpe"]
        ).train_bpe(_docs(sf), n_merges=12)[0],
        "bpe_encode": _q_bpe_encode,
        "inverted_index": inverted_index,
        "chunk_documents": chunk_documents,
        "pack_sequences": pack_sequences,
        "tfidf_keywords": tfidf_keywords,
        "jsonl_roundtrip": jsonl_roundtrip,
        "warc_roundtrip": _q_warc_roundtrip,
        "stratified_sample": stratified_sample,
        "asof_attribution": asof_attribution,
        "range_click_counts": range_click_counts,
        "length_quantiles": length_quantiles,
        "lang_id": lang_id,
        "lang_quality_crosstab": lang_quality_crosstab,
        "fingerprints": fingerprints,
        "winnow_fingerprints": winnow_fps,
        "train_val_split": lambda sf: __import__(
            "octoray.stages.textops", fromlist=["train_val_split"]
        ).train_val_split(_docs(sf), val_frac=0.1),
        "mixture_resample": _q_mixture_resample,
        "shuffle_export": lambda sf: __import__(
            "octoray.stages.textops", fromlist=["shuffle_rank"]
        ).shuffle_rank(_docs(sf).select_columns(["doc_id"]), seed=7),
        "fingerprints_full": doc_fingerprints_full,
        # --- dedup family (D1/D2 + near-dup) ---
        "trim_spans": trim_spans,
        "corpus_release": corpus_release,
        "exact_dups": lambda sf: D.exact_dups(_docs(sf)),
        "jaccard_pairs": lambda sf: D.jaccard_pairs(_docs(sf), k=_JACCARD_K),
        "containment_pairs": lambda sf: D.containment_pairs(
            _docs(sf), k=_JACCARD_K, threshold=0.5),
        # duplication-multiplicity profile: histogram of exact-dup
        # cluster sizes (how duplicated is the corpus) — one slim
        # combine-count over the exact_dups cluster table
        "dup_multiplicity": lambda sf: __import__(
            "octoray.query", fromlist=["sorted_groupby_count"]
        ).sorted_groupby_count(
            D.exact_dups(_docs(sf)).select_columns(["n_docs"])
            .map_batches(lambda t: t.rename_columns(["n_copies"]),
                         batch_format="pyarrow"),
            ["n_copies"], alias="n_clusters"),
        "centroid_drift": lambda sf: S.centroid_drift(_embeddings(sf)),
        "centroid_exemplars": lambda sf: S.centroid_exemplars(
            _embeddings(sf), k=3),
        "label_noise": lambda sf: S.label_noise_candidates(
            _embeddings(sf)),
        "dedup_docs_kept": lambda sf: D.drop_exact_dups(_docs(sf)),
        "dup_components": _q_dup_components,
        "near_dup_kept": _q_near_dup_kept,
        "semantic_dup_kept": _q_semantic_dup_kept,
        "minhash_lsh_pairs": _q_minhash_lsh_pairs,
        "simhash_pairs": _q_simhash_pairs,
        # --- multimodal columns (decode/resize/frames stubbed per docs) ---
        "media_image_features": _q_media_image_features,
        "media_audio_features": _q_media_audio_features,
        "media_audio_fp": _q_media_audio_fp,
        "media_frame_sample": _q_media_frame_sample,
        "media_knn": _q_media_knn,
        "media_ahash": _q_media_ahash,
        "media_dedup": _q_media_dedup,
        # --- similarity search over embeddings ---
        "knn_brute": lambda sf: S.knn_brute(_embeddings(sf), _KNN_IDS, k=_KNN_K),
        "knn_lsh": _q_knn_lsh,
        "knn_ivf": _q_knn_ivf,
        "knn_ivf_indexed": _q_knn_ivf_indexed,
        "cosine_dup_pairs": _q_cosine_dup_pairs,
        "kmeans_clusters": _q_kmeans,
        "pq_codes": _q_pq_codes,
        "pq_search": _q_pq_search,
    }


# ----------------------------------------------------------------------
# oracle SQL (DuckDB twins; identical column names and float recipes)
# ----------------------------------------------------------------------
_NORM = "lower(regexp_replace(text, '\\s+', ' ', 'g'))"

_UNIGRAM_LP_SQL = r"""
            WITH tokens AS (SELECT doc_id,
                                   unnest(regexp_extract_all(text, '\S+')) AS t
                            FROM documents),
            cnt AS (SELECT t, CAST(count(*) AS DOUBLE) AS c FROM tokens GROUP BY t),
            tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM cnt)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   floor(avg(ln(c / tot.n)) * 1000000 + 0.5) / 1000000 AS mean_logprob
            FROM tokens JOIN cnt USING (t) CROSS JOIN tot GROUP BY doc_id
        """


def _stop_pattern(lang: str) -> str:
    from octoray.stages.textops import lang_pattern

    return lang_pattern(lang)


def _sql_bigram_scored() -> str:
    """Shared CTE chain: per-doc bigram-LM mean logprob over the
    documents view (the bigram_logprob oracle), ending at ``scored``
    so composed oracles (lm_quality_select) append their own tail."""
    return rf"""
        WITH tok AS (SELECT doc_id, word, wi FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all(text, '\S+')) AS word,
                   generate_subscripts(
                       regexp_extract_all(text, '\S+'), 1) AS wi
            FROM documents)),
        uni AS (SELECT word, CAST(count(*) AS DOUBLE) AS n1
                FROM tok GROUP BY word),
        tot AS (SELECT CAST(sum(n1) AS DOUBLE) AS n FROM uni),
        bi AS (SELECT l.doc_id, l.word AS lw, r.word AS rw
               FROM tok l JOIN tok r
                 ON r.doc_id = l.doc_id AND r.wi = l.wi + 1),
        bcnt AS (SELECT lw, rw, CAST(count(*) AS DOUBLE) AS n2
                 FROM bi GROUP BY lw, rw),
        lcnt AS (SELECT lw, CAST(sum(n2) AS DOUBLE) AS nl
                 FROM bcnt GROUP BY lw),
        terms AS (
          SELECT t.doc_id, ln(u.n1 / tot.n) AS lp
          FROM tok t JOIN uni u ON t.word = u.word
               CROSS JOIN tot
          WHERE t.wi = 1
          UNION ALL
          SELECT b.doc_id, ln(c.n2 / l.nl)
          FROM bi b JOIN bcnt c ON b.lw = c.lw AND b.rw = c.rw
               JOIN lcnt l ON b.lw = l.lw
        ),
        scored AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 {_rnd('avg(lp)', 6)} AS mean_logprob
          FROM terms GROUP BY doc_id)
    """


def _rnd(expr: str, d: int) -> str:
    scale = 10**d
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"



def _url_canon_sql(src: str) -> str:
    """The canonicalization CTE chain (same regex grammar and rule
    order as stages/crawl.canonical_url)."""
    return rf"""
        WITH u AS (SELECT url FROM {src}),
        p AS (SELECT url,
          regexp_extract(url,
            '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)', 1) AS sr,
          regexp_extract(url,
            '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)', 2) AS hr,
          regexp_extract(url,
            '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)', 3) AS pr,
          regexp_extract(url,
            '^[a-zA-Z][a-zA-Z0-9+.-]*://[^?#]*\?([^#]*)', 1) AS qr
          FROM u),
        n AS (SELECT url, sr, lower(sr) AS scheme, lower(hr) AS h0,
                     regexp_replace(pr, '/+$', '') AS p0, qr FROM p),
        n2 AS (SELECT url, sr, scheme,
                 CASE WHEN scheme = 'http' AND h0 LIKE '%:80'
                        THEN substr(h0, 1, length(h0) - 3)
                      WHEN scheme = 'https' AND h0 LIKE '%:443'
                        THEN substr(h0, 1, length(h0) - 4)
                      ELSE h0 END AS host,
                 CASE WHEN p0 = '' THEN '/' ELSE p0 END AS path,
                 list_sort(list_filter(string_split(qr, '&'),
                   x -> x <> '' AND NOT regexp_matches(x,
                          '^(utm_[^=&]*|fbclid|gclid)(=|$)'))) AS parts
               FROM n)
        SELECT url,
               CASE WHEN sr = '' OR sr IS NULL THEN url
                    ELSE scheme || '://' || host || path ||
                         CASE WHEN len(parts) > 0
                              THEN '?' || array_to_string(parts, '&')
                              ELSE '' END
               END AS url_canon
        FROM n2
    """


def _url_filter_sql(src: str) -> str:
    """Canonicalize then apply the first-match-wins rule table as a
    CASE chain generated from the SAME rules the engine evaluates
    (stages/crawl.DEFAULT_URL_RULES); host/path extraction mirrors
    _domain_of and the filter's path regex."""
    from octoray.stages.crawl import DEFAULT_URL_RULES

    whens = []
    for act, kind, pat in DEFAULT_URL_RULES:
        p = pat.replace("'", "''")
        if kind == "domain":
            c = f"(host = '{p}' OR host LIKE '%.{p}')"
        elif kind == "path_prefix":
            c = f"(path LIKE '{p}%')"
        else:
            c = f"regexp_matches(url_canon, '{p}')"
        whens.append(f"WHEN {c} THEN '{act}'")
    case = "CASE " + " ".join(whens) + " ELSE 'allow' END"
    return f"""
        WITH canon AS ({_url_canon_sql(src)}),
        px AS (SELECT url, url_canon,
                 lower(regexp_extract(url_canon,
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1)) AS host,
                 regexp_extract(url_canon,
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path
               FROM canon)
        SELECT url, url_canon, {case} AS action FROM px
    """


def oracle_sql() -> dict[str, str]:
    from octoray import oracles as Q
    from octoray.stages import graphalgo as _GA
    from octoray.stages import webgraph as _WG

    en, es, fr, de = (_stop_pattern(x) for x in ("en", "es", "fr", "de"))
    tok = r"len(regexp_extract_all(text, '\S+'))"
    knn_ids = ", ".join(str(i) for i in _KNN_IDS)

    jaccard_sql = f"""
            WITH norm AS (
              SELECT doc_id,
                     list_filter(string_split({_NORM}, ' '), t -> t <> '') AS toks
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id, unnest(
                  CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                       WHEN len(toks) < {_JACCARD_K} THEN [array_to_string(toks, ' ')]
                       ELSE [array_to_string(toks[i:i+{_JACCARD_K - 1}], ' ')
                             for i in range(1, len(toks) - {_JACCARD_K - 2})]
                  END) AS shingle
                FROM norm)),
            cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
            -- identical stop-shingle cap to jaccard_pairs(max_df):
            -- high-df shingles are excluded from PAIR GENERATION only;
            -- the per-doc denominators above stay exact
            live AS (SELECT shingle FROM sh GROUP BY 1
                     HAVING count(*) <= {_JACCARD_MAXDF}),
            shk AS (SELECT sh.* FROM sh JOIN live USING (shingle)),
            pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
                   FROM shk a JOIN shk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
            SELECT id_a, id_b, n_common, ca.n_sh AS n_a, cb.n_sh AS n_b,
                   {_rnd("CAST(n_common AS DOUBLE) / (CAST(ca.n_sh AS DOUBLE) + CAST(cb.n_sh AS DOUBLE) - CAST(n_common AS DOUBLE))", 6)} AS jaccard
            FROM pr JOIN cnt ca ON pr.id_a = ca.doc_id
                    JOIN cnt cb ON pr.id_b = cb.doc_id
        """

    lang_sql = f"""
            WITH c AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '{en}')) AS n_en,
                     len(regexp_extract_all(text, '{es}')) AS n_es,
                     len(regexp_extract_all(text, '{fr}')) AS n_fr,
                     len(regexp_extract_all(text, '{de}')) AS n_de,
                     greatest({tok}, 1) AS n_tok
              FROM documents)
            SELECT doc_id,
                   CASE WHEN n_en > 0 AND n_en >= n_es AND n_en >= n_fr AND n_en >= n_de THEN 'en'
                        WHEN n_es > 0 AND n_es >= n_fr AND n_es >= n_de THEN 'es'
                        WHEN n_fr > 0 AND n_fr >= n_de THEN 'fr'
                        WHEN n_de > 0 THEN 'de'
                        ELSE 'unknown' END AS pred_lang,
                   CAST(greatest(greatest(n_en, n_es), greatest(n_fr, n_de)) AS DOUBLE)
                       / CAST(n_tok AS DOUBLE) AS lang_score
            FROM c
        """

    sessionize_sql = f"""
        WITH g AS (
          SELECT event_id, user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_GAP_US}
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT event_id, user_id,
               CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
        FROM g
    """

    from octoray.stages.sketch import (sql_approx_distinct,
                                       sql_approx_quantiles)
    from octoray.stages.tfidf import sql_bm25_topk

    _sketch_oracle = sql_approx_distinct("events", "event_type", "user_id",
                                         k=64)
    _quant_oracle = sql_approx_quantiles("events", "event_type", "event_id",
                                         "value", k=256)
    _bm25_oracle = sql_bm25_topk("documents", _BM25_TERMS, k=10)

    from octoray.stages.profile import sql_profile_columns

    _profile_oracle = sql_profile_columns("events", _PROFILE_COLS, k=256)

    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
                       AS sum_base_price,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem GROUP BY 1, 2
        """,
        "orders_per_nation": """
            SELECT n_name, count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1
        """,
        "customers_no_urgent_orders": """
            SELECT c_custkey FROM customer
            WHERE c_custkey NOT IN
                  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        """,
        "building_priority": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
            GROUP BY 1
        """,
        "nation_segments": """
            SELECT n_name,
                   string_agg(DISTINCT c_mktsegment, '+' ORDER BY c_mktsegment) AS segments
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1
        """,
        "order_quarters": """
            SELECT concat(CAST(year(o_orderdate) AS VARCHAR), 'Q',
                          CAST((month(o_orderdate) + 2) // 3 AS VARCHAR)) AS quarter,
                   count(*) AS n_orders
            FROM orders GROUP BY 1
        """,
        "monthly_rollup": """
            SELECT event_type,
                   CAST(year(ts) AS INTEGER) AS year,
                   CAST(month(ts) AS INTEGER) AS month,
                   count(*) AS n_events,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
            FROM events GROUP BY 1, 2, 3
        """,
        "tumbling_window": """
            SELECT event_type,
                   time_bucket(INTERVAL 15 minutes, ts) AS window_start,
                   count(*) AS n_events,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "top_users": """
            SELECT user_id, count(*) AS n_events
            FROM events GROUP BY 1
            ORDER BY n_events DESC, user_id ASC LIMIT 10
        """,
        "sliding_window": """
            SELECT event_type,
                   time_bucket(INTERVAL 60 minutes, ts)
                     - j * (INTERVAL 60 minutes) AS window_start,
                   count(*) AS n_events,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                     / 100.0 AS sum_value
            FROM events CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)
            GROUP BY 1, 2
        """,
        "funnel_depths": """
            WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                        WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2
                   FROM events e JOIN s1 USING (user_id)
                   WHERE e.event_type = 'click' AND e.ts > s1.t1
                     AND e.ts <= s1.t1 + INTERVAL 120 minutes
                   GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, min(e.ts) AS t3
                   FROM events e JOIN s2 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                     AND e.ts <= s2.t2 + INTERVAL 120 minutes
                   GROUP BY e.user_id)
            SELECT s1.user_id,
                   CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                             WHEN s2.user_id IS NOT NULL THEN 2
                             ELSE 1 END AS BIGINT) AS depth
            FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
                    LEFT JOIN s3 ON s1.user_id = s3.user_id
        """,
        "approx_distinct": _sketch_oracle,
        "approx_quantiles": _quant_oracle,
        "profile_events": _profile_oracle,
        "quality_tiers": """
            SELECT doc_id, n_chars,
                   CAST(ntile(4) OVER (ORDER BY n_chars, doc_id)
                        AS BIGINT) AS tier
            FROM documents
        """,
        "tier_balanced_sample": """
            WITH t AS (SELECT doc_id, n_chars,
                              CAST(ntile(4) OVER (ORDER BY n_chars, doc_id)
                                   AS BIGINT) AS tier
                       FROM documents),
            r AS (SELECT doc_id, n_chars, tier,
                         row_number() OVER (
                             PARTITION BY tier
                             ORDER BY md5_number_lower(
                                 CAST(doc_id AS VARCHAR)), doc_id) AS rn
                  FROM t)
            SELECT doc_id, n_chars, tier FROM r WHERE rn <= 8
        """,
        "event_transitions": """
            WITH s AS (SELECT user_id, event_type,
                              lead(event_type) OVER
                                (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS nxt
                       FROM events)
            SELECT event_type AS from_type, nxt AS to_type,
                   count(*) AS n
            FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
        """,
        "dsir_weights": __import__(
            "octoray.stages.textops", fromlist=["sql_dsir_weights"]
        ).sql_dsir_weights(target_source="src1", n_buckets=1024),
        "dsir_select": __import__(
            "octoray.stages.textops", fromlist=["sql_dsir_select"]
        ).sql_dsir_select(target_source="src1", quota=500,
                          n_buckets=1024),
        "normalize_text": __import__(
            "octoray.stages.textops", fromlist=["SQL_NORMALIZE_TEXT"]
        ).SQL_NORMALIZE_TEXT,
        "group_sample": __import__(
            "octoray.query", fromlist=["sql_group_sample"]
        ).sql_group_sample("documents", ["source"], "doc_id", 3,
                           ["source", "doc_id", "n_chars"]),
        "token_entropy": __import__(
            "octoray.stages.textops", fromlist=["SQL_TOKEN_ENTROPY"]
        ).SQL_TOKEN_ENTROPY,
        "ngram_novelty": __import__(
            "octoray.stages.textops", fromlist=["sql_ngram_novelty"]
        ).sql_ngram_novelty(k=8),
        "top_pmi_bigrams": r"""
            WITH tk AS (SELECT doc_id,
                               regexp_extract_all(text, '\S+') AS t
                        FROM documents),
            tok AS (SELECT doc_id, unnest(t) AS word,
                           generate_subscripts(t, 1) AS wi FROM tk),
            uni AS (SELECT word, CAST(count(*) AS BIGINT) AS c
                    FROM tok GROUP BY 1),
            tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
            bi AS (SELECT l.word AS w1, r.word AS w2,
                          CAST(count(*) AS BIGINT) AS c12
                   FROM tok l JOIN tok r
                     ON r.doc_id = l.doc_id AND r.wi = l.wi + 1
                   GROUP BY 1, 2),
            sc AS (SELECT w1, w2, c12,
                     floor(ln((CAST(c12 AS DOUBLE) * CAST(n AS DOUBLE))
                              / (CAST(u1.c AS DOUBLE)
                                 * CAST(u2.c AS DOUBLE)))
                           * 1000000 + 0.5) / 1000000 AS pmi
                   FROM bi JOIN uni u1 ON w1 = u1.word
                           JOIN uni u2 ON w2 = u2.word CROSS JOIN tot
                   WHERE c12 >= 5)
            SELECT w1, w2, c12 AS n12, pmi
            FROM sc ORDER BY pmi DESC, w1, w2 LIMIT 20
        """,
        "value_quantiles": """
            WITH c AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS vc,
                              count(*) AS n
                       FROM events GROUP BY 1, 2),
            w AS (SELECT event_type, vc,
                         sum(n) OVER (PARTITION BY event_type
                                      ORDER BY vc) AS cum,
                         sum(n) OVER (PARTITION BY event_type) AS tot
                  FROM c)
            SELECT event_type,
              CAST(min(vc) FILTER (WHERE cum >= ceil(0.50 * tot))
                   AS DOUBLE) / 100.0 AS p50,
              CAST(min(vc) FILTER (WHERE cum >= ceil(0.90 * tot))
                   AS DOUBLE) / 100.0 AS p90,
              CAST(min(vc) FILTER (WHERE cum >= ceil(0.99 * tot))
                   AS DOUBLE) / 100.0 AS p99
            FROM w GROUP BY event_type
        """,
        "cohort_retention": """
            WITH w AS (SELECT user_id,
                              epoch_us(ts) // 604800000000 AS wk
                       FROM events),
            f AS (SELECT user_id, min(wk) AS cohort_period FROM w
                  GROUP BY 1),
            a AS (SELECT DISTINCT user_id, wk FROM w)
            SELECT cohort_period, wk - cohort_period AS offset,
                   count(*) AS n_users
            FROM a JOIN f USING (user_id) GROUP BY 1, 2
        """,
        "window_anomalies": """
            WITH c AS (SELECT event_type,
                              time_bucket(INTERVAL 60 minutes, ts)
                                AS window_start,
                              count(*) AS n_events
                       FROM events GROUP BY 1, 2),
            s AS (SELECT event_type,
                         CAST(sum(n_events) AS BIGINT) AS sc,
                         CAST(sum(n_events * n_events) AS BIGINT) AS sq,
                         count(*) AS nw
                  FROM c GROUP BY 1),
            z AS (SELECT c.event_type, window_start, n_events,
                    CASE WHEN (CAST(sq AS DOUBLE) / nw)
                              - (CAST(sc AS DOUBLE) / nw)
                                * (CAST(sc AS DOUBLE) / nw) = 0.0
                         THEN 0.0
                         ELSE (CAST(n_events AS DOUBLE)
                               - (CAST(sc AS DOUBLE) / nw))
                              / sqrt((CAST(sq AS DOUBLE) / nw)
                                     - (CAST(sc AS DOUBLE) / nw)
                                       * (CAST(sc AS DOUBLE) / nw))
                    END AS zz
                  FROM c JOIN s USING (event_type))
            SELECT event_type, window_start, n_events,
                   floor(zz * 1000000 + 0.5) / 1000000 AS z,
                   floor(zz * 1000000 + 0.5) / 1000000 >= 2.0
                     OR floor(zz * 1000000 + 0.5) / 1000000 <= -2.0
                     AS is_anomaly
            FROM z
        """,
        "weighted_sample": """
            WITH kdf AS (SELECT doc_id, n_chars,
                   ln(md5_number_lower(CAST(doc_id AS VARCHAR))
                      / 18446744073709551616.0) / n_chars AS key
                 FROM documents WHERE n_chars > 0)
            SELECT doc_id, n_chars FROM kdf
            ORDER BY key DESC, doc_id LIMIT 50
        """,
        "window_unique_users": sql_approx_distinct(
            "(SELECT event_type,"
            " time_bucket(INTERVAL 6 hours, ts) AS window_start,"
            " user_id FROM events)",
            ["event_type", "window_start"], "user_id", k=64),
        "rrf_search": f"""
            WITH bm AS ({sql_bm25_topk("documents", _BM25_TERMS, k=50)}),
            bmr AS (SELECT doc_id AS id,
                           row_number() OVER (ORDER BY score DESC, doc_id)
                             AS r FROM bm),
            q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                  FROM embeddings WHERE vec_id = {_RRF_QID}),
            sc AS (SELECT e.vec_id AS id,
                          list_cosine_similarity(
                            CAST(e.embedding AS DOUBLE[]), q.qv) AS s
                   FROM embeddings e, q WHERE e.vec_id <> {_RRF_QID}),
            rk AS (SELECT id, s, row_number() OVER (ORDER BY s DESC, id)
                     AS rn FROM sc),
            k50 AS (SELECT id, floor(s * 1000000 + 0.5) / 1000000 AS s6
                    FROM rk WHERE rn <= 50),
            knr AS (SELECT id, row_number() OVER (ORDER BY s6 DESC, id)
                      AS r FROM k50),
            u AS (SELECT id, r FROM bmr UNION ALL SELECT id, r FROM knr),
            f AS (SELECT id, sum(1.0 / (60.0 + r)) AS s FROM u GROUP BY id)
            SELECT id, floor(s * 1000000 + 0.5) / 1000000 AS rrf
            FROM f ORDER BY rrf DESC, id LIMIT 20
        """,
        "top_docs_per_source": """
            SELECT source, doc_id, n_chars FROM (
              SELECT source, doc_id, n_chars,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY n_chars DESC, doc_id) AS rn
              FROM documents) WHERE rn <= 5
        """,
        "bm25_topk": _bm25_oracle,
        "sessionize": sessionize_sql,
        "session_stats": f"""
            WITH s AS ({sessionize_sql}),
            per AS (SELECT user_id, session_id, count(*) AS n FROM s GROUP BY 1, 2)
            SELECT user_id, count(*) AS n_sessions, CAST(sum(n) AS BIGINT) AS n_events,
                   max(n) AS max_session_len
            FROM per GROUP BY 1
        """,
        "oov_rate": __import__(
            "octoray.stages.vocab", fromlist=["sql_oov_rate"]
        ).sql_oov_rate(vocab_size=1000),
        "zipf_fit": __import__(
            "octoray.stages.vocab", fromlist=["sql_zipf_fit"]
        ).sql_zipf_fit(top_n=1000),
        "token_counts": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '\S+')) AS n_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe
            FROM documents
        """,
        "kg_filter_path": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object, object_datatype
                       FROM (SELECT subject, predicate, object, object_datatype
                             FROM {Q.rpd('kg_fp_raw')}
                             UNION ALL
                             SELECT subject, predicate, object, object_datatype
                             FROM {Q.rp('kg_fp_geo')})),
            n AS (SELECT subject, object AS n FROM d
                  WHERE predicate = 'f:strain_name'),
            st AS (SELECT subject, object AS loc FROM d
                   WHERE predicate = 'f:state'),
            nm AS (SELECT subject AS loc, object AS state_name FROM d
                   WHERE predicate = 'f:name'),
            acc AS (SELECT subject, object AS acc FROM d
                    WHERE predicate IN ('f:genbank_id', 'f:barcode'))
            SELECT n.subject AS s, n.n, nm.state_name, acc.acc
            FROM n JOIN st ON n.subject = st.subject
                   JOIN nm ON st.loc = nm.loc
                   JOIN acc ON n.subject = acc.subject
            WHERE regexp_matches(n.n, '^A/') AND acc.acc <> ''
        """,
        "kg_values": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object
                       FROM {Q.rpd('kg_values_raw')}),
            n AS (SELECT subject, object AS n FROM d
                  WHERE predicate = 'f:strain_name'),
            h AS (SELECT subject, object AS h FROM d
                  WHERE predicate = 'f:host'),
            v(h, host_label) AS (VALUES ('swine', 'pig'),
                                        ('human', 'person'))
            SELECT n.subject AS s, n.n, h.h, v.host_label
            FROM n JOIN h ON n.subject = h.subject
                   JOIN v ON h.h = v.h
        """,
        "kg_sameas": Q.sql_sameas_graph(
            Q.rpd("sameas_pairs"), Q.rpd("kg_sameas_raw")),
        "kg_minus": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object
                       FROM {Q.rpd('kg_minus_raw')}),
            n AS (SELECT subject AS sid, object AS n FROM d
                  WHERE predicate = 'f:strain_name'),
            h AS (SELECT subject AS sid, object AS h FROM d
                  WHERE predicate = 'f:host')
            SELECT n.sid, n.n, h.h
            FROM n JOIN h ON n.sid = h.sid
            WHERE NOT EXISTS (
                SELECT 1 FROM d c JOIN d s ON c.subject = s.subject
                WHERE c.subject = n.sid
                  AND c.predicate = 'f:constellation'
                  AND s.predicate = 'f:subtype')
        """,
        "kg_not_exists": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object
                       FROM {Q.rpd('kg_ne_raw')}),
            n AS (SELECT subject AS sid, object AS n FROM d
                  WHERE predicate = 'f:strain_name'),
            dt AS (SELECT subject AS sid, object AS d FROM d
                   WHERE predicate = 'f:date')
            SELECT n.sid, n.n, dt.d
            FROM n JOIN dt ON n.sid = dt.sid
            WHERE NOT EXISTS (
                SELECT 1 FROM d x
                WHERE x.subject = n.sid AND x.predicate = 'f:subtype'
                  AND regexp_matches(x.object, '^H3'))
        """,
        "sparql_monthly": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object
                       FROM {Q.rpd('sparql_monthly_raw')}),
            s AS (SELECT subject AS sid, object AS strain FROM d
                  WHERE predicate = 'f:strain_name'),
            h AS (SELECT subject AS sid, object AS host FROM d
                  WHERE predicate = 'f:host'),
            dt AS (SELECT subject AS sid, object AS dte FROM d
                   WHERE predicate = 'f:date'),
            bc AS (SELECT subject AS sid, object AS barcode FROM d
                   WHERE predicate = 'f:barcode'),
            seg AS (SELECT subject AS sid, object AS gid FROM d
                    WHERE predicate = 'f:has_segment'),
            gb AS (SELECT subject AS gid, object AS gb FROM d
                   WHERE predicate = 'f:genbank_id'),
            b AS (
              SELECT s.strain, h.host,
                try_cast(nullif(regexp_extract(dt.dte,
                  '^(\\d{{4}})', 1), '') AS BIGINT) AS year,
                try_cast(nullif(regexp_extract(dt.dte,
                  '^\\d{{4}}-(\\d{{2}})', 1), '') AS BIGINT) AS month,
                try_cast(nullif(regexp_extract(dt.dte,
                  '^\\d{{4}}-\\d{{2}}-(\\d{{2}})', 1), '') AS BIGINT)
                  AS day,
                bc.barcode, gb.gb
              FROM s JOIN h ON h.sid = s.sid
                     JOIN dt ON dt.sid = s.sid
                     JOIN seg ON seg.sid = s.sid
                     JOIN gb ON gb.gid = seg.gid
                     LEFT JOIN bc ON bc.sid = s.sid
              WHERE regexp_matches(s.strain, '^A/') AND h.host = 'swine'
            )
            SELECT
              coalesce(string_agg(DISTINCT barcode, '+'
                                  ORDER BY barcode), '') AS barcodes,
              strain, host, year, month,
              coalesce(string_agg(DISTINCT cast(day AS varchar), '+'
                       ORDER BY cast(day AS varchar)), '') AS days,
              coalesce(string_agg(DISTINCT gb, '+' ORDER BY gb), '')
                AS genbanks
            FROM b
            WHERE month IS NOT NULL AND year = 2018
            GROUP BY strain, host, year, month
        """,
        "sparql_tagged": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object
                       FROM {Q.rpd('sparql_tagged_raw')}),
            t AS (SELECT DISTINCT id AS tag FROM {Q.rp('sparql_tag_ids')}),
            hit AS (
              SELECT d.subject AS sid FROM d JOIN t ON d.object = t.tag
              WHERE d.predicate = 'f:strain_name'
              UNION
              SELECT d.subject FROM d JOIN t ON d.object = t.tag
              WHERE d.predicate = 'f:barcode'
              UNION
              SELECT seg.subject FROM d seg
                JOIN d g ON seg.object = g.subject
                JOIN t ON g.object = t.tag
              WHERE seg.predicate = 'f:has_segment'
                AND g.predicate = 'f:genbank_id'
            ),
            b AS (
              SELECT s.object AS strain, dt.object AS dte,
                     h.object AS host, st.object AS subtype
              FROM hit
              JOIN d s ON s.subject = hit.sid
                AND s.predicate = 'f:strain_name'
              JOIN d dt ON dt.subject = hit.sid
                AND dt.predicate = 'f:date'
              LEFT JOIN d h ON h.subject = hit.sid
                AND h.predicate = 'f:host'
              LEFT JOIN d st ON st.subject = hit.sid
                AND st.predicate = 'f:subtype'
            )
            SELECT strain,
              coalesce(string_agg(DISTINCT host, '+' ORDER BY host),
                       '') AS hosts,
              coalesce(string_agg(DISTINCT subtype, '+'
                                  ORDER BY subtype), '') AS subtypes,
              min(dte) AS earliest_date
            FROM b GROUP BY strain
        """,
        "sparql_segment": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object
                       FROM {Q.rpd('sparql_seg_raw')}),
            t AS (SELECT DISTINCT id AS tag FROM {Q.rp('sparql_seg_ids')}),
            hit AS (
              SELECT d.subject AS sid FROM d JOIN t ON d.object = t.tag
              WHERE d.predicate = 'f:strain_name'
              UNION
              SELECT d.subject FROM d JOIN t ON d.object = t.tag
              WHERE d.predicate = 'f:barcode'
              UNION
              SELECT seg.subject FROM d seg
                JOIN d g ON seg.object = g.subject
                JOIN t ON g.object = t.tag
              WHERE seg.predicate = 'f:has_segment'
                AND g.predicate = 'f:genbank_id'
            ),
            b AS (
              SELECT gbv.object AS gb, n.object AS strain,
                     c.object AS constellation, gl.object AS gl_clade
              FROM hit
              JOIN d n ON n.subject = hit.sid
                AND n.predicate = 'f:strain_name'
              JOIN d hs ON hs.subject = hit.sid
                AND hs.predicate = 'f:has_segment'
              JOIN d gbv ON gbv.subject = hs.object
                AND gbv.predicate = 'f:genbank_id'
              LEFT JOIN d c ON c.subject = hs.object
                AND c.predicate = 'f:constellation'
              LEFT JOIN d gl ON gl.subject = hit.sid
                AND gl.predicate = 'f:global_clade'
            )
            SELECT gb, strain,
              coalesce(string_agg(DISTINCT constellation, '+'
                                  ORDER BY constellation),
                       '') AS constellations,
              coalesce(string_agg(DISTINCT gl_clade, '+'
                                  ORDER BY gl_clade), '') AS gl_clades
            FROM b GROUP BY gb, strain
        """,
        "sparql_context": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object
                       FROM {Q.rpd('sparql_ctx_raw')}),
            b AS (
              SELECT s.object AS strain, dt.object AS dte,
                     st.object AS subtype, gb.object AS magb
              FROM d s
              JOIN d h ON h.subject = s.subject
                AND h.predicate = 'f:host' AND h.object = 'swine'
              JOIN d dt ON dt.subject = s.subject
                AND dt.predicate = 'f:date'
              LEFT JOIN d st ON st.subject = s.subject
                AND st.predicate = 'f:subtype'
              LEFT JOIN (
                SELECT seg.subject AS sid, g.object
                FROM d seg JOIN d g ON g.subject = seg.object
                WHERE seg.predicate = 'f:has_segment'
                  AND g.predicate = 'f:genbank_id'
                  AND regexp_matches(g.object, '^MA')
              ) gb ON gb.sid = s.subject
              WHERE s.predicate = 'f:strain_name'
            ),
            f AS (
              SELECT * FROM b
              WHERE (dte > '2016-01-01' AND dte < '2017-12-31')
                 OR (try_cast(nullif(regexp_extract(dte,
                       '^(\\d{{4}})', 1), '') AS BIGINT) > 2019
                     AND subtype IS NOT NULL
                     AND regexp_matches(subtype, '^H1'))
            )
            SELECT strain,
              coalesce(string_agg(DISTINCT subtype, '+'
                                  ORDER BY subtype), '') AS subtypes,
              min(dte) AS earliest_date,
              coalesce(string_agg(DISTINCT magb, '+'
                                  ORDER BY magb), '') AS ma_genbanks
            FROM f GROUP BY strain
        """,
        "ntriples_roundtrip": __import__(
            "octoray.sinks", fromlist=["sql_ntriples_lines"]
        ).sql_ntriples_lines(Q.rpd("nt_triples")),
        "turtle_foreign": Q.sql_kg_build(Q.rp("ttl_foreign_expected")),
        "turtle_roundtrip": f"""
            SELECT subject, predicate, object, object_datatype
            FROM {Q.rpd('ttl_triples')}
        """,
        "sparql_subquery": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object
                       FROM {Q.rpd('sparql_sub_raw')}),
            n AS (SELECT subject, object AS name FROM d
                  WHERE predicate = 'f:strain_name'),
            h AS (SELECT DISTINCT subject FROM d
                  WHERE predicate = 'f:host' AND object = 'swine'),
            c AS (SELECT subject,
                         CAST(count(DISTINCT object) AS VARCHAR) AS nseg
                  FROM d WHERE predicate = 'f:has_segment'
                  GROUP BY subject)
            SELECT n.name AS name, c.nseg AS nseg
            FROM n JOIN h ON h.subject = n.subject
                   JOIN c ON c.subject = n.subject
        """,
        "sparql_negated": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object
                       FROM {Q.rpd('sparql_neg_raw')}),
            n AS (SELECT DISTINCT subject FROM d
                  WHERE predicate = 'f:strain_name')
            SELECT DISTINCT n.subject AS s, x.object AS v
            FROM n JOIN d x ON x.subject = n.subject
            WHERE x.predicate NOT IN ('f:strain_name', 'f:has_segment')
        """,
        "sparql_concat_bag": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object
                       FROM {Q.rpd('sparql_concat_bag_raw')}),
            b AS (
              SELECT h.object AS host, s.object AS subtype
              FROM d h JOIN d s ON s.subject = h.subject
                AND s.predicate = 'f:subtype'
              WHERE h.predicate = 'f:host'
            )
            SELECT host,
                   string_agg(subtype, '+' ORDER BY subtype) AS subtypes,
                   CAST(count(subtype) AS BIGINT) AS n
            FROM b GROUP BY host
        """,
        "sparql_stats": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object
                       FROM {Q.rpd('sparql_stats_raw')}),
            b AS (
              SELECT h.object AS host, dt.object AS dte
              FROM d h JOIN d dt ON dt.subject = h.subject
                AND dt.predicate = 'f:date'
              WHERE h.predicate = 'f:host'
            )
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
                   min(dte) AS first_date,
                   max(dte) AS last_date,
                   coalesce(string_agg(DISTINCT host, '+' ORDER BY host),
                            '') AS host_list
            FROM b
        """,
        "sparql_years": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object
                       FROM {Q.rpd('sparql_years_raw')}),
            b AS (
              SELECT h.object AS host,
                     try_cast(nullif(regexp_extract(dt.object,
                       '^(\\d{{4}})', 1), '') AS BIGINT) AS y
              FROM d h JOIN d dt ON dt.subject = h.subject
                AND dt.predicate = 'f:date'
              WHERE h.predicate = 'f:host'
            )
            SELECT host, CAST(count(y) AS BIGINT) AS n,
                   CAST(sum(y) AS DOUBLE) AS sum_year,
                   CASE WHEN count(y) = 0 THEN NULL
                        ELSE CAST(sum(y) AS DOUBLE) / count(y) END
                     AS avg_year
            FROM b GROUP BY host
        """,
        "sparql_ask": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object
                       FROM {Q.rpd('sparql_ask_raw')})
            SELECT EXISTS (
              SELECT 1 FROM d h
              JOIN d b ON b.subject = h.subject
                AND b.predicate = 'f:barcode'
              JOIN d c ON c.subject = h.subject
                AND c.predicate = 'f:constellation'
              WHERE h.predicate = 'f:host' AND h.object = 'swine'
            ) AS ask
        """,
        "sparql_describe": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object,
                              object_datatype
                       FROM {Q.rpd('sparql_desc_raw')})
            SELECT subject, predicate, object, object_datatype FROM d
            WHERE subject IN (
              SELECT subject FROM d
              WHERE predicate = 'f:subtype' AND object = 'H3N2')
        """,
        "sparql_unclassified": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object
                       FROM {Q.rpd('sparql_uncls_raw')})
            SELECT DISTINCT gb.object AS gb, s.object AS strain
            FROM d h
            JOIN d s ON s.subject = h.subject
              AND s.predicate = 'f:strain_name'
            JOIN d seg ON seg.subject = h.subject
              AND seg.predicate = 'f:has_segment'
            JOIN d gb ON gb.subject = seg.object
              AND gb.predicate = 'f:genbank_id'
            WHERE h.predicate = 'f:host' AND h.object = 'swine'
              AND NOT EXISTS (
                SELECT 1 FROM d c JOIN d k ON c.subject = k.subject
                WHERE c.subject = h.subject
                  AND c.predicate = 'f:global_clade'
                  AND k.predicate = 'f:constellation')
        """,
        "entity_resolution": Q.sql_entity_resolution(
            Q.rpd("entity_mentions")),
        "entity_link": Q.sql_entity_link(
            Q.rpd("link_mentions"), Q.rpd("link_lexicon")),
        "entity_incremental": Q.sql_entity_incremental(
            Q.rpd("entity_mentions_inc")),
        "mixture_resample": __import__(
            "octoray.stages.textops", fromlist=["sql_mixture_resample"]
        ).sql_mixture_resample(_MIX_RATES, default_rate=_MIX_DEFAULT),
        "shuffle_export": __import__(
            "octoray.stages.textops", fromlist=["sql_shuffle_rank"]
        ).sql_shuffle_rank(seed=7),
        "kg_monthly_bind": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object
                       FROM {Q.rpd('kg_mb_raw')}),
            n AS (SELECT subject FROM d WHERE predicate = 'f:strain_name'),
            dt AS (SELECT subject,
                     try_cast(nullif(regexp_extract(object,
                       '^(\\d{{4}})', 1), '') AS BIGINT) AS year,
                     try_cast(nullif(regexp_extract(object,
                       '^\\d{{4}}-(\\d{{2}})', 1), '') AS BIGINT) AS month
                   FROM d WHERE predicate = 'f:date')
            SELECT year, month,
                   CAST(count(DISTINCT n.subject) AS BIGINT) AS n_strains
            FROM n JOIN dt ON n.subject = dt.subject
            WHERE month IS NOT NULL AND month > 0
            GROUP BY year, month
        """,
        "kg_group_report": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object
                       FROM {Q.rpd('kg_ga_raw')}),
            n AS (SELECT subject, object AS n FROM d
                  WHERE predicate = 'f:strain_name'),
            dt AS (SELECT subject, object AS dd FROM d
                   WHERE predicate = 'f:date'),
            sg AS (SELECT subject, object AS g FROM d
                   WHERE predicate = 'f:has_segment')
            SELECT n.subject AS s, n.n,
                   string_agg(DISTINCT dd, '+' ORDER BY dd) AS dates,
                   min(dd) AS first_date,
                   CAST(count(DISTINCT g) AS BIGINT) AS n_segments
            FROM n JOIN dt ON n.subject = dt.subject
                   JOIN sg ON n.subject = sg.subject
            GROUP BY n.subject, n.n
        """,
        "kg_filter_year": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object
                       FROM {Q.rpd('kg_fy_raw')}),
            n AS (SELECT subject, object AS n FROM d
                  WHERE predicate = 'f:strain_name'),
            dt AS (SELECT subject, object AS dd FROM d
                   WHERE predicate = 'f:date')
            SELECT n.subject AS s, n.n, dt.dd AS d
            FROM n JOIN dt ON n.subject = dt.subject
            WHERE try_cast(nullif(regexp_extract(dt.dd,
                      '^(\\d{{4}})', 1), '') AS INTEGER) BETWEEN 2017 AND 2019
              AND try_cast(nullif(regexp_extract(dt.dd,
                      '^\\d{{4}}-(\\d{{2}})', 1), '') AS INTEGER) > 6
        """,
        "kg_filter_or": f"""
            WITH d AS (SELECT DISTINCT subject, predicate, object
                       FROM {Q.rpd('kg_for_raw')}),
            n AS (SELECT subject, object AS n FROM d
                  WHERE predicate = 'f:strain_name'),
            dt AS (SELECT subject, object AS dd FROM d
                   WHERE predicate = 'f:date'),
            h AS (SELECT subject, object AS h FROM d
                  WHERE predicate = 'f:host'),
            st AS (SELECT subject, object AS st FROM d
                   WHERE predicate = 'f:subtype')
            SELECT n.subject AS s, n.n, dt.dd AS d, h.h, st.st
            FROM n JOIN dt ON n.subject = dt.subject
                   JOIN h ON n.subject = h.subject
                   LEFT JOIN st ON n.subject = st.subject
            WHERE h.h IN ('swine', 'human')
              AND ( (dt.dd > '2016' AND dt.dd < '2019')
                 OR ( try_cast(nullif(regexp_extract(dt.dd,
                          '^(\\d{{4}})', 1), '') AS INTEGER) > 2020
                      AND st.st IS NOT NULL
                      AND regexp_matches(st.st, '^H[13]') ) )
        """,
        "unigram_logprob": _UNIGRAM_LP_SQL,
        "quality_calibration": f"""
            WITH lp AS ({_UNIGRAM_LP_SQL}),
            t AS (SELECT doc_id,
                         ntile(10) OVER (ORDER BY n_tokens, doc_id)
                           AS tier FROM lp)
            SELECT t.tier, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CAST(floor(lp.mean_logprob * 1000000 + 0.5)
                            AS BIGINT)) AS BIGINT) AS sum_logprob_micro,
                   min(lp.n_tokens) AS min_tokens,
                   max(lp.n_tokens) AS max_tokens
            FROM t JOIN lp USING (doc_id) GROUP BY t.tier
        """,
        "bigram_logprob": _sql_bigram_scored()
        + " SELECT doc_id, n_tokens, mean_logprob FROM scored",
        "perplexity_by_language": _sql_bigram_scored() + f"""
            , l AS ({lang_sql})
            SELECT l.pred_lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   {_rnd("sum(CAST(round(mean_logprob * 1e6) AS BIGINT))"
                          " / count(*) / 1e6", 6)} AS mean_logprob
            FROM scored JOIN l USING (doc_id)
            GROUP BY l.pred_lang
        """,
        "lm_quality_select": _sql_bigram_scored() + """
            , t AS (SELECT doc_id, n_tokens, mean_logprob,
                           CAST(ntile(4) OVER (
                               ORDER BY mean_logprob, doc_id) AS BIGINT)
                           AS tier
                    FROM scored)
            SELECT doc_id, n_tokens, mean_logprob, tier
            FROM t WHERE tier > 1
        """,
        "kg_triangles": f"""
            WITH raw AS (SELECT DISTINCT subject, object FROM {Q.rpd('kg_tri_raw')}
                         WHERE object_datatype = 'uri' AND subject <> object),
            e AS (SELECT DISTINCT least(subject, object) AS a,
                         greatest(subject, object) AS b FROM raw)
            SELECT CAST(count(*) AS BIGINT) AS n_triangles
            FROM e e1 JOIN e e2 ON e1.b = e2.a
                      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        """,
        "kg_jaccard_links": __import__(
            "octoray.stages.graphalgo",
            fromlist=["sql_neighborhood_similarity"]
        ).sql_neighborhood_similarity(
            Q.rpd('kg_jl_raw'), k=100, max_center_degree=512),
        "kg_communities": __import__(
            "octoray.stages.graphalgo",
            fromlist=["sql_label_propagation"]
        ).sql_label_propagation(Q.rpd('kg_lp_raw'), n_rounds=3),
        "kg_adjacency": __import__(
            "octoray.stages.graphalgo",
            fromlist=["sql_adjacency_export"]
        ).sql_adjacency_export(Q.rpd('kg_adj_raw')),
        "kg_validate": __import__(
            "octoray.stages.rules",
            fromlist=["sql_validate_constraints"]
        ).sql_validate_constraints(Q.rpd('kg_val_raw'), _KG_CONSTRAINTS),
        "kg_incremental": f"""
            WITH log AS (SELECT * FROM {Q.rp('ingest_log')}),
            led AS (SELECT url, max(run) AS r FROM {Q.rp('ingest_ledger')}
                    GROUP BY url),
            cur AS (SELECT l.subject, l.predicate, l.object, l.object_datatype
                    FROM log l JOIN led ON l.src = led.url AND l.run = led.r)
            SELECT DISTINCT subject, predicate, object, object_datatype FROM cur
        """,
        "kg_incremental_dist": f"""
            WITH log AS (SELECT * FROM {Q.rp('ingest_log_dist')}),
            led AS (SELECT url, max(run) AS r FROM {Q.rp('ingest_ledger_dist')}
                    GROUP BY url),
            cur AS (SELECT l.subject, l.predicate, l.object, l.object_datatype
                    FROM log l JOIN led ON l.src = led.url AND l.run = led.r)
            SELECT DISTINCT subject, predicate, object, object_datatype FROM cur
        """,
        "warc_roundtrip": f"""
            SELECT url,
                   epoch_us(date_trunc('second', warc_ts)) AS warc_ts_us,
                   CAST(octet_length(html) AS BIGINT) AS n_bytes,
                   md5(decode(html)) AS payload_md5
            FROM {Q.rpd('warc_pages')}
        """,
        "trim_spans": r"""
            WITH l AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ts
                       FROM documents),
            g AS (SELECT doc_id, u.p AS pos,
                         md5(array_to_string(ts[u.p + 1:u.p + 8], ' ')) AS gram
                  FROM l, LATERAL unnest(generate_series(0, len(ts) - 8)) AS u(p)
                  WHERE len(ts) >= 8),
            r AS (SELECT doc_id, pos, row_number() OVER
                    (PARTITION BY gram ORDER BY doc_id, pos) AS rn FROM g),
            marks AS (SELECT doc_id, pos FROM r WHERE rn > 1),
            cover AS (SELECT DISTINCT m.doc_id, c.tp
                      FROM marks m JOIN l USING (doc_id),
                           LATERAL unnest(generate_series(
                               m.pos, least(m.pos + 8, len(l.ts)) - 1)) AS c(tp)),
            tok AS (SELECT doc_id, u.i AS tp, ts[u.i + 1] AS w
                    FROM l, LATERAL unnest(generate_series(0, len(ts) - 1)) AS u(i)),
            kept AS (SELECT t.doc_id, t.tp, t.w
                     FROM tok t LEFT JOIN cover c
                       ON t.doc_id = c.doc_id AND t.tp = c.tp
                     WHERE c.tp IS NULL)
            SELECT l.doc_id, CAST(len(l.ts) AS BIGINT) AS n_tokens,
                   CAST(len(l.ts) - count(k.tp) AS BIGINT) AS n_removed,
                   coalesce(string_agg(k.w, ' ' ORDER BY k.tp), '') AS text_trimmed
            FROM l LEFT JOIN kept k USING (doc_id)
            GROUP BY l.doc_id, len(l.ts)
        """,
        "latest_per_url": f"""
            WITH c AS (SELECT url, epoch_us(warc_ts) AS ts, md5(text) AS m
                       FROM {Q.rpd('crawl_latest_raw')}),
            r AS (SELECT url, ts, m, row_number() OVER
                    (PARTITION BY url ORDER BY ts DESC, m DESC) AS rn FROM c)
            SELECT url, ts AS warc_ts_us, m AS content_md5 FROM r WHERE rn = 1
        """,
        "crawl_delta": f"""
            WITH c AS (SELECT url, CAST(snapshot AS BIGINT) AS s, md5(text) AS m
                       FROM {Q.rpd('crawl_delta_raw')}
                       WHERE snapshot IN (0, {_CRAWL_SNAPS - 1})),
            -- max-per-side collapse mirrors the engine's decide():
            -- duplicate (url, snapshot) fetches fold to one row per
            -- side, so engine and oracle agree on ANY input, not just
            -- the unique-fetch synthetic one
            a AS (SELECT url, max(m) AS m FROM c WHERE s = 0 GROUP BY url),
            b AS (SELECT url, max(m) AS m FROM c WHERE s = {_CRAWL_SNAPS - 1}
                  GROUP BY url)
            SELECT coalesce(a.url, b.url) AS url,
                   CASE WHEN a.url IS NULL THEN 'added'
                        WHEN b.url IS NULL THEN 'removed'
                        ELSE 'changed' END AS status
            FROM a FULL JOIN b ON a.url = b.url
            WHERE a.url IS NULL OR b.url IS NULL OR a.m <> b.m
        """,
        "url_canon": _url_canon_sql(Q.rp('messy_urls')),
        "url_filter": _url_filter_sql(Q.rp('filter_urls_in')),
        "domain_stats": f"""
            SELECT regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1) AS domain,
                   count(*) AS n_fetches,
                   count(DISTINCT url) AS n_urls,
                   CAST(sum(length(text)) AS BIGINT) AS total_chars
            FROM {Q.rpd('crawl_domain_raw')}
            GROUP BY 1
        """,
        "crawl_schedule": __import__(
            "octoray.stages.crawl", fromlist=["sql_crawl_schedule"]
        ).sql_crawl_schedule(Q.rpd("crawl_sched_raw")),
        "boilerplate_lines": __import__(
            "octoray.stages.crawl", fromlist=["sql_boilerplate_lines"]
        ).sql_boilerplate_lines(Q.rpd("crawl_boiler_raw"), min_urls=3),
        "strip_boilerplate": __import__(
            "octoray.stages.crawl", fromlist=["sql_strip_boilerplate"]
        ).sql_strip_boilerplate(Q.rpd("crawl_strip_raw"), min_urls=3),
        "recrawl_priority": __import__(
            "octoray.stages.crawl", fromlist=["sql_recrawl_priority"]
        ).sql_recrawl_priority(Q.rpd("crawl_recrawl_raw")),
        "kg_ranges": __import__(
            "octoray.stages.profile", fromlist=["sql_predicate_ranges"]
        ).sql_predicate_ranges(Q.rpd("kg_ranges_raw")),
        "kg_functionality": __import__(
            "octoray.stages.profile",
            fromlist=["sql_predicate_functionality"]
        ).sql_predicate_functionality(Q.rpd("kg_func_raw")),
        "kg_symmetry": __import__(
            "octoray.stages.profile", fromlist=["sql_predicate_symmetry"]
        ).sql_predicate_symmetry(Q.rpd("kg_sym_raw")),
        "crawl_coverage": f"""
            SELECT regexp_extract(url,
                     '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1) AS domain,
                   CAST(snapshot AS BIGINT) AS snapshot,
                   count(DISTINCT url) AS n_urls
            FROM {Q.rpd('crawl_cov_raw')} GROUP BY 1, 2
        """,
        "per_domain_cap": f"""
            WITH d AS (SELECT DISTINCT
                         regexp_extract(url,
                           '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1) AS domain,
                         url
                       FROM {Q.rpd('crawl_cap_raw')}),
            r AS (SELECT domain, url,
                         row_number() OVER (PARTITION BY domain
                                            ORDER BY url) AS rn FROM d)
            SELECT domain, url FROM r WHERE rn <= 5
        """,
        "quality_classifier": __import__(
            "octoray.stages.qualmodel", fromlist=["sql_quality_classifier"]
        ).sql_quality_classifier(tok_expr=tok, stop_pattern=en),
        "quality_scores": f"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   {tok} AS n_tokens,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
                       / greatest(CAST(length(text) AS DOUBLE), 1.0) AS alpha_ratio,
                   CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                       / greatest(CAST(length(text) AS DOUBLE), 1.0) AS digit_ratio,
                   CAST(len(regexp_extract_all(text, '[A-Z]')) AS DOUBLE)
                       / greatest(CAST(length(text) AS DOUBLE), 1.0) AS upper_ratio,
                   CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                       / greatest(CAST({tok} AS DOUBLE), 1.0) AS punct_per_token,
                   CAST(len(regexp_extract_all(text, '{en}')) AS DOUBLE)
                       / greatest(CAST({tok} AS DOUBLE), 1.0) AS stop_per_token
            FROM documents
        """,
        "lang_id": lang_sql,
        "lang_quality_crosstab": f"""
            WITH l AS ({lang_sql}),
            t AS (SELECT doc_id,
                         CAST(ntile(4) OVER (ORDER BY n_chars, doc_id)
                              AS BIGINT) AS tier FROM documents)
            SELECT l.pred_lang, t.tier, count(*) AS n_docs
            FROM l JOIN t USING (doc_id) GROUP BY 1, 2
        """,
        "fingerprints": f"""
            SELECT doc_id, md5({_NORM}) AS md5 FROM documents
        """,
        "winnow_fingerprints": __import__(
            "octoray.stages.textops", fromlist=["sql_winnow_fingerprints"]
        ).sql_winnow_fingerprints(k=8, w=4),
        "repetition_stats": r"""
            WITH base AS (
              SELECT doc_id,
                     regexp_extract_all(text, '\S+') AS t,
                     list_filter(string_split(text, chr(10)),
                                 l -> trim(l) <> '') AS lines
              FROM documents),
            big AS (
              SELECT doc_id, len(t) AS n_tokens, len(lines) AS n_lines,
                     CASE WHEN len(lines) = 0 THEN 0.0
                          ELSE 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)
                                     / len(lines) END AS dlf_raw,
                     CASE WHEN len(t) < 2 THEN CAST([] AS VARCHAR[])
                          ELSE [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
                     END AS b2,
                     CASE WHEN len(t) < 5 THEN CAST([] AS VARCHAR[])
                          ELSE [array_to_string(t[i:i+4], ' ')
                                for i in range(1, len(t) - 3)]
                     END AS g5
              FROM base),
            b2c AS (SELECT doc_id, max(cnt) AS max2, sum(cnt) AS tot2
                    FROM (SELECT doc_id, bg, count(*) AS cnt
                          FROM (SELECT doc_id, unnest(b2) AS bg FROM big)
                          GROUP BY 1, 2)
                    GROUP BY 1),
            g5c AS (SELECT doc_id, count(*) AS tot5,
                           count(DISTINCT g) AS d5
                    FROM (SELECT doc_id, unnest(g5) AS g FROM big)
                    GROUP BY 1)
            SELECT big.doc_id, n_tokens, n_lines,
                   floor(dlf_raw * 1000000 + 0.5) / 1000000 AS dup_line_frac,
                   CASE WHEN b2c.doc_id IS NULL THEN 0.0
                        ELSE floor(CAST(max2 AS DOUBLE) / tot2 * 1000000 + 0.5)
                             / 1000000 END AS top_bigram_frac,
                   CASE WHEN g5c.doc_id IS NULL THEN 0.0
                        ELSE floor((1.0 - CAST(d5 AS DOUBLE) / tot5) * 1000000
                                   + 0.5) / 1000000 END AS dup_5gram_frac
            FROM big LEFT JOIN b2c ON big.doc_id = b2c.doc_id
                     LEFT JOIN g5c ON big.doc_id = g5c.doc_id
        """,
        "pack_sequences": r"""
            WITH n AS (SELECT doc_id,
                              len(regexp_extract_all(text, '\S+')) AS n_tokens
                       FROM documents),
            c AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                         CAST(sum(n_tokens) OVER (ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tokens
                              AS BIGINT) AS "offset"
                  FROM n)
            SELECT doc_id, n_tokens, "offset",
                   CAST("offset" // 512 AS BIGINT) AS bin
            FROM c
        """,
        "chunk_documents": r"""
            WITH tk AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                        FROM documents),
            c AS (SELECT doc_id, unnest(range(0, len(t), 56)) AS s, t
                  FROM tk WHERE len(t) > 0)
            SELECT doc_id, CAST(s / 56 AS BIGINT) AS chunk_id,
                   array_to_string(t[s + 1 : least(s + 64, len(t))],
                                   ' ') AS chunk_text,
                   CAST(least(s + 64, len(t)) - s AS BIGINT) AS n_tokens
            FROM c
        """,
        "inverted_index": r"""
            WITH tok AS (SELECT DISTINCT doc_id,
                                unnest(regexp_extract_all(text, '\S+')) AS token
                         FROM documents)
            SELECT token, CAST(count(*) AS BIGINT) AS df,
                   string_agg(CAST(doc_id AS VARCHAR), '+'
                              ORDER BY doc_id) AS postings
            FROM tok GROUP BY token HAVING count(*) >= 2
        """,
        "bpe_train": __import__(
            "octoray.stages.bpe", fromlist=["sql_bpe"]
        ).sql_bpe(n_merges=12),
        "bpe_encode": __import__(
            "octoray.stages.bpe", fromlist=["sql_train_apply_bpe"]
        ).sql_train_apply_bpe(n_merges=12),
        "heavy_hitters": r"""
            WITH tok AS (SELECT unnest(regexp_extract_all(text, '\S+'))
                         AS token FROM documents),
            tot AS (SELECT count(*)::DOUBLE AS n FROM tok)
            SELECT token, CAST(count(*) AS BIGINT) AS "count"
            FROM tok, tot GROUP BY token, tot.n
            HAVING count(*) >= greatest(ceil(0.005 * tot.n), 1)
            ORDER BY "count" DESC, token
        """,
        "top_ngrams": r"""
            WITH tk AS (SELECT regexp_extract_all(text, '\S+') AS t
                        FROM documents),
            g AS (SELECT unnest(
                    CASE WHEN len(t) < 2 THEN CAST([] AS VARCHAR[])
                         ELSE [t[i] || ' ' || t[i+1]
                               for i in range(1, len(t))] END) AS gram
                  FROM tk)
            SELECT gram, CAST(count(*) AS BIGINT) AS "count"
            FROM g GROUP BY gram
            ORDER BY "count" DESC, gram LIMIT 100
        """,
        "jsonl_roundtrip": r"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   len(regexp_extract_all(text, '\S+')) AS n_tokens,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe
            FROM read_json_auto('""" + Q.ORACLE_DIR + r"""/docs_jsonl/*.json')
        """,
        "asof_attribution": """
            SELECT p.event_id, p.user_id, p.ts, c.click_id,
                   c.ts AS ts_r
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT event_id AS click_id, user_id, ts
                            FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "range_click_counts": """
            SELECT p.event_id, p.user_id, p.ts,
                   CAST(count(c.ts) AS BIGINT) AS n_clicks_30m
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'purchase') p
            LEFT JOIN (SELECT user_id, ts FROM events
                       WHERE event_type = 'click') c
              ON p.user_id = c.user_id
             AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
            GROUP BY 1, 2, 3
        """,
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) / 4294967296.0
                  < CASE lang WHEN 'en' THEN 1.0 WHEN 'es' THEN 0.5
                              WHEN 'fr' THEN 0.25 WHEN 'de' THEN 0.1
                              ELSE 0.05 END
        """,
        "length_quantiles": """
            WITH c AS (SELECT lang, n_chars, count(*) AS n
                       FROM documents GROUP BY 1, 2),
            w AS (SELECT lang, n_chars,
                         sum(n) OVER (PARTITION BY lang
                                      ORDER BY n_chars) AS cum,
                         sum(n) OVER (PARTITION BY lang) AS tot
                  FROM c)
            SELECT lang,
              min(n_chars) FILTER (WHERE cum >= ceil(0.50 * tot)) AS p50,
              min(n_chars) FILTER (WHERE cum >= ceil(0.90 * tot)) AS p90,
              min(n_chars) FILTER (WHERE cum >= ceil(0.99 * tot)) AS p99
            FROM w GROUP BY lang
        """,
        "tfidf_keywords": r"""
            WITH tk AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                        FROM documents),
            tok AS (SELECT doc_id, unnest(t) AS token FROM tk),
            tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
            dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
            nn AS (SELECT count(*) AS n FROM documents),
            sc AS (SELECT doc_id, tf.token,
                          tf.tf * ln(CAST(nn.n AS DOUBLE) / dfq.df) AS s
                   FROM tf CROSS JOIN nn JOIN dfq ON tf.token = dfq.token),
            r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                               ORDER BY s DESC, token) AS rn
                  FROM sc)
            SELECT doc_id, token, floor(s * 1000000 + 0.5) / 1000000 AS tfidf
            FROM r WHERE rn <= 3
        """,
        "decontaminate": r"""
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(text, '\S+') AS t
              FROM documents),
            grams AS (
              SELECT doc_id,
                     CASE WHEN len(t) < 3 THEN CAST([] AS VARCHAR[])
                          ELSE list_distinct([array_to_string(t[i:i+2], ' ')
                                              for i in range(1, len(t) - 1)])
                     END AS g
              FROM toks),
            bset AS (SELECT DISTINCT unnest(g) AS gram FROM grams
                     WHERE doc_id % 20 = 0),
            hits AS (
              SELECT d.doc_id, count(*) AS n_hits
              FROM (SELECT doc_id, unnest(g) AS gram FROM grams
                    WHERE doc_id % 20 <> 0) d
              JOIN bset USING (gram) GROUP BY 1)
            SELECT g.doc_id, CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
                   coalesce(n_hits, 0) > 0 AS contaminated
            FROM (SELECT doc_id FROM grams WHERE doc_id % 20 <> 0) g
            LEFT JOIN hits ON g.doc_id = hits.doc_id
        """,
        "train_val_split": """
            SELECT doc_id,
                   CASE WHEN CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                             AS UBIGINT) / 4294967296.0 < 0.1
                        THEN 'val' ELSE 'train' END AS split
            FROM documents
        """,
        "exact_dups": f"""
            SELECT md5({_NORM}) AS md5, min(doc_id) AS rep_id, count(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "dup_multiplicity": f"""
            SELECT n_copies, count(*) AS n_clusters FROM (
              SELECT count(*) AS n_copies FROM documents
              GROUP BY md5({_NORM})) GROUP BY n_copies
        """,
        "dedup_docs_kept": f"""
            WITH f AS (SELECT doc_id, md5({_NORM}) AS md5 FROM documents)
            SELECT md5, doc_id FROM f
            QUALIFY row_number() OVER (PARTITION BY md5 ORDER BY doc_id) = 1
        """,
        "jaccard_pairs": jaccard_sql,
        "containment_pairs": f"""
            SELECT id_a, id_b, n_common, n_a, n_b,
                   containment_a, containment_b
            FROM (SELECT *,
                    {_rnd("CAST(n_common AS DOUBLE) / CAST(n_a AS DOUBLE)", 6)}
                      AS containment_a,
                    {_rnd("CAST(n_common AS DOUBLE) / CAST(n_b AS DOUBLE)", 6)}
                      AS containment_b
                  FROM ({jaccard_sql}))
            WHERE containment_a >= 0.5 OR containment_b >= 0.5
        """,  "jaccard_pairs": f"""
            WITH norm AS (
              SELECT doc_id,
                     list_filter(string_split({_NORM}, ' '), t -> t <> '') AS toks
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id, unnest(
                  CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                       WHEN len(toks) < {_JACCARD_K} THEN [array_to_string(toks, ' ')]
                       ELSE [array_to_string(toks[i:i+{_JACCARD_K - 1}], ' ')
                             for i in range(1, len(toks) - {_JACCARD_K - 2})]
                  END) AS shingle
                FROM norm)),
            cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
            -- identical stop-shingle cap to jaccard_pairs(max_df):
            -- high-df shingles are excluded from PAIR GENERATION only;
            -- the per-doc denominators above stay exact
            live AS (SELECT shingle FROM sh GROUP BY 1
                     HAVING count(*) <= {_JACCARD_MAXDF}),
            shk AS (SELECT sh.* FROM sh JOIN live USING (shingle)),
            pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
                   FROM shk a JOIN shk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
            SELECT id_a, id_b, n_common, ca.n_sh AS n_a, cb.n_sh AS n_b,
                   {_rnd("CAST(n_common AS DOUBLE) / (CAST(ca.n_sh AS DOUBLE) + CAST(cb.n_sh AS DOUBLE) - CAST(n_common AS DOUBLE))", 6)} AS jaccard
            FROM pr JOIN cnt ca ON pr.id_a = ca.doc_id
                    JOIN cnt cb ON pr.id_b = cb.doc_id
        """,
        "centroid_drift": __import__(
            "octoray.stages.similarity", fromlist=["sql_centroid_drift"]
        ).sql_centroid_drift("embeddings"),
        "centroid_exemplars": __import__(
            "octoray.stages.similarity",
            fromlist=["sql_centroid_exemplars"]
        ).sql_centroid_exemplars("embeddings", k=3),
        "label_noise": __import__(
            "octoray.stages.similarity", fromlist=["sql_label_noise"]
        ).sql_label_noise("embeddings"),
        "knn_brute": f"""
            WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id IN ({knn_ids})),
            scored AS (
              SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS s
              FROM embeddings e, q WHERE e.vec_id <> q.qid),
            ranked AS (SELECT query_id, neighbor_id, s,
                       row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rn
                       FROM scored)
            SELECT query_id, neighbor_id, {_rnd('s', 6)} AS score
            FROM ranked WHERE rn <= {_KNN_K}
        """,
        # ------------------------------------------------------------
        # KG / prep / report / media twins (octoray/oracles.py).  Each
        # reads the parquet artifact its query callable materialized
        # under /tmp/octoray_oracle; the per-builder docstrings state
        # the verification boundary.  For the prep emitters the
        # boundary is the raw pre-canonical triple stream (recognizer
        # emission itself is not SQL-expressible; covered by ~160
        # ported unit vectors + the P/R gate), matching kg_build.
        # ------------------------------------------------------------
        "kg_build": Q.sql_kg_build(Q.rpd("kg_build_raw")),
        "kg_build_cold": Q.sql_kg_build(Q.rpd("kg_build_cold_raw")),
        "kg_subject_degree": Q.sql_subject_degree(Q.rpd("kg_degree_raw")),
        "kg_strain_pivot": Q.sql_pivot(Q.rpd("kg_pivot_raw"), _PIVOT_SPEC),
        "kg_rules_expanded": Q.sql_rules_expanded(Q.rpd("kg_rules_raw")),
        "kg_monthly_report": Q.sql_monthly_report(Q.rpd("kg_monthly_raw")),
        "kg_tagged_report": Q.sql_tagged_report(
            Q.rpd("kg_tagged_raw"), Q.rp("kg_tagged_ids")),
        "kg_pull": Q.sql_pull(Q.rpd("kg_pull_raw")),
        "kg_construct": Q.sql_construct_dated_subtype(Q.rpd("kg_construct_raw")),
        "kg_optional": Q.sql_optional_bindings(Q.rpd("kg_optional_raw")),
        "kg_path": Q.sql_path_closure(Q.rp("kg_path_edges")),
        "kg_path_star": Q.sql_path_star(Q.rp("kg_path_star_edges")),
        "kg_delete": Q.sql_pull(Q.rpd("kg_delete_raw"), exclude=["f:genbank_id"]),
        "kg_delete_bound": f"""
            WITH raw AS (SELECT DISTINCT subject, predicate, object,
                                object_datatype
                         FROM {Q.rpd("kg_delete_bound_raw")}),
            swine AS (SELECT DISTINCT subject FROM raw
                      WHERE predicate = 'f:host' AND object = 'swine')
            SELECT subject, predicate, object, object_datatype FROM raw
            WHERE NOT (predicate = 'f:subtype'
                       AND subject IN (SELECT subject FROM swine))
        """,
        "kg_void": __import__(
            "octoray.stages.profile", fromlist=["sql_void_stats"]
        ).sql_void_stats(Q.rpd("kg_void_raw")),
        "kg_delta": __import__(
            "octoray.stages.canon", fromlist=["sql_triple_delta"]
        ).sql_triple_delta(Q.rpd("kg_delta_old"), Q.rpd("kg_delta_new")),
        "kg_transe": _GA.sql_transe_export(Q.rpd("kg_transe_raw")),
        "kg_comention": _GA.sql_comention_graph(
            Q.rpd("kg_comention_raw"), min_pages=1),
        "kg_clustering": _GA.sql_clustering(
            "(SELECT * FROM (" + Q.sql_rules_expanded(Q.rpd("kg_clust_raw"))
            + ") UNION ALL SELECT loc AS subject,"
            " 'f:locatedIn' AS predicate, ancestor AS object,"
            " 'uri' AS object_datatype FROM (VALUES "
            + Q._geo_closure_values() + ") t(loc, ancestor))"),
        "kg_negatives": _GA.sql_link_negatives(
            "SELECT subject AS src, object AS dst FROM (SELECT DISTINCT"
            " subject, predicate, object, object_datatype FROM "
            + Q.rpd("kg_neg_raw") + ") WHERE object_datatype = 'uri'",
            k=2),
        "kg_pagerank": Q.sql_pagerank(Q.rpd("kg_pagerank_raw"),
                                      damping=0.85, n_iters=5),
        "kg_kcore": Q.sql_kcore(Q.rpd("kg_kcore_raw"), k=2, n_iters=16),
        "kg_walks": __import__(
            "octoray.stages.graphalgo", fromlist=["sql_random_walks"]
        ).sql_random_walks(Q.rpd("kg_walks_raw"), n_walks=2, walk_len=3,
                           seed=1),
        "kg_skipgrams": __import__(
            "octoray.stages.graphalgo", fromlist=["sql_walk_skipgrams"]
        ).sql_walk_skipgrams(Q.rpd("kg_sg_walks"), window=2),
        "kg_hops": f"""
            WITH RECURSIVE raw AS (
                SELECT DISTINCT subject AS src, object AS dst
                FROM {Q.rpd('kg_hops_raw')}
                WHERE object_datatype = 'uri' AND subject <> object),
            e AS (SELECT src, dst FROM raw
                  UNION SELECT dst, src FROM raw),
            walk(node, d) AS (
                SELECT 'world:CAN' AS node, 0 AS d
                UNION
                SELECT e.dst, w.d + 1
                FROM walk w JOIN e ON e.src = w.node
                WHERE w.d < 4)
            SELECT node, CAST(min(d) AS BIGINT) AS hops
            FROM walk GROUP BY node
        """,
        # entity order: &lt;/&gt; first, &amp; LAST — the inverse of
        # html.escape(quote=False); '&amp;lt;' round-trips correctly
        "extract_links": _WG.sql_extract_links(Q.rpd("link_pages")),
        "anchor_text": _WG.sql_anchor_summary(
            _WG.sql_extract_links(Q.rpd("anchor_pages"))),
        "web_linkrank": Q.sql_pagerank_edges(
            _WG.sql_internal_edges(
                _WG.sql_extract_links(Q.rpd("linkrank_pages"))),
            damping=0.85, n_iters=5),
        "web_harmonic": _GA.sql_harmonic(
            _WG.sql_internal_edges(
                _WG.sql_extract_links(Q.rpd("harmonic_pages"))),
            n_sources=12, max_hops=4),
        "web_hits": _GA.sql_hits_edges(
            _WG.sql_internal_edges(
                _WG.sql_extract_links(Q.rpd("hits_pages"))),
            n_iters=5),
        "web_frontier": _WG.sql_frontier_urls(
            _WG.sql_extract_links(Q.rpd("frontier_pages")),
            f"SELECT url FROM {Q.rpd('frontier_pages')}"),
        "web_degree_dist": _WG.sql_degree_histogram(
            _WG.sql_extract_links(Q.rpd("degdist_pages"))),
        "web_reciprocity": _WG.sql_reciprocity(
            _WG.sql_extract_links(Q.rpd("recip_pages"))),
        "web_bowtie": _WG.sql_bowtie(
            _WG.sql_extract_links(Q.rpd("bowtie_pages"))),
        "host_graph": _WG.sql_host_graph(
            _WG.sql_extract_links(Q.rpd("hostg_pages"))),
        "anchor_names": _WG.sql_anchor_names(
            _WG.sql_extract_links(Q.rpd("aname_pages")), k=1),
        "web_diameter": _GA.sql_distance_histogram(
            _WG.sql_internal_edges(
                _WG.sql_extract_links(Q.rpd("diam_pages"))),
            n_sources=12, max_hops=4),
        "web_salsa": _WG.sql_salsa(
            _WG.sql_extract_links(Q.rpd("salsa_pages")), max_out=64),
        "web_salsa_hubs": _WG.sql_salsa_hubs(
            _WG.sql_extract_links(Q.rpd("salsahub_pages")), max_in=64),
        "web_katz": _GA.sql_katz_edges(
            _WG.sql_internal_edges(
                _WG.sql_extract_links(Q.rpd("katz_pages"))),
            beta=0.05, n_iters=4),
        "web_assortativity": _GA.sql_assortativity(
            _WG.sql_internal_edges(
                _WG.sql_extract_links(Q.rpd("assort_pages")))),
        "web_cocitation": _WG.sql_cocitation(
            _WG.sql_extract_links(Q.rpd("cocit_pages")), k=100,
            max_out=64),
        "web_trustrank": _GA.sql_trustrank_edges(
            _WG.sql_internal_edges(
                _WG.sql_extract_links(Q.rpd("trust_pages"))),
            damping=0.85, n_iters=5, n_seeds=8),
        "web_component_sizes": """
            SELECT component_size, count(*) AS n_components FROM (
              SELECT component, count(*) AS component_size FROM (""" +
        Q.sql_dup_components(
            "(SELECT src AS id_a, dst AS id_b FROM (" +
            _WG.sql_internal_edges(
                _WG.sql_extract_links(Q.rpd("wccsize_pages"))) + "))") +
        """) GROUP BY component) GROUP BY component_size""",
        "kg_provenance": f"""
            SELECT subject, count(DISTINCT src) AS n_pages,
                   min(src) AS first_page
            FROM {Q.rpd('kg_prov_raw')} GROUP BY subject
        """,
        "web_components": "SELECT id AS node, component FROM (" +
        Q.sql_dup_components(
            "(SELECT src AS id_a, dst AS id_b FROM (" +
            _WG.sql_internal_edges(
                _WG.sql_extract_links(Q.rpd("wcc_pages"))) + "))") + ")",
        "extract_text": ("""
            SELECT url, replace(replace(replace(
                     coalesce(regexp_extract(decode(html),
                              '<article>(.*?)</article>', 1), ''),
                     '&lt;', '<'), '&gt;', '>'), '&amp;', '&') AS text
            FROM """ + Q.rpd("extract_pages")),
        "deidentify_pages": Q.sql_redact(Q.rpd("deid_pages")),
        "corpus_release": Q.sql_corpus_release(),
        "line_dedup_pages": Q.sql_line_dedup(Q.rpd("linededup_pages")),
        "prep_blast": Q.sql_prep_blast(Q.rp("prep_blast_input")),
        "prep_fasta": Q.sql_prep_triples(Q.rpd("prep_fasta_raw")),
        "prep_unpublished": Q.sql_prep_triples(Q.rpd("prep_unpublished_raw")),
        "prep_table": Q.sql_prep_triples(Q.rpd("prep_table_raw")),
        "prep_genbank": Q.sql_prep_triples(Q.rpd("prep_genbank_raw")),
        "prep_gisaid": Q.sql_prep_triples(Q.rpd("prep_gisaid_raw")),
        "prep_ivr": Q.sql_prep_triples(Q.rpd("prep_ivr_raw")),
        "prep_ird": Q.sql_prep_triples(Q.rpd("prep_ird_raw")),
        "report_constellations": Q.sql_constellations(Q.rp("constellations_input")),
        "report_subtypes": Q.sql_subtypes(Q.rp("subtypes_input")),
        "report_masterlist": Q.sql_masterlist(Q.rp("masterlist_input")),
        "classify_clades": Q.sql_classify(
            Q.rp("classify_profiles"), Q.rp("classify_panel")),
        "motifs": Q.sql_motifs(Q.rp("motifs_aa"), "H1"),
        "fingerprints_full": Q.sql_fingerprints_full(_NORM),
        "minhash_lsh_pairs": Q.sql_minhash_pairs(
            Q.rpd("minhash_sigs"), n_perm=64, bands=16, threshold=0.5),
        "simhash_pairs": Q.sql_simhash_pairs(Q.rpd("simhash_sigs"), max_hamming=3),
        "dup_components": Q.sql_dup_components(Q.rpd("dup_pairs")),
        "near_dup_kept": Q.sql_near_dup_kept(Q.rpd("near_dup_pairs")),
        "semantic_dup_kept": Q.sql_near_dup_kept(
            Q.rpd("semantic_dup_pairs"), table="embeddings", id_col="vec_id"),
        "kmeans_clusters": Q.sql_kmeans("embeddings", k=8, n_iters=3),
        "pq_codes": Q.sql_pq_codes("embeddings", m=4, k=8, n_iters=3,
                                   dim=64),
        "pq_search": Q.sql_pq_adc("embeddings", _RRF_QID, m=4, k=8,
                                  n_iters=3, dim=64, k_out=10),
        "knn_lsh": Q.sql_knn_lsh(
            Q.rpd("knn_lsh_buckets"), _KNN_IDS, k=_KNN_K, n_tables=24),
        "knn_ivf": Q.sql_knn_ivf(
            Q.rpd("ivf_assign"), Q.rp("ivf_probes"), _KNN_IDS, k=_KNN_K),
        "knn_ivf_indexed": Q.sql_knn_ivf(
            Q.rp("ivf_assign_idx"), Q.rp("ivf_probes_idx"), _KNN_IDS, k=_KNN_K),
        "knn_ivf_retrain": Q.sql_knn_ivf(
            Q.rp("ivf_assign_rt"), Q.rp("ivf_probes_rt"), _KNN_IDS, k=_KNN_K),
        "knn_ivf_increment": Q.sql_knn_ivf(
            Q.rp("ivf_assign_inc"), Q.rp("ivf_probes_inc"), _KNN_IDS, k=_KNN_K),
        "cosine_dup_pairs": Q.sql_cosine_dup(
            Q.rpd("cosine_buckets"), threshold=0.4, n_tables=8),
        "media_image_features": Q.sql_media_image(Q.rpd("media_pixels")),
        "media_audio_features": Q.sql_media_audio(Q.rpd("media_pcm")),
        "media_frame_sample": Q.sql_media_frames(Q.rpd("media_meta"), every=2),
        "media_knn": Q.sql_media_knn(Q.rpd("media_embeddings"), [0, 1, 2], k=5),
        "media_ahash": __import__(
            "octoray.stages.multimodal", fromlist=["sql_image_ahash"]
        ).sql_image_ahash(Q.rpd("media_ahash_pixels"), grid=8),
        "media_dedup": __import__(
            "octoray.stages.multimodal", fromlist=["sql_image_dedup"]
        ).sql_image_dedup(Q.rpd("media_dedup_pixels"), grid=8),
        "media_audio_fp": __import__(
            "octoray.stages.multimodal", fromlist=["sql_audio_fingerprint"]
        ).sql_audio_fingerprint(Q.rpd("media_afp_pcm"), bands=8),
    }
