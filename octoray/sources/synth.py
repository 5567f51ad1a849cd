"""Deterministic synthetic inputs for the prep/report pipelines.

Everything derives from the same splitmix64 streams as the webtext
synthesizer (sources/webtext.py) so results are identical regardless
of batch boundaries or parallelism — no global RNG state, no wall
clock.  These feed the driver-contract queries and the bench for the
operator families whose real inputs (FASTA files, octoFLU tables,
BLAST output) can't be shipped into the sandbox.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa

from octoray.sources.webtext import GLOBAL_CLADES, SUBTYPES, _streams, page_record

_SEGMENTS = ["PB2", "PB1", "PA", "NP", "M", "NS", "HA", "NA"]
_CLADES = ["pdm", "TRIG", "LAIV", "humanSeasonal", "classicalSwine", "avian", "pdm-like"]
_ACGT = np.array(list("ACGT"))


def _record_fields(pid: int, seed: int) -> List[str]:
    _, fields = page_record(pid, seed)
    return fields


def synth_fasta_text(n: int, seed: int = 42) -> str:
    """FASTA whose headers reuse the webtext record grammar
    (strain|subtype|date|genbank) and whose sequences are
    deterministic 60-mers."""
    entries: List[str] = []
    for pid in range(n):
        fields = _record_fields(pid, seed)
        if len(fields) < 6:
            continue
        strain, subtype, date, _host, _loc, gb = fields[:6]
        draws = _streams(np.arange(60, dtype=np.uint64) + np.uint64(pid * 61),
                         seed ^ 0xFA57A, 1)[:, 0]
        seq = "".join(_ACGT[(draws & np.uint64(3)).astype(int)])
        entries.append(f">{strain}|{subtype}|{date}|{gb}\n{seq}")
    return "\n".join(entries) + "\n"


def synth_tsv_text(n: int, seed: int = 42) -> str:
    """TSV with (strain, subtype, date, host, location, genbank)
    columns from the webtext record grammar."""
    lines = ["strain\tsubtype\tdate\thost\tlocation\tgenbank"]
    for pid in range(n):
        fields = _record_fields(pid, seed)
        if len(fields) < 6:
            continue
        lines.append("\t".join(fields[:6]))
    return "\n".join(lines) + "\n"


def synth_blast_table(n: int, seed: int = 42) -> pa.Table:
    """BLAST outfmt-6 rows (12 string columns, recipes.py:29-43)."""
    r = _streams(np.arange(n, dtype=np.uint64), seed ^ 0xB1A57, 12)
    cols = {
        "qseqid": [f"q{int(x) % 500}" for x in r[:, 0]],
        "sseqid": [f"s{int(x) % 200}" for x in r[:, 1]],
        "pident": [f"{80 + (int(x) % 2000) / 100.0}" for x in r[:, 2]],
        "length": [str(100 + int(x) % 1600) for x in r[:, 3]],
        "mismatch": [str(int(x) % 30) for x in r[:, 4]],
        "gapopen": [str(int(x) % 5) for x in r[:, 5]],
        "qstart": [str(1 + int(x) % 10) for x in r[:, 6]],
        "qend": [str(900 + int(x) % 100) for x in r[:, 7]],
        "sstart": [str(1 + int(x) % 10) for x in r[:, 8]],
        "send": [str(900 + int(x) % 100) for x in r[:, 9]],
        "evalue": [f"1e-{int(x) % 180}" for x in r[:, 10]],
        "bitscore": [f"{100 + (int(x) % 9000) / 10.0}" for x in r[:, 11]],
    }
    return pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})


def synth_gisaid_table(n: int, seed: int = 42) -> pa.Table:
    """GISAID-shaped metadata rows (recipes.py:154-234 input): fixed
    identity columns + per-segment 'X Segment_Id'/'X INSDC_Upload'
    comma-lists with the ' | garbage' suffixes the recipe strips."""
    segs = ("PB2", "PB1", "PA", "HA", "NP", "NA", "MP", "NS")
    cols: dict = {k: [] for k in
                  ["Isolate_Id", "Isolate_Name", "Host", "Subtype", "Lineage",
                   "Location", "Collection_Date", "Submission_Date"]}
    for s in segs:
        cols[f"{s} Segment_Id"] = []
        cols[f"{s} INSDC_Upload"] = []
    r = _streams(np.arange(n, dtype=np.uint64), seed ^ 0x61541D, 12)
    hosts = ["swine", "human"]
    for i in range(n):
        strain = f"A/swine/Iowa/G{i:05d}/2019"
        cols["Isolate_Id"].append(f"EPI_ISL_{int(r[i, 0]) % 500000}")
        cols["Isolate_Name"].append(
            strain + (" (H1N1)" if r[i, 1] % 2 == 0 else ""))
        cols["Host"].append(hosts[int(r[i, 2]) % 2])
        cols["Subtype"].append(SUBTYPES[int(r[i, 3]) % len(SUBTYPES)])
        cols["Lineage"].append("swl" if r[i, 4] % 2 else "")
        cols["Location"].append("North America / United States / Iowa")
        cols["Collection_Date"].append(f"2019-0{1 + int(r[i, 5]) % 9}-12")
        cols["Submission_Date"].append(f"2020-0{1 + int(r[i, 6]) % 9}-03")
        for j, s in enumerate(segs):
            if r[i, 7] >> np.uint64(j) & np.uint64(1):
                k = 1 + int(r[i, 8] >> np.uint64(j * 4)) % 2
                epis = ",".join(
                    f"EPI{(int(r[i, 9]) + j * 7 + m) % 900000 + 100000} | junk"
                    for m in range(k))
                gbs = ",".join(
                    f"MH{(int(r[i, 10]) + j * 11 + m) % 900000 + 100000}"
                    for m in range(k))
                cols[f"{s} Segment_Id"].append(epis)
                cols[f"{s} INSDC_Upload"].append(gbs)
            else:
                cols[f"{s} Segment_Id"].append(None)
                cols[f"{s} INSDC_Upload"].append(None)
    return pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})


def synth_segment_bindings(n_strains: int, seed: int = 42) -> pa.Table:
    """(strain, segment, clade) rows — constellation-assembly input
    (formatting.py:70-125).  Each strain gets 4-6 internal segments
    with occasional conflicting / fuzzy / unknown clades."""
    strains, segments, clades = [], [], []
    r = _streams(np.arange(n_strains, dtype=np.uint64), seed ^ 0xC0457, 8)
    for i in range(n_strains):
        name = f"A/swine/Iowa/S{i:05d}/2021"
        n_seg = 4 + int(r[i, 0] % 3)
        for j in range(n_seg):
            seg = _SEGMENTS[int(r[i, 1] >> np.uint64(j * 8)) % 6]
            clade = _CLADES[int(r[i, 2] >> np.uint64(j * 8)) % len(_CLADES)]
            strains.append(name)
            segments.append(seg)
            clades.append(clade)
    return pa.table(
        {
            "strain": pa.array(strains, pa.string()),
            "segment": pa.array(segments, pa.string()),
            "clade": pa.array(clades, pa.string()),
        }
    )


def synth_subtype_bindings(n_strains: int, seed: int = 42) -> pa.Table:
    """Rows shaped like subtypes.rq output: (strain_name, isolates,
    segment_subtypes, genbank_subtypes, gisaid_subtypes) with
    '+'-joined value strings (recipes.py:338-387)."""
    r = _streams(np.arange(n_strains, dtype=np.uint64), seed ^ 0x5B7, 8)
    rows = {k: [] for k in
            ["strain_name", "isolates", "segment_subtypes", "genbank_subtypes", "gisaid_subtypes"]}
    for i in range(n_strains):
        name = f"A/swine/Ohio/T{i:05d}/2020"
        n_rows = 1 + int(r[i, 0] % 3)
        for j in range(n_rows):
            rows["strain_name"].append(name)
            rows["isolates"].append(
                f"EPI_ISL_{int(r[i, 1]) % 100000}" if r[i, 2] % 3 == 0 else "")
            seg_sub = ["H1", "H3", "N1", "N2", "PB2"][int(r[i, 3] >> np.uint64(j * 8)) % 5]
            rows["segment_subtypes"].append(seg_sub)
            rows["genbank_subtypes"].append(
                SUBTYPES[int(r[i, 4]) % len(SUBTYPES)] if r[i, 5] % 2 == 0 else "")
            rows["gisaid_subtypes"].append(
                SUBTYPES[int(r[i, 6]) % len(SUBTYPES)] if r[i, 7] % 3 == 0 else "")
    return pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})


def synth_masterlist_bindings(n_barcodes: int, seed: int = 42) -> pa.Table:
    """Rows shaped like masterlist.rq output: one row per (barcode,
    genbank_id, segment) with '+'-joined GROUP_CONCAT columns
    (recipes.py:390-507)."""
    r = _streams(np.arange(n_barcodes, dtype=np.uint64), seed ^ 0x3457A, 10)
    cols = {k: [] for k in
            ["barcode", "genbank_id", "segment", "earliest_date", "states", "strains",
             "subtypes", "segment_subtypes", "us_clades", "gl_clades", "consts"]}
    for i in range(n_barcodes):
        bc = f"A0{int(r[i, 0]) % 10_000_000:07d}"
        n_seg = 2 + int(r[i, 1] % 7)
        for j in range(n_seg):
            seg = _SEGMENTS[j % len(_SEGMENTS)]
            cols["barcode"].append(bc)
            cols["genbank_id"].append(f"MG{(int(r[i, 2]) + j) % 900000 + 100000}")
            cols["segment"].append(seg)
            cols["earliest_date"].append(f"20{10 + int(r[i, 3]) % 14}-0{1 + j % 9}-15")
            cols["states"].append("IA" if r[i, 4] % 2 == 0 else "MN+IA")
            cols["strains"].append(f"A/swine/Iowa/M{i:05d}/2019")
            cols["subtypes"].append(SUBTYPES[int(r[i, 5]) % len(SUBTYPES)])
            cols["segment_subtypes"].append(
                {"HA": "H1", "NA": "N1"}.get(seg, seg) if r[i, 6] % 4 else "H3")
            cols["us_clades"].append(f"1A.{1 + int(r[i, 7]) % 3}")
            cols["gl_clades"].append(GLOBAL_CLADES[int(r[i, 8]) % len(GLOBAL_CLADES)])
            cols["consts"].append("TTTTPP" if r[i, 9] % 3 else "mixed")
    return pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})


def synth_ivr_table(n: int, seed: int = 42) -> pa.Table:
    """IVR 'influenza_na' rows: the reference's fixed 11-column
    positional layout (recipes.py:74-110) — genbank, host, segment
    number, subtype, country, date, length, strain-with-garnish
    (exercises the [ABCD]/... extraction), two skipped columns, and
    genome status.  Headerless in the wild; here one string column per
    position (c0..c10)."""
    from octoray.sources.webtext import COUNTRIES

    rows: List[List[str]] = []
    for pid in range(n):
        fields = _record_fields(pid, seed)
        if len(fields) < 6:
            continue
        strain, subtype, date, host, _loc, gb = fields[:6]
        r = _streams(np.array([pid], dtype=np.uint64), seed ^ 0x1784, 6)[0]
        country = COUNTRIES[int(r[0] % len(COUNTRIES))]
        seg = str(1 + int(r[1] % 8))
        length = str(800 + int(r[2] % 1600))
        status = ["c", "p"][int(r[3] % 2)]
        garnish = f"Influenza A virus ({strain}({subtype}))"
        rows.append([gb, host.upper(), seg, subtype, country, date,
                     length, garnish, "na", "na", status])
    cols = list(zip(*rows)) if rows else [[] for _ in range(11)]
    return pa.table({f"c{i}": pa.array(list(c), pa.string())
                     for i, c in enumerate(cols)})


def synth_ird_table(n: int, seed: int = 42) -> pa.Table:
    """IRD rows: the reference's fixed 12-column positional layout
    (recipes.py:113-151) with '-N/A-' null tokens sprinkled the way
    IRD exports do."""
    from octoray.sources.webtext import COUNTRIES

    NA = "-N/A-"
    rows: List[List[str]] = []
    for pid in range(n):
        fields = _record_fields(pid, seed)
        if len(fields) < 6:
            continue
        strain, subtype, date, host, _loc, gb = fields[:6]
        r = _streams(np.array([pid], dtype=np.uint64), seed ^ 0x18D, 8)[0]
        country = COUNTRIES[int(r[0] % len(COUNTRIES))]
        seg = str(1 + int(r[1] % 8))
        length = str(800 + int(r[2] % 1600))
        season = f"{10 + int(r[3] % 10)}-{11 + int(r[3] % 10)}"
        date_v = NA if int(r[4] % 7) == 0 else date
        sub_v = NA if int(r[5] % 9) == 0 else subtype
        rows.append([seg, "HA", gb, "Yes", length, sub_v, date_v,
                     f"IRD:{host.title()}", country, "na", season, strain])
    cols = list(zip(*rows)) if rows else [[] for _ in range(12)]
    return pa.table({f"c{i}": pa.array(list(c), pa.string())
                     for i, c in enumerate(cols)})


def synth_unpublished_fasta_text(n: int, seed: int = 42) -> str:
    """Unpublished-sequence FASTA (ui.py:931-976 input shape): field 0
    is an IDIOSYNCRATIC identifier that no regular classifier matches
    (the whole point of the forced-role IrregularStrain), optionally
    followed by a collection date and a country, then the sequence."""
    entries: List[str] = []
    countries = ["USA", "CAN", "United States", "MEX"]
    for pid in range(n):
        r = _streams(np.arange(3, dtype=np.uint64) + np.uint64(pid * 7),
                     seed ^ 0x0DD1D5, 1)[:, 0]
        ident = f"lab sample {int(r[0]) % 10_000:04d}"
        fields = [ident]
        if r[1] % 3 != 0:
            fields.append(f"20{10 + int(r[1]) % 15}-{1 + int(r[1]) % 12:02d}-"
                          f"{1 + int(r[1]) % 28:02d}")
        if r[2] % 2 == 0:
            fields.append(countries[int(r[2]) % len(countries)])
        draws = _streams(np.arange(60, dtype=np.uint64) + np.uint64(pid * 61),
                         seed ^ 0x5E0D7, 1)[:, 0]
        seq = "".join(_ACGT[(draws & np.uint64(3)).astype(int)])
        entries.append(">" + "|".join(fields) + "\n" + seq)
    return "\n".join(entries) + "\n"


def entity_mentions_batch(pids: np.ndarray, seed: int = 42) -> pa.Table:
    """Entity-mention table for the resolution family (stages/entity.py).

    Each recorded page contributes its strain name as a mention
    (mention_id = 2*pid); every third record ALSO contributes a novel
    single-character-deletion typo of it (mention_id = 2*pid + 1) —
    the misspelling population the reference's fixed spellcheck
    dictionaries (domain_geography.py) cannot cover.  Deterministic
    per page id, so generation streams inside map_batches at any
    parallelism.
    """
    from octoray.sources.webtext import _build_page, _streams as _st

    ids = np.asarray(pids, dtype=np.uint64)
    page_streams = _st(ids, seed, 16)
    typo_streams = _st(ids, seed ^ 0x7F00D, 2)
    mids: List[int] = []
    names: List[str] = []
    for pid, r, tr in zip(ids.tolist(), page_streams, typo_streams):
        _, fields = _build_page(int(pid), r)
        if not fields:
            continue
        strain = fields[0]
        mids.append(2 * int(pid))
        names.append(strain)
        if tr[0] % 3 == 0:
            cut = int(tr[1] % len(strain))
            mids.append(2 * int(pid) + 1)
            names.append(strain[:cut] + strain[cut + 1 :])
    return pa.table(
        {
            "mention_id": pa.array(mids, pa.int64()),
            "name": pa.array(names, pa.string()),
        }
    )


def entity_mentions_dataset(n: int, seed: int = 42):
    """Streaming Dataset form of ``entity_mentions_batch`` (the same
    range->map_batches shape as webtext.pages_dataset)."""
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=max(1, min(n, 64)))
    return ds.map_batches(
        lambda b: entity_mentions_batch(b["id"], seed=seed),
        batch_format="numpy",
        batch_size=4096,
    )


def sameas_pairs_batch(pids: np.ndarray, seed: int = 42) -> pa.Table:
    """owl:sameAs assertion synthesis for entity.canonicalize_graph:
    for every page whose mention table carries a typo variant (same
    draw stream as entity_mentions_batch), assert

        uri(typo_strain)  owl:sameAs  uri(strain)

    The typo URI sorts lexicographically BELOW the original for
    deletion typos ('%2F' < any letter), so the canonical
    representative is usually the typo — the rewrite genuinely touches
    the graph's strain subjects instead of being a no-op."""
    from octoray.model import make_uri
    from octoray.sources.webtext import _build_page, _streams as _st

    ids = np.asarray(pids, dtype=np.uint64)
    page_streams = _st(ids, seed, 16)
    typo_streams = _st(ids, seed ^ 0x7F00D, 2)
    ia: List[str] = []
    ib: List[str] = []
    for pid, r, tr in zip(ids.tolist(), page_streams, typo_streams):
        _, fields = _build_page(int(pid), r)
        if not fields or tr[0] % 3 != 0:
            continue
        strain = fields[0]
        cut = int(tr[1] % len(strain))
        typo = strain[:cut] + strain[cut + 1 :]
        ia.append(make_uri(typo))
        ib.append(make_uri(strain))
    return pa.table(
        {
            "id_a": pa.array(ia, pa.string()),
            "id_b": pa.array(ib, pa.string()),
        }
    )


def sameas_pairs_dataset(n: int, seed: int = 42):
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=max(1, min(n, 64)))
    return ds.map_batches(
        lambda b: sameas_pairs_batch(b["id"], seed=seed),
        batch_format="numpy",
        batch_size=4096,
    )


def strain_lexicon_dataset(n: int, seed: int = 42):
    """The entity DICTIONARY for link_mentions: every distinct true
    strain name over the first ``n`` pages, entity_id = its minted URI
    (the reference's lexicon notion — domain_flu strain tables — built
    from the same deterministic stream as the pages, so tests and
    oracles share one truth)."""
    import ray.data as rd

    from octoray.model import make_uri
    from octoray.query import distinct_values
    from octoray.sources.webtext import _build_page, _streams as _st

    def batch(b) -> pa.Table:
        ids = np.asarray(b["id"], dtype=np.uint64)
        eids: List[str] = []
        names: List[str] = []
        for pid, r in zip(ids.tolist(), _st(ids, seed, 16)):
            _, fields = _build_page(int(pid), r)
            if not fields:
                continue
            eids.append(make_uri(fields[0]))
            names.append(fields[0])
        return pa.table({
            "entity_id": pa.array(eids, pa.string()),
            "name": pa.array(names, pa.string()),
        })

    ds = rd.range(n, override_num_blocks=max(1, min(n, 64)))
    return distinct_values(
        ds.map_batches(batch, batch_format="numpy", batch_size=4096),
        ["entity_id", "name"],
    )


def synth_foreign_turtle(n: int, seed: int = 42) -> Tuple[str, pa.Table]:
    """Foreign-authored Turtle fixture + its expected triple table —
    the contract vector for the widened grammar (VERDICT r4 #7).

    'Foreign' traits this engine's own sink never produces: foreign
    prefix names for the canonical bases, triple-quoted literals with
    RAW newlines / inner '.'-terminated lines / embedded quotes,
    single-quoted strings, language tags, labelled blank nodes as
    subject AND object, bare numerics.  The expectation table is built
    from the same f-string templates that render the document — no
    parser involvement — so the oracle compare certifies the parser
    against an independent derivation."""
    doc = [
        "# foreign-authored export",
        "@prefix flu: <https://flu-crew.org/term/> .",
        "@prefix ex: <https://flu-crew.org/id/> .",
        "",
    ]
    subs: List[str] = []
    preds: List[str] = []
    objs: List[str] = []
    dts: List[str] = []

    def emit(s: str, p: str, o: str, dt: str) -> None:
        subs.append(s)
        preds.append(p)
        objs.append(o)
        dts.append(dt)

    for i in range(n):
        note = f'para one.\nline "two" of {i}.\nfin {i}'
        doc.append(f'ex:doc{i} flu:note """{note}""" ;')
        emit(f"fid:doc{i}", "f:note", note, "")
        doc.append(f"    flu:alt 'hola {i}'@es ;")
        emit(f"fid:doc{i}", "f:alt", f"hola {i}", "")
        doc.append(f"    flu:count {i} ;")
        emit(f"fid:doc{i}", "f:count", str(i), "xsd:integer")
        doc.append(f"    flu:linked _:b{i} .")
        emit(f"fid:doc{i}", "f:linked", f"_:b{i}", "uri")
        doc.append(f'_:b{i} flu:host "swine" .')
        emit(f"_:b{i}", "f:host", "swine", "")
        # anonymous blank node: the parser skolemizes to a label
        # derived from md5 of the statement's exact source text — the
        # expectation derives the SAME label independently here
        import hashlib

        stmt = f'ex:doc{i} flu:site [ flu:country "c{i}" ] .'
        doc.append(stmt)
        anon = "_:a" + hashlib.md5(stmt.encode()).hexdigest()[:12] + "n0"
        emit(anon, "f:country", f"c{i}", "")
        emit(f"fid:doc{i}", "f:site", anon, "uri")
        # collection: rdf:List cons cells on the same skolem scheme
        stmt = f'ex:doc{i} flu:tags ("t{i}" "u{i}") .'
        doc.append(stmt)
        b = hashlib.md5(stmt.encode()).hexdigest()[:12]
        c0, c1 = f"_:a{b}n0", f"_:a{b}n1"
        emit(c0, "rdf:first", f"t{i}", "")
        emit(c0, "rdf:rest", c1, "uri")
        emit(c1, "rdf:first", f"u{i}", "")
        emit(c1, "rdf:rest", "rdf:nil", "uri")
        emit(f"fid:doc{i}", "f:tags", c0, "uri")
    expected = pa.table({
        "subject": pa.array(subs, pa.string()),
        "predicate": pa.array(preds, pa.string()),
        "object": pa.array(objs, pa.string()),
        "object_datatype": pa.array(dts, pa.string()),
    })
    return "\n".join(doc) + "\n", expected
