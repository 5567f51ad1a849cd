"""Report-layer aggregations: masterlist pivot, subtype synthesis,
constellation assembly (SURVEY.md §2.6 A1-A4).

Each is a ``groupby(key).map_groups`` over binding tables (the SPARQL
result analogue) — the shuffle key is barcode or strain, matching the
reference's GROUP BY (masterlist.rq:52, subtypes.rq:27).  Pure
per-group logic is kept in plain functions so the reference's unit
vectors (runtests.py:767-999) run against them directly.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import pandas as pd

from octoray.functions.dates import quarter_from_date
from octoray.functions.flu import clean_subtype

# ----------------------------------------------------------------------
# A4: constellation assembly (formatting.py:70-125)
# ----------------------------------------------------------------------
_SEGMENT_SLOT = dict(PB2=0, PB1=1, PA=2, NP=3, M=4, MP=4, NS=5)
_CLADE_CHAR = dict(
    pdm="P", LAIV="V", TRIG="T", humanSeasonal="H", classicalSwine="C", avian="A"
)


def _constellation_char(clade: str) -> str:
    """clade string -> slot character, with the reference's fuzzy
    fallbacks (formatting.py:92-112): '-like' -> X, partial/case-
    insensitive containment, else X."""
    if clade in _CLADE_CHAR:
        return _CLADE_CHAR[clade]
    if "-like" in clade.lower():
        return "X"
    for k, ch in _CLADE_CHAR.items():
        if k.lower() in clade.lower():
            return ch
    return "X"


def make_constellations(rows: Sequence[Tuple[str, str, str]]) -> List[Tuple[str, str]]:
    """_make_constellations (formatting.py:70-125): (strain, segment,
    clade) rows -> (strain, 6-char constellation or 'mixed')."""
    const: Dict[str, List[str]] = {}
    for strain, segment, clade in rows:
        if strain not in const:
            const[strain] = list("------")
        idx = _SEGMENT_SLOT.get(segment)
        if idx is None:
            continue  # segment/segment_subtype mismatch — warn-and-skip
        ch = _constellation_char(clade)
        if const[strain][idx] == "-":
            const[strain][idx] = ch
        elif const[strain][idx] != ch:
            const[strain][idx] = "M"  # conflicting clades -> mixed strain
    out = []
    for strain, c in const.items():
        out.append((strain, "mixed" if "M" in c else "".join(c)))
    return out


def constellations(ds, *, strain_col="strain", segment_col="segment", clade_col="clade"):
    """Dataset[(strain, segment, clade)] -> Dataset[(strain_name,
    constellation)]; groupby(strain) shuffle + per-group assembly."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        rows = list(zip(g[strain_col], g[segment_col], g[clade_col]))
        res = make_constellations(rows)
        return pd.DataFrame(
            {"strain_name": [r[0] for r in res], "constellation": [r[1] for r in res]}
        )

    from octoray.query import sorted_map_groups

    return sorted_map_groups(ds, [strain_col], per_group)


# ----------------------------------------------------------------------
# A3: subtype synthesis (recipes.py:291-387)
# ----------------------------------------------------------------------
def _ustr(s: str) -> str:
    return s.upper().strip()


def get_subtype(
    has: Sequence[str],
    nas: Sequence[str],
    gisaid_subtypes: Sequence[str],
    genbank_subtypes: Sequence[str],
) -> Optional[str]:
    """_get_subtype (recipes.py:291-335): precedence octoFLU HA/NA >
    genbank > gisaid; any multiplicity -> 'mixed'."""
    gisaid = list({clean_subtype(s) for s in gisaid_subtypes if len(s) > 0})
    genbank = list({clean_subtype(s) for s in genbank_subtypes if len(s) > 0})
    has_u = list({_ustr(h) for h in has if len(h) > 0})
    nas_u = list({_ustr(n) for n in nas if len(n) > 0})

    if len(nas_u) == 1 and len(has_u) == 1:
        return has_u[0] + nas_u[0]
    if len(gisaid) > 1 or len(genbank) > 1 or len(nas_u) > 1 or len(has_u) > 1:
        return "mixed"
    if len(genbank) == 1:
        return genbank[0]
    if len(gisaid) == 1:
        return gisaid[0]
    return None


_H_RE = re.compile(r"H\d+")
_N_RE = re.compile(r"N\d+")


def synthesize_subtypes(ds):
    """mk_subtypes (recipes.py:338-387): binding rows
    (strain_name, isolates, segment_subtypes, genbank_subtypes,
    gisaid_subtypes) with '+'-joined value strings -> per-strain and
    per-isolate (id, subtype) assignments.  groupby(strain_name)."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        strain = g["strain_name"].iloc[0]
        isolates = set()
        has: List[str] = []
        nas: List[str] = []
        genbank: List[str] = []
        gisaid: List[str] = []
        for _, row in g.iterrows():
            isolates.update(i for i in str(row.get("isolates", "") or "").split("+") if i)
            for v in str(row.get("genbank_subtypes", "") or "").split("+"):
                if v and v not in genbank:
                    genbank.append(v)
            for v in str(row.get("gisaid_subtypes", "") or "").split("+"):
                if v and v not in gisaid:
                    gisaid.append(v)
            segsub = [v for v in str(row.get("segment_subtypes", "") or "").split("+") if v]
            # only an unambiguous single segment_subtype votes
            # (recipes.py:358-365)
            if len(segsub) == 1:
                v = segsub[0]
                if _H_RE.fullmatch(v) and v not in has:
                    has.append(v)
                elif _N_RE.fullmatch(v) and v not in nas:
                    nas.append(v)
        subtype = get_subtype(has, nas, gisaid_subtypes=gisaid, genbank_subtypes=genbank)
        out_ids: List[str] = []
        out_levels: List[str] = []
        if subtype is not None:
            out_ids.append(strain)
            out_levels.append("strain")
            for iso in sorted(isolates):
                out_ids.append(iso)
                out_levels.append("isolate")
        return pd.DataFrame(
            {
                "id": out_ids,
                "level": out_levels,
                "subtype": [subtype] * len(out_ids),
            }
        )

    from octoray.query import sorted_map_groups

    return sorted_map_groups(ds, ["strain_name"], per_group)


# ----------------------------------------------------------------------
# A1+A2: masterlist group + pivot (recipes.py:390-507)
# ----------------------------------------------------------------------
MASTERLIST_HEADER: List[str] = [
    "Barcode", "Date", "Collection_Q", "State", "Subtype",
    "H_Genbank", "N_Genbank", "PB2_Genbank", "PB1_Genbank", "PA_Genbank",
    "NP_Genbank", "M_Genbank", "NS_Genbank", "Strain", "US_Clade",
    "GL_Clade", "H1", "H3", "N1", "N2", "PB2", "PB1", "PA", "NP", "M",
    "NS", "Constellation", "Motif", "Sa_Motif", "Sb_Motif", "Ca1_Motif",
    "Ca2_Motif", "Cb_Motif",
]

_PLUS_COLS = [
    "segment_subtypes", "subtypes", "states", "strains", "us_clades",
    "gl_clades", "consts", "h3_motifs", "sa_motifs", "sb_motifs",
    "ca1_motifs", "ca2_motifs", "cb_motifs",
]


def _split_plus(v) -> List[str]:
    """default_access (recipes.py:229-241): '+'-joined -> list."""
    if v is None:
        return []
    s = str(v)
    if not s:
        return []
    return [x for x in s.split("+")]


def _append_add(entry: Dict[str, List[str]], field: str, values: List[str]) -> None:
    """append_add (recipes.py:244-258): ordered dedup accumulate."""
    if len(values) > 0:
        if field in entry and entry[field]:
            for v in values:
                if v not in entry[field]:
                    entry[field].append(v)
        else:
            entry[field] = list(values)
    elif field not in entry:
        entry[field] = []


def masterlist_entry(rows: List[Dict[str, object]]) -> Dict[str, List[str]]:
    """mk_masterlist inner loop for ONE barcode (recipes.py:427-495):
    route each (genbank_id, segment) row's values into the 33-column
    layout with segment-dependent column choice."""
    entry: Dict[str, List[str]] = {f: [] for f in MASTERLIST_HEADER}
    for row in rows:
        segment = _split_plus(row.get("segment"))[0] if row.get("segment") else ""
        genbank_id = (_split_plus(row.get("genbank_id")) or [""])[0]
        subtype = (_split_plus(row.get("subtypes")) or [""])[0]
        date = (_split_plus(row.get("earliest_date")) or [""])[0]
        states = _split_plus(row.get("states"))
        strains = _split_plus(row.get("strains"))
        us_clades = _split_plus(row.get("us_clades"))
        gl_clades = _split_plus(row.get("gl_clades"))
        consts = _split_plus(row.get("consts"))

        _append_add(entry, "Date", [date])
        _append_add(entry, "Collection_Q", [quarter_from_date(date)])
        _append_add(entry, "State", states)

        if segment == "HA":
            _append_add(entry, "H_Genbank", [genbank_id])
            _append_add(entry, "US_Clade", us_clades)
            _append_add(entry, "GL_Clade", gl_clades)
        elif segment == "NA":
            _append_add(entry, "N_Genbank", [genbank_id])
            _append_add(entry, segment, us_clades)
        elif segment:
            _append_add(entry, segment + "_Genbank", [genbank_id])
            _append_add(entry, segment, us_clades)

        seg_subs = _split_plus(row.get("segment_subtypes"))
        if seg_subs:
            ss = seg_subs[0]
            if ss == "H1":
                _append_add(entry, "H1", us_clades)
            elif ss == "H3":
                _append_add(entry, "H3", us_clades)
            if ss == "N1":
                _append_add(entry, "N1", us_clades)
            elif ss == "N2":
                _append_add(entry, "N2", us_clades)

        _append_add(entry, "Strain", strains)
        _append_add(entry, "Subtype", [subtype])
        _append_add(entry, "Constellation", consts)
        _append_add(entry, "Motif", _split_plus(row.get("h3_motifs")))
        _append_add(entry, "Sa_Motif", _split_plus(row.get("sa_motifs")))
        _append_add(entry, "Sb_Motif", _split_plus(row.get("sb_motifs")))
        _append_add(entry, "Ca1_Motif", _split_plus(row.get("ca1_motifs")))
        _append_add(entry, "Ca2_Motif", _split_plus(row.get("ca2_motifs")))
        _append_add(entry, "Cb_Motif", _split_plus(row.get("cb_motifs")))
    return entry


def kg_monthly_report(triples):
    """A5 (wgs.rq / monthly-context.rq): date-part projection then
    GROUP BY (host, year, month) with a distinct-strain count and
    GROUP_CONCAT(DISTINCT subtype) — run directly over the triple
    table: one predicate-filtered pivot per subject, then a combined
    groupby-aggregate."""
    from octoray.query import pivot_subjects

    per_subject = pivot_subjects(
        triples, {"dates": "f:date", "hosts": "f:host", "subtypes": "f:subtype"}
    )

    def parts(df: pd.DataFrame) -> pd.DataFrame:
        first_date = df["dates"].str.split("+").str[0]
        ym = first_date.str.extract(r"^(\d{4})-?(\d{2})?")
        out = pd.DataFrame(
            {
                "host": df["hosts"].str.split("+").str[0],
                "year": ym[0].fillna(""),
                "month": ym[1].fillna(""),
                "subject": df["subject"],
                "subtypes": df["subtypes"],
            }
        )
        return out[(out["host"] != "") & (out["year"] != "")]

    keyed = per_subject.map_batches(parts, batch_format="pandas")

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        subs = sorted({s for row in g["subtypes"] for s in str(row).split("+") if s})
        return pd.DataFrame(
            {
                "host": [g["host"].iloc[0]],
                "year": [g["year"].iloc[0]],
                "month": [g["month"].iloc[0]],
                "n_strains": [g["subject"].nunique()],
                "subtypes": ["+".join(subs)],
            }
        )

    from octoray.query import sorted_map_groups

    return sorted_map_groups(keyed, ["host", "year", "month"], agg)


def tagged_strain_report(triples, ids):
    """A6 (get-tagged-strain.rq): resolve free-form ids to subjects
    (UNION id-resolution J6), restrict the graph (broadcast semi-join
    J7 — tag sets are small), then per-strain GROUP_CONCAT(DISTINCT)
    + MIN(date)."""
    from octoray.query import semi_join_auto, tagged_subjects

    # the matched-subject set stays distributed: semi_join_auto counts
    # it and broadcasts only when small, else hash-joins — a popular
    # tag no longer drags every subject through the driver (r1 #8)
    restricted = semi_join_auto(triples, "subject", tagged_subjects(triples, ids))

    def per_subject(g: pd.DataFrame) -> pd.DataFrame:
        def vals(pred):
            # SORTED distinct: within-group row order after a
            # subject-keyed sort is not stable across partitionings, so
            # first-seen order would be nondeterministic run-to-run
            # (same fix as pivot_subjects; matches the DuckDB twin's
            # string_agg(DISTINCT ... ORDER BY))
            return sorted(set(g.loc[g["predicate"] == pred, "object"]))

        dates = vals("f:date")
        return pd.DataFrame(
            {
                "subject": [g["subject"].iloc[0]],
                "strain_name": ["+".join(vals("f:strain_name"))],
                "subtypes": ["+".join(vals("f:subtype"))],
                "min_date": [min(dates) if dates else ""],
                "genbank_ids": ["+".join(vals("f:genbank_id"))],
            }
        )

    from octoray.query import sorted_map_groups

    return sorted_map_groups(restricted, ["subject"], per_subject)


def masterlist(ds):
    """Binding rows (one per barcode x genbank_id x segment,
    masterlist.rq GROUP BY) -> 33-column pivot, one row per barcode;
    list cells comma-joined like the reference's TSV (recipes.py:505).
    groupby(barcode) shuffle."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        barcode = g["barcode"].iloc[0]
        # deterministic row order inside the group
        g = g.sort_values(["segment", "genbank_id"], kind="mergesort")
        entry = masterlist_entry(g.to_dict("records"))
        entry["Barcode"] = [barcode]
        return pd.DataFrame(
            {f: [",".join(x for x in entry[f] if x)] for f in MASTERLIST_HEADER}
        )

    from octoray.query import sorted_map_groups

    return sorted_map_groups(ds, ["barcode"], per_group)
