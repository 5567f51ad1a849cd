"""Ontology rule expansion (reference schema.ttl + geography.ttl).

The reference delegates rdfs:subPropertyOf and the transitive
f:locatedIn hierarchy to GraphDB's reasoner (SURVEY.md §1.1); here
they are finite expansion rules applied as Dataset transforms:

  expand_subproperties  one vectorized map_batches — for each triple
                        whose predicate has super-properties, emit the
                        same triple under each super-predicate
                        (schema.ttl:19-68, geography.ttl:9-10).
  geography_facts       the static geo dimension as a triple table:
                        state name/abbr records and the locatedIn
                        hierarchy (state -> surveillance region ->
                        country -> continent; geography.ttl:14-995).
  transitive_closure    semi-naive closure over a (subject, object)
                        edge Dataset via iterated hash joins — the
                        distributed general form (f:locatedIn is
                        owl:TransitiveProperty, geography.ttl:7).
  expand_locations      strain-level f:state/f:country triples ->
                        f:locatedIn + its transitive ancestors via the
                        BROADCAST closed geo hierarchy (the dimension
                        is tiny and static, so the closure is computed
                        once and shipped via ray.put — J4).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc

from octoray.functions import geography
from octoray.model import DT_PLAIN, DT_URI, triples_to_table

# --- rdfs:subPropertyOf (schema.ttl:19-68, geography.ttl:9-10) --------
SUBPROPERTY: Dict[str, List[str]] = {
    "f:collection_date": ["f:date"],
    "rdfs:label": ["f:name"],
    "f:genbank_id": ["f:seqid"],
    "f:epi_id": ["f:seqid"],
    "f:has_segment": ["f:has_part"],
    "f:state": ["f:locatedIn"],
    "f:country": ["f:locatedIn"],
    **{f"f:{m}_motif": ["f:motif"] for m in ["h3", "cb", "sa", "sb", "ca1", "ca2"]},
    **{f"f:h{i}": ["f:ha"] for i in range(1, 19)},
    **{f"f:n{i}": ["f:na"] for i in range(1, 12)},
    **{f"f:{g}": ["f:internalGene"] for g in ["pb2", "pb1", "pa", "np", "m", "ns1"]},
}


def expand_subproperties(triples, *, rules: Dict[str, List[str]] = SUBPROPERTY):
    """Add (s, q, o, dt) for every (s, p, o, dt) with p ⊑ q.  One
    vectorized filter per rule predicate actually present; the rule
    table is finite and static, so this is a stateless map."""

    def f(t: pa.Table) -> pa.Table:
        preds = t.column("predicate")
        extra = [t]
        present = set(pc.unique(preds).to_pylist())
        for p, supers in rules.items():
            if p not in present:
                continue
            sel = t.filter(pc.equal(preds, pa.scalar(p)))
            for q in supers:
                extra.append(sel.set_column(
                    sel.schema.get_field_index("predicate"),
                    "predicate",
                    pa.array([q] * sel.num_rows, pa.string()),
                ))
        return pa.concat_tables(extra)

    return triples.map_batches(f, batch_format="pyarrow")


# --- static geography dimension (geography.ttl:14-995) ----------------
# US swine-surveillance regions (geography.ttl:119-170)
_US_REGIONS: Dict[str, Sequence[str]] = {
    "Region1": ["ME", "VT", "NH", "MA", "CT", "RI", "NY", "PA", "NJ", "DE",
                "MD", "DC", "VA", "WV", "NC", "SC", "TN", "AL", "GA", "FL"],
    "Region2": ["MN", "IA", "WI", "IL", "IN", "KY", "OH", "MI"],
    "Region3": ["MO", "AR", "MS", "LA", "OK", "TX"],
    "Region4": ["ID", "MT", "WY", "ND", "SD", "NE", "KS"],
    "Region5": ["WA", "OR", "CA", "NV", "UT", "AZ", "CO", "NM"],
}
# FULL region dimension — every ISO-3166 alpha-3 country to its
# region, plus the region -> continent -> Earth spine (the reference's
# complete hierarchy, geography.ttl:171-995; region membership is
# public geographic data and MUST match for graph parity —
# tests/test_rules.py pins the edge set against the reference file).
_REGION_MEMBERS: Dict[str, Sequence[str]] = {
    "Asia": ["AFG", "ARM", "AZE", "BGD", "BRN", "BTN", "CHN", "GEO", "HKG",
             "IDN", "IND", "JPN", "KAZ", "KGZ", "KHM", "KOR", "LAO", "LKA",
             "MAC", "MDV", "MMR", "MNG", "MYS", "NPL", "PAK", "PHL", "PRK",
             "SGP", "THA", "TJK", "TKM", "TLS", "TWN", "UZB", "VNM"],
    "Caribbean": ["ABW", "AIA", "ALA", "ATF", "ATG", "BES", "BHS", "BLM",
                  "BMU", "BRB", "BVT", "CCK", "COK", "CUB", "CUW", "CXR",
                  "CYM", "DMA", "DOM", "GLP", "GRD", "HMD", "HTI", "JAM",
                  "KNA", "LCA", "MAF", "MSR", "MTQ", "PRI", "SGS", "SXM",
                  "TTO", "VCT", "VGB", "VIR"],
    "CentralAmerica": ["BLZ", "CRI", "GTM", "HND", "MEX", "NIC", "PAN", "SLV"],
    "Earth": ["ATA"],
    "EasternAfrica": ["BDI", "COM", "DJI", "ERI", "ETH", "KEN", "MDG", "MOZ",
                      "MUS", "MWI", "MYT", "REU", "RWA", "SOM", "SYC", "TZA",
                      "UGA", "ZMB", "ZWE"],
    "Europe": ["ALB", "AND", "AUT", "BEL", "BGR", "BIH", "BLR", "CHE", "CYP",
               "CZE", "DEU", "DNK", "ESP", "EST", "FIN", "FRA", "FRO", "GBR",
               "GGY", "GIB", "GRC", "HRV", "HUN", "IMN", "IRL", "ISL", "ITA",
               "JEY", "LIE", "LTU", "LUX", "LVA", "MCO", "MDA", "MKD", "MLT",
               "MNE", "NLD", "NOR", "POL", "PRT", "ROU", "RUS", "SJM", "SMR",
               "SRB", "SVK", "SVN", "SWE", "TUR", "UKR", "VAT"],
    "MiddleAfrica": ["AGO", "CAF", "CMR", "COD", "COG", "GAB", "GNQ", "STP",
                     "TCD"],
    "MiddleEast": ["ARE", "BHR", "IRN", "IRQ", "ISR", "JOR", "KWT", "LBN",
                   "OMN", "PSE", "QAT", "SAU", "SYR", "YEM"],
    "NorthAmerica": ["CAN", "GRL", "SPM", "USA"],
    "NorthernAfrica": ["DZA", "EGY", "ESH", "LBY", "MAR", "SDN", "SSD", "TUN"],
    "Oceania": ["ASM", "AUS", "FJI", "FSM", "GUM", "IOT", "KIR", "MHL", "MNP",
                "NCL", "NFK", "NIU", "NRU", "NZL", "PCN", "PLW", "PNG", "PYF",
                "SLB", "TCA", "TKL", "TON", "TUV", "UMI", "VUT", "WLF", "WSM"],
    "SouthAmerica": ["ARG", "BOL", "BRA", "CHL", "COL", "ECU", "FLK", "GUF",
                     "GUY", "PER", "PRY", "SUR", "URY", "VEN"],
    "SouthernAfrica": ["BWA", "LSO", "NAM", "SWZ", "ZAF"],
    "WesternAfrica": ["BEN", "BFA", "CIV", "CPV", "GHA", "GIN", "GMB", "GNB",
                      "LBR", "MLI", "MRT", "NER", "NGA", "SEN", "SHN", "SLE",
                      "TGO"],
}
_COUNTRY_REGION: Dict[str, str] = {
    c: region for region, members in _REGION_MEMBERS.items() for c in members
}
# region -> parent spine (geography.ttl:171-183); Africa's subregions
# roll up through the continent, the rest sit directly under Earth
_REGION_PARENT: Dict[str, str] = {
    "EasternAfrica": "Africa", "MiddleAfrica": "Africa",
    "NorthernAfrica": "Africa", "SouthernAfrica": "Africa",
    "WesternAfrica": "Africa",
    "Africa": "Earth", "Asia": "Earth", "CentralAmerica": "Earth",
    "Europe": "Earth", "MiddleEast": "Earth", "NorthAmerica": "Earth",
    "Oceania": "Earth", "SouthAmerica": "Earth", "Caribbean": "Earth",
}


def geography_facts() -> pa.Table:
    """The geo dimension as triples: usa:XX f:name/f:abbr literals plus
    the locatedIn edges (state -> region -> USA; country -> subregion)."""
    rows: List[Tuple[str, str, str, str]] = []
    for name, code in geography.STATE_NAME2ABBR.items():
        rows.append((f"usa:{code}", "f:name", name.title(), DT_PLAIN))
        rows.append((f"usa:{code}", "f:abbr", code, DT_PLAIN))
    for region, states in _US_REGIONS.items():
        for st in states:
            rows.append((f"usa:{st}", "f:locatedIn", f"usa:{region}", DT_URI))
        rows.append((f"usa:{region}", "f:locatedIn", "world:USA", DT_URI))
    for code, region in _COUNTRY_REGION.items():
        rows.append((f"world:{code}", "f:locatedIn", f"world:{region}", DT_URI))
    for region, parent in _REGION_PARENT.items():
        rows.append((f"world:{region}", "f:locatedIn", f"world:{parent}", DT_URI))
    return triples_to_table(sorted(set(rows)))


def closure_edges(edges: Sequence[Tuple[str, str]]) -> set:
    """In-memory transitive closure of a small edge set."""
    adj: Dict[str, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    out = set()
    for a in adj:
        stack = list(adj[a])
        seen = set()
        while stack:
            b = stack.pop()
            if b in seen:
                continue
            seen.add(b)
            out.add((a, b))
            stack.extend(adj.get(b, ()))
    return out


def transitive_closure(edges_ds, *, subject_col: str = "subject",
                       object_col: str = "object", max_iters: int = 16,
                       num_partitions: int = 8):
    """Distributed semi-naive closure: repeat edges ∪ (new ⋈ edges)
    until no growth.  Each round is ONE hash join keyed on the
    frontier's object = base's subject; growth is checked with a cheap
    count.  For hierarchies of depth d it runs ceil(log-ish d) rounds;
    the static geography dimension instead uses the in-memory
    ``closure_edges`` (broadcast, J4)."""

    schema = pa.schema([(subject_col, pa.string()), (object_col, pa.string())])

    def norm(t: pa.Table) -> pa.Table:
        # Ray 2.49's hash-shuffle groupby emits SCHEMA-LESS empty
        # blocks for empty partitions; if one lands on a join input the
        # join dies with "No match for FieldRef" (flaky by partition
        # placement).  Rebuild every block against the edge schema.
        if t.num_columns == 0:
            return schema.empty_table()
        return t.select([subject_col, object_col]).cast(schema)

    def dedup(ds):
        from octoray.query import distinct_values

        return distinct_values(ds, [subject_col, object_col]).map_batches(
            norm, batch_format="pyarrow")

    from octoray.util import drop_empty_blocks

    # materialize() per round: bounds the lineage (otherwise each round
    # re-executes every previous join, and deeply stacked lazy joins
    # stall the executor) — the per-round checkpoint any iterative
    # fixpoint needs at scale.  drop_empty_blocks after each
    # checkpoint: the hash-shuffle join/groupby emit SCHEMA-LESS empty
    # blocks for empty partitions, map operators pass empty blocks
    # through without running the UDF, and a later join partition
    # builder that receives one of them first dies on the key FieldRef
    # (see util.drop_empty_blocks).
    all_edges = drop_empty_blocks(dedup(edges_ds).materialize(), schema)
    n = all_edges.count()
    for _ in range(max_iters):
        from octoray.query import merge_join

        base_b = all_edges.rename_columns({subject_col: "_mid", object_col: "_dst"})
        stepped = merge_join(
            all_edges.rename_columns({object_col: "_mid"}), base_b, ["_mid"],
        ).select_columns([subject_col, "_dst"]).rename_columns({"_dst": object_col})
        grown = drop_empty_blocks(
            dedup(all_edges.union(stepped)).materialize(), schema)
        m = grown.count()
        if m == n:
            break
        all_edges, n = grown, m
    return all_edges


def expand_locations(triples):
    """f:locatedIn ancestors for every subject with f:state/f:country:
    subproperty step emits (s, locatedIn, loc); this adds
    (s, locatedIn, ancestor) for each ancestor of loc in the closed
    static hierarchy.  The closure is built once on the driver (the
    dimension is ~1k rows) and broadcast via ray.put."""
    import ray

    geo = geography_facts()
    sel = geo.filter(pc.equal(geo.column("predicate"), pa.scalar("f:locatedIn")))
    closed = closure_edges(
        list(zip(sel.column("subject").to_pylist(), sel.column("object").to_pylist()))
    )
    anc: Dict[str, List[str]] = {}
    for a, b in closed:
        anc.setdefault(a, []).append(b)
    anc_ref = ray.put({k: sorted(v) for k, v in anc.items()})

    def f(t: pa.Table) -> pa.Table:
        amap = ray.get(anc_ref) if not isinstance(anc_ref, dict) else anc_ref
        mask = pc.is_in(t.column("predicate"),
                        value_set=pa.array(["f:state", "f:country"], pa.string()))
        sel_t = t.filter(mask)
        subs = sel_t.column("subject")
        objs = sel_t.column("object")
        n = sel_t.num_rows

        def const(v: str, m: int) -> pa.Array:
            return pa.array([v] * m, pa.string())

        # vectorized fan-out (VERDICT r1 #7): one direct (s, locatedIn,
        # o) block, then one constant-object block per (distinct loc,
        # ancestor) pair — the ancestor map is tiny and static, so the
        # loop is over VALUES (~dozens), never rows
        parts = [pa.table({"subject": subs, "predicate": const("f:locatedIn", n),
                           "object": objs, "object_datatype": const(DT_URI, n)})]
        for loc in pc.unique(objs).to_pylist():
            ancs = amap.get(loc)
            if not ancs:
                continue
            s_loc = sel_t.filter(pc.equal(objs, pa.scalar(loc))).column("subject")
            m = len(s_loc)
            for a in ancs:
                parts.append(pa.table({
                    "subject": s_loc, "predicate": const("f:locatedIn", m),
                    "object": const(a, m), "object_datatype": const(DT_URI, m)}))
        new = pa.concat_tables(parts)
        # batch-local distinct (the old sorted(set(...)) semantics)
        new = new.group_by(new.schema.names, use_threads=False).aggregate([]) \
                 .select(new.schema.names)
        # upstream joins may have reordered the 4 triple columns;
        # concat requires identical schema order
        cols = [c for c in t.schema.names if c in new.schema.names]
        left = t.select(cols)
        return pa.concat_tables([left, new.select(cols).cast(left.schema)])

    return triples.map_batches(f, batch_format="pyarrow")


def validate_constraints(triples, rules):
    """SHACL-lite constraint validation over a deduped triple Dataset
    — the KG quality-assurance stage every construction pipeline runs
    before publishing (reference analogue: the emitter's implicit
    schema, made checkable).  ``rules`` is a list of:

      ("datatype", p, dt)   every p-triple's object_datatype must be dt
      ("max_card", p, n)    a subject may carry at most n p-triples
      ("requires", p, q)    a subject with p must also have q

    Returns (rule, subject, detail) violation rows — rule ids are
    stable strings (``datatype:p`` / ``max_card:p`` /
    ``requires:p->q``) so downstream dashboards and the SQL twin key
    on them.  Each rule is one vectorized pass or one slim groupby:
    datatype = an Arrow filter; max_card = map-side partial counts +
    one (subject) exchange; requires = two distinct-subject sets and
    a stats-gated anti semi-join.  Violations union; nothing
    materializes the corpus."""
    import pyarrow.compute as pc

    from octoray.query import (
        combined_groupby_count,
        distinct_values,
        semi_join_auto,
    )

    outs = []
    for kind, p, arg in rules:
        if kind == "datatype":
            rid = f"datatype:{p}"

            def f(t: pa.Table, _p=p, _dt=arg, _rid=rid) -> pa.Table:
                t = t.filter(pc.and_(
                    pc.equal(t.column("predicate"), pa.scalar(_p)),
                    pc.not_equal(t.column("object_datatype"),
                                 pa.scalar(_dt))))
                return pa.table({
                    "rule": pa.array([_rid] * t.num_rows, pa.string()),
                    "subject": t.column("subject"),
                    "detail": t.column("object_datatype"),
                })

            outs.append(distinct_values(
                triples.map_batches(f, batch_format="pyarrow"),
                ["rule", "subject", "detail"]))
        elif kind == "max_card":
            rid = f"max_card:{p}"

            def sel(t: pa.Table, _p=p) -> pa.Table:
                t = t.filter(pc.equal(t.column("predicate"),
                                      pa.scalar(_p)))
                return t.select(["subject"])

            cnt = combined_groupby_count(
                triples.map_batches(sel, batch_format="pyarrow"),
                ["subject"], alias="n")

            def over(t: pa.Table, _n=arg, _rid=rid) -> pa.Table:
                t = t.filter(pc.greater(t.column("n"),
                                        pa.scalar(_n)))
                return pa.table({
                    "rule": pa.array([_rid] * t.num_rows, pa.string()),
                    "subject": t.column("subject"),
                    "detail": t.column("n").cast(pa.string()),
                })

            outs.append(cnt.map_batches(over, batch_format="pyarrow"))
        elif kind == "requires":
            rid = f"requires:{p}->{arg}"

            def subs(pred):
                def g(t: pa.Table, _p=pred) -> pa.Table:
                    t = t.filter(pc.equal(t.column("predicate"),
                                          pa.scalar(_p)))
                    return t.select(["subject"])

                return distinct_values(
                    triples.map_batches(g, batch_format="pyarrow"),
                    ["subject"])

            viol = semi_join_auto(subs(p), "subject", subs(arg),
                                  key_col="subject", anti=True)

            def shape(t: pa.Table, _rid=rid) -> pa.Table:
                return pa.table({
                    "rule": pa.array([_rid] * t.num_rows, pa.string()),
                    "subject": t.column("subject"),
                    "detail": pa.array([""] * t.num_rows, pa.string()),
                })

            outs.append(viol.map_batches(shape, batch_format="pyarrow"))
        else:
            raise ValueError(f"unknown constraint kind: {kind!r}")
    res = outs[0]
    for o in outs[1:]:
        res = res.union(o)
    return res


def sql_validate_constraints(src: str, rules) -> str:
    """DuckDB twin of :func:`validate_constraints` over a raw triple
    dump (deduped in the CTE, matching the engine's canonical
    input)."""
    parts = []
    for kind, p, arg in rules:
        if kind == "datatype":
            parts.append(f"""
            SELECT DISTINCT 'datatype:{p}' AS rule, subject,
                   object_datatype AS detail
            FROM d WHERE predicate = '{p}'
              AND object_datatype <> '{arg}'""")
        elif kind == "max_card":
            parts.append(f"""
            SELECT 'max_card:{p}' AS rule, subject,
                   CAST(n AS VARCHAR) AS detail
            FROM (SELECT subject, count(*) AS n FROM d
                  WHERE predicate = '{p}' GROUP BY subject)
            WHERE n > {arg}""")
        elif kind == "requires":
            parts.append(f"""
            SELECT 'requires:{p}->{arg}' AS rule, subject,
                   '' AS detail
            FROM (SELECT DISTINCT subject FROM d
                  WHERE predicate = '{p}')
            WHERE subject NOT IN (SELECT subject FROM d
                                  WHERE predicate = '{arg}')""")
    u = " UNION ALL ".join(parts)
    return f"""
        WITH d AS (SELECT DISTINCT subject, predicate, object,
                          object_datatype FROM {src})
        {u}
    """
