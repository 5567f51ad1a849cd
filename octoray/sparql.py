"""SPARQL text front end: parse the reference's own ``.rq`` query
files and execute them on the triple Dataset through the pattern
layer — the missing piece between the reference's arbitrary-SPARQL CLI
(``octofludb query x.rq`` / ``construct`` / ``update``,
/root/reference/octofludb/ui.py:436-560) and our structured
``patterns.py`` algebra, which round 2/3 exposed only as Python
tuples.

Supported subset — everything the reference's shipped query files use
(/root/reference/octofludb/data/*.rq):

  PREFIX declarations (expanded via the file's own table, then
  re-abbreviated against the engine's canonical ``model.PREFIXES`` so
  any local prefix naming normalizes to the stored representation);
  SELECT [DISTINCT] with bare variables and aggregate heads
  (GROUP_CONCAT(DISTINCT ?v; separator="+") / MIN / MAX / COUNT /
  COUNT(DISTINCT) / SAMPLE / SUM / AVG, with GROUP BY or as an
  implicit single group when every head is an aggregate); FROM
  clauses (ignored — graph selection
  is the caller's Dataset); WHERE with triple patterns, property
  paths (p1/p2 sequence, p1|p2 alternation, ^p inverse, p+
  transitive, !p / !(p1|p2) negated property sets), OPTIONAL groups
  (nested, with inner FILTERs), nested subqueries ({ SELECT ... }
  inner joined on shared variables, results lexicalized to the
  layer's all-string convention),
  { } UNION { } blocks, MINUS { }, FILTER [NOT] EXISTS { },
  FILTER expressions (comparisons incl. variable-to-variable, REGEX
  with the "i" flag, BOUND, !BOUND, IN, && / || with arbitrary
  nesting — compiled to the engine's disjunction-of-conjunctions
  form), BIND(YEAR/MONTH/DAY(?v) AS ?x), VALUES, GROUP BY, typed
  literals ("..."^^xsd:date keeps the lexical form — the store is
  lexical), $var sigils, # comments, and the reference's __MACRO__
  text parameters (ui.py:1315's [("__YEAR__", ...)] convention via
  ``params``).

Execution is Ray-Data-first and shares ONE streaming graph scan for
the whole query tree: every triple pattern anywhere in the tree
(required, OPTIONAL, UNION branch, MINUS inner) contributes to a
single ``_tagged_hits`` pass; groups then fold over the materialized
per-pattern hit sets with the pattern layer's stats-gated joins.
UNION blocks are evaluated by distributing the enclosing group's join
over the branches (join / left-join / filter all distribute over bag
union), which is exactly SPARQL's union-of-joins semantics and keeps
every variant a connected conjunctive fold.

Known-malformed upstream: data/get-tagged.rq references variables no
pattern binds (?barcode, ?seqid) and carries a ?msgid typo — the
reference endpoint itself returns empty/errors on it; we raise a
clear parse error on its bare ``?var as NAME`` projection instead of
guessing.
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import pyarrow as pa

from octoray import model
from octoray.patterns import (_binding_schema, _fold_join, _is_var,
                              _rewrite_one, _tagged_hits, _vars_of,
                              anti_bindings, apply_filters,
                              _bindings_from_hits, extend_bindings,
                              instantiate_template, select_bindings,
                              values_bindings, aggregate_bindings,
                              aggregate_all, _fold_join_any,
                              _collect_string_table, _LOCAL_FOLD_LIMIT)


def _lift(bindings):
    """Driver-local binding table -> Dataset (identity on Datasets).
    The lift is the ONE Ray handoff a locally-folded group pays; empty
    results are normalized exactly like fold outputs."""
    if not isinstance(bindings, pa.Table):
        return bindings
    import ray.data as rd

    from octoray.util import drop_empty_blocks

    schema = pa.schema([(n, pa.string()) for n in bindings.column_names])
    return drop_empty_blocks(rd.from_arrow(bindings).materialize(), schema)


def _localize(ds_):
    """Dataset below the local-fold gate -> driver Arrow table (the
    evaluator's folds then run Acero locally, zero executions/step)."""
    if isinstance(ds_, pa.Table) or ds_.count() > _LOCAL_FOLD_LIMIT:
        return ds_
    return _collect_string_table(ds_, ds_.schema().names)

# ---------------------------------------------------------------------------
# tokenizer


_TOKEN_RE = re.compile(
    r"""
      (?P<WS>\s+)
    | (?P<COMMENT>\#[^\n]*)
    | (?P<IRI><[^<>\s]*>)
    | (?P<STRING>"(?:[^"\\]|\\.)*")
    | (?P<VAR>[?$][A-Za-z_]\w*)
    | (?P<PNAME>[A-Za-z_][\w-]*:(?:[\w%+-]|\.(?=[\w%+-]))*)
    | (?P<NUM>-?\d+(?:\.\d+)?)
    | (?P<NAME>[A-Za-z_]\w*)
    | (?P<DCARET>\^\^)
    | (?P<OP>&&|\|\||!=|<=|>=|[{}();,.=<>/|^+!*?])
    """,
    re.VERBOSE,
)


@dataclass
class _Tok:
    kind: str
    text: str
    pos: int


def _tokenize(text: str) -> List[_Tok]:
    out: List[_Tok] = []
    i = 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise SparqlError(f"cannot tokenize at offset {i}: "
                              f"{text[i:i + 30]!r}")
        kind = m.lastgroup
        if kind not in ("WS", "COMMENT"):
            out.append(_Tok(kind, m.group(), i))
        i = m.end()
    out.append(_Tok("EOF", "", len(text)))
    return out


class SparqlError(ValueError):
    pass


# ---------------------------------------------------------------------------
# AST


@dataclass
class Group:
    """One { } graph group in parsed, engine-normalized form."""

    patterns: List[Tuple[str, str, str]] = field(default_factory=list)
    optionals: List["Group"] = field(default_factory=list)
    unions: List[List["Group"]] = field(default_factory=list)
    minus: List[Tuple["Group", str]] = field(default_factory=list)  # (grp, mode)
    filters: List[tuple] = field(default_factory=list)
    binds: List[Tuple[str, str]] = field(default_factory=list)
    values: List[Tuple[List[str], List[tuple]]] = field(default_factory=list)
    subqueries: List["Query"] = field(default_factory=list)


@dataclass
class Query:
    form: str                       # 'select' | 'construct' | 'delete'
    distinct: bool
    proj: List[str]                 # output column names, SELECT order
    aggs: List[Tuple[str, str, str]]  # (var, fn, alias)
    group_by: List[str]
    where: Group
    template: List[Tuple[str, str, str]] = field(default_factory=list)
    sep: str = "+"                  # GROUP_CONCAT separator (uniform)
    order_by: List[Tuple[str, bool]] = field(default_factory=list)  # (var, asc)
    limit: Optional[int] = None
    offset: Optional[int] = None
    having: List[tuple] = field(default_factory=list)


# ---------------------------------------------------------------------------
# parser


def _abbrev(iri: str) -> str:
    """Full IRI -> engine prefix form via the longest canonical base."""
    best = None
    for pfx, base in model.PREFIXES.items():
        if iri.startswith(base) and (best is None or len(base) > len(best[1])):
            best = (pfx, base)
    return best[0] + ":" + iri[len(best[1]):] if best else iri


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: Dict[str, str] = {}

    # -- token helpers ----------------------------------------------------
    def peek(self, k: int = 0) -> _Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, text: Optional[str] = None) -> _Tok:
        t = self.next()
        if t.kind != kind or (text is not None and t.text != text):
            raise SparqlError(
                f"expected {text or kind} at offset {t.pos}, got {t.text!r}")
        return t

    def at_kw(self, word: str) -> bool:
        t = self.peek()
        return t.kind == "NAME" and t.text.upper() == word

    def eat_kw(self, word: str) -> bool:
        if self.at_kw(word):
            self.next()
            return True
        return False

    # -- terms ------------------------------------------------------------
    def _pname(self, text: str) -> str:
        pfx, _, local = text.partition(":")
        if pfx in self.prefixes:
            return _abbrev(self.prefixes[pfx] + local)
        # no file-level declaration: assume it is already engine form
        return text

    def term(self) -> Tuple[str, Optional[str]]:
        """One subject/object term -> (engine string, datatype-or-None)."""
        t = self.next()
        if t.kind == "VAR":
            return "?" + t.text[1:], None
        if t.kind == "PNAME":
            return self._pname(t.text), model.DT_URI
        if t.kind == "IRI":
            return _abbrev(t.text[1:-1]), model.DT_URI
        if t.kind == "STRING":
            lex = _unquote(t.text)
            if self.peek().kind == "DCARET":
                self.next()
                dt_tok = self.next()
                if dt_tok.kind == "PNAME":
                    dt = self._pname(dt_tok.text)
                elif dt_tok.kind == "IRI":
                    dt = _abbrev(dt_tok.text[1:-1])
                else:
                    raise SparqlError(f"bad datatype at {dt_tok.pos}")
                return lex, dt
            return lex, model.DT_PLAIN
        if t.kind == "NUM":
            return t.text, (model.DT_INT if "." not in t.text
                            else model.DT_DOUBLE)
        raise SparqlError(f"unexpected term {t.text!r} at offset {t.pos}")

    def path(self) -> str:
        """Predicate position: engine path string.  Grammar subset:
        seg ('/' seg)* | seg ('|' seg)* | '^'seg | seg'+'/'*'/'?' |
        '!'seg | '!(' seg ('|' seg)* ')' (negated property set) — the
        forms patterns.py executes; combining them raises, as there."""
        inverse = False
        if self.peek().kind == "OP" and self.peek().text == "!":
            # negated property set: !p or !(p1|p2)
            self.next()
            parts = []
            if self.peek().kind == "OP" and self.peek().text == "(":
                self.next()
                while True:
                    parts.append(self._path_seg())
                    if self.peek().kind == "OP" and self.peek().text == "|":
                        self.next()
                        continue
                    break
                self.expect("OP", ")")
            else:
                parts.append(self._path_seg())
            return "!" + "|".join(parts)
        if self.peek().kind == "OP" and self.peek().text == "^":
            self.next()
            inverse = True
        t = self.next()
        if t.kind == "VAR":
            if inverse:
                raise SparqlError("^?var paths not supported")
            return "?" + t.text[1:]
        if t.kind == "PNAME":
            seg = self._pname(t.text)
        elif t.kind == "IRI":
            seg = _abbrev(t.text[1:-1])
        elif t.kind == "NAME" and t.text == "a":
            seg = "rdf:type"
        else:
            raise SparqlError(f"bad predicate {t.text!r} at offset {t.pos}")
        if inverse:
            return "^" + seg
        return self._path_tail(seg)

    def _path_seg(self) -> str:
        """One bare path segment: pname, <iri>, or the 'a' keyword."""
        t = self.next()
        if t.kind == "PNAME":
            return self._pname(t.text)
        if t.kind == "IRI":
            return _abbrev(t.text[1:-1])
        if t.kind == "NAME" and t.text == "a":
            return "rdf:type"
        raise SparqlError(f"bad path segment {t.text!r} at offset {t.pos}")

    def _path_tail(self, seg: str) -> str:
        if self.peek().kind == "OP" and self.peek().text in ("+", "*", "?"):
            return seg + self.next().text
        if self.peek().kind == "OP" and self.peek().text in ("/", "|"):
            joiner = self.peek().text
            parts = [seg]
            while self.peek().kind == "OP" and self.peek().text == joiner:
                self.next()
                nt = self.next()
                if nt.kind == "PNAME":
                    parts.append(self._pname(nt.text))
                elif nt.kind == "IRI":
                    parts.append(_abbrev(nt.text[1:-1]))
                else:
                    raise SparqlError(
                        f"bad path segment {nt.text!r} at offset {nt.pos}")
            return joiner.join(parts)
        return seg

    # -- query ------------------------------------------------------------
    def parse(self) -> Query:
        while self.at_kw("PREFIX"):
            self.next()
            p = self.expect("PNAME").text
            iri = self.expect("IRI").text
            self.prefixes[p[:-1] if p.endswith(":") else p.split(":")[0]] = \
                iri[1:-1]
        if self.at_kw("SELECT"):
            return self._select()
        if self.at_kw("CONSTRUCT"):
            return self._construct()
        if self.at_kw("DELETE"):
            return self._delete()
        if self.at_kw("INSERT"):
            return self._insert()
        if self.at_kw("ASK"):
            self.next()
            self.eat_kw("WHERE")
            return Query("ask", False, [], [], [], self.group())
        if self.at_kw("DESCRIBE"):
            return self._describe()
        t = self.peek()
        raise SparqlError(
            f"expected SELECT/CONSTRUCT/ASK/DESCRIBE/DELETE/INSERT "
            f"at {t.pos}")

    def _describe(self) -> Query:
        self.next()
        vars_: List[str] = []
        iris: List[str] = []
        while True:
            t = self.peek()
            if t.kind == "VAR":
                self.next()
                vars_.append(t.text[1:])
            elif t.kind in ("PNAME", "IRI"):
                term, _ = self.term()
                iris.append(term)
            else:
                break
        if not vars_ and not iris:
            raise SparqlError("DESCRIBE needs at least one term")
        where = Group()
        if self.at_kw("WHERE") or (self.peek().kind == "OP"
                                   and self.peek().text == "{"):
            self.eat_kw("WHERE")
            where = self.group()
        q = Query("describe", True, vars_, [], [], where)
        q.template = [(iri, "", "") for iri in iris]  # constant terms
        return q

    def _select(self, sub: bool = False) -> Query:
        self.next()
        distinct = self.eat_kw("DISTINCT")
        self.eat_kw("REDUCED")
        proj: List[str] = []
        aggs: List[Tuple[str, str, str]] = []
        sep = "+"
        while True:
            t = self.peek()
            if t.kind == "VAR":
                self.next()
                if self.at_kw("AS") or (self.peek().kind == "NAME"
                                        and self.peek().text == "as"):
                    raise SparqlError(
                        "bare '?var as NAME' projection is not SPARQL "
                        "(data/get-tagged.rq is malformed upstream); "
                        "parenthesize: (?var AS ?name)")
                proj.append(t.text[1:])
            elif t.kind == "OP" and t.text == "(":
                self.next()
                var, fn, alias, sep2 = self._agg_head()
                if sep2 is not None:
                    sep = sep2
                if fn == "var":
                    proj.append(alias)
                    # plain rename: record as a bind-style copy
                    aggs.append((var, "__copy__", alias))
                else:
                    proj.append(alias)
                    aggs.append((var, fn, alias))
            else:
                break
        while self.at_kw("FROM"):
            self.next()
            # named-graph selection has no Dataset analogue; skip the IRI
            if self.at_kw("NAMED"):
                self.next()
            self.next()
        self.eat_kw("WHERE")
        where = self.group()
        group_by: List[str] = []
        if self.at_kw("GROUP"):
            self.next()
            if not self.eat_kw("BY"):
                raise SparqlError("GROUP without BY")
            while self.peek().kind == "VAR":
                group_by.append(self.next().text[1:])
        having: List[tuple] = []
        if self.at_kw("HAVING"):
            self.next()
            having = self._filter_expr()
        order_by: List[Tuple[str, bool]] = []
        if self.at_kw("ORDER"):
            self.next()
            if not self.eat_kw("BY"):
                raise SparqlError("ORDER without BY")
            while True:
                t = self.peek()
                if t.kind == "VAR":
                    self.next()
                    order_by.append((t.text[1:], True))
                elif t.kind == "NAME" and t.text.upper() in ("ASC", "DESC"):
                    asc = t.text.upper() == "ASC"
                    self.next()
                    self.expect("OP", "(")
                    v = self.expect("VAR").text[1:]
                    self.expect("OP", ")")
                    order_by.append((v, asc))
                else:
                    break
        limit = None
        offset = None
        # LIMIT and OFFSET may appear in either order (SPARQL 1.1
        # LimitOffsetClauses)
        for _ in range(2):
            if self.at_kw("LIMIT") and limit is None:
                self.next()
                limit = int(self.expect("NUM").text)
            elif self.at_kw("OFFSET") and offset is None:
                self.next()
                offset = int(self.expect("NUM").text)
        # trailing solution modifiers we accept-and-ignore would be
        # silently wrong — raise on anything unconsumed but EOF (a
        # subquery instead stops at its closing brace, which the
        # caller consumes)
        if not sub and self.peek().kind != "EOF":
            t = self.peek()
            raise SparqlError(f"unsupported trailing syntax at {t.pos}: "
                              f"{t.text!r}")
        real_aggs = [a for a in aggs if a[1] != "__copy__"]
        if real_aggs and not group_by and len(real_aggs) != len(aggs):
            # bare (?v AS ?alias) copies alongside aggregates need a
            # group to be well-defined
            raise SparqlError("mixed bare variables and aggregates "
                              "without GROUP BY")
        copies = [(v, a) for v, fn, a in aggs if fn == "__copy__"]
        q = Query("select", distinct, proj, real_aggs, group_by, where)
        q.sep = sep
        q.order_by = order_by
        q.limit = limit
        q.offset = offset
        q.having = having
        for v, a in copies:
            q.where.binds.append((a, "?" + v))
        return q

    def _agg_head(self) -> Tuple[str, str, str, Optional[str]]:
        """Inside '(': FUNC(DISTINCT? ?v [; separator="s"]) AS ?alias ')'
        or (?v AS ?alias)."""
        sep = None
        t = self.next()
        if t.kind == "VAR":
            # (?v AS ?alias)
            self._expect_as()
            alias = self.expect("VAR").text[1:]
            self.expect("OP", ")")
            return t.text[1:], "var", alias, None
        if t.kind != "NAME":
            raise SparqlError(f"bad SELECT head at {t.pos}: {t.text!r}")
        fn_raw = t.text.upper()
        self.expect("OP", "(")
        distinct = self.eat_kw("DISTINCT")
        if (fn_raw == "COUNT" and self.peek().kind == "OP"
                and self.peek().text == "*"):
            # COUNT(*): count the group's rows — any group var serves
            # as the counted (never-null) column downstream
            self.next()
            var = "*"
        else:
            var = self.expect("VAR").text[1:]
        if self.peek().kind == "OP" and self.peek().text == ";":
            self.next()
            name = self.expect("NAME")
            if name.text.lower() != "separator":
                raise SparqlError(f"unknown aggregate option {name.text!r}")
            self.expect("OP", "=")
            sep = _unquote(self.expect("STRING").text)
        self.expect("OP", ")")
        self._expect_as()
        alias = self.expect("VAR").text[1:]
        self.expect("OP", ")")
        fn = {
            # SPARQL leaves GROUP_CONCAT order implementation-defined;
            # this engine renders BOTH forms value-sorted so any
            # parallelism reproduces them: DISTINCT dedups (the
            # reference's '+' convention), the bag form keeps every
            # duplicate solution.
            "GROUP_CONCAT": "group_concat" if distinct else "group_concat_all",
            "MIN": "min",
            "MAX": "max",
            "COUNT": "count_distinct" if distinct else "count",
            "SAMPLE": "min",  # deterministic sample
            "SUM": "sum",
            "AVG": "avg",
        }.get(fn_raw)
        if fn is None:
            raise SparqlError(f"unsupported aggregate {fn_raw}")
        return var, fn, alias, sep

    def _expect_as(self) -> None:
        t = self.next()
        if not (t.kind == "NAME" and t.text.upper() == "AS"):
            raise SparqlError(f"expected AS at offset {t.pos}")

    def _template(self) -> List[tuple]:
        self.expect("OP", "{")
        tmpl: List[tuple] = []
        while not (self.peek().kind == "OP" and self.peek().text == "}"):
            s, _ = self.term()
            p = self.path()
            o, odt = self.term()
            # a CONSTANT object keeps its parsed datatype (uri / plain /
            # ^^dt) as the explicit 4th template element — without it a
            # constant IRI object would instantiate as a plain literal
            tmpl.append((s, p, o) if odt is None else (s, p, o, odt))
            if self.peek().kind == "OP" and self.peek().text == ".":
                self.next()
        self.expect("OP", "}")
        return tmpl

    def _construct(self) -> Query:
        self.next()
        tmpl = self._template()
        self.eat_kw("WHERE")
        where = self.group()
        return Query("construct", True, [], [], [], where, tmpl)

    def _delete(self) -> Query:
        self.next()
        self.eat_kw("DATA")
        tmpl = self._template()
        self.eat_kw("WHERE")
        where = self.group()
        return Query("delete", True, [], [], [], where, tmpl)

    def _insert(self) -> Query:
        """INSERT DATA { ground triples } or INSERT { template } WHERE
        { patterns } — the update-surface complement of DELETE (the
        reference's `update` command accepts both, ui.py:544-560)."""
        self.next()
        if self.eat_kw("DATA"):
            tmpl = self._template()
            for entry in tmpl:
                if any(_is_var(x) for x in entry[:3]):
                    raise SparqlError(
                        "INSERT DATA requires ground triples "
                        f"(got {entry[:3]})")
            return Query("insert", True, [], [], [], Group(), tmpl)
        tmpl = self._template()
        if not self.at_kw("WHERE") and not (
                self.peek().kind == "OP" and self.peek().text == "{"):
            raise SparqlError("INSERT with variables needs WHERE")
        self.eat_kw("WHERE")
        where = self.group()
        return Query("insert", True, [], [], [], where, tmpl)

    # -- graph groups ------------------------------------------------------
    def group(self) -> Group:
        self.expect("OP", "{")
        g = Group()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.text == "}":
                self.next()
                return g
            if t.kind == "EOF":
                raise SparqlError("unterminated group")
            if t.kind == "OP" and t.text == "{":
                nt = self.peek(1)
                if nt.kind == "NAME" and nt.text.upper() == "SELECT":
                    # nested subquery: { SELECT ... WHERE {...} ... }
                    self.next()
                    sq = self._select(sub=True)
                    self.expect("OP", "}")
                    if self.at_kw("UNION"):
                        raise SparqlError(
                            "UNION over subqueries not supported")
                    g.subqueries.append(sq)
                else:
                    # sub-group; UNION chain if followed by UNION
                    branches = [self.group()]
                    while self.at_kw("UNION"):
                        self.next()
                        branches.append(self.group())
                    g.unions.append(branches)
            elif self.at_kw("OPTIONAL"):
                self.next()
                g.optionals.append(self.group())
            elif self.at_kw("MINUS"):
                self.next()
                g.minus.append((self.group(), "minus"))
            elif self.at_kw("FILTER"):
                self.next()
                if self.at_kw("NOT"):
                    self.next()
                    if not self.eat_kw("EXISTS"):
                        raise SparqlError("FILTER NOT without EXISTS")
                    g.minus.append((self.group(), "not_exists"))
                elif self.at_kw("EXISTS"):
                    self.next()
                    g.minus.append((self.group(), "exists"))
                else:
                    g.filters.extend(self._filter_expr())
            elif self.at_kw("BIND"):
                self.next()
                g.binds.append(self._bind())
            elif self.at_kw("VALUES"):
                self.next()
                g.values.append(self._values())
            else:
                s, _ = self.term()
                p = self.path()
                o, _ = self.term()
                g.patterns.append((s, p, o))
            if self.peek().kind == "OP" and self.peek().text == ".":
                self.next()

    def _bind(self) -> Tuple[str, str]:
        self.expect("OP", "(")
        t = self.next()
        if t.kind == "VAR":
            expr = "?" + t.text[1:]
        elif t.kind == "NAME" and t.text.upper() in ("YEAR", "MONTH", "DAY"):
            fn = t.text.upper()
            self.expect("OP", "(")
            v = self.expect("VAR").text[1:]
            self.expect("OP", ")")
            expr = f"{fn}(?{v})"
        else:
            raise SparqlError(f"unsupported BIND expression at {t.pos}")
        self._expect_as()
        alias = self.expect("VAR").text[1:]
        self.expect("OP", ")")
        return alias, expr

    def _values(self) -> Tuple[List[str], List[tuple]]:
        names: List[str] = []
        if self.peek().kind == "VAR":
            names = [self.next().text[1:]]
            single = True
        else:
            self.expect("OP", "(")
            while self.peek().kind == "VAR":
                names.append(self.next().text[1:])
            self.expect("OP", ")")
            single = False
        self.expect("OP", "{")
        rows: List[tuple] = []
        while not (self.peek().kind == "OP" and self.peek().text == "}"):
            if single:
                v, _ = self.term()
                rows.append((v,))
            else:
                self.expect("OP", "(")
                row = []
                while not (self.peek().kind == "OP"
                           and self.peek().text == ")"):
                    v, _ = self.term()
                    row.append(v)
                self.expect("OP", ")")
                if len(row) != len(names):
                    raise SparqlError("VALUES row arity mismatch")
                rows.append(tuple(row))
        self.expect("OP", "}")
        return names, rows

    # -- filter expressions ------------------------------------------------
    def _filter_expr(self) -> List[tuple]:
        """FILTER body -> engine filter entries (a conjunction list;
        disjunctions compile to ONE ('or', [conj, ...]) entry by DNF)."""
        dnf = self._or_expr()
        return _dnf_to_engine(dnf)

    def _or_expr(self) -> List[List[tuple]]:
        """Returns DNF: list of conjunction lists of engine clauses."""
        left = self._and_expr()
        while self.peek().kind == "OP" and self.peek().text == "||":
            self.next()
            left = left + self._and_expr()
        return left

    def _and_expr(self) -> List[List[tuple]]:
        left = self._atom()
        while self.peek().kind == "OP" and self.peek().text == "&&":
            self.next()
            right = self._atom()
            left = [lc + rc for lc in left for rc in right]
        return left

    def _atom(self) -> List[List[tuple]]:
        t = self.peek()
        if t.kind == "OP" and t.text == "(":
            self.next()
            inner = self._or_expr()
            self.expect("OP", ")")
            return inner
        if t.kind == "OP" and t.text == "!":
            self.next()
            if not self.at_kw("BOUND"):
                raise SparqlError(
                    f"'!' supported only before BOUND (offset {t.pos})")
            self.next()
            self.expect("OP", "(")
            v = self.expect("VAR").text[1:]
            self.expect("OP", ")")
            return [[("?" + v, "bound", False)]]
        if self.at_kw("BOUND"):
            self.next()
            self.expect("OP", "(")
            v = self.expect("VAR").text[1:]
            self.expect("OP", ")")
            return [[("?" + v, "bound", True)]]
        if self.at_kw("REGEX"):
            self.next()
            self.expect("OP", "(")
            v = self.expect("VAR").text[1:]
            self.expect("OP", ",")
            pat_tok = self.next()
            if pat_tok.kind != "STRING":
                raise SparqlError(
                    f"REGEX pattern must be a literal (offset {pat_tok.pos})")
            rx = _unquote(pat_tok.text)
            if self.peek().kind == "OP" and self.peek().text == ",":
                self.next()
                flags = _unquote(self.expect("STRING").text)
                if "i" in flags:
                    rx = "(?i)" + rx
            self.expect("OP", ")")
            return [[("?" + v, "~", rx)]]
        # comparison: operand OP operand
        lhs = self._operand()
        op_tok = self.next()
        if op_tok.kind == "NAME" and op_tok.text.upper() == "IN":
            self.expect("OP", "(")
            vals = []
            while not (self.peek().kind == "OP" and self.peek().text == ")"):
                v, _ = self._literal()
                vals.append(str(v))
                if self.peek().kind == "OP" and self.peek().text == ",":
                    self.next()
            self.expect("OP", ")")
            return [[(lhs, "in", vals)]]
        if not (op_tok.kind == "OP" and op_tok.text in
                ("=", "!=", "<", "<=", ">", ">=")):
            raise SparqlError(
                f"unsupported filter operator {op_tok.text!r} at "
                f"{op_tok.pos}")
        t2 = self.peek()
        if t2.kind == "VAR":
            self.next()
            return [[(lhs, op_tok.text, "?" + t2.text[1:])]]
        val, _ = self._literal()
        return [[(lhs, op_tok.text, val)]]

    def _operand(self) -> str:
        t = self.next()
        if t.kind == "VAR":
            return "?" + t.text[1:]
        if t.kind == "NAME" and t.text.upper() in ("YEAR", "MONTH", "DAY"):
            fn = t.text.upper()
            self.expect("OP", "(")
            v = self.expect("VAR").text[1:]
            self.expect("OP", ")")
            return f"{fn}(?{v})"
        raise SparqlError(f"unsupported filter operand {t.text!r} at {t.pos}")

    def _literal(self):
        t = self.next()
        if t.kind == "STRING":
            lex = _unquote(t.text)
            if self.peek().kind == "DCARET":
                self.next()
                self.next()  # datatype: store is lexical, compare lexically
            return lex, model.DT_PLAIN
        if t.kind == "NUM":
            return (float(t.text) if "." in t.text else int(t.text)), None
        if t.kind == "PNAME":
            return self._pname(t.text), model.DT_URI
        raise SparqlError(f"expected literal at offset {t.pos}, "
                          f"got {t.text!r}")


def _mirror_cols(t: pa.Table, pairs) -> pa.Table:
    """Append, for each (alias, source) pair, a copy of ``source``
    named ``alias`` (the equality-edge join bridge)."""
    for alias, src in pairs:
        t = t.append_column(alias, t.column(src))
    return t


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", lambda m: {"n": "\n", "t": "\t", "r": "\r"}.get(
        m.group(1), m.group(1)), body)


def _dnf_to_engine(dnf: List[List[tuple]]) -> List[tuple]:
    if len(dnf) == 1:
        return list(dnf[0])
    # single-var all-equality disjunction -> 'in'
    if all(len(c) == 1 and c[0][1] == "=" and isinstance(c[0][2], str)
           and not c[0][2].startswith("?") for c in dnf):
        vars_ = {c[0][0] for c in dnf}
        if len(vars_) == 1:
            return [(dnf[0][0][0], "in", [c[0][2] for c in dnf])]
    return [("or", [list(c) for c in dnf])]


def parse_sparql(text: str, *, params: Optional[Dict[str, object]] = None
                 ) -> Query:
    """Parse SPARQL text (after ``params`` macro substitution — the
    reference's ``__YEAR__``-style templating, ui.py:1315)."""
    for k, v in (params or {}).items():
        text = text.replace(k, str(v))
    return _Parser(text).parse()


# ---------------------------------------------------------------------------
# compile: path-rewrite the tree, assign flat hit indices


@dataclass
class _Prim:
    idx: int
    pat: Tuple[str, str, str]


@dataclass
class _Node:
    prims: List[_Prim] = field(default_factory=list)
    optionals: List["_Node"] = field(default_factory=list)
    unions: List[List["_Node"]] = field(default_factory=list)
    minus: List[Tuple["_Node", str]] = field(default_factory=list)
    filters: List[tuple] = field(default_factory=list)
    binds: List[Tuple[str, str]] = field(default_factory=list)
    values: List[Tuple[List[str], List[tuple]]] = field(default_factory=list)
    subqueries: List[Tuple["Query", "_Node"]] = field(default_factory=list)


class _Compiler:
    def __init__(self):
        self.flat: List[Tuple[str, str, str]] = []
        self.n_tags = 0

    def compile(self, g: Group) -> _Node:
        node = _Node(filters=list(g.filters), binds=list(g.binds),
                     values=list(g.values))
        for pat in g.patterns:
            self.n_tags += 1
            for prim in _rewrite_one(pat, f"__sp{self.n_tags}"):
                node.prims.append(_Prim(len(self.flat), prim))
                self.flat.append(prim)
        node.optionals = [self.compile(o) for o in g.optionals]
        node.unions = [[self.compile(b) for b in block] for block in g.unions]
        node.minus = [(self.compile(m), mode) for m, mode in g.minus]
        # subqueries share THIS compiler, so their patterns ride the
        # same single _tagged_hits graph scan as the enclosing query
        node.subqueries = [(sq, self.compile(sq.where))
                           for sq in g.subqueries]
        return node


def _merge_flat(a: _Node, b: _Node) -> _Node:
    return _Node(prims=a.prims + b.prims,
                 optionals=a.optionals + b.optionals,
                 unions=a.unions + b.unions,
                 minus=a.minus + b.minus,
                 filters=a.filters + b.filters,
                 binds=a.binds + b.binds,
                 values=a.values + b.values,
                 subqueries=a.subqueries + b.subqueries)


def _variants(node: _Node) -> List[_Node]:
    """Expand every UNION block: the cross product of branch choices,
    each merged into a union-free conjunctive variant."""
    base = _Node(prims=node.prims, optionals=node.optionals,
                 minus=node.minus, filters=node.filters,
                 binds=node.binds, values=node.values,
                 subqueries=node.subqueries)
    out = [base]
    for block in node.unions:
        branch_vs = [v for br in block for v in _variants(br)]
        out = [_merge_flat(cur, bv)
               for cur in out for bv in branch_vs]
    return out


# ---------------------------------------------------------------------------
# executor


def _node_vars(n: _Node) -> set:
    vs = set()
    for pr in n.prims:
        vs |= set(_vars_of(pr.pat))
    for o in n.optionals:
        vs |= _node_vars(o)
    for block in n.unions:
        for br in block:
            vs |= _node_vars(br)
    for names, _ in n.values:
        vs |= set(names)
    for sq, _ in n.subqueries:
        vs |= set(sq.proj)
    vs |= {a for a, _ in n.binds}
    return vs


class _Evaluator:
    def __init__(self, hits, num_partitions: int):
        self.hits = hits
        self.np = num_partitions
        self._tbl_cache: dict = {}
        # a hit set below the local gate collects ONCE; every
        # non-path pattern then shapes its bindings with pure Arrow —
        # zero Ray executions per pattern (path patterns still go
        # through the distributed closure)
        self._local_hits = None
        if hits.count() <= _LOCAL_FOLD_LIMIT:
            parts = [pa.Table.from_batches([b])
                     if isinstance(b, pa.RecordBatch) else b
                     for b in hits.iter_batches(batch_format="pyarrow",
                                                batch_size=None)]
            parts = [p for p in parts if p.num_rows]
            if parts:
                self._local_hits = pa.concat_tables(parts).combine_chunks()
            else:
                from octoray.patterns import _TRIPLE_OUT_SCHEMA

                self._local_hits = _TRIPLE_OUT_SCHEMA.append(
                    pa.field("_pat", pa.int32())).empty_table()

    def tbl(self, prim: _Prim):
        # UNION variants share most of their primitive patterns: cache
        # the materialized per-pattern binding table by hit index so a
        # 4-branch union pays each pattern's shaping pass once.  Small
        # tables are cached DRIVER-LOCAL so the folds run Acero with
        # no Ray execution per step.
        hit = self._tbl_cache.get(prim.idx)
        if hit is not None:
            return hit
        s_, p_, o_ = prim.pat
        is_path = not _is_var(p_) and p_[-1] in "+*?"
        if self._local_hits is not None and not is_path:
            from octoray.patterns import _shape_hit_table

            out = _shape_hit_table(self._local_hits, prim.idx, prim.pat)
            # all-string, like _collect_string_table guarantees
            out = pa.table({n: pa.compute.cast(out.column(n), pa.string())
                            for n in out.column_names})
        else:
            from octoray.util import drop_empty_blocks

            ds = _bindings_from_hits(self.hits, prim.idx, prim.pat)
            out = _localize(drop_empty_blocks(ds.materialize(),
                                              _binding_schema(prim.pat)))
        self._tbl_cache[prim.idx] = out
        return out

    def group(self, node: _Node):
        """-> (bindings Dataset, colset incl. hidden __dt columns).
        Hidden path variables (__sp*) are dropped at the group
        boundary."""
        evs = [self._flat(v) for v in _variants(node)]
        if len(evs) == 1:
            ds, cols = evs[0]
        else:
            allcols = sorted(set().union(*(c for _, c in evs)))
            import pyarrow.compute as pc  # noqa: F401

            def align(t: pa.Table, have: tuple, want: tuple) -> pa.Table:
                cols_out = {}
                for c in want:
                    if c in t.column_names:
                        cols_out[c] = pa.compute.cast(t.column(c),
                                                      pa.string())
                    else:
                        cols_out[c] = pa.nulls(t.num_rows, pa.string())
                return pa.table(cols_out)

            want = tuple(allcols)
            if all(isinstance(d, pa.Table) for d, _ in evs):
                # every branch stayed local: bag-union is one concat
                ds = pa.concat_tables(
                    [align(d, (), want) for d, _ in evs]).combine_chunks()
            else:
                from octoray.util import drop_empty_blocks

                aligned = []
                for ds_i, cols_i in evs:
                    ds_i = _lift(ds_i)
                    a = ds_i.map_batches(
                        lambda t, w=want, h=tuple(sorted(cols_i)):
                        align(t, h, w),
                        batch_format="pyarrow")
                    aligned.append(drop_empty_blocks(
                        a.materialize(),
                        pa.schema([(c, pa.string()) for c in allcols])))
                ds = aligned[0].union(*aligned[1:])
            cols = set(allcols)
        hidden = sorted(c for c in cols if c.startswith("__sp"))
        if hidden:
            cols -= set(hidden)
            if isinstance(ds, pa.Table):
                ds = ds.drop_columns(
                    [c for c in hidden if c in ds.column_names])
            else:
                from octoray.util import drop_empty_blocks

                drop = tuple(hidden)
                ds = ds.map_batches(
                    lambda t, d=drop: t.drop_columns(
                        [c for c in d if c in t.column_names]),
                    batch_format="pyarrow")
                ds = drop_empty_blocks(
                    ds.materialize(),
                    pa.schema([(c, pa.string()) for c in sorted(cols)]))
        return ds, cols

    def _subquery(self, sq: "Query", sroot: _Node):
        """Evaluate a nested SELECT: its own group fold, its own
        SELECT head (aggregates / DISTINCT / ORDER / LIMIT), then
        lexicalized to the pattern layer's all-string convention
        (integral numerics render without a decimal point, Arrow's
        shortest-repr cast) and materialized for the fold join."""
        from octoray.util import drop_empty_blocks

        sb, _ = self.group(sroot)
        sds = _finish_select(sq, _lift(sb))
        names = tuple(sq.proj)

        def lex(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({n: pc.cast(t.column(n), pa.string())
                             for n in names})

        out = sds.map_batches(lex, batch_format="pyarrow")
        return drop_empty_blocks(
            out.materialize(),
            pa.schema([(n, pa.string()) for n in names]))

    def _flat(self, v: _Node):
        if not v.prims and not v.subqueries:
            raise SparqlError("group has no triple patterns")
        if not v.prims:
            # subquery-only group: the first subquery's result seeds
            # the fold; the rest join on shared variables
            (sq0, sroot0) = v.subqueries[0]
            bindings = self._subquery(sq0, sroot0)
            bcols = set(sq0.proj)
            return self._tail(v, bindings, bcols, sub_start=1)
        # FILTER (?a = ?b) between otherwise-disconnected patterns is a
        # join in SPARQL (cartesian-then-filter); the engine refuses
        # cartesians, so such an equality acts as a JOIN EDGE: the new
        # pattern's ?b column is mirrored under ?a's name and the fold
        # becomes an equi-join — never a product
        eq_edges = [(f[0][1:], f[2][1:]) for f in v.filters
                    if len(f) == 3 and f[1] == "="
                    and isinstance(f[0], str) and f[0].startswith("?")
                    and isinstance(f[2], str) and f[2].startswith("?")]

        def bridge(bound: set, pvars: set):
            """Equality edges connecting bound vars to pattern vars ->
            [(bound_var, pattern_var)]."""
            out = []
            for a, b in eq_edges:
                if a in bound and b in pvars:
                    out.append((a, b))
                elif b in bound and a in pvars:
                    out.append((b, a))
            return out

        # greedy connectivity order over the primitive patterns
        remaining = list(v.prims)
        ordered = [remaining.pop(0)]
        bound = set(_vars_of(ordered[0].pat))
        while remaining:
            for i, pr in enumerate(remaining):
                pv = set(_vars_of(pr.pat))
                if (bound & pv) or bridge(bound, pv):
                    bound |= pv
                    ordered.append(remaining.pop(i))
                    break
            else:
                raise SparqlError(
                    f"disconnected pattern group: "
                    f"{[p.pat for p in remaining]} shares no variable with "
                    f"{sorted(bound)} — refuse the cartesian product")
        bindings = self.tbl(ordered[0])
        bcols = set(_vars_of(ordered[0].pat))
        if _is_var(ordered[0].pat[2]):
            bcols.add(ordered[0].pat[2][1:] + "__dt")
        for pr in ordered[1:]:
            tbl = self.tbl(pr)
            pvars = list(_vars_of(pr.pat))
            if not (bcols & set(pvars)):
                pairs = tuple(bridge(bcols, set(pvars)))
                if isinstance(tbl, pa.Table):
                    tbl = _mirror_cols(tbl, pairs)
                else:
                    from octoray.util import drop_empty_blocks

                    tbl = tbl.map_batches(
                        lambda t, ps=pairs: _mirror_cols(t, ps),
                        batch_format="pyarrow")
                    names = list(_binding_schema(pr.pat).names) + \
                        [a for a, _ in pairs]
                    tbl = drop_empty_blocks(
                        tbl.materialize(),
                        pa.schema([(n, pa.string()) for n in names]))
                pvars = pvars + [a for a, _ in pairs]
            bindings = _fold_join_any(bindings, bcols, tbl,
                                      pvars, how="inner",
                                      num_partitions=self.np)
            bcols |= set(pvars)
            if _is_var(pr.pat[2]):
                bcols.add(pr.pat[2][1:] + "__dt")
        return self._tail(v, bindings, bcols)

    def _tail(self, v: _Node, bindings, bcols: set, *, sub_start: int = 0):
        """The group fold's non-pattern members, in SPARQL join order:
        VALUES, subqueries (inner join on shared variables), OPTIONAL,
        MINUS / [NOT] EXISTS, BIND, FILTER."""
        for names, rows in v.values:
            bindings = values_bindings(_lift(bindings), names, rows)
            bcols |= set(names)
        for sq, sroot in v.subqueries[sub_start:]:
            sds = self._subquery(sq, sroot)
            bindings = _fold_join_any(bindings, bcols, sds, list(sq.proj),
                                      how="inner", num_partitions=self.np)
            bcols |= set(sq.proj)
        for opt in v.optionals:
            gds, gcols = self.group(opt)
            gvars = sorted(c for c in gcols if not c.endswith("__dt"))
            bindings = _fold_join_any(bindings, bcols, gds, gvars,
                                      how="left_outer",
                                      num_partitions=self.np)
            bcols |= gcols
        for mnode, mode in v.minus:
            ids_, _ = self.group(mnode)
            bindings = anti_bindings(_lift(bindings), _lift(ids_),
                                     mode=mode, num_partitions=self.np)
        if v.binds:
            bindings = extend_bindings(_lift(bindings), v.binds)
            bcols |= {a for a, _ in v.binds}
        if v.filters:
            bindings = apply_filters(_lift(bindings), v.filters)
        return bindings, bcols


def execute(q: Query, triples, *, num_partitions: int = 8):
    """Run a parsed query against a triple Dataset.

    SELECT -> bindings Dataset with the SELECT head's columns in
    declared order; CONSTRUCT, DELETE and INSERT -> the instantiated
    (deduped) template triples (for DELETE the retraction set, for
    INSERT the assertion set — apply them with ``pipelines.update``;
    see :func:`delete_via_file` / :func:`insert_via_file`)."""
    if q.form == "describe" and not q.where.patterns \
            and not q.where.unions:
        # constants-only DESCRIBE: no pattern evaluation needed
        return _describe_subjects(
            triples, None, [t[0] for t in q.template],
            num_partitions=num_partitions)
    if q.form == "insert" and not q.where.patterns \
            and not q.where.unions and not q.where.subqueries:
        # INSERT DATA: the ground template IS the result set
        import ray.data as rd

        from octoray.model import DT_PLAIN, triples_to_table
        from octoray.stages.canon import dedup_triples

        rows = [(e[0], e[1], e[2], e[3] if len(e) == 4 else DT_PLAIN)
                for e in q.template]
        return dedup_triples(rd.from_arrow(triples_to_table(sorted(rows))))
    comp = _Compiler()
    root = comp.compile(q.where)
    hits = _tagged_hits(triples, comp.flat)
    ev = _Evaluator(hits, num_partitions)
    b, bcols = ev.group(root)
    b = _lift(b)
    if q.form == "ask":
        import ray.data as rd

        hit = b.limit(1).count() > 0
        return rd.from_arrow(pa.table({"ask": pa.array([hit])}))
    if q.form == "describe":
        consts = [t[0] for t in q.template]
        vals = None
        if q.proj:
            vals = b.select_columns(list(q.proj))
        return _describe_subjects(triples, vals, consts,
                                  num_partitions=num_partitions)
    if q.form in ("construct", "delete", "insert"):
        return instantiate_template(b, q.template, dedup=True)
    return _finish_select(q, b)


def _finish_select(q: Query, b):
    """SELECT head over an evaluated bindings Dataset: aggregates (or
    the implicit single group), HAVING, projection, DISTINCT, ORDER
    BY / LIMIT — shared by top-level SELECTs and nested subqueries."""
    if q.aggs:
        missing = [p for p in q.proj
                   if p not in q.group_by
                   and p not in [a for _, _, a in q.aggs]]
        if missing:
            raise SparqlError(
                f"bare SELECT variables {missing} are neither grouped "
                f"nor aggregated")
        if not q.group_by:
            # implicit single group: one solution row over everything
            out = aggregate_all(b, q.aggs, sep=q.sep)
        else:
            aggs = [(q.group_by[0] if v == "*" else v, fn, alias)
                    for v, fn, alias in q.aggs]
            out = aggregate_bindings(b, q.group_by, aggs, sep=q.sep)
        if q.having:
            # HAVING: the same vectorized filter machinery over the
            # aggregate output (aliases are the columns; numeric
            # aggregates compare natively)
            out = apply_filters(out, q.having)
        out = out.select_columns(q.proj)
        return _modifiers(out, q)
    out = select_bindings(b, q.proj)
    if q.distinct:
        from octoray.query import distinct_values

        out = distinct_values(out, q.proj)
    return _modifiers(out, q)


def _modifiers(out, q: Query):
    """ORDER BY / LIMIT / OFFSET solution modifiers (one range sort;
    LIMIT streams through Ray's native limit operator; OFFSET drops
    the leading rows of the ordered stream via split_at_indices —
    LIMIT counts AFTER the offset per SPARQL 1.1)."""
    if q.order_by:
        out = out.sort([v for v, _ in q.order_by],
                       descending=[not asc for _, asc in q.order_by])
    if q.offset:
        out = out.split_at_indices([q.offset])[1]
    if q.limit is not None:
        out = out.limit(q.limit)
    return out


def _describe_subjects(triples, vals, consts, *, num_partitions: int):
    """DESCRIBE semantics: every graph triple whose SUBJECT is one of
    the described terms — the term set is the union of the projected
    binding values and the constant IRIs, deduped distributed and
    semi-joined (stats-gated) against the graph."""
    import ray.data as rd

    from octoray.query import distinct_values, semi_join_auto

    parts = []
    if vals is not None:
        for c in vals.columns():
            parts.append(vals.select_columns([c]).rename_columns(
                {c: "subject"}))
    if consts:
        parts.append(rd.from_arrow(pa.table(
            {"subject": pa.array(consts, pa.string())})))
    keys = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    keys = distinct_values(keys, ["subject"]).materialize()
    return semi_join_auto(triples, "subject", keys,
                          num_partitions=num_partitions)


def run_file(triples, path: str, *,
             params: Optional[Dict[str, object]] = None,
             num_partitions: int = 8):
    """Parse + execute a ``.rq`` file against a triple Dataset."""
    with open(path) as fh:
        q = parse_sparql(fh.read(), params=params)
    return execute(q, triples, num_partitions=num_partitions)


def delete_via_file(store_dir: str, text: str, *,
                    params: Optional[Dict[str, object]] = None) -> dict:
    """Apply a DELETE-form query to a built graph store.

    Two physical plans, picked by template shape:

    * **whole-predicate fast path** — most reference templates
      (delete-subtypes.rq etc.) are ``?s f:p ?o`` with the template
      equal to the WHERE pattern: a static predicate filter, applied
      via the store layer's statistics-pruned partition rewrite
      (``delete_where(predicates=...)``), no query evaluation at all;
    * **general pattern-bound path** — anything else (e.g. the
      reference's delete-motifs.rq, whose template predicate is a
      VARIABLE bound through a join): evaluate the WHERE with the
      pattern layer, instantiate the template, and retract the
      resulting exact triple set (``delete_exact``)."""
    from octoray.pipelines.update import delete_exact, delete_where

    q = parse_sparql(text, params=params)
    if q.form != "delete":
        raise SparqlError("not a DELETE query")
    preds = []
    # the fast path is ONLY safe when the WHERE is a bare BGP: any
    # other clause (VALUES, MINUS / FILTER [NOT] EXISTS, subquery,
    # BIND, ...) constrains the solution set, and taking the
    # whole-predicate shortcut would retract unmatched triples too.
    simple = not (q.where.optionals or q.where.filters or q.where.unions
                  or q.where.minus or q.where.values
                  or q.where.subqueries or q.where.binds)
    wpats = {(s, p, o) for s, p, o in q.where.patterns}
    for entry in q.template:
        s, p, o = entry[0], entry[1], entry[2]
        if (simple and _is_var(s) and _is_var(o) and not _is_var(p)
                and (s, p, o) in wpats):
            preds.append(p)
        else:
            preds = None
            break
    # the fast path is only whole-predicate when the WHERE adds no
    # extra constraint beyond the template patterns themselves
    if preds is not None and len(wpats) == len(q.template):
        return delete_where(store_dir, predicates=preds)
    from octoray.pipelines.pull import read_graph

    bound = execute(q, read_graph(store_dir))
    return delete_exact(store_dir, bound)


def insert_via_file(store_dir: str, text: str, *,
                    params: Optional[Dict[str, object]] = None) -> dict:
    """Apply an INSERT-form query to a built graph store: evaluate it
    (pattern INSERTs run against the store itself; INSERT DATA is the
    ground template), then land the result in a content-addressed
    ``shard=insert-<md5>`` partition — idempotent, like `upload`."""
    from octoray.pipelines.pull import read_graph
    from octoray.pipelines.update import land_triples

    q = parse_sparql(text, params=params)
    if q.form != "insert":
        raise SparqlError("not an INSERT query")
    out = execute(q, read_graph(store_dir))
    return land_triples(store_dir, out, prefix="insert")
