"""Turtle source: ``.ttl`` files -> canonical triple Dataset.

The reference's ``upload`` command (ui.py:561-589) loads Turtle files
into the store via rdflib; the Ray shape here is ``read_binary_files
-> per-file parse inside map_batches -> (subject, predicate, object,
object_datatype) rows`` — files are the parallelism unit, exactly the
FASTA / WARC source pattern.  IRIs are re-abbreviated against the
engine's canonical ``model.PREFIXES`` (the same normalization the
SPARQL front end applies), so any local prefix naming lands in the
stored representation and a sink->source roundtrip is identity.

Grammar subset — covers this engine's own sink output
(``sinks.write_turtle``) and rdflib's default turtle serialization:

  @prefix / PREFIX declarations; statements with ``;``
  predicate-object lists and ``,`` object lists; prefixed names;
  ``<IRI>`` terms; the ``a`` keyword; quoted literals — single- or
  double-quoted, short or TRIPLE-quoted (raw newlines preserved) —
  with the N-Triples short escapes (\\" \\\\ \\n \\t \\r \\uXXXX
  \\UXXXXXXXX) and optional ``^^datatype`` or ``@lang`` (language
  tags are DROPPED — the store is lexical, mirroring the emitter);
  labelled blank nodes ``_:name`` as subject or object (labels kept
  verbatim — deterministic and roundtrippable; labels are file-scoped
  in the spec, so cross-file label reuse merges, as with any skolem
  scheme); ANONYMOUS blank nodes ``[ pred obj ; ... ]`` as subject or
  object, including nesting — skolemized to labels derived from the
  enclosing statement's source text, so parallel piece-parsing yields
  byte-identical graphs; collections ``( ... )`` as rdf:List cons
  cells (rdf:first/rdf:rest/rdf:nil) on the same skolem scheme;
  ``@base``/``BASE`` with RFC 3986 relative-IRI resolution (urljoin);
  ``#`` comments.

This is the full everyday Turtle surface; the one deliberate
difference from rdflib is the lexical store itself (language tags
dropped, datatypes kept as written).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from octoray.model import DT_PLAIN, DT_URI, PREFIXES

_TOKEN_RE = re.compile(
    r"""
      (?P<WS>\s+)
    | (?P<COMMENT>\#[^\n]*)
    | (?P<LONGSTRING>\"{3}(?:[^"\\]|\\.|"{1,2}(?!"))*\"{3}
                    |'{3}(?:[^'\\]|\\.|'{1,2}(?!'))*'{3})
    | (?P<STRING>"(?:[^"\\\n]|\\.)*"
                |'(?:[^'\\\n]|\\.)*')
    | (?P<IRI><[^<>\s]*>)
    | (?P<DCARET>\^\^)
    | (?P<AT>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<BNODE>_:[\w-]+)
    | (?P<PNAME>[A-Za-z_][\w-]*:(?:[\w%+-]|\.(?=[\w%+-]))*)
    | (?P<NUM>[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<NAME>[A-Za-z_][\w-]*)
    | (?P<PUNCT>[;,.()\[\]])
    """,
    re.VERBOSE,
)

_ESC_RE = re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|[tbnrf\"'\\])")
_ESC_MAP = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
            '"': '"', "'": "'", "\\": "\\"}


class TurtleError(ValueError):
    pass


def _unescape(body: str) -> str:
    def sub(m: "re.Match") -> str:
        e = m.group(1)
        if e[0] in "uU":
            return chr(int(e[1:], 16))
        return _ESC_MAP[e]

    return _ESC_RE.sub(sub, body)


_ABBREV_CACHE: dict = {}


def _abbrev(iri: str) -> str:
    """Full IRI -> engine prefix form via the longest canonical base
    (the SPARQL front end's normalization).  Memoized: web-scale
    graphs repeat a small IRI vocabulary millions of times and the
    prefix scan was the parser's second-hottest loop; the cache is
    capped so a pathological all-distinct-IRI document stays bounded."""
    hit = _ABBREV_CACHE.get(iri)
    if hit is not None:
        return hit
    best = None
    for pfx, base in PREFIXES.items():
        if iri.startswith(base) and (best is None or len(base) > len(best[1])):
            best = (pfx, base)
    out = best[0] + ":" + iri[len(best[1]):] if best else iri
    if len(_ABBREV_CACHE) > 1_000_000:
        _ABBREV_CACHE.clear()
    _ABBREV_CACHE[iri] = out
    return out


class _Lexer:
    def __init__(self, text: str):
        # finditer keeps the scan loop in C; the contiguity check
        # restores match()'s tokenize-everything guarantee (finditer
        # would silently skip an unlexable gap)
        self.toks: List[Tuple[str, str, int]] = []
        append = self.toks.append
        pos = 0
        for m in _TOKEN_RE.finditer(text):
            if m.start() != pos:
                raise TurtleError(
                    f"cannot tokenize at offset {pos}: "
                    f"{text[pos:pos + 30]!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind == "WS" or kind == "COMMENT":
                continue
            append((kind, m.group(), m.start()))
        if pos != len(text):
            raise TurtleError(
                f"cannot tokenize at offset {pos}: "
                f"{text[pos:pos + 30]!r}")
        self.toks.append(("EOF", "", len(text)))
        self.i = 0

    def peek(self) -> Tuple[str, str, int]:
        return self.toks[self.i]

    def next(self) -> Tuple[str, str, int]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, text: Optional[str] = None):
        t = self.next()
        if t[0] != kind or (text is not None and t[1] != text):
            raise TurtleError(
                f"expected {text or kind} at offset {t[2]}, got {t[1]!r}")
        return t


_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def parse_turtle_text(text: str) -> List[Tuple[str, str, str, str]]:
    """Turtle document -> [(s, p, o, dt)] rows, prefix-normalized."""
    lx = _Lexer(text)
    prefixes: Dict[str, str] = {}
    base: List[Optional[str]] = [None]
    rows: List[Tuple[str, str, str, str]] = []

    def resolve_iri(raw: str, pos: int) -> str:
        """<...> content -> absolute IRI: relative references resolve
        against the in-scope @base per RFC 3986 (urljoin)."""
        if _SCHEME_RE.match(raw):
            return raw
        if base[0] is None:
            raise TurtleError(
                f"relative IRI <{raw}> at offset {pos} with no @base "
                "in scope")
        from urllib.parse import urljoin

        return urljoin(base[0], raw)

    def resolve_pname(txt: str) -> str:
        pfx, _, local = txt.partition(":")
        if pfx in prefixes:
            return _abbrev(prefixes[pfx] + local)
        # no file-level declaration: assume it is already engine form
        return txt

    def iri_term() -> str:
        kind, txt, pos = lx.next()
        if kind == "IRI":
            return _abbrev(resolve_iri(txt[1:-1], pos))
        if kind == "PNAME":
            return resolve_pname(txt)
        if kind == "NAME" and txt == "a":
            return "rdf:type"
        raise TurtleError(f"expected IRI term at offset {pos}, "
                          f"got {txt!r}")

    # anonymous blank nodes: triples inside [ ... ] land in the current
    # statement's buffer under a placeholder; when the statement's '.'
    # is reached the placeholder becomes a DETERMINISTIC label derived
    # from the statement's own text (md5 of the exact source slice +
    # position) — identical whether the statement is parsed from the
    # whole file or from a splitter piece, so parallel parsing yields
    # byte-identical graphs.  (Two byte-identical statements therefore
    # share labels; their triples are lexically identical anyway and
    # collapse in dedup — documented skolemization semantics.)
    stmt_rows: List[Tuple[str, str, str, str]] = []
    anon_n = [0]

    def anon_node() -> str:
        lx.expect("PUNCT", "[")
        ph = f"\x00anon{anon_n[0]}\x00"
        anon_n[0] += 1
        if not (lx.peek()[0] == "PUNCT" and lx.peek()[1] == "]"):
            predicate_object_list(ph)
        lx.expect("PUNCT", "]")
        return ph

    def collection() -> Tuple[str, str]:
        """( o1 o2 ... ) -> rdf:List cons cells on skolem anon nodes
        (rdf:first/rdf:rest/rdf:nil); () is rdf:nil itself."""
        lx.expect("PUNCT", "(")
        items: List[Tuple[str, str]] = []
        while not (lx.peek()[0] == "PUNCT" and lx.peek()[1] == ")"):
            if lx.peek()[0] == "EOF":
                raise TurtleError("unterminated collection")
            items.append(object_term())
        lx.expect("PUNCT", ")")
        if not items:
            return "rdf:nil", DT_URI
        cells = []
        for _ in items:
            cells.append(f"\x00anon{anon_n[0]}\x00")
            anon_n[0] += 1
        for idx, ((obj, dt), cell) in enumerate(zip(items, cells)):
            stmt_rows.append((cell, "rdf:first", obj, dt))
            nxt = cells[idx + 1] if idx + 1 < len(cells) else "rdf:nil"
            stmt_rows.append((cell, "rdf:rest", nxt, DT_URI))
        return cells[0], DT_URI

    def subject_term() -> str:
        # labelled blank node allowed as subject; label kept verbatim
        if lx.peek()[0] == "BNODE":
            return lx.next()[1]
        if lx.peek()[0] == "PUNCT" and lx.peek()[1] == "[":
            return anon_node()
        if lx.peek()[0] == "PUNCT" and lx.peek()[1] == "(":
            return collection()[0]
        return iri_term()

    def object_term() -> Tuple[str, str]:
        kind, txt, pos = lx.peek()
        if kind == "BNODE":
            # a graph edge to a labelled blank node — URI-typed like
            # any other node-valued object (the store is lexical)
            lx.next()
            return txt, DT_URI
        if kind == "PUNCT" and txt == "[":
            return anon_node(), DT_URI
        if kind == "PUNCT" and txt == "(":
            return collection()
        if kind == "LONGSTRING":
            lx.next()
            val = _unescape(txt[3:-3])  # raw newlines preserved
            k2, t2, _ = lx.peek()
            if k2 == "DCARET":
                lx.next()
                return val, iri_term()
            if k2 == "AT":
                lx.next()  # language tag dropped — the store is lexical
            return val, DT_PLAIN
        if kind == "NUM":
            # rdflib writes xsd numerics in bare form; keep the lexical
            # value, recover the datatype from the shape
            lx.next()
            if re.fullmatch(r"[+-]?\d+", txt):
                return txt, "xsd:integer"
            if "e" in txt or "E" in txt:
                return txt, "xsd:double"
            return txt, "xsd:decimal"
        if kind == "NAME" and txt in ("true", "false"):
            lx.next()
            return txt, "xsd:boolean"
        if kind == "STRING":
            lx.next()
            val = _unescape(txt[1:-1])
            k2, t2, _ = lx.peek()
            if k2 == "DCARET":
                lx.next()
                return val, iri_term()
            if k2 == "AT":
                lx.next()  # language tag dropped — the store is lexical
            return val, DT_PLAIN
        return iri_term(), DT_URI

    def predicate_object_list(subj: str) -> None:
        while True:
            pred = iri_term()
            while True:
                obj, dt = object_term()
                stmt_rows.append((subj, pred, obj, dt))
                if lx.peek()[0] == "PUNCT" and lx.peek()[1] == ",":
                    lx.next()
                    continue
                break
            k2, t2, _ = lx.peek()
            if k2 == "PUNCT" and t2 == ";":
                lx.next()
                # rdflib emits trailing ';' before '.' / ']'; tolerate
                if lx.peek()[0] == "PUNCT" and lx.peek()[1] in ".]":
                    break
                continue
            break

    def flush_statement(stmt_start: int, dot_pos: int) -> None:
        if anon_n[0]:
            import hashlib

            base = hashlib.md5(
                text[stmt_start:dot_pos + 1].encode("utf-8")).hexdigest()[:12]
            sub = {f"\x00anon{k}\x00": f"_:a{base}n{k}"
                   for k in range(anon_n[0])}
            rows.extend((sub.get(s, s), p, sub.get(o, o), dt)
                        for s, p, o, dt in stmt_rows)
            anon_n[0] = 0
        else:
            rows.extend(stmt_rows)
        stmt_rows.clear()

    while True:
        kind, txt, pos = lx.peek()
        if kind == "EOF":
            break
        if (kind == "AT" and txt.lower() == "@prefix") or \
                (kind == "NAME" and txt.upper() == "PREFIX"):
            sparql_style = kind == "NAME"
            lx.next()
            p = lx.expect("PNAME")[1]
            iri = lx.expect("IRI")
            prefixes[p[:-1] if p.endswith(":") else p.partition(":")[0]] = \
                resolve_iri(iri[1][1:-1], iri[2])
            if not sparql_style:
                lx.expect("PUNCT", ".")
            continue
        if (kind == "AT" and txt.lower() == "@base") or \
                (kind == "NAME" and txt.upper() == "BASE"):
            sparql_style = kind == "NAME"
            lx.next()
            iri = lx.expect("IRI")
            base[0] = resolve_iri(iri[1][1:-1], iri[2]) \
                if base[0] is not None else iri[1][1:-1]
            if not _SCHEME_RE.match(base[0]):
                raise TurtleError(
                    f"@base must be an absolute IRI, got <{base[0]}>")
            if not sparql_style:
                lx.expect("PUNCT", ".")
            continue
        subj = subject_term()
        # `[ props ] .` — an anon SUBJECT's bracket list may be the
        # whole statement (Turtle blankNodePropertyList grammar)
        if not (subj.startswith("\x00") and lx.peek()[0] == "PUNCT"
                and lx.peek()[1] == "."):
            predicate_object_list(subj)
        dot = lx.expect("PUNCT", ".")
        flush_statement(pos, dot[2])
    return rows


def rows_table(rows: List[Tuple[str, str, str, str]]) -> pa.Table:
    return pa.table({
        "subject": pa.array([r[0] for r in rows], pa.string()),
        "predicate": pa.array([r[1] for r in rows], pa.string()),
        "object": pa.array([r[2] for r in rows], pa.string()),
        "object_datatype": pa.array([r[3] for r in rows], pa.string()),
    })


_CHUNK_BYTES = 4 * 1024 * 1024


# quote-aware scanner for the splitter: strings (short AND triple-
# quoted) and comments are consumed atomically, so a `\n` match is
# always a TOP-LEVEL newline — never one inside a """...""" literal
_SAFE_NL_RE = re.compile(
    r'"""(?:[^"\\]|\\.|"{1,2}(?!"))*"""'
    r"|'''(?:[^'\\]|\\.|'{1,2}(?!'))*'''"
    r'|"(?:[^"\\\n]|\\.)*"'
    r"|'(?:[^'\\\n]|\\.)*'"
    r"|<[^<>\s]*>"  # IRIs atomic: '#' in <...#frag> is NOT a comment
    r"|#[^\n]*"
    r"|\n")


def _split_statements(text: str, target: int) -> List[str]:
    """Split a Turtle document into independently-parseable pieces of
    roughly ``target`` bytes, each carrying the directive header.

    A piece boundary is only placed at a TOP-LEVEL newline whose line
    ends (stripped) with '.' — the statement/directive terminator.
    Top-level-ness is decided by ``_SAFE_NL_RE``, which consumes
    string literals (including triple-quoted ones with raw newlines)
    and comments atomically, so a '.'-ending line INSIDE a long
    literal can never become a boundary (the quote-aware widening of
    VERDICT r4 #7).  All @prefix/@base directives are hoisted into
    every piece's header — the reference emitters declare them up
    front."""
    header_lines = []
    lines = text.splitlines(keepends=True)
    body_start = 0
    for i, ln in enumerate(lines):
        s = ln.strip()
        if s.startswith("@prefix") or s.startswith("@base") \
                or s.startswith("PREFIX") or s.startswith("BASE") \
                or not s or s.startswith("#"):
            header_lines.append(ln)
            body_start = i + 1
        else:
            break
    header = "".join(header_lines)
    body = "".join(lines[body_start:])
    pieces: List[str] = []
    piece_start = 0
    line_start = 0
    for m in _SAFE_NL_RE.finditer(body):
        if m.group() != "\n":
            continue  # literal/comment consumed atomically
        line = body[line_start:m.start()]
        line_start = m.end()
        if (m.end() - piece_start) >= target and line.rstrip().endswith("."):
            pieces.append(header + body[piece_start:m.end()])
            piece_start = m.end()
    if piece_start < len(body):
        pieces.append(header + body[piece_start:])
    return pieces or [header]


def read_turtle(path_or_dir: str):
    """Turtle file(s) -> streaming triple Dataset.  Parallelism: one
    parse task per file (like FASTA/WARC), and WITHIN a large file one
    task per ~4 MB statement-aligned piece — a single giant upload
    parses on every core instead of one."""
    import ray.data as rd

    def split(t: pa.Table) -> pa.Table:
        pieces: List[str] = []
        for blob in t.column("bytes").to_pylist():
            text = bytes(blob).decode("utf-8")
            if len(text) <= _CHUNK_BYTES:
                pieces.append(text)
            else:
                pieces.extend(_split_statements(text, _CHUNK_BYTES))
        return pa.table({"piece": pa.array(pieces, pa.string())})

    def parse(t: pa.Table) -> pa.Table:
        rows: List[Tuple[str, str, str, str]] = []
        for text in t.column("piece").to_pylist():
            rows.extend(parse_turtle_text(text))
        return rows_table(rows)

    pieces = rd.read_binary_files(path_or_dir).map_batches(
        split, batch_format="pyarrow").materialize()
    n = pieces.count()
    if n > 1:
        # one block (= one parse task) per piece so the heavy parse
        # fans out across the pool; single-piece inputs skip the split
        pieces = pieces.repartition(n)
    return pieces.map_batches(parse, batch_format="pyarrow")
