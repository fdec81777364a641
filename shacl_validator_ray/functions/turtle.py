"""Minimal Turtle / N-Triples parser + serializer.

Replaces the reference's N3.js callback parser
(/root/reference/src/services/RDFService.ts:42-58) for the inputs this
engine needs to read itself: SHACL shape files, small RDF data
documents, and serialized validation reports (round-trip, FIXTURES.md
F5). Supports: @prefix / PREFIX, IRIs, CURIEs, blank nodes (labelled
and ``[ ... ]``), ``a``, ``;`` / ``,`` lists, string literals with
``\\``-escapes, ``@lang`` tags, ``^^`` datatypes, triple-quoted longs,
integers / decimals / doubles / booleans, RDF collections ``( … )``
(as rdf:first/rdf:rest lists — SHACL sequence paths and sh:in need
them). Not supported (out of scope, see SURVEY.md §7.3): named graphs.

Triples are returned in the engine's columnar quad shape:
``(subj, pred, obj_kind, obj_value, obj_datatype, obj_lang)``.
"""

from __future__ import annotations

import re

from . import ns

_TOKEN = re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<longstr>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
    | (?P<string>"(?:[^"\\\n]|\\.)*")
    | (?P<iri><[^<>\s]*>)
    | (?P<prefix_decl>@prefix|@base|PREFIX|BASE)
    | (?P<langtag>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
    | (?P<dtype_sep>\^\^)
    | (?P<punct>[;,.\[\]()])
    | (?P<a_kw>\ba\b)
    | (?P<boolean>\btrue\b|\bfalse\b)
    | (?P<number>[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<bnode>_:[A-Za-z0-9_.-]+)
    | (?P<curie>[A-Za-z_][\w.-]*?:[\w./#%-]*|:[\w./#%-]*)
    | (?P<ws>\s+)
    """,
    re.VERBOSE,
)

_ESC = {"t": "\t", "n": "\n", "r": "\r", '"': '"', "\\": "\\", "'": "'", "b": "\b", "f": "\f"}


def _unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt in _ESC:
                out.append(_ESC[nxt]); i += 2; continue
            if nxt == "u" and i + 6 <= len(s):
                out.append(chr(int(s[i + 2 : i + 6], 16))); i += 6; continue
            if nxt == "U" and i + 10 <= len(s):
                out.append(chr(int(s[i + 2 : i + 10], 16))); i += 10; continue
        out.append(c); i += 1
    return "".join(out)


def escape_literal(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n").replace("\r", "\\r")


class Term:
    __slots__ = ("kind", "value", "datatype", "lang")

    def __init__(self, kind: str, value: str, datatype: str = "", lang: str = ""):
        self.kind, self.value, self.datatype, self.lang = kind, value, datatype, lang


class TurtleParser:
    def __init__(self, text: str, bnode_prefix: str = "b"):
        self.toks: list[tuple[str, str]] = []
        pos = 0
        for m in _TOKEN.finditer(text):
            if m.start() != pos:  # strict: no silent skipping of junk
                raise ValueError(
                    f"turtle tokenize: unexpected input at offset {pos}: "
                    f"{text[pos:pos + 20]!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind in ("ws", "comment"):
                continue
            self.toks.append((kind, m.group()))
        if pos != len(text):
            raise ValueError(
                f"turtle tokenize: unexpected input at offset {pos}: "
                f"{text[pos:pos + 20]!r}")
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.bn = 0
        self.bnode_prefix = bnode_prefix
        self.triples: list[tuple[str, str, str, str, str, str]] = []

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, val: str):
        k, v = self._next()
        if v != val:
            raise ValueError(f"turtle parse: expected {val!r}, got {v!r} at token {self.i}")

    def _new_bnode(self) -> str:
        self.bn += 1
        return f"_:{self.bnode_prefix}{self.bn}"

    def parse(self):
        while self._peek()[0] != "eof":
            k, v = self._peek()
            if k == "prefix_decl":
                self._next()
                if v in ("@prefix", "PREFIX"):
                    _, pfx = self._next()
                    _, iri = self._next()
                    self.prefixes[pfx[:-1] if pfx.endswith(":") else pfx.split(":")[0]] = iri[1:-1]
                else:  # @base / BASE
                    _, iri = self._next()
                    self.base = iri[1:-1]
                if v.startswith("@"):
                    self._expect(".")
                continue
            self._triples_block()
        return self.triples

    def _triples_block(self):
        was_bnode_list = self._peek()[1] == "["
        subj = self._subject()
        # blankNodePropertyList may stand alone as a statement: "[ ... ] ."
        if not (was_bnode_list and self._peek()[1] == "."):
            self._pred_obj_list(subj)
        self._expect(".")

    def _pred_obj_list(self, subj: Term):
        while True:
            pred = self._predicate()
            while True:
                obj = self._object()
                self._emit(subj, pred, obj)
                if self._peek()[1] == ",":
                    self._next()
                    continue
                break
            if self._peek()[1] == ";":
                while self._peek()[1] == ";":
                    self._next()
                if self._peek()[1] in (".", "]"):  # trailing ;
                    break
                continue
            break

    def _subject(self) -> Term:
        k, v = self._peek()
        if v == "[":
            return self._bnode_props()
        if v == "(":
            return self._collection()
        return self._resource()

    def _predicate(self) -> str:
        k, v = self._next()
        if k == "a_kw":
            return ns.RDF_TYPE
        if k == "iri":
            return self._resolve_iri(v[1:-1])
        if k == "curie":
            return self._expand(v)
        raise ValueError(f"turtle parse: bad predicate {v!r}")

    def _object(self) -> Term:
        k, v = self._peek()
        if v == "[":
            return self._bnode_props()
        if v == "(":
            return self._collection()
        if k in ("string", "longstr"):
            self._next()
            raw = v[3:-3] if k == "longstr" else v[1:-1]
            lit = _unescape(raw)
            dt, lang = "", ""
            nk, nv = self._peek()
            if nk == "dtype_sep":
                self._next()
                dk, dv = self._next()
                dt = self._resolve_iri(dv[1:-1]) if dk == "iri" else self._expand(dv)
                # RDF 1.1: "x" and "x"^^xsd:string are the SAME term; the
                # engine's canonical spelling for xsd:string is the empty
                # datatype (matching the extraction stage and the
                # serializer, which omits ^^xsd:string). Without this the
                # two spellings survive dedup_triples as distinct tuples.
                if dt == ns.XSD + "string":
                    dt = ""
            elif nk == "langtag":
                self._next()
                lang = nv[1:]
            return Term("literal", lit, dt, lang)
        if k == "number":
            self._next()
            # Turtle grammar (and N3.js in the reference): exponent forms
            # are xsd:double, '.'-forms xsd:decimal, bare ints xsd:integer.
            if "e" in v.lower():
                dt = ns.XSD + "double"
            elif "." in v:
                dt = ns.XSD + "decimal"
            else:
                dt = ns.XSD + "integer"
            return Term("literal", v, dt, "")
        if k == "boolean":
            self._next()
            return Term("literal", v, ns.XSD + "boolean", "")
        return self._resource()

    def _resource(self) -> Term:
        k, v = self._next()
        if k == "iri":
            return Term("iri", self._resolve_iri(v[1:-1]))
        if k == "curie":
            return Term("iri", self._expand(v))
        if k == "bnode":
            return Term("blank", f"_:{self.bnode_prefix}_{v[2:]}")
        raise ValueError(f"turtle parse: bad resource token {k}:{v!r}")

    def _collection(self) -> Term:
        """RDF collection ``( o1 o2 … )`` → rdf:first/rdf:rest list triples;
        returns the head term (rdf:nil for the empty collection). Needed
        for SHACL sequence paths and sh:in value lists."""
        self._expect("(")
        items: list[Term] = []
        while self._peek()[1] != ")":
            if self._peek()[0] == "eof":
                raise ValueError("turtle parse: unterminated collection")
            items.append(self._object())
        self._expect(")")
        if not items:
            return Term("iri", ns.RDF + "nil")
        head = self._new_bnode()
        cur = head
        for i, it in enumerate(items):
            self._emit(Term("blank", cur), ns.RDF + "first", it)
            if i + 1 < len(items):
                nxt = self._new_bnode()
                self._emit(Term("blank", cur), ns.RDF + "rest", Term("blank", nxt))
                cur = nxt
            else:
                self._emit(Term("blank", cur), ns.RDF + "rest",
                           Term("iri", ns.RDF + "nil"))
        return Term("blank", head)

    def _bnode_props(self) -> Term:
        self._expect("[")
        term = Term("blank", self._new_bnode())
        if self._peek()[1] != "]":
            self._pred_obj_list(term)
        self._expect("]")
        return term

    def _resolve_iri(self, iri: str) -> str:
        if self.base and "://" not in iri and not iri.startswith("urn:"):
            return self.base + iri
        return iri

    def _expand(self, curie: str) -> str:
        pfx, local = curie.split(":", 1)
        if pfx in self.prefixes:
            return self.prefixes[pfx] + local
        return ns.expand_curie(curie)

    def _emit(self, s: Term, p: str, o: Term):
        self.triples.append((s.value, p, o.kind, o.value, o.datatype, o.lang))


def parse_turtle(text: str, bnode_prefix: str = "b"):
    """text → list of (subj, pred, obj_kind, obj_value, obj_datatype, obj_lang)."""
    return TurtleParser(text, bnode_prefix=bnode_prefix).parse()


def term_ntriples(kind: str, value: str, datatype: str = "", lang: str = "") -> str:
    """Canonical term rendering (format-normalizer M1 analog)."""
    if kind == "iri":
        return f"<{value}>"
    if kind == "blank":
        return value if value.startswith("_:") else f"_:{value}"
    out = f'"{escape_literal(value)}"'
    if lang:
        return f"{out}@{lang}"
    if datatype and datatype != ns.XSD + "string":
        return f"{out}^^<{datatype}>"
    return out


def serialize_ntriples(triples) -> str:
    """Canonical N-Triples serialization of (s,p,kind,val,dt,lang) tuples."""
    lines = []
    for s, p, k, v, dt, lang in triples:
        subj = s if s.startswith("_:") else f"<{s}>"
        lines.append(f"{subj} <{p}> {term_ntriples(k, v, dt, lang)} .")
    return "\n".join(lines) + ("\n" if lines else "")
