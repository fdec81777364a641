"""SPARQL SELECT subset parser → :class:`..stages.bgp.BGPConstraint`.

This closes the reference's data-driven constraint plug-in surface: the
reference ships shape files whose ``sh:sparql`` constraints carry SPARQL
text and hands them to its embedded engine as ``validations:
sparqlValidations`` (/root/reference/src/services/SHACLValidationService.ts:399-406).
Here the SPARQL text compiles — at shape-compile time, on the driver —
into the distributed BGP evaluator, so a profile TTL carrying SPARQL
validates with no Python in the loop.

Supported subset (everything else raises :class:`SparqlParseError` with
the offending construct named — a profile must never silently lose a
constraint):

- ``PREFIX`` declarations (inline, plus a caller-supplied map from
  ``sh:prefixes``/``sh:declare``)
- ``SELECT [DISTINCT] $this …`` (``$this``/``?this`` required; extra
  projected variables are accepted and ignored — the violation's value
  column is driven by ``OPTIONAL``, matching the engine's report shape)
- basic graph patterns with ``;`` / ``,`` abbreviations and ``a``
- property paths in predicate position: ``p/q``, ``p|q``, ``^p``,
  ``p+``, ``p*`` (un-nested — the same operator set the shapes
  compiler accepts for ``sh:path``)
- variable predicates
- ``FILTER`` expressions: comparisons (numeric when either side is a
  number or ``STRLEN``), ``&&``/``||``/``!``, ``REGEX``, ``STRSTARTS``,
  ``STRENDS``, ``CONTAINS``, ``STR``, ``STRLEN``, ``LCASE``, ``UCASE``,
  ``IN`` / ``NOT IN`` — compiled to ONE vectorized pandas mask
- ``FILTER NOT EXISTS { … }`` (one per query)
- ``OPTIONAL`` — a linear chain starting at ``$this``, including the
  nested form ``OPTIONAL { $this p ?v . OPTIONAL { ?v q ?w } }``
- ``{ … } UNION { … }`` — shared patterns distribute into every
  alternative (join distributes over union, so this is semantics-exact)
- ``VALUES ?v { … }`` / ``VALUES (?a ?b) { (…) … }``
- ``GROUP BY $this HAVING (COUNT(DISTINCT ?v) OP n)``
"""

from __future__ import annotations

import re

from . import ns

THIS = "$this"


class SparqlParseError(ValueError):
    """A construct outside the supported SPARQL subset (named loudly)."""


_TOKEN_RE = re.compile(r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRI><[^<>\s{}|^`\\]*>)
  | (?P<VAR>[?$][A-Za-z_][A-Za-z0-9_]*)
  | (?P<STRING>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\"|"(?:[^"\\\n]|\\.)*")
  | (?P<NUMBER>[+-]?(?:\d+\.\d*|\.\d+|\d+))
  | (?P<PNAME>[A-Za-z_][A-Za-z0-9_.\-]*:[A-Za-z_][A-Za-z0-9_.\-]*
              |[A-Za-z_][A-Za-z0-9_.\-]*:|:[A-Za-z_][A-Za-z0-9_.\-]*)
  | (?P<OP>&&|\|\||!=|<=|>=|\^\^|[{}().;,|/^+*=<>!])
  | (?P<WORD>[A-Za-z_][A-Za-z0-9_]*)
""", re.VERBOSE)

_KEYWORDS = {"prefix", "base", "select", "distinct", "reduced", "where",
             "filter", "not", "exists", "optional", "union", "values",
             "group", "by", "having", "count", "sum", "avg", "min", "max",
             "as", "a", "in", "undef", "bound",
             "regex", "str", "strlen", "strstarts", "strends", "contains",
             "lcase", "ucase", "true", "false", "minus", "bind", "graph",
             "service", "order", "limit", "offset"}


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise SparqlParseError(
                f"unrecognized SPARQL at …{text[pos:pos + 30]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        val = m.group()
        if kind == "WORD":
            low = val.lower()
            kind = "KW" if low in _KEYWORDS else "WORD"
            if kind == "WORD":
                raise SparqlParseError(f"unexpected bare word {val!r}")
            val = low
        out.append((kind, val))
    out.append(("EOF", ""))
    return out


def _unquote(s: str) -> str:
    body = s[3:-3] if s.startswith('"""') else s[1:-1]
    return (body.replace('\\"', '"').replace("\\n", "\n")
            .replace("\\t", "\t").replace("\\\\", "\\"))


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], prefixes: dict):
        self.toks = tokens
        self.i = 0
        self.prefixes = dict(prefixes)

    # -- token helpers --------------------------------------------------
    def peek(self, k: int = 0) -> tuple[str, str]:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i = min(self.i + 1, len(self.toks) - 1)
        return t

    def expect(self, kind: str, val: str | None = None) -> str:
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise SparqlParseError(
                f"expected {val or kind}, got {v!r}")
        return v

    def at_kw(self, *kws: str) -> bool:
        k, v = self.peek()
        return k == "KW" and v in kws

    # -- terms ----------------------------------------------------------
    def _expand_pname(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise SparqlParseError(f"undeclared prefix {pfx!r}: in "
                                   f"{pname!r} (declare it with PREFIX "
                                   f"or sh:prefixes/sh:declare)")
        return self.prefixes[pfx] + local

    def iri(self) -> str:
        k, v = self.next()
        if k == "IRI":
            return v[1:-1]
        if k == "PNAME":
            return self._expand_pname(v)
        if k == "KW" and v == "a":
            return ns.RDF_TYPE
        raise SparqlParseError(f"expected an IRI, got {v!r}")

    def term(self):
        """Subject/object position: var | IRI | literal | number."""
        k, v = self.peek()
        if k == "VAR":
            self.next()
            return self._var(v)
        if k == "IRI" or k == "PNAME" or (k == "KW" and v == "a"):
            return self.iri()
        if k == "STRING":
            self.next()
            lit = _unquote(v)
            # optional datatype / language tag: matched on lexical form
            # only (the BGP evaluator compares obj_value strings)
            nk, nv = self.peek()
            if nk == "OP" and nv == "^^":
                self.next()
                self.iri()
            return lit
        if k == "NUMBER":
            self.next()
            return v
        if k == "KW" and v in ("true", "false"):
            self.next()
            return v
        raise SparqlParseError(f"expected a term, got {v!r}")

    @staticmethod
    def _var(tok: str) -> str:
        name = tok[1:]
        return THIS if name == "this" else "?" + name

    # -- property paths ---------------------------------------------------
    def path(self):
        """Predicate position: var | IRI | un-nested path expression.
        Returns a string (plain/var) or the BGPConstraint path tuple."""
        k, v = self.peek()
        if k == "VAR":
            self.next()
            var = self._var(v)
            nk, nv = self.peek()
            if nk == "OP" and nv in ("/", "|", "+", "*", "^"):
                raise SparqlParseError(
                    "path operators cannot apply to a variable predicate")
            return var
        alts = [self._path_seq()]
        while self.peek() == ("OP", "|"):
            self.next()
            alts.append(self._path_seq())
        if len(alts) > 1:
            flat = []
            for a in alts:
                if isinstance(a, tuple) or not isinstance(a, str):
                    raise SparqlParseError(
                        "alternative path members must be plain IRIs "
                        "(nested path operators are unsupported)")
                flat.append(a)
            return ("alt", flat)
        return alts[0]

    def _path_seq(self):
        steps = [self._path_elt()]
        while self.peek() == ("OP", "/"):
            self.next()
            steps.append(self._path_elt())
        if len(steps) > 1:
            for s in steps:
                if not isinstance(s, str):
                    raise SparqlParseError(
                        "sequence path steps must be plain IRIs "
                        "(nested path operators are unsupported)")
            return ("seq", steps)
        return steps[0]

    def _path_elt(self):
        inv = False
        if self.peek() == ("OP", "^"):
            self.next()
            inv = True
        p = self.iri()
        k, v = self.peek()
        if k == "OP" and v in ("+", "*"):
            self.next()
            if inv:
                raise SparqlParseError(
                    "combined inverse+closure paths are unsupported")
            return ("plus" if v == "+" else "star", p)
        if k == "OP" and v == "?":
            raise SparqlParseError("zero-or-one path (?) is unsupported")
        return ("inv", p) if inv else p

    # -- graph patterns ---------------------------------------------------
    def group(self) -> dict:
        """Parse one group graph pattern into a structure dict."""
        self.expect("OP", "{")
        out = {"patterns": [], "filters": [], "not_exists": None,
               "optional": None, "union": [], "values": None,
               "minus": False}
        while True:
            k, v = self.peek()
            if (k, v) == ("OP", "}"):
                self.next()
                return out
            if k == "EOF":
                raise SparqlParseError("unterminated group pattern")
            if k == "KW" and v == "filter":
                self.next()
                if self.at_kw("not"):
                    self.next()
                    self.expect("KW", "exists")
                    inner = self.group()
                    if (inner["filters"] or inner["not_exists"]
                            or inner["optional"] or inner["union"]
                            or inner["values"]):
                        raise SparqlParseError(
                            "NOT EXISTS group must contain only triple "
                            "patterns")
                    if out["not_exists"] is not None:
                        raise SparqlParseError(
                            "only one FILTER NOT EXISTS per query is "
                            "supported")
                    out["not_exists"] = inner["patterns"]
                else:
                    out["filters"].append(self._expr_primary_paren())
            elif k == "KW" and v == "optional":
                self.next()
                inner = self.group()
                if (inner["filters"] or inner["not_exists"]
                        or inner["union"] or inner["values"]):
                    raise SparqlParseError(
                        "OPTIONAL group must contain only triple "
                        "patterns (and one nested OPTIONAL)")
                chain = list(inner["patterns"])
                nested = inner["optional"]
                while nested is not None:
                    chain.extend(nested["patterns"])
                    nested = nested["optional"]
                if out["optional"] is not None:
                    raise SparqlParseError(
                        "only one OPTIONAL chain per query is supported")
                out["optional"] = {"patterns": chain, "optional": None}
            elif k == "KW" and v == "values":
                self.next()
                if out["values"] is not None:
                    raise SparqlParseError(
                        "only one VALUES clause per query is supported")
                out["values"] = self._values()
            elif (k, v) == ("OP", "{"):
                alts = [self.group()]
                while self.at_kw("union"):
                    self.next()
                    alts.append(self.group())
                if len(alts) < 2:
                    raise SparqlParseError(
                        "nested group patterns are only supported as "
                        "UNION alternatives")
                for a in alts:
                    if (a["filters"] or a["not_exists"] or a["optional"]
                            or a["union"] or a["values"]):
                        raise SparqlParseError(
                            "UNION alternatives must contain only "
                            "triple patterns")
                if out["union"]:
                    raise SparqlParseError(
                        "only one UNION construct per query is supported")
                out["union"] = [a["patterns"] for a in alts]
            elif k == "KW" and v == "minus":
                # MINUS removes solutions agreeing on the SHARED
                # variables. When the only shared variable is $this it
                # coincides with FILTER NOT EXISTS on the focus set —
                # the engine's distributed anti-join; any other shared
                # variable would need per-solution subtraction, which
                # the subset rejects loudly below (in parse_select,
                # where the outer pattern variables are known).
                self.next()
                inner = self.group()
                if (inner["filters"] or inner["not_exists"]
                        or inner["optional"] or inner["union"]
                        or inner["values"]):
                    raise SparqlParseError(
                        "MINUS group must contain only triple patterns")
                if out["not_exists"] is not None:
                    raise SparqlParseError(
                        "only one MINUS / FILTER NOT EXISTS per query "
                        "is supported")
                out["not_exists"] = inner["patterns"]
                out["minus"] = True
            elif k == "KW" and v in ("bind", "graph", "service"):
                raise SparqlParseError(f"{v.upper()} is unsupported")
            else:
                self._triples_block(out["patterns"])
        # unreachable

    def _triples_block(self, sink: list) -> None:
        subj = self.term()
        while True:
            pred = self.path()
            while True:
                obj = self.term()
                sink.append((subj, pred, obj))
                if self.peek() == ("OP", ","):
                    self.next()
                    continue
                break
            if self.peek() == ("OP", ";"):
                self.next()
                # dangling ';' before '.' or '}' is legal turtle/SPARQL
                k, v = self.peek()
                if (k, v) in (("OP", "."), ("OP", "}")):
                    break
                continue
            break
        if self.peek() == ("OP", "."):
            self.next()

    def _values(self):
        k, v = self.peek()
        if k == "VAR":
            self.next()
            vars_ = (self._var(v),)
            self.expect("OP", "{")
            rows = []
            while self.peek() != ("OP", "}"):
                rows.append((self._values_term(),))
            self.next()
            return (vars_, rows)
        self.expect("OP", "(")
        vars_ = []
        while self.peek()[0] == "VAR":
            vars_.append(self._var(self.next()[1]))
        self.expect("OP", ")")
        self.expect("OP", "{")
        rows = []
        while self.peek() != ("OP", "}"):
            self.expect("OP", "(")
            row = []
            while self.peek() != ("OP", ")"):
                row.append(self._values_term())
            self.next()
            rows.append(tuple(row))
        self.next()
        return (tuple(vars_), rows)

    def _values_term(self) -> str:
        k, v = self.peek()
        if k == "KW" and v == "undef":
            raise SparqlParseError("UNDEF in VALUES is unsupported")
        t = self.term()
        if isinstance(t, str) and t.startswith(("?", "$")):
            raise SparqlParseError("variables cannot appear in VALUES rows")
        return t

    # -- FILTER expressions ------------------------------------------------
    # AST nodes: ("or", a, b) ("and", a, b) ("not", a)
    #            ("cmp", op, lhs, rhs) ("in", lhs, [lit...], negated)
    #            ("regex", opnd, pat, flags) ("strstarts"/"strends"/
    #            "contains", opnd, lit)
    # operands:  ("var", name) ("lit", s) ("num", lexeme)
    #            ("strlen"/"str"/"lcase"/"ucase", operand)
    def _expr_primary_paren(self):
        self.expect("OP", "(")
        e = self._expr_or()
        self.expect("OP", ")")
        return e

    def _expr_or(self):
        e = self._expr_and()
        while self.peek() == ("OP", "||"):
            self.next()
            e = ("or", e, self._expr_and())
        return e

    def _expr_and(self):
        e = self._expr_unary()
        while self.peek() == ("OP", "&&"):
            self.next()
            e = ("and", e, self._expr_unary())
        return e

    def _expr_unary(self):
        k, v = self.peek()
        if (k, v) == ("OP", "!"):
            self.next()
            return ("not", self._expr_unary())
        if (k, v) == ("OP", "("):
            self.next()
            e = self._expr_or()
            self.expect("OP", ")")
            return e
        return self._expr_relational()

    def _expr_relational(self):
        if self.at_kw("bound"):
            self.next()
            self.expect("OP", "(")
            v = self._var(self.expect("VAR"))
            self.expect("OP", ")")
            return ("bound", v)
        lhs = self._expr_operand()
        k, v = self.peek()
        if k == "OP" and v in ("=", "!=", "<", ">", "<=", ">="):
            self.next()
            rhs = self._expr_operand()
            return ("cmp", v, lhs, rhs)
        if k == "KW" and v == "in":
            self.next()
            return ("in", lhs, self._in_list(), False)
        if k == "KW" and v == "not":
            self.next()
            self.expect("KW", "in")
            return ("in", lhs, self._in_list(), True)
        # bare boolean operand (e.g. REGEX(...) alone)
        if lhs[0] in ("regex", "strstarts", "strends", "contains"):
            return lhs
        raise SparqlParseError(
            f"expected a comparison or boolean builtin, got operand "
            f"{lhs!r}")

    def _in_list(self) -> list[str]:
        self.expect("OP", "(")
        vals = []
        while True:
            k, v = self.peek()
            if k == "STRING":
                self.next()
                vals.append(_unquote(v))
            elif k == "NUMBER":
                self.next()
                vals.append(v)
            elif k in ("IRI", "PNAME"):
                vals.append(self.iri())
            else:
                raise SparqlParseError(f"unsupported IN member {v!r}")
            if self.peek() == ("OP", ","):
                self.next()
                continue
            break
        self.expect("OP", ")")
        return vals

    def _expr_operand(self):
        k, v = self.peek()
        if k == "VAR":
            self.next()
            return ("var", self._var(v))
        if k == "STRING":
            self.next()
            return ("lit", _unquote(v))
        if k == "NUMBER":
            self.next()
            return ("num", v)
        if k in ("IRI", "PNAME"):
            return ("lit", self.iri())
        if k == "KW" and v in ("str", "strlen", "lcase", "ucase"):
            self.next()
            self.expect("OP", "(")
            inner = self._expr_operand()
            self.expect("OP", ")")
            return (v, inner)
        if k == "KW" and v == "regex":
            self.next()
            self.expect("OP", "(")
            opnd = self._expr_operand()
            self.expect("OP", ",")
            pat = _unquote(self.expect("STRING"))
            flags = ""
            if self.peek() == ("OP", ","):
                self.next()
                flags = _unquote(self.expect("STRING"))
            self.expect("OP", ")")
            return ("regex", opnd, pat, flags)
        if k == "KW" and v in ("strstarts", "strends", "contains"):
            self.next()
            self.expect("OP", "(")
            opnd = self._expr_operand()
            self.expect("OP", ",")
            lk, lv = self.next()
            if lk != "STRING":
                raise SparqlParseError(
                    f"{v.upper()} needs a string literal second argument")
            self.expect("OP", ")")
            return (v, opnd, _unquote(lv))
        raise SparqlParseError(f"unsupported FILTER operand {v!r}")


# -- AST → vectorized pandas mask -----------------------------------------
def _compile_filter(asts: list) -> "callable":
    """AND of the parsed FILTER expressions → one vectorized fn(df)."""

    def series(df, o):
        kind = o[0]
        if kind == "var":
            return df[o[1]].astype(str)
        if kind == "str":
            return series(df, o[1])
        if kind == "strlen":
            return series(df, o[1]).str.len()
        if kind == "lcase":
            return series(df, o[1]).str.lower()
        if kind == "ucase":
            return series(df, o[1]).str.upper()
        raise SparqlParseError(f"operand {kind!r} is not a column")

    def is_numeric(o) -> bool:
        return o[0] in ("num", "strlen")

    def operand(df, o, numeric: bool):
        import pandas as pd

        if o[0] == "num":
            return float(o[1])
        if o[0] == "lit":
            return o[1]
        s = series(df, o)
        if numeric and o[0] != "strlen":
            return pd.to_numeric(s, errors="coerce")
        return s

    _CMPS = {"=": lambda a, b: a == b, "!=": lambda a, b: a != b,
             "<": lambda a, b: a < b, ">": lambda a, b: a > b,
             "<=": lambda a, b: a <= b, ">=": lambda a, b: a >= b}

    def ev(df, e):
        kind = e[0]
        if kind == "or":
            return ev(df, e[1]) | ev(df, e[2])
        if kind == "and":
            return ev(df, e[1]) & ev(df, e[2])
        if kind == "not":
            return ~ev(df, e[1])
        if kind == "cmp":
            _, op, lhs, rhs = e
            numeric = is_numeric(lhs) or is_numeric(rhs)
            a = operand(df, lhs, numeric)
            b = operand(df, rhs, numeric)
            m = _CMPS[op](a, b)
            import pandas as pd

            return pd.Series(m, index=df.index).fillna(False)
        if kind == "in":
            _, lhs, vals, negated = e
            m = series(df, lhs).isin(vals)
            return ~m if negated else m
        if kind == "bound":
            # pattern-chain variables are always bound once a filter
            # runs (BOUND over OPTIONAL variables is rewritten at parse
            # time); kept for completeness
            return series(df, ("var", e[1])).notna()
        if kind == "regex":
            _, opnd, pat, flags = e
            return series(df, opnd).str.contains(
                pat, regex=True, case="i" not in flags, na=False)
        if kind == "strstarts":
            return series(df, e[1]).str.startswith(e[2]).fillna(False)
        if kind == "strends":
            return series(df, e[1]).str.endswith(e[2]).fillna(False)
        if kind == "contains":
            return series(df, e[1]).str.contains(e[2], regex=False,
                                                 na=False)
        raise SparqlParseError(f"unsupported expression node {kind!r}")

    def fn(df):
        mask = ev(df, asts[0])
        for a in asts[1:]:
            mask = mask & ev(df, a)
        return mask

    return fn


def _collect_filter_vars(e, out: set) -> None:
    if not isinstance(e, tuple):
        return
    if e[0] == "var":
        out.add(e[1])
        return
    for part in e[1:]:
        _collect_filter_vars(part, out)


def parse_select(text: str, *, component: str, message: str = "",
                 severity: str = "Violation", shape_iri: str = "",
                 target=None, prefixes: dict | None = None):
    """SPARQL SELECT text (``sh:select``) → a BGPConstraint.

    ``prefixes`` is merged under any inline PREFIX declarations —
    callers pass the shape graph's ``sh:prefixes``/``sh:declare`` map.
    """
    from ..stages.bgp import BGPConstraint

    p = _Parser(_tokenize(text), prefixes or {})

    while p.at_kw("prefix"):
        p.next()
        pname = p.expect("PNAME")
        if not pname.endswith(":"):
            raise SparqlParseError(f"bad PREFIX declaration {pname!r}")
        iri = p.expect("IRI")
        p.prefixes[pname[:-1]] = iri[1:-1]
    if p.at_kw("base"):
        raise SparqlParseError("BASE is unsupported")

    p.expect("KW", "select")
    if p.at_kw("distinct", "reduced"):
        p.next()
    proj = []
    while p.peek()[0] == "VAR":
        proj.append(p._var(p.next()[1]))
    if not proj and p.peek() == ("OP", "*"):
        p.next()
        proj = [THIS]
    if THIS not in proj:
        raise SparqlParseError(
            "the SELECT projection must include $this (SHACL-SPARQL "
            "pre-binds the focus node)")
    if p.at_kw("where"):
        p.next()
    g = p.group()

    having = None
    if p.at_kw("group"):
        p.next()
        p.expect("KW", "by")
        gvar = p._var(p.expect("VAR"))
        if gvar != THIS:
            raise SparqlParseError("GROUP BY must group on $this")
        p.expect("KW", "having")
        p.expect("OP", "(")
        ak, aggkw = p.next()
        if ak != "KW" or aggkw not in ("count", "sum", "avg", "min", "max"):
            raise SparqlParseError(
                f"unsupported HAVING aggregate {aggkw!r} (supported: "
                "COUNT/SUM/AVG/MIN/MAX)")
        p.expect("OP", "(")
        agg = aggkw
        if aggkw == "count" and p.at_kw("distinct"):
            p.next()
            agg = "countd"
        hvar = p._var(p.expect("VAR"))
        p.expect("OP", ")")
        k, op = p.next()
        if k != "OP" or op not in ("=", "<", ">", "<=", ">="):
            raise SparqlParseError(f"unsupported HAVING operator {op!r}")
        n = p.expect("NUMBER")
        p.expect("OP", ")")
        having = (agg, hvar, "==" if op == "=" else op,
                  int(float(n)) if agg in ("countd", "count")
                  else float(n))
    if p.at_kw("order", "limit", "offset"):
        raise SparqlParseError(
            "ORDER BY / LIMIT / OFFSET have no effect on a constraint's "
            "focus set and are rejected (remove them)")
    if p.peek()[0] != "EOF":
        raise SparqlParseError(f"trailing content at {p.peek()[1]!r}")

    kwargs: dict = {}
    patterns = list(g["patterns"])
    if g["union"]:
        if g["filters"] or g["values"] or having is not None:
            raise SparqlParseError(
                "UNION cannot combine with FILTER/VALUES/HAVING in the "
                "supported subset")
        # join distributes over union: shared leading patterns prepend
        # to every alternative, exactly the SPARQL semantics for the
        # focus set
        alts = [patterns + a for a in g["union"]]
        patterns = alts[0]
        kwargs["union_patterns"] = alts[1:]
    # FILTERs over OPTIONAL bindings rewrite exactly (SPARQL evaluates
    # an unbound variable in a FILTER as an error, which removes the
    # row): a filter REFERENCING an optional variable forces the whole
    # optional chain to have matched, so the chain PROMOTES into the
    # main pattern chain (staying OPTIONAL only for report annotation);
    # `FILTER(!BOUND(?v))` is the missing-property idiom and becomes
    # the distributed focus anti-join (absent_patterns).
    opt_chain = list(g["optional"]["patterns"]) if g["optional"] else []
    opt_vars = {o for (_, _, o) in opt_chain}
    plain_filters: list = []
    notbound: list[str] = []
    promote = False
    for a in g["filters"]:
        fvars: set = set()
        _collect_filter_vars(a, fvars)
        if (isinstance(a, tuple) and a[0] == "not"
                and isinstance(a[1], tuple) and a[1][0] == "bound"
                and a[1][1] in opt_vars):
            notbound.append(a[1][1])
            continue
        if isinstance(a, tuple) and a[0] == "bound" and a[1] in opt_vars:
            promote = True
            continue
        if fvars & opt_vars:
            promote = True
        plain_filters.append(a)
    if notbound:
        if promote or len(notbound) > 1:
            raise SparqlParseError(
                "!BOUND over an OPTIONAL variable cannot combine with "
                "other FILTER references to OPTIONAL variables")
        if g["not_exists"] is not None:
            raise SparqlParseError(
                "!BOUND cannot combine with FILTER NOT EXISTS / MINUS "
                "(one anti-join per query)")
        v = notbound[0]
        cut = next(i for i, (_, _, o) in enumerate(opt_chain) if o == v)
        g["not_exists"] = opt_chain[:cut + 1]
        g["minus"] = False
        # annotation can only come from the part of the chain BEFORE
        # the unbound variable (everything from v on never matched)
        opt_chain = opt_chain[:cut]
        g["optional"] = ({"patterns": opt_chain, "optional": None}
                         if opt_chain else None)
    elif promote:
        if g["union"]:
            raise SparqlParseError(
                "FILTER over OPTIONAL variables cannot combine with "
                "UNION in the supported subset")
        patterns = patterns + opt_chain
    if plain_filters:
        kwargs["filter_fn"] = _compile_filter(plain_filters)
        fvars = set()
        for a in plain_filters:
            _collect_filter_vars(a, fvars)
        pvars = {t for pat in patterns for t in pat
                 if isinstance(t, str) and t.startswith(("?", "$"))}
        missing = sorted(fvars - pvars)
        if missing:
            raise SparqlParseError(
                f"FILTER references variables {missing} not bound by "
                "the pattern chain")
    if g["not_exists"] is not None:
        if g["minus"]:
            # MINUS == NOT EXISTS only when $this is the sole shared
            # variable; per-solution subtraction is out of subset
            pvars = {t for pat in patterns for t in pat
                     if isinstance(t, str) and t.startswith(("?", "$"))}
            ivars = {t for pat in g["not_exists"] for t in pat
                     if isinstance(t, str) and t.startswith(("?", "$"))}
            shared = (pvars & ivars) - {THIS}
            if shared:
                raise SparqlParseError(
                    f"MINUS sharing variables {sorted(shared)} beyond "
                    "$this needs per-solution subtraction — rename the "
                    "inner variables or use FILTER NOT EXISTS")
        kwargs["absent_patterns"] = g["not_exists"]
    if g["optional"] is not None:
        kwargs["optional_pattern"] = g["optional"]["patterns"]
    if g["values"] is not None:
        kwargs["values_rows"] = g["values"]
    if having is not None:
        kwargs["having"] = having
    if "?value" in proj:
        # the SHACL-SPARQL convention: a projected ?value yields one
        # result per (focus, value) solution pair, with the binding in
        # the report's value column
        kwargs["value_var"] = "?value"

    return BGPConstraint(patterns, component, message=message,
                         severity=severity, shape_iri=shape_iri,
                         target=target, **kwargs)
