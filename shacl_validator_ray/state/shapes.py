"""SHACL shapes-graph compiler.

Parses shape Turtle (our own parser — no rdflib in this sandbox) into
plain dataclasses that validator actors hold in memory — the actor-pool
analog of the reference's static shapes cache
(/root/reference/src/services/SHACLValidationService.ts:35,114-138).

Scope — SHACL-core COMPLETE (BASELINE.json north_star subset grew to
the full core over round 2):

- **components**: min/maxCount, datatype, class, pattern(+flags),
  nodeKind (incl. composite kinds), min/maxLength, min/maxInclusive +
  min/maxExclusive, in, hasValue, languageIn, uniqueLang,
  or/and/xone/not (value-level bundles), equals/disjoint/lessThan/
  lessThanOrEquals, closed(+ignoredProperties), node (nested shapes),
  qualifiedValueShape(+qualified bounds), deactivated, severity
  (property- and node-shape level), message.
- **paths**: single predicates, sequences ``( a b … )``, alternatives
  ``[ sh:alternativePath (…) ]``, inverses ``[ sh:inversePath p ]``,
  closures ``[ sh:zeroOrMorePath p ]`` / ``[ sh:oneOrMorePath p ]`` —
  mirroring and exceeding the reference's path extractor
  (/root/reference/src/services/SHACLValidationService.ts:207-247).
- **targets**: ``sh:targetClass``, ``sh:targetNode``,
  ``sh:targetSubjectsOf``, ``sh:targetObjectsOf``
  (/root/reference/src/services/SHACLValidationService.ts:401-408 gets
  these from shacl-engine).

Pattern strings get the PCRE→Python cleanup analog of the reference's
PCRE→JS rewrite (SHACLValidationService.ts:77-99).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..functions import ns, turtle


@dataclass(frozen=True)
class Target:
    """One target selector; ``key`` is the broadcast-membership dict key."""

    kind: str  # "class" | "node" | "subjects_of" | "objects_of"
    value: str

    @property
    def key(self) -> str:
        return f"{self.kind}:{self.value}"


@dataclass
class PropertyShape:
    iri: str
    path: str                      # canonical string ("p", "a/b", "(a | b)")
    path_kind: str = "single"      # "single" | "seq" | "alt"
    path_preds: list[str] = field(default_factory=list)
    min_count: int = -1
    max_count: int = -1
    datatype: str = ""
    node_class: str = ""
    pattern: str = ""
    flags: str = ""
    node_kind: str = ""
    min_length: int = -1
    max_length: int = -1
    in_values: list[str] = field(default_factory=list)   # obj_value strings
    has_value: str = ""            # required value (sh:hasValue)
    has_value_kind: str = ""       # its term kind ("iri" | "literal" | …)
    # value range components (raw constraint literals; "" = unset)
    min_inclusive: str = ""
    max_inclusive: str = ""
    min_exclusive: str = ""
    max_exclusive: str = ""
    # logical constraints over VALUE-level branches (sh:or/and/xone/not):
    # each branch is a constraint bundle (a PropertyShape without a path)
    or_branches: list["PropertyShape"] = field(default_factory=list)
    and_branches: list["PropertyShape"] = field(default_factory=list)
    xone_branches: list["PropertyShape"] = field(default_factory=list)
    not_shape: "PropertyShape | None" = None
    node_shape: str = ""           # sh:node — referenced node shape IRI
    # sh:qualifiedValueShape (restricted to a value-level bundle) +
    # qualified count bounds
    qualified_shape: "PropertyShape | None" = None
    qualified_min: int = -1
    qualified_max: int = -1
    language_in: list[str] = field(default_factory=list)  # sh:languageIn
    unique_lang: bool = False      # sh:uniqueLang
    # property-pair components: the OTHER predicate to compare against
    equals: str = ""
    disjoint: str = ""
    less_than: str = ""
    less_than_or_equals: str = ""
    severity: str = "Violation"
    messages: list[tuple[str, str]] = field(default_factory=list)  # (text, lang)
    foaf_page: str = ""
    _rx: "re.Pattern | None" = None

    def compiled_pattern(self):
        if self.pattern and self._rx is None:
            self._rx = compile_pattern(self.pattern, self.flags)
        return self._rx


@dataclass
class NodeShape:
    iri: str
    targets: list[Target] = field(default_factory=list)
    properties: list[PropertyShape] = field(default_factory=list)
    foaf_page: str = ""
    closed: bool = False                     # sh:closed
    ignored_props: list[str] = field(default_factory=list)  # sh:ignoredProperties
    severity: str = "Violation"              # sh:severity (node-shape level)

    @property
    def target_class(self) -> str:
        """First class target (compatibility accessor; '' if none)."""
        for t in self.targets:
            if t.kind == "class":
                return t.value
        return ""


@dataclass
class CompiledShapes:
    node_shapes: list[NodeShape]
    # sh:sparql constraints parsed from the shape TTL (BGPConstraint
    # instances) — the data-driven plug-in surface; validate() appends
    # them to its custom-constraint list
    sparql_constraints: list = field(default_factory=list)

    def property_shapes(self):
        """(node_shape, property_shape, global index) triples."""
        i = 0
        for nshape in self.node_shapes:
            for p in nshape.properties:
                yield nshape, p, i
                i += 1

    def targets(self) -> list[Target]:
        out, seen = [], set()
        for n in self.node_shapes:
            for t in n.targets:
                if t.key not in seen:
                    seen.add(t.key)
                    out.append(t)
        return out

    def referenced_classes(self) -> set[str]:
        out = {t.value for t in self.targets() if t.kind == "class"}
        for n in self.node_shapes:
            for p in n.properties:
                if p.node_class:
                    out.add(p.node_class)
        return out

    def seq_paths(self) -> list[tuple[str, tuple[str, ...]]]:
        """Distinct sequence paths: (canonical string, predicate chain)."""
        out, seen = [], set()
        for n in self.node_shapes:
            for p in n.properties:
                if p.path_kind == "seq" and p.path not in seen:
                    seen.add(p.path)
                    out.append((p.path, tuple(p.path_preds)))
        return out

    def alt_paths(self) -> list[tuple[str, tuple[str, ...]]]:
        """Distinct alternative paths: (canonical string, predicates)."""
        out, seen = [], set()
        for n in self.node_shapes:
            for p in n.properties:
                if p.path_kind == "alt" and p.path not in seen:
                    seen.add(p.path)
                    out.append((p.path, tuple(p.path_preds)))
        return out

    def inv_paths(self) -> list[tuple[str, str]]:
        """Distinct inverse paths: (canonical "^p" string, predicate)."""
        out, seen = [], set()
        for n in self.node_shapes:
            for p in n.properties:
                if p.path_kind == "inv" and p.path not in seen:
                    seen.add(p.path)
                    out.append((p.path, p.path_preds[0]))
        return out

    def closure_paths(self) -> list[tuple[str, str, bool]]:
        """Distinct zeroOrMore/oneOrMore paths:
        (canonical "p*"/"p+" string, predicate, include_zero)."""
        out, seen = [], set()
        for n in self.node_shapes:
            for p in n.properties:
                if p.path_kind in ("star", "plus") and p.path not in seen:
                    seen.add(p.path)
                    out.append((p.path, p.path_preds[0], p.path_kind == "star"))
        return out

    def foaf_pages(self) -> dict[str, str]:
        """shape IRI → foaf:page (the J3 broadcast map)."""
        out = {}
        for n in self.node_shapes:
            if n.foaf_page:
                out[n.iri] = n.foaf_page
            for p in n.properties:
                if p.foaf_page or n.foaf_page:
                    out[p.iri] = p.foaf_page or n.foaf_page
        return out


def compile_pattern(pattern: str, flags: str = "") -> re.Pattern:
    """SHACL pattern → Python regex; PCRE-ism cleanup (reference M3 analog)."""
    f = 0
    if "i" in flags:
        f |= re.IGNORECASE
    if "m" in flags:
        f |= re.MULTILINE
    if "s" in flags:
        f |= re.DOTALL
    try:
        return re.compile(pattern, f)
    except re.error:
        # strip inline PCRE modifiers like (?s) prefixes the engine may not take
        cleaned = re.sub(r"^\(\?[a-zA-Z]+\)", "", pattern)
        return re.compile(cleaned, f | re.DOTALL)


_SEVERITY = {
    ns.SH + "Violation": "Violation",
    ns.SH + "Warning": "Warning",
    ns.SH + "Info": "Info",
}

# sh:nodeKind local name → admitted obj_kind codes (SHACL-core §4.1.1,
# incl. the three composite union kinds). Anything else is rejected at
# compile time instead of silently violating every value.
NODEKIND_SETS = {
    "IRI": frozenset({"iri"}),
    "BlankNode": frozenset({"blank"}),
    "Literal": frozenset({"literal"}),
    "BlankNodeOrIRI": frozenset({"blank", "iri"}),
    "IRIOrLiteral": frozenset({"iri", "literal"}),
    "BlankNodeOrLiteral": frozenset({"blank", "literal"}),
}

_TARGET_PREDS = [
    (ns.SH + "targetClass", "class"),
    (ns.SH + "targetNode", "node"),
    (ns.SH + "targetSubjectsOf", "subjects_of"),
    (ns.SH + "targetObjectsOf", "objects_of"),
]


def _branch(ps: PropertyShape, piri: str) -> PropertyShape:
    """Validate an sh:or / sh:not branch: value-level constraints only."""
    if (ps.min_count >= 0 or ps.max_count >= 0 or ps.has_value or ps.path
            or ps.node_shape):
        raise ValueError(
            f"unsupported sh:or/sh:not branch on {piri}: only value-level "
            "constraints (datatype/pattern/nodeKind/minLength/maxLength/"
            "in/class) are supported")
    if not (ps.datatype or ps.pattern or ps.node_kind or ps.min_length >= 0
            or ps.max_length >= 0 or ps.in_values or ps.node_class
            or ps.min_inclusive or ps.max_inclusive or ps.min_exclusive
            or ps.max_exclusive or ps.or_branches or ps.and_branches
            or ps.xone_branches or ps.not_shape):
        raise ValueError(f"empty sh:or/sh:not branch on {piri}")
    return ps


def compile_shapes(ttl_text) -> CompiledShapes:
    """Compile one shape TTL text or a SEQUENCE of texts (a multi-file
    profile). Multi-file union follows the reference's per-profile shape
    assembly (SHACLValidationService.ts:114-138: each fetched file is
    parsed separately and its quads union into one dataset): every file
    gets its own blank-node scope (explicit ``_:b0`` labels in two files
    never collide) and duplicate triples across files collapse to one —
    the D3 set semantics, so a shape repeated in two files is compiled
    once."""
    texts = [ttl_text] if isinstance(ttl_text, str) else list(ttl_text)
    triples = []
    seen: set = set()
    for i, txt in enumerate(texts):
        pfx = "sh" if len(texts) == 1 else f"sh{i}f"
        for t in turtle.parse_turtle(txt, bnode_prefix=pfx):
            if t not in seen:
                seen.add(t)
                triples.append(t)
    spo: dict[str, dict[str, list[tuple[str, str, str, str]]]] = {}
    for s, p, k, v, dt, lang in triples:
        spo.setdefault(s, {}).setdefault(p, []).append((k, v, dt, lang))

    def first(subj: str, pred: str, default: str = "") -> str:
        vals = spo.get(subj, {}).get(pred)
        return vals[0][1] if vals else default

    def read_list(head: str) -> list[tuple[str, str]]:
        """rdf:first/rdf:rest chain → [(kind, value), …]."""
        out: list[tuple[str, str]] = []
        seen: set[str] = set()
        while head and head != ns.RDF + "nil" and head not in seen:
            seen.add(head)
            node = spo.get(head, {})
            f = node.get(ns.RDF + "first")
            if not f:
                break
            out.append((f[0][0], f[0][1]))
            r = node.get(ns.RDF + "rest")
            head = r[0][1] if r else ""
        return out

    def parse_path(piri: str) -> tuple[str, str, list[str]]:
        """sh:path object → (canonical string, path kind, predicates)."""
        vals = spo.get(piri, {}).get(ns.SH + "path")
        if not vals:
            return "", "single", []
        kind, value = vals[0][0], vals[0][1]
        if kind == "iri":
            return value, "single", [value]
        node = spo.get(value, {})
        if ns.SH + "inversePath" in node:
            iv = node[ns.SH + "inversePath"][0]
            if iv[0] != "iri":
                raise ValueError(
                    f"unsupported sh:inversePath member on {piri} "
                    "(only a plain predicate IRI is supported)")
            return "^" + iv[1], "inv", [iv[1]]
        for star_pred, kind_name, sym in (
                (ns.SH + "zeroOrMorePath", "star", "*"),
                (ns.SH + "oneOrMorePath", "plus", "+")):
            if star_pred in node:
                iv = node[star_pred][0]
                if iv[0] != "iri":
                    raise ValueError(
                        f"unsupported {star_pred.rsplit('#')[-1]} member on "
                        f"{piri} (only a plain predicate IRI is supported)")
                return iv[1] + sym, kind_name, [iv[1]]
        if ns.SH + "alternativePath" in node:
            head = node[ns.SH + "alternativePath"][0][1]
            preds = [v for k, v in read_list(head)]
            if any(k != "iri" for k, _ in read_list(head)) or not preds:
                raise ValueError(f"unsupported sh:alternativePath members on {piri}")
            if len(preds) == 1:
                return preds[0], "single", preds
            return "(" + " | ".join(preds) + ")", "alt", preds
        if ns.RDF + "first" in node:
            items = read_list(value)
            preds = [v for _, v in items]
            if any(k != "iri" for k, _ in items) or not preds:
                raise ValueError(
                    f"unsupported sequence-path member on {piri} "
                    "(only IRI steps are supported)")
            if len(preds) == 1:
                return preds[0], "single", preds
            return "/".join(preds), "seq", preds
        raise ValueError(
            f"unsupported sh:path structure on {piri} (supported: IRI, "
            "sequence list, sh:alternativePath)")

    def prop_shape(piri: str) -> PropertyShape:
        path_str, path_kind, path_preds = parse_path(piri)
        ps = PropertyShape(iri=piri, path=path_str, path_kind=path_kind,
                           path_preds=path_preds)
        mc = first(piri, ns.SH + "minCount")
        xc = first(piri, ns.SH + "maxCount")
        ps.min_count = int(mc) if mc else -1
        ps.max_count = int(xc) if xc else -1
        ps.datatype = first(piri, ns.SH + "datatype")
        ps.node_class = first(piri, ns.SH + "class")
        ps.pattern = first(piri, ns.SH + "pattern")
        ps.flags = first(piri, ns.SH + "flags")
        ps.node_kind = first(piri, ns.SH + "nodeKind")
        if ps.node_kind and ps.node_kind.rsplit("#", 1)[-1] not in NODEKIND_SETS:
            raise ValueError(
                f"unsupported sh:nodeKind {ps.node_kind!r} on {piri} "
                f"(supported: {sorted(NODEKIND_SETS)})")
        ml = first(piri, ns.SH + "minLength")
        xl = first(piri, ns.SH + "maxLength")
        ps.min_length = int(ml) if ml else -1
        ps.max_length = int(xl) if xl else -1
        in_head = first(piri, ns.SH + "in")
        if in_head:
            ps.in_values = [v for _, v in read_list(in_head)]
        hv = spo.get(piri, {}).get(ns.SH + "hasValue")
        if hv:
            ps.has_value_kind, ps.has_value = hv[0][0], hv[0][1]
        # sh:or ( [ … ] [ … ] ) / sh:not [ … ]: branches are VALUE-level
        # constraint bundles (datatype/pattern/nodeKind/length/in/class);
        # count-bound or nested-path branches are rejected at compile time
        # (same restriction posture as unsupported path operators).
        ps.min_inclusive = first(piri, ns.SH + "minInclusive")
        ps.max_inclusive = first(piri, ns.SH + "maxInclusive")
        ps.min_exclusive = first(piri, ns.SH + "minExclusive")
        ps.max_exclusive = first(piri, ns.SH + "maxExclusive")
        for pred, attr in ((ns.SH + "or", "or_branches"),
                           (ns.SH + "and", "and_branches"),
                           (ns.SH + "xone", "xone_branches")):
            head = first(piri, pred)
            if head:
                getattr(ps, attr).extend(
                    _branch(prop_shape(v), v) for k, v in read_list(head))
        nt = first(piri, ns.SH + "not")
        if nt:
            ps.not_shape = _branch(prop_shape(nt), nt)
        ps.node_shape = first(piri, ns.SH + "node")
        qv = first(piri, ns.SH + "qualifiedValueShape")
        if qv:
            ps.qualified_shape = _branch(prop_shape(qv), qv)
        qmin = first(piri, ns.SH + "qualifiedMinCount")
        qmax = first(piri, ns.SH + "qualifiedMaxCount")
        ps.qualified_min = int(qmin) if qmin else -1
        ps.qualified_max = int(qmax) if qmax else -1
        li = first(piri, ns.SH + "languageIn")
        if li:
            ps.language_in = [v for _, v in read_list(li)]
        ps.unique_lang = first(piri, ns.SH + "uniqueLang") == "true"
        ps.equals = first(piri, ns.SH + "equals")
        ps.disjoint = first(piri, ns.SH + "disjoint")
        ps.less_than = first(piri, ns.SH + "lessThan")
        ps.less_than_or_equals = first(piri, ns.SH + "lessThanOrEquals")
        ps.severity = _SEVERITY.get(first(piri, ns.SH + "severity"), "Violation")
        ps.messages = [(v, lang or "en") for k, v, dt, lang in
                       spo.get(piri, {}).get(ns.SH + "message", [])]
        ps.foaf_page = first(piri, ns.FOAF + "page")
        return ps

    shapes: list[NodeShape] = []
    sparql_constraints: list = []
    for subj, preds in spo.items():
        targets = [Target(kind, v)
                   for pred, kind in _TARGET_PREDS
                   for _, v, _, _ in preds.get(pred, [])]
        if not targets:
            continue
        if first(subj, ns.SH + "deactivated") == "true":
            continue  # sh:deactivated node shape: skipped entirely
        nshape = NodeShape(iri=subj, targets=targets,
                           foaf_page=first(subj, ns.FOAF + "page"),
                           closed=first(subj, ns.SH + "closed") == "true",
                           severity=_SEVERITY.get(
                               first(subj, ns.SH + "severity"), "Violation"))
        ig = first(subj, ns.SH + "ignoredProperties")
        if ig:
            nshape.ignored_props = [v for _, v in read_list(ig)]
        for _, piri, _, _ in preds.get(ns.SH + "property", []):
            if first(piri, ns.SH + "deactivated") == "true":
                continue  # sh:deactivated property shape: skipped
            nshape.properties.append(prop_shape(piri))
        # sh:sparql: the data-driven constraint plug-in — the SELECT text
        # compiles into the distributed BGP evaluator at shape-compile
        # time (reference parity: SHACLValidationService.ts:399-406 hands
        # shape-file SPARQL to its engine as `validations`). Unsupported
        # SPARQL raises at compile time — a profile never silently loses
        # a constraint.
        for _, cnode, _, _ in preds.get(ns.SH + "sparql", []):
            if first(cnode, ns.SH + "deactivated") == "true":
                continue
            sel = first(cnode, ns.SH + "select")
            if not sel:
                raise ValueError(
                    f"sh:sparql constraint {cnode!r} on {subj!r} has no "
                    "sh:select")
            pfx_map: dict[str, str] = {}
            pnode = first(cnode, ns.SH + "prefixes")
            if pnode:
                for _, decl, _, _ in spo.get(pnode, {}).get(
                        ns.SH + "declare", []):
                    px = first(decl, ns.SH + "prefix")
                    nsiri = first(decl, ns.SH + "namespace")
                    if px and nsiri:
                        pfx_map[px] = nsiri
            msgs = spo.get(cnode, {}).get(ns.SH + "message", [])
            from ..functions import sparql as sparql_mod

            sparql_constraints.append(sparql_mod.parse_select(
                sel,
                component=ns.SH + "SPARQLConstraintComponent",
                message=msgs[0][1] if msgs else "",
                severity=_SEVERITY.get(first(cnode, ns.SH + "severity"),
                                       nshape.severity),
                shape_iri=subj,
                target=list(nshape.targets),
                prefixes=pfx_map))
        shapes.append(nshape)
    shapes.sort(key=lambda s: s.iri)
    sparql_constraints.sort(key=lambda c: c.shape_iri)

    # sh:node: derive one synthetic node shape per referencing property
    # shape. Its focus set is the parent's VALUE-node set (membership key
    # ``nodeval:<parent property iri>``, collected in
    # stages/shacl.validate); its property shapes are clones of the
    # referenced shape's with parent-prefixed IRIs so nested findings are
    # attributable back to the referencing shape.
    derived: list[NodeShape] = []
    for nshape in shapes:
        for p in nshape.properties:
            if not p.node_shape:
                continue
            ref = p.node_shape
            ref_props = spo.get(ref, {}).get(ns.SH + "property", [])
            if not ref_props:
                raise ValueError(
                    f"sh:node target {ref!r} (on {p.iri}) defines no "
                    "sh:property shapes")
            clones: list[PropertyShape] = []
            for _, rpiri, _, _ in ref_props:
                rp = prop_shape(rpiri)
                if rp.node_shape:
                    raise ValueError(
                        f"nested sh:node chains are not supported ({rpiri})")
                rp.iri = f"{p.iri}::node::{rpiri}"
                clones.append(rp)
            derived.append(NodeShape(
                iri=f"{p.iri}::node::{ref}",
                targets=[Target("nodeval", p.iri)],
                properties=clones))
    shapes.extend(derived)
    return CompiledShapes(shapes, sparql_constraints=sparql_constraints)


def load_shapes(path: str) -> CompiledShapes:
    with open(path) as f:
        return compile_shapes(f.read())


def load_profile_ttl(profile: str = "dcat_ap_demo", version: str | None = None,
                     branch: str | None = None):
    """Profile registry (extension surface §2.10; mqa-config.json analog,
    /root/reference/src/config/mqa-config.json:38-140 consumed by
    SHACLValidationService.ts:101-138).

    Two registry layouts coexist:

    - flat (legacy): ``{"shaclFiles": [path, ...]}`` — no versions;
    - versioned (reference parity): ``{"defaultVersion", "defaultBranch",
      "branches": {id: label}, "versions": {v: {"shaclFiles": [...]}}}``
      with ``{branch}`` templating in the file paths (the reference
      templates raw.githubusercontent URLs the same way;
      SHACLValidationService.ts:110-111).

    Returns ONE string for a single-file profile and a TUPLE of per-file
    texts for a multi-file one — :func:`compile_shapes` unions a tuple
    with per-file blank-node scoping, exactly like the reference's
    per-file parse + quad union."""
    import json
    import os

    root = os.path.join(os.path.dirname(os.path.dirname(__file__)), "profiles")
    with open(os.path.join(root, "profiles.json")) as f:
        registry = json.load(f)
    if profile not in registry:
        raise KeyError(f"unknown profile {profile!r}; known: {sorted(registry)}")
    entry = registry[profile]
    if "versions" in entry:
        version = version or entry.get("defaultVersion")
        if version not in entry["versions"]:
            raise KeyError(f"unknown version {version!r} of {profile!r}; "
                           f"known: {sorted(entry['versions'])}")
        branch = branch or entry.get("defaultBranch", "main")
        if "branches" in entry and branch not in entry["branches"]:
            raise KeyError(f"unknown branch {branch!r} of {profile!r}; "
                           f"known: {sorted(entry['branches'])}")
        files = [f.replace("{branch}", branch)
                 for f in entry["versions"][version]["shaclFiles"]]
    else:
        if version is not None or branch is not None:
            raise KeyError(f"profile {profile!r} is unversioned")
        files = entry["shaclFiles"]
    parts = []
    for fname in files:
        with open(os.path.join(root, fname)) as f:
            parts.append(f.read())
    return parts[0] if len(parts) == 1 else tuple(parts)
