"""SHACL shapes-graph compiler.

Parses shape Turtle (our own parser — no rdflib in this sandbox) into
plain dataclasses that validator actors hold in memory — the actor-pool
analog of the reference's static shapes cache
(/root/reference/src/services/SHACLValidationService.ts:35,114-138).

v1 scope (per BASELINE.json north_star): ``sh:minCount``,
``sh:maxCount``, ``sh:datatype``, ``sh:class``, ``sh:pattern`` (+flags)
and ``sh:nodeKind`` on node/property shapes with single-predicate
``sh:path`` (property-path restriction documented in SURVEY.md §7.3).
Pattern strings get the PCRE→Python cleanup analog of the reference's
PCRE→JS rewrite (/root/reference/src/services/SHACLValidationService.ts:77-99).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..functions import ns, turtle


@dataclass
class PropertyShape:
    iri: str
    path: str
    min_count: int = -1
    max_count: int = -1
    datatype: str = ""
    node_class: str = ""
    pattern: str = ""
    flags: str = ""
    node_kind: str = ""
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
    target_class: str
    properties: list[PropertyShape] = field(default_factory=list)
    foaf_page: str = ""


@dataclass
class CompiledShapes:
    node_shapes: list[NodeShape]

    def property_shapes(self):
        """(node_shape, property_shape, global index) triples."""
        i = 0
        for nshape in self.node_shapes:
            for p in nshape.properties:
                yield nshape, p, i
                i += 1

    def referenced_classes(self) -> set[str]:
        out = {n.target_class for n in self.node_shapes}
        for n in self.node_shapes:
            for p in n.properties:
                if p.node_class:
                    out.add(p.node_class)
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


def compile_shapes(ttl_text: str) -> CompiledShapes:
    triples = turtle.parse_turtle(ttl_text, bnode_prefix="sh")
    spo: dict[str, dict[str, list[tuple[str, str, str, str]]]] = {}
    for s, p, k, v, dt, lang in triples:
        spo.setdefault(s, {}).setdefault(p, []).append((k, v, dt, lang))

    def first(subj: str, pred: str, default: str = "") -> str:
        vals = spo.get(subj, {}).get(pred)
        return vals[0][1] if vals else default

    def prop_shape(piri: str) -> PropertyShape:
        ps = PropertyShape(iri=piri, path=first(piri, ns.SH + "path"))
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
        ps.severity = _SEVERITY.get(first(piri, ns.SH + "severity"), "Violation")
        ps.messages = [(v, lang or "en") for k, v, dt, lang in
                       spo.get(piri, {}).get(ns.SH + "message", [])]
        ps.foaf_page = first(piri, ns.FOAF + "page")
        return ps

    shapes: list[NodeShape] = []
    for subj, preds in spo.items():
        tclass = preds.get(ns.SH + "targetClass")
        if not tclass:
            continue
        nshape = NodeShape(iri=subj, target_class=tclass[0][1],
                           foaf_page=first(subj, ns.FOAF + "page"))
        for _, piri, _, _ in preds.get(ns.SH + "property", []):
            nshape.properties.append(prop_shape(piri))
        shapes.append(nshape)
    shapes.sort(key=lambda s: s.iri)
    return CompiledShapes(shapes)


def load_shapes(path: str) -> CompiledShapes:
    with open(path) as f:
        return compile_shapes(f.read())


def load_profile_ttl(profile: str = "dcat_ap_demo") -> str:
    """Profile registry (extension surface §2.10; mqa-config.json analog):
    profile name → concatenated shape-file TTL text."""
    import json
    import os

    root = os.path.join(os.path.dirname(os.path.dirname(__file__)), "profiles")
    with open(os.path.join(root, "profiles.json")) as f:
        registry = json.load(f)
    if profile not in registry:
        raise KeyError(f"unknown profile {profile!r}; known: {sorted(registry)}")
    parts = []
    for fname in registry[profile]["shaclFiles"]:
        with open(os.path.join(root, fname)) as f:
            parts.append(f.read())
    return "\n".join(parts)
