"""RDF namespace constants + IRI helpers.

Prefix table mirrors the reference's 22-entry compaction table
(/root/reference/src/components/Validator/ValidationResults.tsx:37-77).
"""

from __future__ import annotations

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
XSD = "http://www.w3.org/2001/XMLSchema#"
SH = "http://www.w3.org/ns/shacl#"
DCAT = "http://www.w3.org/ns/dcat#"
DCT = "http://purl.org/dc/terms/"
FOAF = "http://xmlns.com/foaf/0.1/"
SKOS = "http://www.w3.org/2004/02/skos/core#"
SCHEMA = "http://schema.org/"
EX = "http://example.org/"

RDF_TYPE = RDF + "type"

PREFIXES: dict[str, str] = {
    "rdf": RDF,
    "rdfs": RDFS,
    "xsd": XSD,
    "sh": SH,
    "dcat": DCAT,
    "dct": DCT,
    "foaf": FOAF,
    "skos": SKOS,
    "schema": SCHEMA,
    "ex": EX,
}

# reverse-sorted by namespace length so longest prefix wins
_BY_NS = sorted(PREFIXES.items(), key=lambda kv: -len(kv[1]))


def compact_iri(iri: str) -> str:
    """IRI → ``prefix:local``; else trailing fragment / last path segment.

    Semantics of ValidationResults.tsx:37-77 (compactIri).
    """
    for prefix, ns in _BY_NS:
        if iri.startswith(ns):
            return f"{prefix}:{iri[len(ns):]}"
    for sep in ("#", "/"):
        if sep in iri:
            tail = iri.rstrip(sep).rsplit(sep, 1)[-1]
            if tail:
                return tail
    return iri


def expand_curie(curie: str, extra: dict[str, str] | None = None) -> str:
    """``prefix:local`` → full IRI (used by the Turtle parser)."""
    if ":" not in curie:
        return curie
    prefix, local = curie.split(":", 1)
    table = dict(PREFIXES)
    if extra:
        table.update(extra)
    if prefix in table:
        return table[prefix] + local
    return curie
