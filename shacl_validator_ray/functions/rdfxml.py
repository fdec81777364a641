"""Minimal RDF/XML parser (reference S2, RDFService.ts:60-69).

Subset: ``rdf:RDF`` roots; ``rdf:Description`` and typed node elements
with ``rdf:about`` / ``rdf:nodeID`` (or anonymous → blank); property
elements carrying ``rdf:resource``, ``rdf:nodeID``, ``rdf:datatype``,
``xml:lang``, literal text, or one nested node element. No
containers/collections/reification (out of scope — the reference's
DCAT payloads don't use them)."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from . import ns

RDF_NS = "{" + ns.RDF + "}"
XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"


def _expand_tag(tag: str) -> str:
    # ElementTree gives '{namespace}local'
    if tag.startswith("{"):
        nsuri, local = tag[1:].split("}", 1)
        return nsuri + local
    return tag


def parse_rdfxml(text: str, bnode_prefix: str = "x"):
    """text → list of (subj, pred, obj_kind, obj_value, obj_datatype, obj_lang)."""
    root = ET.fromstring(text)
    triples: list[tuple[str, str, str, str, str, str]] = []
    counter = [0]

    def new_bnode() -> str:
        counter[0] += 1
        return f"_:{bnode_prefix}{counter[0]}"

    def node_id(el) -> str:
        about = el.get(RDF_NS + "about")
        if about is not None:
            return about
        nid = el.get(RDF_NS + "nodeID")
        if nid is not None:
            return f"_:{bnode_prefix}_{nid}"
        return new_bnode()

    def walk_node(el) -> str:
        subj = node_id(el)
        kind = "blank" if subj.startswith("_:") else "iri"
        tag = _expand_tag(el.tag)
        if tag != ns.RDF + "Description":  # typed node element
            triples.append((subj, ns.RDF_TYPE, "iri", tag, "", ""))
        for prop in el:
            pred = _expand_tag(prop.tag)
            res = prop.get(RDF_NS + "resource")
            nid = prop.get(RDF_NS + "nodeID")
            dtype = prop.get(RDF_NS + "datatype") or ""
            lang = prop.get(XML_LANG) or ""
            children = list(prop)
            if res is not None:
                triples.append((subj, pred, "iri", res, "", ""))
            elif nid is not None:
                triples.append((subj, pred, "blank", f"_:{bnode_prefix}_{nid}", "", ""))
            elif children:
                obj = walk_node(children[0])
                okind = "blank" if obj.startswith("_:") else "iri"
                triples.append((subj, pred, okind, obj, "", ""))
            else:
                triples.append((subj, pred, "literal", prop.text or "", dtype, lang))
        _ = kind
        return subj

    root_tag = _expand_tag(root.tag)
    nodes = list(root) if root_tag == ns.RDF + "RDF" else [root]
    for el in nodes:
        walk_node(el)
    return triples
