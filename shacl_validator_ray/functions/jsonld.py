"""Minimal JSON-LD parser (reference S3, RDFService.ts:89-93).

Subset: a node object or list of node objects; simple ``@context``
(prefix → IRI string, term → IRI string, or term → {"@id", "@type"});
``@id`` / ``@type``; property values as strings, numbers, booleans,
``{"@id"}``, ``{"@value", "@type"?, "@language"?}``, nested node
objects, and arrays thereof. ``@graph`` unwrapped. No framing, no
reverse properties, no remote contexts."""

from __future__ import annotations

import json

from . import ns


def _ctx_expand(term: str, ctx: dict) -> str:
    if term.startswith(("http://", "https://", "urn:", "_:")):
        return term
    if term in ctx:
        spec = ctx[term]
        return spec["@id"] if isinstance(spec, dict) else spec
    if ":" in term:
        pfx, local = term.split(":", 1)
        if pfx in ctx and isinstance(ctx[pfx], str):
            return ctx[pfx] + local
    return ns.expand_curie(term)


def parse_jsonld(text: str, bnode_prefix: str = "j"):
    """text → list of (subj, pred, obj_kind, obj_value, obj_datatype, obj_lang)."""
    data = json.loads(text)
    triples: list[tuple[str, str, str, str, str, str]] = []
    counter = [0]

    def new_bnode() -> str:
        counter[0] += 1
        return f"_:{bnode_prefix}{counter[0]}"

    def node_subject(obj: dict, ctx: dict) -> str:
        nid = obj.get("@id")
        if nid is None:
            return new_bnode()
        if nid.startswith("_:"):
            return f"_:{bnode_prefix}_{nid[2:]}"
        return _ctx_expand(nid, ctx)

    def walk(obj: dict, ctx: dict) -> str:
        ctx = {**ctx, **(obj.get("@context") or {})}
        subj = node_subject(obj, ctx)
        skind = "blank" if subj.startswith("_:") else "iri"
        for t in _as_list(obj.get("@type")):
            triples.append((subj, ns.RDF_TYPE, "iri", _ctx_expand(t, ctx), "", ""))
        for key, vals in obj.items():
            if key.startswith("@"):
                continue
            pred = _ctx_expand(key, ctx)
            for v in _as_list(vals):
                if isinstance(v, dict):
                    if "@value" in v:
                        dt = _ctx_expand(v["@type"], ctx) if "@type" in v else ""
                        triples.append((subj, pred, "literal", str(v["@value"]),
                                        dt, v.get("@language", "")))
                    elif set(v) <= {"@id"}:
                        o = node_subject(v, ctx)
                        triples.append((subj, pred,
                                        "blank" if o.startswith("_:") else "iri",
                                        o, "", ""))
                    else:
                        o = walk(v, ctx)
                        triples.append((subj, pred,
                                        "blank" if o.startswith("_:") else "iri",
                                        o, "", ""))
                elif isinstance(v, bool):
                    triples.append((subj, pred, "literal", "true" if v else "false",
                                    ns.XSD + "boolean", ""))
                elif isinstance(v, (int, float)):
                    dt = ns.XSD + ("integer" if isinstance(v, int) else "decimal")
                    triples.append((subj, pred, "literal", str(v), dt, ""))
                else:
                    triples.append((subj, pred, "literal", str(v), "", ""))
        _ = skind
        return subj

    def _as_list(x):
        if x is None:
            return []
        return x if isinstance(x, list) else [x]

    top = data if isinstance(data, list) else [data]
    expanded = []
    for item in top:
        if isinstance(item, dict) and "@graph" in item:
            gctx = item.get("@context") or {}
            for g in _as_list(item["@graph"]):
                expanded.append(({**g, "@context": {**gctx, **(g.get("@context") or {})}}))
        else:
            expanded.append(item)
    for item in expanded:
        walk(item, {})
    return triples
