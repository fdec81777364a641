"""Multi-format RDF ingestion + normalization (SURVEY.md S1–S4, M1, M2).

Mirrors the reference's dispatch (RDFService.ts:17-24), MIME alias map
(RDFService.ts:26-40), format detection cascade — content-type → URL
extension → content sniff → default turtle (RDFService.ts:125-157) —
and the to-canonical normalizer (RDFService.ts:75-102,159-174; ours
canonicalizes to N-Triples rather than Turtle).

The Dataset stage takes a table of RDF documents
(doc_id, content[, content_type, url]) and emits the engine's triples
schema; parsing is dispatched per row inside one ``map_batches``.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..functions import jsonld, ns, rdfxml, turtle
from .. import schema as S

# M2: MIME / alias normalization (RDFService.ts:26-40)
MIME_ALIASES = {
    "text/turtle": "turtle", "application/x-turtle": "turtle", "ttl": "turtle",
    "turtle": "turtle", "n3": "turtle", "text/n3": "turtle",
    "application/n-triples": "ntriples", "nt": "ntriples", "ntriples": "ntriples",
    "application/rdf+xml": "rdfxml", "text/xml": "rdfxml",
    "application/xml": "rdfxml", "rdf": "rdfxml", "xml": "rdfxml",
    "rdfxml": "rdfxml",
    "application/ld+json": "jsonld", "application/json": "jsonld",
    "json": "jsonld", "jsonld": "jsonld",
}

_EXT = {".ttl": "turtle", ".n3": "turtle", ".nt": "ntriples",
        ".rdf": "rdfxml", ".xml": "rdfxml", ".jsonld": "jsonld",
        ".json": "jsonld"}


def detect_format(content: str, content_type: str = "", url: str = "") -> str:
    """S4 cascade (RDFService.ts:125-157)."""
    if content_type:
        mt = content_type.split(";")[0].strip().lower()
        if mt in MIME_ALIASES:
            return MIME_ALIASES[mt]
    low = (url or "").lower()
    for ext, fmt in _EXT.items():
        if low.endswith(ext):
            return fmt
    head = content.lstrip()[:200]
    if head.startswith("<?xml") or "<rdf:RDF" in head or head.startswith("<rdf:"):
        return "rdfxml"
    if head.startswith(("{", "[")):
        return "jsonld"
    return "turtle"  # default (ts:156)


def parse_rdf(content: str, fmt: str, bnode_prefix: str = "d"):
    """S1–S3 dispatch → list of 6-tuples."""
    if fmt == "rdfxml":
        return rdfxml.parse_rdfxml(content, bnode_prefix=bnode_prefix)
    if fmt == "jsonld":
        return jsonld.parse_jsonld(content, bnode_prefix=bnode_prefix)
    return turtle.parse_turtle(content, bnode_prefix=bnode_prefix)  # turtle/ntriples


def normalize_to_ntriples(content: str, content_type: str = "", url: str = "") -> str:
    """M1: any format → canonical sorted N-Triples (reference normalizes
    to Turtle via a store round-trip; canonical N-Triples is the
    columnar-era equivalent, and sorting makes it a stable fixture)."""
    fmt = detect_format(content, content_type, url)
    triples = sorted(set(parse_rdf(content, fmt)))
    return turtle.serialize_ntriples(triples)


def parse_with_fallback(content: str, fmt: str, bnode_prefix: str = "d"):
    """Defensive parse-fallback chain (reference semantics,
    SHACLValidationService.ts:178-194): try the detected format, then the
    remaining parsers; raise only when every parser fails."""
    order = [fmt] + [f for f in ("turtle", "jsonld", "rdfxml") if f != fmt]
    last: Exception | None = None
    for f in order:
        try:
            return parse_rdf(content, f, bnode_prefix=bnode_prefix)
        except Exception as ex:  # noqa: BLE001 — any parser error → next format
            last = ex
    raise last  # type: ignore[misc]


def parse_documents(docs: rd.Dataset, content_col: str = "content",
                    id_col: str = "doc_id", on_error: str = "skip") -> rd.Dataset:
    """RDF-document table → triples Dataset. Blank nodes are relabeled
    per document (doc-scoped) BEFORE any shuffle — the J2 scoping rule
    the single-store reference never needed (SURVEY.md §7.3).

    ``on_error="skip"`` (default): a document that fails EVERY parser in
    the fallback chain contributes zero triples plus one error-marker row
    (pred = ``ex:parseError``, literal message) so failures stay visible
    in the lineage without killing the batch; ``"raise"`` propagates.
    """

    def fn(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        contents = b[content_col].to_pylist()
        ctypes = (b["content_type"].to_pylist()
                  if "content_type" in b.column_names else [""] * len(ids))
        urls = (b["url"].to_pylist() if "url" in b.column_names
                else [""] * len(ids))
        rows = []
        for doc_id, content, ctype, url in zip(ids, contents, ctypes, urls):
            fmt = detect_format(content or "", ctype or "", url or "")
            try:
                parsed = parse_with_fallback(content or "", fmt,
                                             bnode_prefix=str(doc_id))
            except Exception as ex:  # noqa: BLE001
                if on_error == "raise":
                    raise
                rows.append({"subj": f"{ns.EX}document/{doc_id}",
                             "pred": ns.EX + "parseError", "obj_kind": "literal",
                             "obj_value": f"{type(ex).__name__}: {ex}"[:500],
                             "obj_datatype": "", "obj_lang": "",
                             "doc_id": str(doc_id), "span_idx": -1})
                continue
            for s, p, k, v, dt, lg in parsed:
                rows.append({"subj": s, "pred": p, "obj_kind": k, "obj_value": v,
                             "obj_datatype": dt, "obj_lang": lg,
                             "doc_id": str(doc_id), "span_idx": 0})
        return pa.Table.from_pylist(rows, schema=S.TRIPLES)

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def jsonld_projection(triples: rd.Dataset) -> rd.Dataset:
    """M19 (ValidatorInput.tsx:133-154): quads → per-subject
    ``{"@id": s, pred: value | [values]}`` JSON objects."""
    import json

    import pandas as pd

    from .discovery import bucketed_groupby_apply

    def project(g: pd.DataFrame) -> pd.DataFrame:
        obj: dict = {"@id": g["subj"].iloc[0]}
        for pred, sub in g.groupby("pred", sort=True):
            vals = sorted(sub["obj_value"])
            obj[pred] = vals[0] if len(vals) == 1 else vals
        # compact separators: byte-identical to a SQL-side reconstruction
        # (to_json + string_agg), which makes this oracle-checkable
        return pd.DataFrame({"subj": [g["subj"].iloc[0]],
                             "jsonld": [json.dumps(obj, sort_keys=True,
                                                   separators=(",", ":"))]})

    return bucketed_groupby_apply(triples.select_columns(
        ["subj", "pred", "obj_value"]), "subj", project)
