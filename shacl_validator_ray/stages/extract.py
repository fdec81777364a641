"""Mention detection + triple extraction over interleaved spans (SURVEY.md M21, S1–S4).

The reference parses serialized RDF text into quads
(/root/reference/src/services/RDFService.ts:42-69); the north-rule
generalizes this to per-span extraction over interleaved text+media
documents. This stage is a stateless ``map_batches`` transform:
Arrow in / Arrow out, one input document row → N triple rows (fan-out
done inside the batch fn, not with per-row ``flat_map``).

Regexes are compiled once per process at import; the per-span loop is
the irreducible NLP compute — everything around it stays columnar.

Non-canonical entity surfaces (aliases / misspellings) are emitted as
provisional mention IRIs ``ex:mention/<urlencoded surface>`` — lossless,
so the linking stage recovers the exact surface form without a second
pass over the documents.
"""

from __future__ import annotations

import re
import urllib.parse

import pyarrow as pa

from ..functions import ns
from .. import schema as S

_DS = r"The dataset Dataset (D\d+) "
_DI = r"The distribution Distribution (D\d+x\d+) "

SENTENCES: list[tuple[re.Pattern, str]] = [
    (re.compile(r"The main catalog lists Dataset (D\d+)\."), "catalog"),
    (re.compile(_DS + r"is a dataset resource\."), "ds_type"),
    (re.compile(_DS + r'has title "([^"]*)"\.'), "title"),
    (re.compile(_DS + r'is described as "([^"]*)"\.'), "desc"),
    (re.compile(_DS + r"was published by ([^.]+?)\."), "publisher"),
    (re.compile(_DS + r"was issued on ([^.]+?)\."), "issued"),
    (re.compile(_DS + r"was last modified on ([^.]+?)\."), "modified"),
    (re.compile(_DS + r"covers theme Theme (T\d+)\."), "theme"),
    (re.compile(_DS + r"offers distribution Distribution (D\d+x\d+)\."), "dist"),
    (re.compile(_DI + r'is available as "([^"]*)"\.'), "format"),
    (re.compile(_DI + r"is a distribution resource\."), "dist_type"),
    (re.compile(_DI + r"occupies (\d+) bytes\."), "byte_size"),
    (re.compile(_DI + r"is allowed (\d+) bytes\."), "quota"),
    (re.compile(r"A recheck recorded (\d+) bytes for distribution "
                r"Distribution (D\d+x\d+)\."), "recheck"),
]

ORG_CANON = re.compile(r"^Organization (\d+)$")
ISO_DT = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$")

MENTION_NS = ns.EX + "mention/"


def mention_iri(surface: str) -> str:
    return MENTION_NS + urllib.parse.quote(surface, safe="")


def mention_surface(iri: str) -> str:
    return urllib.parse.unquote(iri[len(MENTION_NS):])


def _resolve_publisher(surface: str) -> tuple[str, str]:
    """surface → (obj_kind, obj_value); canonical orgs resolve directly,
    everything else becomes a provisional mention IRI for the linker."""
    m = ORG_CANON.match(surface)
    if m:
        return "iri", f"{ns.EX}org/{m.group(1)}"
    return "iri", mention_iri(surface)


def extract_triples_batch(batch: pa.Table) -> pa.Table:
    """documents batch → triples batch (schema.TRIPLES).

    Spans are read via flat Arrow child arrays + list offsets — never
    ``to_pylist()`` on the nested struct column (materializing one Python
    dict per span dominates the profile otherwise)."""
    import numpy as np

    doc_ids = batch.column("doc_id").to_pylist()
    spans_col = batch.column("spans")
    if spans_col.num_chunks == 1:
        spans_arr = spans_col.chunk(0)
    else:
        spans_arr = spans_col.combine_chunks()
    offsets = np.asarray(spans_arr.offsets)
    # .values of a SLICED ListArray is the full unsliced child — slice it
    # to this batch's range or every batch pays for the whole block
    lo0, hi0 = int(offsets[0]), int(offsets[-1])
    offsets = offsets - lo0
    values = spans_arr.values.slice(lo0, hi0 - lo0)
    kinds = values.field("kind").to_pylist()
    texts = values.field("text").to_pylist()
    media = values.field("media_ref").to_pylist()

    subj, pred, okind, oval, odt, olang, tdoc, tspan = [], [], [], [], [], [], [], []

    def emit(s, p, k, v, dt, doc, si):
        subj.append(s); pred.append(p); okind.append(k); oval.append(v)
        odt.append(dt); olang.append(""); tdoc.append(doc); tspan.append(si)

    for di, doc_id in enumerate(doc_ids):
        lo, hi = offsets[di], offsets[di + 1]
        for j in range(lo, hi):
            si = j - lo
            if kinds[j] != "text":
                emit(f"{ns.EX}document/{doc_id}", ns.SCHEMA + "associatedMedia",
                     "iri", media[j], "", doc_id, si)
                continue
            text = texts[j]
            for rx, tag in SENTENCES:
                for m in rx.finditer(text):
                    g = m.groups()
                    if tag == "catalog":
                        emit(f"{ns.EX}catalog/main", ns.DCAT + "dataset", "iri",
                             f"{ns.EX}dataset/{g[0]}", "", doc_id, si)
                    elif tag == "ds_type":
                        emit(f"{ns.EX}dataset/{g[0]}", ns.RDF_TYPE, "iri",
                             ns.DCAT + "Dataset", "", doc_id, si)
                    elif tag == "title":
                        emit(f"{ns.EX}dataset/{g[0]}", ns.DCT + "title", "literal",
                             g[1], "", doc_id, si)
                    elif tag == "desc":
                        emit(f"{ns.EX}dataset/{g[0]}", ns.DCT + "description",
                             "literal", g[1], "", doc_id, si)
                    elif tag == "publisher":
                        k, v = _resolve_publisher(g[1])
                        emit(f"{ns.EX}dataset/{g[0]}", ns.DCT + "publisher",
                             k, v, "", doc_id, si)
                    elif tag == "issued":
                        dt = ns.XSD + "dateTime" if ISO_DT.match(g[1]) else ""
                        emit(f"{ns.EX}dataset/{g[0]}", ns.DCT + "issued",
                             "literal", g[1], dt, doc_id, si)
                    elif tag == "modified":
                        dt = ns.XSD + "dateTime" if ISO_DT.match(g[1]) else ""
                        emit(f"{ns.EX}dataset/{g[0]}", ns.DCT + "modified",
                             "literal", g[1], dt, doc_id, si)
                    elif tag == "byte_size":
                        emit(f"{ns.EX}distribution/{g[0]}",
                             ns.DCAT + "byteSize", "literal", g[1], "",
                             doc_id, si)
                    elif tag == "quota":
                        emit(f"{ns.EX}distribution/{g[0]}",
                             ns.EX + "quotaBytes", "literal", g[1], "",
                             doc_id, si)
                    elif tag == "recheck":
                        emit(f"{ns.EX}distribution/{g[1]}",
                             ns.EX + "sizeRecheck", "literal", g[0], "",
                             doc_id, si)
                    elif tag == "theme":
                        emit(f"{ns.EX}dataset/{g[0]}", ns.DCAT + "theme", "iri",
                             f"{ns.EX}theme/{g[1]}", "", doc_id, si)
                    elif tag == "dist":
                        emit(f"{ns.EX}dataset/{g[0]}", ns.DCAT + "distribution",
                             "iri", f"{ns.EX}distribution/{g[1]}", "", doc_id, si)
                    elif tag == "format":
                        emit(f"{ns.EX}distribution/{g[0]}", ns.DCT + "format",
                             "literal", g[1], "", doc_id, si)
                    elif tag == "dist_type":
                        emit(f"{ns.EX}distribution/{g[0]}", ns.RDF_TYPE, "iri",
                             ns.DCAT + "Distribution", "", doc_id, si)

    return pa.Table.from_pydict(
        {"subj": subj, "pred": pred, "obj_kind": okind, "obj_value": oval,
         "obj_datatype": odt, "obj_lang": olang, "doc_id": tdoc,
         "span_idx": pa.array(tspan, type=pa.int32())},
        schema=S.TRIPLES,
    )


def extract_triples(docs_ds, batch_size: int = 1024):
    """documents Dataset → triples Dataset (stateless tasks, zero-copy Arrow in)."""
    return docs_ds.map_batches(
        extract_triples_batch, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
