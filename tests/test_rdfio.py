"""Multi-format parsing (S1–S4), normalization (M1), JSON-LD projection (M19).

The cross-format fixture encodes the SAME graph in Turtle, RDF/XML and
JSON-LD; all three must normalize to the identical canonical N-Triples
(modulo blank-node labels — none used in the shared graph)."""

import json

import pyarrow as pa
import ray.data as rd

from shacl_validator_ray.functions import jsonld, ns, rdfxml
from shacl_validator_ray.stages import rdfio

TTL = """
@prefix dcat: <http://www.w3.org/ns/dcat#> .
@prefix dct: <http://purl.org/dc/terms/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
<http://example.org/ds1> a dcat:Dataset ;
  dct:title "Air"@en ;
  dct:issued "2021-01-01T00:00:00Z"^^xsd:dateTime ;
  dcat:distribution <http://example.org/dist1> .
<http://example.org/dist1> dct:format "text/csv" .
"""

RXML = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:dcat="http://www.w3.org/ns/dcat#"
         xmlns:dct="http://purl.org/dc/terms/"
         xml:base="http://example.org/">
  <dcat:Dataset rdf:about="http://example.org/ds1">
    <dct:title xml:lang="en">Air</dct:title>
    <dct:issued rdf:datatype="http://www.w3.org/2001/XMLSchema#dateTime">2021-01-01T00:00:00Z</dct:issued>
    <dcat:distribution rdf:resource="http://example.org/dist1"/>
  </dcat:Dataset>
  <rdf:Description rdf:about="http://example.org/dist1">
    <dct:format>text/csv</dct:format>
  </rdf:Description>
</rdf:RDF>
"""

JLD = json.dumps({
    "@context": {"dcat": "http://www.w3.org/ns/dcat#",
                 "dct": "http://purl.org/dc/terms/",
                 "xsd": "http://www.w3.org/2001/XMLSchema#"},
    "@graph": [
        {"@id": "http://example.org/ds1", "@type": "dcat:Dataset",
         "dct:title": {"@value": "Air", "@language": "en"},
         "dct:issued": {"@value": "2021-01-01T00:00:00Z", "@type": "xsd:dateTime"},
         "dcat:distribution": {"@id": "http://example.org/dist1"}},
        {"@id": "http://example.org/dist1", "dct:format": "text/csv"},
    ],
})


def test_detect_format_cascade():
    assert rdfio.detect_format("", "text/turtle") == "turtle"
    assert rdfio.detect_format("", "application/rdf+xml; charset=utf-8") == "rdfxml"
    assert rdfio.detect_format("", "", "http://x/file.jsonld") == "jsonld"
    assert rdfio.detect_format("", "", "http://x/data.nt") == "ntriples"
    assert rdfio.detect_format('<?xml version="1.0"?><rdf:RDF/>') == "rdfxml"
    assert rdfio.detect_format('{"@id": "x"}') == "jsonld"
    assert rdfio.detect_format("@prefix ex: <http://e/> .") == "turtle"


def test_cross_format_same_canonical_ntriples():
    nt_ttl = rdfio.normalize_to_ntriples(TTL)
    nt_xml = rdfio.normalize_to_ntriples(RXML)
    nt_jld = rdfio.normalize_to_ntriples(JLD)
    assert nt_ttl == nt_xml == nt_jld
    assert '"Air"@en' in nt_ttl
    assert "dateTime" in nt_ttl


def test_rdfxml_blank_nodes_and_nesting():
    xml = """<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:dct="http://purl.org/dc/terms/"
             xmlns:r="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
      <rdf:Description rdf:about="http://e/d1">
        <dct:format>
          <rdf:Description>
            <r:value>text/csv</r:value>
          </rdf:Description>
        </dct:format>
      </rdf:Description>
    </rdf:RDF>"""
    rows = rdfxml.parse_rdfxml(xml)
    fmt = [r for r in rows if r[1].endswith("format")][0]
    assert fmt[2] == "blank"
    val = [r for r in rows if r[1] == ns.RDF + "value"][0]
    assert val[0] == fmt[3] and val[3] == "text/csv"


def test_jsonld_numbers_and_lists():
    doc = json.dumps({"@id": "http://e/x",
                      "http://e/n": 42,
                      "http://e/tags": ["a", "b"],
                      "http://e/ok": True})
    rows = jsonld.parse_jsonld(doc)
    by_pred = {}
    for r in rows:
        by_pred.setdefault(r[1], []).append(r)
    assert by_pred["http://e/n"][0][3:5] == ("42", ns.XSD + "integer")
    assert sorted(r[3] for r in by_pred["http://e/tags"]) == ["a", "b"]
    assert by_pred["http://e/ok"][0][3] == "true"


def test_parse_documents_stage_mixed_formats():
    docs = rd.from_arrow(pa.Table.from_pylist([
        {"doc_id": "t1", "content": TTL, "content_type": "", "url": "a.ttl"},
        {"doc_id": "x1", "content": RXML, "content_type": "application/rdf+xml",
         "url": ""},
        {"doc_id": "j1", "content": JLD, "content_type": "", "url": "b.jsonld"},
    ]))
    triples = rdfio.parse_documents(docs)
    df = triples.to_pandas()
    assert set(df["doc_id"]) == {"t1", "x1", "j1"}
    per_doc = df.groupby("doc_id").size()
    assert per_doc["t1"] == per_doc["x1"] == per_doc["j1"] == 5


def test_jsonld_projection_m19():
    docs = rd.from_arrow(pa.Table.from_pylist(
        [{"doc_id": "t1", "content": TTL, "content_type": "", "url": ""}]))
    proj = rdfio.jsonld_projection(rdfio.parse_documents(docs)).to_pandas()
    objs = {r["subj"]: json.loads(r["jsonld"]) for r in proj.to_dict("records")}
    ds1 = objs["http://example.org/ds1"]
    assert ds1["@id"] == "http://example.org/ds1"
    assert ds1["http://purl.org/dc/terms/title"] == "Air"
    assert ds1[ns.RDF_TYPE] == ns.DCAT + "Dataset"


def test_parse_fallback_chain_and_error_markers():
    """Reference parse-fallback semantics (SHACLValidationService.ts:178-194):
    a mislabeled document parses via another format; a hopeless one yields
    an error-marker row instead of killing the batch."""
    mislabeled = TTL  # turtle content claiming to be JSON-LD
    hopeless = "%%% not rdf in any format <<<"
    docs = rd.from_arrow(pa.Table.from_pylist([
        {"doc_id": "ok", "content": mislabeled,
         "content_type": "application/ld+json", "url": ""},
        {"doc_id": "bad", "content": hopeless, "content_type": "", "url": ""},
    ]))
    df = rdfio.parse_documents(docs).to_pandas()
    ok = df[df["doc_id"] == "ok"]
    assert len(ok) == 5 and (ok["pred"] != ns.EX + "parseError").all()
    bad = df[df["doc_id"] == "bad"]
    assert len(bad) == 1 and bad.iloc[0]["pred"] == ns.EX + "parseError"
    assert bad.iloc[0]["span_idx"] == -1

    import pytest

    with pytest.raises(Exception):
        rdfio.parse_documents(docs, on_error="raise").to_pandas()
