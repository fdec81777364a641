"""DCAT discovery pipeline vs the F6 fixture semantics
(DataDiscoveryService.ts:77-264)."""

import os

import pyarrow as pa
import ray.data as rd

from shacl_validator_ray import schema as S
from shacl_validator_ray.functions import turtle
from shacl_validator_ray.stages import discovery

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _triples():
    with open(f"{FIX}/data/catalog_discovery.ttl") as f:
        rows = turtle.parse_turtle(f.read())
    tbl = pa.Table.from_pylist(
        [{"subj": s, "pred": p, "obj_kind": k, "obj_value": v,
          "obj_datatype": dt, "obj_lang": lg, "doc_id": "d0", "span_idx": 0}
         for s, p, k, v, dt, lg in rows], schema=S.TRIPLES)
    return rd.from_arrow(tbl)


def test_discover_datasets_fixture():
    df = discovery.discover_datasets(_triples())
    by_id = {r["id"]: r for r in df.to_dict("records")}
    ex = "http://example.org/"
    # dsB dropped: only PDF distribution (ts:172-174)
    assert set(by_id) == {ex + "dsA", ex + "dsC"}

    a = by_id[ex + "dsA"]
    assert a["title"] == "Air quality"
    assert a["themes"] == [ex + "themeEnv", ex + "themeHealth"]
    assert sorted(a["keywords"]) == ["air", "environment"]
    assert a["publisher"] == ex + "org1"
    # blank-node IMT deref resolved text/csv (J2); pdf dist filtered out
    assert len(a["distributions"]) == 1
    assert a["distributions"][0]["format"] == "csv"
    assert a["distributions"][0]["title"] == "CSV dump"

    c = by_id[ex + "dsC"]
    # mediaType fallback classification (M17 cascade)
    assert c["distributions"][0]["format"] == "json"


def test_discover_query_filter_and_limit():
    df = discovery.discover_datasets(_triples(), query="air")
    assert list(df["id"]) == ["http://example.org/dsA"]
    df2 = discovery.discover_datasets(_triples(), limit=1)
    assert len(df2) == 1


def test_classify_format_cascade():
    assert discovery.classify_format("text/csv") == "csv"
    assert discovery.classify_format("Comma-Separated values") == "csv"
    assert discovery.classify_format("application/json") == "json"
    assert discovery.classify_format("application/pdf") == "unknown"
    assert discovery.classify_format("") == "unknown"


def test_classify_format_cascade_breadth():
    """M17 rule families (DataDiscoveryService.ts:330-475)."""
    from shacl_validator_ray.stages.discovery import (classify_format,
                                                      classify_format_from_url)

    # authority URIs: decided by the designator only
    assert classify_format(
        "http://publications.europa.eu/resource/authority/file-type/CSV") == "csv"
    assert classify_format(
        "http://publications.europa.eu/resource/authority/file-type/JSON") == "json"
    assert classify_format(
        "http://publications.europa.eu/resource/authority/file-type/PDF") == "unknown"
    assert classify_format("https://www.iana.org/assignments/media-types/text/csv") == "csv"
    # media types, fragments, labels, Spanish labels
    assert classify_format("application/csv") == "csv"
    assert classify_format("text/json") == "json"
    assert classify_format("something#csv") == "csv"
    assert classify_format("Comma-Separated Values") == "csv"
    assert classify_format("delimiter-separated file") == "csv"
    assert classify_format("Valores separados por comas") == "csv"
    assert classify_format("JavaScript Object Notation") == "json"
    assert classify_format("Notación de objetos JavaScript") == "json"
    assert classify_format("application/pdf") == "unknown"
    # URL rules: extensions, query params, path markers, api/export
    assert classify_format_from_url("https://x.org/data.csv") == "csv"
    assert classify_format_from_url("https://x.org/d?format=json") == "json"
    assert classify_format_from_url("https://x.org/dump?fmt=csv") == "csv"
    assert classify_format_from_url("https://x.org/files/csv/2020") == "csv"
    assert classify_format_from_url("https://x.org/a-json-feed") == "json"
    assert classify_format_from_url("https://x.org/api/rows.json") == "json"
    assert classify_format_from_url("https://x.org/export?type=csv") == "csv"
    # stricter than the label classifier: host mentions don't classify
    assert classify_format_from_url("https://csvkit.example/data.xml") == "unknown"
    assert classify_format_from_url("") == "unknown"


def test_discover_no_datasets_returns_empty():
    """A triples set with no dcat:Dataset rows yields an empty frame, not
    a KeyError from the empty distributed-assembly result."""
    import pyarrow as pa
    import ray.data as rd

    from shacl_validator_ray import schema as S
    from shacl_validator_ray.stages.discovery import discover_datasets

    tbl = pa.Table.from_pylist(
        [{"subj": "http://example.org/x", "pred": "http://example.org/p",
          "obj_kind": "literal", "obj_value": "v", "obj_datatype": "",
          "obj_lang": "", "doc_id": "d0", "span_idx": 0}], schema=S.TRIPLES)
    df = discover_datasets(rd.from_arrow(tbl))
    assert df.empty
