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
