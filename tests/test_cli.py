"""CLI entry points (reference user flows, SURVEY.md §3)."""

import json
import os

from shacl_validator_ray import cli

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


class _Args:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def test_cli_validate_invalid(capsys):
    rc = cli.cmd_validate(_Args(data=f"{FIX}/data/invalid_catalog.ttl",
                                shapes=None, profile="dcat_ap_demo",
                                format="json", limit=100))
    assert rc == 1  # non-conforming → nonzero exit
    out = capsys.readouterr().out.strip().splitlines()
    head = json.loads(out[0])
    assert head == {"conforms": False, "results": 5}


def test_cli_validate_custom_shapes_ttl_output(capsys):
    rc = cli.cmd_validate(_Args(data=f"{FIX}/data/valid_catalog.ttl",
                                shapes=f"{FIX}/shapes/profile.ttl",
                                profile="dcat_ap_demo", format="ttl"))
    assert rc == 0
    assert "sh:conforms true" in capsys.readouterr().out


def test_cli_report_roundtrip(tmp_path, capsys):
    # render a report via validate --format ttl, then analyze it
    cli.cmd_validate(_Args(data=f"{FIX}/data/invalid_catalog.ttl", shapes=None,
                           profile="dcat_ap_demo", format="ttl"))
    ttl = capsys.readouterr().out
    p = tmp_path / "report.ttl"
    p.write_text(ttl)
    rc = cli.cmd_report(_Args(report=str(p)))
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out["summary"]["total_results"] == 5
    assert any(c["name"] == "MinCountConstraintComponent"
               for c in out["components"])


def test_cli_discover(capsys):
    rc = cli.cmd_discover(_Args(data=f"{FIX}/data/catalog_discovery.ttl",
                                query=None, limit=50))
    assert rc == 0
    recs = json.loads(capsys.readouterr().out)
    assert {r["id"].rsplit("/", 1)[-1] for r in recs} == {"dsA", "dsC"}


def test_cli_validate_json_output_is_bounded(capsys):
    """json mode streams at most --limit detail lines plus a truncation
    marker — a dirty corpus must never take_all() onto the driver."""
    rc = cli.cmd_validate(_Args(data=f"{FIX}/data/invalid_catalog.ttl",
                                shapes=None, profile="dcat_ap_demo",
                                format="json", limit=2))
    assert rc == 1
    out = capsys.readouterr().out.strip().splitlines()
    head = json.loads(out[0])
    assert head["results"] == 5
    # 1 header + 2 detail + 1 truncation marker
    assert len(out) == 4
    tail = json.loads(out[-1])
    assert tail == {"truncated": True, "shown": 2, "total": 5}


def test_cli_dedup_writes_map_and_survivors(capsys, tmp_path):
    out_dir = str(tmp_path / "dd")
    rc = cli.cmd_dedup(_Args(sf_dir="/root/testdata/sf0.001",
                             out_dir=out_dir, tau=0.95))
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["docs"] == 500
    assert summary["kept"] + summary["removed"] == 500
    import duckdb

    kept = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out_dir}/documents_dedup/*.parquet')"
    ).fetchone()[0]
    assert kept == summary["kept"]
    m = duckdb.sql(
        f"SELECT count(*), sum(keep::INT) FROM "
        f"read_parquet('{out_dir}/dedup_map/*.parquet')").fetchone()
    assert m[0] == 500 and m[1] == summary["kept"]


def test_cli_query_lists_and_runs(capsys):
    rc = cli.cmd_query(_Args(name="", sf_dir="", limit=5, list=True))
    assert rc == 0
    names = capsys.readouterr().out.strip().splitlines()
    assert "kg_validate" in names and "fuzzy_dedup_keep" in names
    assert len(names) >= 110

    rc = cli.cmd_query(_Args(name="severity_counts",
                             sf_dir="/root/testdata/sf0.001",
                             limit=2, list=False))
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["rows"] == 3 and summary["shown"] == 2
    assert len(out) == 3  # 2 detail lines + summary

    rc = cli.cmd_query(_Args(name="nope", sf_dir="x", limit=5, list=False))
    assert rc == 2


def test_cli_sparql_adhoc_select(tmp_path, capsys):
    data = tmp_path / "d.ttl"
    data.write_text("""
@prefix ex: <http://example.org/> .
ex:d1 ex:dist ex:z1 .
ex:z1 ex:format "application/pdf" .
ex:d2 ex:dist ex:z2 .
ex:z2 ex:format "text/csv" .
""")
    rc = cli.cmd_sparql(_Args(data=str(data), select="""
        PREFIX ex: <http://example.org/>
        SELECT $this WHERE {
            $this ex:dist ?d . ?d ex:format "application/pdf" . }"""))
    assert rc == 0
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert [r["focus_node"] for r in rows] == ["http://example.org/d1"]


def test_cli_validate_sparql_profile(tmp_path, capsys):
    data = tmp_path / "d.ttl"
    data.write_text("""
@prefix dcat: <http://www.w3.org/ns/dcat#> .
@prefix dct: <http://purl.org/dc/terms/> .
@prefix ex: <http://example.org/> .
ex:d1 a dcat:Dataset ; dcat:distribution ex:z1 .
ex:z1 dct:format "application/pdf" .
ex:d2 a dcat:Dataset ; dcat:distribution ex:z2 .
ex:z2 dct:format "text/csv" .
""")
    rc = cli.cmd_validate(_Args(data=str(data), shapes=None,
                                profile="sparql_demo", format="json",
                                limit=100))
    assert rc == 1
    out = [json.loads(line) for line in
           capsys.readouterr().out.strip().splitlines()]
    assert out[0] == {"conforms": False, "results": 2}
    sev = sorted((r["severity"], r["focus_node"]) for r in out[1:])
    # d1: PDF Violation + no-csv Warning; d2 conforms (has csv)
    assert sev == [("Violation", "http://example.org/d1"),
                   ("Warning", "http://example.org/d1")]
