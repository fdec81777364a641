"""BGP constraint evaluator (sh:sparql analog, SURVEY §2.10)."""

import pytest

from shacl_validator_ray.stages import shacl
from shacl_validator_ray.stages.bgp import BGPConstraint
from shacl_validator_ray.state import shapes as shapes_mod

from test_shacl import _ds_from_ttl_text

EX = "http://example.org/"

DATA = """
@prefix ex: <http://example.org/> .
ex:d1 a ex:Dataset ; ex:dist ex:z1 .
ex:d2 a ex:Dataset ; ex:dist ex:z2 .
ex:d3 a ex:Dataset ; ex:dist ex:z3 .
ex:other ex:dist ex:z4 .
ex:z1 ex:format "application/pdf" .
ex:z2 ex:format "text/csv" .
ex:z3 ex:format "application/pdf" .
ex:z4 ex:format "application/pdf" .
"""


def _focus(viols):
    return sorted(r["focus_node"].rsplit("/")[-1]
                  for r in viols.to_pandas().to_dict("records"))


def test_bgp_two_pattern_join():
    cc = BGPConstraint(
        patterns=[("$this", EX + "dist", "?z"),
                  ("?z", EX + "format", "application/pdf")],
        component=EX + "c#PdfDist")
    got = _focus(cc.violations(_ds_from_ttl_text(DATA)))
    assert got == ["d1", "d3", "other"]


def test_bgp_filter_fn_as_sparql_filter():
    cc = BGPConstraint(
        patterns=[("$this", EX + "dist", "?z"),
                  ("?z", EX + "format", "?f")],
        component=EX + "c#BadFmt",
        filter_fn=lambda df: df["?f"] == "text/csv")
    assert _focus(cc.violations(_ds_from_ttl_text(DATA))) == ["d2"]


def test_bgp_target_restricts_focus():
    cc = BGPConstraint(
        patterns=[("$this", EX + "dist", "?z"),
                  ("?z", EX + "format", "application/pdf")],
        component=EX + "c#PdfDist",
        target=shapes_mod.Target("class", EX + "Dataset"))
    # runs through validate()'s custom hook so the class-membership
    # broadcast is collected for the target
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:Nothing ;
        sh:property [ sh:path ex:unused ; sh:maxCount 99 ] .
    """
    viols = shacl.validate(_ds_from_ttl_text(DATA), shapes_ttl,
                           concurrency=1, custom=[cc])
    got = [r for r in viols.to_pandas().to_dict("records")
           if "PdfDist" in r["source_constraint_component"]]
    assert sorted(r["focus_node"].rsplit("/")[-1] for r in got) == \
        ["d1", "d3"]  # ex:other has no rdf:type ex:Dataset


def test_bgp_rejects_cross_product_and_missing_this():
    with pytest.raises(ValueError, match="cross products"):
        BGPConstraint(patterns=[("$this", EX + "p", "?a"),
                                ("?b", EX + "q", "?c")],
                      component=EX + "c#X")
    with pytest.raises(ValueError, match="binds \\$this"):
        BGPConstraint(patterns=[("?a", EX + "p", "?b")],
                      component=EX + "c#X")


def test_bgp_variable_predicate():
    """A variable in predicate position binds the pred column and can
    carry a FILTER and join across patterns on the shared pred var."""
    cc = BGPConstraint(
        patterns=[("$this", "?p", "application/pdf")],
        component=EX + "c#AnyPdf")
    got = _focus(cc.violations(_ds_from_ttl_text(DATA)))
    assert got == ["z1", "z3", "z4"]

    # FILTER over the predicate variable
    cc2 = BGPConstraint(
        patterns=[("$this", "?p", "application/pdf")],
        filter_fn=lambda df: df["?p"].str.endswith("format"),
        component=EX + "c#AnyPdfFmt")
    assert _focus(cc2.violations(_ds_from_ttl_text(DATA))) == \
        ["z1", "z3", "z4"]

    # shared predicate var joins two patterns: some predicate links
    # $this to BOTH z1's value and z2's value
    data = DATA + "\nex:w ex:format \"text/csv\" .\n"
    cc3 = BGPConstraint(
        patterns=[("$this", "?p", "text/csv"),
                  ("?other", "?p", "application/pdf")],
        component=EX + "c#SharedPred")
    assert _focus(cc3.violations(_ds_from_ttl_text(data))) == ["w", "z2"]


def test_bgp_sequence_and_alt_paths_in_patterns():
    """Property paths inside patterns: a seq path collapses the 2-hop
    join, an alt path matches either predicate; both reuse the shapes
    path derivation (virtual pred rows scanned only by path patterns)."""
    cc = BGPConstraint(
        patterns=[("$this", ("seq", [EX + "dist", EX + "format"]),
                   "application/pdf")],
        component=EX + "c#PdfViaPath")
    assert _focus(cc.violations(_ds_from_ttl_text(DATA))) == \
        ["d1", "d3", "other"]

    data = DATA + """
    @prefix ex: <http://example.org/> .
    ex:d1 ex:title "t1" .
    ex:d2 ex:label "l2" .
    """
    cc2 = BGPConstraint(
        patterns=[("$this", ("alt", [EX + "title", EX + "label"]), "?v")],
        component=EX + "c#Labeled")
    assert _focus(cc2.violations(_ds_from_ttl_text(data))) == ["d1", "d2"]


def test_bgp_closure_and_inverse_paths_in_patterns():
    """p+ closure inside a pattern reaches transitively; inverse path
    flips direction."""
    data = """
    @prefix ex: <http://example.org/> .
    ex:a ex:part ex:b .
    ex:b ex:part ex:c .
    ex:c ex:part ex:d .
    ex:d ex:leaf "x" .
    """
    cc = BGPConstraint(
        patterns=[("$this", ("plus", EX + "part"), "?n"),
                  ("?n", EX + "leaf", "x")],
        component=EX + "c#ReachesLeaf")
    assert _focus(cc.violations(_ds_from_ttl_text(data))) == ["a", "b", "c"]

    cc2 = BGPConstraint(
        patterns=[("$this", ("inv", EX + "part"), "?parent")],
        component=EX + "c#HasParent")
    assert _focus(cc2.violations(_ds_from_ttl_text(data))) == ["b", "c", "d"]


def test_bgp_three_pattern_chain():
    data = DATA + """
    @prefix ex: <http://example.org/> .
    ex:z1 ex:size "12" .
    ex:z3 ex:size "99" .
    """
    cc = BGPConstraint(
        patterns=[("$this", EX + "dist", "?z"),
                  ("?z", EX + "format", "application/pdf"),
                  ("?z", EX + "size", "?s")],
        component=EX + "c#Sized",
        filter_fn=lambda df: df["?s"].astype(int) > 50)
    assert _focus(cc.violations(_ds_from_ttl_text(data))) == ["d3"]


def test_bgp_not_exists_anti_join():
    """NOT EXISTS: entities with a dist but no csv dist violate."""
    cc = BGPConstraint(
        patterns=[("$this", EX + "dist", "?d")],
        absent_patterns=[("$this", EX + "dist", "?z"),
                         ("?z", EX + "format", "text/csv")],
        component=EX + "c#NoCsv")
    # d2 has a csv dist → conforms; d1/d3/other have dists but no csv
    assert _focus(cc.violations(_ds_from_ttl_text(DATA))) == \
        ["d1", "d3", "other"]


def test_bgp_not_exists_requires_this_in_absent():
    with pytest.raises(ValueError, match="binds \\$this"):
        BGPConstraint(patterns=[("$this", EX + "p", "?a")],
                      absent_patterns=[("?x", EX + "q", "?y")],
                      component=EX + "c#X")


def test_bgp_having_aggregate():
    """GROUP BY $this HAVING count(distinct ?v) OP n — the aggregate
    analog of sh:sparql HAVING constraints."""
    cc = BGPConstraint(
        patterns=[("$this", EX + "dist", "?z")],
        having=("?z", ">", 1),
        component=EX + "c#MultiDist")
    data = DATA + "\nex:d1 ex:dist ex:z9 .\nex:d1 ex:dist ex:z9 .\n"
    # d1 now has 2 DISTINCT dists (z1, z9 — the duplicate row collapses)
    assert _focus(cc.violations(_ds_from_ttl_text(data))) == ["d1"]

    cc2 = BGPConstraint(
        patterns=[("$this", EX + "dist", "?z")],
        having=("?z", "==", 1),
        component=EX + "c#OneDist")
    assert _focus(cc2.violations(_ds_from_ttl_text(data))) == \
        ["d2", "d3", "other"]

    with pytest.raises(ValueError, match="not bound"):
        BGPConstraint(patterns=[("$this", EX + "dist", "?z")],
                      having=("?w", ">", 1), component=EX + "c#X")
    with pytest.raises(ValueError, match="union_patterns"):
        BGPConstraint(
            patterns=[("$this", EX + "dist", "?z")],
            union_patterns=[[("$this", EX + "other", "?z")]],
            having=("?z", ">", 1),
            component=EX + "c#X").violations(_ds_from_ttl_text(DATA))


# ---- SPARQL SELECT parser (sh:select → BGPConstraint) ----------------

from shacl_validator_ray.functions.sparql import (SparqlParseError,
                                                  parse_select)

_PFX = "PREFIX ex: <http://example.org/>\n"


def test_sparql_parse_basic_join_matches_handbuilt():
    cc = parse_select(
        _PFX + """SELECT $this WHERE {
            $this ex:dist ?z . ?z ex:format "application/pdf" . }""",
        component=EX + "c#PdfDist")
    assert cc.patterns == [("$this", EX + "dist", "?z"),
                           ("?z", EX + "format", "application/pdf")]
    got = _focus(cc.violations(_ds_from_ttl_text(DATA)))
    assert got == ["d1", "d3", "other"]


def test_sparql_parse_semicolon_comma_and_a():
    cc = parse_select(
        _PFX + "SELECT $this WHERE { $this a ex:Dataset ; "
               "ex:dist ?z . ?z ex:format \"application/pdf\", \"x\" . }",
        component="c")
    assert cc.patterns == [
        ("$this", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         EX + "Dataset"),
        ("$this", EX + "dist", "?z"),
        ("?z", EX + "format", "application/pdf"),
        ("?z", EX + "format", "x")]


def test_sparql_parse_paths():
    cc = parse_select(
        _PFX + """SELECT $this WHERE {
            $this ex:dist/ex:format "application/pdf" .
            $this ex:a|ex:b ?l .
            $this ^ex:up ?u .
            $this ex:next+ ?n . }""", component="c")
    kinds = sorted(v[0] for v in cc.paths.values())
    assert kinds == ["alt", "inv", "plus", "seq"]


def test_sparql_parse_filter_vectorized():
    cc = parse_select(
        _PFX + """SELECT $this WHERE {
            $this ex:dist ?z . ?z ex:format ?f .
            FILTER (?f = "text/csv" || STRSTARTS(?f, "application")) }""",
        component="c")
    got = _focus(cc.violations(_ds_from_ttl_text(DATA)))
    assert got == ["d1", "d2", "d3", "other"]


def test_sparql_parse_filter_numeric_and_regex():
    import pandas as pd

    cc = parse_select(
        _PFX + """SELECT $this WHERE { $this ex:p ?v .
            FILTER (STRLEN(?v) >= 2 && !REGEX(?v, "^zz")) }""",
        component="c")
    df = pd.DataFrame({"$this": ["a", "b", "c"],
                       "?v": ["ok", "z", "zz9"]})
    assert list(cc.filter_fn(df)) == [True, False, False]


def test_sparql_parse_not_exists_and_union_and_values():
    cc = parse_select(
        _PFX + """SELECT $this WHERE {
            $this ex:dist ?d .
            FILTER NOT EXISTS { $this ex:dist ?z . ?z ex:format "text/csv" . } }""",
        component="c")
    assert cc.absent == [("$this", EX + "dist", "?z"),
                         ("?z", EX + "format", "text/csv")]
    assert _focus(cc.violations(_ds_from_ttl_text(DATA))) == \
        ["d1", "d3", "other"]

    cu = parse_select(
        _PFX + """SELECT $this WHERE {
            $this ex:dist ?d .
            { ?d ex:format "application/pdf" } UNION { ?d ex:format "text/csv" } }""",
        component="c")
    # shared pattern distributes into both alternatives
    assert len(cu.alts) == 1 and cu.patterns[0] == ("$this", EX + "dist", "?d")
    assert _focus(cu.violations(_ds_from_ttl_text(DATA))) == \
        ["d1", "d2", "d3", "other"]

    cv = parse_select(
        _PFX + """SELECT $this WHERE {
            $this ex:dist ?d . ?d ex:format ?f .
            VALUES ?f { "text/csv" } }""", component="c")
    assert _focus(cv.violations(_ds_from_ttl_text(DATA))) == ["d2"]


def test_sparql_parse_nested_optional_chain():
    cc = parse_select(
        _PFX + """SELECT $this WHERE {
            $this a ex:Dataset .
            OPTIONAL { $this ex:dist ?d . OPTIONAL { ?d ex:format ?f } } }""",
        component="c")
    assert cc.optional_chain == [("$this", EX + "dist", "?d"),
                                 ("?d", EX + "format", "?f")]
    rows = cc.violations(_ds_from_ttl_text(DATA)).to_pandas()
    byfocus = {r["focus_node"].rsplit("/")[-1]: (r["value"], r["path"])
               for r in rows.to_dict("records")}
    assert byfocus["d1"] == ("application/pdf", EX + "format")
    assert byfocus["d2"] == ("text/csv", EX + "format")


def test_sparql_parse_having():
    cc = parse_select(
        _PFX + "SELECT $this WHERE { ?d ex:dist $this . } "
               "GROUP BY $this HAVING (COUNT(DISTINCT ?d) > 1)",
        component="c")
    assert cc.having == ("countd", "?d", ">", 1)
    cs = parse_select(
        _PFX + "SELECT $this WHERE { $this ex:dist ?d . ?d ex:size ?s . } "
               "GROUP BY $this HAVING (SUM(?s) > 50)",
        component="c")
    assert cs.having == ("sum", "?s", ">", 50.0)


def test_sparql_parse_errors_are_loud():
    cases = [
        ("SELECT ?x WHERE { ?x a ?y }", "include \\$this"),
        (_PFX + "SELECT $this WHERE { $this ex:p ?v . BIND(?v AS ?w) }",
         "BIND"),
        ("SELECT $this WHERE { $this zz:p ?v }", "undeclared prefix"),
        (_PFX + "SELECT $this WHERE { $this (ex:a/ex:b)|ex:c ?v }",
         "expected an IRI"),  # parenthesized path groups unsupported
        (_PFX + "SELECT $this WHERE { $this ex:p ?v . "
                "VALUES ?w { \"x\" } }", "not bound"),
        (_PFX + "SELECT $this WHERE { $this ex:p ?v } ORDER BY ?v",
         "ORDER BY"),
        (_PFX + "SELECT $this WHERE { $this ex:p ?v . "
                "FILTER (?unbound = \"x\") }", "not bound"),
    ]
    for text, pat in cases:
        with pytest.raises((SparqlParseError, ValueError), match=pat):
            parse_select(text, component="c")


def test_sparql_ttl_profile_end_to_end():
    """A profile TTL carrying sh:sparql validates end-to-end through
    compile_shapes + validate (the reference's data-driven plug-in)."""
    ttl = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:P sh:declare [ sh:prefix "ex" ; sh:namespace "http://example.org/" ] .
ex:S a sh:NodeShape ;
  sh:targetClass ex:Dataset ;
  sh:sparql [
    sh:message "pdf" ;
    sh:prefixes ex:P ;
    sh:select \"\"\"SELECT $this WHERE {
        $this ex:dist ?z . ?z ex:format "application/pdf" . }\"\"\" ;
  ] .
"""
    compiled = shapes_mod.compile_shapes(ttl)
    assert len(compiled.sparql_constraints) == 1
    viols = shacl.validate(_ds_from_ttl_text(DATA), ttl)
    got = _focus(viols)
    # ex:other is NOT typed ex:Dataset → excluded by the target class
    assert got == ["d1", "d3"]


def test_sparql_ttl_missing_select_is_loud():
    ttl = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:targetClass ex:Dataset ;
  sh:sparql [ sh:message "no select here" ] .
"""
    with pytest.raises(ValueError, match="sh:select"):
        shapes_mod.compile_shapes(ttl)


def test_sparql_parse_minus_as_focus_anti_join():
    """MINUS sharing only $this coincides with FILTER NOT EXISTS (the
    distributed focus anti-join); extra shared variables are rejected."""
    cc = parse_select(
        _PFX + """SELECT $this WHERE {
            $this ex:dist ?d .
            MINUS { $this ex:dist ?z . ?z ex:format "text/csv" . } }""",
        component="c")
    assert _focus(cc.violations(_ds_from_ttl_text(DATA))) == \
        ["d1", "d3", "other"]
    with pytest.raises(SparqlParseError, match="per-solution"):
        parse_select(
            _PFX + """SELECT $this WHERE {
                $this ex:dist ?d .
                MINUS { $this ex:dist ?d . ?d ex:format "text/csv" . } }""",
            component="c")


def test_sparql_parse_multivar_values():
    """Multi-variable VALUES rows filter tuple-wise (vectorized merge
    with the broadcast inline table)."""
    cv = parse_select(
        _PFX + """SELECT $this WHERE {
            $this ex:dist ?d . ?d ex:format ?f .
            VALUES (?d ?f) { (ex:z2 "text/csv") (ex:z1 "nope") } }""",
        component="c")
    assert _focus(cv.violations(_ds_from_ttl_text(DATA))) == ["d2"]


def test_bgp_having_numeric_aggregates():
    """SUM/AVG/MIN/MAX HAVING over the distinct solution set: two
    distributions with EQUAL sizes both count (distinctness is per
    solution row, not per value)."""
    data = DATA + """
    @prefix ex: <http://example.org/> .
    ex:d1 ex:dist ex:z9 .
    ex:z1 ex:size "40" .
    ex:z9 ex:size "40" .
    ex:z2 ex:size "10" .
    ex:z3 ex:size "99" .
    """
    def run(having):
        cc = BGPConstraint(
            patterns=[("$this", EX + "dist", "?z"),
                      ("?z", EX + "size", "?s")],
            having=having, component=EX + "c#H")
        return _focus(cc.violations(_ds_from_ttl_text(data)))

    # d1: z1=40 + z9=40 → sum 80 (equal values both count)
    assert run(("sum", "?s", ">", 75)) == ["d1", "d3"]   # d3: 99
    assert run(("avg", "?s", "==", 40)) == ["d1"]
    assert run(("min", "?s", "<", 20)) == ["d2"]
    assert run(("max", "?s", ">=", 99)) == ["d3"]
    assert run(("count", "?s", ">", 1)) == ["d1"]
    with pytest.raises(ValueError, match="aggregate"):
        run(("median", "?s", ">", 1))


def test_sparql_filter_over_optional_bindings():
    """FILTER referencing an OPTIONAL variable promotes the chain (an
    unbound variable errors the row away in SPARQL, so the filter forces
    a match); !BOUND becomes the focus anti-join; annotation survives
    promotion."""
    data = DATA + """
    @prefix ex: <http://example.org/> .
    ex:z1 ex:size "99" .
    ex:z2 ex:size "10" .
    """
    # comparison over the optional var: only focus nodes whose chain
    # matched AND passed the filter remain (d1: z1 size 99 > 50)
    cc = parse_select(
        _PFX + """SELECT $this WHERE {
            $this a ex:Dataset .
            OPTIONAL { $this ex:dist ?d . OPTIONAL { ?d ex:size ?s } }
            FILTER (?s > 50) }""", component="c")
    rows = cc.violations(_ds_from_ttl_text(data)).to_pandas()
    assert sorted(r.rsplit("/")[-1] for r in rows["focus_node"]) == ["d1"]
    assert rows["value"].iloc[0] == "99"  # annotation survives promotion

    # BOUND(?d): the chain must have matched; no residual filter
    cb = parse_select(
        _PFX + """SELECT $this WHERE {
            $this a ex:Dataset .
            OPTIONAL { $this ex:dist ?d }
            FILTER (BOUND(?d)) }""", component="c")
    assert _focus(cb.violations(_ds_from_ttl_text(data))) == \
        ["d1", "d2", "d3"]

    # !BOUND(?s): datasets whose dist chain never reaches a size — the
    # missing-property idiom as a distributed anti-join
    cn = parse_select(
        _PFX + """SELECT $this WHERE {
            $this a ex:Dataset .
            OPTIONAL { $this ex:dist ?d . OPTIONAL { ?d ex:size ?s } }
            FILTER (!BOUND(?s)) }""", component="c")
    assert _focus(cn.violations(_ds_from_ttl_text(data))) == ["d3"]

    # mixing !BOUND with other optional-var filters is rejected
    with pytest.raises(SparqlParseError, match="cannot combine"):
        parse_select(
            _PFX + """SELECT $this WHERE {
                $this a ex:Dataset .
                OPTIONAL { $this ex:dist ?d }
                FILTER (!BOUND(?d)) FILTER (?d = "x") }""", component="c")


def test_sparql_value_projection():
    """SELECT $this ?value emits ONE result per distinct (focus, value)
    solution pair with the binding in the value column — the
    SHACL-SPARQL result cardinality."""
    cc = parse_select(
        _PFX + """SELECT $this ?value WHERE {
            $this ex:dist ?value . ?value ex:format "application/pdf" . }""",
        component="c")
    rows = cc.violations(_ds_from_ttl_text(DATA)).to_pandas()
    got = sorted((r["focus_node"].rsplit("/")[-1],
                  r["value"].rsplit("/")[-1])
                 for r in rows.to_dict("records"))
    assert got == [("d1", "z1"), ("d3", "z3"), ("other", "z4")]

    # combined with NOT EXISTS: pairs survive the focus anti-join
    cn = parse_select(
        _PFX + """SELECT $this ?value WHERE {
            $this ex:dist ?value .
            FILTER NOT EXISTS { $this ex:dist ?z . ?z ex:format "text/csv" . } }""",
        component="c")
    rows = cn.violations(_ds_from_ttl_text(DATA)).to_pandas()
    got = sorted((r["focus_node"].rsplit("/")[-1],
                  r["value"].rsplit("/")[-1])
                 for r in rows.to_dict("records"))
    assert got == [("d1", "z1"), ("d3", "z3"), ("other", "z4")]

    with pytest.raises(ValueError, match="value_var"):
        BGPConstraint(patterns=[("$this", EX + "p", "?v")],
                      value_var="?unbound", component="c")
    with pytest.raises(ValueError, match="cannot combine"):
        BGPConstraint(patterns=[("$this", EX + "p", "?v")],
                      value_var="?v",
                      optional_pattern=("$this", EX + "q", "?w"),
                      component="c")


def test_sparql_optional_with_path_annotation():
    """A property path inside OPTIONAL annotates with the canonical
    path string as the report path (alt path here)."""
    data = DATA + """
    @prefix ex: <http://example.org/> .
    ex:d1 ex:title "T1" .
    ex:d2 ex:label "L2" .
    """
    cc = parse_select(
        _PFX + """SELECT $this WHERE {
            $this a ex:Dataset .
            OPTIONAL { $this ex:title|ex:label ?t } }""", component="c")
    rows = cc.violations(_ds_from_ttl_text(data)).to_pandas()
    by = {r["focus_node"].rsplit("/")[-1]: (r["value"], r["path"])
          for r in rows.to_dict("records")}
    alt = f"({EX}title | {EX}label)"
    assert by["d1"] == ("T1", alt)
    assert by["d2"] == ("L2", alt)
    assert by["d3"][1] == ""  # unmatched: value = focus, no path


def test_sparql_message_templating():
    """{$this} / {?value} in sh:message substitute per result."""
    cc = parse_select(
        _PFX + """SELECT $this ?value WHERE {
            $this ex:dist ?value . ?value ex:format "application/pdf" . }""",
        component="c", message="dataset {$this} offers PDF dist {?value}")
    rows = cc.violations(_ds_from_ttl_text(DATA)).to_pandas()
    msgs = {r["focus_node"].rsplit("/")[-1]: r["message"][0]["text"]
            for r in rows.to_dict("records")}
    assert msgs["d1"] == ("dataset http://example.org/d1 offers PDF dist "
                          "http://example.org/z1")
