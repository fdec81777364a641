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


def test_bgp_rejects_cross_product_and_var_predicate():
    with pytest.raises(ValueError, match="cross products"):
        BGPConstraint(patterns=[("$this", EX + "p", "?a"),
                                ("?b", EX + "q", "?c")],
                      component=EX + "c#X")
    with pytest.raises(ValueError, match="constant IRI"):
        BGPConstraint(patterns=[("$this", "?p", "?a")],
                      component=EX + "c#X")
    with pytest.raises(ValueError, match="binds \\$this"):
        BGPConstraint(patterns=[("?a", EX + "p", "?b")],
                      component=EX + "c#X")


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
