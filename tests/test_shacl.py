"""Turtle parser, shape compiler, and distributed SHACL validation tests.

The e2e test validates the extracted synthetic corpus and compares the
full violation set against an INDEPENDENT pure-Python mini-validator run
over the ground-truth triples (different code path — the test oracle).
"""

import os
import re

import pyarrow as pa
import ray.data as rd

from shacl_validator_ray import schema as S, synth
from shacl_validator_ray.functions import ns, turtle
from shacl_validator_ray.stages import extract, shacl
from shacl_validator_ray.state import shapes as shapes_mod

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _read(p):
    with open(p) as f:
        return f.read()


def _triples_ds(ttl_path):
    rows = turtle.parse_turtle(_read(ttl_path))
    tbl = pa.Table.from_pylist(
        [{"subj": s, "pred": p, "obj_kind": k, "obj_value": v,
          "obj_datatype": dt, "obj_lang": lg, "doc_id": "d0", "span_idx": 0}
         for s, p, k, v, dt, lg in rows], schema=S.TRIPLES)
    return rd.from_arrow(tbl)


def test_turtle_parser_basics():
    ttl = """
    @prefix ex: <http://example.org/> .
    @prefix dct: <http://purl.org/dc/terms/> .
    ex:a a ex:Thing ;
        dct:title "Hello \\"W\\""@en , "Hola"@es ;
        ex:n 42 ;
        ex:f 3.5 ;
        ex:ok true ;
        ex:rel [ ex:p ex:b ] ;
        dct:issued "2021-01-01T00:00:00Z"^^<http://www.w3.org/2001/XMLSchema#dateTime> .
    """
    rows = turtle.parse_turtle(ttl)
    by_pred = {}
    for s, p, k, v, dt, lg in rows:
        by_pred.setdefault(p, []).append((k, v, dt, lg))
    assert by_pred[ns.RDF_TYPE][0] == ("iri", "http://example.org/Thing", "", "")
    titles = sorted(by_pred["http://purl.org/dc/terms/title"])
    assert ("literal", 'Hello "W"', "", "en") in titles
    assert ("literal", "Hola", "", "es") in titles
    assert by_pred["http://example.org/n"][0][:3] == ("literal", "42", ns.XSD + "integer")
    assert by_pred["http://example.org/ok"][0][:3] == ("literal", "true", ns.XSD + "boolean")
    assert by_pred["http://purl.org/dc/terms/issued"][0][2] == ns.XSD + "dateTime"
    # blank node property list produced a nested triple
    assert any(p == "http://example.org/p" for _, p, *_ in rows)
    # round-trip through the canonical serializer re-parses to the same set
    # (modulo blank-node relabeling — labels are doc-scoped on parse, J2)
    def norm(trs):
        names = {}

        def nm(x):
            if x.startswith("_:"):
                return names.setdefault(x, f"_:n{len(names)}")
            return x

        return {(nm(s), p, k, nm(v) if k == "blank" else v, dt, lg)
                for s, p, k, v, dt, lg in trs}

    nt = turtle.serialize_ntriples(rows)
    assert norm(turtle.parse_turtle(nt)) == norm(rows)


def test_turtle_xsd_string_canonicalized():
    """RDF 1.1: "x" and "x"^^xsd:string are the same term — both parse to
    the engine's canonical plain-literal spelling (empty datatype), so
    the two spellings dedup together and sh:datatype xsd:string matches."""
    ttl = ('@prefix ex: <http://example.org/> . '
           '@prefix xsd: <http://www.w3.org/2001/XMLSchema#> . '
           'ex:a ex:p "plain" . ex:b ex:p "typed"^^xsd:string .')
    rows = turtle.parse_turtle(ttl)
    dts = {v: dt for _, _, _, v, dt, _ in rows}
    assert dts["plain"] == "" and dts["typed"] == ""


def test_turtle_numeric_exponent_types():
    """Exponent forms are xsd:double per the Turtle grammar (N3.js parity);
    '.'-only forms are xsd:decimal; bare integers xsd:integer."""
    ttl = ('@prefix ex: <http://example.org/> . '
           'ex:a ex:p 1e3 , 2.5e-2 , 3.14 , 7 .')
    rows = turtle.parse_turtle(ttl)
    dts = {v: dt for _, _, _, v, dt, _ in rows}
    assert dts["1e3"] == ns.XSD + "double"
    assert dts["2.5e-2"] == ns.XSD + "double"
    assert dts["3.14"] == ns.XSD + "decimal"
    assert dts["7"] == ns.XSD + "integer"


def test_composite_node_kinds():
    """sh:BlankNodeOrIRI admits both kinds; unknown nodeKind values are
    rejected at compile time instead of mass-false-flagging."""
    import pytest

    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
         sh:property [ sh:path ex:p ; sh:nodeKind sh:BlankNodeOrIRI ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:x a ex:T ; ex:p ex:ok , _:b1 , "bad literal" .
    """
    rows = turtle.parse_turtle(data_ttl)
    tbl = pa.Table.from_pylist(
        [{"subj": s, "pred": p, "obj_kind": k, "obj_value": v,
          "obj_datatype": dt, "obj_lang": lg, "doc_id": "d0", "span_idx": 0}
         for s, p, k, v, dt, lg in rows], schema=S.TRIPLES)
    viols = shacl.validate(rd.from_arrow(tbl), shapes_ttl, concurrency=1)
    recs = viols.to_pandas().to_dict("records")
    assert len(recs) == 1 and recs[0]["value"] == "bad literal"

    with pytest.raises(ValueError, match="nodeKind"):
        shapes_mod.compile_shapes(shapes_ttl.replace(
            "sh:BlankNodeOrIRI", "sh:NoSuchKind"))


def test_datatype_xsd_string_and_langstring():
    """sh:datatype xsd:string accepts plain literals; lang-tagged literals
    are rdf:langString, not xsd:string (RDF 1.1 semantics)."""
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
         sh:property [ sh:path ex:p ; sh:datatype xsd:string ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    ex:x a ex:T ; ex:p "plain" , "typed"^^xsd:string , "tagged"@en , 5 .
    """
    rows = turtle.parse_turtle(data_ttl)
    tbl = pa.Table.from_pylist(
        [{"subj": s, "pred": p, "obj_kind": k, "obj_value": v,
          "obj_datatype": dt, "obj_lang": lg, "doc_id": "d0", "span_idx": 0}
         for s, p, k, v, dt, lg in rows], schema=S.TRIPLES)
    viols = shacl.validate(rd.from_arrow(tbl), shapes_ttl, concurrency=1)
    bad = sorted(r["value"] for r in viols.to_pandas().to_dict("records"))
    assert bad == ["5", "tagged"]


def _ds_from_ttl_text(ttl: str):
    rows = turtle.parse_turtle(ttl)
    tbl = pa.Table.from_pylist(
        [{"subj": s, "pred": p, "obj_kind": k, "obj_value": v,
          "obj_datatype": dt, "obj_lang": lg, "doc_id": "d0", "span_idx": 0}
         for s, p, k, v, dt, lg in rows], schema=S.TRIPLES)
    return rd.from_arrow(tbl)


def test_turtle_collections():
    ttl = ('@prefix ex: <http://example.org/> . '
           'ex:a ex:list ( ex:x "lit" 2 ) ; ex:empty ( ) .')
    rows = turtle.parse_turtle(ttl)
    by_pred = {}
    for s, p, k, v, dt, lg in rows:
        by_pred.setdefault(p, []).append((s, k, v))
    firsts = [v for _, k, v in by_pred[ns.RDF + "first"]]
    assert firsts == ["http://example.org/x", "lit", "2"]
    rests = [v for _, k, v in by_pred[ns.RDF + "rest"]]
    assert rests[-1] == ns.RDF + "nil"
    # empty collection → rdf:nil object directly
    assert by_pred["http://example.org/empty"][0][2] == ns.RDF + "nil"


def test_sequence_path_validation():
    """sh:path ( ex:a ex:b ): constraints apply to the two-hop value set,
    deduped across intermediates (SET semantics)."""
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
         sh:property [ sh:path ( ex:a ex:b ) ; sh:pattern "^good" ;
                       sh:minCount 1 ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:x a ex:T ; ex:a ex:m1 , ex:m2 .
    ex:m1 ex:b "good one" , "bad value" .
    ex:m2 ex:b "good one" .
    ex:y a ex:T .
    """
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl, concurrency=1)
    recs = viols.to_pandas().to_dict("records")
    got = {(r["focus_node"].rsplit("/")[-1],
            r["source_constraint_component"].rsplit("#", 1)[-1], r["value"])
           for r in recs}
    # "good one" reachable via BOTH m1 and m2 → one value node, no dup rows
    assert len(recs) == 2, recs
    assert got == {("x", "PatternConstraintComponent", "bad value"),
                   ("y", "MinCountConstraintComponent", "")}
    assert all(r["path"] == "http://example.org/a/http://example.org/b"
               for r in recs)


def test_seq_common_prefix_planner():
    """Sequence chains sharing a predicate prefix (a/b/c, a/b/d, a/b)
    reuse the memoized reach-pair intermediates — each distinct prefix
    is computed exactly once — and derived value sets are unchanged."""
    a, b, c, d = (f"http://example.org/{p}" for p in "abcd")
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:x ex:a ex:m1 , ex:m2 .
    ex:m1 ex:b ex:n1 .
    ex:m2 ex:b ex:n2 .
    ex:n1 ex:c "via-c" .
    ex:n2 ex:d "via-d" .
    """
    triples = _ds_from_ttl_text(data_ttl)

    class CountingCache(dict):
        def __init__(self):
            super().__init__()
            self.computed = []

        def __setitem__(self, k, v):
            self.computed.append(k)
            super().__setitem__(k, v)

    cache = CountingCache()
    got = {}
    for path, preds in ((f"{a}/{b}/{c}", (a, b, c)),
                        (f"{a}/{b}/{d}", (a, b, d)),
                        (f"{a}/{b}", (a, b))):
        rows = shacl._seq_rows(triples, path, preds, 4, cache).to_pandas()
        got[path] = set(zip(rows["subj"], rows["obj_value"]))
    assert sorted(cache.computed) == [(a,), (a, b)], cache.computed
    ex = "http://example.org/"
    assert got[f"{a}/{b}/{c}"] == {(ex + "x", "via-c")}
    assert got[f"{a}/{b}/{d}"] == {(ex + "x", "via-d")}
    assert got[f"{a}/{b}"] == {(ex + "x", ex + "n1"), (ex + "x", ex + "n2")}


def test_alternative_path_validation():
    """sh:alternativePath ( a b ): value set is the union over predicates."""
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
         sh:property [ sh:path [ sh:alternativePath ( ex:a ex:b ) ] ;
                       sh:minCount 1 ; sh:maxCount 2 ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:ok a ex:T ; ex:a "v1" .
    ex:ok2 a ex:T ; ex:b "v1" ; ex:a "v2" .
    ex:none a ex:T .
    ex:many a ex:T ; ex:a "v1" , "v2" ; ex:b "v3" .
    ex:shared a ex:T ; ex:a "same" ; ex:b "same" .
    """
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl, concurrency=1)
    got = {(r["focus_node"].rsplit("/")[-1],
            r["source_constraint_component"].rsplit("#", 1)[-1])
           for r in viols.to_pandas().to_dict("records")}
    # "same" via both predicates is ONE value → shared conforms (1 ≤ 1 ≤ 2)
    assert got == {("none", "MinCountConstraintComponent"),
                   ("many", "MaxCountConstraintComponent")}


def test_inverse_path_validation():
    """sh:inversePath: value nodes are the SUBJECTS pointing at the focus."""
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetObjectsOf ex:tag ;
         sh:property [ sh:path [ sh:inversePath ex:tag ] ;
                       sh:maxCount 2 ; sh:nodeKind sh:IRI ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:a ex:tag ex:t1 , ex:t2 .
    ex:b ex:tag ex:t1 .
    ex:c ex:tag ex:t1 .
    _:blank ex:tag ex:t2 .
    """
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl, concurrency=1)
    got = {(r["focus_node"].rsplit("/")[-1],
            r["source_constraint_component"].rsplit("#", 1)[-1])
           for r in viols.to_pandas().to_dict("records")}
    # t1 has 3 inverse values (a,b,c) → maxCount; t2's blank subject → nodeKind
    assert got == {("t1", "MaxCountConstraintComponent"),
                   ("t2", "NodeKindConstraintComponent")}


def test_closure_paths_zero_and_one_or_more():
    """sh:oneOrMorePath (bounded transitive closure) and sh:zeroOrMorePath
    (closure + identity: the focus reaches itself in zero steps)."""
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:S1 a sh:NodeShape ; sh:targetNode ex:a ;
          sh:property [ sh:path [ sh:oneOrMorePath ex:next ] ; sh:minCount 3 ] .
    ex:S2 a sh:NodeShape ; sh:targetNode ex:x ;
          sh:property [ sh:path [ sh:oneOrMorePath ex:next ] ; sh:minCount 3 ] .
    ex:S3 a sh:NodeShape ; sh:targetNode ex:leaf ;
          sh:property [ sh:path [ sh:zeroOrMorePath ex:next ] ; sh:minCount 1 ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:a ex:next ex:b . ex:b ex:next ex:c . ex:c ex:next ex:d .
    ex:x ex:next ex:y .
    ex:leaf a ex:Leaf .
    """
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl, concurrency=1)
    got = {(r["focus_node"].rsplit("/")[-1], r["path"],
            r["source_constraint_component"].rsplit("#", 1)[-1])
           for r in viols.to_pandas().to_dict("records")}
    # a reaches {b,c,d} via next+ (3 ≥ 3, conforms); x reaches only {y};
    # leaf reaches itself via next* (zero step, conforms)
    assert got == {("x", "http://example.org/next+",
                    "MinCountConstraintComponent")}, got


def test_target_selectors():
    """sh:targetNode / sh:targetSubjectsOf / sh:targetObjectsOf."""
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:NodeS a sh:NodeShape ; sh:targetNode ex:n1 , ex:n2 ;
         sh:property [ sh:path ex:p ; sh:minCount 1 ] .
    ex:SubS a sh:NodeShape ; sh:targetSubjectsOf ex:q ;
         sh:property [ sh:path ex:q ; sh:maxCount 1 ] .
    ex:ObjS a sh:NodeShape ; sh:targetObjectsOf ex:r ;
         sh:property [ sh:path ex:p ; sh:minCount 1 ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:n1 ex:p "present" .
    ex:s1 ex:q "one" ; ex:r ex:o1 .
    ex:s2 ex:q "one" , "two" .
    ex:o1 ex:p "present" .
    ex:s3 ex:r ex:o2 .
    """
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl, concurrency=1)
    got = {(r["focus_node"].rsplit("/")[-1],
            r["source_constraint_component"].rsplit("#", 1)[-1])
           for r in viols.to_pandas().to_dict("records")}
    # n2 (targetNode, absent from the data!), s2 (two ex:q), o2 (no ex:p)
    assert got == {("n2", "MinCountConstraintComponent"),
                   ("s2", "MaxCountConstraintComponent"),
                   ("o2", "MinCountConstraintComponent")}


def test_length_in_hasvalue_components():
    """sh:minLength / sh:maxLength / sh:in / sh:hasValue."""
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
         sh:property [ sh:path ex:code ; sh:minLength 3 ; sh:maxLength 5 ] ;
         sh:property [ sh:path ex:fmt ; sh:in ( "csv" "json" ) ] ;
         sh:property [ sh:path ex:flag ; sh:hasValue "on" ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:x a ex:T ; ex:code "abcd" ; ex:fmt "csv" ; ex:flag "on" , "extra" .
    ex:y a ex:T ; ex:code "ab" ; ex:fmt "xml" ; ex:flag "off" .
    ex:z a ex:T ; ex:code "toolong" .
    """
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl, concurrency=1)
    got = {(r["focus_node"].rsplit("/")[-1],
            r["source_constraint_component"].rsplit("#", 1)[-1], r["value"])
           for r in viols.to_pandas().to_dict("records")}
    assert got == {("y", "MinLengthConstraintComponent", "ab"),
                   ("z", "MaxLengthConstraintComponent", "toolong"),
                   ("y", "InConstraintComponent", "xml"),
                   ("y", "HasValueConstraintComponent", ""),
                   ("z", "HasValueConstraintComponent", "")}


def test_language_in_and_unique_lang():
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
         sh:property [ sh:path ex:label ; sh:languageIn ( "en" "es" ) ;
                       sh:uniqueLang true ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:a a ex:T ; ex:label "hello"@en , "hola"@es .
    ex:b a ex:T ; ex:label "bonjour"@fr , "plain" .
    ex:c a ex:T ; ex:label "one"@en , "two"@en .
    """
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl, concurrency=1)
    got = {(r["focus_node"].rsplit("/")[-1],
            r["source_constraint_component"].rsplit("#", 1)[-1], r["value"])
           for r in viols.to_pandas().to_dict("records")}
    assert got == {("b", "LanguageInConstraintComponent", "bonjour"),
                   ("b", "LanguageInConstraintComponent", "plain"),
                   ("c", "UniqueLangConstraintComponent", "en")}, got


def test_closed_shape():
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:closed true ;
         sh:ignoredProperties ( rdf:type ) ;
         sh:property [ sh:path ex:name ; sh:minCount 1 ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:a a ex:T ; ex:name "fine" .
    ex:b a ex:T ; ex:name "n" ; ex:sneaky "extra" .
    ex:out ex:sneaky "not focused" .
    """
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl, concurrency=1)
    got = {(r["focus_node"].rsplit("/")[-1], r["path"].rsplit("/")[-1],
            r["source_constraint_component"].rsplit("#", 1)[-1])
           for r in viols.to_pandas().to_dict("records")}
    assert got == {("b", "sneaky", "ClosedConstraintComponent")}, got


def test_less_than_fast_paths_match_loop_semantics():
    """The numeric / string vectorized lessThan* fast paths must agree
    with the exact per-row _pair_lt reference on randomized value sets;
    a mixed bucket exercises the fallback loop itself."""
    import random

    rng = random.Random(7)
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
         sh:property [ sh:path ex:lo ; sh:lessThan ex:hi ] ;
         sh:property [ sh:path ex:le ; sh:lessThanOrEquals ex:hi ] .
    """
    pools = {"num": lambda: str(rng.choice([1, 2.5, 30, -4, 1e2])),
             "str": lambda: rng.choice(["apple", "pear", "zed", "kiwi"]),
             "mix": lambda: rng.choice(["apple", "7", "pear", "2.5"])}
    lines = []
    entities = []
    for i in range(60):
        kind = ("num", "str", "mix")[i % 3]
        los = [pools[kind]() for _ in range(rng.randint(0, 3))]
        les = [pools[kind]() for _ in range(rng.randint(0, 3))]
        his = [pools[kind]() for _ in range(rng.randint(0, 3))]
        ent = f"e{kind}{i}"
        entities.append((ent, los, les, his))
        parts = [f"ex:{ent} a ex:T"]
        parts += [f'ex:lo "{v}"' for v in los]
        parts += [f'ex:le "{v}"' for v in les]
        parts += [f'ex:hi "{v}"' for v in his]
        lines.append(" ; ".join(parts) + " .")
    data_ttl = "@prefix ex: <http://example.org/> .\n" + "\n".join(lines)

    expected = set()
    for ent, los, les, his in entities:
        for v in set(los):
            if any(not shacl._pair_lt(v, w) for w in set(his)):
                expected.add((ent, "LessThanConstraintComponent", v))
        for v in set(les):
            if any(shacl._pair_lt(w, v) for w in set(his)):
                expected.add((ent, "LessThanOrEqualsConstraintComponent", v))

    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl,
                           concurrency=1)
    got = {(r["focus_node"].rsplit("/")[-1],
            r["source_constraint_component"].rsplit("#", 1)[-1], r["value"])
           for r in viols.to_pandas().to_dict("records")}
    assert got == expected, got.symmetric_difference(expected)


def test_property_pair_constraints():
    """sh:equals / sh:disjoint / sh:lessThan / sh:lessThanOrEquals."""
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:Eq a sh:NodeShape ; sh:targetClass ex:T ;
         sh:property [ sh:path ex:a ; sh:equals ex:b ] ;
         sh:property [ sh:path ex:c ; sh:disjoint ex:d ] ;
         sh:property [ sh:path ex:lo ; sh:lessThan ex:hi ] ;
         sh:property [ sh:path ex:le ; sh:lessThanOrEquals ex:hi ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:ok a ex:T ; ex:a "x" ; ex:b "x" ; ex:c "p" ; ex:d "q" ;
          ex:lo 1 ; ex:le 5 ; ex:hi 5 .
    ex:bad a ex:T ; ex:a "x" ; ex:b "y" ; ex:c "same" ; ex:d "same" ;
           ex:lo 9 ; ex:le 6 ; ex:hi 5 .
    """
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl, concurrency=1)
    got = {(r["focus_node"].rsplit("/")[-1],
            r["source_constraint_component"].rsplit("#", 1)[-1], r["value"])
           for r in viols.to_pandas().to_dict("records")}
    assert got == {("bad", "EqualsConstraintComponent", "x"),
                   ("bad", "EqualsConstraintComponent", "y"),
                   ("bad", "DisjointConstraintComponent", "same"),
                   ("bad", "LessThanConstraintComponent", "9"),
                   ("bad", "LessThanOrEqualsConstraintComponent", "6")}, got


def test_value_range_components():
    """sh:minInclusive / maxInclusive / minExclusive / maxExclusive with
    numeric comparison (string fallback)."""
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
         sh:property [ sh:path ex:n ; sh:minInclusive 0 ; sh:maxInclusive 10 ] ;
         sh:property [ sh:path ex:x ; sh:minExclusive 0 ; sh:maxExclusive 10 ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:a a ex:T ; ex:n 0 , 10 , 11 , -1 ; ex:x 0 , 5 , 10 .
    """
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl, concurrency=1)
    got = {(r["source_constraint_component"].rsplit("#", 1)[-1], r["value"])
           for r in viols.to_pandas().to_dict("records")}
    assert got == {("MinInclusiveConstraintComponent", "-1"),
                   ("MaxInclusiveConstraintComponent", "11"),
                   ("MinExclusiveConstraintComponent", "0"),
                   ("MaxExclusiveConstraintComponent", "10")}, got


def test_and_xone_logical_constraints():
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
         sh:property [ sh:path ex:a ;
                       sh:and ( [ sh:minLength 2 ] [ sh:pattern "^x" ] ) ] ;
         sh:property [ sh:path ex:b ;
                       sh:xone ( [ sh:datatype xsd:integer ]
                                 [ sh:pattern "^[0-9]+$" ] ) ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:p a ex:T ; ex:a "xy" ; ex:b "abc" .
    ex:q a ex:T ; ex:a "x" ; ex:b 7 .
    """
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl, concurrency=1)
    got = {(r["focus_node"].rsplit("/")[-1],
            r["source_constraint_component"].rsplit("#", 1)[-1], r["value"])
           for r in viols.to_pandas().to_dict("records")}
    # q's "x" fails minLength branch of the AND; p's "abc" matches NEITHER
    # xone branch (0 ≠ 1); q's typed 7 matches BOTH branches (2 ≠ 1)
    assert got == {("q", "AndConstraintComponent", "x"),
                   ("p", "XoneConstraintComponent", "abc"),
                   ("q", "XoneConstraintComponent", "7")}, got


def test_qualified_value_shape():
    """sh:qualifiedValueShape + qualifiedMin/MaxCount: count only values
    conforming to the qualified bundle, including the ABSENCE case."""
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
         sh:property [ sh:path ex:tag ;
                       sh:qualifiedValueShape [ sh:pattern "^good" ] ;
                       sh:qualifiedMinCount 1 ; sh:qualifiedMaxCount 2 ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:a a ex:T ; ex:tag "good one" , "bad" .
    ex:b a ex:T ; ex:tag "bad only" .
    ex:c a ex:T .
    ex:d a ex:T ; ex:tag "good 1" , "good 2" , "good 3" .
    """
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl, concurrency=1)
    got = {(r["focus_node"].rsplit("/")[-1],
            r["source_constraint_component"].rsplit("#", 1)[-1])
           for r in viols.to_pandas().to_dict("records")}
    assert got == {("b", "QualifiedMinCountConstraintComponent"),
                   ("c", "QualifiedMinCountConstraintComponent"),
                   ("d", "QualifiedMaxCountConstraintComponent")}, got


def test_sh_node_nested_shape():
    """sh:node: value nodes must conform to the referenced node shape;
    nested findings stay in the report (shacl-engine details:true) plus
    one NodeConstraintComponent finding on the referencing focus per
    nonconforming value — including ABSENCE failures (nested minCount).
    Objects reached from non-focused subjects are NOT validated."""
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:DS ;
         sh:property [ sh:path ex:dist ; sh:node ex:DistNode ] .
    ex:DistNode a sh:NodeShape ;
         sh:property [ sh:path ex:fmt ; sh:minCount 1 ; sh:pattern "^text/" ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:d1 a ex:DS ; ex:dist ex:z1 , ex:z2 , ex:z3 .
    ex:z1 ex:fmt "text/csv" .
    ex:z2 ex:fmt "application/pdf" .
    ex:other ex:dist ex:z4 .
    ex:z4 ex:fmt "application/json" .
    """
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl, concurrency=1)
    got = {(r["focus_node"].rsplit("/")[-1],
            r["source_constraint_component"].rsplit("#", 1)[-1], r["value"])
           for r in viols.to_pandas().to_dict("records")}
    assert got == {
        # nested findings on the value nodes
        ("z2", "PatternConstraintComponent", "application/pdf"),
        ("z3", "MinCountConstraintComponent", ""),
        # parent findings on the referencing focus
        ("d1", "NodeConstraintComponent", "http://example.org/z2"),
        ("d1", "NodeConstraintComponent", "http://example.org/z3"),
    }, got
    # z4 (reached only from the untargeted ex:other) was never validated


def test_deactivated_shapes_skipped():
    """sh:deactivated true on a node shape or a property shape disables it."""
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:Off a sh:NodeShape ; sh:targetClass ex:T ; sh:deactivated true ;
         sh:property [ sh:path ex:p ; sh:minCount 1 ] .
    ex:On a sh:NodeShape ; sh:targetClass ex:T ;
         sh:property [ sh:path ex:q ; sh:minCount 1 ] ;
         sh:property [ sh:path ex:r ; sh:minCount 1 ; sh:deactivated true ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:x a ex:T ; ex:q "present" .
    """
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl, concurrency=1)
    # ex:p (deactivated node shape) and ex:r (deactivated property shape)
    # would both be minCount violations if active
    assert shacl.conforms(viols)


def test_full_profile_report_roundtrip():
    """Integration: violations from the all-families profile serialize to
    a TTL report and parse back to the same flattened rows (S8/S9 with
    every new component IRI)."""
    from shacl_validator_ray.stages import report as report_mod
    from shacl_validator_ray import synth
    from shacl_validator_ray.stages import extract as extract_mod

    docs, _, _mgt = synth.make_corpus_tables(60)
    triples = rd.from_arrow(extract_mod.extract_triples_batch(docs))
    viols = shacl.validate(triples, shapes_mod.load_profile_ttl("full_demo"))
    ttl = report_mod.report_to_turtle(viols, profile_name="full_demo")
    back = report_mod.parse_report_turtle(ttl)

    def keys(recs):
        return sorted((r["severity"], r["focus_node"], r["path"],
                       r["source_constraint_component"])
                      for r in recs)

    orig = keys(viols.to_pandas().to_dict("records"))
    assert len(orig) > 0
    assert keys(back.to_pandas().to_dict("records")
                if hasattr(back, "to_pandas") else back) == orig


def test_custom_constraint_hook():
    """The §2.10 extension surface: a per-path Python predicate runs
    distributed alongside the compiled components (the engine-level
    analog of the reference's sparqlValidations plug-in)."""
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
         sh:property [ sh:path ex:year ; sh:minCount 1 ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:a a ex:T ; ex:year 2015 .
    ex:b a ex:T ; ex:year 1999 .
    ex:other ex:year 1800 .
    """
    cc = shacl.CustomConstraint(
        path="http://example.org/year",
        fn=lambda kind, value, dt, lang: int(value) >= 2010,
        component="http://example.org/constraints#ModernYear",
        target=shapes_mod.Target("class", "http://example.org/T"),
        severity="Warning", message="year must be >= 2010")
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl,
                           concurrency=1, custom=[cc])
    recs = viols.to_pandas().to_dict("records")
    custom_rows = [r for r in recs if "ModernYear" in
                   r["source_constraint_component"]]
    # ex:b violates; ex:other is outside the class target
    assert len(custom_rows) == 1
    assert custom_rows[0]["focus_node"].endswith("/b")
    assert custom_rows[0]["severity"] == "Warning"


def test_or_not_logical_constraints():
    """sh:or (violates only if EVERY branch fails) and sh:not (violates
    when the nested bundle conforms); count-bound branches are rejected
    at compile time."""
    import pytest

    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
         sh:property [ sh:path ex:v ;
                       sh:or ( [ sh:datatype xsd:integer ]
                               [ sh:pattern "^ok" ] ) ] ;
         sh:property [ sh:path ex:w ; sh:not [ sh:pattern "forbidden" ] ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:a a ex:T ; ex:v 42 ; ex:w "fine" .
    ex:b a ex:T ; ex:v "ok text" ; ex:w "very forbidden words" .
    ex:c a ex:T ; ex:v "neither" .
    """
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl, concurrency=1)
    got = {(r["focus_node"].rsplit("/")[-1],
            r["source_constraint_component"].rsplit("#", 1)[-1], r["value"])
           for r in viols.to_pandas().to_dict("records")}
    assert got == {("c", "OrConstraintComponent", "neither"),
                   ("b", "NotConstraintComponent", "very forbidden words")}

    with pytest.raises(ValueError, match="branch"):
        shapes_mod.compile_shapes(shapes_ttl.replace(
            "sh:datatype xsd:integer", "sh:minCount 1"))


def test_compile_shapes_profile():
    cs = shapes_mod.compile_shapes(_read(f"{FIX}/shapes/profile.ttl"))
    assert len(cs.node_shapes) == 1
    nshape = cs.node_shapes[0]
    assert nshape.target_class == ns.DCAT + "Dataset"
    by_path = {re.split(r"[#/]", p.path)[-1]: p for p in nshape.properties}
    assert by_path["title"].min_count == 1 and by_path["title"].max_count == 2
    assert by_path["issued"].datatype == ns.XSD + "dateTime"
    assert by_path["description"].pattern == "\\S"
    assert by_path["description"].severity == "Warning"
    dist = by_path["distribution"]
    assert dist.node_class == ns.DCAT + "Distribution"
    assert dist.node_kind == ns.SH + "IRI"
    assert cs.foaf_pages()[nshape.iri] == "https://example.org/docs/dataset-shape"
    assert ns.DCAT + "Distribution" in cs.referenced_classes()


def _viol_keys(ds):
    return {(r["severity"], r["focus_node"], re.split(r"[#/]", r["path"])[-1],
             r["source_constraint_component"].rsplit("#", 1)[-1])
            for r in ds.to_pandas().to_dict("records")}


def test_validate_valid_catalog_conforms():
    viols = shacl.validate(_triples_ds(f"{FIX}/data/valid_catalog.ttl"),
                           _read(f"{FIX}/shapes/profile.ttl"), concurrency=1)
    assert shacl.conforms(viols)


def test_validate_invalid_catalog_all_components():
    viols = shacl.validate(_triples_ds(f"{FIX}/data/invalid_catalog.ttl"),
                           _read(f"{FIX}/shapes/profile.ttl"), concurrency=1)
    got = _viol_keys(viols)
    ex = "http://example.org/"
    assert got == {
        ("Violation", ex + "bad1", "title", "MinCountConstraintComponent"),
        ("Violation", ex + "bad1", "issued", "DatatypeConstraintComponent"),
        ("Warning", ex + "bad1", "description", "PatternConstraintComponent"),
        ("Violation", ex + "bad1", "distribution", "ClassConstraintComponent"),
        ("Violation", ex + "bad2", "title", "MaxCountConstraintComponent"),
    }
    # foaf_page propagated from the node shape (J3 map-side join)
    pages = set(viols.to_pandas()["foaf_page"])
    assert pages == {"https://example.org/docs/dataset-shape"}


def mini_validate(gt_rows):
    """Independent reference validator over ground-truth triples (test oracle)."""
    distinct = {(r["subj"], r["pred"], r["obj_kind"], r["obj_value"],
                 r["obj_datatype"]) for r in gt_rows}
    datasets = {s for s, p, k, v, dt in distinct
                if p == ns.RDF_TYPE and v == ns.DCAT + "Dataset"}
    typed_dist = {s for s, p, k, v, dt in distinct
                  if p == ns.RDF_TYPE and v == ns.DCAT + "Distribution"}
    out = set()
    for ds in datasets:
        titles = [x for x in distinct if x[0] == ds and x[1] == ns.DCT + "title"]
        if len(titles) < 1:
            out.add(("Violation", ds, "title", "MinCountConstraintComponent", ""))
        if len(titles) > 2:
            out.add(("Violation", ds, "title", "MaxCountConstraintComponent", ""))
    for s, p, k, v, dt in distinct:
        if s not in datasets:
            continue
        if p == ns.DCT + "issued" and dt != ns.XSD + "dateTime":
            out.add(("Violation", s, "issued", "DatatypeConstraintComponent", v))
        if p == ns.DCT + "description" and not re.search(r"\S", v):
            out.add(("Warning", s, "description", "PatternConstraintComponent", v))
        if p == ns.DCAT + "distribution" and (k != "iri" or v not in typed_dist):
            out.add(("Violation", s, "distribution", "ClassConstraintComponent", v))
    return out


def test_validate_synthetic_corpus_matches_mini_validator():
    docs, gt, _mgt = synth.make_corpus_tables(300)
    triples = rd.from_arrow(extract.extract_triples_batch(docs))
    viols = shacl.validate(triples, _read(f"{FIX}/shapes/profile.ttl"),
                           concurrency=2)
    got = {(r["severity"], r["focus_node"], re.split(r"[#/]", r["path"])[-1],
            r["source_constraint_component"].rsplit("#", 1)[-1], r["value"])
           for r in viols.to_pandas().to_dict("records")}
    want = mini_validate(gt.to_pylist())
    assert got == want
    assert len(want) > 10  # the corpus plants violations of every component


def test_profile_registry_multiple_profiles():
    """§2.10 extension surface: second profile validates with fewer shapes."""
    from shacl_validator_ray.state.shapes import load_profile_ttl

    minimal = shapes_mod.compile_shapes(load_profile_ttl("minimal_demo"))
    assert len(minimal.node_shapes) == 1
    assert len(minimal.node_shapes[0].properties) == 1
    viols = shacl.validate(_triples_ds(f"{FIX}/data/invalid_catalog.ttl"),
                           load_profile_ttl("minimal_demo"), concurrency=1)
    got = _viol_keys(viols)
    # only the title minCount fires under the minimal profile
    assert got == {("Violation", "http://example.org/bad1", "title",
                    "MinCountConstraintComponent")}
    import pytest

    with pytest.raises(KeyError):
        load_profile_ttl("nope")


def test_sequence_path_with_absent_predicate():
    """A sequence path whose first/last predicate has NO rows in the data
    must yield an empty derived set, not a join crash (empty join sides
    break Ray's JoinOperator field resolution)."""
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
         sh:property [ sh:path ( ex:missing ex:alsoMissing ) ; sh:minCount 1 ] ;
         sh:property [ sh:path ( ex:a ex:missing2 ) ; sh:minCount 1 ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:x a ex:T ; ex:a ex:m .
    """
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl, concurrency=1)
    got = {(r["path"], r["source_constraint_component"].rsplit("#", 1)[-1])
           for r in viols.to_pandas().to_dict("records")}
    # both paths have zero values for ex:x → two minCount findings
    assert got == {("http://example.org/missing/http://example.org/alsoMissing",
                    "MinCountConstraintComponent"),
                   ("http://example.org/a/http://example.org/missing2",
                    "MinCountConstraintComponent")}, got


def test_deep_closure_chain_beyond_nine_hops():
    """Pointer-doubling closure: a 12-edge chain with oneOrMorePath
    minCount 12 on the head must CONFORM (the one-hop-per-round loop
    silently truncated at ~9 hops — ADVICE r2)."""
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:Chain a sh:NodeShape ; sh:targetNode ex:n0 ;
        sh:property [ sh:path [ sh:oneOrMorePath ex:next ] ; sh:minCount 12 ] .
    """
    data_ttl = "@prefix ex: <http://example.org/> .\n" + "\n".join(
        f"ex:n{i} ex:next ex:n{i + 1} ." for i in range(12))
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl,
                           concurrency=1)
    assert viols.count() == 0


def test_zero_or_more_identity_for_absent_target_node():
    """sh:zeroOrMorePath value set always contains the focus node itself,
    even when the sh:targetNode focus never appears in the data graph
    (ADVICE r2: graph-resident-only identity rows falsely violated)."""
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:Iso a sh:NodeShape ; sh:targetNode ex:isolated ;
        sh:property [ sh:path [ sh:zeroOrMorePath ex:next ] ; sh:minCount 1 ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:a ex:next ex:b .
    """
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl,
                           concurrency=1)
    assert viols.count() == 0


def test_has_value_term_kind_not_just_lexical_form():
    """sh:hasValue is TERM equality: a literal whose lexical form equals
    the required IRI must not satisfy the constraint (ADVICE r2)."""
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:HV a sh:NodeShape ; sh:targetSubjectsOf ex:p ;
        sh:property [ sh:path ex:p ; sh:hasValue ex:want ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:good ex:p ex:want .
    ex:bad ex:p "http://example.org/want" .
    """
    viols = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl,
                           concurrency=1)
    got = {(r["focus_node"].rsplit("/")[-1],
            r["source_constraint_component"].rsplit("#", 1)[-1])
           for r in viols.to_pandas().to_dict("records")}
    assert got == {("bad", "HasValueConstraintComponent")}, got


def test_distributed_members_path_equivalence():
    """validate() with distributed_members=True (the 100 TB routing:
    mergeable HLL→partial-Bloom membership, Bloom nodeval broadcast) must
    produce exactly the findings of the default exact path — including
    sh:node nested/parent findings and cardinality rows."""
    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:dist ; sh:minCount 1 ;
                      sh:node ex:DistShape ] ;
        sh:property [ sh:path ex:title ; sh:datatype xsd:string ] .
    ex:DistShape a sh:NodeShape ;
        sh:property [ sh:path ex:url ; sh:minCount 1 ] .
    ex:Sub a sh:NodeShape ; sh:targetSubjectsOf ex:url ;
        sh:property [ sh:path ex:url ; sh:maxCount 1 ] .
    """
    data_ttl = """
    @prefix ex: <http://example.org/> .
    ex:a a ex:T ; ex:dist ex:d1 ; ex:title "ok" .
    ex:b a ex:T ; ex:dist ex:d2 ; ex:title 42 .
    ex:d1 ex:url "http://x" .
    ex:d3 ex:url "u1" , "u2" .
    """

    def keys(viols):
        return sorted(
            (r["severity"], r["focus_node"], r["path"], r["value"],
             r["source_constraint_component"], r["source_shape"])
            for r in viols.to_pandas().to_dict("records"))

    exact = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl,
                           concurrency=1)
    dist = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl,
                          concurrency=1, distributed_members=True)
    # bloom_threshold=0 additionally forces every membership broadcast
    # (incl. nodeval) through Bloom filters — the full sketch path
    dist0 = shacl.validate(_ds_from_ttl_text(data_ttl), shapes_ttl,
                           concurrency=1, distributed_members=True,
                           bloom_threshold=0)
    ke, kd, k0 = keys(exact), keys(dist), keys(dist0)
    assert ke == kd, (ke, kd)
    assert ke == k0, (ke, k0)
    # sanity: the fixture exercises nested failure (d2 missing url →
    # nested MinCount + parent NodeConstraint on b) and datatype
    comps = {k[4].rsplit("#", 1)[-1] for k in ke}
    assert {"MinCountConstraintComponent", "NodeConstraintComponent",
            "DatatypeConstraintComponent",
            "MaxCountConstraintComponent"} <= comps


def test_pairs_profile_on_synthetic_corpus():
    """pairs_demo over the planted corpus: every pair component fires,
    and the numeric byteSize subjects ride the vectorized fast path while
    bad_issued datasets exercise the mixed-type per-row fallback."""
    docs, _gt, _mgt = synth.make_corpus_tables(300)
    triples = rd.from_arrow(extract.extract_triples_batch(docs))
    viols = shacl.validate(triples, shapes_mod.load_profile_ttl("pairs_demo"),
                           concurrency=2)
    recs = viols.to_pandas().to_dict("records")
    comps = {}
    for r in recs:
        comps.setdefault(
            r["source_constraint_component"].rsplit("#", 1)[-1], 0)
        comps[r["source_constraint_component"].rsplit("#", 1)[-1]] += 1
    assert set(comps) == {"LessThanConstraintComponent",
                          "LessThanOrEqualsConstraintComponent",
                          "EqualsConstraintComponent",
                          "DisjointConstraintComponent"}, comps
    # timeline violations report the issued value; size violations the size
    paths = {re.split(r"[#/]", r["path"])[-1] for r in recs}
    assert paths == {"issued", "byteSize", "quotaBytes"}, paths


def test_versioned_profile_registry_union_and_branches():
    """Reference-parity registry (mqa-config.json analog): profile →
    version → branch with {branch} templating; the multi-file shape set
    unions with per-file bnode scoping and D3 triple dedup (the node
    shape declared in BOTH files compiles once, with both properties)."""
    import pytest

    from shacl_validator_ray.state import shapes as shapes_mod

    t = shapes_mod.load_profile_ttl("versioned_demo")
    assert isinstance(t, tuple) and len(t) == 2
    c = shapes_mod.compile_shapes(t)
    assert len(c.node_shapes) == 1  # duplicate declaration collapsed
    props = {(p.path.rsplit("/")[-1], p.severity)
             for p in c.node_shapes[0].properties}
    assert props == {("title", "Violation"), ("description", "Warning")}

    # branch selection changes the resolved files
    dev = shapes_mod.compile_shapes(
        shapes_mod.load_profile_ttl("versioned_demo", branch="develop"))
    dprops = {(p.path.rsplit("/")[-1], p.severity)
              for p in dev.node_shapes[0].properties}
    assert dprops == {("title", "Violation"), ("description", "Violation")}

    # explicit version resolves; unknown version/branch raise
    assert shapes_mod.load_profile_ttl("versioned_demo", version="1.0.0",
                                       branch="main") == t
    with pytest.raises(KeyError, match="version"):
        shapes_mod.load_profile_ttl("versioned_demo", version="9.9")
    with pytest.raises(KeyError, match="branch"):
        shapes_mod.load_profile_ttl("versioned_demo", branch="nope")
    with pytest.raises(KeyError, match="unversioned"):
        shapes_mod.load_profile_ttl("minimal_demo", version="1.0.0")


def test_multifile_union_validates_end_to_end():
    """The union profile validates through the distributed validator:
    a dataset missing only a description draws the Warning from the
    extra file, one missing a title draws the Violation from core."""
    from shacl_validator_ray.stages import shacl as shacl_mod
    from shacl_validator_ray.state import shapes as shapes_mod

    data = """
    @prefix ex: <http://example.org/> .
    @prefix dcat: <http://www.w3.org/ns/dcat#> .
    @prefix dct: <http://purl.org/dc/terms/> .
    ex:d1 a dcat:Dataset ; dct:title "t" .
    ex:d2 a dcat:Dataset ; dct:description "d" .
    ex:d3 a dcat:Dataset ; dct:title "t" ; dct:description "d" .
    """
    got = shacl_mod.validate(
        _ds_from_ttl_text(data),
        shapes_mod.load_profile_ttl("versioned_demo")).to_pandas()
    rows = {(r.severity, r.focus_node.rsplit("/")[-1])
            for r in got.itertuples()}
    assert rows == {("Warning", "d1"), ("Violation", "d2")}
