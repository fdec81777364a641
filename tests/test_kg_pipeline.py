"""Entity linking, canonicalization (union-find), materialization, and the
full-pipeline P/R gate vs the planted ground truth (BASELINE.json)."""

import os

import pyarrow as pa
import ray.data as rd

from shacl_validator_ray import synth
from shacl_validator_ray.stages import canonicalize, extract, linking, materialize, shacl


def _alias_rows():
    return [(r["surface"], r["iri"]) for r in synth.alias_table().to_pylist()]


def _key(r):
    return (r["subj"], r["pred"], r["obj_kind"], r["obj_value"],
            r["obj_datatype"], r["obj_lang"])


def test_linker_exact_alias_and_fuzzy():
    import random

    rows = [
        {"mention_iri": extract.mention_iri("Org-7"), "doc_id": "d1"},
        {"mention_iri": extract.mention_iri(synth.fuzzy_org(random.Random(0), 12)),
         "doc_id": "d2"},
        {"mention_iri": extract.mention_iri("Totally Unrelated Zebra"), "doc_id": "d3"},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = linking.link_entities(ds.map_batches(
        lambda b: b.append_column("obj_value", b["mention_iri"]),
        batch_format="pyarrow"), _alias_rows(), tau=0.5, concurrency=1)
    got = {r["mention"]: (r["candidate_iri"], r["score"]) for r in out.take_all()}
    assert got["Org-7"] == (synth.org_iri(7), 1.0)
    fuzzy_surface = [k for k in got if k not in ("Org-7",)]
    assert len(fuzzy_surface) == 1  # zebra got NIL (dropped), fuzzy resolved
    assert got[fuzzy_surface[0]][0] == synth.org_iri(12)
    assert 0.5 <= got[fuzzy_surface[0]][1] < 1.0


def test_union_find_chain_and_rank():
    # chain: m1 - m2 - org; root must be the canonical org IRI (rank order).
    # Both paths: driver fast-path and distributed groupby rounds.
    org = synth.org_iri(3)
    m1, m2 = extract.mention_iri("a x"), extract.mention_iri("b x")
    edges = rd.from_arrow(pa.Table.from_pylist(
        [{"a": m1, "b": m2}, {"a": m2, "b": org}]))
    for thresh in (200_000, 0):
        out = {r["entity_id"]: r["root_id"]
               for r in canonicalize.connected_components(
                   edges, driver_threshold=thresh).take_all()}
        assert out == {m1: org, m2: org, org: org}, f"threshold={thresh}"


def test_union_find_partition_count_invariant():
    org = synth.org_iri(1)
    ms = [extract.mention_iri(f"m {i}") for i in range(6)]
    rows = [{"a": ms[i], "b": ms[i + 1]} for i in range(5)] + [{"a": ms[5], "b": org}]
    for nblocks in (1, 4):
        edges = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(nblocks)
        out = {r["entity_id"]: r["root_id"]
               for r in canonicalize.connected_components(
                   edges, max_rounds=12, driver_threshold=0).take_all()}
        assert set(out.values()) == {org}


def test_full_pipeline_precision_recall(tmp_path):
    docs, gt, _mgt = synth.make_corpus_tables(250)
    triples = rd.from_arrow(extract.extract_triples_batch(docs))
    links = linking.link_entities(triples, _alias_rows(), tau=0.5)
    canon = canonicalize.canonical_map_from_links(links)
    final = shacl.dedup_triples(materialize.canonical_rewrite(triples, canon))
    got = {_key(r) for r in final.to_pandas().to_dict("records")}
    want = {_key(r) for r in
            shacl.dedup_triples(rd.from_arrow(gt).map_batches(
                lambda b: b.append_column("span_idx", pa.array([0] * b.num_rows,
                                                               pa.int32())),
                batch_format="pyarrow")).to_pandas().to_dict("records")}
    tp = len(got & want)
    precision = tp / len(got)
    recall = tp / len(want)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # with the closed alias world + LSH, linking should in fact be perfect
    assert got == want


def test_materialize_resumable(tmp_path):
    docs, _, _mgt = synth.make_corpus_tables(60)
    triples = rd.from_arrow(extract.extract_triples_batch(docs))
    out = str(tmp_path / "graph")
    m1 = materialize.materialize_graph(triples, out, n_buckets=4, hub_threshold=50,
                                       salt=2)
    assert m1["complete"]
    back = materialize.read_graph(out)
    deduped = shacl.dedup_triples(triples)
    assert back.count() == deduped.count()
    assert "bucket" in back.schema().names
    # hub salting: the hub org subject exceeds threshold → salted across buckets
    # (hub presence depends on corpus slice; at least manifest recorded the set)
    assert isinstance(m1["hubs"], list)
    # rerun resumes from manifest without rewriting
    m2 = materialize.materialize_graph(triples, out, n_buckets=4)
    assert m2["complete"] and m2["wall_s"] == m1["wall_s"]


def test_materialize_partial_resume(tmp_path, monkeypatch):
    """Kill-and-rerun: a failure mid-write leaves completed bucket groups
    in the manifest; the rerun writes only the remaining groups and the
    final graph is complete and duplicate-free."""
    import ray.data as rd_

    docs, _, _mgt = synth.make_corpus_tables(50)
    triples = rd.from_arrow(extract.extract_triples_batch(docs))
    out = str(tmp_path / "graph")

    real_write = rd_.Dataset.write_parquet
    calls = {"n": 0}

    def flaky_write(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated writer death")
        return real_write(self, *a, **kw)

    monkeypatch.setattr(rd_.Dataset, "write_parquet", flaky_write)
    import pytest

    with pytest.raises(RuntimeError):
        materialize.materialize_graph(triples, out, n_buckets=4, write_groups=4)
    monkeypatch.setattr(rd_.Dataset, "write_parquet", real_write)

    import json

    with open(f"{out}/_MANIFEST.json") as f:
        partial = json.load(f)
    assert not partial["complete"] and partial["groups_done"] == [0, 1]

    m = materialize.materialize_graph(triples, out, n_buckets=4, write_groups=4)
    assert m["complete"] and m["groups_done"] == [0, 1, 2, 3]
    back = materialize.read_graph(out)
    deduped = shacl.dedup_triples(triples)
    assert back.count() == deduped.count()  # nothing duplicated, nothing lost


def test_materialize_resume_after_written_but_unrecorded_group(tmp_path):
    """Crash AFTER a group's parquet write completed but BEFORE the
    manifest recorded it: the rerun must replace the group's files, not
    write a second copy alongside them (staging + wholesale move)."""
    import json

    docs, _, _mgt = synth.make_corpus_tables(50)
    triples = rd.from_arrow(extract.extract_triples_batch(docs))
    out = str(tmp_path / "graph")
    materialize.materialize_graph(triples, out, n_buckets=4, write_groups=4,
                                  salt=2, hub_threshold=50)
    expected = materialize.read_graph(out).count()

    # simulate the crash window: group 1's files are on disk but the
    # manifest says it never finished
    with open(f"{out}/_MANIFEST.json") as f:
        man = json.load(f)
    man["complete"] = False
    man["groups_done"] = [0, 2, 3]
    with open(f"{out}/_MANIFEST.json", "w") as f:
        json.dump(man, f)

    m = materialize.materialize_graph(triples, out, n_buckets=4, write_groups=4,
                                      salt=2, hub_threshold=50)
    assert m["complete"]
    assert materialize.read_graph(out).count() == expected  # no duplicates


def test_materialize_write_groups_nondegenerate(tmp_path):
    """salt divisible by write_groups must NOT collapse all non-hub data
    into write group 0 (group = unsalted base bucket % write_groups)."""
    import os

    docs, _, _mgt = synth.make_corpus_tables(60)
    triples = rd.from_arrow(extract.extract_triples_batch(docs))
    out = str(tmp_path / "graph")
    materialize.materialize_graph(triples, out, n_buckets=8, write_groups=4,
                                  salt=4, hub_threshold=10 ** 9)
    bases = {int(d.split("=")[1]) // 4 for d in os.listdir(out)
             if d.startswith("bucket=")}
    groups_with_data = {b % 4 for b in bases}
    assert len(groups_with_data) > 1, groups_with_data


def test_full_pipeline_sidecars_and_conformant_graph(tmp_path):
    """full_pipeline writes the graph + violations/history sidecars; the
    sidecar dirs are invisible to read_graph (underscore prefix); the
    validation-gated conformant set excludes violating subjects."""
    import os

    import pyarrow.parquet as pq_

    from shacl_validator_ray.pipelines import kg
    from shacl_validator_ray.state import metrics as metrics_mod

    out = str(tmp_path / "g")
    stats = kg.full_pipeline("/root/testdata/sf0.001", out)
    assert stats["manifest"]["complete"]
    back = materialize.read_graph(out)
    assert back.count() == stats["triples"]  # sidecars not swept into the read

    viols = pq_.read_table(*[os.path.join(out, "_violations")])
    assert viols.num_rows == stats["violations"] > 0
    hist = metrics_mod.recent_runs(os.path.join(out, "_history"))
    assert hist.num_rows == 1 and hist.column("triples")[0].as_py() == stats["triples"]

    conf = kg.conformant_triples("/root/testdata/sf0.001")
    df = conf.to_pandas()
    bad = set(viols.filter(
        __import__("pyarrow").compute.equal(viols["severity"], "Violation")
    )["focus_node"].to_pylist())
    assert bad and not (set(df["subj"]) & bad)
    assert len(df) < stats["triples"]


def test_hub_subject_salted_across_buckets(tmp_path):
    """F2 skew fixture: the catalog hub subject (~10% of triples) is
    detected and salted across multiple sub-buckets at materialize."""
    docs, gt, _mgt = synth.make_corpus_tables(200)
    triples = rd.from_arrow(extract.extract_triples_batch(docs))
    hub = "http://example.org/catalog/main"
    n_hub = sum(1 for r in gt.to_pylist() if r["subj"] == hub)
    assert n_hub == 200  # one edge per doc → genuine hub subject

    out = str(tmp_path / "g")
    m = materialize.materialize_graph(triples, out, n_buckets=4,
                                      hub_threshold=50, salt=4)
    assert hub in m["hubs"]
    back = materialize.read_graph(out).to_pandas()
    hub_buckets = set(back.loc[back["subj"] == hub, "bucket"])
    assert len(hub_buckets) == 4  # spread over all salt sub-buckets
    # non-hub subjects keep exactly one bucket each
    other = back[back["subj"] != hub].groupby("subj")["bucket"].nunique()
    assert (other == 1).all()


def test_canonical_rewrite_join_path_equivalence():
    """broadcast_threshold=0 forces the distributed-join rewrite; the
    output triple multiset must equal the broadcast path's."""
    docs, _, _mgt = synth.make_corpus_tables(80)
    triples = rd.from_arrow(extract.extract_triples_batch(docs))
    from shacl_validator_ray.pipelines import kg
    from shacl_validator_ray.stages import canonicalize, linking

    alias_rows = [(r["surface"], r["iri"]) for r in synth.alias_table().to_pylist()]
    links = linking.link_entities(triples, alias_rows)
    canon = canonicalize.canonical_map_from_links(links).materialize()
    triples = triples.materialize()

    def key_set(ds):
        return sorted(map(tuple, ds.to_pandas()[
            ["subj", "pred", "obj_value"]].itertuples(index=False)))

    broadcast = key_set(materialize.canonical_rewrite(triples, canon))
    joined = key_set(materialize.canonical_rewrite(triples, canon,
                                                   broadcast_threshold=0))
    assert broadcast == joined and len(broadcast) > 0


def test_materialize_parallel_writes(tmp_path):
    """Overlapped write groups produce the identical complete graph."""
    docs, _, _mgt = synth.make_corpus_tables(60)
    triples = rd.from_arrow(extract.extract_triples_batch(docs))
    out = str(tmp_path / "graph")
    m = materialize.materialize_graph(triples, out, n_buckets=8,
                                      write_groups=4, parallel_writes=4,
                                      salt=2, hub_threshold=50)
    assert m["complete"] and m["groups_done"] == [0, 1, 2, 3]
    back = materialize.read_graph(out)
    assert back.count() == shacl.dedup_triples(triples).count()


def test_incremental_validate_replaces_stale_results():
    """The incremental splice must both REVALIDATE the changed docs and
    DROP the prior run's stale results for them: poison the prior with
    a bogus violation on a changed doc's focus node and check the
    splice removes it while reproducing the full run exactly."""
    import pyarrow as pa

    from shacl_validator_ray.pipelines import kg

    sf = "/root/testdata/sf0.001"
    full = kg.violations_dataset(sf).materialize()
    docs = kg.documents_dataset(sf)
    ids = [d for b in docs.select_columns(["doc_id"]).iter_batches(
               batch_format="pyarrow") for d in b["doc_id"].to_pylist()]
    changed = [d for d in ids if int(str(d).rsplit("-", 1)[-1]) % 3 == 0]

    # a focus node belonging to a changed doc (subjects embed doc number)
    tr = kg.triples_dataset(sf)
    subj = next(s for b in tr.iter_batches(batch_format="pyarrow")
                for s, d in zip(b["subj"].to_pylist(),
                                b["doc_id"].to_pylist()) if d in set(changed))
    bogus = full.map_batches(
        lambda b: b.slice(0, 1).set_column(
            b.schema.get_field_index("focus_node"), "focus_node",
            pa.array([subj] * min(1, b.num_rows), pa.string())),
        batch_format="pyarrow").limit(1)
    prior = full.union(bogus).materialize()

    out = kg.incremental_validate(sf, changed, prior).to_pandas()
    exp = full.to_pandas()
    cols = ["severity", "focus_node", "path", "value",
            "source_constraint_component"]
    left = out[cols].sort_values(cols).reset_index(drop=True)
    right = exp[cols].sort_values(cols).reset_index(drop=True)
    assert left.equals(right)


def test_incremental_materialize_rewrites_only_affected_groups(tmp_path):
    """Partition-invalidated rewrite: only write groups containing an
    affected subject are recomputed (their files get new mtimes / the
    manifest lists them) and the final graph equals a full rewrite."""
    import os
    import time

    docs, _, _mgt = synth.make_corpus_tables(60)
    triples = rd.from_arrow(extract.extract_triples_batch(docs))
    out = str(tmp_path / "graph")
    m1 = materialize.materialize_graph(triples, out, n_buckets=8,
                                       write_groups=4, hub_threshold=50)
    assert m1["complete"]
    full_rows = materialize.read_graph(out).count()

    # snapshot per-group mtimes (group = bucket // salt % write_groups)
    def group_mtimes():
        mt = {}
        for d in os.listdir(out):
            if d.startswith("bucket="):
                b = int(d.split("=")[1])
                g = (b // m1["salt"]) % m1["write_groups"]
                p = os.path.join(out, d)
                mt[g] = max(mt.get(g, 0), max(
                    os.path.getmtime(os.path.join(p, f))
                    for f in os.listdir(p)))
        return mt

    before = group_mtimes()
    time.sleep(0.05)

    # pick one subject → its group must be rewritten, others untouched
    subj = triples.take(1)[0]["subj"]
    m2 = materialize.incremental_materialize(triples, out, [subj],
                                             hub_threshold=50)
    assert m2["complete"]
    assert len(m2["groups_rewritten"]) == 1
    after = group_mtimes()
    for g in before:
        if g in m2["groups_rewritten"]:
            assert after[g] > before[g], (g, "should have been rewritten")
        else:
            assert after[g] == before[g], (g, "should be untouched")
    assert materialize.read_graph(out).count() == full_rows


def test_incremental_canonical_map_with_real_change():
    """A changed document REMOVES one of its old links and ADDS a link
    merging two previously separate components; the spliced map must
    equal a from-scratch recompute on the new link set."""
    import pyarrow as pa

    from shacl_validator_ray.stages import canonicalize

    def links(rows):
        return rd.from_arrow(pa.table({
            "mention_iri": pa.array([r[0] for r in rows], pa.string()),
            "candidate_iri": pa.array([r[1] for r in rows], pa.string()),
            "doc_id": pa.array([r[2] for r in rows], pa.string())}))

    E = "http://example.org/ent/"
    M = "http://example.org/mention/"
    prior = links([
        (M + "a", E + "A", "d1"),
        (M + "b", E + "A", "d1"),
        (M + "c", E + "C", "d2"),   # removed by the change
        (M + "d", E + "D", "d3"),
        (M + "e", E + "E", "d4"),
    ])
    prior_map = canonicalize.canonical_map_from_links(prior).materialize()

    # doc d2 changes: drops (c→C), adds a bridge D→E
    new = links([(M + "x", E + "D", "d2"), (M + "x", E + "E", "d2")])
    got = (canonicalize.incremental_canonical_map(prior, prior_map, new,
                                                  {"d2"})
           .to_pandas().sort_values("entity_id").reset_index(drop=True))

    scratch_links = links([
        (M + "a", E + "A", "d1"),
        (M + "d", E + "D", "d3"),
        (M + "e", E + "E", "d4"),
        (M + "b", E + "A", "d1"),
        (M + "x", E + "D", "d2"),
        (M + "x", E + "E", "d2"),
    ])
    want = (canonicalize.canonical_map_from_links(scratch_links)
            .to_pandas().sort_values("entity_id").reset_index(drop=True))
    # stale entities from the dropped link may linger as singletons only
    # if they still appear; they must NOT retain merged roots
    got_d = dict(zip(got["entity_id"], got["root_id"]))
    want_d = dict(zip(want["entity_id"], want["root_id"]))
    for e, r in want_d.items():
        assert got_d.get(e) == r, (e, got_d.get(e), r)
    extra = set(got_d) - set(want_d)
    for e in extra:  # unlinked leftovers may only map to themselves
        assert got_d[e] == e, (e, got_d[e])


def test_resume_reuses_manifest_hub_set(tmp_path, monkeypatch):
    """A resumed/incremental write reuses the manifest's hub set instead
    of re-running the corpus-scale detection pre-pass."""
    docs, _, _mgt = synth.make_corpus_tables(60)
    triples = rd.from_arrow(extract.extract_triples_batch(docs))
    out = str(tmp_path / "graph")
    materialize.materialize_graph(triples, out, n_buckets=8,
                                  write_groups=4, hub_threshold=50)

    def boom(*a, **k):
        raise AssertionError("detect_hubs must not run on resume")

    monkeypatch.setattr(materialize, "detect_hubs", boom)
    subj = triples.take(1)[0]["subj"]
    m = materialize.incremental_materialize(triples, out, [subj],
                                            hub_threshold=50)
    assert m["complete"] and m["groups_rewritten"]


def test_incremental_update_end_to_end_equals_scratch(tmp_path):
    """The full rerun primitive: change ONE document's content, run
    kg.incremental_update against the prior graph dir + artifacts, and
    the resulting graph must equal a from-scratch run on the new corpus
    (triple-set equality) while rewriting only a subset of the write
    groups."""
    import shutil

    docs, _, _mgt = synth.make_corpus_tables(60)

    # corpus B: doc at row 5 loses all but its first span (real change)
    spans = docs["spans"].to_pylist()
    ids = docs["doc_id"].to_pylist()
    changed_id = ids[5]
    spans_b = list(spans)
    spans_b[5] = spans[5][:1]
    docs_b = pa.table({"doc_id": docs["doc_id"],
                       "spans": pa.array(spans_b, docs.schema.field("spans").type)})

    def artifacts(tbl):
        triples = rd.from_arrow(extract.extract_triples_batch(tbl)).materialize()
        links = linking.link_entities(triples, _alias_rows()).materialize()
        cmap = canonicalize.canonical_map_from_links(links).materialize()
        return triples, links, cmap

    tr_a, links_a, map_a = artifacts(docs)
    out_a = str(tmp_path / "graph_a")
    materialize.materialize_graph(
        materialize.canonical_rewrite(tr_a, map_a), out_a,
        n_buckets=16, write_groups=8, hub_threshold=50)

    # scratch run on corpus B
    tr_b, _, map_b_scratch = artifacts(docs_b)
    out_s = str(tmp_path / "graph_scratch")
    materialize.materialize_graph(
        materialize.canonical_rewrite(tr_b, map_b_scratch), out_s,
        n_buckets=16, write_groups=8, hub_threshold=50)

    # incremental: copy the prior dir, splice the one changed doc
    out_i = str(tmp_path / "graph_incr")
    shutil.copytree(out_a, out_i)
    from shacl_validator_ray.pipelines import kg

    changed_docs = rd.from_arrow(docs_b.filter(
        pa.compute.equal(docs_b["doc_id"], changed_id)))
    m = kg.incremental_update(out_i, tr_a, links_a, map_a,
                              {changed_id}, changed_docs,
                              alias_rows=_alias_rows(), hub_threshold=50)
    assert m["complete"]
    assert 0 < len(m["groups_rewritten"]) < 8  # some groups untouched

    def triple_set(d):
        df = materialize.read_graph(d).to_pandas()
        return set(map(tuple, df[["subj", "pred", "obj_kind", "obj_value",
                                  "obj_datatype", "obj_lang"]].to_numpy()))

    assert triple_set(out_i) == triple_set(out_s)
