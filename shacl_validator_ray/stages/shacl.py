"""Distributed SHACL-core validation (SURVEY.md §2.3 T1, §2.5 A11, §7.1 step 4).

The reference delegates to shacl-engine over an in-memory store
(/root/reference/src/services/SHACLValidationService.ts:399-408); here
validation is re-expressed as vectorized per-triple predicates over the
triples Dataset:

- **value constraints** (``sh:datatype``, ``sh:pattern``, ``sh:nodeKind``,
  ``sh:class``) — an actor-pool ``map_batches`` stage; each actor compiles
  the shapes graph once in ``__init__`` and holds the broadcast
  focus-node / class-membership sets (map-side semi-join J5).
- **cardinality constraints** (``sh:minCount`` / ``sh:maxCount``) — the
  absence problem (SURVEY.md §7.3): a "required" row is emitted per
  (focus node, counted property shape) from the type triples, unioned
  with observed rows, then one ``groupby`` + vectorized compare. A focus
  node with zero values yields n=0 < minCount without any anti-join
  materialization on the driver.

Scale note: focus/class membership sets are broadcast via ``ray.put``
(entity dictionaries are ~e6 at 1e12-doc scale after canonicalization);
the documented scale path replaces them with Bloom filters broadcast the
same way — the dataflow is unchanged. Triple dedup before validation
reproduces the reference's quad-store set semantics
(@rdfjs/dataset.add, SHACLValidationService.ts:133).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions import ns
from ..state import shapes as shapes_mod
from .. import schema as S

_TUPLE_COLS = ["subj", "pred", "obj_kind", "obj_value", "obj_datatype", "obj_lang"]

# sh:nodeKind values → the set of obj_kind codes they admit (the three
# composite kinds are unions — SHACL-core §4.1.1; previously unsupported
# values silently violated everything). Unknown values are rejected at
# shape-compile time (state/shapes.py).
NODEKIND_SETS = shapes_mod.NODEKIND_SETS


def dedup_triples(triples: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """Exact (s,p,o) set semantics (D1): ONE shuffle keyed by a vectorized
    stable hash bucket of the 6-tuple, then a per-bucket pandas
    ``drop_duplicates`` (deterministic: min (doc_id, span_idx) lineage
    kept). Much cheaper than a 6-string-column groupby — the shuffle key
    is a single int32."""
    import pandas as pd
    import pyarrow.compute as pc_

    def add_bucket(b: pa.Table) -> pa.Table:
        concat = pc_.binary_join_element_wise(
            *[b[c].cast(pa.string()) for c in _TUPLE_COLS], "\x1f")
        h = pd.util.hash_pandas_object(pd.Series(concat.to_pandas()), index=False)
        return b.append_column("_bucket",
                               pa.array((h % n_buckets).astype("int32")))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "span_idx"]).drop_duplicates(_TUPLE_COLS)
        return g.drop(columns=["_bucket"])

    return (triples.map_batches(add_bucket, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby("_bucket").map_groups(per_bucket, batch_format="pandas"))


def collect_class_members(triples: rd.Dataset, classes: set[str]) -> dict[str, set[str]]:
    """class IRI → set of instance IRIs, from rdf:type triples.

    Driver-side collect of only the *referenced* classes' members (a tiny
    slice of the data); at 10^12 scale this becomes a Bloom filter per
    class, built with a distributed aggregate — same broadcast shape.
    """
    if not classes:
        return {}
    typed = triples.map_batches(
        lambda b: b.filter(
            pc.and_(pc.equal(b["pred"], ns.RDF_TYPE),
                    pc.is_in(b["obj_value"], value_set=pa.array(sorted(classes))))
        ).select(["subj", "obj_value"]),
        batch_format="pyarrow", zero_copy_batch=True)
    members: dict[str, set[str]] = {c: set() for c in classes}
    for batch in typed.iter_batches(batch_format="pyarrow"):
        for subj, cls in zip(batch["subj"].to_pylist(), batch["obj_value"].to_pylist()):
            members[cls].add(subj)
    return members


_STATE_CACHE: dict = {}


def _worker_state(cls, shapes_ttl: str, members_ref):
    """Per-worker-process instance cache: compile shapes / fetch broadcasts
    once per (class, shapes, broadcast) per worker, reuse across batches
    AND executions (worker processes outlive a single Dataset execution)."""
    key = (cls.__name__, hash(shapes_ttl), members_ref.hex()
           if hasattr(members_ref, "hex") else id(members_ref))
    inst = _STATE_CACHE.get(key)
    if inst is None:
        if len(_STATE_CACHE) >= 16:  # long-lived workers: bound the cache
            _STATE_CACHE.pop(next(iter(_STATE_CACHE)))
        inst = cls(shapes_ttl, members_ref)
        _STATE_CACHE[key] = inst
    return inst


def _synth_message(component: str, p: shapes_mod.PropertyShape) -> list[dict]:
    """Message fallback synthesis (reference M6, SHACLValidationService.ts:276-292)."""
    if p.messages:
        return [{"text": t, "lang": lg} for t, lg in p.messages]
    local = component.rsplit("#", 1)[-1].replace("ConstraintComponent", "")
    return [{"text": f"{local} constraint violated on {p.path}", "lang": "en"}]


def _violation_rows(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=S.VIOLATIONS)


class ValueConstraints:
    """Actor-pool stage for per-value constraints; shapes compiled once per actor."""

    def __init__(self, shapes_ttl: str, members_ref):
        self.shapes = shapes_mod.compile_shapes(shapes_ttl)
        self.members = ray.get(members_ref)
        self.pages = self.shapes.foaf_pages()
        # pre-group property shapes by path for a single pass per batch
        self.by_path: dict[str, list[tuple[str, shapes_mod.PropertyShape]]] = {}
        for nshape, p, _ in self.shapes.property_shapes():
            if p.datatype or p.pattern or p.node_kind or p.node_class:
                self.by_path.setdefault(p.path, []).append((nshape.target_class, p))

    def __call__(self, b: pa.Table) -> pa.Table:
        """Vectorized: one numpy mask pipeline per (path, property shape);
        the per-row Python loop runs only over VIOLATING rows."""
        import numpy as np

        out: list[dict] = []
        if not self.by_path:
            return _violation_rows(out)
        b = b.filter(pc.is_in(b["pred"], value_set=pa.array(sorted(self.by_path))))
        if b.num_rows == 0:
            return _violation_rows(out)
        preds = np.asarray(b["pred"].to_pandas(), dtype=object)
        subjs = np.asarray(b["subj"].to_pandas(), dtype=object)
        kinds = np.asarray(b["obj_kind"].to_pandas(), dtype=object)
        vals = np.asarray(b["obj_value"].to_pandas(), dtype=object)
        dts = np.asarray(b["obj_datatype"].to_pandas(), dtype=object)
        langs = np.asarray(b["obj_lang"].to_pandas(), dtype=object)

        def eff_dt(i) -> str:
            """RDF 1.1 effective datatype: lang-tagged → rdf:langString,
            plain → xsd:string (the engine's canonical "" spelling)."""
            if langs[i]:
                return ns.RDF + "langString"
            return dts[i] or (ns.XSD + "string")

        def emit_rows(p, idx, component):
            comp = ns.SH + component
            msg = _synth_message(comp, p)
            page = self.pages.get(p.iri, "")
            for i in idx:
                out.append({
                    "severity": p.severity, "focus_node": subjs[i], "path": p.path,
                    "value": vals[i], "message": msg,
                    "source_constraint_component": comp, "source_shape": p.iri,
                    "foaf_page": page,
                })

        for path, shapes in self.by_path.items():
            pm = preds == path
            if not pm.any():
                continue
            pidx = np.flatnonzero(pm)
            for tclass, p in shapes:
                focus = self.members.get(tclass, frozenset())
                fm = np.fromiter((subjs[i] in focus for i in pidx),
                                 dtype=bool, count=len(pidx))
                fidx = pidx[fm]
                if len(fidx) == 0:
                    continue
                if p.datatype:
                    bad = [i for i in fidx
                           if kinds[i] != "literal" or eff_dt(i) != p.datatype]
                    emit_rows(p, bad, "DatatypeConstraintComponent")
                if p.pattern:
                    rx = p.compiled_pattern()
                    bad = [i for i in fidx if not rx.search(vals[i])]
                    emit_rows(p, bad, "PatternConstraintComponent")
                if p.node_kind:
                    want_kinds = NODEKIND_SETS[p.node_kind.rsplit("#", 1)[-1]]
                    bad = fidx[np.fromiter((kinds[i] not in want_kinds for i in fidx),
                                           dtype=bool, count=len(fidx))]
                    emit_rows(p, bad, "NodeKindConstraintComponent")
                if p.node_class:
                    cls = self.members.get(p.node_class, frozenset())
                    bad = [i for i in fidx
                           if kinds[i] != "iri" or vals[i] not in cls]
                    emit_rows(p, bad, "ClassConstraintComponent")
        return _violation_rows(out)


class CardinalityRows:
    """Emit required+observed rows for the cardinality groupby (see module doc)."""

    def __init__(self, shapes_ttl: str, members_ref):
        self.shapes = shapes_mod.compile_shapes(shapes_ttl)
        self.members = ray.get(members_ref)
        # shape_idx → (target_class, pshape); only shapes with bounds
        self.card: list[tuple[str, shapes_mod.PropertyShape, int]] = []
        for nshape, p, idx in self.shapes.property_shapes():
            if p.min_count >= 0 or p.max_count >= 0:
                self.card.append((nshape.target_class, p, idx))
        self.paths = {p.path for _, p, _ in self.card}
        self.tclasses = {c for c, _, _ in self.card}

    def __call__(self, b: pa.Table) -> pa.Table:
        """Vectorized: per card-shape numpy masks; no per-triple Python loop."""
        import numpy as np

        subj_chunks, idx_chunks, min_chunks, max_chunks, n_chunks = [], [], [], [], []

        def emit(subjset: np.ndarray, idx: int, rmin: int, rmax: int, n: int):
            k = len(subjset)
            if not k:
                return
            subj_chunks.append(subjset)
            idx_chunks.append(np.full(k, idx, dtype=np.int32))
            min_chunks.append(np.full(k, rmin, dtype=np.int32))
            max_chunks.append(np.full(k, rmax, dtype=np.int32))
            n_chunks.append(np.full(k, n, dtype=np.int64))

        preds = np.asarray(b["pred"].to_pandas(), dtype=object)
        subjs = np.asarray(b["subj"].to_pandas(), dtype=object)
        objs = np.asarray(b["obj_value"].to_pandas(), dtype=object)

        # required rows from type triples (one per deduped (subj, targetClass))
        tmask = preds == ns.RDF_TYPE
        for tclass, p, idx in self.card:
            sel = subjs[tmask & (objs == tclass)]
            emit(sel, idx, p.min_count, p.max_count, 0)

        # observed rows (focus membership via broadcast set)
        for tclass, p, idx in self.card:
            pm = preds == p.path
            if not pm.any():
                continue
            focus = self.members.get(tclass, frozenset())
            cand = subjs[pm]
            fm = np.fromiter((s in focus for s in cand), dtype=bool, count=len(cand))
            emit(cand[fm], idx, -1, -1, 1)

        if subj_chunks:
            return pa.table({
                "subj": pa.array(np.concatenate(subj_chunks).tolist(), pa.string()),
                "shape_idx": pa.array(np.concatenate(idx_chunks)),
                "req_min": pa.array(np.concatenate(min_chunks)),
                "req_max": pa.array(np.concatenate(max_chunks)),
                "n": pa.array(np.concatenate(n_chunks)),
            })
        return pa.table({
            "subj": pa.array([], pa.string()),
            "shape_idx": pa.array([], pa.int32()),
            "req_min": pa.array([], pa.int32()),
            "req_max": pa.array([], pa.int32()),
            "n": pa.array([], pa.int64()),
        })


def validate(triples: rd.Dataset, shapes_ttl: str, *, deduped: bool = False,
             concurrency: int | tuple | None = None,
             batch_size: int = 4096) -> rd.Dataset:
    """triples Dataset → violations Dataset (schema.VIOLATIONS).

    The deduped triple set is materialized once — it is consumed by three
    downstream passes (class-membership collect, value constraints,
    cardinality rows); without pinning it, each branch would re-run the
    dedup shuffle. At 100 TB this materialization is instead the
    partitioned checkpoint write of the materialize stage (the validation
    passes then read the checkpoint), so nothing holds the full set in
    one node's memory.
    """
    from ..sources import io as io_mod

    if concurrency is None:
        concurrency = io_mod.auto_pool(0.5)
    from ray.data.dataset import MaterializedDataset

    compiled = shapes_mod.compile_shapes(shapes_ttl)
    if not deduped:
        triples = dedup_triples(triples)
    if not isinstance(triples, MaterializedDataset):
        triples = triples.materialize()
    members = collect_class_members(triples, compiled.referenced_classes())
    members_ref = ray.put(members)

    # Stateless task pools + a per-worker-process compile cache (see
    # _worker_state): elastic scheduling, no per-execution actor spawn
    # cost, and the compiled shapes are still built once per worker —
    # the amortization the reference gets from its static shapes cache
    # (SHACLValidationService.ts:35). The actor-pool classes above remain
    # the API for isolation-sensitive deployments.
    def value_fn(b: pa.Table) -> pa.Table:
        return _worker_state(ValueConstraints, shapes_ttl, members_ref)(b)

    def card_fn(b: pa.Table) -> pa.Table:
        return _worker_state(CardinalityRows, shapes_ttl, members_ref)(b)

    value_viols = triples.map_batches(value_fn, batch_format="pyarrow",
                                      batch_size=batch_size)

    card_rows = triples.map_batches(card_fn, batch_format="pyarrow",
                                    batch_size=batch_size)

    counts = card_rows.groupby(["subj", "shape_idx"]).aggregate(
        Max("req_min", alias_name="req_min"),
        Max("req_max", alias_name="req_max"),
        Sum("n", alias_name="n"),
    )

    pshapes = {idx: p for _, p, idx in
               ((n, p, i) for n, p, i in compiled.property_shapes())}
    pages = compiled.foaf_pages()

    def card_violations(b: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for subj, idx, rmin, rmax, n in zip(
                b["subj"].to_pylist(), b["shape_idx"].to_pylist(),
                b["req_min"].to_pylist(), b["req_max"].to_pylist(), b["n"].to_pylist()):
            p = pshapes[idx]
            if rmin is not None and rmin >= 0 and n < rmin:
                comp = ns.SH + "MinCountConstraintComponent"
                rows.append({
                    "severity": p.severity, "focus_node": subj, "path": p.path,
                    "value": "", "message": _synth_message(comp, p),
                    "source_constraint_component": comp, "source_shape": p.iri,
                    "foaf_page": pages.get(p.iri, "")})
            if rmax is not None and rmax >= 0 and n > rmax:
                comp = ns.SH + "MaxCountConstraintComponent"
                rows.append({
                    "severity": p.severity, "focus_node": subj, "path": p.path,
                    "value": "", "message": _synth_message(comp, p),
                    "source_constraint_component": comp, "source_shape": p.iri,
                    "foaf_page": pages.get(p.iri, "")})
        return _violation_rows(rows)

    card_viols = counts.map_batches(card_violations, batch_format="pyarrow")
    return value_viols.union(card_viols)


def severity_partition(viols: rd.Dataset) -> rd.Dataset:
    """A1: per-severity counts (SHACLValidationService.ts:411-413)."""
    return viols.groupby("severity").aggregate(Count(alias_name="n"))


def conforms(viols: rd.Dataset) -> bool:
    """A2: global conforms flag (reportWorker.ts:49-50)."""
    return viols.count() == 0
