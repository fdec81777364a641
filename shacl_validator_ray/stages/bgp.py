"""Declarative BGP (basic-graph-pattern) constraints — the engine-level
analog of the reference's SPARQL-based validations plug-in
(/root/reference/src/services/SHACLValidationService.ts:399-406, which
hands ``validations: sparqlValidations`` to shacl-engine): a conjunctive
triple-pattern query evaluated DISTRIBUTED over the triples Dataset.

Semantics follow ``sh:sparql`` with ``sh:select "SELECT $this WHERE
{ ... }"``: every solution binding of ``$this`` yields one violation on
that focus node. Patterns are ``(subject, predicate, object)`` triples
whose predicate is a constant IRI and whose subject/object are either
constants or variables (``"?x"`` / ``"$this"``).

Execution is Ray-Data-first:

- each pattern becomes one vectorized filter+projection over the
  triples stream (constant positions prune inside the batch fn);
- patterns chain through bucketed hash joins on their shared variables
  (the discovery J1 union-tag formulation — one shuffle per join, keyed
  by the first shared variable, remaining shared variables equi-checked
  inside the bucket);
- an optional vectorized ``filter_fn`` (pandas DataFrame → bool mask)
  plays the role of SPARQL ``FILTER``;
- the final distinct-``$this`` reduction is a groupby, and the optional
  target selector restricts focus nodes via the broadcast membership
  sets exactly like the built-in components.

Cross-product joins (no shared variable between a pattern and the
bindings built so far) are rejected at construction: at 100 TB an
accidental cartesian explosion must be an error, not a slow query.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

THIS = "$this"


def _is_var(term) -> bool:
    return isinstance(term, str) and (term.startswith("?")
                                      or term.startswith("$"))


def _canon_path(pred) -> tuple[str, tuple]:
    """Structured path term → (canonical string, (kind, preds)).

    Path terms are TUPLES (never parsed from strings — IRIs contain
    '/', so string syntax would be ambiguous): ``("seq", [p1, p2])``,
    ``("alt", [p1, p2])``, ``("inv", p)``, ``("plus", p)``,
    ``("star", p)``. Canonical strings match the shapes compiler
    (state/shapes.py parse_path): "a/b", "(a | b)", "^p", "p+", "p*" —
    the same strings the derived virtual-predicate rows carry."""
    kind, val = pred
    if kind == "seq":
        preds = tuple(val)
        if len(preds) < 2:
            raise ValueError("seq path needs ≥ 2 predicates")
        return "/".join(preds), ("seq", preds)
    if kind == "alt":
        preds = tuple(val)
        if len(preds) < 2:
            raise ValueError("alt path needs ≥ 2 predicates")
        return "(" + " | ".join(preds) + ")", ("alt", preds)
    if kind == "inv":
        return "^" + val, ("inv", (val,))
    if kind == "plus":
        return val + "+", ("plus", (val,))
    if kind == "star":
        return val + "*", ("star", (val,))
    raise ValueError(f"unknown path kind {kind!r} "
                     "(expected seq/alt/inv/plus/star)")


class BGPConstraint:
    """One conjunctive-pattern constraint; plugs into
    :func:`..stages.shacl.validate` via ``custom=[...]`` (duck-typed
    alongside :class:`..stages.shacl.CustomConstraint`).

    Parameters
    ----------
    patterns : list[tuple[str, str, str]]
        Triple patterns; at least one must mention ``$this``.
    component : str
        IRI reported as ``sourceConstraintComponent``.
    filter_fn : callable, optional
        ``pandas.DataFrame -> bool mask`` over the solution bindings
        (columns = variable names) — the vectorized FILTER clause.
    target : shapes.Target, optional
        Restricts ``$this`` to a target selector's focus set.
    absent_patterns : list[tuple[str, str, str]], optional
        SPARQL ``FILTER NOT EXISTS`` analog: a second pattern chain that
        must share ``$this``; a focus node matching ``patterns`` is a
        violation only when NO solution of ``absent_patterns`` binds the
        same ``$this`` (distributed anti-join on the two distinct-focus
        sets).
    union_patterns : list[list[tuple[str, str, str]]], optional
        SPARQL ``UNION`` analog: additional alternative pattern chains;
        a focus node is a violation when ANY chain (the primary
        ``patterns`` or any alternative) matches it. Each chain is
        evaluated independently (same join machinery) and the distinct
        focus sets union through one groupby — alternatives never
        multiply each other's bindings.
    optional_pattern : tuple[str, str, str] | list[tuple], optional
        SPARQL ``OPTIONAL`` analog for reporting: an extra pattern of
        the form ``($this, p, ?v)`` — or a LINEAR CHAIN of such
        patterns ``[($this, p, ?v), (?v, q, ?w), …]``, the nested-
        OPTIONAL shape ``OPTIONAL { $this p ?v . OPTIONAL { ?v q ?w }}``
        — evaluated as successive LEFT-outer bucketed merges onto the
        focus set (first value ascending at every step, deterministic).
        Matched focus nodes carry the DEEPEST bound value in the
        violation's ``value`` column and that step's predicate in
        ``path``; wholly unmatched ones keep the focus IRI. Optional
        never filters, exactly like SPARQL.
    values_rows : tuple(vars, rows), optional
        SPARQL ``VALUES`` analog: an inline binding table —
        ``(("?v",), [("a",), ("b",)])``. Every variable must be bound
        by ``patterns``; the table is applied as one vectorized
        membership filter over the solution bindings (an inner merge
        with the broadcast inline table — never a shuffle). Unbound
        VALUES variables (a cross product) are rejected at evaluation.
        Cannot combine with ``union_patterns``.
    value_var : str, optional
        SHACL-SPARQL ``?value`` projection: ONE violation per distinct
        ``($this, ?value)`` solution pair, with the binding in the
        report's ``value`` column (instead of one violation per
        distinct focus with value = focus). The variable must be bound
        by ``patterns`` (and by every UNION alternative); cannot
        combine with ``optional_pattern`` (which owns the value column)
        or ``having`` (which aggregates the solutions away).
    having : tuple (var, op, n), optional
        SPARQL aggregate analog ``GROUP BY $this HAVING
        (count(distinct var) OP n)``: the focus node is a violation
        only when its number of DISTINCT bindings of ``var`` satisfies
        the comparison (op ∈ {">", ">=", "<", "<=", "=="}). Evaluated
        as two binding-sized groupbys + a vectorized threshold filter;
        cannot combine with ``union_patterns``.
    """

    def __init__(self, patterns, component: str, *, message: str = "",
                 severity: str = "Violation", shape_iri: str = "",
                 target=None, filter_fn=None, absent_patterns=None,
                 union_patterns=None, optional_pattern=None, having=None,
                 values_rows=None, value_var=None):
        if not patterns:
            raise ValueError("BGPConstraint needs at least one pattern")
        # property paths (tuple predicates) canonicalize to the shapes
        # compiler's path strings; their derived virtual-predicate rows
        # are built lazily at evaluation time (self.paths)
        self.paths: dict[str, tuple] = {}
        canon_patterns = []
        for s, p, o in patterns:
            if isinstance(p, tuple):
                canon, spec = _canon_path(p)
                self.paths[canon] = spec
                p = canon
            canon_patterns.append((s, p, o))
        patterns = canon_patterns
        bound: set[str] = set()
        seen_this = False
        for i, (s, p, o) in enumerate(patterns):
            # a variable predicate participates in joins like any other
            # variable (its candidate scan is full-width — every triple —
            # but stays a distributed batch filter/projection)
            pvars = {t for t in (s, p, o) if _is_var(t)}
            seen_this = seen_this or THIS in pvars
            if i > 0 and bound and not (pvars & bound):
                raise ValueError(
                    f"pattern {i} shares no variable with the preceding "
                    f"patterns — cross products are rejected (reorder the "
                    f"patterns so each one joins on a bound variable)")
            bound |= pvars
        if not seen_this:
            raise ValueError("no pattern binds $this")
        if absent_patterns:
            inner = BGPConstraint(absent_patterns, component)
            self.absent = inner.patterns
            self.paths.update(inner.paths)
        else:
            self.absent = None
        if union_patterns:
            self.alts = []
            for alt in union_patterns:
                inner = BGPConstraint(alt, component)
                self.alts.append(inner.patterns)
                self.paths.update(inner.paths)
        else:
            self.alts = []
        if optional_pattern is not None:
            # normalize: single pattern → chain of one; validate the
            # linear-chain invariant (each step joins on the previous
            # step's object variable, nested-OPTIONAL style)
            chain = (list(optional_pattern)
                     if optional_pattern and isinstance(
                         optional_pattern[0], (tuple, list))
                     else [tuple(optional_pattern)])
            prev = THIS
            seen_vars = {THIS}
            canon_chain = []
            for s_, p_, o_ in chain:
                if isinstance(p_, tuple):
                    # property paths annotate like any predicate: the
                    # canonical path string becomes the report's path
                    # and the step scans the derived virtual rows
                    canon, spec = _canon_path(p_)
                    self.paths[canon] = spec
                    p_ = canon
                if s_ != prev or _is_var(p_) \
                        or not _is_var(o_) or o_ in seen_vars:
                    raise ValueError(
                        "optional_pattern must be ($this, <pred-or-path>, "
                        "?var) or a linear chain [($this,p,?v), "
                        "(?v,q,?w), …] with fresh object variables")
                seen_vars.add(o_)
                prev = o_
                canon_chain.append((s_, p_, o_))
            self.optional_chain = canon_chain
            self.optional_pattern = self.optional_chain[0]
        else:
            self.optional_chain = None
            self.optional_pattern = None
        if values_rows is not None:
            vvars, vrows = values_rows
            vvars = tuple(vvars)
            if not vvars or not all(_is_var(v) for v in vvars):
                raise ValueError("values_rows vars must be ?variables")
            unbound = [v for v in vvars if v not in bound]
            if unbound:
                raise ValueError(
                    f"VALUES variables {unbound} are not bound by any "
                    "pattern — an unbound VALUES table is a cross "
                    "product, rejected like cross-product joins")
            if union_patterns:
                raise ValueError("values_rows cannot combine with "
                                 "union_patterns")
            rows = []
            for r in vrows:
                r = tuple(str(x) for x in (r if isinstance(r, (tuple, list))
                                           else (r,)))
                if len(r) != len(vvars):
                    raise ValueError(
                        f"VALUES row {r!r} arity != vars {vvars!r}")
                rows.append(r)
            if not rows:
                raise ValueError("values_rows needs at least one row")
            self.values_rows = (vvars, rows)
        else:
            self.values_rows = None
        if having is not None:
            # (var, op, n) = count-distinct (back-compat) or
            # (agg, var, op, n) with agg in countd/count/sum/avg/min/max
            if len(having) == 3:
                agg, (hvar, hop, hn) = "countd", having
            else:
                agg, hvar, hop, hn = having
            if agg not in ("countd", "count", "sum", "avg", "min", "max"):
                raise ValueError(f"unknown having aggregate {agg!r}")
            if not _is_var(hvar) or hvar == THIS:
                raise ValueError("having variable must be a ?var "
                                 "other than $this")
            if hvar not in bound:
                raise ValueError(f"having variable {hvar!r} is not bound "
                                 "by any pattern")
            if hop not in (">", ">=", "<", "<=", "=="):
                raise ValueError(f"unknown having operator {hop!r}")
            self.having = (agg, hvar, hop,
                           int(hn) if agg in ("countd", "count")
                           else float(hn))
        else:
            self.having = None
        if value_var is not None:
            if not _is_var(value_var) or value_var == THIS:
                raise ValueError("value_var must be a ?var other than "
                                 "$this")
            if value_var not in bound:
                raise ValueError(f"value_var {value_var!r} is not bound "
                                 "by any pattern")
            if optional_pattern is not None or having is not None:
                raise ValueError("value_var cannot combine with "
                                 "optional_pattern or having")
            for i, alt in enumerate(self.alts):
                avars = {t for pat in alt for t in pat if _is_var(t)}
                if value_var not in avars:
                    raise ValueError(
                        f"value_var {value_var!r} is not bound by UNION "
                        f"alternative {i}")
        self.value_var = value_var
        self.patterns = [tuple(p) for p in patterns]
        self.component = component
        self.message = message or f"BGP constraint {component} matched"
        self.severity = severity
        self.shape_iri = shape_iri or component
        # target: one Target, a LIST of Targets (focus set = union, the
        # SHACL multi-target semantics — sh:sparql constraints inherit
        # their node shape's full target list), or None
        if target is None:
            self.targets: tuple = ()
        elif isinstance(target, (list, tuple)):
            self.targets = tuple(target)
        else:
            self.targets = (target,)
        self.target = self.targets[0] if len(self.targets) == 1 else None
        self.filter_fn = filter_fn

    # -- derived virtual-predicate rows for path patterns --------------
    def _derived(self, triples: rd.Dataset) -> rd.Dataset | None:
        """Virtual triple rows (pred = canonical path string) for every
        path used by this constraint — the same derivation the validator
        runs for sh:path (shacl.augment_paths): sequences via memoized
        reach-pair joins, closures via pointer-doubling, alternatives and
        inverses via one vectorized map. Returns None when pathless."""
        if not self.paths:
            return None
        from ..sources import io as io_mod
        from .shacl import _closure_rows, _seq_rows, dedup_triples

        num_partitions = max(8, io_mod.default_num_blocks() // 2)
        derived: list[rd.Dataset] = []
        prefix_cache: dict = {}
        invs = [(c, s[1][0]) for c, s in self.paths.items() if s[0] == "inv"]
        alts = [(c, s[1]) for c, s in self.paths.items() if s[0] == "alt"]
        if invs or alts:
            def swap_rows(b: pa.Table) -> pa.Table:
                outs = []
                for canon, pred in invs:
                    sub = b.filter(pc.equal(b["pred"], pred))
                    if sub.num_rows:
                        skind = ["blank" if s.startswith("_:") else "iri"
                                 for s in sub["subj"].to_pylist()]
                        n = sub.num_rows
                        outs.append(pa.table({
                            "subj": sub["obj_value"],
                            "pred": pa.array([canon] * n, pa.string()),
                            "obj_kind": pa.array(skind, pa.string()),
                            "obj_value": sub["subj"],
                            "obj_datatype": pa.array([""] * n, pa.string()),
                            "obj_lang": pa.array([""] * n, pa.string()),
                            "doc_id": sub["doc_id"],
                            "span_idx": sub["span_idx"]}))
                for canon, preds in alts:
                    sub = b.filter(pc.is_in(
                        b["pred"], value_set=pa.array(list(preds))))
                    if sub.num_rows:
                        sub = sub.set_column(
                            sub.column_names.index("pred"), "pred",
                            pa.array([canon] * sub.num_rows, pa.string()))
                        outs.append(sub)
                return pa.concat_tables(outs) if outs else b.slice(0, 0)

            derived.append(triples.map_batches(
                swap_rows, batch_format="pyarrow", zero_copy_batch=True))
        for canon, (kind, preds) in self.paths.items():
            if kind == "seq":
                derived.append(_seq_rows(triples, canon, tuple(preds),
                                         num_partitions, prefix_cache)
                               .materialize())
            elif kind in ("plus", "star"):
                derived.append(_closure_rows(triples, canon, preds[0],
                                             kind == "star",
                                             num_partitions))
        out = derived[0]
        for d in derived[1:]:
            out = out.union(d)
        out = out.map_batches(lambda b: b, batch_format="pyarrow",
                              zero_copy_batch=True)
        coalesce = max(8, io_mod.shuffle_buckets() // 4)
        return dedup_triples(out.repartition(coalesce)).materialize()

    # -- pattern → candidate bindings ----------------------------------
    def _candidates(self, tri: tuple[rd.Dataset, rd.Dataset | None],
                    pattern: tuple[str, str, str]) -> rd.Dataset:
        triples, derived = tri
        s, p, o = pattern
        # path patterns scan ONLY the derived virtual rows; plain and
        # variable predicates scan only the original stream — a variable
        # predicate never binds to a synthetic path string
        source = derived if p in self.paths else triples
        pos = [("subj", s), ("pred", p), ("obj_value", o)]
        out_vars = list(dict.fromkeys(t for _, t in pos if _is_var(t)))
        schema = pa.schema([pa.field(v, pa.string()) for v in out_vars])

        def fn(b: pa.Table) -> pa.Table:
            f = b
            for col, t in pos:
                if not _is_var(t):
                    f = f.filter(pc.equal(f[col], t))
            first_col: dict[str, str] = {}
            for col, t in pos:
                if _is_var(t):
                    if t in first_col:  # repeated var: equi-filter
                        f = f.filter(pc.equal(f[first_col[t]], f[col]))
                    else:
                        first_col[t] = col
            cols = {v: f[first_col[v]].cast(pa.string()) for v in out_vars}
            return pa.table(cols, schema=schema)

        return source.map_batches(fn, batch_format="pyarrow",
                                  zero_copy_batch=True)

    # -- bucketed hash join on shared variables ------------------------
    @staticmethod
    def _join(bindings: rd.Dataset, cand: rd.Dataset, shared: list[str],
              b_cols: list[str], c_cols: list[str]) -> rd.Dataset:
        """Union-tag + bucketed merge (a side that is itself a join
        output breaks Ray's native JoinOperator key resolution)."""
        import pandas as pd

        from .discovery import bucketed_block_apply

        key = shared[0]
        out_cols = sorted(set(b_cols) | set(c_cols))

        def tag(side: str, cols: list[str]):
            def fn(b: pa.Table) -> pa.Table:
                arrays = {"_side": pa.array([side] * b.num_rows, pa.string())}
                for c in out_cols:
                    arrays[c] = (b[c].cast(pa.string()) if c in cols
                                 else pa.nulls(b.num_rows, pa.string()))
                return pa.table(arrays)
            return fn

        both = (bindings.map_batches(tag("b", b_cols), batch_format="pyarrow")
                .union(cand.map_batches(tag("c", c_cols),
                                        batch_format="pyarrow")))

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            lb = g.loc[g["_side"] == "b", b_cols]
            rc = g.loc[g["_side"] == "c", c_cols]
            if not len(lb) or not len(rc):
                return pd.DataFrame({c: pd.Series(dtype=object)
                                     for c in out_cols})
            m = lb.merge(rc, on=shared)
            return m[out_cols].drop_duplicates()

        return bucketed_block_apply(both, key, merge)

    # -- public surface ------------------------------------------------
    def _chain(self, tri: tuple[rd.Dataset, rd.Dataset | None],
               patterns) -> tuple[rd.Dataset, list[str]]:
        cur: rd.Dataset | None = None
        cur_cols: list[str] = []
        for pattern in patterns:
            pvars = [t for t in pattern if _is_var(t)]
            pvars = list(dict.fromkeys(pvars))
            cand = self._candidates(tri, pattern)
            if cur is None:
                cur, cur_cols = cand, pvars
                continue
            shared = [v for v in pvars if v in cur_cols]
            cur = self._join(cur, cand, shared, cur_cols, pvars)
            cur_cols = sorted(set(cur_cols) | set(pvars))
        assert cur is not None
        return cur, cur_cols

    def bindings(self, triples: rd.Dataset) -> tuple[rd.Dataset, list[str]]:
        """Distributed solution bindings for the full pattern chain."""
        return self._bindings_from((triples, self._derived(triples)))

    def _bindings_from(self, tri) -> tuple[rd.Dataset, list[str]]:
        cur, cur_cols = self._chain(tri, self.patterns)
        if self.values_rows is not None:
            # VALUES: vectorized inner merge with the broadcast inline
            # table (tiny, ships with the task) — never a shuffle
            vvars, vrows = self.values_rows
            missing = [v for v in vvars if v not in cur_cols]
            if missing:
                raise ValueError(f"VALUES variables {missing} not bound "
                                 "by the pattern chain")

            def apply_values(df):
                import pandas as pd

                vdf = pd.DataFrame(vrows, columns=list(vvars)) \
                    .drop_duplicates()
                out = df.merge(vdf, on=list(vvars))
                return out if len(out) else df.iloc[0:0]

            cur = cur.map_batches(apply_values, batch_format="pandas")
        if self.filter_fn is not None:
            fn = self.filter_fn

            def apply_filter(df):
                import pandas as pd

                mask = fn(df)
                out = df[pd.Series(mask, index=df.index).astype(bool)]
                return out if len(out) else df.iloc[0:0]

            cur = cur.map_batches(apply_filter, batch_format="pandas")
        return cur, cur_cols

    def violations(self, triples: rd.Dataset,
                   members: dict | None = None) -> rd.Dataset:
        from ray.data.aggregate import Count

        from .shacl import _focus_sets, _members_mask, _violation_rows

        tri = (triples, self._derived(triples))
        sol, sol_cols = self._bindings_from(tri)
        focus_sol = sol
        proj_cols = ([THIS, self.value_var] if self.value_var is not None
                     else [THIS])
        for alt in self.alts:  # UNION: alternatives add focus nodes
            ab, _ = self._chain(tri, alt)

            def proj(b: pa.Table, cols=tuple(proj_cols)) -> pa.Table:
                return pa.table({c: b[c].cast(pa.string()) for c in cols})

            focus_sol = (focus_sol.map_batches(proj, batch_format="pyarrow")
                         .union(ab.map_batches(proj,
                                               batch_format="pyarrow")))
        if self.having is not None:
            # SPARQL GROUP BY $this HAVING (AGG(...) OP n): aggregate
            # over the DISTINCT solution set (the engine's set
            # semantics) → vectorized threshold filter. Two
            # binding-sized shuffles, no corpus-scale state anywhere.
            if self.alts:
                raise ValueError("having cannot combine with "
                                 "union_patterns (group the union "
                                 "inside one chain instead)")
            agg, hvar, hop, hn = self.having
            hfns = {">": pc.greater, ">=": pc.greater_equal,
                    "<": pc.less, "<=": pc.less_equal, "==": pc.equal}
            hfn = hfns[hop]
            if agg == "countd":
                # count(distinct ?v): distinct (focus, v) pairs →
                # per-focus count
                pairs = focus_sol.map_batches(
                    lambda b: pa.table({"focus": b[THIS].cast(pa.string()),
                                        "v": b[hvar].cast(pa.string())}),
                    batch_format="pyarrow")
                cnt = (pairs.groupby(["focus", "v"])
                       .aggregate(Count(alias_name="_d"))
                       .groupby("focus").aggregate(Count(alias_name="_n")))
            else:
                # count / sum / avg / min / max over distinct FULL
                # solution rows (two different ?d with equal ?v both
                # count — distinctness is per solution, not per value)
                from ray.data.aggregate import Max, Mean, Min, Sum

                distinct = (focus_sol.groupby(list(sol_cols))
                            .aggregate(Count(alias_name="_dup")))
                if agg == "count":
                    cnt = (distinct.map_batches(
                        lambda b: pa.table(
                            {"focus": b[THIS].cast(pa.string())}),
                        batch_format="pyarrow")
                        .groupby("focus").aggregate(Count(alias_name="_n")))
                else:
                    aggs = {"sum": Sum, "avg": Mean,
                            "min": Min, "max": Max}
                    proj = distinct.map_batches(
                        lambda b: pa.table({
                            "focus": b[THIS].cast(pa.string()),
                            "v": pc.cast(b[hvar], pa.float64())}),
                        batch_format="pyarrow")
                    cnt = (proj.groupby("focus")
                           .aggregate(aggs[agg]("v", alias_name="_n")))
            focus = cnt.map_batches(
                lambda b: b.filter(hfn(pc.cast(b["_n"], pa.float64()),
                                       float(hn)))
                           .select(["focus", "_n"]),
                batch_format="pyarrow")
        elif self.value_var is not None:
            # ?value projection: one result per DISTINCT (focus, value)
            # solution pair — the SHACL-SPARQL result cardinality
            vv = self.value_var
            focus = (focus_sol.map_batches(
                lambda b: pa.table({"focus": b[THIS].cast(pa.string()),
                                    "opt": b[vv].cast(pa.string())}),
                batch_format="pyarrow")
                .groupby(["focus", "opt"]).aggregate(Count(alias_name="_n")))
        else:
            focus = (focus_sol.map_batches(
                lambda b: pa.table({"focus": b[THIS].cast(pa.string())}),
                batch_format="pyarrow")
                .groupby("focus").aggregate(Count(alias_name="_n")))

        if self.absent is not None:
            # FILTER NOT EXISTS: anti-join the distinct focus sets — one
            # bucketed shuffle, the absent side only ships its focus col
            import pandas as pd

            from .discovery import bucketed_block_apply

            ab, _ = self._chain(tri, self.absent)
            ab_focus = (ab.map_batches(
                lambda b: pa.table({"focus": b[THIS].cast(pa.string())}),
                batch_format="pyarrow")
                .groupby("focus").aggregate(Count(alias_name="_n")))

            def tag(side: str):
                def fn(b: pa.Table) -> pa.Table:
                    # carry the ?value column through the anti-join when
                    # the constraint projects it
                    opt = (b["opt"].cast(pa.string())
                           if "opt" in b.column_names
                           else pa.nulls(b.num_rows,
                                         pa.string()).fill_null(""))
                    return pa.table({
                        "focus": b["focus"].cast(pa.string()),
                        "opt": opt,
                        "_side": pa.array([side] * b.num_rows, pa.string())})
                return fn

            both = (focus.map_batches(tag("m"), batch_format="pyarrow")
                    .union(ab_focus.map_batches(tag("a"),
                                                batch_format="pyarrow")))

            def anti(g: pd.DataFrame) -> pd.DataFrame:
                drop = set(g.loc[g["_side"] == "a", "focus"])
                keep = g.loc[(g["_side"] == "m") & ~g["focus"].isin(drop),
                             ["focus", "opt"]]
                return keep if len(keep) else pd.DataFrame(
                    {"focus": pd.Series(dtype=object),
                     "opt": pd.Series(dtype=object)})

            focus = bucketed_block_apply(both, "focus", anti)

        if self.optional_chain is not None:
            # OPTIONAL (possibly a nested linear chain): successive
            # LEFT-outer bucketed merges of the focus set with each
            # step's candidates — never filters, only annotates. State
            # rows carry (focus, opt = deepest value so far, pth = that
            # step's predicate, cur = join key for the next step; ""
            # once a step fails to match).
            import numpy as np
            import pandas as pd

            from .discovery import bucketed_block_apply

            state = focus.map_batches(
                lambda b: pa.table({
                    "key": b["focus"].cast(pa.string()),
                    "focus": b["focus"].cast(pa.string()),
                    "opt": pa.nulls(b.num_rows, pa.string()).fill_null(""),
                    "pth": pa.nulls(b.num_rows, pa.string()).fill_null("")}),
                batch_format="pyarrow")

            for (s_, p_, o_) in self.optional_chain:
                cand = self._candidates(tri, (s_, p_, o_))

                def tag_f(b: pa.Table) -> pa.Table:
                    return pa.table({
                        "key": b["key"].cast(pa.string()),
                        "focus": b["focus"].cast(pa.string()),
                        "opt": b["opt"].cast(pa.string()),
                        "pth": b["pth"].cast(pa.string()),
                        "v": pa.nulls(b.num_rows, pa.string()),
                        "_side": pa.array(["f"] * b.num_rows, pa.string())})

                def tag_o(b: pa.Table, sv=s_, ov=o_) -> pa.Table:
                    return pa.table({
                        "key": b[sv].cast(pa.string()),
                        "focus": pa.nulls(b.num_rows, pa.string()),
                        "opt": pa.nulls(b.num_rows, pa.string()),
                        "pth": pa.nulls(b.num_rows, pa.string()),
                        "v": b[ov].cast(pa.string()),
                        "_side": pa.array(["o"] * b.num_rows, pa.string())})

                both = (state.map_batches(tag_f, batch_format="pyarrow")
                        .union(cand.map_batches(tag_o,
                                                batch_format="pyarrow")))

                def step_merge(g: pd.DataFrame, pred=p_) -> pd.DataFrame:
                    fs = g.loc[g["_side"] == "f",
                               ["key", "focus", "opt", "pth"]]
                    ov = (g.loc[g["_side"] == "o", ["key", "v"]]
                          .sort_values(["key", "v"])
                          .groupby("key", sort=False).first().reset_index())
                    m = fs.merge(ov, on="key", how="left")
                    hit = m["v"].notna()
                    m["opt"] = m["v"].where(hit, m["opt"])
                    m["pth"] = np.where(hit, pred, m["pth"])
                    # next step joins on this step's value; "" = dead end
                    # (state rows whose key matched nothing stay idle in
                    # later rounds — "" never matches a subject IRI)
                    m["key"] = m["v"].fillna("")
                    return m[["key", "focus", "opt", "pth"]]

                state = bucketed_block_apply(both, "key", step_merge)

            focus = state.map_batches(
                lambda b: pa.table({
                    "focus": b["focus"].cast(pa.string()),
                    "opt": b["opt"].cast(pa.string()),
                    "pth": b["pth"].cast(pa.string())}),
                batch_format="pyarrow")
        else:
            def finalize(b: pa.Table) -> pa.Table:
                opt = (b["opt"].cast(pa.string())
                       if "opt" in b.column_names
                       else pa.nulls(b.num_rows, pa.string()).fill_null(""))
                return pa.table({
                    "focus": b["focus"].cast(pa.string()),
                    "opt": opt,
                    "pth": pa.nulls(b.num_rows, pa.string()).fill_null("")})

            focus = focus.map_batches(finalize, batch_format="pyarrow")

        fsets = (_focus_sets(members or {}, self.targets)
                 if self.targets else None)
        ref = ray.put((fsets, self.severity, self.component, self.message,
                       self.shape_iri))

        def to_viol(b: pa.Table) -> pa.Table:
            import numpy as np

            fsets_, sev, comp, msg, shape = ray.get(ref)
            vals = np.asarray(b["focus"].to_pandas(), dtype=object)
            opts = np.asarray(b["opt"].to_pandas(), dtype=object)
            pths = np.asarray(b["pth"].to_pandas(), dtype=object)
            if fsets_ is not None:
                m = _members_mask(fsets_, vals)
                vals, opts, pths = vals[m], opts[m], pths[m]
            templated = "{$this}" in msg or "{?value}" in msg

            def render(v: str, o: str) -> str:
                # SHACL-SPARQL message templating: {$this} / {?value}
                # substitute per result (shacl-engine behavior)
                if not templated:
                    return msg
                return (msg.replace("{$this}", v)
                        .replace("{?value}", o or v))

            return _violation_rows([
                {"severity": sev, "focus_node": v,
                 "path": p if o else "",
                 "value": (o or v),
                 "message": [{"text": render(v, o), "lang": "en"}],
                 "source_constraint_component": comp,
                 "source_shape": shape, "foaf_page": ""}
                for v, o, p in zip(vals, opts, pths)])

        return focus.map_batches(to_viol, batch_format="pyarrow")
