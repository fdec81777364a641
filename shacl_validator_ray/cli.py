"""CLI entry points mirroring the reference's three user flows
(SURVEY.md §3): validate, view/analyze a report, discover datasets —
plus the KG materialization run.

This module OWNS a Ray session (guarded init) — the only library-adjacent
code allowed to call ``ray.init`` besides bench.py and the test fixture.

Usage:
  python -m shacl_validator_ray.cli validate DATA.ttl [--shapes SHAPES.ttl]
  python -m shacl_validator_ray.cli sparql DATA.ttl "SELECT $this WHERE {...}"
  python -m shacl_validator_ray.cli report REPORT.ttl
  python -m shacl_validator_ray.cli discover DATA.ttl [--query q]
  python -m shacl_validator_ray.cli materialize SF_DIR OUT_DIR
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _triples_from_ttl(path: str):
    import pyarrow as pa
    import ray.data as rd

    from . import schema as S
    from .functions import turtle

    with open(path) as f:
        rows = turtle.parse_turtle(f.read(), bnode_prefix=path.replace("/", "_"))
    tbl = pa.Table.from_pylist(
        [{"subj": s, "pred": p, "obj_kind": k, "obj_value": v,
          "obj_datatype": dt, "obj_lang": lg, "doc_id": path, "span_idx": 0}
         for s, p, k, v, dt, lg in rows], schema=S.TRIPLES)
    return rd.from_arrow(tbl)


def cmd_validate(args) -> int:
    from .stages import report as report_mod, shacl
    from .state import shapes as shapes_mod

    _init_ray()
    if args.shapes:  # custom-shapes mode (SHACLManager.tsx:31-107 analog)
        with open(args.shapes) as f:
            ttl = f.read()
    else:
        ttl = shapes_mod.load_profile_ttl(
            args.profile, version=getattr(args, "profile_version", None),
            branch=getattr(args, "branch", None))
    viols = shacl.validate(_triples_from_ttl(args.data), ttl)
    n = viols.count()
    if args.format == "ttl":
        print(report_mod.report_to_turtle(viols, profile_name=args.profile))
    elif args.format == "csv":
        print(report_mod.report_to_csv(viols))
    else:
        print(json.dumps({"conforms": n == 0, "results": n}))
        # stream a BOUNDED detail listing — on a dirty 100 TB corpus the
        # violation set scales with data and must never be take_all()'d
        # onto the driver (--limit 0 = unbounded, explicit opt-in)
        shown = 0
        for r in viols.iter_rows():
            if args.limit and shown >= args.limit:
                print(json.dumps({"truncated": True, "shown": shown,
                                  "total": n}))
                break
            print(json.dumps({k: r[k] for k in
                              ("severity", "focus_node", "path", "value",
                               "source_constraint_component")}))
            shown += 1
    return 0 if n == 0 else 1


def cmd_report(args) -> int:
    import ray.data as rd

    from .stages import report as report_mod

    _init_ray()
    with open(args.report) as f:
        viols = rd.from_arrow(report_mod.parse_report_turtle(f.read()))
    out = {
        "summary": report_mod.summary_stats(viols).to_dict("records")[0],
        "top_shapes": report_mod.top_shapes(viols).to_dict("records"),
        "properties": report_mod.property_breakdown(viols).to_dict("records"),
        "components": report_mod.constraint_components(viols).to_dict("records"),
        "focus_nodes": report_mod.focus_node_breakdown(viols).to_dict("records"),
    }
    print(json.dumps(out, indent=1, default=str))
    return 0


def cmd_sparql(args) -> int:
    """Ad-hoc SPARQL SELECT over a data TTL through the distributed BGP
    evaluator: prints one JSON line per matching focus node (the same
    subset the sh:sparql shape-constraint parser accepts)."""
    from .functions.sparql import parse_select

    if bool(getattr(args, "sf_dir", None)) == bool(args.data):
        print(json.dumps({"error": "pass exactly one of DATA.ttl or "
                                   "--sf-dir"}), file=sys.stderr)
        return 2
    _init_ray()
    text = args.select
    if text.startswith("@"):  # @file.rq convention
        with open(text[1:]) as f:
            text = f.read()
    cc = parse_select(text, component="urn:cli:sparql",
                      message="cli sparql match")
    if getattr(args, "sf_dir", None):
        # corpus mode: run against the extraction pipeline's graph
        from .pipelines import kg

        triples = kg.triples_dataset(args.sf_dir)
    else:
        triples = _triples_from_ttl(args.data)
    rows = (cc.violations(triples)
            .select_columns(["focus_node", "path", "value"])
            .to_pandas().sort_values(["focus_node", "value"]))
    for r in rows.to_dict("records"):
        print(json.dumps(r))
    print(json.dumps({"matches": len(rows)}), file=sys.stderr)
    return 0


def cmd_discover(args) -> int:
    from .stages import discovery

    _init_ray()
    df = discovery.discover_datasets(_triples_from_ttl(args.data),
                                     query=args.query or "", limit=args.limit)
    print(df.to_json(orient="records", indent=1))
    return 0


def cmd_materialize(args) -> int:
    from .pipelines import kg

    _init_ray()
    stats = kg.full_pipeline(args.sf_dir, args.out_dir)
    print(json.dumps({"violations": stats["violations"],
                      "triples": stats["triples"],
                      "manifest": {k: v for k, v in stats["manifest"].items()
                                   if k != "hubs"}}))
    return 0


def cmd_dedup(args) -> int:
    """Corpus curation surface: cluster-based near-dup removal over a
    documents.parquet table. Writes the surviving documents (one per
    near-dup cluster) plus the full (doc_id, rep_id, keep) provenance
    map as partitioned parquet; prints a one-line JSON summary.
    ``--mode substring`` runs exact repeated-substring REMOVAL instead
    (Lee et al. 2022 span surgery): writes (doc_id, text, n_removed)
    with every non-canonical occurrence of a repeated ≥k-token passage
    excised."""
    from .sources import io as io_mod
    from .stages import dedup

    import os

    import pyarrow as pa

    from .stages.discovery import bucketed_block_apply

    _init_ray()
    docs = io_mod.read_table(f"{args.sf_dir}/documents.parquet").materialize()

    if getattr(args, "mode", "cluster") == "substring":
        from ray.data.aggregate import Sum

        out = dedup.substring_dedup(docs, k=args.k).materialize()
        os.makedirs(args.out_dir, exist_ok=True)
        out.write_parquet(f"{args.out_dir}/documents_substring_dedup")
        removed = out.aggregate(Sum("n_removed", alias_name="r"))["r"]
        print(json.dumps({"docs": out.count(), "k": args.k,
                          "tokens_removed": int(removed or 0),
                          "out": args.out_dir}))
        return 0
    keep_map = dedup.fuzzy_dedup_keep(docs, tau=args.tau).materialize()
    n_total = keep_map.count()
    os.makedirs(args.out_dir, exist_ok=True)
    keep_map.write_parquet(f"{args.out_dir}/dedup_map")

    # survivor semi-join: tagged union + one bucketed merge on doc_id
    # (the engine's J1 formulation — no extra aggregator-actor pool
    # competing with the dedup stages on small clusters)
    doc_schema = docs.schema().base_schema
    doc_cols = list(doc_schema.names)

    def tag_docs(b: pa.Table) -> pa.Table:
        return b.append_column("keep", pa.nulls(b.num_rows, pa.bool_()))

    def tag_keep(b: pa.Table) -> pa.Table:
        cols = {}
        for f in doc_schema:
            cols[f.name] = (b["doc_id"].cast(f.type) if f.name == "doc_id"
                            else pa.nulls(b.num_rows, f.type))
        cols["keep"] = b["keep"].cast(pa.bool_())
        return pa.table(cols)

    def semi(g):
        keep_ids = set(g.loc[g["keep"].notna() & g["keep"].astype(bool),
                             "doc_id"])
        rows = g.loc[g["keep"].isna() & g["doc_id"].isin(keep_ids), doc_cols]
        return rows if len(rows) else g.iloc[0:0][doc_cols]

    both = docs.map_batches(tag_docs, batch_format="pyarrow").union(
        keep_map.select_columns(["doc_id", "keep"]).map_batches(
            tag_keep, batch_format="pyarrow"))
    kept = bucketed_block_apply(both, "doc_id", semi)
    kept.write_parquet(f"{args.out_dir}/documents_dedup")
    n_kept = kept.count()
    print(json.dumps({"docs": n_total, "kept": n_kept,
                      "removed": n_total - n_kept, "tau": args.tau,
                      "out": args.out_dir}))
    return 0


def cmd_query(args) -> int:
    """Run any registry pipeline by name over an sf_dir table directory
    and stream up to --limit result rows as JSON lines (a final one-line
    summary carries the total row count). ``--list`` prints the names."""
    from .pipelines import queries as q

    if args.list or not args.name:
        for name in sorted(q.QUERIES):
            print(name)
        return 0
    if args.name not in q.QUERIES:
        print(json.dumps({"error": f"unknown query {args.name!r}; "
                          f"use --list"}))
        return 2
    _init_ray()
    res = q.QUERIES[args.name](args.sf_dir)
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        shown = 0
        total = 0
        for b in res.iter_batches(batch_format="pyarrow"):
            total += b.num_rows
            if shown < args.limit:
                take = min(args.limit - shown, b.num_rows)
                for row in b.slice(0, take).to_pylist():
                    print(json.dumps(row, default=str))
                shown += take
        print(json.dumps({"query": args.name, "rows": total,
                          "shown": shown}))
        return 0
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas() \
        if isinstance(res, pa.Table) else pd.DataFrame(res)
    for row in df.head(args.limit).to_dict(orient="records"):
        print(json.dumps(row, default=str))
    print(json.dumps({"query": args.name, "rows": len(df),
                      "shown": min(args.limit, len(df))}))
    return 0


def cmd_profiles(args) -> int:
    """Registry listing (ProfileSelector.tsx surface): name, description,
    shape files, and the compiled shape/constraint counts per profile."""
    import json as _json
    import os

    from .state import shapes as shapes_mod

    root = os.path.join(os.path.dirname(__file__), "profiles")
    with open(os.path.join(root, "profiles.json")) as f:
        registry = _json.load(f)
    out = []
    for name, meta in sorted(registry.items()):
        compiled = shapes_mod.compile_shapes(shapes_mod.load_profile_ttl(name))
        row = {
            "profile": name,
            "description": meta.get("description", ""),
            "shaclFiles": meta.get("shaclFiles", []),
            "node_shapes": len(compiled.node_shapes),
            "property_shapes": sum(1 for _ in compiled.property_shapes()),
            "sparql_constraints": len(compiled.sparql_constraints),
        }
        if "versions" in meta:  # reference-parity versioned layout
            row["versions"] = sorted(meta["versions"])
            row["defaultVersion"] = meta.get("defaultVersion")
            row["branches"] = sorted(meta.get("branches", {}))
            row["defaultBranch"] = meta.get("defaultBranch")
            # expand the {branch} template with the default branch so the
            # listing shows resolved paths, consistent with flat profiles
            branch = meta.get("defaultBranch", "main")
            row["shaclFiles"] = [
                f.replace("{branch}", branch)
                for f in meta["versions"][meta["defaultVersion"]]["shaclFiles"]]
        out.append(row)
    print(json.dumps(out, indent=1))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="shacl_validator_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("profiles")
    pr.set_defaults(fn=cmd_profiles)

    v = sub.add_parser("validate")
    v.add_argument("data")
    v.add_argument("--shapes")
    v.add_argument("--profile", default="dcat_ap_demo")
    v.add_argument("--profile-version", default=None,
                   help="version of a versioned profile (default: the "
                        "registry's defaultVersion)")
    v.add_argument("--branch", default=None,
                   help="branch of a versioned profile (default: the "
                        "registry's defaultBranch)")
    v.add_argument("--format", choices=["json", "ttl", "csv"], default="json")
    v.add_argument("--limit", type=int, default=100,
                   help="max violation detail lines in json mode "
                        "(0 = unbounded)")
    v.set_defaults(fn=cmd_validate)

    r = sub.add_parser("report")
    r.add_argument("report")
    r.set_defaults(fn=cmd_report)

    sq = sub.add_parser("sparql")
    sq.add_argument("data", nargs="?", default=None,
                    help="data TTL file (omit with --sf-dir)")
    sq.add_argument("select", help="SPARQL SELECT text (or @file.rq)")
    sq.add_argument("--sf-dir", dest="sf_dir", default=None,
                    help="run against the extraction pipeline's graph "
                         "for this corpus dir instead of a TTL file")
    sq.set_defaults(fn=cmd_sparql)

    d = sub.add_parser("discover")
    d.add_argument("data")
    d.add_argument("--query")
    d.add_argument("--limit", type=int, default=50)
    d.set_defaults(fn=cmd_discover)

    m = sub.add_parser("materialize")
    m.add_argument("sf_dir")
    m.add_argument("out_dir")
    m.set_defaults(fn=cmd_materialize)

    dd = sub.add_parser("dedup")
    dd.add_argument("sf_dir")
    dd.add_argument("out_dir")
    dd.add_argument("--tau", type=float, default=0.95)
    dd.add_argument("--mode", choices=["cluster", "substring"],
                    default="cluster")
    dd.add_argument("--k", type=int, default=8,
                    help="substring mode: minimum repeated passage "
                         "length in tokens")
    dd.set_defaults(fn=cmd_dedup)

    qq = sub.add_parser("query")
    qq.add_argument("name", nargs="?", default="")
    qq.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    qq.add_argument("--limit", type=int, default=20)
    qq.add_argument("--list", action="store_true")
    qq.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
