"""Validation-report algebra + serialization (SURVEY.md §2.5 A3–A9,
§2.6 O1–O2, §2.1 S8–S11).

Dashboards from the reference re-expressed as groupby/sort/limit jobs
over the violations Dataset:
- grouped findings  — ValidationResults.tsx:156-161,264-300 (A3)
- top shapes        — ReportViewer.tsx:140-163 (A5, top 6)
- property breakdown— ReportViewer.tsx:166-190 (A6, top 8)
- focus-node types  — ReportViewer.tsx:193-216 (A7)
- constraint counts — ReportViewer.tsx:219-232 (A8, top 8)
- summary stats     — ReportViewer.tsx:235-248 (A9, distinct counts)
Serialization: Turtle writer mirrors SHACLValidationService.ts:426-555;
re-import mirrors reportWorker.ts:38-112; CSV mirrors
SHACLValidationService.ts:557-583.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count

from ..functions import ns, turtle
from .. import schema as S

SEVERITY_RANK = {"Violation": 0, "Warning": 1, "Info": 2}


def _suffix(s: str) -> str:
    return re.split(r"[#/]", s)[-1] or s


def normalize_lang(lang: str) -> str:
    """M8: 'es-ES' → 'es' (SHACLValidationService.ts:271-274)."""
    return lang.lower().split("-")[0] if lang else ""


def fingerprint_messages(messages) -> str:
    """A3 key part (ValidationResults.tsx:156-161)."""
    if not messages:
        return "__empty__"
    return "||".join(f"{normalize_lang(m['lang']) or 'und'}::{m['text']}" for m in messages)


def select_message_for_locale(messages, preferred: str = "en", fallback: str = "es") -> str:
    """M9 locale-preferring selection (ValidationResults.tsx:163-176)."""
    if not messages:
        return ""
    pref, fb = normalize_lang(preferred) or fallback, normalize_lang(fallback)
    for want in (pref, fb):
        for m in messages:
            if normalize_lang(m["lang"]) == want:
                return m["text"]
    for m in messages:
        if not m["lang"]:
            return m["text"]
    return messages[0]["text"]


def flatten(viols: rd.Dataset) -> rd.Dataset:
    """FlattenedRow analog (reportWorker.ts:114-135): + id + constraint_key.

    The reference's id embeds the array index; a positional id is not
    shuffle-stable, so the id here is a content hash (deterministic)."""

    def fn(b: pa.Table) -> pa.Table:
        rows = b.to_pylist()
        ids = [hashlib.blake2b(
            f"{r['severity']}|{r['focus_node']}|{r['path']}|{r['value']}|"
            f"{r['source_constraint_component']}".encode(), digest_size=8).hexdigest()
            for r in rows]
        keys = [f"{r['source_shape']}-{r['source_constraint_component']}" for r in rows]
        return (b.append_column("id", pa.array(ids, pa.string()))
                 .append_column("constraint_key", pa.array(keys, pa.string())))

    return viols.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def grouped_findings(viols: rd.Dataset, max_occurrences: int = 10) -> rd.Dataset:
    """A3: group by (severity, shape, component, message-fingerprint);
    collect occurrences + total; sort severity-rank then total desc (O1)."""

    def add_fp(b: pa.Table) -> pa.Table:
        fps = [fingerprint_messages(m) for m in b["message"].to_pylist()]
        return b.append_column("msg_fp", pa.array(fps, pa.string()))

    keyed = viols.map_batches(add_fp, batch_format="pyarrow", zero_copy_batch=True)

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["focus_node", "path", "value"])
        occ = g[["focus_node", "path", "value"]].head(max_occurrences)
        return pd.DataFrame({
            "severity": [g["severity"].iloc[0]],
            "source_shape": [g["source_shape"].iloc[0]],
            "source_constraint_component": [g["source_constraint_component"].iloc[0]],
            "msg_fp": [g["msg_fp"].iloc[0]],
            "total": [len(g)],
            "occurrences": [occ.to_dict("records")],
            "severity_rank": [SEVERITY_RANK.get(g["severity"].iloc[0], 3)],
        })

    return (keyed.groupby(["severity", "source_shape",
                           "source_constraint_component", "msg_fp"])
            .map_groups(collect, batch_format="pandas")
            .sort(["severity_rank", "total"], descending=[False, True]))


def _severity_pivot(viols: rd.Dataset, key_col: str, k: int | None,
                    drop_empty_key: bool) -> pd.DataFrame:
    """Shared A5/A6/A7 machinery: per-key severity counts + total, top-k."""
    ds = viols
    if drop_empty_key:
        ds = ds.map_batches(lambda b: b.filter(pc.not_equal(b[key_col], "")),
                            batch_format="pyarrow")
    counts = ds.groupby([key_col, "severity"]).aggregate(Count(alias_name="n")) \
               .to_pandas()
    if counts.empty:
        return pd.DataFrame(columns=[key_col, "violation", "warning", "info", "total"])
    pivot = counts.pivot_table(index=key_col, columns="severity", values="n",
                               aggfunc="sum", fill_value=0)
    out = pd.DataFrame({key_col: pivot.index})
    for sev, col in [("Violation", "violation"), ("Warning", "warning"), ("Info", "info")]:
        out[col] = pivot[sev].values if sev in pivot.columns else 0
    out["total"] = out[["violation", "warning", "info"]].sum(axis=1)
    out = out.sort_values(["total", key_col], ascending=[False, True])
    if k:
        out = out.head(k)
    return out.reset_index(drop=True)


def top_shapes(viols: rd.Dataset, k: int = 6) -> pd.DataFrame:
    """A5 (ReportViewer.tsx:140-163): key falls back focus_node when no shape."""
    keyed = viols.map_batches(
        lambda b: b.set_column(
            b.column_names.index("source_shape"), "source_shape",
            pc.if_else(pc.equal(b["source_shape"], ""), b["focus_node"],
                       b["source_shape"])),
        batch_format="pyarrow")
    df = _severity_pivot(keyed, "source_shape", k, drop_empty_key=False)
    df.insert(0, "name", df["source_shape"].map(_suffix))
    return df


def property_breakdown(viols: rd.Dataset, k: int = 8) -> pd.DataFrame:
    """A6 (ReportViewer.tsx:166-190)."""
    df = _severity_pivot(viols, "path", k, drop_empty_key=True)
    df.insert(0, "name", df["path"].map(_suffix))
    return df


_FOCUS_RE = re.compile(
    r"/(dataset|distribution|catalog|dataservice|agent|organization|contactpoint|periodOfTime)",
    re.IGNORECASE)


def focus_node_breakdown(viols: rd.Dataset) -> pd.DataFrame:
    """A7 (ReportViewer.tsx:193-216): regex-classify focus node → counts."""

    def classify(b: pa.Table) -> pa.Table:
        out = []
        for fn_ in b["focus_node"].to_pylist():
            m = _FOCUS_RE.search(fn_ or "")
            out.append(m.group(1).capitalize() if m else "Other")
        return b.append_column("node_class", pa.array(out, pa.string()))

    keyed = viols.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)
    return _severity_pivot(keyed, "node_class", None, drop_empty_key=False)


def constraint_components(viols: rd.Dataset, k: int = 8) -> pd.DataFrame:
    """A8 (ReportViewer.tsx:219-232): suffix-trimmed component counts, top 8."""

    def trim(b: pa.Table) -> pa.Table:
        names = [_suffix(c) for c in b["source_constraint_component"].to_pylist()]
        return pa.table({"name": pa.array(names, pa.string())})

    counts = (viols.map_batches(trim, batch_format="pyarrow")
              .groupby("name").aggregate(Count(alias_name="value"))
              .sort(["value", "name"], descending=[True, False]).limit(k))
    return counts.to_pandas()


def summary_stats(viols: rd.Dataset) -> pd.DataFrame:
    """A9 (ReportViewer.tsx:235-248): totals + exact distinct counts.

    Distinct via shuffle-unique; at 10^12 scale swap in an approximate
    sketch (SURVEY.md A9 note) — same call shape."""
    total = viols.count()
    uniq = {}
    for col, name in [("focus_node", "unique_focus_nodes"),
                      ("source_shape", "unique_shapes"), ("path", "unique_properties")]:
        vals = viols.unique(col)
        uniq[name] = len([v for v in vals if v])
    return pd.DataFrame([{"total_results": total, "conforms": total == 0, **uniq}])


def severity_segment(viols: rd.Dataset, severity: str) -> rd.Dataset:
    """S11 (ReportViewer.tsx:274-294): one-severity report slice."""
    return viols.map_batches(
        lambda b: b.filter(pc.equal(b["severity"], severity)),
        batch_format="pyarrow", zero_copy_batch=True)


# ---- serialization ----

CSV_HEADER = ["severity", "focusNode", "path", "value", "message",
              "sourceConstraintComponent", "sourceShape", "foafPage"]


def report_to_csv(viols: rd.Dataset, preferred_lang: str = "en") -> str:
    """S10 (SHACLValidationService.ts:557-583); driver-side string for the
    small violations result (Arrow handles escaping for file sinks)."""
    import csv
    import io

    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(CSV_HEADER)
    for b in viols.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            w.writerow([r["severity"], r["focus_node"], r["path"], r["value"],
                        select_message_for_locale(r["message"], preferred_lang),
                        r["source_constraint_component"], r["source_shape"],
                        r["foaf_page"]])
    return buf.getvalue()


def _term_ref(value: str) -> str:
    """IRI reference, or a string literal for canonical path expressions
    that are not plain IRIs (alternatives "(a | b)" carry spaces/parens;
    inverse "^p" and closures "p*"/"p+" carry markers illegal in an IRI —
    the parser reads sh:resultPath of either term kind)."""
    if re.search(r'[\s()"<>^|]', value) or value.endswith(("*", "+")):
        return f'"{turtle.escape_literal(value)}"'
    return f"<{value}>"


def report_to_turtle(viols: rd.Dataset, profile_name: str = "dcat_ap_demo",
                     timestamp: str = "1970-01-01T00:00:00Z") -> str:
    """S9: prefixed Turtle report (format of SHACLValidationService.ts:426-555,
    trimmed to the engine-relevant metadata; timestamp injectable for
    deterministic fixtures)."""
    rows = [r for b in viols.iter_batches(batch_format="pyarrow") for r in b.to_pylist()]
    rows.sort(key=lambda r: (SEVERITY_RANK.get(r["severity"], 3), r["focus_node"],
                             r["path"], r["value"], r["source_constraint_component"]))
    conforms = "true" if not rows else "false"
    out = [
        "@prefix sh: <http://www.w3.org/ns/shacl#> .",
        "@prefix dct: <http://purl.org/dc/terms/> .",
        "@prefix foaf: <http://xmlns.com/foaf/0.1/> .",
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .",
        "",
        "# Validation Report",
        "[ a sh:ValidationReport ;",
        f"    sh:conforms {conforms} ;",
        f'    dct:created "{timestamp}"^^xsd:dateTime ;',
        f'    dct:title "SHACL Validation Report for profile {profile_name}"@en',
    ]
    if rows:
        out[-1] += " ;"
        out.append("    sh:result")
        for i, r in enumerate(rows):
            block = ["      [ a sh:ValidationResult ;",
                     f"        sh:resultSeverity sh:{r['severity']} ;"]
            if r["focus_node"]:
                block.append(f"        sh:focusNode <{r['focus_node']}> ;")
            if r["path"]:
                block.append(f"        sh:resultPath {_term_ref(r['path'])} ;")
            if r["value"]:
                block.append(f'        sh:value "{turtle.escape_literal(r["value"])}" ;')
            for m in r["message"] or []:
                lit = f'"{turtle.escape_literal(m["text"])}"'
                if m["lang"]:
                    lit += f"@{m['lang']}"
                block.append(f"        sh:resultMessage {lit} ;")
            if r["source_constraint_component"]:
                block.append(
                    f"        sh:sourceConstraintComponent <{r['source_constraint_component']}> ;")
            if r["source_shape"]:
                block.append(f"        sh:sourceShape {_term_ref(r['source_shape'])} ;")
            if r["foaf_page"]:
                block.append(f"        foaf:page <{r['foaf_page']}> ;")
            block[-1] = block[-1].rstrip(" ;")
            block.append("      ] ," if i < len(rows) - 1 else "      ]")
            out.extend(block)
    out.append("] .")
    return "\n".join(out) + "\n"


def parse_report_turtle(ttl: str) -> pa.Table:
    """S8 (reportWorker.ts:38-112): report TTL → violations table.

    foaf:page is looked up on the result's sourceShape node within the
    report graph (the J4 join), matching the worker's behavior."""
    triples = turtle.parse_turtle(ttl, bnode_prefix="rpt")
    spo: dict[str, dict[str, list[tuple[str, str, str, str]]]] = {}
    for s, p, k, v, dt, lang in triples:
        spo.setdefault(s, {}).setdefault(p, []).append((k, v, dt, lang))

    report_node = next((s for s, preds in spo.items()
                        if any(v == ns.SH + "ValidationReport"
                               for _, v, _, _ in preds.get(ns.RDF_TYPE, []))), None)
    if report_node is None:
        raise ValueError("No sh:ValidationReport found in the input.")

    def first(subj, pred, default=""):
        vals = spo.get(subj, {}).get(pred)
        return vals[0][1] if vals else default

    rows = []
    for _, res, _, _ in spo[report_node].get(ns.SH + "result", []):
        sev_iri = first(res, ns.SH + "resultSeverity")
        severity = "Violation"
        if sev_iri.endswith("Warning"):
            severity = "Warning"
        elif sev_iri.endswith("Info"):
            severity = "Info"
        shape = first(res, ns.SH + "sourceShape")
        msgs = [{"text": v, "lang": normalize_lang(lang)}
                for _, v, _, lang in spo.get(res, {}).get(ns.SH + "resultMessage", [])
                if v]
        rows.append({
            "severity": severity,
            "focus_node": first(res, ns.SH + "focusNode"),
            "path": first(res, ns.SH + "resultPath"),
            "value": first(res, ns.SH + "value"),
            "message": msgs,
            "source_constraint_component": first(res, ns.SH + "sourceConstraintComponent"),
            "source_shape": shape,
            "foaf_page": first(res, ns.FOAF + "page") or first(shape, ns.FOAF + "page"),
        })
    return pa.Table.from_pylist(rows, schema=S.VIOLATIONS)


def parse_reports(report_docs: rd.Dataset, ttl_col: str = "ttl") -> rd.Dataset:
    """Distributed S8: a table of report documents → one violations Dataset."""

    def fn(b: pa.Table) -> pa.Table:
        tables = [parse_report_turtle(t) for t in b[ttl_col].to_pylist()]
        return pa.concat_tables(tables) if tables else S.VIOLATIONS.empty_table()

    return report_docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
