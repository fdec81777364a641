"""DCAT dataset discovery (SURVEY.md §3.3; reference entry point 3).

Re-expresses DataDiscoveryService.extractDatasetsFromRDF
(/root/reference/src/services/DataDiscoveryService.ts:77-264) as a
distributed pipeline over the triples Dataset:

  filter type-triples (M13) → per-subject pivot (M14/M15, groupby) →
  distribution join (J1, union+groupby hash join) → blank-node format
  deref (J2, broadcast of the tiny format-node table) → vectorized
  format classification (M17) → compatibility filter → query filter +
  limit (O3).

The J1 join is the union-tag + groupby formulation (one shuffle keyed
by the join key) — the portable partitioned hash join from the Ray
guide; no side is ever collected on the driver.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions import ns

DCAT_DATASET = ns.DCAT + "Dataset"

_DS_PROPS = {
    ns.DCT + "title": "title",
    ns.FOAF + "name": "foaf_name",
    ns.DCT + "description": "description",
    ns.DCT + "issued": "issued",
    ns.DCT + "modified": "modified",
    ns.DCT + "publisher": "publisher",
    ns.DCAT + "theme": "themes",          # multi
    ns.DCAT + "keyword": "keywords",      # multi
    ns.DCAT + "distribution": "dists",    # multi (join key out)
}

_DIST_PROPS = {
    ns.DCAT + "accessURL": "access_url",
    ns.DCAT + "downloadURL": "download_url",
    ns.DCT + "format": "format_raw",
    ns.DCAT + "mediaType": "media_type",
    ns.DCT + "title": "title",
}


def classify_format(s: str) -> str:
    """M17 format-string / label classifier
    (DataDiscoveryService.ts:330-389): authority URIs (EU Publications
    Office, W3C, IANA — classified only by their csv/json designator),
    IANA media types (text/csv, application/csv, application/json,
    text/json), fragment identifiers (#csv), ``…/CSV`` URI tails, plain
    labels and their variants ("comma-separated", "delimiter-separated",
    "javascript object notation") including the Spanish labels the
    reference special-cases."""
    if not s:
        return "unknown"
    low = s.lower()
    # authority URIs decide purely on the designator (ts:334-343)
    if "europa.eu" in low or "w3.org" in low or "iana.org" in low:
        if "csv" in low or "comma-separated" in low:
            return "csv"
        if "json" in low:
            return "json"
        return "unknown"
    # media types / fragments / URI tails / labels — every reference
    # branch (ts:346-356, 365-389) reduces to these substring families
    if ("csv" in low or "comma-separated" in low
            or "comma separated values" in low
            or "delimiter-separated" in low
            or "valores separados por comas" in low):
        return "csv"
    if ("json" in low or "javascript object notation" in low
            or "notación de objetos javascript" in low):
        return "json"
    return "unknown"


def classify_format_from_url(url: str) -> str:
    """URL-pattern classifier (DataDiscoveryService.ts:443-475): file
    extensions, ``format=``/``fmt=`` query parameters, ``/csv/`` and
    ``-csv-`` path markers, CKAN datastore-dump, ``/api/`` and export
    endpoints. Deliberately stricter than :func:`classify_format` — a
    URL mentioning "csv" in its host must NOT classify."""
    if not url:
        return "unknown"
    low = url.lower()
    for fmt in ("csv", "json"):
        if (low.endswith(f".{fmt}")
                or f"format={fmt}" in low or f"fmt={fmt}" in low
                or f"/{fmt}/" in low or f"-{fmt}-" in low
                or ("/api/" in low and fmt in low)
                or ("export" in low and fmt in low)):
            return fmt
    return "unknown"


def format_node_labels(triples: rd.Dataset) -> dict[str, str]:
    """J2: blank-node / IRI format objects (dct:IMT nodes) → rdf:value /
    rdfs:label. The format-node table is tiny → broadcast lookup
    (DataDiscoveryService.ts:269-325)."""
    preds = [ns.RDF + "value", ns.RDFS + "label"]
    rows = triples.map_batches(
        lambda b: b.filter(pc.is_in(b["pred"], value_set=pa.array(preds)))
                   .select(["subj", "pred", "obj_value"]),
        batch_format="pyarrow", zero_copy_batch=True)
    out: dict[str, str] = {}
    for b in rows.iter_batches(batch_format="pyarrow"):
        for s, p, v in zip(b["subj"].to_pylist(), b["pred"].to_pylist(),
                           b["obj_value"].to_pylist()):
            # rdf:value preferred over rdfs:label
            if s not in out or p == ns.RDF + "value":
                out[s] = v
    return out


def bucketed_groupby_apply(ds: rd.Dataset, key: str, fn_group,
                           n_buckets: int | None = None):
    """groupby(key).map_groups with one Ray group per HASH BUCKET instead of
    one per key: Ray's per-group task overhead is paid once per bucket,
    not once per subject; the per-key work runs in a pandas groupby inside
    the bucket. Same partitioning guarantee (hash of key → same bucket);
    bucket count scales with the cluster (vectorized bucket hash)."""
    from ..sources import io as io_mod

    if n_buckets is None:
        n_buckets = io_mod.shuffle_buckets()
    nb = n_buckets

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column("_bucket", io_mod.hash_bucket_column(b[key], nb))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        parts = [fn_group(sub) for _, sub in g.groupby(key, sort=True)]
        out = pd.concat(parts, ignore_index=True) if parts else fn_group(g.iloc[0:0])
        return out.drop(columns=["_bucket"], errors="ignore")

    return (ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_bucket").map_groups(per_bucket, batch_format="pandas"))


def bucketed_block_apply(ds: rd.Dataset, key: str, fn_bucket,
                         n_buckets: int | None = None):
    """Like :func:`bucketed_groupby_apply` but hands the WHOLE bucket to
    ``fn_bucket`` — for fns that vectorize across keys with pandas
    groupby/merge instead of running per key."""
    from ..sources import io as io_mod

    if n_buckets is None:
        n_buckets = io_mod.shuffle_buckets()
    nb = n_buckets

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column("_bucket", io_mod.hash_bucket_column(b[key], nb))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return fn_bucket(g.drop(columns=["_bucket"]))

    return (ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_bucket").map_groups(per_bucket, batch_format="pandas"))


def _pivot_records(g: pd.DataFrame, props: dict[str, str]) -> dict:
    rec: dict = {"id": g["subj"].iloc[0]}
    multi = {"themes", "keywords", "dists"}
    for pred, name in props.items():
        vals = sorted(g.loc[g["pred"] == pred, "obj_value"])
        if name in multi:
            rec[name] = vals
        else:
            rec[name] = vals[0] if vals else ""  # first-match projection (M14)
    return rec


# Hard ceiling for the driver-side page in discover_datasets: the
# reference caps the search at 50 records (ts:30); anything past this is
# a corpus-scale scan that must stay a Dataset (discover_datasets_ds).
PAGE_LIMIT_MAX = 10_000


def discover_datasets_ds(triples: rd.Dataset, query: str = "",
                         require_compatible: bool = True) -> rd.Dataset:
    """triples → nested CatalogDataset records (types/dataQuality.ts:1-27).

    Streaming variant: returns the full assembled record set as a
    Dataset of ``(id, rec_json)`` rows — no driver materialization, for
    corpus-scale consumers. :func:`discover_datasets` is the
    reference-shaped paged API on top of it."""
    # pinned once: five downstream passes read it (format deref, dataset
    # pivot, dist pivot, edge explode, final assembly) — without this the
    # upstream lineage (e.g. extraction) re-executes per pass
    triples = triples.materialize()
    fmt_ref = ray.put(format_node_labels(triples))

    # dataset side: subjects typed dcat:Dataset + their property rows
    ds_preds = pa.array(sorted(_DS_PROPS))
    ds_rows = triples.map_batches(
        lambda b: b.filter(pc.or_(
            pc.and_(pc.equal(b["pred"], ns.RDF_TYPE),
                    pc.equal(b["obj_value"], DCAT_DATASET)),
            pc.is_in(b["pred"], value_set=ds_preds)))
        .select(["subj", "pred", "obj_value"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def ds_pivot(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized per-bucket pivot: one pandas groupby per property."""
        typed = sorted(set(g.loc[(g["pred"] == ns.RDF_TYPE)
                                 & (g["obj_value"] == DCAT_DATASET), "subj"]))
        out = pd.DataFrame(index=pd.Index(typed, name="subj"))
        g = g[g["subj"].isin(out.index)].sort_values("obj_value")
        multi = {"themes", "keywords", "dists"}
        for pred, name in _DS_PROPS.items():
            sub = g[g["pred"] == pred]
            if name in multi:
                col = sub.groupby("subj")["obj_value"].agg(list)
                out[name] = out.index.map(col)
                out[name] = out[name].apply(lambda v: v if isinstance(v, list) else [])
            else:
                out[name] = out.index.map(sub.groupby("subj")["obj_value"].min())
        out = out.fillna("")
        # M14 fallback chain (ts:144-147)
        out["title"] = out["title"].where(out["title"] != "", out["foaf_name"])
        out["title"] = out["title"].where(out["title"] != "", "Unnamed Dataset")
        out = out.drop(columns=["foaf_name"]).reset_index().rename(
            columns={"subj": "id"})
        return out

    datasets = bucketed_block_apply(ds_rows, "subj", ds_pivot).materialize()

    # distribution side: property rows of any distribution object
    dist_preds = pa.array(sorted(_DIST_PROPS))
    dist_rows = triples.map_batches(
        lambda b: b.filter(pc.is_in(b["pred"], value_set=dist_preds))
        .select(["subj", "pred", "obj_value"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def dist_pivot(g: pd.DataFrame) -> pd.DataFrame:
        labels = ray.get(fmt_ref)
        subjects = sorted(set(g["subj"]))
        out = pd.DataFrame(index=pd.Index(subjects, name="subj"))
        g = g.sort_values("obj_value")
        for pred, name in _DIST_PROPS.items():
            out[name] = out.index.map(
                g[g["pred"] == pred].groupby("subj")["obj_value"].min())
        out = out.fillna("")
        resolved = out["format_raw"].map(lambda x: labels.get(x, x))  # J2 deref
        fmt = resolved.map(classify_format)
        fmt = fmt.where(fmt != "unknown", out["media_type"].map(classify_format))
        url = out["access_url"].where(out["access_url"] != "", out["download_url"])
        fmt = fmt.where(fmt != "unknown", url.map(classify_format_from_url))
        out["format"] = fmt
        out["compatible"] = fmt != "unknown"
        return (out.drop(columns=["format_raw"]).reset_index()
                .rename(columns={"subj": "id"}))

    dists = bucketed_block_apply(dist_rows, "subj", dist_pivot)

    # J1 hash join datasets ⋈ distributions on the edge key, via union+groupby:
    # explode dataset rows to (dist_id, payload) and union with dist records.
    def explode_edges(b: pa.Table) -> pa.Table:
        keys, ds_ids = [], []
        for rec_id, dlist in zip(b["id"].to_pylist(), b["dists"].to_pylist()):
            for d in dlist or []:
                keys.append(d); ds_ids.append(rec_id)
        return pa.table({"key": pa.array(keys, pa.string()),
                         "ds_id": pa.array(ds_ids, pa.string()),
                         "rec": pa.array([""] * len(keys), pa.string())})

    import json as _json

    edges = datasets.map_batches(explode_edges, batch_format="pyarrow")
    dist_tagged = dists.map_batches(
        lambda b: pa.table({
            "key": b["id"],
            "ds_id": pa.array([""] * b.num_rows, pa.string()),
            "rec": pa.array([_json.dumps(r, sort_keys=True) for r in b.to_pylist()],
                            pa.string())}),
        batch_format="pyarrow")

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized merge per bucket (the J1 hash-join reduce side)
        recs = g.loc[g["rec"] != "", ["key", "rec"]].drop_duplicates("key")
        owners = g.loc[g["ds_id"] != "", ["key", "ds_id"]]
        m = owners.merge(recs, on="key", how="left")
        m["rec"] = m["rec"].fillna("")
        return m[["ds_id", "rec"]]

    joined = bucketed_block_apply(edges.union(dist_tagged), "key", join_bucket)

    # assemble nested records per dataset DISTRIBUTED: one more bucketed
    # shuffle keyed by ds_id merges each dataset's record with its
    # distribution records; filters (compatibility, query) run inside the
    # buckets; sort+limit run in Ray — the driver only materializes the
    # ≤ limit final rows (the reference caps at 50, ts:30).
    ds_tagged = datasets.map_batches(
        lambda b: pa.table({
            "ds_id": b["id"],
            "kind": pa.array(["ds"] * b.num_rows, pa.string()),
            "rec": pa.array([_json.dumps(r, sort_keys=True) for r in b.to_pylist()],
                            pa.string())}),
        batch_format="pyarrow")
    dist_assign = joined.map_batches(
        lambda b: pa.table({
            "ds_id": b["ds_id"],
            "kind": pa.array(["dist"] * b.num_rows, pa.string()),
            "rec": b["rec"]}),
        batch_format="pyarrow")

    q = (query or "").lower()

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for ds_id, sub in g.groupby("ds_id", sort=False):
            ds_rows = sub.loc[sub["kind"] == "ds", "rec"]
            if ds_rows.empty:
                continue
            rec = _json.loads(ds_rows.iloc[0])
            dl = [_json.loads(r) for r in sub.loc[sub["kind"] == "dist", "rec"]
                  if r]
            dl = [r for r in dl if r.get("compatible") or not require_compatible]
            dl.sort(key=lambda r: r["id"])
            if require_compatible and not dl:
                continue  # no compatible distributions → dropped (ts:172-174)
            rec.pop("dists", None)
            rec["distributions"] = dl
            if q and q not in (rec["title"] + " " +
                               (rec["description"] or "")).lower():
                continue
            recs.append({"id": rec["id"],
                         "rec": _json.dumps(rec, sort_keys=True)})
        return pd.DataFrame(recs, columns=["id", "rec"])

    return bucketed_block_apply(ds_tagged.union(dist_assign), "ds_id",
                                assemble)


def discover_datasets(triples: rd.Dataset, query: str = "", limit: int = 50,
                      require_compatible: bool = True) -> pd.DataFrame:
    """Paged discovery (the reference API shape, capped at 50 there —
    ts:30): sort+limit run in Ray; the driver materializes only the
    ≤ ``limit`` final rows. ``limit`` is bounded by
    :data:`PAGE_LIMIT_MAX` — an unbounded page would be a driver-side
    corpus materialization; use :func:`discover_datasets_ds` for that."""
    import json as _json

    if limit > PAGE_LIMIT_MAX:
        raise ValueError(
            f"discover_datasets limit={limit} exceeds PAGE_LIMIT_MAX="
            f"{PAGE_LIMIT_MAX}; use discover_datasets_ds() for a "
            f"streaming Dataset of all records")
    assembled = discover_datasets_ds(triples, query=query,
                                     require_compatible=require_compatible)
    final = assembled.sort("id").limit(limit).to_pandas()
    if final.empty or "rec" not in final.columns:
        return pd.DataFrame([])  # no datasets survived the filters
    return pd.DataFrame([_json.loads(r) for r in final["rec"]])
