"""Deterministic synthetic interleaved text+media corpus with embedded ground truth.

Produces the exact ``input_hint`` shape (FIXTURES.md F1):
``doc_id: string, spans: list<struct<kind, text, media_ref, offset:int32>>``
plus a sibling ``gt_triples`` table holding the triples a perfect
extraction + linking + canonicalization pipeline should emit (canonical
IRIs). Every random draw is seeded per-document (``seed`` ⊕ doc index),
so generation is order-independent and distributable: any subset of doc
indices generates byte-identical rows.

The planted facts mirror the reference's DCAT world
(/root/reference/src/services/DataDiscoveryService.ts:128-264): datasets
with titles / descriptions / publishers / themes / issued dates and
linked distributions with formats — so the SHACL fixtures (F3) exercise
sh:minCount / sh:datatype / sh:class / sh:pattern against them.
"""

from __future__ import annotations

import os
import random
import re

import pyarrow as pa
import pyarrow.parquet as pq

from .functions import ns
from . import schema as S

SEED = 42
N_ORGS = 50
N_THEMES = 8
HUB_ORG = 0            # hub publisher: draws ~30% of all publisher edges (skew fixture)
CACHE_ROOT = "/tmp/svr_corpus_v6"  # bump suffix when corpus semantics change

# violation seeding probabilities (deterministic per doc)
P_MISSING_TITLE = 0.10   # sh:minCount violation
P_BAD_ISSUED = 0.10      # sh:datatype violation
P_UNTYPED_DIST = 0.15    # sh:class violation
P_BLANK_DESC = 0.08      # sh:pattern violation
P_ALIAS = 0.20           # publisher written as exact alias  → alias-dict linking
P_FUZZY = 0.10           # publisher written fuzzily         → MinHash-LSH linking

_DISTRACTORS = [
    "The weather that week made fieldwork difficult.",
    "Several reviewers noted the archive was well organized.",
    "Funding for the portal was renewed in the spring.",
    "A maintenance window was announced for the weekend.",
    "Community feedback remained broadly positive.",
]

ISO_DT = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$")


def _rand_dt(rng: random.Random) -> str:
    """Fixed-width ISO dateTime: lexicographic order == chronological."""
    return (f"20{10 + rng.randrange(15):02d}-{1 + rng.randrange(12):02d}-"
            f"{1 + rng.randrange(28):02d}T{rng.randrange(24):02d}:00:00Z")


def org_name(k: int) -> str:
    return f"Organization {k}"


def org_alias(k: int) -> str:
    return f"Org-{k}"


def org_iri(k: int) -> str:
    return f"{ns.EX}org/{k}"


def dataset_iri(d: str) -> str:
    return f"{ns.EX}dataset/{d}"


def dist_iri(d: str) -> str:
    return f"{ns.EX}distribution/{d}"


def theme_iri(t: int) -> str:
    return f"{ns.EX}theme/T{t}"


def fuzzy_org(rng: random.Random, k: int) -> str:
    """A misspelled surface form of the org name: drop one inner char of the
    word (never a digit, so it can't collide with another canonical name)."""
    word = "Organization"
    i = rng.randrange(1, len(word) - 1)
    return word[:i] + word[i + 1 :] + f" {k}"


def _pick_org(rng: random.Random) -> int:
    if rng.random() < 0.30:
        return HUB_ORG
    return 1 + rng.randrange(N_ORGS - 1)


def gen_doc(i: int, seed: int = SEED) -> tuple[dict, list[dict], dict]:
    """Generate one document: (doc row, gt triples, violation flags)."""
    rng = random.Random((seed << 32) | i)
    doc_id = f"doc-{i:08d}"
    did = f"D{i}"
    ds = dataset_iri(did)
    ds_name = f"Dataset {did}"

    flags = {"missing_title": rng.random() < P_MISSING_TITLE,
             "bad_issued": rng.random() < P_BAD_ISSUED,
             "blank_desc": rng.random() < P_BLANK_DESC}

    gt: list[dict] = []

    def t(subj, pred, kind, value, dt="", lang="", surface=""):
        # `surface` records the exact surface form written into the text
        # for entity-valued objects (publishers) — it lets the extraction
        # oracle reproduce the provisional mention IRIs without reversing
        # the linker (kg_extract oracle).
        gt.append({"subj": subj, "pred": pred, "obj_kind": kind, "obj_value": value,
                   "obj_datatype": dt, "obj_lang": lang, "doc_id": doc_id,
                   "surface": surface})

    sentences: list[str] = []
    sentences.append(f"The dataset {ds_name} is a dataset resource.")
    t(ds, ns.RDF_TYPE, "iri", ns.DCAT + "Dataset")

    # hub SUBJECT (FIXTURES.md F2): one global catalog node references every
    # dataset → it owns ~10% of all triples and must be salted at materialize
    sentences.append(f"The main catalog lists {ds_name}.")
    t(f"{ns.EX}catalog/main", ns.DCAT + "dataset", "iri", ds)

    if not flags["missing_title"]:
        title = f"Open data collection {did}"
        sentences.append(f'The dataset {ds_name} has title "{title}".')
        t(ds, ns.DCT + "title", "literal", title)

    if rng.random() < 0.9:
        desc = "   " if flags["blank_desc"] else f"Measurements and records for {did}."
        sentences.append(f'The dataset {ds_name} is described as "{desc}".')
        t(ds, ns.DCT + "description", "literal", desc)

    # publisher — canonical / alias / fuzzy surface forms
    k = _pick_org(rng)
    r = rng.random()
    if r < P_FUZZY:
        surface = fuzzy_org(rng, k)
    elif r < P_FUZZY + P_ALIAS:
        surface = org_alias(k)
    else:
        surface = org_name(k)
    sentences.append(f"The dataset {ds_name} was published by {surface}.")
    t(ds, ns.DCT + "publisher", "iri", org_iri(k), surface=surface)

    if rng.random() < 0.9:
        if flags["bad_issued"]:
            issued = "sometime in spring"
            modified = _rand_dt(rng)
            t(ds, ns.DCT + "issued", "literal", issued)
        else:
            d1, d2 = _rand_dt(rng), _rand_dt(rng)
            issued, modified = min(d1, d2), max(d1, d2)
            if rng.random() < 0.15:
                # timeline violation: modified strictly before issued
                # (sh:lessThan / sh:lessThanOrEquals pairs fixture)
                issued, modified = modified, issued
            t(ds, ns.DCT + "issued", "literal", issued, dt=ns.XSD + "dateTime")
        sentences.append(f"The dataset {ds_name} was issued on {issued}.")
        if rng.random() < 0.85:
            t(ds, ns.DCT + "modified", "literal", modified,
              dt=ns.XSD + "dateTime")
            sentences.append(
                f"The dataset {ds_name} was last modified on {modified}.")

    for m in range(rng.randrange(3)):
        th = rng.randrange(N_THEMES)
        sentences.append(f"The dataset {ds_name} covers theme Theme T{th}.")
        t(ds, ns.DCAT + "theme", "iri", theme_iri(th))

    n_dist = rng.randrange(3)
    untyped: list[bool] = []
    for j in range(n_dist):
        zid = f"{did}x{j}"
        z = dist_iri(zid)
        z_name = f"Distribution {zid}"
        sentences.append(f"The dataset {ds_name} offers distribution {z_name}.")
        t(ds, ns.DCAT + "distribution", "iri", z)
        fmt = rng.choice(["text/csv", "application/json", "text/turtle", "application/pdf"])
        sentences.append(f'The distribution {z_name} is available as "{fmt}".')
        t(z, ns.DCT + "format", "literal", fmt)
        # numeric pair fixtures (sh:lessThanOrEquals / equals / disjoint):
        # actual size, allowed quota (sometimes exceeded / exactly met),
        # and an audit recheck (sometimes diverging)
        size = rng.randrange(2_000, 5_000_000)
        t(z, ns.DCAT + "byteSize", "literal", str(size))
        sentences.append(f"The distribution {z_name} occupies {size} bytes.")
        if rng.random() < 0.7:
            r2 = rng.random()
            if r2 < 0.12:
                quota = rng.randrange(1_000, size)      # quota exceeded
            elif r2 < 0.20:
                quota = size                            # exactly met
            else:
                quota = size + rng.randrange(1, 1_000_000)
            t(z, ns.EX + "quotaBytes", "literal", str(quota))
            sentences.append(
                f"The distribution {z_name} is allowed {quota} bytes.")
        if rng.random() < 0.8:
            recheck = size if rng.random() < 0.85 \
                else size + rng.randrange(1, 500)
            t(z, ns.EX + "sizeRecheck", "literal", str(recheck))
            sentences.append(
                f"A recheck recorded {recheck} bytes for distribution {z_name}.")
        is_untyped = rng.random() < P_UNTYPED_DIST
        untyped.append(is_untyped)
        if not is_untyped:
            sentences.append(f"The distribution {z_name} is a distribution resource.")
            t(z, ns.RDF_TYPE, "iri", ns.DCAT + "Distribution")
    flags["untyped_dists"] = untyped

    for _ in range(rng.randrange(3)):
        sentences.append(rng.choice(_DISTRACTORS))
    rng.shuffle(sentences)

    # interleave text spans with media spans
    spans: list[dict] = []
    offset = 0
    si = 0
    sent_i = 0
    per_span = max(1, len(sentences) // (1 + rng.randrange(4)))
    while sent_i < len(sentences):
        if spans and rng.random() < 0.25:
            kind = rng.choice(["image", "table", "code"])
            ref = f"media://{doc_id}/{si}"
            spans.append({"kind": kind, "text": "", "media_ref": ref, "offset": offset})
            t(f"{ns.EX}document/{doc_id}", ns.SCHEMA + "associatedMedia", "iri", ref)
            offset += 1
            si += 1
        chunk = sentences[sent_i : sent_i + per_span]
        sent_i += per_span
        text = " ".join(chunk)
        spans.append({"kind": "text", "text": text, "media_ref": "", "offset": offset})
        offset += len(text) + 1
        si += 1

    return {"doc_id": doc_id, "spans": spans}, gt, flags


def media_payload(ref: str):
    """Deterministic media payload for a media_ref: a valid binary P6
    PPM + frame count + the raw pixel array. The CORPUS GENERATOR owns
    payload content (a real system would fetch these bytes from a blob
    store); the engine's synthetic fetch stage returns exactly these
    bytes (multimodal.MediaDecoder._synth_fetch delegates here), so the
    gt_media stats written at synth time are the decode oracle."""
    import hashlib
    import numpy as np

    h = hashlib.blake2b(ref.encode(), digest_size=16).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "little"))
    w, h_ = 16 + h[4] % 64, 16 + h[5] % 64
    pixels = rng.randint(0, 256, size=(h_, w, 3), dtype=np.uint8)
    payload = b"P6\n%d %d\n255\n" % (w, h_) + pixels.tobytes()
    return payload, 1 + h[6] % 8, pixels


MEDIA_GT_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.string()), pa.field("span_idx", pa.int32()),
     pa.field("kind", pa.string()), pa.field("media_ref", pa.string()),
     pa.field("width", pa.int32()), pa.field("height", pa.int32()),
     pa.field("n_frames", pa.int32()),
     pa.field("sum_r", pa.int64()), pa.field("sum_g", pa.int64()),
     pa.field("sum_b", pa.int64())]
    # expected feature-extractor outputs (byte-histogram × fixed random
    # projection, computed here independently of the engine's
    # actor-pool stage) — one column per dimension so the DuckDB oracle
    # hashes exactly
    + [pa.field(f"f{i}", pa.float64()) for i in range(16)])


def _feature_projection(dim: int = 16, seed: int = 42):
    import numpy as np

    return np.random.RandomState(seed).normal(
        size=(256, dim)).astype(np.float32)


def expected_media_feature(payload: bytes):
    """Independent re-computation of the engine's stub feature
    (multimodal.FeatureExtractor): normalized byte histogram of the FULL
    payload (header included) through the seed-42 Gaussian projection."""
    import numpy as np

    hist = np.bincount(np.frombuffer(payload, dtype=np.uint8),
                       minlength=256).astype(np.float32)
    return (hist / max(1.0, hist.sum())) @ _feature_projection()


def make_corpus_tables(num_docs: int, seed: int = SEED,
                       start: int = 0) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Build (documents, gt_triples, gt_media) Arrow tables for docs
    [start, start+num_docs). gt_media plants the expected decode results
    (dimensions + integer per-channel pixel sums) for every media span —
    the engine recomputes them through PPM encode → real parse."""
    docs, gts, medias = [], [], []
    for i in range(start, start + num_docs):
        d, g, _ = gen_doc(i, seed)
        docs.append(d)
        gts.extend(g)
        for si, s in enumerate(d["spans"]):
            if s["kind"] == "text":
                continue
            payload, n_frames, px = media_payload(s["media_ref"])
            sums = px.reshape(-1, 3).sum(axis=0, dtype="int64")
            feat = expected_media_feature(payload)
            medias.append({
                "doc_id": d["doc_id"], "span_idx": si, "kind": s["kind"],
                "media_ref": s["media_ref"],
                "width": px.shape[1], "height": px.shape[0],
                "n_frames": n_frames, "sum_r": int(sums[0]),
                "sum_g": int(sums[1]), "sum_b": int(sums[2]),
                **{f"f{i}": float(feat[i]) for i in range(16)}})
    doc_tbl = pa.Table.from_pylist(docs, schema=S.DOCUMENTS)
    gt_schema = pa.schema([
        pa.field("subj", pa.string()), pa.field("pred", pa.string()),
        pa.field("obj_kind", pa.string()), pa.field("obj_value", pa.string()),
        pa.field("obj_datatype", pa.string()), pa.field("obj_lang", pa.string()),
        pa.field("doc_id", pa.string()), pa.field("surface", pa.string()),
    ])
    gt_tbl = pa.Table.from_pylist(gts, schema=gt_schema)
    media_tbl = pa.Table.from_pylist(medias, schema=MEDIA_GT_SCHEMA)
    return doc_tbl, gt_tbl, media_tbl


def num_docs_for_sf(sf: float) -> int:
    """Corpus size per scale factor. Correctness scales (sf ≤ 0.01) stay
    small so the DuckDB oracle comparisons are fast; the bench scale
    (sf ≥ 0.1) is sized so per-doc compute dominates fixed pipeline
    overheads (the scaling-efficiency measurement needs a compute-bound
    run)."""
    if sf >= 0.1:
        return int(600_000 * sf)
    return max(50, int(200_000 * sf))


def sf_of_dir(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.001


def ensure_corpus(sf_dir_or_sf, seed: int = SEED, shard_rows: int = 4096) -> str:
    sf = sf_of_dir(sf_dir_or_sf) if isinstance(sf_dir_or_sf, str) else float(sf_dir_or_sf)
    return ensure_corpus_n(num_docs_for_sf(sf), seed=seed, shard_rows=shard_rows,
                           tag=f"sf{sf}")


def ensure_corpus_n(n: int, seed: int = SEED, shard_rows: int = 4096,
                    tag: str | None = None) -> str:
    """Write the corpus parquet for n docs once under /tmp; return its dir.

    Sharded into multiple files so Ray Data reads it as multiple blocks
    (parallel from the first stage).
    """
    out = os.path.join(CACHE_ROOT, f"{tag or 'n'}_seed{seed}_n{n}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(os.path.join(out, "documents"), exist_ok=True)
    os.makedirs(os.path.join(out, "gt_triples"), exist_ok=True)
    os.makedirs(os.path.join(out, "gt_media"), exist_ok=True)
    shards = [(i, start, min(shard_rows, n - start))
              for i, start in enumerate(range(0, n, shard_rows))]
    if len(shards) > 8:  # generation is per-doc seeded → shard-parallel
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=min(16, os.cpu_count() or 4)) as ex:
            list(ex.map(_write_shard, [(out, seed, s) for s in shards],
                        chunksize=4))
    else:
        for s in shards:
            _write_shard((out, seed, s))
    with open(done, "w") as f:
        f.write(str(n))
    return out


def _write_shard(arg) -> None:
    out, seed, (shard, start, cnt) = arg
    doc_tbl, gt_tbl, media_tbl = make_corpus_tables(cnt, seed, start=start)
    pq.write_table(doc_tbl, os.path.join(out, "documents", f"part-{shard:05d}.parquet"))
    pq.write_table(gt_tbl, os.path.join(out, "gt_triples", f"part-{shard:05d}.parquet"))
    pq.write_table(media_tbl, os.path.join(out, "gt_media", f"part-{shard:05d}.parquet"))


def alias_table() -> pa.Table:
    """The closed alias dictionary: surface form → canonical IRI.

    Broadcast (``ray.put``) to linker actors — never shuffled
    (SURVEY.md §2.3 T5).
    """
    rows = []
    for k in range(N_ORGS):
        rows.append({"surface": org_name(k), "iri": org_iri(k)})
        rows.append({"surface": org_alias(k), "iri": org_iri(k)})
    return pa.Table.from_pylist(rows)
