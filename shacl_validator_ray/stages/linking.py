"""Entity linking: alias-dictionary + MinHash-LSH candidate index (T5, J6).

Provisional mention IRIs (``ex:mention/<urlencoded surface>``) produced
by extraction are scored against canonical entity IRIs:

1. exact alias-dictionary hit → score 1.0;
2. else MinHash-LSH over character 3-gram shingles of the surface form
   proposes candidates; candidates are scored with exact shingle
   Jaccard and kept above a threshold;
3. no candidate above threshold → NIL (no output row; the mention IRI
   survives canonicalization unchanged — the J6 anti-join path).

The index (alias dict + LSH buckets) is built ONCE from the broadcast
alias table and held by each linker actor (``__init__``), mirroring the
reference's static shapes cache pattern
(/root/reference/src/services/SHACLValidationService.ts:35,114-138).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions import textfns as tf
from ..stages import extract
from .. import schema as S


def char_shingles(s: str, n: int = 3) -> set[str]:
    s = f"^{s.lower()}$"
    if len(s) < n:
        return {s}
    return {s[i : i + n] for i in range(len(s) - n + 1)}


class LinkIndex:
    """Alias dict + MinHash-LSH over canonical surface forms (driver-built,
    broadcast once via ``ray.put``; actors only read)."""

    def __init__(self, alias_rows: list[tuple[str, str]], n_perm: int = 32,
                 n_bands: int = 16):
        self.alias = {surface: iri for surface, iri in alias_rows}
        self.mh = tf.MinHasher(n_perm=n_perm)
        self.n_bands = n_bands
        self.buckets: dict[tuple[int, int], list[int]] = {}
        self.entries: list[tuple[str, str, set[str]]] = []  # (surface, iri, shingles)
        for surface, iri in alias_rows:
            sh = char_shingles(surface)
            ei = len(self.entries)
            self.entries.append((surface, iri, sh))
            sig = self.mh.signature(sh)
            for bi, h in enumerate(self.mh.bands(sig, n_bands)):
                self.buckets.setdefault((bi, h), []).append(ei)

    def candidates(self, surface: str) -> list[int]:
        sig = self.mh.signature(char_shingles(surface))
        out: set[int] = set()
        for bi, h in enumerate(self.mh.bands(sig, self.n_bands)):
            out.update(self.buckets.get((bi, h), ()))
        return sorted(out)


_LINKER_CACHE: dict = {}


class EntityLinker:
    """Actor-pool stage: mention batch → (mention, mention_iri, candidate_iri,
    score, doc_id) rows for the best candidate above ``tau``."""

    def __init__(self, index_ref, tau: float = 0.5):
        self.index: LinkIndex = ray.get(index_ref)
        self.tau = tau
        # alias keys as an Arrow array, built once per actor: the exact
        # alias fast path is then one vectorized pc.is_in per batch
        self.alias_keys = pa.array(sorted(self.index.alias), pa.string())

    def __call__(self, b: pa.Table) -> pa.Table:
        import numpy as np

        miris = np.asarray(b["mention_iri"].to_pandas(), dtype=object)
        docs = np.asarray(b["doc_id"].to_pandas(), dtype=object)
        surfaces = np.array([extract.mention_surface(m) for m in miris],
                            dtype=object)
        # vectorized exact-alias fast path (typically the vast majority
        # of mentions); only misses fall to the per-row LSH probe
        hit_mask = pc.is_in(pa.array(surfaces, pa.string()),
                            value_set=self.alias_keys).to_numpy(
                                zero_copy_only=False)
        rows = []
        for i in np.flatnonzero(hit_mask):
            rows.append({"mention": surfaces[i], "mention_iri": miris[i],
                         "candidate_iri": self.index.alias[surfaces[i]],
                         "score": 1.0, "doc_id": docs[i]})
        for i in np.flatnonzero(~hit_mask):
            surface = surfaces[i]
            sh = char_shingles(surface)
            best_iri, best = "", 0.0
            for ei in self.index.candidates(surface):
                cs, ciri, csh = self.index.entries[ei]
                j = tf.jaccard(frozenset(sh), frozenset(csh))
                if j > best or (j == best and ciri < best_iri):
                    best, best_iri = j, ciri
            if best >= self.tau:
                rows.append({"mention": surface, "mention_iri": miris[i],
                             "candidate_iri": best_iri,
                             "score": round(best, 6), "doc_id": docs[i]})
        return pa.Table.from_pylist(rows, schema=S.ENTITY_LINKS)


def mentions_dataset(triples: rd.Dataset) -> rd.Dataset:
    """Distinct mention IRIs from the triples stream (obj side)."""
    def project(b: pa.Table) -> pa.Table:
        f = b.filter(pc.starts_with(b["obj_value"], extract.MENTION_NS))
        return pa.table({"mention_iri": f["obj_value"], "doc_id": f["doc_id"]})

    m = triples.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    # distinct per (mention_iri): keep min doc for lineage
    from ray.data.aggregate import Min

    return m.groupby("mention_iri").aggregate(Min("doc_id", alias_name="doc_id"))


def link_entities(triples: rd.Dataset, alias_rows: list[tuple[str, str]],
                  tau: float = 0.5,
                  concurrency: int | tuple | None = None) -> rd.Dataset:
    """triples → entity-links Dataset (schema.ENTITY_LINKS)."""
    index_ref = ray.put(LinkIndex(alias_rows))
    mentions = mentions_dataset(triples)

    if concurrency is not None:  # explicit actor pool (isolation-sensitive path)
        return mentions.map_batches(
            EntityLinker, fn_constructor_args=(index_ref, tau),
            batch_format="pyarrow", batch_size=2048, concurrency=concurrency,
            num_cpus=0.5)

    # default: task pool + per-worker-process index cache (no actor spawn
    # cost per execution; elastic parallelism)
    def link_fn(b: pa.Table) -> pa.Table:
        key = (index_ref.hex(), tau)
        inst = _LINKER_CACHE.get(key)
        if inst is None:
            if len(_LINKER_CACHE) >= 16:  # long-lived workers: bound the cache
                _LINKER_CACHE.pop(next(iter(_LINKER_CACHE)))
            inst = EntityLinker(index_ref, tau)
            _LINKER_CACHE[key] = inst
        return inst(b)

    return mentions.map_batches(link_fn, batch_format="pyarrow", batch_size=2048)
