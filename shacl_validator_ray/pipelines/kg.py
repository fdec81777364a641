"""The flagship KG-construction pipeline (SURVEY.md §3.1 restatement).

read documents → extract triples → SHACL validate → link entities →
canonicalize → materialize graph. Each stage is added here as it lands;
every function takes and returns ``ray.data.Dataset`` and never calls
``ray.init`` (driver contract, /root/repo/__ray_entry__.py:11-13).
"""

from __future__ import annotations

import ray.data as rd

from .. import synth
from ..sources import io
from ..stages import extract


def documents_dataset(sf_dir: str) -> rd.Dataset:
    """Synthesize (cached) + read the interleaved-docs corpus for this scale."""
    corpus = synth.ensure_corpus(sf_dir)
    return io.read_table(f"{corpus}/documents")


def triples_dataset(sf_dir: str, batch_size: int = 1024) -> rd.Dataset:
    return extract.extract_triples(documents_dataset(sf_dir), batch_size=batch_size)


def flagship(sf_dir: str) -> rd.Dataset:
    """Current end-to-end spine; grows as stages land."""
    return triples_dataset(sf_dir)
