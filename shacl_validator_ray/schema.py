"""Arrow schemas for every logical table (SURVEY.md §1.3).

These are the fixed contracts between pipeline stages; each stage is a
``map_batches`` over blocks of these schemas with
``batch_format="pyarrow"``.
"""

from __future__ import annotations

import pyarrow as pa

# F1: interleaved text+media documents (BASELINE.json input_hint).
SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),       # "text" | "image" | "table" | "code"
        pa.field("text", pa.string()),       # "" for pure media spans
        pa.field("media_ref", pa.string()),  # "" for text spans
        pa.field("offset", pa.int32()),      # strictly increasing within a doc
    ]
)

DOCUMENTS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# F2: extracted / materialized triples. Mirrors the reference quad model
# (/root/reference/src/services/RDFService.ts:42-69) plus lineage columns.
TRIPLES = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj_kind", pa.string()),      # "iri" | "blank" | "literal"
        pa.field("obj_value", pa.string()),
        pa.field("obj_datatype", pa.string()),  # "" when not typed
        pa.field("obj_lang", pa.string()),      # "" when no language tag
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
    ]
)

# F4: SHACL validation results (SHACLViolation, /root/reference/src/types.ts:27-39).
MESSAGE_STRUCT = pa.struct([pa.field("text", pa.string()), pa.field("lang", pa.string())])

VIOLATIONS = pa.schema(
    [
        pa.field("severity", pa.string()),  # "Violation" | "Warning" | "Info"
        pa.field("focus_node", pa.string()),
        pa.field("path", pa.string()),
        pa.field("value", pa.string()),
        pa.field("message", pa.list_(MESSAGE_STRUCT)),
        pa.field("source_constraint_component", pa.string()),
        pa.field("source_shape", pa.string()),
        pa.field("foaf_page", pa.string()),
    ]
)

# Entity linking output (north-rule extension).
ENTITY_LINKS = pa.schema(
    [
        pa.field("mention", pa.string()),        # surface form
        pa.field("mention_iri", pa.string()),    # provisional IRI emitted by extraction
        pa.field("candidate_iri", pa.string()),  # linked canonical candidate
        pa.field("score", pa.float64()),
        pa.field("doc_id", pa.string()),
    ]
)

# Canonicalization output: entity → union-find root.
CANONICAL_MAP = pa.schema(
    [
        pa.field("entity_id", pa.string()),
        pa.field("root_id", pa.string()),
    ]
)

# Metrics / lineage sidecar (north-rule; reference keeps only a
# 10-entry localStorage history, ValidationResults.tsx:28,246-250).
METRICS = pa.schema(
    [
        pa.field("stage", pa.string()),
        pa.field("partition_id", pa.int64()),
        pa.field("rows_in", pa.int64()),
        pa.field("rows_out", pa.int64()),
        pa.field("wall_s", pa.float64()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
